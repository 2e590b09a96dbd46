package graft.model

/** promql-style duration strings used for histogram/agg intervals
  * (proto seq_proxy_api.proto:185-188): `500ms`, `30s`, `5m`, `1h`,
  * `2d`, `1w`, `1y`; also accepts compound forms like `1h30m`.
  */
object Intervals {
  private val unitMs: Map[String, Long] = Map(
    "ms" -> 1L,
    "s"  -> 1000L,
    "m"  -> 60L * 1000,
    "h"  -> 3600L * 1000,
    "d"  -> 86400L * 1000,
    "w"  -> 7L * 86400 * 1000,
    "y"  -> 365L * 86400 * 1000,
  )

  private val token = "([0-9]+)(ms|s|m|h|d|w|y)".r

  def parseMs(s: String): Long = {
    val trimmed = s.trim
    if (trimmed.isEmpty) throw new SeqQlError("empty interval")
    val matches = token.findAllMatchIn(trimmed).toSeq
    val consumed = matches.map(_.matched).mkString
    if (consumed != trimmed)
      throw new SeqQlError(s"bad interval: '$s'")
    matches.map(m => m.group(1).toLong * unitMs(m.group(2))).sum
  }
}
