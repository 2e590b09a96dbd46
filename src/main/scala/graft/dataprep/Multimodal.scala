package graft.dataprep

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata travelling alongside. The
  * Spark-side machinery — schema, partition-preserving mapPartitions
  * batch processing, deterministic output — is real; the actual media
  * decode is STUBBED (no codec libraries in this container) behind
  * [[MediaStub.decode]], which derives fake-but-deterministic features
  * from the raw bytes. Swap that one function for a real decoder
  * (JavaCV, TwelveMonkeys, ffmpeg pipes) in production.
  */
object Multimodal {

  final case class MediaRow(id: Long, bytes: Array[Byte])
  final case class MediaFeatures(
      id: Long,
      n_bytes: Long,
      head_hex: String,
      fake_width: Long,
      fake_height: Long,
      fake_channels: Long)

  /** STUB decoder: deterministic pseudo-features from the payload.
    * A real implementation would parse the container format here.
    */
  object MediaStub {
    def decode(bytes: Array[Byte]): (Long, Long, Long) = {
      val n = bytes.length.toLong
      // ??? real decode goes here; deterministic fake stands in:
      (n % 640 + 1, (n * 7) % 480 + 1, 3L)
    }
  }

  private val hexDigits = "0123456789ABCDEF"
  private def hex(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length * 2)
    for (b <- bytes) {
      sb += hexDigits((b >> 4) & 0xF)
      sb += hexDigits(b & 0xF)
    }
    sb.toString
  }

  /** Feature extraction over a binary column via typed mapPartitions —
    * the Scala analogue of a Pandas-UDF `mapInPandas` stage: rows
    * stream through per partition, the decode runs once per payload,
    * and the output schema is an explicit case class. Deterministic,
    * so the result is oracle-comparable (n_bytes/head_hex mirror
    * octet_length/hex(substr) in SQL).
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] = df
      .select(col(idCol).cast("long").as("id"), col(binCol).as("bytes"))
      .as[MediaRow]
    typed.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, c) = MediaStub.decode(r.bytes)
        MediaFeatures(
          id = r.id,
          n_bytes = r.bytes.length.toLong,
          head_hex = hex(r.bytes.take(8)),
          fake_width = w,
          fake_height = h,
          fake_channels = c)
      }
    }.toDF()
      .orderBy(col("id").asc)
  }

  /** Build a binary "payload" column from text (the testdata carries no
    * real media; UTF-8 bytes stand in for the opaque blob). */
  def withTextPayload(df: DataFrame, textCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, encode(col(textCol), "UTF-8"))
}
