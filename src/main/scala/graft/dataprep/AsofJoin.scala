package graft.dataprep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the payload of the latest
  * right row with the same key and `right.time <= left.time`.
  *
  * The reference engine has no joins at all (SURVEY.md §2.8); this is
  * one of the beyond-reference operators a training-data / log
  * analytics pipeline needs (enrich an event with the most recent
  * prior state: last config push before an error, last click before a
  * purchase, latest quote before a trade).
  *
  * Scale design: the naive formulation is an inequality join
  * (`l.k = r.k AND r.t <= l.t` + argmax), which Spark can only execute
  * as a broadcast-nested-loop or a sort-merge with per-key cross
  * products — O(|L|·|R|) per key, dead at 100 TB. Instead we union the
  * two sides, sort once per key, and carry the latest right payload
  * forward with a running `last(ignoreNulls)` window — exactly one
  * shuffle on the key, linear work, no join node at all. Right rows
  * sort before left rows at equal timestamps, so the semantics are
  * `<=` (use `strict = true` for `<`); ties between right rows are
  * broken by `rightTieCol` (largest wins), making the result
  * deterministic regardless of partitioning.
  */
object AsofJoin {

  /** @param left        rows to enrich (all its columns are kept)
    * @param right       rows providing the payload
    * @param keyCol      equi-join key present on both sides
    * @param leftTime    event-time column on `left` (numeric/orderable)
    * @param rightTime   event-time column on `right`
    * @param rightTieCol unique tiebreak on `right` for equal times
    * @param payload     right columns to attach, as (rightCol -> outCol)
    * @param strict      true = match strictly-earlier right rows only
    */
  def asofLatest(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTime: String,
      rightTime: String,
      rightTieCol: String,
      payload: Seq[(String, String)],
      strict: Boolean = false): DataFrame = {
    require(payload.nonEmpty, "payload must name at least one right column")
    payload.foreach { case (_, out) =>
      require(!left.columns.contains(out),
        s"output column '$out' already exists on the left side")
    }

    val leftCols = left.columns.toSeq
    // side tag orders right rows first at equal time (<= semantics);
    // strict mode flips the tag so equal-time right rows sort after
    // the left row and fall outside its running frame
    val rightTag = if (strict) 1 else 0
    val leftTag = 1 - rightTag

    val leftStructType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map { case (in, out) =>
        right.schema(in).copy(name = out)
      })

    val r = right.select(
      col(keyCol).as("__k"),
      col(rightTime).cast("long").as("__t"),
      lit(rightTag).as("__side"),
      col(rightTieCol).cast("long").as("__tie"),
      struct(payload.map { case (in, out) => col(in).as(out) }: _*).as("__p"),
      lit(null).cast(leftStructType).as("__l"))

    val l = left.select(
      col(keyCol).as("__k"),
      col(leftTime).cast("long").as("__t"),
      lit(leftTag).as("__side"),
      lit(Long.MaxValue).as("__tie"),
      lit(null).cast(payloadType).as("__p"),
      struct(leftCols.map(col): _*).as("__l"))

    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === leftTag)
      .select(leftCols.map(c => col(s"__l.$c")) ++
        payload.map { case (_, out) => col(s"__m.$out").as(out) }: _*)
  }

  /** Convenience wrapper returning the matched right time too. */
  def asofLatestWithTime(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTime: String,
      rightTime: String,
      rightTieCol: String,
      payload: Seq[(String, String)],
      matchedTimeCol: String,
      strict: Boolean = false): DataFrame = {
    val r2 = right.withColumn(matchedTimeCol, col(rightTime).cast("long"))
    asofLatest(left, r2, keyCol, leftTime, rightTime, rightTieCol,
      (matchedTimeCol -> matchedTimeCol) +: payload, strict)
  }
}
