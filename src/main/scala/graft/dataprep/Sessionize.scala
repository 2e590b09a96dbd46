package graft.dataprep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: group a user's events into sessions separated
  * by inactivity gaps — the classic log-analytics / training-data
  * rollup. One shuffle on the user key; session numbering is the
  * running count of gap-exceeded boundaries (no self-join).
  */
object Sessionize {

  /** Output: one row per (user, session): event count, start/end ms,
    * duration. Session boundary: gap > `gapMs` since the previous event
    * of the same user (ordered by time, id as tiebreak).
    */
  def sessions(df: DataFrame, userCol: String, timeMs: String, idCol: String,
      gapMs: Long): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(timeMs).asc, col(idCol).asc)
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(userCol), col(timeMs), col(idCol))
      .withColumn("__prev", lag(col(timeMs), 1).over(byUser))
      .withColumn("__new",
        when(col("__prev").isNull || col(timeMs) - col("__prev") > gapMs, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("session_no", sum(col("__new")).over(run))
      .groupBy(col(userCol), col("session_no"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(timeMs)).as("start_ms"),
        max(col(timeMs)).as("end_ms"))
      .withColumn("duration_ms", col("end_ms") - col("start_ms"))
      .orderBy(col(userCol).asc, col("session_no").asc)
  }
}
