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

  /** Ordered funnel: per user, the earliest time each step of
    * `steps` was reached, where step k must happen strictly AFTER the
    * user's step-(k-1) time (the classic conversion funnel:
    * view → click → purchase). Output: one row per user that reached
    * step 1, with nullable `t1..tn` millisecond columns.
    *
    * Scale design: each stage is a filtered partial aggregation on the
    * user key; stage k joins the (already user-keyed, shrinking) stage
    * k-1 result — Spark reuses the hash partitioning, and AQE turns
    * the later (small) sides into broadcasts. No windows over raw
    * events, no per-user event arrays (a `collect_list` funnel dies on
    * skewed power users at 100 TB).
    */
  def funnel(df: DataFrame, userCol: String, timeMs: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val first = df.where(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(timeMs)).as("t1"))
    val out = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (prev, (step, i)) =>
        val tPrev = s"t$i"
        val tCur = s"t${i + 1}"
        val reached = df.where(col(typeCol) === step)
          .select(col(userCol), col(timeMs).as("__t"))
          .join(prev.select(col(userCol), col(tPrev)), Seq(userCol))
          .where(col("__t") > col(tPrev))
          .groupBy(col(userCol))
          .agg(min(col("__t")).as(tCur))
        prev.join(reached, Seq(userCol), "left")
    }
    out.orderBy(col(userCol).asc)
  }
}
