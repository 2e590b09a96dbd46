package graft.dataprep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention over an event stream: bucket users into cohorts by
  * their first-activity period, then count how many of each cohort are
  * active in each later period — the classic retention triangle.
  *
  * Scale shape: one groupBy(user) for cohort assignment, one distinct
  * over (user, period) for activity, then a user-keyed equi-join —
  * both sides are already partitioned by the user key from their own
  * aggregations, so the join co-locates without an extra exchange; the
  * final (cohort, period) rollup is a tiny aggregate. No windows over
  * the full stream, no self-join on raw events.
  */
object Retention {

  /** Output: (cohort_ms, period_ms, n_users), cohort_ms = the user's
    * first-event bucket, one row per (cohort, period) with at least
    * one active user, n_users = distinct users of that cohort active
    * in that period. `period_ms` buckets event time by `intervalMs`.
    */
  def cohorts(df: DataFrame, userCol: String, timeMsCol: String,
      intervalMs: Long): DataFrame = {
    require(intervalMs > 0, "intervalMs must be positive")
    val period = (col(timeMsCol) - col(timeMsCol) % intervalMs).as("period_ms")
    val activity = df.select(col(userCol).as("u"), period).distinct()
    val cohort = activity.groupBy(col("u"))
      .agg(min(col("period_ms")).as("cohort_ms"))
    activity.join(cohort, Seq("u"))
      .groupBy(col("cohort_ms"), col("period_ms"))
      .agg(count(lit(1)).as("n_users")) // distinct by construction
      .orderBy(col("cohort_ms").asc, col("period_ms").asc)
  }
}
