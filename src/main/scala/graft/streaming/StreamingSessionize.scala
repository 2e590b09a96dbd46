package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization via flatMapGroupsWithState: per-key custom
  * state (open session) that closes on an inactivity gap, emitting the
  * finished session. The stateful analogue of
  * [[graft.dataprep.Sessionize]] — state per user is O(1) and sessions
  * emit as soon as a later event proves the gap. (No state timeout:
  * with ProcessingTimeTimeout the engine schedules continuous empty
  * micro-batches, which never quiesces under memory-sink tests; a
  * production flush would add EventTimeTimeout + a watermark.)
  */
object StreamingSessionize {

  final case class Event(user: Long, ms: Long)
  final case class OpenSession(start: Long, end: Long, n: Long)
  final case class SessionOut(user: Long, start_ms: Long, end_ms: Long, n_events: Long)

  def sessions(events: Dataset[Event], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          val sorted = rows.toSeq.sortBy(_.ms)
          val closed = Seq.newBuilder[SessionOut]
          var open = state.getOption
          for (e <- sorted) {
            open match {
              case Some(s) if e.ms - s.end <= gapMs =>
                open = Some(s.copy(end = e.ms, n = s.n + 1))
              case Some(s) =>
                closed += SessionOut(user, s.start, s.end, s.n)
                open = Some(OpenSession(e.ms, e.ms, 1))
              case None =>
                open = Some(OpenSession(e.ms, e.ms, 1))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }

  /** Convenience over the projected docs stream (mid + a user field). */
  def fromDocs(docs: DataFrame, userCol: String, gapMs: Long): Dataset[SessionOut] = {
    import docs.sparkSession.implicits._
    sessions(
      docs.select(col(userCol).cast("long").as("user"), col("mid").as("ms")).as[Event],
      gapMs)
  }
}
