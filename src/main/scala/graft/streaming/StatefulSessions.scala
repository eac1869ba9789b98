package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via `flatMapGroupsWithState` —
  * the custom-state lane of Structured Streaming (the batch analog is
  * `q10_sessionize`'s gap-based window query).
  *
  * State per key: the open session (start, last-seen, count). An event
  * extends the session if it arrives within `gapSeconds` of the last
  * one; otherwise the closed session is emitted and a new one opens.
  * Idle sessions time out through `ProcessingTimeTimeout`, so state is
  * bounded by the number of ACTIVE keys — the property that lets this
  * run indefinitely on an unbounded stream.
  *
  * Scale: state lives in the state store partitioned by key (one
  * shuffle); skewed keys cost one hot partition, the same trade every
  * keyed-state streaming engine makes.
  */
object StatefulSessions {

  case class Event(user_id: Long, ts: Timestamp)

  case class SessionState(start: Long, lastMs: Long, n: Int)

  case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int, closed_by: String)

  /** One update invocation per key per micro-batch. `armTimeout` is
    * false when the query runs with `NoTimeout` (calling
    * setTimeoutDuration would throw there). */
  private[streaming] def updateKey(gapMs: Long, armTimeout: Boolean)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.lastMs),
        s.n, "timeout"))
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[Session]
      var cur = state.getOption
      for (e <- sorted) {
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastMs <= gapMs =>
            cur = Some(SessionState(s.start, math.max(s.lastMs, t), s.n + 1))
          case Some(s) =>
            closed ::= Session(userId, new Timestamp(s.start),
              new Timestamp(s.lastMs), s.n, "gap")
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur match {
        case Some(s) =>
          state.update(s)
          if (armTimeout) state.setTimeoutDuration(gapMs)
        case None => ()
      }
      closed.reverseIterator
    }
  }

  /** Sessionize a stream of (user_id, ts) events; emits a row per CLOSED
    * session (gap-closed within a batch, or — with the default
    * ProcessingTimeTimeout — timeout-closed between batches once a key
    * goes idle for the gap). `events` must be a streaming Dataset.
    *
    * Test/deterministic mode: pass `GroupStateTimeout.NoTimeout()` —
    * sessions then close only on observed gaps. (With processing-time
    * timeouts the engine keeps scheduling batches to fire them, so
    * `processAllAvailable` never settles — fine for a real deployment,
    * wrong for a bounded test.) */
  def sessionize(events: Dataset[Event], gapSeconds: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout())
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    val armTimeout = timeout != GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeout)(
        updateKey(gapSeconds * 1000, armTimeout))
  }


  /** The BUILT-IN alternative: Spark's `session_window` gap aggregation.
    * Same gap semantics as [[sessionize]] (an event within `gap` of the
    * session's end extends it), expressed declaratively — in streaming
    * mode pair with a watermark and the state store merges/evicts
    * session windows natively (no user state management at all). Prefer
    * this when per-session logic is aggregation-shaped; drop to
    * [[sessionize]]'s flatMapGroupsWithState only for custom state
    * (e.g. emit-on-close payloads, cross-session carryover). */
  def sessionWindowAgg(events: DataFrame, gapSeconds: Long): DataFrame =
    events.groupBy(
        col("user_id"),
        session_window(col("ts"), s"$gapSeconds seconds").as("sw"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  /** Batch-mode wrapper used by specs and backfills: the same
    * sessionization semantics over a bounded DataFrame (flatMapGroups —
    * identical per-key logic, no state store). */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    import events.sparkSession.implicits._
    val ds = events.select(col("user_id").cast("long"),
      col("ts").cast("timestamp")).as[Event]
    val gapMs = gapSeconds * 1000
    ds.groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        val sorted = it.toSeq.sortBy(_.ts.getTime)
        val out = scala.collection.mutable.ListBuffer.empty[Session]
        var cur: Option[SessionState] = None
        for (e <- sorted) {
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.lastMs <= gapMs =>
              cur = Some(SessionState(s.start, t, s.n + 1))
            case Some(s) =>
              out += Session(uid, new Timestamp(s.start), new Timestamp(s.lastMs),
                s.n, "gap")
              cur = Some(SessionState(t, t, 1))
            case None => cur = Some(SessionState(t, t, 1))
          }
        }
        cur.foreach(s => out += Session(uid, new Timestamp(s.start),
          new Timestamp(s.lastMs), s.n, "end"))
        out.iterator
      }
      .toDF()
  }
}
