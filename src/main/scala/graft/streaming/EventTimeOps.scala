package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One user event: epoch-millis event time. */
final case class Event(userId: Long, tsMillis: Long)

/** A closed (or still-open, if `closed=false`) session. */
final case class Session(
    userId: Long, startMillis: Long, endMillis: Long, nEvents: Long, closed: Boolean)

/** Per-key open-session state for [[EventTimeOps.sessionize]]. */
final case class SessionState(startMillis: Long, endMillis: Long, nEvents: Long)

/** Structured Streaming event-time operators (SURVEY.md §2.8 extensions:
  * the reference needs none of these for parity — its dedup is per-batch —
  * but a lake ingestion engine wants watermarked aggregation and
  * sessionization on the same streams it merges).
  *
  * Both operators are standard Spark state machinery: windowed counts
  * compile to a streaming aggregation with watermark-based state eviction;
  * sessionization uses `flatMapGroupsWithState` (typed, incremental,
  * spill-safe state per key). State size is bounded by (keys x open
  * windows), never by stream length.
  */
object EventTimeOps {

  /** Watermarked tumbling-window aggregation per key with caller-supplied
    * aggregate columns: late data beyond `watermarkDelay` is dropped and
    * window state is evicted. Works identically over a batch DataFrame
    * (the watermark is a no-op there) — which is what lets the SAME
    * operator be oracle-checked in batch (q51) and state-tested in
    * streaming (EventTimeOpsSpec).
    */
  def windowedAgg(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDuration: String,
      watermarkDelay: String)(aggExprs: org.apache.spark.sql.Column*): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(aggExprs.head, aggExprs.tail: _*)
      .withColumn("win_start", col("window.start"))
      .drop("window")

  /** Watermarked tumbling-window count per key. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDuration: String,
      watermarkDelay: String): DataFrame =
    windowedAgg(events, tsCol, keyCol, windowDuration, watermarkDelay)(
      count(lit(1)).as("n"))
      .select(col("win_start"), col(keyCol), col("n"))

  /** Gap-based sessionization: events of a user belong to one session
    * while consecutive gaps stay below `gapMillis`. A closed session is
    * emitted when the first event beyond the gap arrives — deterministic,
    * no wall-clock timers (timer-based open-session flushing would make
    * results depend on trigger scheduling; production variants can layer
    * `EventTimeTimeout` + watermark on the same state shape).
    */
  def sessionize(
      events: Dataset[Event],
      gapMillis: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          mergeEvents(userId, evs, state, gapMillis).iterator
      }
  }

  /** Sessionization with WATERMARK-DRIVEN flush of open sessions: same gap
    * merge as [[sessionize]], plus `EventTimeTimeout` — when the watermark
    * passes `session end + gap`, no in-order event can extend the session
    * any more (later arrivals under that bound are dropped as late), so the
    * open session deterministically closes and its state evicts. This is
    * the production shape: open-session state cannot linger forever for
    * keys that stop producing.
    */
  def sessionizeWithTimeout(
      events: Dataset[Event],
      gapMillis: Long,
      watermarkDelay: String): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", watermarkDelay)
      .as[Event]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // Watermark passed end+gap: flush the open session as closed.
            val out = state.getOption.map(s =>
              Session(userId, s.startMillis, s.endMillis, s.nEvents, closed = true))
            state.remove()
            out.iterator
          } else {
            val closed = mergeEvents(userId, evs, state, gapMillis)
            state.getOption.foreach { s =>
              // Fire once no in-order event can extend the session; the
              // timestamp must stay above the current watermark.
              state.setTimeoutTimestamp(
                (s.endMillis + gapMillis) max (state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }

  /** Shared gap-merge: folds a batch of events into the per-key state,
    * returning the sessions closed by in-order gap breaks.
    */
  private def mergeEvents(
      userId: Long,
      evs: Iterator[Event],
      state: GroupState[SessionState],
      gapMillis: Long): Seq[Session] = {
    val sorted = evs.toSeq.sortBy(_.tsMillis)
    var cur = state.getOption
    val closedSessions = Seq.newBuilder[Session]
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.tsMillis - s.endMillis <= gapMillis =>
          // min/max, not overwrite: a cross-batch out-of-order event that
          // is still above the watermark (so not dropped as late) must not
          // REGRESS the session end — that would wrongly close the session
          // for the next in-order event, register the event-time timeout
          // too early, and could emit endMillis < startMillis.
          cur = Some(SessionState(
            math.min(s.startMillis, e.tsMillis),
            math.max(s.endMillis, e.tsMillis),
            s.nEvents + 1))
        case Some(s) =>
          closedSessions +=
            Session(userId, s.startMillis, s.endMillis, s.nEvents, closed = true)
          cur = Some(SessionState(e.tsMillis, e.tsMillis, 1))
        case None =>
          cur = Some(SessionState(e.tsMillis, e.tsMillis, 1))
      }
    }
    cur.foreach(state.update)
    closedSessions.result()
  }

  /** Streaming ingest dedup: emit each key ONCE, with state bounded by the
    * watermark instead of growing forever — the shape a document-ingest
    * pipeline needs when its upstream is at-least-once (re-crawls,
    * retried batches). Spark-first: this is exactly
    * `dropDuplicatesWithinWatermark`, so the whole operator compiles to
    * the built-in streaming dedup with watermark-evicted state; the
    * wrapper just fixes the contract (watermark BEFORE dedup, keys must
    * not include the event-time column — including it would make
    * re-deliveries with a fresh timestamp pass as new).
    */
  def dedupeStream(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      watermarkDelay: String): DataFrame = {
    require(keyCols.nonEmpty && !keyCols.contains(tsCol),
      s"dedup keys must be non-empty and exclude the event-time column $tsCol")
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)
  }

  /** Stream-stream interval join: pair each left row with the right rows
    * of the same key whose event time falls in
    * `[leftTs - before, leftTs + after]`. Spark-first: this compiles to
    * the built-in StreamingSymmetricHashJoin — each side buffers keyed
    * state and the OTHER side's watermark plus the interval bound is
    * exactly what lets Spark evict it (state ∝ keys × the interval+delay
    * window, never stream length). The wrapper fixes the contract the
    * built-in leaves implicit: BOTH sides watermarked (without both, an
    * inner interval join buffers one side forever), distinct ts column
    * names, non-negative bounds.
    *
    * `joinType` supports the outer variants ("left_outer" etc.) — outer
    * results emit only once the watermark proves no match can arrive, so
    * expect them delayed by the watermark, not dropped. Works identically
    * on batch frames (watermarks no-op) for oracle-checking.
    */
  def streamIntervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      beforeMs: Long,
      afterMs: Long,
      leftWatermark: String,
      rightWatermark: String,
      joinType: String = "inner"): DataFrame = {
    require(keyCols.nonEmpty, "streamIntervalJoin needs at least one key column")
    require(leftTs != rightTs,
      s"ts columns must have distinct names (both '$leftTs') — alias one side")
    require(beforeMs >= 0 && afterMs >= 0,
      s"interval bounds must be non-negative (got before=$beforeMs after=$afterMs)")
    val l = left.withWatermark(leftTs, leftWatermark)
    val r = right.withWatermark(rightTs, rightWatermark)
    val keyCond = keyCols.map(k => l(k) === r(k)).reduce(_ && _)
    val timeCond =
      r(rightTs) >= l(leftTs) - expr(s"INTERVAL $beforeMs MILLISECONDS") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $afterMs MILLISECONDS")
    // Drop the right-side key copies (they equal the left's wherever both
    // exist); a right_outer caller who needs the right keys on unmatched
    // rows should alias them before joining.
    keyCols.foldLeft(l.join(r, keyCond && timeCond, joinType))(
      (d, k) => d.drop(r(k)))
  }
}
