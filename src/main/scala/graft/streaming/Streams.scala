package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (extension beyond the reference, which has
  * no streaming — SURVEY.md §2.5).
  *
  * Every transform here is written against a plain DataFrame so the SAME
  * code path serves batch tables and `readStream` sources — the declared
  * batch queries (q_stream_tumbling, q_sessionize) are the batch twins of
  * these operators. Watermarks bound state; aggregations are standard
  * partial+final, so at scale the shuffle carries only (key, window)
  * partial aggregates.
  */
object Streams {

  /** Tumbling-window aggregation (counts + sum of `valueCol`). With a
    * watermark, append-mode emits each window once when it closes; state
    * is bounded by watermark horizon × key cardinality. */
  def tumblingAgg(
      df: DataFrame,
      tsCol: String,
      windowDur: String,
      keyCols: Seq[String],
      valueCol: String,
      watermark: Option[String] = None): DataFrame = {
    val in = watermark.fold(df)(w => df.withWatermark(tsCol, w))
    in.groupBy(window(col(tsCol), windowDur) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("sum_value"))
      .select((col("window.start").as("win_start") +: col("window.end").as("win_end") +:
        keyCols.map(col)) ++ Seq(col("cnt"), col("sum_value")): _*)
  }

  /** Built-in session windows (gap-based), the streaming twin of
    * q_sessionize's lag-based batch form. */
  def sessionAgg(
      df: DataFrame,
      tsCol: String,
      gap: String,
      keyCols: Seq[String],
      watermark: Option[String] = None): DataFrame = {
    val in = watermark.fold(df)(w => df.withWatermark(tsCol, w))
    in.groupBy(session_window(col(tsCol), gap) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .select((col("session_window.start").as("sess_start") +:
        col("session_window.end").as("sess_end") +: keyCols.map(col)) :+ col("cnt"): _*)
  }

  /** Streaming exact dedup with bounded state: duplicate keys arriving
    * within the watermark horizon are dropped; per-key state expires as
    * the watermark advances (the streaming twin of Dedup.exact — state
    * is O(keys in horizon), not O(stream)). */
  def dedupWithinWatermark(df: DataFrame, keys: Seq[String], tsCol: String, watermarkDelay: String): DataFrame =
    df.withWatermark(tsCol, watermarkDelay).dropDuplicatesWithinWatermark(keys)

  /** Watermarked stream-stream inner join with an event-time interval
    * bound: a right row matches a left row with the equal key when its
    * timestamp falls in [leftTs, leftTs + maxDelay] (the ad-impression →
    * click shape). The interval condition plus BOTH watermarks are what
    * let Spark expire buffered rows on both sides — an unbounded
    * stream-stream equi-join keeps all history in state; this keeps
    * O(rows within watermark+maxDelay horizon) per side. */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      maxDelay: String,
      watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(leftKey) === r(rightKey) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $maxDelay"))
  }

  // ── custom stateful sessionizer (flatMapGroupsWithState) ─────────────

  final case class Event(userId: Long, ts: Timestamp, value: Double)
  final case class SessionState(startMs: Long, lastMs: Long, n: Long, sum: Double)
  final case class Session(userId: Long, start: Timestamp, end: Timestamp, n: Long, sum: Double)

  /** Custom session state machine: events are merged into the user's open
    * session; a gap > `gapMs` closes it (emitted immediately on the batch
    * that reveals the gap; the final open session closes via event-time
    * timeout once the watermark passes lastTs + gap). State per key is one
    * fixed-size record — memory is O(active users), not O(events). */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, batch: Iterator[Event], state: GroupState[SessionState]): Iterator[Session] = {
      val out = Vector.newBuilder[Session]
      var cur = state.getOption
      if (batch.isEmpty && state.hasTimedOut) {
        cur.foreach(s => out += Session(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, s.sum))
        state.remove()
      } else {
        for (e <- batch.toSeq.sortBy(_.ts.getTime)) {
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.lastMs <= gapMs =>
              cur = Some(SessionState(s.startMs, math.max(s.lastMs, t), s.n + 1, s.sum + e.value))
            case Some(s) =>
              out += Session(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, s.sum)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastMs + gapMs)
        }
      }
      out.result().iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  // ── streaming funnel (flatMapGroupsWithState) ─────────────────────────

  final case class TypedEvent(userId: Long, ts: Timestamp, eventType: String)
  final case class FunnelProgress(userId: Long, reached: Int, stageTimes: Seq[Timestamp])

  /** Streaming twin of `operators/Funnel.funnelTimes`: per-user funnel
    * progress maintained incrementally, one Update-mode row per touched
    * user per micro-batch. State per key is ≤ |stages| epoch longs —
    * but WITHOUT `idleTimeoutMs` the key set itself is unbounded: every
    * user ever seen keeps a state row forever (anonymous-session-id
    * churn grows the state store without limit). Pass `idleTimeoutMs`
    * to evict keys idle for that long in EVENT TIME (the sessionize
    * machinery: a watermark on `ts` + event-time timeout — evictions
    * are deterministic and replayable, unlike a wall-clock timeout);
    * an evicted user's next event restarts the funnel from stage 0 —
    * the same answer a batch recompute over the retained window gives.
    *
    * Correctness contract: requires PER-USER IN-ORDER delivery (e.g. a
    * user-keyed, time-ordered log). Under it, the first arriving valid
    * stage-k event IS the earliest valid one, so the final state equals
    * the batch operator's greedy result exactly (StreamingSpec asserts
    * the parity, with and without a deadline). Under out-of-order
    * arrival a late earlier event could beat an accepted one — the
    * batch operator is the recovery path, as with LSH banding vs
    * streaming fingerprint dedup (DocPipeline). A `maxGapMs` deadline
    * rejects any in-order candidate past `t_k + gap`; later candidates
    * are further past it, so rejection is final — matching batch. */
  def funnelStream(events: Dataset[TypedEvent], stages: Seq[String],
                   maxGapMs: Option[Long] = None,
                   idleTimeoutMs: Option[Long] = None,
                   watermarkDelay: String = "10 minutes"): Dataset[FunnelProgress] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    requireIdleTimeout(idleTimeoutMs)
    import events.sparkSession.implicits._

    def fn(userId: Long, batch: Iterator[TypedEvent],
           state: GroupState[Seq[Long]]): Iterator[FunnelProgress] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val evs = batch.toSeq.sortBy(_.ts.getTime)
        var times = state.getOption.getOrElse(Seq.empty)
        for (e <- evs if times.length < stages.length) {
          val t = e.ts.getTime
          if (e.eventType == stages(times.length) &&
              (times.isEmpty ||
                (t > times.last && maxGapMs.forall(g => t <= times.last + g))))
            times = times :+ t
        }
        if (times.nonEmpty) state.update(times)
        if (state.exists)
          idleTimeoutMs.foreach(ms =>
            state.setTimeoutTimestamp(evs.last.ts.getTime + ms))
        Iterator.single(FunnelProgress(userId, times.length, times.map(new Timestamp(_))))
      }
    }

    val src = if (idleTimeoutMs.isDefined)
      events.withWatermark("ts", watermarkDelay) else events
    src.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Update,
        if (idleTimeoutMs.isDefined) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
  }

  /** A zero/negative idle timeout sets a timeout timestamp <= the
    * current event-time watermark — Spark throws at RUNTIME and fails
    * the whole streaming query; reject at API entry instead. */
  private def requireIdleTimeout(idleTimeoutMs: Option[Long]): Unit =
    require(idleTimeoutMs.forall(_ > 0L),
      s"idleTimeoutMs=${idleTimeoutMs.get} must be > 0 (a timeout at or " +
        "before the event-time watermark fails the streaming query)")

  // ── streaming EWMA (flatMapGroupsWithState) ───────────────────────────

  final case class EwmaPoint(userId: Long, ts: Timestamp, value: Double, ewma: Double)

  /** Streaming twin of `operators/Fill.ewma` (adjust=False recurrence):
    * per-key smoothed value maintained across micro-batches, one output
    * row PER EVENT (Append; each event's smoothed value is final the
    * moment it is computed — the recurrence never revises the past).
    * State per key is ONE double — but the key SET is unbounded
    * without `idleTimeoutMs` (every key ever seen is retained); pass
    * it to evict keys idle for that long in EVENT TIME (watermark +
    * event-time timeout, deterministic like sessionize); an evicted
    * key's next event re-seeds the recurrence from its own value (the
    * adjust=False cold start).
    *
    * Same in-order contract as [[funnelStream]]: per-key ordered
    * delivery makes the stream equal the batch operator exactly
    * (StreamingSpec asserts parity); out-of-order arrival would blend
    * in the wrong order — batch recompute is the recovery path. */
  def ewmaStream(events: Dataset[Event], alpha: Double,
                 idleTimeoutMs: Option[Long] = None,
                 watermarkDelay: String = "10 minutes"): Dataset[EwmaPoint] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha=$alpha must be in (0, 1]")
    requireIdleTimeout(idleTimeoutMs)
    import events.sparkSession.implicits._

    def fn(userId: Long, batch: Iterator[Event],
           state: GroupState[Double]): Iterator[EwmaPoint] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val out = Vector.newBuilder[EwmaPoint]
        val evs = batch.toSeq.sortBy(_.ts.getTime)
        var cur = state.getOption
        for (e <- evs) {
          val y = cur match {
            case Some(prev) => (1.0 - alpha) * prev + alpha * e.value
            case None => e.value
          }
          cur = Some(y)
          out += EwmaPoint(userId, e.ts, e.value, y)
        }
        cur.foreach(state.update)
        if (state.exists)
          idleTimeoutMs.foreach(ms =>
            state.setTimeoutTimestamp(evs.last.ts.getTime + ms))
        out.result().iterator
      }
    }

    val src = if (idleTimeoutMs.isDefined)
      events.withWatermark("ts", watermarkDelay) else events
    src.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        if (idleTimeoutMs.isDefined) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
  }
}
