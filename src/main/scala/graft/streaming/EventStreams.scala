package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Det

/** Structured Streaming pipelines over the event stream (SURVEY.md
  * §2B streaming rows; north-star extension — the reference has no
  * streaming surface).
  *
  * Design: every transform takes/returns a DataFrame or Dataset, so
  * the same code binds to `spark.readStream` sources in production and
  * to `MemoryStream` in tests (StreamingSpec). The window transforms
  * are the *same* `window()`/`session_window()` expressions whose
  * batch forms are oracle-checked in [[graft.operators.Streams]] —
  * batch/stream parity is Spark's own guarantee for these operators.
  *
  * Scale: stateful operators key their state by (window, type) or
  * user — state size is bounded by active keys × window horizon, and
  * the watermark bounds the horizon. State lives in the executor state
  * store (RocksDB at production scale), partitioned by key — nothing
  * driver-side.
  */
object EventStreams {

  /** Streamed event record (mirrors the events table columns). */
  final case class Event(
      event_id: Long,
      ts: Timestamp,
      user_id: Long,
      event_type: String,
      value: Double)

  /** A completed user session emitted by [[sessionize]]. */
  final case class SessionOut(
      user_id: Long,
      sstart: Timestamp,
      send: Timestamp,
      n_events: Long,
      sum_cents: Long)

  /** Running session state: bounds + counters, money in exact cents. */
  final case class SessionState(
      startMs: Long,
      lastMs: Long,
      n: Long,
      cents: Long)

  /** Per-type counts in 1-hour tumbling windows. With a 1-hour
    * watermark: late events within an hour still land in their window;
    * older ones are dropped; in append mode a window emits once the
    * watermark passes its end. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("wstart"), col("window.end").as("wend"),
        col("event_type"), col("n"), col("sum_value"))

  /** 1-hour windows sliding every 15 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("window.end").as("wend"),
        col("event_type"), col("n"))

  /** Built-in session windows (30-minute gap) per user. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sstart"),
        col("session_window.end").as("send"), col("user_id"), col("n_events"))

  /** Stateful exact dedup by event_id, state bounded by the watermark
    * horizon — the streaming twin of llm_dedup_exact's semantics. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: the canonical dimension join. The
    * static side re-plans per micro-batch (picking up dimension
    * updates) and broadcasts when small — no stream-side state at
    * all, so it scales with the stream, not the dimension history. */
  def enriched(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), Seq("user_id"), "left_outer")

  /** Stream-stream interval join: purchases matched to the same user's
    * signups within the preceding 24 h — the funnel pattern as a true
    * two-stream join. Both sides carry watermarks and the join
    * condition bounds event time on both, so each side's buffered
    * state is evictable once the watermark passes the interval (state
    * ∝ users active in the horizon, not the stream's history). */
  def purchaseAttribution(signups: DataFrame, purchases: DataFrame): DataFrame = {
    val s = signups.withWatermark("ts", "1 hour")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    p.join(s,
      col("p_user") === col("s_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 24 HOURS"))
  }

  private val GapMs: Long = 30L * 60 * 1000

  /** Per-event cent rounding on the SAME decimal path as the batch
    * twins' [[graft.core.Det.cents]] (ADVICE r7): `math.round(v*100)`
    * rounds the binary double (1.005 → 100.4999… → 100) while the
    * batch side casts through DECIMAL and half-up-rounds the decimal
    * rendering (1.005 → 101), so stream-vs-batch equality was
    * data-dependent. BigDecimal.valueOf uses the double's canonical
    * decimal string — the identical value Spark's double→decimal cast
    * sees — then mirrors the cast's scale-10 and round's scale-2
    * half-up steps. */
  private[graft] def eventCents(v: Double): Long = {
    // non-finite values: the batch cast double→DECIMAL yields NULL,
    // which sum() skips — contribute 0 instead of letting
    // BigDecimal.valueOf(NaN) throw and kill the streaming query
    // (r8 self-review; DetSpec pins the finite domain property)
    if (v.isNaN || v.isInfinite) return 0L
    val cents = java.math.BigDecimal.valueOf(v)
      .setScale(10, java.math.RoundingMode.HALF_UP)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2)
    // out-of-range magnitudes (ADVICE r8): longValueExact() threw an
    // uncaught ArithmeticException for finite |v| ≳ 9.2e16 (cents past
    // ±2^63), killing the whole streaming query on one poisoned
    // record. Contribute 0 instead. Honest asymmetry with batch: under
    // the session's ANSI mode the batch Det.cents twin REJECTS such a
    // row outright (DECIMAL(27,10) overflow error at |v| ≥ 1e17), so
    // stream-vs-batch equality holds on the domain batch accepts,
    // and outside it a long-running stream degrades gracefully where
    // a re-runnable batch job fails fast — a stream must not be
    // killable by one bad record (DetSpec drives both boundaries)
    if (math.abs(v) >= 1e17 ||
        cents.compareTo(java.math.BigDecimal.valueOf(Long.MaxValue)) > 0 ||
        cents.compareTo(java.math.BigDecimal.valueOf(Long.MinValue)) < 0) 0L
    else cents.longValueExact()
  }

  /** Custom sessionization with explicit state:
    * flatMapGroupsWithState keyed by user, event-time timeout at
    * last-event + gap. Emits a [[SessionOut]] when the watermark
    * passes the session's gap boundary (i.e. the session is provably
    * closed), matching `session_window` semantics: send = last + gap.
    *
    * This is the template for arbitrary keyed state machines the
    * built-in windows can't express (e.g. per-user funnels). */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId,
              new Timestamp(s.startMs), new Timestamp(s.lastMs + GapMs),
              s.n, s.cents))
          } else {
            // Fold the micro-batch into the running session. Events
            // within a micro-batch are not ordered — take min/max.
            val evs = batch.toSeq
            val cents = evs.map(e => eventCents(e.value)).sum
            val lo = evs.map(_.ts.getTime).min
            val hi = evs.map(_.ts.getTime).max
            val (emit, next) = state.getOption match {
              case Some(s) if lo < s.lastMs + GapMs =>
                // extends the open session (micro-batch granularity:
                // a batch that touches the session merges into it)
                (Iterator.empty[SessionOut],
                  SessionState(math.min(s.startMs, lo), math.max(s.lastMs, hi),
                    s.n + evs.size, s.cents + cents))
              case Some(s) =>
                // gap exceeded within the data itself: emit the old
                // session now and start a new one
                (Iterator.single(SessionOut(userId,
                    new Timestamp(s.startMs), new Timestamp(s.lastMs + GapMs),
                    s.n, s.cents)),
                  SessionState(lo, hi, evs.size.toLong, cents))
              case None =>
                (Iterator.empty[SessionOut],
                  SessionState(lo, hi, evs.size.toLong, cents))
            }
            state.update(next)
            state.setTimeoutTimestamp(next.lastMs + GapMs)
            emit
          }
      }
  }

  /** Lifetime per-user totals emitted by [[runningTotals]]. */
  final case class UserTotal(user_id: Long, n_events: Long, sum_cents: Long)

  /** Spark 4 `transformWithState` StatefulProcessor: a per-user
    * lifetime (count, cents) ValueState updated per micro-batch —
    * the new arbitrary-state API (successor to
    * `flatMapGroupsWithState`, RocksDB-backed, schema-evolvable
    * state). The money fold uses the same per-event cent rounding as
    * [[sessionize]]. */
  final class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, UserTotal] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("totals",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTotal] = {
      val evs = rows.toSeq
      val (pn, pc) = if (st.exists()) st.get() else (0L, 0L)
      val n = pn + evs.size
      val c = pc + evs.map(e => eventCents(e.value)).sum
      st.update((n, c))
      Iterator.single(UserTotal(key, n, c))
    }
  }

  /** Running per-user totals through [[RunningTotalsProcessor]] —
    * update-mode emission of each user's lifetime totals whenever a
    * micro-batch touches them. Requires the RocksDB state store
    * provider (`spark.sql.streaming.stateStore.providerClass`), the
    * production configuration for transformWithState. Batch twin:
    * [[graft.operators.Streams.streamStateTotals]] (the end-state a
    * converged stream reaches). */
  def runningTotals(events: Dataset[Event]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }
}
