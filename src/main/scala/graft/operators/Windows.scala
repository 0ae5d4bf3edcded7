package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Det, DetSql, Tables}

/** Window-function inventory (SURVEY.md §2B `win_*`).
  *
  * The reference exposes windows only through its latent SparkSQL
  * surface (TemplateApp.scala:52); these make the capability concrete.
  * Scale notes: a window shuffles once on its partition key and sorts
  * within partitions — state per task is bounded by the largest single
  * key group (customers here, thousands of rows at most), so the same
  * plan holds on a 1000-executor cluster. Rank predicates and frame
  * sums never materialize the full partition on the driver.
  */
object Windows {

  /** rank / dense_rank / row_number of orders by totalprice within each
    * customer. One shuffle on o_custkey; WindowExec streams each group
    * in ONE pass — the distribution functions that need the group size
    * up front (a second pass) live in [[winDistribution]] so this row
    * stays the cheap single-pass shape (VERDICT r3 #6: their addition
    * here cost 0.12 → 0.67 s). */
  def winRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        row_number().over(w).as("rn"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val winRankSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(RANK() OVER w AS INT) AS rk,
      |  CAST(DENSE_RANK() OVER w AS INT) AS drk,
      |  CAST(ROW_NUMBER() OVER w AS INT) AS rn
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** ntile / percent_rank / cume_dist — the distribution family. These
    * need the partition's row count before emitting row 1, so WindowExec
    * buffers each group (a two-pass frame); split from [[winRank]] so
    * the one-pass rank query keeps its cost honest. Same single shuffle
    * on o_custkey; state is still bounded by the largest key group.
    * Both engines define pct_rank as (rank-1)/(n-1) and cume as
    * peers_thru/n over exact ints — bit-identical divisions. */
  def winDistribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val winDistributionSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(NTILE(4) OVER w AS INT) AS quartile,
      |  PERCENT_RANK() OVER w AS pct_rank,
      |  CUME_DIST() OVER w AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** lag/lead/first_value + running sum per customer in order-date
    * order. The running sum runs over exact per-row cents
    * ([[Det.cents]]) so the sequential accumulation is integer-exact in
    * both engines regardless of their cumulative-sum algorithm. */
  def winAnalytic(spark: SparkSession, dir: String): DataFrame = {
    val wo = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wf = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(wo).as("prev_price"),
        lead(col("o_totalprice"), 1).over(wo).as("next_price"),
        first(col("o_totalprice")).over(wf).as("first_price"),
        (sum(Det.cents(col("o_totalprice"))).over(wf)
          .cast("double") / lit(100.0)).as("run_sum"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val winAnalyticSql: String =
    s"""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       |  LAG(o_totalprice) OVER wo AS prev_price,
       |  LEAD(o_totalprice) OVER wo AS next_price,
       |  FIRST_VALUE(o_totalprice) OVER wf AS first_price,
       |  CAST(CAST(SUM(${DetSql.cents("o_totalprice")}) OVER wf AS BIGINT) AS DOUBLE) / 100.0 AS run_sum
       |FROM orders
       |WINDOW
       |  wo AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Time-series gap filling: daily revenue joined onto a complete
    * calendar spine (sequence/explode — no driver-side date loop),
    * zero-fill plus a forward-fill via last(ignoreNulls) over an
    * ordered frame. The global window is safe here because the spine
    * is one row per day — at scale the same pattern partitions by
    * entity (per-key spines), keeping windows bounded. */
  def tsGapfill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("revenue"))
    val spine = daily
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 DAY"))).as("day"))
    val wf = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("day"), "left_outer")
      .select(col("day"),
        coalesce(col("n"), lit(0L)).as("n_orders"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"),
        last(col("revenue"), ignoreNulls = true).over(wf).as("revenue_ffill"))
      .orderBy(col("day"))
  }

  val tsGapfillSql: String =
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n,
       |    ${DetSql.dsum("o_totalprice")} AS revenue
       |  FROM orders GROUP BY 1),
       |bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
       |spine AS (
       |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM bounds)
       |SELECT s.day,
       |  COALESCE(d.n, 0) AS n_orders,
       |  COALESCE(d.revenue, 0.0) AS revenue,
       |  LAST_VALUE(d.revenue IGNORE NULLS) OVER (ORDER BY s.day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revenue_ffill
       |FROM spine s LEFT OUTER JOIN daily d ON s.day = d.day
       |ORDER BY s.day""".stripMargin

  /** Cumulative distinct customers by day — "unique customers to
    * date", the classic growth metric, over the 7-year orders span.
    * The scalable shape: distinct-over-window is O(n²) state, so
    * instead each customer contributes once at their FIRST order day
    * (customer-keyed min), days aggregate arrivals, and a running sum
    * over the day rows yields the cumulative count. Two cheap keyed
    * shuffles; the global window is one row per day (same safety
    * argument as [[tsGapfill]]'s spine). */
  def tsCumulativeUsers(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(min(to_date(col("o_orderdate"))).as("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("new_customers"))
      .withColumn("cum_customers", sum(col("new_customers")).over(w))
      .orderBy(col("day"))
  }

  val tsCumulativeUsersSql: String =
    """WITH first_seen AS (
      |  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS day
      |  FROM orders GROUP BY o_custkey),
      |daily AS (
      |  SELECT day, COUNT(*) AS new_customers FROM first_seen GROUP BY day)
      |SELECT day, new_customers,
      |  CAST(SUM(new_customers) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_customers
      |FROM daily
      |ORDER BY day""".stripMargin

  /** Cohort retention matrix — the product-analytics staple: customers
    * bucketed by first-order month (cohort), then for each
    * (cohort, months-since) cell the count of cohort members ordering
    * that month, over orders' 7-year span. Shapes: one customer-keyed
    * aggregate for cohorts, one distinct customer-month activity set,
    * a key-shuffled join back, one (cohort, month)-keyed aggregate.
    * Month distance is pure integer calendar arithmetic — portable
    * where months_between's fractional semantics are not. */
  def tsCohortRetention(spark: SparkSession, dir: String): DataFrame = {
    // DATE month buckets: DuckDB's date_trunc('month') yields DATE
    // while Spark's yields TIMESTAMP — pin both engines to DATE
    val e = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        to_date(date_trunc("month", col("o_orderdate"))).as("m"))
    val cohort = e.groupBy(col("o_custkey")).agg(min(col("m")).as("cohort"))
    val active = e.distinct()
    active.join(cohort, "o_custkey")
      .groupBy(col("cohort"), col("m"))
      .agg(count(lit(1)).as("n_active"))
      .select(col("cohort"), col("m"),
        ((year(col("m")) - year(col("cohort"))) * 12 +
          (month(col("m")) - month(col("cohort")))).as("month_idx"),
        col("n_active"))
      .orderBy(col("cohort"), col("m"))
  }

  val tsCohortRetentionSql: String =
    """WITH e AS (
      |  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS m
      |  FROM orders),
      |cohort AS (
      |  SELECT o_custkey, MIN(m) AS cohort FROM e GROUP BY o_custkey),
      |active AS (SELECT DISTINCT o_custkey, m FROM e)
      |SELECT c.cohort, a.m,
      |  CAST((year(a.m) - year(c.cohort)) * 12
      |    + (month(a.m) - month(c.cohort)) AS INT) AS month_idx,
      |  COUNT(*) AS n_active
      |FROM active a JOIN cohort c ON a.o_custkey = c.o_custkey
      |GROUP BY c.cohort, a.m
      |ORDER BY c.cohort, a.m""".stripMargin

  /** Per-row trailing 24-hour RANGE frame per user: event count and
    * exact-cents value sum over the window ending at each event. RANGE
    * (value-bounded) differs from ROWS (count-bounded): ties in the
    * order key all share one frame, so the result is deterministic
    * even with duplicate timestamps — both engines agree by the SQL
    * standard. The frame bound is micros on the epoch, the native unit
    * of the µs-precision events.ts. One shuffle on user_id; frame
    * state is bounded by events per key per day. */
  def winRollingRange(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us")).rangeBetween(-dayUs, 0L)
    Tables.events(spark, dir)
      .withColumn("us", Det.epochUs(col("ts")))
      .select(col("event_id"), col("user_id"), col("ts"),
        count(lit(1)).over(w).as("n_24h"),
        (sum(Det.cents(col("value"))).over(w)
          .cast("double") / lit(100.0)).as("sum_24h"))
      .orderBy(col("event_id"))
  }

  val winRollingRangeSql: String =
    s"""SELECT event_id, user_id, ts,
       |  COUNT(*) OVER w AS n_24h,
       |  CAST(CAST(SUM(${DetSql.cents("value")}) OVER w AS BIGINT) AS DOUBLE) / 100.0 AS sum_24h
       |FROM events
       |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
       |             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
       |ORDER BY event_id""".stripMargin

  /** Leave-one-out linear interpolation per user: each event's value
    * re-estimated from its two neighbors at its own timestamp, plus
    * the residual — the imputation/outlier-detection shape sensor and
    * metrics pipelines run (a large |err| flags a spike; the same
    * arithmetic fills a gap). Exact-µs integer time deltas feed one
    * IEEE division and one fused linear step, written identically in
    * both engines; duplicate timestamps (tn = tp) fall back to the
    * neighbor midpoint instead of dividing by zero. One shuffle on
    * user_id; lag/lead are single-pass frames. */
  def tsInterpolate(spark: SparkSession, dir: String): DataFrame = {
    // explicit NULLS LAST: the schema allows NULL ts, and Spark's
    // default (NULLS FIRST) differs from DuckDB's — the verify-skill
    // gotcha this repo records for every nullable sort key
    val wo = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc_nulls_last, col("event_id").asc_nulls_last)
    val est = when(col("tn") === col("tp"),
        (col("vp") + col("vn")) / lit(2.0))
      .otherwise(col("vp") + (col("vn") - col("vp")) *
        ((col("us") - col("tp")).cast("double") /
          (col("tn") - col("tp")).cast("double")))
    Tables.events(spark, dir)
      .withColumn("us", Det.epochUs(col("ts")))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("us"),
        lag(col("value"), 1).over(wo).as("vp"),
        lead(col("value"), 1).over(wo).as("vn"),
        lag(col("us"), 1).over(wo).as("tp"),
        lead(col("us"), 1).over(wo).as("tn"))
      .where(col("vp").isNotNull && col("vn").isNotNull)
      .withColumn("est", est)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("est"), (col("est") - col("value")).as("err"))
      .orderBy(col("event_id").asc_nulls_last)
  }

  val tsInterpolateSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, ts, value, epoch_us(ts) AS us FROM events),
      |x AS (
      |  SELECT event_id, user_id, ts, value, us,
      |    LAG(value) OVER w AS vp, LEAD(value) OVER w AS vn,
      |    LAG(us) OVER w AS tp, LEAD(us) OVER w AS tn
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id
      |               ORDER BY us NULLS LAST, event_id NULLS LAST)),
      |y AS (
      |  SELECT event_id, user_id, ts, value,
      |    CASE WHEN tn = tp THEN (vp + vn) / 2.0
      |         ELSE vp + (vn - vp) * (CAST(us - tp AS DOUBLE)
      |                                / CAST(tn - tp AS DOUBLE)) END AS est
      |  FROM x WHERE vp IS NOT NULL AND vn IS NOT NULL)
      |SELECT event_id, user_id, ts, value, est, est - value AS err
      |FROM y
      |ORDER BY event_id NULLS LAST""".stripMargin

  /** Rolling z-score per event over the user's trailing 24 h — the
    * windowed-moments outlier detector (|z| > k flags anomalies
    * against each user's own recent behavior, not a global
    * distribution). Both moment sums run on exact integer cents
    * (Σc and Σc² as longs — c ≤ 10^5 cents keeps Σc² far below 2^63
    * at any realistic per-user day volume), so mean/variance/z derive
    * from identical exact integers through the same few IEEE ops in
    * both engines. A zero-variance window (constant values) yields
    * NULL, never a 0-division. One shuffle on user_id. */
  def tsZscore(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    // NULLS LAST as in tsInterpolate — the schema-nullable us key must
    // order identically in both engines
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc_nulls_last).rangeBetween(-dayUs, 0L)
    val meanC = col("sc").cast("double") / col("n")
    val varC = col("scc").cast("double") / col("n") - meanC * meanC
    val stdC = sqrt(greatest(varC, lit(0.0)))
    Tables.events(spark, dir)
      .withColumn("us", Det.epochUs(col("ts")))
      .withColumn("c", Det.cents(col("value")))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("c"),
        count(lit(1)).over(w).as("n"),
        sum(col("c")).over(w).as("sc"),
        sum(col("c") * col("c")).over(w).as("scc"))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("n").as("n_24h"),
        when(stdC === 0.0, lit(null).cast("double"))
          .otherwise((col("c").cast("double") - meanC) / stdC).as("z"))
      .orderBy(col("event_id").asc_nulls_last)
  }

  val tsZscoreSql: String =
    s"""WITH x AS (
       |  SELECT event_id, user_id, ts, value,
       |    ${DetSql.cents("value")} AS c, epoch_us(ts) AS us
       |  FROM events),
       |m AS (
       |  SELECT event_id, user_id, ts, value, c,
       |    COUNT(*) OVER w AS n,
       |    SUM(c) OVER w AS sc,
       |    SUM(c * c) OVER w AS scc
       |  FROM x
       |  WINDOW w AS (PARTITION BY user_id ORDER BY us NULLS LAST
       |               RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)),
       |d AS (
       |  SELECT event_id, user_id, ts, value, c, n,
       |    CAST(sc AS DOUBLE) / n AS mean_c,
       |    SQRT(GREATEST(CAST(scc AS DOUBLE) / n
       |      - (CAST(sc AS DOUBLE) / n) * (CAST(sc AS DOUBLE) / n), 0.0)) AS std_c
       |  FROM m)
       |SELECT event_id, user_id, ts, value, n AS n_24h,
       |  CASE WHEN std_c = 0.0 THEN NULL
       |       ELSE (CAST(c AS DOUBLE) - mean_c) / std_c END AS z
       |FROM d
       |ORDER BY event_id NULLS LAST""".stripMargin

  /** Downsample the event stream to 15-minute OHLC bars per user:
    * open/close are the first/last values by (ts, event_id) within the
    * bucket — made deterministic under timestamp ties by the explicit
    * row_number tie-break, the same trick both engines share. Values
    * pass through untouched (hash-safe); the volume sum is exact
    * cents. One shuffle on (user, bucket); the canonical resample
    * shape for time-series feature pipelines. */
  def tsResample(spark: SparkSession, dir: String): DataFrame = {
    val bucket = window(col("ts"), "15 minutes").getField("start").as("bucket")
    val base = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"), bucket)
    val wa = Window.partitionBy(col("user_id"), col("bucket"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val wd = Window.partitionBy(col("user_id"), col("bucket"))
      .orderBy(col("ts").desc, col("event_id").desc)
    base
      .withColumn("rn_a", row_number().over(wa))
      .withColumn("rn_d", row_number().over(wd))
      .groupBy(col("user_id"), col("bucket"))
      .agg(
        max(when(col("rn_a") === 1, col("value"))).as("open"),
        max(when(col("rn_d") === 1, col("value"))).as("close"),
        min(col("value")).as("lo"),
        max(col("value")).as("hi"),
        count(lit(1)).as("n_events"),
        Det.dsum(col("value")).as("volume"))
      .orderBy(col("user_id"), col("bucket"))
  }

  val tsResampleSql: String =
    s"""WITH x AS (
       |  SELECT event_id, user_id, ts, value,
       |    time_bucket(INTERVAL 15 MINUTE, ts) AS bucket
       |  FROM events),
       |r AS (
       |  SELECT *,
       |    ROW_NUMBER() OVER (PARTITION BY user_id, bucket
       |      ORDER BY ts ASC, event_id ASC) AS rn_a,
       |    ROW_NUMBER() OVER (PARTITION BY user_id, bucket
       |      ORDER BY ts DESC, event_id DESC) AS rn_d
       |  FROM x)
       |SELECT user_id, bucket,
       |  MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       |  MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       |  MIN(value) AS lo,
       |  MAX(value) AS hi,
       |  COUNT(*) AS n_events,
       |  ${DetSql.dsum("value")} AS volume
       |FROM r
       |GROUP BY user_id, bucket
       |ORDER BY user_id, bucket""".stripMargin

  /** Month-over-month revenue growth — monthly cent-exact revenue with
    * the previous month's value, absolute delta, and growth rate. The
    * deltas subtract two [[Det.dsum]] doubles (bit-identical in both
    * engines) and the rate is one division of those — no rounding
    * needed. The lag window runs over the ~84 month rows (same bounded
    * global-window argument as [[tsCumulativeUsers]]); at scale the
    * pattern partitions by entity. */
  def tsMomGrowth(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("month"))
    Tables.orders(spark, dir)
      .groupBy(trunc(col("o_orderdate"), "month").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        Det.dsum(col("o_totalprice")).as("revenue"))
      .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
      .withColumn("delta", col("revenue") - col("prev_revenue"))
      .withColumn("growth_rate", col("delta") / col("prev_revenue"))
      .orderBy(col("month"))
  }

  val tsMomGrowthSql: String =
    s"""WITH m AS (
       |  SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
       |    COUNT(*) AS n_orders,
       |    ${DetSql.dsum("o_totalprice")} AS revenue
       |  FROM orders GROUP BY 1)
       |SELECT month, n_orders, revenue,
       |  LAG(revenue) OVER (ORDER BY month) AS prev_revenue,
       |  revenue - LAG(revenue) OVER (ORDER BY month) AS delta,
       |  (revenue - LAG(revenue) OVER (ORDER BY month))
       |    / LAG(revenue) OVER (ORDER BY month) AS growth_rate
       |FROM m
       |ORDER BY month""".stripMargin

  /** MAD-based daily anomaly detection per event type — the robust
    * ops-metric monitor (median ± 3·MAD flags outliers without the
    * mean/σ sensitivity to the outliers themselves). Cross-engine
    * exact by construction: daily counts are integers, so the
    * interpolated median is a binary-exact half, deviations and the
    * MAD are exact halves, and 3·MAD is an exact IEEE product — the
    * boolean flag can never disagree by an ulp. Scale shape: the
    * (type, day) rollup is the only corpus-sized shuffle (partial+
    * final); the median/MAD frames are days×types rows, broadcast
    * back. MAD = 0 (constant series) degrades to flagging any
    * deviation, with no division anywhere. */
  def tsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val med = daily.groupBy(col("event_type"))
      .agg(expr("percentile(n, 0.5)").as("med"))
    val dev = daily.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("n") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .select(col("event_type"), col("day"), col("n"), col("med"),
        col("mad"), (col("dev") > lit(3.0) * col("mad")).as("is_anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  val tsAnomalySql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |med AS (
      |  SELECT event_type, quantile_cont(n, 0.5) AS med
      |  FROM daily GROUP BY 1),
      |dev AS (
      |  SELECT d.event_type, d.day, d.n, m.med, ABS(d.n - m.med) AS dev
      |  FROM daily d JOIN med m USING (event_type)),
      |mad AS (
      |  SELECT event_type, quantile_cont(dev, 0.5) AS mad
      |  FROM dev GROUP BY 1)
      |SELECT d.event_type, d.day, d.n, d.med, mad.mad AS mad,
      |  d.dev > 3.0 * mad.mad AS is_anomaly
      |FROM dev d JOIN mad USING (event_type)
      |ORDER BY event_type, day""".stripMargin

  /** Gaps-and-islands streak detection — longest run of CONSECUTIVE
    * order days per customer, via the classic rank-difference trick:
    * day_number − row_number is constant within a consecutive run, so
    * one per-customer window plus a (customer, island) aggregate finds
    * every streak with no self-join. Integer day arithmetic end to
    * end. Top-100 customers by streak for a bounded result
    * (deterministic total order: streak desc, custkey). */
  def winStreaks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("dayn"))
    val days = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01')")
          .cast("long").as("dayn"))
      .distinct()
    days.withColumn("grp", col("dayn") - row_number().over(w))
      .groupBy(col("o_custkey"), col("grp"))
      .agg(count(lit(1)).as("streak"), min(col("dayn")).as("start_day"))
      .groupBy(col("o_custkey"))
      .agg(max(struct(col("streak"), (-col("start_day")).as("neg"))).as("best"),
        count(lit(1)).as("n_streaks"))
      .select(col("o_custkey"), col("best.streak").as("longest_streak"),
        (-col("best.neg")).as("streak_start_day"), col("n_streaks"))
      .orderBy(col("longest_streak").desc, col("o_custkey"))
      .limit(100)
  }

  val winStreaksSql: String =
    """WITH days AS (
      |  SELECT DISTINCT o_custkey,
      |    CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
      |      AS BIGINT) AS dayn
      |  FROM orders),
      |isl AS (
      |  SELECT o_custkey, dayn,
      |    dayn - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY dayn)
      |      AS grp
      |  FROM days),
      |st AS (
      |  SELECT o_custkey, grp, COUNT(*) AS streak, MIN(dayn) AS start_day
      |  FROM isl GROUP BY 1, 2),
      |best AS (
      |  SELECT o_custkey, streak AS longest_streak,
      |    start_day AS streak_start_day,
      |    COUNT(*) OVER (PARTITION BY o_custkey) AS n_streaks,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY streak DESC, start_day) AS rn
      |  FROM st)
      |SELECT o_custkey, longest_streak, streak_start_day, n_streaks
      |FROM best WHERE rn = 1
      |ORDER BY longest_streak DESC, o_custkey
      |LIMIT 100""".stripMargin

  /** Batch sessionization — the gap-rule sessionizer every behavioral
    * pipeline needs in BATCH form (the streaming twin is
    * [[graft.operators.Streams]] `stream_session`): a >30-minute gap
    * between a user's consecutive events starts a new session; the
    * running sum of new-session flags numbers sessions; one aggregate
    * per (user, session) emits start/end/size/duration. Deterministic
    * under timestamp ties via the (us, event_id) total order, and both
    * windows share ONE per-user sort; the (user, session_no) rollup is
    * the only other shuffle. Duration is an exact integer µs diff with
    * a single IEEE division at the end. At scale this is the textbook
    * shape: state per task bounds by one user's events, never the
    * corpus. */
  def winSessionize(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = 1800000000L // 30 min in µs
    val wo = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val wr = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        Det.epochUs(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(wo))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sess_no", sum(col("new_sess")).over(wr))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        ((max(col("us")) - min(col("us"))).cast("double") / 1000000.0)
          .as("duration_sec"))
      .orderBy(col("user_id"), col("sess_no"))
  }

  val winSessionizeSql: String =
    """WITH x AS (
      |  SELECT event_id, user_id, ts, epoch_us(ts) AS us FROM events),
      |g AS (
      |  SELECT event_id, user_id, ts, us,
      |    CASE WHEN LAG(us) OVER w IS NULL
      |              OR us - LAG(us) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM x
      |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |s AS (
      |  SELECT user_id, ts, us,
      |    CAST(SUM(new_sess) OVER (PARTITION BY user_id
      |      ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS sess_no
      |  FROM g)
      |SELECT user_id, sess_no,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  COUNT(*) AS n_events,
      |  CAST(MAX(us) - MIN(us) AS DOUBLE) / 1000000.0 AS duration_sec
      |FROM s GROUP BY 1, 2
      |ORDER BY user_id, sess_no""".stripMargin

  /** Exponentially-weighted moving average of daily event volume per
    * type — the smoothing baseline behind ops dashboards and drift
    * monitors, built CROSS-ENGINE-EXACT: the recursive EWMA is
    * unrolled to an explicit 8-term lag chain with α = 1/2, so every
    * weight 2^-k is a power of two (exactly representable), every
    * term n·2^-k is an exact IEEE product (n < 2^52), and the
    * numerator/denominator are the SAME left-associated additions in
    * both engines — no ulp drift, no window-order ambiguity. Missing
    * leading lags drop out of both sums (partial-window
    * renormalization, the standard `adjust=true` EWMA). The 8 lags
    * share one per-type sort; the daily rollup is the only
    * corpus-sized shuffle. */
  def tsEwma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val lagged = daily.select(
      col("event_type") +: col("day") +: col("n") +:
        (0 to 7).map(k => lag(col("n"), k).over(w).as(s"l$k")): _*)
    val wt = (0 to 7).map(k => math.pow(0.5, k))
    val num = (0 to 7).map(k =>
        when(col(s"l$k").isNull, lit(0.0))
          .otherwise(col(s"l$k").cast("double") * lit(wt(k))))
      .reduce(_ + _)
    val den = (0 to 7).map(k =>
        when(col(s"l$k").isNull, lit(0.0)).otherwise(lit(wt(k))))
      .reduce(_ + _)
    lagged.select(col("event_type"), col("day"), col("n"),
        (num / den).as("ewma"))
      .orderBy(col("event_type"), col("day"))
  }

  val tsEwmaSql: String = {
    val wt = (0 to 7).map(k => math.pow(0.5, k))
    val lags = (0 to 7).map(k =>
      s"LAG(n, $k) OVER (PARTITION BY event_type ORDER BY day) AS l$k")
      .mkString(",\n    ")
    val num = (0 to 7).map(k =>
      s"CASE WHEN l$k IS NULL THEN 0.0 ELSE CAST(l$k AS DOUBLE) * ${wt(k)} END")
      .mkString(" + ")
    val den = (0 to 7).map(k =>
      s"CASE WHEN l$k IS NULL THEN 0.0 ELSE ${wt(k)} END")
      .mkString(" + ")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
       |  FROM events GROUP BY 1, 2),
       |lagged AS (
       |  SELECT event_type, day, n,
       |    $lags
       |  FROM daily)
       |SELECT event_type, day, n,
       |  ($num) / ($den) AS ewma
       |FROM lagged
       |ORDER BY event_type, day""".stripMargin
  }

  /** 8-step discounted return per event — the RL / agentic-trajectory
    * data prep: each event's return is Σ γ^k · reward_{t+k} over the
    * next 8 steps of the SAME user's event sequence, γ = 1/2.
    * Cross-engine exact by the [[tsEwma]] unrolling discipline turned
    * integer: rewards become exact cents ([[graft.core.Det.cents]]),
    * each weight γ^k scales by the power of two 2^(7-k), so the
    * 8-term accumulator is a BIGINT sum (exact, order-free) and the
    * single float op is the final division by 2^7·100. The 8 leads
    * share one per-user sort; at 100 TB this is one user-keyed
    * shuffle, state bounded at 8 rows per frame — no per-trajectory
    * collect, no recursion. */
  def tsDiscountedReturn(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val base = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), Det.epochUs(col("ts")).as("us"),
        Det.cents(col("value")).as("vc"))
    val led = base.select(
      col("user_id") +: col("event_id") +: col("us") +: col("vc") +:
        (0 to 7).map(k => lead(col("vc"), k).over(w).as(s"f$k")): _*)
    val g = (0 to 7).map(k =>
        coalesce(col(s"f$k"), lit(0L)) * lit(1L << (7 - k)))
      .reduce(_ + _)
    led.select(col("user_id"), col("event_id"), col("us"), col("vc"),
        (g.cast("double") / lit(12800.0)).as("ret8"))
      .orderBy(col("event_id"))
  }

  val tsDiscountedReturnSql: String = {
    val leads = (0 to 7).map(k =>
      s"LEAD(vc, $k) OVER (PARTITION BY user_id ORDER BY us, event_id) AS f$k")
      .mkString(",\n    ")
    val g = (0 to 7).map(k =>
      s"COALESCE(f$k, 0) * ${1L << (7 - k)}").mkString(" + ")
    s"""WITH base AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us,
       |    ${graft.core.DetSql.cents("value")} AS vc
       |  FROM events),
       |led AS (
       |  SELECT user_id, event_id, us, vc,
       |    $leads
       |  FROM base)
       |SELECT user_id, event_id, us, vc,
       |  CAST($g AS DOUBLE) / 12800.0 AS ret8
       |FROM led
       |ORDER BY event_id""".stripMargin
  }

  /** Pareto concentration report — the 80/20 revenue question asked of
    * every customer base: customers ranked by exact-cents revenue
    * descending, cumulative share thresholds. One row per decile rank
    * band plus the headline: how few customers carry 80% of revenue.
    * All sums are BIGINT cents; shares divide two exact BIGINTs. The
    * rank and the running sum share ONE whole-frame sort — fine here
    * because the frame is CUSTOMERS (already one aggregate smaller
    * than orders); at true scale the decile cut would ride
    * `approx_percentile` over the same per-customer aggregate. */
  def winPareto(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(Det.cents(col("o_totalprice"))).as("rev"))
    val w = Window.orderBy(col("rev").desc, col("o_custkey"))
    val ranked = perCust
      .withColumn("rn", row_number().over(w))
      .withColumn("cum", sum(col("rev")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val n = ranked.groupBy()
      .agg(count(lit(1)).as("n_cust"), max(col("cum")).as("total"))
    ranked.crossJoin(broadcast(n))
      .withColumn("decile",
        least(expr("(rn - 1) * 10 DIV n_cust"), lit(9L)))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        (max(col("cum")).cast("double") / max(col("total")).cast("double"))
          .as("cum_share"),
        sum(when(col("cum") * 5 <= col("total") * 4, 1L).otherwise(0L))
          .as("n_inside_80pct"))
      .orderBy(col("decile"))
  }

  val winParetoSql: String =
    s"""WITH perc AS (
       |  SELECT o_custkey,
       |    CAST(SUM(${DetSql.cents("o_totalprice")}) AS BIGINT) AS rev
       |  FROM orders GROUP BY o_custkey),
       |ranked AS (
       |  SELECT o_custkey, rev,
       |    ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS rn,
       |    SUM(rev) OVER (ORDER BY rev DESC, o_custkey
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM perc),
       |tot AS (SELECT count(*) AS n_cust, MAX(cum) AS total FROM ranked)
       |SELECT LEAST((rn - 1) * 10 // n_cust, 9) AS decile,
       |  count(*) AS n_customers,
       |  CAST(MAX(cum) AS DOUBLE) / CAST(MAX(total) AS DOUBLE) AS cum_share,
       |  CAST(SUM(CASE WHEN cum * 5 <= total * 4 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_inside_80pct
       |FROM ranked, tot
       |GROUP BY 1
       |ORDER BY decile""".stripMargin

  /** Seasonal-naive forecast backtest — the baseline every forecasting
    * pipeline must beat before a model earns its keep: forecast(day) =
    * actual(day − 7) (seasonal-naive) vs actual(day − 1) (naive), MAE
    * of both over the scorable days per event type, and the verdict
    * column. Counts are BIGINTs, absolute errors are BIGINTs, so each
    * MAE is one exact-int IEEE division — no float accumulates. The 2
    * lags share one per-type sort; the rollup is a 5-group aggregate.
    * Lag over DAYS PRESENT (events fire daily at these scales; a
    * production spine would gapfill first — [[tsGapfill]] is that
    * stage). */
  def tsForecastSnaive(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    daily
      .withColumn("f_naive", lag(col("n"), 1).over(w))
      .withColumn("f_snaive", lag(col("n"), 7).over(w))
      .where(col("f_snaive").isNotNull) // score both on the same days
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        (sum(abs(col("n") - col("f_naive"))) / count(lit(1))).as("mae_naive"),
        (sum(abs(col("n") - col("f_snaive"))) / count(lit(1))).as("mae_snaive"))
      .withColumn("seasonal_wins", col("mae_snaive") < col("mae_naive"))
      .orderBy(col("event_type"))
  }

  val tsForecastSnaiveSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |lagged AS (
      |  SELECT event_type, day, n,
      |    LAG(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS f_naive,
      |    LAG(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS f_snaive
      |  FROM daily),
      |scored AS (SELECT * FROM lagged WHERE f_snaive IS NOT NULL)
      |SELECT event_type, count(*) AS n_days,
      |  CAST(SUM(ABS(n - f_naive)) AS BIGINT) / count(*) AS mae_naive,
      |  CAST(SUM(ABS(n - f_snaive)) AS BIGINT) / count(*) AS mae_snaive,
      |  CAST(SUM(ABS(n - f_snaive)) AS BIGINT) / count(*)
      |    < CAST(SUM(ABS(n - f_naive)) AS BIGINT) / count(*) AS seasonal_wins
      |FROM scored
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** [[tsForecastHolt]] level/trend lag coefficients: the α = β = ½
    * Holt recursions `l_t = ½y_t + ½(l+b)_{t-1}`,
    * `b_t = ¼y_t − ¼l_{t-1} + ¾b_{t-1}` unrolled 8 steps from zero
    * state — every weight is dyadic, so scaled by 2¹⁶ they are EXACT
    * integers (derived offline from powers of the state matrix
    * [[½,½],[−¼,¾]]; the >8-lag tail is truncated, the [[tsEwma]]
    * discipline). */
  private val HoltScale = 65536L
  private val HoltLevelFp =
    Seq(32768L, 24576L, 14336L, 5632L, -128L, -2976L, -3656L, -3082L)
  private val HoltTrendFp =
    Seq(16384L, 4096L, -3072L, -5888L, -5824L, -4336L, -2508L, -967L)

  /** Holt linear-trend forecast backtest — [[tsForecastSnaive]]'s
    * trend-capable upgrade: per event type, fit level+trend at the
    * cutoff day (3 days before the series end) from the last 8
    * observations via the exact integer coefficients above, forecast
    * `ŷ(h) = level + h·trend` for h = 1..3, and score against the
    * held-out actuals. Everything to the error is BIGINT in 2¹⁶
    * fixed-point — the single float op is the final display division —
    * so both engines agree bit-exactly.
    *
    * Scale shape: one event scan → daily aggregate, ONE per-type
    * window sort shared by all 8 lags, the 3 leads, and the max-day
    * anchor; the cutoff filter leaves one row per type before the
    * 3-row horizon explode. State per frame is 11 rows — no
    * per-series collect, no recursion. */
  def tsForecastHolt(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("event_type"))
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val anchored = daily.select(
      col("event_type") +: col("day") +:
        max(col("day")).over(wAll).as("max_day") +:
        ((0 to 7).map(k =>
          coalesce(lag(col("n"), k).over(w), lit(0L)).as(s"l$k")) ++
         (1 to 3).map(h => lead(col("n"), h).over(w).as(s"a$h"))): _*)
      .where(col("day") === expr("date_sub(max_day, 3)"))
    val levelFp = (0 to 7).map(k => col(s"l$k") * lit(HoltLevelFp(k)))
      .reduce(_ + _)
    val trendFp = (0 to 7).map(k => col(s"l$k") * lit(HoltTrendFp(k)))
      .reduce(_ + _)
    anchored
      .withColumn("level_fp", levelFp)
      .withColumn("trend_fp", trendFp)
      .selectExpr("event_type", "level_fp", "trend_fp",
        "stack(3, 1, a1, 2, a2, 3, a3) AS (h, actual)")
      .select(col("event_type"), col("h"), col("actual"),
        col("level_fp"), col("trend_fp"),
        (col("level_fp") + col("h") * col("trend_fp")).as("forecast_fp"))
      .withColumn("forecast",
        expr(s"CAST(forecast_fp AS DOUBLE) / $HoltScale.0d"))
      .withColumn("abs_err_fp",
        abs(col("actual") * lit(HoltScale) - col("forecast_fp")))
      .select(col("event_type"), col("h"), col("forecast_fp"),
        col("forecast"), col("actual"), col("abs_err_fp"))
      .orderBy(col("event_type"), col("h"))
  }

  val tsForecastHoltSql: String = {
    val lags = ((0 to 7).map(k =>
      s"COALESCE(LAG(n, $k) OVER w, 0) AS l$k") ++
      (1 to 3).map(h => s"LEAD(n, $h) OVER w AS a$h"))
      .mkString(",\n    ")
    val levelFp = (0 to 7).map(k => s"l$k * (${HoltLevelFp(k)})")
      .mkString(" + ")
    val trendFp = (0 to 7).map(k => s"l$k * (${HoltTrendFp(k)})")
      .mkString(" + ")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2),
       |anchored AS (
       |  SELECT event_type, day,
       |    MAX(day) OVER (PARTITION BY event_type) AS max_day,
       |    $lags
       |  FROM daily
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       |cut AS (
       |  SELECT *, CAST($levelFp AS BIGINT) AS level_fp,
       |    CAST($trendFp AS BIGINT) AS trend_fp
       |  FROM anchored WHERE day = max_day - 3),
       |fc AS (
       |  SELECT event_type, h, level_fp, trend_fp,
       |    level_fp + h * trend_fp AS forecast_fp,
       |    CASE h WHEN 1 THEN a1 WHEN 2 THEN a2 ELSE a3 END AS actual
       |  FROM cut, unnest([1, 2, 3]) AS t(h))
       |SELECT event_type, h, forecast_fp,
       |  CAST(forecast_fp AS DOUBLE) / $HoltScale.0 AS forecast,
       |  actual,
       |  ABS(actual * $HoltScale - forecast_fp) AS abs_err_fp
       |FROM fc
       |ORDER BY event_type, h""".stripMargin
  }

  /** Weekly-cohort LTV curve — the product-analytics companion of
    * [[tsCohortRetention]] that tracks MONEY instead of presence: per
    * signup-week cohort and age-in-weeks, the cohort's cumulative
    * purchase revenue and the exact per-user LTV so far. Weeks are
    * integer epoch-day buckets (`days div 7` — engine-identical where
    * date_trunc('week') semantics could differ); revenue is exact
    * cents ([[graft.core.Det.cents]] per row, BIGINT sums); the
    * cumulative ride is a window over ≤|weeks| rows per cohort; the
    * per-user division is one BIGINT `div`.
    *
    * Scale shape: one user-keyed aggregate pins each user's cohort,
    * one (user, week) revenue aggregate off the same scan shape, a
    * broadcast-sized cohort map join, ONE (cohort, age) aggregate, and
    * a window over the tiny cohort×age frame. All money stays integer
    * until display. */
  def tsCohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)" +
          " div 7").as("wk"),
        when(col("event_type") === "purchase", Det.cents(col("value")))
          .otherwise(0L).as("cents"))
    val cohort = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    val weekly = e.groupBy(col("user_id"), col("wk"))
      .agg(sum(col("cents")).as("cents"))
    val sizes = cohort.groupBy(col("cohort_wk"))
      .agg(count(lit(1)).as("cohort_users"))
    val byAge = weekly.join(cohort, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("age_wk"))
      .agg(sum(col("cents")).as("rev_cents"),
        count(lit(1)).as("n_active_users"))
    val wCum = Window.partitionBy(col("cohort_wk")).orderBy(col("age_wk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byAge.join(broadcast(sizes), "cohort_wk")
      .withColumn("cum_rev_cents", sum(col("rev_cents")).over(wCum))
      .withColumn("ltv_cents_per_user",
        expr("cum_rev_cents div cohort_users"))
      .select(col("cohort_wk"), col("age_wk"), col("cohort_users"),
        col("n_active_users"), col("rev_cents"), col("cum_rev_cents"),
        col("ltv_cents_per_user"))
      .orderBy(col("cohort_wk"), col("age_wk"))
  }

  val tsCohortLtvSql: String =
    s"""WITH e AS (
       |  SELECT user_id,
       |    CAST((CAST(ts AS DATE) - DATE '1970-01-01') AS BIGINT) // 7
       |      AS wk,
       |    CASE WHEN event_type = 'purchase'
       |      THEN ${graft.core.DetSql.cents("value")} ELSE 0 END AS cents
       |  FROM events),
       |cohort AS (
       |  SELECT user_id, CAST(MIN(wk) AS BIGINT) AS cohort_wk
       |  FROM e GROUP BY user_id),
       |weekly AS (
       |  SELECT user_id, wk, CAST(SUM(cents) AS BIGINT) AS cents
       |  FROM e GROUP BY 1, 2),
       |sizes AS (
       |  SELECT cohort_wk, CAST(COUNT(*) AS BIGINT) AS cohort_users
       |  FROM cohort GROUP BY 1),
       |by_age AS (
       |  SELECT c.cohort_wk, w.wk - c.cohort_wk AS age_wk,
       |    CAST(SUM(w.cents) AS BIGINT) AS rev_cents,
       |    CAST(COUNT(*) AS BIGINT) AS n_active_users
       |  FROM weekly w JOIN cohort c ON c.user_id = w.user_id
       |  GROUP BY 1, 2)
       |SELECT b.cohort_wk, b.age_wk, s.cohort_users, b.n_active_users,
       |  b.rev_cents,
       |  CAST(SUM(b.rev_cents) OVER (PARTITION BY b.cohort_wk
       |    ORDER BY b.age_wk ROWS BETWEEN UNBOUNDED PRECEDING
       |    AND CURRENT ROW) AS BIGINT) AS cum_rev_cents,
       |  CAST(SUM(b.rev_cents) OVER (PARTITION BY b.cohort_wk
       |    ORDER BY b.age_wk ROWS BETWEEN UNBOUNDED PRECEDING
       |    AND CURRENT ROW) AS BIGINT) // s.cohort_users
       |    AS ltv_cents_per_user
       |FROM by_age b JOIN sizes s ON s.cohort_wk = b.cohort_wk
       |ORDER BY b.cohort_wk, b.age_wk""".stripMargin

  /** Multi-touch attribution matrix — the marketing-analytics credit
    * assignment: each purchase credits the user's FIRST-ever touch
    * channel and the LAST channel before the purchase (first-touch /
    * last-touch, the two standard models), rolled up as the
    * (first_touch, last_touch) transition matrix with purchase count
    * and exact-cents revenue. Both window passes share ONE per-user
    * sort (same partition, same order — a single shuffle); a purchase
    * opening a user's history credits itself as first touch and 'none'
    * as last touch. Revenue is an exact BIGINT cent sum with a single
    * final IEEE division. */
  def winAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), Det.epochUs(col("ts")).as("us"),
        col("event_type"), Det.cents(col("value")).as("vc"))
      .withColumn("first_touch", first(col("event_type")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("last_touch", coalesce(
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(
            w.rowsBetween(Window.unboundedPreceding, -1)),
        lit("none")))
    e.where(col("event_type") === "purchase")
      .groupBy(col("first_touch"), col("last_touch"))
      .agg(count(lit(1)).as("n_purchases"),
        (sum(col("vc")).cast("double") / lit(100.0)).as("revenue"))
      .orderBy(col("first_touch"), col("last_touch"))
  }

  val winAttributionSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
       |    ${DetSql.cents("value")} AS vc
       |  FROM events),
       |touched AS (
       |  SELECT user_id, event_type, vc,
       |    FIRST_VALUE(event_type) OVER (PARTITION BY user_id
       |      ORDER BY us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_touch,
       |    COALESCE(LAST_VALUE(CASE WHEN event_type <> 'purchase'
       |        THEN event_type END IGNORE NULLS) OVER (PARTITION BY user_id
       |      ORDER BY us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      'none') AS last_touch
       |  FROM e)
       |SELECT first_touch, last_touch, count(*) AS n_purchases,
       |  CAST(SUM(vc) AS DOUBLE) / 100.0 AS revenue
       |FROM touched
       |WHERE event_type = 'purchase'
       |GROUP BY 1, 2
       |ORDER BY first_touch, last_touch""".stripMargin

  /** Day-of-week seasonality profile of order volume — the weekly
    * cycle report behind capacity planning and anomaly baselines.
    * Spark's `dayofweek` is Sunday=1; the oracle remaps ISODOW the
    * same way (the [[graft.operators.Functions.fnDate]] convention).
    * One 7-group aggregate; the share window runs over 7 rows. */
  def tsSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy() // 7 dow rows
    Tables.orders(spark, dir)
      .groupBy(dayofweek(col("o_orderdate")).as("dow"))
      .agg(count(lit(1)).as("n_orders"),
        Det.dsum(col("o_totalprice")).as("sum_price"))
      .withColumn("pct_orders",
        col("n_orders").cast("double") /
          sum(col("n_orders")).over(w).cast("double"))
      .select(col("dow"), col("n_orders"), col("sum_price"), col("pct_orders"))
      .orderBy(col("dow"))
  }

  val tsSeasonalitySql: String =
    s"""WITH d AS (
       |  SELECT CAST(ISODOW(o_orderdate) % 7 + 1 AS INT) AS dow,
       |    COUNT(*) AS n_orders,
       |    ${DetSql.dsum("o_totalprice")} AS sum_price
       |  FROM orders GROUP BY 1)
       |SELECT dow, n_orders, sum_price,
       |  CAST(n_orders AS DOUBLE) / CAST(SUM(n_orders) OVER () AS DOUBLE)
       |    AS pct_orders
       |FROM d
       |ORDER BY dow""".stripMargin

  /** Daily OHLC candles per event type — the market-data shape of
    * first/last-in-group. open/close are value SELECTIONS (no
    * arithmetic): the first/last row of each (type, day) ordered by
    * (ts, event_id) — the event_id tie-break makes the pick total even
    * on duplicate timestamps, so the doubles are engine-exact without
    * [[graft.core.Det]] plumbing. One shuffle on (event_type, day);
    * both row_number and the full-frame count share the same window
    * sort, then the candle is a plain hash aggregate. At 100 TB the
    * (type, day) key space is what bounds state, not row count. */
  def tsOhlc(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Window.partitionBy(col("event_type"), col("day"))
    val w = byDay.orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("day", col("ts").cast("date"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(byDay))
      .groupBy(col("event_type"), col("day"))
      .agg(
        max(when(col("rn") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rn") === col("cnt"), col("value"))).as("close"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("day"))
  }

  val tsOhlcSql: String =
    """WITH b AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, value,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
      |      ORDER BY ts, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type, CAST(ts AS DATE)) AS cnt
      |  FROM events)
      |SELECT event_type, day,
      |  MAX(CASE WHEN rn = 1 THEN value END) AS open,
      |  MAX(value) AS high,
      |  MIN(value) AS low,
      |  MAX(CASE WHEN rn = cnt THEN value END) AS close,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM b
      |GROUP BY event_type, day
      |ORDER BY event_type, day""".stripMargin

  /** Rolling-split changepoint detection on the daily count series: for
    * each day, the mean of the 7 preceding days vs the mean of the
    * current-plus-6 following days. The score stays as cross-multiplied
    * BIGINT sums (|sum_next·n_prev − sum_prev·n_next| — integer-exact
    * in both engines); days rank per type by RELATIVE shift
    * score/(sum_prev·n_next), one identical IEEE division per row from
    * identical exact integers, computed only on complete 7+7 windows
    * (counts are positive, so the denominator never vanishes), and the
    * top 3 per type are flagged — rank-based rather than an absolute
    * threshold, because a count series concentrates with scale factor
    * (CLT) and no fixed cutoff fires at every sf. Cost: one (type,
    * day)-keyed aggregate, two frames over ONE per-type window sort,
    * then a rank over the same partition — the series is |types|×|days|
    * rows, driver-free and tiny relative to the event scan at any
    * scale. */
  def tsChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wPrev = byType.rowsBetween(-7, -1)
    val wNext = byType.rowsBetween(0, 6)
    val wRank = Window.partitionBy(col("event_type"))
      .orderBy(col("rel").desc_nulls_last, col("day"))
    Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("day"), col("n"),
        sum(col("n")).over(wPrev).as("sum_prev"),
        count(lit(1)).over(wPrev).as("n_prev"),
        sum(col("n")).over(wNext).as("sum_next"),
        count(lit(1)).over(wNext).as("n_next"))
      .withColumn("score",
        when(col("n_prev") === 7 && col("n_next") === 7,
          abs(col("sum_next") * col("n_prev") - col("sum_prev") * col("n_next"))))
      .withColumn("rel",
        (col("score").cast("double") /
          (col("sum_prev") * col("n_next")).cast("double")))
      .withColumn("shift_rank", row_number().over(wRank))
      .withColumn("is_shift",
        col("score").isNotNull && col("shift_rank") <= 3)
      .select(col("event_type"), col("day"), col("n"), col("sum_prev"),
        col("n_prev"), col("sum_next"), col("n_next"), col("score"),
        col("is_shift"))
      .orderBy(col("event_type"), col("day"))
  }

  val tsChangepointSql: String =
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |f AS (
      |  SELECT event_type, day, n,
      |    CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS sum_prev,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS n_prev,
      |    CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING) AS BIGINT) AS sum_next,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING) AS BIGINT) AS n_next
      |  FROM d),
      |g AS (
      |  SELECT *,
      |    CASE WHEN n_prev = 7 AND n_next = 7
      |      THEN ABS(sum_next * n_prev - sum_prev * n_next) END AS score
      |  FROM f),
      |r AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY
      |      CAST(score AS DOUBLE) / (sum_prev * n_next) DESC NULLS LAST,
      |      day) AS shift_rank
      |  FROM g)
      |SELECT event_type, day, n, sum_prev, n_prev, sum_next, n_next,
      |  score, score IS NOT NULL AND shift_rank <= 3 AS is_shift
      |FROM r
      |ORDER BY event_type, day""".stripMargin

  /** Autocorrelation of the daily count series at lags 1–3 per event
    * type — the stationarity probe run before seasonal modeling. Pair
    * building is lead() over one per-type window sort, unpivoted with
    * stack; every moment (Σx, Σy, Σx², Σy², Σxy, m) is an exact BIGINT
    * sum of integer products, and Pearson r over a lag's pairs is then
    * num/√(dx·dy) — two exact-int casts, one multiply, one
    * correctly-rounded sqrt, one division: the same IEEE ops in both
    * engines, so r is bit-identical. A constant window (den = 0) yields
    * NULL via the nullif guard instead of an ANSI division error. */
  def tsAcf(spark: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val pairs = daily
      .select(col("event_type"), col("n"),
        lead(col("n"), 1).over(byType).as("y1"),
        lead(col("n"), 2).over(byType).as("y2"),
        lead(col("n"), 3).over(byType).as("y3"))
      .selectExpr("event_type", "n AS x",
        "stack(3, 1, y1, 2, y2, 3, y3) AS (lag, y)")
      .where(col("y").isNotNull)
    pairs.groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("m"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("num",
        (col("m") * col("sxy") - col("sx") * col("sy")).cast("double"))
      .withColumn("den",
        sqrt((col("m") * col("sxx") - col("sx") * col("sx")).cast("double") *
             (col("m") * col("syy") - col("sy") * col("sy")).cast("double")))
      .select(col("event_type"), col("lag"), col("m"),
        expr("num / nullif(den, 0.0d)").as("r"))
      .orderBy(col("event_type"), col("lag"))
  }

  val tsAcfSql: String =
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |led AS (
      |  SELECT event_type, n AS x,
      |    LEAD(n, 1) OVER w AS y1, LEAD(n, 2) OVER w AS y2,
      |    LEAD(n, 3) OVER w AS y3
      |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      |pairs AS (
      |  SELECT event_type, x, lag, y FROM led,
      |    LATERAL (VALUES (1, y1), (2, y2), (3, y3)) AS t(lag, y)
      |  WHERE y IS NOT NULL),
      |mom AS (
      |  SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS m,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(y * y) AS BIGINT) AS syy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy
      |  FROM pairs GROUP BY 1, 2)
      |SELECT event_type, CAST(lag AS INT) AS lag, m,
      |  CAST(m * sxy - sx * sy AS DOUBLE) /
      |    NULLIF(SQRT(CAST(m * sxx - sx * sx AS DOUBLE) *
      |                CAST(m * syy - sy * sy AS DOUBLE)), 0.0) AS r
      |FROM mom
      |ORDER BY event_type, lag""".stripMargin

  /** The (leading, lagging) series pair [[tsLagCorr]] correlates. */
  private val LagCorrX = "view"
  private val LagCorrY = "purchase"

  /** Cross-correlation between two event types' daily count series at
    * lags 0–3: does view volume LEAD purchase volume, and by how many
    * days? The lead/lag analytics question behind campaign attribution
    * and demand forecasting — [[tsAcf]]'s machinery pointed across two
    * series instead of one. Pairing is an equi-join: each x-day row
    * explodes into 4 (lag, day+lag) probes that join y's calendar
    * day — no window over an unpartitioned series, no cross join. The
    * Pearson r per lag comes from the same exact BIGINT moment sums as
    * [[tsAcf]] (one multiply, one sqrt, one guarded division in
    * floats), so both engines agree bit-exactly. Costs: two daily
    * aggregates over the event scan, a 4×-days probe join, one 4-group
    * moment agg — the scan dominates at any scale. */
  def tsLagCorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val xs = daily.where(col("event_type") === LagCorrX)
      .select(col("day"), col("n").as("x"))
      .select(col("day"), col("x"),
        explode(lit((0 to 3).toArray)).as("lag"))
      .select(expr("date_add(day, lag)").as("yday"), col("x"), col("lag"))
    val ys = daily.where(col("event_type") === LagCorrY)
      .select(col("day").as("yday"), col("n").as("y"))
    xs.join(ys, "yday")
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("m"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("num",
        (col("m") * col("sxy") - col("sx") * col("sy")).cast("double"))
      .withColumn("den",
        sqrt((col("m") * col("sxx") - col("sx") * col("sx")).cast("double") *
             (col("m") * col("syy") - col("sy") * col("sy")).cast("double")))
      .select(col("lag"), col("m"), expr("num / nullif(den, 0.0d)").as("r"))
      .orderBy(col("lag"))
  }

  val tsLagCorrSql: String =
    s"""WITH d AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2),
       |xs AS (
       |  SELECT day + lag AS yday, n AS x, lag
       |  FROM d, unnest([0, 1, 2, 3]) AS t(lag)
       |  WHERE event_type = '$LagCorrX'),
       |ys AS (
       |  SELECT day AS yday, n AS y FROM d
       |  WHERE event_type = '$LagCorrY'),
       |mom AS (
       |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS m,
       |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(x * x) AS BIGINT) AS sxx,
       |    CAST(SUM(y * y) AS BIGINT) AS syy,
       |    CAST(SUM(x * y) AS BIGINT) AS sxy
       |  FROM xs JOIN ys USING (yday) GROUP BY lag)
       |SELECT lag, m,
       |  CAST(m * sxy - sx * sy AS DOUBLE) /
       |    NULLIF(SQRT(CAST(m * sxx - sx * sx AS DOUBLE) *
       |                CAST(m * syy - sy * sy AS DOUBLE)), 0.0) AS r
       |FROM mom
       |ORDER BY lag""".stripMargin

  /** Theil–Sen robust trend of the daily count series per event type:
    * the median slope over all day pairs, then the median residual as
    * intercept — the outlier-resistant regression line (a single
    * anomalous day cannot move it, unlike least squares). Day offsets
    * anchor to each type's first day via a window min (no driver
    * readback). The pair join keeps its event_type equi-key (range is
    * a post-join filter, same shape as join_theta_range), and the pair
    * count is |days|²/2 PER TYPE — bounded by the series length, not
    * the event count, so the event scan dominates at any data scale;
    * very long series would cap pair lag, trading a little statistical
    * efficiency for linear cost. Slopes/residuals are exact-int
    * differences under one identical IEEE division/multiply; the
    * median is the same linear-interpolated quantile in both engines
    * (the [[graft.operators.Relational.aggPercentile]] contract). */
  def tsTheilSen(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val anchored = daily.withColumn("x",
      datediff(col("day"),
        min(col("day")).over(Window.partitionBy(col("event_type")))))
    val a = anchored.select(col("event_type"), col("x").as("x1"),
      col("n").as("n1"))
    val b = anchored.select(col("event_type"), col("x").as("x2"),
      col("n").as("n2"))
    val slopes = a.join(b, Seq("event_type"))
      .where(col("x2") > col("x1"))
      .select(col("event_type"),
        ((col("n2") - col("n1")).cast("double") /
          (col("x2") - col("x1")).cast("double")).as("slope"))
    val slopeMed = slopes.groupBy(col("event_type"))
      .agg(expr("percentile(slope, 0.5)").as("slope"))
    val intercept = anchored.join(broadcast(slopeMed), Seq("event_type"))
      .select(col("event_type"),
        (col("n").cast("double") - col("slope") * col("x")).as("res"))
      .groupBy(col("event_type"))
      .agg(expr("percentile(res, 0.5)").as("intercept"))
    val nDays = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"))
    slopeMed.join(intercept, Seq("event_type"))
      .join(broadcast(nDays), Seq("event_type"))
      .orderBy(col("event_type"))
  }

  val tsTheilSenSql: String =
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |a AS (
      |  SELECT event_type, n,
      |    datediff('day', MIN(day) OVER (PARTITION BY event_type), day)
      |      AS x
      |  FROM d),
      |p AS (
      |  SELECT a1.event_type,
      |    CAST(a2.n - a1.n AS DOUBLE) / CAST(a2.x - a1.x AS DOUBLE)
      |      AS slope
      |  FROM a a1 JOIN a a2
      |    ON a1.event_type = a2.event_type AND a2.x > a1.x),
      |sm AS (
      |  SELECT event_type, quantile_cont(slope, 0.5) AS slope
      |  FROM p GROUP BY 1),
      |r AS (
      |  SELECT a.event_type, CAST(a.n AS DOUBLE) - sm.slope * a.x AS res
      |  FROM a JOIN sm USING (event_type)),
      |i AS (
      |  SELECT event_type, quantile_cont(res, 0.5) AS intercept
      |  FROM r GROUP BY 1),
      |nd AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
      |  FROM d GROUP BY 1)
      |SELECT sm.event_type, sm.slope, i.intercept, nd.n_days
      |FROM sm JOIN i USING (event_type) JOIN nd USING (event_type)
      |ORDER BY sm.event_type""".stripMargin

  /** Rolling 7-day median of the daily count series — the robust
    * smoother that shrugs off single-day spikes where a rolling mean
    * follows them. The windowed percentile buffers only the 7-row
    * frame per step; per-type partitions keep state bounded by series
    * length. The interpolated quantile over exact BIGINT day counts is
    * the same formula in both engines (the [[graft.operators
    * .Relational.aggPercentile]] contract), and the frame contents are
    * identical because (type, day) is a total order. */
  def tsRollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, 0)
    Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("med7", expr("percentile(n, 0.5)")
        .over(w))
      .orderBy(col("event_type"), col("day"))
  }

  val tsRollingMedianSql: String =
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, day, n,
      |  quantile_cont(n, 0.5) OVER (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
      |FROM d
      |ORDER BY event_type, day""".stripMargin

  /** Winsorization — clip event values to each type's [p5, p95] before
    * aggregation, the standard robust-preprocessing step for
    * long-tailed metrics. Bounds are NEAREST-RANK (lower) order
    * statistics — rank (n−1)·p div 100, an exact integer rule — taken
    * per type with one window + one conditional aggregate, then
    * BROADCAST back onto the events (the train-once/apply-everywhere
    * shape); the clip itself is a pure projection (`least/greatest` —
    * selections, no arithmetic, so clipped values are bit-exact
    * originals or bit-exact bounds in both engines). INTERPOLATED
    * percentiles were the r7 form: Spark's `lower + frac·(upper−lower)`
    * and DuckDB's quantile_cont evaluate different IEEE sequences, and
    * on the r8 5× replica one type's p95 landed a ulp apart, flipping
    * a boundary row's `clipped` — the x5 oracle gate caught it;
    * nearest-rank bounds are data values, engine-identical on any
    * data. */
  def tsWinsorize(spark: SparkSession, dir: String): DataFrame = {
    val wRank = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val wAll = Window.partitionBy(col("event_type"))
    val bounds = Tables.events(spark, dir)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy(col("event_type"))
      .agg(min(when(col("rn") === expr("(n - 1) * 5 div 100 + 1"),
          col("value"))).as("lo"),
        min(when(col("rn") === expr("(n - 1) * 95 div 100 + 1"),
          col("value"))).as("hi"))
    Tables.events(spark, dir)
      .join(broadcast(bounds), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        greatest(col("lo"), least(col("hi"), col("value"))).as("value_w"),
        (col("value") < col("lo") || col("value") > col("hi"))
          .as("clipped"))
      .orderBy(col("event_id"))
  }

  val tsWinsorizeSql: String =
    """WITH r AS (
      |  SELECT event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY value, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM events),
      |b AS (
      |  SELECT event_type,
      |    MIN(CASE WHEN rn = (n - 1) * 5 // 100 + 1 THEN value END) AS lo,
      |    MIN(CASE WHEN rn = (n - 1) * 95 // 100 + 1 THEN value END) AS hi
      |  FROM r GROUP BY 1)
      |SELECT e.event_id, e.event_type, e.value,
      |  GREATEST(b.lo, LEAST(b.hi, e.value)) AS value_w,
      |  e.value < b.lo OR e.value > b.hi AS clipped
      |FROM events e JOIN b USING (event_type)
      |ORDER BY e.event_id""".stripMargin

  /** Exact distinct users over a trailing 7-day window — the rolling
    * reach metric that naive distinct-over-window cannot do at scale
    * (it buffers every (day, user) pair per frame). Bitmap shape
    * instead: users pack into (day, bucket)→word rows (the
    * [[graft.operators.Relational.aggBitmapDistinct]] encoding), a
    * windowed `bit_or` per bucket ORs the trailing 7 days' words —
    * frame state is 7 BIGINTs per bucket, independent of user count —
    * and the per-day total is an exact Σ bit_count over that day's
    * buckets. Shuffle: one (day, bucket) aggregate + one bucket window
    * + one day aggregate, all key-bounded. */
  def tsRollingDistinct(spark: SparkSession, dir: String): DataFrame = {
    // RANGE frame over a day NUMBER, not a 7-ROWS frame: a bucket with
    // no users on some day has no row that day, and a row frame would
    // silently stretch the window past 7 calendar days.
    val words = Tables.events(spark, dir)
      .select(col("ts").cast("date").as("day"),
        expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')").as("dayn"),
        // 32-bit lanes in a BIGINT word: DuckDB overflow-checks
        // 1::BIGINT << 63, so the portable packing keeps shifts <= 31
        expr("user_id DIV 32").as("bucket"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))")
          .as("bit"))
      .groupBy(col("day"), col("dayn"), col("bucket"))
      .agg(expr("bit_or(bit)").as("word"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("dayn"))
      .rangeBetween(-6, 0)
    words
      .withColumn("word7", expr("bit_or(word)").over(w))
      .withColumn("days_in",
        count(lit(1)).over(w)) // trailing days this bucket appeared
      .groupBy(col("day"))
      .agg(sum(expr("bit_count(word7)")).cast("long").as("reach7"),
        max(col("days_in")).as("max_bucket_days"))
      .orderBy(col("day"))
  }

  val tsRollingDistinctSql: String =
    """WITH words AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dayn,
      |    user_id // 32 AS bucket,
      |    BIT_OR(1::BIGINT << CAST(user_id % 32 AS INT)) AS word
      |  FROM events GROUP BY 1, 2, 3),
      |w7 AS (
      |  SELECT day, bucket,
      |    BIT_OR(word) OVER (PARTITION BY bucket ORDER BY dayn
      |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS word7,
      |    COUNT(*) OVER (PARTITION BY bucket ORDER BY dayn
      |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS days_in
      |  FROM words)
      |SELECT day, CAST(SUM(bit_count(word7)) AS BIGINT) AS reach7,
      |  CAST(MAX(days_in) AS BIGINT) AS max_bucket_days
      |FROM w7
      |GROUP BY day
      |ORDER BY day""".stripMargin

  /** Daily growth accounting over the event stream — the DAU ledger
    * every product pipeline reports: for each day, active users split
    * into NEW (first day ever), RETAINED (also active the previous
    * calendar day), and RESURRECTED (returning after a gap), plus the
    * CHURNED count balancing yesterday's actives
    * (`churned(d) = dau(d−1) − retained(d)` when d follows an observed
    * day; after an unobserved gap every previous active churned, so
    * the subtraction drops the retained term). All counts are exact
    * BIGINTs — the ledger identity `dau = new + retained + resurrected`
    * holds row by row (spec-asserted).
    *
    * Scale shape: one (user, day)-keyed distinct aggregate, one lag
    * over each user's OWN day sequence (user-keyed shuffle, the
    * [[winSessionize]] partitioning), one day-keyed aggregate, and a
    * final lag over the ≤ date-domain daily frame. Nothing global
    * touches per-row data. */
  def tsGrowthAcct(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val wUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val daily = days
      .withColumn("prev", lag(col("day"), 1).over(wUser))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("dau"),
        sum(when(col("prev").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(datediff(col("day"), col("prev")) === 1, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(datediff(col("day"), col("prev")) > 1, 1L).otherwise(0L))
          .as("n_resurrected"))
    val wDay = Window.orderBy(col("day"))
    daily
      .withColumn("prev_day", lag(col("day"), 1).over(wDay))
      .withColumn("prev_dau", lag(col("dau"), 1).over(wDay))
      .withColumn("n_churned", coalesce(
        when(datediff(col("day"), col("prev_day")) === 1,
          col("prev_dau") - col("n_retained"))
          .otherwise(col("prev_dau")), lit(0L)))
      .select(col("day"), col("dau"), col("n_new"), col("n_retained"),
        col("n_resurrected"), col("n_churned"))
      .orderBy(col("day"))
  }

  val tsGrowthAcctSql: String =
    """WITH pres AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |lagged AS (
      |  SELECT user_id, day,
      |    LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev
      |  FROM pres),
      |daily AS (
      |  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau,
      |    CAST(SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_new,
      |    CAST(SUM(CASE WHEN day - prev = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_retained,
      |    CAST(SUM(CASE WHEN day - prev > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_resurrected
      |  FROM lagged GROUP BY day)
      |SELECT day, dau, n_new, n_retained, n_resurrected,
      |  COALESCE(CASE WHEN day - LAG(day) OVER (ORDER BY day) = 1
      |    THEN LAG(dau) OVER (ORDER BY day) - n_retained
      |    ELSE LAG(dau) OVER (ORDER BY day) END, 0) AS n_churned
      |FROM daily
      |ORDER BY day""".stripMargin

  /** STL-style additive decomposition of the daily purchase-revenue
    * series: `value = trend + seasonal + residual`, every term an
    * exact BIGINT in cents. Trend is the centered 7-day rolling mean
    * (`sum div 7`, only where the window is COMPLETE — edges drop
    * out, the honest boundary rule); the seasonal component is the
    * per-day-of-week mean of the detrended series (`sum div count`,
    * dow as `daynum % 7` — engine-pure integer arithmetic where
    * dayofweek() conventions differ); the residual closes the
    * identity bit-exactly (spec-asserted). Integer `div` truncation
    * makes every engine agree where float STL would drift.
    *
    * Scale shape: one day-keyed aggregate off the filtered event
    * scan; the two windows and the 7-row seasonal join run on the
    * date-domain-bounded daily frame ([[tsRollingMedian]]'s
    * argument) — row count never reaches a window. */
  def tsStl(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(Det.cents(col("value"))).as("cents"))
      .withColumn("daynum",
        datediff(col("day"), lit("1970-01-01").cast("date")))
    val w7 = Window.orderBy(col("daynum")).rangeBetween(-3, 3)
    val withTrend = daily
      .withColumn("n7", count(lit(1)).over(w7))
      .withColumn("s7", sum(col("cents")).over(w7))
      .withColumn("trend", when(col("n7") === 7, expr("s7 div 7")))
      .withColumn("detrended", col("cents") - col("trend"))
    val seasonal = withTrend.where(col("trend").isNotNull)
      .groupBy((col("daynum") % 7).as("dow"))
      .agg((sum(col("detrended"))).as("s"), count(lit(1)).as("n"))
      .select(col("dow"), expr("s div n").as("seasonal"))
    withTrend.where(col("trend").isNotNull)
      .join(broadcast(seasonal), (col("daynum") % 7) === col("dow"))
      .select(col("day"), col("cents"), col("trend"), col("seasonal"),
        (col("detrended") - col("seasonal")).as("residual"))
      .orderBy(col("day"))
  }

  val tsStlSql: String =
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS day,
       |    CAST(SUM(${DetSql.cents("value")}) AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase'
       |  GROUP BY 1),
       |d2 AS (
       |  SELECT day, cents,
       |    CAST(day - DATE '1970-01-01' AS BIGINT) AS daynum
       |  FROM daily),
       |tr AS (
       |  SELECT day, cents, daynum,
       |    COUNT(*) OVER w AS n7,
       |    CAST(SUM(cents) OVER w AS BIGINT) AS s7
       |  FROM d2
       |  WINDOW w AS (ORDER BY daynum RANGE BETWEEN 3 PRECEDING
       |    AND 3 FOLLOWING)),
       |det AS (
       |  SELECT day, cents, daynum,
       |    s7 // 7 AS trend, cents - s7 // 7 AS detrended
       |  FROM tr WHERE n7 = 7),
       |seas AS (
       |  -- detrended sums are mixed-sign and Spark's `div` truncates
       |  -- toward zero where DuckDB's `//` floors: spell truncation out
       |  SELECT daynum % 7 AS dow,
       |    CASE WHEN SUM(detrended) < 0
       |      THEN -(CAST(-SUM(detrended) AS BIGINT)
       |             // CAST(COUNT(*) AS BIGINT))
       |      ELSE CAST(SUM(detrended) AS BIGINT)
       |             // CAST(COUNT(*) AS BIGINT)
       |    END AS seasonal
       |  FROM det GROUP BY 1)
       |SELECT d.day, d.cents, d.trend, s.seasonal,
       |  d.detrended - s.seasonal AS residual
       |FROM det d JOIN seas s ON s.dow = d.daynum % 7
       |ORDER BY day""".stripMargin

  /** Conversion-latency histogram — "how long from first signup to
    * first purchase": per user the two first-event timestamps, the
    * delta bucketed into power-of-two hour bands (negative = purchase
    * before signup, its own band; never-converted counted separately)
    * — the activation-funnel timing report next to
    * [[tsCohortRetention]]. All arithmetic is exact µs BIGINTs via
    * [[Det.epochUs]].
    *
    * Scale shape: ONE user-keyed conditional min aggregate off the
    * filtered two-type scan, a ≤70-band histogram aggregate, done.
    * Nothing joins, nothing windows. */
  def winTimeToEvent(spark: SparkSession, dir: String): DataFrame = {
    val firsts = Tables.events(spark, dir)
      .where(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("event_type"), Det.epochUs(col("ts")).as("us"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "signup", col("us"))).as("s_us"),
        min(when(col("event_type") === "purchase", col("us"))).as("p_us"))
      .where(col("s_us").isNotNull)
    firsts
      .select(
        when(col("p_us").isNull, lit(-2L))
          .when(col("p_us") < col("s_us"), lit(-1L))
          .otherwise(expr(
            "CAST(floor(log2(((p_us - s_us) div 3600000000L) + 2)) AS BIGINT)"))
          .as("band"))
      .groupBy(col("band")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("band"))
  }

  val winTimeToEventSql: String =
    """WITH f AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS s_us,
      |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_us
      |  FROM events
      |  WHERE event_type IN ('signup', 'purchase')
      |  GROUP BY user_id
      |  HAVING MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
      |    IS NOT NULL),
      |b AS (
      |  SELECT CASE
      |    WHEN p_us IS NULL THEN -2
      |    WHEN p_us < s_us THEN -1
      |    ELSE CAST(FLOOR(LOG2(((p_us - s_us) // 3600000000) + 2)) AS BIGINT)
      |  END AS band
      |  FROM f)
      |SELECT band, CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM b
      |GROUP BY band
      |ORDER BY band""".stripMargin

  /** User-path transition matrix — the Markov "what do users do next"
    * report behind every Sankey/path-analysis view: consecutive event
    * pairs per user (ordered by time, event_id tiebreak), counted per
    * (from, to) type pair with the row-conditional probability in
    * exact integer ppm. ≤|types|² output rows.
    *
    * Scale shape: ONE per-user sort (lag window) + one pair-keyed
    * aggregate (map-side combined) + a per-from window over the tiny
    * matrix frame. The per-user ordering shuffle is the same
    * partitioning every sessionize/funnel query here reuses. */
  def winPathTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val wFrom = Window.partitionBy(col("from_type"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        Det.epochUs(col("ts")).as("us"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total", sum(col("n")).over(wFrom))
      .withColumn("p_ppm", expr("(1000000L * n) div row_total"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val winPathTransitionsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS from_type
      |  FROM events),
      |m AS (
      |  SELECT from_type, event_type AS to_type,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM seq WHERE from_type IS NOT NULL
      |  GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS row_total,
      |  (1000000 * n) // CAST(SUM(n) OVER (PARTITION BY from_type)
      |    AS BIGINT) AS p_ppm
      |FROM m
      |ORDER BY from_type, to_type""".stripMargin

  /** RFM customer segmentation — the marketing-analytics staple: per
    * customer, Recency (days since last order), Frequency (order
    * count), Monetary (exact-cents revenue), each scored into
    * quintiles 1-5 by deterministic rank (`(5·(rn−1)) div n + 1`
    * over a total order with customer-key tiebreak — ntile() without
    * its engine-varying tie handling), then rolled up per RFM segment
    * code with size and revenue. ≤125 output rows.
    *
    * Scale shape: one customer-keyed aggregate, three rank windows
    * SHARING the same single per-metric sort each (row_number only),
    * one segment aggregate. The windows rank the CUSTOMER frame (the
    * fact table never sorts); at 10⁹-customer scale the exact global
    * rank swaps for approx-percentile quintile boundaries broadcast
    * onto the frame — documented trade, same output contract. */
  def winRfm(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("freq"),
        sum(Det.cents(col("o_totalprice"))).as("cents"))
    val scored = per
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("rn_r", row_number().over(
        Window.orderBy(col("last_day").desc, col("o_custkey"))))
      .withColumn("rn_f", row_number().over(
        Window.orderBy(col("freq").desc, col("o_custkey"))))
      .withColumn("rn_m", row_number().over(
        Window.orderBy(col("cents").desc, col("o_custkey"))))
      .select(col("o_custkey"), col("cents"),
        expr("5 - (5 * (rn_r - 1)) div n").as("r"),
        expr("5 - (5 * (rn_f - 1)) div n").as("f"),
        expr("5 - (5 * (rn_m - 1)) div n").as("m"))
    scored
      .groupBy(concat(col("r"), col("f"), col("m")).as("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents")).as("revenue_cents"))
      .orderBy(col("segment"))
  }

  val winRfmSql: String =
    s"""WITH per AS (
       |  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_day,
       |    CAST(COUNT(*) AS BIGINT) AS freq,
       |    CAST(SUM(${DetSql.cents("o_totalprice")}) AS BIGINT) AS cents
       |  FROM orders GROUP BY o_custkey),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM per),
       |scored AS (
       |  SELECT o_custkey, cents,
       |    5 - (5 * (ROW_NUMBER() OVER (ORDER BY last_day DESC, o_custkey)
       |      - 1)) // n.n AS r,
       |    5 - (5 * (ROW_NUMBER() OVER (ORDER BY freq DESC, o_custkey)
       |      - 1)) // n.n AS f,
       |    5 - (5 * (ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey)
       |      - 1)) // n.n AS m
       |  FROM per CROSS JOIN n)
       |SELECT CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
       |    AS segment,
       |  CAST(COUNT(*) AS BIGINT) AS n_customers,
       |  CAST(SUM(cents) AS BIGINT) AS revenue_cents
       |FROM scored
       |GROUP BY 1
       |ORDER BY segment""".stripMargin

  /** Seasonal-adjusted anomaly flags — [[tsAnomaly]]'s MAD rule
    * applied to the [[tsStl]] RESIDUAL instead of the raw series:
    * once trend and day-of-week seasonality are removed, a quiet
    * Sunday stops looking anomalous and a merely-average Monday
    * after three hot Mondays starts to — the decomposed detector
    * catches what the raw one structurally cannot. Median/MAD over
    * the residuals use the same interpolated-percentile contract
    * both engines agree on for integer inputs; the flag compares
    * `|resid − med|` against 3·MAD in one float multiply.
    *
    * Scale shape: everything downstream of the [[tsStl]] daily frame
    * is two whole-frame percentile aggregates broadcast back onto
    * ≤date-domain rows. */
  def tsAnomalyResid(spark: SparkSession, dir: String): DataFrame = {
    val stl = tsStl(spark, dir)
    val med = stl.agg(expr("percentile(residual, 0.5)").as("med"))
    val dev = stl.crossJoin(broadcast(med))
      .withColumn("dev", abs(col("residual") - col("med")))
    val mad = dev.agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.crossJoin(broadcast(mad))
      .select(col("day"), col("cents"), col("residual"), col("med"),
        col("mad"), (col("dev") > lit(3.0) * col("mad")).as("is_anomaly"))
      .orderBy(col("day"))
  }

  lazy val tsAnomalyResidSql: String = {
    val stlCore = tsStlSql.stripSuffix("\nORDER BY day")
    s"""WITH stl AS ($stlCore),
       |med AS (SELECT quantile_cont(residual, 0.5) AS med FROM stl),
       |dev AS (
       |  SELECT s.day, s.cents, s.residual, m.med,
       |    ABS(s.residual - m.med) AS dev
       |  FROM stl s CROSS JOIN med m),
       |mad AS (SELECT quantile_cont(dev, 0.5) AS mad FROM dev)
       |SELECT d.day, d.cents, d.residual, d.med, mad.mad AS mad,
       |  d.dev > 3.0 * mad.mad AS is_anomaly
       |FROM dev d CROSS JOIN mad
       |ORDER BY day""".stripMargin
  }

  /** Quintile migration matrix — "which customers moved between
    * revenue tiers": each customer's exact-cents revenue rank
    * quintile in the FIRST and SECOND halves of the order-date span
    * (same deterministic rank arithmetic as [[winRfm]]; customers
    * absent from a half land in tier 0), rolled up into the (from,
    * to) migration matrix with exact counts — ≤36 rows, the
    * segment-mobility report next to [[winRfm]]'s static cut.
    *
    * Scale shape: one customer×half aggregate, two rank windows over
    * the customer frame, one matrix aggregate. Same
    * exact-rank-at-dim-scale trade as [[winRfm]]. */
  def winQuintileMigration(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        to_date(col("o_orderdate")).as("day"),
        Det.cents(col("o_totalprice")).as("cents"))
    val bounds = o.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val tagged = o.crossJoin(broadcast(bounds))
      .withColumn("half",
        when(datediff(col("day"), col("lo")) * 2 <=
          datediff(col("hi"), col("lo")), lit(1)).otherwise(lit(2)))
    def tier(half: Int): DataFrame = {
      val per = tagged.where(col("half") === half)
        .groupBy(col("o_custkey")).agg(sum(col("cents")).as("cents"))
      per
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("cents").desc, col("o_custkey"))))
        .select(col("o_custkey"),
          expr("5 - (5 * (rn - 1)) div n").as(s"t$half"))
    }
    tier(1).join(tier(2), Seq("o_custkey"), "full_outer")
      .select(coalesce(col("t1"), lit(0L)).as("from_tier"),
        coalesce(col("t2"), lit(0L)).as("to_tier"))
      .groupBy(col("from_tier"), col("to_tier"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("from_tier"), col("to_tier"))
  }

  val winQuintileMigrationSql: String =
    s"""WITH o AS (
       |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
       |    ${DetSql.cents("o_totalprice")} AS cents
       |  FROM orders),
       |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM o),
       |tagged AS (
       |  SELECT o.o_custkey, o.cents,
       |    CASE WHEN (o.day - b.lo) * 2 <= (b.hi - b.lo)
       |      THEN 1 ELSE 2 END AS half
       |  FROM o CROSS JOIN b),
       |t1 AS (
       |  SELECT o_custkey,
       |    5 - (5 * (ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey)
       |      - 1)) // (COUNT(*) OVER ()) AS t
       |  FROM (SELECT o_custkey, CAST(SUM(cents) AS BIGINT) AS cents
       |        FROM tagged WHERE half = 1 GROUP BY o_custkey)),
       |t2 AS (
       |  SELECT o_custkey,
       |    5 - (5 * (ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey)
       |      - 1)) // (COUNT(*) OVER ()) AS t
       |  FROM (SELECT o_custkey, CAST(SUM(cents) AS BIGINT) AS cents
       |        FROM tagged WHERE half = 2 GROUP BY o_custkey))
       |SELECT COALESCE(t1.t, 0) AS from_tier, COALESCE(t2.t, 0) AS to_tier,
       |  CAST(COUNT(*) AS BIGINT) AS n_customers
       |FROM t1 FULL OUTER JOIN t2 ON t1.o_custkey = t2.o_custkey
       |GROUP BY 1, 2
       |ORDER BY from_tier, to_tier""".stripMargin

  /** Inter-purchase gap distribution — the repeat-behavior fingerprint
    * behind churn models: days between each customer's consecutive
    * orders (one per-customer sort, date + key tiebreak), bucketed
    * into power-of-two day bands with exact counts and min/max/sum
    * per band. ≤16 output rows.
    *
    * Scale shape: one customer-keyed lag window + one tiny histogram
    * aggregate — the [[winSessionize]] partitioning reused. */
  def winInterpurchase(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("day"))
      .withColumn("prev", lag(col("day"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(datediff(col("day"), col("prev")).cast("long").as("gap"))
      .select(expr("CAST(floor(log2(gap + 1)) AS BIGINT)").as("band"),
        col("gap"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_gaps"), min(col("gap")).as("min_days"),
        max(col("gap")).as("max_days"), sum(col("gap")).as("sum_days"))
      .orderBy(col("band"))
  }

  val winInterpurchaseSql: String =
    """WITH g AS (
      |  SELECT CAST(day - LAG(day) OVER (PARTITION BY o_custkey
      |    ORDER BY day, o_orderkey) AS BIGINT) AS gap
      |  FROM (SELECT o_custkey, o_orderkey,
      |          CAST(o_orderdate AS DATE) AS day FROM orders))
      |SELECT CAST(FLOOR(LOG2(gap + 1)) AS BIGINT) AS band,
      |  CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |  CAST(MIN(gap) AS BIGINT) AS min_days,
      |  CAST(MAX(gap) AS BIGINT) AS max_days,
      |  CAST(SUM(gap) AS BIGINT) AS sum_days
      |FROM g
      |WHERE gap IS NOT NULL
      |GROUP BY 1
      |ORDER BY band""".stripMargin

  /** Kaplan–Meier survival of "time to second order" with censoring —
    * the churn-modeling staple done honestly: customers with a repeat
    * order contribute an EVENT at their first-to-second gap; one-order
    * customers are CENSORED at (observation end − first order). At
    * each event day t: n_at_risk (subjects with time ≥ t), d events,
    * and the KM factor `1 − d/n` accumulated in LOG SPACE — each
    * step's ln quantized to micro-nats (half-up) so the cumulative is
    * an order-free exact BIGINT sum (the [[graft.llm.Text.lmScore]]
    * contract: the one libm ln runs on bit-identical doubles in both
    * engines; survival itself is exp(log_surv) applied by the caller,
    * keeping exp's parity off the hash path).
    *
    * Scale shape: one customer-keyed first/second aggregate, one
    * day-keyed (event, censor) aggregate, two ordered windows over
    * the ≤date-domain day frame. */
  def winSurvivalKm(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"),
      col("o_orderkey"))
    val per = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("day"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2)
      .groupBy(col("o_custkey"))
      .agg(min(col("day")).as("first_day"),
        max(when(col("rn") === 2, col("day"))).as("second_day"))
    val horizon = Tables.orders(spark, dir)
      .agg(max(to_date(col("o_orderdate"))).as("end_day"))
    val times = per.crossJoin(broadcast(horizon))
      .select(
        when(col("second_day").isNotNull,
          datediff(col("second_day"), col("first_day")))
          .otherwise(datediff(col("end_day"), col("first_day")))
          .cast("long").as("t"),
        when(col("second_day").isNotNull, 1L).otherwise(0L).as("is_event"))
    val byDay = times.groupBy(col("t"))
      .agg(sum(col("is_event")).as("d"),
        sum(lit(1L) - col("is_event")).as("c"))
    val wOrd = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDay
      .withColumn("gone_before",
        coalesce(sum(col("d") + col("c")).over(wOrd), lit(0L)))
      .withColumn("total", sum(col("d") + col("c")).over(wAll))
      .withColumn("n_risk", col("total") - col("gone_before"))
      // n_risk = d would be ln(0): the curve hits zero — pinned to a
      // -1e6-micro-nat-per-survivor sentinel instead of an engine-
      // dependent -inf cast error
      .withColumn("step_micro",
        when(col("d") > 0 && col("n_risk") > col("d"), expr(
          """CAST(ROUND(ln(CAST(n_risk - d AS DOUBLE)
            |   / CAST(n_risk AS DOUBLE)) * 1000000.0d) AS BIGINT)"""
            .stripMargin))
        .when(col("d") > 0, lit(-13815511L))
        .otherwise(0L))
      .withColumn("log_surv_micro", sum(col("step_micro")).over(wCum))
      .where(col("d") > 0)
      .select(col("t"), col("n_risk"), col("d"), col("c"),
        col("step_micro"), col("log_surv_micro"))
      .orderBy(col("t"))
  }

  val winSurvivalKmSql: String =
    """WITH ranked AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS rn
      |  FROM orders),
      |per AS (
      |  SELECT o_custkey, MIN(day) AS first_day,
      |    MAX(CASE WHEN rn = 2 THEN day END) AS second_day
      |  FROM ranked WHERE rn <= 2 GROUP BY o_custkey),
      |h AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS end_day FROM orders),
      |times AS (
      |  SELECT
      |    CAST(CASE WHEN second_day IS NOT NULL
      |      THEN second_day - first_day
      |      ELSE h.end_day - first_day END AS BIGINT) AS t,
      |    CASE WHEN second_day IS NOT NULL THEN 1 ELSE 0 END AS is_event
      |  FROM per CROSS JOIN h),
      |by_day AS (
      |  SELECT t, CAST(SUM(is_event) AS BIGINT) AS d,
      |    CAST(SUM(1 - is_event) AS BIGINT) AS c
      |  FROM times GROUP BY t),
      |risk AS (
      |  SELECT t, d, c,
      |    CAST(SUM(d + c) OVER () AS BIGINT)
      |      - COALESCE(CAST(SUM(d + c) OVER (ORDER BY t
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |          AS BIGINT), 0) AS n_risk
      |  FROM by_day),
      |st AS (
      |  SELECT t, n_risk, d, c,
      |    CASE WHEN d > 0 AND n_risk > d THEN
      |      CAST(ROUND(ln(CAST(n_risk - d AS DOUBLE)
      |        / CAST(n_risk AS DOUBLE)) * 1000000.0) AS BIGINT)
      |    WHEN d > 0 THEN -13815511
      |    ELSE 0 END AS step_micro
      |  FROM risk)
      |SELECT t, n_risk, d, c, step_micro,
      |  CAST(SUM(step_micro) OVER (ORDER BY t
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS log_surv_micro
      |FROM st
      |WHERE d > 0
      |ORDER BY t""".stripMargin

  /** Augmented-Dickey–Fuller-style unit-root statistic on the daily
    * purchase-revenue series — "is this series mean-reverting or a
    * random walk", the stationarity gate before ARIMA-family
    * modeling: regress Δy_t on y_{t−1}; the slope estimates (ρ−1) and
    * its t-statistic is the ADF τ (no augmentation lags — the DF(0)
    * form; the caller compares τ to the Dickey–Fuller table). Moment
    * sums go through [[Det.dsum]] (decimal-exact, the [[aggCorr]]
    * contract) and every derived float op is spelled out once,
    * identically, in both engines.
    *
    * Scale shape: one day-keyed aggregate, one lag window over the
    * bounded daily frame, ONE scalar moment aggregate. */
  def tsAdf(spark: SparkSession, dir: String): DataFrame = {
    // Moments in EXACT integer cents (the agg_corr discipline). The
    // r7 form dsum'ed DOUBLE products (x*x, x*dy): a double→DECIMAL
    // cast rounds Spark's shortest-string rendering while DuckDB
    // converts the binary value, and on the r8 5× replica one product
    // hit a boundary where the two disagree — caught by the x5 oracle
    // gate, invisible at sf0.01/0.1. Cents are BIGINT, products run
    // in DECIMAL(38,0) (HUGEINT twin), and doubles appear only in the
    // final scale-invariant stat block, where both engines cast the
    // SAME exact integers and run the identical IEEE sequence.
    val daily = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(Det.cents(col("value"))).as("yc"))
    val w = Window.orderBy(col("day"))
    val pairs = daily
      .withColumn("xc", lag(col("yc"), 1).over(w))
      .where(col("xc").isNotNull)
      .select(col("xc"), (col("yc") - col("xc")).as("dyc"))
    val dec = (e: String) => s"CAST($e AS DECIMAL(38,0))"
    pairs.agg(count(lit(1)).as("n"),
        sum(expr(dec("xc"))).as("sx"), sum(expr(dec("dyc"))).as("sdy"),
        sum(expr(s"${dec("xc")} * ${dec("xc")}")).as("sxx"),
        sum(expr(s"${dec("dyc")} * ${dec("dyc")}")).as("sdd"),
        sum(expr(s"${dec("xc")} * ${dec("dyc")}")).as("sxd"))
      .withColumn("n_d", col("n").cast("double"))
      .withColumn("cov_n", expr(
        s"CAST(sxd * ${dec("n")} - sx * sdy AS DOUBLE)"))
      .withColumn("varx_n", expr(
        s"CAST(sxx * ${dec("n")} - sx * sx AS DOUBLE)"))
      .withColumn("vard_n", expr(
        s"CAST(sdd * ${dec("n")} - sdy * sdy AS DOUBLE)"))
      .select(col("n"),
        expr("cov_n / varx_n").as("rho_minus_1"),
        expr("""(cov_n / varx_n)
               |/ sqrt(((vard_n - (cov_n / varx_n) * cov_n) / n_d
               |        / CAST(n - 2 AS DOUBLE)) * n_d / varx_n)"""
          .stripMargin).as("t_adf"))
  }

  val tsAdfSql: String =
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS day,
       |    CAST(SUM(${DetSql.cents("value")}) AS BIGINT) AS yc
       |  FROM events WHERE event_type = 'purchase'
       |  GROUP BY 1),
       |p AS (
       |  SELECT xc, yc - xc AS dyc FROM (
       |    SELECT yc, LAG(yc) OVER (ORDER BY day) AS xc FROM daily)
       |  WHERE xc IS NOT NULL),
       |m AS (
       |  SELECT COUNT(*) AS n, CAST(COUNT(*) AS DOUBLE) AS n_d,
       |    SUM(xc::HUGEINT) AS sx, SUM(dyc::HUGEINT) AS sdy,
       |    SUM(xc::HUGEINT * xc) AS sxx, SUM(dyc::HUGEINT * dyc) AS sdd,
       |    SUM(xc::HUGEINT * dyc) AS sxd
       |  FROM p),
       |d AS (
       |  SELECT *,
       |    CAST(sxd * n::HUGEINT - sx * sdy AS DOUBLE) AS cov_n,
       |    CAST(sxx * n::HUGEINT - sx * sx AS DOUBLE) AS varx_n,
       |    CAST(sdd * n::HUGEINT - sdy * sdy AS DOUBLE) AS vard_n
       |  FROM m)
       |SELECT n, cov_n / varx_n AS rho_minus_1,
       |  (cov_n / varx_n)
       |  / SQRT(((vard_n - (cov_n / varx_n) * cov_n) / n_d
       |          / CAST(n - 2 AS DOUBLE)) * n_d / varx_n) AS t_adf
       |FROM d""".stripMargin

  /** Mann–Kendall trend test on the daily purchase-revenue series —
    * the nonparametric significance companion to [[tsTheilSen]]'s
    * slope: `S = Σ_{i<j} sign(y_j − y_i)` (exact integer over the
    * day-frame pair join, bounded by days² like Theil–Sen), the
    * tie-corrected variance kept as the exact integer `18·Var(S)`,
    * and the continuity-corrected z in one spelled-out float block.
    *
    * Scale shape: one daily aggregate, one day-frame self-join
    * (days², never rows), one tie census over the ≤days value frame,
    * scalar assembly. */
  def tsMannKendall(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(Det.cents(col("value"))).as("c"))
    val b = daily.select(col("day").as("day2"), col("c").as("c2"))
    val s = daily.join(b, col("day") < col("day2"))
      .agg(sum(signum(col("c2") - col("c")).cast("long")).as("s"),
        (count(lit(1))).as("n_pairs"))
    val nF = daily.agg(count(lit(1)).as("n"))
    val ties = daily.groupBy(col("c")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(expr("t * (t - 1) * (2 * t + 5)")), lit(0L))
        .as("tie_term"))
    s.crossJoin(broadcast(nF)).crossJoin(broadcast(ties))
      .select(col("n"), col("s"),
        expr("n * (n - 1) * (2 * n + 5) - tie_term").as("var18"))
      .select(col("n"), col("s"), col("var18"),
        expr(
          """CASE WHEN s > 0 THEN
            |  CAST(s - 1 AS DOUBLE) / sqrt(CAST(var18 AS DOUBLE) / 18.0d)
            |WHEN s < 0 THEN
            |  CAST(s + 1 AS DOUBLE) / sqrt(CAST(var18 AS DOUBLE) / 18.0d)
            |ELSE 0.0d END""".stripMargin).as("z_mk"))
  }

  val tsMannKendallSql: String =
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS day,
       |    CAST(SUM(${DetSql.cents("value")}) AS BIGINT) AS c
       |  FROM events WHERE event_type = 'purchase'
       |  GROUP BY 1),
       |sp AS (
       |  SELECT CAST(SUM(SIGN(b.c - a.c)) AS BIGINT) AS s,
       |    CAST(COUNT(*) AS BIGINT) AS n_pairs
       |  FROM daily a JOIN daily b ON a.day < b.day),
       |nf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
       |tt AS (
       |  SELECT COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
       |    AS tie_term
       |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY c)),
       |v AS (
       |  SELECT nf.n, sp.s,
       |    nf.n * (nf.n - 1) * (2 * nf.n + 5) - tt.tie_term AS var18
       |  FROM sp, nf, tt)
       |SELECT n, s, var18,
       |  CASE WHEN s > 0 THEN
       |    CAST(s - 1 AS DOUBLE) / SQRT(CAST(var18 AS DOUBLE) / 18.0)
       |  WHEN s < 0 THEN
       |    CAST(s + 1 AS DOUBLE) / SQRT(CAST(var18 AS DOUBLE) / 18.0)
       |  ELSE 0.0 END AS z_mk
       |FROM v""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_rank" -> winRank,
    "win_distribution" -> winDistribution,
    "win_analytic" -> winAnalytic,
    "win_rolling_range" -> winRollingRange,
    "ts_seasonality" -> tsSeasonality,
    "win_streaks" -> winStreaks,
    "win_sessionize" -> winSessionize,
    "ts_ewma" -> tsEwma,
    "ts_mom_growth" -> tsMomGrowth,
    "ts_anomaly" -> tsAnomaly,
    "ts_gapfill" -> tsGapfill,
    "ts_cumulative_users" -> tsCumulativeUsers,
    "ts_cohort_retention" -> tsCohortRetention,
    "ts_resample" -> tsResample,
    "ts_interpolate" -> tsInterpolate,
    "ts_zscore" -> tsZscore,
    "ts_ohlc" -> tsOhlc,
    "ts_changepoint" -> tsChangepoint,
    "ts_acf" -> tsAcf,
    "ts_lag_corr" -> tsLagCorr,
    "ts_trend_theilsen" -> tsTheilSen,
    "ts_rolling_median" -> tsRollingMedian,
    "ts_winsorize" -> tsWinsorize,
    "ts_rolling_distinct" -> tsRollingDistinct,
    "ts_discounted_return" -> tsDiscountedReturn,
    "win_attribution" -> winAttribution,
    "ts_forecast_snaive" -> tsForecastSnaive,
    "ts_forecast_holt" -> tsForecastHolt,
    "ts_cohort_ltv" -> tsCohortLtv,
    "win_pareto" -> winPareto,
    "ts_growth_acct" -> tsGrowthAcct,
    "ts_stl" -> tsStl,
    "win_time_to_event" -> winTimeToEvent,
    "win_path_transitions" -> winPathTransitions,
    "win_rfm" -> winRfm,
    "ts_anomaly_resid" -> tsAnomalyResid,
    "win_quintile_migration" -> winQuintileMigration,
    "win_interpurchase" -> winInterpurchase,
    "win_survival_km" -> winSurvivalKm,
    "ts_adf" -> tsAdf,
    "ts_mann_kendall" -> tsMannKendall,
  )

  val oracleSql: Map[String, String] = Map(
    "win_rank" -> winRankSql,
    "win_distribution" -> winDistributionSql,
    "win_analytic" -> winAnalyticSql,
    "win_rolling_range" -> winRollingRangeSql,
    "ts_seasonality" -> tsSeasonalitySql,
    "win_streaks" -> winStreaksSql,
    "win_sessionize" -> winSessionizeSql,
    "ts_ewma" -> tsEwmaSql,
    "ts_mom_growth" -> tsMomGrowthSql,
    "ts_anomaly" -> tsAnomalySql,
    "ts_gapfill" -> tsGapfillSql,
    "ts_cumulative_users" -> tsCumulativeUsersSql,
    "ts_cohort_retention" -> tsCohortRetentionSql,
    "ts_resample" -> tsResampleSql,
    "ts_interpolate" -> tsInterpolateSql,
    "ts_zscore" -> tsZscoreSql,
    "ts_ohlc" -> tsOhlcSql,
    "ts_changepoint" -> tsChangepointSql,
    "ts_acf" -> tsAcfSql,
    "ts_lag_corr" -> tsLagCorrSql,
    "ts_trend_theilsen" -> tsTheilSenSql,
    "ts_rolling_median" -> tsRollingMedianSql,
    "ts_winsorize" -> tsWinsorizeSql,
    "ts_rolling_distinct" -> tsRollingDistinctSql,
    "ts_discounted_return" -> tsDiscountedReturnSql,
    "win_attribution" -> winAttributionSql,
    "ts_forecast_snaive" -> tsForecastSnaiveSql,
    "ts_forecast_holt" -> tsForecastHoltSql,
    "ts_cohort_ltv" -> tsCohortLtvSql,
    "win_pareto" -> winParetoSql,
    "ts_growth_acct" -> tsGrowthAcctSql,
    "ts_stl" -> tsStlSql,
    "win_time_to_event" -> winTimeToEventSql,
    "win_path_transitions" -> winPathTransitionsSql,
    "win_rfm" -> winRfmSql,
    "ts_anomaly_resid" -> tsAnomalyResidSql,
    "win_quintile_migration" -> winQuintileMigrationSql,
    "win_interpurchase" -> winInterpurchaseSql,
    "win_survival_km" -> winSurvivalKmSql,
    "ts_adf" -> tsAdfSql,
    "ts_mann_kendall" -> tsMannKendallSql,
  )
}
