package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Feature-engineering operators for model-training pipelines
  * (SURVEY.md §2B ML-prep arc): encodings a feature store materializes
  * from raw relational data before a training job reads it.
  *
  * Reference basis: the engine's latent SQL surface (ref
  * TemplateApp.scala:52) — these are declared-inventory extensions of
  * that surface, same as the `llm_*` training-data operators.
  */
object Features {

  /** Smoothing pseudo-count for [[targetEncode]] (the classic
    * m-estimate: a category with few rows shrinks toward the global
    * rate; one with many keeps its own). */
  private val TeSmooth = 20L

  /** Fixed-point scale: encodings are parts-per-million BIGINTs. */
  private val TePpm = 1000000L

  /** Smoothed target encoding of customer market segment against
    * order finalization (o_orderstatus = 'F') — the leakage-safe
    * categorical encoding tabular models train on:
    * `enc = (sum_t + m·globalRate) / (n + m)` with m = [[TeSmooth]].
    *
    * Exactness: the m-estimate is evaluated in cross-multiplied
    * BIGINTs — `ppm = (10⁶·(sum_t·gN + m·gSum)) div (gN·(n+m))` — so
    * both engines truncate identically and the hash is exact. The
    * cross-multiplication bounds the intermediate at 10⁶·sum_t·gN; at
    * true 100 TB row counts (10¹² orders) that term needs DECIMAL(38)
    * partial sums — a documented swap, same arithmetic.
    *
    * Scale shape: one broadcast-joined (projected 2-column dim) scan
    * of orders, ONE segment-keyed aggregate (5 groups, map-side
    * combined), and the 1-row global frame broadcast back onto the
    * ≤|categories| result — never onto the fact table. A real feature
    * store would persist this tiny frame and broadcast it into
    * training joins; the expensive side here is only ever scanned
    * once. */
  def targetEncode(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("t"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val joined = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
    val perSeg = joined.groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"), sum(col("t")).as("sum_t"))
    val global = joined.agg(count(lit(1)).as("g_n"),
      sum(col("t")).as("g_sum"))
    perSeg.crossJoin(broadcast(global))
      .select(col("segment"), col("n"), col("sum_t"),
        expr(s"($TePpm * g_sum) div g_n").as("global_rate_ppm"),
        expr(s"($TePpm * (sum_t * g_n + $TeSmooth * g_sum)) div " +
          s"(g_n * (n + $TeSmooth))").as("enc_ppm"))
      .orderBy(col("segment"))
  }

  val targetEncodeSql: String =
    s"""WITH j AS (
       |  SELECT c.c_mktsegment AS segment,
       |    CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS t
       |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
       |per_seg AS (
       |  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(t) AS BIGINT) AS sum_t
       |  FROM j GROUP BY segment),
       |gtot AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS g_n,
       |    CAST(SUM(t) AS BIGINT) AS g_sum
       |  FROM j)
       |SELECT segment, n, sum_t,
       |  CAST(($TePpm * g_sum) // g_n AS BIGINT) AS global_rate_ppm,
       |  CAST(($TePpm * (sum_t * g_n + $TeSmooth * g_sum)) //
       |    (g_n * (n + $TeSmooth)) AS BIGINT) AS enc_ppm
       |FROM per_seg CROSS JOIN gtot
       |ORDER BY segment""".stripMargin

  /** Bin count for [[binning]]. */
  private val NBins = 10L

  /** Equal-width discretization of customer account balance into
    * [[NBins]] bins — the feature-prep step tabular models and
    * histogram-based learners (GBDTs) want before training: per bin
    * its exact-cents range, population, share, and mean balance. The
    * bin index is pure integer algebra off a 1-row broadcast of the
    * global [min, max] — `bin = ((v−min)·B) div (span+1)` — so
    * assignment is engine-exact and NEVER needs a sort (the contrast
    * with quantile binning, whose global ntile is a single-partition
    * sort at scale; equal-width is the shape that survives 100 TB as
    * one scan + one ≤B-group aggregate). */
  def binning(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(graft.core.Det.cents(col("c_acctbal")).as("v"))
    val bounds = c.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    c.crossJoin(broadcast(bounds))
      .select(col("v"),
        expr(s"((v - lo) * $NBins) div (hi - lo + 1)").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("v")).as("lo_cents"), max(col("v")).as("hi_cents"),
        sum(col("v")).as("sum_cents"))
      .withColumn("mean_cents", expr("sum_cents div n"))
      .orderBy(col("bin"))
  }

  val binningSql: String =
    s"""WITH c AS (
       |  SELECT ${graft.core.DetSql.cents("c_acctbal")} AS v FROM customer),
       |b AS (SELECT CAST(MIN(v) AS BIGINT) AS lo, CAST(MAX(v) AS BIGINT) AS hi
       |      FROM c)
       |SELECT ((v - lo) * $NBins) // (hi - lo + 1) AS bin,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(MIN(v) AS BIGINT) AS lo_cents,
       |  CAST(MAX(v) AS BIGINT) AS hi_cents,
       |  CAST(SUM(v) AS BIGINT) AS sum_cents,
       |  CAST(SUM(v) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS mean_cents
       |FROM c CROSS JOIN b
       |GROUP BY 1
       |ORDER BY bin""".stripMargin

  /** Hash-bucket count for [[hashBucket]] (the hashing trick's
    * feature-space size). */
  private val HashBuckets = 64L

  /** The hashing-trick featurizer: cross the customer segment with the
    * order priority, hash the crossed feature into [[HashBuckets]]
    * buckets (first 4 md5 nibbles, the [[graft.llm.Text]] split
    * idiom — engine-identical and retry-stable where hash() is not),
    * and report the collision structure per bucket: distinct raw
    * features sharing it and total row mass. This is the audit a
    * hashed-feature pipeline reads to size its bucket space (features
    * per bucket ≫ 1 ⇒ widen).
    *
    * Scale shape: pure projection for the hash, one bucket-keyed
    * aggregate whose distinct-count is a two-level (bucket, feature)
    * aggregate — the [[graft.llm.Text.boilerplate]] shape, no Expand;
    * output ≤ [[HashBuckets]] rows. */
  def hashBucket(spark: SparkSession, dir: String): DataFrame = {
    val crossed = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(concat(col("c_mktsegment"), lit("|"), col("o_orderpriority"))
        .as("feature"))
      .withColumn("h", expr("md5('feat:' || feature)"))
      .select(col("feature"), expr(
        s"""CAST(((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
           |   + (instr('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
           |   + (instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
           |   + (instr('0123456789abcdef', substr(h, 4, 1)) - 1))
           |   % $HashBuckets AS BIGINT)""".stripMargin).as("bucket"))
    crossed.groupBy(col("bucket"), col("feature"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_features"), sum(col("n")).as("n_rows"),
        min(col("feature")).as("first_feature"))
      .orderBy(col("bucket"))
  }

  val hashBucketSql: String =
    s"""WITH f AS (
       |  SELECT c.c_mktsegment || '|' || o.o_orderpriority AS feature
       |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
       |h AS (
       |  SELECT feature, md5('feat:' || feature) AS h FROM f),
       |bkt AS (
       |  SELECT feature,
       |    CAST(((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
       |       + (instr('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
       |       + (instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
       |       + (instr('0123456789abcdef', substr(h, 4, 1)) - 1))
       |       % $HashBuckets AS BIGINT) AS bucket
       |  FROM h),
       |per AS (
       |  SELECT bucket, feature, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM bkt GROUP BY 1, 2)
       |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_features,
       |  CAST(SUM(n) AS BIGINT) AS n_rows,
       |  MIN(feature) AS first_feature
       |FROM per
       |GROUP BY bucket
       |ORDER BY bucket""".stripMargin

  /** Per-group min-max scaling of event values — the normalization a
    * feature pipeline applies before gradient training: each event's
    * value rescaled to [0, 1] within its event type, emitted as exact
    * integer ppm (`10⁶·(v−min) div (max−min)`) over exact cents, so
    * both engines truncate identically with no float in sight. Types
    * whose domain collapses (max = min) scale to 0 by convention.
    *
    * Scale shape: ONE type-keyed aggregate to a ≤|types|-row bounds
    * frame, broadcast back onto the scan — a pure projection after
    * that (the normalize step costs one small broadcast, not a second
    * fact shuffle). Output keeps every row (the materialized feature
    * column), totally ordered on the unique event id. */
  def minmaxScale(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        graft.core.Det.cents(col("value")).as("cents"))
    val bounds = e.groupBy(col("event_type"))
      .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
    e.join(broadcast(bounds), "event_type")
      .select(col("event_id"), col("event_type"), col("cents"),
        when(col("hi") === col("lo"), 0L)
          .otherwise(expr("(1000000L * (cents - lo)) div (hi - lo)"))
          .as("scaled_ppm"))
      .orderBy(col("event_id"))
  }

  val minmaxScaleSql: String =
    s"""WITH e AS (
       |  SELECT event_id, event_type,
       |    ${graft.core.DetSql.cents("value")} AS cents
       |  FROM events),
       |b AS (
       |  SELECT event_type, CAST(MIN(cents) AS BIGINT) AS lo,
       |    CAST(MAX(cents) AS BIGINT) AS hi
       |  FROM e GROUP BY event_type)
       |SELECT e.event_id, e.event_type, e.cents,
       |  CASE WHEN b.hi = b.lo THEN 0
       |    ELSE (1000000 * (e.cents - b.lo)) // (b.hi - b.lo)
       |  END AS scaled_ppm
       |FROM e JOIN b ON b.event_type = e.event_type
       |ORDER BY event_id""".stripMargin

  /** [[pca]] constants: global quantization grid, iteration scale,
    * embedding dimensionality (pinned to the testdata contract;
    * PcaSpec asserts it), and the fixed power-iteration horizon. */
  private val PcaQuant = 1000L
  private val PcaScale = 1000000L
  private val PcaDim = 64
  private val PcaIters = 5

  /** First principal component by INTEGER power iteration, and the
    * class structure along it — the classic "is there signal in the
    * embeddings" diagnostic, exact where float PCA is run-order
    * nondeterministic: embeddings quantize to a GLOBAL ×[[PcaQuant]]
    * grid (per-vector scales would distort the covariance), center
    * against the truncated integer dim-mean, accumulate the exact
    * BIGINT covariance (`Σ c_j·c_k` per (j,k) — the standard O(n·d²)
    * pass whose SHUFFLE is only d² rows after map-side partials), then
    * run [[PcaIters]] rounds of `w = C·v` with integer renormalization
    * `v' = w·[[PcaScale]] div max|w|`. Every step is integer-exact, so
    * both engines produce the bit-identical direction; per-label
    * projection stats (n, mean, min, max) read the class separation.
    * Overflow bound: |w| ≤ d·max|C|·[[PcaScale]] ≈ 64·(q²n)·10⁶ —
    * safe to n ≈ 10⁵ vectors at q ≤ 2·10³; beyond that the covariance
    * accumulates in DECIMAL(38) (documented swap, same arithmetic).
    *
    * Scale shape: one posexplode scan (n·d rows), one d-keyed mean
    * aggregate broadcast back, one vec-keyed self-join producing n·d²
    * products map-side-combined into the d²-row covariance, then 5
    * rounds over that d²-row frame (driver never sees a vector); the
    * projection pass is one d-keyed broadcast join + vec-keyed
    * aggregate. */
  def pca(spark: SparkSession, dir: String): DataFrame = {
    // r15 optimization (guide §2.4 remove shuffles / §5 driver
    // ceiling). The old shape exploded to (vec, j) rows, SELF-JOINED
    // them on vec_id for the covariance (two n·d exchanges), eagerly
    // localCheckpointed three intermediates, and ran the 5
    // power-iteration rounds as distributed jobs over a d²-row frame
    // (5 more jobs + checkpoints). Rewritten row-wise on the ARRAY:
    //  - dim means: one posexplode + d-keyed partial agg (d = 64 rows
    //    out), COLLECTED — d is a compile-time constant, so this is
    //    the bounded metadata ceiling, not a data collect;
    //  - centering: zip_with against the literal mean vector — no
    //    broadcast join, no explode;
    //  - covariance: each row emits its d² outer-product cells
    //    map-side via a DOUBLE posexplode (Generate is codegen'd;
    //    the nested transform/named_struct form measured 3× slower —
    //    higher-order functions evaluate interpreted), folded by
    //    partial aggregation to ≤ d² rows per task before the ONLY
    //    exchange. The n·d self-join shuffle is gone entirely;
    //  - power iteration: d² = 4,096 BIGINTs on the driver (constant,
    //    bounded by construction), same integer algebra (`w div
    //    greatest(max|w| div SCALE, 1)` — Long division truncates
    //    toward zero exactly like Spark's `div`), so the direction is
    //    bit-identical; RelationalSpec's driver recompute pins it;
    //  - projection: per-row zip_with/aggregate dot product against
    //    the literal direction — no join — feeding the ≤|label| agg.
    // Plan: 10 jobs / 4 data shuffles → 3 jobs (means, cov, result) /
    // 1 tiny exchange each. Everything recomputes from parquet per
    // invocation — nothing is memoized across runs.
    val q = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), expr(
        s"""transform(embedding,
           |  x -> CAST(floor(CAST(x AS DOUBLE) * $PcaQuant + 0.5)
           |       AS BIGINT))""".stripMargin).as("q"))
    val m = Array.ofDim[Long](PcaDim)
    q.select(posexplode(col("q")).as(Seq("j", "x")))
      .groupBy(col("j")).agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .select(col("j"), expr("s div n").as("m"))
      .collect().foreach(r => m(r.getInt(0)) = r.getLong(1))
    val mArr = array(m.map(lit(_)): _*)
    val c = q.select(col("vec_id"), col("label"),
      zip_with(col("q"), mArr, (x, mm) => x - mm).as("c"))
    val cov = Array.ofDim[Long](PcaDim, PcaDim)
    c.select(col("c"), posexplode(col("c")).as(Seq("j", "cj")))
      .select(col("j"), col("cj"), posexplode(col("c")).as(Seq("k", "ck")))
      .groupBy(col("j"), col("k")).agg(sum(col("cj") * col("ck")).as("cov"))
      .collect().foreach(r => cov(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    var vdir = Array.fill(PcaDim)(PcaScale)
    for (_ <- 1 to PcaIters) {
      val w = Array.tabulate(PcaDim)(j =>
        (0 until PcaDim).map(k => cov(j)(k) * vdir(k)).sum)
      val mx = w.map(math.abs).max
      // renormalize by DIVIDING down (w div (max|w| div SCALE)) — the
      // multiply-then-divide form overflows BIGINT at w ≈ 10¹⁷
      vdir = w.map(_ / math.max(mx / PcaScale, 1L))
    }
    val vArr = array(vdir.map(lit(_)): _*)
    c.select(col("label"),
        aggregate(zip_with(col("c"), vArr, (x, v) => x * v),
          lit(0L), (acc, x) => acc + x).as("p"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("sum_p"),
        min(col("p")).as("min_p"), max(col("p")).as("max_p"))
      .select(col("label"), col("n"), expr("sum_p div n").as("mean_p"),
        col("min_p"), col("max_p"))
      .orderBy(col("label"))
  }

  val pcaSql: String = {
    import graft.core.DetSql.tdiv
    val steps = (1 to PcaIters).map { i =>
      s"""w$i AS (
         |  SELECT cov.j, CAST(SUM(cov.cov * v.v) AS BIGINT) AS w
         |  FROM cov JOIN v${i - 1} v ON v.k = cov.k
         |  GROUP BY cov.j),
         |v$i AS (
         |  SELECT j AS k,
         |    ${tdiv("w", s"greatest((SELECT MAX(ABS(w)) FROM w$i) // $PcaScale, 1)")}
         |      AS v
         |  FROM w$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH ex AS (
       |  SELECT vec_id, label,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * $PcaQuant + 0.5)
       |      AS BIGINT) AS q,
       |    unnest(range(0, $PcaDim)) AS j
       |  FROM embeddings),
       |means AS (
       |  SELECT j, ${tdiv("CAST(SUM(q) AS BIGINT)", "COUNT(*)")} AS m
       |  FROM ex GROUP BY j),
       |c AS (
       |  SELECT ex.vec_id, ex.label, ex.j, ex.q - means.m AS c
       |  FROM ex JOIN means ON means.j = ex.j),
       |cov AS (
       |  SELECT a.j, b.j AS k, CAST(SUM(a.c * b.c) AS BIGINT) AS cov
       |  FROM c a JOIN c b ON a.vec_id = b.vec_id
       |  GROUP BY 1, 2),
       |v0 AS (SELECT CAST(unnest(range(0, $PcaDim)) AS INT) AS k,
       |       CAST($PcaScale AS BIGINT) AS v),
       |$steps,
       |proj AS (
       |  SELECT c.vec_id, c.label, CAST(SUM(c.c * v.v) AS BIGINT) AS p
       |  FROM c JOIN v$PcaIters v ON v.k = c.j
       |  GROUP BY 1, 2)
       |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
       |  ${tdiv("CAST(SUM(p) AS BIGINT)", "COUNT(*)")} AS mean_p,
       |  CAST(MIN(p) AS BIGINT) AS min_p,
       |  CAST(MAX(p) AS BIGINT) AS max_p
       |FROM proj
       |GROUP BY label
       |ORDER BY label""".stripMargin
  }

  /** Per-dimension z-score standardization of the embedding matrix in
    * integer fixed point — the feature-whitening pass before any
    * distance-based model: each dim's mean is the truncated integer
    * mean of the ×[[PcaQuant]]-quantized values, the scale is the
    * INTEGER sqrt of the truncated population variance
    * (`floor(sqrt(x))` on a BIGINT below 2⁵² is the same correctly-
    * rounded IEEE sqrt in both engines — boundary-safe until σ² ≈
    * 10¹⁸), and z is `(q−m)·1000 div max(sd,1)` per element (milli-σ
    * units). Output is the per-dim audit frame (n, mean, sd, z range)
    * — the "is any dimension degenerate or wild" report at d rows,
    * not a per-element dump.
    *
    * Scale shape: one posexplode scan, ONE d-keyed moment aggregate
    * (map-side combined — the shuffle carries d rows), the d-row
    * stats broadcast back for the z extremes, one final d-row
    * aggregate. */
  def standardize(spark: SparkSession, dir: String): DataFrame = {
    val ex = Tables.embeddings(spark, dir)
      .select(posexplode(col("embedding")).as(Seq("j", "x")))
      .select(col("j"),
        expr(s"CAST(floor(CAST(x AS DOUBLE) * $PcaQuant + 0.5) AS BIGINT)")
          .as("q"))
    val stats = ex.groupBy(col("j"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"),
        sum(col("q") * col("q")).as("ss"))
      .select(col("j"), col("n"), expr("s div n").as("m"),
        expr("""CAST(floor(sqrt(CAST(
               |  (ss - 2 * (s div n) * s + n * (s div n) * (s div n)) div n
               |  AS DOUBLE))) AS BIGINT)""".stripMargin).as("sd"))
    ex.join(broadcast(stats), "j")
      .select(col("j"), col("n"), col("m"), col("sd"),
        expr("((q - m) * 1000L) div greatest(sd, 1L)").as("z"))
      .groupBy(col("j"), col("n"), col("m"), col("sd"))
      .agg(min(col("z")).as("min_z"), max(col("z")).as("max_z"))
      .orderBy(col("j"))
  }

  val standardizeSql: String = {
    import graft.core.DetSql.tdiv
    val m = tdiv("CAST(SUM(q) AS BIGINT)", "COUNT(*)")
    s"""WITH ex AS (
       |  SELECT CAST(unnest(range(0, $PcaDim)) AS INT) AS j,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * $PcaQuant + 0.5)
       |      AS BIGINT) AS q
       |  FROM embeddings),
       |stats AS (
       |  SELECT j, CAST(COUNT(*) AS BIGINT) AS n, $m AS m,
       |    CAST(floor(sqrt(CAST(${tdiv(
             s"(CAST(SUM(q * q) AS BIGINT) - 2 * ($m) * CAST(SUM(q) AS BIGINT)"
               + s" + COUNT(*) * ($m) * ($m))", "COUNT(*)")}
       |      AS DOUBLE))) AS BIGINT) AS sd
       |  FROM ex GROUP BY j),
       |z AS (
       |  SELECT ex.j, s.n, s.m, s.sd,
       |    ${tdiv("(ex.q - s.m) * 1000", "greatest(s.sd, 1)")} AS z
       |  FROM ex JOIN stats s ON s.j = ex.j)
       |SELECT j, n, m, sd,
       |  CAST(MIN(z) AS BIGINT) AS min_z, CAST(MAX(z) AS BIGINT) AS max_z
       |FROM z
       |GROUP BY j, n, m, sd
       |ORDER BY j""".stripMargin
  }

  /** Decile lift table — the gains-chart eval for the
    * [[targetEncode]] score: every order scored by its segment's
    * encoding, ranked by (score desc, key), cut into 10 equal deciles
    * by exact rank arithmetic, and per decile the positive count,
    * rate, cumulative capture, and lift vs base rate — all integer
    * ppm (cross-multiplied, no float). The ML question this answers:
    * "if I act on the top k% by model score, what fraction of actual
    * positives do I reach?"
    *
    * Scale shape: the 5-row encoding frame broadcast onto the fact
    * scan; ONE global rank window over the scored orders (at 10⁹+
    * rows the exact rank swaps for quantile boundaries — the
    * [[graft.operators.Windows.winRfm]] trade), a 10-row decile
    * aggregate and its running window. */
  def decileLift(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("t"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val enc = targetEncode(spark, dir)
      .select(col("segment"), col("enc_ppm"))
    val scored = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(enc), col("c_mktsegment") === col("segment"))
      .select(col("o_orderkey"), col("t"), col("enc_ppm"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("enc_ppm").desc, col("o_orderkey"))))
      .select(col("t"), col("n"), expr("(10 * (rn - 1)) div n").as("decile"))
    val wCum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    scored.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_orders"), sum(col("t")).as("n_pos"))
      .withColumn("pos_rate_ppm", expr("(1000000L * n_pos) div n_orders"))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .withColumn("total_pos", sum(col("n_pos")).over(wAll))
      .withColumn("cum_capture_ppm",
        expr("(1000000L * cum_pos) div total_pos"))
      .withColumn("total_n", sum(col("n_orders")).over(wAll))
      // the triple product 10⁶·n_pos·total_n overflows BIGINT once
      // n_pos·total_n > 9.2e12 (~TPC-H SF6), silently in Spark and as
      // an error in DuckDB (ADVICE r7) — both engines route it through
      // 128-bit integers instead (DECIMAL(38,0) here, HUGEINT there):
      // exact floor division up to ~10¹² rows per decile, far past the
      // 100 TB target
      .withColumn("lift_ppm",
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * n_pos * total_n)
               |  div (CAST(n_orders AS DECIMAL(38,0)) * total_pos)
               |  AS BIGINT)""".stripMargin))
      .select(col("decile"), col("n_orders"), col("n_pos"),
        col("pos_rate_ppm"), col("cum_capture_ppm"), col("lift_ppm"))
      .orderBy(col("decile"))
  }

  val decileLiftSql: String =
    s"""WITH j AS (
       |  SELECT o.o_orderkey, c.c_mktsegment AS segment,
       |    CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS t
       |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
       |per_seg AS (
       |  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(t) AS BIGINT) AS sum_t
       |  FROM j GROUP BY segment),
       |gtot AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS g_n,
       |    CAST(SUM(t) AS BIGINT) AS g_sum
       |  FROM j),
       |enc AS (
       |  SELECT segment,
       |    CAST(($TePpm * (sum_t * g_n + $TeSmooth * g_sum)) //
       |      (g_n * (n + $TeSmooth)) AS BIGINT) AS enc_ppm
       |  FROM per_seg CROSS JOIN gtot),
       |scored AS (
       |  SELECT j.t,
       |    CAST(COUNT(*) OVER () AS BIGINT) AS n,
       |    CAST(ROW_NUMBER() OVER (ORDER BY e.enc_ppm DESC, j.o_orderkey)
       |      AS BIGINT) AS rn
       |  FROM j JOIN enc e ON e.segment = j.segment),
       |dec AS (
       |  SELECT (10 * (rn - 1)) // n AS decile, t FROM scored),
       |agg AS (
       |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_orders,
       |    CAST(SUM(t) AS BIGINT) AS n_pos
       |  FROM dec GROUP BY decile)
       |SELECT decile, n_orders, n_pos,
       |  (1000000 * n_pos) // n_orders AS pos_rate_ppm,
       |  (1000000 * CAST(SUM(n_pos) OVER (ORDER BY decile
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT))
       |    // CAST(SUM(n_pos) OVER () AS BIGINT) AS cum_capture_ppm,
       |  CAST((1000000::HUGEINT * n_pos * CAST(SUM(n_orders) OVER () AS BIGINT))
       |    // (1::HUGEINT * n_orders * CAST(SUM(n_pos) OVER () AS BIGINT))
       |    AS BIGINT) AS lift_ppm
       |FROM agg
       |ORDER BY decile""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "feat_target_encode" -> targetEncode,
    "feat_binning" -> binning,
    "feat_hash_bucket" -> hashBucket,
    "feat_minmax" -> minmaxScale,
    "feat_pca" -> pca,
    "feat_standardize" -> standardize,
    "feat_decile_lift" -> decileLift,
  )

  val oracleSql: Map[String, String] = Map(
    "feat_target_encode" -> targetEncodeSql,
    "feat_binning" -> binningSql,
    "feat_hash_bucket" -> hashBucketSql,
    "feat_minmax" -> minmaxScaleSql,
    "feat_pca" -> pcaSql,
    "feat_standardize" -> standardizeSql,
    "feat_decile_lift" -> decileLiftSql,
  )
}
