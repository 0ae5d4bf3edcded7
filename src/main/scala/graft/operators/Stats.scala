package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Det, DetSql, Tables}

/** Statistical-analysis operators (SURVEY.md §2B analytics arc):
  * association mining and hypothesis testing — the "is this pattern
  * real" layer a decision pipeline runs after the aggregates.
  *
  * Reference basis: the engine's latent SQL surface (ref
  * TemplateApp.scala:52); both are declared-inventory extensions.
  */
object Stats {

  /** Minimum pair support for [[basketLift]] — prunes the rule list to
    * pairs seen at least this many times (2 keeps the sf0.001 smoke
    * non-empty; production would raise it with data volume). */
  private val MinSupport = 2L

  /** Market-basket association rules over co-purchased parts: for the
    * top-20 part pairs by lift, the exact support / confidence / lift
    * in fixed-point ppm — the classic "customers who bought A also
    * bought B" mining, kept integer end-to-end
    * (`lift = n_ab·N / (n_a·n_b)` evaluated as one cross-multiplied
    * BIGINT division) so both engines agree bit-exactly.
    *
    * Scale shape: the pair stream is the per-order self-join — Σ
    * lines_per_order² with bounded order width (the [[Graph]] edge
    * construction) — feeding ONE map-side-combined (a,b) aggregate;
    * the distinct basket list is cached once for its three consumers.
    * Item counts are one item-keyed aggregate joined onto the (far
    * smaller, support-pruned) pair table; N is a 1-row broadcast.
    * TakeOrdered top-20 — nothing global sorts. (A collect_set-basket
    * variant that generates pairs map-side measured 3× SLOWER at
    * sf0.1 — the object-hash array aggregate costs more than the
    * extra codegen'd shuffle it saves; kept the join.) At 10¹² orders
    * the `n_ab·N` cross product needs DECIMAL(38) — documented swap,
    * same arithmetic. */
  def basketLift(spark: SparkSession, dir: String): DataFrame = {
    // cached: the distinct basket list feeds four consumers (N, item
    // counts, both pair-join legs) — uncached it re-shuffles per leg.
    // r16 (§2.2 / VERDICT r15 #4): the cache used to inherit AQE's
    // coalesced layout — the distinct's output is small in BYTES, so
    // AQE folded it to ONE partition and the pair self-join (the
    // query's only expensive stage: Σ lines_per_order² rows streamed
    // against the broadcast leg) ran single-threaded; measured
    // core-INSENSITIVE at 32 vs 8 cpus (1.96/2.03 s). Repartitioning
    // the raw stream by ok BEFORE the distinct pins the cache at the
    // session's scale-derived width (an explicit count is exempt from
    // AQE coalescing; the value is the conf, not a constant), the
    // distinct then needs no exchange of its own (hash(ok) clusters
    // (ok, item)), and both pair-join legs and the nOrders distinct
    // read an ok-partitioned cache.
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("ok"))
      .distinct().cache()
    val nOrders = items.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val itemN = items.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val b = items.select(col("ok").as("ok2"), col("item").as("item_b"))
    val pairs = items.join(b,
        col("ok") === col("ok2") && col("item") < col("item_b"))
      .groupBy(col("item").as("a"), col("item_b").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= MinSupport)
    pairs
      .join(itemN.select(col("item").as("a"), col("n_item").as("n_a")), "a")
      .join(itemN.select(col("item").as("b"), col("n_item").as("n_b")), "b")
      .crossJoin(broadcast(nOrders))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        expr("(1000000L * n_ab) div n_orders").as("support_ppm"),
        expr("(1000000L * n_ab) div n_a").as("conf_a_to_b_ppm"),
        expr("(1000000L * n_ab * n_orders) div (n_a * n_b)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("a"), col("b"))
      .limit(20)
  }

  val basketLiftSql: String =
    s"""WITH items AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem),
       |n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders
       |      FROM items),
       |item_n AS (
       |  SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item
       |  FROM items GROUP BY item),
       |pairs AS (
       |  SELECT i.item AS a, j.item AS b, CAST(COUNT(*) AS BIGINT) AS n_ab
       |  FROM items i JOIN items j ON i.ok = j.ok AND i.item < j.item
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= $MinSupport)
       |SELECT p.a, p.b, p.n_ab, na.n_item AS n_a, nb.n_item AS n_b,
       |  (1000000 * p.n_ab) // n.n_orders AS support_ppm,
       |  (1000000 * p.n_ab) // na.n_item AS conf_a_to_b_ppm,
       |  (1000000 * p.n_ab * n.n_orders) // (na.n_item * nb.n_item)
       |    AS lift_ppm
       |FROM pairs p
       |JOIN item_n na ON na.item = p.a
       |JOIN item_n nb ON nb.item = p.b
       |CROSS JOIN n
       |ORDER BY lift_ppm DESC, a, b
       |LIMIT 20""".stripMargin

  /** The two arms [[abTest]] compares. */
  private val AbArmA = "BUILDING"
  private val AbArmB = "MACHINERY"

  /** Welch's two-sample t-test between two customer segments' order
    * values — the A/B-testing primitive: per-arm n / mean / sample
    * variance from decimal-exact moment sums ([[Det.dsum]], the
    * [[Relational.aggCorr]] contract), then the t statistic and
    * Welch–Satterthwaite degrees of freedom in a spelled-out IEEE op
    * order both engines evaluate identically. No p-value — that needs
    * a t CDF, which is a lookup the caller applies to (t, df).
    *
    * Scale shape: ONE conditional-aggregation pass over the
    * broadcast-dim-joined fact scan (the [[Maintenance.dqConstraints]]
    * trick — both arms, all five moments, one shuffle of a single
    * 1-row frame); everything after is scalar arithmetic on that row. */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val j = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("o_totalprice").as("v"))
    val m = j.where(col("seg").isin(AbArmA, AbArmB))
      .agg(
        sum(when(col("seg") === AbArmA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("seg") === AbArmB, 1L).otherwise(0L)).as("n_b"),
        Det.dsum(when(col("seg") === AbArmA, col("v"))).as("sx_a"),
        Det.dsum(when(col("seg") === AbArmB, col("v"))).as("sx_b"),
        Det.dsum(when(col("seg") === AbArmA, col("v") * col("v"))).as("sxx_a"),
        Det.dsum(when(col("seg") === AbArmB, col("v") * col("v"))).as("sxx_b"))
    m.select(col("n_a"), col("n_b"),
        expr("sx_a / CAST(n_a AS DOUBLE)").as("mean_a"),
        expr("sx_b / CAST(n_b AS DOUBLE)").as("mean_b"),
        expr("(sxx_a - sx_a * sx_a / CAST(n_a AS DOUBLE)) / CAST(n_a - 1 AS DOUBLE)")
          .as("var_a"),
        expr("(sxx_b - sx_b * sx_b / CAST(n_b AS DOUBLE)) / CAST(n_b - 1 AS DOUBLE)")
          .as("var_b"))
      // q = var/n (the squared standard error per arm); squares are
      // explicit multiplies, not pow() — libm pow need not agree
      // bitwise across engines, x*x must
      .withColumn("q_a", expr("var_a / CAST(n_a AS DOUBLE)"))
      .withColumn("q_b", expr("var_b / CAST(n_b AS DOUBLE)"))
      .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
        col("var_a"), col("var_b"),
        expr("(mean_a - mean_b) / sqrt(q_a + q_b)").as("t_welch"),
        expr("""((q_a + q_b) * (q_a + q_b)) /
                (q_a * q_a / CAST(n_a - 1 AS DOUBLE)
                 + q_b * q_b / CAST(n_b - 1 AS DOUBLE))""").as("df_welch"))
  }

  val abTestSql: String =
    s"""WITH j AS (
       |  SELECT c.c_mktsegment AS seg, o.o_totalprice AS v
       |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
       |  WHERE c.c_mktsegment IN ('$AbArmA', '$AbArmB')),
       |m AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN seg = '$AbArmA' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_a,
       |    CAST(SUM(CASE WHEN seg = '$AbArmB' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_b,
       |    ${DetSql.dsum(s"CASE WHEN seg = '$AbArmA' THEN v END")} AS sx_a,
       |    ${DetSql.dsum(s"CASE WHEN seg = '$AbArmB' THEN v END")} AS sx_b,
       |    ${DetSql.dsum(s"CASE WHEN seg = '$AbArmA' THEN v * v END")}
       |      AS sxx_a,
       |    ${DetSql.dsum(s"CASE WHEN seg = '$AbArmB' THEN v * v END")}
       |      AS sxx_b
       |  FROM j),
       |d AS (
       |  SELECT n_a, n_b,
       |    sx_a / CAST(n_a AS DOUBLE) AS mean_a,
       |    sx_b / CAST(n_b AS DOUBLE) AS mean_b,
       |    (sxx_a - sx_a * sx_a / CAST(n_a AS DOUBLE))
       |      / CAST(n_a - 1 AS DOUBLE) AS var_a,
       |    (sxx_b - sx_b * sx_b / CAST(n_b AS DOUBLE))
       |      / CAST(n_b - 1 AS DOUBLE) AS var_b
       |  FROM m),
       |d2 AS (
       |  SELECT *, var_a / CAST(n_a AS DOUBLE) AS q_a,
       |    var_b / CAST(n_b AS DOUBLE) AS q_b
       |  FROM d)
       |SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
       |  (mean_a - mean_b) / SQRT(q_a + q_b) AS t_welch,
       |  ((q_a + q_b) * (q_a + q_b)) /
       |    (q_a * q_a / CAST(n_a - 1 AS DOUBLE)
       |     + q_b * q_b / CAST(n_b - 1 AS DOUBLE)) AS df_welch
       |FROM d2""".stripMargin

  /** Chi-squared independence test between customer segment and order
    * status — the categorical counterpart of [[abTest]]: is order
    * outcome independent of segment? One (seg, status) contingency
    * aggregate (cells ≤ |segments|·|statuses|, tiny); margins come
    * from window sums OVER THE CELLS, not a second fact scan. Each
    * cell's χ² contribution `(O−E)²/E` is computed in a pinned IEEE
    * order from exact BIGINT counts, then quantized to micro-units
    * (ROUND half-up — both engines agree on non-negatives) so the
    * cross-cell SUM is an order-free integer — float summation order
    * across cells is the one place engines could diverge, and ints
    * close it. Output: one row with n, df, and χ² in micro-units
    * (the caller applies the χ² CDF lookup, as with [[abTest]]). */
  def chi2Test(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        col("o_orderstatus").as("st"))
      .agg(count(lit(1)).as("o"))
    val whole = Window.partitionBy()
    val withMargins = cells
      .withColumn("r", sum(col("o")).over(Window.partitionBy(col("seg"))))
      .withColumn("c", sum(col("o")).over(Window.partitionBy(col("st"))))
      .withColumn("n", sum(col("o")).over(whole))
      .withColumn("e", expr("CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE)"))
      .withColumn("d", expr("CAST(o AS DOUBLE) - e"))
      .withColumn("contrib_micro",
        expr("CAST(ROUND(d * d / e * 1000000.0d) AS BIGINT)"))
    withMargins.agg(
        min(col("n")).as("n"),
        ((countDistinct(col("seg")) - 1) *
          (countDistinct(col("st")) - 1)).as("df"),
        sum(col("contrib_micro")).as("chi2_micro"))
  }

  val chi2TestSql: String =
    s"""WITH cells AS (
       |  SELECT c.c_mktsegment AS seg, o.o_orderstatus AS st,
       |    CAST(COUNT(*) AS BIGINT) AS o
       |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
       |  GROUP BY 1, 2),
       |m AS (
       |  SELECT seg, st, o,
       |    CAST(SUM(o) OVER (PARTITION BY seg) AS BIGINT) AS r,
       |    CAST(SUM(o) OVER (PARTITION BY st) AS BIGINT) AS c,
       |    CAST(SUM(o) OVER () AS BIGINT) AS n
       |  FROM cells),
       |k AS (
       |  SELECT seg, st, o, r, c, n,
       |    CAST(o AS DOUBLE) - CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE)
       |      AS d,
       |    CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE) AS e
       |  FROM m)
       |SELECT MIN(n) AS n,
       |  CAST((COUNT(DISTINCT seg) - 1) * (COUNT(DISTINCT st) - 1)
       |    AS BIGINT) AS df,
       |  CAST(SUM(CAST(ROUND(d * d / e * 1000000.0) AS BIGINT)) AS BIGINT)
       |    AS chi2_micro
       |FROM k""".stripMargin

  /** Two-sample Kolmogorov–Smirnov test between the same two arms as
    * [[abTest]] — the distribution-shape counterpart of the mean test:
    * D = max |F_a(x) − F_b(x)| over order values, located exactly.
    * Values quantize to exact cents ([[Det.cents]]) so the ECDF steps
    * are integer events; the supremum is evaluated as the
    * cross-multiplied BIGINT `|ca·n_b − cb·n_a|` (no float compare
    * picks the max), and only the FINAL reported d is one IEEE
    * division. Ties are handled exactly: both ECDFs are evaluated
    * after absorbing all rows at each distinct value.
    *
    * Scale shape: one conditional aggregate to the distinct-value
    * frame (cardinality ≤ the cent-price DOMAIN, not the row count —
    * the [[chi2Test]] cell-frame argument: ~10⁶ rows at any data
    * scale), then one ordered window over that bounded frame and a
    * TakeOrdered(1) for the argmax. Row count never reaches the
    * window. */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment").isin(AbArmA, AbArmB))
      .select(col("c_mktsegment").as("seg"),
        Det.cents(col("o_totalprice")).as("v"))
    val cells = v.groupBy(col("v")).agg(
      sum(when(col("seg") === AbArmA, 1L).otherwise(0L)).as("na_v"),
      sum(when(col("seg") === AbArmB, 1L).otherwise(0L)).as("nb_v"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy()
    cells
      .withColumn("ca", sum(col("na_v")).over(w))
      .withColumn("cb", sum(col("nb_v")).over(w))
      .withColumn("n_a", sum(col("na_v")).over(whole))
      .withColumn("n_b", sum(col("nb_v")).over(whole))
      .withColumn("d_num", abs(col("ca") * col("n_b") - col("cb") * col("n_a")))
      .orderBy(col("d_num").desc, col("v"))
      .limit(1)
      .select(col("n_a"), col("n_b"), col("d_num"),
        col("v").as("at_cents"),
        expr("CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)").as("d"))
  }

  val ksTestSql: String =
    s"""WITH v AS (
       |  SELECT c.c_mktsegment AS seg,
       |    ${DetSql.cents("o.o_totalprice")} AS v
       |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
       |  WHERE c.c_mktsegment IN ('$AbArmA', '$AbArmB')),
       |cells AS (
       |  SELECT v,
       |    CAST(SUM(CASE WHEN seg = '$AbArmA' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS na_v,
       |    CAST(SUM(CASE WHEN seg = '$AbArmB' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS nb_v
       |  FROM v GROUP BY v),
       |c AS (
       |  SELECT v, na_v, nb_v,
       |    CAST(SUM(na_v) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS ca,
       |    CAST(SUM(nb_v) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cb,
       |    CAST(SUM(na_v) OVER () AS BIGINT) AS n_a,
       |    CAST(SUM(nb_v) OVER () AS BIGINT) AS n_b
       |  FROM cells)
       |SELECT n_a, n_b, ABS(ca * n_b - cb * n_a) AS d_num, v AS at_cents,
       |  CAST(ABS(ca * n_b - cb * n_a) AS DOUBLE)
       |    / CAST(n_a * n_b AS DOUBLE) AS d
       |FROM c
       |ORDER BY d_num DESC, v
       |LIMIT 1""".stripMargin

  /** Mann–Whitney U (rank-sum) test between the same two arms — the
    * non-parametric mean test the pipeline reaches for when values are
    * heavy-tailed. All rank arithmetic stays in DOUBLED integer units
    * so tie-averaged ranks (the `.5` case) never touch floats:
    * `2·avgrank(v) = 2·cum_before(v) + cnt(v) + 1`, summed per arm as
    * exact BIGINTs. The normal-approximation z (tie-corrected
    * variance) is the only float block, in a spelled-out IEEE order
    * identical in both engines. Same bounded distinct-value frame as
    * [[ksTest]]; row count never reaches the window. */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment").isin(AbArmA, AbArmB))
      .select(col("c_mktsegment").as("seg"),
        Det.cents(col("o_totalprice")).as("v"))
    val cells = v.groupBy(col("v")).agg(
      sum(when(col("seg") === AbArmA, 1L).otherwise(0L)).as("na_v"),
      sum(when(col("seg") === AbArmB, 1L).otherwise(0L)).as("nb_v"))
    val wPrev = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val m = cells
      .withColumn("cnt", col("na_v") + col("nb_v"))
      .withColumn("before", coalesce(sum(col("cnt")).over(wPrev), lit(0L)))
      .agg(
        sum(col("na_v")).as("n_a"),
        sum(col("nb_v")).as("n_b"),
        sum(col("na_v") * (lit(2L) * col("before") + col("cnt") + 1L))
          .as("r2_a"),
        sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("ties"))
    m.select(col("n_a"), col("n_b"), col("r2_a"), col("ties"),
        expr("r2_a - n_a * (n_a + 1)").as("u2_a"),
        expr("2 * n_a * n_b - (r2_a - n_a * (n_a + 1))").as("u2_b"))
      // z from doubled units: E[2U] = n_a·n_b; Var[2U] = 4·Var[U];
      // squares are explicit multiplies (the abTest pow() rule)
      .withColumn("z", expr(
        """(CAST(u2_a AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
           / (2.0d * sqrt(
               CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0d
               * (CAST(n_a + n_b + 1 AS DOUBLE)
                  - CAST(ties AS DOUBLE)
                    / (CAST(n_a + n_b AS DOUBLE)
                       * CAST(n_a + n_b - 1 AS DOUBLE)))))"""))
  }

  val mannWhitneySql: String =
    s"""WITH v AS (
       |  SELECT c.c_mktsegment AS seg,
       |    ${DetSql.cents("o.o_totalprice")} AS v
       |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
       |  WHERE c.c_mktsegment IN ('$AbArmA', '$AbArmB')),
       |cells AS (
       |  SELECT v,
       |    CAST(SUM(CASE WHEN seg = '$AbArmA' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS na_v,
       |    CAST(SUM(CASE WHEN seg = '$AbArmB' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS nb_v
       |  FROM v GROUP BY v),
       |c AS (
       |  SELECT na_v, nb_v, na_v + nb_v AS cnt,
       |    COALESCE(CAST(SUM(na_v + nb_v) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      0) AS before
       |  FROM cells),
       |m AS (
       |  SELECT CAST(SUM(na_v) AS BIGINT) AS n_a,
       |    CAST(SUM(nb_v) AS BIGINT) AS n_b,
       |    CAST(SUM(na_v * (2 * before + cnt + 1)) AS BIGINT) AS r2_a,
       |    CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS ties
       |  FROM c),
       |u AS (
       |  SELECT n_a, n_b, r2_a, ties,
       |    r2_a - n_a * (n_a + 1) AS u2_a,
       |    2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS u2_b
       |  FROM m)
       |SELECT n_a, n_b, r2_a, ties, u2_a, u2_b,
       |  (CAST(u2_a AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
       |  / (2.0 * SQRT(
       |      CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
       |      * (CAST(n_a + n_b + 1 AS DOUBLE)
       |         - CAST(ties AS DOUBLE)
       |           / (CAST(n_a + n_b AS DOUBLE)
       |              * CAST(n_a + n_b - 1 AS DOUBLE))))) AS z
       |FROM u""".stripMargin

  /** Cohen's kappa between two deterministic labelers — the
    * inter-annotator-agreement metric a labeling pipeline reports
    * before trusting auto-labels: labeler A is the
    * [[graft.llm.Text.langId]] 2% stopword rule, labeler B the
    * stricter 4% variant; kappa corrects raw agreement for chance
    * using the marginals. Evaluated EXACTLY by clearing denominators:
    * `kappa = (po − pe)/(1 − pe) = (agree·n − Σ m_A·m_B)
    * / (n² − Σ m_A·m_B)` — numerator and denominator exact BIGINTs,
    * one final IEEE division (plus an integer ppm twin).
    *
    * Scale shape: one projection pass, ONE 2×2 cell aggregate, scalar
    * arithmetic on the 4-row frame. */
  def cohenKappa(spark: SparkSession, dir: String): DataFrame = {
    val labeled = Tables.documents(spark, dir)
      .select((size(filter(expr(
          "filter(split(lower(text), ' '), t -> t != '')"),
          t => t === "the" || t === "a")) /
          greatest(size(expr("filter(split(lower(text), ' '), t -> t != '')")),
            lit(1))).as("sr"))
      .select(
        when(col("sr") >= 0.02, "en").otherwise("und").as("a"),
        when(col("sr") >= 0.04, "en").otherwise("und").as("b"))
    val cells = labeled.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c"))
    cells.agg(
        sum(col("c")).as("n"),
        sum(when(col("a") === col("b"), col("c")).otherwise(0L))
          .as("n_agree"),
        sum(when(col("a") === "en", col("c")).otherwise(0L)).as("ma_en"),
        sum(when(col("b") === "en", col("c")).otherwise(0L)).as("mb_en"))
      .select(col("n"), col("n_agree"),
        expr("ma_en * mb_en + (n - ma_en) * (n - mb_en)").as("chance_nn"))
      .select(col("n"), col("n_agree"),
        expr("n_agree * n - chance_nn").as("kappa_num"),
        expr("n * n - chance_nn").as("kappa_den"))
      .withColumn("kappa_ppm",
        expr("(1000000L * kappa_num) div kappa_den"))
      .withColumn("kappa",
        expr("CAST(kappa_num AS DOUBLE) / CAST(kappa_den AS DOUBLE)"))
  }

  val cohenKappaSql: String =
    """WITH lab AS (
      |  SELECT CASE WHEN sr >= 0.02 THEN 'en' ELSE 'und' END AS a,
      |    CASE WHEN sr >= 0.04 THEN 'en' ELSE 'und' END AS b
      |  FROM (
      |    SELECT CAST(LEN(LIST_FILTER(toks, t -> t = 'the' OR t = 'a'))
      |        AS INT) / CAST(GREATEST(LEN(toks), 1) AS INT) AS sr
      |    FROM (SELECT LIST_FILTER(string_split(lower(text), ' '),
      |            t -> t <> '') AS toks
      |          FROM documents))),
      |cells AS (
      |  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM lab GROUP BY 1, 2),
      |m AS (
      |  SELECT CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS n_agree,
      |    CAST(SUM(CASE WHEN a = 'en' THEN c ELSE 0 END) AS BIGINT) AS ma_en,
      |    CAST(SUM(CASE WHEN b = 'en' THEN c ELSE 0 END) AS BIGINT) AS mb_en
      |  FROM cells),
      |k AS (
      |  SELECT n, n_agree,
      |    n_agree * n - (ma_en * mb_en + (n - ma_en) * (n - mb_en))
      |      AS kappa_num,
      |    n * n - (ma_en * mb_en + (n - ma_en) * (n - mb_en)) AS kappa_den
      |  FROM m)
      |SELECT n, n_agree, kappa_num, kappa_den,
      |  CASE WHEN kappa_num < 0
      |    THEN -((-(1000000 * kappa_num)) // kappa_den)
      |    ELSE (1000000 * kappa_num) // kappa_den END AS kappa_ppm,
      |  CAST(kappa_num AS DOUBLE) / CAST(kappa_den AS DOUBLE) AS kappa
      |FROM k""".stripMargin

  /** First significant digit of a positive BIGINT by magnitude
    * laddering — identical text runs as Spark expr and DuckDB SQL
    * (integer `div`/`//` differ, so the divisor ladder uses nested
    * CASE and a final small-range division both engines share). */
  /** First significant digit of a positive BIGINT, via its exact
    * decimal STRING rendering — identical text in Spark and DuckDB
    * (integer rendering never goes scientific; only doubles do, which
    * is why the value must already be exact cents). Replaced the r7
    * 13-branch magnitude-ladder CASE: after projection collapse the
    * ladder inlined the DECIMAL(27,10) cents expression into all 26
    * branch slots, and Spark's codegen skips common-subexpression
    * elimination inside conditional branches — the decimal math ran
    * per branch (measured 1.67 s → 0.26 s at sf0.1). Unbounded in
    * magnitude, so the 10¹³ ladder ceiling (ADVICE r7) is gone too;
    * the 1..9 guard below stays as the c>0 domain's belt-and-braces. */
  private def firstDigitExpr(c: String): String =
    s"CAST(substr(CAST($c AS STRING), 1, 1) AS BIGINT)"

  /** Benford's-law expected first-digit shares, ppm, as pinned
    * literals (`log10(1+1/d)` precomputed — evaluating log10 in-query
    * would put a libm call on the hash path for a CONSTANT). */
  private val BenfordPpm: Map[Int, Long] = Map(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** Benford first-digit audit of order totals — the fraud/anomaly
    * screen accountants run on money columns: observed first-digit
    * counts vs Benford's expected shares, per-digit deviation, and a
    * χ² statistic in micro-units (the [[chi2Test]] quantization — the
    * cross-digit sum is an order-free integer). Expected shares are
    * pinned ppm literals, so no libm call touches the hash path.
    *
    * Scale shape: first digit is a string projection; ONE 9-cell
    * aggregate + scalar frame; χ² assembles on the 9-row frame. */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    val expCase = BenfordPpm.toSeq.sortBy(_._1)
      .map { case (d, p) => s"WHEN $d THEN ${p}L" }
      .mkString("CASE digit ", " ", " ELSE 0L END")
    // first significant digit from the exact-cents BIGINT's string
    // rendering (×100 shifts the decimal point, leading digit
    // unchanged; integer→text never goes scientific, unlike the
    // double it came from) — see [[firstDigitExpr]] for why this
    // replaced the magnitude ladder
    val digits = Tables.orders(spark, dir)
      .select(Det.cents(col("o_totalprice")).as("c"))
      .where(col("c") > 0)
      .select(expr(firstDigitExpr("c")).as("digit"))
      // domain guard mirroring the oracle (ADVICE r7): for c > 0 the
      // first character is always a digit 1..9, so this is pure
      // belt-and-braces against a future non-positive domain
      .where(col("digit").between(1, 9))
      .groupBy(col("digit")).agg(count(lit(1)).as("observed"))
    val w = Window.partitionBy()
    digits
      .withColumn("n", sum(col("observed")).over(w))
      .withColumn("expected_ppm", expr(expCase))
      .withColumn("expected_micro_n",
        expr("n * expected_ppm")) // expected count ×1e6, exact
      .withColumn("dev_micro", expr(
        "CAST(ROUND((CAST(observed AS DOUBLE) * 1000000.0d" +
          " - CAST(expected_micro_n AS DOUBLE))" +
          " * (CAST(observed AS DOUBLE) * 1000000.0d" +
          " - CAST(expected_micro_n AS DOUBLE))" +
          " / CAST(expected_micro_n AS DOUBLE) / 1000000.0d)" +
          " AS BIGINT)"))
      .select(col("digit"), col("observed"), col("n"),
        col("expected_ppm"),
        expr("(1000000L * observed) div n").as("observed_ppm"),
        col("dev_micro"))
      .orderBy(col("digit"))
  }

  val benfordSql: String = {
    val expCase = BenfordPpm.toSeq.sortBy(_._1)
      .map { case (d, p) => s"WHEN $d THEN $p" }
      .mkString("CASE digit ", " ", " ELSE 0 END")
    s"""WITH cts AS (
       |  SELECT ${DetSql.cents("o_totalprice")} AS c FROM orders),
       |d AS (
       |  SELECT ${firstDigitExpr("c")} AS digit
       |  FROM cts WHERE c > 0),
       |cells AS (
       |  SELECT digit, CAST(COUNT(*) AS BIGINT) AS observed
       |  FROM d WHERE digit BETWEEN 1 AND 9
       |  GROUP BY digit),
       |m AS (
       |  SELECT digit, observed,
       |    CAST(SUM(observed) OVER () AS BIGINT) AS n,
       |    CAST($expCase AS BIGINT) AS expected_ppm
       |  FROM cells),
       |k AS (
       |  SELECT digit, observed, n, expected_ppm,
       |    n * expected_ppm AS expected_micro_n
       |  FROM m)
       |SELECT digit, observed, n, expected_ppm,
       |  (1000000 * observed) // n AS observed_ppm,
       |  CAST(ROUND((CAST(observed AS DOUBLE) * 1000000.0
       |      - CAST(expected_micro_n AS DOUBLE))
       |    * (CAST(observed AS DOUBLE) * 1000000.0
       |      - CAST(expected_micro_n AS DOUBLE))
       |    / CAST(expected_micro_n AS DOUBLE) / 1000000.0) AS BIGINT)
       |    AS dev_micro
       |FROM k
       |ORDER BY digit""".stripMargin
  }

  /** Mutual information between customer segment and order status —
    * the information-theoretic lens on the same contingency table
    * [[chi2Test]] tests: `MI = Σ p(x,y)·ln(p(x,y)/(p(x)p(y)))`, plus
    * both marginal entropies and the normalized MI
    * `2·MI/(H(X)+H(Y))`. Every ln runs on ratios of exact BIGINT
    * counts (bit-identical doubles in both engines) and every
    * per-cell/per-margin term is quantized to micro-nats (half away
    * from zero, the [[graft.llm.Text.lmScore]] contract) so the
    * cross-cell sums are order-free integers; NMI is one integer ppm
    * division at the end.
    *
    * Scale shape: ONE contingency aggregate (cells ≤ |segs|·|stats|),
    * margins from windows over the cell frame, scalar assembly. */
  def mutualInfo(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("x"), col("o_orderstatus").as("y"))
      .agg(count(lit(1)).as("c"))
    val whole = Window.partitionBy()
    val m = cells
      .withColumn("r", sum(col("c")).over(Window.partitionBy(col("x"))))
      .withColumn("s", sum(col("c")).over(Window.partitionBy(col("y"))))
      .withColumn("n", sum(col("c")).over(whole))
      .withColumn("mi_cell_micro", expr(
        """CAST(ROUND(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
          |  * ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
          |       / (CAST(r AS DOUBLE) * CAST(s AS DOUBLE)))
          |  * 1000000.0d) AS BIGINT)""".stripMargin))
    // marginal entropies from DISTINCT margins (each margin counted
    // once, not once per cell)
    val hx = m.select(col("x"), col("r"), col("n")).distinct()
      .agg(sum(expr(
        """CAST(ROUND(-(CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
          |  * ln(CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
          |  * 1000000.0d) AS BIGINT)""".stripMargin)).as("hx_micro"))
    val hy = m.select(col("y"), col("s"), col("n")).distinct()
      .agg(sum(expr(
        """CAST(ROUND(-(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          |  * ln(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          |  * 1000000.0d) AS BIGINT)""".stripMargin)).as("hy_micro"))
    m.agg(min(col("n")).as("n"), count(lit(1)).as("n_cells"),
        sum(col("mi_cell_micro")).as("mi_micro"))
      .crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
      .select(col("n"), col("n_cells"), col("mi_micro"),
        col("hx_micro"), col("hy_micro"),
        // NMI clamps the quantized MI at 0: true MI is non-negative but
        // the rounded cell sum can dip a few micro-nats below zero,
        // and negative `div` vs `//` semantics differ
        expr("(1000000L * 2 * greatest(mi_micro, 0L)) div (hx_micro + hy_micro)")
          .as("nmi_ppm"))
  }

  val mutualInfoSql: String =
    """WITH cells AS (
      |  SELECT c.c_mktsegment AS x, o.o_orderstatus AS y,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2),
      |m AS (
      |  SELECT x, y, c,
      |    CAST(SUM(c) OVER (PARTITION BY x) AS BIGINT) AS r,
      |    CAST(SUM(c) OVER (PARTITION BY y) AS BIGINT) AS s,
      |    CAST(SUM(c) OVER () AS BIGINT) AS n
      |  FROM cells),
      |mic AS (
      |  SELECT n,
      |    CAST(ROUND(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
      |      * ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
      |           / (CAST(r AS DOUBLE) * CAST(s AS DOUBLE)))
      |      * 1000000.0) AS BIGINT) AS mi_cell_micro
      |  FROM m),
      |hx AS (
      |  SELECT CAST(SUM(CAST(ROUND(-(CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
      |    * ln(CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0)
      |    AS BIGINT)) AS BIGINT) AS hx_micro
      |  FROM (SELECT DISTINCT x, r, n FROM m)),
      |hy AS (
      |  SELECT CAST(SUM(CAST(ROUND(-(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      |    * ln(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0)
      |    AS BIGINT)) AS BIGINT) AS hy_micro
      |  FROM (SELECT DISTINCT y, s, n FROM m)),
      |mi AS (
      |  SELECT CAST(MIN(n) AS BIGINT) AS n,
      |    CAST(COUNT(*) AS BIGINT) AS n_cells,
      |    CAST(SUM(mi_cell_micro) AS BIGINT) AS mi_micro
      |  FROM mic)
      |SELECT mi.n, mi.n_cells, mi.mi_micro, hx.hx_micro, hy.hy_micro,
      |  (1000000 * 2 * GREATEST(mi.mi_micro, 0)) // (hx.hx_micro + hy.hy_micro)
      |    AS nmi_ppm
      |FROM mi, hx, hy""".stripMargin

  /** Trimmed (5-95%) robust mean of order totals per segment — the
    * outlier-resistant center a reporting pipeline quotes next to the
    * raw mean: per segment, the interpolated [p5, p95] bounds, then
    * count/sum/integer-mean of the cents inside the bounds, plus the
    * trimmed fraction in ppm. EVERYTHING is exact integers, including
    * the interpolation: rank (n−1)·p splits into integer part q and
    * hundredth remainder f, and the bound ×100 is
    * `c₍q₊₁₎·(100−f) + c₍q₊₂₎·f` — exact BIGINT "centi-cents", so
    * `c inside [lo, hi]` is the integer compare `100·c ∈ [lo100,
    * hi100]`, identical to the real-valued interpolated contract
    * without ever evaluating it in floats. The r7 form used
    * `percentile()`/`quantile_cont` doubles — the same engine-
    * divergent interpolation class the r8 x5 oracle gate caught in
    * ts_winsorize (Spark and DuckDB evaluate different IEEE
    * sequences), fixed here proactively; the emitted bounds are the
    * exact lo100/hi100 integers.
    *
    * Scale shape: one segment-keyed rank window + conditional
    * aggregate for the bounds (broadcast back — ≤|segments| rows),
    * one conditional re-aggregate over the same broadcast-dim
    * join. */
  def trimmedMean(spark: SparkSession, dir: String): DataFrame = {
    val j = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        Det.cents(col("o_totalprice")).as("c"))
    val wRank = Window.partitionBy(col("seg")).orderBy(col("c"))
    val wSeg = Window.partitionBy(col("seg"))
    def bound(p: Int, name: String) = Seq(
      min(when(col("rn") === expr(s"(n - 1) * $p div 100 + 1"), col("c")))
        .as(s"${name}_a"),
      min(when(col("rn") === expr(s"(n - 1) * $p div 100 + 2"), col("c")))
        .as(s"${name}_b"),
      min(expr(s"(n - 1) * $p % 100")).as(s"${name}_f"))
    val bounds = j
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wSeg))
      .groupBy(col("seg"))
      .agg(bound(5, "lo").head, bound(5, "lo").tail ++ bound(95, "hi"): _*)
      .select(col("seg"),
        expr("lo_a * (100 - lo_f) + coalesce(lo_b, lo_a) * lo_f")
          .as("lo100"),
        expr("hi_a * (100 - hi_f) + coalesce(hi_b, hi_a) * hi_f")
          .as("hi100"))
    j.join(broadcast(bounds), "seg")
      .withColumn("keep",
        col("c") * 100 >= col("lo100") && col("c") * 100 <= col("hi100"))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("c")).otherwise(0L)).as("sum_kept"),
        min(col("lo100")).as("lo100"), min(col("hi100")).as("hi100"))
      .select(col("seg"), col("n"), col("n_kept"),
        expr("sum_kept div n_kept").as("trimmed_mean_cents"),
        expr("(1000000L * (n - n_kept)) div n").as("trimmed_ppm"),
        col("lo100"), col("hi100"))
      .orderBy(col("seg"))
  }

  val trimmedMeanSql: String =
    s"""WITH j AS (
       |  SELECT c.c_mktsegment AS seg,
       |    ${DetSql.cents("o.o_totalprice")} AS c
       |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
       |r AS (
       |  SELECT seg, c,
       |    ROW_NUMBER() OVER (PARTITION BY seg ORDER BY c) AS rn,
       |    COUNT(*) OVER (PARTITION BY seg) AS n
       |  FROM j),
       |b0 AS (
       |  SELECT seg,
       |    MIN(CASE WHEN rn = (n - 1) * 5 // 100 + 1 THEN c END) AS lo_a,
       |    MIN(CASE WHEN rn = (n - 1) * 5 // 100 + 2 THEN c END) AS lo_b,
       |    MIN((n - 1) * 5 % 100) AS lo_f,
       |    MIN(CASE WHEN rn = (n - 1) * 95 // 100 + 1 THEN c END) AS hi_a,
       |    MIN(CASE WHEN rn = (n - 1) * 95 // 100 + 2 THEN c END) AS hi_b,
       |    MIN((n - 1) * 95 % 100) AS hi_f
       |  FROM r GROUP BY seg),
       |b AS (
       |  SELECT seg,
       |    CAST(lo_a * (100 - lo_f) + COALESCE(lo_b, lo_a) * lo_f
       |      AS BIGINT) AS lo100,
       |    CAST(hi_a * (100 - hi_f) + COALESCE(hi_b, hi_a) * hi_f
       |      AS BIGINT) AS hi100
       |  FROM b0)
       |SELECT j.seg, CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(CASE WHEN j.c * 100 >= b.lo100 AND j.c * 100 <= b.hi100
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN j.c * 100 >= b.lo100 AND j.c * 100 <= b.hi100
       |    THEN j.c ELSE 0 END) AS BIGINT)
       |    // CAST(SUM(CASE WHEN j.c * 100 >= b.lo100 AND j.c * 100 <= b.hi100
       |      THEN 1 ELSE 0 END) AS BIGINT) AS trimmed_mean_cents,
       |  (1000000 * (CAST(COUNT(*) AS BIGINT)
       |    - CAST(SUM(CASE WHEN j.c * 100 >= b.lo100 AND j.c * 100 <= b.hi100
       |        THEN 1 ELSE 0 END) AS BIGINT)))
       |    // CAST(COUNT(*) AS BIGINT) AS trimmed_ppm,
       |  CAST(MIN(b.lo100) AS BIGINT) AS lo100,
       |  CAST(MIN(b.hi100) AS BIGINT) AS hi100
       |FROM j JOIN b ON b.seg = j.seg
       |GROUP BY j.seg
       |ORDER BY j.seg""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_mutual_info" -> mutualInfo,
    "agg_trimmed_mean" -> trimmedMean,
    "agg_basket_lift" -> basketLift,
    "agg_ab_test" -> abTest,
    "agg_chi2_test" -> chi2Test,
    "agg_ks_test" -> ksTest,
    "agg_mannwhitney" -> mannWhitney,
    "agg_cohen_kappa" -> cohenKappa,
    "agg_benford" -> benford,
  )

  val oracleSql: Map[String, String] = Map(
    "agg_basket_lift" -> basketLiftSql,
    "agg_ab_test" -> abTestSql,
    "agg_chi2_test" -> chi2TestSql,
    "agg_ks_test" -> ksTestSql,
    "agg_mannwhitney" -> mannWhitneySql,
    "agg_cohen_kappa" -> cohenKappaSql,
    "agg_benford" -> benfordSql,
    "agg_mutual_info" -> mutualInfoSql,
    "agg_trimmed_mean" -> trimmedMeanSql,
  )
}
