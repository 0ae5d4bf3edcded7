package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "feat_target_encode" -> targetEncode,
  )

  val oracleSql: Map[String, String] = Map(
    "feat_target_encode" -> targetEncodeSql,
  )
}
