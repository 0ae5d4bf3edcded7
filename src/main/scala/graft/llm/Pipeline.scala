package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus pipeline — the registry's operators
  * COMPOSED the way a real data pipeline runs them, oracle-checked as
  * one query:
  *
  *   1. quality gate   ([[Text.qualityScore]] `passed`)
  *   2. near-dup dedup ([[Dedup.dedupApply]] `kept` — cluster
  *      representatives only)
  *   3. train split    ([[Text.trainTestSplit]] `split = 'train'`)
  *   4. sequence pack  ([[Text.pack]]'s prefix-sum bin assignment over
  *      the SURVIVING docs)
  *
  * emitting per (source, bin): doc count, token count, doc-id range.
  * Each stage is the registry query itself (not a re-implementation),
  * so the composition proves the operators actually chain — the
  * "switch your pipeline to this library" claim in executable form.
  * The oracle rebuilds the same four stages from the shared SQL
  * fragments (fixpoint CTE, quality formula, md5 split algebra), so
  * neither side can drift from its standalone twin.
  *
  * Scale shape: stage 1 and 3 are pure projections, stage 2 is the
  * banded fixpoint + a broadcast join, stage 4 is a per-shard window —
  * the composition adds NO new shuffle beyond its stages' own.
  */
object Pipeline {

  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    val passed = Text.qualityScore(spark, dir)
      .where(col("passed")).select(col("doc_id"), col("n_tokens"))
    val kept = Dedup.dedupApply(spark, dir)
      .where(col("kept")).select(col("doc_id"), col("source"))
    val train = Text.trainTestSplit(spark, dir)
      .where(col("split") === "train").select(col("doc_id"))
    val surv = passed.join(kept, "doc_id").join(train, "doc_id")
    Text.packBins(surv.select(col("source"), col("doc_id"), col("n_tokens")))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("bin"))
  }

  lazy val pipelineSql: String =
    s"""${Dedup.clusterFixpointCteSql},
       |${Dedup.compCteSql},
       |kept AS (
       |  SELECT d.doc_id, d.source
       |  FROM documents d LEFT OUTER JOIN comp c ON d.doc_id = c.doc_id
       |  WHERE c.cluster_id IS NULL OR c.cluster_id = d.doc_id),
       |qstats AS (
       |  ${Text.qualityStatsSql}),
       |q AS (
       |  SELECT doc_id, n_tokens
       |  FROM qstats
       |  WHERE (${Text.qualityFormulaSql}) >= 0.4),
       |sp AS (
       |  SELECT doc_id, ${Text.splitBucketExpr} AS bucket
       |  FROM (SELECT doc_id, md5('split:' || CAST(doc_id AS STRING)) AS h
       |        FROM documents)),
       |train AS (
       |  SELECT doc_id FROM sp WHERE (${Text.splitCaseExpr}) = 'train'),
       |surv AS (
       |  SELECT k.source, q.doc_id, q.n_tokens
       |  FROM q JOIN kept k ON q.doc_id = k.doc_id
       |  JOIN train t ON q.doc_id = t.doc_id),
       |packed AS (
       |  ${Text.packStartTokSql("surv")})
       |SELECT source, start_tok // ${Text.PackBudget} AS bin, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM packed
       |GROUP BY source, bin
       |ORDER BY source, bin""".stripMargin

  /** The SFT data-build pipeline — the round-7 stages composed end to
    * end, same doctrine as [[pipeline]] (each stage IS the registry
    * operator, the oracle rebuilds from the shared SQL fragments):
    *
    *   1. sub-document dedup gate ([[Text.spanDedup]] `keep` — drop
    *      docs that are mostly globally-duplicated segment mass)
    *   2. instruction-pair render ([[Text.sftFormat]] — complete
    *      (prompt, completion) examples only)
    *   3. hash-shard assignment (the md5-bucket idiom — run/engine/
    *      retry-stable where rand() is not)
    *
    * emitting the per (lang, shard) manifest a fine-tune job consumes:
    * example count, prompt char mass, doc-id range. Stage 1 is the
    * two-level segment aggregation, stage 2 a projection, stage 3 a
    * 40-group rollup — the composition again adds NO new shuffle
    * beyond its stages' own. */
  def sftPipeline(spark: SparkSession, dir: String): DataFrame = {
    val keep = Text.spanDedupCore(spark, dir)
      .where(col("keep")).select(col("doc_id"))
    Text.sftFormatCore(spark, dir)
      .join(keep, "doc_id")
      .withColumn("h", expr("md5('sftshard:' || CAST(doc_id AS STRING))"))
      .withColumn("shard", expr(Text.splitBucketExpr) % 8)
      .groupBy(col("lang"), col("shard"))
      .agg(count(lit(1)).as("n_examples"),
        sum(length(col("prompt")).cast("long")).as("prompt_chars"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"), col("shard"))
  }

  lazy val sftPipelineSql: String =
    s"""WITH sd AS (
       |  ${Text.spanDedupCoreSql}),
       |ex AS (
       |  ${Text.sftFormatCoreSql}),
       |sharded AS (
       |  SELECT doc_id, lang, prompt, (${Text.splitBucketExpr}) % 8 AS shard
       |  FROM (
       |    SELECT ex.doc_id, ex.lang, ex.prompt,
       |      md5('sftshard:' || CAST(ex.doc_id AS STRING)) AS h
       |    FROM ex JOIN sd ON ex.doc_id = sd.doc_id AND sd.keep))
       |SELECT lang, shard, count(*) AS n_examples,
       |  CAST(SUM(LENGTH(prompt)) AS BIGINT) AS prompt_chars,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM sharded
       |GROUP BY lang, shard
       |ORDER BY lang, shard""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_pipeline" -> pipeline,
    "llm_sft_pipeline" -> sftPipeline,
  )

  val oracleSql: Map[String, String] = Map(
    "llm_pipeline" -> pipelineSql,
    "llm_sft_pipeline" -> sftPipelineSql,
  )
}
