package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Text-analysis operators for training-data pipelines (SURVEY.md §2B
  * `llm_text_*` family): corpus stats, language-ID heuristic, quality
  * scoring, token counting, and document fingerprinting.
  *
  * All are single-pass per-row expressions plus at most one groupBy —
  * at 100 TB each is a map-side-combined hash aggregate or a pure
  * projection, no cross-row shuffle beyond the aggregate itself.
  * Ratios are exact-int / exact-int divisions (bit-identical IEEE in
  * both engines); no libm functions in hashed output.
  */
object Text {

  private def toks = filter(split(lower(col("text")), " "), t => t =!= "")

  /** Corpus stats per (lang, source): doc count, char volume, token
    * mean, char bounds. */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), col("source"), col("n_chars"),
        size(toks).cast("long").as("n_tokens"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        (sum(col("n_tokens")) / count(lit(1))).as("avg_tokens"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"), col("source"))

  val textStatsSql: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(SUM(n_tokens) AS BIGINT) / COUNT(*) AS avg_tokens,
      |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM (SELECT lang, source, n_chars,
      |        CAST(LEN(LIST_FILTER(string_split(lower(text), ' '), t -> t <> '')) AS BIGINT) AS n_tokens
      |      FROM documents)
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  /** Stopword-ratio language-ID heuristic. The synthetic corpus has an
    * English-stopword vocabulary only, so the heuristic is
    * intentionally simple: the-ratio ≥ 2% → 'en', else 'und'. A real
    * n-gram profile model is the same plan shape (per-row expression →
    * argmax over per-language scores), so the 100 TB cost is
    * identical: one projection. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        (size(filter(toks, t => t === "the" || t === "a")) /
          greatest(size(toks), lit(1))).as("stop_ratio"))
      .select(col("doc_id"), col("lang"), col("stop_ratio"),
        when(col("stop_ratio") >= 0.02, "en").otherwise("und").as("pred_lang"))
      .withColumn("is_match", col("pred_lang") === col("lang"))
      .orderBy(col("doc_id"))

  val langIdSql: String =
    """SELECT doc_id, lang, stop_ratio,
      |  CASE WHEN stop_ratio >= 0.02 THEN 'en' ELSE 'und' END AS pred_lang,
      |  (CASE WHEN stop_ratio >= 0.02 THEN 'en' ELSE 'und' END) = lang AS is_match
      |FROM (
      |  SELECT doc_id, lang,
      |    CAST(LEN(LIST_FILTER(toks, t -> t = 'the' OR t = 'a')) AS INT)
      |      / CAST(GREATEST(LEN(toks), 1) AS INT) AS stop_ratio
      |  FROM (SELECT doc_id, lang,
      |          LIST_FILTER(string_split(lower(text), ' '), t -> t <> '') AS toks
      |        FROM documents))
      |ORDER BY doc_id""".stripMargin

  /** Quality scoring: length score, mean token length, stopword ratio,
    * composite. Weighted sum of doubles in a fixed order — identical
    * IEEE sequence in the oracle. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        size(toks).cast("long").as("n_tokens"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("n_letters"),
        size(filter(toks, t => t === "the" || t === "a")).cast("long").as("n_stop"))
      .select(col("doc_id"), col("n_tokens"),
        least(col("n_tokens") / lit(100.0), lit(1.0)).as("len_score"),
        (col("n_letters") / greatest(col("n_tokens"), lit(1L))).as("mean_tok_len"),
        (col("n_stop") / greatest(col("n_tokens"), lit(1L))).as("stop_ratio"))
      .withColumn("score",
        col("len_score") * 0.5 + col("stop_ratio") * 0.3 +
          least(col("mean_tok_len") / lit(8.0), lit(1.0)) * 0.2)
      .withColumn("passed", col("score") >= 0.4)
      .orderBy(col("doc_id"))

  val qualityScoreSql: String =
    """SELECT doc_id, n_tokens,
      |  LEAST(n_tokens / 100.0, 1.0) AS len_score,
      |  n_letters / GREATEST(n_tokens, 1) AS mean_tok_len,
      |  n_stop / GREATEST(n_tokens, 1) AS stop_ratio,
      |  LEAST(n_tokens / 100.0, 1.0) * 0.5
      |    + (n_stop / GREATEST(n_tokens, 1)) * 0.3
      |    + LEAST((n_letters / GREATEST(n_tokens, 1)) / 8.0, 1.0) * 0.2 AS score,
      |  (LEAST(n_tokens / 100.0, 1.0) * 0.5
      |    + (n_stop / GREATEST(n_tokens, 1)) * 0.3
      |    + LEAST((n_letters / GREATEST(n_tokens, 1)) / 8.0, 1.0) * 0.2) >= 0.4 AS passed
      |FROM (
      |  SELECT doc_id,
      |    CAST(LEN(toks) AS BIGINT) AS n_tokens,
      |    CAST(LENGTH(REPLACE(text, ' ', '')) AS BIGINT) AS n_letters,
      |    CAST(LEN(LIST_FILTER(toks, t -> t = 'the' OR t = 'a')) AS BIGINT) AS n_stop
      |  FROM (SELECT doc_id, text,
      |          LIST_FILTER(string_split(lower(text), ' '), t -> t <> '') AS toks
      |        FROM documents))
      |ORDER BY doc_id""".stripMargin

  /** Token counting three ways: whitespace split, regex word
    * extraction (BPE-ish pre-tokenizer), and the chars/4 estimate. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(toks).as("n_ws"),
        size(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("n_re"),
        ceil(col("n_chars") / lit(4.0)).as("est_bpe"))
      .orderBy(col("doc_id"))

  val tokenCountSql: String =
    """SELECT doc_id,
      |  CAST(LEN(LIST_FILTER(string_split(lower(text), ' '), t -> t <> '')) AS INT) AS n_ws,
      |  CAST(LEN(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INT) AS n_re,
      |  CAST(CEIL(n_chars / 4.0) AS BIGINT) AS est_bpe
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Document fingerprinting: whole-text digest plus min/max over
    * 5-char-shingle hashes (winnowing-style selection — the min-hash
    * picks a content-stable representative shingle, robust to small
    * edits at the ends). No explode: the shingle set stays inside a
    * per-row array expression. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(col("text")).as("full_md5"),
        expr("""array_min(transform(
          |  transform(sequence(0, greatest(length(text)-5, 0)),
          |            i -> substr(text, i+1, 5)),
          |  s -> md5(s)))""".stripMargin).as("min_shingle_md5"),
        expr("""array_max(transform(
          |  transform(sequence(0, greatest(length(text)-5, 0)),
          |            i -> substr(text, i+1, 5)),
          |  s -> md5(s)))""".stripMargin).as("max_shingle_md5"))
      .orderBy(col("doc_id"))

  val fingerprintSql: String =
    """SELECT doc_id,
      |  md5(text) AS full_md5,
      |  LIST_MIN([md5(substr(text, i+1, 5))
      |            for i in range(0, greatest(length(text)-4, 1))]) AS min_shingle_md5,
      |  LIST_MAX([md5(substr(text, i+1, 5))
      |            for i in range(0, greatest(length(text)-4, 1))]) AS max_shingle_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_text_stats" -> textStats,
    "llm_lang_id" -> langId,
    "llm_quality_score" -> qualityScore,
    "llm_token_count" -> tokenCount,
    "llm_fingerprint" -> fingerprint,
  )

  val oracleSql: Map[String, String] = Map(
    "llm_text_stats" -> textStatsSql,
    "llm_lang_id" -> langIdSql,
    "llm_quality_score" -> qualityScoreSql,
    "llm_token_count" -> tokenCountSql,
    "llm_fingerprint" -> fingerprintSql,
  )
}
