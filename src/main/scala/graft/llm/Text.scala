package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Det, DetSql, Tables}

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

  /** Temperature-based source-mixing weights — the data-mixing step a
    * multi-source training corpus runs before sampling: each source's
    * sampling share ∝ n_docs^α with α = 1/2, so small sources are
    * up-weighted relative to proportional sampling and large sources
    * down-weighted (`boost` is that relative factor). α = 1/2 is
    * deliberately sqrt: IEEE-754 requires sqrt correctly rounded, so
    * both engines compute the identical double where a libm pow(x, α)
    * could differ in the last ulp. The weight is then fixed-point
    * quantized (×10⁴, half-up) so the normalizing sum is exact BIGINT
    * arithmetic — order-free — and share/boost are single
    * correctly-rounded divisions of exactly-equal operands. One
    * groupBy shuffle on source; the normalization window runs over a
    * handful of source rows. */
  def sampleWeights(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy() // whole-frame: a few source rows
    Tables.documents(spark, dir)
      .select(col("source"), size(toks).cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .withColumn("weight_q", expr(weightQSql))
      .withColumn("share",
        col("weight_q").cast("double") /
          sum(col("weight_q")).over(w).cast("double"))
      .withColumn("boost",
        col("share") * sum(col("n_docs")).over(w).cast("double") /
          col("n_docs").cast("double"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("weight_q"), col("share"), col("boost"))
      .orderBy(col("source"))
  }

  /** The α=1/2 fixed-point weight quantization over an `n_docs`
    * column — ONE definition shared by [[sampleWeightsSql]] and
    * [[mixPlanSql]] (review: a re-typed copy would let a temperature
    * or scale change drift between the share report and the quota
    * plan). */
  private val weightQSql: String =
    "CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 10000 + 0.5) AS BIGINT)"

  lazy val sampleWeightsSql: String =
    s"""WITH per AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(CAST(LEN(LIST_FILTER(string_split(lower(text), ' '),
      |      t -> t <> '')) AS BIGINT)) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |q AS (
      |  SELECT source, n_docs, n_tokens,
      |    $weightQSql AS weight_q
      |  FROM per)
      |SELECT source, n_docs, n_tokens, weight_q,
      |  CAST(weight_q AS DOUBLE) / CAST(SUM(weight_q) OVER () AS DOUBLE) AS share,
      |  (CAST(weight_q AS DOUBLE) / CAST(SUM(weight_q) OVER () AS DOUBLE))
      |    * CAST(SUM(n_docs) OVER () AS DOUBLE) / CAST(n_docs AS DOUBLE) AS boost
      |FROM q
      |ORDER BY source""".stripMargin

  /** Token-budget allocation — turn the [[sampleWeights]] mixing
    * shares into actual per-source token quotas for a fixed training
    * budget (10 M tokens), by largest-remainder apportionment: floor
    * quotas first, then the leftover tokens go one-by-one to the
    * largest fractional remainders (ties broken by source name). The
    * whole computation is exact integer arithmetic — weights are the
    * already-quantized weight_q, remainders compare as BIGINTs — so
    * quotas sum to the budget EXACTLY in both engines, which a
    * float-rounded allocation cannot guarantee. Windows run over a
    * handful of source rows. */
  def mixPlan(spark: SparkSession, dir: String): DataFrame = {
    val budget = 10000000L
    val w = Window.partitionBy()
    val wRank = Window.partitionBy()
      .orderBy(col("rem").desc, col("source"))
    sampleWeights(spark, dir)
      .select(col("source"), col("n_docs"), col("weight_q"))
      .withColumn("sum_wq", sum(col("weight_q")).over(w))
      .withColumn("floor_q",
        expr(s"($budget * weight_q) DIV sum_wq"))
      .withColumn("rem",
        expr(s"($budget * weight_q) % sum_wq"))
      .withColumn("n_extra",
        (lit(budget) - sum(col("floor_q")).over(w)).cast("long"))
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .select(col("source"), col("n_docs"), col("weight_q"),
        (col("floor_q") + when(col("rk") <= col("n_extra"), 1L)
          .otherwise(0L)).as("token_quota"))
      .orderBy(col("source"))
  }

  lazy val mixPlanSql: String =
    s"""WITH counts AS (
      |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
      |per AS (
      |  SELECT source, n_docs, $weightQSql AS weight_q
      |  FROM counts),
      |q AS (
      |  SELECT source, n_docs, weight_q,
      |    CAST(SUM(weight_q) OVER () AS BIGINT) AS sum_wq
      |  FROM per),
      |f AS (
      |  SELECT source, n_docs, weight_q,
      |    (10000000 * weight_q) // sum_wq AS floor_q,
      |    (10000000 * weight_q) % sum_wq AS rem
      |  FROM q),
      |r AS (
      |  SELECT source, n_docs, weight_q, floor_q,
      |    CAST(10000000 - SUM(floor_q) OVER () AS BIGINT) AS n_extra,
      |    CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS BIGINT) AS rk
      |  FROM f)
      |SELECT source, n_docs, weight_q,
      |  CAST(floor_q + CASE WHEN rk <= n_extra THEN 1 ELSE 0 END AS BIGINT)
      |    AS token_quota
      |FROM r
      |ORDER BY source""".stripMargin

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

  /** Per-doc (n_tokens, n_letters, n_stop) stats feeding the quality
    * formula — the ONE Spark-side source, twin of [[qualityStatsSql]]. */
  private def qualityStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        size(toks).cast("long").as("n_tokens"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("n_letters"),
        size(filter(toks, t => t === "the" || t === "a")).cast("long").as("n_stop"))

  /** Spark twin of [[qualityFormulaSql]] over the [[qualityStats]]
    * columns — the ONE Column-side definition of the composite
    * (review: it had drifted into three re-typed copies). */
  private def qualityScoreCol: org.apache.spark.sql.Column =
    least(col("n_tokens") / lit(100.0), lit(1.0)) * 0.5 +
      (col("n_stop") / greatest(col("n_tokens"), lit(1L))) * 0.3 +
      least((col("n_letters") / greatest(col("n_tokens"), lit(1L))) / lit(8.0),
        lit(1.0)) * 0.2

  /** Quality scoring: length score, mean token length, stopword ratio,
    * composite. Weighted sum of doubles in a fixed order — identical
    * IEEE sequence in the oracle. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    qualityStats(spark, dir)
      .withColumn("score", qualityScoreCol)
      .select(col("doc_id"), col("n_tokens"),
        least(col("n_tokens") / lit(100.0), lit(1.0)).as("len_score"),
        (col("n_letters") / greatest(col("n_tokens"), lit(1L))).as("mean_tok_len"),
        (col("n_stop") / greatest(col("n_tokens"), lit(1L))).as("stop_ratio"),
        col("score"))
      .withColumn("passed", col("score") >= 0.4)
      .orderBy(col("doc_id"))

  /** The weighted composite, over (n_tokens, n_letters, n_stop) —
    * single source for [[qualityScoreSql]] and the composed pipeline
    * oracle, so the two can never drift. */
  private[llm] val qualityFormulaSql: String =
    """LEAST(n_tokens / 100.0, 1.0) * 0.5
      |    + (n_stop / GREATEST(n_tokens, 1)) * 0.3
      |    + LEAST((n_letters / GREATEST(n_tokens, 1)) / 8.0, 1.0) * 0.2""".stripMargin

  /** Per-doc token/letter/stopword counts feeding the formula. */
  private[llm] val qualityStatsSql: String =
    """SELECT doc_id,
      |    CAST(LEN(toks) AS BIGINT) AS n_tokens,
      |    CAST(LENGTH(REPLACE(text, ' ', '')) AS BIGINT) AS n_letters,
      |    CAST(LEN(LIST_FILTER(toks, t -> t = 'the' OR t = 'a')) AS BIGINT) AS n_stop
      |  FROM (SELECT doc_id, text,
      |          LIST_FILTER(string_split(lower(text), ' '), t -> t <> '') AS toks
      |        FROM documents)""".stripMargin

  lazy val qualityScoreSql: String =
    s"""SELECT doc_id, n_tokens,
       |  LEAST(n_tokens / 100.0, 1.0) AS len_score,
       |  n_letters / GREATEST(n_tokens, 1) AS mean_tok_len,
       |  n_stop / GREATEST(n_tokens, 1) AS stop_ratio,
       |  $qualityFormulaSql AS score,
       |  ($qualityFormulaSql) >= 0.4 AS passed
       |FROM (
       |  $qualityStatsSql)
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

  private val ChunkSize = 50

  /** Document chunking — the unit-of-training-data operator: split
    * each document into fixed-token-count chunks, one output row per
    * chunk. Pure per-row array algebra (sequence → explode → dynamic
    * slice), so it scales as a projection + generator with no shuffle
    * until the sink. */
  def chunk(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), greatest(
          ceil(size(col("t")) / lit(ChunkSize.toDouble)).cast("int") - 1,
          lit(0)))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        array_join(slice(col("t"), col("chunk_id") * ChunkSize + 1,
          lit(ChunkSize)), " ").as("chunk_text"),
        size(slice(col("t"), col("chunk_id") * ChunkSize + 1,
          lit(ChunkSize))).as("chunk_tokens"))
      .orderBy(col("doc_id"), col("chunk_id"))

  val chunkSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    LIST_FILTER(string_split(lower(text), ' '), t -> t <> '') AS t
       |  FROM documents)
       |SELECT doc_id, CAST(k AS INT) AS chunk_id,
       |  array_to_string(t[k*$ChunkSize+1 : (k+1)*$ChunkSize], ' ') AS chunk_text,
       |  CAST(len(t[k*$ChunkSize+1 : (k+1)*$ChunkSize]) AS INT) AS chunk_tokens
       |FROM toks,
       |  unnest(range(0, greatest(CAST(ceil(len(t) / $ChunkSize.0) AS BIGINT), 1))) AS u(k)
       |ORDER BY doc_id, chunk_id""".stripMargin

  private val OverlapStride = 25

  /** Overlapping chunking — the RAG / retrieval-index default: windows
    * of [[ChunkSize]] tokens every [[OverlapStride]] (50% overlap), so
    * a fact straddling a boundary is whole in the adjacent window —
    * the property non-overlapping [[chunk]] trades away for zero
    * duplication. Tail rule: the last window starts at the last
    * stride boundary BEFORE the end (short tail allowed, size > 0),
    * duplicated-token cost = size/stride − 1 ≈ 1×. Same
    * shuffle-free generator shape as [[chunk]]. */
  def chunkOverlap(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), greatest(
          ceil(size(col("t")) / lit(OverlapStride.toDouble)).cast("int") - 1,
          lit(0)))).as("win_id"))
      .select(col("doc_id"), col("win_id"),
        (col("win_id") * OverlapStride).as("start_tok"),
        array_join(slice(col("t"), col("win_id") * OverlapStride + 1,
          lit(ChunkSize)), " ").as("window_text"),
        size(slice(col("t"), col("win_id") * OverlapStride + 1,
          lit(ChunkSize))).as("window_tokens"))
      .where(col("window_tokens") > 0)
      .orderBy(col("doc_id"), col("win_id"))

  val chunkOverlapSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    LIST_FILTER(string_split(lower(text), ' '), t -> t <> '') AS t
       |  FROM documents)
       |SELECT doc_id, CAST(k AS INT) AS win_id,
       |  CAST(k * $OverlapStride AS INT) AS start_tok,
       |  array_to_string(t[k*$OverlapStride+1 : k*$OverlapStride+$ChunkSize], ' ') AS window_text,
       |  CAST(len(t[k*$OverlapStride+1 : k*$OverlapStride+$ChunkSize]) AS INT) AS window_tokens
       |FROM toks,
       |  unnest(range(0, greatest(CAST(ceil(len(t) / $OverlapStride.0) AS BIGINT), 1))) AS u(k)
       |WHERE len(t[k*$OverlapStride+1 : k*$OverlapStride+$ChunkSize]) > 0
       |ORDER BY doc_id, win_id""".stripMargin

  /** Sequence packing — the step between chunking and batching in a
    * training pipeline: lay documents end-to-end into fixed
    * token-budget bins (here 512), recording for each doc its bin and
    * token offset inside it. This is offset packing (docs may straddle
    * a bin boundary and continue into the next, like GPT-style
    * document concatenation with a fixed context stride), so the
    * assignment is a pure prefix-sum: bin = floor(start/budget) —
    * no greedy bin-state loop, fully parallel.
    *
    * Scale shape: the prefix sum runs per `source` (a real corpus
    * packs per shard), so each window partition is one shard, not the
    * corpus; one shuffle on source. */
  /** Token budget per packed bin — single source for [[pack]] and the
    * composed pipeline (both engines' SQL embeds it). */
  private[llm] val PackBudget = 512

  /** The packing core over any (source, doc_id, n_tokens) frame:
    * per-shard prefix sum → start_tok and bin columns. Shared by
    * [[pack]] and [[Pipeline.pipeline]] so the two cannot drift. */
  private[llm] def packBins(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", expr(s"start_tok DIV $PackBudget"))
  }

  /** DuckDB twin of [[packBins]]'s prefix sum, over relation `rel`. */
  private[llm] def packStartTokSql(rel: String): String =
    s"""SELECT source, doc_id, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS start_tok
       |  FROM $rel""".stripMargin

  def pack(spark: SparkSession, dir: String): DataFrame =
    packBins(Tables.documents(spark, dir)
        .select(col("source"), col("doc_id"),
          size(toks).cast("long").as("n_tokens")))
      .select(col("source"), col("doc_id"), col("n_tokens"), col("bin"),
        (col("start_tok") % PackBudget).as("bin_offset"))
      .orderBy(col("source"), col("doc_id"))

  lazy val packSql: String =
    s"""WITH t AS (
       |  SELECT source, doc_id,
       |    CAST(LEN(LIST_FILTER(string_split(lower(text), ' '), t -> t <> ''))
       |         AS BIGINT) AS n_tokens
       |  FROM documents),
       |s AS (
       |  ${packStartTokSql("t")})
       |SELECT source, doc_id, n_tokens,
       |  start_tok // $PackBudget AS bin,
       |  start_tok % $PackBudget AS bin_offset
       |FROM s
       |ORDER BY source, doc_id""".stripMargin

  /** Packing-efficiency report over [[pack]]'s bin assignment — the
    * metric a training-data team actually watches: bins produced per
    * shard, fill rate (token volume over bin capacity; offset packing
    * leaves waste only in each shard's final bin), and how many docs
    * straddle a bin boundary (pay a mid-document context break). Same
    * single per-shard window as pack plus one source-keyed aggregate. */
  def packStats(spark: SparkSession, dir: String): DataFrame =
    packBins(Tables.documents(spark, dir)
        .select(col("source"), col("doc_id"),
          size(toks).cast("long").as("n_tokens")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        (max(col("bin")) + 1L).as("n_bins"),
        sum(when(col("start_tok") % PackBudget + col("n_tokens") > PackBudget,
          1L).otherwise(0L)).as("n_straddlers"))
      .withColumn("fill_rate",
        col("total_tokens").cast("double") /
          (col("n_bins") * PackBudget).cast("double"))
      .orderBy(col("source"))

  lazy val packStatsSql: String =
    s"""WITH t AS (
       |  SELECT source, doc_id,
       |    CAST(LEN(LIST_FILTER(string_split(lower(text), ' '), t -> t <> ''))
       |         AS BIGINT) AS n_tokens
       |  FROM documents),
       |s AS (
       |  ${packStartTokSql("t")})
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  MAX(start_tok // $PackBudget) + 1 AS n_bins,
       |  CAST(SUM(CASE WHEN start_tok % $PackBudget + n_tokens > $PackBudget
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers,
       |  CAST(SUM(n_tokens) AS DOUBLE)
       |    / CAST((MAX(start_tok // $PackBudget) + 1) * $PackBudget AS DOUBLE)
       |    AS fill_rate
       |FROM s
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** PII redaction: scrub emails and phone-shaped digits. The corpus
    * has none, so a deterministic contact header is prepended first —
    * the query shows detection counts and the scrubbed text. Simple
    * ASCII regexes chosen to mean the same thing in Java regex (Spark)
    * and RE2 (DuckDB). */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val raw = concat(
      lit("contact: user"), col("doc_id"), lit("@example.com phone 555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" "),
      col("text"))
    // escape-free patterns: identical bytes survive Spark SQL string
    // parsing, Scala strings, and DuckDB SQL strings
    val emailPat = "[a-z0-9.]+@[a-z0-9.]+"
    val phonePat = "[0-9]{3}-[0-9]{4}"
    Tables.documents(spark, dir)
      .select(col("doc_id"), raw.as("raw"))
      .select(col("doc_id"),
        size(expr(s"regexp_extract_all(raw, '$emailPat', 0)")).as("n_emails"),
        size(expr(s"regexp_extract_all(raw, '$phonePat', 0)")).as("n_phones"),
        substring(
          regexp_replace(regexp_replace(col("raw"), emailPat, "<EMAIL>"),
            phonePat, "<PHONE>"), 1, 80).as("redacted_head"))
      .orderBy(col("doc_id"))
  }

  val piiRedactSql: String =
    """WITH raw AS (
      |  SELECT doc_id,
      |    'contact: user' || doc_id || '@example.com phone 555-' ||
      |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' || text AS raw
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(raw, '[a-z0-9.]+@[a-z0-9.]+')) AS INT) AS n_emails,
      |  CAST(len(regexp_extract_all(raw, '[0-9]{3}-[0-9]{4}')) AS INT) AS n_phones,
      |  substr(regexp_replace(regexp_replace(raw,
      |    '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
      |    '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'), 1, 80) AS redacted_head
      |FROM raw
      |ORDER BY doc_id""".stripMargin

  /** Benchmark decontamination — the pretraining-hygiene operator:
    * flag training documents whose word-8-gram sets overlap a held-out
    * set (here: source='src0' stands in for the benchmark corpus).
    * Distinct 8-grams per doc, semi-join against the benchmark gram
    * set, containment = matched/total. One gram-keyed shuffle; 8-grams
    * are rare enough that the join stays sparse at corpus scale (the
    * same reason real pipelines use 8–13-grams). */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), split(lower(col("text")), " ").as("t"))
      .select(col("doc_id"), col("source"), explode(expr(
        """transform(sequence(0, greatest(size(t)-8, 0)),
          |  i -> array_join(slice(t, i+1, 8), ' '))""".stripMargin)).as("g"))
      .where(length(col("g")) > 0)
      .distinct()
    val bench = grams.where(col("source") === "src0").select(col("g").as("bg")).distinct()
    val cand = grams.where(col("source") =!= "src0")
    val totals = cand.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val matched = cand.join(bench, col("g") === col("bg"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_matched"))
    totals.join(matched, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"))
      .withColumn("containment", col("n_matched") / col("n_grams"))
      .withColumn("contaminated", col("containment") >= 0.1)
      .orderBy(col("doc_id"))
  }

  val decontaminateSql: String =
    """WITH grams AS (
      |  SELECT DISTINCT doc_id, source,
      |    unnest([array_to_string(t[i+1 : i+8], ' ')
      |            for i in range(0, greatest(len(t)-7, 1))]) AS g
      |  FROM (SELECT doc_id, source, string_split(lower(text), ' ') AS t
      |        FROM documents)),
      |grams2 AS (SELECT * FROM grams WHERE length(g) > 0),
      |bench AS (SELECT DISTINCT g FROM grams2 WHERE source = 'src0'),
      |cand AS (SELECT doc_id, g FROM grams2 WHERE source <> 'src0'),
      |totals AS (SELECT doc_id, count(*) AS n_grams FROM cand GROUP BY doc_id),
      |matched AS (
      |  SELECT doc_id, count(*) AS n_matched FROM cand
      |  WHERE EXISTS (SELECT 1 FROM bench WHERE bench.g = cand.g)
      |  GROUP BY doc_id)
      |SELECT t.doc_id, t.n_grams,
      |  COALESCE(m.n_matched, 0) AS n_matched,
      |  COALESCE(m.n_matched, 0) / t.n_grams AS containment,
      |  COALESCE(m.n_matched, 0) / t.n_grams >= 0.1 AS contaminated
      |FROM totals t LEFT OUTER JOIN matched m ON t.doc_id = m.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** BM25 keyword scoring over the corpus for a fixed query-term set —
    * the inverted-index shape: tokenize → term frequencies keyed by
    * (doc, term) → document frequencies keyed by term → score. At
    * 100 TB the tf aggregation is the only corpus-wide shuffle (keyed
    * by doc, map-side combined); df and the corpus stats are tiny and
    * broadcast. The score formula is one shared SQL string evaluated
    * by both engines (identical parse → identical IEEE op order);
    * ROUND(...,4) absorbs the ≤1-ulp libm skew LN can introduce,
    * the discipline fn_math established. */
  def bm25(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(toks).as("term"))
    // cache the tiny per-doc length frame: both the join and the corpus
    // aggregate read it, which uncached would re-tokenize the corpus
    // and repeat the doc-keyed shuffle (caller drains per discipline)
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl")).cache()
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = tok.where(col("term").isin(bm25Terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(dl, "doc_id")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(corpus))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("dl"),
        expr(bm25ScoreExpr).as("score"))
      .orderBy(col("term"), col("doc_id"))
  }

  private val bm25Terms = Seq("spark", "query", "vector")

  /** k1=1.2, b=0.75; shared verbatim between Spark and DuckDB. */
  private val bm25ScoreExpr: String =
    """ROUND(
      |  LN(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
      |            / (CAST(df AS DOUBLE) + 0.5))
      |  * ((CAST(tf AS DOUBLE) * 2.2)
      |     / (CAST(tf AS DOUBLE)
      |        + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
      |                 / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))),
      |4)""".stripMargin

  val bm25Sql: String =
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS term
       |  FROM documents),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
       |corpus AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       |       WHERE term IN (${bm25Terms.map(t => s"'$t'").mkString(", ")})
       |       GROUP BY doc_id, term),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
       |SELECT tf.doc_id, tf.term, tf.tf, dfreq.df, dl.dl,
       |  $bm25ScoreExpr AS score
       |FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN corpus
       |ORDER BY term, doc_id""".stripMargin

  /** Deterministic train/val/test split — the held-out-split operator
    * every training pipeline needs. The assignment hashes the document
    * id (md5, engine-identical) into a 16-bit bucket and thresholds at
    * 90/5/5, so the split is stable across runs, machines, and engines
    * — no `rand()`, whose sample is neither reproducible cross-engine
    * nor stable under partial task retry (same hazard as the salted
    * join). Pure projection: at 100 TB the split costs one map pass.
    * The nibble→int algebra is the same instr trick the SimHash
    * pipeline established for both engines. */
  def trainTestSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("h", expr("md5('split:' || CAST(doc_id AS STRING))"))
      .select(col("doc_id"), expr(splitBucketExpr).as("bucket"))
      .withColumn("split", expr(splitCaseExpr))
      .orderBy(col("doc_id"))

  /** First 4 md5 nibbles → 0..65535, shared verbatim between engines. */
  private[llm] val splitBucketExpr: String =
    """CAST((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
      |   + (instr('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
      |   + (instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
      |   + (instr('0123456789abcdef', substr(h, 4, 1)) - 1) AS BIGINT)""".stripMargin

  private[llm] val splitCaseExpr: String =
    """CASE WHEN bucket < 58982 THEN 'train'
      |     WHEN bucket < 62259 THEN 'val'
      |     ELSE 'test' END""".stripMargin

  val splitSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, md5('split:' || CAST(doc_id AS STRING)) AS h
       |  FROM documents),
       |b AS (SELECT doc_id, $splitBucketExpr AS bucket FROM h)
       |SELECT doc_id, bucket, $splitCaseExpr AS split
       |FROM b
       |ORDER BY doc_id""".stripMargin

  /** Repetition ratio — the duplicate-n-gram quality signal corpus
    * filters use (heavily repeated boilerplate predicts low quality):
    * per doc, the fraction of duplicate words and duplicate word
    * bigrams. Pure projection (no shuffle beyond the oracle sort);
    * ratios are exact-int / exact-int IEEE divisions. */
  def repetition(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_words"),
        size(array_distinct(col("t"))).cast("long").as("n_uniq_words"),
        // try_element_at: out-of-range → NULL (as DuckDB's t[i]);
        // plain element_at throws under ANSI on 1-token docs
        expr(
          """filter(transform(sequence(0, greatest(size(t)-2, 0)),
            |  i -> concat(try_element_at(t, i+1), ' ', try_element_at(t, i+2))),
            |  x -> x IS NOT NULL)""".stripMargin).as("bg"))
      .select(col("doc_id"), col("n_words"), col("n_uniq_words"),
        size(col("bg")).cast("long").as("n_bigrams"),
        size(array_distinct(col("bg"))).cast("long").as("n_uniq_bigrams"))
      // zero-denominator guard: a doc with no words/bigrams has no
      // duplicates → fraction 0.0. Spark's ANSI double division throws
      // DIVIDE_BY_ZERO and DuckDB yields inf — the CASE keeps both
      // engines defined and equal on degenerate docs.
      .withColumn("dup_word_frac",
        when(col("n_words") === 0, lit(0.0)).otherwise(
          (col("n_words") - col("n_uniq_words")).cast("double") / col("n_words")))
      .withColumn("dup_bigram_frac",
        when(col("n_bigrams") === 0, lit(0.0)).otherwise(
          (col("n_bigrams") - col("n_uniq_bigrams")).cast("double") / col("n_bigrams")))
      .withColumn("is_repetitive", col("dup_bigram_frac") >= 0.2)
      .orderBy(col("doc_id"))

  val repetitionSql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, t,
      |    list_filter([t[i+1] || ' ' || t[i+2]
      |                 for i in range(0, greatest(len(t)-1, 1))],
      |                x -> x IS NOT NULL) AS b
      |  FROM base)
      |SELECT doc_id,
      |  CAST(LEN(t) AS BIGINT) AS n_words,
      |  CAST(LEN(LIST_DISTINCT(t)) AS BIGINT) AS n_uniq_words,
      |  CAST(LEN(b) AS BIGINT) AS n_bigrams,
      |  CAST(LEN(LIST_DISTINCT(b)) AS BIGINT) AS n_uniq_bigrams,
      |  CASE WHEN LEN(t) = 0 THEN 0.0
      |       ELSE CAST(LEN(t) - LEN(LIST_DISTINCT(t)) AS DOUBLE) / LEN(t) END AS dup_word_frac,
      |  CASE WHEN LEN(b) = 0 THEN 0.0
      |       ELSE CAST(LEN(b) - LEN(LIST_DISTINCT(b)) AS DOUBLE) / LEN(b) END AS dup_bigram_frac,
      |  (CASE WHEN LEN(b) = 0 THEN 0.0
      |        ELSE CAST(LEN(b) - LEN(LIST_DISTINCT(b)) AS DOUBLE) / LEN(b) END) >= 0.2 AS is_repetitive
      |FROM bg
      |ORDER BY doc_id""".stripMargin

  /** Corpus n-gram frequency table: top-100 word bigrams by occurrence
    * with document frequency — the data product behind n-gram LMs,
    * contamination indexes, and boilerplate lists. One gram-keyed
    * shuffle (map-side combined); the top-k cut is a TakeOrdered, not
    * a global sort materialization. Deterministic cut: total order on
    * (count desc, gram). */
  /** Word-bigram array over token array `t` — shared by
    * [[ngramCounts]] and [[lmScore]] so the gram algebra cannot
    * drift. */
  private[llm] val bigramArrayExpr: String =
    """filter(transform(sequence(0, greatest(size(t)-2, 0)),
      |  i -> concat(try_element_at(t, i+1), ' ', try_element_at(t, i+2))),
      |  x -> x IS NOT NULL)""".stripMargin

  /** DuckDB twin of [[bigramArrayExpr]]. */
  private[llm] val bigramArraySql: String =
    """list_filter([t[i+1] || ' ' || t[i+2]
      |                 for i in range(0, greatest(len(t)-1, 1))],
      |                x -> x IS NOT NULL)""".stripMargin

  def ngramCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        split(lower(col("text")), " ").as("t"))
      .select(col("doc_id"), explode(expr(bigramArrayExpr)).as("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("g"))
      .limit(100)

  val ngramCountsSql: String =
    s"""WITH grams AS (
       |  SELECT doc_id, unnest($bigramArraySql) AS g
       |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents))
       |SELECT g, count(*) AS n_occurrences,
       |  count(DISTINCT doc_id) AS n_docs
       |FROM grams
       |GROUP BY g
       |ORDER BY n_occurrences DESC, g
       |LIMIT 100""".stripMargin

  /** Bigram language-model scoring — the perplexity-style quality
    * signal an n-gram LM gives each document: mean add-one-smoothed
    * log-probability of the doc's word bigrams under the corpus's own
    * bigram/unigram counts, ln P(w2|w1) = ln((C(w1w2)+1)/(C(w1)+V)).
    * Docs with fewer than 2 tokens have no bigrams and drop out.
    *
    * Determinism: each DISTINCT gram's log term is computed once and
    * fixed-point quantized (×10⁶, half-up) in the gram table, so the
    * per-doc aggregation is an exact BIGINT sum — order-free — and the
    * mean is two correctly-rounded divisions. The one libm call (ln)
    * runs on bit-identical doubles in both engines; a last-ulp libm
    * disagreement would have to land within one ulp of a 10⁻⁶ rounding
    * boundary to flip a hash — the same accepted exposure as
    * [[bm25]]'s ROUND(…,4).
    *
    * Scale shape: two gram-keyed map-side-combined shuffles (unigram +
    * bigram counts), the V scalar broadcast, one join back to the
    * occurrence stream, one doc-keyed aggregate — the inverted-index
    * build every n-gram LM pipeline runs. */
  def lmScore(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
    val occ = base.select(col("doc_id"), explode(expr(bigramArrayExpr)).as("g"))
    val uni = base.select(explode(col("t")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c_a"))
    val v = uni.agg(count(lit(1)).as("v"))
    val grams = occ.groupBy(col("g")).agg(count(lit(1)).as("c_ab"))
      .withColumn("w1", expr("try_element_at(split(g, ' '), 1)"))
      .join(uni, "w1")
      .crossJoin(broadcast(v))
      .select(col("g"), expr(
        "CAST(floor(ln((c_ab + 1.0) / (c_a + v)) * 1000000 + 0.5) AS BIGINT)")
        .as("logq"))
    occ.join(grams, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("logq")).as("ll_q"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("ll_q").cast("double") / lit(1000000.0) /
          col("n_bigrams").cast("double")).as("avg_ll"))
      .orderBy(col("doc_id"))
  }

  val lmScoreSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
       |occ AS (
       |  SELECT doc_id, unnest($bigramArraySql) AS g FROM base),
       |uni AS (
       |  SELECT w1, COUNT(*) AS c_a
       |  FROM (SELECT unnest(t) AS w1 FROM base) GROUP BY w1),
       |vc AS (SELECT COUNT(*) AS v FROM uni),
       |grams AS (
       |  SELECT b.g,
       |    CAST(floor(ln((b.c_ab + 1.0) / (u.c_a + vc.v)) * 1000000 + 0.5)
       |      AS BIGINT) AS logq
       |  FROM (SELECT g, COUNT(*) AS c_ab FROM occ GROUP BY g) b
       |  JOIN uni u ON string_split(b.g, ' ')[1] = u.w1
       |  CROSS JOIN vc)
       |SELECT o.doc_id, COUNT(*) AS n_bigrams,
       |  CAST(SUM(l.logq) AS DOUBLE) / 1000000.0
       |    / CAST(COUNT(*) AS DOUBLE) AS avg_ll
       |FROM occ o JOIN grams l ON o.g = l.g
       |GROUP BY o.doc_id
       |ORDER BY o.doc_id""".stripMargin

  /** Deterministic stratified corpus sample — 10% per language, the
    * "hold out an eval slice per stratum" step a multi-lingual corpus
    * runs so low-resource languages are not drowned by the head. Rank
    * within each stratum by md5(doc_id) (content-free, seed-free,
    * retry-stable — the same discipline as [[trainTestSplit]]) and keep
    * the first ⌈n/10⌉. One shuffle on the stratum key; the two window
    * functions share the single sort, and at 100 TB the quota compare
    * is integer-exact ((rank-1)*10 < stratum size) so no float
    * boundary can disagree between engines. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        md5(col("doc_id").cast("string")).as("rkey"))
      .withColumn("sample_rank",
        row_number().over(w.orderBy(col("rkey"))).cast("long"))
      .withColumn("stratum_size", count(lit(1)).over(w))
      .where((col("sample_rank") - 1) * 10 < col("stratum_size"))
      .select(col("doc_id"), col("lang"), col("source"),
        col("sample_rank"), col("stratum_size"))
      .orderBy(col("lang"), col("sample_rank"))
  }

  val sampleStratifiedSql: String =
    """WITH r AS (
      |  SELECT doc_id, lang, source,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR))) AS sample_rank,
      |    COUNT(*) OVER (PARTITION BY lang) AS stratum_size
      |  FROM documents)
      |SELECT doc_id, lang, source,
      |  CAST(sample_rank AS BIGINT) AS sample_rank,
      |  CAST(stratum_size AS BIGINT) AS stratum_size
      |FROM r WHERE (sample_rank - 1) * 10 < stratum_size
      |ORDER BY lang, sample_rank""".stripMargin

  /** Quality-gate funnel — per-stage survivor counts for the corpus
    * cleaning cascade (length → token count → stopword ratio), the
    * report a pipeline owner reads to see which gate is eating the
    * data. One scan: the three cumulative predicates aggregate to one
    * row of conditional counts (map-side combined), then `stack`
    * unpivots to a 4-row funnel on the driver-sized result. Retention
    * ratios are exact-int / exact-int double divisions — identical
    * IEEE in both engines. */
  def filterFunnel(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("n_chars"), size(toks).cast("long").as("n_tokens"),
        size(filter(toks, t => t === "the" || t === "a")).cast("long")
          .as("n_stop"))
      .select(
        (col("n_chars") >= 100).as("c1"),
        (col("n_tokens") >= 20).as("c2"),
        (col("n_stop") / greatest(col("n_tokens"), lit(1L)) >= 0.02).as("c3"))
      .agg(
        count(lit(1)).as("n0"),
        count(when(col("c1"), lit(1))).as("n1"),
        count(when(col("c1") && col("c2"), lit(1))).as("n2"),
        count(when(col("c1") && col("c2") && col("c3"), lit(1))).as("n3"))
    base.select(expr(
        """stack(4,
          |  0L, 'all',        n0, n0,
          |  1L, 'min_chars',  n1, n0,
          |  2L, 'min_tokens', n2, n1,
          |  3L, 'stop_ratio', n3, n2) AS (stage, stage_name, n_docs, n_prev)
          |""".stripMargin))
      .select(col("stage"), col("stage_name"), col("n_docs"),
        (col("n_docs").cast("double") / col("n_prev").cast("double"))
          .as("pct_of_prev"))
      .orderBy(col("stage"))
  }

  val filterFunnelSql: String =
    """WITH f AS (
      |  SELECT n_chars >= 100 AS c1, n_tokens >= 20 AS c2,
      |    (n_stop / GREATEST(n_tokens, 1)) >= 0.02 AS c3
      |  FROM (SELECT n_chars,
      |          CAST(LEN(toks) AS BIGINT) AS n_tokens,
      |          CAST(LEN(LIST_FILTER(toks, t -> t = 'the' OR t = 'a'))
      |            AS BIGINT) AS n_stop
      |        FROM (SELECT n_chars,
      |                LIST_FILTER(string_split(lower(text), ' '),
      |                  t -> t <> '') AS toks
      |              FROM documents))),
      |a AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n0,
      |    CAST(COUNT(*) FILTER (WHERE c1) AS BIGINT) AS n1,
      |    CAST(COUNT(*) FILTER (WHERE c1 AND c2) AS BIGINT) AS n2,
      |    CAST(COUNT(*) FILTER (WHERE c1 AND c2 AND c3) AS BIGINT) AS n3
      |  FROM f),
      |s AS (
      |  SELECT CAST(0 AS BIGINT) AS stage, 'all' AS stage_name,
      |         n0 AS n_docs, n0 AS n_prev FROM a
      |  UNION ALL SELECT 1, 'min_chars',  n1, n0 FROM a
      |  UNION ALL SELECT 2, 'min_tokens', n2, n1 FROM a
      |  UNION ALL SELECT 3, 'stop_ratio', n3, n2 FROM a)
      |SELECT stage, stage_name, n_docs,
      |  CAST(n_docs AS DOUBLE) / CAST(n_prev AS DOUBLE) AS pct_of_prev
      |FROM s ORDER BY stage""".stripMargin

  /** PMI formula over (cb, c1, c2, t_big, t_uni) — fixed-point
    * quantized ln, shared verbatim between the Spark expr and the
    * oracle so the collocation ranking compares exact BIGINTs. */
  private val pmiQExpr: String =
    """CAST(floor(ln(
      |  (CAST(cb AS DOUBLE) / CAST(t_big AS DOUBLE))
      |    / ((CAST(c1 AS DOUBLE) / CAST(t_uni AS DOUBLE))
      |       * (CAST(c2 AS DOUBLE) / CAST(t_uni AS DOUBLE)))
      |) * 1000000 + 0.5) AS BIGINT)""".stripMargin

  /** Collocation mining — top-100 bigrams by pointwise mutual
    * information (min count 5): the phrase lexicon a tokenizer or
    * boilerplate list is seeded from. PMI compares the bigram's
    * observed rate to the independence expectation of its unigrams.
    * Shape: one bigram shuffle + one unigram shuffle; the vocab-sized
    * unigram frame broadcasts back twice; totals are 1-row
    * crossJoins; final cut is TakeOrdered on the exact quantized
    * score. */
  def collocations(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir).select(toks.as("t"))
    // the SHARED bigram algebra (null-filtered, short-doc-guarded) —
    // review: an unguarded re-implementation here crashed on sub-2-token
    // docs via Spark's descending sequence(0, -1) and index 0
    val big = tok.select(explode(expr(bigramArrayExpr)).as("g"))
    val uni = tok.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val tUni = uni.agg(sum(col("cu")).as("t_uni"))
    val bc = big.groupBy(col("g")).agg(count(lit(1)).as("cb"))
    val tBig = bc.agg(sum(col("cb")).as("t_big"))
    bc.where(col("cb") >= 5)
      .join(broadcast(uni.select(col("w").as("w1"), col("cu").as("c1"))),
        split_part(col("g"), lit(" "), lit(1)) === col("w1"))
      .join(broadcast(uni.select(col("w").as("w2"), col("cu").as("c2"))),
        split_part(col("g"), lit(" "), lit(2)) === col("w2"))
      .crossJoin(broadcast(tUni)).crossJoin(broadcast(tBig))
      .withColumn("pmi_q", expr(pmiQExpr))
      .select(col("g").as("gram"), col("cb").as("n_pairs"),
        col("c1"), col("c2"),
        (col("pmi_q").cast("double") / 1000000.0).as("pmi"))
      .orderBy(col("pmi").desc, col("gram"))
      .limit(100)
  }

  lazy val collocationsSql: String =
    s"""WITH tok AS (
       |  SELECT LIST_FILTER(string_split(lower(text), ' '), x -> x <> '') AS t
       |  FROM documents),
       |big AS (
       |  SELECT unnest($bigramArraySql) AS g FROM tok),
       |uni AS (
       |  SELECT w, COUNT(*) AS cu
       |  FROM (SELECT unnest(t) AS w FROM tok) GROUP BY w),
       |tu AS (SELECT CAST(SUM(cu) AS BIGINT) AS t_uni FROM uni),
       |bc AS (SELECT g, COUNT(*) AS cb FROM big GROUP BY g),
       |tb AS (SELECT CAST(SUM(cb) AS BIGINT) AS t_big FROM bc),
       |j AS (
       |  SELECT bc.g, bc.cb, u1.cu AS c1, u2.cu AS c2, t_uni, t_big
       |  FROM bc
       |  JOIN uni u1 ON split_part(bc.g, ' ', 1) = u1.w
       |  JOIN uni u2 ON split_part(bc.g, ' ', 2) = u2.w
       |  CROSS JOIN tu CROSS JOIN tb
       |  WHERE bc.cb >= 5),
       |p AS (SELECT g, cb, c1, c2, $pmiQExpr AS pmi_q FROM j)
       |SELECT g AS gram, cb AS n_pairs, c1, c2,
       |  CAST(pmi_q AS DOUBLE) / 1000000.0 AS pmi
       |FROM p
       |ORDER BY pmi DESC, gram
       |LIMIT 100""".stripMargin

  /** JSONL export shape — each document rendered to the compact JSON
    * record a training-data drop ships (id, lang, source, text head,
    * token count), plus its byte size for shard planning. Field order
    * is fixed by the struct, and both engines render compact
    * (no-whitespace) JSON, so the strings hash-match. At scale this is
    * the projection feeding `.write.text` shards. */
  def exportJsonl(spark: SparkSession, dir: String): DataFrame = {
    val j = to_json(struct(col("doc_id").as("id"), col("lang"),
      col("source"), substring(col("text"), 1, 40).as("head"),
      size(toks).cast("long").as("n_tokens")))
    Tables.documents(spark, dir)
      .select(col("doc_id"), j.as("jsonl"),
        // octet_length: n_bytes must be UTF-8 bytes (shard planning),
        // not characters — length() undercounts non-ASCII text
        octet_length(j).cast("long").as("n_bytes"))
      .orderBy(col("doc_id"))
  }

  val exportJsonlSql: String =
    """WITH j AS (
      |  SELECT doc_id,
      |    CAST(to_json(struct_pack(
      |      id := doc_id, lang := lang, source := source,
      |      head := substr(text, 1, 40),
      |      n_tokens := CAST(LEN(LIST_FILTER(string_split(lower(text), ' '),
      |        t -> t <> '')) AS BIGINT))) AS VARCHAR) AS jsonl
      |  FROM documents)
      |SELECT doc_id, jsonl, CAST(octet_length(encode(jsonl)) AS BIGINT) AS n_bytes
      |FROM j
      |ORDER BY doc_id""".stripMargin

  private val SpanLen = 8

  /** Boilerplate-span detector — the repeated-content census behind
    * header/footer/template stripping: non-overlapping 8-token spans
    * per document, ranked by how many documents repeat them. Stride =
    * span length bounds the explode at n_tokens/8 rows per doc, and
    * the two-level (span, doc) → span aggregate keeps partial
    * aggregation (the [[ngramCounts]] lesson — no per-span
    * count-distinct Expand). Deterministic total order (docs desc,
    * occurrences desc, span) under the top-50 cut. */
  def boilerplate(spark: SparkSession, dir: String): DataFrame = {
    val spans = Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("t"))
      .where(size(col("t")) >= SpanLen)
      .select(col("doc_id"),
        explode(expr(s"sequence(0, CAST(size(t) / $SpanLen AS INT) - 1)"))
          .as("k"), col("t"))
      .select(col("doc_id"),
        array_join(slice(col("t"), col("k") * SpanLen + 1, lit(SpanLen)), " ")
          .as("span"))
    spans.groupBy(col("span"), col("doc_id")).agg(count(lit(1)).as("n_occ"))
      .groupBy(col("span"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_occ")).as("n_occur"))
      .orderBy(col("n_docs").desc, col("n_occur").desc, col("span"))
      .limit(50)
  }

  val boilerplateSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    LIST_FILTER(string_split(lower(text), ' '), x -> x <> '') AS t
       |  FROM documents),
       |s AS (
       |  SELECT doc_id,
       |    array_to_string(t[k*$SpanLen+1 : (k+1)*$SpanLen], ' ') AS span
       |  -- // (floor div): CAST(len/8 AS BIGINT) would ROUND half-up in
       |  -- DuckDB while Spark's CAST truncates, enumerating an extra
       |  -- partial tail span for token counts with remainder >= 4
       |  FROM t, unnest(range(0, len(t) // $SpanLen)) AS u(k)
       |  WHERE len(t) >= $SpanLen),
       |pd AS (SELECT span, doc_id, COUNT(*) AS n_occ FROM s GROUP BY 1, 2)
       |SELECT span, COUNT(*) AS n_docs, CAST(SUM(n_occ) AS BIGINT) AS n_occur
       |FROM pd GROUP BY span
       |ORDER BY n_docs DESC, n_occur DESC, span
       |LIMIT 50""".stripMargin

  /** One-row dataset card — the headline numbers a corpus release
    * publishes: volume (docs, tokens, chars), diversity (languages,
    * sources), integrity (exact-duplicate rate via text digest), and
    * quality-gate pass rate. Three independent single-purpose
    * aggregates crossJoined as 1-row frames (the [[graft.operators.
    * Maintenance.tableStats]] finding: separate pruned scans beat one
    * Expand), each map-side combined; rates are exact-int / exact-int
    * divisions. */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val vol = d.select(col("n_chars"), size(toks).cast("long").as("n_tokens"),
        col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"))
    val uniq = d.select(md5(col("text")).as("h"))
      .agg(countDistinct(col("h")).as("n_uniq_texts"))
    val pass = qualityStats(spark, dir)
      .select(qualityScoreCol.as("score"))
      .agg(count(when(col("score") >= 0.4, lit(1))).as("n_passed"))
    vol.crossJoin(uniq).crossJoin(pass)
      .select(col("n_docs"), col("n_tokens"), col("n_chars"),
        col("n_langs"), col("n_sources"), col("n_uniq_texts"),
        (lit(1.0) - col("n_uniq_texts").cast("double") /
          col("n_docs").cast("double")).as("dup_rate"),
        (col("n_passed").cast("double") / col("n_docs").cast("double"))
          .as("pass_rate"))
  }

  lazy val datasetCardSql: String =
    s"""WITH vol AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(CAST(LEN(LIST_FILTER(string_split(lower(text), ' '),
       |      t -> t <> '')) AS BIGINT)) AS BIGINT) AS n_tokens,
       |    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       |    COUNT(DISTINCT lang) AS n_langs,
       |    COUNT(DISTINCT source) AS n_sources
       |  FROM documents),
       |uniq AS (SELECT COUNT(DISTINCT md5(text)) AS n_uniq_texts FROM documents),
       |pass AS (
       |  SELECT CAST(COUNT(*) FILTER (WHERE score >= 0.4) AS BIGINT) AS n_passed
       |  FROM (SELECT $qualityFormulaSql AS score
       |        FROM ($qualityStatsSql)))
       |SELECT n_docs, n_tokens, n_chars, n_langs, n_sources, n_uniq_texts,
       |  1.0 - CAST(n_uniq_texts AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate,
       |  CAST(n_passed AS DOUBLE) / CAST(n_docs AS DOUBLE) AS pass_rate
       |FROM vol CROSS JOIN uniq CROSS JOIN pass""".stripMargin

  /** Per-source quality dashboard — the cleaning report read per
    * ingest source: doc count, pass rate through the
    * [[qualityScore]] gate, and mean composite score. The per-row
    * score is the identical IEEE expression in both engines
    * ([[qualityFormulaSql]] is the single source), so the cent-exact
    * [[Det.dsum]] mean cannot drift. One map-side-combined aggregate
    * keyed by source. */
  def qualityBySource(spark: SparkSession, dir: String): DataFrame =
    qualityStats(spark, dir)
      .withColumn("score", qualityScoreCol)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("score") >= 0.4, lit(1))).as("n_passed"),
        (count(when(col("score") >= 0.4, lit(1))).cast("double") /
          count(lit(1)).cast("double")).as("pass_rate"),
        (Det.dsum(col("score")) / count(lit(1))).as("mean_score"))
      .orderBy(col("source"))

  lazy val qualityBySourceSql: String =
    s"""WITH st AS (
       |  SELECT source,
       |    CAST(LEN(toks) AS BIGINT) AS n_tokens,
       |    CAST(LENGTH(REPLACE(text, ' ', '')) AS BIGINT) AS n_letters,
       |    CAST(LEN(LIST_FILTER(toks, t -> t = 'the' OR t = 'a')) AS BIGINT)
       |      AS n_stop
       |  FROM (SELECT source, text,
       |          LIST_FILTER(string_split(lower(text), ' '), t -> t <> '')
       |            AS toks
       |        FROM documents)),
       |sc AS (
       |  SELECT source,
       |    $qualityFormulaSql AS score
       |  FROM st)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(COUNT(*) FILTER (WHERE score >= 0.4) AS BIGINT) AS n_passed,
       |  CAST(COUNT(*) FILTER (WHERE score >= 0.4) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS pass_rate,
       |  ${DetSql.dsum("score")} / COUNT(*) AS mean_score
       |FROM sc
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** Per-document top-3 tf-idf keywords — the "what is this document
    * about" data product behind corpus browsing, topic drift reports,
    * and keyword-based filters; [[bm25]] is query-side scoring, this
    * is its document-side dual. idf is fixed-point quantized
    * (floor(ln·10⁶+0.5), the [[lmScore]] discipline) so the per-doc
    * ranking compares exact BIGINTs — no float tie can split engines —
    * with the term string as final tiebreak. Shape at 100 TB: one
    * token shuffle for tf, a vocab-sized idf frame broadcast back, a
    * per-doc-bounded window (≤ |doc vocab| rows per key). */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(toks).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val corpus = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val idf = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(corpus))
      .select(col("term"), col("df"),
        floor(log(col("n_docs").cast("double") / col("df").cast("double"))
          * 1000000 + 0.5).cast("long").as("idf_q"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy((col("tf") * col("idf_q")).desc, col("term"))
    tf.join(broadcast(idf), "term")
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"),
        ((col("tf") * col("idf_q")).cast("double") / 1000000.0).as("tfidf"))
      .orderBy(col("doc_id"), col("rank"))
  }

  val tfidfSql: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |corpus AS (SELECT COUNT(*) AS n_docs FROM documents),
      |idf AS (
      |  SELECT term, COUNT(*) AS df,
      |    CAST(FLOOR(LN(CAST((SELECT n_docs FROM corpus) AS DOUBLE)
      |      / CAST(COUNT(*) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS idf_q
      |  FROM tf GROUP BY term),
      |r AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, tf.tf * idf.idf_q AS score_q,
      |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
      |      ORDER BY tf.tf * idf.idf_q DESC, tf.term) AS rank
      |  FROM tf JOIN idf USING (term))
      |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf,
      |  CAST(score_q AS DOUBLE) / 1000000.0 AS tfidf
      |FROM r WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  /** Vocabulary size for [[vocabCoverage]]: the induced top-K token
    * list every fixed-vocab tokenizer starts from. */
  private[graft] val VocabK = 512

  /** Out-of-vocabulary rate per document against an induced top-
    * [[VocabK]] vocabulary — the coverage report that decides whether
    * a tokenizer's vocab fits a corpus (high OOV → wasted UNK tokens).
    * Vocab = top-K tokens by (count DESC, token ASC) — a map-side-
    * combined token-keyed aggregate + TakeOrdered(K), broadcast back;
    * coverage is one doc-keyed aggregate over the token stream with
    * the broadcast vocab as a left join. At 100 TB the vocab induction
    * and the coverage pass are each ONE corpus shuffle (token-keyed /
    * doc-keyed), nothing driver-side. Documents tokenizing to zero
    * tokens drop from BOTH engines identically (explode/unnest emits
    * no rows). oov_rate = exact BIGINT / BIGINT, one IEEE division. */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as("term"))
    val vocab = tok.groupBy(col("term")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term")).limit(VocabK)
      .select(col("term"), lit(1).as("in_v"))
    tok.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
      .orderBy(col("doc_id"))
  }

  val vocabCoverageSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
       |  FROM documents),
       |vocab AS (
       |  SELECT term, 1 AS in_v FROM (
       |    SELECT term, COUNT(*) AS c FROM tok GROUP BY 1
       |    ORDER BY c DESC, term LIMIT $VocabK)),
       |cov AS (
       |  SELECT t.doc_id, COUNT(*) AS n_tokens,
       |    CAST(SUM(CASE WHEN v.in_v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_oov
       |  FROM tok t LEFT JOIN vocab v ON v.term = t.term
       |  GROUP BY 1)
       |SELECT doc_id, n_tokens, n_oov,
       |  CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate
       |FROM cov
       |ORDER BY doc_id""".stripMargin

  /** Merge rounds for [[bpeTrain]]. */
  private[graft] val BpeRounds = 4

  /** BPE merge induction — the first [[BpeRounds]] merges of byte-pair
    * encoding over the corpus's word-frequency table, the tokenizer-
    * training kernel scaled out: words (alpha runs, lowercased) are
    * spaced symbol strings `" l o w "`; each round counts adjacent
    * symbol pairs weighted by word frequency (overlapping instances
    * count, the standard BPE statistic), picks the (count DESC, pair
    * ASC) argmax, and merges it everywhere via literal string replace.
    * Replace is non-overlapping left-to-right WITH the delimiter
    * consumed — `" a a a "` merges one pair, not two — and Spark's
    * UTF8String.replace, DuckDB's replace, and java.lang.String
    * .replace all agree on that contract (LlmSpec pins it against a
    * driver-side reference). At 100 TB only the word-frequency
    * aggregate touches the corpus; every round then runs on the
    * vocabulary table (sublinear in corpus size) — pair census is a
    * map-side-combined aggregate, the argmax broadcasts 1 row back.
    * Each round's word table is cached (vocab-sized) or the 4-round
    * lineage would re-derive every prefix; caller drains per
    * discipline. */
  /** The shared merge fold: word-frequency table → ([[BpeRounds]]
    * 1-row argmax frames], final word table (w, freq, sp) after all
    * merges). [[bpeTrain]] reads the merges, [[bpeApply]] the final
    * words. */
  /** Merge fold shared by [[bpeTrain]] and [[bpeApply]]: the word
    * table after [[BpeRounds]] merges, plus the per-round winning
    * pair (round, pr, cnt).
    *
    * r16 (§5 driver ceiling / VERDICT r15 #9): each round's argmax is
    * ONE row bounded by the compile-time round count — the
    * feat_pca-accepted driver-iteration class. The old fold kept it
    * distributed: per round a cached 1-row frame, a broadcast
    * exchange, and a crossJoin subplan, so the final action
    * materialized 2·R cache frames and R broadcasts. Collecting the
    * winner and folding it back as LITERALS makes each round one
    * census job over the cached vocab table and `next` a pure
    * projection chain — no per-round caches, joins, or broadcasts.
    * Same algebra, same tiebreak, oracle unchanged. Eager
    * construction (the R collects run when the frame is built) is the
    * documented contract this registry already carries for feat_pca. */
  private def bpeFold(spark: SparkSession, dir: String)
  : (List[(Int, String, Long)], DataFrame) = {
    val w0 = Tables.documents(spark, dir)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
        .as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"), concat(lit(" "),
        array_join(
          expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
          " "),
        lit(" ")).as("sp"))
      .cache()
    (1 to BpeRounds)
      .foldLeft((List.empty[(Int, String, Long)], w0)) {
        case ((acc, words), r) =>
          // i+1 lookup guarded by CASE (ANSI element_at throws OOB) and
          // null pairs filtered — single-symbol words yield no pairs.
          val best = words
            .select(col("freq"),
              expr("filter(split(sp, ' '), s -> s <> '')").as("syms"))
            .select(col("freq"), explode(expr(
              """filter(transform(sequence(1, size(syms)),
                |  i -> CASE WHEN i < size(syms)
                |       THEN concat(element_at(syms, i), ' ',
                |                   element_at(syms, i + 1)) END),
                |  x -> x IS NOT NULL)""".stripMargin)).as("pr"))
            .groupBy(col("pr")).agg(sum(col("freq")).as("cnt"))
            .orderBy(col("cnt").desc, col("pr")).limit(1)
            .collect()
          if (best.isEmpty) (acc, words.limit(0)) // pairless corpus: the
          // old crossJoin-with-empty semantics (no merge row, empty tail)
          else {
            val pr = best(0).getString(0)
            val next = words.select(col("w"), col("freq"),
              replace(col("sp"), lit(s" $pr "),
                lit(" " + pr.replace(" ", "") + " ")).as("sp"))
            (acc :+ ((r, pr, best(0).getLong(1))), next)
          }
      }
  }

  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    val merges = bpeFold(spark, dir)._1
    import spark.implicits._
    merges.map { case (r, pr, cnt) =>
      val cut = pr.indexOf(' ')
      (r, pr.substring(0, cut), pr.substring(cut + 1),
        pr.replace(" ", ""), cnt)
    }.toDF("round", "lhs", "rhs", "merged", "cnt")
      .orderBy(col("round"))
  }

  /** Tokenize the corpus under the [[bpeTrain]] merges — the
    * compression report that tells you what the learned merges buy:
    * per document, word count, symbol count before any merge (= alpha
    * chars) and after the [[BpeRounds]] merges, and the compression
    * ratio. The merged word table (vocab-sized) joins the exploded
    * word stream on the word itself — ONE token-keyed shuffle plus the
    * doc-keyed rollup; the merge fold never touches the corpus again.
    * Documents with no alpha words drop from both engines identically.
    * ratio = exact BIGINT / BIGINT, one IEEE division. */
  def bpeApply(spark: SparkSession, dir: String): DataFrame = {
    // The merged word table is STAGED once per source content
    // (Fixtures.staged — the pqcodes/ivfcent pattern): training is a
    // one-time cost, apply re-reads a vocab-sized parquet. The oracle
    // re-derives the identical table from the same corpus.
    val path = graft.core.Fixtures.staged(dir, "bpewords",
      codeTag = s"r$BpeRounds") { target =>
      bpeFold(spark, dir)._2
        .select(col("w"),
          length(col("w")).cast("long").as("n_sym0"),
          size(expr("filter(split(sp, ' '), s -> s <> '')")).cast("long")
            .as("n_sym4"))
        .write.mode("overwrite").parquet(target)
    }
    val words = spark.read.parquet(path)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
          .as("w"))
      .join(words, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sym0")).as("n_sym0"),
        sum(col("n_sym4")).as("n_sym4"))
      .select(col("doc_id"), col("n_words"), col("n_sym0"), col("n_sym4"),
        (col("n_sym4").cast("double") / col("n_sym0")).as("ratio"))
      .orderBy(col("doc_id"))
  }

  /** One BPE round as CTE text: words `w$i` → pair census → argmax
    * `b$r` → merged words `w$r` (the Lloyd-round-unroll pattern,
    * [[graft.llm.Similarity]]). */
  private def bpeRoundSql(r: Int): String = {
    val i = r - 1
    s"""p$r AS (
       |  SELECT pr, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
       |    SELECT freq,
       |      unnest(list_transform(range(1, len(syms)),
       |        i -> syms[i] || ' ' || syms[i + 1])) AS pr
       |    FROM (SELECT freq,
       |            list_filter(string_split(sp, ' '), s -> s <> '') AS syms
       |          FROM w$i))
       |  GROUP BY 1),
       |b$r AS (SELECT pr, cnt FROM p$r ORDER BY cnt DESC, pr LIMIT 1),
       |w$r AS (
       |  SELECT w, freq, replace(sp, ' ' || b.pr || ' ',
       |    ' ' || replace(b.pr, ' ', '') || ' ') AS sp
       |  FROM w$i CROSS JOIN b$r b)""".stripMargin
  }

  /** CTE prefix shared by the two BPE oracles: word-frequency table →
    * spaced symbols → [[BpeRounds]] unrolled rounds. */
  private val bpeCtesSql: String = {
    val rounds = (1 to BpeRounds).map(bpeRoundSql).mkString(",\n")
    s"""wf AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |    FROM documents)
       |  GROUP BY 1),
       |w0 AS (
       |  SELECT w, freq, ' ' || array_to_string(
       |    list_transform(range(1, length(w) + 1), i -> substr(w, i, 1)),
       |    ' ') || ' ' AS sp
       |  FROM wf),
       |$rounds""".stripMargin
  }

  val bpeTrainSql: String = {
    val out = (1 to BpeRounds).map { r =>
      s"""SELECT CAST($r AS INTEGER) AS round,
         |  string_split(pr, ' ')[1] AS lhs, string_split(pr, ' ')[2] AS rhs,
         |  replace(pr, ' ', '') AS merged, cnt FROM b$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $bpeCtesSql
       |$out
       |ORDER BY round""".stripMargin
  }

  val bpeApplySql: String =
    s"""WITH $bpeCtesSql,
       |wsym AS (
       |  SELECT w, CAST(length(w) AS BIGINT) AS n_sym0,
       |    CAST(len(list_filter(string_split(sp, ' '), s -> s <> ''))
       |      AS BIGINT) AS n_sym4
       |  FROM w$BpeRounds),
       |dw AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |  FROM documents)
       |SELECT d.doc_id, COUNT(*) AS n_words,
       |  CAST(SUM(s.n_sym0) AS BIGINT) AS n_sym0,
       |  CAST(SUM(s.n_sym4) AS BIGINT) AS n_sym4,
       |  CAST(SUM(s.n_sym4) AS DOUBLE) / SUM(s.n_sym0) AS ratio
       |FROM dw d JOIN wsym s USING (w)
       |GROUP BY 1
       |ORDER BY doc_id""".stripMargin

  /** Deterministic uniform sample — the eval-set / holdout sampler.
    * `TABLESAMPLE`/`rand()` draws differ per run, per engine, and per
    * task retry; ranking on an md5 of the doc id is none of those: the
    * hash order is a fixed uniform permutation of the corpus, so "the
    * 100 lowest-hashed docs" is a stable uniform sample any engine
    * reproduces, and APPENDING documents later leaves earlier picks'
    * hashes unchanged (the property rand() samples lack). TakeOrdered
    * top-k — no global sort; the [[trainTestSplit]] idiom at k-rows
    * granularity instead of percent bands. */
  def sampleHashrank(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(concat(lit("sample:"), col("doc_id").cast("string"))).as("h"))
      .orderBy(col("h"), col("doc_id")).limit(100)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("h"))
      .orderBy(col("doc_id"))

  val sampleHashrankSql: String =
    """SELECT doc_id, lang, source, n_chars, h FROM (
      |  SELECT doc_id, lang, source, n_chars,
      |    md5('sample:' || CAST(doc_id AS STRING)) AS h
      |  FROM documents
      |  ORDER BY h, doc_id LIMIT 100)
      |ORDER BY doc_id""".stripMargin

  private val SegLen = 10

  /** Sub-document (segment-level) dedup report — the C4/RefinedWeb
    * "remove globally duplicated spans" step, the capability doc-level
    * set similarity cannot express: a boilerplate paragraph pasted
    * into thousands of otherwise-unique docs never trips Jaccard but
    * is exactly what this catches. Docs split into consecutive
    * [[SegLen]]-token segments; a segment is a global dup when its
    * exact text occurs in ≥2 distinct docs. Per doc: segment count,
    * dup-segment count (occurrence-weighted), dup ratio, and the
    * keep verdict (≤50% duplicated mass). Scale shape: one explode +
    * two-level (doc,seg)→seg aggregation — the [[boilerplate]]
    * skeleton, no count-distinct Expand, segment keyspace bounded by
    * corpus token count / [[SegLen]]; the join back to docs is
    * seg-keyed and carries only counts, never text bodies. */
  /** Unordered core of [[spanDedup]] — also the first stage of the
    * composed [[Pipeline.sftPipeline]]. */
  private[llm] def spanDedupCore(spark: SparkSession, dir: String): DataFrame = {
    val segs = Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, greatest((size(t) + ${SegLen - 1}) DIV $SegLen, 1) - 1),
           |  i -> array_join(slice(t, i * $SegLen + 1, $SegLen), ' '))""".stripMargin))
        .as("seg"))
    val docseg = segs.groupBy(col("doc_id"), col("seg"))
      .agg(count(lit(1)).as("n_occ"))
    val global = docseg.groupBy(col("seg"))
      .agg(count(lit(1)).as("n_docs"))
    docseg.join(global, "seg")
      .groupBy(col("doc_id"))
      .agg(sum(col("n_occ")).as("n_segs"),
        sum(when(col("n_docs") >= 2, col("n_occ")).otherwise(lit(0L)))
          .as("n_dup_segs"))
      .select(col("doc_id"), col("n_segs"), col("n_dup_segs"),
        (col("n_dup_segs") / col("n_segs")).as("dup_ratio"),
        (col("n_dup_segs") * 2 <= col("n_segs")).as("keep"))
  }

  def spanDedup(spark: SparkSession, dir: String): DataFrame =
    spanDedupCore(spark, dir).orderBy(col("doc_id"))

  /** CTE-embeddable twin of [[spanDedupCore]] (nested WITH — DuckDB
    * allows it inside a CTE's parentheses). */
  private[llm] val spanDedupCoreSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    LIST_FILTER(string_split(lower(text), ' '), x -> x <> '') AS t
       |  FROM documents),
       |seg AS (
       |  SELECT doc_id,
       |    unnest([array_to_string(t[i*$SegLen+1 : i*$SegLen+$SegLen], ' ')
       |            for i in range(0, greatest((len(t)+${SegLen - 1})//$SegLen, 1))]) AS seg
       |  FROM t),
       |docseg AS (SELECT doc_id, seg, count(*) AS n_occ FROM seg GROUP BY 1, 2),
       |global AS (SELECT seg, count(*) AS n_docs FROM docseg GROUP BY 1)
       |SELECT d.doc_id,
       |  CAST(SUM(d.n_occ) AS BIGINT) AS n_segs,
       |  CAST(SUM(CASE WHEN g.n_docs >= 2 THEN d.n_occ ELSE 0 END) AS BIGINT) AS n_dup_segs,
       |  CAST(SUM(CASE WHEN g.n_docs >= 2 THEN d.n_occ ELSE 0 END) AS BIGINT)
       |    / CAST(SUM(d.n_occ) AS BIGINT) AS dup_ratio,
       |  CAST(SUM(CASE WHEN g.n_docs >= 2 THEN d.n_occ ELSE 0 END) AS BIGINT) * 2
       |    <= CAST(SUM(d.n_occ) AS BIGINT) AS keep
       |FROM docseg d JOIN global g USING (seg)
       |GROUP BY d.doc_id""".stripMargin

  val spanDedupSql: String =
    s"""$spanDedupCoreSql
       |ORDER BY doc_id""".stripMargin

  /** Preference-pair construction — the DPO/RLHF data prep: within
    * each near-dup cluster (the [[Dedup.clusterLabels]] components —
    * variants of the same underlying content), emit (chosen, rejected)
    * = (highest, lowest) quality-scored member, with the score margin.
    * The "rank variants of one prompt by a reward signal" shape, built
    * from two stages the registry already runs: the staged cluster
    * fixpoint (computed once per source content) and the quality
    * composite ([[qualityScoreCol]] — bit-exact doubles, so min/max
    * members and the margin are engine-identical). Ties: chosen is the
    * min doc_id among max scores, rejected the max doc_id among min
    * scores; zero-margin clusters (identical quality throughout — e.g.
    * exact copies) are dropped as uninformative. Scale: the member
    * frame is only clustered docs; two row_numbers over the same
    * cluster partition (two orders → one shuffle, two sorts). */
  def preferencePairs(spark: SparkSession, dir: String): DataFrame = {
    val q = qualityStats(spark, dir).withColumn("score", qualityScoreCol)
      .select(col("doc_id"), col("score"))
    val m = Dedup.clusterLabels(spark, dir).join(q, "doc_id")
    val wBest = Window.partitionBy(col("cluster_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val wWorst = Window.partitionBy(col("cluster_id"))
      .orderBy(col("score").asc, col("doc_id").desc)
    val r = m.withColumn("rb", row_number().over(wBest))
      .withColumn("rw", row_number().over(wWorst))
    val best = r.where(col("rb") === 1)
      .select(col("cluster_id"), col("doc_id").as("chosen_id"),
        col("score").as("chosen_score"))
    val worst = r.where(col("rw") === 1)
      .select(col("cluster_id").as("cid2"), col("doc_id").as("rejected_id"),
        col("score").as("rejected_score"))
    best.join(worst, col("cluster_id") === col("cid2"))
      .select(col("cluster_id"), col("chosen_id"), col("rejected_id"),
        col("chosen_score"), col("rejected_score"),
        (col("chosen_score") - col("rejected_score")).as("margin"))
      .where(col("margin") > 0.0)
      .orderBy(col("cluster_id"))
  }

  lazy val preferencePairsSql: String =
    s"""${Dedup.clusterFixpointCteSql},
       |${Dedup.compCteSql},
       |q AS (
       |  SELECT doc_id, $qualityFormulaSql AS score
       |  FROM ($qualityStatsSql)),
       |m AS (
       |  SELECT c.doc_id, c.cluster_id, q.score
       |  FROM comp c JOIN q USING (doc_id)),
       |r AS (
       |  SELECT doc_id, cluster_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY cluster_id
       |      ORDER BY score DESC, doc_id ASC) AS rb,
       |    ROW_NUMBER() OVER (PARTITION BY cluster_id
       |      ORDER BY score ASC, doc_id DESC) AS rw
       |  FROM m)
       |SELECT b.cluster_id, b.doc_id AS chosen_id, w.doc_id AS rejected_id,
       |  b.score AS chosen_score, w.score AS rejected_score,
       |  b.score - w.score AS margin
       |FROM r b JOIN r w ON b.cluster_id = w.cluster_id
       |  AND b.rb = 1 AND w.rw = 1
       |WHERE b.score - w.score > 0.0
       |ORDER BY b.cluster_id""".stripMargin

  /** Tokenizer fertility diagnostics per language — the
    * chars-per-token / pieces-per-word report read before committing
    * to a tokenizer (fertility imbalances across languages skew
    * effective compute per language): whitespace tokens, regex
    * word-pieces, and the chars/4 BPE estimate rolled up per lang,
    * with the ratio columns as single exact-int IEEE divisions. One
    * tiny keyed aggregate over per-row projections. */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        size(toks).cast("long").as("ws"),
        size(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .cast("long").as("re"),
        col("n_chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("n_ws"),
        sum(col("re")).as("n_re"),
        sum(col("n_chars")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_ws"), col("n_re"),
        col("n_chars"),
        (col("n_re") / col("n_ws")).as("pieces_per_word"),
        (col("n_chars") / col("n_ws")).as("chars_per_word"))
      .orderBy(col("lang"))

  val tokenizerFertilitySql: String =
    """SELECT lang,
      |  count(*) AS n_docs,
      |  CAST(SUM(LEN(LIST_FILTER(string_split(lower(text), ' '), t -> t <> ''))) AS BIGINT) AS n_ws,
      |  CAST(SUM(LEN(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT) AS n_re,
      |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
      |  CAST(SUM(LEN(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT)
      |    / CAST(SUM(LEN(LIST_FILTER(string_split(lower(text), ' '), t -> t <> ''))) AS BIGINT) AS pieces_per_word,
      |  CAST(SUM(n_chars) AS BIGINT)
      |    / CAST(SUM(LEN(LIST_FILTER(string_split(lower(text), ' '), t -> t <> ''))) AS BIGINT) AS chars_per_word
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Instruction-pair rendering — the SFT data-prep formatter: each
    * document becomes a (prompt, completion) example under a fixed
    * chat template; the prompt carries the first 32 tokens as context,
    * the completion the next 16, and only COMPLETE pairs survive
    * (docs shorter than 48 tokens would yield truncated completions —
    * the "drop partial examples" rule SFT sets apply). `n_tok` is the
    * example's whitespace-token mass (48 body + 12 template), the
    * number [[pack]] bins against downstream. Pure projection —
    * string assembly and integer arithmetic only, zero shuffles; at
    * 100 TB this is the embarrassingly-parallel render stage before
    * packing. */
  /** Unordered core of [[sftFormat]] — also the render stage of the
    * composed [[Pipeline.sftPipeline]]. */
  private[llm] def sftFormatCore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), toks.as("t"))
      .where(expr("size(t) >= 48"))
      .select(col("doc_id"), col("lang"),
        concat(lit("### Instruction:\ncontinue the passage ["),
          col("lang"), lit("]\n### Context:\n"),
          expr("array_join(slice(t, 1, 32), ' ')"),
          lit("\n### Response:")).as("prompt"),
        expr("array_join(slice(t, 33, 16), ' ')").as("completion"),
        lit(60L).as("n_tok"))

  def sftFormat(spark: SparkSession, dir: String): DataFrame =
    sftFormatCore(spark, dir).orderBy(col("doc_id"))

  private[llm] val sftFormatCoreSql: String =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    LIST_FILTER(string_split(lower(text), ' '), x -> x <> '') AS t
      |  FROM documents)
      |SELECT doc_id, lang,
      |  '### Instruction:' || chr(10) || 'continue the passage [' || lang ||
      |    ']' || chr(10) || '### Context:' || chr(10) ||
      |    array_to_string(t[1:32], ' ') || chr(10) || '### Response:' AS prompt,
      |  array_to_string(t[33:48], ' ') AS completion,
      |  CAST(60 AS BIGINT) AS n_tok
      |FROM t
      |WHERE len(t) >= 48""".stripMargin

  val sftFormatSql: String =
    s"""$sftFormatCoreSql
       |ORDER BY doc_id""".stripMargin

  /** Curriculum schedule manifest — difficulty-staged, hash-sharded:
    * docs stage by length quartile (difficulty proxy: 0 shortest → 3
    * longest, fixed 256-char bands so stages are data-independent and
    * append-stable), shard WITHIN a stage by the md5-bucket idiom (the
    * retry/engine-stable stand-in for rand()), and the manifest
    * reports per (stage, shard): example count, token mass, and char
    * bounds — what a trainer consumes to schedule easy→hard phases
    * with balanced shards. One groupBy shuffle over 32 tiny groups; no
    * global sort, no driver loop — the ordering is IMPLIED by stage
    * numbers, never materialized as a single-partition row_number. */
  def curriculum(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("h", expr("md5('curriculum:' || CAST(doc_id AS STRING))"))
      .select(col("doc_id"), col("n_chars"), size(toks).cast("long").as("n_tok"),
        least(expr("n_chars DIV 256"), lit(3L)).as("stage"),
        (expr(splitBucketExpr) % 8).as("shard"))
      .groupBy(col("stage"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tok"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("stage"), col("shard"))

  val curriculumSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, n_chars, text,
       |    md5('curriculum:' || CAST(doc_id AS STRING)) AS h
       |  FROM documents)
       |SELECT LEAST(n_chars // 256, 3) AS stage,
       |  ($splitBucketExpr) % 8 AS shard,
       |  count(*) AS n_docs,
       |  CAST(SUM(LEN(LIST_FILTER(string_split(lower(text), ' '), x -> x <> ''))) AS BIGINT) AS sum_tok,
       |  MIN(n_chars) AS min_chars,
       |  MAX(n_chars) AS max_chars
       |FROM h
       |GROUP BY 1, 2
       |ORDER BY stage, shard""".stripMargin

  /** T5-style span corruption — the masked-denoising data prep: tokens
    * group into 3-token spans, ~15% of spans are selected by an
    * engine-portable hash (md5 16-bit bucket < 9830/65536, the
    * [[trainTestSplit]] idiom — deterministic across runs, engines, and
    * task retries where rand() is not), and each selected span is
    * replaced by a numbered `<extra_id_K>` sentinel (K = the span's
    * index among the doc's masked spans, via one running window sum).
    * Shape: token explode + per-doc window + ordered re-aggregation —
    * the same one-shuffle skeleton as every per-token op here; the
    * sentinel numbering never leaves the doc partition. */
  def spanCorrupt(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "tok")))
      .withColumn("span", expr("pos DIV 3"))
      .withColumn("h",
        expr("md5('corrupt:' || CAST(doc_id AS STRING) || ':' || " +
          "CAST(span AS STRING))"))
      .withColumn("masked", expr(splitBucketExpr) < 9830)
      .withColumn("is_first", expr("pos % 3 = 0"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = tok
      .withColumn("k_incl",
        sum(when(col("masked") && col("is_first"), 1L).otherwise(0L)).over(w))
      .withColumn("out_tok",
        when(!col("masked"), col("tok"))
          .when(col("is_first"),
            concat(lit("<extra_id_"), (col("k_incl") - 1).cast("string"),
              lit(">"))))
    marked.groupBy(col("doc_id"))
      .agg(
        sum(when(col("masked") && col("is_first"), 1L).otherwise(0L))
          .as("n_spans_masked"),
        sum(when(col("out_tok").isNotNull, 1L).otherwise(0L))
          .as("n_tokens_out"),
        array_join(transform(array_sort(collect_list(
            when(col("out_tok").isNotNull, struct(col("pos"), col("out_tok"))))),
          x => x.getField("out_tok")), " ").as("masked_text"))
      .orderBy(col("doc_id"))
  }

  val spanCorruptSql: String =
    s"""WITH tl AS (
       |  SELECT doc_id,
       |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
       |  FROM documents),
       |u AS (
       |  -- parallel unnests zip in lockstep: range(len) = 0-based pos
       |  SELECT doc_id, unnest(range(0, len(t))) AS pos0, unnest(t) AS tok
       |  FROM tl),
       |tok AS (SELECT doc_id, CAST(pos0 AS INT) AS pos, tok FROM u),
       |sp AS (
       |  SELECT doc_id, pos, tok, pos // 3 AS span,
       |    md5('corrupt:' || CAST(doc_id AS STRING) || ':'
       |      || CAST(pos // 3 AS STRING)) AS h,
       |    pos % 3 = 0 AS is_first
       |  FROM tok),
       |mk AS (
       |  SELECT doc_id, pos, tok, is_first,
       |    ($splitBucketExpr) < 9830 AS masked
       |  FROM sp),
       |run AS (
       |  SELECT *, SUM(CASE WHEN masked AND is_first THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS k_incl
       |  FROM mk),
       |outv AS (
       |  SELECT doc_id, pos, masked, is_first,
       |    CASE WHEN NOT masked THEN tok
       |         WHEN is_first THEN '<extra_id_' || CAST(k_incl - 1 AS STRING)
       |           || '>' END AS out_tok
       |  FROM run)
       |SELECT doc_id,
       |  CAST(SUM(CASE WHEN masked AND is_first THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_spans_masked,
       |  CAST(SUM(CASE WHEN out_tok IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_tokens_out,
       |  COALESCE(STRING_AGG(out_tok, ' ' ORDER BY pos)
       |    FILTER (WHERE out_tok IS NOT NULL), '') AS masked_text
       |FROM outv
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** Blocklist scrub — the wordlist-based quality filter every
    * pretraining pipeline runs (profanity/boilerplate lists). The list
    * here is corpus-derived for determinism: the 5 highest-df tokens
    * (ties toward the smaller token) stand in for an external wordlist.
    * Scale shape: the token explode is the same shuffle every other
    * per-token op pays; the 5-row blocklist BROADCASTS onto it (hits =
    * one broadcast hash join + doc-keyed count), and the per-doc ratio
    * is one guarded IEEE division. A doc is kept while blocked tokens
    * stay under half its token count. */
  def blocklistFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tok = docs.select(col("doc_id"), explode(toks).as("term"))
    val bl = tok.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(5)
      .select(col("term"))
    val hits = tok.join(broadcast(bl), Seq("term"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_blocked"))
    docs.select(col("doc_id"), size(toks).cast("long").as("n_tokens"))
      .join(hits, Seq("doc_id"), "left_outer")
      .withColumn("n_blocked", coalesce(col("n_blocked"), lit(0L)))
      .withColumn("blocked_ratio",
        when(col("n_tokens") > 0,
          col("n_blocked").cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)))
      .withColumn("keep_doc", col("blocked_ratio") < 0.5)
      .orderBy(col("doc_id"))
  }

  val blocklistFilterSql: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split(lower(text), ' '), t -> t <> ''))
      |      AS term
      |  FROM documents),
      |bl AS (
      |  SELECT term FROM (
      |    SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term
      |    ORDER BY cnt DESC, term LIMIT 5)),
      |hits AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_blocked
      |  FROM tok WHERE term IN (SELECT term FROM bl)
      |  GROUP BY doc_id),
      |base AS (
      |  SELECT doc_id,
      |    CAST(LEN(LIST_FILTER(string_split(lower(text), ' '), t -> t <> ''))
      |      AS BIGINT) AS n_tokens
      |  FROM documents)
      |SELECT b.doc_id, b.n_tokens,
      |  COALESCE(h.n_blocked, 0) AS n_blocked,
      |  CASE WHEN b.n_tokens > 0
      |    THEN CAST(COALESCE(h.n_blocked, 0) AS DOUBLE) / b.n_tokens
      |    ELSE 0.0 END AS blocked_ratio,
      |  CASE WHEN b.n_tokens > 0
      |    THEN CAST(COALESCE(h.n_blocked, 0) AS DOUBLE) / b.n_tokens
      |    ELSE 0.0 END < 0.5 AS keep_doc
      |FROM base b LEFT OUTER JOIN hits h USING (doc_id)
      |ORDER BY b.doc_id""".stripMargin

  /** Coverage thresholds (percent of token mass) reported by
    * [[unigramCoverage]]. */
  private val CoveragePcts = Seq(50, 90, 99)

  /** Unigram coverage curve — the tokenizer-budget planning report:
    * for each target share of corpus token mass (50/90/99%), the
    * smallest vocabulary (most-frequent-first, ties by term) that
    * reaches it, with the exact token mass covered. This is the
    * question "how big must the vocab be" answered from data, and the
    * cheap empirical stand-in for a Zipf fit (the curve IS the
    * distribution's shape). All arithmetic is BIGINT (`100·cum ≥
    * pct·total` avoids any ratio), so both engines agree bit-exactly.
    *
    * Scale shape: one map-side-combined token shuffle to the term
    * census, then ONE sort over the VOCAB (≪ corpus — bounded by
    * distinct terms, not tokens) shared by the rank and both running
    * sums; the 3 thresholds ride an explode of each vocab row, and the
    * final agg is 3 groups. The vocab-wide window is single-partition
    * by construction — the standard "sort the term table" step; a
    * billion-term vocab would range-partition the sort and prefix-sum
    * per range ([[pack]]'s two-level pattern). */
  def unigramCoverage(spark: SparkSession, dir: String): DataFrame = {
    val freq = Tables.documents(spark, dir)
      .select(explode(
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
    val byMass = Window.orderBy(col("freq").desc, col("term"))
    val ranked = freq.select(
      row_number().over(byMass).cast("long").as("rank"),
      sum(col("freq")).over(
        byMass.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("cum"),
      sum(col("freq")).over(byMass.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)).as("total"))
    ranked
      .select(col("rank"), col("cum"), col("total"),
        explode(lit(CoveragePcts.toArray)).as("pct"))
      .where(col("cum") * 100 >= col("pct") * col("total"))
      .groupBy(col("pct"))
      .agg(min(col("rank")).as("vocab_size"),
        expr("min_by(cum, rank)").as("covered_tokens"),
        min(col("total")).as("total_tokens"))
      .orderBy(col("pct"))
  }

  val unigramCoverageSql: String =
    s"""WITH freq AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
       |      AS term
       |    FROM documents)
       |  GROUP BY term),
       |ranked AS (
       |  SELECT
       |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS rank,
       |    CAST(SUM(freq) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(SUM(freq) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND UNBOUNDED FOLLOWING) AS BIGINT) AS total
       |  FROM freq
       |  WINDOW w AS (ORDER BY freq DESC, term))
       |SELECT pct, MIN(rank) AS vocab_size,
       |  MIN_BY(cum, rank) AS covered_tokens,
       |  MIN(total) AS total_tokens
       |FROM ranked, unnest([${CoveragePcts.mkString(", ")}]) AS t(pct)
       |WHERE cum * 100 >= pct * total
       |GROUP BY pct
       |ORDER BY pct""".stripMargin

  /** Word-trigram array over the split token column `t` — the
    * [[bigramArrayExpr]] idiom one order higher (NULL-completing
    * concat, so short docs yield an empty list in both engines). */
  private val trigramArrayExpr: String =
    """filter(transform(sequence(0, greatest(size(t)-3, 0)),
      |  i -> concat(try_element_at(t, i+1), ' ', try_element_at(t, i+2),
      |              ' ', try_element_at(t, i+3))),
      |  x -> x IS NOT NULL)""".stripMargin

  /** DuckDB twin of [[trigramArrayExpr]]. */
  private val trigramArraySql: String =
    """list_filter([t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
      |                 for i in range(0, greatest(len(t)-2, 1))],
      |                x -> x IS NOT NULL)""".stripMargin

  /** Per-source n-gram novelty — the memorization/redundancy lens on
    * a corpus: for each source, what fraction of its documents'
    * DISTINCT word trigrams occur there FIRST (global first occurrence
    * = lowest doc_id)? A source full of re-crawled boilerplate scores
    * low; one contributing genuinely new text scores high — the
    * signal a data-mixing plan reads next to [[qualityBySource]].
    * Novelty is exact integer ppm over exact BIGINT counts.
    *
    * Scale shape: per-doc DISTINCT trigram explode (array_distinct
    * before the explode — dedup inside the row, free), ONE gram-keyed
    * min aggregate for first occurrence, one gram-keyed join back
    * (both sides identically partitioned), one ≤|sources| aggregate.
    * Cost tracks distinct (doc, gram) pairs — the inverted-index
    * build — never gram × gram. */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    // r15 (§2.3 shuffle fewer bytes / §2.4): the old shape joined the
    // gram-keyed first-occurrence aggregate BACK onto the full gram
    // stream — a second full shuffle of every (doc, gram) pair — just
    // to test `first_doc = doc_id`. But (doc, gram) pairs are distinct,
    // so each gram's novel row IS its min row: carrying the source
    // through the min (`min(struct(doc_id, source))` — doc_id is
    // unique, so the struct min is the min-doc row) lets n_novel come
    // straight off the first-occurrence aggregate, one row per
    // DISTINCT gram, no join back. The per-source size pass aggregates
    // the gram stream by source (map-side partials). Two passes over
    // the exploded grams, zero gram-stream joins; the final join is
    // ≤|sources| rows on both sides.
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), toks.as("t"))
      .select(col("doc_id"), col("source"),
        explode(expr(s"array_distinct($trigramArrayExpr)")).as("g"))
    val novel = grams.groupBy(col("g"))
      .agg(min(struct(col("doc_id"), col("source"))).as("f"))
      .groupBy(col("f.source").as("source"))
      .agg(count(lit(1)).as("n_novel"))
    grams.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_grams"))
      .join(novel, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_ppm", expr("(1000000L * n_novel) div n_grams"))
      .orderBy(col("source"))
  }

  val ngramNoveltySql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
       |  FROM documents),
       |grams AS (
       |  SELECT DISTINCT doc_id, source, g
       |  FROM (SELECT doc_id, source, unnest($trigramArraySql) AS g
       |        FROM toks)),
       |first_occ AS (
       |  SELECT g, CAST(MIN(doc_id) AS BIGINT) AS first_doc
       |  FROM grams GROUP BY g)
       |SELECT s.source,
       |  CAST(COUNT(DISTINCT s.doc_id) AS BIGINT) AS n_docs,
       |  CAST(COUNT(*) AS BIGINT) AS n_grams,
       |  CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_novel,
       |  (1000000 * CAST(SUM(CASE WHEN f.first_doc = s.doc_id
       |    THEN 1 ELSE 0 END) AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
       |    AS novelty_ppm
       |FROM grams s JOIN first_occ f ON f.g = s.g
       |GROUP BY s.source
       |ORDER BY source""".stripMargin

  /** Code-likeness threshold for [[codeDetect]]: a document whose
    * code-symbol density reaches this many ppm of its characters is
    * flagged (tuned on the synthetic corpus to split prose from
    * markup-heavy text; production would calibrate per source). */
  private val CodeSymbolPpm = 20000L

  /** Code detection over the corpus — the routing signal a training
    * mix needs before weighting code vs prose: per document, the
    * density of code-punctuation characters (braces, semicolons,
    * operators) and hits on a tiny keyword lexicon, both exact
    * integers; per source, doc counts, flagged counts, and mean
    * densities as integer ppm. Char counts come from
    * `length(x) − length(regexp_replace(x, cls, ''))` with a
    * Java-regex/RE2-agreeing character class (the [[piiRedact]]
    * pattern rule); keyword hits use non-regex replace, identical in
    * both engines.
    *
    * Scale shape: pure projection + ONE ≤|sources| aggregate — zero
    * joins, zero extra shuffles; the scan prunes to (source, text). */
  def codeDetect(spark: SparkSession, dir: String): DataFrame = {
    val sym = "[{}();=_<>#\\[\\]]"
    val d = Tables.documents(spark, dir)
      .select(col("source"),
        length(col("text")).as("n_chars"),
        (length(col("text")) -
          length(regexp_replace(col("text"), sym, ""))).cast("long")
          .as("n_sym"),
        // keyword hits by length delta; `div` per term, NOT `/` — the
        // float division would truncate the SUM, DuckDB truncates each
        // term (and `//` there is integer division)
        expr("""CAST((length(text) - length(replace(text, 'return', ''))) div 6
              |   + (length(text) - length(replace(text, 'import', ''))) div 6
              |   + (length(text) - length(replace(text, 'void', ''))) div 4
              | AS BIGINT)""".stripMargin).as("n_kw"))
      .withColumn("sym_ppm",
        expr("(1000000L * n_sym) div greatest(n_chars, 1)"))
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("sym_ppm") >= CodeSymbolPpm, 1L).otherwise(0L))
          .as("n_code"),
        sum(col("n_sym")).as("sum_sym"),
        sum(col("n_kw")).as("sum_kw"),
        sum(col("n_chars")).as("sum_chars"))
      .withColumn("mean_sym_ppm",
        expr("(1000000L * sum_sym) div greatest(sum_chars, 1L)"))
      .withColumn("kw_per_kdoc", expr("(1000L * sum_kw) div n_docs"))
      .orderBy(col("source"))
  }

  val codeDetectSql: String =
    s"""WITH d AS (
       |  SELECT source, length(text) AS n_chars,
       |    CAST(length(text)
       |      - length(regexp_replace(text, '[{}();=_<>#\\[\\]]', '', 'g'))
       |      AS BIGINT) AS n_sym,
       |    CAST((length(text) - length(replace(text, 'return', ''))) // 6
       |       + (length(text) - length(replace(text, 'import', ''))) // 6
       |       + (length(text) - length(replace(text, 'void', ''))) // 4
       |      AS BIGINT) AS n_kw
       |  FROM documents),
       |p AS (
       |  SELECT source, n_chars, n_sym, n_kw,
       |    (1000000 * n_sym) // greatest(n_chars, 1) AS sym_ppm
       |  FROM d)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN sym_ppm >= $CodeSymbolPpm THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_code,
       |  CAST(SUM(n_sym) AS BIGINT) AS sum_sym,
       |  CAST(SUM(n_kw) AS BIGINT) AS sum_kw,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       |  (1000000 * CAST(SUM(n_sym) AS BIGINT))
       |    // greatest(CAST(SUM(n_chars) AS BIGINT), 1) AS mean_sym_ppm,
       |  (1000 * CAST(SUM(n_kw) AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
       |    AS kw_per_kdoc
       |FROM p
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** Materialize the [[mixPlan]] — the step that turns quotas into an
    * actual training set: per source, documents are ranked by the
    * md5-of-id deterministic order ([[sampleHashrank]]'s idiom — run/
    * retry/engine-stable where rand() is not) and kept greedily until
    * the source's token quota fills (a document is kept iff the
    * tokens BEFORE it sit strictly under quota, so the boundary doc
    * that crosses the line ships — quotas fill, never starve).
    * Reports per source: docs/tokens kept vs the quota and the fill
    * ratio in ppm — everything integer-exact, the whole plan chain
    * re-derived in the oracle.
    *
    * Scale shape: the quota frame is ≤|sources| rows broadcast onto
    * the corpus scan; the greedy fill is ONE per-source window sort
    * (md5 order) with a running token sum — the same single-sort
    * shape as [[sampleStratified]]; final aggregate is ≤|sources|
    * rows. */
  def mixApply(spark: SparkSession, dir: String): DataFrame = {
    val quotas = mixPlan(spark, dir)
      .select(col("source").as("qsource"), col("token_quota"))
    val wSrc = Window.partitionBy(col("source"))
      .orderBy(col("hk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(toks).as("n_tok"),
        md5(concat(lit("mix:"), col("doc_id").cast("string"))).as("hk"))
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(wSrc), lit(0L)))
      .join(broadcast(quotas), col("source") === col("qsource"))
      .where(col("cum_before") < col("token_quota"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_kept"),
        sum(col("n_tok")).as("tokens_kept"),
        min(col("token_quota")).as("token_quota"))
      .withColumn("fill_ppm",
        expr("(1000000L * tokens_kept) div token_quota"))
      .orderBy(col("source"))
  }

  lazy val mixApplySql: String = {
    // re-derive the quota chain from mixPlanSql (shared CTE text minus
    // its final ORDER BY), then the greedy hash-rank fill
    val planCore = mixPlanSql.stripSuffix("\nORDER BY source")
    s"""WITH plan AS ($planCore),
       |docs AS (
       |  SELECT doc_id, source,
       |    CAST(LEN(LIST_FILTER(string_split(lower(text), ' '),
       |      t -> t <> '')) AS BIGINT) AS n_tok,
       |    md5('mix:' || CAST(doc_id AS VARCHAR)) AS hk
       |  FROM documents),
       |cum AS (
       |  SELECT doc_id, source, n_tok,
       |    COALESCE(CAST(SUM(n_tok) OVER (PARTITION BY source
       |      ORDER BY hk, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      0) AS cum_before
       |  FROM docs)
       |SELECT c.source,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
       |  CAST(SUM(c.n_tok) AS BIGINT) AS tokens_kept,
       |  CAST(MIN(p.token_quota) AS BIGINT) AS token_quota,
       |  (1000000 * CAST(SUM(c.n_tok) AS BIGINT))
       |    // CAST(MIN(p.token_quota) AS BIGINT) AS fill_ppm
       |FROM cum c JOIN plan p ON p.source = c.source
       |WHERE c.cum_before < p.token_quota
       |GROUP BY c.source
       |ORDER BY c.source""".stripMargin
  }

  /** Language-ID confusion matrix — the classifier-eval product for
    * [[langId]]: predicted vs declared language counts per (pred,
    * actual) cell plus per-cell share of the actual row in exact ppm
    * — the accuracy/precision/recall report a labeling pipeline reads
    * before trusting the cheap heuristic on unlabeled data.
    *
    * Scale shape: a pure projection (the langId predicate) into ONE
    * ≤|langs|²-cell aggregate with a per-actual window over the tiny
    * matrix. */
  def langConfusion(spark: SparkSession, dir: String): DataFrame = {
    val wActual = Window.partitionBy(col("lang"))
    Tables.documents(spark, dir)
      .select(col("lang"),
        (size(filter(toks, t => t === "the" || t === "a")) /
          greatest(size(toks), lit(1))).as("stop_ratio"))
      .select(col("lang"),
        when(col("stop_ratio") >= 0.02, "en").otherwise("und")
          .as("pred_lang"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("actual_total", sum(col("n")).over(wActual))
      .withColumn("recall_ppm", expr("(1000000L * n) div actual_total"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  val langConfusionSql: String =
    """WITH pred AS (
      |  SELECT lang,
      |    CASE WHEN CAST(LEN(LIST_FILTER(toks, t -> t = 'the' OR t = 'a'))
      |        AS INT) / CAST(GREATEST(LEN(toks), 1) AS INT) >= 0.02
      |      THEN 'en' ELSE 'und' END AS pred_lang
      |  FROM (SELECT lang,
      |          LIST_FILTER(string_split(lower(text), ' '), t -> t <> '')
      |            AS toks
      |        FROM documents)),
      |m AS (
      |  SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM pred GROUP BY 1, 2)
      |SELECT lang, pred_lang, n,
      |  CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS actual_total,
      |  (1000000 * n) // CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT)
      |    AS recall_ppm
      |FROM m
      |ORDER BY lang, pred_lang""".stripMargin

  /** Repeated-n-gram gate — the C4-style "most-repeated 4-gram" rule
    * catching loop-generated spam that [[repetition]]'s distinct-token
    * ratio misses (a doc can repeat one 20-token block with a rich
    * vocabulary): per doc, the max occurrence count of any single word
    * 4-gram and its repeat mass in ppm of the doc's 4-grams; per
    * source, docs flagged at ≥3 repeats of one gram.
    *
    * Scale shape: per-doc gram explode into ONE (doc, gram)-keyed
    * aggregate (map-side combined) + one doc-keyed max aggregate +
    * the ≤|sources| rollup — the inverted-index cost envelope again,
    * never gram × gram. */
  def ngramRepeat(spark: SparkSession, dir: String): DataFrame = {
    val four =
      """filter(transform(sequence(0, greatest(size(t)-4, 0)),
        |  i -> concat(try_element_at(t, i+1), ' ', try_element_at(t, i+2),
        |              ' ', try_element_at(t, i+3), ' ', try_element_at(t, i+4))),
        |  x -> x IS NOT NULL)""".stripMargin
    val perGram = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), toks.as("t"))
      .select(col("doc_id"), col("source"), explode(expr(four)).as("g"))
      .groupBy(col("doc_id"), col("source"), col("g"))
      .agg(count(lit(1)).as("c"))
    perGram.groupBy(col("doc_id"), col("source"))
      .agg(max(col("c")).as("max_repeat"), sum(col("c")).as("n_grams"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("max_repeat") >= 3, 1L).otherwise(0L)).as("n_flagged"),
        max(col("max_repeat")).as("worst_repeat"))
      .withColumn("flagged_ppm", expr("(1000000L * n_flagged) div n_docs"))
      .orderBy(col("source"))
  }

  val ngramRepeatSql: String =
    """WITH grams AS (
      |  SELECT doc_id, source, unnest(
      |    list_filter([t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
      |                 for i in range(0, greatest(len(t)-3, 1))],
      |                x -> x IS NOT NULL)) AS g
      |  FROM (SELECT doc_id, source,
      |          list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
      |        FROM documents)),
      |per_gram AS (
      |  SELECT doc_id, source, g, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM grams GROUP BY 1, 2, 3),
      |per_doc AS (
      |  SELECT doc_id, source, CAST(MAX(c) AS BIGINT) AS max_repeat,
      |    CAST(SUM(c) AS BIGINT) AS n_grams
      |  FROM per_gram GROUP BY 1, 2)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN max_repeat >= 3 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_flagged,
      |  CAST(MAX(max_repeat) AS BIGINT) AS worst_repeat,
      |  (1000000 * CAST(SUM(CASE WHEN max_repeat >= 3 THEN 1 ELSE 0 END)
      |    AS BIGINT)) // CAST(COUNT(*) AS BIGINT) AS flagged_ppm
      |FROM per_doc
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** Corpus drift — symmetric smoothed KL divergence between the two
    * doc-id-parity halves of the corpus (stand-ins for "last month vs
    * this month"): add-one-smoothed unigram distributions over the
    * union vocabulary, each term's contribution quantized to
    * micro-nats (the [[lmScore]] contract — order-free BIGINT sums,
    * ln on exact-count ratios identical in both engines). The drift
    * alarm a training pipeline wires before refreshing a mix: KL ≈ 0
    * for a stable corpus, spikes when a source shifts vocabulary.
    *
    * Scale shape: ONE term-keyed aggregate with two conditional
    * counts (both halves in one shuffle, map-side combined), a 1-row
    * totals frame broadcast back, one scalar sum. Cost tracks
    * distinct terms — the census, not the corpus. */
  def corpusDrift(spark: SparkSession, dir: String): DataFrame = {
    val terms = Tables.documents(spark, dir)
      .select((col("doc_id") % 2 === 0).as("in_a"),
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as("term"))
      .groupBy(col("term"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("cb"))
    val totals = terms.agg(count(lit(1)).as("v"),
      sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    terms.crossJoin(broadcast(totals))
      .select(col("v"), col("na"), col("nb"),
        expr(
          """CAST(ROUND(
            |  (CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))
            |  * ln((CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))
            |       / (CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE)))
            |  * 1000000.0d) AS BIGINT)""".stripMargin).as("ab"),
        expr(
          """CAST(ROUND(
            |  (CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))
            |  * ln((CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))
            |       / (CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE)))
            |  * 1000000.0d) AS BIGINT)""".stripMargin).as("ba"))
      .groupBy(col("v"), col("na"), col("nb"))
      .agg(sum(col("ab")).as("kl_ab_micro"), sum(col("ba")).as("kl_ba_micro"))
      .select(col("v").as("vocab"), col("na").as("tokens_a"),
        col("nb").as("tokens_b"), col("kl_ab_micro"), col("kl_ba_micro"))
  }

  val corpusDriftSql: String =
    """WITH t AS (
      |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
      |    doc_id % 2 = 0 AS in_a
      |  FROM documents),
      |census AS (
      |  SELECT term,
      |    CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
      |  FROM t GROUP BY term),
      |tot AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS v, CAST(SUM(ca) AS BIGINT) AS na,
      |    CAST(SUM(cb) AS BIGINT) AS nb
      |  FROM census),
      |q AS (
      |  SELECT v, na, nb,
      |    CAST(ROUND(
      |      (CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))
      |      * ln((CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))
      |           / (CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE)))
      |      * 1000000.0) AS BIGINT) AS ab,
      |    CAST(ROUND(
      |      (CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))
      |      * ln((CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))
      |           / (CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE)))
      |      * 1000000.0) AS BIGINT) AS ba
      |  FROM census CROSS JOIN tot)
      |SELECT v AS vocab, na AS tokens_a, nb AS tokens_b,
      |  CAST(SUM(ab) AS BIGINT) AS kl_ab_micro,
      |  CAST(SUM(ba) AS BIGINT) AS kl_ba_micro
      |FROM q
      |GROUP BY v, na, nb""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_corpus_drift" -> corpusDrift,
    "llm_lang_confusion" -> langConfusion,
    "llm_ngram_repeat" -> ngramRepeat,
    "llm_mix_apply" -> mixApply,
    "llm_ngram_novelty" -> ngramNovelty,
    "llm_code_detect" -> codeDetect,
    "llm_unigram_coverage" -> unigramCoverage,
    "llm_blocklist_filter" -> blocklistFilter,
    "llm_span_corrupt" -> spanCorrupt,
    "llm_sample_hashrank" -> sampleHashrank,
    "llm_span_dedup" -> spanDedup,
    "llm_sft_format" -> sftFormat,
    "llm_curriculum" -> curriculum,
    "llm_preference_pairs" -> preferencePairs,
    "llm_tokenizer_fertility" -> tokenizerFertility,
    "llm_chunk_overlap" -> chunkOverlap,
    "llm_vocab_coverage" -> vocabCoverage,
    "llm_bpe_train" -> bpeTrain,
    "llm_bpe_apply" -> bpeApply,
    "llm_tfidf" -> tfidf,
    "llm_quality_by_source" -> qualityBySource,
    "llm_dataset_card" -> datasetCard,
    "llm_boilerplate" -> boilerplate,
    "llm_export_jsonl" -> exportJsonl,
    "llm_collocations" -> collocations,
    "llm_sample_stratified" -> sampleStratified,
    "llm_filter_funnel" -> filterFunnel,
    "llm_ngram_counts" -> ngramCounts,
    "llm_lm_score" -> lmScore,
    "llm_bm25" -> bm25,
    "llm_repetition" -> repetition,
    "llm_split" -> trainTestSplit,
    "llm_decontaminate" -> decontaminate,
    "llm_chunk" -> chunk,
    "llm_pack" -> pack,
    "llm_pack_stats" -> packStats,
    "llm_pii_redact" -> piiRedact,
    "llm_text_stats" -> textStats,
    "llm_sample_weights" -> sampleWeights,
    "llm_mix_plan" -> mixPlan,
    "llm_lang_id" -> langId,
    "llm_quality_score" -> qualityScore,
    "llm_token_count" -> tokenCount,
    "llm_fingerprint" -> fingerprint,
  )

  val oracleSql: Map[String, String] = Map(
    "llm_corpus_drift" -> corpusDriftSql,
    "llm_lang_confusion" -> langConfusionSql,
    "llm_ngram_repeat" -> ngramRepeatSql,
    "llm_mix_apply" -> mixApplySql,
    "llm_ngram_novelty" -> ngramNoveltySql,
    "llm_code_detect" -> codeDetectSql,
    "llm_unigram_coverage" -> unigramCoverageSql,
    "llm_blocklist_filter" -> blocklistFilterSql,
    "llm_span_corrupt" -> spanCorruptSql,
    "llm_sample_hashrank" -> sampleHashrankSql,
    "llm_span_dedup" -> spanDedupSql,
    "llm_sft_format" -> sftFormatSql,
    "llm_curriculum" -> curriculumSql,
    "llm_preference_pairs" -> preferencePairsSql,
    "llm_tokenizer_fertility" -> tokenizerFertilitySql,
    "llm_chunk_overlap" -> chunkOverlapSql,
    "llm_vocab_coverage" -> vocabCoverageSql,
    "llm_bpe_train" -> bpeTrainSql,
    "llm_bpe_apply" -> bpeApplySql,
    "llm_tfidf" -> tfidfSql,
    "llm_quality_by_source" -> qualityBySourceSql,
    "llm_dataset_card" -> datasetCardSql,
    "llm_boilerplate" -> boilerplateSql,
    "llm_export_jsonl" -> exportJsonlSql,
    "llm_collocations" -> collocationsSql,
    "llm_sample_stratified" -> sampleStratifiedSql,
    "llm_filter_funnel" -> filterFunnelSql,
    "llm_ngram_counts" -> ngramCountsSql,
    "llm_lm_score" -> lmScoreSql,
    "llm_bm25" -> bm25Sql,
    "llm_repetition" -> repetitionSql,
    "llm_split" -> splitSql,
    "llm_decontaminate" -> decontaminateSql,
    "llm_chunk" -> chunkSql,
    "llm_pack" -> packSql,
    "llm_pack_stats" -> packStatsSql,
    "llm_pii_redact" -> piiRedactSql,
    "llm_text_stats" -> textStatsSql,
    "llm_sample_weights" -> sampleWeightsSql,
    "llm_mix_plan" -> mixPlanSql,
    "llm_lang_id" -> langIdSql,
    "llm_quality_score" -> qualityScoreSql,
    "llm_token_count" -> tokenCountSql,
    "llm_fingerprint" -> fingerprintSql,
  )
}
