package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive a ~5× dataset from sf0.1 for the scale-cliff spot check
  * (VERDICT r5 next-round #5): each fact table is unioned 5 times with
  * key offsets so join fan-outs stay realistic (copy k's orders match
  * copy k's lineitem/customer, never cross-copy). Document text is
  * deterministically word-reordered per copy (zip-sort by
  * xxhash64(word, k)) — token/length/vocab statistics are preserved,
  * but shingle sets across copies diverge, so near-dup density stays
  * ~that of the source corpus instead of every doc gaining 4 trivial
  * near-copies (which would grow candidate pairs quadratically in the
  * replication factor and fake a cliff the real corpus doesn't have).
  * NOTE: word REORDERING is not enough — the dedup shingles are
  * character trigrams, and a permutation of words preserves every
  * within-word trigram, leaving cross-copy Jaccard near 1 (measured:
  * 8.45 M band candidates vs 702 at source density). Copies therefore
  * substitute each word with a same-length pseudo-word keyed by
  * (word, copy): lengths, token counts, and per-copy df structure
  * survive; cross-copy trigram sets do not.
  * Dimensions (region/nation/supplier/part) keep their key space; fact
  * FKs to them stay valid per copy.
  *
  * Run: sbt "Test/runMain graft.ScaleGen" → /tmp/graft_scale_x5
  */
object ScaleGen {
  var Copies = 5 // override with args(1); r8 adds a 10x spot-check
  val Span = 100000000L // > any sf0.1 key

  private def copies(spark: SparkSession, df: DataFrame)
                    (shift: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until Copies).map(k => shift(df, k)).reduce(_.unionAll(_))

  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val src = "/root/testdata/sf0.1"
    val out = args.headOption.getOrElse("/tmp/graft_scale_x5")
    args.drop(1).headOption.foreach(c => Copies = c.toInt)
    def t(n: String): DataFrame = spark.read.parquet(s"$src/$n.parquet")
    def w(df: DataFrame, n: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$n.parquet")
      println(s"SCALEGEN $n rows=${spark.read.parquet(s"$out/$n.parquet").count()}")
    }

    for (dim <- Seq("region", "nation", "supplier", "part")) w(t(dim), dim)

    w(copies(spark, t("orders")) { (df, k) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(k * Span))
        .withColumn("o_custkey", col("o_custkey") + lit(k * Span))
    }, "orders")

    w(copies(spark, t("lineitem")) { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(k * Span))
    }, "lineitem")

    w(copies(spark, t("customer")) { (df, k) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(k * Span))
    }, "customer")

    w(copies(spark, t("events")) { (df, k) =>
      df.withColumn("event_id", col("event_id") + lit(k * Span))
        .withColumn("user_id", col("user_id") + lit(k * Span))
    }, "events")

    w(copies(spark, t("documents")) { (df, k) =>
      val text =
        if (k == 0) col("text")
        else expr(s"""concat_ws(' ', transform(split(text, ' '),
          w -> CASE WHEN length(w) = 0 THEN w ELSE
            substr(repeat(lpad(lower(hex(xxhash64(w, $k))), 16, '0'),
                          CAST(1 + length(w) DIV 16 AS INT)),
                   1, length(w)) END))""")
      df.withColumn("doc_id", col("doc_id") + lit(k * Span))
        .withColumn("text", text)
        .withColumn("n_chars", length(col("text")))
    }, "documents")

    w(copies(spark, t("embeddings")) { (df, k) =>
      // perturb one coordinate per copy so replicated vectors are not
      // bit-identical (an all-pairs dup explosion the real corpus
      // wouldn't have) while staying in the same region of space
      val emb =
        if (k == 0) col("embedding")
        else expr(s"transform(embedding, (x, i) -> " +
          s"CASE WHEN i = ${k % 16} THEN float(x + ${k}e-2) ELSE x END)")
      df.withColumn("vec_id", col("vec_id") + lit(k * Span))
        .withColumn("embedding", emb)
    }, "embeddings")

    spark.stop()
  }
}
