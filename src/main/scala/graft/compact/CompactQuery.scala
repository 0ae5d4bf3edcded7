package graft.compact

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Det, DetSql, Tables}

/** Oracle-checked end-to-end compaction parity (SURVEY.md §2B
  * `compact_roundtrip`, reference D1→D3→D5): fragment lineitem into
  * many small files, compact through [[Compactor]], re-read, and
  * aggregate. The oracle aggregates the *source* table — equality
  * proves the compacted copy carries exactly the source rows. */
object CompactQuery {

  def compactRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    // r15 (§1.2 don't redo fixture prep in the timed region): the
    // fragmented SOURCE is fixture input, not the operation under
    // test — staged once per source content (the shared
    // Fixtures.staged discipline) instead of rewritten every
    // invocation. The compactor itself still runs its full read →
    // coalesce → validate → trash-then-rename protocol against a
    // FRESH target per invocation (its source-unchanged checkpoint is
    // an intra-run concurrency fence on a fresh target, never a
    // cross-run result cache), so the measured path computes from
    // parquet every time.
    val src = graft.core.Fixtures.staged(s"$dir/lineitem.parquet",
        "compactsrc", codeTag = "repart8_v1") { target =>
      Tables.lineitem(spark, dir).repartition(8)
        .write.mode("overwrite").parquet(target)
    }
    val base = Files.createTempDirectory("graft_compact_rt").toString
    val tgt = s"$base/tgt"
    val res = Compactor.run(spark, Compactor.Config(
      sourceFolder = src, targetFolder = tgt,
      fileCount = 2, tmpFolder = s"$base/tmp"))
    require(res.ok, s"compaction failed: ${res.log.toTsv}")
    // The verification aggregate is one row: materialize it eagerly so
    // the temp tree can be deleted here instead of leaking one
    // fixture per invocation across Bench/Verify runs (the write-
    // compact-read under test has fully executed by this point).
    val out = spark.read.parquet(tgt).agg(
      count(lit(1)).as("n_rows"),
      Det.dsum(col("l_quantity")).as("sum_qty"),
      Det.dsum(col("l_extendedprice")).as("sum_price")).collect()(0)
    new FsOps(spark.sparkContext.hadoopConfiguration).delete(base)
    import spark.implicits._
    Seq((out.getLong(0), out.getDouble(1), out.getDouble(2)))
      .toDF("n_rows", "sum_qty", "sum_price")
  }

  val compactRoundtripSql: String =
    s"""SELECT COUNT(*) AS n_rows,
       |  ${DetSql.dsum("l_quantity")} AS sum_qty,
       |  ${DetSql.dsum("l_extendedprice")} AS sum_price
       |FROM lineitem""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "compact_roundtrip" -> compactRoundtrip,
  )

  val oracleSql: Map[String, String] = Map(
    "compact_roundtrip" -> compactRoundtripSql,
  )
}
