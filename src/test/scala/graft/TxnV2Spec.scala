package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxnLog

/** The r12 DataSource V2 seam: columnar parquet delegation on plain
  * states, log-derived statistics feeding join planning, and the
  * V1Scan merge fallback keeping DV / column-mapping semantics. */
class TxnV2Spec extends AnyFunSuite with SparkSpec {

  private def withScratch(body: String => Unit): Unit = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_v2_").toString
    try body(root)
    finally graft.core.Fixtures.deleteRecursively(new java.io.File(root))
  }

  private def load(root: String): DataFrame =
    spark.read.format("graft-txn").option("path", root).load()

  private def scansOf(df: DataFrame) =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }

  test("plain state executes COLUMNAR: parquet V2 delegate inside " +
    "codegen, filters pushed to the reader") {
    import spark.implicits._
    withScratch { root =>
      (0L until 1000L).map(k => (k, s"t$k"))
        .toDF("k", "t").coalesce(1).write.parquet(s"$root/f0")
      (1000L until 2000L).map(k => (k, s"t$k"))
        .toDF("k", "t").coalesce(1).write.parquet(s"$root/f1")
      val adds = Seq("f0", "f1").map(f => TxnLog.AddStats(f,
        TxnLog.statsFor(spark, root, f, "k")))
      assert(TxnLog.tryCommit(root, 1,
        adds :+ TxnLog.MetaData("k BIGINT,t STRING"), "s"))
      val df = load(root).where(col("k") between (100L, 200L))
      assert(df.count() == 101)
      val plan = df.queryExecution.executedPlan.toString
      // vectorized batches enter the row pipeline through
      // ColumnarToRow — the delegate's reader is columnar
      assert(plan.contains("ColumnarToRow"),
        s"columnar path not taken:\n$plan")
      val scans = scansOf(df)
      assert(scans.nonEmpty &&
        scans.head.description().contains("GraftTxnScan(columnar"),
        s"unexpected scan: ${scans.map(_.description())}")
      // file pruning happened at the V2 seam: only f0 admitted
      assert(scans.head.description().contains("scanned=1") &&
        scans.head.description().contains("pruned=1"),
        scans.head.description())
    }
  }

  test("reported statistics drive broadcast: a small txn table joins " +
    "broadcast-side with no hint") {
    import spark.implicits._
    withScratch { root =>
      (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "name")
        .coalesce(1).write.parquet(s"$root/f0")
      assert(TxnLog.tryCommit(root, 1, Seq(
        TxnLog.AddStats("f0", TxnLog.statsFor(spark, root, "f0", "k")),
        TxnLog.MetaData("k BIGINT,name STRING")), "s"))
      val dim = load(root)
      // log-derived numRows reaches the planner through the scan
      val stats = scansOf(dim).collectFirst {
        case s: org.apache.spark.sql.connector.read
          .SupportsReportStatistics => s.estimateStatistics()
      }
      assert(stats.exists(_.numRows().orElse(-1L) == 50L),
        s"log row count not reported: $stats")
      val fact = spark.range(0, 100000).select(
        (col("id") % 50).as("k"), col("id").as("v"))
      val joined = fact.join(dim, "k")
      assert(joined.count() == 100000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"stats-known small side was not broadcast:\n$plan")
    }
  }

  test("DV and column-mapping states fall back to the merge path and " +
    "stay correct through SQL") {
    import spark.implicits._
    withScratch { root =>
      (1L to 10L).map(k => (k, k * 10.0)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/f0")
      assert(TxnLog.commitAppend(root, Seq("f0"), "k BIGINT,v DOUBLE",
        "s") == 1)
      assert(TxnLog.deleteRangeDV(spark, root, "k", "3", "4", "d")
        .contains(2))
      load(root).createOrReplaceTempView("v2_dv")
      val ks = spark.sql("SELECT k FROM v2_dv ORDER BY k")
        .collect().map(_.getLong(0)).toSeq
      assert(ks == Seq(1L, 2L, 5L, 6L, 7L, 8L, 9L, 10L),
        s"DV rows resurrected through the SQL face: $ks")
      // rename: the logical name reads pre-rename bytes via colmap
      assert(TxnLog.renameColumn(root, "v", "amount", "s") == 3)
      val amt = load(root).where(col("k") === 5L)
        .select(col("amount")).head().getDouble(0)
      assert(amt == 50.0)
    }
  }

  test("schema evolution null-pads on the columnar path") {
    import spark.implicits._
    withScratch { root =>
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1).write.parquet(s"$root/f0")
      Seq((2L, 2.0, "x")).toDF("k", "v", "tag")
        .coalesce(1).write.parquet(s"$root/f1")
      assert(TxnLog.commitAppend(root, Seq("f0"), "k BIGINT,v DOUBLE",
        "s") == 1)
      assert(TxnLog.commitAppend(root, Seq("f1"),
        "k BIGINT,v DOUBLE,tag STRING", "s", evolve = true) == 2)
      val rows = load(root).orderBy("k")
        .collect().map(r => (r.getLong(0), r.isNullAt(2)))
      assert(rows.toSeq == Seq((1L, true), (2L, false)),
        s"evolution padding wrong: ${rows.toSeq}")
      assert(scansOf(load(root)).headOption.exists(
        _.description().contains("columnar")),
        "evolved-but-plain state should still run columnar")
    }
  }

  test("time travel options resolve on the V2 provider") {
    import spark.implicits._
    withScratch { root =>
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1).write.parquet(s"$root/f0")
      Seq((2L, 2.0)).toDF("k", "v").coalesce(1).write.parquet(s"$root/f1")
      assert(TxnLog.commitAppend(root, Seq("f0"), "k BIGINT,v DOUBLE",
        "s") == 1)
      assert(TxnLog.commitAppend(root, Seq("f1"), "k BIGINT,v DOUBLE",
        "s") == 2)
      assert(spark.read.format("graft-txn").option("path", root)
        .option("versionAsOf", "1").load().count() == 1)
      assert(load(root).count() == 2)
      intercept[Exception](spark.read.format("graft-txn")
        .option("path", root).option("versionAsOf", "1")
        .option("timestampAsOf", "0").load())
    }
  }
}
