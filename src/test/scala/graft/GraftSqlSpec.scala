package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxnLog

/** The GRAFT SQL DML verbs (r12): each statement drives the same
  * Scala-API verb; malformed GRAFT statements fail loudly; everything
  * non-GRAFT delegates to Spark's parser untouched. */
class GraftSqlSpec extends AnyFunSuite with SparkSpec {

  private def withScratch(body: String => Unit): Unit = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_sql_").toString
    try body(root)
    finally graft.core.Fixtures.deleteRecursively(new java.io.File(root))
  }

  private def run1(sql: String): Int = spark.sql(sql).head().getInt(0)

  test("GRAFT DELETE / MERGE / OPTIMIZE / RESTORE / VACUUM round-trip") {
    import spark.implicits._
    withScratch { root =>
      (1L to 100L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/f0")
      assert(TxnLog.commitAppend(root, Seq("f0"), "k BIGINT,v DOUBLE",
        "s") == 1)
      assert(run1(s"GRAFT DELETE FROM '$root' WHERE k BETWEEN '10' " +
        "AND '19'") == 2)
      assert(TxnLog.read(spark, root).count() == 90)
      Seq((5L, 555.0), (200L, 200.0)).toDF("k", "v")
        .createOrReplaceTempView("sql_spec_src")
      assert(run1(s"GRAFT MERGE INTO '$root' USING sql_spec_src ON k")
        == 3)
      val m = TxnLog.read(spark, root)
      assert(m.count() == 91)
      assert(m.where(col("k") === 5L).head().getDouble(1) == 555.0)
      assert(run1(s"GRAFT OPTIMIZE '$root'") == 4)
      assert(TxnLog.entriesAt(root, 4).contains(TxnLog.NoDataChange))
      assert(run1(s"GRAFT RESTORE '$root' TO VERSION 3") == 5)
      assert(TxnLog.read(spark, root).count() == 91)
      // vacuum dry run reports without deleting; the real one reclaims
      val dry = spark.sql(s"GRAFT VACUUM '$root' RETAIN 1 VERSIONS " +
        "DRY RUN")
      assert(dry.columns.toSeq == Seq("n_reclaimed"))
      val n = dry.head().getInt(0)
      assert(n >= 1)
      assert(run1(s"GRAFT VACUUM '$root' RETAIN 1 VERSIONS") == n)
      assert(TxnLog.read(spark, root).count() == 91) // tip unaffected
    }
  }

  test("GRAFT DELETE USING DV publishes a vector; ZORDER BY re-clusters") {
    import spark.implicits._
    withScratch { root =>
      (0L until 64L).map(k => (k, (k * 7) % 64)).toDF("x", "y")
        .coalesce(1).write.parquet(s"$root/f0")
      assert(TxnLog.commitAppend(root, Seq("f0"), "x BIGINT,y BIGINT",
        "s") == 1)
      assert(run1(s"GRAFT DELETE FROM '$root' WHERE x BETWEEN '0' " +
        "AND '3' USING DV") == 2)
      assert(TxnLog.stateAt(root, 2).dvs.contains("f0"),
        "USING DV should merge-on-read, not rewrite")
      assert(TxnLog.read(spark, root).count() == 60)
      assert(run1(s"GRAFT OPTIMIZE '$root' ZORDER BY (x, y)") == 3)
      assert(TxnLog.read(spark, root).count() == 60)
      assert(TxnLog.entriesAt(root, 3).contains(TxnLog.NoDataChange))
      // the rewrite materialized the vector and published both
      // z-columns' bounds (tiny data → one cell; sizing is byte-driven)
      val st = TxnLog.stateAt(root, 3)
      assert(st.dvs.isEmpty, "zorder should materialize the DV")
      st.live.foreach { f =>
        assert(st.stats.getOrElse(f, Seq.empty).map(_.col).toSet
          == Set("x", "y"), s"$f missing z-column bounds")
      }
    }
  }

  test("GRAFT DDL verbs: CLONE, constraints, column surgery, protocol " +
    "upgrade, DESCRIBE HISTORY") {
    import spark.implicits._
    withScratch { root =>
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/f0")
      assert(TxnLog.commitAppend(root, Seq("f0"), "k BIGINT,v DOUBLE",
        "s") == 1)
      // constraints through SQL: add enforces on future checked
      // writes; a violating add is refused against existing content
      assert(run1(s"GRAFT ALTER '$root' ADD CONSTRAINT pos " +
        "CHECK(v > 0)") == 2)
      assert(TxnLog.stateAt(root, 2).constraints == Map("pos" -> "v > 0"))
      val bad = intercept[Exception](spark.sql(
        s"GRAFT ALTER '$root' ADD CONSTRAINT neg CHECK(v < 0)"))
      assert(bad.getMessage.contains("neg"), bad.getMessage)
      // nested parens parse greedily to the last ')'
      assert(run1(s"GRAFT ALTER '$root' ADD CONSTRAINT rng " +
        "CHECK((v > 0) AND (v < 1000))") == 3)
      assert(run1(s"GRAFT ALTER '$root' DROP CONSTRAINT rng") == 4)
      // column surgery through SQL — constraint guard still bites
      val guard = intercept[Exception](spark.sql(
        s"GRAFT ALTER '$root' RENAME COLUMN v TO amount"))
      assert(guard.getMessage.contains("pos"), guard.getMessage)
      assert(run1(s"GRAFT ALTER '$root' RENAME COLUMN k TO id") == 5)
      assert(TxnLog.read(spark, root).columns.toSeq == Seq("id", "v"))
      assert(run1(s"GRAFT ALTER '$root' DROP CONSTRAINT pos") == 6)
      assert(run1(s"GRAFT ALTER '$root' DROP COLUMN v") == 7)
      assert(TxnLog.read(spark, root).columns.toSeq == Seq("id"))
      // protocol upgrade through SQL; over-reach still refused
      assert(run1(s"GRAFT UPGRADE '$root' TO PROTOCOL(2, 2)") == 8)
      intercept[Exception](
        spark.sql(s"GRAFT UPGRADE '$root' TO PROTOCOL(9, 9)"))
      // clone through SQL: zero-copy fork reading identically
      withScratch { dst =>
        assert(run1(s"GRAFT CLONE '$root' TO '$dst'") == 1)
        assert(TxnLog.read(spark, dst).collect().toSet ==
          TxnLog.read(spark, root).collect().toSet)
      }
      // history is a real multi-row frame from the log alone
      val h = spark.sql(s"GRAFT DESCRIBE HISTORY '$root'")
      assert(h.columns.toSeq ==
        Seq("version", "ts", "n_adds", "n_removes", "n_live"))
      val rows = h.collect()
      assert(rows.length == 8 && rows.head.getInt(0) == 1 &&
        rows.head.getInt(2) == 1 && rows.head.getInt(4) == 1,
        rows.mkString(";"))
    }
  }

  test("malformed GRAFT fails loudly; non-GRAFT SQL and expressions " +
    "delegate untouched") {
    val e = intercept[Exception](spark.sql("GRAFT FROBNICATE 'x'"))
    assert(e.getMessage.contains("malformed GRAFT statement"),
      e.getMessage)
    // a GRAFT verb with broken operands must NOT fall through to Spark
    val e2 = intercept[Exception](spark.sql("GRAFT DELETE FROM t"))
    assert(e2.getMessage.contains("malformed GRAFT statement"),
      e2.getMessage)
    // ordinary SQL still parses through the delegate
    assert(spark.sql("SELECT 1 + 1 AS two").head().getInt(0) == 2)
    assert(spark.sql(
      "SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS " +
        "FLOAT)), array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c")
      .head().getDouble(0) == 1.0)
    // a table whose name merely starts with graft is untouched
    spark.range(3).createOrReplaceTempView("graft_named_view")
    assert(spark.sql("SELECT COUNT(*) FROM graft_named_view")
      .head().getLong(0) == 3)
  }

  test("GRAFT verbs accept catalog identifiers: the DML face follows " +
    "the catalog (r12)") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_sqlcat_").toString
    spark.conf.set("spark.sql.catalog.gdml",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdml.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE gdml.m")
      spark.sql("CREATE TABLE gdml.m.t (k BIGINT, v DOUBLE)")
      spark.sql("INSERT INTO gdml.m.t SELECT id, id * 1.0 FROM " +
        "range(1, 101)")
      val root = s"$wh/m/t"
      // maintenance by NAME: delete, history, clone — same verbs,
      // identifier slot
      assert(run1("GRAFT DELETE FROM gdml.m.t WHERE k BETWEEN '10' " +
        "AND '19'") == 3)
      assert(spark.sql("SELECT * FROM gdml.m.t").count() == 90)
      assert(spark.sql("GRAFT DESCRIBE HISTORY gdml.m.t").count() == 3)
      assert(run1("GRAFT CLONE gdml.m.t TO gdml.m.t2") == 1)
      assert(spark.sql("SELECT * FROM gdml.m.t2").count() == 90)
      // an unregistered catalog and a non-graft catalog fail loudly
      val e = intercept[Exception](
        spark.sql("GRAFT DESCRIBE HISTORY nosuch.m.t").collect())
      assert(e.getMessage.contains("unknown catalog"), e.getMessage)
      val e2 = intercept[Exception](
        spark.sql("GRAFT DESCRIBE HISTORY spark_catalog.default.x")
          .collect())
      assert(e2.getMessage.contains("not a graft catalog"),
        e2.getMessage)
    } finally graft.core.Fixtures.deleteRecursively(
      new java.io.File(wh))
  }

  test("GRAFT DESCRIBE DETAIL reports the one-row census from the " +
    "log alone") {
    import spark.implicits._
    withScratch { root =>
      (1L to 100L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/f0")
      assert(TxnLog.tryCommit(root, 1, Seq(TxnLog.AddStats("f0",
        TxnLog.statsFor(spark, root, "f0", "k")),
        TxnLog.MetaData("k BIGINT,v DOUBLE")), "s"))
      assert(TxnLog.addConstraint(spark, root, "pos", "k > 0",
        "s") == 2)
      val d = spark.sql(s"GRAFT DESCRIBE DETAIL '$root'").head()
      assert(d.getString(0) == root)
      assert(d.getInt(1) == 2, "tip")
      assert(d.getInt(4) == 1 && d.getInt(5) == 0, "file census")
      assert(d.getLong(6) > 0, "bytes")
      assert(d.getLong(7) == 100L, "stats-derived row count")
      // the constraint write auto-raised the protocol to (2,2)
      assert(d.getInt(8) == 2 && d.getInt(9) == 2, "protocol")
      assert(d.getInt(10) == 1, "constraint count")
      assert(d.getString(11) == "k BIGINT,v DOUBLE")
    }
  }

  test("GRAFT CHANGES streams the change feed as a distributed plan " +
    "(row feed, append + delete, re-layouts skipped)") {
    import spark.implicits._
    withScratch { root =>
      (1L to 50L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/f0")
      assert(TxnLog.commitAppend(root, Seq("f0"), "k BIGINT,v DOUBLE",
        "s") == 1)
      (51L to 60L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/f1")
      assert(TxnLog.commitAppend(root, Seq("f1"), "k BIGINT,v DOUBLE",
        "s") == 2)
      assert(TxnLog.deleteRange(spark, root, "k", "1", "5", "s")
        .contains(3))
      val feed = spark.sql(s"GRAFT CHANGES '$root' FROM 1 TO 3")
      // v2 = 10 inserts, v3 = 5 deletes
      val byType = feed.groupBy("_change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType.get("insert").contains(10L) &&
        byType.get("delete").contains(5L), byType.toString)
      // open range (FROM without TO) reaches the tip; equals the
      // Scala API row for row
      val open = spark.sql(s"GRAFT CHANGES '$root' FROM 0")
      assert(open.exceptAll(TxnLog.readChanges(spark, root, 0))
        .isEmpty)
      // the feed is a real distributed plan, not a collected command
      assert(open.queryExecution.executedPlan.toString
        .contains("Scan parquet"), "CHANGES must plan a file scan")
    }
  }

  test("r13: GRAFT UPDATE and arbitrary-predicate DELETE/OPTIMIZE " +
    "through the SQL face") {
    import spark.implicits._
    withScratch { root =>
      (1L to 100L).map(k => (k, k * 1.0, s"g${k % 3}"))
        .toDF("k", "v", "g").coalesce(1).write.parquet(s"$root/f0")
      assert(TxnLog.commitAppend(root, Seq("f0"),
        "k BIGINT,v DOUBLE,g STRING", "s") == 1)
      // UPDATE: expressions over the pre-update row, OR/IN WHERE,
      // a function in an assignment (comma inside parens must not
      // split the SET list)
      assert(run1(s"GRAFT UPDATE '$root' SET v = v * 10, " +
        "g = concat(upper(g), '!') WHERE k < 3 OR k IN (42)") == 2)
      val r = TxnLog.read(spark, root)
      assert(r.where(col("k") === 2L).head().getDouble(1) == 20.0)
      assert(r.where(col("k") === 42L).head().getString(2) == "G0!")
      assert(r.where(col("k") === 50L).head().getDouble(1) == 50.0)
      // UPDATE without WHERE touches every row
      assert(run1(s"GRAFT UPDATE '$root' SET v = v + 0.5") == 3)
      assert(TxnLog.read(spark, root).where(col("k") === 50L)
        .head().getDouble(1) == 50.5)
      // DELETE with OR + inequality + IN
      assert(run1(s"GRAFT DELETE FROM '$root' WHERE k > 95 " +
        "OR k IN (7, 8)") == 4)
      assert(TxnLog.read(spark, root).count() == 93)
      // arbitrary-predicate DV delete
      assert(run1(s"GRAFT DELETE FROM '$root' WHERE k = 9 OR k = 10 " +
        "USING DV") == 5)
      assert(TxnLog.stateAt(root, 5).dvs.nonEmpty)
      assert(TxnLog.read(spark, root).count() == 91)
      // OPTIMIZE with an arbitrary-predicate scope lands (the DV'd
      // file is in scope and rewrites; content is unchanged)
      assert(run1(s"GRAFT OPTIMIZE '$root' WHERE k <= 50 " +
        "AND g <> 'zzz'") == 6)
      assert(TxnLog.read(spark, root).count() == 91)
      // a no-match predicate is a loud no-op, not wrong rows
      assert(run1(s"GRAFT DELETE FROM '$root' WHERE k > 100000") == -1)
    }
  }

  test("r13: ZORDER BY three columns publishes all three bounds") {
    import spark.implicits._
    withScratch { root =>
      (0L until 128L).map(k => (k, (k * 7) % 64, (k * 13) % 32))
        .toDF("x", "y", "w").coalesce(1).write.parquet(s"$root/f0")
      assert(TxnLog.commitAppend(root, Seq("f0"),
        "x BIGINT,y BIGINT,w BIGINT", "s") == 1)
      assert(run1(s"GRAFT OPTIMIZE '$root' ZORDER BY (x, y, w)") == 2)
      val st = TxnLog.stateAt(root, 2)
      assert(TxnLog.read(spark, root).count() == 128)
      st.live.foreach { f =>
        assert(st.stats.getOrElse(f, Seq.empty).map(_.col).toSet
          == Set("x", "y", "w"), s"$f missing a z-column's bounds")
      }
    }
  }

  test("r13: VACUUM GRACE widens the listing horizon; GRACE 0 " +
    "reclaims a fresh orphan") {
    import spark.implicits._
    withScratch { root =>
      (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/f0")
      assert(TxnLog.commitAppend(root, Seq("f0"), "k BIGINT,v DOUBLE",
        "s") == 1)
      // a crashed writer's never-committed staging dir, just created
      (1L to 3L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/w_orphan")
      // default grace (24h) protects the young orphan
      assert(run1(s"GRAFT VACUUM '$root' RETAIN 1 VERSIONS DRY RUN")
        == 0)
      // an explicit wide grace does too
      assert(run1(s"GRAFT VACUUM '$root' RETAIN 1 VERSIONS " +
        "GRACE 48 HOURS DRY RUN") == 0)
      // GRACE 0 HOURS: the orphan ages out immediately and reclaims
      assert(run1(s"GRAFT VACUUM '$root' RETAIN 1 VERSIONS " +
        "GRACE 0 HOURS") == 1)
      assert(!new java.io.File(s"$root/w_orphan").exists())
      assert(TxnLog.read(spark, root).count() == 10)
    }
  }

  test("r13: CHANGES parses side-effect-free and takes TIMESTAMP specs") {
    import spark.implicits._
    withScratch { root =>
      // parse-only on a nonexistent catalog/table must NOT touch any
      // log or catalog (ADVICE r12: it used to resolve at parse time)
      val parsed = spark.sessionState.sqlParser.parsePlan(
        "GRAFT CHANGES never_registered.ns.t FROM 1")
      assert(!parsed.resolved, "CHANGES should parse to an unresolved leaf")
      // ... while RUNNING it fails loudly at analysis
      intercept[Exception] {
        spark.sql("GRAFT CHANGES never_registered.ns.t FROM 1").collect()
      }
      (1L to 50L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/f0")
      assert(TxnLog.commitAppend(root, Seq("f0"), "k BIGINT,v DOUBLE",
        "s") == 1)
      (51L to 60L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/f1")
      assert(TxnLog.commitAppend(root, Seq("f1"), "k BIGINT,v DOUBLE",
        "s") == 2)
      // FROM TIMESTAMP of v2's own commit: inclusive — exactly v2's
      // 10 inserts
      val ts2 = new java.sql.Timestamp(TxnLog.commitTs(root, 2))
      val feed = spark.sql(
        s"GRAFT CHANGES '$root' FROM TIMESTAMP '$ts2'")
      assert(feed.count() == 10)
      assert(feed.groupBy("_commit_version").count().head().getInt(0)
        == 2)
      // TO TIMESTAMP of v1: inclusive — exactly v1's 50 inserts
      val ts1 = new java.sql.Timestamp(TxnLog.commitTs(root, 1))
      assert(spark.sql(s"GRAFT CHANGES '$root' FROM 0 " +
        s"TO TIMESTAMP '$ts1'").count() == 50)
    }
  }
}
