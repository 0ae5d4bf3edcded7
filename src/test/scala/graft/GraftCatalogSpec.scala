package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, TxnLog}

/** The r12 catalog + V2 write seam: txn-log tables by NAME — CREATE /
  * INSERT INTO / INSERT OVERWRITE / native time travel / ALTER /
  * RENAME / DROP — every verb driving the same log commit protocol
  * as the Scala API. */
class GraftCatalogSpec extends AnyFunSuite with SparkSpec {

  private val cat = "gspec"

  /** Fresh warehouse per test; the catalog resolves it from the conf
    * DYNAMICALLY, so repointing works even though Spark caches the
    * catalog instance per session. */
  private def withWarehouse(body: String => Unit): Unit = {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_cat_").toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try body(wh)
    finally graft.core.Fixtures.deleteRecursively(new java.io.File(wh))
  }

  private def scanDescs(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }

  test("full lifecycle by name: create, insert, overwrite, time " +
    "travel, drop") {
    withWarehouse { wh =>
      spark.sql(s"CREATE NAMESPACE $cat.main")
      spark.sql(s"CREATE TABLE $cat.main.t (k BIGINT, t STRING)")
      val root = s"$wh/main/t"
      assert(TxnLog.latestVersion(root) == 1)
      assert(TxnLog.schemaAt(root, 1).get.fieldNames.toSeq ==
        Seq("k", "t"))
      // the birth commit reads as an EMPTY typed frame
      assert(spark.sql(s"SELECT * FROM $cat.main.t").count() == 0)

      spark.sql(s"INSERT INTO $cat.main.t VALUES (1, 'a'), (2, 'b')")
      spark.sql(s"INSERT INTO $cat.main.t VALUES (3, 'c')")
      assert(TxnLog.latestVersion(root) == 3)
      assert(spark.sql(s"SELECT * FROM $cat.main.t").count() == 3)

      // SHOW TABLES sees it
      val shown = spark.sql(s"SHOW TABLES IN $cat.main")
        .select("tableName").collect().map(_.getString(0)).toSeq
      assert(shown == Seq("t"))

      // native VERSION AS OF: v2 = first insert only
      assert(spark.sql(
        s"SELECT * FROM $cat.main.t VERSION AS OF 2").count() == 2)
      // native TIMESTAMP AS OF (micros at the seam, ms in the log)
      val ts2 = TxnLog.commitTs(root, 2)
      assert(spark.sql(s"SELECT * FROM $cat.main.t TIMESTAMP AS OF " +
        s"timestamp_millis($ts2)").count() == 2)

      spark.sql(s"INSERT OVERWRITE $cat.main.t VALUES (9, 'z')")
      assert(TxnLog.latestVersion(root) == 4)
      assert(spark.sql(s"SELECT k FROM $cat.main.t")
        .head().getLong(0) == 9)
      // the overwrite retired both insert files for one replacement
      assert(TxnLog.liveFiles(root, 3).size == 2)
      assert(TxnLog.liveFiles(root, 4).size == 1)
      // history is intact: v3 still reads pre-overwrite
      assert(spark.sql(
        s"SELECT * FROM $cat.main.t VERSION AS OF 3").count() == 3)

      assert(spark.sql(s"DROP TABLE $cat.main.t").collect().isEmpty)
      assert(!new java.io.File(root).exists())
      assert(spark.sql(s"SHOW TABLES IN $cat.main").count() == 0)
    }
  }

  test("catalog reads keep the V2 metadata pruning: a keyed WHERE " +
    "over two insert files scans one") {
    withWarehouse { _ =>
      spark.sql(s"CREATE NAMESPACE $cat.ns2")
      spark.sql(s"CREATE TABLE $cat.ns2.p (k BIGINT, v DOUBLE)")
      import spark.implicits._
      (0L until 100L).map(k => (k, k * 1.0)).toDF("k", "v")
        .createOrReplaceTempView("lo_src")
      (1000L until 1100L).map(k => (k, k * 1.0)).toDF("k", "v")
        .createOrReplaceTempView("hi_src")
      spark.sql(s"INSERT INTO $cat.ns2.p SELECT * FROM lo_src")
      spark.sql(s"INSERT INTO $cat.ns2.p SELECT * FROM hi_src")
      val df = spark.sql(s"SELECT * FROM $cat.ns2.p WHERE k = 1050")
      assert(df.count() == 1)
      // write-time stats admitted only the hi file; the columnar
      // delegate reports the census in the scan description
      val descs = scanDescs(df)
      assert(descs.exists(d => d.contains("scanned=1") &&
        d.contains("pruned=1")),
        s"expected a 1-scanned/1-pruned census, got: $descs")
    }
  }

  test("a time-traveled relation is read-only") {
    withWarehouse { _ =>
      spark.sql(s"CREATE NAMESPACE $cat.ns3")
      spark.sql(s"CREATE TABLE $cat.ns3.r (k BIGINT)")
      spark.sql(s"INSERT INTO $cat.ns3.r VALUES (1)")
      val e = intercept[Exception] {
        spark.sql(s"INSERT INTO $cat.ns3.r VERSION AS OF 1 VALUES (2)")
      }
      assert(e.getMessage != null)
      // the tip never moved
      assert(TxnLog.latestVersion(
        s"${spark.conf.get(s"spark.sql.catalog.$cat.warehouse")}" +
          "/ns3/r") == 2)
    }
  }

  test("SQL INSERT enforces CHECK constraints and an empty INSERT " +
    "is a version no-op") {
    withWarehouse { wh =>
      spark.sql(s"CREATE NAMESPACE $cat.ns4")
      spark.sql(s"CREATE TABLE $cat.ns4.c (k BIGINT)")
      val root = s"$wh/ns4/c"
      assert(TxnLog.addConstraint(spark, root, "pos", "k > 0",
        "spec") == 2)
      spark.sql(s"INSERT INTO $cat.ns4.c VALUES (5)")
      assert(TxnLog.latestVersion(root) == 3)
      val e = intercept[Exception] {
        spark.sql(s"INSERT INTO $cat.ns4.c VALUES (-1)")
      }
      assert(e.getMessage.contains("pos") ||
        e.getCause != null && e.getCause.getMessage.contains("pos"),
        s"constraint name missing from: ${e.getMessage}")
      assert(TxnLog.latestVersion(root) == 3,
        "a refused INSERT must not commit")
      // staged bytes from the refused write are cleaned up: the next
      // read sees exactly the accepted row
      assert(spark.sql(s"SELECT * FROM $cat.ns4.c").count() == 1)
      spark.sql(
        s"INSERT INTO $cat.ns4.c SELECT * FROM VALUES (1) WHERE false")
      assert(TxnLog.latestVersion(root) == 3,
        "an empty INSERT must be a no-op")
    }
  }

  test("ALTER TABLE by name: ADD COLUMNS / RENAME COLUMN / DROP " +
    "COLUMN are the log's metadata-only surgery") {
    withWarehouse { wh =>
      spark.sql(s"CREATE NAMESPACE $cat.ns5")
      spark.sql(s"CREATE TABLE $cat.ns5.a (k BIGINT, x STRING)")
      spark.sql(s"INSERT INTO $cat.ns5.a VALUES (1, 'one')")
      val root = s"$wh/ns5/a"

      spark.sql(s"ALTER TABLE $cat.ns5.a ADD COLUMNS (w DOUBLE)")
      // old file null-pads the new column
      val r = spark.sql(s"SELECT k, x, w FROM $cat.ns5.a").head()
      assert(r.getLong(0) == 1 && r.isNullAt(2))

      spark.sql(s"ALTER TABLE $cat.ns5.a RENAME COLUMN x TO label")
      assert(spark.sql(s"SELECT label FROM $cat.ns5.a")
        .head().getString(0) == "one")

      spark.sql(s"ALTER TABLE $cat.ns5.a DROP COLUMN w")
      assert(spark.sql(s"SELECT * FROM $cat.ns5.a").columns.toSeq ==
        Seq("k", "label"))
      // all three were metadata-only: the single data file survives
      assert(TxnLog.liveFiles(root,
        TxnLog.latestVersion(root)).size == 1)
    }
  }

  test("ALTER TABLE RENAME TO moves the directory; the relative-path " +
    "log design keeps the whole state") {
    withWarehouse { wh =>
      spark.sql(s"CREATE NAMESPACE $cat.ns6")
      spark.sql(s"CREATE TABLE $cat.ns6.before (k BIGINT)")
      spark.sql(s"INSERT INTO $cat.ns6.before VALUES (1), (2)")
      // the RENAME TO target is CATALOG-RELATIVE in Spark's grammar
      spark.sql(s"ALTER TABLE $cat.ns6.before RENAME TO ns6.after")
      assert(!new java.io.File(s"$wh/ns6/before").exists())
      assert(spark.sql(s"SELECT * FROM $cat.ns6.after").count() == 2)
      // history moved with it
      assert(spark.sql(
        s"SELECT * FROM $cat.ns6.after VERSION AS OF 1").count() == 0)
    }
  }

  test("DataFrameWriterV2 appends by name; writeTo overwrite " +
    "truncates") {
    withWarehouse { _ =>
      spark.sql(s"CREATE NAMESPACE $cat.ns7")
      spark.sql(s"CREATE TABLE $cat.ns7.w (k BIGINT, t STRING)")
      import spark.implicits._
      Seq((1L, "a"), (2L, "b")).toDF("k", "t")
        .writeTo(s"$cat.ns7.w").append()
      assert(spark.table(s"$cat.ns7.w").count() == 2)
      Seq((3L, "c")).toDF("k", "t")
        .writeTo(s"$cat.ns7.w").overwrite(lit(true))
      assert(spark.table(s"$cat.ns7.w").as[(Long, String)]
        .collect().toSeq == Seq((3L, "c")))
    }
  }

  test("path-based V2 write: df.write.format(graft-txn).save appends " +
    "to an existing table root") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_pathw_").toString
    try {
      Seq((1L, "a")).toDF("k", "t").coalesce(1)
        .write.parquet(s"$root/f0")
      assert(TxnLog.commitAppend(root, Seq("f0"), "k BIGINT,t STRING",
        "spec") == 1)
      Seq((2L, "b")).toDF("k", "t").write.format("graft-txn")
        .option("path", root).mode("append").save()
      assert(TxnLog.latestVersion(root) == 2)
      assert(TxnLog.read(spark, root).count() == 2)
      // a time-traveled path load refuses writes
      val e = intercept[Exception] {
        Seq((3L, "c")).toDF("k", "t").write.format("graft-txn")
          .option("path", root).option("versionAsOf", "1")
          .mode("append").save()
      }
      assert(e.getMessage.contains("time travel"),
        s"wrong refusal: ${e.getMessage}")
    } finally graft.core.Fixtures.deleteRecursively(
      new java.io.File(root))
  }

  test("DROP + re-CREATE at the same root is a NEW incarnation: no " +
    "stale memoized state leaks, and VERSION AS OF beyond the tip " +
    "fails loudly") {
    withWarehouse { _ =>
      spark.sql(s"CREATE NAMESPACE $cat.ns10")
      spark.sql(s"CREATE TABLE $cat.ns10.r (k BIGINT, t STRING)")
      spark.sql(s"INSERT INTO $cat.ns10.r VALUES (1, 'old')")
      // warm the state memo for (root, 1) and (root, 2)
      assert(spark.sql(s"SELECT * FROM $cat.ns10.r").count() == 1)
      val e = intercept[Exception] {
        spark.sql(s"SELECT * FROM $cat.ns10.r VERSION AS OF 99")
          .collect()
      }
      assert(e.getMessage.contains("does not exist"), e.getMessage)
      spark.sql(s"DROP TABLE $cat.ns10.r")
      // same name, DIFFERENT schema — the old incarnation's cached
      // states must not serve the new table
      spark.sql(s"CREATE TABLE $cat.ns10.r (x DOUBLE)")
      assert(spark.sql(s"SELECT * FROM $cat.ns10.r").columns.toSeq ==
        Seq("x"))
      assert(spark.sql(s"SELECT * FROM $cat.ns10.r").count() == 0,
        "the dead incarnation's rows leaked through the state memo")
      spark.sql(s"INSERT INTO $cat.ns10.r VALUES (9.5)")
      assert(spark.sql(s"SELECT x FROM $cat.ns10.r")
        .head().getDouble(0) == 9.5)
    }
  }

  test("concurrent INSERTs race safely: both land, no lost update, " +
    "no leaked staging") {
    withWarehouse { wh =>
      spark.sql(s"CREATE NAMESPACE $cat.ns11")
      spark.sql(s"CREATE TABLE $cat.ns11.c (k BIGINT)")
      val root = s"$wh/ns11/c"
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val gate = new java.util.concurrent.CountDownLatch(1)
      val writers = (0 until 4).map { i =>
        scala.concurrent.Future {
          gate.await()
          spark.sql(s"INSERT INTO $cat.ns11.c SELECT id + ${i * 100} " +
            "FROM range(10)")
        }
      }
      gate.countDown()
      writers.foreach(f => scala.concurrent.Await.result(f,
        scala.concurrent.duration.Duration("120s")))
      pool.shutdown()
      // every writer's blind append commuted: 4 commits, 40 rows, all
      // distinct — the slot race retried, never dropped
      assert(TxnLog.latestVersion(root) == 5,
        s"expected create + 4 appends, got ${TxnLog.latestVersion(root)}")
      val rows = spark.sql(s"SELECT k FROM $cat.ns11.c").collect()
        .map(_.getLong(0)).toSet
      assert(rows.size == 40 && rows ==
        (0 until 4).flatMap(i => (0 until 10).map(j =>
          (i * 100 + j).toLong)).toSet,
        s"lost or duplicated rows: ${rows.size}")
      // no orphaned staging beyond the 4 live files
      assert(TxnLog.liveFiles(root, 5).size == 4)
      val dirs = Option(new java.io.File(root).listFiles()).toSeq
        .flatten.filter(f => f.isDirectory && f.getName.startsWith("w_"))
      assert(dirs.size == 4, s"staging residue: ${dirs.map(_.getName)}")
    }
  }

  test("CREATE TABLE AS SELECT by name: the non-atomic V2 CTAS — " +
    "birth commit then the first distributed insert") {
    withWarehouse { wh =>
      spark.sql(s"CREATE NAMESPACE $cat.ns9")
      spark.sql(s"CREATE TABLE $cat.ns9.cts AS " +
        "SELECT id AS k, id * 2.0 AS v FROM range(10)")
      assert(spark.table(s"$cat.ns9.cts").count() == 10)
      val root = s"$wh/ns9/cts"
      assert(TxnLog.latestVersion(root) == 2,
        "CTAS must land create (v1) + append (v2)")
      assert(TxnLog.schemaAt(root, 1).get.fieldNames.toSeq ==
        Seq("k", "v"))
    }
  }

  test("create refuses a static PARTITIONED BY; namespaces list and " +
    "drop; a nonexistent table fails loudly") {
    withWarehouse { _ =>
      spark.sql(s"CREATE NAMESPACE $cat.ns8")
      val e = intercept[Exception] {
        spark.sql(
          s"CREATE TABLE $cat.ns8.p (k BIGINT, d STRING) " +
            "PARTITIONED BY (d)")
      }
      assert(e.getMessage.contains("partition tuples"),
        s"wrong refusal: ${e.getMessage}")
      val nss = spark.sql(s"SHOW NAMESPACES IN $cat")
        .collect().map(_.getString(0)).toSet
      assert(nss.contains("ns8"))
      assert(intercept[Exception] {
        spark.sql(s"SELECT * FROM $cat.ns8.ghost").collect()
      }.getMessage.toLowerCase.contains("table"))
      spark.sql(s"DROP NAMESPACE $cat.ns8")
      assert(!spark.sql(s"SHOW NAMESPACES IN $cat")
        .collect().map(_.getString(0)).toSet.contains("ns8"))
    }
  }

  test("r13: REPLACE WHERE (writeTo.overwrite(cond)) atomically swaps " +
    "a region — outside rows untouched, out-of-region input refused") {
    import spark.implicits._
    withWarehouse { wh =>
      spark.sql(s"CREATE NAMESPACE $cat.ns10")
      spark.sql(s"CREATE TABLE $cat.ns10.r (k BIGINT, v DOUBLE)")
      val root = s"$wh/ns10/r"
      spark.sql(s"INSERT INTO $cat.ns10.r SELECT id, CAST(id AS DOUBLE) " +
        "FROM range(1, 51)")
      spark.sql(s"INSERT INTO $cat.ns10.r SELECT id, CAST(id AS DOUBLE) " +
        "FROM range(51, 101)")
      assert(TxnLog.latestVersion(root) == 3)
      val hiFile = TxnLog.stateAt(root, 3).live
        .find(f => TxnLog.stateAt(root, 3).stats(f)
          .exists(s => s.col == "k" && s.min == "51")).get
      // replace the k<=20 region with 5 fresh rows — ONE commit
      (1L to 5L).map(k => (k, k * 100.0)).toDF("k", "v")
        .writeTo(s"$cat.ns10.r").overwrite(col("k") <= 20L)
      assert(TxnLog.latestVersion(root) == 4,
        "replaceWhere must be exactly one atomic commit")
      val r = TxnLog.read(spark, root)
      assert(r.count() == 85) // 100 - 20 replaced by 5
      assert(r.where(col("k") === 3L).head().getDouble(1) == 300.0)
      assert(r.where(col("k") === 21L).head().getDouble(1) == 21.0)
      // the hi file was PRUNED from the delete side — never rewritten
      assert(TxnLog.stateAt(root, 4).live.contains(hiFile),
        "out-of-region file must survive unrewritten")
      // an input row OUTSIDE the region refuses and commits nothing
      val e = intercept[Exception] {
        Seq((999L, 1.0)).toDF("k", "v")
          .writeTo(s"$cat.ns10.r").overwrite(col("k") <= 20L)
      }
      assert((e.getMessage + Option(e.getCause).map(_.getMessage)
        .getOrElse("")).contains("OUTSIDE"), e.getMessage)
      assert(TxnLog.latestVersion(root) == 4,
        "refused replaceWhere must not commit")
      assert(TxnLog.read(spark, root).count() == 85)
      // empty input = pure region delete, still one commit
      spark.range(0).select(col("id").as("k"),
          col("id").cast("double").as("v"))
        .writeTo(s"$cat.ns10.r").overwrite(col("k") <= 10L)
      assert(TxnLog.latestVersion(root) == 5)
      assert(TxnLog.read(spark, root).count() == 80)
    }
  }

  test("r13: native SQL UPDATE and MERGE INTO rewrite onto the engine " +
    "verbs — no GRAFT prefix") {
    import spark.implicits._
    withWarehouse { wh =>
      spark.sql(s"CREATE NAMESPACE $cat.ns11")
      spark.sql(s"CREATE TABLE $cat.ns11.u (k BIGINT, v DOUBLE)")
      val root = s"$wh/ns11/u"
      spark.sql(s"INSERT INTO $cat.ns11.u SELECT id, CAST(id AS DOUBLE) " +
        "FROM range(1, 11)")
      // native UPDATE: expression assignment over the pre-update row,
      // OR/IN WHERE
      spark.sql(s"UPDATE $cat.ns11.u SET v = v * 10 " +
        "WHERE k < 3 OR k IN (7)")
      assert(TxnLog.latestVersion(root) == 3)
      val r = spark.sql(s"SELECT * FROM $cat.ns11.u").collect()
        .map(x => x.getLong(0) -> x.getDouble(1)).toMap
      assert(r(2L) == 20.0 && r(7L) == 70.0 && r(5L) == 5.0, r.toString)
      // native MERGE: matched UPDATE SET *, not matched INSERT *
      Seq((1L, 111.0), (99L, 99.0)).toDF("k", "v")
        .createOrReplaceTempView("nat_merge_src")
      spark.sql(s"MERGE INTO $cat.ns11.u t USING nat_merge_src s " +
        "ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
      assert(TxnLog.latestVersion(root) == 4)
      val m = spark.sql(s"SELECT * FROM $cat.ns11.u").collect()
        .map(x => x.getLong(0) -> x.getDouble(1)).toMap
      assert(m(1L) == 111.0 && m(99L) == 99.0 && m.size == 11, m.toString)
      // conditional matched clauses: DELETE first, then UPDATE —
      // the engine's clause precedence in textual order
      Seq((2L, 0.0), (3L, 333.0)).toDF("k", "v")
        .createOrReplaceTempView("nat_merge_src2")
      spark.sql(s"MERGE INTO $cat.ns11.u t USING nat_merge_src2 s " +
        "ON t.k = s.k " +
        "WHEN MATCHED AND s.v = 0.0 THEN DELETE " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
      val m2 = spark.sql(s"SELECT * FROM $cat.ns11.u").collect()
        .map(x => x.getLong(0) -> x.getDouble(1)).toMap
      assert(!m2.contains(2L) && m2(3L) == 333.0 && m2.size == 10,
        m2.toString)
      // r14 (VERDICT r13 #2): COLUMN-SUBSET SET maps onto the
      // generalized core — assignments reference the source row,
      // unassigned columns keep their target values
      spark.sql(s"MERGE INTO $cat.ns11.u t USING nat_merge_src s " +
        "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v + 1")
      val m3 = spark.sql(s"SELECT * FROM $cat.ns11.u").collect()
        .map(x => x.getLong(0) -> x.getDouble(1)).toMap
      assert(m3(1L) == 112.0 && m3(99L) == 100.0 && m3.size == 10,
        m3.toString)
      // UPDATE on a time-traveled load is refused (read-only history)
      intercept[Exception] {
        spark.sql(s"UPDATE $cat.ns11.u VERSION AS OF 2 SET v = 0.0")
      }
    }
  }

  test("r14: native MERGE WITH SCHEMA EVOLUTION widens the table " +
    "for the ADD-COLUMN case (VERDICT r13 #6)") {
    import spark.implicits._
    withWarehouse { wh =>
      spark.sql(s"CREATE NAMESPACE $cat.ns16")
      spark.sql(s"CREATE TABLE $cat.ns16.e (k BIGINT, v DOUBLE)")
      val root = s"$wh/ns16/e"
      spark.sql(s"INSERT INTO $cat.ns16.e SELECT id, CAST(id AS DOUBLE) " +
        "FROM range(1, 6)")
      Seq((1L, 100.0, "a"), (9L, 900.0, "z")).toDF("k", "v", "tag")
        .createOrReplaceTempView("evo_merge_src")
      spark.sql(s"MERGE WITH SCHEMA EVOLUTION INTO $cat.ns16.e t " +
        "USING evo_merge_src s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
      val sch = org.apache.spark.sql.types.StructType.fromDDL(
        TxnLog.stateAt(root, TxnLog.latestVersion(root)).schemaDdl.get)
      assert(sch.fieldNames.contains("tag") && sch("tag").nullable,
        sch.toDDL)
      val r = spark.sql(s"SELECT * FROM $cat.ns16.e").collect()
        .map(x => x.getLong(0) ->
          (x.getDouble(1), Option(x.getString(2)))).toMap
      assert(r(1L) == ((100.0, Some("a"))) &&
        r(9L) == ((900.0, Some("z"))) && r(3L) == ((3.0, None)),
        r.toString)
    }
  }

  test("r14: native DELETE/UPDATE with IN-subquery conditions " +
    "(VERDICT r13 #3) — the snapshot-hygiene shape") {
    import spark.implicits._
    withWarehouse { wh =>
      spark.sql(s"CREATE NAMESPACE $cat.ns15")
      spark.sql(s"CREATE TABLE $cat.ns15.s (k BIGINT, v DOUBLE)")
      val root = s"$wh/ns15/s"
      spark.sql(s"INSERT INTO $cat.ns15.s SELECT id, CAST(id AS DOUBLE) " +
        "FROM range(1, 21)")
      Seq(1L, 2L, 3L, 15L).toDF("kk")
        .createOrReplaceTempView("keep_manifest")
      // delete everything NOT in the manifest — but the null-free
      // manifest makes NOT IN well-defined
      spark.sql(s"DELETE FROM $cat.ns15.s " +
        "WHERE k NOT IN (SELECT kk FROM keep_manifest)")
      assert(TxnLog.latestVersion(root) == 3)
      val kept = spark.sql(s"SELECT k FROM $cat.ns15.s ORDER BY k")
        .collect().map(_.getLong(0)).toSeq
      assert(kept == Seq(1L, 2L, 3L, 15L), kept.toString)
      // native UPDATE with a subquery WHERE
      spark.sql(s"UPDATE $cat.ns15.s SET v = v + 0.5 " +
        "WHERE k IN (SELECT kk FROM keep_manifest WHERE kk < 3)")
      val r = spark.sql(s"SELECT * FROM $cat.ns15.s").collect()
        .map(x => x.getLong(0) -> x.getDouble(1)).toMap
      assert(r(1L) == 1.5 && r(2L) == 2.5 && r(3L) == 3.0, r.toString)
    }
  }

  test("r14: native MERGE NOT MATCHED BY SOURCE + conditional INSERT " +
    "— the snapshot-sync idiom (VERDICT r13 #2)") {
    import spark.implicits._
    withWarehouse { wh =>
      spark.sql(s"CREATE NAMESPACE $cat.ns14")
      spark.sql(s"CREATE TABLE $cat.ns14.m (k BIGINT, v DOUBLE)")
      val root = s"$wh/ns14/m"
      spark.sql(s"INSERT INTO $cat.ns14.m SELECT id, CAST(id AS DOUBLE) " +
        "FROM range(1, 11)")
      // snapshot: keys 1..5 (values ×100) + new keys 21, 22
      Seq((1L, 100.0), (2L, 200.0), (3L, 300.0), (4L, 400.0),
        (5L, 500.0), (21L, 2100.0), (22L, 2200.0))
        .toDF("k", "v").createOrReplaceTempView("sync_src")
      spark.sql(s"MERGE INTO $cat.ns14.m t USING sync_src s " +
        "ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED AND s.k % 2 = 0 THEN INSERT * " +
        "WHEN NOT MATCHED BY SOURCE THEN DELETE")
      val r = spark.sql(s"SELECT * FROM $cat.ns14.m").collect()
        .map(x => x.getLong(0) -> x.getDouble(1)).toMap
      // 1..5 updated; 6..10 deleted (gone from snapshot); 22 inserted
      // (even), 21 NOT inserted (condition)
      assert(r == Map(1L -> 100.0, 2L -> 200.0, 3L -> 300.0,
        4L -> 400.0, 5L -> 500.0, 22L -> 2200.0), r.toString)
      // NMBS UPDATE with subset assignments over the target row
      Seq((1L, 0.0)).toDF("k", "v")
        .createOrReplaceTempView("sync_src2")
      spark.sql(s"MERGE INTO $cat.ns14.m t USING sync_src2 s " +
        "ON t.k = s.k " +
        "WHEN NOT MATCHED BY SOURCE AND t.k < 5 THEN " +
        "UPDATE SET v = -t.v")
      val r2 = spark.sql(s"SELECT * FROM $cat.ns14.m").collect()
        .map(x => x.getLong(0) -> x.getDouble(1)).toMap
      assert(r2(2L) == -200.0 && r2(3L) == -300.0 && r2(4L) == -400.0 &&
        r2(1L) == 100.0 && r2(5L) == 500.0 && r2(22L) == 2200.0,
        r2.toString)
      // a still-unsupported shape (NMBS referencing a source column is
      // impossible per SQL; here: multiple conditional UPDATE clauses)
      // falls to Spark's own loud refusal — nothing commits
      val tip = TxnLog.latestVersion(root)
      intercept[Exception] {
        spark.sql(s"MERGE INTO $cat.ns14.m t USING sync_src s " +
          "ON t.k = s.k " +
          "WHEN MATCHED AND s.v > 0 THEN UPDATE SET v = s.v " +
          "WHEN MATCHED THEN UPDATE SET v = 0.0")
      }
      assert(TxnLog.latestVersion(root) == tip)
    }
  }

  test("r13: native SQL DELETE FROM drives the copy-on-write ladder " +
    "with exact predicates and log-metadata pruning") {
    withWarehouse { wh =>
      spark.sql(s"CREATE NAMESPACE $cat.ns9")
      spark.sql(s"CREATE TABLE $cat.ns9.d (k BIGINT, v DOUBLE)")
      val root = s"$wh/ns9/d"
      // two stats-carrying files: lo (1..50) and hi (51..100)
      spark.sql(s"INSERT INTO $cat.ns9.d SELECT id, CAST(id AS DOUBLE) " +
        "FROM range(1, 51)")
      spark.sql(s"INSERT INTO $cat.ns9.d SELECT id, CAST(id AS DOUBLE) " +
        "FROM range(51, 101)")
      assert(TxnLog.latestVersion(root) == 3)
      val hiFile = TxnLog.stateAt(root, 3).live
        .find(f => TxnLog.stateAt(root, 3).stats(f)
          .exists(s => s.col == "k" && s.min == "51")).get
      // plain Spark SQL — no GRAFT prefix: OR of a range and an IN
      spark.sql(s"DELETE FROM $cat.ns9.d WHERE k < 3 OR k IN (7, 9)")
      assert(TxnLog.latestVersion(root) == 4)
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.ns9.d")
        .head().getLong(0) == 96)
      // the hi file was PRUNED from the delete by its logged bounds —
      // still live under its original name, never rewritten
      assert(TxnLog.stateAt(root, 4).live.contains(hiFile),
        "hi file should have been pruned, not rewritten")
      // a no-match delete is a version no-op
      spark.sql(s"DELETE FROM $cat.ns9.d WHERE k > 100000")
      assert(TxnLog.latestVersion(root) == 4)
      // NOT/null semantics: a NOT(=) predicate must not delete null
      // keys (SQL: null is not TRUE)
      spark.sql(s"INSERT INTO $cat.ns9.d VALUES (NULL, -1.0)")
      spark.sql(s"DELETE FROM $cat.ns9.d WHERE NOT (k = 5)")
      val left = spark.sql(s"SELECT * FROM $cat.ns9.d").collect()
      assert(left.length == 2, left.mkString(","))
      assert(left.exists(_.isNullAt(0)), "null-keyed row was destroyed")
      // time-traveled loads refuse row-level DML at analysis
      intercept[Exception] {
        spark.sql(s"DELETE FROM $cat.ns9.d VERSION AS OF 3 WHERE k = 5")
      }
    }
  }
}
