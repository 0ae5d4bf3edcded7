package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxnLog

/** Round-13 txn-log surface: arbitrary-predicate DELETE/UPDATE with
  * prunable-conjunct extraction, the UPDATE verb's SQL semantics,
  * strict pre-birth timestamp resolution, and the nullability rules
  * for widened schemas (ADVICE r12). */
class TxnLogR13Spec extends AnyFunSuite with SparkSpec {

  private def withScratch(body: String => Unit): Unit = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_r13_").toString
    try body(root)
    finally graft.core.Fixtures.deleteRecursively(new java.io.File(root))
  }

  test("deletePredicate: OR/IN/inequality delete is exact and " +
    "null-safe; unprunable conjuncts degrade to scan, never wrong rows") {
    import spark.implicits._
    withScratch { root =>
      val rows = (1L to 100L).map(k => (Some(k), k * 1.0)) :+
        ((Option.empty[Long], -1.0))
      val df = rows.toDF("k", "v")
      assert(TxnLog.writeAppend(spark, root, df, "s", "t0") == 1)
      // OR of a range, an IN list, and an equality
      assert(TxnLog.deletePredicate(spark, root,
        "k > 90 OR k IN (1, 2) OR v = 50.0", "s").contains(2))
      val r = TxnLog.read(spark, root)
      assert(r.count() == 88) // 100 - 10 - 2 - 1 + the null row
      // the null-keyed row SURVIVES (predicate null = not TRUE)
      assert(r.where(col("k").isNull).count() == 1)
      // unprunable conjunct (a function call) still deletes exactly
      assert(TxnLog.deletePredicate(spark, root,
        "pmod(k, 10) = 3 AND k < 50", "s").contains(3))
      assert(TxnLog.read(spark, root).count() == 83) // 3,13,23,33,43
      // nothing-matched is a no-op
      assert(TxnLog.deletePredicate(spark, root, "k > 10000", "s").isEmpty)
    }
  }

  test("deletePredicate prunes untouched files from the log alone") {
    import spark.implicits._
    withScratch { root =>
      val lo = (1L to 50L).map(k => (k, k * 1.0)).toDF("k", "v")
      val hi = (51L to 100L).map(k => (k, k * 1.0)).toDF("k", "v")
      assert(TxnLog.writeAppend(spark, root, lo, "s", "lo") == 1)
      assert(TxnLog.writeAppend(spark, root, hi, "s", "hi") == 2)
      val liveBefore = TxnLog.stateAt(root, 2).live
      val hiFile = liveBefore.find(_.contains("hi")).get
      // the predicate's prunable conjunct (k <= 10) excludes the hi
      // file by its logged bounds — even though the OTHER conjunct is
      // unprunable, the conjunction's range still prunes
      assert(TxnLog.deletePredicate(spark, root,
        "k <= 10 AND pmod(k, 2) = 0", "s").contains(3))
      val st = TxnLog.stateAt(root, 3)
      assert(st.live.contains(hiFile),
        "hi file must survive UNREWRITTEN (pruned, not scanned)")
      assert(TxnLog.read(spark, root).count() == 95)
    }
  }

  test("deletePredicateDV publishes a vector for an OR predicate") {
    import spark.implicits._
    withScratch { root =>
      val df = (0L until 64L).map(k => (k, k * 1.0)).toDF("k", "v")
      assert(TxnLog.writeAppend(spark, root, df, "s", "t0") == 1)
      assert(TxnLog.deletePredicateDV(spark, root,
        "k < 2 OR k >= 62", "s").contains(2))
      val st = TxnLog.stateAt(root, 2)
      assert(st.dvs.nonEmpty, "partial match should vector, not rewrite")
      assert(TxnLog.read(spark, root).count() == 60)
    }
  }

  test("update: SET sees the PRE-update row, casts to the column " +
    "type, and only matching files rewrite") {
    import spark.implicits._
    withScratch { root =>
      val lo = (1L to 50L).map(k => (k, k * 1.0)).toDF("k", "v")
      val hi = (51L to 100L).map(k => (k, k * 1.0)).toDF("k", "v")
      assert(TxnLog.writeAppend(spark, root, lo, "s", "lo") == 1)
      assert(TxnLog.writeAppend(spark, root, hi, "s", "hi") == 2)
      val hiFile = TxnLog.stateAt(root, 2).live.find(_.contains("hi")).get
      // both assignments read the pre-update row: v = k*2 uses the
      // ORIGINAL k, not the reassigned one (and k+v casts to BIGINT)
      assert(TxnLog.update(spark, root,
        Seq("k" -> "k + 1000 + v - v", "v" -> "k * 2"),
        Some("k <= 3"), "s").contains(3))
      val r = TxnLog.read(spark, root)
      assert(r.count() == 100)
      // k=2 → (1002, 4.0); had v seen the new k it would be 2004.0
      assert(r.where(col("k") === 1002L).head().getDouble(1) == 4.0)
      // untouched rows keep their values; the hi file never rewrote
      assert(r.where(col("k") === 80L).head().getDouble(1) == 80.0)
      assert(TxnLog.stateAt(root, 3).live.contains(hiFile))
      // schema unchanged (UPDATE is not evolution)
      assert(TxnLog.schemaAt(root, 3).get.toDDL ==
        TxnLog.schemaAt(root, 2).get.toDDL)
      // no match → no-op; unknown target → loud
      assert(TxnLog.update(spark, root, Seq("v" -> "0.0"),
        Some("k > 10000"), "s").isEmpty)
      intercept[IllegalArgumentException] {
        TxnLog.update(spark, root, Seq("nope" -> "1"), None, "s")
      }
    }
  }

  test("update enforces CHECK constraints on the post-SET image") {
    import spark.implicits._
    withScratch { root =>
      val df = (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v")
      assert(TxnLog.writeAppend(spark, root, df, "s", "t0") == 1)
      assert(TxnLog.addConstraint(spark, root, "pos", "v > 0", "s") == 2)
      intercept[IllegalArgumentException] {
        TxnLog.update(spark, root, Seq("v" -> "-1.0"),
          Some("k = 1"), "s")
      }
      // the refused update committed nothing
      assert(TxnLog.latestVersion(root) == 2)
      // a compliant update lands
      assert(TxnLog.update(spark, root, Seq("v" -> "v + 1"),
        Some("k = 1"), "s").contains(3))
      assert(TxnLog.read(spark, root)
        .where(col("k") === 1L).head().getDouble(1) == 2.0)
    }
  }

  test("versionAsOfStrict: pre-birth timestamps fail loudly on every " +
    "timestamp face") {
    import spark.implicits._
    withScratch { root =>
      val df = (1L to 5L).map(k => (k, k * 1.0)).toDF("k", "v")
      assert(TxnLog.writeAppend(spark, root, df, "s", "t0") == 1)
      val e = intercept[IllegalArgumentException] {
        TxnLog.versionAsOfStrict(root, 0L)
      }
      assert(e.getMessage.contains("before the first resolvable commit"))
      intercept[IllegalArgumentException] {
        spark.read.format("graft-txn").option("path", root)
          .option("timestampAsOf", "0").load()
      }
      // at-or-after the first commit resolves normally
      assert(TxnLog.versionAsOfStrict(root,
        TxnLog.commitTs(root, 1)) == 1)
    }
  }

  test("widened schemas are always nullable: ADD COLUMNS refuses NOT " +
    "NULL, append evolution forces nullable (ADVICE r12)") {
    import spark.implicits._
    withScratch { root =>
      val df = (1L to 5L).map(k => (k, k * 1.0)).toDF("k", "v")
      assert(TxnLog.writeAppend(spark, root, df, "s", "t0") == 1)
      intercept[IllegalArgumentException] {
        TxnLog.addColumns(root, org.apache.spark.sql.types.StructType
          .fromDDL("w BIGINT NOT NULL"), "s")
      }
      // evolution by append: the new column arrives nullable even if
      // the appended frame declared it required
      assert(TxnLog.commitAppend(root, Seq.empty,
        "k BIGINT,v DOUBLE,w BIGINT NOT NULL", "s",
        evolve = true) == 2)
      val w = TxnLog.schemaAt(root, 2).get.fields.find(_.name == "w").get
      assert(w.nullable, "evolved column must be nullable — old files " +
        "null-pad it")
    }
  }

  test("checked INSERT reads its input exactly ONCE: CHECK rides the " +
    "staging scan (r13, VERDICT r12 #2)") {
    import spark.implicits._
    withScratch { root =>
      val seed = (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v")
      assert(TxnLog.writeAppend(spark, root, seed, "s", "t0") == 1)
      assert(TxnLog.addConstraint(spark, root, "pos", "v > 0", "s") == 2)
      val acc = spark.sparkContext.longAccumulator("graft_scan_census")
      val tick = udf { (k: Long) => acc.add(1); k }.asNondeterministic()
      val df = (1L to 100L).toDF("k")
        .select(tick(col("k")).as("k"), lit(1.0).as("v"))
      assert(TxnLog.writeAppend(spark, root, df, "s", "t1") == 3)
      assert(acc.value == 100L,
        s"input was scanned ${acc.value / 100.0} times — the CHECK " +
          "pass must be fused into the staging write")
      // the violation path still refuses BEFORE commit, names the
      // constraint, and cleans its staging
      val bad = (1L to 5L).map(k => (k, -1.0)).toDF("k", "v")
      val e = intercept[IllegalArgumentException](
        TxnLog.writeAppend(spark, root, bad, "s", "t2"))
      assert(e.getMessage.contains("pos") &&
        e.getMessage.contains("violates table constraints"),
        e.getMessage)
      assert(TxnLog.latestVersion(root) == 3, "refused write committed")
      assert(TxnLog.read(spark, root).count() == 110)
      // streaming batches share the fused path
      val e2 = intercept[IllegalArgumentException](
        TxnLog.writeStreamBatch(spark, root, bad, "app_r13", 0L, "s"))
      assert(e2.getMessage.contains("pos"), e2.getMessage)
    }
  }

  test("commit refuses when the constraint set drifted between " +
    "enforcement and the won slot (ADVICE r12)") {
    import spark.implicits._
    withScratch { root =>
      val seed = (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v")
      assert(TxnLog.writeAppend(spark, root, seed, "s", "t0") == 1)
      seed.coalesce(1).write.parquet(s"$root/late")
      assert(TxnLog.addConstraint(spark, root, "pos", "v > 0", "s") == 2)
      // a writer that enforced the EMPTY set must not land now
      val e = intercept[IllegalArgumentException](
        TxnLog.commitAppend(root, Seq("late"), "k BIGINT,v DOUBLE",
          "s", enforcedCons = Some(Map.empty)))
      assert(e.getMessage.contains("changed concurrently"), e.getMessage)
      // a DROPPED constraint only weakens the set: still commits
      assert(TxnLog.commitAppend(root, Seq("late"), "k BIGINT,v DOUBLE",
        "s", enforcedCons = Some(Map("pos" -> "v > 0",
          "gone" -> "k < 1000000"))) == 3)
    }
  }

  test("streaming SINK in Update mode: keyed upsert per batch — " +
    "changed keys replace, untouched keys stay, re-delivery is a no-op") {
    import spark.implicits._
    withScratch { root =>
      val tbl = s"$root/upd"
      implicit val sq: org.apache.spark.sql.classic.SQLContext =
        spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Long]
      val q = in.toDS().toDF("k")
        .groupBy((col("k") % 3).as("par")).agg(count(lit(1)).as("n"))
        .writeStream.format("graft-txnlog")
        .option("path", tbl).option("appId", "upd_spec")
        .option("mergeKey", "par")
        .option("checkpointLocation", s"$root/ck_upd")
        .outputMode("update")
        .start()
      try {
        in.addData(1L, 2L, 3L)
        q.processAllAvailable()
        // only par=1 changes (k=4): the update batch carries ONE key;
        // the other groups must survive the upsert untouched
        in.addData(4L)
        q.processAllAvailable()
      } finally q.stop()
      val tip = TxnLog.read(spark, tbl).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(tip == Map(0L -> 1L, 1L -> 2L, 2L -> 1L), tip.toString)
      // re-delivering a consumed batch is a one-lookup no-op
      val tipV = TxnLog.latestVersion(tbl)
      val consumed = TxnLog.stateAt(tbl, tipV).txns("upd_spec")
      assert(TxnLog.writeStreamBatchUpdate(spark, tbl,
        Seq((1L, 99L)).toDF("par", "n"), "par", "upd_spec", consumed,
        "s").isEmpty)
      assert(TxnLog.latestVersion(tbl) == tipV)
      // an empty batch commits just the watermark
      assert(TxnLog.writeStreamBatchUpdate(spark, tbl,
        Seq.empty[(Long, Long)].toDF("par", "n"), "par", "upd_spec",
        consumed + 1, "s").contains(tipV + 1))
      assert(TxnLog.read(spark, tbl).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap == tip)
    }
  }

  test("composite-key MERGE: rows match on the whole key tuple; the " +
    "SQL face takes ON (k1, k2)") {
    import spark.implicits._
    withScratch { root =>
      // (region, id) composite key: same id exists in two regions
      val df = Seq(("eu", 1L, 10.0), ("eu", 2L, 20.0),
        ("us", 1L, 30.0), ("us", 2L, 40.0)).toDF("region", "id", "v")
      assert(TxnLog.writeAppend(spark, root, df, "s", "t0") == 1)
      // update (eu,1), insert (ap,9) — (us,1) shares id but must stay
      val src = Seq(("eu", 1L, 11.0), ("ap", 9L, 90.0))
        .toDF("region", "id", "v")
      assert(TxnLog.mergeClausesKeys(spark, root, src,
        Seq("region", "id"), "m",
        updateWhen = Some(lit(true)), deleteWhen = None).contains(2))
      val r = TxnLog.read(spark, root).collect()
        .map(x => (x.getString(0), x.getLong(1)) -> x.getDouble(2)).toMap
      assert(r == Map(("eu", 1L) -> 11.0, ("eu", 2L) -> 20.0,
        ("us", 1L) -> 30.0, ("us", 2L) -> 40.0, ("ap", 9L) -> 90.0), r)
      // duplicate TUPLES refuse; duplicate single columns are fine
      intercept[IllegalArgumentException] {
        TxnLog.mergeClausesKeys(spark, root,
          Seq(("eu", 1L, 1.0), ("eu", 1L, 2.0)).toDF("region", "id", "v"),
          Seq("region", "id"), "m2",
          updateWhen = Some(lit(true)), deleteWhen = None)
      }
      // SQL face: ON (region, id)
      Seq(("us", 2L, 44.0)).toDF("region", "id", "v")
        .createOrReplaceTempView("r13_mk_src")
      assert(spark.sql(s"GRAFT MERGE INTO '$root' USING r13_mk_src " +
        "ON (region, id)").head().getInt(0) == 3)
      assert(TxnLog.read(spark, root)
        .where(col("region") === "us" && col("id") === 2L)
        .head().getDouble(2) == 44.0)
    }
  }

  test("update/deletePredicate abort cleanly on a true conflict: a " +
    "concurrently-removed touched file returns None, no partial state") {
    import spark.implicits._
    withScratch { root =>
      val df = (1L to 20L).map(k => (k, k * 1.0)).toDF("k", "v")
      assert(TxnLog.writeAppend(spark, root, df, "s", "t0") == 1)
      val f0 = TxnLog.liveFiles(root, 1).head
      // interleave a remove of the file the update is rewriting
      val r = TxnLog.update(spark, root, Seq("v" -> "v + 1"),
        Some("k <= 5"), "s",
        beforeCommit = () =>
          assert(TxnLog.commitNext(root,
            Seq(TxnLog.remove(f0)), "c") == 2))
      assert(r.isEmpty, "update must abort on a removed touched file")
      val st = TxnLog.stateAt(root, TxnLog.latestVersion(root))
      assert(TxnLog.latestVersion(root) == 2)
      assert(!st.live.exists(_.startsWith("up")),
        s"aborted update leaked an output into the live set: ${st.live}")
      // same contract on the general-predicate delete
      withScratch { root2 =>
        assert(TxnLog.writeAppend(spark, root2, df, "s", "t0") == 1)
        val g0 = TxnLog.liveFiles(root2, 1).head
        val d = TxnLog.deletePredicate(spark, root2, "k <= 5 OR k = 9",
          "s", beforeCommit = () =>
            assert(TxnLog.commitNext(root2,
              Seq(TxnLog.remove(g0)), "c") == 2))
        assert(d.isEmpty, "delete must abort on a removed touched file")
        assert(TxnLog.latestVersion(root2) == 2)
      }
    }
  }

  test("zFormulaN(x, y) is bit-identical to the historic 2-D zFormula") {
    val qx = "CAST(173 AS BIGINT)"
    val qy = "CAST(41 AS BIGINT)"
    val two = graft.operators.Maintenance.zFormula(qx, qy, "DIV")
    val n = graft.operators.Maintenance.zFormulaN(Seq(qx, qy), "DIV")
    val r = spark.sql(s"SELECT ($two) AS a, ($n) AS b").head()
    assert(r.getLong(0) == r.getLong(1))
  }
}
