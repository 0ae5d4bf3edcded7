package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxnLog

/** Round-14 txn-log surface (the ADVICE r13 closures): loud
  * conflict-aborts on every SQL-face DML verb, constraint-drift
  * re-checks inside rewrite commits, the pushdown-pinned CHECK guard,
  * REPLACE WHERE's schema contract, session-timezone TIMESTAMP
  * literals, and the one-pass checked UPDATE. */
class TxnLogR14Spec extends AnyFunSuite with SparkSpec {

  private def withScratch(body: String => Unit): Unit = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_r14_").toString
    try body(root)
    finally graft.core.Fixtures.deleteRecursively(new java.io.File(root))
  }

  test("SQL-face DML throws ConcurrentModificationException on a " +
    "lost write conflict instead of reporting no-op success " +
    "(ADVICE r13 high)") {
    import spark.implicits._
    val df = (1L to 20L).map(k => (k, k * 1.0)).toDF("k", "v")
    // strict UPDATE: a concurrently-removed touched file is LOUD
    withScratch { root =>
      assert(TxnLog.writeAppend(spark, root, df, "s", "t0") == 1)
      val f0 = TxnLog.liveFiles(root, 1).head
      val e = intercept[java.util.ConcurrentModificationException] {
        TxnLog.update(spark, root, Seq("v" -> "v + 1"), Some("k <= 5"),
          "s", strictConflict = true,
          beforeCommit = () =>
            assert(TxnLog.commitNext(root,
              Seq(TxnLog.remove(f0)), "c") == 2))
      }
      assert(e.getMessage.contains("UPDATE") &&
        e.getMessage.contains("conflict"), e.getMessage)
      // nothing half-landed
      val st = TxnLog.stateAt(root, TxnLog.latestVersion(root))
      assert(TxnLog.latestVersion(root) == 2)
      assert(!st.live.exists(_.startsWith("up")), st.live.toString)
    }
    // strict DELETE (the native SQL seam's posture)
    withScratch { root =>
      assert(TxnLog.writeAppend(spark, root, df, "s", "t0") == 1)
      val f0 = TxnLog.liveFiles(root, 1).head
      val e = intercept[java.util.ConcurrentModificationException] {
        TxnLog.deletePredicate(spark, root, "k <= 5", "s",
          strictConflict = true,
          beforeCommit = () =>
            assert(TxnLog.commitNext(root,
              Seq(TxnLog.remove(f0)), "c") == 2))
      }
      assert(e.getMessage.contains("DELETE"), e.getMessage)
    }
    // strict REPLACE WHERE (the V1Write seam's posture)
    withScratch { root =>
      assert(TxnLog.writeAppend(spark, root, df, "s", "t0") == 1)
      val f0 = TxnLog.liveFiles(root, 1).head
      val repl = Seq((3L, 33.0)).toDF("k", "v")
      val e = intercept[java.util.ConcurrentModificationException] {
        TxnLog.writeReplaceWhere(spark, root, repl,
          Array(org.apache.spark.sql.sources.EqualTo("k", 3L)),
          "s", "rw0", strictConflict = true,
          beforeCommit = () =>
            assert(TxnLog.commitNext(root,
              Seq(TxnLog.remove(f0)), "c") == 2))
      }
      assert(e.getMessage.contains("REPLACE WHERE"), e.getMessage)
      // the LENIENT Scala-API contract is unchanged: same race,
      // default flags, clean None
      assert(TxnLog.deletePredicate(spark, root, "k = 999", "s").isEmpty)
    }
  }

  test("concurrent constraint drift aborts rewrite-path writers that " +
    "land new rows: UPDATE and MERGE re-check at the commit tip " +
    "(ADVICE r13 medium)") {
    import spark.implicits._
    val df = (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v")
    withScratch { root =>
      assert(TxnLog.writeAppend(spark, root, df, "s", "t0") == 1)
      val e = intercept[IllegalArgumentException] {
        TxnLog.update(spark, root, Seq("v" -> "v + 1"), Some("k <= 5"),
          "s", beforeCommit = () =>
            assert(TxnLog.addConstraint(spark, root, "vcap",
              "v < 100", "c") == 2))
      }
      assert(e.getMessage.contains("constraints changed concurrently"),
        e.getMessage)
      // aborted cleanly: constraint commit stands, no update output
      val st = TxnLog.stateAt(root, TxnLog.latestVersion(root))
      assert(TxnLog.latestVersion(root) == 2)
      assert(!st.live.exists(_.startsWith("up")), st.live.toString)
    }
    withScratch { root =>
      assert(TxnLog.writeAppend(spark, root, df, "s", "t0") == 1)
      val src = Seq((1L, 11.0), (99L, 99.0)).toDF("k", "v")
      val e = intercept[IllegalArgumentException] {
        TxnLog.mergeUpsert(spark, root, src, "k", "m",
          beforeCommit = () =>
            assert(TxnLog.addConstraint(spark, root, "vcap",
              "v < 1000", "c") == 2))
      }
      assert(e.getMessage.contains("constraints changed concurrently"),
        e.getMessage)
      assert(TxnLog.latestVersion(root) == 2)
      assert(TxnLog.read(spark, root).count() == 10, "merge half-landed")
    }
  }

  test("the CHECK guard is pinned above the caller's plan: an INSERT " +
    "whose own join excludes the violating rows is NOT aborted " +
    "(ADVICE r13 medium)") {
    import spark.implicits._
    withScratch { root =>
      val seed = (1L to 5L).map(k => (k, k * 1.0)).toDF("k", "v")
      assert(TxnLog.writeAppend(spark, root, seed, "s", "t0") == 1)
      assert(TxnLog.addConstraint(spark, root, "pos", "v > 0", "s") == 2)
      // raw holds a VIOLATING row (k=99, v=-1); the join with good
      // keys excludes it. A pushable guard would relocate below the
      // join (it references only constraint columns) and raise on the
      // excluded row — the barrier pins it above the join.
      val raw = ((6L to 10L).map(k => (k, k * 1.0)) :+ ((99L, -1.0)))
        .toDF("k", "v")
      val good = (6L to 10L).toDF("k")
      val input = raw.join(good, "k")
      assert(TxnLog.writeAppend(spark, root, input, "s", "t1") == 3)
      assert(TxnLog.read(spark, root).count() == 10)
      // and the violation path still refuses when the row WOULD land
      val e = intercept[IllegalArgumentException](
        TxnLog.writeAppend(spark, root, raw, "s", "t2"))
      assert(e.getMessage.contains("pos"), e.getMessage)
      assert(TxnLog.latestVersion(root) == 3)
    }
  }

  test("REPLACE WHERE resolves the write schema like every other " +
    "writer: a retyped column is refused before any commit " +
    "(ADVICE r13 medium)") {
    import spark.implicits._
    withScratch { root =>
      val seed = (1L to 5L).map(k => (k, k * 1.0)).toDF("k", "v")
      assert(TxnLog.writeAppend(spark, root, seed, "s", "t0") == 1)
      val badType = Seq((3L, "not-a-double")).toDF("k", "v")
      val e = intercept[IllegalArgumentException] {
        TxnLog.writeReplaceWhere(spark, root, badType,
          Array(org.apache.spark.sql.sources.EqualTo("k", 3L)),
          "s", "rw1")
      }
      assert(e.getMessage.contains("incompatible"), e.getMessage)
      // a NEW column is evolution — refused too (evolve is explicit)
      val extra = Seq((3L, 3.0, "x")).toDF("k", "v", "w")
      val e2 = intercept[IllegalArgumentException] {
        TxnLog.writeReplaceWhere(spark, root, extra,
          Array(org.apache.spark.sql.sources.EqualTo("k", 3L)),
          "s", "rw2")
      }
      assert(e2.getMessage.contains("evolve"), e2.getMessage)
      assert(TxnLog.latestVersion(root) == 1, "refused write committed")
      assert(TxnLog.read(spark, root).count() == 5)
    }
  }

  test("GRAFT CHANGES ... TIMESTAMP resolves the literal under the " +
    "SPARK SESSION timezone, not the JVM default (ADVICE r13 low)") {
    import spark.implicits._
    withScratch { root =>
      assert(TxnLog.writeAppend(spark, root,
        Seq((1L, 1.0)).toDF("k", "v"), "s", "t0") == 1)
      Thread.sleep(5)
      assert(TxnLog.writeAppend(spark, root,
        Seq((2L, 2.0)).toDF("k", "v"), "s", "t1") == 2)
      val t2 = TxnLog.commitTs(root, 2)
      // render t2 in a session TZ far from the JVM default (tests run
      // with JVM/UTC): a JVM-default parse of this literal would be
      // off by +05:30 and resolve the range to the wrong versions
      val zone = "Asia/Kolkata"
      val lit = java.time.Instant.ofEpochMilli(t2)
        .atZone(java.time.ZoneId.of(zone))
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      val prev = spark.conf.get("spark.sql.session.timeZone")
      spark.conf.set("spark.sql.session.timeZone", zone)
      try {
        val changes = spark.sql(
          s"GRAFT CHANGES '$root' FROM TIMESTAMP '$lit'").collect()
        // FROM ts = every change committed AT or after ts: exactly v2
        assert(changes.length == 1, changes.mkString(";"))
        assert(changes.head.getAs[Long]("k") == 2L)
      } finally spark.conf.set("spark.sql.session.timeZone", prev)
    }
  }

  test("generalized merge (r14, VERDICT r13 #2): nmbs delete precedes " +
    "nmbs update; empty-source snapshot sync deletes everything; " +
    "subset SET casts to the declared type") {
    import spark.implicits._
    val df = (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v")
    // delete-over-update precedence on the not-matched-by-source side
    withScratch { root =>
      assert(TxnLog.writeAppend(spark, root, df, "s", "t0") == 1)
      val src = Seq((1L, 11.0)).toDF("k", "v")
      assert(TxnLog.mergeClausesKeys(spark, root, src, Seq("k"), "m",
        updateWhen = Some(lit(true)), deleteWhen = None,
        insertUnmatched = false,
        nmbsDelete = Some(col("k") > 8),
        nmbsUpdate = Some((lit(true),
          Seq("v" -> "v + 100")))).contains(2))
      val r = TxnLog.read(spark, root).collect()
        .map(x => x.getLong(0) -> x.getDouble(1)).toMap
      // 1 matched-updated (full row), 9..10 deleted (NOT +100'd),
      // 2..8 nmbs-updated
      assert(r == ((2L to 8L).map(k => k -> (k + 100.0)).toMap +
        (1L -> 11.0)), r.toString)
    }
    // an EMPTY snapshot legitimately deletes everything — and every
    // file is a PURE REMOVE (metadata only)
    withScratch { root =>
      assert(TxnLog.writeAppend(spark, root, df, "s", "t0") == 1)
      val empty = df.limit(0)
      assert(TxnLog.mergeClausesKeys(spark, root, empty, Seq("k"), "m",
        updateWhen = Some(lit(true)), deleteWhen = None,
        nmbsDelete = Some(lit(true))).contains(2))
      assert(TxnLog.read(spark, root).count() == 0)
      val added = TxnLog.actionsAt(root, 2)
        .collect { case TxnLog.Action("add", f) => f }
      assert(added.isEmpty, s"empty-source sync rewrote files: $added")
    }
    // subset SET casts to the column's declared type (UPDATE posture:
    // MERGE is not schema evolution)
    withScratch { root =>
      assert(TxnLog.writeAppend(spark, root, df, "s", "t0") == 1)
      val src = Seq((3L, 0.0)).toDF("k", "v")
      assert(TxnLog.mergeClausesKeys(spark, root, src, Seq("k"), "m",
        updateWhen = Some(lit(true)), deleteWhen = None,
        updateSet = Some(Seq("v" -> "7"))).contains(2))
      assert(TxnLog.read(spark, root).where(col("k") === 3)
        .head().getDouble(1) == 7.0)
    }
  }

  test("subquery predicates in DELETE/UPDATE (r14, VERDICT r13 #3): " +
    "IN materializes once, three-valued semantics, correlated refused") {
    import spark.implicits._
    val df = ((1L to 20L).map(k => (Some(k), k * 1.0)) :+
      ((Option.empty[Long], -1.0))).toDF("k", "v")
    Seq(2L, 4L, 6L).toDF("kk").createOrReplaceTempView("r14_keys")
    // DELETE ... WHERE k IN (SELECT ...) — exact, null row survives
    withScratch { root =>
      assert(TxnLog.writeAppend(spark, root, df, "s", "t0") == 1)
      assert(TxnLog.deletePredicate(spark, root,
        "k IN (SELECT kk FROM r14_keys)", "s").contains(2))
      val r = TxnLog.read(spark, root)
      assert(r.count() == 18 && r.where(col("k").isNull).count() == 1)
      // composed with other conjuncts; residual bounds still exact
      assert(TxnLog.deletePredicate(spark, root,
        "k IN (SELECT kk + 6 FROM r14_keys) AND k >= 10", "s")
        .contains(3))
      assert(TxnLog.read(spark, root).count() == 16) // 10, 12 gone
      // NOT IN over a null-bearing set never fires (SQL's trap)
      spark.sql("SELECT CAST(NULL AS BIGINT) AS kk UNION ALL " +
        "SELECT CAST(1 AS BIGINT)")
        .createOrReplaceTempView("r14_nullkeys")
      assert(TxnLog.deletePredicate(spark, root,
        "k NOT IN (SELECT kk FROM r14_nullkeys)", "s").isEmpty)
      assert(TxnLog.read(spark, root).count() == 16)
    }
    // UPDATE ... WHERE k IN (SELECT ...) through the GRAFT SQL face
    withScratch { root =>
      assert(TxnLog.writeAppend(spark, root, df, "s", "t0") == 1)
      assert(spark.sql(s"GRAFT UPDATE '$root' SET v = v * 100 " +
        "WHERE k IN (SELECT kk FROM r14_keys)").head().getInt(0) == 2)
      val r = TxnLog.read(spark, root).collect()
        .map(x => Option(x.get(0)).map(_.asInstanceOf[Long]) ->
          x.getDouble(1)).toMap
      assert(r(Some(2L)) == 200.0 && r(Some(4L)) == 400.0 &&
        r(Some(6L)) == 600.0 && r(Some(3L)) == 3.0, r.toString)
      // non-equality-correlated EXISTS / scalar refused loudly,
      // nothing commits (r15 narrowed the refusal: uncorrelated and
      // equality-correlated EXISTS are now supported — TxnLogR15Spec)
      intercept[UnsupportedOperationException] {
        TxnLog.deletePredicate(spark, root,
          "EXISTS (SELECT 1 FROM r14_keys WHERE kk > v)", "s")
      }
      intercept[UnsupportedOperationException] {
        TxnLog.deletePredicate(spark, root,
          "v > (SELECT MAX(kk) FROM r14_keys)", "s")
      }
      assert(TxnLog.latestVersion(root) == 2)
    }
  }

  test("schema evolution through MERGE and the streaming sink " +
    "(r14, VERDICT r13 #6)") {
    import spark.implicits._
    // MERGE WITH SCHEMA EVOLUTION: the ADD-COLUMN case widens
    // ATOMICALLY inside the merge's own commit (r15 — ADVICE r14
    // medium; the widening used to pre-commit and could strand a
    // failed statement's DDL); old rows null-pad, source rows land
    // whole
    withScratch { root =>
      val df = (1L to 5L).map(k => (k, k * 1.0)).toDF("k", "v")
      assert(TxnLog.writeAppend(spark, root, df, "s", "t0") == 1)
      val src = Seq((1L, 11.0, "a"), (9L, 99.0, "z"))
        .toDF("k", "v", "tag")
      // without evolution: refused loudly
      val e = intercept[Exception](TxnLog.mergeClausesKeys(spark, root,
        src, Seq("k"), "m", updateWhen = Some(lit(true)),
        deleteWhen = None))
      assert(e.getMessage.contains("tag") ||
        e.getMessage.contains("evolve"), e.getMessage)
      // with evolution: widened nullable column, upsert lands — in
      // ONE commit (v2), no leading metadata version
      assert(TxnLog.mergeClausesKeys(spark, root, src, Seq("k"), "m",
        updateWhen = Some(lit(true)), deleteWhen = None,
        evolveSchema = true).contains(2))
      val st = TxnLog.stateAt(root, TxnLog.latestVersion(root))
      val sch = org.apache.spark.sql.types.StructType
        .fromDDL(st.schemaDdl.get)
      assert(sch.fieldNames.contains("tag") && sch("tag").nullable)
      val r = TxnLog.read(spark, root).collect()
        .map(x => x.getLong(0) -> (x.getDouble(1), Option(x.getString(2))))
        .toMap
      assert(r(1L) == ((11.0, Some("a"))) && r(9L) == ((99.0, Some("z"))))
      assert(r(3L) == ((3.0, None)), "old rows must null-pad")
      // GRAFT SQL face
      Seq((2L, 22.0, "b", true)).toDF("k", "v", "tag", "fresh")
        .createOrReplaceTempView("r14_evo_src")
      assert(spark.sql(s"GRAFT MERGE INTO '$root' USING r14_evo_src " +
        "ON k WITH SCHEMA EVOLUTION").head().getInt(0) > 0)
      assert(TxnLog.read(spark, root).where(col("k") === 2L)
        .head().getBoolean(3))
    }
    // streaming sink: a restarted stream with a WIDENED upstream
    // schema keeps writing under option("evolve", "true")
    withScratch { root =>
      val in = s"$root/in"; val tbl = s"$root/tbl"; val ck = s"$root/ck"
      def pass(ddl: String): Unit = {
        val q = spark.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL(ddl))
          .parquet(in)
          .writeStream.format("graft-txnlog")
          .option("path", tbl).option("appId", "evo_sink")
          .option("evolve", "true")
          .option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      (1L to 5L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(in)
      pass("k BIGINT, v DOUBLE")
      assert(TxnLog.read(spark, tbl).count() == 5)
      // upstream widened: restart with the new schema
      Seq((6L, 6.0, "x")).toDF("k", "v", "tag")
        .coalesce(1).write.mode("append").parquet(s"$root/in2")
      new java.io.File(s"$root/in2").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          new java.io.File(in, f.getName).toPath))
      pass("k BIGINT, v DOUBLE, tag STRING")
      val sch = org.apache.spark.sql.types.StructType.fromDDL(
        TxnLog.stateAt(tbl, TxnLog.latestVersion(tbl)).schemaDdl.get)
      assert(sch.fieldNames.contains("tag") && sch("tag").nullable,
        sch.toDDL)
      val r = TxnLog.read(spark, tbl)
      assert(r.count() == 6)
      assert(r.where(col("k") === 6L).head().getString(2) == "x")
      assert(r.where(col("k") === 1L).head().get(2) == null,
        "pre-evolution rows must null-pad")
      // a RETYPED column still refuses even under evolve
      val e = intercept[Exception](TxnLog.writeStreamBatch(spark, tbl,
        Seq(("s", 1.0, "t")).toDF("k", "v", "tag"), "evo_sink", 999L,
        "s", evolve = true))
      assert(e.getMessage.contains("incompatible append"), e.getMessage)
    }
  }

  test("artifact/codes logs (r14, VERDICT r13 #1): growth-policy " +
    "retrain, CDF-incremental encode, delete fallback, zero-job no-ops") {
    import spark.implicits._
    import graft.llm.Similarity
    withScratch { root =>
      val corpus = s"$root/corpus"
      val art = s"$root/art"
      val codes = s"$root/codes"
      def vecs(lo: Long, hi: Long) =
        (lo until hi).map(k => (k, k * 2.0)).toDF("vec_id", "x")
      assert(TxnLog.writeAppend(spark, corpus, vecs(0, 100), "s",
        "t0") == 1)
      val trains = spark.sparkContext.longAccumulator("r14_trains")
      def train(df: org.apache.spark.sql.DataFrame) = {
        trains.add(1)
        df.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"))
      }
      // backfill trains
      val a1 = Similarity.advanceArtifactLog(spark, corpus, art,
        "app", train)
      assert(a1.retrained && a1.committed.contains(1) &&
        trains.value == 1, a1)
      // small growth (under 2x): watermark-only, ZERO training jobs
      assert(TxnLog.writeAppend(spark, corpus, vecs(100, 150), "s",
        "t1") == 2)
      val a2 = Similarity.advanceArtifactLog(spark, corpus, art,
        "app", train)
      assert(!a2.retrained && a2.committed.isDefined &&
        trains.value == 1, a2)
      // crossing 2x the consumed count: retrains
      assert(TxnLog.writeAppend(spark, corpus, vecs(150, 400), "s",
        "t2") == 3)
      val a3 = Similarity.advanceArtifactLog(spark, corpus, art,
        "app", train)
      assert(a3.retrained && trains.value == 2, a3)
      assert(TxnLog.read(spark, art).head().getLong(0) == 400)
      // up to date: zero-commit no-op
      assert(Similarity.advanceArtifactLog(spark, corpus, art,
        "app", train) ==
        Similarity.ArtifactAdvance(None, retrained = false))

      // CODES log: backfill, increment-encodes-only-itself, delete
      // fallback, watermark on NoDataChange, no-op
      val encodes = spark.sparkContext.longAccumulator("r14_encodes")
      spark.udf.register("r14_enc",
        udf { (k: Long) => encodes.add(1); k * 10 }.asNondeterministic())
      def encode(df: org.apache.spark.sql.DataFrame) =
        df.select(col("vec_id"), expr("r14_enc(vec_id)").as("code"))
      val c1 = Similarity.advanceCodesLog(spark, corpus, codes, "c",
        encode)
      assert(c1.mode == "backfill" && c1.encodedRows == 400 &&
        encodes.value == 400, c1)
      // increment: encode job touches ONLY the new rows
      assert(TxnLog.writeAppend(spark, corpus, vecs(400, 420), "s",
        "t3") == 4)
      val c2 = Similarity.advanceCodesLog(spark, corpus, codes, "c",
        encode)
      assert(c2.mode == "increment" && c2.encodedRows == 20 &&
        encodes.value == 420, c2)
      assert(TxnLog.read(spark, codes).count() == 420)
      // a NoDataChange re-layout advances watermark-only, zero encodes
      assert(TxnLog.compact(spark, corpus, "s").contains(5))
      val c3 = Similarity.advanceCodesLog(spark, corpus, codes, "c",
        encode)
      assert(c3.mode == "watermark" && encodes.value == 420, c3)
      // a DELETE falls back to an honest full re-encode
      assert(TxnLog.deletePredicate(spark, corpus, "vec_id >= 410",
        "s").contains(6))
      val c4 = Similarity.advanceCodesLog(spark, corpus, codes, "c",
        encode)
      assert(c4.mode == "reencode" && c4.encodedRows == 410, c4)
      assert(TxnLog.read(spark, codes).count() == 410)
      // up to date: no-op
      assert(Similarity.advanceCodesLog(spark, corpus, codes, "c",
        encode).mode == "noop")
    }
  }

  test("scaledWedgeCap (r14, VERDICT r13 #5): inert at every gate " +
    "scale, samples beyond it, floors at 16") {
    import graft.operators.Graph
    // measured gate-scale edge counts: sf0.01 = 7 249, sf0.1 = 74 829
    assert(Graph.scaledWedgeCap(0) == 64)
    assert(Graph.scaledWedgeCap(100) == 64)
    assert(Graph.scaledWedgeCap(7249) == 64)
    assert(Graph.scaledWedgeCap(74829) == 64, "cap must stay inert at sf0.1")
    assert(Graph.scaledWedgeCap(748290) < 64, "x10 must start sampling")
    assert(Graph.scaledWedgeCap(748290) >= 16)
    assert(Graph.scaledWedgeCap(Long.MaxValue / 4) == 16, "floor")
  }

  test("checked UPDATE computes the SET image exactly ONCE per row: " +
    "CHECK rides the rewrite projection (VERDICT r13 #4)") {
    import spark.implicits._
    withScratch { root =>
      val df = (1L to 500L).map(k => (k, k * 1.0)).toDF("k", "v")
      assert(TxnLog.writeAppend(spark, root, df, "s", "t0") == 1)
      assert(TxnLog.addConstraint(spark, root, "pos", "v > 0", "s") == 2)
      val acc = spark.sparkContext.longAccumulator("graft_set_census")
      spark.udf.register("graft_r14_tick",
        udf { (k: Long) => acc.add(1); k }.asNondeterministic())
      assert(TxnLog.update(spark, root,
        Seq("v" -> "CAST(graft_r14_tick(k) AS DOUBLE)"), None,
        "s").contains(3))
      assert(acc.value == 500L,
        s"SET image computed ${acc.value / 500.0} times per row — " +
          "the CHECK pass must be fused into the rewrite")
      assert(TxnLog.read(spark, root).agg(sum("v")).head().getDouble(0)
        == (1L to 500L).sum.toDouble)
      // the violation path refuses before commit and cleans staging
      val e = intercept[IllegalArgumentException](
        TxnLog.update(spark, root, Seq("v" -> "-v"), Some("k <= 3"), "s"))
      assert(e.getMessage.contains("pos") &&
        e.getMessage.contains("violates table constraints"),
        e.getMessage)
      assert(TxnLog.latestVersion(root) == 3, "refused update committed")
      val st = TxnLog.stateAt(root, 3)
      assert(!st.live.exists(_.startsWith("up4")), st.live.toString)
    }
  }
}
