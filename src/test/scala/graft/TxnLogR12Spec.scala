package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{LocalLogStore, TxnLog, TxnLogOps, TxnTableRelation}

/** Round-12 txn-log contracts: the re-layout marker and its CDF /
  * streaming short-circuits, the feature-triggered protocol raise,
  * canonical pushdown-value rendering (the ADVICE r11 high —
  * timestamp pruning must never lose rows), backquoted constraint
  * references, written-rows-only MERGE constraint enforcement, and
  * RESTORE rolling pruning metadata back with content. */
class TxnLogR12Spec extends AnyFunSuite with SparkSpec {

  private def withScratch(body: String => Unit): Unit = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_r12_").toString
    try body(root)
    finally graft.core.Fixtures.deleteRecursively(new java.io.File(root))
  }

  // ------------------------------------------ re-layout marker + CDF

  test("OPTIMIZE flags noDataChange; a re-layout-only CDF range plans " +
    "zero data scan") {
    import spark.implicits._
    withScratch { root =>
      Seq((1L, "a"), (2L, "b")).toDF("k", "t")
        .coalesce(1).write.parquet(s"$root/f0")
      Seq((3L, "c")).toDF("k", "t")
        .coalesce(1).write.parquet(s"$root/f1")
      assert(TxnLog.commitAppend(root, Seq("f0"), "k BIGINT,t STRING",
        "s") == 1)
      assert(TxnLog.commitAppend(root, Seq("f1"), "k BIGINT,t STRING",
        "s") == 2)
      assert(TxnLog.compact(spark, root, "opt").contains(3))
      assert(TxnLog.entriesAt(root, 3).contains(TxnLog.NoDataChange),
        "compact must flag its commit as a re-layout")
      // the OPTIMIZE-only range emits nothing AND plans nothing: the
      // short-circuit happens on the marker, before any file is named
      val onlyOpt = TxnLog.readChanges(spark, root, 2, 3)
      assert(onlyOpt.count() == 0)
      val leaves = onlyOpt.queryExecution.optimizedPlan.collectLeaves()
      assert(!leaves.exists(_.toString.contains(root)),
        s"re-layout CDF range still scans table files:\n$leaves")
      // the full range still carries v1+v2's inserts exactly
      val all = TxnLog.readChanges(spark, root, 0)
        .groupBy(col("_commit_version")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(all == Map(1 -> 2L, 2 -> 1L), s"unexpected feed: $all")
    }
  }

  test("ZORDER flags noDataChange; the streaming append tail skips " +
    "re-layout commits instead of failing") {
    import spark.implicits._
    withScratch { root =>
      (0L until 64L).map(k => (k, (k * 7) % 64, k % 13))
        .toDF("x", "y", "v")
        .coalesce(1).write.parquet(s"$root/f0")
      assert(TxnLog.commitAppend(root, Seq("f0"),
        "x BIGINT,y BIGINT,v BIGINT", "s") == 1)
      assert(TxnLog.compactZorder(spark, root, Seq("x", "y"), "z",
        zBuckets = 4).contains(2))
      assert(TxnLog.entriesAt(root, 2).contains(TxnLog.NoDataChange))
      // append-mode stream across the zorder version: no loud
      // failure, no re-delivery — the marker says bytes moved, not
      // content (pre-marker this threw unless ignoreChanges)
      val q = spark.readStream.format("graft-txnlog")
        .option("path", root).option("startingVersion", "1")
        .load()
        .writeStream.format("memory").queryName("r12_tail")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(spark.sql("SELECT COUNT(*) FROM r12_tail").head().getLong(0)
        == 0L, "re-layout commit must deliver no appended rows")
    }
  }

  test("zorder output stats come from one staged agg and still prune") {
    import spark.implicits._
    withScratch { root =>
      (0L until 256L).map(k => (k, (k * 11) % 256)).toDF("x", "y")
        .coalesce(1).write.parquet(s"$root/f0")
      assert(TxnLog.commitAppend(root, Seq("f0"), "x BIGINT,y BIGINT",
        "s") == 1)
      // count the Spark jobs the rewrite runs (status tracker over a
      // job group — the single-group rewrite stays on this thread):
      // the per-cell stats loop used to cost one job per output cell
      val sc = spark.sparkContext
      sc.setJobGroup("r12_zorder", "zorder job census")
      try assert(TxnLog.compactZorder(spark, root, Seq("x", "y"), "z",
        zBuckets = 16).contains(2))
      finally sc.clearJobGroup()
      val jobs = sc.statusTracker.getJobIdsForGroup("r12_zorder").length
      // bounds agg + staging write + one stats agg + small fixed
      // overhead — NOT one job per cell (16 cells; pre-fix this was
      // ≥ 16 stats jobs on top)
      assert(jobs <= 8, s"zorder ran $jobs jobs for 16 cells")
      // every output cell still publishes bounds for both z columns
      val st = TxnLog.stateAt(root, 2)
      assert(st.live.size > 1)
      st.live.foreach { f =>
        val cols = st.stats.getOrElse(f, Seq.empty).map(_.col).toSet
        assert(cols == Set("x", "y"), s"$f published $cols")
      }
      // and the 2-D box prune works off them
      val (scanned, pruned) = TxnLog.pruneWhere(root, 2, Seq.empty,
        Seq(("x", "0", "31"), ("y", "0", "31")))
      assert(pruned.nonEmpty, "zorder stats pruned nothing")
      assert(scanned.nonEmpty)
    }
  }

  // ------------------------------------ feature-triggered protocol

  test("first v2 action auto-raises a (1,1) table to (2,2); the old " +
    "engine hits the protocol gate, not a parse error") {
    import spark.implicits._
    withScratch { root =>
      Seq((1L, 10.0)).toDF("k", "v").coalesce(1).write.parquet(s"$root/f0")
      assert(TxnLog.commitAppend(root, Seq("f0"), "k BIGINT,v DOUBLE",
        "s") == 1)
      assert(TxnLog.stateAt(root, 1).protocol == ((1, 1)))
      assert(TxnLog.addConstraint(spark, root, "pos", "v > 0", "s") == 2)
      assert(TxnLog.stateAt(root, 2).protocol == ((2, 2)),
        "constraint write did not raise the protocol")
      val old = new TxnLogOps(LocalLogStore) {
        override protected def supportedReader: Int = 1
        override protected def supportedWriter: Int = 1
      }
      val e = intercept[IllegalArgumentException](old.read(spark, root))
      assert(e.getMessage.contains("requires reader version 2"),
        e.getMessage)
      val w = intercept[IllegalArgumentException](
        old.commitNext(root, Seq(TxnLog.add("ghost")), "old"))
      assert(w.getMessage.contains("requires writer version 2"),
        w.getMessage)
    }
  }

  test("a plain OPTIMIZE does NOT raise the protocol: the re-layout " +
    "marker is advisory and v1 readers keep the table") {
    import spark.implicits._
    withScratch { root =>
      for (i <- 0 until 2)
        Seq((i.toLong, i * 1.0)).toDF("k", "v")
          .coalesce(1).write.parquet(s"$root/f$i")
      assert(TxnLog.commitNext(root,
        Seq(TxnLog.add("f0"), TxnLog.add("f1")), "s") == 1)
      assert(TxnLog.compact(spark, root, "opt").contains(2))
      assert(TxnLog.entriesAt(root, 2).contains(TxnLog.NoDataChange))
      assert(TxnLog.stateAt(root, 2).protocol == ((1, 1)),
        "an advisory marker must not lock out v1 readers — ignoring " +
          "it resolves the same state, it only costs the saved I/O")
    }
  }

  test("merge-on-read DELETE auto-raises: DV tables refuse old readers") {
    import spark.implicits._
    withScratch { root =>
      (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/f0")
      assert(TxnLog.commitAppend(root, Seq("f0"), "k BIGINT,v DOUBLE",
        "s") == 1)
      assert(TxnLog.deleteRangeDV(spark, root, "k", "2", "3", "d")
        .contains(2))
      assert(TxnLog.stateAt(root, 2).protocol == ((2, 2)),
        "a DV commit must carry the protocol raise — a v1 reader " +
          "would silently scan the deleted rows otherwise")
    }
  }

  // ---------------------------- canonical pushdown value rendering

  test("timestamp pushdown never prunes files holding matching rows") {
    import spark.implicits._
    withScratch { root =>
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      Seq((ts("2024-01-01 00:00:00"), 1L), (ts("2024-01-02 00:00:00"), 2L))
        .toDF("ev", "k").coalesce(1).write.parquet(s"$root/f0")
      Seq((ts("2024-02-01 00:00:00"), 3L), (ts("2024-02-02 00:00:00"), 4L))
        .toDF("ev", "k").coalesce(1).write.parquet(s"$root/f1")
      val adds = Seq("f0", "f1").flatMap(f => Seq[TxnLog.Entry](
        TxnLog.AddStats(f, TxnLog.statsFor(spark, root, f, "ev")),
        TxnLog.bloomFor(spark, root, f, "ev", m = 256)))
      assert(TxnLog.tryCommit(root, 1,
        adds :+ TxnLog.MetaData("ev TIMESTAMP,k BIGINT"), "s"))
      val df = spark.read.format("graft-txn").option("path", root).load()
      // boundary equality: f0's max IS this instant; String.valueOf
      // rendered "…00:00:00.0" which compared past the logged max and
      // pruned f0 — the row silently vanished (ADVICE r11 high)
      assert(df.where(col("ev") === ts("2024-01-02 00:00:00")).count()
        == 1, "equality on a stats boundary lost its row")
      // range with timestamp bounds: both files' rows inside survive
      assert(df.where(col("ev")
          .between(ts("2024-01-02 00:00:00"), ts("2024-02-01 00:00:00")))
        .count() == 2, "timestamp range pushdown lost rows")
      // and pruning still WORKS with the canonical rendering: a probe
      // inside f1's range only scans f1
      val (scanned, pruned) = TxnTableRelation.pruneFor(root, 1,
        Array(org.apache.spark.sql.sources.EqualTo("ev",
          ts("2024-02-01 00:00:00"))))
      assert(scanned == Seq("f1") && pruned == Seq("f0"),
        s"canonical rendering should prune exactly f0: ($scanned, $pruned)")
      val _ = fmt // keep the formatter import honest
    }
  }

  // --------------------------------- backquoted constraint mentions

  test("rename/drop refuse a column a backquoted CHECK still reads") {
    import spark.implicits._
    withScratch { root =>
      Seq((1L, 2L)).toDF("k", "v").coalesce(1).write.parquet(s"$root/f0")
      assert(TxnLog.commitAppend(root, Seq("f0"), "k BIGINT,v BIGINT",
        "s") == 1)
      assert(TxnLog.addConstraint(spark, root, "kpos", "`k` > 0", "s") == 2)
      val e = intercept[IllegalArgumentException](
        TxnLog.renameColumn(root, "k", "key", "s"))
      assert(e.getMessage.contains("kpos"), e.getMessage)
      val d = intercept[IllegalArgumentException](
        TxnLog.dropColumn(root, "k", "s"))
      assert(d.getMessage.contains("kpos"), d.getMessage)
      // an UNRELATED column whose name merely appears inside the
      // backquoted identifier still renames fine
      assert(TxnLog.renameColumn(root, "v", "val", "s") == 3)
    }
  }

  // ------------------------- written-rows-only MERGE constraints

  test("MERGE validates only written rows: a violating DELETE-only " +
    "source row cannot veto; a violating insert still does") {
    import spark.implicits._
    withScratch { root =>
      Seq((1L, 5.0), (2L, 6.0)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/f0")
      assert(TxnLog.commitAppend(root, Seq("f0"), "k BIGINT,v DOUBLE",
        "s") == 1)
      assert(TxnLog.addConstraint(spark, root, "pos", "v > 0", "s") == 2)
      // source row (1, -1): violates, but only fires DELETE — never
      // written, must not be able to veto the merge
      val delOnly = Seq((1L, -1.0)).toDF("k", "v")
      assert(TxnLog.mergeClauses(spark, root, delOnly, "k", "m1",
        updateWhen = None, deleteWhen = Some(lit(true)),
        insertUnmatched = false).contains(3))
      assert(TxnLog.read(spark, root).select("k")
        .collect().map(_.getLong(0)).toSeq == Seq(2L))
      // a violating row that WOULD insert is still refused
      val badIns = Seq((9L, -1.0)).toDF("k", "v")
      val e = intercept[IllegalArgumentException](
        TxnLog.mergeUpsert(spark, root, badIns, "k", "m2"))
      assert(e.getMessage.contains("pos"), e.getMessage)
      // and a violating row whose update condition never fires is
      // not written either: the matched row survives unchanged
      val noFire = Seq((2L, -2.0)).toDF("k", "v")
      val r = TxnLog.mergeClauses(spark, root, noFire, "k", "m3",
        updateWhen = Some(col("__src_v") > col("v")), deleteWhen = None,
        insertUnmatched = false)
      assert(r.isEmpty, s"nothing fired, nothing written: $r")
    }
  }

  // -------------------------------------------- state memo soundness

  test("state memo: existing versions are stable; a FUTURE-version " +
    "lookup is never cached and tracks new commits") {
    withScratch { root =>
      assert(TxnLog.commitNext(root, Seq(TxnLog.add("f0")), "s") == 1)
      // future-version lookup answers the tip...
      assert(TxnLog.stateAt(root, 99).live == Set("f0"))
      // ...and a later commit must CHANGE that answer (a cached
      // future version would serve the stale tip forever)
      assert(TxnLog.commitNext(root, Seq(TxnLog.add("f1")), "s") == 2)
      assert(TxnLog.stateAt(root, 99).live == Set("f0", "f1"))
      // pinned versions stay exact as the table grows
      assert(TxnLog.stateAt(root, 1).live == Set("f0"))
      assert(TxnLog.commitNext(root, Seq(TxnLog.remove("f0")), "s") == 3)
      assert(TxnLog.stateAt(root, 1).live == Set("f0"))
      assert(TxnLog.stateAt(root, 2).live == Set("f0", "f1"))
      assert(TxnLog.stateAt(root, 3).live == Set("f1"))
      // incremental fold across a checkpoint + cleanup keeps agreeing
      // with the reference full replay
      for (i <- 4 to 12)
        assert(TxnLog.commitNext(root, Seq(TxnLog.add(s"g$i")), "s") == i)
      val direct = TxnLog.stateAt(root, 12)
      assert(TxnLog.cleanupLog(root).nonEmpty)
      assert(TxnLog.stateAt(root, 12).live == direct.live)
      assert(TxnLog.stateAt(root, 11).live == direct.live - "g12")
    }
  }

  // -------------------------------------- FPP-sized bloom filters

  test("bloom m derives from NDV: big files get big filters, and the " +
    "absent-probe prune rate holds at both sizes") {
    import spark.implicits._
    withScratch { root =>
      // f_small: 40 distinct keys; f_big: 40k — under the old fixed
      // m=4096 the big file's FPP (and pointless scans) exploded
      (0L until 40L).map(k => (k, k)).toDF("c", "v")
        .coalesce(1).write.parquet(s"$root/f_small")
      (1000000L until 1040000L).map(k => (k, k)).toDF("c", "v")
        .coalesce(1).write.parquet(s"$root/f_big")
      val bs = TxnLog.bloomFor(spark, root, "f_small", "c")
      val bb = TxnLog.bloomFor(spark, root, "f_big", "c")
      assert(bs.m == TxnLog.bloomSizeFor(40) && bs.m == 512,
        s"small m = ${bs.m}")
      assert(bb.m == TxnLog.bloomSizeFor(40000) && bb.m == 524288,
        s"big m = ${bb.m}")
      assert(TxnLog.tryCommit(root, 1, Seq(
        TxnLog.add("f_small"), TxnLog.add("f_big"), bs, bb,
        TxnLog.MetaData("c BIGINT,v BIGINT")), "s"))
      // zero false negatives: every present probe scans its holder
      Seq(0L, 39L, 1000000L, 1039999L).foreach { p =>
        val (scanned, _) = TxnLog.pruneEq(root, 1, "c", p.toString)
        val holder = if (p < 1000L) "f_small" else "f_big"
        assert(scanned.contains(holder), s"probe $p missed $holder")
      }
      // absent probes: both filters prune at their target FPP —
      // allow a generous margin over the ~5% design point
      val absent = (500000L until 500200L)
      val scans = absent.map(p =>
        TxnLog.pruneEq(root, 1, "c", p.toString)._1.size).sum
      assert(scans <= absent.size * 2 * 0.2,
        s"absent probes scanned $scans/${absent.size * 2} file-slots")
      // sizing rule edges: exact powers of two stay, floor and cap bind
      assert(TxnLog.bloomSizeFor(32) == 256)   // 8*32 = 256 exactly
      assert(TxnLog.bloomSizeFor(1) == 256)    // floor
      assert(TxnLog.bloomSizeFor(1000000) == (1 << 20)) // cap
    }
  }

  // --------------------------------- RESTORE rolls pruning state back

  test("bloomFor on an all-null column publishes the floor filter " +
    "instead of throwing (NDV 0)") {
    import spark.implicits._
    withScratch { root =>
      Seq((1L, null: String), (2L, null: String)).toDF("k", "s")
        .coalesce(1).write.parquet(s"$root/f0")
      val b = TxnLog.bloomFor(spark, root, "f0", "s")
      assert(b.m == 256, s"expected the floor size, got ${b.m}")
      // no positions set: every probe proves absence — trivially
      // correct for a column with no values
      assert(b.bits.forall(_ == '0'), "an all-null filter set bits")
    }
  }

  test("RESTORE reconciles stats and partition tuples for files live " +
    "in both versions") {
    import spark.implicits._
    withScratch { root =>
      Seq((1L, 10.0)).toDF("k", "v").coalesce(1).write.parquet(s"$root/f0")
      val s1 = TxnLog.FileStats("k", "1", "1", 1L)
      assert(TxnLog.tryCommit(root, 1, Seq(
        TxnLog.AddFile("f0", Seq("pri" -> "a"), Seq(s1)),
        TxnLog.MetaData("k BIGINT,v DOUBLE")), "s"))
      // v2 re-adds f0 with DIFFERENT stats + partition tuple (the
      // shape a partition-repair or stats-refresh job produces)
      val s2 = TxnLog.FileStats("k", "0", "99", 1L)
      assert(TxnLog.tryCommit(root, 2, Seq(
        TxnLog.AddFile("f0", Seq("pri" -> "b"), Seq(s2))), "s"))
      assert(TxnLog.restore(root, 1, "r").contains(3))
      val st = TxnLog.stateAt(root, 3)
      assert(st.stats.get("f0").contains(Seq(s1)),
        s"stats did not roll back: ${st.stats.get("f0")}")
      assert(st.parts.get("f0").contains(Seq("pri" -> "a")),
        s"partition tuple did not roll back: ${st.parts.get("f0")}")
      // and restore is still a no-op when nothing differs
      assert(TxnLog.restore(root, 3, "r2").isEmpty)
    }
  }

  test("OPTIMIZE skips already-optimal files: single-file bins do " +
    "not rewrite, and an all-trivial OPTIMIZE is a version no-op") {
    import spark.implicits._
    withScratch { root =>
      // one big file: its bin is just itself -> nothing to do
      (0L until 1000L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/big")
      assert(TxnLog.commitAppend(root, Seq("big"), "k BIGINT,v DOUBLE",
        "s") == 1)
      val before = Option(new java.io.File(root, "big").listFiles())
        .toSeq.flatten.map(f => f.getName -> f.lastModified).toMap
      assert(TxnLog.compact(spark, root, "opt").isEmpty,
        "an all-trivial OPTIMIZE must not commit")
      assert(TxnLog.latestVersion(root) == 1)
      val after = Option(new java.io.File(root, "big").listFiles())
        .toSeq.flatten.map(f => f.getName -> f.lastModified).toMap
      assert(after == before, "skipped file was touched")
      // a DV'd single file is NOT trivial: OPTIMIZE materializes it
      assert(TxnLog.deleteRangeDV(spark, root, "k", "0", "9", "s")
        .contains(2))
      val v = TxnLog.compact(spark, root, "opt2")
      assert(v.contains(3), s"DV materialization skipped: $v")
      assert(TxnLog.read(spark, root).count() == 990)
      assert(TxnLog.stateAt(root, 3).dvs.isEmpty,
        "the vector must retire with its file")
    }
  }

  test("scoped OPTIMIZE compacts only the WHERE range; out-of-scope " +
    "files stay byte-identical (SQL face included)") {
    import spark.implicits._
    withScratch { root =>
      for (i <- 0 until 4) {
        (i * 100L until (i + 1) * 100L).map(k => (k, k * 1.0))
          .toDF("k", "v").coalesce(1).write.parquet(s"$root/f$i")
      }
      val adds = (0 until 4).map(i => TxnLog.AddStats(s"f$i",
        TxnLog.statsFor(spark, root, s"f$i", "k")))
      assert(TxnLog.tryCommit(root, 1, adds, "s"))
      val untouched = Option(new java.io.File(root, "f3").listFiles())
        .toSeq.flatten.map(f => f.getName -> f.lastModified).toMap
      // SQL face: compact only the first two files' key range
      val v = spark.sql(
        s"GRAFT OPTIMIZE '$root' WHERE k BETWEEN '0' AND '199'")
        .head().getInt(0)
      assert(v == 2, s"scoped OPTIMIZE did not land v2: $v")
      val st = TxnLog.stateAt(root, 2)
      assert(st.live.size == 3, s"expected f2,f3 + 1 rewrite: ${st.live}")
      assert(st.live.contains("f2") && st.live.contains("f3"))
      assert(!st.live.contains("f0") && !st.live.contains("f1"))
      assert(Option(new java.io.File(root, "f3").listFiles())
        .toSeq.flatten.map(f => f.getName -> f.lastModified).toMap ==
        untouched, "out-of-scope file was rewritten")
      assert(TxnLog.read(spark, root).count() == 400)
      // the re-layout marker still flags the scoped commit
      assert(TxnLog.entriesAt(root, 2).contains(TxnLog.NoDataChange))
      // an out-of-range scope is a no-op, not an empty commit
      assert(TxnLog.compact(spark, root, "s2",
        where = Seq(("k", "9000", "9999"))).isEmpty)
      assert(TxnLog.latestVersion(root) == 2)
    }
  }

  test("streaming SINK: writeStream.format(graft-txnlog) appends " +
    "idempotently across a checkpoint restart") {
    import spark.implicits._
    withScratch { root =>
      val in = s"$root/in"; val tbl = s"$root/tbl"; val ck = s"$root/ck"
      def pass(): Unit = {
        val q = spark.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL(
            "k BIGINT, v DOUBLE"))
          .parquet(in)
          .writeStream.format("graft-txnlog")
          .option("path", tbl).option("appId", "sink_spec")
          .option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(in)
      pass()
      val v1 = TxnLog.latestVersion(tbl)
      assert(v1 >= 1 && TxnLog.read(spark, tbl).count() == 10)
      // first batch PUBLISHED the schema contract
      assert(TxnLog.schemaAt(tbl, v1).map(_.toDDL)
        .contains("k BIGINT,v DOUBLE"))
      // write-time stats landed with the streamed add
      assert(TxnLog.stateAt(tbl, v1).stats.values.flatten
        .exists(_.col == "k"), "streamed add published no stats")
      // restart on the same checkpoint with nothing new: no version
      pass()
      assert(TxnLog.latestVersion(tbl) == v1,
        "an empty restart must not commit")
      // new input lands exactly once
      (11L to 15L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(in)
      pass()
      assert(TxnLog.read(spark, tbl).count() == 15)
      // the RE-DELIVERY gate itself: replaying batch 0 against the
      // table is a one-lookup no-op
      assert(TxnLog.writeStreamBatch(spark, tbl,
        Seq((99L, 9.9)).toDF("k", "v"), "sink_spec", 0L, "s").isEmpty)
      assert(TxnLog.read(spark, tbl).count() == 15)
      // a DRIFTED batch schema is refused by the shared contract
      val e = intercept[Exception](TxnLog.writeStreamBatch(spark, tbl,
        Seq((99L, "x")).toDF("k", "v"), "sink_spec", 999L, "s"))
      assert(e.getMessage.contains("incompatible append"), e.getMessage)
    }
  }

  test("streaming SINK in Complete mode overwrites per batch: the " +
    "table always holds the latest aggregate, history time-travels") {
    import spark.implicits._
    withScratch { root =>
      val tbl = s"$root/agg"
      implicit val sq: org.apache.spark.sql.classic.SQLContext =
        spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Long]
      val q = in.toDS().toDF("k")
        .groupBy((col("k") % 2).as("par")).agg(count(lit(1)).as("n"))
        .writeStream.format("graft-txnlog")
        .option("path", tbl).option("appId", "agg_spec")
        .option("checkpointLocation", s"$root/ck2")
        .outputMode("complete")
        .start()
      try {
        in.addData(1L, 2L, 3L)
        q.processAllAvailable()
        in.addData(4L, 5L)
        q.processAllAvailable()
      } finally q.stop()
      val tip = TxnLog.read(spark, tbl).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(tip == Map(0L -> 2L, 1L -> 3L), tip.toString)
      // the tip is the ONLY live state, but batch 0's aggregate is a
      // time travel away
      val v1 = TxnLog.read(spark, tbl, TxnLog.latestVersion(tbl) - 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(v1 == Map(0L -> 1L, 1L -> 2L), v1.toString)
      // Complete mode is idempotent too: a re-delivered batch must
      // not land a phantom overwrite version (the txn watermark
      // carries into writeOverwrite)
      val tipV = TxnLog.latestVersion(tbl)
      val batches = TxnLog.stateAt(tbl, tipV).txns("agg_spec")
      assert(TxnLog.writeOverwrite(spark, tbl,
        spark.range(1).toDF("par")
          .selectExpr("par", "CAST(99 AS BIGINT) AS n"),
        "s", "dup_probe", txn = Some(("agg_spec", batches))) == tipV,
        "a replayed Complete batch committed a phantom version")
      assert(TxnLog.latestVersion(tbl) == tipV)
    }
  }

  test("streaming SINK refuses Update mode, partitionBy, and a " +
    "missing appId — loudly") {
    import spark.implicits._
    withScratch { root =>
      implicit val sq: org.apache.spark.sql.classic.SQLContext =
        spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
      def start(f: org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row] => org.apache.spark.sql.streaming
          .DataStreamWriter[org.apache.spark.sql.Row]) = {
        val in = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[Long]
        in.addData(1L)
        f(in.toDS().toDF("k").writeStream.format("graft-txnlog")
          .option("checkpointLocation", s"$root/ck_${
            java.util.UUID.randomUUID().toString.take(8)}"))
          .start()
      }
      // r13: Update mode is now SUPPORTED — but only with a mergeKey
      val e1 = intercept[Exception] {
        val q = start(_.option("path", s"$root/t1")
          .option("appId", "a").outputMode("update"))
        try q.processAllAvailable() finally q.stop()
      }
      assert(exists(e1, "mergeKey"), e1.getMessage)
      val e2 = intercept[Exception] {
        val q = start(_.option("path", s"$root/t2")
          .option("appId", "a").partitionBy("k"))
        try q.processAllAvailable() finally q.stop()
      }
      assert(exists(e2, "partition"), e2.getMessage)
      val e3 = intercept[Exception] {
        val q = start(_.option("path", s"$root/t3"))
        try q.processAllAvailable() finally q.stop()
      }
      assert(exists(e3, "appId"), e3.getMessage)
    }
  }

  /** The streaming runtime wraps sink-construction failures — match
    * the message anywhere on the causal chain. */
  private def exists(e: Throwable, needle: String): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .exists(t => Option(t.getMessage).exists(_.contains(needle)))
}
