package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Maintenance

/** Properties of the z-order bit math and the stats/layout queries'
  * structural claims — the parts the oracle hash can't see (it proves
  * value equality, not that the z-curve actually clusters). */
class MaintenanceSpec extends AnyFunSuite with SparkSpec {

  /** Reference model: textbook bit interleave of two 8-bit values. */
  private def zModel(x: Long, y: Long): Long =
    (0 until 8).map { k =>
      (((x >> k) & 1L) << (2 * k)) | (((y >> k) & 1L) << (2 * k + 1))
    }.sum

  test("table_skew buckets account for every key and row, shares sum to 1") {
    import org.apache.spark.sql.functions._
    val o = graft.core.Tables.orders(spark, sfDir)
    val rows = graft.operators.Maintenance.tableSkew(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum ==
      o.select(countDistinct(col("o_custkey"))).head().getLong(0))
    assert(rows.map(_.getLong(2)).sum == o.count())
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-12)
    // every bucket's max count stays inside its power-of-two range
    rows.foreach { r =>
      val (bucket, maxCnt) = (r.getLong(0), r.getLong(3))
      assert(maxCnt >= (1L << bucket) && maxCnt < (1L << (bucket + 1)))
    }
  }

  test("zFormula matches the bit-interleave model on random 8-bit pairs") {
    import spark.implicits._
    val pairs = Gen.listOfN(200,
        Gen.zip(Gen.chooseNum(0L, 255L), Gen.chooseNum(0L, 255L)))
      .pureApply(Gen.Parameters.default, Seed(7L))
    val got = pairs.toDF("x", "y")
      .withColumn("z", expr(Maintenance.zFormula("x", "y", "DIV")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == zModel(x, y), s"z($x,$y)=$z model=${zModel(x, y)}")
    }
  }

  test("z-value is a bijection on the 8-bit grid") {
    val pairs = for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y)
    val zs = pairs.map { case (x, y) => zModel(x, y) }
    assert(zs.distinct.size == pairs.size, "distinct pairs collided in z")
    assert(zs.min == 0L && zs.max == 65535L)
  }

  test("z-order layout yields narrower per-file custkey ranges than date sort") {
    // The point of the z-curve: a single-key sort gives each file the
    // FULL range of the other dimension; z-ordering bounds both. Compare
    // the mean per-file custkey span of the z-layout against a pure
    // date-sorted cut of the same table — z must be materially narrower.
    // cut into ~30 files whatever the fixture size — with only a few
    // cuts every layout necessarily spans most of the key space and
    // the clustering effect can't show
    import org.apache.spark.sql.expressions.Window
    val n = graft.core.Tables.orders(spark, sfDir).count()
    val perFile = math.max(50L, n / 30L).toInt
    val z = Maintenance.layoutZorder(spark, sfDir, rowsPerFile = perFile)
      .select((col("max_cust") - col("min_cust")).as("span")).collect()
    val zMean = z.map(_.getLong(0)).sum.toDouble / z.length
    val w = Window.orderBy(col("o_orderdate"), col("o_orderkey"))
    val d = graft.core.Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .withColumn("file_id", expr(s"(rn - 1) DIV $perFile"))
      .groupBy(col("file_id"))
      .agg((max(col("o_custkey")) - min(col("o_custkey"))).as("span"))
      .collect()
    val dMean = d.map(_.getLong(1)).sum.toDouble / d.length
    info(f"mean per-file custkey span — zorder: $zMean%.0f, date-sorted: $dMean%.0f")
    assert(zMean < dMean * 0.8,
      f"z-order span $zMean%.0f not materially below date-sort span $dMean%.0f")
  }

  // ------------------------------------------------- txn-log commits

  /** Scratch txn-log table root, deleted after `body`. */
  private def withTxnScratch(body: String => Unit): Unit = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_txnrace_").toString
    try body(root)
    finally graft.core.Fixtures.deleteRecursively(new java.io.File(root))
  }

  test("two concurrent txn-log appends race one slot; exactly one wins") {
    import graft.sources.TxnLog
    withTxnScratch { root =>
      assert(TxnLog.commitNext(root, Seq(TxnLog.add("f0")), "seed") == 1)
      // both writers resolve the same next slot (v2), then race the
      // atomic create-if-absent link from two threads; the filesystem
      // arbitration must admit exactly one
      val slot = TxnLog.latestVersion(root) + 1
      val gate = new java.util.concurrent.CountDownLatch(1)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val races = Seq("a", "b").map { who =>
        scala.concurrent.Future {
          gate.await()
          TxnLog.tryCommit(root, slot, Seq(TxnLog.add(s"f_$who")), who)
        }
      }
      gate.countDown()
      val wins = races.map(f =>
        scala.concurrent.Await.result(f, scala.concurrent.duration.Duration("30s")))
      pool.shutdown()
      assert(wins.count(identity) == 1, s"expected one winner, got $wins")
      assert(TxnLog.versions(root) == Seq(1, 2))
      // the loser's retry through commitNext re-resolves and lands at v3
      val loser = if (wins.head) "b" else "a"
      assert(TxnLog.commitNext(root, Seq(TxnLog.add(s"f_$loser")), loser) == 3)
      assert(TxnLog.liveFiles(root, 3).toSet == Set("f0", "f_a", "f_b"))
      // no tmp litter survives the race
      val leftover = Option(new java.io.File(root, "_log").listFiles())
        .toSeq.flatten.map(_.getName).filter(_.startsWith(".tmp_"))
      assert(leftover.isEmpty, s"tmp litter: $leftover")
    }
  }

  test("txn-log compaction conflicts: appends commute, input removal aborts") {
    import graft.sources.TxnLog
    import spark.implicits._
    withTxnScratch { root =>
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/f0")
      Seq((3L, 30.0)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/f1")
      Seq((4L, 40.0)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/f2")
      assert(TxnLog.commitNext(root,
        Seq(TxnLog.add("f0"), TxnLog.add("f1")), "seed") == 1)
      // an APPEND sneaks in between rewrite and commit: append-only
      // interleavers COMMUTE with the swap (their file stays live and
      // untouched), so the conflict checker re-validates and commits
      // at the new tip instead of aborting (VERDICT r9 #2 — the
      // blanket abort let a busy append stream starve OPTIMIZE)
      val out = TxnLog.compact(spark, root, "opt", beforeCommit = () =>
        assert(TxnLog.commitNext(root, Seq(TxnLog.add("f2")), "sneak") == 2))
      assert(out.contains(3),
        s"compaction racing an append must retry and commit: $out")
      assert(TxnLog.liveFiles(root, 3).toSet == Set("f2", "c00000002_opt"),
        "both the interleaved append and the compaction must be visible")
      val rewritten = spark.read.parquet(s"$root/c00000002_opt")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(rewritten == Set((1L, 10.0), (2L, 20.0), (3L, 30.0)),
        s"compaction content mismatch: $rewritten")
      // time travel still resolves every pre-compaction version
      assert(TxnLog.liveFiles(root, 1).toSet == Set("f0", "f1"))
      assert(TxnLog.liveFiles(root, 2).toSet == Set("f0", "f1", "f2"))
      // a TRUE conflict — the interleaver REMOVED one of the
      // rewrite's inputs (a racing compaction/merge) — still aborts
      // and deletes the orphaned output (M8 source-changed parity)
      val out2 = TxnLog.compact(spark, root, "opt2", beforeCommit = () =>
        assert(TxnLog.commitNext(root, Seq(TxnLog.remove("f2")),
          "rival") == 4))
      assert(out2.isEmpty,
        "compaction must abort when an input file was removed")
      assert(!new java.io.File(root, "c00000004_opt2").exists(),
        "aborted compaction left its rewrite behind")
      // the tip is now ONE optimal file — r12: OPTIMIZE refuses the
      // pointless 1:1 rewrite instead of copying every byte
      assert(TxnLog.compact(spark, root, "opt3").isEmpty)
      assert(TxnLog.latestVersion(root) == 4)
      // with fresh input the retry wins the next slot
      Seq((9L, 90.0)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/f9")
      assert(TxnLog.commitNext(root, Seq(TxnLog.add("f9")), "s") == 5)
      val v6 = TxnLog.compact(spark, root, "opt3")
      assert(v6.contains(6))
      assert(TxnLog.liveFiles(root, 6) == Seq("c00000006_opt3"))
      val after = spark.read.parquet(s"$root/c00000006_opt3")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(after == Set((1L, 10.0), (2L, 20.0), (3L, 30.0),
        (9L, 90.0)),
        s"post-conflict compaction content mismatch: $after")
    }
  }

  test("txn-log replay equals a reference set-fold for arbitrary logs") {
    import graft.sources.TxnLog
    // property: for random well-formed commit sequences, versions are
    // contiguous from 1 and liveFiles(v) is exactly the adds-minus-
    // removes set fold of the actions up to v
    val names = (0 to 9).map(i => s"f$i")
    val batchGen = Gen.nonEmptyListOf(Gen.zip(Gen.oneOf(names), Gen.prob(0.7)))
    for (seed <- 1 to 6) withTxnScratch { root =>
      val batches = Gen.nonEmptyListOf(batchGen)
        .pureApply(Gen.Parameters.default, Seed(seed.toLong)).take(8)
      val committed = batches.map { b =>
        val acts = b.map { case (f, isAdd) =>
          if (isAdd) TxnLog.add(f) else TxnLog.remove(f)
        }
        TxnLog.commitNext(root, acts, s"prop$seed")
        acts
      }
      assert(TxnLog.versions(root) == (1 to committed.size))
      var live = Set.empty[String]
      committed.zipWithIndex.foreach { case (acts, i) =>
        live = acts.foldLeft(live) {
          case (s, TxnLog.Action("add", f)) => s + f
          case (s, TxnLog.Action("remove", f)) => s - f
          case (s, _) => s
        }
        assert(TxnLog.liveFiles(root, i + 1) == live.toSeq.sorted,
          s"replay diverged at v${i + 1} seed=$seed")
      }
    }
  }

  test("txn-log replay fails loudly on a malformed log line") {
    import graft.sources.TxnLog
    withTxnScratch { root =>
      assert(TxnLog.commitNext(root, Seq(TxnLog.add("f0")), "s") == 1)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(root, "_log", "v00000002.jsonl"),
        """{"op":"add","file":"f1"}""" + "\n")
      val e = intercept[IllegalArgumentException](TxnLog.liveFiles(root, 2))
      assert(e.getMessage.contains("unknown log action"))
    }
  }

  test("txn-log vacuum retires only non-tip files and is idempotent") {
    import graft.sources.TxnLog
    import spark.implicits._
    withTxnScratch { root =>
      for (f <- Seq("f0", "f1", "f2"))
        Seq((1L, 1.0)).toDF("k", "v").coalesce(1).write.parquet(s"$root/$f")
      assert(TxnLog.commitNext(root,
        Seq(TxnLog.add("f0"), TxnLog.add("f1")), "s") == 1)
      assert(TxnLog.commitNext(root,
        Seq(TxnLog.remove("f0"), TxnLog.add("f2")), "s") == 2)
      // only f0 is retired from the tip; the live pair survives
      assert(TxnLog.vacuum(root) == Seq("f0"))
      assert(!new java.io.File(root, "f0").exists())
      assert(new java.io.File(root, "f1").isDirectory)
      assert(new java.io.File(root, "f2").isDirectory)
      // idempotent, and the log METADATA still resolves every version
      assert(TxnLog.vacuum(root).isEmpty)
      assert(TxnLog.liveFiles(root, 1) == Seq("f0", "f1"))
      assert(TxnLog.liveFiles(root, 2) == Seq("f1", "f2"))
    }
  }

  test("txn-log checkpoints: replay through a checkpoint equals the full fold") {
    import graft.sources.TxnLog
    // property (VERDICT r8 #2): for random commit sequences long enough
    // to cross ≥2 checkpoint boundaries, liveFiles resolved through the
    // checkpointed fast path equals the reference fold; and because a
    // checkpoint is pure cache, DELETING it must change nothing.
    val names = (0 to 9).map(i => s"f$i")
    val batchGen = Gen.nonEmptyListOf(Gen.zip(Gen.oneOf(names), Gen.prob(0.7)))
    for (seed <- 1 to 3) withTxnScratch { root =>
      val batches = Gen.listOfN(25, batchGen)
        .pureApply(Gen.Parameters.default, Seed(100L + seed))
      val committed = batches.map { b =>
        val acts = b.map { case (f, isAdd) =>
          if (isAdd) TxnLog.add(f) else TxnLog.remove(f)
        }
        TxnLog.commitNext(root, acts, s"cp$seed")
        acts
      }
      // 25 commits at interval 10 → checkpoints at v10 and v20
      assert(TxnLog.checkpoints(root) == Seq(10, 20),
        s"expected checkpoints at 10 and 20, got ${TxnLog.checkpoints(root)}")
      def referenceLive(v: Int): Seq[String] =
        committed.take(v).flatten.foldLeft(Set.empty[String]) {
          case (s, TxnLog.Action("add", f)) => s + f
          case (s, TxnLog.Action("remove", f)) => s - f
          case (s, _) => s
        }.toSeq.sorted
      for (v <- 1 to committed.size)
        assert(TxnLog.liveFiles(root, v) == referenceLive(v),
          s"checkpointed replay diverged at v$v seed=$seed")
      // checkpoints are cache, not truth: delete them, same answers
      for (cp <- TxnLog.checkpoints(root))
        assert(new java.io.File(root,
          f"_log/v$cp%08d.checkpoint.jsonl").delete())
      for (v <- 1 to committed.size)
        assert(TxnLog.liveFiles(root, v) == referenceLive(v),
          s"checkpoint-less replay diverged at v$v seed=$seed")
    }
  }

  test("txn-log data skipping prunes only provably-disjoint files") {
    import graft.sources.TxnLog
    import spark.implicits._
    withTxnScratch { root =>
      // four range files over k, one stats-less, one with stats on a
      // DIFFERENT column — the last two must never be pruned
      val ranges = Seq(("r0", 0L, 9L), ("r1", 10L, 19L),
        ("r2", 20L, 29L), ("r3", 30L, 39L))
      val adds: Seq[TxnLog.Entry] = ranges.map { case (name, lo, hi) =>
        (lo to hi).map(k => (k, k * 2.0)).toDF("k", "v")
          .coalesce(1).write.parquet(s"$root/$name")
        TxnLog.AddStats(name, TxnLog.statsFor(spark, root, name, "k"))
      } ++ Seq(
        { (40L to 44L).map(k => (k, 0.0)).toDF("k", "v")
            .coalesce(1).write.parquet(s"$root/nostats")
          TxnLog.add("nostats") },
        { (45L to 49L).map(k => (k, 0.0)).toDF("k", "v")
            .coalesce(1).write.parquet(s"$root/othercol")
          TxnLog.AddStats("othercol",
            TxnLog.statsFor(spark, root, "othercol", "v")) })
      assert(TxnLog.tryCommit(root, 1, adds, "s"))
      // property over random bounds: pruned files are truly disjoint
      // from [lo,hi], and the skipping read filtered equals the full
      // read filtered — skipping may never change results
      val full = TxnLog.read(spark, root)
      for (seed <- 1 to 8) {
        val rnd = new scala.util.Random(seed)
        val a = rnd.nextLong(55) - 2
        val b = a + rnd.nextLong(20)
        val (df, scanned, pruned) =
          TxnLog.readPruned(spark, root, "k", a.toString, b.toString)
        assert((scanned ++ pruned).sorted ==
          Seq("nostats", "othercol", "r0", "r1", "r2", "r3"))
        assert(!pruned.contains("nostats") && !pruned.contains("othercol"),
          "pruned a file whose bounds for k are unknown")
        for (p <- pruned) {
          val (_, lo, hi) = ranges.find(_._1 == p).get
          assert(hi < a || lo > b, s"pruned overlapping file $p for [$a,$b]")
        }
        val got = df.where(col("k").between(a, b)).count()
        val want = full.where(col("k").between(a, b)).count()
        assert(got == want, s"skipping changed results for [$a,$b]")
      }
      // boundary inclusivity: lo equal to a file's max must scan it
      val (_, scanned9, _) = TxnLog.readPruned(spark, root, "k", "9", "9")
      assert(scanned9.contains("r0"))
      // all-pruned range still reads as an empty frame, not an error
      val (empty, scannedNone, _) =
        TxnLog.readPruned(spark, root, "k", "-10", "-5")
      assert(!scannedNone.exists(_.startsWith("r")))
      assert(empty.where(col("k").between(-10, -5)).count() == 0)
    }
  }

  test("txn-log stats and txn watermarks survive the checkpoint fast path") {
    import graft.sources.TxnLog
    import spark.implicits._
    withTxnScratch { root =>
      // 12 stats-carrying commits cross the interval-10 checkpoint
      for (i <- 1 to 12) {
        val name = s"g$i"
        Seq((i.toLong, 1.0)).toDF("k", "v")
          .coalesce(1).write.parquet(s"$root/$name")
        assert(TxnLog.commitStreamBatch(root, "app", i.toLong,
          Seq(TxnLog.AddStats(name,
            TxnLog.statsFor(spark, root, name, "k"))), "s").contains(i))
      }
      assert(TxnLog.checkpoints(root) == Seq(10))
      // delete every pre-checkpoint version file: the checkpoint ALONE
      // must reconstruct stats and the txn watermark, or the fast path
      // silently loses skipping and exactly-once after log cleanup
      for (v <- 1 to 10)
        assert(new java.io.File(root, f"_log/v$v%08d.jsonl").delete())
      val st = graft.sources.TxnLog.stateAt(root, 12)
      assert(st.live == (1 to 12).map(i => s"g$i").toSet)
      assert(st.txns == Map("app" -> 12L))
      assert(st.stats.size == 12 &&
        st.stats("g7") == Seq(TxnLog.FileStats("k", "7", "7", 1L)),
        s"stats lost through the checkpoint: ${st.stats.get("g7")}")
      val (_, scanned, pruned) =
        TxnLog.readPruned(spark, root, "k", "7", "7")
      assert(scanned == Seq("g7") && pruned.size == 11,
        "skipping stopped working through the checkpoint fast path")
    }
  }

  test("txn watermark: a re-delivered stream batch commits exactly once") {
    import graft.sources.TxnLog
    withTxnScratch { root =>
      assert(TxnLog.commitStreamBatch(root, "app", 0L,
        Seq(TxnLog.add("b0")), "s").contains(1))
      // same batch again (checkpoint replay) → refused
      assert(TxnLog.commitStreamBatch(root, "app", 0L,
        Seq(TxnLog.add("b0dup")), "s").isEmpty)
      assert(TxnLog.commitStreamBatch(root, "app", 1L,
        Seq(TxnLog.add("b1")), "s").contains(2))
      // an EARLIER batch re-delivered after later progress → refused
      assert(TxnLog.commitStreamBatch(root, "app", 0L,
        Seq(TxnLog.add("b0dup2")), "s").isEmpty)
      // a different app's batch numbering is independent
      assert(TxnLog.commitStreamBatch(root, "other", 0L,
        Seq(TxnLog.add("o0")), "s").contains(3))
      assert(TxnLog.liveFiles(root, 3) == Seq("b0", "b1", "o0"))
      // two threads replaying the SAME batch race: exactly one commit
      val gate = new java.util.concurrent.CountDownLatch(1)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val races = Seq("x", "y").map { who =>
        scala.concurrent.Future {
          gate.await()
          TxnLog.commitStreamBatch(root, "app", 2L,
            Seq(TxnLog.add(s"b2_$who")), who)
        }
      }
      gate.countDown()
      val wins = races.map(f => scala.concurrent.Await.result(f,
        scala.concurrent.duration.Duration("30s")))
      pool.shutdown()
      assert(wins.count(_.isDefined) == 1,
        s"expected exactly one winning replay, got $wins")
      assert(TxnLog.stateAt(root, TxnLog.latestVersion(root))
        .txns("app") == 2L)
    }
  }

  test("txn-log cleanup: the checkpoint alone serves the retained log") {
    import graft.sources.TxnLog
    withTxnScratch { root =>
      // 12 pinned-clock commits cross the interval-10 checkpoint; v7
      // retires a file so the checkpoint state is not just "all adds"
      for (i <- 1 to 12) {
        val acts: Seq[TxnLog.Entry] =
          if (i == 7) Seq(TxnLog.add(s"f$i"), TxnLog.remove("f3"))
          else Seq(TxnLog.add(s"f$i"))
        assert(TxnLog.tryCommit(root, i, acts, "s", nowMs = i * 1000L))
      }
      val before = TxnLog.stateAt(root, 12)
      val deleted = TxnLog.cleanupLog(root)
      assert(deleted == (1 to 10).map(v => f"v$v%08d.jsonl").sorted,
        s"cleanup deleted: $deleted")
      // reads at and above the floor are bit-identical to pre-cleanup
      assert(TxnLog.latestVersion(root) == 12)
      assert(TxnLog.stateAt(root, 12) == before)
      assert(TxnLog.liveFiles(root, 10) ==
        ((1 to 10).map(i => s"f$i").toSet - "f3").toSeq.sorted)
      // the monotonic clock survives: the checkpoint carries v10's ts,
      // so a next commit still clamps against real history
      assert(TxnLog.commitTs(root, 10) == 10000L)
      // history floors at the checkpoint version, then walks retained
      assert(TxnLog.liveSets(root).map(_._1) == Seq(10, 11, 12))
      assert(TxnLog.liveSets(root).head._2 ==
        ((1 to 10).map(i => s"f$i").toSet - "f3").toSeq.sorted)
      // time travel: below the floor = before-the-table; at and above
      // the floor resolves through the checkpoint's timestamp
      assert(TxnLog.versionAsOf(root, 9999L) == 0)
      assert(TxnLog.versionAsOf(root, 10500L) == 10)
      assert(TxnLog.versionAsOf(root, 12000L) == 12)
      // the log keeps accepting commits after cleanup
      assert(TxnLog.tryCommit(root, 13, Seq(TxnLog.add("f13")), "s",
        nowMs = 13000L))
      // boundary cleanup: advance THROUGH the next checkpoint so every
      // version file is at or below it — the table must still resolve
      // from the checkpoint alone and accept the next commit
      for (i <- 14 to 20)
        assert(TxnLog.tryCommit(root, i, Seq(TxnLog.add(s"f$i")), "s",
          nowMs = i * 1000L))
      val deleted2 = TxnLog.cleanupLog(root)
      assert(deleted2.contains(f"v${10}%08d.checkpoint.jsonl"),
        "the superseded checkpoint must be retired too")
      assert(TxnLog.versions(root).isEmpty && TxnLog.latestVersion(root) == 20)
      assert(TxnLog.liveFiles(root, 20).size == 19) // 20 adds - f3
      assert(TxnLog.liveSets(root).map(_._1) == Seq(20))
      assert(TxnLog.tryCommit(root, 21, Seq(TxnLog.add("f21")), "s",
        nowMs = 21000L))
      assert(TxnLog.commitTs(root, 21) == 21000L)
      assert(TxnLog.liveFiles(root, 21).size == 20)
      // idempotent: nothing new below the checkpoint, nothing deleted
      assert(TxnLog.cleanupLog(root).isEmpty)
    }
  }

  test("txn-log timestamp time travel resolves versions monotonically") {
    import graft.sources.TxnLog
    withTxnScratch { root =>
      assert(TxnLog.tryCommit(root, 1, Seq(TxnLog.add("f0")), "t",
        nowMs = 1000L))
      assert(TxnLog.tryCommit(root, 2, Seq(TxnLog.add("f1")), "t",
        nowMs = 2000L))
      // clock skew: a wall clock BEHIND v2's timestamp must not break
      // the monotonic order versionAsOf's binary search relies on —
      // the protocol clamps to prev + 1
      assert(TxnLog.tryCommit(root, 3, Seq(TxnLog.add("f2")), "t",
        nowMs = 1500L))
      val ts = (1 to 3).map(TxnLog.commitTs(root, _))
      assert(ts == Seq(1000L, 2000L, 2001L), s"timestamps: $ts")
      assert(TxnLog.versionAsOf(root, 999L) == 0)   // before the table
      assert(TxnLog.liveFiles(root, 0).isEmpty)
      assert(TxnLog.versionAsOf(root, 1000L) == 1)
      assert(TxnLog.versionAsOf(root, 1999L) == 1)
      assert(TxnLog.versionAsOf(root, 2000L) == 2)
      assert(TxnLog.versionAsOf(root, 2001L) == 3)
      assert(TxnLog.versionAsOf(root, Long.MaxValue) == 3)
      // the resolved version reads exactly its snapshot
      assert(TxnLog.liveFiles(root,
        TxnLog.versionAsOf(root, 1999L)) == Seq("f0"))
    }
  }

  test("txn-log schema actions: publish, validate, evolve, reject") {
    import graft.sources.TxnLog
    withTxnScratch { root =>
      // first append publishes the schema
      assert(TxnLog.commitAppend(root, Seq("f0"), "a BIGINT,b DOUBLE",
        "s") == 1)
      assert(TxnLog.schemaAt(root, 1).map(_.toDDL)
        .contains("a BIGINT,b DOUBLE"))
      // same-schema append carries no redundant metaData
      assert(TxnLog.commitAppend(root, Seq("f1"), "a BIGINT,b DOUBLE",
        "s") == 2)
      assert(!TxnLog.entriesAt(root, 2).exists(_.isInstanceOf[TxnLog.MetaData]))
      // widening without evolve is rejected
      val e1 = intercept[IllegalArgumentException](
        TxnLog.commitAppend(root, Seq("f2"), "a BIGINT,b DOUBLE,c STRING", "s"))
      assert(e1.getMessage.contains("evolve"))
      // an incompatible type change is rejected outright
      val e2 = intercept[IllegalArgumentException](
        TxnLog.commitAppend(root, Seq("f2"), "a STRING,b DOUBLE", "s",
          evolve = true))
      assert(e2.getMessage.contains("incompatible"))
      // widening WITH evolve commits merged metaData
      assert(TxnLog.commitAppend(root, Seq("f2"), "a BIGINT,b DOUBLE,c STRING",
        "s", evolve = true) == 3)
      assert(TxnLog.schemaAt(root, 3).map(_.toDDL)
        .contains("a BIGINT,b DOUBLE,c STRING"))
      // time travel sees the OLD schema at the old version
      assert(TxnLog.schemaAt(root, 2).map(_.toDDL)
        .contains("a BIGINT,b DOUBLE"))
      assert(TxnLog.liveFiles(root, 3) == Seq("f0", "f1", "f2"))
    }
  }

  test("txn-log reader resolves live set + schema per version (read/readAsOf)") {
    import graft.sources.TxnLog
    import spark.implicits._
    withTxnScratch { root =>
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/f0")
      Seq((3L, 30.0, "x")).toDF("k", "v", "tag")
        .coalesce(1).write.parquet(s"$root/f1")
      assert(TxnLog.tryCommit(root, 1, Seq(TxnLog.add("f0")), "s",
        schemaDdl = Some("k BIGINT,v DOUBLE"), nowMs = 1000L))
      assert(TxnLog.tryCommit(root, 2, Seq(TxnLog.add("f1")), "s",
        schemaDdl = Some("k BIGINT,v DOUBLE,tag STRING"), nowMs = 2000L))
      // v1 reads under the OLD schema: two columns, old rows only
      val v1 = TxnLog.read(spark, root, 1)
      assert(v1.columns.toSeq == Seq("k", "v"))
      assert(v1.count() == 2)
      // the tip reads merged: evolved column null-padded on old rows
      val tip = TxnLog.read(spark, root)
      assert(tip.columns.toSeq == Seq("k", "v", "tag"))
      assert(tip.count() == 3)
      assert(tip.where(col("tag").isNull).count() == 2)
      // timestamp-resolved read lands on the right snapshot
      assert(TxnLog.readAsOf(spark, root, 1500L).columns.toSeq ==
        Seq("k", "v"))
      assert(TxnLog.readAsOf(spark, root, 1500L).count() == 2)
      // a drained table (remove-only commit) reads as an EMPTY frame
      // under the resolved schema, not an error
      assert(TxnLog.tryCommit(root, 3,
        Seq(TxnLog.remove("f0"), TxnLog.remove("f1")), "s", nowMs = 3000L))
      val drained = TxnLog.read(spark, root)
      assert(drained.columns.toSeq == Seq("k", "v", "tag"))
      assert(drained.count() == 0)
    }
  }

  test("txn-log OPTIMIZE sizes its rewrite dynamically, never one task") {
    import graft.sources.TxnLog
    import spark.implicits._
    withTxnScratch { root =>
      // four slices; a target sized for two-per-bin must bin-pack
      // into >1 output file (VERDICT r8 #1: the coalesce(1) rewrite
      // was the last single-task scale-killer plan; r12: the target
      // must hold at least one MERGE or every bin is a single file
      // and the skip rule makes the whole job a no-op)
      for (i <- 0 until 4)
        (i * 300L + 1 to (i + 1) * 300L).map(k => (k, k * 1.5))
          .toDF("k", "v").coalesce(1).write.parquet(s"$root/f$i")
      assert(TxnLog.commitNext(root,
        (0 until 4).map(i => TxnLog.add(s"f$i")), "s") == 1)
      val one = graft.sources.LocalLogStore.dataBytes(root, "f0")
      val v = TxnLog.compact(spark, root, "opt",
        targetBytes = one * 2 + one / 2)
      assert(v.contains(2))
      val live = TxnLog.liveFiles(root, 2)
      assert(live.size > 1,
        s"dynamic sizing produced a single output dir: $live")
      assert(live.forall(_.startsWith("c00000002_opt_p")),
        s"unexpected rewrite names: $live")
      // content preserved exactly across the k-way rewrite
      val got = spark.read.parquet(live.map(f => s"$root/$f"): _*)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == (1L to 1200L).map(k => (k, k * 1.5)).toSet)
      assert(live.size == 2, s"expected two 2-file bins: $live")
      // the rollup's n_files reflects the bin-packed output count
      val rollup = TxnLog.versionsRollup(spark, root, "v").collect()
      assert(rollup.find(_.getInt(0) == 2).map(_.getInt(1))
        .contains(live.size))
      // and no staging residue survives inside the table root
      assert(!Option(new java.io.File(root).listFiles()).toSeq.flatten
        .exists(_.getName.startsWith(".stage_")))
    }
  }

  test("txn-log vacuum retention keeps every version inside the horizon readable") {
    import graft.sources.TxnLog
    import spark.implicits._
    withTxnScratch { root =>
      for (f <- Seq("f0", "f1", "f2", "f3"))
        Seq((1L, 1.0)).toDF("k", "v").coalesce(1).write.parquet(s"$root/$f")
      assert(TxnLog.commitNext(root,
        Seq(TxnLog.add("f0"), TxnLog.add("f1")), "s") == 1)
      assert(TxnLog.commitNext(root,
        Seq(TxnLog.remove("f0"), TxnLog.add("f2")), "s") == 2)
      assert(TxnLog.commitNext(root,
        Seq(TxnLog.remove("f1"), TxnLog.add("f3")), "s") == 3)
      // horizon of 2: v2 and v3 stay readable, so f1 (live at v2)
      // survives even though the tip retired it; only f0 goes
      assert(TxnLog.vacuum(root, retainVersions = 2) == Seq("f0"))
      for (f <- TxnLog.liveFiles(root, 2) ++ TxnLog.liveFiles(root, 3))
        assert(new java.io.File(root, f).isDirectory,
          s"horizon version lost file $f")
      // shrinking the horizon to tip-only then retires f1
      assert(TxnLog.vacuum(root, retainVersions = 1) == Seq("f1"))
      assert(TxnLog.liveFiles(root, 3).forall(f =>
        new java.io.File(root, f).isDirectory))
    }
  }

  test("table_stats matches directly computed statistics") {
    val rows = Maintenance.tableStats(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val qty = graft.core.Tables.lineitem(spark, sfDir)
      .agg(count(col("l_quantity")), countDistinct(col("l_quantity")),
        min(col("l_quantity")), max(col("l_quantity"))).head
    val r = rows("l_quantity")
    assert(r.getLong(1) == qty.getLong(0) + r.getLong(2)) // n_rows = cnt + nulls
    assert(r.getLong(3) == qty.getLong(1))                // ndv
    assert(r.getDouble(4) == qty.getDouble(2))            // min
    assert(r.getDouble(5) == qty.getDouble(3))            // max
  }
}
