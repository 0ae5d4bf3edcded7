package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxnLog

/** Deletion vectors (r11 — merge-on-read DELETE): the SetDV protocol
  * action, [[TxnLog.deleteRangeDV]]'s ladder (untouched / pure-remove
  * / vector, NEVER a rewrite), vector union on repeated deletes,
  * DV-applied reads and time travel, OPTIMIZE/MERGE materialization,
  * the DV-aware conflict checker, CDF delta semantics, checkpoint
  * round-trip, vacuum's sidecar census, and the DV-corrected
  * versions rollup. */
class DeletionVectorSpec extends AnyFunSuite with SparkSpec {

  private def withScratch(body: String => Unit): Unit = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_dv_").toString
    try body(root)
    finally graft.core.Fixtures.deleteRecursively(new java.io.File(root))
  }

  private def hashOf(root: String, dir: String): Seq[Long] =
    Option(new java.io.File(root, dir).listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .map(f => java.nio.file.Files.readAllBytes(f.toPath)
        .foldLeft(17L)((h, b) => h * 31 + b))

  /** The deleteRange ladder fixture: r0=[0,9], r1=[10,19],
    * r2=[20,29] with stats, nostats=[40,44] without. */
  private def stage(root: String): Unit = {
    import spark.implicits._
    for ((name, lo) <- Seq(("r0", 0L), ("r1", 10L), ("r2", 20L))) {
      (lo until lo + 10).map(k => (k, k * 2.0)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/$name")
    }
    (40L to 44L).map(k => (k, 0.0)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$root/nostats")
    val adds: Seq[TxnLog.Entry] = Seq("r0", "r1", "r2").map(n =>
      TxnLog.AddStats(n, TxnLog.statsFor(spark, root, n, "k"))) :+
      TxnLog.add("nostats")
    assert(TxnLog.tryCommit(root, 1, adds, "s"))
  }

  private def keysAt(root: String, v: Int = -1): Seq[Long] =
    TxnLog.read(spark, root, v).select("k")
      .collect().map(_.getLong(0)).sorted.toSeq

  test("deleteRangeDV: untouched / pure-remove / vector, no rewrite") {
    withScratch { root =>
      stage(root)
      val before = Seq("r0", "r1", "r2", "nostats")
        .map(d => d -> hashOf(root, d)).toMap
      val v = TxnLog.deleteRangeDV(spark, root, "k", "15", "29", "s")
      assert(v.contains(2), s"dv delete did not commit: $v")
      // the ladder: r2 fully matches -> PURE REMOVE (metadata only);
      // r1 partially matches -> a VECTOR, not a rewrite; r0 is
      // stats-pruned and nostats probed-but-missed
      val entries = TxnLog.entriesAt(root, 2)
      val removed = entries.collect {
        case TxnLog.Action("remove", f) => f }
      val dvs = entries.collect { case d: TxnLog.SetDV => d }
      assert(removed == Seq("r2"), s"wrong pure-remove set: $removed")
      assert(dvs.map(_.file) == Seq("r1") && dvs.head.rows == 5L,
        s"wrong vector set: $dvs")
      // NOTHING was rewritten: every data file byte-identical,
      // including the vectored one — that is the whole point
      before.foreach { case (d, h) => assert(hashOf(root, d) == h,
        s"merge-on-read delete rewrote $d") }
      assert(keysAt(root) == ((0L to 14L) ++ (40L to 44L)),
        "DV-applied read wrong")
      // time travel: v1 still reads the full content
      assert(keysAt(root, 1) == ((0L to 29L) ++ (40L to 44L)))
      // pruned read applies the vector too
      val (df, scanned, _) =
        TxnLog.readPruned(spark, root, "k", "10", "19")
      assert(scanned.contains("r1"))
      assert(df.select("k").collect().map(_.getLong(0)).sorted.toSeq
        == ((10L to 14L) ++ (40L to 44L)),
        "readPruned must apply the vector")
      // no surviving row matches -> no-op (the vectored rows cannot
      // re-delete)
      assert(TxnLog.deleteRangeDV(spark, root, "k", "16", "19", "s")
        .isEmpty)
      assert(TxnLog.latestVersion(root) == 2)
    }
  }

  test("repeated dv deletes union; pure-remove fires when survivors drain") {
    withScratch { root =>
      stage(root)
      assert(TxnLog.deleteRangeDV(spark, root, "k", "15", "29", "s")
        .contains(2))
      // second delete overlaps r1 again: the new sidecar carries the
      // old vector forward and the pointer's cardinality accumulates
      assert(TxnLog.deleteRangeDV(spark, root, "k", "10", "12", "s")
        .contains(3))
      val st3 = TxnLog.stateAt(root, 3)
      assert(st3.dvs.get("r1").exists(_._2 == 8L),
        s"union cardinality wrong: ${st3.dvs.get("r1")}")
      assert(keysAt(root) == (Seq(13L, 14L) ++ (0L to 9L) ++
        (40L to 44L)).sorted, "unioned vector read wrong")
      // each version of the vector time-travels independently
      assert(keysAt(root, 2) == ((0L to 14L) ++ (40L to 44L)))
      // deleting every surviving row of r1 upgrades to PURE REMOVE —
      // strictly cheaper than growing the vector
      assert(TxnLog.deleteRangeDV(spark, root, "k", "13", "14", "s")
        .contains(4))
      val e4 = TxnLog.entriesAt(root, 4)
      assert(e4.collect { case TxnLog.Action("remove", f) => f }
        == Seq("r1"), "full drain must pure-remove, not vector")
      assert(e4.collect { case d: TxnLog.SetDV => d }.isEmpty)
      assert(keysAt(root) == ((0L to 9L) ++ (40L to 44L)))
    }
  }

  test("OPTIMIZE materializes vectors; vacuum reclaims the retired sidecar") {
    withScratch { root =>
      stage(root)
      assert(TxnLog.deleteRangeDV(spark, root, "k", "15", "29", "s")
        .contains(2))
      val sidecar = TxnLog.stateAt(root, 2).dvs("r1")._1
      val want = keysAt(root)
      assert(TxnLog.compact(spark, root, "opt").contains(3))
      // content identical, no vectors survive, and the outputs
      // PHYSICALLY exclude the deleted rows (raw parquet read)
      assert(keysAt(root) == want)
      val st3 = TxnLog.stateAt(root, 3)
      assert(st3.dvs.isEmpty, "OPTIMIZE must retire vectors")
      val rawRows = st3.live.toSeq.sorted.map(f =>
        spark.read.parquet(s"$root/$f").count()).sum
      assert(rawRows == want.size.toLong,
        s"outputs still hold deleted rows: $rawRows != ${want.size}")
      // the sidecar is no longer referenced at the tip: vacuum at
      // retain=1 reclaims it together with the pre-OPTIMIZE files
      val gone = TxnLog.vacuum(root)
      assert(gone.contains(sidecar),
        s"vacuum must reclaim the retired sidecar: $gone")
      assert(keysAt(root) == want)
    }
  }

  test("vacuum keeps sidecars any retained version still references") {
    withScratch { root =>
      stage(root)
      assert(TxnLog.deleteRangeDV(spark, root, "k", "15", "29", "s")
        .contains(2))
      val sidecar = TxnLog.stateAt(root, 2).dvs("r1")._1
      val gone = TxnLog.vacuum(root, retainVersions = 1)
      assert(!gone.contains(sidecar),
        "vacuum reclaimed a sidecar the tip still reads")
      assert(keysAt(root) == ((0L to 14L) ++ (40L to 44L)))
    }
  }

  test("a rewrite racing a dv delete aborts instead of resurrecting rows") {
    withScratch { root =>
      stage(root)
      // the compaction plans against v1 (no vectors); a dv delete
      // lands before its commit — the output would resurrect the
      // deleted rows, so the conflict checker must abort it
      val v = TxnLog.compact(spark, root, "opt",
        beforeCommit = () => assert(TxnLog.deleteRangeDV(
          spark, root, "k", "15", "29", "sneak").contains(2)))
      assert(v.isEmpty, "compact must abort when a vector changed " +
        "under it")
      assert(keysAt(root) == ((0L to 14L) ++ (40L to 44L)),
        "aborted compact corrupted the table")
      // and the dv delete commutes with a plain interleaved append
      import spark.implicits._
      val v2 = TxnLog.deleteRangeDV(spark, root, "k", "0", "4", "s2",
        beforeCommit = () => {
          Seq((77L, 7.0)).toDF("k", "v")
            .coalesce(1).write.parquet(s"$root/f77")
          assert(TxnLog.commitNext(root,
            Seq(TxnLog.add("f77")), "sneak") == 3)
        })
      assert(v2.contains(4), s"dv delete racing an append must land: $v2")
      assert(keysAt(root) == ((5L to 14L) ++ (40L to 44L) :+ 77L).sorted)
    }
  }

  test("MERGE on a vectored file materializes the vector, never resurrects") {
    import spark.implicits._
    withScratch { root =>
      stage(root)
      assert(TxnLog.deleteRangeDV(spark, root, "k", "15", "29", "s")
        .contains(2))
      // upsert key 10 (lives in vectored r1): the rewrite must keep
      // survivors [11,14], drop vectored [15,19], land the update
      val src = Seq((10L, 99.0)).toDF("k", "v")
      assert(TxnLog.mergeUpsert(spark, root, src, "k", "m")
        .contains(3))
      val got = TxnLog.read(spark, root)
        .select("k", "v").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got(10L) == 99.0, "merge lost the update")
      assert(!(15L to 19L).exists(got.contains),
        "merge resurrected vectored rows")
      assert((11L to 14L).forall(got.contains), "merge lost survivors")
      assert(TxnLog.stateAt(root, 3).dvs.isEmpty,
        "rewritten file must retire its vector")
    }
  }

  test("CDF: dv commits announce exactly the newly deleted rows") {
    withScratch { root =>
      stage(root)
      assert(TxnLog.deleteRangeDV(spark, root, "k", "15", "29", "s")
        .contains(2))
      assert(TxnLog.deleteRangeDV(spark, root, "k", "10", "12", "s")
        .contains(3))
      def changes(fromV: Int, toV: Int) =
        TxnLog.readChanges(spark, root, fromV, toV)
          .select("k", "_change_type").collect()
          .map(r => r.getLong(0) -> r.getString(1)).sorted.toSeq
      // v2 = the vectored rows of r1 + ALL rows of pure-removed r2
      assert(changes(1, 2) == (15L to 29L).map(_ -> "delete"),
        "v2 change set wrong")
      // v3 = only the DELTA of the unioned vector
      assert(changes(2, 3) == (10L to 12L).map(_ -> "delete"),
        "v3 must announce only the new vector delta")
      // a later pure remove of the vectored file announces only its
      // SURVIVING rows — not the already-vectored ones
      assert(TxnLog.deleteRangeDV(spark, root, "k", "13", "14", "s")
        .contains(4))
      assert(changes(3, 4) == Seq(13L -> "delete", 14L -> "delete"),
        "pure remove after vectors re-announced deleted rows")
    }
  }

  test("checkpoint and cleanup round-trip the vector pointers") {
    import spark.implicits._
    withScratch { root =>
      stage(root)
      assert(TxnLog.deleteRangeDV(spark, root, "k", "15", "29", "s")
        .contains(2))
      // pad to the checkpoint interval, then retire the prefix log
      for (i <- 3 to 10) {
        Seq((100L + i, 1.0)).toDF("k", "v")
          .coalesce(1).write.parquet(s"$root/pad$i")
        assert(TxnLog.commitNext(root,
          Seq(TxnLog.add(s"pad$i")), "s") == i)
      }
      assert(TxnLog.checkpoints(root) == Seq(10))
      val wantDvs = TxnLog.stateAt(root, 10).dvs
      assert(wantDvs.contains("r1"))
      assert(TxnLog.cleanupLog(root).nonEmpty)
      // the checkpoint alone must reconstruct pointer AND read
      assert(TxnLog.stateAt(root, 10).dvs == wantDvs,
        "vector pointer lost through checkpoint replay")
      assert(keysAt(root) ==
        ((0L to 14L) ++ (40L to 44L) ++ (103L to 110L)).sorted)
    }
  }

  test("RESTORE rolls vector state back exactly, both directions") {
    withScratch { root =>
      stage(root)
      assert(TxnLog.deleteRangeDV(spark, root, "k", "15", "29", "s")
        .contains(2))
      assert(TxnLog.deleteRangeDV(spark, root, "k", "10", "12", "s")
        .contains(3))
      // back to v2: r1's pointer must return to the FIRST sidecar
      val want2 = TxnLog.stateAt(root, 2).dvs("r1")
      assert(TxnLog.restore(root, 2, "r").contains(4))
      assert(TxnLog.stateAt(root, 4).dvs("r1") == want2,
        "restore did not roll the vector pointer back")
      assert(keysAt(root) == ((0L to 14L) ++ (40L to 44L)))
      // back to v1: vectors cleared, pure-removed file re-added WITH
      // its stats — pruning survives the restore
      assert(TxnLog.restore(root, 1, "r").contains(5))
      assert(TxnLog.stateAt(root, 5).dvs.isEmpty)
      assert(keysAt(root) == ((0L to 29L) ++ (40L to 44L)))
      val (scanned, pruned) = TxnLog.prune(root, 5, "k", "25", "27")
      assert(scanned == Seq("nostats", "r2"),
        s"restored stats must still prune: $scanned / $pruned")
      // FORWARD restore: back to v3's vectored content
      assert(TxnLog.restore(root, 3, "r").contains(6))
      assert(keysAt(root) ==
        (Seq(13L, 14L) ++ (0L to 9L) ++ (40L to 44L)).sorted)
      // idempotent: restoring the tip's own content is a no-op
      assert(TxnLog.restore(root, 6, "r").isEmpty)
      assert(TxnLog.latestVersion(root) == 6)
    }
  }

  test("RESTORE fails loudly when the target's data was vacuumed") {
    withScratch { root =>
      stage(root)
      assert(TxnLog.deleteRange(spark, root, "k", "15", "29", "s")
        .contains(2))
      assert(TxnLog.vacuum(root, retainVersions = 1).nonEmpty)
      val e = intercept[IllegalArgumentException](
        TxnLog.restore(root, 1, "r"))
      assert(e.getMessage.contains("vacuumed"),
        s"wrong failure: ${e.getMessage}")
    }
  }

  test("versionsRollup subtracts each version's vector corrections") {
    withScratch { root =>
      stage(root)
      assert(TxnLog.deleteRangeDV(spark, root, "k", "15", "29", "s")
        .contains(2))
      assert(TxnLog.deleteRangeDV(spark, root, "k", "10", "12", "s")
        .contains(3))
      val got = TxnLog.versionsRollup(spark, root, "v")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
        .toSeq
      // v1: 4 files, 35 rows; v2: r2's 10 gone + 5 vectored = 20
      // rows in 3 files; v3: 3 more vectored = 17, files unchanged
      assert(got == Seq((1, 4, 35L), (2, 3, 20L), (3, 3, 17L)),
        s"rollup wrong under vectors: $got")
    }
  }
}
