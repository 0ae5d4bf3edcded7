package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** Recall of the ANN scale path ([[Similarity.lshTopK]], 8 hyperplanes
  * → 256 buckets) against the brute-force baseline
  * ([[Similarity.simSearch]]) — the quality metric that decides
  * whether the bucketed plan is usable at 100 TB, measured on the
  * fixture and pinned so a regression in the hyperplane set or the
  * bucketing plan fails loudly. Measured numbers are recorded in
  * SURVEY §8. */
class AnnRecallSpec extends AnyFunSuite with SparkSpec {

  /** recall@5 = |LSH top-5 ∩ brute top-5| / |brute top-5|, macro over
    * queries (each query weighs equally, the standard ANN report). */
  private def recallAt5(lsh: Map[Long, Set[Long]],
                        brute: Map[Long, Set[Long]]): Double = {
    val per = brute.map { case (q, truth) =>
      val got = lsh.getOrElse(q, Set.empty)
      (got & truth).size.toDouble / truth.size
    }
    per.sum / per.size
  }

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .map(r => r.getLong(r.fieldIndex("query_id")) ->
        r.getLong(r.fieldIndex("cand_id")))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  test("multi-table LSH recall@5 clears floors; probing raises it") {
    // Fixture geometry: top-5 neighbors sit at cosine ≈ 0.3 (θ ≈ 72°,
    // per-plane agreement p ≈ 0.6) — LSH's worst case, so the floors
    // below are the DIFFUSE-data guarantees of the OR-construction
    // (1-(1-p^b)^L), with ~3σ margin over 50 query-neighbor trials:
    //   one 8-bit table:        p^8            ≈ 0.02–0.04
    //   8 tables × 4 bits:      1-(1-p^4)^8    ≈ 0.67  → floor 0.45
    //   + one-bit probe/table:  per-table p^4+4p^3(1-p) ≈ 0.48
    //                           → 1-(1-.48)^8  ≈ 0.99  → floor 0.85
    // A concentrated real corpus (p ≥ 0.9) clears far higher at far
    // lower candidate cost; this spec pins the structure, not luck.
    val brute = topSets(Similarity.simSearch(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("rank") <= 5))
    val oneTable = topSets(Similarity.lshTopK(spark, sfDir, 5,
      bitsPerTable = 8, tables = 1))
    val multi = topSets(Similarity.lshTopK(spark, sfDir, 5))
    val probed = topSets(Similarity.lshTopK(spark, sfDir, 5, oneBitProbe = true))
    val rOne = recallAt5(oneTable, brute)
    val rMulti = recallAt5(multi, brute)
    val rProbed = recallAt5(probed, brute)
    info(f"recall@5 — 1 table x 8 bits: $rOne%.3f, " +
      f"8 tables x 4 bits: $rMulti%.3f, + one-bit probe: $rProbed%.3f")
    assert(rMulti > rOne,
      f"multi-table $rMulti%.3f not above single-table $rOne%.3f")
    assert(rMulti >= 0.45, f"multi-table recall@5 $rMulti%.3f below floor")
    assert(rProbed >= rMulti,
      f"probed recall $rProbed%.3f below unprobed $rMulti%.3f")
    assert(rProbed >= 0.85, f"probed recall@5 $rProbed%.3f below floor")
  }

  test("IVF (16 cells, nprobe=2) recall@5 beats its random-candidate floor") {
    // IVF probes 2 of 16 cells ≈ 1/8 of the corpus per query. If cell
    // membership were independent of similarity, expected recall would
    // be ~0.125; a working coarse quantizer routes queries toward their
    // neighbors' cells, so the measured recall must sit WELL above that
    // chance line even on this diffuse fixture (it cannot reach LSH's
    // multi-table numbers at nprobe=2 — that's the cost/recall trade).
    val brute = topSets(Similarity.simSearch(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("rank") <= 5))
    val ivf = topSets(Similarity.simSearchIvf(spark, sfDir))
    val r = recallAt5(ivf, brute)
    info(f"recall@5 — IVF 16 cells nprobe=2: $r%.3f")
    assert(r >= 0.25, f"IVF recall@5 $r%.3f not above the ~0.125 chance line")
  }

  test("Lloyd-trained IVF: unbiased recall well above chance, no extra scan cost") {
    // VERDICT r4 #6 asked whether a trained codebook beats the seed
    // vectors. Measured finding (recorded in SURVEY §8): the SEED
    // codebook's recall is INFLATED on this fixture because the query
    // set (vec_id < 10) is a subset of the seed centroids
    // (vec_id < 16) — every query is its own cell's center, so its
    // neighbors land in its probed cell by construction (0.94). Lloyd
    // training moves centroids to cluster means, removing that
    // coincidence: the trained numbers (~0.86 recall at ~12% of the
    // corpus scanned, 2 rounds; 3 rounds identical — converged) are
    // the honest cost/recall point a production corpus (where queries
    // are NOT centroids) would see. So the assertions pin: trained
    // recall far above the ~0.125 chance line, scan volume not above
    // the seed codebook's, and convergence by round 2.
    val brute = topSets(Similarity.simSearch(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("rank") <= 5))
    val seed = recallAt5(topSets(Similarity.simSearchIvf(spark, sfDir)), brute)
    val trained = recallAt5(
      topSets(Similarity.simSearchIvfTrained(spark, sfDir)), brute)
    val seedPairs = Similarity.ivfScannedPairs(spark, sfDir, 0)
    val trainedPairs =
      Similarity.ivfScannedPairs(spark, sfDir, Similarity.IvfLloydRounds)
    info(f"recall@5 — IVF seed: $seed%.3f ($seedPairs pairs), " +
      f"trained: $trained%.3f ($trainedPairs pairs)")
    assert(trained >= 0.6,
      f"trained recall $trained%.3f not well above the ~0.125 chance line")
    assert(trainedPairs <= seedPairs * 1.2,
      s"trained codebook scans more candidates ($trainedPairs > $seedPairs)")
  }

  test("PQ (16x256, ADC) first-pass recall@5 clears the 0.5 bar") {
    // 8-bit product codes keep 16x less than float32 (vs int8's 4x).
    // Vectors are unit-normalized before encoding (unit-sphere L2
    // tracks cosine), so what this measures is pure quantization
    // distortion. r7's 8x16 (4-bit) trade measured 0.22 on this
    // DIFFUSE fixture (neighbor gaps ≈ 0.3 cosine) — usable only as a
    // pre-rerank filter — and 8x256 with SEED codebooks only 0.26
    // (random codewords cover an 8-dim cell poorly); 16 subspaces of
    // 4 dims x 256 codes is what closes seed-codebook distortion
    // (measured 0.52) so the first pass ranks on its own (VERDICT r7
    // #5). Honesty note: the seed codebook is the first 256 corpus
    // vectors, which self-reconstruct exactly at this 500-vector
    // fixture scale — so recall is ALSO asserted restricted to
    // non-codeword truth (cand_id >= 256), where distortion is fully
    // in play (measured 0.71 — ABOVE overall, i.e. the codeword
    // overlap is not what carries the number).
    val brute = topSets(Similarity.simSearch(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("rank") <= 5))
    val pq = topSets(Similarity.simSearchPq(spark, sfDir))
    val r = recallAt5(pq, brute)
    val restrict = (m: Map[Long, Set[Long]]) =>
      m.map { case (q, s) => q -> s.filter(_ >= 256L) }
    val bruteNc = restrict(brute).filter(_._2.nonEmpty)
    val rNc = recallAt5(restrict(pq), bruteNc)
    info(f"recall@5 — PQ 16x256 ADC vs float cosine: $r%.3f " +
      f"(non-codeword truth: $rNc%.3f over ${bruteNc.size} queries)")
    assert(r >= 0.5, f"PQ recall@5 $r%.3f below floor")
    assert(rNc >= 0.4, f"non-codeword PQ recall@5 $rNc%.3f below floor")
  }

  test("PQ shortlist + exact re-rank recovers the remaining recall") {
    // The production PQ pattern: ADC is the first pass (top-50
    // shortlist, 10% of this fixture's corpus), exact float cosine
    // re-ranks only the shortlist. Final recall = fraction of true
    // top-5 the shortlist catches — must sit at or above the raw ADC
    // top-5 at a re-rank cost of 50 exact cosines per query. (With
    // r7's 4-bit codes this rung recovered 0.22 → 0.88; with 8-bit
    // first-pass codes the recovery margin is smaller but the rung
    // still exists for the tail the codes miss.)
    val brute = topSets(Similarity.simSearch(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("rank") <= 5))
    val raw = topSets(Similarity.simSearchPq(spark, sfDir))
    val rr = topSets(Similarity.simSearchPqRerank(spark, sfDir))
    val rRaw = recallAt5(raw, brute)
    val rRer = recallAt5(rr, brute)
    info(f"recall@5 — PQ raw: $rRaw%.3f, PQ top-50 + exact re-rank: $rRer%.3f")
    assert(rRer >= rRaw, f"re-rank $rRer%.3f below raw ADC $rRaw%.3f")
    assert(rRer >= 0.85, f"re-ranked recall@5 $rRer%.3f below floor")
  }

  test("Lloyd-trained PQ subquantizers beat the seed codebook") {
    // The trained rung above [[simSearchPq]]'s seed codebook (the
    // same train-once posture as the IVF pair): 5 integer-exact Lloyd
    // rounds per 4-dim subspace. Like the trained-IVF test, the
    // number is flattered on this fixture (256 centroids per subspace
    // over 500 points can nearly memorize), so the assertion is the
    // ORDERING — trained must not fall below seed — plus a floor.
    val brute = topSets(Similarity.simSearch(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("rank") <= 5))
    val seed = topSets(Similarity.simSearchPq(spark, sfDir))
    val trained = topSets(Similarity.simSearchPqTrained(spark, sfDir))
    val rSeed = recallAt5(seed, brute)
    val rTrained = recallAt5(trained, brute)
    info(f"recall@5 — PQ seed 16x256: $rSeed%.3f, Lloyd-trained: $rTrained%.3f")
    assert(rTrained >= rSeed,
      f"trained recall $rTrained%.3f below seed $rSeed%.3f")
    assert(rTrained >= 0.6, f"trained recall $rTrained%.3f below floor")
  }

  test("int8-quantized search preserves nearly all float top-5 ranking") {
    // 8-bit symmetric codes perturb each cosine by O(1/127) — tiny
    // against the fixture's neighbor gaps, so the quantized EXHAUSTIVE
    // search must reproduce the float top-5 almost exactly. This is
    // the quality bound that justifies storing int8 at corpus scale.
    val brute = topSets(Similarity.simSearch(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("rank") <= 5))
    val int8 = topSets(Similarity.simSearchInt8(spark, sfDir))
    val r = recallAt5(int8, brute)
    info(f"recall@5 — int8 exhaustive vs float: $r%.3f")
    assert(r >= 0.9, f"int8 recall@5 $r%.3f below floor")
  }

  test("retrained quantizer recovers the recall the fixed-cell cap " +
    "silently drops (nlist grows with n)") {
    import spark.implicits._
    // planted-pair corpus at a scale where the FIXED 16-cell layout
    // saturates the candidate cap: 12k vectors, 16 labels -> 750 per
    // cell > the 512 cap, so ~1/3 of partners are cap-dropped and the
    // fixed path's recall ceiling is the cap ratio, not geometry. The
    // retrained quantizer derives nlist = 64 from n, cells land ~187
    // < cap, and recall returns to ~1 (VERDICT r11 watch item).
    val rnd = new scala.util.Random(42)
    val n = 12000
    val rows = (0 until n / 2).flatMap { i =>
      val base = Array.fill(64)(rnd.nextGaussian().toFloat)
      val pert = base.map(x => x + (rnd.nextGaussian() * 0.001).toFloat)
      Seq((2L * i, i % 16, base), (2L * i + 1, i % 16, pert))
    }
    val e = rows.toDF("vec_id", "label", "embedding").cache()
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("vec_id", "nn_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0 until n).count(v =>
        got.get(v.toLong).contains(v.toLong ^ 1L)).toDouble / n
    }
    val cap = graft.llm.Dedup.DedupEmbedCellCap
    val fixed = recallOf(graft.llm.Dedup.dedupEmbedOn(e, cap))
    val nlist = Similarity.retrainNlist(n)
    assert(nlist == 64, s"retrain rule: expected 64 cells, got $nlist")
    val retrained = recallOf(Similarity.dedupEmbedRetrainedOn(e, nlist, cap))
    info(f"planted-pair recall - fixed 16-label: $fixed%.3f, " +
      f"retrained nlist=$nlist: $retrained%.3f")
    // the fixed path's ceiling is ~cap/cell = 512/750 ~ 0.68
    assert(fixed <= 0.85,
      f"fixed path unexpectedly clears the cap ceiling: $fixed%.3f")
    assert(retrained >= 0.95,
      f"retrained recall $retrained%.3f below floor")
    assert(retrained > fixed + 0.1,
      f"retrain did not recover recall: $retrained%.3f vs $fixed%.3f")
    e.unpersist()
    graft.core.Caches.drain(spark)
  }
}
