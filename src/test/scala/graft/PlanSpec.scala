package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Dedup, Similarity}
import graft.operators.{Relational, Streams, Typed, Windows}

/** Physical-plan shape assertions for the new operator families — the
  * properties that matter at 100 TB: dimensions broadcast, no
  * accidental cartesian products, partial aggregation before shuffles,
  * bounded shuffle counts, whole-stage codegen coverage. */
class PlanSpec extends AnyFunSuite with SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("join_multiway broadcasts all three dimensions") {
    val p = plan(Relational.joinMultiway(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("CartesianProduct"))
  }

  test("lateral top-k decorrelates to a windowed plan, never a per-row loop") {
    val p = plan(Relational.joinLateral(spark, sfDir))
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("join_bucketed: sort-merge with no shuffle on either side") {
    val p = plan(Relational.joinBucketed(spark, sfDir))
    assert(p.contains("SortMergeJoin"), p)
    // bucketed co-location: the only exchange is the final output sort
    // (rangepartitioning); a hashpartitioning exchange would mean the
    // join re-shuffled a side and bucketing bought nothing
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // At 100 TB this is the optimizer feature that saves the scan: a
    // selective dimension filter injects a bloom filter into the fact
    // side's scan stage before the shuffle. Local thresholds are far
    // below the defaults, so pin the behavior with test-scaled confs.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force shuffle join
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import graft.core.Tables
      val o = Tables.orders(spark, sfDir)
        .where(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      val l = Tables.lineitem(spark, sfDir)
      val p = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select(l("l_orderkey"), l("l_quantity"))
        .queryExecution.executedPlan.toString
      assert(p.contains("BloomFilterMightContain") || p.contains("bloom_filter"),
        s"no runtime bloom filter injected:\n${p.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("minhash LSH candidate join is an equi-join, not cartesian") {
    val p = plan(Dedup.dedupFuzzy(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("embedding near-dup join shuffles on the coarse label, not all-pairs") {
    val p = plan(Dedup.dedupEmbed(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("table_stats: pruned per-column branches, no whole-row expand") {
    val p = plan(graft.operators.Maintenance.tableStats(spark, sfDir))
    // the rejected shape expanded every row once per column before
    // aggregating; the union shape must show no Expand and a partial+
    // final aggregate pair per column branch
    assert(!p.contains("Expand"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 10, p)
  }

  test("agg_filtered: all filtered measures in ONE aggregate pair") {
    val p = plan(Relational.aggFiltered(spark, sfDir))
    assert(!p.contains("Expand"), p)
    // exactly one partial+final pair — conditional aggregation must not
    // split into per-measure scans or joins
    assert("HashAggregate".r.findAllIn(p).size == 2, p)
    assert(!p.contains("Join"), p)
  }

  test("llm_pack: one shuffle on the shard key plus the oracle sort") {
    val p = plan(graft.llm.Text.pack(spark, sfDir))
    assert("Exchange".r.findAllIn(p).size <= 2, p)
    assert(p.contains("Window"), p)
  }

  test("IVF search: broadcast codebook, map-side argmax, no cartesian") {
    val p = plan(Similarity.simSearchIvf(spark, sfDir))
    // the 16-row codebook must join by broadcast (assignment + probe),
    // never a cartesian that would repartition the corpus against it
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Broadcast"), p)
    // cell assignment is groupBy(vec_id).agg(max(struct)) — partial+
    // final pairs keep the 16× fan-out from ever crossing the shuffle.
    // (struct-typed max buffers fall back from HashAggregate to
    // Object/SortAggregate; any of the three still aggregates map-side)
    assert("(Hash|ObjectHash|Sort)Aggregate".r.findAllIn(p).size >= 2, p)
  }

  test("sim search broadcasts the bounded query side") {
    val p = plan(Similarity.simSearch(spark, sfDir))
    // non-equi top-k probe: nested-loop is expected, but the broadcast
    // must be the 10-row query side (plan should contain a broadcast)
    assert(p.contains("Broadcast"), p)
  }

  test("windowed rank shuffles once on the partition key") {
    val p = plan(Windows.winRank(spark, sfDir))
    // one exchange for the window partition, one range partition for
    // the final oracle sort — nothing else
    assert("Exchange".r.findAllIn(p).size <= 2, p)
    assert(p.contains("Window"), p)
  }

  test("groupBy aggregation is partial+final (map-side combine)") {
    val p = plan(Relational.aggGroupBy(spark, sfDir))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("typed Aggregator keeps partial aggregation (no mapGroups shuffle)") {
    val p = plan(Typed.typedAgg(spark, sfDir))
    // the typed SumCents must compile to a partial+final Aggregate pair
    // (object-hash for the case-class buffer), not a whole-row shuffle
    // into mapGroups (VERDICT r3 #2)
    assert("Aggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("MapGroups"), p)
  }

  test("tumbling window batch form is a plain hash aggregate") {
    val p = plan(Streams.streamTumbling(spark, sfDir))
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"))
  }

  test("relational pipelines run inside whole-stage codegen") {
    // VACUOUS-ASSERT fix (r8 codegen audit): under AQE the
    // pre-execution CodegenMode explain reports "Found 0
    // WholeStageCodegen subtrees" — which CONTAINS the literal the old
    // assertion matched, so the test could never fail. Disable AQE for
    // the explain (codegen happens per stage identically either way;
    // AQE only re-plans between stages) and require a NON-ZERO subtree
    // count, plus a codegen'd scan+agg pipeline marker.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val found = "Found (\\d+) WholeStageCodegen subtrees".r
      for (q <- Seq(
          Relational.scanFilterProject(spark, sfDir),
          Relational.aggGroupBy(spark, sfDir),
          Windows.winAnalytic(spark, sfDir),
          Relational.aggFiltered(spark, sfDir),
          Relational.joinInnerHash(spark, sfDir))) {
        val p = q.queryExecution.explainString(
          org.apache.spark.sql.execution.CodegenMode)
        val n = found.findFirstMatchIn(p).map(_.group(1).toInt)
        assert(n.exists(_ >= 1), s"no codegen subtree: ${p.take(2000)}")
        assert(p.contains("*(1)") || p.contains("WholeStageCodegen (1)"),
          p.take(1000))
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("exact dedup aggregates by hash without sorting the corpus") {
    val p = plan(Dedup.dedupExact(spark, sfDir))
    assert(p.contains("HashAggregate"), p)
  }
}
