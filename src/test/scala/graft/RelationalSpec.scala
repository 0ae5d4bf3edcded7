package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.Relational

class RelationalSpec extends AnyFunSuite with SparkSpec {

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("all registered queries execute and return rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("approx_count_distinct verdict: exact anchor matches a direct " +
    "recount and the sketch lands within its declared ε") {
    val r = Relational.aggApproxDistinct(spark, sfDir).head()
    val exact = Tables.lineitem(spark, sfDir)
      .select(countDistinct(col("l_partkey"))).head().getLong(0)
    assert(r.getLong(0) == exact, s"exact anchor ${r.getLong(0)} != $exact")
    assert(r.getBoolean(1), "sketch outside its declared 10% tolerance")
  }

  test("grouping sets: detail rows reconcile to subtotals and grand total") {
    val rows = Relational.aggGroupingSets(spark, sfDir).collect()
    val byGid = rows.groupBy(_.getLong(0))
    assert(byGid.keySet == Set(0L, 1L, 3L)) // detail, per-status, total
    val total = byGid(3L).map(_.getLong(3)).sum
    assert(byGid(0L).map(_.getLong(3)).sum == total)
    assert(byGid(1L).map(_.getLong(3)).sum == total)
    // no per-priority slice: gid 2 must be absent (GROUPING SETS ≠ CUBE)
    assert(!byGid.contains(2L))
  }

  test("fn_regex counts are consistent with the raw text") {
    val out = graft.operators.Functions.fnRegex(spark, sfDir)
      .join(Tables.documents(spark, sfDir), "doc_id")
    // squeezing only removes characters
    assert(out.where(col("squeezed_len") > length(col("text"))).count() == 0)
    // first_word is the leading space-split token
    assert(out.where(col("first_word") =!=
      split(col("text"), " ").getItem(0)).count() == 0)
  }

  test("interval-overlap bucket join agrees with the direct range predicate") {
    import org.apache.spark.sql.functions.session_window
    import graft.core.Det.epochUs
    val e = Tables.events(spark, sfDir)
    val s = e.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)))
      .select(col("user_id"), col("session_window.start").as("sstart"),
        epochUs(col("session_window.start")).as("s_us"),
        epochUs(col("session_window.end")).as("e_us"))
    val busy = e.select((epochUs(col("ts")) / 3600000000L).cast("long").as("hb"))
      .groupBy(col("hb")).count()
      .orderBy(col("count").desc, col("hb")).limit(10)
      .select(col("hb"), (col("hb") * 3600000000L).as("h_lo"),
        ((col("hb") + 1) * 3600000000L).as("h_hi"))
    // brute-force overlap count per session via the range predicate
    val direct = s.join(broadcast(busy),
        col("s_us") < col("h_hi") && col("e_us") > col("h_lo"))
      .groupBy(col("user_id"), col("sstart")).count()
    val bucketed = Relational.joinIntervalOverlap(spark, sfDir)
    assert(direct.count() == bucketed.count())
    assert(bucketed.join(direct, Seq("user_id", "sstart"))
      .where(col("n_busy_hours") =!= col("count")).count() == 0)
  }

  test("streaks: brute-force consecutive-day scan agrees for the top customer") {
    val top = graft.operators.Windows.winStreaks(spark, sfDir).head()
    val (cust, streak) = (top.getLong(0), top.getLong(1))
    val days = Tables.orders(spark, sfDir)
      .where(col("o_custkey") === cust)
      .select(expr("datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01')")
        .cast("long").as("d"))
      .distinct().orderBy(col("d")).collect().map(_.getLong(0))
    var (best, cur) = (1L, 1L)
    days.sliding(2).foreach { w =>
      if (w.length == 2) {
        cur = if (w(1) == w(0) + 1) cur + 1 else 1L
        best = math.max(best, cur)
      }
    }
    assert(best == streak, s"cust $cust: brute $best vs $streak")
  }

  test("sessionize: driver-loop gap scan agrees for the busiest user") {
    val sess = graft.operators.Windows.winSessionize(spark, sfDir)
    val busiest = sess.groupBy(col("user_id")).count()
      .orderBy(col("count").desc, col("user_id")).head().getLong(0)
    val times = Tables.events(spark, sfDir)
      .where(col("user_id") === busiest)
      .select(graft.core.Det.epochUs(col("ts"))).orderBy(col("ts"))
      .collect().map(_.getLong(0))
    var nSess = 1
    times.sliding(2).foreach { w =>
      if (w.length == 2 && w(1) - w(0) > 1800000000L) nSess += 1
    }
    val got = sess.where(col("user_id") === busiest).count()
    assert(got == nSess, s"user $busiest: brute $nSess vs $got sessions")
    // session boundaries partition the events: sizes must sum to total
    val sumEvents = sess.where(col("user_id") === busiest)
      .agg(sum(col("n_events"))).head().getLong(0)
    assert(sumEvents == times.length)
  }

  test("ewma: driver-loop weighted average agrees for one event type") {
    val rows = graft.operators.Windows.tsEwma(spark, sfDir)
      .where(col("event_type") === "click")
      .orderBy(col("day")).collect()
    val n = rows.map(_.getLong(2))
    rows.zipWithIndex.foreach { case (r, i) =>
      var (num, den) = (0.0, 0.0)
      (0 to 7).foreach { k =>
        if (i - k >= 0) { num += n(i - k) * math.pow(0.5, k); den += math.pow(0.5, k) }
      }
      assert(math.abs(r.getDouble(3) - num / den) < 1e-9,
        s"day ${r.get(1)}: ${r.getDouble(3)} vs ${num / den}")
    }
    assert(rows.length > 10)
  }

  test("discounted return: bit-exact vs a driver-loop recomputation") {
    val out = graft.operators.Windows.tsDiscountedReturn(spark, sfDir).cache()
    // terminal event of a trajectory: only its own reward contributes,
    // so ret8 == vc/100 (the same correctly-rounded rational)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us").desc, col("event_id").desc)
    val last = out.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
    assert(last.where(col("ret8") =!=
      col("vc").cast("double") / lit(100.0)).count() == 0)
    // full driver recomputation of one user's trajectory
    val uid = out.select("user_id").head.getLong(0)
    val seq = out.where(col("user_id") === uid)
      .orderBy("us", "event_id").select("vc", "ret8").collect()
    val vcs = seq.map(_.getLong(0))
    seq.zipWithIndex.foreach { case (r, i) =>
      val g = (0 to 7).map(k =>
        if (i + k < vcs.length) vcs(i + k) * (1L << (7 - k)) else 0L).sum
      assert(r.getDouble(1) == g.toDouble / 12800.0,
        s"event $i of user $uid")
    }
    assert(seq.nonEmpty)
    out.unpersist()
    graft.core.Caches.drain(spark)
  }

  test("attribution matrix reconciles with purchase totals") {
    val out = graft.operators.Windows.winAttribution(spark, sfDir).cache()
    val purchases = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
    assert(out.agg(sum(col("n_purchases"))).head.getLong(0)
      == purchases.count(), "every purchase attributed exactly once")
    // brute-force one user's first/last touch on the driver
    val uid = purchases.select("user_id").head.getLong(0)
    val evs = Tables.events(spark, sfDir)
      .where(col("user_id") === uid)
      .select(graft.core.Det.epochUs(col("ts")).as("us"), col("event_id"),
        col("event_type"))
      .orderBy("us", "event_id").collect().map(_.getString(2))
    val firstTouch = evs.head
    // the user's purchases must appear under their computed first touch
    val attributed = out.where(col("first_touch") === firstTouch)
      .agg(sum(col("n_purchases"))).head.getLong(0)
    assert(attributed >= evs.count(_ == "purchase") ||
      !evs.contains("purchase"))
    out.unpersist()
    graft.core.Caches.drain(spark)
  }

  test("pareto deciles partition customers; shares monotone to 1.0") {
    val rows = graft.operators.Windows.winPareto(spark, sfDir).collect()
    val nCust = Tables.orders(spark, sfDir)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    val shares = rows.sortBy(_.getLong(0)).map(_.getDouble(2))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b },
      "cumulative share must be monotone")
    assert(shares.last == 1.0)
    // the 80% headcount: reconcile against a driver sort
    val revs = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(sum(graft.core.Det.cents(col("o_totalprice"))).as("rev"))
      .collect().map(_.getLong(1)).sorted.reverse
    val total = revs.sum
    var (cum, inside) = (0L, 0)
    revs.foreach { r => cum += r; if (cum * 5 <= total * 4) inside += 1 }
    assert(rows.map(_.getLong(3)).sum == inside)
    graft.core.Caches.drain(spark)
  }

  test("seasonal-naive backtest matches a driver-loop MAE") {
    val out = graft.operators.Windows.tsForecastSnaive(spark, sfDir)
      .where(col("event_type") === "click").head()
    val days = Tables.events(spark, sfDir)
      .where(col("event_type") === "click")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
      .orderBy("day").collect().map(_.getLong(1))
    val scored = days.indices.drop(7)
    val maeN = scored.map(i => math.abs(days(i) - days(i - 1))).sum.toDouble / scored.size
    val maeS = scored.map(i => math.abs(days(i) - days(i - 7))).sum.toDouble / scored.size
    assert(out.getLong(1) == scored.size)
    assert(out.getDouble(2) == maeN && out.getDouble(3) == maeS)
    graft.core.Caches.drain(spark)
  }

  test("gini matches a brute-force computation and sits in [0, 1)") {
    val ours = Relational.aggGini(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    ours.values.foreach(g => assert(g >= 0.0 && g < 1.0))
    val (status, g) = ours.head
    val cents = Tables.orders(spark, sfDir)
      .where(col("o_orderstatus") === status)
      .select(graft.core.Det.cents(col("o_totalprice")))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toDouble
    val src = cents.zipWithIndex.map { case (c, i) => (i + 1).toDouble * c }.sum
    val brute = 2.0 * src / (n * cents.map(_.toDouble).sum) - (n + 1.0) / n
    assert(math.abs(g - brute) < 1e-9, s"$status: $g vs $brute")
  }

  test("argmax picks the true extreme rows with the smallest key on ties") {
    val o = Tables.orders(spark, sfDir)
    Relational.aggArgmax(spark, sfDir).collect().foreach { r =>
      val (status, topKey, topPrice) =
        (r.getString(0), r.getLong(2), r.getDouble(3))
      val grp = o.where(col("o_orderstatus") === status)
      assert(topPrice ==
        grp.agg(max(col("o_totalprice"))).head().getDouble(0))
      assert(topKey ==
        grp.where(col("o_totalprice") === topPrice)
          .agg(min(col("o_orderkey"))).head().getLong(0))
      assert(r.getDouble(5) ==
        grp.agg(min(col("o_totalprice"))).head().getDouble(0))
    }
  }

  test("month-over-month growth deltas reconcile with the revenue series") {
    val rows = graft.operators.Windows.tsMomGrowth(spark, sfDir)
      .orderBy(col("month")).collect()
    assert(rows.head.isNullAt(3) && rows.head.isNullAt(4))
    rows.sliding(2).foreach { w =>
      if (w.length == 2) {
        assert(w(1).getDouble(3) == w(0).getDouble(2)) // prev = last revenue
        assert(w(1).getDouble(4) == w(1).getDouble(2) - w(0).getDouble(2))
      }
    }
  }

  test("entropy is bounded by ln(categories) and zero iff one category") {
    Relational.aggEntropy(spark, sfDir).collect().foreach { r =>
      val (nCat, h) = (r.getLong(1), r.getDouble(3))
      assert(h >= 0.0 && h <= math.log(nCat.toDouble) + 1e-9)
      if (nCat == 1) assert(h == 0.0)
    }
  }

  test("agg_skew_kurt matches Spark's built-in skewness/kurtosis to tolerance") {
    val ours = Relational.aggSkewKurt(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    val builtin = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(skewness(col("l_quantity")).as("s"), kurtosis(col("l_quantity")).as("k"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    ours.foreach { case (flag, (s, k)) =>
      assert(math.abs(s - builtin(flag)._1) < 1e-6, s"skew $flag")
      assert(math.abs(k - builtin(flag)._2) < 1e-6, s"kurt $flag")
    }
  }

  test("weighted average sits inside the price range and differs from plain avg") {
    Relational.aggWeightedAvg(spark, sfDir).collect().foreach { r =>
      val (wavg, avg) = (r.getDouble(3), r.getDouble(4))
      assert(wavg > 0 && avg > 0)
      assert(math.abs(wavg / avg - 1.0) < 0.5) // same order of magnitude
    }
  }

  test("join_null_safe matches NULL keys and loses no rows") {
    val rows = Relational.joinNullSafe(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = Tables.orders(spark, sfDir)
    // every order lands in exactly one label group — NULLs included
    assert(rows.values.sum == o.count())
    assert(rows("open") == o.where(col("o_orderstatus") === "O").count())
  }

  test("join_null_safe stays a broadcast hash join (no nested loop fallback)") {
    val plan = Relational.joinNullSafe(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("agg_mode picks a maximal-count value per group") {
    val counts = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_quantity")).count()
    val maxPer = counts.groupBy(col("l_returnflag"))
      .agg(max(col("count")).as("max_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Relational.aggMode(spark, sfDir).collect().foreach { r =>
      assert(r.getLong(2) == maxPer(r.getString(0)))
    }
  }

  test("ts_seasonality covers the full week and reconciles to the table") {
    val rows = graft.operators.Windows.tsSeasonality(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 7))
    assert(rows.map(_.getLong(1)).sum == Tables.orders(spark, sfDir).count())
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-12)
  }

  test("fn_interval calendar fields are mutually consistent") {
    val out = graft.operators.Functions.fnInterval(spark, sfDir)
    // +3 months is exactly 3 calendar months ahead
    assert(out.where(
      (year(col("plus_3m")) * 12 + month(col("plus_3m"))) -
        (year(col("month_first")) * 12 + month(col("month_first"))) =!= 3)
      .count() == 0)
    // month_first is day 1 of the order's month, quarter_start day 1 of its quarter
    assert(out.where(dayofmonth(col("month_first")) =!= 1).count() == 0)
    assert(out.where(dayofmonth(col("quarter_start")) =!= 1 ||
      (month(col("quarter_start")) - 1) % 3 =!= 0).count() == 0)
  }

  test("agg_corr matches Spark's built-in corr to statistical tolerance") {
    val ours = Relational.aggCorr(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val builtin = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ours.keySet == builtin.keySet)
    ours.foreach { case (k, v) =>
      assert(math.abs(v - builtin(k)) < 1e-6, s"$k: $v vs ${builtin(k)}")
      assert(v >= -1.0 && v <= 1.0)
    }
  }

  test("merge_upsert: row accounting and op tags are consistent") {
    val orders = Tables.orders(spark, sfDir)
    val nOrders = orders.count()
    val nUpd = orders.where(col("o_orderkey") % 100 < 5).count()
    val nIns = orders.where((col("o_orderkey") % 100).isin(5, 6)).count()
    val out = Relational.mergeUpsert(spark, sfDir)
      .groupBy(col("op")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("update") == nUpd)
    assert(out("insert") == nIns)
    assert(out("keep") == nOrders - nUpd)
    assert(out.values.sum == nOrders + nIns)
  }

  test("text-source scans agree with the parquet original") {
    val parquetRows = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy(col("n_nationkey")).collect().toSeq
    assert(Relational.scanJson(spark, sfDir).collect().toSeq == parquetRows)
    assert(Relational.scanCsv(spark, sfDir).collect().toSeq == parquetRows)
    assert(Relational.scanText(spark, sfDir).collect().toSeq == parquetRows)
  }

  test("approx_percentile verdict: every group's sketch passes the " +
    "tie-safe rank test at both quantiles") {
    val rows = Relational.aggApproxPercentile(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getString(0)
      assert(r.getLong(1) > 0, s"$flag: empty group")
      assert(r.getBoolean(2), s"$flag: p50 outside rank tolerance")
      assert(r.getBoolean(3), s"$flag: p95 outside rank tolerance")
    }
  }

  test("scan_filter_project pushes predicates and prunes columns") {
    val plan = Relational.scanFilterProject(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
           (plan.contains("l_shipdate") || plan.contains("l_quantity")),
      s"no pushed filters in plan:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("l_extendedprice"),
      "projection not pruned to 4 columns")
  }

  test("join_inner_hash broadcasts the customer side") {
    val plan = Relational.joinInnerHash(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("join_theta_range never plans a cartesian product") {
    val plan = Relational.joinThetaRange(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
  }

  test("sort_limit plans TakeOrderedAndProject (no global sort)") {
    val plan = Relational.sortLimit(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("asof join picks at most one order per event, at-or-before ts") {
    val out = Relational.joinAsof(spark, sfDir)
    val events = Tables.events(spark, sfDir).count()
    assert(out.count() == events, "exactly one row per event")
    val bad = out.where(col("o_orderdate") > col("ts")).count()
    assert(bad == 0, "order after event ts")
  }

  test("bitmap semi-join equals left_semi and keeps a broadcast hash probe") {
    val out = Relational.joinBitmapSemi(spark, sfDir)
    val semi = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
          .where(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"), col("l_extendedprice"))
    assert(out.exceptAll(semi).isEmpty && semi.exceptAll(out).isEmpty,
      "bitmap membership diverges from left_semi")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bitmap probe should broadcast the word table:\n${plan.take(2000)}")
  }

  test("windowed topk emits at most 3 ranked types per window") {
    val out = graft.operators.Streams.streamTopk(spark, sfDir)
    assert(out.groupBy(col("wstart")).count()
      .where(col("count") > 3).count() == 0)
    // rank 1 is the window's max count
    val top = out.where(col("rk") === 1).select(col("wstart"), col("n"))
    val mx = out.groupBy(col("wstart")).agg(max(col("n")).as("m"))
    assert(top.join(mx, "wstart").where(col("n") =!= col("m")).count() == 0)
  }

  test("topk+others reconciles: 11 rows and parts sum to the grand total") {
    val out = Relational.aggTopkOthers(spark, sfDir).collect()
    assert(out.length == 11 && out.map(_.getInt(2)).toSeq == (1 to 11))
    val total = out.map(r => math.round(r.getDouble(1) * 100)).sum
    val expect = Tables.orders(spark, sfDir)
      .agg(sum(graft.core.Det.cents(col("o_totalprice")))).head.getLong(0)
    assert(total == expect, s"cents drift: $total != $expect")
    // top-10 really are the 10 largest
    val top10 = out.filter(_.getInt(2) <= 10).map(r =>
      math.round(r.getDouble(1) * 100))
    assert(top10.sorted.reverse.toSeq == top10.toSeq, "not sorted desc")
  }

  test("acf: r is in [-1, 1] and lag pairs count down from the series length") {
    val out = graft.operators.Windows.tsAcf(spark, sfDir)
    assert(out.count() == 15) // 5 types x lags 1..3
    assert(out.where(abs(col("r")) > 1.0 + 1e-12).count() == 0)
    val days = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts").cast("date")).distinct()
      .groupBy(col("event_type")).count().withColumnRenamed("count", "d")
    assert(out.join(days, "event_type")
      .where(col("m") =!= col("d") - col("lag")).count() == 0,
      "pair count should be series length minus lag")
  }

  test("blocklist filter: hit accounting matches a manual recount") {
    val out = graft.llm.Text.blocklistFilter(spark, sfDir)
    assert(out.where(col("n_blocked") > col("n_tokens")).count() == 0)
    assert(out.where(col("keep_doc") =!= (col("blocked_ratio") < 0.5))
      .count() == 0)
    // total blocked hits equal the corpus-wide frequency of the top-5
    val blocked = out.agg(sum(col("n_blocked"))).head.getLong(0)
    val tok = Tables.documents(spark, sfDir)
      .select(explode(filter(split(lower(col("text")), " "),
        t => t =!= "")).as("term"))
    val top5 = tok.groupBy(col("term")).count()
      .orderBy(col("count").desc, col("term")).limit(5)
    val expect = top5.agg(sum(col("count"))).head.getLong(0)
    assert(blocked == expect, s"blocked=$blocked expect=$expect")
  }

  test("theil-sen slope matches a driver-side brute force for one type") {
    val out = graft.operators.Windows.tsTheilSen(spark, sfDir)
      .where(col("event_type") === "click").head()
    val days = Tables.events(spark, sfDir)
      .where(col("event_type") === "click")
      .groupBy(col("ts").cast("date").as("day")).count()
      .orderBy(col("day")).collect()
      .map(r => r.getLong(1))
    val slopes = for {
      i <- days.indices; j <- (i + 1) until days.length
    } yield (days(j) - days(i)).toDouble / (j - i)
    def med(v: Seq[Double]): Double = {
      val s = v.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    assert(out.getDouble(1) == med(slopes), "slope != brute-force median")
    val resid = days.indices.map(i => days(i) - out.getDouble(1) * i)
    assert(out.getDouble(2) == med(resid), "intercept != residual median")
    assert(out.getLong(3) == days.length)
  }

  test("lag-corr reconciles with a driver Pearson over the daily series") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val xs = daily.filter(_._1 == "view").map(t => t._2 -> t._3).toMap
    val ys = daily.filter(_._1 == "purchase").map(t => t._2 -> t._3).toMap
    val out = graft.operators.Windows.tsLagCorr(spark, sfDir).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    out.foreach { r =>
      val lag = r.getInt(0)
      val pairs = xs.toSeq.flatMap { case (d, x) =>
        ys.get(d.plusDays(lag.toLong)).map(y => (x, y)) }
      assert(r.getLong(1) == pairs.length, s"m at lag $lag")
      val m = pairs.length.toDouble
      val (sx, sy) = (pairs.map(_._1).sum.toDouble, pairs.map(_._2).sum.toDouble)
      val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
      val syy = pairs.map(p => p._2 * p._2).sum.toDouble
      val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
      val expect = (m * sxy - sx * sy) /
        math.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
      assert(math.abs(r.getDouble(2) - expect) < 1e-9, s"r at lag $lag")
    }
  }

  test("unigram coverage thresholds reconcile with a driver recount") {
    val freq = Tables.documents(spark, sfDir)
      .select(explode(expr(
        "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("t"))
      .groupBy(col("t")).count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val ordered = freq.sortBy { case (t, c) => (-c, t) }
    val total = ordered.map(_._2).sum
    val cums = ordered.scanLeft(0L)(_ + _._2).drop(1)
    val out = graft.llm.Text.unigramCoverage(spark, sfDir).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(50, 90, 99))
    out.foreach { r =>
      val pct = r.getInt(0)
      val k = cums.indexWhere(c => c * 100 >= pct * total) + 1
      assert(r.getLong(1) == k, s"vocab_size at $pct")
      assert(r.getLong(2) == cums(k - 1), s"covered at $pct")
      assert(r.getLong(3) == total)
    }
  }

  test("target encoding is the exact m-estimate and shrinks toward global") {
    val rows = graft.operators.Features.targetEncode(spark, sfDir).collect()
    val joined = Tables.orders(spark, sfDir).join(
      Tables.customer(spark, sfDir),
      col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val gN = joined.length.toLong
    val gSum = joined.map(_._2).sum
    rows.foreach { r =>
      val (seg, n, sumT) = (r.getString(0), r.getLong(1), r.getLong(2))
      val mine = joined.filter(_._1 == seg)
      assert(n == mine.length.toLong && sumT == mine.map(_._2).sum)
      assert(r.getLong(3) == 1000000L * gSum / gN, "global rate")
      val enc = 1000000L * (sumT * gN + 20L * gSum) / (gN * (n + 20L))
      assert(r.getLong(4) == enc, s"enc of $seg")
      // m-estimate lies between the category rate and the global rate
      val catPpm = if (n > 0) 1000000L * sumT / n else r.getLong(3)
      val lo = math.min(catPpm, r.getLong(3)) - 1
      val hi = math.max(catPpm, r.getLong(3)) + 1
      assert(enc >= lo && enc <= hi, s"enc of $seg not between rates")
    }
  }

  test("basket lift reconciles with a driver recount for the top pair") {
    val rows = graft.operators.Stats.basketLift(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val items = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = items.map(_._1).distinct.length.toLong
    val itemN = items.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val byOrder = items.groupBy(_._1).map { case (_, v) => v.map(_._2).toSet }
    rows.foreach { r =>
      val (a, b, nab) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val expect = byOrder.count(s => s(a) && s(b)).toLong
      assert(nab == expect, s"n_ab of ($a,$b)")
      assert(r.getLong(3) == itemN(a) && r.getLong(4) == itemN(b))
      assert(r.getLong(7) == 1000000L * nab * nOrders / (itemN(a) * itemN(b)),
        s"lift of ($a,$b)")
    }
    // descending lift with (a, b) tiebreak
    val order = rows.map(r => (r.getLong(7), r.getLong(0), r.getLong(1)))
    assert(order.sameElements(order.sortBy { case (l, a, b) => (-l, a, b) }))
  }

  test("welch t-test reconciles with a two-pass driver computation") {
    val row = graft.operators.Stats.abTest(spark, sfDir).head()
    val vals = Tables.orders(spark, sfDir).join(
        Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment"), col("o_totalprice")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val a = vals.filter(_._1 == "BUILDING").map(_._2)
    val b = vals.filter(_._1 == "MACHINERY").map(_._2)
    assert(row.getLong(0) == a.length.toLong && row.getLong(1) == b.length.toLong)
    // means agree with an independent cents-exact recomputation
    val meanA = a.map(v => math.round(v * 100)).sum.toDouble / 100.0 / a.length
    val meanB = b.map(v => math.round(v * 100)).sum.toDouble / 100.0 / b.length
    assert(math.abs(row.getDouble(2) - meanA) < 1e-6, "mean_a")
    assert(math.abs(row.getDouble(3) - meanB) < 1e-6, "mean_b")
    // t has the sign of the mean difference; df is between min(n)-1 and
    // n_a+n_b-2 (the Welch-Satterthwaite bracket)
    assert(row.getDouble(6).sign == (meanA - meanB).sign)
    val df = row.getDouble(7)
    assert(df >= math.min(a.length, b.length) - 1.0 &&
      df <= a.length + b.length - 2.0, s"df=$df out of bracket")
  }

  test("equal-width bins partition the domain and account for every row") {
    val rows = graft.operators.Features.binning(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 10L))
    val n = Tables.customer(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == n, "row conservation")
    // ranges are disjoint and ordered; mean sits inside its range
    rows.sliding(2).foreach {
      case Array(x, y) => assert(x.getLong(3) < y.getLong(2))
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(5) && r.getLong(5) <= r.getLong(3),
        s"mean outside range in bin ${r.getLong(0)}")
    }
  }

  test("hash buckets conserve rows and count their features correctly") {
    val rows = graft.operators.Features.hashBucket(spark, sfDir).collect()
    val total = Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum == total, "row conservation")
    // 25 raw features land in <= 25 distinct buckets
    assert(rows.map(_.getLong(1)).sum == 25L, "feature count")
    assert(rows.length <= 25)
    rows.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) < 64))
  }

  test("chi-squared statistic reconciles with a driver contingency table") {
    val row = graft.operators.Stats.chi2Test(spark, sfDir).head()
    val cells = Tables.orders(spark, sfDir).join(
        Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderstatus")).count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val n = cells.map(_._2).sum
    val rMarg = cells.groupBy(_._1._1).map { case (k, v) => k -> v.map(_._2).sum }
    val cMarg = cells.groupBy(_._1._2).map { case (k, v) => k -> v.map(_._2).sum }
    val chi2Micro = cells.map { case ((s, t), o) =>
      val e = (rMarg(s) * cMarg(t)).toDouble / n.toDouble
      val d = o.toDouble - e
      math.round(d * d / e * 1000000.0)
    }.sum
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == (rMarg.size - 1).toLong * (cMarg.size - 1))
    assert(row.getLong(2) == chi2Micro, "chi2 micro-units")
  }

  test("holt forecast reconciles with a driver recursion on one series") {
    val out = graft.operators.Windows.tsForecastHolt(spark, sfDir)
      .where(col("event_type") === "click").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    val days = Tables.events(spark, sfDir)
      .where(col("event_type") === "click")
      .groupBy(col("ts").cast("date").as("day")).count()
      .orderBy(col("day")).collect().map(_.getLong(1))
    // run the actual alpha=beta=1/2 recursion over the last 8 obs
    // ending at the cutoff (3 observed days before the end) in EXACT
    // rational arithmetic — the unrolled dyadic coefficients must
    // equal the zero-seeded recursion to the last bit
    case class Rat(n: BigInt, d: BigInt) {
      def +(o: Rat) = Rat(n * o.d + o.n * d, d * o.d)
      def -(o: Rat) = Rat(n * o.d - o.n * d, d * o.d)
      def half = Rat(n, d * 2)
      def times65536: BigInt = { val x = n * 65536; assert(x % d == 0); x / d }
    }
    val upto = days.dropRight(3).takeRight(8)
    var l = Rat(0, 1)
    var b = Rat(0, 1)
    upto.foreach { y =>
      val lNew = (Rat(BigInt(y), 1) + l + b).half
      b = (lNew - l).half + b.half
      l = lNew
    }
    out.foreach { r =>
      val h = r.getInt(1)
      val expect = (l.times65536 + b.times65536 * h).toLong
      assert(r.getLong(2) == expect, s"h=$h forecast_fp")
      assert(r.getLong(4) == days(days.length - 3 + h - 1), s"actual h=$h")
    }
  }

  test("mmr picks are the exact greedy argmax over the shortlist") {
    val out = graft.llm.Similarity.mmrDiversify(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val byQuery = out.groupBy(_._1)
    assert(byQuery.size > 0 && byQuery.values.forall(_.length == 5))
    // driver greedy over the brute-force shortlist
    val e = graft.core.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0
      var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
      def nrm(x: Array[Float]) =
        math.sqrt(x.map(v => v.toDouble * v.toDouble).sum)
      dot / (nrm(a) * nrm(b))
    }
    for ((qid, picks) <- byQuery) {
      val shortlist = e.keys.filter(_ != qid).toSeq
        .map(c => c -> cos(e(qid), e(c)))
        .sortBy { case (c, s) => (-s, c) }.take(20)
      var selected = Vector.empty[Long]
      picks.sortBy(_._3).foreach { case (_, cand, step, mmr) =>
        val expectPick = shortlist
          .filterNot { case (c, _) => selected.contains(c) }
          .map { case (c, sq) =>
            val red =
              if (selected.isEmpty) 0.0
              else selected.map(s => cos(e(c), e(s))).max
            (c, 0.5 * sq - 0.5 * red)
          }
          .minBy { case (c, m) => (-m, c) }
        assert(cand == expectPick._1, s"q=$qid step=$step pick")
        assert(math.abs(mmr - expectPick._2) < 1e-9, s"q=$qid step=$step mmr")
        selected :+= cand
      }
    }
  }

  test("cohort ltv conserves revenue and is cumulative in age") {
    val rows = graft.operators.Windows.tsCohortLtv(spark, sfDir).collect()
    // total revenue equals the direct purchase-cents sum
    val total = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .agg(sum(graft.core.Det.cents(col("value")))).head.getLong(0)
    assert(rows.map(_.getLong(4)).sum == total, "revenue conservation")
    // cumulative column really is the running sum; ltv = cum div users
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getLong(4)
        assert(r.getLong(5) == cum, "cum_rev_cents")
        assert(r.getLong(6) == cum / r.getLong(2), "ltv per user")
        assert(r.getLong(3) <= r.getLong(2), "active <= cohort size")
      }
    }
    // every user is in exactly one cohort
    val users = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(rows.groupBy(_.getLong(0))
      .map(_._2.head.getLong(2)).sum == users)
  }

  test("rag assembly respects the budget and stitches in mmr order") {
    val out = graft.llm.Similarity.ragAssemble(spark, sfDir).collect()
    assert(out.nonEmpty)
    val picks = graft.llm.Similarity.mmrDiversify(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def toks(s: String): Long =
      s.toLowerCase.split(" ").count(_.nonEmpty).toLong
    out.foreach { r =>
      val (qid, nUsed, totTok, ctx) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(totTok <= 256L, "budget")
      val ordered = picks.filter(_._1 == qid).sortBy(_._3).map(_._2)
      // the driver replays the same greedy budget cut
      var cum = 0L
      val kept = ordered.takeWhile { d =>
        cum += toks(docs(d)); cum <= 256L
      }
      assert(nUsed == kept.length.toLong, s"n_used of $qid")
      assert(ctx == kept.map(docs).mkString(" "), s"context of $qid")
      assert(totTok == kept.map(d => toks(docs(d))).sum, s"tokens of $qid")
    }
  }

  test("rolling median and winsorize bounds behave as robust statistics") {
    val med = graft.operators.Windows.tsRollingMedian(spark, sfDir)
    // the 7-row window median sits within the frame's min/max
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day")).rowsBetween(-6, 0)
    val bad = med
      .withColumn("lo", min(col("n")).over(w))
      .withColumn("hi", max(col("n")).over(w))
      .where(col("med7") < col("lo") || col("med7") > col("hi")).count()
    assert(bad == 0, "median outside its frame bounds")
    val win = graft.operators.Windows.tsWinsorize(spark, sfDir)
    assert(win.where(col("value_w").isNull).count() == 0)
    assert(win.where(!col("clipped") &&
      col("value_w") =!= col("value")).count() == 0,
      "unclipped row altered")
    val frac = win.where(col("clipped")).count().toDouble / win.count()
    assert(frac > 0.05 && frac < 0.15, s"clip fraction $frac not ~10%")
  }

  test("point-in-time join attributes at most one valid version per event") {
    val out = Relational.joinPointInTime(spark, sfDir)
    assert(out.count() == Tables.events(spark, sfDir).count(),
      "row per event (no interval overlap fan-out)")
    // every attributed status matches the version valid at ts
    val v = Relational.dimScd2(spark, sfDir)
    val bad = out.where(col("version").isNotNull)
      .join(v.select(col("o_custkey"), col("version"),
        col("valid_from"), col("valid_to")),
        out("user_id") === col("o_custkey") && out("version") === v("version"))
      .where(col("valid_from") > col("ts") ||
        (col("valid_to").isNotNull && col("ts") >= col("valid_to"))).count()
    assert(bad == 0, "attributed version not valid at event ts")
  }

  test("cdc diff classifies every changed key exactly once") {
    val out = graft.operators.Maintenance.cdcSnapshotDiff(spark, sfDir)
    val keys = Tables.orders(spark, sfDir).select(col("o_orderkey"))
    val dels = keys.where(expr("o_orderkey % 97 = 0")).count()
    val ins = keys.where(expr("o_orderkey % 41 = 0")).count()
    val upd = keys.where(
      expr("o_orderkey % 31 = 0 AND o_orderkey % 97 != 0")).count()
    val byOp = out.groupBy(col("op")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byOp("D") == dels && byOp("I") == ins && byOp("U") == upd,
      s"got $byOp want D=$dels I=$ins U=$upd")
    assert(out.groupBy(col("k")).count().where(col("count") > 1).count() == 0,
      "a key classified twice")
  }

  test("rolling bitmap distinct equals brute-force trailing-7-day reach") {
    val out = graft.operators.Windows.tsRollingDistinct(spark, sfDir)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val pairs = Tables.events(spark, sfDir)
      .select(col("ts").cast("date").as("day"), col("user_id"))
      .distinct().collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = pairs.map(_._1).distinct.sorted
    days.foreach { d =>
      val reach = pairs.filter { case (pd, _) =>
        !pd.isAfter(d) && !pd.isBefore(d.minusDays(6))
      }.map(_._2).distinct.size.toLong
      assert(out(d.toString) == reach, s"day $d: ${out(d.toString)} != $reach")
    }
  }

  test("bitmap distinct equals the exact count_distinct per group") {
    import org.apache.spark.sql.functions.countDistinct
    val bitmap = Relational.aggBitmapDistinct(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("ndv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bitmap == exact, s"bitmap=$bitmap exact=$exact")
  }

  test("tolerance asof never matches an order older than 30 days") {
    val out = Relational.joinAsofTol(spark, sfDir)
    assert(out.count() == Tables.events(spark, sfDir).count())
    val bad = out.where(col("o_orderdate") > col("ts") ||
      col("o_orderdate") < col("ts") - expr("INTERVAL 30 DAY")).count()
    assert(bad == 0, "match outside [ts - 30d, ts]")
    // agrees with the unbounded backward asof wherever that match is
    // inside tolerance
    val unb = Relational.joinAsof(spark, sfDir)
      .where(col("o_orderdate") >= col("ts") - expr("INTERVAL 30 DAY"))
      .select(col("event_id"), col("o_orderkey"))
    val tol = out.where(col("o_orderkey").isNotNull)
      .select(col("event_id"), col("o_orderkey"))
    assert(unb.exceptAll(tol).isEmpty && tol.exceptAll(unb).isEmpty,
      "tolerance asof diverges from filtered unbounded asof")
  }

  test("ohlc candle fields reconcile per (type, day)") {
    import org.apache.spark.sql.functions.{min_by, max_by, struct}
    val out = graft.operators.Windows.tsOhlc(spark, sfDir)
    assert(out.where(col("high") < col("low") ||
      col("open") > col("high") || col("open") < col("low") ||
      col("close") > col("high") || col("close") < col("low")).count() == 0)
    // open/close equal an independent min_by/max_by selection on the
    // (ts, event_id) key
    val sel = Tables.events(spark, sfDir)
      .withColumn("day", col("ts").cast("date"))
      .groupBy(col("event_type"), col("day"))
      .agg(min_by(col("value"), struct(col("ts"), col("event_id"))).as("o2"),
           max_by(col("value"), struct(col("ts"), col("event_id"))).as("c2"))
    val joined = out.join(sel, Seq("event_type", "day"))
    assert(joined.where(col("open") =!= col("o2") ||
      col("close") =!= col("c2")).count() == 0,
      "open/close disagree with min_by/max_by selection")
  }

  test("changepoint flags exactly the top-3 shift days per type") {
    val out = graft.operators.Windows.tsChangepoint(spark, sfDir)
    val flags = out.where(col("is_shift")).groupBy(col("event_type")).count()
    assert(flags.where(col("count") =!= 3).count() == 0,
      "each type flags exactly 3 days")
    assert(out.where(col("is_shift") && col("score").isNull).count() == 0,
      "flagged day without a complete 7+7 window")
    // score is the exact cross-multiplied integer on a complete window
    val bad = out.where(col("score").isNotNull &&
      col("score") =!= abs(col("sum_next") * col("n_prev") -
        col("sum_prev") * col("n_next"))).count()
    assert(bad == 0, "score formula mismatch")
  }

  /** Both arms' cent values, the shared input of the KS and
    * Mann–Whitney reconciliations. */
  private def armCents(): (Array[Long], Array[Long]) = {
    val vals = Tables.orders(spark, sfDir).join(
        Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment"), col("o_totalprice")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    (vals.filter(_._1 == "BUILDING").map(_._2),
     vals.filter(_._1 == "MACHINERY").map(_._2))
  }

  test("KS statistic reconciles with a driver brute-force ECDF sweep") {
    val row = graft.operators.Stats.ksTest(spark, sfDir).head()
    val (a, b) = armCents()
    assert(row.getLong(0) == a.length.toLong && row.getLong(1) == b.length.toLong)
    // brute force: evaluate |ca*nb - cb*na| at every distinct value
    val points = (a ++ b).distinct.sorted
    val sweep = points.map { x =>
      val ca = a.count(_ <= x).toLong
      val cb = b.count(_ <= x).toLong
      (math.abs(ca * b.length - cb * a.length), x)
    }
    val dMax = sweep.map(_._1).max
    assert(row.getLong(2) == dMax, "d_num")
    // reported location is the SMALLEST value attaining the max
    assert(row.getLong(3) == sweep.filter(_._1 == dMax).map(_._2).min, "at_cents")
    assert(math.abs(row.getDouble(4) -
      dMax.toDouble / (a.length.toLong * b.length).toDouble) == 0.0, "d")
  }

  test("Mann-Whitney doubled rank-sum reconciles with a driver ranking") {
    val row = graft.operators.Stats.mannWhitney(spark, sfDir).head()
    val (a, b) = armCents()
    val nA = a.length.toLong; val nB = b.length.toLong
    assert(row.getLong(0) == nA && row.getLong(1) == nB)
    // driver ranking: doubled tie-averaged rank = minRank + maxRank
    // over the 1-based positions of each value in the pooled sort
    val pooled = (a.map((_, 'a')) ++ b.map((_, 'b'))).sortBy(_._1)
    val byVal = pooled.zipWithIndex.groupBy(_._1._1)
    val r2a = byVal.values.map { g =>
      val doubled = (g.head._2 + 1).toLong + (g.last._2 + 1).toLong
      doubled * g.count(_._1._2 == 'a')
    }.sum
    assert(row.getLong(2) == r2a, "r2_a")
    val ties = byVal.values.map { g =>
      val t = g.length.toLong; t * t * t - t
    }.sum
    assert(row.getLong(3) == ties, "ties")
    assert(row.getLong(4) == r2a - nA * (nA + 1), "u2_a")
    // U identity: U_a + U_b = n_a * n_b (in doubled units, 2·n_a·n_b)
    assert(row.getLong(4) + row.getLong(5) == 2 * nA * nB, "U identity")
    // z sign follows the rank-sum excess
    val z = row.getDouble(6)
    assert(z.sign == (row.getLong(4) - nA * nB).sign.toDouble || z == 0.0)
  }

  test("minmax scaling conserves rows and pins both endpoints per type") {
    val out = graft.operators.Features.minmaxScale(spark, sfDir).cache()
    val n = Tables.events(spark, sfDir).count()
    assert(out.count() == n, "row conservation")
    assert(out.where(col("scaled_ppm") < 0 ||
      col("scaled_ppm") > 1000000L).count() == 0, "range")
    // per type: the min maps to 0, the max to exactly 1e6 (or the
    // domain collapsed and everything is 0)
    val ext = out.groupBy(col("event_type"))
      .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"),
        min(col("scaled_ppm")).as("slo"), max(col("scaled_ppm")).as("shi"))
      .collect()
    ext.foreach { r =>
      assert(r.getLong(3) == 0L, s"${r.getString(0)} min scaled")
      assert(r.getLong(4) == (if (r.getLong(1) == r.getLong(2)) 0L
        else 1000000L), s"${r.getString(0)} max scaled")
    }
    // spot-check the formula on one type against a driver recompute
    val rows = out.where(col("event_type") === ext.head.getString(0))
      .select(col("cents"), col("scaled_ppm")).collect()
    val lo = ext.head.getLong(1); val hi = ext.head.getLong(2)
    rows.foreach { r =>
      val want = if (hi == lo) 0L else 1000000L * (r.getLong(0) - lo) / (hi - lo)
      assert(r.getLong(1) == want)
    }
    out.unpersist()
    graft.core.Caches.drain(spark)
  }

  test("integer PCA matches a driver fixed-point recomputation bit-exactly") {
    val rows = Tables.embeddings(spark, sfDir).collect().map { r =>
      (r.getLong(r.fieldIndex("vec_id")), r.getInt(r.fieldIndex("label")),
        r.getSeq[Float](r.fieldIndex("embedding")).toArray)
    }
    val d = rows.head._3.length
    assert(d == 64, "testdata embedding dimensionality contract")
    val n = rows.length
    val q = rows.map { case (_, _, e) =>
      e.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong)
    }
    val m = Array.tabulate(d)(j => q.map(_(j)).sum / n)
    val c = q.map(v => Array.tabulate(d)(j => v(j) - m(j)))
    val cov = Array.tabulate(d, d)((j, k) => c.map(v => v(j) * v(k)).sum)
    var vdir = Array.fill(d)(1000000L)
    for (_ <- 1 to 5) {
      val w = Array.tabulate(d)(j =>
        (0 until d).map(k => cov(j)(k) * vdir(k)).sum)
      val mx = w.map(math.abs).max
      vdir = w.map(_ / math.max(mx / 1000000L, 1L))
    }
    val projByLabel = rows.zip(c).map { case ((_, l, _), cv) =>
      l -> (0 until d).map(j => cv(j) * vdir(j)).sum
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = graft.operators.Features.pca(spark, sfDir).collect()
    assert(got.map(_.getInt(0)).toSeq == projByLabel.keys.toSeq.sorted)
    got.foreach { r =>
      val ps = projByLabel(r.getInt(0))
      assert(r.getLong(1) == ps.length.toLong, "n")
      assert(r.getLong(2) == ps.sum / ps.length, "mean_p")
      assert(r.getLong(3) == ps.min, "min_p")
      assert(r.getLong(4) == ps.max, "max_p")
    }
    graft.core.Caches.drain(spark)
  }

  test("KMV sketch matches a driver md5 recompute and bounds its error") {
    val keys = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey")).distinct().collect().map(_.getLong(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h16(k: Long): Long = {
      val hex = md.digest(s"kmv:$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      java.lang.Long.parseLong(hex, 16)
    }
    val hs = keys.map(h16).distinct.sorted
    val mins = hs.take(256)
    val row = graft.operators.Relational.aggDistinctKmv(spark, sfDir).head()
    assert(row.getLong(0) == mins.length.toLong, "n_mins")
    assert(row.getLong(1) == mins.max, "h_k")
    val est = if (mins.length < 256) mins.length.toLong
              else 255L * 65536L / mins.max
    assert(row.getLong(2) == est, "est_nd")
    assert(row.getLong(3) == keys.length.toLong, "exact_nd")
    // estimator quality: within 25% of truth at this K (deterministic,
    // so this is a fixed property of the testdata, not a flaky bound)
    assert(math.abs(est - keys.length).toDouble / keys.length < 0.25,
      s"est $est vs exact ${keys.length}")
  }

  test("64-bit production KMV estimates sf0.1 cardinalities within bounds") {
    // The production-width twin (VERDICT r7 #7): same algebra on
    // xxhash64, no oracle (not portable SQL), so the gate is this
    // spec — at sf0.1, where the corpus is 10x the oracle runs'.
    // KMV's relative standard error at K=256 is 1/sqrt(K-2) ≈ 6.3%;
    // the hash is deterministic, so the measured error is a fixed
    // property of the testdata and a 3-sigma bound cannot flake.
    val dir = "/root/testdata/sf0.1"
    val li = graft.core.Tables.lineitem(spark, dir)
    val exact = li.select(col("l_partkey")).distinct().count()
    val est = graft.operators.Relational
      .distinctKmv64(li, "l_partkey").head().getLong(1)
    info(s"kmv64 @ sf0.1: est $est vs exact $exact " +
      f"(err ${math.abs(est - exact).toDouble / exact * 100}%.1f%%)")
    assert(math.abs(est - exact).toDouble / exact < 0.19,
      s"kmv64 est $est vs exact $exact outside 3-sigma")
    // small-cardinality regime: fewer distinct keys than K means the
    // sketch IS the exact count
    val nations = graft.core.Tables.nation(spark, dir)
    assert(graft.operators.Relational
      .distinctKmv64(nations, "n_nationkey").head().getLong(1) == 25L)
    graft.core.Caches.drain(spark)
  }

  test("spike alerts recompute from a driver trailing-window scan") {
    // events.ts is TIMESTAMP_NTZ, so the window start collects as
    // LocalDateTime, not java.sql.Timestamp
    val rows = graft.operators.Streams.streamSpike(spark, sfDir)
      .collect().map(r => (r.getAs[java.time.LocalDateTime](0),
        r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).values.foreach { g =>
      val sorted = g.sortBy(_._1.toEpochSecond(java.time.ZoneOffset.UTC))
      sorted.zipWithIndex.foreach { case ((_, t, n, pn, ps, spike), i) =>
        val prev = sorted.slice(math.max(i - 3, 0), i).map(_._3)
        assert(pn == prev.length.toLong, s"$t prev_n")
        assert(ps == prev.sum, s"$t prev_sum")
        assert(spike == (prev.length == 3 && n * 3 > prev.sum * 2),
          s"$t spike rule")
      }
    }
  }

  test("ADF statistic matches a driver OLS on the lagged series") {
    val row = graft.operators.Windows.tsAdf(spark, sfDir).head()
    val daily = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(sum(expr(
        "CAST(round(CAST(value AS DECIMAL(27,10)), 2) * 100 AS BIGINT)"))
        .as("c"))
      .orderBy(col("day")).collect().map(_.getLong(1) / 100.0)
    val pairs = daily.sliding(2).map(a => (a(0), a(1) - a(0))).toArray
    assert(row.getLong(0) == pairs.length.toLong, "n")
    // slope sign/magnitude from a plain double OLS (tolerance compare:
    // the engine's decimal-exact path differs only in rounding)
    val n = pairs.length.toDouble
    val sx = pairs.map(_._1).sum; val sd = pairs.map(_._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val sxd = pairs.map(p => p._1 * p._2).sum
    val slope = (n * sxd - sx * sd) / (n * sxx - sx * sx)
    assert(math.abs(row.getDouble(1) - slope) < 1e-6, "rho-1")
    // a mean-reverting synthetic daily series: rho-1 < 0 and t < 0
    assert(row.getDouble(1) < 0 && row.getDouble(2) < 0)
    graft.core.Caches.drain(spark)
  }

  test("table checksums detect a single-row difference") {
    val rows = graft.operators.Maintenance.tableChecksum(spark, sfDir)
      .collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("customer", "lineitem", "orders"))
    val byT = rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(byT("orders")._1 == Tables.orders(spark, sfDir).count())
    // recompute orders checksum on the driver via MessageDigest
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(k: Long): Long = {
      val hex = md.digest(s"ck:$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val keys = Tables.orders(spark, sfDir)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    assert(byT("orders")._2 == keys.map(h32).sum, "orders checksum")
    // sensitivity: dropping one row moves the checksum
    assert(keys.map(h32).sum - h32(keys.head) != byT("orders")._2)
    graft.core.Caches.drain(spark)
  }

  test("KM curve reconciles with a driver survival recomputation") {
    val rows = graft.operators.Windows.winSurvivalKm(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // driver: per customer first/second order day, censor at max day
    val byCust = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("day"),
        col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getLong(2)))
      .groupBy(_._1)
    val endDay = byCust.values.flatten.map(_._2).max
    val times = byCust.values.map { g =>
      val sorted = g.toSeq.sortBy(x => (x._2, x._3))
      val first = sorted.head._2
      if (sorted.length >= 2) (sorted(1)._2 - first, 1L)
      else (endDay - first, 0L)
    }.toSeq
    val total = times.length.toLong
    // per event time: n_risk and d
    val eventTimes = times.filter(_._2 == 1L).map(_._1).distinct.sorted
    var logSum = 0L
    val expect = eventTimes.map { t =>
      val nRisk = times.count(_._1 >= t).toLong
      val d = times.count(x => x._1 == t && x._2 == 1L).toLong
      // engines ROUND half away from zero; Scala's math.round is
      // floor(x+0.5) and differs on negative halves
      val raw = math.log((nRisk - d).toDouble / nRisk) * 1000000.0
      val step =
        if (nRisk > d) { if (raw < 0) -math.round(-raw) else math.round(raw) }
        else -13815511L
      logSum += step
      (t, nRisk, d, step, logSum)
    }
    assert(rows.length == expect.length)
    rows.zip(expect).foreach { case (r, (t, nr, d, step, cum)) =>
      assert(r.getLong(0) == t && r.getLong(1) == nr && r.getLong(2) == d,
        s"risk set at $t")
      assert(r.getLong(4) == step, s"step at $t")
      assert(r.getLong(5) == cum, s"cumulative at $t")
    }
    // survival never increases: cumulative log is nonincreasing
    val cums = rows.map(_.getLong(5))
    assert(cums.zip(cums.tail).forall { case (a, b) => b <= a })
    graft.core.Caches.drain(spark)
  }

  test("txn-log time travel resolves each version's live files exactly") {
    val rows = graft.operators.Relational.scanTxnLog(spark, sfDir)
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val v1 = o.count(k => k % 3 == 0 || k % 3 == 1).toLong
    val v2 = o.count(k => k % 3 == 1 || k % 3 == 2).toLong
    assert(rows(0).getLong(2) == v1, "v1 rows = mod {0,1} slice")
    assert(rows(1).getLong(2) == v2, "v2 rows = mod {1,2} after the swap")
    assert(rows.forall(_.getInt(1) == 2), "two live files each version")
    graft.core.Caches.drain(spark)
  }

  test("fuzzy matches are true close pairs; blocking loses none in-block") {
    val rows = graft.operators.Relational.joinFuzzyMatch(spark, sfDir)
      .collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    rows.foreach { r =>
      val d = lev(r.getString(2), r.getString(3))
      assert(d == r.getInt(6) && d >= 1 && d <= 3, s"${r.getString(2)}")
    }
    // driver exhaustive in-block sweep over DISTINCT names finds the
    // same pair set (top-20 cut aside)
    val parts = Tables.part(spark, sfDir)
      .select(col("p_partkey"), lower(col("p_name"))).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val names = parts.groupBy(_._2).map { case (nm, g) =>
      (nm, g.map(_._1).min, g.length.toLong) }.toSeq
    val all = for {
      i <- names.indices; j <- i + 1 until names.length
      (na, ra, _) = names(i); (nb, rb, _) = names(j)
      if na.split(" ").head == nb.split(" ").head
      if math.abs(na.length - nb.length) <= 2
      d = lev(na, nb) if d <= 3
    } yield (math.min(ra, rb), math.max(ra, rb), d)
    val expectTop = all.sortBy { case (a, b, d) => (d, a, b) }.take(20)
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(6))).toSeq
      == expectTop, "top-20 agreement")
    // group sizes attached correctly
    val sizeOf = names.map(n => n._2 -> n._3).toMap
    rows.foreach { r =>
      assert(r.getLong(4) == sizeOf(r.getLong(0)), "n_parts_a")
      assert(r.getLong(5) == sizeOf(r.getLong(1)), "n_parts_b")
    }
  }

  test("skyline is exactly the non-dominated set (driver n^2 sweep)") {
    val parts = Tables.part(spark, sfDir)
      .select(col("p_partkey"), expr(
        "CAST(round(CAST(p_retailprice AS DECIMAL(27,10)), 2) * 100 AS BIGINT)"),
        col("p_size")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    def dominates(x: (Long, Long, Int), y: (Long, Long, Int)): Boolean =
      x._2 <= y._2 && x._3 >= y._3 && (x._2 < y._2 || x._3 > y._3)
    val nonDom = parts.filter(p => !parts.exists(q => dominates(q, p)))
    // collapse exact-duplicate (price,size) points to the lowest key
    val distinctFrontier = nonDom.groupBy(p => (p._2, p._3)).values
      .map(_.minBy(_._1)).toSeq.sortBy(p => (p._2, p._1))
    val rows = graft.operators.Relational.aggSkyline(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    assert(rows.toSeq == distinctFrontier, "frontier agreement")
    graft.core.Caches.drain(spark)
  }

  test("Mann-Kendall S and variance match a driver pair sweep") {
    val row = graft.operators.Windows.tsMannKendall(spark, sfDir).head()
    val daily = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(sum(expr(
        "CAST(round(CAST(value AS DECIMAL(27,10)), 2) * 100 AS BIGINT)"))
        .as("c"))
      .orderBy(col("day")).collect().map(_.getLong(1))
    val n = daily.length.toLong
    var s = 0L
    for (i <- daily.indices; j <- i + 1 until daily.length)
      s += java.lang.Long.signum(daily(j) - daily(i))
    val tieTerm = daily.groupBy(identity).values
      .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
    assert(row.getLong(0) == n && row.getLong(1) == s)
    assert(row.getLong(2) == n * (n - 1) * (2 * n + 5) - tieTerm, "var18")
    val z = row.getDouble(3)
    // continuity correction: |S| <= 1 collapses to z = 0
    if (math.abs(s) <= 1) assert(z == 0.0)
    else assert(z.sign == s.sign.toDouble, "z sign follows S")
    graft.core.Caches.drain(spark)
  }

  test("trimmed mean keeps ~90% and sits between the bounds") {
    val rows = graft.operators.Stats.trimmedMean(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, kept) = (r.getLong(1), r.getLong(2))
      // 90% interquantile keeps 88-92% at realistic n
      assert(kept * 100 >= n * 85 && kept <= n, s"${r.getString(0)} kept")
      // bounds are exact integer centi-cents since r8 (x100 fixed
      // point): the kept-mean in cents must sit inside them
      val mean = r.getLong(3)
      assert(mean * 100 >= r.getLong(5) - 100
        && mean * 100 <= r.getLong(6) + 100,
        s"${r.getString(0)} mean inside bounds")
      assert(r.getLong(4) == 1000000L * (n - kept) / n, "trimmed ppm")
    }
    graft.core.Caches.drain(spark)
  }

  test("reach summary reconciles with the bfs frame") {
    val hops = graft.operators.Graph.bfs(spark, sfDir).collect()
      .map(_.getLong(1))
    val row = graft.operators.Graph.reachSummary(spark, sfDir).head()
    val reached = hops.filter(_ >= 0)
    assert(row.getLong(0) == hops.length.toLong)
    assert(row.getLong(1) == reached.length.toLong)
    assert(row.getLong(2) == 1000000L * reached.length / hops.length)
    assert(row.getLong(3) == hops.max)
    assert(row.getLong(4) == 1000L * reached.sum / reached.length)
    graft.core.Caches.drain(spark)
  }

  test("mutual information matches a driver contingency recompute") {
    val row = graft.operators.Stats.mutualInfo(spark, sfDir).head()
    val cells = Tables.orders(spark, sfDir).join(
        Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderstatus")).count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val n = cells.map(_._2).sum
    val rM = cells.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val sM = cells.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
    def q(x: Double): Long = if (x < 0) -math.round(-x) else math.round(x)
    val mi = cells.map { case ((a, b), c) =>
      q(c.toDouble / n * math.log(c.toDouble * n / (rM(a).toDouble * sM(b)))
        * 1e6)
    }.sum
    val hx = rM.values.map(r =>
      q(-(r.toDouble / n) * math.log(r.toDouble / n) * 1e6)).sum
    val hy = sM.values.map(s =>
      q(-(s.toDouble / n) * math.log(s.toDouble / n) * 1e6)).sum
    assert(row.getLong(0) == n && row.getLong(1) == cells.length.toLong)
    assert(row.getLong(2) == mi, "mi_micro")
    assert(row.getLong(3) == hx && row.getLong(4) == hy, "entropies")
    assert(row.getLong(5) == 1000000L * 2 * math.max(mi, 0L) / (hx + hy),
      "nmi")
    // information inequalities (within quantization slack)
    assert(mi <= math.min(hx, hy) + cells.length, "MI <= min entropy")
    graft.core.Caches.drain(spark)
  }

  test("Benford digit masses reconcile and sum; expected shares pinned") {
    val rows = graft.operators.Stats.benford(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 9L))
    val prices = Tables.orders(spark, sfDir)
      .select(col("o_totalprice")).collect().map(_.getDouble(0))
      .map(v => math.round(v * 100)).filter(_ > 0)
    assert(rows.map(_.getLong(1)).sum == prices.length.toLong)
    val expect = prices.map(_.toString.head.asDigit.toLong)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == expect.getOrElse(r.getLong(0), 0L),
        s"digit ${r.getLong(0)}")
    }
    // pinned expected shares sum to ~1e6 (truncation loss < 9)
    assert(rows.map(_.getLong(3)).sum > 999990L)
    graft.core.Caches.drain(spark)
  }

  test("referential audit finds zero orphans on the consistent star") {
    val rows = graft.operators.Maintenance.dqReferential(spark, sfDir)
      .collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getLong(3) == 0L && r.getLong(4) == 0L,
        s"${r.getString(0)} reports orphans on consistent testdata")
    }
    // row counts match the facts
    val byEdge = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byEdge("orders.o_custkey->customer") ==
      Tables.orders(spark, sfDir).count())
    assert(byEdge("lineitem.l_orderkey->orders") ==
      Tables.lineitem(spark, sfDir).count())
    graft.core.Caches.drain(spark)
  }

  test("Cohen's kappa matches a driver contingency recompute") {
    val row = graft.operators.Stats.cohenKappa(spark, sfDir).head()
    val docs = Tables.documents(spark, sfDir)
      .select(col("text")).collect().map(_.getString(0))
    val labels = docs.map { t =>
      val toks = t.toLowerCase.split(" ").filter(_.nonEmpty)
      val sr = toks.count(w => w == "the" || w == "a").toDouble /
        math.max(toks.length, 1)
      (if (sr >= 0.02) "en" else "und", if (sr >= 0.04) "en" else "und")
    }
    val n = labels.length.toLong
    val agree = labels.count(p => p._1 == p._2).toLong
    val maEn = labels.count(_._1 == "en").toLong
    val mbEn = labels.count(_._2 == "en").toLong
    val chance = maEn * mbEn + (n - maEn) * (n - mbEn)
    assert(row.getLong(0) == n && row.getLong(1) == agree)
    assert(row.getLong(2) == agree * n - chance, "kappa_num")
    assert(row.getLong(3) == n * n - chance, "kappa_den")
    val k = row.getDouble(5)
    assert(k >= -1.0 - 1e-12 && k <= 1.0 + 1e-12)
    graft.core.Caches.drain(spark)
  }

  test("interpurchase gaps conserve rows (orders minus customers)") {
    val rows = graft.operators.Windows.winInterpurchase(spark, sfDir)
      .collect()
    val nOrders = Tables.orders(spark, sfDir).count()
    val nCust = Tables.orders(spark, sfDir)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nOrders - nCust,
      "one gap per order after each customer's first")
    rows.foreach { r =>
      val (b, lo, hi) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert((1L << b) <= lo + 1 && hi + 1 < (1L << (b + 1)),
        s"band $b holds gaps [$lo,$hi]")
    }
    graft.core.Caches.drain(spark)
  }

  test("decile lift conserves orders/positives and ranks monotonically") {
    val rows = graft.operators.Features.decileLift(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 10L))
    val total = Tables.orders(spark, sfDir).count()
    val pos = Tables.orders(spark, sfDir)
      .where(col("o_orderstatus") === "F").count()
    assert(rows.map(_.getLong(1)).sum == total, "order conservation")
    assert(rows.map(_.getLong(2)).sum == pos, "positive conservation")
    // deciles are balanced to ±1 row
    rows.foreach(r =>
      assert(math.abs(r.getLong(1) - total / 10) <= 1, "decile balance"))
    // cumulative capture is nondecreasing and ends at 1e6
    val caps = rows.map(_.getLong(4))
    assert(caps.zip(caps.tail).forall { case (a, b) => a <= b })
    assert(caps.last == 1000000L)
    // pos_rate is nonincreasing in decile order at segment boundaries:
    // scores tie within segments, so only assert weak monotonic trend
    // on the first vs last decile
    assert(rows.head.getLong(3) >= rows.last.getLong(3),
      "top decile at least as positive as bottom")
    graft.core.Caches.drain(spark)
  }

  test("cdc apply round-trips: old snapshot + diff = new snapshot") {
    // derive the new snapshot independently on the driver from the
    // shared mod rules and compare the rollup
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val news = base.filter(_._1 % 97 != 0).map { case (k, p) =>
      (k, if (k % 31 == 0) "9-RECLASS" else p)
    } ++ base.filter(_._1 % 41 == 0).map { case (k, p) => (k + 10000000L, p) }
    val expect = news.groupBy(_._2).view.mapValues { g =>
      (g.length.toLong, g.map(_._1).sum) }.toMap
    val rows = graft.operators.Maintenance.cdcApply(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq == expect.keys.toSeq.sorted)
    rows.foreach { r =>
      val (n, ks) = expect(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == ks, r.getString(0))
    }
    graft.core.Caches.drain(spark)
  }

  test("rfm segments conserve customers and revenue; scores span 1-5") {
    val rows = graft.operators.Windows.winRfm(spark, sfDir).collect()
    val nCust = Tables.orders(spark, sfDir)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust, "customer conservation")
    val totalCents = Tables.orders(spark, sfDir)
      .agg(sum(expr(
        "CAST(round(CAST(o_totalprice AS DECIMAL(27,10)), 2) * 100 AS BIGINT)")))
      .head().getLong(0)
    assert(rows.map(_.getLong(2)).sum == totalCents, "revenue conservation")
    rows.foreach { r =>
      val seg = r.getString(0)
      assert(seg.length == 3 && seg.forall(c => c >= '1' && c <= '5'), seg)
    }
    // quintiles are balanced: each R score holds n/5 ± 1 customers
    val byR = rows.groupBy(_.getString(0).head).view
      .mapValues(_.map(_.getLong(1)).sum).toMap
    byR.values.foreach(v =>
      assert(math.abs(v - nCust / 5) <= nCust / 5 / 2 + 1, s"R balance $v"))
    graft.core.Caches.drain(spark)
  }

  test("residual anomalies flag exactly the 3-MAD exceedances") {
    val stl = graft.operators.Windows.tsStl(spark, sfDir).collect()
      .map(_.getLong(4))
    val out = graft.operators.Windows.tsAnomalyResid(spark, sfDir).collect()
    assert(out.length == stl.length)
    def medOf(xs: Array[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val med = medOf(stl.map(_.toDouble))
    val mad = medOf(stl.map(r => math.abs(r - med)))
    out.foreach { r =>
      assert(r.getBoolean(5) ==
        (math.abs(r.getLong(2) - med) > 3.0 * mad), s"flag on ${r.get(0)}")
    }
    graft.core.Caches.drain(spark)
  }

  test("quintile migration conserves each half's customers") {
    val rows = graft.operators.Windows.winQuintileMigration(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every half-1 customer appears once as from_tier>0; absences are 0
    val nCust = Tables.orders(spark, sfDir)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_._3).sum == nCust,
      "every customer in exactly one cell")
    rows.foreach { case (f, t, _) =>
      assert(f >= 0 && f <= 5 && t >= 0 && t <= 5)
      assert(!(f == 0 && t == 0), "customer absent from both halves")
    }
    // tier balance within each half: from-tier 1..5 masses within ±1
    // of n_half/5
    val h1 = rows.filter(_._1 > 0).map(_._3).sum
    val byFrom = rows.filter(_._1 > 0).groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toMap
    byFrom.values.foreach(v =>
      assert(math.abs(v - h1 / 5) <= h1 / 5 / 2 + 1, s"balance $v"))
    graft.core.Caches.drain(spark)
  }

  test("path transitions conserve steps and rows sum to ~1e6 ppm") {
    val rows = graft.operators.Windows.winPathTransitions(spark, sfDir)
      .collect()
    // total transitions = total events - distinct users (each user's
    // first event has no predecessor)
    val nEvents = Tables.events(spark, sfDir).count()
    val nUsers = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == nEvents - nUsers,
      "step conservation")
    // per from-type: row_total = sum of its n; ppm sums within
    // truncation loss of 1e6
    rows.groupBy(_.getString(0)).values.foreach { g =>
      val tot = g.head.getLong(3)
      assert(g.map(_.getLong(2)).sum == tot, "row total")
      val ppm = g.map(_.getLong(4)).sum
      assert(ppm <= 1000000L && ppm > 1000000L - g.length,
        s"ppm sum $ppm")
    }
    graft.core.Caches.drain(spark)
  }

  test("bitmap overlap equals set-semantics intersection per type pair") {
    val uv = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = uv.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = byType.keys.toSeq.sorted
    val rows = graft.operators.Relational.aggBitmapOverlap(spark, sfDir)
      .collect()
    val expectPairs = for {
      i <- types.indices; j <- i + 1 until types.length
    } yield (types(i), types(j))
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq
      == expectPairs, "all ordered pairs present")
    rows.foreach { r =>
      val (a, b) = (byType(r.getString(0)), byType(r.getString(1)))
      assert(r.getLong(2) == (a & b).size.toLong, "intersection")
      assert(r.getLong(3) == (a | b).size.toLong, "union")
      assert(r.getLong(4) ==
        1000000L * (a & b).size / (a | b).size, "jaccard ppm")
    }
    graft.core.Caches.drain(spark)
  }

  test("time-to-event bands conserve users and bucket correctly") {
    val rows = graft.operators.Windows.winTimeToEvent(spark, sfDir).collect()
    val firsts = Tables.events(spark, sfDir)
      .where(col("event_type").isin("signup", "purchase"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "signup",
          graft.core.Det.epochUs(col("ts")))).as("s"),
        min(when(col("event_type") === "purchase",
          graft.core.Det.epochUs(col("ts")))).as("p"))
      .collect().map(r => (Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
      .filter(_._1.isDefined)
    assert(rows.map(_.getLong(1)).sum == firsts.length.toLong,
      "every signup user lands in exactly one band")
    val bands = firsts.map {
      case (Some(s), None) => -2L
      case (Some(s), Some(p)) if p < s => -1L
      case (Some(s), Some(p)) =>
        val k = (p - s) / 3600000000L + 2
        (63 - java.lang.Long.numberOfLeadingZeros(k)).toLong
      case _ => fail("unreachable")
    }
    val hist = bands.groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      assert(hist(r.getLong(0)) == r.getLong(1), s"band ${r.getLong(0)}")
    }
    graft.core.Caches.drain(spark)
  }

  test("standardization audit matches a driver per-dim recompute") {
    val rows = graft.operators.Features.standardize(spark, sfDir).collect()
    val vecs = Tables.embeddings(spark, sfDir).collect().map(r =>
      r.getSeq[Float](r.fieldIndex("embedding")).toArray)
    val d = vecs.head.length
    assert(rows.length == d)
    val q = vecs.map(_.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong))
    rows.foreach { r =>
      val j = r.getInt(0)
      val col = q.map(_(j))
      val n = col.length.toLong
      val s = col.sum
      val m = s / n
      val varNum = (col.map(v => v * v).sum - 2 * m * s + n * m * m) / n
      val sd = math.floor(math.sqrt(varNum.toDouble)).toLong
      assert(r.getLong(1) == n, s"dim $j n")
      assert(r.getLong(2) == m, s"dim $j mean")
      assert(r.getLong(3) == sd, s"dim $j sd")
      val zs = col.map(v => (v - m) * 1000 / math.max(sd, 1L))
      assert(r.getLong(4) == zs.min, s"dim $j min_z")
      assert(r.getLong(5) == zs.max, s"dim $j max_z")
    }
    graft.core.Caches.drain(spark)
  }

  test("stl decomposition closes the additive identity bit-exactly") {
    val rows = graft.operators.Windows.tsStl(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // value = trend + seasonal + residual on every emitted day
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"identity on ${r.get(0)}")
    }
    // trend is the exact centered 7-day integer mean (driver recompute)
    val daily = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(sum(expr(
        "CAST(round(CAST(value AS DECIMAL(27,10)), 2) * 100 AS BIGINT)"))
        .as("cents"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay,
        r.getLong(1))).sortBy(_._1)
    val byDay = daily.toMap
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate.toEpochDay
      val win = (-3L to 3L).flatMap(o => byDay.get(d + o))
      assert(win.length == 7, s"emitted day $d lacks a complete window")
      assert(r.getLong(2) == win.sum / 7, s"trend on $d")
    }
    // seasonal depends only on day-of-week
    val byDow = rows.groupBy(_.getDate(0).toLocalDate.toEpochDay % 7)
    byDow.values.foreach { g =>
      assert(g.map(_.getLong(3)).distinct.length == 1,
        "seasonal constant within dow")
    }
    graft.core.Caches.drain(spark)
  }

  test("growth accounting ledger balances day over day") {
    val rows = graft.operators.Windows.tsGrowthAcct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // dau = new + retained + resurrected, every day
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"ledger identity on ${r.get(0)}")
    }
    // new users across all days = distinct users ever seen
    val totalUsers = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == totalUsers, "sum(new) = users")
    // churn balances on consecutive days: churned(d) = dau(d-1) - retained(d)
    rows.sliding(2).foreach {
      case Array(x, y)
        if y.getDate(0).toLocalDate.toEpochDay -
           x.getDate(0).toLocalDate.toEpochDay == 1 =>
        assert(y.getLong(5) == x.getLong(1) - y.getLong(3),
          s"churn balance on ${y.get(0)}")
      case _ =>
    }
    // day-2 spot check against driver sets
    val days = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val byDay = days.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val sorted = byDay.keys.toSeq.sorted
    if (sorted.length > 1) {
      val (d0, d1) = (sorted(0), sorted(1))
      val row1 = rows.find(_.getDate(0).toLocalDate == d1).get
      if (d1.toEpochDay - d0.toEpochDay == 1) {
        assert(row1.getLong(3) == (byDay(d1) & byDay(d0)).size.toLong,
          "retained day 2")
        assert(row1.getLong(5) == (byDay(d0) -- byDay(d1)).size.toLong,
          "churned day 2")
      }
    }
  }
}
