package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide invariants: every declared query runs at sf0.001,
  * returns rows, its oracle contract is well-formed, and — the
  * resource-hygiene gate (VERDICT r5 next-round #6) — no query leaves
  * pinned blocks after the caller's drain or litters the temp dir.
  * Temp growth during the pass may only be `graft_*` fixture dirs
  * (bounded: one fingerprint-named dir per source, purged when
  * superseded); anything else — a write query's staging dir that
  * missed its cleanup-in-finally, a stray checkpoint — fails the
  * query that produced it, by name. The value-level semantics are
  * covered by the DuckDB gate (scripts/check.py); this spec catches
  * registration drift and runtime regressions early. */
class QueriesSpec extends AnyFunSuite with SparkSpec {

  private val tmpRoot = new java.io.File(sys.props("java.io.tmpdir"))
  private def tmpChildren: Set[String] =
    Option(tmpRoot.list()).toSeq.flatten.toSet
  @volatile private var tmpBefore: Set[String] = Set.empty

  override def beforeAll(): Unit = {
    super.beforeAll()
    val _ = spark // force session init — its local dirs are not litter
    tmpBefore = tmpChildren
  }

  /** JVM-scoped one-time artifacts extracted lazily on first use —
    * native compression libs and the session's artifact dir. Created
    * once per JVM whenever the first query after the snapshot touches
    * them; not query litter. */
  private val jvmScoped = List(
    "^snappy-.*libsnappyjava\\.so$".r,
    "^liblz4-java-.*\\.so(\\.lck)?$".r,
    "^zstd-[0-9].*\\.so$".r,
    "^artifacts-[0-9a-f-]+$".r,
    // a CONCURRENT sbt invocation (another terminal running a probe
    // main while the suite is mid-pass) drops its launcher arg file in
    // the shared temp root; it is not query litter — without this row
    // one stray `sbt run` fails every query test that follows it
    "^sbt-args[0-9]+\\.tmp$".r)

  /** Temp-root children created since suite start that are neither
    * staged fixture dirs nor JVM-scoped one-time artifacts. */
  private def litter: Set[String] =
    (tmpChildren -- tmpBefore).filterNot(n =>
      n.startsWith("graft_") || jvmScoped.exists(_.findFirstIn(n).isDefined))

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("every query except declared no-oracle ops has an oracle") {
    val noOracle = Set("agg_approx_distinct", "agg_approx_percentile")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- noOracle
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs, returns rows, and leaves no residue at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
      graft.core.Caches.drain(spark)
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        s"$name left pinned blocks the session drain could not release")
      assert(litter.isEmpty, s"$name littered the temp dir: $litter")
    }
  }

  // Registered last → runs last (ScalaTest preserves registration
  // order): end-state of the full registry pass.
  test("registry pass leaves no partial fixture staging dirs") {
    val partial = (tmpChildren -- tmpBefore)
      .filter(n => n.startsWith("graft_") && n.endsWith(".tmp"))
    assert(partial.isEmpty,
      s"staging rename protocol left partial dirs: $partial")
  }
}
