package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Native as-of join operator vs the window emulation: identical
  * results row-for-row, expected physical plan, and edge cases the
  * testdata can't produce (empty right side, ties, all-late rows). */
class AsofSpec extends AnyFunSuite with SparkSpec {

  test("native as-of equals the window emulation on the testdata") {
    val emulated = Relational.joinAsof(spark, sfDir)
      .select(col("event_id"), col("o_orderkey"), col("o_orderdate"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)).map(_.toString)))
    val native = Relational.joinAsofNative(spark, sfDir)
      .select(col("event_id"), col("o_orderkey"), col("o_orderdate"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)).map(_.toString)))
    assert(native.toSeq == emulated.toSeq)
  }

  test("plans the custom AsofJoinExec, not a join+window") {
    val df = Relational.joinAsofNative(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"custom exec missing:\n${plan.take(1200)}")
    assert(!plan.contains("Window"), "should not fall back to the window emulation")
  }

  test("edge cases: no match, exact tie on time, tie-break by second column") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val lefts = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // before any right row -> null
      (2L, 10L, ts("2024-01-01 12:00:00")), // exact tie -> matched, max tiebreak
      (3L, 10L, ts("2024-01-01 13:00:00")), // later -> still the 12:00 pair
      (4L, 99L, ts("2024-01-01 13:00:00"))  // key with no right rows -> null
    ).toDF("id", "k", "t")
    val rights = Seq(
      (10L, 100L, ts("2024-01-01 12:00:00")),
      (10L, 101L, ts("2024-01-01 12:00:00")), // same instant, larger id wins
      (10L, 102L, ts("2024-01-01 14:00:00")), // future row, never picked here
      (55L, 103L, ts("2024-01-01 00:00:00"))  // unrelated key
    ).toDF("rk", "rid", "rt")
    val out = org.apache.spark.sql.graft.AsofJoinApi.join(
        lefts, rights, Seq("k" -> "rk"), "t", "rt", Seq("rid"))
      .select(col("id"), col("rid")).orderBy(col("id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)))
    assert(out.toSeq == Seq(
      1L -> None, 2L -> Some(101L), 3L -> Some(101L), 4L -> None))
  }

  test("column pruning pushes through the custom node to the scan") {
    import graft.core.Tables
    // unprojected inputs: without PruneAsofJoinColumns the orders scan
    // would read all six columns
    val out = org.apache.spark.sql.graft.AsofJoinApi.join(
        Tables.events(spark, sfDir), Tables.orders(spark, sfDir),
        Seq("user_id" -> "o_custkey"), "ts", "o_orderdate", Seq("o_orderkey"))
      .select(col("event_id"), col("o_orderkey"))
    val scans = out.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan")).mkString("\n")
    assert(!scans.contains("o_totalprice") && !scans.contains("o_orderstatus"),
      s"orders scan not pruned:\n$scans")
    assert(out.count() > 0)
  }

  test("null keys never match (SQL equi-join semantics)") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val lefts = Seq(
      (1L, Some(10L), ts("2024-01-01 13:00:00")),
      (2L, None, ts("2024-01-01 13:00:00")) // null key -> unmatched
    ).toDF("id", "k", "t")
    val rights = Seq(
      (Some(10L), 100L, ts("2024-01-01 12:00:00")),
      (Option.empty[Long], 101L, ts("2024-01-01 12:00:00")) // never matches
    ).toDF("rk", "rid", "rt")
    val out = org.apache.spark.sql.graft.AsofJoinApi.join(
        lefts, rights, Seq("k" -> "rk"), "t", "rt", Seq("rid"))
      .select(col("id"), col("rid")).orderBy(col("id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)))
    assert(out.toSeq == Seq(1L -> Some(100L), 2L -> None))
  }

  test("null left time emits the null-right row (rightTime <= NULL is never true)") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val lefts = Seq(
      (1L, 10L, Option.empty[Timestamp]),          // null time -> unmatched
      (2L, 10L, Some(ts("2024-01-01 13:00:00")))   // real time -> matched
    ).toDF("id", "k", "t")
    val rights = Seq((10L, 100L, ts("2024-01-01 12:00:00"))).toDF("rk", "rid", "rt")
    val out = org.apache.spark.sql.graft.AsofJoinApi.join(
        lefts, rights, Seq("k" -> "rk"), "t", "rt", Seq("rid"))
      .select(col("id"), col("rid")).orderBy(col("id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)))
    assert(out.toSeq == Seq(1L -> None, 2L -> Some(100L)))
  }

  test("DateType time columns work (ordering over the declared type, no Long cast)") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val lefts = Seq((1L, 10L, d("2024-03-05")), (2L, 10L, d("2024-01-01")))
      .toDF("id", "k", "t")
    val rights = Seq(
      (10L, 100L, d("2024-02-01")),
      (10L, 101L, d("2024-03-01"))
    ).toDF("rk", "rid", "rt")
    val out = org.apache.spark.sql.graft.AsofJoinApi.join(
        lefts, rights, Seq("k" -> "rk"), "t", "rt", Seq("rid"))
      .select(col("id"), col("rid")).orderBy(col("id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)))
    assert(out.toSeq == Seq(1L -> Some(101L), 2L -> None))
  }

  test("mismatched time column types are rejected up front") {
    import spark.implicits._
    val lefts = Seq((1L, 10L, Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("id", "k", "t")
    val rights = Seq((10L, 100L, java.sql.Date.valueOf("2024-01-01")))
      .toDF("rk", "rid", "rt")
    val e = intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.AsofJoinApi.join(
        lefts, rights, Seq("k" -> "rk"), "t", "rt", Seq("rid"))
    }
    assert(e.getMessage.contains("must share a type"))
  }

  test("forward direction picks the earliest at-or-after row; tie -> smallest tiebreak") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val lefts = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // before both rights -> first (12:00, min rid)
      (2L, 10L, ts("2024-01-01 12:00:00")), // exact tie -> matched, min tiebreak
      (3L, 10L, ts("2024-01-01 15:00:00")), // after all rights -> null
      (4L, 99L, ts("2024-01-01 10:00:00"))  // key with no rights -> null
    ).toDF("id", "k", "t")
    val rights = Seq(
      (10L, 101L, ts("2024-01-01 12:00:00")),
      (10L, 100L, ts("2024-01-01 12:00:00")), // same instant, smaller id wins
      (10L, 102L, ts("2024-01-01 14:00:00"))
    ).toDF("rk", "rid", "rt")
    val out = org.apache.spark.sql.graft.AsofJoinApi.join(
        lefts, rights, Seq("k" -> "rk"), "t", "rt", Seq("rid"),
        forward = true)
      .select(col("id"), col("rid")).orderBy(col("id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)))
    assert(out.toSeq == Seq(
      1L -> Some(100L), 2L -> Some(100L), 3L -> None, 4L -> None))
  }

  test("tolerance bounds the match distance in both directions") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val hourUs = 3600L * 1000000
    val lefts = Seq((1L, 10L, ts("2024-01-01 12:00:00"))).toDF("id", "k", "t")
    val rights = Seq((10L, 100L, ts("2024-01-01 09:00:00"))).toDF("rk", "rid", "rt")
    def run(fwd: Boolean, tol: Long) =
      org.apache.spark.sql.graft.AsofJoinApi.join(
          lefts, rights, Seq("k" -> "rk"), "t", "rt", Seq("rid"),
          forward = fwd, tolerance = tol)
        .select(col("rid")).collect().map(r => Option(r.get(0))).toSeq
    assert(run(fwd = false, tol = 4 * hourUs) == Seq(Some(100L))) // 3h back, within 4h
    assert(run(fwd = false, tol = 2 * hourUs) == Seq(None))       // 3h back, beyond 2h
    // forward from 12:00 finds nothing at-or-after regardless of tolerance
    assert(run(fwd = true, tol = 24 * hourUs) == Seq(None))
    val rights2 = Seq((10L, 200L, ts("2024-01-01 13:30:00"))).toDF("rk", "rid", "rt")
    def run2(tol: Long) =
      org.apache.spark.sql.graft.AsofJoinApi.join(
          lefts, rights2, Seq("k" -> "rk"), "t", "rt", Seq("rid"),
          forward = true, tolerance = tol)
        .select(col("rid")).collect().map(r => Option(r.get(0))).toSeq
    assert(run2(2 * hourUs) == Seq(Some(200L))) // 1.5h ahead, within 2h
    assert(run2(hourUs) == Seq(None))           // 1.5h ahead, beyond 1h
  }

  test("forward matches the window emulation on the testdata (7-day tolerance)") {
    import graft.core.Tables
    val e = Tables.events(spark, sfDir).select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    val joined = e.join(o, col("user_id") === col("o_custkey") &&
          col("o_orderdate") >= col("ts") &&
          col("o_orderdate") <= col("ts") + expr("INTERVAL 7 DAYS"), "left_outer")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("event_id"))
      .orderBy(col("o_orderdate").asc_nulls_last, col("o_orderkey").asc_nulls_last)
    val emulated = joined.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("event_id"), col("o_orderkey")).orderBy(col("event_id"))
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    val native = graft.operators.Relational.joinAsofFwd(spark, sfDir)
      .select(col("event_id"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(native.toSeq == emulated.toSeq)
  }

  test("tolerance on a non-integral time type fails at build time") {
    import spark.implicits._
    // string times are orderable, so an UNBOUNDED as-of is legal — but
    // the tolerance test subtracts native units, which would throw a
    // per-row ClassCastException mid-job. The builder must reject it.
    val lefts = Seq((1L, "2024-01-01")).toDF("k", "t")
    val rights = Seq((1L, 7L, "2023-12-31")).toDF("rk", "rid", "rt")
    val e = intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.AsofJoinApi.join(
        lefts, rights, Seq("k" -> "rk"), "t", "rt", Seq("rid"),
        tolerance = 10L)
    }
    assert(e.getMessage.contains("integral-backed"))
    // unbounded on the same frames still builds and matches
    val ok = org.apache.spark.sql.graft.AsofJoinApi.join(
        lefts, rights, Seq("k" -> "rk"), "t", "rt", Seq("rid"))
      .collect()
    assert(ok.length == 1 && ok(0).getLong(3) == 7L)
  }

  test("empty right side leaves every left row unmatched") {
    import spark.implicits._
    val lefts = Seq((1L, 5L, Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("id", "k", "t")
    val rights = Seq.empty[(Long, Long, Timestamp)].toDF("rk", "rid", "rt")
    val out = org.apache.spark.sql.graft.AsofJoinApi.join(
        lefts, rights, Seq("k" -> "rk"), "t", "rt", Seq("rid"))
      .collect()
    assert(out.length == 1 && out(0).isNullAt(4))
  }
}
