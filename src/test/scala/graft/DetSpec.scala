package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Det

/** Properties of the cross-engine exact-aggregation discipline:
  * dsum equals the true BigDecimal cent-sum regardless of values or
  * partitioning, and repeated evaluation is bit-stable (the property
  * the driver's hash gate depends on). */
class DetSpec extends AnyFunSuite with SparkSpec {

  private val money: Gen[Double] =
    Gen.chooseNum(-99999999L, 99999999L).map(_ / 100.0) // exact 2-dp doubles

  test("dsum equals the exact BigDecimal cent-sum for arbitrary 2-dp data") {
    import spark.implicits._
    for (seed <- 1 to 8) {
      val xs = Gen.nonEmptyListOf(money)
        .pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val expected = xs.map(x => BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP))
        .sum.setScale(2, BigDecimal.RoundingMode.HALF_UP)
      val got = xs.toDF("v").repartition(5)
        .agg(Det.dsum(col("v")).as("s")).head.getDouble(0)
      assert(got == (expected * 100).toLongExact.toDouble / 100.0,
        s"dsum=$got expected=$expected for n=${xs.size} seed=$seed")
    }
  }

  test("dsum is partitioning-invariant bit-for-bit") {
    import spark.implicits._
    val xs = (1 to 5000).map(i => ((i * 7919 % 100000) - 50000) / 100.0)
    val bits = Seq(1, 3, 8, 32).map { n =>
      java.lang.Double.doubleToLongBits(
        xs.toDF("v").repartition(n).agg(Det.dsum(col("v"))).head.getDouble(0))
    }
    assert(bits.distinct.size == 1, s"partitioning changed the sum: $bits")
  }

  test("davg is dsum/count exactly") {
    import spark.implicits._
    val xs = Seq(1.23, 4.56, 7.89, -2.34)
    val df = xs.toDF("v")
    val s = df.agg(Det.dsum(col("v"))).head.getDouble(0)
    val a = df.agg(Det.davg(col("v"))).head.getDouble(0)
    assert(java.lang.Double.doubleToLongBits(a) ==
      java.lang.Double.doubleToLongBits(s / xs.size))
  }

  test("dsum stays exact at 100TB-scale magnitudes (cents below 2^53)") {
    import spark.implicits._
    // 500 rows of ~1.6e11 each → sum ~8e13, cents ~8e15 < 2^53 ≈ 9e15
    val big = 160000000000.25
    val got = Seq.fill(500)(big).toDF("v").repartition(7)
      .agg(Det.dsum(col("v"))).head.getDouble(0)
    val expectedCents = (BigDecimal(big).setScale(10) * 500 * 100).toLongExact
    assert(got == expectedCents.toDouble / 100.0)
  }

  test("cents is the exact per-row integer-cent value") {
    import spark.implicits._
    val out = Seq(0.01, -0.01, 123.45, 99999.99).toDF("v")
      .select(Det.cents(col("v")).as("c")).collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L, -1L, 12345L, 9999999L))
  }

  test("streaming eventCents agrees with Det.cents on arbitrary doubles") {
    // ADVICE r7: the stream processors' driver-side rounding must be
    // THE SAME function as the batch twins' Det.cents, or stream-vs-
    // batch equality is data-dependent (math.round(1.005*100) = 100
    // while the decimal path gives 101). Property: for doubles of up
    // to 6 decimal digits — including the half-cent boundary cases the
    // binary representation garbles — the two paths are equal row by
    // row.
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(-9999999999L, 9999999999L)
      scale <- Gen.oneOf(0, 1, 2, 3, 4, 5, 6)
    } yield n.toDouble / math.pow(10, scale)
    for (seed <- 1 to 8) {
      val xs = Gen.nonEmptyListOf(gen)
        .pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val batch = xs.toDF("v")
        .select(Det.cents(col("v")).as("c")).collect().map(_.getLong(0))
      val stream = xs.map(graft.streaming.EventStreams.eventCents)
      assert(batch.toSeq == stream,
        s"cents paths diverge at seed=$seed: " +
          xs.zip(batch.zip(stream)).find { case (_, (b, s)) => b != s })
    }
    // non-finite domain: batch casts to NULL (skipped by sum) — the
    // streaming path must contribute 0, not throw (r8 self-review)
    for (bad <- Seq(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity))
      assert(graft.streaming.EventStreams.eventCents(bad) == 0L)
  }

  test("eventCents survives magnitudes past the DECIMAL/BIGINT boundary") {
    // ADVICE r8: finite |v| ≳ 9.2e16 made longValueExact() throw and
    // kill the streaming query. Past either overflow boundary (cents
    // past ±2^63 at ~9.22e16, DECIMAL(27,10) at 1e17) the stream must
    // contribute 0 — never throw — while values just INSIDE the
    // boundary still round exactly.
    import graft.streaming.EventStreams.eventCents
    val inside = 9.2e16 // cents 9.2e18 < 2^63-1 ≈ 9.223e18
    assert(eventCents(inside) == 9200000000000000000L)
    assert(eventCents(-inside) == -9200000000000000000L)
    for (big <- Seq(9.3e16, 1e17, 1e18, 4.9e307,
        -9.3e16, -1e17, -1e18, -4.9e307))
      assert(eventCents(big) == 0L, s"eventCents($big) must clamp to 0")
    // property sweep across the boundary decades: NEVER throws
    val gen = for {
      mag <- Gen.chooseNum(15, 20)
      m <- Gen.chooseNum(1000L, 9999L)
      sign <- Gen.oneOf(1, -1)
    } yield sign * (m / 1000.0) * math.pow(10, mag.toDouble)
    val xs = Gen.listOfN(500, gen)
      .pureApply(Gen.Parameters.default, Seed(42L))
    xs.foreach { v =>
      val c = eventCents(v) // must not throw anywhere in the sweep
      if (math.abs(v) >= 1e17) assert(c == 0L, s"eventCents($v)=$c")
    }
  }
}
