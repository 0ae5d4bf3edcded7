package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salted-join equivalence: same rows as the plain join on skewed
  * data, with the hot key spread over the salt fan-out. */
class SkewSpec extends AnyFunSuite with SparkSpec {

  test("salted join returns exactly the plain join's rows under skew") {
    import spark.implicits._
    // 10k rows, 80% on one hot key
    val big = spark.range(10000)
      .select(when(col("id") % 5 =!= 0, lit(42L)).otherwise(col("id") % 100)
        .as("k"), col("id").as("payload"))
    val small = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(small, "k")
      .select(col("k"), col("payload"), col("name"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = Skew.saltedJoin(big, small, "k", n = 8)
      .select(big("k"), col("payload"), col("name"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join tolerates map-typed columns on the big side") {
    import spark.implicits._
    // hash() rejects MapType — the salt must skip such columns instead
    // of failing analysis (ADVICE r3)
    val big = spark.range(100)
      .select((col("id") % 10).as("k"), col("id").as("payload"),
        map(lit("a"), col("id")).as("attrs"))
    val small = (0L until 10L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val out = Skew.saltedJoin(big, small, "k", n = 4)
      .select(big("k"), col("payload"), col("name"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val plain = big.join(small, "k")
      .select(col("k"), col("payload"), col("name"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(out.toSeq == plain.toSeq)
  }

  test("salted join equals the plain join across random skews and fan-outs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    for (seed <- 1 to 3) {
      val params = Gen.zip(
          Gen.chooseNum(200, 2000),   // rows
          Gen.chooseNum(0L, 20L),     // hot key
          Gen.oneOf(1, 4, 16))        // salt fan-out
        .pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val (rows, hot, n) = params
      val big = spark.range(rows)
        .select(when(col("id") % 3 =!= 0, lit(hot))
          .otherwise(col("id") % 25).as("k"), col("id").as("payload"))
      val small = (0L until 25L).map(k => (k, s"d_$k")).toDF("k", "name")
      val plain = big.join(small, "k")
        .select(col("k"), col("payload"), col("name"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
      val salted = Skew.saltedJoin(big, small, "k", n)
        .select(big("k"), col("payload"), col("name"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
      assert(salted.toSeq == plain.toSeq,
        s"mismatch at rows=$rows hot=$hot n=$n")
    }
  }

  test("key histogram surfaces the hot key") {
    import spark.implicits._
    val big = spark.range(1000)
      .select(when(col("id") % 4 =!= 0, lit(7L)).otherwise(col("id") % 10).as("k"))
    val top = Skew.keyHistogram(big, col("k"), topK = 1).collect()(0)
    assert(top.getLong(0) == 7L)
    assert(top.getDouble(2) > 0.5)
  }
}
