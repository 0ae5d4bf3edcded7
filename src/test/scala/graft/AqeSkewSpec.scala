package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE's skew-join split — the automatic counterpart of
  * Skew.saltedJoin: with broadcast disabled and the skew thresholds
  * scaled down to test-data size, a sort-merge join over one hot key
  * must be re-planned with split skewed partitions. */
class AqeSkewSpec extends AnyFunSuite with SparkSpec {

  test("AQE splits the skewed sort-merge join partition") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~200k rows, 90% on one key; payload widens the bytes per row
      val big = spark.range(200000).select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 50).as("k"),
        concat(lit("x"), col("id")).as("payload"))
      val small = spark.range(50).select(col("id").as("k"),
        concat(lit("dim"), col("id")).as("name"))
      val joined = big.join(small, "k")
      // drive THIS DataFrame's query execution (count() would plan a
      // separate aggregate query and leave this plan un-finalized)
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(800)}")
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skew split:\n${plan.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
