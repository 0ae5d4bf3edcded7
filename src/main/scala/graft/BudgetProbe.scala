package graft

import org.apache.spark.sql.SparkSession

object BudgetProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val re = "(?<!Broadcast)Exchange ".r
    for (name <- args) {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      val ex = re.findAllIn(plan).size
      val cart = plan.contains("CartesianProduct")
      val bnl = plan.contains("BroadcastNestedLoopJoin")
      println(s"BUDGET $name exchanges=$ex cartesian=$cart bnl=$bnl")
      graft.core.Caches.drain(spark)
    }
    spark.stop()
  }
}
