package graft

import org.apache.spark.sql.functions._

import graft.core.{Det, Tables}

/** One-off probe (VERDICT r5 next-round #4): split
  * write_dynamic_overwrite's cost into stage-write / patch-overwrite /
  * read-aggregate to find where the r4→r5 idle delta (0.88→1.74 s)
  * lives. Run: sbt "Test/runMain graft.DynOverProbe"
  */
object DynOverProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = "/root/testdata/sf0.1"
    def ms(f: => Unit): Long = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1000000
    }
    // warm
    spark.range(1 << 20).groupBy((col("id") % 7).as("k")).count().collect()
    (1 to 5).foreach { i =>
      val base = java.nio.file.Files.createTempDirectory("graft_dynprobe").toString
      val t = s"$base/orders"
      val o = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      val w1 = ms(o.repartition(col("o_orderstatus")).write.partitionBy("o_orderstatus").parquet(t))
      val patch = o.where(col("o_orderstatus") === "F")
        .select(col("o_orderkey"),
          (Det.cents(col("o_totalprice")) - lit(500L)).cast("double")
            .divide(lit(100.0)).as("o_totalprice"),
          col("o_orderstatus"))
      val w2 = ms(patch.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderstatus").parquet(t))
      val r = ms {
        spark.read.parquet(t)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("sum_price"))
          .orderBy(col("o_orderstatus")).collect()
      }
      new graft.compact.FsOps(spark.sparkContext.hadoopConfiguration).delete(base)
      println(s"PROBE run=$i stage=${w1}ms overwrite=${w2}ms read=${r}ms total=${w1 + w2 + r}ms")
    }
    spark.stop()
  }
}
