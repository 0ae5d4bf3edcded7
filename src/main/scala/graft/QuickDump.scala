package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop helper: dump named registry queries (and their oracle SQL)
  * to parquet/json under /tmp/graft_quickdump for ad-hoc DuckDB
  * comparison before a full Verify run. */
object QuickDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = sys.env.getOrElse("SPARK_GRAFT_OUT", "/tmp/graft_quickdump")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sqls = scala.collection.mutable.Map.empty[String, String]
    for (name <- args) {
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      SparkEntry.oracleSql.get(name).foreach(sqls(name) = _)
      graft.core.Caches.drain(spark)
      println(s"DUMPED $name")
    }
    val json = sqls.map { case (k, v) =>
      "\"" + k + "\": " + com.fasterxml.jackson.databind.json.JsonMapper
        .builder().build().writeValueAsString(v)
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"), json)
    spark.stop()
  }
}
