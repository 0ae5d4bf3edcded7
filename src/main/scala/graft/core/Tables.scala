package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders over the driver-generated parquet testdata.
  *
  * The reference (guptam/spark-dba) models a "table" as a folder of
  * row-oriented container files discovered on a filesystem
  * (HDFSAvroOperations.scala:56-75); here the table abstraction is a
  * Spark file-source directory, which inherits partition discovery,
  * predicate pushdown, column pruning and vectorized reads from
  * Catalyst. At 100 TB these would be partitioned/bucketed parquet
  * roots; `spark.read.parquet(dir)` scales to that unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is INT64 TIMESTAMP(NANOS) parquet, which Spark 4 rejects
    * outright. With `spark.sql.legacy.parquet.nanosAsLong=true` — set at
    * SparkSession construction by Verify/Bench/SparkSpec, NOT here, so
    * table loads have no session side effects — the column arrives as a
    * nano count; floor-truncate to microsecond timestamps, the same
    * truncation DuckDB applies when it surfaces the column as µs
    * TIMESTAMP, so oracle comparisons agree. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000L")))
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = loadEvents(s, d)
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
