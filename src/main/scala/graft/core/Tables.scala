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

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
