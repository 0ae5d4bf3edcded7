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

  /** events.ts has shipped as two physical types across testdata
    * generations: INT64 TIMESTAMP(NANOS) (which Spark 4 rejects unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` surfaces it as a nano
    * count — set at SparkSession construction by Verify/Bench/SparkSpec,
    * NOT here, so table loads have no session side effects) and plain
    * µs TIMESTAMP. Adapt on the observed type instead of assuming one:
    * a LONG is floor-truncated nanos→µs (the same truncation DuckDB
    * applies when it surfaces nanos as µs TIMESTAMP, so oracle
    * comparisons agree); a native timestamp passes through untouched —
    * it is already the type family the oracle sees. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000L")))
      case _ => df
    }
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
