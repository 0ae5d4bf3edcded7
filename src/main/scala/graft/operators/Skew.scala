package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Det, DetSql, Tables}

/** Skew-mitigation utilities for joins whose key distribution is
  * pathological (one hot key owning a large fraction of a 100 TB fact
  * table — the case AQE's skew-join split handles for sort-merge
  * joins, provided here as an explicit, planner-independent tool).
  *
  * Salting pattern: the skewed (big) side gets a uniform salt in
  * [0, n); the small side is replicated n× with every salt value; the
  * join key becomes (key, salt), spreading each hot key over n
  * reducers. Cost: small side inflates n× — use only when the small
  * side is broadcast-size and the big side's key histogram is skewed.
  */
object Skew {

  /** Spark's hash() rejects MapType anywhere in its input (map iteration
    * order makes the hash nondeterministic), so the salt below may only
    * feed on hash-supported columns. */
  private def hashSupported(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => false
      case s: StructType => s.fields.forall(f => hashSupported(f.dataType))
      case a: ArrayType => hashSupported(a.elementType)
      case _ => true
    }
  }

  /** Inner equi-join with an n-way salt on the big side's hot keys.
    * Map-typed columns of `big` are excluded from the salt hash (see
    * [[hashSupported]]) — they still join and project normally; they
    * just don't contribute entropy to the salt. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, n: Int): DataFrame = {
    require(n > 0, "salt fan-out must be positive")
    // The salt feeds a shuffle, so it must be retry-stable: a
    // nondeterministic source (monotonically_increasing_id, rand) would
    // re-salt recomputed rows on partial map-stage retry and silently
    // drop/duplicate output. Hash the row's own columns plus the input
    // partition id: content-identical rows (exact-duplicate documents —
    // the very workload hot keys come from) then still spread across
    // reducers by their source partition, while a retried partition
    // reproduces the same pid and rows, hence the same salts.
    // CONTRACT: `big`'s row→partition assignment must be deterministic
    // (scans and hash-partitioned shuffles are; a round-robin
    // repartition over a nondeterministic upstream is not — there the
    // pid term would reintroduce the retry hazard). Residual caveat:
    // duplicates co-located in ONE input partition share a salt,
    // bounding spread by the input partitioning, not defeating it.
    val hashable = big.schema.fields
      .filter(f => hashSupported(f.dataType)).map(f => col(f.name))
    val salted = big.withColumn("_salt",
      pmod(hash((hashable :+ spark_partition_id()).toIndexedSeq: _*),
        lit(n)))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("_salt") === replicated("_salt"))
      .drop(replicated(key)).drop("_salt")
  }

  /** Registry query: the salted join driven end-to-end against the
    * oracle — lineitem (big side, salted 8 ways) ⋈ supplier on
    * suppkey, aggregated per nation. Salting only redistributes rows
    * across reducers; the result set is identical to the plain join,
    * which is exactly what the oracle (a plain SQL join) proves. */
  def joinSkewSalted(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_quantity"))
    val sup = Tables.supplier(spark, dir)
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    saltedJoin(li, sup, "l_suppkey", n = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("s_nationkey"))
  }

  val joinSkewSaltedSql: String =
    s"""SELECT s_nationkey, COUNT(*) AS n,
       |  ${DetSql.dsum("l_quantity")} AS sum_qty
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY s_nationkey
       |ORDER BY s_nationkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_skew_salted" -> joinSkewSalted,
  )

  val oracleSql: Map[String, String] = Map(
    "join_skew_salted" -> joinSkewSaltedSql,
  )

  /** Key histogram — the diagnostic used to decide whether to salt:
    * top-k keys by row count with their share of the table. */
  def keyHistogram(df: DataFrame, key: Column, topK: Int = 10): DataFrame = {
    val total = df.count()
    df.groupBy(key).agg(count(lit(1)).as("rows"))
      .withColumn("share", col("rows") / lit(total.toDouble))
      .orderBy(col("rows").desc)
      .limit(topK)
  }
}
