package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for DuckDB-oracle hash matching.
  *
  * Double summation is evaluation-order dependent, and Spark's
  * partial/final aggregation order varies with partitioning, so
  * `sum(double)` is not bit-reproducible across engines (or even runs).
  * Casting to an exact decimal *before* aggregating makes the sum a
  * single exact value in both Spark and DuckDB.
  *
  * Round 1 kept the result as DECIMAL(38,10); the driver's raw-value
  * hash is representation-sensitive and every DECIMAL output column
  * hash-missed (CORRECTNESS_r01.json: agg_global/agg_groupby/
  * agg_rollup_cube/join_multiway) while all double/bigint columns
  * passed. A direct DECIMAL→DOUBLE cast is also unsafe: Spark converts
  * via BigDecimal (correctly rounded) while DuckDB divides an int128 by
  * 10^scale in float space — up to 1 ulp apart.
  *
  * The fix: after the exact decimal sum, round to cents (exact decimal
  * op, HALF_UP away-from-zero in both engines), convert the *integral*
  * cents to BIGINT (exact), then to DOUBLE (exact below 2^53 — holds to
  * ~9e13 currency units, beyond a 100 TB fact table's sums), and divide
  * by 100.0 (one IEEE-754 op). Every step is either exact or a single
  * identical IEEE operation in both engines, so the final double is
  * bit-identical. The DuckDB twin of each helper is in [[DetSql]].
  */
object Det {
  private val D = DecimalType(27, 10)

  /** Order-independent, engine-portable sum of a double column at cent
    * (2-decimal) precision, emitted as DOUBLE. */
  def dsum(c: Column): Column =
    (round(sum(c.cast(D)), 2) * lit(100)).cast("long").cast("double") / lit(100.0)

  /** Average derived from [[dsum]]: (exact cent-sum as double) / count.
    * The division is the same single IEEE op in both engines, so the
    * result is bit-identical without any post-rounding. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Per-row exact integer cents of a 2-decimal money double — the
    * building block for order-sensitive exact arithmetic (running sums,
    * windowed totals) where the rounding must happen per row, before
    * the aggregation, instead of after it as in [[dsum]]. */
  def cents(c: Column): Column =
    (round(c.cast(D), 2) * lit(100)).cast("long")

  /** Microsecond epoch of a timestamp-family column. `unix_micros`
    * itself rejects TIMESTAMP_NTZ (the type parquet µs columns infer as
    * under Spark 4's NTZ inference, and what the driver-regenerated
    * events.ts/o_orderdate arrive as); the cast NTZ→TIMESTAMP is
    * value-identical under the UTC session timezone every entrypoint
    * pins, and a no-op when the input is already TIMESTAMP. DuckDB twin:
    * epoch_us(col). */
  def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))
}

/** DuckDB SQL fragments matching [[Det]] exactly. */
object DetSql {
  def dsum(x: String): String =
    s"CAST(CAST(ROUND(SUM(CAST($x AS DECIMAL(27,10))), 2) * 100 AS BIGINT) AS DOUBLE) / 100.0"
  def davg(x: String): String =
    s"${dsum(x)} / COUNT($x)"
  def cents(x: String): String =
    s"CAST(ROUND(CAST($x AS DECIMAL(27,10)), 2) * 100 AS BIGINT)"

  /** Truncating integer division matching Spark's `div` on SIGNED
    * numerators (Spark truncates toward zero; DuckDB's `//` floors —
    * they disagree on every negative quotient). Positive divisors
    * only. */
  def tdiv(a: String, b: String): String =
    s"(CASE WHEN ($a) < 0 THEN -((-($a)) // ($b)) ELSE ($a) // ($b) END)"
}
