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
  * DECIMAL(27,10) holds any |x| < 1e17 with 10 fractional digits —
  * far beyond the testdata's 2-decimal money values — and its sum stays
  * within DECIMAL(38,10) for trillions of rows, so the same expression
  * is scale-safe at 100 TB.
  *
  * The DuckDB twin of each helper is in [[DetSql]].
  */
object Det {
  private val D = DecimalType(27, 10)
  private val DOut = DecimalType(38, 10)

  /** Exact, order-independent sum of a double column. Kept as
    * DECIMAL(38,10) to the end: a final cast to double rounds
    * differently in DuckDB (int128/10^scale in two steps) vs Spark
    * (BigDecimal, correctly rounded), so the decimal IS the contract. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast(DOut)

  /** avg as round((exact sum as double)/count, 6): the double cast may
    * differ by 1 ulp between engines, but averages stay row-magnitude
    * (not row-count magnitude), so 6-decimal rounding absorbs it at any
    * data scale. */
  def davg(c: Column): Column =
    round(sum(c.cast(D)).cast("double") / count(c), 6)
}

/** DuckDB SQL fragments matching [[Det]] exactly. */
object DetSql {
  def dsum(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(27,10))) AS DECIMAL(38,10))"
  def davg(x: String): String =
    s"ROUND(CAST(SUM(CAST($x AS DECIMAL(27,10))) AS DOUBLE) / COUNT($x), 6)"
}
