package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Typed Dataset[T] pipeline (SURVEY §1.4: `Dataset[T]` where type
  * safety helps): the TPC-H-Q1 shape re-expressed over a case class —
  * compile-time-checked field access, typed filter, groupByKey, and a
  * typed aggregation that carries exact integer cents through the
  * shuffle (the Det discipline, enforced by types rather than column
  * expressions).
  *
  * Trade-off, honestly: typed lambdas are opaque to Catalyst (no
  * pushdown through the filter closure, encoders serialize each row),
  * so the untyped twin agg_groupby remains the scale path; this entry
  * proves the API surface and its exact-arithmetic variant. */
object Typed {

  final case class Line(
      l_orderkey: Long,
      l_quantity: Double,
      l_extendedprice: Double,
      l_returnflag: String,
      l_linestatus: String,
      l_shipdate: Timestamp)

  def typedAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
      .as[Line]
    ds.filter(l => l.l_quantity > 5.0) // typed predicate
      .map(l => (l.l_returnflag,
        math.round(l.l_quantity * 100), // exact integer cents per row
        math.round(l.l_extendedprice * 100)))
      .groupByKey(_._1)
      .mapGroups { (flag, it) =>
        var n = 0L
        var qtyCents = 0L
        var priceCents = 0L
        it.foreach { t => n += 1; qtyCents += t._2; priceCents += t._3 }
        (flag, n, qtyCents, priceCents)
      }
      .toDF("l_returnflag", "n_rows", "qty_cents", "price_cents")
      .select(col("l_returnflag"), col("n_rows"),
        (col("qty_cents").cast("double") / 100.0).as("sum_qty"),
        (col("price_cents").cast("double") / 100.0).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  val typedAggSql: String =
    """SELECT l_returnflag, COUNT(*) AS n_rows,
      |  CAST(CAST(SUM(CAST(ROUND(CAST(l_quantity AS DECIMAL(27,10)), 2) * 100 AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS sum_qty,
      |  CAST(CAST(SUM(CAST(ROUND(CAST(l_extendedprice AS DECIMAL(27,10)), 2) * 100 AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS sum_price
      |FROM lineitem
      |WHERE l_quantity > 5.0
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "typed_agg" -> typedAgg,
  )

  val oracleSql: Map[String, String] = Map(
    "typed_agg" -> typedAggSql,
  )
}
