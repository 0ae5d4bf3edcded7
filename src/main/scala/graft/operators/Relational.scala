package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Det, Tables}

/** Relational operator inventory (SURVEY.md §2B).
  *
  * The reference exposes its analytic surface as an open ETL hook on the
  * loaded table (DefragmentAvroFolder.scala:280-282) plus full SparkSQL
  * (TemplateApp.scala:52); this module makes that surface concrete as
  * declarative DataFrame pipelines. Everything here is plain Catalyst —
  * pushdown, pruning, join strategy selection, AQE — so the same code
  * scales from the sf0.01 oracle runs to a 1000-executor cluster.
  */
object Relational {

  /** TPC-H-Q1-style aggregation over lineitem: hash partial+final agg,
    * map-side combine; shuffles only |groups| rows per partition. */
  def aggGroupBy(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val aggGroupBySql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${graft.core.DetSql.dsum("l_quantity")} AS sum_qty,
       |  ${graft.core.DetSql.dsum("l_extendedprice")} AS sum_base_price,
       |  ${graft.core.DetSql.dsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${graft.core.DetSql.davg("l_quantity")} AS avg_qty,
       |  ${graft.core.DetSql.davg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
