package graft.sources

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.sources.{
  And, BaseRelation, DataSourceRegister, EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, In, LessThan, LessThanOrEqual, PrunedFilteredScan,
  RelationProvider}
import org.apache.spark.sql.types.StructType

/** Batch DataSource over the [[TxnLog]] table — the `spark.read
  * .format(...)` / SQL face of the format (the streaming face is
  * [[graft.streaming.TxnLogSourceProvider]]). Built on the V1
  * `RelationProvider` + `PrunedFilteredScan` seam: Catalyst hands the
  * relation its pushed predicates, the relation turns them into
  * FILE-LEVEL pruning against the log's metadata (partition tuples,
  * min/max stats, bloom filters — [[TxnLogOps.pruneWhere]] /
  * [[TxnLogOps.pruneEq]]), and every filter is also declared
  * unhandled so Spark re-applies it row-level above the scan —
  * pruning can only ever REMOVE I/O, never change results.
  *
  * Options: `path` (required), `versionAsOf` (int) or
  * `timestampAsOf` (epoch ms) for time travel.
  *
  * Scale shape: predicate → pruned-file-list resolution is driver
  * metadata; the scan is the same one multi-path DV-applied read
  * every [[TxnLogOps.read]] plans, restricted to surviving files. */
class TxnTableProvider extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-txn"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val root = parameters.getOrElse("path", throw new
        IllegalArgumentException("graft-txn needs a `path` option"))
    require(!(parameters.contains("versionAsOf") &&
      parameters.contains("timestampAsOf")),
      "versionAsOf and timestampAsOf are mutually exclusive")
    val version = parameters.get("versionAsOf").map(_.toInt)
      .orElse(parameters.get("timestampAsOf")
        .map(ts => TxnLog.versionAsOf(root, ts.toLong)))
      .getOrElse(TxnLog.latestVersion(root))
    new TxnTableRelation(sqlContext, root, version)
  }
}

class TxnTableRelation(override val sqlContext: SQLContext,
                       root: String, version: Int)
  extends BaseRelation with PrunedFilteredScan {

  override def schema: StructType =
    TxnLog.schemaAt(root, version).getOrElse(
      TxnLog.read(sqlContext.sparkSession, root, version).schema)

  /** Every filter is re-applied by Spark above the scan (we declare
    * them all unhandled); here they only SHRINK the file list. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val (scanned, pruned) =
      TxnTableRelation.pruneFor(root, version, filters)
    TxnTableRelation.lastScan.set((scanned, pruned))
    val df = TxnLog.readFiles(sqlContext.sparkSession, root, version,
      scanned)
    df.select(requiredColumns.toSeq.map(org.apache.spark.sql
      .functions.col): _*).rdd
  }
}

object TxnTableRelation {

  /** The last buildScan's (scanned, pruned) split — the observable
    * seam the pushdown spec asserts on (plans do not expose V1
    * file-level pruning any other way). */
  val lastScan: AtomicReference[(Seq[String], Seq[String])] =
    new AtomicReference((Seq.empty, Seq.empty))

  /** Canonical string rendering of a pushed filter value — Spark's
    * OWN cast-to-string semantics, evaluated through Catalyst
    * (`Cast(Literal(v), StringType)` under the session timezone), so
    * the rendering is bit-identical to what [[TxnLogOps.statsFor]] /
    * [[TxnLogOps.bloomFor]] logged at write time (`min(col)
    * .cast("string")`). ADVICE r11 high: `String.valueOf` rendered a
    * pushed `java.sql.Timestamp` as "2024-01-01 00:00:00.0", which
    * never equals the logged "2024-01-01 00:00:00" — the stats
    * comparison and bloom hash then PRUNED files holding matching
    * rows, and pruning must only ever remove I/O, never rows. A value
    * Catalyst cannot render (None) makes its filter prune NOTHING —
    * the conservative direction. */
  private[graft] def canonical(v: Any): Option[String] = v match {
    case null => None
    case s: String => Some(s)
    case _ => scala.util.Try {
      org.apache.spark.sql.catalyst.expressions.Cast(
        org.apache.spark.sql.catalyst.expressions.Literal(v),
        org.apache.spark.sql.types.StringType,
        Some(org.apache.spark.sql.internal.SQLConf.get
          .sessionLocalTimeZone))
        .eval(null)
    }.toOption.flatMap(Option(_)).map(_.toString)
  }

  /** Fold Catalyst's pushed filters into the log's two pruning
    * shapes: BETWEEN-style bounds feed [[TxnLogOps.pruneWhere]] (the
    * bound of a strict inequality is used inclusively — conservative)
    * and equality/IN feed [[TxnLogOps.pruneEq]] (stats + bloom; an IN
    * file survives when ANY listed value is admitted). Unrecognized
    * filters — and values [[canonical]] cannot render the writers'
    * way — prune nothing. */
  private[graft] def pruneFor(root: String, version: Int,
                              filters: Array[Filter])
  : (Seq[String], Seq[String]) = {
    def flat(f: Filter): Seq[Filter] = f match {
      case And(l, r) => flat(l) ++ flat(r)
      case other => Seq(other)
    }
    val fs = filters.toSeq.flatMap(flat)
    // each pushed bound becomes its own one-sided predicate (the
    // bound of a strict inequality used inclusively — conservative);
    // an equality bounds both sides AND prunes on partition tuples
    val ranges: Seq[(String, Option[String], Option[String])] =
      fs.flatMap {
        case GreaterThanOrEqual(c, v) =>
          canonical(v).map(s => (c, Some(s), None))
        case GreaterThan(c, v) => canonical(v).map(s => (c, Some(s), None))
        case LessThanOrEqual(c, v) =>
          canonical(v).map(s => (c, None, Some(s)))
        case LessThan(c, v) => canonical(v).map(s => (c, None, Some(s)))
        case EqualTo(c, v) => canonical(v).map(s => (c, Some(s), Some(s)))
        case _ => None
      }
    val partEq = fs.flatMap {
      case EqualTo(c, v) => canonical(v).map(c -> _)
      case _ => None
    }
    val (rangeScanned, _) =
      TxnLog.pruneBounds(root, version, partEq, ranges)
    // equality + IN: bloom-capable pruning; IN = union of survivors
    // (an IN with ANY unrenderable value prunes nothing — dropping
    // just that value would wrongly prune its holders)
    val eqSurvivors: Seq[Set[String]] = fs.flatMap {
      case EqualTo(c, v) => canonical(v).map(s =>
        TxnLog.pruneEq(root, version, c, s)._1.toSet)
      case In(c, vs) if vs.nonEmpty =>
        val rendered = vs.toSeq.map(canonical)
        if (rendered.exists(_.isEmpty)) None
        else Some(rendered.flatten
          .map(s => TxnLog.pruneEq(root, version, c, s)._1.toSet)
          .reduce(_ | _))
      case _ => None
    }
    val scanned = eqSurvivors
      .foldLeft(rangeScanned.toSet)(_ & _).toSeq.sorted
    val all = TxnLog.liveFiles(root, version)
    (scanned, all.filterNot(scanned.contains))
  }
}
