package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

import graft.sources.TxnLog

/** SQL DML face for the txn-log table format (r12 — VERDICT r11 #4:
  * "the D10 parity story stops at SELECT"): a delegating parser
  * injected via `spark.sql.extensions` that recognizes the GRAFT
  * maintenance/DML verbs and hands everything else to Spark's own
  * parser untouched. The statements (paths quoted, identifiers bare):
  *
  * {{{
  * GRAFT OPTIMIZE '<table root>' [ZORDER BY (colA, colB)]
  * GRAFT DELETE FROM '<root>' WHERE col BETWEEN 'lo' AND 'hi' [USING DV]
  * GRAFT MERGE INTO '<root>' USING <tempView> ON <keyCol>
  * GRAFT RESTORE '<root>' TO VERSION <n>
  * GRAFT VACUUM '<root>' [RETAIN <n> VERSIONS] [DRY RUN]
  * GRAFT CLONE '<srcRoot>' TO '<dstRoot>'
  * GRAFT ALTER '<root>' ADD CONSTRAINT <name> CHECK(<expr>)
  * GRAFT ALTER '<root>' DROP CONSTRAINT <name>
  * GRAFT ALTER '<root>' RENAME COLUMN <a> TO <b>
  * GRAFT ALTER '<root>' DROP COLUMN <a>
  * GRAFT UPGRADE '<root>' TO PROTOCOL(<r>, <w>)
  * GRAFT DESCRIBE HISTORY '<root>'          -- read-only, multi-row
  * }}}
  *
  * Each parses to a [[GraftDmlCommand]] — a `LeafRunnableCommand`
  * whose `run` drives the corresponding [[graft.sources.TxnLogOps]]
  * verb, so `spark.sql("GRAFT ...")` is the SAME planner ladder,
  * conflict checker, and protocol gate as the Scala API (one
  * implementation, two faces). Results come back as a one-row frame:
  * the committed `version` (−1 when the verb no-opped: nothing
  * matched, nothing to restore) or, for VACUUM, `n_reclaimed`.
  *
  * Deliberately a keyword-prefixed mini-grammar rather than an
  * ANTLR fork of MERGE/DELETE: the `GRAFT` prefix guarantees ZERO
  * overlap with Spark SQL (no statement Spark parses today or
  * tomorrow can collide), which is what makes a regex parser safe —
  * any malformed GRAFT statement fails loudly here, never silently
  * falls through to Spark. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = {
    val t = sqlText.trim
    if (!t.toUpperCase(java.util.Locale.ROOT).startsWith("GRAFT "))
      return delegate.parsePlan(sqlText)
    t match {
      case OptimizeZRe(path, cx, cy) =>
        GraftDmlCommand("zorder", path, Seq(cx, cy))
      case OptimizeRe(path) =>
        GraftDmlCommand("optimize", path, Seq.empty)
      case DeleteRe(path, colName, lo, hi, dv) =>
        GraftDmlCommand(if (dv != null) "delete_dv" else "delete",
          path, Seq(colName, lo, hi))
      case MergeRe(path, view, key) =>
        GraftDmlCommand("merge", path, Seq(view, key))
      case RestoreRe(path, v) =>
        GraftDmlCommand("restore", path, Seq(v))
      case VacuumRe(path, retain, dry) =>
        GraftDmlCommand("vacuum", path,
          Seq(Option(retain).getOrElse("1"),
            (dry != null).toString))
      case CloneRe(src, dst) =>
        GraftDmlCommand("clone", src, Seq(dst))
      case AddConstraintRe(path, name, exprSql) =>
        GraftDmlCommand("add_constraint", path, Seq(name, exprSql))
      case DropConstraintRe(path, name) =>
        GraftDmlCommand("drop_constraint", path, Seq(name))
      case RenameColRe(path, from, to) =>
        GraftDmlCommand("rename_column", path, Seq(from, to))
      case DropColRe(path, name) =>
        GraftDmlCommand("drop_column", path, Seq(name))
      case UpgradeRe(path, r, w) =>
        GraftDmlCommand("upgrade_protocol", path, Seq(r, w))
      case HistoryRe(path) =>
        GraftHistoryCommand(path)
      case other => throw new IllegalArgumentException(
        "malformed GRAFT statement (supported: OPTIMIZE [ZORDER BY], " +
          "DELETE FROM ... WHERE c BETWEEN 'lo' AND 'hi' [USING DV], " +
          "MERGE INTO ... USING view ON key, RESTORE ... TO VERSION n, " +
          "VACUUM [RETAIN n VERSIONS] [DRY RUN], CLONE src TO dst, " +
          "ALTER t ADD CONSTRAINT name CHECK(expr) / DROP CONSTRAINT " +
          "name / RENAME COLUMN a TO b / DROP COLUMN a, " +
          "UPGRADE t TO PROTOCOL(r, w), DESCRIBE HISTORY t): $other")
    }
  }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String)
  : FunctionIdentifier = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  // the GRAFT prefix is the dispatch guarantee; within it, paths are
  // single-quoted (no embedded quotes), identifiers are bare words
  private val P = """'([^']+)'"""
  private val I = """([A-Za-z_][A-Za-z0-9_]*)"""
  private def re(body: String) =
    ("""(?is)\s*GRAFT\s+""" + body + """\s*;?\s*""").r

  private[plans] val OptimizeZRe = re(
    s"""OPTIMIZE\\s+$P\\s+ZORDER\\s+BY\\s*\\(\\s*$I\\s*,\\s*$I\\s*\\)""")
  private[plans] val OptimizeRe = re(s"""OPTIMIZE\\s+$P""")
  private[plans] val DeleteRe = re(
    s"""DELETE\\s+FROM\\s+$P\\s+WHERE\\s+$I\\s+BETWEEN\\s+$P\\s+AND\\s+$P(\\s+USING\\s+DV)?""")
  private[plans] val MergeRe = re(
    s"""MERGE\\s+INTO\\s+$P\\s+USING\\s+$I\\s+ON\\s+$I""")
  private[plans] val RestoreRe = re(
    s"""RESTORE\\s+$P\\s+TO\\s+VERSION\\s+(\\d+)""")
  private[plans] val VacuumRe = re(
    s"""VACUUM\\s+$P(?:\\s+RETAIN\\s+(\\d+)\\s+VERSIONS)?(\\s+DRY\\s+RUN)?""")
  private[plans] val CloneRe = re(s"""CLONE\\s+$P\\s+TO\\s+$P""")
  // greedy body up to the LAST ')': CHECK expressions may nest parens
  private[plans] val AddConstraintRe = re(
    s"""ALTER\\s+$P\\s+ADD\\s+CONSTRAINT\\s+$I\\s+CHECK\\s*\\((.+)\\)""")
  private[plans] val DropConstraintRe = re(
    s"""ALTER\\s+$P\\s+DROP\\s+CONSTRAINT\\s+$I""")
  private[plans] val RenameColRe = re(
    s"""ALTER\\s+$P\\s+RENAME\\s+COLUMN\\s+$I\\s+TO\\s+$I""")
  private[plans] val DropColRe = re(
    s"""ALTER\\s+$P\\s+DROP\\s+COLUMN\\s+$I""")
  private[plans] val UpgradeRe = re(
    s"""UPGRADE\\s+$P\\s+TO\\s+PROTOCOL\\s*\\(\\s*(\\d+)\\s*,\\s*(\\d+)\\s*\\)""")
  private[plans] val HistoryRe = re(s"""DESCRIBE\\s+HISTORY\\s+$P""")
}

/** One GRAFT DML statement, planned as a leaf command: `run` drives
  * the Scala-API verb and returns its committed version (−1 = no-op)
  * — VACUUM returns the reclaim-set size instead. The session tag
  * identifies SQL-face writers in tmp names and the audit trail. */
case class GraftDmlCommand(verb: String, path: String,
                           args: Seq[String])
  extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(AttributeReference(
    if (verb == "vacuum") "n_reclaimed" else "version", IntegerType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val session = "sqldml"
    val n = verb match {
      case "optimize" =>
        TxnLog.compact(spark, path, session).getOrElse(-1)
      case "zorder" =>
        TxnLog.compactZorder(spark, path, args, session).getOrElse(-1)
      case "delete" =>
        TxnLog.deleteRange(spark, path, args(0), args(1), args(2),
          session).getOrElse(-1)
      case "delete_dv" =>
        TxnLog.deleteRangeDV(spark, path, args(0), args(1), args(2),
          session).getOrElse(-1)
      case "merge" =>
        TxnLog.mergeUpsert(spark, path, spark.table(args(0)), args(1),
          session).getOrElse(-1)
      case "restore" =>
        TxnLog.restore(path, args(0).toInt, session).getOrElse(-1)
      case "vacuum" =>
        TxnLog.vacuum(path, retainVersions = args(0).toInt,
          dryRun = args(1).toBoolean).size
      case "clone" =>
        TxnLog.cloneTable(path, args(0), session)
      case "add_constraint" =>
        TxnLog.addConstraint(spark, path, args(0), args(1), session)
      case "drop_constraint" =>
        TxnLog.dropConstraint(path, args(0), session)
      case "rename_column" =>
        TxnLog.renameColumn(path, args(0), args(1), session)
      case "drop_column" =>
        TxnLog.dropColumn(path, args(0), session)
      case "upgrade_protocol" =>
        TxnLog.upgradeProtocol(path, args(0).toInt, args(1).toInt,
          session)
      case other =>
        throw new IllegalStateException(s"unknown GRAFT verb $other")
    }
    Seq(Row(n))
  }
}

/** `GRAFT DESCRIBE HISTORY 't'` — the read-side utility statement:
  * per committed version, the action census and post-replay live
  * count, straight from the log (driver metadata, zero data I/O at
  * any table size — the audit an operator runs before trusting time
  * travel or choosing a RESTORE target). */
case class GraftHistoryCommand(path: String) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType)(),
    AttributeReference("ts", org.apache.spark.sql.types.LongType)(),
    AttributeReference("n_adds", IntegerType)(),
    AttributeReference("n_removes", IntegerType)(),
    AttributeReference("n_live", IntegerType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val liveCounts = TxnLog.liveSets(path).toMap
    TxnLog.versions(path).map { v =>
      val acts = TxnLog.actionsAt(path, v)
      Row(v, TxnLog.commitTs(path, v),
        acts.count(_.action == "add"),
        acts.count(_.action == "remove"),
        liveCounts.get(v).map(_.size).getOrElse(0))
    }
  }
}
