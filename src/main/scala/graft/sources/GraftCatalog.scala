package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{
  NamespaceAlreadyExistsException, NoSuchNamespaceException,
  NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier,
  NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** V2 `TableCatalog` over txn-log tables — the NAME face of the
  * format (r12, the seam that finishes D10 parity: path-free SQL).
  * Register it once:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft",
  *   "graft.sources.GraftCatalog")
  * spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/wh")
  * }}}
  *
  * after which the whole lifecycle is plain Spark SQL by NAME:
  * `CREATE NAMESPACE graft.main`, `CREATE TABLE graft.main.t (...)`,
  * `INSERT INTO` / `INSERT OVERWRITE` (through the V2 write seam —
  * same schema contract, CHECK enforcement, write-time stats, and
  * commit protocol as the Scala API), `SELECT ... FROM graft.main.t`
  * (the V2 columnar read with log-metadata pruning and reported
  * statistics), Spark's NATIVE time travel `VERSION AS OF n` /
  * `TIMESTAMP AS OF ts` (resolved by [[loadTable]] overloads — no
  * custom syntax), `ALTER TABLE ... ADD COLUMNS / RENAME COLUMN /
  * DROP COLUMN` (the log's metadata-only schema surgery), `SHOW
  * TABLES`, `DROP TABLE`. Maintenance verbs stay on the GRAFT DML
  * face ([[graft.plans.GraftSqlParser]]) — Spark has no OPTIMIZE /
  * VACUUM grammar to hook.
  *
  * Layout is directory-shaped: `warehouse/ns.../table` IS the table
  * root (a namespace is a directory; a table is a directory with a
  * log). The warehouse is re-read from the session conf on every
  * access, not pinned at [[initialize]] — catalog instances are
  * cached per session, and a test or a notebook that repoints the
  * warehouse must not keep writing into the old one.
  *
  * A time-traveled load is READ-ONLY ([[GraftTxnTable]] withholds
  * write capabilities); writes only target the tip. Historical
  * versions are immutable by the log's construction.
  *
  * Scale shape: every catalog operation is driver metadata — list =
  * one directory listing, load = one (memoized) log replay, create =
  * one conditional-put log line; no data I/O anywhere. */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catName: String = _
  private var defaults: CaseInsensitiveStringMap =
    CaseInsensitiveStringMap.empty()

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catName = name
    defaults = options
  }

  override def name(): String = catName

  private def warehouse: String = {
    val key = s"spark.sql.catalog.$catName.warehouse"
    SparkSession.active.conf.getOption(key)
      .orElse(Option(defaults.get("warehouse")))
      .getOrElse(throw new IllegalArgumentException(
        s"graft catalog `$catName` needs a warehouse: set $key"))
  }

  private def rootFor(ident: Identifier): String =
    (warehouse +: ident.namespace.toSeq :+ ident.name).mkString("/")

  /** The filesystem root an identifier resolves to — the seam the
    * GRAFT DML face uses to accept `catalog.ns.table` identifiers
    * wherever it accepts quoted paths ([[graft.plans.GraftSqlParser
    * .resolveTable]]). `mustExist = false` serves create-like targets
    * (CLONE's destination). */
  def tableRoot(ident: Identifier, mustExist: Boolean = true): String = {
    val root = rootFor(ident)
    if (mustExist && !isTable(root))
      throw new NoSuchTableException(ident)
    root
  }

  private def nsDir(ns: Seq[String]): java.io.File =
    new java.io.File((warehouse +: ns).mkString("/"))

  private def isTable(root: String): Boolean =
    TxnLog.latestVersion(root) >= 1

  // ---- tables ------------------------------------------------------

  override def listTables(namespace: Array[String])
  : Array[Identifier] = {
    val dir = nsDir(namespace.toSeq)
    if (!dir.isDirectory)
      throw new NoSuchNamespaceException(catName +: namespace.toSeq)
    Option(dir.listFiles).toSeq.flatten
      .filter(f => f.isDirectory && isTable(f.getPath)).sortBy(_.getName)
      .map(f => Identifier.of(namespace, f.getName)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(rootFor(ident))

  override def loadTable(ident: Identifier): Table =
    tableAt(ident, None, writable = true)

  /** `VERSION AS OF v` — Spark's native time-travel syntax lands
    * here with the version string. A version BEYOND the tip fails
    * loudly: `stateAt` would silently answer "state at the tip",
    * which the next commit changes — a typo'd version number must
    * not masquerade as immutable history. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft version must be an integer commit number: $version")
    }
    val root = rootFor(ident)
    if (!isTable(root)) throw new NoSuchTableException(ident)
    val tip = TxnLog.latestVersion(root)
    require(v >= 1 && v <= tip,
      s"version $v of ${ident.toString} does not exist " +
        s"(committed versions: 1..$tip)")
    tableAt(ident, Some(v), writable = false)
  }

  /** `TIMESTAMP AS OF ts` — Spark hands MICROseconds since epoch;
    * the log's [[TxnLogOps.versionAsOf]] speaks milliseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootFor(ident)
    if (!isTable(root)) throw new NoSuchTableException(ident)
    // strict: a timestamp before the first commit fails loudly naming
    // the earliest resolvable commit (ADVICE r12 — the version-string
    // overload got a loud range check, the timestamp one did not)
    tableAt(ident, Some(TxnLog.versionAsOfStrict(root, timestamp / 1000L)),
      writable = false)
  }

  private def tableAt(ident: Identifier, vOpt: Option[Int],
                      writable: Boolean): Table = {
    val root = rootFor(ident)
    if (!isTable(root)) throw new NoSuchTableException(ident)
    val v = vOpt.getOrElse(TxnLog.latestVersion(root))
    val schema = TxnLog.schemaAt(root, v).getOrElse(
      TxnLog.read(SparkSession.active, root, v).schema)
    new GraftTxnTable(root, v, schema, writable = writable)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables carry partition tuples PER FILE (the log's " +
        "AddFile metadata, published by partitioned appends) — a " +
        "static PARTITIONED BY spec has no log home; create the " +
        "table unpartitioned")
    val root = rootFor(ident)
    if (isTable(root)) throw new TableAlreadyExistsException(ident)
    new java.io.File(root).mkdirs()
    // v1 = the schema-only birth commit: metaData, zero files — the
    // same contract a first append would publish, just earlier
    TxnLog.commitNext(root, Seq.empty, "catalog",
      schemaDdl = Some(schema.toDDL))
    new GraftTxnTable(root, TxnLog.latestVersion(root), schema,
      writable = true)
  }

  /** Schema surgery by NAME — `ALTER TABLE graft.ns.t ADD COLUMNS /
    * RENAME COLUMN / DROP COLUMN` route to the log's metadata-only
    * verbs (one commit, zero data I/O; rename/drop go through column
    * mapping with tombstoned physical spellings). Anything else
    * (property/comment/type changes) is refused loudly. */
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val root = rootFor(ident)
    if (!isTable(root)) throw new NoSuchTableException(ident)
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          s"nested adds are not supported: ${a.fieldNames.mkString(".")}")
        TxnLog.addColumns(root,
          StructType(Seq(org.apache.spark.sql.types.StructField(
            a.fieldNames.head, a.dataType, a.isNullable))), "catalog")
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          s"nested renames are not supported: ${r.fieldNames.mkString(".")}")
        TxnLog.renameColumn(root, r.fieldNames.head, r.newName,
          "catalog")
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          s"nested drops are not supported: ${d.fieldNames.mkString(".")}")
        TxnLog.dropColumn(root, d.fieldNames.head, "catalog")
      case other => throw new UnsupportedOperationException(
        s"graft catalog cannot apply $other — supported: ADD COLUMNS, " +
          "RENAME COLUMN, DROP COLUMN (constraints/protocol/clone " +
          "live on the GRAFT DML face)")
    }
    loadTable(ident)
  }

  override def invalidateTable(ident: Identifier): Unit =
    TxnLog.invalidateState(rootFor(ident))

  override def dropTable(ident: Identifier): Boolean = {
    val root = rootFor(ident)
    if (!isTable(root)) return false
    graft.core.Fixtures.deleteRecursively(new java.io.File(root))
    // a NEW table created at this root is a new incarnation whose
    // version numbers collide with the dead one's — purge the state
    // memo or its reads would serve the old table's cached states
    TxnLog.invalidateState(root)
    true
  }

  /** Directory move — atomic on a POSIX filesystem. The log's
    * design makes this safe: file attribution, DV keys, and relative
    * ext refs all use root-relative paths, so a moved table keeps
    * its whole state (absolute ext refs — shallow clones across
    * trees — deliberately keep pointing at the source). */
  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit = {
    val src = rootFor(oldIdent)
    val dst = rootFor(newIdent)
    if (!isTable(src)) throw new NoSuchTableException(oldIdent)
    if (isTable(dst)) throw new TableAlreadyExistsException(newIdent)
    new java.io.File(dst).getParentFile.mkdirs()
    java.nio.file.Files.move(java.nio.file.Paths.get(src),
      java.nio.file.Paths.get(dst),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // the vacated root may be re-taken by a new table (new
    // incarnation, colliding version numbers) — purge its memo
    TxnLog.invalidateState(src)
  }

  // ---- namespaces --------------------------------------------------

  override def listNamespaces(): Array[Array[String]] = {
    val wh = new java.io.File(warehouse)
    Option(wh.listFiles).toSeq.flatten
      .filter(f => f.isDirectory && !isTable(f.getPath)).sortBy(_.getName)
      .map(f => Array(f.getName)).toArray
  }

  override def listNamespaces(namespace: Array[String])
  : Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val dir = nsDir(namespace.toSeq)
    if (!dir.isDirectory)
      throw new NoSuchNamespaceException(catName +: namespace.toSeq)
    Option(dir.listFiles).toSeq.flatten
      .filter(f => f.isDirectory && !isTable(f.getPath)).sortBy(_.getName)
      .map(f => namespace :+ f.getName).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (nsDir(namespace.toSeq).isDirectory &&
        !isTable(nsDir(namespace.toSeq).getPath))

  override def loadNamespaceMetadata(namespace: Array[String])
  : JMap[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(catName +: namespace.toSeq)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: JMap[String, String]): Unit = {
    val dir = nsDir(namespace.toSeq)
    if (dir.isDirectory)
      throw new NamespaceAlreadyExistsException(
        (catName +: namespace.toSeq).toArray)
    dir.mkdirs()
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces are directories — nothing to alter")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val dir = nsDir(namespace.toSeq)
    if (!dir.isDirectory) return false
    val nonEmpty = Option(dir.listFiles).exists(_.nonEmpty)
    require(cascade || !nonEmpty,
      s"namespace ${namespace.mkString(".")} is not empty — " +
        "drop its tables first or pass CASCADE")
    graft.core.Fixtures.deleteRecursively(dir)
    // cascade deletes every table under the dir: prefix-purge
    TxnLog.invalidateState(dir.getPath)
    true
  }
}
