package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal transaction-log table format (the Delta/Iceberg core idea,
  * reduced to its mechanics): data files are immutable parquet dirs
  * under the table root, and `_log/` holds one JSONL file PER VERSION
  * (`v00000001.jsonl`, …) whose lines are `{"action":"add"|"remove",
  * "file":"<name>"}`. A reader resolves any version's live file set
  * from the log alone — no listing of data files, which is what makes
  * version resolution metadata-sized at 100 TB.
  *
  * Commit protocol — the compactor's optimistic M8/M9 pair (reference
  * `DefragmentAvroFolder.scala:276,301-318`: snapshot → check →
  * rename-commit, abort on interference) re-expressed for a log:
  *
  *  - a writer resolves the next version slot `v = latest + 1`, writes
  *    its actions COMPLETELY to a session-named tmp file, then claims
  *    the slot with an atomic create-if-absent link
  *    ([[java.nio.file.Files.createLink]] — the filesystem is the
  *    arbiter, exactly like the compactor's rename gate). Of two
  *    writers racing for v3, exactly one link succeeds; the loser sees
  *    `FileAlreadyExistsException`, deletes its tmp, and either aborts
  *    (M8's "don't retry blindly" posture — its intended base version
  *    is stale) or re-resolves against the NEW latest and retries with
  *    re-validated actions ([[commitNext]], for writers whose actions
  *    are base-independent, e.g. blind appends).
  *  - readers never lock: a version file is visible only after its
  *    content is complete (the link publishes whole bytes), so any
  *    version a reader can list is safe to replay.
  *
  * [[compact]] is the reference's defrag semantics expressed in the
  * table format: rewrite the current live set into one file, then
  * commit the add/remove swap optimistically — if any writer committed
  * meanwhile, the compaction ABORTS and deletes its output (the
  * source-changed gate, M8), because its rewrite no longer covers the
  * table's tip.
  */
object TxnLog {

  /** One log action. `add` publishes a data dir name; `remove` retires
    * one (the bytes stay for time travel — vacuuming is a separate
    * lifecycle, as in every table format). */
  final case class Action(action: String, file: String) {
    def toJson: String = s"""{"action":"$action","file":"$file"}"""
  }

  def add(file: String): Action = Action("add", file)
  def remove(file: String): Action = Action("remove", file)

  private def logDir(root: String): File = new File(root, "_log")

  private def versionFile(root: String, v: Int): File =
    new File(logDir(root), f"v$v%08d.jsonl")

  private val VersionName = "^v(\\d{8})\\.jsonl$".r

  /** Committed versions, ascending; empty for a fresh table. */
  def versions(root: String): Seq[Int] =
    Option(logDir(root).listFiles()).toSeq.flatten
      .flatMap(f => VersionName.findFirstMatchIn(f.getName)
        .map(_.group(1).toInt))
      .sorted

  def latestVersion(root: String): Int =
    versions(root).lastOption.getOrElse(0)

  /** Replay the log up to `v` as an ORDERED fold (version order, line
    * order within a version), sorted. Order matters: `adds-set minus
    * removes-set` over the whole prefix would leave a file dead
    * forever once removed, even if a later commit re-adds it — the
    * MaintenanceSpec replay property caught exactly that. */
  def liveFiles(root: String, v: Int): Seq[String] =
    versions(root).filter(_ <= v).flatMap(actionsAt(root, _))
      .foldLeft(Set.empty[String]) {
        case (s, Action("add", f)) => s + f
        case (s, Action("remove", f)) => s - f
        case (s, _) => s
      }.toSeq.sorted

  /** Parse one log line without a JSON library: the writer emits the
    * exact 2-field shape [[Action.toJson]] prints, so a pinned regex
    * is total over well-formed logs and fails loudly otherwise. */
  private val LineRe =
    """\{"action":"(add|remove)","file":"([^"]+)"\}""".r
  private def parseLine(s: String): Action = s.trim match {
    case LineRe(a, f) => Action(a, f)
    case other => throw new IllegalArgumentException(s"bad log line: $other")
  }

  /** Try to commit `actions` as exactly version `v`. Returns true iff
    * this writer won the slot — atomic create-if-absent via hard link,
    * so two racers on the same `v` see exactly one true. The tmp file
    * is session-named (M10 parity) and always cleaned up. */
  def tryCommit(root: String, v: Int, actions: Seq[Action],
                session: String): Boolean = {
    require(actions.nonEmpty, "empty commit")
    val dir = logDir(root)
    dir.mkdirs()
    val tmp = new File(dir, s".tmp_${session}_${java.util.UUID.randomUUID()}")
    Files.write(tmp.toPath,
      actions.map(_.toJson).mkString("", "\n", "\n")
        .getBytes(StandardCharsets.UTF_8))
    try {
      Files.createLink(versionFile(root, v).toPath, tmp.toPath)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally {
      Files.deleteIfExists(tmp.toPath)
      ()
    }
  }

  /** Commit `actions` at the next free version, re-resolving on a
    * lost race — for BASE-INDEPENDENT commits (blind appends), where
    * losing only means someone else took the slot number. Version-
    * dependent writers (compaction, any read-modify-write) must NOT
    * use this: they go through [[tryCommit]] and abort on loss, like
    * [[compact]] does. Returns the committed version. */
  def commitNext(root: String, actions: Seq[Action], session: String,
                 maxAttempts: Int = 10): Int = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val v = latestVersion(root) + 1
      if (tryCommit(root, v, actions, session)) return v
      attempt += 1
    }
    throw new IllegalStateException(
      s"could not commit after $maxAttempts attempts (writer storm?)")
  }

  /** OPTIMIZE: rewrite the tip's live set into ONE parquet dir and
    * commit the swap (remove every live file, add the rewrite) as the
    * next version. Optimistic, single-attempt: the base version is
    * snapshotted before the (expensive) rewrite, and if any writer
    * claimed the slot meanwhile the commit loses the link race, the
    * rewrite is deleted, and None is returned — the compactor's
    * source-changed abort (M8), because a rewrite of version v does
    * not cover version v+1's content. `beforeCommit` is the test seam
    * between rewrite and commit (the [[graft.compact.Compactor]]
    * discipline). Returns the committed version when it wins. */
  def compact(spark: SparkSession, root: String, session: String,
              beforeCommit: () => Unit = () => ()): Option[Int] = {
    val base = latestVersion(root)
    val live = liveFiles(root, base)
    require(live.nonEmpty, "nothing to compact")
    // session-scoped rewrite name: two concurrent compactors write
    // disjoint dirs — the version slot link, not the data path, is
    // the arbiter of which rewrite becomes real. Overwrite mode: the
    // only thing that can already sit at this (version, session) path
    // is the SAME session's crashed earlier attempt (a committed one
    // would have advanced the version), so replacing it is the retry
    // semantics a crash demands — mode("error") left such orphans
    // blocking every retry (r8 self-review).
    val outName = f"c${base + 1}%08d" + s"_$session"
    val out = new File(root, outName)
    live.map(f => spark.read.parquet(s"$root/$f"))
      .reduce(_ unionAll _)
      .coalesce(1)
      .write.mode("overwrite").parquet(out.toString)
    beforeCommit()
    val actions = live.map(remove) :+ add(outName)
    if (tryCommit(root, base + 1, actions, session)) Some(base + 1)
    else { // lost the race — the rewrite no longer covers the tip
      graft.core.Fixtures.deleteRecursively(out)
      None
    }
  }

  /** Per-version actions, replayed from the log (metadata). */
  def actionsAt(root: String, v: Int): Seq[Action] =
    Files.readAllLines(versionFile(root, v).toPath).toArray
      .map(_.toString).filter(_.nonEmpty).map(parseLine).toSeq

  /** VACUUM: delete the data of files no longer live at the tip —
    * every table format's storage-reclaim lifecycle, and the explicit
    * END of those files' time-travel window (a version whose live set
    * referenced a vacuumed file stops being readable; the log itself
    * is never touched, so history METADATA survives). Returns the
    * deleted file names, sorted. Deletion is idempotent, and safe
    * against concurrent appends UNDER THE NAME-UNIQUENESS CONVENTION
    * every writer here follows (each add publishes a fresh dir —
    * data slices are named at creation, compaction rewrites are
    * (version, session)-scoped): a fresh-named add can never collide
    * with the delete set. The log PROTOCOL itself would admit
    * re-adding a retired name (replay is an ordered fold precisely so
    * re-add resolves correctly), and such a writer races this delete
    * exactly as re-referencing a vacuumed file races Delta's VACUUM —
    * if a deployment wants protocol-level re-adds, vacuum needs a
    * retention window, not this method. */
  def vacuum(root: String): Seq[String] = {
    val tip = liveFiles(root, latestVersion(root)).toSet
    val everAdded = versions(root)
      .flatMap(actionsAt(root, _))
      .collect { case Action("add", f) => f }.toSet
    val gone = (everAdded -- tip).toSeq.sorted
      .filter(f => new File(root, f).isDirectory)
    gone.foreach(f => graft.core.Fixtures.deleteRecursively(new File(root, f)))
    gone
  }

  /** Per-version rollup — the time-travel audit both txn-log queries
    * emit: for every committed version, (version, n_files, n_rows,
    * exact-cents sum over `valueCol`). Version resolution is pure
    * log replay (metadata); each version's data read scans only its
    * live parquet. A version whose live set is EMPTY (legal: a
    * remove-only commit can drain the table) rolls up as an explicit
    * zero row — `reduce` over the empty scan list would throw. */
  def versionsRollup(spark: SparkSession, root: String,
                     valueCol: String): org.apache.spark.sql.DataFrame =
    versions(root).map { v =>
      val live = liveFiles(root, v)
      val agg =
        if (live.isEmpty)
          spark.range(1).select(lit(0L).as("n_rows"),
            lit(0L).as("sum_cents"))
        else live.map(f => spark.read.parquet(s"$root/$f"))
          .reduce(_ unionAll _)
          .agg(count(lit(1)).as("n_rows"),
            sum(graft.core.Det.cents(col(valueCol))).as("sum_cents"))
      agg.select(lit(v).as("version"), lit(live.size).as("n_files"),
        col("n_rows"), col("sum_cents"))
    }.reduce(_ unionAll _).orderBy(col("version"))
}
