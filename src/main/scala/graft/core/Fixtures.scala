package graft.core

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Staged-fixture lifecycle: some queries read a rewritten copy of a
  * source table (partitioned, bucketed, JSON/CSV, cluster labels) that
  * is expensive to produce, so it is written once to a deterministic
  * tmp path and reused — within a session via the caller's memo map and
  * across JVM runs via an on-disk marker.
  *
  * ADVICE r3: keying that path by 32-bit `String.hashCode` let two
  * distinct source dirs collide, and a bare `_SUCCESS` marker let a
  * REGENERATED source dir silently reuse the stale fixture — the query
  * then read old data while the oracle read the current table. Fixed
  * here: the path key is the md5 of the absolute source path
  * (collision-resistant), and the marker records a fingerprint of the
  * source files ((path, length, mtime) per file) so a changed source
  * re-stages.
  */
object Fixtures {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8)).map("%02x".format(_)).mkString

  /** Collision-resistant tag for a source path: md5 hex of its absolute
    * form. Safe for tmp-dir names and catalog table names. */
  def pathTag(path: String): String = md5Hex(new File(path).getAbsolutePath)

  /** Digest of the source's file census — (absolute path, length,
    * mtime) per regular file, sorted — so any regeneration (new files,
    * rewritten bytes, touched timestamps) changes the fingerprint. */
  def sourceFingerprint(path: String): String = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    md5Hex(walk(new File(path))
      .map(f => s"${f.getAbsolutePath}|${f.length}|${f.lastModified}")
      .mkString("\n"))
  }

  /** Stage a fixture at `tmpdir/graft_<kind>_<pathTag(source)>` once
    * per source CONTENT: reused while the marker matches the source
    * fingerprint, re-written when the source changed or the fixture is
    * absent/partial. The marker name starts with '_' so Spark file
    * sources ignore it as metadata.
    *
    * `codeTag`: extra salt folded into the marker for fixtures whose
    * CONTENT also depends on code constants (a split boundary, a
    * layout shape) — encode those constants here so a code change
    * re-stages instead of silently reusing a stale copy whose source
    * fingerprint still matches. The target dir is deleted before the
    * callback runs, so multi-directory fixtures never mix batches
    * from different stagings. */
  def staged(sourcePath: String, kind: String, codeTag: String = "")
            (write: String => Unit): String = {
    val target = new File(sys.props("java.io.tmpdir"),
      s"graft_${kind}_" + pathTag(sourcePath)).toString
    val marker = new File(target, "_GRAFT_SRC")
    val fp = sourceFingerprint(sourcePath) + "|" + codeTag
    val fresh = marker.exists() &&
      new String(Files.readAllBytes(marker.toPath), StandardCharsets.UTF_8) == fp
    if (!fresh) {
      def rm(f: File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete()
      }
      rm(new File(target))
      write(target)
      Files.write(marker.toPath, fp.getBytes(StandardCharsets.UTF_8))
    }
    target
  }
}
