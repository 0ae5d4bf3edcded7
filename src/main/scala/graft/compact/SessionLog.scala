package graft.compact

import java.time.Instant

import scala.collection.mutable.ListBuffer

/** Thread-tagged in-memory structured logger — rebuild of the
  * reference's CustomLogger (CustomLogger.scala:13-73): synchronized
  * append, per-category records, error gate, and a sorted TSV dump
  * written next to the compaction target as the audit trail
  * (DefragmentAvroFolder.scala:414-417). */
final class SessionLog {
  final case class Record(
      category: String, // INFO | ERROR | FINALLY
      context: String,  // partition path or "" for root
      thread: String,
      at: Instant,
      message: String) {
    def tsv: String =
      s"$category\t$context\t$thread\t$at\t${message.replace('\t', ' ').replace('\n', ' ')}"
  }

  private val records = ListBuffer[Record]()

  private def add(cat: String, ctx: String, msg: String): Unit = synchronized {
    records += Record(cat, ctx, Thread.currentThread().getName, Instant.now(), msg)
  }

  def info(ctx: String, msg: String): Unit = add("INFO", ctx, msg)
  def error(ctx: String, msg: String): Unit = add("ERROR", ctx, msg)
  def finallyRecord(msg: String): Unit = add("FINALLY", "", msg)

  /** Any error anywhere suppresses tmp cleanup and overall success
    * (reference: CustomLogger.scala:66-71,
    * DefragmentAvroFolder.scala:400-408). */
  def containsError: Boolean = synchronized { records.exists(_.category == "ERROR") }

  def all: List[Record] = synchronized { records.toList }

  /** Sorted header→context→thread→time, like the reference's dump
    * (CustomLogger.scala:39-49). */
  def toTsv: String = {
    val sorted = synchronized {
      records.toList.sortBy(r => (r.context, r.thread, r.at))
    }
    ("category\tcontext\tthread\tat\tmessage" :: sorted.map(_.tsv)).mkString("\n")
  }
}
