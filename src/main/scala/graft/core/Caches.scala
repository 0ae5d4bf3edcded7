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
    * Safe to call between queries — cached frames recompute from lineage
    * if re-used, checkpointed frames are never re-used across queries by
    * construction. */
  def drain(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
