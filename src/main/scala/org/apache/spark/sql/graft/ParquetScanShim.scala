package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The ONE internal touch the graft-txn V2 DataSource needs on
  * Spark's parquet scan builder, isolated here like
  * [[StreamingShim]]: `FileScanBuilder.pushedDataFilters` is
  * `protected`, reachable only from a subclass — this subclass
  * exposes a single method that hands the already-translated source
  * filters to the parquet scan for row-group/page skipping. Nothing
  * else of the builder is altered; `build()` stays Spark's own. */
class PushableParquetScanBuilder(
    sparkSession: SparkSession,
    fileIndex: PartitioningAwareFileIndex,
    schema: StructType,
    dataSchema: StructType,
    options: CaseInsensitiveStringMap)
  extends ParquetScanBuilder(sparkSession, fileIndex, schema,
    dataSchema, options) {

  /** Push `fs` down to the parquet reader (row-group skipping);
    * returns the subset the reader accepted. The caller keeps every
    * filter residual regardless — this is an I/O optimization, never
    * a semantics change. */
  def pushSourceFilters(fs: Array[Filter]): Array[Filter] = {
    pushedDataFilters = pushDataFilters(fs)
    pushedDataFilters
  }
}
