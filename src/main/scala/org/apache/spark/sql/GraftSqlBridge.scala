package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.execution.LogicalRDD

/** Package-scope bridge into the `private[sql]` constructor surface
  * that [[graft.engine.Barriers.cutCounted]] needs: rebuilding a
  * DataFrame over an already-checkpointed InternalRow RDD. The public
  * `createDataFrame(RDD[Row], schema)` would pay an InternalRow -> Row
  * decode per row per downstream action; this keeps the binary rows,
  * exactly like `Dataset.localCheckpoint(eager = true)` does
  * internally — minus its copied-origin-stats (the compounding
  * sizeInBytes problem Barriers documents): the leaf gets HONEST
  * statistics instead, from the row count the materialization job just
  * measured and the schema's fixed width. Mechanics are public
  * knowledge (the Spark source); no behavior of Spark is modified.
  */
object GraftSqlBridge {

  /** Wrap a checkpointed `rdd` (the physical rows of `df`, already
    * materialized) as a DataFrame with `rowCount` recorded in the leaf
    * stats. Output attributes are `df`'s analyzed output — attribute
    * ids are preserved, matching Dataset.checkpoint semantics. */
  def fromCheckpointedRdd(df: DataFrame, rdd: RDD[InternalRow],
      rowCount: Long): DataFrame = {
    val session = df.sparkSession.asInstanceOf[classic.SparkSession]
    val rowWidth = df.schema.map(_.dataType.defaultSize).sum + 8
    val stats = Statistics(
      sizeInBytes = BigInt(math.max(rowCount, 1L)) * rowWidth,
      rowCount = Some(BigInt(math.max(rowCount, 0L))))
    val plan = LogicalRDD(df.queryExecution.analyzed.output, rdd)(
      session, Some(stats))
    classic.Dataset.ofRows(session, plan)
  }
}
