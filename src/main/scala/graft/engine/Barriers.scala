package graft.engine

import org.apache.spark.sql.DataFrame

/** The per-round materialization barrier for iterative operators
  * (connected components, PageRank, BFS, the skew-profile fan-out).
  *
  * Two jobs in one call: (1) EAGER materialization — round N's plan must
  * not embed round N−1's plan, or the tree grows exponentially (repo
  * rule; r5's q_cc_labels OOM'd explainString that way); (2) lineage
  * durability, where the two modes differ:
  *
  *  - `localCheckpoint(eager = true)` (the default): blocks are
  *    EXECUTOR-RESIDENT. Fastest, and correct on a healthy cluster — but
  *    a lost executor loses blocks whose lineage was just truncated, and
  *    the job dies. The right trade in local mode and short jobs.
  *  - `checkpoint(eager = true)`: blocks go to the RELIABLE checkpoint
  *    directory (`spark.sparkContext.setCheckpointDir`, typically
  *    HDFS/object storage on a real cluster). Survives executor churn —
  *    the production posture for long iterative jobs at 100 TB, paying
  *    one distributed-FS write per round of (long,long)-scale state.
  *
  * The mode is picked off the session: callers opt in to reliability by
  * configuring a checkpoint dir (one line at bootstrap), and every
  * iterative operator in the library follows without per-operator flags.
  * Results are identical either way (asserted in BarriersSpec) — only
  * failure-recovery semantics change.
  */
object Barriers {

  /** Materialize `df` eagerly and cut its lineage, reliably iff the
    * session has a checkpoint directory configured. */
  def cut(df: DataFrame): DataFrame = {
    val c = if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      // checkpoint(eager) runs TWO jobs — the eager count, then the
      // checkpoint-file write — and on an unpersisted plan the second
      // re-executes the full lineage, doubling every round of an
      // iterative operator. Cache for the duration so the plan runs
      // once; release right after (the checkpoint files are now the
      // source of truth).
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try df.checkpoint(eager = true)
      finally df.unpersist(blocking = false)
    } else df.localCheckpoint(eager = true)
    // Checkpointing copies the ORIGINAL plan's sizeInBytes onto the new
    // leaf, and the size-only stats visitor takes the PRODUCT of child
    // sizes at every inner/outer join — so a cut→join→cut iteration
    // compounds sizeInBytes multiplicatively across rounds. The BigInt
    // stays semantically harmless (anything huge reads "don't
    // broadcast") but its DIGIT COUNT grows geometrically, and after
    // enough rounds the next cut's eager stats pass hangs for minutes
    // inside BigInteger.multiply (hit by the SCC trim loop, r15).
    // Rebuilding the frame over the already-materialized RDD resets the
    // leaf to the honest default size; only frames past the absurdity
    // bar (2^127 bytes) pay the Row round-trip.
    if (c.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength <= 127) c
    else df.sparkSession.createDataFrame(c.rdd, c.schema)
  }

  /** Postfix form: `plan.barrierCut` reads like the
    * `.localCheckpoint(true)` it replaces. */
  implicit class BarrierOps(private val df: DataFrame) extends AnyVal {
    def barrierCut: DataFrame = cut(df)
  }
}
