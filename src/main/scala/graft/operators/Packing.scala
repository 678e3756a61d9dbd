package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One document's bin assignment from [[Packing.packSequences]]. */
case class PackedDoc(doc_id: Long, bin_id: Long, n_tokens: Int)

/** Sequence packing: assign documents to fixed-token-budget bins — the
  * pretraining context-packing step (fill each training sequence close to
  * the model's context length instead of padding one doc per sequence).
  *
  * Distributed shape: bin assignment is inherently sequential, so the
  * operator shards deterministically (hash of the id), sorts within each
  * shard, and runs a STREAMING first-fit packer per partition via
  * `mapPartitions` — O(openBins) state, one pass, no shuffle beyond the
  * one deterministic repartition. This is the documented `mapPartitions`
  * escalation (SURVEY §7.3): per-partition imperative logic that no
  * relational operator expresses — a window/aggregate cannot carry the
  * "running bin remainder" state.
  *
  * Determinism contract (what makes the output judgeable): shard =
  * hash-partition of `pmod(id, shards)`, order = ascending id within the
  * shard, bins numbered in open order per partition — so the full
  * assignment is a pure function of (ids, token counts, budget, shards),
  * independent of cluster layout or input partitioning (PackingSpec
  * asserts this). Bin ids are globally unique: `partitionId << 32 | seq`.
  *
  * Packing quality: first-fit over a bounded window of `openBins` open
  * bins (classic online bin packing — Johnson '73 first-fit, bounded to
  * constant state; close the oldest when the window is full). Pure next-fit wastes
  * the tail of every bin; unbounded first-fit holds unbounded state; a
  * small window captures most of the fill-factor win (PackingSpec asserts
  * ≥ 0.75 mean fill on mixed sizes) at O(1) memory. Docs larger than the
  * budget get a bin of their own, immediately closed (callers chunk or
  * drop oversize docs upstream — flagged by `n_tokens > budget`).
  */
object Packing {

  def packSequences(docs: DataFrame, idCol: String, tokensCol: String,
      budget: Int, shards: Int = 64, openBins: Int = 8): Dataset[PackedDoc] = {
    require(budget > 0 && shards > 0 && openBins > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(tokensCol).cast("int"))
      .repartition(shards, pmod(col(idCol), lit(shards)))
      .sortWithinPartitions(col(idCol))
      .as[(Long, Int)]
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId().toLong
        var nextSeq = 0L
        // open bins: (binSeq, tokensUsed), newest appended last
        val open = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
        it.map { case (id, nt) =>
          val fit = open.indexWhere { case (_, used) => used + nt <= budget }
          val seq =
            if (nt >= budget) { // oversize or exact fill: own bin, closed
              val s = nextSeq; nextSeq += 1; s
            } else if (fit >= 0) {
              val (s, used) = open(fit)
              open(fit) = (s, used + nt)
              s
            } else {
              val s = nextSeq; nextSeq += 1
              if (open.length == openBins) open.remove(0) // close oldest
              open.append((s, nt))
              s
            }
          PackedDoc(id, (pid << 32) | seq, nt)
        }
      }
  }
}
