package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-memory frequency sketching — the "what are the hot values"
  * primitive a 100 TB pipeline needs where an exact global
  * `GROUP BY value` would shuffle billions of distinct keys to answer a
  * question about the top handful (vocabulary pruning, hot-key detection
  * for [[Relational.skewSaltedJoin]], boilerplate-token discovery).
  *
  * Shape: the classic two-pass exact-above-threshold heavy hitters —
  *  1. one scan through a MERGEABLE Misra-Gries summary (Misra & Gries,
  *     "Finding repeated elements", Sci. Comput. Program. 1982; merge rule
  *     per Agarwal et al., "Mergeable Summaries", PODS 2012). Each task
  *     folds its partition into a ≤ k-counter buffer; buffers merge
  *     pairwise; any value with true count > N/(k+1) is GUARANTEED to
  *     survive (no false negatives), so the summary is a superset of every
  *     value at or above the support threshold when k ≥ 1/support.
  *  2. one filtered exact count over only the ≤ k candidates (the filter
  *     is a broadcast-able `isInCollection` that pushes to the scan), then
  *     `HAVING n ≥ threshold` drops the sketch's false positives.
  *
  * The final answer is therefore EXACT — sketch error only ever widens the
  * candidate set — which is what makes `q_heavy_hitters` fully
  * DuckDB-oracle-able even though pass 1 is approximate. At 100 TB: pass 1
  * moves k counters per task (KBs), pass 2 aggregates only rows matching
  * ≤ k values; neither materializes the full distinct-key space.
  *
  * Reference scope: the reference (etl.py) has no sketching surface; this
  * is part of the SURVEY §7 LLM-pipeline extension.
  */
object Sketches {

  /** Misra-Gries summary as a typed [[Aggregator]]: buffer = at most `k`
    * (value → lower-bound count) counters.
    *
    *  - reduce: present → +1; room → insert at 1; full → decrement all
    *    (the MG step), dropping zeros. Amortized O(1): each decrement-all
    *    pays for k prior inserts.
    *  - merge: counter-wise sum, then if > k counters survive, subtract
    *    the (k+1)-th largest count from all and drop the non-positive
    *    (Agarwal et al. 2012 — keeps the ≤ N/(k+1) undercount bound).
    *  - finish: candidate values, sorted for determinism.
    */
  class MisraGries(k: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Array[String]] {
    require(k >= 1, s"summary size must be >= 1, got $k")

    def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    def reduce(b: mutable.HashMap[String, Long], a: String): mutable.HashMap[String, Long] = {
      b.get(a) match {
        case Some(n) => b.update(a, n + 1)
        case None if b.size < k => b.update(a, 1L)
        case None =>
          val dead = List.newBuilder[String]
          b.mapValuesInPlace((_, n) => n - 1).foreach { case (v, n) => if (n <= 0) dead += v }
          dead.result().foreach(b.remove)
      }
      b
    }

    def merge(b1: mutable.HashMap[String, Long],
        b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      b2.foreach { case (v, n) => b1.update(v, b1.getOrElse(v, 0L) + n) }
      if (b1.size > k) {
        // (k+1)-th largest count = the amount to shed so ≤ k survive.
        val cut = b1.values.toArray.sortInPlace()(Ordering[Long].reverse).apply(k)
        val dead = List.newBuilder[String]
        b1.mapValuesInPlace((_, n) => n - cut).foreach { case (v, n) => if (n <= 0) dead += v }
        dead.result().foreach(b1.remove)
      }
      b1
    }

    def finish(b: mutable.HashMap[String, Long]): Array[String] = b.keys.toArray.sorted

    // One buffer per task partial, so serialization is per-exchange-row,
    // not per-input-row — kryo on the mutable map is fine here.
    def bufferEncoder: Encoder[mutable.HashMap[String, Long]] = Encoders.kryo
    def outputEncoder: Encoder[Array[String]] = ExpressionEncoder()
  }

  /** Exact heavy hitters: all values of `valueCol` whose count `n`
    * satisfies `n * denom >= N` (i.e. frequency ≥ 1/denom of the N total
    * rows — integer arithmetic so the oracle reproduces it bit-for-bit).
    * Sketch size `k` must be ≥ denom for the no-false-negative guarantee;
    * defaults to 2× for slack. Output: (value, n), n descending. */
  def heavyHitters(df: DataFrame, valueCol: String, denom: Long,
      k: Int = 0): DataFrame = {
    val kk = if (k > 0) k else (2 * denom).toInt
    require(kk >= denom, s"sketch size $kk cannot guarantee support 1/$denom")
    val mg = udaf(new MisraGries(kk), Encoders.STRING)
    val fst = df.agg(count(lit(1)).as("n_total"), mg(col(valueCol)).as("cand")).head()
    val total = fst.getLong(0)
    val candidates = fst.getSeq[String](1)
    df.filter(col(valueCol).isInCollection(candidates))
      .groupBy(valueCol)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") * denom >= total)
      .orderBy(desc("n"), col(valueCol))
  }
}
