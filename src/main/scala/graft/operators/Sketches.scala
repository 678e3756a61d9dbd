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

  /** Sharded mergeable distinct-count sketches — the incremental /
    * partitioned form of `approx_count_distinct`, which computes a
    * one-shot estimate but never exposes reusable state. Here each
    * (group, shard) cell — shard = ingest day, partition, source — gets
    * one Apache DataSketches HLL sketch (Spark's `hll_sketch_agg`,
    * public since 3.5) as a BINARY column that can be written to
    * parquet alongside the shard. The 100 TB point is
    * [[mergedDistinctEstimates]]: a distinct-users-per-group refresh
    * touches ONLY new shards' raw rows, then unions kilobyte sketches —
    * the same append-only refresh shape as
    * [[Relational.incrementalAgg]], extended to the one aggregate that
    * is NOT algebraic over partial counts.
    *
    * Accuracy contract (what `q_hll_merge` judges): the merged estimate
    * sits within the configured rsd band of exact. NOT contracted:
    * bit-equality with a one-shot global sketch — DataSketches HLL is
    * exact (coupon list/set) below ~2^(lgk−3) distinct keys, where
    * union IS value-identical to one-shot, but once partials promote to
    * dense HLL the promotion ORDER shifts estimates a few parts per
    * thousand between merge trees (measured: 797 vs 787 on 800 keys at
    * lgk=12 — both within rsd of exact; SketchesSpec pins both regimes).
    * Resharding therefore moves the estimate within the band, never
    * outside it. */
  def distinctSketches(df: DataFrame, groupCol: String, shard: org.apache.spark.sql.Column,
      keyCol: String, lgk: Int = 12): DataFrame =
    df.groupBy(col(groupCol), shard.as("shard"))
      .agg(hll_sketch_agg(col(keyCol), lit(lgk)).as("sketch"))

  /** Collapse [[distinctSketches]] state to per-group estimates:
    * `hll_union_agg` over the shard sketches (same lgConfigK — the
    * strict mode; heterogeneous precisions downgrade silently and are
    * refused), then one estimate per group. */
  def mergedDistinctEstimates(sketches: DataFrame, groupCol: String): DataFrame =
    sketches.groupBy(col(groupCol))
      .agg(hll_sketch_estimate(
        hll_union_agg(col("sketch"), lit(false))).as("n_approx"))

  /** Mergeable quantile sketches (Apache DataSketches KLL, on Spark's
    * own classpath) — the quantile member of the persistable-state
    * family next to [[distinctSketches]]: one sketch per INPUT PARTITION
    * via `mapPartitions` (the one legitimate imperative-per-partition
    * shape: a sketch updates in place per row with ZERO per-row
    * serialization, and only the finished ~KB sketch crosses the wire),
    * emitted as binary rows a shard can persist alongside its data.
    * `approx_percentile` answers the same question one-shot but never
    * exposes reusable state; these bytes re-merge across days/shards
    * like the HLL sketches do.
    *
    * KLL compaction flips random coins, so VALUES are run-dependent
    * within the guarantee — judge the normalized-rank-error CONTRACT
    * (`q_kll_quantiles`, the q_approx_quantile_bound shape), never raw
    * quantiles. */
  def quantileSketchShards(df: DataFrame, valueCol: String, k: Int = 200): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(valueCol).cast("double")).as[Double]
      .mapPartitions { it =>
        val sk = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k)
        it.foreach(sk.update)
        if (sk.isEmpty) Iterator.empty else Iterator(sk.toByteArray)
      }.toDF("sketch")
  }

  /** Merge [[quantileSketchShards]] state and evaluate quantiles at the
    * given ranks. The shard rows are collected — bounded config state:
    * numPartitions × ~KB — merged on the driver, and returned as one
    * (rank, value) row per requested rank, plus the merged sketch's
    * normalized rank error ε (two-sided, 99% confidence): the exact rank
    * of each returned value is guaranteed within ±ε·n. */
  def mergedQuantiles(shards: DataFrame, ranks: Seq[Double]): DataFrame = {
    require(ranks.nonEmpty && ranks.forall(r => r >= 0 && r <= 1),
      s"ranks must be in [0, 1]: $ranks")
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    val spark = shards.sparkSession
    import spark.implicits._
    val parts = shards.select(col("sketch").cast("binary")).as[Array[Byte]].collect()
    require(parts.nonEmpty, "mergedQuantiles: no sketches (empty input?)")
    val merged = parts.map(b => KllDoublesSketch.heapify(Memory.wrap(b)))
      .reduceLeft { (a, b) => a.merge(b); a }
    val eps = merged.getNormalizedRankError(false)
    ranks.map(r => (r, merged.getQuantile(r), eps))
      .toDF("rank", "value", "rank_error")
  }

  /** Grouped [[quantileSketchShards]] — per-(group, partition) KLL
    * state, the production shape for per-segment percentiles (latency
    * by endpoint, doc length by source): each task folds its rows into
    * one in-place sketch PER GROUP seen in the partition (bounded by
    * groups-per-partition, each ~KB), so raw values still never cross
    * the wire. Pair with [[mergedGroupQuantiles]]; shard rows persist
    * and re-merge per group exactly like the ungrouped family. */
  def groupedQuantileSketchShards(df: DataFrame, groupCol: String,
      valueCol: String, k: Int = 200): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(groupCol).cast("string"), col(valueCol).cast("double"))
      .as[(String, Double)]
      .mapPartitions { it =>
        val m = mutable.HashMap.empty[String, org.apache.datasketches.kll.KllDoublesSketch]
        it.foreach { case (g, v) =>
          m.getOrElseUpdate(g,
            org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k))
            .update(v)
        }
        m.iterator.map { case (g, sk) => (g, sk.toByteArray) }
      }.toDF(groupCol, "sketch")
  }

  /** Merge [[groupedQuantileSketchShards]] state per group and evaluate
    * the given ranks: one (group, rank, value, rank_error) row per
    * (group, rank). Merging runs DISTRIBUTED — shard rows shuffle by
    * group (≤ shards×groups kilobyte rows, never raw values) and each
    * group's sketches fold in one task. */
  def mergedGroupQuantiles(shards: DataFrame, groupCol: String,
      ranks: Seq[Double]): DataFrame = {
    require(ranks.nonEmpty && ranks.forall(r => r >= 0 && r <= 1),
      s"ranks must be in [0, 1]: $ranks")
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    val spark = shards.sparkSession
    import spark.implicits._
    shards.select(col(groupCol).cast("string"), col("sketch").cast("binary"))
      .as[(String, Array[Byte])]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val merged = it.map(r => KllDoublesSketch.heapify(Memory.wrap(r._2)))
          .reduceLeft { (a, b) => a.merge(b); a }
        val eps = merged.getNormalizedRankError(false)
        ranks.iterator.map(r => (g, r, merged.getQuantile(r), eps))
      }.toDF(groupCol, "rank", "value", "rank_error")
  }

  /** Mergeable frequent-items sketch state (Apache DataSketches
    * `ItemsSketch` — the space-saving/Misra-Gries family with a
    * serialized, mergeable form): ONE sketch per input partition via
    * `mapPartitions`, the [[quantileSketchShards]] shape — in-place
    * update per row, ≤ `maxMapSize` counters each, only finished ~KB
    * sketches cross the wire. Completes the persistable-sketch trio
    * (HLL distinct / KLL quantiles / FI heavy hitters): a corpus
    * refresh appends the new shard's sketch instead of recounting the
    * key space, and [[heavyHitters]]'s exact second pass stays
    * available when the answer must be exact. */
  def frequencySketchShards(df: DataFrame, valueCol: String,
      maxMapSize: Int = 64): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(valueCol).cast("string")).as[String]
      .mapPartitions { it =>
        // serde built inside the task: it is not Serializable
        val serde = new org.apache.datasketches.common.ArrayOfStringsSerDe()
        val sk = new org.apache.datasketches.frequencies.ItemsSketch[String](maxMapSize)
        it.foreach(sk.update)
        if (sk.isEmpty) Iterator.empty
        else Iterator(sk.toByteArray(serde))
      }.toDF("sketch")
  }

  /** Merge [[frequencySketchShards]] state and report every item whose
    * UPPER-bound count clears `n_total / denom` — the NO-FALSE-NEGATIVES
    * read: an item with true frequency ≥ 1/denom is GUARANTEED present
    * (upper ≥ true count always), and every returned (lb, ub) pair is a
    * deterministic bracket of the item's true count — the sketch's
    * hard guarantee, not a probabilistic band, which is what makes the
    * accuracy contract driver-judgeable (`q_heavy_sketch`). Shard rows
    * are collected — bounded config state, numPartitions × ~KB. */
  def mergedHeavyHitters(shards: DataFrame, denom: Long): DataFrame = {
    require(denom > 0, "support denominator must be positive")
    import org.apache.datasketches.frequencies.{ItemsSketch, ErrorType}
    import org.apache.datasketches.memory.Memory
    val spark = shards.sparkSession
    import spark.implicits._
    val serde = new org.apache.datasketches.common.ArrayOfStringsSerDe()
    val parts = shards.select(col("sketch").cast("binary")).as[Array[Byte]].collect()
    // an empty stream's heavy-hitter set is legitimately empty — the
    // df.stat.bloomFilter empty-input footgun class, handled not thrown
    if (parts.isEmpty)
      return Seq.empty[(String, Long, Long, Long)].toDF("value", "est", "lb", "ub")
    val merged = parts
      .map(b => ItemsSketch.getInstance(Memory.wrap(b), serde))
      .reduceLeft { (a, b) => a.merge(b) }
    val n = merged.getStreamLength
    val threshold = (n + denom - 1) / denom // ceil(n/denom): true count >= it qualifies
    merged.getFrequentItems(threshold, ErrorType.NO_FALSE_NEGATIVES)
      .iterator.map(r =>
        (r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
      .toSeq.toDF("value", "est", "lb", "ub")
  }

  /** Grouped [[frequencySketchShards]] — one FI sketch per (group,
    * partition), the [[groupedQuantileSketchShards]] shape: per-source
    * hot tokens, per-domain hot URLs, per-tenant hot keys, with raw
    * values never crossing the wire. Pair with
    * [[mergedGroupHeavyHitters]]. */
  def groupedFrequencySketchShards(df: DataFrame, groupCol: String,
      valueCol: String, maxMapSize: Int = 64): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(groupCol).cast("string"), col(valueCol).cast("string"))
      .as[(String, String)]
      .mapPartitions { it =>
        val serde = new org.apache.datasketches.common.ArrayOfStringsSerDe()
        val m = mutable.HashMap
          .empty[String, org.apache.datasketches.frequencies.ItemsSketch[String]]
        it.foreach { case (g, v) =>
          m.getOrElseUpdate(g,
            new org.apache.datasketches.frequencies.ItemsSketch[String](maxMapSize))
            .update(v)
        }
        m.iterator.map { case (g, sk) => (g, sk.toByteArray(serde)) }
      }.toDF(groupCol, "sketch")
  }

  /** Merge [[groupedFrequencySketchShards]] per group and report each
    * group's items clearing `n_group / denom` under NO-FALSE-NEGATIVES
    * (the [[mergedHeavyHitters]] read, per group). Merging runs
    * DISTRIBUTED — shard rows shuffle by group as kilobyte rows and
    * each group folds in one task ([[mergedGroupQuantiles]] economics). */
  def mergedGroupHeavyHitters(shards: DataFrame, groupCol: String,
      denom: Long): DataFrame = {
    require(denom > 0, "support denominator must be positive")
    import org.apache.datasketches.frequencies.{ItemsSketch, ErrorType}
    import org.apache.datasketches.memory.Memory
    val spark = shards.sparkSession
    import spark.implicits._
    shards.select(col(groupCol).cast("string"), col("sketch").cast("binary"))
      .as[(String, Array[Byte])]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val serde = new org.apache.datasketches.common.ArrayOfStringsSerDe()
        val merged = it.map(r => ItemsSketch.getInstance(Memory.wrap(r._2), serde))
          .reduceLeft { (a, b) => a.merge(b) }
        val threshold = (merged.getStreamLength + denom - 1) / denom
        merged.getFrequentItems(threshold, ErrorType.NO_FALSE_NEGATIVES)
          .iterator.map(r =>
            (g, r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
      }.toDF(groupCol, "value", "est", "lb", "ub")
  }

  /** Pairwise segment overlap — "how many distinct keys do segments A
    * and B share" for every segment pair, computed entirely on
    * [[distinctSketches]]-style HLL state: one sketch per segment, then
    * inclusion–exclusion `|A∩B| = |A| + |B| − |A∪B|` with `hll_union`
    * on the PAIRED sketches. The raw (segment, key) rows cross exactly
    * one partial-aggregated exchange to build the sketch table; the
    * pair join runs on |segments| kilobyte rows — at 100 TB the
    * audience-overlap matrix never touches raw ids again (the exact
    * alternative is a distinct self-join that re-shuffles the corpus
    * per pair).
    *
    * Accuracy: exact (estimates are integer-valued) while every segment
    * stays in the sketch's sparse regime — `q_segment_overlap` judges
    * integer equality against the exact SQL intersection there. Past
    * dense promotion, inclusion–exclusion compounds the rsd of three
    * estimates, so overlaps far smaller than the segments drown in
    * noise — the documented trade; raise lgk to push the exact regime
    * out (SketchesSpec pins both). */
  def segmentOverlap(df: DataFrame, segCol: String, keyCol: String,
      lgk: Int = 12): DataFrame = {
    val sk = df.groupBy(col(segCol).as("seg"))
      .agg(hll_sketch_agg(col(keyCol), lit(lgk)).as("sk"))
    val est = (c: org.apache.spark.sql.Column) =>
      round(hll_sketch_estimate(c)).cast("bigint")
    sk.as("a").join(sk.as("b"), col("a.seg") < col("b.seg"))
      .select(col("a.seg").as("seg_a"), col("b.seg").as("seg_b"),
        est(col("a.sk")).as("n_a"), est(col("b.sk")).as("n_b"),
        (est(col("a.sk")) + est(col("b.sk")) -
          est(hll_union(col("a.sk"), col("b.sk")))).as("n_overlap"))
  }

  /** Bloom-prefiltered inner equi-join — the runtime-filter pattern made
    * an explicit operator: build a Bloom filter over the dim side's
    * distinct keys (distributed insert, driver-merged — bounded config
    * state like the k-means codebooks: ~1.2 MB per million keys at 1%
    * fpp), broadcast it inside a scan-stage `might_contain` predicate
    * (Spark's own codegen'd [[org.apache.spark.sql.catalyst.expressions
    * .BloomFilterMightContain]], registered as `graft_might_contain`),
    * and only then join. Result is EXACTLY the plain inner join — Bloom
    * filters have no false negatives; false positives only survive to
    * the join, which drops them — so `q_bloom_join` is fully oracled
    * against the plain-join SQL. The 100 TB win is shuffle volume: at a
    * 1% dim hit-rate, ~99% of fact rows die at the scan instead of
    * crossing the exchange (SketchesSpec asserts the prefilter actually
    * prunes). AQE's injected runtime filters do this opportunistically;
    * the explicit form survives plans AQE declines (pre-shuffled
    * inputs, disabled-broadcast sessions) and documents the intent. */
  def bloomPrefilteredJoin(fact: DataFrame, dim: DataFrame, key: String,
      fpp: Double = 0.01): DataFrame = {
    // two actions read this relation (the count sizing the filter, then
    // the distributed insert) — persist via the cache contract so the
    // dim scan + distinct shuffle runs once, not twice
    val keys = graft.engine.Caches.persisted(
      dim.select(col(key).cast("long").as(key)).distinct())
    val expected = keys.count()
    // empty dim: stat.bloomFilter NPEs on zero rows, and the join result
    // is empty regardless — keep the same schema, skip the build
    if (expected == 0L)
      return fact.filter(lit(false)).join(dim, Seq(key))
    val bf = keys.stat.bloomFilter(key, expected, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    fact.filter(call_function("graft_might_contain",
        lit(bytes), col(key).cast("long")))
      .join(dim, Seq(key))
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

  /** Mergeable THETA sketch shards (Apache DataSketches theta, on
    * Spark's own classpath) — the set-OPERATION member of the sketch
    * family: [[distinctSketches]] (HLL) answers per-set distinct counts
    * and unions, but only theta sketches answer INTERSECTION and
    * DIFFERENCE cardinalities with mergeable state — "distinct users in
    * BOTH sources" (audience overlap), "distinct keys in train but not
    * eval" (coverage/contamination deltas) — questions whose exact form
    * is a distinct-shuffle of BOTH corpora. One compact sketch per input
    * partition via `mapPartitions` (the KLL shard economics: in-place
    * per-row updates, only finished ~KB sketches cross the wire); keys
    * hash from their string form, so the key domain crosses frames and
    * types consistently. Null keys are skipped (COUNT DISTINCT
    * semantics); empty partitions emit nothing. */
  def thetaSketchShards(df: DataFrame, keyCol: String,
      lgK: Int = 12): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("string")).as[String]
      .mapPartitions { it =>
        val sk = org.apache.datasketches.theta.UpdateSketch.builder()
          .setLogNominalEntries(lgK).build()
        it.foreach(k => if (k != null) sk.update(k))
        if (sk.getRetainedEntries(true) == 0) Iterator.empty
        else Iterator(sk.compact().toByteArray)
      }.toDF("sketch")
  }

  /** Set algebra over two [[thetaSketchShards]] collections: distinct
    * estimates with 2-standard-deviation bounds for A, B, A∪B, A∩B and
    * A∖B — five (measure, n_approx, lb, ub) rows. Shards are collected
    * (bounded config state: numPartitions × ~KB) and merged driver-side;
    * theta set operations are order-independent (the retained set is a
    * pure function of the hash multiset under the fixed default seed),
    * so resharding never moves an estimate. Below ~2^lgK distinct keys
    * the sketches are exact and every estimate equals the true count —
    * the regime `q_theta_ops` judges via bands, both regimes pinned in
    * SketchesSpec. */
  def thetaSetEstimates(a: DataFrame, b: DataFrame,
      lgK: Int = 12): DataFrame = {
    import org.apache.datasketches.theta.{SetOperation, Sketch, CompactSketch}
    import org.apache.datasketches.memory.Memory
    val spark = a.sparkSession
    def merge(df: DataFrame): CompactSketch = {
      val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      df.collect().foreach { r =>
        u.union(Sketch.wrap(Memory.wrap(r.getAs[Array[Byte]](0))))
      }
      u.getResult
    }
    val sa = merge(a)
    val sb = merge(b)
    val un = {
      val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      u.union(sa); u.union(sb); u.getResult
    }
    val in = {
      val i = SetOperation.builder().buildIntersection()
      i.intersect(sa); i.intersect(sb); i.getResult
    }
    val anb = SetOperation.builder().buildANotB().aNotB(sa, sb)
    import spark.implicits._
    Seq(
      ("a", sa.getEstimate, sa.getLowerBound(2), sa.getUpperBound(2)),
      ("a_not_b", anb.getEstimate, anb.getLowerBound(2), anb.getUpperBound(2)),
      ("b", sb.getEstimate, sb.getLowerBound(2), sb.getUpperBound(2)),
      ("intersect", in.getEstimate, in.getLowerBound(2), in.getUpperBound(2)),
      ("union", un.getEstimate, un.getLowerBound(2), un.getUpperBound(2)))
      .toDF("measure", "n_approx", "lb", "ub")
  }

  /** Count-Min sketch as a typed [[Aggregator]] (Cormode & Muthukrishnan
    * 2005) — the mergeable POINT-FREQUENCY estimator completing the
    * sketch family (HLL distinct, KLL quantiles, Misra-Gries heavy
    * hitters, theta sets): `depth × width` counter cells, each row a
    * seeded hash; estimate = min over rows; NEVER underestimates, and
    * overestimates by ≤ (e/width)·N with probability 1 − e^(−depth).
    * Buffer = one flat long array per task partial (the MG economics:
    * serialization per exchange row, never per input row); merge =
    * cell-wise add, which is why shard sketches union into exactly the
    * one-shot sketch (pinned). Hashing is deterministic MurmurHash3
    * with per-row seeds — estimates are reproducible across runs. */
  class CountMin(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(depth >= 1 && depth <= 8, s"depth must be in 1..8: $depth")
    require(width >= 8, s"width must be >= 8: $width")
    def zero: Array[Long] = new Array[Long](depth * width)
    private def cell(r: Int, v: String): Int = {
      val h = scala.util.hashing.MurmurHash3.stringHash(v, r * 0x9E3779B9 + 1)
      r * width + java.lang.Math.floorMod(h, width)
    }
    def reduce(b: Array[Long], a: String): Array[Long] = {
      // nulls contribute nothing — the COUNT-DISTINCT-style semantics
      // thetaSketchShards already uses (a null key would NPE stringHash)
      if (a != null) {
        var r = 0
        while (r < depth) { b(cell(r, a)) += 1; r += 1 }
      }
      b
    }
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()

    /** Point estimate from a finished cell array. Null probes estimate 0
      * (nulls are never counted by [[reduce]]). */
    def estimate(cells: Array[Long], v: String): Long = {
      if (v == null) return 0L
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = cells(cell(r, v))
        if (c < best) best = c
        r += 1
      }
      best
    }
  }

  /** CMS accuracy report over the `topK` most frequent values — the
    * judged surface for [[CountMin]], in the accuracy-contract style of
    * `q_approx_distinct_bound`/`q_hll_merge`: per probe value the EXACT
    * count plus the two theorem properties as booleans — the estimate
    * never undercounts (`ge_exact`, always true by construction) and
    * stays within the ε = e/width additive band (`within_bound`, holds
    * with prob 1 − e^(−depth); at vocabulary ≪ width the estimate is
    * simply exact). The raw estimate rides along for spec assertions
    * but is not oracle-expressible — judged projections drop it.
    * One sketch pass + one bounded exact count of the probes. */
  def cmsAccuracyReport(df: DataFrame, valueCol: String, topK: Int,
      depth: Int = 4, width: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new CountMin(depth, width)
    val vals = df.select(col(valueCol).cast("string").as("v")).as[String]
    val cells = vals.select(agg.toColumn).head()
    val n = cells.slice(0, width).sum // row 0 holds every increment once
    val bound = math.ceil(math.E / width * n).toLong
    val probes = df.groupBy(col(valueCol).cast("string").as("v"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("v")).limit(topK)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    probes.toSeq.map { case (v, exact) =>
      val est = agg.estimate(cells, v)
      (v, exact, est, est >= exact, est <= exact + bound)
    }.toDF(valueCol, "n_exact", "est", "ge_exact", "within_bound")
  }
}
