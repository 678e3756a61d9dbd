package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.operators.Events

/** Structured-Streaming surface (SURVEY §7.4 optional slice; the
  * reference is batch-only, so everything here EXTENDS the §2b event
  * operators to unbounded inputs rather than reproducing reference
  * semantics).
  *
  * Design stance: the batch operators in [[graft.operators.Events]] are
  * built from declarative primitives only (`window()` grouping, plain
  * aggregates), so the streaming variants REUSE them verbatim — the only
  * streaming-specific additions are the watermark (bounding state for
  * append-mode emission) and `session_window` (the streaming-safe
  * sessionizer; the batch lag-gap formulation needs an unbounded sort).
  * StreamingSpec asserts batch/stream parity by feeding the same rows
  * through a MemoryStream.
  */
object Streams {

  /** Stream-static enrichment join — the STATELESS streaming join every
    * event pipeline runs first (attach the dimension row to each arriving
    * event): the static side is a bounded relation re-read per
    * micro-batch and BROADCAST, so no state store and no watermark is
    * involved at all (contrast [[intervalJoinStreamWm]]); left join so an
    * event with no dimension row still flows, nulls marking the gap.
    * Judged `q_stream_enrich` against the plain batch join oracle. */
  def enrichStream(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  /** Streaming C4 blocklist gate — the content-policy twin of the
    * streaming Gopher gate (q_stream_curate), giving the curation
    * surface batch/stream parity for
    * [[graft.operators.QualityFilters.blocklistReport]]: per arriving
    * document a STATELESS scan-stage verdict — `bad_any` (any token in
    * the bad-word list — C4's actual any-occurrence-drops rule, the
    * batch gate's `maxBadMilli = 0` point), `domain_blocked` (any
    * [[graft.functions.TextOps.urlDomains]] hit in the domain list)
    * and `pass = !bad_any && !domain_blocked`. Both policy lists are
    * config-scale relations collected ONCE at plan time and inlined as
    * array literals (the broadcast-constant posture — no state store,
    * no watermark, no per-batch join; `arrays_overlap` is codegen'd),
    * so the stream is a pure map whatever its volume. Case-folded like
    * the batch gate. Judged `q_stream_blocklist` against the shared
    * gate CTE (the q_gopher no-drift pattern); list edges pinned in
    * StreamingSpec. */
  def blocklistGateStream(docs: DataFrame, idCol: String, textCol: String,
      urlCol: String, badWords: DataFrame,
      blockedDomains: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val bw = badWords.select(lower(col(badWords.columns.head)).as("w"))
      .distinct().collect().map(_.getString(0)).toSeq
    val bd = blockedDomains
      .select(lower(col(blockedDomains.columns.head)).as("d"))
      .distinct().collect().map(_.getString(0)).toSeq
    val badAny =
      if (bw.isEmpty) lit(false)
      else arrays_overlap(split(lower(col(textCol)), " "),
        array(bw.map(lit(_)): _*))
    val blocked =
      if (bd.isEmpty) lit(false)
      else arrays_overlap(graft.functions.TextOps.urlDomains(col(urlCol)),
        array(bd.map(lit(_)): _*))
    docs.select(col(idCol), badAny.as("bad_any"),
      blocked.as("domain_blocked"),
      (!badAny && !blocked).as("pass"))
  }

  /** Streaming tumbling-window aggregation: identical logical plan to
    * [[Events.tumblingAgg]] plus an event-time watermark. In append mode
    * a window emits once the watermark passes its end; state is bounded
    * by (watermark delay / width) windows per key. */
  def tumblingAggStream(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, width: String, watermarkDelay: String): DataFrame =
    Events.tumblingAgg(events.withWatermark(tsCol, watermarkDelay),
      tsCol, keyCol, valueCol, width)

  /** Streaming SLIDING-window aggregation: [[Events.slidingAgg]] plus a
    * watermark — each event updates width/slide overlapping windows'
    * state, and in append mode a window emits once the watermark passes
    * its END; state is bounded by (delay + width)/slide windows per key.
    * Judged `q_stream_sliding` with the finalization cut expressed in
    * the oracle, like its tumbling sibling. */
  def slidingAggStream(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, width: String, slide: String,
      watermarkDelay: String): DataFrame =
    Events.slidingAgg(events.withWatermark(tsCol, watermarkDelay),
      tsCol, keyCol, valueCol, width, slide)

  /** Streaming per-(window, key) exact count feed — the state half of
    * a windowed TOP-K serving view (leaderboards, trending keys):
    * append mode emits a (window, key, n) row once the watermark
    * passes the window end, and the RANK runs as a batch query over
    * the sunk finalized rows — ranking inside the stream would need a
    * non-append window function Structured Streaming doesn't plan;
    * splitting exactly here is the standard Kappa serving shape and
    * keeps state at one counter per open (window, key). Judged
    * `q_stream_topk` (rank ≤ k over the sunk feed; the oracle replays
    * the same count + finalization cut + rank in SQL), fully ORACLED;
    * emit-on-close semantics pinned alongside the tumbling family in
    * StreamingSpec. */
  def windowedCountStream(events: DataFrame, tsCol: String,
      keyCol: String, width: String, watermarkDelay: String): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), width), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(keyCol), col("n"))

  /** Streaming windowed approx-distinct — HLL sketch state INSIDE the
    * streaming aggregate (`hll_sketch_agg` is a typed imperative
    * aggregate, so the state store holds one ~KB sketch per open
    * (window, key) instead of a distinct-set that grows with
    * cardinality — the whole point at scale: windowed `count_distinct`
    * state is unbounded per window, sketch state is not). Append mode
    * emits a window's estimate once the watermark passes its end.
    *
    * Sized like [[graft.operators.Sketches.segmentOverlap]]: with
    * per-(window, key) cardinality inside the sketch's sparse regime
    * (~2^(lgk−3) keys) the estimate IS the exact count — `q_stream_hll`
    * judges integer equality against the batch COUNT(DISTINCT) oracle
    * at lgk=16; past that regime the rsd band applies. */
  def approxDistinctStream(events: DataFrame, tsCol: String, keyCol: String,
      idCol: String, width: String, watermarkDelay: String,
      lgk: Int = 16): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), width), col(keyCol))
      .agg(round(hll_sketch_estimate(
        hll_sketch_agg(col(idCol), lit(lgk)))).cast("bigint").as("n_distinct"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n_distinct"))

  /** Streaming sessionization via `session_window` — gap-merged sessions
    * with bounded state (the engine merges adjacent windows closer than
    * `gap`). Output matches [[Events.sessionize]] minus the per-user
    * session ordinal, which would require total order over an unbounded
    * stream; sessions are identified by their start time instead. */
  def sessionizeStream(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, gap: String, watermarkDelay: String): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("total_value"))
      .select(col(userCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Stream-stream inner join (equi + time-range residual): both sides
    * buffer state and every matching pair is emitted exactly once. WITHOUT
    * watermarks the state is unbounded — exact, and the right mode for a
    * FINITE replay (the driver-judged `q_stream_join` matches the batch
    * BETWEEN-join oracle bit-for-bit); a production unbounded deployment
    * adds `withWatermark` on both sides so the range condition bounds
    * state eviction (documented Spark semantics — late matches outside
    * the watermark are then dropped, trading exactness for bounded
    * memory). The join itself is the BATCH expression — Structured
    * Streaming plans the stateful symmetric hash join from the same
    * declarative form. */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
      cond: org.apache.spark.sql.Column): DataFrame =
    left.join(right, cond)

  /** The PRODUCTION shape of [[intervalJoinStream]]: watermarks on both
    * sides so the time-range join condition bounds state — each side's
    * buffer evicts rows once the other side's watermark guarantees no
    * future match (Spark derives the state-cleanup predicate from the
    * range condition + watermarks; the physical plan carries explicit
    * state watermarks on both join children). Exactness contract: rows
    * arriving later than `delay` behind the max event time can be dropped
    * before joining — bounded memory traded for late-data loss. Over a
    * replay whose matches all precede the watermark (in particular any
    * single-micro-batch replay, where the watermark is still at its
    * initial floor while every row is processed) the result equals the
    * batch join exactly, which is what lets `q_stream_join_wm` share the
    * BETWEEN oracle while exercising the bounded-state plan. */
  def intervalJoinStreamWm(left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String, delay: String,
      cond: org.apache.spark.sql.Column): DataFrame =
    left.withWatermark(leftTs, delay)
      .join(right.withWatermark(rightTs, delay), cond)

  /** LEFT OUTER watermarked stream-stream join — the shape that answers
    * "which events never got a match?" on unbounded streams. Matched
    * pairs emit immediately (inner semantics); an UNMATCHED left row
    * emits null-extended only when the watermark passes its join window
    * (`leftTs` + range upper bound), i.e. when the engine can PROVE no
    * future right row matches — which is why outer joins REQUIRE the
    * watermarks + time-range condition Spark enforces here. Left rows
    * whose window is still open at stream end never emit a null row
    * (the stream doesn't know it's over); the judged oracle reproduces
    * exactly that cut — null rows only for windows closed by the final
    * watermark, min(max left ts, max right ts) − delay, since the global
    * watermark is the minimum over sources. Judged `q_stream_outer`. */
  def intervalJoinStreamOuterWm(left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String, delay: String,
      cond: org.apache.spark.sql.Column): DataFrame =
    left.withWatermark(leftTs, delay)
      .join(right.withWatermark(rightTs, delay), cond, "left_outer")

  case class DocRow(doc_id: Long, text: String)

  /** Streaming exact dedup: emit only the FIRST occurrence of each
    * distinct text across the whole stream — the streaming face of
    * [[graft.operators.Dedup.exactDedup]], with the same hash-first scale
    * stance: state is keyed by the 128-bit text hash (two xxhash64
    * values, ~16 bytes + one boolean per distinct document ever seen),
    * never the text. `flatMapGroupsWithState` rather than
    * `dropDuplicates` because the state must outlive any watermark — a
    * duplicate of a day-old document is still a duplicate. (Unbounded
    * state is inherent to exact global dedup; callers bounding state by
    * recency should use `dropDuplicatesWithinWatermark` semantics
    * instead.) Within a micro-batch the group's survivor is the
    * MINIMUM id — post-shuffle iterator order is fetch order, not
    * encounter order, so "iterator head" would be nondeterministic;
    * min-id also matches batch `exactDedup` exactly for same-batch
    * duplicates. Across batches, state wins (first-SEEN): a later batch
    * can never resurrect a smaller id — the inherent streaming/batch
    * divergence, pinned in StreamingSpec. */
  def exactDedupStream(docs: Dataset[DocRow]): Dataset[DocRow] = {
    import docs.sparkSession.implicits._
    docs
      .withColumn("__h1", xxhash64(col("text")))
      .withColumn("__h2", xxhash64(col("text"), lit(1L)))
      .as[(Long, String, Long, Long)]
      .groupByKey { case (_, _, h1, h2) => (h1, h2) }
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (_: (Long, Long), it: Iterator[(Long, String, Long, Long)],
            state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val (id, text, _, _) = it.minBy(_._1)
            Iterator.single(DocRow(id, text))
          }
      }
  }

  /** Streaming cooldown throttle — [[graft.operators.Events.throttleEvents]]
    * as a stateful stream: per-key state is ONE long (the last KEPT
    * instant in epoch micros), a row is kept iff ≥ cooldown after it,
    * and only kept rows emit — the alert-rate-limit / debounce shape
    * running continuously. Within a micro-batch the group's rows sort
    * by (ts, tie) BEFORE the greedy (post-shuffle iterator order is
    * fetch order — unsorted state updates would be nondeterministic),
    * so under a one-batch `AvailableNow` replay the verdicts EQUAL the
    * batch operator row for row (judged `q_stream_throttle` against
    * the same recursive-replay oracle as `q_throttle`). Across real
    * micro-batches, arrival order wins like every stateful stream —
    * a late row older than the kept state is dropped even if batch
    * order would have kept it; StreamingSpec pins that divergence. */
  def throttleStream(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, cooldownSeconds: Long): DataFrame = {
    require(cooldownSeconds > 0, s"cooldownSeconds > 0: $cooldownSeconds")
    val cd = cooldownSeconds * 1000000L
    import events.sparkSession.implicits._
    events
      .select(col(keyCol).cast("long").as("k"),
        unix_micros(col(tsCol)).as("tsu"), col(tieCol).cast("long").as("tie"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (k: Long, it: Iterator[(Long, Long, Long)], state: GroupState[Long]) =>
          val rows = it.toSeq.sortBy(r => (r._2, r._3))
          var started = state.exists
          var lastKept = state.getOption.getOrElse(0L)
          val kept = rows.flatMap { case (_, ts, tie) =>
            if (!started || ts >= lastKept + cd) {
              started = true; lastKept = ts; Some((k, tie))
            } else None
          }
          if (started) state.update(lastKept)
          kept.iterator
      }
      .toDF(keyCol, tieCol)
  }

  /** Streaming Holt linear smoother — [[graft.operators.Events
    * .holtLinear]] as a stateful stream: per-key state is TWO doubles
    * (level, trend), each row emits its post-update state — the online
    * forecasting shape (next-step forecast = `level + trend` at any
    * moment, continuously maintained). Within a micro-batch the group's
    * rows sort by (ts, tie) before the fold (the [[throttleStream]]
    * determinism rule), so a one-batch `AvailableNow` replay EQUALS the
    * batch operator bit-for-bit — judged `q_stream_holt` against the
    * SAME recursive-CTE oracle as `q_holt`. Across real micro-batches,
    * arrival order wins: a late row folds in when it arrives, at the
    * then-current state — the inherent stateful-stream divergence,
    * pinned in StreamingSpec (two-batch state carry). */
  def holtStream(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, alpha: Double = 0.25,
      beta: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1,
      s"need alpha in (0,1], beta in [0,1]: $alpha, $beta")
    import events.sparkSession.implicits._
    events
      .select(col(keyCol).cast("long").as("k"),
        unix_micros(col(tsCol)).as("tsu"), col(tieCol).cast("long").as("tie"),
        col(valueCol).cast("double").as("v"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (k: Long, it: Iterator[(Long, Long, Long, Double)],
            state: GroupState[(Double, Double)]) =>
          val rows = it.toSeq.sortBy(r => (r._2, r._3))
          var started = state.exists
          var (l, b) = state.getOption.getOrElse((0.0, 0.0))
          val out = rows.map { case (_, _, tie, v) =>
            if (!started) { started = true; l = v; b = 0.0 }
            else {
              val lNew = alpha * v + (1 - alpha) * (l + b)
              b = beta * (lNew - l) + (1 - beta) * b
              l = lNew
            }
            (k, tie, v, l, b)
          }
          if (started) state.update((l, b))
          out.iterator
      }
      .toDF(keyCol, tieCol, valueCol, "level", "trend")
  }

  /** Streaming funnel — [[graft.operators.Events.funnel]] as per-user
    * custom state (`flatMapGroupsWithState`): state is (steps_done,
    * anchor_us) and each batch re-runs the batch operator's
    * greedy-earliest anchoring over the group's rows — step i matches
    * the MIN event time of its type at `ts >= anchor(i−1)` (computed
    * by chained min-scans over the sorted buffer, not a single
    * forward scan, so equal-timestamp events BEHIND the anchor match
    * exactly as the batch chained-min semantics say). Users emit one
    * (user, steps_done, anchor_us) progress row per batch once the
    * entry step is seen; under a one-batch `AvailableNow` replay that
    * is exactly the batch funnel per user — judged `q_stream_funnel`
    * against the same chained-CTE oracle family as `q_funnel`. Across
    * real micro-batches arrival order wins (a late earlier-anchor
    * event cannot rewind a match) — the [[holtStream]] divergence
    * contract, pinned in StreamingSpec. State survives query RESTARTS
    * exactly-once: judged `q_stream_funnel_restart` (two AvailableNow
    * queries over one checkpoint, type-split two-phase oracle).
    *
    * Scale: state is two longs per user; in-batch work is
    * O(steps · group rows). */
  def funnelStream(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import events.sparkSession.implicits._
    val stepArr = steps.toIndexedSeq
    events
      .select(col(userCol).cast("long").as("k"),
        unix_micros(col(tsCol)).as("tsu"), col(tieCol).cast("long").as("tie"),
        col(typeCol).cast("string").as("et"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (k: Long, it: Iterator[(Long, Long, Long, String)],
            state: GroupState[(Int, Long)]) =>
          val rows = it.toSeq
          var (done, anchor) = state.getOption.getOrElse((0, Long.MinValue))
          var progressed = true
          while (done < stepArr.length && progressed) {
            val want = stepArr(done)
            val next = rows.iterator
              .filter(r => r._4 == want && (done == 0 || r._2 >= anchor))
              .map(_._2)
            if (next.hasNext) { anchor = next.min; done += 1 }
            else progressed = false
          }
          if (done >= 1) {
            state.update((done, anchor))
            Iterator.single((k, done.toLong, anchor))
          } else Iterator.empty
      }
      .toDF(userCol, "steps_done", "anchor_us")
  }

  /** BOUNDED-STATE streaming dedup — the production counterpart of
    * [[exactDedupStream]] for corpora where "duplicate" means "repeated
    * within the recency horizon": rows are keyed by the same 128-bit text
    * hash, but state rides `dropDuplicatesWithinWatermark`, so a key's
    * entry is evicted once the watermark passes its event time (+ delay)
    * and a sufficiently LATE duplicate re-emits — the explicit trade
    * (bounded memory, horizon-scoped dedup) that global exact dedup
    * cannot make. Within one micro-batch an arbitrary row per key
    * survives (Spark semantics); callers needing a judged/deterministic
    * output feed identical duplicate rows, as `q_stream_dedup_wm` does.
    * StreamingSpec pins the horizon semantics across batches: in-horizon
    * duplicates suppressed, post-eviction duplicates re-emitted. */
  def exactDedupStreamWm(docs: DataFrame, textCol: String, tsCol: String,
      watermarkDelay: String): DataFrame =
    docs.withWatermark(tsCol, watermarkDelay)
      .withColumn("__h1", xxhash64(col(textCol)))
      .withColumn("__h2", xxhash64(col(textCol), lit(1L)))
      .dropDuplicatesWithinWatermark("__h1", "__h2")
      .drop("__h1", "__h2")

  /** STREAMING near-dup flagging against a static MinHash index — the
    * ingest-time hygiene check ([[graft.operators.Dedup.ingestNearDup]]'s
    * corpus-side half) as a continuous query: each arriving doc is
    * signed in the projection (the same scan-stage `graft_minhash`
    * kernel — stateless, no shuffle), its LSH bands stream-static join
    * the banded index, and band collisions are verified against the
    * estimated-Jaccard threshold before a `(da, db, est_jaccard)` flag
    * row emits. `dropDuplicates` collapses multi-band hits to one row
    * per pair.
    *
    * Scale shape: the stream row CARRIES its own signature, so the
    * verify needs no join back to a stream-side relation (one
    * stream-static hash join total); the index side is
    * [[graft.operators.Dedup.minHashIndex]] rows — banded 16-byte keys
    * with the ~256 B signature attached, corpus text never read. State
    * is the emitted pair set (dedup only) and grows unboundedly with
    * the flagged-pair count; a deployment whose pair space outgrows
    * memory uses [[nearDupFlagStreamWm]] — the same pipeline with the
    * pair state watermark-bounded, trading per-pair-once for
    * per-pair-once-per-horizon exactly as [[exactDedupStreamWm]] does.
    *
    * WITHIN-batch near-dup (new doc vs new doc) is deliberately not
    * here: it is a stream self-join; the production shape for it is
    * `foreachBatch` over [[graft.operators.Dedup.ingestNearDupWithSigs]],
    * which also appends accepted signatures to the index. Judged
    * `q_stream_neardup` on the arithmetic dup-group fixture (fully
    * oracled); semantics pinned in StreamingSpec. */
  def nearDupFlagStream(docs: DataFrame, textCol: String, idCol: String,
      indexSigs: DataFrame, indexIdCol: String, estThreshold: Double,
      numHashes: Int = 32, bands: Int = 8, width: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    import graft.operators.Dedup
    val signed = docs
      .select(col(idCol),
        call_function("graft_minhash", col(textCol), lit(width),
          lit(numHashes)).as("siga"))
      .filter(col("siga").isNotNull)
      .select(col(idCol), col("siga"),
        posexplode(Dedup.bandHashes(col("siga"), bands, rows)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    val idx = indexSigs
      .select(col(indexIdCol).as("__db"), col("sig").as("sigb"))
      .select(col("__db"), col("sigb"),
        posexplode(Dedup.bandHashes(col("sigb"), bands, rows)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    signed.join(idx, Seq("band", "bh"))
      .withColumn("est_jaccard",
        call_function("graft_sig_agree", col("siga"), col("sigb"))
          .cast("double") / numHashes)
      .filter(col("est_jaccard") >= estThreshold)
      .select(col(idCol).as("da"), col("__db").as("db"), col("est_jaccard"))
      .dropDuplicates("da", "db")
  }

  /** BOUNDED-STATE streaming near-dup flagging — [[nearDupFlagStream]]
    * with the state growth capped exactly as [[exactDedupStreamWm]] caps
    * exact dedup's: the emitted-pair dedup state rides
    * `dropDuplicatesWithinWatermark` keyed on the doc's EVENT TIME, so a
    * pair's entry is evicted once the watermark passes its time (+
    * delay) and a sufficiently LATE re-collision re-emits — per-pair-once
    * becomes per-pair-once-per-horizon, the explicit trade a deployment
    * makes when the pair space outgrows memory. The signing / band-join /
    * verify pipeline is identical (stateless + one stream-static join);
    * ONLY the final dedup holds state, and that state is now
    * watermark-bounded: |pairs flagged within the horizon| · ~40 B,
    * whatever the stream's lifetime. The event-time column must survive
    * to the dedup (Spark requires the watermark column in the frame), so
    * the flag row carries `ts` — downstream drops it if unwanted. Judged
    * `q_stream_neardup_wm` (single-file replay: all pairs in-horizon ⇒
    * output equals the unbounded variant's, while the PLAN is the
    * bounded-state production shape); horizon semantics (late
    * re-collision re-emits after eviction) pinned across real batches in
    * StreamingSpec. */
  def nearDupFlagStreamWm(docs: DataFrame, textCol: String, idCol: String,
      tsCol: String, watermarkDelay: String,
      indexSigs: DataFrame, indexIdCol: String, estThreshold: Double,
      numHashes: Int = 32, bands: Int = 8, width: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    import graft.operators.Dedup
    val signed = docs.withWatermark(tsCol, watermarkDelay)
      .select(col(idCol), col(tsCol),
        call_function("graft_minhash", col(textCol), lit(width),
          lit(numHashes)).as("siga"))
      .filter(col("siga").isNotNull)
      .select(col(idCol), col(tsCol), col("siga"),
        posexplode(Dedup.bandHashes(col("siga"), bands, rows)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    val idx = indexSigs
      .select(col(indexIdCol).as("__db"), col("sig").as("sigb"))
      .select(col("__db"), col("sigb"),
        posexplode(Dedup.bandHashes(col("sigb"), bands, rows)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    signed.join(idx, Seq("band", "bh"))
      .withColumn("est_jaccard",
        call_function("graft_sig_agree", col("siga"), col("sigb"))
          .cast("double") / numHashes)
      .filter(col("est_jaccard") >= estThreshold)
      .select(col(idCol).as("da"), col("__db").as("db"),
        col("est_jaccard"), col(tsCol))
      .dropDuplicatesWithinWatermark("da", "db")
  }

  case class UserEvent(user_id: Long, value: Double)
  case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  /** Custom incremental state via `mapGroupsWithState`: running per-user
    * event count + value total, updated per micro-batch. The same code
    * path runs in batch (state starts empty, one pass), which is what
    * StreamingSpec uses to assert stream/batch agreement.
    *
    * Deliberately TEST-ONLY (not driver-judged): `mapGroupsWithState`
    * requires Update output mode — every micro-batch re-emits revised
    * per-user rows — and the driver's oracle channel is a file sink,
    * which is append-only and rejects Update queries. Its siblings all
    * have judged queries; this one's semantics are pinned by the
    * MemoryStream batch-parity test instead. */
  /** Streaming score-distribution monitor — the stream half of
    * [[graft.operators.Events.psiBins]]'s drift loop: exact per-
    * (tumbling window, bin) counts against FIXED reference boundaries
    * (the batch side computes them once from the training slice —
    * quantile parity per psiBins — and ships them as literals), each
    * window emitting once the watermark closes it. Downstream, PSI
    * terms are a config-scale batch join of these counts against the
    * reference shares (psiBins' smoothing formula) — the stream never
    * carries floats, only the codegen'd when-chain bin id and integer
    * counts, so the judged compare is exact. State: one row per open
    * (window, bin) — ≤ (boundaries+1) per window, trivially bounded.
    * Judged `q_stream_psi`, fully ORACLED (the oracle recomputes the
    * same quantile boundaries + finalization cut in SQL); bin edges /
    * watermark cut pinned in StreamingSpec. */
  def binnedDistributionStream(events: DataFrame, tsCol: String,
      valueCol: String, boundaries: Seq[Double], width: String,
      watermarkDelay: String): DataFrame = {
    require(boundaries.nonEmpty &&
      boundaries.sliding(2).forall(p => p.size < 2 || p.head < p.last),
      s"boundaries must be strictly increasing: $boundaries")
    val bin = boundaries.indices.foldLeft(lit(0)) { (acc, i) =>
      acc + when(col(valueCol) > lit(boundaries(i)), 1).otherwise(0)
    }
    events.withWatermark(tsCol, watermarkDelay)
      .withColumn("bin", bin)
      .groupBy(window(col(tsCol), width), col("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("bin"), col("n"))
  }

  /** Streaming experiment-health feed — per-window DISTINCT-unit
    * counts per arm, the input an online SRM monitor thresholds
    * ([[graft.operators.Eval.srmCheck]] is the batch readout over it):
    * a watermark-bounded streaming `dropDuplicates` on (window, arm,
    * unit) — state evicts with the window, the q_stream_dedup_wm
    * bounded-state discipline — feeds a windowed count; append mode
    * emits each window once, when the watermark closes it (two chained
    * stateful operators, both keyed on the event-time window). Judged
    * `q_stream_srm` with the per-window chi-square assembled batch-side
    * over the sink, fully ORACLED against the batch distinct-count
    * replay under the final-watermark window filter. */
  def srmUnitCountStream(events: DataFrame, tsCol: String,
      unitCol: String, armCol: String, width: String,
      watermarkDelay: String): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .select(window(col(tsCol), width).as("w"), col(armCol).as("arm"),
        col(unitCol).as("unit"))
      .dropDuplicates("w", "arm", "unit")
      .groupBy(col("w"), col("arm"))
      .agg(count(lit(1)).as("n_units"))
      .select(col("w.start").as("window_start"), col("arm"),
        col("n_units"))

  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          it.foreach { e => n += 1; total += e.value }
          val next = UserTotal(uid, n, total)
          state.update(next)
          next
      }
  }
}
