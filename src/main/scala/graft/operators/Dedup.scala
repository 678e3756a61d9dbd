package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Barriers.BarrierOps

import graft.engine.Caches

/** Deduplication operators for the LLM-data-pipeline surface
  * (SURVEY.md §2b rows 1-2): exact dedup, exact set-similarity join
  * (prefix-filtered), and MinHash-LSH candidate generation.
  *
  * Scale stance (100 TB): tokenized text is hashed to 64-bit values ONCE,
  * at the scan stage, and every downstream sort / join / intersect runs in
  * hash space — 8-byte keys, integer comparisons, no string ever crosses a
  * shuffle. Candidate pairs travel as bare (id, id) tuples; wide payloads
  * (shingle sets, signatures) are attached only after the pair set is
  * deduplicated. The per-doc relations feeding a self-join are persisted so
  * the join does not re-execute the shingling subplan for each side.
  */
object Dedup {

  /** Exact dedup: keep the minimum-id row per distinct value of `textCol`.
    *
    * The groupBy key is a 128-bit composite of two independent xxhash64
    * values — 16 bytes — so the pre-aggregation and shuffle carry
    * (hash, id) tuples instead of full documents; the surviving ids are
    * then semi-joined back to recover the full rows. At 100 TB this is the
    * difference between shuffling ~24 bytes/row and shuffling the corpus.
    * Collisions would silently merge distinct texts; with a single 64-bit
    * key the expectation at 10^10 docs is C(10^10,2)/2^64 ≈ 2.7 merges —
    * not acceptable — so we widen to 128 bits, where the expectation is
    * C(10^10,2)/2^128 ≈ 1.5e-19 (negligible, and deterministic for a
    * fixed corpus).
    *
    * Same (key-hash, min-id, semi-join-back) shape as the reference's
    * `drop_duplicates()` intent (etl.py:61) lifted to wide-text inputs.
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = df
      .select(xxhash64(col(textCol)).as("__h1"),
        xxhash64(col(textCol), lit(1L)).as("__h2"), col(idCol))
      .groupBy(col("__h1"), col("__h2"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Duplication profile — the curation readout [[exactDedup]] acts on
    * (before deleting anything, know WHAT the duplication looks like):
    * the cluster-size histogram of exact-duplicate groups — how many
    * distinct texts appear once, twice, k times — plus a TOTAL row
    * carrying corpus size, distinct-text count and
    * `dup_rate_milli = (N − distinct)·1000 div N` (the share of rows a
    * dedup pass would remove). The shape every dataset card reports
    * and the saturation signal a crawl pipeline watches per batch.
    *
    * Scale: texts hash to the 128-bit key in the scan (text never
    * shuffles), one partial agg to cluster sizes, one config-scale
    * histogram agg. Judged `q_dup_profile` (the synthetic duplicate
    * corpus), fully ORACLED; hand histogram, all-unique and
    * monoculture extremes pinned in DedupSpec. */
  def dupProfile(docs: DataFrame, textCol: String): DataFrame = {
    val sizes = graft.engine.Caches.persisted(
      docs.select(xxhash64(col(textCol)).as("__h1"),
          xxhash64(col(textCol), lit(1L)).as("__h2"))
        .groupBy("__h1", "__h2").agg(count(lit(1)).as("__sz")))
    val hist = sizes.groupBy(col("__sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"),
        lit(null).cast("long").as("dup_rate_milli"))
    val total = sizes.agg(count(lit(1)).as("n_clusters"),
        sum(col("__sz")).as("n_docs"))
      .select(lit(null).cast("long").as("cluster_size"),
        col("n_clusters"), col("n_docs"),
        when(col("n_docs") > 0,
          expr("(n_docs - n_clusters) * 1000 div n_docs"))
          .as("dup_rate_milli"))
    hist.unionByName(total)
  }

  /** One row per (doc, shingle-hash): the word `width`-gram at each token
    * position hashed to 64 bits by the native
    * [[graft.functions.ShingleKernel]] codegen expression — straight out
    * of the SCAN stage, no shingle string ever allocated, NO shuffle
    * (r3 VERDICT item 1 closed: the previous explode + window-lead
    * pipeline exchanged a (doc, pos, token-string) row per corpus token;
    * r2 before it evaluated interpreted higher-order functions at
    * ~60 µs/shingle — this is the third formulation and the right one).
    * Hash values are bit-identical to `xxhash64(shingle_string)`
    * (ShingleExprsSpec pins the equality), so every downstream sketch and
    * judged output is unchanged. Docs with fewer than `width` tokens yield
    * no rows (empty array under explode), matching the oracle's empty
    * `generate_series`. */
  private def shingleHashRows(docs: DataFrame, textCol: String, idCol: String,
      width: Int): DataFrame =
    docs.select(col(idCol),
      explode(call_function("graft_shingle_hashes", col(textCol), lit(width)))
        .as("h"))

  /** Per-doc distinct shingle-hash sets, canonically ordered:
    * (idCol, sh array<long> ascending-sorted, n int).
    *
    * Ascending numeric order doubles as the global canonical order
    * required by prefix filtering (hash order also spreads "popular"
    * shingles uniformly, so prefixes are not all the same stopword
    * n-gram). A doc's exploded hash rows stay coresident in their scan
    * task, so partial aggregation compresses to one row per doc BEFORE
    * the groupBy exchange — the shuffle carries (id, hash-set) rows, one
    * per document, never per-shingle rows. */
  private def shingleHashSets(docs: DataFrame, textCol: String, idCol: String,
      width: Int): DataFrame =
    shingleHashRows(docs, textCol, idCol, width)
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("h"))).as("sh"))
      .withColumn("n", size(col("sh")))

  /** Exact n-gram CONTAINMENT self-join — the asymmetric sibling of
    * [[jaccardJoin]]: all pairs (a < b) where the smaller shingle set is
    * mostly inside the other, `inter / min(|A|, |B|) >= threshold`, with
    * both directional containments reported. Jaccard misses exactly
    * these pairs (a quote or truncated copy has high containment but low
    * Jaccard when sizes differ), and partial-copy detection is a
    * curation pass of its own (Lee et al. 2022 §4 discuss the
    * substring-duplication regime; [[sharedSpanPairs]] is the
    * span-level view, this is the set-level one).
    *
    * Formulation: per-doc DISTINCT shingle hashes (scan-stage kernel)
    * self-join on the hash — bare (8-byte, id, id) rows — and the pair's
    * intersection size falls out of one (da, db) partial-aggregated
    * count; sizes attach afterward from the persisted set relation. Any
    * qualifying pair shares ≥ 1 shingle, so recall is exact and the
    * all-pairs SQL oracle is checkable. Skew: a boilerplate shingle
    * shared by k docs emits k² candidate rows — same hot-shingle cap
    * policy as [[sharedSpanPairs]] (drop shingles above a document-
    * frequency ceiling first; boilerplate is [[graft.functions.TextOps
    * .stripBoilerplate]]'s job). Judged `q_containment` on a fixture
    * injecting truncated copies, fully oracled. */
  def containmentJoin(docs: DataFrame, textCol: String, idCol: String,
      threshold: Double, width: Int = 3): DataFrame = {
    val sets = Caches.persisted(shingleHashSets(docs, textCol, idCol, width))
    val sh = sets.select(col(idCol), explode(col("sh")).as("h"))
    val pairs = sh.alias("a")
      .join(sh.alias("b"), col("a.h") === col("b.h") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("da"), col(s"b.$idCol").as("db"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sets.select(col(idCol).as("da"), col("n").as("na")), "da")
      .join(sets.select(col(idCol).as("db"), col("n").as("nb")), "db")
      .withColumn("c_ab", col("inter").cast("double") / col("na"))
      .withColumn("c_ba", col("inter").cast("double") / col("nb"))
      .filter(greatest(col("c_ab"), col("c_ba")) >= threshold)
      .select(col("da"), col("db"), col("inter"), col("c_ab"), col("c_ba"))
  }

  /** Exact n-gram Jaccard similarity self-join: all pairs (a < b) with
    * `J(shingles(a), shingles(b)) >= threshold`, via AllPairs-style prefix
    * filtering (Bayardo et al., WWW'07; Chaudhuri et al., ICDE'06 —
    * public algorithms).
    *
    * Candidate generation: keep only the first `n - ceil(t*n) + 1` hashes
    * of each doc's canonically-sorted shingle-hash set; any pair with
    * J >= t must share a prefix hash (overlap >= ceil(t*n) on both sides),
    * so recall is exact — which is what makes the operator oracle-checkable
    * against an all-pairs SQL join (hash-space Jaccard equals string-space
    * Jaccard absent 64-bit collisions, whose in-doc probability at ~10^2
    * shingles is ~1e-16). Verification computes true Jaccard on the
    * candidate pairs via sorted-array `array_intersect` on the full sets.
    *
    * Scale: the only self-join is the candidate equi-join on 8-byte prefix
    * hashes (~(1-t) of all shingle occurrences); candidates are bare
    * (da, db) pairs, deduplicated before the (small) per-doc sets are
    * attached. `sets` is persisted: it feeds both join sides and the
    * verification, and at ~8 bytes/shingle it is ~2 orders of magnitude
    * smaller than the corpus (checkpoint instead if executor memory is
    * tight at full scale). No all-pairs product is ever formed.
    */
  def jaccardJoin(docs: DataFrame, textCol: String, idCol: String,
      threshold: Double, width: Int = 3): DataFrame = {
    val sets = Caches.persisted(shingleHashSets(docs, textCol, idCol, width))
    val prefixLen = (col("n") - ceil(col("n") * lit(threshold)).cast("int") + 1)
    val prefix = sets
      .select(col(idCol), explode(slice(col("sh"), lit(1), prefixLen)).as("h"))

    val cand = prefix.alias("a")
      .join(prefix.alias("b"), col("a.h") === col("b.h") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("da"), col(s"b.$idCol").as("db"))
      .distinct()

    cand
      .join(sets.select(col(idCol).as("da"), col("sh").as("sha"), col("n").as("na")), "da")
      .join(sets.select(col(idCol).as("db"), col("sh").as("shb"), col("n").as("nb")), "db")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("da"), col("db"), col("jaccard"))
  }

  /** Exact duplicated-span detection — the "exact substring dedup" of
    * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better", public), in its hash-join formulation: all doc pairs
    * (da < db) sharing at least one exact `spanTokens`-token span, with
    * the count of DISTINCT shared span hashes. (The paper's suffix-array
    * formulation finds arbitrary-length duplicates; fixed-width spans at
    * a stride of one token are the standard scalable approximation — any
    * duplicate run of ≥ spanTokens tokens is caught.)
    *
    * Scale: span hashes come out of the scan per-row via the
    * `graft_shingle_hashes` kernel (width = spanTokens) — 8-byte values,
    * no span string ever materialized; per-doc dedup happens BEFORE the
    * self-join, so the join input is one row per distinct (doc, span).
    * Caveat for 100 TB: a span shared by k docs fans out to C(k,2) pairs —
    * true boilerplate (licenses, headers) should be dropped by frequency
    * (count docs per hash, filter k below a cap) before pairing; the cap
    * is left to callers because "how common is boilerplate" is corpus
    * policy. Judged `q_span_dup`, fully oracled (hash-space counts equal
    * string-space counts absent 64-bit collisions, as in [[jaccardJoin]]).
    */
  def sharedSpanPairs(docs: DataFrame, textCol: String, idCol: String,
      spanTokens: Int): DataFrame = {
    // persisted via the Caches registry: feeds BOTH sides of the self-join
    // (the repo rule — without it the distinct-span shuffle runs twice
    // whenever exchange reuse doesn't fire); released when the NEXT
    // SparkEntry query is built, or by any harness clearCache
    val spans = Caches.persisted(docs.select(col(idCol),
        explode(call_function("graft_shingle_hashes", col(textCol), lit(spanTokens)))
          .as("h"))
      .distinct())
    spans.alias("a")
      .join(spans.alias("b"), col("a.h") === col("b.h") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("da"), col(s"b.$idCol").as("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("n_spans"))
  }

  /** Connected components over an undirected edge list of long node ids:
    * returns (id, component) for every node that appears in `pairs`, where
    * `component` is the MINIMUM id in the node's component — the cluster
    * representative a curation pipeline keeps.
    *
    * Algorithm: alternating large-star / small-star contraction (Kiveris,
    * Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
    * MapReduce and Beyond", SoCC'14 — public). Each round:
    *   large-star — for every node u, each LARGER neighbor v is re-pointed
    *     at m = min(Γ(u) ∪ {u});
    *   small-star — for every node u (over the now larger→smaller directed
    *     edges), u and each of its smaller neighbors are pointed at the
    *     minimum of that in-neighborhood.
    * The edge set converges to a star forest (every node → its component
    * min) in O(log² n) rounds — in practice a handful; near-dup clusters
    * are tight, so 2-3 rounds close them.
    *
    * Why not plain min-label propagation: its round count is the component
    * DIAMETER — a pathological duplicate chain at 100 TB (boilerplate docs
    * chained by sliding near-identity) can be thousands of hops; star
    * contraction collapses such chains logarithmically.
    *
    * Scale: each round is two (groupBy + join) rounds over bare (long,
    * long) edges — 16-byte shuffle rows, no payload. Every round's edge
    * set is materialized through an EAGER `localCheckpoint`, which is
    * load-bearing twice over: it truncates the logical plan (without it
    * the round-N plan embeds round-(N−1)'s plan ~12×, i.e. EXPONENTIAL
    * analysis/codegen growth — the classic iterative-algorithm trap), and
    * it doubles as the materialization barrier for the convergence check.
    * On a cluster where executor loss matters, swap for reliable
    * `checkpoint` (one line — needs a checkpoint dir). The driver-side
    * work per round is ONE (count, hash-xor) action — no edge ever
    * reaches the driver. Throws if `maxRounds` is hit unconverged (never
    * expected below ~10^9 nodes) rather than returning non-minimal
    * labels.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 25): DataFrame = {
    // canonical directed larger -> smaller edges; self-pairs (a == b) are
    // dropped here, so the node set below intentionally ignores nodes
    // that ONLY self-pair — matching the recursive-CTE oracle, which also
    // only sees nodes of real edges
    // convergence fingerprint: (edge count, XOR of per-edge hashes) —
    // cheap, order-independent, overflow-free (a SUM of hashes trips
    // ANSI long overflow), collision-safe for all practical purposes,
    // and since r18 folded INTO the materialization job itself
    // (Barriers.cutFingerprinted) so a round is ONE action, not
    // cut + a second fingerprint aggregate. The physical rows are
    // (u: long, v: long) at ordinals 0/1 — both non-null by
    // construction.
    val hashUV = (r: org.apache.spark.sql.catalyst.InternalRow) =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(r.getLong(1),
        org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
          r.getLong(0), 42L))
    val (initial, n0, x0) = graft.engine.Barriers.cutFingerprinted(pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct(), hashUV)
    // derive nodes from the CHECKPOINTED edges, not from `pairs`: the
    // caller's pair-generation plan (e.g. the whole jaccardJoin) would
    // otherwise re-execute when the final join materializes
    val nodes = initial.select(col("u").as("id"))
      .union(initial.select(col("v").as("id"))).distinct()
    var edges = initial
    var cur = (n0, x0)
    var round = 0
    var converged = false
    // loop partitions sized to the measured edge count (r18: the
    // cycleNodes few-partition rule, size-derived — the fingerprint
    // already counted, so sizing costs nothing). Contraction only
    // shrinks the edge set, so the initial count bounds every round.
    graft.engine.Loops.sized(pairs.sparkSession, cur._1) {
    while (!converged && round < maxRounds) {
      // large-star: symmetrize; per node u, point each larger neighbor at
      // m = min(neighborhood ∪ {u}). Emitted edges are larger -> smaller.
      val sym = edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val lsMin = sym.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val ls = sym.join(lsMin, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // small-star: per node u over larger->smaller edges, point u and all
      // its smaller neighbors at the minimum of that in-neighborhood.
      val ssMin = ls.groupBy("u").agg(min(col("v")).as("m"))
      val (next, nN, xN) = graft.engine.Barriers.cutFingerprinted(
        ls.join(ssMin, "u")
          .select(col("v").as("u"), col("m").as("v"))
          .union(ssMin.select(col("u"), col("m").as("v")))
          .filter(col("u") =!= col("v"))
          .distinct(), hashUV) // eager: lineage cut + barrier + fingerprint
      val nextStat = (nN, xN)
      // previous rounds' checkpoint RDDs are freed by the ContextCleaner
      // once dereferenced (Dataset.unpersist does not reach RDD-level
      // checkpoint caches); bounded: one edge set per round
      //
      // A fingerprint match is CONFIRMED by one exact set-difference check
      // before declaring convergence (ADVICE r5: a 64-bit xor collision
      // would otherwise end iteration early and return non-minimal labels
      // silently). Equal counts + empty one-sided difference of distinct
      // sets ⇒ set equality; the check runs at most once per call on the
      // (small, checkpointed) final edge sets, so the cost is one cheap
      // job on the convergence round only.
      converged = nextStat == cur && next.exceptAll(edges).isEmpty
      cur = nextStat
      edges = next
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: not converged after $maxRounds rounds")
    nodes.join(edges.groupBy("u").agg(min(col("v")).as("__c")),
        nodes("id") === col("u"), "left")
      .select(col("id"), coalesce(col("__c"), col("id")).as("component"))
    } // Loops.sized
  }

  /** Incremental ingest with dedup-on-arrival — the first genuinely
    * INCREMENTAL surface (r5 VERDICT item 8): given the standing corpus
    * `existing` and a new `batch`, returns the batch rows that should be
    * APPENDED — batch rows deduplicated among themselves (keep min id,
    * [[exactDedup]] semantics) and with every text already present in the
    * corpus dropped. The reference pipeline only full-overwrites; a
    * 100 TB corpus refreshes by appending exactly this delta.
    *
    * Invariant (judged by `q_ingest_dedup` against a recomputed-from-
    * scratch oracle): when every existing id precedes every batch id —
    * the natural monotonic-id ingest discipline — then
    * `existing ∪ ingestDedup(existing, batch)` equals
    * `exactDedup(existing ∪ batch)` exactly; first-seen and min-id
    * coincide. (`existing` is assumed already deduplicated, i.e. the
    * output of prior ingests; duplicate texts inside `existing` are kept
    * as-is — incremental ingest never rewrites the standing corpus.)
    *
    * Scale: the standing corpus contributes ONLY its distinct 128-bit
    * text hashes (16 bytes/doc — the same composite key as
    * [[exactDedup]], same collision math), never its text; the anti-join
    * probes the batch (small by definition) against that hash relation,
    * so the per-refresh cost is one corpus hash scan + one batch-sized
    * shuffle. At a steady refresh cadence the corpus hash relation is
    * itself a table to maintain incrementally (append the delta's
    * hashes), making the corpus scan one-time — noted, not required
    * here. */
  def ingestDedup(existing: DataFrame, batch: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val corpusHashes = existing
      .select(xxhash64(col(textCol)).as("__h1"),
        xxhash64(col(textCol), lit(1L)).as("__h2"))
      .distinct()
    exactDedup(batch, textCol, idCol)
      .withColumn("__h1", xxhash64(col(textCol)))
      .withColumn("__h2", xxhash64(col(textCol), lit(1L)))
      .join(corpusHashes, Seq("__h1", "__h2"), "left_anti")
      .drop("__h1", "__h2")
  }

  /** 64-bit SimHash fingerprints (Charikar, STOC'02), computed PER ROW by
    * the native `graft_simhash` codegen expression in the scan stage — no
    * explode, no aggregate, no shuffle at all (r3 VERDICT item 5: the
    * previous formulation was a 64-column `sum(when(...))` hash-aggregate,
    * the widest aggregate in the suite at 6.7 s; the kernel computes the
    * same bit-identical fingerprint — sign of Σ ±1 per bit of each
    * xxhash64 shingle hash — in one pass over the doc's bytes). Docs with
    * no shingles (fewer than `width` tokens) return NULL and are filtered,
    * preserving the previous "absent from the groupBy result" contract. */
  def simHashFingerprints(docs: DataFrame, textCol: String, idCol: String,
      width: Int = 3): DataFrame =
    docs.select(col(idCol),
        call_function("graft_simhash", col(textCol), lit(width)).as("fp"))
      .filter(col("fp").isNotNull)

  /** SimHash near-dup pairs: (da < db) whose fingerprints differ in at
    * most `maxHamming` of 64 bits.
    *
    * Candidates via the Manku-Das Sarma-Garg (WWW'07) pigeonhole split:
    * the fingerprint is cut into `maxHamming + 1` disjoint bands, and any
    * pair within the distance budget must agree EXACTLY on at least one
    * band — so the band equi-join has exact recall with respect to the
    * fingerprints, and the final `bit_count(xor)` filter is a
    * verification, not a heuristic. (What remains probabilistic is
    * SimHash itself: fingerprint distance ≈ angular distance of shingle
    * sets — hence judged rows-only, like MinHash-LSH.)
    *
    * Scale: fingerprints are 8 bytes/doc; the band join shuffles
    * (band-index, band-bits, id) triples; pairs are deduplicated bare
    * before fingerprints are joined back.
    */
  def simHashNearDup(docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, width: Int = 3): DataFrame = {
    val bands = maxHamming + 1
    require(64 % bands == 0, s"maxHamming+1 must divide 64, got $bands")
    val w = 64 / bands
    val mask = if (w == 64) -1L else (1L << w) - 1
    val fps = Caches.persisted(simHashFingerprints(docs, textCol, idCol, width))
    val banded = fps.select(col(idCol),
        posexplode(array((0 until bands).map(b =>
          shiftrightunsigned(col("fp"), b * w).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bv")
    val cand = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("da"), col(s"b.$idCol").as("db"))
      .distinct()
    cand
      .join(fps.select(col(idCol).as("da"), col("fp").as("fpa")), "da")
      .join(fps.select(col(idCol).as("db"), col("fp").as("fpb")), "db")
      .withColumn("hamming", bit_count(col("fpa").bitwiseXOR(col("fpb"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("da"), col("db"), col("hamming"))
  }

  /** MinHash signatures, computed PER ROW by the native `graft_minhash`
    * codegen expression in the scan stage — no explode, no aggregate, no
    * shuffle (same escalation as [[simHashFingerprints]]). The i-th
    * "permutation" is `xxhash64(i, shingle_hash)` derived arithmetically
    * (two-long integer hashing, never re-touching the string), folded
    * exactly as Spark's multi-arg xxhash64 would, so signatures are
    * bit-identical to the previous `min(xxhash64(lit(i), h))` aggregate
    * formulation. Docs with no shingles return NULL and are filtered.
    * Returns (idCol, sig array<long> of length numHashes). */
  private[graft] def minHashSignatures(docs: DataFrame, textCol: String,
      idCol: String, width: Int, numHashes: Int): DataFrame =
    docs.select(col(idCol),
        call_function("graft_minhash", col(textCol), lit(width), lit(numHashes))
          .as("sig"))
      .filter(col("sig").isNotNull)

  /** Banded LSH over a MinHash signature: `bands` hashes, each over a
    * contiguous `rows`-slice of the signature (b x r = numHashes).
    * `bands` is known at plan time, so the per-band hashes unroll to a
    * plain codegen `array(...)` — no interpreted `transform` lambda on
    * the per-document path (hash values identical to the lambda form:
    * same `xxhash64(1, slice(sig, ...))` expression per band). */
  def bandHashes(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map(j =>
      xxhash64(lit(1), slice(sig, j * rows + 1, rows))): _*)

  /** MinHash-LSH near-dup candidates (SURVEY §2b row 2): docs sharing at
    * least one of `bands` band hashes, with the signature-estimated
    * Jaccard attached and thresholded.
    *
    * With b=8, r=4 the capture probability is 1-(1-J^4)^8: ~0.99+ at
    * J=0.9, ~0.03 at J=0.3 — the classic LSH S-curve. Estimated Jaccard =
    * fraction of agreeing signature positions. Probabilistic recall, so
    * this is judged rows-only; the exact-recall path is [[jaccardJoin]].
    *
    * Scale: `sigs` (id + 32 longs ≈ 300 B/doc) is materialized once and
    * persisted — it feeds both sides of the band join and the final
    * estimate — so the signature subplan runs exactly one corpus scan.
    * Candidates come from a self-equi-join on (band index, band hash) —
    * 16 bytes — and are deduplicated as bare (da, db) pairs BEFORE the
    * signatures are joined back for the estimate, so no signature array
    * ever rides through the candidate shuffle.
    */
  def minHashLsh(docs: DataFrame, textCol: String, idCol: String,
      estThreshold: Double, numHashes: Int = 32, bands: Int = 8,
      width: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = Caches.persisted(
      minHashSignatures(docs, textCol, idCol, width, numHashes))
    val banded = sigs
      .select(col(idCol), posexplode(bandHashes(col("sig"), bands, rows)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")

    val cand = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("da"), col(s"b.$idCol").as("db"))
      .distinct()

    cand
      .join(sigs.select(col(idCol).as("da"), col("sig").as("siga")), "da")
      .join(sigs.select(col(idCol).as("db"), col("sig").as("sigb")), "db")
      .withColumn("est_jaccard",
        call_function("graft_sig_agree", col("siga"), col("sigb"))
          .cast("double") / numHashes)
      .filter(col("est_jaccard") >= estThreshold)
      .select(col("da"), col("db"), col("est_jaccard"))
  }

  /** The persisted-signature seam for [[ingestNearDup]]: one (`idCol`,
    * `sig`) row per doc, the MinHash signature computed by the same
    * scan-stage kernel [[minHashLsh]] uses. The incremental contract is
    * that a doc's signature is computed ONCE ever: the caller persists
    * this relation (parquet, ~300 B/doc at 32 hashes) and appends each
    * accepted batch's signatures, so daily ingest never rescans corpus
    * TEXT — at 100 TB the index is the only corpus-side input a new
    * batch touches. */
  def minHashIndex(docs: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 32, width: Int = 3): DataFrame =
    minHashSignatures(docs, textCol, idCol, width, numHashes)

  /** Incremental NEAR-dup ingest — [[ingestDedup]]'s exact-hash contract
    * lifted to MinHash-LSH similarity: accept each `batch` row only if
    * no doc of the indexed corpus and no LOWER-id batch row sits within
    * `estThreshold` estimated Jaccard (the greedy-by-id keep policy of
    * [[graft.operators.Vectors.semanticDedup]]).
    *
    * Scale shape: the corpus side is `index` = [[minHashIndex]] rows —
    * 16-byte (band, hash) keys after banding, never the corpus text —
    * and the batch (daily-scale) is signed once and persisted. Both
    * candidate joins (batch×index, batch×batch) are banded equi-joins
    * with bare-id dedup before signatures are re-attached for the
    * verify, exactly the [[minHashLsh]] economics. Judged
    * `q_ingest_neardup` via the synthetic exact-dup fixture, where the
    * accepted set is pure id arithmetic (fully oracled). */
  def ingestNearDup(index: DataFrame, batch: DataFrame, textCol: String,
      idCol: String, estThreshold: Double, numHashes: Int = 32,
      bands: Int = 8, width: Int = 3): DataFrame =
    ingestNearDupWithSigs(index, batch, textCol, idCol, estThreshold,
      numHashes, bands, width)._1

  /** [[ingestNearDup]] returning BOTH the accepted batch rows and their
    * (`idCol`, `sig`) rows — the slice of the just-computed batch
    * signatures the caller APPENDS to the persisted index, honoring
    * [[minHashIndex]]'s compute-once contract (without this seam every
    * refresh would re-sign the accepted text it already signed). */
  def ingestNearDupWithSigs(index: DataFrame, batch: DataFrame,
      textCol: String, idCol: String, estThreshold: Double,
      numHashes: Int = 32, bands: Int = 8,
      width: Int = 3): (DataFrame, DataFrame) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val bSig = Caches.persisted(
      minHashSignatures(batch, textCol, idCol, width, numHashes))
    val iSig = Caches.persisted(index.select(col(idCol), col("sig")))
    def banded(s: DataFrame) = s
      .select(col(idCol), posexplode(bandHashes(col("sig"), bands, rows)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    val bb = banded(bSig)
    def verified(cand: DataFrame, left: DataFrame, right: DataFrame) = cand
      .join(left.select(col(idCol).as("da"), col("sig").as("siga")), "da")
      .join(right.select(col(idCol).as("db"), col("sig").as("sigb")), "db")
      .filter(call_function("graft_sig_agree", col("siga"), col("sigb"))
        .cast("double") / numHashes >= estThreshold)
    // batch-vs-corpus: any verified index match rejects the batch row
    val vsIndex = verified(
      bb.alias("n").join(banded(iSig).alias("o"),
          col("n.band") === col("o.band") && col("n.bh") === col("o.bh"))
        .select(col(s"n.$idCol").as("da"), col(s"o.$idCol").as("db"))
        .distinct(),
      bSig, iSig).select(col("da").as(idCol))
    // within-batch: lower-id near-dup rejects the higher id
    val vsBatch = verified(
      bb.alias("a").join(bb.alias("b"),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
            col(s"a.$idCol") < col(s"b.$idCol"))
        .select(col(s"a.$idCol").as("da"), col(s"b.$idCol").as("db"))
        .distinct(),
      bSig, bSig).select(col("db").as(idCol))
    val rejected = vsIndex.union(vsBatch).distinct()
    (batch.join(rejected, Seq(idCol), "left_anti"),
      bSig.join(rejected, Seq(idCol), "left_anti"))
  }

  /** Benchmark decontamination: flag every `train` doc sharing at least
    * one word `width`-gram with ANY doc of the held-out `eval` set —
    * the standard pre-training hygiene pass (an eval example whose
    * n-grams leak into the training corpus inflates the benchmark; the
    * n-gram-overlap rule is the published practice of GPT-3 appendix C /
    * Gopher §A.3 / Lee et al. 2022 §6, all public).
    * Returns (idCol, n_shared) per CONTAMINATED train doc — n_shared =
    * how many distinct `width`-grams of the doc appear anywhere in the
    * eval set (the evidence a filtering run reports), ordered by caller.
    *
    * Scale shape: the eval side — benchmarks are MBs against a 100 TB
    * corpus — collapses to a distinct 8-byte-hash set computed by the
    * scan-stage [[graft.functions.ShingleKernel]] and BROADCAST: the
    * train corpus is scanned once, never shuffled, and only flagged
    * (id, hash) pairs reach the per-doc count aggregate. Hash equality
    * stands in for string equality at the usual 64-bit false-positive
    * odds (≈ |doc grams| × |eval grams| / 2^64 — negligible, and judged
    * against the string-level DuckDB oracle in `q_decontam`). */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, width: Int = 3): DataFrame = {
    val evalGrams = eval
      .select(explode(array_distinct(
        call_function("graft_shingle_hashes", col(textCol), lit(width)))).as("__h"))
      .distinct()
    train
      .select(col(idCol), explode(array_distinct(
        call_function("graft_shingle_hashes", col(textCol), lit(width)))).as("__h"))
      .join(broadcast(evalGrams), "__h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Edit-distance-1 fuzzy matching over a vocabulary — all UNORDERED
    * token pairs within Levenshtein distance 1, by deletion-neighborhood
    * blocking (the SymSpell scheme, Garbe 2012; public): every token
    * emits itself plus each single-character-deletion variant, candidates
    * are tokens sharing ANY variant, and an exact `levenshtein` check
    * removes the block's false positives. Complete by construction for
    * k = 1: a deletion partner shares the deleted form; a substitution
    * pair shares the deletion of the differing position; insertion is
    * deletion mirrored. The typo-clustering primitive behind
    * spell-normalization and fuzzy vocab merges.
    *
    * Scale: candidates travel as (xxhash64(variant), token) — 8-byte
    * block keys, the usual hash-before-shuffle discipline (a hash
    * collision can only ADD a candidate, which the exact verify then
    * rejects). Variant generation is a higher-order `transform` — the
    * interpreted-HOF rule does not bite because the input is the DISTINCT
    * VOCABULARY (orders smaller than the corpus after the map-side
    * combine), not a per-row corpus path. Wedge volume is Σ block²; a
    * pathological block (thousands of tokens one deletion apart) is a
    * length-bounded anomaly a corpus profile would surface first.
    * Judged `q_fuzzy_pairs` vs DuckDB's all-pairs levenshtein oracle on
    * a typo-injected fixture. */
  def fuzzyPairs(tokens: DataFrame, tokenCol: String): DataFrame = {
    val toks = tokens.select(col(tokenCol).as("__tok")).distinct()
    // the token itself + each single-deletion variant, as 8-byte hashes
    val t = col("__tok")
    // both sides of the block self-join — persist via the registry so
    // the corpus-wide distinct + variant generation run once, not twice
    val variants = graft.engine.Caches.persisted(
      toks.select(t, explode(array_distinct(transform(
          sequence(lit(0), length(t)),
          i => when(i === lit(0), xxhash64(t))
            .otherwise(xxhash64(concat(
              t.substr(lit(1), i - lit(1)),
              t.substr(i + lit(1), length(t)))))))).as("__v")))
    variants.as("a").join(variants.as("b"),
        col("a.__v") === col("b.__v") && col("a.__tok") < col("b.__tok"))
      .select(col("a.__tok").as("ta"), col("b.__tok").as("tb"))
      .distinct()
      .filter(levenshtein(col("ta"), col("tb")) <= 1)
  }

  /** Edit-distance-≤2 vocabulary pairing — [[fuzzyPairs]] generalized to
    * the SymSpell symmetric-delete scheme (Garbe's public algorithm):
    * block on the ≤2-DELETION neighborhood (every string reachable by
    * deleting at most two characters), then verify candidates with the
    * exact `levenshtein`. Correct by the symmetric-delete argument: each
    * of ≤2 edits costs at most one deletion on EACH side to reach a
    * common string (substitution deletes the differing char on both,
    * insertion/deletion deletes on the longer side), so any pair within
    * Levenshtein 2 shares a neighborhood entry — exact recall, and the
    * verify makes precision exact too. Emits (ta, tb, dist).
    *
    * Scale: the same discipline as [[fuzzyPairs]] — input is the
    * DISTINCT vocabulary (map-side combined, orders below the corpus),
    * neighborhoods travel as 8-byte `xxhash64` block keys (a collision
    * can only ADD a candidate the verify rejects), candidate pairs dedup
    * bare before the levenshtein touch. Neighborhood size is
    * 1 + L + C(L,2) per token — quadratic in token LENGTH (bounded ~20),
    * linear in vocabulary, vs the all-pairs oracle's quadratic blowup.
    * Judged `q_edit_pairs` vs DuckDB's all-pairs levenshtein on an
    * id-arithmetic typo fixture (both engines implement classic
    * Levenshtein — integer-exact agreement); hand distances, brute-force
    * recall equality and the L<2 edge pinned in DedupSpec. */
  def editNeighborPairs(tokens: DataFrame, tokenCol: String): DataFrame = {
    val toks = tokens.select(col(tokenCol).as("__tok")).distinct()
    val t = col("__tok")
    val n = length(t)
    // single deletions as strings (position i removed, 1-based)
    val d1 = when(n >= 1, transform(sequence(lit(1), n),
      i => concat(t.substr(lit(1), i - 1), t.substr(i + 1, n))))
      .otherwise(array())
    // double deletions: positions i < j removed from the ORIGINAL string
    val d2 = when(n >= 2, flatten(transform(sequence(lit(1), n - 1),
      i => transform(sequence(i + 1, n),
        j => concat(t.substr(lit(1), i - 1),
          t.substr(i + 1, j - i - 1), t.substr(j + 1, n))))))
      .otherwise(array())
    val variants = graft.engine.Caches.persisted(
      toks.select(t, explode(array_distinct(
        concat(array(t), d1, d2))).as("__s"))
        .select(t, xxhash64(col("__s")).as("__v")))
    variants.as("a").join(variants.as("b"),
        col("a.__v") === col("b.__v") && col("a.__tok") < col("b.__tok"))
      .select(col("a.__tok").as("ta"), col("b.__tok").as("tb"))
      .distinct()
      .withColumn("dist", levenshtein(col("ta"), col("tb")))
      .filter(col("dist") <= 2)
  }

  /** Novelty curve — the corpus-health metric behind "is new data
    * actually new": per document, how many of its distinct shingles
    * appear HERE FIRST (first = the minimum doc id carrying the
    * shingle — a deterministic ingestion-order stand-in), so
    * `n_novel / n_shingles` read per-doc novelty and the id-ordered
    * cumulative curve shows the corpus saturating. Duplicate-heavy
    * feeds collapse to near-zero novelty long before exact dedup
    * fires; this catches them upstream.
    *
    * Scale: shingles emit as 8-byte `graft_shingle_hashes` in the scan
    * (no token crosses a shuffle — the q_near_dup discipline); the
    * first-occurrence relation is one map-side-combined min per hash,
    * joined back on the hash. A hash collision can only mark a novel
    * shingle seen (odds ≈ |shingles|²/2⁶⁴ — the [[decontaminate]]
    * bound; the string-level oracle still matches because no collision
    * occurs at fixture scale). Judged `q_novelty`, fully ORACLED;
    * disjoint/duplicate/overlap hand fractions and short-doc absence
    * pinned in DedupSpec. */
  def noveltyCurve(docs: DataFrame, idCol: String, textCol: String,
      width: Int = 3): DataFrame = {
    val sh = graft.engine.Caches.persisted(
      docs.select(col(idCol).as("id"),
        explode(array_distinct(call_function("graft_shingle_hashes",
          col(textCol), lit(width)))).as("__h")))
    val first = sh.groupBy("__h").agg(min(col("id")).as("__first"))
    sh.join(first, "__h")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__first") === col("id"), 1L).otherwise(0L))
          .as("n_novel"))
  }

  /** Fellegi–Sunter record-linkage scoring — the DECISION layer over a
    * blocking candidate generator ([[sortedNeighborPairs]],
    * [[minHashLsh]], or a plain block-key join as here): candidate
    * pairs from an equi-join on the blocking key, a per-field
    * agreement weight (log-odds in milli, agree positive / disagree
    * negative — null-safe equality, so null-vs-null AGREES; route
    * nulls upstream if that's wrong for a field), the pair score their
    * sum, and the classic three-way verdict: `score ≥ upper` match,
    * `≥ lower` possible (clerical review), below dropped.
    *
    * EXACT integer end to end: indicators × literal milli weights —
    * nothing to quantize. Emits only `≥ lower` pairs (the review
    * queue), so output is match-scale, not block-pair-scale.
    *
    * Scale: one equi-join on the block key (pair space = Σ block²,
    * bounded by the caller's blocking choice — the standard ER
    * contract), field compares evaluate scan-side in the join
    * projection, no window. Judged `q_linkage` (customer vs a
    * deterministically-dirtied copy, nation blocks), fully ORACLED;
    * hand weights, null-safe agreement, threshold fences and the
    * dropped-below-lower contract pinned in DedupSpec. */
  def linkageScore(a: DataFrame, b: DataFrame, idCol: String,
      blockCol: String, fields: Seq[(String, Long, Long)],
      upperMilli: Long, lowerMilli: Long): DataFrame = {
    require(fields.nonEmpty, "at least one compare field")
    require(upperMilli >= lowerMilli, s"upper < lower: $upperMilli $lowerMilli")
    def shaped(df: DataFrame, side: String) =
      df.select((col(idCol).as(s"id_$side") +:
        col(blockCol).as(s"__blk_$side") +:
        fields.map { case (f, _, _) => col(f).as(s"__${side}_$f") }): _*)
    val score = fields.foldLeft(lit(0L)) { case (acc, (f, agree, disagree)) =>
      acc + when(col(s"__a_$f") <=> col(s"__b_$f"), lit(agree))
        .otherwise(lit(disagree))
    }
    shaped(a, "a").join(shaped(b, "b"),
        col("__blk_a") === col("__blk_b"))
      .select(col("id_a"), col("id_b"), score.as("score_milli"))
      .filter(col("score_milli") >= lowerMilli)
      .withColumn("verdict",
        when(col("score_milli") >= upperMilli, "match")
          .otherwise("possible"))
  }

  /** Sorted-neighborhood blocking (Hernández–Stolfo) — the third
    * classic entity-resolution candidate generator next to the hash
    * buckets of [[minHashLsh]] and the token grams of [[fuzzyPairs]]:
    * sort the corpus by a blocking key, slide a window of `window`
    * rows, and emit every pair that co-occurs in some window — i.e.
    * all `(a, b)` with `0 < rank(b) − rank(a) < window` under the
    * total order `(key, id)`. Catches near-matches whose representations
    * hash apart but sort together (typo'd names, off-by-one amounts),
    * with candidate count ≤ `N·(window−1)` — linear, never all-pairs.
    *
    * Scale: the exact global rank comes from [[graft.engine.Banding]]
    * band offsets (never a single-partition window); pairs join
    * rank-bucket `(rank−1) div window` to `{bucket, bucket−1}` — a
    * 2-cell equi-join (the [[Spatial.gridRadiusJoin]] shape on the
    * rank line), then the exact gap filter. Judged `q_sorted_pairs`,
    * fully ORACLED; hand windows, bucket-boundary pairs and the
    * window-1 degenerate (zero pairs) pinned in DedupSpec. */
  def sortedNeighborPairs(df: DataFrame, idCol: String, keyCol: String,
      window: Int, bands: Int = 32): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    val per = graft.engine.Caches.persisted(
      df.select(col(idCol).as("id"), col(keyCol).as("v")))
    val bounds = broadcast(per.agg(
      min(col("v")).as("__lo"), max(col("v")).as("__hi")))
    val banded = per.crossJoin(bounds)
      .withColumn("__band", graft.engine.Banding.bandAsc(
        col("v"), col("__lo"), col("__hi"), bands))
    val offsets = banded.groupBy(col("__band"))
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__or", coalesce(sum(col("__bn")).over(
        Window.orderBy(col("__band")).rowsBetween(Long.MinValue, -1)),
        lit(0L)))
      .select(col("__band"), col("__or"))
    val wB = Window.partitionBy(col("__band"))
      .orderBy(col("v"), col("id"))
    val ranked = graft.engine.Caches.persisted(
      banded.join(broadcast(offsets), "__band")
        .withColumn("__rank", col("__or") + row_number().over(wB))
        .withColumn("__bkt", expr(s"(__rank - 1) div $window"))
        .select(col("id"), col("__rank"), col("__bkt")))
    val probe = ranked.select(col("id").as("id_b"),
      col("__rank").as("__rb"),
      explode(array(col("__bkt"), col("__bkt") - 1)).as("__cell"))
    ranked.join(probe, col("__bkt") === col("__cell") &&
        col("__rank") < col("__rb") &&
        col("__rb") - col("__rank") < lit(window.toLong))
      .select(col("id").as("id_a"), col("id_b"),
        (col("__rb") - col("__rank")).as("gap"))
  }
}
