package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Deduplication operators for the LLM-data-pipeline surface
  * (SURVEY.md §2b rows 1-2): exact dedup, exact set-similarity join
  * (prefix-filtered), and MinHash-LSH candidate generation.
  *
  * Scale stance (100 TB): never shuffle wide text when an 8-byte hash
  * carries the same grouping information; never build the all-pairs
  * product — candidates come from shared prefix shingles (guaranteed
  * recall) or shared LSH bands (probabilistic recall), both of which
  * shuffle on short keys.
  */
object Dedup {

  /** Exact dedup, hash-first: keep the minimum-id row per distinct value
    * of `textCol`.
    *
    * The groupBy key is `xxhash64(text)` — 8 bytes — so the pre-aggregation
    * and shuffle carry (hash, id) pairs instead of full documents; the
    * surviving ids are then semi-joined back to recover the full rows.
    * At 100 TB this is the difference between shuffling ~16 bytes/row and
    * shuffling the corpus. 64-bit collisions would merge distinct texts;
    * at 10^10 docs the expected collision count is ~10^20/2^65 ≈ 0.003 —
    * acceptable for corpus dedup (and deterministic for a fixed corpus).
    *
    * Same (key-hash, min-id, semi-join-back) shape as the reference's
    * `drop_duplicates()` intent (etl.py:61) lifted to wide-text inputs.
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = df
      .select(xxhash64(col(textCol)).as("__h"), col(idCol))
      .groupBy(col("__h"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Per-doc distinct shingle sets: (idCol, sh array<string>, n int).
    * Docs with no shingles (fewer than `width` tokens) are dropped — they
    * cannot reach any Jaccard threshold against a real set. */
  private def shingleSets(docs: DataFrame, textCol: String, idCol: String,
      width: Int): DataFrame =
    docs
      .select(col(idCol),
        array_distinct(TextOps.shingles(TextOps.tokens(col(textCol)), width)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("n", size(col("sh")))

  /** Canonical global shingle order for prefix filtering: by
    * (xxhash64(s), s). Hash-first ordering spreads "popular" shingles
    * uniformly so prefixes are not all the same stopword n-gram. */
  private val shingleCmp: (Column, Column) => Column = (x, y) =>
    when(xxhash64(x) < xxhash64(y), -1)
      .when(xxhash64(x) > xxhash64(y), 1)
      .when(x < y, -1).when(x > y, 1)
      .otherwise(0)

  /** Exact n-gram Jaccard similarity self-join: all pairs (a < b) with
    * `J(shingles(a), shingles(b)) >= threshold`, via AllPairs-style prefix
    * filtering (Bayardo et al., WWW'07; Chaudhuri et al., ICDE'06 —
    * public algorithms).
    *
    * Candidate generation: order each doc's shingle set by a global
    * canonical order and keep only the first `n - ceil(t*n) + 1` shingles;
    * any pair with J >= t must share a prefix shingle (overlap >= ceil(t*n)
    * on both sides), so recall is exact — this is what makes the operator
    * oracle-checkable against an all-pairs SQL join. Verification computes
    * true Jaccard on the candidates via `array_intersect` on the full sets.
    *
    * Scale: the only wide shuffle is the candidate equi-join on prefix
    * shingle strings (~(1-t) of all shingle occurrences); verification
    * joins candidate PAIRS (small) back to the per-doc sets. No all-pairs
    * product is ever formed.
    */
  def jaccardJoin(docs: DataFrame, textCol: String, idCol: String,
      threshold: Double, width: Int = 3): DataFrame = {
    val sets = shingleSets(docs, textCol, idCol, width)
    val prefixLen = (col("n") - ceil(col("n") * lit(threshold)).cast("int") + 1)
    val prefix = sets
      .select(col(idCol), col("n"),
        slice(array_sort(col("sh"), shingleCmp), lit(1), prefixLen).as("pref"))
      .select(col(idCol), explode(col("pref")).as("s"))

    val cand = prefix.alias("a")
      .join(prefix.alias("b"), col("a.s") === col("b.s") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("da"), col(s"b.$idCol").as("db"))
      .distinct()

    val verified = cand
      .join(sets.select(col(idCol).as("da"), col("sh").as("sha"), col("n").as("na")), "da")
      .join(sets.select(col(idCol).as("db"), col("sh").as("shb"), col("n").as("nb")), "db")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
    verified.select(col("da"), col("db"), col("jaccard"))
  }

  /** MinHash signature of a distinct-shingle array: `numHashes`
    * independent permutations simulated as `xxhash64(i, s)`, min per
    * permutation. Pure column expression — signatures are computed in the
    * scan stage with no shuffle. */
  def minHashSignature(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(sh, s => xxhash64(i, s))))

  /** Banded LSH over a MinHash signature: `bands` hashes, each over a
    * contiguous `rows`-slice of the signature (b x r = numHashes). */
  def bandHashes(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      j => xxhash64(lit(1), slice(sig, j * lit(rows) + 1, lit(rows))))

  /** MinHash-LSH near-dup candidates (SURVEY §2b row 2): docs sharing at
    * least one of `bands` band hashes, with the signature-estimated
    * Jaccard attached and thresholded.
    *
    * With b=8, r=4 the capture probability is 1-(1-J^4)^8: ~0.99+ at
    * J=0.9, ~0.03 at J=0.3 — the classic LSH S-curve. Estimated Jaccard =
    * fraction of agreeing signature positions. Probabilistic recall, so
    * this is judged rows-only; the exact-recall path is [[jaccardJoin]].
    *
    * Scale: candidates come from a self-equi-join on (band index, band
    * hash) — 16 bytes — after an unshuffled signature scan; near-identical
    * docs collide in almost every band, so the post-join `distinct`
    * bounds the blow-up at b x pairs.
    */
  def minHashLsh(docs: DataFrame, textCol: String, idCol: String,
      estThreshold: Double, numHashes: Int = 32, bands: Int = 8,
      width: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = shingleSets(docs, textCol, idCol, width)
      .select(col(idCol), minHashSignature(col("sh"), numHashes).as("sig"))
    val banded = sigs
      .select(col(idCol), col("sig"),
        posexplode(bandHashes(col("sig"), bands, rows)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")

    banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("da"), col(s"b.$idCol").as("db"),
        col("a.sig").as("siga"), col("b.sig").as("sigb"))
      .distinct()
      .withColumn("est_jaccard",
        size(filter(zip_with(col("siga"), col("sigb"), (x, y) => x === y),
          b => b)).cast("double") / numHashes)
      .filter(col("est_jaccard") >= estThreshold)
      .select(col("da"), col("db"), col("est_jaccard"))
  }
}
