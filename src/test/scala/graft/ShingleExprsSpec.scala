package graft

import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Pins the native shingle-kernel expressions to their load-bearing
  * contracts: hash values bit-identical to Spark's `xxhash64` over the
  * shingle STRING (what keeps every judged dedup output stable across the
  * window→kernel rewrite), string output identical to the HOF `shingles`
  * Column form, and the sketch expressions identical to their previous
  * aggregate formulations. */
class ShingleExprsSpec extends SparkTestBase {
  import spark.implicits._

  // Assorted shapes: normal, double space (empty token), trailing space,
  // exactly-width, shorter-than-width, empty, multibyte UTF-8.
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a b  c d"),
    (3L, "x y z "),
    (4L, "one two three"),
    (5L, "a b"),
    (6L, ""),
    (7L, "über straße café naïve übung"))
    .toDF("doc_id", "text")

  test("graft_shingle_hashes equals xxhash64 of the concat_ws shingle string") {
    val kernel = docs.select(col("doc_id"),
        explode(call_function("graft_shingle_hashes", col("text"), lit(3))).as("h"))
      .as[(Long, Long)].collect().toVector.sorted
    val reference = docs.select(col("doc_id"),
        explode(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
      .as[(Long, Long)].collect().toVector.sorted
    assert(kernel === reference)
    assert(kernel.nonEmpty)
  }

  test("graft_shingles equals the HOF shingles Column form, in order") {
    val kernel = docs.select(col("doc_id"),
        call_function("graft_shingles", col("text"), lit(3)).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    val reference = docs.select(col("doc_id"),
        TextOps.shingles(TextOps.tokens(col("text")), 3).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(kernel === reference)
    assert(kernel(5L).isEmpty && kernel(6L).isEmpty) // short docs: empty array
  }

  test("graft_simhash equals the sign-of-bit-sums of the shingle hashes; null when short") {
    val fps = docs.select(col("doc_id"),
        call_function("graft_simhash", col("text"), lit(3)).as("fp"))
      .as[(Long, Option[Long])].collect().toMap
    val hashes = docs.select(col("doc_id"),
        explode(call_function("graft_shingle_hashes", col("text"), lit(3))).as("h"))
      .as[(Long, Long)].collect().groupBy(_._1)
    for ((id, hs) <- hashes) {
      var expected = 0L
      for (j <- 0 until 64) {
        val s = hs.map { case (_, h) => if (((h >>> j) & 1L) == 1L) 1 else -1 }.sum
        if (s > 0) expected |= (1L << j)
      }
      assert(fps(id) === Some(expected), s"doc $id")
    }
    assert(fps(5L) === None && fps(6L) === None)
  }

  test("randomized corpus: kernel shingles equal the sliding-window reference") {
    // 200 seeded random docs over an alphabet with multibyte chars, empty
    // tokens (consecutive spaces), and boundary whitespace — the kernel's
    // byte-scan tokenization must equal split-on-space + sliding window
    // for every one of them.
    val rnd = new scala.util.Random(20260812L)
    val alphabet = Vector("a", "bb", "ccc", "Ü", "日本", "x1", "", "?!", "longtokenword")
    val corpus = (0 until 200).map { i =>
      val n = rnd.nextInt(12)
      (i.toLong, Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
    }
    val df = corpus.toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        call_function("graft_shingles", col("text"), lit(3)).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    for ((id, text) <- corpus) {
      val toks = text.split(" ", -1).toSeq
      val expected =
        if (toks.length < 3) Seq.empty else toks.sliding(3).map(_.mkString(" ")).toSeq
      assert(got(id) === expected, s"doc $id text='$text'")
    }
  }

  test("graft_sig_agree counts agreeing positions (the MinHash estimator numerator)") {
    val rows = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 4L), 3),
      (Seq(1L, 2L), Seq(1L, 2L), 2),
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L), 0))
      .toDF("a", "b", "expected")
    val got = rows.select(
        call_function("graft_sig_agree", col("a"), col("b")).as("n"),
        col("expected"))
      .as[(Int, Int)].collect()
    assert(got.forall { case (n, e) => n == e })
  }

  test("graft_minhash equals min(xxhash64(i, h)) per position; null when short") {
    val k = 8
    val sigs = docs.select(col("doc_id"),
        call_function("graft_minhash", col("text"), lit(3), lit(k)).as("sig"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    val reference = docs.select(col("doc_id"),
        explode(call_function("graft_shingle_hashes", col("text"), lit(3))).as("h"))
      .groupBy("doc_id")
      .agg(array((0 until k).map(i => min(xxhash64(lit(i), col("h")))): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    for ((id, sig) <- reference) assert(sigs(id) === Some(sig), s"doc $id")
    assert(sigs(5L) === None && sigs(6L) === None)
  }

  test("graft_rep_frac: top n-gram character coverage, hand-computed") {
    def frac(text: String, n: Int): Double = Seq(text).toDF("t")
      .select(call_function("graft_rep_frac", col("t"), lit(n)).as("f"))
      .as[Double].collect().head
    // "a b a b c" (9 codepoints): 2-gram "a b" occurs 2x, 3 chars -> 6/9;
    // all 3-grams unique, 5 chars -> 5/9; all 4-grams unique, 7 chars -> 7/9
    assert(math.abs(frac("a b a b c", 2) - 6.0 / 9) < 1e-12)
    assert(math.abs(frac("a b a b c", 3) - 5.0 / 9) < 1e-12)
    assert(math.abs(frac("a b a b c", 4) - 7.0 / 9) < 1e-12)
    // multibyte: codepoints, not bytes — "é é x" top-2-gram "é é" 2x? no,
    // occurs once (3 cp); "é é" vs "é x": max cov = 3 -> 3/5
    assert(math.abs(frac("é é x", 2) - 3.0 / 5) < 1e-12)
    // short/empty docs
    assert(frac("x", 2) === 0.0)
    assert(frac("", 2) === 0.0)
    // overlapping occurrences each count: "spam spam spam" 2-gram
    // "spam spam" 2x, 9 chars -> 18/14 (> 1 by design; a statistic, not
    // a probability)
    assert(math.abs(frac("spam spam spam", 2) - 18.0 / 14) < 1e-12)
  }
}
