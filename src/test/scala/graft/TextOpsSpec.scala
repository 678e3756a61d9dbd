package graft

import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Text-analysis semantics pinned to the DuckDB-equivalent contracts the
  * oracles rely on: single-space tokenization, the empty-shingle rule for
  * short docs, marker scoring/argmax tie order, and md5 fingerprints. */
class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.Dataset[T]): T = df.collect().head

  test("tokens splits on single spaces exactly (matching string_split)") {
    val out = one(Seq("a b  c").toDF("t")
      .select(TextOps.tokens(col("t")).as("x")).as[Seq[String]])
    assert(out === Seq("a", "b", "", "c")) // double space -> empty token, like DuckDB
  }

  test("chunkByTokens: sliding windows with stride overlap, short docs whole") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 tokens
      (2L, "a b"))                            // shorter than one chunk
      .toDF("doc_id", "text")
    val got = graft.functions.TextOps.chunkByTokens(docs, "text", "doc_id", 4, 3)
      .as[(Long, Int, String, Int)].collect().toSet
    assert(got === Set(
      (1L, 0, "t1 t2 t3 t4", 4),
      (1L, 1, "t4 t5 t6 t7", 4),  // stride 3 -> one-token overlap
      (1L, 2, "t7 t8 t9 t10", 4),
      (2L, 0, "a b", 2)))
    // stride == chunk (no overlap): concatenating chunks reconstructs the doc
    val rebuilt = graft.functions.TextOps
      .chunkByTokens(docs, "text", "doc_id", 4, 4)
      .orderBy("doc_id", "chunk_idx")
      .groupBy("doc_id")
      .agg(concat_ws(" ", collect_list(col("chunk_text"))).as("whole"))
      .as[(Long, String)].collect().toMap
    assert(rebuilt === Map(1L -> "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", 2L -> "a b"))
  }

  test("shingles of width 3 join consecutive tokens with spaces") {
    val out = one(Seq("a b c d").toDF("t")
      .select(TextOps.shingles(TextOps.tokens(col("t")), 3).as("x")).as[Seq[String]])
    assert(out === Seq("a b c", "b c d"))
  }

  test("shingles yields an empty array for docs shorter than the width") {
    val out = Seq("a b", "a", "").toDF("t")
      .select(TextOps.shingles(TextOps.tokens(col("t")), 3).as("x"))
      .as[Seq[String]].collect()
    assert(out.forall(_.isEmpty))
  }

  test("langPredict argmax with fixed tie order and 'und' fallback") {
    val df = Seq("the cat is here", "zzz qqq", "der la").toDF("t")
      .select((col("t") +: TextOps.langScores(TextOps.tokens(col("t")))): _*)
    val scores = TextOps.langMarkers.map { case (l, _) => l -> col(s"s_$l") }.toMap
    val out = df.select(TextOps.langPredict(scores).as("p")).as[String].collect()
    assert(out(0) === "en")
    assert(out(1) === "und")
    assert(out(2) === "de") // 1-1 tie between de and fr resolves in marker order
  }

  test("fingerprint is the md5 hex of the UTF-8 text") {
    val out = one(Seq("abc").toDF("t")
      .select(TextOps.fingerprint(col("t")).as("f")).as[String])
    assert(out === "900150983cd24fb0d6963f7d28e17f72")
  }

  test("minShingleFingerprint is the min of per-shingle md5s; null when short") {
    val out = Seq("a b c d", "a b").toDF("t")
      .select(TextOps.minShingleFingerprint(col("t")).as("f"))
      .as[Option[String]].collect()
    val expected = Seq("a b c", "b c d")
      .map(s => org.apache.commons.codec.digest.DigestUtils.md5Hex(s)).min
    assert(out(0) === Some(expected))
    assert(out(1) === None)
  }

  test("minShingleFingerprints (codegen path) agrees with the Column form") {
    val docs = Seq((1L, "a b c d e"), (2L, "x y"), (3L, "one two three"))
      .toDF("doc_id", "text")
    val colForm = docs.select(col("doc_id"),
        TextOps.minShingleFingerprint(col("text")).as("fp_shingle"))
      .as[(Long, Option[String])].collect().toSet
    val dfForm = docs.select("doc_id")
      .join(TextOps.minShingleFingerprints(docs, "text", "doc_id"),
        Seq("doc_id"), "left")
      .as[(Long, Option[String])].collect().toSet
    assert(dfForm === colForm)
  }

  test("avgTokenLen and markerRatio match hand computation") {
    val row = Seq("the cat is xx").toDF("t")
      .select(TextOps.tokens(col("t")).as("tk"))
      .select(TextOps.avgTokenLen(col("tk")).as("a"),
        TextOps.markerRatio(col("tk"), TextOps.langMarkers.head._2).as("r"))
      .as[(Double, Double)]
    val (a, r) = one(row)
    assert(math.abs(a - 10.0 / 4) < 1e-12) // lengths 3+3+2+2
    assert(math.abs(r - 2.0 / 4) < 1e-12)  // "the", "is" are markers
  }

  test("cleanText lowercases, masks URLs then emails, leaves plain text alone") {
    def clean(s: String): String = Seq(s).toDF("t")
      .select(TextOps.cleanText(col("t")).as("c")).as[String].collect().head
    assert(clean("See HTTPS://A.B/c and Bob.Smith+x@Mail.CO now") ===
      "see <url> and <email> now")
    // URL containing an @ is masked as ONE url, not an email
    assert(clean("go http://u@h.com/x here") === "go <url> here")
    assert(clean("No Links Here.") === "no links here.")
  }

  test("redactPii counts and masks emails, IPv4s and phones independently") {
    val out = one(Seq("Ping A@b.co or c.d@e.org, box 10.0.0.7, tel +1 555-867-5309 done")
      .toDF("t").select(TextOps.redactPii(col("t")).as("p"))
      .select(col("p.n_email"), col("p.n_ip"), col("p.n_phone"), col("p.clean"))
      .as[(Int, Int, Int, String)])
    assert(out === ((2, 1, 1,
      "ping <email> or <email>, box <ip>, tel <phone> done")))
    // bare NANP number (no country code) is still caught (r7 review)
    val bare = one(Seq("dial 555-867-5309 ok").toDF("t")
      .select(TextOps.redactPii(col("t")).as("p"))
      .select(col("p.n_phone"), col("p.clean")).as[(Int, String)])
    assert(bare === ((1, "dial <phone> ok")))
    // no PII -> zero counts, text only lowercased
    val none = one(Seq("Plain words only").toDF("t")
      .select(TextOps.redactPii(col("t")).as("p"))
      .select(col("p.n_email"), col("p.n_ip"), col("p.n_phone"), col("p.clean"))
      .as[(Int, Int, Int, String)])
    assert(none === ((0, 0, 0, "plain words only")))
  }

  test("dedupLines keeps each line's first occurrence in order, one row per doc") {
    val docs = Seq(
      (1L, "a\nb\na\nc\nb\na"),
      (2L, "same\nsame\nsame"),
      (3L, "only one line"))
      .toDF("doc_id", "text")
    val got = TextOps.dedupLines(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "a\nb\nc", 2L -> "same", 3L -> "only one line"))
  }

  test("stripBoilerplate drops lines in >= minDf docs, keeps order, keeps empty docs") {
    val docs = Seq(
      (1L, "keep one\ncookie banner\nkeep two"),
      (2L, "cookie banner\nunique to two"),
      (3L, "also unique\ncookie banner"),
      (4L, "cookie banner")) // every line boilerplate -> empty doc survives
      .toDF("doc_id", "text")
    val got = TextOps.stripBoilerplate(docs, "doc_id", "text", minDf = 3)
      .as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> "keep one\nkeep two", // order preserved across the dropped line
      2L -> "unique to two",
      3L -> "also unique",
      4L -> ""))
    // below the df threshold nothing is dropped
    val loose = TextOps.stripBoilerplate(docs, "doc_id", "text", minDf = 5)
      .as[(Long, String)].collect().toMap
    assert(loose(1L) === "keep one\ncookie banner\nkeep two")
  }

  test("urlDomains extracts hosts in order with multiplicity, case-folded") {
    val rows = Seq(
      (1L, "see https://A.Example.com/x and http://b.org/y?z=1 plus https://a.example.com"),
      (2L, "no urls here"),
      (3L, "ftp://not.this one"))
      .toDF("doc_id", "text")
    val got = rows.select(col("doc_id"), TextOps.urlDomains(col("text")).as("d"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) === Seq("a.example.com", "b.org", "a.example.com"))
    assert(got(2L) === Seq() && got(3L) === Seq())
  }

  test("compressionRatio: repetition compresses below prose, noise above, deterministic") {
    val prose = "the quick brown fox jumps over the lazy dog and keeps going " * 20
    val repet = "same line again " * 80
    val noise = { val rng = new scala.util.Random(42); Seq.fill(1200)(rng.nextPrintableChar()).mkString }
    val rows = Seq((1L, prose), (2L, repet), (3L, noise), (4L, ""))
      .toDF("doc_id", "text")
    def ratios = rows
      .select(col("doc_id"), TextOps.compressionRatio(col("text")).as("r"))
      .as[(Long, Double)].collect().toMap
    val r = ratios
    assert(r(2L) < r(1L), s"repetition ${r(2L)} must compress below prose ${r(1L)}")
    assert(r(1L) < r(3L), s"prose ${r(1L)} must compress below noise ${r(3L)}")
    assert(r(3L) > 0.7 && r(2L) < 0.2)
    assert(r(4L) === 2.0) // empty text: 2-byte deflate block over the 1-byte floor
    assert(ratios === r) // deterministic across plans
  }

  test("charEntropy: 0 for uniform-repeat and empty, ln(k) for k uniform chars") {
    val rows = Seq((1L, "aaaaaaaa"), (2L, "abcdabcd"), (3L, ""),
      (4L, "abababababab"))
      .toDF("doc_id", "text")
    val h = rows.select(col("doc_id"),
        TextOps.charEntropy(col("text")).as("h"))
      .as[(Long, Double)].collect().toMap
    assert(h(1L) === 0.0)
    assert(math.abs(h(2L) - math.log(4)) < 1e-12)
    assert(h(3L) === 0.0)
    assert(math.abs(h(4L) - math.log(2)) < 1e-12)
  }

  test("charEntropy: kernel is BYTE entropy; corpus ASCII-ness is load-bearing") {
    // On ASCII, byte and character entropy coincide — that identity is
    // what keeps q_char_entropy/q_corpus_report oracle-able. Pin the
    // divergence on non-ASCII ("éé" is one distinct CHAR but two
    // distinct UTF-8 BYTES, 0xC3 0xA9 → byte entropy ln 2, char 0)...
    val h = Seq((1L, "éé")).toDF("doc_id", "text")
      .select(TextOps.charEntropy(col("text"))).as[Double].head()
    assert(math.abs(h - math.log(2)) < 1e-12,
      s"byte-entropy contract changed: got $h")
    // ...and assert the harness corpus IS pure ASCII, so a fixture
    // change breaks here (and in the judged query's assert_true guard)
    // loudly rather than silently drifting the oracle compare.
    val nonAscii = graft.engine.Tables(spark, sfDir, "documents")
      .where(length(col("text")) =!= octet_length(col("text"))).count()
    assert(nonAscii === 0L, s"$nonAscii non-ASCII docs in $sfDir")
  }

  test("nfcNormalize: composes combining marks, ASCII/NFC zero-copy, idempotent") {
    val decomposed = "cafe\u0301" // 5 codepoints, NFD spelling
    val composed = "caf\u00e9"     // 4 codepoints, NFC spelling
    val rows = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"),
      (4L, "")).toDF("id", "t")
    val out = rows.select(col("id"), TextOps.nfcNormalize(col("t")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === composed, "NFD must compose to NFC")
    assert(out(2L) === composed)
    assert(out(3L) === "plain ascii")
    assert(out(4L) === "")
    // idempotent: normalizing the normalized output changes nothing
    val twice = rows.select(
      TextOps.nfcNormalize(TextOps.nfcNormalize(col("t"))).as("n"))
      .as[String].collect().toSet
    assert(twice === Set(composed, "plain ascii", ""))
    // the byte-identity that makes hash-keyed dedup work post-normalize
    assert(out(1L).getBytes("UTF-8").toSeq === out(2L).getBytes("UTF-8").toSeq)
  }

  test("canonicalUrl: rule matrix, idempotence, null for non-web input") {
    val cases = Seq(
      // lowercase scheme+host, www/default-port strip, fragment drop,
      // tracking filter, param sort, trailing-slash strip — all at once
      "HTTPS://WWW.Ex.COM:443/A/b/?b=2&a=1&utm_source=x&fbclid=z#f" ->
        Some("https://ex.com/A/b?a=1&b=2"),
      // http default port; valueless param kept; ref dropped
      "HTTP://Mirror.ORG:80/?ref=x&flag" -> Some("http://mirror.org?flag"),
      // path case preserved; non-default port preserved
      "https://ex.com:8443/Path" -> Some("https://ex.com:8443/Path"),
      // bare host; empty query vanishes entirely
      "https://ex.com/?utm_campaign=a" -> Some("https://ex.com"),
      // second '?' belongs to the first param's value, sorted intact
      "https://ex.com/p?b=1?x&a=2" -> Some("https://ex.com/p?a=2&b=1?x"),
      // not web URLs
      "ftp://ex.com/a" -> None,
      "no url here" -> None,
      "https://" -> None)
    val got = cases.map(_._1).toDF("u")
      .select(TextOps.canonicalUrl(col("u")))
      .as[Option[String]].collect().toSeq
    assert(got === cases.map(_._2))
    // canonicalization is idempotent: canon(canon(u)) == canon(u)
    val canon = cases.flatMap(_._2).toDF("u")
    val twice = canon.select(TextOps.canonicalUrl(col("u")))
      .as[String].collect().toSeq
    assert(twice === cases.flatMap(_._2))
  }

  test("unigramLmScore: common-token docs score below rare-token docs, exact nll") {
    // corpus: 8 tokens total — "the" x4, "cat" x2, "dog" x1, "zq" x1
    val docs = Seq(
      (1L, "the the the the"), // all common
      (2L, "cat cat dog"),
      (3L, "zq"))              // rare singleton
      .toDF("doc_id", "text")
    val out = TextOps.unigramLmScore(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    graft.engine.Caches.releaseAll()
    val ln = (x: Double) => math.log(x)
    assert(out(1L)._1 === 4L)
    assert(math.abs(out(1L)._2 - -ln(4.0 / 8)) < 1e-12)
    assert(math.abs(out(2L)._2 - (-(2 * ln(2.0 / 8) + ln(1.0 / 8)) / 3)) < 1e-12)
    assert(math.abs(out(3L)._2 - -ln(1.0 / 8)) < 1e-12)
    assert(out(1L)._2 < out(2L)._2 && out(2L)._2 < out(3L)._2)
  }

  test("stripHtml: tags separate words, entities decode one level, idempotent-ish") {
    val cases = Seq(
      // adjacent block tags must NOT fuse words
      "<p>alpha</p><p>beta</p>" -> "alpha beta",
      // one-level decode: &amp;lt; is the TEXT '&lt;', not '<'
      "x &amp;lt; y" -> "x &lt; y",
      "a&nbsp;b &quot;q&quot; &#39;s&#39; 1 &lt; 2 &amp; 3" ->
        "a b \"q\" 's' 1 < 2 & 3",
      // attributes with > inside quotes are out of scope (documented
      // regex baseline); plain attrs strip fine
      "<a href=\"u\" class='c'>link</a> tail" -> "link tail",
      "   no    markup\t\nhere " -> "no markup here",
      "" -> "")
    val got = cases.map(_._1).toDF("h")
      .select(TextOps.stripHtml(col("h"))).as[String].collect().toSeq
    assert(got === cases.map(_._2))
    // stripping already-clean text is a no-op (safe to run defensively) —
    // except where the output intentionally still contains an entity
    // (the one-level-decode row: a second pass decodes the next level,
    // exactly as the HTML spec intends for double-escaped text)
    val fixpoint = cases.map(_._2).filterNot(_.contains("&lt;"))
    val clean = fixpoint.toDF("h")
      .select(TextOps.stripHtml(col("h"))).as[String].collect().toSeq
    assert(clean === fixpoint)
  }

  test("oovReport counts tokens outside the vocab; all-known docs rate 0") {
    val docs = Seq((1L, "a b zz"), (2L, "a a"), (3L, "qq ww"))
      .toDF("doc_id", "text")
    val vocab = Seq("a", "b").toDF("token")
    val got = TextOps.oovReport(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((3L, 1L, 1.0 / 3)))
    assert(got(2L) === ((2L, 0L, 0.0)))
    assert(got(3L) === ((2L, 2L, 1.0)))
  }

  test("rrfFuse: rank-only fusion; a doc missing from a leg adds no term") {
    val kw = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "rank")
    val vec = Seq((2L, 1L), (3L, 2L)).toDF("doc_id", "rank")
    val got = TextOps.rrfFuse(Seq(kw, vec), "doc_id", k = 60)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got(1L) === ((1.0 / 61, 1L)))         // kw only
    assert(got(2L) === ((1.0 / 62 + 1.0 / 61, 2L))) // both legs
    assert(got(3L) === ((1.0 / 62, 1L)))         // vec only
    // k=0 degenerates to plain 1/rank
    val bare = TextOps.rrfFuse(Seq(kw), "doc_id", k = 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bare === Map(1L -> 1.0, 2L -> 0.5))
  }

  test("dsirWeights: exact smoothed log-ratio arithmetic, target shifts selection") {
    // 4 docs over 3 token classes; target is pure "aa"-domain. Buckets
    // large enough that the 3 classes land in distinct buckets (verified
    // by the arithmetic matching — a collision would break it).
    val docs = Seq(
      (1L, "aa aa"), (2L, "aa bb"), (3L, "bb bb"), (4L, "cc cc"))
      .toDF("doc_id", "text")
    val target = Seq("aa aa", "aa").toDF("text")
    val a = 0.5
    val B = 1 << 16
    val got = TextOps.dsirWeights(docs, "doc_id", "text", target, "text",
        buckets = B, smoothing = a)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // source counts: aa=3, bb=3, cc=2, total 8; target: aa=3, total 3
    def lr(ct: Double, cs: Double) =
      math.log((ct + a) / (3 + a * B)) - math.log((cs + a) / (8 + a * B))
    val wAA = lr(3, 3); val wBB = lr(0, 3); val wCC = lr(0, 2)
    assert(math.abs(got(1L) - 2 * wAA) < 1e-9)
    assert(math.abs(got(2L) - (wAA + wBB)) < 1e-9)
    assert(math.abs(got(3L) - 2 * wBB) < 1e-9)
    assert(math.abs(got(4L) - 2 * wCC) < 1e-9)
    // in-target tokens weigh ABOVE source-only tokens, and doc ranking
    // follows target-likeness: pure-aa > mixed > pure-source
    assert(wAA > wBB && got(1L) > got(2L) && got(2L) > got(3L))
    // a token absent from the target counts the same wherever it hides
    // (bb vs cc differ only through their source counts)
    assert(wBB < wCC) // cs=3 vs cs=2: rarer source class penalized less
    intercept[IllegalArgumentException](
      TextOps.dsirWeights(docs, "doc_id", "text", target, "text", buckets = 1))
    intercept[IllegalArgumentException](
      TextOps.dsirWeights(docs, "doc_id", "text", target, "text", smoothing = 0))
  }

  test("learnBpeMerges: count order, lexicographic ties, greedy rewrite, early stop") {
    // "abab" contributes (a,b)x2 + (b,a); "ab" one (a,b): (a,b) wins
    val docs = Seq((1L, "abab ab"), (2L, "ab cd")).toDF("doc_id", "text")
    val m = TextOps.learnBpeMerges(docs, "text", 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    // round 2: (ab,ab) from "abab" ties (c,d) at 1 — lexicographic
    // ascending prefers the earlier lhs string "ab"
    assert(m === Seq((0, "a", "b"), (1, "ab", "ab")))

    // tie at round 1 breaks on lhs then rhs ascending
    val tie = Seq((1L, "xy"), (2L, "ab")).toDF("doc_id", "text")
    val mt = TextOps.learnBpeMerges(tie, "text", 1)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(mt === Seq(("a", "b")))

    // exhaustion: single-char words have no pairs — fewer merges than
    // asked, not a crash or a fabricated merge
    val tiny = Seq((1L, "a b a")).toDF("doc_id", "text")
    assert(TextOps.learnBpeMerges(tiny, "text", 3).count() === 0)
    intercept[IllegalArgumentException](TextOps.learnBpeMerges(tiny, "text", 0))
  }

  test("bpeEncode: greedy left-to-right, rank order replay, lossless concat") {
    val docs = Seq((1L, "aaaaa ab"), (2L, "b")).toDF("doc_id", "text")
    val merges = Seq((0, "a", "a"), (1, "aa", "aa")).toDF("merge_rank", "lhs", "rhs")
    val got = TextOps.bpeEncode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    // a^5 -> [aa,aa,a] -> [aaaa,a]; "ab" has no applicable merge
    assert(got(1L) === Seq("aaaa", "a", "a", "b"))
    assert(got(2L) === Seq("b"))
    // lossless: concatenating tokens reproduces the whitespace-free text
    assert(got(1L).mkString === "aaaaaab")
    // empty merge table degrades to character tokens
    val none = TextOps.bpeEncode(docs, "doc_id", "text",
      Seq.empty[(Int, String, String)].toDF("merge_rank", "lhs", "rhs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(none(2L) === Seq("b") && none(1L).forall(_.length == 1))
  }

  test("bpeEncodeWord: rank-priority equals naive rank-order replay on learned tables (property)") {
    import spark.implicits._
    // the invariant under test: on a LEARNED table, a rank-r pair's
    // sides are symbols built by strictly earlier merges, so merging
    // can never create a new occurrence of a lower-rank pair — the
    // lowest rank present is always the next merge the naive full-table
    // replay would apply. Learned tables from seeded random corpora,
    // checked on words the corpus never saw.
    val rnd = new scala.util.Random(42)
    def word(len: Int): String =
      (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    for (_ <- 0 until 3) {
      val corpus = (1L to 8L).map(i =>
          (i, (0 until 4).map(_ => word(1 + rnd.nextInt(8))).mkString(" ")))
        .toDF("doc_id", "text")
      val merges = TextOps.learnBpeMerges(corpus, "text", 6)
        .orderBy("merge_rank")
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      val ranks = merges.zipWithIndex.toMap
      def naive(w: String): Seq[String] = {
        var syms: IndexedSeq[String] = w.map(_.toString).toIndexedSeq
        for ((l, r) <- merges) {
          var prev: IndexedSeq[String] = null
          while (prev != syms) { prev = syms; syms = TextOps.bpeApply(syms, l, r) }
        }
        syms
      }
      (0 until 40).map(_ => word(1 + rnd.nextInt(12))).foreach { w =>
        assert(TextOps.bpeEncodeWord(w, ranks) === naive(w),
          s"word=$w merges=$merges")
      }
    }
  }

  test("byte-level BPE: char equivalence on ASCII, multi-byte chars " +
      "seed as their bytes and merge back when frequent, no UNK") {
    import spark.implicits._
    // ASCII corpus: byte ladder == char ladder, merge for merge
    val ascii = Seq((1L, "abab ab"), (2L, "ab cd")).toDF("doc_id", "text")
    val mc = TextOps.learnBpeMerges(ascii, "text", 2)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    val mb = TextOps.learnBpeMergesBytes(ascii, "text", 2)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(mb === mc)
    val ec = TextOps.bpeEncode(ascii, "doc_id", "text",
      TextOps.learnBpeMerges(ascii, "text", 2))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    val eb = TextOps.bpeEncodeBytes(ascii, "doc_id", "text",
      TextOps.learnBpeMergesBytes(ascii, "text", 2))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(eb === ec)
    // 'é' = UTF-8 bytes 0xC3 0xA9 = latin-1 chars (Ã, ©): a corpus of
    // "éé" words earns merge 0 = (Ã, ©) — the byte pair INSIDE the
    // char, which a char-level trainer can never even see
    val c3 = "\u00c3"; val a9 = "\u00a9"
    val nonAscii = Seq((1L, "\u00e9\u00e9 \u00e9\u00e9")).toDF("doc_id", "text")
    val nm = TextOps.learnBpeMergesBytes(nonAscii, "text", 1)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(nm === Seq((c3, a9)))
    // encode with that merge: each é comes back as ONE token carrying
    // its two raw bytes — and an UNSEEN char ('ü' = 0xC3 0xBC) still
    // encodes from the byte alphabet (no UNK), sharing no token
    val probe = Seq((1L, "\u00e9\u00fc")).toDF("doc_id", "text")
    val toks = TextOps.bpeEncodeBytes(probe, "doc_id", "text",
      TextOps.learnBpeMergesBytes(nonAscii, "text", 1))
      .collect().head.getSeq[String](1).toSeq
    assert(toks === Seq(c3 + a9, c3, "\u00bc"))
    graft.engine.Caches.releaseAll()
  }

  test("fertilityReport: hand counts, encoder-agnostic, zero fences") {
    import spark.implicits._
    // 2 docs: "ab cd" -> 3 tokens, "xyz" -> 2 tokens
    val enc = Seq(
      (1L, "ab cd", Seq("a", "b", "cd")),
      (2L, "xyz", Seq("xy", "z"))).toDF("id", "text", "tokens")
    val r = TextOps.fertilityReport(enc, "text", "tokens").collect().head
    // docs 2, words 3, tokens 5, chars 8 -> fert 1666, cpt 1600
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((2L, 3L, 5L, 8L, 1666L, 1600L)))
    // empty corpus: zero counts, milli ratios null (not a crash)
    val e = TextOps.fertilityReport(
      Seq.empty[(Long, String, Seq[String])].toDF("id", "text", "tokens"),
      "text", "tokens").collect().head
    assert((e.getLong(0), e.getLong(1), e.getLong(2)) === ((0L, 0L, 0L)))
    assert(e.isNullAt(4) && e.isNullAt(5))
  }

  test("keywords: global df scores a slice; rare terms outrank common; k cuts; ties on token") {
    import spark.implicits._
    val docs = Seq(
      (1L, "rare common common common"), // doc 1: in the scored slice
      (2L, "common filler filler"),
      (3L, "common noise"),
      (4L, "common dust")).toDF("doc_id", "text")
    val got = TextOps.keywords(docs, "doc_id", "text", col("doc_id") === 1L, k = 2)
      .orderBy("rank").collect()
    assert(got.length === 2) // only doc 1 gets rows; k=2 cuts its 2 terms
    // tf("common")=3 but df=4 -> idf=0 -> score 0; "rare" df=1 wins
    assert(got(0).getAs[String]("token") === "rare")
    assert(got(0).getAs[Long]("score_milli") ===
      math.floor(math.log(4.0) * 1000.0 + 0.5).toLong)
    assert(got(1).getAs[String]("token") === "common")
    assert(got(1).getAs[Long]("score_milli") === 0L)
    // equal scores order by token: two df=1 tf=1 terms in one doc
    val tie = Seq((9L, "beta alpha"), (10L, "x")).toDF("doc_id", "text")
    val t2 = TextOps.keywords(tie, "doc_id", "text", col("doc_id") === 9L, k = 2)
      .orderBy("rank").collect()
    assert(t2.map(_.getAs[String]("token")).toSeq === Seq("alpha", "beta"))
  }

  test("sftAssemble: span-substring identity, sequence order, empty-assistant conversations") {
    val turns = Seq(
      (1L, 2L, "user", "hi"),
      (1L, 5L, "assistant", "hello there"),
      (1L, 7L, "user", "bye"),
      (1L, 9L, "assistant", "ok"),
      (2L, 1L, "user", "alone"))
      .toDF("conv", "seq", "role", "txt")
    val rows = TextOps.sftAssemble(turns, "conv", "seq", "role", "txt")
      .orderBy("conv").collect()
    val text = rows(0).getString(1)
    assert(text === "<|user|>hi<|end|><|assistant|>hello there<|end|>" +
      "<|user|>bye<|end|><|assistant|>ok<|end|>")
    val spans = rows(0).getSeq[org.apache.spark.sql.Row](2)
      .map(r => (r.getLong(0), r.getLong(1)))
    // the whole contract in one line: the spans cut exactly the
    // assistant CONTENT back out of the assembled text
    assert(spans.map { case (s0, e0) =>
      text.substring(s0.toInt, e0.toInt) } === Seq("hello there", "ok"))
    // no assistant turns: empty span list, text still assembled
    assert(rows(1).getSeq[org.apache.spark.sql.Row](2).isEmpty)
    assert(rows(1).getString(1) === "<|user|>alone<|end|>")
  }

  test("zipfFit: exact power law recovers its slope with r2 = 1; topK caps at vocab") {
    // freq = 12 / rank exactly: a x12, b x6, c x4, d x3 -> ln(freq) is
    // collinear in ln(rank) with slope -1, intercept ln 12
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextOps.zipfFit(df, "text", 100).collect().head
    assert(r.getAs[Long]("k") === 4L)
    assert(math.abs(r.getAs[Double]("slope") + 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - math.log(12.0)) < 1e-9)
    assert(r.getAs[Double]("r2") > 1.0 - 1e-9)
    // topK cuts by (freq desc, token): k=2 keeps a and b only ->
    // still exactly collinear (any 2 points are), slope -1
    val r2 = TextOps.zipfFit(df, "text", 2).collect().head
    assert(r2.getAs[Long]("k") === 2L)
    assert(math.abs(r2.getAs[Double]("slope") + 1.0) < 1e-9)
    intercept[IllegalArgumentException](TextOps.zipfFit(df, "text", 1))
  }

  test("heapsCurve: monotone growth, full-vocab endpoint, first-occurrence semantics") {
    val docs = Seq(
      (1L, "a b"), (2L, "a"), (3L, "c"), (4L, "a b"),
      (5L, "d"), (6L, "a"), (7L, "e"), (8L, "a"))
      .toDF("doc_id", "text")
    val got = TextOps.heapsCurve(docs, "doc_id", "text", 4)
      .orderBy("checkpoint").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // checkpoints of 2 docs each; a re-occurring token never re-counts
    assert(got.toSeq === Seq((0, 2L, 2L), (1, 4L, 3L), (2, 6L, 4L),
      (3, 8L, 5L)))
    // monotone by construction and the last point is the full vocab
    assert(got.map(_._3).toSeq === got.map(_._3).sorted.toSeq)
    assert(got.last._3 === 5L)
    intercept[IllegalArgumentException](
      TextOps.heapsCurve(docs, "doc_id", "text", 1))
    graft.engine.Caches.releaseAll()
  }

  test("lexicalRichness: hand hapax/Yule values, monoculture extreme") {
    import spark.implicits._
    // freqs: a=3, b=2, c=1, d=1 → N=7, types=4, hapax=2, dis=1
    // S2 = 9+4+1+1 = 15; K_milli = 1e7*(15-7)/49 = 1632653
    val got = TextOps.lexicalRichness(
      Seq("a", "a", "a", "b", "b", "c", "d").toDF("tok"), "tok")
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3)) === ((7L, 4L, 2L, 1L)))
    assert(got.getLong(4) === 571428L)   // 4e6/7
    assert(got.getLong(5) === 500L)      // 2/4
    assert(got.getLong(6) === 1632653L)
    // monoculture: TTR→0 end, K = 1e7*(N²-N)/N² ≈ 1e7·(1-1/N)
    val mono = TextOps.lexicalRichness(
      Seq.fill(10)("x").toDF("tok"), "tok").collect().head
    assert(mono.getLong(1) === 1L && mono.getLong(2) === 0L)
    assert(mono.getLong(6) === (90L * 10000000L) / 100L)
    // empty input: counts all 0 (not NULL), ratios fenced NULL
    val empty = TextOps.lexicalRichness(
      Seq.empty[String].toDF("tok"), "tok").collect().head
    assert((empty.getLong(0), empty.getLong(1), empty.getLong(2),
      empty.getLong(3)) === ((0L, 0L, 0L, 0L)))
    assert(empty.isNullAt(4) && empty.isNullAt(5) && empty.isNullAt(6))
  }

  test("readability: hand counts, headline floor, syllable ordering") {
    import spark.implicits._
    val got = TextOps.readability(Seq(
        (1L, "the cat sat. the dog ran!"),   // 6 words, 2 sentences
        (2L, "no punctuation here"),          // headline: floor to 1
        (3L, "a a a a"), (4L, "extraordinary onomatopoeia"))
      .toDF("id", "txt"), "id", "txt").orderBy("doc_id").collect()
    // doc 1: words=6 (split keeps 'sat.'), sentences=2 ('.'+'!'),
    // syllables: e-a-a-e-o-a-e-o-a → the(1) cat(1) sat(1) the(1)
    // dog(1) ran(1) = 6 vowel runs
    assert((got(0).getLong(1), got(0).getLong(2), got(0).getLong(3))
      === ((6L, 2L, 6L)))
    // flesch = 206835 - 1015*6/2 - 84600*6/6 = 206835-3045-84600
    assert(got(0).getLong(4) === 119190L)
    assert(got(1).getLong(2) === 1L)
    // 4 monosyllables score easier than 2 polysyllabic words
    assert(got(2).getLong(4) > got(3).getLong(4))
    // extraordinary: e-o-a-o-i-a-y... runs: 'e','ao','i','a','y' = 5;
    // onomatopoeia: 'o','o','a','o','oeia' = 5 → 10 total
    assert(got(3).getLong(3) === 10L)
  }

  test("pmiCollocations: attracted/repelled signs, marginal identity, " +
      "min-count drop") {
    import spark.implicits._
    // 'x y' always adjacent; 'a'/'b' never adjacent to each other
    val docs = (0 until 8).map(i => (i.toLong, "x y a x y b"))
      .toDF("doc_id", "text")
    val got = TextOps.pmiCollocations(docs, "doc_id", "text", 1L)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // bigrams per doc: (x,y) (y,a) (a,x) (x,y) (y,b) — 5 per doc
    assert(got(("x", "y"))._1 === 16L)
    // n_total = 40; left marginal of x = 16, right of y = 16
    assert(got(("x", "y"))._2 === 16L && got(("x", "y"))._3 === 16L)
    // PMI(x,y) = ln(16*40/(16*16)) = ln(2.5) > 0
    assert(got(("x", "y"))._4 === math.floor(math.log(2.5) * 1e6).toLong)
    // (y,a) observed at chance-ish: ln(8*40/(16*8)) = ln(2.5)... no:
    // y left-marginal 16, a right-marginal 8 → ln(8*40/(16*8)) = ln(2.5)
    assert(got(("y", "a"))._4 === got(("x", "y"))._4)
    // min-count drop: threshold above 8 kills the single-pair rows
    val cut = TextOps.pmiCollocations(docs, "doc_id", "text", 9L)
      .collect()
    assert(cut.map(_.getString(0)).toSet === Set("x"))
  }

  test("sftLint: valid dialog, each broken invariant isolated, " +
      "system-prefix allowance") {
    import spark.implicits._
    def lint(rows: Seq[(Long, Long, String, String)]) =
      TextOps.sftLint(rows.toDF("conv", "seq", "role", "txt"),
        "conv", "seq", "role", "txt")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3),
            r.getBoolean(4)))).toMap
    val got = lint(Seq(
      // conv 1: textbook — system prefix, u/a alternation, ends on a
      (1L, 1L, "system", "be brief"), (1L, 2L, "user", "hi"),
      (1L, 3L, "assistant", "hello"), (1L, 4L, "user", "why"),
      (1L, 5L, "assistant", "because"),
      // conv 2: ends on user
      (2L, 1L, "user", "hi"), (2L, 2L, "assistant", "yo"),
      (2L, 3L, "user", "gone"),
      // conv 3: double user turn
      (3L, 1L, "user", "a"), (3L, 2L, "user", "b"),
      (3L, 3L, "assistant", "c"),
      // conv 4: assistant speaks first
      (4L, 1L, "assistant", "hi"),
      // conv 5: blank content
      (5L, 1L, "user", "  "), (5L, 2L, "assistant", "ok")))
    assert(got(1L) === ((5L, 0L, 0L, true)))
    assert(got(2L) === ((3L, 0L, 0L, false)))
    assert(got(3L) === ((3L, 0L, 1L, false)))
    assert(got(4L) === ((1L, 0L, 0L, false)))
    assert(got(5L) === ((2L, 1L, 0L, false)))
  }

  test("sftExamples: per-assistant-turn pairs, prefix identity, " +
      "no-assistant conversations emit nothing") {
    import spark.implicits._
    val turns = Seq(
      (1L, 1L, "system", "be brief"), (1L, 2L, "user", "hi"),
      (1L, 3L, "assistant", "hello"), (1L, 4L, "user", "why"),
      (1L, 5L, "assistant", "because"),
      (2L, 1L, "user", "alone")).toDF("conv", "seq", "role", "txt")
    val got = TextOps.sftExamples(turns, "conv", "seq", "role", "txt")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getString(3)))).toMap
    val p = "<|system|>be brief<|end|><|user|>hi<|end|><|assistant|>"
    assert(got((1L, 0L)) === ((p, "hello")))
    assert(got((1L, 1L)) === ((
      p + "hello<|end|><|user|>why<|end|><|assistant|>", "because")))
    assert(!got.keySet.exists(_._1 == 2L))
    // prefix identity: context || target is a prefix of the assembly
    val full = TextOps.sftAssemble(turns, "conv", "seq", "role", "txt")
      .filter(col("conv") === 1L).collect().head.getString(1)
    got.foreach { case ((c, _), (ctx, tgt)) =>
      if (c == 1L) assert(full.startsWith(ctx + tgt)) }
  }

  test("prefPairs: extremes with deterministic tie-breaks, all-tied and " +
      "single-response prompts dropped, duplicate tie key rejected") {
    import spark.implicits._
    def pairs(rows: Seq[(Long, String, Long, Long)]) =
      TextOps.prefPairs(rows.toDF("p", "resp", "rating", "tie"),
        "p", "resp", "rating", "tie")
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getString(2), r.getLong(3), r.getLong(4),
            r.getLong(5)))).toMap
    val got = pairs(Seq(
      // prompt 1: clear separation
      (1L, "bad", 1L, 11L), (1L, "good", 5L, 12L), (1L, "mid", 3L, 13L),
      // prompt 2: max tied between tie keys 21/22 -> smallest wins;
      // min tied between 23/24 -> smallest wins
      (2L, "top-a", 4L, 21L), (2L, "top-b", 4L, 22L),
      (2L, "low-a", 2L, 23L), (2L, "low-b", 2L, 24L),
      // prompt 3: all tied -> dropped
      (3L, "x", 3L, 31L), (3L, "y", 3L, 32L),
      // prompt 4: single response -> dropped
      (4L, "only", 5L, 41L)))
    assert(got === Map(
      1L -> (("good", "bad", 5L, 1L, 3L)),
      2L -> (("top-a", "low-a", 4L, 2L, 4L))))
    // a duplicated tie key makes the pair nondeterministic: rejected
    val dup = Seq((1L, "a", 5L, 7L), (1L, "b", 1L, 7L))
    intercept[Exception](pairs(dup))
  }

  test("learnUnigramVocab: hand-EM survivors, prune tie on piece order, " +
      "char floor, the round-2 re-segmentation effect") {
    import spark.implicits._
    // the capped syllable corpus inline: 20x abab, 20x ababab,
    // 10x abq, 10x qq
    val docs = ((1 to 20).map(_ => "abab") ++ (1 to 20).map(_ => "ababab")
      ++ (1 to 10).map(_ => "abq") ++ (1 to 10).map(_ => "qq"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val v = graft.functions.TextOps.learnUnigramVocab(
      docs, "text", vocabSize = 6, maxPieceLen = 4, emRounds = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // survivors and exact counts (T = 92); logp = -floor((lnT-lnc)*1e6+.5)
    def lp(c: Long) = -math.floor(
      (math.log(92.0) - math.log(c.toDouble)) * 1e6 + 0.5).toLong
    assert(v === Map(
      "a" -> ((1L, lp(1))), "b" -> ((1L, lp(1))),   // char floor
      "ab" -> ((20L, lp(20))), "abab" -> ((40L, lp(40))),
      "abq" -> ((10L, lp(10))), "q" -> ((20L, lp(20)))))
    assert(!v.contains("qq")) // lost the count-10 prune tie to 'abq'
    // ONE round: qq was still in the round-1 vocab, so q never got
    // segmented out and keeps only the floor count — the EM round is
    // what re-estimates it to 20
    val v1 = graft.functions.TextOps.learnUnigramVocab(
      docs, "text", vocabSize = 6, maxPieceLen = 4, emRounds = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v1("q") === 1L)
    assert(v("q")._1 === 20L)
  }

  test("unigramSegment: longer-last-piece tie, fewer-pieces tie, " +
      "unknown-char fallback in encode") {
    import spark.implicits._
    // equal costs for ab and abab: 'ababab' has two 2-piece optima —
    // the tie resolves to the LONGER LAST piece
    val costs = Map("a" -> 100L, "b" -> 100L, "ab" -> 10L, "abab" -> 10L)
    assert(graft.functions.TextOps.unigramSegment("ababab", costs, 4, 9999L)
      === IndexedSeq("ab", "abab"))
    // strictly cheaper big piece: even length is all abab
    assert(graft.functions.TextOps.unigramSegment("abababab", costs, 4, 9999L)
      === IndexedSeq("abab", "abab"))
    // fewer pieces win a cost tie: [abab] (10) beats [ab, ab] (20);
    // with ab at 5 the split (10) TIES abab (10) and npieces decides
    val tie = Map("a" -> 100L, "b" -> 100L, "ab" -> 5L, "abab" -> 10L)
    assert(graft.functions.TextOps.unigramSegment("abab", tie, 4, 9999L)
      === IndexedSeq("abab"))
    // encode end-to-end: unknown char emits itself after in-vocab spans
    val vocab = Seq(("a", 1L), ("b", 1L), ("ab", 20L), ("abab", 40L),
      ("q", 20L), ("abq", 10L)).toDF("piece", "count")
    val enc = graft.functions.TextOps.unigramEncode(
      Seq((1L, "abx abababab"), (2L, "zz")).toDF("id", "text"),
      "id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(enc(1L) === Seq("ab", "x", "abab", "abab"))
    assert(enc(2L) === Seq("z", "z"))
  }

  test("luhnAudit: known card vectors, off-by-one rejection, length " +
      "gates, no-candidate doc") {
    import spark.implicits._
    // direct checksum vectors (the classic test numbers)
    val v = Seq((1L, "79927398713"), (2L, "79927398710"),
      (3L, "4532015112830366"), (4L, ""))
      .toDF("id", "s")
      .select(col("id"), graft.functions.TextOps.luhnValid(col("s")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(v(1L) && !v(2L) && v(3L) && !v(4L))
    val audit = graft.functions.TextOps.luhnAudit(Seq(
      // one valid 16-digit, its off-by-one twin, a short run (gated)
      (1L, "pay 4532015112830366 or 4532015112830367 ref 12345"),
      // 12 digits: below the PAN gate even though Luhn-valid
      (2L, "code 799273987100 end"),
      // no digits at all
      (3L, "plain words only")).toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(audit(1L) === ((2L, 1L)))
    assert(audit(2L) === ((0L, 0L)))
    assert(audit(3L) === ((0L, 0L)))
  }

  test("ibanAudit: known vector valid, check-digit off-by-one invalid, " +
      "letters-BBAN fold, shape and case gates") {
    import spark.implicits._
    // direct fold vectors
    val v = Seq((1L, "DE68210501700012345678"),   // valid (mod-97 = 1)
      (2L, "DE69210501700012345678"),             // off-by-one check
      (3L, "GB82WEST12345678901234"))             // letters fold, mod 25
      .toDF("id", "s")
      .select(col("id"), graft.functions.TextOps.ibanValid(col("s")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(v(1L) && !v(2L) && !v(3L))
    val audit = graft.functions.TextOps.ibanAudit(Seq(
      (1L, "pay DE68210501700012345678 now"),
      (2L, "pay DE69210501700012345678 now"),
      // letters in the BBAN still a CANDIDATE (shape allows), invalid
      (3L, "ref GB82WEST12345678901234 thanks"),
      // too short for the shape gate; lowercase never extracted
      (4L, "short DE12ABC and de68210501700012345678"),
      (5L, "plain words only")).toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(audit(1L) === ((1L, 1L)))
    assert(audit(2L) === ((1L, 0L)))
    assert(audit(3L) === ((1L, 0L)))
    assert(audit(4L) === ((0L, 0L)))
    assert(audit(5L) === ((0L, 0L)))
  }

  test("fimTransform: PSM assembly, reassembly identity, clamping, " +
      "swapped bounds, empty spans") {
    import spark.implicits._
    def fim(rows: Seq[(Long, String, Long, Long)]) =
      graft.functions.TextOps.fimTransform(
        rows.toDF("id", "text", "s", "e"), "id", "text", "s", "e")
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
    val got = fim(Seq(
      (1L, "0123456789", 3L, 7L),   // plain split
      (2L, "0123456789", -5L, 99L), // clamps to [0, len]
      (3L, "0123456789", 7L, 3L),   // swapped -> reordered
      (4L, "0123456789", 4L, 4L),   // empty middle
      (5L, "", 3L, 7L)))            // empty doc
    assert(got(1L) === (("<PRE>012<SUF>789<MID>3456", 3L, 4L, 3L)))
    assert(got(2L) === (("<PRE><SUF><MID>0123456789", 0L, 10L, 0L)))
    assert(got(3L) === got(1L)) // least/greatest reorder
    assert(got(4L) === (("<PRE>0123<SUF>456789<MID>", 4L, 0L, 6L)))
    assert(got(5L) === (("<PRE><SUF><MID>", 0L, 0L, 0L)))
    // reassembly identity: prefix + middle + suffix = original
    val r1 = got(1L)._1
    val pre = r1.substring(5, 5 + 3)
    val suf = r1.substring(5 + 3 + 5, 5 + 3 + 5 + 3)
    val mid = r1.substring(5 + 3 + 5 + 3 + 5)
    assert(pre + mid + suf === "0123456789")
  }

  test("unigramScore: piece-cost arithmetic, unk penalty dominates, " +
      "empty-doc null mean") {
    import spark.implicits._
    val vocab = Seq(("a", 1L), ("b", 1L), ("ab", 20L), ("abab", 40L),
      ("q", 20L), ("abq", 10L)).toDF("piece", "count")
    def cost(c: Long) = math.floor(
      (math.log(92.0) - math.log(c.toDouble)) * 1e6 + 0.5).toLong
    val unk = math.floor(math.log(92.0) * 1e6 + 0.5).toLong + 1000000L
    val got = graft.functions.TextOps.unigramScore(
      Seq((1L, "abab abab"), (2L, "zz"), (3L, "")).toDF("id", "text"),
      "id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got(1L) === ((2L, 2 * cost(40), cost(40))))
    assert(got(2L) === ((2L, 2 * unk, unk)))
    assert(got(3L) === ((0L, 0L, -1L)))
    assert(got(2L)._3 > got(1L)._3) // out-of-domain text costs more
  }

  test("blocklistReport: threshold boundary, multiplicity, case folding, " +
      "domain gate, empty lists pass everything") {
    import spark.implicits._
    val docs = Seq(
      // 10 tokens, 0 bad: passes at any threshold
      (1L, "a b c d e f g h i j", "https://ok.example.com/x"),
      // 10 tokens, 1 bad (case-folded BAD vs list 'bad'): 100 milli
      (2L, "BAD b c d e f g h i j", "https://ok.example.com/x"),
      // 10 tokens, 2 bad WITH multiplicity: 200 milli
      (3L, "bad bad c d e f g h i j", "https://ok.example.com/x"),
      // clean text, blocked domain (case-folded in the LIST)
      (4L, "a b c", "https://Evil.example.com/x"),
      // exactly AT the threshold: 1/10 = 100 milli passes at 100
      (5L, "bad b c d e f g h i j", "http://ok.example.com")
    ).toDF("id", "text", "url")
    val bad = Seq("bad", "UNUSED").toDF("w")
    val dom = Seq("EVIL.example.com").toDF("d")
    def run(maxMilli: Long) =
      graft.operators.QualityFilters.blocklistReport(
        docs, "id", "text", "url", bad, dom, maxMilli)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3),
            r.getBoolean(4), r.getBoolean(5)))).toMap
    val got = run(100L)
    assert(got(1L) === ((10L, 0L, 0L, false, true)))
    assert(got(2L) === ((10L, 1L, 100L, false, true))) // at threshold
    assert(got(3L) === ((10L, 2L, 200L, false, false)))
    assert(got(4L) === ((3L, 0L, 0L, true, false)))
    assert(got(5L) === ((10L, 1L, 100L, false, true)))
    // C4's actual rule: any occurrence drops
    val strict = run(0L)
    assert(strict(2L)._5 === false && strict(1L)._5 === true)
    // empty policy relations gate nothing
    val open = graft.operators.QualityFilters.blocklistReport(
      docs, "id", "text", "url",
      Seq.empty[String].toDF("w"), Seq.empty[String].toDF("d"), 0L)
      .collect()
    assert(open.forall(_.getBoolean(5)))
  }
}
