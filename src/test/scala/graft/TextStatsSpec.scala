package graft

import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Pins every field of the one-pass `graft_text_stats` kernel to the HOF
  * Column formulation it replaced (which in turn is pinned to the DuckDB
  * oracle semantics by TextOpsSpec): single-space tokenization with empty
  * tokens, codepoint lengths, marker multiplicity, and the subword regex
  * state machine, over tricky shapes (double/trailing spaces, empty text,
  * multibyte UTF-8, digits/punct runs). */
class TextStatsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox is near the old dog"),
    (2L, "a b  c d"),             // empty token from double space
    (3L, "x y z "),               // trailing empty token
    (4L, ""),                     // single empty token
    (5L, "über straße café 123 foo42bar!? der und ist"),
    (6L, "the the the a a of"),   // marker multiplicity
    (7L, "le la les et est el los las y es")) // fr + es markers
    .toDF("doc_id", "text")

  private def kernel = docs
    .select(col("doc_id"), TextOps.textStats(col("text")).as("st"))

  test("n_tokens, n_uniq, sum_chars match the HOF token formulation") {
    val k = kernel.select(col("doc_id"), col("st.n_tokens"), col("st.n_uniq"),
        col("st.sum_chars")).as[(Long, Int, Int, Long)].collect().toSet
    val r = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"), size(col("t")).as("n"),
        size(array_distinct(col("t"))).as("u"),
        aggregate(col("t"), lit(0L), (acc, x) => acc + length(x)).as("sc"))
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(k === r)
  }

  test("marker scores match markerCount for all four lexicons, with multiplicity") {
    val k = kernel.select(col("doc_id"), col("st.s_en"), col("st.s_de"),
        col("st.s_fr"), col("st.s_es"))
      .as[(Long, Int, Int, Int, Int)].collect().toSet
    val r = docs.select((col("doc_id") +:
        TextOps.langScores(TextOps.tokens(col("text")))): _*)
      .as[(Long, Int, Int, Int, Int)].collect().toSet
    assert(k === r)
    val six = k.find(_._1 == 6L).get
    assert(six._2 === 6) // the×3 + a×2 + of×1
  }

  test("n_subwords matches the regexp_extract_all formulation") {
    val k = kernel.select(col("doc_id"), col("st.n_subwords"))
      .as[(Long, Int)].collect().toSet
    val r = docs.select(col("doc_id"), TextOps.subwordCount(col("text")).as("n"))
      .as[(Long, Int)].collect().toSet
    assert(k === r)
  }

  test("n_alpha_tokens and n_symbols match their SQL-expressible definitions") {
    val tricky = Seq(
      (10L, "abc 123 x9 ### no.more... wait…now #tag ...."),
      (11L, "… .. . .... only dots"),
      (12L, ""))
      .toDF("doc_id", "text")
    val k = tricky.select(col("doc_id"), TextOps.textStats(col("text")).as("st"))
      .select(col("doc_id"), col("st.n_alpha_tokens"), col("st.n_symbols"))
      .as[(Long, Int, Int)].collect()
      .map { case (id, a, b) => id -> ((a, b)) }.toMap
    val r = tricky.select(col("doc_id"),
        size(filter(TextOps.tokens(col("text")),
          t => t.rlike("[A-Za-z]"))).as("alpha"),
        ((length(col("text")) - length(regexp_replace(col("text"), "#", ""))) +
          (length(col("text")) - length(regexp_replace(col("text"), "…", ""))) +
          size(regexp_extract_all(col("text"), lit("\\.{3,}"), lit(0)))).as("sym"))
      .as[(Long, Int, Int)].collect()
      .map { case (id, a, b) => id -> ((a, b)) }.toMap
    assert(k === r)
    // hand check doc 10: alpha tokens = abc, x9, no.more..., wait…now, #tag
    // = 5; symbols = 4×'#' (### + #tag) + 1×'…' + 2 dot-runs
    // ('...' in no.more..., '....')
    assert(k(10L) === ((5, 7)))
  }

  test("graft_gopher_pass (one-pass kernel) equals the composable gopherPredicate") {
    val d = graft.engine.Tables(spark, sfDir, "documents").select("doc_id", "text")
    val viaKernel = graft.operators.QualityFilters
      .gopherLite(d, "text", minWords = 30)
      .select("doc_id").as[Long].collect().toSet
    val viaPredicate = d
      .select(col("doc_id"), TextOps.textStats(col("text")).as("st"))
      .filter(graft.operators.QualityFilters.gopherPredicate(col("st"), 30, 100000))
      .select("doc_id").as[Long].collect().toSet
    assert(viaKernel === viaPredicate)
    assert(viaKernel.nonEmpty && viaKernel.size < d.count())
  }

  test("derived avg_len and stop_ratio equal the HOF forms") {
    val k = kernel.select(col("doc_id"),
        (col("st.sum_chars").cast("double") / col("st.n_tokens")).as("a"),
        (col("st.s_en").cast("double") / col("st.n_tokens")).as("sr"))
      .as[(Long, Double, Double)].collect()
      .map { case (id, a, sr) => id -> ((a, sr)) }.toMap
    val r = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"), TextOps.avgTokenLen(col("t")).as("a"),
        TextOps.markerRatio(col("t"), TextOps.langMarkers.head._2).as("sr"))
      .as[(Long, Double, Double)].collect()
      .map { case (id, a, sr) => id -> ((a, sr)) }.toMap
    for ((id, (a, sr)) <- r) {
      assert(math.abs(k(id)._1 - a) < 1e-12, s"avg_len doc $id")
      assert(math.abs(k(id)._2 - sr) < 1e-12, s"stop_ratio doc $id")
    }
  }

  private def lineStats(text: String): (Int, Int, Int, Int) =
    Seq(text).toDF("t")
      .select(call_function("graft_line_stats", col("t")).as("ls"))
      .select("ls.n_lines", "ls.n_bullet", "ls.n_ellipsis", "ls.n_dup")
      .as[(Int, Int, Int, Int)].collect().head

  test("graft_line_stats counts lines, bullets, ellipsis ends, duplicates") {
    // string_split(chr(10)) semantics: single-line doc = 1 line; trailing
    // newline yields a trailing empty line; empty lines count and dup.
    assert(lineStats("one line, no newline") === ((1, 0, 0, 0)))
    assert(lineStats("a\nb\nc") === ((3, 0, 0, 0)))
    assert(lineStats("a\n") === ((2, 0, 0, 0)))
    assert(lineStats("x\n\n\ny") === ((4, 0, 0, 1))) // two empty lines, one dup
    assert(lineStats("- one\n* two\n• three\nplain") === ((4, 3, 0, 0)))
    assert(lineStats("wait...\nmore…\nend.") === ((3, 0, 2, 0)))
    assert(lineStats("same\nsame\nsame\nother") === ((4, 0, 0, 2)))
    // bullet char must be the FIRST codepoint; dots inside a line no-op
    assert(lineStats(" - indented\na...b") === ((2, 0, 0, 0)))
  }

  test("graft_line_pass applies each Gopher line rule at its threshold") {
    import graft.functions.GopherRules._
    def pass(text: String): Boolean =
      Seq(text).toDF("t")
        .select(call_function("graft_line_pass", col("t")).as("p"))
        .as[Boolean].collect().head
    // 10 lines: 9 bullets (= 0.9 boundary, pass), then 10 bullets of 10 (fail)
    val nine = ((1 to 9).map(i => s"- b$i") :+ "plain").mkString("\n")
    assert(pass(nine))
    assert(!pass((1 to 10).map(i => s"- b$i").mkString("\n")))
    // ellipsis: 3 of 10 (= 0.3 boundary, pass), 4 of 10 (fail)
    def ell(k: Int) = ((1 to k).map(i => s"e$i...") ++
      (k + 1 to 10).map(i => s"p$i")).mkString("\n")
    assert(pass(ell(3)) && !pass(ell(4)))
    // duplicate lines: 3 dups of 10 (pass), 4 of 10 (fail)
    def dup(k: Int) = ((0 to k).map(_ => "d") ++
      (1 to 9 - k).map(i => s"u$i")).mkString("\n")
    assert(pass(dup(3)) && !pass(dup(4)))
    // single-line docs trivially pass (the r4 gate's implicit behavior)
    assert(pass("just one line"))
    assert(MAX_BULLET_LINE_RATIO === 0.9 && MAX_ELLIPSIS_LINE_RATIO === 0.3 &&
      MAX_DUP_LINE_FRACTION === 0.3)
  }

  test("repetitionFilter drops boilerplate, keeps varied text") {
    val varied = (1 to 40).map(i => s"word$i").mkString(" ")
    val d = Seq(
      (1L, ("spam spam " * 20).trim), // top-2-gram coverage >> 0.2
      (2L, varied))                   // all n-grams unique, tiny coverage
      .toDF("doc_id", "text")
    val kept = graft.operators.QualityFilters.repetitionFilter(d, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L))
  }

  test("graft_gopher_full_pass = word gate AND line gate") {
    // passes words, fails lines (all duplicate lines); and vice versa
    val wordsOk = (1 to 40).map(_ => "the quick brown fox is here").mkString("\n")
    val d = Seq((1L, wordsOk), (2L, "short text"), (3L,
      (1 to 40).map(i => s"the quick brown fox is here again line $i").mkString("\n")))
      .toDF("doc_id", "text")
    val full = graft.operators.QualityFilters.gopherFull(d, "text", minWords = 30)
      .select("doc_id").as[Long].collect().toSet
    assert(full === Set(3L)) // 1 fails dup-lines, 2 fails word count
  }
}
