package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text statistics kernel: everything the quality/lang-ID scoring
  * surface needs, computed in a single scan over the document's UTF-8
  * bytes inside whole-stage codegen.
  *
  * Why: the Column formulations (`aggregate`/`filter` higher-order
  * functions in TextOps) evaluate their lambdas INTERPRETED — documented at
  * TextOps.scala as "acceptable for bounded per-token scoring", but still
  * the dominant cost of `q_text_quality` / `q_lang_id` / `q_curate`'s
  * quality gate once the shingle family moved to native kernels. This is
  * the same escalation as [[ShingleKernel]]: per-row, scan-stage, zero
  * shuffles, and a spec (TextStatsSpec) pins each field to the HOF/oracle
  * formulation it replaces.
  *
  * Field semantics (bit-compatible with the DuckDB oracle forms):
  *  - n_tokens: `len(string_split(text, ' '))` — single-space split, empty
  *    tokens preserved, so always ≥ 1 (empty text has one empty token).
  *  - n_uniq: `len(list_distinct(tokens))` — distinct by exact bytes.
  *  - sum_chars: Σ token length in CODEPOINTS (= `list_aggregate(
  *    list_transform(t, x -> length(x)), 'sum')`); equals codepoints(text)
  *    minus the separator spaces.
  *  - s_en/s_de/s_fr/s_es: marker-token hit counts WITH multiplicity, the
  *    [[TextOps.langMarkers]] lexicons in fixed order.
  *  - n_subwords: matches of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` — letter
  *    runs, digit runs, single non-ASCII-alnum non-whitespace codepoints
  *    (multibyte chars count once: continuation bytes don't advance the
  *    state machine).
  *  - n_alpha_tokens: tokens containing at least one ASCII letter (the
  *    Gopher "words with an alphabetic character" rule).
  *  - n_symbols: `#` chars + `…` codepoints + maximal runs of ≥3 dots
  *    (`\.{3,}` non-overlapping matches) — the Gopher symbol-to-word
  *    numerator.
  */
object TextStatsKernel {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_uniq", IntegerType, nullable = false),
    StructField("sum_chars", LongType, nullable = false),
    StructField("s_en", IntegerType, nullable = false),
    StructField("s_de", IntegerType, nullable = false),
    StructField("s_fr", IntegerType, nullable = false),
    StructField("s_es", IntegerType, nullable = false),
    StructField("n_subwords", IntegerType, nullable = false),
    StructField("n_alpha_tokens", IntegerType, nullable = false),
    StructField("n_symbols", IntegerType, nullable = false)
  ))

  /** Marker lexicons as UTF-8 bytes, [lang][word] in
    * [[TextOps.langMarkers]] order (en, de, fr, es). */
  private val markers: Array[Array[Array[Byte]]] =
    TextOps.langMarkers.map { case (_, ws) =>
      ws.map(_.getBytes("UTF-8")).toArray
    }.toArray

  private def isLetter(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  private def isAsciiWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d
  private def isContinuation(b: Byte): Boolean = (b & 0xc0) == 0x80

  private def tokenEquals(b: Array[Byte], from: Int, len: Int, w: Array[Byte]): Boolean = {
    if (len != w.length) return false
    var i = 0
    while (i < len) { if (b(from + i) != w(i)) return false; i += 1 }
    true
  }

  def textStats(s: UTF8String): InternalRow = {
    val b = s.getBytes
    var nSpaces = 0
    var codepoints = 0L
    // subword state machine
    var nSub = 0
    var inLetters = false
    var inDigits = false
    var nSymbols = 0
    var dotRun = 0
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (!isContinuation(c)) {
        codepoints += 1L
        if (c == 0x20) nSpaces += 1
        if (isLetter(c)) {
          if (!inLetters) nSub += 1
          inLetters = true; inDigits = false
        } else if (isDigit(c)) {
          if (!inDigits) nSub += 1
          inDigits = true; inLetters = false
        } else if (isAsciiWs(c)) {
          inLetters = false; inDigits = false
        } else {
          nSub += 1
          inLetters = false; inDigits = false
        }
        if (c == '#') nSymbols += 1
        // '…' is E2 80 A6; the lead byte check + two continuations
        if ((c & 0xff) == 0xe2 && i + 2 < b.length &&
            (b(i + 1) & 0xff) == 0x80 && (b(i + 2) & 0xff) == 0xa6) nSymbols += 1
        if (c == '.') dotRun += 1
        else { if (dotRun >= 3) nSymbols += 1; dotRun = 0 }
      }
      i += 1
    }
    if (dotRun >= 3) nSymbols += 1
    val nTokens = nSpaces + 1
    val sumChars = codepoints - nSpaces

    // token pass: distinct set + marker hits + alpha-token count
    val seen = new java.util.HashSet[UTF8String](Math.max(16, nTokens * 2))
    val hits = new Array[Int](markers.length)
    var nAlpha = 0
    var start = 0
    var t = 0
    while (t < nTokens) {
      var end = start
      var hasAlpha = false
      while (end < b.length && b(end) != 0x20) {
        if (isLetter(b(end))) hasAlpha = true
        end += 1
      }
      if (hasAlpha) nAlpha += 1
      val len = end - start
      seen.add(UTF8String.fromBytes(b, start, len))
      var l = 0
      while (l < markers.length) {
        val ws = markers(l)
        var w = 0
        while (w < ws.length) {
          if (tokenEquals(b, start, len, ws(w))) hits(l) += 1
          w += 1
        }
        l += 1
      }
      start = end + 1
      t += 1
    }
    new GenericInternalRow(Array[Any](nTokens, seen.size(), sumChars,
      hits(0), hits(1), hits(2), hits(3), nSub, nAlpha, nSymbols))
  }

  /** The full Gopher-lite gate in one pass — see [[GopherPass]]. Field
    * indexes follow [[schema]]. */
  def gopherPass(s: UTF8String, minWords: Int, maxWords: Int): Boolean = {
    import GopherRules._
    val r = textStats(s)
    val n = r.getInt(0)
    if (n < minWords || n > maxWords) return false
    val meanLen = r.getLong(2).toDouble / n
    meanLen >= MIN_MEAN_WORD_LEN && meanLen <= MAX_MEAN_WORD_LEN &&
      r.getInt(9).toDouble / n <= MAX_SYMBOL_RATIO &&
      r.getInt(8).toDouble / n >= MIN_ALPHA_FRACTION &&
      r.getInt(3) >= MIN_STOPWORD_HITS
  }
}

object GopherRules {
  /** Gopher rule thresholds (Rae et al. 2021, Table A1 subset) — shared
    * by the [[GopherPass]] kernel and the composable Column predicate in
    * `operators.QualityFilters` so the two formulations cannot drift. */
  val MIN_MEAN_WORD_LEN = 3.0
  val MAX_MEAN_WORD_LEN = 10.0
  val MAX_SYMBOL_RATIO = 0.1
  val MIN_ALPHA_FRACTION = 0.8
  val MIN_STOPWORD_HITS = 2
  /** Line-shape thresholds (Rae et al. 2021, Table A1 — the rules the r4
    * gate omitted because the harness corpus is single-line): discard when
    * more than 90% of lines start with a bullet, more than 30% end with an
    * ellipsis, or more than 30% of lines are duplicates of another line. */
  val MAX_BULLET_LINE_RATIO = 0.9
  val MAX_ELLIPSIS_LINE_RATIO = 0.3
  val MAX_DUP_LINE_FRACTION = 0.3
  /** Repetition thresholds (Rae et al. 2021, Table A1): discard when the
    * most frequent word n-gram covers more than this fraction of the
    * document's characters. */
  val MAX_TOP_2GRAM_CHAR_FRAC = 0.20
  val MAX_TOP_3GRAM_CHAR_FRAC = 0.18
  val MAX_TOP_4GRAM_CHAR_FRAC = 0.16
}

/** One-pass line-shape statistics: everything the Gopher line rules need,
  * computed in a single scan over the document's UTF-8 bytes (same
  * escalation as [[TextStatsKernel]] — per-row, scan-stage, zero shuffle).
  *
  * Lines are maximal runs between 0x0a bytes, `string_split(text,
  * chr(10))` semantics: empty lines count, a trailing newline yields a
  * trailing empty line, and a document with no newline is one line.
  * Field semantics (bit-compatible with the DuckDB oracle forms):
  *  - n_lines: `len(string_split(text, chr(10)))`.
  *  - n_bullet: lines whose first codepoint is `-`, `*`, or `•` (U+2022).
  *  - n_ellipsis: lines ending with `...` (three dots) or `…` (U+2026).
  *  - n_dup: n_lines − distinct lines (by exact bytes) — the duplicate-
  *    line count of the Gopher duplicate-line-fraction rule.
  */
object LineStatsKernel {

  val schema: StructType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_bullet", IntegerType, nullable = false),
    StructField("n_ellipsis", IntegerType, nullable = false),
    StructField("n_dup", IntegerType, nullable = false)
  ))

  def lineStats(s: UTF8String): InternalRow = {
    val b = s.getBytes
    var nLines = 0
    var nBullet = 0
    var nEllipsis = 0
    val seen = new java.util.HashSet[UTF8String]()
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == 0x0a) {
        val len = i - start
        nLines += 1
        if (len > 0) {
          val c = b(start)
          // bullet: '-', '*', or '•' (E2 80 A2)
          if (c == '-' || c == '*' ||
              ((c & 0xff) == 0xe2 && len >= 3 &&
                (b(start + 1) & 0xff) == 0x80 && (b(start + 2) & 0xff) == 0xa2))
            nBullet += 1
          // ellipsis end: "..." or '…' (E2 80 A6)
          val e = start + len
          if ((len >= 3 && b(e - 1) == '.' && b(e - 2) == '.' && b(e - 3) == '.') ||
              (len >= 3 && (b(e - 3) & 0xff) == 0xe2 &&
                (b(e - 2) & 0xff) == 0x80 && (b(e - 1) & 0xff) == 0xa6))
            nEllipsis += 1
        }
        seen.add(UTF8String.fromBytes(b, start, len))
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nLines, nBullet, nEllipsis,
      nLines - seen.size()))
  }

  /** The line-shape gate alone (see [[GopherRules]] line thresholds);
    * single-line docs trivially pass every rule except a lone bullet /
    * ellipsis line, mirroring the published intent. */
  def linePass(s: UTF8String): Boolean = {
    import GopherRules._
    val r = lineStats(s)
    val n = r.getInt(0).toDouble
    r.getInt(1) <= MAX_BULLET_LINE_RATIO * n &&
      r.getInt(2) <= MAX_ELLIPSIS_LINE_RATIO * n &&
      r.getInt(3) <= MAX_DUP_LINE_FRACTION * n
  }

  /** The COMPLETE Gopher gate: word-level rules ([[TextStatsKernel
    * .gopherPass]]) AND line-shape rules, still one kernel invocation per
    * document (two byte passes inside). */
  def gopherFullPass(s: UTF8String, minWords: Int, maxWords: Int): Boolean =
    TextStatsKernel.gopherPass(s, minWords, maxWords) && linePass(s)
}

/** `graft_line_stats(text)` → struct — see [[LineStatsKernel]]. */
case class LineStats(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = LineStatsKernel.schema
  override def prettyName: String = "graft_line_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(t: Any): Any =
    LineStatsKernel.lineStats(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.LineStatsKernel.lineStats($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_line_pass(text)` → boolean: the Gopher line-shape gate in one
  * kernel pass (same single-entry-point rationale as [[GopherPass]]). */
case class LinePass(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_line_pass"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(t: Any): Any =
    LineStatsKernel.linePass(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.LineStatsKernel.linePass($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_gopher_full_pass(text, minWords, maxWords)` → boolean: word AND
  * line rules — the complete Gopher gate for multi-line corpora. */
case class GopherFullPass(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with Serializable {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_gopher_full_pass"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == IntegerType &&
        third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, int, int), got " +
        Seq(first, second, third).map(_.dataType.simpleString).mkString("(", ", ", ")"))

  override protected def nullSafeEval(t: Any, lo: Any, hi: Any): Any =
    LineStatsKernel.gopherFullPass(t.asInstanceOf[UTF8String],
      lo.asInstanceOf[Int], hi.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, lo, hi) =>
      s"${ev.value} = graft.functions.LineStatsKernel.gopherFullPass($t, $lo, $hi);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** `graft_gopher_pass(text, minWords, maxWords)` → boolean: the whole
  * Gopher-lite quality gate in ONE kernel pass. Exists because a filter
  * over `graft_text_stats(text).field` conjuncts gets the struct
  * expression substituted per conjunct when Catalyst pushes the predicate
  * through the projection — up to ~11 full text scans per document;
  * this expression restores the one-pass contract. */
case class GopherPass(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with Serializable {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_gopher_pass"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == IntegerType &&
        third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, int, int), got " +
        Seq(first, second, third).map(_.dataType.simpleString).mkString("(", ", ", ")"))

  override protected def nullSafeEval(t: Any, lo: Any, hi: Any): Any =
    TextStatsKernel.gopherPass(t.asInstanceOf[UTF8String],
      lo.asInstanceOf[Int], hi.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, lo, hi) =>
      s"${ev.value} = graft.functions.TextStatsKernel.gopherPass($t, $lo, $hi);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** `graft_text_stats(text)` → struct — see [[TextStatsKernel]]. */
case class TextStats(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = TextStatsKernel.schema
  override def prettyName: String = "graft_text_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(t: Any): Any =
    TextStatsKernel.textStats(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextStatsKernel.textStats($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStatsExprs {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_text_stats"),
      new ExpressionInfo(classOf[TextStats].getName, "graft_text_stats"),
      (c: Seq[Expression]) => TextStats(c.head)),
    (FunctionIdentifier("graft_gopher_pass"),
      new ExpressionInfo(classOf[GopherPass].getName, "graft_gopher_pass"),
      (c: Seq[Expression]) => GopherPass(c.head, c(1), c(2))),
    (FunctionIdentifier("graft_line_stats"),
      new ExpressionInfo(classOf[LineStats].getName, "graft_line_stats"),
      (c: Seq[Expression]) => LineStats(c.head)),
    (FunctionIdentifier("graft_line_pass"),
      new ExpressionInfo(classOf[LinePass].getName, "graft_line_pass"),
      (c: Seq[Expression]) => LinePass(c.head)),
    (FunctionIdentifier("graft_gopher_full_pass"),
      new ExpressionInfo(classOf[GopherFullPass].getName, "graft_gopher_full_pass"),
      (c: Seq[Expression]) => GopherFullPass(c.head, c(1), c(2)))
  )
}
