package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The built-in formulation — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
  * evaluates INTERPRETED (higher-order functions don't participate in
  * whole-stage codegen) and allocates an intermediate array per row. This
  * expression generates a tight primitive loop instead (SURVEY §7.3: the
  * "custom Expression w/ codegen only if bench demands" escalation —
  * bench demanded: the brute-force vector join evaluates one dot per
  * candidate pair, the hottest scalar in the §2b surface).
  *
  * Semantics: null if either array is null; arrays are read positionally
  * up to the SHORTER length (callers validate widths — see
  * Vectors.annTopK's fail-fast guard); elements are assumed non-null
  * (the embedding contract — float vectors have no null components).
  * Callers cast float vectors to array<double> at the scan (all judged
  * vector queries already do).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization encode kernel: `graft_pq_encode(vec, book, m)` →
  * `array<int>` of `m` codes, one per contiguous subspace of `vec`.
  *
  * `book` is the FLAT codebook `array<double>` of length `K × dim`
  * (subspace-major: centroid c of subspace s starts at `(s·K + c)·ds`,
  * `ds = dim / m`, `K` derived as `len(book) / dim`); it is a foldable
  * literal in practice — corpus metadata, KB-scale. Each code is the
  * argmin-L2 centroid, computed as `‖c‖² − 2·x_s·c` (the `‖x_s‖²` term is
  * constant per subspace and cannot change the argmin); ties break to the
  * LOWEST centroid index, matching the when-chain this kernel replaced.
  *
  * Why a kernel and not composed builtins: the composed form needed
  * `m × K` dot-product expressions under a `least` plus a `K`-branch
  * CASE WHEN per subspace — ~256 expression nodes per encode call whose
  * analysis/codegen cost dominated q_vec_pq's wall time at small SF
  * (13.9s for a 2000-row corpus; the CLAUDE.md "kernel over HOF/tree"
  * rule). One expression node generates one tight loop instead. */
case class PqEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(first, second).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }) && third.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode expects (array<double>, array<double>, int), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(v: Any, b: Any, m: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val book = b.asInstanceOf[ArrayData]
    val sub = m.asInstanceOf[Int]
    val dim = vec.numElements()
    val ds = dim / sub
    val k = book.numElements() / dim
    val codes = new Array[Int](sub)
    var s = 0
    while (s < sub) {
      var best = Double.PositiveInfinity; var bi = 0; var c = 0
      while (c < k) {
        val off = (s * k + c) * ds
        var d = 0.0; var j = 0
        while (j < ds) {
          val cv = book.getDouble(off + j)
          d += cv * cv - 2.0 * vec.getDouble(s * ds + j) * cv
          j += 1
        }
        if (d < best) { best = d; bi = c }
        c += 1
      }
      codes(s) = bi
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b, m) => {
      val dim = ctx.freshName("dim"); val ds = ctx.freshName("ds")
      val k = ctx.freshName("k"); val codes = ctx.freshName("codes")
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val j = ctx.freshName("j"); val best = ctx.freshName("best")
      val bi = ctx.freshName("bi"); val d = ctx.freshName("d")
      val off = ctx.freshName("off"); val cv = ctx.freshName("cv")
      s"""
         |int $dim = $v.numElements();
         |int $ds = $dim / $m;
         |int $k = $b.numElements() / $dim;
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double $best = Double.POSITIVE_INFINITY; int $bi = 0;
         |  for (int $c = 0; $c < $k; $c++) {
         |    int $off = ($s * $k + $c) * $ds;
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $ds; $j++) {
         |      double $cv = $b.getDouble($off + $j);
         |      $d += $cv * $cv - 2.0 * $v.getDouble($s * $ds + $j) * $cv;
         |    }
         |    if ($d < $best) { $best = $d; $bi = $c; }
         |  }
         |  $codes[$s] = $bi;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Asymmetric-distance lookup table: `graft_pq_lut(qvec, book, m)` →
  * FLAT `array<double>` of length `m × K` where entry `s·K + c` is the
  * dot product of the query's subspace-`s` slice with centroid `c` of
  * subspace `s` (same flat `book` layout as [[PqEncode]]). A candidate's
  * approximate dot is then `m` array lookups + adds — the ADC trick of
  * Jégou et al. 2011. Kernel for the same tree-size reason as
  * [[PqEncode]] (the composed form was `m × K` dot expressions). */
case class PqLut(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(first, second).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }) && third.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pq_lut expects (array<double>, array<double>, int), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  override protected def nullSafeEval(v: Any, b: Any, m: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val book = b.asInstanceOf[ArrayData]
    val sub = m.asInstanceOf[Int]
    val dim = vec.numElements()
    val ds = dim / sub
    val k = book.numElements() / dim
    val lut = new Array[Double](sub * k)
    var s = 0
    while (s < sub) {
      var c = 0
      while (c < k) {
        val off = (s * k + c) * ds
        var d = 0.0; var j = 0
        while (j < ds) { d += vec.getDouble(s * ds + j) * book.getDouble(off + j); j += 1 }
        lut(s * k + c) = d
        c += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b, m) => {
      val dim = ctx.freshName("dim"); val ds = ctx.freshName("ds")
      val k = ctx.freshName("k"); val lut = ctx.freshName("lut")
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val off = ctx.freshName("off")
      s"""
         |int $dim = $v.numElements();
         |int $ds = $dim / $m;
         |int $k = $b.numElements() / $dim;
         |double[] $lut = new double[$m * $k];
         |for (int $s = 0; $s < $m; $s++) {
         |  for (int $c = 0; $c < $k; $c++) {
         |    int $off = ($s * $k + $c) * $ds;
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $ds; $j++) {
         |      $d += $v.getDouble($s * $ds + $j) * $b.getDouble($off + $j);
         |    }
         |    $lut[$s * $k + $c] = $d;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($lut);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Scalar (int8) quantization encode: `graft_sq8_codes(vec, vmin, scale)`
  * → `binary` of `len(vec)` bytes, code `i` = `clamp(round((x_i − vmin) /
  * scale), 0, 255)` stored as an unsigned byte — 1 byte/dim against the
  * float vector's 4 (the storage economics of SQ8 indexes). A
  * non-positive `scale` (constant vector) encodes all-zero codes, so
  * dequantize returns exactly `vmin`. Kernel for the usual reason: a
  * `transform` lambda evaluates interpreted on the per-row corpus path.
  * Rounding is `floor(x + 0.5)` — the convention every judged float→int
  * projection in this repo uses, reproducible in any SQL engine. */
case class Sq8Codes(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }) && second.dataType == DoubleType && third.dataType == DoubleType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sq8_codes expects (array<double>, double, double), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_sq8_codes"

  override protected def nullSafeEval(v: Any, mn: Any, sc: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val vmin = mn.asInstanceOf[Double]
    val scale = sc.asInstanceOf[Double]
    val n = vec.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val c = if (scale > 0.0) {
        val r = math.floor((vec.getDouble(i) - vmin) / scale + 0.5)
        if (r < 0.0) 0 else if (r > 255.0) 255 else r.toInt
      } else 0
      out(i) = c.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, mn, sc) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out"); val r = ctx.freshName("r")
      val c = ctx.freshName("c")
      s"""
         |int $n = $v.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  int $c = 0;
         |  if ($sc > 0.0) {
         |    double $r = java.lang.Math.floor(($v.getDouble($i) - $mn) / $sc + 0.5);
         |    $c = $r < 0.0 ? 0 : ($r > 255.0 ? 255 : (int) $r);
         |  }
         |  $out[$i] = (byte) $c;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** SQ8 reconstruction-error kernel: `graft_sq8_err(vec, vmin, scale)` →
  * `max_i |x_i − (vmin + code_i·scale)|` in one pass (quantize +
  * dequantize fused; the quantization contract `err ≤ scale/2 + ulps` a
  * spec can assert and an oracle can recompute bit-for-bit). */
case class Sq8Err(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }) && second.dataType == DoubleType && third.dataType == DoubleType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sq8_err expects (array<double>, double, double), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq8_err"

  override protected def nullSafeEval(v: Any, mn: Any, sc: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val vmin = mn.asInstanceOf[Double]
    val scale = sc.asInstanceOf[Double]
    val n = vec.numElements()
    var worst = 0.0
    var i = 0
    while (i < n) {
      val x = vec.getDouble(i)
      val c = if (scale > 0.0) {
        val r = math.floor((x - vmin) / scale + 0.5)
        if (r < 0.0) 0.0 else if (r > 255.0) 255.0 else r
      } else 0.0
      val e = math.abs(x - (vmin + c * scale))
      if (e > worst) worst = e
      i += 1
    }
    worst
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, mn, sc) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val worst = ctx.freshName("worst"); val r = ctx.freshName("r")
      val c = ctx.freshName("c"); val x = ctx.freshName("x")
      val e = ctx.freshName("e")
      s"""
         |int $n = $v.numElements();
         |double $worst = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $v.getDouble($i);
         |  double $c = 0.0;
         |  if ($sc > 0.0) {
         |    double $r = java.lang.Math.floor(($x - $mn) / $sc + 0.5);
         |    $c = $r < 0.0 ? 0.0 : ($r > 255.0 ? 255.0 : $r);
         |  }
         |  double $e = java.lang.Math.abs($x - ($mn + $c * $sc));
         |  if ($e > $worst) $worst = $e;
         |}
         |${ev.value} = $worst;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Asymmetric SQ8 dot product: `graft_sq8_dot(q, codes, vmin, scale)` →
  * `Σ q_i · (vmin + (codes_i & 0xFF)·scale)` — the query stays float,
  * the corpus side is read as 1-byte codes (the memory-bound scan SQ8
  * search wants: 4× fewer corpus bytes than a float dot). Lengths are
  * read up to the shorter side, matching [[DotProduct]]'s contract. */
case class Sq8Dot(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }) && second.dataType == BinaryType &&
      third.dataType == DoubleType && fourth.dataType == DoubleType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sq8_dot expects (array<double>, binary, double, double), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString}, ${fourth.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq8_dot"

  override protected def nullSafeEval(q: Any, cd: Any, mn: Any, sc: Any): Any = {
    val qv = q.asInstanceOf[ArrayData]
    val codes = cd.asInstanceOf[Array[Byte]]
    val vmin = mn.asInstanceOf[Double]
    val scale = sc.asInstanceOf[Double]
    val n = math.min(qv.numElements(), codes.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      s += qv.getDouble(i) * (vmin + (codes(i) & 0xff) * scale)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, cd, mn, sc) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($q.numElements(), $cd.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $q.getDouble($i) * ($mn + (($cd[$i]) & 0xff) * $sc);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

/** Norm of the DEQUANTIZED vector: `graft_sq8_norm(codes, vmin, scale)`
  * → `sqrt(Σ (vmin + (codes_i & 0xFF)·scale)²)` — computed once per
  * corpus row at index time so cosine ranking over SQ8 codes needs no
  * float vector at query time. */
case class Sq8Norm(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == BinaryType &&
      second.dataType == DoubleType && third.dataType == DoubleType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sq8_norm expects (binary, double, double), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq8_norm"

  override protected def nullSafeEval(cd: Any, mn: Any, sc: Any): Any = {
    val codes = cd.asInstanceOf[Array[Byte]]
    val vmin = mn.asInstanceOf[Double]
    val scale = sc.asInstanceOf[Double]
    var s = 0.0
    var i = 0
    while (i < codes.length) {
      val x = vmin + (codes(i) & 0xff) * scale
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cd, mn, sc) => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $cd.length; $i++) {
         |  double $x = $mn + (($cd[$i]) & 0xff) * $sc;
         |  $s += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Binary (1-bit) quantization pack: `graft_bq_pack(vec)` → `array<long>`
  * of `ceil(dim/64)` words, bit `i mod 64` of word `i div 64` set iff
  * `vec[i] > 0` (strictly positive; zero packs as 0 — one convention on
  * both engines). 32× smaller than SQ8 codes: dim-64 vectors become ONE
  * long, so a billion-vector code scan is 8 GB — the coarsest rung of
  * the quantization ladder (BQ → SQ8 → PQ → exact), paired with
  * [[HammingDistance]] for the code-space scan. Null vector → null;
  * elements assumed non-null (the embedding contract). */
case class BqPack(child: Expression)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bq_pack expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bq_pack"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val words = new Array[Long]((n + 63) / 64)
    var i = 0
    while (i < n) {
      if (x.getDouble(i) > 0.0) words(i / 64) |= (1L << (i % 64))
      i += 1
    }
    new GenericArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val words = ctx.freshName("words")
      s"""
         |int $n = $v.numElements();
         |long[] $words = new long[($n + 63) / 64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.getDouble($i) > 0.0) $words[$i / 64] |= (1L << ($i % 64));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($words);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hamming distance between two bit-packed code arrays (the
  * [[BqPack]] output): `Σ bit_count(a[j] ^ b[j])` over the shorter
  * length — one XOR + POPCNT per 64 dimensions, the cheapest similarity
  * scan there is (the built-in composition `aggregate(zip_with(...))`
  * evaluates interpreted; this generates the tight loop). Null if
  * either side is null. */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hamming expects (array<long>, array<long>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hamming"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0
    var i = 0
    while (i < n) {
      s += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $s = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Registration triple for [[DotProduct]] as SQL function `graft_dot`,
    * shared by the [[GraftExtensions]] session-build path and the
    * runtime registration in Tables.bootstrap. */
  val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => DotProduct(children.head, children(1))
  )

  /** [[PqEncode]] / [[PqLut]] registrations (see Tables.bootstrap). */
  val pqFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      (ch: Seq[Expression]) => PqEncode(ch.head, ch(1), ch(2))),
    (FunctionIdentifier("graft_pq_lut"),
      new ExpressionInfo(classOf[PqLut].getName, "graft_pq_lut"),
      (ch: Seq[Expression]) => PqLut(ch.head, ch(1), ch(2)))
  )

  /** SQ8 kernel registrations (see Tables.bootstrap). */
  /** [[BqPack]] / [[HammingDistance]] registrations (see Tables.bootstrap). */
  val bqFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_bq_pack"),
      new ExpressionInfo(classOf[BqPack].getName, "graft_bq_pack"),
      (ch: Seq[Expression]) => BqPack(ch.head)),
    (FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "graft_hamming"),
      (ch: Seq[Expression]) => HammingDistance(ch.head, ch(1)))
  )

  val sq8Functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_sq8_codes"),
      new ExpressionInfo(classOf[Sq8Codes].getName, "graft_sq8_codes"),
      (ch: Seq[Expression]) => Sq8Codes(ch.head, ch(1), ch(2))),
    (FunctionIdentifier("graft_sq8_err"),
      new ExpressionInfo(classOf[Sq8Err].getName, "graft_sq8_err"),
      (ch: Seq[Expression]) => Sq8Err(ch.head, ch(1), ch(2))),
    (FunctionIdentifier("graft_sq8_dot"),
      new ExpressionInfo(classOf[Sq8Dot].getName, "graft_sq8_dot"),
      (ch: Seq[Expression]) => Sq8Dot(ch.head, ch(1), ch(2), ch(3))),
    (FunctionIdentifier("graft_sq8_norm"),
      new ExpressionInfo(classOf[Sq8Norm].getName, "graft_sq8_norm"),
      (ch: Seq[Expression]) => Sq8Norm(ch.head, ch(1), ch(2)))
  )
}

/** The complete native-kernel registration list — the ONE source both
  * registration paths (`Tables.bootstrap` and [[GraftExtensions]])
  * consume, so a new kernel family cannot be registered on one path and
  * silently missing ("Undefined function") on the other. */
object GraftFunctions {
  // Spark ships BloomFilterMightContain (the probe half of its runtime
  // filters, codegen'd) but does NOT register it for SQL use; exposing
  // it under a graft name lets Sketches.bloomPrefilteredJoin reuse the
  // stock expression instead of shipping a parallel kernel.
  private val mightContain: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (ch: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(ch.head, ch(1)))

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    VectorExprs.dotFunction +:
      (VectorExprs.pqFunctions ++ VectorExprs.sq8Functions ++
        VectorExprs.bqFunctions ++
        TextStatsExprs.functions ++ ShingleExprs.functions ++
        CompressExprs.functions ++ ZOrder2.functions ++
        EntropyExprs.functions ++ UrlExprs.functions ++
        UnicodeExprs.functions :+ mightContain)
}

/** SparkSessionExtensions hook: `spark.sql.extensions=graft.functions.GraftExtensions`
  * registers the engine's native expressions at session build. Sessions
  * built without the config get the same registration from
  * `Tables.bootstrap`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
