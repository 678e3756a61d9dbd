package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

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
      (VectorExprs.pqFunctions ++
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
