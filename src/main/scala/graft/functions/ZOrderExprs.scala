package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Morton/Z-order interleave over two long dimension encodings.
  *
  * `graft_zorder2(a, b)` spreads the LOW 32 BITS of each input across
  * alternating bit positions of a 64-bit value (a in even bits, b in
  * odd), so sorting by the result orders rows along the Z space-filling
  * curve: rows close in BOTH dimensions land close in the sort, and a
  * file holding a contiguous z-range covers a small axis-aligned box —
  * parquet min-max stats then skip files for 2-dimensional box
  * predicates, which single-column range-clustering
  * ([[graft.operators.Relational.writeClustered]]) cannot do.
  *
  * Contract: inputs are NON-NEGATIVE dimension encodings (ranks, bucket
  * ordinals, epoch days — anything monotone in the dimension) no wider
  * than 32 bits; higher bits are masked off. Encoding is the caller's
  * choice because it is a layout policy (how much resolution each
  * dimension gets), not an algebraic property.
  *
  * As a composition of built-in shiftleft/and/or this is ~24 expression
  * nodes per dimension — the expression-tree-size trap (vec_pq lesson);
  * one kernel keeps the write-path projection inside whole-stage codegen
  * with two machine-word twiddles per row.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder2 expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder2.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Spread the low 32 bits of `x` to the even bit positions of a long
    * (the standard mask-shift Morton dilation). */
  def spread(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Z-value: `a`'s bits in even positions, `b`'s in odd. Callable from
    * generated code (compiles to a static method on this object's
    * companion class). */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_zorder2"),
      new ExpressionInfo(classOf[ZOrder2].getName, "graft_zorder2"),
      (args: Seq[Expression]) => ZOrder2(args(0), args(1))))
}
