package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-length kernel backing the compression-ratio quality signal.
  *
  * Compression ratio (compressed bytes / raw bytes) is a standard
  * pretraining quality feature: highly repetitive or templated text
  * compresses far below prose, near-random bytes barely compress at all
  * (Rae et al. 2021 §A.1.1 use repetition rules for the same failure
  * mode; the deflate ratio is the single scalar that catches all of them
  * at once). The kernel returns the raw-deflate (nowrap, level 6) length
  * of the UTF-8 bytes; callers divide by `octet_length` for the ratio.
  *
  * Static-helper codegen: the generated code calls
  * [[CompressKernel.deflateLen]] directly, so the expression participates
  * in whole-stage codegen (no interpreted fallback in the scan stage) —
  * the deflate itself dominates at ~30-100 MB/s/core, which is exactly
  * the cost the signal is worth at ingest time (one scan, no shuffle).
  *
  * Deterministic for a fixed JVM zlib, but NOT expressible in DuckDB —
  * the judged `q_compress_ratio` is rows-only with its contracts pinned
  * in TextOpsSpec (monotonicity under repetition, determinism,
  * empty/null behavior).
  */
case class DeflateLen(child: Expression)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_len expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_deflate_len"

  override protected def nullSafeEval(input: Any): Any =
    CompressKernel.deflateLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CompressKernel.deflateLen($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CompressKernel {
  /** Raw-deflate (RFC 1951, nowrap) length of `s`'s UTF-8 bytes at
    * level 6. A fresh Deflater per call: the scan-stage cost is the
    * deflate itself, and sharing native zlib state across codegen'd rows
    * would trade a ~µs allocation for thread-safety hazards. */
  def deflateLen(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

object CompressExprs {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "graft_deflate_len"),
      (ch: Seq[Expression]) => DeflateLen(ch.head))
  )
}
