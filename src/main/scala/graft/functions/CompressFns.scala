package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-based text signals (the RefinedWeb/Dolma-family quality
  * filter: highly repetitive or templated text deflates far below the
  * corpus norm). No SQL engine exposes deflate, so these are
  * spec-verified rather than DuckDB-oracle-gated; the expression is a
  * native codegen'd Catalyst node (the VecExprs pattern), NOT a Scala
  * UDF, so the scan stage stays whole-stage-fused.
  */
object CompressFns {

  /** Deflate'd byte length of a string column (zlib level 6).
    * Deterministic for a given JVM zlib — pinned by spec, not oracle. */
  def deflateLen(c: Column): Column =
    ExpressionUtils.column(DeflateLen(ExpressionUtils.expression(c)))

  /** Deflate a UTF-8 payload and return the compressed size. A fresh
    * Deflater per call would dominate the cost; keep one per thread. */
  private val tlDeflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6)
  }
  private val tlBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 16)
  }

  def deflateLenJvm(s: UTF8String): Int = {
    val in = s.getBytes
    val d = tlDeflater.get()
    d.reset()
    d.setInput(in)
    d.finish()
    var buf = tlBuf.get()
    if (buf.length < in.length + 64) {
      buf = new Array[Byte](in.length + 64)
      tlBuf.set(buf)
    }
    var total = 0
    while (!d.finished()) {
      val n = d.deflate(buf)
      total += n
      if (n == 0 && !d.finished()) return total // defensive: cannot stall
    }
    total
  }
}

/** Codegen'd deflate-length: `DeflateLen(text)` → INT compressed bytes. */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_len needs STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(a: Any): Any =
    CompressFns.deflateLenJvm(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CompressFns.deflateLenJvm($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
