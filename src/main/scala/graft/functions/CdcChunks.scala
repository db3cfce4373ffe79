package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column => ofExpr, expression => toExpr}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (Rabin-style, per LBFS — Muthitacharoen et
  * al., SOSP 2001 [PK]): split a document wherever a W-char polynomial
  * rolling hash hits `0 mod D`, so chunk boundaries follow CONTENT, not
  * offsets. An insertion near the head of a near-duplicate document
  * shifts every fixed-stride chunk but leaves all content-defined
  * boundaries after the edit in place — which is what makes chunk-hash
  * dedup robust to edits (the q102 sliding-window chunker is
  * offset-based and has no such invariance).
  *
  * Hash contract (cross-engine, the [[TextFns]] discipline):
  *   H(i) = Σ_{j=0}^{W-1} char(i−j) · B^j  mod M     (i ≥ W, 1-based)
  *   boundary after position i  ⇔  H(i) mod D == 0 and i < len
  *   W = 8, B = 131, M = 1e9+7, D = 64 (expected chunk ≈ 64 chars)
  * All intermediates stay below 2^63: the rolling update's worst value
  * is (2M)·B + 127 ≈ 2.6e11. The DuckDB oracle computes the SAME H(i)
  * as a direct 8-term weighted sum per position (≡ mod M), so chunk
  * STRINGS compare equal across engines — never engine-builtin hashes.
  * Chars are UTF-16 units here vs codepoints in `unicode()` there:
  * identical on the ASCII fixture corpus (codepoints 32..121, the
  * HashKernels precedent).
  *
  * Scale: one O(len) loop per row inside WholeStageCodegen; no UDF, no
  * per-char boxed lambda. The windows deliberately roll ACROSS emitted
  * boundaries (standard CDC — resetting would re-anchor every boundary
  * after an edit and lose the invariance the operator exists for).
  */
object CdcKernels {
  val M = 1000000007L
  val B = 131L
  val W = 8
  val D = 64L
  private val BwTop = 617266377L // B^(W-1) mod M

  def cdcChunks(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    if (n == 0)
      return new GenericArrayData(Array[Any](UTF8String.fromString("")))
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      val c = s.charAt(i).toLong
      h =
        if (i < W) (h * B + c) % M
        else ((h - s.charAt(i - W).toLong * BwTop % M + M) * B + c) % M
      if (i + 1 >= W && i + 1 < n && h % D == 0L) {
        chunks += UTF8String.fromString(s.substring(start, i + 1))
        start = i + 1
      }
      i += 1
    }
    chunks += UTF8String.fromString(s.substring(start, n))
    new GenericArrayData(chunks.toArray)
  }
}

/** array<string> of content-defined chunks of a text column. */
case class CdcChunksExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes() =
    KernelTypeCheck.stringInput(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"
  override def nullSafeEval(input: Any): Any =
    CdcKernels.cdcChunks(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcKernels.cdcChunks($c)")
  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
}

object CdcChunks {
  /** Column wrapper: content-defined chunks of `text`. */
  def cdcChunks(text: Column): Column = ofExpr(CdcChunksExpr(toExpr(text)))
}
