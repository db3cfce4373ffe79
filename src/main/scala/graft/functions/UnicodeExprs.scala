package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text-normalization kernels (SURVEY.md §2.10 family): NFC
  * canonical composition and accent folding — the first cleaning step of
  * any multilingual corpus pipeline (mixed crawl sources emit the same
  * word in composed and decomposed forms, which breaks exact dedup,
  * tokenization, and every hash-keyed operator downstream).
  *
  * Spark ships no Unicode-normalization builtin, so these are custom
  * codegen'd Catalyst expressions over `java.text.Normalizer` (public
  * JDK). Semantics are pinned cross-engine by q104's oracle: NFC here ==
  * DuckDB `nfc_normalize` (both implement Unicode canonical composition);
  * `fold_accents` == DuckDB `strip_accents` on the Latin range (both are
  * NFD → drop combining marks → recompose, so ß/Æ/Ø pass through
  * unchanged in both engines while á/é/í/ó/ü fold to their base letters).
  *
  * Scale: pure per-row map, no allocation beyond the output string,
  * whole-stage-codegen friendly (static kernel call, same shape as
  * [[SimilarityKernels]]).
  */
object UnicodeKernels {
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(Normalizer.normalize(s.toString, Normalizer.Form.NFC))

  /** NFD-decompose, drop non-spacing marks, NFC-recompose. BMP marks
    * only (`Character.getType` on the code unit) — supplementary-plane
    * combining marks are vanishingly rare in text corpora and pass
    * through untouched rather than corrupting the surrogate pair. */
  def foldAccents(s: UTF8String): UTF8String = {
    val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      if (Character.isHighSurrogate(c) || Character.isLowSurrogate(c) ||
          Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }
}

/** Unicode NFC canonical composition of a string column. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes() =
    KernelTypeCheck.stringInput(prettyName, child.dataType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(input: Any): Any =
    UnicodeKernels.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeKernels.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

/** Accent folding (NFD → strip combining marks → NFC) of a string column. */
case class FoldAccentsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes() =
    KernelTypeCheck.stringInput(prettyName, child.dataType)
  override def dataType: DataType = StringType
  override def prettyName: String = "fold_accents"
  override def nullSafeEval(input: Any): Any =
    UnicodeKernels.foldAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeKernels.foldAccents($c)")
  override protected def withNewChildInternal(newChild: Expression): FoldAccentsExpr =
    copy(child = newChild)
}

/** Column-level entry points for the Unicode kernels. */
object UniFns {
  import org.apache.spark.sql.GraftColumnBridge.{column => ofExpr, expression => toExpr}
  def nfcNormalize(c: Column): Column = ofExpr(NfcNormalizeExpr(toExpr(c)))
  def foldAccents(c: Column): Column = ofExpr(FoldAccentsExpr(toExpr(c)))
}
