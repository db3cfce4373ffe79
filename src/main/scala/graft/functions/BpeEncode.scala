package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column => ofExpr, expression => toExpr}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused BPE ENCODING kernel — the inference half of the tokenizer
  * story (`ops/BpeTrain` is the training half). `BpeTrain.applyMerges`
  * is a fold of one `aggregate` higher-order function per merge:
  * correct, but the expression tree grows with the merge count and
  * every merge pays an interpreted Catalyst lambda per symbol — at a
  * real vocabulary (10k–50k merges) that shape is unusable. This
  * kernel applies the whole merge list in ONE JVM call per word
  * (training-order, greedy left-to-right, merged tokens don't re-merge
  * within a pass — the Sennrich inference rule), with the merge table
  * attached to the generated code as a reference object, so token
  * counting over a corpus stays inside whole-stage codegen.
  *
  * Bit-parity contract (pinned by BpeSpec over the fixture
  * vocabulary): output equals `applyMerges`' fold for every word,
  * including the empty string and words with no applicable merge. */
object BpeKernels {

  /** Apply `merges` in training order to one word. Symbols start as
    * the word's UTF-16 code units (Java `split("")` semantics — what
    * `BpeTrain.chars` produces for the ASCII fixture alphabet). */
  def encode(word: UTF8String, merges: Array[(String, String)]): ArrayData = {
    val s = word.toString
    var syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) { syms.add(String.valueOf(s.charAt(i))); i += 1 }
    var m = 0
    while (m < merges.length && syms.size > 1) {
      val a = merges(m)._1
      val b = merges(m)._2
      val out = new java.util.ArrayList[String](syms.size)
      var j = 0
      while (j < syms.size) {
        if (j < syms.size - 1 && syms.get(j) == a && syms.get(j + 1) == b) {
          out.add(a + b); j += 2
        } else { out.add(syms.get(j)); j += 1 }
      }
      syms = out
      m += 1
    }
    val arr = new Array[Any](syms.size)
    var k = 0
    while (k < syms.size) { arr(k) = UTF8String.fromString(syms.get(k)); k += 1 }
    new GenericArrayData(arr)
  }
}

/** bpe_encode(word) with a baked-in merge table: one JVM loop per row,
  * whole-stage-codegen friendly via a reference object. */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def checkInputDataTypes() =
    KernelTypeCheck.stringInput(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"
  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray
  override def nullSafeEval(input: Any): Any =
    BpeKernels.encode(input.asInstanceOf[UTF8String], mergeArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", mergeArr, "scala.Tuple2[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeKernels.encode($c, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

object BpeFns {
  /** Column form of the fused encoder. */
  def bpeEncode(word: Column, merges: Seq[(String, String)]): Column =
    ofExpr(BpeEncodeExpr(toExpr(word), merges))
}
