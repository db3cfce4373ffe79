package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Exact integer kernels with no Spark builtin. */
object MathKernels {

  /** Euclidean gcd on int64, non-negative result, gcd(0, 0) = 0 — the
    * same contract as DuckDB's `gcd(BIGINT, BIGINT)`, which the oracle
    * SQLs pair this with. Long.MinValue inputs would overflow abs();
    * callers here only pass counts (≥ 0), and DuckDB raises on that
    * same corner, so neither engine silently diverges. */
  def gcd(a: Long, b: Long): Long = {
    var x = math.abs(a)
    var y = math.abs(b)
    while (y != 0L) { val t = x % y; x = y; y = t }
    x
  }
}

/** gcd(a, b) of two int64 columns — exact-rational reduction support
  * (q199 emits lift in lowest terms). Codegen'd; stays inside
  * whole-stage codegen like the other graft kernels. */
case class GcdExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (BIGINT, BIGINT), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "gcd64"
  override def nullSafeEval(a: Any, b: Any): Any =
    MathKernels.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.MathKernels.gcd($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GcdExpr =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points. */
object MathFns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftColumnBridge.{column => ofExpr, expression => toExpr}
  def gcd(a: Column, b: Column): Column = ofExpr(GcdExpr(toExpr(a), toExpr(b)))
}
