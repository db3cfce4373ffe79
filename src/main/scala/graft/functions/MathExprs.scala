package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
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

  /** Great-circle distance in km ([PK] the haversine formula, R =
    * 6371.0088 km IUGG mean radius). ONE fixed operation order — the
    * oracle SQL mirrors spell out the identical chain, so the only
    * cross-engine freedom is the ≤1-ulp libm sin/cos/asin divergence,
    * which the callers' output quantization absorbs (the q187/q103
    * convention for transcendental kernels). */
  def haversineKm(lat1: Double, lon1: Double,
      lat2: Double, lon2: Double): Double = {
    val p = math.Pi / 180.0
    val sLat = math.sin((lat2 - lat1) * p / 2.0)
    val sLon = math.sin((lon2 - lon1) * p / 2.0)
    val a = sLat * sLat +
      math.cos(lat1 * p) * math.cos(lat2 * p) * sLon * sLon
    2.0 * 6371.0088 * math.asin(math.min(1.0, math.sqrt(a)))
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

/** haversine_km(lat1, lon1, lat2, lon2) of four double columns — a
  * single static-kernel call inside whole-stage codegen (the
  * HilbertIndexExpr discipline): the geo primitive q333's hub
  * distance-band census runs per (customer, hub) candidate row, with
  * no UDF deopt. */
case class HaversineExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ts = Seq(first, second, third, fourth).map(_.dataType)
    if (ts.forall(_ == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs four DOUBLEs, got " +
        ts.map(_.simpleString).mkString("(", ", ", ")"))
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "haversine_km"
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    MathKernels.haversineKm(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.MathKernels.haversineKm($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): HaversineExpr =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

/** Column-level entry points. */
object MathFns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftColumnBridge.{column => ofExpr, expression => toExpr}
  def gcd(a: Column, b: Column): Column = ofExpr(GcdExpr(toExpr(a), toExpr(b)))
  def haversineKm(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column =
    ofExpr(HaversineExpr(toExpr(lat1), toExpr(lon1),
      toExpr(lat2), toExpr(lon2)))
}
