package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column => ofExpr, expression => toExpr}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert-curve cell indexing ([PK] Hilbert 1891; the iterative
  * xy2d conversion is the standard public-domain formulation, e.g.
  * Wikipedia "Hilbert curve", Hamilton & Rau-Chaplin 2008).
  *
  * Where the Morton/z-order curve ([[graft.ops.ZOrder]]) interleaves
  * bits — cheap, but with long diagonal "seams" where consecutive
  * codes jump across the grid — the Hilbert curve is a continuous
  * space-filling curve: consecutive indices are ALWAYS 4-neighbour
  * grid cells, so equal-size index ranges tile the plane into more
  * compact (lower max-side) regions and per-file min/max bounds come
  * out tighter on both dimensions. The price is the per-level quadrant
  * rotation, which is why it runs as one static-kernel codegen call
  * per row rather than a bit-twiddling Column expression (the unrolled
  * rotation triples the expression tree per level — 3^bits nodes —
  * which CollapseProject would happily inline back after any
  * per-level projection split).
  */
object HilbertKernels {

  /** Hilbert distance of cell (x, y) on the 2^bits × 2^bits grid.
    * Coordinates outside [0, 2^bits) are clamped (callers rank into
    * the grid first; clamping keeps hostile inputs total). */
  def xy2d(xIn: Long, yIn: Long, bits: Int): Long = {
    val mx = (1L << bits) - 1L
    var x = math.min(math.max(xIn, 0L), mx)
    var y = math.min(math.max(yIn, 0L), mx)
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve joins ends with its
      // neighbours: reflect when rx=1, then swap axes (ry=0 only)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** `hilbert_index(x, y)`: Hilbert distance of two already-ranked grid
  * coordinates — a single static-kernel call inside whole-stage
  * codegen (the [[HashKernelExpr]] discipline). */
case class HilbertIndexExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits=$bits must be in [1, 31]")
  override def checkInputDataTypes() =
    KernelTypeCheck.longInputs(prettyName, left.dataType, right.dataType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    HilbertKernels.xy2d(l.asInstanceOf[Long], r.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HilbertKernels.xy2d($a, $b, $bits)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndexExpr =
    copy(left = newLeft, right = newRight)
}

object HilbertFns {
  /** Hilbert index of two long rank columns on a 2^bits grid. */
  def hilbertIndex(x: Column, y: Column, bits: Int): Column =
    ofExpr(HilbertIndexExpr(toExpr(x), toExpr(y), bits))
}
