package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** A12/L8 custom UDAF showcase (SURVEY.md §2.8, §2.10): elementwise mean
  * of fixed-length float vectors — the centroid of an embedding column.
  *
  * Typed `Aggregator[IN, BUF, OUT]` registered via `functions.udaf`, so
  * Catalyst plans it as a real two-phase hash aggregate: partial sums per
  * partition, one (dim+1)-double buffer merged at the exchange — the same
  * partial/final split every builtin agg gets, no row collection. At
  * 100 TB this shuffles `groups × (dim+1)` doubles, independent of row
  * count.
  *
  * Buffer layout: [sum_0 … sum_{dim-1}, count]. Floats are upcast to
  * double before summing (exact) so the result is partition-order
  * independent up to double addition; outputs are rounded by callers
  * before cross-engine comparison.
  */
class CentroidAgg(dim: Int)
    extends Aggregator[Seq[Float], Array[Double], Seq[Double]] {

  override def zero: Array[Double] = new Array[Double](dim + 1)

  override def reduce(buf: Array[Double], v: Seq[Float]): Array[Double] = {
    if (v != null && v.length == dim) {
      var i = 0
      while (i < dim) { buf(i) += v(i); i += 1 }
      buf(dim) += 1d
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i <= dim) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Double]): Seq[Double] = {
    val n = buf(dim)
    if (n == 0d) Seq.fill(dim)(0d)
    else {
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) { out(i) = buf(i) / n; i += 1 }
      out.toSeq
    }
  }

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
