package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable.ArrayBuffer

/** Merging t-digest quantile sketch as a typed `Aggregator` — the
  * quantile member of the re-aggregatable sketch family (A5 HLL =
  * distinct, L46 count-min / Misra-Gries = frequency): bounded-memory
  * approximate percentiles you can roll up across shards, days or
  * cube cells, where the exact grouped `percentile` (A10) needs the
  * values and `approx_percentile` state cannot be persisted and
  * re-merged as a first-class column. (Public technique: Dunning &
  * Ertl, "Computing Extremely Accurate Quantiles Using t-Digests",
  * arXiv:1902.04023 — the merging variant with the k1-style
  * q(1−q) size limit.)
  *
  * Shape: centroids (mean, weight) kept small near the tails (the
  * 4·n·q(1−q)/δ limit pinches at q→0,1), so tail quantiles stay sharp
  * while the middle compresses — the property plain equi-width
  * histograms lack. State ≤ ~2δ centroids + a 512-value raw buffer,
  * independent of input size; reduce is O(1) amortized, merge is one
  * sorted sweep. Exactly the two-phase partial/final hash-agg shape:
  * the shuffle carries `partitions × O(δ)` centroids.
  *
  * Like every t-digest, the centroid layout depends on arrival order /
  * partitioning; the ACCURACY guarantee does not. TDigestSpec asserts
  * rank-error envelopes and shard-merge equivalence, not fixed
  * centroids — the A5 reason this is ScalaTest-, not oracle-covered.
  */
class TDigestAgg(delta: Int = 100)
    extends Aggregator[Double, TDigestAgg.Buf, TDigestAgg.Sketch] {
  require(delta >= 20, s"compression must be >= 20, got $delta")
  import TDigestAgg._

  override def zero: Buf = Buf(Array.empty, Array.empty, Array.empty)

  override def reduce(b: Buf, x: Double): Buf = {
    val raw = b.raw :+ x
    if (raw.length >= rawCap)
      compressed(b.means ++ raw, b.ws ++ Array.fill(raw.length)(1L), delta)
    else Buf(b.means, b.ws, raw)
  }

  override def merge(a: Buf, b: Buf): Buf =
    compressed(a.means ++ a.raw ++ b.means ++ b.raw,
      a.ws ++ Array.fill(a.raw.length)(1L) ++ b.ws ++
        Array.fill(b.raw.length)(1L),
      delta)

  override def finish(b: Buf): Sketch = {
    val c = compressed(b.means ++ b.raw,
      b.ws ++ Array.fill(b.raw.length)(1L), delta)
    Sketch(c.means, c.ws)
  }

  override def bufferEncoder: Encoder[Buf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()

  override def outputEncoder: Encoder[Sketch] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Sketch]()
}

object TDigestAgg {
  /** Partial state: compressed centroids + an uncompressed tail. */
  case class Buf(means: Array[Double], ws: Array[Long], raw: Array[Double])
  /** Final state: centroids sorted by mean. */
  case class Sketch(means: Array[Double], ws: Array[Long])

  private val rawCap = 512

  /** The k1 scale function δ/2π·asin(2q−1): its unit steps slice rank
    * space finely near q = 0, 1 and coarsely in the middle — tails stay
    * sharp, the bulk compresses. */
  private def kFn(q: Double, delta: Int): Double =
    delta / (2.0 * math.Pi) *
      math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)

  /** One sorted merging pass (Dunning's MergingDigest): adjacent
    * centroids merge while the cluster spans less than one unit of k1,
    * giving ≤ ~2δ centroids regardless of input size. Deterministic
    * for a given input multiset order (sort is total on (mean, idx)). */
  private def compressed(means: Array[Double], ws: Array[Long],
      delta: Int): Buf = {
    if (means.isEmpty) return Buf(means, ws, Array.empty)
    val idx = means.indices.sortBy(i => (means(i), i)).toArray
    val n = ws.sum.toDouble
    val om = new ArrayBuffer[Double]; val ow = new ArrayBuffer[Long]
    var cm = means(idx(0)); var cw = ws(idx(0))
    var cumBefore = 0.0
    var kLeft = kFn(0.0, delta)
    var k = 1
    while (k < idx.length) {
      val m = means(idx(k)); val w = ws(idx(k))
      if (kFn((cumBefore + cw + w) / n, delta) - kLeft <= 1.0) {
        cm = (cm * cw + m * w) / (cw + w); cw += w
      } else {
        om += cm; ow += cw; cumBefore += cw
        kLeft = kFn(cumBefore / n, delta)
        cm = m; cw = w
      }
      k += 1
    }
    om += cm; ow += cw
    Buf(om.toArray, ow.toArray, Array.empty)
  }

  /** Quantile estimate: linear interpolation between centroid
    * mid-ranks (each centroid's mean is taken to sit at the middle of
    * its weight span — the standard t-digest read-out). */
  def quantile(s: Sketch, q: Double): Double = {
    require(s.means.nonEmpty, "empty sketch")
    require(q >= 0.0 && q <= 1.0, s"q out of range: $q")
    val n = s.ws.sum.toDouble
    val target = q * n
    var cum = 0.0
    var prevMid = Double.NaN
    var prevMean = Double.NaN
    var i = 0
    while (i < s.means.length) {
      val mid = cum + s.ws(i) / 2.0
      if (target < mid) {
        return if (prevMid.isNaN) s.means(0)
        else prevMean + (s.means(i) - prevMean) *
          ((target - prevMid) / (mid - prevMid))
      }
      cum += s.ws(i); prevMid = mid; prevMean = s.means(i)
      i += 1
    }
    s.means(s.means.length - 1)
  }
}
