package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed `Aggregator` — the
  * bounded-memory answer to "top terms / heavy hitters" when the exact
  * groupBy (q40/q41) would shuffle a 100 TB corpus's full vocabulary.
  * (Public technique: Misra & Gries 1982; the MERGE step is the
  * mergeable-summaries form of Agarwal et al., PODS 2012: pointwise sum,
  * then subtract the (k+1)-th largest count and drop non-positives.)
  *
  * Guarantees (capacity k): the summary holds ≤ k items; every item with
  * true frequency > n/(k+1) is present; each reported count c̃ satisfies
  * freq − n/(k+1) ≤ c̃ ≤ freq. Exactly the two-phase hash-agg shape
  * Catalyst gives builtins: k-entry partial maps per partition, merged
  * at the exchange — the shuffle carries `partitions × k` entries,
  * independent of corpus size or vocabulary.
  *
  * The output is the SKETCH (item → count lower bound), not a ranking:
  * callers re-rank/threshold it. Estimates are deterministic for a given
  * partitioning but (like every MG summary) partitioning-dependent in
  * which sub-threshold stragglers survive; tests assert the guarantees,
  * not a fixed map — which is why this stays ScalaTest-covered (A5
  * family) rather than oracle-gated.
  */
class HeavyHittersAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"capacity must be >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], x: String): Map[String, Long] = {
    if (x == null) buf
    else buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1L)
      case None if buf.size < k => buf.updated(x, 1L)
      case None =>
        // decrement-all: drop one "vote" from every tracked item
        buf.flatMap { case (i, c) => if (c > 1L) Some(i -> (c - 1L)) else None }
    }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count, keep strictly positive
      val cut = sum.valuesIterator.toArray.sortBy(-_).apply(k)
      sum.flatMap { case (i, c) => if (c > cut) Some(i -> (c - cut)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
