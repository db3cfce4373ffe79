package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate equal-frequency binning — the 100 TB form of q98's qcut
  * (public technique: Greenwald–Khanna quantile summaries, the sketch
  * behind Spark's `approx_percentile`).
  *
  * q98 pins EXACT NTILE semantics and pays one corpus rank for it
  * (range-partitioned, but still a full sort + shuffle). When bin
  * POPULATIONS only need to be equal to within sketch error — the
  * common case for feature bucketing / stratified profiling — the
  * scale-right plan is: one pass to sketch the k−1 cut points
  * (mergeable partial aggregation, bytes of state per partition), then
  * a PER-ROW MAP assigning each value to its interval. Assignment
  * adds ZERO shuffles — it composes into whatever stage already reads
  * the rows (AppxQcutSpec pins an exchange-free assignment plan).
  *
  * Only the k−1 cut points reach the driver — model parameters, the
  * AnnIvf-centroid class — re-broadcast as literals into codegen.
  * Interval semantics are pandas-qcut's (lo, hi]: bucket =
  * 1 + |{cuts < v}|, so ties land with their equals and results are
  * deterministic for any input order (the sketch itself is
  * order-deterministic under a fixed partitioning; pin partitioning
  * upstream if bit-stable cuts across cluster layouts matter).
  */
object AppxQcut {

  /** `df` plus `outCol` ∈ 1..k assigning each row's `valueCol` to an
    * approximately equal-population bucket. One aggregation job for
    * the cut points; assignment is a pure projection.
    *
    * @param accuracy `approx_percentile` accuracy knob (1/accuracy
    *        relative rank error; 10000 ≈ 0.01% — exact on corpora
    *        smaller than the sketch) */
  def bin(df: DataFrame, valueCol: String, k: Int,
      outCol: String = "bucket", accuracy: Int = 10000): DataFrame = {
    require(k >= 2, s"k=$k buckets is not a binning")
    val probs = (1 until k).map(i => i.toDouble / k)
    val cuts = df
      .agg(expr(s"approx_percentile(CAST($valueCol AS DOUBLE), " +
        s"array(${probs.mkString(",")}), $accuracy)").as("c"))
      .collect()(0).getSeq[Double](0)
    val cutsArr = typedlit(cuts)
    df.withColumn(outCol,
      (lit(1) + size(filter(cutsArr, c => c < col(valueCol).cast("double"))))
        .cast("int"))
  }
}
