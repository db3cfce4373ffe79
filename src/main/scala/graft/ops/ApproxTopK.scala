package graft.ops

import graft.functions.HeavyHittersAgg
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase top-k over unbounded cardinality: sketch candidates, then
  * exact rescore — the scale pattern for "top terms over 100 TB" when
  * the exact groupBy's shuffle would carry the full vocabulary. Phase 1
  * runs the Misra–Gries summary (bounded k-entry state per partition,
  * one sketch on the driver); phase 2 re-counts ONLY the candidate set
  * with an exact aggregation behind a broadcast semi-join, so reported
  * counts are exact, not MG's lower bounds.
  *
  * Guarantee (from MG): every item with true frequency > n/(capacity+1)
  * survives phase 1. Hence the top-k list is provably complete whenever
  * the true k-th frequency clears that threshold — heavy-tailed corpora
  * at modest capacities. ApproxTopKSpec pins both sides: exact parity
  * with the full groupBy when the guarantee holds, and the documented
  * failure mode (a flat distribution below the threshold) where the
  * candidate set may miss — the caller's capacity knob, not a silent
  * wrong answer, since phase 2 counts are exact for whatever phase 1
  * surfaced.
  *
  * Shuffle math: phase 1 moves partitions × capacity sketch entries;
  * phase 2 moves only rows matching ≤ capacity candidate values
  * (broadcast hash semi-join at the scan) into a ≤ capacity-group agg.
  * The full-vocabulary shuffle never happens.
  */
object ApproxTopK {

  /** Exact counts and ranks of the top-k values of `valueCol`, with
    * candidates from a Misra–Gries pass of the given capacity. */
  def topK(df: DataFrame, valueCol: Column, k: Int,
      capacity: Int = 1024): DataFrame = {
    require(k >= 1 && capacity >= k,
      s"need capacity >= k >= 1, got k=$k capacity=$capacity")
    val spark = df.sparkSession
    import spark.implicits._
    val agg = udaf(new HeavyHittersAgg(capacity))
    val sketch = df.select(valueCol.cast("string").as("__v"))
      .agg(agg(col("__v"))).as[Map[String, Long]].collect()(0)
    val cands = sketch.keys.toSeq.toDF("__v")
    df.select(valueCol.cast("string").as("__v"))
      .join(broadcast(cands), "__v", "left_semi")
      .groupBy("__v").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("__v"))
      .limit(k)
      .select(col("__v").as("value"), col("cnt"))
  }
}
