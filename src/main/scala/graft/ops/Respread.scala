package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.xxhash64

/** Scale-adaptive re-spread for CPU-heavy kernels fused over narrow
  * scans (r19 optimization round, guide §2.5/§6).
  *
  * A small parquet fixture arrives as ONE file split (openCostInBytes
  * floors the split size), so every expression kernel fused into the
  * scan stage — pair-product explodes, tokenizers, per-vector math —
  * runs serially no matter how many cores the session has. At
  * production scale the same scan has hundreds of splits and needs no
  * help; blindly repartitioning there would add a full shuffle of the
  * payload for nothing (guide §2.3: shuffle fewer bytes).
  *
  * So the decision is made from the DataFrame's ACTUAL physical
  * partition count at plan time: only when it is narrower than the
  * context's default parallelism does the frame get one deterministic
  * hash re-spread (explicit partition count so AQE's byte-based
  * coalescing cannot undo it — the whole point is that these stages
  * are CPU-bound, not byte-bound). `getNumPartitions` needs only the
  * file listing (memoized in [[graft.Tables]]); no job runs.
  */
object Respread {
  def ifNarrow(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target)
      df.repartition(target, xxhash64(key))
    else df
  }
}
