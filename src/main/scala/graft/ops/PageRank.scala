package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank (Page et al., 1999) over an edge DataFrame —
  * the remaining classic of the iterative-graph family next to
  * [[ConnectedComponents]]: per iteration, every vertex sends its rank
  * mass down its (optionally weighted) out-edges, and ranks re-form as
  * `(1−d)/N + d·(received + danglingMass/N)` — dangling vertices (no
  * out-edges) redistribute uniformly, so total mass stays 1 and the
  * result is a probability distribution.
  *
  * Scale shape, mirroring ConnectedComponents: each iteration is ONE
  * hash equi-join (ranks ⋈ edges on src, both hash-partitioned on the
  * key, so the partitioning is reused across iterations) plus one
  * map-side-combinable sum per destination; the driver moves only two
  * scalars per iteration (the dangling-mass sum; N once up front) —
  * never vertex data. `localCheckpoint` truncates lineage each round so
  * plans stay O(1) deep regardless of iteration count. O(iters) rounds,
  * driver-synchronized — the standard Pregel-without-Pregel trade.
  */
object PageRank {

  /** Ranks after `iters` damped iterations: (id, rank) with
    * Σ rank = 1. Parallel edges are pre-merged (weights summed);
    * `weightCol = None` means every edge weighs 1, Some(w) sends mass
    * proportionally to w. Vertices = src ∪ dst of `edges`. */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: Option[String] = None, damping: Double = 0.85,
      iters: Int = 10): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    val w = weightCol.map(col(_).cast("double")).getOrElse(lit(1.0))
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), w.as("w"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .groupBy("src", "dst").agg(sum("w").as("w"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().localCheckpoint()
    val outW = e.groupBy("src").agg(sum("w").as("tw"))
    val n = nodes.count()
    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    var it = 0
    while (it < iters) {
      val withOut = ranks.join(outW,
        ranks("id") === outW("src"), "left")
      // dangling vertices have no outW row; their mass teleports
      val dangling = withOut.filter(col("tw").isNull)
        .agg(coalesce(sum("rank"), lit(0.0))).head().getDouble(0)
      val received = e.join(outW, "src")
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          (col("rank") * col("w") / col("tw")).as("m"))
        .groupBy("id").agg(sum("m").as("m"))
      ranks = nodes.join(received, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("m"), lit(0.0)) + lit(dangling / n)))
            .as("rank"))
        .localCheckpoint()
      it += 1
    }
    ranks
  }
}
