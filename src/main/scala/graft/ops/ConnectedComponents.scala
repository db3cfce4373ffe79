package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the step
  * that turns record-linkage match PAIRS (q83) into ENTITIES: every
  * record in a transitively-connected cluster gets the cluster's
  * smallest id as its entity id. (Public technique: label propagation /
  * "hash-to-min", e.g. Rastogi et al., "Finding Connected Components
  * in Map-Reduce in Logarithmic Rounds", ICDE 2013.)
  *
  * Each iteration is one hash-partitioned join + partial-aggregated
  * min — no driver-side graph, no GraphX/RDDs. Converges in
  * O(component diameter) rounds; dedup/linkage clusters are shallow
  * (near-cliques), so 3–5 rounds in practice. The driver loop only
  * moves a changed-row COUNT per round, and `localCheckpoint`
  * truncates the growing lineage each round (the standard guard for
  * iterative DataFrame algorithms — without it analysis cost doubles
  * every iteration).
  */
object ConnectedComponents {

  /** Component labels for every vertex that appears in `edges`
    * (undirected; self-loops fine). Returns (id, component) where
    * component = the smallest vertex id reachable. */
  def components(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 25): DataFrame = {
    // ONE pass over the (possibly expensive) caller edge build and ONE
    // distinct shuffle (r20, guide §2.4): each input edge explodes to
    // both directed orientations PLUS both endpoints' self-edges —
    // previously three union branches over two subtrees with two
    // distincts. The self-edge per vertex makes one join + one
    // aggregation yield BOTH min(self, neighbors) — the update — and
    // the self row's label — the previous value for the convergence
    // check. A null endpoint identifies nothing — drop the edge rather
    // than propagate null labels through the joins.
    val symPlus = edges
      .select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("t"))
      .filter(col("s").isNotNull && col("t").isNotNull)
      .select(explode(array(
        struct(col("s").as("src"), col("t").as("dst")),
        struct(col("t").as("src"), col("s").as("dst")),
        struct(col("s").as("src"), col("s").as("dst")),
        struct(col("t").as("src"), col("t").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .localCheckpoint()

    // round 1 needs no label join: labels start as identity, so each
    // neighbor's component IS its id and min(dst) is the round-1 update
    // (prev = the self row's id). This also removes the initial
    // vertex-distinct + checkpoint the identity frame used to cost.
    var labels: DataFrame = null
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val updated = (if (it == 0)
        symPlus.groupBy(col("src"))
          .agg(min(col("dst")).as("next"),
            min(when(col("dst") === col("src"), col("dst"))).as("prev"))
      else
        symPlus
          .join(labels.withColumnRenamed("id", "nid"), col("dst") === col("nid"))
          .groupBy(col("src"))
          .agg(min(col("component")).as("next"),
            // exactly one self row per src carries the previous label
            min(when(col("dst") === col("src"), col("component"))).as("prev")))
        // LAZY cut + count as the materializing action: the filter-count
        // below stores the round's blocks AND moves the changed count in
        // ONE job, where the previous eager checkpoint + count pair paid
        // two (r20, verdict mandate #4 — the CC consumers q84/q90/q279
        // spend ~30 jobs/query on round scheduling). No consumer races
        // the lazy materialization: the count is synchronous and the
        // next round's join only starts after it returns.
        .localCheckpoint(eager = false)
      changed = updated.filter(col("next") =!= col("prev")).count()
      labels = updated.select(col("src").as("id"), col("next").as("component"))
      it += 1
    }
    require(changed == 0,
      s"label propagation did not converge in $maxIters rounds")
    labels
  }
}
