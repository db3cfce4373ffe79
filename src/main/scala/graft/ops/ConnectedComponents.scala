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
    val sym = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges
        .select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      // a null endpoint identifies nothing — drop the edge rather than
      // propagate null labels through the joins
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    // fold a self-edge per vertex into the adjacency: one join + one
    // aggregation then yields BOTH min(self, neighbors) — the update —
    // and the self row's label — the previous value for the convergence
    // check — instead of a second (left) join per round
    val symPlus = sym
      .union(sym.select(col("src"), col("src").as("dst")).distinct())
      .localCheckpoint()

    var labels = symPlus.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val updated = symPlus
        .join(labels.withColumnRenamed("id", "nid"), col("dst") === col("nid"))
        .groupBy(col("src"))
        .agg(min(col("component")).as("next"),
          // exactly one self row per src carries the previous label
          min(when(col("dst") === col("src"), col("component"))).as("prev"))
        .localCheckpoint()
      changed = updated.filter(col("next") =!= col("prev")).count()
      labels = updated.select(col("src").as("id"), col("next").as("component"))
      it += 1
    }
    require(changed == 0,
      s"label propagation did not converge in $maxIters rounds")
    labels
  }
}
