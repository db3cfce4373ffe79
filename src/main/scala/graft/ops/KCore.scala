package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core extraction — the maximal subgraph in which every vertex keeps
  * degree ≥ k (Seidman 1983), the standard graph-curation screen: a
  * vertex surviving the 3-core participates in a dense region no chain
  * of low-degree hangers-on can fake. Complements the L23/L32/graph
  * family (components, PageRank, triangles).
  *
  * Algorithm: iterative peeling to a fixpoint — drop every vertex whose
  * CURRENT degree is below k, remove its edges, recompute. Each round is
  * one map-side-combinable degree agg plus two anti-join filters on
  * the sub-k vertex set. That set is UNHINTED deliberately: in round
  * one it can be most of the graph (billions of IDs at 100 TB — a
  * forced broadcast would OOM the driver), while near the fixpoint it
  * is tiny — exactly the size flip AQE's runtime join selection
  * handles, and the materialized per-round frame gives it accurate
  * sizes. The only driver state is the per-round continue/stop count —
  * the PageRank one-scalar-per-round discipline. Round count is bounded
  * by the peeling depth (≤ the degeneracy ordering length; in practice a
  * handful), and `localCheckpoint` flattens lineage per round (the
  * ConnectedComponents guard against iterative-plan blowup).
  *
  * Input edges are treated as UNDIRECTED and must not contain
  * self-loops; duplicates are collapsed so degree = distinct neighbors.
  */
object KCore {

  /** Vertices of the k-core of `edges` (columns `src`, `dst`), as a
    * single-column `vertex` frame. */
  def kcore(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    var cur = sym.localCheckpoint()
    var done = false
    while (!done) {
      val deg = cur.groupBy("src").agg(count(lit(1)).as("deg"))
      val bad = deg.filter(col("deg") < k).select(col("src").as("v"))
        .localCheckpoint()
      if (bad.isEmpty) done = true
      else {
        cur = cur
          .join(bad, cur("src") === bad("v"), "left_anti")
          .join(bad, cur("dst") === bad("v"), "left_anti")
          .localCheckpoint()
      }
    }
    cur.select(col("src").as("vertex")).distinct().orderBy("vertex")
  }
}
