package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle enumeration by degree-ordered edge orientation — the
  * classic bounded-wedge shape for distributed triangle counting
  * (public technique: Schank's forward algorithm; Suri & Vassilvitskii,
  * "Counting Triangles and the Curse of the Last Reducer", WWW 2011).
  *
  * Orient every undirected edge from its lower endpoint to its higher
  * endpoint under the total order (degree, id). A triangle with oriented
  * edges u→v, u→w, v→w is then found exactly once: at edge (u, v), as
  * w ∈ N⁺(u) ∩ N⁺(v) (at edge (u, w) it would need v ∈ N⁺(w), which
  * contradicts v→w — so no dedup pass is ever needed).
  *
  * Execution shape — edge-iterator over packed adjacency arrays, not a
  * row-per-wedge join: collect each vertex's out-neighborhood into one
  * array (degree-ordering caps it at O(√m) entries), equi-join the
  * oriented edge list with that adjacency table on BOTH endpoints, and
  * intersect the two arrays per edge. The Θ(Σ outdeg²) wedge work is
  * unavoidable, but here it runs inside `array_intersect` on rows that
  * stay 1-per-EDGE, instead of shuffling 1-row-per-WEDGE through an
  * exchange — on the dense sf0.1 co-purchase graph (3M edges, ~450M
  * wedges) that is the difference between shuffling 3M rows and 450M.
  *
  * Why this survives 100×: degree-ordering bounds every adjacency array
  * at O(√m) — a web-scale star vertex (degree 10⁷) contributes almost
  * nothing because its edges orient INTO it (the "last reducer" of the
  * paper's title dissolves). Both adjacency joins are plain equi-joins
  * on a vertex key; when the oriented-degree-capped adjacency table
  * fits an executor (n·O(√m) longs), pass `broadcastAdj = true` and
  * they become broadcast hash joins with zero extra exchanges.
  */
object Triangles {

  /** Every triangle {x,y,z} in the undirected simple graph induced by
    * `edges` (self-loops dropped, duplicates and direction collapsed),
    * emitted once with x < y < z.
    *
    * @param broadcastAdj broadcast the per-vertex adjacency arrays
    *        (size n·O(√m) longs after orientation) instead of shuffle-
    *        joining them — right whenever that fits comfortably in an
    *        executor; leave false for web-scale vertex counts. */
  def triples(edges: DataFrame, srcCol: String, dstCol: String,
      broadcastAdj: Boolean = false): DataFrame = {
    val canon = edges
      .select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("t"))
      .filter(col("s").isNotNull && col("t").isNotNull && col("s") =!= col("t"))
      .select(least(col("s"), col("t")).as("u"), greatest(col("s"), col("t")).as("v"))
      .distinct()
      // canon feeds the degree census AND the orientation join — cache
      // it, or the caller's whole edge build (q105's fact-sized
      // basket-pair explode) re-executes once per consumer; the later
      // `oriented` cache can't help with that. localCheckpoint, not
      // Dataset.persist: persist pins a CacheManager entry that nothing
      // can ever unpersist (the operator returns a DataFrame; there is
      // no after-the-consumer hook), so every invocation leaks pinned
      // storage for the life of the JVM — across a 409-query bench or
      // the full test suite that crowds the unified-memory store and
      // was measured turning the ScaleCurve 10× runs 3–24× slower.
      // Checkpoint blocks are instead reclaimed by the ContextCleaner
      // as soon as the query's RDDs go unreachable.
      // LAZY here, unlike perVertexWithDeg (r20): under AQE,
      // Dataset.checkpoint calls execute() at CONSTRUCTION, which runs
      // every intermediate stage regardless of the flag — the flag only
      // governs the final stage + block store. Lazy lets the deg/adj
      // broadcast-exchange threads race to materialize that final
      // stage (duplicated task run time), but on this operator the
      // duplicates OVERLAP on otherwise-idle cores and eager's
      // serialized materialization measured 12% WORSE wall on q105
      // (best-of-4 interleaved A/B at sf0.1); perVertexWithDeg's
      // pre-canonicalized input has no distinct stage to duplicate, so
      // eager wins there.
      // Caveat (cluster scale): lineage is truncated once materialized,
      // so executor decommission fails the query into a retry instead
      // of recomputing one partition — under heavy dynamic allocation
      // wrap the call in explicit persist/unpersist instead.
      .localCheckpoint(eager = false)
    // ONE canon block read, not two: explode(array(u,v)) replaces the
    // two-branch union (r20; per-id counts identical)
    val deg = canon.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("d"))
    // degree table is vertex-sized — the same memory class as the
    // adjacency arrays, so under broadcastAdj it rides the same
    // executor-fits assumption and both orientation joins go shuffle-free
    val degA = if (broadcastAdj) broadcast(deg) else deg
    // orient u→v when (deg,id)(u) < (deg,id)(v)
    val orientedBase = canon
      .join(degA.select(col("id").as("u"), col("d").as("du")), "u")
      .join(degA.select(col("id").as("v"), col("d").as("dv")), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("a"),
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("b"))
    // the oriented edge list feeds BOTH sides of the intersect stage
    // (adjacency build + probe); without a cache the whole
    // canon + degree subtree re-executes once per consumer. Dropping
    // this cut under broadcastAdj (re-deriving via two map-side BHJs
    // from canon's blocks) was TRIED in r20 and reverted: together
    // with an eager canon it measured 0.88× on q105 (best-of-4
    // interleaved A/B at sf0.1) — the lazy checkpoint's racing
    // broadcast threads overlap on idle cores and beat the
    // serialized, read-twice form. Kept exactly as r19 shipped it.
    val oriented = orientedBase.localCheckpoint(eager = false)
    // packed out-neighborhoods; sort_array makes rows deterministic AND
    // feeds the merge-scan intersect kernel below
    val adjBase = oriented.groupBy(col("a"))
      .agg(sort_array(collect_list(col("b"))).as("nbrs"))
    val adj = if (broadcastAdj) broadcast(adjBase) else adjBase
    // sortedLongIntersect = array_intersect for sorted distinct long
    // arrays (SimilarityKernelSpec pins the equivalence), but a
    // two-pointer codegen merge instead of a per-row hash set — this
    // runs once per edge and is the hot loop of the whole operator
    oriented
      .join(adj.select(col("a"), col("nbrs").as("na")), Seq("a"))
      .join(adj.select(col("a").as("b"), col("nbrs").as("nb")), Seq("b"))
      .select(col("a"), col("b"),
        explode(graft.functions.SimFns.sortedLongIntersect(
          col("na"), col("nb"))).as("c"))
      .select(
        least(col("a"), col("b"), col("c")).as("x"),
        (col("a") + col("b") + col("c")
          - least(col("a"), col("b"), col("c"))
          - greatest(col("a"), col("b"), col("c"))).as("y"),
        greatest(col("a"), col("b"), col("c")).as("z"))
  }

  /** Per-vertex triangle participation counts (id, n_tri).
    *
    * One explode over a 3-element array, NOT a 3-way union of the
    * triples plan: the union form evaluates the wedge-intersect
    * subtree (the operator's hot loop) once per branch — 3× the whole
    * triangle enumeration — where the explode keeps a single plan
    * branch and only triples the row count into the partial agg
    * (r10: q105 plan showed the intersect join duplicated 3× under
    * the union; BHJ count 6 → 2 after this change). */
  def perVertex(edges: DataFrame, srcCol: String, dstCol: String,
      broadcastAdj: Boolean = false): DataFrame = {
    triples(edges, srcCol, dstCol, broadcastAdj)
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
  }

  /** Per-vertex (id, deg, n_tri) over an ALREADY-CANONICAL edge list —
    * rows are distinct, non-null, and `srcCol` < `dstCol` (the shape
    * every sorted-basket pair build in this repo emits). Vertices with
    * no triangle appear with n_tri = 0.
    *
    * This exists because composing [[perVertex]] with a caller-side
    * degree census pays the canonicalization twice (r19 optimization
    * round, guide §2.4 "remove shuffles outright"): [[triples]] always
    * re-runs least/greatest + DISTINCT (one full exchange + hash agg of
    * the edge list) and builds its own degree table, while the caller
    * (q194) had already materialized both. Here the input is trusted,
    * checkpointed ONCE, and the SAME degree census drives both the
    * orientation join and the returned `deg` column — profiled on q194
    * at sf0.1: one distinct exchange of 3M edges, one ~100 MB
    * checkpoint, and one 2·m-row degree agg removed. */
  def perVertexWithDeg(canonEdges: DataFrame, srcCol: String,
      dstCol: String, broadcastAdj: Boolean = false): DataFrame = {
    val canon = canonEdges
      .select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"))
      // same checkpoint rationale as triples: canon feeds the degree
      // census and the orientation join; EAGER for the same r20
      // broadcast-thread race reason
      .localCheckpoint(eager = true)
    // ONE canon block read, not two (r20, the triples note)
    val deg = canon.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      // vertex-sized; feeds the two orientation probes AND the returned
      // deg column — without a cut the explode+agg pass re-runs per use
      .localCheckpoint(eager = true)
    val degA = if (broadcastAdj) broadcast(deg) else deg
    val orientedBase = canon
      .join(degA.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(degA.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("a"),
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("b"))
    // no cut under broadcastAdj — re-derivation from canon blocks is
    // map-side (r20, the triples note)
    val oriented = if (broadcastAdj) orientedBase
      else orientedBase.localCheckpoint(eager = true)
    val adjBase = oriented.groupBy(col("a"))
      .agg(sort_array(collect_list(col("b"))).as("nbrs"))
    val adj = if (broadcastAdj) broadcast(adjBase) else adjBase
    val tri = oriented
      .join(adj.select(col("a"), col("nbrs").as("na")), Seq("a"))
      .join(adj.select(col("a").as("b"), col("nbrs").as("nb")), Seq("b"))
      .select(explode(graft.functions.SimFns.sortedLongIntersect(
        col("na"), col("nb"))).as("c"), col("a"), col("b"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    deg.join(tri, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }
}
