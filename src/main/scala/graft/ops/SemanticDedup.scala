package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SimFns

/** Semantic (embedding-space) deduplication — the SemDeDup shape
  * (Abbas et al., arXiv:2303.09540): k-means-partition the embedding
  * space, compare pairs ONLY within a cluster, transitively close the
  * near-dup pairs, and keep one representative (lowest id) per group.
  * Composes the engine's existing pieces — `AnnIvf.train/assign` for
  * the coarse partition, the fused codegen cosine kernel for scoring,
  * and `ConnectedComponents` for grouping — so every stage inherits
  * their determinism contracts (no RNG seeds, id tie-breaks).
  *
  * Scale story (the reason SemDeDup exists): brute-force near-dup
  * search is |corpus|² cosines; clustering first makes it
  * Σ|cluster|² ≈ n²/k — choose k so n/k vectors fit one executor's
  * working set and the per-cluster block is a local problem. Assignment
  * is map-only (k fused cosines per row, no shuffle), the pair join is
  * a cid-equi-join (hash-partitioned, never a cross product), and the
  * closure is the sub-quadratic hash-to-min propagation. The documented
  * approximation: a near-dup pair straddling a cluster boundary is
  * missed — SemanticDedupSpec measures exactly this against the
  * brute-force oracle. At 100 TB, train the model on a sample (train
  * cost is iters × corpus aggregations) and raise k with corpus size.
  */
object SemanticDedup {

  /** Within-cluster candidate near-dup pairs at cosine ≥ tau over a
    * corpus that already carries a `cid` cluster column (from
    * `AnnIvf.assign`). Exact cosines (fused kernel, no rounding):
    * precision is 1 by construction; only recall depends on the
    * clustering. Returns (id_a, id_b, sim) with id_a < id_b. */
  def candidatePairs(assigned: DataFrame, vecCol: String, idCol: String,
      tau: Double): DataFrame = {
    val a = assigned.select(col("cid"),
      col(idCol).cast("long").as("id_a"), col(vecCol).as("va"))
    val b = assigned.select(col("cid"),
      col(idCol).cast("long").as("id_b"), col(vecCol).as("vb"))
    a.join(b.hint("shuffle_hash"), "cid")
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", SimFns.cosineSim(col("va"), col("vb")))
      .filter(col("sim") >= tau)
      .select("id_a", "id_b", "sim")
  }

  /** Full pipeline: train k-means (deterministic seeds), assign, pair
    * within clusters at cosine ≥ tau, transitively close, and label
    * every row. Returns one row per input row: (idCol, rep, is_dup)
    * where `rep` is the lowest id of the row's duplicate group (its own
    * id when unique) — keep `!is_dup` rows for the deduplicated corpus,
    * or join `rep` back to re-attach dropped rows to their survivor. */
  def dedup(emb: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int, tau: Double): DataFrame = {
    val model = AnnIvf.train(emb, vecCol, idCol, k, iters)
    val assigned = AnnIvf.assign(emb, vecCol, model)
    val pairs = candidatePairs(assigned, vecCol, idCol, tau)
    val comps = ConnectedComponents.components(pairs, "id_a", "id_b")
    emb.select(col(idCol).cast("long").as("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("component"), col("id")).as("rep"))
      .withColumn("is_dup", col("rep") =!= col(idCol))
  }
}
