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
  * missed at nProbe = 1 — [[assignMulti]] (multi-probe assignment, the
  * same remedy IVF search uses) recovers those pairs by also pairing
  * each vector in its runner-up clusters; SemanticDedupSpec measures
  * both the miss and the recovery against the brute-force oracle. At
  * 100 TB, train the model on a sample (train cost is iters × corpus
  * aggregations) and raise k with corpus size.
  */
object SemanticDedup {

  /** One row per (vector, probed bucket): each vector lands in its
    * `nProbe` nearest clusters instead of only the nearest — the
    * standard multi-probe fix for SemDeDup's one recall hole, near-dup
    * pairs straddling a cluster boundary (both members sit close to the
    * same boundary, so each other's cluster is almost always the
    * runner-up probe). Probe order matches `IvfModel.nearestCentroids`
    * exactly (shared `probesExpr`). Pair volume grows by at most
    * nProbe× rows per cluster (Σ|cluster|² ≤ nProbe²·n²/k with the same
    * n/k executor sizing); dedup output is unchanged in shape because
    * [[candidatePairs]] de-duplicates pairs found in two shared
    * buckets. Still map-only: k fused cosines per row, no shuffle. */
  def assignMulti(emb: DataFrame, vecCol: String, model: AnnIvf.IvfModel,
      nProbe: Int): DataFrame =
    emb.withColumn("cid",
      explode(AnnIvf.probesExpr(col(vecCol), model.centroids, nProbe)))

  /** Within-cluster candidate near-dup pairs at cosine ≥ tau over a
    * corpus that already carries a `cid` cluster column (from
    * `AnnIvf.assign`, or [[assignMulti]] with one row per probed
    * bucket). Exact cosines (fused kernel, no rounding): precision is 1
    * by construction; only recall depends on the clustering. Returns
    * (id_a, id_b, sim) with id_a < id_b, each pair once even when it
    * co-occurs in several probed buckets (the distinct is exact: the
    * fused kernel is deterministic, so duplicate findings carry
    * bit-identical sims; its shuffle is output-sized — ∝ near-dups,
    * never corpus-sized). */
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
      .distinct()
  }

  /** Full pipeline: train k-means (deterministic seeds), assign each
    * vector to its `nProbe` nearest clusters, pair within clusters at
    * cosine ≥ tau, transitively close, and label every row. Returns one
    * row per input row: (idCol, rep, is_dup) where `rep` is the lowest
    * id of the row's duplicate group (its own id when unique) — keep
    * `!is_dup` rows for the deduplicated corpus, or join `rep` back to
    * re-attach dropped rows to their survivor. nProbe = 1 is classic
    * SemDeDup (boundary pairs missed); nProbe = 2 closes most of that
    * hole for ≤ 4× the pair-join work (SemanticDedupSpec measures the
    * recovery against the brute-force oracle). */
  def dedup(emb: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int, tau: Double, nProbe: Int = 1): DataFrame = {
    val model = AnnIvf.train(emb, vecCol, idCol, k, iters)
    val assigned =
      if (nProbe <= 1) AnnIvf.assign(emb, vecCol, model)
      else assignMulti(emb, vecCol, model, nProbe)
    val pairs = candidatePairs(assigned, vecCol, idCol, tau)
    val comps = ConnectedComponents.components(pairs, "id_a", "id_b")
    emb.select(col(idCol).cast("long").as("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("component"), col("id")).as("rep"))
      .withColumn("is_dup", col("rep") =!= col(idCol))
  }
}
