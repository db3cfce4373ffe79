package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance (MMR) diversified retrieval — the
  * re-ranking step between "top-k most similar" (L7) and what a RAG /
  * few-shot-selection pipeline actually wants: k results that are
  * relevant AND non-redundant. Plain cosine top-k over a deduplicated
  * crawl still returns five paraphrases of the same passage; MMR
  * greedily picks argmax of λ·rel(c) − (1−λ)·max_{s∈selected} sim(c,s),
  * trading relevance against similarity to what's already chosen.
  *
  * Scale split (the AnnIvf/Pca contract — cluster for data-sized work,
  * driver for model-sized work):
  *
  *  1. CLUSTER: relevance scoring is the codegen'd cosine kernel over
  *    the full corpus (or an AnnIvf probe — any candidate generator
  *    DataFrame works), then `poolSize` survivors via TakeOrdered —
  *    never a global sort.
  *  2. DRIVER: the greedy MMR loop runs on the pool only — poolSize
  *    vectors, O(pool²) sims, both bounded by a constant the caller
  *    picks (50–500), independent of corpus size.
  *
  * Determinism: ties in the greedy argmax break by (score desc, id
  * asc) — a total order, so results are partitioning-independent. */
object Mmr {

  /** Greedy MMR over the `poolSize` highest-cosine candidates.
    * Returns (id, relevance, marginalScore) in selection order. */
  def diversifiedTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Array[Float], k: Int, lambda: Double = 0.7,
      poolSize: Int = 100): Seq[(Long, Double, Double)] = {
    require(k >= 1 && poolSize >= k, s"need poolSize >= k >= 1")
    require(lambda >= 0 && lambda <= 1, s"lambda in [0,1], got $lambda")
    val rel = graft.functions.SimFns.cosineSim(col(vecCol),
      typedlit(query.toSeq))
    // TakeOrderedAndProject: per-partition top-pool, merge on driver
    val pool = df.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("v"), rel.as("rel"))
      .orderBy(col("rel").desc, col("id"))
      .limit(poolSize)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getDouble(2)))
    if (pool.isEmpty) return Seq.empty
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    val selVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val remaining = scala.collection.mutable.LinkedHashMap(
      pool.map(p => p._1 -> p): _*)
    while (selected.size < k && remaining.nonEmpty) {
      val best = remaining.values.map { case (id, v, r) =>
        val redundancy =
          if (selVecs.isEmpty) 0.0 else selVecs.map(sv => cos(v, sv)).max
        (id, v, r, lambda * r - (1.0 - lambda) * redundancy)
      }.reduceLeft { (a, b) =>
        if (b._4 > a._4 || (b._4 == a._4 && b._1 < a._1)) b else a
      }
      selected += ((best._1, best._3, best._4))
      selVecs += best._2
      remaining.remove(best._1)
    }
    selected.toSeq
  }
}
