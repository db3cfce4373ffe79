package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One MMR selection: `pick` is 1-based selection order, `relevance`
  * the query cosine, `marginal` the MMR objective at pick time. */
case class MmrPick(q_id: Long, pick: Int, id: Long, relevance: Double,
    marginal: Double)

/** Maximal Marginal Relevance (MMR) diversified retrieval — the
  * re-ranking step between "top-k most similar" (L7) and what a RAG /
  * few-shot-selection pipeline actually wants: k results that are
  * relevant AND non-redundant. Plain cosine top-k over a deduplicated
  * crawl still returns five paraphrases of the same passage; MMR
  * greedily picks argmax of λ·rel(c) − (1−λ)·max_{s∈selected} sim(c,s),
  * trading relevance against similarity to what's already chosen.
  *
  * Scale split (the AnnIvf/Pca contract — cluster for data-sized work,
  * driver/executor for model-sized work):
  *
  *  1. CLUSTER: relevance scoring is the codegen'd cosine kernel over
  *    the full corpus (or an AnnIvf probe — any candidate generator
  *    DataFrame works), then `poolSize` survivors per query — never a
  *    global sort.
  *  2. POOL: the greedy MMR loop runs on the pool only — poolSize
  *    vectors, O(pool²) sims, both bounded by a constant the caller
  *    picks (50–500), independent of corpus size. Single-query form
  *    runs it on the driver; [[diversifiedTopKBatch]] runs one greedy
  *    per query key inside `mapGroups`, so a fleet of queries
  *    parallelizes across executors with pool-bounded state per key.
  *
  * Determinism: ties in the greedy argmax break by (score desc, id
  * asc) — a total order, so results are partitioning-independent. */
object Mmr {

  /** The O(pool²) greedy loop, shared by the driver-side single-query
    * form and the executor-side batch form so the tie-break contract
    * lives in one place. Pool order does not matter: the argmax is a
    * total order (score desc, id asc). */
  private def greedy(pool: Seq[(Long, Array[Double], Double)], k: Int,
      lambda: Double): Seq[(Long, Double, Double)] = {
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

  /** Greedy MMR over the `poolSize` highest-cosine candidates.
    * Returns (id, relevance, marginalScore) in selection order.
    * The vector column may be array<float> or array<double> — both are
    * standardized to double before the driver reads them. */
  def diversifiedTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Array[Float], k: Int, lambda: Double = 0.7,
      poolSize: Int = 100): Seq[(Long, Double, Double)] = {
    require(k >= 1 && poolSize >= k, s"need poolSize >= k >= 1")
    require(lambda >= 0 && lambda <= 1, s"lambda in [0,1], got $lambda")
    val rel = graft.functions.SimFns.cosineSim(col(vecCol),
      typedlit(query.toSeq))
    // TakeOrderedAndProject: per-partition top-pool, merge on driver
    val pool = df.select(col(idCol).cast("long").as("id"),
        expr(s"transform($vecCol, x -> cast(x as double))").as("v"),
        rel.as("rel"))
      .orderBy(col("rel").desc, col("id"))
      .limit(poolSize)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    greedy(pool.toSeq, k, lambda)
  }

  /** Batch form of [[diversifiedTopK]]: MMR-diversified top-k for EVERY
    * query row in one distributed plan — the serving shape at scale,
    * where looping the single form would schedule one job per query.
    *
    * The corpus is scored against the broadcast query fleet (queries ×
    * corpus rows, zero corpus shuffle), a per-query ranking window
    * keeps the `poolSize` best candidates WITH their vectors — only
    * |queries| × poolSize rows carry vectors past the exchange — and
    * one greedy per query key runs inside `mapGroups` with
    * pool-bounded state. Per-query results are identical to
    * [[diversifiedTopK]] calls (pinned in MmrSpec). */
  def diversifiedTopKBatch(df: DataFrame, vecCol: String, idCol: String,
      queries: DataFrame, qVecCol: String, qIdCol: String, k: Int,
      lambda: Double = 0.7, poolSize: Int = 100): DataFrame = {
    require(k >= 1 && poolSize >= k, s"need poolSize >= k >= 1")
    require(lambda >= 0 && lambda <= 1, s"lambda in [0,1], got $lambda")
    val q = queries.select(col(qIdCol).cast("long").as("q_id"),
      col(qVecCol).as("qv"))
    val scored = df.select(col(idCol).cast("long").as("id"),
        expr(s"transform($vecCol, x -> cast(x as double))").as("v"))
      .crossJoin(broadcast(q))
      .withColumn("rel",
        graft.functions.SimFns.cosineSim(col("v"), col("qv")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("rel").desc, col("id"))
    val pool = scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= poolSize)
      .select(col("q_id"), col("id"), col("v"), col("rel"))
    implicit val outEnc = Encoders.product[MmrPick]
    pool.groupByKey(r => r.getLong(0))(Encoders.scalaLong)
      .flatMapGroups { (qid, rows) =>
        val p = rows.map(r => (r.getLong(1),
          r.getSeq[Double](2).toArray, r.getDouble(3))).toSeq
        greedy(p, k, lambda).zipWithIndex.iterator.map {
          case ((id, rel, marg), i) => MmrPick(qid, i + 1, id, rel, marg)
        }
      }
      .toDF()
  }
}
