package graft

import graft.ops.AnnIvf
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF ANN (ops.AnnIvf) recall against the brute-force oracle on
  * sf0.001. Fully deterministic: k-means seeds are the first k vectors,
  * tie-breaks on ids, no RNG — thresholds are pinned observations, not
  * tolerances.
  */
class AnnIvfSpec extends SparkSpec {
  private val K = 8
  private val TOPK = 10
  private val NPROBE = 3

  test("train fails fast on a corpus smaller than k") {
    // same validation contract as AnnPq.train (r5): never silently
    // train a collapsed coarse quantizer
    val emb = Tables.embeddings(spark, sf0001).filter(col("vec_id") < K - 1)
    val e = intercept[IllegalArgumentException] {
      AnnIvf.train(emb, "embedding", "vec_id", K, iters = 1)
    }
    assert(e.getMessage.contains(s"k=$K"))
  }

  test("train fails fast when seed rows collapse to duplicate vectors") {
    import spark.implicits._
    val dup = (0 until K * 2).map(i =>
      (i.toLong, Array.fill(16)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      AnnIvf.train(dup, "embedding", "vec_id", K, iters = 1)
    }
    assert(e.getMessage.contains("distinct seed vectors"))
  }

  test("IVF top-10 recall >= 0.7 over 5 queries while probing < half the corpus") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    val n = emb.count()
    val model = AnnIvf.train(emb, "embedding", "vec_id", K, iters = 3)
    val assigned = AnnIvf.assign(emb, "embedding", model).cache()

    // buckets must cover the corpus and leave no empty cluster behind
    val sizes = assigned.groupBy("cid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.values.sum == n)

    val queries = emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)

    var totalRecall = 0.0
    var probedRows = 0L
    for ((qid, qv) <- queries) {
      val cands = emb.filter(col("vec_id") =!= qid)
      val w = Window.orderBy(col("sim").desc, col("vec_id"))
      val exact = cands
        .withColumn("sim", round(graft.ops.VectorQueries.cosine(col("embedding"),
          typedlit(qv)), 6))
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= TOPK)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val approx = AnnIvf.topK(assigned.filter(col("vec_id") =!= qid),
          "embedding", "vec_id", model, qv, TOPK, NPROBE)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      totalRecall += (exact & approx).size.toDouble / TOPK
      probedRows += model.nearestCentroids(qv, NPROBE).map(c =>
        sizes.getOrElse(c, 0L)).sum
    }
    val recall = totalRecall / queries.length
    val probedFrac = probedRows.toDouble / (n * queries.length)
    info(s"recall@$TOPK = $recall, probed fraction = $probedFrac")
    assert(recall >= 0.7, s"recall $recall < 0.7")
    assert(probedFrac < 0.5, s"probed $probedFrac of corpus — no scan reduction")
  }

  test("topKBatch == per-query topK for every query, in one distributed plan") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    val model = AnnIvf.train(emb, "embedding", "vec_id", K, iters = 2)
    val assigned = AnnIvf.assign(emb, "embedding", model)
      .filter(col("vec_id") >= 5).cache()
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding"))

    val batch = AnnIvf.topKBatch(assigned, "embedding", "vec_id",
        queries, "embedding", "qid", model, TOPK, NPROBE)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> (r.getLong(1), r.getDouble(3)))
      .toMap

    val single = queries.collect().flatMap { row =>
      val qid = row.getLong(0)
      val qv = row.getSeq[Float](1).toArray
      AnnIvf.topK(assigned, "embedding", "vec_id", model, qv, TOPK, NPROBE)
        .collect()
        .map(r => (qid, r.getInt(1)) -> (r.getLong(0), r.getDouble(2)))
    }.toMap

    assert(batch.size == single.size)
    assert(batch == single,
      s"batch/single diverged on: ${(batch.toSet diff single.toSet).take(5)}")
  }
}
