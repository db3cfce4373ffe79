package graft

import graft.ops.AnnPq
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PQ ANN (ops.AnnPq) against the brute-force oracle on sf0.001. Fully
  * deterministic: codebook seeds are the first ksub sub-vectors,
  * tie-breaks on ids/codes, no RNG — thresholds are pinned
  * observations, not tolerances.
  */
class AnnPqSpec extends SparkSpec {
  private val M = 8
  private val KSUB = 16
  private val TOPK = 10
  private val SHORTLIST = 100

  test("codes are within range and every subspace uses more than one code") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    val model = AnnPq.train(emb, "embedding", "vec_id", M, KSUB, iters = 2)
    assert(model.codebooks.length == M)
    assert(model.codebooks.forall(_.length == KSUB))
    assert(model.codebooks.forall(_.forall(_.length == model.dsub)))

    val encoded = AnnPq.encode(emb, "embedding", model).cache()
    assert(encoded.filter(size(col("codes")) =!= M).count() == 0)
    val bad = encoded.filter(exists(col("codes"),
      c => c < 0 || c >= KSUB)).count()
    assert(bad == 0, "every code must be in [0, ksub)")
    // a degenerate codebook would collapse all rows onto one code
    for (s <- 0 until M) {
      val used = encoded.select(element_at(col("codes"), s + 1)).distinct().count()
      assert(used > 1, s"subspace $s collapsed to a single code")
    }
  }

  test("train fails fast on a corpus smaller than ksub") {
    // ADVICE r3/r4: a too-small corpus must throw, never silently train
    // a collapsed codebook with duplicate/missing centroids
    val emb = Tables.embeddings(spark, sf0001).filter(col("vec_id") < KSUB - 1)
    val e = intercept[IllegalArgumentException] {
      AnnPq.train(emb, "embedding", "vec_id", M, KSUB, iters = 1)
    }
    assert(e.getMessage.contains(s"ksub=$KSUB"))
  }

  test("train fails fast when seed rows collapse to duplicate sub-vectors") {
    import spark.implicits._
    // 2*ksub copies of one vector: every subspace has exactly 1 distinct
    // seed sub-vector — enough rows, but a degenerate code space
    val dup = (0 until KSUB * 2).map(i =>
      (i.toLong, Array.fill(16)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      AnnPq.train(dup, "embedding", "vec_id", m = 4, KSUB, iters = 1)
    }
    assert(e.getMessage.contains("distinct seed sub-vectors"))
  }

  // Shortlist is deliberately generous (20%): the synthetic 64-dim
  // corpus has near-uniform pairwise sims (concentration of measure), a
  // worst case for any quantizer — m=4 and m=8 shortlists capture the
  // same true neighbors here. Real embedding corpora separate far
  // better; the operator contract (ADC never touches float vectors,
  // shortlist bounds the exact re-rank) is what's under test.
  test("PQ top-10 recall >= 0.8 over 5 queries through a 20%-of-corpus shortlist") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    val model = AnnPq.train(emb, "embedding", "vec_id", M, KSUB, iters = 3)
    val encoded = AnnPq.encode(emb, "embedding", model).cache()

    val queries = emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)

    var totalRecall = 0.0
    for ((qid, qv) <- queries) {
      val cands = emb.filter(col("vec_id") =!= qid)
      val w = Window.orderBy(col("sim").desc, col("vec_id"))
      val exact = cands
        .withColumn("sim", round(graft.ops.VectorQueries.cosine(col("embedding"),
          typedlit(qv)), 6))
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= TOPK)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val approx = AnnPq.topK(encoded.filter(col("vec_id") =!= qid),
          "embedding", "vec_id", model, qv, TOPK, SHORTLIST)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      totalRecall += (exact & approx).size.toDouble / TOPK
    }
    val recall = totalRecall / queries.length
    info(s"recall@$TOPK = $recall (shortlist ${SHORTLIST.toDouble / 500} of corpus)")
    assert(recall >= 0.8, s"recall $recall < 0.8")
  }

  test("ADC ranking plans TakeOrderedAndProject, never a global window over the corpus") {
    val emb = Tables.embeddings(spark, sf0001)
    val model = AnnPq.train(emb, "embedding", "vec_id", M, KSUB, iters = 1)
    val encoded = AnnPq.encode(emb, "embedding", model)
    val qv = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val top = AnnPq.topK(encoded, "embedding", "vec_id", model, qv,
      TOPK, SHORTLIST)
    val p = top.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"both ranking stages must be per-partition top-k + merge:\n$p")
    val winIdx = p.indexOf("Window")
    val topIdx = p.indexOf("TakeOrderedAndProject")
    assert(winIdx < topIdx,
      s"a ranking window below the top-k would single-partition the corpus:\n$p")
    assert(top.count() == TOPK)
  }
}
