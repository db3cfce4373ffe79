package graft

import graft.ops.Mmr

/** MMR must trade relevance against redundancy: with λ=1 it IS cosine
  * top-k; below 1 a near-duplicate of an already-selected result must
  * lose to a diverse, slightly-less-relevant one. */
class MmrSpec extends SparkSpec {

  // NOTE the fixture deliberately keeps the best candidates OFF the
  // query axis: if the first pick pointed exactly at the query, every
  // candidate's redundancy to it would equal its relevance and all
  // marginal scores would tie — no diversity effect to observe.
  private def fixture() = {
    import spark.implicits._
    Seq(
      (1L, Array(0.9f, 0.3f, 0.0f)),   // most relevant (ties 3, id wins)
      (2L, Array(0.9f, 0.31f, 0.0f)),  // near-duplicate of 1 (cos ≈ 0.99994)
      (3L, Array(0.9f, -0.3f, 0.0f)),  // equally relevant, diverse (cos 0.8 to 1)
      (4L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to the query
      (5L, Array(0.0f, 0.0f, 1.0f))    // orthogonal to everything relevant
    ).toDF("vec_id", "embedding")
  }
  private val query = Array(1.0f, 0.0f, 0.0f)

  test("lambda = 1 reduces to plain cosine top-k") {
    val got = Mmr.diversifiedTopK(fixture(), "embedding", "vec_id", query,
      k = 3, lambda = 1.0, poolSize = 5).map(_._1)
    assert(got == Seq(1L, 3L, 2L),
      s"pure relevance must keep the near-duplicate in top-3: $got")
  }

  test("a near-duplicate is pushed out entirely at lambda = 0.5") {
    val got = Mmr.diversifiedTopK(fixture(), "embedding", "vec_id", query,
      k = 3, lambda = 0.5, poolSize = 5)
    // 2's redundancy to 1 (≈1) swamps its relevance; even the
    // query-orthogonal 5 (marginal 0) beats its negative marginal
    assert(got.map(_._1) == Seq(1L, 3L, 5L),
      s"the near-dup of #1 must be excluded: $got")
    // relevance reported is the true cosine, not the marginal score
    assert(math.abs(got.head._2 - 0.9 / math.sqrt(0.9)) < 1e-6)
  }

  test("accepts array<double> vectors (e.g. a raw Pca.project output)") {
    import org.apache.spark.sql.functions.expr
    val dbl = fixture().withColumn("embedding",
      expr("transform(embedding, x -> cast(x as double))"))
    val got = Mmr.diversifiedTopK(dbl, "embedding", "vec_id", query,
      k = 3, lambda = 0.5, poolSize = 5)
    assert(got.map(_._1) == Seq(1L, 3L, 5L),
      s"double vectors must rank identically to float: $got")
  }

  test("batch form matches per-query sequential calls on the embeddings fixture") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val batch = Mmr.diversifiedTopKBatch(emb, "embedding", "vec_id",
        queries, "qv", "q_id", k = 8, lambda = 0.7, poolSize = 40)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val qVecs = queries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    qVecs.foreach { case (qid, qv) =>
      val seqr = Mmr.diversifiedTopK(emb, "embedding", "vec_id", qv,
        k = 8, lambda = 0.7, poolSize = 40)
      seqr.zipWithIndex.foreach { case ((id, rel, marg), i) =>
        val (bid, brel, bmarg) = batch((qid, i + 1))
        assert(bid == id, s"q$qid pick ${i + 1}: batch $bid vs seq $id")
        assert(math.abs(brel - rel) < 1e-9 && math.abs(bmarg - marg) < 1e-9,
          s"q$qid pick ${i + 1}: scores diverge")
      }
    }
    assert(batch.size == 4 * 8, "every query must yield exactly k picks")
  }

  test("partitioning-independent and pool-bounded on the embeddings fixture") {
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.select("embedding").head().getSeq[Float](0).toArray
    val a = Mmr.diversifiedTopK(emb, "embedding", "vec_id", q,
      k = 10, lambda = 0.7, poolSize = 50)
    val b = Mmr.diversifiedTopK(emb.repartition(13), "embedding", "vec_id", q,
      k = 10, lambda = 0.7, poolSize = 50)
    assert(a == b, "MMR selection must not depend on partitioning")
    assert(a.size == 10 && a.map(_._1).distinct.size == 10)
    // marginal scores are non-increasing in selection order only for
    // the FIRST pick vs later ones is not guaranteed; but relevance of
    // pick 1 must be the pool max
    assert(a.head._2 >= a.map(_._2).max - 1e-12)
  }
}
