package graft

import graft.ops.AnnIvfPq
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ (ops.AnnIvfPq) against the brute-force oracle on sf0.001.
  * Fully deterministic (both trainers seed from the first rows, ties on
  * ids/codes) — thresholds are pinned observations, not tolerances.
  */
class AnnIvfPqSpec extends SparkSpec {
  private val K_COARSE = 4
  private val M = 8
  private val KSUB = 16
  private val TOPK = 10
  private val NPROBE = 2
  private val SHORTLIST = 100

  private lazy val emb = Tables.embeddings(spark, sf0001).cache()
  private lazy val model =
    AnnIvfPq.train(emb, "embedding", "vec_id", K_COARSE, ivfIters = 2,
      M, KSUB, pqIters = 2)
  private lazy val encoded = AnnIvfPq.encode(emb, "embedding", model).cache()

  test("encode yields a byte-sized serving index: cid + m codes in range") {
    assert(encoded.columns.contains("cid") && encoded.columns.contains("codes"))
    assert(encoded.filter(size(col("codes")) =!= M).count() == 0)
    assert(encoded.filter(col("cid") < 0 || col("cid") >= K_COARSE).count() == 0)
    val bad = encoded.filter(exists(col("codes"),
      c => c < 0 || c >= KSUB)).count()
    assert(bad == 0, "every residual code must be in [0, ksub)")
    // residual quantization must not collapse: every subspace uses
    // multiple codes even though all vectors in a bucket share a centroid
    for (s <- 0 until M) {
      val used = encoded.select(element_at(col("codes"), s + 1)).distinct().count()
      assert(used > 1, s"residual subspace $s collapsed to a single code")
    }
  }

  // Same generosity rationale as AnnPqSpec: the synthetic 64-dim corpus
  // has near-uniform pairwise sims (worst case for any quantizer), and
  // nProbe=2/4 prunes half the corpus on top. The operator contract —
  // probed-buckets-only scan, code-only ADC scoring, bounded exact
  // re-rank — is what's under test; real corpora separate far better.
  test("IVF-PQ top-10 recall >= 0.85 over 5 queries at nProbe=2, 20% shortlist") {
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
      val got = AnnIvfPq.topK(encoded.filter(col("vec_id") =!= qid),
          "embedding", "vec_id", model, qv, TOPK, NPROBE, SHORTLIST)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      totalRecall += (exact & got).size.toDouble / TOPK
    }
    val recall = totalRecall / queries.length
    info(f"IVF-PQ recall@$TOPK = $recall%.2f (nProbe=$NPROBE/$K_COARSE)")
    // observed 0.92 — above plain PQ's 0.84 at the same shortlist even
    // though HALF the corpus is pruned before scoring: residual
    // quantization spends the code space on what the coarse quantizer
    // didn't explain
    assert(recall >= 0.85, f"recall $recall%.2f below pinned floor")
  }

  test("topKBatch equals per-query topK for every query") {
    import spark.implicits._
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val batch = AnnIvfPq.topKBatch(encoded, "embedding", "vec_id",
        queries, "qv", "q_id", model, TOPK, NPROBE, SHORTLIST)
      .select("q_id", "vec_id", "rnk", "sim")
      .as[(Long, Long, Int, Double)].collect().toSet
    val single = emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .flatMap { case (qid, qv) =>
        AnnIvfPq.topK(encoded, "embedding", "vec_id", model, qv,
            TOPK, NPROBE, SHORTLIST)
          .collect().map(r => (qid, r.getLong(0), r.getInt(1), r.getDouble(2)))
      }.toSet
    assert(batch == single,
      s"batch/per-query drift: ${(batch diff single).take(3)} vs ${(single diff batch).take(3)}")
  }

  test("a cid-partitioned serving index prunes unprobed buckets at the scan") {
    // the 100 TB serving claim made executable: persist the encoded
    // index partitionBy(cid) (the S6 sink layout the AnnIvf scaladoc
    // prescribes) and check that a probe-list filter reaches the scan
    // as a PARTITION filter — unprobed buckets are never read, so
    // per-query IO is nProbe/k of the index regardless of corpus size
    val dir =
      java.nio.file.Files.createTempDirectory("ivfpq_index").toString + "/index"
    encoded.drop("embedding").write.partitionBy("cid").parquet(dir)
    val index = spark.read.parquet(dir)
    val probed = index.filter(col("cid").isin(0, 1))
    val scan = probed.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[", "").takeWhile(_ != ']')
        .contains("cid"),
      s"probe filter must prune partitions, not scan all buckets:\n$scan")
    assert(probed.count() ==
      encoded.filter(col("cid").isin(0, 1)).count())
  }

  test("shortlist ranking is TakeOrderedAndProject, never a corpus-wide window") {
    val qv = emb.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val top = AnnIvfPq.topK(encoded, "embedding", "vec_id", model, qv,
      TOPK, NPROBE, SHORTLIST)
    val p = top.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"ADC shortlist must be per-partition top-k + merge:\n$p")
    val winIdx = p.indexOf("Window")
    val topIdx = p.indexOf("TakeOrderedAndProject")
    assert(winIdx >= 0 && winIdx < topIdx,
      s"the only window allowed is the rnk attach above the k-row result:\n$p")
    assert(top.count() == TOPK)
  }
}
