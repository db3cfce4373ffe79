package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._

/** L5 (SURVEY.md §2.8): MLlib MinHashLSH as the sub-quadratic similarity
  * join, validated by recall against the exact token-jaccard join on
  * sf0.001. The exact join is the oracle-checked path (q49); this is the
  * scale path — approxSimilarityJoin shuffles on band keys instead of
  * materializing all O(n²) pairs. */
class LshRecallSpec extends SparkSpec {

  /** Exact-vs-LSH recall on one fixture dir; asserts recall >= 0.8.
    *
    * Ground truth: `bruteTruth = true` runs the O(n²) cross-join
    * (fully independent of repo machinery — right for the small SF);
    * `false` runs `PrefixJoin.jaccardJoin`, the repo's LOSSLESS
    * AllPairs operator (itself proven equal to brute force at sf0.001
    * in PrefixJoinSpec) — the only tractable exact truth for the 5,000
    * -doc corpus, and an honest one because it is exact by theorem,
    * not approximation. */
  private def recallGate(sfDir: String, bruteTruth: Boolean): Unit = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
      .filter(size(col("toks")) > 0)
      .cache()

    // exact ground truth: all pairs with token-jaccard >= 0.6
    val exact: Set[(Long, Long)] =
      if (bruteTruth) {
        val a = docs.select(col("doc_id").as("ida"), col("toks").as("ta"))
        val b = docs.select(col("doc_id").as("idb"), col("toks").as("tb"))
        val inter = size(array_intersect(col("ta"), col("tb"))).cast("double")
        val uni = (size(col("ta")) + size(col("tb"))).cast("double") -
          size(array_intersect(col("ta"), col("tb")))
        a.crossJoin(b).filter(col("ida") < col("idb"))
          .withColumn("jac", inter / uni)
          .filter(col("jac") >= 0.6)
          .select("ida", "idb").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      } else
        graft.ops.PrefixJoin.jaccardJoin(docs, "doc_id", "toks", 0.6)
          .select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-duplicate documents")

    val tf = new HashingTF().setInputCol("toks").setOutputCol("features")
      .setBinary(true).setNumFeatures(1 << 18)
    val feat = tf.transform(docs)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(6).setSeed(42)
    val model = lsh.fit(feat)
    // distCol is exact jaccard distance on the candidate pairs; 0.4 dist
    // == 0.6 similarity (on hashed features ≈ tokens modulo collisions)
    val approx = model.approxSimilarityJoin(feat, feat, 0.4, "dist")
      .select(col("datasetA.doc_id").as("ida"), col("datasetB.doc_id").as("idb"))
      .filter(col("ida") < col("idb"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8,
      s"recall $recall < 0.8 at $sfDir (exact=${exact.size}, approx=${approx.size})")
    docs.unpersist()
  }

  test("MinHashLSH approxSimilarityJoin recall >= 0.8 vs exact jaccard") {
    recallGate(sf0001, bruteTruth = true)
  }

  // The r10 verdict asked for the banding parameters validated on a
  // larger corpus: sf0.01's documents table is the SAME 500 rows as
  // sf0.001 (only the relational tables scale until sf0.1), so the 10x
  // corpus is sf0.1's 5,000 docs. Brute-force truth there is ~12.5M
  // intersects (~9 min measured) — PrefixJoin supplies the exact truth
  // sub-quadratically instead. SlowScale-tagged for the LSH join cost.
  test("MinHashLSH recall gate holds on the 10x corpus (sf0.1)", SlowScale) {
    recallGate("/root/testdata/sf0.1", bruteTruth = false)
  }
}
