package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._

/** L5 (SURVEY.md §2.8): MLlib MinHashLSH as the sub-quadratic similarity
  * join, validated by recall against the exact token-jaccard join on
  * sf0.001. The exact join is the oracle-checked path (q49); this is the
  * scale path — approxSimilarityJoin shuffles on band keys instead of
  * materializing all O(n²) pairs. */
class LshRecallSpec extends SparkSpec {

  test("MinHashLSH approxSimilarityJoin recall >= 0.8 vs exact jaccard") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
      .filter(size(col("toks")) > 0)
      .cache()

    // exact ground truth: all pairs with token-jaccard >= 0.6
    val a = docs.select(col("doc_id").as("ida"), col("toks").as("ta"))
    val b = docs.select(col("doc_id").as("idb"), col("toks").as("tb"))
    val inter = size(array_intersect(col("ta"), col("tb"))).cast("double")
    val uni = (size(col("ta")) + size(col("tb"))).cast("double") -
      size(array_intersect(col("ta"), col("tb")))
    val exact = a.crossJoin(b).filter(col("ida") < col("idb"))
      .withColumn("jac", inter / uni)
      .filter(col("jac") >= 0.6)
      .select("ida", "idb").collect()
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
    assert(recall >= 0.8, s"recall $recall < 0.8 (exact=${exact.size}, approx=${approx.size})")
  }
}
