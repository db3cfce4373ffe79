package graft

import graft.ops.QualityClassifier
import org.apache.spark.sql.functions._

/** Gradient-descent logistic regression entirely in the engine: a
  * planted-marker task it must solve near-perfectly, convergence on a
  * real labeling, and inference/training consistency. */
class QualityClassifierSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf0001).limit(300)

  /** Half the docs get a heavily-planted marker token — linearly
    * separable through the marker's hash bucket by construction. */
  private def planted = {
    val marker = (1 to 25).map(_ => "xqualityx").mkString(" ")
    docs.withColumn("label",
        (col("doc_id") % 2 === 0).cast("int"))
      .withColumn("text",
        when(col("label") === 1, concat(col("text"), lit(" " + marker)))
          .otherwise(col("text")))
      .select("text", "label")
  }

  test("planted-marker corpus is learned to >= 95% training accuracy") {
    val m = QualityClassifier.train(planted, dim = 64, iters = 40, lr = 4.0)
    val scored = planted
      .withColumn("p", QualityClassifier.score(col("text"), m))
      .withColumn("hit",
        ((col("p") >= 0.5).cast("int") === col("label")).cast("long"))
    val (hits, n) = {
      val r = scored.agg(sum("hit"), count(lit(1))).head
      (r.getLong(0), r.getLong(1))
    }
    assert(n == 300)
    assert(hits >= (n * 0.95).toLong, s"accuracy ${hits.toDouble / n}")
  }

  test("training loss decreases on a real labeling task") {
    val labeled = docs
      .withColumn("label", (col("lang") === "en").cast("int"))
      .select("text", "label")
    val m = QualityClassifier.train(labeled, dim = 64, iters = 15, lr = 2.0)
    assert(m.losses.length == 15)
    assert(m.losses.last < m.losses.head,
      s"loss did not improve: ${m.losses.head} -> ${m.losses.last}")
    // log-loss starts at ln 2 for the zero model
    assert(math.abs(m.losses.head - math.log(2.0)) < 0.35)
  }

  test("score() is the training-time forward pass (weights round-trip)") {
    val m = QualityClassifier.train(planted, dim = 32, iters = 5, lr = 1.0)
    assert(m.weights.length == 32)
    assert(m.weights.exists(_ != 0.0), "training must move the weights")
    val probs = planted.select(QualityClassifier.score(col("text"), m).as("p"))
      .agg(min("p"), max("p")).head
    assert(probs.getDouble(0) >= 0.0 && probs.getDouble(1) <= 1.0)
  }
}
