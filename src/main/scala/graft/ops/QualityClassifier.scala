package graft.ops

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear quality classifier over hashed token features — the
  * model-in-the-loop document filter of production LLM data pipelines
  * (CCNet and fastText-style quality/toxicity screens): logistic
  * regression on the L43/q108 hashing-trick features, trained by
  * full-batch gradient descent INSIDE the engine.
  *
  * Each iteration is one distributed pass: the current weight vector
  * enters the plan as a literal array (model-sized, the AnnIvf
  * discipline — weights never join row data), every row computes its
  * sigmoid margin and per-feature gradient contribution in codegen
  * (`zip_with`/`aggregate` HOFs, no UDFs), and `posexplode` + one hash
  * agg reduce to `dim` gradient sums — a dim-row collect per iteration,
  * independent of corpus size. Features are L1-normalized token-count
  * buckets so the step size is length-invariant.
  *
  * Inference ([[score]]) is a pure Column expression usable in any
  * projection — the trained model folds into the scan stage of the
  * pipeline it gates, exactly how a quality screen deploys at 100 TB.
  */
object QualityClassifier {

  /** Trained model: `dim` weights + bias, with the per-iteration
    * training log-loss for convergence inspection. */
  case class Model(dim: Int, weights: Array[Double], bias: Double,
                   losses: Seq[Double])

  /** L1-normalized signed feature-hash vector of a text column. */
  def features(text: Column, dim: Int): Column = {
    val raw = TextFns.featureHashEmbed(TextFns.tokenHashes(text), dim)
    val l1 = aggregate(raw, lit(0L), (a, x) => a + abs(x))
    transform(raw, v => v.cast("double") / greatest(l1, lit(1L)).cast("double"))
  }

  private def margin(x: Column, w: Array[Double], b: Double): Column =
    aggregate(
      zip_with(x, typedlit(w.toSeq), (xi, wi) => xi * wi),
      lit(b), (acc, v) => acc + v)

  /** Train on `docs` (columns `text: String`, `label: 0/1`). */
  def train(docs: DataFrame, dim: Int = 64, iters: Int = 30,
            lr: Double = 2.0): Model = {
    val feat = docs
      .select(features(col("text"), dim).as("x"),
        col("label").cast("double").as("y"))
      .localCheckpoint() // features computed once, reused every iteration
    // n rides the first iteration's gradient agg (each feature-index
    // group sees every row, so any group's count IS the row count) —
    // no separate count() action
    var n = 0.0
    var w = Array.fill(dim)(0.0)
    var b = 0.0
    val losses = Seq.newBuilder[Double]
    for (_ <- 1 to iters) {
      val m = margin(col("x"), w, b)
      val p = lit(1.0) / (lit(1.0) + exp(-m))
      val g = feat
        .select(col("y"), (p - col("y")).as("err"),
          // numerically-guarded log-loss of the CURRENT model
          (-col("y") * log(greatest(p, lit(1e-12))) -
            (lit(1.0) - col("y")) *
              log(greatest(lit(1.0) - p, lit(1e-12)))).as("loss"),
          col("x"))
        .select(col("err"), col("loss"),
          posexplode(col("x")).as(Seq("i", "xi")))
        .groupBy("i")
        .agg(sum(col("xi") * col("err")).as("gw"),
          // bias/loss sums replicate per feature index — divide out later
          sum(col("err")).as("gb"), sum(col("loss")).as("l"),
          count(lit(1)).as("cnt"))
        .collect()
      val gw = Array.fill(dim)(0.0)
      var gb = 0.0
      var loss = 0.0
      g.foreach { r =>
        gw(r.getInt(0)) = r.getDouble(1)
        gb = r.getDouble(2); loss = r.getDouble(3)
        n = r.getLong(4).toDouble
      }
      w = w.indices.map(i => w(i) - lr * gw(i) / n).toArray
      b = b - lr * gb / n
      losses += loss / n
    }
    Model(dim, w, b, losses.result())
  }

  /** P(label = 1 | text) under `m`, as a Column. */
  def score(text: Column, m: Model): Column = {
    val mg = margin(features(text, m.dim), m.weights, m.bias)
    lit(1.0) / (lit(1.0) + exp(-mg))
  }
}
