package graft

import graft.ops.EmbeddingOps
import org.apache.spark.sql.functions._

/** Embedding utilities: exact unit norms after normalization, and the
  * JL guarantee — pairwise cosine similarity approximately preserved
  * under the seeded ±1 projection, reproducibly (same seed → same
  * vectors regardless of partitioning). */
class EmbeddingOpsSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf0001)

  test("l2Normalize yields unit vectors; zero vectors pass through") {
    import spark.implicits._
    val norms = emb.select(
      aggregate(transform(EmbeddingOps.l2Normalize(col("embedding")),
        x => x * x), lit(0.0), (a, x) => a + x).as("n2"))
    val bad = norms.filter(abs(col("n2") - 1.0) > 1e-9).count()
    assert(bad == 0, "every fixture embedding must normalize to unit length")
    val zero = Seq(Seq(0f, 0f, 0f)).toDF("embedding")
      .select(EmbeddingOps.l2Normalize(col("embedding")).as("v"))
      .head().getSeq[Double](0)
    assert(zero == Seq(0.0, 0.0, 0.0))
  }

  test("randomProject 64->32 preserves pairwise cosine within JL tolerance") {
    val sample = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding"),
        EmbeddingOps.randomProject(col("embedding"), 32).as("proj"))
    val a = sample.select(col("vec_id").as("ia"), col("embedding").as("ea"),
      col("proj").as("pa"))
    val b = sample.select(col("vec_id").as("ib"), col("embedding").as("eb"),
      col("proj").as("pb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(
        graft.ops.VectorQueries.cosineHof(col("ea"), col("eb")).as("orig"),
        graft.ops.VectorQueries.cosineHof(col("pa"), col("pb")).as("proj"))
      .collect()
    val mae = pairs.map(r => math.abs(r.getDouble(0) - r.getDouble(1)))
      .sum / pairs.length
    assert(pairs.length == 190)
    assert(mae < 0.15, f"mean |cos_orig - cos_proj| = $mae%.3f too large for JL at 32 dims")
  }

  test("randomProject of an empty vector is the zero vector") {
    import spark.implicits._
    val out = Seq(Seq.empty[Float]).toDF("embedding")
      .select(EmbeddingOps.randomProject(col("embedding"), 4).as("p"))
      .head().getSeq[Double](0)
    assert(out == Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("profile survives a dotted column name") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "weird.name")
    val p = graft.ops.DataQuality.profile(df).collect()
      .map(_.getString(0)).toSet
    assert(p == Set("id", "weird.name"))
  }

  test("projection is deterministic under repartitioning (seeded hash matrix)") {
    val once = emb.select(col("vec_id"),
      EmbeddingOps.randomProject(col("embedding"), 8, seed = 7L).as("p"))
    val again = emb.repartition(13).select(col("vec_id"),
      EmbeddingOps.randomProject(col("embedding"), 8, seed = 7L).as("p"))
    assert(once.exceptAll(again).isEmpty && again.exceptAll(once).isEmpty)
  }
}
