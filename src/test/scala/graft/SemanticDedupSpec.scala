package graft

import graft.ops.{AnnIvf, SemanticDedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup pipeline (ops.SemanticDedup) against the brute-force
  * all-pairs oracle on sf0.001 embeddings plus planted duplicates.
  *
  * The planted duplicates are exact SCALAR MULTIPLES (2·v): cosine to
  * every centroid is bit-identical to the original's (scaling by a
  * power of two commutes with IEEE rounding in the fused kernel), so
  * original and copy land in the same cluster BY CONSTRUCTION and the
  * planted-pair assertions are deterministic, not probabilistic.
  */
class SemanticDedupSpec extends SparkSpec {
  private val K = 8
  private val TAU = 0.9

  /** Fixture corpus + a 2·v copy (id + 10000) of every vec_id < 10. */
  private lazy val corpus: DataFrame = {
    val base = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val dups = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 10000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    base.union(dups).cache()
  }

  private def brutePairs(): Set[(Long, Long)] = {
    val a = corpus.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("sim", graft.ops.VectorQueries.cosine(col("va"), col("vb")))
      .filter(col("sim") >= TAU)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("within-cluster pairs equal the brute-force oracle on this corpus") {
    val model = AnnIvf.train(corpus, "embedding", "vec_id", K, iters = 2)
    val assigned = AnnIvf.assign(corpus, "embedding", model)
    val got = SemanticDedup
      .candidatePairs(assigned, "embedding", "vec_id", TAU)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val oracle = brutePairs()
    // precision 1 always (exact cosines within blocks) …
    assert(got.subsetOf(oracle), s"false pairs: ${got.diff(oracle)}")
    // … and on this corpus recall is 1 too: every ≥ tau pair involves a
    // planted 2·v copy, which shares its original's cluster bit-exactly
    assert(got == oracle,
      s"missed cross-cluster pairs: ${oracle.diff(got)}")
    assert(oracle.size >= 10, "fixture must actually contain planted pairs")
  }

  test("dedup keeps exactly one representative per duplicate group") {
    val out = SemanticDedup
      .dedup(corpus, "embedding", "vec_id", K, iters = 2, tau = TAU)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == corpus.count())
    // every planted copy is dropped and points at its original
    val byId = out.map(t => t._1 -> t).toMap
    (0L until 10L).foreach { i =>
      val (_, rep, isDup) = byId(i + 10000L)
      assert(isDup && rep == byId(i)._2,
        s"copy ${i + 10000} must collapse onto original $i's group")
    }
    // representatives are never themselves marked duplicate, and each
    // group's rep is its minimum member id
    val groups = out.groupBy(_._2)
    groups.foreach { case (rep, members) =>
      assert(members.map(_._1).min == rep)
      assert(members.count(t => !t._3) == 1,
        s"group $rep must keep exactly one survivor")
    }
  }

  test("multi-probe assignment recovers a boundary-straddling pair nProbe=1 misses") {
    val model = AnnIvf.train(corpus, "embedding", "vec_id", K, iters = 2)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        ab += x * y; aa += x * x; bb += y * y; i += 1
      }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    def blend(a: Array[Float], b: Array[Float], wa: Float): Array[Float] =
      a.zip(b).map { case (x, y) => wa * x + (1 - wa) * y }
    // find a centroid pair whose midpoint blends provably straddle the
    // boundary: each blend's nearest centroid is its dominant one, the
    // runner-up set covers both, and the blends are near-dups of each
    // other — all checked against the trained model, so the test is
    // deterministic (no RNG anywhere in train/assign)
    val c = model.centroids
    val straddle = (for {
      i <- c.indices.iterator; j <- c.indices.iterator if i != j
      va = blend(c(i), c(j), 0.55f); vb = blend(c(i), c(j), 0.45f)
      if cos(va, vb) >= TAU
      if model.nearestCentroids(va, 1) == Seq(i)
      if model.nearestCentroids(vb, 1) == Seq(j)
      if model.nearestCentroids(va, 2).toSet == Set(i, j)
      if model.nearestCentroids(vb, 2).toSet == Set(i, j)
    } yield (va, vb)).nextOption()
    assert(straddle.nonEmpty,
      "fixture centroids admit no boundary-straddling blend — k too degenerate")
    val (va, vb) = straddle.get
    import spark.implicits._
    val planted = Seq((20000L, va.toSeq), (20001L, vb.toSeq))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val corpus2 = corpus.select(col("vec_id"), col("embedding")).union(planted)
    def pairsAt(nProbe: Int): Set[(Long, Long)] = {
      val assigned =
        if (nProbe <= 1) AnnIvf.assign(corpus2, "embedding", model)
        else SemanticDedup.assignMulti(corpus2, "embedding", model, nProbe)
      SemanticDedup.candidatePairs(assigned, "embedding", "vec_id", TAU)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val p1 = pairsAt(1)
    val p2 = pairsAt(2)
    // the planted pair is exactly the documented nProbe=1 hole …
    assert(!p1.contains((20000L, 20001L)),
      "construction should straddle clusters at nProbe=1")
    // … and multi-probe recovers it without losing anything
    assert(p2.contains((20000L, 20001L)), s"multi-probe missed the planted pair")
    assert(p1.subsetOf(p2), s"multi-probe lost pairs: ${p1.diff(p2)}")
  }

  test("dedup is deterministic across runs") {
    def run() = SemanticDedup
      .dedup(corpus, "embedding", "vec_id", K, iters = 2, tau = TAU)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    assert(run() == run())
  }
}
