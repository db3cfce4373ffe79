package graft

import graft.ops.Pca
import org.apache.spark.sql.functions._

/** PCA must behave like PCA: recover a planted low-rank subspace,
  * produce an orthonormal variance-descending basis, and project
  * losslessly up to the planted noise — plus bit-determinism across
  * refits (the fixed-sweep Jacobi + sign-convention contract). */
class PcaSpec extends SparkSpec {

  test("jacobiEigen solves a known symmetric matrix exactly") {
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 && math.abs(sorted(1) - 3.0) < 1e-12)
    // eigenvector columns must be orthonormal
    val dot = vecs(0)(0) * vecs(0)(1) + vecs(1)(0) * vecs(1)(1)
    assert(math.abs(dot) < 1e-12)
    assert(math.abs(vecs(0)(0) * vecs(0)(0) + vecs(1)(0) * vecs(1)(0) - 1.0) < 1e-12)
  }

  test("recovers a planted 2-d subspace in 4-d and reconstructs up to noise") {
    import spark.implicits._
    // deterministic LCG — no library RNG, reproducible fixture
    var seed = 12345L
    def next(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val u1 = Array(0.5, 0.5, 0.5, 0.5)
    val u2 = Array(0.5, -0.5, 0.5, -0.5)
    val u3 = Array(0.5, 0.5, -0.5, -0.5)
    val rows = (1 to 400).map { _ =>
      val a = next() * 10; val b = next() * 4; val e = next() * 0.01
      Array.tabulate(4)(i => (a * u1(i) + b * u2(i) + e * u3(i)).toFloat)
    }
    val df = rows.map(Tuple1(_)).toDF("embedding")
    val model = Pca.fit(df, "embedding", 2)
    val tot = Pca.totalVariance(df, "embedding")
    assert(model.explainedVariance(tot) > 0.999,
      s"planted 2-d variance must dominate: ${model.explainedVariance(tot)}")
    // orthonormal basis
    val c = model.components
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (a, b) => a * b }.sum
    assert(math.abs(dot(c(0), c(0)) - 1.0) < 1e-9)
    assert(math.abs(dot(c(1), c(1)) - 1.0) < 1e-9)
    assert(math.abs(dot(c(0), c(1))) < 1e-9)
    // per-row reconstruction: ||(v - mean) - Σ_k proj_k · c_k|| ≤ noise
    val projected = Pca.project(df, "embedding", model).collect()
    projected.foreach { r =>
      val v = r.getSeq[Float](0).map(_.toDouble).toArray
      val p = r.getSeq[Double](1).toArray
      val err = (0 until 4).map { i =>
        val rec = model.mean(i) + p(0) * c(0)(i) + p(1) * c(1)(i)
        val e = v(i) - rec; e * e
      }.sum
      assert(math.sqrt(err) < 0.02, s"reconstruction error ${math.sqrt(err)}")
    }
  }

  test("embeddings fixture: descending variance, orthonormal, deterministic refit") {
    val emb = Tables.embeddings(spark, sf0001).select("embedding")
    val m1 = Pca.fit(emb, "embedding", 8)
    val m2 = Pca.fit(emb.repartition(7), "embedding", 8)
    assert(m1.eigenvalues.zip(m1.eigenvalues.tail).forall { case (a, b) => a >= b },
      "eigenvalues must be variance-descending")
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (a, b) => a * b }.sum
    for (i <- 0 until 8; j <- i until 8) {
      val expected = if (i == j) 1.0 else 0.0
      assert(math.abs(dot(m1.components(i), m1.components(j)) - expected) < 1e-8,
        s"components $i,$j not orthonormal")
    }
    // refit under a different partitioning: same subspace to float-sum
    // tolerance (covariance sums reassociate; Jacobi + sign fix the rest)
    m1.components.zip(m2.components).foreach { case (a, b) =>
      assert(math.abs(math.abs(dot(a, b)) - 1.0) < 1e-6,
        "refit must recover the same component directions")
    }
    val out = Pca.project(emb, "embedding", m1).select(size(col("pca"))).head()
    assert(out.getInt(0) == 8)
  }

  test("fails fast on empty input and on ragged vector lengths") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Double])].toDF("id", "v")
    val e1 = intercept[IllegalArgumentException] {
      Pca.fit(empty, "v", 2)
    }
    assert(e1.getMessage.contains("no non-null"), e1.getMessage)
    val allNull = Seq((1L, null: Array[Double]), (2L, null: Array[Double]))
      .toDF("id", "v")
    intercept[IllegalArgumentException] { Pca.fit(allNull, "v", 2) }
    val ragged = Seq(
      (1L, Array(1.0, 2.0, 3.0)), (2L, Array(4.0, 5.0, 6.0)),
      (3L, Array(7.0, 8.0))).toDF("id", "v")
    val e2 = intercept[IllegalArgumentException] {
      Pca.fit(ragged, "v", 2)
    }
    assert(e2.getMessage.contains("ragged"), e2.getMessage)
  }
}
