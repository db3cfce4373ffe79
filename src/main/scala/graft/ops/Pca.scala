package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed PCA for embedding compression — the data-dependent
  * complement of L18's Johnson–Lindenstrauss projection: where JL
  * preserves distances obliviously, PCA finds the directions this
  * corpus actually varies in, so a 64-d embedding column compresses to
  * the k dims that carry the variance (whitening, dedup pre-projection,
  * visualization, ANN-index shrinkage).
  *
  * The split of labor is the only one that scales:
  *
  *  - CLUSTER: one pass builds the d×d second-moment matrix with the
  *    q138 machinery — each row expands to its d(d+1)/2 upper-triangle
  *    pair products inside a codegen HOF and map-side partial agg
  *    collapses them, so only d² partials cross the exchange, never
  *    row data. Cost is independent of corpus size beyond the scan.
  *  - DRIVER: the d×d covariance (model-sized, 64×64 here) gets a
  *    deterministic cyclic Jacobi eigensolve — fixed sweep order,
  *    fixed convergence threshold, no RNG — exactly the "ANN centroids
  *    on the driver" contract AnnIvf already established.
  *  - CLUSTER: projection is a pure Column (HOF dot products against
  *    the broadcast-literal component matrix) — codegen, no UDF, no
  *    shuffle.
  *
  * Determinism: Jacobi sweeps run in a fixed (p,q) order with a fixed
  * threshold; eigenvalue ties order by original index. Components have
  * a sign convention (largest-|loading| coordinate made positive) so
  * re-runs and re-partitions produce identical models up to float
  * summation order in the covariance pass.
  */
object Pca {

  /** Fitted model: `mean(d)`, row-major `components(k)(d)` (unit
    * eigenvectors, variance-descending), `eigenvalues(k)`. */
  case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def k: Int = components.length
    def d: Int = mean.length
    /** Fraction of total variance the kept components explain. */
    def explainedVariance(totalVariance: Double): Double =
      if (totalVariance == 0) 0.0 else eigenvalues.sum / totalVariance
  }

  /** Fit a k-component PCA over an `array<float|double>` column.
    * One distributed pass (moments) + one driver eigensolve. */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    val m = expr(s"transform($vecCol, x -> cast(x as double))")
    val src = df.select(m.as("m")).filter(col("m").isNotNull)
    val pairs = src.select(explode(expr(
        """flatten(transform(sequence(1, size(m)), i ->
          |  transform(sequence(i, size(m)), j ->
          |    struct(i as i, j as j,
          |           element_at(m, i) * element_at(m, j) as p))))""".stripMargin))
        .as("pr"))
      .select(col("pr.i"), col("pr.j"), col("pr.p"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum("p").as("sxy"))
      .collect()
    val marg = src.select(posexplode(col("m")).as(Seq("i0", "x")))
      .groupBy((col("i0") + 1).as("i")).agg(sum("x").as("sx"))
      .collect().map(r => r.getAs[Number]("i").intValue() -> r.getDouble(1))
      .toMap
    require(pairs.nonEmpty, s"Pca.fit: no non-null '$vecCol' vectors to fit on")
    // ragged vector lengths make per-pair counts diverge (a short vector
    // contributes no (i,j) product for i or j past its end) — fail loudly
    // rather than compute a covariance with the wrong n
    val pairCounts = pairs.map(_.getAs[Long]("n")).distinct
    require(pairCounts.length == 1,
      s"Pca.fit: ragged '$vecCol' lengths — moment-pair counts differ " +
        s"(${pairCounts.sorted.mkString(", ")}); all vectors must share one dimension")
    val d = marg.keys.max
    require(k >= 1 && k <= d, s"need 1 <= k <= d=$d, got $k")
    val n = pairs.head.getAs[Long]("n").toDouble
    val mean = Array.tabulate(d)(i => marg(i + 1) / n)
    val cov = Array.ofDim[Double](d, d)
    pairs.foreach { r =>
      val i = r.getAs[Number]("i").intValue() - 1
      val j = r.getAs[Number]("j").intValue() - 1
      val c = r.getAs[Double]("sxy") / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (vals, vecs) = jacobiEigen(cov)
    // variance-descending, ties by original index — a total order
    val order = vals.indices.sortBy(i => (-vals(i), i)).take(k)
    val comps = order.map { ei =>
      val v = Array.tabulate(d)(r => vecs(r)(ei))
      // sign convention: the largest-|loading| coordinate is positive
      val piv = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(piv) < 0) v.map(-_) else v
    }.toArray
    PcaModel(mean, comps, order.map(vals).toArray)
  }

  /** Append `outCol` = the k-dim projection of `vecCol` onto the
    * model's components (centered dot products). Pure codegen HOFs
    * against broadcast-literal arrays — no UDF, no shuffle. */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
      outCol: String = "pca"): DataFrame = {
    val compsL = typedlit(model.components.map(_.toSeq).toSeq)
    val meanL = typedlit(model.mean.toSeq)
    val proj = transform(compsL, c =>
      aggregate(sequence(lit(1), lit(model.d)), lit(0.0), (acc, i) =>
        acc + (element_at(col(vecCol), i).cast("double") -
          element_at(meanL, i)) * element_at(c, i)))
    df.withColumn(outCol, proj)
  }

  /** Total variance (trace of the covariance matrix): Σ_i var_i from
    * one per-dimension moment pass — pair with
    * [[PcaModel.explainedVariance]]. */
  def totalVariance(df: DataFrame, vecCol: String): Double = {
    val m = expr(s"transform($vecCol, x -> cast(x as double))")
    df.select(m.as("m")).filter(col("m").isNotNull)
      .select(posexplode(col("m")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .collect()
      .map { r =>
        val n = r.getAs[Long]("n").toDouble
        val mu = r.getAs[Double]("sx") / n
        r.getAs[Double]("sxx") / n - mu * mu
      }.sum
  }

  /** Deterministic cyclic Jacobi eigensolver for a symmetric matrix:
    * returns (eigenvalues, eigenvector matrix V with vectors in
    * COLUMNS). Fixed (p,q) sweep order, threshold 1e-12 on the
    * off-diagonal Frobenius mass, ≤ 64 sweeps — no RNG, bit-stable
    * for a given input matrix. */
  private[graft] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val sg = if (theta >= 0.0) 1.0 else -1.0
            val t = sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) {
        if (i != j) s += a(i)(j) * a(i)(j)
        j += 1
      }
      i += 1
    }
    math.sqrt(s)
  }
}
