package graft.ops

import graft.functions.SimFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ ("IVFADC") approximate nearest neighbor — the composition of
  * the two scale paths that already exist separately in this repo, and
  * the canonical billion-vector serving layout (Jégou, Douze, Schmid,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011; the
  * FAISS `IVFx,PQy` index):
  *
  *  - [[AnnIvf]] alone prunes the scan to nProbe/k of the corpus but
  *    still reads the FLOAT vectors of every probed row;
  *  - [[AnnPq]] alone scores m-byte codes instead of floats but scans
  *    ALL of them;
  *  - IVF-PQ does both: scan only the probed buckets, and score them
  *    from codes. Per-query work drops to ~(nProbe/k) · m lookups per
  *    row, and the serving table is (id, cid, codes) — bytes per
  *    vector, which is what makes a 100 TB float corpus servable from
  *    a fraction of its size.
  *
  * PQ codes quantize the RESIDUAL vec − centroid(cid), not the vector:
  * residuals concentrate near the origin so the same ksub codes spend
  * their resolution on the part the coarse quantizer didn't explain —
  * the core IVFADC observation.
  *
  * Scoring uses the inner-product decomposition
  * `dot(q, x) = dot(q, c_cid) + Σ_s dot(q_s, r_s)`: the ADC lookup
  * table over residual codebooks is built from q ONCE and shared by
  * every probed bucket (driver-side, model-sized), and the bucket term
  * is a per-cid constant riding along as a literal array. Both stay
  * inside whole-stage codegen — no UDF, no join against a model table.
  *
  * No SQL oracle (approximate semantics — same rationale as
  * AnnIvf/AnnPq); recall and the exact-rerank contract are pinned in
  * AnnIvfPqSpec.
  */
object AnnIvfPq {

  /** Coarse centroids + residual codebooks; both driver-side model
    * parameters, never data. */
  final case class IvfPqModel(ivf: AnnIvf.IvfModel, pq: AnnPq.PqModel)

  /** Element-wise residual vec − centroids(cid), as a pure expression:
    * the centroid matrix rides along as one array-of-arrays literal. */
  private def residual(vec: Column, cid: Column,
      centroids: Array[Array[Float]]): Column =
    zip_with(vec, element_at(typedlit(centroids), cid + 1), (x, y) => x - y)

  /** Train coarse quantizer then residual PQ. Deterministic end to end
    * (both trainers seed from the first rows by `idCol`, no RNG).
    * Validation is inherited: AnnIvf.train fails fast on a corpus that
    * cannot seed k distinct coarse centroids, AnnPq.train on one that
    * cannot seed ksub distinct codes in every subspace. */
  def train(emb: DataFrame, vecCol: String, idCol: String, k: Int,
      ivfIters: Int, m: Int, ksub: Int, pqIters: Int): IvfPqModel = {
    val ivf = AnnIvf.train(emb, vecCol, idCol, k, ivfIters)
    // persist the assignment+residual: it is FIXED once the coarse
    // quantizer is trained, and AnnPq.train drives m×(iters+1) jobs
    // over it — without the persist each one re-runs the k-kernel
    // nearest-centroid assignment over the whole corpus
    val withRes = AnnIvf.assign(emb, vecCol, ivf)
      .withColumn("res", residual(col(vecCol), col("cid"), ivf.centroids))
      .persist()
    try {
      val pq = AnnPq.train(withRes, "res", idCol, m, ksub, pqIters)
      IvfPqModel(ivf, pq)
    } finally withRes.unpersist(blocking = false)
  }

  /** Corpus with bucket id and residual PQ codes — (idCol, cid, codes)
    * is the complete serving index; the float column is only needed
    * again for the exact re-rank of a shortlist. */
  def encode(emb: DataFrame, vecCol: String, model: IvfPqModel): DataFrame = {
    val assigned = AnnIvf.assign(emb, vecCol, model.ivf)
      .withColumn("res", residual(col(vecCol), col("cid"), model.ivf.centroids))
    AnnPq.encode(assigned, "res", model.pq).drop("res")
  }

  /** Element-wise dot product of two float-array columns, with each
    * element CAST TO DOUBLE before the multiply — bit-identical to the
    * driver-side loops in [[AnnPq.adcTable]] and [[topK]]'s qDotC
    * (`x.toDouble * y.toDouble`). A float multiply here would drift in
    * the low-order bits and let shortlist membership differ between
    * topKBatch and per-query topK on near-ties. Stays inside codegen. */
  private def dotExpr(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Batch form of [[topK]]: IVFADC for EVERY query row in one
    * distributed plan — the serving shape at scale, where looping
    * [[topK]] per query would schedule one job each.
    *
    * The ADC economics survive batching because the per-query lookup
    * table is computed ON THE QUERY SIDE as a column (m×ksub sub-dot
    * expressions against the codebook literals — tiny side, computed
    * once per query row), and rides through the broadcast into the
    * bucket equi-join; corpus-side scoring is still just m+1 array
    * lookups per row. Ranking windows are keyed per query (never
    * global; the shortlist rank is WindowGroupLimit-pushable), ordering
    * matches [[topK]] ((approx desc, id), then (sim desc, id)), so
    * results are identical to per-query calls — pinned in AnnIvfPqSpec. */
  def topKBatch(encoded: DataFrame, vecCol: String, idCol: String,
      queries: DataFrame, qVecCol: String, qIdCol: String,
      model: IvfPqModel, k: Int, nProbe: Int, shortlist: Int): DataFrame = {
    val cents = model.ivf.centroids
    val probes = AnnIvf.probesExpr(col(qVecCol), cents, nProbe)
    val dsub = model.pq.dsub
    val lut = array((0 until model.pq.m).map { s =>
      array((0 until model.pq.ksub).map { c =>
        dotExpr(slice(col(qVecCol), s * dsub + 1, dsub),
          typedlit(model.pq.codebooks(s)(c)))
      }: _*)
    }: _*)
    val q = queries.select(col(qIdCol).as("q_id"), col(qVecCol).as("qv"),
        lut.as("lut"), explode(probes).as("cid"))
      .withColumn("qdotc",
        dotExpr(col("qv"), element_at(typedlit(cents), col("cid") + 1)))
    val adc = (0 until model.pq.m).map { s =>
      element_at(element_at(col("lut"), s + 1),
        element_at(col("codes"), s + 1) + 1)
    }.reduce(_ + _)
    val scored = encoded.join(broadcast(q), "cid")
      .withColumn("approx", col("qdotc") + adc)
      // project BEFORE the window exchange: lut (m×ksub doubles per
      // row), codes, and qdotc are consumed by `approx` above — keeping
      // them would multiply the q_id shuffle volume by the model size.
      // Only the ranking/re-rank columns cross the exchange.
      .select(col("q_id"), col(idCol), col(vecCol), col("qv"), col("approx"))
    val wShort = Window.partitionBy(col("q_id"))
      .orderBy(col("approx").desc, col(idCol))
    val cand = scored.withColumn("srnk", row_number().over(wShort))
      .filter(col("srnk") <= shortlist)
    val wK = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col(idCol))
    cand.withColumn("sim",
        round(SimFns.cosineSim(col(vecCol), col("qv")), 6))
      .withColumn("rnk", row_number().over(wK))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col(idCol), col("rnk"), col("sim"))
  }

  /** Top-k by three-stage IVFADC serve: prune to the `nProbe` buckets
    * nearest the query (driver-side centroid ranking, k values), score
    * every row in them with dot(q, c_cid) + ADC over the residual codes
    * (m+1 array lookups per row, floats never read), take the
    * `shortlist` best via TakeOrderedAndProject, then re-rank those
    * exactly with the fused cosine kernel. Returns (idCol, rnk, sim)
    * ranked on rounded similarity with id tie-break — the q53
    * determinism rule, same contract as AnnIvf.topK / AnnPq.topK. */
  def topK(encoded: DataFrame, vecCol: String, idCol: String,
      model: IvfPqModel, query: Array[Float], k: Int, nProbe: Int,
      shortlist: Int): DataFrame = {
    val probes = model.ivf.nearestCentroids(query, nProbe)
    // dot(q, c_cid) for every centroid, as one literal array — only the
    // probed ones are ever read through it
    val qDotC = model.ivf.centroids.map { c =>
      var d = 0.0; var i = 0
      while (i < c.length) { d += query(i).toDouble * c(i); i += 1 }
      d
    }
    val lut = AnnPq.adcTable(query, model.pq)
    val adc = (0 until model.pq.m).map { s =>
      element_at(typedlit(lut(s)), element_at(col("codes"), s + 1) + 1)
    }.reduce(_ + _)
    val approx = element_at(typedlit(qDotC), col("cid") + 1) + adc
    val cand = encoded.filter(col("cid").isin(probes: _*))
      .withColumn("approx", approx)
      .orderBy(col("approx").desc, col(idCol))
      .limit(shortlist)
    AnnIvf.exactTopK(cand, vecCol, idCol, query, k)
  }
}
