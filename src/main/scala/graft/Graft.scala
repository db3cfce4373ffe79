package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** One-stop facade over the engine's public surface. A pipeline that
  * used the reference's dataframe workflow switches by building a
  * normal SparkSession (optionally with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`) and
  * calling these entry points; everything returns plain DataFrames, so
  * the full Spark API composes around them.
  *
  * {{{
  * import graft.Graft
  * Graft.enable(spark)                       // SQL fns + as-of planner
  * val docs  = Graft.tables.documents(spark, dir)
  * val dedup = docs.withColumn("sh", Graft.simHash(col("text")))
  * val joined = Graft.asofJoin(trades, quotes, "sym", "q_sym", "t", "q_t")
  * }}}
  */
object Graft {

  /** Register everything on a live session: kernel SQL functions plus
    * the as-of join strategy and pushdown rule. Idempotent. */
  def enable(spark: SparkSession): Unit = {
    GraftFunctions.register(spark)
    plans.AsofJoinOp.ensureRegistered(spark)
  }

  /** Fixture-schema table loaders (explicit StructTypes, fail-fast). */
  def tables: Tables.type = Tables

  /** Binary media columns: schema, partition-batched decode (real
    * image/audio/video kernels — MJPEG/RIFF-AVI demux included since
    * the video stub was replaced), resize, features. */
  def media: multimodal.Multimodal.type = multimodal.Multimodal

  // -- similarity / text kernels (codegen'd custom expressions) --
  def cosineSim(a: Column, b: Column): Column = functions.SimFns.cosineSim(a, b)
  def jaccardSim(a: Column, b: Column): Column = functions.SimFns.jaccardSim(a, b)
  def charBigrams(text: Column): Column = functions.SimFns.charBigrams(text)
  def wordBigrams(text: Column): Column = functions.SimFns.wordBigrams(text)
  def tokenHashes(text: Column): Column = functions.TextFns.tokenHashes(text)
  def docHash(tokenHashes: Column): Column = functions.TextFns.docHash(tokenHashes)

  /** 60-bit SimHash fingerprint of a text column (two seeded 30-bit
    * views — the q61 configuration). */
  def simHash(text: Column): Column = {
    import org.apache.spark.sql.functions.lit
    val th = functions.TextFns.tokenHashes(text)
    functions.TextFns.simHash(th, 30) +
      functions.TextFns.simHash(th, 30, 387L, 15L) * lit(1L << 30)
  }

  // -- operators --

  /** Left outer as-of join via the native merge operator (AsofJoinExec);
    * backward or forward, optionally tolerance-bounded. */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      tie: Option[String] = None,
      direction: plans.AsofDirection = plans.AsofDirection.Backward,
      tolerance: Option[Long] = None): DataFrame =
    plans.AsofJoinOp.asofJoin(left, right, leftKey, rightKey, leftTs, rightTs,
      tie, direction, tolerance)

  /** Lossless prefix-filtering jaccard self-join (AllPairs/PPJoin). */
  def prefixJaccardJoin(docs: DataFrame, idCol: String, tokCol: String,
      t: Double): DataFrame =
    ops.PrefixJoin.jaccardJoin(docs, idCol, tokCol, t)

  /** Membership sketch over a corpus key + exact bloom-routed
    * new-vs-corpus dedup. */
  def bloomFilterOf(corpus: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter =
    ops.BloomDedup.buildFilter(corpus, keyCol, expectedItems, fpp)
  def newAgainst(batch: DataFrame, corpus: DataFrame, keyCol: String,
      bloom: org.apache.spark.util.sketch.BloomFilter): DataFrame =
    ops.BloomDedup.newAgainst(batch, corpus, keyCol, bloom)

  /** Range-clustered, size-bounded parquet sink. Returns file count. */
  def writeClustered(df: DataFrame, path: String, sortCols: Seq[String],
      targetRowsPerFile: Long): Int =
    ops.Compaction.writeClustered(df, path, sortCols, targetRowsPerFile)

  /** Z-order-clustered sink: multi-dimensional min/max skipping
    * (quantile-ranked Morton curve). Returns file count. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      targetRowsPerFile: Long, bits: Int = 8): Int =
    ops.ZOrder.writeZOrdered(df, path, zCols, targetRowsPerFile, bits)

  /** Hilbert-clustered sink: the locality-tighter 2-D sibling of
    * [[writeZOrdered]] (continuous curve — consecutive indices are
    * grid neighbours, so files tile compact regions). */
  def writeHilbertClustered(df: DataFrame, path: String, xCol: String,
      yCol: String, targetRowsPerFile: Long, bits: Int = 8): Int =
    ops.Hilbert.writeHilbertClustered(df, path, xCol, yCol,
      targetRowsPerFile, bits)

  /** Embedding utilities: unit-norm and seeded JL projection. */
  def l2Normalize(v: Column): Column = ops.EmbeddingOps.l2Normalize(v)
  def randomProject(v: Column, outDim: Int, seed: Long = 42L): Column =
    ops.EmbeddingOps.randomProject(v, outDim, seed)

  /** PII scrubbing: placeholders for email/IP/card/phone spans. */
  def redact(text: Column): Column = ops.Redaction.redact(text)

  /** Entity clustering: connected components of match pairs. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 25): DataFrame =
    ops.ConnectedComponents.components(edges, srcCol, dstCol, maxIters)

  /** Record linkage: block → weighted field scores → match/possible. */
  def recordLink(a: DataFrame, b: DataFrame, blockOn: Seq[String],
      sims: Seq[(Column, Double)], matchT: Double,
      possibleT: Double): DataFrame =
    ops.RecordLinkage.link(a, b, blockOn, sims, matchT, possibleT)

  /** Snapshot diff: added/removed/changed rows with changed columns. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame =
    ops.Diff.snapshotDiff(oldDf, newDf, keys, compareCols)

  /** One-pass column profile (nulls / HLL distinct / min / max). */
  def profile(df: DataFrame): DataFrame = ops.DataQuality.profile(df)

  /** Rule-based row split: (clean, quarantined-with-violation-tags). */
  def quarantine(df: DataFrame,
      rules: Seq[(String, Column)]): (DataFrame, DataFrame) =
    ops.DataQuality.quarantine(df, rules)

  /** Hot-key-safe inner equi-join (deterministic salting). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int = 16): DataFrame =
    ops.SkewJoin.saltedInnerJoin(left, right, key, buckets)

  /** IVF approximate-nearest-neighbor entry points. */
  def annTrain(emb: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int = 3): ops.AnnIvf.IvfModel =
    ops.AnnIvf.train(emb, vecCol, idCol, k, iters)
  def annAssign(emb: DataFrame, vecCol: String,
      model: ops.AnnIvf.IvfModel): DataFrame =
    ops.AnnIvf.assign(emb, vecCol, model)
  def annTopK(assigned: DataFrame, vecCol: String, idCol: String,
      model: ops.AnnIvf.IvfModel, query: Array[Float], k: Int,
      nProbe: Int): DataFrame =
    ops.AnnIvf.topK(assigned, vecCol, idCol, model, query, k, nProbe)
  def annTopKBatch(assigned: DataFrame, vecCol: String, idCol: String,
      queries: DataFrame, qVecCol: String, qIdCol: String,
      model: ops.AnnIvf.IvfModel, k: Int, nProbe: Int): DataFrame =
    ops.AnnIvf.topKBatch(assigned, vecCol, idCol, queries, qVecCol, qIdCol,
      model, k, nProbe)

  /** Product-quantization ANN entry points (memory-side scale path:
    * m-byte codes, ADC top-k without reading float vectors). */
  def pqTrain(emb: DataFrame, vecCol: String, idCol: String, m: Int,
      ksub: Int = 16, iters: Int = 3): ops.AnnPq.PqModel =
    ops.AnnPq.train(emb, vecCol, idCol, m, ksub, iters)
  def pqEncode(emb: DataFrame, vecCol: String,
      model: ops.AnnPq.PqModel): DataFrame =
    ops.AnnPq.encode(emb, vecCol, model)
  def pqTopK(encoded: DataFrame, vecCol: String, idCol: String,
      model: ops.AnnPq.PqModel, query: Array[Float], k: Int,
      shortlist: Int): DataFrame =
    ops.AnnPq.topK(encoded, vecCol, idCol, model, query, k, shortlist)

  /** Combined IVF-PQ ANN (IVFADC layout: coarse prune + residual-PQ
    * ADC + exact re-rank — the billion-scale serving index shape). */
  def ivfPqTrain(emb: DataFrame, vecCol: String, idCol: String, k: Int,
      ivfIters: Int, m: Int, ksub: Int = 16,
      pqIters: Int = 3): ops.AnnIvfPq.IvfPqModel =
    ops.AnnIvfPq.train(emb, vecCol, idCol, k, ivfIters, m, ksub, pqIters)
  def ivfPqEncode(emb: DataFrame, vecCol: String,
      model: ops.AnnIvfPq.IvfPqModel): DataFrame =
    ops.AnnIvfPq.encode(emb, vecCol, model)
  def ivfPqTopK(encoded: DataFrame, vecCol: String, idCol: String,
      model: ops.AnnIvfPq.IvfPqModel, query: Array[Float], k: Int,
      nProbe: Int, shortlist: Int): DataFrame =
    ops.AnnIvfPq.topK(encoded, vecCol, idCol, model, query, k, nProbe,
      shortlist)
  def ivfPqTopKBatch(encoded: DataFrame, vecCol: String, idCol: String,
      queries: DataFrame, qVecCol: String, qIdCol: String,
      model: ops.AnnIvfPq.IvfPqModel, k: Int, nProbe: Int,
      shortlist: Int): DataFrame =
    ops.AnnIvfPq.topKBatch(encoded, vecCol, idCol, queries, qVecCol, qIdCol,
      model, k, nProbe, shortlist)

  /** Semantic (embedding-space) dedup: cluster, pair within clusters at
    * cosine ≥ tau, close transitively, keep one representative. */
  def semanticDedup(emb: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int, tau: Double): DataFrame =
    ops.SemanticDedup.dedup(emb, vecCol, idCol, k, iters, tau)

  /** Damped (optionally weighted) PageRank over an edge DataFrame;
    * dangling mass redistributes so ranks stay a distribution. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: Option[String] = None, damping: Double = 0.85,
      iters: Int = 10): DataFrame =
    ops.PageRank.ranks(edges, srcCol, dstCol, weightCol, damping, iters)

  /** Keyed-series missing-value repair (pandas ffill/bfill/interpolate). */
  def ffill(df: DataFrame, partCols: Seq[String], orderCol: String,
      valueCols: Seq[String]): DataFrame =
    ops.SeriesOps.ffill(df, partCols, orderCol, valueCols)
  def bfill(df: DataFrame, partCols: Seq[String], orderCol: String,
      valueCols: Seq[String]): DataFrame =
    ops.SeriesOps.bfill(df, partCols, orderCol, valueCols)
  def interpolate(df: DataFrame, partCols: Seq[String], orderCol: String,
      valueCol: String, posCol: String): DataFrame =
    ops.SeriesOps.interpolate(df, partCols, orderCol, valueCol, posCol)

  /** Elementwise-mean UDAF for fixed-length float vectors. */
  def centroidUdaf(dim: Int): Column => Column = {
    val agg = org.apache.spark.sql.functions.udaf(new functions.CentroidAgg(dim))
    c => agg(c)
  }

  /** Mergeable t-digest quantile-sketch UDAF (compression δ); read the
    * result with [[tdigestQuantile]]. */
  def tdigestUdaf(delta: Int = 100): Column => Column = {
    val agg = org.apache.spark.sql.functions.udaf(new functions.TDigestAgg(delta))
    c => agg(c)
  }
  def tdigestQuantile(s: functions.TDigestAgg.Sketch, q: Double): Double =
    functions.TDigestAgg.quantile(s, q)

  def exactNtile(df: DataFrame, k: Int, order: Seq[Column],
      out: String): DataFrame = ops.RangedNtile.withNtile(df, k, order, out)
  def skyline(df: DataFrame, minimize: Column, maximize: Column): DataFrame =
    ops.Skyline.skyline2(df, minimize, maximize)
  def kcore(edges: DataFrame, k: Int): DataFrame = ops.KCore.kcore(edges, k)
  /** Edges of the k-truss (every surviving edge closes ≥ k−2
    * triangles) — the edge-grade sibling of [[kcore]]. */
  def ktruss(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int): DataFrame = ops.KTruss.ktruss(edges, srcCol, dstCol, k)
  /** Deterministic synchronous label-propagation communities. */
  def labelProp(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 10): DataFrame =
    ops.LabelProp.communities(edges, srcCol, dstCol, maxIters)

  /** Two-phase top-k: Misra–Gries candidates + exact rescore. */
  def approxTopK(df: DataFrame, valueCol: Column, k: Int,
      capacity: Int = 1024): DataFrame =
    ops.ApproxTopK.topK(df, valueCol, k, capacity)

  /** Bucketed-table layout: shuffle-free co-located joins and aggs. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = ops.Bucketing.writeBucketed(df, table, key, buckets)
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    ops.Bucketing.bucketedJoin(spark, leftTable, rightTable, key)
  def bpeTrain(words: DataFrame, nMerges: Int): Seq[(String, String)] =
    ops.BpeTrain.train(words, nMerges)
  def bpeTokenize(word: Column, merges: Seq[(String, String)]): Column =
    ops.BpeTrain.applyMerges(word, merges)
  def qualityTrain(docs: DataFrame, dim: Int = 64, iters: Int = 30,
      lr: Double = 2.0): ops.QualityClassifier.Model =
    ops.QualityClassifier.train(docs, dim, iters, lr)
  def qualityScore(text: Column, m: ops.QualityClassifier.Model): Column =
    ops.QualityClassifier.score(text, m)

  /** Two-path salted join with a caller-supplied hot-key set (skips
    * the detection scan — see SkewJoin scaladoc). */
  def saltedJoinWithHotKeys(left: DataFrame, right: DataFrame, key: String,
      buckets: Int, hotKeys: Seq[String]): DataFrame =
    ops.SkewJoin.saltedInnerJoinWithHotKeys(left, right, key, buckets, hotKeys)

  /** Exact distributed PCA (round 7): fit / project / total variance. */
  def pcaFit(df: DataFrame, vecCol: String, k: Int): ops.Pca.PcaModel =
    ops.Pca.fit(df, vecCol, k)
  def pcaProject(df: DataFrame, vecCol: String, model: ops.Pca.PcaModel,
      outCol: String = "pca"): DataFrame =
    ops.Pca.project(df, vecCol, model, outCol)
  def pcaTotalVariance(df: DataFrame, vecCol: String): Double =
    ops.Pca.totalVariance(df, vecCol)

  /** MMR diversified retrieval (round 7). */
  def mmrTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Array[Float], k: Int, lambda: Double = 0.7,
      poolSize: Int = 100): Seq[(Long, Double, Double)] =
    ops.Mmr.diversifiedTopK(df, vecCol, idCol, query, k, lambda, poolSize)

  /** One-pass observed ETL metrics (round 7). */
  def observed(df: DataFrame, name: String, metrics: Seq[(String, Column)])
      : (DataFrame, org.apache.spark.sql.Observation) =
    ops.DataQuality.observed(df, name, metrics)
}
