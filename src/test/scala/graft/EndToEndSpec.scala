package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Capstone: the reference category's whole lifecycle — ingest a dirty
  * CSV feed, quarantine rule violations, dedup keep-latest, enrich with
  * a dimension, aggregate, and land range-clustered parquet — composed
  * entirely from this engine's operators through the public facade. */
class EndToEndSpec extends SparkSpec {

  test("dirty CSV feed → quarantine → dedup → enrich → aggregate → clustered sink") {
    import spark.implicits._
    val base = Files.createTempDirectory("e2e").toString

    // 1. INGEST: a feed with a duplicate (stale) row and a rule violation
    val feed = Seq(
      "cust_id,nation_id,balance,updated_at",
      "1,0,100.0,2024-01-01",
      "1,0,250.0,2024-02-01",   // newer version of cust 1
      "2,1,-50.0,2024-01-15",   // violates nonneg rule
      "3,2,75.0,2024-01-20")
    val feedPath = s"$base/feed.csv"
    java.nio.file.Files.write(java.nio.file.Paths.get(feedPath),
      feed.mkString("\n").getBytes)
    val raw = spark.read.option("header", "true")
      .schema("cust_id LONG, nation_id INT, balance DOUBLE, updated_at DATE")
      .csv(feedPath)
    assert(raw.count() == 4)

    // 2. QUALITY: quarantine the negative balance
    val (clean, quarantined) = Graft.quarantine(raw,
      Seq("nonneg_balance" -> (col("balance") >= 0)))
    assert(quarantined.select("cust_id").head().getLong(0) == 2L)

    // 3. DEDUP: keep-latest per customer (deterministic survivor)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cust_id").orderBy(col("updated_at").desc)
    val current = clean.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    assert(current.count() == 2)
    assert(current.filter(col("cust_id") === 1).head()
      .getAs[Double]("balance") == 250.0)

    // 4. ENRICH: broadcast-join the nation dimension
    val nation = Graft.tables.nation(spark, sf0001)
    val enriched = current.join(broadcast(nation),
      col("nation_id") === col("n_nationkey"))
    assert(enriched.count() == 2)

    // 5. AGGREGATE + 6. LAND range-clustered parquet, read-back checked
    val report = enriched.groupBy("n_name")
      .agg(count(lit(1)).as("n_cust"), sum("balance").as("total_balance"))
    val outDir = s"$base/report"
    Graft.writeClustered(report, outDir, Seq("n_name"), 100L)
    val back = spark.read.parquet(outDir)
    assert(back.count() == 2)
    assert(back.agg(sum("total_balance")).head().getDouble(0) == 325.0)
  }

  test("LLM curation: classifier gate → hash dedup → BPE vocab → tokenize") {
    // the training-data-pipeline capstone, composed through the facade:
    // a learned quality screen gates the corpus, exact dedup collapses
    // repeats, BPE learns a vocabulary on the survivors, and the corpus
    // tokenizes with it — every stage an engine operator
    val docs = Tables.documents(spark, sf0001).limit(400)
      .select("doc_id", "text")

    // 1. GATE: train on a planted separable label, keep high scorers
    val marker = (1 to 25).map(_ => "xkeepx").mkString(" ")
    val corpus = docs
      .withColumn("label", (col("doc_id") % 2 === 0).cast("int"))
      .withColumn("text",
        when(col("label") === 1, concat(col("text"), lit(" " + marker)))
          .otherwise(col("text")))
    val m = Graft.qualityTrain(corpus.select("text", "label"),
      dim = 64, iters = 30, lr = 4.0)
    val gated = corpus
      .filter(Graft.qualityScore(col("text"), m) >= 0.5)
    val keptOf = gated.agg(
      sum(col("label")).as("pos"), count(lit(1)).as("n")).head
    val totalPos = corpus.agg(sum(col("label"))).head.getLong(0)
    assert(keptOf.getLong(0) >= (totalPos * 0.9).toLong,
      "the gate must keep ~all planted-positive docs")
    assert(keptOf.getLong(1) - keptOf.getLong(0) <=
      ((corpus.count() - totalPos) * 0.1).toLong,
      "the gate must drop ~all unplanted docs")

    // 2. DEDUP: inject duplicates, collapse by content hash
    val withDups = gated.unionAll(gated.limit(20))
    val deduped = withDups
      .withColumn("h", Graft.docHash(Graft.tokenHashes(col("text"))))
      .dropDuplicates("h")
    assert(deduped.count() == gated.count(),
      "every injected duplicate must collapse onto its original")

    // 3. VOCAB: BPE merges from the survivor word-frequency table
    val words = deduped
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val merges = Graft.bpeTrain(words, 8)
    assert(merges.length == 8)

    // 4. TOKENIZE: apply the learned merges per word across the corpus;
    // token counts must land between word count and char count, and
    // concatenating each word's tokens must reconstruct the word
    val toked = deduped.select(
      col("text"),
      transform(split(col("text"), " "),
        w => Graft.bpeTokenize(w, merges)).as("tw"),
      size(filter(split(col("text"), " "),
        w => length(w) > 0)).as("n_words"),
      length(regexp_replace(col("text"), " ", "")).as("n_chars"))
      .withColumn("n_toks",
        aggregate(col("tw"), lit(0), (a, ts) => a + size(ts)))
      .withColumn("rejoined",
        array_join(transform(col("tw"), ts => array_join(ts, "")), " "))
    val bad = toked.filter(
      col("n_toks") < col("n_words") || col("n_toks") > col("n_chars"))
    assert(bad.count() == 0, "token counts must sit in [words, chars]")
    assert(toked.filter(col("rejoined") =!= col("text")).count() == 0,
      "concatenating tokens must reconstruct every document verbatim")
  }

  test("retrieval pipeline: PCA compress → IVF index → MMR rerank") {
    import graft.ops.{AnnIvf, Mmr, Pca}
    val emb = Tables.embeddings(spark, sf0001)
    // 64-d → 16-d data-dependent compression; the index and all
    // downstream similarity work run in the compressed space
    val model = Pca.fit(emb, "embedding", 16)
    val compressed = Pca.project(emb, "embedding", model)
      .select(col("vec_id"),
        transform(col("pca"), _.cast("float")).as("cvec"))
      .cache()
    val ivf = AnnIvf.train(compressed, "cvec", "vec_id", k = 8, iters = 3)
    val assigned = AnnIvf.assign(compressed, "cvec", ivf)
    assert(assigned.select("cid").distinct().count() > 1,
      "IVF must spread the compressed corpus over buckets")
    // query with the first vector's compressed form; rerank with MMR
    val q = compressed.orderBy("vec_id").head().getSeq[Float](1).toArray
    val picks = Mmr.diversifiedTopK(compressed, "cvec", "vec_id", q,
      k = 10, lambda = 0.7, poolSize = 50)
    assert(picks.size == 10 && picks.map(_._1).distinct.size == 10)
    // the top pick must be the compressed-space cosine argmax (the
    // query vector itself, id 0's row) and relevance ≈ 1
    val brute = compressed
      .withColumn("sim", graft.functions.SimFns.cosineSim(col("cvec"),
        typedlit(q.toSeq)))
      .orderBy(col("sim").desc, col("vec_id"))
      .select("vec_id").limit(20).collect().map(_.getLong(0))
    assert(picks.head._1 == brute.head, "MMR pick 1 must be the cosine argmax")
    assert(math.abs(picks.head._2 - 1.0) < 1e-6)
    // λ=0.7 still favors relevance: most picks come from the brute
    // top-20 of the same space, but diversity may swap in outsiders
    val overlap = picks.map(_._1).count(brute.toSet)
    assert(overlap >= 5, s"only $overlap/10 MMR picks in brute top-20")
    compressed.unpersist()
    ()
  }
}
