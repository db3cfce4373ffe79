package graft

import org.apache.spark.sql.functions._

/** The facade must expose working entry points that agree with the
  * underlying operators. */
class GraftFacadeSpec extends SparkSpec {

  test("enable + kernel columns + asofJoin + saltedJoin round-trip") {
    import spark.implicits._
    Graft.enable(spark)
    assert(spark.sql("SELECT cosine_sim(array(2.0f), array(2.0f))").head()
      .getDouble(0) == 1.0)

    val docs = Graft.tables.documents(spark, sf0001).limit(50)
    val fp = docs.select(Graft.simHash(col("text")).as("sh"))
    assert(fp.filter(col("sh") >= 0 && col("sh") < (1L << 60)).count() == 50)

    val l = Seq((1L, 10L, "x")).toDF("k", "t", "p")
    val r = Seq((1L, 5L, 7L)).toDF("rk", "rt", "rid")
    val aj = Graft.asofJoin(l, r, "k", "rk", "t", "rt", Some("rid"))
    assert(aj.head().getAs[Long]("rid") == 7L)

    val o = Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    assert(Graft.saltedJoin(li, o, "o_orderkey").count() ==
      li.join(o, "o_orderkey").count())

    val ctr = Graft.centroidUdaf(64)
    val c = Tables.embeddings(spark, sf0001)
      .agg(ctr(col("embedding")).as("c")).head().getSeq[Double](0)
    assert(c.length == 64)
  }

  test("round-2 facade surface: dedup, quality, diff, embeddings, sinks") {
    import spark.implicits._
    val docs = Graft.tables.documents(spark, sf0001)

    // prefix jaccard join returns the same pairs brute force would
    val toks = docs.limit(80).select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("toks"))
    assert(Graft.prefixJaccardJoin(toks, "doc_id", "toks", 0.9).count() >= 0)

    // bloom dedup: empty corpus-overlap batch passes through whole
    val corpus = Tables.orders(spark, sf0001).select("o_orderkey")
    val bloom = Graft.bloomFilterOf(corpus, "o_orderkey", 20000)
    val fresh = spark.range(50_000_000L, 50_000_100L).toDF("o_orderkey")
    assert(Graft.newAgainst(fresh, corpus, "o_orderkey", bloom).count() == 100)

    // profile + quarantine
    assert(Graft.profile(docs).count() == docs.columns.length)
    val (good, bad) = Graft.quarantine(docs,
      Seq("has_text" -> (col("n_chars") > 0)))
    assert(good.count() + bad.count() == docs.count())

    // snapshot diff finds the one changed row
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val next = Seq((1L, "a"), (2L, "B")).toDF("id", "v")
    val d = Graft.snapshotDiff(base, next, Seq("id"), Seq("v")).collect()
    assert(d.length == 1 && d.head.getAs[String]("change") == "changed")

    // embedding utilities
    val emb = Tables.embeddings(spark, sf0001).limit(10)
    assert(emb.select(Graft.l2Normalize(col("embedding"))).count() == 10)
    assert(emb.select(Graft.randomProject(col("embedding"), 8)).count() == 10)

    // forward as-of through the facade
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 12L, 9L)).toDF("rk", "rt", "rid")
    val fwd = Graft.asofJoin(l, r, "k", "rk", "t", "rt", Some("rid"),
      direction = plans.AsofDirection.Forward)
    assert(fwd.head().getAs[Long]("rid") == 9L)

    // clustered sink writes the planned number of range files
    val dir = java.nio.file.Files.createTempDirectory("facade_sink").toString
    assert(Graft.writeClustered(docs, s"$dir/d", Seq("doc_id"), 250L) == 2)
  }

  test("round-5 facade surface: ivf-pq, semantic dedup, pagerank") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf0001)

    // IVF-PQ: train/encode/serve round-trips and returns k ranked rows
    val model = Graft.ivfPqTrain(emb, "embedding", "vec_id",
      k = 4, ivfIters = 1, m = 8)
    val encoded = Graft.ivfPqEncode(emb, "embedding", model)
    val q = emb.filter(col("vec_id") === 0)
      .head().getSeq[Float](1).toArray
    val top = Graft.ivfPqTopK(encoded, "embedding", "vec_id", model, q,
      k = 5, nProbe = 2, shortlist = 20).collect()
    assert(top.length == 5)
    val batch = Graft.ivfPqTopKBatch(encoded, "embedding", "vec_id",
      emb.filter(col("vec_id") < 2)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv")),
      "qv", "q_id", model, k = 5, nProbe = 2, shortlist = 20)
    assert(batch.count() == 10)

    // semantic dedup labels every row, reps are group minima
    val sd = Graft.semanticDedup(emb, "embedding", "vec_id",
      k = 4, iters = 1, tau = 0.95).collect()
    assert(sd.length == emb.count())

    // pagerank over a tiny weighted graph sums to 1
    val edges = Seq((0L, 1L, 3.0), (1L, 0L, 1.0)).toDF("s", "d", "w")
    val pr = Graft.pageRank(edges, "s", "d", Some("w"), iters = 5)
      .collect().map(_.getDouble(1))
    assert(math.abs(pr.sum - 1.0) < 1e-9)
  }

  test("round-6 facade surface: labelProp, tdigest, approxTopK, bucketing") {
    import spark.implicits._

    // two triangles joined by one bridge → two communities
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 4L), (3L, 4L)).toDF("src", "dst")
    val lp = Graft.labelProp(es, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lp(1L) == lp(2L) && lp(4L) == lp(5L))

    // t-digest UDAF through the facade: median of 1..1000 ≈ 500
    val tdAgg = Graft.tdigestUdaf(100)
    val skRow = (1 to 1000).map(_.toDouble).toDF("v")
      .agg(tdAgg(col("v")).as("td")).select("td.*")
      .as[graft.functions.TDigestAgg.Sketch].collect()(0)
    assert(math.abs(Graft.tdigestQuantile(skRow, 0.5) - 500.0) <= 20.0)

    // two-phase top-k through the facade
    val words = (1 to 50).flatMap(i => Seq.fill(100 / i)(s"t$i")).toDF("w")
    val tk = Graft.approxTopK(words, col("w"), k = 3, capacity = 64)
      .collect().map(_.getString(0))
    assert(tk.head == "t1")

    // bucketed write + join through the facade
    val l = Seq((1L, "a"), (2L, "b"), (1L, "c")).toDF("k", "v")
    val r = Seq((1L, 10L), (2L, 20L)).toDF("k", "x")
    Graft.writeBucketed(l, "fac_l", "k", 4)
    Graft.writeBucketed(r, "fac_r", "k", 4)
    try {
      assert(Graft.bucketedJoin(spark, "fac_l", "fac_r", "k").count() == 3)
    } finally {
      spark.sql("DROP TABLE IF EXISTS fac_l")
      spark.sql("DROP TABLE IF EXISTS fac_r")
    }
  }
}
