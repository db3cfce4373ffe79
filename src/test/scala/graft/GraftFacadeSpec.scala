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
}
