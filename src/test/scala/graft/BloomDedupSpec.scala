package graft

import graft.ops.BloomDedup
import org.apache.spark.sql.functions._

/** BloomDedup exactness + routing effectiveness: the bloom-routed
  * incremental dedup must return EXACTLY the plain anti-join result
  * (bloom has no false negatives, and maybe-hits are verified exactly),
  * and the filter must route most genuinely-new rows around the join.
  */
class BloomDedupSpec extends SparkSpec {

  test("newAgainst equals the exact anti-join, including all-new and all-dup slices") {
    import spark.implicits._
    val corpus = Tables.orders(spark, sf0001).select("o_orderkey")
    // batch = half the corpus keys (dups) + a disjoint new-key range
    val dups = corpus.filter(col("o_orderkey") % 2 === 0)
    val fresh = spark.range(10_000_000L, 10_000_500L).toDF("o_orderkey")
    val batch = dups.unionByName(fresh)

    val bloom = BloomDedup.buildFilter(corpus, "o_orderkey",
      expectedItems = 20000, fpp = 0.01)
    val got = BloomDedup.newAgainst(batch, corpus, "o_orderkey", bloom)
      .collect().map(_.getLong(0)).sorted
    val want = batch.join(corpus, Seq("o_orderkey"), "left_anti")
      .collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want), "bloom-routed result diverged from exact anti-join")
    assert(want.length == 500, "expected exactly the fresh keys to survive")
  }

  test("string keys and null keys match anti-join semantics") {
    import spark.implicits._
    val corpus = Seq("a", "b", "c").toDF("k")
    val batch = Seq(Some("a"), Some("z"), None).toDF("k")
    val bloom = BloomDedup.buildFilter(corpus, "k", 100)
    val got = BloomDedup.newAgainst(batch, corpus, "k", bloom)
      .collect().map(r => Option(r.getString(0))).toSet
    val want = batch.join(corpus, Seq("k"), "left_anti")
      .collect().map(r => Option(r.getString(0))).toSet
    assert(got == want, s"got $got want $want")
    assert(got == Set(Some("z"), None),
      "null-keyed rows must survive like the anti-join keeps them")
  }

  test("empty corpus: filter builds and every batch row is new") {
    import spark.implicits._
    val corpus = spark.range(0).toDF("k") // first-ingest state
    val batch = Seq(1L, 2L, 3L).toDF("k")
    // expectedItems = corpus.count() = 0 must not throw (clamped to 1)
    val bloom = BloomDedup.buildFilter(corpus, "k", expectedItems = corpus.count())
    val got = BloomDedup.newAgainst(batch, corpus, "k", bloom)
      .collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(1L, 2L, 3L)),
      "an empty corpus must pass the whole batch through as new")
  }

  test("unsupported key types are rejected up front") {
    import spark.implicits._
    val df = Seq(1.5).toDF("k")
    intercept[IllegalArgumentException] {
      BloomDedup.mightContain(
        BloomDedup.buildFilter(Seq("x").toDF("k"), "k", 10),
        org.apache.spark.sql.functions.col("k"),
        org.apache.spark.sql.types.DoubleType)
    }
  }

  test("the filter routes ~fpp of genuinely-new keys to the exact check") {
    val corpus = Tables.orders(spark, sf0001).select("o_orderkey")
    val bloom = BloomDedup.buildFilter(corpus, "o_orderkey", 20000, 0.01)
    import spark.implicits._
    val fresh = spark.range(20_000_000L, 20_010_000L).toDF("o_orderkey")
    val maybe = fresh.filter(BloomDedup.mightContain(bloom, col("o_orderkey"),
      org.apache.spark.sql.types.LongType)).count()
    // 10k new keys at fpp=0.01 → expect ~100 false positives; 5x slack
    assert(maybe < 500, s"bloom routed $maybe of 10000 new keys to the join — ineffective")
  }
}
