package graft

import graft.ops.SkewJoin
import org.apache.spark.sql.functions._

/** Salted joins must be a pure physical rewrite: bit-identical rows to
  * the plain join, with the hot key's rows actually spread over salt
  * buckets. */
class SkewJoinSpec extends SparkSpec {

  test("salted inner join == plain inner join on orders ⋈ lineitem") {
    val o = Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val plain = l.join(o, Seq("o_orderkey"), "inner")
    val salted = SkewJoin.saltedInnerJoin(l, o, "o_orderkey", buckets = 8)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("a hot key spreads across salt buckets") {
    import spark.implicits._
    // one key holding 90% of the left side — the shape AQE's split can't
    // help when a post-join aggregation keys on it
    val hot = (1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong + 1, i))
    val left = hot.toDF("k", "v")
    val right = (1L to 101L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", buckets = 8)
    assert(salted.count() == 1000)
    // reconstruct the salt distribution of the hot key
    val saltsUsed = left.filter(col("k") === 1L)
      .withColumn("__salt",
        pmod(xxhash64(struct(col("k"), col("v"))), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(saltsUsed >= 6, s"hot key landed in only $saltsUsed of 8 buckets")
  }
}
