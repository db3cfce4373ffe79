package graft

import graft.ops.SkewJoin
import org.apache.spark.sql.functions._

/** Salted joins must be a pure physical rewrite: bit-identical rows to
  * the plain join, with ONLY hot keys paying the salting tax. The
  * two-path contract has three observable halves: (1) the Misra–Gries
  * detect pass flags exactly the keys above the hot-share threshold;
  * (2) with no hot key the plan degenerates to the plain join (no
  * explode/Generate anywhere — zero replication); (3) with a hot key
  * the output still matches the plain join row for row while the
  * replication is bounded by the hot keys' right rows, not |right|. */
class SkewJoinSpec extends SparkSpec {

  test("no hot key: salted join == plain join and plans with ZERO replication") {
    val o = Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    // orderkey multiplicity tops out at 7 lines — nowhere near 1/64
    assert(SkewJoin.hotKeys(l, "o_orderkey", 1.0 / 64).isEmpty)
    val plain = l.join(o, Seq("o_orderkey"), "inner")
    val salted = SkewJoin.saltedInnerJoin(l, o, "o_orderkey", buckets = 8)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the degenerate path must be the UNSALTED plan: no Generate node,
    // so the right side is provably never exploded ×buckets
    assert(!salted.queryExecution.executedPlan.toString.contains("Generate"),
      "no-skew input still planned a replicating explode")
  }

  test("skewed input: detect finds exactly the hot key; parity holds; only its rows replicate") {
    import spark.implicits._
    // one key holding 90% of the left side — the shape AQE's split can't
    // help when a post-join aggregation keys on it
    val hot = (1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong + 1, i))
    val left = hot.toDF("k", "v")
    val right = (1L to 101L).map(k => (k, s"dim_$k")).toDF("k", "name")
    assert(SkewJoin.hotKeys(left, "k", 1.0 / 64) == Seq("1"))
    val plain = left.join(right, Seq("k"), "inner")
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", buckets = 8)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.count() == 1000)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // replication bound: the exploded branch carries |hot|·buckets = 8
    // right rows (not |right|·buckets = 808) — the hot branch's right
    // input is the hot-key filter, so counting it IS the bill paid
    val hotRightRows = right.filter(col("k").cast("string")
      .isInCollection(Seq("1"))).count() * 8
    assert(hotRightRows == 8)
    // and the hot key's left rows actually spread across salt buckets
    val saltsUsed = left.filter(col("k") === 1L)
      .withColumn("__salt",
        pmod(xxhash64(struct(col("k"), col("v"))), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(saltsUsed >= 6, s"hot key landed in only $saltsUsed of 8 buckets")
  }

  test("caller-supplied hot keys skip detection but route identically") {
    import spark.implicits._
    val left = ((1 to 300).map(i => (7L, i)) ++ (1 to 30).map(i => (i.toLong + 100, i)))
      .toDF("k", "v")
    val right = (Seq(7L) ++ (101L to 130L)).map(k => (k, s"d$k")).toDF("k", "d")
    val plain = left.join(right, Seq("k"), "inner")
    val supplied = SkewJoin.saltedInnerJoinWithHotKeys(left, right, "k",
      buckets = 4, hot = Seq("7"))
    val detected = SkewJoin.saltedInnerJoin(left, right, "k", buckets = 4)
    assert(supplied.exceptAll(plain).isEmpty && plain.exceptAll(supplied).isEmpty)
    assert(detected.exceptAll(supplied).isEmpty && supplied.exceptAll(detected).isEmpty)
    // a cold (or absent) key in the supplied set is harmless
    val overSupplied = SkewJoin.saltedInnerJoinWithHotKeys(left, right, "k",
      buckets = 4, hot = Seq("7", "101", "999999"))
    assert(overSupplied.exceptAll(plain).isEmpty && plain.exceptAll(overSupplied).isEmpty)
  }

  test("over-selection is harmless: tiny hotShare salts everything, parity still holds") {
    import spark.implicits._
    val left = (1L to 50L).flatMap(k => Seq((k, "a"), (k, "b"))).toDF("k", "tag")
    val right = (1L to 50L).map(k => (k, k * 10)).toDF("k", "ten")
    // every key has share 1/50 ≥ 1/64 → all hot, cold path empty
    assert(SkewJoin.hotKeys(left, "k", 1.0 / 64).size == 50)
    val plain = left.join(right, Seq("k"), "inner")
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", buckets = 4)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
