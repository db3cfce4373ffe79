package graft

import graft.ops.Kmv
import org.apache.spark.sql.functions._

/** The KMV machinery lifted in r15 (r14 verdict mandate #4) — the
  * CountMinSpec pattern: error envelope, shard-merge equivalence (the
  * property that lets a 100 TB pipeline sketch shard-locally and merge
  * without a row-level shuffle), the small-set exact regime, and
  * agreement between the typed Aggregator and the DataFrame sketch
  * frame the oracle queries (q326/q331/q332) compose. */
class KmvSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  private def exactDistinct(sf: String): Long =
    Tables.orders(spark, sf).agg(count_distinct(col("o_custkey")))
      .head().getLong(0)

  test("estimate lands inside the (k-1)/u_k error envelope") {
    // k = 256 → relative standard error ~ 1/sqrt(k-2) ≈ 6.3%; assert a
    // generous 4-sigma band (the NonDegeneracySpec q326 pin at 25% is
    // the oracle-side twin of this bound). sf0.001 has only 150
    // distinct custkeys — BELOW k — so it exercises the exact regime
    // instead of the envelope.
    val sk1 = Kmv.sketchFrame(Tables.orders(spark, sf0001),
      col("o_custkey")).collect().map(_.getLong(0))
    val exact1 = exactDistinct(sf0001)
    assert(exact1 < 256 && sk1.length.toLong === exact1)
    assert(Kmv.estimate(sk1) === exact1.toDouble)

    val sk = Kmv.sketchFrame(Tables.orders(spark, sf001),
      col("o_custkey")).collect().map(_.getLong(0))
    val exact = exactDistinct(sf001)
    assert(exact > 500, s"fixture too thin for the envelope: $exact")
    assert(sk.length === 256, "sketch underfilled")
    val est = Kmv.estimate(sk)
    val rel = math.abs(est / exact - 1.0)
    assert(rel < 0.25, s"KMV estimate $est vs exact $exact")
  }

  test("per-shard sketches merge to EXACTLY the whole-table sketch") {
    // k-min of a union is the k-min of per-shard k-mins — KMV's
    // defining (and, unlike t-digest, EXACT) merge property
    val hv = Tables.orders(spark, sf0001)
      .select(Kmv.hashCol(col("o_custkey")).as("hv"),
        pmod(col("o_orderkey"), lit(4)).as("shard"))
    val whole = Kmv.sketchFrame(Tables.orders(spark, sf0001),
      col("o_custkey")).collect().map(_.getLong(0))
    val agg = udaf(new Kmv.KmvAgg(256))
    val shards = hv.groupBy("shard").agg(agg(col("hv")).as("sk"))
      .collect().map(_.getAs[Seq[Long]]("sk").toArray)
    assert(shards.length === 4)
    val merged = shards.reduce((a, b) => Kmv.mergeSketches(a, b))
    assert(merged.toSeq === whole.toSeq,
      "shard-merged sketch != whole-table sketch")
  }

  test("Aggregator path == DataFrame sketchFrame path, bit for bit") {
    val agg = udaf(new Kmv.KmvAgg(256))
    val viaAgg = Tables.orders(spark, sf0001)
      .select(Kmv.hashCol(col("o_custkey")).as("hv"))
      .agg(agg(col("hv")).as("sk"))
      .head().getAs[Seq[Long]]("sk").toArray
    val viaFrame = Kmv.sketchFrame(Tables.orders(spark, sf0001),
      col("o_custkey")).collect().map(_.getLong(0))
    assert(viaAgg.toSeq === viaFrame.toSeq)
  }

  test("below k distinct values the sketch IS the set and the estimate is exact") {
    import spark.implicits._
    val small = (1L to 100L).toDF("k")
    val sk = Kmv.sketchFrame(small, col("k")).collect().map(_.getLong(0))
    assert(sk.length === 100)
    assert(Kmv.estimate(sk) === 100.0)
    assert(sk.toSeq === sk.sorted.toSeq)
    // duplicate-heavy input: same 100 distinct keys, any multiplicity
    val dups = small.union(small).union(small)
    val sk2 = Kmv.sketchFrame(dups, col("k")).collect().map(_.getLong(0))
    assert(sk2.toSeq === sk.toSeq, "multiplicity leaked into the sketch")
  }

  test("overlap composition estimates Jaccard and intersection within band") {
    // two known overlapping integer sets: A = 1..3000, B = 1000 shared
    // keys (2001..3000) + 3000 disjoint shifted keys → |A|=3000,
    // |B|=4000, |A∩B|=1000, |A∪B|=6000, J=1/6
    import spark.implicits._
    val a = (1L to 3000L).toDF("k")
    val b = (2001L to 5000L).map(_ + 1000000L).toDF("k")
      .union((2001L to 3000L).toDF("k"))
    val skA = Kmv.sketchFrame(a, col("k")).collect().map(_.getLong(0))
    val skB = Kmv.sketchFrame(b, col("k")).collect().map(_.getLong(0))
    val (jac, dU, dI) = Kmv.overlap(skA, skB)
    assert(math.abs(jac - 1.0 / 6.0) < 0.07, s"jaccard $jac vs 1/6")
    assert(math.abs(dU / 6000.0 - 1.0) < 0.25, s"union est $dU vs 6000")
    assert(math.abs(dI / 1000.0 - 1.0) < 0.45, s"inter est $dI vs 1000")
  }

  test("KmvAgg guards and reduce-path dedup/cut behavior") {
    intercept[IllegalArgumentException](new Kmv.KmvAgg(1))
    val agg = new Kmv.KmvAgg(3)
    var buf = agg.zero
    Seq(50L, 10L, 50L, 30L, 70L, 5L).foreach(x => buf = agg.reduce(buf, x))
    // k=3 smallest distinct of {50,10,30,70,5} = {5,10,30}
    assert(buf.toSeq === Seq(5L, 10L, 30L))
    assert(agg.merge(buf, Array(1L, 10L, 90L)).toSeq === Seq(1L, 5L, 10L))
  }
}
