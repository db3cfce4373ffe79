package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable point-frequency sketches: Spark's `count_min_sketch` SQL
  * aggregate (binary output, public `CountMinSketch` util for reading) —
  * the frequency partner of the HLL rollup (HllSketchSpec) and the
  * sketch-sized alternative to exact per-key counts when the key space
  * outgrows memory. Pinned properties: CM never undercounts (one-sided
  * error), the eps·N overcount envelope holds, and per-shard sketches
  * MERGE to the whole-table answer — the property that lets a 100 TB
  * pipeline build frequency tables shard-locally and union driver-side
  * (or tree-aggregate) without a row-level shuffle. */
class CountMinSpec extends SparkSpec {

  private val aggSql = "count_min_sketch(o_custkey, 0.001d, 0.99d, 42)"

  private def readSketch(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))

  test("estimates are one-sided within eps*N of exact key counts") {
    val o = Tables.orders(spark, sf0001)
    val n = o.count()
    val sk = readSketch(
      o.agg(expr(aggSql).as("sk")).head.getAs[Array[Byte]](0))
    val exact = o.groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(exact.length > 100)
    exact.foreach { case (k, c) =>
      val est = sk.estimateCount(java.lang.Long.valueOf(k))
      assert(est >= c, s"CM undercounted key $k: $est < $c")
      assert(est <= c + (0.001 * n).toLong + 1,
        s"key $k overcounted beyond eps*N: $est vs $c (n=$n)")
    }
  }

  test("per-shard sketches merge to the one-pass sketch bit-for-bit") {
    val o = Tables.orders(spark, sf0001)
    val whole = readSketch(
      o.agg(expr(aggSql).as("sk")).head.getAs[Array[Byte]](0))
    val shards = o.withColumn("shard", col("o_orderkey") % 3)
      .groupBy("shard").agg(expr(aggSql).as("sk"))
      .collect().map(r => readSketch(r.getAs[Array[Byte]]("sk")))
    assert(shards.length == 3)
    val merged = shards.reduce { (a, b) => a.mergeInPlace(b); a }
    // same (eps, confidence, seed) → same hash lattice → identical
    // counters after merge; spot-check via estimates on real keys
    val keys = o.select("o_custkey").distinct().limit(200)
      .collect().map(_.getLong(0))
    keys.foreach { k =>
      assert(merged.estimateCount(java.lang.Long.valueOf(k)) ==
        whole.estimateCount(java.lang.Long.valueOf(k)),
        s"merged vs one-pass estimate diverged for key $k")
    }
  }
}
