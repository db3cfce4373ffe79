package graft

import graft.ops.AppxQcut
import org.apache.spark.sql.functions._

/** Approximate qcut (ops.AppxQcut) against q98's exact-NTILE contract:
  * near-equal bucket populations, value-monotone buckets, no shuffle in
  * the assignment plan, determinism.
  */
class AppxQcutSpec extends SparkSpec {

  private lazy val orders = Tables.orders(spark, sf0001)

  test("bucket populations are near-equal (exact-sized sketch ⇒ ±1-row NTILE parity)") {
    val k = 10
    val out = AppxQcut.bin(orders, "o_totalprice", k)
    val n = orders.count()
    val sizes = out.groupBy("bucket").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (1 to k).toSet, s"missing buckets: $sizes")
    // accuracy=10000 >> corpus size, so the sketch is exact and each
    // population may deviate from n/k only by tie-straddle at the cuts;
    // o_totalprice is near-unique, so allow a 2% band
    val ideal = n.toDouble / k
    sizes.values.foreach { c =>
      assert(math.abs(c - ideal) <= math.max(2, 0.02 * n),
        s"bucket sizes drifted from equal-frequency: $sizes")
    }
  }

  test("buckets are monotone in the binned value ((lo, hi] intervals)") {
    val out = AppxQcut.bin(orders, "o_totalprice", 10)
    val ranges = out.groupBy("bucket")
      .agg(min(col("o_totalprice").cast("double")).as("lo"),
        max(col("o_totalprice").cast("double")).as("hi"))
      .orderBy("bucket")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    ranges.sliding(2).foreach {
      case Array((b1, _, hi1), (b2, lo2, _)) =>
        assert(lo2 >= hi1,
          s"bucket $b2 overlaps bucket $b1: hi=$hi1 lo=$lo2")
      case _ =>
    }
  }

  test("assignment is a pure projection — no exchange in the bucketed plan") {
    val out = AppxQcut.bin(orders, "o_totalprice", 10)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"bucket assignment must add zero shuffles:\n$p")
  }

  test("binning is deterministic across runs") {
    def run() = AppxQcut.bin(orders, "o_totalprice", 10)
      .select("o_orderkey", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(run() == run())
  }
}
