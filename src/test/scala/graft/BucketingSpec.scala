package graft

import graft.ops.Bucketing
import org.apache.spark.sql.functions._

/** Proves the bucketed-layout contract: the join of two tables
  * bucketed on the same key plans with ZERO exchanges and ZERO sorts
  * (the distribution/order requirements are satisfied by the layout),
  * returns exactly the unbucketed join's rows, and a point predicate
  * on the bucket key prunes to one bucket's files. */
class BucketingSpec extends SparkSpec {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan.toString
  }

  test("bucketed join runs with no exchange and no sort") {
    val l = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey", "l_quantity")
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    Bucketing.writeBucketed(l, "b_lineitem", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "b_orders", "l_orderkey", 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the test exercises the SMJ requirement path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // trust the written per-bucket sort order (sound: writeBucketed
      // guarantees single-file buckets — see the Bucketing scaladoc)
      spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders",
        "l_orderkey")
      val plan = executedPlan(joined)
      assert(plan.contains("SortMergeJoin"), plan.takeWhile(_ != '\n'))
      assert(!plan.contains("Exchange"),
        "bucketed join must not shuffle:\n" + plan)
      assert(!plan.contains("Sort "),
        "bucket-sorted join must not re-sort:\n" + plan)

      // row parity with the plain (shuffled) join
      val expected = l.join(o, "l_orderkey")
      assert(joined.exceptAll(expected).isEmpty &&
        expected.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("aggregation on the bucket key needs no exchange") {
    val o = Tables.orders(spark, sf0001).select("o_custkey", "o_totalprice")
    Bucketing.writeBucketed(o, "b_orders_cust", "o_custkey", 8)
    try {
      val agg = spark.table("b_orders_cust")
        .groupBy("o_custkey").agg(sum("o_totalprice"))
      val plan = executedPlan(agg)
      assert(!plan.contains("Exchange"),
        "agg on the bucket key must not shuffle:\n" + plan)
      assert(agg.count() ==
        o.select("o_custkey").distinct().count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders_cust")
    }
  }

  test("point predicate on the bucket key prunes to one bucket") {
    val o = Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(o, "b_orders_pt", "o_orderkey", 8)
    // autoBucketedScan turns bucketed reading (and with it, bucket
    // pruning) off for plans with no distribution requirement — a
    // point lookup is exactly that, so force the bucketed scan path
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
      "false")
    try {
      val q = spark.table("b_orders_pt").filter(col("o_orderkey") === 7L)
      val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
      assert(scan.contains("SelectedBucketsCount: 1 out of 8"),
        "expected bucket pruning in the scan:\n" + scan)
      assert(q.count() ==
        o.filter(col("o_orderkey") === 7L).count())
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS b_orders_pt")
    }
  }
}
