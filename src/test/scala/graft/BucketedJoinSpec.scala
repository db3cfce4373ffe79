package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** S6/J2 at scale: bucketing both fact tables on the join key at write
  * time removes the join shuffle entirely — the plan must contain no
  * Exchange. This is the "pre-partition for co-located joins" story the
  * 100 TB mandate calls for, demonstrated on the real fixture tables.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans with zero exchanges") {
    val wh = Files.createTempDirectory("graft_buckets").toString
    val o = Tables.orders(spark, sf0001)
    val l = Tables.lineitem(spark, sf0001)
      .withColumnRenamed("l_orderkey", "o_orderkey")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    o.write.option("path", s"$wh/b_orders")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    l.write.option("path", s"$wh/b_lineitem")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_lineitem")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // at fixture scale the planner would broadcast (which itself is an
      // Exchange) and ignore buckets; force the sort-merge path the
      // bucketing exists for
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == l.count(), "inner join keeps every lineitem row")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("native as-of join over tables bucketed on the key plans with zero exchanges") {
    // AsofJoinExec declares ClusteredDistribution on each side's key
    // (AsofJoin.scala) — the claim "one shuffle per side, zero when
    // bucketed" needs the bucketed half pinned too. The bucket sort is
    // on the key only, so a per-partition Sort on (key, ts) remains;
    // what must disappear is every Exchange.
    val wh = Files.createTempDirectory("graft_asof_buckets").toString
    val e = Tables.events(spark, sf0001)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    spark.sql("DROP TABLE IF EXISTS b_purchases")
    spark.sql("DROP TABLE IF EXISTS b_views")
    purchases.write.option("path", s"$wh/b_purchases")
      .bucketBy(8, "user_id").sortBy("user_id").saveAsTable("b_purchases")
    views.write.option("path", s"$wh/b_views")
      .bucketBy(8, "v_user_id").sortBy("v_user_id").saveAsTable("b_views")
    try {
      val joined = graft.plans.AsofJoinOp.asofJoin(
        spark.table("b_purchases"), spark.table("b_views"),
        leftKey = "user_id", rightKey = "v_user_id",
        leftTs = "purchase_ts", rightTs = "view_ts", tie = Some("view_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AsofJoin "), s"native operator missing:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed as-of join should not shuffle:\n$plan")
      // same answer as the unbucketed plan
      val unbucketed = graft.plans.AsofJoinOp.asofJoin(purchases, views,
        leftKey = "user_id", rightKey = "v_user_id",
        leftTs = "purchase_ts", rightTs = "view_ts", tie = Some("view_id"))
      assert(joined.exceptAll(unbucketed).isEmpty &&
        unbucketed.exceptAll(joined).isEmpty,
        "bucketed and unbucketed as-of results must be identical")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_purchases")
      spark.sql("DROP TABLE IF EXISTS b_views")
    }
  }
}
