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
}
