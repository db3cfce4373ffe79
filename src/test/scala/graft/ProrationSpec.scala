package graft

import graft.ops.PipelineQueries
import org.apache.spark.sql.functions._

/** The two invariants that define largest-remainder proration: each
  * order's allocated cents sum EXACTLY to the rounded header total (no
  * lost penny), and each line sits within one cent of its ideal
  * real-valued proportional share. The output carries its own weight
  * column (line numbers are not unique in the fixture), so both checks
  * derive from the query output plus the orders header alone. */
class ProrationSpec extends SparkSpec {

  private def alloc = PipelineQueries.q117Proration(spark, sf0001)

  private def headers = Tables.orders(spark, sf0001)
    .select(col("o_orderkey"),
      expr("cast(round(o_totalprice * 100) as bigint)").as("total_c"))

  test("allocated cents sum exactly to the order total") {
    val sums = alloc.groupBy("l_orderkey")
      .agg(sum(col("alloc_cents")).as("s"))
      .join(headers, col("l_orderkey") === col("o_orderkey"))
    assert(sums.count() > 0)
    assert(sums.filter(col("s") =!= col("total_c")).count() == 0,
      "largest-remainder apportionment must conserve every cent")
  }

  test("every line is within one cent of its ideal proportional share") {
    val denom = alloc.groupBy(col("l_orderkey").as("ok2"))
      .agg(sum(col("ext_cents")).as("denom"))
    val dev = alloc
      .join(headers, col("l_orderkey") === col("o_orderkey"))
      .join(denom, col("l_orderkey") === col("ok2"))
      .withColumn("ideal",
        col("total_c").cast("double") * col("ext_cents") / col("denom"))
      .withColumn("dev", abs(col("alloc_cents").cast("double") - col("ideal")))
    assert(dev.agg(max(col("dev"))).head.getDouble(0) < 1.0 + 1e-9)
  }
}
