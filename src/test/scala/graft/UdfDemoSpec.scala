package graft

import graft.functions.UdfDemo
import org.apache.spark.sql.functions._

/** The §2.10 scalar-UDF demo: the UDF and its builtin-expression twin
  * must agree on the fixture corpus (including nulls and messy
  * whitespace), and the UDF must be visible as a black box in the plan —
  * the reason it stays off oracle/hot paths. */
class UdfDemoSpec extends SparkSpec {

  test("normalizeTextUdf matches the builtin-expression form on fixtures + edge cases") {
    import spark.implicits._
    val edge = Seq("  Mixed   CASE\t text ", "", "   ", null.asInstanceOf[String])
      .toDF("text")
    val corpus = Tables.documents(spark, sf0001).select("text").union(edge)
    val n = corpus.select(
        UdfDemo.normalizeTextUdf(col("text")).as("via_udf"),
        UdfDemo.normalizeTextExpr(col("text")).as("via_expr"))
      .filter(!(col("via_udf") <=> col("via_expr")))
      .count()
    assert(n == 0, "UDF and builtin expression diverged")
  }

  test("the UDF plans as a black-box invocation — why it stays off hot paths") {
    val p = Tables.documents(spark, sf0001)
      .select(UdfDemo.normalizeTextUdf(col("text")))
      .queryExecution.executedPlan.toString
    assert(p.contains("UDF"), s"expected a UDF marker in the plan:\n$p")
  }
}
