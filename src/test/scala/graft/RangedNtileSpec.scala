package graft

import graft.ops.RangedNtile
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RangedNtile == Spark's own global `ntile()` window, which is the SQL
  * semantic spec (and what the q98/q120 DuckDB oracles run). The library
  * op must agree row-for-row under the same total order while never
  * moving the data through one partition. */
class RangedNtileSpec extends SparkSpec {

  test("withNtile matches the global ntile window exactly (k=7, n%k != 0)") {
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_totalprice"))
    val ours = RangedNtile.withNtile(o, 7,
      Seq(col("o_totalprice"), col("o_orderkey")), "b")
    val ref = o.withColumn("b_ref",
      ntile(7).over(Window.orderBy(col("o_totalprice"), col("o_orderkey"))))
    val joined = ours.join(ref, Seq("o_orderkey", "o_totalprice"))
    assert(joined.count() == o.count())
    assert(joined.filter(col("b") =!= col("b_ref")).count() == 0,
      "bucket assignment must equal NTILE's front-loaded split")
  }

  test("bucket populations are NTILE-shaped: first n mod k hold one extra") {
    val o = Tables.orders(spark, sf0001).select(col("o_orderkey"))
    val n = o.count()
    val k = 10
    val sizes = RangedNtile.withNtile(o, k, Seq(col("o_orderkey")), "b")
      .groupBy("b").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val q = n / k
    val rem = (n % k).toInt
    (1 to k).foreach { b =>
      val expected = if (b <= rem) q + 1 else q
      assert(sizes.getOrElse(b, 0L) == expected, s"bucket $b")
    }
  }

  test("no single-partition sort in the plan") {
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_totalprice"))
    val p = RangedNtile.withNtile(o, 5,
        Seq(col("o_totalprice"), col("o_orderkey")), "b")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition"),
      s"RangedNtile must stay parallel:\n$p")
    assert(!p.contains("ntile("), s"no global ntile window:\n$p")
  }
}
