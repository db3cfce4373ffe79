package graft

import org.apache.spark.sql.functions._

/** Batch-operator sanity on sf0.001: golden shapes for the flagship,
  * the UDAF showcase, and the as-of join (SURVEY.md §5.4). The full
  * value-level gate is the DuckDB parity harness (scripts/precheck.py);
  * these tests catch regressions without leaving sbt. */
class OperatorSpec extends SparkSpec {

  test("flagship pricing summary returns the 6 (returnflag, linestatus) groups") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getLong(8)).sum > 0, "count_order must be positive")
  }

  test("every declared query has an oracle and runs non-empty on sf0.001") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    // q7_nation_except is empty by construction (set diff of equal sets)
    val allowEmpty = Set("q7_nation_except")
    for ((name, fn) <- SparkEntry.queries if !allowEmpty(name)) {
      val n = fn(spark, sf0001).limit(1).count()
      assert(n > 0, s"$name returned no rows on sf0.001")
    }
  }

  test("CentroidAgg UDAF matches the posexplode+avg rewrite") {
    val emb = Tables.embeddings(spark, sf0001)
    val udafForm = emb.groupBy("label")
      .agg(udaf(new graft.functions.CentroidAgg(64)).apply(col("embedding"))
        .as("centroid"))
      .select(col("label"), posexplode(col("centroid")).as(Seq("pos", "c_udaf")))
    val explodeForm = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg(col("x").cast("double")).as("c_explode"))
    val diff = udafForm.join(explodeForm, Seq("label", "pos"))
      .filter(abs(col("c_udaf") - col("c_explode")) > 1e-9).count()
    assert(diff == 0)
  }

  test("A5 approx_count_distinct within rsd bounds of the exact count") {
    val li = Tables.lineitem(spark, sf0001)
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.05).as("approx")).head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.15,
      s"approx $approx vs exact $exact drifts past 3x the 5% rsd")
  }

  test("A5 approx_percentile lands within 2% of the exact percentile") {
    val o = Tables.orders(spark, sf0001)
    val row = o.agg(
      percentile(col("o_totalprice"), lit(0.5)).as("exact"),
      approx_percentile(col("o_totalprice"), lit(0.5), lit(10000)).as("approx"))
      .head()
    val exact = row.getDouble(0)
    val approx = row.getDouble(1)
    assert(math.abs(approx - exact) / exact < 0.02,
      s"approx p50 $approx vs exact $exact drifts past 2%")
  }

  test("as-of join: every purchase maps to the latest view at-or-before it") {
    val out = graft.ops.EventQueries.q56AsofViewPurchase(spark, sf0001)
    val bad = out.filter(col("view_ts").isNotNull &&
      col("view_ts") > col("purchase_ts")).count()
    assert(bad == 0)
  }
}
