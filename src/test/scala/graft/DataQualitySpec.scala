package graft

import graft.ops.DataQuality
import org.apache.spark.sql.functions._

/** Profile/validate/quarantine loop: the profile must report exact null
  * counts and sane sketch bounds in one pass; quarantine must split
  * rows exactly by the rule conjunction, tagging each failure. */
class DataQualitySpec extends SparkSpec {

  test("profile reports one row per column with exact nulls and min/max") {
    val c = Tables.customer(spark, sf0001)
    val p = DataQuality.profile(c).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == c.schema.fieldNames.toSet)
    val n = c.count()
    assert(p.values.forall(_.getLong(1) == n))
    assert(p("c_custkey").getLong(2) == 0, "custkey has no nulls in fixtures")
    val distinctEst = p("c_custkey").getLong(3).toDouble
    assert(math.abs(distinctEst - n) / n < 0.1, "HLL estimate should be near n")
    assert(p("c_custkey").getString(4) == "0", "min custkey renders as string")
  }

  test("quarantine splits by rule conjunction and names each violation") {
    import spark.implicits._
    val df = Seq(
      (1L, 10.0, "ok"),
      (2L, -5.0, "ok"),                        // fails nonneg
      (3L, 20.0, null.asInstanceOf[String]),   // fails tagged (null -> failure)
      (4L, -1.0, null.asInstanceOf[String]))   // fails both
      .toDF("id", "bal", "tag")
    val (good, bad) = DataQuality.quarantine(df, Seq(
      "nonneg_balance" -> (col("bal") >= 0),
      "tagged" -> col("tag").isNotNull))
    assert(good.select("id").collect().map(_.getLong(0)).toSet == Set(1L))
    val viol = bad.select(col("id"), col("_violations")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(viol == Map(
      2L -> Set("nonneg_balance"),
      3L -> Set("tagged"),
      4L -> Set("nonneg_balance", "tagged")))
    assert(!good.columns.contains("_violations"), "clean rows drop the tag column")
  }

  test("observed metrics ride the job's own pass — no second scan") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf0001)
    val (instrumented, obs) = graft.ops.DataQuality.observed(
      li.filter(col("l_quantity") > 0), "etl",
      Seq(
        "rows" -> count(lit(1)),
        "null_ship" -> count(when(col("l_shipdate").isNull, 1)),
        "sum_qty" -> sum(col("l_quantity"))))
    // downstream transformations continue from the instrumented frame;
    // ONE action drives both the result and the metrics
    val kept = instrumented.filter(col("l_discount") <= 0.1).count()
    val m = obs.get
    assert(m("rows").asInstanceOf[Long] == li.count(),
      s"observe must count the pre-filter pass: $m")
    assert(m("null_ship").asInstanceOf[Long] == 0L)
    assert(m("sum_qty").asInstanceOf[Double] > 0.0)
    assert(kept > 0 && kept <= m("rows").asInstanceOf[Long])
  }
}
