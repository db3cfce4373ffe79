package graft

import org.apache.spark.sql.functions._

/** Scalar functions with no DuckDB-1.0 oracle (SURVEY.md §2.7: initcap,
  * soundex absent there; months_between/approx sketches won't
  * hash-match) — covered here instead of in SparkEntry.queries.
  */
class ScalarFnsSpec extends SparkSpec {

  test("initcap, soundex, months_between, from_unixtime behave as specified") {
    import spark.implicits._
    val row = Seq(("hello spark world", "Robert", "2024-03-15", "2024-01-15"))
      .toDF("s", "nm", "d1", "d0")
      .select(
        initcap(col("s")).as("ic"),
        soundex(col("nm")).as("sx"),
        months_between(col("d1").cast("date"), col("d0").cast("date")).as("mb"),
        from_unixtime(lit(0L), "yyyy-MM-dd").as("epoch0"))
      .head()
    assert(row.getString(0) == "Hello Spark World")
    assert(row.getString(1) == "R163")
    assert(row.getDouble(2) == 2.0)
    assert(row.getString(3) == "1970-01-01")
  }

  test("approx_percentile lands within the accuracy contract of the exact percentile") {
    val o = Tables.orders(spark, sf0001)
    val r = o.agg(
      expr("percentile(o_totalprice, 0.5)").as("exact"),
      expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx")).head()
    val exact = r.getDouble(0)
    val approx = r.getDouble(1)
    assert(math.abs(approx - exact) / exact < 0.02,
      s"approx median $approx vs exact $exact")
  }

  test("sequence counts DOWN when start > stop (the q42 guard exists for a reason)") {
    import spark.implicits._
    val seq = Seq(1).toDF("x")
      .select(sequence(lit(1), lit(0)).as("s")).head().getSeq[Int](0)
    assert(seq == Seq(1, 0), "Spark sequence(1,0) descends; DuckDB generate_series(1,0) is empty")
  }
}
