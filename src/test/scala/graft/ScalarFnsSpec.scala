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

  test("haversine_km kernel matches independent published references") {
    import graft.functions.MathKernels.haversineKm
    // Paris (48.8566, 2.3522) — London (51.5074, -0.1278): the widely
    // published great-circle figure is ~343.5 km; our R = 6371.0088
    // chain gives 343.5565. (The q161 Jaro–Winkler precedent: pin the
    // kernel against references the kernel's own code can't have
    // produced.)
    assert(math.abs(haversineKm(48.8566, 2.3522, 51.5074, -0.1278)
      - 343.5565) < 5e-4)
    // one degree of longitude on the equator: the published
    // 111.195 km/degree mean-radius figure
    assert(math.abs(haversineKm(0.0, 0.0, 0.0, 1.0) - 111.19508) < 5e-5)
    // antipodal points: exactly half the great circle, pi * R — and the
    // asin clamp keeps sqrt(a) rounding above 1.0 from producing NaN
    // tolerance is loose (1 m) ONLY because asin is steep near 1: a
    // 1-ulp libm difference in sin/cos moves the clamped argument by
    // ~1e-16, which asin amplifies to ~1e-4 km this close to the pole
    val halfCircle = math.Pi * 6371.0088
    assert(math.abs(haversineKm(0.0, 0.0, 0.0, 180.0) - halfCircle) < 1e-3)
    assert(math.abs(haversineKm(90.0, 0.0, -90.0, 77.7) - halfCircle) < 1e-3)
    // identity and symmetry
    assert(haversineKm(12.34, 56.78, 12.34, 56.78) == 0.0)
    val ab = haversineKm(48.8566, 2.3522, 51.5074, -0.1278)
    val ba = haversineKm(51.5074, -0.1278, 48.8566, 2.3522)
    assert(ab == ba, "haversine must be exactly symmetric")
  }

  test("sequence counts DOWN when start > stop (the q42 guard exists for a reason)") {
    import spark.implicits._
    val seq = Seq(1).toDF("x")
      .select(sequence(lit(1), lit(0)).as("s")).head().getSeq[Int](0)
    assert(seq == Seq(1, 0), "Spark sequence(1,0) descends; DuckDB generate_series(1,0) is empty")
  }
}
