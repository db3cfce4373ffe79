package graft

import graft.ops.SeriesOps
import org.apache.spark.sql.functions._

/** SeriesOps (ffill/bfill/interpolate) against hand-computed fixtures
  * and against the oracle-gated query forms (q95/q96) they generalize. */
class SeriesOpsSpec extends SparkSpec {

  private def series = {
    import spark.implicits._
    Seq(
      ("a", 1, Some(10.0)), ("a", 2, None), ("a", 3, None),
      ("a", 4, Some(40.0)), ("a", 5, None),
      ("b", 1, None), ("b", 2, Some(5.0)), ("b", 3, None)
    ).toDF("k", "t", "v")
  }

  private def vals(df: org.apache.spark.sql.DataFrame): Map[(String, Int), Option[Double]] =
    df.collect().map(r => (r.getString(0), r.getInt(1)) ->
      (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap

  test("ffill carries the last observation forward; leading nulls stay null") {
    val got = vals(SeriesOps.ffill(series, Seq("k"), "t", Seq("v")))
    assert(got(("a", 2)) == Some(10.0) && got(("a", 3)) == Some(10.0))
    assert(got(("a", 5)) == Some(40.0), "trailing gap takes the last observation")
    assert(got(("b", 1)) == None, "leading null must not be backfilled")
    assert(got(("b", 3)) == Some(5.0))
  }

  test("bfill mirrors ffill; trailing nulls stay null") {
    val got = vals(SeriesOps.bfill(series, Seq("k"), "t", Seq("v")))
    assert(got(("a", 2)) == Some(40.0) && got(("a", 3)) == Some(40.0))
    assert(got(("a", 5)) == None, "trailing null must not be forward-filled")
    assert(got(("b", 1)) == Some(5.0))
  }

  test("interpolate lerps interior gaps by position; outside gaps stay null") {
    val got = vals(SeriesOps.interpolate(series, Seq("k"), "t", "v", "t"))
    assert(got(("a", 2)) == Some(20.0) && got(("a", 3)) == Some(30.0),
      s"10→40 over t=1..4 must lerp to 20, 30; got $got")
    assert(got(("a", 5)) == None && got(("b", 1)) == None && got(("b", 3)) == None,
      "gaps outside the observation span must stay null")
  }

  test("interpolate with a date position reproduces q96 exactly") {
    import graft.ops.Parity._
    val o = Tables.orders(spark, sf0001)
    val span = o.agg(min(to_date(col("o_orderdate"))).as("d0"),
      max(to_date(col("o_orderdate"))).as("d1"))
    val spine = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val daily = o.groupBy(to_date(col("o_orderdate")).as("day"),
        col("o_orderpriority"))
      .agg(sum(dm(col("o_totalprice"))).cast("double").as("rev"))
    val sparse = spine.crossJoin(o.select("o_orderpriority").distinct())
      .join(daily, Seq("day", "o_orderpriority"), "left")
    // Contract decision (r12 fuzz fallout): SeriesOps.interpolate
    // returns the RAW lerp — output quantization is the caller's
    // concern. q96 floor-quantizes (floor(x*1e4+0.5)/1e4) for
    // cross-engine parity (Spark's round(,4) HALF_UPs the shortest
    // decimal repr while DuckDB rounds the binary value), so this
    // parity check applies the same grid to the operator's output.
    val viaOp = SeriesOps.interpolate(sparse, Seq("o_orderpriority"), "day",
        "rev", "day")
      .select(col("day"), col("o_orderpriority"),
        (floor(col("rev") * 1e4 + 0.5) / 1e4).as("rev_interp"))
    val viaQuery = SparkEntry.queries("q96_interpolate")(spark, sf0001)
    assert(viaOp.exceptAll(viaQuery).isEmpty && viaQuery.exceptAll(viaOp).isEmpty,
      "library operator and oracle query diverged")
  }
}
