package graft

import org.apache.spark.sql.functions._

/** A5 at scale, the mergeable form: Spark 4's Apache DataSketches HLL
  * builtins (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`).
  * The operational pattern pinned here is SKETCH ROLLUP — build binary
  * sketches once per fine group, then re-aggregate coarser levels by
  * unioning sketches instead of re-scanning rows: exactly how a 100 TB
  * pipeline serves distinct-counts at several granularities from one
  * pass. No DuckDB oracle (different sketch → different estimates), so
  * the bounds are asserted against exact counts per SURVEY §2.4 A5.
  */
class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf0001)

  test("per-language sketches union to the global distinct count") {
    val perLang = docs.groupBy("lang")
      .agg(hll_sketch_agg(col("doc_id"), lit(12)).as("sk"),
        countDistinct(col("doc_id")).as("exact"))
    val rolled = perLang
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .as[Long].collect()(0)
    val exactTotal = docs.select(countDistinct(col("doc_id"))).as[Long].collect()(0)
    // lgConfigK=12 → rse ~1.6%/√... keep a generous 5% envelope
    assert(math.abs(rolled - exactTotal) <= math.max(1L, exactTotal / 20),
      s"rolled-up estimate $rolled vs exact $exactTotal")
  }

  test("per-group estimates track exact distinct counts") {
    val rows = docs.groupBy("lang")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("doc_id"), lit(12))).as("est"),
        countDistinct(col("doc_id")).as("exact"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, est, exact) =>
      assert(math.abs(est - exact) <= math.max(1L, exact / 20),
        s"$lang: est $est vs exact $exact")
    }
  }

  test("sketch of a union tracks union of sketches (mergeability)") {
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val together = docs
      .agg(hll_sketch_estimate(hll_sketch_agg(col("doc_id"), lit(12))))
      .as[Long].collect()(0)
    val merged = a.agg(hll_sketch_agg(col("doc_id"), lit(12)).as("sk"))
      .unionAll(b.agg(hll_sketch_agg(col("doc_id"), lit(12)).as("sk")))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .as[Long].collect()(0)
    // not bit-identical: the union path may promote sparse→dense (HLL_8)
    // representations differently than the single-pass sketch — estimates
    // must still land inside the joint error envelope
    assert(math.abs(together - merged) <= math.max(1L, together / 20),
      s"one-pass $together vs merged $merged")
  }
}
