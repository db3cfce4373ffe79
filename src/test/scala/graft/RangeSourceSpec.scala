package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** S11: the DSv2 connector contract, asserted where it matters — at
  * the SOURCE, not the plan cosmetics. A pushdown that "shows in
  * explain" but still materializes every row is the classic silent
  * scale regression; these tests read the BatchScanExec's
  * numOutputRows metric, which counts rows the reader actually
  * EMITTED, so a broken pushFilters (rows filtered post-scan) fails
  * even though results stay correct. */
class RangeSourceSpec extends SparkSpec {

  private def load(n: Long, parts: Int = 4): DataFrame =
    spark.read.format("graft.sources.RangeSource")
      .option("n", n).option("partitions", parts).load()

  private def scanOutputRows(df: DataFrame): Long = {
    df.collect() // run the job so metrics populate
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b }
    assert(scans.nonEmpty, "no BatchScanExec in the plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("full scan emits n rows across the requested partitions") {
    val df = load(10000, parts = 8)
    assert(df.count() === 10000L)
    assert(df.rdd.getNumPartitions === 8)
    // deterministic payload round-trip
    val r = df.filter(col("id") === 7L).collect()(0)
    assert(r.getAs[Long]("val") ===
      graft.sources.RangeSource.valOf(7L))
    assert(r.getAs[String]("payload") === "row-7")
  }

  test("range predicates are absorbed AT THE SOURCE: the reader skips rows") {
    val df = load(100000).filter(col("id") >= 500L && col("id") < 1500L)
    assert(df.count() === 1000L)
    // the scan itself emitted only the narrowed range — 1,000 of the
    // 100,000 — proving the reader sought, not post-filtered
    assert(scanOutputRows(
      load(100000).filter(col("id") >= 500L && col("id") < 1500L)) === 1000L)
    // and the plan advertises what it absorbed
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_range[500, 1500)"),
      s"scan description missing the narrowed range:\n$plan")
  }

  test("point lookup narrows to a single row; equality survives") {
    val df = load(100000).filter(col("id") === 42L)
    val rows = df.collect()
    assert(rows.length === 1 && rows(0).getAs[Long]("id") === 42L)
    assert(scanOutputRows(load(100000).filter(col("id") === 42L)) === 1L)
  }

  test("unsupported predicates come back as residuals — correctness kept") {
    // val-predicates are NOT pushable; Spark must re-apply them above
    // the scan. The scan emits the id-narrowed range; the final result
    // honors BOTH predicates.
    val base = load(100000)
      .filter(col("id") < 1000L && col("val") % 2L === 0L)
    val expected = (0L until 1000L)
      .count(i => graft.sources.RangeSource.valOf(i) % 2 == 0).toLong
    assert(base.count() === expected)
    assert(scanOutputRows(load(100000)
      .filter(col("id") < 1000L && col("val") % 2L === 0L)) === 1000L,
      "scan must emit the id-narrowed range (val predicate is residual)")
  }

  test("column pruning reaches the reader: ReadSchema is the narrow struct") {
    val df = load(1000).select(sum(col("val")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("payload"),
      s"pruned scan still mentions payload:\n$plan")
    val expected = (0L until 1000L).map(graft.sources.RangeSource.valOf).sum
    assert(df.collect()(0).getLong(0) === expected)
  }

  test("a narrowed scan still parallelizes across slices") {
    val df = load(1000000, parts = 8).filter(col("id") >= 100000L &&
      col("id") < 500000L)
    assert(df.rdd.getNumPartitions === 8,
      "pushdown must not collapse the scan to one slice")
    assert(df.count() === 400000L)
  }

  test("empty range after contradiction pushdown yields zero rows, no error") {
    val df = load(1000).filter(col("id") > 5000L)
    assert(df.count() === 0L)
  }
}
