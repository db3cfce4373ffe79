package graft

import org.apache.spark.sql.functions._

/** Dynamic partition pruning: a fact table partitioned on the join key
  * must be pruned at RUNTIME by a filter that lives on the dimension
  * side — the star-schema scan killer at 100 TB, where the selective
  * predicate never mentions the partition column directly and static
  * pruning can't help. */
class DppSpec extends SparkSpec {
  import spark.implicits._

  test("filtered dimension prunes the partitioned fact scan at runtime") {
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString + "/o"
    Tables.orders(spark, sf0001).write.partitionBy("o_orderpriority")
      .parquet(dir)
    val fact = spark.read.parquet(dir)
    // dimension carrying the selective predicate: priority -> class.
    // Must be a SCANNED relation — a local Seq would constant-fold the
    // filter away and leave nothing dynamic to prune with.
    val dimDir = java.nio.file.Files.createTempDirectory("dpp").toString + "/d"
    Seq(
      ("1-URGENT", "hi"), ("2-HIGH", "hi"), ("3-MEDIUM", "mid"),
      ("4-NOT SPECIFIED", "low"), ("5-LOW", "low"))
      .toDF("o_orderpriority", "cls").write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    // the cost heuristic skips DPP on a fixture-sized fact — disable
    // the stats gate so the mechanism itself is exercised
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    val j = fact.join(dim.filter(col("cls") === "hi"), "o_orderpriority")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val rows = j.collect()
    val plan = j.queryExecution.executedPlan.toString
    spark.conf.unset(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats")
    assert(plan.contains("dynamicpruning"),
      s"the dim filter must reach the fact scan as a runtime partition filter:\n$plan")

    // row parity with the statically-filtered equivalent
    val expected = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).sorted.toSeq ==
      expected.map(r => (r.getString(0), r.getLong(1))).sorted.toSeq)
  }
}
