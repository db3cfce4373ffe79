package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Capstone: the reference category's whole lifecycle — ingest a dirty
  * CSV feed, quarantine rule violations, dedup keep-latest, enrich with
  * a dimension, aggregate, and land range-clustered parquet — composed
  * entirely from this engine's operators through the public facade. */
class EndToEndSpec extends SparkSpec {

  test("dirty CSV feed → quarantine → dedup → enrich → aggregate → clustered sink") {
    import spark.implicits._
    val base = Files.createTempDirectory("e2e").toString

    // 1. INGEST: a feed with a duplicate (stale) row and a rule violation
    val feed = Seq(
      "cust_id,nation_id,balance,updated_at",
      "1,0,100.0,2024-01-01",
      "1,0,250.0,2024-02-01",   // newer version of cust 1
      "2,1,-50.0,2024-01-15",   // violates nonneg rule
      "3,2,75.0,2024-01-20")
    val feedPath = s"$base/feed.csv"
    java.nio.file.Files.write(java.nio.file.Paths.get(feedPath),
      feed.mkString("\n").getBytes)
    val raw = spark.read.option("header", "true")
      .schema("cust_id LONG, nation_id INT, balance DOUBLE, updated_at DATE")
      .csv(feedPath)
    assert(raw.count() == 4)

    // 2. QUALITY: quarantine the negative balance
    val (clean, quarantined) = Graft.quarantine(raw,
      Seq("nonneg_balance" -> (col("balance") >= 0)))
    assert(quarantined.select("cust_id").head().getLong(0) == 2L)

    // 3. DEDUP: keep-latest per customer (deterministic survivor)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cust_id").orderBy(col("updated_at").desc)
    val current = clean.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    assert(current.count() == 2)
    assert(current.filter(col("cust_id") === 1).head()
      .getAs[Double]("balance") == 250.0)

    // 4. ENRICH: broadcast-join the nation dimension
    val nation = Graft.tables.nation(spark, sf0001)
    val enriched = current.join(broadcast(nation),
      col("nation_id") === col("n_nationkey"))
    assert(enriched.count() == 2)

    // 5. AGGREGATE + 6. LAND range-clustered parquet, read-back checked
    val report = enriched.groupBy("n_name")
      .agg(count(lit(1)).as("n_cust"), sum("balance").as("total_balance"))
    val outDir = s"$base/report"
    Graft.writeClustered(report, outDir, Seq("n_name"), 100L)
    val back = spark.read.parquet(outDir)
    assert(back.count() == 2)
    assert(back.agg(sum("total_balance")).head().getDouble(0) == 325.0)
  }
}
