package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S2/S3 ingest under dirty input — the reference category's bread and
  * butter (ETL cleaning): malformed rows must be quarantineable
  * (PERMISSIVE + _corrupt_record), droppable (DROPMALFORMED), and the
  * clean path unaffected.
  */
class IngestRobustnessSpec extends SparkSpec {

  private def write(lines: Seq[String], suffix: String): String = {
    val dir = Files.createTempDirectory("graft_ingest").toFile
    val f = new java.io.File(dir, s"data$suffix")
    val w = new java.io.PrintWriter(f)
    lines.foreach(w.println); w.close()
    f.getPath
  }

  private val csvSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("amount", DoubleType),
    StructField("_corrupt_record", StringType)))

  test("CSV: PERMISSIVE quarantines malformed rows, DROPMALFORMED drops them") {
    // the bad row is structurally malformed (extra token): that is what
    // both PERMISSIVE quarantines and DROPMALFORMED drops; a mere
    // conversion failure only nulls the field in DROPMALFORMED
    val path = write(Seq("id,amount", "1,10.5", "9,8.1,oops_extra", "3,7.25"), ".csv")
    val permissive = spark.read
      .option("header", "true").option("mode", "PERMISSIVE")
      .schema(csvSchema).csv(path)
      .cache()
    val bad = permissive.filter(col("_corrupt_record").isNotNull)
    val good = permissive.filter(col("_corrupt_record").isNull)
    assert(bad.count() == 1 && good.count() == 2)
    assert(bad.head().getAs[String]("_corrupt_record").contains("oops_extra"))
    assert(good.agg(sum("amount")).head().getDouble(0) == 17.75)

    val dropped = spark.read
      .option("header", "true").option("mode", "DROPMALFORMED")
      .schema(StructType(csvSchema.fields.dropRight(1))).csv(path)
    // count() alone would column-prune the scan, the parser would never
    // run, and no row would be dropped (count=3!) — a real Spark
    // footgun; materialize the parsed columns to observe the drop
    assert(dropped.select("id", "amount").collect().length == 2)
  }

  test("parquet mergeSchema unifies drifted file schemas on read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_drift").toString
    // feed A has (id, amount); the later feed B added a currency column
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount")
      .write.parquet(s"$dir/batch=a")
    Seq((3L, 30.0, "EUR")).toDF("id", "amount", "currency")
      .write.parquet(s"$dir/batch=b")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "amount", "currency", "batch"))
    val rows = merged.select("id", "currency").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty,
      "pre-drift files read the new column as null")
    assert(rows(3L).contains("EUR"))
  }

  test("JSON lines: broken line is quarantined, valid lines parse typed") {
    val path = write(Seq(
      """{"id": 1, "v": 2.5}""",
      """{"id": broken""",
      """{"id": 3, "v": 4.0}"""), ".json")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema).json(path).cache()
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("_corrupt_record").isNull)
      .agg(sum("v")).head().getDouble(0) == 6.5)
  }
}
