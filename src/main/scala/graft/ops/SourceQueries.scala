package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Parity._

/** Source/sink coverage S2–S6 (SURVEY.md §2.1): CSV and JSON-lines
  * round-trips and a partitioned parquet sink. Each query materializes a
  * fixture table through the format under test into a scratch dir, reads
  * it back with an explicit schema, and aggregates — the oracle runs the
  * same aggregate over the original parquet, so any loss in the format
  * round-trip breaks parity. */
object SourceQueries {

  private def scratch(sfDir: String, tag: String): String = {
    val key = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft_rt/$key/$tag"
  }

  /** S2+S5: CSV sink → CSV source (header + explicit schema). */
  def q37CsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = scratch(dir, "nation_csv")
    Tables.nation(s, dir).write.mode("overwrite")
      .option("header", "true").csv(out)
    val back = s.read.option("header", "true")
      .schema(Tables.nationSchema).csv(out)
    // names joined to a string: the driver's pandas hasher cannot
    // sort/hash array cells (sorted string list join is lossless)
    back.groupBy("n_regionkey")
      .agg(count(lit(1)).as("n_nations"),
        array_join(sort_array(collect_list(col("n_name"))), ",").as("names"))
      .orderBy("n_regionkey")
  }

  val q37CsvRoundtripSql: String =
    """SELECT n_regionkey, COUNT(*) AS n_nations,
      |  array_to_string(list_sort(list(n_name)), ',') AS names
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** S3: JSON-lines sink → source; doubles must round-trip losslessly. */
  def q38JsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = scratch(dir, "customer_json")
    Tables.customer(s, dir).write.mode("overwrite").json(out)
    val back = s.read.schema(Tables.customerSchema).json(out)
    back.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_cust"),
        dec4(sum(dm(col("c_acctbal")))).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  val q38JsonRoundtripSql: String =
    s"""SELECT c_mktsegment, COUNT(*) AS n_cust,
       |  ${out4(s"SUM(CAST(c_acctbal AS $DM))")} AS total_bal
       |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** ORC sink → ORC source (columnar alternative to parquet, built into
    * Spark SQL): schema-preserving roundtrip checked by aggregating the
    * read-back table against the oracle over the ORIGINAL parquet. */
  def q80OrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = scratch(dir, "supplier_orc")
    Tables.supplier(s, dir).write.mode("overwrite").orc(out)
    val back = s.read.schema(Tables.supplierSchema).orc(out)
    back.groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_supp"),
        dec4(sum(dm(col("s_acctbal")))).as("total_bal"))
      .orderBy("s_nationkey")
  }

  val q80OrcRoundtripSql: String =
    s"""SELECT s_nationkey, COUNT(*) AS n_supp,
       |  ${out4(s"SUM(CAST(s_acctbal AS $DM))")} AS total_bal
       |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  /** XML sink → XML source (Spark 4 built-in XML datasource): the
    * row-tag document roundtrip — enterprise feeds still speak XML; a
    * type or value lost in serialization breaks oracle parity. */
  def q81XmlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = scratch(dir, "region_xml")
    Tables.region(s, dir).write.mode("overwrite")
      .option("rootTag", "regions").option("rowTag", "region").xml(out)
    val back = s.read.schema(Tables.regionSchema)
      .option("rowTag", "region").xml(out)
    back.select(col("r_regionkey"), col("r_name")).orderBy("r_regionkey")
  }

  val q81XmlRoundtripSql: String =
    """SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey""".stripMargin

  /** S6: partitioned parquet sink (lang=... directories) → read back.
    * At 100 TB this is the layout that makes partition pruning work. */
  def q39PartitionedSink(s: SparkSession, dir: String): DataFrame = {
    val out = scratch(dir, "documents_part")
    Tables.documents(s, dir).write.mode("overwrite")
      .partitionBy("lang").parquet(out)
    val back = s.read.parquet(out)
    back.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("lang")
  }

  // CAST AS BIGINT: DuckDB widens integer SUM to HUGEINT → pandas
  // float64, vs Spark's int64 — hash-mismatch on type alone
  val q39PartitionedSinkSql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
}
