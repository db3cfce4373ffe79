package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Parity._

/** Slice 0 + relational core (SURVEY.md §2.2–§2.4, §2.6, §7 slices 0–1). */
object RelationalQueries {

  /** Flagship: TPC-H-Q1-shaped pricing summary over lineitem.
    * Scan → filter (pushed to parquet) → decimal-cast → hash agg → sort. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val discPrice = dm(col("l_extendedprice")) * (one - df(col("l_discount")))
    val charge = discPrice * (one + df(col("l_tax")))
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dec4(sum(dm(col("l_quantity")))).as("sum_qty"),
        dec4(sum(dm(col("l_extendedprice")))).as("sum_base_price"),
        dec4(sum(discPrice)).as("sum_disc_price"),
        dec4(sum(charge)).as("sum_charge"),
        dec4(avg(dm(col("l_quantity")))).as("avg_qty"),
        dec4(avg(dm(col("l_extendedprice")))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1PricingSummarySql: String = {
    val discPrice = s"CAST(l_extendedprice AS $DM) * (CAST(1 AS $DF) - CAST(l_discount AS $DF))"
    val charge = s"$discPrice * (CAST(1 AS $DF) + CAST(l_tax AS $DF))"
    s"""SELECT l_returnflag, l_linestatus,
       |  ${out4(s"SUM(CAST(l_quantity AS $DM))")} AS sum_qty,
       |  ${out4(s"SUM(CAST(l_extendedprice AS $DM))")} AS sum_base_price,
       |  ${out4(s"SUM($discPrice)")} AS sum_disc_price,
       |  ${out4(s"SUM($charge)")} AS sum_charge,
       |  ${out4(s"AVG(CAST(l_quantity AS $DM))")} AS avg_qty,
       |  ${out4(s"AVG(CAST(l_extendedprice AS $DM))")} AS avg_price,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
  }

  /** Correlated scalar subqueries through the SQL surface — "orders
    * more than 1.5× their customer's average order value". The point is
    * the PLANNER path: this is the one query issued via `spark.sql`
    * with correlated subqueries, which Catalyst must decorrelate into
    * aggregate + join (RewriteCorrelatedScalarSubquery) — at 100 TB the
    * difference between a per-row re-scan and two hash joins. The same
    * text runs verbatim in DuckDB, whose unnesting is the
    * Neumann-Kemper algorithm — one SQL string, two optimizers, forced
    * agreement.
    *
    * Parity: the comparison is cleared of float averages entirely —
    * `2·price_cents·count > 3·sum_cents` in int64 (1.5 = 3/2), the q117
    * cents discipline, so the boundary set is engine-exact. DuckDB's
    * SUM widens to HUGEINT inside the predicate only (never projected),
    * which compares exactly. */
  def q126AboveAvg(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(q126AboveAvgSql)
  }

  val q126AboveAvgSql: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS pc
      |  FROM orders)
      |SELECT o_custkey, o_orderkey, o_totalprice
      |FROM o
      |WHERE 2 * pc * (SELECT COUNT(*) FROM o i
      |                WHERE i.o_custkey = o.o_custkey)
      |    > 3 * (SELECT SUM(pc) FROM o i
      |           WHERE i.o_custkey = o.o_custkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin
}
