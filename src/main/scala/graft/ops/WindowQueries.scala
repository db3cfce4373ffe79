package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Parity._

/** Window operators W1–W7 + deterministic dedup L1–L2 (SURVEY.md §2.5,
  * §2.8). Every window ordering carries a unique tie-break key so ranks
  * and survivors are deterministic across engines (hazard #4).
  *
  * Scale note: window partitions are per-customer / per-user — thousands
  * of small partitions that shuffle-hash cleanly; no global single-
  * partition window anywhere except q26's day-level frame whose input is
  * pre-aggregated to ~2.5k rows.
  */
object WindowQueries {

  /** W1 ranking functions over per-customer order history. */
  def q21RankOrders(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.select(col("o_custkey"), col("o_orderkey"),
        dec4(dm(col("o_totalprice"))).as("price"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"))
      .orderBy("o_custkey", "rn")
  }

  val q21RankOrdersSql: String =
    s"""SELECT o_custkey, o_orderkey, ${out4(s"CAST(o_totalprice AS $DM)")} AS price,
       |  ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk,
       |  DENSE_RANK() OVER w AS drnk, NTILE(4) OVER w AS quartile
       |FROM orders
       |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
       |ORDER BY o_custkey, rn""".stripMargin

  /** W2 top-N per group: each customer's three priciest orders. */
  def q22Top3PerCustomer(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        dec4(dm(col("o_totalprice"))).as("price"))
      .orderBy("o_custkey", "rn")
  }

  val q22Top3PerCustomerSql: String =
    s"""SELECT o_custkey, rn, o_orderkey, price FROM (
       |  SELECT o_custkey, o_orderkey, ${out4(s"CAST(o_totalprice AS $DM)")} AS price,
       |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
       |  FROM orders)
       |WHERE rn <= 3
       |ORDER BY o_custkey, rn""".stripMargin

  /** W3 lag: mean gap between a user's consecutive events (µs-exact
    * integer math, then one rounded average). */
  def q23EventGaps(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    e.select(col("user_id"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
          .as("gap_us"))
      .filter(col("gap_us").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        rnd(avg(col("gap_us") / 1000000.0)).as("avg_gap_sec"),
        expr("max(gap_us) div 1000000").as("max_gap_sec_floor"))
      .orderBy("user_id")
  }

  val q23EventGapsSql: String =
    """SELECT user_id, COUNT(*) AS n_gaps,
      |  ROUND(AVG(gap_us / 1000000.0), 4) AS avg_gap_sec,
      |  MAX(gap_us) // 1000000 AS max_gap_sec_floor
      |FROM (SELECT user_id,
      |        epoch_us(ts) - LAG(epoch_us(ts), 1) OVER
      |          (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      |      FROM events)
      |WHERE gap_us IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** W4 running total: cumulative customer spend over time. */
  def q24RunningTotal(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.select(col("o_custkey"), col("o_orderkey"),
        dec4(sum(dm(col("o_totalprice"))).over(w)).as("cum_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q24RunningTotalSql: String =
    s"""SELECT o_custkey, o_orderkey,
       |  ${out4(s"SUM(CAST(o_totalprice AS $DM)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS cum_spend
       |FROM orders
       |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** W5 sliding frame: 3-event moving average of event value per user. */
  def q25MovingAvg(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    e.select(col("user_id"), col("event_id"),
        rnd(avg(col("value")).over(w)).as("mov_avg3"))
      .orderBy("user_id", "event_id")
  }

  val q25MovingAvgSql: String =
    """SELECT user_id, event_id,
      |  ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin

  /** W6 range frame: 7-day rolling revenue over a numeric day key
    * (hazard: RANGE over timestamps differs — order by epoch-day int).
    * The window is deliberately unpartitioned: it runs over the
    * already-aggregated per-day series (|distinct days| rows, bounded by
    * the calendar — a few thousand even at 100 TB), not the raw orders. */
  def q26RollingRevenue(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val daily = o
      .groupBy(datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
        .as("day_num"))
      .agg(sum(dm(col("o_totalprice"))).as("day_rev"))
    val w = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
    daily.select(col("day_num").cast("bigint").as("day_num"),
        dec4(sum(col("day_rev")).over(w)).as("rev_7d"))
      .orderBy("day_num")
  }

  val q26RollingRevenueSql: String =
    s"""SELECT CAST(day_num AS BIGINT) AS day_num,
       |  ${out4("SUM(day_rev) OVER (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)")} AS rev_7d
       |FROM (SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_num,
       |        SUM(CAST(o_totalprice AS $DM)) AS day_rev
       |      FROM orders GROUP BY 1)
       |ORDER BY day_num""".stripMargin

  /** W7 analytic functions with explicit frames. */
  def q27Analytic(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val wOrd = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    o.select(col("o_custkey"), col("o_orderkey"),
        dec4(dm(first_value(col("o_totalprice")).over(wFull))).as("first_price"),
        dec4(dm(last_value(col("o_totalprice")).over(wFull))).as("last_price"),
        dec4(dm(nth_value(col("o_totalprice"), 2).over(wFull))).as("second_price"),
        rnd(percent_rank().over(wOrd), 6).as("pct_rank"),
        rnd(cume_dist().over(wOrd), 6).as("cume"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q27AnalyticSql: String =
    s"""SELECT o_custkey, o_orderkey,
       |  ${out4(s"CAST(FIRST_VALUE(o_totalprice) OVER wf AS $DM)")} AS first_price,
       |  ${out4(s"CAST(LAST_VALUE(o_totalprice) OVER wf AS $DM)")} AS last_price,
       |  ${out4(s"CAST(NTH_VALUE(o_totalprice, 2) OVER wf AS $DM)")} AS second_price,
       |  ROUND(PERCENT_RANK() OVER wo, 6) AS pct_rank,
       |  ROUND(CUME_DIST() OVER wo, 6) AS cume
       |FROM orders
       |WINDOW wo AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** L2 keep-latest dedup: deterministic survivor per user (latest ts,
    * tie-break highest event_id). */
  def q28KeepLatest(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .orderBy("user_id")
  }

  val q28KeepLatestSql: String =
    """SELECT user_id, event_id, ts, event_type FROM (
      |  SELECT user_id, event_id, ts, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** L1 exact dedup (order-independent form): distinct (user, type)
    * pairs, re-aggregated so the result is deterministic. */
  def q29ExactDedup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.select("user_id", "event_type").distinct()
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("event_type")
  }

  val q29ExactDedupSql: String =
    """SELECT event_type, COUNT(*) AS n_users
      |FROM (SELECT DISTINCT user_id, event_type FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin
}
