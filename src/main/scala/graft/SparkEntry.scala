package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1PricingSummary(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> RelationalQueries.q1PricingSummary _,
    "q2_revenue_by_nation" -> JoinQueries.q2RevenueByNation _,
    "q3_no_urgent_customers" -> JoinQueries.q3NoUrgentCustomers _,
    "q4_big_spenders" -> JoinQueries.q4BigSpenders _,
    "q5_urgent_fill" -> JoinQueries.q5UrgentFill _,
    "q6_union_priorities" -> JoinQueries.q6UnionPriorities _,
    "q7_nation_except" -> JoinQueries.q7NationExcept _,
    "q8_nation_intersect" -> JoinQueries.q8NationIntersect _,
    "q9_ship_delay" -> JoinQueries.q9ShipDelay _,
    "q10_cross_matrix" -> JoinQueries.q10CrossMatrix _,
    "q11_rollup" -> AggQueries.q11Rollup _,
    "q12_distinct_parts" -> AggQueries.q12DistinctParts _,
    "q13_argminmax" -> AggQueries.q13ArgMinMax _,
    "q14_stats" -> AggQueries.q14Stats _,
    "q15_percentiles" -> AggQueries.q15Percentiles _,
    "q16_collect_segments" -> AggQueries.q16CollectSegments _,
    "q17_pivot_events" -> AggQueries.q17PivotEvents _,
    "q18_case_buckets" -> AggQueries.q18CaseBuckets _,
    "q19_null_handling" -> AggQueries.q19NullHandling _,
    "q20_union_distinct" -> AggQueries.q20UnionDistinct _,
    "q21_rank_orders" -> WindowQueries.q21RankOrders _,
    "q22_top3_per_customer" -> WindowQueries.q22Top3PerCustomer _,
    "q23_event_gaps" -> WindowQueries.q23EventGaps _,
    "q24_running_total" -> WindowQueries.q24RunningTotal _,
    "q25_moving_avg" -> WindowQueries.q25MovingAvg _,
    "q26_rolling_revenue" -> WindowQueries.q26RollingRevenue _,
    "q27_analytic" -> WindowQueries.q27Analytic _,
    "q28_keep_latest" -> WindowQueries.q28KeepLatest _,
    "q29_exact_dedup" -> WindowQueries.q29ExactDedup _,
  )
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> RelationalQueries.q1PricingSummarySql,
    "q2_revenue_by_nation" -> JoinQueries.q2RevenueByNationSql,
    "q3_no_urgent_customers" -> JoinQueries.q3NoUrgentCustomersSql,
    "q4_big_spenders" -> JoinQueries.q4BigSpendersSql,
    "q5_urgent_fill" -> JoinQueries.q5UrgentFillSql,
    "q6_union_priorities" -> JoinQueries.q6UnionPrioritiesSql,
    "q7_nation_except" -> JoinQueries.q7NationExceptSql,
    "q8_nation_intersect" -> JoinQueries.q8NationIntersectSql,
    "q9_ship_delay" -> JoinQueries.q9ShipDelaySql,
    "q10_cross_matrix" -> JoinQueries.q10CrossMatrixSql,
    "q11_rollup" -> AggQueries.q11RollupSql,
    "q12_distinct_parts" -> AggQueries.q12DistinctPartsSql,
    "q13_argminmax" -> AggQueries.q13ArgMinMaxSql,
    "q14_stats" -> AggQueries.q14StatsSql,
    "q15_percentiles" -> AggQueries.q15PercentilesSql,
    "q16_collect_segments" -> AggQueries.q16CollectSegmentsSql,
    "q17_pivot_events" -> AggQueries.q17PivotEventsSql,
    "q18_case_buckets" -> AggQueries.q18CaseBucketsSql,
    "q19_null_handling" -> AggQueries.q19NullHandlingSql,
    "q20_union_distinct" -> AggQueries.q20UnionDistinctSql,
    "q21_rank_orders" -> WindowQueries.q21RankOrdersSql,
    "q22_top3_per_customer" -> WindowQueries.q22Top3PerCustomerSql,
    "q23_event_gaps" -> WindowQueries.q23EventGapsSql,
    "q24_running_total" -> WindowQueries.q24RunningTotalSql,
    "q25_moving_avg" -> WindowQueries.q25MovingAvgSql,
    "q26_rolling_revenue" -> WindowQueries.q26RollingRevenueSql,
    "q27_analytic" -> WindowQueries.q27AnalyticSql,
    "q28_keep_latest" -> WindowQueries.q28KeepLatestSql,
    "q29_exact_dedup" -> WindowQueries.q29ExactDedupSql,
  )
}
