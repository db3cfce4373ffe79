package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality operators — the profile/validate/quarantine loop every
  * integration pipeline runs before letting a feed near the warehouse
  * (or a training set near a model).
  *
  * Scale shape: `profile` is ONE full-scan aggregation producing a
  * column-count-sized result (distinct counts are HLL sketches, so no
  * per-column shuffle of raw values); `quarantine` evaluates every rule
  * in a single projection per branch — rules are Columns, so they stay
  * inside whole-stage codegen and Catalyst prunes unreferenced columns.
  */
object DataQuality {

  /** One-pass column profile: rows of (column, n, n_null, approx_distinct,
    * min_str, max_str). min/max are rendered as strings so one long-form
    * schema fits every column type; nulls for unordered types. */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.schema.fields
    val aggs = cols.flatMap { f =>
      // backticks: a column literally named "a.b" must not resolve as
      // a nested field reference
      val c = col(s"`${f.name}`")
      val orderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(f.dataType)
      Seq(
        count(lit(1)).as(s"${f.name}__n"),
        count(when(c.isNull, 1)).as(s"${f.name}__nulls"),
        approx_count_distinct(c).as(s"${f.name}__distinct"),
        (if (orderable) min(c).cast("string") else lit(null).cast("string"))
          .as(s"${f.name}__min"),
        (if (orderable) max(c).cast("string") else lit(null).cast("string"))
          .as(s"${f.name}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { f =>
      struct(
        lit(f.name).as("column"),
        col(s"`${f.name}__n`").as("n"),
        col(s"`${f.name}__nulls`").as("n_null"),
        col(s"`${f.name}__distinct`").as("approx_distinct"),
        col(s"`${f.name}__min`").as("min_str"),
        col(s"`${f.name}__max`").as("max_str"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** Split `df` by the conjunction of named rules: rows passing every
    * rule, and quarantined rows carrying the names of each rule they
    * failed (`_violations` array column). A null rule result counts as
    * a failure — unknown is not clean. Both returned frames re-evaluate
    * the rules (cache upstream if the input is expensive). */
  def quarantine(df: DataFrame,
      rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "need at least one rule")
    val violations = array_compact(array(rules.map { case (name, rule) =>
      when(!coalesce(rule, lit(false)), lit(name))
    }: _*))
    val tagged = df.withColumn("_violations", violations)
    (tagged.filter(size(col("_violations")) === 0).drop("_violations"),
      tagged.filter(size(col("_violations")) > 0))
  }

  /** Piggy-back ETL metrics on a job's OWN pass — `Dataset.observe`:
    * the named aggregates evaluate inside the existing plan, so row
    * counts / null counts / sums for monitoring cost ZERO extra scans
    * (at 100 TB a separate `df.count()` for a dashboard is a second
    * full read). Returns the instrumented frame plus the Observation
    * handle; `get` blocks until an ACTION has run the frame and yields
    * the metric map. Works under whole-stage codegen — the collector
    * is an `AggregatingAccumulator`, not a plan change. */
  def observed(df: DataFrame, name: String,
      metrics: Seq[(String, Column)]): (DataFrame, org.apache.spark.sql.Observation) = {
    require(metrics.nonEmpty, "need at least one metric")
    val obs = org.apache.spark.sql.Observation(name)
    val named = metrics.map { case (n, c) => c.as(n) }
    (df.observe(obs, named.head, named.tail: _*), obs)
  }
}
