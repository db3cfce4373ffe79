package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, LongType}

/** Exact global running totals without the single-reducer sort — the
  * [[RangedNtile]] two-phase machinery generalized from ranks to SUMs:
  * `SUM(x) OVER (ORDER BY … ROWS UNBOUNDED PRECEDING)` single-partitions
  * the table (the q98 trap), while the equivalent parallel plan is
  * (1) `repartitionByRange` on the order key; (2) per-partition local
  * cumulative sums; (3) add each preceding partition's total — one
  * (pid, totals) row per shuffle partition on the driver,
  * partition-count-sized model state, never row data.
  *
  * The range-partitioned frame is `localCheckpoint`ed for the same
  * reason as RangedNtile: the per-partition totals branch and the local
  * cumsum branch must observe identical AQE partition ids. Ties: pass a
  * total order, or rows with equal keys land in an arbitrary (but
  * consistent) partition — their cumulative values within the tie run
  * depend on that placement, exactly like SQL's under-specified ORDER
  * BY. Downstream uses that only read the value at the END of each tie
  * run (CDFs over distinct keys, threshold crossings) are placement-
  * independent.
  *
  * This is the building block for exact distributed CDFs (q147's KS
  * statistic), running balances and cumulative mixes at fact scale.
  */
object PrefixSum {

  /** Returns `df` plus, for each (column, alias) in `sums`, a column
    * `alias` holding the exact cumulative sum of that column over the
    * global `order`, computed with no single-partition stage.
    *
    * Sum columns may be any integral, floating or decimal type; the
    * per-partition offsets are accumulated in the matching driver type
    * (Long / Double / BigDecimal). Integral and decimal results are
    * exact; for floating sums the driver-side partial-total addition
    * reassociates IEEE ops exactly as a distributed `SUM` window
    * would, so the result matches Spark's own partial-agg semantics,
    * not a sequential left fold. */
  def withPrefixSums(df: DataFrame, order: Seq[Column],
      sums: Seq[(Column, String)]): DataFrame = {
    require(sums.nonEmpty, "need at least one column to sum")
    val part = df.repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val aggs = sums.zipWithIndex.map { case ((c, _), i) =>
      sum(c).as(s"__t$i")
    }
    val agged = part.groupBy("__pid").agg(aggs.head, aggs.tail: _*)
    val sumTypes = agged.schema.fields.drop(1).map(_.dataType)
    val totals = agged.collect().sortBy(_.getInt(0))
    val w = Window.partitionBy("__pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // exclusive running offsets per partition, accumulated in the sum
    // column's own result type so nothing truncates or reclassifies
    sums.zipWithIndex.foldLeft(part) { case (d, ((c, alias), i)) =>
      val offCol = sumTypes(i) match {
        case LongType =>
          var acc = 0L
          val m = totals.map { r =>
            val o0 = acc
            if (!r.isNullAt(i + 1)) acc += r.getAs[Number](i + 1).longValue()
            r.getInt(0) -> o0
          }.toMap
          element_at(typedlit(m), col("__pid"))
        case DoubleType | FloatType =>
          var acc = 0.0
          val m = totals.map { r =>
            val o0 = acc
            if (!r.isNullAt(i + 1)) acc += r.getAs[Number](i + 1).doubleValue()
            r.getInt(0) -> o0
          }.toMap
          element_at(typedlit(m), col("__pid"))
        case _: DecimalType =>
          var acc = BigDecimal(0)
          val m = totals.map { r =>
            val o0 = acc
            if (!r.isNullAt(i + 1)) acc += BigDecimal(r.getDecimal(i + 1))
            r.getInt(0) -> o0
          }.toMap
          element_at(typedlit(m), col("__pid"))
        case other => throw new IllegalArgumentException(
          s"withPrefixSums: unsupported sum result type $other for column $alias")
      }
      d.withColumn(alias, sum(c).over(w) + offCol)
    }.drop("__pid")
  }
}
