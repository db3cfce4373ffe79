package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    * global `order`, computed with no single-partition stage. */
  def withPrefixSums(df: DataFrame, order: Seq[Column],
      sums: Seq[(Column, String)]): DataFrame = {
    require(sums.nonEmpty, "need at least one column to sum")
    val part = df.repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val aggs = sums.zipWithIndex.map { case ((c, _), i) =>
      sum(c).as(s"__t$i")
    }
    val totals = part.groupBy("__pid")
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => r.getInt(0) ->
        sums.indices.map(i => if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1)))
      .sortBy(_._1)
    // exclusive running offsets per partition, one entry per sum column
    val offMaps: Seq[Map[Int, Long]] = sums.indices.map { i =>
      var acc = 0L
      totals.map { case (pid, ts) =>
        val o0 = acc; acc += ts(i); pid -> o0
      }.toMap
    }
    val w = Window.partitionBy("__pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sums.zipWithIndex.foldLeft(part) { case (d, ((c, alias), i)) =>
      d.withColumn(alias,
        sum(c).over(w) + element_at(typedlit(offMaps(i)), col("__pid")))
    }.drop("__pid")
  }
}
