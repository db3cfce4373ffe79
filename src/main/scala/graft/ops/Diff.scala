package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — "what changed between yesterday's table and
  * today's": rows added, removed, or changed (with the changed columns
  * named). The audit primitive behind CDC validation, reconciliation,
  * and regression-checking a pipeline's output against its last run.
  *
  * One full-outer join on the key, null-safe column compares in the
  * same projection — a single co-partitioned shuffle per side at any
  * scale (zero when both snapshots are bucketed on the key).
  */
object Diff {

  /** Diff `newDf` against `oldDf` on `keys`, comparing `compareCols`.
    * Returns key columns + `change` ('added' | 'removed' | 'changed')
    * + `changed_cols` (comma-joined names, empty for added/removed);
    * unchanged rows are dropped. NULL keys follow join semantics: a
    * null key identifies nothing, so a null-keyed row in each version
    * surfaces as an independent removed/added pair rather than
    * matching. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val o = oldDf.select((keys ++ compareCols).map(col): _*)
      .toDF((keys ++ compareCols).map("_old_" + _): _*)
      .withColumn("_old_present", lit(true))
    val n = newDf.select((keys ++ compareCols).map(col): _*)
      .toDF((keys ++ compareCols).map("_new_" + _): _*)
      .withColumn("_new_present", lit(true))
    val joinCond = keys.map(k => col(s"_old_$k") === col(s"_new_$k"))
      .reduce(_ && _)
    // literal markers, not key nullness: a row whose own key value is
    // NULL must still register as present on its side
    val inOld = col("_old_present").isNotNull
    val inNew = col("_new_present").isNotNull
    val diffs: Column = array_compact(array(compareCols.map { c =>
      when(!(col(s"_old_$c") <=> col(s"_new_$c")), lit(c))
    }: _*))
    o.join(n, joinCond, "full_outer")
      .withColumn("change",
        when(!inOld, "added").when(!inNew, "removed")
          .when(size(diffs) > 0, "changed"))
      .filter(col("change").isNotNull)
      .withColumn("changed_cols",
        when(col("change") === "changed", array_join(diffs, ","))
          .otherwise(lit("")))
      .select(keys.map(k =>
        coalesce(col(s"_new_$k"), col(s"_old_$k")).as(k)) ++
        Seq(col("change"), col("changed_cols")): _*)
  }
}
