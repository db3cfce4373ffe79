package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join (SURVEY.md §4 / the 100 TB mandate's
  * "salting for skew").
  *
  * Spark's first line of defense is AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default), which
  * re-plans oversized sort-merge partitions at runtime. Salting is the
  * complementary static rewrite for the cases AQE can't fix: a single
  * hot key whose rows must all meet the same right-side rows (AQE can
  * split the left partition but each split still joins the whole right
  * partition of that key — fine — whereas for aggregations-after-join or
  * broadcast-ineligible dimension explosions the hot reducer remains).
  *
  * Mechanics: every left row gets a deterministic salt in [0, buckets)
  * hashed from the whole row (no RNG — results stay reproducible), the
  * right side is replicated once per salt value, and the join key
  * becomes (key, salt). One hot key then spreads over `buckets` reducers
  * at the cost of a buckets× blow-up of the right side — use for joins
  * whose right side is small-ish but above the broadcast threshold.
  * Row-level results are identical to the unsalted join (SkewJoinSpec).
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `key`, salted into
    * `buckets` sub-keys. Output columns = left columns then right
    * columns minus its join key, like a plain `join(right, key)`. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets > 1, "salting needs at least 2 buckets")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "inputs already have a __salt column; rename it before salting")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)), lit(buckets))
        .cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }
}
