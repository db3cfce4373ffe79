package graft.ops

import graft.functions.HeavyHittersAgg
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
  * Mechanics — TWO-PATH salting, so only skew pays the salting tax:
  *
  *  1. A Misra–Gries heavy-hitters pass over the LEFT join key finds
  *     keys whose frequency share exceeds `hotShare` (bounded
  *     partitions×capacity sketch state, never a full key histogram;
  *     the MG guarantee — every key with true share > 1/(capacity+1)
  *     survives — plus a slack term makes the hot set a superset of
  *     the truly-hot keys, and over-selection only costs replication
  *     of THAT key's right rows, never correctness).
  *  2. Hot-key left rows get a deterministic salt in [0, buckets)
  *     hashed from the whole row (no RNG — reproducible); hot-key
  *     right rows are replicated once per salt value; the hot join key
  *     becomes (key, salt), spreading each hot key over `buckets`
  *     reducers.
  *  3. Every other row takes the PLAIN equi-join — no replication.
  *  4. Union. Row-level results are identical to the unsalted join
  *     (SkewJoinSpec pins both parity and the ≈|right| + |hot|·buckets
  *     replication bound).
  *
  * At 100 TB this is the difference that matters: the old blanket
  * rewrite replicated the ENTIRE right side ×buckets (a scale-killer
  * for any right side above the broadcast threshold); here the
  * replication bill is `buckets × (right rows matching hot keys)` —
  * typically a handful of keys — while the cold 99.9% of both sides
  * moves exactly once. With no hot key at all (sketch finds nothing)
  * the call degenerates to the plain join, byte for byte.
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `key`, salting ONLY keys
    * whose left-side frequency share is ≥ `hotShare` into `buckets`
    * sub-keys. Output columns = left columns then right columns minus
    * its join key, like a plain `join(right, key)`. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int, hotShare: Double = 1.0 / 64): DataFrame =
    saltedInnerJoinWithHotKeys(left, right, key, buckets,
      hotKeys(left, key, hotShare))

  /** [[saltedInnerJoin]] with a caller-supplied hot-key set (as
    * strings), skipping the detection scan. The production form when
    * the hot keys are already known — from a previous run's sketch, a
    * maintained key-frequency table, or domain knowledge — so the
    * detect pass's extra read of `left` is paid once, not per join.
    * Passing a cold or absent key is harmless (it is salted without
    * need / matches nothing); MISSING a genuinely hot key silently
    * routes it down the plain path, so prefer the detecting overload
    * unless the supplied set's provenance is trusted. */
  def saltedInnerJoinWithHotKeys(left: DataFrame, right: DataFrame,
      key: String, buckets: Int, hot: Seq[String]): DataFrame = {
    require(buckets > 1, "salting needs at least 2 buckets")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "inputs already have a __salt column; rename it before salting")
    if (hot.isEmpty) return left.join(right, Seq(key), "inner")
    val isHotL = col(key).cast("string").isInCollection(hot)
    val isHotR = right(key).cast("string").isInCollection(hot)
    val saltedLeft = left.filter(isHotL).withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)), lit(buckets))
        .cast("int"))
    val saltedRight = right.filter(isHotR).withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    val hotJoined = saltedLeft.join(saltedRight, Seq(key, "__salt"), "inner")
      .drop("__salt")
    val coldJoined = left.filter(!isHotL).join(right.filter(!isHotR),
      Seq(key), "inner")
    coldJoined.unionByName(hotJoined)
  }

  /** Left-side keys (as strings) whose frequency share is ≥ `hotShare`,
    * detected with one Misra–Gries pass. The sketch's stored counts are
    * lower bounds undercounting by at most n/(capacity+1), so the
    * filter adds that slack back: no truly-hot key is missed, and any
    * false positive is merely salted without need. Driver state is
    * ≤ capacity entries — never a full key histogram. */
  private[graft] def hotKeys(left: DataFrame, key: String,
      hotShare: Double): Seq[String] = {
    require(hotShare > 0 && hotShare <= 1,
      s"hotShare must be in (0, 1], got $hotShare")
    val capacity = math.max(64, math.ceil(4.0 / hotShare).toInt)
    val mg = udaf(new HeavyHittersAgg(capacity))
    val row = left.select(col(key).cast("string").as("__k"))
      .agg(mg(col("__k")).as("sketch"), count(lit(1)).as("n"))
      .collect()(0)
    val n = row.getLong(1)
    if (n == 0) return Seq.empty
    val slack = n.toDouble / (capacity + 1)
    row.getMap[String, Long](0).iterator
      .collect { case (k, c) if c + slack >= hotShare * n => k }
      .toSeq.sorted
  }
}
