package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch machinery ([PK]
  * Bar-Yossef et al. 2002; Beyer et al. 2007) — the ONE sketch family
  * whose whole construction both engines reproduce bit-for-bit,
  * because its hash is standardized md5 rather than an engine-private
  * kernel. Lifted out of q326/q331/q332 (r14 verdict mandate #4) so
  * the 48-bit hex fold has a single source of truth on BOTH sides:
  * [[hashCol]] is the Spark column builder, [[hashSql]] the identical
  * DuckDB text macro the oracle mirrors interpolate.
  *
  * Three layers:
  *  - column/SQL hash builders (exact int64 in both engines);
  *  - DataFrame-level sketch ([[sketchFrame]]: distinct-hash census +
  *    TakeOrdered k — per-partition top-k then a k-row merge, the
  *    map-side-combinable shape that replaces a full distinct shuffle
  *    at 100 TB) and the unbiased estimate column ([[estimateCol]]);
  *  - a typed mergeable [[KmvAgg]] Aggregator (the TDigestAgg
  *    partial/final shape) for rolling sketches up across shards,
  *    days, or cube cells as a first-class column, plus the set
  *    algebra KMV exists for: [[mergeSketches]] (union) and
  *    [[overlap]] (Jaccard + intersection estimate — Beyer et al.'s
  *    ρ̂·D̂(A∪B)).
  *
  * KmvSpec pins the error envelope, shard-merge equivalence (the
  * CountMinSpec pattern), the small-set exact regime, and agreement
  * between the Aggregator and DataFrame paths.
  */
object Kmv {

  /** 2⁴⁸ — the hash space of the 12-hex-digit md5 prefix. */
  val HashSpace: Long = 281474976710656L
  private val HashSpaceD: Double = 2.81474976710656e14

  val DefaultK: Int = 256

  /** 48-bit md5-prefix hash of a key column: first 12 hex chars of
    * md5(cast(key as string)) as int64 — exact in both engines (Spark
    * `conv`; DuckDB the [[hashSql]] fold). */
  def hashCol(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 12), 16, 10).cast("long")

  /** The DuckDB mirror of [[hashCol]] as interpolatable SQL text — the
    * 12-digit hex fold. Emitted WITHOUT margin bars so a host string's
    * later `.stripMargin` leaves the interpolated lines untouched. */
  def hashSql(keyExpr: String): String =
    s"""list_sum(list_transform(range(12), i ->
       |      (strpos('0123456789abcdef',
       |         substr(md5(CAST($keyExpr AS VARCHAR)),
       |           CAST(i + 1 AS INT), 1)) - 1)
       |      * (CAST(1 AS BIGINT) << CAST(4 * (11 - i) AS INT))))""".stripMargin

  /** The k smallest distinct hashes of `key` as a 1-column frame
    * (`hv`, ascending candidates): distinct-hash census + TakeOrdered
    * k. Spark plans the limit as per-partition top-k then a k-row
    * merge — the sketch never shuffles more than `partitions × k`
    * rows. */
  def sketchFrame(df: DataFrame, key: Column, k: Int = DefaultK): DataFrame =
    df.select(hashCol(key).as("hv"))
      .groupBy("hv").agg(count(lit(1)).as("_dups"))
      .select("hv")
      .orderBy("hv").limit(k)

  /** Unbiased distinct estimate (m−1)·2⁴⁸/u_k from the sketch's fill
    * count and k-th minimum (Beyer et al. 2007). Callers guard the
    * m < 2 / u_k ≤ 0 corners (their NULL conventions differ). */
  def estimateCol(m: Column, uk: Column): Column =
    (m.cast("double") - 1.0) * HashSpaceD / uk.cast("double")

  /** Scalar estimate from a materialized sketch: exact when the set
    * was smaller than k (the sketch holds ALL its hashes), the
    * (k−1)/u_k form once full. */
  def estimate(sketch: Array[Long], k: Int = DefaultK): Double = {
    require(sketch.sameElements(sketch.sorted), "sketch must be sorted")
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1.0) * HashSpaceD / sketch.last.toDouble
  }

  /** Union composition: the k smallest of the merged hash sets — KMV's
    * defining property (the union sketch is EXACTLY the sketch of the
    * union, so rollups lose nothing). */
  def mergeSketches(a: Array[Long], b: Array[Long],
      k: Int = DefaultK): Array[Long] =
    (a ++ b).distinct.sorted.take(k)

  /** Set-operation estimates from two sketches (Beyer et al. 2007):
    * K = k-min of the union; ρ̂ = |{h ∈ K : h ∈ A ∧ h ∈ B}| / |K|
    * (Jaccard), D̂(A∪B) from K, intersection ≈ ρ̂ · D̂(A∪B).
    * Returns (jaccard, unionEstimate, intersectionEstimate). */
  def overlap(a: Array[Long], b: Array[Long],
      k: Int = DefaultK): (Double, Double, Double) = {
    val union = mergeSketches(a, b, k)
    val inA = a.toSet; val inB = b.toSet
    val both = union.count(h => inA(h) && inB(h))
    val jac = if (union.isEmpty) 0.0 else both.toDouble / union.length
    val dU = estimate(union, k)
    (jac, dU, jac * dU)
  }

  /** Mergeable k-min sketch as a typed Aggregator over PRE-HASHED
    * int64 values (apply [[hashCol]] first): partial state is the
    * sorted distinct k-min array, so the shuffle carries at most
    * `partitions × k` longs — the TDigestAgg partial/final shape.
    * Deterministic: the k smallest distinct values of a multiset do
    * not depend on arrival order or partitioning, so (unlike t-digest)
    * the OUTPUT is exactly reproducible — which is why the q326 family
    * can be oracle-gated while t-digest stays ScalaTest-only. */
  class KmvAgg(k: Int = DefaultK)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 2, s"k must be >= 2, got $k")

    override def zero: Array[Long] = Array.empty

    override def reduce(b: Array[Long], x: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(b, x)
      if (pos >= 0) b // already present
      else if (b.length >= k && x > b(b.length - 1)) b // above the cut
      else {
        val ins = -pos - 1
        val out = new Array[Long](math.min(b.length + 1, k))
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = x
        System.arraycopy(b, ins, out, ins + 1, out.length - ins - 1)
        out
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      mergeSketches(a, b, k)

    override def finish(b: Array[Long]): Array[Long] = b

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }
}
