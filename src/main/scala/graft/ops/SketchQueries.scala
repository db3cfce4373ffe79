package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-engine-checkable sketches (round 14). The HLL (A5) and
  * count-min (L46) families are ScalaTest-verified because their hash
  * kernels are engine-private; KMV is the sketch whose ENTIRE
  * construction both engines can reproduce bit-for-bit — md5 is
  * standardized, so the k minimum hash values, the estimate, and the
  * error against the exact count are all one DuckDB-mirrored query.
  */
object SketchQueries {

  /** L260 KMV (k-minimum-values) distinct-count sketch ([PK]
    * Bar-Yossef et al. 2002; Beyer et al. 2007 unbiased (k−1)/u_k
    * form): estimate |distinct o_custkey| from the k = 256 smallest
    * 48-bit md5 prefixes, next to the exact distinct count and the
    * relative error — the mergeable distinct sketch used when an
    * exact count-distinct shuffle is too expensive, here verified
    * END-TO-END against DuckDB because md5 (unlike engine-native
    * hash()) is identical everywhere.
    *
    * Parity: hv = first 12 hex chars of md5(cast(key as string)) as
    * int64 — exact in both engines (Spark `conv`, DuckDB a 12-digit
    * integer fold); the k-th minimum is an exact-integer order
    * statistic; estimate = (k−1)·2⁴⁸/u_k and the error are one double
    * chain, 4dp.
    *
    * Scale: the sketch is ONE map-side-combinable agg shape — per
    * partition keep the k smallest (here: distinct-hash census +
    * TakeOrdered k, which Spark executes as per-partition top-k then
    * a k-row merge); the exact count (for the error column) is the
    * expensive full distinct the sketch exists to replace, kept here
    * as the oracle's measuring stick. */
  def q326KmvDistinct(s: SparkSession, dir: String): DataFrame = {
    val k = 256
    val hv = Tables.orders(s, dir)
      .select(conv(substring(md5(col("o_custkey").cast("string")), 1, 12),
        16, 10).cast("long").as("hv"))
      .groupBy("hv").agg(count(lit(1)).as("_dups"))
      .select("hv")
    val topk = hv.orderBy("hv").limit(k)
    val kth = topk.agg(count(lit(1)).as("m"), max(col("hv")).as("uk"))
    val exact = Tables.orders(s, dir)
      .agg(count_distinct(col("o_custkey")).as("n_exact"))
    def f(c: String) = col(c).cast("double")
    val est = (f("m") - 1.0) * 2.81474976710656e14 / f("uk")
    kth.crossJoin(broadcast(exact))
      .select(col("n_exact").cast("long").as("n_exact"),
        col("m").cast("long").as("k_used"),
        col("uk").cast("long").as("kth_hash"),
        when(col("uk") <= 0L || col("m") < 2L, lit(null).cast("double"))
          .otherwise((floor(est * 1e4 + 0.5).cast("long")
            .cast("double") / 1e4) + 0.0).as("kmv_estimate"),
        when(col("uk") <= 0L || col("m") < 2L, lit(null).cast("double"))
          .otherwise((floor((est / f("n_exact") - 1.0) * 1e6 + 0.5)
            .cast("long").cast("double") / 1e6) + 0.0).as("rel_err"))
  }

  val q326KmvDistinctSql: String =
    """WITH hv AS (
      |  SELECT DISTINCT list_sum(list_transform(range(12), i ->
      |    (strpos('0123456789abcdef',
      |       substr(md5(CAST(o_custkey AS VARCHAR)),
      |         CAST(i + 1 AS INT), 1)) - 1)
      |    * (CAST(1 AS BIGINT) << CAST(4 * (11 - i) AS INT)))) AS hv
      |  FROM orders),
      |topk AS (SELECT hv FROM hv ORDER BY hv LIMIT 256),
      |kth AS (SELECT COUNT(*) AS m, MAX(hv) AS uk FROM topk),
      |ex AS (SELECT COUNT(DISTINCT o_custkey) AS n_exact FROM orders)
      |SELECT CAST(n_exact AS BIGINT) AS n_exact,
      |  CAST(m AS BIGINT) AS k_used, CAST(uk AS BIGINT) AS kth_hash,
      |  CASE WHEN uk <= 0 OR m < 2 THEN NULL
      |    ELSE FLOOR((m - 1.0) * 2.81474976710656e14
      |      / uk * 1e4 + 0.5) / 1e4 + 0 END AS kmv_estimate,
      |  CASE WHEN uk <= 0 OR m < 2 THEN NULL
      |    ELSE FLOOR(((m - 1.0) * 2.81474976710656e14 / uk
      |      / n_exact - 1.0) * 1e6 + 0.5) / 1e6 + 0 END AS rel_err
      |FROM kth CROSS JOIN ex""".stripMargin
}
