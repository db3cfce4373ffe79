package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage — the heart of classic data integration (public
  * method: Fellegi–Sunter probabilistic linkage, JASA 1969; the
  * blocked-comparison form every dedup/master-data pipeline uses):
  * candidate pairs from a blocking key, a weighted sum of per-field
  * similarity scores, and a two-threshold classification into
  * match / possible (clerical review) / non-match.
  *
  * Scale shape: candidates come from an equi-join on the blocking
  * key(s) — pair volume ∝ Σ block², never |A|×|B| — and scoring is a
  * per-pair projection inside codegen. The weights/thresholds are
  * plain parameters; at 100 TB nothing is driver-side.
  */
object RecordLinkage {

  /** Normalized edit-distance similarity of two string columns:
    * 1 - levenshtein/max(len) in [0, 1] (1.0 for two empty strings). */
  def nameSim(a: Column, b: Column): Column =
    when(greatest(length(a), length(b)) === 0, 1.0)
      .otherwise(lit(1.0) -
        levenshtein(a, b).cast("double") / greatest(length(a), length(b)))

  /** Inverse-distance similarity of two numeric columns: 1/(1+|a-b|). */
  def proximitySim(a: Column, b: Column): Column =
    lit(1.0) / (lit(1.0) + abs(a.cast("double") - b.cast("double")))

  /** Link `a` and `b`: equi-join on `blockOn` (same-named columns on
    * both sides), score each candidate with Σ weightᵢ·simᵢ (the sim
    * Columns reference the joined row), and classify. Pairs below
    * `possibleT` are dropped; `clazz` is 'match' (≥ matchT) or
    * 'possible'. Returns the joined columns + `score` + `clazz`.
    * A NULL similarity input nulls the score, and `score >= possibleT`
    * is then false — pairs with missing compared fields drop out;
    * wrap sims in `coalesce` to rate missing fields instead. */
  def link(a: DataFrame, b: DataFrame, blockOn: Seq[String],
      sims: Seq[(Column, Double)], matchT: Double,
      possibleT: Double): DataFrame = {
    require(sims.nonEmpty, "need at least one similarity field")
    require(matchT >= possibleT, "matchT must be >= possibleT")
    val score = sims.map { case (c, w) => c * w }.reduce(_ + _)
    // blocking keys are low-cardinality by design — shuffled hash skips
    // sort-merge's pointless sorts (measured on q83)
    a.join(b.hint("shuffle_hash"), blockOn)
      .withColumn("score", score)
      .filter(col("score") >= possibleT)
      .withColumn("clazz",
        when(col("score") >= matchT, "match").otherwise("possible"))
  }
}
