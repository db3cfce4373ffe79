package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-column utilities for the similarity-search family:
  * normalization and Johnson–Lindenstrauss random projection — the
  * standard cheap dimension-reduction step in front of ANN indexes
  * (public technique: JL lemma; sign-matrix variant per Achlioptas,
  * "Database-friendly random projections", PODS'01).
  *
  * Everything is built from builtin higher-order functions over the
  * array column — per-row, embarrassingly parallel, no shuffle, no UDF,
  * and the projection "matrix" is a seeded hash so nothing is
  * materialized or broadcast: entry (j, i) is sign(xxhash64(seed, j, i)).
  * The same seed reproduces the same projection on any cluster layout —
  * determinism under repartitioning, like the q71 split assignment.
  */
object EmbeddingOps {

  /** L2-normalized copy of a float/double array column (zero vectors
    * pass through unchanged rather than dividing by zero). */
  def l2Normalize(v: Column): Column = {
    val d = transform(v, _.cast("double"))
    val norm = sqrt(aggregate(d, lit(0.0), (acc, x) => acc + x * x))
    when(norm === 0.0, d).otherwise(transform(d, x => x / norm))
  }

  /** JL projection of `v` (any numeric array) to `outDim` dimensions
    * with a ±1 hash-sign matrix, scaled by 1/sqrt(outDim) so expected
    * norms are preserved. */
  def randomProject(v: Column, outDim: Int, seed: Long = 42L): Column = {
    require(outDim > 0, "outDim must be positive")
    val d = transform(v, _.cast("double"))
    val idx = sequence(lit(0), size(v) - 1)
    val scale = math.sqrt(outDim.toDouble)
    val proj = transform(sequence(lit(0), lit(outDim - 1)), j => {
      val signed = zip_with(d, idx, (x, i) =>
        // sign in {-1, +1} from the hash's low bit
        x * (pmod(xxhash64(lit(seed), j, i), lit(2)) * 2 - 1))
      aggregate(signed, lit(0.0), (acc, x) => acc + x) / scale
    })
    // empty input: Spark's sequence(0, -1) counts DOWN ([0, -1]), so
    // guard explicitly — the projection of nothing is the zero vector
    when(size(v) === 0,
      transform(sequence(lit(0), lit(outDim - 1)), _ => lit(0.0)))
      .otherwise(proj)
  }
}
