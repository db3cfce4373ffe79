package graft

import org.scalatest.Assertions

/** r16 (r15 verdict mandate #5): the estimator-honesty panel, codified.
  *
  * The repo's sketch/estimator discipline (q326/q332/q339/q346/q348/
  * q351, established r15) is that every estimate ships NEXT TO the
  * exact value it approximates, so the oracle gate checks both the
  * construction and its honesty. The spec-side half of that discipline
  * was hand-rolled per test; this trait is the single helper:
  *
  *  1. non-degeneracy — a support statistic (sketch fill, sample size,
  *     recapture mass, replicate count) must clear a floor, so the
  *     band check cannot pass vacuously on an empty construction
  *     (the [[NonDegeneracySpec]] lesson: mirrors prove arithmetic,
  *     not meaning);
  *  2. honesty — the estimate lands within a declared band of the
  *     truth: a relative-error band (sketches with ±O(1/√k)
  *     envelopes), a z·SE band (estimators that publish their SE), or
  *     an interval band (CI brackets its target; shrinkage lands
  *     between the raw rate and the prior).
  *
  * Every future sketch/estimator query gets the panel by calling this
  * once per published estimate.
  */
trait EstimatorHonesty { this: Assertions =>

  sealed trait HonestyBand
  /** |est − truth| / max(|truth|, floor) < tol. */
  final case class RelErr(tol: Double, floor: Double = 1.0)
      extends HonestyBand
  /** |est − truth| < z·se + slack; se must be strictly positive. */
  final case class ZSe(se: Double, z: Double, slack: Double = 0.0)
      extends HonestyBand
  /** truth ∈ [lo, hi] (est is the interval's target here — pass the
    * bracketing interval as (lo, hi) and the target as `truth`). */
  final case class Within(lo: Double, hi: Double) extends HonestyBand

  /** Assert `estimate` lands on `truth` within `band`, and that the
    * construction had real support. `what` names the site in the
    * failure message (include the SF when looping over fixtures). */
  def assertEstimatorLands(what: String, estimate: Double, truth: Double,
      band: HonestyBand, support: Long, minSupport: Long): Unit = {
    assert(support >= minSupport,
      s"$what: degenerate input — support $support < floor $minSupport, " +
        "the honesty band below would be vacuous")
    band match {
      case RelErr(tol, floor) =>
        val re = math.abs(estimate - truth) / math.max(math.abs(truth), floor)
        assert(re < tol,
          s"$what: estimate $estimate vs truth $truth — rel err " +
            f"$re%.4f outside ±$tol")
      case ZSe(se, z, slack) =>
        assert(se > 0.0, s"$what: published SE must be positive, got $se")
        assert(math.abs(estimate - truth) < z * se + slack,
          s"$what: estimate $estimate vs truth $truth beyond " +
            s"${z}*SE($se) + $slack")
      case Within(lo, hi) =>
        assert(lo <= hi, s"$what: inverted interval [$lo, $hi]")
        assert(truth >= lo && truth <= hi,
          s"$what: target $truth escapes its band [$lo, $hi]")
    }
  }
}
