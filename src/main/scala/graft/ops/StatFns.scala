package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared statistical kernels for the hypothesis-test query family.
  *
  * The two-sided normal p is DEFINED as the Abramowitz–Stegun 26.2.17
  * polynomial (|ε| < 7.5·10⁻⁸), evaluated by the identical expression
  * chain on both engines; callers quantize the result to 1e-8 units
  * (the q216 discipline) so a 1-ulp exp() divergence cannot flip a
  * displayed digit.
  */
object StatFns {

  /** A-S 26.2.17 two-sided normal tail probability for a z column. */
  def asTwoSidedP(z: Column): Column = {
    val za = abs(z)
    val tInv = lit(1.0) / (lit(1.0) + lit(0.2316419) * za)
    val phi = exp(-za * za / 2.0) / lit(2.5066282746310002)
    lit(2.0) * phi * (lit(0.319381530) * tInv
      - lit(0.356563782) * pow(tInv, 2)
      + lit(1.781477937) * pow(tInv, 3)
      - lit(1.821255978) * pow(tInv, 4)
      + lit(1.330274429) * pow(tInv, 5))
  }

  /** The same A-S 26.2.17 chain as SQL text over a z expression. */
  def asTwoSidedPSql(z: String): String =
    s"""(2.0 * (exp(-abs($z) * abs($z) / 2.0) / 2.5066282746310002)
       |  * (0.319381530 * (1.0 / (1.0 + 0.2316419 * abs($z)))
       |   - 0.356563782 * POWER(1.0 / (1.0 + 0.2316419 * abs($z)), 2)
       |   + 1.781477937 * POWER(1.0 / (1.0 + 0.2316419 * abs($z)), 3)
       |   - 1.821255978 * POWER(1.0 / (1.0 + 0.2316419 * abs($z)), 4)
       |   + 1.330274429 * POWER(1.0 / (1.0 + 0.2316419 * abs($z)), 5)))
       |""".stripMargin.replace("\n", " ")
}
