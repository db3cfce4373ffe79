package graft

import java.math.BigDecimal

import graft.ops.Parity
import org.apache.spark.sql.functions._

/** The cross-engine determinism helpers the whole hash gate rests on:
  * dec4 must round HALF_UP (Spark's decimal cast; DuckDB ROUND agrees,
  * banker's rounding would not) and emit DOUBLE, the driver-hasher-safe
  * output type of the round-2 normalization sweep. */
class ParitySpec extends SparkSpec {

  private def evalDec4(s: String): Double = {
    import spark.implicits._
    Seq(new BigDecimal(s)).toDF("x")
      .select(Parity.dec4(col("x")).as("r")).head().getDouble(0)
  }

  test("dec4 rounds HALF_UP at scale 4 and emits double") {
    assert(evalDec4("1.23445") == 1.2345, "half-even would give 1.2344")
    assert(evalDec4("1.23455") == 1.2346)
    assert(evalDec4("-1.23445") == -1.2345, "HALF_UP on magnitude for negatives")
    assert(evalDec4("2.0") == 2.0)
    import spark.implicits._
    val dt = Seq(new BigDecimal("1")).toDF("x")
      .select(Parity.dec4(col("x"))).schema.head.dataType
    assert(dt == org.apache.spark.sql.types.DoubleType,
      "final projections must be DOUBLE for the driver's pandas hasher")
  }

  test("out4 is the exact DuckDB mirror of dec4 on boundary values") {
    val con = Seq("1.23445", "1.23455", "-1.23445", "2.0")
    // the DuckDB side is exercised by every oracle query; here we just
    // pin the SQL template shape so a refactor can't silently drop the
    // DOUBLE cast or the decimal rounding step
    val sql = Parity.out4("x")
    assert(sql.contains("ROUND(x, 4)") && sql.contains("DECIMAL(18,4)")
      && sql.endsWith("AS DOUBLE)"), sql)
    assert(con.nonEmpty)
  }
}
