package graft

import graft.ops.Skyline
import org.apache.spark.sql.functions._

/** Skyline.skyline2 vs the brute-force all-pairs dominance oracle (the
  * definition, quadratic — fine at fixture scale), plus tie handling and
  * degenerate inputs. */
class SkylineSpec extends SparkSpec {

  private def brute(rows: Seq[(Long, Double, Int)]): Set[Long] =
    rows.filter { case (_, x, y) =>
      !rows.exists { case (_, x2, y2) =>
        x2 <= x && y2 >= y && (x2 < x || y2 > y)
      }
    }.map(_._1).toSet

  test("frontier of the part catalog matches brute force") {
    val p = Tables.part(spark, sf0001)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    val rows = p.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    val expected = brute(rows)
    val got = Skyline.skyline2(p, col("p_retailprice"), col("p_size"))
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty, "a finite set always has a frontier")
  }

  test("equal (x, y) ties all survive; dominated duplicates all drop") {
    import spark.implicits._
    val df = Seq(
      (1L, 1.0, 5), (2L, 1.0, 5),   // equal pair, dominated by 4 (x strict)
      (3L, 1.0, 4),                 // same x, smaller y — dominated
      (4L, 0.5, 5),                 // cheapest at the best y — frontier
      (5L, 2.0, 9),                 // pricier but biggest — frontier
      (6L, 0.5, 5)                  // exact duplicate of 4 — ties survive
    ).toDF("id", "x", "y")
    val got = Skyline.skyline2(df, col("x"), col("y"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(4L, 5L, 6L))
  }

  test("single row and empty input") {
    import spark.implicits._
    val one = Seq((1L, 3.0, 2)).toDF("id", "x", "y")
    assert(Skyline.skyline2(one, col("x"), col("y")).count() == 1)
    val empty = one.filter(col("id") < 0)
    assert(Skyline.skyline2(empty, col("x"), col("y")).count() == 0)
  }
}
