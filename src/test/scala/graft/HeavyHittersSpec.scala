package graft

import graft.functions.HeavyHittersAgg
import org.apache.spark.sql.functions._

/** Pins the Misra–Gries guarantees (not a fixed output map — MG
  * summaries are partitioning-dependent in which sub-threshold items
  * survive): capacity bound, no-false-negatives above n/(k+1),
  * undercount bounded by n/(k+1), and stability of the guarantees
  * under repartitioning (the mergeable-summaries property actually
  * doing its job across a shuffle).
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // skewed corpus: "hot" 400×, "warm" 150×, "mild" 60×, 390 singletons
  private val items: Seq[String] =
    Seq.fill(400)("hot") ++ Seq.fill(150)("warm") ++ Seq.fill(60)("mild") ++
      (1 to 390).map(i => s"rare$i")
  private val n = items.size
  private val exact: Map[String, Long] =
    items.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }

  private def sketch(k: Int, parts: Int): Map[String, Long] = {
    val agg = udaf(new HeavyHittersAgg(k))
    // deterministic spread across partitions to exercise merge paths
    items.zipWithIndex.toDF("item", "i")
      .repartition(parts, col("i"))
      .agg(agg(col("item")).as("hh"))
      .as[Map[String, Long]].collect()(0)
  }

  test("capacity bound and no false negatives above n/(k+1)") {
    for (parts <- Seq(1, 4, 13); k <- Seq(5, 20)) {
      val s = sketch(k, parts)
      assert(s.size <= k, s"k=$k parts=$parts: size ${s.size}")
      val threshold = n.toDouble / (k + 1)
      exact.filter(_._2 > threshold).keys.foreach { w =>
        assert(s.contains(w), s"k=$k parts=$parts: lost heavy item $w")
      }
    }
  }

  test("counts are lower bounds, under-counted by at most n/(k+1)") {
    for (parts <- Seq(1, 4, 13)) {
      val k = 10
      val s = sketch(k, parts)
      s.foreach { case (w, c) =>
        val f = exact.getOrElse(w, 0L)
        assert(c <= f, s"parts=$parts: over-counted $w ($c > $f)")
        assert(c >= f - n.toDouble / (k + 1),
          s"parts=$parts: $w undercut too far ($c vs $f, n=$n)")
      }
    }
  }

  test("heavy ranking is recovered from the sketch") {
    val s = sketch(8, 4)
    val ranked = s.toSeq.sortBy { case (w, c) => (-c, w) }.map(_._1)
    assert(ranked.take(3) === Seq("hot", "warm", "mild"))
  }

  test("nulls are ignored and an all-null group yields an empty sketch") {
    val agg = udaf(new HeavyHittersAgg(4))
    val s = Seq[Option[String]](None, None, Some("x"), None)
      .toDF("item")
      .agg(agg(col("item")).as("hh"))
      .as[Map[String, Long]].collect()(0)
    assert(s === Map("x" -> 1L))
    val agg2 = udaf(new HeavyHittersAgg(4))
    val empty = Seq[Option[String]](None, None).toDF("item")
      .agg(agg2(col("item")).as("hh"))
      .as[Map[String, Long]].collect()(0)
    assert(empty.isEmpty)
  }
}
