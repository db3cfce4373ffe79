package graft

import org.apache.spark.sql.functions._
import graft.ops.SpatialStats

/** Brute-force and structured-field references for the spatial
  * autocorrelation family (q294 Moran's I, q295 Geary's C, q296
  * Getis–Ord Gi*).
  *
  * Two layers, per the vacuous-screen discipline:
  * 1. BRUTE: recompute each statistic from the textbook double loop
  *    over the collected sf0.001 cell census (O(cells²) pair scan —
  *    cells ≤ 612 at any SF) and require the distributed exact-integer
  *    construction to match.
  * 2. STRUCTURE: the shipped fixture is spatially RANDOM by
  *    construction (hashed positions), so its global tests sit in the
  *    null band — that alone would be a vacuous screen. These tests
  *    push a strongly autocorrelated ramp field (x = cx) and a
  *    checkerboard (perfect negative autocorrelation) through the SAME
  *    library kernels and require I → positive / C < 1 on the ramp,
  *    I < 0 / C > 1 on the checkerboard, with decisive z — proving the
  *    statistics DISCRIMINATE, not just agree with a mirror.
  */
class SpatialStatsSpec extends SparkSpec {

  private def customerCellsCollected(): Array[(Int, Int, Long)] = {
    import spark.implicits._
    Tables.customer(spark, sf0001)
      .select(
        floor((pmod(col("c_custkey") * 1103515245L + 12345L, lit(3600L))
          .cast("double") / 10.0 - 180.0) / 10.0).cast("int").as("cx"),
        floor((pmod(col("c_custkey") * 2654435761L, lit(1700L))
          .cast("double") / 10.0 - 85.0) / 10.0).cast("int").as("cy"))
      .groupBy("cx", "cy").agg(count(lit(1)).as("x"))
      .as[(Int, Int, Long)].collect()
  }

  /** Sequential Moran/Geary over an explicit cell list: textbook
    * double loop over all ordered pairs with queen adjacency. */
  private def brute(cells: Array[(Int, Int, Long)])
      : (Double, Double, Double, Double) = {
    val n = cells.length
    val xs = cells.map(_._3.toDouble)
    val mean = xs.sum / n
    val dev = xs.map(_ - mean)
    val varSum = dev.map(d => d * d).sum
    var w = 0L; var cross = 0.0; var diff2 = 0.0
    val deg = new Array[Long](n)
    for (i <- 0 until n; j <- 0 until n if i != j) {
      val adj = math.abs(cells(i)._1 - cells(j)._1) <= 1 &&
        math.abs(cells(i)._2 - cells(j)._2) <= 1
      if (adj) {
        w += 1; deg(i) += 1
        cross += dev(i) * dev(j)
        val d = xs(i) - xs(j); diff2 += d * d
      }
    }
    val moran = n.toDouble / w * cross / varSum
    val geary = (n - 1.0) * diff2 / (2.0 * w * varSum)
    val nD = n.toDouble; val wD = w.toDouble
    val s1 = 2.0 * wD
    val s2 = 4.0 * deg.map(d => d.toDouble * d).sum
    val varI = (nD * nD * s1 - nD * s2 + 3.0 * wD * wD) /
      (wD * wD * (nD * nD - 1.0)) - 1.0 / ((nD - 1.0) * (nD - 1.0))
    val zI = (moran - (-1.0 / (nD - 1.0))) / math.sqrt(varI)
    val varC = ((2.0 * s1 + s2) * (nD - 1.0) - 4.0 * wD * wD) /
      (2.0 * (nD + 1.0) * wD * wD)
    val zC = (geary - 1.0) / math.sqrt(varC)
    (moran, zI, geary, zC)
  }

  test("q294 Moran's I matches the O(cells^2) textbook pair loop") {
    val row = SparkEntry.queries("q294_morans_i")(spark, sf0001).head()
    val cells = customerCellsCollected()
    val (moran, zI, _, _) = brute(cells)
    assert(row.getAs[Long]("n_cells") === cells.length.toLong)
    assert(math.abs(row.getAs[Double]("morans_i") - moran) < 5e-6,
      s"I ${row.getAs[Double]("morans_i")} vs brute $moran")
    assert(math.abs(row.getAs[Double]("e_i") -
      (-1.0 / (cells.length - 1.0))) < 5e-6)
    assert(math.abs(row.getAs[Double]("z") - zI) < 5e-4,
      s"z ${row.getAs[Double]("z")} vs brute $zI")
  }

  test("q295 Geary's C matches the O(cells^2) textbook pair loop") {
    val row = SparkEntry.queries("q295_gearys_c")(spark, sf0001).head()
    val cells = customerCellsCollected()
    val (_, _, geary, zC) = brute(cells)
    assert(math.abs(row.getAs[Double]("gearys_c") - geary) < 5e-6,
      s"C ${row.getAs[Double]("gearys_c")} vs brute $geary")
    assert(math.abs(row.getAs[Double]("z") - zC) < 5e-4,
      s"z ${row.getAs[Double]("z")} vs brute $zC")
  }

  test("q296 Gi* matches the per-cell textbook computation") {
    val out = SparkEntry.queries("q296_getis_gi")(spark, sf0001)
      .collect().map(r => ((r.getAs[Int]("cx"), r.getAs[Int]("cy")),
        (r.getAs[Long]("nbhd"), r.getAs[Double]("gi_z")))).toMap
    val cells = customerCellsCollected()
    val n = cells.length
    val xs = cells.map(_._3.toDouble)
    val mean = xs.sum / n
    val sd = math.sqrt(xs.map(x => x * x).sum / n - mean * mean)
    cells.foreach { case (cx, cy, _) =>
      var s9 = 0L; var w9 = 0L
      cells.foreach { case (ox, oy, on) =>
        if (math.abs(ox - cx) <= 1 && math.abs(oy - cy) <= 1) {
          s9 += on; w9 += 1
        }
      }
      val gi = (s9 - mean * w9) / (sd *
        math.sqrt((n.toDouble * w9 - w9.toDouble * w9) / (n - 1.0)))
      val (nbhd, giZ) = out((cx, cy))
      assert(nbhd === s9)
      assert(math.abs(giZ - gi) < 5e-4, s"cell ($cx,$cy): $giZ vs $gi")
    }
  }

  private def grid(f: (Int, Int) => Long) = {
    import spark.implicits._
    (for (cx <- 0 until 20; cy <- 0 until 20) yield (cx, cy, f(cx, cy)))
      .toDF("cx", "cy", "x")
  }

  test("structure: a ramp field is strongly positive on I, below 1 on C") {
    // x = 10·cx + cy: smooth gradient — neighbours are similar
    val ramp = grid((cx, cy) => 10L * cx + cy)
    val i = SpatialStats.moransI(ramp).head()
    assert(i.getAs[Double]("morans_i") > 0.7,
      s"ramp I = ${i.getAs[Double]("morans_i")}")
    assert(i.getAs[Double]("z") > 10.0)
    val c = SpatialStats.gearysC(ramp).head()
    assert(c.getAs[Double]("gearys_c") < 0.3,
      s"ramp C = ${c.getAs[Double]("gearys_c")}")
    assert(c.getAs[Double]("z") < -10.0)
  }

  test("structure: vertical stripes are negative on I, above 1 on C") {
    // stripes, not a checkerboard: under QUEEN adjacency a checkerboard
    // is ~uncorrelated (its 4 diagonal neighbours share the colour);
    // stripes make 6 of 8 neighbours dissimilar → strongly negative I
    val stripes = grid((cx, _) => (cx % 2).toLong * 10L)
    val i = SpatialStats.moransI(stripes).head()
    assert(i.getAs[Double]("morans_i") < -0.3,
      s"stripe I = ${i.getAs[Double]("morans_i")}")
    assert(i.getAs[Double]("z") < -5.0)
    val c = SpatialStats.gearysC(stripes).head()
    assert(c.getAs[Double]("gearys_c") > 1.3,
      s"stripe C = ${c.getAs[Double]("gearys_c")}")
    assert(c.getAs[Double]("z") > 5.0)
  }

  test("q305 join counts match the O(cells^2) pair loop and z algebra") {
    val row = SparkEntry.queries("q305_join_counts")(spark, sf0001)
      .head()
    val cells = customerCellsCollected()
    val n = cells.length
    val s = cells.map(_._3).sum
    // binary field exactly as the query: x·N > S
    val b = cells.map(c => if (BigInt(c._3) * n > BigInt(s)) 1 else 0)
    var bb = 0L; var bw = 0L; var ww = 0L; var w2 = 0L
    val deg = new Array[Long](n)
    for (i <- 0 until n; j <- 0 until n if i != j) {
      val adj = math.abs(cells(i)._1 - cells(j)._1) <= 1 &&
        math.abs(cells(i)._2 - cells(j)._2) <= 1
      if (adj) {
        w2 += 1; deg(i) += 1
        if (b(i) == 1 && b(j) == 1) bb += 1
        else if (b(i) != b(j)) bw += 1
        else ww += 1
      }
    }
    assert(row.getAs[Long]("n_cells") === n.toLong)
    assert(row.getAs[Long]("n_black") === b.sum.toLong)
    assert(row.getAs[Long]("j_links") === w2 / 2)
    assert(row.getAs[Long]("bb") === bb / 2)
    assert(row.getAs[Long]("bw") === bw / 2)
    assert(row.getAs[Long]("ww") === ww / 2)
    val nD = n.toDouble; val wD = w2.toDouble
    val p = b.sum.toDouble / nD; val q = 1.0 - p
    val s1 = 2.0 * wD; val s2 = 4.0 * deg.map(d => d.toDouble * d).sum
    val vBb = (s1 * (p * p - math.pow(p, 4)) +
      (s2 - 2 * s1) * (p * p * p - math.pow(p, 4))) / 4.0
    val vBw = (s1 * (2 * p * q - 4 * p * p * q * q) +
      (s2 - 2 * s1) * (p * q - 4 * p * p * q * q)) / 4.0
    val zBb = (bb / 2.0 - wD / 2.0 * p * p) / math.sqrt(vBb)
    val zBw = (bw / 2.0 - wD * p * q) / math.sqrt(vBw)
    assert(math.abs(row.getAs[Double]("z_bb") - zBb) < 5e-4,
      s"z_bb ${row.getAs[Double]("z_bb")} vs brute $zBb")
    assert(math.abs(row.getAs[Double]("z_bw") - zBw) < 5e-4,
      s"z_bw ${row.getAs[Double]("z_bw")} vs brute $zBw")
  }

  test("structure: join counts see the half-plane as segregation") {
    // left half black (count 10 > mean), right half white: BW pairs
    // exist only along the seam → BB far above free-sampling chance
    val half = grid((cx, _) => if (cx < 10) 10L else 1L)
    val r = SpatialStats.joinCounts(half).head()
    assert(r.getAs[Long]("n_black") === 200L)
    assert(r.getAs[Double]("z_bb") > 3.0,
      s"half-plane z_bb = ${r.getAs[Double]("z_bb")}")
    assert(r.getAs[Double]("z_bw") < -3.0,
      s"half-plane z_bw = ${r.getAs[Double]("z_bw")}")
    // stripes: the opposite sign — mixing far above chance
    val stripes = grid((cx, _) => (cx % 2).toLong * 10L)
    val r2 = SpatialStats.joinCounts(stripes).head()
    assert(r2.getAs[Double]("z_bw") > 3.0,
      s"stripe z_bw = ${r2.getAs[Double]("z_bw")}")
  }

  test("structure: Gi* flags the hot corner of a plateau field") {
    // a 5×5 hot plateau in the top-right of an otherwise flat grid
    val plateau = grid((cx, cy) => if (cx >= 15 && cy >= 15) 100L else 10L)
    val out = SpatialStats.getisGiStar(plateau).collect()
    val byCell = out.map(r => ((r.getAs[Int]("cx"), r.getAs[Int]("cy")),
      r.getAs[Double]("gi_z"))).toMap
    // interior of the plateau: all 9 neighbours hot → strongly positive
    assert(byCell((17, 17)) > 3.0, s"hot interior z = ${byCell((17, 17))}")
    // far cold corner: all 9 neighbours cold → negative
    assert(byCell((5, 5)) < 0.0, s"cold interior z = ${byCell((5, 5))}")
    // hot z must dominate every cold-region z
    val coldMax = out.filter(r =>
      r.getAs[Int]("cx") < 13 && r.getAs[Int]("cy") < 13)
      .map(_.getAs[Double]("gi_z")).max
    assert(byCell((17, 17)) > coldMax + 3.0)
  }
}
