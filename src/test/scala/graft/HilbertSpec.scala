package graft

import graft.functions.{HilbertFns, HilbertKernels}
import graft.ops.{Compaction, Hilbert}
import org.apache.spark.sql.functions._

/** Hilbert clustering (ops.Hilbert / functions.HilbertIndexExpr):
  * kernel exactness (bijection + the defining continuity property —
  * consecutive indices are 4-neighbour cells, which Morton violates),
  * codegen/interpreted agreement, and the data-skipping claim measured
  * per file against the 1-D sort baseline on the same grid ZOrderSpec
  * uses.
  */
class HilbertSpec extends SparkSpec {

  test("xy2d is a bijection whose consecutive cells are 4-neighbours") {
    val bits = 3
    val n = 1 << bits
    val cells = for { x <- 0 until n; y <- 0 until n }
      yield (x, y, HilbertKernels.xy2d(x, y, bits))
    // bijection onto [0, 4^bits)
    assert(cells.map(_._3).sorted == (0L until (n.toLong * n)).toList)
    // continuity: |Δx| + |Δy| = 1 between consecutive indices — the
    // property that makes equal index ranges compact tiles (the Morton
    // curve breaks it at every quadrant seam)
    val byD = cells.sortBy(_._3)
    byD.sliding(2).foreach { p =>
      val manhattan = math.abs(p(1)._1 - p(0)._1) +
        math.abs(p(1)._2 - p(0)._2)
      assert(manhattan == 1,
        s"jump between d=${p(0)._3} ${(p(0)._1, p(0)._2)} and ${(p(1)._1, p(1)._2)}")
    }
    // spot-pin the standard orientation (d=0 at origin, ends at (n-1,0))
    assert(HilbertKernels.xy2d(0, 0, bits) == 0L)
    assert(HilbertKernels.xy2d(n - 1, 0, bits) == n.toLong * n - 1)
  }

  test("the codegen expression matches the kernel on a full grid") {
    import spark.implicits._
    val bits = 4
    val n = 1 << bits
    val df = (for { x <- 0 until n; y <- 0 until n }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        HilbertFns.hilbertIndex(col("x"), col("y"), bits).as("h"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == HilbertKernels.xy2d(r.getLong(0), r.getLong(1), bits))
    }
  }

  private def perFileSpans(dir: String, cols: Seq[String]): Seq[Map[String, Long]] = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).toSeq
    files.map { f =>
      val aggs = cols.flatMap(c =>
        Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
      val r = spark.read.parquet(f).agg(aggs.head, aggs.tail: _*).head()
      cols.map(c => c ->
        (r.getAs[Long](s"max_$c") - r.getAs[Long](s"min_$c"))).toMap
    }
  }

  test("Hilbert files bound BOTH dimensions tighter than the 1-D sort") {
    import spark.implicits._
    // the ZOrderSpec fixture: uniform 64x64 grid, 16 files of 256 rows
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)).toDF("x", "y").coalesce(4)
    val hDir = java.nio.file.Files.createTempDirectory("hilbert").toString
    val sDir = java.nio.file.Files.createTempDirectory("hsort").toString
    assert(Hilbert.writeHilbertClustered(grid, hDir, "x", "y", 256L,
      bits = 6) == 16)
    assert(Compaction.writeClustered(grid, sDir, Seq("x"), 256L) == 16)

    val hSpans = perFileSpans(hDir, Seq("x", "y"))
    val sSpans = perFileSpans(sDir, Seq("x", "y"))
    def avg(spans: Seq[Map[String, Long]], c: String): Double =
      spans.map(_(c)).sum.toDouble / spans.size

    assert(avg(sSpans, "y") >= 60.0) // 1-D leaves y at full span
    // a 256-row Hilbert range tiles a compact region: both spans well
    // under full width (16 perfect tiles would be 16x16)
    assert(avg(hSpans, "x") <= 20.0, s"x spans: ${hSpans.map(_("x"))}")
    assert(avg(hSpans, "y") <= 20.0, s"y spans: ${hSpans.map(_("y"))}")
  }
}
