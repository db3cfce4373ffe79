package graft

import graft.ops.{Compaction, ZOrder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order clustering (ops.ZOrder): exact bit-interleave semantics,
  * and the data-skipping claim measured against the 1-D sort baseline
  * on a uniform 2-D grid — per-file min/max spans must be bounded in
  * BOTH dimensions, where a 1-D sort leaves the second dimension at
  * full span in every file.
  */
class ZOrderSpec extends SparkSpec {

  test("interleaveBits is the exact Morton encoding") {
    import spark.implicits._
    // (x, y, expected morton with bit b of col c -> bit b*2+c)
    val cases = Seq(
      (0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      // x=5=0b101, y=3=0b011: x bits -> out 0/2/4, y bits -> out 1/3/5
      // = 0b011011 = 27
      (2L, 0L, 4L), (0L, 2L, 8L), (3L, 3L, 15L), (5L, 3L, 27L))
    val df = cases.toDF("x", "y", "want")
    val got = df.select(col("want"),
        ZOrder.interleaveBits(Seq(col("x"), col("y")), 3).as("z"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(0)))
  }

  test("interleaveBits rejects ranks that cannot fit a positive Long") {
    import spark.implicits._
    val c = Seq((1L, 1L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      ZOrder.interleaveBits(Seq(col("a"), col("b")), 32)
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

  test("z-ordered files bound BOTH dimensions; 1-D sort bounds only one") {
    import spark.implicits._
    // uniform 64x64 grid, 16 files of 256 rows
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)).toDF("x", "y").coalesce(4)
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val sDir = java.nio.file.Files.createTempDirectory("xsort").toString
    assert(ZOrder.writeZOrdered(grid, zDir, Seq("x", "y"), 256L, bits = 6) == 16)
    assert(Compaction.writeClustered(grid, sDir, Seq("x"), 256L) == 16)

    val zSpans = perFileSpans(zDir, Seq("x", "y"))
    val sSpans = perFileSpans(sDir, Seq("x", "y"))
    def avg(spans: Seq[Map[String, Long]], c: String): Double =
      spans.map(_(c)).sum.toDouble / spans.size

    // x-sorted files: x tightly bounded, y at (almost) full span
    assert(avg(sSpans, "x") <= 8.0)
    assert(avg(sSpans, "y") >= 60.0)
    // z-ordered files: BOTH dimensions bounded well under full span —
    // a filter on either column prunes most files
    assert(avg(zSpans, "x") <= 24.0, s"x spans: ${zSpans.map(_("x"))}")
    assert(avg(zSpans, "y") <= 24.0, s"y spans: ${zSpans.map(_("y"))}")
  }
}
