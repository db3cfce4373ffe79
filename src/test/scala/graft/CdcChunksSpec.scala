package graft

import graft.functions.{CdcChunks, CdcKernels}
import org.apache.spark.sql.functions._

/** Kernel-level checks for content-defined chunking plus the property
  * the operator exists for: boundary invariance under prefix edits.
  * (Cross-engine value parity is the q189 oracle row; these pin the
  * kernel's semantics against an independent brute-force reference.)
  */
class CdcChunksSpec extends SparkSpec {

  /** Brute force: hash every W-window directly (no rolling update) and
    * split — an independent implementation of the CdcChunks contract. */
  private def bruteChunks(s: String): Seq[String] = {
    import CdcKernels.{B, D, M, W}
    if (s.isEmpty) return Seq("")
    val n = s.length
    val bounds = (W to n - 1).filter { i => // 1-based, i < n
      val h = (0 until W).map { j =>
        var p = 1L; (0 until j).foreach(_ => p = p * B % M)
        s.charAt(i - 1 - j).toLong * p % M
      }.sum % M
      h % D == 0
    }
    val starts = 0 +: bounds.map(_.toInt)
    val ends = bounds.map(_.toInt) :+ n
    starts.zip(ends).map { case (a, b) => s.substring(a, b) }
  }

  private def kernelChunks(s: String): Seq[String] = {
    val arr = CdcKernels.cdcChunks(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("kernel matches the brute-force window hasher on fixture text") {
    val texts = Tables.documents(spark, sf0001)
      .select("text").limit(50).collect().map(_.getString(0))
    for (t <- texts) {
      val k = kernelChunks(t)
      assert(k == bruteChunks(t), s"chunk mismatch on: ${t.take(60)}…")
      assert(k.mkString("") == t, "chunks must concatenate back to the text")
    }
  }

  test("short and empty inputs produce one whole-text chunk") {
    assert(kernelChunks("") == Seq(""))
    assert(kernelChunks("abc") == Seq("abc"))
    assert(kernelChunks("exactly8") == Seq("exactly8"))
  }

  test("prefix edits leave boundaries after the edit in place") {
    // THE content-defined property (LBFS): insert a prefix and all
    // boundaries more than one window past the edit survive, so the
    // trailing chunks are identical strings. A fixed-stride chunker
    // (q102) shifts every one of them.
    val texts = Tables.documents(spark, sf0001)
      .filter(length(col("text")) >= 200)
      .select("text").limit(20).collect().map(_.getString(0))
    var preserved = 0
    var total = 0
    for (t <- texts) {
      val orig = kernelChunks(t)
      val edited = kernelChunks("inserted prefix words " + t)
      // chunks strictly after the first original boundary are beyond
      // the window influence of the edit
      if (orig.length >= 2) {
        total += orig.length - 1
        preserved += orig.tail.count(edited.contains)
      }
    }
    assert(total > 0, "fixture must yield multi-chunk documents")
    assert(preserved == total,
      s"only $preserved/$total post-edit chunks survived a prefix insertion")
  }

  test("q189 runs non-empty and chunk-count-consistent on sf0.001") {
    val out = SparkEntry.queries("q189_cdc_chunks")(spark, sf0001).collect()
    assert(out.nonEmpty, "fixture dup passages must yield repeated chunks")
    assert(out.forall(r => r.getLong(1) >= 2 && r.getLong(2) <= r.getLong(1)))
  }
}
