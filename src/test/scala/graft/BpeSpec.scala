package graft

import graft.ops.BpeTrain
import org.apache.spark.sql.functions._

/** BpeTrain vs an in-test sequential BPE reference (same rules: pairs
  * weighted by word count, argmax tie-broken by (count desc, pair
  * lexicographic), greedy left-to-right single-pass application). The
  * distributed trainer must learn the IDENTICAL merge sequence. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // --- sequential reference ---------------------------------------------
  private def seqMerge(sym: List[String], a: String, b: String): List[String] = {
    val out = List.newBuilder[String]
    var rest = sym
    while (rest.nonEmpty) {
      rest match {
        case x :: y :: tail if x == a && y == b =>
          out += (a + b); rest = tail
        case x :: tail => out += x; rest = tail
        case Nil =>
      }
    }
    out.result()
  }

  private def seqTrain(words: Seq[(String, Long)], n: Int): Seq[(String, String)] = {
    var vocab = words.map { case (w, c) => (w.split("").filter(_.nonEmpty).toList, c) }
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (sym, c) =>
        sym.zip(sym.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (pa, pb) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += ((pa, pb))
        vocab = vocab.map { case (sym, c) => (seqMerge(sym, pa, pb), c) }
        i += 1
      }
    }
    merges.result()
  }

  // ASCII-only corpus: the reference breaks pair ties with Scala string
  // ordering (UTF-16) while Spark orders by UTF-8 bytes — identical on
  // ASCII, the regime this spec pins
  private def wordCounts = Tables.documents(spark, sf0001)
    .select(explode(split(col("text"), " ")).as("word"))
    .filter(length(col("word")) > 0 && col("word").rlike("^[\\x20-\\x7e]+$"))
    .groupBy("word").agg(count(lit(1)).as("cnt"))

  test("learned merge sequence matches the sequential reference on real text") {
    val words = wordCounts
    val local = words.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val expected = seqTrain(local, 12)
    val got = BpeTrain.train(words, 12)
    assert(got == expected, s"merge sequences diverged:\n got $got\n exp $expected")
    assert(got.length == 12)
  }

  test("textbook corpus learns the classic merges in order") {
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "cnt")
    val got = BpeTrain.train(words, 4)
    val expected = seqTrain(Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)), 4)
    assert(got == expected)
    // first merge must be the most frequent pair: (e, s) from newest+widest = 9
    assert(got.head == ("e", "s"))
  }

  test("applyMerges reproduces training-time segmentation") {
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "cnt")
    val merges = BpeTrain.train(words, 6)
    val toks = words
      .select(col("word"), BpeTrain.applyMerges(col("word"), merges).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // every token is a contiguous slice of the word, in order
    toks.foreach { case (w, ts) =>
      assert(ts.mkString("") == w, s"$w re-segmented as $ts")
    }
    // "newest" must use the (e,s) merge family: fewer tokens than chars
    assert(toks("newest").length < "newest".length)
  }

  test("merge application is greedy left-to-right without re-merging") {
    val words = Seq(("aaaa", 1L)).toDF("word", "cnt")
    // pair (a,a): count 3 → merged greedily: [aa, aa]; "aa"+"aa" is a NEW
    // pair for the NEXT iteration, not this one
    val m1 = BpeTrain.train(words, 1)
    assert(m1 == Seq(("a", "a")))
    val seg = words.select(BpeTrain.applyMerges(col("word"), m1).as("t"))
      .collect()(0).getSeq[String](0)
    assert(seg == Seq("aa", "aa"))
  }

  test("fused bpe_encode kernel == the applyMerges HOF fold on the corpus vocabulary") {
    import graft.functions.BpeFns
    val words = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val merges = BpeTrain.train(words, 12)
    assert(merges.length == 12)
    val both = words
      .select(col("word"),
        BpeTrain.applyMerges(col("word"), merges).as("hof"),
        BpeFns.bpeEncode(col("word"), merges).as("fused"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"divergence on '${r.getString(0)}'")
    }
    // edges: empty string -> empty array; single char -> itself;
    // null -> null
    val edges = Seq("", "a", null).toDF("word")
      .select(col("word"), BpeFns.bpeEncode(col("word"), merges).as("t"))
      .collect()
    assert(edges(0).getSeq[String](1) == Seq.empty[String])
    assert(edges(1).getSeq[String](1) == Seq("a"))
    assert(edges(2).isNullAt(1))
    // and it composes into the corpus-level token count, the operator
    // this kernel exists for (one loop per word, inside codegen)
    val nTok = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("word"))
      .select(size(BpeFns.bpeEncode(col("word"), merges)).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(nTok > 0)
  }
}
