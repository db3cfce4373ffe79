package graft

import graft.Tables
import graft.functions.SimFns
import graft.functions.TextFns.tokens
import graft.ops.VectorQueries
import org.apache.spark.sql.functions._

/** The fused similarity / n-gram kernels (SimilarityExprs) must match
  * the higher-order-function reference forms bit-for-bit on fixture
  * data — the DuckDB oracle SQL mirrors the HOF forms.
  */
class SimilarityKernelSpec extends SparkSpec {

  test("cosine kernel == zip_with/aggregate HOF on all fixture vector pairs") {
    val e = Tables.embeddings(spark, sf0001).limit(80)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val diff = a.crossJoin(b)
      .withColumn("fast", VectorQueries.cosine(col("va"), col("vb")))
      .withColumn("ref", VectorQueries.cosineHof(col("va"), col("vb")))
      .filter(not(col("fast") <=> col("ref")))
    assert(diff.count() === 0)
  }

  test("truncation agreement FIRES on prefix-heavy vectors (q340's structured regime)") {
    // The q340 oracle pins the null regime (the fixture embeddings are
    // unstructured, so 16-dim truncation never preserves top-1). This
    // pins the other regime: vectors whose energy is concentrated in
    // the first 16 dims (the Matryoshka property) keep their top-1
    // under the same truncated-cosine ranking.
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def vec(seed: Array[Float], scaleTail: Float): Seq[Float] =
      (seed.map(v => v + rnd.nextFloat() * 0.01f) ++
        Array.fill(48)(rnd.nextFloat() * scaleTail)).toSeq
    val base = Array.fill(16)(rnd.nextFloat() + 0.5f)
    val other = Array.fill(16)(rnd.nextFloat() - 1.5f)
    // candidate 100 shares the query's prefix direction; 101..120 do not
    val rows = (100L, vec(base, 0.05f)) +:
      (101L to 120L).map(i => i -> vec(other, 0.05f))
    val cands = rows.toDF("c_id", "cv")
    val q = Seq((0L, vec(base, 0.05f))).toDF("q_id", "qv")
    val scored = cands.crossJoin(broadcast(q))
      .withColumn("sim_f",
        VectorQueries.cosine(col("cv"), col("qv")))
      .withColumn("sim_t", VectorQueries.cosine(
        slice(col("cv"), 1, 16), slice(col("qv"), 1, 16)))
    val top = scored.orderBy(col("sim_f").desc).select("c_id").head().getLong(0)
    val topT = scored.orderBy(col("sim_t").desc).select("c_id").head().getLong(0)
    assert(top === 100L && topT === 100L,
      s"prefix-heavy top-1 must survive truncation: full=$top trunc=$topT")
  }

  test("cosine kernel: self-similarity 1.0; zero vector -> NaN, not error") {
    import spark.implicits._
    // Unlike the HOF form (whose Divide raises DIVIDE_BY_ZERO under ANSI
    // mode), the kernel follows IEEE and yields NaN for a zero vector —
    // the behavior a similarity search wants. No fixture vector is zero,
    // so the oracle queries never see the difference.
    val v = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
      .withColumn("fast", VectorQueries.cosine(col("a"), col("b")))
    val rows = v.select("fast").collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(rows(1).getDouble(0).isNaN)
  }

  test("jaccard kernel == array_intersect formula on fixture token sets") {
    val t = Tables.documents(spark, sf0001).limit(60)
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("toks"))
    val a = t.select(col("doc_id").as("id_a"), col("toks").as("ta"))
    val b = t.select(col("doc_id").as("id_b"), col("toks").as("tb"))
    val inter = size(array_intersect(col("ta"), col("tb"))).cast("double")
    val uni = size(col("ta")) + size(col("tb")) -
      size(array_intersect(col("ta"), col("tb")))
    val diff = a.crossJoin(b)
      .withColumn("fast", SimFns.jaccardSim(col("ta"), col("tb")))
      .withColumn("ref", inter / uni)
      .filter(not(col("fast") <=> col("ref")))
    assert(diff.count() === 0)
  }

  test("sorted-merge jaccard kernel == hash-set kernel on sorted fixture sets") {
    val t = Tables.documents(spark, sf0001).limit(60)
      .select(col("doc_id"),
        sort_array(array_distinct(tokens(col("text")))).as("toks"))
    val a = t.select(col("doc_id").as("id_a"), col("toks").as("ta"))
    val b = t.select(col("doc_id").as("id_b"), col("toks").as("tb"))
    val diff = a.crossJoin(b)
      .withColumn("merge", SimFns.jaccardSortedSim(col("ta"), col("tb")))
      .withColumn("hash", SimFns.jaccardSim(col("ta"), col("tb")))
      .filter(not(col("merge") <=> col("hash")))
    assert(diff.count() === 0)
  }

  test("sorted-long-intersect kernel == array_intersect on sorted id sets") {
    // token-hash sets per doc: sorted, distinct, long-typed — the exact
    // adjacency-array contract Triangles feeds the kernel (plus empty
    // arrays and fully-disjoint pairs from the cross join)
    val t = Tables.documents(spark, sf0001).limit(60)
      .select(col("doc_id"),
        sort_array(array_distinct(
          graft.functions.TextFns.tokenHashes(col("text")))).as("ids"))
    val a = t.select(col("doc_id").as("id_a"), col("ids").as("ia"))
    val b = t.select(col("doc_id").as("id_b"), col("ids").as("ib"))
    val diff = a.crossJoin(b)
      .withColumn("merge", SimFns.sortedLongIntersect(col("ia"), col("ib")))
      .withColumn("ref", array_intersect(col("ia"), col("ib")))
      .filter(not(col("merge") <=> col("ref")))
    assert(diff.count() === 0)
  }

  test("bigram kernels == HOF forms on fixture docs, empty-guard edges") {
    import spark.implicits._
    val d = Tables.documents(spark, sf0001).select("text")
      .union(Seq("", "x", "one", "one two", "a  b").toDF("text"))
    val w = tokens(col("text"))
    val refWord = when(size(w) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(w) - 1),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1))))
    val refChar = when(length(col("text")) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(col("text")) - 1),
        i => col("text").substr(i, lit(2))))
    val diff = d
      .withColumn("fw", SimFns.wordBigrams(col("text")))
      .withColumn("rw", refWord)
      .withColumn("fc", SimFns.charBigrams(col("text")))
      .withColumn("rc", refChar)
      .filter(not(col("fw") <=> col("rw")) || not(col("fc") <=> col("rc")))
    assert(diff.count() === 0)
  }

  test("jaro-winkler kernel matches DuckDB's probed values (6 dp) and its edge rules") {
    import graft.functions.SimilarityKernels.{jaroWinkler => jw}
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // probed against DuckDB 1.0 jaro_winkler_similarity this round —
    // the same engine the q161 oracle runs, so these six pins ARE the
    // cross-engine contract
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.961111),      // prefix 3, boost applied
      ("DIXON", "DICKSONX", 0.813333),     // prefix 2
      ("JELLYFISH", "SMELLYFISH", 0.896296), // prefix 0 → pure jaro
      ("DWAYNE", "DUANE", 0.840000),
      ("CRATE", "TRACE", 0.733333),        // transpositions, prefix 0
      ("ab", "ac", 0.666667))              // jaro < 0.7 → NO boost
    cases.foreach { case (a, b, want) =>
      val got = jw(u(a), u(b))
      assert(math.abs(got - want) < 5e-7, s"jw($a,$b)=$got, want $want")
    }
    assert(jw(u("abc"), u("abc")) == 1.0)
    assert(jw(u(""), u("")) == 1.0)
    assert(jw(u(""), u("abc")) == 0.0 && jw(u("a"), u("b")) == 0.0)
    // symmetry on an asymmetric-length pair
    assert(jw(u("DIXON"), u("DICKSONX")) == jw(u("DICKSONX"), u("DIXON")))
  }
}
