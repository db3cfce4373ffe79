package graft

import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.functions._

/** The codegen'd hash kernels (HashExprs) must match the portable
  * higher-order-function reference forms bit-for-bit — the DuckDB oracle
  * SQL mirrors the HOF forms, so any divergence here breaks the t2 gate.
  * Checked over every fixture document plus hand-picked edge cases.
  */
class HashKernelSpec extends SparkSpec {
  private val seeds = Seq((37L, 17L), (101L, 29L), (193L, 43L), (271L, 59L),
    (389L, 71L), (577L, 89L), (691L, 97L), (811L, 113L))

  private def docs = Tables.documents(spark, sf0001).select("doc_id", "text")

  test("tokenHashes kernel == HOF reference on all fixture docs") {
    val diff = docs
      .withColumn("fast", tokenHashes(col("text")))
      .withColumn("ref", tokenHashesHof(col("text")))
      .filter(not(col("fast") <=> col("ref")))
    assert(diff.count() === 0)
  }

  test("docHash + shingleHashes kernels == HOF reference on all fixture docs") {
    val th = tokenHashes(col("text"))
    val diff = docs
      .withColumn("fastD", docHash(th)).withColumn("refD", docHashHof(th))
      .withColumn("fastS", shingleHashes(th, 3))
      .withColumn("refS", shingleHashesHof(th, 3))
      .filter(not(col("fastD") <=> col("refD")) ||
        not(col("fastS") <=> col("refS")))
    assert(diff.count() === 0)
  }

  test("minHashSignature + bandKeys kernels == HOF reference") {
    val shd = array_distinct(shingleHashes(tokenHashes(col("text")), 3))
    val diff = docs.filter(size(shingleHashes(tokenHashes(col("text")), 3)) > 0)
      .withColumn("fastM", minHashSignature(shd, seeds))
      .withColumn("refM", minHashSignatureHof(shd, seeds))
      .withColumn("fastB", bandKeys(minHashSignature(shd, seeds), 4, 2))
      .withColumn("refB", bandKeysHof(minHashSignatureHof(shd, seeds), 4, 2))
      .filter(not(col("fastM") <=> col("refM")) ||
        not(col("fastB") <=> col("refB")))
    assert(diff.count() === 0)
  }

  test("featureHashEmbed kernel == HOF reference on all fixture docs") {
    val th = tokenHashes(col("text"))
    val diff = docs
      .withColumn("fast", featureHashEmbed(th, 16))
      .withColumn("ref", featureHashEmbedHof(th, 16))
      .filter(not(col("fast") <=> col("ref")))
    assert(diff.count() === 0)
    // signs actually both occur somewhere in the corpus
    val signs = docs.select(explode(featureHashEmbed(th, 16)).as("v"))
    assert(signs.filter(col("v") > 0).count() > 0)
    assert(signs.filter(col("v") < 0).count() > 0)
  }

  test("kernels == HOF reference on fuzzed ASCII strings (generated)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // printable ASCII incl. repeated spaces — the kernel's documented
    // input domain (fixture corpus is 32..121); fixed seeds keep it
    // deterministic
    val charGen = Gen.frequency(6 -> Gen.choose(33.toChar, 121.toChar),
      1 -> Gen.const(' '))
    val strGen = Gen.choose(0, 40)
      .flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
    val texts = (0 until 300)
      .map(i => strGen.pureApply(Gen.Parameters.default, Seed(1000L + i)))
    val df = texts.toDF("text")
    val th = tokenHashes(col("text"))
    val diff = df
      .withColumn("fT", th).withColumn("rT", tokenHashesHof(col("text")))
      .withColumn("fD", docHash(th)).withColumn("rD", docHashHof(th))
      .withColumn("fS", shingleHashes(th, 3))
      .withColumn("rS", shingleHashesHof(th, 3))
      .filter(not(col("fT") <=> col("rT")) || not(col("fD") <=> col("rD")) ||
        not(col("fS") <=> col("rS")))
    assert(diff.count() === 0)
  }

  test("kernels fold multi-byte codepoints: pinned values + HOF agreement (r15)") {
    import spark.implicits._
    // independent reference: h = fold chars c: (h*31 + codepoint) % P,
    // computed outside the JVM (Python ord()) — 'ä' = 228, '一' = 19968.
    // The kernel iterates by codePointAt; the HOF reference rides
    // Spark's ascii() per split("") char; DuckDB's mirror rides
    // ascii(string_split(t, '')) — q334 oracle-pins that third leg.
    val df = Seq("hällö wörld 一二三").toDF("text")
    val th = tokenHashes(col("text"))
    val row = df.select(th.as("th"), docHash(th).as("dh"),
        tokenHashesHof(col("text")).as("rth"),
        element_at(minHashSignature(th, Seq((37L, 17L))), 1))
      .head()
    assert(row.getSeq[Long](0) == Seq(102945914L, 117340587L, 19832573L))
    assert(row.getLong(1) == 46267150L)
    assert(row.getSeq[Long](2) == row.getSeq[Long](0),
      "HOF ascii() reference diverges from the codepoint kernel on multi-byte")
    assert(row.getLong(3) == 341601708L)
    // fuzzed multi-byte strings: kernel == HOF on mixed-script input
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val charGen = Gen.frequency(
      4 -> Gen.choose(33.toChar, 121.toChar),
      2 -> Gen.oneOf("äöüßáéíóñàèçû一二三四五人大小中".toSeq),
      1 -> Gen.const(' '))
    val strGen = Gen.choose(0, 30)
      .flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
    val texts = (0 until 200)
      .map(i => strGen.pureApply(Gen.Parameters.default, Seed(7000L + i)))
    val fz = texts.toDF("text")
    val diff = fz
      .withColumn("fT", tokenHashes(col("text")))
      .withColumn("rT", tokenHashesHof(col("text")))
      .filter(not(col("fT") <=> col("rT")))
    assert(diff.count() === 0)
  }

  test("kernel edge cases: empty text, repeated/leading/trailing spaces, short docs") {
    import spark.implicits._
    val edge = Seq("", " ", "a", "a b", "  double  space ", "one two",
      "one two three four").toDF("text")
    val checks = edge
      .withColumn("fastT", tokenHashes(col("text")))
      .withColumn("refT", tokenHashesHof(col("text")))
      .withColumn("fastS", shingleHashes(tokenHashes(col("text")), 3))
      .withColumn("refS", shingleHashesHof(tokenHashesHof(col("text")), 3))
    assert(checks.filter(not(col("fastT") <=> col("refT")) ||
      not(col("fastS") <=> col("refS"))).count() === 0)
    // fewer than k tokens -> empty shingle array, not null
    val short = checks.filter(col("text") === "a b").select("fastS").head()
    assert(short.getSeq[Long](0).isEmpty)
  }
}
