package graft

import graft.functions.{UniFns, UnicodeKernels}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins the Unicode kernels' non-ASCII behavior, which q104's oracle
  * can only exercise through the accents it injects itself (the fixture
  * corpus is pure ASCII): composed/decomposed round-trips, the
  * characters that must NOT fold (ß Æ Ø have no combining-mark
  * decomposition — DuckDB strip_accents agrees), idempotence, and the
  * Column-API / SQL-registration paths. All non-ASCII is written as
  * \\u escapes so composed vs decomposed is visible in the source.
  */
class UnicodeSpec extends SparkSpec {

  private def nfc(s: String): String =
    UnicodeKernels.nfc(UTF8String.fromString(s)).toString
  private def fold(s: String): String =
    UnicodeKernels.foldAccents(UTF8String.fromString(s)).toString

  private val composedEcole = "\u00e9cole"     // é c o l e  (5 chars)
  private val decomposedEcole = "e\u0301cole"  // e ́ c o l e (6 chars)

  test("nfc composes decomposed sequences and is idempotent") {
    assert(nfc(decomposedEcole) === composedEcole)
    assert(nfc(composedEcole) === composedEcole)
    assert(nfc(nfc(decomposedEcole)) === composedEcole)
    assert(decomposedEcole.length === 6 && nfc(decomposedEcole).length === 5)
  }

  test("foldAccents strips Latin accents from composed and decomposed forms") {
    assert(fold("\u00e1\u00e9\u00ed\u00f3\u00fa") === "aeiou")
    assert(fold(composedEcole) === "ecole")
    assert(fold(decomposedEcole) === "ecole")
    assert(fold("\u00f1 \u00c7 \u00fc") === "n C u")
  }

  test("characters without combining-mark decompositions pass through") {
    // DuckDB strip_accents agrees: strip_accents('ÆØßñÇ') = 'ÆØßnC'
    assert(fold("\u00c6\u00d8\u00df") === "\u00c6\u00d8\u00df")
    assert(fold("\u00c6\u00d8\u00df\u00f1\u00c7") === "\u00c6\u00d8\u00dfnC")
  }

  test("ascii is a fixed point of both kernels") {
    val s = "plain ascii text 123 %$#"
    assert(nfc(s) === s && fold(s) === s)
  }

  test("Column API: fold(translate-to-accented) round-trips every fixture doc") {
    val d = Tables.documents(spark, sf0001)
    val accented = translate(col("text"), "aeiou", "\u00e1\u00e9\u00ed\u00f3\u00fc")
    val bad = d.filter(not(UniFns.foldAccents(accented) === col("text")))
    assert(bad.count() === 0)
    // and the accent injection is not a no-op: some doc must contain a vowel
    assert(d.filter(accented =!= col("text")).count() > 0)
  }

  test("nulls propagate as nulls through both expressions") {
    val one = spark.range(1)
      .select(lit(null).cast("string").as("s"))
      .select(UniFns.nfcNormalize(col("s")).as("n"), UniFns.foldAccents(col("s")).as("f"))
      .collect()(0)
    assert(one.isNullAt(0) && one.isNullAt(1))
  }

  test("SQL registration: nfc_normalize and fold_accents plan from SQL text") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      s"SELECT fold_accents('$composedEcole') AS f, " +
        s"length(nfc_normalize('e' || '\u0301')) AS n"
    ).collect()(0)
    assert(row.getString(0) === "ecole")
    assert(row.getInt(1) === 1)
  }
}
