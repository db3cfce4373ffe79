package graft

import org.apache.spark.sql.functions._

/** The SQL registration surface: graft's kernel expressions must be
  * callable from spark.sql and agree with the Column API. */
class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions plan the kernel expressions") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  cosine_sim(array(1.0f, 2.0f), array(1.0f, 2.0f)) AS cs,
        |  jaccard_sim(array('a','b','c'), array('b','c','d')) AS js,
        |  char_bigrams('abcd') AS cb,
        |  word_bigrams('x y z') AS wb,
        |  doc_hash(token_hashes('hello world')) AS dh
        |""".stripMargin).head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(row.getDouble(1) - 0.5) < 1e-12)
    assert(row.getSeq[String](2) == Seq("ab", "bc", "cd"))
    assert(row.getSeq[String](3) == Seq("x y", "y z"))
    // same value the Column API computes
    val viaColumn = spark.range(1)
      .select(graft.functions.TextFns.docHash(
        graft.functions.TextFns.tokenHashes(lit("hello world"))).as("dh"))
      .head().getLong(0)
    assert(row.getLong(4) == viaColumn)
  }

  test("GraftExtensions is loadable by the spark.sql.extensions mechanism") {
    // The extensions loader instantiates the class by reflection with a
    // no-arg constructor and applies it to a SparkSessionExtensions;
    // replicate exactly that (a second in-JVM session would just reuse
    // the running one, so config-based wiring can't be exercised here).
    val cls = Class.forName(classOf[GraftExtensions].getName)
    val ext = cls.getConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    ext(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
