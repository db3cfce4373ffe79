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
        |  doc_hash(token_hashes('hello world')) AS dh,
        |  haversine_km(0.0d, 0.0d, 0.0d, 1.0d) AS hv
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
    // haversine_km: SQL registration == static kernel, bit-for-bit
    assert(row.getDouble(5) ==
      graft.functions.MathKernels.haversineKm(0.0, 0.0, 0.0, 1.0))
  }

  test("wrong-typed SQL arguments fail analysis instead of reading garbage") {
    GraftFunctions.register(spark)
    // fp64 arrays are a LEGAL cosine input since round 8 (each side
    // independently float or double); self-similarity must be 1.0
    assert(math.abs(spark.sql(
      "SELECT cosine_sim(array(1.0d, 2.0d), array(1.0d, 2.0d))")
      .head().getDouble(0) - 1.0) < 1e-12)
    // non-floating arrays must still be rejected, not byte-reinterpreted
    val e1 = intercept[Exception](
      spark.sql("SELECT cosine_sim(array('a', 'b'), array('a', 'b'))").head())
    assert(e1.getMessage.contains("cosine_sim"))
    val e2 = intercept[Exception](
      spark.sql("SELECT jaccard_sim(array(1, 2), array(2, 3))").head())
    assert(e2.getMessage.contains("jaccard_sim"))
    val e3 = intercept[Exception](
      spark.sql("SELECT token_hashes(42)").head())
    assert(e3.getMessage.contains("token_hashes"))
  }

  test("guards: rowsPerBand cap and pre-salted skew-join inputs") {
    import spark.implicits._
    intercept[IllegalArgumentException](
      graft.functions.TextFns.bandKeys(col("x"), nBands = 2, rowsPerBand = 3))
    val pre = Seq((1L, 2)).toDF("k", "__salt")
    intercept[IllegalArgumentException](
      graft.ops.SkewJoin.saltedInnerJoin(pre, Seq((1L, "a")).toDF("k", "v"),
        "k", 4))
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
