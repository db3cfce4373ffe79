package graft

import graft.ops.DedupQueries
import org.apache.spark.sql.functions._

/** The q48/q161 compound-blocking contract: on a block that a single
  * key cannot split (every name shares the noun), the (noun, length
  * band) key + length prefilter must cut candidate pairs by a large
  * constant factor — the difference between within-block pairs growing
  * quadratically with corpus scale and growing with the band census. */
class DedupBlockingSpec extends SparkSpec {

  test("compound (noun, len band) blocking shrinks candidates on a one-noun fixture") {
    import spark.implicits._
    // 400 names, ALL sharing the blocking noun, head lengths spread
    // 1..40 — the worst case for single-key blocking (one giant block)
    val names = (0 until 400)
      .map(i => s"${"x" * (1 + i % 40)} shared tail$i")
      .toDF("p_name")
      .withColumn("noun", element_at(split(col("p_name"), " "), 2))
      .withColumn("len_bkt", (length(col("p_name")) / 8).cast("long"))
    val a = names.select(col("p_name").as("name_a"), col("noun"), col("len_bkt"),
      length(col("p_name")).as("len_a"))
    val b = names.select(col("p_name").as("name_b"), col("noun"), col("len_bkt"),
      length(col("p_name")).as("len_b"))
    val single = a.drop("len_bkt").join(b.drop("len_bkt"), "noun")
      .filter(col("name_a") < col("name_b")).count()
    val compound = a.join(b, Seq("noun", "len_bkt"))
      .filter(col("name_a") < col("name_b"))
      .filter(abs(col("len_a") - col("len_b")) <= 4).count()
    assert(single == 400L * 399 / 2, s"one-noun fixture must be one block: $single")
    assert(compound * 5 < single,
      s"compound blocking must cut candidates >5x: $compound vs $single")
  }

  test("q48 and q161 stay non-degenerate under the compound block") {
    val q48 = DedupQueries.q48FuzzyNames(spark, sf0001)
    assert(q48.count() > 0, "q48 must still find in-band fuzzy pairs")
    val q161 = DedupQueries.q161JaroNames(spark, sf0001)
    assert(q161.count() > 0, "q161 must still find in-band JW pairs")
    // the JW length-ratio prefilter is necessary, never sufficient:
    // every surviving pair satisfies it by construction of the filter;
    // spot-check the bound direction on the output lengths
    val bad = q161.filter(
      least(length(col("name_a")), length(col("name_b"))) * 20 <
        greatest(length(col("name_a")), length(col("name_b"))) * 13).count()
    assert(bad == 0)
  }
}
