package graft

import graft.ops.ApproxTopK
import org.apache.spark.sql.functions._

/** Pins the two-phase top-k contract: exact parity with the full
  * groupBy whenever the k-th frequency clears the MG survival
  * threshold n/(capacity+1), exactness of reported counts in all
  * cases, and the documented flat-distribution failure mode. */
class ApproxTopKSpec extends SparkSpec {
  import spark.implicits._

  private def exactTopK(data: Seq[String], k: Int): Seq[(String, Long)] =
    data.groupBy(identity).map { case (v, xs) => (v, xs.size.toLong) }
      .toSeq.sortBy { case (v, c) => (-c, v) }.take(k)

  test("matches the exact top-10 on a skewed corpus") {
    // zipf-ish: item i repeated (500 / i) times, i = 1..200
    val data = (1 to 200).flatMap(i => Seq.fill(500 / i)(s"w$i"))
    val df = data.zipWithIndex.toDF("v", "i").repartition(8, col("i"))
    val got = ApproxTopK.topK(df, col("v"), k = 10, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exactTopK(data, 10))
  }

  test("words of the document corpus: parity with the exact groupBy") {
    val d = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("w"))
    val exact = d.groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = ApproxTopK.topK(d, col("w"), k = 10, capacity = 512)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exact)
  }

  test("reported counts are exact even when the candidate set is partial") {
    // flat distribution far below the survival threshold: candidates may
    // miss values, but whatever is reported must carry its TRUE count
    val data = (1 to 300).flatMap(i => Seq.fill(3)(s"f$i"))
    val df = data.zipWithIndex.toDF("v", "i").repartition(8, col("i"))
    val got = ApproxTopK.topK(df, col("v"), k = 5, capacity = 8)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    got.foreach { case (v, c) => assert(c == 3L, s"$v reported $c, true 3") }
  }
}
