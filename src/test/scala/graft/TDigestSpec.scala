package graft

import graft.functions.TDigestAgg
import org.apache.spark.sql.functions._

/** Pins the t-digest guarantees (not fixed centroids — the layout is
  * arrival-order/partitioning-dependent, the accuracy envelope is
  * not): bounded state, rank-error envelopes on uniform and heavily
  * skewed data including the tails, and shard-merge equivalence (the
  * mergeable-summaries property across a real repartition+shuffle).
  */
class TDigestSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq(0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99)

  /** Rank of value v in the sorted data, as a fraction of n. */
  private def rankOf(sorted: Array[Double], v: Double): Double = {
    val below = sorted.count(_ <= v)
    below.toDouble / sorted.length
  }

  private def sketchOf(data: Seq[Double], parts: Int): TDigestAgg.Sketch = {
    val agg = udaf(new TDigestAgg(100))
    data.zipWithIndex.map(_.swap).toDF("i", "v")
      .repartition(parts, col("i"))
      .agg(agg(col("v")).as("td"))
      .select("td.*").as[TDigestAgg.Sketch].collect()(0)
  }

  private def checkEnvelope(data: Seq[Double], parts: Int, tol: Double): Unit = {
    val sk = sketchOf(data, parts)
    val sorted = data.sorted.toArray
    for (q <- qs) {
      val est = TDigestAgg.quantile(sk, q)
      val r = rankOf(sorted, est)
      assert(math.abs(r - q) <= tol,
        s"q=$q est=$est rank=$r (off by ${math.abs(r - q)})")
    }
    assert(sk.means.length <= 220,
      s"state not bounded: ${sk.means.length} centroids")
    assert(sk.ws.sum == data.length, "weights must conserve the count")
  }

  // deterministic pseudo-random doubles (no RNG state in the test)
  private def lcg(n: Int): Seq[Double] =
    (1 to n).map(i => ((i.toLong * 1103515245L + 12345L) % 1000003L)
      .toDouble / 1000003.0)

  test("rank error within 2% on uniform data, single partition") {
    checkEnvelope(lcg(10000), parts = 1, tol = 0.02)
  }

  test("rank error within 2% on uniform data across 16 shards") {
    checkEnvelope(lcg(10000), parts = 16, tol = 0.02)
  }

  test("rank error within 2% on heavily skewed data (x^8)") {
    checkEnvelope(lcg(10000).map(x => math.pow(x, 8)), parts = 8, tol = 0.02)
  }

  test("tails are sharper than the middle budget (k1 pinch)") {
    val data = lcg(20000)
    val sk = sketchOf(data, 8)
    val sorted = data.sorted.toArray
    for (q <- Seq(0.001, 0.999)) {
      val r = rankOf(sorted, TDigestAgg.quantile(sk, q))
      assert(math.abs(r - q) <= 0.005, s"tail q=$q rank=$r")
    }
  }

  test("grouped rollup through a real aggregation") {
    val agg = udaf(new TDigestAgg(100))
    val e = Tables.events(spark, sf0001)
    val sk = e.groupBy("event_type").agg(agg(col("value")).as("td"))
      .select("event_type", "td").as[(String, TDigestAgg.Sketch)]
      .collect().toMap
    val exact = e.select("event_type", "value").as[(String, Double)]
      .collect().groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(_._2).sorted
      }
    for ((et, vals) <- exact; q <- Seq(0.25, 0.5, 0.75)) {
      val est = TDigestAgg.quantile(sk(et), q)
      val r = vals.count(_ <= est).toDouble / vals.length
      assert(math.abs(r - q) <= 0.05, s"$et q=$q rank=$r")
    }
  }
}
