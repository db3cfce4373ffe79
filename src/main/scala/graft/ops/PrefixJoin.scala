package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lossless prefix-filtering similarity self-join — the AllPairs/PPJoin
  * candidate scheme (Bayardo, Ma, Srikant, "Scaling Up All Pairs
  * Similarity Search", WWW'07 — public literature).
  *
  * Guarantee: for sets A, B sorted by ONE global token order, if
  * jaccard(A,B) >= t then the first |S| - ceil(t*|S|) + 1 tokens of A
  * and of B (their "prefixes") share at least one token. Proof sketch:
  * jac >= t forces |A∩B| >= t*max(|A|,|B|), so A can miss at most
  * |A| - t*|A| of B's tokens; skipping the whole prefix would miss
  * more. Indexing ONLY the prefixes is therefore recall-lossless for
  * threshold t, unlike MinHash bands (probabilistic).
  *
  * Scale shape: tokens are ordered by ascending document frequency, so
  * prefixes hold each document's RAREST tokens and the candidate
  * equi-join buckets are the small ones (a token appearing in f docs
  * yields <= f(f-1)/2 candidate pairs; frequent tokens never reach the
  * index). Work ∝ Σ_rare-token f², versus Σ_block n² for attribute
  * blocking (q49) — the difference between surviving and not surviving
  * a 100× corpus. Everything is hash-partitioned equi-joins and
  * map-side-combinable aggregations; the global order is data (a
  * frequency table), never a driver-side structure.
  *
  * At t = 0.95 the prefix is ~5% of each set + 1 token — the index is
  * ~20× smaller than the corpus token index.
  */
object PrefixJoin {

  /** All pairs (id_a < id_b) with jaccard(tokens) >= t.
    *
    * @param docs   input with one row per document
    * @param idCol  unique id column (orderable)
    * @param tokCol array<string> column; duplicates removed internally
    * @param t      jaccard threshold in (0, 1]
    * @return columns (id_a, id_b, jac) — jac unrounded
    */
  def jaccardJoin(docs: DataFrame, idCol: String, tokCol: String,
      t: Double): DataFrame = {
    require(t > 0.0 && t <= 1.0, s"threshold $t outside (0, 1]")
    val d = docs.select(col(idCol).as("pj_id"),
      array_distinct(col(tokCol)).as("pj_toks"))

    // global token order = (document frequency asc, token asc); computed
    // as data, broadcast only if Spark decides the freq table is small
    val tokDf = d.select(explode(col("pj_toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))

    // re-sort each doc's tokens by the global order
    val ordered = d.select(col("pj_id"), explode(col("pj_toks")).as("tok"))
      .join(tokDf, "tok")
      .groupBy("pj_id")
      .agg(transform(array_sort(collect_list(struct(col("df"), col("tok")))),
        _.getField("tok")).as("toks"))

    // prefix = first |S| - ceil(t|S|) + 1 tokens (rarest-first)
    val pLen: Column = (size(col("toks")) - ceil(lit(t) * size(col("toks"))) + 1)
      .cast("int")
    val indexed = ordered.select(col("pj_id"), col("toks"),
      explode(slice(col("toks"), lit(1), pLen)).as("ptok"))

    val cand = indexed.select(col("pj_id").as("id_a"), col("toks").as("ta"),
        col("ptok"))
      .join(indexed.select(col("pj_id").as("id_b"), col("toks").as("tb"),
        col("ptok")), "ptok")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "ta", "tb").distinct()

    cand.withColumn("jac",
        graft.functions.SimFns.jaccardSim(col("ta"), col("tb")))
      .filter(col("jac") >= t)
      .select("id_a", "id_b", "jac")
  }
}
