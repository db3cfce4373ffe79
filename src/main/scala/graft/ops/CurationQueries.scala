package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 corpus-curation operators, both oracle-gated: the dedup
  * pipeline run END TO END (LSH candidates → verified near-dup pairs →
  * transitive clusters → keep-one-per-cluster retention report), and a
  * within-document repetition quality filter.
  *
  * Scale notes: q90 composes only sub-quadratic pieces — q51's band-key
  * candidate join (candidates ∝ true near-dups) and the iterative
  * min-label propagation (one hash join per round, shallow dedup
  * clusters converge in 3–5 rounds). The cluster-label table is tiny
  * relative to the corpus (∝ docs that HAVE a near-dup), so the final
  * labeling join broadcasts. q91 is a pure per-row map — embarrassingly
  * parallel, no shuffle until the final order.
  */
object CurationQueries {

  /** The full near-dup dedup pipeline as one operator: q51's verified
    * MinHash/LSH pairs (jaccard ≥ 0.8) transitively closed into
    * clusters, every document labeled with its cluster canonical (the
    * smallest doc_id — unpaired docs are their own canonical), and the
    * per-language retention reported: of n_docs, how many survive
    * keep-one-per-cluster dedup. This is exactly the pre-training
    * curation step "dedup the crawl, keep one representative per
    * near-dup cluster, report what it cost each language's share". */
  def q90DedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = DedupQueries.q51MinHashLsh(s, dir).select("doc_a", "doc_b")
    val comp = ConnectedComponents.components(pairs, "doc_a", "doc_b")
    val d = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
    // labels exist only for docs in some near-dup pair — a small table
    // next to the corpus at any scale, so broadcast the labeling join
    d.join(broadcast(comp), col("doc_id") === col("id"), "left")
      .withColumn("canonical", coalesce(col("component"), col("doc_id")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") === col("canonical"), 1L).otherwise(0L))
          .as("n_kept"))
      .orderBy("lang")
  }

  /** DuckDB mirror: q51's pair SQL (ORDER BY stripped) → RECURSIVE CTE
    * transitive closure → min-reachable label per doc → the same
    * left-join + retention aggregate. CAST(SUM AS BIGINT): DuckDB
    * widens integer SUM to HUGEINT → pandas float64 otherwise. */
  val q90DedupClustersSql: String =
    """WITH RECURSIVE
      |pairs AS (
      |  SELECT doc_a, doc_b FROM (
      |""".stripMargin +
      DedupQueries.q51MinHashLshSql.linesIterator
        .filter(!_.startsWith("ORDER BY")).mkString("\n") +
    """
      |  )),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION SELECT doc_b, doc_a FROM pairs),
      |closure(src, dst) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT c.src, e.dst FROM closure c JOIN edges e ON c.dst = e.src),
      |lbl AS (
      |  SELECT src AS id, MIN(r) AS component FROM (
      |    SELECT src, dst AS r FROM closure
      |    UNION ALL SELECT src, src FROM edges)
      |  GROUP BY src)
      |SELECT d.lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN COALESCE(l.component, d.doc_id) = d.doc_id
      |       THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM documents d LEFT JOIN lbl l ON d.doc_id = l.id
      |GROUP BY d.lang
      |ORDER BY d.lang""".stripMargin

  /** Within-document repetition quality filter — the "degenerate doc"
    * detector (boilerplate, keyboard mash, template spam): fraction of
    * a document's word bigrams that are repeats of an earlier bigram in
    * the same document. Flags docs with ≥ 5% repeated bigrams. Uses the
    * codegen'd bigram kernel; counts cast to long so both engines emit
    * identical int64 columns. */
  def q91Repetition(s: SparkSession, dir: String): DataFrame = {
    val bg = graft.functions.SimFns.wordBigrams(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        size(bg).cast("long").as("n_bigrams"),
        size(array_distinct(bg)).cast("long").as("n_unique"))
      .filter(col("n_bigrams") > 0)
      .withColumn("rep_ratio",
        round(lit(1.0) - col("n_unique").cast("double") / col("n_bigrams"), 4))
      .filter(col("rep_ratio") >= 0.05)
      .select("doc_id", "lang", "n_bigrams", "n_unique", "rep_ratio")
      .orderBy("doc_id")
  }

  val q91RepetitionSql: String =
    """SELECT doc_id, lang, n_bigrams, n_unique,
      |  ROUND(1.0 - CAST(n_unique AS DOUBLE) / n_bigrams, 4) AS rep_ratio
      |FROM (
      |  SELECT doc_id, lang,
      |    CAST(len(bg) AS BIGINT) AS n_bigrams,
      |    CAST(len(list_distinct(bg)) AS BIGINT) AS n_unique
      |  FROM (
      |    SELECT doc_id, lang,
      |      CASE WHEN len(string_split(text,' ')) < 2 THEN []
      |        ELSE list_transform(generate_series(1, len(string_split(text,' ')) - 1),
      |               i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]) END AS bg
      |    FROM documents))
      |WHERE n_bigrams > 0
      |  AND ROUND(1.0 - CAST(n_unique AS DOUBLE) / n_bigrams, 4) >= 0.05
      |ORDER BY doc_id""".stripMargin
}
