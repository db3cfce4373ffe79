package graft.ops

import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators L9–L13 plus the LLM-pipeline text ops
  * (language-ID, quality scoring, token counting, fingerprinting) —
  * SURVEY.md §2.8. Since round 15 the ranked-retrieval members
  * (TF-IDF, BM25, postings, chunking, LM scoring, rank fusion, ranked
  * evaluation) live in [[RetrievalQueries]]; this file keeps the
  * corpus-statistics family (vocabulary laws, divergences, diversity,
  * readability, agreement).
  *
  * Scale notes: every query here is explode → hash-agg — the classic
  * map-side-combinable shape. Token/bigram explosion multiplies rows by
  * ~60× but partial aggregation collapses them before the shuffle, so the
  * exchanged volume is ~|vocab| × |groups|, independent of corpus size.
  * No driver-side collection anywhere.
  */
object TextQueries {
  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  private val stopSql = stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** L9 tokenization + word count: term frequencies per language. */
  def q40WordCount(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.select(col("lang"), explode(tokens(col("text"))).as("word"))
      .groupBy("lang", "word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "word")
  }

  val q40WordCountSql: String =
    """SELECT lang, word, COUNT(*) AS cnt
      |FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY lang, word ORDER BY lang, word""".stripMargin

  /** L10 stopword filter + top-5 non-stop terms per language
    * (deterministic tie-break on the word itself). */
  def q41TopTerms(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val counts = d
      .select(col("lang"), explode(tokens(col("text"))).as("word"))
      .filter(!col("word").isin(stopwords: _*))
      .groupBy("lang", "word")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("word"))
    counts.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .orderBy("lang", "rnk")
  }

  val q41TopTermsSql: String =
    s"""SELECT lang, word, cnt, rnk FROM (
       |  SELECT lang, word, cnt,
       |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, word) AS rnk
       |  FROM (SELECT lang, word, COUNT(*) AS cnt
       |        FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
       |        WHERE word NOT IN $stopSql
       |        GROUP BY lang, word))
       |WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin

  /** L11 n-grams: corpus-wide bigram counts (guarded for 1-token docs;
    * Spark `sequence` would count DOWN on start>stop — SURVEY.md §2.7). */
  def q42Bigrams(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val bigrams = graft.functions.SimFns.wordBigrams(col("text"))
    d.select(explode(bigrams).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bigram")
  }

  val q42BigramsSql: String =
    """SELECT bigram, COUNT(*) AS cnt FROM (
      |  SELECT unnest(CASE WHEN len(string_split(text,' ')) < 2 THEN []
      |    ELSE list_transform(generate_series(1, len(string_split(text,' ')) - 1),
      |           i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]) END) AS bigram
      |  FROM documents)
      |GROUP BY bigram ORDER BY bigram""".stripMargin

  /** L13 text stats: per-language corpus profile. */
  def q44TextStats(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        round(avg(size(tokens(col("text")))), 4).as("avg_words"),
        max(col("n_chars")).as("max_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("lang")
  }

  val q44TextStatsSql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  ROUND(AVG(n_chars), 4) AS avg_chars,
      |  ROUND(AVG(len(string_split(text,' '))), 4) AS avg_words,
      |  MAX(n_chars) AS max_chars,
      |  COUNT(DISTINCT source) AS n_sources
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Language-ID by character-bigram profile: build a top-20 bigram
    * profile per labelled language from the corpus, then classify each
    * doc by profile overlap (argmax, tie-break lang asc). Emits the
    * confusion matrix. Entirely relational — the "model" is a 100-row
    * broadcast table, so classification scales linearly with the corpus. */
  def q45LangId(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val bg = d.select(col("doc_id"), col("lang"),
      explode(graft.functions.SimFns.charBigrams(col("text"))).as("b"))
    val prof = bg.groupBy("lang", "b").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("b"))))
      .filter(col("rn") <= 20)
      .select(col("lang").as("cand_lang"), col("b"))
    // per-doc distinct bigrams never need a shuffle: dedupe inside the
    // array before exploding instead of a global distinct()
    val docBg = d.select(col("doc_id"),
      explode(array_distinct(graft.functions.SimFns.charBigrams(col("text"))))
        .as("b"))
    val score = docBg.join(broadcast(prof), "b")
      .groupBy("doc_id", "cand_lang").agg(count(lit(1)).as("ov"))
    val pred = score.withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("ov").desc, col("cand_lang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("cand_lang").as("pred_lang"))
    d.join(pred, "doc_id")
      .groupBy(col("lang").as("actual_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy("actual_lang", "pred_lang")
  }

  val q45LangIdSql: String =
    """WITH bg AS (
      |  SELECT doc_id, lang,
      |    unnest(list_transform(generate_series(1, length(text) - 1),
      |      i -> substr(text, i, 2))) AS b
      |  FROM documents),
      |prof AS (
      |  SELECT lang AS cand_lang, b FROM (
      |    SELECT lang, b, ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY COUNT(*) DESC, b) AS rn
      |    FROM bg GROUP BY lang, b)
      |  WHERE rn <= 20),
      |docbg AS (SELECT DISTINCT doc_id, b FROM bg),
      |score AS (
      |  SELECT d.doc_id, p.cand_lang, COUNT(*) AS ov
      |  FROM docbg d JOIN prof p USING (b) GROUP BY 1, 2),
      |pred AS (
      |  SELECT doc_id, cand_lang AS pred_lang FROM (
      |    SELECT doc_id, cand_lang,
      |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY ov DESC, cand_lang) AS rn
      |    FROM score)
      |  WHERE rn = 1)
      |SELECT d.lang AS actual_lang, p.pred_lang, COUNT(*) AS n
      |FROM documents d JOIN pred p USING (doc_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Quality scoring + token counting per document: whitespace tokens, a
    * BPE-ish regex token count, stopword ratio, distinct ratio, and a
    * composite quality score — all codegen'd builtins, no UDF. */
  def q46Quality(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val w = tokens(col("text"))
    // All rounded ratios are computed with integer half-up division —
    // floor((2*a*10^4 + b) / (2*b)) — so both engines round the same
    // rational, never a float on a .xxxx5 ulp boundary (the q46 lesson:
    // Spark round() is decimal HALF_UP, DuckDB's is not).
    def r4(num: Column, den: Column): Column = {
      // floor((2a+b)/(2b)) via subtract-remainder: h - h%d is exactly
      // divisible, operands < 2^53, so the double division is exact.
      val h = num * 20000L + den
      val d2 = den * 2L
      (((h - pmod(h, d2)) / d2).cast("long") / 10000.0)
    }
    val nTok = size(w).cast("long")
    val nStop = size(filter(w, t => t.isin(stopwords: _*))).cast("long")
    val nDistinct = size(array_distinct(w)).cast("long")
    // quality = 0.4*min(nc,500)/500 + 0.3*(t-s)/t + 0.3*d/t, as one
    // exact rational num/den with den = 5000*t.
    val m = least(col("n_chars"), lit(500L)).cast("long")
    val qNum = m * 4L * nTok + (nTok - nStop) * 1500L + nDistinct * 1500L
    val qDen = nTok * 5000L
    d.select(
        col("doc_id"),
        nTok.as("n_ws_tokens"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[^a-z ]', 0)"))
          .cast("long").as("n_bpe_tokens"),
        r4(nStop, nTok).as("stop_ratio"),
        r4(nDistinct, nTok).as("distinct_ratio"),
        r4(qNum, qDen).as("quality"))
      .orderBy("doc_id")
  }

  val q46QualitySql: String = {
    def r4(num: String, den: String): String =
      s"(($num * 20000 + $den) // (($den) * 2)) / 10000.0"
    val t = "len(string_split(text,' '))"
    val st = s"len(list_filter(string_split(text,' '), x -> x IN $stopSql))"
    val d = "len(list_distinct(string_split(text,' ')))"
    val qNum = s"(least(n_chars, 500) * 4 * $t + ($t - $st) * 1500 + $d * 1500)"
    val qDen = s"($t * 5000)"
    s"""SELECT doc_id,
       |  $t AS n_ws_tokens,
       |  len(regexp_extract_all(lower(text), '[a-z]+|[^a-z ]')) AS n_bpe_tokens,
       |  ${r4(st, t)} AS stop_ratio,
       |  ${r4(d, t)} AS distinct_ratio,
       |  ${r4(qNum, qDen)} AS quality
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Document fingerprinting: order-sensitive whole-doc polynomial hash
    * plus a winnowing-style min-3-token-shingle fingerprint (the rolling
    * hash). Portable int64 math — see TextFns. */
  def q47Fingerprint(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val th = tokenHashes(col("text"))
    val sh = shingleHashes(th, 3)
    d.select(
        col("doc_id"),
        docHash(th).as("doc_hash"),
        array_min(sh).as("min_shingle"),
        size(array_distinct(sh)).as("n_shingles"))
      .orderBy("doc_id")
  }

  val q47FingerprintSql: String = {
    val th = tokenHashesSql("text")
    s"""SELECT doc_id,
       |  ${docHashSql("th")} AS doc_hash,
       |  list_min(sh) AS min_shingle,
       |  CAST(len(list_distinct(sh)) AS INTEGER) AS n_shingles
       |FROM (
       |  SELECT doc_id, th,
       |    CASE WHEN len(th) < 3 THEN CAST([] AS BIGINT[])
       |      ELSE list_transform(generate_series(1, len(th) - 2),
       |             i -> ${docHashSql("th[i:i+2]")}) END AS sh
       |  FROM (SELECT doc_id, $th AS th FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  /** Deterministic train/val/test split — the dataset-assembly op every
    * training pipeline needs. Assignment is a pure function of the id
    * (multiplicative hash mod 100), so it is reproducible, join-free,
    * and stable under reruns and repartitioning; emits per-(lang, split)
    * counts. */
  def q71SplitAssign(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val bucket = pmod(col("doc_id") * 2654435761L, lit(100L))
    val split = when(bucket < 80, "train")
      .when(bucket < 90, "val").otherwise("test")
    d.withColumn("split", split)
      .groupBy("lang", "split").agg(count(lit(1)).as("n"))
      .orderBy("lang", "split")
  }

  val q71SplitAssignSql: String =
    """SELECT lang, split, COUNT(*) AS n FROM (
      |  SELECT lang, CASE
      |    WHEN ((doc_id * 2654435761) % 100 + 100) % 100 < 80 THEN 'train'
      |    WHEN ((doc_id * 2654435761) % 100 + 100) % 100 < 90 THEN 'val'
      |    ELSE 'test' END AS split
      |  FROM documents)
      |GROUP BY lang, split ORDER BY lang, split""".stripMargin

  /** Stratified deterministic sample: 5 documents per language, chosen
    * by ranking a per-row hash inside each stratum — the reproducible,
    * shuffle-once alternative to rand()-based sampling. */
  def q72StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val h = pmod(col("doc_id") * 1103515245L + 12345L, lit(1000000007L))
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    d.withColumn("h", h)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("lang", "rn", "doc_id", "source")
      .orderBy("lang", "rn")
  }

  val q72StratifiedSampleSql: String =
    """SELECT lang, rn, doc_id, source FROM (
      |  SELECT lang, doc_id, source,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY ((doc_id * 1103515245 + 12345) % 1000000007 + 1000000007) % 1000000007, doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 5 ORDER BY lang, rn""".stripMargin

  /** Feature-hash ("hashing trick", Weinberger et al., ICML 2009)
    * document embeddings — the model-free way to get a fixed-width
    * vector per document for clustering / similarity when no learned
    * encoder is in the pipeline: each token's hash picks one of 16
    * signed buckets. Bucket counts are INTEGERS, so the cross-engine
    * hash is exact; l2-normalizing to floats (what AnnIvf consumes) is
    * an engine-local step deliberately outside the oracle.
    *
    * Scale: one codegen'd kernel pass per row, O(tokens + dim) — no
    * explode, no shuffle before the output sort. The HOF/DuckDB
    * mirrors are O(dim·tokens); bit-equality with the kernel is
    * pinned in HashKernelSpec (the q47/q51 discipline). */
  def q108HashEmbed(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.select(col("doc_id"),
        featureHashEmbed(tokenHashes(col("text")), 16).as("emb"))
      .select(col("doc_id"),
        // the driver's hasher rejects raw list columns — serialize
        array_join(col("emb"), ",").as("emb_csv"),
        size(filter(col("emb"), x => x =!= 0L)).as("nnz"),
        aggregate(col("emb"), lit(0L), (a, x) => a + abs(x)).as("l1"))
      .orderBy("doc_id")
  }

  val q108HashEmbedSql: String = {
    val th = tokenHashesSql("text")
    val emb = featureHashEmbedSql("th", 16)
    s"""SELECT doc_id, array_to_string(emb, ',') AS emb_csv,
       |  CAST(len(list_filter(emb, x -> x != 0)) AS INTEGER) AS nnz,
       |  CAST(list_sum(list_transform(emb, x -> abs(x))) AS BIGINT) AS l1
       |FROM (SELECT doc_id, $emb AS emb
       |      FROM (SELECT doc_id, $th AS th FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  /** PMI collocation mining — the classic statistical measure for
    * "these two words form a unit" (Church & Hanks, CL 1990): for
    * bigram (x, y), PMI = ln( p(x,y) / (p(x)·p(y)) ) with p(x,y) over
    * the bigram-instance total and p(x) over the unigram total. High
    * PMI + a minimum-count floor (here n_xy ≥ 5, the standard guard
    * against one-off pairs) surfaces multiword expressions for
    * tokenizer/vocab construction.
    *
    * Parity: all counts are exact integers; the totals are computed
    * once (one scan-level agg riding an in-plan 1-row broadcast onto
    * the filtered bigram table, q242 form since r13), so both
    * engines evaluate ln on the identically-associated double
    * expression; ln's cross-libm divergence is ≤ ulps, eight orders
    * below the round(4) grid except at measure-zero boundaries. The
    * final order sorts the ROUNDED pmi (then bigram), so ordering and
    * values are forced together.
    *
    * Scale: bigram and unigram counting are explode → map-side-combined
    * hash aggs; the two unigram joins carry NO broadcast hint — a
    * unigram vocab is small for one corpus and huge for the web, the
    * q123/KCore size-flip AQE's runtime selection owns (a forced hint
    * would OOM on a billion-type vocab); top-25 via
    * TakeOrderedAndProject. Totals need one extra pass over doc
    * lengths, not over the pair space. */
  def q121Pmi(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.SimFns
    val d = Tables.documents(s, dir)
    // corpus totals in-plan (r13, closing the .head() sweep): a 1-row
    // broadcast onto the filtered bigram table (q242 form) — the ln
    // argument keeps the identical association, nb/nu now read from
    // columns instead of interpolated literals
    val tot = d.select(size(tokens(col("text"))).as("nw"))
      .agg(sum(greatest(col("nw") - 1, lit(0))).as("nb"),
        sum(col("nw")).as("nu"))
    val bi = d.select(explode(SimFns.wordBigrams(col("text"))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= 5)
    val uni = d.select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n_w"))
    val w1 = uni.select(col("w").as("w1"), col("n_w").as("n_w1"))
    val w2 = uni.select(col("w").as("w2"), col("n_w").as("n_w2"))
    bi.withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(w1, "w1")
      .join(w2, "w2")
      .crossJoin(broadcast(tot))
      .withColumn("pmi", expr(
        "round(ln((cast(n_xy as double) * nu * nu) / " +
          "(cast(nb as double) * n_w1 * n_w2)), 4)"))
      .select("bigram", "n_xy", "pmi")
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(25)
  }

  val q121PmiSql: String =
    """WITH tot AS (
      |  SELECT CAST(SUM(GREATEST(len(string_split(text,' ')) - 1, 0)) AS BIGINT) AS nb,
      |         CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS nu
      |  FROM documents),
      |bi AS (
      |  SELECT bigram, COUNT(*) AS n_xy FROM (
      |    SELECT unnest(CASE WHEN len(string_split(text,' ')) < 2 THEN []
      |      ELSE list_transform(generate_series(1, len(string_split(text,' ')) - 1),
      |             i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]) END) AS bigram
      |    FROM documents)
      |  GROUP BY bigram HAVING COUNT(*) >= 5),
      |uni AS (
      |  SELECT w, COUNT(*) AS n_w FROM (
      |    SELECT unnest(string_split(text,' ')) AS w FROM documents)
      |  GROUP BY w)
      |SELECT b.bigram, b.n_xy,
      |  ROUND(LN((CAST(b.n_xy AS DOUBLE) * t.nu * t.nu) /
      |           (CAST(t.nb AS DOUBLE) * u1.n_w * u2.n_w)), 4) AS pmi
      |FROM bi b
      |CROSS JOIN tot t
      |JOIN uni u1 ON string_split(b.bigram, ' ')[1] = u1.w
      |JOIN uni u2 ON string_split(b.bigram, ' ')[len(string_split(b.bigram, ' '))] = u2.w
      |ORDER BY pmi DESC, bigram LIMIT 25""".stripMargin

  /** Distinct-n lexical diversity per source — distinct-1 (unique
    * words / word occurrences) and distinct-2 (unique bigrams / bigram
    * occurrences), the standard repetitiveness screen for generated or
    * boilerplate-heavy corpora (Li et al., NAACL 2016): a source whose
    * distinct-2 collapses is template spam even when its vocabulary
    * looks healthy. Complements q91 (within-doc repetition) with the
    * across-source view.
    *
    * Parity: four exact integer counts per source; two divisions at
    * output. Scale: two explode → map-side-combinable distinct/count
    * aggs per source — no joins, no windows. */
  def q144Diversity(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.SimFns
    val d = Tables.documents(s, dir)
    val uni = d.select(col("source"), explode(tokens(col("text"))).as("w"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("w")).as("n_distinct_1"))
    val bi = d.select(col("source"),
        explode(SimFns.wordBigrams(col("text"))).as("g"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_bigrams"),
        countDistinct(col("g")).as("n_distinct_2"))
    uni.join(bi, "source")
      .select(col("source"), col("n_tokens"), col("n_distinct_1"),
        col("n_bigrams"), col("n_distinct_2"),
        round(col("n_distinct_1").cast("double") / col("n_tokens"), 4)
          .as("distinct_1"),
        round(col("n_distinct_2").cast("double") / col("n_bigrams"), 4)
          .as("distinct_2"))
      .orderBy("source")
  }

  val q144DiversitySql: String =
    """WITH u AS (
      |  SELECT source, COUNT(*) AS n_tokens,
      |    COUNT(DISTINCT w) AS n_distinct_1
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  GROUP BY source),
      |b AS (
      |  SELECT source, COUNT(*) AS n_bigrams,
      |    COUNT(DISTINCT g) AS n_distinct_2
      |  FROM (
      |    SELECT source,
      |      unnest(CASE WHEN len(string_split(text,' ')) < 2 THEN []
      |        ELSE list_transform(generate_series(1, len(string_split(text,' ')) - 1),
      |               i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]) END) AS g
      |    FROM documents)
      |  GROUP BY source)
      |SELECT u.source, n_tokens, n_distinct_1, n_bigrams, n_distinct_2,
      |  ROUND(CAST(n_distinct_1 AS DOUBLE) / n_tokens, 4) AS distinct_1,
      |  ROUND(CAST(n_distinct_2 AS DOUBLE) / n_bigrams, 4) AS distinct_2
      |FROM u JOIN b ON u.source = b.source
      |ORDER BY u.source""".stripMargin

  /** Frequency-truncated vocabulary coverage per language — what share
    * of token OCCURRENCES a top-k corpus vocabulary covers (k = 100,
    * 1000): the vocab-size/OOV-rate trade-off curve a tokenizer design
    * starts from (the L45 BPE training step chooses its merge budget
    * against exactly this curve), and the per-language split exposes
    * which languages a shared vocabulary under-serves.
    *
    * Parity: vocabulary rank is a total (count desc, word) order;
    * coverage sums are exact integers; two divisions at output.
    *
    * Scale: corpus-wide word counts collapse in one map-side hash agg
    * (vocabulary-sized output); the rank window runs over the
    * VOCABULARY, not the corpus; the per-language coverage join is
    * vocabulary-keyed. Nothing touches fact-scale rows twice. */
  def q145VocabCoverage(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val occ = d.select(col("lang"), explode(tokens(col("text"))).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("n"))
    val vocab = occ.groupBy("w").agg(sum("n").as("tot"))
    val ranked = vocab.withColumn("rnk",
      row_number().over(Window.orderBy(col("tot").desc, col("w"))))
    occ.join(ranked.select("w", "rnk"), "w")
      .groupBy("lang")
      .agg(sum("n").as("n_tokens"),
        sum(when(col("rnk") <= 100, col("n")).otherwise(0L)).as("cov100"),
        sum(when(col("rnk") <= 1000, col("n")).otherwise(0L)).as("cov1000"))
      .select(col("lang"), col("n_tokens"),
        round(col("cov100").cast("double") / col("n_tokens"), 4)
          .as("coverage_top100"),
        round(col("cov1000").cast("double") / col("n_tokens"), 4)
          .as("coverage_top1000"))
      .orderBy("lang")
  }

  val q145VocabCoverageSql: String =
    """WITH occ AS (
      |  SELECT lang, w, COUNT(*) AS n
      |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  GROUP BY lang, w),
      |ranked AS (
      |  SELECT w, ROW_NUMBER() OVER (ORDER BY SUM(n) DESC, w) AS rnk
      |  FROM occ GROUP BY w)
      |SELECT lang, CAST(SUM(n) AS BIGINT) AS n_tokens,
      |  ROUND(CAST(SUM(CASE WHEN rnk <= 100 THEN n ELSE 0 END) AS DOUBLE)
      |    / SUM(n), 4) AS coverage_top100,
      |  ROUND(CAST(SUM(CASE WHEN rnk <= 1000 THEN n ELSE 0 END) AS DOUBLE)
      |    / SUM(n), 4) AS coverage_top1000
      |FROM occ JOIN ranked USING (w)
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** First-occurrence n-gram novelty — for each document, the fraction
    * of its distinct word 3-grams never seen in any EARLIER document
    * (by doc_id, the corpus's ingest order). This is the running-
    * novelty signal a curation pipeline uses to spot boilerplate waves
    * (novelty collapses when a template floods the crawl) and to
    * prioritize genuinely-new text in data mixing; the complement of
    * q87's contamination (which screens against a fixed held-out set,
    * not the corpus's own past).
    *
    * Parity: "novel" = this doc IS the minimum doc_id holding the
    * gram — an exact integer min, no timestamps; the fraction uses the
    * exact half-up integer division from q100/q46 so no double ever
    * hits a rounding boundary. Per-doc grams are deduped inside the
    * array (array_distinct before explode — no extra shuffle).
    *
    * Scale: one gram-keyed window (min over the partition) + one
    * doc-keyed agg — two shuffles of the distinct (doc, gram) pairs;
    * no joins, no pairwise anything. The gram shuffle is the inverted
    * index's natural build, identical to q100/q116's backbone. */
  def q154NgramNovelty(s: SparkSession, dir: String): DataFrame = {
    val withWs = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
    val grams = transform(sequence(lit(1), size(col("ws")) - 2), i =>
      concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1),
        element_at(col("ws"), i + 2)))
    val g = withWs.select(col("doc_id"),
      explode(array_distinct(grams)).as("gram"))
    val per = g
      .withColumn("first_doc",
        min(col("doc_id")).over(Window.partitionBy("gram")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
    val h = col("n_novel") * 20000L + col("n_grams")
    val d2 = col("n_grams") * 2L
    per.select(col("doc_id"), col("n_grams"), col("n_novel"),
      (((h - pmod(h, d2)) / d2).cast("long") / 10000.0).as("novelty"))
      .orderBy("doc_id")
  }

  /** Vocabulary drift as an EXACT total-variation distance — the
    * corpus-shift monitor for text: TV(P, Q) = ½·Σ_w |p_w − q_w|
    * between the word distributions of two corpus slices (here the
    * even/odd doc_id halves per language — the SPLIT-HALF form, which
    * measures the sampling-noise floor that any real temporal/source
    * drift must exceed to mean anything; q146's PSI is the numeric-
    * feature counterpart).
    *
    * The parity trick is the whole point: a naive Σ of double
    * |c1/n1 − c2/n2| terms is an ORDER-DEPENDENT float sum (FIXTURES
    * hazard 2 — Spark partial aggregation vs DuckDB's sequential fold
    * disagree in the last bits). Rewriting each term over the common
    * denominator, |p − q| = |c1·n2 − c2·n1| / (n1·n2), makes the
    * numerator an exact int64 the engines sum identically in any
    * order; ONE half-up integer division at the end produces the
    * 4-decimal TV. Bounds: Σ|c1·n2 − c2·n1| ≤ 2·n1·n2 (~2×10⁹ at
    * sf0.1) and the half-up form multiplies by 2×10⁴ — comfortably
    * int64 through ~SF100, DECIMAL(38,0) is the documented swap above.
    *
    * Scale: explode → (lang, word) map-side-combinable count (the
    * §2.8 backbone); per-language totals come from a ≤|langs|-row
    * `groupBy` aggregate BROADCAST-joined back (the q146/q93 pattern)
    * — not a lang-partition window, which would shuffle the whole
    * vocabulary onto |langs| reducers; then one ≤|langs|-group agg. */
  def q160VocabDrift(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(col("lang"), (pmod(col("doc_id"), lit(2)) === 0).as("h1"),
        explode(split(col("text"), " ")).as("w"))
    val wc = tok.groupBy("lang", "w").agg(
      sum(when(col("h1"), 1L).otherwise(0L)).as("c1"),
      sum(when(!col("h1"), 1L).otherwise(0L)).as("c2"))
    val totals = wc.groupBy("lang")
      .agg(sum("c1").as("n1"), sum("c2").as("n2"))
    val wt = wc.join(broadcast(totals), "lang")
      .withColumn("num", abs(col("c1") * col("n2") - col("c2") * col("n1")))
    val agg = wt.groupBy("lang").agg(
      max("n1").as("n1"), max("n2").as("n2"),
      count(lit(1)).as("n_vocab"), sum("num").as("s"))
    val den = col("n1") * col("n2") * 2L
    val h = col("s") * 20000L + den
    agg.select(col("lang"), col("n1"), col("n2"), col("n_vocab"),
        (((h - pmod(h, den * 2L)) / (den * 2L)).cast("long") / 10000.0)
          .as("tv_dist"))
      .orderBy("lang")
  }

  val q160VocabDriftSql: String =
    """WITH tok AS (
      |  SELECT lang, (doc_id % 2 = 0) AS h1,
      |    unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |wc AS (
      |  SELECT lang, w,
      |    CAST(SUM(CASE WHEN h1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(SUM(CASE WHEN NOT h1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
      |  FROM tok GROUP BY lang, w),
      |wt AS (
      |  SELECT lang, c1, c2,
      |    CAST(SUM(c1) OVER (PARTITION BY lang) AS BIGINT) AS n1,
      |    CAST(SUM(c2) OVER (PARTITION BY lang) AS BIGINT) AS n2
      |  FROM wc),
      |agg AS (
      |  SELECT lang, MAX(n1) AS n1, MAX(n2) AS n2,
      |    COUNT(*) AS n_vocab,
      |    CAST(SUM(ABS(c1 * n2 - c2 * n1)) AS BIGINT) AS s
      |  FROM wt GROUP BY lang)
      |SELECT lang, n1, n2, n_vocab,
      |  ((s * 20000 + n1 * n2 * 2) // (n1 * n2 * 4)) / 10000.0 AS tv_dist
      |FROM agg ORDER BY lang""".stripMargin

  val q154NgramNoveltySql: String =
    """WITH w AS (
      |  SELECT doc_id, ws FROM
      |    (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 3),
      |g0 AS (
      |  SELECT doc_id,
      |    ws[pos] || ' ' || ws[pos+1] || ' ' || ws[pos+2] AS gram
      |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS pos
      |        FROM w)),
      |g AS (SELECT DISTINCT doc_id, gram FROM g0),
      |t AS (
      |  SELECT doc_id, gram,
      |    MIN(doc_id) OVER (PARTITION BY gram) AS first_doc
      |  FROM g),
      |per AS (
      |  SELECT doc_id, COUNT(*) AS n_grams,
      |    CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_novel
      |  FROM t GROUP BY doc_id)
      |SELECT doc_id, n_grams, n_novel,
      |  ((n_novel * 20000 + n_grams) // (n_grams * 2)) / 10000.0 AS novelty
      |FROM per ORDER BY doc_id""".stripMargin

  /** L108 Zipf rank–frequency fit per language: ln(count) regressed on
    * ln(rank) over the top-500 head — slope ≈ −1 is Zipf's law; the
    * deviation is a corpus-health signal (too flat = shuffled/duplicated
    * boilerplate, too steep = tiny effective vocabulary). Rank ties
    * break on the word itself (deterministic on both engines).
    *
    * Scale: the rank window partitions by language over the |vocab|-sized
    * census (corpus-sublinear — the q41 justification); the regression
    * itself runs on ≤500 rows per language via the builtin codegen
    * regr_* aggregates. */
  def q170Zipf(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val wc = d.select(col("lang"), explode(tokens(col("text"))).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("w"))
    wc.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 500)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_ranks"),
        round(regr_slope(log(col("cnt")), log(col("rnk"))), 4).as("zipf_slope"),
        round(regr_intercept(log(col("cnt")), log(col("rnk"))), 4).as("zipf_intercept"),
        round(regr_r2(log(col("cnt")), log(col("rnk"))), 4).as("r2"))
      .orderBy("lang")
  }

  val q170ZipfSql: String =
    """WITH wc AS (
      |  SELECT lang, w, COUNT(*) AS cnt
      |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY lang, w),
      |r AS (
      |  SELECT lang, cnt,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, w) AS rnk
      |  FROM wc)
      |SELECT lang, COUNT(*) AS n_ranks,
      |  ROUND(regr_slope(LN(cnt), LN(rnk)), 4) AS zipf_slope,
      |  ROUND(regr_intercept(LN(cnt), LN(rnk)), 4) AS zipf_intercept,
      |  ROUND(regr_r2(LN(cnt), LN(rnk)), 4) AS r2
      |FROM r WHERE rnk <= 500 GROUP BY lang ORDER BY lang""".stripMargin

  /** L115 Spearman rank correlation between two per-language document
    * rankings (the q171 pair: raw length vs distinct-word richness) —
    * the ranker-agreement diagnostic run before fusing rankers: ρ near
    * 1 means the second signal is redundant, near 0 orthogonal. Ranks
    * are row_numbers with doc_id tie-breaks, hence PERMUTATIONS (no
    * ties), so ρ = 1 − 6Σd²/(n(n²−1)) exactly — Σd² is an exact int64
    * and the final expression is one int64→double division chain
    * (rounded 6dp), a stronger parity guarantee than Pearson-on-ranks
    * via the corr() co-moment kernel.
    *
    * Scale: two lang-partitioned rank windows on one shuffle (the q171
    * shape), then a ≤|langs|-group map-side-combinable agg; n³ stays
    * within int64 up to ~2M docs per language — past that, lift Σd²
    * and n(n²−1) to double with a documented precision trade or
    * decimal(38). */
  def q177Spearman(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val sig = d.select(col("doc_id"), col("lang"), col("n_chars"),
      size(array_distinct(tokens(col("text")))).as("n_uniq"))
    val w1 = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val w2 = Window.partitionBy(col("lang"))
      .orderBy(col("n_uniq").desc, col("doc_id"))
    sig
      .withColumn("dd",
        (row_number().over(w1) - row_number().over(w2)).cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("dd") * col("dd")).as("sum_d2"))
      .select(col("lang"), col("n_docs"), col("sum_d2"),
        round(lit(1.0) - lit(6.0) * col("sum_d2").cast("double") /
            (col("n_docs") * (col("n_docs") * col("n_docs") - 1L)).cast("double"),
          6).as("rho"))
      .orderBy("lang")
  }

  val q177SpearmanSql: String =
    """WITH sig AS (
      |  SELECT doc_id, lang, n_chars,
      |    len(list_distinct(string_split(text, ' '))) AS n_uniq
      |  FROM documents),
      |r AS (
      |  SELECT lang,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id)
      |       - ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_uniq DESC, doc_id)
      |      AS BIGINT) AS dd
      |  FROM sig),
      |a AS (
      |  SELECT lang, COUNT(*) AS n_docs,
      |    CAST(SUM(dd * dd) AS BIGINT) AS sum_d2
      |  FROM r GROUP BY lang)
      |SELECT lang, n_docs, sum_d2,
      |  ROUND(1.0 - 6.0 * CAST(sum_d2 AS DOUBLE)
      |    / CAST(n_docs * (n_docs * n_docs - 1) AS DOUBLE), 6) AS rho
      |FROM a ORDER BY lang""".stripMargin

  /** L117 log-likelihood-ratio keyness (Dunning 1993): which tokens are
    * significantly over/under-represented in one source's documents vs
    * the rest of the corpus — the corpus-comparison statistic PMI
    * (q121, association WITHIN a corpus) and TV drift (q160, whole
    * -distribution distance) don't give: a per-term G² significance
    * ranking, the standard "what characterizes this source?" probe
    * before up/down-weighting it in a training mix.
    *
    * G² = 2·Σ O·ln(O/E) over the focus/rest cells of each token's 2×2
    * table; zero cells contribute 0 (x·ln x → 0). Cross-engine parity
    * by the q103 recipe: every ln argument is a division of two exact
    * int64 products (< 2⁵³ through sf ~10; lift to DECIMAL(38) ratios
    * past that), the two terms sum in fixed order, and the statistic is
    * quantized once to integer micro-units floor(g2·2e6 + 0.5) — so
    * ORDERING and the top-20 cut are exact-integer decisions on both
    * engines, never a last-ulp coin flip. Direction (over vs under) is
    * the exact integer cross-product sign a·NB vs b·NA.
    *
    * Scale: explode → vocab-sized map-side-combinable count (shuffle ∝
    * vocab, Heaps-sublinear); corpus totals are an IN-PLAN 1-row
    * broadcast (q121/q242 form, r14 — this was the last build-time
    * driver action in any query builder): na/nb are per-class token
    * totals, computed straight off documents with a cheap size() agg
    * (no second vocab shuffle) and cross-joined onto the census, so
    * the optimizer sees one plan and nothing runs at construction
    * time; top-20 via TakeOrdered + a 20-row rank window (q105
    * pattern). */
  def q179Keyness(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val tok = d
      .select(when(col("source") === "src0", lit(1L)).otherwise(lit(0L)).as("f"),
        explode(tokens(col("text"))).as("w"))
    val c = tok.groupBy("w")
      .agg(sum(col("f")).as("a"), sum(lit(1L) - col("f")).as("b"))
    // per-class corpus totals: sum of per-doc token counts ≡ sum over
    // the vocab census of a/b, but costs one documents scan instead of
    // a second pass over the exploded tokens
    val tot = d.agg(
      sum(when(col("source") === "src0", size(tokens(col("text"))))
        .otherwise(lit(0))).cast("long").as("na"),
      sum(when(col("source") =!= "src0", size(tokens(col("text"))))
        .otherwise(lit(0))).cast("long").as("nb"))
    val scored = c.filter(col("a") + col("b") >= 5)
      .crossJoin(broadcast(tot))
      .withColumn("k", floor((
        when(col("a") > 0, col("a").cast("double") *
          log((col("a") * (col("na") + col("nb"))).cast("double") /
              (col("na") * (col("a") + col("b"))).cast("double")))
          .otherwise(lit(0.0)) +
        when(col("b") > 0, col("b").cast("double") *
          log((col("b") * (col("na") + col("nb"))).cast("double") /
              (col("nb") * (col("a") + col("b"))).cast("double")))
          .otherwise(lit(0.0))) * lit(2000000.0) + lit(0.5)).cast("long"))
      .withColumn("direction",
        when(col("a") * col("nb") > col("b") * col("na"), lit(1))
          .when(col("a") * col("nb") < col("b") * col("na"), lit(-1))
          .otherwise(lit(0)))
    scored.orderBy(col("k").desc, col("w")).limit(20)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("k").desc, col("w"))))
      .select(col("rnk"), col("w").as("token"), col("a").as("n_focus"),
        col("b").as("n_rest"), col("direction"),
        (col("k").cast("double") / 1000000.0).as("g2"))
      .orderBy("rnk")
  }

  val q179KeynessSql: String =
    """WITH tok AS (
      |  SELECT CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS f,
      |         unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |c AS (
      |  SELECT w, CAST(SUM(f) AS BIGINT) AS a, CAST(SUM(1 - f) AS BIGINT) AS b
      |  FROM tok GROUP BY w),
      |t AS (SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb
      |      FROM c),
      |sc AS (
      |  SELECT w, a, b,
      |    CAST(FLOOR((
      |      CASE WHEN a > 0 THEN a * ln(CAST(a * (t.na + t.nb) AS DOUBLE)
      |        / CAST(t.na * (a + b) AS DOUBLE)) ELSE 0.0 END +
      |      CASE WHEN b > 0 THEN b * ln(CAST(b * (t.na + t.nb) AS DOUBLE)
      |        / CAST(t.nb * (a + b) AS DOUBLE)) ELSE 0.0 END
      |    ) * 2000000.0 + 0.5) AS BIGINT) AS k,
      |    CASE WHEN a * t.nb > b * t.na THEN 1
      |         WHEN a * t.nb < b * t.na THEN -1 ELSE 0 END AS direction
      |  FROM c CROSS JOIN t
      |  WHERE a + b >= 5)
      |SELECT ROW_NUMBER() OVER (ORDER BY k DESC, w) AS rnk, w AS token,
      |  a AS n_focus, b AS n_rest, direction,
      |  CAST(k AS DOUBLE) / 1000000.0 AS g2
      |FROM sc ORDER BY k DESC, w LIMIT 20""".stripMargin

  /** L123 Jensen–Shannon divergence between source unigram
    * distributions (Lin 1991 [PK]) — the bounded, symmetric "how
    * different are these two corpora?" statistic that completes the
    * drift family: PSI (q146) needs binning choices, TV (q160) ignores
    * magnitude structure, G² (q179) ranks individual terms; JS is the
    * single-number pairwise distance the mixture-weighting literature
    * actually reports (and √JS is a metric).
    *
    * Identity that keeps it one equi-join: with f(x) = −x·ln x and
    * Σp = Σq = 1,  JS(p,q) = ln 2 + Σ_{w ∈ supp(p)∩supp(q)}
    * [f((p+q)/2) − f(p/2) − f(q/2)] — the disjoint-support mass
    * contributes exactly ln 2 · (its probability), which telescopes
    * into the constant. So ONLY the vocabulary intersection is ever
    * joined; words private to either source never produce a row.
    *
    * Parity (q179 recipe): probabilities are divisions of exact int64
    * counts; each word's term is quantized once to nano-units
    * floor(term·1e9 + 0.5) so the cross-pair SUM is an exact integer in
    * both engines (partition-order independent), and the output is the
    * same int-over-1e9 division plus the ln 2 literal — identical bits.
    *
    * Scale: one vocab-sized map-side-combinable count, a vocab-keyed
    * self-equi-join whose fan-out is bounded by |sources|² per word,
    * and a ≤C(|sources|,2)-group agg. Nothing grows with corpus size
    * past the vocabulary (Heaps-sublinear). */
  def q185JsDivergence(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val wc = d.select(col("source"), explode(tokens(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("cnt"))
    val tot = d.groupBy("source")
      .agg(sum(size(tokens(col("text"))).cast("long")).as("tot"))
    val p = wc.join(broadcast(tot), "source")
      .select(col("source"), col("w"),
        (col("cnt").cast("double") / col("tot").cast("double")).as("p"))
    def f(x: Column): Column = -x * log(x)
    val a = p.select(col("source").as("src_a"), col("w"), col("p").as("pa"))
    val b = p.select(col("source").as("src_b"), col("w"), col("p").as("pb"))
    val two = lit(2.0)
    val term = f((col("pa") + col("pb")) / two) -
      f(col("pa") / two) - f(col("pb") / two)
    a.join(b, Seq("w")).filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        floor(term * lit(1.0e9) + lit(0.5)).cast("long").as("tq"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared"), sum("tq").as("sq"))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        (col("sq").cast("double") / lit(1.0e9) +
          lit(0.6931471805599453)).as("js"))
      .orderBy("src_a", "src_b")
  }

  val q185JsDivergenceSql: String =
    """WITH wc AS (
      |  SELECT source, w, COUNT(*) AS cnt
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  GROUP BY source, w),
      |tot AS (
      |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tot
      |  FROM documents GROUP BY source),
      |p AS (
      |  SELECT wc.source, w, CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE) AS p
      |  FROM wc JOIN tot ON wc.source = tot.source),
      |t AS (
      |  SELECT a.source AS src_a, b.source AS src_b,
      |    CAST(FLOOR((
      |      -((a.p + b.p) / 2.0) * ln((a.p + b.p) / 2.0)
      |      - (-(a.p / 2.0) * ln(a.p / 2.0))
      |      - (-(b.p / 2.0) * ln(b.p / 2.0))
      |    ) * 1e9 + 0.5) AS BIGINT) AS tq
      |  FROM p a JOIN p b ON a.w = b.w AND a.source < b.source)
      |SELECT src_a, src_b, COUNT(*) AS n_shared,
      |  CAST(SUM(tq) AS DOUBLE) / 1e9 + 0.6931471805599453 AS js
      |FROM t GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin

  /** L125 per-document token entropy — the unigram Shannon entropy
    * quality signal (low entropy ⇔ repetitive/templated text; the
    * Gopher rules in q162 screen symptoms like repeated lines, this
    * scores the underlying distribution directly). Emits raw entropy
    * and the [0,1] normalized form H / ln(n_unique) used for
    * length-independent thresholding.
    *
    * Parity: per-(doc, word) terms quantized to nano-units before the
    * per-doc integer SUM (partition-order independent, the q185
    * discipline); normalization divides that exact integer's /1e9
    * double by ln of an exact int64 — one deterministic IEEE chain.
    *
    * Scale: explode → (doc, word) count → per-doc agg, all map-side
    * combinable; state per doc is its distinct-token count, never the
    * corpus vocabulary. */
  def q187TokenEntropy(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val wc = d.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
    val nt = wc.groupBy("doc_id").agg(sum("cnt").as("n_tokens"),
      count(lit(1)).as("n_unique"))
    val term = -(col("cnt").cast("double") / col("n_tokens").cast("double")) *
      log(col("cnt").cast("double") / col("n_tokens").cast("double"))
    wc.join(nt, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("n_unique"),
        floor(term * lit(1.0e9) + lit(0.5)).cast("long").as("tq"))
      .groupBy("doc_id", "n_tokens", "n_unique")
      .agg(sum("tq").as("sq"))
      .select(col("doc_id"), col("n_tokens"), col("n_unique"),
        (col("sq").cast("double") / lit(1.0e9)).as("entropy"),
        when(col("n_unique") > 1L,
          // nano-quantize: the ln(n_unique) division is the one
          // cross-libm double in the chain (r12 fuzz find: a 300-token
          // adversarial doc diverged in the 16th digit)
          floor((col("sq").cast("double") / lit(1.0e9)) /
            log(col("n_unique").cast("double")) * 1e9 + 0.5) / 1e9)
          .otherwise(lit(0.0)).as("norm_entropy"))
      .orderBy("doc_id")
  }

  val q187TokenEntropySql: String =
    """WITH wc AS (
      |  SELECT doc_id, w, COUNT(*) AS cnt
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  GROUP BY doc_id, w),
      |nt AS (
      |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
      |    COUNT(*) AS n_unique
      |  FROM wc GROUP BY doc_id),
      |q AS (
      |  SELECT wc.doc_id, n_tokens, n_unique,
      |    CAST(FLOOR(
      |      -(CAST(cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE))
      |        * ln(CAST(cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE))
      |      * 1e9 + 0.5) AS BIGINT) AS tq
      |  FROM wc JOIN nt ON wc.doc_id = nt.doc_id)
      |SELECT doc_id, n_tokens, n_unique,
      |  CAST(SUM(tq) AS DOUBLE) / 1e9 AS entropy,
      |  CASE WHEN n_unique > 1
      |    THEN FLOOR((CAST(SUM(tq) AS DOUBLE) / 1e9)
      |      / ln(CAST(n_unique AS DOUBLE)) * 1e9 + 0.5) / 1e9
      |    ELSE 0.0 END AS norm_entropy
      |FROM q GROUP BY doc_id, n_tokens, n_unique ORDER BY doc_id""".stripMargin

  /** L130 bigram conditional entropy per language — H(w₂|w₁) =
    * −Σ p(w₁w₂)·ln(p(w₁w₂)/p(w₁·)), the corpus PREDICTABILITY
    * statistic: how much does knowing the previous word tell you about
    * the next? Complements q187 (per-doc unigram entropy — no sequence
    * structure) and q121 PMI (per-pair association, not a corpus
    * total); low H(w₂|w₁) relative to unigram entropy flags templated /
    * boilerplate corpora before they flood a training mix.
    *
    * Parity: all counts exact int64 (bigram census; the w₁ marginal is
    * the SUM of bigram counts, no second tokenize pass); per-bigram
    * terms nano-quantized before the per-lang integer SUM.
    *
    * Scale: explode → bigram-keyed map-side-combinable count; marginal
    * join is bigram-table × (lang, w₁) equi-join (vocab-keyed); the
    * ≤|langs|-row totals broadcast. Nothing exceeds the bigram-type
    * table, which Heaps-caps well below the corpus. */
  def q192CondEntropy(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val c12 = d.select(col("lang"),
        explode(graft.functions.SimFns.wordBigrams(col("text"))).as("bg"))
      .groupBy("lang", "bg").agg(count(lit(1)).as("c12"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
    val c1 = c12.groupBy("lang", "w1").agg(sum("c12").as("c1"))
    val nb = c12.groupBy("lang").agg(sum("c12").as("nb"))
    val term = -(col("c12").cast("double") / col("nb").cast("double")) *
      log(col("c12").cast("double") / col("c1").cast("double"))
    c12.join(c1, Seq("lang", "w1")).join(broadcast(nb), "lang")
      .select(col("lang"), col("nb"),
        floor(term * lit(1.0e9) + lit(0.5)).cast("long").as("tq"))
      .groupBy("lang")
      .agg(max(col("nb")).as("n_bigrams"),
        count(lit(1)).as("n_bigram_types"),
        (sum("tq").cast("double") / lit(1.0e9)).as("h_cond"))
      .orderBy("lang")
  }

  val q192CondEntropySql: String =
    """WITH bg AS (
      |  SELECT lang, unnest(CASE WHEN len(string_split(text,' ')) < 2 THEN []
      |    ELSE list_transform(generate_series(1, len(string_split(text,' ')) - 1),
      |           i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]) END)
      |    AS bg
      |  FROM documents),
      |c12 AS (
      |  SELECT lang, bg, COUNT(*) AS c12, string_split(bg, ' ')[1] AS w1
      |  FROM bg GROUP BY lang, bg),
      |c1 AS (
      |  SELECT lang, w1, CAST(SUM(c12) AS BIGINT) AS c1
      |  FROM c12 GROUP BY lang, w1),
      |nb AS (
      |  SELECT lang, CAST(SUM(c12) AS BIGINT) AS nb FROM c12 GROUP BY lang),
      |q AS (
      |  SELECT c12.lang, nb,
      |    CAST(FLOOR(
      |      -(CAST(c12 AS DOUBLE) / CAST(nb AS DOUBLE))
      |        * ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))
      |      * 1e9 + 0.5) AS BIGINT) AS tq
      |  FROM c12
      |  JOIN c1 ON c12.lang = c1.lang AND c12.w1 = c1.w1
      |  JOIN nb ON c12.lang = nb.lang)
      |SELECT lang, MAX(nb) AS n_bigrams, COUNT(*) AS n_bigram_types,
      |  CAST(SUM(tq) AS DOUBLE) / 1e9 AS h_cond
      |FROM q GROUP BY lang ORDER BY lang""".stripMargin

  /** L151 Flesch reading-ease readability (Flesch 1948 [PK]; the
    * Kincaid recalibration powers every "grade level" readout): per
    * English document, word / sentence / syllable counts and
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words) — the
    * classical curation signal the Gopher/C4 rules (q162) don't carry:
    * HOW HARD a passage reads, not just whether it's boilerplate.
    *
    * Syllables use the standard regex surrogate — maximal vowel runs
    * [aeiouyAEIOUY]+ per word — which is deterministic and engine-
    * identical for the ASCII fixture corpus (FixtureContractSpec pins
    * ASCII-ness; Java and DuckDB RE2 regexes agree on pure-ASCII
    * character classes). Sentences = maximal [.!?]+ runs, floored at 1.
    *
    * Parity: three exact int64 counts per row; the score is one
    * identical double chain, 4dp. Scale: embarrassingly parallel row
    * map over the codegen'd regexp_count kernel — no shuffle until the
    * final order. */
  def q217Flesch(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).filter(col("lang") === "en")
      .select(col("doc_id"),
        regexp_count(col("text"), lit("[A-Za-z]+")).cast("long").as("n_words"),
        greatest(regexp_count(col("text"), lit("[.!?]+")).cast("long"), lit(1L))
          .as("n_sentences"),
        regexp_count(col("text"), lit("[aeiouyAEIOUY]+")).cast("long")
          .as("n_syllables"))
      .filter(col("n_words") > 0)
    d.select(col("doc_id"), col("n_words"), col("n_sentences"),
      col("n_syllables"),
      (round(lit(206.835)
        - lit(1.015) * col("n_words").cast("double") / col("n_sentences")
        - lit(84.6) * col("n_syllables").cast("double") / col("n_words"), 4)
        + 0.0).as("flesch"))
      .orderBy("doc_id")
  }

  /** L156 Yule's characteristic K (Yule 1944 [PK]): per-language
    * lexical repetitiveness 10⁴·(Σ c_w² − N)/N² over the word-frequency
    * census — the size-robust repetition constant (unlike raw TTR, K is
    * approximately text-length invariant), the single-number cousin of
    * the q145 vocabulary-coverage curve and a standard template/spam
    * signal beside q91's within-document repetition filter.
    *
    * Parity: the frequency census is exact int64; Σ c² rides
    * DECIMAL(38,0)/HUGEINT (a 10⁹-token corpus with a 10⁸-count stop
    * word overflows int64); K is one double chain, 4dp.
    *
    * Scale: the same map-side-combinable (lang, word) census as
    * q40/q170; the K algebra runs on ≤|langs| rows. */
  def q222YuleK(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val wc = Tables.documents(s, dir)
      .select(col("lang"), explode(tokens(col("text"))).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("cnt"))
    wc.groupBy("lang")
      .agg(count(lit(1)).as("n_types"),
        sum(col("cnt")).as("n_tokens"),
        sum(col("cnt").cast(dec) * col("cnt").cast(dec)).as("s2"))
      .select(col("lang"), col("n_tokens"), col("n_types"),
        (round(lit(1.0e4) *
          (col("s2").cast("double") - col("n_tokens").cast("double")) /
          (col("n_tokens").cast("double") * col("n_tokens").cast("double")),
          4) + 0.0).as("yule_k"))
      .orderBy("lang")
  }

  val q222YuleKSql: String =
    """WITH wc AS (
      |  SELECT lang, w, COUNT(*) AS cnt
      |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  GROUP BY lang, w)
      |SELECT lang,
      |  CAST(SUM(cnt) AS BIGINT) AS n_tokens,
      |  COUNT(*) AS n_types,
      |  ROUND(1e4 * (CAST(SUM(CAST(cnt AS HUGEINT) * cnt) AS DOUBLE)
      |      - CAST(SUM(cnt) AS DOUBLE))
      |    / (CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE)), 4) + 0
      |    AS yule_k
      |FROM wc GROUP BY lang ORDER BY lang""".stripMargin

  /** L157 Good–Turing frequency smoothing (Good 1953 [PK]; the
    * count-of-counts estimator behind Katz back-off): per language,
    * the frequency-of-frequencies census V_r for r = 1..5, the
    * smoothed counts r* = (r+1)·V_{r+1}/V_r, and the unseen-mass
    * estimate P₀ = V₁/N — "how much probability belongs to words we
    * have never seen", the vocabulary-openness readout behind the
    * q145 coverage curve and any LM perplexity the corpus feeds.
    * Measured over word BIGRAMS (the Katz back-off unit — and the
    * fixture's unigram vocabulary is CLOSED, so every unigram exceeds
    * r = 5 past sf0.01 and the unigram ladder is empty; the bigram
    * space stays open).
    *
    * Parity: the double census (bigram counts → count-of-counts) is
    * exact int64 end-to-end; r* and P₀ are single double chains, 4/6dp
    * (NULL r* where V_{r+1} = 0 — DuckDB and Spark agree on NULL
    * arithmetic here because the CASE guards it explicitly).
    *
    * Scale: two map-side-combinable censuses (the q192 bigram census
    * collapsed again by count); the V_{r+1} lookup is a lag over the
    * ≤5-row-per-language frequency ladder. */
  def q223GoodTuring(s: SparkSession, dir: String): DataFrame = {
    val wc = Tables.documents(s, dir)
      .select(col("lang"),
        explode(graft.functions.SimFns.wordBigrams(col("text"))).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("cnt"))
    val tot = wc.groupBy("lang")
      .agg(sum(col("cnt")).as("n_tokens"), count(lit(1)).as("n_types"))
    val coc = wc.filter(col("cnt") <= 6)
      .groupBy(col("lang"), col("cnt").as("r"))
      .agg(count(lit(1)).as("v_r"))
    val wNext = Window.partitionBy("lang").orderBy("r")
    coc
      .withColumn("v_r1",
        when(lead(col("r"), 1).over(wNext) === col("r") + 1,
          lead(col("v_r"), 1).over(wNext)).otherwise(lit(0L)))
      .filter(col("r") <= 5)
      .join(broadcast(tot), "lang")
      .select(col("lang"), col("r"), col("v_r"), col("v_r1"),
        when(col("v_r1") > 0,
          round((col("r") + 1).cast("double") * col("v_r1") / col("v_r"), 4)
            + 0.0).as("r_star"),
        when(col("r") === 1,
          round(col("v_r").cast("double") / col("n_tokens"), 6) + 0.0)
          .as("p_unseen"))
      .orderBy("lang", "r")
  }

  val q223GoodTuringSql: String =
    """WITH wc AS (
      |  SELECT lang, w, COUNT(*) AS cnt
      |  FROM (SELECT lang,
      |      unnest(CASE WHEN len(string_split(text,' ')) < 2 THEN []
      |        ELSE list_transform(
      |          generate_series(1, len(string_split(text,' ')) - 1),
      |          i -> string_split(text,' ')[i] || ' '
      |            || string_split(text,' ')[i+1]) END) AS w
      |    FROM documents)
      |  GROUP BY lang, w),
      |tot AS (
      |  SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
      |    COUNT(*) AS n_types
      |  FROM wc GROUP BY lang),
      |coc AS (
      |  SELECT lang, cnt AS r, COUNT(*) AS v_r
      |  FROM wc WHERE cnt <= 6 GROUP BY lang, cnt),
      |lk AS (
      |  SELECT lang, r, v_r,
      |    CASE WHEN LEAD(r, 1) OVER (PARTITION BY lang ORDER BY r) = r + 1
      |      THEN LEAD(v_r, 1) OVER (PARTITION BY lang ORDER BY r)
      |      ELSE 0 END AS v_r1
      |  FROM coc)
      |SELECT lk.lang, r, v_r, CAST(v_r1 AS BIGINT) AS v_r1,
      |  CASE WHEN v_r1 > 0
      |    THEN ROUND(CAST(r + 1 AS DOUBLE) * v_r1 / v_r, 4) + 0 END
      |    AS r_star,
      |  CASE WHEN r = 1
      |    THEN ROUND(CAST(v_r AS DOUBLE) / n_tokens, 6) + 0 END AS p_unseen
      |FROM lk JOIN tot ON lk.lang = tot.lang
      |WHERE r <= 5
      |ORDER BY lk.lang, r""".stripMargin

  val q217FleschSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
      |      AS n_words,
      |    GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT),
      |      1) AS n_sentences,
      |    CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT)
      |      AS n_syllables
      |  FROM documents WHERE lang = 'en')
      |SELECT doc_id, n_words, n_sentences, n_syllables,
      |  ROUND(206.835
      |    - 1.015 * CAST(n_words AS DOUBLE) / n_sentences
      |    - 84.6 * CAST(n_syllables AS DOUBLE) / n_words, 4) + 0 AS flesch
      |FROM d WHERE n_words > 0
      |ORDER BY doc_id""".stripMargin

  /** L169 Bhattacharyya coefficient + Hellinger distance between
    * source unigram distributions (Bhattacharyya 1943, Hellinger [PK]):
    * BC = Σ√(p·q) over the shared vocabulary (disjoint-support terms
    * are exactly 0, so the inner join IS the full sum — cheaper than
    * q185's JS, whose disjoint mass telescopes into a constant), and
    * H = √(1 − BC) — a proper metric in [0,1], the drift family's
    * geometry-respecting member beside PSI (q146), KS (q147), EMD
    * (q182), TV (q160), and JS (q185).
    *
    * Parity: p = cnt/tot is an exact-int division; √(p·q) is IEEE
    * sqrt (correctly rounded, engine-identical); per-term values
    * quantize to nano-units before the integer SUM (q185 discipline,
    * partition-order independent); H = √(max(1−BC, 0)) guards the
    * ≤ n_shared·5e-10 quantization overshoot past BC = 1 identically
    * on both engines.
    *
    * Scale: ONE vocab-keyed self-equi-join with |sources|²-bounded
    * fan-out per word; censuses map-side combinable. */
  def q235Hellinger(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val wc = d.select(col("source"), explode(tokens(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("cnt"))
    val tot = d.groupBy("source")
      .agg(sum(size(tokens(col("text"))).cast("long")).as("tot"))
    val p = wc.join(broadcast(tot), "source")
      .select(col("source"), col("w"),
        (col("cnt").cast("double") / col("tot").cast("double")).as("p"))
    val a = p.select(col("source").as("src_a"), col("w"), col("p").as("pa"))
    val b = p.select(col("source").as("src_b"), col("w"), col("p").as("pb"))
    a.join(b, Seq("w")).filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        floor(sqrt(col("pa") * col("pb")) * lit(1.0e9) + lit(0.5))
          .cast("long").as("tq"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared"), sum("tq").as("sq"))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        (floor(col("sq").cast("double") / lit(1.0e9) * 1e6 + 0.5) / 1e6)
          .as("bc"),
        (round(sqrt(greatest(lit(1.0) -
          col("sq").cast("double") / lit(1.0e9), lit(0.0))), 6) + 0.0)
          .as("hellinger"))
      .orderBy("src_a", "src_b")
  }

  val q235HellingerSql: String =
    """WITH wc AS (
      |  SELECT source, w, COUNT(*) AS cnt
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  GROUP BY source, w),
      |tot AS (
      |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tot
      |  FROM documents GROUP BY source),
      |p AS (
      |  SELECT wc.source, w, CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE) AS p
      |  FROM wc JOIN tot ON wc.source = tot.source),
      |t AS (
      |  SELECT a.source AS src_a, b.source AS src_b,
      |    CAST(FLOOR(SQRT(a.p * b.p) * 1e9 + 0.5) AS BIGINT) AS tq
      |  FROM p a JOIN p b ON a.w = b.w AND a.source < b.source),
      |g AS (
      |  SELECT src_a, src_b, COUNT(*) AS n_shared,
      |    CAST(SUM(tq) AS BIGINT) AS sq
      |  FROM t GROUP BY src_a, src_b)
      |SELECT src_a, src_b, n_shared,
      |  FLOOR(CAST(sq AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6 AS bc,
      |  ROUND(SQRT(GREATEST(1.0 - CAST(sq AS DOUBLE) / 1e9, 0.0)), 6) + 0
      |    AS hellinger
      |FROM g ORDER BY src_a, src_b""".stripMargin

  /** L196 Chao1 richness + Good's coverage (Chao 1984, Good 1953 [PK]):
    * from the word-TRIGRAM frequency spectrum — V observed types, f₁
    * singletons, f₂ doubletons — estimate the UNSEEN phrase inventory
    * (Chao1 = V + f₁(f₁−1)/(2(f₂+1)), bias-corrected form, defined even
    * at f₂ = 0) and the sample coverage C = 1 − f₁/N. The "how much of
    * the language have we actually crawled" diagnostic that turns L74's
    * observed vocabulary curve into an asymptote estimate, on the same
    * spectrum q223's Good–Turing smooths.
    *
    * Parity: V/N/f₁/f₂ exact int64 off the type-count census; the two
    * estimates are one double chain 4dp/6dp.
    *
    * Scale: explode → type-count hash agg (map-side combined) → a
    * 2-level ≤|counts| spectrum agg. Guards: an empty corpus nulls
    * both estimates. */
  def q269Chao1(s: SparkSession, dir: String): DataFrame = {
    // word-TRIGRAM spectrum, not unigrams: the synthetic corpus closes
    // its unigram vocabulary even at sf0.001 (zero singletons — the
    // estimator would be vacuous, the q175 lesson), while the trigram
    // space stays open at every SF (f1 = 9,402 / 9,424 / 207 at
    // sf0.001/0.01/0.1 — measured)
    val tri = Tables.documents(s, dir)
      .select(tokens(col("text")).as("ts"))
      // docs under 3 tokens contribute no trigrams; the filter (not a
      // greatest() clamp) matters because Spark's sequence(1, 0) counts
      // DOWN and would fabricate ghost windows on short/empty docs
      .filter(size(col("ts")) >= 3)
      .select(explode(expr(
        "transform(sequence(1, size(ts) - 2), " +
          "i -> concat_ws(' ', ts[i-1], ts[i], ts[i+1]))")).as("w"))
    val wc = tri.groupBy("w").agg(count(lit(1)).as("c"))
    val g = wc.agg(count(lit(1)).as("v"), sum(col("c")).as("n"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
      sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
    val chao = col("v").cast("double") +
      col("f1").cast("double") * (col("f1") - 1).cast("double") /
        (lit(2.0) * (col("f2") + 1).cast("double"))
    val cov = lit(1.0) - col("f1").cast("double") / col("n").cast("double")
    g.select(col("v").as("n_types"), col("n").as("n_tokens"),
      col("f1").as("singletons"), col("f2").as("doubletons"),
      when(col("n").isNull || col("n") === 0, lit(null).cast("double"))
        .otherwise(round(chao, 4) + 0.0).as("chao1"),
      when(col("n").isNull || col("n") === 0, lit(null).cast("double"))
        .otherwise(round(cov, 6) + 0.0).as("good_coverage"))
  }

  val q269Chao1Sql: String =
    """WITH toks AS (
      |  SELECT string_split(text, ' ') AS ts FROM documents),
      |tri AS (
      |  SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS w
      |  FROM (SELECT ts AS t,
      |          unnest(range(1, greatest(len(ts) - 1, 1))) AS i
      |        FROM toks)),
      |wc AS (SELECT w, COUNT(*) AS c FROM tri GROUP BY w),
      |g AS (
      |  SELECT COUNT(*) AS v, CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
      |    CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      |  FROM wc)
      |SELECT v AS n_types, n AS n_tokens, f1 AS singletons,
      |  f2 AS doubletons,
      |  CASE WHEN n IS NULL OR n = 0 THEN NULL ELSE
      |    ROUND(CAST(v AS DOUBLE) + CAST(f1 AS DOUBLE) * (f1 - 1)
      |      / (2.0 * (f2 + 1)), 4) + 0 END AS chao1,
      |  CASE WHEN n IS NULL OR n = 0 THEN NULL ELSE
      |    ROUND(1.0 - CAST(f1 AS DOUBLE) / n, 6) + 0 END AS good_coverage
      |FROM g""".stripMargin

  /** L197 term dispersion DP (Gries 2008 [PK]): for each frequent term,
    * DP = Σᵢ|vᵢ − sᵢ|/2 over corpus parts (sources) — vᵢ the term's
    * occurrence share in part i, sᵢ the part's token share. DP ≈ 0 ⇒
    * the term is spread as the corpus is; DP → 1 ⇒ it lives in one
    * part — the burstiness screen that separates topical spike terms
    * from core vocabulary, which raw frequency (L10) cannot see.
    *
    * Parity: shares are exact int64 ratios; the |v−s| sum quantizes to
    * nano units per (term, part) before the integer sum per term.
    *
    * Scale: one (term, source) hash agg; source totals by a ≤|sources|
    * window; top-20 by TakeOrdered. Parts ABSENT for a term contribute
    * |0 − sᵢ| = sᵢ, handled in closed form: DP = Σ_present(|vᵢ−sᵢ|−sᵢ)/2
    * + Σ_all sᵢ/2 where the second term is exactly 1/2 — no dense
    * term×part grid is ever built (the sparse-completion identity). */
  def q271TermDispersion(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
    val cell = tok.groupBy("w", "source").agg(count(lit(1)).as("nws"))
    val wSrc = Window.partitionBy("source")
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val wTerm = Window.partitionBy("w")
    val t0 = cell
      .withColumn("ns", sum(col("nws")).over(wSrc))
      .withColumn("nt", sum(col("nws")).over(wAll))
      .withColumn("nw", sum(col("nws")).over(wTerm))
    val vi = col("nws").cast("double") / col("nw").cast("double")
    val si = col("ns").cast("double") / col("nt").cast("double")
    val termQ = floor((abs(vi - si) - si) * 1e9 + 0.5).cast("long")
    t0.select(col("w"), col("nw"), termQ.as("tq"))
      .groupBy("w", "nw").agg(sum(col("tq")).as("sq"))
      .filter(col("nw") >= 50)
      .select(col("w").as("term"), col("nw").as("n_occurrences"),
        (floor((col("sq").cast("double") / 1e9 + 1.0) / 2.0 * 1e6 + 0.5)
          / 1e6)
          .as("dp"))
      .orderBy(col("n_occurrences").desc, col("term"))
      .limit(20)
  }

  val q271TermDispersionSql: String =
    """WITH tok AS (
      |  SELECT source, w
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  WHERE w <> ''),
      |cell AS (
      |  SELECT w, source, COUNT(*) AS nws FROM tok GROUP BY w, source),
      |t AS (
      |  SELECT *,
      |    CAST(SUM(nws) OVER (PARTITION BY source) AS BIGINT) AS ns,
      |    CAST(SUM(nws) OVER () AS BIGINT) AS nt,
      |    CAST(SUM(nws) OVER (PARTITION BY w) AS BIGINT) AS nw
      |  FROM cell),
      |q AS (
      |  SELECT w, nw,
      |    CAST(SUM(CAST(FLOOR((ABS(CAST(nws AS DOUBLE) / nw
      |      - CAST(ns AS DOUBLE) / nt) - CAST(ns AS DOUBLE) / nt) * 1e9
      |      + 0.5) AS BIGINT)) AS BIGINT) AS sq
      |  FROM t GROUP BY w, nw)
      |SELECT w AS term, nw AS n_occurrences,
      |  FLOOR((CAST(sq AS DOUBLE) / 1e9 + 1.0) / 2.0 * 1e6 + 0.5) / 1e6 AS dp
      |FROM q WHERE nw >= 50
      |ORDER BY n_occurrences DESC, term LIMIT 20""".stripMargin

  /** L198 Fleiss' kappa (Fleiss 1971 [PK]) over a 3-rater quality
    * ensemble: three deterministic document screens — length (n_chars ≥
    * 100), verbosity (≥ 20 tokens), stopword presence — each "rate"
    * every document good/bad; κ measures their agreement beyond chance.
    * The ensemble-agreement readout an LLM-data pipeline needs before
    * majority-voting quality raters (q183's Cohen κ compares exactly
    * two raters; Fleiss generalizes to m).
    *
    * Parity: per-doc agreement P_i = (Σⱼ nᵢⱼ(nᵢⱼ−1))/(m(m−1)) rides
    * exact int64 vote counts (m = 3); P̄ and P_e are exact-int ratios in
    * one double chain 6dp.
    *
    * Scale: one per-doc map (3 boolean screens), one 1-row agg.
    * Guards: P_e = 1 (all raters constant) nulls κ. */
  def q274FleissKappa(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(
        when(col("n_chars") >= 100, 1L).otherwise(0L).as("r1"),
        when(size(tokens(col("text"))) >= 20, 1L).otherwise(0L).as("r2"),
        when(arrays_overlap(tokens(col("text")),
          typedlit(Seq("the", "a", "of", "and", "to", "in", "is", "on"))),
          1L).otherwise(0L).as("r3"))
      .withColumn("g", col("r1") + col("r2") + col("r3"))
    val m = 3.0
    val g = d.agg(count(lit(1)).as("n_docs"),
      sum(col("g")).as("votes_good"),
      // Σ_i [n_good(n_good−1) + n_bad(n_bad−1)] with n_bad = 3 − n_good
      sum(col("g") * (col("g") - 1) +
        (lit(3L) - col("g")) * (lit(2L) - col("g"))).as("agree_q"))
    val nD = col("n_docs").cast("double")
    val pbar = col("agree_q").cast("double") / (nD * m * (m - 1.0))
    val pGood = col("votes_good").cast("double") / (nD * m)
    val pe = pGood * pGood + (lit(1.0) - pGood) * (lit(1.0) - pGood)
    g.select(col("n_docs"), col("votes_good"),
      (round(pbar, 6) + 0.0).as("p_bar"),
      (round(pe, 6) + 0.0).as("p_e"),
      when(pe >= 1.0, lit(null).cast("double"))
        .otherwise(round((pbar - pe) / (lit(1.0) - pe), 6) + 0.0)
          .as("fleiss_kappa"))
  }

  val q274FleissKappaSql: String =
    s"""WITH d AS (
       |  SELECT
       |    (CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END)
       |    + (CASE WHEN len(string_split(text, ' ')) >= 20 THEN 1 ELSE 0
       |       END)
       |    + (CASE WHEN len(list_intersect(string_split(text, ' '),
       |        ['the','a','of','and','to','in','is','on'])) > 0
       |       THEN 1 ELSE 0 END) AS g
       |  FROM documents),
       |t AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(g) AS BIGINT) AS votes_good,
       |    CAST(SUM(g * (g - 1) + (3 - g) * (2 - g)) AS BIGINT) AS agree_q
       |  FROM d),
       |c AS (
       |  SELECT n_docs, votes_good,
       |    CAST(agree_q AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 3.0 * 2.0)
       |      AS pbar,
       |    CAST(votes_good AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 3.0)
       |      AS pg
       |  FROM t)
       |SELECT n_docs, votes_good,
       |  ROUND(pbar, 6) + 0 AS p_bar,
       |  ROUND(pg * pg + (1.0 - pg) * (1.0 - pg), 6) + 0 AS p_e,
       |  CASE WHEN pg * pg + (1.0 - pg) * (1.0 - pg) >= 1.0 THEN NULL
       |    ELSE ROUND((pbar - (pg * pg + (1.0 - pg) * (1.0 - pg)))
       |      / (1.0 - (pg * pg + (1.0 - pg) * (1.0 - pg))), 6) + 0 END
       |    AS fleiss_kappa
       |FROM c""".stripMargin

  /** L273 ACE richness estimator ([PK] Chao & Lee 1992 —
    * abundance-based coverage estimator), on q269's word-TRIGRAM
    * spectrum (the unigram vocabulary closes even at sf0.001 — q269's
    * measured lesson): S_ACE = S_abund + S_rare/Ĉ + (F₁/Ĉ)·γ̂², with
    * Ĉ = 1 − F₁/N_rare the sample coverage of the rare group
    * (counts ≤ 10) and γ̂² the rare-group CV correction
    * max(0, (S_rare/Ĉ)·Σi(i−1)Fᵢ/(N_rare(N_rare−1)) − 1). The
    * abundance-weighted companion to q269's Chao1 (which uses only
    * F₁/F₂): when the two disagree the rare tail is heterogeneous —
    * the "how much vocabulary haven't we crawled yet" pair.
    *
    * Parity: the frequency-of-frequency census is exact int64
    * (Σi(i−1)Fᵢ included); Ĉ, γ̂², ACE are one fixed double chain,
    * coverage 6dp, ACE 4dp.
    *
    * Scale: the q269 shape — one explode → trigram hash agg (map-side
    * combinable) → ONE ≤10-bin frequency census aggregate. */
  def q339AceRichness(s: SparkSession, dir: String): DataFrame = {
    val tri = Tables.documents(s, dir)
      .select(tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(explode(expr(
        "transform(sequence(1, size(ts) - 2), " +
          "i -> concat_ws(' ', ts[i-1], ts[i], ts[i+1]))")).as("w"))
    val wc = tri.groupBy("w").agg(count(lit(1)).as("c"))
    val g = wc.agg(
      sum(when(col("c") > 10L, 1L).otherwise(0L)).as("sa"),
      sum(when(col("c") <= 10L, 1L).otherwise(0L)).as("sr"),
      sum(when(col("c") <= 10L, col("c")).otherwise(0L)).as("nr"),
      sum(when(col("c") === 1L, 1L).otherwise(0L)).as("f1"),
      sum(when(col("c") <= 10L, col("c") * (col("c") - 1L))
        .otherwise(0L)).as("ssq"))
    def f(c: String) = col(c).cast("double")
    val cov = lit(1.0) - f("f1") / f("nr")
    val g2raw = f("sr") / cov * f("ssq") /
      (f("nr") * (f("nr") - 1.0)) - 1.0
    val g2 = greatest(g2raw, lit(0.0))
    val ace = f("sa") + f("sr") / cov + f("f1") / cov * g2
    val bad = col("nr") < 2L || col("f1") === col("nr")
    g.select(col("sa").cast("long").as("s_abund"),
      col("sr").cast("long").as("s_rare"),
      col("nr").cast("long").as("n_rare"),
      col("f1").cast("long").as("singletons"),
      when(bad, lit(null).cast("double"))
        .otherwise(rnd6c(cov)).as("coverage"),
      when(bad, lit(null).cast("double"))
        .otherwise(rnd6c(g2)).as("gamma2"),
      when(bad, lit(null).cast("double"))
        .otherwise((floor(ace * 1e4 + 0.5).cast("long")
          .cast("double") / 1e4) + 0.0).as("ace"))
  }

  private def rnd6c(c: Column): Column =
    (floor(c * 1e6 + 0.5).cast("long").cast("double") / 1e6) + 0.0

  val q339AceRichnessSql: String =
    """WITH toks AS (
      |  SELECT string_split(text, ' ') AS ts FROM documents),
      |tri AS (
      |  SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS w
      |  FROM (SELECT ts AS t,
      |          unnest(range(1, greatest(len(ts) - 1, 1))) AS i
      |        FROM toks)),
      |wc AS (SELECT w, COUNT(*) AS c FROM tri GROUP BY w),
      |g AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN c > 10 THEN 1 ELSE 0 END) AS BIGINT) AS sa,
      |    CAST(SUM(CASE WHEN c <= 10 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS sr,
      |    CAST(SUM(CASE WHEN c <= 10 THEN c ELSE 0 END) AS BIGINT)
      |      AS nr,
      |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
      |    CAST(SUM(CASE WHEN c <= 10 THEN c * (c - 1) ELSE 0 END)
      |      AS BIGINT) AS ssq
      |  FROM wc),
      |fin AS (
      |  SELECT *,
      |    1.0 - CAST(f1 AS DOUBLE) / nr AS cov,
      |    GREATEST(CAST(sr AS DOUBLE) / (1.0 - CAST(f1 AS DOUBLE) / nr)
      |      * ssq / (CAST(nr AS DOUBLE) * (CAST(nr AS DOUBLE) - 1.0))
      |      - 1.0, 0.0) AS g2
      |  FROM g)
      |SELECT sa AS s_abund, sr AS s_rare, nr AS n_rare,
      |  f1 AS singletons,
      |  CASE WHEN nr < 2 OR f1 = nr THEN NULL
      |    ELSE FLOOR(cov * 1e6 + 0.5) / 1e6 + 0 END AS coverage,
      |  CASE WHEN nr < 2 OR f1 = nr THEN NULL
      |    ELSE FLOOR(g2 * 1e6 + 0.5) / 1e6 + 0 END AS gamma2,
      |  CASE WHEN nr < 2 OR f1 = nr THEN NULL
      |    ELSE FLOOR((CAST(sa AS DOUBLE) + CAST(sr AS DOUBLE) / cov
      |      + CAST(f1 AS DOUBLE) / cov * g2) * 1e4 + 0.5) / 1e4 + 0 END
      |    AS ace
      |FROM fin""".stripMargin

  /** L277 Theil's uncertainty coefficient ([PK] Theil 1970), both
    * directions, on the (lang, source) contingency:
    * U(X|Y) = (H(X) − H(X|Y))/H(X) — the NORMALIZED, DIRECTIONAL
    * association readout q186's symmetric Cramér's V can't give
    * ("knowing the source removes u% of the uncertainty about the
    * language" ≠ the reverse). Composes the q192 entropy machinery at
    * the column level instead of the token level — the
    * mixture-balance screen run before stratifying a corpus by one of
    * two correlated facets.
    *
    * Parity: the contingency census is exact int64; every entropy
    * term −(c/N)ln(c/margin) is nano-quantized per CELL before the
    * int64 sum (the q192 discipline — the ln argument is a ratio of
    * exact ints); each U is one final double chain, 6dp.
    *
    * Scale: ONE map-side (lang, source) count census (≤ |langs|·
    * |sources| rows); margins by windows over that census; one sum
    * agg. Nothing fact-sized past the first aggregate. */
  def q343TheilsU(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(s, dir)
      .groupBy("lang", "source").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy()
    val wl = Window.partitionBy("lang")
    val ws = Window.partitionBy("source")
    def f(c: Column) = c.cast("double")
    val aug = cells
      .withColumn("nn", sum(col("c")).over(w))
      .withColumn("cl", sum(col("c")).over(wl))
      .withColumn("cs", sum(col("c")).over(ws))
    def q9(c: Column) = floor(c * lit(1.0e9) + lit(0.5)).cast("long")
    // H(lang) / H(source) from cell terms weighted into margins would
    // double-count; instead fold the margin entropies from the SAME
    // cell rows by dividing each cell's share across its margin: the
    // term −(c/N)·ln(margin/N) sums per margin to −(margin/N)ln(…)
    val hl9 = q9(-(f(col("c")) / f(col("nn"))) *
      log(f(col("cl")) / f(col("nn"))))
    val hs9 = q9(-(f(col("c")) / f(col("nn"))) *
      log(f(col("cs")) / f(col("nn"))))
    val hlGs9 = q9(-(f(col("c")) / f(col("nn"))) *
      log(f(col("c")) / f(col("cs"))))
    val hsGl9 = q9(-(f(col("c")) / f(col("nn"))) *
      log(f(col("c")) / f(col("cl"))))
    val m = aug.select(col("nn"), hl9.as("hl"), hs9.as("hs"),
        hlGs9.as("hlgs"), hsGl9.as("hsgl"))
      .agg(max(col("nn")).as("nd"), count(lit(1)).as("k"),
        sum(col("hl")).as("shl"), sum(col("hs")).as("shs"),
        sum(col("hlgs")).as("shlgs"), sum(col("hsgl")).as("shsgl"))
    def g(c: String) = col(c).cast("double") / 1.0e9
    def r6(c: Column) = (floor(c * 1e6 + 0.5).cast("long")
      .cast("double") / 1e6) + 0.0
    val uLS = (g("shl") - g("shlgs")) / g("shl")
    val uSL = (g("shs") - g("shsgl")) / g("shs")
    m.select(col("nd").cast("long").as("n_docs"),
      col("k").cast("long").as("n_cells"),
      r6(g("shl")).as("h_lang"), r6(g("shs")).as("h_source"),
      r6(g("shlgs")).as("h_lang_given_source"),
      when(col("shl") <= 0L, lit(null).cast("double"))
        .otherwise(r6(uLS)).as("u_lang_source"),
      when(col("shs") <= 0L, lit(null).cast("double"))
        .otherwise(r6(uSL)).as("u_source_lang"))
  }

  val q343TheilsUSql: String =
    """WITH cells AS (
      |  SELECT lang, source, COUNT(*) AS c
      |  FROM documents GROUP BY lang, source),
      |aug AS (
      |  SELECT *,
      |    CAST(SUM(c) OVER () AS BIGINT) AS nn,
      |    CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS cl,
      |    CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS cs
      |  FROM cells),
      |t AS (
      |  SELECT nn,
      |    CAST(FLOOR(-(CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))
      |      * ln(CAST(cl AS DOUBLE) / CAST(nn AS DOUBLE)) * 1e9 + 0.5)
      |      AS BIGINT) AS hl,
      |    CAST(FLOOR(-(CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))
      |      * ln(CAST(cs AS DOUBLE) / CAST(nn AS DOUBLE)) * 1e9 + 0.5)
      |      AS BIGINT) AS hs,
      |    CAST(FLOOR(-(CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))
      |      * ln(CAST(c AS DOUBLE) / CAST(cs AS DOUBLE)) * 1e9 + 0.5)
      |      AS BIGINT) AS hlgs,
      |    CAST(FLOOR(-(CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))
      |      * ln(CAST(c AS DOUBLE) / CAST(cl AS DOUBLE)) * 1e9 + 0.5)
      |      AS BIGINT) AS hsgl
      |  FROM aug),
      |m AS (
      |  SELECT CAST(MAX(nn) AS BIGINT) AS nd, COUNT(*) AS k,
      |    CAST(SUM(hl) AS BIGINT) AS shl,
      |    CAST(SUM(hs) AS BIGINT) AS shs,
      |    CAST(SUM(hlgs) AS BIGINT) AS shlgs,
      |    CAST(SUM(hsgl) AS BIGINT) AS shsgl
      |  FROM t)
      |SELECT nd AS n_docs, CAST(k AS BIGINT) AS n_cells,
      |  FLOOR(CAST(shl AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6 + 0
      |    AS h_lang,
      |  FLOOR(CAST(shs AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6 + 0
      |    AS h_source,
      |  FLOOR(CAST(shlgs AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6 + 0
      |    AS h_lang_given_source,
      |  CASE WHEN shl <= 0 THEN NULL
      |    ELSE FLOOR((CAST(shl AS DOUBLE) / 1e9
      |      - CAST(shlgs AS DOUBLE) / 1e9) / (CAST(shl AS DOUBLE) / 1e9)
      |      * 1e6 + 0.5) / 1e6 + 0 END AS u_lang_source,
      |  CASE WHEN shs <= 0 THEN NULL
      |    ELSE FLOOR((CAST(shs AS DOUBLE) / 1e9
      |      - CAST(shsgl AS DOUBLE) / 1e9) / (CAST(shs AS DOUBLE) / 1e9)
      |      * 1e6 + 0.5) / 1e6 + 0 END AS u_source_lang
      |FROM m""".stripMargin

  /** L283 Goodman–Kruskal λ ([PK] Goodman & Kruskal 1954), both
    * directions, on q343's (lang, source) contingency: the
    * proportional reduction in MODAL-prediction error —
    * λ(X|Y) = (Σ_y max_x c(x,y) − max_x c_x)/(N − max_x c_x). The
    * third member of the nominal-association triple (q186 Cramér's V
    * symmetric-χ², q343 Theil's U entropy, λ modal): λ = 0 whenever
    * every column shares the global mode even under real association,
    * which is exactly why it's reported BESIDE the other two — the
    * disagreements are the diagnostics.
    *
    * Parity: pure exact-int order statistics and counts on the tiny
    * census; each λ is ONE exact-rational division, floor-quantized
    * 6dp.
    *
    * Scale: the q343 plan — one map-side contingency census, window
    * maxima over ≤|langs|·|sources| rows, one sum agg. */
  def q349GoodmanKruskal(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(s, dir)
      .groupBy("lang", "source").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy()
    val wl = Window.partitionBy("lang")
    val ws = Window.partitionBy("source")
    val aug = cells
      .withColumn("nn", sum(col("c")).over(w))
      .withColumn("cl", sum(col("c")).over(wl))
      .withColumn("cs", sum(col("c")).over(ws))
      .withColumn("mxs", max(col("c")).over(ws))
      .withColumn("mxl", max(col("c")).over(wl))
    // per-margin modal contributions: take each margin's max once by
    // ranking inside the margin (exact int tie-break by the partner
    // key keeps it deterministic, though SUM of per-margin maxima
    // never depends on which tied row is picked)
    val m = aug
      .withColumn("rs", row_number().over(
        Window.partitionBy("source").orderBy(col("c").desc, col("lang"))))
      .withColumn("rl", row_number().over(
        Window.partitionBy("lang").orderBy(col("c").desc, col("source"))))
      .agg(max(col("nn")).as("nd"),
        sum(when(col("rs") === 1, col("c")).otherwise(0L)).as("sms"),
        sum(when(col("rl") === 1, col("c")).otherwise(0L)).as("sml"),
        max(col("cl")).as("maxl"), max(col("cs")).as("maxs"))
    def q6r(num: Column, den: Column): Column =
      when(den <= 0L, lit(null).cast("double"))
        .otherwise((floor(num.cast("double") / den.cast("double") * 1e6
          + 0.5).cast("long").cast("double") / 1e6) + 0.0)
    m.select(col("nd").cast("long").as("n_docs"),
      col("sms").cast("long").as("sum_modal_by_source"),
      col("sml").cast("long").as("sum_modal_by_lang"),
      col("maxl").cast("long").as("modal_lang_n"),
      col("maxs").cast("long").as("modal_source_n"),
      q6r(col("sms") - col("maxl"), col("nd") - col("maxl"))
        .as("lambda_lang_source"),
      q6r(col("sml") - col("maxs"), col("nd") - col("maxs"))
        .as("lambda_source_lang"))
  }

  val q349GoodmanKruskalSql: String =
    """WITH cells AS (
      |  SELECT lang, source, COUNT(*) AS c
      |  FROM documents GROUP BY lang, source),
      |aug AS (
      |  SELECT *,
      |    CAST(SUM(c) OVER () AS BIGINT) AS nn,
      |    CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS cl,
      |    CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS cs,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY c DESC, lang) AS rs,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY c DESC, source) AS rl
      |  FROM cells),
      |m AS (
      |  SELECT CAST(MAX(nn) AS BIGINT) AS nd,
      |    CAST(SUM(CASE WHEN rs = 1 THEN c ELSE 0 END) AS BIGINT)
      |      AS sms,
      |    CAST(SUM(CASE WHEN rl = 1 THEN c ELSE 0 END) AS BIGINT)
      |      AS sml,
      |    CAST(MAX(cl) AS BIGINT) AS maxl,
      |    CAST(MAX(cs) AS BIGINT) AS maxs
      |  FROM aug)
      |SELECT nd AS n_docs, sms AS sum_modal_by_source,
      |  sml AS sum_modal_by_lang, maxl AS modal_lang_n,
      |  maxs AS modal_source_n,
      |  CASE WHEN nd - maxl <= 0 THEN NULL
      |    ELSE FLOOR(CAST(sms - maxl AS DOUBLE) / (nd - maxl) * 1e6
      |      + 0.5) / 1e6 + 0 END AS lambda_lang_source,
      |  CASE WHEN nd - maxs <= 0 THEN NULL
      |    ELSE FLOOR(CAST(sml - maxs AS DOUBLE) / (nd - maxs) * 1e6
      |      + 0.5) / 1e6 + 0 END AS lambda_source_lang
      |FROM m""".stripMargin
}
