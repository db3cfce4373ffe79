package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Per-source document cap — the "domain cap" every crawl-curation
    * pipeline applies so no single site dominates the corpus: keep at
    * most `cap` documents per source, chosen by a deterministic per-row
    * hash rank (reproducible under any partitioning — no rand(), same
    * multiplicative-hash discipline as q71/q72/q86). Emits the kept
    * (source, doc_id, rank) rows, so the oracle pins the exact choice,
    * not just the counts. One keyed window — a single shuffle at any
    * corpus size; at 100 TB `source` is the natural high-cardinality
    * partition key (millions of domains), so no skew concern short of
    * one domain owning the corpus.
    *
    * Overflow discipline: the id is modular-reduced BEFORE the multiply
    * ([[capHash]]), so the intermediate is bounded by (p−1)·2654435761
    * ≈ 2.65e18 < Long.MaxValue for ANY 64-bit id. The naive
    * `id * 2654435761 + c` form wraps silently in Spark (non-ANSI) but
    * raises BIGINT-out-of-range in DuckDB at id ≈ 3.5e9, breaking the
    * cross-engine parity this oracle pins; PropertySpec proves the
    * reduced form against BigInt arithmetic across the full Long range. */
  def q92SourceCap(s: SparkSession, dir: String): DataFrame = {
    val cap = 15
    val d = Tables.documents(s, dir)
    val h = capHash(col("doc_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    d.withColumn("h", h)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= cap)
      .select(col("source"), col("doc_id"), col("rnk"))
      .orderBy("source", "rnk")
  }

  /** q92's rank hash, shared with PropertySpec: pmod-reduce the id
    * first, then multiply — identical values to the naive form for all
    * ids in [0, p) (every fixture id), but safe for the full Long range
    * on both engines. */
  private[graft] def capHash(id: Column): Column =
    pmod(pmod(id, lit(1000000007L)) * 2654435761L + 104729L, lit(1000000007L))

  val q92SourceCapSql: String =
    """SELECT source, doc_id, rnk FROM (
      |  SELECT source, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY (((doc_id % 1000000007 + 1000000007) % 1000000007)
      |                * 2654435761 + 104729) % 1000000007, doc_id) AS rnk
      |  FROM documents)
      |WHERE rnk <= 15
      |ORDER BY source, rnk""".stripMargin

  /** Per-language percentile length filter — the length-outlier cut
    * (truncated boilerplate on the left tail, concatenation junk on the
    * right): keep documents whose token count lies within [p5, p95] OF
    * THEIR LANGUAGE, thresholds derived from the data. Exact
    * interpolated percentiles (Spark `percentile` == DuckDB
    * `quantile_cont`, parity proven by q15); the per-lang threshold
    * table is tiny → broadcast join, corpus never reshuffles.
    *
    * Scale note: exact `percentile` buffers each group's values in the
    * agg buffer — right for the oracle (bit-exact thresholds), wrong
    * for billions of rows per language. At 100 TB swap the `cuts` agg
    * for `approx_percentile(n_tok, array(0.05, 0.95), accuracy)` — one
    * pass, bounded-memory sketch, same broadcast shape downstream; the
    * cut values move by at most 1/accuracy quantile mass. */
  def q93LengthFilter(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFns.tokens
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
    val cuts = d.groupBy("lang")
      .agg(expr("percentile(n_tok, 0.05)").as("p5"),
        expr("percentile(n_tok, 0.95)").as("p95"))
    d.join(broadcast(cuts), "lang")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_tok") >= col("p5") && col("n_tok") <= col("p95"), 1L)
          .otherwise(0L)).as("n_kept"),
        round(first(col("p5")), 4).as("p5"),
        round(first(col("p95")), 4).as("p95"))
      .orderBy("lang")
  }

  val q93LengthFilterSql: String =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |cuts AS (
      |  SELECT lang, quantile_cont(n_tok, 0.05) AS p5,
      |         quantile_cont(n_tok, 0.95) AS p95
      |  FROM d GROUP BY lang)
      |SELECT d.lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN n_tok >= p5 AND n_tok <= p95 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_kept,
      |  ROUND(ANY_VALUE(p5), 4) AS p5, ROUND(ANY_VALUE(p95), 4) AS p95
      |FROM d JOIN cuts ON d.lang = cuts.lang
      |GROUP BY d.lang
      |ORDER BY d.lang""".stripMargin

  /** Golden-record survivorship — the master-data step of a data
    * integration pipeline: the same entity arrives from several feeds
    * with different quality and gaps; the golden record takes, per
    * FIELD, the first non-null value by feed priority. Feeds here are
    * deterministic derivations of customer: feed 1 (authoritative) with
    * deterministic nulls punched in (key%7 names, key%5 balances),
    * feed 2 (secondary) complete but degraded (lowercased names,
    * rounded balances). Survivorship is one groupBy with a
    * `min(when(nonNull, struct(prio, v)))` per field — null-skipping
    * argmin as a single map-side-combinable aggregation, one shuffle
    * at any scale, no window, no self-join. */
  def q94GoldenRecord(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val feed1 = c.select(col("c_custkey"), lit(1).as("prio"),
      when(col("c_custkey") % 7 =!= 0, col("c_name")).as("name"),
      when(col("c_custkey") % 5 =!= 0, col("c_acctbal")).as("bal"))
    val feed2 = c.select(col("c_custkey"), lit(2).as("prio"),
      lower(col("c_name")).as("name"),
      round(col("c_acctbal")).as("bal"))
    def survive(v: Column, as: String): Column =
      min(when(v.isNotNull, struct(col("prio"), v.as("v")))).getField("v").as(as)
    feed1.unionByName(feed2)
      .groupBy("c_custkey")
      .agg(survive(col("name"), "name"), survive(col("bal"), "bal"))
      .orderBy("c_custkey")
  }

  val q94GoldenRecordSql: String =
    """WITH feeds AS (
      |  SELECT c_custkey, 1 AS prio,
      |    CASE WHEN c_custkey % 7 <> 0 THEN c_name END AS name,
      |    CASE WHEN c_custkey % 5 <> 0 THEN c_acctbal END AS bal
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 2 AS prio, lower(c_name) AS name,
      |    round(c_acctbal) AS bal
      |  FROM customer)
      |SELECT c_custkey,
      |  arg_min(name, prio) FILTER (WHERE name IS NOT NULL) AS name,
      |  arg_min(bal, prio) FILTER (WHERE bal IS NOT NULL) AS bal
      |FROM feeds
      |GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin

  /** Forward-fill (LOCF) over a densified daily series — the pandas
    * `ffill` primitive re-expressed relationally: build the q79 date
    * spine per priority, leave missing days NULL, then carry the last
    * observation forward with `last(_, ignoreNulls)` over a keyed
    * running frame, plus the staleness age in days. One keyed window —
    * a single shuffle; the spine is calendar-bounded regardless of fact
    * volume. Leading days before the first observation stay NULL (no
    * backfill), exactly pandas semantics. */
  def q95ForwardFill(s: SparkSession, dir: String): DataFrame = {
    import Parity._
    val o = Tables.orders(s, dir)
    val span = o.agg(min(to_date(col("o_orderdate"))).as("d0"),
      max(to_date(col("o_orderdate"))).as("d1"))
    val spine = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val prios = o.select("o_orderpriority").distinct()
    val daily = o.groupBy(to_date(col("o_orderdate")).as("day"),
        col("o_orderpriority"))
      .agg(sum(dm(col("o_totalprice"))).as("rev"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority")).orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    spine.crossJoin(prios)
      .join(daily, Seq("day", "o_orderpriority"), "left")
      .withColumn("rev_filled", last(col("rev"), ignoreNulls = true).over(w))
      .withColumn("obs_day",
        last(when(col("rev").isNotNull, col("day")), ignoreNulls = true).over(w))
      .select(col("day"), col("o_orderpriority"),
        dec4(col("rev_filled")).as("rev_filled"),
        // long: DuckDB date_diff returns BIGINT, Spark datediff INT
        datediff(col("day"), col("obs_day")).cast("long").as("staleness_days"))
      .orderBy("day", "o_orderpriority")
  }

  val q95ForwardFillSql: String = {
    import Parity._
    s"""WITH span AS (
       |  SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
       |         MAX(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
       |days AS (
       |  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
       |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM span),
       |prios AS (SELECT DISTINCT o_orderpriority FROM orders),
       |daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day, o_orderpriority,
       |    SUM(CAST(o_totalprice AS $DM)) AS rev
       |  FROM orders GROUP BY 1, 2),
       |sparse AS (
       |  SELECT day, o_orderpriority, rev
       |  FROM days CROSS JOIN prios
       |  LEFT JOIN daily USING (day, o_orderpriority))
       |SELECT day, o_orderpriority,
       |  ${out4("""last_value(rev IGNORE NULLS) OVER (
       |    PARTITION BY o_orderpriority ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")} AS rev_filled,
       |  date_diff('day',
       |    last_value(CASE WHEN rev IS NOT NULL THEN day END IGNORE NULLS) OVER (
       |      PARTITION BY o_orderpriority ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |    day) AS staleness_days
       |FROM sparse
       |ORDER BY day, o_orderpriority""".stripMargin
  }

  /** Linear interpolation between observations — pandas
    * `interpolate(method='linear')` relationally: on the q95 sparse
    * series, a missing day takes
    * prev + (next − prev) · elapsed/gap, where prev/next come from a
    * backward `last(ignoreNulls)` and a forward `first(ignoreNulls)`
    * window over the SAME keyed sort (one shuffle, one sort, two frame
    * passes). Leading/trailing gaps (no prev or no next) stay NULL.
    * The lerp runs in double on both engines from identical decimal
    * inputs and integer day distances, so rounding to 4 is stable. */
  def q96Interpolate(s: SparkSession, dir: String): DataFrame = {
    import Parity._
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(s, dir)
    val span = o.agg(min(to_date(col("o_orderdate"))).as("d0"),
      max(to_date(col("o_orderdate"))).as("d1"))
    val spine = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val prios = o.select("o_orderpriority").distinct()
    val daily = o.groupBy(to_date(col("o_orderdate")).as("day"),
        col("o_orderpriority"))
      .agg(sum(dm(col("o_totalprice"))).cast("double").as("rev"))
    val back = Window.partitionBy(col("o_orderpriority")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("o_orderpriority")).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prevRev = last(col("rev"), ignoreNulls = true).over(back)
    val prevDay = last(when(col("rev").isNotNull, col("day")),
      ignoreNulls = true).over(back)
    val nextRev = first(col("rev"), ignoreNulls = true).over(fwd)
    val nextDay = first(when(col("rev").isNotNull, col("day")),
      ignoreNulls = true).over(fwd)
    val lerp = prevRev + (nextRev - prevRev) *
      (datediff(col("day"), prevDay).cast("double") /
        datediff(nextDay, prevDay).cast("double"))
    spine.crossJoin(prios)
      .join(daily, Seq("day", "o_orderpriority"), "left")
      .withColumn("rev_interp", round(
        when(col("rev").isNotNull, col("rev")).otherwise(lerp), 4))
      .select("day", "o_orderpriority", "rev_interp")
      .orderBy("day", "o_orderpriority")
  }

  val q96InterpolateSql: String =
    """WITH span AS (
      |  SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
      |         MAX(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
      |days AS (
      |  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
      |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM span),
      |prios AS (SELECT DISTINCT o_orderpriority FROM orders),
      |daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, o_orderpriority,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(13,4))) AS DOUBLE) AS rev
      |  FROM orders GROUP BY 1, 2),
      |sparse AS (
      |  SELECT day, o_orderpriority, rev
      |  FROM days CROSS JOIN prios
      |  LEFT JOIN daily USING (day, o_orderpriority)),
      |ctx AS (
      |  SELECT day, o_orderpriority, rev,
      |    last_value(rev IGNORE NULLS) OVER bk AS prev_rev,
      |    last_value(CASE WHEN rev IS NOT NULL THEN day END IGNORE NULLS)
      |      OVER bk AS prev_day,
      |    first_value(rev IGNORE NULLS) OVER fw AS next_rev,
      |    first_value(CASE WHEN rev IS NOT NULL THEN day END IGNORE NULLS)
      |      OVER fw AS next_day
      |  FROM sparse
      |  WINDOW
      |    bk AS (PARTITION BY o_orderpriority ORDER BY day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    fw AS (PARTITION BY o_orderpriority ORDER BY day
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT day, o_orderpriority,
      |  ROUND(CASE WHEN rev IS NOT NULL THEN rev
      |    ELSE prev_rev + (next_rev - prev_rev) *
      |      (CAST(date_diff('day', prev_day, day) AS DOUBLE) /
      |       CAST(date_diff('day', prev_day, next_day) AS DOUBLE)) END, 4)
      |    AS rev_interp
      |FROM ctx
      |ORDER BY day, o_orderpriority""".stripMargin

  /** Rolling z-score anomaly flags — the monitoring op a pipeline runs
    * over its own daily volumes: each (priority, day) revenue scored
    * against its trailing 30-observation mean/stddev; |z| > 2 flags an
    * anomaly. One keyed window, map-side nothing — same single-shuffle
    * discipline as every series op here. The first row of each key has
    * no sample stddev (NULL z, never flagged), and a zero-variance
    * window yields NULL via nullif — identical on both engines. */
  def q97Anomaly(s: SparkSession, dir: String): DataFrame = {
    import Parity._
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(s, dir)
    val daily = o.groupBy(to_date(col("o_orderdate")).as("day"),
        col("o_orderpriority"))
      .agg(sum(dm(col("o_totalprice"))).cast("double").as("rev"))
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("day"))
      .rowsBetween(-29, Window.currentRow)
    val z = (col("rev") - avg(col("rev")).over(w)) /
      nullif(stddev_samp(col("rev")).over(w), lit(0.0))
    daily.withColumn("z", round(z, 4))
      .withColumn("is_anomaly",
        when(col("z").isNull, lit(null).cast("boolean"))
          .otherwise(abs(col("z")) > 2.0))
      .select("day", "o_orderpriority", "z", "is_anomaly")
      .orderBy("day", "o_orderpriority")
  }

  val q97AnomalySql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, o_orderpriority,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(13,4))) AS DOUBLE) AS rev
      |  FROM orders GROUP BY 1, 2),
      |scored AS (
      |  SELECT day, o_orderpriority,
      |    ROUND((rev - avg(rev) OVER w) / nullif(stddev_samp(rev) OVER w, 0.0), 4) AS z
      |  FROM daily
      |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day
      |               ROWS BETWEEN 29 PRECEDING AND CURRENT ROW))
      |SELECT day, o_orderpriority, z,
      |  CASE WHEN z IS NULL THEN NULL ELSE abs(z) > 2.0 END AS is_anomaly
      |FROM scored
      |ORDER BY day, o_orderpriority""".stripMargin

  /** Equal-frequency (quantile) binning — pandas `qcut`, the partner of
    * q88's equal-width histogram: rank every order price into deciles
    * under a deterministic total order (price, then key — bucket ties
    * would otherwise be engine-dependent), then profile each bin.
    *
    * Exact NTILE semantics WITHOUT the single-reducer sort (the oracle
    * SQL keeps `NTILE(10)` as the semantic spec) via [[RangedNtile]] —
    * range-partitioned parallel rank + the front-loaded bucket formula;
    * see that op's scaladoc for the full plan story. The old
    * `ntile(10) OVER (ORDER BY …)` form pulled the whole fact table
    * through one partition (the suite's last single-reducer sort,
    * VERDICT r5). When sketch-exact bucket populations suffice,
    * [[AppxQcut]] does the same binning with ZERO shuffles. */
  def q98Qcut(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_totalprice"), col("o_orderkey"))
    RangedNtile.withNtile(o, 10,
        Seq(col("o_totalprice"), col("o_orderkey")), "decile")
      .groupBy("decile")
      .agg(count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 4).as("lo"),
        round(max(col("o_totalprice")), 4).as("hi"))
      .orderBy("decile")
  }

  val q98QcutSql: String =
    """SELECT decile, COUNT(*) AS n,
      |  ROUND(MIN(o_totalprice), 4) AS lo,
      |  ROUND(MAX(o_totalprice), 4) AS hi
      |FROM (
      |  SELECT o_totalprice,
      |    NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      |  FROM orders)
      |GROUP BY decile
      |ORDER BY decile""".stripMargin

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

  /** Exponentially weighted moving average over the daily revenue
    * series — pandas `ewm(alpha=0.2).mean()` / the classic exponential
    * smoother, the recursive partner of q97's trailing-window z-score:
    * e_1 = rev_1, e_t = 0.2·rev_t + 0.8·e_{t−1}. A recursion is not a
    * window frame, so the series is assembled per key (array_sort of
    * (day, rev) structs — the q113 path-assembly discipline) and folded
    * with `aggregate`, carrying (prefix-EWMAs, last) through one linear
    * pass; both engines evaluate the same `0.2·x + 0.8·e` tree left to
    * right over the same day order, so the doubles are bit-identical
    * before the final round(4).
    *
    * Scale: one (day, priority) hash agg (map-side combinable) then one
    * priority-keyed shuffle; per-group state is linear in the series
    * length, which is calendar-bounded (the q79/q95 contract — a year
    * slice here keeps the DuckDB recursive-CTE oracle shallow). For
    * unbounded/streaming series the same recurrence runs in
    * transformWithState (T6) with one double of state per key. */
  def q115Ewma(s: SparkSession, dir: String): DataFrame = {
    import Parity._
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01"))
    val daily = o.groupBy(to_date(col("o_orderdate")).as("day"),
        col("o_orderpriority"))
      .agg(sum(dm(col("o_totalprice"))).cast("double").as("rev"))
    val series = daily.groupBy("o_orderpriority")
      .agg(array_sort(collect_list(struct(col("day"), col("rev")))).as("s"))
    val folded = series.withColumn("es", expr(
      """aggregate(s,
        |  struct(cast(array() as array<double>) AS es,
        |         cast(null as double) AS e),
        |  (acc, x) -> struct(
        |    array_append(acc.es,
        |      CASE WHEN acc.e IS NULL THEN x.rev
        |           ELSE 0.2D * x.rev + 0.8D * acc.e END),
        |    CASE WHEN acc.e IS NULL THEN x.rev
        |         ELSE 0.2D * x.rev + 0.8D * acc.e END),
        |  acc -> acc.es)""".stripMargin))
    folded
      .select(col("o_orderpriority"),
        explode(arrays_zip(col("s"), col("es"))).as("z"))
      .select(col("z.s.day").as("day"), col("o_orderpriority"),
        round(col("z.s.rev"), 4).as("rev"),
        round(col("z.es"), 4).as("ewma"))
      .orderBy("day", "o_orderpriority")
  }

  val q115EwmaSql: String =
    """WITH RECURSIVE daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, o_orderpriority AS pr,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(13,4))) AS DOUBLE) AS rev
      |  FROM orders WHERE o_orderdate >= DATE '1997-01-01'
      |  GROUP BY 1, 2),
      |s AS (
      |  SELECT day, pr, rev,
      |    ROW_NUMBER() OVER (PARTITION BY pr ORDER BY day) AS rn
      |  FROM daily),
      |e AS (
      |  SELECT day, pr, rev, rn, rev AS ewma FROM s WHERE rn = 1
      |  UNION ALL
      |  SELECT s.day, s.pr, s.rev, s.rn,
      |    CAST(0.2 AS DOUBLE) * s.rev + CAST(0.8 AS DOUBLE) * e.ewma
      |  FROM s JOIN e ON s.pr = e.pr AND s.rn = e.rn + 1)
      |SELECT day, pr AS o_orderpriority, ROUND(rev, 4) AS rev,
      |  ROUND(ewma, 4) AS ewma
      |FROM e ORDER BY day, o_orderpriority""".stripMargin

  /** Holt linear (double-exponential) smoothing — q115's EWMA tracks a
    * level only and lags any trending series by design; Holt adds the
    * coupled trend recurrence (level ℓ_t = α·x + (1−α)(ℓ+b), trend
    * b_t = β·Δℓ + (1−β)b), giving the one-step forecast ℓ+b a trending
    * daily-revenue series actually needs. α=0.3, β=0.1, ℓ₁=x₁, b₁=0.
    *
    * Parity: the fold evaluates the identical expression tree step by
    * step in both engines, so the doubles are bit-identical by
    * induction (the q115 contract, two state variables instead of
    * one); rounding happens only at output.
    *
    * Scale: identical to q115 — one keyed shuffle, per-group state
    * linear in the calendar-bounded series; the streaming form is the
    * same recurrence in transformWithState with two doubles of state
    * per key. */
  def q143Holt(s: SparkSession, dir: String): DataFrame = {
    import Parity._
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01"))
    val daily = o.groupBy(to_date(col("o_orderdate")).as("day"),
        col("o_orderpriority"))
      .agg(sum(dm(col("o_totalprice"))).cast("double").as("rev"))
    val series = daily.groupBy("o_orderpriority")
      .agg(array_sort(collect_list(struct(col("day"), col("rev")))).as("s"))
    val folded = series.withColumn("hs", expr(
      """aggregate(s,
        |  struct(cast(array() as array<struct<l: double, b: double>>) AS hs,
        |         cast(null as double) AS l, cast(null as double) AS b),
        |  (acc, x) -> CASE WHEN acc.l IS NULL THEN
        |      struct(array_append(acc.hs, struct(x.rev AS l, 0.0D AS b)) AS hs,
        |             x.rev AS l, cast(0.0D as double) AS b)
        |    ELSE struct(
        |      array_append(acc.hs, struct(
        |        0.3D * x.rev + 0.7D * (acc.l + acc.b) AS l,
        |        0.1D * ((0.3D * x.rev + 0.7D * (acc.l + acc.b)) - acc.l)
        |          + 0.9D * acc.b AS b)) AS hs,
        |      0.3D * x.rev + 0.7D * (acc.l + acc.b) AS l,
        |      0.1D * ((0.3D * x.rev + 0.7D * (acc.l + acc.b)) - acc.l)
        |        + 0.9D * acc.b AS b) END,
        |  acc -> acc.hs)""".stripMargin))
    folded
      .select(col("o_orderpriority"),
        explode(arrays_zip(col("s"), col("hs"))).as("z"))
      .select(col("z.s.day").as("day"), col("o_orderpriority"),
        round(col("z.s.rev"), 4).as("rev"),
        round(col("z.hs.l"), 4).as("level"),
        round(col("z.hs.b"), 4).as("trend"),
        round(col("z.hs.l") + col("z.hs.b"), 4).as("forecast"))
      .orderBy("day", "o_orderpriority")
  }

  val q143HoltSql: String =
    """WITH RECURSIVE daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, o_orderpriority AS pr,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(13,4))) AS DOUBLE) AS rev
      |  FROM orders WHERE o_orderdate >= DATE '1997-01-01'
      |  GROUP BY 1, 2),
      |s AS (
      |  SELECT day, pr, rev,
      |    ROW_NUMBER() OVER (PARTITION BY pr ORDER BY day) AS rn
      |  FROM daily),
      |h AS (
      |  SELECT day, pr, rev, rn, rev AS lvl, CAST(0 AS DOUBLE) AS tr
      |  FROM s WHERE rn = 1
      |  UNION ALL
      |  SELECT s.day, s.pr, s.rev, s.rn,
      |    CAST(0.3 AS DOUBLE) * s.rev
      |      + CAST(0.7 AS DOUBLE) * (h.lvl + h.tr),
      |    CAST(0.1 AS DOUBLE) * ((CAST(0.3 AS DOUBLE) * s.rev
      |        + CAST(0.7 AS DOUBLE) * (h.lvl + h.tr)) - h.lvl)
      |      + CAST(0.9 AS DOUBLE) * h.tr
      |  FROM s JOIN h ON s.pr = h.pr AND s.rn = h.rn + 1)
      |SELECT day, pr AS o_orderpriority, ROUND(rev, 4) AS rev,
      |  ROUND(lvl, 4) AS level, ROUND(tr, 4) AS trend,
      |  ROUND(lvl + tr, 4) AS forecast
      |FROM h ORDER BY day, o_orderpriority""".stripMargin

  /** Robust outlier detection by median absolute deviation — q97's
    * z-score flags drown when the contamination itself inflates the
    * mean/stddev; median and MAD have a 50% breakdown point, the
    * standard robust screen for corrupt numeric feeds. Exact medians
    * (A10 precedent: Spark `percentile` == DuckDB `quantile_cont`,
    * both linear-interpolating), outlier when |v − med| > 3·MAD.
    *
    * Scale: two grouped exact percentiles (sort within the event_type
    * partitions) and two broadcasts of the 5-row per-type stats back
    * to the fact rows — no global sort, no self-join. For a
    * high-cardinality key the exact percentile becomes the bottleneck
    * and `percentile_approx`/KLL is the drop-in (A5-style trade). */
  def q107RobustOutliers(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val med = e.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = e.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type", "med")
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mad.select("event_type", "mad")), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(first(col("med")), 4).as("med"),
        round(first(col("mad")), 4).as("mad"),
        count(when(col("dev") > col("mad") * 3, 1)).as("n_outliers"))
      .orderBy("event_type")
  }

  /** Categorical column profiling with Shannon entropy — the
    * value-distribution half of data profiling ([[DataQuality.profile]]
    * is the one-pass count/null/HLL half): per column, row count,
    * distinct values (null counted as a value), null mass, entropy in
    * nats, and the modal value's share. Low entropy or a top-share near
    * 1 flags a near-constant column; entropy near ln(k) flags uniform
    * codes — the screens a schema-mapping step runs before trusting a
    * field.
    *
    * Parity: counts are exact; entropy = −Σ p·ln p sums ≤ 5 doubles per
    * column whose partition-order jitter (~1e−16) sits twelve orders
    * below the round(4) grid; `+ 0.0` normalizes the single-value
    * column's −0.0 (q111 discipline). p = n/tot is int64→double
    * division, IEEE-identical.
    *
    * Scale: stack → one (column, value) hash agg, map-side combinable;
    * the entropy window runs over ≤ |values| rows per column. Columns
    * profiled in one pass regardless of table count — unions, not
    * joins. */
  def q122ColumnEntropy(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = Tables.lineitem(s, dir).selectExpr(
      "stack(2, 'l_returnflag', l_returnflag, 'l_linestatus', l_linestatus) as (col_name, val)")
    val o = Tables.orders(s, dir).selectExpr(
      "stack(2, 'o_orderstatus', o_orderstatus, 'o_orderpriority', o_orderpriority) as (col_name, val)")
    val c = l.unionAll(o).groupBy("col_name", "val")
      .agg(count(lit(1)).as("n"))
    val t = c.withColumn("tot",
      sum(col("n")).over(Window.partitionBy("col_name")))
    t.groupBy("col_name")
      .agg(max(col("tot")).as("n_rows"),
        count(lit(1)).as("n_distinct"),
        coalesce(sum(when(col("val").isNull, col("n"))), lit(0L)).as("n_null"),
        (round(-sum((col("n") / col("tot")) * log(col("n") / col("tot"))), 4)
          + 0.0).as("entropy"),
        round(max(col("n")).cast("double") / max(col("tot")), 4).as("top_share"))
      .orderBy("col_name")
  }

  val q122ColumnEntropySql: String =
    """WITH v AS (
      |  SELECT 'l_returnflag' AS col_name, l_returnflag AS val FROM lineitem
      |  UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem
      |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
      |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders),
      |c AS (SELECT col_name, val, COUNT(*) AS n FROM v GROUP BY col_name, val),
      |t AS (SELECT col_name, val, n,
      |        CAST(SUM(n) OVER (PARTITION BY col_name) AS BIGINT) AS tot
      |      FROM c)
      |SELECT col_name,
      |  MAX(tot) AS n_rows,
      |  COUNT(*) AS n_distinct,
      |  CAST(COALESCE(SUM(n) FILTER (WHERE val IS NULL), 0) AS BIGINT) AS n_null,
      |  ROUND(-SUM((CAST(n AS DOUBLE) / tot) * LN(CAST(n AS DOUBLE) / tot)), 4)
      |    + 0 AS entropy,
      |  ROUND(CAST(MAX(n) AS DOUBLE) / MAX(tot), 4) AS top_share
      |FROM t GROUP BY col_name ORDER BY col_name""".stripMargin

  /** Winsorized robust scaling — clamp each value to its group's exact
    * [p05, p95] band before statistics: the standard tail-taming
    * treatment when a feed's outliers are real data (not errors to
    * quarantine like q76, not merely flags like q107) but would
    * dominate any downstream mean/scale. Reports per-group clip counts
    * and the winsorized mean against the raw mean — the before/after a
    * curation dashboard shows.
    *
    * Parity: exact percentiles (`percentile` == `quantile_cont`, the
    * A10 contract) on int64 cents; the clamp is pure comparison; means
    * divide exact integer sums by counts (int64→double, IEEE-exact)
    * before one round(4).
    *
    * Scale: one grouped exact percentile (sort within the 5-value
    * priority partitions), one broadcast of the 5-row band table, one
    * map-side-combinable agg. `percentile_approx` is the documented
    * high-cardinality swap (A5 trade). */
  def q132Winsorize(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_orderpriority"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("pc"))
    val bands = o.groupBy("o_orderpriority")
      .agg(expr("cast(percentile(pc, 0.05) as double)").as("lo"),
        expr("cast(percentile(pc, 0.95) as double)").as("hi"))
    o.join(broadcast(bands), "o_orderpriority")
      .withColumn("w", greatest(least(col("pc").cast("double"), col("hi")),
        col("lo")))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        count(when(col("pc").cast("double") < col("lo"), 1)).as("n_clip_lo"),
        count(when(col("pc").cast("double") > col("hi"), 1)).as("n_clip_hi"),
        round(sum(col("pc")).cast("double") / count(lit(1)) / 100.0, 4)
          .as("raw_mean"),
        round(sum(col("w")) / count(lit(1)) / 100.0, 4).as("wins_mean"))
      .orderBy("o_orderpriority")
  }

  val q132WinsorizeSql: String =
    """WITH o AS (
      |  SELECT o_orderpriority,
      |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS pc
      |  FROM orders),
      |b AS (
      |  SELECT o_orderpriority,
      |    CAST(quantile_cont(pc, 0.05) AS DOUBLE) AS lo,
      |    CAST(quantile_cont(pc, 0.95) AS DOUBLE) AS hi
      |  FROM o GROUP BY o_orderpriority)
      |SELECT o.o_orderpriority, COUNT(*) AS n,
      |  COUNT(*) FILTER (WHERE CAST(pc AS DOUBLE) < lo) AS n_clip_lo,
      |  COUNT(*) FILTER (WHERE CAST(pc AS DOUBLE) > hi) AS n_clip_hi,
      |  ROUND(CAST(SUM(pc) AS DOUBLE) / COUNT(*) / 100.0, 4) AS raw_mean,
      |  ROUND(SUM(GREATEST(LEAST(CAST(pc AS DOUBLE), hi), lo))
      |        / COUNT(*) / 100.0, 4) AS wins_mean
      |FROM o JOIN b ON o.o_orderpriority = b.o_orderpriority
      |GROUP BY o.o_orderpriority
      |ORDER BY o.o_orderpriority""".stripMargin

  /** Source-overlap matrix — pairwise Jaccard similarity of the
    * distinct word-bigram shingle sets of each corpus source: the
    * curation dashboard that says "these two feeds are 40% the same
    * material" BEFORE mixing weights are chosen (q86) or cross-source
    * dedup is run (q90). Set-level redundancy, complementing the
    * document-level dedup ladder.
    *
    * Scale: the pair space is |sources|² (bounded, here 10 rows), never
    * document pairs — the join is an inverted-index equi-join on the
    * shingle (q50 discipline), so work is ∝ Σ_gram (#sources sharing
    * it)², capped by |sources|² per gram. Distinct shingle sets are one
    * map-side-combinable distinct per source; the 5-row size table
    * broadcasts twice. Exact integer intersections; Jaccard is one
    * int64→double division rounded at 4. */
  def q124SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.SimFns
    val d = Tables.documents(s, dir)
    val g = d.select(col("source"),
        explode(SimFns.wordBigrams(col("text"))).as("bigram"))
      .distinct()
    val sizes = g.groupBy("source").agg(count(lit(1)).as("n"))
    val a = g.select(col("source").as("src_a"), col("bigram"))
    val b = g.select(col("source").as("src_b"), col("bigram"))
    val inter = a.join(b, Seq("bigram"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("na"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("nb"))), "src_b")
      .withColumn("un", col("na") + col("nb") - col("inter"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / col("un"), 4))
      .select("src_a", "src_b", "inter", "un", "jaccard")
      .orderBy("src_a", "src_b")
  }

  val q124SourceOverlapSql: String =
    """WITH g AS (
      |  SELECT DISTINCT source, bigram FROM (
      |    SELECT source,
      |      unnest(CASE WHEN len(string_split(text,' ')) < 2 THEN []
      |        ELSE list_transform(generate_series(1, len(string_split(text,' ')) - 1),
      |               i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]) END) AS bigram
      |    FROM documents)),
      |s AS (SELECT source, COUNT(*) AS n FROM g GROUP BY source),
      |i AS (
      |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter
      |  FROM g a JOIN g b ON a.bigram = b.bigram AND a.source < b.source
      |  GROUP BY a.source, b.source)
      |SELECT src_a, src_b, inter,
      |  sa.n + sb.n - inter AS un,
      |  ROUND(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 4) AS jaccard
      |FROM i
      |JOIN s sa ON i.src_a = sa.source
      |JOIN s sb ON i.src_b = sb.source
      |ORDER BY src_a, src_b""".stripMargin

  /** Referential-integrity audit — the first gate of any multi-source
    * integration: for every declared FK edge, how many child rows point
    * at a missing parent (orphans) and how many distinct dangling keys
    * exist. One output row per relationship, so a 7-edge schema audit is
    * one bounded frame regardless of fact size.
    *
    * Scale: each edge is one left join keyed on the FK. Only the
    * BOUNDED parents (nation, region) carry a broadcast hint;
    * linearly-scaled parents (customer, supplier, part, orders) are
    * unhinted — AQE picks broadcast at small SF and shuffle at 100 TB
    * (a forced hint on a scaled dimension is the KCore round-one OOM).
    * Counts are map-side-combinable; `countDistinct` of dangling keys
    * shuffles only orphan keys (normally zero). A healthy feed costs 7
    * scans and produces 7 rows of zeros — the point is the plan stays
    * this cheap at 100 TB. */
  def q123RefIntegrity(s: SparkSession, dir: String): DataFrame = {
    def audit(name: String, fact: DataFrame, fk: String,
              dim: DataFrame, pk: String, bcast: Boolean): DataFrame = {
      val parent = dim.select(col(pk))
      val side = if (bcast) broadcast(parent) else parent
      fact.select(col(fk))
        .join(side, col(fk) === col(pk), "left")
        .agg(count(lit(1)).as("n_rows"),
          count(when(col(pk).isNull, 1)).as("n_orphans"),
          countDistinct(when(col(pk).isNull, col(fk))).as("n_missing_keys"))
        .select(lit(name).as("relationship"),
          col("n_rows"), col("n_orphans"), col("n_missing_keys"))
    }
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val su = Tables.supplier(s, dir)
    val p = Tables.part(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    Seq(
      audit("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey", bcast = true),
      audit("lineitem.l_orderkey->orders", l, "l_orderkey", o, "o_orderkey", bcast = false),
      audit("lineitem.l_partkey->part", l, "l_partkey", p, "p_partkey", bcast = false),
      audit("lineitem.l_suppkey->supplier", l, "l_suppkey", su, "s_suppkey", bcast = false),
      audit("nation.n_regionkey->region", n, "n_regionkey", r, "r_regionkey", bcast = true),
      audit("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey", bcast = false),
      audit("supplier.s_nationkey->nation", su, "s_nationkey", n, "n_nationkey", bcast = true))
      .reduce(_ unionAll _)
      .orderBy("relationship")
  }

  val q123RefIntegritySql: String = {
    def edge(name: String, fact: String, fk: String,
             dim: String, pk: String): String =
      s"""SELECT '$name' AS relationship,
         |  COUNT(*) AS n_rows,
         |  COUNT(*) FILTER (WHERE d.$pk IS NULL) AS n_orphans,
         |  COUNT(DISTINCT CASE WHEN d.$pk IS NULL THEN f.$fk END)
         |    AS n_missing_keys
         |FROM $fact f LEFT JOIN $dim d ON f.$fk = d.$pk""".stripMargin
    Seq(
      edge("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      edge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      edge("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      edge("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      edge("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
      edge("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      edge("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY relationship")
  }

  val q107RobustOutliersSql: String =
    """WITH med AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY event_type),
      |dev AS (
      |  SELECT e.event_type, m.med, abs(e.value - m.med) AS dev
      |  FROM events e JOIN med m USING (event_type)),
      |mad AS (
      |  SELECT event_type, med, quantile_cont(dev, 0.5) AS mad
      |  FROM dev GROUP BY event_type, med)
      |SELECT d.event_type, COUNT(*) AS n,
      |  ROUND(m.med, 4) AS med, ROUND(m.mad, 4) AS mad,
      |  CAST(COUNT(*) FILTER (WHERE d.dev > m.mad * 3) AS BIGINT) AS n_outliers
      |FROM dev d JOIN mad m ON d.event_type = m.event_type
      |GROUP BY d.event_type, m.med, m.mad
      |ORDER BY d.event_type""".stripMargin

  /** Population Stability Index — THE production drift metric: bin the
    * monitored feature by the BASE period's exact deciles, compare the
    * comparison period's bin shares, PSI = Σ (p_b − p_a)·ln(p_b/p_a).
    * Rule of thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25 act. Here:
    * order prices, pre-1999 as base vs 1999+ as comparison, one row per
    * decile with its PSI term (the total is the sum — emitting terms
    * localizes WHERE the distribution moved, which is the part a
    * monitoring dashboard actually shows).
    *
    * Parity: cut points are exact decile percentiles on int64 cents
    * (the A10 `percentile` == `quantile_cont` contract); bin assignment
    * counts cuts below the value (identical comparison semantics);
    * counts exact; the ln tree is identical-association (the
    * q121/q43 ln precedent) and rounds at 6.
    *
    * Scale: one agg for cuts (9-value array broadcast, the q88
    * one-row-bounds pattern — allowlisted BNLJ), one map-side bin
    * projection, one ≤10-group agg. No windows over fact rows. */
  def q146Psi(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      expr("cast(round(o_totalprice * 100) as bigint)").as("pc"),
      (col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .as("is_new"))
    val cuts = o.filter(!col("is_new"))
      .agg(expr(
        "percentile(pc, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
        .as("c"))
    val binned = o.crossJoin(broadcast(cuts))
      .withColumn("bin",
        lit(1) + size(filter(col("c"),
          x => col("pc").cast("double") > x)))
    val t = binned.groupBy("bin")
      .agg(count(when(!col("is_new"), 1)).as("na"),
        count(when(col("is_new"), 1)).as("nb"))
    // period totals as driver scalars (q121/q133 discipline) — the
    // second one-row broadcast would exceed the one-BNLJ-per-plan cap
    val totRow = o.agg(count(when(!col("is_new"), 1)),
      count(when(col("is_new"), 1))).head
    val (ta, tb) = (totRow.getLong(0), totRow.getLong(1))
    t.select(col("bin"), col("na"), col("nb"),
        round((col("nb").cast("double") / tb -
          col("na").cast("double") / ta) *
          log((col("nb").cast("double") / tb) /
            (col("na").cast("double") / ta)), 6).as("psi_term"))
      .orderBy("bin")
  }

  val q146PsiSql: String =
    """WITH o AS (
      |  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS pc,
      |    o_orderdate >= TIMESTAMP '1999-01-01' AS is_new
      |  FROM orders),
      |cuts AS (
      |  SELECT list_transform(
      |    quantile_cont(pc, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
      |    x -> CAST(x AS DOUBLE)) AS c
      |  FROM o WHERE NOT is_new),
      |t AS (
      |  SELECT 1 + len(list_filter((SELECT c FROM cuts),
      |           x -> CAST(pc AS DOUBLE) > x)) AS bin,
      |    COUNT(*) FILTER (WHERE NOT is_new) AS na,
      |    COUNT(*) FILTER (WHERE is_new) AS nb
      |  FROM o GROUP BY 1),
      |tot AS (SELECT SUM(na) AS ta, SUM(nb) AS tb FROM t)
      |SELECT bin, na, nb,
      |  ROUND((CAST(nb AS DOUBLE)/tb - CAST(na AS DOUBLE)/ta) *
      |        LN((CAST(nb AS DOUBLE)/tb) / (CAST(na AS DOUBLE)/ta)), 6)
      |    AS psi_term
      |FROM t, tot ORDER BY bin""".stripMargin

  /** CUSUM changepoint detection — where did the level of a daily
    * series shift? The cumulative-sum statistic S_k − k·mean peaks at
    * the changepoint (Page 1954); computed EXACTLY by
    * cross-multiplying: score_k = n·S_k − k·T (both int64), so the
    * argmax is integer-exact and the only doubles are display columns.
    * Per priority: the detected day, its normalized CUSUM height and
    * the series length — the monitoring view behind "this feed's level
    * moved on day X", sharper than q97's pointwise z-scores for
    * sustained shifts.
    *
    * Parity: daily cents exact; the keyed cumulative window is ordered
    * by the unique day; argmax ties break on the earliest day via
    * lexicographic struct-min. Scale: one priority-keyed shuffle; the
    * window runs over calendar-bounded rows per group (the q115
    * contract). */
  def q148Cusum(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority").as("pr"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("rev"))
    val byDay = Window.partitionBy("pr").orderBy("day")
    val all = Window.partitionBy("pr")
    val scored = daily
      .withColumn("k", row_number().over(byDay).cast("long"))
      .withColumn("sk", sum("rev").over(
        byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("t", sum("rev").over(all))
      .withColumn("score", col("n") * col("sk") - col("k") * col("t"))
    scored.groupBy("pr")
      .agg(max("n").as("n_days"),
        min(struct((-abs(col("score"))).as("neg"), col("day"),
          col("score"))).as("m"))
      .select(col("pr"), col("n_days"),
        col("m.day").as("changepoint"),
        round(abs(col("m.score")).cast("double") /
          col("n_days") / 100.0, 4).as("cusum_height"))
      .orderBy("pr")
  }

  val q148CusumSql: String =
    """WITH daily AS (
      |  SELECT o_orderpriority AS pr, CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev
      |  FROM orders GROUP BY 1, 2),
      |scored AS (
      |  SELECT pr, day,
      |    COUNT(*) OVER (PARTITION BY pr) AS n,
      |    SUM(rev) OVER (PARTITION BY pr) AS t,
      |    ROW_NUMBER() OVER (PARTITION BY pr ORDER BY day) AS k,
      |    SUM(rev) OVER (PARTITION BY pr ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sk
      |  FROM daily),
      |sc AS (SELECT pr, day, n, n * sk - k * t AS score FROM scored),
      |best AS (
      |  SELECT pr, day, n, score,
      |    ROW_NUMBER() OVER (PARTITION BY pr
      |      ORDER BY ABS(score) DESC, day) AS rnk
      |  FROM sc)
      |SELECT pr, CAST(n AS BIGINT) AS n_days, day AS changepoint,
      |  ROUND(CAST(ABS(score) AS DOUBLE) / n / 100.0, 4) AS cusum_height
      |FROM best WHERE rnk = 1 ORDER BY pr""".stripMargin

  /** Exact two-sample Kolmogorov–Smirnov distance between the base and
    * comparison price distributions — the nonparametric partner of
    * q146's binned PSI: KS = max |CDF_a − CDF_b| over the merged value
    * domain, computed EXACTLY in integers by cross-multiplying the
    * cumulative counts (|cum_a·n_b − cum_b·n_a|, divided once at the
    * end) — no floating-point CDFs, no binning approximation.
    *
    * Scale: the fact table collapses to the distinct-cents histogram in
    * a map-side agg; the cumulative counts then come from [[PrefixSum]]
    * — range-partitioned local cumsums + partition-count offsets — so
    * the global CDF needs NO single-partition window even though its
    * order spans the whole value domain (DuckDB states the same thing
    * with a plain window, fine for an oracle). The final max is one
    * scan. Int64 budget: cum·n ≤ n², safe through ~3·10⁹ rows/side.
    *
    * Parity: everything before the final division is exact int64; ties
    * are immaterial because the CDF is read per distinct value (the
    * PrefixSum tie contract). */
  def q147Ks(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      expr("cast(round(o_totalprice * 100) as bigint)").as("pc"),
      (col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .as("is_new"))
    val h = o.groupBy("pc")
      .agg(count(when(!col("is_new"), 1)).as("ca"),
        count(when(col("is_new"), 1)).as("cb"))
    val c = PrefixSum.withPrefixSums(h, Seq(col("pc")),
      Seq((col("ca"), "cuma"), (col("cb"), "cumb")))
    // side totals as driver scalars (q121/q133 discipline) so the
    // per-row cross-multiplication needs no one-row broadcast join
    val totRow = h.agg(sum("ca"), sum("cb")).head
    val (ta, tb) = (totRow.getLong(0), totRow.getLong(1))
    c.agg(max(abs(col("cuma") * tb - col("cumb") * ta)).as("ks_num"))
      .select(col("ks_num"), lit(ta * tb).as("ks_den"),
        round(col("ks_num").cast("double") / (ta * tb), 6).as("ks"))
  }

  val q147KsSql: String =
    """WITH o AS (
      |  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS pc,
      |    o_orderdate >= TIMESTAMP '1999-01-01' AS is_new
      |  FROM orders),
      |h AS (
      |  SELECT pc, COUNT(*) FILTER (WHERE NOT is_new) AS ca,
      |    COUNT(*) FILTER (WHERE is_new) AS cb
      |  FROM o GROUP BY pc),
      |c AS (
      |  SELECT pc,
      |    SUM(ca) OVER (ORDER BY pc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
      |    SUM(cb) OVER (ORDER BY pc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
      |  FROM h),
      |tot AS (SELECT SUM(ca) AS ta, SUM(cb) AS tb FROM h)
      |SELECT CAST(MAX(ABS(cuma * tb - cumb * ta)) AS BIGINT) AS ks_num,
      |  CAST(MAX(ta * tb) AS BIGINT) AS ks_den,
      |  ROUND(CAST(MAX(ABS(cuma * tb - cumb * ta)) AS DOUBLE)
      |    / MAX(ta * tb), 6) AS ks
      |FROM c, tot""".stripMargin

  /** Functional-dependency discovery over declared candidates — the
    * data-profiling partner of q122's value census and q123's FK
    * audit: for each candidate A→B, how many A-values exist, how many
    * map to MORE than one B (violations), and whether the dependency
    * holds exactly. Mined FDs drive normalization, key inference and
    * anomaly screens ("this feed suddenly violates custkey→nation").
    *
    * Parity: pure exact counts; `holds` is a boolean both engines
    * derive from the same integer.
    *
    * Scale: one map-side-combinable (lhs → distinct-rhs) hash agg per
    * candidate, each collapsing to one row before the bounded union —
    * the q123 shape. Candidate lists are metadata-sized; nothing here
    * is quadratic in values. */
  def q142FdDiscovery(s: SparkSession, dir: String): DataFrame = {
    def fd(name: String, df: DataFrame, lhs: String, rhs: String) =
      df.groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("nd"))
        .agg(count(lit(1)).as("n_lhs"),
          count(when(col("nd") > 1, 1)).as("n_violating"))
        .select(lit(name).as("fd"), col("n_lhs"), col("n_violating"),
          (col("n_violating") === 0).as("holds"))
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    Seq(
      fd("customer.c_custkey->c_nationkey", c, "c_custkey", "c_nationkey"),
      fd("lineitem.l_orderkey->l_returnflag", l, "l_orderkey", "l_returnflag"),
      fd("lineitem.l_partkey->l_suppkey", l, "l_partkey", "l_suppkey"),
      fd("nation.n_nationkey->n_regionkey", n, "n_nationkey", "n_regionkey"),
      fd("orders.o_custkey->o_orderpriority", o, "o_custkey", "o_orderpriority"),
      fd("orders.o_orderkey->o_orderpriority", o, "o_orderkey", "o_orderpriority"))
      .reduce(_.unionByName(_))
      .orderBy("fd")
  }

  val q142FdDiscoverySql: String = {
    def fd(name: String, table: String, lhs: String, rhs: String): String =
      s"""SELECT '$name' AS fd, COUNT(*) AS n_lhs,
         |  COUNT(*) FILTER (WHERE nd > 1) AS n_violating,
         |  COUNT(*) FILTER (WHERE nd > 1) = 0 AS holds
         |FROM (SELECT $lhs, COUNT(DISTINCT $rhs) AS nd
         |      FROM $table GROUP BY $lhs)""".stripMargin
    Seq(
      fd("customer.c_custkey->c_nationkey", "customer", "c_custkey", "c_nationkey"),
      fd("lineitem.l_orderkey->l_returnflag", "lineitem", "l_orderkey", "l_returnflag"),
      fd("lineitem.l_partkey->l_suppkey", "lineitem", "l_partkey", "l_suppkey"),
      fd("nation.n_nationkey->n_regionkey", "nation", "n_nationkey", "n_regionkey"),
      fd("orders.o_custkey->o_orderpriority", "orders", "o_custkey", "o_orderpriority"),
      fd("orders.o_orderkey->o_orderpriority", "orders", "o_orderkey", "o_orderpriority"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY fd")
  }

  /** Deterministic stratified train/val/test split — the corpus-prep
    * step every training pipeline runs before anything touches a model:
    * each document lands in exactly one of train (80%), val (10%) or
    * test (10%) by a pure function of its id, so the assignment is
    * reproducible across runs, engines, partitionings and re-ingests
    * (no `rand()`, no sampling state to persist). The census per
    * (lang, split) is what a curation dashboard shows to confirm the
    * holdout is balanced within every stratum.
    *
    * Parity: the bucket is the q127 LCG discipline — doc_id reduced mod
    * 1000003 BEFORE the multiply (the q92 overflow lesson), one shared
    * 64-bit-exact integer expression in both engines; counts and char
    * sums are exact int64, the mean divides once int64→double.
    *
    * Scale: one map-side-combinable hash agg over a pure per-row
    * projection — no shuffle beyond the 15-group agg, no window, no
    * sort until the bounded output. The split column itself is the
    * thing a 100 TB run writes via the S6 partitioned sink
    * (`partitionBy("split")`), making each subset scan partition-pruned
    * downstream. */
  def q134StratSplit(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val b = pmod(pmod(col("doc_id"), lit(1000003L)) * 1103515245L + 12345L,
      lit(1000000007L)) % 10
    d.withColumn("split",
        when(b < 8, lit("train")).when(b === 8, lit("val"))
          .otherwise(lit("test")))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("tot_chars"),
        round(sum(col("n_chars")).cast("double") / count(lit(1)), 4)
          .as("avg_chars"))
      .orderBy("lang", "split")
  }

  val q134StratSplitSql: String =
    """WITH t AS (
      |  SELECT lang, n_chars,
      |    ((doc_id % 1000003) * 1103515245 + 12345) % 1000000007 % 10 AS b
      |  FROM documents)
      |SELECT lang,
      |  CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
      |       ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS tot_chars,
      |  ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS avg_chars
      |FROM t GROUP BY lang, split ORDER BY lang, split""".stripMargin

  /** Gopher/C4-style heuristic quality-rule bundle — the classic
    * pre-training filter family ([PK] Rae et al. 2021 §A1.1, Raffel
    * et al. 2020 §2.2) as ONE census query: per rule, how many
    * documents it would drop, plus the any-rule union and the retained
    * remainder. Rules (composing the q44/q46/q91 kernel shapes):
    *
    *  - symbol_ratio: (# + … occurrences) / words > 1/10
    *  - bullet_lines / ellipsis_lines: > 9/10 of lines start with a
    *    bullet; > 3/10 end with '...'
    *  - stopword_absent: none of {the, a, of, and, to} present
    *  - mean_word_len outside [4.2, 4.8] (Gopher's [3,10] band scaled
    *    to this synthetic vocabulary, where every mean sits in
    *    [3.7, 5.3] — the bound is the corpus-calibrated analogue)
    *  - word_count outside [40, 100000]
    *
    * Parity discipline: every threshold is an exact INTEGER
    * cross-multiplication (sum_len·10 < n_words·42, not mean < 4.2 —
    * no float boundary can flip an engine), word-char totals derive
    * from length(text) − spaces, and shares use the half-up integer
    * division both engines compute identically. Scale: one projection
    * per document (codegen HOFs, no shuffle) into a single global
    * aggregate of constant width; the census unpivot is 8 literal
    * struct rows. */
  def q162GopherRules(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val nw = (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1)
      .cast("long")
    val sumLen = length(regexp_replace(col("text"), " ", "")).cast("long")
    val nSym = (length(col("text")) - length(regexp_replace(col("text"), "#", "")) +
      (length(col("text")) -
        length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3).cast("long")
    val lines = split(col("text"), "\n")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, x =>
      substring(x, 1, 1).isin("-", "*", "•"))).cast("long")
    val nEll = size(filter(lines, x => x.endsWith("..."))).cast("long")
    val flags = d.select(
      (nSym * 10 > nw).as("f_sym"),
      (nBullet * 10 > nLines * 9).as("f_bullet"),
      (nEll * 10 > nLines * 3).as("f_ell"),
      (!arrays_overlap(split(col("text"), " "),
        array(lit("the"), lit("a"), lit("of"), lit("and"), lit("to"))))
        .as("f_stop"),
      (sumLen * 10 < nw * 42 || sumLen * 10 > nw * 48).as("f_mwl"),
      (nw < 40 || nw > 100000).as("f_wc"))
      .withColumn("f_any",
        col("f_sym") || col("f_bullet") || col("f_ell") || col("f_stop") ||
          col("f_mwl") || col("f_wc"))
    def cnt(c: String) = sum(when(col(c), 1L).otherwise(0L))
    val agg = flags.agg(
      count(lit(1)).as("total"), cnt("f_sym").as("n_sym"),
      cnt("f_bullet").as("n_bullet"), cnt("f_ell").as("n_ell"),
      cnt("f_stop").as("n_stop"), cnt("f_mwl").as("n_mwl"),
      cnt("f_wc").as("n_wc"), cnt("f_any").as("n_any"))
    val census = agg.select(col("total"), explode(array(
      struct(lit("any_rule").as("rule"), col("n_any").as("n_docs")),
      struct(lit("bullet_lines").as("rule"), col("n_bullet").as("n_docs")),
      struct(lit("ellipsis_lines").as("rule"), col("n_ell").as("n_docs")),
      struct(lit("mean_word_len").as("rule"), col("n_mwl").as("n_docs")),
      struct(lit("retained").as("rule"), (col("total") - col("n_any")).as("n_docs")),
      struct(lit("stopword_absent").as("rule"), col("n_stop").as("n_docs")),
      struct(lit("symbol_ratio").as("rule"), col("n_sym").as("n_docs")),
      struct(lit("word_count").as("rule"), col("n_wc").as("n_docs"))
    )).as("r")).select(col("r.rule").as("rule"), col("r.n_docs").as("n_docs"),
      col("total"))
    val h = col("n_docs") * 20000L + col("total")
    val d2 = col("total") * 2L
    census.select(col("rule"), col("n_docs"),
        (((h - pmod(h, d2)) / d2).cast("long") / 10000.0).as("share"))
      .orderBy("rule")
  }

  val q162GopherRulesSql: String =
    """WITH f AS (
      |  SELECT
      |    (length(text) - length(replace(text, '#', ''))
      |      + (length(text) - length(replace(text, '...', ''))) // 3) * 10
      |      > (length(text) - length(replace(text, ' ', '')) + 1) AS f_sym,
      |    len(list_filter(string_split(text, chr(10)),
      |      l -> substr(l, 1, 1) IN ('-', '*', chr(8226)))) * 10
      |      > len(string_split(text, chr(10))) * 9 AS f_bullet,
      |    len(list_filter(string_split(text, chr(10)),
      |      l -> ends_with(l, '...'))) * 10
      |      > len(string_split(text, chr(10))) * 3 AS f_ell,
      |    len(list_intersect(string_split(text, ' '),
      |      ['the', 'a', 'of', 'and', 'to'])) = 0 AS f_stop,
      |    length(replace(text, ' ', '')) * 10
      |        < (length(text) - length(replace(text, ' ', '')) + 1) * 42
      |      OR length(replace(text, ' ', '')) * 10
      |        > (length(text) - length(replace(text, ' ', '')) + 1) * 48 AS f_mwl,
      |    (length(text) - length(replace(text, ' ', '')) + 1) < 40
      |      OR (length(text) - length(replace(text, ' ', '')) + 1) > 100000
      |      AS f_wc
      |  FROM documents),
      |agg AS (
      |  SELECT COUNT(*) AS total,
      |    CAST(SUM(CASE WHEN f_sym THEN 1 ELSE 0 END) AS BIGINT) AS n_sym,
      |    CAST(SUM(CASE WHEN f_bullet THEN 1 ELSE 0 END) AS BIGINT) AS n_bullet,
      |    CAST(SUM(CASE WHEN f_ell THEN 1 ELSE 0 END) AS BIGINT) AS n_ell,
      |    CAST(SUM(CASE WHEN f_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
      |    CAST(SUM(CASE WHEN f_mwl THEN 1 ELSE 0 END) AS BIGINT) AS n_mwl,
      |    CAST(SUM(CASE WHEN f_wc THEN 1 ELSE 0 END) AS BIGINT) AS n_wc,
      |    CAST(SUM(CASE WHEN f_sym OR f_bullet OR f_ell OR f_stop OR f_mwl
      |      OR f_wc THEN 1 ELSE 0 END) AS BIGINT) AS n_any
      |  FROM f),
      |census AS (
      |  SELECT 'any_rule' AS rule, n_any AS n_docs, total FROM agg
      |  UNION ALL SELECT 'bullet_lines', n_bullet, total FROM agg
      |  UNION ALL SELECT 'ellipsis_lines', n_ell, total FROM agg
      |  UNION ALL SELECT 'mean_word_len', n_mwl, total FROM agg
      |  UNION ALL SELECT 'retained', total - n_any, total FROM agg
      |  UNION ALL SELECT 'stopword_absent', n_stop, total FROM agg
      |  UNION ALL SELECT 'symbol_ratio', n_sym, total FROM agg
      |  UNION ALL SELECT 'word_count', n_wc, total FROM agg)
      |SELECT rule, n_docs,
      |  ((n_docs * 20000 + total) // (total * 2)) / 10000.0 AS share
      |FROM census ORDER BY rule""".stripMargin

  /** k-anonymity generalization ladder — the privacy audit a curation
    * pipeline runs before releasing tabular training data: at each
    * quasi-identifier generalization level (fine: nation × segment ×
    * $1k balance band; mid: × $5k band; coarse: nation × segment
    * only), how many QI groups exist, how many are smaller than k = 5,
    * and how many rows those small groups expose. Choosing the release
    * level IS reading this table: the coarsest level whose
    * rows-at-risk share is acceptable.
    *
    * Parity: bands come from floor(c_acctbal / const) — one IEEE
    * double division + floor, bit-identical across engines, and the
    * band value is only a GROUP KEY (never output). Scale: three
    * grouped counts — map-side-combinable, group cardinality ≤
    * nations × segments × bands (bounded), union of three
    * constant-width aggregates. */
  def q164KAnonymity(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    def level(name: String, keys: Seq[Column]): DataFrame =
      c.groupBy(keys: _*).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("n") < 5, 1L).otherwise(0L)).as("n_small"),
          sum(when(col("n") < 5, col("n")).otherwise(0L)).as("rows_at_risk"),
          sum("n").as("total"))
        .select(lit(name).as("level"), col("n_groups"), col("n_small"),
          col("rows_at_risk"), col("total"))
    val fine = level("1_fine", Seq(col("c_nationkey"), col("c_mktsegment"),
      floor(col("c_acctbal") / 1000)))
    val mid = level("2_mid", Seq(col("c_nationkey"), col("c_mktsegment"),
      floor(col("c_acctbal") / 5000)))
    val coarse = level("3_coarse", Seq(col("c_nationkey"), col("c_mktsegment")))
    val h = col("rows_at_risk") * 20000L + col("total")
    val d2 = col("total") * 2L
    fine.unionByName(mid).unionByName(coarse)
      .select(col("level"), col("n_groups"), col("n_small"),
        col("rows_at_risk"),
        (((h - pmod(h, d2)) / d2).cast("long") / 10000.0).as("risk_share"))
      .orderBy("level")
  }

  val q164KAnonymitySql: String =
    """WITH
      |f AS (SELECT c_nationkey, c_mktsegment, floor(c_acctbal / 1000) AS b,
      |        COUNT(*) AS n FROM customer GROUP BY 1, 2, 3),
      |m AS (SELECT c_nationkey, c_mktsegment, floor(c_acctbal / 5000) AS b,
      |        COUNT(*) AS n FROM customer GROUP BY 1, 2, 3),
      |c AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
      |        FROM customer GROUP BY 1, 2),
      |lv AS (
      |  SELECT '1_fine' AS level, COUNT(*) AS n_groups,
      |    CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
      |    CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
      |    CAST(SUM(n) AS BIGINT) AS total FROM f
      |  UNION ALL
      |  SELECT '2_mid', COUNT(*),
      |    CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT),
      |    CAST(SUM(n) AS BIGINT) FROM m
      |  UNION ALL
      |  SELECT '3_coarse', COUNT(*),
      |    CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT),
      |    CAST(SUM(n) AS BIGINT) FROM c)
      |SELECT level, n_groups, n_small, rows_at_risk,
      |  ((rows_at_risk * 20000 + total) // (total * 2)) / 10000.0 AS risk_share
      |FROM lv ORDER BY level""".stripMargin

  /** L118 quantile normalization (Bolstad et al. 2003): force every
    * source's n_chars distribution onto the pooled reference — each
    * document's value is replaced by the MEAN across sources of the
    * value at its within-source rank. The batch-effect corrector for
    * multi-source corpora: after it, every source has literally the
    * same marginal distribution, so downstream length filters can't
    * favor one feed. Distinct from winsorize (L58: clips tails
    * per-group) and PSI (L75: measures drift, doesn't fix it).
    *
    * Parity: ranks are tie-broken row_numbers (exact), the reference
    * is one double division of exact int64 sum/count per rank, rounded
    * 4dp — no float accumulation across rows.
    *
    * Scale: the within-source rank is a per-source sort — at fixture
    * scale one |sources|-partition window; at 100 TB the same rank
    * comes from the L35/L77 range-partitioned machinery (RangedNtile's
    * sampled cutpoints + per-range offsets), same semantics. The
    * reference table is rank-keyed (rows = max group size, corpus/
    * |sources|) and joins back as the small side. */
  def q180QuantileNorm(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val ranked = d.withColumn("rnk", row_number().over(
      Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))))
    val ref = ranked.groupBy("rnk")
      .agg(sum(col("n_chars")).as("s"), count(lit(1)).as("c"))
    ranked.join(ref, "rnk")
      .select(col("doc_id"), col("source"), col("n_chars"),
        round(col("s").cast("double") / col("c").cast("double"), 4).as("qn"))
      .orderBy("doc_id")
  }

  val q180QuantileNormSql: String =
    """WITH ranked AS (
      |  SELECT doc_id, source, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS rnk
      |  FROM documents),
      |ref AS (
      |  SELECT rnk, CAST(SUM(n_chars) AS BIGINT) AS s, COUNT(*) AS c
      |  FROM ranked GROUP BY rnk)
      |SELECT doc_id, source, n_chars,
      |  ROUND(CAST(s AS DOUBLE) / CAST(c AS DOUBLE), 4) AS qn
      |FROM ranked JOIN ref USING (rnk)
      |ORDER BY doc_id""".stripMargin

  /** L119 exact ROC AUC via the Mann–Whitney rank statistic: how well
    * does n_chars separate the q179 focus source from the rest? AUC =
    * P(score_pos > score_neg) + ½P(=) — the threshold-free evaluation
    * every quality-classifier pipeline reports, computed EXACTLY with
    * tie handling (no trapezoid approximation): over distinct scores,
    * numerator·2 = Σ 2·p_s·(negs strictly below s) + p_s·q_s, an exact
    * int64; AUC is one final division by 2·n_pos·n_neg, rounded 6dp.
    *
    * Scale: the q147 KS shape — a distinct-score census (map-side
    * combinable, rows bounded by the VALUE DOMAIN, not the corpus)
    * then [[PrefixSum]]'s distributed running sum over it and a single
    * global aggregate; the corpus is never globally sorted or ranked. */
  def q181Auc(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("n_chars").as("sc"),
      (col("source") === "src0").as("pos"))
    val h = d.groupBy("sc")
      .agg(count(when(col("pos"), 1)).as("p"),
        count(when(!col("pos"), 1)).as("q"))
    val c = PrefixSum.withPrefixSums(h, Seq(col("sc")),
      Seq((col("q"), "cumq")))
    c.agg(sum(col("p")).as("n_pos"), sum(col("q")).as("n_neg"),
        sum(col("p") * (col("cumq") - col("q")) * lit(2L) +
          col("p") * col("q")).as("num2"))
      .select(col("n_pos"), col("n_neg"), col("num2"),
        round(col("num2").cast("double") /
          (col("n_pos") * col("n_neg") * lit(2L)).cast("double"), 6).as("auc"))
  }

  val q181AucSql: String =
    """WITH d AS (
      |  SELECT n_chars AS sc, source = 'src0' AS pos FROM documents),
      |h AS (
      |  SELECT sc, COUNT(*) FILTER (WHERE pos) AS p,
      |    COUNT(*) FILTER (WHERE NOT pos) AS q
      |  FROM d GROUP BY sc),
      |c AS (
      |  SELECT sc, p, q,
      |    SUM(q) OVER (ORDER BY sc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumq
      |  FROM h)
      |SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
      |  CAST(SUM(q) AS BIGINT) AS n_neg,
      |  CAST(SUM(p * (cumq - q) * 2 + p * q) AS BIGINT) AS num2,
      |  ROUND(CAST(SUM(p * (cumq - q) * 2 + p * q) AS DOUBLE)
      |    / CAST(SUM(p) * SUM(q) * 2 AS DOUBLE), 6) AS auc
      |FROM c""".stripMargin

  /** L120 exact 1-D Wasserstein distance (earth mover's): W₁ between
    * the focus source's n_chars distribution and the rest — the
    * INTEGRATED CDF deviation ∫|F₁−F₂|dx, the drift measure that sees
    * magnitude where KS (L76, max deviation) sees only the worst point
    * and PSI (L75) sees only bin occupancy. num = Σ_s |cuma·tb −
    * cumb·ta|·Δ_s stays an exact int64 (sf ≲ 10³; DECIMAL(38) lift
    * documented past that); W₁ is one final division by ta·tb.
    *
    * Scale: the q147 shape end-to-end — value-domain-bounded census,
    * [[PrefixSum]] running counts, and the "next distinct value" gap
    * WITHOUT a global lead window: the row index is just a prefix sum
    * of ones, so Δ comes from an equi-join on idx+1. */
  def q182Emd(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("n_chars").as("sc"),
      (col("source") === "src0").as("pos"))
    val h = d.groupBy("sc")
      .agg(count(when(col("pos"), 1)).as("p"),
        count(when(!col("pos"), 1)).as("q"))
    val c = PrefixSum.withPrefixSums(h, Seq(col("sc")),
      Seq((lit(1L), "idx"), (col("p"), "cuma"), (col("q"), "cumb")))
    val totRow = h.agg(sum("p"), sum("q")).head
    val (ta, tb) = (totRow.getLong(0), totRow.getLong(1))
    val nxt = c.select((col("idx") - 1L).as("idx"), col("sc").as("next_sc"))
    c.join(nxt, Seq("idx"), "left")
      .agg(sum(abs(col("cuma") * tb - col("cumb") * ta) *
        (coalesce(col("next_sc"), col("sc")) - col("sc"))).as("w1_num"))
      .select(col("w1_num"), lit(ta * tb).as("w1_den"),
        round(col("w1_num").cast("double") / (ta * tb).toDouble, 6).as("w1"))
  }

  val q182EmdSql: String =
    """WITH d AS (
      |  SELECT n_chars AS sc, source = 'src0' AS pos FROM documents),
      |h AS (
      |  SELECT sc, COUNT(*) FILTER (WHERE pos) AS p,
      |    COUNT(*) FILTER (WHERE NOT pos) AS q
      |  FROM d GROUP BY sc),
      |c AS (
      |  SELECT sc, p, q,
      |    SUM(p) OVER (ORDER BY sc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
      |    SUM(q) OVER (ORDER BY sc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
      |    LEAD(sc) OVER (ORDER BY sc) AS next_sc
      |  FROM h),
      |tot AS (SELECT SUM(p) AS ta, SUM(q) AS tb FROM h)
      |SELECT
      |  CAST(SUM(ABS(cuma * tb - cumb * ta)
      |    * (COALESCE(next_sc, sc) - sc)) AS BIGINT) AS w1_num,
      |  CAST(MAX(ta * tb) AS BIGINT) AS w1_den,
      |  ROUND(CAST(SUM(ABS(cuma * tb - cumb * ta)
      |    * (COALESCE(next_sc, sc) - sc)) AS DOUBLE)
      |    / MAX(ta * tb), 6) AS w1
      |FROM c, tot""".stripMargin

  /** L121 Cohen's kappa: chance-corrected agreement between two
    * independent quality raters — here the q162 Gopher mean-word-length
    * rule vs the stopword-absence rule — the inter-annotator statistic
    * a labeling pipeline reports before trusting auto-labels (raw
    * percent agreement is inflated when both raters mostly say "keep").
    * κ = (n·(n₁₁+n₀₀) − pe_num)/(n² − pe_num) with pe_num = r₁c₁+r₀c₀
    * — every term an exact int64 product from the 2×2 confusion
    * census; one final division, 6dp.
    *
    * Scale: two codegen'd boolean columns, one map-side-combinable
    * 4-counter aggregate, one output row — no shuffle beyond the
    * single partial/final exchange. */
  def q183Kappa(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val nw = (length(col("text")) -
      length(regexp_replace(col("text"), " ", "")) + 1).cast("long")
    val sumLen = length(regexp_replace(col("text"), " ", "")).cast("long")
    val ra = (sumLen * 10 < nw * 42 || sumLen * 10 > nw * 48)
    val rb = !arrays_overlap(split(col("text"), " "),
      array(lit("the"), lit("a"), lit("of"), lit("and"), lit("to")))
    val cts = d.select(ra.as("ra"), rb.as("rb"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("ra") && col("rb"), 1L).otherwise(0L)).as("n11"),
        sum(when(col("ra") && !col("rb"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("ra") && col("rb"), 1L).otherwise(0L)).as("n01"),
        sum(when(!col("ra") && !col("rb"), 1L).otherwise(0L)).as("n00"))
    val r1 = col("n11") + col("n10")
    val c1 = col("n11") + col("n01")
    val peNum = r1 * c1 + (col("n") - r1) * (col("n") - c1)
    cts.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      round((col("n") * (col("n11") + col("n00")) - peNum).cast("double") /
        (col("n") * col("n") - peNum).cast("double"), 6).as("kappa"))
  }

  val q183KappaSql: String =
    """WITH f AS (
      |  SELECT
      |    length(replace(text, ' ', '')) * 10
      |        < (length(text) - length(replace(text, ' ', '')) + 1) * 42
      |      OR length(replace(text, ' ', '')) * 10
      |        > (length(text) - length(replace(text, ' ', '')) + 1) * 48 AS ra,
      |    len(list_intersect(string_split(text, ' '),
      |      ['the', 'a', 'of', 'and', 'to'])) = 0 AS rb
      |  FROM documents),
      |cts AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS n11,
      |    CAST(SUM(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS n10,
      |    CAST(SUM(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS n01,
      |    CAST(SUM(CASE WHEN NOT ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n00
      |  FROM f)
      |SELECT n, n11, n10, n01, n00,
      |  ROUND(CAST(n * (n11 + n00)
      |      - ((n11 + n10) * (n11 + n01) + (n - n11 - n10) * (n - n11 - n01))
      |      AS DOUBLE)
      |    / CAST(n * n
      |      - ((n11 + n10) * (n11 + n01) + (n - n11 - n10) * (n - n11 - n01))
      |      AS DOUBLE), 6) AS kappa
      |FROM cts""".stripMargin

  /** L122 distributed Poisson bootstrap: a 95 % percentile confidence
    * interval for mean n_chars from B = 200 resamples — THE resampling
    * scheme that works at fact scale (Efron's classic bootstrap needs a
    * global sample per replicate; the Poisson approximation gives every
    * row an independent Poisson(1) replication count, so each replicate
    * is one map-side-combinable weighted aggregate — Chamandy et al.'s
    * streaming-scale estimator). Deterministic by construction: the
    * replication count comes from the q127 LCG hash of (doc_id, b)
    * against exact integer CDF thresholds ⌊P·CDF_Pois(1)(k)⌋, so both
    * engines draw literally the same resamples — no RNG state anywhere.
    *
    * Parity: each replicate mean is ONE int64/int64 division (exact
    * IEEE bits), so the rank ordering of the 200 means and the rank-5 /
    * rank-196 percentile picks are engine-independent; the point mean
    * rides as driver scalars (q121 discipline).
    *
    * Scale: corpus × B rows exist only between the generate and the
    * partial agg in the same stage — the shuffle carries ≤ B·tasks
    * partial rows into B groups; the rank window sees exactly B rows. */
  def q184Bootstrap(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    val totRow = d.agg(sum("n_chars"), count(lit(1))).head
    val (sx, n) = (totRow.getLong(0), totRow.getLong(1))
    val reps = d.select(col("doc_id"), col("n_chars"),
      explode(expr("sequence(0L, 199L)")).as("b"))
    val h = pmod(col("doc_id") * lit(1103515245L) +
      col("b") * lit(2654435761L) + lit(12345L), lit(1000000007L))
    val w = when(h < 367879443L, 0L).when(h < 735758887L, 1L)
      .when(h < 919698609L, 2L).when(h < 981011849L, 3L)
      .when(h < 996340160L, 4L).when(h < 999405822L, 5L)
      .when(h < 999916765L, 6L).otherwise(7L)
    val repMeans = reps.withColumn("w", w)
      .groupBy("b")
      .agg(sum(col("w") * col("n_chars")).as("swx"), sum(col("w")).as("sw"))
      .select(col("b"),
        (col("swx").cast("double") / col("sw").cast("double")).as("m"))
    val ranked = repMeans.withColumn("rn",
      row_number().over(Window.orderBy(col("m"), col("b"))))
    ranked.agg(
        round(min(when(col("rn") === 5, col("m"))), 6).as("ci_lo"),
        round(min(when(col("rn") === 196, col("m"))), 6).as("ci_hi"))
      .select(lit(n).as("n_docs"), lit(200).as("n_reps"),
        round(lit(sx.toDouble / n.toDouble), 6).as("mean"),
        col("ci_lo"), col("ci_hi"))
  }

  val q184BootstrapSql: String =
    """WITH reps AS (
      |  SELECT b.b, d.n_chars,
      |    ((d.doc_id * 1103515245 + b.b * 2654435761 + 12345)
      |      % 1000000007 + 1000000007) % 1000000007 AS h
      |  FROM documents d
      |  CROSS JOIN (SELECT unnest(range(0, 200)) AS b) b),
      |w AS (
      |  SELECT b, n_chars,
      |    CASE WHEN h < 367879443 THEN 0 WHEN h < 735758887 THEN 1
      |         WHEN h < 919698609 THEN 2 WHEN h < 981011849 THEN 3
      |         WHEN h < 996340160 THEN 4 WHEN h < 999405822 THEN 5
      |         WHEN h < 999916765 THEN 6 ELSE 7 END AS w
      |  FROM reps),
      |rm AS (
      |  SELECT b, CAST(SUM(w * n_chars) AS DOUBLE)
      |    / CAST(SUM(w) AS DOUBLE) AS m
      |  FROM w GROUP BY b),
      |r AS (SELECT b, m, ROW_NUMBER() OVER (ORDER BY m, b) AS rn FROM rm),
      |tot AS (SELECT COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS s
      |        FROM documents)
      |SELECT tot.n AS n_docs, 200 AS n_reps,
      |  ROUND(CAST(tot.s AS DOUBLE) / tot.n, 6) AS mean,
      |  ROUND(MIN(CASE WHEN rn = 5 THEN m END), 6) AS ci_lo,
      |  ROUND(MIN(CASE WHEN rn = 196 THEN m END), 6) AS ci_hi
      |FROM r, tot GROUP BY tot.n, tot.s""".stripMargin

  /** L124 chi-square test of independence (Pearson [PK]) on the
    * lang × source contingency table — "is the language mix the same
    * across sources?", the categorical-association readout the family
    * still lacked: q172 tests ONE proportion pair, q183 agreement on a
    * shared key, q146/q185 continuous/vocab distributions; this is the
    * R×C categorical test plus its effect size (Cramér's V), the
    * standard screen before stratifying a training mix by (source,
    * lang).
    *
    * Includes EMPTY cells: the grid is the cross join of the observed
    * margins (R×C ≤ 100 rows), left-joined with observed counts, so a
    * source with zero docs in some language still contributes its
    * (0−E)²/E term — dropping those understates χ² exactly where the
    * association is strongest.
    *
    * Parity: O and margins are exact int64; each cell's term is
    * quantized once to micro-units before the integer SUM (q185
    * discipline); χ² and V are then one fixed int→double chain, and
    * sqrt is IEEE-correctly-rounded in both engines.
    *
    * Scale: three map-side-combinable counts over the corpus plus a
    * ≤|langs|·|sources| driver-free grid agg. The two margin counts
    * broadcast; nothing shuffles more than the (lang, source) census. */
  def q186Chi2(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val obs = d.groupBy("lang", "source").agg(count(lit(1)).as("o"))
    val langs = d.groupBy("lang").agg(count(lit(1)).as("rl"))
    // N rides the |sources|-row margin via a tiny window (Σcs = N), so
    // the plan needs exactly ONE deliberate broadcast cross join — the
    // R×C grid — and no one-row join (PLANS.md BNLJ allowlist).
    val srcs = d.groupBy("source").agg(count(lit(1)).as("cs"))
      .withColumn("n", sum(col("cs")).over(Window.partitionBy()))
    val grid = broadcast(langs).crossJoin(broadcast(srcs))
      .join(obs, Seq("lang", "source"), "left")
      .na.fill(0L, Seq("o"))
    val e = (col("rl") * col("cs")).cast("double") / col("n").cast("double")
    val dev = col("o").cast("double") - e
    grid
      .select(col("lang"), col("source"), col("n"),
        floor(dev * dev / e * lit(1.0e6) + lit(0.5)).cast("long").as("cq"))
      .agg(max(col("n")).as("n_docs"),
        countDistinct(col("lang")).as("r"),
        countDistinct(col("source")).as("c"),
        sum("cq").as("sq"))
      .select(
        col("n_docs"),
        ((col("r") - 1L) * (col("c") - 1L)).as("df"),
        (col("sq").cast("double") / lit(1.0e6)).as("chi2"),
        sqrt((col("sq").cast("double") / lit(1.0e6)) /
          (col("n_docs") * least(col("r") - 1L, col("c") - 1L)).cast("double"))
          .as("cramers_v"))
  }

  val q186Chi2Sql: String =
    """WITH obs AS (
      |  SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2),
      |l AS (SELECT lang, COUNT(*) AS rl FROM documents GROUP BY 1),
      |s AS (SELECT source, COUNT(*) AS cs,
      |             CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n
      |      FROM documents GROUP BY 1),
      |grid AS (
      |  SELECT l.lang, s.source, rl, cs, n, COALESCE(o, 0) AS o
      |  FROM l CROSS JOIN s
      |  LEFT JOIN obs ON obs.lang = l.lang AND obs.source = s.source),
      |q AS (
      |  SELECT lang, source, n,
      |    CAST(FLOOR(
      |      (CAST(o AS DOUBLE) - CAST(rl * cs AS DOUBLE) / CAST(n AS DOUBLE))
      |      * (CAST(o AS DOUBLE) - CAST(rl * cs AS DOUBLE) / CAST(n AS DOUBLE))
      |      / (CAST(rl * cs AS DOUBLE) / CAST(n AS DOUBLE))
      |      * 1e6 + 0.5) AS BIGINT) AS cq
      |  FROM grid),
      |a AS (SELECT MAX(n) AS n_docs, COUNT(DISTINCT lang) AS r,
      |             COUNT(DISTINCT source) AS c, CAST(SUM(cq) AS BIGINT) AS sq
      |      FROM q)
      |SELECT n_docs, (r - 1) * (c - 1) AS df,
      |  CAST(sq AS DOUBLE) / 1e6 AS chi2,
      |  sqrt((CAST(sq AS DOUBLE) / 1e6)
      |    / CAST(n_docs * LEAST(r - 1, c - 1) AS DOUBLE)) AS cramers_v
      |FROM a""".stripMargin

  /** L129 Theil T inequality decomposition (Theil 1967 [PK]) of order
    * values by priority class — the inequality statistic Gini (q150)
    * can't give: Theil decomposes EXACTLY into within-group +
    * between-group terms (T = Σ_g w_g·T_g + Σ_g w_g·ln(μ_g/μ),
    * w_g = (n_g/N)(μ_g/μ)), so "is order-value inequality driven by
    * priority mix or within-class spread?" is answerable from the
    * emitted per-group rows alone; RankStatSpec pins the decomposition
    * identity against a driver brute force.
    *
    * Parity: group sums are exact decimals; means divide exact casts;
    * each row's (x/μ_g)ln(x/μ_g) term is nano-quantized before the
    * per-group integer SUM; the between/weight terms are a fixed
    * int→double chain off the ≤|priorities|-row aggregate.
    *
    * Scale: one keyed window for μ_g (partitioned on priority), one
    * keyed agg, then a ≤5-row unpartitioned window for the global
    * totals — the only single-partition window in the plan runs over
    * five rows. */
  def q191Theil(s: SparkSession, dir: String): DataFrame = {
    import Parity._
    val o = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("priority"),
        dm(col("o_totalprice")).as("x"))
    val wg = Window.partitionBy("priority")
    val mug = sum(col("x")).over(wg).cast("double") /
      count(lit(1)).over(wg).cast("double")
    val xr = col("x").cast("double") / col("mug")
    val perGroup = o.withColumn("mug", mug)
      .select(col("priority"), col("mug"),
        floor(xr * log(xr) * lit(1.0e9) + lit(0.5)).cast("long").as("tq"),
        col("x"))
      .groupBy("priority")
      .agg(count(lit(1)).as("n"), max(col("mug")).as("mu_g"),
        sum(col("x")).as("sum_g"), sum("tq").as("sq"))
    val wAll = Window.partitionBy()
    val bigN = sum(col("n")).over(wAll)
    val mu = sum(col("sum_g")).over(wAll).cast("double") /
      sum(col("n")).over(wAll).cast("double")
    perGroup
      .withColumn("mu", mu).withColumn("big_n", bigN)
      .select(col("priority"), col("n"), col("mu_g"),
        ((col("sq").cast("double") / lit(1.0e9)) /
          col("n").cast("double")).as("theil_within"),
        ((col("n").cast("double") / col("big_n").cast("double")) *
          (col("mu_g") / col("mu"))).as("weight"),
        (((col("n").cast("double") / col("big_n").cast("double")) *
          (col("mu_g") / col("mu"))) *
          log(col("mu_g") / col("mu"))).as("between_term"))
      .orderBy("priority")
  }

  val q191TheilSql: String =
    s"""WITH o AS (
       |  SELECT o_orderpriority AS priority,
       |    CAST(o_totalprice AS ${Parity.DM}) AS x
       |  FROM orders),
       |r AS (
       |  SELECT priority, x,
       |    CAST(SUM(x) OVER (PARTITION BY priority) AS DOUBLE)
       |      / CAST(COUNT(*) OVER (PARTITION BY priority) AS DOUBLE) AS mug
       |  FROM o),
       |g AS (
       |  SELECT priority, COUNT(*) AS n, MAX(mug) AS mu_g,
       |    SUM(x) AS sum_g,
       |    CAST(SUM(CAST(FLOOR(
       |      (CAST(x AS DOUBLE) / mug) * ln(CAST(x AS DOUBLE) / mug)
       |      * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS sq
       |  FROM r GROUP BY priority),
       |t AS (
       |  SELECT priority, n, mu_g, sq,
       |    CAST(SUM(n) OVER () AS BIGINT) AS big_n,
       |    CAST(SUM(sum_g) OVER () AS DOUBLE)
       |      / CAST(SUM(n) OVER () AS DOUBLE) AS mu
       |  FROM g)
       |SELECT priority, n, mu_g,
       |  (CAST(sq AS DOUBLE) / 1e9) / CAST(n AS DOUBLE) AS theil_within,
       |  (CAST(n AS DOUBLE) / CAST(big_n AS DOUBLE)) * (mu_g / mu) AS weight,
       |  ((CAST(n AS DOUBLE) / CAST(big_n AS DOUBLE)) * (mu_g / mu))
       |    * ln(mu_g / mu) AS between_term
       |FROM t ORDER BY priority""".stripMargin

  /** L133 l-diversity audit (Machanavajjhala et al. 2007 [PK]) — the
    * privacy check k-anonymity (q164) misses: a group can be large (k
    * safe) yet expose its members because the SENSITIVE attribute is
    * near-constant inside it. Per quasi-identifier group
    * (nation, order priority), measures distinct l, the entropy form
    * exp(H(sensitive)) (effective number of sensitive values — robust
    * to 99:1 skew that distinct-l calls diverse), and flags groups
    * below l = 3 with the row count at risk.
    *
    * Parity: counts exact int64; entropy terms nano-quantized before
    * the per-group integer SUM (q185 discipline); exp of the resulting
    * fixed double is IEEE-identical.
    *
    * Scale: two keyed map-side-combinable counts (group×sensitive,
    * then group) — the k-anon census shape with one extra key level. */
  def q195LDiversity(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val joined = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").as("nation"),
        col("o_orderpriority").as("priority"),
        col("o_orderstatus").as("status"))
    val cell = joined.groupBy("nation", "priority", "status")
      .agg(count(lit(1)).as("cs"))
    val wg = Window.partitionBy("nation", "priority")
    val n = sum(col("cs")).over(wg)
    val term = -(col("cs").cast("double") / col("n").cast("double")) *
      log(col("cs").cast("double") / col("n").cast("double"))
    cell.withColumn("n", n)
      .select(col("nation"), col("priority"), col("n"),
        floor(term * lit(1.0e9) + lit(0.5)).cast("long").as("tq"))
      .groupBy("nation", "priority", "n")
      .agg(count(lit(1)).as("l_distinct"), sum("tq").as("sq"))
      .select(col("nation"), col("priority"), col("n").as("n_rows"),
        col("l_distinct"),
        // exp is the one op in this chain where the two libms disagree
        // by 1 ulp — round to 6dp (the Parity.rnd residual-risk trade)
        round(exp(col("sq").cast("double") / lit(1.0e9)), 6).as("l_entropy"),
        when(col("l_distinct") < 3L, lit(1L)).otherwise(lit(0L))
          .as("below_l3"))
      .orderBy("nation", "priority")
  }

  val q195LDiversitySql: String =
    """WITH j AS (
      |  SELECT c_nationkey AS nation, o_orderpriority AS priority,
      |    o_orderstatus AS status
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |cell AS (
      |  SELECT nation, priority, status, COUNT(*) AS cs
      |  FROM j GROUP BY nation, priority, status),
      |w AS (
      |  SELECT nation, priority, cs,
      |    CAST(SUM(cs) OVER (PARTITION BY nation, priority) AS BIGINT) AS n
      |  FROM cell),
      |q AS (
      |  SELECT nation, priority, n,
      |    CAST(FLOOR(
      |      -(CAST(cs AS DOUBLE) / CAST(n AS DOUBLE))
      |        * ln(CAST(cs AS DOUBLE) / CAST(n AS DOUBLE))
      |      * 1e9 + 0.5) AS BIGINT) AS tq
      |  FROM w)
      |SELECT nation, priority, n AS n_rows, COUNT(*) AS l_distinct,
      |  ROUND(exp(CAST(SUM(tq) AS DOUBLE) / 1e9), 6) AS l_entropy,
      |  CAST(CASE WHEN COUNT(*) < 3 THEN 1 ELSE 0 END AS BIGINT) AS below_l3
      |FROM q GROUP BY nation, priority, n
      |ORDER BY nation, priority""".stripMargin

  /** L135 calibration / reliability table — the eval readout AUC
    * (q181) deliberately ignores: AUC scores RANKING, calibration asks
    * whether predicted probabilities MEAN what they say. Toy length
    * classifier for src0 membership: p̂ = (n_chars−min)/(max−min),
    * binned into 10 equal-width probability bins; per bin the mean
    * prediction, observed src0 rate, their absolute gap, and the bin's
    * weight — the table ECE = Σ (n_b/N)·|gap| summarizes (pinned
    * brute-force in RankStatSpec).
    *
    * Parity: bin assignment is an exact INT decision
    * ((sc−mn)·10 div (mx−mn+1), the q88 bounds discipline) so a 1-ulp
    * divergence can never flip a row's bin; p̂ is nano-quantized per
    * distinct length and summed as int64; every per-bin output is one
    * fixed int→double chain. Bounds ride a window over the
    * distinct-length census (≤ |lengths| rows), not a one-row join.
    *
    * Scale: one map-side-combinable length census, a tiny unpartitioned
    * window over it, a ≤10-group agg. */
  def q197Calibration(s: SparkSession, dir: String): DataFrame = {
    val h = Tables.documents(s, dir)
      .groupBy(col("n_chars").as("sc"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("source") === "src0", 1L).otherwise(0L)).as("pos"))
    val wAll = Window.partitionBy()
    val withB = h
      .withColumn("mn", min(col("sc")).over(wAll))
      .withColumn("mx", max(col("sc")).over(wAll))
    val span = col("mx") - col("mn")
    val bin = expr("(sc - mn) * 10 div (mx - mn + 1)")
    val phat = when(span > 0L,
      (col("sc") - col("mn")).cast("double") / span.cast("double"))
      .otherwise(lit(0.0))
    withB
      .select(bin.as("bin"), col("n"), col("pos"),
        (col("n") * floor(phat * lit(1.0e9) + lit(0.5)).cast("long"))
          .as("pq"))
      .groupBy("bin")
      .agg(sum("n").as("n_docs"), sum("pos").as("n_pos"),
        sum("pq").as("spq"))
      .select(col("bin"), col("n_docs"), col("n_pos"),
        ((col("spq").cast("double") / lit(1.0e9)) /
          col("n_docs").cast("double")).as("avg_pred"),
        (col("n_pos").cast("double") / col("n_docs").cast("double"))
          .as("obs_rate"),
        abs((col("spq").cast("double") / lit(1.0e9)) /
          col("n_docs").cast("double") -
          col("n_pos").cast("double") / col("n_docs").cast("double"))
          .as("abs_gap"))
      .orderBy("bin")
  }

  val q197CalibrationSql: String =
    """WITH h AS (
      |  SELECT n_chars AS sc, COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS pos
      |  FROM documents GROUP BY n_chars),
      |b AS (
      |  SELECT sc, n, pos,
      |    CAST(MIN(sc) OVER () AS BIGINT) AS mn,
      |    CAST(MAX(sc) OVER () AS BIGINT) AS mx
      |  FROM h),
      |q AS (
      |  SELECT (sc - mn) * 10 // (mx - mn + 1) AS bin, n, pos,
      |    n * CAST(FLOOR(
      |      CASE WHEN mx - mn > 0
      |        THEN CAST(sc - mn AS DOUBLE) / CAST(mx - mn AS DOUBLE)
      |        ELSE 0.0 END * 1e9 + 0.5) AS BIGINT) AS pq
      |  FROM b),
      |a AS (
      |  SELECT bin, CAST(SUM(n) AS BIGINT) AS n_docs,
      |    CAST(SUM(pos) AS BIGINT) AS n_pos,
      |    CAST(SUM(pq) AS BIGINT) AS spq
      |  FROM q GROUP BY bin)
      |SELECT bin, n_docs, n_pos,
      |  (CAST(spq AS DOUBLE) / 1e9) / CAST(n_docs AS DOUBLE) AS avg_pred,
      |  CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE) AS obs_rate,
      |  abs((CAST(spq AS DOUBLE) / 1e9) / CAST(n_docs AS DOUBLE)
      |    - CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS abs_gap
      |FROM a ORDER BY bin""".stripMargin

  /** L147 Mann–Whitney U rank-sum test (Mann & Whitney 1947 [PK]):
    * does the URGENT order population spend differently from the LOW
    * one? The NONPARAMETRIC two-sample location test — q172's z-test
    * compares binomial rates, this compares whole DISTRIBUTIONS by
    * rank, robust to the heavy price tails that invalidate a t-test.
    *
    * Exactness: prices pin to int64 cents; the value census carries
    * per-value n and group-1 n₁; average ranks ride DOUBLED units
    * (2·r̄ = 2·cum − n + 1 — integer even where the average is x.5),
    * so 2·U₁ = Σn₁·(2r̄) − n₁(n₁+1) is exact 128-bit integer on both
    * engines (Spark DECIMAL(38,0) / DuckDB HUGEINT), as is the tie
    * term Σ(t³−t). The normal-approximation z (tie-corrected variance)
    * is one identical double chain, 4dp.
    *
    * Scale: the census is a map-side-combinable value group-by; the
    * global cumulative over it runs through [[PrefixSum]]'s two-phase
    * kernel (range partition + per-partition offsets) — NO
    * single-partition window anywhere; the oracle SQL's sequential
    * window is the semantic mirror only. */
  def q210MannWhitney(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val f = Tables.orders(s, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("c"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("g1"))
    val cen = f.groupBy("c")
      .agg(count(lit(1)).as("n"), sum(col("g1")).as("n1"))
    val cum = graft.ops.PrefixSum.withPrefixSums(cen,
      Seq(col("c")), Seq((col("n"), "cumn")))
    val g = cum.agg(
      sum(col("n1")).as("n1t"),
      sum(col("n") - col("n1")).as("n2t"),
      sum(col("n1").cast(dec) *
        (col("cumn") * 2 - col("n") + 1).cast(dec)).as("r2s"),
      sum(col("n").cast(dec) * col("n").cast(dec) * col("n").cast(dec) -
        col("n").cast(dec)).as("tie"))
    val u2 = col("r2s") - col("n1t").cast(dec) * (col("n1t") + 1).cast(dec)
    val nt = (col("n1t") + col("n2t")).cast("double")
    g.select(col("n1t").as("n_urgent"), col("n2t").as("n_low"),
      u2.cast("long").as("u2_urgent"),
      col("tie").cast("long").as("tie_term"),
      (round((u2.cast("double") / 2.0 -
        col("n1t").cast("double") * col("n2t").cast("double") / 2.0) /
        sqrt((col("n1t").cast("double") * col("n2t").cast("double") / 12.0) *
          ((nt + 1.0) - col("tie").cast("double") / (nt * (nt - 1.0)))), 4)
        + 0.0).as("z"))
  }

  val q210MannWhitneySql: String =
    """WITH f AS (
      |  SELECT CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1
      |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
      |cen AS (
      |  SELECT c, COUNT(*) AS n, CAST(SUM(g1) AS BIGINT) AS n1
      |  FROM f GROUP BY c),
      |cum AS (
      |  SELECT c, n, n1,
      |    SUM(n) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cumn
      |  FROM cen),
      |g AS (
      |  SELECT CAST(SUM(n1) AS BIGINT) AS n1t,
      |    CAST(SUM(n - n1) AS BIGINT) AS n2t,
      |    SUM(CAST(n1 AS HUGEINT) * (2 * cumn - n + 1)) AS r2s,
      |    SUM(CAST(n AS HUGEINT) * n * n - n) AS tie
      |  FROM cum)
      |SELECT n1t AS n_urgent, n2t AS n_low,
      |  CAST(r2s - CAST(n1t AS HUGEINT) * (n1t + 1) AS BIGINT) AS u2_urgent,
      |  CAST(tie AS BIGINT) AS tie_term,
      |  ROUND((CAST(r2s - CAST(n1t AS HUGEINT) * (n1t + 1) AS DOUBLE) / 2.0
      |      - CAST(n1t AS DOUBLE) * CAST(n2t AS DOUBLE) / 2.0)
      |    / SQRT((CAST(n1t AS DOUBLE) * CAST(n2t AS DOUBLE) / 12.0)
      |      * ((CAST(n1t + n2t AS DOUBLE) + 1.0)
      |        - CAST(tie AS DOUBLE) / (CAST(n1t + n2t AS DOUBLE)
      |          * (CAST(n1t + n2t AS DOUBLE) - 1.0)))), 4) + 0 AS z
      |FROM g""".stripMargin

  /** L148 Tukey-fence outlier audit (Tukey 1977 [PK], the boxplot
    * rule): per market segment, the quartiles of per-CUSTOMER lifetime
    * revenue and the count/share of customers outside
    * [Q1 − 1.5·IQR, Q3 + 1.5·IQR] — the standard first-pass anomaly
    * screen before any model-based scoring (q97's z-score screen
    * assumes normality; this doesn't).
    *
    * Round 11 de-vacuification (the q175 lesson): the original screen
    * ran on raw order value, whose bounded near-uniform distribution
    * puts ZERO mass beyond 1.5·IQR at every SF — hash-green while
    * flagging nothing. Per-customer revenue is a random SUM over a
    * skewed order count, so its right tail genuinely crosses the
    * fence (2 / 20 / 156 customers flagged at sf0.001/0.01/0.1 —
    * measured, and pinned by NonDegeneracySpec).
    *
    * Parity: per-customer revenue is an exact int64 cents sum;
    * quartiles interpolate on int64, so Q1/Q3 are exact multiples of
    * 0.25 (representable), 1.5·IQR is an exact multiple of 0.125, and
    * the fences pin to integer cents with half-up floor(x+0.5) — the
    * outlier decision is then an INT comparison that can never flip
    * across engines. Displayed quartiles round 4dp (q15 discipline).
    *
    * Scale: the customer rollup is one map-side-combinable agg; then
    * one exact-percentile agg per segment (driver-bounded ≤5 rows; at
    * fact scale the same quartiles come from q98's [[RangedNtile]]
    * machinery), broadcast back over one customer-grain scan. */
  def q214TukeyFences(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("c_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
        .as("c"))
    val q = o.groupBy("seg")
      .agg(percentile(col("c"), lit(0.25)).as("q1"),
        percentile(col("c"), lit(0.75)).as("q3"))
      .select(col("seg"), col("q1"), col("q3"),
        floor(col("q1") - (col("q3") - col("q1")) * 1.5 + 0.5)
          .cast("long").as("flo"),
        floor(col("q3") + (col("q3") - col("q1")) * 1.5 + 0.5)
          .cast("long").as("fhi"))
    o.join(broadcast(q), "seg")
      .groupBy("seg")
      .agg(count(lit(1)).as("n_customers"),
        max(round(col("q1") / 100.0, 4) + 0.0).as("q1_rev"),
        max(round(col("q3") / 100.0, 4) + 0.0).as("q3_rev"),
        sum(when(col("c") < col("flo"), 1L).otherwise(0L)).as("n_out_lo"),
        sum(when(col("c") > col("fhi"), 1L).otherwise(0L)).as("n_out_hi"))
      .select(col("seg").as("c_mktsegment"), col("n_customers"),
        col("q1_rev"), col("q3_rev"), col("n_out_lo"), col("n_out_hi"),
        (round((col("n_out_lo") + col("n_out_hi")).cast("double") /
          col("n_customers").cast("double"), 6) + 0.0).as("outlier_share"))
      .orderBy("c_mktsegment")
  }

  val q214TukeyFencesSql: String =
    """WITH o AS (
      |  SELECT c_mktsegment AS seg, c_custkey,
      |    SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS c
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |q AS (
      |  SELECT seg, quantile_cont(c, 0.25) AS q1, quantile_cont(c, 0.75) AS q3,
      |    CAST(FLOOR(quantile_cont(c, 0.25)
      |      - 1.5 * (quantile_cont(c, 0.75) - quantile_cont(c, 0.25))
      |      + 0.5) AS BIGINT) AS flo,
      |    CAST(FLOOR(quantile_cont(c, 0.75)
      |      + 1.5 * (quantile_cont(c, 0.75) - quantile_cont(c, 0.25))
      |      + 0.5) AS BIGINT) AS fhi
      |  FROM o GROUP BY seg)
      |SELECT o.seg AS c_mktsegment, COUNT(*) AS n_customers,
      |  MAX(ROUND(q1 / 100.0, 4) + 0) AS q1_rev,
      |  MAX(ROUND(q3 / 100.0, 4) + 0) AS q3_rev,
      |  CAST(SUM(CASE WHEN c < flo THEN 1 ELSE 0 END) AS BIGINT) AS n_out_lo,
      |  CAST(SUM(CASE WHEN c > fhi THEN 1 ELSE 0 END) AS BIGINT) AS n_out_hi,
      |  ROUND(CAST(SUM(CASE WHEN c < flo OR c > fhi THEN 1 ELSE 0 END)
      |      AS DOUBLE) / COUNT(*), 6) + 0 AS outlier_share
      |FROM o JOIN q USING (seg)
      |GROUP BY o.seg ORDER BY o.seg""".stripMargin

  /** L149 MAD robust z-score outlier screen: per segment, the median
    * and the Median Absolute Deviation of order value, flagging
    * |x − med| > 3·1.4826·MAD (the Hampel rule; 1.4826 ≈ 1/Φ⁻¹(3/4)
    * makes MAD a consistent σ estimate [PK: Hampel 1974]) — the
    * robust counterpart to q97's mean/stddev screen: one 50%-corrupted
    * cell can't move this threshold, where a single bad value owns a
    * z-score's σ.
    *
    * Round 11 de-vacuification (the q175 lesson, same as q214): raw
    * order value has no tail beyond the Hampel threshold at any SF —
    * the screen was hash-green while flagging nothing. The screen now
    * runs on per-customer lifetime revenue, whose skewed sum
    * distribution genuinely trips the fence (1 / 9 / 77 flagged at
    * sf0.001/0.01/0.1 — measured, pinned by NonDegeneracySpec).
    *
    * Exactness: everything is integer until display. The median of
    * DOUBLED cents is an exact int (interpolation (a+b)/2 on doubled
    * units = a+b); deviations dev2 = |2c − m2| are int64; MAD rides
    * QUADRUPLED units the same way; the flag decision
    * 20000·dev2 > 44478·mad4 (3·1.4826 = 44478/10⁴ exact) is a pure
    * int64 comparison — no float ever decides an outlier.
    *
    * Scale: two exact-percentile censuses (≤5 segments) broadcast back
    * over fact scans — the q214 shape, one extra pass for the
    * deviation median. */
  def q215MadOutliers(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("c_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
        .as("c"))
    val med = o.groupBy("seg")
      .agg(percentile(col("c") * 2, lit(0.5)).cast("long").as("m2"))
    val dev = o.join(broadcast(med), "seg")
      .withColumn("dev2", abs(col("c") * 2 - col("m2")))
    val mad = dev.groupBy("seg")
      .agg((percentile(col("dev2"), lit(0.5)) * 2).cast("long").as("mad4"))
    dev.join(broadcast(mad), "seg")
      .groupBy("seg")
      .agg(count(lit(1)).as("n_customers"),
        max(round(col("m2") / 200.0, 4) + 0.0).as("median_rev"),
        max(round(col("mad4") / 400.0, 4) + 0.0).as("mad_rev"),
        sum(when(col("dev2") * 20000L > col("mad4") * 44478L, 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("seg").as("c_mktsegment"), col("n_customers"),
        col("median_rev"), col("mad_rev"), col("n_outliers"),
        (round(col("n_outliers").cast("double") /
          col("n_customers").cast("double"), 6)
          + 0.0).as("outlier_share"))
      .orderBy("c_mktsegment")
  }

  val q215MadOutliersSql: String =
    """WITH o AS (
      |  SELECT c_mktsegment AS seg, c_custkey,
      |    SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS c
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |med AS (
      |  SELECT seg, CAST(quantile_cont(c * 2, 0.5) AS BIGINT) AS m2
      |  FROM o GROUP BY seg),
      |dev AS (
      |  SELECT seg, c, m2, abs(c * 2 - m2) AS dev2
      |  FROM o JOIN med USING (seg)),
      |mad AS (
      |  SELECT seg, CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
      |  FROM dev GROUP BY seg)
      |SELECT dev.seg AS c_mktsegment, COUNT(*) AS n_customers,
      |  MAX(ROUND(m2 / 200.0, 4) + 0) AS median_rev,
      |  MAX(ROUND(mad4 / 400.0, 4) + 0) AS mad_rev,
      |  CAST(SUM(CASE WHEN dev2 * 20000 > mad4 * 44478 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers,
      |  ROUND(CAST(SUM(CASE WHEN dev2 * 20000 > mad4 * 44478 THEN 1 ELSE 0
      |    END) AS DOUBLE) / COUNT(*), 6) + 0 AS outlier_share
      |FROM dev JOIN mad USING (seg)
      |GROUP BY dev.seg ORDER BY dev.seg""".stripMargin

  /** L150 Benjamini–Hochberg FDR control over a family of per-source
    * composition tests (Benjamini & Hochberg 1995 [PK]): each corpus
    * source's share of English documents vs the five-language uniform
    * design null p₀ = 0.2 (one-sample z), two-sided p via the
    * classical Abramowitz–Stegun 26.2.17 polynomial normal CDF
    * (|ε| < 7.5·10⁻⁸ — the p VALUE is defined as this approximation,
    * identically on both engines), then the BH step-up: reject the k
    * smallest p-values where p₍ₖ₎ ≤ α·k/m, α = 0.05. The
    * multiple-comparisons discipline q172's single test doesn't need
    * but any per-segment screen (q146/q186) does.
    *
    * Round 11 de-vacuification (the q175 lesson): the original family
    * tested per-brand high-quantity shares against the POOLED rate —
    * a null that is TRUE by fixture construction, so the step-up
    * rejected nothing at any SF (the machinery was hash-green while
    * never once stepping up). English is construction-boosted to
    * ~0.4 of the corpus, so per-source tests against the uniform
    * design spec carry genuine sparse signal: 10 / 14 / 20 of ~20
    * sources rejected at sf0.001/0.01/0.1 (measured, pinned by
    * NonDegeneracySpec) — the adaptive threshold does real work.
    *
    * Parity: z is a double chain from exact int64 counts; p quantizes
    * to int64 1e-8 units BEFORE every BH comparison, so the step-up
    * decision pq·m ≤ 5·10⁶·k is pure integer — a 1-ulp exp()
    * divergence moves p by ~10⁻¹⁶ and cannot flip a 1e-8-quantized
    * threshold unless p sits within 10⁻¹⁶ of a boundary (the q196
    * accepted-residual class, documented there).
    *
    * Scale: one map-side-combinable source census (≤20 rows); every
    * window below it runs over that census. */
  def q216BhFdr(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("x"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val p0 = lit(0.2)
    val zv = (col("x").cast("double") / col("n") - p0) /
      sqrt(p0 * (lit(1.0) - p0) / col("n"))
    val za = abs(col("zv"))
    val tInv = lit(1.0) / (lit(1.0) + lit(0.2316419) * za)
    val phi = exp(-za * za / 2.0) / lit(2.5066282746310002)
    val pTail = phi * (lit(0.319381530) * tInv
      - lit(0.356563782) * pow(tInv, 2)
      + lit(1.781477937) * pow(tInv, 3)
      - lit(1.821255978) * pow(tInv, 4)
      + lit(1.330274429) * pow(tInv, 5))
    val p = g.withColumn("zv", zv)
      .withColumn("pq", floor(lit(2.0) * pTail * 1e8 + 0.5).cast("long"))
    val wRank = Window.orderBy(col("pq"), col("source"))
    val r = p.withColumn("rk", row_number().over(wRank))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("cutoff",
        max(when(col("pq") * col("m") <= col("rk") * 5000000L, col("rk"))
          .otherwise(0L)).over(wAll))
    r.select(col("source"), col("n"), col("x"),
      (round(col("zv"), 4) + 0.0).as("z"),
      (col("pq").cast("double") / 1e8).as("p"),
      col("rk"),
      when(col("rk") <= col("cutoff"), 1).otherwise(0).as("significant"))
      .orderBy("rk")
  }

  val q216BhFdrSql: String =
    """WITH g AS (
      |  SELECT source, COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS x
      |  FROM documents
      |  GROUP BY 1),
      |z AS (
      |  SELECT source, n, x,
      |    (CAST(x AS DOUBLE) / n - 0.2)
      |      / SQRT(0.2 * (1.0 - 0.2) / n) AS zv
      |  FROM g),
      |p AS (
      |  SELECT source, n, x, zv,
      |    CAST(FLOOR(2.0 * (exp(-abs(zv) * abs(zv) / 2.0)
      |        / 2.5066282746310002)
      |      * (0.319381530 * (1.0 / (1.0 + 0.2316419 * abs(zv)))
      |       - 0.356563782 * POWER(1.0 / (1.0 + 0.2316419 * abs(zv)), 2)
      |       + 1.781477937 * POWER(1.0 / (1.0 + 0.2316419 * abs(zv)), 3)
      |       - 1.821255978 * POWER(1.0 / (1.0 + 0.2316419 * abs(zv)), 4)
      |       + 1.330274429 * POWER(1.0 / (1.0 + 0.2316419 * abs(zv)), 5))
      |      * 1e8 + 0.5) AS BIGINT) AS pq
      |  FROM z),
      |r AS (
      |  SELECT source, n, x, zv, pq,
      |    ROW_NUMBER() OVER (ORDER BY pq, source) AS rk,
      |    COUNT(*) OVER () AS m
      |  FROM p),
      |c AS (
      |  SELECT *, MAX(CASE WHEN pq * m <= 5000000 * rk THEN rk ELSE 0 END)
      |    OVER () AS cutoff
      |  FROM r)
      |SELECT source, n, x, ROUND(zv, 4) + 0 AS z,
      |  CAST(pq AS DOUBLE) / 1e8 AS p, rk,
      |  CAST(CASE WHEN rk <= cutoff THEN 1 ELSE 0 END AS INT) AS significant
      |FROM c ORDER BY rk""".stripMargin

  /** L155 TOPSIS multi-criteria supplier ranking (Hwang & Yoon 1981
    * [PK]): each supplier scored on three criteria — quoted revenue
    * (benefit), lineitems served (benefit), total late-days (cost) —
    * vector-normalized, equal-weighted, then ranked by relative
    * closeness d⁻/(d⁺+d⁻) to the ideal/anti-ideal points. (The fixture
    * lineitem carries no commit/receipt dates, so the cost criterion
    * is discount conceded, not lateness.) The
    * standard "rank alternatives under competing criteria" operator a
    * procurement/vendor scorecard runs; q118's skyline returns the
    * undominated SET, TOPSIS produces the total ORDER.
    *
    * Parity: the three criteria are exact int64 (cents pinned per item
    * before summing; late days are int datediffs); squared-norm sums
    * ride DECIMAL(38,0)/HUGEINT; everything after is one fixed double
    * chain per column (normalize → ·⅓ weight → distances → closeness),
    * displayed 6dp, ranked on the ROUNDED closeness with suppkey
    * tie-break (hazard #4).
    *
    * Scale: one map-side-combinable supplier agg over the fact scan;
    * ideal/anti-ideal and norms ride windows over the supplier census
    * (dimension-sized; at 10⁸ suppliers the same bounds come from a
    * 1-row agg broadcast). Top-25 via TakeOrderedAndProject. */
  def q220Topsis(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val li = Tables.lineitem(s, dir)
      .select(col("l_suppkey").as("sk"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"),
        floor(col("l_extendedprice") * col("l_discount") * 100 + 0.5)
          .cast("long").as("disc_cents"))
    val g = li.groupBy("sk")
      .agg(sum(col("cents")).as("c1"), count(lit(1)).as("c2"),
        sum(col("disc_cents")).as("c3"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val n = g
      .withColumn("s1", sum(col("c1").cast(dec) * col("c1").cast(dec)).over(wAll))
      .withColumn("s2", sum(col("c2").cast(dec) * col("c2").cast(dec)).over(wAll))
      .withColumn("s3", sum(col("c3").cast(dec) * col("c3").cast(dec)).over(wAll))
      .withColumn("v1",
        when(col("s1") > 0, col("c1").cast("double") / sqrt(col("s1").cast("double")) / 3.0)
          .otherwise(0.0))
      .withColumn("v2",
        when(col("s2") > 0, col("c2").cast("double") / sqrt(col("s2").cast("double")) / 3.0)
          .otherwise(0.0))
      .withColumn("v3",
        when(col("s3") > 0, col("c3").cast("double") / sqrt(col("s3").cast("double")) / 3.0)
          .otherwise(0.0))
    val b = n
      .withColumn("i1", max(col("v1")).over(wAll))
      .withColumn("i2", max(col("v2")).over(wAll))
      .withColumn("i3", min(col("v3")).over(wAll))
      .withColumn("a1", min(col("v1")).over(wAll))
      .withColumn("a2", min(col("v2")).over(wAll))
      .withColumn("a3", max(col("v3")).over(wAll))
    val dp = sqrt((col("v1") - col("i1")) * (col("v1") - col("i1")) +
      (col("v2") - col("i2")) * (col("v2") - col("i2")) +
      (col("v3") - col("i3")) * (col("v3") - col("i3")))
    val dm = sqrt((col("v1") - col("a1")) * (col("v1") - col("a1")) +
      (col("v2") - col("a2")) * (col("v2") - col("a2")) +
      (col("v3") - col("a3")) * (col("v3") - col("a3")))
    b.select(col("sk").as("s_suppkey"), col("c1").as("cents_quoted"),
        col("c2").as("n_items"), col("c3").as("disc_cents"),
        (round(dm / (dp + dm), 6) + 0.0).as("closeness"))
      .orderBy(col("closeness").desc, col("s_suppkey"))
      .limit(25)
  }

  val q220TopsisSql: String =
    """WITH li AS (
      |  SELECT l_suppkey AS sk,
      |    CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
      |    CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)
      |      AS disc_cents
      |  FROM lineitem),
      |g AS (
      |  SELECT sk, CAST(SUM(cents) AS BIGINT) AS c1, COUNT(*) AS c2,
      |    CAST(SUM(disc_cents) AS BIGINT) AS c3
      |  FROM li GROUP BY sk),
      |n AS (
      |  SELECT sk, c1, c2, c3,
      |    SUM(CAST(c1 AS HUGEINT) * c1) OVER () AS s1,
      |    SUM(CAST(c2 AS HUGEINT) * c2) OVER () AS s2,
      |    SUM(CAST(c3 AS HUGEINT) * c3) OVER () AS s3
      |  FROM g),
      |v AS (
      |  SELECT sk, c1, c2, c3,
      |    CASE WHEN s1 > 0
      |      THEN CAST(c1 AS DOUBLE) / sqrt(CAST(s1 AS DOUBLE)) / 3.0
      |      ELSE 0.0 END AS v1,
      |    CASE WHEN s2 > 0
      |      THEN CAST(c2 AS DOUBLE) / sqrt(CAST(s2 AS DOUBLE)) / 3.0
      |      ELSE 0.0 END AS v2,
      |    CASE WHEN s3 > 0
      |      THEN CAST(c3 AS DOUBLE) / sqrt(CAST(s3 AS DOUBLE)) / 3.0
      |      ELSE 0.0 END AS v3
      |  FROM n),
      |b AS (
      |  SELECT sk, c1, c2, c3, v1, v2, v3,
      |    MAX(v1) OVER () AS i1, MAX(v2) OVER () AS i2, MIN(v3) OVER () AS i3,
      |    MIN(v1) OVER () AS a1, MIN(v2) OVER () AS a2, MAX(v3) OVER () AS a3
      |  FROM v)
      |SELECT sk AS s_suppkey, c1 AS cents_quoted, c2 AS n_items,
      |  c3 AS disc_cents,
      |  ROUND(sqrt((v1 - a1) * (v1 - a1) + (v2 - a2) * (v2 - a2)
      |      + (v3 - a3) * (v3 - a3))
      |    / (sqrt((v1 - i1) * (v1 - i1) + (v2 - i2) * (v2 - i2)
      |        + (v3 - i3) * (v3 - i3))
      |      + sqrt((v1 - a1) * (v1 - a1) + (v2 - a2) * (v2 - a2)
      |        + (v3 - a3) * (v3 - a3))), 6) + 0 AS closeness
      |FROM b
      |ORDER BY closeness DESC, s_suppkey LIMIT 25""".stripMargin

  /** L159 odds ratio + Woolf 95% CI per brand (Woolf 1955 [PK]): the
    * 2×2 association readout — odds of a high-quantity lineitem for
    * the brand vs all other brands, with the log-scale confidence
    * interval ln OR ± 1.96·√(1/a+1/b+1/c+1/d). The effect-SIZE
    * companion to q216's BH-FDR decisions (a tiny p with OR ≈ 1 is
    * noise at scale; the CI says so), and the classic epidemiology/
    * feature-association primitive.
    *
    * Parity: the 2×2 cells a/b/c/d are exact int64 from one census
    * (the "rest" margin = windowed total − brand row, no second
    * scan); OR and the CI bounds are single double chains, 4dp. The
    * ln/exp pair sits in the q196 accepted-residual class.
    *
    * Scale: one map-side-combinable brand census; windows over ≤25
    * rows. */
  def q225OddsRatio(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(sum(when(col("l_quantity") >= 30, 1L).otherwise(0L)).as("a"),
        sum(when(col("l_quantity") >= 30, 0L).otherwise(1L)).as("b"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val t = g
      .withColumn("c", sum(col("a")).over(wAll) - col("a"))
      .withColumn("d", sum(col("b")).over(wAll) - col("b"))
    val orr = (col("a").cast("double") * col("d")) /
      (col("b").cast("double") * col("c"))
    val se = sqrt(lit(1.0) / col("a") + lit(1.0) / col("b") +
      lit(1.0) / col("c") + lit(1.0) / col("d"))
    t.select(col("brand"), col("a"), col("b"), col("c"), col("d"),
        (round(orr, 4) + 0.0).as("odds_ratio"),
        (round(exp(log(orr) - lit(1.96) * se), 4) + 0.0).as("ci_lo"),
        (round(exp(log(orr) + lit(1.96) * se), 4) + 0.0).as("ci_hi"))
      .orderBy("brand")
  }

  val q225OddsRatioSql: String =
    """WITH g AS (
      |  SELECT p_brand AS brand,
      |    CAST(SUM(CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS a,
      |    CAST(SUM(CASE WHEN l_quantity >= 30 THEN 0 ELSE 1 END) AS BIGINT)
      |      AS b
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1),
      |t AS (
      |  SELECT brand, a, b,
      |    CAST(SUM(a) OVER () AS BIGINT) - a AS c,
      |    CAST(SUM(b) OVER () AS BIGINT) - b AS d
      |  FROM g)
      |SELECT brand, a, b, c, d,
      |  ROUND(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 4) + 0
      |    AS odds_ratio,
      |  ROUND(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
      |    - 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)), 4) + 0
      |    AS ci_lo,
      |  ROUND(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
      |    + 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)), 4) + 0
      |    AS ci_hi
      |FROM t ORDER BY brand""".stripMargin

  /** L160 Pettitt changepoint test (Pettitt 1979 [PK]): the rank-based
    * single-changepoint locator over the daily revenue series —
    * U_t = 2·Σ_{i≤t} r_i − t(n+1), K = max|U_t|, with the classical
    * significance approximation p ≈ 2·exp(−6K²/(n³+n²)). The
    * distribution-free companion to q148's CUSUM (which needs a known
    * in-control mean): Pettitt asks WHERE the level shifted without
    * assuming any distribution.
    *
    * Parity: ranks are exact (doubled-unit average ranks over the day
    * census — 2·r̄ is an integer even under ties, the q210 discipline),
    * so every U_t is exact int64; K and its argmax day are integer
    * decisions; only the displayed p is a double chain, 6dp.
    *
    * Scale: the series is the scale-constant day census; the rank and
    * prefix windows run over it (at fact scale the same ranks come
    * from [[RangedNtile]]/[[PrefixSum]]). */
  def q226Pettitt(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
    // doubled average ranks via the census trick: rows with equal rev
    // share rank (2·cum − n + 1) in doubled units
    val cen = d.groupBy("rev").agg(count(lit(1)).as("n"))
    val wV = Window.orderBy("rev")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r2 = cen.withColumn("cum", sum(col("n")).over(wV))
      .select(col("rev"), (col("cum") * 2 - col("n") + 1).as("r2"))
    val wT = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val u = d.join(r2, "rev")
      .withColumn("t", count(lit(1)).over(wT))
      .withColumn("s2", sum(col("r2")).over(wT))
      .withColumn("nn", count(lit(1)).over(wAll))
      // s2 = Σ 2r̄_i exactly, so s2 − t(n+1) IS the standard
      // U_t = 2Σr_i − t(n+1) — integer even under tied (x.5) ranks
      .withColumn("ut", col("s2") - col("t") * (col("nn") + 1))
      .withColumn("k", max(abs(col("ut"))).over(wAll))
    u.filter(abs(col("ut")) === col("k"))
      .orderBy("day").limit(1)
      .select(col("day").as("change_day"), col("k").as("k_stat"),
        col("nn").as("n_days"),
        (round(
          exp(lit(-6.0) * col("k").cast("double") * col("k") /
            (col("nn").cast("double") * col("nn") * col("nn") +
              col("nn").cast("double") * col("nn"))) * 2.0, 6) + 0.0)
          .as("p_approx"))
  }

  val q226PettittSql: String =
    """WITH d AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS BIGINT)
      |      AS rev
      |  FROM orders GROUP BY 1),
      |cen AS (SELECT rev, COUNT(*) AS n FROM d GROUP BY rev),
      |r2 AS (
      |  SELECT rev,
      |    2 * SUM(n) OVER (ORDER BY rev ROWS UNBOUNDED PRECEDING)
      |      - n + 1 AS r2
      |  FROM cen),
      |u AS (
      |  SELECT day,
      |    COUNT(*) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS t,
      |    SUM(r2) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS s2,
      |    COUNT(*) OVER () AS nn
      |  FROM d JOIN r2 USING (rev)),
      |v AS (
      |  SELECT day, CAST(s2 - t * (nn + 1) AS BIGINT) AS ut, nn,
      |    MAX(abs(s2 - t * (nn + 1))) OVER () AS k
      |  FROM u)
      |SELECT day AS change_day, CAST(k AS BIGINT) AS k_stat,
      |  CAST(nn AS BIGINT) AS n_days,
      |  ROUND(exp(-6.0 * CAST(k AS DOUBLE) * k
      |    / (CAST(nn AS DOUBLE) * nn * nn + CAST(nn AS DOUBLE) * nn))
      |    * 2.0, 6) + 0 AS p_approx
      |FROM v WHERE abs(ut) = k
      |ORDER BY day LIMIT 1""".stripMargin

  /** L161 Kruskal–Wallis H (Kruskal & Wallis 1952 [PK]): the k-group
    * generalization of q210's two-sample rank test — do the five
    * market segments draw order values from the same distribution?
    * Tie-corrected H = [12/(N(N+1))·Σ Rⱼ²/nⱼ − 3(N+1)] / C with
    * C = 1 − Σ(t³−t)/(N³−N).
    *
    * Parity: global average ranks ride the q210 doubled-unit census
    * (2r̄ integer under ties); per-group rank sums R2ⱼ are exact
    * 128-bit; each group's Rⱼ²/nⱼ term is pinned by ONE identical
    * floor(x+0.5) double chain before the 5-term sum, so the
    * cross-group summation is order-free (the q224 discipline). Note
    * the pinned term itself exceeds 2⁵³ well before sf 1 (R2ⱼ² ~ 1e17
    * at sf 1), so the floor lands on a double-rounded value, NOT an
    * exact integer — parity rests on both engines running the
    * IDENTICAL double chain, not on sub-2⁵³ exactness.
    *
    * Scale: value census + [[PrefixSum]] cumulative (no
    * single-partition window); per-(value, segment) census collapses
    * map-side; the tie term is a 1-row aggregate of the census
    * broadcast back in-plan (q211's tmax pattern — no driver action at
    * DataFrame-build time); everything after is ≤5-row algebra. */
  def q227KruskalWallis(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val o = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("c"))
    val cen = o.groupBy("c").agg(count(lit(1)).as("n"))
    val cum = graft.ops.PrefixSum.withPrefixSums(cen,
      Seq(col("c")), Seq((col("n"), "cumn")))
      .select(col("c"), col("n"), (col("cumn") * 2 - col("n") + 1).as("r2"))
    val bySeg = o.groupBy("seg", "c").agg(count(lit(1)).as("ncs"))
      .join(cum, "c")
      .groupBy("seg")
      .agg(sum(col("ncs")).as("nj"),
        sum(col("ncs").cast(dec) * col("r2").cast(dec)).as("r2j"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val tieDf = cen.agg(
      sum(col("n").cast(dec) * col("n").cast(dec) * col("n").cast(dec) -
        col("n").cast(dec)).cast("long").as("tie"))
    val t = bySeg
      // Rⱼ²/nⱼ = (R2ⱼ/2)²/nⱼ = R2ⱼ²/(4nⱼ), pinned to int64 once
      .withColumn("vq",
        floor((col("r2j").cast("double") * col("r2j").cast("double")) /
          (col("nj").cast("double") * 4.0) + 0.5).cast("long"))
      .withColumn("nt", sum(col("nj")).over(wAll))
      .withColumn("sv", sum(col("vq")).over(wAll))
      .crossJoin(broadcast(tieDf))
    val nD = col("nt").cast("double")
    val h = lit(12.0) / (nD * (nD + 1.0)) * col("sv").cast("double") -
      lit(3.0) * (nD + 1.0)
    val corr = lit(1.0) - col("tie").cast("double") / (nD * nD * nD - nD)
    t.select(col("seg").as("c_mktsegment"), col("nj"),
        (round(col("r2j").cast("double") / (col("nj").cast("double") * 2.0),
          4) + 0.0).as("mean_rank"),
        (round(h / corr, 4) + 0.0).as("h_corrected"),
        lit(4).as("df"))
      .orderBy("c_mktsegment")
  }

  val q227KruskalWallisSql: String =
    """WITH o AS (
      |  SELECT c_mktsegment AS seg,
      |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |cen AS (SELECT c, COUNT(*) AS n FROM o GROUP BY c),
      |cum AS (
      |  SELECT c, n,
      |    2 * SUM(n) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
      |      - n + 1 AS r2
      |  FROM cen),
      |tie AS (
      |  SELECT CAST(SUM(CAST(n AS HUGEINT) * n * n - n) AS BIGINT) AS tie
      |  FROM cen),
      |bseg AS (
      |  SELECT seg, SUM(ncs) AS nj,
      |    SUM(CAST(ncs AS HUGEINT) * r2) AS r2j
      |  FROM (SELECT seg, c, COUNT(*) AS ncs FROM o GROUP BY seg, c) g
      |  JOIN cum USING (c)
      |  GROUP BY seg),
      |t AS (
      |  SELECT seg, CAST(nj AS BIGINT) AS nj, r2j,
      |    CAST(FLOOR((CAST(r2j AS DOUBLE) * CAST(r2j AS DOUBLE))
      |      / (CAST(nj AS DOUBLE) * 4.0) + 0.5) AS BIGINT) AS vq,
      |    CAST(SUM(nj) OVER () AS BIGINT) AS nt
      |  FROM bseg),
      |t2 AS (SELECT *, CAST(SUM(vq) OVER () AS BIGINT) AS sv FROM t)
      |SELECT seg AS c_mktsegment, nj,
      |  ROUND(CAST(r2j AS DOUBLE) / (CAST(nj AS DOUBLE) * 2.0), 4) + 0
      |    AS mean_rank,
      |  ROUND((12.0 / (CAST(nt AS DOUBLE) * (CAST(nt AS DOUBLE) + 1.0))
      |      * CAST(sv AS DOUBLE)
      |      - 3.0 * (CAST(nt AS DOUBLE) + 1.0))
      |    / (1.0 - CAST((SELECT tie FROM tie) AS DOUBLE)
      |      / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)
      |        - CAST(nt AS DOUBLE))), 4) + 0 AS h_corrected,
      |  4 AS df
      |FROM t2 ORDER BY seg""".stripMargin

  /** L162 one-way ANOVA F (Fisher [PK], textbook decomposition): the
    * parametric companion to q227 on the same 5-segment design —
    * between/within sum-of-squares decomposition of order value and
    * F = (SSB/(k−1))/(SSW/(N−k)). Reading both: a significant H with a
    * mild F flags non-normal location shift.
    *
    * Parity: values ride whole DOLLARS (the q205 pin) so Σx and Σx²
    * stay far inside DECIMAL(38,0)/HUGEINT; each group's Sⱼ²/nⱼ is
    * pinned to int64 by one identical floor chain before the 5-term
    * sum (q227 discipline); SSB/SSW are then exact int64 differences
    * and F is one double chain 4dp.
    *
    * Scale: one map-side-combinable (segment) moment agg; ≤5-row
    * algebra after. */
  def q228AnovaF(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val o = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") + 0.5).cast("long").as("v"))
    val g = o.groupBy("seg")
      .agg(count(lit(1)).as("nj"), sum(col("v").cast(dec)).as("sj"),
        sum(col("v").cast(dec) * col("v").cast(dec)).as("qj"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val t = g
      .withColumn("vq",
        floor((col("sj").cast("double") * col("sj").cast("double")) /
          col("nj").cast("double") + 0.5).cast("long"))
      .withColumn("nt", sum(col("nj")).over(wAll))
      .withColumn("st", sum(col("sj")).over(wAll))
      .withColumn("qt", sum(col("qj")).over(wAll))
      .withColumn("sv", sum(col("vq")).over(wAll))
    val grand = floor((col("st").cast("double") * col("st").cast("double")) /
      col("nt").cast("double") + 0.5).cast("long")
    val ssb = col("sv") - grand
    val ssw = col("qt").cast("long") - col("sv")
    val f = (ssb.cast("double") / 4.0) /
      (ssw.cast("double") / (col("nt").cast("double") - 5.0))
    t.select(col("seg").as("c_mktsegment"), col("nj"),
        (round(col("sj").cast("double") / col("nj"), 4) + 0.0)
          .as("mean_value"),
        ssb.as("ss_between"), ssw.as("ss_within"),
        (round(f, 4) + 0.0).as("f_stat"))
      .orderBy("c_mktsegment")
  }

  val q228AnovaFSql: String =
    """WITH o AS (
      |  SELECT c_mktsegment AS seg,
      |    CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) AS v
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |g AS (
      |  SELECT seg, COUNT(*) AS nj,
      |    SUM(CAST(v AS HUGEINT)) AS sj,
      |    SUM(CAST(v AS HUGEINT) * v) AS qj
      |  FROM o GROUP BY seg),
      |t AS (
      |  SELECT seg, nj, sj, qj,
      |    CAST(FLOOR((CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE))
      |      / CAST(nj AS DOUBLE) + 0.5) AS BIGINT) AS vq,
      |    CAST(SUM(nj) OVER () AS BIGINT) AS nt,
      |    SUM(sj) OVER () AS st,
      |    SUM(qj) OVER () AS qt
      |  FROM g),
      |t2 AS (
      |  SELECT *,
      |    CAST(SUM(vq) OVER () AS BIGINT) AS sv,
      |    CAST(FLOOR((CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
      |      / CAST(nt AS DOUBLE) + 0.5) AS BIGINT) AS grand
      |  FROM t)
      |SELECT seg AS c_mktsegment, nj,
      |  ROUND(CAST(sj AS DOUBLE) / nj, 4) + 0 AS mean_value,
      |  sv - grand AS ss_between,
      |  CAST(qt AS BIGINT) - sv AS ss_within,
      |  ROUND((CAST(sv - grand AS DOUBLE) / 4.0)
      |    / (CAST(CAST(qt AS BIGINT) - sv AS DOUBLE)
      |      / (CAST(nt AS DOUBLE) - 5.0)), 4) + 0 AS f_stat
      |FROM t2 ORDER BY seg""".stripMargin

  /** L163 Mantel–Haenszel pooled odds ratio (Mantel & Haenszel 1959
    * [PK]): the stratified 2×2 combiner — per market segment, the
    * association between URGENT priority (exposure) and high order
    * value (outcome), pooled as OR_MH = Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ). The
    * confounding-aware companion to q225: a marginal OR can invert
    * (Simpson, cf. q64's paradox demo) when strata differ; MH pools
    * WITHIN strata.
    *
    * Parity: the 2×2 cells per stratum are exact int64; each
    * stratum's ad/n and bc/n terms are pinned to int64 micro-units by
    * one floor(1e6·x+0.5) chain before the cross-stratum sums (q224
    * discipline); the pooled ratio is one double division, 4dp.
    *
    * Scale: one map-side-combinable (segment) census; ≤5-row algebra
    * + windows. */
  def q229MantelHaenszel(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("c_mktsegment").as("seg"),
        (col("o_orderpriority") === "1-URGENT").as("exp"),
        (col("o_totalprice") >= 200000.0).as("hi"))
    val g = o.groupBy("seg").agg(
      sum(when(col("exp") && col("hi"), 1L).otherwise(0L)).as("a"),
      sum(when(col("exp") && !col("hi"), 1L).otherwise(0L)).as("b"),
      sum(when(!col("exp") && col("hi"), 1L).otherwise(0L)).as("c"),
      sum(when(!col("exp") && !col("hi"), 1L).otherwise(0L)).as("d"))
    val n = (col("a") + col("b") + col("c") + col("d")).cast("double")
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val t = g
      .withColumn("adq",
        floor(col("a").cast("double") * col("d") / n * 1e6 + 0.5)
          .cast("long"))
      .withColumn("bcq",
        floor(col("b").cast("double") * col("c") / n * 1e6 + 0.5)
          .cast("long"))
      .withColumn("sad", sum(col("adq")).over(wAll))
      .withColumn("sbc", sum(col("bcq")).over(wAll))
    t.select(col("seg").as("c_mktsegment"),
        col("a"), col("b"), col("c"), col("d"),
        (round(col("a").cast("double") * col("d") /
          (col("b").cast("double") * col("c")), 4) + 0.0)
          .as("or_stratum"),
        (round(col("sad").cast("double") / col("sbc").cast("double"), 4)
          + 0.0).as("or_mh"))
      .orderBy("c_mktsegment")
  }

  val q229MantelHaenszelSql: String =
    """WITH o AS (
      |  SELECT c_mktsegment AS seg,
      |    o_orderpriority = '1-URGENT' AS expo,
      |    o_totalprice >= 200000.0 AS hi
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
      |g AS (
      |  SELECT seg,
      |    CAST(SUM(CASE WHEN expo AND hi THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |    CAST(SUM(CASE WHEN expo AND NOT hi THEN 1 ELSE 0 END) AS BIGINT)
      |      AS b,
      |    CAST(SUM(CASE WHEN NOT expo AND hi THEN 1 ELSE 0 END) AS BIGINT)
      |      AS c,
      |    CAST(SUM(CASE WHEN NOT expo AND NOT hi THEN 1 ELSE 0 END)
      |      AS BIGINT) AS d
      |  FROM o GROUP BY seg),
      |t AS (
      |  SELECT seg, a, b, c, d,
      |    CAST(FLOOR(CAST(a AS DOUBLE) * d
      |      / CAST(a + b + c + d AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS adq,
      |    CAST(FLOOR(CAST(b AS DOUBLE) * c
      |      / CAST(a + b + c + d AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS bcq
      |  FROM g),
      |t2 AS (
      |  SELECT *, CAST(SUM(adq) OVER () AS BIGINT) AS sad,
      |    CAST(SUM(bcq) OVER () AS BIGINT) AS sbc
      |  FROM t)
      |SELECT seg AS c_mktsegment, a, b, c, d,
      |  ROUND(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 4) + 0
      |    AS or_stratum,
      |  ROUND(CAST(sad AS DOUBLE) / CAST(sbc AS DOUBLE), 4) + 0 AS or_mh
      |FROM t2 ORDER BY seg""".stripMargin

  // A-S 26.2.17 two-sided p — shared kernel, see [[StatFns]]
  private def asTwoSidedP(z: Column): Column = StatFns.asTwoSidedP(z)
  private def asTwoSidedPSql(z: String): String = StatFns.asTwoSidedPSql(z)

  /** L165 Welch's unequal-variance t-test (Welch 1947 [PK]): BUILDING
    * vs FURNITURE order values — the two-sample location test that
    * does NOT assume equal variances (q228's pooled ANOVA does), with
    * the Welch–Satterthwaite effective df. The robust default for
    * comparing two segments' spend.
    *
    * Parity: values ride whole dollars (q228 pin); per-group n/Σv/Σv²
    * are exact int64/DECIMAL(38,0); means, variances, t, and df are
    * ONE identical double chain on both engines (S² exceeds 2⁵³ at
    * large SF, so parity rests on the identical chain, not exactness —
    * the q227 doc discipline), 4dp displayed.
    *
    * Scale: one map-side-combinable 2-group moment agg; everything
    * after is 1-row algebra. */
  def q231WelchTtest(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val o = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "FURNITURE"))
      .select((col("c_mktsegment") === "BUILDING").as("ga"),
        floor(col("o_totalprice") + 0.5).cast("long").as("v"))
    val g = o.groupBy("ga")
      .agg(count(lit(1)).as("n"), sum(col("v").cast(dec)).as("sv"),
        sum(col("v").cast(dec) * col("v").cast(dec)).as("qv"))
    val piv = g.agg(
      max(when(col("ga"), col("n"))).as("n_a"),
      max(when(col("ga"), col("sv"))).as("s_a"),
      max(when(col("ga"), col("qv"))).as("q_a"),
      max(when(!col("ga"), col("n"))).as("n_b"),
      max(when(!col("ga"), col("sv"))).as("s_b"),
      max(when(!col("ga"), col("qv"))).as("q_b"))
    def m(sv: String, n: String) = col(sv).cast("double") / col(n)
    def va(qv: String, sv: String, n: String) =
      (col(qv).cast("double") -
        col(sv).cast("double") * col(sv).cast("double") / col(n)) /
        (col(n) - lit(1.0))
    val (ma, mb) = (m("s_a", "n_a"), m("s_b", "n_b"))
    val (sea, seb) = (va("q_a", "s_a", "n_a") / col("n_a"),
      va("q_b", "s_b", "n_b") / col("n_b"))
    val t = (ma - mb) / sqrt(sea + seb)
    val df = (sea + seb) * (sea + seb) /
      (sea * sea / (col("n_a") - lit(1.0)) +
        seb * seb / (col("n_b") - lit(1.0)))
    piv.select(col("n_a"), col("n_b"),
      (round(ma, 4) + 0.0).as("mean_a"),
      (round(mb, 4) + 0.0).as("mean_b"),
      (round(t, 4) + 0.0).as("t_stat"),
      (round(df, 4) + 0.0).as("df"))
  }

  val q231WelchTtestSql: String =
    """WITH o AS (
      |  SELECT c_mktsegment = 'BUILDING' AS ga,
      |    CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) AS v
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'FURNITURE')),
      |g AS (
      |  SELECT ga, COUNT(*) AS n, SUM(CAST(v AS HUGEINT)) AS sv,
      |    SUM(CAST(v AS HUGEINT) * v) AS qv
      |  FROM o GROUP BY ga),
      |piv AS (
      |  SELECT
      |    MAX(CASE WHEN ga THEN n END) AS n_a,
      |    MAX(CASE WHEN ga THEN sv END) AS s_a,
      |    MAX(CASE WHEN ga THEN qv END) AS q_a,
      |    MAX(CASE WHEN NOT ga THEN n END) AS n_b,
      |    MAX(CASE WHEN NOT ga THEN sv END) AS s_b,
      |    MAX(CASE WHEN NOT ga THEN qv END) AS q_b
      |  FROM g),
      |c AS (
      |  SELECT n_a, n_b,
      |    CAST(s_a AS DOUBLE) / n_a AS ma,
      |    CAST(s_b AS DOUBLE) / n_b AS mb,
      |    (CAST(q_a AS DOUBLE)
      |      - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / n_a)
      |      / (n_a - 1.0) / n_a AS sea,
      |    (CAST(q_b AS DOUBLE)
      |      - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / n_b)
      |      / (n_b - 1.0) / n_b AS seb
      |  FROM piv)
      |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  ROUND(ma, 4) + 0 AS mean_a, ROUND(mb, 4) + 0 AS mean_b,
      |  ROUND((ma - mb) / SQRT(sea + seb), 4) + 0 AS t_stat,
      |  ROUND((sea + seb) * (sea + seb)
      |    / (sea * sea / (n_a - 1.0) + seb * seb / (n_b - 1.0)), 4) + 0
      |    AS df
      |FROM c""".stripMargin

  /** L166 Brown–Forsythe variance-homogeneity test (Brown & Forsythe
    * 1974 [PK], the median-centered Levene): one-way ANOVA on
    * |v − median_g| across the 5 segments — the assumption check
    * q228's pooled-variance F silently makes. Median-centering (vs
    * Levene's mean) keeps the 50% breakdown point.
    *
    * Parity: group medians ride DOUBLED whole dollars so the
    * interpolated median is an exact int (q215 discipline); deviations
    * dev2 = |2v − m2| are exact int64; the F decomposition then
    * follows the q228 chain verbatim on dev2 (per-group Sⱼ²/nⱼ pinned
    * by one identical floor; F scale-invariant so doubled units cancel).
    *
    * Scale: one exact-percentile census (≤5 groups) broadcast back,
    * one moment agg, ≤5-row algebra — two fact passes total. */
  def q232BrownForsythe(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val o = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") + 0.5).cast("long").as("v"))
    val med = o.groupBy("seg")
      .agg(percentile(col("v") * 2, lit(0.5)).cast("long").as("m2"))
    val dev = o.join(broadcast(med), "seg")
      .select(col("seg"), abs(col("v") * 2 - col("m2")).as("dev2"))
    val g = dev.groupBy("seg")
      .agg(count(lit(1)).as("nj"), sum(col("dev2").cast(dec)).as("sj"),
        sum(col("dev2").cast(dec) * col("dev2").cast(dec)).as("qj"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val t = g
      .withColumn("vq",
        floor((col("sj").cast("double") * col("sj").cast("double")) /
          col("nj").cast("double") + 0.5).cast("long"))
      .withColumn("nt", sum(col("nj")).over(wAll))
      .withColumn("st", sum(col("sj")).over(wAll))
      .withColumn("qt", sum(col("qj")).over(wAll))
      .withColumn("sv", sum(col("vq")).over(wAll))
    val grand = floor((col("st").cast("double") * col("st").cast("double")) /
      col("nt").cast("double") + 0.5).cast("long")
    val ssb = col("sv") - grand
    val ssw = col("qt").cast("long") - col("sv")
    val f = (ssb.cast("double") / 4.0) /
      (ssw.cast("double") / (col("nt").cast("double") - 5.0))
    t.select(col("seg").as("c_mktsegment"), col("nj"),
        (round(col("sj").cast("double") / (col("nj") * lit(2.0)), 4) + 0.0)
          .as("mean_absdev"),
        (round(f, 4) + 0.0).as("bf_stat"),
        lit(4).as("df1"),
        (col("nt") - 5).as("df2"))
      .orderBy("c_mktsegment")
  }

  val q232BrownForsytheSql: String =
    """WITH o AS (
      |  SELECT c_mktsegment AS seg,
      |    CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) AS v
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |med AS (
      |  SELECT seg, CAST(quantile_cont(v * 2, 0.5) AS BIGINT) AS m2
      |  FROM o GROUP BY seg),
      |dev AS (
      |  SELECT o.seg, abs(v * 2 - m2) AS dev2
      |  FROM o JOIN med ON o.seg = med.seg),
      |g AS (
      |  SELECT seg, COUNT(*) AS nj,
      |    SUM(CAST(dev2 AS HUGEINT)) AS sj,
      |    SUM(CAST(dev2 AS HUGEINT) * dev2) AS qj
      |  FROM dev GROUP BY seg),
      |t AS (
      |  SELECT seg, nj, sj, qj,
      |    CAST(FLOOR((CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE))
      |      / CAST(nj AS DOUBLE) + 0.5) AS BIGINT) AS vq,
      |    CAST(SUM(nj) OVER () AS BIGINT) AS nt,
      |    SUM(sj) OVER () AS st,
      |    SUM(qj) OVER () AS qt
      |  FROM g),
      |t2 AS (
      |  SELECT *,
      |    CAST(SUM(vq) OVER () AS BIGINT) AS sv,
      |    CAST(FLOOR((CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
      |      / CAST(nt AS DOUBLE) + 0.5) AS BIGINT) AS grand
      |  FROM t)
      |SELECT seg AS c_mktsegment, nj,
      |  ROUND(CAST(sj AS DOUBLE) / (nj * 2.0), 4) + 0 AS mean_absdev,
      |  ROUND((CAST(sv - grand AS DOUBLE) / 4.0)
      |    / (CAST(CAST(qt AS BIGINT) - sv AS DOUBLE)
      |      / (CAST(nt AS DOUBLE) - 5.0)), 4) + 0 AS bf_stat,
      |  4 AS df1, nt - 5 AS df2
      |FROM t2 ORDER BY seg""".stripMargin

  /** L167 McNemar's paired test (McNemar 1947 [PK], continuity-
    * corrected): per customer, the paired binary traits "ever placed an
    * URGENT order" vs "ever placed a 5-LOW order" — marginal
    * homogeneity decided ONLY by the discordant cells,
    * χ² = (|b−c|−1)²/(b+c). The paired complement to q172's
    * independent-samples z (independent tests are WRONG for paired
    * designs — this is the one to reach for).
    *
    * Parity: the 2×2 is an exact int64 census; χ² is one double chain
    * 4dp; p rides the A-S polynomial on √χ², quantized 1e-8 (q216
    * discipline).
    *
    * Scale: one map-side-combinable per-customer agg (bool_or is
    * max-combinable) → one 1-row census. */
  def q233McNemar(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0))
        .as("u"),
        max(when(col("o_orderpriority") === "5-LOW", 1).otherwise(0))
          .as("l"))
    val cen = per.agg(
      sum(when(col("u") === 1 && col("l") === 1, 1L).otherwise(0L)).as("a"),
      sum(when(col("u") === 1 && col("l") === 0, 1L).otherwise(0L)).as("b"),
      sum(when(col("u") === 0 && col("l") === 1, 1L).otherwise(0L)).as("c"),
      sum(when(col("u") === 0 && col("l") === 0, 1L).otherwise(0L)).as("d"))
    val chi = pow(abs(col("b") - col("c")).cast("double") - lit(1.0), 2) /
      (col("b") + col("c")).cast("double")
    cen.select(col("a"), col("b"), col("c"), col("d"),
      (round(chi, 4) + 0.0).as("chi2_cc"),
      (floor(asTwoSidedP(sqrt(chi)) * 1e8 + 0.5) / 1e8).as("p"))
  }

  val q233McNemarSql: String = {
    val chi = "(POWER(abs(b - c) - 1.0, 2) / CAST(b + c AS DOUBLE))"
    s"""WITH per AS (
       |  SELECT o_custkey,
       |    MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
       |      AS u,
       |    MAX(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS l
       |  FROM orders GROUP BY 1),
       |cen AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN u = 1 AND l = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS a,
       |    CAST(SUM(CASE WHEN u = 1 AND l = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS b,
       |    CAST(SUM(CASE WHEN u = 0 AND l = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS c,
       |    CAST(SUM(CASE WHEN u = 0 AND l = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS d
       |  FROM per)
       |SELECT a, b, c, d,
       |  ROUND($chi, 4) + 0 AS chi2_cc,
       |  FLOOR(${asTwoSidedPSql(s"SQRT($chi)")} * 1e8 + 0.5) / 1e8 AS p
       |FROM cen""".stripMargin
  }

  /** L168 Cochran–Armitage trend test (Cochran 1954, Armitage 1955
    * [PK]): is the high-value-order rate monotone across the FIVE
    * ORDERED priority levels (scores 1..5 from the priority prefix)?
    * z = Σsᵢ(xᵢ − nᵢp̄) / √(p̄(1−p̄)(Σnᵢsᵢ² − (Σnᵢsᵢ)²/N)) — the
    * dose-response test a flat chi-square (q186) can't see direction
    * in.
    *
    * Parity: the per-level (nᵢ, xᵢ) census and all score sums are
    * exact int64 (scores are literal ints); z is one double chain; p
    * rides A-S quantized 1e-8 (q216 discipline).
    *
    * Scale: one map-side-combinable 5-row census; the trend algebra
    * runs over that census via an unpartitioned window of 5 rows. */
  def q234CochranArmitage(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("sc"),
        col("o_orderpriority").as("priority"),
        when(col("o_totalprice") >= 200000.0, 1L).otherwise(0L).as("hi"))
    val g = o.groupBy("sc", "priority")
      .agg(count(lit(1)).as("n_i"), sum(col("hi")).as("x_i"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val t = g
      .withColumn("nt", sum(col("n_i")).over(wAll))
      .withColumn("xt", sum(col("x_i")).over(wAll))
      .withColumn("ssx", sum(col("sc") * col("x_i")).over(wAll))
      .withColumn("ssn", sum(col("sc") * col("n_i")).over(wAll))
      .withColumn("ss2n", sum(col("sc") * col("sc") * col("n_i")).over(wAll))
    val pBar = col("xt").cast("double") / col("nt")
    val tNum = col("ssx").cast("double") - pBar * col("ssn")
    val tVar = pBar * (lit(1.0) - pBar) *
      (col("ss2n").cast("double") -
        col("ssn").cast("double") * col("ssn") / col("nt"))
    val z = tNum / sqrt(tVar)
    t.select(col("priority"), col("sc").as("score"), col("n_i"), col("x_i"),
        (round(col("x_i").cast("double") / col("n_i"), 4) + 0.0).as("rate"),
        (round(z, 4) + 0.0).as("z_trend"),
        (floor(asTwoSidedP(z) * 1e8 + 0.5) / 1e8).as("p"))
      .orderBy("score")
  }

  val q234CochranArmitageSql: String = {
    val z = "((CAST(ssx AS DOUBLE) - pbar * ssn) / SQRT(pbar * (1.0 - pbar)" +
      " * (CAST(ss2n AS DOUBLE) - CAST(ssn AS DOUBLE) * ssn / nt)))"
    s"""WITH o AS (
       |  SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS sc,
       |    o_orderpriority AS priority,
       |    CASE WHEN o_totalprice >= 200000.0 THEN 1 ELSE 0 END AS hi
       |  FROM orders),
       |g AS (
       |  SELECT sc, priority, COUNT(*) AS n_i,
       |    CAST(SUM(hi) AS BIGINT) AS x_i
       |  FROM o GROUP BY 1, 2),
       |t AS (
       |  SELECT *, CAST(SUM(n_i) OVER () AS BIGINT) AS nt,
       |    CAST(SUM(x_i) OVER () AS BIGINT) AS xt,
       |    CAST(SUM(sc * x_i) OVER () AS BIGINT) AS ssx,
       |    CAST(SUM(sc * n_i) OVER () AS BIGINT) AS ssn,
       |    CAST(SUM(sc * sc * n_i) OVER () AS BIGINT) AS ss2n
       |  FROM g),
       |t2 AS (SELECT *, CAST(xt AS DOUBLE) / nt AS pbar FROM t)
       |SELECT priority, sc AS score, n_i, x_i,
       |  ROUND(CAST(x_i AS DOUBLE) / n_i, 4) + 0 AS rate,
       |  ROUND($z, 4) + 0 AS z_trend,
       |  FLOOR(${asTwoSidedPSql(z)} * 1e8 + 0.5) / 1e8 AS p
       |FROM t2 ORDER BY score""".stripMargin
  }

  /** L170 t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007
    * [PK]): per (nation, segment) quasi-group, the Earth Mover's
    * Distance between the group's sensitive-attribute distribution
    * (order priority) and the global one — for a NOMINAL attribute
    * with unit ground distance, EMD = total-variation = ½Σ|p−q|,
    * INCLUDING the mass of priorities absent from the group (the full
    * 5-cell grid is materialized; a missing cell contributes its
    * whole global share). Completes the privacy ladder: k-anonymity
    * (q164) bounds group SIZE, l-diversity (q195) bounds sensitive
    * VARIETY, t-closeness bounds sensitive DISTRIBUTION SKEW.
    *
    * Reported as the ranked worst-10 audit rather than a fixed-t flag:
    * TV concentrates as 1/√(group size), so any fixed t that fires at
    * one SF is silent at another (measured: max TV 0.372 / 0.149 /
    * 0.048 at the three SFs) — a fixed flag would be exactly the
    * vacuous screen NonDegeneracySpec exists to forbid. The ranked
    * form is non-degenerate by construction and is how t is chosen in
    * practice (read the tail, pick the cutoff).
    *
    * Parity: all censuses exact int64; per-cell |p−q| quantized to
    * micro-units before the integer sum; ordering decides on the
    * QUANTIZED tv (int) with (nation, segment) tie-break — no double
    * ever orders the result.
    *
    * Scale: one (nation, seg, priority) census (map-side combinable);
    * the grid is |groups|×5 built from broadcast censuses; top-10 is
    * a TakeOrderedAndProject. */
  def q236TCloseness(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment").as("seg"),
        col("o_orderpriority").as("pr"))
    val g = o.groupBy("n_name", "seg", "pr").agg(count(lit(1)).as("n"))
    val grp = g.groupBy("n_name", "seg").agg(sum(col("n")).as("ng"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val glob = o.groupBy("pr").agg(count(lit(1)).as("ngl"))
      .withColumn("nt", sum(col("ngl")).over(wAll))
    val grid = grp.crossJoin(broadcast(glob))
      .join(g, Seq("n_name", "seg", "pr"), "left")
      .withColumn("nc", coalesce(col("n"), lit(0L)))
    val cell = abs(col("nc").cast("double") / col("ng") -
      col("ngl").cast("double") / col("nt"))
    grid
      .select(col("n_name"), col("seg"), col("ng"),
        floor(cell * 1e6 + 0.5).cast("long").as("cq"))
      .groupBy("n_name", "seg", "ng")
      .agg(sum(col("cq")).as("tvq"))
      .orderBy(col("tvq").desc, col("n_name"), col("seg"))
      .limit(10)
      .select(col("n_name"), col("seg").as("c_mktsegment"),
        col("ng").as("n_orders"),
        (round(col("tvq").cast("double") / 2e6, 6) + 0.0).as("tv_emd"))
  }

  val q236TClosenessSql: String =
    """WITH o AS (
      |  SELECT n_name, c_mktsegment AS seg, o_orderpriority AS pr
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |g AS (SELECT n_name, seg, pr, COUNT(*) AS n FROM o GROUP BY 1, 2, 3),
      |grp AS (SELECT n_name, seg, CAST(SUM(n) AS BIGINT) AS ng
      |  FROM g GROUP BY 1, 2),
      |gl AS (
      |  SELECT pr, COUNT(*) AS ngl, CAST(SUM(COUNT(*)) OVER () AS BIGINT)
      |    AS nt
      |  FROM o GROUP BY 1),
      |grid AS (
      |  SELECT grp.n_name, grp.seg, grp.ng, gl.pr, gl.ngl, gl.nt,
      |    COALESCE(g.n, 0) AS nc
      |  FROM grp CROSS JOIN gl
      |  LEFT JOIN g ON g.n_name = grp.n_name AND g.seg = grp.seg
      |    AND g.pr = gl.pr),
      |tv AS (
      |  SELECT n_name, seg, ng,
      |    CAST(SUM(CAST(FLOOR(abs(CAST(nc AS DOUBLE) / ng
      |      - CAST(ngl AS DOUBLE) / nt) * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS tvq
      |  FROM grid GROUP BY 1, 2, 3)
      |SELECT n_name, seg AS c_mktsegment, ng AS n_orders,
      |  ROUND(CAST(tvq AS DOUBLE) / 2e6, 6) + 0 AS tv_emd
      |FROM tv
      |ORDER BY tvq DESC, n_name, seg LIMIT 10""".stripMargin

  /** L173 Neyman optimal allocation (Neyman 1934 [PK]): design a
    * stratified sample of n = 1,000 orders across the 5 segments with
    * per-stratum allocation ∝ Nₕ·Sₕ (size × spread — minimum-variance
    * for a fixed total), integerized by largest remainder so the
    * allocations sum to EXACTLY n (the q117/q165 penny-exact
    * discipline). The sample-DESIGN complement to the executed
    * samplers (q127 weighted, q134 stratified split).
    *
    * Parity: Sₕ comes from exact int64/DECIMAL moments through one
    * identical double chain, then the weight Nₕ·Sₕ pins to an int64
    * unit (floor(x+0.5), dollar·row units — headroom to sf ≈ 10⁴);
    * base shares and remainders are exact integer div/mod; the
    * remainder ranking is an integer decision with segment tie-break.
    *
    * Scale: one map-side moment agg; everything after runs on the
    * ≤5-row census via windows. */
  def q239NeymanAllocation(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val n = 1000L
    val o = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") + 0.5).cast("long").as("v"))
    val g = o.groupBy("seg")
      .agg(count(lit(1)).as("nh"), sum(col("v").cast(dec)).as("sv"),
        sum(col("v").cast(dec) * col("v").cast(dec)).as("qv"))
    val sh = sqrt((col("qv").cast("double") -
      col("sv").cast("double") * col("sv").cast("double") / col("nh")) /
      (col("nh") - lit(1.0)))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val t = g.withColumn("wq",
        floor(col("nh").cast("double") * sh + 0.5).cast("long"))
      .withColumn("wt", sum(col("wq")).over(wAll))
      .withColumn("base", expr(s"wq * ${n}L div wt"))
      .withColumn("rem", expr(s"(wq * ${n}L) % wt"))
      .withColumn("deficit", lit(n) - sum(col("base")).over(wAll))
    val wr = Window.orderBy(col("rem").desc, col("seg"))
    t.withColumn("rk", row_number().over(wr))
      .select(col("seg").as("c_mktsegment"), col("nh").as("n_h"),
        (round(sh, 4) + 0.0).as("s_h"),
        (col("base") +
          when(col("rk") <= col("deficit"), 1L).otherwise(0L)).as("alloc"))
      .orderBy("c_mktsegment")
  }

  val q239NeymanAllocationSql: String =
    """WITH o AS (
      |  SELECT c_mktsegment AS seg,
      |    CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) AS v
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |g AS (
      |  SELECT seg, COUNT(*) AS nh,
      |    SUM(CAST(v AS HUGEINT)) AS sv,
      |    SUM(CAST(v AS HUGEINT) * v) AS qv
      |  FROM o GROUP BY seg),
      |t AS (
      |  SELECT seg, nh,
      |    SQRT((CAST(qv AS DOUBLE)
      |      - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / nh)
      |      / (nh - 1.0)) AS sh
      |  FROM g),
      |q AS (
      |  SELECT seg, nh, sh,
      |    CAST(FLOOR(CAST(nh AS DOUBLE) * sh + 0.5) AS BIGINT) AS wq
      |  FROM t),
      |a AS (
      |  SELECT *, CAST(SUM(wq) OVER () AS BIGINT) AS wt FROM q),
      |b AS (
      |  SELECT *, wq * 1000 // wt AS base, (wq * 1000) % wt AS rem
      |  FROM a),
      |c AS (
      |  SELECT *,
      |    1000 - CAST(SUM(base) OVER () AS BIGINT) AS deficit,
      |    ROW_NUMBER() OVER (ORDER BY rem DESC, seg) AS rk
      |  FROM b)
      |SELECT seg AS c_mktsegment, nh AS n_h,
      |  ROUND(sh, 4) + 0 AS s_h,
      |  CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT)
      |    AS alloc
      |FROM c ORDER BY seg""".stripMargin

  /** L175 Friedman test (Friedman 1937 [PK]): the rank-based
    * repeated-measures design — blocks = MONTHS (kept only when all 5
    * priorities transact in the month; days are too sparse — at
    * sf0.001 no day sees all 5 priorities and the statistic would be
    * vacuously empty, the exact failure NonDegeneracySpec exists to
    * forbid; months are 69/79/80-complete at the three SFs),
    * treatments = the 5 priorities, monthly revenue ranked WITHIN each
    * month with average ranks under ties, χ²_F = 12/(bk(k+1))·ΣRⱼ² −
    * 3b(k+1), df = k−1. The blocked complement to q227's pooled
    * Kruskal–Wallis: month-level revenue shifts cancel inside each
    * block instead of inflating the denominator.
    *
    * Parity: within-month average ranks ride DOUBLED units (2·avg is
    * the integer 2·RANK() + ties − 1 — exact under ties, the q210
    * census trick applied per block); Rⱼ2 sums and Rⱼ2² stay inside
    * int64 by block-count bounds (Rⱼ2 ≤ 2k·b ≈ 800 at 80 blocks, so
    * Rⱼ2² is EXACT int64 — no floor pinning needed, unlike q227); χ²
    * is one double chain 4dp.
    *
    * Scale: one (month, priority) census; complete-block filter and
    * per-month ranks run on month-partitioned 5-row windows; ≤5-row
    * algebra after. */
  def q241Friedman(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.orders(s, dir)
      .groupBy(trunc(col("o_orderdate"), "month").as("mon"),
        col("o_orderpriority").as("pr"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
    val wDay = Window.partitionBy("mon")
    val complete = d.withColumn("npr", count(lit(1)).over(wDay))
      .filter(col("npr") === 5)
    // doubled average rank: 2*RANK + (#ties at this rev) - 1
    val wRank = Window.partitionBy("mon").orderBy("rev")
    val wTies = Window.partitionBy("mon", "rev")
    val ranked = complete
      .withColumn("r2",
        lit(2) * rank().over(wRank) + count(lit(1)).over(wTies) - 1)
    val g = ranked.groupBy("pr")
      .agg(count(lit(1)).as("b"), sum(col("r2").cast("long")).as("rj2"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val t = g
      // ΣRⱼ² = Σ(Rⱼ2/2)² = ΣRⱼ2²/4 — exact int64 at fixture block counts
      .withColumn("sr2", sum(col("rj2") * col("rj2")).over(wAll))
    val bD = col("b").cast("double")
    val chi = lit(12.0) / (bD * lit(5.0) * lit(6.0)) *
      (col("sr2").cast("double") / 4.0) - lit(3.0) * bD * lit(6.0)
    t.select(col("pr").as("o_orderpriority"), col("b").as("n_blocks"),
        (round(col("rj2").cast("double") / (bD * 2.0), 4) + 0.0)
          .as("mean_rank"),
        (round(chi, 4) + 0.0).as("chi2_f"),
        lit(4).as("df"))
      .orderBy("o_orderpriority")
  }

  val q241FriedmanSql: String =
    """WITH d AS (
      |  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS mon,
      |    o_orderpriority AS pr,
      |    CAST(SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS BIGINT)
      |      AS rev
      |  FROM orders GROUP BY 1, 2),
      |complete AS (
      |  SELECT * FROM (
      |    SELECT *, COUNT(*) OVER (PARTITION BY mon) AS npr FROM d)
      |  WHERE npr = 5),
      |ranked AS (
      |  SELECT pr,
      |    2 * RANK() OVER (PARTITION BY mon ORDER BY rev)
      |      + COUNT(*) OVER (PARTITION BY mon, rev) - 1 AS r2
      |  FROM complete),
      |g AS (
      |  SELECT pr, COUNT(*) AS b, CAST(SUM(r2) AS BIGINT) AS rj2
      |  FROM ranked GROUP BY pr),
      |t AS (
      |  SELECT *, CAST(SUM(rj2 * rj2) OVER () AS BIGINT) AS sr2 FROM g)
      |SELECT pr AS o_orderpriority, b AS n_blocks,
      |  ROUND(CAST(rj2 AS DOUBLE) / (b * 2.0), 4) + 0 AS mean_rank,
      |  ROUND(12.0 / (CAST(b AS DOUBLE) * 5.0 * 6.0)
      |    * (CAST(sr2 AS DOUBLE) / 4.0)
      |    - 3.0 * CAST(b AS DOUBLE) * 6.0, 4) + 0 AS chi2_f,
      |  4 AS df
      |FROM t ORDER BY pr""".stripMargin

  /** L177 Page's trend test (Page 1963 [PK]): the ORDERED alternative
    * inside q241's blocked design — is monthly revenue rank MONOTONE
    * in priority level? L = Σⱼ j·Rⱼ against E[L] = bk(k+1)²/4,
    * Var[L] = bk²(k+1)²(k−1)/144. Friedman answers "any difference";
    * Page answers "a trend in the stated order" — strictly more power
    * when the ordering is real (the q234 dose-response idea lifted to
    * the blocked design).
    *
    * Parity: the q241 doubled-rank construction verbatim (exact under
    * ties); L2 = Σ j·Rⱼ2 is exact int64; z and p are one double chain
    * on both engines (p A-S quantized 1e-8).
    *
    * Scale: identical to q241 — census windows and ≤5-row algebra. */
  def q243PageTrend(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.orders(s, dir)
      .groupBy(trunc(col("o_orderdate"), "month").as("mon"),
        col("o_orderpriority").as("pr"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
    val wMon = Window.partitionBy("mon")
    val complete = d.withColumn("npr", count(lit(1)).over(wMon))
      .filter(col("npr") === 5)
    val wRank = Window.partitionBy("mon").orderBy("rev")
    val wTies = Window.partitionBy("mon", "rev")
    val ranked = complete
      .withColumn("r2",
        lit(2) * rank().over(wRank) + count(lit(1)).over(wTies) - 1)
      .withColumn("sc", substring(col("pr"), 1, 1).cast("long"))
    val g = ranked.groupBy("pr", "sc")
      .agg(count(lit(1)).as("b"), sum(col("r2").cast("long")).as("rj2"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val t = g.withColumn("l2", sum(col("sc") * col("rj2")).over(wAll))
    val bD = col("b").cast("double")
    // doubled: E[L2] = 2·b·k(k+1)²/4 = 90b, SD[L2] = 2·√(25b) = 10√b
    val z = (col("l2").cast("double") - lit(90.0) * bD) /
      (lit(10.0) * sqrt(bD))
    t.select(col("pr").as("o_orderpriority"), col("sc").as("score"),
        col("b").as("n_blocks"),
        (round(col("rj2").cast("double") / (bD * 2.0), 4) + 0.0)
          .as("mean_rank"),
        (col("l2").cast("double") / 2.0).as("l_stat"),
        (round(z, 4) + 0.0).as("z_trend"),
        (floor(asTwoSidedP(z) * 1e8 + 0.5) / 1e8).as("p"))
      .orderBy("score")
  }

  val q243PageTrendSql: String = {
    val z = "((CAST(l2 AS DOUBLE) - 90.0 * b) / (10.0 * SQRT(CAST(b AS DOUBLE))))"
    s"""WITH d AS (
       |  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS mon,
       |    o_orderpriority AS pr,
       |    CAST(SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS BIGINT)
       |      AS rev
       |  FROM orders GROUP BY 1, 2),
       |complete AS (
       |  SELECT * FROM (
       |    SELECT *, COUNT(*) OVER (PARTITION BY mon) AS npr FROM d)
       |  WHERE npr = 5),
       |ranked AS (
       |  SELECT pr, CAST(SUBSTRING(pr, 1, 1) AS BIGINT) AS sc,
       |    2 * RANK() OVER (PARTITION BY mon ORDER BY rev)
       |      + COUNT(*) OVER (PARTITION BY mon, rev) - 1 AS r2
       |  FROM complete),
       |g AS (
       |  SELECT pr, sc, COUNT(*) AS b, CAST(SUM(r2) AS BIGINT) AS rj2
       |  FROM ranked GROUP BY pr, sc),
       |t AS (
       |  SELECT *, CAST(SUM(sc * rj2) OVER () AS BIGINT) AS l2 FROM g)
       |SELECT pr AS o_orderpriority, sc AS score, b AS n_blocks,
       |  ROUND(CAST(rj2 AS DOUBLE) / (b * 2.0), 4) + 0 AS mean_rank,
       |  CAST(l2 AS DOUBLE) / 2.0 AS l_stat,
       |  ROUND($z, 4) + 0 AS z_trend,
       |  FLOOR(${asTwoSidedPSql(z)} * 1e8 + 0.5) / 1e8 AS p
       |FROM t ORDER BY score""".stripMargin
  }

  /** L188 Jonckheere–Terpstra test (Jonckheere 1954, Terpstra 1952
    * [PK]): the ordered-alternative k-group rank test —
    * J = Σ_{g<h} U_gh over the 5 priority levels in score order, ties
    * half-counted, z against E[J] = (N²−Σnⱼ²)/4 and the classical
    * no-tie Var[J] = [N²(2N+3) − Σnⱼ²(2nⱼ+3)]/72 (cent-grain values
    * make ties negligible; the half-count keeps J itself exact — the
    * variance convention is pinned identically on both engines). The
    * k-group ordered analog of what Page (q243) does for blocks:
    * Kruskal–Wallis (q227) answers "any difference", J-T answers "a
    * trend in the stated order".
    *
    * Parity: per-(value, level) census + 5 per-level [[PrefixSum]]
    * columns; each U_gh term is exact DECIMAL arithmetic (2·U to keep
    * half-counts integral); z is one double chain; p A-S quantized.
    *
    * Scale: one value census, ONE multi-column prefix pass, map-side
    * aggregation of the 10 ordered-pair terms — no pair blow-up. */
  def q254JonckheereTerpstra(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val o = Tables.orders(s, dir)
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("c"),
        substring(col("o_orderpriority"), 1, 1).cast("int").as("g"))
    val nAggs = (1 to 5).map(g =>
      sum(when(col("g") === g, 1L).otherwise(0L)).as(s"n$g"))
    val cen = o.groupBy("c").agg(nAggs.head, nAggs.tail: _*)
    val cum = graft.ops.PrefixSum.withPrefixSums(cen, Seq(col("c")),
      (1 to 5).map(g => (col(s"n$g"), s"cum$g")))
    // 2·U_gh summed over g<h: for each value row, group h's count
    // meets group g's strictly-smaller mass (cum_g − n_g) twice plus
    // its tied mass n_g once
    val u2Terms = (for {
      g <- 1 to 4; h <- (g + 1) to 5
    } yield col(s"n$h").cast(dec) *
      ((col(s"cum$g") - col(s"n$g")).cast(dec) * 2 +
        col(s"n$g").cast(dec))).reduce(_ + _)
    val aggCols = sum(u2Terms).as("j2") +:
      (1 to 5).map(g => sum(col(s"n$g")).as(s"nt$g"))
    val agg = cum.agg(aggCols.head, aggCols.tail: _*)
    val nTot = (1 to 5).map(g => col(s"nt$g")).reduce(_ + _).cast("double")
    val sumSq = (1 to 5).map(g =>
      col(s"nt$g").cast("double") * col(s"nt$g")).reduce(_ + _)
    val sumSq23 = (1 to 5).map(g =>
      col(s"nt$g").cast("double") * col(s"nt$g") *
        (lit(2.0) * col(s"nt$g") + 3.0)).reduce(_ + _)
    val j = col("j2").cast("double") / 2.0
    val eJ = (nTot * nTot - sumSq) / 4.0
    val varJ = (nTot * nTot * (lit(2.0) * nTot + 3.0) - sumSq23) / 72.0
    val z = (j - eJ) / sqrt(varJ)
    agg.select(nTot.cast("long").as("n_orders"),
      (col("j2") / 2).cast("double").as("j_stat"),
      (round(z, 4) + 0.0).as("z_jt"),
      (floor(asTwoSidedP(z) * 1e8 + 0.5) / 1e8).as("p"))
  }

  val q254JonckheereTerpstraSql: String = {
    val nCols = (1 to 5).map(g =>
      s"CAST(SUM(CASE WHEN g = $g THEN 1 ELSE 0 END) AS BIGINT) AS n$g")
      .mkString(",\n      |    ")
    val cumCols = (1 to 5).map(g =>
      s"CAST(SUM(n$g) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)" +
        s" AS BIGINT) AS cum$g").mkString(",\n      |    ")
    val u2 = (for { g <- 1 to 4; h <- (g + 1) to 5 } yield
      s"CAST(n$h AS HUGEINT) * ((cum$g - n$g) * 2 + n$g)")
      .mkString(" + ")
    val ntCols = (1 to 5).map(g =>
      s"CAST(SUM(n$g) AS BIGINT) AS nt$g").mkString(",\n      |    ")
    val nTot = (1 to 5).map(g => s"nt$g").mkString(" + ")
    val sumSq = (1 to 5).map(g =>
      s"CAST(nt$g AS DOUBLE) * nt$g").mkString(" + ")
    val sumSq23 = (1 to 5).map(g =>
      s"CAST(nt$g AS DOUBLE) * nt$g * (2.0 * nt$g + 3.0)").mkString(" + ")
    val z = s"((CAST(j2 AS DOUBLE) / 2.0 " +
      s"- ((nt + 0.0) * nt - ($sumSq)) / 4.0) " +
      s"/ SQRT(((nt + 0.0) * nt * (2.0 * nt + 3.0) - ($sumSq23)) / 72.0))"
    s"""WITH o AS (
       |  SELECT CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c,
       |    CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS g
       |  FROM orders),
       |cen AS (
       |  SELECT c,
       |    $nCols
       |  FROM o GROUP BY c),
       |cum AS (
       |  SELECT *,
       |    $cumCols
       |  FROM cen),
       |agg AS (
       |  SELECT CAST(SUM($u2) AS HUGEINT) AS j2,
       |    $ntCols
       |  FROM cum),
       |t AS (SELECT *, $nTot AS nt FROM agg)
       |SELECT CAST(nt AS BIGINT) AS n_orders,
       |  CAST(j2 AS DOUBLE) / 2.0 AS j_stat,
       |  ROUND($z, 4) + 0 AS z_jt,
       |  FLOOR(${asTwoSidedPSql(z)} * 1e8 + 0.5) / 1e8 AS p
       |FROM t""".stripMargin
  }

  /** L189 normal-fit KS (Lilliefors-style distance; Lilliefors 1967
    * [PK]): the exact KS distance between the order-value empirical
    * CDF and N(μ̂, σ̂²) fitted from the same data — "is spend even
    * approximately normal?" is the assumption q228/q231/q247 lean on,
    * and this measures exactly how false it is (the normal-null
    * sibling of q240's exponential fit; critical values differ from
    * plain KS because the parameters are estimated — the DISTANCE is
    * what's reported).
    *
    * Parity: μ̂/σ̂ from exact int64/DECIMAL moments; Φ is DEFINED as
    * the A-S 26.2.17 polynomial (Φ(z) = 1 − p₂(z)/2 for z ≥ 0,
    * p₂(z)/2 below — the same kernel as every p in the suite);
    * empirical CDF steps ride the value census + [[PrefixSum]];
    * per-step D candidates nano-quantize before the integer MAX
    * (q240 discipline).
    *
    * Scale: the q240 shape — census, prefix sums, one max agg. */
  def q255NormalFitKs(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val o = Tables.orders(s, dir)
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("c"))
    val cen = o.groupBy("c").agg(count(lit(1)).as("cnt"))
    val cum = graft.ops.PrefixSum.withPrefixSums(cen,
      Seq(col("c")), Seq((col("cnt"), "cum")))
    val tot = cen.agg(sum(col("cnt")).as("n"),
      sum(col("c").cast(dec) * col("cnt").cast(dec)).as("sv"),
      sum(col("c").cast(dec) * col("c").cast(dec) * col("cnt").cast(dec))
        .as("qv"))
    val mu = col("sv").cast("double") / col("n")
    val sd = sqrt((col("qv").cast("double") - col("sv").cast("double") *
      mu) / (col("n") - lit(1.0)))
    val zv = (col("c").cast("double") - mu) / sd
    val phi = when(zv >= 0, lit(1.0) - StatFns.asTwoSidedP(zv) / 2.0)
      .otherwise(StatFns.asTwoSidedP(zv) / 2.0)
    val fHi = col("cum").cast("double") / col("n")
    val fLo = (col("cum") - col("cnt")).cast("double") / col("n")
    cum.crossJoin(broadcast(tot))
      .select(col("n"), mu.as("muv"), sd.as("sdv"),
        floor(greatest(abs(fHi - phi), abs(phi - fLo)) * 1e9 + 0.5)
          .cast("long").as("dq"))
      .groupBy("n")
      .agg(max(col("muv")).as("muv"), max(col("sdv")).as("sdv"),
        max(col("dq")).as("dmax"))
      .select(col("n").as("n_orders"),
        (round(col("muv") / 100.0, 4) + 0.0).as("mean_price"),
        (round(col("sdv") / 100.0, 4) + 0.0).as("sd_price"),
        (round(col("dmax").cast("double") / 1e9, 6) + 0.0).as("ks_d"))
  }

  val q255NormalFitKsSql: String = {
    val phi = s"(CASE WHEN zv >= 0 THEN 1.0 - ${asTwoSidedPSql("zv")} / 2.0" +
      s" ELSE ${asTwoSidedPSql("zv")} / 2.0 END)"
    s"""WITH o AS (
       |  SELECT CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
       |  FROM orders),
       |cen AS (SELECT c, COUNT(*) AS cnt FROM o GROUP BY c),
       |cum AS (
       |  SELECT c, cnt,
       |    CAST(SUM(cnt) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cum
       |  FROM cen),
       |tot AS (
       |  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
       |    SUM(CAST(c AS HUGEINT) * cnt) AS sv,
       |    SUM(CAST(c AS HUGEINT) * c * cnt) AS qv
       |  FROM cen),
       |m AS (
       |  SELECT n, CAST(sv AS DOUBLE) / n AS mu,
       |    SQRT((CAST(qv AS DOUBLE) - CAST(sv AS DOUBLE)
       |      * (CAST(sv AS DOUBLE) / n)) / (n - 1.0)) AS sd
       |  FROM tot),
       |d AS (
       |  SELECT n, mu, sd,
       |    CAST(FLOOR(GREATEST(
       |      abs(CAST(cum AS DOUBLE) / n - $phi),
       |      abs($phi - CAST(cum - cnt AS DOUBLE) / n)) * 1e9 + 0.5)
       |      AS BIGINT) AS dq
       |  FROM (SELECT cum.*, m.n, m.mu, m.sd,
       |      (CAST(c AS DOUBLE) - mu) / sd AS zv
       |    FROM cum, m) q)
       |SELECT n AS n_orders,
       |  ROUND(MAX(mu) / 100.0, 4) + 0 AS mean_price,
       |  ROUND(MAX(sd) / 100.0, 4) + 0 AS sd_price,
       |  ROUND(CAST(MAX(dq) AS DOUBLE) / 1e9, 6) + 0 AS ks_d
       |FROM d GROUP BY n""".stripMargin
  }

  /** L184 Cliff's delta (Cliff 1993 [PK]; Romano magnitude bands):
    * the ordinal effect size for q210's URGENT-vs-LOW design —
    * δ = P(X>Y) − P(X<Y) = 2U/(n₁n₂) − 1, read straight off the
    * doubled-rank U. q210 says whether the groups differ; q247's d
    * assumes intervals; δ is the assumption-free magnitude on ranks
    * (the pair q210 should always be reported with).
    *
    * Parity: U2 = 2U is exact int64/DECIMAL from the doubled-rank
    * census (average ranks make ties count half, the standard δ tie
    * convention); δ is one exact-int division displayed 6dp; the
    * Romano band is an integer decision on micro-quantized |δ|.
    *
    * Scale: the q210 shape verbatim — census + [[PrefixSum]], no
    * fact-data sort. */
  def q250CliffsDelta(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val f = Tables.orders(s, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("c"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("g1"))
    val cen = f.groupBy("c")
      .agg(count(lit(1)).as("n"), sum(col("g1")).as("n1"))
    val cum = graft.ops.PrefixSum.withPrefixSums(cen,
      Seq(col("c")), Seq((col("n"), "cumn")))
    val g = cum.agg(
      sum(col("n1")).as("n1t"),
      sum(col("n") - col("n1")).as("n2t"),
      sum(col("n1").cast(dec) *
        (col("cumn") * 2 - col("n") + 1).cast(dec)).as("r2s"))
    val u2 = col("r2s") - col("n1t").cast(dec) * (col("n1t") + 1).cast(dec)
    val delta = u2.cast("double") /
      (col("n1t").cast("double") * col("n2t")) - lit(1.0)
    val adq = floor(abs(delta) * 1e6 + 0.5)
    g.select(col("n1t").as("n_urgent"), col("n2t").as("n_low"),
      (round(delta, 6) + 0.0).as("cliffs_delta"),
      when(adq < 147000L, "negligible")
        .when(adq < 330000L, "small")
        .when(adq < 474000L, "medium")
        .otherwise("large").as("magnitude"))
  }

  val q250CliffsDeltaSql: String =
    """WITH f AS (
      |  SELECT CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1
      |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
      |cen AS (
      |  SELECT c, COUNT(*) AS n, CAST(SUM(g1) AS BIGINT) AS n1
      |  FROM f GROUP BY c),
      |cum AS (
      |  SELECT *, CAST(SUM(n) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
      |    AS BIGINT) AS cumn
      |  FROM cen),
      |g AS (
      |  SELECT CAST(SUM(n1) AS BIGINT) AS n1t,
      |    CAST(SUM(n - n1) AS BIGINT) AS n2t,
      |    SUM(CAST(n1 AS HUGEINT) * (cumn * 2 - n + 1)) AS r2s
      |  FROM cum),
      |d AS (
      |  SELECT n1t, n2t,
      |    CAST(r2s - CAST(n1t AS HUGEINT) * (n1t + 1) AS DOUBLE)
      |      / (CAST(n1t AS DOUBLE) * n2t) - 1.0 AS delta
      |  FROM g)
      |SELECT n1t AS n_urgent, n2t AS n_low,
      |  ROUND(delta, 6) + 0 AS cliffs_delta,
      |  CASE WHEN FLOOR(abs(delta) * 1e6 + 0.5) < 147000 THEN 'negligible'
      |    WHEN FLOOR(abs(delta) * 1e6 + 0.5) < 330000 THEN 'small'
      |    WHEN FLOOR(abs(delta) * 1e6 + 0.5) < 474000 THEN 'medium'
      |    ELSE 'large' END AS magnitude
      |FROM d""".stripMargin

  /** L181 standardized effect sizes (Cohen 1988, Hedges 1981 [PK]):
    * Cohen's d on the q231 two-segment design (pooled SD), Hedges'
    * small-sample correction g = J·d with J = 1 − 3/(4N−9), and the
    * 95% CI of d — the "is it LARGE, not just significant" companion
    * every q231/q172-style test needs at fixture-to-fleet scale,
    * where p-values saturate long before effects matter.
    *
    * Parity: the q231 exact moments verbatim; d/J/g/CI are one
    * identical double chain, 6dp.
    *
    * Scale: the q231 shape — one 2-group moment agg, 1-row algebra. */
  def q247EffectSize(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val o = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "FURNITURE"))
      .select((col("c_mktsegment") === "BUILDING").as("ga"),
        floor(col("o_totalprice") + 0.5).cast("long").as("v"))
    val g = o.groupBy("ga")
      .agg(count(lit(1)).as("n"), sum(col("v").cast(dec)).as("sv"),
        sum(col("v").cast(dec) * col("v").cast(dec)).as("qv"))
    val piv = g.agg(
      max(when(col("ga"), col("n"))).as("n_a"),
      max(when(col("ga"), col("sv"))).as("s_a"),
      max(when(col("ga"), col("qv"))).as("q_a"),
      max(when(!col("ga"), col("n"))).as("n_b"),
      max(when(!col("ga"), col("sv"))).as("s_b"),
      max(when(!col("ga"), col("qv"))).as("q_b"))
    def ss(qv: String, sv: String, n: String) =
      col(qv).cast("double") -
        col(sv).cast("double") * col(sv).cast("double") / col(n)
    val nT = (col("n_a") + col("n_b")).cast("double")
    val sp = sqrt((ss("q_a", "s_a", "n_a") + ss("q_b", "s_b", "n_b")) /
      (nT - 2.0))
    val dEff = (col("s_a").cast("double") / col("n_a") -
      col("s_b").cast("double") / col("n_b")) / sp
    val j = lit(1.0) - lit(3.0) / (lit(4.0) * nT - 9.0)
    val seD = sqrt(nT / (col("n_a").cast("double") * col("n_b")) +
      dEff * dEff / (lit(2.0) * nT))
    piv.select(col("n_a"), col("n_b"),
      (round(sp, 4) + 0.0).as("pooled_sd"),
      (round(dEff, 6) + 0.0).as("cohens_d"),
      (round(j * dEff, 6) + 0.0).as("hedges_g"),
      (round(dEff - lit(1.96) * seD, 6) + 0.0).as("d_ci_lo"),
      (round(dEff + lit(1.96) * seD, 6) + 0.0).as("d_ci_hi"))
  }

  val q247EffectSizeSql: String =
    """WITH o AS (
      |  SELECT c_mktsegment = 'BUILDING' AS ga,
      |    CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) AS v
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'FURNITURE')),
      |g AS (
      |  SELECT ga, COUNT(*) AS n, SUM(CAST(v AS HUGEINT)) AS sv,
      |    SUM(CAST(v AS HUGEINT) * v) AS qv
      |  FROM o GROUP BY ga),
      |piv AS (
      |  SELECT
      |    MAX(CASE WHEN ga THEN n END) AS n_a,
      |    MAX(CASE WHEN ga THEN sv END) AS s_a,
      |    MAX(CASE WHEN ga THEN qv END) AS q_a,
      |    MAX(CASE WHEN NOT ga THEN n END) AS n_b,
      |    MAX(CASE WHEN NOT ga THEN sv END) AS s_b,
      |    MAX(CASE WHEN NOT ga THEN qv END) AS q_b
      |  FROM g),
      |c AS (
      |  SELECT n_a, n_b,
      |    SQRT(((CAST(q_a AS DOUBLE)
      |        - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / n_a)
      |      + (CAST(q_b AS DOUBLE)
      |        - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / n_b))
      |      / (CAST(n_a + n_b AS DOUBLE) - 2.0)) AS sp,
      |    CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b AS md,
      |    CAST(n_a + n_b AS DOUBLE) AS nt
      |  FROM piv),
      |e AS (
      |  SELECT n_a, n_b, sp, nt, md / sp AS d,
      |    SQRT(nt / (CAST(n_a AS DOUBLE) * n_b)
      |      + (md / sp) * (md / sp) / (2.0 * nt)) AS sed
      |  FROM c)
      |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  ROUND(sp, 4) + 0 AS pooled_sd,
      |  ROUND(d, 6) + 0 AS cohens_d,
      |  ROUND((1.0 - 3.0 / (4.0 * nt - 9.0)) * d, 6) + 0 AS hedges_g,
      |  ROUND(d - 1.96 * sed, 6) + 0 AS d_ci_lo,
      |  ROUND(d + 1.96 * sed, 6) + 0 AS d_ci_hi
      |FROM e""".stripMargin

  /** L183 Atkinson inequality index, ε = 1 (Atkinson 1970 [PK]):
    * A₁ = 1 − geomean/mean over per-customer lifetime revenue within
    * each segment — the welfare-founded inequality member beside the
    * descriptive Gini (q150), Lorenz deciles (q167), HHI (q190), and
    * Theil (q191): A₁ is the fraction of total revenue that could be
    * given up with no welfare loss under log utility if revenue were
    * equal.
    *
    * Parity: revenue is an exact int64 cents sum (always > 0, so ln is
    * total); per-customer ln terms quantize to nano-units before the
    * integer sum (q185 discipline), the mean is an exact-int division,
    * and A₁ = 1 − exp(Σln/n)/mean is one double chain 6dp.
    *
    * Scale: customer rollup + one map-side-combinable segment agg. */
  def q249Atkinson(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("c_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
        .as("c"))
    val g = cust.groupBy("seg")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
        sum(floor(log(col("c").cast("double")) * 1e9 + 0.5).cast("long"))
          .as("lnq"))
    val mean = col("sc").cast("double") / col("n")
    val geo = exp(col("lnq").cast("double") / 1e9 / col("n"))
    g.select(col("seg").as("c_mktsegment"), col("n").as("n_customers"),
        (round(mean / 100.0, 4) + 0.0).as("mean_rev"),
        (round(geo / 100.0, 4) + 0.0).as("geomean_rev"),
        (round(lit(1.0) - geo / mean, 6) + 0.0).as("atkinson_1"))
      .orderBy("c_mktsegment")
  }

  val q249AtkinsonSql: String =
    """WITH cust AS (
      |  SELECT c_mktsegment AS seg, c_custkey,
      |    SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS c
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |g AS (
      |  SELECT seg, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS sc,
      |    CAST(SUM(CAST(FLOOR(LN(CAST(c AS DOUBLE)) * 1e9 + 0.5)
      |      AS BIGINT)) AS BIGINT) AS lnq
      |  FROM cust GROUP BY seg)
      |SELECT seg AS c_mktsegment, n AS n_customers,
      |  ROUND(CAST(sc AS DOUBLE) / n / 100.0, 4) + 0 AS mean_rev,
      |  ROUND(EXP(CAST(lnq AS DOUBLE) / 1e9 / n) / 100.0, 4) + 0
      |    AS geomean_rev,
      |  ROUND(1.0 - EXP(CAST(lnq AS DOUBLE) / 1e9 / n)
      |    / (CAST(sc AS DOUBLE) / n), 6) + 0 AS atkinson_1
      |FROM g ORDER BY seg""".stripMargin

  /** L178 two-sample Cramér–von Mises (Anderson 1962 [PK], the
    * rank-sum form): BUILDING vs FURNITURE order values again (q231's
    * design), but comparing the WHOLE distributions:
    * U = n·Σᵢ(rᵢ−i)² + m·Σⱼ(sⱼ−j)², T = U/(nmN) − (4nm−1)/(6N). KS
    * (q147) sees the single largest CDF gap; CvM integrates ALL of
    * it — more power against diffuse shape differences.
    *
    * Parity: combined average ranks and within-sample indices both
    * ride DOUBLED units from exact censuses ([[PrefixSum]] twice — no
    * single-partition window); each observation's (r2−2i)² lands in
    * DECIMAL(38,0)/HUGEINT, so U is exact through sf ≫ 1; T is one
    * double chain 6dp. Each distinct value's observations explode
    * their within-sample index range from the census (linear in rows,
    * the same cost as scanning them).
    *
    * Scale: two censuses + prefix sums + one linear explode; no
    * sort of fact data beyond the census ranks. */
  def q244CramerVonMises(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val o = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "FURNITURE"))
      .select((col("c_mktsegment") === "BUILDING").as("gx"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("c"))
    val cen = o.groupBy("c").agg(
      count(lit(1)).as("n_all"),
      sum(when(col("gx"), 1L).otherwise(0L)).as("nx"),
      sum(when(col("gx"), 0L).otherwise(1L)).as("ny"))
    val cum = graft.ops.PrefixSum.withPrefixSums(cen, Seq(col("c")),
      Seq((col("n_all"), "cum_all"), (col("nx"), "cum_x"),
        (col("ny"), "cum_y")))
      .withColumn("r2", col("cum_all") * 2 - col("n_all") + 1)
    def sumSq(nCol: Column, cumCol: Column): Column = {
      // Σ_{i=a..b} (r2 − 2i)² for the consecutive within-sample index
      // range a..b of this value's observations, via explode
      val a = cumCol - nCol + 1
      explode(when(nCol > 0, sequence(a, cumCol))
        .otherwise(array().cast("array<long>")))
    }
    val xs = cum.select(col("r2"), sumSq(col("nx"), col("cum_x")).as("i"))
      .select(((col("r2") - col("i") * 2).cast(dec) *
        (col("r2") - col("i") * 2).cast(dec)).as("sq"))
      .agg(sum("sq").as("ux2"), count(lit(1)).as("n"))
    val ys = cum.select(col("r2"), sumSq(col("ny"), col("cum_y")).as("i"))
      .select(((col("r2") - col("i") * 2).cast(dec) *
        (col("r2") - col("i") * 2).cast(dec)).as("sq"))
      .agg(sum("sq").as("uy2"), count(lit(1)).as("m"))
    val nD = col("n").cast("double")
    val mD = col("m").cast("double")
    val bigN = nD + mD
    val u = (nD * col("ux2").cast("double") +
      mD * col("uy2").cast("double")) / 4.0
    val t = u / (nD * mD * bigN) -
      (lit(4.0) * nD * mD - 1.0) / (lit(6.0) * bigN)
    xs.crossJoin(broadcast(ys))
      .select(col("n").as("n_x"), col("m").as("n_y"),
        (round(t, 6) + 0.0).as("t_cvm"))
  }

  val q244CramerVonMisesSql: String =
    """WITH o AS (
      |  SELECT c_mktsegment = 'BUILDING' AS gx,
      |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'FURNITURE')),
      |cen AS (
      |  SELECT c, COUNT(*) AS n_all,
      |    CAST(SUM(CASE WHEN gx THEN 1 ELSE 0 END) AS BIGINT) AS nx,
      |    CAST(SUM(CASE WHEN gx THEN 0 ELSE 1 END) AS BIGINT) AS ny
      |  FROM o GROUP BY c),
      |cum AS (
      |  SELECT c, n_all, nx, ny,
      |    CAST(SUM(n_all) OVER w AS BIGINT) AS cum_all,
      |    CAST(SUM(nx) OVER w AS BIGINT) AS cum_x,
      |    CAST(SUM(ny) OVER w AS BIGINT) AS cum_y,
      |    CAST(2 * SUM(n_all) OVER w - n_all + 1 AS BIGINT) AS r2
      |  FROM cen
      |  WINDOW w AS (ORDER BY c ROWS UNBOUNDED PRECEDING)),
      |xs AS (
      |  SELECT CAST(SUM(CAST((r2 - 2 * i) AS HUGEINT)
      |      * (r2 - 2 * i)) AS HUGEINT) AS ux2,
      |    COUNT(*) AS n
      |  FROM cum, LATERAL (SELECT unnest(range(cum_x - nx + 1, cum_x + 1))
      |    AS i) ii
      |  WHERE nx > 0),
      |ys AS (
      |  SELECT CAST(SUM(CAST((r2 - 2 * i) AS HUGEINT)
      |      * (r2 - 2 * i)) AS HUGEINT) AS uy2,
      |    COUNT(*) AS m
      |  FROM cum, LATERAL (SELECT unnest(range(cum_y - ny + 1, cum_y + 1))
      |    AS i) ii
      |  WHERE ny > 0)
      |SELECT n AS n_x, m AS n_y,
      |  ROUND((CAST(n AS DOUBLE) * CAST(ux2 AS DOUBLE)
      |      + CAST(m AS DOUBLE) * CAST(uy2 AS DOUBLE)) / 4.0
      |    / (CAST(n AS DOUBLE) * m * (n + m))
      |    - (4.0 * CAST(n AS DOUBLE) * m - 1.0) / (6.0 * (n + m)), 6) + 0
      |    AS t_cvm
      |FROM xs, ys""".stripMargin
}
