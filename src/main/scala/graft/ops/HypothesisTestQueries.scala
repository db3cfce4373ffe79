package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hypothesis-test operators, split out of CurationQueries in round 12
  * (the file had grown past 3,900 lines — review and merge locality).
  * Family: two-sample and k-sample location/dispersion tests, paired and
  * trend tests on contingency censuses, goodness-of-fit distances, the
  * BH multiple-testing ladder, and their effect sizes. Every member
  * keeps the discipline it shipped with: a DuckDB mirror built from the
  * same census algebra, a StatBruteSpec sequential reference, and a
  * NonDegeneracySpec invariant. All collapse fact data map-side to
  * value/group censuses before any window or join (the q210/q147
  * shape), so nothing here scans more than once or sorts fact-sized
  * data on one partition.
  */
object HypothesisTestQueries {
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
    // fuzz hardening (r12): a zero off-diagonal leaves the stratum OR
    // (and sbc = 0 the pooled OR) undefined — null, not a crash
    t.select(col("seg").as("c_mktsegment"),
        col("a"), col("b"), col("c"), col("d"),
        when(col("b") * col("c") === 0, lit(null).cast("double"))
          .otherwise(round(col("a").cast("double") * col("d") /
            (col("b").cast("double") * col("c")), 4) + 0.0)
          .as("or_stratum"),
        when(col("sbc") === 0, lit(null).cast("double"))
          .otherwise(round(col("sad").cast("double") /
            col("sbc").cast("double"), 4) + 0.0).as("or_mh"))
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
      |  CASE WHEN b * c = 0 THEN NULL ELSE
      |    ROUND(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 4) + 0
      |    END AS or_stratum,
      |  CASE WHEN sbc = 0 THEN NULL ELSE
      |    ROUND(CAST(sad AS DOUBLE) / CAST(sbc AS DOUBLE), 4) + 0
      |    END AS or_mh
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
    // fuzz hardening (r12): an all-0 or all-1 outcome (or a single
    // score level) zeroes the trend variance — z undefined, not a crash
    val z = when(tVar <= 0.0, lit(null).cast("double"))
      .otherwise(tNum / sqrt(tVar))
    t.select(col("priority"), col("sc").as("score"), col("n_i"), col("x_i"),
        (round(col("x_i").cast("double") / col("n_i"), 4) + 0.0).as("rate"),
        (round(z, 4) + 0.0).as("z_trend"),
        (floor(asTwoSidedP(z) * 1e8 + 0.5) / 1e8).as("p"))
      .orderBy("score")
  }

  val q234CochranArmitageSql: String = {
    val tv = "(pbar * (1.0 - pbar)" +
      " * (CAST(ss2n AS DOUBLE) - CAST(ssn AS DOUBLE) * ssn / nt))"
    val z = s"(CASE WHEN $tv <= 0.0 THEN NULL ELSE" +
      s" ((CAST(ssx AS DOUBLE) - pbar * ssn) / SQRT($tv)) END)"
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
        (floor(col("dmax").cast("double") / 1e9 * 1e6 + 0.5) / 1e6)
        .as("ks_d"))
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
       |  FLOOR(CAST(MAX(dq) AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6 AS ks_d
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

  /** L190 Jarque–Bera normality test (Jarque & Bera 1980 [PK]) on
    * order prices: JB = n/6·(S² + K²/4) from the sample skewness S and
    * excess kurtosis K — the moment-based normality screen beside
    * q255's Lilliefors distance (KS sees the worst CDF gap; JB sees
    * tail/asymmetry shape). p = exp(−JB/2), the exact χ²₂ tail.
    *
    * Parity: prices ride the cent census; the mean is centered to the
    * FLOOR-integer m (identical double division + floor on both
    * engines), so every central power sum Σcnt·(c−m)^k is an EXACT
    * DECIMAL/HUGEINT (bounded by n·range⁴ < 10³⁸ — holds to ~10⁹ rows
    * at a 10⁶-dollar price spread, documented bound); S/K/JB are one
    * identical double chain, p quantized at 1e-8 (q216 discipline).
    *
    * Scale: one map-side census collapse, one census agg, 1-row
    * algebra — the q255 shape minus the CDF pass. Fuzz-hardened at
    * birth: n < 2 or zero variance → null statistics. */
  def q256JarqueBera(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val o = Tables.orders(s, dir)
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("c"))
    val cen = o.groupBy("c").agg(count(lit(1)).as("cnt"))
    val s1 = cen.agg(sum(col("cnt")).as("n"),
      sum(col("c").cast(dec) * col("cnt").cast(dec)).as("sv"))
      .select(col("n"),
        floor(col("sv").cast("double") / col("n").cast("double"))
          .cast("long").as("m"))
    val d = col("c") - col("m")
    val pw = cen.crossJoin(broadcast(s1))
      .select(col("n"),
        (d.cast(dec) * d.cast(dec) * col("cnt").cast(dec)).as("d2"),
        (d.cast(dec) * d.cast(dec) * d.cast(dec) * col("cnt").cast(dec))
          .as("d3"),
        (d.cast(dec) * d.cast(dec) * d.cast(dec) * d.cast(dec) *
          col("cnt").cast(dec)).as("d4"))
      .groupBy("n")
      .agg(sum(col("d2")).as("s2"), sum(col("d3")).as("s3"),
        sum(col("d4")).as("s4"))
    val nD = col("n").cast("double")
    val m2 = col("s2").cast("double") / nD
    val skew = (col("s3").cast("double") / nD) / pow(m2, 1.5)
    val exk = (col("s4").cast("double") / nD) / (m2 * m2) - 3.0
    val jb = nD / 6.0 * (skew * skew + exk * exk / 4.0)
    val bad = col("n") < 2 || col("s2") <= 0
    pw.select(col("n").as("n_orders"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(skew, 6) + 0.0).as("skewness"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(exk, 6) + 0.0).as("excess_kurtosis"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(jb, 4) + 0.0).as("jb_stat"),
      when(bad, lit(null).cast("double"))
        .otherwise(floor(exp(-jb / 2.0) * 1e8 + 0.5) / 1e8).as("p"))
  }

  val q256JarqueBeraSql: String =
    """WITH o AS (
      |  SELECT CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
      |  FROM orders),
      |cen AS (SELECT c, COUNT(*) AS cnt FROM o GROUP BY c),
      |s1 AS (
      |  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
      |    CAST(FLOOR(CAST(SUM(CAST(c AS HUGEINT) * cnt) AS DOUBLE)
      |      / CAST(SUM(cnt) AS DOUBLE)) AS BIGINT) AS m
      |  FROM cen),
      |pw AS (
      |  SELECT n,
      |    SUM(CAST(c - m AS HUGEINT) * (c - m) * cnt) AS s2,
      |    SUM(CAST(c - m AS HUGEINT) * (c - m) * (c - m) * cnt) AS s3,
      |    SUM(CAST(c - m AS HUGEINT) * (c - m) * (c - m) * (c - m) * cnt)
      |      AS s4
      |  FROM cen, s1 GROUP BY n),
      |st AS (
      |  SELECT n,
      |    CAST(s2 AS DOUBLE) / n AS m2,
      |    (CAST(s3 AS DOUBLE) / n)
      |      / POWER(CAST(s2 AS DOUBLE) / n, 1.5) AS skew,
      |    (CAST(s4 AS DOUBLE) / n)
      |      / ((CAST(s2 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)) - 3.0
      |      AS exk,
      |    n < 2 OR s2 <= 0 AS bad
      |  FROM pw)
      |SELECT n AS n_orders,
      |  CASE WHEN bad THEN NULL ELSE ROUND(skew, 6) + 0 END AS skewness,
      |  CASE WHEN bad THEN NULL ELSE ROUND(exk, 6) + 0 END
      |    AS excess_kurtosis,
      |  CASE WHEN bad THEN NULL ELSE
      |    ROUND(CAST(n AS DOUBLE) / 6.0 * (skew * skew + exk * exk / 4.0),
      |      4) + 0 END AS jb_stat,
      |  CASE WHEN bad THEN NULL ELSE
      |    FLOOR(exp(-(CAST(n AS DOUBLE) / 6.0
      |      * (skew * skew + exk * exk / 4.0)) / 2.0) * 1e8 + 0.5) / 1e8
      |    END AS p
      |FROM st""".stripMargin

  /** L193 Mood's median test (Mood 1950, Brown & Mood 1951 [PK]):
    * classify every order as above / not-above the GRAND median price,
    * then χ² on the resulting 2×k priority table — the median-based
    * k-sample location test that, unlike q227's rank sums, is robust
    * to arbitrary tail shape (it only looks at the median split).
    * χ²₄ tail via the exact Wilson–Hilferty-free series: p = exp(−x/2)
    * ·(1 + x/2) for df = 4 (the even-df closed form).
    *
    * Parity: the grand median is the A10 exact-percentile contract
    * (Spark `percentile` == DuckDB `quantile_cont`); above-counts are
    * exact int64; χ² terms quantize to 1e-8 units before the integer
    * sum; p is one exp chain quantized 1e-8.
    *
    * Scale: one cent-census percentile (the q98/q132 exact-quantile
    * path), one broadcast of the 1-row median, one ≤5-group agg with
    * census-sized windows. Guards: a group with zero expectation (all
    * values tied at the median) nulls the statistic. */
  def q259MoodMedian(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("priority"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("c"))
    val med = o.agg(expr("percentile(c, 0.5)").as("med"))
    val g = o.crossJoin(broadcast(med))
      .groupBy("priority")
      .agg(count(lit(1)).as("n_i"),
        sum(when(col("c").cast("double") > col("med"), 1L).otherwise(0L))
          .as("a_i"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val tbl = g.withColumn("nt", sum(col("n_i")).over(wAll))
      .withColumn("at", sum(col("a_i")).over(wAll))
    val ea = col("n_i").cast("double") * col("at") / col("nt")
    val eb = col("n_i").cast("double") * (col("nt") - col("at")) / col("nt")
    val termQ = when(ea <= 0 || eb <= 0, lit(null).cast("long"))
      .otherwise((floor(
        (col("a_i") - ea) * (col("a_i") - ea) / ea * 1e8 + 0.5) +
        floor((col("n_i") - col("a_i") - eb) *
          (col("n_i") - col("a_i") - eb) / eb * 1e8 + 0.5)).cast("long"))
    val t2 = tbl.withColumn("tq", termQ)
      .withColumn("chiq", sum(col("tq")).over(wAll))
      .withColumn("anybad",
        max(when(col("tq").isNull, 1L).otherwise(0L)).over(wAll))
    val chi = col("chiq").cast("double") / 1e8
    t2.select(col("priority"), col("n_i"), col("a_i").as("n_above"),
        (round(col("a_i").cast("double") / col("n_i"), 4) + 0.0)
          .as("share_above"),
        when(col("anybad") === 1, lit(null).cast("double"))
          .otherwise(round(chi, 4) + 0.0).as("chi2"),
        when(col("anybad") === 1, lit(null).cast("double"))
          .otherwise(floor(exp(-chi / 2.0) * (lit(1.0) + chi / 2.0) * 1e8
            + 0.5) / 1e8).as("p"))
      .orderBy("priority")
  }

  val q259MoodMedianSql: String =
    """WITH o AS (
      |  SELECT o_orderpriority AS priority,
      |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
      |  FROM orders),
      |med AS (SELECT quantile_cont(c, 0.5) AS med FROM o),
      |g AS (
      |  SELECT priority, COUNT(*) AS n_i,
      |    CAST(SUM(CASE WHEN CAST(c AS DOUBLE) > (SELECT med FROM med)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS a_i
      |  FROM o GROUP BY priority),
      |tbl AS (
      |  SELECT *, CAST(SUM(n_i) OVER () AS BIGINT) AS nt,
      |    CAST(SUM(a_i) OVER () AS BIGINT) AS at
      |  FROM g),
      |q AS (
      |  SELECT *,
      |    CASE WHEN CAST(n_i AS DOUBLE) * at / nt <= 0
      |           OR CAST(n_i AS DOUBLE) * (nt - at) / nt <= 0 THEN NULL
      |    ELSE CAST(
      |      FLOOR((a_i - CAST(n_i AS DOUBLE) * at / nt)
      |          * (a_i - CAST(n_i AS DOUBLE) * at / nt)
      |          / (CAST(n_i AS DOUBLE) * at / nt) * 1e8 + 0.5)
      |      + FLOOR((n_i - a_i - CAST(n_i AS DOUBLE) * (nt - at) / nt)
      |          * (n_i - a_i - CAST(n_i AS DOUBLE) * (nt - at) / nt)
      |          / (CAST(n_i AS DOUBLE) * (nt - at) / nt) * 1e8 + 0.5)
      |      AS BIGINT) END AS tq
      |  FROM tbl),
      |w AS (
      |  SELECT *, CAST(SUM(tq) OVER () AS BIGINT) AS chiq,
      |    MAX(CASE WHEN tq IS NULL THEN 1 ELSE 0 END) OVER () AS anybad
      |  FROM q)
      |SELECT priority, n_i, a_i AS n_above,
      |  ROUND(CAST(a_i AS DOUBLE) / n_i, 4) + 0 AS share_above,
      |  CASE WHEN anybad = 1 THEN NULL
      |    ELSE ROUND(CAST(chiq AS DOUBLE) / 1e8, 4) + 0 END AS chi2,
      |  CASE WHEN anybad = 1 THEN NULL
      |    ELSE FLOOR(exp(-(CAST(chiq AS DOUBLE) / 1e8) / 2.0)
      |      * (1.0 + (CAST(chiq AS DOUBLE) / 1e8) / 2.0) * 1e8 + 0.5) / 1e8
      |    END AS p
      |FROM w ORDER BY priority""".stripMargin

  /** L199 Wilcoxon signed-rank test (Wilcoxon 1945 [PK]) on paired
    * customer spend: each customer active in BOTH halves of the corpus
    * (orders before and after 1998-01-01) contributes one integer
    * difference d = round(late mean cents) − round(early mean cents);
    * zero differences drop (the standard convention), |d| gets average
    * ranks, W⁺ = Σ ranks of positive d, z with the tie-corrected
    * variance. The PAIRED location test the q210/q231 two-sample tests
    * cannot replace — the customer is their own control, so
    * between-customer spread cancels.
    *
    * Parity: the q210/q250 doubled-rank census discipline — |d| census
    * + one [[PrefixSum]], doubled average ranks exact int64,
    * 2W⁺ and the ×12-scaled variance numerator exact DECIMAL/HUGEINT;
    * z one double chain; p the shared A-S kernel at 1e-8.
    *
    * Scale: per-customer agg → |d| census (≤ distinct |d| rows) →
    * PrefixSum → 1-row algebra. Guards: no nonzero pairs, or an
    * all-tied |d| census (variance numerator ≤ 0), → null. */
  def q260WilcoxonSignedRank(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"),
        (col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
          .as("late"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("c"))
    val peru = o.groupBy("o_custkey")
      .agg(sum(when(!col("late"), col("c"))).as("se"),
        count(when(!col("late"), 1)).as("ne"),
        sum(when(col("late"), col("c"))).as("sl"),
        count(when(col("late"), 1)).as("nl"))
      .filter(col("ne") > 0 && col("nl") > 0)
      .select((floor(col("sl").cast("double") / col("nl") + 0.5) -
        floor(col("se").cast("double") / col("ne") + 0.5))
        .cast("long").as("d"))
      .filter(col("d") =!= 0)
    val cen = peru.groupBy(abs(col("d")).as("ad"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("d") > 0, 1L).otherwise(0L)).as("pos"))
    val cum = graft.ops.PrefixSum.withPrefixSums(cen,
      Seq(col("ad")), Seq((col("cnt"), "cum")))
    val g = cum.agg(sum(col("cnt")).as("n"),
      sum(col("pos").cast(dec) *
        (col("cum") * 2 - col("cnt") + 1).cast(dec)).as("w2"),
      sum(col("cnt").cast(dec) * col("cnt").cast(dec) *
        col("cnt").cast(dec) - col("cnt").cast(dec)).as("ties"))
    val nD = col("n").cast("double")
    val num2 = col("w2").cast("double") - nD * (nD + 1.0) / 2.0
    val var4x12 = nD * (nD + 1.0) * (nD * 2.0 + 1.0) * 2.0 -
      col("ties").cast("double")
    val z = num2 / sqrt(var4x12 / 12.0)
    val bad = col("n") < 2 || var4x12 <= 0.0
    g.select(col("n").as("n_pairs"),
      (col("w2").cast("double") / 2.0).as("w_plus"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(z, 4) + 0.0).as("z"),
      when(bad, lit(null).cast("double"))
        .otherwise(floor(StatFns.asTwoSidedP(z) * 1e8 + 0.5) / 1e8).as("p"))
  }

  val q260WilcoxonSignedRankSql: String = {
    val num2 = "(CAST(w2 AS DOUBLE) - CAST(n AS DOUBLE) * (n + 1.0) / 2.0)"
    val v12 = "(CAST(n AS DOUBLE) * (n + 1.0) * (2.0 * n + 1.0) * 2.0" +
      " - CAST(ties AS DOUBLE))"
    val z = s"($num2 / SQRT($v12 / 12.0))"
    s"""WITH o AS (
       |  SELECT o_custkey,
       |    o_orderdate >= TIMESTAMP '1998-01-01' AS late,
       |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
       |  FROM orders),
       |peru AS (
       |  SELECT
       |    CAST(FLOOR(CAST(SUM(CASE WHEN late THEN c END) AS DOUBLE)
       |        / COUNT(CASE WHEN late THEN 1 END) + 0.5)
       |      - FLOOR(CAST(SUM(CASE WHEN NOT late THEN c END) AS DOUBLE)
       |        / COUNT(CASE WHEN NOT late THEN 1 END) + 0.5) AS BIGINT)
       |      AS d
       |  FROM o GROUP BY o_custkey
       |  HAVING COUNT(CASE WHEN late THEN 1 END) > 0
       |     AND COUNT(CASE WHEN NOT late THEN 1 END) > 0),
       |nz AS (SELECT d FROM peru WHERE d <> 0),
       |cen AS (
       |  SELECT ABS(d) AS ad, COUNT(*) AS cnt,
       |    CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pos
       |  FROM nz GROUP BY ABS(d)),
       |cum AS (
       |  SELECT *, CAST(SUM(cnt) OVER (ORDER BY ad
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM cen),
       |g AS (
       |  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
       |    SUM(CAST(pos AS HUGEINT) * (cum * 2 - cnt + 1)) AS w2,
       |    SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS ties
       |  FROM cum)
       |SELECT n AS n_pairs,
       |  CAST(w2 AS DOUBLE) / 2.0 AS w_plus,
       |  CASE WHEN n < 2 OR $v12 <= 0.0 THEN NULL
       |    ELSE ROUND($z, 4) + 0 END AS z,
       |  CASE WHEN n < 2 OR $v12 <= 0.0 THEN NULL
       |    ELSE FLOOR(${asTwoSidedPSql(z)} * 1e8 + 0.5) / 1e8 END AS p
       |FROM g""".stripMargin
  }
}
