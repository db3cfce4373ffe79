package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Location / scale / rank group-comparison tests, split out of
  * HypothesisTestQueries in round 15 (the file was at 1,918 lines —
  * the same review-locality seam as the round-14 SeriesStats split).
  * Family: two-sample and k-sample location tests (parametric and
  * rank-based), dispersion tests, paired/blocked designs, ordered
  * alternatives, and their effect sizes. The contingency-table,
  * goodness-of-fit, and multiple-testing members stay in
  * HypothesisTestQueries. Every member keeps its original discipline:
  * a DuckDB mirror from the same census algebra, a StatBruteSpec
  * sequential reference, and a NonDegeneracySpec invariant; all
  * collapse fact data map-side to value/group censuses before any
  * window or join, so nothing scans more than once or sorts
  * fact-sized data on one partition.
  */
object LocationTests {
  private def asTwoSidedP(z: Column): Column = StatFns.asTwoSidedP(z)

  private def asTwoSidedPSql(z: String): String = StatFns.asTwoSidedPSql(z)

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

  /** L279 Bartlett's test of variance homogeneity ([PK] Bartlett
    * 1937), per market segment on whole-dollar order values — the
    * CLASSICAL normal-theory companion to q232's robust
    * Brown–Forsythe on the same grouping: Bartlett is the most
    * powerful under normality but inflates under heavy tails, so the
    * PAIR is the diagnostic (both fire ⇒ real variance differences;
    * Bartlett alone ⇒ suspect non-normality).
    * χ² = [(N−K)·ln s²_p − Σ(n_k−1)·ln s²_k] / C,
    * C = 1 + (Σ1/(n_k−1) − 1/(N−K)) / (3(K−1)).
    *
    * Parity: every ln leg takes an argument both engines hold
    * IDENTICALLY — (n_k−1)s²_k reduces to A_k = n_kΣv²−(Σv)² over
    * B_k = n_k(n_k−1) (exact DECIMAL/int64; ln A − ln B, each leg
    * nano-quantized), and the pooled numerator is the exact FLOOR-DIV
    * Σ(A_k div n_k) (HUGEINT // in the mirror — a float division
    * there would be lossy at 1e18). C is one double chain from exact
    * ints; χ² 4dp.
    *
    * Scale: one broadcast-dim join + ONE map-side (segment) moment
    * census (5 rows); everything after is census arithmetic. */
  def q345Bartlett(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val o = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") + 0.5).cast(dec).as("v"))
    val g = o.groupBy("seg")
      .agg(count(lit(1)).as("nk"), sum(col("v")).as("sv"),
        sum(col("v") * col("v")).as("qv"))
      .withColumn("ak", col("nk") * col("qv") - col("sv") * col("sv"))
      .withColumn("bk", col("nk") * (col("nk") - 1L))
      .withColumn("ek", (col("ak") - pmod(col("ak"),
        col("nk").cast(dec))) / col("nk").cast(dec))
    def ln9(c: Column) =
      floor(log(c.cast("double")) * 1e9 + 0.5).cast("long")
    val lnk9 = ln9(col("ak")) - ln9(col("bk"))
    val m = g.select(col("nk"), col("ek"),
        ((col("nk") - 1L) * lnk9).as("termk"),
        (lit(1.0) / (col("nk") - 1L).cast("double")).as("invk"))
      .agg(sum(col("nk")).as("n"), count(lit(1)).as("k"),
        sum(col("ek")).as("se"), sum(col("termk")).as("sterm"),
        sum(col("invk")).as("sinv"))
    def f(c: String) = col(c).cast("double")
    val nmk = col("n") - col("k")
    val lnp9 = ln9(col("se")) - ln9(nmk)
    val mStat = (nmk.cast("double") * lnp9.cast("double") -
      f("sterm")) / 1e9
    val cFac = lit(1.0) + (f("sinv") - lit(1.0) / nmk.cast("double")) /
      (lit(3.0) * (f("k") - 1.0))
    val chi2 = mStat / cFac
    val bad = col("k") < 2L || col("n") <= col("k")
    m.select(col("n").cast("long").as("n_total"),
      col("k").cast("long").as("k_groups"),
      when(bad, lit(null).cast("double"))
        .otherwise((floor(chi2 * 1e4 + 0.5).cast("long")
          .cast("double") / 1e4) + 0.0).as("bartlett_chi2"),
      (col("k") - 1L).cast("long").as("df"),
      when(bad, lit(null).cast("double"))
        .otherwise((floor(cFac * 1e6 + 0.5).cast("long")
          .cast("double") / 1e6) + 0.0).as("c_factor"),
      when(bad || col("k") =!= 5L, lit(null).cast("long"))
        .otherwise((chi2 > 9.4877).cast("long")).as("reject_5pct"))
  }

  val q345BartlettSql: String =
    """WITH o AS (
      |  SELECT c.c_mktsegment AS seg,
      |    CAST(FLOOR(o_totalprice + 0.5) AS HUGEINT) AS v
      |  FROM orders JOIN customer c ON o_custkey = c.c_custkey),
      |g AS (
      |  SELECT seg, COUNT(*) AS nk,
      |    CAST(SUM(v) AS HUGEINT) AS sv,
      |    CAST(SUM(v * v) AS HUGEINT) AS qv
      |  FROM o GROUP BY seg),
      |a AS (
      |  SELECT nk, nk * qv - sv * sv AS ak,
      |    CAST(nk AS HUGEINT) * (nk - 1) AS bk
      |  FROM g),
      |t AS (
      |  SELECT nk, ak // nk AS ek,
      |    (nk - 1) * (CAST(FLOOR(LN(CAST(ak AS DOUBLE)) * 1e9 + 0.5)
      |        AS BIGINT)
      |      - CAST(FLOOR(LN(CAST(bk AS DOUBLE)) * 1e9 + 0.5)
      |        AS BIGINT)) AS termk,
      |    1.0 / (CAST(nk AS DOUBLE) - 1.0) AS invk
      |  FROM a),
      |m AS (
      |  SELECT CAST(SUM(nk) AS BIGINT) AS n, COUNT(*) AS k,
      |    CAST(SUM(ek) AS HUGEINT) AS se,
      |    CAST(SUM(termk) AS BIGINT) AS sterm,
      |    SUM(invk) AS sinv
      |  FROM t),
      |fin AS (
      |  SELECT *,
      |    ((CAST(n - k AS DOUBLE))
      |        * CAST(CAST(FLOOR(LN(CAST(se AS DOUBLE)) * 1e9 + 0.5)
      |            AS BIGINT)
      |          - CAST(FLOOR(LN(CAST(n - k AS DOUBLE)) * 1e9 + 0.5)
      |            AS BIGINT) AS DOUBLE)
      |      - CAST(sterm AS DOUBLE)) / 1e9 AS mstat,
      |    1.0 + (sinv - 1.0 / CAST(n - k AS DOUBLE))
      |      / (3.0 * (CAST(k AS DOUBLE) - 1.0)) AS cfac
      |  FROM m)
      |SELECT n AS n_total, CAST(k AS BIGINT) AS k_groups,
      |  CASE WHEN k < 2 OR n <= k THEN NULL
      |    ELSE FLOOR(mstat / cfac * 1e4 + 0.5) / 1e4 + 0 END
      |    AS bartlett_chi2,
      |  CAST(k - 1 AS BIGINT) AS df,
      |  CASE WHEN k < 2 OR n <= k THEN NULL
      |    ELSE FLOOR(cfac * 1e6 + 0.5) / 1e6 + 0 END AS c_factor,
      |  CASE WHEN k < 2 OR n <= k OR k <> 5 THEN NULL
      |    ELSE CAST(CASE WHEN mstat / cfac > 9.4877 THEN 1 ELSE 0 END
      |      AS BIGINT) END AS reject_5pct
      |FROM fin""".stripMargin

  /** L296 TOST equivalence test ([PK] Schuirmann 1987 — two one-sided
    * tests): the INVERTED inferential question every ship/no-ship
    * review actually asks — not "are the segments different?" (q231)
    * but "can we PROVE they are the same to within ±δ?". Absence of
    * significance is not equivalence; TOST earns it: reject
    * mean-diff ≤ −δ AND mean-diff ≥ +δ, each at α = 0.05. Here:
    * BUILDING vs FURNITURE mean order value, δ = 5 % of the pooled
    * mean, Welch SE/df (the q231 machinery), decision at the z
    * critical 1.645 — documented large-df form (df runs in the
    * thousands at oracle SFs; t₀.₀₅ differs from z in the third
    * decimal there, and the published t-statistics let any reader
    * re-decide under exact-t).
    *
    * Parity: the q231 exact-moment scheme (HUGEINT/DECIMAL sums, one
    * double chain); outputs floor-quantized (NOT round(): means are
    * s/n rationals and n can be 2·5-smooth); the flag compares the
    * already-quantized t values, so both engines decide on identical
    * doubles.
    *
    * Scale: one broadcast dim join + a 2-group moment agg — the q231
    * plan exactly. */
  def q361Tost(s: SparkSession, dir: String): DataFrame = {
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
    val diff = ma - mb
    val se = sqrt(sea + seb)
    val df = (sea + seb) * (sea + seb) /
      (sea * sea / (col("n_a") - lit(1.0)) +
        seb * seb / (col("n_b") - lit(1.0)))
    val margin = (col("s_a") + col("s_b")).cast("double") /
      (col("n_a") + col("n_b")) * 0.05
    def fq6(c: org.apache.spark.sql.Column) =
      (floor(c * 1e6 + 0.5) / 1e6) + 0.0
    val tLo = fq6((diff + margin) / se)
    val tHi = fq6((margin - diff) / se)
    piv.select(col("n_a"), col("n_b"),
      fq6(ma).as("mean_a"), fq6(mb).as("mean_b"),
      fq6(diff).as("diff"), fq6(se).as("se"),
      (floor(df * 1e4 + 0.5) / 1e4 + 0.0).as("df"),
      fq6(margin).as("margin"),
      tLo.as("t_lower"), tHi.as("t_upper"),
      when(tLo > 1.645 && tHi > 1.645, 1L).otherwise(0L)
        .as("equivalent"))
  }

  val q361TostSql: String =
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
      |d AS (
      |  SELECT n_a, n_b,
      |    CAST(s_a AS DOUBLE) / n_a AS ma,
      |    CAST(s_b AS DOUBLE) / n_b AS mb,
      |    (CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
      |      / n_a) / (n_a - 1.0) / n_a AS sea,
      |    (CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)
      |      / n_b) / (n_b - 1.0) / n_b AS seb,
      |    CAST(s_a + s_b AS DOUBLE) / (n_a + n_b) * 0.05 AS margin
      |  FROM piv),
      |z AS (
      |  SELECT n_a, n_b, ma, mb, margin,
      |    ma - mb AS diff, SQRT(sea + seb) AS se,
      |    (sea + seb) * (sea + seb)
      |      / (sea * sea / (n_a - 1.0) + seb * seb / (n_b - 1.0)) AS df,
      |    FLOOR(((ma - mb) + margin) / SQRT(sea + seb) * 1e6 + 0.5)
      |      / 1e6 + 0 AS t_lower,
      |    FLOOR((margin - (ma - mb)) / SQRT(sea + seb) * 1e6 + 0.5)
      |      / 1e6 + 0 AS t_upper
      |  FROM d)
      |SELECT n_a, n_b,
      |  FLOOR(ma * 1e6 + 0.5) / 1e6 + 0 AS mean_a,
      |  FLOOR(mb * 1e6 + 0.5) / 1e6 + 0 AS mean_b,
      |  FLOOR(diff * 1e6 + 0.5) / 1e6 + 0 AS diff,
      |  FLOOR(se * 1e6 + 0.5) / 1e6 + 0 AS se,
      |  FLOOR(df * 1e4 + 0.5) / 1e4 + 0 AS df,
      |  FLOOR(margin * 1e6 + 0.5) / 1e6 + 0 AS margin,
      |  t_lower, t_upper,
      |  CAST(CASE WHEN t_lower > 1.645 AND t_upper > 1.645
      |    THEN 1 ELSE 0 END AS BIGINT) AS equivalent
      |FROM z""".stripMargin

  /** L302 Brunner–Munzel test ([PK] Brunner & Munzel 2000) — the
    * heteroscedasticity-robust upgrade of q210's Mann–Whitney on the
    * generalized Behrens–Fisher problem: estimates the stochastic-
    * superiority probability p̂ = P(X < Y) + ½P(X = Y) and tests
    * p = ½ WITHOUT assuming equal variances or equal shapes, via
    * pooled-vs-within midrank variances and a Welch–Satterthwaite df.
    * Two pairs in one query — its own power demonstration (the q364
    * convention): 'priority' (URGENT vs LOW order totals — the q210
    * null pair, |W| ≈ 2) and 'discount' (gross l_extendedprice vs
    * net post-discount revenue — pointwise dominance, so the test
    * must fire: W ≈ −4.9 at sf0.001, −15.4 at sf0.01).
    *
    * Parity: midranks enter as EXACT scaled integers m2 = 2·minrank +
    * ties − 1 (the established midrank-×2 trick); the variance
    * pieces expand to Σw² = n²Σu² − 2n(p−q)Σu + n(p−q)² over exact
    * DECIMAL(38) sums (u = m2_pooled − m2_within, p = Σm2_pooled,
    * q = n(n+1) — the q298 moment discipline, no residual pass);
    * p̂/W/df are one fixed double chain each, 6dp/4dp.
    *
    * Scale: the q210 shape — per-pair global rank windows over the
    * two samples (the honest construction for a rank test; at 100 TB
    * the same op runs per stratum or through RangedNtile machinery),
    * then ONE 4-moment agg per (pair, group); everything after the
    * rank pass is a ≤4-row census. */
  def q367BrunnerMunzel(s: SparkSession, dir: String): DataFrame = {
    val pri = Tables.orders(s, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(lit("priority").as("pair"),
        when(col("o_orderpriority") === "1-URGENT", lit("x"))
          .otherwise(lit("y")).as("grp"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("v"))
    val li = Tables.lineitem(s, dir)
    val disc = li.select(lit("discount").as("pair"), lit("x").as("grp"),
        floor(col("l_extendedprice") * 1000000 + 0.5).cast("long")
          .as("v"))
      .unionByName(li.select(lit("discount").as("pair"),
        lit("y").as("grp"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          1000000 + 0.5).cast("long").as("v")))
    val base = pri.unionByName(disc)
    val wp = Window.partitionBy("pair").orderBy("v")
    val wpv = Window.partitionBy("pair", "v")
    val wg = Window.partitionBy("pair", "grp").orderBy("v")
    val wgv = Window.partitionBy("pair", "grp", "v")
    val ranked = base
      .withColumn("m2c", lit(2L) * rank().over(wp) +
        count(lit(1)).over(wpv) - 1L)
      .withColumn("m2w", lit(2L) * rank().over(wg) +
        count(lit(1)).over(wgv) - 1L)
      .withColumn("u", col("m2c") - col("m2w"))
    val dec = "decimal(38,0)"
    val m = ranked.groupBy("pair", "grp").agg(
      count(lit(1)).as("n"),
      sum(col("m2c").cast(dec)).as("p"),
      sum(col("u").cast(dec)).as("su"),
      sum((col("u") * col("u")).cast(dec)).as("su2"))
    // Σw² with w = n·u − (p − n(n+1)): exact DECIMAL, one value/group
    val pq = col("p") - (col("n") * (col("n") + 1L)).cast(dec)
    val sw2 = (col("n") * col("n")).cast(dec) * col("su2") -
      lit(2L).cast(dec) * col("n").cast(dec) * pq * col("su") +
      col("n").cast(dec) * pq * pq
    val g = m.withColumn("sw2", sw2)
      .groupBy("pair").agg(
        max(when(col("grp") === "x", col("n"))).as("n1"),
        max(when(col("grp") === "y", col("n"))).as("n2"),
        max(when(col("grp") === "x", col("p"))).as("p1"),
        max(when(col("grp") === "y", col("p"))).as("p2"),
        max(when(col("grp") === "x", col("sw2"))).as("w1"),
        max(when(col("grp") === "y", col("sw2"))).as("w2"))
    def d(c: Column) = c.cast("double")
    val (n1, n2) = (d(col("n1")), d(col("n2")))
    // ANSI-safe divisors (the q370 hoisting note): clamp exact zeros;
    // identity whenever the `bad` guard isn't already nulling the row
    def safe(c: Column) = greatest(c, lit(1e-300))
    val rbar1 = d(col("p1")) / safe(n1 * 2.0)
    val rbar2 = d(col("p2")) / safe(n2 * 2.0)
    val s1 = d(col("w1")) / safe(lit(4.0) * n1 * n1 * (n1 - 1.0))
    val s2 = d(col("w2")) / safe(lit(4.0) * n2 * n2 * (n2 - 1.0))
    val vs1 = n1 * s1
    val vs2 = n2 * s2
    val wStat = n1 * n2 * (rbar2 - rbar1) /
      safe((n1 + n2) * sqrt(vs1 + vs2))
    val df = (vs1 + vs2) * (vs1 + vs2) /
      safe(vs1 * vs1 / safe(n1 - 1.0) + vs2 * vs2 / safe(n2 - 1.0))
    val pHat = (rbar2 - (n2 + 1.0) / 2.0) / safe(n1)
    // fuzz hardening (q251 convention): a missing or 1-element group,
    // or an all-tied pooled sample (zero rank variance), nulls the test
    val bad = col("n1").isNull || col("n2").isNull ||
      col("n1") < 2L || col("n2") < 2L || (vs1 + vs2) <= 0.0
    def guard(c: Column): Column =
      when(bad, lit(null).cast("double")).otherwise(c)
    def rnd6(c: Column): Column =
      guard((floor(c * 1e6 + 0.5).cast("long").cast("double") / 1e6)
        + 0.0)
    def rnd4(c: Column): Column =
      guard((floor(c * 1e4 + 0.5).cast("long").cast("double") / 1e4)
        + 0.0)
    def rnd2(c: Column): Column =
      guard((floor(c * 1e2 + 0.5).cast("long").cast("double") / 1e2)
        + 0.0)
    g.select(col("pair"), col("n1"), col("n2"),
        rnd6(pHat).as("p_hat"), rnd4(wStat).as("w_stat"),
        rnd2(df).as("df"),
        when(bad, lit(null).cast("long"))
          .otherwise((abs((floor(wStat * 1e4 + 0.5).cast("long")
            .cast("double") / 1e4) + 0.0) > 1.96).cast("long"))
          .as("reject_5pct"))
      .orderBy("pair")
  }

  val q367BrunnerMunzelSql: String =
    """WITH base AS (
      |  SELECT 'priority' AS pair,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 'x' ELSE 'y' END
      |      AS grp,
      |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
      |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      |  UNION ALL
      |  SELECT 'discount', 'x',
      |    CAST(FLOOR(l_extendedprice * 1000000 + 0.5) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'discount', 'y',
      |    CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000 + 0.5)
      |      AS BIGINT)
      |  FROM lineitem),
      |ranked AS (
      |  SELECT pair, grp,
      |    2 * RANK() OVER (PARTITION BY pair ORDER BY v)
      |      + COUNT(*) OVER (PARTITION BY pair, v) - 1 AS m2c,
      |    2 * RANK() OVER (PARTITION BY pair, grp ORDER BY v)
      |      + COUNT(*) OVER (PARTITION BY pair, grp, v) - 1 AS m2w
      |  FROM base),
      |m AS (
      |  SELECT pair, grp, COUNT(*) AS n,
      |    CAST(SUM(CAST(m2c AS HUGEINT)) AS HUGEINT) AS p,
      |    CAST(SUM(CAST(m2c - m2w AS HUGEINT)) AS HUGEINT) AS su,
      |    CAST(SUM(CAST((m2c - m2w) * (m2c - m2w) AS HUGEINT))
      |      AS HUGEINT) AS su2
      |  FROM ranked GROUP BY pair, grp),
      |w AS (
      |  SELECT pair, grp, n, p,
      |    CAST(n AS HUGEINT) * n * su2
      |      - 2 * CAST(n AS HUGEINT) * (p - CAST(n AS HUGEINT) * (n + 1))
      |        * su
      |      + CAST(n AS HUGEINT) * (p - CAST(n AS HUGEINT) * (n + 1))
      |        * (p - CAST(n AS HUGEINT) * (n + 1)) AS sw2
      |  FROM m),
      |g AS (
      |  SELECT pair,
      |    MAX(CASE WHEN grp = 'x' THEN n END) AS n1,
      |    MAX(CASE WHEN grp = 'y' THEN n END) AS n2,
      |    MAX(CASE WHEN grp = 'x' THEN p END) AS p1,
      |    MAX(CASE WHEN grp = 'y' THEN p END) AS p2,
      |    MAX(CASE WHEN grp = 'x' THEN sw2 END) AS w1,
      |    MAX(CASE WHEN grp = 'y' THEN sw2 END) AS w2
      |  FROM w GROUP BY pair),
      |f AS (
      |  SELECT pair, n1, n2,
      |    CAST(p1 AS DOUBLE) / (CAST(n1 AS DOUBLE) * 2.0) AS rbar1,
      |    CAST(p2 AS DOUBLE) / (CAST(n2 AS DOUBLE) * 2.0) AS rbar2,
      |    CAST(n1 AS DOUBLE) * (CAST(w1 AS DOUBLE)
      |      / (4.0 * CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
      |        * (CAST(n1 AS DOUBLE) - 1.0))) AS vs1,
      |    CAST(n2 AS DOUBLE) * (CAST(w2 AS DOUBLE)
      |      / (4.0 * CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE)
      |        * (CAST(n2 AS DOUBLE) - 1.0))) AS vs2
      |  FROM g),
      |z AS (
      |  SELECT pair, n1, n2,
      |    (n1 IS NULL OR n2 IS NULL OR n1 < 2 OR n2 < 2
      |      OR vs1 + vs2 <= 0.0) AS bad,
      |    (rbar2 - (CAST(n2 AS DOUBLE) + 1.0) / 2.0)
      |      / CAST(n1 AS DOUBLE) AS p_hat,
      |    CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * (rbar2 - rbar1)
      |      / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
      |        * sqrt(vs1 + vs2)) AS w_stat,
      |    (vs1 + vs2) * (vs1 + vs2)
      |      / (vs1 * vs1 / (CAST(n1 AS DOUBLE) - 1.0)
      |        + vs2 * vs2 / (CAST(n2 AS DOUBLE) - 1.0)) AS df
      |  FROM f)
      |SELECT pair, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  CASE WHEN bad THEN NULL
      |    ELSE FLOOR(p_hat * 1e6 + 0.5) / 1e6 + 0 END AS p_hat,
      |  CASE WHEN bad THEN NULL
      |    ELSE FLOOR(w_stat * 1e4 + 0.5) / 1e4 + 0 END AS w_stat,
      |  CASE WHEN bad THEN NULL
      |    ELSE FLOOR(df * 1e2 + 0.5) / 1e2 + 0 END AS df,
      |  CASE WHEN bad THEN NULL
      |    ELSE CAST(CASE WHEN ABS(FLOOR(w_stat * 1e4 + 0.5) / 1e4 + 0)
      |      > 1.96 THEN 1 ELSE 0 END AS BIGINT) END AS reject_5pct
      |FROM z ORDER BY pair""".stripMargin

  /** L306 Baumgartner–Weiß–Schindler two-sample test ([PK]
    * Baumgartner, Weiß & Schindler 1998): a rank test WEIGHTED BY THE
    * VARIANCE OF THE EMPIRICAL PROCESS, so unlike Mann–Whitney (q210)
    * and Brunner–Munzel (q367) it keeps full power at the TAILS —
    * B = ½(B_X + B_Y), B_X = (1/n)Σᵢ (Rᵢ − (m+n)i/n)² /
    * [(i/(n+1))(1−i/(n+1))·m(m+n)/n]. Same two pairs as q367 (the
    * power-demo convention): 'priority' sits under the b₀.₀₅ = 2.493
    * large-sample critical value (measured 2.10/2.48); 'discount'
    * fires decisively (25.7 at sf0.001, 250 at sf0.01).
    *
    * Parity: each term is an exact integer RATIO — numerator
    * A²(n+1)² with A = nRᵢ − (m+n)i, denominator n·i·(n+1−i)·m·(m+n),
    * both DECIMAL(38)-exact — divided once in double and micro-
    * quantized (1e6) per term BEFORE the sum (the seed-122
    * convention: the cross-row accumulation is exact int64); pooled
    * and within positions come from a tie-robust (pair, grp, v)
    * census (cumulative counts + parallel k-th pairing inside tied
    * runs — identical to per-row ranks on tie-free data and
    * engine-deterministic on ties); B is one
    * double chain from the two integer sums, 4dp.
    *
    * Scale: the q367 shape — per-pair rank windows, then one keyed
    * agg; everything after the rank pass is a 4-row census. */
  def q371Bws(s: SparkSession, dir: String): DataFrame = {
    val pri = Tables.orders(s, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(lit("priority").as("pair"),
        when(col("o_orderpriority") === "1-URGENT", lit("x"))
          .otherwise(lit("y")).as("grp"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("v"))
    val li = Tables.lineitem(s, dir)
    val disc = li.select(lit("discount").as("pair"), lit("x").as("grp"),
        floor(col("l_extendedprice") * 1000000 + 0.5).cast("long")
          .as("v"))
      .unionByName(li.select(lit("discount").as("pair"),
        lit("y").as("grp"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          1000000 + 0.5).cast("long").as("v")))
    val base = pri.unionByName(disc)
    // tie-robust census construction (fuzz seed 133: per-row tiebreak
    // keys can collide on adversarial data, making row_number pairing
    // engine-dependent): collapse to a (pair, grp, v) census, place
    // each tied run by cumulative counts (within: v order; pooled:
    // (v, grp) order, x before y), and pair the k-th within-position
    // with the k-th pooled rank — on tie-free data this is EXACTLY
    // the per-row construction, and on ties it is deterministic
    val census = base.groupBy("pair", "grp", "v")
      .agg(count(lit(1)).as("cv"))
    val wInC = Window.partitionBy("pair", "grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wPoolC = Window.partitionBy("pair").orderBy("v", "grp")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wGrp = Window.partitionBy("pair", "grp")
    val wPair = Window.partitionBy("pair")
    val dec = "decimal(38,0)"
    val ranked = census
      .withColumn("i0", coalesce(sum(col("cv")).over(wInC), lit(0L)) + 1L)
      .withColumn("r0", coalesce(sum(col("cv")).over(wPoolC), lit(0L)) + 1L)
      .withColumn("n", sum(col("cv")).over(wGrp))
      .withColumn("m", sum(col("cv")).over(wPair) - col("n"))
      .withColumn("k", explode(sequence(lit(0L), col("cv") - 1L)))
      .withColumn("i", col("i0") + col("k"))
      .withColumn("r", col("r0") + col("k"))
    val a = col("n") * col("r") - (col("m") + col("n")) * col("i")
    val num = a.cast(dec) * a.cast(dec) *
      ((col("n") + 1L) * (col("n") + 1L)).cast(dec)
    val den = col("n").cast(dec) * col("i").cast(dec) *
      (col("n") + 1L - col("i")).cast(dec) * col("m").cast(dec) *
      (col("m") + col("n")).cast(dec)
    val micro = floor(num.cast("double") / den.cast("double") * 1e6 + 0.5)
      .cast("long")
    // fuzz hardening: a pair whose other group is EMPTY (m = 0) has no
    // two-sample question — drop its rows (the den factor m would be
    // an exact-zero ANSI divisor); the group pivot then yields nulls
    val g = ranked.filter(col("m") > 0L).withColumn("micro", micro)
      .groupBy("pair", "grp")
      .agg(max(col("n")).as("n"), sum(col("micro")).as("s"))
      .groupBy("pair")
      .agg(max(when(col("grp") === "x", col("n"))).as("n1"),
        max(when(col("grp") === "y", col("n"))).as("n2"),
        max(when(col("grp") === "x", col("s"))).as("s1"),
        max(when(col("grp") === "y", col("s"))).as("s2"))
    def d(c: String) = col(c).cast("double")
    val b = (d("s1") / 1e6 / d("n1") + d("s2") / 1e6 / d("n2")) / 2.0
    def rnd4(c: Column): Column =
      (floor(c * 1e4 + 0.5).cast("long").cast("double") / 1e4) + 0.0
    g.select(col("pair"), col("n1"), col("n2"), rnd4(b).as("b_stat"),
        (rnd4(b) > 2.493).cast("long").as("reject_5pct"))
      .orderBy("pair")
  }

  val q371BwsSql: String =
    """WITH base AS (
      |  SELECT 'priority' AS pair,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 'x' ELSE 'y' END
      |      AS grp,
      |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
      |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      |  UNION ALL
      |  SELECT 'discount', 'x',
      |    CAST(FLOOR(l_extendedprice * 1000000 + 0.5) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'discount', 'y',
      |    CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000 + 0.5)
      |      AS BIGINT)
      |  FROM lineitem),
      |census AS (
      |  SELECT pair, grp, v, COUNT(*) AS cv
      |  FROM base GROUP BY pair, grp, v),
      |pos AS (
      |  SELECT pair, grp, v, cv,
      |    CAST(COALESCE(SUM(cv) OVER (PARTITION BY pair, grp ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) + 1 AS i0,
      |    CAST(COALESCE(SUM(cv) OVER (PARTITION BY pair ORDER BY v, grp
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) + 1 AS r0,
      |    CAST(SUM(cv) OVER (PARTITION BY pair, grp) AS BIGINT) AS n,
      |    CAST(SUM(cv) OVER (PARTITION BY pair) AS BIGINT)
      |      - CAST(SUM(cv) OVER (PARTITION BY pair, grp) AS BIGINT)
      |      AS m
      |  FROM census),
      |ranked AS (
      |  SELECT pair, grp, n, m,
      |    i0 + k AS i, r0 + k AS r
      |  FROM pos, unnest(generate_series(0, cv - 1)) tk(k)),
      |t AS (
      |  SELECT pair, grp, n,
      |    CAST(FLOOR(
      |      CAST(CAST(n * r - (m + n) * i AS HUGEINT)
      |          * CAST(n * r - (m + n) * i AS HUGEINT)
      |          * CAST((n + 1) * (n + 1) AS HUGEINT) AS DOUBLE)
      |      / CAST(CAST(n AS HUGEINT) * i * (n + 1 - i) * m * (m + n)
      |          AS DOUBLE)
      |      * 1e6 + 0.5) AS BIGINT) AS micro
      |  FROM ranked WHERE m > 0),
      |g AS (
      |  SELECT pair, grp, MAX(n) AS n, CAST(SUM(micro) AS BIGINT) AS s
      |  FROM t GROUP BY pair, grp),
      |p AS (
      |  SELECT pair,
      |    MAX(CASE WHEN grp = 'x' THEN n END) AS n1,
      |    MAX(CASE WHEN grp = 'y' THEN n END) AS n2,
      |    MAX(CASE WHEN grp = 'x' THEN s END) AS s1,
      |    MAX(CASE WHEN grp = 'y' THEN s END) AS s2
      |  FROM g GROUP BY pair)
      |SELECT pair, n1, n2,
      |  FLOOR((CAST(s1 AS DOUBLE) / 1e6 / n1
      |    + CAST(s2 AS DOUBLE) / 1e6 / n2) / 2.0 * 1e4 + 0.5) / 1e4 + 0
      |    AS b_stat,
      |  CAST(CASE WHEN FLOOR((CAST(s1 AS DOUBLE) / 1e6 / n1
      |      + CAST(s2 AS DOUBLE) / 1e6 / n2) / 2.0 * 1e4 + 0.5) / 1e4 + 0
      |      > 2.493 THEN 1 ELSE 0 END AS BIGINT) AS reject_5pct
      |FROM p ORDER BY pair""".stripMargin
}
