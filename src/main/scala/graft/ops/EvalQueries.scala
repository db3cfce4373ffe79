package graft.ops

import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evaluation & experiment tooling (round 13, batch 2): the agreement /
  * concordance finishers and the ratio-metric readout an A/B platform
  * needs on top of the q172/q231/q273 family.
  *
  * - q282 Krippendorff's α — the small-sample-corrected sibling of
  *   Fleiss' κ (q274) over the same three-rater quality ensemble.
  * - q285 Kendall's W — concordance of the 7 weekday "judges" ranking
  *   event types, the multi-judge generalization of Spearman (q177)
  *   and the effect-size companion of Friedman (q241).
  * - q287 delta-method ratio-metric CI — per-arm revenue-per-event
  *   with a linearization variance, the Deng et al. 2018-style [PK]
  *   answer to "a ratio of sums has no per-unit mean".
  */
object EvalQueries {

  private val dec = "decimal(38,0)"

  /** The q274/q281 three-screen rater table: one row per document with
    * 0/1 verdicts from the length / verbosity / stopword screens. */
  private def raters(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        when(col("n_chars") >= 100, 1L).otherwise(0L).as("r1"),
        when(size(tokens(col("text"))) >= 20, 1L).otherwise(0L).as("r2"),
        when(arrays_overlap(tokens(col("text")),
          typedlit(Seq("the", "a", "of", "and", "to", "in", "is", "on"))),
          1L).otherwise(0L).as("r3"))
      .withColumn("g", col("r1") + col("r2") + col("r3"))

  /** L215 Krippendorff's α, nominal, 3 raters ([PK] Krippendorff 1970):
    * the same ensemble-agreement question as Fleiss' κ (q274) under
    * the coincidence-matrix chance model — expected disagreement is
    * computed WITHOUT replacement over the N = 3n pairable values
    * (the (N−1) in D_e), which is why α ≠ κ on finite corpora and why
    * α is the convention content-analysis reports. Binary nominal:
    * per-doc observed disagreement Σ 2g(3−g) over n·m(m−1) pairs;
    * D_e = 2G(N−G)/(N(N−1)) with G total good votes.
    *
    * Parity: both D's are ratios of exact int64/DECIMAL sums; α is
    * computed from the EXACT rational cross-product (not the rounded
    * D's), one double division, 6dp.
    *
    * Scale: one map-side-combinable agg — no joins, no windows.
    * Guards: D_e = 0 (all 3n values identical) → null α. */
  def q282KrippAlpha(s: SparkSession, dir: String): DataFrame = {
    val a = raters(s, dir).agg(count(lit(1)).as("n_docs"),
      sum(col("g")).as("votes_good"),
      sum(col("g") * (lit(3L) - col("g")) * 2L).as("dis_pairs"))
    val n = col("n_docs")
    val nv = n * 3L // pairable values
    val g = col("votes_good")
    // α = 1 − (dis_pairs / (6n)) / (2G(N−G) / (N(N−1)))
    //   = 1 − dis_pairs·N·(N−1) / (6n · 2G(N−G)), exact cross-products
    val num = col("dis_pairs").cast(dec) * nv.cast(dec) * (nv - 1L).cast(dec)
    val den = lit(12L).cast(dec) * n.cast(dec) * g.cast(dec) *
      (nv - g).cast(dec)
    val degenerate = g === 0L || g === nv
    a.select(n.as("n_docs"), nv.as("n_values"), g.as("votes_good"),
      (round(col("dis_pairs").cast("double") / (n.cast("double") * 6.0), 6)
        + 0.0).as("d_o"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(round(lit(2.0) * g.cast("double") *
          (nv - g).cast("double") /
          (nv.cast("double") * (nv - 1L).cast("double")), 6) + 0.0)
        .as("d_e"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(round(lit(1.0) -
          num.cast("double") / den.cast("double"), 6) + 0.0)
        .as("kripp_alpha"))
  }

  val q282KrippAlphaSql: String =
    """WITH d AS (
      |  SELECT
      |    (CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END)
      |    + (CASE WHEN len(string_split(text, ' ')) >= 20 THEN 1 ELSE 0
      |       END)
      |    + (CASE WHEN len(list_intersect(string_split(text, ' '),
      |        ['the','a','of','and','to','in','is','on'])) > 0
      |       THEN 1 ELSE 0 END) AS g
      |  FROM documents),
      |a AS (
      |  SELECT COUNT(*) AS n_docs,
      |    CAST(SUM(g) AS BIGINT) AS votes_good,
      |    CAST(SUM(g * (3 - g) * 2) AS BIGINT) AS dis_pairs
      |  FROM d)
      |SELECT n_docs, 3 * n_docs AS n_values, votes_good,
      |  ROUND(CAST(dis_pairs AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 6.0),
      |    6) + 0 AS d_o,
      |  CASE WHEN votes_good = 0 OR votes_good = 3 * n_docs THEN NULL
      |    ELSE ROUND(2.0 * CAST(votes_good AS DOUBLE)
      |      * CAST(3 * n_docs - votes_good AS DOUBLE)
      |      / (CAST(3 * n_docs AS DOUBLE)
      |         * CAST(3 * n_docs - 1 AS DOUBLE)), 6) + 0 END AS d_e,
      |  CASE WHEN votes_good = 0 OR votes_good = 3 * n_docs THEN NULL
      |    ELSE ROUND(1.0
      |      - CAST(CAST(dis_pairs AS HUGEINT) * (3 * n_docs)
      |          * (3 * n_docs - 1) AS DOUBLE)
      |        / CAST(12 * CAST(n_docs AS HUGEINT) * votes_good
      |          * (3 * n_docs - votes_good) AS DOUBLE), 6) + 0 END
      |    AS kripp_alpha
      |FROM a""".stripMargin

  /** L218 Kendall's coefficient of concordance W ([PK] Kendall &
    * Babington Smith 1939), tie-corrected: do the 7 ISO weekdays
    * agree on how the event types rank by traffic? Each weekday
    * "judges" the event-type field by its event count that weekday;
    * W ∈ [0,1] measures concordance of the k = 7 rankings (W = 1:
    * weekday never changes the ordering — the type mix is stationary
    * across the week; W → 0: the mix reshuffles daily). The
    * effect-size companion of the Friedman test (q241) and the
    * k-judge generalization of Spearman's ρ (q177).
    *
    * Midranks ride the integer-exact doubled form 2·midrank =
    * 2·rank + ties − 1 (the q211/q251 convention); the tie correction
    * subtracts k·ΣT_j, T_j = Σ(t³−t) per weekday.
    *
    * Parity: every sum is exact int64 on a ≤(7×|event types|) census;
    * W is one double division of exact ints, 6dp.
    *
    * Scale: one corpus agg to the (weekday, type) census, then windows
    * over ≤ 7n rows. Guards: n < 2 objects or a fully-tied panel
    * (denominator 0) → null W.
    *
    * Panel completeness (r14, advisor fix): W assumes every judge
    * ranks the SAME n objects. An event type with zero events on some
    * weekday used to vanish from that judge's census, so judges ranked
    * different object sets while k_judges = max(k) masked the gap.
    * The observed (isodow, event_type) census is now densified to the
    * full distinct-days × distinct-types grid with zero-count cells
    * (a ≤7×|types| cross join — bounded by the type vocabulary, never
    * by corpus size), and a defensive min(k) ≠ max(k) null guards the
    * statistic should the invariant ever break again. */
  def q285KendallW(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(s, dir)
      .select((weekday(col("ts").cast("date")) + 1).as("isodow"),
        col("event_type"))
      .groupBy("isodow", "event_type").agg(count(lit(1)).as("cnt0"))
    val cell = raw.select("isodow").distinct()
      .crossJoin(broadcast(raw.select("event_type").distinct()))
      .join(raw, Seq("isodow", "event_type"), "left")
      .select(col("isodow"), col("event_type"),
        coalesce(col("cnt0"), lit(0L)).as("cnt"))
    // 2·midrank = 2·rank(cnt asc) + ties − 1 within each weekday judge
    val wj = Window.partitionBy("isodow").orderBy(col("cnt"))
    // lazy checkpoint: ranked feeds BOTH the per-object rank sums and
    // the tie census — without it the grid-densify cross join re-plans
    // per branch (BNLJ ×3, q316-census pattern)
    val ranked = cell
      .withColumn("r2",
        lit(2L) * rank().over(wj) +
          count(lit(1)).over(wj.rangeBetween(0, 0)) - 1L)
      .withColumn("ties", count(lit(1)).over(wj.rangeBetween(0, 0)))
      .localCheckpoint(eager = false)
    // per-object doubled rank sums R2_i = Σ_j 2·midrank_ij
    val perObj = ranked.groupBy("event_type")
      .agg(sum(col("r2")).as("r2sum"), count(lit(1)).as("k"))
    // tie correction: ΣT_j counts each size-t tie group t times via
    // the per-row (t²−1) form: Σ_rows (ties²−1) = Σ_groups t(t²−1)
    val tiesAgg = ranked.agg(
      sum(col("ties") * col("ties") - 1L).as("tt"))
    val objAgg = perObj.agg(count(lit(1)).as("n_objects"),
      max(col("k")).as("k_judges"),
      min(col("k")).as("k_min"),
      sum(col("r2sum") * col("r2sum")).as("sr2sq"),
      sum(col("r2sum")).as("sr2"))
    val n = col("n_objects")
    val k = col("k_judges")
    // 4·S = Σ(R2)² − (ΣR2)²/n → numerator of W uses 12·(n·Σ(R2)²−(ΣR2)²)
    // over n·4·(k²(n³−n) − kΣT)
    val wNum = lit(12L).cast(dec) *
      (n.cast(dec) * col("sr2sq").cast(dec) -
        col("sr2").cast(dec) * col("sr2").cast(dec))
    val wDen = lit(4L).cast(dec) * n.cast(dec) *
      (k.cast(dec) * k.cast(dec) * (n.cast(dec) * n.cast(dec) * n.cast(dec)
        - n.cast(dec)) - k.cast(dec) * col("tt").cast(dec))
    val wStat = wNum.cast("double") / wDen.cast("double")
    val undef = n < 2L || wDen.cast("double") <= 0.0 ||
      col("k_min") =!= k
    objAgg.crossJoin(broadcast(tiesAgg))
      .select(n.as("n_objects"), k.as("k_judges"), col("tt").as("tie_term"),
        when(undef, lit(null).cast("double"))
          .otherwise(round(wStat, 6) + 0.0).as("kendall_w"),
        when(undef, lit(null).cast("double"))
          .otherwise(round(k.cast("double") * (n.cast("double") - 1.0) *
            wStat, 4) + 0.0).as("friedman_chi2"))
  }

  val q285KendallWSql: String =
    """WITH raw AS (
      |  SELECT CAST(date_part('isodow', CAST(ts AS DATE)) AS BIGINT)
      |      AS isodow,
      |    event_type, COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |cell AS (
      |  SELECT d.isodow, t.event_type, COALESCE(r.cnt, 0) AS cnt
      |  FROM (SELECT DISTINCT isodow FROM raw) d
      |  CROSS JOIN (SELECT DISTINCT event_type FROM raw) t
      |  LEFT JOIN raw r
      |    ON r.isodow = d.isodow AND r.event_type = t.event_type),
      |ranked AS (
      |  SELECT event_type,
      |    2 * RANK() OVER (PARTITION BY isodow ORDER BY cnt)
      |      + COUNT(*) OVER (PARTITION BY isodow, cnt) - 1 AS r2,
      |    COUNT(*) OVER (PARTITION BY isodow, cnt) AS ties
      |  FROM cell),
      |perobj AS (
      |  SELECT event_type, CAST(SUM(r2) AS BIGINT) AS r2sum,
      |    COUNT(*) AS k
      |  FROM ranked GROUP BY event_type),
      |oa AS (
      |  SELECT COUNT(*) AS n, CAST(MAX(k) AS BIGINT) AS k,
      |    CAST(MIN(k) AS BIGINT) AS k_min,
      |    CAST(SUM(CAST(r2sum AS HUGEINT) * r2sum) AS HUGEINT) AS sr2sq,
      |    CAST(SUM(r2sum) AS BIGINT) AS sr2
      |  FROM perobj),
      |ta AS (
      |  SELECT CAST(SUM(CAST(ties AS HUGEINT) * ties - 1) AS BIGINT) AS tt
      |  FROM ranked),
      |f AS (
      |  SELECT n, k, k_min, tt,
      |    CAST(12 * (n * sr2sq - CAST(sr2 AS HUGEINT) * sr2) AS DOUBLE)
      |      AS wnum,
      |    CAST(4 * CAST(n AS HUGEINT)
      |      * (k * k * (CAST(n AS HUGEINT) * n * n - n) - k * tt)
      |      AS DOUBLE) AS wden
      |  FROM oa CROSS JOIN ta)
      |SELECT n AS n_objects, k AS k_judges, tt AS tie_term,
      |  CASE WHEN n < 2 OR wden <= 0 OR k_min <> k THEN NULL
      |    ELSE ROUND(wnum / wden, 6) + 0 END AS kendall_w,
      |  CASE WHEN n < 2 OR wden <= 0 OR k_min <> k THEN NULL
      |    ELSE ROUND(CAST(k AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
      |      * wnum / wden, 4) + 0 END AS friedman_chi2
      |FROM f""".stripMargin

  /** L220 delta-method ratio-metric CI ([PK] Cochran 1977 ratio
    * estimation; Deng, Knoblich & Lu 2018 for the A/B framing):
    * revenue-per-event per experiment arm. The metric is a ratio of
    * SUMS R = ΣY/ΣN (not a mean of per-user ratios), so its sampling
    * variance needs the linearization var(R̂) ≈ Σ(y_i − R n_i)² /
    * (n(n−1) n̄²) over per-USER totals (users are the randomization
    * unit — the q273 arm assignment, user_id parity). The per-arm
    * 95% CI is R ± 1.96·se.
    *
    * Parity: Σ(y−Rn)² expands algebraically to Σy² − 2RΣyn + R²Σn² —
    * the five moment sums are exact cents-int64/DECIMAL, so the
    * double chain (division, multiply, IEEE-exact sqrt) is
    * order-independent; outputs 6dp (4dp for the cents-scaled means).
    *
    * Scale: one per-user agg, one 2-row arm agg — no joins beyond the
    * final 2-row frame. Guards: arms with < 2 users or zero event
    * mass → null CI. */
  def q287RatioCi(s: SparkSession, dir: String): DataFrame = {
    val peru = Tables.events(s, dir).filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(coalesce(sum(floor(col("value") * 100.0 + 0.5).cast("long")),
        lit(0L)).as("y"),
        count(lit(1)).as("m"))
      .withColumn("arm", pmod(col("user_id"), lit(2L)))
    val a = peru.groupBy("arm").agg(count(lit(1)).as("n_users"),
      sum(col("y").cast(dec)).as("sy"), sum(col("m").cast(dec)).as("sm"),
      sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"),
      sum(col("y").cast(dec) * col("m").cast(dec)).as("sym"),
      sum(col("m").cast(dec) * col("m").cast(dec)).as("smm"))
    val nD = col("n_users").cast("double")
    val r = col("sy").cast("double") / col("sm").cast("double")
    val mbar = col("sm").cast("double") / nD
    val ssq = col("syy").cast("double") - lit(2.0) * r *
      col("sym").cast("double") + r * r * col("smm").cast("double")
    val varR = ssq / (nD * (nD - 1.0) * mbar * mbar)
    val se = sqrt(varR)
    val bad = col("n_users") < 2L || col("sm").cast("double") <= 0.0
    a.select(col("arm"), col("n_users"),
        col("sm").cast("long").as("n_events"),
        (round(r / 100.0, 6) + 0.0).as("rev_per_event"),
        when(bad, lit(null).cast("double"))
          .otherwise(round(se / 100.0, 6) + 0.0).as("se"),
        when(bad, lit(null).cast("double"))
          .otherwise(round((r - lit(1.96) * se) / 100.0, 6) + 0.0)
          .as("ci_lo"),
        when(bad, lit(null).cast("double"))
          .otherwise(round((r + lit(1.96) * se) / 100.0, 6) + 0.0)
          .as("ci_hi"))
      .orderBy("arm")
  }

  val q287RatioCiSql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    CAST(COALESCE(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)),
      |      0) AS BIGINT) AS y,
      |    COUNT(*) AS m,
      |    user_id % 2 AS arm
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      |a AS (
      |  SELECT arm, COUNT(*) AS n_users,
      |    CAST(SUM(y) AS HUGEINT) AS sy, CAST(SUM(m) AS HUGEINT) AS sm,
      |    CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
      |    CAST(SUM(CAST(y AS HUGEINT) * m) AS HUGEINT) AS sym,
      |    CAST(SUM(CAST(m AS HUGEINT) * m) AS HUGEINT) AS smm
      |  FROM u GROUP BY arm),
      |c AS (
      |  SELECT arm, n_users, sm,
      |    CAST(sy AS DOUBLE) / CAST(sm AS DOUBLE) AS r,
      |    (CAST(syy AS DOUBLE)
      |      - 2.0 * (CAST(sy AS DOUBLE) / CAST(sm AS DOUBLE))
      |        * CAST(sym AS DOUBLE)
      |      + (CAST(sy AS DOUBLE) / CAST(sm AS DOUBLE))
      |        * (CAST(sy AS DOUBLE) / CAST(sm AS DOUBLE))
      |        * CAST(smm AS DOUBLE))
      |    / (CAST(n_users AS DOUBLE) * (CAST(n_users AS DOUBLE) - 1.0)
      |       * (CAST(sm AS DOUBLE) / n_users)
      |       * (CAST(sm AS DOUBLE) / n_users)) AS varr
      |  FROM a)
      |SELECT arm, n_users, CAST(sm AS BIGINT) AS n_events,
      |  ROUND(r / 100.0, 6) + 0 AS rev_per_event,
      |  CASE WHEN n_users < 2 OR sm <= 0 THEN NULL
      |    ELSE ROUND(SQRT(varr) / 100.0, 6) + 0 END AS se,
      |  CASE WHEN n_users < 2 OR sm <= 0 THEN NULL
      |    ELSE ROUND((r - 1.96 * SQRT(varr)) / 100.0, 6) + 0 END AS ci_lo,
      |  CASE WHEN n_users < 2 OR sm <= 0 THEN NULL
      |    ELSE ROUND((r + 1.96 * SQRT(varr)) / 100.0, 6) + 0 END AS ci_hi
      |FROM c ORDER BY arm""".stripMargin

  /** L222 Ansari–Bradley scale test ([PK] Ansari & Bradley 1960): do
    * URGENT and LOW-priority orders differ in price DISPERSION (not
    * location)? Ranks are assigned from BOTH ends of the pooled sample
    * inward — a = min(rank, N+1−rank) — so small scores mean extreme
    * values; the rank-based member of the scale family next to the
    * moment-based Brown–Forsythe (L166). The z uses the
    * permutation-conditional moments GIVEN the observed (tie-adjusted)
    * scores — E = m·ā, Var = mn·Σ(a−ā)²/(N(N−1)) — which absorbs ties
    * without the separate even/odd-N textbook cases.
    *
    * Parity: the value census carries doubled midranks 2r = 2·cumBelow
    * + cnt + 1 (exact int64); doubled scores a2 = min(2r, 2(N+1)−2r);
    * AB, Σa2·cnt, Σa2²·cnt all exact int64/DECIMAL; z is one double
    * chain with IEEE-exact sqrt, 4dp. No p column (no closed-form
    * normal tail — the q172 z-only convention).
    *
    * Scale: one agg to the distinct-cents census, one window over it,
    * one 1-row reduce. Guards: zero score variance (all values tied)
    * → null z. */
  def q288AnsariBradley(s: SparkSession, dir: String): DataFrame = {
    val cell = Tables.orders(s, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(expr("cast(round(o_totalprice * 100) as bigint)").as("pc"),
        (col("o_orderpriority") === "1-URGENT").cast("long").as("g1"))
      .groupBy("pc")
      .agg(count(lit(1)).as("cnt"), sum(col("g1")).as("c1"))
    // distributed rank backbone (q210 shape) + the r13 max-of-cumulative
    // 1-row totals broadcast (q147 form) for the from-both-ends fold
    val cum = PrefixSum.withPrefixSums(cell, Seq(col("pc")),
      Seq((col("cnt"), "cumn")))
    val tot = cum.agg(max(col("cumn")).as("nn"))
    val ranked = cum.crossJoin(broadcast(tot))
      .withColumn("r2", lit(2L) * col("cumn") - col("cnt") + 1L)
      .withColumn("a2",
        least(col("r2"), lit(2L) * (col("nn") + 1L) - col("r2")))
    val dec = "decimal(38,0)"
    val a = ranked.agg(max(col("nn")).as("n"),
      sum(col("c1")).as("m"),
      sum(col("c1").cast(dec) * col("a2").cast(dec)).as("ab2"),
      sum(col("cnt").cast(dec) * col("a2").cast(dec)).as("s1"),
      sum(col("cnt").cast(dec) * col("a2").cast(dec) * col("a2").cast(dec))
        .as("s2"))
    val nD = col("n").cast("double")
    val mD = col("m").cast("double")
    val ss4 = col("s2").cast("double") -
      col("s1").cast("double") * (col("s1").cast("double") / nD)
    val varAb4 = mD * (nD - mD) * ss4 / (nD * (nD - 1.0))
    val z = (col("ab2").cast("double") - mD *
      (col("s1").cast("double") / nD)) / sqrt(varAb4)
    val bad = col("m") === 0L || col("m") === col("n") || ss4 <= 0.0
    a.select(col("m").cast("long").as("n_urgent"),
      (col("n") - col("m")).cast("long").as("n_low"),
      (col("ab2").cast("double") / 2.0).as("ab_stat"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(z, 4) + 0.0).as("z"))
  }

  val q288AnsariBradleySql: String =
    """WITH cell AS (
      |  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS pc,
      |    COUNT(*) AS cnt,
      |    CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
      |      END) AS BIGINT) AS c1
      |  FROM orders
      |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      |  GROUP BY pc),
      |r AS (
      |  SELECT pc, cnt, c1,
      |    SUM(cnt) OVER (ORDER BY pc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
      |      AS below,
      |    SUM(cnt) OVER () AS nn
      |  FROM cell),
      |sc AS (
      |  SELECT cnt, c1, nn,
      |    LEAST(2 * below + cnt + 1,
      |      2 * (nn + 1) - (2 * below + cnt + 1)) AS a2
      |  FROM r),
      |a AS (
      |  SELECT CAST(MAX(nn) AS BIGINT) AS n, CAST(SUM(c1) AS BIGINT) AS m,
      |    CAST(SUM(CAST(c1 AS HUGEINT) * a2) AS HUGEINT) AS ab2,
      |    CAST(SUM(CAST(cnt AS HUGEINT) * a2) AS HUGEINT) AS s1,
      |    CAST(SUM(CAST(cnt AS HUGEINT) * a2 * a2) AS HUGEINT) AS s2
      |  FROM sc),
      |c AS (
      |  SELECT n, m, ab2, s1,
      |    CAST(s2 AS DOUBLE)
      |      - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / n) AS ss4
      |  FROM a)
      |SELECT m AS n_urgent, n - m AS n_low,
      |  CAST(ab2 AS DOUBLE) / 2.0 AS ab_stat,
      |  CASE WHEN m = 0 OR m = n OR ss4 <= 0 THEN NULL
      |    ELSE ROUND((CAST(ab2 AS DOUBLE)
      |        - CAST(m AS DOUBLE) * (CAST(s1 AS DOUBLE) / n))
      |      / SQRT(CAST(m AS DOUBLE) * (n - m) * ss4
      |        / (CAST(n AS DOUBLE) * (n - 1.0))), 4) + 0 END AS z
      |FROM c""".stripMargin

  /** L225 Cucconi joint location-scale test ([PK] Cucconi 1968;
    * Marozzi 2009): do URGENT and LOW orders differ in price location
    * OR dispersion — one test, not a Bonferroni pair of
    * Mann–Whitney (L147) + Ansari–Bradley (L222)? U standardizes the
    * group-1 sum of SQUARED ranks, V the sum of squared CONTRARY
    * ranks (N+1−R); the quadratic form C = (U²+V²−2ρUV)/(2(1−ρ²))
    * has the remarkably simple asymptotic null tail P(C>c) = e^{−c}
    * — an exact closed form, no chi-square table.
    *
    * Parity: doubled midranks on the PrefixSum backbone (the q288
    * census); Σc₁·r2² and Σc₁·s2² exact DECIMAL; U, V, ρ, C one
    * deterministic double chain from exact ints (IEEE sqrt), 4dp;
    * p floor-quantized 1e-8.
    *
    * Scale: identical to q288 — census agg + 1-row N broadcast.
    * Guards: an empty group or N < 5 → null statistics. */
  def q289Cucconi(s: SparkSession, dir: String): DataFrame = {
    val cell = Tables.orders(s, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(expr("cast(round(o_totalprice * 100) as bigint)").as("pc"),
        (col("o_orderpriority") === "1-URGENT").cast("long").as("g1"))
      .groupBy("pc")
      .agg(count(lit(1)).as("cnt"), sum(col("g1")).as("c1"))
    val cum = PrefixSum.withPrefixSums(cell, Seq(col("pc")),
      Seq((col("cnt"), "cumn")))
    val tot = cum.agg(max(col("cumn")).as("nn"))
    val ranked = cum.crossJoin(broadcast(tot))
      .withColumn("r2", lit(2L) * col("cumn") - col("cnt") + 1L)
      .withColumn("s2", lit(2L) * (col("nn") + 1L) - col("r2"))
    val a = ranked.agg(max(col("nn")).as("n"), sum(col("c1")).as("m"),
      sum(col("c1").cast(dec) * col("r2").cast(dec) * col("r2").cast(dec))
        .as("sr2sq"),
      sum(col("c1").cast(dec) * col("s2").cast(dec) * col("s2").cast(dec))
        .as("ss2sq"))
    val nD = col("n").cast("double")
    val mD = col("m").cast("double")
    val n2D = nD - mD
    val mean = mD * (nD + 1.0) * (nD * 2.0 + 1.0)
    val sd = sqrt(mD * n2D * (nD + 1.0) * (nD * 2.0 + 1.0) *
      (nD * 8.0 + 11.0) / 5.0)
    // ΣR² = Σr2²/4 exactly; 6ΣR² = 1.5·Σr2²
    val u = (lit(1.5) * col("sr2sq").cast("double") - mean) / sd
    val v = (lit(1.5) * col("ss2sq").cast("double") - mean) / sd
    val rho = lit(2.0) * (nD * nD - 4.0) /
      ((nD * 2.0 + 1.0) * (nD * 8.0 + 11.0)) - 1.0
    val cStat = (u * u + v * v - lit(2.0) * rho * u * v) /
      (lit(2.0) * (lit(1.0) - rho * rho))
    val bad = col("m") === 0L || col("m") === col("n") || col("n") < 5L
    a.select(col("m").cast("long").as("n_urgent"),
      (col("n") - col("m")).cast("long").as("n_low"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(u, 4) + 0.0).as("u"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(v, 4) + 0.0).as("v"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(cStat, 4) + 0.0).as("c"),
      when(bad, lit(null).cast("double"))
        .otherwise(floor(exp(-cStat) * 1e8 + 0.5) / 1e8).as("p"))
  }

  val q289CucconiSql: String =
    """WITH cell AS (
      |  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS pc,
      |    COUNT(*) AS cnt,
      |    CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
      |      END) AS BIGINT) AS c1
      |  FROM orders
      |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      |  GROUP BY pc),
      |r AS (
      |  SELECT pc, cnt, c1,
      |    SUM(cnt) OVER (ORDER BY pc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumn,
      |    SUM(cnt) OVER () AS nn
      |  FROM cell),
      |sc AS (
      |  SELECT cnt, c1, nn,
      |    2 * cumn - cnt + 1 AS r2,
      |    2 * (nn + 1) - (2 * cumn - cnt + 1) AS s2
      |  FROM r),
      |a AS (
      |  SELECT CAST(MAX(nn) AS BIGINT) AS n, CAST(SUM(c1) AS BIGINT) AS m,
      |    CAST(SUM(CAST(c1 AS HUGEINT) * r2 * r2) AS HUGEINT) AS sr2sq,
      |    CAST(SUM(CAST(c1 AS HUGEINT) * s2 * s2) AS HUGEINT) AS ss2sq
      |  FROM sc),
      |c0 AS (
      |  SELECT n, m,
      |    (1.5 * CAST(sr2sq AS DOUBLE)
      |      - CAST(m AS DOUBLE) * (n + 1.0) * (2.0 * n + 1.0))
      |    / SQRT(CAST(m AS DOUBLE) * (n - CAST(m AS DOUBLE)) * (n + 1.0)
      |      * (2.0 * n + 1.0) * (8.0 * n + 11.0) / 5.0) AS u,
      |    (1.5 * CAST(ss2sq AS DOUBLE)
      |      - CAST(m AS DOUBLE) * (n + 1.0) * (2.0 * n + 1.0))
      |    / SQRT(CAST(m AS DOUBLE) * (n - CAST(m AS DOUBLE)) * (n + 1.0)
      |      * (2.0 * n + 1.0) * (8.0 * n + 11.0) / 5.0) AS v,
      |    2.0 * (CAST(n AS DOUBLE) * n - 4.0)
      |      / ((2.0 * n + 1.0) * (8.0 * n + 11.0)) - 1.0 AS rho
      |  FROM a),
      |c1x AS (
      |  SELECT n, m, u, v,
      |    (u * u + v * v - 2.0 * rho * u * v)
      |      / (2.0 * (1.0 - rho * rho)) AS c
      |  FROM c0)
      |SELECT m AS n_urgent, n - m AS n_low,
      |  CASE WHEN m = 0 OR m = n OR n < 5 THEN NULL
      |    ELSE ROUND(u, 4) + 0 END AS u,
      |  CASE WHEN m = 0 OR m = n OR n < 5 THEN NULL
      |    ELSE ROUND(v, 4) + 0 END AS v,
      |  CASE WHEN m = 0 OR m = n OR n < 5 THEN NULL
      |    ELSE ROUND(c, 4) + 0 END AS c,
      |  CASE WHEN m = 0 OR m = n OR n < 5 THEN NULL
      |    ELSE FLOOR(EXP(-c) * 1e8 + 0.5) / 1e8 END AS p
      |FROM c1x""".stripMargin

  /** L226 D'Agostino–Pearson K² omnibus normality test ([PK]
    * D'Agostino 1970; Anscombe & Glynn 1983; D'Agostino, Belanger &
    * D'Agostino 1990): the small-sample-calibrated omnibus — where
    * Jarque–Bera (L190) plugs raw g₁/g₂ into an asymptotic χ², K²
    * first maps each through its exact-moment normalizing transform
    * (Johnson S_U for skewness, Anscombe–Glynn cube-root for
    * kurtosis), so Z_skew/Z_kurt are ~N(0,1) even at modest n.
    * K² = Z₁² + Z₂² ~ χ²₂, whose tail is the exact closed form
    * e^{−K²/2}.
    *
    * Moments ride q256's census construction (floored-cent centering —
    * the documented exact-sum convention). Parity: the double chain is
    * deterministic from exact ints; the two non-IEEE libm calls (ln,
    * cbrt) are floor-quantized (1e-9 / 1e-12); sqrt/divisions are
    * IEEE-exact; p floor-quantized 1e-8.
    *
    * Scale: one cents-census agg + 1-row moment broadcast (the q256
    * shape). Guards: n < 20 (transforms uncalibrated), zero variance,
    * W ≤ 1, or A ≤ 4 → null. */
  def q291DagostinoK2(s: SparkSession, dir: String): DataFrame = {
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
    def qln(x: Column) = floor(log(x) * 1e9 + 0.5) / 1e9
    val nD = col("n").cast("double")
    val m2 = col("s2").cast("double") / nD
    val g1 = (col("s3").cast("double") / nD) / (m2 * sqrt(m2))
    val b2 = (col("s4").cast("double") / nD) / (m2 * m2)
    // Z1: Johnson S_U transform of g1 (D'Agostino 1970)
    val y = g1 * sqrt((nD + 1.0) * (nD + 3.0) / (lit(6.0) * (nD - 2.0)))
    val beta2 = lit(3.0) * (nD * nD + nD * 27.0 - 70.0) * (nD + 1.0) *
      (nD + 3.0) / ((nD - 2.0) * (nD + 5.0) * (nD + 7.0) * (nD + 9.0))
    val w2 = sqrt(lit(2.0) * (beta2 - 1.0)) - 1.0
    val delta = lit(1.0) / sqrt(qln(sqrt(w2)))
    val alpha = sqrt(lit(2.0) / (w2 - 1.0))
    val z1 = delta * qln(y / alpha + sqrt((y / alpha) * (y / alpha) + 1.0))
    // Z2: Anscombe–Glynn cube-root transform of b2
    val eb2 = lit(3.0) * (nD - 1.0) / (nD + 1.0)
    val vb2 = lit(24.0) * nD * (nD - 2.0) * (nD - 3.0) /
      ((nD + 1.0) * (nD + 1.0) * (nD + 3.0) * (nD + 5.0))
    val xx = (b2 - eb2) / sqrt(vb2)
    val sb = (lit(6.0) * (nD * nD - nD * 5.0 + 2.0) /
      ((nD + 7.0) * (nD + 9.0))) *
      sqrt(lit(6.0) * (nD + 3.0) * (nD + 5.0) /
        (nD * (nD - 2.0) * (nD - 3.0)))
    val aA = lit(6.0) + lit(8.0) / sb *
      (lit(2.0) / sb + sqrt(lit(1.0) + lit(4.0) / (sb * sb)))
    val qc = floor(cbrt((lit(1.0) - lit(2.0) / aA) /
      (lit(1.0) + xx * sqrt(lit(2.0) / (aA - 4.0)))) * 1e12 + 0.5) / 1e12
    val z2 = (lit(1.0) - lit(2.0) / (lit(9.0) * aA) - qc) *
      sqrt(lit(9.0) * aA / 2.0)
    val k2 = z1 * z1 + z2 * z2
    val bad = col("n") < 20L || col("s2") <= 0L || w2 <= 1.0 || aA <= 4.0
    pw.select(col("n").as("n_orders"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(z1, 4) + 0.0).as("z_skew"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(z2, 4) + 0.0).as("z_kurt"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(k2, 4) + 0.0).as("k2"),
      when(bad, lit(null).cast("double"))
        .otherwise(floor(exp(-k2 / 2.0) * 1e8 + 0.5) / 1e8).as("p"))
  }

  val q291DagostinoK2Sql: String =
    """WITH o AS (
      |  SELECT CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
      |  FROM orders),
      |cen AS (SELECT c, COUNT(*) AS cnt FROM o GROUP BY c),
      |s1 AS (
      |  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
      |    CAST(FLOOR(CAST(SUM(CAST(c AS HUGEINT) * cnt) AS DOUBLE)
      |      / SUM(cnt)) AS BIGINT) AS m
      |  FROM cen),
      |pw AS (
      |  SELECT n,
      |    SUM(CAST(c - m AS HUGEINT) * (c - m) * cnt) AS s2,
      |    SUM(CAST(c - m AS HUGEINT) * (c - m) * (c - m) * cnt) AS s3,
      |    SUM(CAST(c - m AS HUGEINT) * (c - m) * (c - m) * (c - m) * cnt)
      |      AS s4
      |  FROM cen, s1 GROUP BY n),
      |mm AS (
      |  SELECT n, s2,
      |    (CAST(s3 AS DOUBLE) / n)
      |      / ((CAST(s2 AS DOUBLE) / n) * SQRT(CAST(s2 AS DOUBLE) / n))
      |      AS g1,
      |    (CAST(s4 AS DOUBLE) / n)
      |      / ((CAST(s2 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)) AS b2
      |  FROM pw),
      |t1 AS (
      |  SELECT n, s2, g1, b2,
      |    g1 * SQRT((n + 1.0) * (n + 3.0) / (6.0 * (n - 2.0))) AS y,
      |    SQRT(2.0 * (3.0 * (CAST(n AS DOUBLE) * n + 27.0 * n - 70.0)
      |      * (n + 1.0) * (n + 3.0)
      |      / ((n - 2.0) * (n + 5.0) * (n + 7.0) * (n + 9.0)) - 1.0))
      |      - 1.0 AS w2
      |  FROM mm),
      |t2 AS (
      |  SELECT n, s2, b2, w2,
      |    (1.0 / SQRT(FLOOR(LN(SQRT(w2)) * 1e9 + 0.5) / 1e9))
      |    * (FLOOR(LN(y / SQRT(2.0 / (w2 - 1.0))
      |        + SQRT((y / SQRT(2.0 / (w2 - 1.0)))
      |          * (y / SQRT(2.0 / (w2 - 1.0))) + 1.0)) * 1e9 + 0.5)
      |      / 1e9) AS z1
      |  FROM t1),
      |t3 AS (
      |  SELECT n, s2, w2, z1,
      |    (b2 - 3.0 * (n - 1.0) / (n + 1.0))
      |      / SQRT(24.0 * CAST(n AS DOUBLE) * (n - 2.0) * (n - 3.0)
      |        / ((n + 1.0) * (n + 1.0) * (n + 3.0) * (n + 5.0))) AS xx,
      |    (6.0 * (CAST(n AS DOUBLE) * n - 5.0 * n + 2.0)
      |      / ((n + 7.0) * (n + 9.0)))
      |    * SQRT(6.0 * (n + 3.0) * (n + 5.0)
      |        / (CAST(n AS DOUBLE) * (n - 2.0) * (n - 3.0))) AS sb
      |  FROM t2),
      |t4 AS (
      |  SELECT n, s2, w2, z1, xx,
      |    6.0 + 8.0 / sb * (2.0 / sb + SQRT(1.0 + 4.0 / (sb * sb))) AS a
      |  FROM t3),
      |t5 AS (
      |  SELECT n, s2, w2, z1, a,
      |    (1.0 - 2.0 / (9.0 * a)
      |      - FLOOR(CBRT((1.0 - 2.0 / a)
      |          / (1.0 + xx * SQRT(2.0 / (a - 4.0)))) * 1e12 + 0.5) / 1e12)
      |    * SQRT(9.0 * a / 2.0) AS z2
      |  FROM t4)
      |SELECT n AS n_orders,
      |  CASE WHEN n < 20 OR s2 <= 0 OR w2 <= 1 OR a <= 4 THEN NULL
      |    ELSE ROUND(z1, 4) + 0 END AS z_skew,
      |  CASE WHEN n < 20 OR s2 <= 0 OR w2 <= 1 OR a <= 4 THEN NULL
      |    ELSE ROUND(z2, 4) + 0 END AS z_kurt,
      |  CASE WHEN n < 20 OR s2 <= 0 OR w2 <= 1 OR a <= 4 THEN NULL
      |    ELSE ROUND(z1 * z1 + z2 * z2, 4) + 0 END AS k2,
      |  CASE WHEN n < 20 OR s2 <= 0 OR w2 <= 1 OR a <= 4 THEN NULL
      |    ELSE FLOOR(EXP(-(z1 * z1 + z2 * z2) / 2.0) * 1e8 + 0.5) / 1e8
      |    END AS p
      |FROM t5""".stripMargin

  /** L227 partial correlation r_xy·z over the per-ORDER census ([PK]
    * Fisher 1924; any regression text): order revenue and order units
    * correlate strongly (r ≈ 0.74 on the fixtures) — but does price
    * still track quantity once the number of LINES per order is
    * controlled for? The first-order partial
    * (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) answers: it collapses
    * to ≈ −0.01 (measured at both SFs) — the raw association is
    * ENTIRELY the shared line-count driver. The feature-selection
    * primitive that separates direct association from a confounder,
    * next to the zero-order Pearson the engine already ships (q14/A9).
    *
    * Parity: x = order cents, y = order units, z = line count — ten
    * moment sums exact int64/DECIMAL in one agg over the per-order
    * census; every r is a deterministic double chain (variance
    * cross-products multiplied as doubles — their DECIMAL product
    * would overflow 38 digits at scale); IEEE sqrt; 6dp.
    *
    * Scale: one per-order agg (map-side combinable) + one 1-row
    * reduce — no joins, no windows. Guards: any zero variance or
    * |r_xz|,|r_yz| = 1 → null partial. */
  def q293PartialCorr(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
        .as("x"),
        sum(expr("cast(round(l_quantity) as bigint)")).as("y"),
        count(lit(1)).as("z"))
    val a = li.agg(count(lit(1)).as("n"),
      sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
      sum(col("z").cast(dec)).as("sz"),
      sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
      sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"),
      sum(col("z").cast(dec) * col("z").cast(dec)).as("szz"),
      sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
      sum(col("x").cast(dec) * col("z").cast(dec)).as("sxz"),
      sum(col("y").cast(dec) * col("z").cast(dec)).as("syz"))
    val nD = col("n").cast("double")
    def vr(saa: String, sa: String) = nD * col(saa).cast("double") -
      col(sa).cast("double") * col(sa).cast("double")
    def cv(sab: String, sa: String, sb: String) =
      nD * col(sab).cast("double") -
        col(sa).cast("double") * col(sb).cast("double")
    val rxy = cv("sxy", "sx", "sy") /
      sqrt(vr("sxx", "sx") * vr("syy", "sy"))
    val rxz = cv("sxz", "sx", "sz") /
      sqrt(vr("sxx", "sx") * vr("szz", "sz"))
    val ryz = cv("syz", "sy", "sz") /
      sqrt(vr("syy", "sy") * vr("szz", "sz"))
    val part = (rxy - rxz * ryz) /
      sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz))
    val badAny = col("n") < 3L || vr("sxx", "sx") <= 0.0 ||
      vr("syy", "sy") <= 0.0 || vr("szz", "sz") <= 0.0
    val badPart = badAny || rxz * rxz >= 1.0 || ryz * ryz >= 1.0
    a.select(col("n").as("n_orders"),
      when(badAny, lit(null).cast("double"))
        .otherwise(round(rxy, 6) + 0.0).as("r_xy"),
      when(badAny, lit(null).cast("double"))
        .otherwise(round(rxz, 6) + 0.0).as("r_xz"),
      when(badAny, lit(null).cast("double"))
        .otherwise(round(ryz, 6) + 0.0).as("r_yz"),
      when(badPart, lit(null).cast("double"))
        .otherwise(round(part, 6) + 0.0).as("r_xy_z"))
  }

  val q293PartialCorrSql: String =
    """WITH li AS (
      |  SELECT
      |    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS x,
      |    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS y,
      |    COUNT(*) AS z
      |  FROM lineitem GROUP BY l_orderkey),
      |a AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
      |    CAST(SUM(z) AS HUGEINT) AS sz,
      |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |    CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
      |    CAST(SUM(CAST(z AS HUGEINT) * z) AS HUGEINT) AS szz,
      |    CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
      |    CAST(SUM(CAST(x AS HUGEINT) * z) AS HUGEINT) AS sxz,
      |    CAST(SUM(CAST(y AS HUGEINT) * z) AS HUGEINT) AS syz
      |  FROM li),
      |r AS (
      |  SELECT n,
      |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS vx,
      |    (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS vy,
      |    (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
      |      - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)) AS vz,
      |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) AS cxy,
      |    (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE)) AS cxz,
      |    (CAST(n AS DOUBLE) * CAST(syz AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE)) AS cyz
      |  FROM a),
      |rr AS (
      |  SELECT n, vx, vy, vz,
      |    cxy / SQRT(vx * vy) AS rxy,
      |    cxz / SQRT(vx * vz) AS rxz,
      |    cyz / SQRT(vy * vz) AS ryz
      |  FROM r)
      |SELECT n AS n_orders,
      |  CASE WHEN n < 3 OR vx <= 0 OR vy <= 0 OR vz <= 0 THEN NULL
      |    ELSE ROUND(rxy, 6) + 0 END AS r_xy,
      |  CASE WHEN n < 3 OR vx <= 0 OR vy <= 0 OR vz <= 0 THEN NULL
      |    ELSE ROUND(rxz, 6) + 0 END AS r_xz,
      |  CASE WHEN n < 3 OR vx <= 0 OR vy <= 0 OR vz <= 0 THEN NULL
      |    ELSE ROUND(ryz, 6) + 0 END AS r_yz,
      |  CASE WHEN n < 3 OR vx <= 0 OR vy <= 0 OR vz <= 0
      |      OR rxz * rxz >= 1 OR ryz * ryz >= 1 THEN NULL
      |    ELSE ROUND((rxy - rxz * ryz)
      |      / SQRT((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6) + 0 END
      |    AS r_xy_z
      |FROM rr""".stripMargin

  /** L231 Cronbach's α internal-consistency reliability ([PK] Cronbach
    * 1951): do four integer "document richness" items — char-length
    * decile (≤10), token-count score, stopword-count score,
    * sentence-mark score — measure ONE underlying construct? The
    * interval-scale reliability coefficient next to the nominal
    * agreement family (κ q183/q274, α_K q282): those score RATERS on a
    * shared verdict; Cronbach scores ITEMS on a shared latent scale,
    * the pre-flight for combining sub-scores into one quality number
    * (q162's composite implicitly assumes this).
    *
    * α = k/(k−1) · (1 − Σᵢ Var(itemᵢ) / Var(Σᵢ itemᵢ)); with every
    * item an exact small integer, each variance is the exact-integer
    * form n·ΣX² − (ΣX)² (the common n²/(n(n−1)) factor cancels in the
    * ratio), so α is ONE double division + affine map from exact
    * DECIMAL sums, floor-quantized 1e-6. The variance-share ratio is
    * reported alongside; Σvar < var_total (positive average
    * inter-item covariance) is the non-degeneracy invariant.
    *
    * Scale: one per-doc map (4 integer screens) + one
    * map-side-combinable agg — no joins, no windows, no broadcasts.
    * Guards: var_total ≤ 0 (constant totals) → null α. */
  def q297CronbachAlpha(s: SparkSession, dir: String): DataFrame = {
    val stop = typedlit(Seq("the", "a", "of", "and", "to", "in", "is",
      "on"))
    val d = Tables.documents(s, dir).select(
      least(floor(col("n_chars") / 100.0), lit(10L)).as("i1"),
      least(floor(size(tokens(col("text"))) / 20.0), lit(10L)).as("i2"),
      least(floor(size(filter(tokens(col("text")),
        t => array_contains(stop, t))) / 5.0), lit(10L)).as("i3"),
      least(floor((length(col("text")) -
        length(regexp_replace(col("text"), "\\.", ""))) / 2.0),
        lit(10L)).as("i4"))
      .withColumn("t", col("i1") + col("i2") + col("i3") + col("i4"))
    val a = d.agg(count(lit(1)).as("n"),
      sum(col("i1")).as("s1"), sum(col("i1").cast(dec) * col("i1")).as("q1"),
      sum(col("i2")).as("s2"), sum(col("i2").cast(dec) * col("i2")).as("q2"),
      sum(col("i3")).as("s3"), sum(col("i3").cast(dec) * col("i3")).as("q3"),
      sum(col("i4")).as("s4"), sum(col("i4").cast(dec) * col("i4")).as("q4"),
      sum(col("t")).as("st"), sum(col("t").cast(dec) * col("t")).as("qt"))
    val nDec = col("n").cast(dec)
    def v(sc: Column, qc: Column): Column = nDec * qc - sc.cast(dec) * sc
    val sumVar = v(col("s1"), col("q1")) + v(col("s2"), col("q2")) +
      v(col("s3"), col("q3")) + v(col("s4"), col("q4"))
    val varT = v(col("st"), col("qt"))
    val ratio = sumVar.cast("double") / varT.cast("double")
    val bad = col("n") < 2L || varT <= lit(0L).cast(dec)
    a.select(col("n").cast("long").as("n_docs"),
      lit(4L).as("k_items"),
      when(bad, lit(null).cast("double"))
        .otherwise(floor(ratio * 1e6 + 0.5) / 1e6).as("var_share"),
      when(bad, lit(null).cast("double"))
        .otherwise(floor(lit(4.0) / 3.0 * (lit(1.0) - ratio) * 1e6 + 0.5)
          / 1e6).as("cronbach_alpha"))
  }

  val q297CronbachAlphaSql: String =
    """WITH d AS (
      |  SELECT
      |    LEAST(CAST(FLOOR(n_chars / 100.0) AS BIGINT), 10) AS i1,
      |    LEAST(CAST(FLOOR(len(string_split(text, ' ')) / 20.0) AS BIGINT),
      |      10) AS i2,
      |    LEAST(CAST(FLOOR(len(list_filter(string_split(text, ' '),
      |      t -> list_contains(['the','a','of','and','to','in','is','on'],
      |      t))) / 5.0) AS BIGINT), 10) AS i3,
      |    LEAST(CAST(FLOOR((len(text) - len(replace(text, '.', '')))
      |      / 2.0) AS BIGINT), 10) AS i4
      |  FROM documents),
      |dt AS (SELECT i1, i2, i3, i4, i1 + i2 + i3 + i4 AS t FROM d),
      |a AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(i1) AS BIGINT) AS s1,
      |    CAST(SUM(CAST(i1 AS HUGEINT) * i1) AS HUGEINT) AS q1,
      |    CAST(SUM(i2) AS BIGINT) AS s2,
      |    CAST(SUM(CAST(i2 AS HUGEINT) * i2) AS HUGEINT) AS q2,
      |    CAST(SUM(i3) AS BIGINT) AS s3,
      |    CAST(SUM(CAST(i3 AS HUGEINT) * i3) AS HUGEINT) AS q3,
      |    CAST(SUM(i4) AS BIGINT) AS s4,
      |    CAST(SUM(CAST(i4 AS HUGEINT) * i4) AS HUGEINT) AS q4,
      |    CAST(SUM(t) AS BIGINT) AS st,
      |    CAST(SUM(CAST(t AS HUGEINT) * t) AS HUGEINT) AS qt
      |  FROM dt),
      |c0 AS (
      |  SELECT n,
      |    CAST((CAST(n AS HUGEINT) * q1 - CAST(s1 AS HUGEINT) * s1)
      |      + (CAST(n AS HUGEINT) * q2 - CAST(s2 AS HUGEINT) * s2)
      |      + (CAST(n AS HUGEINT) * q3 - CAST(s3 AS HUGEINT) * s3)
      |      + (CAST(n AS HUGEINT) * q4 - CAST(s4 AS HUGEINT) * s4)
      |      AS DOUBLE)
      |      / CAST(CAST(n AS HUGEINT) * qt - CAST(st AS HUGEINT) * st
      |        AS DOUBLE) AS ratio,
      |    CAST(n AS HUGEINT) * qt - CAST(st AS HUGEINT) * st AS vt
      |  FROM a)
      |SELECT n AS n_docs, CAST(4 AS BIGINT) AS k_items,
      |  CASE WHEN n < 2 OR vt <= 0 THEN NULL
      |    ELSE FLOOR(ratio * 1e6 + 0.5) / 1e6 END AS var_share,
      |  CASE WHEN n < 2 OR vt <= 0 THEN NULL
      |    ELSE FLOOR(4.0 / 3.0 * (1.0 - ratio) * 1e6 + 0.5) / 1e6 END
      |    AS cronbach_alpha
      |FROM c0""".stripMargin

  /** L232 distributed OLS via the Gram matrix ([PK] normal equations;
    * the classic scalable form — e.g. Spark MLlib's normal-equation
    * solver): regress order revenue (cents) on order units and line
    * count jointly. q293 showed the PAIRWISE story (raw r_xy ≈ 0.74
    * collapses to ≈ −0.01 given z); the regression gives the JOINT
    * readout — the line-count coefficient carries essentially all the
    * fit (R² ≈ 0.55 at sf0.01) while the units coefficient sits near
    * zero, the multivariable restatement of the same confounder.
    *
    * Construction: the 100 TB-safe shape — ONE map-side-combinable agg
    * of the 10 Gram moments (n, Σx₁, Σx₂, Σy, Σx₁², Σx₂², Σx₁x₂, Σx₁y,
    * Σx₂y, Σy²) as exact DECIMAL(38,0)/HUGEINT, then the 3×3 normal
    * system solved in closed form by Cramer's rule as one deterministic
    * double chain (same expression tree both engines → identical bits;
    * X'X never materializes per-row state and no iteration happens).
    * SSE = Σy² − β'X'y, R² = 1 − SSE/SST, adj-R² over n−3 df.
    *
    * Guards: n < 4, zero exact variance in either regressor, or
    * det(X'X) = 0 (collinear) → null coefficients. */
  def q298OlsGram(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.lineitem(s, dir).groupBy("l_orderkey")
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
        .as("y"),
        sum(expr("cast(round(l_quantity) as bigint)")).as("x1"),
        count(lit(1)).as("x2"))
    def d(c: String) = col(c).cast(dec)
    val a = per.agg(count(lit(1)).as("n"),
      sum(d("x1")).as("s1"), sum(d("x2")).as("s2"), sum(d("y")).as("sy"),
      sum(d("x1") * d("x1")).as("s11"), sum(d("x2") * d("x2")).as("s22"),
      sum(d("x1") * d("x2")).as("s12"), sum(d("x1") * d("y")).as("s1y"),
      sum(d("x2") * d("y")).as("s2y"), sum(d("y") * d("y")).as("syy"))
    def f(c: String) = col(c).cast("double")
    val (n, s1, s2, sy) = (f("n"), f("s1"), f("s2"), f("sy"))
    val (s11, s22, s12) = (f("s11"), f("s22"), f("s12"))
    val (s1y, s2y, syy) = (f("s1y"), f("s2y"), f("syy"))
    val m11 = s11 * s22 - s12 * s12
    val m12 = s1 * s22 - s12 * s2
    val m13 = s1 * s12 - s11 * s2
    val det = n * m11 - s1 * m12 + s2 * m13
    val det0 = sy * m11 - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) - sy * m12 +
      s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * m13
    val (b0, b1, b2) = (det0 / det, det1 / det, det2 / det)
    val sse = syy - b0 * sy - b1 * s1y - b2 * s2y
    val sst = syy - sy * sy / n
    val r2 = lit(1.0) - sse / sst
    // exact singularity guards (DECIMAL cross-products, no FP noise)
    val nD = col("n").cast(dec)
    val v1 = nD * col("s11") - col("s1") * col("s1")
    val v2 = nD * col("s22") - col("s2") * col("s2")
    val zero = lit(0L).cast(dec)
    val bad = col("n") < 4L || v1 <= zero || v2 <= zero || det === 0.0 ||
      sst <= 0.0
    def out(c: Column, nm: String) =
      when(bad, lit(null).cast("double"))
        .otherwise(round(c, 6) + 0.0).as(nm)
    a.select(col("n").cast("long").as("n_orders"),
      out(b0, "intercept_cents"), out(b1, "beta_units"),
      out(b2, "beta_lines"), out(r2, "r2"),
      out(lit(1.0) - (lit(1.0) - r2) * (n - 1.0) / (n - 3.0), "adj_r2"))
  }

  val q298OlsGramSql: String =
    """WITH per AS (
      |  SELECT
      |    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS y,
      |    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS x1,
      |    COUNT(*) AS x2
      |  FROM lineitem GROUP BY l_orderkey),
      |a AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(x1) AS HUGEINT) AS s1, CAST(SUM(x2) AS HUGEINT) AS s2,
      |    CAST(SUM(y) AS HUGEINT) AS sy,
      |    CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
      |    CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
      |    CAST(SUM(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
      |    CAST(SUM(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s1y,
      |    CAST(SUM(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s2y,
      |    CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      |  FROM per),
      |f AS (
      |  SELECT n,
      |    CAST(n AS DOUBLE) AS nf, CAST(s1 AS DOUBLE) AS s1,
      |    CAST(s2 AS DOUBLE) AS s2, CAST(sy AS DOUBLE) AS sy,
      |    CAST(s11 AS DOUBLE) AS s11, CAST(s22 AS DOUBLE) AS s22,
      |    CAST(s12 AS DOUBLE) AS s12, CAST(s1y AS DOUBLE) AS s1y,
      |    CAST(s2y AS DOUBLE) AS s2y, CAST(syy AS DOUBLE) AS syy,
      |    (CAST(n AS HUGEINT) * s11 - s1 * s1) AS v1,
      |    (CAST(n AS HUGEINT) * s22 - s2 * s2) AS v2
      |  FROM a),
      |m AS (
      |  SELECT *,
      |    (s11 * s22 - s12 * s12) AS m11,
      |    (s1 * s22 - s12 * s2) AS m12,
      |    (s1 * s12 - s11 * s2) AS m13
      |  FROM f),
      |dets AS (
      |  SELECT *,
      |    (nf * m11 - s1 * m12 + s2 * m13) AS det,
      |    (sy * m11 - s1 * (s1y * s22 - s12 * s2y)
      |      + s2 * (s1y * s12 - s11 * s2y)) AS det0,
      |    (nf * (s1y * s22 - s12 * s2y) - sy * m12
      |      + s2 * (s1 * s2y - s1y * s2)) AS det1,
      |    (nf * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
      |      + sy * m13) AS det2,
      |    (syy - sy * sy / nf) AS sst
      |  FROM m),
      |b AS (
      |  SELECT *,
      |    det0 / det AS b0, det1 / det AS b1, det2 / det AS b2,
      |    (n < 4 OR v1 <= 0 OR v2 <= 0 OR det = 0 OR
      |      syy - sy * sy / nf <= 0) AS bad
      |  FROM dets),
      |r AS (
      |  SELECT *,
      |    1.0 - (syy - b0 * sy - b1 * s1y - b2 * s2y) / sst AS r2
      |  FROM b)
      |SELECT n AS n_orders,
      |  CASE WHEN bad THEN NULL ELSE ROUND(b0, 6) + 0 END
      |    AS intercept_cents,
      |  CASE WHEN bad THEN NULL ELSE ROUND(b1, 6) + 0 END AS beta_units,
      |  CASE WHEN bad THEN NULL ELSE ROUND(b2, 6) + 0 END AS beta_lines,
      |  CASE WHEN bad THEN NULL ELSE ROUND(r2, 6) + 0 END AS r2,
      |  CASE WHEN bad THEN NULL
      |    ELSE ROUND(1.0 - (1.0 - r2) * (nf - 1.0) / (nf - 3.0), 6) + 0
      |    END AS adj_r2
      |FROM r""".stripMargin

  /** L233 isotonic calibration via the minimax formula ([PK] Ayer et
    * al. 1955; Barlow & Brunk 1972; the monotone fit behind isotonic
    * probability calibration): fit the best monotone non-decreasing
    * rate curve over the token-count score bins for the outcome "doc
    * contains 'the'". The raw bin rates rise with local violations
    * (0.846→0.841 at sf0.01 bins 5→6; 0.927→0.902 at sf0.001 6→7);
    * the PAV solution pools exactly those neighbours. This is the
    * CALIBRATED counterpart of q197's raw reliability table — the
    * monotone re-map a score pipeline applies before thresholding.
    *
    * Construction: the corpus collapses to a ≤20-row (bin, n, Σy)
    * census map-side; the isotonic fit uses the closed-form
    * m_i = max_{j≤i} min_{k≥i} avg(y over bins j..k) — NOT the
    * sequential PAV sweep — so it is a bounded O(B³) computation over
    * census rows: one ≤20×20 non-equi self-join (BNLJ, allowlisted) +
    * a running-min window per start-bin + one max-group-by. The exact
    * PAV equivalence is pinned by StatBruteSpec's sequential pooler.
    *
    * Parity: every interval average is ONE double division of exact
    * int64 prefix sums; running min / group max over those doubles are
    * order-free; 6dp floor-quantized. */
  def q299IsotonicFit(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("bin")
    val census = Tables.documents(s, dir)
      .select(least(floor(size(tokens(col("text"))) / 10.0), lit(19L))
        .as("bin"),
        when(array_contains(tokens(col("text")), "the"), 1L)
          .otherwise(0L).as("y"))
      .groupBy("bin").agg(count(lit(1)).as("nb"), sum("y").as("sb"))
      .withColumn("pn", sum("nb").over(w))
      .withColumn("ps", sum("sb").over(w))
    val pairs = census.select(col("bin").as("jb"), col("nb").as("jn"),
        col("sb").as("js"), col("pn").as("jpn"), col("ps").as("jps"))
      .join(census.select(col("bin").as("kb"), col("pn").as("kpn"),
        col("ps").as("kps")), col("jb") <= col("kb"))
      .select(col("jb"), col("kb"),
        ((col("kps") - col("jps") + col("js")).cast("double") /
          (col("kpn") - col("jpn") + col("jn")).cast("double")).as("a"))
    val wj = Window.partitionBy("jb").orderBy(col("kb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val iso = pairs.withColumn("bmin", min("a").over(wj))
      .groupBy("kb").agg(max("bmin").as("iso"))
    census.join(iso, col("bin") === col("kb"))
      .select(col("bin"), col("nb").as("n_docs"),
        (floor(col("sb").cast("double") / col("nb").cast("double") *
          1e6 + 0.5) / 1e6).as("raw_rate"),
        (floor(col("iso") * 1e6 + 0.5) / 1e6).as("iso_rate"))
      .orderBy("bin")
  }

  val q299IsotonicFitSql: String =
    """WITH c0 AS (
      |  SELECT
      |    LEAST(CAST(FLOOR(len(string_split(text, ' ')) / 10.0)
      |      AS BIGINT), 19) AS bin,
      |    CASE WHEN list_contains(string_split(text, ' '), 'the')
      |      THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |census AS (
      |  SELECT bin, COUNT(*) AS nb, CAST(SUM(y) AS BIGINT) AS sb
      |  FROM c0 GROUP BY bin),
      |pre AS (
      |  SELECT bin, nb, sb,
      |    CAST(SUM(nb) OVER (ORDER BY bin) AS BIGINT) AS pn,
      |    CAST(SUM(sb) OVER (ORDER BY bin) AS BIGINT) AS ps
      |  FROM census),
      |pairs AS (
      |  SELECT j.bin AS jb, k.bin AS kb,
      |    CAST(k.ps - j.ps + j.sb AS DOUBLE)
      |      / CAST(k.pn - j.pn + j.nb AS DOUBLE) AS a
      |  FROM pre j JOIN pre k ON j.bin <= k.bin),
      |bmin AS (
      |  SELECT jb, kb,
      |    MIN(a) OVER (PARTITION BY jb ORDER BY kb DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bmin
      |  FROM pairs),
      |iso AS (SELECT kb, MAX(bmin) AS iso FROM bmin GROUP BY kb)
      |SELECT bin, nb AS n_docs,
      |  FLOOR(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) * 1e6 + 0.5) / 1e6
      |    AS raw_rate,
      |  FLOOR(iso * 1e6 + 0.5) / 1e6 AS iso_rate
      |FROM pre JOIN iso ON pre.bin = iso.kb
      |ORDER BY bin""".stripMargin

  /** L234 intraclass correlation ICC(2,1)/(2,k)/(3,1) ([PK] Shrout &
    * Fleiss 1979; McGraw & Wong 1996): the two-way ANOVA reliability
    * decomposition over the SAME 4-item richness table as q297 —
    * Cronbach's α answers "is the item SUM reliable"; the ICCs answer
    * "is a SINGLE item interchangeable with another" (ICC(2,1), items
    * as random draws), "is the 4-item average reliable under that
    * model" (ICC(2,k)), and "how consistent are single items ignoring
    * their level offsets" (ICC(3,1)). ICC(3,k) ≡ Cronbach's α — that
    * identity is pinned cross-query by NonDegeneracySpec against
    * q297's output.
    *
    * Construction: each doc is one row, so ALL sums are map-side — n,
    * ΣΣx² (Q), Σ_d rowsum² (R2, computed per-row before the agg), and
    * the 4 column sums; SS_rows = R2/k − G²/(nk), SS_cols = ΣC²/n −
    * G²/(nk), SS_e by subtraction, then the Shrout–Fleiss forms are
    * one deterministic double chain from the exact DECIMAL sums, 6dp.
    * No joins, no windows — ONE agg at any scale.
    *
    * Guards: n < 2 or zero between-doc mean square → null. */
  def q301Icc(s: SparkSession, dir: String): DataFrame = {
    val stop = typedlit(Seq("the", "a", "of", "and", "to", "in", "is",
      "on"))
    val d = Tables.documents(s, dir).select(
      least(floor(col("n_chars") / 100.0), lit(10L)).as("i1"),
      least(floor(size(tokens(col("text"))) / 20.0), lit(10L)).as("i2"),
      least(floor(size(filter(tokens(col("text")),
        t => array_contains(stop, t))) / 5.0), lit(10L)).as("i3"),
      least(floor((length(col("text")) -
        length(regexp_replace(col("text"), "\\.", ""))) / 2.0),
        lit(10L)).as("i4"))
      .withColumn("t", col("i1") + col("i2") + col("i3") + col("i4"))
    val a = d.agg(count(lit(1)).as("n"),
      sum(col("t")).as("g"),
      sum(col("t").cast(dec) * col("t")).as("r2"),
      (sum(col("i1").cast(dec) * col("i1")) +
        sum(col("i2").cast(dec) * col("i2")) +
        sum(col("i3").cast(dec) * col("i3")) +
        sum(col("i4").cast(dec) * col("i4"))).as("q"),
      sum(col("i1")).as("c1"), sum(col("i2")).as("c2"),
      sum(col("i3")).as("c3"), sum(col("i4")).as("c4"))
    val k = lit(4.0)
    val n = col("n").cast("double")
    val g = col("g").cast("double")
    val cm = g * g / (n * k) // correction for the mean, G²/(nk)
    val ssr = col("r2").cast("double") / k - cm
    val ssc = (col("c1").cast("double") * col("c1").cast("double") +
      col("c2").cast("double") * col("c2").cast("double") +
      col("c3").cast("double") * col("c3").cast("double") +
      col("c4").cast("double") * col("c4").cast("double")) / n - cm
    val sst = col("q").cast("double") - cm
    val sse = sst - ssr - ssc
    val msr = ssr / (n - 1.0)
    val msc = ssc / (k - 1.0)
    val mse = sse / ((n - 1.0) * (k - 1.0))
    val icc21 = (msr - mse) /
      (msr + (k - 1.0) * mse + k * (msc - mse) / n)
    val icc2k = (msr - mse) / (msr + (msc - mse) / n)
    val icc31 = (msr - mse) / (msr + (k - 1.0) * mse)
    val icc3k = (msr - mse) / msr
    val bad = col("n") < 2L || msr <= 0.0
    def out(c: Column, nm: String) =
      when(bad, lit(null).cast("double"))
        .otherwise(floor(c * 1e6 + 0.5) / 1e6).as(nm)
    a.select(col("n").cast("long").as("n_docs"),
      out(msr, "ms_rows"), out(msc, "ms_cols"), out(mse, "ms_err"),
      out(icc21, "icc_2_1"), out(icc2k, "icc_2_k"),
      out(icc31, "icc_3_1"), out(icc3k, "icc_3_k"))
  }

  /** L246 Gwet's AC1 chance-corrected agreement ([PK] Gwet 2008): the
    * prevalence-robust member of the agreement family over the SAME
    * three-screen rater ensemble as Fleiss' κ (q274) and
    * Krippendorff's α (q282). κ and α compute chance agreement from
    * the OBSERVED category prevalence, so a skewed corpus (π ≈ 0.91
    * "good" here) makes chance ≈ 0.84 and crushes κ even when raters
    * almost always agree — the "kappa paradox". AC1's chance model
    * uses 2π(1−π) (the probability BOTH raters guess the rare
    * category at random), which stays small under skew; on this
    * fixture AC1 ≈ 0.91 while κ sits far lower — the gap is pinned
    * cross-query, making the paradox itself the executable invariant.
    *
    * Parity: Pa and π are exact int64 ratios (pair-agreement counts
    * g(g−1)/2 + (3−g)(2−g)/2 per doc); AC1 is one double chain from
    * the exact sums, 6dp.
    *
    * Scale: one map-side-combinable agg — no joins, no windows. */
  def q310GwetAc1(s: SparkSession, dir: String): DataFrame = {
    val a = raters(s, dir).agg(count(lit(1)).as("n"),
      sum(col("g")).as("gg"),
      // g(g−1)/2 + (3−g)(2−g)/2 simplifies to g²−3g+3 — integer exact
      sum(col("g") * col("g") - col("g") * 3L + 3L).as("agr"))
    val n = col("n").cast("double")
    val pa = col("agr").cast("double") / (n * 3.0)
    val pi = col("gg").cast("double") / (n * 3.0)
    val pe = lit(2.0) * pi * (lit(1.0) - pi)
    val bad = col("n") < 2L || pe >= 1.0
    def out(c: Column, nm: String) =
      when(bad, lit(null).cast("double"))
        .otherwise(round(c, 6) + 0.0).as(nm)
    a.select(col("n").cast("long").as("n_docs"),
      out(pa, "p_agree"), out(pi, "prevalence"), out(pe, "p_chance"),
      out((pa - pe) / (lit(1.0) - pe), "gwet_ac1"))
  }

  val q310GwetAc1Sql: String =
    """WITH d AS (
      |  SELECT
      |    (CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END)
      |    + (CASE WHEN len(string_split(text, ' ')) >= 20 THEN 1 ELSE 0
      |       END)
      |    + (CASE WHEN len(list_intersect(string_split(text, ' '),
      |        ['the','a','of','and','to','in','is','on'])) > 0
      |       THEN 1 ELSE 0 END) AS g
      |  FROM documents),
      |a AS (
      |  SELECT COUNT(*) AS n, CAST(SUM(g) AS BIGINT) AS gg,
      |    CAST(SUM(g * g - g * 3 + 3) AS BIGINT) AS agr
      |  FROM d),
      |c0 AS (
      |  SELECT n,
      |    CAST(agr AS DOUBLE) / (CAST(n AS DOUBLE) * 3.0) AS pa,
      |    CAST(gg AS DOUBLE) / (CAST(n AS DOUBLE) * 3.0) AS pi
      |  FROM a),
      |c1 AS (
      |  SELECT n, pa, pi, 2.0 * pi * (1.0 - pi) AS pe FROM c0)
      |SELECT n AS n_docs,
      |  CASE WHEN n < 2 OR pe >= 1 THEN NULL
      |    ELSE ROUND(pa, 6) + 0 END AS p_agree,
      |  CASE WHEN n < 2 OR pe >= 1 THEN NULL
      |    ELSE ROUND(pi, 6) + 0 END AS prevalence,
      |  CASE WHEN n < 2 OR pe >= 1 THEN NULL
      |    ELSE ROUND(pe, 6) + 0 END AS p_chance,
      |  CASE WHEN n < 2 OR pe >= 1 THEN NULL
      |    ELSE ROUND((pa - pe) / (1.0 - pe), 6) + 0 END AS gwet_ac1
      |FROM c1""".stripMargin

  /** L240 Breusch–Pagan heteroscedasticity test ([PK] Breusch & Pagan
    * 1979; Koenker 1981 studentized form): does the VARIANCE of
    * q298's regression residuals move with the regressors? The
    * diagnostic that decides whether q298's classical standard errors
    * can be trusted — order revenue dispersion obviously grows with
    * line count, so the test fires decisively (pinned), which is
    * exactly why a real pipeline would switch to robust (HC) errors.
    * Koenker's studentized LM = n·R²_aux of the auxiliary regression
    * of squared residuals on (units, lines); LM ~ χ²₂ under
    * homoscedasticity, whose tail is EXACTLY e^{−LM/2} (even df — no
    * erf needed).
    *
    * Construction: the q298 Gram solve runs in-plan (1-row broadcast
    * of the 10 moments onto the per-order census — the q242 form,
    * allowlisted); residuals are floor-quantized to whole cents
    * (exact int64, the perturbation is ~10⁻⁹ of a typical residual)
    * so the auxiliary Gram moments are again exact DECIMAL/HUGEINT,
    * and the aux R² reuses the same Cramer chain. TWO census passes
    * total over one lazily-checkpointed frame — no iteration, no
    * driver action.
    *
    * Guards: q298's own singularity guards, aux SST ≤ 0, or n < 5 →
    * null. */
  def q306BreuschPagan(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.lineitem(s, dir).groupBy("l_orderkey")
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
        .as("y"),
        sum(expr("cast(round(l_quantity) as bigint)")).as("x1"),
        count(lit(1)).as("x2"))
      .localCheckpoint(eager = false)
    def d(c: String) = col(c).cast(dec)
    val gram = per.agg(count(lit(1)).as("n"),
      sum(d("x1")).as("s1"), sum(d("x2")).as("s2"), sum(d("y")).as("sy"),
      sum(d("x1") * d("x1")).as("s11"), sum(d("x2") * d("x2")).as("s22"),
      sum(d("x1") * d("x2")).as("s12"), sum(d("x1") * d("y")).as("s1y"),
      sum(d("x2") * d("y")).as("s2y"))
    def f(c: String) = col(c).cast("double")
    def cramer(sy: String, s1y: String, s2y: String)
        : (Column, Column, Column, Column) = {
      val (n, s1, s2) = (f("n"), f("s1"), f("s2"))
      val (s11, s22, s12) = (f("s11"), f("s22"), f("s12"))
      val m11 = s11 * s22 - s12 * s12
      val m12 = s1 * s22 - s12 * s2
      val m13 = s1 * s12 - s11 * s2
      val det = n * m11 - s1 * m12 + s2 * m13
      val det0 = f(sy) * m11 - s1 * (f(s1y) * s22 - s12 * f(s2y)) +
        s2 * (f(s1y) * s12 - s11 * f(s2y))
      val det1 = n * (f(s1y) * s22 - s12 * f(s2y)) - f(sy) * m12 +
        s2 * (s1 * f(s2y) - f(s1y) * s2)
      val det2 = n * (s11 * f(s2y) - f(s1y) * s12) -
        s1 * (s1 * f(s2y) - f(s1y) * s2) + f(sy) * m13
      (det0 / det, det1 / det, det2 / det, det)
    }
    val (b0, b1, b2, det) = cramer("sy", "s1y", "s2y")
    // residuals, cent-quantized → exact aux moments
    val resid = per.crossJoin(broadcast(gram.select(col("n"),
        col("s1"), col("s2"), col("sy"), col("s11"), col("s22"),
        col("s12"), col("s1y"), col("s2y"),
        b0.as("b0"), b1.as("b1"), b2.as("b2"), det.as("det"))))
      .select(col("x1"), col("x2"), col("n"), col("s1"), col("s2"),
        col("s11"), col("s22"), col("s12"), col("det"),
        floor(col("y").cast("double") - col("b0") -
          col("b1") * col("x1").cast("double") -
          col("b2") * col("x2").cast("double") + 0.5).cast("long")
          .as("e"))
    val aux = resid.groupBy("n", "s1", "s2", "s11", "s22", "s12", "det")
      .agg(sum(col("e").cast(dec) * col("e")).as("su"),
        sum(col("e").cast(dec) * col("e") * d("x1")).as("s1u"),
        sum(col("e").cast(dec) * col("e") * d("x2")).as("s2u"),
        sum(col("e").cast(dec) * col("e") * col("e").cast(dec) *
          col("e")).as("suu"))
    // aux R² via the same closed form, response u = e². Precision
    // budget: suu rides cents⁴ (≤ ~10³⁵ at sf0.1 — inside DECIMAL(38)/
    // HUGEINT); at ≥10⁹ orders switch the residuals to whole dollars
    // before squaring to keep the quartic sum inside 38 digits.
    def fa(c: String) = col(c).cast("double")
    val (n, s1, s2) = (fa("n"), fa("s1"), fa("s2"))
    val (s11, s22, s12) = (fa("s11"), fa("s22"), fa("s12"))
    val m11 = s11 * s22 - s12 * s12
    val m12 = s1 * s22 - s12 * s2
    val m13 = s1 * s12 - s11 * s2
    val detA = n * m11 - s1 * m12 + s2 * m13
    val a0 = (fa("su") * m11 - s1 * (fa("s1u") * s22 - s12 * fa("s2u")) +
      s2 * (fa("s1u") * s12 - s11 * fa("s2u"))) / detA
    val a1 = (n * (fa("s1u") * s22 - s12 * fa("s2u")) - fa("su") * m12 +
      s2 * (s1 * fa("s2u") - fa("s1u") * s2)) / detA
    val a2 = (n * (s11 * fa("s2u") - fa("s1u") * s12) -
      s1 * (s1 * fa("s2u") - fa("s1u") * s2) + fa("su") * m13) / detA
    val sseA = fa("suu") - a0 * fa("su") - a1 * fa("s1u") -
      a2 * fa("s2u")
    val sstA = fa("suu") - fa("su") * fa("su") / n
    val r2a = lit(1.0) - sseA / sstA
    val lm = n * r2a
    val bad = col("n") < 5L || col("det") === 0.0 || detA === 0.0 ||
      sstA <= 0.0
    aux.select(col("n").cast("long").as("n_orders"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(lm, 4) + 0.0).as("bp_lm"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(exp(-lm / 2.0), 6) + 0.0).as("p_value"),
      when(bad, lit(null).cast("long"))
        .otherwise(when(exp(-lm / 2.0) < 0.05, 1L).otherwise(0L))
        .as("heteroscedastic_5pct"))
  }

  val q306BreuschPaganSql: String =
    """WITH per AS (
      |  SELECT
      |    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS y,
      |    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS x1,
      |    COUNT(*) AS x2
      |  FROM lineitem GROUP BY l_orderkey),
      |g AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(x1) AS HUGEINT) AS s1, CAST(SUM(x2) AS HUGEINT) AS s2,
      |    CAST(SUM(y) AS HUGEINT) AS sy,
      |    CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
      |    CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
      |    CAST(SUM(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
      |    CAST(SUM(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s1y,
      |    CAST(SUM(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s2y
      |  FROM per),
      |gf AS (
      |  SELECT n,
      |    CAST(n AS DOUBLE) AS nf, CAST(s1 AS DOUBLE) AS s1f,
      |    CAST(s2 AS DOUBLE) AS s2f, CAST(sy AS DOUBLE) AS syf,
      |    CAST(s11 AS DOUBLE) AS s11f, CAST(s22 AS DOUBLE) AS s22f,
      |    CAST(s12 AS DOUBLE) AS s12f, CAST(s1y AS DOUBLE) AS s1yf,
      |    CAST(s2y AS DOUBLE) AS s2yf
      |  FROM g),
      |bb AS (
      |  SELECT *,
      |    (nf * (s11f * s22f - s12f * s12f)
      |      - s1f * (s1f * s22f - s12f * s2f)
      |      + s2f * (s1f * s12f - s11f * s2f)) AS det
      |  FROM gf),
      |bcoef AS (
      |  SELECT *,
      |    (syf * (s11f * s22f - s12f * s12f)
      |      - s1f * (s1yf * s22f - s12f * s2yf)
      |      + s2f * (s1yf * s12f - s11f * s2yf)) / det AS b0,
      |    (nf * (s1yf * s22f - s12f * s2yf)
      |      - syf * (s1f * s22f - s12f * s2f)
      |      + s2f * (s1f * s2yf - s1yf * s2f)) / det AS b1,
      |    (nf * (s11f * s2yf - s1yf * s12f)
      |      - s1f * (s1f * s2yf - s1yf * s2f)
      |      + syf * (s1f * s12f - s11f * s2f)) / det AS b2
      |  FROM bb),
      |res AS (
      |  SELECT per.x1, per.x2, bcoef.n, bcoef.nf, bcoef.s1f, bcoef.s2f,
      |    bcoef.s11f, bcoef.s22f, bcoef.s12f, bcoef.det,
      |    CAST(FLOOR(CAST(per.y AS DOUBLE) - b0
      |      - b1 * CAST(per.x1 AS DOUBLE)
      |      - b2 * CAST(per.x2 AS DOUBLE) + 0.5) AS BIGINT) AS e
      |  FROM per CROSS JOIN bcoef),
      |aux AS (
      |  SELECT MAX(n) AS n, MAX(nf) AS nf, MAX(s1f) AS s1f,
      |    MAX(s2f) AS s2f, MAX(s11f) AS s11f, MAX(s22f) AS s22f,
      |    MAX(s12f) AS s12f, MAX(det) AS det,
      |    CAST(SUM(CAST(e AS HUGEINT) * e) AS DOUBLE) AS su,
      |    CAST(SUM(CAST(e AS HUGEINT) * e * x1) AS DOUBLE) AS s1u,
      |    CAST(SUM(CAST(e AS HUGEINT) * e * x2) AS DOUBLE) AS s2u,
      |    CAST(SUM(CAST(e AS HUGEINT) * e * e * e) AS DOUBLE) AS suu
      |  FROM res),
      |ac AS (
      |  SELECT *,
      |    (nf * (s11f * s22f - s12f * s12f)
      |      - s1f * (s1f * s22f - s12f * s2f)
      |      + s2f * (s1f * s12f - s11f * s2f)) AS detA
      |  FROM aux),
      |a2 AS (
      |  SELECT *,
      |    (su * (s11f * s22f - s12f * s12f)
      |      - s1f * (s1u * s22f - s12f * s2u)
      |      + s2f * (s1u * s12f - s11f * s2u)) / detA AS c0,
      |    (nf * (s1u * s22f - s12f * s2u) - su * (s1f * s22f - s12f * s2f)
      |      + s2f * (s1f * s2u - s1u * s2f)) / detA AS c1,
      |    (nf * (s11f * s2u - s1u * s12f)
      |      - s1f * (s1f * s2u - s1u * s2f)
      |      + su * (s1f * s12f - s11f * s2f)) / detA AS c2
      |  FROM ac),
      |fin AS (
      |  SELECT n, nf, det, detA,
      |    suu - su * su / nf AS sstA,
      |    nf * (1.0 - (suu - c0 * su - c1 * s1u - c2 * s2u)
      |      / (suu - su * su / nf)) AS lm
      |  FROM a2)
      |SELECT n AS n_orders,
      |  CASE WHEN n < 5 OR det = 0 OR detA = 0 OR sstA <= 0 THEN NULL
      |    ELSE ROUND(lm, 4) + 0 END AS bp_lm,
      |  CASE WHEN n < 5 OR det = 0 OR detA = 0 OR sstA <= 0 THEN NULL
      |    ELSE ROUND(EXP(-lm / 2.0), 6) + 0 END AS p_value,
      |  CASE WHEN n < 5 OR det = 0 OR detA = 0 OR sstA <= 0 THEN NULL
      |    WHEN EXP(-lm / 2.0) < 0.05 THEN 1 ELSE 0 END
      |    AS heteroscedastic_5pct
      |FROM fin""".stripMargin

  val q301IccSql: String =
    """WITH d AS (
      |  SELECT
      |    LEAST(CAST(FLOOR(n_chars / 100.0) AS BIGINT), 10) AS i1,
      |    LEAST(CAST(FLOOR(len(string_split(text, ' ')) / 20.0) AS BIGINT),
      |      10) AS i2,
      |    LEAST(CAST(FLOOR(len(list_filter(string_split(text, ' '),
      |      t -> list_contains(['the','a','of','and','to','in','is','on'],
      |      t))) / 5.0) AS BIGINT), 10) AS i3,
      |    LEAST(CAST(FLOOR((len(text) - len(replace(text, '.', '')))
      |      / 2.0) AS BIGINT), 10) AS i4
      |  FROM documents),
      |dt AS (SELECT *, i1 + i2 + i3 + i4 AS t FROM d),
      |a AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(t) AS BIGINT) AS g,
      |    CAST(SUM(CAST(t AS HUGEINT) * t) AS HUGEINT) AS r2,
      |    CAST(SUM(CAST(i1 AS HUGEINT) * i1) + SUM(CAST(i2 AS HUGEINT) * i2)
      |      + SUM(CAST(i3 AS HUGEINT) * i3) + SUM(CAST(i4 AS HUGEINT) * i4)
      |      AS HUGEINT) AS q,
      |    CAST(SUM(i1) AS BIGINT) AS c1, CAST(SUM(i2) AS BIGINT) AS c2,
      |    CAST(SUM(i3) AS BIGINT) AS c3, CAST(SUM(i4) AS BIGINT) AS c4
      |  FROM dt),
      |s AS (
      |  SELECT n,
      |    CAST(r2 AS DOUBLE) / 4.0
      |      - CAST(g AS DOUBLE) * CAST(g AS DOUBLE)
      |        / (CAST(n AS DOUBLE) * 4.0) AS ssr,
      |    (CAST(c1 AS DOUBLE) * CAST(c1 AS DOUBLE)
      |      + CAST(c2 AS DOUBLE) * CAST(c2 AS DOUBLE)
      |      + CAST(c3 AS DOUBLE) * CAST(c3 AS DOUBLE)
      |      + CAST(c4 AS DOUBLE) * CAST(c4 AS DOUBLE)) / CAST(n AS DOUBLE)
      |      - CAST(g AS DOUBLE) * CAST(g AS DOUBLE)
      |        / (CAST(n AS DOUBLE) * 4.0) AS ssc,
      |    CAST(q AS DOUBLE)
      |      - CAST(g AS DOUBLE) * CAST(g AS DOUBLE)
      |        / (CAST(n AS DOUBLE) * 4.0) AS sst
      |  FROM a),
      |ms AS (
      |  SELECT n,
      |    ssr / (CAST(n AS DOUBLE) - 1.0) AS msr,
      |    ssc / 3.0 AS msc,
      |    (sst - ssr - ssc) / ((CAST(n AS DOUBLE) - 1.0) * 3.0) AS mse
      |  FROM s)
      |SELECT n AS n_docs,
      |  CASE WHEN n < 2 OR msr <= 0 THEN NULL
      |    ELSE FLOOR(msr * 1e6 + 0.5) / 1e6 END AS ms_rows,
      |  CASE WHEN n < 2 OR msr <= 0 THEN NULL
      |    ELSE FLOOR(msc * 1e6 + 0.5) / 1e6 END AS ms_cols,
      |  CASE WHEN n < 2 OR msr <= 0 THEN NULL
      |    ELSE FLOOR(mse * 1e6 + 0.5) / 1e6 END AS ms_err,
      |  CASE WHEN n < 2 OR msr <= 0 THEN NULL
      |    ELSE FLOOR((msr - mse)
      |      / (msr + 3.0 * mse + 4.0 * (msc - mse) / CAST(n AS DOUBLE))
      |      * 1e6 + 0.5) / 1e6 END AS icc_2_1,
      |  CASE WHEN n < 2 OR msr <= 0 THEN NULL
      |    ELSE FLOOR((msr - mse)
      |      / (msr + (msc - mse) / CAST(n AS DOUBLE)) * 1e6 + 0.5) / 1e6
      |    END AS icc_2_k,
      |  CASE WHEN n < 2 OR msr <= 0 THEN NULL
      |    ELSE FLOOR((msr - mse) / (msr + 3.0 * mse) * 1e6 + 0.5) / 1e6
      |    END AS icc_3_1,
      |  CASE WHEN n < 2 OR msr <= 0 THEN NULL
      |    ELSE FLOOR((msr - mse) / msr * 1e6 + 0.5) / 1e6 END AS icc_3_k
      |FROM ms""".stripMargin

  /** L309 Bland–Altman agreement analysis ([PK] Bland & Altman 1986)
    * — THE method-comparison readout correlation gets wrong (two
    * systems can correlate at 0.99 and still disagree by a constant
    * bias): two measurements of daily business volume — order-dated
    * revenue (orders) vs ship-dated gross revenue (lineitem) — give
    * per-day differences; published: the bias (mean difference), the
    * SD of differences, the 95% limits of agreement bias ± 1.96·SD,
    * and the observed fraction outside them (≈ 4.5% at both SFs —
    * the nominal-coverage honesty check, asserted in the spec).
    *
    * Parity: daily sums exact cents; Σd and Σd² exact
    * DECIMAL(38)/HUGEINT; bias/SD/LoA one fixed double chain with
    * one terminal sqrt; the outside-count compares exact ints
    * against the quantized LoA bounds (4dp — both engines compare
    * identical doubles), so the count is integer-deterministic.
    *
    * Scale: two fact-scan day rollups, one broadcast-joinable
    * ≤|days| frame, ONE moment agg + one bounded recount. 1 row. */
  def q374BlandAltman(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
        .as("va"))
    val b = Tables.lineitem(s, dir)
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
        .as("vb"))
    val dec = "decimal(38,0)"
    val diffs = a.join(b, Seq("day"))
      .select((col("va") - col("vb")).as("d"))
    val m = diffs.agg(count(lit(1)).as("n"),
      sum(col("d").cast(dec)).as("sd1"),
      sum((col("d") * col("d")).cast(dec)).as("sd2"))
    def dd(c: String) = col(c).cast("double")
    val n = dd("n")
    val bias = dd("sd1") / greatest(n, lit(1e-300))
    val sdev = sqrt(greatest((n * dd("sd2") - dd("sd1") * dd("sd1")) /
      greatest(n * (n - 1.0), lit(1e-300)), lit(0.0)))
    def rnd4(c: Column): Column =
      (floor(c * 1e4 + 0.5).cast("long").cast("double") / 1e4) + 0.0
    val stats = m.select(col("n").as("n_days"),
      rnd4(bias).as("bias_cents"), rnd4(sdev).as("sd_cents"),
      rnd4(bias - lit(1.96) * sdev).as("loa_lo"),
      rnd4(bias + lit(1.96) * sdev).as("loa_hi"))
    val out = diffs.crossJoin(broadcast(stats))
      .groupBy("n_days", "bias_cents", "sd_cents", "loa_lo", "loa_hi")
      .agg(sum(when(col("d").cast("double") < col("loa_lo") ||
        col("d").cast("double") > col("loa_hi"), 1L).otherwise(0L))
        .as("n_outside"))
    val bad = col("n_days") < 10L || col("sd_cents") <= 0.0
    out.select(col("n_days"),
      when(bad, lit(null).cast("double")).otherwise(col("bias_cents"))
        .as("bias_cents"),
      when(bad, lit(null).cast("double")).otherwise(col("sd_cents"))
        .as("sd_cents"),
      when(bad, lit(null).cast("double")).otherwise(col("loa_lo"))
        .as("loa_lo"),
      when(bad, lit(null).cast("double")).otherwise(col("loa_hi"))
        .as("loa_hi"),
      when(bad, lit(null).cast("long")).otherwise(col("n_outside"))
        .as("n_outside"),
      when(bad, lit(null).cast("double"))
        .otherwise((floor(col("n_outside").cast("double") /
          col("n_days").cast("double") * 1e4 + 0.5).cast("long")
          .cast("double") / 1e4) + 0.0).as("pct_outside"))
  }

  val q374BlandAltmanSql: String =
    """WITH a AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS va
      |  FROM orders GROUP BY 1),
      |b AS (
      |  SELECT CAST(l_shipdate AS DATE) AS day,
      |    CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS vb
      |  FROM lineitem GROUP BY 1),
      |diffs AS (SELECT va - vb AS d FROM a JOIN b USING (day)),
      |m AS (
      |  SELECT COUNT(*) AS n, SUM(CAST(d AS HUGEINT)) AS sd1,
      |    SUM(CAST(d AS HUGEINT) * CAST(d AS HUGEINT)) AS sd2
      |  FROM diffs),
      |st AS (
      |  SELECT CAST(n AS BIGINT) AS n_days,
      |    FLOOR(CAST(sd1 AS DOUBLE) / GREATEST(CAST(n AS DOUBLE), 1e-300)
      |      * 1e4 + 0.5) / 1e4 + 0 AS bias_cents,
      |    FLOOR(sqrt(GREATEST((CAST(n AS DOUBLE) * CAST(sd2 AS DOUBLE)
      |        - CAST(sd1 AS DOUBLE) * CAST(sd1 AS DOUBLE))
      |      / GREATEST(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0),
      |        1e-300), 0.0)) * 1e4 + 0.5) / 1e4 + 0 AS sd_cents,
      |    FLOOR((CAST(sd1 AS DOUBLE) / GREATEST(CAST(n AS DOUBLE), 1e-300)
      |      - 1.96 * sqrt(GREATEST((CAST(n AS DOUBLE)
      |          * CAST(sd2 AS DOUBLE)
      |        - CAST(sd1 AS DOUBLE) * CAST(sd1 AS DOUBLE))
      |      / GREATEST(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0),
      |        1e-300), 0.0))) * 1e4 + 0.5) / 1e4 + 0 AS loa_lo,
      |    FLOOR((CAST(sd1 AS DOUBLE) / GREATEST(CAST(n AS DOUBLE), 1e-300)
      |      + 1.96 * sqrt(GREATEST((CAST(n AS DOUBLE)
      |          * CAST(sd2 AS DOUBLE)
      |        - CAST(sd1 AS DOUBLE) * CAST(sd1 AS DOUBLE))
      |      / GREATEST(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0),
      |        1e-300), 0.0))) * 1e4 + 0.5) / 1e4 + 0 AS loa_hi
      |  FROM m),
      |cnt AS (
      |  SELECT n_days, bias_cents, sd_cents, loa_lo, loa_hi,
      |    CAST(SUM(CASE WHEN CAST(d AS DOUBLE) < loa_lo
      |      OR CAST(d AS DOUBLE) > loa_hi THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_outside
      |  FROM diffs CROSS JOIN st
      |  GROUP BY n_days, bias_cents, sd_cents, loa_lo, loa_hi)
      |SELECT n_days,
      |  CASE WHEN n_days < 10 OR sd_cents <= 0.0 THEN NULL
      |    ELSE bias_cents END AS bias_cents,
      |  CASE WHEN n_days < 10 OR sd_cents <= 0.0 THEN NULL
      |    ELSE sd_cents END AS sd_cents,
      |  CASE WHEN n_days < 10 OR sd_cents <= 0.0 THEN NULL
      |    ELSE loa_lo END AS loa_lo,
      |  CASE WHEN n_days < 10 OR sd_cents <= 0.0 THEN NULL
      |    ELSE loa_hi END AS loa_hi,
      |  CASE WHEN n_days < 10 OR sd_cents <= 0.0 THEN NULL
      |    ELSE n_outside END AS n_outside,
      |  CASE WHEN n_days < 10 OR sd_cents <= 0.0 THEN NULL
      |    ELSE FLOOR(CAST(n_outside AS DOUBLE) / n_days * 1e4 + 0.5)
      |      / 1e4 + 0 END AS pct_outside
      |FROM cnt""".stripMargin

  /** L310 weighted-kappa ladder ([PK] Cohen 1968) — ordinal
    * agreement where the PENALTY for a disagreement grows with its
    * distance: two tier assignments of every document (terciles by
    * character count vs terciles by token count — two real proxies
    * for "document size class") cross-tabulated 3×3; published
    * beside each other: unweighted κ (all disagreements equal),
    * linear-weight κ (1 − |i−j|/2), quadratic-weight κ
    * (1 − (i−j)²/4). Near-diagonal disagreement makes the ladder
    * strictly increase (0.940 < 0.955 < 0.970 at sf0.001) — the
    * "weighting matters" readout for ordinal labels.
    *
    * Parity: every κ is an EXACT integer ratio — scaling by 4n²
    * (quadratic), 2n² (linear), n² (unweighted) clears all
    * denominators: κ_q = (n·P_q − E_q)/(4n² − E_q) with
    * P_q = Σn_ij(4−(i−j)²), E_q = Σr_i·c_j(4−(i−j)²) all int64 —
    * one IEEE division each, 6dp. NTILE(3) over the deterministic
    * (size, doc_id) order is identical in both engines (same
    * larger-first remainder rule).
    *
    * Scale: two rank windows over the corpus (at 100 TB: the
    * RangedNtile machinery — L35), a 9-cell census, 1-row output. */
  def q375WeightedKappa(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val t = d.select(col("doc_id"),
      ntile(3).over(Window.orderBy(col("n_chars"), col("doc_id")))
        .cast("long").as("ra"),
      ntile(3).over(Window.orderBy(size(split(col("text"), " ")),
        col("doc_id"))).cast("long").as("rb"))
    val cells = t.groupBy("ra", "rb").agg(count(lit(1)).as("c"))
    val m = cells.agg(
      sum(col("c")).as("n"),
      sum(when(col("ra") === col("rb"), col("c")).otherwise(0L))
        .as("p0"),
      sum(col("c") * (lit(2L) - abs(col("ra") - col("rb")))).as("pl"),
      sum(col("c") * (lit(4L) -
        (col("ra") - col("rb")) * (col("ra") - col("rb")))).as("pq"))
    // chance mass needs the full r_i x c_j cross — 3x3, broadcast-tiny
    val rr = cells.groupBy("ra").agg(sum(col("c")).as("r"))
    val ccb = cells.groupBy("rb").agg(sum(col("c")).as("cc"))
    val cross = rr.crossJoin(broadcast(ccb))
      .agg(sum(when(col("ra") === col("rb"), col("r") * col("cc"))
          .otherwise(0L)).as("e0"),
        sum(col("r") * col("cc") *
          (lit(2L) - abs(col("ra") - col("rb")))).as("el"),
        sum(col("r") * col("cc") * (lit(4L) -
          (col("ra") - col("rb")) * (col("ra") - col("rb")))).as("eq"))
    def dd(c: Column) = c.cast("double")
    def rnd6(c: Column): Column =
      (floor(c * 1e6 + 0.5).cast("long").cast("double") / 1e6) + 0.0
    val j = m.crossJoin(broadcast(cross))
    val n = col("n")
    val bad = n < 10L || (n * n - col("e0")) === 0L ||
      (lit(2L) * n * n - col("el")) === 0L ||
      (lit(4L) * n * n - col("eq")) === 0L
    def guard(c: Column) = when(bad, lit(null).cast("double"))
      .otherwise(c)
    j.select(col("n").as("n_docs"),
      guard(rnd6(dd(col("p0")) / greatest(dd(n), lit(1e-300))))
        .as("po"),
      guard(rnd6(dd(n * col("p0") - col("e0")) /
        greatest(dd(n * n - col("e0")), lit(1e-300)))).as("kappa"),
      guard(rnd6(dd(n * col("pl") - col("el")) /
        greatest(dd(lit(2L) * n * n - col("el")), lit(1e-300))))
        .as("kappa_lin"),
      guard(rnd6(dd(n * col("pq") - col("eq")) /
        greatest(dd(lit(4L) * n * n - col("eq")), lit(1e-300))))
        .as("kappa_quad"))
  }

  val q375WeightedKappaSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(NTILE(3) OVER (ORDER BY n_chars, doc_id) AS BIGINT)
      |      AS ra,
      |    CAST(NTILE(3) OVER (ORDER BY len(string_split(text, ' ')),
      |      doc_id) AS BIGINT) AS rb
      |  FROM documents),
      |cells AS (SELECT ra, rb, COUNT(*) AS c FROM t GROUP BY ra, rb),
      |m AS (
      |  SELECT CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN ra = rb THEN c ELSE 0 END) AS BIGINT)
      |      AS p0,
      |    CAST(SUM(c * (2 - ABS(ra - rb))) AS BIGINT) AS pl,
      |    CAST(SUM(c * (4 - (ra - rb) * (ra - rb))) AS BIGINT) AS pq
      |  FROM cells),
      |rr AS (SELECT ra, CAST(SUM(c) AS BIGINT) AS r FROM cells
      |  GROUP BY ra),
      |ccb AS (SELECT rb, CAST(SUM(c) AS BIGINT) AS cc FROM cells
      |  GROUP BY rb),
      |cross_t AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN ra = rb THEN r * cc ELSE 0 END) AS BIGINT)
      |      AS e0,
      |    CAST(SUM(r * cc * (2 - ABS(ra - rb))) AS BIGINT) AS el,
      |    CAST(SUM(r * cc * (4 - (ra - rb) * (ra - rb))) AS BIGINT)
      |      AS eq
      |  FROM rr CROSS JOIN ccb),
      |f AS (
      |  SELECT n, p0, pl, pq, e0, el, eq,
      |    (n < 10 OR n * n - e0 = 0 OR 2 * n * n - el = 0
      |      OR 4 * n * n - eq = 0) AS bad
      |  FROM m CROSS JOIN cross_t)
      |SELECT n AS n_docs,
      |  CASE WHEN bad THEN NULL ELSE
      |    FLOOR(CAST(p0 AS DOUBLE) / GREATEST(CAST(n AS DOUBLE), 1e-300)
      |      * 1e6 + 0.5) / 1e6 + 0 END AS po,
      |  CASE WHEN bad THEN NULL ELSE
      |    FLOOR(CAST(n * p0 - e0 AS DOUBLE)
      |      / GREATEST(CAST(n * n - e0 AS DOUBLE), 1e-300) * 1e6 + 0.5)
      |      / 1e6 + 0 END AS kappa,
      |  CASE WHEN bad THEN NULL ELSE
      |    FLOOR(CAST(n * pl - el AS DOUBLE)
      |      / GREATEST(CAST(2 * n * n - el AS DOUBLE), 1e-300)
      |      * 1e6 + 0.5) / 1e6 + 0 END AS kappa_lin,
      |  CASE WHEN bad THEN NULL ELSE
      |    FLOOR(CAST(n * pq - eq AS DOUBLE)
      |      / GREATEST(CAST(4 * n * n - eq AS DOUBLE), 1e-300)
      |      * 1e6 + 0.5) / 1e6 + 0 END AS kappa_quad
      |FROM f""".stripMargin
}
