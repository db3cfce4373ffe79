package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series robustness statistics over the daily order-revenue
  * series (L139–L141): exact rolling median (outlier-immune smoothing,
  * the robust counterpart to q115's EWMA / q143's Holt), Theil–Sen
  * slope (the robust trend estimate — median of all pairwise slopes,
  * 29.3% breakdown point vs least-squares' zero), and the exact
  * autocorrelation function (seasonality detection, the dependence
  * diagnostic behind every forecasting model choice).
  *
  * Shared base: one `orders` scan → per-day int64 revenue sums (whole
  * dollars — exact, and products of two daily values stay far inside
  * int64; cross-engine sums that could exceed int64 at sf ≫ 1 ride
  * DECIMAL(38,0)). The fixture's date range is fixed (~2,400 days at
  * every SF), so the day-level series — and therefore q206's pairwise
  * O(days²) and q208's lag joins — are CONSTANT in scale factor: only
  * the one map-side day aggregation grows with the data.
  *
  * Parity discipline: every ordering/median decision happens on exact
  * integers (or on doubles produced by one identical chain with exact
  * int tie-breaks); float division appears only in final displayed
  * values.
  */
object SeriesStats {

  /** (day date, rev int64 whole dollars) — the shared series. */
  private def daily(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))

  private val dailySql: String =
    """SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS BIGINT)
      |      AS rev
      |  FROM orders GROUP BY 1""".stripMargin

  /** L139 exact rolling median: 7-day (6 preceding + current) median of
    * daily revenue. Implemented as collect_list over the row frame +
    * sort_array + exact middle selection — k is a small constant, so
    * the per-row cost is O(k log k) inside one keyed window pass, and
    * the even-count case averages the two int64 middles exactly like
    * DuckDB's interpolating median ((a+b)/2 in double — exact for
    * values < 2⁵²). */
  def q205RollingMedian(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("day").rowsBetween(-6, 0)
    // single global series (~2,400 rows) — the one place a
    // non-partitioned window is the honest plan; at fact scale the same
    // op runs per key (q115's shape) or through RangedNtile machinery
    daily(s, dir)
      .withColumn("ws", sort_array(collect_list(col("rev")).over(w)))
      .withColumn("k", size(col("ws")))
      .select(col("day"), col("rev"),
        when(col("k") % 2 === 1,
          element_at(col("ws"),
            expr("cast((k + 1) div 2 as int)")).cast("double"))
          .otherwise(
            (element_at(col("ws"), expr("cast(k div 2 as int)")) +
              element_at(col("ws"), expr("cast(k div 2 + 1 as int)"))) / 2.0)
          .as("med7"))
      .orderBy("day")
  }

  val q205RollingMedianSql: String =
    s"""WITH d AS ($dailySql)
       |SELECT day, rev,
       |  median(rev) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING
       |    AND CURRENT ROW) AS med7
       |FROM d ORDER BY day""".stripMargin

  /** L140 Theil–Sen slope over the trailing 365 days: the median of
    * all C(365, 2) ≈ 66k pairwise slopes (dy/dx, dollars per day) —
    * the robust trend line (Theil 1950, Sen 1968 [PK], 29.3% breakdown
    * vs least-squares' 0%). Pair slopes are one double division of two
    * exact ints; the median rank is decided on (slope, dy, dx) — the
    * int tie-break keeps the order identical across engines even where
    * two distinct rationals collide in double. The 365-day window
    * bounds the pair build to a scale-CONSTANT 66k rows (localCheck-
    * pointed so the one all-pairs join materializes once and the
    * rank/count consumers read the cut); the only SF-growing stage is
    * the day aggregation. */
  def q206TheilSen(s: SparkSession, dir: String): DataFrame = {
    val d = daily(s, dir)
      .select(datediff(col("day"), lit("1995-01-01")).cast("long").as("t"),
        col("rev"))
    val recent = d
      .crossJoin(broadcast(d.agg(max(col("t")).as("tmax"))))
      .filter(col("t") > col("tmax") - 365)
      .select(col("t"), col("rev"))
    val pairs = recent.as("a")
      .join(broadcast(recent.as("b")), col("a.t") < col("b.t"))
      .select((col("b.rev") - col("a.rev")).as("dy"),
        (col("b.t") - col("a.t")).as("dx"))
      .withColumn("slope",
        col("dy").cast("double") / col("dx").cast("double"))
      // LAZY: plan-only consumers (Plans.scala, PlanShapeSpec) must not
      // execute the pair build at DataFrame-construction time, and the
      // block still materializes once on first action (Triangles rule).
      .localCheckpoint(eager = false)
    val w = Window.orderBy(col("slope"), col("dy"), col("dx"))
    pairs
      .withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(pairs.agg(count(lit(1)).as("n"))))
      .filter(
        when(col("n") % 2 === 1, col("rn") === (col("n") + 1) / 2)
          .otherwise(col("rn") === col("n") / 2 ||
            col("rn") === col("n") / 2 + 1))
      .agg(max(col("n")).as("n_pairs"),
        (round(avg(col("slope")), 6) + 0.0).as("sen_slope"))
  }

  val q206TheilSenSql: String =
    s"""WITH d AS ($dailySql),
       |dd AS (SELECT CAST(date_diff('day', DATE '1995-01-01', day)
       |    AS BIGINT) AS t, rev FROM d),
       |rc AS (SELECT t, rev FROM dd
       |  WHERE t > (SELECT MAX(t) FROM dd) - 365),
       |p AS (
       |  SELECT b.rev - a.rev AS dy, b.t - a.t AS dx,
       |    CAST(b.rev - a.rev AS DOUBLE) / CAST(b.t - a.t AS DOUBLE)
       |      AS slope
       |  FROM rc a JOIN rc b ON a.t < b.t),
       |r AS (
       |  SELECT slope,
       |    ROW_NUMBER() OVER (ORDER BY slope, dy, dx) AS rn,
       |    COUNT(*) OVER () AS n
       |  FROM p)
       |SELECT MAX(n) AS n_pairs, ROUND(AVG(slope), 6) + 0 AS sen_slope
       |FROM r
       |WHERE CASE WHEN n % 2 = 1 THEN rn = (n + 1) // 2
       |  ELSE rn = n // 2 OR rn = n // 2 + 1 END""".stripMargin

  /** L141 exact autocorrelation function, lags 1–7: Pearson r of the
    * daily series against itself shifted k days (missing days make
    * pairs by ROW shift — lag over the day-ordered series, the
    * convention statsmodels' acf(adjusted) matches for gapless daily
    * data). The five moment sums ride DECIMAL(38,0) end-to-end — terms
    * are cast BEFORE multiplying, so neither the per-term product nor
    * the sum can overflow while values fit 38 digits — and the r chain
    * is one identical double expression on both engines, 6dp
    * displayed. Lag shifts are row windows over the scale-constant
    * series. */
  def q208Acf(s: SparkSession, dir: String): DataFrame = {
    val d = daily(s, dir)
    val w = Window.orderBy("day")
    // all 7 lags share ONE window spec → one sort, one exchange (the
    // per-lag union form paid 7 re-sorts); stack unpivots to rows
    val withLags = d.select(
      (col("rev") +: (1 to 7).map(k =>
        lag(col("rev"), k).over(w).as(s"x$k"))): _*)
    val stackExpr = (1 to 7)
      .map(k => s"${k}L, x$k").mkString("stack(7, ", ", ", ")")
    val lags = withLags
      .select(col("rev").as("y"), expr(s"$stackExpr as (lag, x)"))
      .filter(col("x").isNotNull)
    // cast to decimal BEFORE multiplying: a daily total past ~$3B would
    // overflow an int64 per-term product; (38,0)x(38,0) stays exact for
    // any value that fits 38 digits
    val dec = "decimal(38,0)"
    lags.groupBy("lag")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"))
      .select(col("lag"), col("n"),
        // fuzz hardening (r12): a single-pair lag or constant series
        // zeroes a variance factor — correlation undefined, not a crash
        when(col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double") <= 0 ||
            col("n").cast("double") * col("syy").cast("double") -
            col("sy").cast("double") * col("sy").cast("double") <= 0,
          lit(null).cast("double"))
        .otherwise(round(
          (col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (sqrt(col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
              sqrt(col("n").cast("double") * col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double"))), 6)
          + 0.0).as("acf"))
      .orderBy("lag")
  }

  /** (day, rev int64, cnt int64) — the two-series daily base for the
    * dependence diagnostics (q211/q213). */
  private def daily2(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"),
        count(lit(1)).as("cnt"))

  private val daily2Sql: String =
    """SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS BIGINT)
      |      AS rev,
      |    COUNT(*) AS cnt
      |  FROM orders GROUP BY 1""".stripMargin

  /** L143 Kendall rank correlation (τ-b) between daily revenue and
    * daily order count over the trailing 365 days — the robust
    * dependence measure (Kendall 1938 [PK]; Spearman q177's rank-ρ
    * cousin, but defined directly on concordant/discordant PAIRS, so
    * ties get the exact τ-b correction instead of a rank fudge).
    *
    * Every count is an exact integer decided by int64 sign tests
    * (dx·dy products of bounded daily values — no float enters until
    * the final τ); n₁ = Σ C(tx,2) and n₂ = Σ C(ty,2) fall out of the
    * pair build as the x-tied / y-tied pair counts, no separate tie
    * census needed. τ-b = (nc − nd)/√((n0 − n1)(n0 − n2)) is one
    * identical double chain, 6dp.
    *
    * Scale: the q206 shape — the C(365,2) ≈ 66k pair build is CONSTANT
    * in SF (the date range is fixture-fixed); only the day aggregation
    * scans fact data. The pair BNLJ sits under the same LAZY
    * localCheckpoint as q206's (no job at plan-build time), so the one
    * visible plan is a single exact aggregate. */
  def q211KendallTau(s: SparkSession, dir: String): DataFrame = {
    val d = daily2(s, dir)
      .select(datediff(col("day"), lit("1995-01-01")).cast("long").as("t"),
        col("rev"), col("cnt"))
    val recent = d
      .crossJoin(broadcast(d.agg(max(col("t")).as("tmax"))))
      .filter(col("t") > col("tmax") - 365)
      .select(col("t"), col("rev"), col("cnt"))
    val pairs = recent.as("a")
      .join(broadcast(recent.as("b")), col("a.t") < col("b.t"))
      .select((col("b.rev") - col("a.rev")).as("dx"),
        (col("b.cnt") - col("a.cnt")).as("dy"))
      .localCheckpoint(eager = false)
    val agg = pairs.agg(
      count(lit(1)).as("n0"),
      sum(when(col("dx") * col("dy") > 0, 1L).otherwise(0L)).as("nc"),
      sum(when(col("dx") * col("dy") < 0, 1L).otherwise(0L)).as("nd"),
      sum(when(col("dx") === 0, 1L).otherwise(0L)).as("ties_x"),
      sum(when(col("dy") === 0, 1L).otherwise(0L)).as("ties_y"))
    // fuzz hardening (r12): a window where one variable is ALL ties
    // zeroes a denominator factor — tau-b undefined, not a crash
    agg.select(col("n0").as("n_pairs"), col("nc"), col("nd"),
      col("ties_x"), col("ties_y"),
      when(col("n0") - col("ties_x") === 0 ||
          col("n0") - col("ties_y") === 0, lit(null).cast("double"))
        .otherwise(round((col("nc") - col("nd")).cast("double") /
          sqrt((col("n0") - col("ties_x")).cast("double") *
            (col("n0") - col("ties_y")).cast("double")), 6) + 0.0)
        .as("tau_b"))
  }

  val q211KendallTauSql: String =
    s"""WITH d AS ($daily2Sql),
       |dd AS (SELECT CAST(date_diff('day', DATE '1995-01-01', day)
       |    AS BIGINT) AS t, rev, cnt FROM d),
       |rc AS (SELECT t, rev, cnt FROM dd
       |  WHERE t > (SELECT MAX(t) FROM dd) - 365),
       |p AS (
       |  SELECT b.rev - a.rev AS dx, b.cnt - a.cnt AS dy
       |  FROM rc a JOIN rc b ON a.t < b.t),
       |g AS (
       |  SELECT COUNT(*) AS n0,
       |    CAST(SUM(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
       |    CAST(SUM(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS nd,
       |    CAST(SUM(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_x,
       |    CAST(SUM(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_y
       |  FROM p)
       |SELECT n0 AS n_pairs, nc, nd, ties_x, ties_y,
       |  CASE WHEN n0 - ties_x = 0 OR n0 - ties_y = 0 THEN NULL ELSE
       |    ROUND(CAST(nc - nd AS DOUBLE) /
       |      SQRT(CAST(n0 - ties_x AS DOUBLE) * CAST(n0 - ties_y AS DOUBLE)),
       |      6) + 0 END AS tau_b
       |FROM g""".stripMargin

  /** L144 day-of-week seasonal profile: the multiplicative seasonal
    * index (dow mean ÷ grand mean) over the daily revenue series — the
    * first factor of every classical seasonal decomposition, and the
    * denominator a seasonal-adjustment divides by. ISO day numbering
    * (1 = Monday) on both engines.
    *
    * Parity: per-dow sums and counts are exact int64; mean and index
    * are single double chains (4dp / 6dp). The grand totals ride a
    * window over the ≤7-row census, never a second fact scan.
    *
    * Scale: one map-side-combinable day agg (the q205 base) → ≤7-group
    * census; everything downstream is census-sized. */
  def q212DowSeasonality(s: SparkSession, dir: String): DataFrame = {
    val g = daily(s, dir)
      .select((weekday(col("day")) + 1).as("isodow"), col("rev"))
      .groupBy("isodow")
      .agg(count(lit(1)).as("n_days"), sum(col("rev")).as("sr"))
    val w = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    g.withColumn("tot_sr", sum(col("sr")).over(w))
      .withColumn("tot_n", sum(col("n_days")).over(w))
      .select(col("isodow"), col("n_days"),
        (round(col("sr").cast("double") / col("n_days"), 4) + 0.0)
          .as("mean_rev"),
        (round((col("sr").cast("double") / col("n_days")) /
          (col("tot_sr").cast("double") / col("tot_n")), 6) + 0.0)
          .as("seasonal_idx"))
      .orderBy("isodow")
  }

  val q212DowSeasonalitySql: String =
    s"""WITH d AS ($dailySql),
       |g AS (
       |  SELECT CAST(date_part('isodow', day) AS INT) AS isodow,
       |    COUNT(*) AS n_days,
       |    CAST(SUM(rev) AS BIGINT) AS sr
       |  FROM d GROUP BY 1)
       |SELECT isodow, n_days,
       |  ROUND(CAST(sr AS DOUBLE) / n_days, 4) + 0 AS mean_rev,
       |  ROUND((CAST(sr AS DOUBLE) / n_days) /
       |    (CAST(SUM(sr) OVER () AS DOUBLE) / SUM(n_days) OVER ()), 6) + 0
       |    AS seasonal_idx
       |FROM g ORDER BY isodow""".stripMargin

  /** L145 cross-correlation function, lags 0–7: Pearson r of daily
    * revenue against the daily ORDER COUNT shifted k days — the
    * lead/lag dependence between two series (does volume lead
    * revenue?), the two-series generalization of q208's ACF and the
    * diagnostic behind transfer-function / leading-indicator models.
    * Same parity discipline as q208: all five moment sums ride
    * DECIMAL(38,0) with casts BEFORE the multiply, one identical
    * double r chain, 6dp. Lag shifts are row windows over the
    * scale-constant day series; all 8 lags share one window sort. */
  def q213CrossCorr(s: SparkSession, dir: String): DataFrame = {
    val d = daily2(s, dir)
    val w = Window.orderBy("day")
    val withLags = d.select(
      (col("rev") +: (0 to 7).map(k =>
        lag(col("cnt"), k).over(w).as(s"x$k"))): _*)
    val stackExpr = (0 to 7)
      .map(k => s"${k}L, x$k").mkString("stack(8, ", ", ", ")")
    val lags = withLags
      .select(col("rev").as("y"), expr(s"$stackExpr as (lag, x)"))
      .filter(col("x").isNotNull)
    val dec = "decimal(38,0)"
    lags.groupBy("lag")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"))
      .select(col("lag"), col("n"),
        // fuzz hardening (r12): a single-pair lag or constant series
        // zeroes a variance factor — correlation undefined, not a crash
        when(col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double") <= 0 ||
            col("n").cast("double") * col("syy").cast("double") -
            col("sy").cast("double") * col("sy").cast("double") <= 0,
          lit(null).cast("double"))
        .otherwise(round(
          (col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (sqrt(col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
              sqrt(col("n").cast("double") * col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double"))), 6)
          + 0.0).as("ccf"))
      .orderBy("lag")
  }

  val q213CrossCorrSql: String =
    s"""WITH d AS ($daily2Sql),
       |lg AS (
       |  SELECT k.lag, LAG(cnt, k.lag) OVER (PARTITION BY k.lag
       |      ORDER BY day) AS x, rev AS y
       |  FROM d CROSS JOIN (SELECT unnest(range(0, 8)) AS lag) k),
       |m AS (
       |  SELECT lag, COUNT(*) AS n,
       |    CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
       |    CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
       |    CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy,
       |    CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
       |    CAST(SUM(y * y) AS DECIMAL(38,0)) AS syy
       |  FROM lg WHERE x IS NOT NULL GROUP BY lag)
       |SELECT lag, n,
       |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <= 0
       |      OR CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <= 0 THEN NULL
       |  ELSE ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) + 0 END
       |    AS ccf
       |FROM m ORDER BY lag""".stripMargin

  /** L153 partial autocorrelation (PACF), lags 1–3, via the
    * Durbin–Levinson recursion [PK: Durbin 1960] applied to the q208
    * lag-Pearson ACF values: φ₁₁ = r₁; φ₂₂ = (r₂−r₁²)/(1−r₁²);
    * φ₃₃ from the level-2 coefficients — the AR-order diagnostic (an
    * AR(p) series cuts off after lag p) that complements q208's raw
    * dependence readout.
    *
    * Parity: the rₖ are the same DECIMAL(38,0)-moment double chains as
    * q208 (UNROUNDED — rounding first would feed the recursion
    * different inputs than the classical definition); the recursion is
    * a fixed unrolled double chain, identical text on both engines,
    * 6dp displayed. Scale: identical cost to q208 — one shared window
    * sort over the scale-constant day series, ≤3-row census algebra. */
  def q219Pacf(s: SparkSession, dir: String): DataFrame = {
    val d = daily(s, dir)
    val w = Window.orderBy("day")
    val withLags = d.select(
      (col("rev") +: (1 to 3).map(k =>
        lag(col("rev"), k).over(w).as(s"x$k"))): _*)
    val lags = withLags
      .select(col("rev").as("y"),
        expr("stack(3, 1L, x1, 2L, x2, 3L, x3) as (lag, x)"))
      .filter(col("x").isNotNull)
    val dec = "decimal(38,0)"
    val m = lags.groupBy("lag")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"))
    val r = (col("n").cast("double") * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")) /
      (sqrt(col("n").cast("double") * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")) *
        sqrt(col("n").cast("double") * col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double")))
    val piv = m.withColumn("r", r).agg(
      max(when(col("lag") === 1, col("r"))).as("r1"),
      max(when(col("lag") === 2, col("r"))).as("r2"),
      max(when(col("lag") === 3, col("r"))).as("r3"))
    val p = piv
      .withColumn("p22",
        (col("r2") - col("r1") * col("r1")) /
          (lit(1.0) - col("r1") * col("r1")))
      .withColumn("p21", col("r1") - col("p22") * col("r1"))
      .withColumn("p33",
        (col("r3") - col("p21") * col("r2") - col("p22") * col("r1")) /
          (lit(1.0) - col("p21") * col("r1") - col("p22") * col("r2")))
    p.select(expr("""stack(3,
        |  1, round(r1, 6) + 0.0d,
        |  2, round(p22, 6) + 0.0d,
        |  3, round(p33, 6) + 0.0d) as (lag, pacf)""".stripMargin))
      .orderBy("lag")
  }

  val q219PacfSql: String =
    s"""WITH d AS ($dailySql),
       |lg AS (
       |  SELECT k.lag, LAG(rev, k.lag) OVER (PARTITION BY k.lag
       |      ORDER BY day) AS x, rev AS y
       |  FROM d CROSS JOIN (SELECT unnest(range(1, 4)) AS lag) k),
       |m AS (
       |  SELECT lag, COUNT(*) AS n,
       |    CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
       |    CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
       |    CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy,
       |    CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
       |    CAST(SUM(y * y) AS DECIMAL(38,0)) AS syy
       |  FROM lg WHERE x IS NOT NULL GROUP BY lag),
       |rr AS (
       |  SELECT lag,
       |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r
       |  FROM m),
       |piv AS (
       |  SELECT MAX(CASE WHEN lag = 1 THEN r END) AS r1,
       |    MAX(CASE WHEN lag = 2 THEN r END) AS r2,
       |    MAX(CASE WHEN lag = 3 THEN r END) AS r3
       |  FROM rr),
       |dl AS (
       |  SELECT r1, r2, r3,
       |    (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22
       |  FROM piv),
       |dl2 AS (
       |  SELECT r1, r2, r3, p22, r1 - p22 * r1 AS p21 FROM dl),
       |dl3 AS (
       |  SELECT r1, p22,
       |    (r3 - p21 * r2 - p22 * r1)
       |      / (1.0 - p21 * r1 - p22 * r2) AS p33
       |  FROM dl2)
       |SELECT lag, pacf FROM (
       |  SELECT 1 AS lag, ROUND(r1, 6) + 0 AS pacf FROM dl3
       |  UNION ALL SELECT 2, ROUND(p22, 6) + 0 FROM dl3
       |  UNION ALL SELECT 3, ROUND(p33, 6) + 0 FROM dl3)
       |ORDER BY lag""".stripMargin

  /** L154 Gumbel block-maxima fit + return levels [PK: Gumbel 1958]:
    * monthly maxima of the daily revenue series, method-of-moments
    * Gumbel parameters (β = s·√6/π, μ = m̄ − γβ) and the 12-month /
    * 120-month return levels μ − β·ln(−ln(1−1/T)) — the extreme-value
    * "what peak should we provision for" readout that q97/q214's
    * outlier screens (central-distribution tools) cannot answer.
    *
    * Parity: block maxima are exact int64; the two moment sums ride
    * DECIMAL(38,0)/HUGEINT; mean/sd/β/μ/levels are one fixed double
    * chain with shared literals (√6/π, Euler γ), 4dp. The ln() calls
    * sit in the q196 accepted-residual class (1-ulp libm divergence
    * cannot flip a 4dp rounding away from a boundary).
    *
    * Scale: day agg → ≤|months| census (scale-constant); single-row
    * output. */
  def q221Gumbel(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val blocks = daily(s, dir)
      .groupBy(trunc(col("day"), "month").as("m"))
      .agg(max(col("rev")).as("mx"))
    val g = blocks.agg(count(lit(1)).as("n"),
      sum(col("mx").cast(dec)).as("s1"),
      sum(col("mx").cast(dec) * col("mx").cast(dec)).as("s2"))
    val nD = col("n").cast("double")
    val mean = col("s1").cast("double") / nD
    // fuzz hardening (r12): a single-month corpus leaves sd (and the
    // whole fit) undefined — null, not a divide-by-zero crash
    val sd = when(col("n") < 2, lit(null).cast("double"))
      .otherwise(sqrt((nD * col("s2").cast("double") -
        col("s1").cast("double") * col("s1").cast("double")) /
        (nD * (nD - 1.0))))
    val beta = sd * 0.7796968012336761
    val mu = mean - beta * 0.5772156649015329
    g.select(col("n").as("n_months"),
      (round(mean, 4) + 0.0).as("mean_max"),
      (round(sd, 4) + 0.0).as("sd_max"),
      (round(beta, 4) + 0.0).as("beta"),
      (round(mu, 4) + 0.0).as("mu"),
      (round(mu - beta * log(-log(lit(1.0) - 1.0 / 12.0)), 4) + 0.0)
        .as("rl_12m"),
      (round(mu - beta * log(-log(lit(1.0) - 1.0 / 120.0)), 4) + 0.0)
        .as("rl_120m"))
  }

  val q221GumbelSql: String =
    s"""WITH d AS ($dailySql),
       |b AS (
       |  SELECT date_trunc('month', day) AS m, CAST(MAX(rev) AS BIGINT) AS mx
       |  FROM d GROUP BY 1),
       |g AS (
       |  SELECT COUNT(*) AS n,
       |    CAST(SUM(mx) AS DECIMAL(38,0)) AS s1,
       |    CAST(SUM(mx * mx) AS DECIMAL(38,0)) AS s2
       |  FROM b),
       |c AS (
       |  SELECT n,
       |    CAST(s1 AS DOUBLE) / n AS mean,
       |    CASE WHEN n < 2 THEN NULL ELSE
       |      sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
       |          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
       |        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) END AS sd
       |  FROM g),
       |p AS (
       |  SELECT n, mean, sd, sd * 0.7796968012336761 AS beta,
       |    mean - sd * 0.7796968012336761 * 0.5772156649015329 AS mu
       |  FROM c)
       |SELECT n AS n_months,
       |  ROUND(mean, 4) + 0 AS mean_max,
       |  ROUND(sd, 4) + 0 AS sd_max,
       |  ROUND(beta, 4) + 0 AS beta,
       |  ROUND(mu, 4) + 0 AS mu,
       |  ROUND(mu - beta * ln(-ln(1.0 - 1.0 / 12.0)), 4) + 0 AS rl_12m,
       |  ROUND(mu - beta * ln(-ln(1.0 - 1.0 / 120.0)), 4) + 0 AS rl_120m
       |FROM p""".stripMargin

  /** L164 Durbin–Watson statistic (Durbin & Watson 1950 [PK]) on the
    * seasonally-adjusted daily revenue series: residuals e_t = rev_t −
    * dow-mean(rev) (the q212 seasonal factor removed), DW =
    * Σ(e_t−e_{t−1})²/Σe_t² — the serial-correlation diagnostic (DW ≈ 2
    * ⇒ independent residuals; → 0 positive, → 4 negative
    * autocorrelation) that says whether q208's raw-series dependence
    * survives deseasonalizing.
    *
    * Parity: residuals are pinned to int64 micro-units by one
    * identical double chain (rev − Σdow/ndow is a rational; the 1e6
    * quantum is the q196 class), so both quadratic sums ride
    * DECIMAL(38,0)/HUGEINT exactly; DW is one double division, 4dp.
    *
    * Scale: day agg → ≤7-row dow census broadcast back → one lag
    * window over the scale-constant series. */
  def q230DurbinWatson(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val d = daily(s, dir)
      .select(col("day"), col("rev"), (weekday(col("day")) + 1).as("dw"))
    val seas = d.groupBy("dw")
      .agg(sum(col("rev")).as("sr"), count(lit(1)).as("nd"))
    val e = d.join(broadcast(seas), "dw")
      .select(col("day"),
        floor((col("rev").cast("double") -
          col("sr").cast("double") / col("nd")) * 1e6 + 0.5)
          .cast("long").as("eq"))
    val w = Window.orderBy("day")
    val lagd = e.withColumn("ep", lag(col("eq"), 1).over(w))
    lagd.agg(
        count(lit(1)).as("n_days"),
        sum(col("eq").cast(dec) * col("eq").cast(dec)).as("see"),
        sum(when(col("ep").isNotNull,
          (col("eq") - col("ep")).cast(dec) * (col("eq") - col("ep")).cast(dec))
          .otherwise(lit(0L).cast(dec))).as("sdd"))
      .select(col("n_days"),
        (round(col("sdd").cast("double") / col("see").cast("double"), 4)
          + 0.0).as("dw_stat"))
  }

  val q230DurbinWatsonSql: String =
    s"""WITH d AS ($dailySql),
       |dd AS (
       |  SELECT day, rev, CAST(date_part('isodow', day) AS INT) AS dw
       |  FROM d),
       |seas AS (
       |  SELECT dw, CAST(SUM(rev) AS BIGINT) AS sr, COUNT(*) AS nd
       |  FROM dd GROUP BY dw),
       |e AS (
       |  SELECT day,
       |    CAST(FLOOR((CAST(rev AS DOUBLE) - CAST(sr AS DOUBLE) / nd)
       |      * 1e6 + 0.5) AS BIGINT) AS eq
       |  FROM dd JOIN seas USING (dw)),
       |lagd AS (
       |  SELECT eq, LAG(eq, 1) OVER (ORDER BY day) AS ep FROM e),
       |g AS (
       |  SELECT COUNT(*) AS n_days,
       |    SUM(CAST(eq AS HUGEINT) * eq) AS see,
       |    SUM(CASE WHEN ep IS NOT NULL
       |      THEN CAST(eq - ep AS HUGEINT) * (eq - ep)
       |      ELSE 0 END) AS sdd
       |  FROM lagd)
       |SELECT n_days,
       |  ROUND(CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE), 4) + 0 AS dw_stat
       |FROM g""".stripMargin

  val q208AcfSql: String =
    s"""WITH d AS ($dailySql),
       |lg AS (
       |  SELECT k.lag, LAG(rev, k.lag) OVER (PARTITION BY k.lag
       |      ORDER BY day) AS x, rev AS y
       |  FROM d CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) k),
       |m AS (
       |  SELECT lag, COUNT(*) AS n,
       |    CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
       |    CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
       |    CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy,
       |    CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
       |    CAST(SUM(y * y) AS DECIMAL(38,0)) AS syy
       |  FROM lg WHERE x IS NOT NULL GROUP BY lag)
       |SELECT lag, n,
       |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <= 0
       |      OR CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <= 0 THEN NULL
       |  ELSE ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) + 0 END
       |    AS acf
       |FROM m ORDER BY lag""".stripMargin

  /** L171 Wald–Wolfowitz runs test (Wald & Wolfowitz 1940 [PK]) on the
    * SIGNS of q230's seasonally-adjusted residuals: with n₊ positive
    * and n₋ negative residuals in R runs, E[R] = 2n₊n₋/n + 1 and
    * Var[R] = 2n₊n₋(2n₊n₋−n)/(n²(n−1)) — the distribution-free
    * independence check beside q230's DW (DW sees lag-1 magnitude
    * correlation; runs sees ANY sign clustering). Zero residuals count
    * as positive (eq ≥ 0 — the convention is pinned identically in
    * both engines; eq is an exact int so the decision can't straddle).
    *
    * Parity: residuals pin to int64 micro-units (q230 chain); run
    * boundaries, n₊/n₋, and R are integer decisions; z is one double
    * chain 4dp; p rides the A-S polynomial quantized 1e-8.
    *
    * Scale: the q230 shape — day agg, ≤7-row dow census broadcast,
    * one lag window over the scale-constant series, 1-row algebra. */
  def q237RunsTest(s: SparkSession, dir: String): DataFrame = {
    val d = daily(s, dir)
      .select(col("day"), col("rev"), (weekday(col("day")) + 1).as("dw"))
    val seas = d.groupBy("dw")
      .agg(sum(col("rev")).as("sr"), count(lit(1)).as("nd"))
    val e = d.join(broadcast(seas), "dw")
      .select(col("day"),
        when(floor((col("rev").cast("double") -
          col("sr").cast("double") / col("nd")) * 1e6 + 0.5)
          .cast("long") >= 0L, 1).otherwise(0).as("sgn"))
    val w = Window.orderBy("day")
    val lagd = e.withColumn("sp", lag(col("sgn"), 1).over(w))
    val agg = lagd.agg(
      count(lit(1)).as("n_days"),
      sum(col("sgn").cast("long")).as("n_pos"),
      sum(when(col("sp").isNotNull && col("sp") =!= col("sgn"), 1L)
        .otherwise(0L)).as("switches"))
    val nP = col("n_pos").cast("double")
    val nN = (col("n_days") - col("n_pos")).cast("double")
    val n = col("n_days").cast("double")
    val r = (col("switches") + 1).cast("double")
    val eR = lit(2.0) * nP * nN / n + lit(1.0)
    val vR = lit(2.0) * nP * nN * (lit(2.0) * nP * nN - n) /
      (n * n * (n - lit(1.0)))
    val z = (r - eR) / sqrt(vR)
    agg.select(col("n_days"), col("n_pos"),
      (col("n_days") - col("n_pos")).as("n_neg"),
      (col("switches") + 1).as("runs"),
      (round(z, 4) + 0.0).as("z_runs"),
      (floor(StatFns.asTwoSidedP(z) * 1e8 + 0.5) / 1e8).as("p"))
  }

  /** L185 Goodman–Kruskal γ and Somers' D (Goodman & Kruskal 1954,
    * Somers 1962 [PK]): the ordinal-association companions to q211's
    * τ-b over the same (day revenue, day order-count) pair set —
    * γ = (nc−nd)/(nc+nd) ignores ties entirely, Somers'
    * D_yx = (nc−nd)/(nc+nd+T_Y) penalizes ties in the DEPENDENT
    * variable only (the asymmetric "does x predict y" form), and the
    * three together bracket τ-b. Textbook convention (the r11 ADVICE
    * fix): T_Y counts pairs tied on Y but NOT also on X (and T_X the
    * mirror) — both-tied pairs belong to neither denominator. The
    * reported ties_x/ties_y columns stay the raw dx=0 / dy=0 totals
    * (q211's tie counts); ties_both makes the exclusion auditable.
    *
    * Parity: the q211 pair build verbatim (lazy-checkpointed constant
    * 66k pair set); nc/nd/tie counts exact int64; the ratios are one
    * double chain 6dp.
    *
    * Scale: the q206/q211 shape — only the day aggregation scans
    * fact data. */
  def q251OrdinalAssoc(s: SparkSession, dir: String): DataFrame = {
    val d = daily2(s, dir)
      .select(datediff(col("day"), lit("1995-01-01")).cast("long").as("t"),
        col("rev"), col("cnt"))
    val recent = d
      .crossJoin(broadcast(d.agg(max(col("t")).as("tmax"))))
      .filter(col("t") > col("tmax") - 365)
      .select(col("t"), col("rev"), col("cnt"))
    val pairs = recent.as("a")
      .join(broadcast(recent.as("b")), col("a.t") < col("b.t"))
      .select((col("b.rev") - col("a.rev")).as("dx"),
        (col("b.cnt") - col("a.cnt")).as("dy"))
      .localCheckpoint(eager = false)
    val agg = pairs.agg(
      sum(when(col("dx") * col("dy") > 0, 1L).otherwise(0L)).as("nc"),
      sum(when(col("dx") * col("dy") < 0, 1L).otherwise(0L)).as("nd"),
      sum(when(col("dx") === 0, 1L).otherwise(0L)).as("tx"),
      sum(when(col("dy") === 0, 1L).otherwise(0L)).as("ty"),
      sum(when(col("dx") === 0 && col("dy") === 0, 1L).otherwise(0L))
        .as("txy"))
    val diff = (col("nc") - col("nd")).cast("double")
    // fuzz hardening (r12): degenerate (all-tied / empty) pair sets
    // zero the denominators — the coefficients go null, not crash
    def safe(den: org.apache.spark.sql.Column) =
      when(den === 0, lit(null).cast("double"))
        .otherwise(round(diff / den.cast("double"), 6) + 0.0)
    agg.select(col("nc"), col("nd"), col("tx").as("ties_x"),
      col("ty").as("ties_y"), col("txy").as("ties_both"),
      safe(col("nc") + col("nd")).as("gamma"),
      safe(col("nc") + col("nd") + col("ty") - col("txy"))
        .as("somers_dyx"),
      safe(col("nc") + col("nd") + col("tx") - col("txy"))
        .as("somers_dxy"))
  }

  val q251OrdinalAssocSql: String =
    s"""WITH d AS ($daily2Sql),
       |dd AS (SELECT CAST(date_diff('day', DATE '1995-01-01', day)
       |    AS BIGINT) AS t, rev, cnt FROM d),
       |rc AS (SELECT t, rev, cnt FROM dd
       |  WHERE t > (SELECT MAX(t) FROM dd) - 365),
       |p AS (
       |  SELECT b.rev - a.rev AS dx, b.cnt - a.cnt AS dy
       |  FROM rc a JOIN rc b ON a.t < b.t),
       |g AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS nc,
       |    CAST(SUM(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS nd,
       |    CAST(SUM(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
       |    CAST(SUM(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty,
       |    CAST(SUM(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS txy
       |  FROM p)
       |SELECT nc, nd, tx AS ties_x, ty AS ties_y, txy AS ties_both,
       |  CASE WHEN nc + nd = 0 THEN NULL ELSE
       |    ROUND(CAST(nc - nd AS DOUBLE) / (nc + nd), 6) + 0 END AS gamma,
       |  CASE WHEN nc + nd + ty - txy = 0 THEN NULL ELSE
       |    ROUND(CAST(nc - nd AS DOUBLE) / (nc + nd + ty - txy), 6) + 0
       |    END AS somers_dyx,
       |  CASE WHEN nc + nd + tx - txy = 0 THEN NULL ELSE
       |    ROUND(CAST(nc - nd AS DOUBLE) / (nc + nd + tx - txy), 6) + 0
       |    END AS somers_dxy
       |FROM g""".stripMargin

  /** L186 Hurst exponent by rescaled range (Hurst 1951, Mandelbrot &
    * Wallis [PK]): mean R/S over non-overlapping blocks of w ∈ {8, 16,
    * 32, 64} days, H = the log₂-log₂ least-squares slope. H ≈ 0.5 ⇒
    * short memory; H → 1 ⇒ long-range dependence the ACF/PACF
    * (q208/q219) family underestimates. The long-memory diagnostic of
    * the series toolkit.
    *
    * Parity: per-block cumulative deviations ride EXACT integers —
    * W_t = w·(running Σx) − t·S_block so R = (maxW − minW)/w and
    * S² = (w·Q − S²)/w² are exact-int expressions; per-block R/S is
    * one double chain, nano-quantized before the cross-block integer
    * MEAN; H is a 4-point least-squares slope in doubles 6dp.
    *
    * Scale: block ids are integer div of the [[PrefixSum]] row index;
    * per-block windows partition BY block (parallel, bounded width);
    * ≤4-row algebra after. */
  def q252HurstRs(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val d0 = graft.ops.PrefixSum.withPrefixSums(
      daily(s, dir).select(col("day"), col("rev")),
      Seq(col("day")), Seq((lit(1L), "rn")))
      .select((col("rn") - 1).as("idx"), col("rev").as("x"))
      .localCheckpoint(eager = false)
    val ws = Seq(8, 16, 32, 64)
    val perW = ws.map { w =>
      val blocks = d0.withColumn("b", expr(s"idx div $w"))
        .withColumn("t", expr(s"idx % $w") + 1)
      val wB = Window.partitionBy("b").orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wBlk = Window.partitionBy("b")
      val full = blocks
        .withColumn("np", count(lit(1)).over(wBlk))
        .filter(col("np") === w)
        .withColumn("sb", sum(col("x")).over(wBlk))
        .withColumn("qb", sum(col("x").cast(dec) * col("x").cast(dec))
          .over(wBlk))
        .withColumn("cum", sum(col("x")).over(wB))
        .withColumn("wt",
          lit(w.toLong) * col("cum") - col("t") * col("sb"))
      val rs = full.groupBy("b", "sb", "qb")
        .agg(max(col("wt")).as("wmax"), min(col("wt")).as("wmin"))
        .select(
          ((col("wmax") - col("wmin")).cast("double") /
            sqrt((lit(w.toLong) * col("qb").cast("double") -
              col("sb").cast("double") * col("sb")))).as("rs"))
        .agg(count(lit(1)).as("n_blocks"),
          sum(floor(col("rs") * 1e9 + 0.5).cast("long")).as("rsq"))
      rs.select(lit(w).as("w"), col("n_blocks"),
        (col("rsq").cast("double") / 1e9 / col("n_blocks")).as("rs_mean"))
    }
    val lvls = perW.reduce(_ unionAll _)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    // least squares of ln(rs_mean) on ln(w) over the 4 points
    val lx = log(col("w").cast("double"))
    val ly = log(col("rs_mean"))
    val t = lvls
      .withColumn("k", count(lit(1)).over(wAll))
      .withColumn("sx", sum(lx).over(wAll))
      .withColumn("sy", sum(ly).over(wAll))
      .withColumn("sxy", sum(lx * ly).over(wAll))
      .withColumn("sxx", sum(lx * lx).over(wAll))
    val h = (col("k") * col("sxy") - col("sx") * col("sy")) /
      (col("k") * col("sxx") - col("sx") * col("sx"))
    t.select(col("w"), col("n_blocks"),
        (round(col("rs_mean"), 6) + 0.0).as("rs_mean"),
        (round(h, 6) + 0.0).as("hurst_h"))
      .orderBy("w")
  }

  val q252HurstRsSql: String = {
    def lvl(w: Int): String =
      s"""SELECT $w AS w, COUNT(*) AS n_blocks,
         |  CAST(SUM(CAST(FLOOR(rs * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
         |    / 1e9 / COUNT(*) AS rs_mean
         |FROM (
         |  SELECT b,
         |    CAST(MAX(wt) - MIN(wt) AS DOUBLE)
         |      / SQRT($w * CAST(MAX(qb) AS DOUBLE)
         |        - CAST(MAX(sb) AS DOUBLE) * MAX(sb)) AS rs
         |  FROM (
         |    SELECT b, t, sb, qb,
         |      $w * SUM(x) OVER (PARTITION BY b ORDER BY t
         |        ROWS UNBOUNDED PRECEDING) - t * sb AS wt
         |    FROM (
         |      SELECT idx // $w AS b, idx % $w + 1 AS t, x,
         |        COUNT(*) OVER (PARTITION BY idx // $w) AS np,
         |        CAST(SUM(x) OVER (PARTITION BY idx // $w) AS BIGINT)
         |          AS sb,
         |        CAST(SUM(CAST(x AS HUGEINT) * x) OVER
         |          (PARTITION BY idx // $w) AS HUGEINT) AS qb
         |      FROM d0) q WHERE np = $w) q2
         |  GROUP BY b) q3""".stripMargin
    s"""WITH d AS ($dailySql),
       |d0 AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY day) - 1 AS idx, rev AS x
       |  FROM d),
       |lv AS (
       |${lvl(8)}
       |UNION ALL
       |${lvl(16)}
       |UNION ALL
       |${lvl(32)}
       |UNION ALL
       |${lvl(64)}),
       |t AS (
       |  SELECT *, COUNT(*) OVER () AS k,
       |    SUM(LN(CAST(w AS DOUBLE))) OVER () AS sx,
       |    SUM(LN(rs_mean)) OVER () AS sy,
       |    SUM(LN(CAST(w AS DOUBLE)) * LN(rs_mean)) OVER () AS sxy,
       |    SUM(LN(CAST(w AS DOUBLE)) * LN(CAST(w AS DOUBLE))) OVER ()
       |      AS sxx
       |  FROM lv)
       |SELECT w, n_blocks,
       |  ROUND(rs_mean, 6) + 0 AS rs_mean,
       |  ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) + 0
       |    AS hurst_h
       |FROM t ORDER BY w""".stripMargin
  }

  /** L187 KPSS level-stationarity statistic (Kwiatkowski, Phillips,
    * Schmidt & Shin 1992 [PK]): η = Σ_t P_t² / (n²·σ̂²_lr) where P_t
    * are partial sums of demeaned daily revenue and σ̂²_lr is the
    * Bartlett-weighted long-run variance with bandwidth m = 7 (one
    * week). The null here is STATIONARITY — the reverse orientation
    * of every other trend test in the suite (q206/q226/q248 hunt for
    * trends; KPSS asks whether treating the series as stationary is
    * even defensible).
    *
    * Parity: demeaned values ride n-SCALED exact integers
    * (E_t = n·x_t − S), so partial sums and Σ P_t² are exact
    * DECIMAL/HUGEINT; autocovariance lag sums likewise; η is one
    * double chain on the common n-scale (the n² factors cancel
    * algebraically — documented in the chain), 6dp.
    *
    * Scale: day census + [[PrefixSum]] for P_t (no global window on
    * fact data); the m = 7 lag windows run over the scale-constant
    * series. */
  def q253Kpss(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val m = 7
    val tot = daily(s, dir).agg(count(lit(1)).as("n"),
      sum(col("rev")).as("sr"))
    // E_t = n·x_t − S  (n-scaled demeaned value, exact int64)
    val e = daily(s, dir).crossJoin(broadcast(tot))
      .select(col("day"), col("n"),
        (col("n") * col("rev") - col("sr")).as("et"))
    val cum = graft.ops.PrefixSum.withPrefixSums(e, Seq(col("day")),
      Seq((col("et"), "pt")))
      .localCheckpoint(eager = false)
    val w = Window.orderBy("day")
    val lags = cum.select(
      (col("et").cast(dec) * col("et").cast(dec)).as("g0") +:
        (col("pt").cast(dec) * col("pt").cast(dec)).as("p2") +:
        (1 to m).map(j =>
          (col("et").cast(dec) * lag(col("et"), j).over(w).cast(dec))
            .as(s"g$j")): _*)
    val aggCols = sum(col("g0")).as("sg0") +: sum(col("p2")).as("sp2") +:
      (1 to m).map(j => sum(col(s"g$j")).as(s"sg$j"))
    val agg = lags.agg(aggCols.head, aggCols.tail: _*)
      .crossJoin(broadcast(tot.select(col("n"))))
    // scale algebra: with E = n·e, ΣP'² = n²ΣP², S_lr = n²·(n·σ̂²_lr),
    // so η = n⁻²ΣP²/σ̂²_lr = ΣP'² / (n · S_lr) — one factor of n
    val sLr = (1 to m).foldLeft(col("sg0").cast("double")) {
      case (acc, j) =>
        acc + lit(2.0 * (1.0 - j.toDouble / (m + 1))) *
          col(s"sg$j").cast("double")
    }
    agg.select(col("n").as("n_days"), lit(m).as("bandwidth"),
      (round(col("sp2").cast("double") /
        (col("n").cast("double") * sLr), 6) + 0.0).as("kpss_eta"))
  }

  val q253KpssSql: String = {
    val m = 7
    val bart = (1 to m).map(j =>
      s"2.0 * (1.0 - $j.0 / ${m + 1}.0) * CAST(sg$j AS DOUBLE)")
      .mkString(" + ")
    val lagCols = (1 to m).map(j =>
      s"LAG(et, $j) OVER (ORDER BY day) AS el$j")
      .mkString(",\n       |    ")
    val lagSums = (1 to m).map(j =>
      s"CAST(SUM(CAST(et AS HUGEINT) * el$j) AS HUGEINT) AS sg$j")
      .mkString(",\n       |    ")
    s"""WITH d AS ($dailySql),
       |tot AS (SELECT COUNT(*) AS n, CAST(SUM(rev) AS BIGINT) AS sr
       |  FROM d),
       |e AS (
       |  SELECT day, (SELECT n FROM tot) * rev - (SELECT sr FROM tot)
       |    AS et
       |  FROM d),
       |cum AS (
       |  SELECT day, et,
       |    CAST(SUM(et) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS pt,
       |    $lagCols
       |  FROM e),
       |agg AS (
       |  SELECT
       |    CAST(SUM(CAST(et AS HUGEINT) * et) AS HUGEINT) AS sg0,
       |    CAST(SUM(CAST(pt AS HUGEINT) * pt) AS HUGEINT) AS sp2,
       |    $lagSums
       |  FROM cum)
       |SELECT (SELECT n FROM tot) AS n_days, $m AS bandwidth,
       |  ROUND(CAST(sp2 AS DOUBLE)
       |    / (CAST((SELECT n FROM tot) AS DOUBLE)
       |      * (CAST(sg0 AS DOUBLE) + $bart)), 6) + 0 AS kpss_eta
       |FROM agg""".stripMargin
  }

  /** L180 Haar wavelet energy decomposition (Haar 1910, Mallat [PK]):
    * detail energies at dyadic scales 1–3 over the daily revenue
    * series — how much revenue variation lives at the 2-day, 4-day,
    * and 8-day scales. The multiresolution complement to q208's ACF
    * (correlation at a lag) and q212's fixed weekly factor: energy
    * concentrating at level 3 ≈ weekly structure, at level 1 ≈
    * day-to-day noise.
    *
    * Parity: EXACT arithmetic throughout — the orthonormal detail
    * d_{l,k} = (S_{l−1,2k} − S_{l−1,2k+1})/√(2^l) has energy
    * Σd² = Σ(S_even − S_odd)²/2^l where the pair sums S are exact
    * int64 whole dollars, so each level's energy is an exact integer
    * divided by a power of two (exactly representable); shares are
    * one double chain 6dp. Trailing incomplete pairs at each level
    * are dropped (documented, identical on both engines via the same
    * div/parity arithmetic).
    *
    * Scale: three groupBy passes over the scale-constant day census
    * (the census row number rides [[PrefixSum]], not a global
    * window); everything is map-side combinable. */
  def q246HaarEnergy(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val d0 = graft.ops.PrefixSum.withPrefixSums(
      daily(s, dir).select(col("day"), col("rev")),
      Seq(col("day")), Seq((lit(1L), "rn")))
      .select((col("rn") - 1).as("idx"), col("rev").as("x"))
    def level(in: DataFrame): (DataFrame, DataFrame) = {
      val paired = in.groupBy((col("idx") / 2).cast("long").as("idx"))
        .agg(count(lit(1)).as("np"),
          sum(col("x")).as("x"),
          sum(when(col("idx") % 2 === 0, col("x")).otherwise(-col("x")))
            .as("dd"))
      val complete = paired.filter(col("np") === 2)
      (complete.select(col("idx"), col("x")),
        complete.agg(count(lit(1)).as("n_pairs"),
          sum(col("dd").cast(dec) * col("dd").cast(dec)).as("e2")))
    }
    val (s1, e1) = level(d0)
    val (s2, e2) = level(s1)
    val (_, e3) = level(s2)
    val lvls = e1.select(lit(1).as("level"), col("n_pairs"),
        (col("e2").cast("double") / 2.0).as("energy"))
      .unionAll(e2.select(lit(2).as("level"), col("n_pairs"),
        (col("e2").cast("double") / 4.0).as("energy")))
      .unionAll(e3.select(lit(3).as("level"), col("n_pairs"),
        (col("e2").cast("double") / 8.0).as("energy")))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    lvls.withColumn("tot", sum(col("energy")).over(wAll))
      .select(col("level"), col("n_pairs"),
        (round(col("energy") / 1e6, 4) + 0.0).as("energy_m"),
        (round(col("energy") / col("tot"), 6) + 0.0).as("share"))
      .orderBy("level")
  }

  val q246HaarEnergySql: String =
    s"""WITH d AS ($dailySql),
       |d0 AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY day) - 1 AS idx, rev AS x
       |  FROM d),
       |l1 AS (
       |  SELECT idx // 2 AS idx, COUNT(*) AS np,
       |    CAST(SUM(x) AS BIGINT) AS x,
       |    CAST(SUM(CASE WHEN idx % 2 = 0 THEN x ELSE -x END) AS BIGINT)
       |      AS dd
       |  FROM d0 GROUP BY 1),
       |l2 AS (
       |  SELECT idx // 2 AS idx, COUNT(*) AS np,
       |    CAST(SUM(x) AS BIGINT) AS x,
       |    CAST(SUM(CASE WHEN idx % 2 = 0 THEN x ELSE -x END) AS BIGINT)
       |      AS dd
       |  FROM l1 WHERE np = 2 GROUP BY 1),
       |l3 AS (
       |  SELECT idx // 2 AS idx, COUNT(*) AS np,
       |    CAST(SUM(x) AS BIGINT) AS x,
       |    CAST(SUM(CASE WHEN idx % 2 = 0 THEN x ELSE -x END) AS BIGINT)
       |      AS dd
       |  FROM l2 WHERE np = 2 GROUP BY 1),
       |lv AS (
       |  SELECT 1 AS level, COUNT(*) AS n_pairs,
       |    CAST(SUM(CAST(dd AS HUGEINT) * dd) AS DOUBLE) / 2.0 AS energy
       |  FROM l1 WHERE np = 2
       |  UNION ALL
       |  SELECT 2, COUNT(*),
       |    CAST(SUM(CAST(dd AS HUGEINT) * dd) AS DOUBLE) / 4.0
       |  FROM l2 WHERE np = 2
       |  UNION ALL
       |  SELECT 3, COUNT(*),
       |    CAST(SUM(CAST(dd AS HUGEINT) * dd) AS DOUBLE) / 8.0
       |  FROM l3 WHERE np = 2),
       |t AS (SELECT *, SUM(energy) OVER () AS tot FROM lv)
       |SELECT level, n_pairs,
       |  ROUND(energy / 1e6, 4) + 0 AS energy_m,
       |  ROUND(energy / tot, 6) + 0 AS share
       |FROM t ORDER BY level""".stripMargin

  /** L182 Mann–Kendall trend test (Mann 1945, Kendall [PK]) on the
    * trailing-365-day revenue series: S = Σ_{i<j} sign(x_j − x_i),
    * tie-corrected Var[S] = [n(n−1)(2n+5) − Σt(t−1)(2t+5)]/18,
    * continuity-corrected z. The TEST companion to q206's Theil–Sen
    * SLOPE (same pair set): Theil–Sen says how steep, Mann–Kendall
    * says whether the monotone trend is significant at all.
    *
    * Parity: the q206/q211 pair build (lazy localCheckpoint, constant
    * C(365,2) pairs); S and the tie census are exact int64; z is one
    * double chain; p rides A-S quantized 1e-8.
    *
    * Scale: only the day aggregation scans fact data — the q206
    * shape exactly. */
  def q248MannKendall(s: SparkSession, dir: String): DataFrame = {
    val d = daily(s, dir)
      .select(datediff(col("day"), lit("1995-01-01")).cast("long").as("t"),
        col("rev"))
    // lazy checkpoint: BOTH consumers (pair build and tie census) read
    // the cut, so the scale-constant window materializes once and the
    // plan's nested-loop budget stays at the single final 1-row join
    val recent = d
      .crossJoin(broadcast(d.agg(max(col("t")).as("tmax"))))
      .filter(col("t") > col("tmax") - 365)
      .select(col("t"), col("rev"))
      .localCheckpoint(eager = false)
    val pairs = recent.as("a")
      .join(broadcast(recent.as("b")), col("a.t") < col("b.t"))
      .select(signum((col("b.rev") - col("a.rev")).cast("double"))
        .cast("long").as("sgn"))
      .localCheckpoint(eager = false)
    val sAgg = pairs.agg(sum(col("sgn")).as("s_stat"))
    val ties = recent.groupBy("rev").agg(count(lit(1)).as("tc"))
      .agg(count(lit(1)).cast("long").as("n_distinct"),
        sum(col("tc")).as("n"),
        sum(col("tc") * (col("tc") - 1) * (lit(2) * col("tc") + 5))
          .as("tie_term"))
    val nD = col("n").cast("double")
    val varS = (nD * (nD - 1.0) * (lit(2.0) * nD + 5.0) -
      col("tie_term").cast("double")) / 18.0
    val z = when(col("s_stat") > 0,
        (col("s_stat").cast("double") - 1.0) / sqrt(varS))
      .when(col("s_stat") < 0,
        (col("s_stat").cast("double") + 1.0) / sqrt(varS))
      .otherwise(lit(0.0))
    sAgg.crossJoin(broadcast(ties))
      .select(col("n").as("n_days"), col("s_stat"),
        (round(z, 4) + 0.0).as("z_mk"),
        (floor(StatFns.asTwoSidedP(z) * 1e8 + 0.5) / 1e8).as("p"),
        when(col("s_stat") > 0, lit("increasing"))
          .when(col("s_stat") < 0, lit("decreasing"))
          .otherwise(lit("none")).as("trend"))
  }

  val q248MannKendallSql: String = {
    val z = """(CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)
      | / SQRT((CAST(n AS DOUBLE) * (n - 1) * (2 * CAST(n AS DOUBLE) + 5)
      |   - CAST(tie_term AS DOUBLE)) / 18.0)
      | WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)
      | / SQRT((CAST(n AS DOUBLE) * (n - 1) * (2 * CAST(n AS DOUBLE) + 5)
      |   - CAST(tie_term AS DOUBLE)) / 18.0)
      | ELSE 0.0 END)""".stripMargin.replace("\n", " ")
    s"""WITH d AS ($dailySql),
       |dd AS (SELECT CAST(date_diff('day', DATE '1995-01-01', day)
       |    AS BIGINT) AS t, rev FROM d),
       |rc AS (SELECT t, rev FROM dd
       |  WHERE t > (SELECT MAX(t) FROM dd) - 365),
       |sa AS (
       |  SELECT CAST(SUM(CASE WHEN b.rev > a.rev THEN 1
       |    WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
       |  FROM rc a JOIN rc b ON a.t < b.t),
       |ties AS (
       |  SELECT COUNT(*) AS n_distinct,
       |    CAST(SUM(tc) AS BIGINT) AS n,
       |    CAST(SUM(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT) AS tie_term
       |  FROM (SELECT rev, COUNT(*) AS tc FROM rc GROUP BY rev))
       |SELECT n AS n_days, s_stat,
       |  ROUND($z, 4) + 0 AS z_mk,
       |  FLOOR(${StatFns.asTwoSidedPSql(z)} * 1e8 + 0.5) / 1e8 AS p,
       |  CASE WHEN s_stat > 0 THEN 'increasing'
       |    WHEN s_stat < 0 THEN 'decreasing' ELSE 'none' END AS trend
       |FROM sa, ties""".stripMargin
  }

  val q237RunsTestSql: String = {
    val z = "((CAST(switches + 1 AS DOUBLE) " +
      "- (2.0 * np * nn / n + 1.0)) " +
      "/ SQRT(2.0 * np * nn * (2.0 * np * nn - n) / (n * n * (n - 1.0))))"
    s"""WITH d AS ($dailySql),
       |dd AS (
       |  SELECT day, rev, isodow(day) AS dw FROM d),
       |seas AS (
       |  SELECT dw, CAST(SUM(rev) AS BIGINT) AS sr, COUNT(*) AS nd
       |  FROM dd GROUP BY dw),
       |e AS (
       |  SELECT day,
       |    CASE WHEN CAST(FLOOR((CAST(rev AS DOUBLE)
       |      - CAST(sr AS DOUBLE) / nd) * 1e6 + 0.5) AS BIGINT) >= 0
       |      THEN 1 ELSE 0 END AS sgn
       |  FROM dd JOIN seas ON dd.dw = seas.dw),
       |l AS (
       |  SELECT sgn, LAG(sgn) OVER (ORDER BY day) AS sp FROM e),
       |agg AS (
       |  SELECT COUNT(*) AS n_days,
       |    CAST(SUM(sgn) AS BIGINT) AS n_pos,
       |    CAST(SUM(CASE WHEN sp IS NOT NULL AND sp <> sgn THEN 1 ELSE 0
       |      END) AS BIGINT) AS switches
       |  FROM l),
       |c AS (
       |  SELECT n_days, n_pos, switches,
       |    CAST(n_pos AS DOUBLE) AS np,
       |    CAST(n_days - n_pos AS DOUBLE) AS nn,
       |    CAST(n_days AS DOUBLE) AS n
       |  FROM agg)
       |SELECT n_days, n_pos, n_days - n_pos AS n_neg,
       |  switches + 1 AS runs,
       |  ROUND($z, 4) + 0 AS z_runs,
       |  FLOOR(${StatFns.asTwoSidedPSql(z)} * 1e8 + 0.5) / 1e8 AS p
       |FROM c""".stripMargin
  }

  /** L191 Cox–Stuart trend test (Cox & Stuart 1955 [PK]) on daily
    * revenue: pair day i with day i+m (m = ⌈n/2⌉; the middle day of an
    * odd series is unpaired), count increases S⁺ and decreases S⁻
    * (ties dropped), and z = (S⁺ − S⁻)/√(S⁺+S⁻) — the sign-test trend
    * check that needs NO distributional assumption at all, the crude
    * robust sibling of q206's Theil–Sen slope and q248's Mann–Kendall
    * (M-K weighs all pairs; Cox–Stuart only the half-spaced ones, so
    * it is immune to seasonal short-range wiggle of period < m).
    *
    * Parity: pair differences are exact int64 off the day census;
    * S⁺/S⁻ exact; z one double chain 4dp; p the shared A-S kernel
    * quantized 1e-8.
    *
    * Scale: the day census rides ONE [[PrefixSum]] index pass; the
    * half-offset pairing is a census self-join on rn = rn+m (tiny);
    * no fact-sized window. Guards: S⁺+S⁻ = 0 (all pairs tied) → null. */
  def q263CoxStuart(s: SparkSession, dir: String): DataFrame = {
    val d0 = graft.ops.PrefixSum.withPrefixSums(
      daily(s, dir).select(col("day"), col("rev")),
      Seq(col("day")), Seq((lit(1L), "rn")))
      .select(col("rn"), col("rev"))
      .localCheckpoint(eager = false)
    val n = d0.agg(max(col("rn")).as("n"))
    val m = expr("(n + 1) div 2") // integer div — `/` on Columns is double
    val a = d0.select(col("rn").as("i"), col("rev").as("x1"))
    val b = d0.select(col("rn").as("j"), col("rev").as("x2"))
    // LEFT join + in-agg pair mask, not an inner-filtered pair set: on a
    // degenerate ≤1-pair-free corpus (n=1 ⇒ i ≤ n−m never holds) an agg
    // over the EMPTY inner join would null n_days/half_offset while the
    // mirror's scalar subqueries still report the real census values
    // (r12 ADVICE). The left form keeps every census row in the agg, so
    // max(n)/max(m) always carry, and s_up/s_dn are pinned to the
    // mirror's SUM-over-empty NULL via the pair count.
    val pairs = a.crossJoin(broadcast(n))
      .withColumn("m", m)
      .join(b, col("j") === col("i") + col("m") &&
        col("i") <= col("n") - col("m"), "left")
    val inPair = col("j").isNotNull
    val g = pairs.agg(max(col("n")).as("n_days"), max(col("m")).as("m"),
      sum(when(inPair, 1L).otherwise(0L)).as("np"),
      sum(when(inPair && col("x2") > col("x1"), 1L).otherwise(0L)).as("su"),
      sum(when(inPair && col("x2") < col("x1"), 1L).otherwise(0L)).as("sd"))
    val sUp = when(col("np") === 0, lit(null).cast("long"))
      .otherwise(col("su"))
    val sDn = when(col("np") === 0, lit(null).cast("long"))
      .otherwise(col("sd"))
    val tot = (sUp + sDn).cast("double")
    val z = (sUp - sDn).cast("double") / sqrt(tot)
    g.select(col("n_days"), col("m").as("half_offset"),
      sUp.as("s_up"), sDn.as("s_dn"),
      when(tot === 0, lit(null).cast("double"))
        .otherwise(round(z, 4) + 0.0).as("z"),
      when(tot === 0, lit(null).cast("double"))
        .otherwise(floor(StatFns.asTwoSidedP(z) * 1e8 + 0.5) / 1e8).as("p"))
  }

  val q263CoxStuartSql: String = {
    val z = "(CAST(s_up - s_dn AS DOUBLE) / SQRT(CAST(s_up + s_dn AS DOUBLE)))"
    s"""WITH d AS ($dailySql),
       |r AS (SELECT ROW_NUMBER() OVER (ORDER BY day) AS rn, rev FROM d),
       |n AS (SELECT CAST(MAX(rn) AS BIGINT) AS n,
       |  CAST((MAX(rn) + 1) // 2 AS BIGINT) AS m FROM r),
       |g AS (
       |  SELECT (SELECT n FROM n) AS n_days, (SELECT m FROM n) AS m,
       |    CAST(SUM(CASE WHEN b.rev > a.rev THEN 1 ELSE 0 END) AS BIGINT)
       |      AS s_up,
       |    CAST(SUM(CASE WHEN b.rev < a.rev THEN 1 ELSE 0 END) AS BIGINT)
       |      AS s_dn
       |  FROM r a JOIN r b ON b.rn = a.rn + (SELECT m FROM n)
       |  WHERE a.rn <= (SELECT n - m FROM n))
       |SELECT n_days, m AS half_offset, s_up, s_dn,
       |  CASE WHEN s_up + s_dn = 0 THEN NULL
       |    ELSE ROUND($z, 4) + 0 END AS z,
       |  CASE WHEN s_up + s_dn = 0 THEN NULL
       |    ELSE FLOOR(${StatFns.asTwoSidedPSql(z)} * 1e8 + 0.5) / 1e8 END
       |    AS p
       |FROM g""".stripMargin
  }

  /** L192 turning-points randomness test (Kendall [PK], the classic
    * "peaks and troughs" check): count STRICT local extrema of the
    * daily-revenue series (a day beating or undercutting both
    * neighbors; plateau edges are not turning points — the tie
    * convention is pinned identically in both engines), with
    * E[T] = 2(n−2)/3 and Var[T] = (16n−29)/90 under the IID null.
    * Complements q237's runs test (runs sees sign clustering of
    * residuals; turning points see local oscillation rate of the raw
    * series — too FEW points means trend/momentum, too many means
    * antithetic noise).
    *
    * Parity: extremum flags are exact int comparisons on the census;
    * T/E/Var/z one double chain; p the shared A-S kernel at 1e-8.
    *
    * Scale: one day-census window (lag/lead over ≤|days| rows), 1-row
    * algebra. Guards: n < 3 → null. */
  def q264TurningPoints(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("day")
    val d0 = daily(s, dir)
      .withColumn("xp", lag(col("rev"), 1).over(w))
      .withColumn("xn", lead(col("rev"), 1).over(w))
    val tp = when(col("xp").isNotNull && col("xn").isNotNull &&
      ((col("rev") > col("xp") && col("rev") > col("xn")) ||
        (col("rev") < col("xp") && col("rev") < col("xn"))), 1L)
      .otherwise(0L)
    val g = d0.agg(count(lit(1)).as("n_days"), sum(tp).as("t_points"))
    val nD = col("n_days").cast("double")
    val e = lit(2.0) * (nD - 2.0) / 3.0
    val v = (lit(16.0) * nD - 29.0) / 90.0
    val z = (col("t_points").cast("double") - e) / sqrt(v)
    g.select(col("n_days"), col("t_points"),
      when(col("n_days") < 3, lit(null).cast("double"))
        .otherwise(round(e, 4) + 0.0).as("expected"),
      when(col("n_days") < 3, lit(null).cast("double"))
        .otherwise(round(z, 4) + 0.0).as("z"),
      when(col("n_days") < 3, lit(null).cast("double"))
        .otherwise(floor(StatFns.asTwoSidedP(z) * 1e8 + 0.5) / 1e8).as("p"))
  }

  val q264TurningPointsSql: String = {
    val z = "((CAST(t_points AS DOUBLE) - 2.0 * (CAST(n_days AS DOUBLE) - 2.0) / 3.0)" +
      " / SQRT((16.0 * CAST(n_days AS DOUBLE) - 29.0) / 90.0))"
    s"""WITH d AS ($dailySql),
       |l AS (
       |  SELECT rev,
       |    LAG(rev) OVER (ORDER BY day) AS xp,
       |    LEAD(rev) OVER (ORDER BY day) AS xn
       |  FROM d),
       |g AS (
       |  SELECT COUNT(*) AS n_days,
       |    CAST(SUM(CASE WHEN xp IS NOT NULL AND xn IS NOT NULL
       |      AND ((rev > xp AND rev > xn) OR (rev < xp AND rev < xn))
       |      THEN 1 ELSE 0 END) AS BIGINT) AS t_points
       |  FROM l)
       |SELECT n_days, t_points,
       |  CASE WHEN n_days < 3 THEN NULL ELSE
       |    ROUND(2.0 * (CAST(n_days AS DOUBLE) - 2.0) / 3.0, 4) + 0 END
       |    AS expected,
       |  CASE WHEN n_days < 3 THEN NULL ELSE ROUND($z, 4) + 0 END AS z,
       |  CASE WHEN n_days < 3 THEN NULL ELSE
       |    FLOOR(${StatFns.asTwoSidedPSql(z)} * 1e8 + 0.5) / 1e8 END AS p
       |FROM g""".stripMargin
  }

  /** L200 Lo–MacKinlay variance-ratio test, q = 5 (Lo & MacKinlay 1988
    * [PK]): on daily log-revenue returns r_t, VR(5) =
    * Var(x_t − x_{t−5}) / (5·Var(r_t)) — a random walk gives VR ≈ 1,
    * momentum VR > 1, mean-reversion VR < 1. The aggregation-horizon
    * consistency check beside q252's Hurst R/S (H and VR must tell the
    * same long-memory story; disagreement flags a scale-localized
    * artifact). z under homoskedasticity: (VR−1)/√(2(2q−1)(q−1)/(3qn)).
    *
    * Parity: per-day ln(rev) quantizes to nano-units ONCE (int64); both
    * return series are exact integer differences of those; variances
    * ride exact integer power sums (HUGEINT/decimal); VR/z one double
    * chain. The shared quantized-log base means the two variances can
    * never drift apart in the last ulp.
    *
    * Scale: day census + two lag windows over it; 1-row algebra.
    * Guards: n < q+2 or zero base variance → null. */
  def q265VarianceRatio(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val q = 5
    val w = Window.orderBy("day")
    val d0 = daily(s, dir)
      .withColumn("lx",
        floor(log(col("rev").cast("double")) * 1e9 + 0.5).cast("long"))
      .withColumn("r1", col("lx") - lag(col("lx"), 1).over(w))
      .withColumn("rq", col("lx") - lag(col("lx"), q).over(w))
    val g = d0.agg(
      sum(when(col("r1").isNotNull, 1L).otherwise(0L)).as("n1"),
      sum(col("r1").cast(dec)).as("s1"),
      sum(col("r1").cast(dec) * col("r1").cast(dec)).as("q1"),
      sum(when(col("rq").isNotNull, 1L).otherwise(0L)).as("nq"),
      sum(col("rq").cast(dec)).as("sq"),
      sum(col("rq").cast(dec) * col("rq").cast(dec)).as("qq"))
    val n1 = col("n1").cast("double")
    val nq = col("nq").cast("double")
    val v1 = (col("q1").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") / n1) / n1
    val vq = (col("qq").cast("double") -
      col("sq").cast("double") * col("sq").cast("double") / nq) / nq
    val vr = vq / (lit(q.toDouble) * v1)
    val z = (vr - 1.0) / sqrt(lit(2.0 * (2 * q - 1) * (q - 1)) /
      (lit(3.0 * q) * n1))
    val bad = col("n1") < q + 2 || v1 <= 0.0 || col("nq") < 2
    g.select(col("n1").as("n_returns"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(vr, 6) + 0.0).as("vr5"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(z, 4) + 0.0).as("z"),
      when(bad, lit(null).cast("double"))
        .otherwise(floor(StatFns.asTwoSidedP(z) * 1e8 + 0.5) / 1e8).as("p"))
  }

  val q265VarianceRatioSql: String = {
    val v1 = "((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)" +
      " / CAST(n1 AS DOUBLE)) / CAST(n1 AS DOUBLE))"
    val vq = "((CAST(qq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)" +
      " / CAST(nq AS DOUBLE)) / CAST(nq AS DOUBLE))"
    val vr = s"($vq / (5.0 * $v1))"
    val z = s"(($vr - 1.0) / SQRT(2.0 * 9.0 * 4.0 / (15.0 * CAST(n1 AS DOUBLE))))"
    s"""WITH d AS ($dailySql),
       |l AS (
       |  SELECT CAST(FLOOR(ln(CAST(rev AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
       |    AS lx, day
       |  FROM d),
       |r AS (
       |  SELECT lx - LAG(lx, 1) OVER (ORDER BY day) AS r1,
       |    lx - LAG(lx, 5) OVER (ORDER BY day) AS rq
       |  FROM l),
       |g AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN r1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n1,
       |    SUM(CAST(r1 AS HUGEINT)) AS s1,
       |    SUM(CAST(r1 AS HUGEINT) * r1) AS q1,
       |    CAST(SUM(CASE WHEN rq IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS nq,
       |    SUM(CAST(rq AS HUGEINT)) AS sq,
       |    SUM(CAST(rq AS HUGEINT) * rq) AS qq
       |  FROM r)
       |SELECT n1 AS n_returns,
       |  CASE WHEN n1 < 7 OR $v1 <= 0.0 OR nq < 2 THEN NULL
       |    ELSE ROUND($vr, 6) + 0 END AS vr5,
       |  CASE WHEN n1 < 7 OR $v1 <= 0.0 OR nq < 2 THEN NULL
       |    ELSE ROUND($z, 4) + 0 END AS z,
       |  CASE WHEN n1 < 7 OR $v1 <= 0.0 OR nq < 2 THEN NULL
       |    ELSE FLOOR(${StatFns.asTwoSidedPSql(z)} * 1e8 + 0.5) / 1e8 END
       |    AS p
       |FROM g""".stripMargin
  }

  /** L201 periodogram at calendar periods {7, 14, 30} days + spectral
    * share (Schuster 1898 [PK]): P(ω) = (Σε_t cos ωt)² + (Σε_t sin ωt)²
    * over the demeaned day series, reported as the share of total
    * variance each period carries — the frequency-domain seasonality
    * readout beside q212's day-of-week means (q212 asks "which weekday";
    * the periodogram asks "is 7 days even the right period").
    *
    * Parity: demeaning rides the q253 n-scaling trick (ε_t = n·x_t − S
    * is EXACT int64); each cos/sin product quantizes to nano units
    * before its exact integer sum, so the one cross-libm trig call per
    * term sits behind a quantizer (boundary flips are measure-zero, the
    * q121 ln precedent); the final share is one double chain 6dp.
    *
    * Scale: day census + [[PrefixSum]] index; the three periods ride
    * ONE census pass (explode, not a 3-branch union — a union would
    * re-plan the scan and the totals broadcast once per period),
    * map-side summed. Guards: n < 2·period or zero variance → null
    * share for that period. */
  def q266Periodogram(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val d0 = graft.ops.PrefixSum.withPrefixSums(
      daily(s, dir).select(col("day"), col("rev")),
      Seq(col("day")), Seq((lit(1L), "rn")))
      .select((col("rn") - 1).as("tt"), col("rev"))
      .localCheckpoint(eager = false)
    val tot = d0.agg(count(lit(1)).as("n"), sum(col("rev")).as("s"),
      sum(col("rev").cast(dec) * col("rev").cast(dec)).as("q"))
    val e = d0.crossJoin(broadcast(tot))
      .select(col("tt"), col("n"), col("s"), col("q"),
        (col("rev").cast(dec) * col("n").cast(dec) - col("s").cast(dec))
          .as("eps"))
    val ang = col("tt").cast("double") *
      (lit(2.0 * math.Pi) / col("period_days").cast("double"))
    val perP = e
      .select(col("*"),
        explode(array(lit(7L), lit(14L), lit(30L))).as("period_days"))
      .select(col("period_days"), col("n"), col("s"), col("q"),
        floor(col("eps").cast("double") * cos(ang) / 1e6 + 0.5)
          .cast("long").as("cq"),
        floor(col("eps").cast("double") * sin(ang) / 1e6 + 0.5)
          .cast("long").as("sq2"))
      .groupBy("period_days", "n", "s", "q")
      .agg(sum(col("cq")).as("sc"), sum(col("sq2")).as("ss"))
    val nD = col("n").cast("double")
    // ε is n-scaled, and the quantizer already divided by 1e6: power in
    // natural units = ((sc·1e6)² + (ss·1e6)²) / n²; total variance
    // Σε²/n² = (n·q − s²)/n
    val power = (col("sc").cast("double") * col("sc") +
      col("ss").cast("double") * col("ss")) * 1e12 / (nD * nD)
    val totVar = (nD * col("q").cast("double") -
      col("s").cast("double") * col("s").cast("double")) / nD
    val share = power / (nD * totVar) * 2.0
    val bad = col("n") < col("period_days") * 2 || totVar <= 0.0
    perP.select(col("period_days"), col("n").as("n_days"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(share, 6) + 0.0).as("spectral_share"))
      .orderBy("period_days")
  }

  val q266PeriodogramSql: String =
    s"""WITH d AS ($dailySql),
       |r AS (SELECT ROW_NUMBER() OVER (ORDER BY day) - 1 AS tt, rev
       |      FROM d),
       |tot AS (SELECT COUNT(*) AS n, CAST(SUM(rev) AS BIGINT) AS s,
       |  SUM(CAST(rev AS HUGEINT) * rev) AS q FROM r),
       |e AS (
       |  SELECT tt, n, s, q,
       |    CAST(rev AS HUGEINT) * n - s AS eps
       |  FROM r, tot),
       |p AS (
       |  SELECT per, n, s, q,
       |    CAST(SUM(CAST(FLOOR(CAST(eps AS DOUBLE)
       |      * cos(CAST(tt AS DOUBLE) * (2.0 * pi() / per)) / 1e6 + 0.5)
       |      AS BIGINT)) AS BIGINT) AS sc,
       |    CAST(SUM(CAST(FLOOR(CAST(eps AS DOUBLE)
       |      * sin(CAST(tt AS DOUBLE) * (2.0 * pi() / per)) / 1e6 + 0.5)
       |      AS BIGINT)) AS BIGINT) AS ss
       |  FROM e CROSS JOIN (SELECT unnest([7, 14, 30]) AS per)
       |  GROUP BY per, n, s, q)
       |SELECT CAST(per AS BIGINT) AS period_days, n AS n_days,
       |  CASE WHEN n < per * 2
       |      OR (CAST(n AS DOUBLE) * q - CAST(s AS DOUBLE) * s)
       |        / CAST(n AS DOUBLE) <= 0.0 THEN NULL
       |    ELSE ROUND(
       |      (CAST(sc AS DOUBLE) * sc + CAST(ss AS DOUBLE) * ss) * 1e12
       |        / (CAST(n AS DOUBLE) * n)
       |      / (CAST(n AS DOUBLE)
       |         * ((CAST(n AS DOUBLE) * q - CAST(s AS DOUBLE) * s)
       |            / CAST(n AS DOUBLE))) * 2.0, 6) + 0 END
       |    AS spectral_share
       |FROM p ORDER BY period_days""".stripMargin

  /** L202 Hodges–Lehmann location estimate (Hodges & Lehmann 1963
    * [PK]) of recent daily revenue: the median of all Walsh averages
    * (xᵢ+xⱼ)/2, i ≤ j, over the trailing-365-day window — the
    * estimator the Wilcoxon family (q260) inverts, ~30% more
    * efficient than the plain median under near-normal noise and
    * still 29%-breakdown robust. Reported beside the plain median so
    * the gap itself is the skew diagnostic.
    *
    * Parity: Walsh sums xᵢ+xⱼ are exact int64; both medians are the
    * A10 exact-percentile contract (quantile_cont), displayed /2 at
    * 2dp. The plain median reads the DIAGONAL pairs (i = j, where
    * walsh = 2·rev) out of the same pair set — no separate
    * median-attach join.
    *
    * Scale: the q211/q251 checkpointed bounded pair build (≤365-day
    * census → ≤67k pairs — scale-constant); one exact percentile over
    * it. */
  def q262HodgesLehmann(s: SparkSession, dir: String): DataFrame = {
    val d = daily(s, dir)
      .select(datediff(col("day"), lit("1995-01-01")).cast("long").as("t"),
        col("rev"))
    val recent = d
      .crossJoin(broadcast(d.agg(max(col("t")).as("tmax"))))
      .filter(col("t") > col("tmax") - 365)
      .select(col("t"), col("rev"))
      .localCheckpoint(eager = false)
    val pairs = recent.as("a")
      .join(broadcast(recent.as("b")), col("a.t") <= col("b.t"))
      .select((col("a.rev") + col("b.rev")).as("walsh"),
        (col("a.t") === col("b.t")).as("diag"))
    pairs.agg(count(lit(1)).as("n_pairs"),
      expr("percentile(walsh, 0.5)").as("wmed"),
      expr("percentile(CASE WHEN diag THEN walsh END, 0.5)").as("dmed"))
      .select(col("n_pairs"),
        (round(col("wmed") / 2.0, 2) + 0.0).as("hodges_lehmann"),
        (round(col("dmed") / 2.0, 2) + 0.0).as("plain_median"))
  }

  val q262HodgesLehmannSql: String =
    s"""WITH d AS ($dailySql),
       |dd AS (SELECT CAST(date_diff('day', DATE '1995-01-01', day)
       |    AS BIGINT) AS t, rev FROM d),
       |rc AS (SELECT t, rev FROM dd
       |  WHERE t > (SELECT MAX(t) FROM dd) - 365),
       |p AS (
       |  SELECT a.rev + b.rev AS walsh, a.t = b.t AS diag
       |  FROM rc a JOIN rc b ON a.t <= b.t),
       |g AS (SELECT COUNT(*) AS n_pairs,
       |  quantile_cont(walsh, 0.5) AS wmed,
       |  quantile_cont(CASE WHEN diag THEN walsh END, 0.5) AS dmed
       |  FROM p)
       |SELECT n_pairs,
       |  ROUND(wmed / 2.0, 2) + 0 AS hodges_lehmann,
       |  ROUND(dmed / 2.0, 2) + 0 AS plain_median
       |FROM g""".stripMargin

  /** L205 Ljung–Box portmanteau Q on the DIFFERENCED daily revenue
    * series, lags 1–6 (Ljung & Box 1978 [PK]): Q = n(n+2)Σρ̂ₖ²/(n−k)
    * with the STANDARD ACF estimator (global mean, global denominator
    * — not q208's per-lag Pearson, whose denominators re-center per
    * lag and would decalibrate the χ² reference). The one-number
    * "is anything left after differencing" white-noise gate a
    * forecasting pipeline runs before trusting residuals; q208 shows
    * WHERE dependence sits, Ljung–Box says WHETHER it is jointly
    * significant. Six lags, not seven, so df = 6 stays even and the
    * χ² tail keeps the exact closed form exp(−q/2)·Σ(q/2)ⁱ/i!.
    *
    * Parity: differences are exact int64; deviations ride the q253
    * n-scaling trick (εₜ = n·dₜ − S is EXACT int64 — no float mean);
    * per-lag products Σεₜεₜ₋ₖ and the denominator Σεₜ² are exact
    * DECIMAL(38,0)/HUGEINT sums; ρ̂ₖ, Q and the tail are one identical
    * double chain, Q 4dp / p 1e-8-quantized (q216 discipline).
    *
    * Scale: the day census (~2,400 rows, CONSTANT in SF — only the
    * map-side day agg scans fact data); all six lags share ONE ordered
    * window pass via stack (the q208 one-sort trick); the 1-row totals
    * broadcast is the allowlisted BNLJ class. Guards: Σε² = 0
    * (constant diffs) or n < 10 → null Q/p. */
  def q275LjungBox(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val w = Window.orderBy("day")
    val diffs = daily(s, dir)
      .withColumn("dx", col("rev") - lag(col("rev"), 1).over(w))
      .filter(col("dx").isNotNull)
    val tot = diffs.agg(count(lit(1)).as("n"),
      sum(col("dx").cast(dec)).as("sx"))
    // census-sized (~2,400 rows) and read by BOTH the lag stack and the
    // denominator agg — the lazy checkpoint computes the daily agg +
    // diff window once and keeps the 1-row totals broadcast from
    // surfacing once per consumer subtree (q262's plan discipline)
    val eps = diffs.crossJoin(broadcast(tot))
      .select(col("day"), col("n"),
        (col("dx").cast(dec) * col("n").cast(dec) - col("sx")).as("e"))
      .localCheckpoint(eager = false)
    val withLags = eps.select(
      (Seq(col("n"), col("e")) ++ (1 to 6).map(k =>
        lag(col("e"), k).over(w).as(s"e$k"))): _*)
    val stackExpr = (1 to 6)
      .map(k => s"${k}L, e$k").mkString("stack(6, ", ", ", ")")
    val lagged = withLags
      .select(col("n"), col("e").as("y"), expr(s"$stackExpr as (lag, x)"))
    // denominator Σε² rides lag 1's rows plus its own head row, so sum
    // it from the eps census directly (one extra 1-row agg, no rescan:
    // eps is census-sized)
    val den = eps.agg(sum(col("e") * col("e")).as("see"),
      max(col("n")).as("nn"))
    val perLag = lagged.filter(col("x").isNotNull)
      .groupBy("lag").agg(sum(col("x") * col("y")).as("sxy"))
    val qSum = perLag.crossJoin(broadcast(den))
      .select(col("nn"), col("see"),
        ((col("sxy").cast("double") / col("see").cast("double")) *
          (col("sxy").cast("double") / col("see").cast("double")) /
          (col("nn").cast("double") - col("lag").cast("double"))).as("term"))
      .groupBy("nn").agg(sum(col("term")).as("tsum"),
        max(col("see")).as("see"))
    val q = col("nn").cast("double") * (col("nn").cast("double") + 2.0) *
      col("tsum")
    val p = exp(-q / 2.0) * (lit(1.0) + q / 2.0 + q * q / 8.0)
    qSum
      .select(col("nn").as("n_diffs"),
        when(col("see") <= 0 || col("nn") < 10, lit(null).cast("double"))
          .otherwise(round(q, 4) + 0.0).as("lb_q"),
        lit(6L).as("df"),
        when(col("see") <= 0 || col("nn") < 10, lit(null).cast("double"))
          .otherwise(floor(p * 1e8 + 0.5) / 1e8).as("p"))
  }

  val q275LjungBoxSql: String =
    s"""WITH d AS ($dailySql),
       |df0 AS (
       |  SELECT day, rev - LAG(rev, 1) OVER (ORDER BY day) AS dx FROM d),
       |df AS (SELECT day, dx FROM df0 WHERE dx IS NOT NULL),
       |t AS (SELECT COUNT(*) AS n, SUM(CAST(dx AS HUGEINT)) AS sx FROM df),
       |e AS (
       |  SELECT day, t.n,
       |    CAST(dx AS HUGEINT) * t.n - t.sx AS e
       |  FROM df CROSS JOIN t),
       |den AS (SELECT SUM(e * e) AS see, MAX(n) AS nn FROM e),
       |wide AS (
       |  SELECT n, e,
       |    LAG(e, 1) OVER (ORDER BY day) AS e1,
       |    LAG(e, 2) OVER (ORDER BY day) AS e2,
       |    LAG(e, 3) OVER (ORDER BY day) AS e3,
       |    LAG(e, 4) OVER (ORDER BY day) AS e4,
       |    LAG(e, 5) OVER (ORDER BY day) AS e5,
       |    LAG(e, 6) OVER (ORDER BY day) AS e6
       |  FROM e),
       |lagged AS (
       |  SELECT e AS y, 1 AS lag, e1 AS x FROM wide
       |  UNION ALL SELECT e, 2, e2 FROM wide
       |  UNION ALL SELECT e, 3, e3 FROM wide
       |  UNION ALL SELECT e, 4, e4 FROM wide
       |  UNION ALL SELECT e, 5, e5 FROM wide
       |  UNION ALL SELECT e, 6, e6 FROM wide),
       |perlag AS (
       |  SELECT lag, SUM(x * y) AS sxy FROM lagged
       |  WHERE x IS NOT NULL GROUP BY lag),
       |qs AS (
       |  SELECT den.nn,
       |    SUM((CAST(sxy AS DOUBLE) / CAST(see AS DOUBLE))
       |      * (CAST(sxy AS DOUBLE) / CAST(see AS DOUBLE))
       |      / (CAST(nn AS DOUBLE) - CAST(lag AS DOUBLE))) AS tsum,
       |    MAX(CAST(see AS DOUBLE)) AS seed
       |  FROM perlag CROSS JOIN den GROUP BY den.nn)
       |SELECT CAST(nn AS BIGINT) AS n_diffs,
       |  CASE WHEN seed <= 0 OR nn < 10 THEN NULL ELSE
       |    ROUND(CAST(nn AS DOUBLE) * (nn + 2.0) * tsum, 4) + 0 END AS lb_q,
       |  CAST(6 AS BIGINT) AS df,
       |  CASE WHEN seed <= 0 OR nn < 10 THEN NULL ELSE
       |    FLOOR(exp(-(CAST(nn AS DOUBLE) * (nn + 2.0) * tsum) / 2.0)
       |      * (1.0 + (nn * (nn + 2.0) * tsum) / 2.0
       |        + (nn * (nn + 2.0) * tsum) * (nn * (nn + 2.0) * tsum) / 8.0)
       |      * 1e8 + 0.5) / 1e8 END AS p
       |FROM qs""".stripMargin

  /** L223 spectral entropy of the daily-revenue series ([PK] Inouye et
    * al. 1991; Goerg 2013 for the forecastability reading): Shannon
    * entropy of the NORMALIZED periodogram over all Fourier
    * frequencies k = 1..⌊n/2⌋ — the "how forecastable is this series"
    * scalar that q266's three fixed periods cannot give (H_norm → 0:
    * one frequency carries everything, a pure cycle; → 1: white noise,
    * nothing to forecast). Also reports the peak period n/k*.
    *
    * Parity: the q266 kernel generalized — demeaned ε = rev·n − s in
    * exact DECIMAL, per-term cos/sin products floor-quantized /1e6,
    * per-frequency power (sc² + ss²) exact DECIMAL, shares p_k =
    * P_k/ΣP exact-integer ratios; each −p·ln p term floor-quantized
    * 1e-9 and int-summed. Peak k breaks power ties toward the lowest
    * frequency.
    *
    * Scale: the frequency explosion is census × ⌊n/2⌋ — bounded by
    * the SQUARE of the (time-span-bounded) daily census, never by the
    * corpus; one window over the ≤n/2-row power census. Guards: n < 4
    * or zero variance → null entropy. */
  def q290SpectralEntropy(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val d0 = graft.ops.PrefixSum.withPrefixSums(
      daily(s, dir).select(col("day"), col("rev")),
      Seq(col("day")), Seq((lit(1L), "rn")))
      .select((col("rn") - 1).as("tt"), col("rev"))
      .localCheckpoint(eager = false)
    val tot = d0.agg(count(lit(1)).as("n"), sum(col("rev")).as("s"))
    val e = d0.crossJoin(broadcast(tot))
      .select(col("tt"), col("n"),
        (col("rev").cast(dec) * col("n").cast(dec) - col("s").cast(dec))
          .as("eps"))
    val ang = col("tt").cast("double") * col("k").cast("double") *
      (lit(2.0 * math.Pi) / col("n").cast("double"))
    val perK = e
      .select(col("*"), explode(when(col("n") >= 4L,
        sequence(lit(1L), (col("n") / lit(2L)).cast("long")))
        .otherwise(array().cast("array<bigint>"))).as("k"))
      .select(col("k"), col("n"),
        floor(col("eps").cast("double") * cos(ang) / 1e6 + 0.5)
          .cast("long").as("cq"),
        floor(col("eps").cast("double") * sin(ang) / 1e6 + 0.5)
          .cast("long").as("sq2"))
      .groupBy("k", "n")
      .agg(sum(col("cq")).as("sc"), sum(col("sq2")).as("ss"))
      .select(col("k"), col("n"),
        (col("sc").cast(dec) * col("sc").cast(dec) +
          col("ss").cast(dec) * col("ss").cast(dec)).as("pw"))
    val w = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val shared = perK
      .withColumn("tp", sum(col("pw")).over(w))
      .withColumn("nf", count(lit(1)).over(w))
      .withColumn("pmax", max(col("pw")).over(w))
    val p = col("pw").cast("double") / col("tp").cast("double")
    val g = shared
      .select(col("n"), col("nf"), col("tp"),
        when(col("pw") > 0L,
          floor(-p * log(p) * 1e9 + 0.5).cast("long")).otherwise(0L)
          .as("tq"),
        when(col("pw") === col("pmax"), col("k")).as("pk"))
      .groupBy("n", "nf", "tp")
      .agg(sum(col("tq")).as("hq"), min(col("pk")).as("peak_k"))
    val h = col("hq").cast("double") / 1e9
    val lnf = floor(log(col("nf").cast("double")) * 1e9 + 0.5) / 1e9
    val bad = col("tp") <= 0L || col("nf") < 2L
    g.select(col("n").as("n_days"), col("nf").as("n_freqs"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(h, 6) + 0.0).as("spectral_entropy"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(h / lnf, 6) + 0.0).as("h_norm"),
      when(bad, lit(null).cast("long")).otherwise(col("peak_k"))
        .as("peak_k"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(col("n").cast("double") /
          col("peak_k").cast("double"), 4) + 0.0).as("peak_period"))
  }

  val q290SpectralEntropySql: String =
    s"""WITH d AS ($dailySql),
       |r AS (SELECT ROW_NUMBER() OVER (ORDER BY day) - 1 AS tt, rev
       |      FROM d),
       |tot AS (SELECT COUNT(*) AS n, CAST(SUM(rev) AS BIGINT) AS s
       |        FROM r),
       |e AS (
       |  SELECT tt, n, CAST(rev AS HUGEINT) * n - s AS eps
       |  FROM r, tot),
       |f AS (
       |  SELECT tt, n, eps,
       |    unnest(generate_series(1,
       |      CASE WHEN n >= 4 THEN n // 2 ELSE 0 END)) AS k
       |  FROM e),
       |p1 AS (
       |  SELECT k, n,
       |    CAST(SUM(CAST(FLOOR(CAST(eps AS DOUBLE)
       |      * cos(CAST(tt AS DOUBLE) * CAST(k AS DOUBLE)
       |        * (2.0 * pi() / CAST(n AS DOUBLE))) / 1e6 + 0.5)
       |      AS BIGINT)) AS BIGINT) AS sc,
       |    CAST(SUM(CAST(FLOOR(CAST(eps AS DOUBLE)
       |      * sin(CAST(tt AS DOUBLE) * CAST(k AS DOUBLE)
       |        * (2.0 * pi() / CAST(n AS DOUBLE))) / 1e6 + 0.5)
       |      AS BIGINT)) AS BIGINT) AS ss
       |  FROM f GROUP BY k, n),
       |p2 AS (
       |  SELECT k, n,
       |    CAST(sc AS HUGEINT) * sc + CAST(ss AS HUGEINT) * ss AS pw
       |  FROM p1),
       |sh AS (
       |  SELECT k, n, pw, SUM(pw) OVER () AS tp, COUNT(*) OVER () AS nf,
       |    MAX(pw) OVER () AS pmax
       |  FROM p2),
       |t AS (
       |  SELECT n, nf, tp,
       |    CASE WHEN pw > 0 THEN CAST(FLOOR(
       |      -(CAST(pw AS DOUBLE) / CAST(tp AS DOUBLE))
       |      * ln(CAST(pw AS DOUBLE) / CAST(tp AS DOUBLE)) * 1e9 + 0.5)
       |      AS BIGINT) ELSE 0 END AS tq,
       |    CASE WHEN pw = pmax THEN k END AS pk
       |  FROM sh),
       |g AS (
       |  SELECT n, CAST(nf AS BIGINT) AS nf, tp,
       |    CAST(SUM(tq) AS BIGINT) AS hq, MIN(pk) AS peak_k
       |  FROM t GROUP BY n, nf, tp)
       |SELECT n AS n_days, nf AS n_freqs,
       |  CASE WHEN tp <= 0 OR nf < 2 THEN NULL
       |    ELSE ROUND(CAST(hq AS DOUBLE) / 1e9, 6) + 0 END
       |    AS spectral_entropy,
       |  CASE WHEN tp <= 0 OR nf < 2 THEN NULL
       |    ELSE ROUND((CAST(hq AS DOUBLE) / 1e9)
       |      / (FLOOR(LN(CAST(nf AS DOUBLE)) * 1e9 + 0.5) / 1e9), 6) + 0
       |    END AS h_norm,
       |  CASE WHEN tp <= 0 OR nf < 2 THEN NULL
       |    ELSE CAST(peak_k AS BIGINT) END AS peak_k,
       |  CASE WHEN tp <= 0 OR nf < 2 THEN NULL
       |    ELSE ROUND(CAST(n AS DOUBLE) / peak_k, 4) + 0 END
       |    AS peak_period
       |FROM g""".stripMargin

  /** L224 sample entropy SampEn(m=2, r=0.2σ) of the last 365 daily
    * revenues ([PK] Richman & Moorman 2000): the regularity/complexity
    * scalar — the negative log conditional probability that two
    * observation windows matching for m=2 points (componentwise within
    * r) still match at the 3rd. Low SampEn = self-similar, repeating
    * dynamics; high = irregular. Complements q252 Hurst (long-range
    * dependence) and q290 spectral entropy (frequency spread) on the
    * same series; unlike approximate entropy it excludes self-matches,
    * so it is unbiased at this window size.
    *
    * Parity: the tolerance is pinned to INTEGER dollars r =
    * ⌊0.2σ̂+0.5⌋ (σ̂ from exact int moments, one deterministic double
    * chain + IEEE sqrt), so every template comparison is exact int64;
    * A and B are exact pair counts; SampEn = (qln B − qln A)/1e9 on
    * integer args (the q187 convention), 6dp.
    *
    * Scale: the 365-row recency cut and tolerance broadcasts hide
    * under the lazy checkpoint (q262 form); the one surfacing
    * nested-loop is the ≤364×364 broadcast pair build over the
    * embedded census — scale-constant work however large the corpus.
    * Guards: A = 0 or B = 0 → null SampEn (counts still reported). */
  def q292SampleEntropy(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val d0 = graft.ops.PrefixSum.withPrefixSums(
      daily(s, dir).select(col("day"), col("rev")),
      Seq(col("day")), Seq((lit(1L), "rn")))
      .select(col("rn"), col("rev"))
      .localCheckpoint(eager = false)
    val nmax = d0.agg(max(col("rn")).as("nmax"))
    val rc = d0.crossJoin(broadcast(nmax))
      .filter(col("rn") > col("nmax") - 365L)
      .select(col("rn"), col("rev"))
    val st = rc.agg(count(lit(1)).as("nw"), sum(col("rev")).as("s"),
      sum(col("rev").cast(dec) * col("rev").cast(dec)).as("q"))
    val nD = col("nw").cast("double")
    val sd = sqrt(nD * col("q").cast("double") -
      col("s").cast("double") * col("s").cast("double")) / nD
    val rc2 = rc.crossJoin(broadcast(st))
      .select(col("rn"), col("rev"), col("nw"),
        floor(lit(0.2) * sd + 0.5).cast("long").as("rl"))
      .localCheckpoint(eager = false)
    val wo = Window.orderBy("rn")
    // r14 (advisor fix): Richman–Moorman counts BOTH A and B over the
    // same N−m templates — restricting to rows with x2 keeps the last
    // window (which could only ever B-match) out of the B census, so
    // the two counts share a template set and SampEn loses its slight
    // upward bias. The brute reference in StatBruteSpec is re-pinned
    // to the same N−2 walk.
    val emb = rc2
      .withColumn("x1", lead(col("rev"), 1).over(wo))
      .withColumn("x2", lead(col("rev"), 2).over(wo))
      .filter(col("x1").isNotNull && col("x2").isNotNull)
      .withColumnRenamed("rev", "x0")
    val bm = abs(col("a.x0") - col("b.x0")) <= col("a.rl") &&
      abs(col("a.x1") - col("b.x1")) <= col("a.rl")
    val am = bm && abs(col("a.x2") - col("b.x2")) <= col("a.rl")
    val g = emb.as("a").join(broadcast(emb.as("b")),
        col("a.rn") < col("b.rn"))
      .agg(max(col("a.nw")).as("n_days"), max(col("a.rl")).as("r_dollars"),
        sum(when(bm, 1L).otherwise(0L)).as("b_pairs"),
        sum(when(am, 1L).otherwise(0L)).as("a_pairs"))
    def qln9(c: Column) =
      floor(log(c.cast("double")) * 1e9 + 0.5).cast("long")
    g.select(col("n_days"), col("r_dollars"), col("b_pairs"),
      col("a_pairs"),
      when(col("a_pairs") === 0L || col("b_pairs") === 0L,
        lit(null).cast("double"))
        .otherwise(round((qln9(col("b_pairs")) - qln9(col("a_pairs")))
          .cast("double") / 1e9, 6) + 0.0).as("sampen"))
  }

  val q292SampleEntropySql: String =
    s"""WITH d AS ($dailySql),
       |r0 AS (SELECT ROW_NUMBER() OVER (ORDER BY day) AS rn, rev FROM d),
       |rc AS (SELECT rn, rev FROM r0
       |  WHERE rn > (SELECT MAX(rn) FROM r0) - 365),
       |st AS (SELECT COUNT(*) AS nw, CAST(SUM(rev) AS BIGINT) AS s,
       |  SUM(CAST(rev AS HUGEINT) * rev) AS q FROM rc),
       |rc2 AS (
       |  SELECT rn, rev, nw,
       |    CAST(FLOOR(0.2 * (SQRT(CAST(nw AS DOUBLE) * CAST(q AS DOUBLE)
       |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / CAST(nw AS DOUBLE))
       |      + 0.5) AS BIGINT) AS rl
       |  FROM rc, st),
       |emb AS (
       |  SELECT rn, rev AS x0, nw, rl,
       |    LEAD(rev, 1) OVER (ORDER BY rn) AS x1,
       |    LEAD(rev, 2) OVER (ORDER BY rn) AS x2
       |  FROM rc2),
       |m AS (SELECT * FROM emb WHERE x1 IS NOT NULL AND x2 IS NOT NULL),
       |p AS (
       |  SELECT a.nw, a.rl,
       |    CASE WHEN ABS(a.x0 - b.x0) <= a.rl AND ABS(a.x1 - b.x1) <= a.rl
       |      THEN 1 ELSE 0 END AS bm,
       |    CASE WHEN ABS(a.x0 - b.x0) <= a.rl AND ABS(a.x1 - b.x1) <= a.rl
       |      AND ABS(a.x2 - b.x2) <= a.rl THEN 1 ELSE 0 END AS am
       |  FROM m a JOIN m b ON a.rn < b.rn),
       |g AS (
       |  SELECT CAST(MAX(nw) AS BIGINT) AS n_days,
       |    CAST(MAX(rl) AS BIGINT) AS r_dollars,
       |    CAST(SUM(bm) AS BIGINT) AS b_pairs,
       |    CAST(SUM(am) AS BIGINT) AS a_pairs
       |  FROM p)
       |SELECT n_days, r_dollars, b_pairs, a_pairs,
       |  CASE WHEN a_pairs = 0 OR b_pairs = 0 THEN NULL
       |    ELSE ROUND(CAST(CAST(FLOOR(LN(CAST(b_pairs AS DOUBLE)) * 1e9
       |        + 0.5) AS BIGINT)
       |      - CAST(FLOOR(LN(CAST(a_pairs AS DOUBLE)) * 1e9 + 0.5)
       |        AS BIGINT) AS DOUBLE) / 1e9, 6) + 0 END AS sampen
       |FROM g""".stripMargin
}
