package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Parity._

/** Event-time operators: as-of join J8, tumbling/sliding/session windows
  * T1–T3, and the T6 conversion funnel (SURVEY.md §2.3, §2.9) — batch
  * forms over the `events` table; streaming variants live in ScalaTest
  * (`MemoryStream`) per §5.
  *
  * Scale notes: the as-of join uses the union + carry-forward rewrite —
  * ONE shuffle on user_id and no candidate-pair blowup (a join-based
  * as-of materializes every (purchase, earlier view) pair before ranking;
  * this form is linear in events per user). Session windows use
  * gaps-and-islands, also a single user_id shuffle. All window buckets
  * group by derived columns — plain hash aggregation, partial+final.
  */
object EventQueries {

  /** J8 as-of join: for each purchase, the latest view by the same user
    * at-or-before the purchase (ties: view before purchase at equal ts;
    * among equal-ts views the highest event_id wins — deterministic).
    * Implemented as union + running `last(struct, ignoreNulls)` so the
    * whole op is one shuffle; the oracle uses the equivalent
    * join + ROW_NUMBER form (same semantics, DuckDB-friendly). */
  def q56AsofViewPurchase(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      // fuzz hardening (r12): drop anonymous events — the window's NULL
      // partition would attribute views across unrelated null-user rows
      // (and the mirror's NULL-rejecting equi-join disagrees)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "view", 0).otherwise(1).as("tag"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(
      when(col("tag") === 0, struct(col("ts").as("v_ts"), col("event_id").as("v_id"))),
      ignoreNulls = true).over(w)
    e.withColumn("last_view", carried)
      .filter(col("tag") === 1)
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"),
        col("last_view.v_id").as("view_id"),
        col("last_view.v_ts").as("view_ts"))
      .orderBy("user_id", "purchase_id")
  }

  val q56AsofViewPurchaseSql: String =
    """WITH p AS (SELECT user_id, event_id, ts FROM events
      |          WHERE event_type = 'purchase' AND user_id IS NOT NULL),
      |     v AS (SELECT user_id, event_id, ts FROM events
      |          WHERE event_type = 'view' AND user_id IS NOT NULL)
      |SELECT user_id, purchase_id, purchase_ts, view_id, view_ts FROM (
      |  SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
      |    v.event_id AS view_id, v.ts AS view_ts,
      |    ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY v.ts DESC, v.event_id DESC) AS rn
      |  FROM p LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts)
      |WHERE rn = 1
      |ORDER BY user_id, purchase_id""".stripMargin

  /** J8 via the native merge operator (plans.AsofJoin*): same semantics
    * and oracle as q56, but planned as AsofJoinExec — a custom
    * LogicalPlan + Strategy + physical two-pointer merge registered
    * through the session's extension hooks. Keeping both forms under the
    * t2 gate pins the rewrite and the native operator to each other. */
  def q62AsofNative(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    graft.plans.AsofJoinOp.asofJoin(purchases, views,
        leftKey = "user_id", rightKey = "v_user_id",
        leftTs = "purchase_ts", rightTs = "view_ts", tie = Some("view_id"))
      .select("user_id", "purchase_id", "purchase_ts", "view_id", "view_ts")
      .orderBy("user_id", "purchase_id")
  }

  /** q62's own mirror (r12): q56 now drops anonymous events because its
    * window-based rewrite pools NULL users into one pseudo-partition;
    * the NATIVE as-of op follows SQL join semantics (NULL keys match
    * nothing → purchase kept, view columns null), so its mirror keeps
    * them — the fuzz gate pins that the custom operator treats NULL
    * keys exactly like the equi-join it replaces. */
  val q62AsofNativeSql: String =
    """WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
      |     v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view')
      |SELECT user_id, purchase_id, purchase_ts, view_id, view_ts FROM (
      |  SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
      |    v.event_id AS view_id, v.ts AS view_ts,
      |    ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY v.ts DESC, v.event_id DESC) AS rn
      |  FROM p LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts)
      |WHERE rn = 1
      |ORDER BY user_id, purchase_id""".stripMargin

  /** T1 tumbling window: hourly event counts + value sums per type.
    * Spark `window()` aligns 1-hour buckets to epoch hours, i.e. exactly
    * `date_trunc('hour', ts)`. */
  def q57Tumbling(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        dec4(sum(dm(col("value")))).as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("bucket_start", "event_type")
  }

  val q57TumblingSql: String =
    s"""SELECT date_trunc('hour', ts) AS bucket_start, event_type,
       |  COUNT(*) AS n, ${out4(s"SUM(CAST(value AS $DM))")} AS sum_value
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY bucket_start, event_type""".stripMargin

  /** T2 sliding window: 1-hour windows sliding every 15 minutes. Each
    * event lands in 4 buckets; the oracle mirrors Spark's expansion
    * explicitly (bucket k = 15-min bucket minus k*15min, k=0..3). */
  def q58Sliding(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("window.start").as("bucket_start"), col("n"), col("n_users"))
      .orderBy("bucket_start")
  }

  val q58SlidingSql: String =
    """SELECT bucket_start, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
      |FROM (SELECT time_bucket(INTERVAL '15 minutes', ts) - to_minutes(15 * k) AS bucket_start,
      |             user_id
      |      FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k))
      |GROUP BY 1
      |ORDER BY bucket_start""".stripMargin

  /** T3 session windows (30-minute gap) via gaps-and-islands: one
    * user_id shuffle, no session_window operator needed in batch. */
  def q59Sessions(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
    val newSession = when(gapUs.isNull || gapUs > 30L * 60 * 1000000, 1).otherwise(0)
    e.withColumn("new_s", newSession)
      .withColumn("session_id",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_id")
  }

  val q59SessionsSql: String =
    """SELECT user_id, session_id, MIN(ts) AS session_start,
      |  MAX(ts) AS session_end, COUNT(*) AS n_events
      |FROM (
      |  SELECT user_id, ts,
      |    -- CAST AS BIGINT: DuckDB windowed integer SUM widens to
      |    -- HUGEINT → pandas float64, vs Spark's int64
      |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM (
      |    SELECT user_id, ts, event_id,
      |      CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1) OVER
      |             (PARTITION BY user_id ORDER BY ts, event_id)
      |           IS NOT DISTINCT FROM NULL THEN 1
      |           WHEN epoch_us(ts) - LAG(epoch_us(ts), 1) OVER
      |             (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000 THEN 1
      |           ELSE 0 END AS new_s
      |    FROM events))
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** T6 funnel: first signup per user, first purchase at-or-after it,
    * conversion latency in whole seconds (exact µs integer floor). */
  def q60Funnel(s: SparkSession, dir: String): DataFrame = {
    // fuzz hardening (r12): drop anonymous events (q56 rationale)
    val e = Tables.events(s, dir).filter(col("user_id").isNotNull)
    val w = Window.partitionBy(col("user_id"))
    val firstSignup = min(when(col("event_type") === "signup", col("ts"))).over(w)
    e.withColumn("signup_ts", firstSignup)
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "signup", col("ts"))).as("signup_ts"),
        min(when(col("event_type") === "purchase" && col("ts") >= col("signup_ts"),
          col("ts"))).as("conv_ts"))
      .withColumn("conv_sec",
        expr("(unix_micros(conv_ts) - unix_micros(signup_ts)) div 1000000"))
      .orderBy("user_id")
  }

  val q60FunnelSql: String =
    """WITH f AS (
      |  SELECT user_id, MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id)
      |SELECT user_id, signup_ts, conv_ts,
      |  (epoch_us(conv_ts) - epoch_us(signup_ts)) // 1000000 AS conv_sec
      |FROM (
      |  SELECT f.user_id, f.signup_ts, MIN(e.ts) AS conv_ts
      |  FROM f LEFT JOIN events e
      |    ON e.user_id = f.user_id AND e.event_type = 'purchase'
      |   AND e.ts >= f.signup_ts
      |  GROUP BY f.user_id, f.signup_ts)
      |ORDER BY user_id""".stripMargin

  /** Sweep-line interval algebra: peak concurrency per event type when
    * each event occupies [ts, ts+10min) — the "max simultaneous
    * sessions / resource utilization" shape that windowed aggregation
    * cannot express (concurrency changes at BOUNDARIES, not fixed
    * buckets). Boundary explode (+1 at start, −1 at end) → keyed
    * running sum → max, with −1 sorted before +1 at equal timestamps
    * so half-open intervals never double-count a touch.
    *
    * Determinism under ties: rows with identical (bt, delta) are
    * interchangeable — the running-sum value MULTISET (and therefore
    * the per-type max and the first boundary timestamp reaching it) is
    * identical for every tie permutation in both engines.
    *
    * Scale: one shuffle on event_type for the running-sum window (2
    * rows per event), one map-side-combinable agg for the peak, and a
    * 5-row broadcast back — no self-join, no interval cross product.
    * With a high-cardinality partition key this is the textbook keyed
    * sweep; a single global sweep would need range-partitioned prefix
    * sums instead. */
  def q106PeakConcurrency(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val b = e.select(col("event_type"), col("ts").as("bt"), lit(1).as("delta"))
      .unionAll(e.select(col("event_type"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("bt"), lit(-1).as("delta")))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("bt"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = b.withColumn("cur", sum(col("delta")).over(w))
    val peaks = c.groupBy("event_type").agg(max(col("cur")).as("peak"))
    c.join(broadcast(peaks), "event_type")
      .filter(col("cur") === col("peak"))
      .groupBy("event_type")
      .agg(first(col("peak")).as("peak"), min(col("bt")).as("first_peak_ts"))
      .orderBy("event_type")
  }

  val q106PeakConcurrencySql: String =
    """WITH b AS (
      |  SELECT event_type, ts AS bt, 1 AS delta FROM events
      |  UNION ALL
      |  SELECT event_type, ts + INTERVAL 10 MINUTE AS bt, -1 AS delta FROM events),
      |c AS (
      |  SELECT event_type, bt,
      |    SUM(delta) OVER (PARTITION BY event_type ORDER BY bt, delta
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cur
      |  FROM b),
      |p AS (SELECT event_type, MAX(cur) AS peak FROM c GROUP BY event_type)
      |SELECT c.event_type, CAST(p.peak AS BIGINT) AS peak,
      |  MIN(c.bt) AS first_peak_ts
      |FROM c JOIN p ON c.event_type = p.event_type AND c.cur = p.peak
      |GROUP BY c.event_type, p.peak
      |ORDER BY c.event_type""".stripMargin

  /** Cohort retention matrix: users are cohorted by the ISO week of
    * their FIRST event; each (cohort_wk, week_no) cell counts the
    * distinct users from that cohort active week_no weeks later. The
    * product-analytics staple that funnels (q60) and sessions (q59)
    * don't cover — activity relative to a per-user anchor.
    *
    * Parity: week buckets via `date_trunc('week', …)` (ISO Monday
    * start in both engines); week_no is an exact day-diff of two
    * week-truncated stamps `div` 7, cast BIGINT on both sides; the
    * cell value is a plain COUNT over an already user-distinct
    * activity set — all integers, hash-exact.
    *
    * Scale: the anchor agg and the distinct both shuffle on user_id,
    * the join is user_id-to-user_id (co-partitioned, AQE can reuse
    * the exchange), and the final agg's output is bounded by
    * |weeks|² — independent of user count. No windows, no
    * count-distinct expand (the distinct upstream already pays that
    * cost once, map-side combinable). */
  def q109CohortRetention(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).filter(col("user_id").isNotNull)
    val cohort = e.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort_wk"))
    val activity = e
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    activity.join(cohort, "user_id")
      .withColumn("week_no",
        expr("CAST(datediff(wk, cohort_wk) div 7 AS BIGINT)"))
      .groupBy("cohort_wk", "week_no")
      .agg(count(lit(1)).as("active_users"))
      .orderBy("cohort_wk", "week_no")
  }

  val q109CohortRetentionSql: String =
    """WITH cohort AS (
      |  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_wk
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      |activity AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
      |  FROM events WHERE user_id IS NOT NULL)
      |-- DuckDB date_trunc('week', ts) yields DATE; Spark yields
      |-- TIMESTAMP — re-align the output type
      |SELECT CAST(cohort_wk AS TIMESTAMP) AS cohort_wk,
      |  CAST(date_diff('day', cohort_wk, wk) // 7 AS BIGINT) AS week_no,
      |  COUNT(*) AS active_users
      |FROM activity JOIN cohort USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** First-order Markov transition matrix of event types: for each
    * user's time-ordered event stream, count consecutive
    * (from_type → to_type) pairs and the per-source transition
    * probability. The behavioral-flow shape (what follows what) that
    * the funnel (q60) — which pins ONE fixed sequence — doesn't give.
    *
    * Parity: (ts, event_id) totally orders each user's stream, so
    * `lead` is deterministic; counts are exact BIGINTs; p is one
    * IEEE-exact int64→double division rounded at 6 (q14 discipline).
    * The per-source total stays internal (DuckDB SUM widens to
    * HUGEINT — the q101 lesson — so it must not be projected).
    *
    * Scale: one user_id shuffle for the lead window (linear in events
    * per user), then a map-side-combinable count bounded by
    * |event_type|²; totals re-aggregate that bounded set and
    * broadcast back. */
  def q112Transitions(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).filter(col("user_id").isNotNull)
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cnt = e.withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy("from_type").agg(sum("n").as("tot"))
    cnt.join(broadcast(tot), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (rnd(col("n").cast("double") / col("tot").cast("double"), 6) + 0.0)
          .as("p"))
      .orderBy("from_type", "to_type")
  }

  val q112TransitionsSql: String =
    """WITH pairs AS (
      |  SELECT event_type AS from_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS to_type
      |  FROM events WHERE user_id IS NOT NULL),
      |cnt AS (SELECT from_type, to_type, COUNT(*) AS n FROM pairs
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT from_type, SUM(n) AS tot FROM cnt GROUP BY 1)
      |SELECT from_type, to_type, n,
      |  ROUND(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) + 0 AS p
      |FROM cnt JOIN tot USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  /** Session path mining: sessionize each user's stream with q59's
    * 30-minute gap rule, render each session as its ordered
    * event-type path ("view>view>purchase"), and rank the top-20
    * most common paths. The sequence-mining complement to q112 —
    * whole-journey frequencies, not one-step transitions.
    *
    * Parity: the path is assembled from a `sort_array` of
    * (ts, event_id, event_type) structs — the same (ts, event_id)
    * total order the DuckDB `string_agg(… ORDER BY ts, event_id)`
    * uses, so both engines emit identical strings; counts and ranks
    * are integers with a (count desc, path) total tie-break.
    *
    * Scale: ONE user_id shuffle — the session window's partitioning
    * (user_id) already satisfies the (user_id, session_id) group-by's
    * clustered distribution, so the path build adds no exchange; the
    * path count is map-side combinable and the top-20 collapses to
    * TakeOrderedAndProject. Path strings grow with session length
    * (bounded by the gap rule's burst structure, same class as q16's
    * collected arrays); cap with `slice` before `array_join` if a
    * domain ever produces pathological sessions. */
  def q113SessionPaths(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).filter(col("user_id").isNotNull)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
    val newSession = when(gapUs.isNull || gapUs > 30L * 60 * 1000000, 1).otherwise(0)
    val paths = e.withColumn("new_s", newSession)
      .withColumn("session_id", sum(col("new_s"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(array_join(
        transform(
          sort_array(collect_list(
            struct(col("ts"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path")).limit(20)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("n_sessions").desc, col("path"))))
      .select(col("rnk"), col("path"), col("n_sessions"))
      .orderBy("rnk")
  }

  val q113SessionPathsSql: String =
    """WITH s AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_id
      |  FROM (
      |    SELECT user_id, ts, event_id, event_type,
      |      CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1) OVER
      |             (PARTITION BY user_id ORDER BY ts, event_id)
      |           IS NOT DISTINCT FROM NULL THEN 1
      |           WHEN epoch_us(ts) - LAG(epoch_us(ts), 1) OVER
      |             (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |             THEN 1
      |           ELSE 0 END AS new_s
      |    FROM events WHERE user_id IS NOT NULL)),
      |p AS (SELECT user_id, session_id,
      |        string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      |      FROM s GROUP BY user_id, session_id),
      |c AS (SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY path)
      |SELECT rnk, path, n_sessions FROM (
      |  SELECT path, n_sessions,
      |    ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path) AS rnk FROM c)
      |WHERE rnk <= 20 ORDER BY rnk""".stripMargin

  /** Inter-event dwell-time distribution: the gap from each event to
    * the SAME user's next event (any type), attributed to the earlier
    * event's type, summarized per type as exact p50/p90 seconds and
    * the max. Latency-profile analytics over the (ts, event_id)
    * stream order q112/q113 establish.
    *
    * Parity: gaps are exact integer microseconds (µs-truncated
    * timestamps on both engines, FIXTURES.md hazard #1); Spark
    * `percentile` == DuckDB `quantile_cont` (q15's A10 contract) with
    * the /1e6 conversion and q14-style rounding applied AFTER the
    * exact-µs percentile; max_s is integer floor-divided — hash-exact.
    *
    * Scale: one user_id shuffle for the lead window, then a
    * map-side-combinable agg to the |event_type|-bounded output. The
    * exact percentile holds per-group gap multisets; swap in
    * `percentile_approx` when a type's event count outgrows executor
    * memory (the q15/q107 note). */
  def q114DwellTimes(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).filter(col("user_id").isNotNull)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val g = e.withColumn("gap_us",
        unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
      .filter(col("gap_us").isNotNull)
    g.groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        rnd(percentile(col("gap_us"), lit(0.5)) / 1e6).as("p50_s"),
        rnd(percentile(col("gap_us"), lit(0.9)) / 1e6).as("p90_s"),
        expr("CAST(max(gap_us) div 1000000 AS BIGINT)").as("max_s"))
      .orderBy("event_type")
  }

  val q114DwellTimesSql: String =
    """WITH g AS (
      |  SELECT event_type,
      |    LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      - epoch_us(ts) AS gap_us
      |  FROM events WHERE user_id IS NOT NULL)
      |SELECT event_type, COUNT(*) AS n_gaps,
      |  ROUND(quantile_cont(gap_us, 0.5) / 1e6, 4) AS p50_s,
      |  ROUND(quantile_cont(gap_us, 0.9) / 1e6, 4) AS p90_s,
      |  CAST(MAX(gap_us) // 1000000 AS BIGINT) AS max_s
      |FROM g WHERE gap_us IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Per-event-type user reach with a Wilson 95% lower confidence
    * bound — the statistically honest way to rank funnel steps or
    * feature adoption when group sizes differ: the raw share of users
    * who performed the event at least once is optimistic for small
    * cohorts, while the Wilson score interval (Wilson 1927, the
    * recommendation-ranking standard) discounts exactly by sample size.
    *
    * Parity: counts are exact (distinct users per type / overall, the
    * latter collected once as a driver scalar and inlined — the q121
    * totals discipline); the Wilson formula is one +,*,/,sqrt tree
    * written with identical association for both engines — IEEE
    * division/multiplication are deterministic and sqrt is
    * correctly-rounded by spec, so the doubles match bit-for-bit before
    * round(4).
    *
    * Scale: one (event_type, user_id) distinct — map-side combinable —
    * then a 5-row projection; the global distinct-user count is one
    * scan-level aggregate. */
  def q133WilsonReach(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    // in-plan 1-row reach broadcast (q242 form, r13: the last build-time
    // .head() bounds fetches left any builder path); the double chain
    // reproduces the old literal-interpolated arithmetic op-for-op
    val tot = e.select(countDistinct(col("user_id")).cast("double").as("n"))
    val k = e.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("k"))
    val z2 = lit(1.96 * 1.96)
    val nn = col("n")
    val p = col("p")
    k.crossJoin(broadcast(tot))
      .withColumn("p", col("k").cast("double") / nn)
      .withColumn("wilson_lo", round(
        (p + z2 / (lit(2.0) * nn) - lit(1.96) *
          sqrt(p * (lit(1.0) - p) / nn + z2 / (lit(4.0) * nn * nn))) /
          (lit(1.0) + z2 / nn), 4))
      .select(col("event_type"), col("k"), round(col("p"), 4).as("p"),
        col("wilson_lo"))
      .orderBy("event_type")
  }

  val q133WilsonReachSql: String = {
    val z2 = 1.96 * 1.96
    val nSub = "(SELECT COUNT(DISTINCT user_id) FROM events)"
    s"""WITH t AS (
       |  SELECT event_type, COUNT(DISTINCT user_id) AS k,
       |    CAST($nSub AS BIGINT) AS n
       |  FROM events GROUP BY event_type)
       |SELECT event_type, k,
       |  ROUND(CAST(k AS DOUBLE) / n, 4) AS p,
       |  ROUND((CAST(k AS DOUBLE) / n + $z2 / (2.0 * n)
       |    - 1.96 * SQRT(CAST(k AS DOUBLE) / n * (1.0 - CAST(k AS DOUBLE) / n) / n
       |                  + $z2 / (4.0 * n * n)))
       |    / (1.0 + $z2 / n), 4) AS wilson_lo
       |FROM t ORDER BY event_type""".stripMargin
  }

  /** Interval-union coverage per user — total DISTINCT time covered by
    * possibly-overlapping activity intervals ([ts, ts + value hours]):
    * the classic interval-union-length sweep, the integral partner of
    * q106's point-in-time peak concurrency. Covered vs total exposes
    * the overlap factor a per-interval SUM silently double-counts —
    * the difference between "users were active 100 hours" and "users'
    * intervals total 100 hours".
    *
    * The sweep needs only the running maximum of interval ends over the
    * start-ordered sequence: each interval contributes
    * max(0, e − max(s, prior_max_end)) — exactly its un-covered
    * extension. One window, no interval self-join (the O(n²) trap), no
    * island reconstruction.
    *
    * Parity: endpoints are exact int64 microseconds (unix_micros ==
    * epoch_us; the duration rounds once from double); the window frame
    * is ROWS UNBOUNDED PRECEDING→1 PRECEDING with a total (s, e,
    * event_id) order, so the running max is engine-identical; sums and
    * the GREATEST clamp stay integer, one division at the end.
    *
    * Scale: one user_id shuffle shared by the window and the agg;
    * per-user state is one running maximum — no buffering, no
    * quadratic pair space. The streaming form of the same recurrence
    * fits transformWithState with one int64 of state per key. */
  def q137IntervalUnion(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val iv = e.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("s"),
      (unix_micros(col("ts")) +
        expr("cast(round(value * 3600 * 1000000) as bigint)")).as("e"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("s"), col("e"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    iv.withColumn("pmax", max(col("e")).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_iv"),
        sum(greatest(col("e") - greatest(col("s"),
          coalesce(col("pmax"), col("s"))), lit(0L))).as("covered_us"),
        sum(col("e") - col("s")).as("total_us"))
      .withColumn("coverage",
        round(col("covered_us").cast("double") / col("total_us"), 4))
      .orderBy("user_id")
  }

  /** Rolling 7-day active users and DAU/WAU stickiness — THE product
    * engagement ratio. Rolling DISTINCT counts resist window frames
    * (COUNT(DISTINCT) OVER RANGE exists in neither engine) and the
    * naive day×day self-join is quadratic in the calendar; the
    * scale-safe form is contribution expansion — each (day, user)
    * activity row contributes to the 7 target days it is visible in
    * (the q149 neighbor-offset shape in time), then one distinct +
    * count per target day. Expansion is a bounded 7×, never
    * |days|×|days|.
    *
    * Parity: date arithmetic on exact integer day offsets; counts
    * exact; one division at output. Early days carry partial windows
    * (standard dashboard semantics).
    *
    * Scale: (day, user) distinct is one map-side-combinable shuffle;
    * the 7× explode is a per-row map; the final distinct/count
    * shuffles on (day, user) — all keyed, no windows, no self-joins. */
  def q152RollingActive(s: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = du
      .withColumn("off", explode(typedlit((0 to 6).toList)))
      .select(date_add(col("day"), col("off")).as("day"), col("user_id"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 4).as("stickiness"))
      .orderBy("day")
  }

  val q152RollingActiveSql: String =
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY day),
      |w AS (
      |  SELECT DISTINCT day + CAST(o.off AS INTEGER) AS day, user_id
      |  FROM du, (SELECT unnest(generate_series(0, 6)) AS off) o),
      |wau AS (SELECT day, COUNT(*) AS wau FROM w GROUP BY day)
      |SELECT d.day, d.dau, w2.wau,
      |  ROUND(CAST(d.dau AS DOUBLE) / w2.wau, 4) AS stickiness
      |FROM dau d JOIN wau w2 USING (day)
      |ORDER BY d.day""".stripMargin

  /** Session entry-point attribution — which event type OPENS sessions,
    * and how often those sessions convert: sessionize by an 8-hour
    * inactivity gap (q59's gaps-and-islands machinery), take each
    * session's first event as its entry, flag sessions containing a
    * purchase, and report conversion per entry type. First-touch
    * attribution at session granularity — the funnel-entry view a
    * growth dashboard leads with.
    *
    * Parity: the session id is an integer running sum of gap flags
    * over the total (ts, event_id) order; entry = first_value over the
    * same order within the session; conversion is an exact max-flag;
    * one division at output.
    *
    * Scale: ONE user_id shuffle serves the lag window, the running
    * sum, the per-session window and the session agg (all share the
    * user_id partitioning; the final ≤|types|-group agg is map-side).
    * No self-joins, no fact-sized windows without keys. */
  def q151EntryAttribution(s: SparkSession, dir: String): DataFrame = {
    val byTs = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val e = Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byTs))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 28800000000L,
          1L).otherwise(0L))
      .withColumn("sid", sum("is_new").over(
        byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bySession = Window.partitionBy("user_id", "sid")
      .orderBy("ts", "event_id")
    val sessions = e
      .withColumn("entry_type", first("event_type").over(bySession))
      .groupBy("user_id", "sid")
      .agg(min("entry_type").as("entry_type"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
    sessions.groupBy("entry_type")
      .agg(count(lit(1)).as("n_sessions"),
        sum("converted").as("n_converted"))
      .withColumn("conv_rate",
        round(col("n_converted").cast("double") / col("n_sessions"), 4))
      .orderBy("entry_type")
  }

  val q151EntryAttributionSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, ts,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 28800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, event_id, event_type, ts,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM e),
      |fe AS (
      |  SELECT user_id, sid, event_type,
      |    FIRST_VALUE(event_type) OVER (PARTITION BY user_id, sid
      |      ORDER BY ts, event_id) AS entry_type
      |  FROM s),
      |agg AS (
      |  SELECT user_id, sid, MIN(entry_type) AS entry_type,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS converted
      |  FROM fe GROUP BY user_id, sid)
      |SELECT entry_type, COUNT(*) AS n_sessions,
      |  CAST(SUM(converted) AS BIGINT) AS n_converted,
      |  ROUND(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 4) AS conv_rate
      |FROM agg GROUP BY entry_type ORDER BY entry_type""".stripMargin

  /** Longest consecutive-day activity streak per user — the
    * gaps-and-islands date variant behind retention/engagement
    * dashboards ("current streak", "best streak"): distinct active
    * days collapse to runs where day_number − row_number is constant
    * (each gap shifts the difference), and the longest run is one max.
    *
    * Parity: day numbers are exact integer datediffs from the epoch;
    * row_number runs over the per-user DISTINCT day sequence (unique,
    * so the order is total); all counts exact.
    *
    * Scale: one user_id shuffle shared by the distinct, the window and
    * both aggs; per-user state is the day list (bounded by the
    * calendar, ~365/year/user). No self-join, no date spine. */
  def q141Streaks(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val w = Window.partitionBy("user_id").orderBy("d")
    d.withColumn("grp",
        datediff(col("d"), lit("1970-01-01")) - row_number().over(w))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(sum("len").as("n_days"), max("len").as("max_streak"),
        count(lit(1)).as("n_streaks"))
      .orderBy("user_id")
  }

  val q141StreaksSql: String =
    """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |g AS (
      |  SELECT user_id, d,
      |    date_diff('day', DATE '1970-01-01', d)
      |      - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
      |  FROM d),
      |s AS (SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY 1, 2)
      |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_days,
      |  MAX(len) AS max_streak, COUNT(*) AS n_streaks
      |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin

  val q137IntervalUnionSql: String =
    """WITH iv AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS s,
      |    epoch_us(ts) + CAST(ROUND(value * 3600 * 1000000) AS BIGINT) AS e
      |  FROM events),
      |w AS (
      |  SELECT user_id, s, e,
      |    MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |  FROM iv)
      |SELECT user_id, COUNT(*) AS n_iv,
      |  CAST(SUM(GREATEST(e - GREATEST(s, COALESCE(pmax, s)), 0)) AS BIGINT)
      |    AS covered_us,
      |  CAST(SUM(e - s) AS BIGINT) AS total_us,
      |  ROUND(CAST(SUM(GREATEST(e - GREATEST(s, COALESCE(pmax, s)), 0)) AS DOUBLE)
      |    / CAST(SUM(e - s) AS BIGINT), 4) AS coverage
      |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Weekly growth accounting — the canonical engagement decomposition
    * every growth dashboard leads with: each active (user, week) is
    * exactly one of NEW (first week ever), RETAINED (also active the
    * immediately-preceding calendar week) or RESURRECTED (returning
    * after a gap); CHURNED(w) = active(w−1) − retained(w), the users
    * the previous week lost. Identity n_active = n_new + n_retained +
    * n_resurrected holds by construction — the oracle hash pins it.
    * q109's cohort matrix slices the same activity by cohort age;
    * q152's DAU/WAU is the rolling-window view; this is the
    * week-over-week flow decomposition.
    *
    * Parity: weeks are `date_trunc('week')` (both engines anchor
    * Monday) cast to DATE; "previous week" is exact date arithmetic
    * (wk − 7 days), so sparse weeks classify correctly; counts exact
    * int64; first week's churn is NULL in both engines (LAG off the
    * edge).
    *
    * Scale: one distinct over (user, week) + per-user window (both on
    * the same user shuffle) + a week-keyed map-side agg; the final
    * LAG runs over the week-count-bounded aggregate, not fact rows. */
  def q159GrowthAccounting(s: SparkSession, dir: String): DataFrame = {
    val uw = Tables.events(s, dir)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    val byU = Window.partitionBy("user_id").orderBy("wk")
    val cls = uw
      .withColumn("first_wk", min("wk").over(Window.partitionBy("user_id")))
      .withColumn("prev_wk", lag(col("wk"), 1).over(byU))
      .withColumn("cls",
        when(col("wk") === col("first_wk"), "new")
          .when(col("prev_wk") === date_sub(col("wk"), 7), "retained")
          .otherwise("resurrected"))
    val weekly = cls.groupBy("wk").agg(
      count(lit(1)).as("n_active"),
      sum(when(col("cls") === "new", 1L).otherwise(0L)).as("n_new"),
      sum(when(col("cls") === "retained", 1L).otherwise(0L)).as("n_retained"),
      sum(when(col("cls") === "resurrected", 1L).otherwise(0L))
        .as("n_resurrected"))
    weekly
      .withColumn("n_churned",
        lag(col("n_active"), 1).over(Window.orderBy("wk")) - col("n_retained"))
      .orderBy("wk")
  }

  val q159GrowthAccountingSql: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', ts) AS DATE) AS wk
      |  FROM events),
      |c AS (
      |  SELECT user_id, wk,
      |    MIN(wk) OVER (PARTITION BY user_id) AS first_wk,
      |    LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk
      |  FROM uw),
      |cls AS (
      |  SELECT wk,
      |    CASE WHEN wk = first_wk THEN 'new'
      |         WHEN prev_wk = wk - 7 THEN 'retained'
      |         ELSE 'resurrected' END AS cls
      |  FROM c),
      |weekly AS (
      |  SELECT wk, COUNT(*) AS n_active,
      |    CAST(SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_new,
      |    CAST(SUM(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_retained,
      |    CAST(SUM(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_resurrected
      |  FROM cls GROUP BY wk)
      |SELECT wk, n_active, n_new, n_retained, n_resurrected,
      |  LAG(n_active) OVER (ORDER BY wk) - n_retained AS n_churned
      |FROM weekly ORDER BY wk""".stripMargin

  /** Markov transition matrix between consecutive event types per user
    * — the user-journey model a recommendation / funnel team fits
    * first: P(next = b | current = a) from every adjacent event pair in
    * each user's (ts, event_id)-ordered stream. Session-agnostic by
    * design (the session-scoped variant composes q151's sid first).
    *
    * Parity: pair ordering is the q151 (ts, event_id) total order;
    * counts are exact int64; probabilities are the half-up 4-decimal
    * integer division against the per-prev-type row total. Scale: one
    * user-partition lag window (the §2.5 backbone) then a
    * |types|²-group map-side-combinable count; the row-total join is
    * a broadcast of ≤|types| rows. */
  def q166Transitions(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = e
      .withColumn("prev_et", lag(col("event_type"), 1).over(w))
      .filter(col("prev_et").isNotNull)
      .groupBy(col("prev_et"), col("event_type").as("next_et"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("prev_et").agg(sum("n").as("tot"))
    val h = col("n") * 20000L + col("tot")
    val d2 = col("tot") * 2L
    pairs.join(broadcast(totals), "prev_et")
      .select(col("prev_et"), col("next_et"), col("n"),
        (((h - pmod(h, d2)) / d2).cast("long") / 10000.0).as("p"))
      .orderBy("prev_et", "next_et")
  }

  val q166TransitionsSql: String =
    """WITH pr AS (
      |  SELECT LAG(event_type) OVER (PARTITION BY user_id
      |           ORDER BY ts, event_id) AS prev_et,
      |         event_type AS next_et
      |  FROM events),
      |pairs AS (
      |  SELECT prev_et, next_et, COUNT(*) AS n
      |  FROM pr WHERE prev_et IS NOT NULL GROUP BY prev_et, next_et),
      |tt AS (SELECT prev_et, CAST(SUM(n) AS BIGINT) AS tot
      |       FROM pairs GROUP BY prev_et)
      |SELECT p.prev_et, p.next_et, p.n,
      |  ((p.n * 20000 + t.tot) // (t.tot * 2)) / 10000.0 AS p
      |FROM pairs p JOIN tt t ON p.prev_et = t.prev_et
      |ORDER BY p.prev_et, p.next_et""".stripMargin

  /** Engagement-concentration Lorenz table: users ranked into activity
    * deciles (most-active first), with each decile's user count, event
    * count, event share, and CUMULATIVE share — the "top 10% of users
    * produce X% of events" census (the distribution view of q150's
    * scalar Gini). Decile assignment runs through [[RangedNtile]] — the
    * exact-NTILE machinery with no single-reducer sort, since the USER
    * census grows with the corpus — and the Lorenz accumulation is a
    * window over exactly 10 rows.
    *
    * Parity: NTILE tie placement is made deterministic by the (n desc,
    * user_id) total order (the q98 contract); shares use the half-up
    * integer division. */
  def q167Lorenz(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val dec = RangedNtile.withNtile(perUser, 10,
      Seq(col("n").desc, col("user_id")), "decile")
    val byDec = dec.groupBy("decile")
      .agg(count(lit(1)).as("n_users"), sum("n").as("n_events"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withTot = byDec
      .withColumn("cum_events", sum("n_events").over(w))
      .withColumn("tot", sum("n_events").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    def share(c: org.apache.spark.sql.Column) = {
      val h = c * 20000L + col("tot")
      val d2 = col("tot") * 2L
      ((h - pmod(h, d2)) / d2).cast("long") / 10000.0
    }
    withTot.select(col("decile"), col("n_users"), col("n_events"),
        share(col("n_events")).as("share"),
        share(col("cum_events")).as("cum_share"))
      .orderBy("decile")
  }

  val q167LorenzSql: String =
    """WITH u AS (
      |  SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
      |d AS (
      |  SELECT user_id, n,
      |    NTILE(10) OVER (ORDER BY n DESC, user_id) AS decile
      |  FROM u),
      |b AS (
      |  SELECT decile, COUNT(*) AS n_users, CAST(SUM(n) AS BIGINT)
      |    AS n_events
      |  FROM d GROUP BY decile),
      |c AS (
      |  SELECT decile, n_users, n_events,
      |    CAST(SUM(n_events) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_events,
      |    CAST(SUM(n_events) OVER () AS BIGINT) AS tot
      |  FROM b)
      |SELECT decile, n_users, n_events,
      |  ((n_events * 20000 + tot) // (tot * 2)) / 10000.0 AS share,
      |  ((cum_events * 20000 + tot) // (tot * 2)) / 10000.0 AS cum_share
      |FROM c ORDER BY decile""".stripMargin

  /** Strict-order WINDOWED 3-step funnel (view → click within 6 h →
    * purchase within 6 h of the click): a user reaches stage k only
    * via events in TIME ORDER and inside the per-step conversion
    * window — the MATCH_RECOGNIZE-class ordered-sequence semantic that
    * plain per-type mins get wrong (q60 is the 2-step unwindowed
    * special case). Census output: users reaching each stage + half-up
    * conversion share vs stage 1. Window arithmetic is exact µs
    * integers (`unix_micros`, the q151 discipline).
    *
    * Scale: each stage is one filtered scan joined to the previous
    * stage's USER-keyed aggregate (monotonically shrinking), then a
    * min — hash equi-joins and map-side-combinable aggs throughout;
    * the stage-1 total rides as a driver scalar (q121/q133 discipline)
    * so the census needs no one-row broadcast join. */
  def q168Funnel3(s: SparkSession, dir: String): DataFrame = {
    val winUs = 21600L * 1000000L
    val e = Tables.events(s, dir)
    val t1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val t2 = e.filter(col("event_type") === "click")
      .join(t1, "user_id").filter(col("ts") >= col("t1") &&
        expr("unix_micros(ts) - unix_micros(t1)") <= winUs)
      .groupBy("user_id").agg(min("ts").as("t2"))
    val t3 = e.filter(col("event_type") === "purchase")
      .join(t2, "user_id").filter(col("ts") >= col("t2") &&
        expr("unix_micros(ts) - unix_micros(t2)") <= winUs)
      .groupBy("user_id").agg(min("ts").as("t3"))
    val n1 = t1.count()
    def stage(name: String, d: DataFrame) =
      d.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"),
        col("n_users"))
    val census = stage("1_view", t1)
      .unionByName(stage("2_click", t2))
      .unionByName(stage("3_purchase", t3))
    val h = col("n_users") * 20000L + lit(n1)
    val d2 = lit(n1) * 2L
    census.select(col("stage"), col("n_users"),
        (((h - pmod(h, d2)) / d2).cast("long") / 10000.0).as("share"))
      .orderBy("stage")
  }

  val q168Funnel3Sql: String =
    """WITH t1 AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      |  JOIN t1 ON e.user_id = t1.user_id AND e.ts >= t1.t1
      |   AND epoch_us(e.ts) - epoch_us(t1.t1) <= 21600000000
      |  WHERE e.event_type = 'click' GROUP BY e.user_id),
      |t3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      |  JOIN t2 ON e.user_id = t2.user_id AND e.ts >= t2.t2
      |   AND epoch_us(e.ts) - epoch_us(t2.t2) <= 21600000000
      |  WHERE e.event_type = 'purchase' GROUP BY e.user_id),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1 FROM t1),
      |census AS (
      |  SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM t1
      |  UNION ALL SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM t2
      |  UNION ALL SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM t3)
      |SELECT stage, n_users,
      |  ((n_users * 20000 + n.n1) // (n.n1 * 2)) / 10000.0 AS share
      |FROM census, n ORDER BY stage""".stripMargin

  /** Last-touch marketing attribution through the NATIVE as-of join:
    * each purchase is attributed to the user's latest click at-or-before
    * it within a 6-hour lookback (tolerance), ties among equal-ts clicks
    * to the highest event_id (the q56/q62 rule); revenue then rolls up
    * per campaign (the click's `props.k`), campaign −1 = unattributed
    * (no qualifying click — COALESCE'd so null group ordering can never
    * diverge between engines, the q157 hazard).
    *
    * This is AsofJoinExec's tolerance path under the oracle gate with a
    * downstream aggregate on top — the attribution join IS the ad-tech /
    * conversion-credit workload as-of joins exist for. Scale: the
    * native two-pointer merge runs co-partitioned on user (one
    * exchange+sort per side, one buffered right row per partition);
    * the rollup is a ≤|campaigns|-group map-side-combinable agg. */
  def q169Attribution(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("revenue"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
    graft.plans.AsofJoinOp.asofJoin(purchases, clicks,
        leftKey = "user_id", rightKey = "c_user_id",
        leftTs = "purchase_ts", rightTs = "click_ts", tie = Some("click_id"),
        tolerance = Some(21600L * 1000000L))
      .select(coalesce(col("k"), lit(-1)).as("campaign"), col("revenue"))
      .groupBy("campaign")
      .agg(count(lit(1)).as("n_purchases"),
        dec4(sum(dm(col("revenue")))).as("revenue"))
      .orderBy("campaign")
  }

  val q169AttributionSql: String =
    s"""WITH p AS (
       |  SELECT user_id, event_id, ts, value FROM events
       |  WHERE event_type = 'purchase'),
       |c AS (
       |  SELECT user_id, event_id, ts,
       |    CAST(json_extract_string(props, '$$.k') AS INTEGER) AS k
       |  FROM events WHERE event_type = 'click'),
       |a AS (
       |  SELECT p.event_id AS pid, p.value, c.k,
       |    ROW_NUMBER() OVER (PARTITION BY p.event_id
       |      ORDER BY c.ts DESC, c.event_id DESC) AS rn
       |  FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
       |    AND epoch_us(p.ts) - epoch_us(c.ts) <= 21600000000)
       |SELECT COALESCE(k, -1) AS campaign,
       |  COUNT(*) AS n_purchases,
       |  ${out4(s"SUM(CAST(value AS $DM))")} AS revenue
       |FROM a WHERE rn = 1
       |GROUP BY 1 ORDER BY campaign""".stripMargin

  /** L110 two-proportion z-test — the experimentation readout: users
    * deterministically split into variants by `user_id % 2`, conversion
    * = at least one purchase of value ≥ 150 (plain "any purchase" is
    * degenerate on this fixture — every user converts, the pooled
    * variance is 0, and ANSI division-by-zero aborts; the threshold
    * keeps both rates interior at every SF); the pooled-variance z
    * statistic
    * (p̂_a − p̂_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)) decides whether the
    * conversion-rate gap is noise. Complements q133's per-item Wilson
    * bound (a CI on ONE proportion) with the classic A-vs-B TEST.
    *
    * Parity: all counts are exact int64 conditional sums; rates and z
    * are a fixed chain of int64→double IEEE ops, identical on both
    * engines, rounded 6/4dp.
    *
    * Scale: per-user conversion is one map-side-combinable keyed agg;
    * the final global agg exchanges four longs. Nothing grows with the
    * event count. */
  def q172AbZtest(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).filter(col("user_id").isNotNull)
    val perUser = e.groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase" && col("value") >= 150.0,
        1L).otherwise(0L)).as("conv"))
      .withColumn("variant", pmod(col("user_id"), lit(2L)))
    val agg = perUser.agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("variant") === 0, col("conv")).otherwise(0L)).as("x_a"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("variant") === 1, col("conv")).otherwise(0L)).as("x_b"))
    val pa = col("x_a").cast("double") / col("n_a")
    val pb = col("x_b").cast("double") / col("n_b")
    val pp = (col("x_a") + col("x_b")).cast("double") / (col("n_a") + col("n_b"))
    agg.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      round(pa, 6).as("rate_a"), round(pb, 6).as("rate_b"),
      round((pa - pb) /
        sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 4).as("z"))
  }

  val q172AbZtestSql: String =
    """WITH u AS (
      |  SELECT user_id, user_id % 2 AS variant,
      |    MAX(CASE WHEN event_type = 'purchase' AND value >= 150.0
      |        THEN 1 ELSE 0 END) AS conv
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      |a AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS x_a,
      |    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS x_b
      |  FROM u)
      |SELECT n_a, x_a, n_b, x_b,
      |  ROUND(CAST(x_a AS DOUBLE) / n_a, 6) AS rate_a,
      |  ROUND(CAST(x_b AS DOUBLE) / n_b, 6) AS rate_b,
      |  ROUND((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b) /
      |    SQRT((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
      |         (1 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
      |         (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)), 4) AS z
      |FROM a""".stripMargin

  /** L111 LINEAR multi-touch attribution — q169's last-touch rule gives
    * the whole conversion to one click; here each purchase's value is
    * split EQUALLY across every click by the same user in the 6-hour
    * lookback, penny-exact: value is first pinned to int64 4dp units
    * (⌊v·10⁴+0.5⌋, the q103 micro-unit discipline), each click gets the
    * integer quotient, and the remainder goes to the EARLIEST clicks
    * (ts, event_id order) — largest-remainder proration (q117's rule),
    * so per-campaign credits sum to exactly the purchase value.
    * Purchases with no qualifying click credit campaign −1 in full.
    *
    * Parity: everything after the 4dp pin is int64 arithmetic — the
    * cross-engine hash is exact by construction, no double sums.
    *
    * Scale: the pair join is user-keyed with a 6-hour band — candidate
    * volume ∝ clicks-per-user-per-6h (bounded by activity rate, not
    * corpus size); the two purchase-partitioned windows (count + rank)
    * ride one shuffle on purchase_id; the rollup is ≤|campaigns|+1
    * groups, map-side combinable. */
  def q173LinearAttribution(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val p = e.filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(col("user_id"), col("event_id").as("pid"), col("ts").as("pts"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("cid"),
        col("ts").as("cts"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
    val pairs = p.join(c,
      col("user_id") === col("c_user") && col("cts") <= col("pts") &&
        unix_micros(col("pts")) - unix_micros(col("cts")) <= 21600L * 1000000L,
      "left")
    val wp = Window.partitionBy(col("pid"))
    val kt = count(col("cid")).over(wp)
    val rn = row_number().over(wp.orderBy(col("cts").asc_nulls_first, col("cid")))
    val credited = pairs
      .withColumn("kt", kt).withColumn("rn", rn)
      .select(
        when(col("kt") === 0, lit(-1)).otherwise(coalesce(col("k"), lit(-1)))
          .as("campaign"),
        col("pid"),
        when(col("kt") === 0, col("v4"))
          .otherwise(expr("v4 div kt") +
            when(col("rn") <= expr("v4 % kt"), 1L).otherwise(0L))
          .as("credit4"))
    credited.groupBy("campaign")
      .agg(countDistinct(col("pid")).as("n_purchases"),
        count(lit(1)).as("n_touches"),
        (sum(col("credit4")) / 10000.0).as("revenue"))
      .orderBy("campaign")
  }

  val q173LinearAttributionSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id AS pid, ts AS pts,
      |    CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT) AS v4
      |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
      |c AS (
      |  SELECT user_id, event_id AS cid, ts AS cts,
      |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |  FROM events WHERE event_type = 'click'),
      |pairs AS (
      |  SELECT p.pid, p.v4, c.cid, c.cts, c.k
      |  FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.cts <= p.pts
      |    AND epoch_us(p.pts) - epoch_us(c.cts) <= 21600000000),
      |win AS (
      |  SELECT pid, v4, k,
      |    COUNT(cid) OVER (PARTITION BY pid) AS kt,
      |    ROW_NUMBER() OVER (PARTITION BY pid
      |      ORDER BY cts ASC NULLS FIRST, cid) AS rn
      |  FROM pairs),
      |cr AS (
      |  SELECT CASE WHEN kt = 0 THEN -1 ELSE COALESCE(k, -1) END AS campaign,
      |    pid,
      |    CASE WHEN kt = 0 THEN v4
      |         ELSE v4 // kt + CASE WHEN rn <= v4 % kt THEN 1 ELSE 0 END
      |    END AS credit4
      |  FROM win)
      |SELECT campaign, COUNT(DISTINCT pid) AS n_purchases,
      |  COUNT(*) AS n_touches,
      |  CAST(SUM(credit4) AS BIGINT) / 10000.0 AS revenue
      |FROM cr GROUP BY campaign ORDER BY campaign""".stripMargin

  /** L113 Kaplan–Meier survival of user lifetimes — the
    * retention-analytics estimator under RIGHT CENSORING: lifetime =
    * whole HOURS between a user's first and last event; a user whose
    * last event is within 12 hours of corpus end is CENSORED (still
    * active when observation stopped), not churned. (Hour resolution
    * and a 12 h horizon, not days: the events fixture spans 29 days
    * and every user's last-event gap is ≤ 2 days, so any day-scale
    * horizon classifies ZERO churners and the whole survival family
    * measures nothing — r10 found exactly that vacuity via the q224
    * brute-force reference.) Per lifetime hour t:
    * users at risk n_t, churn events d_t, censored c_t, and
    * S(t) = Π_{t'≤t} (1 − d_{t'}/n_{t'}) — the estimator that plain
    * "average lifetime" gets wrong by treating censored users as
    * churned.
    *
    * Parity: counts are exact int64; the survival product runs as a
    * cumulative Σ ln((n−d)/n) over the ≤|days|-row day table in one
    * ascending window — BOTH engines accumulate the identical doubles
    * in the identical row order, so the sum is bit-deterministic (the
    * q167 tiny-global-window shape); exp + 4dp round on output. Once a
    * day has d = n (everyone at risk churns) survival pins to exactly
    * 0 via a cumulative flag — no ln(0) is ever evaluated (ANSI-safe
    * on Spark, error-free on DuckDB).
    *
    * Scale: one user-keyed agg collapses events to |users| lifetimes;
    * the day census is a ≤|days|-group hash agg; only the day table
    * (dozens of rows at any corpus size — lifetimes are calendar-
    * bounded) rides the global window. Corpus end and the user total
    * ride an in-plan 1-row broadcast (the q242 form, backported r12 —
    * no build-time driver action). */
  def q175KaplanMeier(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).filter(col("user_id").isNotNull)
    val bounds = e.agg(max(unix_micros(col("ts"))).as("end_us"),
      countDistinct("user_id").as("nu"))
    val peru = e.groupBy("user_id")
      .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .crossJoin(broadcast(bounds))
      .select(expr("(unix_micros(last_ts) - unix_micros(first_ts))" +
        " div 3600000000").as("t"),
        when(unix_micros(col("last_ts")) <=
          col("end_us") - 12L * 3600L * 1000000L, 1L)
          .otherwise(0L).as("churn"),
        col("nu"))
    val day = peru.groupBy("t")
      .agg(sum(col("churn")).as("d"), sum(lit(1L) - col("churn")).as("c"),
        max(col("nu")).as("nu"))
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRisk = day.withColumn("n_risk",
      col("nu") - coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
    val dead = max(when(col("d") >= col("n_risk"), 1L).otherwise(0L)).over(wCum)
    val lnTerm = when(col("d") === 0 || col("d") >= col("n_risk"), lit(0.0))
      .otherwise(log((col("n_risk") - col("d")).cast("double") /
        col("n_risk").cast("double")))
    withRisk
      .withColumn("dead", dead)
      .withColumn("ln_s", sum(lnTerm).over(wCum))
      .select(col("t").as("t_hours"), col("n_risk"), col("d").as("n_churn"),
        col("c").as("n_censored"),
        when(col("dead") === 1L, lit(0.0))
          .otherwise(round(exp(col("ln_s")), 4)).as("survival"))
      .orderBy("t_hours")
  }

  val q175KaplanMeierSql: String =
    """WITH e AS (
      |  SELECT user_id, ts FROM events WHERE user_id IS NOT NULL),
      |b AS (SELECT MAX(ts) AS fin, COUNT(DISTINCT user_id) AS nu FROM e),
      |peru AS (
      |  SELECT CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 3600000000
      |      AS BIGINT) AS t,
      |    CASE WHEN epoch_us(MAX(ts)) <=
      |      (SELECT epoch_us(fin) - 43200000000 FROM b)
      |      THEN 1 ELSE 0 END AS churn
      |  FROM e GROUP BY user_id),
      |day AS (
      |  SELECT t, CAST(SUM(churn) AS BIGINT) AS d,
      |    CAST(SUM(1 - churn) AS BIGINT) AS c
      |  FROM peru GROUP BY t),
      |risk AS (
      |  SELECT t, d, c,
      |    (SELECT nu FROM b) - CAST(COALESCE(SUM(d + c) OVER
      |      (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      0) AS BIGINT) AS n_risk
      |  FROM day),
      |cum AS (
      |  SELECT t, n_risk, d, c,
      |    MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER
      |      (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS dead,
      |    SUM(CASE WHEN d = 0 OR d >= n_risk THEN CAST(0 AS DOUBLE)
      |             ELSE LN(CAST(n_risk - d AS DOUBLE) / n_risk) END) OVER
      |      (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS ln_s
      |  FROM risk)
      |SELECT t AS t_hours, n_risk, d AS n_churn, c AS n_censored,
      |  CASE WHEN dead = 1 THEN 0.0 ELSE ROUND(EXP(ln_s), 4) END AS survival
      |FROM cum ORDER BY t_hours""".stripMargin

  /** L126 debounce dedup — tolerance-based event suppression: within
    * each (user, event_type), an event arriving ≤ 5 s after its
    * predecessor is a bounce (double-click, retry storm, duplicate
    * webhook) and is dropped; only burst STARTS survive. This is the
    * time-tolerant sibling of L2's exact keep-latest (equality keys
    * can't catch near-simultaneous duplicates with distinct ids) and
    * the batch analog of T5's streaming dropDuplicates-within-watermark.
    *
    * A burst start is simply a row whose gap to the previous same-key
    * event is NULL or > the tolerance — one lag window, no burst-id
    * cumsum needed when only counts per key are emitted.
    *
    * Parity: gaps are exact µs int64 (unix_micros / epoch_us); ties on
    * ts break by event_id, so the lag order is total on both engines.
    *
    * Scale: one keyed window, partitioned by (user, event_type) — the
    * same per-user-bounded state as the session operators; no global
    * sort anywhere. */
  def q188Debounce(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val tolMicros = 5000000L
    Tables.events(s, dir)
      .withColumn("gap",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .select(col("user_id"), col("event_type"),
        when(col("gap").isNull || col("gap") > tolMicros, 1L)
          .otherwise(0L).as("keep"))
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_events"), sum("keep").as("n_kept"))
      .orderBy("user_id", "event_type")
  }

  val q188DebounceSql: String =
    """WITH g AS (
      |  SELECT user_id, event_type,
      |    epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (
      |      PARTITION BY user_id, event_type
      |      ORDER BY ts, event_id) AS gap
      |  FROM events),
      |k AS (
      |  SELECT user_id, event_type,
      |    CASE WHEN gap IS NULL OR gap > 5000000 THEN 1 ELSE 0 END AS keep
      |  FROM g)
      |SELECT user_id, event_type, COUNT(*) AS n_events,
      |  CAST(SUM(keep) AS BIGINT) AS n_kept
      |FROM k GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  /** L131 inter-event burstiness (Goh & Barabási 2008 [PK]) — per-user
    * B = (σ−μ)/(σ+μ) over inter-arrival gaps: −1 = metronome, 0 =
    * Poisson, →1 = bursty. The temporal-signature statistic the event
    * family still lacked (q59 sessionizes, q141 streaks daily activity,
    * q188 suppresses bursts — none MEASURES burstiness), and the
    * standard screen for bot-like vs human cadence before trusting
    * per-user engagement features.
    *
    * Parity: gaps floor to whole seconds (exact int64 `div`, so Σg² ≤
    * (2.6e6)²·|events| stays far under 2^63); μ, σ and B are one fixed
    * int→double chain (population variance Σg²/n − μ², clamped at 0
    * before the IEEE-exact sqrt); gap ties order by event_id.
    *
    * Scale: one (user)-keyed lag window + one keyed agg of three int64
    * partials — per-user-bounded state, the q59 shape. */
  def q193Burstiness(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(s, dir)
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .select(col("user_id"), expr("gap_us div 1000000").as("g"))
    val mean = col("sg").cast("double") / col("n").cast("double")
    val variance = col("sq").cast("double") / col("n").cast("double") -
      (col("sg").cast("double") / col("n").cast("double")) *
      (col("sg").cast("double") / col("n").cast("double"))
    val std = sqrt(greatest(variance, lit(0.0)))
    gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("g")).as("sg"),
        sum(col("g") * col("g")).as("sq"))
      .select(col("user_id"), col("n").as("n_gaps"), mean.as("mean_s"),
        std.as("std_s"),
        when(std + mean > 0.0, (std - mean) / (std + mean))
          .otherwise(lit(0.0)).as("burstiness"))
      .orderBy("user_id")
  }

  val q193BurstinessSql: String =
    """WITH g AS (
      |  SELECT user_id,
      |    (epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (
      |       PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS g
      |  FROM events),
      |a AS (
      |  SELECT user_id, COUNT(*) AS n,
      |    CAST(SUM(g) AS BIGINT) AS sg, CAST(SUM(g * g) AS BIGINT) AS sq
      |  FROM g WHERE g IS NOT NULL GROUP BY user_id)
      |SELECT user_id, n AS n_gaps,
      |  CAST(sg AS DOUBLE) / CAST(n AS DOUBLE) AS mean_s,
      |  sqrt(GREATEST(
      |    CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)
      |      - (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
      |        * (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)) AS std_s,
      |  CASE WHEN sqrt(GREATEST(
      |      CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)
      |        - (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
      |          * (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)), 0.0))
      |      + CAST(sg AS DOUBLE) / CAST(n AS DOUBLE) > 0.0
      |    THEN (sqrt(GREATEST(
      |      CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)
      |        - (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
      |          * (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)), 0.0))
      |      - CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
      |      / (sqrt(GREATEST(
      |      CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)
      |        - (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
      |          * (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)), 0.0))
      |      + CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
      |    ELSE 0.0 END AS burstiness
      |FROM a ORDER BY user_id""".stripMargin

  /** L134 time-decay multi-touch attribution — the third standard
    * credit model, completing the family: q169 last-touch (all credit
    * to the final click), q173 linear (equal split); time-decay weights
    * each click by 2^(−Δt/halflife) (1-hour half-life, 6-hour
    * lookback), the model ad platforms default to because recency
    * predicts influence.
    *
    * Parity: weights are exp of one fixed double chain on exact
    * whole-second int64 ages, then micro-quantized (1e6) to int64 — a
    * coarse enough quantum that the 1-ulp divergence allowed between
    * JVM Math.exp and DuckDB's libm (neither is correctly rounded)
    * cannot flip the quantized weight: a 1-ulp error in exp(x)≤1 is
    * ≤2⁻⁵², or ~2e-16, nine orders of magnitude below the 5e-7
    * half-quantum rounding boundary; per-touch
    * revenue credit is the q117/q173 penny-exact largest-remainder
    * apportionment of the 4dp-scaled purchase value by integer weight —
    * every credit is an exact integer decision, and per-campaign sums
    * are int64 (partition-order independent by construction).
    *
    * Scale: the q173 shape exactly — user-keyed band join (candidates ∝
    * clicks/user/6h), two purchase-keyed windows sharing one exchange,
    * ≤|campaigns|-group rollup. */
  def q196TimeDecayAttribution(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val p = e.filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(col("user_id"), col("event_id").as("pid"), col("ts").as("pts"),
        floor(col("value") * 10000.0 + 0.5).cast("long").as("v4"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("cid"),
        col("ts").as("cts"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
    val pairs = p.join(c,
      col("user_id") === col("c_user") && col("cts") <= col("pts") &&
        unix_micros(col("pts")) - unix_micros(col("cts")) <= 21600L * 1000000L,
      "left")
    val ageS = expr("(unix_micros(pts) - unix_micros(cts)) div 1000000")
    val wq = floor(
      exp(-ageS.cast("double") * (lit(0.6931471805599453) / lit(3600.0))) *
        lit(1.0e6) + lit(0.5)).cast("long")
    val wp = Window.partitionBy(col("pid"))
    val withW = pairs.withColumn("wq",
      when(col("cid").isNull, lit(0L)).otherwise(wq))
    val swq = sum(col("wq")).over(wp)
    val base = expr("(v4 * wq) div swq")
    val rem = expr("(v4 * wq) % swq")
    val rn = row_number().over(
      wp.orderBy(col("rem").desc, col("cid").asc_nulls_first))
    val credited = withW.withColumn("swq", swq)
      .withColumn("base", when(col("swq") > 0L, base).otherwise(lit(0L)))
      .withColumn("rem", when(col("swq") > 0L, rem).otherwise(lit(0L)))
      .withColumn("shortfall",
        col("v4") - sum(when(col("swq") > 0L, base).otherwise(lit(0L)))
          .over(wp))
      .withColumn("rn", rn)
      .select(
        when(col("cid").isNull, lit(-1)).otherwise(coalesce(col("k"), lit(-1)))
          .as("campaign"),
        col("pid"),
        when(col("swq") === 0L, col("v4"))
          .otherwise(col("base") +
            when(col("rn") <= col("shortfall"), 1L).otherwise(0L))
          .as("credit4"))
    credited.groupBy("campaign")
      .agg(countDistinct(col("pid")).as("n_purchases"),
        count(lit(1)).as("n_touches"),
        (sum(col("credit4")) / 10000.0).as("revenue"))
      .orderBy("campaign")
  }

  val q196TimeDecayAttributionSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id AS pid, ts AS pts,
      |    CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT) AS v4
      |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
      |c AS (
      |  SELECT user_id, event_id AS cid, ts AS cts,
      |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |  FROM events WHERE event_type = 'click'),
      |pairs AS (
      |  SELECT p.pid, p.v4, c.cid, c.k,
      |    CASE WHEN c.cid IS NULL THEN 0 ELSE
      |      CAST(FLOOR(
      |        exp(-CAST((epoch_us(p.pts) - epoch_us(c.cts)) // 1000000 AS DOUBLE)
      |            * (0.6931471805599453 / 3600.0))
      |        * 1e6 + 0.5) AS BIGINT) END AS wq
      |  FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.cts <= p.pts
      |    AND epoch_us(p.pts) - epoch_us(c.cts) <= 21600000000),
      |win AS (
      |  SELECT pid, v4, cid, k, wq,
      |    CAST(SUM(wq) OVER (PARTITION BY pid) AS BIGINT) AS swq,
      |    CASE WHEN CAST(SUM(wq) OVER (PARTITION BY pid) AS BIGINT) > 0
      |      THEN (v4 * wq) // CAST(SUM(wq) OVER (PARTITION BY pid) AS BIGINT)
      |      ELSE 0 END AS base,
      |    CASE WHEN CAST(SUM(wq) OVER (PARTITION BY pid) AS BIGINT) > 0
      |      THEN (v4 * wq) % CAST(SUM(wq) OVER (PARTITION BY pid) AS BIGINT)
      |      ELSE 0 END AS rem
      |  FROM pairs),
      |win2 AS (
      |  SELECT pid, v4, cid, k, swq, base,
      |    v4 - CAST(SUM(base) OVER (PARTITION BY pid) AS BIGINT) AS shortfall,
      |    ROW_NUMBER() OVER (PARTITION BY pid
      |      ORDER BY rem DESC, cid ASC NULLS FIRST) AS rn
      |  FROM win),
      |cr AS (
      |  SELECT CASE WHEN cid IS NULL THEN -1 ELSE COALESCE(k, -1) END AS campaign,
      |    pid,
      |    CASE WHEN swq = 0 THEN v4
      |      ELSE base + CASE WHEN rn <= shortfall THEN 1 ELSE 0 END
      |    END AS credit4
      |  FROM win2)
      |SELECT campaign, COUNT(DISTINCT pid) AS n_purchases,
      |  COUNT(*) AS n_touches,
      |  CAST(SUM(credit4) AS BIGINT) / 10000.0 AS revenue
      |FROM cr GROUP BY campaign ORDER BY campaign""".stripMargin

  /** L136 sequential-pattern support — adjacent event-type TRIGRAMS
    * ranked by USER support (the share of users whose stream contains
    * the pattern at least once): the second-order sequence census that
    * q166's first-order transition matrix cannot express (a→b and b→c
    * being common says nothing about a→b→c; the trigram table is where
    * funnels and scripted-bot signatures actually show). Support
    * counting is per-user EXISTENCE, not occurrence count — the
    * sequence-mining convention, so one hyperactive user can't promote
    * a pattern.
    *
    * Parity: two lag windows over the (user, ts, event_id)-ordered
    * stream (total order), exact distinct-user counts, and support as
    * the q166 half-up integer-division trick — no floating point until
    * the final exact division. Top-20 cut decided on (support_users
    * desc, pattern) — an exact-integer ordering.
    *
    * Scale: one keyed window pass (two lags share the sort), a
    * (user, trigram)-distinct map-side-combinable agg bounded by
    * |users|·|types|³, then a ≤125-row pattern census. */
  def q198SeqPatterns(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val tri = e
      .withColumn("p1", lag(col("event_type"), 2).over(w))
      .withColumn("p2", lag(col("event_type"), 1).over(w))
      .filter(col("p1").isNotNull)
      .select(col("user_id"), concat_ws(">", col("p1"), col("p2"),
        col("event_type")).as("pattern"))
    // fuzz hardening (r12): distinct().count() counted the NULL-user
    // pseudo-group that countDistinct (numerator, both engines) and the
    // mirror's COUNT(DISTINCT user_id) exclude — drop nulls to match
    val users = tri.select("user_id").na.drop().distinct().count()
    tri.groupBy("pattern")
      .agg(countDistinct(col("user_id")).as("support_users"),
        count(lit(1)).as("n_occurrences"))
      .select(col("pattern"), col("support_users"), col("n_occurrences"),
        (((col("support_users") * 20000L + lit(users)) -
          pmod(col("support_users") * 20000L + lit(users), lit(users * 2L))) /
          lit(users * 2L)).cast("long").cast("double")./(10000.0)
          .as("support"))
      .orderBy(col("support_users").desc, col("pattern"))
      .limit(20)
  }

  val q198SeqPatternsSql: String =
    """WITH tri AS (
      |  SELECT user_id,
      |    LAG(event_type, 2) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS p1,
      |    LAG(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS p2,
      |    event_type AS p3
      |  FROM events),
      |pat AS (
      |  SELECT user_id, p1 || '>' || p2 || '>' || p3 AS pattern
      |  FROM tri WHERE p1 IS NOT NULL),
      |u AS (SELECT COUNT(DISTINCT user_id) AS users FROM pat),
      |c AS (
      |  SELECT pattern, COUNT(DISTINCT user_id) AS support_users,
      |    COUNT(*) AS n_occurrences
      |  FROM pat GROUP BY pattern)
      |SELECT pattern, support_users, n_occurrences,
      |  CAST(((support_users * 20000 + u.users)
      |    - (support_users * 20000 + u.users) % (u.users * 2))
      |    // (u.users * 2) AS BIGINT) / 10000.0 AS support
      |FROM c CROSS JOIN u
      |ORDER BY support_users DESC, pattern LIMIT 20""".stripMargin

  /** L138 Nelson–Aalen cumulative hazard (Nelson 1972, Aalen 1978
    * [PK]) — the survival family's second estimator, over the same
    * churn construction as q175: H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ, plus the
    * Fleming–Harrington survival exp(−H). Where KM's product-limit
    * survival multiplies conditional survivals (unstable when any nᵢ
    * is small), NA SUMS hazard increments — the estimator of choice
    * for hazard-RATE readouts and for small risk sets, and the pair's
    * disagreement is itself a small-sample diagnostic.
    *
    * Parity: the (t, d, n_risk) day table is exact int64 (q175's
    * construction); each day's d/n increment is nano-quantized and
    * prefix-summed as int64 (exact, order-independent), so H is the
    * same integer-over-1e9 on both engines; exp(−H) rounds 4dp (the
    * q195 libm note). The only unkeyed window runs over the ≤|days|
    * day table, not the events.
    *
    * Scale: one keyed per-user agg, a ≤|days|-row census + two tiny
    * windows — the q175 shape exactly. */
  def q200NelsonAalen(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).filter(col("user_id").isNotNull)
    // in-plan 1-row bounds broadcast (q242 form, backported r12)
    val bounds = e.agg(max(unix_micros(col("ts"))).as("end_us"),
      countDistinct("user_id").as("nu"))
    val peru = e.groupBy("user_id")
      .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .crossJoin(broadcast(bounds))
      .select(expr("(unix_micros(last_ts) - unix_micros(first_ts))" +
        " div 3600000000").as("t"),
        when(unix_micros(col("last_ts")) <=
          col("end_us") - 12L * 3600L * 1000000L, 1L)
          .otherwise(0L).as("churn"),
        col("nu"))
    val day = peru.groupBy("t")
      .agg(sum(col("churn")).as("d"), sum(lit(1L) - col("churn")).as("c"),
        max(col("nu")).as("nu"))
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRisk = day.withColumn("n_risk",
      col("nu") - coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
    val incQ = when(col("d") === 0L || col("n_risk") <= 0L, lit(0L))
      .otherwise(floor(col("d").cast("double") / col("n_risk").cast("double") *
        lit(1.0e9) + lit(0.5)).cast("long"))
    withRisk
      .withColumn("hq", sum(incQ).over(wCum))
      .select(col("t").as("t_hours"), col("n_risk"), col("d").as("n_churn"),
        col("c").as("n_censored"),
        (col("hq").cast("double") / lit(1.0e9)).as("cum_hazard"),
        round(exp(-(col("hq").cast("double") / lit(1.0e9))), 4)
          .as("survival_fh"))
      .orderBy("t_hours")
  }

  val q200NelsonAalenSql: String =
    """WITH e AS (
      |  SELECT user_id, ts FROM events WHERE user_id IS NOT NULL),
      |b AS (SELECT MAX(ts) AS fin, COUNT(DISTINCT user_id) AS nu FROM e),
      |peru AS (
      |  SELECT CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 3600000000
      |      AS BIGINT) AS t,
      |    CASE WHEN epoch_us(MAX(ts)) <=
      |      (SELECT epoch_us(fin) - 43200000000 FROM b)
      |      THEN 1 ELSE 0 END AS churn
      |  FROM e GROUP BY user_id),
      |day AS (
      |  SELECT t, CAST(SUM(churn) AS BIGINT) AS d,
      |    CAST(SUM(1 - churn) AS BIGINT) AS c
      |  FROM peru GROUP BY t),
      |risk AS (
      |  SELECT t, d, c,
      |    (SELECT nu FROM b) - CAST(COALESCE(SUM(d + c) OVER
      |      (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      0) AS BIGINT) AS n_risk
      |  FROM day),
      |q AS (
      |  SELECT t, n_risk, d, c,
      |    CASE WHEN d = 0 OR n_risk <= 0 THEN 0
      |      ELSE CAST(FLOOR(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)
      |        * 1e9 + 0.5) AS BIGINT) END AS incq
      |  FROM risk),
      |cum AS (
      |  SELECT t, n_risk, d, c,
      |    CAST(SUM(incq) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS hq
      |  FROM q)
      |SELECT t AS t_hours, n_risk, d AS n_churn, c AS n_censored,
      |  CAST(hq AS DOUBLE) / 1e9 AS cum_hazard,
      |  ROUND(exp(-(CAST(hq AS DOUBLE) / 1e9)), 4) AS survival_fh
      |FROM cum ORDER BY t_hours""".stripMargin

  /** L158 log-rank test (Mantel 1966 [PK]): do the two user cohorts
    * (user_id parity — the q172 variant convention) have the SAME
    * churn-survival curve? At each event time the observed group-1
    * churn count is compared to its hypergeometric expectation given
    * the pooled risk set; z = (O₁−E₁)/√V summarizes. This is the
    * inferential companion to q175/q200's KM/NA CURVES — those
    * describe, this one tests.
    *
    * Parity: per-user lifetimes/churn flags and the per-day group
    * censuses are exact int64 (the q175 construction); E and V terms
    * are rationals, so each is quantized to int64 micro-units BEFORE
    * summing (floor(1e6·x + 0.5), the q196/q207 quantum — coarse
    * enough that a 1-ulp division divergence cannot flip a term) and
    * the partial-agg sum is exact-integer, partition-order free. Group
    * totals ride windows over the ≤|days| census — no 1-row broadcast,
    * no BNLJ.
    *
    * Scale: one per-user keyed agg over the fact scan; everything
    * after is the bounded day census. */
  def q224LogRank(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).filter(col("user_id").isNotNull)
    // in-plan 1-row bounds broadcast (q242 form, backported r12)
    val bounds = e.agg(max(unix_micros(col("ts"))).as("end_us"))
    val peru = e.groupBy("user_id")
      .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .crossJoin(broadcast(bounds))
      .select(expr("(unix_micros(last_ts) - unix_micros(first_ts))" +
        " div 3600000000").as("t"),
        when(unix_micros(col("last_ts")) <=
          col("end_us") - 12L * 3600L * 1000000L, 1L)
          .otherwise(0L).as("churn"),
        pmod(col("user_id"), lit(2L)).as("g"))
    val day = peru.groupBy("t")
      .agg(sum(when(col("g") === 0, col("churn")).otherwise(0L)).as("d1"),
        sum(when(col("g") === 0, lit(1L) - col("churn")).otherwise(0L)).as("c1"),
        sum(when(col("g") === 1, col("churn")).otherwise(0L)).as("d2"),
        sum(when(col("g") === 1, lit(1L) - col("churn")).otherwise(0L)).as("c2"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = day
      .withColumn("nu1", sum(col("d1") + col("c1")).over(wAll))
      .withColumn("nu2", sum(col("d2") + col("c2")).over(wAll))
      .withColumn("n1r", col("nu1") -
        coalesce(sum(col("d1") + col("c1")).over(wPrev), lit(0L)))
      .withColumn("n2r", col("nu2") -
        coalesce(sum(col("d2") + col("c2")).over(wPrev), lit(0L)))
      .filter(col("d1") + col("d2") > 0)
    val n = (col("n1r") + col("n2r")).cast("double")
    val d = (col("d1") + col("d2")).cast("double")
    val p1 = col("n1r").cast("double") / n
    val eTerm = d * p1
    val vTerm = when(col("n1r") + col("n2r") > 1,
      d * p1 * (lit(1.0) - p1) * (n - d) / (n - 1.0)).otherwise(lit(0.0))
    val g = risk
      .withColumn("eq", floor(eTerm * 1e6 + 0.5).cast("long"))
      .withColumn("vq", floor(vTerm * 1e6 + 0.5).cast("long"))
      .agg(max(col("nu1")).as("n_users_g0"), max(col("nu2")).as("n_users_g1"),
        sum(col("d1")).as("o1"), sum(col("eq")).as("e1q"),
        sum(col("vq")).as("v1q"))
    g.select(col("n_users_g0"), col("n_users_g1"), col("o1"),
      (round(col("e1q").cast("double") / 1e6, 4) + 0.0).as("e1"),
      (round((col("o1").cast("double") - col("e1q").cast("double") / 1e6) /
        sqrt(col("v1q").cast("double") / 1e6), 4) + 0.0).as("z"))
  }

  val q224LogRankSql: String =
    """WITH e AS (
      |  SELECT user_id, ts FROM events WHERE user_id IS NOT NULL),
      |b AS (SELECT MAX(epoch_us(ts)) AS end_us FROM e),
      |peru AS (
      |  SELECT CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 3600000000
      |      AS BIGINT) AS t,
      |    CASE WHEN epoch_us(MAX(ts)) <=
      |      (SELECT end_us - 43200000000 FROM b)
      |      THEN 1 ELSE 0 END AS churn,
      |    user_id % 2 AS g
      |  FROM e GROUP BY user_id),
      |day AS (
      |  SELECT t,
      |    CAST(SUM(CASE WHEN g = 0 THEN churn ELSE 0 END) AS BIGINT) AS d1,
      |    CAST(SUM(CASE WHEN g = 0 THEN 1 - churn ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(SUM(CASE WHEN g = 1 THEN churn ELSE 0 END) AS BIGINT) AS d2,
      |    CAST(SUM(CASE WHEN g = 1 THEN 1 - churn ELSE 0 END) AS BIGINT) AS c2
      |  FROM peru GROUP BY t),
      |risk AS (
      |  SELECT t, d1, d2,
      |    CAST(SUM(d1 + c1) OVER () AS BIGINT) AS nu1,
      |    CAST(SUM(d2 + c2) OVER () AS BIGINT) AS nu2,
      |    CAST(SUM(d1 + c1) OVER () AS BIGINT)
      |      - CAST(COALESCE(SUM(d1 + c1) OVER (ORDER BY t
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |        AS BIGINT) AS n1r,
      |    CAST(SUM(d2 + c2) OVER () AS BIGINT)
      |      - CAST(COALESCE(SUM(d2 + c2) OVER (ORDER BY t
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |        AS BIGINT) AS n2r
      |  FROM day),
      |terms AS (
      |  SELECT nu1, nu2, d1,
      |    CAST(FLOOR(CAST(d1 + d2 AS DOUBLE)
      |      * (CAST(n1r AS DOUBLE) / CAST(n1r + n2r AS DOUBLE))
      |      * 1e6 + 0.5) AS BIGINT) AS eq,
      |    CAST(FLOOR(CASE WHEN n1r + n2r > 1
      |      THEN CAST(d1 + d2 AS DOUBLE)
      |        * (CAST(n1r AS DOUBLE) / CAST(n1r + n2r AS DOUBLE))
      |        * (1.0 - CAST(n1r AS DOUBLE) / CAST(n1r + n2r AS DOUBLE))
      |        * (CAST(n1r + n2r AS DOUBLE) - CAST(d1 + d2 AS DOUBLE))
      |        / (CAST(n1r + n2r AS DOUBLE) - 1.0)
      |      ELSE 0.0 END * 1e6 + 0.5) AS BIGINT) AS vq
      |  FROM risk WHERE d1 + d2 > 0),
      |g AS (
      |  SELECT MAX(nu1) AS n_users_g0, MAX(nu2) AS n_users_g1,
      |    CAST(SUM(d1) AS BIGINT) AS o1,
      |    CAST(SUM(eq) AS BIGINT) AS e1q, CAST(SUM(vq) AS BIGINT) AS v1q
      |  FROM terms)
      |SELECT n_users_g0, n_users_g1, o1,
      |  ROUND(CAST(e1q AS DOUBLE) / 1e6, 4) + 0 AS e1,
      |  ROUND((CAST(o1 AS DOUBLE) - CAST(e1q AS DOUBLE) / 1e6)
      |    / SQRT(CAST(v1q AS DOUBLE) / 1e6), 4) + 0 AS z
      |FROM g""".stripMargin

  /** L174 exponential inter-arrival fit + KS goodness-of-fit: the MLE
    * rate λ̂ = n/Σg over whole-second user inter-event gaps (q193's gap
    * construction) and the exact KS distance between the empirical gap
    * CDF and Exp(λ̂) — "are arrivals Poisson?" is the first question a
    * capacity model asks, and the KS distance (vs the two-SAMPLE q147)
    * is the one-sample parametric-fit version.
    *
    * Parity: the gap census and its prefix counts are exact int64
    * ([[PrefixSum]] — no single-partition window); F(g) = 1−e^(−λ̂g)
    * is one identical double chain; per-step D candidates quantize to
    * nano-units before the integer MAX, so a 1-ulp exp() divergence
    * cannot flip the maximum (q195's accepted-residual class at the
    * 1e-9 grid).
    *
    * Scale: keyed lag window → map-side-combinable census → prefix
    * sums → one max agg. Census size = distinct gap values, bounded by
    * the time span, not the event count. */
  def q240ExpFitKs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .select(expr("gap_us div 1000000").as("g"))
    val cen = gaps.groupBy("g").agg(count(lit(1)).as("cnt"))
    val cum = graft.ops.PrefixSum.withPrefixSums(cen,
      Seq(col("g")), Seq((col("cnt"), "cum")))
    val tot = cen.agg(sum(col("cnt")).as("n"),
      sum(col("g") * col("cnt")).as("sg"))
    val lam = col("n").cast("double") / col("sg")
    val fT = lit(1.0) - exp(-lam * col("g"))
    val fHi = col("cum").cast("double") / col("n")
    val fLo = (col("cum") - col("cnt")).cast("double") / col("n")
    cum.crossJoin(broadcast(tot))
      .select(col("n"), col("sg"),
        floor(greatest(abs(fHi - fT), abs(fT - fLo)) * 1e9 + 0.5)
          .cast("long").as("dq"))
      .groupBy("n", "sg")
      .agg(max(col("dq")).as("dmax"))
      .select(col("n").as("n_gaps"),
        (round(col("sg").cast("double") / col("n"), 4) + 0.0)
          .as("mean_gap_s"),
        (round(col("dmax").cast("double") / 1e9, 6) + 0.0).as("ks_d"))
  }

  /** L176 Kaplan–Meier with Greenwood confidence bands (Greenwood 1926
    * [PK]): q175's survival curve plus its pointwise variance
    * Var(Ŝ) = Ŝ²·Σ d/(n(n−d)) and the clamped 95% linear CI — the
    * uncertainty q175 reports without. A survival estimate quoted
    * without its band is exactly the overconfidence a churn model
    * inherits silently.
    *
    * Parity: the q175 construction verbatim (hour lifetimes, 12-hour
    * censor horizon, in-plan 1-row bounds broadcast — no build-time
    * driver action); Greenwood terms d/(n(n−d)) quantize to nano-units
    * before the cumulative integer sum, so the variance prefix is
    * bit-identical; Ŝ and the band are one double chain, 4dp, CI
    * clamped to [0, 1] with GREATEST/LEAST on both engines.
    *
    * Scale: the q175 shape — per-user agg, lifetime census,
    * census-sized cumulative windows. */
  def q242KmGreenwood(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).filter(col("user_id").isNotNull)
    val bounds = e.agg(max(unix_micros(col("ts"))).as("end_us"),
      countDistinct("user_id").as("nu"))
    val peru = e.groupBy("user_id")
      .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .crossJoin(broadcast(bounds))
      .select(expr("(unix_micros(last_ts) - unix_micros(first_ts))" +
        " div 3600000000").as("t"),
        when(unix_micros(col("last_ts")) <=
          col("end_us") - 12L * 3600L * 1000000L, 1L)
          .otherwise(0L).as("churn"),
        col("nu"))
    val day = peru.groupBy("t")
      .agg(sum(col("churn")).as("d"), sum(lit(1L) - col("churn")).as("c"),
        max(col("nu")).as("nu"))
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRisk = day.withColumn("n_risk",
      col("nu") - coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
    val dead = max(when(col("d") >= col("n_risk"), 1L).otherwise(0L)).over(wCum)
    val lnTerm = when(col("d") === 0 || col("d") >= col("n_risk"), lit(0.0))
      .otherwise(log((col("n_risk") - col("d")).cast("double") /
        col("n_risk").cast("double")))
    val gwTerm = when(col("d") === 0 || col("d") >= col("n_risk"), lit(0L))
      .otherwise(floor(col("d").cast("double") /
        (col("n_risk").cast("double") * (col("n_risk") - col("d"))) * 1e9
        + 0.5).cast("long"))
    val surv = exp(col("ln_s"))
    val se = surv * sqrt(col("gw").cast("double") / 1e9)
    withRisk
      .withColumn("dead", dead)
      .withColumn("ln_s", sum(lnTerm).over(wCum))
      .withColumn("gw", sum(gwTerm).over(wCum))
      .select(col("t").as("t_hours"), col("n_risk"), col("d").as("n_churn"),
        when(col("dead") === 1L, lit(0.0))
          .otherwise(round(surv, 4)).as("survival"),
        when(col("dead") === 1L, lit(0.0))
          .otherwise(round(se, 4) + 0.0).as("se_greenwood"),
        when(col("dead") === 1L, lit(0.0))
          .otherwise(round(greatest(surv - lit(1.96) * se, lit(0.0)), 4)
            + 0.0).as("ci_lo"),
        when(col("dead") === 1L, lit(0.0))
          .otherwise(round(least(surv + lit(1.96) * se, lit(1.0)), 4)
            + 0.0).as("ci_hi"))
      .orderBy("t_hours")
  }

  val q242KmGreenwoodSql: String =
    """WITH e AS (
      |  SELECT user_id, ts FROM events WHERE user_id IS NOT NULL),
      |b AS (SELECT MAX(ts) AS fin, COUNT(DISTINCT user_id) AS nu FROM e),
      |peru AS (
      |  SELECT CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 3600000000
      |      AS BIGINT) AS t,
      |    CASE WHEN epoch_us(MAX(ts)) <=
      |      (SELECT epoch_us(fin) - 43200000000 FROM b)
      |      THEN 1 ELSE 0 END AS churn
      |  FROM e GROUP BY user_id),
      |day AS (
      |  SELECT t, CAST(SUM(churn) AS BIGINT) AS d,
      |    CAST(SUM(1 - churn) AS BIGINT) AS c
      |  FROM peru GROUP BY t),
      |risk AS (
      |  SELECT t, d, c,
      |    (SELECT nu FROM b) - CAST(COALESCE(SUM(d + c) OVER
      |      (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      0) AS BIGINT) AS n_risk
      |  FROM day),
      |cum AS (
      |  SELECT t, n_risk, d, c,
      |    MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER
      |      (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS dead,
      |    SUM(CASE WHEN d = 0 OR d >= n_risk THEN CAST(0 AS DOUBLE)
      |             ELSE LN(CAST(n_risk - d AS DOUBLE) / n_risk) END) OVER
      |      (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS ln_s,
      |    CAST(SUM(CASE WHEN d = 0 OR d >= n_risk THEN 0
      |      ELSE CAST(FLOOR(CAST(d AS DOUBLE)
      |        / (CAST(n_risk AS DOUBLE) * (n_risk - d)) * 1e9 + 0.5)
      |        AS BIGINT) END) OVER
      |      (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS gw
      |  FROM risk)
      |SELECT t AS t_hours, n_risk, d AS n_churn,
      |  CASE WHEN dead = 1 THEN 0.0 ELSE ROUND(EXP(ln_s), 4) END
      |    AS survival,
      |  CASE WHEN dead = 1 THEN 0.0
      |    ELSE ROUND(EXP(ln_s) * SQRT(CAST(gw AS DOUBLE) / 1e9), 4) + 0 END
      |    AS se_greenwood,
      |  CASE WHEN dead = 1 THEN 0.0
      |    ELSE ROUND(GREATEST(EXP(ln_s) - 1.96 * EXP(ln_s)
      |      * SQRT(CAST(gw AS DOUBLE) / 1e9), 0.0), 4) + 0 END AS ci_lo,
      |  CASE WHEN dead = 1 THEN 0.0
      |    ELSE ROUND(LEAST(EXP(ln_s) + 1.96 * EXP(ln_s)
      |      * SQRT(CAST(gw AS DOUBLE) / 1e9), 1.0), 4) + 0 END AS ci_hi
      |FROM cum ORDER BY t_hours""".stripMargin

  val q240ExpFitKsSql: String =
    """WITH gg AS (
      |  SELECT (epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS g
      |  FROM events WHERE user_id IS NOT NULL),
      |cen AS (
      |  SELECT g, COUNT(*) AS cnt FROM gg WHERE g IS NOT NULL GROUP BY g),
      |cum AS (
      |  SELECT g, cnt,
      |    SUM(cnt) OVER (ORDER BY g ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM cen),
      |tot AS (
      |  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
      |    CAST(SUM(g * cnt) AS BIGINT) AS sg
      |  FROM cen),
      |d AS (
      |  SELECT n, sg,
      |    CAST(FLOOR(GREATEST(
      |      abs(CAST(cum AS DOUBLE) / n
      |        - (1.0 - exp(-(CAST(n AS DOUBLE) / sg) * g))),
      |      abs((1.0 - exp(-(CAST(n AS DOUBLE) / sg) * g))
      |        - CAST(cum - cnt AS DOUBLE) / n)) * 1e9 + 0.5) AS BIGINT)
      |      AS dq
      |  FROM cum, tot)
      |SELECT n AS n_gaps,
      |  ROUND(CAST(sg AS DOUBLE) / n, 4) + 0 AS mean_gap_s,
      |  ROUND(CAST(MAX(dq) AS DOUBLE) / 1e9, 6) + 0 AS ks_d
      |FROM d GROUP BY n, sg""".stripMargin

  /** L204 CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013
    * [PK]): the standard A/B readout accelerator — per user, outcome
    * Y = spend in the experiment window (last 14 days of the corpus)
    * and covariate X = spend in the pre-window before it;
    * θ = cov(X,Y)/var(X) pooled, and Ŷ_cuped = Y − θ(X − X̄) keeps each
    * arm's mean unbiased while removing the pre-period component of
    * the variance (fraction removed = ρ²). Arms = user_id parity (the
    * q224 assignment). Without CUPED the q172-style z-test needs
    * 1/(1−ρ²)× the traffic for the same power.
    *
    * Parity: spend quantizes to cents int64 per event; all moment sums
    * (Σx, Σy, Σxy, Σx², Σy²) are exact DECIMAL/HUGEINT; θ/ρ²/means one
    * double chain; the window split rides the in-plan 1-row bounds
    * broadcast (q242 form — no build-time driver action).
    *
    * Scale: one per-user agg, one 1-row pooled-moment agg, one ≤2-row
    * arm agg. Guards: var(X) = 0 → θ undefined → null CUPED columns,
    * raw means survive. */
  def q273Cuped(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val e = Tables.events(s, dir).filter(col("user_id").isNotNull)
    val bounds = e.agg(max(unix_micros(col("ts"))).as("end_us"))
    val cut = col("end_us") - 14L * 86400L * 1000000L
    val peru = e.crossJoin(broadcast(bounds))
      .select(col("user_id"),
        when(unix_micros(col("ts")) >= cut,
          floor(col("value") * 100.0 + 0.5).cast("long")).as("yv"),
        when(unix_micros(col("ts")) < cut,
          floor(col("value") * 100.0 + 0.5).cast("long")).as("xv"))
      .groupBy("user_id")
      .agg(coalesce(sum(col("yv")), lit(0L)).as("y"),
        coalesce(sum(col("xv")), lit(0L)).as("x"))
      .withColumn("arm", pmod(col("user_id"), lit(2L)))
      .localCheckpoint(eager = false)
    val mom = peru.agg(count(lit(1)).as("nu"),
      sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
      sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
      sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
      sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"))
    val nD = col("nu").cast("double")
    val vx = col("sxx").cast("double") -
      col("sx").cast("double") * (col("sx").cast("double") / nD)
    val vy = col("syy").cast("double") -
      col("sy").cast("double") * (col("sy").cast("double") / nD)
    val cxy = col("sxy").cast("double") -
      col("sx").cast("double") * (col("sy").cast("double") / nD)
    val theta = cxy / vx
    val rho2 = cxy * cxy / (vx * vy)
    val xbar = col("sx").cast("double") / nD
    val bad = col("nu") < 2 || vx <= 0.0 || vy <= 0.0
    val arm = peru.groupBy("arm")
      .agg(count(lit(1)).as("n_users"), sum(col("y").cast(dec)).as("asy"),
        sum(col("x").cast(dec)).as("asx"))
    arm.crossJoin(broadcast(mom))
      .select(col("arm"), col("n_users"),
        (round(col("asy").cast("double") / col("n_users") / 100.0, 4)
          + 0.0).as("mean_y"),
        when(bad, lit(null).cast("double"))
          .otherwise(round((col("asy").cast("double") / col("n_users") -
            theta * (col("asx").cast("double") / col("n_users") - xbar))
            / 100.0, 4) + 0.0).as("mean_y_cuped"),
        when(bad, lit(null).cast("double"))
          .otherwise(round(theta, 6) + 0.0).as("theta"),
        when(bad, lit(null).cast("double"))
          .otherwise(round(rho2, 6) + 0.0).as("var_reduction"))
      .orderBy("arm")
  }

  val q273CupedSql: String = {
    val vx = "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)" +
      " * (CAST(sx AS DOUBLE) / CAST(nu AS DOUBLE)))"
    val vy = "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)" +
      " * (CAST(sy AS DOUBLE) / CAST(nu AS DOUBLE)))"
    val cxy = "(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)" +
      " * (CAST(sy AS DOUBLE) / CAST(nu AS DOUBLE)))"
    val theta = s"($cxy / $vx)"
    val bad = s"(nu < 2 OR $vx <= 0.0 OR $vy <= 0.0)"
    s"""WITH e AS (
       |  SELECT user_id, ts,
       |    CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS vc
       |  FROM events WHERE user_id IS NOT NULL),
       |b AS (SELECT MAX(epoch_us(ts)) - CAST(14 AS BIGINT) * 86400 * 1000000
       |        AS cut
       |      FROM e),
       |peru AS (
       |  SELECT user_id,
       |    COALESCE(SUM(CASE WHEN epoch_us(ts) >= (SELECT cut FROM b)
       |      THEN vc END), 0) AS y,
       |    COALESCE(SUM(CASE WHEN epoch_us(ts) < (SELECT cut FROM b)
       |      THEN vc END), 0) AS x,
       |    user_id % 2 AS arm
       |  FROM e GROUP BY user_id),
       |mom AS (
       |  SELECT COUNT(*) AS nu,
       |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
       |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
       |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
       |    SUM(CAST(y AS HUGEINT) * y) AS syy
       |  FROM peru),
       |arm AS (
       |  SELECT arm, COUNT(*) AS n_users,
       |    SUM(CAST(y AS HUGEINT)) AS asy, SUM(CAST(x AS HUGEINT)) AS asx
       |  FROM peru GROUP BY arm)
       |SELECT arm, n_users,
       |  ROUND(CAST(asy AS DOUBLE) / n_users / 100.0, 4) + 0 AS mean_y,
       |  CASE WHEN $bad THEN NULL ELSE
       |    ROUND((CAST(asy AS DOUBLE) / n_users
       |      - $theta * (CAST(asx AS DOUBLE) / n_users
       |        - CAST(sx AS DOUBLE) / CAST(nu AS DOUBLE))) / 100.0, 4) + 0
       |    END AS mean_y_cuped,
       |  CASE WHEN $bad THEN NULL ELSE ROUND($theta, 6) + 0 END AS theta,
       |  CASE WHEN $bad THEN NULL ELSE
       |    ROUND($cxy * $cxy / ($vx * $vy), 6) + 0 END AS var_reduction
       |FROM arm, mom ORDER BY arm""".stripMargin
  }
}
