package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.Tag

/** Exclude with `sbt "testOnly -- -l graft.SlowScale"` — the suite's
  * one deliberately-minutes-long test. */
object SlowScale extends Tag("graft.SlowScale")

/** MEASURED scale curves for the heavy query family — the executable
  * form of every "candidates ∝ input, not input²" scaladoc claim. The
  * sf0.01 fixture is replicated 1× and 10× through the same writer and
  * each query is timed at both scales; the wall-time growth exponent
  * log₁₀(t₁₀/t₁) must stay ≤ 1.4 (linear scan + shuffle log factors
  * land ~0.3–1.0 here because fixed job overhead deflates the ratio; a
  * genuinely quadratic candidate generator lands ~2 — r7's q48/q161
  * single-key blocking would have tripped exactly this).
  *
  * Replication grows the VOCABULARY with the corpus (copy k suffixes
  * every token with k), modeling real content growth. Replicating text
  * verbatim instead would make every similarity join quadratic BY
  * FIXTURE (10 identical copies of each doc are 45 true near-dup pairs
  * each — output itself is quadratic in copies), which measures the
  * fixture's pathology, not the plan's scaling. Ids shift by a
  * copy-sized stride so keys stay unique; embeddings/orders replicate
  * unchanged (row-linear operators, duplicate values are legal). */
class ScaleCurveSpec extends SparkSpec {

  private val base = "/root/testdata/sf0.01"
  private val stride = 100000000L

  /** Copy k of `src`: ids shifted, word tokens suffixed with k (k > 0)
    * so each copy brings new vocabulary, text-length column recomputed. */
  private def copyK(src: DataFrame, k: Int, idCols: Seq[String],
      textCols: Seq[String], lenCol: Option[String]): DataFrame = {
    var d = src
    idCols.foreach(ic => d = d.withColumn(ic, col(ic) + lit(k * stride)))
    if (k > 0) textCols.foreach(tc => d = d.withColumn(tc,
      array_join(transform(split(col(tc), " "), w => concat(w, lit(k.toString))), " ")))
    if (k > 0) lenCol.foreach(lc =>
      d = d.withColumn(lc, length(col(textCols.head)).cast("long")))
    d
  }

  /** Generate each replicated table ONLY if absent: the replicas are
    * deterministic, and overwriting a dir that a memoized Tables plan
    * (or a Triangles cache) already file-indexed leaves stale part-file
    * lists behind → FAILED_READ_FILE on the next consumer. The marker
    * check is PER TABLE (r12 verdict: a whole-dir `events` marker let a
    * stale /tmp dir survive with `customer` missing after the spec list
    * grew), so adding a table here regenerates just that table. Delete
    * $TMPDIR/graft-scale to force full regeneration. */
  private def gen(outRoot: String, copies: Int): Unit = {
    // Fact tables replicate with id-shift (customer joins like orders:
    // keys shift, its c_nationkey FK stays valid against the constant
    // dims below). nation/region/supplier are constant dims in this
    // harness — copied through once so FKs from replicated facts (which
    // keep their dim keys un-shifted) always resolve.
    val specs = Seq(
      ("documents", Seq("doc_id"), Seq("text"), Some("n_chars")),
      ("part", Seq("p_partkey"), Seq("p_name"), None),
      ("orders", Seq("o_orderkey"), Seq.empty[String], None),
      ("customer", Seq("c_custkey"), Seq.empty[String], None),
      ("embeddings", Seq("vec_id"), Seq.empty[String], None),
      ("lineitem", Seq("l_orderkey", "l_partkey"), Seq.empty[String], None),
      ("events", Seq("event_id", "user_id"), Seq.empty[String], None))
    val dims = Seq("nation", "region", "supplier")
    def missing(table: String): Boolean =
      !new java.io.File(s"$outRoot/$table.parquet/_SUCCESS").exists()
    specs.foreach { case (table, idCols, textCols, lenCol) =>
      if (missing(table)) {
        val src = Tables.load(spark, base, table)
        val out = (0 until copies).map(k => copyK(src, k, idCols, textCols, lenCol))
          .reduce(_.unionByName(_))
        // events.ts round-trips as Spark's native µs timestamp; the
        // loader detects the unit from each directory's parquet footer
        // (Tables.eventsTsUnit), so no physical-layout rewrite is needed
        // — the replicas follow whatever unit the writer produces.
        out.write.mode("overwrite").parquet(s"$outRoot/$table.parquet")
      }
    }
    dims.foreach { table =>
      if (missing(table))
        Tables.load(spark, base, table).write.mode("overwrite")
          .parquet(s"$outRoot/$table.parquet")
    }
  }

  private def timeQ(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
    // Measurement hygiene: by the time this suite runs in a full
    // `sbt test`, ~55 earlier suites have left cached relations and
    // checkpoint blocks in the shared session's block manager; the
    // unified-memory store then steals execution memory from the 10×
    // runs and the measured "exponent" is mostly eviction churn (r10
    // observed the same query+data at 1.25 s idle vs 30 s in-suite).
    // Clear the cache registry and nudge the ContextCleaner (checkpoint
    // blocks free on GC) before every timed run; the GC pause itself
    // lands outside the timed region.
    spark.catalog.clearCache()
    System.gc()
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    (System.nanoTime() - t0) / 1e9
  }

  test("heavy-family growth exponent 1x -> 10x stays below 1.4", SlowScale) {
    val root = s"${sys.props("java.io.tmpdir")}/graft-scale"
    gen(s"$root/x1", 1)
    gen(s"$root/x10", 10)
    val heavy = Seq("q49_token_jaccard", "q100_dup_passages",
      "q135_sparse_cosine", "q138_covariance", "q147_ks",
      "q155_containment", "q161_jaro_names",
      // round-8 additions: the lookback band join (candidates ∝
      // clicks/user/6h — per-copy density is constant, so growth must
      // be ~linear) and the co-purchase graph build (pairs bounded by
      // basket size; disjoint per-copy subgraphs)
      "q173_linear_attribution", "q174_assortativity",
      // the co-purchase pair build feeding disjoint per-copy subgraphs:
      // modularity's censuses and BFS's ≤6 frontier expansions must
      // both grow with the copies, never with copies²
      "q176_modularity", "q178_bfs_hops",
      // round-9 additions: the window/join-heavy event family never got
      // a real exponent before — round 8's collapsed timestamps made
      // their work trivial. Sessions, rolling actives, the ordered
      // funnel, and entry attribution are all per-user keyed windows;
      // copies multiply users, so growth must stay ~linear
      "q59_sessions", "q151_entry_attribution", "q152_rolling_active",
      "q168_funnel3",
      // round-12 additions (r11 verdict mandate #3): the round-11
      // heavies — q240 is the #3 bench spender (gap census + PrefixSum
      // cumulative; census bounded by the time span so growth must be
      // ~linear in events), q246's per-level block windows partition BY
      // block, q236's quasi-group grid is |groups|×5, and q244's rank
      // prefix rides PrefixSum like q147
      "q240_expfit_ks", "q246_haar_energy", "q236_t_closeness",
      "q244_cramer_von_mises",
      // round-13 additions (r12 verdict mandate #7): the r12 heavies —
      // q262's Walsh pair build is a ≤365-row broadcast self-join
      // (scale-constant work after the daily census), q266 pushes three
      // periods through ONE census pass via explode, q268's MI contingency
      // is |cells| ≤ priorities×statuses — all must stay census-bounded
      "q262_hodges_lehmann", "q266_periodogram", "q268_mutual_info",
      // round-13 batch 2: the bigram-LM scorer is the only new operator
      // whose joins grow with the corpus (bigram census ⋈ model ⋈
      // context); copies multiply bigram occurrences, types saturate,
      // so growth must stay ~linear
      "q286_lm_score",
      // round-13 batches 5-10: the corpus-joining heavies — q300's
      // three KN marginal censuses grow with bigram OCCURRENCES (types
      // saturate under copying); q313's word-ratio join is vocab-keyed
      // (Heaps-capped — the per-doc side grows linearly); q304's grid
      // stays 30×|sources| so only the term census scales
      "q300_kneser_ney", "q313_dsir_weights", "q304_burrows_delta",
      // round-14 (r13 verdict mandate #6): the regression-inference
      // stack's scale story — exact DECIMAL Gram moments + a 1-row
      // adjugate broadcast back onto the per-order census — was argued
      // in comments but never measured. q316 is the family's heaviest
      // member (census + running count + 3-row α broadcast); its only
      // data-sized stage is the |e|-census, so growth must stay ~linear
      "q316_conformal",
      // round-15 (r14 verdict mandate #3): the r14 heavies reason
      // about scale in comments — measure them. q327's wedge pair
      // build is bounded by the 25-brand vocabulary (≤C(25,2) pairs
      // per customer — copies multiply customers, so linear); q329's
      // 42-term HD-D fold is per-document (docs scale linearly, the
      // per-language panel is 5 rows); q330's prefix census is one
      // PrefixSum global order + adjacent-pair equi-join (paths scale
      // with events)
      "q327_link_panel", "q329_hdd_diversity", "q330_prefix_paths",
      // round-16 (r15 verdict mandate #3): q207 is the #3 bench
      // spender and sat in NEITHER gate — its wedge build is argued
      // bounded like q327's (≤C(25,2) common-brand pairs per
      // customer; copies multiply customers) — measure it. The new
      // bounded-broadcast families likewise argue linearity in
      // comments: q333/q335 stream the customer scan past a ≤25-row
      // broadcast hub side (25n candidates for q333, an in-row argmin
      // fold for q335), and q351's only full-shuffle stage is the
      // exact-count measuring stick (the sketch layers see ≤24·k
      // rows) — all three must measure ~linear
      "q207_adamic_adar", "q333_hub_bands", "q335_nearest_hub",
      "q351_kmv_rollup",
      // round-16: the two new rank tests whose windows genuinely
      // scale with the facts (the q210 global-rank convention) —
      // q371 is the round's only multi-second bench entry (3.6 s at
      // sf0.1); both must stay ~n log n, never n²
      // (r17: both rewritten onto census + PrefixSum — the gate now
      // measures the two-phase kernel, not a 2-partition sort)
      "q367_brunner_munzel", "q371_bws",
      // round-17: the two new fact-cardinality census passes — q385's
      // PrefixSum + k-th-position explode over cent-grain values,
      // q395's PrefixSum over the acctbal score census — must stay
      // ~n log n like their q210/q371 backbones
      "q385_siegel_tukey", "q395_youden_j")
    val rows = heavy.map { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, s"$root/x1").count()                    // codegen warm-up
      val t1 = math.min(timeQ(fn, s"$root/x1"), timeQ(fn, s"$root/x1"))
      var t10 = timeQ(fn, s"$root/x10")
      var exp = math.log(t10 / math.max(t1, 0.05)) / math.log(10.0)
      if (exp > 1.4) {                                  // one noise retry
        t10 = math.min(t10, timeQ(fn, s"$root/x10"))
        exp = math.log(t10 / math.max(t1, 0.05)) / math.log(10.0)
      }
      info(f"$name%-22s t1=$t1%6.2fs  t10=$t10%6.2fs  exponent=$exp%5.2f")
      (name, t1, t10, exp)
    }
    val bad = rows.filter(_._4 > 1.4)
    assert(bad.isEmpty,
      s"superlinear growth: ${bad.map(r => f"${r._1} exp=${r._4}%.2f").mkString(", ")}")
  }

  test("decade-scale: top spenders hold their exponent from 10x to 100x",
      SlowScale) {
    // One decade (the test above) is thin evidence for a 100 TB design
    // claim: a Σ|bucket|² or Σdf² term with a small constant hides at
    // 10× and owns the bill at 100×. So the six heaviest bench queries
    // (BENCH_r09 ranking) get a second decade — 100 copies of sf0.01 ≈
    // sf1 — and BOTH the per-decade exponent log₁₀(t₁₀₀/t₁₀) and the
    // two-decade slope log₁₀₀(t₁₀₀/t₁) must stay ≤ 1.4. The per-decade
    // bound is the sharp one: fixed overhead that deflated the 1×→10×
    // ratio is amortized away by 10×, so a bending curve shows here
    // first.
    val root = s"${sys.props("java.io.tmpdir")}/graft-scale"
    gen(s"$root/x1", 1)
    gen(s"$root/x10", 10)
    gen(s"$root/x100", 100)
    val heavy = Seq("q176_modularity", "q138_covariance",
      "q100_dup_passages", "q155_containment", "q135_sparse_cosine",
      "q105_triangles", "q194_clustering_coef")
    val rows = heavy.map { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, s"$root/x1").count()                    // codegen warm-up
      val t1 = math.min(timeQ(fn, s"$root/x1"), timeQ(fn, s"$root/x1"))
      val t10 = timeQ(fn, s"$root/x10")
      var t100 = timeQ(fn, s"$root/x100")
      var expHi = math.log(t100 / math.max(t10, 0.05)) / math.log(10.0)
      if (expHi > 1.4) {                                // one noise retry
        t100 = math.min(t100, timeQ(fn, s"$root/x100"))
        expHi = math.log(t100 / math.max(t10, 0.05)) / math.log(10.0)
      }
      val expAll = math.log(t100 / math.max(t1, 0.05)) / math.log(100.0)
      info(f"$name%-22s t1=$t1%6.2fs t10=$t10%6.2fs t100=$t100%7.2fs " +
        f"exp10to100=$expHi%5.2f exp1to100=$expAll%5.2f")
      (name, expHi, expAll)
    }
    val bad = rows.filter(r => r._2 > 1.4 || r._3 > 1.4)
    assert(bad.isEmpty, "superlinear at the second decade: " +
      bad.map(r => f"${r._1} hi=${r._2}%.2f all=${r._3}%.2f").mkString(", "))
  }
}
