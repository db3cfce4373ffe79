package graft

import org.apache.spark.sql.functions._

/** Independent brute-force references for the mirror-constructed
  * statistics: q210 Mann–Whitney, q211 Kendall τ-b, q216 BH step-up,
  * q219 Durbin–Levinson PACF, q224 log-rank, q225 Woolf CIs, q226
  * Pettitt, q227 Kruskal–Wallis, q228 ANOVA, q229 Mantel–Haenszel.
  *
  * The DuckDB oracle mirrors share each query's CONSTRUCTION (the same
  * census algebra, the same quantization), so a formula error would
  * pass the hash gate on both engines. These tests recompute each
  * statistic from first principles — sequential scalar code over the
  * collected sf0.001 inputs, written from the textbook definition (sort
  * + average ranks; O(n²) pair loop; rank prefix scan) — and require
  * the distributed result to match. Collections here are test-only and
  * sf0.001-bounded.
  */
class StatBruteSpec extends SparkSpec {

  test("q210 Mann-Whitney U and z match a sequential textbook computation") {
    val row = SparkEntry.queries("q210_mann_whitney")(spark, sf0001).head()

    val rows = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("c"),
        (col("o_orderpriority") === "1-URGENT").as("g1"))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val sorted = rows.sortBy(_._1)
    val n = sorted.length
    // average ranks with ties, sequential
    val ranks = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && sorted(j + 1)._1 == sorted(i)._1) j += 1
      val avg = (i + 1 + j + 1) / 2.0
      (i to j).foreach(k => ranks(k) = avg)
      i = j + 1
    }
    val n1 = sorted.count(_._2).toLong
    val n2 = n - n1
    val r1 = sorted.zip(ranks).filter(_._1._2).map(_._2).sum
    val u1 = r1 - n1 * (n1 + 1) / 2.0
    val tie = sorted.groupBy(_._1).values.map(_.length.toLong)
      .map(t => t * t * t - t).sum
    val nt = n.toDouble
    val z = (u1 - n1 * n2 / 2.0) /
      math.sqrt(n1.toDouble * n2 / 12.0 * ((nt + 1) - tie / (nt * (nt - 1))))

    assert(row.getAs[Long]("n_urgent") === n1)
    assert(row.getAs[Long]("n_low") === n2)
    assert(row.getAs[Long]("u2_urgent") === math.round(2 * u1))
    assert(row.getAs[Long]("tie_term") === tie)
    assert(math.abs(row.getAs[Double]("z") - z) < 5e-4,
      s"z ${row.getAs[Double]("z")} vs brute $z")
  }

  test("q211 Kendall tau-b matches an O(n^2) pair loop") {
    val row = SparkEntry.queries("q211_kendall")(spark, sf0001).head()

    val daily = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"),
        count(lit(1)).as("cnt"))
      .select(datediff(col("day"), lit("1995-01-01")).cast("long"),
        col("rev"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val tmax = daily.map(_._1).max
    val rc = daily.filter(_._1 > tmax - 365).sortBy(_._1)
    var nc = 0L; var nd = 0L; var tx = 0L; var ty = 0L; var n0 = 0L
    for (a <- rc.indices; b <- (a + 1) until rc.length) {
      val dx = rc(b)._2 - rc(a)._2
      val dy = rc(b)._3 - rc(a)._3
      n0 += 1
      if (dx == 0) tx += 1
      if (dy == 0) ty += 1
      if (dx * dy > 0) nc += 1 else if (dx * dy < 0) nd += 1
    }
    val tau = (nc - nd).toDouble /
      math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)

    assert(row.getAs[Long]("n_pairs") === n0)
    assert(row.getAs[Long]("nc") === nc)
    assert(row.getAs[Long]("nd") === nd)
    assert(row.getAs[Long]("ties_x") === tx)
    assert(row.getAs[Long]("ties_y") === ty)
    assert(math.abs(row.getAs[Double]("tau_b") - tau) < 5e-6)
  }

  test("q227 Kruskal-Wallis H matches a sequential tie-corrected computation") {
    val rows = SparkEntry.queries("q227_kruskal_wallis")(spark, sf0001)
      .collect().map(r => (r.getAs[String]("c_mktsegment"),
        r.getAs[Long]("nj"), r.getAs[Double]("mean_rank"),
        r.getAs[Double]("h_corrected")))

    val data = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = data.length
    val sorted = data.map(_._2).zipWithIndex.sortBy(_._1)
    val rank = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && sorted(j + 1)._1 == sorted(i)._1) j += 1
      val avg = (i + 1 + j + 1) / 2.0
      (i to j).foreach(k => rank(sorted(k)._2) = avg)
      i = j + 1
    }
    val groups = data.map(_._1).zip(rank).groupBy(_._1)
    val sumR = groups.map { case (g, xs) => g -> xs.map(_._2).sum }
    val nj = groups.map { case (g, xs) => g -> xs.length.toLong }
    val hRaw = 12.0 / (n.toDouble * (n + 1)) *
      sumR.map { case (g, r) => r * r / nj(g) }.sum - 3.0 * (n + 1)
    val tie = data.map(_._2).groupBy(identity).values
      .map(_.length.toLong).map(t => t * t * t - t).sum
    val h = hRaw / (1.0 - tie.toDouble / (n.toDouble * n * n - n))

    rows.foreach { case (seg, njQ, mr, hQ) =>
      assert(njQ === nj(seg))
      assert(math.abs(mr - sumR(seg) / nj(seg)) < 5e-4)
      assert(math.abs(hQ - h) < 5e-3, s"H $hQ vs brute $h")
    }
  }

  test("q224 log-rank O/E/z match a sequential risk-set walk") {
    // sf0.01, not sf0.001: under the 12-hour censor horizon (commit
    // 8fbf72c de-vacuified the survival family) sf0.001 is no longer
    // degenerate (5 churners / 15 users, re-verified round 11), but 15
    // users give the risk-set walk almost nothing to walk — sf0.01's
    // 150 users / 40 churners exercise real tied event times and both
    // groups' depletion, so the brute reference stays there.
    val sf001 = "/root/testdata/sf0.01"
    val row = SparkEntry.queries("q224_log_rank")(spark, sf001).head()

    val ev = Tables.events(spark, sf001).filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("f"),
        max(unix_micros(col("ts"))).as("l"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val endUs = ev.map(_._3).max
    val users = ev.map { case (uid, f, l) =>
      ((l - f) / 3600000000L,
        if (l <= endUs - 12L * 3600L * 1000000L) 1 else 0, (uid % 2).toInt)
    }
    val n1Tot = users.count(_._3 == 0).toLong
    val n2Tot = users.length - n1Tot
    val byT = users.groupBy(_._1).toSeq.sortBy(_._1)
    var n1r = n1Tot; var n2r = n2Tot
    var o1 = 0L; var e1 = 0.0; var v = 0.0
    for ((_, xs) <- byT) {
      val d1 = xs.count(x => x._2 == 1 && x._3 == 0).toLong
      val d2 = xs.count(x => x._2 == 1 && x._3 == 1).toLong
      val d = d1 + d2
      val nr = n1r + n2r
      if (d > 0) {
        o1 += d1
        e1 += d.toDouble * n1r / nr
        if (nr > 1)
          v += d.toDouble * (n1r.toDouble / nr) * (1.0 - n1r.toDouble / nr) *
            (nr - d).toDouble / (nr - 1)
      }
      n1r -= xs.count(_._3 == 0)
      n2r -= xs.count(_._3 == 1)
    }
    val z = (o1 - e1) / math.sqrt(v)

    assert(row.getAs[Long]("n_users_g0") === n1Tot)
    assert(row.getAs[Long]("n_users_g1") === n2Tot)
    assert(row.getAs[Long]("o1") === o1)
    assert(math.abs(row.getAs[Double]("e1") - e1) < 5e-3)
    assert(math.abs(row.getAs[Double]("z") - z) < 5e-3,
      s"z ${row.getAs[Double]("z")} vs brute $z")
  }

  test("q226 Pettitt K, changepoint day, and p match a rank prefix scan") {
    val row = SparkEntry.queries("q226_pettitt")(spark, sf0001).head()

    val daily = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day")
      .collect().map(r => (r.getDate(0), r.getLong(1)))
    val n = daily.length
    // average ranks of rev over the whole series
    val byRev = daily.map(_._2).zipWithIndex.sortBy(_._1)
    val rank = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && byRev(j + 1)._1 == byRev(i)._1) j += 1
      val avg = (i + 1 + j + 1) / 2.0
      (i to j).foreach(k => rank(byRev(k)._2) = avg)
      i = j + 1
    }
    var s = 0.0; var bestK = -1.0; var bestDay: java.sql.Date = null
    for (t <- 0 until n) {
      s += rank(t)
      val ut = 2 * s - (t + 1).toDouble * (n + 1)
      if (math.abs(ut) > bestK) { bestK = math.abs(ut); bestDay = daily(t)._1 }
    }
    val p = 2.0 * math.exp(-6.0 * bestK * bestK /
      (n.toDouble * n * n + n.toDouble * n))

    assert(row.getAs[Long]("k_stat") === math.round(bestK))
    assert(row.getAs[java.sql.Date]("change_day").toString === bestDay.toString)
    assert(row.getAs[Long]("n_days") === n.toLong)
    assert(math.abs(row.getAs[Double]("p_approx") - p) < 5e-6)
  }

  /** Abramowitz–Stegun 26.2.17 two-sided normal p — the same polynomial
    * the queries define their p-values by, recomputed sequentially. */
  private def pTwoSided(z: Double): Double = {
    val za = math.abs(z)
    val t = 1.0 / (1.0 + 0.2316419 * za)
    val phi = math.exp(-za * za / 2.0) / 2.5066282746310002
    2.0 * phi * (0.319381530 * t - 0.356563782 * t * t +
      1.781477937 * math.pow(t, 3) - 1.821255978 * math.pow(t, 4) +
      1.330274429 * math.pow(t, 5))
  }

  test("q216 BH step-up matches a sequential sort-and-cutoff walk") {
    val rows = SparkEntry.queries("q216_bh_fdr")(spark, sf0001)
      .orderBy("rk").collect()

    val cells = Tables.documents(spark, sf0001)
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val scored = cells.map { case (src, n, x) =>
      val z = (x.toDouble / n - 0.2) / math.sqrt(0.2 * 0.8 / n)
      (src, n, x, z, pTwoSided(z))
    }.sortBy(t => (t._5, t._1))
    val m = scored.length
    // BH: the LARGEST k with p(k) <= alpha*k/m; everything at or below
    // rank k is rejected (including any non-monotone smaller p)
    val cutoff = (1 to m).filter(k => scored(k - 1)._5 <= 0.05 * k / m)
      .lastOption.getOrElse(0)

    assert(rows.length === m)
    rows.zip(scored).zipWithIndex.foreach {
      case ((row, (src, n, x, z, p)), idx) =>
        assert(row.getAs[String]("source") === src)
        assert(row.getAs[Long]("n") === n)
        assert(row.getAs[Long]("x") === x)
        assert(math.abs(row.getAs[Double]("z") - z) < 5e-4)
        assert(math.abs(row.getAs[Double]("p") - p) < 1e-6)
        assert(row.getAs[Int]("rk") === idx + 1)
        assert(row.getAs[Int]("significant") ===
          (if (idx + 1 <= cutoff) 1 else 0),
          s"rank ${idx + 1}: step-up decision diverges from brute cutoff $cutoff")
    }
    assert(cutoff > 0, "brute cutoff itself degenerate — fixture drifted?")
  }

  test("q219 PACF lags 1-3 match a sequential Durbin-Levinson recursion") {
    val rows = SparkEntry.queries("q219_pacf")(spark, sf0001)
      .orderBy("lag").collect().map(_.getAs[Double]("pacf"))

    val rev = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day").collect().map(_.getLong(1).toDouble)
    // lag-k Pearson r over the (x_{t-k}, x_t) pair set — the lagged
    // sample correlation convention the query documents
    def rLag(k: Int): Double = {
      val xs = rev.dropRight(k); val ys = rev.drop(k)
      val n = xs.length.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val syy = ys.map(b => b * b).sum
      (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val (r1, r2, r3) = (rLag(1), rLag(2), rLag(3))
    // Durbin–Levinson: phi_11 = r1; phi_22 = (r2 - r1^2)/(1 - r1^2);
    // phi_21 = phi_11 - phi_22*phi_11; phi_33 closes over both
    val p11 = r1
    val p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val p21 = p11 - p22 * p11
    val p33 = (r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2)

    assert(rows.length === 3)
    Seq(p11, p22, p33).zip(rows).zipWithIndex.foreach {
      case ((brute, got), k) =>
        assert(math.abs(got - brute) < 2e-6,
          s"pacf lag ${k + 1}: $got vs brute $brute")
    }
  }

  test("q225 odds ratios and Woolf CIs match a sequential 2x2 walk") {
    val rows = SparkEntry.queries("q225_odds_ratio")(spark, sf0001)
      .orderBy("brand").collect()

    val cells = Tables.lineitem(spark, sf0001)
      .join(Tables.part(spark, sf0001),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(sum(when(col("l_quantity") >= 30, 1L).otherwise(0L)).as("a"),
        sum(when(col("l_quantity") >= 30, 0L).otherwise(1L)).as("b"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val (totA, totB) = (cells.map(_._2).sum, cells.map(_._3).sum)

    assert(rows.length === cells.length)
    rows.zip(cells).foreach { case (row, (brand, a, b)) =>
      val c = totA - a; val d = totB - b
      val orr = a.toDouble * d / (b.toDouble * c)
      val se = math.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
      assert(row.getAs[String]("brand") === brand)
      assert(row.getAs[Long]("a") === a && row.getAs[Long]("b") === b)
      assert(row.getAs[Long]("c") === c && row.getAs[Long]("d") === d)
      assert(math.abs(row.getAs[Double]("odds_ratio") - orr) < 5e-4)
      assert(math.abs(row.getAs[Double]("ci_lo") -
        math.exp(math.log(orr) - 1.96 * se)) < 5e-4)
      assert(math.abs(row.getAs[Double]("ci_hi") -
        math.exp(math.log(orr) + 1.96 * se)) < 5e-4)
    }
  }

  test("q228 ANOVA F matches a sequential sum-of-squares decomposition") {
    val rows = SparkEntry.queries("q228_anova_f")(spark, sf0001).collect()

    val data = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        floor(col("o_totalprice") + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = data.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2.toDouble)
    }
    val grand = data.map(_._2.toDouble).sum / data.length
    val ssb = groups.values.map { xs =>
      val m = xs.sum / xs.length; xs.length * (m - grand) * (m - grand)
    }.sum
    val ssw = groups.values.map { xs =>
      val m = xs.sum / xs.length; xs.map(x => (x - m) * (x - m)).sum
    }.sum
    val k = groups.size
    val f = (ssb / (k - 1)) / (ssw / (data.length - k))

    assert(rows.length === k)
    rows.foreach { row =>
      // the query pins each Sj^2/nj to int64 with one floor(x+0.5) —
      // at most 0.5 absolute error per group, so compare relative
      assert(math.abs(row.getAs[Long]("ss_between") - ssb) / ssb < 1e-6,
        s"SSB ${row.getAs[Long]("ss_between")} vs brute $ssb")
      assert(math.abs(row.getAs[Long]("ss_within") - ssw) / ssw < 1e-6,
        s"SSW ${row.getAs[Long]("ss_within")} vs brute $ssw")
      assert(math.abs(row.getAs[Double]("f_stat") - f) < 5e-3,
        s"F ${row.getAs[Double]("f_stat")} vs brute $f")
    }
  }

  test("q231 Welch t and Satterthwaite df match a sequential computation") {
    val row = SparkEntry.queries("q231_welch_ttest")(spark, sf0001).head()

    val data = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "FURNITURE"))
      .select(col("c_mktsegment"),
        floor(col("o_totalprice") + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble))
    val a = data.filter(_._1 == "BUILDING").map(_._2)
    val b = data.filter(_._1 == "FURNITURE").map(_._2)
    def meanVar(xs: Array[Double]): (Double, Double) = {
      val m = xs.sum / xs.length
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val ((ma, va), (mb, vb)) = (meanVar(a), meanVar(b))
    val (sea, seb) = (va / a.length, vb / b.length)
    val t = (ma - mb) / math.sqrt(sea + seb)
    val df = (sea + seb) * (sea + seb) /
      (sea * sea / (a.length - 1) + seb * seb / (b.length - 1))

    assert(row.getAs[Long]("n_a") === a.length.toLong)
    assert(row.getAs[Long]("n_b") === b.length.toLong)
    assert(math.abs(row.getAs[Double]("mean_a") - ma) < 5e-4)
    assert(math.abs(row.getAs[Double]("t_stat") - t) < 5e-3,
      s"t ${row.getAs[Double]("t_stat")} vs brute $t")
    assert(math.abs(row.getAs[Double]("df") - df) / df < 1e-4,
      s"df ${row.getAs[Double]("df")} vs brute $df")
  }

  test("q232 Brown-Forsythe F matches a sequential median-deviation ANOVA") {
    val rows = SparkEntry.queries("q232_brown_forsythe")(spark, sf0001)
      .collect()

    val data = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        floor(col("o_totalprice") + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // interpolated median on doubled units == exact integer (a + b)
    def med2(xs: Array[Long]): Long = {
      val s = xs.map(_ * 2).sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    val devs = data.groupBy(_._1).toSeq.flatMap { case (g, xs) =>
      val m2 = med2(xs.map(_._2))
      xs.map(x => (g, math.abs(x._2 * 2 - m2).toDouble))
    }
    val groups = devs.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2) }
    val grand = devs.map(_._2).sum / devs.length
    val ssb = groups.values.map { xs =>
      val m = xs.sum / xs.length; xs.length * (m - grand) * (m - grand)
    }.sum
    val ssw = groups.values.map { xs =>
      val m = xs.sum / xs.length; xs.map(x => (x - m) * (x - m)).sum
    }.sum
    val f = (ssb / (groups.size - 1)) / (ssw / (devs.length - groups.size))

    assert(rows.length === groups.size)
    rows.foreach { row =>
      assert(math.abs(row.getAs[Double]("bf_stat") - f) < 5e-3,
        s"BF ${row.getAs[Double]("bf_stat")} vs brute $f")
      val g = row.getAs[String]("c_mktsegment")
      val expMad = groups(g).sum / groups(g).length / 2.0
      assert(math.abs(row.getAs[Double]("mean_absdev") - expMad) < 5e-4)
    }
  }

  test("q233 McNemar chi2 and p match a sequential paired-census walk") {
    val row = SparkEntry.queries("q233_mcnemar")(spark, sf0001).head()

    val per = Tables.orders(spark, sf0001)
      .groupBy("o_custkey")
      .agg(max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0))
        .as("u"),
        max(when(col("o_orderpriority") === "5-LOW", 1).otherwise(0))
          .as("l"))
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    val b = per.count(t => t._1 == 1 && t._2 == 0).toLong
    val c = per.count(t => t._1 == 0 && t._2 == 1).toLong
    val chi = math.pow(math.abs(b - c) - 1.0, 2) / (b + c)
    val p = pTwoSided(math.sqrt(chi))

    assert(row.getAs[Long]("b") === b && row.getAs[Long]("c") === c)
    assert(math.abs(row.getAs[Double]("chi2_cc") - chi) < 5e-3)
    assert(math.abs(row.getAs[Double]("p") - p) < 1e-6,
      s"p ${row.getAs[Double]("p")} vs brute $p")
  }

  test("q234 Cochran-Armitage z matches a sequential score-sum walk") {
    val rows = SparkEntry.queries("q234_cochran_armitage")(spark, sf0001)
      .collect()

    val data = Tables.orders(spark, sf0001)
      .select(substring(col("o_orderpriority"), 1, 1).cast("long"),
        when(col("o_totalprice") >= 200000.0, 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val levels = data.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, xs) =>
      (s, xs.length.toLong, xs.map(_._2).sum)
    }
    val nT = levels.map(_._2).sum
    val xT = levels.map(_._3).sum
    val pBar = xT.toDouble / nT
    val tNum = levels.map { case (s, _, x) => s * x.toDouble }.sum -
      pBar * levels.map { case (s, n, _) => s * n.toDouble }.sum
    val sn = levels.map { case (s, n, _) => s * n.toDouble }.sum
    val tVar = pBar * (1.0 - pBar) *
      (levels.map { case (s, n, _) => s * s * n.toDouble }.sum - sn * sn / nT)
    val z = tNum / math.sqrt(tVar)

    assert(rows.length === levels.length)
    rows.zip(levels).foreach { case (row, (s, n, x)) =>
      assert(row.getAs[Long]("score") === s)
      assert(row.getAs[Long]("n_i") === n && row.getAs[Long]("x_i") === x)
      assert(math.abs(row.getAs[Double]("z_trend") - z) < 5e-3,
        s"z ${row.getAs[Double]("z_trend")} vs brute $z")
      assert(math.abs(row.getAs[Double]("p") - pTwoSided(z)) < 1e-6)
    }
  }

  test("q235 Hellinger distances match a sequential full-support computation") {
    // brute uses the DEFINING full-support formula (every word in
    // either vocab), not the intersection identity the query exploits
    val rows = SparkEntry.queries("q235_hellinger")(spark, sf0001)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getAs[Double]("bc"), r.getAs[Double]("hellinger")))).toMap

    val wc = Tables.documents(spark, sf0001)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bySrc = wc.groupBy(_._1).map { case (s, xs) =>
      val tot = xs.map(_._3).sum.toDouble
      s -> xs.map(t => t._2 -> t._3 / tot).toMap
    }
    val srcs = bySrc.keys.toSeq.sorted
    // spot-check 5 deterministic pairs across the ordered list
    val pairs = srcs.zip(srcs.drop(7)).take(5)
    pairs.foreach { case (sa, sb) =>
      val (pa, pb) = (bySrc(sa), bySrc(sb))
      val bc = (pa.keySet ++ pb.keySet).toSeq.map { w =>
        math.sqrt(pa.getOrElse(w, 0.0) * pb.getOrElse(w, 0.0))
      }.sum
      val h = math.sqrt(math.max(1.0 - bc, 0.0))
      val key = if (sa < sb) (sa, sb) else (sb, sa)
      val (gotBc, gotH) = rows(key)
      assert(math.abs(gotBc - bc) < 5e-5, s"$key BC $gotBc vs brute $bc")
      assert(math.abs(gotH - h) < 5e-5, s"$key H $gotH vs brute $h")
    }
  }

  test("q236 worst-group TV distances match a sequential grid walk") {
    val rows = SparkEntry.queries("q236_t_closeness")(spark, sf0001)
      .collect()

    val data = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf0001),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment"), col("o_orderpriority"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getString(2)))
    val nT = data.length.toDouble
    val glob = data.groupBy(_._2).map { case (p, xs) => p -> xs.length / nT }
    val tv = data.groupBy(_._1).map { case (g, xs) =>
      val ng = xs.length.toDouble
      val local = xs.groupBy(_._2).map { case (p, ys) => p -> ys.length / ng }
      // full grid: absent priorities contribute their whole global mass
      g -> 0.5 * glob.keys.map(p =>
        math.abs(local.getOrElse(p, 0.0) - glob(p))).sum
    }
    val worst = tv.toSeq.sortBy { case ((n, s), t) => (-t, n, s) }

    rows.zipWithIndex.foreach { case (row, i) =>
      val got = row.getAs[Double]("tv_emd")
      // the query ranks on quantized tv; the top-10 VALUES must match
      // the brute top-10 values (identity can swap within quantization
      // ties, so compare the sorted distances)
      assert(math.abs(got - worst(i)._2) < 5e-6,
        s"rank ${i + 1}: tv $got vs brute ${worst(i)._2}")
    }
  }

  test("q237 runs count and z match a sequential sign walk") {
    val row = SparkEntry.queries("q237_runs_test")(spark, sf0001).head()

    val daily = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day")
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val byDow = daily.groupBy(_._1.getDayOfWeek.getValue)
      .map { case (dw, xs) => dw -> (xs.map(_._2).sum, xs.length) }
    val signs = daily.map { case (d, rev) =>
      val (sr, nd) = byDow(d.getDayOfWeek.getValue)
      val eq = math.floor((rev.toDouble - sr.toDouble / nd) * 1e6 + 0.5).toLong
      if (eq >= 0L) 1 else 0
    }
    val runs = 1 + signs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
    val nP = signs.count(_ == 1).toDouble
    val nN = signs.length - nP
    val n = signs.length.toDouble
    val eR = 2.0 * nP * nN / n + 1.0
    val vR = 2.0 * nP * nN * (2.0 * nP * nN - n) / (n * n * (n - 1.0))
    val z = (runs - eR) / math.sqrt(vR)

    assert(row.getAs[Long]("n_pos") === nP.toLong)
    assert(row.getAs[Long]("runs") === runs.toLong)
    assert(math.abs(row.getAs[Double]("z_runs") - z) < 5e-3,
      s"z ${row.getAs[Double]("z_runs")} vs brute $z")
    assert(math.abs(row.getAs[Double]("p") - pTwoSided(z)) < 1e-6)
  }

  test("q238 nDCG/MRR/MAP match a sequential IR-metric walk") {
    val rows = SparkEntry.queries("q238_rank_eval")(spark, sf0001)
      .collect().map(r => r.getAs[String]("query_lang") -> r).toMap

    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val langs = docs.map(_._2).distinct.sorted
    langs.foreach { ql =>
      val ranked = docs.sortBy(d => (-d._3, d._1))
      val rels = ranked.map(_._2 == ql)
      val nRel = rels.count(identity)
      val mrr = 1.0 / (rels.indexOf(true) + 1)
      var cum = 0; var apSum = 0.0; var dcg = 0.0
      rels.zipWithIndex.foreach { case (rel, i) =>
        if (rel) {
          cum += 1
          apSum += cum.toDouble / (i + 1)
          if (i < 10) dcg += math.log(2.0) / math.log(i + 2.0)
        }
      }
      val idcg = (1 to math.min(10, nRel))
        .map(k => math.log(2.0) / math.log(k + 1.0)).sum
      val row = rows(ql)
      assert(row.getAs[Long]("n_rel") === nRel.toLong)
      assert(math.abs(row.getAs[Double]("mrr") - mrr) < 1e-6)
      assert(math.abs(row.getAs[Double]("map") - apSum / nRel) < 1e-5,
        s"$ql MAP ${row.getAs[Double]("map")} vs brute ${apSum / nRel}")
      assert(math.abs(row.getAs[Double]("ndcg10") - dcg / idcg) < 1e-5,
        s"$ql nDCG ${row.getAs[Double]("ndcg10")} vs brute ${dcg / idcg}")
    }
  }

  test("q239 Neyman allocations match a sequential largest-remainder walk") {
    val rows = SparkEntry.queries("q239_neyman_alloc")(spark, sf0001)
      .orderBy("c_mktsegment").collect()

    val data = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        floor(col("o_totalprice") + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble))
    val strata = data.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, xs) =>
      val vs = xs.map(_._2)
      val m = vs.sum / vs.length
      val sh = math.sqrt(vs.map(v => (v - m) * (v - m)).sum / (vs.length - 1))
      (g, vs.length.toLong, sh, math.floor(vs.length * sh + 0.5).toLong)
    }
    val wt = strata.map(_._4).sum
    val based = strata.map { case (g, nh, sh, wq) =>
      (g, nh, sh, wq * 1000L / wt, wq * 1000L % wt)
    }
    val deficit = 1000L - based.map(_._4).sum
    val extras = based.sortBy(t => (-t._5, t._1)).take(deficit.toInt)
      .map(_._1).toSet
    val alloc = based.map { case (g, nh, sh, base, _) =>
      (g, nh, sh, base + (if (extras.contains(g)) 1L else 0L))
    }

    assert(rows.length === alloc.length)
    rows.zip(alloc).foreach { case (row, (g, nh, sh, a)) =>
      assert(row.getAs[String]("c_mktsegment") === g)
      assert(row.getAs[Long]("n_h") === nh)
      assert(math.abs(row.getAs[Double]("s_h") - sh) < 5e-4)
      assert(row.getAs[Long]("alloc") === a, s"$g alloc mismatch")
    }
    assert(rows.map(_.getAs[Long]("alloc")).sum === 1000L)
  }

  test("q240 lambda-hat and KS distance match a sequential CDF walk") {
    val row = SparkEntry.queries("q240_expfit_ks")(spark, sf0001).head()

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(spark, sf0001)
      .filter(col("user_id").isNotNull)
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .select(expr("gap_us div 1000000"))
      .collect().map(_.getLong(0)).sorted
    val n = gaps.length
    val lam = n.toDouble / gaps.sum
    var d = 0.0; var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && gaps(j + 1) == gaps(i)) j += 1
      val f = 1.0 - math.exp(-lam * gaps(i))
      d = math.max(d, math.max(math.abs((j + 1).toDouble / n - f),
        math.abs(f - i.toDouble / n)))
      i = j + 1
    }

    assert(row.getAs[Long]("n_gaps") === n.toLong)
    assert(math.abs(row.getAs[Double]("mean_gap_s") -
      gaps.sum.toDouble / n) < 5e-4)
    assert(math.abs(row.getAs[Double]("ks_d") - d) < 5e-6,
      s"D ${row.getAs[Double]("ks_d")} vs brute $d")
  }

  test("q241 Friedman chi2 matches a sequential blocked-rank walk") {
    val rows = SparkEntry.queries("q241_friedman")(spark, sf0001).collect()

    val monthly = Tables.orders(spark, sf0001)
      .groupBy(trunc(col("o_orderdate"), "month").as("mon"),
        col("o_orderpriority").as("pr"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
    val complete = monthly.groupBy(_._1).filter(_._2.length == 5)
    val rj = scala.collection.mutable.Map.empty[String, Double]
      .withDefaultValue(0.0)
    complete.values.foreach { block =>
      val sorted = block.sortBy(_._3)
      var i = 0
      while (i < 5) {
        var j = i
        while (j + 1 < 5 && sorted(j + 1)._3 == sorted(i)._3) j += 1
        val avg = (i + 1 + j + 1) / 2.0
        (i to j).foreach(k => rj(sorted(k)._2) += avg)
        i = j + 1
      }
    }
    val b = complete.size
    val chi = 12.0 / (b * 5 * 6) * rj.values.map(r => r * r).sum - 3.0 * b * 6

    assert(rows.length === 5)
    rows.foreach { row =>
      val pr = row.getAs[String]("o_orderpriority")
      assert(row.getAs[Long]("n_blocks") === b.toLong)
      assert(math.abs(row.getAs[Double]("mean_rank") - rj(pr) / b) < 5e-4)
      assert(math.abs(row.getAs[Double]("chi2_f") - chi) < 5e-3,
        s"chi2 ${row.getAs[Double]("chi2_f")} vs brute $chi")
    }
  }

  test("q242 Greenwood bands match a sequential KM walk (sf0.01)") {
    // sf0.01 like q224: the survival fixture is thin at sf0.001
    val sf001 = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q242_km_greenwood")(spark, sf001)
      .orderBy("t_hours").collect()

    val ev = Tables.events(spark, sf001).filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("f"),
        max(unix_micros(col("ts"))).as("l"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val endUs = ev.map(_._2).max
    val users = ev.map { case (f, l) =>
      ((l - f) / 3600000000L,
        if (l <= endUs - 12L * 3600L * 1000000L) 1 else 0)
    }
    val byT = users.groupBy(_._1).toSeq.sortBy(_._1)
    var nRisk = users.length.toLong
    var s = 1.0; var gw = 0.0
    val expected = byT.map { case (t, xs) =>
      val d = xs.count(_._2 == 1).toLong
      val c = xs.size - d
      val out = (t, nRisk, d)
      if (d > 0 && d < nRisk) {
        s *= (nRisk - d).toDouble / nRisk
        gw += d.toDouble / (nRisk.toDouble * (nRisk - d))
      } else if (d >= nRisk) s = 0.0
      val se = s * math.sqrt(gw)
      nRisk -= d + c
      (out, s, se)
    }
    assert(rows.length === expected.length)
    rows.zip(expected).foreach { case (row, ((t, nr, d), sv, se)) =>
      assert(row.getAs[Long]("t_hours") === t)
      assert(row.getAs[Long]("n_risk") === nr)
      assert(row.getAs[Long]("n_churn") === d)
      assert(math.abs(row.getAs[Double]("survival") - sv) < 5e-4)
      assert(math.abs(row.getAs[Double]("se_greenwood") - se) < 5e-4,
        s"t=$t se ${row.getAs[Double]("se_greenwood")} vs brute $se")
      assert(math.abs(row.getAs[Double]("ci_lo") -
        math.max(sv - 1.96 * se, 0.0)) < 5e-4)
      assert(math.abs(row.getAs[Double]("ci_hi") -
        math.min(sv + 1.96 * se, 1.0)) < 5e-4)
    }
  }

  /** Shared brute construction for the blocked-rank family
    * (q241/q243): complete month blocks → average ranks per block. */
  private def monthlyRankSums: (Map[String, Double], Int) = {
    val monthly = Tables.orders(spark, sf0001)
      .groupBy(trunc(col("o_orderdate"), "month").as("mon"),
        col("o_orderpriority").as("pr"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
    val complete = monthly.groupBy(_._1).filter(_._2.length == 5)
    val rj = scala.collection.mutable.Map.empty[String, Double]
      .withDefaultValue(0.0)
    complete.values.foreach { block =>
      val sorted = block.sortBy(_._3)
      var i = 0
      while (i < 5) {
        var j = i
        while (j + 1 < 5 && sorted(j + 1)._3 == sorted(i)._3) j += 1
        val avg = (i + 1 + j + 1) / 2.0
        (i to j).foreach(k => rj(sorted(k)._2) += avg)
        i = j + 1
      }
    }
    (rj.toMap, complete.size)
  }

  test("q243 Page L and z match a sequential ordered-rank walk") {
    val rows = SparkEntry.queries("q243_page_trend")(spark, sf0001)
      .collect()
    val (rj, b) = monthlyRankSums
    val l = rj.map { case (pr, r) => pr.substring(0, 1).toInt * r }.sum
    val z = (l - 90.0 * b / 2.0) / (5.0 * math.sqrt(b.toDouble))

    assert(rows.length === 5)
    rows.foreach { row =>
      assert(row.getAs[Long]("n_blocks") === b.toLong)
      assert(math.abs(row.getAs[Double]("l_stat") - l) < 5e-4)
      assert(math.abs(row.getAs[Double]("z_trend") - z) < 5e-3,
        s"z ${row.getAs[Double]("z_trend")} vs brute $z")
    }
  }

  test("q244 CvM T matches a sequential combined-rank walk") {
    val row = SparkEntry.queries("q244_cramer_von_mises")(spark, sf0001)
      .head()

    val data = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "FURNITURE"))
      .select((col("c_mktsegment") === "BUILDING"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    val all = data.map(_._2).zipWithIndex.sortBy(_._1)
    val rank = new Array[Double](all.length)
    var i = 0
    while (i < all.length) {
      var j = i
      while (j + 1 < all.length && all(j + 1)._1 == all(i)._1) j += 1
      val avg = (i + 1 + j + 1) / 2.0
      (i to j).foreach(k => rank(all(k)._2) = avg)
      i = j + 1
    }
    val xr = data.zipWithIndex.filter(_._1._1).map(t => rank(t._2))
      .sorted
    val yr = data.zipWithIndex.filterNot(_._1._1).map(t => rank(t._2))
      .sorted
    val n = xr.length; val m = yr.length
    val u = n * xr.zipWithIndex.map { case (r, k) =>
      (r - (k + 1)) * (r - (k + 1))
    }.sum + m * yr.zipWithIndex.map { case (r, k) =>
      (r - (k + 1)) * (r - (k + 1))
    }.sum
    val bigN = (n + m).toDouble
    val t = u / (n.toDouble * m * bigN) - (4.0 * n * m - 1.0) / (6.0 * bigN)

    assert(row.getAs[Long]("n_x") === n.toLong)
    assert(row.getAs[Long]("n_y") === m.toLong)
    assert(math.abs(row.getAs[Double]("t_cvm") - t) < 5e-5,
      s"T ${row.getAs[Double]("t_cvm")} vs brute $t")
  }

  test("q245 rich-club densities match a sequential subgraph walk") {
    val rows = SparkEntry.queries("q245_rich_club")(spark, sf0001)
      .orderBy("k").collect()

    val edges = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.flatMap { xs =>
        val ps = xs.map(_._2).sorted
        for (a <- ps.indices; b <- a + 1 until ps.length)
          yield (ps(a), ps(b))
      }.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (id, xs) => id -> xs.length }
    Seq(2, 4, 8, 16).zip(rows).foreach { case (k, row) =>
      val nodes = deg.filter(_._2 > k).keySet
      val e = edges.count(e => nodes(e._1) && nodes(e._2)).toLong
      val nN = nodes.size.toLong
      val phi = if (nN > 1) 2.0 * e / (nN.toDouble * (nN - 1)) else 0.0
      assert(row.getAs[Long]("k") === k.toLong)
      assert(row.getAs[Long]("n_nodes") === nN, s"k=$k node count")
      assert(row.getAs[Long]("n_edges") === e, s"k=$k edge count")
      assert(math.abs(row.getAs[Double]("phi") - phi) < 5e-6)
    }
  }

  test("q246 Haar energies match a sequential pyramid walk") {
    val rows = SparkEntry.queries("q246_haar_energy")(spark, sf0001)
      .orderBy("level").collect()

    var series = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day").collect().map(_.getLong(1))
    val energies = (1 to 3).map { l =>
      val pairs = series.grouped(2).filter(_.length == 2).toArray
      val e = pairs.map { p =>
        val d = (p(0) - p(1)).toDouble; d * d
      }.sum / math.pow(2.0, l)
      series = pairs.map(p => p(0) + p(1))
      (pairs.length, e)
    }
    val tot = energies.map(_._2).sum

    assert(rows.length === 3)
    rows.zip(energies).foreach { case (row, (np, e)) =>
      assert(row.getAs[Long]("n_pairs") === np.toLong)
      assert(math.abs(row.getAs[Double]("energy_m") - e / 1e6) < 5e-4,
        s"level ${row.getAs[Int]("level")}: ${row.getAs[Double]("energy_m")}" +
          s" vs brute ${e / 1e6}")
      assert(math.abs(row.getAs[Double]("share") - e / tot) < 5e-6)
    }
  }

  test("q247 effect sizes match a sequential pooled-SD computation") {
    val row = SparkEntry.queries("q247_effect_size")(spark, sf0001).head()

    val data = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "FURNITURE"))
      .select(col("c_mktsegment"),
        floor(col("o_totalprice") + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble))
    val a = data.filter(_._1 == "BUILDING").map(_._2)
    val b = data.filter(_._1 == "FURNITURE").map(_._2)
    def mss(xs: Array[Double]): (Double, Double) = {
      val m = xs.sum / xs.length
      (m, xs.map(x => (x - m) * (x - m)).sum)
    }
    val ((ma, ssa), (mb, ssb)) = (mss(a), mss(b))
    val nT = (a.length + b.length).toDouble
    val sp = math.sqrt((ssa + ssb) / (nT - 2.0))
    val d = (ma - mb) / sp
    val j = 1.0 - 3.0 / (4.0 * nT - 9.0)

    assert(math.abs(row.getAs[Double]("pooled_sd") - sp) < 5e-3)
    assert(math.abs(row.getAs[Double]("cohens_d") - d) < 1e-5,
      s"d ${row.getAs[Double]("cohens_d")} vs brute $d")
    assert(math.abs(row.getAs[Double]("hedges_g") - j * d) < 1e-5)
    assert(row.getAs[Double]("d_ci_lo") < d && d < row.getAs[Double]("d_ci_hi"))
  }

  test("q248 Mann-Kendall S and z match an O(n^2) pair loop") {
    val row = SparkEntry.queries("q248_mann_kendall")(spark, sf0001).head()

    val daily = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
    val tmax = daily.map(_._1).max
    val recent = daily.filter(_._1 > tmax - 365).sortBy(_._1).map(_._2)
    var s = 0L
    for (i <- recent.indices; j <- i + 1 until recent.length)
      s += java.lang.Long.signum(recent(j) - recent(i))
    val n = recent.length.toDouble
    val tie = recent.groupBy(identity).values.map(_.length.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val varS = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    val z = if (s > 0) (s - 1.0) / math.sqrt(varS)
      else if (s < 0) (s + 1.0) / math.sqrt(varS) else 0.0

    assert(row.getAs[Long]("n_days") === recent.length.toLong)
    assert(row.getAs[Long]("s_stat") === s)
    assert(math.abs(row.getAs[Double]("z_mk") - z) < 5e-3,
      s"z ${row.getAs[Double]("z_mk")} vs brute $z")
    assert(math.abs(row.getAs[Double]("p") - pTwoSided(z)) < 1e-6)
  }

  test("q249 Atkinson indices match a sequential geometric-mean walk") {
    val rows = SparkEntry.queries("q249_atkinson")(spark, sf0001)
      .orderBy("c_mktsegment").collect()

    val data = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
        .as("c"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val strata = data.groupBy(_._1).toSeq.sortBy(_._1)
    assert(rows.length === strata.length)
    rows.zip(strata).foreach { case (row, (seg, xs)) =>
      val cs = xs.map(_._2.toDouble)
      val mean = cs.sum / cs.length
      val geo = math.exp(cs.map(math.log).sum / cs.length)
      assert(row.getAs[String]("c_mktsegment") === seg)
      assert(math.abs(row.getAs[Double]("mean_rev") - mean / 100.0) < 5e-3)
      assert(math.abs(row.getAs[Double]("geomean_rev") - geo / 100.0) < 5e-3)
      assert(math.abs(row.getAs[Double]("atkinson_1") -
        (1.0 - geo / mean)) < 1e-5,
        s"$seg A1 ${row.getAs[Double]("atkinson_1")} vs brute ${1.0 - geo / mean}")
    }
  }

  test("q250 Cliff's delta matches an O(n*m) dominance loop") {
    val row = SparkEntry.queries("q250_cliffs_delta")(spark, sf0001).head()

    val data = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val xs = data.filter(_._1 == "1-URGENT").map(_._2)
    val ys = data.filter(_._1 == "5-LOW").map(_._2)
    var dom = 0L
    for (x <- xs; y <- ys)
      dom += java.lang.Long.signum(x - y)
    val delta = dom.toDouble / (xs.length.toLong * ys.length)

    assert(row.getAs[Long]("n_urgent") === xs.length.toLong)
    assert(row.getAs[Long]("n_low") === ys.length.toLong)
    assert(math.abs(row.getAs[Double]("cliffs_delta") - delta) < 1e-6,
      s"delta ${row.getAs[Double]("cliffs_delta")} vs brute $delta")
    val ad = math.abs(delta)
    val mag = if (ad < 0.147) "negligible" else if (ad < 0.33) "small"
      else if (ad < 0.474) "medium" else "large"
    assert(row.getAs[String]("magnitude") === mag)
  }

  test("q251 gamma and Somers' D match an O(n^2) pair loop") {
    val row = SparkEntry.queries("q251_ordinal_assoc")(spark, sf0001).head()

    val daily = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"),
        count(lit(1)).as("cnt"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1),
        r.getLong(2)))
    val tmax = daily.map(_._1).max
    val rc = daily.filter(_._1 > tmax - 365).sortBy(_._1)
    // textbook T_X/T_Y exclude pairs tied on BOTH variables (the r11
    // ADVICE fix) — count the exclusive tie sets directly
    var nc = 0L; var nd = 0L; var tx = 0L; var ty = 0L; var txy = 0L
    for (i <- rc.indices; j <- i + 1 until rc.length) {
      val dx = rc(j)._2 - rc(i)._2
      val dy = rc(j)._3 - rc(i)._3
      if (dx == 0) tx += 1
      if (dy == 0) ty += 1
      if (dx == 0 && dy == 0) txy += 1
      if (dx * dy > 0) nc += 1 else if (dx * dy < 0) nd += 1
    }

    assert(row.getAs[Long]("nc") === nc && row.getAs[Long]("nd") === nd)
    assert(row.getAs[Long]("ties_both") === txy)
    assert(math.abs(row.getAs[Double]("gamma") -
      (nc - nd).toDouble / (nc + nd)) < 1e-6)
    assert(math.abs(row.getAs[Double]("somers_dyx") -
      (nc - nd).toDouble / (nc + nd + ty - txy)) < 1e-6)
    assert(math.abs(row.getAs[Double]("somers_dxy") -
      (nc - nd).toDouble / (nc + nd + tx - txy)) < 1e-6)
  }

  test("q252 R/S means and H match a sequential block walk") {
    val rows = SparkEntry.queries("q252_hurst_rs")(spark, sf0001)
      .orderBy("w").collect()

    val series = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day").collect().map(_.getLong(1).toDouble)
    val pts = Seq(8, 16, 32, 64).map { w =>
      val blocks = series.grouped(w).filter(_.length == w).toArray
      val rsVals = blocks.map { b =>
        val mean = b.sum / w
        val devs = b.scanLeft(0.0)((acc, x) => acc + (x - mean)).drop(1)
        val r = devs.max - devs.min
        val sd = math.sqrt(b.map(x => (x - mean) * (x - mean)).sum / w)
        r / sd
      }
      // mirror the query's nano-quantization before the mean
      val rsMean = rsVals.map(v => math.floor(v * 1e9 + 0.5)).sum /
        1e9 / rsVals.length
      (w, blocks.length, rsMean)
    }
    val k = pts.length
    val (sx, sy) = (pts.map(p => math.log(p._1.toDouble)).sum,
      pts.map(p => math.log(p._3)).sum)
    val sxy = pts.map(p => math.log(p._1.toDouble) * math.log(p._3)).sum
    val sxx = pts.map(p => math.pow(math.log(p._1.toDouble), 2)).sum
    val h = (k * sxy - sx * sy) / (k * sxx - sx * sx)

    assert(rows.length === 4)
    rows.zip(pts).foreach { case (row, (w, nb, rs)) =>
      assert(row.getAs[Int]("w") === w)
      assert(row.getAs[Long]("n_blocks") === nb.toLong)
      assert(math.abs(row.getAs[Double]("rs_mean") - rs) < 5e-6,
        s"w=$w rs ${row.getAs[Double]("rs_mean")} vs brute $rs")
      assert(math.abs(row.getAs[Double]("hurst_h") - h) < 5e-6)
    }
  }

  test("q253 KPSS eta matches a sequential partial-sum walk") {
    val row = SparkEntry.queries("q253_kpss")(spark, sf0001).head()

    val series = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day").collect().map(_.getLong(1).toDouble)
    val n = series.length
    val mean = series.sum / n
    val e = series.map(_ - mean)
    val p = e.scanLeft(0.0)(_ + _).drop(1)
    val g0 = e.map(x => x * x).sum / n
    val m = 7
    val sLr = g0 + 2.0 * (1 to m).map { j =>
      (1.0 - j.toDouble / (m + 1)) *
        e.drop(j).zip(e.dropRight(j)).map { case (a, b) => a * b }.sum / n
    }.sum
    val eta = p.map(x => x * x).sum / (n.toDouble * n * sLr)

    assert(row.getAs[Long]("n_days") === n.toLong)
    assert(row.getAs[Int]("bandwidth") === m)
    assert(math.abs(row.getAs[Double]("kpss_eta") - eta) < 5e-6,
      s"eta ${row.getAs[Double]("kpss_eta")} vs brute $eta")
  }

  test("q254 Jonckheere-Terpstra J and z match an O(n^2) ordered-pair loop") {
    val row = SparkEntry.queries("q254_jonckheere")(spark, sf0001).head()

    val data = Tables.orders(spark, sf0001)
      .select(substring(col("o_orderpriority"), 1, 1).cast("int"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val groups = (1 to 5).map(g => data.filter(_._1 == g).map(_._2))
    var j2 = BigInt(0)
    for (g <- 0 until 4; h <- (g + 1) until 5; x <- groups(g);
         y <- groups(h)) {
      if (x < y) j2 += 2 else if (x == y) j2 += 1
    }
    val j = j2.toDouble / 2.0
    val ns = groups.map(_.length.toDouble)
    val n = ns.sum
    val eJ = (n * n - ns.map(x => x * x).sum) / 4.0
    val varJ = (n * n * (2 * n + 3) -
      ns.map(x => x * x * (2 * x + 3)).sum) / 72.0
    val z = (j - eJ) / math.sqrt(varJ)

    assert(row.getAs[Long]("n_orders") === n.toLong)
    assert(math.abs(row.getAs[Double]("j_stat") - j) < 0.5,
      s"J ${row.getAs[Double]("j_stat")} vs brute $j")
    assert(math.abs(row.getAs[Double]("z_jt") - z) < 5e-3,
      s"z ${row.getAs[Double]("z_jt")} vs brute $z")
    assert(math.abs(row.getAs[Double]("p") - pTwoSided(z)) < 1e-6)
  }

  test("q255 normal-fit KS distance matches a sequential CDF walk") {
    val row = SparkEntry.queries("q255_normal_ks")(spark, sf0001).head()

    val vals = Tables.orders(spark, sf0001)
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = vals.length
    val mu = vals.map(_.toDouble).sum / n
    val sd = math.sqrt(vals.map(v => (v - mu) * (v - mu)).sum / (n - 1))
    def phi(z: Double): Double =
      if (z >= 0) 1.0 - pTwoSided(z) / 2.0 else pTwoSided(z) / 2.0
    var d = 0.0; var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && vals(j + 1) == vals(i)) j += 1
      val f = phi((vals(i) - mu) / sd)
      d = math.max(d, math.max(math.abs((j + 1).toDouble / n - f),
        math.abs(f - i.toDouble / n)))
      i = j + 1
    }

    assert(row.getAs[Long]("n_orders") === n.toLong)
    assert(math.abs(row.getAs[Double]("mean_price") - mu / 100.0) < 5e-3)
    assert(math.abs(row.getAs[Double]("sd_price") - sd / 100.0) < 5e-3)
    assert(math.abs(row.getAs[Double]("ks_d") - d) < 5e-6,
      s"D ${row.getAs[Double]("ks_d")} vs brute $d")
  }

  test("q229 Mantel-Haenszel pooled OR matches a sequential stratum walk") {
    val rows = SparkEntry.queries("q229_mantel_haenszel")(spark, sf0001)
      .orderBy("c_mktsegment").collect()

    val data = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("c_mktsegment"),
        (col("o_orderpriority") === "1-URGENT"),
        (col("o_totalprice") >= 200000.0))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    val strata = data.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, xs) =>
      val a = xs.count(t => t._2 && t._3).toDouble
      val b = xs.count(t => t._2 && !t._3).toDouble
      val c = xs.count(t => !t._2 && t._3).toDouble
      val d = xs.count(t => !t._2 && !t._3).toDouble
      (g, a, b, c, d)
    }
    val sumAd = strata.map { case (_, a, b, c, d) => a * d / (a + b + c + d) }.sum
    val sumBc = strata.map { case (_, a, b, c, d) => b * c / (a + b + c + d) }.sum
    val orMh = sumAd / sumBc

    assert(rows.length === strata.length)
    rows.zip(strata).foreach { case (row, (g, a, b, c, d)) =>
      assert(row.getAs[String]("c_mktsegment") === g)
      assert(row.getAs[Long]("a").toDouble === a)
      assert(row.getAs[Long]("d").toDouble === d)
      assert(math.abs(row.getAs[Double]("or_stratum") - a * d / (b * c)) < 5e-4)
      assert(math.abs(row.getAs[Double]("or_mh") - orMh) < 5e-4,
        s"OR_MH ${row.getAs[Double]("or_mh")} vs brute $orMh")
    }
  }

  test("q256 Jarque-Bera matches a sequential moment computation") {
    val row = SparkEntry.queries("q256_jarque_bera")(spark, sf0001).head()
    val xs = Tables.orders(spark, sf0001)
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
      .collect().map(_.getLong(0))
    val n = xs.length
    val m = math.floor(xs.map(BigInt(_)).sum.toDouble / n).toLong
    val d = xs.map(_ - m)
    val s2 = d.map(v => BigInt(v) * v).sum.toDouble / n
    val skew = (d.map(v => BigInt(v) * v * v).sum.toDouble / n) /
      math.pow(s2, 1.5)
    val exk = (d.map(v => BigInt(v) * v * v * v).sum.toDouble / n) /
      (s2 * s2) - 3.0
    val jb = n / 6.0 * (skew * skew + exk * exk / 4.0)
    assert(row.getAs[Long]("n_orders") === n.toLong)
    assert(math.abs(row.getAs[Double]("skewness") - skew) < 1e-5)
    assert(math.abs(row.getAs[Double]("excess_kurtosis") - exk) < 1e-5)
    assert(math.abs(row.getAs[Double]("jb_stat") - jb) < 1e-3)
  }

  test("q259 Mood median chi2 matches a sequential 2xk computation") {
    val rows = SparkEntry.queries("q259_mood_median")(spark, sf0001)
      .orderBy("priority").collect()
    val data = Tables.orders(spark, sf0001)
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val vs = data.map(_._2).sorted
    val n = vs.length
    // quantile_cont(0.5) linear interpolation
    val h = (n - 1) * 0.5
    val med = vs(h.toInt) + (h - h.toInt) *
      (vs(math.min(h.toInt + 1, n - 1)) - vs(h.toInt))
    val groups = data.groupBy(_._1).toSeq.sortBy(_._1)
    val aT = data.count(_._2.toDouble > med).toLong
    var chi = 0.0
    groups.foreach { case (_, g) =>
      val ni = g.length.toDouble
      val ai = g.count(_._2.toDouble > med).toDouble
      val ea = ni * aT / n
      val eb = ni * (n - aT) / n
      chi += (ai - ea) * (ai - ea) / ea +
        (ni - ai - eb) * (ni - ai - eb) / eb
    }
    assert(rows.length === 5)
    assert(math.abs(rows.head.getAs[Double]("chi2") - chi) < 1e-3,
      s"chi2 ${rows.head.getAs[Double]("chi2")} vs brute $chi")
  }

  test("q263 Cox-Stuart signs match a sequential half-pairing") {
    val row = SparkEntry.queries("q263_cox_stuart")(spark, sf0001).head()
    val series = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day").collect().map(_.getLong(1))
    val n = series.length
    val m = (n + 1) / 2
    var up = 0L; var dn = 0L
    (0 until n - m).foreach { i =>
      if (series(i + m) > series(i)) up += 1
      else if (series(i + m) < series(i)) dn += 1
    }
    assert(row.getAs[Long]("n_days") === n.toLong)
    assert(row.getAs[Long]("s_up") === up)
    assert(row.getAs[Long]("s_dn") === dn)
    val z = (up - dn).toDouble / math.sqrt((up + dn).toDouble)
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-3)
  }

  test("q264 turning points match a sequential scan") {
    val row = SparkEntry.queries("q264_turning_points")(spark, sf0001).head()
    val series = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day").collect().map(_.getLong(1))
    val n = series.length
    var tp = 0L
    (1 until n - 1).foreach { i =>
      if ((series(i) > series(i - 1) && series(i) > series(i + 1)) ||
        (series(i) < series(i - 1) && series(i) < series(i + 1))) tp += 1
    }
    assert(row.getAs[Long]("n_days") === n.toLong)
    assert(row.getAs[Long]("t_points") === tp)
    val e = 2.0 * (n - 2) / 3.0
    val v = (16.0 * n - 29.0) / 90.0
    assert(math.abs(row.getAs[Double]("z") - (tp - e) / math.sqrt(v)) < 1e-3)
  }

  test("q267 lambdas match a sequential PRE computation") {
    val row = SparkEntry.queries("q267_gk_lambda")(spark, sf0001).head()
    val pairs = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "o_orderpriority")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = pairs.length.toDouble
    def lambda(xs: Seq[(String, String)]): Double = {
      val sumMax = xs.groupBy(_._1).values
        .map(g => g.groupBy(_._2).values.map(_.size).max).sum
      val modeY = xs.groupBy(_._2).values.map(_.size).max
      (sumMax - modeY) / (n - modeY)
    }
    assert(math.abs(row.getAs[Double]("lambda_pri_given_seg") -
      lambda(pairs.toSeq)) < 1e-5)
    assert(math.abs(row.getAs[Double]("lambda_seg_given_pri") -
      lambda(pairs.toSeq.map(_.swap))) < 1e-5)
  }

  test("q268 mutual information matches a sequential computation") {
    val row = SparkEntry.queries("q268_mutual_info")(spark, sf0001).head()
    val pairs = Tables.orders(spark, sf0001)
      .select("o_orderstatus", "o_orderpriority")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = pairs.length.toDouble
    val nxy = pairs.groupBy(identity).view.mapValues(_.size).toMap
    val nx = pairs.groupBy(_._1).view.mapValues(_.size).toMap
    val ny = pairs.groupBy(_._2).view.mapValues(_.size).toMap
    val mi = nxy.map { case ((x, y), c) =>
      c / n * math.log(n * c / (nx(x).toDouble * ny(y))) }.sum
    val hx = -nx.values.map(c => c / n * math.log(c / n)).sum
    val hy = -ny.values.map(c => c / n * math.log(c / n)).sum
    assert(math.abs(row.getAs[Double]("mi_nats") - mi) < 1e-5)
    assert(math.abs(row.getAs[Double]("h_status") - hx) < 1e-5)
    assert(math.abs(row.getAs[Double]("h_priority") - hy) < 1e-5)
    assert(math.abs(row.getAs[Double]("nmi") - mi / math.sqrt(hx * hy))
      < 1e-5)
  }

  test("q269 Chao1 and coverage match a sequential spectrum count") {
    val row = SparkEntry.queries("q269_chao1")(spark, sf0001).head()
    val counts = Tables.documents(spark, sf0001)
      .select(col("text")).collect().map(_.getString(0))
      .flatMap(_.split(" ", -1).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size).toMap
    val v = counts.size.toLong
    val n = counts.values.map(_.toLong).sum
    val f1 = counts.values.count(_ == 1).toLong
    val f2 = counts.values.count(_ == 2).toLong
    assert(row.getAs[Long]("n_types") === v)
    assert(row.getAs[Long]("n_tokens") === n)
    assert(row.getAs[Long]("singletons") === f1)
    assert(row.getAs[Long]("doubletons") === f2)
    assert(math.abs(row.getAs[Double]("chao1") -
      (v + f1.toDouble * (f1 - 1) / (2.0 * (f2 + 1)))) < 1e-3)
    assert(math.abs(row.getAs[Double]("good_coverage") -
      (1.0 - f1.toDouble / n)) < 1e-5)
  }

  test("q271 DP dispersion matches a sequential Gries computation") {
    val rows = SparkEntry.queries("q271_term_dispersion")(spark, sf0001)
      .collect().map(r => r.getAs[String]("term") ->
        r.getAs[Double]("dp")).toMap
    val data = Tables.documents(spark, sf0001)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ", -1).filter(_.nonEmpty)
        .map(w => (w, r.getString(0))))
    val nt = data.length.toDouble
    val bySrc = data.groupBy(_._2).view.mapValues(_.size).toMap
    val sources = bySrc.keys.toSeq
    rows.foreach { case (term, dpGot) =>
      val occ = data.filter(_._1 == term)
      val nw = occ.length.toDouble
      val dp = sources.map { src =>
        val vi = occ.count(_._2 == src) / nw
        val si = bySrc(src) / nt
        math.abs(vi - si)
      }.sum / 2.0
      assert(math.abs(dpGot - dp) < 1e-4, s"$term dp $dpGot vs brute $dp")
    }
  }

  test("q274 Fleiss kappa matches a sequential rater walk") {
    val row = SparkEntry.queries("q274_fleiss_kappa")(spark, sf0001).head()
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "on")
    val gs = Tables.documents(spark, sf0001)
      .select(col("text"), col("n_chars")).collect().map { r =>
        val toks = r.getString(0).split(" ", -1)
        (if (r.getLong(1) >= 100) 1 else 0) +
          (if (toks.length >= 20) 1 else 0) +
          (if (toks.exists(stop)) 1 else 0)
      }
    val n = gs.length.toDouble
    val pbar = gs.map(g => g * (g - 1) + (3 - g) * (2 - g)).sum / (n * 6.0)
    val pg = gs.sum / (n * 3.0)
    val pe = pg * pg + (1 - pg) * (1 - pg)
    val kappa = (pbar - pe) / (1 - pe)
    assert(row.getAs[Long]("n_docs") === gs.length.toLong)
    assert(math.abs(row.getAs[Double]("fleiss_kappa") - kappa) < 1e-5)
  }

  test("q260 Wilcoxon signed-rank matches a sequential rank walk") {
    val row = SparkEntry.queries("q260_wilcoxon_sr")(spark, sf0001).head()
    val cut = java.time.LocalDate.parse("1998-01-01")
    val byCust = Tables.orders(spark, sf0001)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
      .groupBy(_._1)
    val ds = byCust.values.flatMap { os =>
      val (late, early) = os.partition(_._2.compareTo(cut) >= 0)
      if (late.isEmpty || early.isEmpty) None
      else {
        val d = math.floor(late.map(_._3).sum.toDouble / late.size + 0.5)
          .toLong -
          math.floor(early.map(_._3).sum.toDouble / early.size + 0.5).toLong
        if (d == 0) None else Some(d)
      }
    }.toArray
    val n = ds.length
    val sorted = ds.sortBy(math.abs)
    val ranks = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n &&
        math.abs(sorted(j + 1)) == math.abs(sorted(i))) j += 1
      val avg = (i + 1 + j + 1) / 2.0
      (i to j).foreach(k => ranks(k) = avg)
      i = j + 1
    }
    val wPlus = sorted.zip(ranks).filter(_._1 > 0).map(_._2).sum
    val ties = sorted.map(math.abs).groupBy(identity).values
      .map(g => { val c = g.length.toLong; c * c * c - c }).sum
    val varW = n.toDouble * (n + 1) * (2 * n + 1) / 24.0 - ties / 48.0
    val z = (wPlus - n.toDouble * (n + 1) / 4.0) / math.sqrt(varW)
    assert(row.getAs[Long]("n_pairs") === n.toLong)
    assert(math.abs(row.getAs[Double]("w_plus") - wPlus) < 1e-9)
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-3)
  }

  test("q262 Hodges-Lehmann matches a sequential Walsh-median") {
    val row = SparkEntry.queries("q262_hodges_lehmann")(spark, sf0001).head()
    val daily = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
    val tmax = daily.map(_._1).max
    val rc = daily.filter(_._1 > tmax - 365).map(_._2)
    val walsh = (for (i <- rc.indices; j <- i until rc.length)
      yield rc(i) + rc(j)).sorted
    def medInterp(xs: Seq[Long]): Double = {
      val h = (xs.length - 1) * 0.5
      xs(h.toInt) + (h - h.toInt) *
        (xs(math.min(h.toInt + 1, xs.length - 1)) - xs(h.toInt))
    }
    assert(row.getAs[Long]("n_pairs") === walsh.length.toLong)
    assert(math.abs(row.getAs[Double]("hodges_lehmann") -
      medInterp(walsh) / 2.0) < 0.02)
  }

  test("q265 variance ratio matches a sequential quantized-log walk") {
    val row = SparkEntry.queries("q265_variance_ratio")(spark, sf0001).head()
    val revs = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day").collect().map(_.getLong(1))
    val lx = revs.map(r => math.floor(math.log(r.toDouble) * 1e9 + 0.5)
      .toLong)
    def varOf(xs: Seq[Long]): Double = {
      val n = xs.length.toDouble
      val s = xs.map(BigInt(_)).sum.toDouble
      val q = xs.map(x => BigInt(x) * x).sum.toDouble
      (q - s * s / n) / n
    }
    val r1 = lx.sliding(2).map(p => p(1) - p(0)).toSeq
    val rq = lx.indices.drop(5).map(i => lx(i) - lx(i - 5))
    val vr = varOf(rq) / (5.0 * varOf(r1))
    assert(row.getAs[Long]("n_returns") === r1.length.toLong)
    assert(math.abs(row.getAs[Double]("vr5") - vr) < 1e-4,
      s"vr ${row.getAs[Double]("vr5")} vs brute $vr")
  }

  test("q266 periodogram shares match a sequential quantized DFT") {
    val rows = SparkEntry.queries("q266_periodogram")(spark, sf0001)
      .orderBy("period_days").collect()
    val revs = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day").collect().map(_.getLong(1))
    val n = revs.length
    val sSum = revs.map(BigInt(_)).sum
    val qSum = revs.map(r => BigInt(r) * r).sum
    val eps = revs.map(r => (BigInt(r) * n - sSum).toDouble)
    val totVar = (n.toDouble * qSum.toDouble - sSum.toDouble *
      sSum.toDouble) / n
    Seq(7, 14, 30).zip(rows).foreach { case (per, got) =>
      val w = 2.0 * math.Pi / per
      val sc = eps.zipWithIndex.map { case (e, tt) =>
        math.floor(e * math.cos(w * tt) / 1e6 + 0.5).toLong }.sum
      val ss = eps.zipWithIndex.map { case (e, tt) =>
        math.floor(e * math.sin(w * tt) / 1e6 + 0.5).toLong }.sum
      val power = (sc.toDouble * sc + ss.toDouble * ss) * 1e12 /
        (n.toDouble * n)
      val share = power / (n * totVar) * 2.0
      assert(got.getAs[Long]("period_days") === per.toLong)
      assert(math.abs(got.getAs[Double]("spectral_share") - share) < 1e-4,
        s"period $per share ${got.getAs[Double]("spectral_share")}" +
          s" vs brute $share")
    }
  }

  test("q273 CUPED theta and adjusted means match a sequential walk") {
    val rows = SparkEntry.queries("q273_cuped")(spark, sf0001)
      .orderBy("arm").collect()
    val evs = Tables.events(spark, sf0001)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("vc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cut = evs.map(_._2).max - 14L * 86400L * 1000000L
    val peru = evs.groupBy(_._1).map { case (u, es) =>
      (u % 2, es.filter(_._2 < cut).map(_._3).sum,
        es.filter(_._2 >= cut).map(_._3).sum)
    }.toSeq
    val nu = peru.length.toDouble
    val sx = peru.map(p => BigInt(p._2)).sum.toDouble
    val sy = peru.map(p => BigInt(p._3)).sum.toDouble
    val sxy = peru.map(p => BigInt(p._2) * p._3).sum.toDouble
    val sxx = peru.map(p => BigInt(p._2) * p._2).sum.toDouble
    val theta = (sxy - sx * (sy / nu)) / (sxx - sx * (sx / nu))
    val xbar = sx / nu
    rows.foreach { r =>
      val arm = r.getAs[Long]("arm")
      val g = peru.filter(_._1 == arm)
      val my = g.map(p => BigInt(p._3)).sum.toDouble / g.length
      val mx = g.map(p => BigInt(p._2)).sum.toDouble / g.length
      assert(r.getAs[Long]("n_users") === g.length.toLong)
      assert(math.abs(r.getAs[Double]("mean_y") - my / 100.0) < 0.01)
      assert(math.abs(r.getAs[Double]("mean_y_cuped") -
        (my - theta * (mx - xbar)) / 100.0) < 0.01)
      assert(math.abs(r.getAs[Double]("theta") - theta) < 1e-4)
    }
  }

  test("q261 EB shrinkage matches a sequential MoM fit") {
    val rows = SparkEntry.queries("q261_eb_shrinkage")(spark, sf0001)
      .collect()
    val li = Tables.lineitem(spark, sf0001)
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rqs = li.filter(_._2 >= 5)
      .map(p => math.floor(p._3.toDouble / p._2 * 1e9 + 0.5).toLong)
    val g = rqs.length.toDouble
    val sr = rqs.map(BigInt(_)).sum.toDouble
    val qr = rqs.map(x => BigInt(x) * x).sum.toDouble
    val m1 = sr / g / 1e9
    val m2 = (qr - sr * (sr / g)) / (g - 1.0) / 1e18
    val common = m1 * (1.0 - m1) / m2 - 1.0
    val (alpha, beta) = (m1 * common, (1.0 - m1) * common)
    val byKey = li.map(p => p._1 -> p).toMap
    rows.foreach { r =>
      val (_, n, k) = byKey(r.getAs[Long]("l_partkey"))
      val post = (k + alpha) / (n + alpha + beta)
      assert(math.abs(r.getAs[Double]("eb_rate") - post) < 1e-3)
    }
  }

  test("q275 Ljung-Box Q matches a sequential autocorrelation walk") {
    val row = SparkEntry.queries("q275_ljung_box")(spark, sf0001).head()

    val revs = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day")
      .collect().map(_.getLong(1))
    val dx = revs.sliding(2).map(p => p(1) - p(0)).toArray
    val n = dx.length
    // exact centering via the q253 n-scaling trick: e_t = n·dx_t − Σdx
    val s = dx.map(BigInt(_)).sum
    val e = dx.map(x => BigInt(x) * n - s)
    val see = e.map(x => x * x).sum
    var tsum = 0.0
    (1 to 6).foreach { k =>
      val sxy = (k until n).map(t => e(t) * e(t - k)).sum
      val rho = sxy.toDouble / see.toDouble
      tsum += rho * rho / (n.toDouble - k)
    }
    val q = n.toDouble * (n + 2.0) * tsum
    val p = math.exp(-q / 2.0) * (1.0 + q / 2.0 + q * q / 8.0)

    assert(row.getAs[Long]("n_diffs") === n.toLong)
    assert(row.getAs[Long]("df") === 6L)
    assert(math.abs(row.getAs[Double]("lb_q") - q) < 5e-4,
      s"Q ${row.getAs[Double]("lb_q")} vs brute $q")
    assert(math.abs(row.getAs[Double]("p") - p) < 1e-6,
      s"p ${row.getAs[Double]("p")} vs brute $p")
  }

  test("q270 Heaps fit matches a sequential vocabulary walk") {
    val row = SparkEntry.queries("q270_heaps_law")(spark, sf0001).head()

    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    val seen = scala.collection.mutable.HashSet.empty[String]
    var cumN = 0L
    val walk = docs.map { case (_, text) =>
      val ws = text.split(" ", -1)
      cumN += ws.length
      ws.foreach(seen += _)
      (cumN, seen.size.toLong)
    }
    val nDocs = walk.length
    // log-spaced checkpoints N/2⁹..N — the query's saturation-resistant
    // sampling (see q270's scaladoc)
    val cks = (1 to 10).map(k => math.max(1, nDocs >> (10 - k))).distinct
      .filter(i => walk(i - 1)._1 > 0 && walk(i - 1)._2 > 0)
      .map(i => walk(i - 1))
    val xs = cks.map(c => math.floor(math.log(c._1.toDouble) * 1e9 + 0.5).toLong)
    val ys = cks.map(c => math.floor(math.log(c._2.toDouble) * 1e9 + 0.5).toLong)
    val m = cks.size
    val (sx, sy) = (xs.map(BigInt(_)).sum, ys.map(BigInt(_)).sum)
    val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * b }.sum
    val sxx = xs.map(a => BigInt(a) * a).sum
    val beta = (m * sxy - sx * sy).toDouble / (m * sxx - sx * sx).toDouble
    val lnk = (sy.toDouble / 1e9 - beta * (sx.toDouble / 1e9)) / m

    assert(row.getAs[Long]("n_checkpoints") === m.toLong)
    assert(row.getAs[Long]("n_tokens") === cks.map(_._1).max)
    assert(row.getAs[Long]("n_vocab") === cks.map(_._2).max)
    assert(math.abs(row.getAs[Double]("heaps_beta") - beta) < 1e-5,
      s"beta ${row.getAs[Double]("heaps_beta")} vs brute $beta")
    assert(math.abs(row.getAs[Double]("heaps_lnk") - lnk) < 1e-3,
      s"lnK ${row.getAs[Double]("heaps_lnk")} vs brute $lnk")
  }

  test("q272 ERR@20 matches a sequential cascade walk per query") {
    val rows = SparkEntry.queries("q272_err20")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap

    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    docs.map(_._2).distinct.sorted.foreach { ql =>
      val ranking = docs.sortBy(d => (-d._3, d._1))
      var cumrel = 0L
      var errq = 0L
      var nRel20 = 0L
      ranking.zipWithIndex.foreach { case ((_, lang, _), idx) =>
        val rk = idx + 1
        if (lang == ql) {
          cumrel += 1
          if (rk <= 20) {
            nRel20 += 1
            errq += math.floor(
              math.pow(0.5, cumrel.toDouble) / rk * 1e12 + 0.5).toLong
          }
        }
      }
      val r = rows(ql)
      assert(r.getAs[Long]("n_rel20") === nRel20, s"$ql n_rel20")
      // the query rounds to 6dp — compare on that grid
      assert(math.abs(r.getAs[Double]("err20") - errq / 1e12) < 5e-7,
        s"$ql err20 ${r.getAs[Double]("err20")} vs brute ${errq / 1e12}")
    }
  }

  test("q276 Brier + Murphy terms match a sequential binned walk") {
    val row = SparkEntry.queries("q276_brier_murphy")(spark, sf0001).head()

    val docs = Tables.documents(spark, sf0001)
      .select(col("n_chars"), (col("source") === "src0").as("y"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val census = docs.groupBy(_._1).map { case (sc, g) =>
      (sc, g.length.toLong, g.count(_._2).toLong)
    }.toSeq
    val (mn, mx) = (census.map(_._1).min, census.map(_._1).max)
    val span = mx - mn
    val q = census.map { case (sc, n, pos) =>
      val phat = if (span > 0) (sc - mn).toDouble / span else 0.0
      val pq = math.floor(phat * 1e9 + 0.5).toLong
      val bin = (sc - mn) * 10 / (mx - mn + 1)
      (bin, n, pos, pq)
    }
    val nAll = q.map(_._2).sum
    val pAll = q.map(_._3).sum
    val bsum = q.map { case (_, n, pos, pq) =>
      BigInt(pos) * (BigInt(pq - 1000000000L) * (pq - 1000000000L)) +
        BigInt(n - pos) * (BigInt(pq) * pq)
    }.sum
    val obarAll = pAll.toDouble / nAll
    var rels, ress = 0L
    q.groupBy(_._1).foreach { case (_, g) =>
      val nk = g.map(_._2).sum
      val pk = g.map(_._3).sum
      val spq = g.map(c => BigInt(c._2) * c._4).sum
      val pbar = spq.toDouble / 1e9 / nk
      val obar = pk.toDouble / nk
      rels += math.floor(nk.toDouble * (pbar - obar) * (pbar - obar) *
        1e12 + 0.5).toLong
      ress += math.floor(nk.toDouble * (obar - obarAll) * (obar - obarAll) *
        1e12 + 0.5).toLong
    }
    val brier = bsum.toDouble / 1e18 / nAll
    val rel = rels.toDouble / 1e12 / nAll
    val res = ress.toDouble / 1e12 / nAll
    val unc = obarAll * (1.0 - obarAll)
    assert(row.getAs[Long]("n_docs") === nAll)
    assert(math.abs(row.getAs[Double]("brier") - brier) < 5e-6)
    assert(math.abs(row.getAs[Double]("reliability") - rel) < 5e-6)
    assert(math.abs(row.getAs[Double]("resolution") - res) < 5e-6)
    assert(math.abs(row.getAs[Double]("uncertainty") - unc) < 5e-6)
    assert(math.abs(row.getAs[Double]("within_resid") -
      (brier - (rel - res + unc))) < 1e-5)
  }

  test("q277 diversity profile matches a sequential type census") {
    val rows = SparkEntry.queries("q277_diversity")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap

    val docs = Tables.documents(spark, sf0001)
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).foreach { case (src, g) =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      g.foreach(_._2.split(" ", -1).foreach(w =>
        counts(w) = counts.getOrElse(w, 0L) + 1))
      val nt = counts.values.sum
      val st = counts.size.toLong
      val rep = counts.values.map(n => BigInt(n) * (n - 1)).sum
      val snln = counts.values.map(n =>
        BigInt(math.floor(n.toDouble * math.log(n.toDouble) * 1e9 + 0.5)
          .toLong)).sum
      val simpson = rep.toDouble / (nt.toDouble * (nt.toDouble - 1.0))
      val shannon = math.floor(math.log(nt.toDouble) * 1e9 + 0.5) / 1e9 -
        (snln.toDouble / 1e9) / nt
      val even = shannon /
        (math.floor(math.log(st.toDouble) * 1e9 + 0.5) / 1e9)
      val r = rows(src)
      assert(r.getAs[Long]("n_tokens") === nt, s"$src tokens")
      assert(r.getAs[Long]("n_types") === st, s"$src types")
      assert(math.abs(r.getAs[Double]("simpson") - simpson) < 5e-6, src)
      assert(math.abs(r.getAs[Double]("shannon") - shannon) < 5e-6, src)
      assert(math.abs(r.getAs[Double]("evenness") - even) < 5e-6, src)
    }
  }

  test("q280 two-sample AD matches a sequential pooled-census walk") {
    val row = SparkEntry.queries("q280_ad_two_sample")(spark, sf0001).head()

    val vals = Tables.orders(spark, sf0001)
      .select(expr("cast(round(o_totalprice * 100) as bigint)").as("pc"),
        (col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .as("is_new"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val census = vals.groupBy(_._1).toSeq.sortBy(_._1).map { case (pc, g) =>
      (pc, g.length.toLong, g.count(!_._2).toLong)
    }
    val nn = census.map(_._2).sum
    val nx = census.map(_._3).sum
    val ny = nn - nx
    var (fa, fx) = (0L, 0L)
    var tq = 0L
    census.foreach { case (_, l, cx) =>
      fa += l; fx += cx
      if (fa < nn) {
        val num = (BigInt(fx) * nn - BigInt(nx) * fa).toDouble
        val den = (BigInt(fa) * (nn - fa)).toDouble
        tq += math.floor(l.toDouble *
          (num * num / (den * (nx.toDouble * ny.toDouble))) *
          1e9 + 0.5).toLong
      }
    }
    assert(row.getAs[Long]("n_base") === nx)
    assert(row.getAs[Long]("n_new") === ny)
    assert(math.abs(row.getAs[Double]("a2") - tq / 1e9) < 5e-6,
      s"a2 ${row.getAs[Double]("a2")} vs brute ${tq / 1e9}")
  }

  test("q281 Cochran's Q matches a sequential three-rater walk") {
    val row = SparkEntry.queries("q281_cochran_q")(spark, sf0001).head()

    val stop = Set("the", "a", "of", "and", "to", "in", "is", "on")
    val docs = Tables.documents(spark, sf0001)
      .select(col("n_chars"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val votes = docs.map { case (nc, text) =>
      val ws = text.split(" ", -1)
      (if (nc >= 100) 1L else 0L,
        if (ws.length >= 20) 1L else 0L,
        if (ws.exists(stop)) 1L else 0L)
    }
    val (c1, c2, c3) = (votes.map(_._1).sum, votes.map(_._2).sum,
      votes.map(_._3).sum)
    val t = c1 + c2 + c3
    val sr2 = votes.map { case (a, b, c) =>
      val g = a + b + c; g * g
    }.sum
    val q = (2.0 * (3.0 * (c1.toDouble * c1 + c2.toDouble * c2 +
      c3.toDouble * c3) - t.toDouble * t)) / (3.0 * t - sr2)
    val p = math.exp(-q / 2.0)
    assert(row.getAs[Long]("c1") === c1 && row.getAs[Long]("c2") === c2 &&
      row.getAs[Long]("c3") === c3)
    assert(math.abs(row.getAs[Double]("cochran_q") - q) < 5e-4)
    assert(math.abs(row.getAs[Double]("p") - p) < 1e-6)
  }

  test("q279 fold census matches a sequential union-find + LCG walk") {
    val rows = SparkEntry.queries("q279_leakage_folds")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r).toMap

    val pairs = SparkEntry.queries("q51_minhash_lsh")(spark, sf0001)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val docs = Tables.documents(spark, sf0001).select("doc_id")
      .collect().map(_.getLong(0))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val canon = docs.map(d => d -> find(d)).toMap
    def fold(c: Long) =
      (((c * 1103515245L + 12345L) % 1000000007L + 1000000007L)
        % 1000000007L) % 5
    val byFold = docs.groupBy(d => fold(canon(d)))
    val dupClusters = pairs.flatMap(p => Seq(p._1, p._2)).map(find)
      .distinct
    val straddle = dupClusters.count { c =>
      docs.filter(d => canon(d) == c).map(d => fold(d)).distinct.size > 1
    }
    (0L to 4L).foreach { f =>
      val r = rows(f)
      assert(r.getAs[Long]("n_docs") === byFold(f).length.toLong, s"fold $f")
      assert(r.getAs[Long]("n_clusters") ===
        byFold(f).map(canon).distinct.length.toLong, s"fold $f clusters")
      assert(r.getAs[Long]("n_dup_clusters") === dupClusters.length.toLong)
      assert(r.getAs[Long]("naive_straddle") === straddle.toLong)
    }
  }

  test("q278 MASE/sMAPE match a sequential Holt walk over the daily census") {
    val rows = SparkEntry.queries("q278_forecast_eval")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap

    // daily census exactly as q143 builds it (trivial rollup), then the
    // Holt recursion + the eval walk sequentially from the textbook
    import graft.ops.Parity._
    val daily = Tables.orders(spark, sf0001)
      .filter(col("o_orderdate") >= lit("1997-01-01"))
      .groupBy(to_date(col("o_orderdate")).as("day"),
        col("o_orderpriority"))
      .agg(sum(dm(col("o_totalprice"))).cast("double").as("rev"))
      .collect()
      .map(r => (r.getString(1), r.getDate(0).toString, r.getDouble(2)))
    daily.groupBy(_._1).foreach { case (pr, g) =>
      val series = g.sortBy(_._2).map(_._3)
      var l = 0.0; var b = 0.0; var init = false
      val fq = series.map { x =>
        if (!init) { l = x; b = 0.0; init = true }
        else {
          val l2 = 0.3 * x + 0.7 * (l + b)
          b = 0.1 * (l2 - l) + 0.9 * b
          l = l2
        }
        (math.floor(x * 1e4 + 0.5) / 1e4,
          math.floor((l + b) * 1e4 + 0.5) / 1e4)
      }
      var se, sn, ss = 0L; var n = 0L
      fq.sliding(2).foreach { p =>
        val (prevA, prevF) = p(0); val (a, _) = p(1)
        n += 1
        se += math.floor(math.abs(a - prevF) * 1e4 + 0.5).toLong
        sn += math.floor(math.abs(a - prevA) * 1e4 + 0.5).toLong
        if (math.abs(prevF) + math.abs(a) > 0.0)
          ss += math.floor(2.0 * math.abs(a - prevF) /
            (math.abs(prevF) + math.abs(a)) * 1e9 + 0.5).toLong
      }
      val r = rows(pr)
      assert(r.getAs[Long]("n_days") === n, s"$pr n_days")
      assert(math.abs(r.getAs[Double]("mae") - se.toDouble / 1e4 / n) < 1e-3,
        s"$pr mae")
      assert(math.abs(r.getAs[Double]("mase") - se.toDouble / sn) < 1e-3,
        s"$pr mase")
      assert(math.abs(r.getAs[Double]("smape") - ss.toDouble / 1e9 / n) < 1e-3,
        s"$pr smape")
    }
  }

  test("q282 Krippendorff alpha matches a sequential coincidence walk") {
    val row = SparkEntry.queries("q282_kripp_alpha")(spark, sf0001).head()

    val stop = Set("the", "a", "of", "and", "to", "in", "is", "on")
    val gs = Tables.documents(spark, sf0001)
      .select(col("n_chars"), col("text"))
      .collect().map { r =>
        val ws = r.getString(1).split(" ", -1)
        (if (r.getLong(0) >= 100) 1 else 0) +
          (if (ws.length >= 20) 1 else 0) +
          (if (ws.exists(stop)) 1 else 0)
      }
    val n = gs.length.toLong
    val nv = 3L * n
    val g = gs.map(_.toLong).sum
    val disPairs = gs.map(x => 2L * x * (3L - x)).sum
    val dO = disPairs.toDouble / (6.0 * n)
    val dE = 2.0 * g * (nv - g) / (nv.toDouble * (nv - 1))
    val alpha = 1.0 - dO / dE
    assert(row.getAs[Long]("n_docs") === n)
    assert(row.getAs[Long]("votes_good") === g)
    assert(math.abs(row.getAs[Double]("d_o") - dO) < 1e-6)
    assert(math.abs(row.getAs[Double]("d_e") - dE) < 1e-6)
    assert(math.abs(row.getAs[Double]("kripp_alpha") - alpha) < 1e-6)
  }

  test("q283 Hoover/Palma match a sequential sorted-census walk") {
    val row = SparkEntry.queries("q283_inequality")(spark, sf0001).head()

    val xs = Tables.orders(spark, sf0001)
      .groupBy("o_custkey")
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = xs.length
    val t = xs.map(x => BigInt(x._2)).sum
    val hoover = xs.map(x => (BigInt(x._2) * n - t).abs).sum.toDouble /
      (2.0 * n * t.toDouble)
    // NTILE(10) over (x desc, custkey): first (n mod 10) buckets get
    // ceil(n/10)
    val sorted = xs.sortBy(p => (-p._2, p._1)).map(_._2)
    val base = n / 10; val extra = n % 10
    var idx = 0
    val decSums = (1 to 10).map { d =>
      val sz = base + (if (d <= extra) 1 else 0)
      val sl = sorted.slice(idx, idx + sz); idx += sz
      sl.map(BigInt(_)).sum
    }
    val palma = decSums(0).toDouble / decSums.drop(6).sum.toDouble
    val r2020 = decSums.take(2).sum.toDouble / decSums.drop(8).sum.toDouble
    assert(row.getAs[Long]("n_customers") === n.toLong)
    assert(math.abs(row.getAs[Double]("hoover") - hoover) < 1e-6)
    assert(math.abs(row.getAs[Double]("palma") - palma) < 1e-4)
    assert(math.abs(row.getAs[Double]("ratio_2020") - r2020) < 1e-4)
  }

  test("q284 RBO matches a sequential prefix-overlap walk") {
    val rows = SparkEntry.queries("q284_rbo")(spark, sf0001)
      .collect().map(r => r.getInt(0) -> r).toMap

    val per = Tables.lineitem(spark, sf0001)
      .groupBy("l_partkey")
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
        .as("rev"),
        sum(expr("cast(round(l_quantity) as bigint)")).as("qty"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val topA = per.sortBy(p => (-p._2, p._1)).take(10).map(_._1)
    val topB = per.sortBy(p => (-p._3, p._1)).take(10).map(_._1)
    val p = 0.9
    var acc = 0.0
    (1 to 10).foreach { d =>
      val xd = topA.take(d).toSet.intersect(topB.take(d).toSet).size
      acc += (1 - p) * math.pow(p, d - 1) * xd / d
      val r = rows(d)
      assert(r.getAs[Long]("x_d") === xd.toLong, s"depth $d overlap")
      assert(math.abs(r.getAs[Double]("rbo") - acc) < 1e-6, s"depth $d rbo")
    }
  }

  test("q285 Kendall W matches a sequential midrank walk") {
    val row = SparkEntry.queries("q285_kendall_w")(spark, sf0001).head()

    val cells = Tables.events(spark, sf0001)
      .select((weekday(col("ts").cast("date")) + 1).as("isodow"),
        col("event_type"))
      .groupBy("isodow", "event_type").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val judges = cells.groupBy(_._1)
    val k = judges.size
    val objs = cells.map(_._2).distinct.sorted
    val n = objs.length
    // midranks per judge (ascending cnt), tie term Σ t(t²−1)
    var tieTerm = 0L
    val rankSums = scala.collection.mutable.Map.empty[String, Double]
        .withDefaultValue(0.0)
    judges.values.foreach { cs =>
      val sorted = cs.sortBy(_._3)
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j + 1 < sorted.length && sorted(j + 1)._3 == sorted(i)._3)
          j += 1
        val mid = (i + 1 + j + 1) / 2.0
        val t = (j - i + 1).toLong
        tieTerm += t * (t * t - 1L)
        (i to j).foreach(x => rankSums(sorted(x)._2) += mid)
        i = j + 1
      }
    }
    val rs = objs.map(rankSums)
    val rbar = rs.sum / n
    val sDev = rs.map(r => (r - rbar) * (r - rbar)).sum
    val den = k.toDouble * k * (n.toDouble * n * n - n) / 12.0 -
      k * tieTerm / 12.0
    val w = sDev / den
    assert(row.getAs[Long]("n_objects") === n.toLong)
    assert(row.getAs[Long]("k_judges") === k.toLong)
    assert(math.abs(row.getAs[Double]("kendall_w") - w) < 1e-4)
    assert(math.abs(row.getAs[Double]("friedman_chi2") -
      k * (n - 1) * w) < 5e-3)
  }

  test("q286 LM score matches a sequential bigram-model walk") {
    val rows = SparkEntry.queries("q286_lm_score")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap

    val docs = Tables.documents(spark, sf0001)
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val big = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    val srcBig = scala.collection.mutable.Map
      .empty[(String, (String, String)), Long].withDefaultValue(0L)
    val vocabSet = scala.collection.mutable.Set.empty[String]
    docs.foreach { case (src, text) =>
      val ws = text.split(" ", -1)
      vocabSet ++= ws
      ws.sliding(2).filter(_.length == 2).foreach { pr =>
        val b = (pr(0), pr(1))
        big(b) += 1; srcBig((src, b)) += 1
      }
    }
    val ctx = big.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val v = vocabSet.size.toLong
    def qln9(x: Long) = math.floor(math.log(x.toDouble) * 1e9 + 0.5).toLong
    val bySrc = srcBig.groupBy(_._1._1)
    bySrc.foreach { case (src, m) =>
      val nB = m.values.sum
      val types = m.size.toLong
      val snll = m.map { case ((_, b), cnt) =>
        BigInt(cnt) * (qln9(ctx(b._1) + v) - qln9(big(b) + 1L))
      }.sum
      val avg = snll.toDouble / 1e9 / nB
      val r = rows(src)
      assert(r.getAs[Long]("n_bigrams") === nB, s"$src n_bigrams")
      assert(r.getAs[Long]("bigram_types") === types, s"$src types")
      assert(r.getAs[Long]("vocab") === v, s"$src vocab")
      assert(math.abs(r.getAs[Double]("avg_nll") - avg) < 1e-5, s"$src nll")
      assert(math.abs(r.getAs[Double]("ppl") - math.exp(avg)) < 1e-2,
        s"$src ppl")
    }
  }

  test("q288 Ansari-Bradley matches a sequential both-ends-rank walk") {
    val row = SparkEntry.queries("q288_ansari_bradley")(spark, sf0001)
      .head()

    val vals = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(expr("cast(round(o_totalprice * 100) as bigint)").as("pc"),
        (col("o_orderpriority") === "1-URGENT").as("g1"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val sorted = vals.sortBy(_._1)
    val nTot = sorted.length
    val scores = new Array[Double](nTot)
    var i = 0
    while (i < nTot) {
      var j = i
      while (j + 1 < nTot && sorted(j + 1)._1 == sorted(i)._1) j += 1
      val mid = (i + 1 + j + 1) / 2.0
      val a = math.min(mid, nTot + 1 - mid)
      (i to j).foreach(x => scores(x) = a)
      i = j + 1
    }
    val m = sorted.count(_._2)
    val ab = sorted.zip(scores).filter(_._1._2).map(_._2).sum
    val abar = scores.sum / nTot
    val ss = scores.map(a => (a - abar) * (a - abar)).sum
    val z = (ab - m * abar) /
      math.sqrt(m.toDouble * (nTot - m) * ss / (nTot.toDouble * (nTot - 1)))
    assert(row.getAs[Long]("n_urgent") === m.toLong)
    assert(row.getAs[Long]("n_low") === (nTot - m).toLong)
    assert(math.abs(row.getAs[Double]("ab_stat") - ab) < 1e-9)
    assert(math.abs(row.getAs[Double]("z") - z) < 5e-4)
  }

  test("q289 Cucconi U/V/C match a sequential squared-rank walk") {
    val row = SparkEntry.queries("q289_cucconi")(spark, sf0001).head()

    val vals = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(expr("cast(round(o_totalprice * 100) as bigint)").as("pc"),
        (col("o_orderpriority") === "1-URGENT").as("g1"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val sorted = vals.sortBy(_._1)
    val nTot = sorted.length
    val ranks = new Array[Double](nTot)
    var i = 0
    while (i < nTot) {
      var j = i
      while (j + 1 < nTot && sorted(j + 1)._1 == sorted(i)._1) j += 1
      val mid = (i + 1 + j + 1) / 2.0
      (i to j).foreach(x => ranks(x) = mid)
      i = j + 1
    }
    val m = sorted.count(_._2)
    val sr2 = sorted.zip(ranks).filter(_._1._2).map(p => p._2 * p._2).sum
    val ss2 = sorted.zip(ranks).filter(_._1._2)
      .map(p => (nTot + 1 - p._2) * (nTot + 1 - p._2)).sum
    val nD = nTot.toDouble
    val mean = m * (nD + 1) * (2 * nD + 1)
    val sd = math.sqrt(m.toDouble * (nTot - m) * (nD + 1) * (2 * nD + 1) *
      (8 * nD + 11) / 5.0)
    val u = (6.0 * sr2 - mean) / sd
    val v = (6.0 * ss2 - mean) / sd
    val rho = 2.0 * (nD * nD - 4.0) / ((2 * nD + 1) * (8 * nD + 11)) - 1.0
    val c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    assert(row.getAs[Long]("n_urgent") === m.toLong)
    assert(math.abs(row.getAs[Double]("u") - u) < 5e-4)
    assert(math.abs(row.getAs[Double]("v") - v) < 5e-4)
    assert(math.abs(row.getAs[Double]("c") - c) < 5e-4)
    assert(math.abs(row.getAs[Double]("p") - math.exp(-c)) < 1e-6)
  }

  test("q290 spectral entropy matches a sequential DFT walk") {
    val row = SparkEntry.queries("q290_spectral_entropy")(spark, sf0001)
      .head()

    val rev = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day").collect().map(_.getLong(1))
    val n = rev.length
    val mean = rev.sum.toDouble / n
    val powers = (1 to n / 2).map { k =>
      var (sc, ss) = (0.0, 0.0)
      rev.zipWithIndex.foreach { case (x, t) =>
        val ang = t.toDouble * k * (2.0 * math.Pi / n)
        sc += (x - mean) * math.cos(ang)
        ss += (x - mean) * math.sin(ang)
      }
      sc * sc + ss * ss
    }
    val tot = powers.sum
    val h = -powers.filter(_ > 0).map(p => p / tot * math.log(p / tot)).sum
    val peakK = powers.indexOf(powers.max) + 1
    assert(row.getAs[Long]("n_days") === n.toLong)
    assert(row.getAs[Long]("n_freqs") === (n / 2).toLong)
    assert(math.abs(row.getAs[Double]("spectral_entropy") - h) < 5e-3)
    assert(math.abs(row.getAs[Double]("h_norm") - h / math.log(n / 2))
      < 5e-3)
    assert(row.getAs[Long]("peak_k") === peakK.toLong)
  }

  test("q291 D'Agostino K2 matches a sequential textbook transform") {
    val row = SparkEntry.queries("q291_dagostino_k2")(spark, sf0001)
      .head()

    val cs = Tables.orders(spark, sf0001)
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
      .collect().map(_.getLong(0))
    val n = cs.length
    val m = math.floor(cs.map(BigInt(_)).sum.toDouble / n).toLong
    val d = cs.map(c => (c - m).toDouble)
    val nD = n.toDouble
    val m2 = d.map(x => x * x).sum / n
    val g1 = (d.map(x => x * x * x).sum / n) / math.pow(m2, 1.5)
    val b2 = (d.map(x => x * x * x * x).sum / n) / (m2 * m2)
    val y = g1 * math.sqrt((nD + 1) * (nD + 3) / (6 * (nD - 2)))
    val beta2 = 3.0 * (nD * nD + 27 * nD - 70) * (nD + 1) * (nD + 3) /
      ((nD - 2) * (nD + 5) * (nD + 7) * (nD + 9))
    val w2 = math.sqrt(2 * (beta2 - 1)) - 1
    val delta = 1.0 / math.sqrt(math.log(math.sqrt(w2)))
    val alpha = math.sqrt(2.0 / (w2 - 1))
    val z1 = delta *
      math.log(y / alpha + math.sqrt((y / alpha) * (y / alpha) + 1))
    val eb2 = 3.0 * (nD - 1) / (nD + 1)
    val vb2 = 24.0 * nD * (nD - 2) * (nD - 3) /
      ((nD + 1) * (nD + 1) * (nD + 3) * (nD + 5))
    val xx = (b2 - eb2) / math.sqrt(vb2)
    val sb = (6.0 * (nD * nD - 5 * nD + 2) / ((nD + 7) * (nD + 9))) *
      math.sqrt(6.0 * (nD + 3) * (nD + 5) / (nD * (nD - 2) * (nD - 3)))
    val aA = 6.0 + 8.0 / sb * (2.0 / sb + math.sqrt(1 + 4.0 / (sb * sb)))
    val z2 = (1 - 2.0 / (9 * aA) -
      math.cbrt((1 - 2.0 / aA) /
        (1 + xx * math.sqrt(2.0 / (aA - 4))))) * math.sqrt(9 * aA / 2)
    val k2 = z1 * z1 + z2 * z2
    assert(row.getAs[Long]("n_orders") === n.toLong)
    assert(math.abs(row.getAs[Double]("z_skew") - z1) < 1e-3)
    assert(math.abs(row.getAs[Double]("z_kurt") - z2) < 1e-3)
    assert(math.abs(row.getAs[Double]("k2") - k2) / k2 < 1e-4)
  }

  test("q292 SampEn matches a sequential template-match walk") {
    val row = SparkEntry.queries("q292_sample_entropy")(spark, sf0001)
      .head()

    val all = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day").collect().map(_.getLong(1))
    val rev = all.takeRight(365)
    val n = rev.length
    val s0 = rev.sum.toDouble
    val q0 = rev.map(x => BigInt(x) * x).sum.toDouble
    val sd = math.sqrt(n * q0 - s0 * s0) / n
    val r = math.floor(0.2 * sd + 0.5).toLong
    // Richman–Moorman: A and B both range over the SAME N−m = n−2
    // templates (r14 advisor fix — the last length-2 window, which can
    // only ever B-match, is excluded from both counts)
    var (a, b) = (0L, 0L)
    for (i <- 0 until n - 2; j <- i + 1 until n - 2) {
      if (math.abs(rev(i) - rev(j)) <= r &&
          math.abs(rev(i + 1) - rev(j + 1)) <= r) {
        b += 1
        if (math.abs(rev(i + 2) - rev(j + 2)) <= r) a += 1
      }
    }
    assert(row.getAs[Long]("n_days") === n.toLong)
    assert(row.getAs[Long]("r_dollars") === r)
    assert(row.getAs[Long]("b_pairs") === b)
    assert(row.getAs[Long]("a_pairs") === a)
    assert(math.abs(row.getAs[Double]("sampen") -
      math.log(b.toDouble / a)) < 1e-5)
  }

  test("q293 partial correlation matches a sequential moment walk") {
    val row = SparkEntry.queries("q293_partial_corr")(spark, sf0001)
      .head()

    val per = Tables.lineitem(spark, sf0001)
      .groupBy("l_orderkey")
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
        .as("x"),
        sum(expr("cast(round(l_quantity) as bigint)")).as("y"),
        count(lit(1)).as("z"))
      .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble,
        r.getLong(3).toDouble))
    val n = per.length.toDouble
    def corr(a: Seq[Double], b: Seq[Double]): Double = {
      val (sa, sb) = (a.sum, b.sum)
      val sab = a.zip(b).map(p => p._1 * p._2).sum
      (n * sab - sa * sb) /
        math.sqrt((n * a.map(x => x * x).sum - sa * sa) *
          (n * b.map(x => x * x).sum - sb * sb))
    }
    val (xs, ys, zs) = (per.map(_._1).toSeq, per.map(_._2).toSeq,
      per.map(_._3).toSeq)
    val (rxy, rxz, ryz) = (corr(xs, ys), corr(xs, zs), corr(ys, zs))
    val part = (rxy - rxz * ryz) /
      math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    assert(row.getAs[Long]("n_orders") === per.length.toLong)
    assert(math.abs(row.getAs[Double]("r_xy") - rxy) < 1e-5)
    assert(math.abs(row.getAs[Double]("r_xz") - rxz) < 1e-5)
    assert(math.abs(row.getAs[Double]("r_yz") - ryz) < 1e-5)
    assert(math.abs(row.getAs[Double]("r_xy_z") - part) < 1e-5)
  }

  test("q287 ratio CI matches a sequential linearization walk") {
    val rows = SparkEntry.queries("q287_ratio_ci")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r).toMap

    val perU = Tables.events(spark, sf0001)
      .filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(coalesce(sum(floor(col("value") * 100.0 + 0.5).cast("long")),
        lit(0L)).as("y"), count(lit(1)).as("m"))
      .collect().map(r => (r.getLong(0) % 2, r.getLong(1), r.getLong(2)))
    perU.groupBy(_._1).foreach { case (arm, us) =>
      val n = us.length
      val sy = us.map(_._2).sum.toDouble
      val sm = us.map(_._3).sum.toDouble
      val r0 = sy / sm
      val ssq = us.map(u => math.pow(u._2 - r0 * u._3, 2)).sum
      val se = math.sqrt(ssq / (n.toDouble * (n - 1) * (sm / n) * (sm / n)))
      val r = rows(arm)
      assert(r.getAs[Long]("n_users") === n.toLong, s"arm $arm n")
      assert(r.getAs[Long]("n_events") === sm.toLong, s"arm $arm events")
      assert(math.abs(r.getAs[Double]("rev_per_event") - r0 / 100.0) < 1e-5)
      assert(math.abs(r.getAs[Double]("se") - se / 100.0) < 1e-5)
      assert(math.abs(r.getAs[Double]("ci_lo") - (r0 - 1.96 * se) / 100.0)
        < 1e-4)
      assert(math.abs(r.getAs[Double]("ci_hi") - (r0 + 1.96 * se) / 100.0)
        < 1e-4)
    }
  }

  test("q297 Cronbach alpha matches a sequential item-variance walk") {
    val row = SparkEntry.queries("q297_cronbach_alpha")(spark, sf0001)
      .head()
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "on")
    val items = Tables.documents(spark, sf0001)
      .select(col("n_chars"), col("text")).collect().map { r =>
        val nc = r.getLong(0); val text = r.getString(1)
        val toks = text.split(" ", -1)
        val i1 = math.min(nc / 100, 10L)
        val i2 = math.min(math.floor(toks.length / 20.0).toLong, 10L)
        val i3 = math.min(toks.count(stop.contains) / 5L, 10L)
        val i4 = math.min(text.count(_ == '.') / 2L, 10L)
        Array(i1, i2, i3, i4)
      }
    val n = items.length.toDouble
    def variance(v: Array[Double]): Double = {
      val m = v.sum / n; v.map(x => (x - m) * (x - m)).sum / n
    }
    val itemVars = (0 until 4).map(k =>
      variance(items.map(_(k).toDouble)))
    val totVar = variance(items.map(_.sum.toDouble))
    val alpha = 4.0 / 3.0 * (1.0 - itemVars.sum / totVar)
    assert(row.getAs[Long]("n_docs") === items.length.toLong)
    assert(math.abs(row.getAs[Double]("var_share") -
      itemVars.sum / totVar) < 1e-5)
    assert(math.abs(row.getAs[Double]("cronbach_alpha") - alpha) < 1e-5,
      s"alpha ${row.getAs[Double]("cronbach_alpha")} vs brute $alpha")
  }

  test("q298 OLS matches a sequential normal-equation solve") {
    val row = SparkEntry.queries("q298_ols_gram")(spark, sf0001).head()
    val per = Tables.lineitem(spark, sf0001)
      .groupBy("l_orderkey")
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
        .as("y"),
        sum(expr("cast(round(l_quantity) as bigint)")).as("x1"),
        count(lit(1)).as("x2"))
      .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble,
        r.getLong(3).toDouble))
    val n = per.length.toDouble
    // sequential textbook solve: X'X \ X'y via explicit 3x3 inverse
    val s1 = per.map(_._2).sum; val s2 = per.map(_._3).sum
    val sy = per.map(_._1).sum
    val s11 = per.map(p => p._2 * p._2).sum
    val s22 = per.map(p => p._3 * p._3).sum
    val s12 = per.map(p => p._2 * p._3).sum
    val s1y = per.map(p => p._2 * p._1).sum
    val s2y = per.map(p => p._3 * p._1).sum
    val syy = per.map(p => p._1 * p._1).sum
    def det3(a: Array[Double]): Double =
      a(0) * (a(4) * a(8) - a(5) * a(7)) -
        a(1) * (a(3) * a(8) - a(5) * a(6)) +
        a(2) * (a(3) * a(7) - a(4) * a(6))
    val d = det3(Array(n, s1, s2, s1, s11, s12, s2, s12, s22))
    val b0 = det3(Array(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)) / d
    val b1 = det3(Array(n, sy, s2, s1, s1y, s12, s2, s2y, s22)) / d
    val b2 = det3(Array(n, s1, sy, s1, s11, s1y, s2, s12, s2y)) / d
    val sse = syy - b0 * sy - b1 * s1y - b2 * s2y
    val r2 = 1.0 - sse / (syy - sy * sy / n)
    def ck(name: String, exp: Double): Unit = {
      val got = row.getAs[Double](name)
      assert(math.abs(got - exp) < 1e-4 * math.max(1.0, math.abs(exp)),
        s"$name $got vs brute $exp")
    }
    assert(row.getAs[Long]("n_orders") === per.length.toLong)
    ck("intercept_cents", b0); ck("beta_units", b1)
    ck("beta_lines", b2); ck("r2", r2)
    ck("adj_r2", 1.0 - (1.0 - r2) * (n - 1.0) / (n - 3.0))
  }

  test("q299 minimax isotonic fit matches the sequential PAV sweep") {
    val rows = SparkEntry.queries("q299_isotonic_fit")(spark, sf0001)
      .collect()
    // exact census straight from the corpus (not the rounded output)
    val census = Tables.documents(spark, sf0001).select("text").collect()
      .map(_.getString(0)).map { text =>
        val toks = text.split(" ", -1)
        (math.min(toks.length / 10, 19).toLong,
          if (toks.contains("the")) 1L else 0L)
      }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (bin, ds) => (bin, ds.length.toLong, ds.map(_._2).sum) }
    // sequential pool-adjacent-violators over the bins
    var blocks = List.empty[(Long, Long, Int)] // (n, sum, nbins) newest 1st
    census.foreach { case (_, nb, sb) =>
      var b = (nb, sb, 1)
      while (blocks.nonEmpty && blocks.head._2.toDouble * b._1 >
        b._2.toDouble * blocks.head._1) { // head avg > new avg: pool
        b = (blocks.head._1 + b._1, blocks.head._2 + b._2,
          blocks.head._3 + b._3)
        blocks = blocks.tail
      }
      blocks = b :: blocks
    }
    val fit = blocks.reverse.flatMap { case (w, s, nbins) =>
      Seq.fill(nbins)(s.toDouble / w)
    }
    assert(rows.length === census.length)
    rows.zip(fit).foreach { case (r, exp) =>
      assert(math.abs(r.getAs[Double]("iso_rate") - exp) < 2e-6,
        s"bin ${r.getAs[Long]("bin")}: ${r.getAs[Double]("iso_rate")} " +
          s"vs PAV $exp")
    }
  }

  test("q300 Kneser-Ney matches a sequential count walk") {
    val rows = SparkEntry.queries("q300_kneser_ney")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    val docs = Tables.documents(spark, sf0001)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).foreach { case (lang, ds) =>
      val bigrams = ds.flatMap { case (_, text) =>
        val t = text.split(" ", -1)
        if (t.length < 2) Array.empty[(String, String)]
        else t.sliding(2).map(p => (p(0), p(1))).toArray
      }
      if (bigrams.nonEmpty) {
        val c12 = bigrams.groupBy(identity).map { case (k, v) =>
          k -> v.length.toLong }
        val c1 = c12.groupBy(_._1._1).map { case (w, m) =>
          w -> m.values.sum }
        val n1fw = c12.groupBy(_._1._1).map { case (w, m) => w -> m.size }
        val n1bw = c12.groupBy(_._1._2).map { case (w, m) => w -> m.size }
        val tt = c12.size.toDouble
        val nn = c12.values.sum.toDouble
        val k1 = c12.values.count(_ == 1L).toDouble
        val k2 = c12.values.count(_ == 2L).toDouble
        val dd = if (k1 + 2 * k2 > 0) k1 / (k1 + 2 * k2) else 0.5
        val hSum = c12.map { case ((w1, w2), c) =>
          val p = math.max(c - dd, 0.0) / c1(w1) +
            dd * n1fw(w1) / c1(w1) * (n1bw(w2) / tt)
          c * (math.log(p) / math.log(2.0))
        }.sum
        val h = -hSum / nn
        val r = rows(lang)
        assert(r.getAs[Long]("n_bigrams") === nn.toLong, s"$lang N")
        assert(r.getAs[Long]("bigram_types") === tt.toLong, s"$lang T")
        assert(math.abs(r.getAs[Double]("discount") - dd) < 1e-5,
          s"$lang D")
        assert(math.abs(r.getAs[Double]("h_bits") - h) < 1e-4,
          s"$lang H ${r.getAs[Double]("h_bits")} vs brute $h")
      }
    }
  }

  test("q301 ICC matches a sequential two-way ANOVA walk") {
    val row = SparkEntry.queries("q301_icc")(spark, sf0001).head()
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "on")
    val items = Tables.documents(spark, sf0001)
      .select(col("n_chars"), col("text")).collect().map { r =>
        val nc = r.getLong(0); val text = r.getString(1)
        val toks = text.split(" ", -1)
        Array(math.min(nc / 100, 10L).toDouble,
          math.min(math.floor(toks.length / 20.0).toLong, 10L).toDouble,
          math.min(toks.count(stop.contains) / 5L, 10L).toDouble,
          math.min(text.count(_ == '.') / 2L, 10L).toDouble)
      }
    val n = items.length.toDouble; val k = 4.0
    val g = items.map(_.sum).sum
    val cm = g * g / (n * k)
    val ssr = items.map(r => math.pow(r.sum, 2)).sum / k - cm
    val ssc = (0 until 4).map(j =>
      math.pow(items.map(_(j)).sum, 2)).sum / n - cm
    val sst = items.map(_.map(x => x * x).sum).sum - cm
    val sse = sst - ssr - ssc
    val msr = ssr / (n - 1); val msc = ssc / (k - 1)
    val mse = sse / ((n - 1) * (k - 1))
    def ck(name: String, exp: Double): Unit =
      assert(math.abs(row.getAs[Double](name) - exp) <
        1e-4 * math.max(1.0, math.abs(exp)), s"$name vs brute $exp")
    ck("ms_rows", msr); ck("ms_cols", msc); ck("ms_err", mse)
    ck("icc_2_1", (msr - mse) / (msr + (k - 1) * mse +
      k * (msc - mse) / n))
    ck("icc_2_k", (msr - mse) / (msr + (msc - mse) / n))
    ck("icc_3_1", (msr - mse) / (msr + (k - 1) * mse))
    ck("icc_3_k", (msr - mse) / msr)
  }

  test("q302 Dickey-Fuller matches a sequential lag-pair regression") {
    val row = SparkEntry.queries("q302_dickey_fuller")(spark, sf0001)
      .head()
    val days = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day").collect().map(_.getLong(1))
    val pairs = days.sliding(2).map(p => (p(0).toDouble,
      (p(1) - p(0)).toDouble)).toArray
    val m = pairs.length.toDouble
    val sx = pairs.map(_._1).sum; val sz = pairs.map(_._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val sxz = pairs.map(p => p._1 * p._2).sum
    val szz = pairs.map(p => p._2 * p._2).sum
    val den = m * sxx - sx * sx
    val rho = (m * sxz - sx * sz) / den
    val alpha = (sz - rho * sx) / m
    val sse = szz - alpha * sz - rho * sxz
    val t = rho / math.sqrt(sse / (m - 2.0) * m / den)
    assert(row.getAs[Long]("m_pairs") === pairs.length.toLong)
    assert(math.abs(row.getAs[Double]("rho_hat") - rho) < 1e-5)
    assert(math.abs(row.getAs[Double]("df_t") - t) < 1e-3,
      s"df_t ${row.getAs[Double]("df_t")} vs brute $t")
  }

  test("q303 Yuen trimmed t matches a sequential sort-and-trim walk") {
    val row = SparkEntry.queries("q303_yuen_trimmed")(spark, sf0001)
      .head()
    val vals = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "FURNITURE"))
      .select(col("c_mktsegment"), floor(col("o_totalprice") + 0.5)
        .cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def side(seg: String): (Long, Long, Double, Double, Double) = {
      val xs = vals.filter(_._1 == seg).map(_._2).sorted
      val n = xs.length; val g = n / 5; val h = n - 2 * g
      val trimmed = xs.slice(g, n - g)
      val tmean = trimmed.map(_.toDouble).sum / h
      val wins = xs.map(x => math.min(math.max(x, xs(g)), xs(n - g - 1)))
        .map(_.toDouble)
      val wm = wins.sum / n
      val s2w = wins.map(x => (x - wm) * (x - wm)).sum / (n - 1)
      val d = (n - 1).toDouble * s2w / (h.toDouble * (h - 1))
      (n.toLong, g.toLong, tmean, d, h.toDouble)
    }
    val (na, ga, mta, da, ha) = side("BUILDING")
    val (nb, gb, mtb, db, hb) = side("FURNITURE")
    val t = (mta - mtb) / math.sqrt(da + db)
    val df = (da + db) * (da + db) /
      (da * da / (ha - 1) + db * db / (hb - 1))
    assert(row.getAs[Long]("n_building") === na)
    assert(row.getAs[Long]("g_building") === ga)
    assert(row.getAs[Long]("n_furniture") === nb)
    assert(math.abs(row.getAs[Double]("tmean_building") - mta) < 1e-3)
    assert(math.abs(row.getAs[Double]("tmean_furniture") - mtb) < 1e-3)
    assert(math.abs(row.getAs[Double]("yuen_t") - t) < 1e-3,
      s"yuen_t ${row.getAs[Double]("yuen_t")} vs brute $t")
    assert(math.abs(row.getAs[Double]("yuen_df") - df) < 0.02)
  }

  test("q306 Breusch-Pagan matches a sequential two-stage OLS walk") {
    val row = SparkEntry.queries("q306_breusch_pagan")(spark, sf0001)
      .head()
    val per = Tables.lineitem(spark, sf0001)
      .groupBy("l_orderkey")
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
        .as("y"),
        sum(expr("cast(round(l_quantity) as bigint)")).as("x1"),
        count(lit(1)).as("x2"))
      .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble,
        r.getLong(3).toDouble))
    def ols(rows: Array[(Double, Double, Double)])
        : (Double, Double, Double, Double) = {
      val n = rows.length.toDouble
      val s1 = rows.map(_._2).sum; val s2 = rows.map(_._3).sum
      val sy = rows.map(_._1).sum
      val s11 = rows.map(r => r._2 * r._2).sum
      val s22 = rows.map(r => r._3 * r._3).sum
      val s12 = rows.map(r => r._2 * r._3).sum
      val s1y = rows.map(r => r._2 * r._1).sum
      val s2y = rows.map(r => r._3 * r._1).sum
      def det3(a: Array[Double]) =
        a(0) * (a(4) * a(8) - a(5) * a(7)) -
          a(1) * (a(3) * a(8) - a(5) * a(6)) +
          a(2) * (a(3) * a(7) - a(4) * a(6))
      val d = det3(Array(n, s1, s2, s1, s11, s12, s2, s12, s22))
      val b0 = det3(Array(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)) / d
      val b1 = det3(Array(n, sy, s2, s1, s1y, s12, s2, s2y, s22)) / d
      val b2 = det3(Array(n, s1, sy, s1, s11, s1y, s2, s12, s2y)) / d
      val syy = rows.map(r => r._1 * r._1).sum
      val sse = syy - b0 * sy - b1 * s1y - b2 * s2y
      (b0, b1, b2, 1.0 - sse / (syy - sy * sy / n))
    }
    val (b0, b1, b2, _) = ols(per)
    // cent-quantized residuals, exactly as the query
    val aux = per.map { case (y, x1, x2) =>
      val e = math.floor(y - b0 - b1 * x1 - b2 * x2 + 0.5)
      (e * e, x1, x2)
    }
    val (_, _, _, r2aux) = ols(aux)
    val lm = per.length * r2aux
    assert(row.getAs[Long]("n_orders") === per.length.toLong)
    assert(math.abs(row.getAs[Double]("bp_lm") - lm) <
      1e-4 * math.max(1.0, lm),
      s"LM ${row.getAs[Double]("bp_lm")} vs brute $lm")
  }

  test("q307 PPS systematic sample matches a sequential threshold walk") {
    val rows = SparkEntry.queries("q307_pps_systematic")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r).toMap
    val sup = Tables.lineitem(spark, sf0001)
      .groupBy("l_suppkey")
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
        .as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val t = sup.map(_._2).sum
    val k = 200
    var cum = 0L
    var slot = 0
    sup.foreach { case (key, w) =>
      val lo = cum; cum += w
      // thresholds (2i+1)·T/(2k) inside (lo, cum]
      var hits = 0L; var first = -1L
      while (slot < k && BigInt(2 * slot + 1) * t <= BigInt(2 * k) * cum) {
        if (first < 0) first = slot
        hits += 1; slot += 1
      }
      if (hits > 0) {
        val r = rows(key)
        assert(r.getAs[Long]("n_hits") === hits, s"supplier $key hits")
        assert(r.getAs[Long]("first_slot") === first, s"supplier $key slot")
      } else assert(!rows.contains(key), s"supplier $key sampled")
      require(lo <= cum)
    }
    assert(rows.values.map(_.getAs[Long]("n_hits")).sum === k.toLong)
  }

  test("q309 Chow test matches a sequential two-regime OLS walk") {
    val row = SparkEntry.queries("q309_chow_break")(spark, sf0001)
      .head()
    val days = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day").collect().map(_.getLong(1).toDouble)
    val n = days.length
    def sse(seg: Seq[(Double, Double)]): Double = {
      val m = seg.length.toDouble
      val st = seg.map(_._1).sum; val sr = seg.map(_._2).sum
      val stt = seg.map(p => p._1 * p._1).sum
      val str = seg.map(p => p._1 * p._2).sum
      val srr = seg.map(p => p._2 * p._2).sum
      val b = (m * str - st * sr) / (m * stt - st * st)
      srr - (sr - b * st) / m * sr - b * str
    }
    val pts = days.zipWithIndex.map { case (r, t) => (t.toDouble, r) }
    val (g1, g2) = pts.partition(p => p._1 * 2 < n)
    val s12 = sse(g1.toSeq) + sse(g2.toSeq)
    val f = ((sse(pts.toSeq) - s12) / 2.0) / (s12 / (n - 4.0))
    assert(row.getAs[Long]("n_days") === n.toLong)
    assert(row.getAs[Long]("m_regime1") === g1.length.toLong)
    assert(math.abs(row.getAs[Double]("chow_f") - f) < 1e-3,
      s"F ${row.getAs[Double]("chow_f")} vs brute $f")
  }

  test("q310 Gwet AC1 matches a sequential agreement walk") {
    val row = SparkEntry.queries("q310_gwet_ac1")(spark, sf0001).head()
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "on")
    val gs = Tables.documents(spark, sf0001)
      .select(col("n_chars"), col("text")).collect().map { r =>
        val toks = r.getString(1).split(" ", -1)
        (if (r.getLong(0) >= 100) 1 else 0) +
          (if (toks.length >= 20) 1 else 0) +
          (if (toks.exists(stop.contains)) 1 else 0)
      }
    val n = gs.length.toDouble
    val pa = gs.map(g => g * (g - 1) / 2 + (3 - g) * (2 - g) / 2).sum /
      (3.0 * n)
    val pi = gs.sum / (3.0 * n)
    val pe = 2.0 * pi * (1.0 - pi)
    val ac1 = (pa - pe) / (1.0 - pe)
    assert(row.getAs[Long]("n_docs") === gs.length.toLong)
    assert(math.abs(row.getAs[Double]("p_agree") - pa) < 1e-5)
    assert(math.abs(row.getAs[Double]("gwet_ac1") - ac1) < 1e-5,
      s"AC1 ${row.getAs[Double]("gwet_ac1")} vs brute $ac1")
  }

  test("q311 HC1 sandwich matches a sequential matrix walk") {
    val row = SparkEntry.queries("q311_white_hc1")(spark, sf0001)
      .head()
    val per = Tables.lineitem(spark, sf0001)
      .groupBy("l_orderkey")
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
        .as("y"),
        sum(expr("cast(round(l_quantity) as bigint)")).as("x1"),
        count(lit(1)).as("x2"))
      .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble,
        r.getLong(3).toDouble))
    val n = per.length.toDouble
    val s1 = per.map(_._2).sum; val s2 = per.map(_._3).sum
    val sy = per.map(_._1).sum
    val s11 = per.map(p => p._2 * p._2).sum
    val s22 = per.map(p => p._3 * p._3).sum
    val s12 = per.map(p => p._2 * p._3).sum
    val s1y = per.map(p => p._2 * p._1).sum
    val s2y = per.map(p => p._3 * p._1).sum
    val c00 = s11 * s22 - s12 * s12; val c01 = -(s1 * s22 - s12 * s2)
    val c02 = s1 * s12 - s11 * s2; val c11 = n * s22 - s2 * s2
    val c12 = -(n * s12 - s1 * s2); val c22 = n * s11 - s1 * s1
    val det = n * c00 + s1 * c01 + s2 * c02
    val b0 = (c00 * sy + c01 * s1y + c02 * s2y) / det
    val b1 = (c01 * sy + c11 * s1y + c12 * s2y) / det
    val b2 = (c02 * sy + c12 * s1y + c22 * s2y) / det
    val es = per.map { case (y, x1, x2) =>
      (math.floor(y - b0 - b1 * x1 - b2 * x2 + 0.5), x1, x2) }
    def mm(fx: ((Double, Double, Double)) => Double) =
      es.map { case (e, x1, x2) => e * e * fx((e, x1, x2)) }.sum
    val (m00, m01, m02) = (mm(_ => 1.0), mm(_._2), mm(_._3))
    val (m11, m12, m22) = (mm(p => p._2 * p._2), mm(p => p._2 * p._3),
      mm(p => p._3 * p._3))
    def vjj(cj0: Double, cj1: Double, cj2: Double) =
      (cj0 * cj0 * m00 + cj1 * cj1 * m11 + cj2 * cj2 * m22 +
        2 * cj0 * cj1 * m01 + 2 * cj0 * cj2 * m02 +
        2 * cj1 * cj2 * m12) / (det * det) * (n / (n - 3.0))
    val seR1 = math.sqrt(vjj(c01, c11, c12))
    val seR2 = math.sqrt(vjj(c02, c12, c22))
    def ck(nm: String, exp: Double): Unit =
      assert(math.abs(row.getAs[Double](nm) - exp) <
        1e-3 * math.max(1.0, math.abs(exp)), s"$nm vs brute $exp")
    ck("se_hc1_units", seR1); ck("se_hc1_lines", seR2)
    ck("t_hc1_units", b1 / seR1); ck("t_hc1_lines", b2 / seR2)
  }

  test("q312 Cook's distance matches a sequential hat-matrix walk") {
    val rows = SparkEntry.queries("q312_cooks_distance")(spark, sf0001)
      .collect()
    val per = Tables.lineitem(spark, sf0001)
      .groupBy("l_orderkey")
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
        .as("y"),
        sum(expr("cast(round(l_quantity) as bigint)")).as("x1"),
        count(lit(1)).as("x2"))
      .collect().map(r => (r.getLong(0), r.getLong(1).toDouble,
        r.getLong(2).toDouble, r.getLong(3).toDouble))
    val n = per.length.toDouble
    val s1 = per.map(_._3).sum; val s2 = per.map(_._4).sum
    val sy = per.map(_._2).sum
    val s11 = per.map(p => p._3 * p._3).sum
    val s22 = per.map(p => p._4 * p._4).sum
    val s12 = per.map(p => p._3 * p._4).sum
    val s1y = per.map(p => p._3 * p._2).sum
    val s2y = per.map(p => p._4 * p._2).sum
    val syy = per.map(p => p._2 * p._2).sum
    val c00 = s11 * s22 - s12 * s12; val c01 = -(s1 * s22 - s12 * s2)
    val c02 = s1 * s12 - s11 * s2; val c11 = n * s22 - s2 * s2
    val c12 = -(n * s12 - s1 * s2); val c22 = n * s11 - s1 * s1
    val det = n * c00 + s1 * c01 + s2 * c02
    val b0 = (c00 * sy + c01 * s1y + c02 * s2y) / det
    val b1 = (c01 * sy + c11 * s1y + c12 * s2y) / det
    val b2 = (c02 * sy + c12 * s1y + c22 * s2y) / det
    val sse = syy - b0 * sy - b1 * s1y - b2 * s2y
    val s2hat = sse / (n - 3.0)
    val all = per.map { case (k, y, x1, x2) =>
      val e = math.floor(y - b0 - b1 * x1 - b2 * x2 + 0.5)
      val h = (c00 + 2 * c01 * x1 + 2 * c02 * x2 + c11 * x1 * x1 +
        2 * c12 * x1 * x2 + c22 * x2 * x2) / det
      (k, e, h, e * e * h / (3.0 * s2hat * (1 - h) * (1 - h)))
    }
    val top = all.sortBy(t => (-t._4, t._1)).take(20)
    assert(rows.length === 20)
    rows.zip(top).foreach { case (r, (k, e, h, d)) =>
      assert(r.getLong(0) === k, s"rank order: ${r.getLong(0)} vs $k")
      assert(r.getAs[Long]("resid_cents") === e.toLong)
      assert(math.abs(r.getAs[Double]("leverage") - h) < 1e-5)
      assert(math.abs(r.getAs[Double]("cooks_d") - d) < 1e-5)
    }
  }

  test("q313 DSIR weights match a sequential word-ratio walk") {
    val rows = SparkEntry.queries("q313_dsir_weights")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r).toMap
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val tokens = docs.flatMap { case (id, lang, text) =>
      text.split(" ", -1).map(w => (id, lang, w)) }
    val ws = tokens.groupBy(_._3).map { case (w, ts) =>
      w -> (ts.count(_._2 == "en").toLong, ts.length.toLong) }
    val tt = ws.values.map(_._1).sum; val tr = ws.values.map(_._2).sum
    val v = ws.size.toLong
    def q9(x: Long): Long = math.floor(math.log(x.toDouble) * 1e9 + 0.5)
      .toLong
    val d9 = ws.map { case (w, (ct, cr)) =>
      w -> (q9(ct + 1) - q9(tt + v) - q9(cr + 1) + q9(tr + v)) }
    tokens.groupBy(_._1).foreach { case (id, ts) =>
      val w9 = ts.groupBy(_._3).map { case (w, g) =>
        g.length.toLong * d9(w) }.sum
      val r = rows(id)
      assert(r.getAs[Long]("n_tokens") === ts.length.toLong)
      assert(math.abs(r.getAs[Double]("dsir_logw") - w9 / 1e9) < 2e-6,
        s"doc $id: ${r.getAs[Double]("dsir_logw")} vs ${w9 / 1e9}")
      assert(r.getAs[Long]("target_like") === (if (w9 > 0) 1L else 0L))
    }
  }

  test("q314 SPRT walk matches a sequential daily LLR accumulation") {
    val rows = SparkEntry.queries("q314_sprt_monitor")(spark, sf0001)
      .collect()
    val ev = Tables.events(spark, sf0001)
      .filter(col("user_id").isNotNull)
      .select(pmod(col("user_id"), lit(2L)).as("arm"),
        to_date(col("ts")).as("day"),
        (col("event_type") === "purchase").as("conv"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getBoolean(2)))
    val ctrl = ev.filter(_._1 == 0L)
    val c0 = ctrl.count(_._3).toLong; val n0 = ctrl.length.toLong
    def q9(x: Double): Long = math.floor(math.log(x) * 1e9 + 0.5).toLong
    val lp9 = q9(11.0) - q9(10.0)
    val lq9 = q9((n0 * 10 - c0 * 11).toDouble) - q9(((n0 - c0) * 10)
      .toDouble)
    val daily = ev.filter(_._1 == 1L).groupBy(_._2).map { case (d, g) =>
      (d, g.count(_._3).toLong, g.length.toLong) }.toSeq.sortBy(_._1)
    var ct = 0L; var nt = 0L
    val a9 = q9(19.0)
    rows.zip(daily).foreach { case (r, (d, cd, nd)) =>
      ct += cd; nt += nd
      assert(r.getDate(0).toString === d)
      assert(r.getAs[Long]("cum_conv") === ct)
      assert(r.getAs[Long]("cum_trials") === nt)
      val llr9 = ct * lp9 + (nt - ct) * lq9
      assert(math.abs(r.getAs[Double]("llr") - llr9 / 1e9) < 2e-6,
        s"day $d: ${r.getAs[Double]("llr")} vs ${llr9 / 1e9}")
      val state = if (llr9 >= a9) "reject_h0"
        else if (llr9 <= -a9) "accept_h0" else "continue"
      assert(r.getAs[String]("state") === state, s"day $d state")
    }
  }

  test("q315 Mahalanobis matches a sequential adjugate walk") {
    val rows = SparkEntry.queries("q315_mahalanobis")(spark, sf0001)
      .collect()
    val per = Tables.lineitem(spark, sf0001)
      .groupBy("l_orderkey")
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
        .as("y"),
        sum(expr("cast(round(l_quantity) as bigint)")).as("x1"),
        count(lit(1)).as("x2"))
      .collect().map(r => (r.getLong(0), r.getLong(1).toDouble,
        r.getLong(2).toDouble, r.getLong(3).toDouble))
    val n = per.length.toDouble
    val sy = per.map(_._2).sum; val s1 = per.map(_._3).sum
    val s2 = per.map(_._4).sum
    val v00 = n * per.map(p => p._2 * p._2).sum - sy * sy
    val v01 = n * per.map(p => p._2 * p._3).sum - sy * s1
    val v02 = n * per.map(p => p._2 * p._4).sum - sy * s2
    val v11 = n * per.map(p => p._3 * p._3).sum - s1 * s1
    val v12 = n * per.map(p => p._3 * p._4).sum - s1 * s2
    val v22 = n * per.map(p => p._4 * p._4).sum - s2 * s2
    val a00 = v11 * v22 - v12 * v12; val a01 = -(v01 * v22 - v12 * v02)
    val a02 = v01 * v12 - v11 * v02; val a11 = v00 * v22 - v02 * v02
    val a12 = -(v00 * v12 - v01 * v02); val a22 = v00 * v11 - v01 * v01
    val det = v00 * a00 + v01 * a01 + v02 * a02
    val all = per.map { case (k, y, x1, x2) =>
      val (u0, u1, u2) = (n * y - sy, n * x1 - s1, n * x2 - s2)
      val d2 = (u0 * u0 * a00 + u1 * u1 * a11 + u2 * u2 * a22 +
        2 * u0 * u1 * a01 + 2 * u0 * u2 * a02 + 2 * u1 * u2 * a12) / det
      (k, d2)
    }
    val top = all.sortBy(t => (-t._2, t._1)).take(20)
    assert(rows.length === 20)
    rows.zip(top).foreach { case (r, (k, d2)) =>
      assert(r.getLong(0) === k, s"rank: ${r.getLong(0)} vs $k")
      assert(math.abs(r.getAs[Double]("mahal_d2") - d2) < 1e-3,
        s"order $k: ${r.getAs[Double]("mahal_d2")} vs $d2")
    }
  }

  test("q316 conformal quantiles match a sequential sort walk") {
    val rows = SparkEntry.queries("q316_conformal")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r).toMap
    val per = Tables.lineitem(spark, sf0001)
      .groupBy("l_orderkey")
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
        .as("y"),
        sum(expr("cast(round(l_quantity) as bigint)")).as("x1"),
        count(lit(1)).as("x2"))
      .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble,
        r.getLong(3).toDouble))
    val n = per.length.toDouble
    val s1 = per.map(_._2).sum; val s2 = per.map(_._3).sum
    val sy = per.map(_._1).sum
    val s11 = per.map(p => p._2 * p._2).sum
    val s22 = per.map(p => p._3 * p._3).sum
    val s12 = per.map(p => p._2 * p._3).sum
    val s1y = per.map(p => p._2 * p._1).sum
    val s2y = per.map(p => p._3 * p._1).sum
    val c00 = s11 * s22 - s12 * s12; val c01 = -(s1 * s22 - s12 * s2)
    val c02 = s1 * s12 - s11 * s2; val c11 = n * s22 - s2 * s2
    val c12 = -(n * s12 - s1 * s2); val c22 = n * s11 - s1 * s1
    val det = n * c00 + s1 * c01 + s2 * c02
    val b0 = (c00 * sy + c01 * s1y + c02 * s2y) / det
    val b1 = (c01 * sy + c11 * s1y + c12 * s2y) / det
    val b2 = (c02 * sy + c12 * s1y + c22 * s2y) / det
    val ae = per.map { case (y, x1, x2) =>
      math.abs(math.floor(y - b0 - b1 * x1 - b2 * x2 + 0.5).toLong)
    }.sorted
    Seq(1000L, 500L, 100L).foreach { bps =>
      val k = ((ae.length + 1) * (10000 - bps) + 9999) / 10000
      val qhat = ae(k.toInt - 1)
      val covCnt = ae.count(_ <= qhat).toLong
      val r = rows(bps)
      assert(r.getAs[Long]("k_rank") === k, s"bps $bps k")
      assert(r.getAs[Long]("q_hat_cents") === qhat, s"bps $bps qhat")
      assert(math.abs(r.getAs[Double]("coverage") -
        covCnt * 1000000L / ae.length / 1e6) < 2e-6, s"bps $bps cov")
    }
  }

  test("q317 dispersion index matches a sequential moment walk") {
    val rows = SparkEntry.queries("q317_dispersion")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    val days = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderpriority"),
        to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    days.groupBy(_._1).foreach { case (p, ds) =>
      val n = ds.length.toDouble
      val cs = ds.map(_._2.toDouble)
      val disp = (n * cs.map(c => c * c).sum - math.pow(cs.sum, 2)) /
        cs.sum
      val z = (disp - (n - 1)) / math.sqrt(2 * (n - 1))
      val r = rows(p)
      assert(r.getAs[Long]("n_days") === ds.length.toLong)
      assert(math.abs(r.getAs[Double]("dispersion") - disp) < 1e-3)
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-3, s"$p z")
    }
  }

  test("q318 Newcombe CI matches a sequential Wilson walk") {
    val row = SparkEntry.queries("q318_newcombe_ci")(spark, sf0001)
      .head()
    val ev = Tables.events(spark, sf0001)
      .filter(col("user_id").isNotNull)
      .select(pmod(col("user_id"), lit(2L)).as("arm"),
        (col("event_type") === "purchase").as("conv"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    def wilson(c: Long, n: Long): (Double, Double, Double) = {
      val z = 1.96; val nf = n.toDouble; val p = c.toDouble / nf
      val z2 = z * z
      val ce = (p + z2 / (2 * nf)) / (1 + z2 / nf)
      val hw = z * math.sqrt(p * (1 - p) / nf + z2 / (4 * nf * nf)) /
        (1 + z2 / nf)
      (p, ce - hw, ce + hw)
    }
    val a0 = ev.filter(_._1 == 0L); val a1 = ev.filter(_._1 == 1L)
    val (p0, l0, u0) = wilson(a0.count(_._2), a0.length)
    val (p1, l1, u1) = wilson(a1.count(_._2), a1.length)
    val d = p1 - p0
    val lo = d - math.sqrt(math.pow(p1 - l1, 2) + math.pow(u0 - p0, 2))
    val hi = d + math.sqrt(math.pow(u1 - p1, 2) + math.pow(p0 - l0, 2))
    assert(row.getAs[Long]("n_ctrl") === a0.length.toLong)
    assert(math.abs(row.getAs[Double]("rate_diff") - d) < 1e-5)
    assert(math.abs(row.getAs[Double]("ci_lo") - lo) < 1e-5)
    assert(math.abs(row.getAs[Double]("ci_hi") - hi) < 1e-5)
  }

  test("q319 fertility panel matches a sequential census walk") {
    val rows = SparkEntry.queries("q319_fertility")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    val docs = Tables.documents(spark, sf0001)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).foreach { case (lang, ds) =>
      val toks = ds.map(_._2.split(" ", -1).length.toLong).sum
      val chars = ds.map(_._2.length.toLong).sum
      val bytes = ds.map(_._2.getBytes("UTF-8").length.toLong).sum
      val types = ds.flatMap(_._2.split(" ", -1)).distinct.length.toLong
      def hu4(num: Long, den: Long): Double =
        ((num * 20000L + den) / (den * 2L)).toDouble / 1e4
      val r = rows(lang)
      assert(r.getAs[Long]("n_tokens") === toks, s"$lang tokens")
      assert(r.getAs[Long]("n_types") === types, s"$lang types")
      assert(r.getAs[Double]("chars_per_token") === hu4(chars, toks))
      assert(r.getAs[Double]("bytes_per_token") === hu4(bytes, toks))
      assert(r.getAs[Double]("tokens_per_doc") ===
        hu4(toks, ds.length.toLong))
      assert(r.getAs[Double]("type_token_ratio") === hu4(types, toks))
    }
  }

  test("q308 water-filling matches a sequential level search") {
    val rows = SparkEntry.queries("q308_water_fill")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    val caps = Tables.documents(spark, sf0001)
      .select(col("lang"), size(split(col("text"), " ")).cast("long")
        .as("tk"))
      .groupBy("lang").agg(sum("tk").as("cap"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(c => (c._2, c._1))
    val total = caps.map(_._2).sum
    val b = total * 9 / 10
    val s0 = caps.length
    // sequential water-level search
    var m = 0; var pm = 0L
    var pc = 0L
    caps.zipWithIndex.foreach { case ((_, c), i) =>
      pc += c
      if (c * (s0 - i - 1) <= b - pc) { m = i + 1; pm = pc }
    }
    val base = (b - pm) / (s0 - m); val r = (b - pm) % (s0 - m)
    var allocSum = 0L
    caps.zipWithIndex.foreach { case ((lang, c), i) =>
      val exp = if (i < m) c
        else base + (if (i - m < r) 1L else 0L)
      val row = rows(lang)
      assert(row.getAs[Long]("alloc_tokens") === exp, s"$lang alloc")
      assert(row.getAs[Long]("capped") === (if (i < m) 1L else 0L))
      allocSum += exp
    }
    assert(allocSum === b, "allocation does not exhaust the budget")
  }

  test("q304 Burrows Delta matches a sequential z-profile walk") {
    val rows = SparkEntry.queries("q304_burrows_delta")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val docs = Tables.documents(spark, sf0001)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cnt = docs.flatMap { case (src, text) =>
      text.split(" ", -1).map(w => (src, w)) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val stot = cnt.groupBy(_._1._1).map { case (s0, m) =>
      s0 -> m.values.sum }
    val sources = stot.keys.toSeq.sorted
    val top = cnt.groupBy(_._1._2).map { case (w, m) =>
      w -> m.values.sum }.toSeq
      .sortBy { case (w, c) => (-c, w) }.take(30).map(_._1)
    val fq = (for (s0 <- sources; w <- top) yield (s0, w) ->
      math.floor(cnt.getOrElse((s0, w), 0L).toDouble * 1e12 /
        stot(s0).toDouble).toLong).toMap
    val ns = sources.length.toDouble
    val sigma = top.map { w =>
      val xs = sources.map(s0 => BigInt(fq((s0, w))))
      val sf = xs.sum; val sff = xs.map(x => x * x).sum
      w -> math.sqrt((BigInt(sources.length) * sff - sf * sf).toDouble) /
        ns
    }.toMap
    for (i <- sources.indices; j <- (i + 1) until sources.length) {
      val exp = top.map { w =>
        if (sigma(w) > 0)
          math.abs(fq((sources(i), w)) - fq((sources(j), w))) / sigma(w)
        else 0.0
      }.sum / top.count(w => sigma(w) > 0)
      val r = rows((sources(i), sources(j)))
      assert(math.abs(r.getAs[Double]("delta") - exp) < 1e-4,
        s"${sources(i)}/${sources(j)}: ${r.getAs[Double]("delta")} " +
          s"vs brute $exp")
    }
  }
  // ---- round 14 batch A: econometric screens on the daily census ----

  private def dailySeries(): (Array[Long], Array[Long]) = {
    val rows = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"),
        count(lit(1)).as("cnt"))
      .orderBy("day").collect()
    (rows.map(_.getLong(1)), rows.map(_.getLong(2)))
  }

  test("q321 Granger F matches a sequential OLS walk") {
    val row = SparkEntry.queries("q321_granger")(spark, sf0001).head()
    val (rev, cnt) = dailySeries()
    val n = rev.length - 1
    // OLS of y on (1, p, q) via normal equations, brute doubles
    def ols(y: Array[Double], p: Array[Double], q: Array[Double])
        : Double = {
      val nn = y.length.toDouble
      val (sp, sq, sy) = (p.sum, q.sum, y.sum)
      val spp = p.map(x => x * x).sum
      val sqq = q.map(x => x * x).sum
      val spq = p.zip(q).map { case (a, b) => a * b }.sum
      val syp = y.zip(p).map { case (a, b) => a * b }.sum
      val syq = y.zip(q).map { case (a, b) => a * b }.sum
      val syy = y.map(x => x * x).sum
      val c00 = spp * sqq - spq * spq
      val c01 = -(sp * sqq - spq * sq)
      val c02 = sp * spq - spp * sq
      val c11 = nn * sqq - sq * sq
      val c12 = -(nn * spq - sp * sq)
      val c22 = nn * spp - sp * sp
      val det = nn * c00 + sp * c01 + sq * c02
      val b0 = (c00 * sy + c01 * syp + c02 * syq) / det
      val b1 = (c01 * sy + c11 * syp + c12 * syq) / det
      val b2 = (c02 * sy + c12 * syp + c22 * syq) / det
      syy - (b0 * sy + b1 * syp + b2 * syq)
    }
    def simple(y: Array[Double], x: Array[Double]): Double = {
      val nn = y.length.toDouble
      val (sx, sy) = (x.sum, y.sum)
      val sxx = x.map(v => v * v).sum
      val sxy = x.zip(y).map { case (a, b) => a * b }.sum
      val syy = y.map(v => v * v).sum
      val b = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
      val a = (sy - b * sx) / nn
      syy - a * sy - b * sxy
    }
    val a = rev.drop(1).map(_.toDouble)
    val b = cnt.drop(1).map(_.toDouble)
    val p = rev.dropRight(1).map(_.toDouble)
    val q = cnt.dropRight(1).map(_.toDouble)
    val u1 = ols(a, p, q); val r1 = simple(a, p)
    val f1 = (r1 - u1) / (u1 / (n - 3.0))
    val u2 = ols(b, p, q); val r2 = simple(b, q)
    val f2 = (r2 - u2) / (u2 / (n - 3.0))
    assert(row.getAs[Long]("n_eff") === n.toLong)
    assert(math.abs(row.getAs[Double]("f_cnt_to_rev") - f1) < 1e-3,
      s"${row.getAs[Double]("f_cnt_to_rev")} vs brute $f1")
    assert(math.abs(row.getAs[Double]("f_rev_to_cnt") - f2) < 1e-3,
      s"${row.getAs[Double]("f_rev_to_cnt")} vs brute $f2")
  }

  private def hacWalk(d: Array[Long]): (Double, Double, Double) = {
    val n = d.length
    val mean = d.map(BigInt(_)).sum.toDouble / n
    def gamma(l: Int): Double =
      (0 until n - l).map(t =>
        (d(t + l) - mean) * (d(t) - mean)).sum / n
    val g0 = gamma(0)
    val tail = (1 to 7).map(l => 2.0 * (1.0 - l / 8.0) * gamma(l)).sum
    (mean, g0, g0 + tail)
  }

  test("q322 Newey-West HAC matches a sequential autocovariance walk") {
    val row = SparkEntry.queries("q322_newey_west")(spark, sf0001).head()
    val (rev, _) = dailySeries()
    val (mean, g0, lrv) = hacWalk(rev)
    assert(row.getAs[Long]("n_days") === rev.length.toLong)
    assert(math.abs(row.getAs[Double]("mean_rev") - mean) < 1e-2)
    assert(math.abs(row.getAs[Double]("gamma0") - g0) / g0 < 1e-6)
    assert(math.abs(row.getAs[Double]("long_run_var") - lrv) / lrv < 1e-4,
      s"${row.getAs[Double]("long_run_var")} vs brute $lrv")
    val tHac = mean / math.sqrt(lrv / rev.length)
    assert(math.abs(row.getAs[Double]("t_hac") - tHac) < 1e-2)
  }

  test("q324 Diebold-Mariano matches a sequential loss-differential walk") {
    val row = SparkEntry.queries("q324_diebold_mariano")(spark, sf0001)
      .head()
    val (rev, _) = dailySeries()
    val d = (7 until rev.length).map { t =>
      val e1 = rev(t) - rev(t - 1); val e7 = rev(t) - rev(t - 7)
      e1 * e1 - e7 * e7
    }.toArray
    val (mean, _, lrv) = hacWalk(d)
    assert(row.getAs[Long]("n_days") === d.length.toLong)
    val dm = mean / math.sqrt(lrv / d.length)
    assert(math.abs(row.getAs[Double]("dm_stat") - dm) < 1e-3,
      s"${row.getAs[Double]("dm_stat")} vs brute $dm")
  }

  test("q325 ARCH LM matches a sequential residual walk") {
    val row = SparkEntry.queries("q325_arch_lm")(spark, sf0001).head()
    val (rev, _) = dailySeries()
    val y = rev.drop(1).map(_.toDouble)
    val x = rev.dropRight(1).map(_.toDouble)
    val nn = y.length.toDouble
    val (sx, sy) = (x.sum, y.sum)
    val sxx = x.map(v => v * v).sum
    val sxy = x.zip(y).map { case (a, b) => a * b }.sum
    val b = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    val a = (sy - b * sx) / nn
    val u = y.zip(x).map { case (yy, xx) =>
      math.floor(yy - a - b * xx + 0.5) }.map(e => e * e)
    val uu = (2 until u.length).map(t => (u(t), u(t - 1), u(t - 2)))
    val (uy, up, uq) =
      (uu.map(_._1).toArray, uu.map(_._2).toArray, uu.map(_._3).toArray)
    val m = uy.length.toDouble
    val (sp1, sq1, su1) = (up.sum, uq.sum, uy.sum)
    val spp = up.map(v => v * v).sum
    val sqq = uq.map(v => v * v).sum
    val spq = up.zip(uq).map { case (p2, q2) => p2 * q2 }.sum
    val sup = uy.zip(up).map { case (p2, q2) => p2 * q2 }.sum
    val suq = uy.zip(uq).map { case (p2, q2) => p2 * q2 }.sum
    val suu = uy.map(v => v * v).sum
    val c00 = spp * sqq - spq * spq
    val c01 = -(sp1 * sqq - spq * sq1)
    val c02 = sp1 * spq - spp * sq1
    val c11 = m * sqq - sq1 * sq1
    val c12 = -(m * spq - sp1 * sq1)
    val c22 = m * spp - sp1 * sp1
    val det = m * c00 + sp1 * c01 + sq1 * c02
    val b0 = (c00 * su1 + c01 * sup + c02 * suq) / det
    val b1 = (c01 * su1 + c11 * sup + c12 * suq) / det
    val b2 = (c02 * su1 + c12 * sup + c22 * suq) / det
    val rss = suu - (b0 * su1 + b1 * sup + b2 * suq)
    val tss = suu - su1 * su1 / m
    val r2 = 1.0 - rss / tss
    assert(row.getAs[Long]("n_eff") === uy.length.toLong)
    assert(math.abs(row.getAs[Double]("arch_lm") - m * r2) < 1e-2,
      s"${row.getAs[Double]("arch_lm")} vs brute ${m * r2}")
  }

  test("q336 runs test matches a sequential run count") {
    val row = SparkEntry.queries("q336_runs_test")(spark, sf0001).head()
    val (rev, _) = dailySeries()
    val n = rev.length
    val total = rev.map(BigInt(_)).sum
    val up = rev.map(v => BigInt(v) * n > total)
    val n1 = up.count(identity)
    val n2 = n - n1
    var runs = 1
    (1 until n).foreach(i => if (up(i) != up(i - 1)) runs += 1)
    val (d1, d2) = (n1.toDouble, n2.toDouble)
    val er = 2.0 * d1 * d2 / (d1 + d2) + 1.0
    val vr = 2.0 * d1 * d2 * (2.0 * d1 * d2 - d1 - d2) /
      ((d1 + d2) * (d1 + d2) * (d1 + d2 - 1.0))
    assert(row.getAs[Long]("n_above") === n1.toLong)
    assert(row.getAs[Long]("n_runs") === runs.toLong)
    assert(math.abs(row.getAs[Double]("z") - (runs - er) / math.sqrt(vr))
      < 1e-5, s"z ${row.getAs[Double]("z")} vs brute")
  }

  test("q337 variance ratio matches a sequential overlapping-window walk") {
    val row = SparkEntry.queries("q337_variance_ratio")(spark, sf0001)
      .head()
    val (rev, _) = dailySeries()
    val q = 5
    val d = (1 until rev.length).map(i => (rev(i) - rev(i - 1)).toDouble)
    val n = d.length.toDouble
    val mu = d.sum / n
    val s1 = d.map(x => (x - mu) * (x - mu)).sum / (n - 1.0)
    val y = (q until rev.length).map(i => (rev(i) - rev(i - q)).toDouble)
    val mDen = q * (n - q + 1.0) * (1.0 - q / n)
    val sq = y.map(v => (v - q * mu) * (v - q * mu)).sum / mDen
    val vrat = sq / s1
    val z = (vrat - 1.0) /
      math.sqrt(2.0 * (2.0 * q - 1.0) * (q - 1.0) / (3.0 * q * n))
    assert(row.getAs[Long]("n_diffs") === d.length.toLong)
    assert(math.abs(row.getAs[Double]("vr") - vrat) < 1e-4,
      s"vr ${row.getAs[Double]("vr")} vs brute $vrat")
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-3)
    // the iid-levels sanity pin that caught the double-q bug: on a
    // stationary series VR(q) must sit near 1/q, nowhere near 1
    assert(vrat > 0.1 && vrat < 0.35, s"VR off the stationary band: $vrat")
  }

  test("q338 Hurst R/S matches a sequential block walk") {
    val row = SparkEntry.queries("q338_hurst_rs")(spark, sf0001).head()
    val (rev, _) = dailySeries()
    def meanRs(m: Int): Double = {
      val full = rev.length / m
      val rss = (0 until full).map { b =>
        val blk = rev.slice(b * m, b * m + m).map(_.toDouble)
        val mean = blk.sum / m
        var cum = 0.0
        val devs = blk.map { v => cum += v - mean; cum }
        val r = devs.max - devs.min
        val s = math.sqrt(blk.map(v => (v - mean) * (v - mean)).sum / m)
        math.floor(r / s * 1e9 + 0.5) / 1e9
      }
      rss.sum / rss.length
    }
    val ms = Seq(50, 100, 200)
    val pts = ms.map(m => (math.log(m.toDouble), math.log(meanRs(m))))
    val k = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val h = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert(math.abs(row.getAs[Double]("rs_50") - meanRs(50)) < 1e-4)
    assert(math.abs(row.getAs[Double]("rs_200") - meanRs(200)) < 1e-4)
    assert(math.abs(row.getAs[Double]("hurst") - h) < 1e-4,
      s"hurst ${row.getAs[Double]("hurst")} vs brute $h")
  }

  test("q339 ACE matches a sequential frequency-spectrum walk") {
    val row = SparkEntry.queries("q339_ace_richness")(spark, sf0001).head()
    val counts = Tables.documents(spark, sf0001)
      .select(col("text")).collect().map(_.getString(0))
      .flatMap { t =>
        val ts = t.split(" ", -1)
        if (ts.length < 3) Array.empty[String]
        else (0 to ts.length - 3).map(i =>
          s"${ts(i)} ${ts(i + 1)} ${ts(i + 2)}").toArray
      }
      .groupBy(identity).map(_._2.length.toLong).toArray
    val sa = counts.count(_ > 10L)
    val rare = counts.filter(_ <= 10L)
    val (sr, nr) = (rare.length, rare.sum)
    val f1 = rare.count(_ == 1L)
    val ssq = rare.map(c => c * (c - 1)).sum
    val cov = 1.0 - f1.toDouble / nr
    val g2 = math.max(sr / cov * ssq / (nr.toDouble * (nr - 1.0)) - 1.0, 0.0)
    val ace = sa + sr / cov + f1 / cov * g2
    assert(row.getAs[Long]("s_rare") === sr.toLong)
    assert(row.getAs[Long]("singletons") === f1.toLong)
    assert(math.abs(row.getAs[Double]("ace") - ace) < 1e-2,
      s"ACE ${row.getAs[Double]("ace")} vs brute $ace")
  }

  test("q341 turning points match a sequential triple scan") {
    val row = SparkEntry.queries("q341_turning_points")(spark, sf0001)
      .head()
    val (rev, _) = dailySeries()
    val turns = (1 until rev.length - 1).count(i =>
      (rev(i) > rev(i - 1) && rev(i) > rev(i + 1)) ||
        (rev(i) < rev(i - 1) && rev(i) < rev(i + 1)))
    val n = rev.length.toDouble
    val et = 2.0 * (n - 2.0) / 3.0
    val vt = (16.0 * n - 29.0) / 90.0
    assert(row.getAs[Long]("n_turning") === turns.toLong)
    assert(math.abs(row.getAs[Double]("z") -
      (turns - et) / math.sqrt(vt)) < 1e-5)
  }

  test("q342 Spiegelhalter Z matches a per-document walk") {
    val row = SparkEntry.queries("q342_spiegelhalter_z")(spark, sf0001)
      .head()
    val docs = Tables.documents(spark, sf0001)
      .select(col("n_chars"), (col("source") === "src0").as("y"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val (mn, mx) = (docs.map(_._1).min, docs.map(_._1).max)
    def p(sc: Long): Double =
      if (mx > mn)
        math.floor((sc - mn).toDouble / (mx - mn) * 1e9 + 0.5) / 1e9
      else 0.0
    val num = docs.map { case (sc, y) =>
      val pp = p(sc); ((if (y) 1.0 else 0.0) - pp) * (1.0 - 2.0 * pp)
    }.sum
    val den = docs.map { case (sc, _) =>
      val pp = p(sc); (1.0 - 2.0 * pp) * (1.0 - 2.0 * pp) * pp * (1.0 - pp)
    }.sum
    val z = num / math.sqrt(den)
    assert(row.getAs[Long]("n_docs") === docs.length.toLong)
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-3,
      s"z ${row.getAs[Double]("z")} vs brute $z")
  }

  test("q343 Theil's U matches a sequential contingency walk") {
    val row = SparkEntry.queries("q343_theils_u")(spark, sf0001).head()
    val cells = Tables.documents(spark, sf0001)
      .groupBy("lang", "source").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val n = cells.values.sum.toDouble
    def entropy(groups: Map[String, Long]): Double =
      groups.values.map(c => -(c / n) * math.log(c / n)).sum
    val hL = entropy(cells.groupBy(_._1._1).map { case (k, v) =>
      k -> v.values.sum })
    val byS = cells.groupBy(_._1._2).map { case (k, v) => k -> v.values.sum }
    val hLgS = cells.map { case ((_, src), c) =>
      -(c / n) * math.log(c.toDouble / byS(src)) }.sum
    val u = (hL - hLgS) / hL
    assert(math.abs(row.getAs[Double]("h_lang") - hL) < 1e-5)
    assert(math.abs(row.getAs[Double]("u_lang_source") - u) < 1e-5,
      s"U ${row.getAs[Double]("u_lang_source")} vs brute $u")
  }

  test("q344 seasonal MK matches a per-weekday pair walk") {
    val row = SparkEntry.queries("q344_seasonal_mk")(spark, sf0001).head()
    val rows = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .select(datediff(col("day"), lit("1995-01-01")).cast("long").as("t"),
        dayofweek(col("day")).cast("long").as("dow"), col("rev"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val tmax = rows.map(_._1).max
    val recent = rows.filter(_._1 > tmax - 365)
    var sTot = 0L
    var varTot = 0.0
    recent.groupBy(_._2).foreach { case (_, g) =>
      val sorted = g.sortBy(_._1)
      for (i <- sorted.indices; j <- i + 1 until sorted.length)
        sTot += java.lang.Long.signum(sorted(j)._3 - sorted(i)._3)
      val nk = g.length.toDouble
      val tie = g.groupBy(_._3).values.map(_.length.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      varTot += math.floor((nk * (nk - 1.0) * (2.0 * nk + 5.0) - tie) /
        18.0 * 1e6 + 0.5) / 1e6
    }
    val z = if (sTot > 0) (sTot - 1.0) / math.sqrt(varTot)
      else if (sTot < 0) (sTot + 1.0) / math.sqrt(varTot) else 0.0
    assert(row.getAs[Long]("s_stat") === sTot)
    assert(math.abs(row.getAs[Double]("z_smk") - z) < 1e-3)
  }

  test("q345 Bartlett matches a sequential walk AND discriminates on 4x variance") {
    val row = SparkEntry.queries("q345_bartlett")(spark, sf0001).head()
    val segs = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        floor(col("o_totalprice") + 0.5).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2.toDouble) }
    def bartlett(groups: Iterable[Array[Double]]): Double = {
      val k = groups.size
      val n = groups.map(_.length).sum
      val s2 = groups.map { g =>
        val m = g.sum / g.length
        (g.length, g.map(x => (x - m) * (x - m)).sum / (g.length - 1))
      }
      val sp = s2.map { case (nk, v) => (nk - 1) * v }.sum / (n - k)
      val mSt = (n - k) * math.log(sp) -
        s2.map { case (nk, v) => (nk - 1) * math.log(v) }.sum
      val c = 1.0 + (s2.map(g => 1.0 / (g._1 - 1)).sum - 1.0 / (n - k)) /
        (3.0 * (k - 1))
      mSt / c
    }
    val chi = bartlett(segs.values.map(_.toArray))
    assert(math.abs(row.getAs[Double]("bartlett_chi2") - chi) < 0.05,
      s"chi2 ${row.getAs[Double]("bartlett_chi2")} vs brute $chi")
    // discrimination: double one group's spread (4x variance) — the
    // statistic must fire decisively past the df=4 critical 9.4877
    val stretched = segs.map { case (k, v) =>
      if (k == segs.keySet.min)
        v.map(x => (x - v.sum / v.length) * 2.0 + v.sum / v.length).toArray
      else v.toArray
    }
    assert(bartlett(stretched) > 9.4877,
      "Bartlett failed to fire on a 4x-variance group")
  }

  test("q346 Chapman estimate matches a sequential two-capture walk") {
    val row = SparkEntry.queries("q346_capture_recapture")(spark, sf0001)
      .head()
    val caps = Tables.orders(spark, sf0001)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val byC = caps.groupBy(_._1)
    val n1 = byC.count(_._2.exists(_._2 == 1995))
    val n2 = byC.count(_._2.exists(_._2 == 1996))
    val m = byC.count(g => g._2.exists(_._2 == 1995) &&
      g._2.exists(_._2 == 1996))
    val nHat = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    assert(row.getAs[Long]("n_year1") === n1.toLong)
    assert(row.getAs[Long]("n_both") === m.toLong)
    assert(math.abs(row.getAs[Double]("chapman_est") - nHat) < 1e-3)
    // the estimator must LAND: within 5 standard errors of the truth
    // (equal catchability holds for the fixture's order process)
    assert(math.abs(nHat - byC.size) <
      5.0 * row.getAs[Double]("se") + 1.0,
      s"Chapman $nHat far from truth ${byC.size}")
  }

  test("q347 Qn matches a sequential pairwise-difference selection") {
    val row = SparkEntry.queries("q347_qn_scale")(spark, sf0001).head()
    val (rev, _) = dailySeries()
    val recent = {
      // mirror the recent-365 cut on OBSERVED-day index: q347 keys the
      // cut on calendar t, so rebuild it the same way
      val days = Tables.orders(spark, sf0001)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
        .select(datediff(col("day"), lit("1995-01-01")).cast("long"),
          col("rev")).collect().map(r => (r.getLong(0), r.getLong(1)))
      val tmax = days.map(_._1).max
      days.filter(_._1 > tmax - 365).map(_._2)
    }
    val diffs = (for {
      i <- recent.indices; j <- i + 1 until recent.length
    } yield math.abs(recent(i) - recent(j))).sorted
    val h = recent.length / 2 + 1
    val k = h * (h - 1) / 2
    assert(row.getAs[Long]("k_rank") === k.toLong)
    assert(row.getAs[Long]("qn_raw") === diffs(k - 1),
      s"raw ${row.getAs[Long]("qn_raw")} vs brute ${diffs(k - 1)}")
  }

  test("q348 post-stratified estimate matches a sequential survey walk") {
    val row = SparkEntry.queries("q348_post_stratified")(spark, sf0001)
      .head()
    val rows = Tables.orders(spark, sf0001)
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("v"),
        (graft.ops.Kmv.hashCol(col("o_orderkey")) <
          graft.ops.Kmv.HashSpace / 16L).as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val nPop = rows.length
    val trueMean = rows.map(r => BigInt(r._2)).sum.toDouble / nPop / 100.0
    val samp = rows.filter(_._3)
    val srs = samp.map(_._2.toDouble).sum / samp.length / 100.0
    val post = rows.groupBy(_._1).map { case (_, g) =>
      val sh = g.filter(_._3)
      if (sh.isEmpty) 0.0
      else g.length.toDouble / nPop * (sh.map(_._2.toDouble).sum / sh.length)
    }.sum / 100.0
    assert(row.getAs[Long]("n_sample") === samp.length.toLong)
    assert(math.abs(row.getAs[Double]("true_mean") - trueMean) < 0.02)
    assert(math.abs(row.getAs[Double]("srs_mean") - srs) < 0.02)
    assert(math.abs(row.getAs[Double]("post_mean") - post) < 0.02)
  }

  test("q349 lambda matches a sequential modal-prediction walk") {
    val row = SparkEntry.queries("q349_goodman_kruskal")(spark, sf0001)
      .head()
    val cells = Tables.documents(spark, sf0001)
      .groupBy("lang", "source").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val n = cells.map(_._2).sum
    val sms = cells.groupBy(_._1._2).values.map(_.map(_._2).max).sum
    val maxl = cells.groupBy(_._1._1).values.map(_.map(_._2).sum).max
    val lam = (sms - maxl).toDouble / (n - maxl)
    assert(row.getAs[Long]("sum_modal_by_source") === sms)
    assert(math.abs(row.getAs[Double]("lambda_lang_source") - lam) < 1e-5)
  }

  test("q350 Hill alpha matches a sequential top-k walk") {
    val row = SparkEntry.queries("q350_hill_tail")(spark, sf0001).head()
    val vs = Tables.orders(spark, sf0001)
      .select(floor(col("o_totalprice") + 0.5).cast("long"))
      .collect().map(_.getLong(0)).sorted(Ordering[Long].reverse)
    val k = 200
    val xref = vs(k) // (k+1)-th largest
    val h = vs.take(k).map(v => math.log(v.toDouble) -
      math.log(xref.toDouble)).sum / k
    assert(row.getAs[Long]("x_kplus1") === xref)
    assert(math.abs(row.getAs[Double]("hill_alpha") - 1.0 / h) < 1e-2,
      s"alpha ${row.getAs[Double]("hill_alpha")} vs brute ${1.0 / h}")
  }

  test("q351 sketch rollup matches a sequential independent-md5 walk") {
    // independent path: java MessageDigest for the 48-bit fold (not
    // Spark's md5/conv chain), plain sets for the month/quarter k-mins
    val rows = SparkEntry.queries("q351_kmv_rollup")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("qtr") ->
        (r.getAs[Long]("k_used"), r.getAs[Double]("rollup_est"))).toMap
    def h48(key: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16)
    }
    val o = Tables.orders(spark, sf0001)
      .select(col("o_custkey"), year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("mo"), quarter(col("o_orderdate")))
      .filter(col("y").isin(1995, 1996))
      .collect()
      .map(r => (r.getInt(1) * 100 + r.getInt(2),
        r.getInt(1) * 10 + r.getInt(3), h48(r.getLong(0))))
    val monthly: Seq[(Int, Seq[Long])] = o.groupBy(_._1).toSeq
      .map { case (_, g) =>
        (g.head._2, g.map(_._3).distinct.sorted.take(256).toSeq)
      }
    val quarterly = monthly.groupBy(_._1).map { case (q, g) =>
      q -> g.flatMap(_._2).distinct.sorted.take(256)
    }
    quarterly.foreach { case (q, sk) =>
      val (ku, est) = rows(q.toLong)
      assert(ku === sk.length.toLong, s"qtr $q k_used")
      val brute = if (sk.length < 256) sk.length.toDouble
        else 255.0 * 2.81474976710656e14 / sk.last
      assert(math.abs(est - brute) < 1e-2, s"qtr $q est $est vs $brute")
    }
  }

  test("q352 Kuiper matches a sequential ECDF walk") {
    val row = SparkEntry.queries("q352_kuiper")(spark, sf0001).head()
    val vals = Tables.orders(spark, sf0001)
      .select(expr("cast(round(o_totalprice * 100) as bigint)").as("pc"),
        (col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .as("nw"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val xs = vals.filter(!_._2).map(_._1).sorted
    val ys = vals.filter(_._2).map(_._1).sorted
    val cuts = (xs ++ ys).distinct.sorted
    def ecdf(a: Array[Long], v: Long): Double =
      a.count(_ <= v).toDouble / a.length
    val gaps = cuts.map(v => ecdf(xs, v) - ecdf(ys, v))
    val dPlus = math.max(gaps.max, 0.0)
    val dMinus = math.max(-gaps.min, 0.0)
    assert(row.getAs[Long]("n_base") === xs.length.toLong)
    assert(math.abs(row.getAs[Double]("d_plus") - dPlus) < 1e-5)
    assert(math.abs(row.getAs[Double]("d_minus") - dMinus) < 1e-5)
    assert(math.abs(row.getAs[Double]("kuiper_v") - (dPlus + dMinus))
      < 1e-5)
  }

  test("q354 risk ratio matches a sequential 2x2 walk") {
    val rows = SparkEntry.queries("q354_risk_ratio")(spark, sf0001)
      .collect().map(r => r.getAs[String]("brand") ->
        r.getAs[java.lang.Double]("risk_ratio")).toMap
    val cells = Tables.lineitem(spark, sf0001)
      .join(Tables.part(spark, sf0001),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), (col("l_quantity") >= 30).as("hv"))
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    val byB = cells.groupBy(_._1)
    val (ta, tb) = (cells.count(_._2), cells.count(!_._2))
    byB.foreach { case (br, g) =>
      val a = g.count(_._2); val b = g.length - a
      val c = ta - a; val d = tb - b
      val rr = (a.toDouble / (a + b)) / (c.toDouble / (c + d))
      assert(math.abs(rows(br) - rr) < 1e-3, s"$br RR ${rows(br)} vs $rr")
    }
  }

  test("q355 IC matches a sequential character census walk") {
    val rows = SparkEntry.queries("q355_ioc")(spark, sf0001)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_chars"), r.getAs[Double]("ic"))).toMap
    import graft.functions.TextFns
    val docs = Tables.documents(spark, sf0001)
      .select(col("lang"), TextFns.scriptXlit(col("lang"), col("text")))
      .collect().map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).foreach { case (lg, g) =>
      val counts = g.flatMap(_._2.toSeq).filter(_ != ' ')
        .groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum
      val ic = counts.map(c => c * (c - 1.0)).sum / (n.toDouble * (n - 1))
      assert(rows(lg)._1 === n, s"$lg char count")
      assert(math.abs(rows(lg)._2 - ic) < 1e-5, s"$lg IC")
    }
  }

  test("q333 hub bands match a sequential law-of-cosines walk") {
    // Independent on BOTH axes: coordinates from java MessageDigest
    // (not Spark's md5/conv/substring chain) and distance from the
    // spherical law of cosines (not the haversine chain) — the two
    // formulas agree to ~1e-9 km except near antipodes, far below the
    // band widths, so exact count equality is required.
    val rows = SparkEntry.queries("q333_hub_bands")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("hub") ->
        (r.getAs[Long]("n_1000"), r.getAs[Long]("n_2000"),
          r.getAs[Long]("n_5000"), r.getAs[Double]("min_km"))).toMap

    def coords(key: String): (Double, Double) = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val a = java.lang.Long.parseLong(hex.substring(0, 6), 16)
      val b = java.lang.Long.parseLong(hex.substring(6, 12), 16)
      ((a % 1700).toDouble / 10.0 - 85.0, (b % 3600).toDouble / 10.0 - 180.0)
    }
    def dist(p: (Double, Double), q: (Double, Double)): Double = {
      val rad = math.Pi / 180.0
      val c = math.sin(p._1 * rad) * math.sin(q._1 * rad) +
        math.cos(p._1 * rad) * math.cos(q._1 * rad) *
          math.cos((q._2 - p._2) * rad)
      6371.0088 * math.acos(math.max(-1.0, math.min(1.0, c)))
    }
    val custs = Tables.customer(spark, sf0001).select("c_custkey")
      .collect().map(r => coords(r.getLong(0).toString))
    val hubs = Tables.nation(spark, sf0001).select("n_nationkey")
      .collect().map(r => r.getInt(0).toLong)
    assert(hubs.length === 25)
    hubs.foreach { h =>
      val hc = coords(s"hub:$h")
      val ds = custs.map(c => dist(c, hc))
      val (g1, g2, g5, gm) = rows(h)
      assert(g1 === ds.count(_ <= 1000.0).toLong, s"hub $h band 1000")
      assert(g2 === ds.count(_ <= 2000.0).toLong, s"hub $h band 2000")
      assert(g5 === ds.count(_ <= 5000.0).toLong, s"hub $h band 5000")
      assert(math.abs(gm - ds.min) < 1e-3, s"hub $h min ${ds.min} vs $gm")
    }

    // q335: the same independent walk, argmin form — every customer to
    // its (km, hub)-lexicographic nearest hub, then the census
    val v = SparkEntry.queries("q335_nearest_hub")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("hub") ->
        (r.getAs[Long]("n_assigned"), r.getAs[Double]("min_km"),
          r.getAs[Double]("max_km"))).toMap
    val hubCoords = hubs.map(h => h -> coords(s"hub:$h"))
    val assigned = custs.map { c =>
      hubCoords.map { case (h, hc) => (dist(c, hc), h) }.min
    }
    val byHub = assigned.groupBy(_._2)
    assert(v.keySet === byHub.keySet, "assigned hub sets differ")
    byHub.foreach { case (h, as) =>
      val (cnt, lo, hi) = v(h)
      assert(cnt === as.length.toLong, s"hub $h population")
      assert(math.abs(lo - as.map(_._1).min) < 1e-3, s"hub $h min")
      assert(math.abs(hi - as.map(_._1).max) < 1e-3, s"hub $h max")
    }
  }

  test("q356 PCM census matches an independent byte-level frame walk") {
    // Independent on the parse axis: raw MessageDigest BYTES with
    // Java's signed-short arithmetic ((hi << 8) | lo).toShort — not
    // the hex-string conv/strpos fold either engine's query uses.
    val rows = SparkEntry.queries("q356_pcm_census")(spark, sf0001)
      .collect().map(r => r.getAs[String]("lang") -> r).toMap

    val docs = Tables.documents(spark, sf0001).select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val perLang = docs.groupBy(_._2).map { case (lang, ds) =>
      var rmsMicro = 0L; var ssumAll = 0L; var peak = 0L; var ncl = 0L
      ds.foreach { case (id, _) =>
        val b = java.security.MessageDigest.getInstance("MD5")
          .digest(s"pcm:$id".getBytes("UTF-8"))
        val sm = (0 until 8).map(i =>
          (((b(2 * i + 1) & 0xff) << 8) | (b(2 * i) & 0xff)).toShort.toLong)
        val ssq = sm.map(x => x * x).sum
        rmsMicro += math.floor(math.sqrt(ssq / 8.0) * 1e6 + 0.5).toLong
        ssumAll += sm.sum
        peak = math.max(peak, sm.map(math.abs).max)
        ncl += sm.count(x => math.abs(x) > 30000)
      }
      val n = ds.length
      (lang, n.toLong,
        math.floor(rmsMicro.toDouble / n / 1e6 * 1e4 + 0.5) / 1e4,
        math.floor(ssumAll.toDouble / (n * 8L) * 1e4 + 0.5) / 1e4,
        peak, ncl)
    }
    assert(perLang.size === rows.size)
    perLang.foreach { case (lang, n, rms, dc, peak, ncl) =>
      val r = rows(lang)
      assert(r.getAs[Long]("n_docs") === n, s"$lang n_docs")
      assert(r.getAs[Long]("n_samples") === n * 8, s"$lang n_samples")
      assert(math.abs(r.getAs[Double]("mean_rms") - rms) < 1e-9,
        s"$lang rms ${r.getAs[Double]("mean_rms")} vs brute $rms")
      assert(math.abs(r.getAs[Double]("mean_dc") - dc) < 1e-9,
        s"$lang dc ${r.getAs[Double]("mean_dc")} vs brute $dc")
      assert(r.getAs[Long]("peak_abs") === peak, s"$lang peak")
      assert(r.getAs[Long]("n_clipped") === ncl, s"$lang clipped")
    }
  }

  test("q357 histogram rollup matches a sequential bin walk") {
    val rows = SparkEntry.queries("q357_hist_rollup")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("qtr") -> r).toMap

    val o = Tables.orders(spark, sf0001)
      .filter(year(col("o_orderdate")).isin(1995, 1996))
      .select((year(col("o_orderdate")) * 10 +
        quarter(col("o_orderdate"))).as("qtr"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .collect().map(r => (r.getAs[Int]("qtr").toLong, r.getLong(1)))
    val mn = o.map(_._2).min; val mx = o.map(_._2).max
    val w = (mx - mn + 1).toDouble / 32.0
    o.groupBy(_._1).foreach { case (qtr, os) =>
      val xs = os.map(_._2).sorted
      val n = xs.length
      val hist = xs.groupBy(x => (x - mn) * 32 / (mx - mn + 1))
        .view.mapValues(_.length.toLong).toMap
      def estQ(p: Double): Double = {
        val t = p * n
        val bins = hist.keys.toSeq.sorted
        var cum = 0L
        val hit = bins.find { b =>
          val ok = cum < t && t <= cum + hist(b); if (!ok) cum += hist(b); ok
        }.get
        val e = mn.toDouble + (hit.toDouble + (t - cum.toDouble) /
          hist(hit).toDouble) * w
        math.floor(e * 1e4 + 0.5) / 1e4
      }
      def exactQ(p: Double): Double = {
        val pos = p * (n - 1)
        val lo = pos.toInt
        val v = if (lo + 1 >= n) xs(lo).toDouble
          else xs(lo) + (xs(lo + 1) - xs(lo)) * (pos - lo)
        math.floor(v * 1e4 + 0.5) / 1e4
      }
      val r = rows(qtr)
      assert(r.getAs[Long]("n_orders") === n.toLong, s"qtr $qtr n")
      assert(math.abs(r.getAs[Double]("est_p50") - estQ(0.5)) < 1e-6,
        s"qtr $qtr est_p50 ${r.getAs[Double]("est_p50")} vs ${estQ(0.5)}")
      assert(math.abs(r.getAs[Double]("est_p90") - estQ(0.9)) < 1e-6,
        s"qtr $qtr est_p90")
      assert(math.abs(r.getAs[Double]("exact_p50") - exactQ(0.5)) < 1e-4,
        s"qtr $qtr exact_p50 ${r.getAs[Double]("exact_p50")} vs ${exactQ(0.5)}")
      assert(math.abs(r.getAs[Double]("exact_p90") - exactQ(0.9)) < 1e-4,
        s"qtr $qtr exact_p90 ${r.getAs[Double]("exact_p90")} vs ${exactQ(0.9)}")
      // the structural interpolation bound: est within ~one bin width
      assert(math.abs(r.getAs[Double]("est_p50") -
        r.getAs[Double]("exact_p50")) <= 2.0 * w, s"qtr $qtr p50 bound")
      assert(math.abs(r.getAs[Double]("est_p90") -
        r.getAs[Double]("exact_p90")) <= 2.0 * w, s"qtr $qtr p90 bound")
    }
  }

  test("q358 CM rollup matches a sequential independent-md5 walk") {
    val rows = SparkEntry.queries("q358_cm_rollup")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("c_custkey") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("cm_est"),
          r.getAs[Long]("overshoot"))).toMap

    def cell(j: Int, key: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cm$j:$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 6), 16) % 1024L).toInt
    }
    val custs = Tables.orders(spark, sf0001).select("o_custkey")
      .collect().map(_.getLong(0))
    // the three 1024-cell counter rows, built sequentially
    val counters = Array.fill(3, 1024)(0L)
    custs.foreach(k => (0 until 3).foreach(j => counters(j)(cell(j, k)) += 1))
    val exact = custs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    (0L to 20L).foreach { k =>
      val est = (0 until 3).map(j => counters(j)(cell(j, k))).min
      val ex = exact.getOrElse(k, 0L)
      val (re, rest, rov) = rows(k)
      assert(re === ex, s"probe $k exact $re vs brute $ex")
      assert(rest === est, s"probe $k est $rest vs brute $est")
      assert(rov === est - ex, s"probe $k overshoot")
      assert(rest >= re, s"probe $k CM UNDERestimates -- impossible")
    }
  }

  test("q359 Holt-Winters matches a sequential triple-smoothing walk") {
    val rows = SparkEntry.queries("q359_holt_winters")(spark, sf0001)
      .orderBy("day").collect()

    val daily = Tables.orders(spark, sf0001)
      .filter(col("o_orderdate") >= lit("1997-01-01"))
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(13,4)")).as("revd"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0), r.getDecimal(1)))
    val revs = daily.map(_._2.doubleValue())
    val l0 = daily.take(7).map(_._2).reduce(_ add _).doubleValue() / 7.0
    var l = l0; var b = 0.0
    val sea = Array.tabulate(7)(i => revs(i) - l0)
    val out = (7 until revs.length).map { t0 =>
      val rn = t0 + 1
      val idx = (rn - 1) % 7
      val se = sea(idx)
      val fit = l + b + se
      val x = revs(t0)
      val l2 = 0.3 * (x - se) + 0.7 * (l + b)
      val b2 = 0.1 * (l2 - l) + 0.9 * b
      val se2 = 0.2 * (x - l2) + 0.8 * se
      l = l2; b = b2; sea(idx) = se2
      (daily(t0)._1, x, l2, b2, se2, fit)
    }
    assert(rows.length === out.length, "row count vs brute walk")
    rows.zip(out).foreach { case (r, (day, x, l2, b2, se2, fit)) =>
      assert(r.getAs[java.sql.Date]("day").toString === day.toString)
      def q4(v: Double) = math.floor(v * 1e4 + 0.5) / 1e4
      assert(math.abs(r.getAs[Double]("rev") - q4(x)) < 1e-9, s"$day rev")
      assert(math.abs(r.getAs[Double]("level") - q4(l2)) < 1e-9, s"$day lvl")
      assert(math.abs(r.getAs[Double]("trend") - q4(b2)) < 1e-9, s"$day tr")
      assert(math.abs(r.getAs[Double]("seasonal") - q4(se2)) < 1e-9,
        s"$day seasonal")
      assert(math.abs(r.getAs[Double]("fitted") - q4(fit)) < 1e-9,
        s"$day fitted")
    }
  }

  test("q360 RBP matches a sequential user-model walk; q361 TOST matches Welch") {
    // q360: exact dyadic arithmetic — brute must match to the bit
    val rbp = SparkEntry.queries("q360_rbp")(spark, sf0001)
      .collect().map(r => r.getAs[String]("query_lang") -> r).toMap
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val langs = docs.map(_._2).distinct.sorted
    langs.foreach { ql =>
      val top20 = docs.sortBy(d => (-d._3, d._1)).take(20)
      var num = 0L; var nrel = 0L
      top20.zipWithIndex.foreach { case ((_, lg, _), i) =>
        if (lg == ql) { nrel += 1; num += 1L << (20 - (i + 1)) }
      }
      val r = rbp(ql)
      assert(r.getAs[Long]("n_rel20") === nrel, s"$ql n_rel20")
      assert(r.getAs[Double]("rbp") === num.toDouble / 1048576.0,
        s"$ql rbp must be EXACT (dyadic)")
      assert(r.getAs[Double]("rbp_max") ===
        (num + 1L).toDouble / 1048576.0, s"$ql rbp_max")
    }

    // q361: sequential Welch moments + the TOST decision
    val row = SparkEntry.queries("q361_tost")(spark, sf0001).head()
    val seg = Tables.customer(spark, sf0001)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val vs = Tables.orders(spark, sf0001)
      .select("o_custkey", "o_totalprice").collect()
      .flatMap { r =>
        seg.get(r.getLong(0)) match {
          case Some("BUILDING") =>
            Some((true, math.floor(r.getDouble(1) + 0.5).toLong))
          case Some("FURNITURE") =>
            Some((false, math.floor(r.getDouble(1) + 0.5).toLong))
          case _ => None
        }
      }
    def mom(g: Boolean) = {
      val xs = vs.filter(_._1 == g).map(_._2)
      (xs.length.toLong, xs.map(BigInt(_)).sum,
        xs.map(x => BigInt(x) * x).sum)
    }
    val (na, sa, qa) = mom(true); val (nb, sb, qb) = mom(false)
    val ma = sa.toDouble / na; val mb = sb.toDouble / nb
    val sea = (qa.toDouble - sa.toDouble * sa.toDouble / na) / (na - 1.0) / na
    val seb = (qb.toDouble - sb.toDouble * sb.toDouble / nb) / (nb - 1.0) / nb
    val se = math.sqrt(sea + seb)
    val margin = (sa + sb).toDouble / (na + nb) * 0.05
    val tLo = ((ma - mb) + margin) / se
    val tHi = (margin - (ma - mb)) / se
    assert(row.getAs[Long]("n_a") === na && row.getAs[Long]("n_b") === nb)
    assert(math.abs(row.getAs[Double]("t_lower") - tLo) < 1e-4)
    assert(math.abs(row.getAs[Double]("t_upper") - tHi) < 1e-4)
    val eq = if (math.floor(tLo * 1e6 + 0.5) / 1e6 > 1.645 &&
      math.floor(tHi * 1e6 + 0.5) / 1e6 > 1.645) 1L else 0L
    assert(row.getAs[Long]("equivalent") === eq, "TOST decision")
  }

  /** The 48-bit md5-prefix hash, computed OUTSIDE both engines (the
    * q358 MessageDigest discipline) — pins Kmv.hashCol/hashSql. */
  private def md5Hv48(k: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(k.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 12), 16)
  }

  test("q362 HLL census matches an independent MessageDigest register walk") {
    val out = SparkEntry.queries("q362_hll_census")(spark, sf0001)
      .collect().map(r => r.getAs[String]("priority") -> r).toMap
    val rows = Tables.orders(spark, sf0001)
      .select("o_orderpriority", "o_custkey").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val mask = (1L << 40) - 1L
    rows.groupBy(_._1).foreach { case (pri, g) =>
      val regs = Array.fill(256)(0L)
      g.foreach { case (_, k) =>
        val h = md5Hv48(k)
        val idx = (h >> 40).toInt
        val w = h & mask
        // rho = leading zeros among the 40 remainder bits + 1
        val rho = if (w == 0L) 41L
          else 41L - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > regs(idx)) regs(idx) = rho
      }
      val v = regs.count(_ == 0L)
      val sInt = regs.map(m => 1L << (41L - m).toInt).sum
      val alpha = 0.7213 / (1.0 + 1.079 / 256.0)
      val eRaw = alpha * 65536.0 * 2199023255552.0 / sInt.toDouble
      val est =
        if (eRaw <= 640.0 && v > 0) 256.0 * math.log(256.0 / v) else eRaw
      val exact = g.map(_._2).distinct.length
      val r = out(pri)
      def q4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
      assert(r.getAs[Long]("n_exact") === exact.toLong, s"$pri exact")
      assert(r.getAs[Long]("v_empty") === v.toLong, s"$pri empty registers")
      assert(r.getAs[Long]("n_registers") === (256 - v).toLong, s"$pri nreg")
      assert(math.abs(r.getAs[Double]("hll_est") - q4(est)) < 1e-9,
        s"$pri estimate")
      assert(math.abs(r.getAs[Double]("rel_err") -
        q4((est - exact) / exact)) < 1e-9, s"$pri rel err")
    }
  }

  test("q363 AMS F2 rollup matches a quarter-direct sign-sketch walk") {
    // the query builds MONTHLY sketches and merges them; this walk
    // builds each quarter's sketch directly from the rows — equality
    // IS the linearity/merge property, verified outside both engines
    val out = SparkEntry.queries("q363_ams_f2")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("quarter") -> r).toMap
    val rows = Tables.orders(spark, sf0001)
      .select(to_date(col("o_orderdate")).as("d"), col("o_custkey"))
      .collect()
      .map { r =>
        val d = r.getDate(0).toLocalDate
        (d.getYear * 10L + ((d.getMonthValue - 1) / 3 + 1), r.getLong(1))
      }
    rows.groupBy(_._1).foreach { case (qtr, g) =>
      val x = Array.fill(32)(0L)
      g.foreach { case (_, k) =>
        val h = md5Hv48(k)
        var j = 0
        while (j < 32) { x(j) += 2L * ((h >> j) & 1L) - 1L; j += 1 }
      }
      val est = x.map(v => v * v).sum.toDouble / 32.0
      val f2 = g.groupBy(_._2).values
        .map(s => s.length.toLong * s.length).sum
      val r = out(qtr)
      def q4(v: Double) = math.floor(v * 1e4 + 0.5) / 1e4
      assert(r.getAs[Long]("n_orders") === g.length.toLong, s"$qtr n")
      assert(r.getAs[Long]("f2_exact") === f2, s"$qtr exact F2")
      // the estimate is exact integer arithmetic / 32 — zero tolerance
      assert(r.getAs[Double]("ams_est") === est, s"$qtr AMS estimate")
      assert(math.abs(r.getAs[Double]("rel_err") -
        q4((est - f2) / f2)) < 1e-9, s"$qtr rel err")
    }
  }

  test("q364 Bartels RVN matches a sequential rank walk on both series") {
    val out = SparkEntry.queries("q364_bartels_rvn")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[String]("series"), r.getAs[Long]("yr")) -> r).toMap
    val daily = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val ma7 = daily.indices.drop(6)
      .map(i => (daily(i)._1, daily.slice(i - 6, i + 1).map(_._2).sum))

    def walk(series: String,
        pts: Seq[(java.time.LocalDate, Long)]): Unit = {
      pts.groupBy(_._1.getYear).foreach { case (yr, g0) =>
        val g = g0.sortBy(_._1.toEpochDay)
        val n = g.length
        val rank = new Array[Long](n)
        g.zipWithIndex
          .sortBy { case ((d, v), _) => (v, d.toEpochDay) }
          .zipWithIndex
          .foreach { case ((_, orig), rk) => rank(orig) = rk + 1L }
        val num = (0 until n - 1)
          .map { i => val d = rank(i) - rank(i + 1); d * d }.sum
        val nd = n.toDouble
        val rvn = 12.0 * num / (nd * (nd * nd - 1.0))
        val z = (rvn - 2.0) / math.sqrt(4.0 * (nd - 2.0) *
          (5.0 * nd * nd - nd * 2.0 - 9.0) /
          (5.0 * nd * (nd + 1.0) * (nd - 1.0) * (nd - 1.0)))
        val r = out((series, yr.toLong))
        def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
        def q4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
        assert(r.getAs[Long]("n_days") === n.toLong, s"$series $yr n")
        assert(math.abs(r.getAs[Double]("rvn") - q6(rvn)) < 1e-9,
          s"$series $yr rvn")
        assert(math.abs(r.getAs[Double]("z") - q4(z)) < 1e-9,
          s"$series $yr z")
        assert(r.getAs[Long]("reject_5pct") ===
          (if (math.abs(q4(z)) > 1.96) 1L else 0L), s"$series $yr flag")
      }
    }
    walk("raw", daily.toSeq)
    walk("ma7", ma7)
  }

  test("q365 bpref matches a sequential preference walk") {
    val out = SparkEntry.queries("q365_bpref")(spark, sf0001)
      .collect().map(r => r.getAs[String]("query_lang") -> r).toMap
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getString(1),
        r.getAs[Long]("n_chars")))
    val langs = docs.map(_._2).distinct.sorted
    // r17 (r16 advisor): the walk uses pool = 20 literals below, valid
    // only while the corpus fills the judged pool — assert it does
    // (the query itself derives pool from max(rk) and stays correct on
    // sub-20 corpora)
    assert(docs.length >= 20, "fixture must fill the judged top-20 pool")
    langs.foreach { ql =>
      val top20 = docs.sortBy { case (id, _, nc) => (-nc, id) }.take(20)
      val rels = top20.map(_._2 == ql)
      val rCount = rels.count(identity)
      val nCount = 20 - rCount
      val mn = math.min(rCount, nCount)
      var nonrelAbove = 0L
      var num = 0L
      rels.foreach { rel =>
        if (rel) num += mn - math.min(nonrelAbove, mn.toLong)
        else nonrelAbove += 1
      }
      val expected =
        if (rCount == 0 || nCount == 0) None
        else Some(num.toDouble / (rCount.toLong * mn).toDouble)
      val r = out(ql)
      assert(r.getAs[Long]("n_rel") === rCount.toLong, s"$ql R")
      assert(r.getAs[Long]("n_nonrel") === nCount.toLong, s"$ql N")
      expected match {
        case Some(b) => assert(r.getAs[Double]("bpref") === b, s"$ql bpref")
        case None => assert(r.isNullAt(r.fieldIndex("bpref")), s"$ql null")
      }
    }
  }

  test("q366 sign test matches an exact BigInteger binomial tail") {
    val out = SparkEntry.queries("q366_sign_test")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[String]("seg_a"), r.getAs[String]("seg_b")) -> r)
      .toMap
    // quarterly segment revenue census, collected once (135 rows)
    val c = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .groupBy((year(col("o_orderdate")) * 10 +
        quarter(col("o_orderdate"))).cast("long").as("qtr"),
        col("c_mktsegment").as("seg"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
        .as("rev"))
      .collect()
      .map(r => (r.getAs[Long]("qtr"), r.getString(1), r.getAs[Long]("rev")))
    val byQtr = c.groupBy(_._1)
    val segs = c.map(_._2).distinct.sorted
    for (a <- segs; b <- segs if a < b) {
      var n = 0L; var k = 0L
      byQtr.values.foreach { g =>
        val m = g.map(t => t._2 -> t._3).toMap
        (m.get(a), m.get(b)) match {
          case (Some(ra), Some(rb)) if ra != rb =>
            n += 1; if (ra > rb) k += 1
          case _ => ()
        }
      }
      val kmin = math.min(k, n - k)
      // exact tail via BigInteger — a reference INDEPENDENT of the
      // query's int64 Pascal fold
      import java.math.BigInteger
      var cbi = BigInteger.ONE
      var s = BigInteger.ONE
      (1L to kmin).foreach { j =>
        cbi = cbi.multiply(BigInteger.valueOf(n - j + 1))
          .divide(BigInteger.valueOf(j))
        s = s.add(cbi)
      }
      val p = math.min(1.0,
        2.0 * s.doubleValue() / math.pow(2.0, n.toDouble))
      val r = out((a, b))
      assert(r.getAs[Long]("n_pairs") === n, s"$a-$b n")
      assert(r.getAs[Long]("wins_a") === k, s"$a-$b k")
      assert(math.abs(r.getAs[Double]("p_exact") - p) < 1e-12,
        s"$a-$b p: ${r.getAs[Double]("p_exact")} vs $p")
    }
  }

  test("q367 Brunner-Munzel matches a sequential midrank walk") {
    val out = SparkEntry.queries("q367_brunner_munzel")(spark, sf0001)
      .collect().map(r => r.getAs[String]("pair") -> r).toMap

    def midranks(v: Array[Long]): Array[Double] = {
      val order = v.indices.sortBy(i => (v(i), i))
      val ranks = new Array[Double](v.length)
      var i = 0
      while (i < v.length) {
        var j = i
        while (j + 1 < v.length && v(order(j + 1)) == v(order(i))) j += 1
        val mid = (i + j) / 2.0 + 1.0
        (i to j).foreach(t => ranks(order(t)) = mid)
        i = j + 1
      }
      ranks
    }
    def bm(x: Array[Long], y: Array[Long]): (Double, Double, Double) = {
      val (nx, ny) = (x.length.toDouble, y.length.toDouble)
      val rc = midranks(x ++ y)
      val (rcx, rcy) = rc.splitAt(x.length)
      val (rx, ry) = (midranks(x), midranks(y))
      val (mx, my) = (rcx.sum / nx, rcy.sum / ny)
      val sx = rcx.zip(rx).map { case (c, w) =>
        val t = c - w - mx + (nx + 1) / 2.0; t * t }.sum / (nx - 1.0)
      val sy = rcy.zip(ry).map { case (c, w) =>
        val t = c - w - my + (ny + 1) / 2.0; t * t }.sum / (ny - 1.0)
      val w = nx * ny * (my - mx) /
        ((nx + ny) * math.sqrt(nx * sx + ny * sy))
      val df = math.pow(nx * sx + ny * sy, 2) /
        (math.pow(nx * sx, 2) / (nx - 1.0) +
          math.pow(ny * sy, 2) / (ny - 1.0))
      val pHat = (my - (ny + 1.0) / 2.0) / nx
      (pHat, w, df)
    }
    // priority pair
    val pri = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val (px, py) = (pri.filter(_._1 == "1-URGENT").map(_._2),
      pri.filter(_._1 == "5-LOW").map(_._2))
    // discount pair
    val li = Tables.lineitem(spark, sf0001)
      .select(floor(col("l_extendedprice") * 1000000 + 0.5)
          .cast("long").as("g"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          1000000 + 0.5).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def check(pair: String, x: Array[Long], y: Array[Long]): Unit = {
      val (pHat, w, df) = bm(x, y)
      val r = out(pair)
      def q(v: Double, s: Double) = math.floor(v * s + 0.5) / s
      // the walk's double ordering differs from the engines' fixed
      // chain; compare at one quantum of each published rounding
      assert(math.abs(r.getAs[Double]("p_hat") - q(pHat, 1e6)) <= 2e-6,
        s"$pair p_hat")
      assert(math.abs(r.getAs[Double]("w_stat") - q(w, 1e4)) <= 2e-4,
        s"$pair W")
      assert(math.abs(r.getAs[Double]("df") - q(df, 1e2)) <= 2e-2,
        s"$pair df")
      assert(r.getAs[Long]("n1") === x.length.toLong, s"$pair n1")
      assert(r.getAs[Long]("n2") === y.length.toLong, s"$pair n2")
    }
    check("priority", px, py)
    check("discount", li.map(_._1), li.map(_._2))
  }

  test("q368 Bloom census matches an independent MessageDigest filter walk") {
    val out = SparkEntry.queries("q368_bloom_fpr")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("m_bits") -> r).toMap
    val members = Tables.orders(spark, sf0001)
      .select("o_custkey").distinct().collect().map(_.getLong(0))
    def pos(j: Int, key: Long, m: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"bf$j:$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16) % m
    }
    // r17 (r16 advisor): probes derive from max(o_custkey) + 1 …
    // + 3000, matching the query's SF-safe construction
    val mx = members.max
    Seq(1024L, 16384L).foreach { m =>
      val bits = (for (k <- members; j <- 0 until 7) yield pos(j, k, m)).toSet
      val fp = ((mx + 1L) to (mx + 3000L)).count { p =>
        (0 until 7).forall(j => bits.contains(pos(j, p, m)))
      }
      val r = out(m)
      assert(r.getAs[Long]("n_members") === members.length.toLong, s"m=$m n")
      assert(r.getAs[Long]("bits_set") === bits.size.toLong, s"m=$m bits")
      assert(r.getAs[Long]("n_false_pos") === fp.toLong, s"m=$m fp")
      def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
      assert(math.abs(r.getAs[Double]("fpr_obs") - q6(fp / 3000.0)) < 1e-9)
      val n = members.length.toDouble
      val exp = math.pow(1.0 - math.pow(1.0 - 1.0 / m, 7.0 * n), 7.0)
      assert(math.abs(r.getAs[Double]("fpr_exp") - q6(exp)) < 2e-6, s"m=$m exp")
    }
  }

  test("q369 RMST matches a sequential step-integral walk") {
    val out = SparkEntry.queries("q369_rmst")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("tau_hours") -> r).toMap
    // per-user lifetimes + churn flags, the q175 construction
    val e = Tables.events(spark, sf0001).filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("f"),
        max(unix_micros(col("ts"))).as("l"))
      .collect().map(r => (r.getAs[Long]("f"), r.getAs[Long]("l")))
    val endUs = e.map(_._2).max
    val lives = e.map { case (f, l) =>
      ((l - f) / 3600000000L, l <= endUs - 12L * 3600L * 1000000L)
    }
    val nu = lives.length
    // KM walk replicating the query's exact quantized-ln chain
    val byT = lives.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = nu.toLong
    var lnSum = 0L
    var dead = false
    val km = byT.map { case (t, g) =>
      val d = g.count(_._2).toLong
      if (d >= atRisk) dead = true
      if (d > 0 && d < atRisk)
        lnSum += math.floor(math.log((atRisk - d).toDouble /
          atRisk.toDouble) * 1e9 + 0.5).toLong
      val sv = if (dead) 0.0
        else math.floor(math.exp(lnSum.toDouble / 1e9) * 1e4 + 0.5) / 1e4
      atRisk -= g.length
      (t, sv)
    }
    Seq(660L, 690L, 720L).foreach { tau =>
      // exact step integral over the quantized curve, in BigDecimal
      var rmst = BigDecimal(math.min(km.head._1, tau)) // S=1 head segment
      km.indices.foreach { i =>
        val (t, sv) = km(i)
        val tNext = math.max(if (i + 1 < km.length) km(i + 1)._1 else tau, t)
        val len = math.min(tNext, tau) - math.min(t, tau)
        // the query casts the 4dp double to DECIMAL(9,4) — replicate
        // the lossless 4-decimal recovery, not the binary expansion
        rmst += BigDecimal(sv)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP) * len
      }
      val naive = math.floor(lives.map(l => math.min(l._1, tau)).sum
        .toDouble / nu.toDouble * 1e4 + 0.5) / 1e4
      val r = out(tau)
      assert(r.getAs[Long]("n_users") === nu.toLong, s"tau=$tau n")
      assert(math.abs(r.getAs[Double]("rmst_hours") - rmst.toDouble) < 1e-9,
        s"tau=$tau rmst: ${r.getAs[Double]("rmst_hours")} vs $rmst")
      assert(math.abs(r.getAs[Double]("naive_mean_hours") - naive) < 1e-9,
        s"tau=$tau naive")
    }
  }

  test("q370 VIF matches a sequential correlation walk") {
    val out = SparkEntry.queries("q370_vif")(spark, sf0001)
      .collect().map(r => r.getAs[String]("predictor") -> r).toMap
    val d = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val rows = d.indices.drop(6).map { i =>
      (d(i)._1.toDouble, d(i)._2.toDouble,
        d.slice(i - 6, i + 1).map(_._2).sum.toDouble)
    }
    val n = rows.length.toDouble
    def corr(a: Seq[Double], b: Seq[Double]): Double = {
      val (sa, sb) = (a.sum, b.sum)
      val sab = a.zip(b).map { case (x, y) => x * y }.sum
      (n * sab - sa * sb) /
        (math.sqrt(n * a.map(x => x * x).sum - sa * sa) *
          math.sqrt(n * b.map(x => x * x).sum - sb * sb))
    }
    val (c1, c2, c3) = (rows.map(_._1), rows.map(_._2), rows.map(_._3))
    val (r12, r13, r23) = (corr(c1, c2), corr(c1, c3), corr(c2, c3))
    val det = 1.0 - r12 * r12 - r13 * r13 - r23 * r23 +
      2.0 * r12 * r13 * r23
    def q4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // 1e-4-quantum tolerance: the walk's double sums run in a
    // different order than the engines' exact DECIMAL moments
    assert(math.abs(out("cnt").getAs[Double]("vif") -
      q4((1 - r23 * r23) / det)) <= 2e-4, "vif cnt")
    assert(math.abs(out("rev").getAs[Double]("vif") -
      q4((1 - r13 * r13) / det)) <= 2e-4, "vif rev")
    assert(math.abs(out("ma7").getAs[Double]("vif") -
      q4((1 - r12 * r12) / det)) <= 2e-4, "vif ma7")
    assert(math.abs(out("cnt").getAs[Double]("num_1mr2") -
      q6(1 - r23 * r23)) <= 2e-6, "num cnt")
  }

  test("q371 BWS matches a sequential weighted-rank walk") {
    val out = SparkEntry.queries("q371_bws")(spark, sf0001)
      .collect().map(r => r.getAs[String]("pair") -> r).toMap
    val pri = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("v"),
        col("o_orderkey").as("tb"))
      .collect().map(r => (if (r.getString(0) == "1-URGENT") "x" else "y",
        r.getLong(1), r.getLong(2)))
    val lif = Tables.lineitem(spark, sf0001)
      .select(floor(col("l_extendedprice") * 1000000 + 0.5)
          .cast("long").as("g"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          1000000 + 0.5).cast("long").as("n"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("tb"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val disc = lif.map(t => ("x", t._1, t._3)) ++
      lif.map(t => ("y", t._2, t._3))

    def bws(rows: Array[(String, Long, Long)]): Double = {
      // pooled ranks by the query's (v, grp, tb) total order
      val pooled = rows.sortBy { case (g, v, tb) => (v, g, tb) }
      val rk = scala.collection.mutable.Map[(String, Long, Long), Long]()
      pooled.zipWithIndex.foreach { case (t, i) => rk(t) = i + 1L }
      var sums = Map("x" -> 0L, "y" -> 0L)
      val byG = rows.groupBy(_._1)
      val (nx, ny) = (byG("x").length.toLong, byG("y").length.toLong)
      byG.foreach { case (g, rs) =>
        val nn = rs.length.toLong
        val mm = rows.length.toLong - nn
        rs.sortBy { case (_, v, tb) => (v, tb) }.zipWithIndex.foreach {
          case (t, i0) =>
            val i = i0 + 1L
            val a = BigInt(nn * rk(t) - (mm + nn) * i)
            val num = a * a * BigInt((nn + 1) * (nn + 1))
            val den = BigInt(nn) * BigInt(i) * BigInt(nn + 1 - i) *
              BigInt(mm) * BigInt(mm + nn)
            val micro = math.floor(num.toDouble / den.toDouble * 1e6 + 0.5)
              .toLong
            sums += g -> (sums(g) + micro)
        }
      }
      (sums("x") / 1e6 / nx + sums("y") / 1e6 / ny) / 2.0
    }
    def q4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(math.abs(out("priority").getAs[Double]("b_stat") -
      q4(bws(pri))) < 1e-9, "priority B")
    assert(math.abs(out("discount").getAs[Double]("b_stat") -
      q4(bws(disc))) < 1e-9, "discount B")
  }

  test("q372 EIV slopes match a sequential moment walk") {
    val out = SparkEntry.queries("q372_eiv")(spark, sf0001)
      .collect().map(r => r.getAs[String]("pair") -> r).toMap
    def check(pair: String, pts: Array[(Long, Long)]): Unit = {
      val n = pts.length.toDouble
      val (sx, sy) = (pts.map(_._1).sum.toDouble, pts.map(_._2).sum.toDouble)
      val sxx = pts.map(p => p._1.toDouble * p._1).sum
      val syy = pts.map(p => p._2.toDouble * p._2).sum
      val sxy = pts.map(p => p._1.toDouble * p._2).sum
      val cxx = n * sxx - sx * sx
      val cyy = n * syy - sy * sy
      val cxy = n * sxy - sx * sy
      val bOls = cxy / cxx
      val bInv = cyy / cxy
      val bDem = (cyy - cxx + math.sqrt((cyy - cxx) * (cyy - cxx) +
        4.0 * cxy * cxy)) / (2.0 * cxy)
      val bRma = math.signum(cxy) * math.sqrt(cyy) / math.sqrt(cxx)
      val r = out(pair)
      // walk sums doubles (different order than the engines' exact
      // DECIMAL moments) -> compare at a few quanta of the rounding;
      // count_rev slopes are ~5e5 so scale the band relatively
      def close(a: Double, b: Double, what: String): Unit =
        assert(math.abs(a - b) <= 2e-6 + 1e-9 * math.abs(b),
          s"$pair $what: $a vs $b")
      close(r.getAs[Double]("b_ols"), bOls, "ols")
      close(r.getAs[Double]("b_inv"), bInv, "inv")
      close(r.getAs[Double]("b_deming"), bDem, "deming")
      close(r.getAs[Double]("b_rma"), bRma, "rma")
    }
    val p1 = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("x"),
        sum(floor(col("o_totalprice") + 0.5).cast("long")).as("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val p2 = Tables.lineitem(spark, sf0001)
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100 + 0.5).cast("long")).as("x"),
        sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
          .as("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    check("count_rev", p1)
    check("net_gross", p2)
  }

  test("q373 Aalen-Johansen matches a sequential competing-risks walk") {
    val out = SparkEntry.queries("q373_aalen_johansen")(spark, sf0001)
      .orderBy("t_hours").collect()
    val e = Tables.events(spark, sf0001).filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("f"),
        max(unix_micros(col("ts"))).as("l"),
        max(struct(col("ts"), col("event_type"))).as("le"))
      .collect().map(r => (r.getAs[Long]("f"), r.getAs[Long]("l"),
        r.getStruct(r.fieldIndex("le")).getString(1)))
    val endUs = e.map(_._2).max
    val lives = e.map { case (f, l, cause) =>
      ((l - f) / 3600000000L,
        l <= endUs - 12L * 3600L * 1000000L, cause)
    }
    val nu = lives.length
    val byT = lives.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = nu.toLong
    var lnSum = 0L
    var deadPrev = 0L
    var cifP9 = 0L
    var cifQ9 = 0L
    val walk = byT.map { case (t, g) =>
      val dp = g.count(x => x._2 && x._3 == "purchase").toLong
      val dq = g.count(x => x._2 && x._3 != "purchase").toLong
      val d = dp + dq
      val sPrev = if (deadPrev == 1L) 0.0
        else math.floor(math.exp(lnSum.toDouble / 1e9) * 1e4 + 0.5) / 1e4
      cifP9 += math.floor(sPrev * dp.toDouble / atRisk.toDouble * 1e9
        + 0.5).toLong
      cifQ9 += math.floor(sPrev * dq.toDouble / atRisk.toDouble * 1e9
        + 0.5).toLong
      if (d >= atRisk) deadPrev = 1L
      if (d > 0 && d < atRisk)
        lnSum += math.floor(math.log((atRisk - d).toDouble /
          atRisk.toDouble) * 1e9 + 0.5).toLong
      val sv = if (deadPrev == 1L) 0.0
        else math.floor(math.exp(lnSum.toDouble / 1e9) * 1e4 + 0.5) / 1e4
      val row = (t, atRisk, dp, dq,
        math.floor(cifP9.toDouble / 1e9 * 1e6 + 0.5) / 1e6,
        math.floor(cifQ9.toDouble / 1e9 * 1e6 + 0.5) / 1e6, sv)
      atRisk -= g.length
      row
    }
    assert(out.length === walk.length, "event-time row count")
    out.zip(walk).foreach { case (r, (t, risk, dp, dq, cp, cq, sv)) =>
      assert(r.getAs[Long]("t_hours") === t, s"t=$t")
      assert(r.getAs[Long]("n_risk") === risk, s"t=$t risk")
      assert(r.getAs[Long]("d_purchase") === dp, s"t=$t dp")
      assert(r.getAs[Long]("d_other") === dq, s"t=$t dq")
      assert(math.abs(r.getAs[Double]("cif_purchase") - cp) < 1e-9,
        s"t=$t CIF purchase")
      assert(math.abs(r.getAs[Double]("cif_other") - cq) < 1e-9,
        s"t=$t CIF other")
      assert(math.abs(r.getAs[Double]("survival") - sv) < 1e-9,
        s"t=$t survival")
    }
  }

  test("q374 Bland-Altman matches a sequential difference walk") {
    val r = SparkEntry.queries("q374_bland_altman")(spark, sf0001).head()
    val a = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
        .as("v")).collect()
      .map(x => x.getDate(0).toString -> x.getLong(1)).toMap
    val b = Tables.lineitem(spark, sf0001)
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
        .as("v")).collect()
      .map(x => x.getDate(0).toString -> x.getLong(1)).toMap
    val d = a.keySet.intersect(b.keySet).toSeq.sorted
      .map(k => a(k) - b(k))
    val n = d.length.toDouble
    val s1 = d.map(BigDecimal(_)).sum.toDouble
    val s2 = d.map(x => BigDecimal(x) * BigDecimal(x)).sum.toDouble
    val bias = s1 / n
    val sd = math.sqrt((n * s2 - s1 * s1) / (n * (n - 1.0)))
    def q4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(r.getAs[Long]("n_days") === d.length.toLong, "n")
    assert(math.abs(r.getAs[Double]("bias_cents") - q4(bias)) <= 2e-4)
    assert(math.abs(r.getAs[Double]("sd_cents") - q4(sd)) <= 2e-4)
    val (lo, hi) = (r.getAs[Double]("loa_lo"), r.getAs[Double]("loa_hi"))
    val outside = d.count(x => x.toDouble < lo || x.toDouble > hi)
    assert(r.getAs[Long]("n_outside") === outside.toLong, "outside count")
  }

  test("q375 kappa ladder matches a sequential contingency walk") {
    val r = SparkEntry.queries("q375_weighted_kappa")(spark, sf0001)
      .head()
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val n = docs.length
    def terciles(key: (Long, Long, Long) => (Long, Long)) = {
      val order = docs.sortBy(key.tupled)
      // NTILE(3): first buckets take the remainder (both engines)
      val base = n / 3; val rem = n % 3
      val sizes = (0 until 3).map(i => base + (if (i < rem) 1 else 0))
      val tiers = new Array[Int](n)
      var idx = 0
      sizes.zipWithIndex.foreach { case (sz, t) =>
        (0 until sz).foreach { _ =>
          tiers(docs.indexOf(order(idx))) = t + 1; idx += 1 }
      }
      tiers
    }
    val ra = terciles((id, nc, _) => (nc, id))
    val rb = terciles((id, _, tk) => (tk, id))
    val nij = Array.fill(4, 4)(0L)
    docs.indices.foreach(i => nij(ra(i))(rb(i)) += 1)
    val rr = (1 to 3).map(i => (1 to 3).map(j => nij(i)(j)).sum)
    val cc = (1 to 3).map(j => (1 to 3).map(i => nij(i)(j)).sum)
    val p0 = (1 to 3).map(i => nij(i)(i)).sum
    def pw(w: (Int, Int) => Long) =
      (for (i <- 1 to 3; j <- 1 to 3) yield nij(i)(j) * w(i, j)).sum
    def ew(w: (Int, Int) => Long) =
      (for (i <- 1 to 3; j <- 1 to 3)
        yield rr(i - 1) * cc(j - 1) * w(i, j)).sum
    val nl = n.toLong
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val kap = (nl * p0 - ew((i, j) => if (i == j) 1L else 0L)).toDouble /
      (nl * nl - ew((i, j) => if (i == j) 1L else 0L)).toDouble
    val kl = (nl * pw((i, j) => 2L - math.abs(i - j)) -
      ew((i, j) => 2L - math.abs(i - j))).toDouble /
      (2L * nl * nl - ew((i, j) => 2L - math.abs(i - j))).toDouble
    val kq = (nl * pw((i, j) => 4L - (i - j).toLong * (i - j)) -
      ew((i, j) => 4L - (i - j).toLong * (i - j))).toDouble /
      (4L * nl * nl - ew((i, j) => 4L - (i - j).toLong * (i - j)))
        .toDouble
    assert(r.getAs[Long]("n_docs") === nl, "n")
    assert(math.abs(r.getAs[Double]("kappa") - q6(kap)) < 1e-9, "kappa")
    assert(math.abs(r.getAs[Double]("kappa_lin") - q6(kl)) < 1e-9, "lin")
    assert(math.abs(r.getAs[Double]("kappa_quad") - q6(kq)) < 1e-9, "quad")
  }

  test("q376 HLL rollup matches a quarter-direct register walk") {
    // the query merges MONTHLY register censuses by max; this walk
    // builds each quarter's registers directly — equality IS the
    // lossless-union property of the register summary
    val out = SparkEntry.queries("q376_hll_rollup")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("quarter") -> r).toMap
    val rows = Tables.orders(spark, sf0001)
      .select(to_date(col("o_orderdate")).as("d"), col("o_custkey"))
      .collect().map { r =>
        val d = r.getDate(0).toLocalDate
        (d.getYear * 10L + ((d.getMonthValue - 1) / 3 + 1), r.getLong(1))
      }
    val mask = (1L << 40) - 1L
    rows.groupBy(_._1).foreach { case (qtr, g) =>
      val regs = Array.fill(256)(0L)
      g.foreach { case (_, k) =>
        val h = md5Hv48(k)
        val idx = (h >> 40).toInt
        val w = h & mask
        val rho = if (w == 0L) 41L
          else 41L - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > regs(idx)) regs(idx) = rho
      }
      val v = regs.count(_ == 0L)
      val sInt = regs.map(m => 1L << (41L - m).toInt).sum
      val alpha = 0.7213 / (1.0 + 1.079 / 256.0)
      val eRaw = alpha * 65536.0 * 2199023255552.0 / sInt.toDouble
      val est =
        if (eRaw <= 640.0 && v > 0) 256.0 * math.log(256.0 / v) else eRaw
      val exact = g.map(_._2).distinct.length
      val r = out(qtr)
      def q4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
      assert(r.getAs[Long]("n_exact") === exact.toLong, s"$qtr exact")
      assert(r.getAs[Long]("v_empty") === v.toLong, s"$qtr empty")
      assert(math.abs(r.getAs[Double]("hll_est") - q4(est)) < 1e-9,
        s"$qtr estimate")
    }
  }

  test("q377 burstiness matches a sequential token-census walk") {
    val out = SparkEntry.queries("q377_burstiness")(spark, sf0001)
      .collect().map(r => r.getAs[String]("term") -> r).toMap
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nDocs = docs.length
    val cf = scala.collection.mutable.Map[String, Long]()
    val df = scala.collection.mutable.Map[String, Long]()
    docs.foreach { case (_, text) =>
      val toks = text.split(" ", -1)
      toks.foreach(t => cf(t) = cf.getOrElse(t, 0L) + 1L)
      toks.distinct.foreach(t => df(t) = df.getOrElse(t, 0L) + 1L)
    }
    val top = cf.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
    assert(top.map(_._1).toSet === out.keySet, "top-20 term set")
    def q4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    top.foreach { case (t, c) =>
      val r = out(t)
      assert(r.getAs[Long]("cf") === c, s"$t cf")
      assert(r.getAs[Long]("df") === df(t), s"$t df")
      assert(math.abs(r.getAs[Double]("burstiness") -
        q4(c.toDouble / df(t))) < 1e-9, s"$t burstiness")
      val dfHat = q4(nDocs * (1.0 - math.exp(0.0 - c.toDouble / nDocs)))
      assert(math.abs(r.getAs[Double]("df_poisson") - dfHat) < 1e-9,
        s"$t poisson df")
      assert(math.abs(r.getAs[Double]("adaptation") -
        q4(df(t).toDouble / math.max(dfHat, 1e-300))) < 1e-9, s"$t adapt")
    }
  }

  test("q378 tau_AP matches a sequential top-weighted walk") {
    val r = SparkEntry.queries("q378_tau_ap")(spark, sf0001).head()
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val top = docs.sortBy { case (id, nc, _) => (-nc, id) }.take(50)
    val rt = top.zipWithIndex.map { case ((id, _, _), i) => id -> (i + 1L) }
      .toMap
    val rs = top.sortBy { case (id, _, tk) => (-tk, id) }.zipWithIndex
      .map { case ((id, _, _), i) => id -> (i + 1L) }.toMap
    val items = top.map { case (id, _, _) => (rs(id), rt(id)) }
    val n = items.length
    var nc = 0L
    items.foreach { case (rsa, rta) =>
      items.foreach { case (rsb, rtb) =>
        if (rsa < rsb && rta < rtb) nc += 1
      }
    }
    val npairs = n.toLong * (n - 1) / 2
    var s9 = 0L
    items.foreach { case (rsb, rtb) =>
      if (rsb >= 2) {
        val c = items.count { case (rsa, rta) => rsa < rsb && rta < rtb }
        s9 += math.floor(c.toDouble / (rsb - 1).toDouble * 1e9 + 0.5)
          .toLong
      }
    }
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val tau = 2.0 * (nc * 2L - npairs).toDouble /
      (n.toLong * (n - 1)).toDouble
    val tauAp = 2.0 / (n - 1).toDouble * (s9.toDouble / 1e9) - 1.0
    assert(r.getAs[Long]("n_items") === n.toLong)
    assert(math.abs(r.getAs[Double]("kendall_tau") - q6(tau)) < 1e-9)
    assert(math.abs(r.getAs[Double]("tau_ap") - q6(tauAp)) < 1e-9)
  }

  test("q379 records test matches a sequential running-extreme walk") {
    val out = SparkEntry.queries("q379_records_test")(spark, sf0001)
      .collect().map(r => r.getAs[String]("series") -> r).toMap
    val daily = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day").collect().map(_.getLong(1))
    val ma7 = daily.indices.drop(6)
      .map(i => daily.slice(i - 6, i + 1).sum).toArray
    def walk(series: String, xs: Array[Long]): Unit = {
      var mx = Long.MinValue; var mn = Long.MaxValue
      var up = 0L; var dn = 0L
      xs.foreach { v =>
        if (v > mx) { up += 1; mx = v }
        if (v < mn) { dn += 1; mn = v }
      }
      val n = xs.length
      val h1 = (1 to n).map(i => math.floor(1e12 / i.toDouble + 0.5)
        .toLong).sum
      val h2 = (1 to n).map(i =>
        math.floor(1e12 / (i.toLong * i).toDouble + 0.5).toLong).sum
      val hn = h1.toDouble / 1e12
      val h2n = h2.toDouble / 1e12
      val z = (up.toDouble - hn) / math.max(math.sqrt(hn - h2n), 1e-300)
      def q4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
      val r = out(series)
      assert(r.getAs[Long]("n_days") === n.toLong, s"$series n")
      assert(r.getAs[Long]("rec_up") === up, s"$series up")
      assert(r.getAs[Long]("rec_dn") === dn, s"$series down")
      assert(math.abs(r.getAs[Double]("e_records") - q4(hn)) < 1e-9,
        s"$series H_n")
      assert(math.abs(r.getAs[Double]("z_up") - q4(z)) < 1e-9,
        s"$series z")
    }
    walk("raw", daily)
    walk("ma7", ma7)
  }

  test("q380 Kish n_eff matches a sequential weight walk") {
    val out = SparkEntry.queries("q380_kish_neff")(spark, sf0001)
      .collect().map(r => r.getAs[String]("segment") -> r).toMap
    val rows = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.groupBy(_._1).foreach { case (seg, g) =>
      val n = g.length
      val sw = g.map(x => BigDecimal(x._2)).sum
      val sw2 = g.map(x => BigDecimal(x._2) * BigDecimal(x._2)).sum
      val neff = sw.toDouble * sw.toDouble /
        math.max(sw2.toDouble, 1e-300)
      val deff = n.toDouble * sw2.toDouble /
        math.max(sw.toDouble * sw.toDouble, 1e-300)
      def q4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
      val r = out(seg)
      assert(r.getAs[Long]("n") === n.toLong, s"$seg n")
      assert(math.abs(r.getAs[Double]("n_eff") - q4(neff)) <= 2e-4,
        s"$seg n_eff")
      assert(math.abs(r.getAs[Double]("deff") - q4(deff)) <= 2e-4,
        s"$seg deff")
    }
  }

  test("q381 Hosmer-Lemeshow matches a sequential decile walk") {
    val r = SparkEntry.queries("q381_hosmer_lemeshow")(spark, sf0001)
      .head()
    val lens = Tables.documents(spark, sf0001)
      .groupBy(col("n_chars").as("sc"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("source") === "src0", 1L).otherwise(0L)).as("pos"))
      .orderBy("sc").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val (mn, mx) = (lens.map(_._1).min, lens.map(_._1).max)
    val nt = lens.map(_._2).sum
    var cumb = 0L
    val groups = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    lens.foreach { case (sc, n, pos) =>
      val dec = (cumb * 10) / nt
      val phat = if (mx - mn > 0) (sc - mn).toDouble / (mx - mn) else 0.0
      val pq = n * math.floor(phat * 1e9 + 0.5).toLong
      val (gn, go, ge) = groups.getOrElse(dec, (0L, 0L, 0L))
      groups(dec) = (gn + n, go + pos, ge + pq)
      cumb += n
    }
    var s12 = 0L
    groups.values.foreach { case (ng, og, eg9) =>
      if (eg9 > 0L && eg9 < ng * 1000000000L) {
        val eg = eg9.toDouble / 1e9
        val pbar = eg / ng.toDouble
        s12 += math.floor((og.toDouble - eg) * (og.toDouble - eg) /
          (ng.toDouble * pbar * (1.0 - pbar)) * 1e12 + 0.5).toLong
      }
    }
    def q4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(r.getAs[Long]("n_docs") === nt, "n docs")
    assert(r.getAs[Long]("n_groups") === groups.size.toLong, "groups")
    assert(math.abs(r.getAs[Double]("hl_stat") -
      q4(s12.toDouble / 1e12)) < 1e-9, "HL statistic")
  }

  test("q382 pinball loss matches a sequential forecast walk") {
    val out = SparkEntry.queries("q382_pinball")(spark, sf0001)
      .collect().map(r => r.getAs[Double]("tau") -> r).toMap
    val rev = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .orderBy("day").collect().map(_.getLong(1))
    Seq(1L, 5L, 9L).foreach { k =>
      var se = BigInt(0); var sp = BigInt(0); var n = 0L
      (28 until rev.length).foreach { i =>
        val w = rev.slice(i - 28, i).sorted
        val idx = ((27 * k) / 10).toInt
        val m = 27 * k % 10
        val q10 = w(idx) * 10L + (w(idx + 1) - w(idx)) * m
        val y10 = rev(i) * 10L
        val ue = y10 - q10
        val up = (rev(i) - rev(i - 1)) * 10L
        se += BigInt(math.max(k * ue, (k - 10) * ue))
        sp += BigInt(math.max(k * up, (k - 10) * up))
        n += 1
      }
      def q4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
      val r = out(k.toDouble / 10.0)
      assert(r.getAs[Long]("n_days") === n, s"k=$k n")
      assert(math.abs(r.getAs[Double]("pinball_quantile") -
        q4(se.toDouble / (100.0 * n))) < 1e-9, s"k=$k quantile loss")
      assert(math.abs(r.getAs[Double]("pinball_persist") -
        q4(sp.toDouble / (100.0 * n))) < 1e-9, s"k=$k persist loss")
    }
  }

  test("q383 WAV census matches an independent JVM byte-builder walk") {
    val out = SparkEntry.queries("q383_wav_header")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("sample_rate") -> r).toMap
    val ids = Tables.documents(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0))
    val rates = Array(8000L, 16000L, 22050L, 44100L, 48000L)
    // independent construction: ByteBuffer little-endian, then a
    // field-by-field parse of the raw bytes (not the hex-text path)
    case class F(rate: Long, ch: Long, frames: Long, dsize: Long,
      valid: Boolean)
    val files = ids.map { id =>
      val rate = rates((id % 5).toInt)
      val ch = 1L + id % 2
      val frames = 100L + id % 900
      val dsize = frames * ch * 2
      val bb = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("ASCII")).putInt((dsize + 36).toInt)
        .put("WAVE".getBytes("ASCII")).put("fmt ".getBytes("ASCII"))
        .putInt(16).putShort(1).putShort(ch.toShort)
        .putInt(rate.toInt).putInt((rate * ch * 2).toInt)
        .putShort((ch * 2).toShort).putShort(16)
        .put("data".getBytes("ASCII")).putInt(dsize.toInt)
      val a = bb.array()
      val rb = java.nio.ByteBuffer.wrap(a)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def s4(off: Int) = new String(a, off, 4, "ASCII")
      val pch = rb.getShort(22).toLong
      val prate = rb.getInt(24).toLong
      val pbr = rb.getInt(28).toLong
      val pblk = rb.getShort(32).toLong
      val pbits = rb.getShort(34).toLong
      val pds = rb.getInt(40).toLong
      val ok = s4(0) == "RIFF" && s4(8) == "WAVE" && s4(12) == "fmt " &&
        s4(36) == "data" && rb.getShort(20) == 1 &&
        pbr == prate * pch * pbits / 8 && pblk == pch * pbits / 8 &&
        rb.getInt(4).toLong == pds + 36
      F(prate, pch, pds / (pch * 2), pds, ok)
    }
    files.groupBy(_.rate).foreach { case (rate, fs) =>
      val r = out(rate)
      assert(r.getAs[Long]("n_files") === fs.length.toLong, s"$rate n")
      assert(r.getAs[Long]("n_stereo") === fs.count(_.ch == 2).toLong)
      assert(r.getAs[Long]("n_valid") === fs.count(_.valid).toLong)
      assert(r.getAs[Long]("total_frames") === fs.map(_.frames).sum)
      assert(r.getAs[Long]("total_dur_us") ===
        fs.map(f => f.frames * 1000000L / rate).sum, s"$rate dur")
      assert(r.getAs[Long]("total_data_bytes") === fs.map(_.dsize).sum)
    }
  }

  test("q384 weighted log-rank matches a sequential hour-census walk") {
    val out = SparkEntry.queries("q384_weighted_logrank")(spark, sf0001)
      .collect().map(r => r.getAs[String]("method") -> r).toMap
    val e = Tables.events(spark, sf0001).filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("f"),
        max(unix_micros(col("ts"))).as("l"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val endUs = e.map(_._3).max
    val lives = e.map { case (u, f, l) =>
      ((l - f) / 3600000000L, l <= endUs - 12L * 3600L * 1000000L, u % 2)
    }
    val nu0 = lives.count(_._3 == 0).toLong
    val nu1 = lives.count(_._3 == 1).toLong
    val bigN = (nu0 + nu1).toDouble
    val byT = lives.groupBy(_._1).toSeq.sortBy(_._1)
    var (r0, r1) = (nu0, nu1)
    val sums = scala.collection.mutable.Map(
      "logrank" -> (0L, 0L), "gehan" -> (0L, 0L), "tarone_ware" -> (0L, 0L))
    byT.foreach { case (_, grp) =>
      val d1 = grp.count(g => g._2 && g._3 == 0).toLong
      val d2 = grp.count(g => g._2 && g._3 == 1).toLong
      val (n1r, n2r) = (r0, r1)
      if (d1 + d2 > 0) {
        val n = (n1r + n2r).toDouble
        val d = (d1 + d2).toDouble
        val p1 = n1r / n
        Seq("logrank", "gehan", "tarone_ware").foreach { m =>
          val w = m match {
            case "logrank" => 1.0
            case "gehan" => n / bigN
            case _ => math.sqrt(n / bigN)
          }
          val nq = math.floor(w * (d1 - d * p1) * 1e6 + 0.5).toLong
          val vq = if (n1r + n2r > 1)
            math.floor(w * w * d * p1 * (1.0 - p1) * (n - d) / (n - 1.0) *
              1e6 + 0.5).toLong
          else 0L
          val (a, b) = sums(m)
          sums(m) = (a + nq, b + vq)
        }
      }
      r0 -= grp.count(_._3 == 0)
      r1 -= grp.count(_._3 == 1)
    }
    sums.foreach { case (m, (numq, varq)) =>
      val z = math.floor(numq / 1e6 /
        math.sqrt(math.max(varq / 1e6, 1e-300)) * 1e4 + 0.5) / 1e4
      assert(math.abs(out(m).getAs[Double]("z") - z) < 1e-9, s"$m z")
    }
  }

  test("q385 Siegel-Tukey matches a sequential alternating-rank walk") {
    val row = SparkEntry.queries("q385_siegel_tukey")(spark, sf0001).head()
    val rows = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("c"),
        (col("o_orderpriority") === "1-URGENT").as("g1"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1)
    val n = rows.length
    // textbook alternating-extremes rank for bottom position i (1-based)
    def st(i: Int): Long = {
      if (i <= (n + 1) / 2) { if (i % 2 == 1) 2L * i - 1 else 2L * i }
      else { val j = n - i + 1; if (j % 2 == 1) 2L * j else 2L * j - 1 }
    }
    // tied runs: the query's quantized average-rank convention
    var i = 0
    var w1q6 = BigInt(0)
    var n1t = 0L
    var tie = BigInt(0)
    while (i < n) {
      var j = i
      while (j + 1 < n && rows(j + 1)._1 == rows(i)._1) j += 1
      val t = (j - i + 1).toLong
      val sr = (i + 1 to j + 1).map(k => st(k)).sum
      val aq = math.floor(sr.toDouble * 1e6 / t + 0.5).toLong
      val n1 = rows.slice(i, j + 1).count(_._2).toLong
      w1q6 += BigInt(n1) * BigInt(aq)
      n1t += n1
      tie += BigInt(t) * t * t - t
      i = j + 1
    }
    val n2t = n - n1t
    val w1 = w1q6.toDouble / 1e6
    val mean = n1t * (n + 1.0) / 2.0
    val varW = n1t.toDouble * n2t / 12.0 *
      ((n + 1.0) - tie.toDouble / (n.toDouble * (n - 1.0)))
    val z = math.floor((w1 - mean) / math.sqrt(varW) * 1e4 + 0.5) / 1e4
    assert(row.getAs[Long]("n_urgent") === n1t)
    assert(math.abs(row.getAs[Double]("w1_st") -
      (math.floor(w1 * 1e4 + 0.5) / 1e4)) < 1e-9, "W1")
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-9, "z")
  }

  test("q388 Page-Hinkley matches a sequential integer cumulative walk") {
    val row = SparkEntry.queries("q388_page_hinkley")(spark, sf0001).head()
    val d = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .collect().map(r => (r.getDate(0), r.getLong(1))).sortBy(_._1.getTime)
    val nn = d.length.toLong
    val tt = d.map(_._2).sum
    val dd = tt / 20
    var cum = BigInt(0)
    var t = 0L
    var minS = BigInt(Long.MaxValue) * 1000000
    var mx = BigInt(Long.MinValue)
    var mxDay: java.sql.Date = null
    d.foreach { case (day, rev) =>
      cum += rev; t += 1
      val s = BigInt(nn) * cum - BigInt(t) * (BigInt(tt) + dd)
      if (s < minS) minS = s
      val ph = s - minS
      if (ph > mx || (ph == mx && (mxDay == null || day.after(mxDay)))) {
        mx = ph; mxDay = day
      }
    }
    val phm = math.floor(mx.toDouble / tt.toDouble * 1e6 + 0.5) / 1e6
    assert(row.getAs[Long]("n_days") === nn)
    assert(row.getAs[java.sql.Date]("change_day") === mxDay)
    assert(math.abs(row.getAs[Double]("ph_max_mean_units") - phm) < 1e-9)
  }

  test("q389 Theil U matches a sequential moment walk") {
    val row = SparkEntry.queries("q389_theil_u")(spark, sf0001).head()
    val d = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .collect().map(r => (r.getDate(0), r.getLong(1))).sortBy(_._1.getTime)
    val revs = d.map(_._2)
    val recs = (7 until revs.length).map { k =>
      val fc = revs.slice(k - 7, k).sum / 7
      (fc, revs(k), revs(k - 1))
    }
    val n = recs.length.toDouble
    def bsum(f: ((Long, Long, Long)) => BigInt): BigInt =
      recs.map(f).foldLeft(BigInt(0))(_ + _)
    val sf = bsum(r => BigInt(r._1)); val sa = bsum(r => BigInt(r._2))
    val sff = bsum(r => BigInt(r._1) * r._1)
    val saa = bsum(r => BigInt(r._2) * r._2)
    val se2 = bsum(r => BigInt(r._1 - r._2) * (r._1 - r._2))
    val sp2 = bsum(r => BigInt(r._3 - r._2) * (r._3 - r._2))
    val mse = se2.toDouble / n
    val u1 = math.sqrt(mse) /
      (math.sqrt(saa.toDouble / n) + math.sqrt(sff.toDouble / n))
    val u2 = math.sqrt(se2.toDouble / sp2.toDouble)
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(row.getAs[Long]("n_days") === recs.length.toLong)
    assert(math.abs(row.getAs[Double]("u1") - q6(u1)) < 1e-9, "u1")
    assert(math.abs(row.getAs[Double]("u2") - q6(u2)) < 1e-9, "u2")
    val mf = sf.toDouble / n; val ma = sa.toDouble / n
    val sdf = math.sqrt(math.max(sff.toDouble / n - mf * mf, 0.0))
    val sda = math.sqrt(math.max(saa.toDouble / n - ma * ma, 0.0))
    assert(math.abs(row.getAs[Double]("um_bias") -
      q6((mf - ma) * (mf - ma) / mse)) < 1e-9, "um")
    assert(math.abs(row.getAs[Double]("us_variance") -
      q6((sdf - sda) * (sdf - sda) / mse)) < 1e-9, "us")
  }

  test("q392/q393 VaR backtests match a sequential breach walk") {
    val kup = SparkEntry.queries("q392_kupiec_pof")(spark, sf0001).head()
    val chr = SparkEntry.queries("q393_christoffersen")(spark, sf0001).head()
    val d = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .collect().map(r => (r.getDate(0), r.getLong(1))).sortBy(_._1.getTime)
    val revs = d.map(_._2)
    val breaches = (100 until revs.length).map { k =>
      val window = revs.slice(k - 100, k).sorted
      if (revs(k) < window(4)) 1 else 0  // 5th smallest, 1-based index 5
    }
    val n = breaches.length
    val x = breaches.sum
    assert(kup.getAs[Long]("n_days") === n.toLong, "n")
    assert(kup.getAs[Long]("n_breach") === x.toLong, "x")
    val rate = x.toDouble / n
    val lr = -2.0 * ((n - x) * math.log(0.95) + x * math.log(0.05) -
      (if (x == 0) 0.0 else x * math.log(rate)) -
      (if (x == n) 0.0 else (n - x) * math.log(1.0 - rate)))
    def q4(v: Double) = math.floor(v * 1e4 + 0.5) / 1e4
    assert(math.abs(kup.getAs[Double]("lr_pof") - q4(lr)) < 1e-9, "lr_pof")
    // transitions
    val tr = breaches.zip(breaches.tail)
    val n00 = tr.count(t => t._1 == 0 && t._2 == 0).toLong
    val n01 = tr.count(t => t._1 == 0 && t._2 == 1).toLong
    val n10 = tr.count(t => t._1 == 1 && t._2 == 0).toLong
    val n11 = tr.count(t => t._1 == 1 && t._2 == 1).toLong
    assert(chr.getAs[Long]("n00") === n00 && chr.getAs[Long]("n01") === n01
      && chr.getAs[Long]("n10") === n10 && chr.getAs[Long]("n11") === n11)
    val nt = (n00 + n01 + n10 + n11).toDouble
    val pi = (n01 + n11) / nt
    val pi0 = n01.toDouble / math.max(n00 + n01, 1).toDouble
    val pi1 = n11.toDouble / math.max(n10 + n11, 1).toDouble
    def term(c: Long, p: Double) = if (c == 0) 0.0 else c * math.log(p)
    val lrInd = -2.0 * ((term(n00 + n10, 1.0 - pi) + term(n01 + n11, pi)) -
      (term(n00, 1.0 - pi0) + term(n01, pi0) +
        term(n10, 1.0 - pi1) + term(n11, pi1)))
    assert(math.abs(chr.getAs[Double]("lr_ind") - q4(lrInd)) < 1e-9, "lr_ind")
  }

  test("q395 Youden J matches a sequential threshold sweep") {
    val row = SparkEntry.queries("q395_youden_j")(spark, sf0001).head()
    val base = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
        floor(col("c_acctbal") * 100 + 0.5).cast("long").as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cents = base.map(_._1).sorted
    val nB = cents.length
    val med = if (nB % 2 == 1) cents(nB / 2).toDouble
      else (cents(nB / 2 - 1) + cents(nB / 2)) / 2.0
    val labeled = base.map { case (c, sc) => (sc, if (c > med) 1L else 0L) }
    val post = labeled.count(_._2 == 1L).toLong
    val negt = nB - post
    // sweep every distinct threshold: classify score >= thr as positive
    val thrs = labeled.map(_._1).distinct.sorted
    var best = (BigInt(Long.MinValue), Long.MinValue, 0L, 0L)
    thrs.foreach { thr =>
      val gep = labeled.count(t => t._1 >= thr && t._2 == 1L).toLong
      val gen = labeled.count(t => t._1 >= thr && t._2 == 0L).toLong
      val num = BigInt(gep) * negt - BigInt(gen) * post
      if (num > best._1 || (num == best._1 && thr > best._2))
        best = (num, thr, gep, gen)
    }
    assert(row.getAs[Long]("n_pos") === post)
    assert(math.abs(row.getAs[Double]("threshold_dollars") -
      best._2 / 100.0) < 1e-9, "threshold")
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(math.abs(row.getAs[Double]("youden_j") -
      q6(best._1.toDouble / (post.toDouble * negt))) < 1e-9, "J")
  }

  test("q391 Levene mean-centered W matches a sequential group walk") {
    val rows = SparkEntry.queries("q391_levene_mean")(spark, sf0001)
      .collect()
    val data = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        floor(col("o_totalprice") + 0.5).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = data.groupBy(_._1).map { case (g, xs) =>
      val vs = xs.map(_._2)
      val mean = vs.sum.toDouble / vs.length
      g -> vs.map(v => math.floor(math.abs(v - mean) + 0.5).toLong)
    }
    val zq = groups.values.flatten.toSeq
    val nt = zq.length.toDouble
    val sv = groups.values.map { z =>
      val s = z.sum
      math.floor(s.toDouble * s / z.length + 0.5).toLong
    }.sum
    val st = zq.sum
    val grand = math.floor(st.toDouble * st / nt + 0.5).toLong
    val qt = zq.map(z => z * z).sum
    val f = ((sv - grand).toDouble / 4.0) / ((qt - sv).toDouble / (nt - 5.0))
    val w = rows.head.getAs[Double]("levene_stat")
    assert(math.abs(w - math.floor(f * 1e4 + 0.5) / 1e4) < 1e-9
      || math.abs(w - (math.rint(f * 1e4) / 1e4)) < 1e-9, s"W $w vs $f")
  }

  test("q396 info-gain split matches a sequential threshold sweep") {
    val row = SparkEntry.queries("q396_info_gain")(spark, sf0001).head()
    val base = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
        floor(col("c_acctbal") * 100 + 0.5).cast("long").as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cents = base.map(_._1).sorted
    val nB = cents.length
    val med = if (nB % 2 == 1) cents(nB / 2).toDouble
      else (cents(nB / 2 - 1) + cents(nB / 2)) / 2.0
    val labeled = base.map { case (c, sc) => (sc, if (c > med) 1L else 0L) }
    val post = labeled.count(_._2 == 1L)
    val negt = nB - post
    def plogp(a: Long, n: Long): Double =
      if (a == 0 || n == 0) 0.0
      else { val p = a.toDouble / n; -p * math.log(p) }
    val hPar = plogp(post, nB) + plogp(negt, nB)
    var best = (Long.MinValue, Long.MinValue)
    labeled.map(_._1).distinct.sorted.foreach { thr =>
      val gep = labeled.count(t => t._1 >= thr && t._2 == 1L).toLong
      val gen = labeled.count(t => t._1 >= thr && t._2 == 0L).toLong
      val (ltp, ltn) = (post - gep, negt - gen)
      val (nGe, nLt) = (gep + gen, ltp + ltn)
      val ig = hPar -
        nGe.toDouble / nB * (plogp(gep, nGe) + plogp(gen, nGe)) -
        nLt.toDouble / nB * (plogp(ltp, nLt) + plogp(ltn, nLt))
      val igq = math.floor(ig * 1e12 + 0.5).toLong
      if (igq > best._1 || (igq == best._1 && thr > best._2))
        best = (igq, thr)
    }
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(math.abs(row.getAs[Double]("threshold_dollars") -
      best._2 / 100.0) < 1e-9, "threshold")
    assert(math.abs(row.getAs[Double]("info_gain") -
      q6(best._1 / 1e12)) < 1e-9, "IG")
    assert(math.abs(row.getAs[Double]("parent_entropy") - q6(hPar)) < 1e-9)
  }

  test("q397 CUSUM-of-squares matches a sequential BigInt walk") {
    val row = SparkEntry.queries("q397_cusum_squares")(spark, sf0001).head()
    val d = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .collect().map(r => (r.getDate(0), r.getLong(1))).sortBy(_._1.getTime)
    val nn = d.length
    val qq = d.map(x => BigInt(x._2) * x._2).sum
    var cum = BigInt(0)
    var mx = BigInt(-1)
    var mxDay: java.sql.Date = null
    d.zipWithIndex.foreach { case ((day, rev), i) =>
      cum += BigInt(rev) * rev
      val dev = (BigInt(nn) * cum - BigInt(i + 1) * qq).abs
      if (dev > mx || (dev == mx && day.after(mxDay))) { mx = dev; mxDay = day }
    }
    val sup = mx.toDouble / (nn.toDouble * qq.toDouble)
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    def q4(v: Double) = math.floor(v * 1e4 + 0.5) / 1e4
    assert(row.getAs[Long]("n_days") === nn.toLong)
    assert(row.getAs[java.sql.Date]("break_day") === mxDay)
    assert(math.abs(row.getAs[Double]("sup_deviation") - q6(sup)) < 1e-9)
    assert(math.abs(row.getAs[Double]("bde_stat") -
      q4(math.sqrt(nn / 2.0) * sup)) < 1e-9)
  }

  test("q400 Cramér-von Mises matches a sequential ECDF walk") {
    val row = SparkEntry.queries("q400_cvm_two_sample")(spark, sf0001).head()
    val cut = java.sql.Timestamp.valueOf("1999-01-01 00:00:00")
    val rows = Tables.orders(spark, sf0001)
      .select(expr("cast(round(o_totalprice * 100) as bigint)").as("pc"),
        (col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .as("is_new"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val census = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (pc, g) => (pc, g.length.toLong,
        g.count(!_._2).toLong) }
    val nn = rows.length.toLong
    val nx = rows.count(!_._2).toLong
    val ny = nn - nx
    var (cumAll, cumX) = (0L, 0L)
    var tq = 0L
    census.foreach { case (_, l, cx) =>
      cumAll += l; cumX += cx
      val cumY = cumAll - cumX
      // exact cross-multiplied integer numerator, then ONE double
      // chain nano-quantized — the engine's own grid, replayed
      val num = (BigInt(cumX) * ny - BigInt(cumY) * nx).toDouble
      val nd = math.max(nx.toDouble * ny.toDouble, 1e-300)
      tq += math.floor(l.toDouble * (num / nd) * (num / nd) * 1e9 + 0.5)
        .toLong
    }
    val t = nx.toDouble * ny.toDouble / (nn.toDouble * nn.toDouble) *
      (tq.toDouble / 1e9)
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(row.getAs[Long]("n_base") === nx)
    assert(row.getAs[Long]("n_new") === ny)
    assert(math.abs(row.getAs[Double]("t_cvm") - q6(t)) < 1e-9)
    assert(row.getAs[Long]("reject_5pct") ===
      (if (q6(t) > 0.461) 1L else 0L))
  }

  test("q401 MinHash panel matches a sequential md5 fold per pair") {
    val out = SparkEntry.queries("q401_minhash_panel")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).distinct.toSeq))
      .sortBy(_._1)
    val md = java.security.MessageDigest.getInstance("MD5")
    def mh48(i: Int, t: String): Long = {
      val hex = md.digest(s"mh$i:$t".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    val byId = docs.map(d => d._1 -> d).toMap
    case class P(lang: String, eq: Long, jq: Long, inband: Long)
    val pairs = docs.flatMap { case (a, lang, ta) =>
      byId.get(a + 1).filter(_._2 == lang).map { case (_, _, tb) =>
        val m16 = (0 until 16).count { i =>
          ta.map(mh48(i, _)).min == tb.map(mh48(i, _)).min }
        val inter = ta.toSet.intersect(tb.toSet).size.toLong
        val union = math.max(ta.size + tb.size - inter, 1L).toDouble
        val jq = math.floor(inter / union * 1e6 + 0.5).toLong
        val eq = m16 * 62500L
        val j = jq.toDouble / 1e6
        val band = math.floor(2e6 * math.sqrt(j * (1 - j) / 16.0) +
          31250.0 + 0.5).toLong
        P(lang, eq, jq, if (math.abs(eq - jq) <= band) 1L else 0L)
      }
    }
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    pairs.groupBy(_.lang).foreach { case (lang, ps) =>
      val r = out(lang)
      val n = ps.length.toDouble
      assert(r.getAs[Long]("n_pairs") === ps.length.toLong, s"n $lang")
      assert(math.abs(r.getAs[Double]("mean_est") -
        q6(ps.map(_.eq).sum / 1e6 / n)) < 1e-9, s"est $lang")
      assert(math.abs(r.getAs[Double]("mean_exact") -
        q6(ps.map(_.jq).sum / 1e6 / n)) < 1e-9, s"exact $lang")
      assert(math.abs(r.getAs[Double]("mae") -
        q6(ps.map(p => math.abs(p.eq - p.jq)).sum / 1e6 / n)) < 1e-9,
        s"mae $lang")
      assert(math.abs(r.getAs[Double]("within_2sigma") -
        q6(ps.map(_.inband).sum / n)) < 1e-9, s"band $lang")
    }
    assert(out.keySet === pairs.map(_.lang).toSet)
  }

  private def recentDaily365: Array[(Long, Long, Long)] = {
    val d = Tables.orders(spark, sf0001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"),
        count(lit(1)).as("cnt"))
      .select(datediff(col("day"), lit("1995-01-01")).cast("long").as("t"),
        col("rev"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val tmax = d.map(_._1).max
    d.filter(_._1 > tmax - 365).sortBy(_._1)
  }

  test("q403 Hoeffding's D matches a sequential O(n^2) dominance walk") {
    val row = SparkEntry.queries("q403_hoeffding_d")(spark, sf0001).head()
    val pts = recentDaily365
    val n = pts.length
    // the pinned lexicographic (value, day) jitter ranks
    val rByT = pts.sortBy(p => (p._2, p._1)).zipWithIndex
      .map { case (p, i) => p._1 -> (i + 1L) }.toMap
    val sByT = pts.sortBy(p => (p._3, p._1)).zipWithIndex
      .map { case (p, i) => p._1 -> (i + 1L) }.toMap
    var (d1, d2, d3) = (BigInt(0), BigInt(0), BigInt(0))
    pts.foreach { p =>
      val (r, s) = (rByT(p._1), sByT(p._1))
      val q = pts.count(o => rByT(o._1) < r && sByT(o._1) < s).toLong
      d1 += BigInt(q) * (q - 1)
      d2 += BigInt((r - 1) * (r - 2)) * ((s - 1) * (s - 2))
      d3 += BigInt((r - 2) * (s - 2)) * q
    }
    val nd = n.toDouble
    val dStat = 30.0 * ((nd - 2) * (nd - 3) * d1.toDouble + d2.toDouble -
      2.0 * (nd - 2) * d3.toDouble) /
      (nd * (nd - 1) * (nd - 2) * (nd - 3) * (nd - 4))
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(row.getAs[Long]("n_days") === n.toLong)
    assert(row.getAs[Long]("d1") === d1.toLong)
    assert(row.getAs[Long]("d2") === d2.toLong)
    assert(row.getAs[Long]("d3") === d3.toLong)
    assert(math.abs(row.getAs[Double]("hoeffding_d") - q6(dStat)) < 1e-9)
  }

  test("q404 Blomqvist beta matches a sequential quadrant count") {
    val row = SparkEntry.queries("q404_blomqvist_beta")(spark, sf0001).head()
    val pts = recentDaily365
    def med(v: Seq[Long]): Double = {
      val s = v.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2).toDouble
      else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val (mx, my) = (med(pts.map(_._2).toSeq), med(pts.map(_._3).toSeq))
    val pp = pts.count(p => p._2 > mx && p._3 > my).toLong
    val mm = pts.count(p => p._2 < mx && p._3 < my).toLong
    val pm = pts.count(p => p._2 > mx && p._3 < my).toLong
    val mp = pts.count(p => p._2 < mx && p._3 > my).toLong
    val kept = pp + mm + pm + mp
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(row.getAs[Long]("n_days") === pts.length.toLong)
    assert((row.getAs[Long]("n_pp"), row.getAs[Long]("n_mm"),
      row.getAs[Long]("n_pm"), row.getAs[Long]("n_mp")) ===
      ((pp, mm, pm, mp)))
    assert(row.getAs[Long]("n_on_median") === pts.length - kept)
    assert(math.abs(row.getAs[Double]("blomqvist_beta") -
      q6((pp + mm - pm - mp).toDouble / kept)) < 1e-9)
  }

  test("q407 Rayleigh matches a sequential per-order resultant walk " +
      "(unquantized reference, grid slack)") {
    val rows = SparkEntry.queries("q407_rayleigh")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("order_year") -> r).toMap
    val orders = Tables.orders(spark, sf0001)
      .select(year(col("o_orderdate")).cast("long"),
        dayofyear(col("o_orderdate")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    orders.groupBy(_._1).foreach { case (yr, os) =>
      // the INDEPENDENT reference: raw per-order cos/sin, no census,
      // no nano grid — the quantized pipeline must land within grid
      // slack (<= 0.5e-9 per distinct angle, ~366 of them)
      val n = os.length
      var (cs, sn) = (0.0, 0.0)
      os.foreach { case (_, doy) =>
        val a = 2.0 * math.Pi * (doy - 1).toDouble / 365.0
        cs += math.cos(a); sn += math.sin(a)
      }
      val rbar = math.sqrt(cs * cs + sn * sn) / n
      val z = n * rbar * rbar
      val aDay = math.atan2(sn, cs) / (2.0 * math.Pi) * 365.0
      val mDay = (if (aDay < 0) aDay + 365.0 else aDay) + 1.0
      val r = rows(yr)
      assert(r.getAs[Long]("n_orders") === n.toLong)
      assert(math.abs(r.getAs[Double]("rbar") - rbar) < 1e-5,
        s"rbar yr=$yr")
      assert(math.abs(r.getAs[Double]("rayleigh_z") - z) < 1e-3 +
        z * 1e-6, s"z yr=$yr")
      // mean direction is unstable when rbar ~ 0; the fixture years
      // are near-uniform, so allow the day slack that d(theta)/d(C,S)
      // implies at the measured resultant length
      val daySlack = 1e-4 * 365.0 / (2.0 * math.Pi) /
        math.max(rbar, 1e-6) * 1e-2 + 1e-3
      assert(math.abs(r.getAs[Double]("mean_day") - mDay) < daySlack,
        s"mean_day yr=$yr: ${r.getAs[Double]("mean_day")} vs $mDay")
    }
  }

  test("q408 von Mises kappa matches a sequential reference through " +
      "the same three-branch inverse") {
    val rows = SparkEntry.queries("q408_von_mises_kappa")(spark, sf0001)
      .collect().map(r => r.getAs[String]("o_orderpriority") -> r).toMap
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_orderpriority"),
        pmod(datediff(col("o_orderdate"), lit("1995-01-01")), lit(7))
          .cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    orders.groupBy(_._1).foreach { case (pr, os) =>
      val n = os.length
      var (cs, sn) = (0.0, 0.0)
      os.foreach { case (_, dow) =>
        val a = 2.0 * math.Pi * dow.toDouble / 7.0
        cs += math.cos(a); sn += math.sin(a)
      }
      val rbar = math.sqrt(cs * cs + sn * sn) / n
      val kappa =
        if (rbar < 0.53) 2.0 * rbar + rbar * rbar * rbar +
          5.0 * math.pow(rbar, 5) / 6.0
        else if (rbar < 0.85) -0.4 + 1.39 * rbar + 0.43 / (1.0 - rbar)
        else 1.0 / (rbar * rbar * rbar - 4.0 * rbar * rbar + 3.0 * rbar)
      val r = rows(pr)
      assert(r.getAs[Long]("n_orders") === n.toLong)
      assert(math.abs(r.getAs[Double]("rbar") - rbar) < 1e-5)
      assert(math.abs(r.getAs[Double]("circ_var") - (1.0 - rbar)) < 1e-5)
      assert(math.abs(r.getAs[Double]("kappa") - kappa) < 1e-3,
        s"kappa $pr: ${r.getAs[Double]("kappa")} vs $kappa")
    }
  }

  test("q409 Quade F matches a sequential blocked-rank walk") {
    val rows = SparkEntry.queries("q409_quade")(spark, sf0001)
      .collect().map(r => r.getAs[String]("o_orderpriority") -> r).toMap
    val cells = Tables.orders(spark, sf0001)
      .groupBy(trunc(col("o_orderdate"), "month").as("mon"),
        col("o_orderpriority").as("pr"))
      .agg(sum(floor(col("o_totalprice") + 0.5).cast("long")).as("rev"))
      .collect().map(r => (r.getDate(0).toString, r.getString(1),
        r.getLong(2)))
    val byMon = cells.groupBy(_._1).filter(_._2.length == 5)
    // doubled within-block midranks
    def mid2(vs: Seq[Long]): Map[Long, Long] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val below = sorted.count(_ < v)
        val ties = sorted.count(_ == v)
        v -> (2L * (below + 1) + ties - 1)
      }.toMap
    }
    val ranges = byMon.map { case (m, cs) =>
      m -> (cs.map(_._3).max - cs.map(_._3).min) }
    val q2 = {
      val ds = ranges.values.toSeq.sorted
      ranges.map { case (m, d) =>
        val below = ds.count(_ < d)
        val ties = ds.count(_ == d)
        m -> (2L * (below + 1) + ties - 1)
      }
    }
    val s4 = byMon.toSeq.flatMap { case (m, cs) =>
      val r2 = mid2(cs.map(_._3))
      cs.map { case (_, pr, rev) => (pr, q2(m) * (r2(rev) - 6L)) }
    }
    val b = byMon.size.toLong
    val a16 = s4.map(x => x._2 * x._2).sum
    val s4j = s4.groupBy(_._1).map { case (pr, xs) => pr -> xs.map(_._2).sum }
    val b16 = s4j.values.map(x => x * x).sum
    val f = (b - 1).toDouble * b16 / (b.toDouble * a16 - b16)
    s4j.foreach { case (pr, sj) =>
      val r = rows(pr)
      assert(r.getAs[Long]("n_blocks") === b)
      assert(r.getAs[Long]("s4_j") === sj, s"S4_j $pr")
      assert(math.abs(r.getAs[Double]("quade_f") -
        math.round(f * 1e4) / 1e4.toDouble) < 1e-9, s"F $pr")
    }
  }

  test("q410 Cuzick z matches a sequential pooled-rank trend walk") {
    val rows = SparkEntry.queries("q410_cuzick_trend")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("priority_level") -> r).toMap
    val obs = Tables.orders(spark, sf0001)
      .select(substring(col("o_orderpriority"), 1, 1).cast("long"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = obs.length.toLong
    val sorted = obs.map(_._2).sorted
    // doubled pooled midranks per distinct value
    val r2 = obs.map(_._2).distinct.map { v =>
      val below = sorted.count(_ < v)
      val ties = sorted.count(_ == v)
      v -> (2L * (below + 1) + ties - 1)
    }.toMap
    val t2 = obs.map { case (l, v) => BigInt(l) * r2(v) }.sum
    val l1 = obs.map(_._1).sum
    val l2 = obs.map(x => x._1 * x._1).sum
    val tie = obs.groupBy(_._2).values
      .map(g => { val t = BigInt(g.length); t * t * t - t }).sum
    val nD = n.toDouble
    val corr = 1.0 - tie.toDouble / (nD * nD * nD - nD)
    val e = (nD + 1.0) * l1
    val va = (nD + 1.0) / 3.0 * (nD * l2 - l1.toDouble * l1) * corr
    val z = (t2.toDouble - e) / math.sqrt(va)
    // per-level outputs share the scalar z; check one level + ranks
    (1L to 5L).foreach { l =>
      val r = rows(l)
      assert(math.abs(r.getAs[Double]("z_trend") -
        math.round(z * 1e4) / 1e4.toDouble) < 1e-9, s"z at l=$l")
      val nj = obs.count(_._1 == l).toLong
      assert(r.getAs[Long]("n_orders") === nj)
      val mr = obs.filter(_._1 == l).map(x => r2(x._2)).sum.toDouble /
        (nj * 2.0)
      assert(math.abs(r.getAs[Double]("mean_rank") -
        math.round(mr * 1e4) / 1e4.toDouble) < 1e-9)
    }
  }

  test("q411 Watson U2 matches a sequential EDF walk and is " +
      "rotation-invariant on the census") {
    val row = SparkEntry.queries("q411_watson_u2")(spark, sf0001).head()
    val pts = recentDaily365.map(p => (p._2, p._1 % 7 == 0 || p._1 % 7 == 6))
    val nn = pts.length.toLong
    val nx = pts.count(!_._2).toLong
    val ny = nn - nx
    def u2Of(vals: Array[(Long, Boolean)]): Double = {
      val distinct = vals.map(_._1).distinct.sorted
      var (cumAll, cumX) = (0L, 0L)
      var (sq, s1) = (BigInt(0), BigInt(0))
      distinct.foreach { v =>
        val l = vals.count(_._1 == v).toLong
        val lx = vals.count(p => p._1 == v && !p._2).toLong
        cumAll += l; cumX += lx
        val num = BigInt(cumX) * ny - BigInt(cumAll - cumX) * nx
        sq += BigInt(l) * num * num
        s1 += BigInt(l) * num
      }
      (BigInt(nn) * sq - s1 * s1).toDouble /
        (nn.toDouble * nn * nn * nx * ny)
    }
    val u2 = u2Of(pts)
    assert(row.getAs[Long]("n_weekday") === nx)
    assert(row.getAs[Long]("n_weekend") === ny)
    assert(math.abs(row.getAs[Double]("watson_u2") -
      math.floor(u2 * 1e6 + 0.5) / 1e6) < 1e-9)
    // the defining property CvM lacks: shifting the support cyclically
    // (relabel values above a cut to sort first) leaves U2 unchanged
    val cut = pts.map(_._1).sorted.apply(pts.length / 3)
    val rotated = pts.map { case (v, w) =>
      (if (v > cut) v - 1000000000L else v, w) }
    assert(math.abs(u2Of(rotated) - u2) < 1e-9,
      "U2 must be invariant under a cyclic relabeling of the support")
  }
}
