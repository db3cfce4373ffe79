package graft

import org.apache.spark.sql.functions._

/** Independent brute-force references for the round-10 rank/robust
  * statistics (q210 Mann–Whitney, q211 Kendall τ-b, q226 Pettitt).
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
}
