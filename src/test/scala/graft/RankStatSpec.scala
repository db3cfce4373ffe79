package graft

import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Property checks for the round-8 rank/graph statistics — each query's
  * defining mathematical property recomputed brute-force on the driver
  * from the same sf0.001 fixture the query reads, so a regression in
  * the distributed shape (window partitioning, prefix-sum offsets, BFS
  * frontier logic) fails here even if both engines drift together and
  * the cross-engine oracle can't see it. */
class RankStatSpec extends SparkSpec {

  test("q181 AUC equals brute-force pairwise Mann-Whitney") {
    val rows = SparkEntry.queries("q181_auc")(spark, sf0001).collect()
    assert(rows.length == 1)
    val auc = rows(0).getAs[Double]("auc")
    val docs = Tables.documents(spark, sf0001)
      .select(col("n_chars"), (col("source") === "src0").as("pos"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val posS = docs.filter(_._2).map(_._1)
    val negS = docs.filterNot(_._2).map(_._1)
    var num2 = 0L
    for (p <- posS; n <- negS)
      num2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val brute = num2.toDouble / (2.0 * posS.length * negS.length)
    assert(math.abs(auc - brute) < 5e-7, s"auc=$auc brute=$brute")
    assert(rows(0).getAs[Long]("n_pos") == posS.length)
    assert(rows(0).getAs[Long]("n_neg") == negS.length)
  }

  test("q180 quantile normalization equalizes every source's marginal") {
    val out = SparkEntry.queries("q180_quantile_norm")(spark, sf0001)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("n_chars"), r.getAs[Double]("qn")))
    val bySource = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq)
    // the defining property: identical post-normalization multisets
    val dists = bySource.values.toSeq
    assert(dists.nonEmpty && dists.forall(_ == dists.head),
      "sources must share one marginal after quantile normalization")
    // monotone within source: larger raw value never maps below a
    // smaller one (rank tie-breaks make it weakly monotone)
    for ((_, rows) <- out.groupBy(_._1)) {
      val sortedByRaw = rows.sortBy(r => (r._2, r._3))
      val qns = sortedByRaw.map(_._3)
      assert(qns.zip(qns.tail).forall { case (a, b) => a <= b })
    }
  }

  test("q178 hop levels match a driver-side BFS on the same graph") {
    val res = SparkEntry.queries("q178_bfs_hops")(spark, sf0001)
      .collect().map(r => r.getAs[Int]("hop") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("sum_id"))).toMap
    // rebuild the support-thresholded co-purchase graph on the driver
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairCounts = mutable.Map.empty[(Long, Long), Int]
    for ((_, parts) <- li.groupBy(_._1)) {
      val ps = parts.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        pairCounts((ps(i), ps(j))) = pairCounts.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    for (((u, v), c) <- pairCounts if c >= 2) {
      adj.getOrElseUpdate(u, mutable.Set.empty) += v
      adj.getOrElseUpdate(v, mutable.Set.empty) += u
    }
    val seeds = Tables.part(spark, sf0001)
      .filter(col("p_brand") === "Brand#11")
      .select("p_partkey").collect().map(_.getLong(0))
    val hop = mutable.Map.empty[Long, Int]
    seeds.foreach(sd => hop(sd) = 0)
    var frontier = seeds.toSet
    var h = 0
    while (h < 6 && frontier.nonEmpty) {
      h += 1
      frontier = frontier.flatMap(id => adj.getOrElse(id, Set.empty))
        .filterNot(hop.contains)
      frontier.foreach(id => hop(id) = h)
    }
    val expect = hop.toSeq.groupBy(_._2).map { case (lvl, xs) =>
      lvl -> (xs.size.toLong, xs.map(_._1).sum)
    }
    assert(res == expect, s"query=$res driver=$expect")
  }

  test("q179 top-20 keyness matches a driver recomputation in micro-units") {
    val res = SparkEntry.queries("q179_keyness")(spark, sf0001)
      .collect().map(r => (r.getAs[Int]("rnk"), r.getAs[String]("token"),
        r.getAs[Long]("n_focus"), r.getAs[Long]("n_rest"),
        r.getAs[Int]("direction"), r.getAs[Double]("g2")))
    val toks = Tables.documents(spark, sf0001)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ", -1)
        .map(w => (w, r.getString(0) == "src0")))
    val counts = toks.groupBy(_._1).view.mapValues { xs =>
      (xs.count(_._2).toLong, xs.count(!_._2).toLong)
    }.toMap
    val na = counts.valuesIterator.map(_._1).sum
    val nb = counts.valuesIterator.map(_._2).sum
    def g2micro(a: Long, b: Long): Long = {
      val ta = if (a > 0)
        a * math.log((a * (na + nb)).toDouble / (na * (a + b)).toDouble)
      else 0.0
      val tb = if (b > 0)
        b * math.log((b * (na + nb)).toDouble / (nb * (a + b)).toDouble)
      else 0.0
      math.floor((ta + tb) * 2000000.0 + 0.5).toLong
    }
    val expect = counts.toSeq.collect { case (w, (a, b)) if a + b >= 5 =>
      (w, a, b, g2micro(a, b))
    }.sortBy { case (w, _, _, k) => (-k, w) }.take(20)
    assert(res.length == expect.length)
    for (((rnk, w, a, b, dir, g2), (ew, ea, eb, ek)) <- res.zip(expect)) {
      assert(w == ew && a == ea && b == eb, s"rank $rnk: $w vs $ew")
      assert(g2 == ek.toDouble / 1000000.0, s"$w g2=$g2 micro=$ek")
      val cross = a * nb - b * na
      assert(dir == (if (cross > 0) 1 else if (cross < 0) -1 else 0))
    }
  }

  test("q185 JS divergence equals brute-force full-support computation") {
    // The query uses the intersection-only identity (disjoint-support
    // mass telescopes into ln 2); this recomputes JS from the DEFINING
    // full-support formula on collected counts for two source pairs.
    import org.apache.spark.sql.functions._
    val wc = Tables.documents(spark, sf0001)
      .filter(col("source").isin("src0", "src1", "src2"))
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    def dist(src: String): Map[String, Double] = {
      val rows = wc.filter(_._1 == src)
      val tot = rows.map(_._3).sum.toDouble
      rows.map { case (_, w, c) => w -> c / tot }.toMap
    }
    def js(p: Map[String, Double], q: Map[String, Double]): Double = {
      val support = p.keySet ++ q.keySet
      def f(x: Double) = if (x > 0) -x * math.log(x) else 0.0
      support.toSeq.map { w =>
        val (pw, qw) = (p.getOrElse(w, 0.0), q.getOrElse(w, 0.0))
        f((pw + qw) / 2) - f(pw) / 2 - f(qw) / 2
      }.sum
    }
    val got = SparkEntry.queries("q185_js_divergence")(spark, sf0001)
      .filter(col("src_a").isin("src0", "src1") &&
        col("src_b").isin("src1", "src2"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3)))
      .toMap
    for (((a, b), v) <- got) {
      val brute = js(dist(a), dist(b))
      assert(math.abs(v - brute) < 1e-5, s"($a,$b): query=$v brute=$brute")
      assert(v >= 0.0 && v <= 0.6931471805599453 + 1e-12, s"JS out of [0, ln2]: $v")
    }
    assert(got.size == 3, "expected the 3 pairs over src0..src2")
  }

  test("q191 Theil decomposition: within + between terms sum to brute-force total T") {
    import org.apache.spark.sql.functions._
    val xs = Tables.orders(spark, sf0001)
      .select(col("o_totalprice").cast("decimal(13,4)").cast("double"))
      .collect().map(_.getDouble(0))
    val mu = xs.sum / xs.length
    val bruteT = xs.map { x => (x / mu) * math.log(x / mu) }.sum / xs.length
    val rows = SparkEntry.queries("q191_theil")(spark, sf0001).collect()
    val total = rows.map { r =>
      val (weight, within, between) =
        (r.getDouble(4), r.getDouble(3), r.getDouble(5))
      weight * within + between
    }.sum
    assert(math.abs(total - bruteT) < 1e-5,
      s"decomposed=$total brute=$bruteT")
    assert(rows.map(_.getLong(1)).sum == xs.length)
  }

  test("q197 calibration bins match a brute-force driver recomputation") {
    import org.apache.spark.sql.functions._
    val raw = Tables.documents(spark, sf0001)
      .select(col("n_chars"), (col("source") === "src0").cast("int").as("y"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val (mn, mx) = (raw.map(_._1).min, raw.map(_._1).max)
    val brute = raw.groupBy { case (sc, _) => (sc - mn) * 10 / (mx - mn + 1) }
      .map { case (b, rows) =>
        val n = rows.length
        val pred = rows.map { case (sc, _) =>
          math.floor((sc - mn).toDouble / (mx - mn).toDouble * 1e9 + 0.5) / 1e9
        }.sum / n
        val obs = rows.map(_._2).sum.toDouble / n
        b -> (n, pred, obs)
      }
    val got = SparkEntry.queries("q197_calibration")(spark, sf0001).collect()
    assert(got.length == brute.size)
    var ece = 0.0
    val total = raw.length.toDouble
    for (r <- got) {
      val (n, pred, obs) = brute(r.getLong(0))
      assert(r.getLong(1) == n, s"bin ${r.getLong(0)} count")
      assert(math.abs(r.getDouble(3) - pred) < 1e-6, s"bin ${r.getLong(0)} pred")
      assert(math.abs(r.getDouble(4) - obs) < 1e-12, s"bin ${r.getLong(0)} obs")
      ece += n / total * r.getDouble(5)
    }
    assert(ece >= 0.0 && ece <= 1.0, s"table ECE out of range: $ece")
  }
}
