package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.VectorQueries

/** ScalaCheck-generated algebraic properties (SURVEY.md §5.5). Samples
  * are drawn with a fixed seed so runs are deterministic; each property
  * is checked over several generated datasets (Spark jobs are too heavy
  * for hundreds of forAll iterations). */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val kvGen: Gen[List[(Int, Int)]] =
    Gen.listOfN(60, Gen.zip(Gen.choose(0, 9), Gen.choose(0, 99)))

  test("dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    import spark.implicits._
    for (data <- samples(kvGen, 4)) {
      val df = data.toDF("k", "v")
      val once = df.dropDuplicates("k")
      val twice = once.dropDuplicates("k")
      assert(once.count() == twice.count())
      assert(once.select("k").distinct().count() == once.count())
    }
  }

  test("semi + anti partition the left side on its join key") {
    import spark.implicits._
    for ((ldata, rdata) <- samples(Gen.zip(kvGen, kvGen), 4)) {
      val l = ldata.toDF("k", "v")
      val r = rdata.toDF("k", "w")
      val semi = l.join(r, Seq("k"), "left_semi").count()
      val anti = l.join(r, Seq("k"), "left_anti").count()
      assert(semi + anti == l.count(), "every left row is matched xor unmatched")
    }
  }

  test("exceptAll/unionAll bag algebra: (a ∪ b) \\ b has |a| rows") {
    import spark.implicits._
    for ((adata, bdata) <- samples(Gen.zip(kvGen, kvGen), 4)) {
      val a = adata.toDF("k", "v")
      val b = bdata.toDF("k", "v")
      assert(a.unionAll(b).exceptAll(b).count() == a.count())
    }
  }

  private val vecGen: Gen[List[Seq[Float]]] =
    Gen.listOfN(20, Gen.listOfN(8,
      Gen.choose(-100, 100).map(_.toFloat / 10f)).map(_.toSeq))
      .map(_.filter(v => v.exists(_ != 0f)))

  test("as-of join invariants on generated event sets") {
    import spark.implicits._
    // keys 0-4, small ts range to force duplicate timestamps and
    // unmatched keys — the edge cases the merge must handle
    val evGen: Gen[List[(Long, Long, Long)]] =
      Gen.listOfN(80, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 20L),
        Gen.choose(0L, 999L)))
    for ((ldata, rdata) <- samples(Gen.zip(evGen, evGen), 3)) {
      val l = ldata.zipWithIndex
        .map { case ((k, t, _), i) => (k, t, i.toLong) }.toDF("k", "t", "lid")
      val r = rdata.map { case (k, t, id) => (k, t, id) }.toDF("rk", "rt", "rid")
      val out = graft.plans.AsofJoinOp.asofJoin(l, r, "k", "rk", "t", "rt",
        tie = Some("rid")).cache()
      // left outer: exactly one output row per left row
      assert(out.count() == l.count())
      // every match respects the as-of bound
      assert(out.filter(col("rt").isNotNull && col("rt") > col("t")).count() == 0)
      // spot-check against the quadratic definition for one key
      val byDef = l.as("l").join(r.as("r"),
          col("l.k") === col("r.rk") && col("r.rt") <= col("l.t"), "left")
        .groupBy("l.lid").agg(max(struct(col("r.rt"), col("r.rid"))).as("best"))
        .select(col("lid"), col("best.rid").as("rid_def"))
      val disagree = out.join(byDef, "lid")
        .filter(not(col("rid") <=> col("rid_def"))).count()
      assert(disagree == 0, "merge result must equal the quadratic definition")
      out.unpersist()
    }
  }

  test("snapshotDiff identity and anti-symmetry on generated versions") {
    import spark.implicits._
    for (data <- samples(kvGen, 3)) {
      val base = data.toDF("k", "v").dropDuplicates("k")
      val mutated = base.withColumn("v",
        when(col("k") % 3 === 0, col("v") + 1000).otherwise(col("v")))
        .filter(col("k") % 4 =!= 1) // drop some keys
      // identity: a version diffed against itself reports nothing
      assert(ops.Diff.snapshotDiff(base, base, Seq("k"), Seq("v")).count() == 0)
      // anti-symmetry: added(a→b) == removed(b→a); changed == changed
      val fwd = ops.Diff.snapshotDiff(base, mutated, Seq("k"), Seq("v"))
        .groupBy("change").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val rev = ops.Diff.snapshotDiff(mutated, base, Seq("k"), Seq("v"))
        .groupBy("change").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(fwd.getOrElse("added", 0L) == rev.getOrElse("removed", 0L))
      assert(fwd.getOrElse("removed", 0L) == rev.getOrElse("added", 0L))
      assert(fwd.getOrElse("changed", 0L) == rev.getOrElse("changed", 0L))
    }
  }

  test("snapshotDiff surfaces null-keyed rows as an independent removed/added pair") {
    import spark.implicits._
    // a null key matches nothing under join semantics, so the old-side
    // null-keyed row must come back 'removed' and the new-side one
    // 'added' — presence is tracked by literal markers, not key nullness
    val oldDf = Seq((Some(1L), "a"), (None: Option[Long], "x")).toDF("k", "v")
    val newDf = Seq((Some(1L), "a"), (None: Option[Long], "y")).toDF("k", "v")
    val out = ops.Diff.snapshotDiff(oldDf, newDf, Seq("k"), Seq("v"))
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    assert(out == Set((None, "removed"), (None, "added")),
      s"null-keyed rows mishandled: $out")
  }

  test("quarantine partitions the input and clean rows satisfy every rule") {
    import spark.implicits._
    for (data <- samples(kvGen, 3)) {
      val df = data.toDF("k", "v")
      val rules = Seq("v_small" -> (col("v") < 50), "k_even" -> (col("k") % 2 === 0))
      val (good, bad) = ops.DataQuality.quarantine(df, rules)
      assert(good.count() + bad.count() == df.count())
      assert(good.filter(col("v") >= 50 || col("k") % 2 =!= 0).count() == 0)
      assert(bad.filter(size(col("_violations")) === 0).count() == 0)
    }
  }

  test("prefix jaccard join results shrink monotonically with the threshold") {
    val toks = Tables.documents(spark, sf0001).limit(120)
      .select(col("doc_id"),
        array_distinct(split(col("text"), " ")).as("toks"))
    val loose = ops.PrefixJoin.jaccardJoin(toks, "doc_id", "toks", 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tight = ops.PrefixJoin.jaccardJoin(toks, "doc_id", "toks", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight.subsetOf(loose),
      s"pairs at t=0.9 must be a subset of pairs at t=0.7; extra: ${(tight -- loose).take(3)}")
  }

  test("q92 capHash matches BigInt modular arithmetic over the full Long range") {
    // pins the ADVICE r4 overflow fix: pmod-reduce BEFORE the multiply.
    // The oracle here is exact BigInt arithmetic — the value the naive
    // `id * 2654435761 + 104729` form would produce WITHOUT 64-bit
    // wrap-around — so any overflow in the Spark column is caught. Ids
    // include the hostile band ≥ 3.5e9 where the naive form wraps in
    // Spark and raises in DuckDB, and Long.MaxValue itself.
    import spark.implicits._
    val p = BigInt(1000000007L)
    def oracle(id: Long): Long =
      (((BigInt(id).mod(p)) * BigInt(2654435761L) + BigInt(104729L)).mod(p)).toLong
    val hostile = Seq(0L, 1L, 14629L, 3500000000L, 4000000007L,
      1L << 40, (1L << 62) - 3, Long.MaxValue, -1L, Long.MinValue)
    val generated = samples(Gen.choose(Long.MinValue, Long.MaxValue), 20)
    val ids = (hostile ++ generated).distinct
    val got = ids.toDF("doc_id")
      .select(col("doc_id"), graft.ops.CurationQueries.capHash(col("doc_id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- ids)
      assert(got(id) == oracle(id),
        s"capHash($id) = ${got(id)}, BigInt oracle says ${oracle(id)}")
  }

  test("cosine similarity is within [-1, 1] and self-similarity is 1") {
    import spark.implicits._
    for (vecs <- samples(vecGen, 3)) {
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "vec")
      val a = df.select(col("id").as("ida"), col("vec").as("va"))
      val b = df.select(col("id").as("idb"), col("vec").as("vb"))
      val pairs = a.crossJoin(b)
        .withColumn("cos", VectorQueries.cosine(col("va"), col("vb")))
      assert(pairs.filter(abs(col("cos")) > 1.0 + 1e-9).count() == 0)
      val selfBad = pairs.filter(col("ida") === col("idb"))
        .filter(abs(col("cos") - 1.0) > 1e-6).count()
      assert(selfBad == 0)
    }
  }

  test("RangedNtile equals the ntile window on generated data, any k") {
    import spark.implicits._
    val gen = Gen.zip(Gen.choose(1, 9),
      Gen.listOfN(80, Gen.choose(-1000, 1000)))
    for ((k, vals) <- samples(gen, 4)) {
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val ours = graft.ops.RangedNtile
        .withNtile(df, k, Seq(col("v"), col("id")), "b")
      val ref = df.withColumn("b_ref", ntile(k).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("v"), col("id"))))
      assert(ours.join(ref, Seq("id", "v"))
        .filter(col("b") =!= col("b_ref")).count() == 0, s"k=$k")
    }
  }

  test("skyline is idempotent and dominates every dropped row") {
    import spark.implicits._
    val gen = Gen.listOfN(50,
      Gen.zip(Gen.choose(0, 30), Gen.choose(0, 30)))
    for (data <- samples(gen, 4)) {
      val df = data.zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x.toDouble, y) }
        .toDF("id", "x", "y")
      val front = graft.ops.Skyline.skyline2(df, col("x"), col("y"))
      val again = graft.ops.Skyline.skyline2(front, col("x"), col("y"))
      assert(front.count() == again.count(), "skyline(skyline(x)) == skyline(x)")
      // every non-frontier row is strictly dominated by some frontier row
      val rows = df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      val kept = front.select("id").collect().map(_.getLong(0)).toSet
      rows.filterNot(r => kept(r._1)).foreach { case (id, x, y) =>
        assert(rows.exists { case (i2, x2, y2) =>
          kept(i2) && x2 <= x && y2 >= y && (x2 < x || y2 > y)
        }, s"dropped row $id is not dominated by any kept row")
      }
    }
  }

  test("largest-remainder apportionment conserves totals on generated weights") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val gen = Gen.zip(Gen.choose(1L, 1000000L),
      Gen.listOfN(7, Gen.choose(1L, 100000L)))
    for ((total, ws) <- samples(gen, 5)) {
      val df = ws.zipWithIndex.map { case (w, i) => (i, w) }.toDF("i", "w")
        .withColumn("total", lit(total))
      val byAll = Window.partitionBy("total")
      val byRem = Window.partitionBy("total")
        .orderBy(col("rem").desc, col("i"))
      val alloc = df
        .withColumn("denom", sum(col("w")).over(byAll))
        .withColumn("floor_c", expr("(total * w) div denom"))
        .withColumn("rem", expr("(total * w) % denom"))
        .withColumn("short", col("total") - sum(col("floor_c")).over(byAll))
        .withColumn("a", col("floor_c") +
          when(row_number().over(byRem) <= col("short"), 1L).otherwise(0L))
      assert(alloc.agg(sum("a")).head.getLong(0) == total,
        s"total=$total ws=$ws")
      val maxDev = alloc
        .withColumn("ideal",
          col("total").cast("double") * col("w") / col("denom"))
        .agg(max(abs(col("a").cast("double") - col("ideal"))))
        .head.getDouble(0)
      assert(maxDev < 1.0 + 1e-9)
    }
  }

  test("CDC chunks: concat-identity and brute-force equality on random ASCII") {
    // random printable-ASCII strings (incl. spaces and repeats) — the
    // kernel's rolling update must equal the direct per-window hash at
    // every length, including < W, == W, and boundary-at-last-char
    import graft.functions.CdcKernels
    val asciiGen: Gen[String] = for {
      n <- Gen.choose(0, 300)
      cs <- Gen.listOfN(n, Gen.choose(32.toChar, 121.toChar))
    } yield cs.mkString
    def brute(s: String): Seq[String] = {
      import CdcKernels.{B, D, M, W}
      if (s.isEmpty) return Seq("")
      val pw = Array.iterate(1L, W)(p => p * B % M)
      val bounds = (W to s.length - 1).filter { i =>
        (0 until W).map(j => s.charAt(i - 1 - j) * pw(j) % M).sum % M % D == 0
      }
      val starts = 0 +: bounds
      val ends = bounds :+ s.length
      starts.zip(ends).map { case (a, b) => s.substring(a, b) }
    }
    def kernel(s: String): Seq[String] = {
      val arr = CdcKernels.cdcChunks(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    }
    for (s <- samples(asciiGen, 200)) {
      val k = kernel(s)
      assert(k == brute(s), s"mismatch on ${s.take(60)}")
      assert(k.mkString("") == s, "chunks must concatenate to the input")
      assert(k.forall(_.nonEmpty) || s.isEmpty, "no empty chunk for non-empty input")
    }
  }
}
