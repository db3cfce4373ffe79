package graft

import graft.ops.Triangles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[Triangles]] to an orientation-free brute-force reference
  * (enumerate x<y<z via three canonical-edge joins) on structured and
  * pseudo-random graphs, plus the degree-orientation invariant the
  * oracle can't see: each triangle is emitted exactly once.
  */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def df(edges: Seq[(Long, Long)]): DataFrame =
    edges.toDF("src", "dst")

  /** Reference: triangles as x<y<z over canonicalized distinct edges. */
  private def brute(edges: DataFrame): Set[(Long, Long, Long)] = {
    val canon = edges
      .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .filter($"u" =!= $"v").distinct()
    val e1 = canon.select($"u".as("x"), $"v".as("y"))
    val e2 = canon.select($"u".as("y"), $"v".as("z"))
    val e3 = canon.select($"u".as("x"), $"v".as("z"))
    e1.join(e2, "y").join(e3, Seq("x", "z"))
      .select("x", "y", "z").as[(Long, Long, Long)].collect().toSet
  }

  private def fast(edges: DataFrame): Seq[(Long, Long, Long)] =
    Triangles.triples(edges, "src", "dst")
      .as[(Long, Long, Long)].collect().toSeq

  test("K4 has exactly 4 triangles; C5 cycle has none") {
    val k4 = df(Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L)))
    assert(fast(k4).toSet === brute(k4) && fast(k4).size === 4)
    val c5 = df(Seq((1L,2L),(2L,3L),(3L,4L),(4L,5L),(5L,1L)))
    assert(fast(c5).isEmpty)
  }

  test("duplicate edges, reversed direction, and self-loops do not change the count") {
    val messy = df(Seq((1L,2L),(2L,1L),(1L,2L),(2L,3L),(3L,1L),(1L,1L),(3L,3L)))
    assert(fast(messy).toSet === Set((1L,2L,3L)))
    assert(fast(messy).size === 1)
  }

  test("star + hub skew: high-degree vertex alone creates no triangles") {
    val star = df((2L to 40L).map(i => (1L, i)))
    assert(fast(star).isEmpty)
    // closing one spoke pair creates exactly one
    val plus = df((2L to 40L).map(i => (1L, i)) :+ (2L, 3L))
    assert(fast(plus).toSet === Set((1L, 2L, 3L)))
  }

  test("matches brute force on a deterministic pseudo-random graph, no duplicates") {
    // seeded-random edge list: 300 edges over 60 vertices, dense enough
    // for a few hundred triangles
    val rnd = new scala.util.Random(42)
    val edges = df(Seq.fill(300)((rnd.nextInt(60) + 1L, rnd.nextInt(60) + 1L)))
    val f = fast(edges)
    assert(f.size === f.toSet.size, "each triangle must be emitted exactly once")
    assert(f.toSet === brute(edges))
    assert(f.nonEmpty)
  }

  test("perVertex counts sum to 3x the triangle count") {
    val k4Plus = df(Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),(4L,5L)))
    val pv = Triangles.perVertex(k4Plus, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(pv.values.sum === 3L * 4L)
    assert(pv(1L) === 3L)
    assert(!pv.contains(5L), "vertex 5 touches no triangle")
  }

  /** r19 optimization round: the fused canonical-input variant must
    * agree exactly with perVertex + an independent degree census —
    * every vertex present (n_tri = 0 fill), both columns right, on
    * structured and pseudo-random graphs, both broadcastAdj settings. */
  test("perVertexWithDeg == perVertex + degree census on canonical edges") {
    def canon(edges: DataFrame): DataFrame = edges
      .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .filter($"u" =!= $"v").distinct()
    val rnd = new scala.util.Random(7)
    val graphs = Seq(
      df(Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),(4L,5L))),
      df(Seq.fill(250)((rnd.nextInt(50) + 1L, rnd.nextInt(50) + 1L))))
    for (g <- graphs; bc <- Seq(true, false)) {
      val ce = canon(g)
      val expectTri = Triangles.perVertex(ce, "u", "v", broadcastAdj = bc)
        .as[(Long, Long)].collect().toMap
      val expectDeg = ce.select($"u".as("id")).union(ce.select($"v"))
        .groupBy("id").count().as[(Long, Long)].collect().toMap
      val got = Triangles.perVertexWithDeg(ce, "u", "v", broadcastAdj = bc)
        .select("id", "deg", "n_tri")
        .as[(Long, Long, Long)].collect()
      assert(got.map(_._1).toSet === expectDeg.keySet,
        "every vertex of the edge set appears exactly once")
      assert(got.length === expectDeg.size)
      got.foreach { case (id, deg, nTri) =>
        assert(deg === expectDeg(id), s"deg of $id (broadcastAdj=$bc)")
        assert(nTri === expectTri.getOrElse(id, 0L),
          s"n_tri of $id (broadcastAdj=$bc)")
      }
    }
  }
}
