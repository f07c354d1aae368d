package graft

import graft.graph.Graph

/** Graph family: PageRank (integer fixed-point) and degree profile. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: hub of a star out-ranks leaves, mass is conserved") {
    // undirected star: hub <-> 9 leaves (both directions, no dangling)
    val edges = (1 to 9).flatMap(i => Seq(("hub", s"leaf$i"), (s"leaf$i", "hub")))
      .toDF("src", "dst")
    val out = Graph.pageRank(edges, "src", "dst", iters = 10)
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Long]("rank12")).toMap
    assert(out.size == 10)
    val hub = out("hub")
    (1 to 9).foreach(i => assert(hub > 3 * out(s"leaf$i"), s"leaf$i out-ranks hub"))
    // no dangling nodes -> total mass stays ~1 (integer-div loss only:
    // ≤ 1 unit per edge contribution + per-node update, per iteration)
    val total = out.values.sum
    assert(math.abs(total - 1000000000000L) < 10L * (18 + 10 + 1),
      s"mass leaked: $total")
    // all leaves are symmetric -> identical ranks
    assert((1 to 9).map(i => out(s"leaf$i")).toSet.size == 1)
  }

  test("pagerank: a directed chain ranks downstream nodes higher") {
    // a -> b -> c -> a cycle plus d -> a feeder: d only gets teleport
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")).toDF("s", "t")
    val out = Graph.pageRank(edges, "s", "t", iters = 20)
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Double]("rank")).toMap
    assert(out("a") > out("d") && out("b") > out("d") && out("c") > out("d"))
    assert(out("a") > out("b"), "a gets d's feed on top of the cycle")
  }

  test("personalized pagerank: mass decays with distance from the seed") {
    // undirected chain s - a - b - c, seed {s}
    val und = Seq(("s", "a"), ("a", "b"), ("b", "c"))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq("s").toDF("node")
    val out = Graph.personalizedPageRank(edges, "src", "dst", seeds, iters = 20)
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Long]("rank12")).toMap
    // note s itself need not top the list: a degree-1 seed funnels ALL
    // its mass to its neighbor (r_a ≈ 1.19·r_s in the fixed point) — the
    // guaranteed shape is decay AWAY from the seed's neighborhood
    assert(out("a") > out("b") && out("b") > out("c"))
    assert(out("s") > out("b"), "seed outranks everything past its neighbor")
    assert(out("c") > 0L, "mass reaches the far end")
    assert(out("s") + out("a") > out("b") + out("c"),
      "mass concentrates in the seed neighborhood (65/35 in the fixed point)")
  }

  test("triangles: K4 corners carry 3 each, a pendant and a square carry 0") {
    val k4 = for (a <- Seq("1", "2", "3", "4"); b <- Seq("1", "2", "3", "4")
      if a < b) yield (a, b)
    val square = Seq(("p", "q"), ("q", "r"), ("r", "t"), ("t", "p"))
    val edges = (k4 ++ square :+ ("4", "pend")).toDF("a", "b")
    val out = Graph.triangles(edges, "a", "b")
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Long]("triangles")).toMap
    Seq("1", "2", "3", "4").foreach(v => assert(out(v) == 3L, s"corner $v"))
    (square.flatMap(e => Seq(e._1, e._2)).distinct :+ "pend")
      .foreach(v => assert(out(v) == 0L, s"node $v"))
  }

  test("degrees: out/in counts and the dangling flag") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val out = Graph.degrees(edges, "src", "dst")
      .collect().map(r => r.getAs[String]("node") ->
        ((r.getAs[Long]("outDeg"), r.getAs[Long]("inDeg"),
          r.getAs[Boolean]("dangling")))).toMap
    assert(out("a") == ((2L, 0L, false)))
    assert(out("b") == ((1L, 1L, false)))
    assert(out("c") == ((0L, 2L, true)))
  }
}
