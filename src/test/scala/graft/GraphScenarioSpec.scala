package graft

import graft.graph.Graph
import org.apache.spark.sql.functions._

/** End-to-end corpus-graph curation scenario: user–item interactions →
  * bipartite projection → weighted PageRank + communities + components →
  * random-walk training sequences. The pipeline a web-corpus team runs to
  * weight and group hosts before sampling — every stage is the library's
  * own operator, chained the way a user would chain them. */
class GraphScenarioSpec extends SparkSpec {
  import spark.implicits._

  test("projection → weighted rank → communities → walks, end to end") {
    // two browsing communities of items with one shared bridge user:
    // community A = {a1,a2,a3}, community B = {b1,b2,b3}; hub item
    // "front" is touched by everyone (the home page)
    val users =
      (1 to 6).map(i => (s"uA$i", Seq("a1", "a2", "a3", "a4", "front"))) ++
        (1 to 6).map(i => (s"uB$i", Seq("b1", "b2", "b3", "b4", "front"))) ++
        Seq(("bridge", Seq("a1", "b1")))
    val visits = users.flatMap { case (u, items) => items.map((u, _)) }
      .toDF("user", "item")

    // 1. project to the item–item co-occurrence graph (hub capped out
    //    would drop "front"; keep it here — its edges are real)
    val g = Graph.project(visits, "user", "item", maxDeg = 10)
    val cooc = g.collect().map(r =>
      (r.getAs[String]("a"), r.getAs[String]("b")) -> r.getAs[Long]("cooc")).toMap
    assert(cooc(("a1", "a2")) == 6L, "within-community co-occurrence")
    assert(cooc.get(("a2", "b2")).isEmpty, "no cross-community edge")
    assert(cooc(("a1", "b1")) == 1L, "bridge user creates the single link")
    val items = Seq("a1", "a2", "a3", "a4", "b1", "b2", "b3", "b4")

    // 2. weighted PageRank on the projection: the shared front page
    //    out-ranks every community item
    val pr = Graph.pageRankWeighted(
      g.select(col("a").as("s"), col("b").as("t"), col("cooc"))
        .unionByName(g.select(col("b").as("s"), col("a").as("t"), col("cooc"))),
      "s", "t", "cooc", iters = 10)
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Long]("rank12")).toMap
    assert(items.forall(i => pr("front") > pr(i)),
      s"front page tops the rank: $pr")

    // 3. communities: LPA separates the community INTERIORS despite the
    //    bridge (the bridge endpoints themselves can land either way —
    //    LPA's all-ties first round lets the min label cross one hop)
    val com = Graph.labelPropagation(
      g.where(col("a") =!= "front" && col("b") =!= "front")
        .select("a", "b"), "a", "b", iters = 6)
      .collect().map(r => r.getAs[String]("node") -> r.getAs[String]("label")).toMap
    assert(com("a2") == com("a3") && com("a3") == com("a4"))
    assert(com("b2") == com("b3") && com("b3") == com("b4"))
    assert(com("a2") != com("b2"), "interiors stay in separate communities")

    // 4. components: dropping the bridge edge disconnects the halves
    val comp = Graph.connectedComponents(
      g.where((col("a") =!= "front" && col("b") =!= "front") &&
        !(col("a") === "a1" && col("b") === "b1")), "a", "b")
      .collect().map(r => r.getAs[String]("node") -> r.getAs[String]("component")).toMap
    assert(comp("a2") == "a1" && comp("b2") == "b1")

    // 5. random walks stay inside the graph and replay deterministically
    val walks = Graph.randomWalks(g.select("a", "b"), "a", "b",
      walksPerNode = 1, walkLen = 3, salt = "scenario")
    assert(walks.count() == 9 * 4, "9 nodes × 4 steps")
    val again = Graph.randomWalks(g.select("a", "b"), "a", "b",
      walksPerNode = 1, walkLen = 3, salt = "scenario")
    assert(walks.collect().toSet == again.collect().toSet)
  }
}
