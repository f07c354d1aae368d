package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators (engine addition — the reference has none): link-based
  * quality weighting for corpus curation. Web-corpus pipelines rank hosts
  * and documents by link structure (the Common Crawl host-level ranking
  * idea) before sampling; this is that primitive, Spark-first.
  *
  * Design: Pregel-shaped iteration expressed as DataFrame joins — rank
  * state is node-sized, messages are edge-sized, each iteration is one
  * equi-join (ranks × out-edges) plus one hash aggregate (sum by dst).
  * At 100 TB the edge table dominates: it is joined on `src` every
  * iteration, so it is repartitioned by src ONCE and persisted — every
  * subsequent iteration reuses that layout and only the node-sized rank
  * frame moves.
  */
object Graph {

  /** PageRank with damping d = 0.85 over integer fixed-point ranks.
    *
    * Semantics match GraphX's `staticPageRank` family: teleport
    * (1−d)/N per node, no dangling-mass redistribution (a node with no
    * out-edges lets its mass decay — with both-direction edge sets, the
    * common corpus-graph construction, no such node exists).
    *
    * Determinism (the fixedPointLong discipline, taken to 12dp because
    * ranks live at the 1/N scale): ranks are LONGS at 10¹² scale; each
    * contribution is an integer division r div outdeg; per-dst sums are
    * order-exact long sums; the update teleport + (85·S) div 100 is pure
    * integer arithmetic. Every engine replays the identical longs — the
    * oracle hash-compares rank12 exactly, no float tolerance anywhere.
    *
    * Scale: per iteration, one shuffle join (node-sized ranks into the
    * src-partitioned edge cache) + one aggregate (map-side combined,
    * dst-keyed). Rank lineage is node-sized all the way; nothing ever
    * collects. `iters` is a user constant (default 10).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 10, scale: Long = 1000000000000L): DataFrame = {
    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("od"))
    val ew = e.join(deg, "src").repartition(col("src")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count() // scalar action: N feeds the integer constants
    val init = scale / n
    val teleport = (15L * scale) / (100L * n)
    var ranks = nodes.withColumn("r", lit(init))
    (1 to iters).foreach { _ =>
      val msgs = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst").as("node"), expr("r div od").as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      ranks = nodes.join(msgs, Seq("node"), "left")
        .withColumn("r", lit(teleport) + expr("(85 * coalesce(s, 0)) div 100"))
        .select("node", "r")
    }
    ranks.select(col("node"), col("r").as("rank12"),
      (col("r").cast("double") / scale).as("rank"))
  }

  /** Personalized PageRank: teleport mass goes ONLY to the `seeds` set
    * instead of uniformly — the corpus-expansion primitive (rank every
    * node by proximity to a trusted seed corpus, then admit the top
    * slice; the classic "seed + expand" curation move). Same integer
    * fixed-point discipline as [[pageRank]]: seeds start with
    * scale/|seeds| each, non-seeds with 0; update is
    * seedTeleport + (85·S) div 100 for seeds and (85·S) div 100
    * otherwise. Exactly replayable — the oracle hash-compares longs.
    *
    * `seeds` is a one-column DataFrame of node ids; it is broadcast
    * (seed sets are small by construction). */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, iters: Int = 10,
      scale: Long = 1000000000000L): DataFrame = {
    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("od"))
    val ew = e.join(deg, "src").repartition(col("src")).persist()
    val seedDf = seeds.select(col(seeds.columns.head).cast("string").as("node"))
      .distinct().persist()
    val nSeeds = seedDf.count()
    require(nSeeds > 0, "personalizedPageRank needs a non-empty seed set")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(broadcast(seedDf.withColumn("_seed", lit(true))), Seq("node"), "left")
      .withColumn("_seed", coalesce(col("_seed"), lit(false)))
      .persist()
    val seedInit = scale / nSeeds
    val teleport = (15L * scale) / (100L * nSeeds)
    var ranks = nodes.withColumn("r",
      when(col("_seed"), lit(seedInit)).otherwise(lit(0L)))
      .select("node", "r")
    (1 to iters).foreach { _ =>
      val msgs = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst").as("node"), expr("r div od").as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      ranks = nodes.join(msgs, Seq("node"), "left")
        .withColumn("r",
          when(col("_seed"), lit(teleport)).otherwise(lit(0L)) +
            expr("(85 * coalesce(s, 0)) div 100"))
        .select("node", "r")
    }
    ranks.select(col("node"), col("r").as("rank12"),
      (col("r").cast("double") / scale).as("rank"))
  }

  /** Per-node triangle count — the local clustering signal (spam/bot
    * subgraphs are triangle-poor relative to organic communities; a
    * standard web-graph quality feature). Standard distributed shape:
    * canonicalize to a < b undirected edges, join edges-on-shared-lower
    * -vertex to enumerate wedges, close each wedge against the edge set
    * (three hash joins, no cartesian anywhere), then credit each corner.
    * Wedge enumeration is Σ deg(v)² in the worst case — the documented
    * mitigation at web scale is degree-ordering (wedges are only built
    * from each edge's LOWER-degree endpoint), which this implements:
    * work is Σ min-degree², the O(E^1.5) bound. Exact integer output. */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val raw = edges.select(col(srcCol).cast("string").as("a"),
      col(dstCol).cast("string").as("b"))
    val und = raw.where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b")).distinct()
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    // orient each edge from its lower-degree endpoint (ties: lower id) —
    // every triangle is then counted exactly once as a wedge at its
    // minimum-degree corner closed by a forward edge
    val dirE = und
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("d", "db"), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("lo"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("hi"))
      .persist()
    val wedges = dirE.as("e1").join(dirE.as("e2"),
      col("e1.lo") === col("e2.lo") && col("e1.hi") < col("e2.hi"))
      .select(col("e1.lo").as("w"), col("e1.hi").as("u"), col("e2.hi").as("v"))
    val closed = wedges.join(
      dirE.select(
        least(col("lo"), col("hi")).as("cu"),
        greatest(col("lo"), col("hi")).as("cv")),
      least(col("u"), col("v")) === col("cu") &&
        greatest(col("u"), col("v")) === col("cv"))
      .select("w", "u", "v")
    val credit = closed.select(col("w").as("node"))
      .union(closed.select(col("u").as("node")))
      .union(closed.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.select(col("node")).join(credit, Seq("node"), "left")
      .withColumn("triangles", coalesce(col("triangles"), lit(0L)))
  }

  /** Per-node degree profile: out/in degree and the dangling flag — the
    * cheap pre-flight before [[pageRank]] (dangling nodes leak mass) and
    * a corpus-graph health check in its own right. One aggregate per
    * direction over the edge table, full-outer-joined node-sized. */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst")).distinct()
    val out = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outDeg"))
    val in = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("inDeg"))
    out.join(in, Seq("node"), "full_outer")
      .withColumn("outDeg", coalesce(col("outDeg"), lit(0L)))
      .withColumn("inDeg", coalesce(col("inDeg"), lit(0L)))
      .withColumn("dangling", col("outDeg") === 0L)
  }
}
