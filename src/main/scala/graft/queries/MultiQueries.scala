package graft.queries

import graft.core._
import graft.model.Fitters
import graft.multi.{Blocked, ClusterScore, IsolationForest, Proximity}
import graft.post.PostOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries + oracles for post-processing (§2.3 roll-ups/thresholds) and
  * proximity/multivariate operators (§2.6). KMeans/isolation-forest are
  * seeded-random model fits with no SQL equivalent → rows-only checks. */
object MultiQueries {

  private def ev(s: SparkSession, dir: String) = table(s, dir, "events")
  private def emb(s: SparkSession, dir: String) = table(s, dir, "embeddings")

  private def hierarchyDf(s: SparkSession) = {
    val spark = s
    import spark.implicits._
    Seq(
      ("click", "*", "traffic", "web"), ("view", "*", "traffic", "web"),
      ("error", "*", "ops", "backend"),
      ("purchase", "*", "rev", "sales"), ("signup", "*", "rev", "sales"))
      .toDF("childType", "childId", "parentType", "parentId")
  }

  private def nn5(s: SparkSession, dir: String) =
    Blocked.knn(emb(s, dir).select("vec_id", "embedding"), "vec_id", "embedding",
      k = 5).select("src", "trg", "dist", "rank")

  /** The bipartite user↔event_type graph (both directions, so no node is
    * dangling) — the corpus-graph construction the graph family runs on. */
  private[queries] def bipartite(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val u2t = e.select(concat(lit("u:"), col("user_id").cast("string")).as("src"),
      concat(lit("t:"), col("event_type")).as("dst"))
    u2t.union(u2t.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** Consecutive-user co-occurrence pairs kept only above a repeat
    * threshold — the SPARSE user–user graph the undirected graph ops run
    * on (the unthresholded chain is near-complete at test scale; the
    * chain is PARTITION-LOCAL — lead within event_type — so the fixture
    * itself carries no data-sized global window, r9 verdict item 5). */
  private[queries] def chainPairs(s: SparkSession, dir: String, minCount: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = ev(s, dir).select(col("user_id").cast("string").as("ua"),
      lead(col("user_id").cast("string"), 1)
        .over(Window.partitionBy("event_type").orderBy("event_id")).as("ub"))
      .where(col("ub").isNotNull && col("ua") =!= col("ub"))
    e.select(least(col("ua"), col("ub")).as("a"),
        greatest(col("ua"), col("ub")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount).select("a", "b")
  }

  /** Canonical a<b co-occurrence pairs WITH their repeat count (the
    * weighted-graph face of [[chainPairs]]). */
  private def chainCounted(s: SparkSession, dir: String, minCount: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = ev(s, dir).select(col("user_id").cast("string").as("ua"),
      lead(col("user_id").cast("string"), 1)
        .over(Window.partitionBy("event_type").orderBy("event_id")).as("ub"))
      .where(col("ub").isNotNull && col("ua") =!= col("ub"))
    e.select(least(col("ua"), col("ub")).as("a"),
        greatest(col("ua"), col("ub")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount)
  }

  /** Directed consecutive-user edges (order preserved) for [[q206]] HITS. */
  private def chainDirected(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ev(s, dir).select(col("user_id").cast("string").as("a"),
      lead(col("user_id").cast("string"), 1)
        .over(Window.partitionBy("event_type").orderBy("event_id")).as("b"))
      .where(col("b").isNotNull && col("a") =!= col("b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // EVT peaks-over-threshold: GPD tail fit (method of moments) per
    // event_type over exceedances above the exact 90th-pct order
    // statistic; score = −ln tail-probability
    "q286_pot_gpd" -> ((s, dir) =>
      canon(graft.multi.TailScores.potGpd(ev(s, dir), Seq("event_type"),
        "event_id", "value", tailFrac = 0.1, threshold = 5.0)
        .select("event_id", "event_type", "value", "u", "xi", "sigma",
          "score", "tag"))),
    // Z-order layout keys: Morton-interleave (user bucket, value bucket)
    // + z-contiguous file assignment — the write-side clustering op
    "q295_zorder" -> ((s, dir) => {
      val e = ev(s, dir).where(col("value").isNotNull)
        .select(col("event_id"),
          pmod(col("user_id"), lit(1024L)).as("ax"),
          pmod(floor(col("value")).cast("long"), lit(1024L)).as("bx"))
      graft.core.Layout.zOrderLayout(e, col("ax"), col("bx"),
        bits = 10, numFiles = 32)
        .select("event_id", "ax", "bx", "zkey", "file_id")
    }),
    // rank-balanced range-partition planner: exact quantile boundaries
    // + honest per-range row counts (ties surface as empty ranges)
    "q296_range_planner" -> ((s, dir) =>
      canon(graft.core.Layout.rangePlanner(ev(s, dir), "value",
        numPartitions = 16))),
    // integer fixed-point PageRank, 5 unrolled iterations in the oracle;
    // rank12 longs hash-compare exactly (no float tolerance)
    "q201_pagerank" -> ((s, dir) =>
      canon(graft.graph.Graph.pageRank(bipartite(s, dir), "src", "dst",
        iters = 5))),
    // sampled harmonic centrality: 8 md5-chosen sources, min-plus BFS,
    // exact Σ12/d integers
    "q356_harmonic" -> ((s, dir) =>
      canon(graft.graph.Graph.harmonicCentrality(bipartite(s, dir),
        "src", "dst", sources = 8, maxDepth = 4))),
    // reciprocity of the DIRECTED consecutive-user graph (count ≥ 3;
    // chain is partition-local — lead within event_type, as q204)
    "q357_reciprocity" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val de = ev(s, dir).select(col("user_id").cast("string").as("ua"),
        lead(col("user_id").cast("string"), 1)
          .over(Window.partitionBy("event_type").orderBy("event_id")).as("ub"))
        .where(col("ub").isNotNull && col("ua") =!= col("ub"))
        .groupBy(col("ua"), col("ub")).agg(count(lit(1)).as("c"))
        .where(col("c") >= 3)
      canon(graft.graph.Graph.reciprocity(de, "ua", "ub"))
    }),
    "q202_degrees" -> ((s, dir) =>
      canon(graft.graph.Graph.degrees(bipartite(s, dir), "src", "dst"))),
    // personalized PageRank from the event_type side as the seed set —
    // the "seed corpus + expand" curation shape
    "q203_ppr" -> ((s, dir) => {
      val seeds = bipartite(s, dir).select(col("src").as("node"))
        .where(col("node").startsWith("t:")).distinct()
      canon(graft.graph.Graph.personalizedPageRank(bipartite(s, dir),
        "src", "dst", seeds, iters = 5))
    }),
    // per-node triangle count over the consecutive-user adjacency graph
    // (the bipartite graph is triangle-free by construction; this edge
    // set exercises the wedge join for real — the chain is partition-
    // local, lead within event_type, r9 verdict item 5)
    "q204_triangles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = ev(s, dir).select(col("user_id").cast("string").as("a"),
        lead(col("user_id").cast("string"), 1)
          .over(Window.partitionBy("event_type").orderBy("event_id")).as("b"))
        .where(col("b").isNotNull && col("a") =!= col("b"))
      canon(graft.graph.Graph.triangles(e, "a", "b"))
    }),
    // global transitivity 3T/W on the q204 adjacency — the one-row
    // graph-health summary
    "q250_transitivity" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = ev(s, dir).select(col("user_id").cast("string").as("a"),
        lead(col("user_id").cast("string"), 1)
          .over(Window.partitionBy("event_type").orderBy("event_id")).as("b"))
        .where(col("b").isNotNull && col("a") =!= col("b"))
      canon(graft.graph.Graph.transitivity(e, "a", "b"))
    }),
    // local clustering coefficient on the q204 adjacency — triangle
    // closure rate of each node's neighborhood
    "q241_clustering_coeff" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = ev(s, dir).select(col("user_id").cast("string").as("a"),
        lead(col("user_id").cast("string"), 1)
          .over(Window.partitionBy("event_type").orderBy("event_id")).as("b"))
        .where(col("b").isNotNull && col("a") =!= col("b"))
      canon(graft.graph.Graph.clusteringCoefficient(e, "a", "b"))
    }),
    // synchronous LPA communities on the sparse (minCount=3) user graph;
    // 3 rounds, min-label tie rule — labels hash-compare exactly
    "q205_lpa" -> ((s, dir) =>
      canon(graft.graph.Graph.labelPropagation(chainPairs(s, dir, 3),
        "a", "b", iters = 3))),
    // HITS over the directed consecutive-user graph, 5 iterations of
    // integer fixed-point with div-by-max renormalization
    "q206_hits" -> ((s, dir) =>
      canon(graft.graph.Graph.hits(chainDirected(s, dir), "a", "b",
        iters = 5))),
    // 3-round k=3 peel on the sparser (minCount=4) graph — degrees run
    // 1–7 there, so the peel actually removes shallow-core nodes
    "q207_kcore" -> ((s, dir) =>
      canon(graft.graph.Graph.kcore(chainPairs(s, dir, 4), "a", "b",
        k = 3, rounds = 3))),
    "q208_linkpred" -> ((s, dir) =>
      canon(graft.graph.Graph.linkPredict(chainPairs(s, dir, 3), "a", "b"))),
    // weighted PageRank over co-occurrence counts (both directions,
    // weight = repeat count) — the signal the unweighted walk drops
    "q221_pagerank_weighted" -> ((s, dir) => {
      val cp = chainCounted(s, dir, 2)
      val both = cp.select(col("a").as("src"), col("b").as("dst"),
          col("c").as("w"))
        .union(cp.select(col("b").as("src"), col("a").as("dst"),
          col("c").as("w")))
      canon(graft.graph.Graph.pageRankWeighted(both, "src", "dst", "w",
        iters = 5))
    }),
    // md5-deterministic random walks (2 per node, 4 steps) on the
    // sparse user graph — the DeepWalk sequence feed, exactly replayable
    "q229_random_walks" -> ((s, dir) =>
      canon(graft.graph.Graph.randomWalks(chainPairs(s, dir, 3), "a", "b",
        walksPerNode = 2, walkLen = 4, salt = "w"))),
    // bipartite user→type projection: type–type co-occurrence weights
    "q228_bipartite_project" -> ((s, dir) =>
      canon(graft.graph.Graph.project(
        ev(s, dir).select(col("user_id"), col("event_type")),
        "user_id", "event_type"))),
    // star-contraction connected components on the sparse user graph,
    // gated against a recursive-closure oracle
    "q223_components" -> ((s, dir) =>
      canon(graft.graph.Graph.connectedComponents(chainPairs(s, dir, 4),
        "a", "b"))),
    "q209_assortativity" -> ((s, dir) =>
      canon(graft.graph.Graph.assortativity(chainPairs(s, dir, 3), "a", "b"))),
    // modularity of the 3-round LPA labeling — did LPA find structure?
    "q210_modularity" -> ((s, dir) => {
      val e = chainPairs(s, dir, 3)
      canon(graft.graph.Graph.modularity(e, "a", "b",
        graft.graph.Graph.labelPropagation(e, "a", "b", iters = 3)))
    }),
    "q36_outlier_counter" -> ((s, dir) =>
      canon(PostOps.outlierCounter(StatQueries.zscored(s, dir), Seq("event_type")))),
    "q37_hierarchy_rollup" -> ((s, dir) =>
      canon(PostOps.hierarchyRollup(StatQueries.zscored(s, dir), hierarchyDf(s),
        "event_type", "user_id", expr("ts div 3600000000000"), "value"))),
    "q38_pseudo_relevance" -> ((s, dir) =>
      canon(PostOps.pseudoRelevanceThreshold(StatQueries.zscored(s, dir),
        Seq("event_type"), topFrac = 0.05, minCount = 100L, defaultThreshold = 3.0))),
    "q39_threshold_learner" -> ((s, dir) => {
      val labeled = StatQueries.zscored(s, dir)
        .withColumn("label", when(col("value") > 100.0, "T").otherwise("F"))
      canon(PostOps.thresholdLearner(labeled, Seq("event_type"), "score", "label",
        Seq(0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0)))
    }),
    "q40_dist_sorter" -> ((s, dir) =>
      canon(PostOps.distributionSorter(
        Fitters.histogram(ev(s, dir), Seq("event_type"), Seq(("value", 10.0))),
        Seq("event_type")))),
    "q41_entropy_sorter" -> ((s, dir) =>
      canon(PostOps.entropySorter(
        Fitters.histogram(ev(s, dir), Seq("event_type"), Seq(("value", 10.0))),
        Seq("event_type"), maxItems = 10))),
    "q42_knn_avg_dist" -> ((s, dir) =>
      canon(Proximity.averageDistanceFromKnn(nn5(s, dir), k = 5))),
    "q43_neighbor_density" -> ((s, dir) =>
      canon(Proximity.neighborDensityFromKnn(nn5(s, dir), k = 5))),
    "q44_relative_density" -> ((s, dir) =>
      canon(Proximity.relativeDensityFromKnn(nn5(s, dir), k = 5))),
    "q45_lof" -> ((s, dir) =>
      canon(Proximity.lofFromKnn(nn5(s, dir), k = 5))),
    // leave-one-out 5-NN majority-vote label audit over embeddings
    "q324_knn_classify" -> ((s, dir) =>
      canon(Proximity.knnClassify(nn5(s, dir), emb(s, dir), "vec_id",
        "label"))),
    "q72_perkey_threshold_tag" -> ((s, dir) => {
      // per-key threshold override path (OutlierUtility.scala:101-124):
      // learn a threshold per key via pseudo-relevance, retag scores with
      // it. The scored frame feeds both the threshold fit and the retag —
      // persist so the fit+score pipeline runs once (at scale this is the
      // checkpoint-the-scores-then-calibrate layout).
      val scored = StatQueries.zscored(s, dir)
        .localCheckpoint(true)
      val thr = PostOps.pseudoRelevanceThreshold(scored, Seq("event_type"),
        topFrac = 0.05, minCount = 100L, defaultThreshold = 3.0)
        .select(col("event_type"), col("threshold"))
      canon(scored.drop("tag")
        .join(broadcast(thr), Seq("event_type"), "left")
        .withColumn("tag", graft.core.label(col("score"), col("threshold")))
        .select("event_id", "event_type", "score", "threshold", "tag"))
    }),
    // md5-derived subsamples and splits (fitDeterministic): the grown
    // trees are bit-identical cross-engine, so the whole forest replays
    // as unrolled per-depth SQL (oracle below)
    "q46_iforest" -> ((s, dir) => {
      val data = ev(s, dir)
      // node-array fit + score: one model materialization, zero
      // Dataset encode/decode round-trips (r11 verdict item 8)
      val model = IsolationForest.fitDeterministicNodes(data, Seq("event_type"),
        Seq("value"), "event_id", numTrees = 50, subsampleSize = 64, maxDepth = 6)
      canon(IsolationForest.scoreNodes(data, model, Seq("event_type"), Seq("value"),
        "event_id", subsampleSize = 64).toDF())
    }),
    // incremental merge (reference multi/IsolationForestMerge.scala:68-190):
    // fit the deterministic forest on the md5-selected 80% of events, then
    // route the held-out 20% down the trees and grow the landed-in leaf
    // sizes — the updated model is the output, SQL-replayed below
    "q99_iforest_merge" -> ((s, dir) => {
      val data = ev(s, dir)
      val isNew = graft.text.TextOps.hash56(col("event_id").cast("string")) % 5 === 0
      val model = IsolationForest.fitDeterministicNodes(data.where(!isNew),
        Seq("event_type"), Seq("value"), "event_id",
        numTrees = 50, subsampleSize = 64, maxDepth = 6)
      canon(IsolationForest.mergeNodes(model, data.where(isNew),
        Seq("event_type"), Seq("value")).toDF())
    }),
    // deterministic fit (md5-ordered sample + fixed Lloyd + 5dp-rounded
    // centroids) -> the full operator, fit included, is SQL-replayable
    "q47_cblof" -> ((s, dir) =>
      canon(ClusterScore.cblofDeterministic(table(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        Seq("l_orderkey", "l_linenumber"), k = 8,
        largeFraction = 0.9, iters = 10, maxSample = 20000)
        .select("l_orderkey", "l_linenumber", "score"))),
    "q48_pca_score" -> ((s, dir) =>
      canon(ClusterScore.pcaScore(table(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice"), nComponents = 1)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "score"))),
    // 1-D DBSCAN per event_type: RANGE-frame neighbor counts, gap-chained
    // core clusters, nearest-core border attach, noise tagged 'O'. Every
    // number is raw-double window arithmetic — the oracle replays the
    // operator without any rounding device
    "q182_dbscan" -> ((s, dir) =>
      canon(ClusterScore.dbscan1d(
        ev(s, dir).select("event_id", "event_type", "value"),
        Seq("event_type"), "value", "event_id", eps = 0.5, minPts = 5))),
    // grid-bucketed 2-D DBSCAN over the embedding plane (dims 1-2):
    // ε/√2 cells → 25-offset equi-join for pairs, dedup-family connected
    // components for core chains, nearest-core border attach — all
    // raw-double arithmetic, recursive-CTE closure in the oracle
    "q186_dbscan_grid" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("ex"),
        element_at(col("embedding"), 2).cast("double").as("ey"))
      canon(ClusterScore.dbscanGrid(e, "vec_id", "ex", "ey",
        eps = 0.05, minPts = 5))
    }),
    // per-record outlier explanation: z² share per attribute + argmax
    // culprit — the same broadcast-wide-model pass as q05's zscore
    "q190_zscore_attribution" -> ((s, dir) => {
      val attrs = Seq("l_quantity", "l_extendedprice", "l_discount")
      val li = table(s, dir, "lineitem")
        .select((Seq("l_returnflag", "l_orderkey", "l_linenumber") ++ attrs)
          .map(col): _*)
      val stats = Fitters.stats(li, Seq("l_returnflag"), attrs)
      canon(graft.score.Scorers.zscoreAttribution(li, stats,
        graft.score.Scorers.Cfg(Seq("l_returnflag"), attrs, threshold = 3.0))
        .select("l_orderkey", "l_linenumber", "l_quantity_share",
          "l_extendedprice_share", "l_discount_share", "topAttr"))
    }),
    // the q186 planning primitive: occupancy histogram + per-occupancy
    // pair bound — two hash aggs, run before committing to the pair join
    "q188_cell_occupancy" -> ((s, dir) => {
      val e = emb(s, dir).select(
        element_at(col("embedding"), 1).cast("double").as("ex"),
        element_at(col("embedding"), 2).cast("double").as("ey"))
      ClusterScore.cellOccupancy(e, "ex", "ey", eps = 0.05)
    }),
    // ECOD tail scorer per returnflag over three lineitem measures —
    // the parameter-free multivariate complement to q32/q45
    "q231_ecod" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag",
          "l_quantity", "l_extendedprice", "l_discount")
      canon(graft.multi.TailScores.ecod(li, Seq("l_returnflag"),
        Seq("l_quantity", "l_extendedprice", "l_discount"), threshold = 12.0)
        .select("l_orderkey", "l_linenumber", "l_returnflag",
          "l_quantity", "l_extendedprice", "l_discount", "score", "tag"))
    }),
    // HBOS histogram scorer, same population — fit and score in one pass
    "q232_hbos" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag",
          "l_quantity", "l_extendedprice", "l_discount")
      canon(graft.multi.TailScores.hbos(li, Seq("l_returnflag"),
        Seq(("l_quantity", 10.0), ("l_extendedprice", 10000.0),
          ("l_discount", 0.02)), threshold = 14.0)
        .select("l_orderkey", "l_linenumber", "l_returnflag",
          "l_quantity", "l_extendedprice", "l_discount", "score", "tag"))
    }),
    // generalized ESD (Rosner) per event_type: 3 rounds of exact-integer
    // arg-max removal; Grubbs' test is this with maxOutliers = 1
    "q285_esd" -> ((s, dir) => {
      canon(graft.multi.TailScores.esd(ev(s, dir), Seq("event_type"),
        "event_id", "value", maxOutliers = 3,
        critical = Seq(3.5, 3.5, 3.5)))
    }),
    // seasonal-hybrid ESD (the Twitter AnomalyDetection shape): STL-ish
    // decompose (q129) then generalized ESD (q285) on the residual —
    // point anomalies that survive trend+seasonality removal
    "q301_shesd" -> ((s, dir) => {
      val sd = graft.seq.SeqOps.seasonalDecompose(ev(s, dir),
        Seq("event_type"), "event_id", "value", period = 24)
        .select(col("event_type"), col("seq"), col("resid"))
      canon(graft.multi.TailScores.esd(sd, Seq("event_type"), "seq",
        "resid", maxOutliers = 3, critical = Seq(3.5, 3.5, 3.5)))
    }),
  )

  private val zCte =
    """zstats AS (SELECT event_type, avg(value) AS mean, stddev_samp(value) AS std
      | FROM events GROUP BY event_type),
      |z AS (SELECT e.*, abs(e.value - s.mean)/s.std AS score,
      |  CASE WHEN abs(e.value - s.mean)/s.std > 2.0 THEN 'O' ELSE 'N' END AS tag
      | FROM events e JOIN zstats s USING (event_type))"""
      .stripMargin.replace("\n", " ")

  private val histCte =
    """hist AS (SELECT event_type, CAST(floor(value/10.0) AS BIGINT)::VARCHAR AS bucket,
      | count(*) AS cnt FROM events GROUP BY 1, 2),
      |histn AS (SELECT event_type, bucket, cnt,
      | cnt / (sum(cnt) OVER (PARTITION BY event_type))::DOUBLE AS freq FROM hist)"""
      .stripMargin.replace("\n", " ")

  private val pairsCte =
    """p AS (SELECT a.vec_id AS src, b.vec_id AS trg,
      |  list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS dist
      | FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id),
      |nn AS (SELECT src, trg, dist,
      |  row_number() OVER (PARTITION BY src ORDER BY dist ASC, trg) AS rank
      | FROM p QUALIFY rank <= 5),
      |dens AS (SELECT src, avg(dist) AS avgDist,
      |  CASE WHEN avg(dist) > 0 THEN 1.0/avg(dist) END AS density
      | FROM nn GROUP BY src)""".stripMargin.replace("\n", " ")

  /** Full SQL replay of the deterministic CBLOF, fit included: the
    * md5-ordered 20k sample, evenly spaced init, 10 unrolled Lloyd
    * iterations with 5dp-rounded centroid updates (MATERIALIZED — the
    * chained CTEs would otherwise inline exponentially), then the scoring
    * passes (assignment + sizes → large clusters → distance score).
    * Distances are written in the kernel's left-assoc summation order so
    * every double matches [[ClusterScore.cblofDeterministic]] bit-for-bit;
    * only the per-iteration avg differs by float summation order, which
    * the 5dp centroid rounding absorbs on both sides. */
  private val cblofSql: String = {
    val iters = 10
    def dist(a: String, c: String) =
      s"($a.x1-$c.c1)*($a.x1-$c.c1) + ($a.x2-$c.c2)*($a.x2-$c.c2) + ($a.x3-$c.c3)*($a.x3-$c.c3)"
    val head =
      s"""s0 AS (SELECT l_quantity AS x1, l_extendedprice AS x2, l_discount AS x3,
         |  md5(l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR) AS h
         | FROM lineitem ORDER BY h, x1, x2, x3 LIMIT 20000),
         |samp AS MATERIALIZED (SELECT x1, x2, x3,
         |  row_number() OVER (ORDER BY h, x1, x2, x3) AS rn FROM s0),
         |sn AS (SELECT count(*) AS n FROM samp),
         |c0 AS (SELECT t.i AS cell, s.x1 AS c1, s.x2 AS c2, s.x3 AS c3
         | FROM (SELECT unnest(range(8)) AS i) t, sn
         | JOIN samp s ON s.rn = (t.i * sn.n) // 8 + 1)""".stripMargin
    val lloyd = (1 to iters).map { t =>
      s"""a$t AS MATERIALIZED (SELECT s.rn, s.x1, s.x2, s.x3,
         |  (min({'d': ${dist("s", "c")}, 'c': c.cell})).c AS cell
         | FROM samp s CROSS JOIN c${t - 1} c GROUP BY s.rn, s.x1, s.x2, s.x3),
         |c$t AS MATERIALIZED (SELECT p.cell,
         |  coalesce(round(avg(a.x1), 5), p.c1) AS c1,
         |  coalesce(round(avg(a.x2), 5), p.c2) AS c2,
         |  coalesce(round(avg(a.x3), 5), p.c3) AS c3
         | FROM c${t - 1} p LEFT JOIN a$t a ON a.cell = p.cell
         | GROUP BY p.cell, p.c1, p.c2, p.c3)""".stripMargin
    }
    val score =
      s"""f AS (SELECT l_orderkey, l_linenumber, l_quantity AS x1,
         |  l_extendedprice AS x2, l_discount AS x3 FROM lineitem),
         |asg AS MATERIALIZED (SELECT f.l_orderkey, f.l_linenumber, f.x1, f.x2, f.x3,
         |  (min({'d': ${dist("f", "c")}, 'c': c.cell})).c AS cell,
         |  min(${dist("f", "c")}) AS d2
         | FROM f CROSS JOIN c$iters c GROUP BY 1, 2, 3, 4, 5),
         |sz AS (SELECT cell, count(*) AS cnt FROM asg GROUP BY cell),
         |szc AS (SELECT cell, cnt,
         |  sum(cnt) OVER (ORDER BY cnt DESC, cell) AS cum,
         |  row_number() OVER (ORDER BY cnt DESC, cell) AS rk,
         |  sum(cnt) OVER () AS tot FROM sz),
         |lrg AS (SELECT s.cell, c.c1, c.c2, c.c3
         | FROM szc s JOIN c$iters c USING (cell)
         | WHERE s.rk <= (SELECT min(rk) FROM szc
         |   WHERE cum::DOUBLE >= 0.9 * tot::DOUBLE)),
         |sc AS (SELECT a.l_orderkey, a.l_linenumber, a.cell, a.d2,
         |  min(${dist("a", "l")}) AS dbig, bool_or(a.cell = l.cell) AS isLarge
         | FROM asg a CROSS JOIN lrg l GROUP BY 1, 2, 3, 4)""".stripMargin
    ((Seq(head) ++ lloyd ++ Seq(score)).mkString("WITH ", ", ", "") +
      """
        |SELECT l_orderkey, l_linenumber,
        | round(sqrt(CASE WHEN isLarge THEN d2 ELSE dbig END), 4) AS score
        |FROM sc""".stripMargin).replace("\n", " ")
  }

  // ==== shared md5-deterministic isolation-forest oracle fragments ====
  // (q46 fit+score and q99 fit+incremental-merge; single-attribute case —
  // what the driver queries exercise; multi-attr forests stay spec-checked)
  private val IfTrees = 50
  private val IfSub = 64
  private val IfDepth = 6
  private def ifFrac(pfx: String) =
    s"(('0x'||substr(md5('$pfx:'||key||':'||t::VARCHAR||':'||path),1,13))::BIGINT" +
      " / 4503599627370496.0)"
  private def ifCFn(sz: String) =
    s"CASE WHEN $sz <= 1 THEN 0.0 ELSE " +
      s"2*(ln($sz - 1.0) + 0.5772156649) - 2*($sz - 1.0)/$sz END"
  private val IfInternal = "sz > 1 AND lo < hi AND nlt > 0 AND nlt < sz"

  /** Fit replay over `evWhere`-filtered events: per-tree subsamples
    * (first 64 by md5(t:id)), growth unrolled one CTE triple per depth
    * (node stats + split fraction from the 52-bit md5 prefix + routed
    * points), ending in the leaf table `lf` and internal-node table
    * `inod`. min/max/compare are exact floats, so the grown trees are
    * bit-identical cross-engine. */
  private def ifGrowthCtes(evWhere: String): String = {
    val head =
      s"""ev AS (SELECT event_type::VARCHAR AS key, event_id AS id, value AS x
         |  FROM events $evWhere),
         |trs AS (SELECT unnest(range($IfTrees)) AS t),
         |sm AS MATERIALIZED (SELECT key, t, x FROM (
         |  SELECT e.key, trs.t, e.x,
         |   row_number() OVER (PARTITION BY e.key, trs.t
         |     ORDER BY (greatest(1, ((trs.t+1)*1103515245+12345) % 2147483647)
         |         * (('0x'||substr(md5(e.id::VARCHAR),1,14))::BIGINT % 2147483647)
         |         + ((trs.t+1)*69069+7) % 2147483647) % 2147483647,
         |       e.x) AS rn
         |  FROM ev e CROSS JOIN trs) WHERE rn <= $IfSub),
         |p0 AS (SELECT key, t, 'R' AS path, x FROM sm)""".stripMargin
    val growth = (0 until IfDepth).map { d =>
      s"""n$d AS (SELECT key, t, path, count(*) AS sz, min(x) AS lo, max(x) AS hi,
         |  min(x) + ${ifFrac("s")} * (max(x) - min(x)) AS split
         | FROM p$d GROUP BY key, t, path),
         |i$d AS MATERIALIZED (SELECT n.key, n.t, n.path, n.sz, n.lo, n.hi, n.split,
         |  sum(CASE WHEN p.x < n.split THEN 1 ELSE 0 END) AS nlt
         | FROM n$d n JOIN p$d p USING (key, t, path)
         | GROUP BY n.key, n.t, n.path, n.sz, n.lo, n.hi, n.split),
         |p${d + 1} AS MATERIALIZED (SELECT p.key, p.t,
         |  p.path || CASE WHEN p.x < i.split THEN '0' ELSE '1' END AS path, p.x
         | FROM p$d p JOIN i$d i USING (key, t, path)
         | WHERE i.$IfInternal)""".stripMargin
    }
    val leaves = ((0 until IfDepth).map { d =>
      s"SELECT key, t, path, sz, $d AS depth FROM i$d WHERE NOT ($IfInternal)"
    } :+ s"SELECT key, t, path, count(*) AS sz, $IfDepth AS depth" +
      s" FROM p$IfDepth GROUP BY key, t, path").mkString(" UNION ALL ")
    val inod = (0 until IfDepth)
      .map(d => s"SELECT key, t, path, split FROM i$d WHERE $IfInternal")
      .mkString(" UNION ALL ")
    (Seq(head) ++ growth ++ Seq(
      s"lf AS MATERIALIZED ($leaves)",
      s"inod AS MATERIALIZED ($inod)")).mkString(", ")
  }

  /** Per-row descent of `s0` (key, id, x, t, path='R') down the grown
    * trees, one unrolled step per depth — rows stop at leaf paths. */
  private val ifDescendCtes: String = (0 until IfDepth).map { d =>
    s"""s${d + 1} AS MATERIALIZED (SELECT s.key, s.id, s.x, s.t,
       |  CASE WHEN i.split IS NOT NULL
       |   THEN s.path || CASE WHEN s.x < i.split THEN '0' ELSE '1' END
       |   ELSE s.path END AS path
       | FROM s$d s LEFT JOIN inod i
       |   ON i.key = s.key AND i.t = s.t AND i.path = s.path)""".stripMargin
  }.mkString(", ")

  /** q46: fit on all events, then score every row — avg path length over
    * the 50 trees → 2^(−avgLen/c(64)). Only the final average crosses a
    * float sum, absorbed by the 4dp round. */
  private val iforestSql: String =
    (s"""WITH ${ifGrowthCtes("")},
        |dv AS (SELECT DISTINCT key, id, x FROM ev),
        |s0 AS (SELECT key, id, x, t, 'R' AS path FROM dv CROSS JOIN trs),
        |$ifDescendCtes,
        |pl AS (SELECT s.key, s.id, s.x, avg(l.depth + ${ifCFn("l.sz")}) AS avgLen
        | FROM s$IfDepth s JOIN lf l
        |   ON l.key = s.key AND l.t = s.t AND l.path = s.path
        | GROUP BY s.key, s.id, s.x),
        |cn AS (SELECT ${ifCFn("64.0")} AS v)
        |SELECT e.key, e.id AS rowId, round(pow(2.0, -p.avgLen / cn.v), 4) AS score
        |FROM ev e JOIN pl p ON p.key = e.key AND p.id = e.id AND p.x = e.x, cn"""
      .stripMargin).replace("\n", " ")

  /** q99: fit on the md5-selected 80% of events, then replay the
    * incremental merge ([[IsolationForest.merge]]) of the held-out 20% —
    * every new row descends each of its key's trees and grows the size
    * of the leaf it lands in; internal nodes are untouched. Output = the
    * merged model node table. */
  private val iforestMergeSql: String = {
    val isNew = "(('0x'||substr(md5(event_id::VARCHAR),1,14))::BIGINT % 5) = 0"
    val nodes = ((0 until IfDepth).map { d =>
      s"SELECT key, t, path, 0 AS attr, split, FALSE AS isLeaf, sz, $d AS depth" +
        s" FROM i$d WHERE $IfInternal"
    } :+ "SELECT key, t, path, -1 AS attr, 0.0 AS split, TRUE AS isLeaf, sz, depth FROM lf")
      .mkString(" UNION ALL ")
    (s"""WITH ${ifGrowthCtes(s"WHERE NOT ($isNew)")},
        |nodes AS ($nodes),
        |nv AS (SELECT event_type::VARCHAR AS key, event_id AS id, value AS x
        | FROM events WHERE $isNew),
        |s0 AS (SELECT key, id, x, t, 'R' AS path FROM nv CROSS JOIN trs),
        |$ifDescendCtes,
        |hits AS (SELECT key, t, path, count(*) AS hits
        | FROM s$IfDepth GROUP BY key, t, path)
        |SELECT n.key, n.t::INT AS treeId, n.path, n.attr::INT AS attr,
        | round(n.split, 4) AS split, n.isLeaf,
        | (n.sz + coalesce(h.hits, 0))::INT AS size, n.depth::INT AS depth
        |FROM nodes n LEFT JOIN hits h
        | ON h.key = n.key AND h.t = n.t AND h.path = n.path"""
      .stripMargin).replace("\n", " ")
  }

  // Both-direction bipartite edge set shared by the graph-family oracles.
  private[queries] val bipartiteSql =
    """eb AS (SELECT 'u:' || user_id::VARCHAR AS src, 't:' || event_type AS dst
      |  FROM events),
      |edges AS (SELECT DISTINCT src, dst FROM
      |  (SELECT src, dst FROM eb UNION ALL SELECT dst AS src, src AS dst FROM eb))"""
      .stripMargin.replace("\n", " ")

  // Thresholded consecutive-user graph (chainPairs): canonical a<b pairs
  // kept at count >= minCount, expanded to both directions.
  private[queries] def chainSql(minCount: Int): String =
    s"""ch AS (SELECT user_id::VARCHAR AS a,
       |  lead(user_id::VARCHAR) OVER (PARTITION BY event_type ORDER BY event_id) AS b FROM events),
       |cp AS (SELECT least(a, b) AS a, greatest(a, b) AS b, count(*) AS c
       | FROM ch WHERE b IS NOT NULL AND a <> b GROUP BY 1, 2),
       |und AS (SELECT a, b FROM cp WHERE c >= $minCount),
       |edges AS (SELECT a AS src, b AS dst FROM und
       | UNION ALL SELECT b AS src, a AS dst FROM und)"""
      .stripMargin.replace("\n", " ")

  // `iters` chained LPA stages l1..l{iters} over `edges`: per node the
  // most frequent neighbor label, ties to the min label, replayed via
  // the same (-count, label) struct-min ordering Spark uses.
  private def lpaStages(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""l$i AS MATERIALIZED (SELECT n.node, coalesce(bb.label, n.node) AS label
         | FROM nodes n LEFT JOIN (
         |  SELECT node, (min({'c': c, 'l': label})).l AS label FROM (
         |    SELECT e.dst AS node, p.label, -count(*) AS c
         |    FROM edges e JOIN l${i - 1} p ON p.node = e.src
         |    GROUP BY e.dst, p.label) t
         |  GROUP BY node) bb ON bb.node = n.node)""".stripMargin
        .replace("\n", " ")
    }
    s"""nodes AS (SELECT DISTINCT src AS node FROM edges),
       |l0 AS (SELECT node, node AS label FROM nodes),
       |${steps.mkString(", ")}""".stripMargin.replace("\n", " ")
  }

  // HITS replay: 5 iterations × (authority half-step, hub half-step),
  // each an exact long sum + integer div-by-max renormalization.
  private lazy val hitsOracle: String = {
    val iters = 5
    val sc = 1000000L
    val steps = (1 to iters).flatMap { i =>
      // MATERIALIZED: each half-step is referenced twice (max + renorm);
      // inlined CTEs would re-expand the whole chain ~4× per iteration
      Seq(
        s"""a${i}r AS MATERIALIZED (SELECT n.node, coalesce(s.s, 0)::BIGINT AS s
           | FROM nodes n LEFT JOIN (
           |  SELECT e.dst AS node, sum(p.h)::BIGINT AS s
           |  FROM de e JOIN h${i - 1} p ON p.node = e.src
           |  GROUP BY e.dst) s ON s.node = n.node)""",
        s"""a${i}m AS (SELECT greatest(max(s), 1)::BIGINT AS mx FROM a${i}r)""",
        s"""a$i AS MATERIALIZED (SELECT node, ((s * $sc) // mx)::BIGINT AS a
           | FROM a${i}r CROSS JOIN a${i}m)""",
        s"""h${i}r AS MATERIALIZED (SELECT n.node, coalesce(s.s, 0)::BIGINT AS s
           | FROM nodes n LEFT JOIN (
           |  SELECT e.src AS node, sum(p.a)::BIGINT AS s
           |  FROM de e JOIN a$i p ON p.node = e.dst
           |  GROUP BY e.src) s ON s.node = n.node)""",
        s"""h${i}m AS (SELECT greatest(max(s), 1)::BIGINT AS mx FROM h${i}r)""",
        s"""h$i AS MATERIALIZED (SELECT node, ((s * $sc) // mx)::BIGINT AS h
           | FROM h${i}r CROSS JOIN h${i}m)""")
        .map(_.stripMargin.replace("\n", " "))
    }
    s"""WITH ch AS (SELECT user_id::VARCHAR AS a,
       |  lead(user_id::VARCHAR) OVER (PARTITION BY event_type ORDER BY event_id) AS b FROM events),
       |de AS (SELECT DISTINCT a AS src, b AS dst FROM ch
       | WHERE b IS NOT NULL AND a <> b),
       |nodes AS (SELECT src AS node FROM de UNION SELECT dst FROM de),
       |h0 AS (SELECT node, ${sc}::BIGINT AS h FROM nodes),
       |${steps.mkString(", ")}
       |SELECT h.node, h.h AS hub6, a.a AS auth6,
       | round(h.h::DOUBLE / $sc.0, 4) AS hub,
       | round(a.a::DOUBLE / $sc.0, 4) AS auth
       |FROM h$iters h JOIN a$iters a ON a.node = h.node""".stripMargin
      .replace("\n", " ")
  }

  // k-core replay: 3 chained peel rounds (alive = pr still -1), then the
  // surviving-subgraph degree for the core_deg column.
  private lazy val kcoreOracle: String = {
    val (k, rounds) = (3, 3)
    def degOn(state: String) =
      s"""SELECT e.src AS node, count(*)::BIGINT AS d FROM edges e
         | JOIN $state x ON x.node = e.src AND x.pr = -1
         | JOIN $state y ON y.node = e.dst AND y.pr = -1
         | GROUP BY e.src""".stripMargin.replace("\n", " ")
    val steps = (1 to rounds).map { i =>
      s"""s$i AS MATERIALIZED (SELECT s.node,
         | (CASE WHEN s.pr <> -1 THEN s.pr
         |   WHEN coalesce(d.d, 0) < $k THEN $i ELSE -1 END)::BIGINT AS pr
         | FROM s${i - 1} s LEFT JOIN (${degOn(s"s${i - 1}")}) d
         |  ON d.node = s.node)""".stripMargin.replace("\n", " ")
    }
    s"""WITH ${chainSql(4)},
       |s0 AS (SELECT DISTINCT src AS node, (-1)::BIGINT AS pr FROM edges),
       |${steps.mkString(", ")},
       |cd AS (${degOn(s"s$rounds")})
       |SELECT s.node, s.pr AS peel_round,
       | (CASE WHEN s.pr = -1 THEN coalesce(cd.d, 0) ELSE 0 END)::BIGINT
       |   AS core_deg,
       | s.pr = -1 AS alive
       |FROM s$rounds s LEFT JOIN cd ON cd.node = s.node""".stripMargin
      .replace("\n", " ")
  }

  // weighted-PageRank replay: contribution (r·w) // Σw, same integer
  // update as pageRankOracle
  private lazy val pageRankWeightedOracle: String = {
    val iters = 5
    val steps = (1 to iters).map { i =>
      s"""r$i AS (SELECT nodes.node,
         |  ((15 * 1000000000000) // (100 * nn.n)
         |    + (85 * coalesce(m.s, 0)) // 100)::BIGINT AS r
         | FROM nodes CROSS JOIN nn LEFT JOIN (
         |   SELECT e.dst AS node, sum((p.r * e.w) // s.sw)::BIGINT AS s
         |   FROM edges e JOIN r${i - 1} p ON e.src = p.node
         |   JOIN sw s ON s.src = e.src
         |   GROUP BY e.dst) m ON m.node = nodes.node)""".stripMargin
        .replace("\n", " ")
    }
    s"""WITH ch AS (SELECT user_id::VARCHAR AS a,
       |  lead(user_id::VARCHAR) OVER (PARTITION BY event_type ORDER BY event_id) AS b FROM events),
       |cp AS (SELECT least(a, b) AS a, greatest(a, b) AS b,
       |  count(*)::BIGINT AS c
       | FROM ch WHERE b IS NOT NULL AND a <> b GROUP BY 1, 2),
       |u2 AS (SELECT a, b, c FROM cp WHERE c >= 2),
       |edges AS (SELECT a AS src, b AS dst, c AS w FROM u2
       | UNION ALL SELECT b AS src, a AS dst, c AS w FROM u2),
       |sw AS (SELECT src, sum(w)::BIGINT AS sw FROM edges GROUP BY src),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
       |r0 AS (SELECT node, (1000000000000 // n)::BIGINT AS r
       |  FROM nodes CROSS JOIN nn),
       |${steps.mkString(", ")}
       |SELECT node, r AS rank12,
       | round(r::DOUBLE / 1000000000000.0, 4) AS rank
       |FROM r$iters""".stripMargin.replace("\n", " ")
  }

  private lazy val componentsOracle: String =
    s"""WITH RECURSIVE ${chainSql(4)},
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |reach(id, label) AS (
       | SELECT node, node FROM nodes
       | UNION
       | SELECT e.src, r.label FROM reach r JOIN edges e ON e.dst = r.id)
       |SELECT id AS node, min(label) AS component
       |FROM reach GROUP BY id""".stripMargin.replace("\n", " ")

  // random-walk replay: per step, neighbor idx = md5 56-bit of
  // "w:start:walk:step" mod degree (+1) over the dst-sorted adjacency
  private lazy val randomWalksOracle: String = {
    def h(stepExpr: String) =
      s"('0x'||substr(md5('w:' || w.start || ':' || w.walk::VARCHAR || " +
        s"':' || $stepExpr),1,14))::BIGINT"
    val steps = (1 to 4).map { i =>
      s"""w$i AS (SELECT w.start, w.walk, ${i}::BIGINT AS step,
         | a.dst AS node
         | FROM w${i - 1} w JOIN adj a ON a.src = w.node
         |  AND a.idx = (${h(s"'${i - 1}'")} % a.deg) + 1)""".stripMargin
        .replace("\n", " ")
    }
    s"""WITH ${chainSql(3)},
       |adj AS (SELECT src, dst,
       |  row_number() OVER (PARTITION BY src ORDER BY dst)::BIGINT AS idx,
       |  count(*) OVER (PARTITION BY src)::BIGINT AS deg FROM edges),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |w0 AS (SELECT node AS start, wk::BIGINT AS walk, 0::BIGINT AS step,
       |  node FROM nodes CROSS JOIN (SELECT unnest(range(0, 2)) AS wk)),
       |${steps.mkString(", ")}
       |SELECT start, walk, step, node FROM w0
       |UNION ALL SELECT start, walk, step, node FROM w1
       |UNION ALL SELECT start, walk, step, node FROM w2
       |UNION ALL SELECT start, walk, step, node FROM w3
       |UNION ALL SELECT start, walk, step, node FROM w4""".stripMargin
      .replace("\n", " ")
  }

  private lazy val linkpredOracle: String =
    s"""WITH ${chainSql(3)},
       |deg AS (SELECT src AS node, count(*)::BIGINT AS d
       |  FROM edges GROUP BY src),
       |mid AS (SELECT e.src, e.dst, d.d FROM edges e
       | JOIN deg d ON d.node = e.src WHERE d.d <= 10000),
       |w AS (SELECT e1.dst AS a, e2.dst AS b, e1.d AS dw
       | FROM mid e1 JOIN mid e2
       |  ON e1.src = e2.src AND e1.dst < e2.dst),
       |sc AS (SELECT a, b, count(*)::BIGINT AS cn,
       |  sum(floor(1000000.0 / ln(dw::DOUBLE) + 0.5)::BIGINT)::BIGINT AS aa6
       | FROM w GROUP BY a, b),
       |ne AS (SELECT sc.* FROM sc LEFT JOIN edges e
       |  ON e.src = sc.a AND e.dst = sc.b WHERE e.src IS NULL)
       |SELECT ne.a, ne.b, ne.cn, da.d AS da, db.d AS db,
       | round(ne.cn::DOUBLE / (da.d + db.d - ne.cn), 4) AS jaccard,
       | round(ne.aa6::DOUBLE / 1000000.0, 4) AS adamic_adar
       |FROM ne JOIN deg da ON da.node = ne.a
       |JOIN deg db ON db.node = ne.b""".stripMargin.replace("\n", " ")

  private lazy val assortativityOracle: String =
    s"""WITH ${chainSql(3)},
       |deg AS (SELECT src AS node, count(*)::BIGINT AS d
       |  FROM edges GROUP BY src),
       |j AS (SELECT da.d AS da, db.d AS db FROM und u
       | JOIN deg da ON da.node = u.a JOIN deg db ON db.node = u.b),
       |agg AS (SELECT count(*)::BIGINT AS m, sum(da * db)::BIGINT AS sjk,
       |  sum(da + db)::BIGINT AS sj,
       |  sum(da * da + db * db)::BIGINT AS sjj FROM j),
       |parts AS (SELECT m,
       |  sjk::DOUBLE / m - (sj::DOUBLE / (2.0 * m)) * (sj::DOUBLE / (2.0 * m))
       |    AS num,
       |  sjj::DOUBLE / (2.0 * m)
       |   - (sj::DOUBLE / (2.0 * m)) * (sj::DOUBLE / (2.0 * m)) AS den
       | FROM agg)
       |SELECT m, round(CASE WHEN den <> 0 THEN num / den END, 4)
       |  AS assortativity FROM parts""".stripMargin.replace("\n", " ")

  private lazy val modularityOracle: String =
    s"""WITH ${chainSql(3)},
       |${lpaStages(3)},
       |deg AS (SELECT src AS node, count(*)::BIGINT AS d
       |  FROM edges GROUP BY src),
       |degc AS (SELECT p.label, sum(d.d)::BIGINT AS dc FROM deg d
       | JOIN l3 p ON p.node = d.node GROUP BY p.label),
       |ec AS (SELECT la.label,
       |  sum(CASE WHEN la.label = lb.label THEN 1 ELSE 0 END)::BIGINT AS ec
       | FROM und u JOIN l3 la ON la.node = u.a
       | JOIN l3 lb ON lb.node = u.b GROUP BY la.label),
       |mm AS (SELECT count(*)::BIGINT AS m FROM und),
       |j AS (SELECT dg.label, dg.dc, coalesce(ec.ec, 0)::BIGINT AS ec
       | FROM degc dg LEFT JOIN ec ON ec.label = dg.label)
       |SELECT max(mm.m)::BIGINT AS m_edges, count(*)::BIGINT AS n_communities,
       | round(sum(ec)::DOUBLE / max(mm.m)
       |  - sum(dc * dc)::DOUBLE / (4.0 * max(mm.m) * max(mm.m)), 4) AS q
       |FROM j CROSS JOIN mm""".stripMargin.replace("\n", " ")

  // PageRank replay: 5 unrolled iterations of the identical integer
  // arithmetic (rank12 longs at 10¹² scale; contributions r // outdeg,
  // update teleport + (85·S) // 100) — the hash compare is exact on the
  // longs, no float tolerance anywhere.
  private lazy val pageRankOracle: String = {
    val iters = 5
    val steps = (1 to iters).map { i =>
      s"""r$i AS (SELECT nodes.node,
         |  ((15 * 1000000000000) // (100 * nn.n)
         |    + (85 * coalesce(m.s, 0)) // 100)::BIGINT AS r
         | FROM nodes CROSS JOIN nn LEFT JOIN (
         |   SELECT e.dst AS node, sum(p.r // d.od)::BIGINT AS s
         |   FROM edges e JOIN r${i - 1} p ON e.src = p.node
         |   JOIN deg d ON d.src = e.src
         |   GROUP BY e.dst) m ON m.node = nodes.node)""".stripMargin
        .replace("\n", " ")
    }
    s"""WITH $bipartiteSql,
       |deg AS (SELECT src, count(*)::BIGINT AS od FROM edges GROUP BY src),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
       |r0 AS (SELECT node, (1000000000000 // n)::BIGINT AS r
       |  FROM nodes CROSS JOIN nn),
       |${steps.mkString(", ")}
       |SELECT node, r AS rank12,
       | round(r::DOUBLE / 1000000000000.0, 4) AS rank
       |FROM r$iters""".stripMargin.replace("\n", " ")
  }

  // Personalized-PageRank replay: same integer arithmetic as
  // pageRankOracle with the teleport confined to seed nodes (the t: side
  // of the bipartite graph); seed count feeds the constants.
  private lazy val pprOracle: String = {
    val iters = 5
    val steps = (1 to iters).map { i =>
      s"""r$i AS (SELECT nodes.node,
         |  (CASE WHEN nodes.node LIKE 't:%'
         |     THEN (15 * 1000000000000) // (100 * ns.k) ELSE 0 END
         |    + (85 * coalesce(m.s, 0)) // 100)::BIGINT AS r
         | FROM nodes CROSS JOIN ns LEFT JOIN (
         |   SELECT e.dst AS node, sum(p.r // d.od)::BIGINT AS s
         |   FROM edges e JOIN r${i - 1} p ON e.src = p.node
         |   JOIN deg d ON d.src = e.src
         |   GROUP BY e.dst) m ON m.node = nodes.node)""".stripMargin
        .replace("\n", " ")
    }
    s"""WITH $bipartiteSql,
       |deg AS (SELECT src, count(*)::BIGINT AS od FROM edges GROUP BY src),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |ns AS (SELECT count(*)::BIGINT AS k FROM nodes WHERE node LIKE 't:%'),
       |r0 AS (SELECT node, (CASE WHEN node LIKE 't:%'
       |    THEN 1000000000000 // k ELSE 0 END)::BIGINT AS r
       |  FROM nodes CROSS JOIN ns),
       |${steps.mkString(", ")}
       |SELECT node, r AS rank12,
       | round(r::DOUBLE / 1000000000000.0, 4) AS rank
       |FROM r$iters""".stripMargin.replace("\n", " ")
  }

  /** Morton-spread oracle for q295, generated from the SAME mask/shift
    * sequence as Layout.zOrderKey (bits=10, 32 files). */
  private val zorderOracle: String = {
    val masks = Seq(281470681808895L, 71777214294589695L,
      1085102592571150095L, 3689348814741910323L, 6148914691236517205L)
    val shifts = Seq(16, 8, 4, 2, 1)
    val steps = masks.zip(shifts).zipWithIndex.map { case ((m, sh), i) =>
      s"s${i + 1} AS (SELECT event_id, ((a | (a << $sh)) & $m) AS a," +
        s" ((b | (b << $sh)) & $m) AS b FROM s$i)"
    }
    s"""WITH base AS (SELECT event_id,
       |  ((user_id % 1024) + 1024) % 1024 AS ax,
       |  ((CAST(floor(value) AS BIGINT) % 1024) + 1024) % 1024 AS bx
       |  FROM events WHERE value IS NOT NULL),
       |s0 AS (SELECT event_id, ax & 1023 AS a, bx & 1023 AS b FROM base),
       |${steps.mkString(", ")},
       |z AS (SELECT event_id, (a | (b << 1)) AS zkey FROM s5)
       |SELECT base.event_id, ax, bx, zkey,
       | ((zkey * 32) >> 20) AS file_id
       |FROM base JOIN z USING (event_id)""".stripMargin.replace("\n", " ")
  }

  val oracleSql: Map[String, String] = Map(
    "q295_zorder" -> zorderOracle,
    "q296_range_planner" ->
      """WITH vh AS (SELECT
        |  (CASE WHEN value>=0 THEN floor(value*10000.0+0.5)
        |        ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS fp,
        |  count(*)::BIGINT AS ct
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |c AS (SELECT *, sum(ct) OVER (ORDER BY fp
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(ct) OVER () AS n FROM vh),
        |bl AS (SELECT list(fp ORDER BY fp) AS bs FROM (
        |  SELECT c.fp FROM c CROSS JOIN
        |    (SELECT unnest(generate_series(1, 15)) AS i) p
        |  WHERE (cum - ct < CAST(floor(i * n / 16) AS BIGINT))
        |    AND (CAST(floor(i * n / 16) AS BIGINT) <= cum))),
        |a AS (SELECT len(list_filter(bl.bs, x -> x < c.fp))::BIGINT AS pid,
        |  c.fp, c.ct FROM c CROSS JOIN bl),
        |gr AS (SELECT pid, min(fp)::DOUBLE/1e4 AS lo,
        |  max(fp)::DOUBLE/1e4 AS hi, sum(ct)::BIGINT AS n_rows
        |  FROM a GROUP BY 1)
        |SELECT p.pid, round(lo, 4) AS lo, round(hi, 4) AS hi,
        | coalesce(n_rows, 0)::BIGINT AS n_rows
        |FROM (SELECT unnest(generate_series(0, 15))::BIGINT AS pid) p
        |LEFT JOIN gr USING (pid)""".stripMargin.replace("\n", " "),
    "q286_pot_gpd" ->
      """WITH base AS (SELECT event_id, event_type, value,
        |  (CASE WHEN value>=0 THEN floor(value*10000.0+0.5)
        |        ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS fp
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY fp DESC, event_id ASC) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n FROM base),
        |u AS (SELECT event_type, fp AS ufp FROM r
        |  WHERE rn = greatest(CAST(floor(0.1*n) AS BIGINT), 2) + 1),
        |j AS (SELECT r.*, u.ufp, r.fp - u.ufp AS yfp
        |  FROM r LEFT JOIN u USING (event_type)),
        |f AS (SELECT event_type, count(*)::HUGEINT AS m,
        |  sum(yfp::HUGEINT) AS s1, sum(yfp::HUGEINT * yfp::HUGEINT) AS s2
        |  FROM j WHERE yfp > 0 GROUP BY 1),
        |mm AS (SELECT event_type, m, s1::DOUBLE/m::DOUBLE/1e4 AS mean,
        |  (s2::DOUBLE - s1::DOUBLE*s1::DOUBLE/m::DOUBLE)/(m::DOUBLE-1)/1e8 AS var
        |  FROM f WHERE m >= 2),
        |mdl AS (SELECT event_type, m, (1.0 - mean*mean/var)/2 AS xi,
        |  mean*(mean*mean/var + 1.0)/2 AS sigma, var > 0 AS ok FROM mm),
        |sc AS (SELECT j.*, mdl.m, mdl.xi, mdl.sigma, mdl.ok,
        |  1.0 + mdl.xi*(j.yfp::DOUBLE/1e4)/mdl.sigma AS support
        |  FROM j LEFT JOIN mdl USING (event_type)),
        |fin AS (SELECT *, CASE WHEN ufp IS NULL OR m IS NULL THEN NULL
        |   WHEN yfp <= 0 THEN 0.0
        |   WHEN (NOT ok) OR support <= 0 THEN 999.0
        |   ELSE -ln((m::DOUBLE / n) * exp((-1.0/xi) * ln(support))) END AS score
        |  FROM sc)
        |SELECT event_id, event_type, round(value,4) AS value,
        | round(ufp::DOUBLE/1e4, 4) AS u, round(xi,4) AS xi,
        | round(sigma,4) AS sigma, round(score,4) AS score,
        | CASE WHEN score IS NULL THEN 'I'
        |      WHEN yfp > 0 AND score > 5.0 THEN 'O' ELSE 'N' END AS tag
        |FROM fin""".stripMargin.replace("\n", " "),
    "q201_pagerank" -> pageRankOracle,
    "q356_harmonic" -> {
      val steps = (1 to 4).map { i =>
        s"""r$i AS (SELECT source, node, min(d) AS d FROM (
           |  SELECT source, node, d FROM r${i - 1}
           |  UNION ALL
           |  SELECT w.source, e.dst AS node, w.d + 1 AS d
           |  FROM r${i - 1} w JOIN edges e ON e.src = w.node)
           | GROUP BY 1, 2)""".stripMargin.replace("\n", " ")
      }
      s"""WITH $bipartiteSql,
         |nodes AS (SELECT src AS node FROM edges
         |  UNION SELECT dst FROM edges),
         |srcs AS (SELECT node AS source FROM nodes
         |  ORDER BY md5(node), node LIMIT 8),
         |r0 AS (SELECT source, source AS node, 0 AS d FROM srcs),
         |${steps.mkString(", ")}
         |SELECT node, count(*)::BIGINT AS reached,
         | round(sum(CAST(12 / d AS BIGINT))::DOUBLE / 12.0, 4) AS harmonic
         |FROM r4 WHERE d > 0 GROUP BY 1"""
        .stripMargin.replace("\n", " ")
    },
    "q357_reciprocity" ->
      """WITH ch AS (SELECT user_id::VARCHAR AS ua,
        |  lead(user_id::VARCHAR) OVER (PARTITION BY event_type ORDER BY event_id) AS ub
        |  FROM events),
        |de AS (SELECT ua, ub FROM ch
        |  WHERE ub IS NOT NULL AND ua <> ub
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |e2 AS (SELECT DISTINCT ua AS src, ub AS dst FROM de
        |  WHERE ua <> ub),
        |rec AS (SELECT count(*)::BIGINT AS reciprocal FROM
        |  (SELECT src, dst FROM e2
        |   INTERSECT SELECT dst AS src, src AS dst FROM e2)),
        |m AS (SELECT count(*)::BIGINT AS m FROM e2)
        |SELECT m.m, rec.reciprocal,
        | round(rec.reciprocal::DOUBLE / m.m::DOUBLE, 4) AS reciprocity
        |FROM m, rec""".stripMargin.replace("\n", " "),
    "q203_ppr" -> pprOracle,
    "q205_lpa" ->
      s"""WITH ${chainSql(3)}, ${lpaStages(3)}
         |SELECT node, label FROM l3""".stripMargin.replace("\n", " "),
    "q206_hits" -> hitsOracle,
    "q207_kcore" -> kcoreOracle,
    "q221_pagerank_weighted" -> pageRankWeightedOracle,
    "q223_components" -> componentsOracle,
    "q229_random_walks" -> randomWalksOracle,
    "q228_bipartite_project" ->
      """WITH e AS (SELECT DISTINCT user_id::VARCHAR AS u,
        |  event_type AS i FROM events),
        |deg AS (SELECT u, count(*)::BIGINT AS d FROM e GROUP BY u),
        |c AS (SELECT e.u, e.i FROM e JOIN deg ON deg.u = e.u
        | WHERE deg.d <= 10000)
        |SELECT x.i AS a, y.i AS b, count(*)::BIGINT AS cooc
        |FROM c x JOIN c y ON x.u = y.u AND x.i < y.i
        |GROUP BY 1, 2""".stripMargin.replace("\n", " "),
    "q208_linkpred" -> linkpredOracle,
    "q209_assortativity" -> assortativityOracle,
    "q210_modularity" -> modularityOracle,
    // triangle replay: canonical a<b edges from the consecutive-user
    // chain; each triangle x<y<z enumerated exactly once as
    // (x,y)+(y,z)+(x,z), then each corner credited — exact integers
    "q204_triangles" ->
      """WITH ch AS (SELECT user_id::VARCHAR AS a,
        |  lead(user_id::VARCHAR) OVER (PARTITION BY event_type ORDER BY event_id) AS b FROM events),
        |und AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
        | FROM ch WHERE b IS NOT NULL AND a <> b),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        | FROM und e1 JOIN und e2 ON e2.a = e1.b
        | JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        |credit AS (SELECT x AS node FROM tri UNION ALL
        | SELECT y FROM tri UNION ALL SELECT z FROM tri),
        |nodes AS (SELECT a AS node FROM und UNION SELECT b FROM und)
        |SELECT n.node, count(c.node)::BIGINT AS triangles
        |FROM nodes n LEFT JOIN credit c ON c.node = n.node
        |GROUP BY n.node""".stripMargin.replace("\n", " "),
    "q250_transitivity" ->
      """WITH ch AS (SELECT user_id::VARCHAR AS a,
        |  lead(user_id::VARCHAR) OVER (PARTITION BY event_type ORDER BY event_id) AS b FROM events),
        |und AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
        | FROM ch WHERE b IS NOT NULL AND a <> b),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        | FROM und e1 JOIN und e2 ON e2.a = e1.b
        | JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        |credit AS (SELECT x AS node FROM tri UNION ALL
        | SELECT y FROM tri UNION ALL SELECT z FROM tri),
        |deg AS (SELECT node, count(*)::BIGINT AS d FROM
        | (SELECT a AS node FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
        |tc AS (SELECT d.node, d.d, count(c.node)::BIGINT AS t
        | FROM deg d LEFT JOIN credit c ON c.node = d.node GROUP BY d.node, d.d)
        |SELECT count(*)::BIGINT AS n_nodes,
        | (sum(d) / 2)::BIGINT AS n_edges,
        | (sum(t) / 3)::BIGINT AS n_triangles,
        | round(CASE WHEN sum(d * (d - 1) / 2) > 0
        |  THEN sum(t)::DOUBLE / (sum(d * (d - 1) / 2))::BIGINT END, 4)
        |  AS transitivity
        |FROM tc""".stripMargin.replace("\n", " "),
    "q241_clustering_coeff" ->
      """WITH ch AS (SELECT user_id::VARCHAR AS a,
        |  lead(user_id::VARCHAR) OVER (PARTITION BY event_type ORDER BY event_id) AS b FROM events),
        |und AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
        | FROM ch WHERE b IS NOT NULL AND a <> b),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        | FROM und e1 JOIN und e2 ON e2.a = e1.b
        | JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        |credit AS (SELECT x AS node FROM tri UNION ALL
        | SELECT y FROM tri UNION ALL SELECT z FROM tri),
        |deg AS (SELECT node, count(*)::BIGINT AS d FROM
        | (SELECT a AS node FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
        |tc AS (SELECT d.node, d.d, count(c.node)::BIGINT AS triangles
        | FROM deg d LEFT JOIN credit c ON c.node = d.node GROUP BY d.node, d.d)
        |SELECT node, d, triangles,
        | round(CASE WHEN d >= 2 THEN 2.0*triangles/(d*(d-1))
        |  ELSE 0.0 END, 4) AS coeff
        |FROM tc""".stripMargin.replace("\n", " "),
    "q202_degrees" ->
      s"""WITH $bipartiteSql,
         |o AS (SELECT src AS node, count(*)::BIGINT AS outDeg
         |  FROM edges GROUP BY src),
         |i AS (SELECT dst AS node, count(*)::BIGINT AS inDeg
         |  FROM edges GROUP BY dst)
         |SELECT coalesce(o.node, i.node) AS node,
         | coalesce(outDeg, 0)::BIGINT AS outDeg,
         | coalesce(inDeg, 0)::BIGINT AS inDeg,
         | coalesce(outDeg, 0) = 0 AS dangling
         |FROM o FULL OUTER JOIN i ON o.node = i.node""".stripMargin
        .replace("\n", " "),
    "q182_dbscan" -> {
      val w = "PARTITION BY event_type ORDER BY value, event_id"
      val coreStruct = "CASE WHEN is_core THEN {'v': value, 'c': _cl} END"
      s"""WITH pts AS (SELECT event_id, event_type, value FROM events
         |  WHERE value IS NOT NULL),
         |n AS (SELECT *, count(*) OVER (PARTITION BY event_type
         |  ORDER BY value RANGE BETWEEN 0.5 PRECEDING AND 0.5 FOLLOWING)
         |  AS n_nbrs FROM pts),
         |m AS (SELECT *, n_nbrs >= 5 AS is_core FROM n),
         |pc AS (SELECT *, last_value(CASE WHEN is_core THEN value END
         |   IGNORE NULLS) OVER ($w
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pcv FROM m),
         |br AS (SELECT *, CASE WHEN is_core AND (pcv IS NULL OR
         |   value - pcv > 0.5) THEN 1 ELSE 0 END AS brk FROM pc),
         |cl AS (SELECT *, sum(brk) OVER ($w
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cl FROM br),
         |pn AS (SELECT *,
         |  last_value($coreStruct IGNORE NULLS) OVER ($w
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
         |  first_value($coreStruct IGNORE NULLS) OVER ($w
         |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx FROM cl),
         |fin AS (SELECT *, CASE WHEN is_core THEN _cl
         |  WHEN p IS NOT NULL AND value - p.v <= 0.5 AND (nx IS NULL OR
         |   nx.v - value > 0.5 OR value - p.v <= nx.v - value) THEN p.c
         |  WHEN nx IS NOT NULL AND nx.v - value <= 0.5 THEN nx.c
         |  ELSE -1 END AS cluster FROM pn)
         |SELECT event_id, event_type, round(value, 4) AS value, n_nbrs,
         | is_core, cluster::BIGINT AS cluster,
         | CASE WHEN cluster = -1 THEN 'O' ELSE 'N' END AS tag FROM fin"""
        .stripMargin.replace("\n", " ")
    },
    "q186_dbscan_grid" -> {
      val w = "(0.05/sqrt(2.0))"
      s"""WITH RECURSIVE pts AS (SELECT vec_id AS id,
         |  embedding[1]::DOUBLE AS x, embedding[2]::DOUBLE AS y
         | FROM embeddings WHERE embedding[1] IS NOT NULL
         |  AND embedding[2] IS NOT NULL),
         |cell AS (SELECT *, floor(x / $w)::BIGINT AS cx,
         |  floor(y / $w)::BIGINT AS cy FROM pts),
         |offs AS (SELECT a.dx, b.dy FROM
         |  (SELECT unnest(range(-2, 3)) AS dx) a,
         |  (SELECT unnest(range(-2, 3)) AS dy) b),
         |pr AS (SELECT c.id AS aid, c.x AS ax, c.y AS ay,
         |  c.cx + o.dx AS cx, c.cy + o.dy AS cy FROM cell c, offs o),
         |pairs AS MATERIALIZED (SELECT p.aid, c2.id AS bid,
         |  (p.ax-c2.x)*(p.ax-c2.x) + (p.ay-c2.y)*(p.ay-c2.y) AS d2
         | FROM pr p JOIN cell c2 USING (cx, cy)
         | WHERE (p.ax-c2.x)*(p.ax-c2.x) + (p.ay-c2.y)*(p.ay-c2.y)
         |  <= 0.05*0.05),
         |cnt AS (SELECT aid, count(*) AS n_nbrs FROM pairs GROUP BY aid),
         |cores AS MATERIALIZED (SELECT aid AS id FROM cnt WHERE n_nbrs >= 5),
         |ce AS (SELECT p.aid AS a, p.bid AS b FROM pairs p
         | JOIN cores xx ON xx.id = p.aid JOIN cores yy ON yy.id = p.bid
         | WHERE p.aid < p.bid),
         |edges AS (SELECT a, b FROM ce UNION ALL SELECT b AS a, a AS b FROM ce),
         |reach(id, label) AS (SELECT id, id FROM cores
         | UNION SELECT e.a, r.label FROM reach r JOIN edges e ON e.b = r.id),
         |comp AS MATERIALIZED (SELECT id, min(label) AS cluster
         | FROM reach GROUP BY id),
         |near AS (SELECT p.aid AS id,
         |  (min({'d': p.d2, 'b': p.bid, 'c': m.cluster})).c AS bcl
         | FROM pairs p JOIN comp m ON m.id = p.bid GROUP BY p.aid)
         |SELECT c.id, round(c.x, 4) AS x, round(c.y, 4) AS y, n.n_nbrs,
         | (m.id IS NOT NULL) AS is_core,
         | coalesce(m.cluster, nr.bcl, -1)::BIGINT AS cluster,
         | CASE WHEN coalesce(m.cluster, nr.bcl, -1) = -1 THEN 'O'
         |  ELSE 'N' END AS tag
         |FROM cell c JOIN cnt n ON n.aid = c.id
         |LEFT JOIN comp m ON m.id = c.id
         |LEFT JOIN near nr ON nr.id = c.id""".stripMargin.replace("\n", " ")
    },
    "q190_zscore_attribution" -> {
      val attrs = Seq("l_quantity", "l_extendedprice", "l_discount")
      val z2 = attrs.map(a =>
        a -> (s"(abs(l.$a - m.${a}_mean) / m.${a}_std) * " +
          s"(abs(l.$a - m.${a}_mean) / m.${a}_std)")).toMap
      val z2c = attrs.map(a =>
        s"CASE WHEN m.${a}_std > 0 THEN ${z2(a)} ELSE 0.0 END AS ${a}_z2")
        .mkString(", ")
      val tot = attrs.map(a => s"${a}_z2").mkString(" + ")
      val shares = attrs.map(a =>
        s"round(CASE WHEN t > 0 THEN ${a}_z2 / t ELSE 0.0 END, 4) AS ${a}_share")
        .mkString(", ")
      val structs = attrs.map(a =>
        s"{'s': CASE WHEN t > 0 THEN ${a}_z2 / t ELSE 0.0 END, 'a': '$a'}")
        .mkString(", ")
      s"""WITH m AS (SELECT l_returnflag,
         | ${attrs.map(a => s"avg($a) AS ${a}_mean, stddev_samp($a) AS ${a}_std")
             .mkString(", ")}
         | FROM lineitem GROUP BY 1),
         |z AS (SELECT l.l_orderkey, l.l_linenumber, $z2c
         | FROM lineitem l JOIN m USING (l_returnflag)),
         |w AS (SELECT *, $tot AS t FROM z)
         |SELECT l_orderkey, l_linenumber, $shares,
         | (list_max([$structs])).a AS topAttr
         |FROM w""".stripMargin.replace("\n", " ")
    },
    "q188_cell_occupancy" ->
      """WITH c AS (SELECT floor(embedding[1]::DOUBLE / (0.05/sqrt(2.0)))::BIGINT AS cx,
        |  floor(embedding[2]::DOUBLE / (0.05/sqrt(2.0)))::BIGINT AS cy,
        |  count(*) AS occupancy
        | FROM embeddings WHERE embedding[1] IS NOT NULL
        |  AND embedding[2] IS NOT NULL GROUP BY 1, 2)
        |SELECT occupancy, count(*) AS n_cells,
        | (occupancy * occupancy * count(*))::BIGINT AS pair_bound
        |FROM c GROUP BY occupancy""".stripMargin.replace("\n", " "),
    "q46_iforest" -> iforestSql,
    "q99_iforest_merge" -> iforestMergeSql,
    "q47_cblof" -> cblofSql,
    "q36_outlier_counter" ->
      s"""WITH $zCte
         |SELECT event_type,
         | sum(CASE WHEN tag='O' THEN 1 ELSE 0 END)::BIGINT AS nO,
         | sum(CASE WHEN tag='N' THEN 1 ELSE 0 END)::BIGINT AS nN,
         | sum(CASE WHEN tag='I' THEN 1 ELSE 0 END)::BIGINT AS nI,
         | count(*) AS total,
         | round(sum(CASE WHEN tag='O' THEN 1 ELSE 0 END) / count(*)::DOUBLE * 100.0, 4) AS pctO
         |FROM z GROUP BY event_type""".stripMargin.replace("\n", " "),
    "q37_hierarchy_rollup" ->
      s"""WITH $zCte,
         |h(childType, childId, parentType, parentId) AS (VALUES
         | ('click','*','traffic','web'), ('view','*','traffic','web'),
         | ('error','*','ops','backend'),
         | ('purchase','*','rev','sales'), ('signup','*','rev','sales')),
         |j AS (SELECT z.*, h.parentType, h.parentId,
         |  epoch_ns(z.ts) // 3600000000000 AS seqb
         | FROM z JOIN h ON z.event_type = h.childType
         |  AND (h.childId = CAST(z.user_id AS VARCHAR) OR h.childId = '*')),
         |g AS (SELECT parentType, parentId, seqb,
         |  max(CASE WHEN tag='O' THEN 1 ELSE 0 END) AS anyO,
         |  avg(CASE WHEN tag='O' THEN value END) AS aggO,
         |  avg(value) AS aggAll, count(*) AS n
         | FROM j GROUP BY 1,2,3)
         |SELECT parentType, parentId, seqb, n,
         | round(CASE WHEN anyO=1 THEN aggO ELSE aggAll END, 4) AS value,
         | CASE WHEN anyO=1 THEN 'O' ELSE 'N' END AS tag
         |FROM g""".stripMargin.replace("\n", " "),
    "q72_perkey_threshold_tag" ->
      s"""WITH $zCte,
         |rk AS (SELECT event_type, score,
         |  row_number() OVER (PARTITION BY event_type ORDER BY score DESC) AS rn,
         |  count(*) OVER (PARTITION BY event_type) AS n
         | FROM z),
         |thr AS (
         | SELECT event_type, avg(score) AS threshold FROM rk WHERE n >= 100
         |  AND rn BETWEEN greatest(2, floor(n*0.05)) - 1 AND greatest(2, floor(n*0.05)) + 1
         | GROUP BY event_type
         | UNION ALL
         | SELECT event_type, 3.0 FROM rk WHERE n < 100 GROUP BY event_type)
         |SELECT z.event_id, z.event_type, round(z.score,4) AS score,
         | round(t.threshold,4) AS threshold,
         | CASE WHEN z.score IS NULL THEN 'I'
         |  WHEN t.threshold IS NULL THEN 'A'
         |  WHEN z.score > t.threshold THEN 'O' ELSE 'N' END AS tag
         |FROM z LEFT JOIN thr t USING (event_type)""".stripMargin.replace("\n", " "),
    "q38_pseudo_relevance" ->
      s"""WITH $zCte,
         |rk AS (SELECT event_type, score,
         |  row_number() OVER (PARTITION BY event_type ORDER BY score DESC) AS rn,
         |  count(*) OVER (PARTITION BY event_type) AS n
         | FROM z)
         |SELECT event_type, any_value(n) AS n, round(avg(score),4) AS threshold
         | FROM rk WHERE n >= 100
         |  AND rn BETWEEN greatest(2, floor(n*0.05)) - 1 AND greatest(2, floor(n*0.05)) + 1
         | GROUP BY event_type
         |UNION ALL
         |SELECT event_type, any_value(n) AS n, 3.0 AS threshold
         | FROM rk WHERE n < 100 GROUP BY event_type"""
        .stripMargin.replace("\n", " "),
    "q39_threshold_learner" ->
      s"""WITH $zCte,
         |lab AS (SELECT *, CASE WHEN value > 100.0 THEN 'T' ELSE 'F' END AS label FROM z),
         |sp(split) AS (VALUES (0.5),(1.0),(1.5),(2.0),(2.5),(3.0),(3.5),(4.0)),
         |g AS (SELECT event_type, split,
         |  sum(CASE WHEN score >= split AND label='T' THEN 1 ELSE 0 END)::DOUBLE AS hiT,
         |  sum(CASE WHEN score >= split AND label='F' THEN 1 ELSE 0 END)::DOUBLE AS hiF,
         |  sum(CASE WHEN score < split AND label='T' THEN 1 ELSE 0 END)::DOUBLE AS loT,
         |  sum(CASE WHEN score < split AND label='F' THEN 1 ELSE 0 END)::DOUBLE AS loF
         | FROM lab CROSS JOIN sp GROUP BY 1,2)
         |SELECT event_type, split,
         | round(
         |  (hiT+hiF)/(hiT+hiF+loT+loF) *
         |   (CASE WHEN hiT+hiF > 0 AND hiT > 0 THEN -(hiT/(hiT+hiF))*ln(hiT/(hiT+hiF)) ELSE 0 END
         |    + CASE WHEN hiT+hiF > 0 AND hiF > 0 THEN -(hiF/(hiT+hiF))*ln(hiF/(hiT+hiF)) ELSE 0 END)
         |  + (loT+loF)/(hiT+hiF+loT+loF) *
         |   (CASE WHEN loT+loF > 0 AND loT > 0 THEN -(loT/(loT+loF))*ln(loT/(loT+loF)) ELSE 0 END
         |    + CASE WHEN loT+loF > 0 AND loF > 0 THEN -(loF/(loT+loF))*ln(loF/(loT+loF)) ELSE 0 END)
         | , 4) AS wEntropy
         |FROM g""".stripMargin.replace("\n", " "),
    "q40_dist_sorter" ->
      s"""WITH $histCte
         |SELECT event_type, bucket, cnt, round(freq,4) AS freq,
         | row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, bucket) AS rank
         |FROM histn""".stripMargin.replace("\n", " "),
    "q41_entropy_sorter" ->
      s"""WITH $histCte,
         |e AS (SELECT event_type, bucket, cnt, freq, -freq*ln(freq) AS entropy,
         |  row_number() OVER (PARTITION BY event_type ORDER BY -freq*ln(freq) ASC, bucket) AS rank
         | FROM histn)
         |SELECT event_type, bucket, cnt, round(freq,4) AS freq,
         | round(entropy,4) AS entropy, rank
         |FROM e WHERE rank <= 10""".stripMargin.replace("\n", " "),
    "q42_knn_avg_dist" ->
      s"""WITH $pairsCte
         |SELECT src, round(avgDist,4) AS avgDist, round(density,4) AS density FROM dens"""
        .stripMargin.replace("\n", " "),
    "q43_neighbor_density" ->
      s"""WITH $pairsCte
         |SELECT n.trg, n.src, round(n.dist,4) AS dist, n.rank,
         | round(d.density,4) AS density
         |FROM nn n JOIN dens d ON n.trg = d.src""".stripMargin.replace("\n", " "),
    "q44_relative_density" ->
      s"""WITH $pairsCte,
         |nb AS (SELECT n.src, sum(d.density) AS nbrDensity
         | FROM nn n JOIN dens d ON n.trg = d.src GROUP BY n.src)
         |SELECT d.src, round(d.density,4) AS density, round(nb.nbrDensity,4) AS nbrDensity,
         | round(d.density * 5 / nb.nbrDensity, 4) AS relDensity
         |FROM dens d JOIN nb USING (src)""".stripMargin.replace("\n", " "),
    "q45_lof" ->
      s"""WITH $pairsCte,
         |kd AS (SELECT src, max(dist) AS kdist FROM nn GROUP BY src),
         |rch AS (SELECT n.src, n.trg, greatest(n.dist, k.kdist) AS reach
         | FROM nn n JOIN kd k ON n.trg = k.src),
         |lrd AS (SELECT src, 5 / sum(reach) AS lrd FROM rch GROUP BY src),
         |nl AS (SELECT n.src, avg(l.lrd) AS nbrLrd
         | FROM nn n JOIN lrd l ON n.trg = l.src GROUP BY n.src)
         |SELECT l.src, round(nl.nbrLrd / l.lrd, 4) AS lof
         |FROM lrd l JOIN nl USING (src)""".stripMargin.replace("\n", " "),
    "q324_knn_classify" ->
      s"""WITH $pairsCte,
         |lb AS (SELECT vec_id, label FROM embeddings),
         |votes AS (SELECT nn.src, lb.label AS nl, count(*)::BIGINT AS votes,
         |  min(rank) AS best
         | FROM nn JOIN lb ON lb.vec_id = nn.trg GROUP BY 1, 2),
         |pred AS (SELECT src, nl AS predicted, votes FROM votes
         | QUALIFY row_number() OVER (PARTITION BY src
         |   ORDER BY votes DESC, best ASC, nl ASC) = 1)
         |SELECT p.src, l.label, p.predicted, p.votes,
         | (l.label = p.predicted) AS correct
         |FROM pred p JOIN lb l ON l.vec_id = p.src"""
        .stripMargin.replace("\n", " "),
    "q48_pca_score" ->
      """WITH m AS (SELECT avg(l_quantity) AS mu1, avg(l_extendedprice) AS mu2,
        |  covar_samp(l_quantity, l_quantity) AS c11,
        |  covar_samp(l_quantity, l_extendedprice) AS c12,
        |  covar_samp(l_extendedprice, l_extendedprice) AS c22
        | FROM lineitem),
        |t AS (SELECT *, 0.5*atan2(2*c12, c11-c22) AS th FROM m)
        |SELECT l.l_orderkey, l.l_linenumber, round(l.l_quantity,4) AS l_quantity,
        | round(l.l_extendedprice,4) AS l_extendedprice,
        | round(abs(-sin(t.th)*(l.l_quantity - t.mu1) + cos(t.th)*(l.l_extendedprice - t.mu2)), 4) AS score
        |FROM lineitem l CROSS JOIN t""".stripMargin.replace("\n", " "),
    "q231_ecod" -> {
      def fp1(c: String) =
        s"(CASE WHEN ($c)>=0 THEN floor(($c)*10.0+0.5) ELSE -floor(-($c)*10.0+0.5) END)::BIGINT"
      def m3(p: String) =
        s"(n_*n_*${p}s3 - 3*n_*${p}s1*${p}s2 + 2*${p}s1*${p}s1*${p}s1) < 0 AS ${p}_neg"
      def tails(c: String, p: String) =
        s"""-ln(cume_dist() OVER (PARTITION BY b.l_returnflag ORDER BY b.$c ASC)) AS ${p}_ol,
           |  -ln(cume_dist() OVER (PARTITION BY b.l_returnflag ORDER BY b.$c DESC)) AS ${p}_or"""
          .stripMargin
      def auto(p: String) = s"CASE WHEN ${p}_neg THEN ${p}_ol ELSE ${p}_or END"
      s"""WITH base AS (SELECT l_orderkey, l_linenumber, l_returnflag,
         |  l_quantity, l_extendedprice, l_discount FROM lineitem
         | WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
         |  AND l_discount IS NOT NULL),
         |fx AS (SELECT l_returnflag, ${fp1("l_quantity")} AS q,
         |  ${fp1("l_extendedprice")} AS e, ${fp1("l_discount")} AS d FROM base),
         |sk AS (SELECT l_returnflag, count(*)::HUGEINT AS n_,
         |  sum(q)::HUGEINT AS qs1, sum(q*q)::HUGEINT AS qs2, sum(q*q*q)::HUGEINT AS qs3,
         |  sum(e)::HUGEINT AS es1, sum(e*e)::HUGEINT AS es2, sum(e*e*e)::HUGEINT AS es3,
         |  sum(d)::HUGEINT AS ds1, sum(d*d)::HUGEINT AS ds2, sum(d*d*d)::HUGEINT AS ds3
         | FROM fx GROUP BY 1),
         |sg AS (SELECT l_returnflag, ${m3("q")}, ${m3("e")}, ${m3("d")} FROM sk),
         |t AS (SELECT b.*, s.q_neg, s.e_neg, s.d_neg,
         |  ${tails("l_quantity", "q")},
         |  ${tails("l_extendedprice", "e")},
         |  ${tails("l_discount", "d")}
         | FROM base b JOIN sg s USING (l_returnflag)),
         |f AS (SELECT *, (q_ol + e_ol) + d_ol AS sl, (q_or + e_or) + d_or AS sr,
         |  (${auto("q")} + ${auto("e")}) + ${auto("d")} AS sa FROM t)
         |SELECT l_orderkey, l_linenumber, l_returnflag,
         | round(l_quantity,4) AS l_quantity,
         | round(l_extendedprice,4) AS l_extendedprice,
         | round(l_discount,4) AS l_discount,
         | round(greatest(sl, sr, sa), 4) AS score,
         | CASE WHEN greatest(sl, sr, sa) > 12.0 THEN 'O' ELSE 'N' END AS tag
         |FROM f""".stripMargin.replace("\n", " ")
    },
    "q232_hbos" ->
      """WITH base AS (SELECT l_orderkey, l_linenumber, l_returnflag,
        |  l_quantity, l_extendedprice, l_discount FROM lineitem
        | WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |  AND l_discount IS NOT NULL),
        |nn AS (SELECT l_returnflag, count(*) AS n_ FROM base GROUP BY 1),
        |hq AS (SELECT l_returnflag, CAST(floor(l_quantity/10.0) AS BIGINT) AS qb,
        |  count(*) AS qc FROM base GROUP BY 1, 2),
        |he AS (SELECT l_returnflag, CAST(floor(l_extendedprice/10000.0) AS BIGINT) AS eb,
        |  count(*) AS ec FROM base GROUP BY 1, 2),
        |hd AS (SELECT l_returnflag, CAST(floor(l_discount/0.02) AS BIGINT) AS db,
        |  count(*) AS dc FROM base GROUP BY 1, 2),
        |sc AS (SELECT b.*,
        |  ((-ln(hq.qc::DOUBLE / n.n_)) + (-ln(he.ec::DOUBLE / n.n_)))
        |    + (-ln(hd.dc::DOUBLE / n.n_)) AS score
        | FROM base b JOIN nn n USING (l_returnflag)
        | JOIN hq ON hq.l_returnflag = b.l_returnflag
        |  AND hq.qb = CAST(floor(b.l_quantity/10.0) AS BIGINT)
        | JOIN he ON he.l_returnflag = b.l_returnflag
        |  AND he.eb = CAST(floor(b.l_extendedprice/10000.0) AS BIGINT)
        | JOIN hd ON hd.l_returnflag = b.l_returnflag
        |  AND hd.db = CAST(floor(b.l_discount/0.02) AS BIGINT))
        |SELECT l_orderkey, l_linenumber, l_returnflag,
        | round(l_quantity,4) AS l_quantity,
        | round(l_extendedprice,4) AS l_extendedprice,
        | round(l_discount,4) AS l_discount,
        | round(score, 4) AS score,
        | CASE WHEN score > 14.0 THEN 'O' ELSE 'N' END AS tag
        |FROM sc""".stripMargin.replace("\n", " "),
    "q285_esd" -> {
      // three unrolled ESD rounds; arg-max row by the exact integer
      // |n·x_fp − Σx_fp| (HUGEINT) mirrors the Spark operator's
      // decimal(38,0) selection — no double enters the removal choice
      def round(i: Int, src: String) =
        s"""s$i AS (SELECT event_type, count(*)::HUGEINT AS n,
           |  sum(_fp)::HUGEINT AS s, sum(_fp*_fp)::HUGEINT AS q
           | FROM $src GROUP BY 1),
           |t$i AS (SELECT b.*, s.n, s.s, s.q, abs(s.n*b._fp - s.s) AS dev,
           |  row_number() OVER (PARTITION BY b.event_type
           |   ORDER BY abs(s.n*b._fp - s.s) DESC, b._id ASC) AS rn
           | FROM $src b JOIN s$i s USING (event_type) WHERE s.n > 2),
           |o$i AS (SELECT event_type, $i AS rnd, _id AS removed_id,
           |  _v AS value,
           |  (dev::DOUBLE / n::DOUBLE / 1e4) /
           |   (sqrt((q::DOUBLE - s::DOUBLE*s::DOUBLE/n::DOUBLE)
           |     /(n::DOUBLE-1))/1e4) AS r_stat,
           |  3.5::DOUBLE AS lambda FROM t$i WHERE rn = 1),
           |b$i AS (SELECT event_type, _id, _v, _fp FROM t$i WHERE rn > 1)"""
          .stripMargin
      s"""WITH b0 AS (SELECT event_type, event_id AS _id,
         |  value::DOUBLE AS _v,
         |  (CASE WHEN value >= 0 THEN floor(value*10000.0+0.5)
         |   ELSE -floor(-value*10000.0+0.5) END)::HUGEINT AS _fp
         | FROM events WHERE value IS NOT NULL),
         |${round(1, "b0")},
         |${round(2, "b1")},
         |${round(3, "b2")},
         |u AS (SELECT * FROM o1 UNION ALL SELECT * FROM o2
         |  UNION ALL SELECT * FROM o3),
         |f AS (SELECT *, max(CASE WHEN r_stat > lambda THEN rnd END)
         |  OVER (PARTITION BY event_type) AS lastsig FROM u)
         |SELECT event_type, rnd, removed_id, round(value, 4) AS value,
         | round(r_stat, 4) AS r_stat, lambda,
         | CASE WHEN rnd <= coalesce(lastsig, 0) THEN 'O' ELSE 'N' END AS tag
         |FROM f""".stripMargin.replace("\n", " ")
    },
    "q301_shesd" -> {
      // q129's decomposition CTEs feeding q285's ESD rounds on resid
      def round(i: Int, src: String) =
        s"""s$i AS (SELECT event_type, count(*)::HUGEINT AS n,
           |  sum(_fp)::HUGEINT AS s, sum(_fp*_fp)::HUGEINT AS q
           | FROM $src GROUP BY 1),
           |t$i AS (SELECT b.*, s.n, s.s, s.q, abs(s.n*b._fp - s.s) AS dev,
           |  row_number() OVER (PARTITION BY b.event_type
           |   ORDER BY abs(s.n*b._fp - s.s) DESC, b._id ASC) AS rn
           | FROM $src b JOIN s$i s USING (event_type) WHERE s.n > 2),
           |o$i AS (SELECT event_type, $i AS rnd, _id AS removed_id,
           |  _v AS value,
           |  (dev::DOUBLE / n::DOUBLE / 1e4) /
           |   (sqrt((q::DOUBLE - s::DOUBLE*s::DOUBLE/n::DOUBLE)
           |     /(n::DOUBLE-1))/1e4) AS r_stat,
           |  3.5::DOUBLE AS lambda FROM t$i WHERE rn = 1),
           |b$i AS (SELECT event_type, _id, _v, _fp FROM t$i WHERE rn > 1)"""
          .stripMargin
      val maSpan = ((11 to 1 by -1).map(i => s"lag(value, $i) OVER wo") ++
        Seq("value") ++ (1 to 11).map(i => s"lead(value, $i) OVER wo"))
        .mkString(" + ")
      s"""WITH bsrc AS (SELECT event_type, event_id AS seq, value
         |  FROM events WHERE value IS NOT NULL),
         |t AS (SELECT event_type, seq, value, ($maSpan +
         |  (lag(value, 12) OVER wo + lead(value, 12) OVER wo) / 2) / 24.0
         |   AS trend FROM bsrc
         |  WINDOW wo AS (PARTITION BY event_type ORDER BY seq)),
         |d AS (SELECT *, value - trend AS detr, seq % 24 AS phase FROM t),
         |sr AS (SELECT event_type, phase, avg(detr) AS seasRaw
         | FROM d WHERE detr IS NOT NULL GROUP BY 1, 2),
         |sc AS (SELECT event_type, phase,
         |  seasRaw - avg(seasRaw) OVER (PARTITION BY event_type) AS seasonal
         | FROM sr),
         |rr AS (SELECT d.event_type, d.seq, d.detr - sc.seasonal AS resid
         | FROM d LEFT JOIN sc ON d.event_type = sc.event_type
         |  AND d.phase = sc.phase),
         |b0 AS (SELECT event_type, seq AS _id, resid::DOUBLE AS _v,
         |  (CASE WHEN resid >= 0 THEN floor(resid*10000.0+0.5)
         |   ELSE -floor(-resid*10000.0+0.5) END)::HUGEINT AS _fp
         | FROM rr WHERE resid IS NOT NULL),
         |${round(1, "b0")},
         |${round(2, "b1")},
         |${round(3, "b2")},
         |u AS (SELECT * FROM o1 UNION ALL SELECT * FROM o2
         |  UNION ALL SELECT * FROM o3),
         |f AS (SELECT *, max(CASE WHEN r_stat > lambda THEN rnd END)
         |  OVER (PARTITION BY event_type) AS lastsig FROM u)
         |SELECT event_type, rnd, removed_id, round(value, 4) AS value,
         | round(r_stat, 4) AS r_stat, lambda,
         | CASE WHEN rnd <= coalesce(lastsig, 0) THEN 'O' ELSE 'N' END AS tag
         |FROM f""".stripMargin.replace("\n", " ")
    },
  )
}
