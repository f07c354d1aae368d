package graft.multi

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Proximity / density operators (SURVEY.md §2.6): pair distances, kNN
  * aggregates, relative density, Local Outlier Factor.
  *
  * The reference consumes a precomputed pair-distance file and hand-rolls
  * joins as union+reduceByKey (knn/LocalDensityBasedPredictor.scala:76-240);
  * here the whole chain is DataFrame joins + window top-k so Catalyst picks
  * the join strategy. Pair generation is the quadratic step — at 100 TB
  * replace `pairDistances` with an LSH-bucketed candidate join
  * (graft.sim.Similarity.lshNearDup) so only in-bucket pairs materialize. */
object Proximity {

  /** Euclidean distance between two float-array columns, computed in
    * double (cast first — float subtraction would diverge from the oracle). */
  def euclidean(a: Column, b: Column): Column = {
    // codegen'd VecEuclid with the identical left-to-right accumulation
    // the zip_with+aggregate HOF form computed (HOFs are CodegenFallback
    // — interpreted per row, ~6× slower on the 100M-pair cell joins)
    graft.expr.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    org.apache.spark.sql.functions.call_function("vec_euclid", a, b)
  }

  /** All-pairs distance table from an embedding table: (src, trg, dist),
    * src != trg. Quadratic — bench/test scale only; see scaladoc above. */
  def pairDistances(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // validated projection: the per-row null scan runs HERE, so the
    // per-pair vec_euclid below sees containsNull=false and emits the
    // branch-free loop (see expr.VecValidate)
    graft.expr.GraftFunctions.register(vecs.sparkSession)
    val vd = (c: Column) =>
      org.apache.spark.sql.functions.call_function("vec_validate", c)
    val a = vecs.select(col(idCol).as("src"), vd(col(vecCol)).as("va"))
    val b = vecs.select(col(idCol).as("trg"), vd(col(vecCol)).as("vb"))
    a.join(b, col("src") =!= col("trg"))
      .withColumn("dist", euclidean(col("va"), col("vb")))
      .drop("va", "vb")
  }

  /** Top-k nearest neighbors per src from a pair-distance table
    * (secondary-sort top-k, proximity/AverageDistance.java:152-200).
    * Adds `rank` 1..k. */
  def knn(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("src").orderBy(col("dist").asc, col("trg"))
    pairs.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** kNN average distance / density per entity
    * (proximity/AverageDistance.java:46-244): avgDist = mean of k nearest
    * distances; density = scale / avgDist. */
  def averageDistance(pairs: DataFrame, k: Int, scale: Double = 1.0): DataFrame =
    averageDistanceFromKnn(knn(pairs, k), k, scale)

  /** Same, over a precomputed top-k table (e.g. Blocked.knn). */
  def averageDistanceFromKnn(nn: DataFrame, k: Int, scale: Double = 1.0): DataFrame =
    nn.groupBy("src")
      .agg(avg("dist").as("avgDist"))
      .withColumn("density", when(col("avgDist") > 0, lit(scale) / col("avgDist")))

  /** Neighbor-density join (proximity/NeighborDensity.java:48-176): each
    * (src, trg) neighborhood edge annotated with the target's density. */
  def neighborDensity(pairs: DataFrame, k: Int, scale: Double = 1.0): DataFrame =
    neighborDensityFromKnn(knn(pairs, k), k, scale)

  def neighborDensityFromKnn(nn: DataFrame, k: Int, scale: Double = 1.0): DataFrame = {
    val dens = averageDistanceFromKnn(nn, k, scale).select(col("src").as("trg"), col("density"))
    nn.select("src", "trg", "dist", "rank").join(dens, "trg")
  }

  /** Relative density (proximity/RelativeDensity.java:40-134):
    * relDensity = ownDensity * k / Σ(neighbor densities). ≈ LOF precursor. */
  def relativeDensity(pairs: DataFrame, k: Int, scale: Double = 1.0): DataFrame =
    relativeDensityFromKnn(knn(pairs, k), k, scale)

  def relativeDensityFromKnn(nn: DataFrame, k: Int, scale: Double = 1.0): DataFrame = {
    val dens = averageDistanceFromKnn(nn, k, scale).select("src", "density")
    val nbrSum = neighborDensityFromKnn(nn, k, scale)
      .groupBy("src").agg(sum("density").as("nbrDensity"))
    dens.join(nbrSum, "src")
      .withColumn("relDensity", col("density") * k / col("nbrDensity"))
  }

  /** IVF-cell-bounded approximate kNN — the 100 TB path the header
    * scaladoc promises: nearest-cell assignment from the integer
    * k-means fit ([[graft.sim.KMeansDist]]), then EXACT kNN within each
    * cell. Pair work is Σ occupancy² (the LSH-bucket bound), never
    * corpus²; the trade is IVF's nProbe=1 edge effect (a true neighbor
    * sitting in an adjacent cell is missed — acceptable for LOF-style
    * density estimates, which need locally-plausible neighbors, not the
    * exact neighbor set). Output matches [[knn]] — (src, trg, dist,
    * rank ≤ k) — so [[lofFromKnn]] / [[averageDistanceFromKnn]] /
    * [[relativeDensityFromKnn]] run unchanged on top. Deterministic end
    * to end (integer fit, exact distances, (dist, trg) rank order). */
  def cellKnn(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
      nCells: Int, iters: Int, k: Int, maxSample: Int = 20000): DataFrame = {
    val cents = graft.sim.KMeansDist.fitCentroids(vecs, idCol, vecCol,
      dim, nCells, iters, maxSample)
    // index side lives in its best cell; the query side probes its TWO
    // nearest cells (nProbe=2 — one fused expression pass computes
    // both), halving the cell-boundary neighbor loss. Quality depends
    // on the data being clusterable, like every IVF method: on a
    // clustered fixture the approx LOF reproduces the exact ranking
    // (Round8Spec), while on near-ISOTROPIC 64-d gaussians cells carry
    // little locality and LOF agreement is weak (measured ρ≈0.37 vs
    // exact on the synthetic driver embeddings) — the same caveat the
    // residual-PQ recall spec documents on its clustered-vs-uniform
    // fixtures. For isotropic data use the exact Blocked.knn path.
    val spark = vecs.sparkSession
    val base = vecs.select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .withColumn("_b", graft.expr.GraftFunctions.vecNearest2Q(spark,
        graft.sim.KMeansDist.quantizeCol(col("_v")), cents))
    val index = base.select(col("_b.cell").as("cell"),
      col("_id").as("trg"), col("_v").as("vb"))
    val probe = base.select(col("_id").as("src"), col("_v").as("va"),
      explode(array(col("_b.cell"), col("_b.cell2"))).as("cell"))
    val pairs = probe.join(index, Seq("cell"))
      .where(col("src") =!= col("trg"))
      .withColumn("dist", euclidean(col("va"), col("vb")))
      .select("src", "trg", "dist")
    knn(pairs, k)
  }

  /** Local Outlier Factor (Breunig et al., SIGMOD'00;
    * knn/LocalDensityBasedPredictor.scala:41-240):
    * kNN → k-distance (:109-113) → reachability distance
    * reach(a,b) = max(dist(a,b), kdist(b)) (:116-141) → local reachability
    * density lrd(a) = k / Σ reach(a,·) (:144-158) → LOF(a) = mean lrd of
    * neighbors / lrd(a) (:184-220). Output: src, lof. */
  def lof(pairs: DataFrame, k: Int): DataFrame = lofFromKnn(knn(pairs, k), k)

  def lofFromKnn(nnIn: DataFrame, k: Int): DataFrame = {
    // the kNN frame feeds three branches (k-dist, reach, neighbor-lrd):
    // persist it so an expensive upstream (the cellKnn kmeans+pair join)
    // computes once, not per branch (q193 measured 12.6 s → ~4 s)
    val nn = nnIn.select("src", "trg", "dist")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kdist = nn.groupBy("src").agg(max("dist").as("kdist"))
    val reach = nn
      .join(kdist.select(col("src").as("trg"), col("kdist")), "trg")
      .withColumn("reach", greatest(col("dist"), col("kdist")))
    val lrd = reach.groupBy("src")
      .agg((lit(k) / sum("reach")).as("lrd"))
    val nbrLrd = nn
      .join(lrd.select(col("src").as("trg"), col("lrd").as("trgLrd")), "trg")
      .groupBy("src").agg(avg("trgLrd").as("nbrLrd"))
    lrd.join(nbrLrd, "src")
      .withColumn("lof", col("nbrLrd") / col("lrd"))
      .select("src", "lof")
  }

  /** Leave-one-out kNN majority-vote classifier (engine addition) over
    * a precomputed top-k neighbor table (pairDistances→knn at test
    * scale, cellKnn at corpus scale — the same cell-bounded path LOF
    * rides): predicted = the neighbor label with the most votes, ties
    * broken by nearest supporting neighbor (min rank) then label order.
    * The "does the embedding space actually separate the labels"
    * audit a curation pipeline runs before trusting label propagation.
    * Output: src, label, predicted, votes, correct.
    *
    * Scale: one shuffle join of the k·N neighbor frame onto the label
    * table, one hash agg to (src, label) vote counts (≤ k rows per
    * src), one top-1 window over that — all frames are k-bounded. */
  def knnClassify(nn: DataFrame, labels: DataFrame, idCol: String,
      labelCol: String): DataFrame = {
    val nbr = labels.select(col(idCol).as("trg"), col(labelCol).as("_nl"))
    val votes = nn.join(nbr, "trg")
      .groupBy(col("src"), col("_nl"))
      .agg(count(lit(1)).as("votes"), min(col("rank")).as("_best"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("votes").desc, col("_best").asc, col("_nl").asc)
    val pred = votes.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col("src"), col("_nl").as("predicted"), col("votes"))
    pred
      .join(labels.select(col(idCol).as("src"), col(labelCol).as("label")),
        "src")
      .withColumn("correct", col("label") === col("predicted"))
      .select("src", "label", "predicted", "votes", "correct")
  }
}
