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
    // branch-free loop (see expr.VecValidate).
    // MATERIALIZED before the pair join (r14, guide §4 expression
    // duplication): whole-stage codegen fuses an un-materialized
    // projection INTO the nested-loop pair loop, re-running the O(dim)
    // validate scan once per PAIR instead of once per row — measured
    // 4.1 s vs 1.2 s on the 4M-pair sf0.1 frame. The checkpoint makes
    // the join inputs plain attributes (one validate per row, corpus-
    // sized frame — this operator is bench/test-scale by contract).
    graft.expr.GraftFunctions.register(vecs.sparkSession)
    val vd = (c: Column) =>
      org.apache.spark.sql.functions.call_function("vec_validate", c)
    val v = vecs.select(col(idCol).as("_pid"), vd(col(vecCol)).as("_pv"))
      .localCheckpoint(true)
    val a = v.select(col("_pid").as("src"), col("_pv").as("va"))
    val b = v.select(col("_pid").as("trg"), col("_pv").as("vb"))
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
    // materialize it so an expensive upstream (the cellKnn kmeans+pair
    // join) computes once, not per branch (q193 measured 12.6 s → ~4 s).
    // Eager localCheckpoint, NOT persist: a persist had no unpersist
    // site (the returned frame is lazy), leaking a data-sized
    // CacheManager entry per call in a long-lived session (advice r13);
    // the checkpoint RDD is GC-cleaned with the result.
    val nn = nnIn.select("src", "trg", "dist")
      .localCheckpoint(true)
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

  /** erf via the Abramowitz–Stegun 7.1.26 rational polynomial
    * (|ε| ≤ 1.5e-7) — neither Spark nor DuckDB ships erf, so both
    * engines evaluate this exact float-op sequence (exp rides the
    * established libm parity). Defined for x ≥ 0; callers mirror via
    * erf(−x) = −erf(x). */
  def erfPos(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = ((((lit(1.061405429) * t - lit(1.453152027)) * t +
      lit(1.421413741)) * t - lit(0.284496736)) * t + lit(0.254829592)) * t
    lit(1.0) - poly * exp(-(x * x))
  }

  /** LoOP — Local Outlier Probability (Kriegel, Kröger, Schubert,
    * Zimek, CIKM'09), the probabilistic face of the reference's LOF
    * chain (knn/LocalDensityBasedPredictor.scala:76-240): instead of a
    * ratio with no absolute meaning, each record gets P(outlier) ∈
    * [0,1]. pdist(o) = λ·√(Σ d(o,s)²/k) over the kNN; PLOF(o) =
    * pdist(o)/mean_{s∈kNN}(pdist(s)) − 1; nPLOF = λ·√(mean PLOF²);
    * LoOP(o) = max(0, erf(PLOF/(nPLOF·√2))).
    *
    * Determinism: both divisor aggregates (mean pdist of neighbors,
    * corpus-mean PLOF²) sum 8dp fixed-point longs so the hash-aggregate
    * order can't leak into the float result; erf is the shared
    * polynomial above. Output: src, plof, loopProb.
    *
    * Scale: same shape as [[lofFromKnn]] — two k-bounded joins over the
    * kNN frame plus one scalar broadcast (nPLOF); feed it `cellKnn`
    * output at corpus scale exactly like LOF (q193's documented path). */
  def loopFromKnn(nnIn: DataFrame, k: Int, lambda: Double = 3.0): DataFrame = {
    // eager GC-cleaned materialization (see lofFromKnn note)
    val nn = nnIn.select("src", "trg", "dist")
      .localCheckpoint(true)
    val fp8 = (c: Column) =>
      graft.core.fixedPointLong(c, 8).cast("decimal(38,0)")
    // Divisors use the ACTUAL per-src neighbor count (== k whenever the
    // kNN frame is full, e.g. cellKnn output; robust when a thinned feed
    // carries fewer than k rows — dividing by the literal k there would
    // silently deflate pdist/PLOF).
    val pdist = nn.groupBy("src")
      .agg((lit(lambda) * sqrt(sum(fp8(col("dist") * col("dist")))
        .cast("double") / 1e8 / count(lit(1)))).as("pdist"))
    val nbrPd = nn
      .join(pdist.select(col("src").as("trg"), col("pdist").as("_tpd")), "trg")
      .groupBy("src")
      .agg((sum(fp8(col("_tpd"))).cast("double") / 1e8 / count(lit(1)))
        .as("_epd"))
    val plof = pdist.join(nbrPd, "src")
      .withColumn("plof",
        when(col("_epd") > 0, col("pdist") / col("_epd") - lit(1.0))
          .otherwise(lit(0.0)))
    val nplof = plof.agg((lit(lambda) *
      sqrt(sum(fp8(col("plof") * col("plof"))).cast("double") / 1e8 /
        count(lit(1)))).as("nplof"))
    val z = col("plof") / (col("nplof") * lit(math.sqrt(2.0)))
    plof.join(broadcast(nplof))
      .withColumn("loopProb",
        when(col("nplof") <= 0, lit(0.0))
          .otherwise(greatest(lit(0.0),
            when(z >= 0, erfPos(z)).otherwise(-erfPos(-z)))))
      .select("src", "plof", "loopProb")
  }

  /** FastABOD — approximate angle-based outlier factor (Kriegel,
    * Schubert, Zimek, KDD'08 §5): ABOF(p) = weighted variance, over
    * neighbor pairs (a,b) ⊂ kNN(p), of cos-like angle (a−p)·(b−p) /
    * (‖a−p‖²·‖b−p‖²), weighted by 1/(‖a−p‖·‖b−p‖). Low variance = the
    * point sees all its neighbors in one direction = outlier — the
    * angle complement to the reference's distance-only density family.
    *
    * No vector subtraction materializes: every term expands into the
    * six pairwise dot products (a·b, a·p, b·p, a·a, b·b, p·p) via the
    * codegen'd `vec_dot`. The weighted first/second moments sum 8dp
    * (weighted angle) / 12dp (weights — O(1/d²) magnitude) fixed-point
    * longs per src, so aggregate order can't perturb the float result.
    * Output: src, abof (ascending = most anomalous first).
    *
    * Scale: the pair frame is N·k(k−1)/2 rows — k-bounded, never
    * all-pairs; three hash joins onto the (validated) vector table and
    * one hash aggregate. At corpus scale feed `cellKnn` neighbors. */
  def fastAbodFromKnn(nn: DataFrame, vecs: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    graft.expr.GraftFunctions.register(vecs.sparkSession)
    val vd = org.apache.spark.sql.functions
      .call_function("vec_validate", col(vecCol))
    val v = vecs.select(col(idCol).as("_vid"), vd.as("_v"))
    val dot = (a: Column, b: Column) =>
      org.apache.spark.sql.functions.call_function("vec_dot", a, b)
    // the kNN frame is referenced twice (both sides of the neighbor-pair
    // self-join); without this materialization the whole upstream
    // pair-distance + top-k subtree executed twice (r13 — measured 2×
    // the q486 plan). Eager localCheckpoint, not persist: see the
    // lofFromKnn note (the r13 persist here leaked — advice r13).
    val nnC = nn.select(col("src"), col("trg"))
      .localCheckpoint(true)
    val pairs = nnC.select(col("src"), col("trg").as("_a"))
      .join(nnC.select(col("src"), col("trg").as("_b")), "src")
      .where(col("_a") < col("_b"))
    val joined = pairs
      .join(v.select(col("_vid").as("src"), col("_v").as("_vp")), "src")
      .join(v.select(col("_vid").as("_a"), col("_v").as("_va")), "_a")
      .join(v.select(col("_vid").as("_b"), col("_v").as("_vb")), "_b")
      .withColumn("_ab", dot(col("_va"), col("_vb")))
      .withColumn("_ap", dot(col("_va"), col("_vp")))
      .withColumn("_bp", dot(col("_vb"), col("_vp")))
      .withColumn("_aa", dot(col("_va"), col("_va")))
      .withColumn("_bb", dot(col("_vb"), col("_vb")))
      .withColumn("_pp", dot(col("_vp"), col("_vp")))
    val na2 = col("_aa") - lit(2.0) * col("_ap") + col("_pp")
    val nb2 = col("_bb") - lit(2.0) * col("_bp") + col("_pp")
    val num = col("_ab") - col("_ap") - col("_bp") + col("_pp")
    val ok = na2 > 0 && nb2 > 0
    val wgt = when(ok, lit(1.0) / sqrt(na2 * nb2)).otherwise(lit(0.0))
    val ang = when(ok, num / (na2 * nb2)).otherwise(lit(0.0))
    val fp = (c: Column, p: Int) =>
      graft.core.fixedPointLong(c, p).cast("decimal(38,0)")
    joined
      .withColumn("_w", wgt).withColumn("_x", ang)
      .groupBy("src")
      .agg(sum(fp(col("_w"), 12)).as("_sw"),
        sum(fp(col("_w") * col("_x"), 12)).as("_swx"),
        sum(fp(col("_w") * col("_x") * col("_x"), 12)).as("_swxx"))
      .where(col("_sw") > 0)
      .withColumn("_m", col("_swx").cast("double") / col("_sw").cast("double"))
      .withColumn("abof",
        col("_swxx").cast("double") / col("_sw").cast("double") -
          col("_m") * col("_m"))
      .select("src", "abof")
  }
}
