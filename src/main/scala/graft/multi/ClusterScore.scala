package graft.multi

import graft.core.{linalg, LocalKMeans}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cluster- and projection-based scorers (SURVEY.md §2.4/§2.6):
  * CBLOF over sample-fitted KMeans and PCA-reconstruction error. */
object ClusterScore {

  /** CBLOF (cluster/ClusterBasedPredictor.scala:41-130): fit KMeans; large
    * clusters = the biggest clusters covering `largeFraction` of the data
    * (:89-110). Score = distance to own centroid for members of large
    * clusters; distance to the nearest *large* centroid otherwise.
    *
    * Centroids come from [[LocalKMeans]] on a driver-side sample (the
    * reference likewise scores against a pre-trained bounded cluster
    * file). The full data sees exactly two passes, both shuffle-free on
    * the data side: one hash-agg for cluster sizes, one codegen scoring
    * pass — no per-iteration scans. */
  def cblof(data: DataFrame, attrCols: Seq[String], k: Int,
      largeFraction: Double, seed: Long,
      sampleFraction: Double = 1.0, maxSample: Int = 20000): DataFrame = {
    val pts = LocalKMeans.sampleCols(data, attrCols, maxSample, sampleFraction, seed)
    cblofWith(data, attrCols, LocalKMeans.fit(pts, k, seed), largeFraction)
  }

  /** [[cblof]] over a deterministic fit: md5-of-id ordered sample +
    * fixed-iteration Lloyd with per-iteration 5dp centroid rounding
    * ([[LocalKMeans.fitFixed]]). Every number is engine-reproducible, so
    * the whole operator — fit included — carries a cross-engine SQL
    * oracle (q47), unlike the seeded-RNG path.
    *
    * [[cblof]] is the production default — its seeded sample skips the
    * md5 ordering pass (~1.6× on the fit at sf0.1). Use this variant when
    * runs must replay bit-identically across engines or reruns (audits,
    * oracle checks, regression pinning). */
  def cblofDeterministic(data: DataFrame, attrCols: Seq[String],
      idCols: Seq[String], k: Int, largeFraction: Double, iters: Int = 10,
      maxSample: Int = 20000): DataFrame = {
    val pts = LocalKMeans.sampleColsHashed(data, attrCols, idCols, maxSample)
    cblofWith(data, attrCols, LocalKMeans.fitFixed(pts, k, iters), largeFraction)
  }

  private def cblofWith(data: DataFrame, attrCols: Seq[String],
      cents: Array[Array[Double]], largeFraction: Double): DataFrame = {
    val dist = (ci: Int) => {
      val c = cents(ci)
      attrCols.zipWithIndex
        .map { case (a, i) => (col(a) - c(i)) * (col(a) - c(i)) }
        .reduce(_ + _)
    }
    // argmin via one array_min over (dist, idx) structs — each distance is
    // evaluated once (a least() + when-chain re-inlines every distance per
    // branch, exploding the codegen'd method past JIT limits); struct
    // comparison is lexicographic, so ties go to the lowest cluster index
    val best = array_min(array(cents.indices.map(ci =>
      struct(dist(ci).as("d"), lit(ci).as("cell"))): _*))
    val assigned = data.withColumn("_best", best)
      .withColumn("_cluster", col("_best.cell"))
      .withColumn("_d2", col("_best.d")).drop("_best")
    val sizes = assigned.groupBy("_cluster").count().collect()
      .map(r => r.getAs[Int]("_cluster") -> r.getAs[Long]("count")).toMap
    val total = sizes.values.sum.toDouble
    // cluster id breaks count ties so "large" is deterministic
    val bySize = sizes.toSeq.sortBy(t => (-t._2, t._1))
    val cum = bySize.scanLeft(0L)(_ + _._2).tail
    val nLarge = math.max(1, cum.indexWhere(_ >= largeFraction * total) + 1)
    val large = bySize.take(nLarge).map(_._1).toSet
    val nearestLarge: Column = large.toSeq.map(dist).reduce((a, b) => least(a, b))
    val isLarge = col("_cluster").isin(large.toSeq: _*)
    assigned
      .withColumn("score", sqrt(when(isLarge, col("_d2")).otherwise(nearestLarge)))
      .drop("_d2")
  }

  /** PCA reconstruction error (pc/PrincipalComponentPredictor.scala:38-120):
    * fit covariance per data set, project onto the top `nComponents`
    * principal axes, score = ‖x − x̂‖ (regen :85-96). Covariance + eigen
    * run on the fitted model (d×d), data side is a codegen expression. */
  def pcaScore(data: DataFrame, attrCols: Seq[String], nComponents: Int): DataFrame = {
    val d = attrCols.length
    require(nComponents < d, "nComponents must be < #attrs")
    val aggs = attrCols.map(a => avg(col(a)).as(s"mu_$a")) ++
      (for (i <- 0 until d; j <- i until d) yield
        covar_samp(col(attrCols(i)), col(attrCols(j))).as(s"c_${i}_$j"))
    val m = data.agg(aggs.head, aggs.tail: _*).head()
    val mus = attrCols.map(a => m.getAs[Double](s"mu_$a"))
    val cov = Array.tabulate(d, d) { (i, j) =>
      val (a, b) = (math.min(i, j), math.max(i, j))
      m.getAs[Double](s"c_${a}_$b")
    }
    val (_, vecs) = linalg.symEigen(cov)
    val diffs = attrCols.zip(mus).map { case (a, mu) => col(a) - mu }
    // residual² = Σ_{discarded axes} ((x−μ)·v_k)² — computed directly on the
    // minor axes; the algebraically equal ‖x−μ‖²−Σ_top(…)² cancels
    // catastrophically when the residual is small vs the data scale
    val resid2 = (nComponents until d).map { kI =>
      val p = diffs.zipWithIndex.map { case (c, i) => c * vecs(kI)(i) }.reduce(_ + _)
      p * p
    }.reduce(_ + _)
    data.withColumn("score", sqrt(resid2))
  }

  /** Grid-bucketed 2-D DBSCAN — the genuinely distributed DBSCAN shape
    * ([[dbscan1d]] is the window-function special case). Cell width is
    * ε/√2, so a point's ε-ball intersects at most the 5×5 block around
    * its cell: candidate pairs come from ONE equi-join of a 25-offset
    * probe side against the cell-keyed corpus — shuffle volume is
    * 25·n + surviving pairs, never all-pairs; per-cell occupancy bounds
    * the quadratic term exactly like the LSH bucket join. Core points
    * (≥ minPts ε-neighbors, self included) chain through the dedup
    * family's connected components (driver union-find below 1M edges,
    * large-star/small-star above — [[graft.text.TextOps.dupClusters]]),
    * labels = component-minimum core id. Borders attach to their
    * nearest core (ties → lowest id); everything else is noise,
    * tagged 'O'.
    *
    * Every number is raw-double arithmetic on both engines (floor
    * division for cells, exact squared distances, lexicographic
    * argmin) — no rounding device; the oracle replays the pair join and
    * closes components with a recursive CTE.
    *
    * Output: id, x, y, n_nbrs, is_core, cluster (-1 = noise), tag. */
  def dbscanGrid(data: DataFrame, idCol: String, xCol: String, yCol: String,
      eps: Double, minPts: Int): DataFrame = {
    val w = eps / math.sqrt(2.0)
    val pts = data
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .withColumn("cx", floor(col("x") / w).cast("long"))
      .withColumn("cy", floor(col("y") / w).cast("long"))
      // RETAINED caches (the bm25Search contract): pts feeds the probe
      // side, the build side and the final assembly; pairs feeds counts,
      // core edges and border attach. The result is lazy, so they must
      // outlive this call — long-lived callers clear them when done.
      .localCheckpoint(true)
    val offs = (for { dx <- -2 to 2; dy <- -2 to 2 } yield (dx, dy)).toSeq
    val probes = pts
      .withColumn("_o", explode(typedlit(offs)))
      .select(col("id").as("aid"), col("x").as("ax"), col("y").as("ay"),
        (col("cx") + col("_o._1")).as("cx"),
        (col("cy") + col("_o._2")).as("cy"))
    val d2 = (col("ax") - col("x")) * (col("ax") - col("x")) +
      (col("ay") - col("y")) * (col("ay") - col("y"))
    // self-pair (aid = bid, d² = 0) included — DBSCAN counts the point
    // itself. Pairs feed three consumers (counts, core edges, border
    // attach) → persist.
    val pairs = probes.join(pts, Seq("cx", "cy"))
      .where(d2 <= eps * eps)
      .select(col("aid"), col("id").as("bid"), d2.as("d2"))
      .localCheckpoint(true)
    val counts = pairs.groupBy("aid").agg(count(lit(1)).as("n_nbrs"))
    val cores = counts.where(col("n_nbrs") >= minPts).select(col("aid").as("id"))
    val coreEdges = pairs
      .join(cores.select(col("id").as("aid")), "aid")
      .join(cores.select(col("id").as("bid")), "bid")
      .where(col("aid") < col("bid"))
      .select(col("aid").as("a"), col("bid").as("b"))
    val comp = graft.text.TextOps.dupClusters(cores, "id", coreEdges)
      .select(col("id").as("_cid"), col("cluster"))
    // border: nearest core neighbor's component (min (d², bid))
    val nearCore = pairs
      .join(comp.select(col("_cid").as("bid"), col("cluster")), "bid")
      .groupBy("aid")
      .agg(min(struct(col("d2"), col("bid"), col("cluster"))).as("_m"))
      .select(col("aid").as("id"), col("_m.cluster").as("_bcl"))
    pts
      .join(counts.select(col("aid").as("id"), col("n_nbrs")), Seq("id"))
      .join(comp.select(col("_cid").as("id"), col("cluster").as("_ccl")),
        Seq("id"), "left")
      .join(nearCore, Seq("id"), "left")
      .withColumn("is_core", col("_ccl").isNotNull)
      .withColumn("cluster",
        coalesce(col("_ccl"), col("_bcl"), lit(-1L)))
      .withColumn("tag", when(col("cluster") === -1L, "O").otherwise("N"))
      .drop("_ccl", "_bcl", "cx", "cy")
  }

  /** Cell-occupancy histogram — the planning primitive for
    * [[dbscanGrid]] (the spatial analogue of `core.Skew.skewProfile`):
    * per-cell point counts rolled into (occupancy → n_cells), plus the
    * per-occupancy candidate-pair bound occupancy²·n_cells. Two hash
    * aggregates, no joins: run BEFORE the 25-offset pair join to learn
    * whether the dataset sits in the constant-occupancy regime (pair
    * work linear in n) or has hot cells (quadratic inside the cell —
    * the documented mitigation is cap-and-sample, like LSH's
    * hot-bucket cap). */
  def cellOccupancy(data: DataFrame, xCol: String, yCol: String,
      eps: Double): DataFrame = {
    val w = eps / math.sqrt(2.0)
    data
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(floor(col(xCol).cast("double") / w).cast("long").as("cx"),
        floor(col(yCol).cast("double") / w).cast("long").as("cy"))
      .agg(count(lit(1)).as("occupancy"))
      .groupBy("occupancy")
      .agg(count(lit(1)).as("n_cells"))
      .withColumn("pair_bound",
        col("occupancy") * col("occupancy") * col("n_cells"))
  }

  /** 1-D DBSCAN per key: density clustering on a numeric column with
    * noise-as-outlier — the density sibling of [[cblof]] (which needs k
    * up front; DBSCAN discovers the cluster count and flags sparse
    * points as noise, the classic anomaly face of clustering).
    *
    * In one dimension DBSCAN collapses to window functions — no
    * neighbor join at all: a RANGE frame counts ε-neighbors, core
    * points chain into clusters wherever consecutive core values are
    * ≤ ε apart (a running sum of gap-breaks), and border points attach
    * to the nearest core within ε (ties → the earlier core). Three
    * window passes over the same (key, value, id) sort order — Spark
    * plans ONE sort+exchange reused by all of them. Parallelism is
    * per-key, so at corpus scale the key should be an entity-grade
    * column (the per-event_type use here mirrors the reference's
    * per-type scoring); every comparison is on raw doubles (IEEE-exact,
    * engine-independent), so the operator needs no rounding device at
    * all to replay in SQL.
    *
    * Output: input cols + `n_nbrs`, `is_core`, `cluster` (1-based per
    * key; -1 = noise) + `tag` ('O' for noise, 'N' otherwise). */
  def dbscan1d(data: DataFrame, keyCols: Seq[String], valCol: String,
      idCol: String, eps: Double, minPts: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val part = keyCols.mkString(", ")
    val wAll = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(valCol), col(idCol))
    val run = wAll.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nbrs = expr(s"count(*) OVER (PARTITION BY $part ORDER BY $valCol " +
      s"RANGE BETWEEN $eps PRECEDING AND $eps FOLLOWING)")
    // previous core value strictly before this row (self excluded) —
    // null for the partition's first core, which then starts cluster 1
    val prevCoreV = last(when(col("is_core"), col(valCol)), ignoreNulls = true)
      .over(wAll.rowsBetween(Window.unboundedPreceding, -1))
    val brk = when(col("is_core") &&
      (prevCoreV.isNull || col(valCol) - prevCoreV > eps), 1).otherwise(0)
    // running sum of breaks = own cluster id on core rows; on non-core
    // rows it is the id of the latest core at-or-before (the prev-side
    // border candidate for free)
    val staged = data
      .where(col(valCol).isNotNull)
      .withColumn("n_nbrs", nbrs)
      .withColumn("is_core", col("n_nbrs") >= minPts)
      .withColumn("_cl", sum(brk).over(run))
    val prv = last(when(col("is_core"),
        struct(col(valCol).as("v"), col("_cl").as("c"))), ignoreNulls = true)
      .over(run)
    val nxt = first(when(col("is_core"),
        struct(col(valCol).as("v"), col("_cl").as("c"))), ignoreNulls = true)
      .over(wAll.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val dPrev = col(valCol) - col("_p.v")
    val dNext = col("_n.v") - col(valCol)
    val border =
      when(col("_p").isNotNull && dPrev <= eps &&
        (col("_n").isNull || dNext > eps || dPrev <= dNext), col("_p.c"))
      .when(col("_n").isNotNull && dNext <= eps, col("_n.c"))
      .otherwise(lit(-1L))
    staged
      .withColumn("_p", prv).withColumn("_n", nxt)
      .withColumn("cluster",
        when(col("is_core"), col("_cl")).otherwise(border).cast("long"))
      .withColumn("tag", when(col("cluster") === -1L, "O").otherwise("N"))
      .drop("_cl", "_p", "_n")
  }

  /** Single-linkage agglomerative clustering over a MODEL-SIZED
    * pairwise-distance frame (segments, centroids, source corpora —
    * never raw rows; `maxItems` makes the contract loud): n−1 merges,
    * each picking the globally nearest cross-cluster pair. Distances
    * freeze to 6dp longs so every pick is an exact (d, a, b)
    * lexicographic min; cluster labels are the lexicographically
    * smallest member, so the whole dendrogram is engine-exact. Output
    * one row per merge: step, item_a, item_b, merged, d.
    *
    * The dendrogram face the flat clusterers (k-means/DBSCAN/SemDedup)
    * lack: "which segments are similar, AND in what order do they
    * fuse" — the map a curation owner reads before picking k. */
  def singleLinkage(dist: DataFrame, aCol: String, bCol: String,
      dCol: String, maxItems: Int = 64): DataFrame = {
    val spark = dist.sparkSession
    import spark.implicits._
    val pairs = dist.select(col(aCol).cast("string").as("a"),
      col(bCol).cast("string").as("b"),
      graft.core.fixedPointLong(col(dCol).cast("double"), 6).as("d6"))
      .where(col("a") =!= col("b"))
      .limit(maxItems * maxItems + 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val items = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    require(items.length <= maxItems,
      s"singleLinkage is for model-sized frames: ${items.length} > $maxItems")
    val lbl = scala.collection.mutable.Map(items.map(i => i -> i): _*)
    val merges = scala.collection.mutable.ListBuffer
      .empty[(Int, String, String, String, Double)]
    var step = 1
    var more = true
    while (more && step < items.length) {
      val cand = pairs.filter(p => lbl(p._1) != lbl(p._2))
      if (cand.isEmpty) more = false
      else {
        val (a, b, d6) = cand.minBy(p => (p._3, p._1, p._2))
        val la = lbl(a); val lb = lbl(b)
        val m = if (la < lb) la else lb
        items.foreach(i => if (lbl(i) == la || lbl(i) == lb) lbl(i) = m)
        merges += ((step, a, b, m, d6.toDouble / 1e6))
        step += 1
      }
    }
    merges.toSeq.toDF("step", "item_a", "item_b", "merged", "d")
  }
}
