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
}
