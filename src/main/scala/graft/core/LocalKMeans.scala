package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import scala.util.Random

/** Sample-based KMeans for model-fit operators (CBLOF centroids, IVF
  * coarse quantizer).
  *
  * The 100 TB shape: an iterative distributed KMeans re-scans the full
  * dataset every Lloyd iteration (10+ passes). Centroid quality, however,
  * only needs a statistical sample — so the fit collects a bounded sample
  * to the driver, runs seeded k-means++ + Lloyd's locally in microseconds,
  * and the full data only ever sees ONE broadcast-centroid assignment pass
  * (a codegen expression, no shuffle). This is the standard design for
  * CBLOF/IVF at scale (FAISS trains IVF quantizers on samples the same
  * way); the reference's cluster models are likewise pre-trained on
  * bounded data (cluster/ClusterBasedPredictor.scala:78 reads a small
  * cluster file). Deterministic under `seed`. */
object LocalKMeans {

  /** Collect ≤ maxSample rows of numeric columns as dense points.
    * `fraction` < 1 applies seeded Bernoulli sampling first — at cluster
    * scale pass the fraction that yields ~maxSample rows so the limit
    * never concentrates on early partitions. */
  def sampleCols(df: DataFrame, cols: Seq[String], maxSample: Int,
      fraction: Double, seed: Long): Array[Array[Double]] = {
    val base = if (fraction < 1.0) df.sample(withReplacement = false, fraction, seed) else df
    base.select(cols.map(c => col(c).cast("double")): _*)
      .limit(maxSample).collect()
      .map(r => Array.tabulate(cols.length)(r.getDouble))
  }

  /** Collect ≤ maxSample vectors from an array column. */
  def sampleVectors(df: DataFrame, vecCol: String, maxSample: Int,
      fraction: Double, seed: Long): Array[Array[Double]] = {
    val base = if (fraction < 1.0) df.sample(withReplacement = false, fraction, seed) else df
    base.select(col(vecCol).cast("array<double>"))
      .limit(maxSample).collect()
      .map(_.getSeq[Double](0).toArray)
  }

  /** Seeded k-means++ init, then Lloyd's to convergence (or maxIter).
    * Empty clusters keep their previous center. Returns k centers (fewer
    * when the sample has fewer points). */
  def fit(pts: Array[Array[Double]], k: Int, seed: Long,
      maxIter: Int = 25): Array[Array[Double]] = {
    require(pts.nonEmpty, "empty sample")
    val n = pts.length
    val d = pts(0).length
    val kk = math.min(k, n)
    val rng = new Random(seed)

    // k-means++ seeding
    val centers = Array.ofDim[Double](kk, d)
    Array.copy(pts(rng.nextInt(n)), 0, centers(0), 0, d)
    val minD2 = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < kk) {
      var i = 0
      while (i < n) {
        val dd = dist2(pts(i), centers(c - 1))
        if (dd < minD2(i)) minD2(i) = dd
        i += 1
      }
      val total = minD2.sum
      val target = rng.nextDouble() * total
      var acc = 0.0
      var pick = 0
      i = 0
      while (i < n && acc <= target) { acc += minD2(i); pick = i; i += 1 }
      Array.copy(pts(pick), 0, centers(c), 0, d)
      c += 1
    }

    // Lloyd's
    val assign = Array.fill(n)(-1)
    var moved = true
    var iter = 0
    while (moved && iter < maxIter) {
      moved = false
      var i = 0
      while (i < n) {
        var best = 0
        var bestD = Double.MaxValue
        var ci = 0
        while (ci < kk) {
          val dd = dist2(pts(i), centers(ci))
          if (dd < bestD) { bestD = dd; best = ci }
          ci += 1
        }
        if (best != assign(i)) { moved = true; assign(i) = best }
        i += 1
      }
      if (moved) {
        val sums = Array.ofDim[Double](kk, d)
        val counts = new Array[Long](kk)
        i = 0
        while (i < n) {
          val ci = assign(i)
          counts(ci) += 1
          var j = 0
          while (j < d) { sums(ci)(j) += pts(i)(j); j += 1 }
          i += 1
        }
        var ci = 0
        while (ci < kk) {
          if (counts(ci) > 0) {
            var j = 0
            while (j < d) { centers(ci)(j) = sums(ci)(j) / counts(ci); j += 1 }
          }
          ci += 1
        }
      }
      iter += 1
    }
    centers
  }

  private def dist2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val df = a(i) - b(i); s += df * df; i += 1 }
    s
  }
}
