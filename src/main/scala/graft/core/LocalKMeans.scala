package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, concat_ws, md5}
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

  /** Deterministic bounded sample: rows in md5-of-id order (a total,
    * engine-independent order — the same device the text/LSH oracles
    * use), truncated to `maxSample`. orderBy+limit compiles to a
    * distributed TakeOrdered — no full sort at scale. */
  def sampleColsHashed(df: DataFrame, cols: Seq[String], idCols: Seq[String],
      maxSample: Int): Array[Array[Double]] = {
    val h = md5(concat_ws("|", idCols.map(c => col(c).cast("string")): _*))
    val xs = cols.zipWithIndex.map { case (c, i) => col(c).cast("double").as(s"_x$i") }
    // id columns may repeat (so h ties); the value columns complete the
    // sort key, making the sampled VALUE sequence total and
    // engine-independent even then
    df.select(xs :+ h.as("_h"): _*)
      .orderBy(col("_h") +: cols.indices.map(i => col(s"_x$i")): _*)
      .limit(maxSample).collect()
      .map(r => Array.tabulate(cols.length)(r.getDouble))
  }

  /** [[sampleColsHashed]] for an array column (lexicographic array order
    * breaks hash ties, as list order does on the SQL side). */
  def sampleVectorsHashed(df: DataFrame, vecCol: String, idCols: Seq[String],
      maxSample: Int): Array[Array[Double]] = {
    val h = md5(concat_ws("|", idCols.map(c => col(c).cast("string")): _*))
    df.select(col(vecCol).cast("array<double>").as("_v"), h.as("_h"))
      .orderBy(col("_h"), col("_v"))
      .limit(maxSample).collect()
      .map(_.getSeq[Double](0).toArray)
  }

  /** Fixed-iteration Lloyd over a deterministically ordered sample:
    * init = evenly spaced sample points (rank ⌊i·n/k⌋ in hash order),
    * exactly `iters` assignment/update rounds, centroids rounded to `dp`
    * decimals after every update (DuckDB round semantics). The rounding
    * pins the fit cross-engine: per-dimension means differ between
    * engines only by float summation order (ulps), which the 10^-dp
    * quantization absorbs — so an unrolled SQL replay reproduces every
    * centroid bit-for-bit (the q47/q61 oracles do exactly that).
    * `viaDot` selects the assignment metric ‖c‖² − 2·p·c (ordering-equal
    * to ‖p−c‖², cheaper for wide vectors, and the same expression the IVF
    * scorer evaluates). Empty clusters keep their previous center. */
  def fitFixed(pts: Array[Array[Double]], k: Int, iters: Int, dp: Int = 5,
      viaDot: Boolean = false): Array[Array[Double]] = {
    require(pts.nonEmpty, "empty sample")
    val n = pts.length
    val d = pts(0).length
    val kk = math.min(k, n)
    val centers = Array.tabulate(kk)(i => pts((i.toLong * n / kk).toInt).clone())
    var iter = 0
    val asgn = new Array[Int](n)
    while (iter < iters) {
      val cc = if (viaDot) centers.map(c => dotSeq(c, c)) else null
      val sums = Array.ofDim[Double](kk, d)
      val counts = new Array[Long](kk)
      // assignment is per-point independent → parallel (each index writes
      // its own slot; sample×k×d flops dominate the fit — 13 Gflop at
      // 4096×512×64×10). The ORDER-sensitive float accumulation below
      // stays sequential in point-index order, so centroids are
      // bit-identical to the serial loop (and to the SQL replay).
      java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
        var best = 0
        var bestD = Double.MaxValue
        var ci = 0
        while (ci < kk) {
          val dd = if (viaDot) cc(ci) - 2.0 * dotSeq(pts(i), centers(ci))
                   else dist2(pts(i), centers(ci))
          if (dd < bestD) { bestD = dd; best = ci }
          ci += 1
        }
        asgn(i) = best
      }
      var i = 0
      while (i < n) {
        val best = asgn(i)
        counts(best) += 1
        var j = 0
        while (j < d) { sums(best)(j) += pts(i)(j); j += 1 }
        i += 1
      }
      var ci = 0
      while (ci < kk) {
        if (counts(ci) > 0) {
          var j = 0
          while (j < d) {
            centers(ci)(j) = roundDp(sums(ci)(j) / counts(ci), dp)
            j += 1
          }
        }
        ci += 1
      }
      iter += 1
    }
    centers
  }

  /** Argmin centroid under the viaDot metric (‖c‖² − 2·p·c), ties to the
    * lowest index — exactly the arithmetic of the [[fitFixed]] assignment
    * loop and the SQL struct-argmin `min({'d':…,'c':…})`, so driver-side
    * assignments replay cross-engine. */
  def assignViaDot(p: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var ci = 0
    while (ci < cents.length) {
      val dd = dotSeq(cents(ci), cents(ci)) - 2.0 * dotSeq(p, cents(ci))
      if (dd < bestD) { bestD = dd; best = ci }
      ci += 1
    }
    best
  }

  /** DuckDB-style round half-away-from-zero on the scaled float — the
    * driver-side twin of [[core.roundLikeDuck]] (same IEEE ops). */
  def roundDp(x: Double, p: Int): Double = {
    val f = math.pow(10, p)
    val r = if (x >= 0) math.floor(x * f + 0.5) / f else -math.floor(-x * f + 0.5) / f
    if (r == 0.0) 0.0 else r
  }

  /** Sequential dot product — the summation order of both the native
    * vec_dot expression and DuckDB's list_dot_product. */
  def dotSeq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
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
