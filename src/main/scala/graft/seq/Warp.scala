package graft.seq

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Dynamic-time-warping distance (engine addition): how far each
  * entity's series is from a reference shape AFTER optimally aligning
  * the time axes (Sakoe & Chiba 1978 DP recurrence, unconstrained
  * band). Euclidean per-day comparison calls a 2-day phase shift a huge
  * anomaly; DTW scores the SHAPE difference — the right notion for
  * "which entities' weekly pattern drifted" over calendar-bucketed
  * series.
  *
  * Determinism: every DP cell has the unique value
  * cost(i,j) + min(up, left, diag) — a min over already-determined
  * cells plus one add, so cell values are evaluation-order-independent
  * and the DuckDB oracle's cell-at-a-time recursive-CTE replay matches
  * bit-for-bit. Series values are exact-fixed-point-sum ratios
  * (s/n/1e4), the same expression on both engines.
  *
  * Scale: one hash aggregate to (key, bucket) cells, one exchange on
  * the key, then an O(n·m) per-key DP with n ≤ maxLen enforced — work
  * is Σ_key n_key·m, never corpus²; the reference series is model-sized
  * (bucket-count entries) and rides the closure as a broadcast-style
  * literal. */
object Warp {

  case class DtwRow(key: String, n: Int, m: Int, dtw_dist: Double,
    dtw_norm: Double)

  /** DTW distance from each key's (ordCol-sorted) series to `ref`.
    * Output one row per key: key, n, m, dtw_dist, dtw_norm
    * (= dist/(n+m)). Keys with empty series are absent; series longer
    * than maxLen throw (the per-entity-series contract, made loud). */
  def dtwToReference(series: DataFrame, keyCol: String, ordCol: String,
      valCol: String, ref: Array[Double], maxLen: Int = 4096)
      : Dataset[DtwRow] = {
    require(ref.nonEmpty, "dtwToReference: empty reference series")
    require(ref.length <= maxLen, s"reference longer than maxLen=$maxLen")
    val spark = series.sparkSession
    import spark.implicits._
    val m = ref.length
    val pts = series.select(col(keyCol).cast("string").as("key"),
      col(ordCol).cast("long").as("ord"),
      col(valCol).cast("double").as("v"))
      .as[(String, Long, Double)]
    pts.groupByKey(_._1).mapGroups { (k, it) =>
      val xs = it.toArray.sortBy(t => (t._2, t._3)).map(_._3)
      val n = xs.length
      require(n <= maxLen,
        s"dtwToReference: series for key '$k' has $n > maxLen=$maxLen points")
      val dp = new Array[Double](n * m)
      var c = 0
      while (c < n * m) {
        val i = c / m; val j = c % m
        val cost = math.abs(xs(i) - ref(j))
        dp(c) =
          if (c == 0) cost
          else {
            var best = Double.MaxValue
            if (j > 0 && dp(c - 1) < best) best = dp(c - 1)
            if (i > 0 && dp(c - m) < best) best = dp(c - m)
            if (i > 0 && j > 0 && dp(c - m - 1) < best) best = dp(c - m - 1)
            cost + best
          }
        c += 1
      }
      DtwRow(k, n, m, dp(n * m - 1), dp(n * m - 1) / (n + m))
    }
  }
}
