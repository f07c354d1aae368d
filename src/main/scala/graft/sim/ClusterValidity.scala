package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Internal cluster-validity indices over a [[KMeansDist]] fit —
  * Davies-Bouldin (IEEE TPAMI 1979), Calinski-Harabasz (Comm. Stat.
  * 1974) and the centroid-diameter Dunn index (J. Cybernetics 1974).
  * The "is k right / did the clustering work" audit next to the
  * silhouette: silhouette reads per-POINT separation, these three read
  * the per-CLUSTER geometry (scatter vs centroid separation, variance
  * ratio, worst-diameter vs closest-pair).
  *
  * Determinism: everything derives from the integer-exact Lloyd fit
  * (6dp-quantized vectors, integer d²); per-cluster mean distances are
  * 8dp fixed-point sums (combine-order-free); the k²-bounded index
  * arithmetic is a fixed float program over those frozen per-cluster
  * scalars, replayed term-for-term by the SQL oracle.
  *
  * Scale: the fit's per-iteration scan + ONE extra assignment pass with
  * a k-row aggregate and a d-row global-mean aggregate; all index math
  * is k²-bounded driver work. No pair joins, no windows. */
object ClusterValidity {

  private def roundHalfAway(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else -math.floor(-x + 0.5).toLong

  private def fp8d(x: Double): Long = roundHalfAway(x * 1e8)

  /** Fit k-means (integer Lloyd, `iters` rounds), then emit one row:
    * (k, n, db_index, ch_index, dunn_index, w_inertia, b_inertia).
    * Lower DB and higher CH / Dunn = better-separated clustering.
    * Empty cells are excluded from the indices (documented; they keep
    * their stale centroid in the fit). */
  def kmeansValidity(vecs: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, iters: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val cents = KMeansDist.fitCentroids(vecs, idCol, vecCol, dim, k, iters)
    val a = KMeansDist.assign(vecs, vecCol, cents)
    val st = a.groupBy("cell")
      .agg(count(lit(1)).as("n"),
        sum(col("d6").cast("decimal(38,0)")).as("w6"),
        max(col("d6")).as("r6"),
        sum(graft.core.fixedPointLong(col("dist"), 8)
          .cast("decimal(38,0)")).as("sd8"))
      .collect()
      .map(r => r.getAs[Int]("cell") -> (r.getAs[Long]("n"),
        BigDecimal(r.getAs[java.math.BigDecimal]("w6")),
        r.getAs[Long]("r6"),
        BigDecimal(r.getAs[java.math.BigDecimal]("sd8"))))
      .toMap
    // global 6dp-grain mean vector (the centroid-update rounding device)
    val gs = vecs.where(col(vecCol).isNotNull)
      .select(posexplode(KMeansDist.quantizeCol(col(vecCol)))
        .as(Seq("_j", "_q")))
      .groupBy("_j")
      .agg(sum(col("_q").cast("decimal(38,0)")).as("_s"),
        count(lit(1)).as("_n"))
      .collect()
      .map(r => r.getAs[Int]("_j") ->
        (BigDecimal(r.getAs[java.math.BigDecimal]("_s")), r.getAs[Long]("_n")))
      .toMap
    val n = gs.values.headOption.map(_._2).getOrElse(0L)
    require(n > k, s"need more than k=$k points, got $n")
    val gc = Array.tabulate(dim)(j =>
      roundHalfAway(gs(j)._1.toDouble / n))
    val live = cents.indices.filter(ci => st.get(ci).exists(_._1 > 0))
    require(live.size >= 2, "need at least 2 non-empty clusters")
    // between-cluster scatter: Σ_c n_c · ‖cv_c − ĉ‖²  (exact integer)
    val b6 = live.map { ci =>
      val d2 = cents(ci).zip(gc)
        .map { case (cx, gx) => val d = BigInt(cx - gx); d * d }.sum
      BigInt(st(ci)._1) * d2
    }.sum
    val w6 = live.map(ci => st(ci)._2).sum
    val wIn = w6.toDouble / 1e12
    val bIn = b6.toDouble / 1e12
    val ch = (bIn / (k - 1)) / (wIn / (n - k))
    // per-cluster mean distance to centroid (8dp-frozen)
    val s = live.map(ci => ci -> st(ci)._4.toDouble / 1e8 / st(ci)._1).toMap
    def cd(i: Int, j: Int): Double = math.sqrt(cents(i).zip(cents(j))
      .map { case (a1, b1) => val d = BigInt(a1 - b1); d * d }
      .sum.toDouble) / 1e6
    val db = live.map { i =>
      fp8d(live.filter(_ != i)
        .map(j => (s(i) + s(j)) / cd(i, j)).max)
    }.sum.toDouble / 1e8 / live.size
    val dMin = (for (i <- live; j <- live if i < j) yield cd(i, j)).min
    val rMax = live.map(ci => math.sqrt(st(ci)._3.toDouble) / 1e6).max
    val dunn = dMin / (2.0 * rMax)
    Seq((k, n, db, ch, dunn, wIn, bIn))
      .toDF("k", "n", "db_index", "ch_index", "dunn_index",
        "w_inertia", "b_inertia")
  }
}
