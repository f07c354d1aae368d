package graft.sim

import graft.core.LocalKMeans
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed full-corpus Lloyd k-means in integer fixed-point.
  *
  * [[LocalKMeans]] (the CBLOF / IVF fit path) trains on a bounded
  * driver-side sample — the right default at 100 TB, where centroid
  * quality is a statistical property of a sample. This operator is the
  * complementary shape for when the ASSIGNMENT ITSELF is the product
  * (corpus bucketing for SemDedup-style curation, per-cluster quotas,
  * balanced sharding): every Lloyd iteration runs as one distributed
  * scan + one k-row hash aggregate over the FULL corpus, so the fit
  * reflects all the data, not a sample.
  *
  * Determinism contract (the q116 / CUSUM integer pattern): vectors are
  * quantized once to 6-decimal fixed-point longs (`round half away from
  * zero` — the float→double cast is exact and ×1e6 is one correctly-
  * rounded IEEE op, so both engines produce identical longs from the
  * same parquet). From there every number the fit touches is integer:
  * squared distances, argmin (ties → lowest cell), per-cell per-dim
  * sums. Integer addition is associative, so any combine order — Spark's
  * partial aggregates or DuckDB's sequential scan — yields the same
  * sums, and the only float op per iteration is one exact-input double
  * division per (cell, dim), identically rounded on both engines. The
  * whole fit replays bit-for-bit in SQL (the q181 oracle).
  *
  * Scale shape: per iteration the corpus sees one codegen'd
  * assignment pass (k×d literal centroids broadcast inside the plan)
  * and one hash aggregate producing k rows of d+1 longs; the driver
  * holds only k×d longs between iterations. No per-point state, no
  * shuffle wider than k rows. Init = evenly spaced points of an
  * md5-ordered bounded sample (a distributed TakeOrdered), the same
  * device the IVF fit uses.
  */
object KMeansDist {

  /** Fixed-point grain: 6 decimals. (4e6)²·dim fits a long for any
    * |value| ≤ ~4000 at dim ≤ 512; driver embeddings are unit-scale. */
  private val Grain = 1e6

  private def q6(c: Column): Column =
    when(c >= 0, floor(c * Grain + 0.5)).otherwise(-floor(-c * Grain + 0.5))
      .cast("long")

  /** Quantize an array<float|double> column to fixed-point longs. */
  private def quantize(vecCol: Column): Column =
    transform(vecCol.cast("array<double>"), x => q6(x))

  /** Public face of the 6dp quantizer — for callers composing their own
    * probes over [[fitCentroids]] output (e.g. Proximity.cellKnn). */
  def quantizeCol(vecCol: Column): Column = quantize(vecCol)

  private def roundHalfAway(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else -math.floor(-x + 0.5).toLong

  /** Nearest-cell struct (d², cell): the fused codegen expression
    * ([[graft.expr.VecNearestQ]]) — exact integer d², strict-less argmin
    * (ties → lowest cell), one loop with no per-cell intermediate
    * arrays. Ordering-identical to the oracle's struct-min over
    * per-cell distances. */
  private def best(spark: org.apache.spark.sql.SparkSession, v: Column,
      cents: Array[Array[Long]]): Column =
    graft.expr.GraftFunctions.vecNearestQ(spark, v, cents)

  /** Deterministic init: evenly spaced rows (rank ⌊i·n/k⌋) of the
    * md5-of-id-ordered sample, quantized — mirrors LocalKMeans.fitFixed
    * so the SQL replay can reproduce it with ORDER BY md5 LIMIT. */
  private def init(data: DataFrame, idCol: String, vecCol: String, k: Int,
      maxSample: Int): Array[Array[Long]] = {
    val pts = LocalKMeans.sampleVectorsHashed(data, vecCol, Seq(idCol), maxSample)
    require(pts.nonEmpty, "kmeans fit on an empty corpus")
    val n = pts.length
    val kk = math.min(k, n)
    Array.tabulate(kk)(i => pts((i.toLong * n / kk).toInt).map(x => roundHalfAway(x * Grain)))
  }

  /** Full-corpus Lloyd fit. Returns one row per (cell, j):
    * `cell, j, cx` (centroid coordinate, back at value scale) plus the
    * cell's `n_members` and exact `inertia` (Σ d² over members, value²
    * scale). Empty cells keep their previous centroid (n_members 0). */
  def fit(data: DataFrame, idCol: String, vecCol: String, dim: Int, k: Int,
      iters: Int, maxSample: Int = 20000): DataFrame = {
    val spark = data.sparkSession
    var cents = init(data, idCol, vecCol, k, maxSample)
    val vq = data.select(quantize(col(vecCol)).as("_v"))
    // one distributed scan + k-row collect per iteration; cache the
    // quantized projection so iterations re-read columnar cache, not
    // parquet + re-quantize. iterCache (r14): the row-threshold coalesce
    // keeps each of the iters+1 actions from being a full-parallelism
    // task-scheduling exercise on a small corpus (~64k rows/task) while
    // large inputs keep the session's parallelism (guide §1.2).
    val (handle, cached, _) = graft.core.iterCache(vq)
    try {
      val sumCols = (0 until dim).map(j =>
        sum(element_at(col("_v"), j + 1)).as(s"s$j")) :+ count(lit(1)).as("n")
      for (_ <- 1 to iters) {
        val g = cached
          .withColumn("_cell", best(spark, col("_v"), cents).getField("cell"))
          .groupBy("_cell").agg(sumCols.head, sumCols.tail: _*)
          .collect()
        val next = cents.map(_.clone())
        g.foreach { r =>
          val cell = r.getAs[Int]("_cell")
          val n = r.getAs[Long]("n")
          if (n > 0) (0 until dim).foreach { j =>
            next(cell)(j) = roundHalfAway(r.getAs[Long](s"s$j").toDouble / n)
          }
        }
        cents = next
      }
      // final assignment: exact integer inertia + sizes per cell. The
      // inertia sum is over value²-scale longs (≤ dim·(2·|x|ₘₐₓ·10⁶)²
      // per row) — a plain long sum can overflow past ~10⁵ rows, so sum
      // in decimal(38,0): still exact/associative, matches DuckDB's
      // hugeint sum, and headroom to ~10³⁸ covers any corpus.
      val fin = cached
        .withColumn("_b", best(spark, col("_v"), cents))
        .groupBy(col("_b").getField("cell").as("cell"))
        .agg(count(lit(1)).as("n_members"),
          sum(col("_b").getField("d").cast("decimal(38,0)")).as("_in6"))
        .collect()
        .map(r => r.getAs[Int]("cell") ->
          (r.getAs[Long]("n_members"),
            BigDecimal(r.getAs[java.math.BigDecimal]("_in6"))))
        .toMap
      import spark.implicits._
      cents.zipWithIndex.flatMap { case (c, ci) =>
        val (n, in6) = fin.getOrElse(ci, (0L, BigDecimal(0)))
        c.zipWithIndex.map { case (cx, j) =>
          // exact-integer → double conversion first, then the /1e12 —
          // the same two correctly-rounded steps the oracle's
          // ::DOUBLE / 1e12 performs, so the doubles are bit-identical
          (ci, j, cx.toDouble / Grain, n, in6.toDouble / (Grain * Grain))
        }
      }.toSeq.toDF("cell", "j", "cx", "n_members", "inertia")
    } finally { handle.unpersist(false) }
  }

  /** Assignment face: per-row nearest cell + distance at value scale
    * (one codegen pass over the corpus with literal centroids; also
    * exact integer `d6` for order-exact ranking). Stream-compatible:
    * no shuffle, no state — usable directly on a streaming DataFrame. */
  def assign(data: DataFrame, vecCol: String, cents: Array[Array[Long]]): DataFrame =
    data
      .withColumn("_b", best(data.sparkSession, quantize(col(vecCol)), cents))
      .withColumn("cell", col("_b").getField("cell"))
      .withColumn("d6", col("_b").getField("d"))
      .withColumn("dist", sqrt(col("_b").getField("d")) / Grain)
      .drop("_b")

  /** Run the fit, then return its centroids as quantized longs (for
    * [[assign]]) — the fit DataFrame's cx column re-scaled back. */
  def fitCentroids(data: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, iters: Int, maxSample: Int = 20000): Array[Array[Long]] = {
    val rows = fit(data, idCol, vecCol, dim, k, iters, maxSample).collect()
    val byCell = rows.groupBy(_.getAs[Int]("cell"))
    Array.tabulate(byCell.size) { ci =>
      val cs = byCell(ci).sortBy(_.getAs[Int]("j"))
      cs.map(r => roundHalfAway(r.getAs[Double]("cx") * Grain)).toArray
    }
  }

  /** Distance-to-centroid outliers: fit, assign, global top-k by exact
    * integer distance (desc, id asc — a distributed TakeOrdered). The
    * k-means face of CBLOF's "far from every centroid" anomaly. */
  def topOutliers(data: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, iters: Int, topK: Int, maxSample: Int = 20000): DataFrame = {
    val cents = fitCentroids(data, idCol, vecCol, dim, k, iters, maxSample)
    assign(data, vecCol, cents)
      .select(col(idCol), col("cell"), col("d6"), col("dist"))
      .orderBy(col("d6").desc, col(idCol))
      .limit(topK)
      .drop("d6")
  }
}
