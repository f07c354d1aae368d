package graft.model

import graft.text.TextOps.hash56
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable frequency/quantile sketches (engine additions beside the
  * HLL/KMV cardinality family): the AMS second-frequency-moment sketch
  * (join-size / self-join-size estimation — the number a 100 TB query
  * planner wants before committing to a shuffle) and the DDSketch
  * relative-error quantile sketch (Masson, Rim, Lee; VLDB'19 — the
  * production latency-quantile structure).
  *
  * Both are LOSSLESSLY mergeable: AMS counters add, DDSketch bucket
  * counts add — the property that makes them per-partition /
  * per-day composable without re-reading data. Determinism: AMS signs
  * come from md5 (the engine-wide seed device) and counters are exact
  * integer sums; DDSketch bucket indices are one ln + ceil per row
  * (libm parity), counts exact. */
object Sketches {

  // ---------------------------------------------------------------- AMS

  /** AMS sign counters (Alon, Matias, Szegedy; STOC'96): `g·r`
    * counters per key, counter_j = Σ_v f_v·s_j(v) with s_j(v) = ±1
    * taken from BIT j of the value's single 56-bit md5 hash (one md5
    * per row instead of k — measured 2× on the q527 fixture; md5 bits
    * are the established sign source, k ≤ 56 enforced). Integer-exact,
    * order-free, and counters from disjoint slices of the data ADD
    * (merge = sum). Output: (key…, j, c). */
  def amsF2Counters(data: DataFrame, keyCols: Seq[String],
      valCol: String, groups: Int = 5, reps: Int = 8): DataFrame = {
    require(groups >= 1 && groups % 2 == 1 && reps >= 1,
      "odd groups >= 1 (median), reps >= 1")
    val k = groups * reps
    require(k <= 56, "groups*reps <= 56 (one md5's worth of sign bits)")
    val keys = keyCols.map(col)
    data.where(col(valCol).isNotNull)
      .select(keys :+
        hash56(concat(lit("ams_"), col(valCol).cast("string")))
          .as("_h"): _*)
      .withColumn("_j", explode(array((0 until k).map(lit): _*)))
      .withColumn("_s",
        when(expr("shiftright(_h, _j) % 2") === 0L, 1L).otherwise(-1L))
      .groupBy(keys :+ col("_j"): _*)
      .agg(sum(col("_s")).as("c"))
  }

  /** Lossless counter merge: same-j counters add. */
  def amsF2Merge(parts: Seq[DataFrame], keyCols: Seq[String]): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy((keyCols :+ "_j").map(col): _*)
      .agg(sum(col("c")).as("c"))

  /** F2 estimate from the counters: mean of c² inside each of the
    * `groups` rep-groups, MEDIAN across groups (odd `groups` → the
    * exact middle order statistic; integer c² sums, one tiny window).
    * Output: (key…, f2_est). */
  def amsF2Estimate(counters: DataFrame, keyCols: Seq[String],
      groups: Int = 5, reps: Int = 8): DataFrame = {
    val keys = keyCols.map(col)
    val gm = counters
      .withColumn("_g", expr(s"_j div $reps"))
      .groupBy(keys :+ col("_g"): _*)
      .agg((sum(col("c") * col("c")).cast("double") / reps).as("_m"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_m").asc, col("_g").asc)
    gm.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === (groups + 1) / 2)
      .select(keys :+ col("_m").as("f2_est"): _*)
  }

  /** Exact F2 = Σ_v f_v² (the ground truth the sketch estimates):
    * one (key, v) histogram + one roll-up. */
  def f2Exact(data: DataFrame, keyCols: Seq[String], valCol: String)
      : DataFrame = {
    val keys = keyCols.map(col)
    data.where(col(valCol).isNotNull)
      .groupBy(keys :+ col(valCol).cast("string").as("_v"): _*)
      .agg(count(lit(1)).as("_f"))
      .groupBy(keys: _*)
      .agg(sum(col("_f") * col("_f")).as("f2_exact"))
  }

  // ----------------------------------------------------------- DDSketch

  /** DDSketch bucket histogram: values map to (side, idx) with
    * idx = ⌈ln|x| / ln γ⌉ for |x| > eps0, side ∈ {−1, 0, 1}; the
    * relative-error contract is |est − x|/|x| ≤ (γ−1)/(γ+1). Bucket
    * counts are exact longs and ADD under merge ([[ddsketchMerge]]).
    * Output: (key…, side, idx, c). */
  def ddsketchBuckets(data: DataFrame, keyCols: Seq[String],
      valCol: String, gamma: Double = 1.02, eps0: Double = 1e-4)
      : DataFrame = {
    require(gamma > 1.0 && eps0 > 0, "gamma > 1, eps0 > 0")
    val keys = keyCols.map(col)
    val x = col(valCol).cast("double")
    val lg = math.log(gamma)
    data.where(x.isNotNull)
      .select(keys :+
        when(x > eps0, lit(1)).when(x < -eps0, lit(-1)).otherwise(lit(0))
          .as("side") :+
        when(x > eps0, ceil(log(x) / lg).cast("long"))
          .when(x < -eps0, ceil(log(-x) / lg).cast("long"))
          .otherwise(lit(0L)).as("idx"): _*)
      .groupBy(keys :+ col("side") :+ col("idx"): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** Lossless bucket merge: same-(side, idx) counts add. */
  def ddsketchMerge(parts: Seq[DataFrame], keyCols: Seq[String])
      : DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy((keyCols :+ "side" :+ "idx").map(col): _*)
      .agg(sum(col("c")).as("c"))

  /** Quantile estimates from a bucket histogram: per (key, τ) walk the
    * buckets in value order (side asc, within-side signed idx) to the
    * 1-based rank ⌊τ·(n−1)⌋+1 and report the bucket's midpoint
    * 2γ^idx/(γ+1) (mirrored for side −1, 0 for the zero bucket).
    * One sort window over the BUCKET frame (bucket-cardinality-sized,
    * never data-sized). Output: (key…, tau, n, est). */
  def ddsketchQuantiles(buckets: DataFrame, keyCols: Seq[String],
      taus: Seq[Double], gamma: Double = 1.02): DataFrame = {
    require(taus.nonEmpty && taus.forall(t => t >= 0 && t <= 1),
      "taus in [0,1]")
    val keys = keyCols.map(col)
    val lg = math.log(gamma)
    val mid = lit(2.0 / (gamma + 1.0))
    val ord = when(col("side") === -1, -col("idx")).otherwise(col("idx"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("side").asc, ord.asc)
    val wn = Window.partitionBy(keyCols.map(col): _*)
    val cum = buckets
      .withColumn("_cum", sum(col("c")).over(w))
      .withColumn("_n", sum(col("c")).over(wn))
      .withColumn("tau", explode(array(taus.map(lit): _*)))
      .withColumn("_rk",
        floor(col("tau") * (col("_n") - 1).cast("double")).cast("long") + 1)
      .where(col("_cum") >= col("_rk") &&
        col("_cum") - col("c") < col("_rk"))
    cum.select(keys :+ col("tau") :+ col("_n").as("n") :+
      when(col("side") === 0, lit(0.0))
        .otherwise(col("side").cast("double") * mid *
          exp(col("idx").cast("double") * lg)).as("est"): _*)
  }
}
