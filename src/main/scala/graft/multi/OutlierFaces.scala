package graft.multi

import graft.core.fixedPointLong
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-shape outlier detectors that need NO pairwise work —
  * the "cheap at 100 TB" end of the proximity family. Where LOF / LoOP /
  * FastABOD pay a kNN join, these read each record against per-dimension
  * (ECOD), per-projection (LODA) or per-value-histogram (KDE) summaries:
  * one or two hash aggregates / windows, then a single scoring pass.
  *
  * Complements the reference's per-attribute scorers
  * (beymani spark/src/.../StatsBasedOutlierPredictor — zscore /
  * estimatedProbability faces) with the modern ECDF/projection canon.
  *
  * Determinism (engine-wide q116 device): every cross-row float roll-up
  * quantizes its terms to fixed-point longs before summing, so hash
  * aggregation order can't leak into the result; ln/exp ride the
  * established libm-parity assumption; md5 seeds all randomness. */
object OutlierFaces {

  private def fp8(c: Column): Column =
    fixedPointLong(c, 8).cast("decimal(38,0)")

  /** ECOD — unsupervised outlier detection via Empirical Cumulative
    * distribution functions (Li, Zhao, Botta, Ionescu, Hu; TKDE 2022).
    * Per dimension j: left tail F(x) = #{y ≤ x}/n, right tail
    * G(x) = #{y ≥ x}/n (both include x itself, so never zero). Per
    * record: O_left = Σⱼ −ln F, O_right = Σⱼ −ln G, O_auto picks each
    * dimension's tail by its skew sign (6dp-frozen third central
    * moment < 0 → left tail, else right); ecod = max of the three.
    *
    * Scale: ONE shuffle keyed on the dimension index (d partitions ×
    * n rows each) feeds both ECDF windows and the moment aggregate;
    * scoring is a broadcast of the d-row skew table + one hash
    * aggregate back to records. The per-dim sort is the ECDF-window
    * family ceiling (same contract as `concentration`) — at 100 TB
    * swap the windows for per-dim quantized value histograms.
    *
    * Output: (vec_id, o_left, o_right, o_auto, ecod), higher = more
    * anomalous. */
  def ecod(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val ex = vecs.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("_id"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("_i", "_x")))
    val wl = Window.partitionBy("_i").orderBy(col("_x"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wr = Window.partitionBy("_i").orderBy(col("_x").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy("_i")
    val ec = ex
      .withColumn("_cl", count(lit(1)).over(wl))
      .withColumn("_cr", count(lit(1)).over(wr))
      .withColumn("_n", count(lit(1)).over(wn))
    // 6dp-frozen skew sign per dim from exact fixed-point moment sums
    val sk = ex.groupBy("_i").agg(
        count(lit(1)).as("_nn"),
        sum(fp8(col("_x"))).as("_s1"),
        sum(fp8(col("_x") * col("_x"))).as("_s2"),
        sum(fp8(col("_x") * col("_x") * col("_x"))).as("_s3"))
      .withColumn("_mu", col("_s1").cast("double") / 1e8 / col("_nn"))
      .withColumn("_m3",
        col("_s3").cast("double") / 1e8 / col("_nn") -
          lit(3.0) * col("_mu") *
            (col("_s2").cast("double") / 1e8 / col("_nn")) +
          lit(2.0) * col("_mu") * col("_mu") * col("_mu"))
      .select(col("_i"), (fixedPointLong(col("_m3"), 6) < 0).as("_neg"))
    ec.join(broadcast(sk), "_i")
      .withColumn("_tl", -log(col("_cl").cast("double") / col("_n")))
      .withColumn("_tr", -log(col("_cr").cast("double") / col("_n")))
      .withColumn("_ta", when(col("_neg"), col("_tl")).otherwise(col("_tr")))
      .groupBy(col("_id"))
      .agg((sum(fp8(col("_tl"))).cast("double") / 1e8).as("o_left"),
        (sum(fp8(col("_tr"))).cast("double") / 1e8).as("o_right"),
        (sum(fp8(col("_ta"))).cast("double") / 1e8).as("o_auto"))
      .withColumn("ecod",
        greatest(col("o_left"), col("o_right"), col("o_auto")))
      .select(col("_id").as("vec_id"), col("o_left"), col("o_right"),
        col("o_auto"), col("ecod"))
  }

  /** ECOD over per-dimension QUANTIZED value histograms — the 100 TB
    * form of [[ecod]] (r11 verdict item 4): the windowed ECDF sorts
    * every dimension's n rows in one task; this form collapses each
    * dimension to its `grain`-dp value histogram FIRST (the q516
    * kdeOutlier collapse device), so the per-dim cumulative window
    * rides a range×10^grain-bounded frame whose size is CONSTANT in the
    * record count, and records join their tail probabilities back on
    * (dim, quantized value).
    *
    * The operator is DEFINED on the quantized values (skew moments
    * included), so the oracle replays it exactly; rank agreement with
    * the exact-value window form is pinned ≥99% in OutlierFacesSpec.
    *
    * Scale: one (dim, value) hash aggregate, one histogram-partition
    * window, one equi-join back, one per-record hash aggregate — no
    * data-sized sort anywhere. Output: as [[ecod]]. */
  def ecodHistogram(vecs: DataFrame, idCol: String, vecCol: String,
      grain: Int = 4): DataFrame = {
    require(grain >= 0 && grain <= 6, "0 <= grain <= 6")
    val scale = math.pow(10.0, grain)
    val ex = vecs.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("_id"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("_i", "_x")))
      .withColumn("_xq", fixedPointLong(col("_x"), grain))
    val h = ex.groupBy(col("_i"), col("_xq"))
      .agg(count(lit(1)).as("_c"))
    val wl = Window.partitionBy(col("_i")).orderBy(col("_xq").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nd = h.groupBy(col("_i")).agg(sum(col("_c")).as("_n"))
    val cum = h.withColumn("_cl", sum(col("_c")).over(wl))
      .join(nd, "_i")
      .withColumn("_cr", col("_n") - col("_cl") + col("_c"))
    // 6dp-frozen skew sign per dim from exact QUANTIZED moment sums
    val xd = col("_xq").cast("double") / scale
    val sk = ex.groupBy("_i").agg(
        count(lit(1)).as("_nn"),
        sum(fp8(xd)).as("_s1"),
        sum(fp8(xd * xd)).as("_s2"),
        sum(fp8(xd * xd * xd)).as("_s3"))
      .withColumn("_mu", col("_s1").cast("double") / 1e8 / col("_nn"))
      .withColumn("_m3",
        col("_s3").cast("double") / 1e8 / col("_nn") -
          lit(3.0) * col("_mu") *
            (col("_s2").cast("double") / 1e8 / col("_nn")) +
          lit(2.0) * col("_mu") * col("_mu") * col("_mu"))
      .select(col("_i"), (fixedPointLong(col("_m3"), 6) < 0).as("_neg"))
    ex.select(col("_id"), col("_i"), col("_xq"))
      .join(cum, Seq("_i", "_xq"))
      .join(broadcast(sk), "_i")
      .withColumn("_tl", -log(col("_cl").cast("double") / col("_n")))
      .withColumn("_tr", -log(col("_cr").cast("double") / col("_n")))
      .withColumn("_ta", when(col("_neg"), col("_tl")).otherwise(col("_tr")))
      .groupBy(col("_id"))
      .agg((sum(fp8(col("_tl"))).cast("double") / 1e8).as("o_left"),
        (sum(fp8(col("_tr"))).cast("double") / 1e8).as("o_right"),
        (sum(fp8(col("_ta"))).cast("double") / 1e8).as("o_auto"))
      .withColumn("ecod",
        greatest(col("o_left"), col("o_right"), col("o_auto")))
      .select(col("_id").as("vec_id"), col("o_left"), col("o_right"),
        col("o_auto"), col("ecod"))
  }

  /** LODA — Lightweight On-line Detector of Anomalies (Pevný, Machine
    * Learning 102, 2016), Rademacher variant: `nProj` sparse random
    * projections (⌈√d⌉ non-zero ±1 weights each, dims and signs from
    * md5 — the Achlioptas-sign device jlDistortion established), each
    * histogrammed into `nBins` equal-width bins over the projection's
    * own [min, max]; score(x) = mean over projections of −ln p̂ⱼ(x),
    * p̂ = bin count / n.
    *
    * Scale: the weight table is (nProj × ⌈√d⌉) broadcast rows; the
    * corpus sees one explode + hash aggregate to (record, projection)
    * and one more to (projection, bin) — no sort, no window, no join
    * wider than the model. The paper's one-pass/online histogram
    * update maps to the streaming-sketch family if needed.
    *
    * Output: (vec_id, loda), higher = more anomalous. */
  def loda(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
      nProj: Int = 8, nBins: Int = 16): DataFrame = {
    require(nProj >= 1 && nBins >= 2, "nProj >= 1, nBins >= 2")
    val spark = vecs.sparkSession
    val nnz = math.ceil(math.sqrt(dim.toDouble)).toInt
    val h = graft.text.TextOps.hash56(
      concat(lit("loda_"), col("_j").cast("string"), lit("_"),
        col("_i").cast("string")))
    val wRank = Window.partitionBy("_j").orderBy(col("_h"), col("_i"))
    val weights = spark.range(nProj.toLong).select(col("id").as("_j"))
      .crossJoin(spark.range(dim.toLong).select(col("id").as("_i")))
      .withColumn("_h", h)
      .withColumn("_rk", row_number().over(wRank))
      .where(col("_rk") <= nnz)
      .withColumn("_w",
        when(pmod(col("_h"), lit(2L)) === 0L, lit(1.0)).otherwise(lit(-1.0)))
      .select("_j", "_i", "_w")
    val proj = vecs.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("_id"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("_i", "_x")))
      .join(broadcast(weights), "_i")
      .groupBy(col("_id"), col("_j"))
      .agg((sum(fp8(col("_x") * col("_w"))).cast("double") / 1e8).as("_y"))
      // eager localCheckpoint (GC-cleaned), not an unpersist-less persist
      .localCheckpoint(true)
    val edges = proj.groupBy("_j")
      .agg(min(col("_y")).as("_lo"), max(col("_y")).as("_hi"),
        count(lit(1)).as("_n"))
      .withColumn("_wd", (col("_hi") - col("_lo")) / nBins)
    val binned = proj.join(broadcast(edges), "_j")
      .withColumn("_b",
        when(col("_wd") > 0,
          least(floor((col("_y") - col("_lo")) / col("_wd")),
            lit(nBins - 1.0)).cast("long"))
          .otherwise(lit(0L)))
    val dens = binned.groupBy("_j", "_b").agg(count(lit(1)).as("_c"))
    binned.join(broadcast(dens), Seq("_j", "_b"))
      .withColumn("_t", -log(col("_c").cast("double") / col("_n")))
      .groupBy(col("_id"))
      .agg((sum(fp8(col("_t"))).cast("double") / 1e8 / nProj).as("loda"))
      .select(col("_id").as("vec_id"), col("loda"))
  }

  /** Truncated-Gaussian-kernel KDE outlier score over a per-key VALUE
    * HISTOGRAM (Parzen 1962 density, the classic "low density = outlier"
    * face). The operator is DEFINED on 2dp-quantized values with the
    * kernel truncated at `cut`·h (tail mass past 4σ < 1e-4): density(x)
    * = Σ_y c_y · exp(−(x−y)²/2h²) / (n·h·√2π) over histogram entries
    * with |x−y| ≤ cut·h; score = −ln density.
    *
    * Scale: records collapse to the value histogram FIRST (one hash
    * aggregate; value-cardinality-bounded like the quantile/PAV
    * family), then the truncation maps to integer-cent buckets of
    * width cut·h joined on (key, bucket ± 1) — per-entry fan-in is
    * bounded by the histogram density, never corpus². All bucket
    * arithmetic is exact integer cents; exp/ln ride libm parity.
    *
    * Output: one row per (key, distinct 2dp value): n_at (records at
    * the value), density, kde_score — join back on the quantized value
    * for per-record tagging. */
  def kdeOutlier(data: DataFrame, keyCols: Seq[String], valCol: String,
      h: Double, cut: Double = 4.0): DataFrame = {
    require(h > 0 && cut > 0, "bandwidth and cutoff must be positive")
    val keys = keyCols.map(col)
    val cw = math.max(1L, math.round(cut * h * 100.0)) // bucket width, cents
    val hist = data.where(col(valCol).isNotNull)
      .groupBy(keys :+ fixedPointLong(col(valCol), 2).as("_vc"): _*)
      .agg(count(lit(1)).as("_c"))
    val wn = Window.partitionBy(keyCols.map(col): _*)
    val x = hist
      .withColumn("_n", sum(col("_c")).over(wn))
      .withColumn("_bx", floor(col("_vc").cast("double") / cw).cast("long"))
    val y = hist.select(
      keyCols.map(k => col(k).as(s"_y_$k")) :+ col("_vc").as("_yc") :+
        col("_c").as("_cy"): _*)
      .withColumn("_by", explode(array(
        floor(col("_yc").cast("double") / cw).cast("long") - 1,
        floor(col("_yc").cast("double") / cw).cast("long"),
        floor(col("_yc").cast("double") / cw).cast("long") + 1)))
    val norm = lit(1.0) / (lit(h) * lit(math.sqrt(2.0 * math.Pi)))
    x.join(y, (keyCols.map(k => col(k) === col(s"_y_$k")) :+
        (col("_bx") === col("_by"))).reduce(_ && _))
      .where(abs(col("_vc") - col("_yc")) <= cw)
      .withColumn("_d", (col("_vc") - col("_yc")).cast("double") / 100.0)
      .withColumn("_term",
        col("_cy") * exp(-(col("_d") * col("_d")) / (2.0 * h * h)))
      .groupBy(keys :+ col("_vc").as("_v") :+ col("_n").as("_nn"): _*)
      .agg(sum(fp8(col("_term"))).as("_s8"))
      .withColumn("density",
        col("_s8").cast("double") / 1e8 / col("_nn") * norm)
      .withColumn("kde_score", -log(col("density")))
      .select(keyCols.map(col) :+
        (col("_v").cast("double") / 100.0).as("value") :+
        col("_nn").as("n") :+ col("density") :+ col("kde_score"): _*)
  }

  /** Chauvenet's criterion (1863; Taylor, "Error Analysis" §6.2) — the
    * classical rejection rule the z-score family rounds out: reject x
    * when n · P(|Z| ≥ z) < 0.5 under the fitted normal, with the
    * two-sided tail 1 − erf(z/√2) from the shared A&S-7.1.26
    * polynomial. Same broadcast-stats + one-pass shape as `zscore`.
    *
    * Output: per record (keys, id, value, z, p_tail, reject). */
  def chauvenet(data: DataFrame, keyCols: Seq[String], idCol: String,
      valCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val st = data.where(col(valCol).isNotNull)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("_n"),
        sum(fp8(col(valCol))).as("_s1"),
        sum(fp8(col(valCol) * col(valCol))).as("_s2"))
      .withColumn("_mu", col("_s1").cast("double") / 1e8 / col("_n"))
      .withColumn("_sd", sqrt(greatest(lit(0.0),
        col("_s2").cast("double") / 1e8 / col("_n") -
          col("_mu") * col("_mu"))))
      .select(keys :+ col("_n") :+ col("_mu") :+ col("_sd"): _*)
    data.join(broadcast(st), keyCols)
      .withColumn("z",
        when(col("_sd") > 0, abs(col(valCol) - col("_mu")) / col("_sd"))
          .otherwise(lit(0.0)))
      .withColumn("p_tail",
        lit(1.0) - Proximity.erfPos(col("z") / math.sqrt(2.0)))
      .withColumn("reject", col("_n") * col("p_tail") < 0.5)
      .select(keyCols.map(col) :+ col(idCol) :+ col(valCol) :+
        col("z") :+ col("p_tail") :+ col("reject"): _*)
  }
}
