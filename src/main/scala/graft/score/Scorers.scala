package graft.score

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-record scoring operators (SURVEY.md §2.4).
  *
  * Pattern: the fitted model (small, keyed) is broadcast-joined to the data
  * — the Spark-native equivalent of the reference's driver-loaded model +
  * `sparkCntxt.broadcast(predictor)` + map
  * (StatsBasedOutlierPredictor.scala:183,207). Scores are pure Catalyst
  * column expressions → whole-stage codegen, no shuffle on the data side.
  */
object Scorers {

  /** Shared config: which attrs to score, aggregation across attrs,
    * optional exponential rescale, threshold → tag. */
  case class Cfg(
      keyCols: Seq[String],
      attrCols: Seq[String],
      weights: Seq[Double] = Nil,
      strategy: String = "average",
      expConst: Double = 0.0,
      threshold: Double = 3.0)

  private def finish(df: DataFrame, perAttr: Seq[Column], cfg: Cfg): DataFrame = {
    val raw = aggregateScores(perAttr, cfg.strategy, cfg.weights)
    val scaled = if (cfg.expConst > 0) expScale(cfg.expConst, raw) else raw
    df.withColumn("score", scaled)
      .withColumn("tag", label(col("score"), lit(cfg.threshold)))
  }

  /** Pivot a long-format model (keyCols..., attr, m1, m2, ...) to wide
    * per-attr columns named like `<attr>__<measure>`, for a single
    * broadcast hash join against the data. */
  private def wideModel(model: DataFrame, keyCols: Seq[String], attrs: Seq[String],
      measures: Seq[String]): DataFrame = {
    // pivot on the small model: |keys| rows out, columns <attr>_<measure>
    val aggs = measures.map(m => first(col(m)).as(m))
    model.groupBy(keyCols.map(col): _*)
      .pivot("attr", attrs)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** zscore: |x-mean|/std per attr (ZscorePredictor.java:165-201).
    * Zero/negative std or missing stats → attr skipped (null). */
  def zscore(data: DataFrame, stats: DataFrame, cfg: Cfg): DataFrame = {
    val wide = wideModel(stats, cfg.keyCols, cfg.attrCols, Seq("mean", "std"))
    val joined = data.join(broadcast(wide), cfg.keyCols, "left")
    val per = cfg.attrCols.map { a =>
      val (m, s) = (col(s"${a}_mean"), col(s"${a}_std"))
      when(s > 0, abs(col(a) - m) / s)
    }
    finish(joined, per, cfg).drop(cfg.attrCols.flatMap(a => Seq(s"${a}_mean", s"${a}_std")): _*)
  }

  /** Per-record attribute attribution for the multi-attribute z-score:
    * contribution share of attribute a = z_a² / Σ_j z_j² (z exactly as
    * [[zscore]] computes it; skipped attrs contribute 0); `topAttr`
    * names the argmax — the "which attribute made this row an outlier"
    * explanation the tag alone doesn't give. Ties (measure-zero on
    * continuous data; all-zero rows) resolve to the lexicographically
    * greatest attribute via struct-max. Same broadcast-wide-model
    * single scoring pass as [[zscore]] — no extra shuffle. */
  def zscoreAttribution(data: DataFrame, stats: DataFrame, cfg: Cfg): DataFrame = {
    val wide = wideModel(stats, cfg.keyCols, cfg.attrCols, Seq("mean", "std"))
    val joined = data.join(broadcast(wide), cfg.keyCols, "left")
    val z2 = cfg.attrCols.map { a =>
      val (m, s) = (col(s"${a}_mean"), col(s"${a}_std"))
      val z = abs(col(a) - m) / s
      coalesce(when(s > 0, z * z), lit(0.0))
    }
    val tot = z2.reduce(_ + _)
    val shares = cfg.attrCols.zip(z2).map { case (a, q) =>
      when(tot > 0, q / tot).otherwise(lit(0.0)).as(s"${a}_share")
    }
    val top = array_max(array(cfg.attrCols.zip(z2).map { case (a, q) =>
      struct(when(tot > 0, q / tot).otherwise(lit(0.0)).as("s"),
        lit(a).as("a"))
    }: _*)).getField("a").as("topAttr")
    joined.select(data.columns.map(col) ++ shares :+ top: _*)
  }

  /** robustZscore: |x-median|/MAD (RobustZscorePredictor.java:161-193). */
  def robustZscore(data: DataFrame, robust: DataFrame, cfg: Cfg): DataFrame = {
    val wide = wideModel(robust, cfg.keyCols, cfg.attrCols, Seq("med", "mad"))
    val joined = data.join(broadcast(wide), cfg.keyCols, "left")
    val per = cfg.attrCols.map { a =>
      val (m, s) = (col(s"${a}_med"), col(s"${a}_mad"))
      when(s > 0, abs(col(a) - m) / s)
    }
    finish(joined, per, cfg).drop(cfg.attrCols.flatMap(a => Seq(s"${a}_med", s"${a}_mad")): _*)
  }

  /** extremeValueProbability: Gumbel-style tail exp(-exp(-|x-mean|/std))
    * (ExtremeValuePredictor.java:58-92). */
  def extremeValue(data: DataFrame, stats: DataFrame, cfg: Cfg): DataFrame = {
    val wide = wideModel(stats, cfg.keyCols, cfg.attrCols, Seq("mean", "std"))
    val joined = data.join(broadcast(wide), cfg.keyCols, "left")
    val per = cfg.attrCols.map { a =>
      val (m, s) = (col(s"${a}_mean"), col(s"${a}_std"))
      when(s > 0, exp(-exp(-abs(col(a) - m) / s)))
    }
    finish(joined, per, cfg).drop(cfg.attrCols.flatMap(a => Seq(s"${a}_mean", s"${a}_std")): _*)
  }

  /** estimatedProbability: multivariate bucket; score = 1 - freq(bucket);
    * unseen bucket → score 1 (EstimatedProbabilityBasedPredictor.java:82-90,
    * bucket key DistributionBasedPredictor.java:247-266). */
  def estimatedProbability(
      data: DataFrame, hist: DataFrame, cfg: Cfg,
      numericAttrs: Seq[(String, Double)], categoricalAttrs: Seq[String] = Nil): DataFrame = {
    val bucketParts: Seq[Column] =
      numericAttrs.map { case (c, w) => floor(col(c) / w).cast("long").cast("string") } ++
        categoricalAttrs.map(col)
    val withB = data.withColumn("bucket", concat_ws(":", bucketParts: _*))
    val joined = withB.join(broadcast(hist.select((cfg.keyCols ++ Seq("bucket", "freq")).map(col): _*)),
      cfg.keyCols :+ "bucket", "left")
    val raw = lit(1.0) - coalesce(col("freq"), lit(0.0))
    val scaled = if (cfg.expConst > 0) expScale(cfg.expConst, raw) else raw
    joined.withColumn("score", scaled)
      .withColumn("tag", label(col("score"), lit(cfg.threshold)))
      .drop("bucket", "freq")
  }

  /** estimatedAttributeProbability: per-attr histogram lookup; score
    * strategy "inverse" → 1-p, "inverseLog" → min(-ln p, 20)
    * (EsimatedAttrtibuteProbabilityBasedPredictor.java:175-212, cap 20). */
  def estimatedAttrProbability(
      data: DataFrame, attrHist: DataFrame, cfg: Cfg,
      widths: Map[String, Double], useLog: Boolean): DataFrame = {
    var joined = data
    cfg.attrCols.foreach { a =>
      val h = attrHist.where(col("attr") === a)
        .select(cfg.keyCols.map(col) :+ col("bucket").as(s"${a}_b") :+ col("freq").as(s"${a}_p"): _*)
      joined = joined
        .withColumn(s"${a}_b", floor(col(a) / widths(a)).cast("long"))
        .join(broadcast(h), cfg.keyCols :+ s"${a}_b", "left")
    }
    val perAttr = cfg.attrCols.map { a =>
      val p = coalesce(col(s"${a}_p"), lit(0.0))
      if (useLog) least(-log(greatest(p, lit(1e-12))), lit(20.0)) else lit(1.0) - p
    }
    finish(joined, perAttr, cfg)
      .drop(cfg.attrCols.flatMap(a => Seq(s"${a}_b", s"${a}_p")): _*)
  }

  /** estimatedCumProbability: two-tailed CDF score — p<0.5 ? 1-p : p of the
    * cumulative distribution at the record's bucket
    * (EstimatedCumProbabilityBasedPredictor.java:72-97). Unseen bucket →
    * CDF of the nearest preceding bucket (0 below the histogram). */
  def estimatedCumProbability(
      data: DataFrame, attrHist: DataFrame, cfg: Cfg,
      widths: Map[String, Double]): DataFrame = {
    var joined = data
    cfg.attrCols.foreach { a =>
      val h = attrHist.where(col("attr") === a)
        .select(cfg.keyCols.map(col) :+ col("bucket").as(s"${a}_b") :+ col("cumFreq").as(s"${a}_cp"): _*)
      joined = joined
        .withColumn(s"${a}_b", floor(col(a) / widths(a)).cast("long"))
        .join(broadcast(h), cfg.keyCols :+ s"${a}_b", "left")
    }
    val perAttr = cfg.attrCols.map { a =>
      val p = col(s"${a}_cp")
      when(p.isNotNull, when(p < 0.5, lit(1.0) - p).otherwise(p))
    }
    finish(joined, perAttr, cfg)
      .drop(cfg.attrCols.flatMap(a => Seq(s"${a}_b", s"${a}_cp")): _*)
  }

  /** estimatedMetaProbability: probability-of-probability — look up the
    * record's bucket frequency, then the meta-distribution mass of that
    * frequency; score 1-p or capped -ln p
    * (EstimatedMetaProbabilityBasedPredictor.java:77-115). */
  def estimatedMetaProbability(
      data: DataFrame, attrHist: DataFrame, metaHist: DataFrame, cfg: Cfg,
      widths: Map[String, Double], metaWidth: Double, useLog: Boolean): DataFrame = {
    var joined = data
    cfg.attrCols.foreach { a =>
      val h = attrHist.where(col("attr") === a)
        .select(cfg.keyCols.map(col) :+ col("bucket").as(s"${a}_b") :+ col("freq").as(s"${a}_p"): _*)
      val m = metaHist.where(col("attr") === a)
        .select(cfg.keyCols.map(col) :+ col("fbucket").as(s"${a}_fb") :+ col("metaFreq").as(s"${a}_mp"): _*)
      joined = joined
        .withColumn(s"${a}_b", floor(col(a) / widths(a)).cast("long"))
        .join(broadcast(h), cfg.keyCols :+ s"${a}_b", "left")
        .withColumn(s"${a}_fb", floor(coalesce(col(s"${a}_p"), lit(0.0)) / metaWidth).cast("long"))
        .join(broadcast(m), cfg.keyCols :+ s"${a}_fb", "left")
    }
    val perAttr = cfg.attrCols.map { a =>
      val p = coalesce(col(s"${a}_mp"), lit(0.0))
      if (useLog) least(-log(greatest(p, lit(1e-12))), lit(20.0)) else lit(1.0) - p
    }
    finish(joined, perAttr, cfg)
      .drop(cfg.attrCols.flatMap(a => Seq(s"${a}_b", s"${a}_p", s"${a}_fb", s"${a}_mp")): _*)
  }

  /** interPercentileDifference: below Q1 → (Q1-x)/IQR, above Q3 → (x-Q3)/IQR,
    * inside → 0 (InterPercentileDifferenceBasedPredictor.java:85-122). */
  def iqrScore(data: DataFrame, quant: DataFrame, cfg: Cfg): DataFrame = {
    val wide = wideModel(quant, cfg.keyCols, cfg.attrCols, Seq("q1", "q3", "iqr"))
    val joined = data.join(broadcast(wide), cfg.keyCols, "left")
    val per = cfg.attrCols.map { a =>
      val (q1, q3, iqr) = (col(s"${a}_q1"), col(s"${a}_q3"), col(s"${a}_iqr"))
      when(iqr > 0,
        when(col(a) < q1, (q1 - col(a)) / iqr)
          .when(col(a) > q3, (col(a) - q3) / iqr)
          .otherwise(lit(0.0)))
    }
    finish(joined, per, cfg)
      .drop(cfg.attrCols.flatMap(a => Seq(s"${a}_q1", s"${a}_q3", s"${a}_iqr")): _*)
  }

  /** out-of-range: outlier when outside the allowed [lo,hi] band:
    * delta = x>mid ? x-hi : lo-x; score = logistic(c*delta)
    * (OutRangeBasedPredictor.scala:95-125). Range model: keyCols..., attr, lo, hi. */
  def outOfRange(data: DataFrame, ranges: DataFrame, cfg: Cfg): DataFrame = {
    // honor a model-provided mid (the reference's range files carry an
    // explicit one, which need not be the midpoint); derive it otherwise
    val withMid =
      if (ranges.columns.contains("mid")) ranges
      else ranges.withColumn("mid", (col("lo") + col("hi")) / 2)
    val wide = wideModel(withMid, cfg.keyCols, cfg.attrCols, Seq("lo", "hi", "mid"))
    val joined = data.join(broadcast(wide), cfg.keyCols, "left")
    val per = cfg.attrCols.map { a =>
      val (lo, hi, mid) = (col(s"${a}_lo"), col(s"${a}_hi"), col(s"${a}_mid"))
      val delta = when(col(a) > mid, col(a) - hi).otherwise(lo - col(a))
      when(lo.isNotNull, logisticScale(cfg.expConst, delta))
    }
    finish(joined, per, cfg.copy(expConst = 0.0))
      .drop(cfg.attrCols.flatMap(a => Seq(s"${a}_lo", s"${a}_hi", s"${a}_mid")): _*)
  }

  /** in-range: outlier when INSIDE the forbidden band: score =
    * 1 - logistic(c*delta) with the same delta
    * (InRangeBasedPredictor.scala:81-118). */
  def inRange(data: DataFrame, ranges: DataFrame, cfg: Cfg): DataFrame = {
    val withMid =
      if (ranges.columns.contains("mid")) ranges
      else ranges.withColumn("mid", (col("lo") + col("hi")) / 2)
    val wide = wideModel(withMid, cfg.keyCols, cfg.attrCols, Seq("lo", "hi", "mid"))
    val joined = data.join(broadcast(wide), cfg.keyCols, "left")
    val per = cfg.attrCols.map { a =>
      val (lo, hi, mid) = (col(s"${a}_lo"), col(s"${a}_hi"), col(s"${a}_mid"))
      val delta = when(col(a) > mid, col(a) - hi).otherwise(lo - col(a))
      when(lo.isNotNull, lit(1.0) - logisticScale(cfg.expConst, delta))
    }
    finish(joined, per, cfg.copy(expConst = 0.0))
      .drop(cfg.attrCols.flatMap(a => Seq(s"${a}_lo", s"${a}_hi", s"${a}_mid")): _*)
  }

  /** Mahalanobis distance (x-mu)^T Sigma^-1 (x-mu)
    * (MahalanobisDistancePredictor.java:78-104). The inverse covariance is
    * computed per key on the driver from the tiny fitted model (|keys| ×
    * d² values) and rejoined as literal columns — d is small (schema
    * attrs), data side stays a broadcast join + codegen expression. */
  def mahalanobis(data: DataFrame, cfg: Cfg): DataFrame = {
    val d = cfg.attrCols.size
    val spark = data.sparkSession
    import spark.implicits._
    // fit: per-key means + covariance via one hash agg
    val aggs =
      cfg.attrCols.map(a => avg(col(a)).as(s"mu_$a")) ++
        (for (i <- 0 until d; j <- i until d) yield
          covar_samp(col(cfg.attrCols(i)), col(cfg.attrCols(j))).as(s"cov_${i}_$j"))
    val model = data.groupBy(cfg.keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val rows = model.collect() // |keys| rows — model-sized, not data-sized
    val inv = rows.map { r =>
      val cov = Array.tabulate(d, d) { (i, j) =>
        val (a, b) = (math.min(i, j), math.max(i, j))
        r.getAs[Double](s"cov_${a}_$b")
      }
      val m = graft.core.linalg.inverse(cov)
      val key = cfg.keyCols.map(k => r.get(r.fieldIndex(k)).toString).mkString("|")
      key -> (cfg.attrCols.map(a => r.getAs[Double](s"mu_$a")), m)
    }.toMap
    val keyExpr = concat_ws("|", cfg.keyCols.map(c => col(c).cast("string")): _*)
    val invDf = inv.toSeq.map { case (k, (mus, m)) =>
      (k, mus, m.flatten.toSeq)
    }.toDF("mkey", "mus", "sinv")
    val joined = data.withColumn("mkey", keyExpr).join(broadcast(invDf), Seq("mkey"), "left")
    val diffs = cfg.attrCols.zipWithIndex.map { case (a, i) =>
      col(a) - element_at(col("mus"), i + 1)
    }
    val quad = (for (i <- 0 until d; j <- 0 until d) yield
      diffs(i) * diffs(j) * element_at(col("sinv"), i * d + j + 1)).reduce(_ + _)
    val raw = sqrt(greatest(quad, lit(0.0)))
    val scaled = if (cfg.expConst > 0) expScale(cfg.expConst, raw) else raw
    joined.withColumn("score", scaled)
      .withColumn("tag", label(col("score"), lit(cfg.threshold)))
      .drop("mkey", "mus", "sinv")
  }

  /** Keep only outlier rows (OutlierUtility.scala:49-54). */
  def outliersOnly(tagged: DataFrame): DataFrame = tagged.where(col("tag") === "O")

  /** Outlier-free clean data: full-row anti semantics of
    * data.subtract(outliers) (StatsBasedOutlierPredictor.scala:297). */
  def cleanData(tagged: DataFrame): DataFrame =
    tagged.where(col("tag") =!= "O").drop("score", "tag")

  /** Polarity suppression: retag O→N when the deviation is on the
    * ignored side of the mean (StatsBasedOutlierPredictor.scala:436-470).
    * polarity "high" keeps only x > mean outliers, "low" only x < mean. */
  def suppressPolarity(
      tagged: DataFrame, stats: DataFrame, keyCols: Seq[String], attr: String,
      polarity: String): DataFrame = {
    val m = stats.where(col("attr") === attr)
      .select(keyCols.map(col) :+ col("mean").as("_pol_mean"): _*)
    val joined = tagged.join(broadcast(m), keyCols, "left")
    val keep = polarity match {
      case "high" => col(attr) > col("_pol_mean")
      case "low"  => col(attr) < col("_pol_mean")
    }
    joined.withColumn("tag",
      when(col("tag") === "O" && !keep, lit("N")).otherwise(col("tag")))
      .drop("_pol_mean")
  }
}
