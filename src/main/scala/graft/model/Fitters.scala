package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model fitters. Each fit produces a small keyed model DataFrame that
  * scorers broadcast-join back to the data — the Spark-native replacement
  * for the reference's driver-loaded flat model files
  * (SURVEY.md §1 "Models = flat keyed text files").
  *
  * All fits are single hash-aggregations (map-side partial agg, one
  * shuffle on the model key) or bottom-k windows the optimizer caps at k
  * per partition pre-exchange — at 100 TB the shuffle carries only
  * pre-aggregated per-key partials, and the resulting model is tiny
  * (|keys| × |attrs| rows, or k/depth×width sketch rows), safe to
  * broadcast.
  */
object Fitters {

  /** Mean/stddev/count/min/max per (key, attribute) — long format.
    * Replaces chombo NumericalAttrStats (resource/and_spark.sh:46-48).
    * Output: keyCols..., attr, mean, std, cnt, vmin, vmax
    */
  def stats(df: DataFrame, keyCols: Seq[String], attrCols: Seq[String]): DataFrame = {
    val melted = melt(df, keyCols, attrCols)
    melted
      .groupBy((keyCols :+ "attr").map(col): _*)
      .agg(
        avg("value").as("mean"),
        stddev_samp("value").as("std"),
        count("value").as("cnt"),
        min("value").as("vmin"),
        max("value").as("vmax"))
  }

  /** Merge [[stats]] models fitted on disjoint slices into the model of
    * their union — the k-way form of Chan/Golub/LeVeque parallel
    * variance (also how the reference's incremental modeling updates
    * stats without refitting history: chombo's IncrementalStats pattern).
    * An incremental pipeline refits ONLY the new slice (one day, one
    * partition) and merges models — the history is never rescanned.
    *
    * Each model row yields its sufficient statistics exactly:
    * sum = mean·cnt and Σx² = std²·(cnt−1) + cnt·mean²; merging is then
    * one hash aggregation over model-sized input, and the merged std
    * reproduces a direct fit of the union to float precision (the q112
    * oracle fits the union directly in SQL). Single-row slices carry
    * zero M2 (their std is NULL/NaN under stddev_samp — guarded). */
  def statsMerge(models: Seq[DataFrame], keyCols: Seq[String]): DataFrame = {
    require(models.nonEmpty, "no models to merge")
    val gcols = (keyCols :+ "attr").map(col)
    val m2 = when(col("cnt") > 1,
      pow(col("std"), 2) * (col("cnt") - 1)).otherwise(lit(0.0))
    models.reduce(_ unionByName _)
      .withColumn("_sum", col("mean") * col("cnt"))
      .withColumn("_sumSq", m2 + col("cnt") * pow(col("mean"), 2))
      .groupBy(gcols: _*)
      .agg(sum("cnt").as("cnt"), sum("_sum").as("_s"), sum("_sumSq").as("_ss"),
        min("vmin").as("vmin"), max("vmax").as("vmax"))
      .withColumn("mean", col("_s") / col("cnt"))
      .withColumn("std", when(col("cnt") > 1,
        sqrt(greatest(
          (col("_ss") - col("_s") * col("_s") / col("cnt")) / (col("cnt") - 1),
          lit(0.0))))
        .otherwise(lit(null).cast("double")))
      .select(gcols ++ Seq(col("mean"), col("std"), col("cnt"),
        col("vmin"), col("vmax")): _*)
  }

  /** Merge [[histogram]] models fitted on disjoint slices — the
    * incremental companion to [[statsMerge]]: bucket counts are additive,
    * and freq recomputes from the merged totals, so the result is
    * BIT-identical to a direct fit of the union (no float merge error at
    * all — counts are exact longs). One model-sized hash aggregation. */
  def histogramMerge(models: Seq[DataFrame], keyCols: Seq[String]): DataFrame = {
    require(models.nonEmpty, "no models to merge")
    val merged = models.reduce(_ unionByName _)
      .groupBy((keyCols :+ "bucket").map(col): _*)
      .agg(sum("cnt").as("cnt"))
    val w = Window.partitionBy(keyCols.map(col): _*)
    merged.withColumn("freq", col("cnt") / sum("cnt").over(w))
  }

  /** KMV (k-minimum-values, "bottom-k theta") distinct-count sketch —
    * Bar-Yossef et al. 2002 with the Beyer et al. SIGMOD'07 unbiased
    * estimator; the same shape as an Apache DataSketches theta sketch.
    * Engine addition: cardinality models (vocabulary size, id-space
    * coverage) that merge across corpus slices like [[statsMerge]] /
    * [[histogramMerge]] do.
    *
    * Hashes use the engine-wide md5-56-bit convention, so the sketch —
    * and therefore the estimate — is deterministic and replayable
    * cross-engine in plain SQL (no RNG, no engine-private hash).
    *
    * Sketch rows: (keyCols..., rank 1..k, h) — the k smallest DISTINCT
    * hashes per key. Scale: per-key distinct is one exchange with
    * map-side combine; bottom-k is a window rank that the optimizer
    * caps via WindowGroupLimit before the final sort, so no key's full
    * hash set is ever materialized past its partials. The sketch is
    * k·|keys| rows regardless of data volume. */
  def kmvSketch(df: DataFrame, keyCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    val h = conv(substring(md5(col(valueCol)), 1, 14), 16, 10).cast("long")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("h"))
    df.select(keyCols.map(col) :+ h.as("h"): _*)
      .distinct()
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Distinct-count estimate from a [[kmvSketch]]: exact when the key
    * holds fewer than k hashes, else (k−1)/θ with θ = h_k/2^56 —
    * unbiased under uniform hashing. Output: keyCols..., sketch_n,
    * est_distinct. */
  def kmvEstimate(sketch: DataFrame, keyCols: Seq[String], k: Int): DataFrame = {
    val theta = col("_hk") / lit(72057594037927936.0) // 2^56
    sketch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("sketch_n"),
        max(when(col("rank") === k, col("h"))).as("_hk"))
      .withColumn("est_distinct",
        when(col("sketch_n") < k, col("sketch_n").cast("double"))
          .otherwise(lit(k - 1) / theta))
      .drop("_hk")
  }

  /** Merge [[kmvSketch]] models fitted on arbitrary (even overlapping)
    * slices: the k smallest hashes of a union are among each side's k
    * smallest, so union → distinct → re-rank reproduces the sketch of
    * the union EXACTLY — merge is lossless, associative, and
    * model-sized. */
  def kmvMerge(models: Seq[DataFrame], keyCols: Seq[String], k: Int): DataFrame = {
    require(models.nonEmpty, "no sketches to merge")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("h"))
    models.reduce(_ unionByName _)
      .select((keyCols :+ "h").map(col): _*)
      .distinct()
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Pairwise set-OVERLAP estimates between keys from their
    * [[kmvSketch]]es (the theta-sketch intersection device, Dasgupta et
    * al.): for every key pair (a < b), rebuild the UNION's bottom-k from
    * the two sketches (the kmvMerge identity — the union's k smallest
    * hashes are among each side's k smallest), estimate
    * |A∪B| = (k−1)/θ_union, and estimate Jaccard as the fraction of the
    * union sample present in BOTH sketches — an unbiased sample of the
    * union. est_inter = jaccard × union. "How much does source A's token
    * set overlap source B's" at sketch cost — no re-scan of the corpora,
    * mergeable across slices by construction.
    *
    * Scale: the sketch frame is k·|keys| rows (a model); the pair join
    * and re-rank are model-sized. Exact when a pair's union holds < k
    * hashes. Output per pair: key_a, key_b, union_n (union sample size),
    * est_union, est_jaccard, est_inter. */
  def kmvOverlap(sketch: DataFrame, keyCol: String, k: Int): DataFrame = {
    val a = sketch.select(col(keyCol).as("key_a"), col("h"))
    val b = sketch.select(col(keyCol).as("key_b"), col("h"))
    // union bottom-k per pair: outer-join the two hash sets, re-rank
    val pairs = a.select(col("key_a")).distinct()
      .join(b.select(col("key_b")).distinct(),
        col("key_a") < col("key_b"))
    val uni = pairs.join(a, "key_a")
      .unionByName(pairs.join(b.withColumnRenamed("h", "h2"), "key_b")
        .withColumnRenamed("h2", "h"))
      .select(col("key_a"), col("key_b"), col("h")).distinct()
    val w = Window.partitionBy(col("key_a"), col("key_b"))
      .orderBy(col("h"))
    val topk = uni.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
    val inA = a.withColumn("_ina", lit(1))
    val inB = b.withColumn("_inb", lit(1))
    val flagged = topk
      .join(inA, Seq("key_a", "h"), "left")
      .join(inB, Seq("key_b", "h"), "left")
    val theta = col("_hk") / lit(72057594037927936.0) // 2^56
    flagged.groupBy(col("key_a"), col("key_b"))
      .agg(count(lit(1)).as("union_n"),
        max(when(col("rank") === k, col("h"))).as("_hk"),
        sum(when(col("_ina").isNotNull && col("_inb").isNotNull, 1L)
          .otherwise(0L)).as("_both"))
      .withColumn("est_union",
        when(col("union_n") < k, col("union_n").cast("double"))
          .otherwise(lit(k - 1) / theta))
      .withColumn("est_jaccard",
        col("_both").cast("double") / col("union_n").cast("double"))
      .withColumn("est_inter", col("est_jaccard") * col("est_union"))
      .select("key_a", "key_b", "union_n", "est_union", "est_jaccard",
        "est_inter")
  }

  /** Count–min sketch (Cormode & Muthukrishnan, J.Alg '05) — mergeable
    * frequency model, the read-side complement of the Misra–Gries
    * heavy-hitter prefilter (TextOps.heavyHitterGrams): MG answers "which
    * items are frequent", CMS answers "how frequent is THIS item" without
    * storing per-item state. Engine addition: token/gram frequency models
    * that merge across corpus slices like [[statsMerge]] does.
    *
    * depth hash rows × width buckets of additive counters; the row hash is
    * the engine-wide md5-56-bit convention salted with the row index, so
    * the sketch is deterministic and SQL-replayable cross-engine.
    *
    * Scale: the explode multiplies input by depth BEFORE the exchange, but
    * map-side partial aggregation caps each task's output at depth×width
    * rows — the shuffle carries counter partials, never item-sized data.
    * The model is depth×width×|keys| rows regardless of volume. */
  def cmsSketch(df: DataFrame, keyCols: Seq[String], valueCol: String,
      depth: Int, width: Int): DataFrame =
    df.select(keyCols.map(col) :+ col(valueCol).as("_v"): _*)
      .withColumn("j", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("bucket", cmsBucket(col("j"), col("_v"), width))
      .groupBy((keyCols :+ "j" :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  private def cmsBucket(j: Column, v: Column, width: Int): Column =
    conv(substring(md5(concat_ws(":", lit("cms"), j.cast("string"), v)), 1, 14), 16, 10)
      .cast("long") % width

  /** Point-query a [[cmsSketch]]: est = min over rows of the probed
    * counter (0 when the bucket is empty) — an upper bound on the true
    * count, within εN (ε = e/width) with prob. 1−(1/e)^depth.
    * `probes` must carry keyCols + valueCol; output: keyCols...,
    * valueCol, est_cnt. Sketch side is model-sized → broadcast join. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, keyCols: Seq[String],
      valueCol: String, depth: Int, width: Int): DataFrame = {
    val pe = probes.select(keyCols.map(col) :+ col(valueCol): _*)
      .withColumn("j", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("bucket", cmsBucket(col("j"), col(valueCol), width))
    pe.join(broadcast(sketch), (keyCols :+ "j" :+ "bucket").map(c => pe(c) <=> sketch(c)).reduce(_ && _), "left")
      .groupBy((keyCols :+ valueCol).map(pe(_)): _*)
      .agg(min(coalesce(sketch("cnt"), lit(0L))).as("est_cnt"))
  }

  /** Merge [[cmsSketch]] models fitted on disjoint slices: counters are
    * linear, so summing per (key, j, bucket) reproduces the sketch of the
    * union EXACTLY — merge is lossless, associative, and model-sized. */
  def cmsMerge(models: Seq[DataFrame], keyCols: Seq[String]): DataFrame = {
    require(models.nonEmpty, "no sketches to merge")
    models.reduce(_ unionByName _)
      .groupBy((keyCols :+ "j" :+ "bucket").map(col): _*)
      .agg(sum("cnt").as("cnt"))
  }

  /** Join-cardinality estimate from two [[cmsSketch]] models over the
    * same join column (Cormode & Muthukrishnan §4.2: the CMS inner
    * product): est |A ⋈ B| = min over hash rows j of Σ_b a_j[b]·b_j[b].
    * Every true join pair lands in the same bucket on every row, so each
    * row's dot product ≥ the true cardinality — the min is an upper
    * bound, within ε·N_a·N_b w.h.p. A planning primitive at 100 TB:
    * decide broadcast vs shuffle vs salt from two model-sized sketches
    * without running the join. Rows j with zero overlapping buckets
    * force the estimate to 0 (the inner join drops them, so a full
    * depth-count guard reinstates the zero).
    * Output: keyCols..., est_pairs. */
  def cmsJoinCard(cmsA: DataFrame, cmsB: DataFrame, keyCols: Seq[String],
      depth: Int): DataFrame = {
    val a = cmsA.select((keyCols :+ "j" :+ "bucket").map(col) :+ col("cnt").as("cnta"): _*)
    val b = cmsB.select((keyCols :+ "j" :+ "bucket").map(col) :+ col("cnt").as("cntb"): _*)
    a.join(b, keyCols :+ "j" :+ "bucket")
      .groupBy((keyCols :+ "j").map(col): _*)
      .agg(sum(col("cnta") * col("cntb")).as("dot"))
      .groupBy(keyCols.map(col): _*)
      .agg(min("dot").as("_mindot"), count(lit(1)).as("_nj"))
      .withColumn("est_pairs",
        when(col("_nj") < depth, lit(0L)).otherwise(col("_mindot")))
      .drop("_mindot", "_nj")
  }

  /** Mergeable quantile sketch — a bottom-k uniform row sample keyed by
    * the engine-wide md5-56-bit row hash. The k rows with the smallest
    * h = md5_56(id) per key are a uniform-without-replacement sample of
    * the key's rows (same hash-as-priority device as the A-ES weighted
    * sampler, TextOps), so order statistics over the sample estimate the
    * key's quantiles with standard sampling error O(1/√k); and because
    * the bottom-k of a union is contained in the union of per-slice
    * bottom-k's, the sketch merges LOSSLESSLY across corpus slices —
    * the sketch-merge family's missing member next to [[statsMerge]],
    * [[histogramMerge]], [[kmvMerge]], [[cmsMerge]]. Unlike
    * percentile_approx's KLL (engine-private, not replayable), this
    * sketch is deterministic and the whole pipeline — sample AND
    * estimate — replays in plain SQL cross-engine.
    *
    * `idCol` must identify rows uniquely within a key (ties on h are
    * broken by value for cross-engine determinism). Scale: one exchange;
    * the per-key bottom-k is a window rank the optimizer caps via
    * WindowGroupLimit before the final sort, so partials never exceed
    * k rows per key per task. Keep k below
    * spark.sql.optimizer.windowGroupLimitThreshold (default 1000) or the
    * pushdown silently disappears and every row reaches the exchange. The sketch is k·|keys| rows regardless of
    * data volume.
    * Sketch rows: (keyCols..., h, value, rank 1..k). */
  def quantileSketch(df: DataFrame, keyCols: Seq[String], idCol: String,
      valueCol: String, k: Int): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 14), 16, 10)
      .cast("long")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("h"), col("value"))
    df.where(col(valueCol).isNotNull) // a null value can't rank or quantile
      .select(keyCols.map(col) :+ h.as("h") :+ col(valueCol).cast("double").as("value"): _*)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Interpolated quantile estimates from a [[quantileSketch]]: for each
    * requested probability p, the quantile_cont/Percentile formula
    * lo + (hi−lo)·frac over the sample's sorted values — bit-compatible
    * with DuckDB's quantile_cont on the same sample. Output:
    * keyCols..., sketch_n, p{25}, p{50}, ... (one column per prob). */
  def quantileSketchEstimate(sketch: DataFrame, keyCols: Seq[String],
      probs: Seq[Double]): DataFrame = {
    def interp(arr: Column, cnt: Column, frac: Double): Column = {
      val idx = (cnt - 1).cast("double") * frac
      val lo = floor(idx).cast("int")
      val vlo = element_at(arr, lo + 1)
      val vhi = element_at(arr, ceil(idx).cast("int") + 1)
      vlo + (vhi - vlo) * (idx - lo.cast("double"))
    }
    val base = sketch.groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(col("value"))).as("_vs"))
      .withColumn("sketch_n", size(col("_vs")).cast("long"))
    probs.foldLeft(base) { (d, p) =>
      d.withColumn(s"p${math.round(p * 100)}",
        interp(col("_vs"), col("sketch_n"), p))
    }.drop("_vs")
  }

  /** Merge [[quantileSketch]] models fitted on arbitrary (even
    * overlapping) slices: union → distinct (identical (h, value) rows
    * from overlapping slices collapse) → re-rank → keep k reproduces the
    * sketch of the union EXACTLY — lossless, associative, model-sized. */
  def quantileSketchMerge(models: Seq[DataFrame], keyCols: Seq[String],
      k: Int): DataFrame = {
    require(models.nonEmpty, "no sketches to merge")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("h"), col("value"))
    models.reduce(_ unionByName _)
      .select((keyCols :+ "h" :+ "value").map(col): _*)
      .distinct()
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Median + MAD (median absolute deviation) per (key, attribute).
    * Replaces chombo NumericalAttrMedian (resource/ecomm.sh:19,29; consumed by
    * RobustZscorePredictor.java:100-102). Exact interpolated percentile
    * (matches DuckDB percentile_cont). Two passes: median, then MAD.
    * Output: keyCols..., attr, med, mad
    */
  def robustStats(df: DataFrame, keyCols: Seq[String], attrCols: Seq[String]): DataFrame = {
    val melted = melt(df, keyCols, attrCols)
    val gcols = (keyCols :+ "attr").map(col)
    // ONE scan + ONE shuffle: collect the sorted values per (key, attr)
    // (what a percentile aggregate materializes internally anyway) and
    // derive median AND MAD from the array — the previous two-aggregation
    // + rejoin form scanned and shuffled the melted data twice.
    // Interpolation formula lo + (hi-lo)·frac matches Spark's Percentile
    // and DuckDB's quantile_cont bit-for-bit.
    def interp(arr: Column, cnt: Column, frac: Double): Column = {
      val idx = (cnt - 1).cast("double") * frac
      val lo = floor(idx).cast("int")
      val vlo = element_at(arr, lo + 1)
      val vhi = element_at(arr, ceil(idx).cast("int") + 1)
      vlo + (vhi - vlo) * (idx - lo.cast("double"))
    }
    melted.groupBy(gcols: _*)
      .agg(sort_array(collect_list(col("value"))).as("vs"))
      .withColumn("med", interp(col("vs"), size(col("vs")), 0.5))
      .withColumn("mad", interp(
        array_sort(transform(col("vs"), x => abs(x - col("med")))),
        size(col("vs")), 0.5))
      .drop("vs")
  }

  /** Sketch-based median+MAD — the 100 TB path for extreme per-key
    * cardinality, where the exact percentile's per-group sort would spill.
    * `percentile_approx` merges bounded KLL-style sketches instead
    * (map-side combine, O(1/accuracy) state per group). `accuracy` is
    * Spark's contract: rank error ≤ 1/accuracy (10000 → 0.01%). Same
    * schema as [[robustStats]], drop-in for the robust z-score scorer. */
  def robustStatsApprox(df: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], accuracy: Int = 10000): DataFrame = {
    val melted = melt(df, keyCols, attrCols)
    val gcols = (keyCols :+ "attr").map(col)
    val med = melted.groupBy(gcols: _*)
      .agg(percentile_approx(col("value"), lit(0.5), lit(accuracy)).as("med"))
    melted.join(med, keyCols :+ "attr")
      .groupBy(gcols: _*)
      .agg(
        first("med").as("med"),
        percentile_approx(abs(col("value") - col("med")), lit(0.5), lit(accuracy)).as("mad"))
  }

  /** Q1/Q3/IQR per (key, attribute) — model for the
    * interPercentileDifference scorer (InterPercentileDifferenceBasedPredictor.java:85-122).
    * Output: keyCols..., attr, q1, q3, iqr
    */
  def quantiles(df: DataFrame, keyCols: Seq[String], attrCols: Seq[String]): DataFrame =
    melt(df, keyCols, attrCols)
      .groupBy((keyCols :+ "attr").map(col): _*)
      .agg(
        percentile(col("value"), lit(0.25)).as("q1"),
        percentile(col("value"), lit(0.75)).as("q3"))
      .withColumn("iqr", col("q3") - col("q1"))

  /** Multivariate histogram: bucket = floor(value/bucketWidth) per numeric
    * attr (categorical attrs pass through as-is), count per (key, bucket
    * vector), normalized by per-key total.
    * Semantics: spark/.../dist/MultiVariateDistribution.scala:147-212.
    * Output: keyCols..., bucket (string "b1:b2:..."), cnt, freq
    */
  def histogram(
      df: DataFrame,
      keyCols: Seq[String],
      numericAttrs: Seq[(String, Double)],
      categoricalAttrs: Seq[String] = Nil): DataFrame = {
    val bucketParts: Seq[Column] =
      numericAttrs.map { case (c, w) => floor(col(c) / w).cast("long").cast("string") } ++
        categoricalAttrs.map(col)
    val bucket = concat_ws(":", bucketParts: _*).as("bucket")
    val counts = df.select(keyCols.map(col) :+ bucket: _*)
      .groupBy((keyCols :+ "bucket").map(col): _*)
      .count().withColumnRenamed("count", "cnt")
    val w = Window.partitionBy(keyCols.map(col): _*)
    counts.withColumn("freq", col("cnt") / sum("cnt").over(w))
  }

  /** Id-list histogram variant (src/.../dist/MultiVariateDistribution.java:165-185
    * MR reducer's id-concatenation mode): per bucket, the member ids. */
  def histogramWithIds(
      df: DataFrame,
      keyCols: Seq[String],
      numericAttrs: Seq[(String, Double)],
      idCol: String): DataFrame = {
    val bucketParts: Seq[Column] =
      numericAttrs.map { case (c, w) => floor(col(c) / w).cast("long").cast("string") }
    val bucket = concat_ws(":", bucketParts: _*).as("bucket")
    df.select(keyCols.map(col) :+ bucket :+ col(idCol): _*)
      .groupBy((keyCols :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("cnt"), sort_array(collect_list(col(idCol))).as("ids"))
  }

  /** Per-attribute histogram (one histogram per (key, attr), scalar buckets)
    * — model for estimatedAttributeProbability
    * (EsimatedAttrtibuteProbabilityBasedPredictor.java:175-212).
    * Also emits the cumulative distribution (cumFreq, frequency mass at
    * buckets <= this bucket) for the CDF scorer
    * (EstimatedCumProbabilityBasedPredictor.java:72-97).
    * Output: keyCols..., attr, bucket, cnt, freq, cumFreq
    */
  def attrHistogram(
      df: DataFrame,
      keyCols: Seq[String],
      attrs: Seq[(String, Double)]): DataFrame = {
    val melted = meltWithWidth(df, keyCols, attrs)
    val counts = melted
      .withColumn("bucket", floor(col("value") / col("width")).cast("long"))
      .groupBy((keyCols ++ Seq("attr", "bucket")).map(col): _*)
      .count().withColumnRenamed("count", "cnt")
    val wKey = Window.partitionBy((keyCols :+ "attr").map(col): _*)
    val wCum = wKey.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("freq", col("cnt") / sum("cnt").over(wKey))
      .withColumn("cumFreq", sum("cnt").over(wCum) / sum("cnt").over(wKey))
  }

  /** Histogram-of-histogram ("meta" distribution): distribution over the
    * frequency values themselves — model for estimatedMetaProbability
    * (EstimatedMetaProbabilityBasedPredictor.java:77-115). Buckets the
    * per-bucket frequencies of `attrHistogram` with width `metaWidth` and
    * returns the probability mass of each frequency bucket.
    * Output: keyCols..., attr, fbucket, metaFreq
    */
  def metaHistogram(attrHist: DataFrame, keyCols: Seq[String], metaWidth: Double): DataFrame = {
    val wKey = Window.partitionBy((keyCols :+ "attr").map(col): _*)
    attrHist
      .withColumn("fbucket", floor(col("freq") / metaWidth).cast("long"))
      .groupBy((keyCols ++ Seq("attr", "fbucket")).map(col): _*)
      .agg(sum("cnt").as("fcnt"))
      .withColumn("metaFreq", col("fcnt") / sum("fcnt").over(wKey))
      .drop("fcnt")
  }

  /** Markov state-transition matrix per key: P(toState | fromState).
    * Replaces avenir MarkovStateTransitionModel; consumed shape matches
    * MarkovModelPredictor.java:500-543 (row-stochastic matrix).
    * Laplace-smoothed with `smoothing` pseudo-count so -log(p) is finite.
    * Output: keyCols..., fromState, toState, prob
    *
    * Scale note: one shuffle for the lag (window by key) + one hash agg;
    * the model is |keys|×|states|² rows — broadcastable.
    */
  def markovTransitions(
      df: DataFrame,
      seqKeyCols: Seq[String],
      seqCol: String,
      stateCol: String,
      smoothing: Double = 0.0,
      modelKeyCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(seqKeyCols.map(col): _*).orderBy(seqCol)
    val pairs = df
      .withColumn("fromState", lag(col(stateCol), 1).over(w))
      .withColumnRenamed(stateCol, "toState")
      .where(col("fromState").isNotNull)
    // the alphabet is tiny but derives from a corpus-wide distinct, and
    // the plan below reads it three times (count action + both sides of
    // the dense grid) — persist so the corpus is scanned once for it
    val states = df.select(col(stateCol).as("s")).distinct()
      .localCheckpoint(true)
    val nStates = states.count() // tiny cardinality; model fit is offline
    val counts = pairs.groupBy((modelKeyCols ++ Seq("fromState", "toState")).map(col): _*)
      .count().withColumnRenamed("count", "cnt")
    // dense (key, from, to) grid so unseen transitions get the smoothing mass
    val fromTo = states.select(col("s").as("fromState"))
      .crossJoin(broadcast(states.select(col("s").as("toState"))))
    val grid =
      if (modelKeyCols.isEmpty) fromTo
      else df.select(modelKeyCols.map(col): _*).distinct().crossJoin(broadcast(fromTo))
    val wFrom = Window.partitionBy((modelKeyCols :+ "fromState").map(col): _*)
    grid.join(counts, modelKeyCols ++ Seq("fromState", "toState"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("prob",
        (col("cnt") + smoothing) /
          (sum("cnt").over(wFrom) + lit(smoothing * nStates)))
      .drop("cnt")
  }

  /** Sparse Markov transition-count model — the mergeable face of
    * [[markovTransitions]]. Counts are linear in the data, so models
    * fitted on disjoint corpus slices (or daily ingest batches) merge by
    * summation ([[markovMerge]]) — the sequence family's member of the
    * incremental-model set next to [[statsMerge]]/[[histogramMerge]]/
    * [[kmvMerge]]/[[cmsMerge]]/[[quantileSketchMerge]]. The reference
    * refits its Markov model from scratch on every run
    * (avenir MarkovStateTransitionModel); at 100 TB a refit re-reads the
    * full history while the merge touches only the new slice plus a
    * |states|²-row model. One lag window + one hash agg per slice.
    * Output: keyCols..., fromState, toState, cnt (observed pairs only). */
  def markovCounts(
      df: DataFrame,
      seqKeyCols: Seq[String],
      seqCol: String,
      stateCol: String,
      modelKeyCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(seqKeyCols.map(col): _*).orderBy(seqCol)
    df.withColumn("fromState", lag(col(stateCol), 1).over(w))
      .withColumnRenamed(stateCol, "toState")
      .where(col("fromState").isNotNull)
      .groupBy((modelKeyCols ++ Seq("fromState", "toState")).map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Sum [[markovCounts]] models. Associative and lossless: the merged
    * model is exactly the count model of the concatenated slices (as long
    * as whole sequences live inside one slice — a lag pair never spans
    * slices). Model-sized work only. */
  def markovMerge(models: Seq[DataFrame], keyCols: Seq[String] = Nil): DataFrame = {
    require(models.nonEmpty, "no Markov models to merge")
    models.reduce(_ unionByName _)
      .groupBy((keyCols ++ Seq("fromState", "toState")).map(col): _*)
      .agg(sum("cnt").as("cnt"))
  }

  /** Row-stochastic matrix from a (possibly merged) [[markovCounts]]
    * model: densify over the observed state alphabet (every state seen as
    * a from- or to-state anywhere in the model) and Laplace-normalize —
    * the same formula as [[markovTransitions]], so a merge-then-normalize
    * equals a from-scratch refit wherever every state occurs in some
    * transition. Output: keyCols..., fromState, toState, prob. */
  def markovProbs(counts0: DataFrame, smoothing: Double,
      keyCols: Seq[String] = Nil): DataFrame = {
    // the counts model is model-sized (≤|states|²·|keys| rows) but its
    // LINEAGE is corpus-sized (per-slice window fits + merge), and it is
    // read three times below (both state-alphabet columns, the grid
    // join) — persist so the corpus pipeline runs once; the nStates
    // action doubles as the materialization point
    val counts = counts0.localCheckpoint(true)
    val states = counts.select(col("fromState").as("s"))
      .union(counts.select(col("toState").as("s"))).distinct()
    val nStates = states.count() // model-sized: |states| is tiny
    val fromTo = states.select(col("s").as("fromState"))
      .crossJoin(broadcast(states.select(col("s").as("toState"))))
    val grid =
      if (keyCols.isEmpty) fromTo
      else counts.select(keyCols.map(col): _*).distinct().crossJoin(broadcast(fromTo))
    val wFrom = Window.partitionBy((keyCols :+ "fromState").map(col): _*)
    grid.join(counts, keyCols ++ Seq("fromState", "toState"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("prob",
        (col("cnt") + smoothing) /
          (sum("cnt").over(wFrom) + lit(smoothing * nStates)))
      .drop("cnt")
  }

  /** Equal-probability quantile boundaries per (key, attr): `n` buckets,
    * boundaries at i/n percentiles — the quantization model for
    * NgramFrequencyPredictor.scala:79,110.
    * Output: keyCols..., attr, qidx (1..n-1), boundary
    */
  def equalProbBoundaries(
      df: DataFrame, keyCols: Seq[String], attrCols: Seq[String], n: Int): DataFrame = {
    val melted = melt(df, keyCols, attrCols)
    val fracs = (1 until n).map(i => i.toDouble / n)
    melted.groupBy((keyCols :+ "attr").map(col): _*)
      .agg(percentile(col("value"), typedLit(fracs)).as("bs"))
      .select((keyCols :+ "attr").map(col) :+ posexplode(col("bs")): _*)
      .withColumnRenamed("pos", "qidx")
      .withColumn("qidx", col("qidx") + 1)
      .withColumnRenamed("col", "boundary")
  }

  /** Wide → long melt: one row per (row, attr). */
  private[graft] def melt(df: DataFrame, keyCols: Seq[String], attrCols: Seq[String]): DataFrame = {
    val kvs = attrCols.flatMap(c => Seq(lit(c), col(c).cast("double")))
    df.select(keyCols.map(col) :+ explode(map(kvs: _*)).as(Seq("attr", "value")): _*)
  }

  private def meltWithWidth(
      df: DataFrame, keyCols: Seq[String], attrs: Seq[(String, Double)]): DataFrame = {
    val widths = map(attrs.flatMap { case (c, w) => Seq(lit(c), lit(w)) }: _*)
    melt(df, keyCols, attrs.map(_._1))
      .withColumn("width", element_at(widths, col("attr")))
  }

  /** HyperLogLog registers (Flajolet et al., AofA '07) — the
    * constant-memory cardinality complement of [[kmvSketch]]: KMV keeps k
    * hash values (exact below k, size grows with k), HLL keeps at most
    * 2^p integer registers at ANY cardinality and merges by register max —
    * the shape that survives 100 TB × thousands of slices. The 56-bit
    * md5-derived hash splits into a p-bit bucket and a (56−p)-bit tail;
    * the register is the tail's leading-zero count + 1, computed with
    * integer/string ops only (`bin` length), so registers are exactly
    * replayable cross-engine. Sparse: empty buckets are simply absent.
    * Output: keyCols..., bucket, reg. */
  def hllSketch(df: DataFrame, keyCols: Seq[String], valueCol: String,
      p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p outside [4,16]")
    val m = 1L << p
    val h = conv(substring(md5(col(valueCol)), 1, 14), 16, 10).cast("long")
    df.select(keyCols.map(col) :+ h.as("_h"): _*)
      .withColumn("bucket", (col("_h") % m).cast("int"))
      .withColumn("_w", shiftrightunsigned(col("_h"), p))
      .withColumn("_rho",
        when(col("_w") === 0, lit(57 - p))
          .otherwise(lit(57 - p) - length(bin(col("_w")))))
      .groupBy(keyCols.map(col) :+ col("bucket"): _*)
      .agg(max("_rho").cast("int").as("reg"))
  }

  /** Cardinality estimate from a (sparse) [[hllSketch]]: raw estimate
    * α_m·m²/(Σ2^(−reg) + zeros), linear counting m·ln(m/zeros) in the
    * small range — the textbook corrections, computed from integer
    * registers so both engines agree to the 4dp round.
    * Output: keyCols..., n_buckets, est_distinct. */
  def hllEstimate(sketch: DataFrame, keyCols: Seq[String], p: Int): DataFrame = {
    val m = (1L << p).toDouble
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    sketch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_buckets"),
        sum(pow(lit(2.0), -col("reg"))).as("_s"))
      .withColumn("_zeros", lit(m) - col("n_buckets"))
      .withColumn("_raw", lit(alpha * m * m) / (col("_s") + col("_zeros")))
      .withColumn("est_distinct",
        when(col("_raw") <= lit(2.5 * m) && col("_zeros") > 0,
          lit(m) * log(lit(m) / col("_zeros")))
          .otherwise(col("_raw")))
      .drop("_s", "_zeros", "_raw")
  }

  /** Merge [[hllSketch]] models fitted on arbitrary (even overlapping)
    * slices: registers are maxima, and max is associative/idempotent, so
    * union → groupBy max reproduces the sketch of the union EXACTLY —
    * lossless like [[kmvMerge]], at fixed size. */
  def hllMerge(models: Seq[DataFrame], keyCols: Seq[String]): DataFrame = {
    require(models.nonEmpty, "no sketches to merge")
    models.reduce(_ unionByName _)
      .groupBy(keyCols.map(col) :+ col("bucket"): _*)
      .agg(max("reg").cast("int").as("reg"))
  }

  /** Method-of-moments overdispersion fits per key over per-window
    * counts (engine additions, the parametric face of the p/c charts):
    * beta-binomial (α, β from the mean/variance of window PROPORTIONS
    * with window size n̄) and negative-binomial (r, p from window
    * COUNT mean/variance; var ≤ mean degrades to Poisson, flagged).
    * Window moments come from exact fixed-point sums. One row per key:
    * key, n_windows, mean_rate, alpha, beta, nb_r, nb_p,
    * overdispersed. */
  def overdispersionMoM(data: org.apache.spark.sql.DataFrame,
      keyCol: String, winCol: org.apache.spark.sql.Column,
      defect: org.apache.spark.sql.Column)
      : org.apache.spark.sql.DataFrame = {
    val w = data.select(col(keyCol).as("key"), winCol.as("_w"),
      when(defect, 1L).otherwise(0L).as("_d"))
      .groupBy(col("key"), col("_w"))
      .agg(count(lit(1)).as("_n"), sum(col("_d")).as("_k"))
    val agg = w.groupBy(col("key"))
      .agg(count(lit(1)).as("n_windows"),
        sum(col("_n")).as("_tn"), sum(col("_k")).as("_tk"),
        sum((col("_k") * col("_k")).cast("decimal(38,0)")).as("_tk2"))
      .where(col("n_windows") >= 3)
    val m = col("n_windows").cast("double")
    val nbar = col("_tn").cast("double") / m
    val mu = col("_tk").cast("double") / m           // mean window count
    val v = (col("_tk2").cast("double") -
      col("_tk").cast("double") * col("_tk").cast("double") / m) / (m - 1)
    val p = mu / nbar                                 // mean rate
    // beta-binomial: rho = (v/mu − (1−p)) / (nbar − 1) / (1−p) hmm —
    // standard MoM: v = n p(1−p)(1 + (n−1)ρ); solve ρ then
    // α = p(1/ρ − 1), β = (1−p)(1/ρ − 1)
    val rho = (v / (nbar * p * (lit(1.0) - p)) - 1.0) / (nbar - 1)
    val alpha = p * (lit(1.0) / rho - 1.0)
    val beta = (lit(1.0) - p) * (lit(1.0) / rho - 1.0)
    // negative binomial on window counts: p_nb = mu/v, r = mu²/(v−mu)
    val od = v > mu
    agg.select(col("key"), col("n_windows"), p.as("mean_rate"),
      when(rho > 0, alpha).otherwise(lit(0.0)).as("alpha"),
      when(rho > 0, beta).otherwise(lit(0.0)).as("beta"),
      when(od, mu * mu / (v - mu)).otherwise(lit(0.0)).as("nb_r"),
      when(od, mu / v).otherwise(lit(1.0)).as("nb_p"),
      od.as("overdispersed"))
  }
  /** Trimmed + winsorized location (Tukey; the robust-location battery
    * beside mean/median-MAD): drop (trimmed) or clamp (winsorized) the
    * lowest/highest ⌊α·n⌋ observations. Exact over the per-key 2dp
    * VALUE HISTOGRAM (the quantile/PAV device): rank spans come from
    * one cumulative window; each bin contributes
    * min(cum, hi) − max(cum − c, lo) kept rows — all integer; the two
    * means are exact integer-ratio doubles.
    *
    * Scale: one hash aggregate to the histogram + one sort window over
    * it (value-cardinality-sized, never data-sized). Output per key:
    * n, n_trim (per side), trimmed_mean, winsor_mean. */
  def trimmedStats(data: DataFrame, keyCols: Seq[String], valCol: String,
      alpha: Double = 0.1): DataFrame = {
    require(alpha >= 0 && alpha < 0.5, "0 <= alpha < 0.5")
    val keys = keyCols.map(col)
    val hist = data.where(col(valCol).isNotNull)
      .groupBy(keys :+
        graft.core.fixedPointLong(col(valCol), 2).as("_v"): _*)
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("_v"))
    val wk = Window.partitionBy(keyCols.map(col): _*)
    val cum = hist
      .withColumn("_cum", sum(col("_c")).over(w))
      .withColumn("_n", sum(col("_c")).over(wk))
      .withColumn("_t", floor(lit(alpha) * col("_n").cast("double"))
        .cast("long"))
      .withColumn("_lo", col("_t") + 1)
      .withColumn("_hi", col("_n") - col("_t"))
      // rows of this bin kept by the trim: ranks [cum-c+1, cum] ∩ [lo, hi]
      .withColumn("_keep", greatest(lit(0L),
        least(col("_cum"), col("_hi")) -
          greatest(col("_cum") - col("_c"), col("_lo") - 1)))
      // winsorized: tails are clamped to the boundary-rank values
      .withColumn("_isLo",
        col("_cum") - col("_c") < col("_lo") && col("_cum") >= col("_lo"))
      .withColumn("_isHi",
        col("_cum") - col("_c") < col("_hi") && col("_cum") >= col("_hi"))
    cum.groupBy(keys: _*)
      .agg(max(col("_n")).as("n"), max(col("_t")).as("n_trim"),
        sum(col("_keep") * col("_v")).as("_st"),
        max(when(col("_isLo"), col("_v"))).as("_vlo"),
        max(when(col("_isHi"), col("_v"))).as("_vhi"))
      .withColumn("trimmed_mean", col("_st").cast("double") /
        (col("n") - lit(2L) * col("n_trim")).cast("double") / 100.0)
      .withColumn("winsor_mean",
        (col("_st") + col("n_trim") * col("_vlo") +
          col("n_trim") * col("_vhi")).cast("double") /
          col("n").cast("double") / 100.0)
      .select(keys ++ Seq(col("n"), col("n_trim"), col("trimmed_mean"),
        col("winsor_mean")): _*)
  }

  /** Hodges-Lehmann location estimator (Annals 1963): the median of
    * all Walsh averages (xᵢ+xⱼ)/2, i ≤ j — the point estimate dual of
    * the Wilcoxon signed-rank test: 29% efficiency loss bound vs the
    * mean at ANY contamination, vs the median's 36% at none. Computed
    * EXACTLY over the `grain`-quantized value histogram: pair masses
    * are c₁·c₂ (c(c+1)/2 on the diagonal), the median walks the
    * Walsh-value histogram's cumulative counts to rank ⌈M/2⌉.
    *
    * Scale: the pair stage is value-cardinality² per key (the
    * documented histogram² contract — use grain=1 for wide-cardinality
    * keys); everything else is one sort window over the Walsh
    * histogram. Output per key: n_pairs (= n(n+1)/2), hl. */
  def hodgesLehmann(data: DataFrame, keyCols: Seq[String],
      valCol: String, grain: Int = 2): DataFrame = {
    require(grain >= 0 && grain <= 4, "0 <= grain <= 4")
    val keys = keyCols.map(col)
    val scale = math.pow(10.0, grain)
    val hist = data.where(col(valCol).isNotNull)
      .groupBy(keys :+
        graft.core.fixedPointLong(col(valCol), grain).as("_v"): _*)
      .agg(count(lit(1)).as("_c"))
    val a = hist.select(keys :+ col("_v").as("_va") :+
      col("_c").as("_ca"): _*)
    val b = hist.select(keyCols.map(k => col(k).as(s"_k_$k")) :+
      col("_v").as("_vb") :+ col("_c").as("_cb"): _*)
    val pairs = a.join(b,
        (keyCols.map(k => col(k) === col(s"_k_$k")) :+
          (col("_va") <= col("_vb"))).reduce(_ && _))
      .withColumn("_w2", col("_va") + col("_vb")) // Walsh avg x 2 x scale
      .withColumn("_m",
        when(col("_va") === col("_vb"),
          expr("_ca * (_ca + 1) div 2"))
          .otherwise(col("_ca") * col("_cb")))
      .groupBy(keys :+ col("_w2"): _*)
      .agg(sum(col("_m")).as("_mm"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("_w2"))
    val wk = Window.partitionBy(keyCols.map(col): _*)
    pairs
      .withColumn("_cum", sum(col("_mm")).over(w))
      .withColumn("_tot", sum(col("_mm")).over(wk))
      .withColumn("_rk", expr("(_tot + 1) div 2")) // lower median rank (integer floor, matches oracle)
      .where(col("_cum") >= col("_rk") &&
        col("_cum") - col("_mm") < col("_rk"))
      .select(keys ++ Seq(col("_tot").as("n_pairs"),
        (col("_w2").cast("double") / 2.0 / scale).as("hl")): _*)
  }
}
