package graft.post

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-processing operators over tagged scorer output (SURVEY.md §2.3):
  * counters, hierarchy roll-up, threshold learning. All single hash
  * aggregations / broadcast joins — shuffle only on the (small) group keys. */
object PostOps {

  /** Per-key counts + percentages of O/N/I tags and total
    * (common/OutlierCounter.scala:33-125). */
  def outlierCounter(tagged: DataFrame, keyCols: Seq[String]): DataFrame = {
    val n = count(lit(1))
    tagged.groupBy(keyCols.map(col): _*)
      .agg(
        sum(when(col("tag") === "O", 1).otherwise(0)).as("nO"),
        sum(when(col("tag") === "N", 1).otherwise(0)).as("nN"),
        sum(when(col("tag") === "I", 1).otherwise(0)).as("nI"),
        n.as("total"))
      .withColumn("pctO", col("nO") / col("total").cast("double") * 100.0)
  }

  /** Hierarchy roll-up (common/OutlierAggregator.scala:37-143): map each
    * tagged child record to its parent stream via the hierarchy table
    * (childType, childId — '*' wildcard —, parentType, parentId;
    * DataStreamSchema.findParent, src/.../util/DataStreamSchema.java:123),
    * group by (parent, seq bucket); if any child is O aggregate over the
    * outliers only and tag O, else over all and tag N (:83-93). `strategy`
    * ∈ {average, max} (:131-141). */
  def hierarchyRollup(
      tagged: DataFrame,
      hierarchy: DataFrame,
      typeCol: String,
      idCol: String,
      seqBucket: Column,
      valCol: String,
      strategy: String = "average"): DataFrame = {
    val joined = tagged.withColumn("_seqb", seqBucket)
      .join(broadcast(hierarchy),
        col(typeCol) === col("childType") &&
          (col("childId") === col(idCol).cast("string") || col("childId") === "*"))
    val isO = col("tag") === "O"
    def aggOf(c: Column) = strategy match {
      case "average" => avg(c)
      case "max" => max(c)
      case o => throw new IllegalArgumentException(s"unknown strategy $o")
    }
    joined.groupBy(col("parentType"), col("parentId"), col("_seqb").as("seqb"))
      .agg(
        max(isO.cast("int")).as("anyO"),
        aggOf(when(isO, col(valCol))).as("aggO"),
        aggOf(col(valCol)).as("aggAll"),
        count(lit(1)).as("n"))
      .withColumn("value", when(col("anyO") === 1, col("aggO")).otherwise(col("aggAll")))
      .withColumn("tag", when(col("anyO") === 1, "O").otherwise(lit("N")))
      .drop("anyO", "aggO", "aggAll")
  }

  /** Pseudo-relevance threshold finder
    * (common/PseudoRelevanceThresholdFinder.scala:34-106): per key, sort
    * scores descending; threshold = mean of the 3 scores around the
    * top-`topFrac` index; keys with fewer than `minCount` scores fall back
    * to `defaultThreshold` (:64-97). Output: keyCols..., n, threshold. */
  def pseudoRelevanceThreshold(
      scored: DataFrame,
      keyCols: Seq[String],
      topFrac: Double,
      minCount: Long,
      defaultThreshold: Double): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("score").desc, monotonically_increasing_id())
    val ranked = scored
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(keyCols.map(col): _*)))
      .withColumn("idx", greatest(lit(2L), floor(col("n") * topFrac)))
    // one pass, not a found/fallback union of two filters over the same
    // ranked frame (which executed the upstream scoring pipeline twice):
    // small keys keep every row and take the default, qualifying keys
    // keep only the idx±1 neighborhood whose mean is the threshold
    ranked
      .where(col("n") < minCount ||
        (col("rn") >= col("idx") - 1 && col("rn") <= col("idx") + 1))
      .groupBy(keyCols.map(col): _*)
      .agg(first("n").as("n"),
        when(first("n") >= minCount, avg("score"))
          .otherwise(lit(defaultThreshold)).as("threshold"))
  }

  /** Decision-stump threshold learner (common/ThresholdLearner.scala:33-159):
    * for each candidate split of the score range, two-way partition of the
    * labeled scores; emit the weighted entropy of the split per (key, split)
    * (label ∈ {T,F}; split fan-out :73-95, info :106-126, combine :129-149).
    * Lower = better split. Output: keyCols..., split, wEntropy. */
  def thresholdLearner(
      labeled: DataFrame,
      keyCols: Seq[String],
      scoreCol: String,
      labelCol: String,
      splits: Seq[Double]): DataFrame = {
    val exploded = labeled.withColumn("split", explode(lit(splits.toArray)))
      .withColumn("side", (col(scoreCol) >= col("split")).cast("int"))
    def cnt(cond: Column) = sum(cond.cast("int")).cast("double")
    val grouped = exploded
      .groupBy((keyCols :+ "split").map(col): _*)
      .agg(
        cnt(col("side") === 1 && col(labelCol) === "T").as("hiT"),
        cnt(col("side") === 1 && col(labelCol) === "F").as("hiF"),
        cnt(col("side") === 0 && col(labelCol) === "T").as("loT"),
        cnt(col("side") === 0 && col(labelCol) === "F").as("loF"))
    def ent(a: Column, b: Column): Column = {
      val n = a + b
      def term(p: Column) = when(p > 0, -p * log(p)).otherwise(lit(0.0))
      when(n > 0, term(a / n) + term(b / n)).otherwise(lit(0.0))
    }
    val nTot = col("hiT") + col("hiF") + col("loT") + col("loF")
    grouped.withColumn("wEntropy",
      (col("hiT") + col("hiF")) / nTot * ent(col("hiT"), col("hiF")) +
        (col("loT") + col("loF")) / nTot * ent(col("loT"), col("loF")))
      .drop("hiT", "hiF", "loT", "loF")
  }

  /** Distribution sorter (src/.../dist/DistributionSorter.java:49-184):
    * histogram buckets ranked by descending count per key (ties broken by
    * bucket for determinism). */
  def distributionSorter(hist: DataFrame, keyCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("cnt").desc, col("bucket"))
    hist.withColumn("rank", row_number().over(w))
  }

  /** Entropy-based distribution sorter
    * (src/.../dist/EntropyBasedDistributionSorter.java:95-183): per-bucket
    * entropy -p·ln p, ascending (rarest-information first), capped at
    * `maxItems` per key (:157-172). */
  def entropySorter(hist: DataFrame, keyCols: Seq[String], maxItems: Int): DataFrame = {
    val withE = hist.withColumn("entropy", -col("freq") * log(col("freq")))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("entropy").asc, col("bucket"))
    withE.withColumn("rank", row_number().over(w))
      .where(col("rank") <= maxItems)
  }

  /** Empirical-CDF transform (engine addition): per key, map each value
    * to its cumulative-distribution position (cume_dist: fraction of
    * rows ≤ v, tie-stable by definition) and percent rank — the
    * rank-normalization that makes scores comparable across keys with
    * different scales before aggregation or thresholding. Null values
    * are excluded (engines disagree on null sort placement).
    *
    * Determinism: both stats are ratios of exact integers with one
    * float division — identical cross-engine regardless of tie order.
    *
    * Scale: one exchange + per-key sort (the window-family layout). */
  def cdfTransform(scored: DataFrame, keyCols: Seq[String], valCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(valCol))
    scored.where(col(valCol).isNotNull)
      .withColumn("cdf", cume_dist().over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .select((keyCols.map(col) :+ col(idCol) :+ col(valCol) :+ col("cdf") :+
        col("pct_rank")): _*)
  }

  /** Conformal anomaly p-value (Vovk et al., "Algorithmic Learning in a
    * Random World" / conformal anomaly detection): p(x) = (1 + #{cal
    * scores ≥ s(x)}) / (n_cal + 1) against a held-out calibration split —
    * turns ANY raw outlier score into a p-value with a finite-sample
    * guarantee (under exchangeability, P(p ≤ α) ≤ α), which is what
    * [[bhFdr]] expects as input. The principled bridge from the score
    * family to the FDR family.
    *
    * Determinism: the count is a RANGE-frame window sum over the merged
    * (data ∪ calibration) per-key sort — peers included, so equal
    * scores get equal counts regardless of tie order; p is a ratio of
    * exact integers.
    *
    * Scale: ONE exchange on the keys for the union (the window-family
    * layout — no per-row probe join against the calibration set);
    * calibration sizes ride the same pass. Null scores are excluded. */
  def conformalPValue(data: DataFrame, calib: DataFrame, keyCols: Seq[String],
      scoreCol: String, idCol: String): DataFrame = {
    val idType = data.schema(idCol).dataType
    val d = data.where(col(scoreCol).isNotNull)
      .select(keyCols.map(col) :+ col(idCol) :+ col(scoreCol).as("_s"): _*)
      .withColumn("_cal", lit(0))
    val c = calib.where(col(scoreCol).isNotNull)
      .select(keyCols.map(col) :+ lit(null).cast(idType).as(idCol) :+
        col(scoreCol).as("_s"): _*)
      .withColumn("_cal", lit(1))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("_s").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val nc = c.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("_ncal"))
    d.unionByName(c)
      .withColumn("_geq", sum(col("_cal")).over(w))
      .where(col("_cal") === 0)
      .join(broadcast(nc), keyCols)
      .select(keyCols.map(col) :+ col(idCol) :+ col("_s").as(scoreCol) :+
        ((lit(1) + col("_geq")).cast("double") / (col("_ncal") + 1))
          .as("p_value"): _*)
  }

  /** Gini coefficient per key over a non-negative measure (doc lengths,
    * token counts, spend): G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx)/(n·Σx) over the
    * ascending sort — the inequality summary a corpus-balance report
    * pairs with [[concentration]] (how unevenly is the measure spread
    * WITHIN each source). Exact: values at 4dp fixed point, rank·value
    * products summed in decimal(38,0); one double division at the end.
    * One row per key: n, total, gini.
    *
    * Scale: one exchange on the keys; the rank window and the aggregate
    * ride it. */
  def gini(data: DataFrame, keyCols: Seq[String], idCol: String,
      valCol: String): DataFrame = {
    val v = col(valCol).cast("double")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_fp").asc, col(idCol).asc)
    data.where(v.isNotNull && v >= 0)
      .withColumn("_fp", graft.core.fixedPointLong(v, 4))
      .withColumn("_i", row_number().over(w).cast("long"))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("_fp").cast("decimal(38,0)")).as("_sx"),
        sum((col("_i").cast("decimal(38,0)") *
          col("_fp").cast("decimal(38,0)")).cast("decimal(38,0)")).as("_six"))
      .withColumn("total", col("_sx").cast("double") / 1e4)
      .withColumn("gini",
        (lit(2) * col("_six") - (col("n") + 1) * col("_sx")).cast("double") /
          (col("n") * col("_sx")).cast("double"))
      .select(keyCols.map(col) ++
        Seq(col("n"), col("total"), col("gini")): _*)
  }

  /** Concentration of a categorical share: Herfindahl–Hirschman index
    * HHI = Σ (n_c/N)² and the effective number of categories 1/HHI —
    * the one-row "is this corpus really diverse" summary (an HHI near 1
    * means one source dominates regardless of how many exist). Exact:
    * HHI = Σn_c²/N² as a ratio of exact integer sums — no per-category
    * float sum at all. One row: k, n, hhi, effective. */
  def concentration(data: DataFrame, catCol: String): DataFrame = {
    data.where(col(catCol).isNotNull)
      .groupBy(col(catCol)).agg(count(lit(1)).as("_c"))
      .agg(count(lit(1)).as("k"), sum(col("_c")).as("n"),
        sum((col("_c").cast("decimal(38,0)") *
          col("_c").cast("decimal(38,0)")).cast("decimal(38,0)")).as("_sq"))
      .withColumn("hhi", col("_sq").cast("double") /
        (col("n").cast("decimal(38,0)") * col("n").cast("decimal(38,0)"))
          .cast("double"))
      .withColumn("effective",
        (col("n").cast("decimal(38,0)") * col("n").cast("decimal(38,0)"))
          .cast("double") / col("_sq").cast("double"))
      .select("k", "n", "hhi", "effective")
  }

  /** Winsorize: clamp each value into the exact per-key
    * [P(alpha), P(1−alpha)] order-statistic band — the robust
    * preprocessing twin of the reference's range filter (beymani's
    * in-range tags; this REPAIRS instead of tagging). lo is the value
    * at ascending rank ⌈alpha·n⌉ (≥1), hi at rank n+1−⌈alpha·n⌉.
    *
    * Determinism: ranks are exact (4dp fixed point, idCol tie-break);
    * both bounds come out of ONE conditional aggregate over the ranked
    * frame; the clamp is integer min/max on the fixed-point longs.
    *
    * Scale: one shuffle on the keys (rank window + agg share it), the
    * key-sized bound model broadcasts back. */
  def winsorize(data: DataFrame, keyCols: Seq[String], idCol: String,
      valCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 0.5, s"alpha in (0,0.5): $alpha")
    val v = col(valCol).cast("double")
    val fp = data.where(v.isNotNull)
      .withColumn("_fp", graft.core.fixedPointLong(v, 4))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_fp").asc, col(idCol).asc)
    val kw = Window.partitionBy(keyCols.map(col): _*)
    val ranked = fp
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(kw))
    val kl = greatest(ceil(lit(alpha) * col("_n")).cast("long"), lit(1L))
    val bounds = ranked.groupBy(keyCols.map(col): _*)
      .agg(min(when(col("_rn") === kl, col("_fp"))).as("_lo"),
        min(when(col("_rn") === col("_n") + 1 - kl, col("_fp"))).as("_hi"))
    fp.join(broadcast(bounds), keyCols)
      .withColumn("winsorized",
        least(greatest(col("_fp"), col("_lo")), col("_hi"))
          .cast("double") / 1e4)
      .withColumn("clipped", col("_fp") < col("_lo") || col("_fp") > col("_hi"))
      .drop("_fp", "_lo", "_hi")
  }

  /** Acklam's rational approximation of the standard normal quantile
    * (probit) — pure arithmetic (two Horner chains + sqrt/ln), so both
    * engines evaluate the identical expression tree: the device that
    * makes a rank-based inverse-normal transform oracle-replayable
    * without either engine shipping an inverse-erf. |relative error|
    * < 1.15e-9 over (0,1). */
  def probit(p: Column): Column = {
    val a = Seq(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Seq(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Seq(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Seq(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    def horner(cs: Seq[Double], x: Column): Column =
      cs.tail.foldLeft(lit(cs.head): Column)((acc, k) => acc * x + lit(k))
    val plow = 0.02425
    val qc = p - 0.5
    val rc = qc * qc
    val central = horner(a, rc) * qc / (horner(b, rc) * rc + 1.0)
    val ql = sqrt(lit(-2.0) * log(p))
    val lower = horner(c, ql) / (horner(d, ql) * ql + 1.0)
    val qu = sqrt(lit(-2.0) * log(lit(1.0) - p))
    val upper = -(horner(c, qu) / (horner(d, qu) * qu + 1.0))
    when(p < plow, lower).when(p > 1.0 - plow, upper).otherwise(central)
  }

  /** Rank-based inverse-normal transform (Blom 1958 offsets):
    * z = probit((rank − 3/8)/(n + 1/4)) per key — the normalization a
    * training pipeline applies before methods that assume gaussian
    * features. Rank ties break on idCol (the raw-rank INT convention).
    *
    * Scale: one shuffle on the keys; rank and count ride it as windows. */
  def intTransform(data: DataFrame, keyCols: Seq[String], idCol: String,
      valCol: String): DataFrame = {
    val v = col(valCol).cast("double")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(graft.core.fixedPointLong(v, 4).asc, col(idCol).asc)
    val kw = Window.partitionBy(keyCols.map(col): _*)
    data.where(v.isNotNull)
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(kw))
      .withColumn("z",
        probit((col("_rn") - 0.375) / (col("_n") + 0.25)))
      .drop("_rn", "_n")
  }

  /** Box–Cox λ fit per key over a caller-supplied grid: the profile
    * log-likelihood LL(λ) = −(n/2)·ln(σ²_pop(y_λ)) + (λ−1)·Σ ln x with
    * y_λ = (x^λ−1)/λ (ln x at λ=0), maximized over the grid; emits every
    * (key, λ, ll) plus the argmax flag. Strictly positive values only.
    *
    * Determinism: y_λ and ln x are frozen to 6dp fixed point before
    * summing (the PACF 6dp-frozen device), so σ² and Σln x are double
    * finishes over exact decimal sums; x^λ is written exp(λ·ln x) on
    * both engines; argmax breaks ties on smaller λ via a (ll desc,
    * λ asc) window.
    *
    * Scale: the grid crossJoin multiplies map-side CPU by |grid| but the
    * exchange carries only key×|grid| aggregate partials; the argmax
    * window runs on that model-sized frame. */
  def boxCoxFit(data: DataFrame, keyCols: Seq[String], valCol: String,
      lambdas: Seq[Double]): DataFrame = {
    require(lambdas.nonEmpty, "boxCoxFit needs a non-empty lambda grid")
    val spark = data.sparkSession
    import spark.implicits._
    val v = col(valCol).cast("double")
    val grid = broadcast(lambdas.toDF("lambda"))
    val lam = col("lambda")
    val y = when(lam === 0.0, log(v))
      .otherwise((exp(lam * log(v)) - 1.0) / lam)
    val stats = data.where(v.isNotNull && v > 0).crossJoin(grid)
      .select(keyCols.map(col) ++ Seq(lam,
        graft.core.fixedPointLong(y, 6).cast("decimal(38,0)").as("_y"),
        graft.core.fixedPointLong(log(v), 6).cast("decimal(38,0)").as("_l")): _*)
      .groupBy((keyCols.map(col) :+ lam): _*)
      .agg(count(lit(1)).cast("decimal(38,0)").as("_n"),
        sum(col("_y")).as("_s"),
        sum((col("_y") * col("_y")).cast("decimal(38,0)")).as("_q"),
        sum(col("_l")).as("_sl"))
    val nD = col("_n").cast("double")
    val varPop = (col("_q").cast("double") -
      col("_s").cast("double") * col("_s").cast("double") / nD) / nD / 1e12
    val ll = -(nD / 2) * log(varPop) +
      (lam - 1.0) * (col("_sl").cast("double") / 1e6)
    val wl = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("ll").desc, lam.asc)
    stats
      .withColumn("ll", ll)
      .withColumn("n_used", col("_n").cast("long"))
      .withColumn("best", row_number().over(wl) === 1)
      .select(keyCols.map(col) ++
        Seq(lam, col("ll"), col("n_used"), col("best")): _*)
  }

  /** Benjamini–Hochberg FDR control over per-record p-values (engine
    * addition): within each key, rank p ascending, find the largest k
    * with p₍ₖ₎ ≤ α·k/m, and flag ranks ≤ k as discoveries — the
    * principled replacement for a raw score threshold when the outlier
    * family's probabilities are actual p-values (expected false-discovery
    * fraction ≤ α instead of a per-test error rate).
    *
    * Deterministic: ranking ties break on `idCol`; the step-up compare
    * p ≤ α·k/m is the same float expression on both engines.
    *
    * Scale: one exchange on the keys; the rank, the partition count and
    * the kmax scan all ride the same per-key sort (the window-family
    * layout). Parallelism is key cardinality — the documented window
    * ceiling, acceptable because BH is per-population by construction. */
  /** Benjamini–Yekutieli FDR control — [[bhFdr]] under ARBITRARY
    * dependence between the tests: the step-up threshold divides by the
    * harmonic factor c(m) = Σ_{i=1..m} 1/i, the price of dropping BH's
    * independence/PRDS assumption (correlated per-record p-values —
    * e.g. scores sharing a fitted model — are the common case here).
    *
    * Determinism: 1/i is frozen to 12dp fixed point so c(m) is an exact
    * long window sum (an unordered double Σ1/i would be engine-order-
    * shaped); everything else is bhFdr's machinery.
    *
    * Scale: identical to bhFdr — one exchange on the keys, every window
    * rides the same per-key sort. */
  def byFdr(scored: DataFrame, keyCols: Seq[String], pCol: String,
      idCol: String, alpha: Double): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(pCol), col(idCol))
    val whole = Window.partitionBy(keyCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cm = sum(graft.core.fixedPointLong(lit(1.0) / col("rank"), 12))
      .over(whole).cast("double") / 1e12
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("m", count(lit(1)).over(whole))
      .withColumn("c_m", cm)
      .withColumn("kmax",
        max(when(col(pCol) <=
          lit(alpha) * col("rank") / (col("m") * col("c_m")),
          col("rank"))).over(whole))
      .withColumn("discovery",
        col("kmax").isNotNull && col("rank") <= col("kmax"))
      .select((keyCols.map(col) :+ col(idCol) :+ col(pCol) :+ col("rank") :+
        col("c_m") :+ col("discovery")): _*)
  }

  def bhFdr(scored: DataFrame, keyCols: Seq[String], pCol: String,
      idCol: String, alpha: Double): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(pCol), col(idCol))
    val whole = Window.partitionBy(keyCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("m", count(lit(1)).over(whole))
      .withColumn("kmax",
        max(when(col(pCol) <= lit(alpha) * col("rank") / col("m"),
          col("rank"))).over(whole))
      .withColumn("discovery",
        col("kmax").isNotNull && col("rank") <= col("kmax"))
      .select((keyCols.map(col) :+ col(idCol) :+ col(pCol) :+ col("rank") :+
        col("discovery")): _*)
  }

  /** Holm–Bonferroni step-down per key — the FWER sibling of
    * [[bhFdr]]'s FDR step-up: with p-values ranked ascending,
    * adjusted_i = running-max of p_(j)·(m−j+1) clamped to 1 (a
    * cumulative window), rejections are the ranks BEFORE the first
    * p_(i) > α/(m−i+1). Output: keyCols..., idCol, p, rank, p_adj,
    * rejected — the "no false alarm at all" guarantee where BH only
    * bounds the false-discovery rate. Same window shapes as bhFdr. */
  def holm(scored: DataFrame, keyCols: Seq[String], pCol: String,
      idCol: String, alpha: Double): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(pCol), col(idCol))
    val whole = Window.partitionBy(keyCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(pCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("m", count(lit(1)).over(whole))
      .withColumn("p_adj", least(lit(1.0),
        max(col(pCol) * (col("m") - col("rank") + 1).cast("double"))
          .over(cum)))
      // first failing rank: min rank with p > α/(m−rank+1)
      .withColumn("_fail",
        min(when(col(pCol) >
          lit(alpha) / (col("m") - col("rank") + 1).cast("double"),
          col("rank"))).over(whole))
      .withColumn("rejected",
        col("_fail").isNull || col("rank") < col("_fail"))
      .select((keyCols.map(col) :+ col(idCol) :+ col(pCol) :+ col("rank") :+
        col("p_adj") :+ col("rejected")): _*)
  }

  /** James–Stein (empirical Bayes) shrinkage of per-key means toward
    * the grand mean: shrunk_i = ḡ + c·(m_i − ḡ) with the positive-part
    * factor c = max(0, 1 − (k−3)·σ̂²/Σ(m_i−ḡ)²), σ̂² = the mean of the
    * per-key squared standard errors (s_i²/n_i) — dominates the raw
    * per-key means whenever k ≥ 4 (Efron & Morris 1977). Every moment
    * is an exact 4dp fixed-point sum; the two cross-key reductions are
    * ordered folds. Output one row per key: key, n, mean, shrunk —
    * what a per-key threshold should use when some keys have 10 rows
    * and others 10 million. */
  def jamesStein(data: DataFrame, keyCol: String, valCol: String)
      : DataFrame = {
    def dc(c: Column) = c.cast("decimal(38,0)")
    val v = col(valCol).cast("double")
    val g = data.where(v.isNotNull)
      .select(col(keyCol).as("key"),
        graft.core.fixedPointLong(v, 4).as("_v"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("_v")).as("_s"),
        sum(dc(dc(col("_v")) * dc(col("_v")))).as("_q"))
      .where(col("n") >= 2)
    val nD = col("n").cast("double")
    val mean = col("_s").cast("double") / nD / 1e4
    val se2 = ((col("_q").cast("double") -
      col("_s").cast("double") * col("_s").cast("double") / nD) /
      (nD - 1) / 1e8) / nD
    val keyed = g.withColumn("_m", mean).withColumn("_se2", se2)
    // grand mean of the key means + Σ(m−ḡ)² + mean SE²: ordered folds
    val folded = keyed
      .agg(count(lit(1)).as("k"),
        sort_array(collect_list(struct(col("key").as("g"),
          col("_m").as("m"), col("_se2").as("s2")))).as("_a"))
    val gm = aggregate(col("_a"), lit(0.0), (a, x) => a + x("m")) /
      col("k").cast("double")
    val f2 = folded.withColumn("_gm", gm)
    val ssd = aggregate(col("_a"), lit(0.0), (a, x) =>
      a + (x("m") - col("_gm")) * (x("m") - col("_gm")))
    val mse = aggregate(col("_a"), lit(0.0), (a, x) => a + x("s2")) /
      col("k").cast("double")
    val cst = f2.select(col("k"), col("_gm"),
      greatest(lit(0.0), lit(1.0) -
        (col("k").cast("double") - 3) * mse / ssd).as("_c"))
    keyed.crossJoin(broadcast(cst))
      .withColumn("mean", col("_m"))
      .withColumn("shrunk",
        col("_gm") + col("_c") * (col("_m") - col("_gm")))
      .select("key", "n", "mean", "shrunk")
  }

  /** Beta-binomial empirical-Bayes shrinkage of per-entity RATES — the
    * binomial sibling of [[jamesStein]]'s mean shrinker (the CTR/defect-
    * rate problem: an entity with 2/2 successes is not a 100% performer;
    * its rate should shrink toward the population). Method-of-moments
    * Beta prior from the per-entity rate distribution (entities with
    * n ≥ minTrials): with m = mean(p̂ᵢ) and v = var(p̂ᵢ),
    * K = m(1−m)/v − 1, α = mK, β = (1−m)K; shrunk_i = (sᵢ+α)/(nᵢ+α+β).
    * Degenerate spread (v ≤ 0 or v ≥ m(1−m)) emits null prior and the
    * raw rate — no prior is estimable.
    *
    * Determinism: p̂ᵢ freezes at 6dp; the two cross-entity moments are
    * exact decimal sums of the frozen longs; α, β and every shrunk rate
    * are fixed float expressions. Scale: one hash aggregate to
    * entity-sized rows + a broadcast 1-row prior. Output per entity:
    * key, n, s, raw_rate, alpha, beta, shrunk_rate. */
  def betaBinomialShrink(data: DataFrame, keyCol: String,
      succCol: String, trialCol: String, minTrials: Long = 1L)
      : DataFrame = {
    def dc(c: Column) = c.cast("decimal(38,0)")
    val g = data
      .where(col(succCol).isNotNull && col(trialCol).isNotNull)
      .groupBy(col(keyCol).as("key"))
      .agg(sum(col(succCol).cast("long")).as("s"),
        sum(col(trialCol).cast("long")).as("n"))
      .where(col("n") >= minTrials && col("s") >= 0 &&
        col("s") <= col("n"))
      .withColumn("_p6", graft.core.fixedPointLong(
        col("s").cast("double") / col("n").cast("double"), 6))
    val prior = g.agg(count(lit(1)).as("_k"),
        sum(dc(col("_p6"))).as("_sp"),
        sum(dc(dc(col("_p6")) * dc(col("_p6")))).as("_qp"))
      .withColumn("_m",
        col("_sp").cast("double") / col("_k").cast("double") / 1e6)
      .withColumn("_v", (col("_qp").cast("double") -
        col("_sp").cast("double") * col("_sp").cast("double") /
          col("_k").cast("double")) /
        (col("_k").cast("double") - 1.0) / 1e12)
      .withColumn("_kk",
        when(col("_k") >= 2 && col("_v") > 0 &&
          col("_v") < col("_m") * (lit(1.0) - col("_m")),
          col("_m") * (lit(1.0) - col("_m")) / col("_v") - 1.0))
      .select((col("_m") * col("_kk")).as("alpha"),
        ((lit(1.0) - col("_m")) * col("_kk")).as("beta"))
    g.crossJoin(broadcast(prior))
      .withColumn("raw_rate", col("_p6").cast("double") / 1e6)
      .withColumn("shrunk_rate",
        when(col("alpha").isNotNull,
          (col("s").cast("double") + col("alpha")) /
            (col("n").cast("double") + col("alpha") + col("beta")))
          .otherwise(col("raw_rate")))
      .select("key", "n", "s", "raw_rate", "alpha", "beta",
        "shrunk_rate")
  }

  /** Rank-ensemble score combiner: each detector's score is replaced by
    * its global percent-rank (average-rank/n via the 3dp-frozen score
    * histogram — exact integers, so detectors with incomparable scales
    * become comparable without any calibration), then averaged in fixed
    * column order. The Kemeny-lite ensemble the reference's weighted
    * score aggregation (core.aggregateScores) can't express when the
    * member scales differ by orders of magnitude. Output: idCols...,
    * rank_<scoreCol>..., ensemble.
    *
    * Scale: the 3dp freeze bounds the histogram by the score's VALUE
    * RANGE ×10³ (a continuous score at 6dp would make distinct ≈ rows
    * and the global rank window data-sized — measured 17 s at 16×);
    * the detectors are MELTED into one (detector, value) frame so the
    * whole ensemble is one histogram job producing a histogram-sized
    * rank map, broadcast-joined per detector — not k chained plans. */
  def rankEnsemble(scored: DataFrame, idCols: Seq[String],
      scoreCols: Seq[String]): DataFrame = {
    require(scoreCols.nonEmpty, "rankEnsemble needs score columns")
    // one MELTED pass (r9 verdict item 2): explode (detector, 3dp value)
    // pairs → ONE grouped histogram → ONE detector-partitioned CDF
    // window → a histogram-sized rank map, eagerly checkpointed (so the
    // upstream scorer chain runs exactly once) and then BROADCAST-joined
    // per detector onto the scored spine — zero extra exchanges on the
    // data itself (q358's plan dropped from 36 exchanges / 8 one-row
    // BNLJ to the upstream chain + the one histogram job).
    val pairs = array(scoreCols.map(c => struct(lit(c).as("_col"),
      graft.core.fixedPointLong(col(c).cast("double"), 3).as("_f"))): _*)
    val h = scored.select(explode(pairs).as("_p"))
      .select(col("_p._col").as("_col"), col("_p._f").as("_f"))
      .groupBy(col("_col"), col("_f")).agg(count(lit(1)).as("_ct"))
    val w = Window.partitionBy(col("_col")).orderBy(col("_f").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("_col"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val pr = h
      .withColumn("_cum", sum(col("_ct")).over(w))
      .withColumn("_n", sum(col("_ct")).over(wAll))
      .select(col("_col"), col("_f"),
        ((lit(2) * (col("_cum") - col("_ct")) + col("_ct") + 1)
          .cast("double") / (lit(2) * col("_n")).cast("double"))
          .as("_rank"))
      // histogram-sized (VALUE RANGE ×10³ per detector) — the blessed
      // model-sized materialization, GC-cleaned with the result
      .localCheckpoint(true)
    val withRanks = scoreCols.foldLeft(scored)((d, c) =>
      d.withColumn(s"_f_$c",
          graft.core.fixedPointLong(col(c).cast("double"), 3))
        .join(broadcast(pr.where(col("_col") === c)
          .select(col("_f").as(s"_f_$c"), col("_rank").as(s"rank_$c"))),
          s"_f_$c"))
    val avg0 = scoreCols.map(c => col(s"rank_$c"))
      .reduce(_ + _) / scoreCols.length
    withRanks.withColumn("ensemble", avg0)
      .select((idCols.map(col) ++ scoreCols.map(c => col(s"rank_$c")) :+
        col("ensemble")): _*)
  }

  /** Quantile normalization: replace every value with the POOLED value
    * at the same within-key quantile — the batch-effect remover (after
    * it, every key's distribution is the pooled one; cross-key score
    * comparisons stop being apples-to-oranges). Per-key quantile =
    * exact average rank /n from the value histogram; the pooled lookup
    * "smallest pooled value whose cumulative fraction ≥ q" rides the
    * as-of device on negated fractions (one window over the two
    * histograms — distinct-value-sized, never the data; the comparison
    * doubles are the same fixed expressions on both engines, and the
    * DuckDB ASOF JOIN replays the identical inclusive boundary).
    * Output one row per input row: id, key, value, normalized. */
  def quantileNormalize(data: DataFrame, keyCol: String, idCol: String,
      valCol: String): DataFrame = {
    val v = col(valCol).cast("double")
    val base = data.where(v.isNotNull)
      .select(col(keyCol).as("key"), col(idCol).as("id"), v.as("value"),
        graft.core.fixedPointLong(v, 4).as("_v"))
    val kh = base.groupBy(col("key"), col("_v"))
      .agg(count(lit(1)).as("_ct"))
    val kw = Window.partitionBy(col("key")).orderBy(col("_v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kn = Window.partitionBy(col("key"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val khq = kh
      .withColumn("_cum", sum(col("_ct")).over(kw))
      .withColumn("_n", sum(col("_ct")).over(kn))
      // negated avg-rank fraction: −(2·cumBefore + ct + 1)/(2n)
      .withColumn("_ts",
        -((lit(2) * (col("_cum") - col("_ct")) + col("_ct") + 1)
          .cast("double") / (lit(2) * col("_n")).cast("double")))
      .select(col("key"), col("_v"), col("_ts"))
    val ph = base.groupBy(col("_v")).agg(count(lit(1)).as("_pct"))
    val ptot = ph.agg(sum(col("_pct")).as("_np"))
    // banded prefix sum over the pooled histogram (the binaryAuc device)
    val phq = graft.core.bandedCumSum(ph, expr("_v div 100000"),
        bandAsc = true, tie = Seq(col("_v").asc),
        sums = Map("_pct" -> "_cump"))
      .crossJoin(broadcast(ptot))
      .select(
        (-(col("_cump").cast("double") / col("_np").cast("double")))
          .as("_ts"),
        (col("_v").cast("double") / 1e4).as("normalized"))
    val mapped = graft.seq.AsOfJoin.asOf(khq, phq, Seq(), "_ts",
      Seq("normalized"))
      .select(col("key"), col("_v"), col("normalized"))
    base.join(mapped, Seq("key", "_v"))
      .select("id", "key", "value", "normalized")
  }

  /** Split-conformal prediction interval (Papadopoulos '02; Lei et al.
    * JASA'18) with empirical coverage audit: the data hash-splits into
    * train / calibration / test folds, the per-key train mean is the
    * point predictor, q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest calibration
    * residual (exact order statistic from the residual HISTOGRAM — a
    * key-partitioned window, never a data-sized global one), and the
    * test fold reports the fraction inside ±q̂ — the finite-sample
    * ≥ 1−α guarantee, checked. Output per key: keyCols…, n_train,
    * n_calib, n_test, qhat, coverage.
    *
    * Determinism: folds are md5-derived; residuals freeze at 4dp, so
    * the order statistic and the coverage comparison are exact integer
    * selections. Keys whose calibration fold is smaller than the rank
    * fall back to the max residual (the finite q̂ the sample supports).
    * Scale: three filtered aggregates + one histogram window + broadcast
    * model joins. */
  def conformalInterval(data: DataFrame, keyCols: Seq[String],
      idCol: String, valCol: String, alpha: Double = 0.1): DataFrame = {
    require(alpha > 0 && alpha < 1, s"0 < alpha < 1: $alpha")
    import graft.core.fixedPointLong
    val y = col(valCol).cast("double")
    val tagged = data.where(y.isNotNull)
      .select((keyCols.map(col) :+ y.as("_y") :+
        pmod(graft.text.TextOps.hash56(col(idCol).cast("string")), lit(3L))
          .as("_fold")): _*)
    val mu = tagged.where(col("_fold") === 0L)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_train"),
        sum(fixedPointLong(col("_y"), 4).cast("decimal(38,0)")).as("_s4"))
      .withColumn("_mu",
        col("_s4").cast("double") / 1e4 / col("n_train").cast("double"))
      .select((keyCols.map(col) :+ col("n_train") :+ col("_mu")): _*)
    val calib = tagged.where(col("_fold") === 1L)
      .join(broadcast(mu), keyCols)
      .select((keyCols.map(col) :+
        fixedPointLong(abs(col("_y") - col("_mu")), 4).as("_r4")): _*)
    val nCal = calib.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_calib"))
    val hist = calib.groupBy((keyCols.map(col) :+ col("_r4")): _*)
      .agg(count(lit(1)).as("_ct"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_r4").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qhat = hist
      .withColumn("_cum", sum(col("_ct")).over(w))
      .join(broadcast(nCal), keyCols)
      .withColumn("_k", least(col("n_calib"),
        ceil((col("n_calib") + 1).cast("double") * (1.0 - alpha))
          .cast("long")))
      .where(col("_cum") >= col("_k"))
      .groupBy(keyCols.map(col): _*)
      .agg(min(col("_r4")).as("_q4"))
    val test = tagged.where(col("_fold") === 2L)
      .join(broadcast(mu), keyCols)
      .join(broadcast(qhat), keyCols)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_test"),
        sum(when(fixedPointLong(abs(col("_y") - col("_mu")), 4) <=
          col("_q4"), 1L).otherwise(0L)).as("_in"))
    mu.join(nCal, keyCols).join(qhat, keyCols).join(test, keyCols)
      .select((keyCols.map(col) :+ col("n_train") :+ col("n_calib") :+
        col("n_test") :+ (col("_q4").cast("double") / 1e4).as("qhat") :+
        (col("_in").cast("double") / col("n_test").cast("double"))
          .as("coverage")): _*)
  }
}
