package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier evaluation — the measurement half of the quality-filter
  * family (NB / logistic / LM scorers fit and score; this grades them
  * against labels, which is how a pipeline decides a filter's threshold
  * and whether a retrain regressed). Engine addition: the reference has
  * no evaluation operators.
  *
  * Everything is exact: AUC by the Mann–Whitney rank-sum identity with
  * average ranks for ties (so the value is the true probability that a
  * random positive outranks a random negative, ties at ½), and the
  * confusion counts are integers. Both replay in SQL — rank windows and
  * integer sums only. */
object Eval {

  /** ROC-AUC of `score` against boolean `label` via rank-sum:
    * AUC = (Σ avg-ranks(positives) − nPos(nPos+1)/2) / (nPos·nNeg).
    * One rank window over the scored frame + one scalar aggregate;
    * average ranks make ties exact. Returns a 1-row frame
    * (n, n_pos, n_neg, auc). */
  def binaryAuc(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    // aggregate per distinct score FIRST (one data-sized hash agg), so
    // the rank arithmetic runs over a score-cardinality-sized frame —
    // the avg rank of a tie group is cumBefore + (n+1)/2, and the
    // positive rank-sum folds per group. The only window is over the
    // grouped frame (bounded by distinct scores, never data-sized).
    val byScore = scored
      .select(col(scoreCol).as("s"), col(labelCol).cast("boolean").as("y"))
      .groupBy("s")
      .agg(count(lit(1)).as("ns"),
        sum(when(col("y"), 1L).otherwise(0L)).as("pos"))
    // banded prefix sum: on a CONTINUOUS scorer the distinct-score frame
    // is data-sized, so a flat Window.orderBy(s) would sort it all on
    // ONE partition; the banded device (3dp-frozen score bands, exact —
    // fixedPointLong is monotone so (band, s) == global s order) keeps
    // the only unpartitioned window band-histogram-sized while producing
    // the bit-identical cumN (r10/r11 verdict item 1a).
    graft.core.bandedCumSum(byScore,
        graft.core.fixedPointLong(col("s"), 3), bandAsc = true,
        tie = Seq(col("s")), sums = Map("ns" -> "cumN"))
      .withColumn("ravg", (col("cumN") - col("ns")) + (col("ns") + 1) / 2.0)
      .agg(
        sum("ns").as("n"),
        sum("pos").as("n_pos"),
        sum(col("ns") - col("pos")).as("n_neg"),
        sum(col("pos") * col("ravg")).as("rsum"))
      .select(col("n"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("rsum") - col("n_pos") * (col("n_pos") + 1) / 2.0) /
            (col("n_pos") * col("n_neg")))
          .as("auc"))
  }

  /** Confusion counts + precision/recall/F1/accuracy at a threshold
    * (predicted positive = score > threshold). Integer counts, one
    * aggregate; the ratios are fixed expressions over exact longs. */
  def confusionAt(scored: DataFrame, scoreCol: String, labelCol: String,
      threshold: Double): DataFrame = {
    val pred = col(scoreCol) > threshold
    val y = col(labelCol).cast("boolean")
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    scored.agg(
      cnt(pred && y).as("tp"), cnt(pred && !y).as("fp"),
      cnt(!pred && y).as("fn"), cnt(!pred && !y).as("tn"))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp"))))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn"))))
      .withColumn("f1",
        when(col("precision").isNotNull && col("recall").isNotNull &&
          col("precision") + col("recall") > 0,
          lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))))
      .withColumn("accuracy",
        (col("tp") + col("tn")).cast("double") /
          (col("tp") + col("fp") + col("fn") + col("tn")))
  }

  /** Cohen's kappa between two boolean raters/labelers — the agreement
    * check for label audits and silver-vs-gold comparisons: observed
    * agreement corrected for chance. Integer counts, one aggregate. */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val a = col(aCol).cast("boolean"); val b = col(bCol).cast("boolean")
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    df.agg(cnt(a && b).as("n_both"), cnt(a && !b).as("n_a_only"),
        cnt(!a && b).as("n_b_only"), cnt(!a && !b).as("n_neither"))
      .withColumn("n",
        col("n_both") + col("n_a_only") + col("n_b_only") + col("n_neither"))
      .withColumn("po",
        (col("n_both") + col("n_neither")).cast("double") / col("n"))
      .withColumn("pe",
        ((col("n_both") + col("n_a_only")) * (col("n_both") + col("n_b_only")) +
          (col("n_b_only") + col("n_neither")) * (col("n_a_only") + col("n_neither")))
          .cast("double") / col("n") / col("n"))
      .withColumn("kappa",
        when(col("pe") < 1.0, (col("po") - col("pe")) / (lit(1.0) - col("pe"))))
  }

  /** Calibration (reliability) bins: scores in [0,1] bucketed into
    * `nBins` equal-width bins → per bin the count, mean predicted score
    * and observed positive rate. A calibrated classifier has
    * meanScore ≈ posRate per bin. One hash aggregate, bin-sized out. */
  def calibrationBins(scored: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins > 0)
    val s = col(scoreCol).cast("double")
    val bin = least(lit(nBins - 1), floor(s * nBins).cast("int")).as("bin")
    scored.select(bin, s.as("s"), col(labelCol).cast("boolean").as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        // 6dp fixed-point sum: a raw double avg is combine-order-
        // nondeterministic (the q116 pattern)
        (sum(graft.core.fixedPointLong(col("s"), 6)).cast("double") / 1e6 /
          count(lit(1))).as("mean_score"),
        (sum(when(col("y"), 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("pos_rate"))
  }

  /** Regression / forecast error metrics: RMSE, MAE, bias, R² and MAPE
    * (non-zero actuals only) — the grading pass for the forecaster
    * family (Holt, AR, one-step-ahead). One aggregate; sums ride
    * 6dp fixed-point longs (decimal for the squares) so the metrics
    * hash-replay exactly. */
  def regressionMetrics(df: DataFrame, actualCol: String,
      predCol: String): DataFrame = {
    val a = col(actualCol).cast("double"); val p = col(predCol).cast("double")
    val err = p - a
    val e6 = graft.core.fixedPointLong(err, 6)
    val a6 = graft.core.fixedPointLong(a, 6)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val rows = df.where(a.isNotNull && p.isNotNull)
    rows.agg(
      count(lit(1)).as("n"),
      sum(dec(e6) * dec(e6)).as("_see"),
      sum(abs(e6)).as("_sae"),
      sum(e6).as("_se"),
      sum(a6).as("_sa"),
      sum(dec(a6) * dec(a6)).as("_saa"),
      sum(when(a =!= 0.0,
        graft.core.fixedPointLong(abs(err / a), 6)).otherwise(0L)).as("_sape"),
      sum(when(a =!= 0.0, 1L).otherwise(0L)).as("_nape"))
      .select(col("n"),
        sqrt(col("_see").cast("double") / 1e12 / col("n")).as("rmse"),
        (col("_sae").cast("double") / 1e6 / col("n")).as("mae"),
        (col("_se").cast("double") / 1e6 / col("n")).as("bias"),
        when((col("_saa").cast("double") / 1e12) -
            (col("_sa").cast("double") / 1e6) *
              (col("_sa").cast("double") / 1e6) / col("n") > 0,
          lit(1.0) - (col("_see").cast("double") / 1e12) /
            ((col("_saa").cast("double") / 1e12) -
              (col("_sa").cast("double") / 1e6) *
                (col("_sa").cast("double") / 1e6) / col("n"))).as("r2"),
        when(col("_nape") > 0,
          col("_sape").cast("double") / 1e6 / col("_nape")).as("mape"))
  }

  /** Precision/recall curve at every distinct score cut (descending):
    * row k = metrics when the top-k-scored rows are predicted positive —
    * the threshold-sweep a deployment uses to pick its operating point.
    * One rank window + running sums over it; output is distinct-score-
    * sized, never data-sized. */
  def prCurve(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val y = col(labelCol).cast("boolean")
    val byScore = scored
      .select(col(scoreCol).as("s"), y.as("y"))
      .groupBy("s")
      .agg(count(lit(1)).as("n"), sum(when(col("y"), 1L).otherwise(0L)).as("pos"))
    val tot = byScore.agg(sum("pos").as("totPos"))
    // banded prefix sums (the binaryAuc device): the distinct-score
    // frame is data-sized on a continuous scorer — never sort it on one
    // partition
    graft.core.bandedCumSum(byScore,
        graft.core.fixedPointLong(col("s"), 3), bandAsc = false,
        tie = Seq(col("s").desc),
        sums = Map("n" -> "cumN", "pos" -> "cumPos"))
      .crossJoin(broadcast(tot))
      .select(col("s").as("threshold_ge"),
        col("cumN").as("n_predicted"),
        col("cumPos").as("tp"),
        (col("cumPos").cast("double") / col("cumN")).as("precision"),
        when(col("totPos") > 0,
          col("cumPos").cast("double") / col("totPos")).as("recall"))
  }
}
