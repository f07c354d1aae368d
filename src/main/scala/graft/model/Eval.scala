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
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byScore
      .withColumn("cumN", sum("ns").over(w))
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
    val w = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = byScore.agg(sum("pos").as("totPos"))
    byScore
      .withColumn("cumN", sum("n").over(w))
      .withColumn("cumPos", sum("pos").over(w))
      .crossJoin(broadcast(tot))
      .select(col("s").as("threshold_ge"),
        col("cumN").as("n_predicted"),
        col("cumPos").as("tp"),
        (col("cumPos").cast("double") / col("cumN")).as("precision"),
        when(col("totPos") > 0,
          col("cumPos").cast("double") / col("totPos")).as("recall"))
  }
}
