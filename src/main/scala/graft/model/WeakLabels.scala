package graft.model

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Programmatic weak supervision (Ratner et al., "Snorkel: rapid
  * training data creation with weak supervision", VLDB'18): labeling
  * functions (LFs) vote {−1, 0, +1} per item (0 = abstain) and a label
  * model weighs them by estimated accuracy WITHOUT gold labels — the
  * standard way LLM-scale corpora get classification labels (quality,
  * toxicity, topicality) from cheap heuristic rules. Engine addition:
  * the reference has no label-aggregation operator at all. */
object WeakLabels {

  /** Two-round agreement-weighted label model (the EM-free
    * method-of-moments shortcut): round 1 takes the unweighted majority
    * sign per item; round 2 estimates each LF's accuracy as its
    * agreement rate with the round-1 majority over non-abstain overlaps,
    * clamps to [clamp, 1−clamp], weighs votes by the log-odds
    * w_j = ln(acc_j / (1 − acc_j)), and emits the weighted score and
    * its sign as the final label.
    *
    * Determinism: majority and agreement are exact integer counts;
    * accuracies are exact integer ratios; each weighted vote term is
    * 9dp-frozen before the per-item sum (q116 device); the final sign
    * compares against ±1e-9 so a float-zero score can't flip engines
    * apart.
    *
    * Scale: two hash aggregates (items, then LFs — the LF frame is
    * model-sized) + one broadcast join back; no data-sized sort.
    *
    * Input: one row per (item, lf, vote). Output per item: item,
    * n_votes, score, label. */
  def labelModel(votes: DataFrame, itemCol: String, lfCol: String,
      voteCol: String, clamp: Double = 0.05): DataFrame = {
    require(clamp > 0 && clamp < 0.5, s"0 < clamp < 0.5: $clamp")
    val v = col(voteCol).cast("long")
    val base = votes.select(col(itemCol).as("item"), col(lfCol).as("lf"),
      when(v > 0, 1L).when(v < 0, -1L).otherwise(0L).as("v"))
    // round 1: unweighted majority sign per item (ties/all-abstain → 0)
    val maj = base.groupBy(col("item"))
      .agg(sum(col("v")).as("_m"))
      .select(col("item"),
        when(col("_m") > 0, 1L).when(col("_m") < 0, -1L)
          .otherwise(0L).as("_maj"))
    // round 2: per-LF agreement with the majority over non-abstain
    // overlaps (both the LF and the majority committed)
    val acc = base.join(maj, "item")
      .where(col("v") =!= 0 && col("_maj") =!= 0)
      .groupBy(col("lf"))
      .agg(count(lit(1)).as("_n"),
        sum(when(col("v") === col("_maj"), 1L).otherwise(0L)).as("_a"))
      .withColumn("_acc",
        least(greatest(col("_a").cast("double") / col("_n").cast("double"),
          lit(clamp)), lit(1.0 - clamp)))
      .select(col("lf"), log(col("_acc") / (lit(1.0) - col("_acc"))).as("_w"))
    // final: per-item weighted vote sum, 9dp-frozen terms
    val term = fixedPointLong(col("_w") * col("v").cast("double"), 9)
      .cast("decimal(38,0)")
    base.join(broadcast(acc), Seq("lf"), "left")
      .groupBy(col("item"))
      .agg(sum(when(col("v") =!= 0, 1L).otherwise(0L)).as("n_votes"),
        (sum(when(col("v") =!= 0, term).otherwise(lit(0).cast("decimal(38,0)")))
          .cast("double") / 1e9).as("score"))
      .withColumn("label",
        when(col("score") > 1e-9, 1L)
          .when(col("score") < -1e-9, -1L).otherwise(0L))
      .select(col("item"), col("n_votes"), col("score"), col("label"))
  }
}
