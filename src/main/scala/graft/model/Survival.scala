package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis (engine additions): the Kaplan–Meier product-limit
  * estimator with the Nelson–Aalen cumulative hazard, and the two-group
  * log-rank test — the right-censoring-aware form of the retention
  * curve (`SeqOps.retention` counts returns per cohort age; KM answers
  * "what fraction SURVIVES past t when some subjects are still alive at
  * cutoff", which naive retention over-counts as churn).
  *
  * Determinism: risk sets, event and censor counts are exact integers
  * from one duration histogram; the survival product is carried as
  * exp(Σ ln(1 − d/n)) with the cumulative sum running over the ordered
  * distinct-duration frame — a fixed per-row IEEE expression both
  * engines replay (the same device for Nelson–Aalen's Σ d/n and the
  * log-rank Σ over times, the latter an ordered fold).
  *
  * Scale: everything after the per-subject aggregation is
  * distinct-duration-sized (the value-histogram contract) — the one
  * cumulative window never touches subject-level data. */
object Survival {

  /** Kaplan–Meier over per-subject (duration, event): one row per
    * distinct duration with the risk set, event/censor counts, the
    * product-limit survival and Nelson–Aalen cumulative hazard.
    * `event` true = the terminal event was observed; false = censored
    * at that duration. Output: t, n_risk, d, c, survival, cum_hazard. */
  def kaplanMeier(subjects: DataFrame, durationCol: String,
      eventCol: String): DataFrame = {
    val e = col(eventCol).cast("boolean")
    val h = subjects.where(col(durationCol).isNotNull && e.isNotNull)
      .select(col(durationCol).cast("long").as("t"), e.as("_e"))
      .groupBy(col("t"))
      .agg(sum(when(col("_e"), 1L).otherwise(0L)).as("d"),
        sum(when(!col("_e"), 1L).otherwise(0L)).as("c"))
    val w = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = h.agg(sum(col("d") + col("c")).as("_n"))
    h.crossJoin(broadcast(tot))
      // at-risk just BEFORE t: total minus everything that left earlier
      .withColumn("n_risk",
        col("_n") - (sum(col("d") + col("c")).over(w) -
          (col("d") + col("c"))))
      // d = n_risk (everyone at risk dies at the last duration) sends
      // the log term to −∞ — Spark's log(0) is NULL where DuckDB's is
      // -inf, so spell the −∞ explicitly; exp(−∞) = 0 on both engines
      .withColumn("survival", exp(sum(
        when(col("d") < col("n_risk"),
          log(lit(1.0) - col("d").cast("double") /
            col("n_risk").cast("double")))
          .otherwise(lit(Double.NegativeInfinity))).over(w)))
      .withColumn("cum_hazard", sum(
        col("d").cast("double") / col("n_risk").cast("double")).over(w))
      .select("t", "n_risk", "d", "c", "survival", "cum_hazard")
  }

  /** Stratified Kaplan–Meier: one survival curve per group — the
    * same exact-count/cumulative-log device as [[kaplanMeier]] with
    * every frame partitioned by the group. Output one row per
    * (grp, distinct duration): grp, t, n_risk, d, c, survival,
    * cum_hazard — the curves the log-rank statistic summarizes. */
  def kaplanMeierBy(subjects: DataFrame, durationCol: String,
      eventCol: String, groupCol: String): DataFrame = {
    val e = col(eventCol).cast("boolean")
    val h = subjects.where(col(durationCol).isNotNull && e.isNotNull &&
      col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"),
        col(durationCol).cast("long").as("t"), e.as("_e"))
      .groupBy(col("grp"), col("t"))
      .agg(sum(when(col("_e"), 1L).otherwise(0L)).as("d"),
        sum(when(!col("_e"), 1L).otherwise(0L)).as("c"))
    val w = Window.partitionBy(col("grp")).orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = h.groupBy(col("grp")).agg(sum(col("d") + col("c")).as("_n"))
    h.join(broadcast(tot), "grp")
      .withColumn("n_risk",
        col("_n") - (sum(col("d") + col("c")).over(w) -
          (col("d") + col("c"))))
      // same NULL-vs-(-inf) guard as [[kaplanMeier]]
      .withColumn("survival", exp(sum(
        when(col("d") < col("n_risk"),
          log(lit(1.0) - col("d").cast("double") /
            col("n_risk").cast("double")))
          .otherwise(lit(Double.NegativeInfinity))).over(w)))
      .withColumn("cum_hazard", sum(
        col("d").cast("double") / col("n_risk").cast("double")).over(w))
      .select("grp", "t", "n_risk", "d", "c", "survival", "cum_hazard")
  }

  /** Two-group log-rank test: at every distinct pooled duration t,
    * expected group-a events e_a = d·n_a/n and the hypergeometric
    * variance v = d·(n_a/n)·(1−n_a/n)·(n−d)/(n−1); χ² =
    * (Σd_a − Σe_a)²/Σv with the three Σ-over-times as ordered folds.
    * One row: n_a, n_b, chi2. */
  def logRank(subjects: DataFrame, durationCol: String, eventCol: String,
      groupCol: String, ga: String, gb: String): DataFrame = {
    val e = col(eventCol).cast("boolean")
    val h = subjects.where(col(durationCol).isNotNull && e.isNotNull &&
      (col(groupCol) === ga || col(groupCol) === gb))
      .select(col(durationCol).cast("long").as("t"), e.as("_e"),
        (col(groupCol) === ga).as("_a"))
      .groupBy(col("t"))
      .agg(sum(when(col("_e") && col("_a"), 1L).otherwise(0L)).as("_da"),
        sum(when(col("_e"), 1L).otherwise(0L)).as("_d"),
        sum(when(col("_a"), 1L).otherwise(0L)).as("_la"),
        count(lit(1)).as("_l"))
    val w = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = h.agg(sum(col("_l")).as("_n"), sum(col("_la")).as("_nna"))
    val risk = h.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("_n") - (sum(col("_l")).over(w) - col("_l")))
      .withColumn("na_risk",
        col("_nna") - (sum(col("_la")).over(w) - col("_la")))
      .where(col("_d") > 0 && col("n_risk") > 1)
    val nD = col("n_risk").cast("double")
    val naD = col("na_risk").cast("double")
    val dD = col("_d").cast("double")
    val folded = risk
      .withColumn("_ea", dD * naD / nD)
      .withColumn("_v", dD * (naD / nD) * (lit(1.0) - naD / nD) *
        (nD - dD) / (nD - 1))
      .agg(sort_array(collect_list(struct(col("t"),
        col("_da").cast("double").as("da"), col("_ea").as("ea"),
        col("_v").as("v")))).as("_arr"))
    def fsum(f: String, as: String) =
      aggregate(col("_arr"), lit(0.0), (acc, x) => acc + x(f)).as(as)
    folded.select(fsum("da", "_sda"), fsum("ea", "_sea"), fsum("v", "_sv"))
      .crossJoin(broadcast(tot))
      .withColumn("n_a", col("_nna"))
      .withColumn("n_b", col("_n") - col("_nna"))
      .withColumn("chi2",
        (col("_sda") - col("_sea")) * (col("_sda") - col("_sea")) /
          col("_sv"))
      .select("n_a", "n_b", "chi2")
  }

  /** Aalen–Johansen cumulative incidence with two competing causes:
    * CIF_k(t) = Σ_{s≤t} S(s⁻)·d_k(s)/n(s) where S(s⁻) is the all-cause
    * KM survival just BEFORE s — the right "what fraction will have hit
    * outcome k by t" curve when a competing event removes subjects
    * (1 − KM_k overstates it). Counts are exact integers off one
    * duration histogram; S(s⁻) rides the same −∞-guarded log cumsum as
    * [[kaplanMeier]]; the two CIF cumsums quantize their per-time
    * increments at 6dp. One row per distinct duration: t, n_risk, d1,
    * d2, c, cif1, cif2. */
  def aalenJohansen(subjects: DataFrame, durationCol: String,
      cause1Col: String, cause2Col: String): DataFrame = {
    val e1 = col(cause1Col).cast("boolean")
    val e2 = col(cause2Col).cast("boolean")
    val fp6 = (c: Column) =>
      when(c >= 0, floor(c * 1e6 + 0.5)).otherwise(-floor(-c * 1e6 + 0.5))
        .cast("long")
    val h = subjects.where(col(durationCol).isNotNull)
      .select(col(durationCol).cast("long").as("t"),
        e1.as("_e1"), e2.as("_e2"))
      .groupBy(col("t"))
      .agg(sum(when(col("_e1"), 1L).otherwise(0L)).as("d1"),
        sum(when(!col("_e1") && col("_e2"), 1L).otherwise(0L)).as("d2"),
        sum(when(!col("_e1") && !col("_e2"), 1L).otherwise(0L)).as("c"))
    val w = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = h.agg(sum(col("d1") + col("d2") + col("c")).as("_n"))
    val d = col("d1") + col("d2")
    val base = h.crossJoin(broadcast(tot))
      .withColumn("n_risk", col("_n") -
        (sum(col("d1") + col("d2") + col("c")).over(w) -
          (col("d1") + col("d2") + col("c"))))
      // S(s⁻): the all-cause survival through the PREVIOUS time
      .withColumn("_sprev", exp(coalesce(sum(
        when(d < col("n_risk"),
          log(lit(1.0) - d.cast("double") / col("n_risk").cast("double")))
          .otherwise(lit(Double.NegativeInfinity)))
        .over(Window.orderBy(col("t").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0.0))))
    base
      .withColumn("cif1", sum(fp6(col("_sprev") *
        (col("d1").cast("double") / col("n_risk").cast("double"))))
        .over(w).cast("double") / 1e6)
      .withColumn("cif2", sum(fp6(col("_sprev") *
        (col("d2").cast("double") / col("n_risk").cast("double"))))
        .over(w).cast("double") / 1e6)
      .select("t", "n_risk", "d1", "d2", "c", "cif1", "cif2")
  }

  /** Restricted mean survival time at horizon τ: ∫₀^τ S(t)dt over the
    * KM step function — the unit area before the first distinct
    * duration plus Σ S(t_i)·(min(next_i, τ) − t_i) with each step area
    * 6dp-quantized before the (distinct-duration-sized) sum. One row:
    * n, tau, rmst. */
  def rmst(subjects: DataFrame, durationCol: String, eventCol: String,
      tau: Long): DataFrame = {
    val km = kaplanMeier(subjects, durationCol, eventCol)
    val w = Window.orderBy(col("t").asc)
    val fp6 = (c: Column) =>
      when(c >= 0, floor(c * 1e6 + 0.5)).otherwise(-floor(-c * 1e6 + 0.5))
        .cast("long")
    km
      .withColumn("_next", coalesce(lead(col("t"), 1).over(w), lit(tau)))
      .withColumn("_lo", least(col("t"), lit(tau)))
      .withColumn("_hi", least(greatest(col("_next"), col("t")), lit(tau)))
      .withColumn("_head",
        when(row_number().over(w) === 1, least(col("t"), lit(tau)))
          .otherwise(lit(0L)))
      .agg(sum(col("d") + col("c")).as("n"),
        (max(col("_head")).cast("double") +
          sum(fp6(col("survival") *
            (col("_hi") - col("_lo")).cast("double"))).cast("double") / 1e6)
          .as("rmst"))
      .select(col("n"), lit(tau).as("tau"), col("rmst"))
  }

  /** Gehan–Breslow–Wilcoxon weighted log-rank: the [[logRank]] fold
    * with weight w_t = n_risk (early differences count more); χ² =
    * (Σ w·(d_a − e_a))² / Σ w²·v. One row: n_a, n_b, chi2. */
  def gehanLogRank(subjects: DataFrame, durationCol: String,
      eventCol: String, groupCol: String, ga: String, gb: String)
      : DataFrame = {
    val e = col(eventCol).cast("boolean")
    val h = subjects.where(col(durationCol).isNotNull && e.isNotNull &&
      (col(groupCol) === ga || col(groupCol) === gb))
      .select(col(durationCol).cast("long").as("t"), e.as("_e"),
        (col(groupCol) === ga).as("_a"))
      .groupBy(col("t"))
      .agg(sum(when(col("_e") && col("_a"), 1L).otherwise(0L)).as("_da"),
        sum(when(col("_e"), 1L).otherwise(0L)).as("_d"),
        sum(when(col("_a"), 1L).otherwise(0L)).as("_la"),
        count(lit(1)).as("_l"))
    val w = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = h.agg(sum(col("_l")).as("_n"), sum(col("_la")).as("_nna"))
    val risk = h.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("_n") - (sum(col("_l")).over(w) - col("_l")))
      .withColumn("na_risk",
        col("_nna") - (sum(col("_la")).over(w) - col("_la")))
      .where(col("_d") > 0 && col("n_risk") > 1)
    val nD = col("n_risk").cast("double")
    val naD = col("na_risk").cast("double")
    val dD = col("_d").cast("double")
    val folded = risk
      .withColumn("_wda", nD * col("_da").cast("double"))
      .withColumn("_wea", nD * (dD * naD / nD))
      .withColumn("_wv", nD * nD * (dD * (naD / nD) * (lit(1.0) - naD / nD) *
        (nD - dD) / (nD - 1)))
      .agg(sort_array(collect_list(struct(col("t"),
        col("_wda").as("da"), col("_wea").as("ea"),
        col("_wv").as("v")))).as("_arr"))
    def fsum(f: String, as: String) =
      aggregate(col("_arr"), lit(0.0), (acc, x) => acc + x(f)).as(as)
    folded.select(fsum("da", "_sda"), fsum("ea", "_sea"), fsum("v", "_sv"))
      .crossJoin(broadcast(tot))
      .withColumn("n_a", col("_nna"))
      .withColumn("n_b", col("_n") - col("_nna"))
      .withColumn("chi2",
        (col("_sda") - col("_sea")) * (col("_sda") - col("_sea")) /
          col("_sv"))
      .select("n_a", "n_b", "chi2")
  }
}
