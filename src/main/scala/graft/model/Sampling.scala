package graft.model

import graft.core.fixedPointLong
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling-design and resampling-inference operators: Neyman optimal
  * stratum allocation, exact-proportion stratified splits, and the
  * Poisson bootstrap — the survey-sampling face next to [[Behavior]]'s
  * Efraimidis–Spirakis sampler. All randomness is md5-derived
  * (hash-replayable); all float roll-ups quantize per term. */
object Sampling {

  /** Neyman optimal allocation (Neyman '34): sample n_total across
    * strata proportionally to N_h·S_h — big AND noisy strata get the
    * budget, the design that minimizes the variance of the stratified
    * mean at fixed cost. S_h from exact fp4 moment sums. Output per
    * stratum: stratum, n, std, alloc (⌊·+½⌋ of the exact share,
    * capped at n). */
  def neymanAllocation(data: DataFrame, stratumCol: String, valCol: String,
      nTotal: Long): DataFrame = {
    require(nTotal >= 1, s"nTotal >= 1: $nTotal")
    val x = col(valCol).cast("double")
    val per = data.where(x.isNotNull)
      .select(col(stratumCol).as("stratum"), x.as("_x"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n"),
        sum(fixedPointLong(col("_x"), 4).cast("decimal(38,0)")).as("_sx4"),
        sum(fixedPointLong(col("_x") * col("_x"), 4).cast("decimal(38,0)"))
          .as("_sxx4"))
      .withColumn("_mean",
        col("_sx4").cast("double") / 1e4 / col("n").cast("double"))
      .withColumn("std", sqrt(greatest(
        col("_sxx4").cast("double") / 1e4 / col("n").cast("double") -
          col("_mean") * col("_mean"), lit(0.0))))
      .withColumn("_w8", fixedPointLong(col("n").cast("double") * col("std"), 8))
    val tot = per.agg(sum(col("_w8")).as("_t8"))
    per.crossJoin(broadcast(tot))
      .withColumn("alloc", when(col("_t8") > 0,
        least(col("n"),
          floor(lit(nTotal.toDouble) *
            (col("_w8").cast("double") / col("_t8").cast("double")) + 0.5)
            .cast("long")))
        .otherwise(lit(0L)))
      .select("stratum", "n", "std", "alloc")
  }

  /** Exact-proportion stratified split: within each stratum, rows rank
    * by (md5(id), id) and cut at ⌊f_train·n⌋ / ⌊(f_train+f_val)·n⌋ —
    * every stratum lands within one row of its target fractions (the
    * pure-hash split of q107 only hits fractions in expectation, which
    * skews small strata). Output: id, stratum, split ∈ {train,val,test}.
    *
    * Scale: one rank window partitioned by stratum. */
  def stratifiedSplit(data: DataFrame, idCol: String, stratumCol: String,
      fTrain: Double, fVal: Double): DataFrame = {
    require(fTrain > 0 && fVal >= 0 && fTrain + fVal < 1,
      s"bad fractions: $fTrain, $fVal")
    val w = Window.partitionBy(col("stratum"))
      .orderBy(md5(col("id").cast("string")), col("id"))
    val wn = Window.partitionBy(col("stratum"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    data.select(col(idCol).as("id"), col(stratumCol).as("stratum"))
      .withColumn("_rk", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(wn))
      .withColumn("split",
        when(col("_rk") <= floor(lit(fTrain) * col("_n").cast("double"))
          .cast("long"), lit("train"))
          .when(col("_rk") <= floor(lit(fTrain + fVal) *
            col("_n").cast("double")).cast("long"), lit("val"))
          .otherwise(lit("test")))
      .select("id", "stratum", "split")
  }

  /** Poisson bootstrap standard error of the mean (Chamandy et al. '12,
    * the one-pass web-scale bootstrap): replicate b reweights row i by
    * a Poisson(1) draw derived from hash56(b‖id) through the exact
    * inverse CDF (thresholds e⁻¹·Σ1/j!, capped at 7) — no resample
    * shuffle, no RNG state, fully replayable. SE = the B-replicate
    * standard deviation of the weighted means. Output per key: key, n,
    * mean, se_boot.
    *
    * Scale: one pass over data×B rows (B fixed, default 32) into
    * (key, b) partial sums — the explode is the dataflow form of "B
    * counters per partition"; everything after is key×B-sized. */
  def poissonBootstrap(data: DataFrame, keyCols: Seq[String], idCol: String,
      valCol: String, b: Int = 32): DataFrame = {
    require(b >= 2 && b <= 256, s"2 <= b <= 256: $b")
    val x = col(valCol).cast("double")
    // Poisson(1) inverse-CDF thresholds: e^{-1} * (Σ_{j<=m} 1/j!) — the
    // rationals are exact; exp(-1.0) carries the engine libm parity
    val e1 = exp(lit(-1.0))
    val cums = Seq(1.0, 2.0, 2.5, 8.0 / 3.0, 65.0 / 24.0, 163.0 / 60.0,
      1957.0 / 720.0)
    def pois(u: Column): Column =
      cums.zipWithIndex.foldRight(lit(7L): Column) { case ((c, m), rest) =>
        when(u < e1 * lit(c), lit(m.toLong)).otherwise(rest)
      }
    val u = (graft.text.TextOps.hash56(
      concat(col("_b").cast("string"), lit(":"), col("_id"))) + 1)
      .cast("double") / lit(math.pow(2, 56))
    val withW = data.where(x.isNotNull)
      .select((keyCols.map(col) :+ col(idCol).cast("string").as("_id") :+
        x.as("_x")): _*)
      .select((keyCols.map(col) :+ col("_id") :+ col("_x") :+
        explode(sequence(lit(0), lit(b - 1))).as("_b")): _*)
      .withColumn("_w", pois(u))
    val rep = withW.groupBy((keyCols.map(col) :+ col("_b")): _*)
      .agg(sum(col("_w")).as("_sw"),
        sum((col("_w") * fixedPointLong(col("_x"), 4)).cast("decimal(38,0)"))
          .as("_swx4"))
      .withColumn("_mb",
        when(col("_sw") > 0,
          col("_swx4").cast("double") / 1e4 / col("_sw").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("_mb8", fixedPointLong(col("_mb"), 8))
    val overall = data.where(x.isNotNull)
      .select((keyCols.map(col) :+ x.as("_x")): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        (sum(fixedPointLong(col("_x"), 4).cast("decimal(38,0)"))
          .cast("double") / 1e4 / count(lit(1)).cast("double")).as("mean"))
    val se = rep.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_nb"), sum(col("_mb8")).as("_s1"),
        // square in decimal: mb8 can be ~5e9, its long square overflows
        sum(col("_mb8").cast("decimal(38,0)") * col("_mb8")).as("_s2"))
      .withColumn("_m1", col("_s1").cast("double") / 1e8 /
        col("_nb").cast("double"))
      .withColumn("se_boot", sqrt(greatest(
        col("_s2").cast("double") / 1e16 / col("_nb").cast("double") -
          col("_m1") * col("_m1"), lit(0.0))))
      .select((keyCols.map(col) :+ col("se_boot")): _*)
    overall.join(se, keyCols)
      .select((keyCols.map(col) :+ col("n") :+ col("mean") :+
        col("se_boot")): _*)
  }
}
