package graft.model

import graft.core.fixedPointLong
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-component 1-D Gaussian mixture via a FIXED number of unrolled EM
  * rounds — the classic unsupervised bimodality model (is this metric one
  * population or a mixture of a normal regime and an outlier regime?),
  * fitted the engine's deterministic way: no RNG init, no convergence
  * loop. Init is an exact function of per-key min/max/moments (μ at the
  * quarter points of the range, shared variance, π = ½); each E-step
  * responsibility is a closed-form float expression and each M-step sum
  * is fixed-point-quantized per term, so the whole recursion replays
  * bit-for-bit as an unrolled CTE chain in the oracle (the Huber-IRLS
  * device, cf. model/Robust's 2 unrolled reweighting rounds).
  *
  * Scale: one data scan per round (EM is inherently multi-pass) joined
  * against a broadcast key-sized parameter frame; all sums are map-side
  * combined decimals. rounds is small and fixed (default 3). */
object Mixture {

  def gmm2(data: DataFrame, keyCols: Seq[String], valCol: String,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 6, s"1 <= rounds <= 6: $rounds")
    val x = col(valCol).cast("double")
    val base = data.where(x.isNotNull)
      .select((keyCols.map(col) :+ x.as("_x")): _*)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // exact init: μ at the quarter points, one shared variance from the
    // fp4-quantized moments, π = ½
    val init = base.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_n"),
        min(col("_x")).as("_mn"), max(col("_x")).as("_mx"),
        sum(dec(fixedPointLong(col("_x"), 4))).as("_sx4"),
        sum(dec(fixedPointLong(col("_x") * col("_x"), 4))).as("_sxx4"))
      .withColumn("_mean",
        col("_sx4").cast("double") / 1e4 / col("_n").cast("double"))
      .select((keyCols.map(col) :+
        lit(0.5).as("pi") :+
        (col("_mn") + (col("_mx") - col("_mn")) * 0.25).as("mu1") :+
        (col("_mn") + (col("_mx") - col("_mn")) * 0.75).as("mu2") :+
        greatest(col("_sxx4").cast("double") / 1e4 /
          col("_n").cast("double") - col("_mean") * col("_mean"),
          lit(1e-8)).as("v1") :+
        greatest(col("_sxx4").cast("double") / 1e4 /
          col("_n").cast("double") - col("_mean") * col("_mean"),
          lit(1e-8)).as("v2") :+
        col("_n")): _*)

    def emRound(params: DataFrame): DataFrame = {
      val j = base.join(broadcast(params), keyCols)
      // unnormalized densities (the 1/√(2π) cancels in r)
      val d1 = exp(-(col("_x") - col("mu1")) * (col("_x") - col("mu1")) /
        (lit(2.0) * col("v1"))) / sqrt(col("v1"))
      val d2 = exp(-(col("_x") - col("mu2")) * (col("_x") - col("mu2")) /
        (lit(2.0) * col("v2"))) / sqrt(col("v2"))
      val den = col("pi") * d1 + (lit(1.0) - col("pi")) * d2
      val r = when(den > 0, col("pi") * d1 / den).otherwise(lit(0.5))
      val scored = j.select((keyCols.map(col) :+ col("_x") :+ r.as("_r")): _*)
      scored.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("_n"),
          sum(dec(fixedPointLong(col("_r"), 8))).as("_sr8"),
          sum(dec(fixedPointLong(col("_r") * col("_x"), 6))).as("_srx6"),
          sum(dec(fixedPointLong(col("_r") * col("_x") * col("_x"), 6)))
            .as("_srxx6"),
          sum(dec(fixedPointLong((lit(1.0) - col("_r")) * col("_x"), 6)))
            .as("_sqx6"),
          sum(dec(fixedPointLong((lit(1.0) - col("_r")) * col("_x") *
            col("_x"), 6))).as("_sqxx6"))
        .withColumn("_w1", col("_sr8").cast("double") / 1e8)
        .withColumn("_w2", col("_n").cast("double") - col("_w1"))
        .select((keyCols.map(col) :+
          (col("_w1") / col("_n").cast("double")).as("pi") :+
          when(col("_w1") > 0, col("_srx6").cast("double") / 1e6 / col("_w1"))
            .otherwise(lit(0.0)).as("mu1") :+
          when(col("_w2") > 0, col("_sqx6").cast("double") / 1e6 / col("_w2"))
            .otherwise(lit(0.0)).as("mu2") :+
          col("_w1") :+ col("_w2") :+ col("_srxx6") :+ col("_sqxx6") :+
          col("_n")): _*)
        .select((keyCols.map(col) :+ col("pi") :+ col("mu1") :+ col("mu2") :+
          greatest(when(col("_w1") > 0, col("_srxx6").cast("double") / 1e6 /
            col("_w1") - col("mu1") * col("mu1")).otherwise(lit(1e-8)),
            lit(1e-8)).as("v1") :+
          greatest(when(col("_w2") > 0, col("_sqxx6").cast("double") / 1e6 /
            col("_w2") - col("mu2") * col("mu2")).otherwise(lit(1e-8)),
            lit(1e-8)).as("v2") :+
          col("_n")): _*)
    }

    val fitted = (1 to rounds).foldLeft(init)((p, _) => emRound(p))
    fitted.select((keyCols.map(col) :+ col("_n").as("n") :+ col("pi") :+
      col("mu1") :+ col("mu2") :+ col("v1") :+ col("v2")): _*)
  }
}
