package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment-analysis estimators (engine additions, CUPED/SRM's
  * siblings): difference-in-differences, post-stratified ATE, the
  * delta-method CI for ratio metrics, and the closed-form MDE power
  * planner. Every mean/variance comes from exact 4dp fixed-point sums;
  * the per-stratum double terms quantize at 6dp before the K-fold sum
  * (combine-order exact). */
object Causal {

  private def fp(c: Column): Column = graft.core.fixedPointLong(c, 4)
  private def fp6(c: Column): Column =
    when(c >= 0, floor(c * 1e6 + 0.5)).otherwise(-floor(-c * 1e6 + 0.5))
      .cast("long")
  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** 2×2 difference-in-differences: DiD = (ȳ_t,post − ȳ_t,pre) −
    * (ȳ_c,post − ȳ_c,pre), SE = √(Σ_cells s²/n). One row: n, did, se,
    * t_stat. */
  def diffInDiff(data: DataFrame, treatCol: String, postCol: String,
      yCol: String): DataFrame = {
    val y = col(yCol).cast("double")
    val cells = data.where(y.isNotNull)
      .select(col(treatCol).cast("boolean").as("_t"),
        col(postCol).cast("boolean").as("_p"), fp(y).as("_y"))
      .groupBy(col("_t"), col("_p"))
      .agg(count(lit(1)).as("_n"), sum(dec(col("_y"))).as("_s"),
        sum(dec(dec(col("_y")) * dec(col("_y")))).as("_q"))
      .where(col("_n") >= 2)
    val nD = col("_n").cast("double")
    val m = col("_s").cast("double") / nD / 1e4
    val v = (col("_q").cast("double") -
      col("_s").cast("double") * col("_s").cast("double") / nD) /
      (nD - 1) / 1e8
    val agg = cells
      .withColumn("_m", m).withColumn("_vn", v / nD)
      .agg(sum(col("_n")).as("n"),
        sum(fp6(when(col("_t") && col("_p"), col("_m"))
          .when(col("_t") && !col("_p"), -col("_m"))
          .when(!col("_t") && col("_p"), -col("_m"))
          .otherwise(col("_m")))).as("_didfp"),
        sum(fp6(col("_vn"))).as("_sefp"),
        count(lit(1)).as("_k"))
      .where(col("_k") === 4)
    agg
      .withColumn("did", col("_didfp").cast("double") / 1e6)
      .withColumn("se", sqrt(col("_sefp").cast("double") / 1e6))
      .withColumn("t_stat", col("did") / col("se"))
      .select("n", "did", "se", "t_stat")
  }

  /** Post-stratified ATE: Σ_s (n_s/N)·(ȳ₁ₛ − ȳ₀ₛ) with SE² =
    * Σ_s (n_s/N)²·(v₁ₛ/n₁ₛ + v₀ₛ/n₀ₛ); strata missing an arm are
    * dropped (reported). One row: n, n_strata, ate, se. */
  def postStratATE(data: DataFrame, stratumCol: String, treatCol: String,
      yCol: String): DataFrame = {
    val y = col(yCol).cast("double")
    val s = data.where(y.isNotNull)
      .select(col(stratumCol).as("_s"),
        col(treatCol).cast("boolean").as("_t"), fp(y).as("_y"))
      .groupBy(col("_s"))
      .agg(count(lit(1)).as("_ns"),
        sum(when(col("_t"), 1L).otherwise(0L)).as("_n1"),
        sum(when(col("_t"), dec(col("_y")))).as("_s1"),
        sum(when(col("_t"), dec(dec(col("_y")) * dec(col("_y"))))).as("_q1"),
        sum(when(!col("_t"), 1L).otherwise(0L)).as("_n0"),
        sum(when(!col("_t"), dec(col("_y")))).as("_s0"),
        sum(when(!col("_t"), dec(dec(col("_y")) * dec(col("_y"))))).as("_q0"))
      .where(col("_n1") >= 2 && col("_n0") >= 2)
    val tot = s.agg(sum(col("_ns")).as("_nt"))
    def mv(sc: String, qc: String, nc: String): (Column, Column) = {
      val nD = col(nc).cast("double")
      val mean = col(sc).cast("double") / nD / 1e4
      val vv = (col(qc).cast("double") -
        col(sc).cast("double") * col(sc).cast("double") / nD) /
        (nD - 1) / 1e8
      (mean, vv)
    }
    val (m1, v1) = mv("_s1", "_q1", "_n1")
    val (m0, v0) = mv("_s0", "_q0", "_n0")
    val wgt = col("_ns").cast("double") / col("_nt").cast("double")
    s.crossJoin(broadcast(tot))
      .withColumn("_atep", fp6(wgt * (m1 - m0)))
      .withColumn("_sep", fp6(wgt * wgt *
        (v1 / col("_n1").cast("double") + v0 / col("_n0").cast("double"))))
      .agg(sum(col("_ns")).as("n"), count(lit(1)).as("n_strata"),
        sum(col("_atep")).as("_a"), sum(col("_sep")).as("_se2"))
      .select(col("n"), col("n_strata"),
        (col("_a").cast("double") / 1e6).as("ate"),
        sqrt(col("_se2").cast("double") / 1e6).as("se"))
  }

  /** Delta-method CI for the per-key ratio metric R = Σx/Σy:
    * Var(R) ≈ (s²_x − 2R·s_xy + R²·s²_y) / (n·ȳ²), CI = R ± 1.96·SE.
    * One row per key: key, n, ratio, se, lo, hi. */
  def deltaRatioCI(data: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val xv = col(xCol).cast("double"); val yv = col(yCol).cast("double")
    val s = data.where(xv.isNotNull && yv.isNotNull)
      .select(col(keyCol).as("key"), fp(xv).as("_x"), fp(yv).as("_y"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("_x"))).as("sx"), sum(dec(col("_y"))).as("sy"),
        sum(dec(dec(col("_x")) * dec(col("_x")))).as("sxx"),
        sum(dec(dec(col("_x")) * dec(col("_y")))).as("sxy"),
        sum(dec(dec(col("_y")) * dec(col("_y")))).as("syy"))
      .where(col("n") >= 2 && col("sy") =!= 0)
    val nD = col("n").cast("double")
    val r = col("sx").cast("double") / col("sy").cast("double")
    val vx = (col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double") / nD) / (nD - 1)
    val vy = (col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double") / nD) / (nD - 1)
    val cxy = (col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double") / nD) / (nD - 1)
    val ybar = col("sy").cast("double") / nD
    val se = sqrt((vx - lit(2.0) * r * cxy + r * r * vy) /
      (nD * ybar * ybar))
    s.select(col("key"), col("n"), r.as("ratio"), se.as("se"),
      (r - lit(1.96) * se).as("lo"), (r + lit(1.96) * se).as("hi"))
  }

  /** Two-proportion MDE at α=0.05 (two-sided), power 0.8, assuming an
    * even split of the key's traffic: MDE = (z_{α/2}+z_β)·
    * √(2p(1−p)/(n/2)). One row per key: key, n, p, mde. */
  def powerMde(data: DataFrame, keyCol: String, posCol: String): DataFrame = {
    val zA = 1.959963984540054 // Φ⁻¹(0.975)
    val zB = 0.8416212335729143 // Φ⁻¹(0.8)
    val g = data.select(col(keyCol).as("key"),
      col(posCol).cast("boolean").cast("long").as("_y"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("_y")).as("_pos"))
      .where(col("n") >= 4)
    val nD = col("n").cast("double")
    val p = col("_pos").cast("double") / nD
    g.select(col("key"), col("n"), p.as("p"),
      (lit(zA + zB) * sqrt(lit(2.0) * p * (lit(1.0) - p) / (nD / 2.0)))
        .as("mde"))
  }
}
