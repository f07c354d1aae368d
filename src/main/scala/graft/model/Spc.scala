package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical-process-control charts (engine additions): the Shewhart
  * X̄/R subgroup chart, varying-limit p/c attribute charts, the Western
  * Electric run rules and Cp/Cpk/Pp/Ppk capability indices — the
  * monitoring vocabulary a production data pipeline alarms on. The
  * reference's threshold scorers flag single points; SPC adds the
  * subgroup- and run-structure view (a process can be drifting out of
  * control while every individual point stays inside a naive band).
  *
  * Determinism: all centers and limits derive from exact 4dp
  * fixed-point integer sums (decimal(38,0)/HUGEINT); the chart
  * constants (A2/D3/D4/d2, Montgomery, "Introduction to Statistical
  * Quality Control", App. VI) are fixed literals, so every limit is a
  * fixed IEEE double expression both engines replay identically.
  *
  * Scale: every chart is one hash aggregate to subgroup/window-sized
  * stats plus one broadcast join of the per-key (model-sized) limits
  * back onto the subgroup frame — no data-sized shuffle beyond the
  * initial key grouping, no window over the raw data except the
  * per-key row_number that forms subgroups (the per-entity-series
  * contract shared with the seq kernels). */
object Spc {

  /** Shewhart chart constants for subgroup size n = 2..10:
    * (A2, D3, D4, d2). */
  private val shewhart: Map[Int, (Double, Double, Double, Double)] = Map(
    2 -> (1.880, 0.0, 3.267, 1.128),
    3 -> (1.023, 0.0, 2.574, 1.693),
    4 -> (0.729, 0.0, 2.282, 2.059),
    5 -> (0.577, 0.0, 2.114, 2.326),
    6 -> (0.483, 0.0, 2.004, 2.534),
    7 -> (0.419, 0.076, 1.924, 2.704),
    8 -> (0.373, 0.136, 1.864, 2.847),
    9 -> (0.337, 0.184, 1.816, 2.970),
    10 -> (0.308, 0.223, 1.777, 3.078))

  private def fp(c: Column): Column = graft.core.fixedPointLong(c, 4)

  /** Per-key consecutive subgroups of exactly `n` rows (ordered by
    * `ordCol`, ties by value then fixed-point value for total order);
    * trailing partial subgroups are dropped. Returns
    * (key, sg, long n, exact sum, min, max) — the subgroup stats frame
    * every chart below consumes. */
  private def subgroups(data: DataFrame, keyCol: String, ordCol: String,
      valCol: String, n: Int): DataFrame = {
    val v = col(valCol).cast("double")
    val w = Window.partitionBy(col("key"))
      .orderBy(col("_ord").asc, col("_v").asc)
    data.where(v.isNotNull)
      .select(col(keyCol).as("key"), col(ordCol).as("_ord"), v.as("_v"),
        fp(v).as("_fp"))
      .withColumn("_sg", ((row_number().over(w) - 1) / n).cast("long"))
      .groupBy(col("key"), col("_sg"))
      .agg(count(lit(1)).as("_n"),
        sum(col("_fp").cast("decimal(38,0)")).as("_s"),
        min(col("_fp")).as("_lo"), max(col("_fp")).as("_hi"))
      .where(col("_n") === n)
  }

  /** X̄/R chart: per-key subgroups of `n`, subgroup mean and range,
    * center lines X̄̄ (grand mean of subgroup means) and R̄, limits
    * X̄̄ ± A2·R̄ and [D3·R̄, D4·R̄]. Output one row per subgroup:
    * key, sg, xbar, r, xbar_ucl, xbar_lcl, r_ucl, out_x, out_r. */
  def xbarR(data: DataFrame, keyCol: String, ordCol: String,
      valCol: String, n: Int = 5): DataFrame = {
    val (a2, d3, d4, _) = shewhart.getOrElse(n,
      throw new IllegalArgumentException(s"subgroup size 2..10: $n"))
    val sg = subgroups(data, keyCol, ordCol, valCol, n)
      .select(col("key"), col("_sg"),
        (col("_s").cast("double") / n / 1e4).as("xbar"),
        ((col("_hi") - col("_lo")).cast("double") / 1e4).as("r"),
        col("_s"), (col("_hi") - col("_lo")).as("_rfp"))
    // center lines from exact integer totals over all subgroups
    val cl = sg.groupBy(col("key")).agg(
      count(lit(1)).as("_k"),
      sum(col("_s")).as("_ts"),
      sum(col("_rfp").cast("decimal(38,0)")).as("_tr"))
      .select(col("key"),
        (col("_ts").cast("double") / (col("_k") * n) / 1e4).as("_xc"),
        (col("_tr").cast("double") / col("_k") / 1e4).as("_rc"))
    sg.join(broadcast(cl), "key")
      .withColumn("xbar_ucl", col("_xc") + lit(a2) * col("_rc"))
      .withColumn("xbar_lcl", col("_xc") - lit(a2) * col("_rc"))
      .withColumn("r_ucl", lit(d4) * col("_rc"))
      .withColumn("r_lcl", lit(d3) * col("_rc"))
      .withColumn("out_x",
        col("xbar") > col("xbar_ucl") || col("xbar") < col("xbar_lcl"))
      .withColumn("out_r",
        col("r") > col("r_ucl") || col("r") < col("r_lcl"))
      .select("key", "_sg", "xbar", "r", "xbar_ucl", "xbar_lcl", "r_ucl",
        "out_x", "out_r")
      .withColumnRenamed("_sg", "sg")
  }

  /** Varying-limit p-chart: per (key, window) defect proportion with
    * binomial limits p̄ ± 3·√(p̄(1−p̄)/n_w) around the per-key pooled
    * p̄ = Σd/Σn (exact integers). `defect` is any boolean column
    * expression. Output: key, win, n, d, phat, ucl, lcl, out. */
  def pChart(data: DataFrame, keyCol: String, winCol: Column,
      defect: Column): DataFrame = {
    val w = data.select(col(keyCol).as("key"), winCol.as("win"),
      when(defect, 1L).otherwise(0L).as("_d"))
      .groupBy(col("key"), col("win"))
      .agg(count(lit(1)).as("n"), sum(col("_d")).as("d"))
    val pool = w.groupBy(col("key"))
      .agg(sum(col("n")).as("_tn"), sum(col("d")).as("_td"))
      .select(col("key"),
        (col("_td").cast("double") / col("_tn").cast("double")).as("_pbar"))
    w.join(broadcast(pool), "key")
      .withColumn("phat", col("d").cast("double") / col("n").cast("double"))
      .withColumn("_sig",
        sqrt(col("_pbar") * (lit(1.0) - col("_pbar")) /
          col("n").cast("double")))
      .withColumn("ucl", col("_pbar") + lit(3.0) * col("_sig"))
      .withColumn("lcl",
        greatest(col("_pbar") - lit(3.0) * col("_sig"), lit(0.0)))
      .withColumn("out", col("phat") > col("ucl") || col("phat") < col("lcl"))
      .select("key", "win", "n", "d", "phat", "ucl", "lcl", "out")
  }

  /** c-chart: per (key, window) event counts against c̄ ± 3√c̄ (the
    * Poisson chart — "is this window's defect COUNT abnormal"). Windows
    * with zero events do not appear (count charts monitor occurrences,
    * not a fixed inspection plan). Output: key, win, c, ucl, lcl, out. */
  def cChart(data: DataFrame, keyCol: String, winCol: Column,
      defect: Column): DataFrame = {
    val w = data.where(defect)
      .select(col(keyCol).as("key"), winCol.as("win"))
      .groupBy(col("key"), col("win"))
      .agg(count(lit(1)).as("c"))
    val pool = w.groupBy(col("key"))
      .agg((sum(col("c")).cast("double") / count(lit(1))).as("_cbar"))
    w.join(broadcast(pool), "key")
      .withColumn("ucl", col("_cbar") + lit(3.0) * sqrt(col("_cbar")))
      .withColumn("lcl",
        greatest(col("_cbar") - lit(3.0) * sqrt(col("_cbar")), lit(0.0)))
      .withColumn("out",
        col("c").cast("double") > col("ucl") ||
          col("c").cast("double") < col("lcl"))
      .select("key", "win", "c", "ucl", "lcl", "out")
  }

  /** Individuals / moving-range (I-MR) chart — the Shewhart chart for
    * n=1 subgroups (no rational subgrouping available): MR_t =
    * |x_t − x_{t−1}| as exact 4dp integers, center lines from exact
    * totals, limits x̄ ± 2.66·M̄R and MR UCL = 3.267·M̄R (the d2=1.128
    * constants folded in). Output per point: key, ord, x, mr, x_ucl,
    * x_lcl, mr_ucl, out_x, out_mr (mr/out_mr NULL on each key's first
    * point). */
  def imrChart(data: DataFrame, keyCol: String, ordCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(valCol).cast("double")
    val w = Window.partitionBy(col("key")).orderBy(col("ord").asc)
    val base = data.where(v.isNotNull)
      .select(col(keyCol).as("key"), col(ordCol).cast("long").as("ord"),
        graft.core.fixedPointLong(v, 4).as("_x4"))
      .withColumn("_mr4", abs(col("_x4") - lag(col("_x4"), 1).over(w)))
    val cl = base.groupBy(col("key"))
      .agg(count(lit(1)).as("_n"),
        sum(col("_x4").cast("decimal(38,0)")).as("_sx"),
        sum(col("_mr4").cast("decimal(38,0)")).as("_smr"),
        sum(when(col("_mr4").isNotNull, 1L).otherwise(0L)).as("_nmr"))
      .where(col("_nmr") >= 1)
      .select(col("key"),
        (col("_sx").cast("double") / col("_n").cast("double") / 1e4)
          .as("_xc"),
        (col("_smr").cast("double") / col("_nmr").cast("double") / 1e4)
          .as("_mrc"))
    base.join(broadcast(cl), "key")
      .withColumn("x", col("_x4").cast("double") / 1e4)
      .withColumn("mr", col("_mr4").cast("double") / 1e4)
      .withColumn("x_ucl", col("_xc") + lit(2.66) * col("_mrc"))
      .withColumn("x_lcl", col("_xc") - lit(2.66) * col("_mrc"))
      .withColumn("mr_ucl", lit(3.267) * col("_mrc"))
      .withColumn("out_x",
        col("x") > col("x_ucl") || col("x") < col("x_lcl"))
      .withColumn("out_mr", col("mr") > col("mr_ucl"))
      .select("key", "ord", "x", "mr", "x_ucl", "x_lcl", "mr_ucl",
        "out_x", "out_mr")
  }

  /** Western Electric run rules over the per-key standardized series
    * (μ, σ from exact fixed-point sums, sample variance):
    * r1 — point beyond 3σ; r2 — ≥2 of the last 3 beyond 2σ on the SAME
    * side (current point included and itself beyond 2σ, the WE
    * convention); r3 — ≥4 of the last 5 beyond 1σ same side (current
    * included & beyond); r4 — 8 consecutive on one side of center.
    * Output one row per point: key, seq, value, z, r1..r4.
    *
    * Scale: one per-key sort window carrying three small lag counters —
    * the per-entity-series contract; state is O(1) per row. */
  def westernElectric(data: DataFrame, keyCol: String, ordCol: String,
      valCol: String): DataFrame = {
    val v = col(valCol).cast("double")
    val base = data.where(v.isNotNull)
      .select(col(keyCol).as("key"), col(ordCol).cast("long").as("seq"),
        v.as("value"), fp(v).as("_fp"))
    val st = base.groupBy(col("key"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("_n"),
        sum(col("_fp").cast("decimal(38,0)")).as("_s"),
        sum((col("_fp").cast("decimal(38,0)") *
          col("_fp").cast("decimal(38,0)")).cast("decimal(38,0)")).as("_q"))
      .select(col("key"),
        (col("_s").cast("double") / col("_n").cast("double") / 1e4).as("_mu"),
        sqrt((col("_q").cast("double") -
          col("_s").cast("double") * col("_s").cast("double") /
            col("_n").cast("double")) /
          (col("_n").cast("double") - 1)).as("_sd0"))
      .withColumn("_sd", col("_sd0") / 1e4)
    val z = base.join(broadcast(st), "key")
      .withColumn("z", (col("value") - col("_mu")) / col("_sd"))
      .withColumn("_side",
        when(col("z") > 0, 1).when(col("z") < 0, -1).otherwise(0))
    val w = Window.partitionBy(col("key")).orderBy(col("seq").asc)
    def lastK(c: Column, k: Int) =
      sum(c).over(w.rowsBetween(-(k - 1), 0))
    z.withColumn("r1", abs(col("z")) > 3.0)
      .withColumn("r2",
        (col("z") > 2.0 &&
          lastK(when(col("z") > 2.0, 1).otherwise(0), 3) >= 2) ||
        (col("z") < -2.0 &&
          lastK(when(col("z") < -2.0, 1).otherwise(0), 3) >= 2))
      .withColumn("r3",
        (col("z") > 1.0 &&
          lastK(when(col("z") > 1.0, 1).otherwise(0), 5) >= 4) ||
        (col("z") < -1.0 &&
          lastK(when(col("z") < -1.0, 1).otherwise(0), 5) >= 4))
      .withColumn("r4",
        lastK(col("_side"), 8) === 8 || lastK(col("_side"), 8) === -8)
      .select("key", "seq", "value", "z", "r1", "r2", "r3", "r4")
  }

  /** Process capability per key against fixed spec limits [lsl, usl]:
    * Cp/Cpk use the within-subgroup σ̂ = R̄/d2 (subgroups of `n`),
    * Pp/Ppk the overall sample σ — the Cp≫Pp gap IS the
    * "between-subgroup drift" signal. Output one row per key:
    * key, mu, sigma_within, sigma_overall, cp, cpk, pp, ppk. */
  def capability(data: DataFrame, keyCol: String, ordCol: String,
      valCol: String, lsl: Double, usl: Double, n: Int = 5): DataFrame = {
    require(usl > lsl, s"usl > lsl: $usl <= $lsl")
    val (_, _, _, d2) = shewhart.getOrElse(n,
      throw new IllegalArgumentException(s"subgroup size 2..10: $n"))
    val sg = subgroups(data, keyCol, ordCol, valCol, n)
    val within = sg.groupBy(col("key"))
      .agg((sum((col("_hi") - col("_lo")).cast("decimal(38,0)"))
        .cast("double") / count(lit(1)) / 1e4).as("_rbar"))
      .select(col("key"), (col("_rbar") / d2).as("sigma_within"))
    val v = col(valCol).cast("double")
    val overall = data.where(v.isNotNull)
      .select(col(keyCol).as("key"), fp(v).as("_fp"))
      .groupBy(col("key"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("_n"),
        sum(col("_fp").cast("decimal(38,0)")).as("_s"),
        sum((col("_fp").cast("decimal(38,0)") *
          col("_fp").cast("decimal(38,0)")).cast("decimal(38,0)")).as("_q"))
      .select(col("key"),
        (col("_s").cast("double") / col("_n").cast("double") / 1e4).as("mu"),
        (sqrt((col("_q").cast("double") -
          col("_s").cast("double") * col("_s").cast("double") /
            col("_n").cast("double")) /
          (col("_n").cast("double") - 1)) / 1e4).as("sigma_overall"))
    overall.join(within, "key")
      .withColumn("cp", lit(usl - lsl) / (lit(6.0) * col("sigma_within")))
      .withColumn("cpk",
        least(lit(usl) - col("mu"), col("mu") - lit(lsl)) /
          (lit(3.0) * col("sigma_within")))
      .withColumn("pp", lit(usl - lsl) / (lit(6.0) * col("sigma_overall")))
      .withColumn("ppk",
        least(lit(usl) - col("mu"), col("mu") - lit(lsl)) /
          (lit(3.0) * col("sigma_overall")))
      .select("key", "mu", "sigma_within", "sigma_overall", "cp", "cpk",
        "pp", "ppk")
  }
}
