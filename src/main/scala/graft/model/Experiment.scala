package graft.model

import graft.core.fixedPointLong
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential / Bayesian experiment-analysis operators (engine
  * additions beside srmCheck / cuped / sprt / powerMde): the mixture
  * SPRT's always-valid p-value process, the Beta-posterior Bayesian
  * A/B readout, and the Diebold-Mariano forecast-accuracy comparison.
  *
  * Determinism: cumulative sums ride 4dp fixed-point longs (exact,
  * order-free); sqrt/exp/ln ride the established libm-parity
  * assumption; the normal CDF uses the shared A&S-7.1.26 erf
  * polynomial (graft.multi.Proximity.erfPos). */
object Experiment {

  private def fp4(c: Column): Column = fixedPointLong(c, 4)
  private def fp8(c: Column): Column =
    fixedPointLong(c, 8).cast("decimal(38,0)")

  /** Φ(x) for any sign via the shared erf polynomial. */
  private def phi(x: Column): Column = {
    val e = graft.multi.Proximity.erfPos(abs(x) / math.sqrt(2.0))
    when(x >= 0, lit(0.5) + lit(0.5) * e)
      .otherwise(lit(0.5) - lit(0.5) * e)
  }

  /** Mixture SPRT always-valid p-value process (Johari, Koomen, Pekelis,
    * Walsh, KDD'17 "Peeking at A/B tests") over a PAIRED two-arm stream:
    * rows (key, ord, a, b), H0: E[b−a] = 0, known per-observation
    * variance `sigma2` of each arm, mixture variance `tau2`.
    * ln Λ_n = ½·ln(2σ²/(2σ²+nτ²)) + τ²·n²·δ̄² / (4σ²·(2σ²+nτ²)),
    * p_n = min(1, min_{t≤n} 1/Λ_t) = min(1, exp(−max_{t≤n} ln Λ_t)) —
    * valid at EVERY peek, the fix for the peeking problem
    * fixed-horizon tests have. Λ is reported in LOG form: the raw
    * mixture likelihood ratio overflows past ~n·δ̄² ≈ 700·σ², and at
    * huge magnitudes cross-engine exp parity frays at the last ulp —
    * ln Λ is O(n) and exact; the single exp feeding p lives in [0, 1]
    * where 4dp rounding absorbs ulp noise.
    *
    * Scale: one per-key ordered window pass (cumulative exact 4dp
    * delta sums), no joins. Output: per (key, t): delta_mean,
    * log_lambda, p_always, decided (p ≤ alpha so far). */
  def msprt(pairs: DataFrame, keyCol: String, ordCol: String,
      aCol: String, bCol: String, sigma2: Double, tau2: Double,
      alpha: Double = 0.05): DataFrame = {
    require(sigma2 > 0 && tau2 > 0, "sigma2 and tau2 must be positive")
    val ow = Window.partitionBy(col("key")).orderBy(col("_o").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = col("_t").cast("double")
    val v = lit(2.0 * sigma2) + n * tau2
    val dbar = col("_sd").cast("double") / 1e4 / n
    pairs
      .select(col(keyCol).as("key"), col(ordCol).cast("long").as("_o"),
        fp4(col(bCol).cast("double") - col(aCol).cast("double")).as("_d"))
      .withColumn("_t", count(lit(1)).over(ow))
      .withColumn("_sd", sum(col("_d")).over(ow))
      .withColumn("delta_mean", dbar)
      .withColumn("log_lambda",
        lit(0.5) * log(lit(2.0 * sigma2) / v) +
          lit(tau2) * n * n * col("delta_mean") * col("delta_mean") /
            (lit(4.0 * sigma2) * v))
      .withColumn("p_always",
        least(lit(1.0), exp(-max(col("log_lambda")).over(ow))))
      .withColumn("decided", col("p_always") <= alpha)
      .select(col("key"), col("_t").as("t"), col("delta_mean"),
        col("log_lambda"), col("p_always"), col("decided"))
  }

  /** Bayesian A/B readout on binary outcomes: per key, Beta(1+s, 1+f)
    * posteriors for both arms, P(B > A) via the normal approximation
    * Φ(Δμ/√(v_A+v_B)) with the EXACT rational Beta moments
    * μ = α/(α+β), v = αβ/((α+β)²(α+β+1)) — closed-form from one
    * aggregate, no sampling (the determinism contract rules out Monte
    * Carlo; at experiment-scale counts the normal approximation is
    * inside the erf polynomial's own 1.5e-7).
    *
    * Output per key: n_a, s_a, n_b, s_b, mu_a, mu_b, p_b_beats_a. */
  def bayesianAb(data: DataFrame, keyCols: Seq[String], armCol: String,
      success: Column, armA: String = "A", armB: String = "B")
      : DataFrame = {
    val keys = keyCols.map(col)
    def cnt(arm: String, onlyS: Boolean) = sum(
      when(col(armCol) === arm && (if (onlyS) success else lit(true)), 1L)
        .otherwise(0L))
    def mu(s: Column, n: Column) =
      (s.cast("double") + 1.0) / (n.cast("double") + 2.0)
    def va(s: Column, n: Column) =
      (s.cast("double") + 1.0) * (n.cast("double") - s.cast("double") + 1.0) /
        ((n.cast("double") + 2.0) * (n.cast("double") + 2.0) *
          (n.cast("double") + 3.0))
    data.groupBy(keys: _*)
      .agg(cnt(armA, onlyS = false).as("n_a"),
        cnt(armA, onlyS = true).as("s_a"),
        cnt(armB, onlyS = false).as("n_b"),
        cnt(armB, onlyS = true).as("s_b"))
      .where(col("n_a") > 0 && col("n_b") > 0)
      .withColumn("mu_a", mu(col("s_a"), col("n_a")))
      .withColumn("mu_b", mu(col("s_b"), col("n_b")))
      .withColumn("p_b_beats_a",
        phi((col("mu_b") - col("mu_a")) /
          sqrt(va(col("s_a"), col("n_a")) + va(col("s_b"), col("n_b")))))
      .select(keys :+ col("n_a") :+ col("s_a") :+ col("n_b") :+
        col("s_b") :+ col("mu_a") :+ col("mu_b") :+
        col("p_b_beats_a"): _*)
  }

  /** Diebold-Mariano test (JBES 1995) — do two forecasts of the same
    * series differ in accuracy? Per key over (ord, e1, e2) forecast
    * errors: d_t = e1² − e2² (squared loss), DM = d̄ / √(s/n) with the
    * HAC long-run variance s = γ₀ + 2·Σ_{l≤h} (1 − l/(h+1))·γ_l
    * (Bartlett weights, the neweyWestSlope device), γ_l the lag-l
    * autocovariance of d around d̄. p = 2(1 − Φ(|DM|)).
    *
    * Determinism: d_t is 4dp-frozen; γ_l numerators are exact
    * decimal sums of 8dp-long products; the h-term HAC reduction is a
    * fixed-order fold over l = 0..h.
    *
    * Scale: one per-key sort window producing the h lag columns, one
    * hash aggregate — no self-join; h is a small constant.
    * Output per key: n, d_mean, dm_stat, p_value. */
  def dieboldMariano(data: DataFrame, keyCol: String, ordCol: String,
      e1Col: String, e2Col: String, h: Int = 4): DataFrame = {
    require(h >= 0 && h <= 12, "0 <= h <= 12 lags")
    val w = Window.partitionBy(col("key")).orderBy(col("_o").asc)
    val base = data
      .select(col(keyCol).as("key"), col(ordCol).cast("long").as("_o"),
        (fp4(col(e1Col).cast("double") * col(e1Col).cast("double")) -
          fp4(col(e2Col).cast("double") * col(e2Col).cast("double")))
          .as("_d4"))
    val lagged = (1 to h).foldLeft(base) { case (df, l) =>
      df.withColumn(s"_dl$l", lag(col("_d4"), l).over(w))
    }
    def dec(c: Column) = c.cast("decimal(38,0)")
    val aggs = Seq(count(lit(1)).as("n"), sum(col("_d4")).as("_s")) ++
      (0 to h).map { l =>
        val other = if (l == 0) col("_d4") else col(s"_dl$l")
        sum(when(other.isNotNull, dec(dec(col("_d4")) * dec(other)))
          .otherwise(lit(0L).cast("decimal(38,0)"))).as(s"_g$l")
      }
    val g = lagged.groupBy("key").agg(aggs.head, aggs.tail: _*)
    val nD = col("n").cast("double")
    val dMean = col("_s").cast("double") / 1e4 / nD
    // γ_l = (Σ d_t·d_{t−l})/n/1e8 − d̄²·(n−l)/n   (mean-correction with
    // the exact overlap count; fixed-order fold over l)
    def gamma(l: Int): Column =
      col(s"_g$l").cast("double") / 1e8 / nD -
        col("d_mean") * col("d_mean") * (nD - l) / nD
    val s = (1 to h).foldLeft(gamma(0)) { case (acc, l) =>
      acc + lit(2.0 * (1.0 - l.toDouble / (h + 1))) * gamma(l)
    }
    g.withColumn("d_mean", dMean)
      .withColumn("_lrv", s)
      .withColumn("dm_stat",
        when(col("_lrv") > 0, col("d_mean") / sqrt(col("_lrv") / nD)))
      .withColumn("p_value",
        when(col("dm_stat").isNotNull,
          lit(2.0) * (lit(1.0) - phi(abs(col("dm_stat"))))))
      .select("key", "n", "d_mean", "dm_stat", "p_value")
  }

  /** Two-sided group-sequential boundary constants at α = 0.05
    * (Jennison & Turnbull, Group Sequential Methods, Table 2.1/2.3):
    * the classical fixed-K interim-analysis design — the scheduled-looks
    * complement of [[msprt]]'s always-valid monitoring. */
  private val obfC = Map(1 -> 1.960, 2 -> 1.977, 3 -> 2.004,
    4 -> 2.024, 5 -> 2.040)
  private val pocockC = Map(1 -> 1.960, 2 -> 2.178, 3 -> 2.289,
    4 -> 2.361, 5 -> 2.413)

  /** Group-sequential A/B monitor with O'Brien-Fleming (default) or
    * Pocock boundaries: rows bucket into `looks` equal ord-range interim
    * analyses; at look k the CUMULATIVE Welch z of treated-vs-control
    * compares against the boundary — OBF: C·√(K/k) (hard to cross
    * early, near-nominal at the end), Pocock: constant C. `crossed`
    * marks the look, `decided` carries forward once any look crossed
    * (the stop-early semantics). K ≤ 5 per the constants table.
    *
    * Determinism: per-(key, arm, look) sums are exact 4dp/decimal; the
    * cumulative across looks is a K-row per-key window (bounded by
    * construction); z is a fixed float expression of exact integers.
    * Scale: one hash aggregate to key×2×K rows, everything after is
    * model-sized. Output per (key, look): key, look, n_a, n_b, z,
    * bound, crossed, decided. */
  def groupSequential(data: DataFrame, keyCol: String, ordCol: String,
      armCol: String, valCol: String, looks: Int = 4,
      shape: String = "obf"): DataFrame = {
    require(looks >= 1 && looks <= 5, "1 <= looks <= 5 (constants table)")
    val c = shape match {
      case "obf" => obfC(looks)
      case "pocock" => pocockC(looks)
      case o => throw new IllegalArgumentException(s"shape obf|pocock: $o")
    }
    def dec(x: Column) = x.cast("decimal(38,0)")
    val base = data.where(col(valCol).isNotNull)
      .select(col(keyCol).as("key"), col(ordCol).cast("long").as("_o"),
        col(armCol).cast("boolean").as("_t"),
        fp4(col(valCol).cast("double")).as("_v"))
    val rng = base.groupBy("key")
      .agg(min(col("_o")).as("_o0"), max(col("_o")).as("_o1"))
    // look = equal ord-range bucket 1..K — EXACT integer arithmetic
    // (r12 advice): (o−o0)·K stays in long for K ≤ 5 and ord spans below
    // 1.8e18 (≈58 years of epoch-nanos); a double product would drift
    // bucket boundaries past 2^53. Oracle mirrors with DuckDB `//`.
    val looked = base.join(broadcast(rng), "key")
      .withColumn("look", least(lit(looks.toLong),
        expr(s"((_o - _o0) * $looks) div (_o1 - _o0 + 1)") + 1L))
    val perLook = looked.groupBy(col("key"), col("look"), col("_t"))
      .agg(count(lit(1)).as("_n"), sum(dec(col("_v"))).as("_s"),
        sum(dec(dec(col("_v")) * dec(col("_v")))).as("_q"))
    // cumulative across looks: a K-row window per (key, arm)
    val w = Window.partitionBy(col("key"), col("_t"))
      .orderBy(col("look").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perLook
      .withColumn("_cn", sum(col("_n")).over(w))
      .withColumn("_cs", sum(col("_s")).over(w))
      .withColumn("_cq", sum(col("_q")).over(w))
    def side(t: Boolean, tag: String) = cum.where(col("_t") === t)
      .select(col("key"), col("look"), col("_cn").as(s"n_$tag"),
        col("_cs").as(s"_s$tag"), col("_cq").as(s"_q$tag"))
    val j = side(t = true, "a").join(side(t = false, "b"),
      Seq("key", "look"))
    def mu(s: Column, n: Column) = s.cast("double") / n.cast("double") / 1e4
    def va(s: Column, q: Column, n: Column) = {
      val nD = n.cast("double")
      (q.cast("double") - s.cast("double") * s.cast("double") / nD) /
        (nD - 1.0) / 1e8
    }
    val na = col("n_a"); val nb = col("n_b")
    val z = (mu(col("_sa"), na) - mu(col("_sb"), nb)) /
      sqrt(va(col("_sa"), col("_qa"), na) / na.cast("double") +
        va(col("_sb"), col("_qb"), nb) / nb.cast("double"))
    val bound = shape match {
      case "obf" => lit(c) *
        sqrt(lit(looks.toDouble) / col("look").cast("double"))
      case _ => lit(c)
    }
    val dw = Window.partitionBy(col("key")).orderBy(col("look").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    j.where(na >= 2 && nb >= 2)
      .withColumn("z", z)
      .withColumn("bound", bound)
      .withColumn("crossed", abs(col("z")) > col("bound"))
      .withColumn("decided",
        max(col("crossed").cast("int")).over(dw) === 1)
      .select("key", "look", "n_a", "n_b", "z", "bound", "crossed",
        "decided")
  }
}
