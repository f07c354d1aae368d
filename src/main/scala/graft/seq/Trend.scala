package graft.seq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust monotone-trend detectors (engine additions): the Mann–Kendall
  * test (Mann 1945, Kendall 1975) and the Theil–Sen slope estimator
  * (Sen 1968) — the standard nonparametric pair for "is this metric
  * drifting, and how fast" over the same per-key sequences the
  * reference's change-point family watches (beymani ChangePointDetector
  * answers "where did it shift"; these answer "is there a monotone
  * trend at all"). Both are O(m²) in pairs, so both run over a
  * deterministic strided subsample of at most `maxPoints` rows per key:
  * stride s = ceil(n/maxPoints), keep ordinal positions 1, 1+s, 1+2s …
  * — replayable arithmetic, no RNG, and the pair bound is
  * maxPoints²/2 per key regardless of corpus size.
  *
  * Determinism: values quantize to 4dp fixed-point longs; every sign,
  * tie group and slope is integer arithmetic or a double division of
  * identical integers, so both engines order identically; slope/intercept
  * medians are explicit order statistics (avg of the two middles on even
  * counts) with (i,j) tie-breaks, not an engine `median()` whose
  * interpolation could differ.
  *
  * Scale: one shuffle on the keys (the ordinal window rides it), then a
  * per-key self-join whose size is capped by construction; state is
  * key-sized. The subsample cap is the documented accuracy/cost dial —
  * the full-data variant is maxPoints ≥ n. */
object Trend {

  /** Ordinal positions + strided keep, shared by both estimators.
    * Output columns: keyCols, `_i` (1-based original ordinal), `_fp`. */
  private def strided(data: DataFrame, keyCols: Seq[String], seqCol: String,
      valCol: String, maxPoints: Int): DataFrame = {
    require(maxPoints >= 3, s"maxPoints >= 3: $maxPoints")
    val v = col(valCol).cast("double")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).asc)
    val kw = Window.partitionBy(keyCols.map(col): _*)
    data.where(v.isNotNull)
      .withColumn("_i", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(kw))
      .withColumn("_s", ceil(col("_n").cast("double") / maxPoints).cast("long"))
      .where((col("_i") - 1) % col("_s") === 0)
      .select(keyCols.map(col) :+ col("_i") :+
        graft.core.fixedPointLong(v, 4).as("_fp"): _*)
  }

  private def pairs(pts: DataFrame, keyCols: Seq[String]): DataFrame = {
    val l = pts.select(keyCols.map(col) :+ col("_i").as("_il") :+
      col("_fp").as("_fl"): _*)
    val r = pts.select(keyCols.map(col) :+ col("_i").as("_ir") :+
      col("_fp").as("_fr"): _*)
    l.join(r, keyCols).where(col("_il") < col("_ir"))
  }

  /** Mann–Kendall: S = Σ_{i<j} sign(x_j − x_i); tie-corrected variance
    * Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18 over tie groups t;
    * Z = (S∓1)/√Var(S) with the continuity correction, 0 when S=0.
    * One row per key: n_used, s_stat, var_s, z_stat, trend ∈
    * {rising, falling, none} at the given z threshold. */
  def mannKendall(data: DataFrame, keyCols: Seq[String], seqCol: String,
      valCol: String, maxPoints: Int = 200, zThreshold: Double = 1.96)
      : DataFrame = {
    val pts = strided(data, keyCols, seqCol, valCol, maxPoints)
    val s = pairs(pts, keyCols).groupBy(keyCols.map(col): _*)
      .agg(sum(signum(col("_fr") - col("_fl")).cast("long")).as("s_stat"))
    // tie groups over the SAME subsample
    val nUsed = pts.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_used"))
    val ties = pts.groupBy((keyCols.map(col) :+ col("_fp")): _*)
      .agg(count(lit(1)).as("_t"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_t") * (col("_t") - 1) *
        (lit(2) * col("_t") + 5)).as("_tc"))
    val n = col("n_used")
    val varS = (n * (n - 1) * (lit(2) * n + 5) - col("_tc"))
      .cast("double") / 18.0
    val z = when(col("s_stat") > 0,
        (col("s_stat") - 1).cast("double") / sqrt(varS))
      .when(col("s_stat") < 0,
        (col("s_stat") + 1).cast("double") / sqrt(varS))
      .otherwise(lit(0.0))
    s.join(nUsed, keyCols).join(ties, keyCols)
      .withColumn("var_s", varS)
      .withColumn("z_stat", z)
      .withColumn("trend",
        when(col("z_stat") > zThreshold, "rising")
          .when(col("z_stat") < -zThreshold, "falling")
          .otherwise("none"))
      .drop("_tc")
  }

  /** Ljung–Box portmanteau test: Q = n(n+2)·Σ_{k=1..h} ρ̂²_k/(n−k) over
    * [[SeqOps.autocorrelation]]'s estimates — "is anything left in the
    * residuals", the standard post-forecast whiteness check for the
    * OSA/Holt/AR scorer family (compare Q against the χ²_h quantile the
    * caller supplies offline, like ESD's λ).
    *
    * Determinism: ρ̂ is frozen at 6dp (the PACF device); the h-term sum
    * is an ordered left fold by lag (sort_array+aggregate vs
    * list ORDER BY — the verified-sequential pair), so no unordered
    * double sum. Keys with any NULL ρ̂ (series shorter than maxLag)
    * are dropped.
    *
    * Scale: the ACF lag-window pass is the whole cost; the fold runs on
    * key×h rows. */
  def ljungBox(data: DataFrame, keyCols: Seq[String], seqCol: String,
      valCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag >= 1: $maxLag")
    val acf = SeqOps.autocorrelation(data, keyCols, seqCol, valCol,
      1 to maxLag)
    val nn = data.where(col(valCol).isNotNull)
      .groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
    val rho6 = graft.core.fixedPointLong(col("ac"), 6).cast("double") / 1e6
    val term = rho6 * rho6 / (col("n") - col("lag"))
    val folded = acf.join(nn, keyCols)
      .where(col("ac").isNotNull)
      .withColumn("_t", term)
      .groupBy(keyCols.map(col): _*)
      .agg(first(col("n")).as("n"), count(lit(1)).as("h"),
        sort_array(collect_list(struct(col("lag"), col("_t")))).as("_a"))
      .where(col("h") === maxLag)
      .withColumn("_s", aggregate(col("_a"), lit(0.0),
        (acc, x) => acc + x("_t")))
    folded
      .withColumn("q_stat",
        col("n").cast("double") * (col("n").cast("double") + 2) * col("_s"))
      .select(keyCols.map(col) ++
        Seq(col("n"), col("h"), col("q_stat")): _*)
  }

  /** Hodges–Lehmann one-sample estimator: the median of the Walsh
    * averages (x_i+x_j)/2 over i ≤ j — the pseudo-median, the robust
    * location estimate the sign-rank test inverts (30%-breakdown,
    * ~0.96 efficiency vs the mean at the gaussian; the plain median's
    * robust-location sibling with better efficiency). Same strided
    * subsample and explicit-order-statistic median as [[theilSen]];
    * Walsh sums stay exact longs (2× the 4dp scale) until the finish.
    * One row per key: n_used, n_walsh, hl. */
  def hodgesLehmann(data: DataFrame, keyCols: Seq[String], seqCol: String,
      valCol: String, maxPoints: Int = 200): DataFrame = {
    val pts = strided(data, keyCols, seqCol, valCol, maxPoints)
    val l = pts.select(keyCols.map(col) :+ col("_i").as("_il") :+
      col("_fp").as("_fl"): _*)
    val r = pts.select(keyCols.map(col) :+ col("_i").as("_ir") :+
      col("_fp").as("_fr"): _*)
    val walsh = l.join(r, keyCols).where(col("_il") <= col("_ir"))
      .withColumn("_w", col("_fl") + col("_fr"))
    val ws = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_w").asc, col("_il").asc, col("_ir").asc)
    val kw = Window.partitionBy(keyCols.map(col): _*)
    val nUsed = pts.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_used"))
    walsh
      .withColumn("_rn", row_number().over(ws).cast("long"))
      .withColumn("_m", count(lit(1)).over(kw))
      .where(col("_rn") === floor((col("_m") + 1) / 2).cast("long") ||
        col("_rn") === floor(col("_m") / 2).cast("long") + 1)
      .groupBy(keyCols.map(col): _*)
      .agg(first(col("_m")).as("n_walsh"),
        (avg(col("_w")) / 2e4).as("hl"))
      .join(nUsed, keyCols)
  }

  /** Theil–Sen: slope = median over pairs of (x_j−x_i)/(j−i) against the
    * ordinal position; intercept = median over points of x_i − slope·i.
    * One row per key: n_used, n_pairs, slope, intercept. */
  def theilSen(data: DataFrame, keyCols: Seq[String], seqCol: String,
      valCol: String, maxPoints: Int = 200): DataFrame = {
    val pts = strided(data, keyCols, seqCol, valCol, maxPoints)
    val sl = pairs(pts, keyCols)
      .withColumn("_sl", (col("_fr") - col("_fl")).cast("double") /
        ((col("_ir") - col("_il")).cast("double") * 1e4))
    // explicit median: order by (slope, il, ir); avg of rows ⌈m/2⌉, ⌊m/2⌋+1
    val ws = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_sl").asc, col("_il").asc, col("_ir").asc)
    val kw = Window.partitionBy(keyCols.map(col): _*)
    val med = sl
      .withColumn("_rn", row_number().over(ws).cast("long"))
      .withColumn("_m", count(lit(1)).over(kw))
      // integer middles: Column./ on longs is DOUBLE division, so floor
      .where(col("_rn") === floor((col("_m") + 1) / 2).cast("long") ||
        col("_rn") === floor(col("_m") / 2).cast("long") + 1)
      .groupBy(keyCols.map(col): _*)
      .agg(avg(col("_sl")).as("slope"), first(col("_m")).as("n_pairs"))
    // intercept: median of residuals at the fitted slope, same device
    val res = pts.join(broadcast(med), keyCols)
      .withColumn("_r",
        col("_fp").cast("double") / 1e4 - col("slope") * col("_i"))
    val wr = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_r").asc, col("_i").asc)
    res
      .withColumn("_rn", row_number().over(wr).cast("long"))
      .withColumn("_c", count(lit(1)).over(kw))
      .where(col("_rn") === floor((col("_c") + 1) / 2).cast("long") ||
        col("_rn") === floor(col("_c") / 2).cast("long") + 1)
      .groupBy(keyCols.map(col): _*)
      .agg(first(col("slope")).as("slope"),
        first(col("n_pairs")).as("n_pairs"),
        first(col("_c")).as("n_used"),
        avg(col("_r")).as("intercept"))
  }
}
