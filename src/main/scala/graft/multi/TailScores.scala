package graft.multi

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-tail multivariate outlier scorers (engine additions):
  * ECOD (Li et al., "ECOD: Unsupervised Outlier Detection Using
  * Empirical Cumulative Distribution Functions", TKDE 2022) and HBOS
  * (Goldstein & Dengel 2012). Both are the modern parameter-light
  * complements to the reference's density family (beymani's
  * NeighborhoodDensity / LOF) — no pairwise distances, no trees: one
  * window pass (ECOD) or one histogram aggregate (HBOS) per dimension,
  * which is exactly what survives a 100 TB scoring run.
  */
object TailScores {

  /** ECOD: per dimension, the left/right empirical tail probabilities
    * F(x) = P(X ≤ x) and P(X ≥ x) become per-dim outlier factors
    * −ln F; the final score is the max of the three dimension-sums
    * (left, right, and the skewness-directed automatic choice), per the
    * paper's §4 aggregation.
    *
    * Determinism: cume_dist is an exact integer ratio on both engines
    * (rows ≤ current incl. peers / n — tie-stable by definition); −ln
    * of it relies on the established libm parity. The skew *sign* per
    * (key, dim) is computed exactly: values quantize to 1dp longs and
    * the third central moment's sign replays as
    * n²Σx³ − 3nΣxΣx² + 2(Σx)³ over decimal(38,0) sums (DuckDB:
    * HUGEINT) — an exact integer whose sign both engines agree on.
    * 1dp keeps the cubes inside 38 digits at |x| ≤ ~10⁵, n ≤ ~10⁷.
    *
    * Scale: one shuffle on the keys; all 2·d cume_dist windows share
    * that partitioning (d in-partition sorts, no extra exchange). The
    * skew model is key-sized and broadcast back. Parallelism is key
    * cardinality — the documented window-family ceiling, inherent to
    * per-population ECDFs. Null policy: rows with any null attr are
    * excluded (ECDF over complete rows only). */
  def ecod(data: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
      threshold: Double): DataFrame = {
    require(attrCols.nonEmpty, "ecod needs at least one attribute")
    val keyed = data.where(attrCols.map(col(_).isNotNull).reduce(_ && _))

    // exact third-moment sign per (key, dim), 1dp fixed-point
    val skewAggs = attrCols.flatMap { a =>
      val x = graft.core.fixedPointLong(col(a), 1).cast("decimal(38,0)")
      Seq(sum(x).as(s"${a}_s1"),
        sum((x * x).cast("decimal(38,0)")).as(s"${a}_s2"),
        sum((x * x * x).cast("decimal(38,0)")).as(s"${a}_s3"))
    }
    val skew = keyed.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("decimal(38,0)").as("n_"), skewAggs: _*)
    val skewSigns = attrCols.foldLeft(skew) { (df, a) =>
      val m3n3 = col("n_") * col("n_") * col(s"${a}_s3") -
        lit(3) * col("n_") * col(s"${a}_s1") * col(s"${a}_s2") +
        lit(2) * col(s"${a}_s1") * col(s"${a}_s1") * col(s"${a}_s1")
      df.withColumn(s"${a}_neg", m3n3 < 0)
    }.select(keyCols.map(col) ++ attrCols.map(a => col(s"${a}_neg")): _*)

    val withTails = attrCols.foldLeft(
      keyed.join(broadcast(skewSigns), keyCols)) { (df, a) =>
      val asc = Window.partitionBy(keyCols.map(col): _*).orderBy(col(a).asc)
      val desc = Window.partitionBy(keyCols.map(col): _*).orderBy(col(a).desc)
      df.withColumn(s"${a}_ol", -log(cume_dist().over(asc)))
        .withColumn(s"${a}_or", -log(cume_dist().over(desc)))
    }
    val sl = attrCols.map(a => col(s"${a}_ol")).reduce(_ + _)
    val sr = attrCols.map(a => col(s"${a}_or")).reduce(_ + _)
    val sa = attrCols.map(a =>
      when(col(s"${a}_neg"), col(s"${a}_ol")).otherwise(col(s"${a}_or")))
      .reduce(_ + _)
    withTails
      .withColumn("score", greatest(sl, sr, sa))
      .withColumn("tag", graft.core.label(col("score"), lit(threshold)))
      .drop(attrCols.flatMap(a => Seq(s"${a}_ol", s"${a}_or", s"${a}_neg")): _*)
  }

  /** HBOS: per dimension, a fixed-width histogram over the scoring
    * population itself; score = Σ_d −ln(density of the record's bin) —
    * log-scale so dimensions with many bins don't drown the rest
    * (Goldstein & Dengel 2012, eq. 1, with uniform bin width).
    *
    * Determinism: bin = floor(x/w) exactly as the histogram-fit family
    * computes it; density is the exact integer ratio cnt/n; −ln rides
    * libm parity; the cross-dim sum is a fixed left-associated chain.
    *
    * Scale: one hash aggregate per dimension (map-side combined) →
    * bin-sized models, broadcast back onto the data — the same
    * fit-then-broadcast-score shape as the reference's histogram
    * predictor (EstimatedProbabilityBasedPredictor), generalized to
    * d dimensions in one pass over the data. */
  def hbos(data: DataFrame, keyCols: Seq[String], attrs: Seq[(String, Double)],
      threshold: Double): DataFrame = {
    require(attrs.nonEmpty, "hbos needs at least one (attr, width)")
    attrs.foreach { case (a, w) =>
      require(w > 0, s"hbos bin width for '$a' must be > 0, got $w " +
        "(floor(x/w) on a non-positive width silently collapses bins)")
    }
    val keyed = data.where(attrs.map { case (a, _) => col(a).isNotNull }
      .reduce(_ && _))
    val n = keyed.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n_"))
    val scored = attrs.foldLeft(keyed.join(broadcast(n), keyCols)) {
      case (df, (a, w)) =>
        val bin = floor(col(a) / lit(w)).cast("long")
        val hist = keyed
          .groupBy((keyCols.map(col) :+
            floor(col(a) / lit(w)).cast("long").as(s"${a}_bin")): _*)
          .agg(count(lit(1)).as(s"${a}_cnt"))
        df.withColumn(s"${a}_bin", bin)
          .join(broadcast(hist), keyCols :+ s"${a}_bin")
          .withColumn(s"${a}_o",
            -log(col(s"${a}_cnt").cast("double") / col("n_")))
    }
    val total = attrs.map { case (a, _) => col(s"${a}_o") }.reduce(_ + _)
    scored
      .withColumn("score", total)
      .withColumn("tag", graft.core.label(col("score"), lit(threshold)))
      .drop(attrs.flatMap { case (a, _) =>
        Seq(s"${a}_bin", s"${a}_cnt", s"${a}_o") }: _*)
      .drop("n_")
  }

  /** Generalized extreme studentized deviate (ESD) test, per key
    * (Rosner 1983; NIST/SEMATECH e-Handbook §1.3.5.17) — the classic
    * "up to k outliers" test the reference's threshold family
    * (StatsBasedOutlierPredictor) approximates with a fixed z cut.
    * Grubbs' single-outlier test is exactly `maxOutliers = 1`.
    *
    * Round i (1..k): over the not-yet-removed rows of each key, compute
    * mean/std, take R_i = max |x−mean|/std, remove that row. The final
    * ESD rule: with caller-supplied critical values λ_i, the outlier
    * count is the LARGEST i with R_i > λ_i, and every removed row up to
    * that round is tagged 'O' (λ comes from the t-quantile formula the
    * caller evaluates offline — neither engine ships an inverse-t).
    *
    * Determinism: the arg-max row per round is selected by the exact
    * integer |n·x_fp − Σx_fp| (x at 4dp fixed point, decimal(38,0) /
    * HUGEINT sums) — arg-max of |x−mean| without touching a double, so
    * both engines remove the same row even on near-ties; genuine ties
    * break on the smaller id. R_i itself is the double finish over
    * those exact integers (both engines evaluate the same expression on
    * the same integers → bit-identical).
    *
    * Scale: k rounds of (hash agg → broadcast join → per-key window →
    * anti-join); state per round is key-sized, the window rides the
    * one shuffle on `keyCols`, and k is a small constant — cost is
    * k scans, not k shuffles of growing frames. Null values excluded. */
  def esd(data: DataFrame, keyCols: Seq[String], idCol: String,
      valCol: String, maxOutliers: Int, critical: Seq[Double]): DataFrame = {
    require(maxOutliers >= 1 && critical.length == maxOutliers,
      s"need one critical value per round: k=$maxOutliers, " +
        s"given ${critical.length}")
    val v = col(valCol).cast("double")
    // ONE full-data aggregation + ONE double-ranking window; the k
    // rounds then run over the ≤4k-per-key CANDIDATE frame with the
    // round sums maintained by subtraction (exact decimals). The round
    // arg-max of |x − mean| is always at the remaining min or max
    // value, and each removal consumes at most one candidate from one
    // end, so 2k per end always covers all k rounds — the rewrite is
    // output-identical to the per-round full rescan (same oracle gates
    // it) while the per-round work drops from data-sized to key-sized.
    // (q301 fed the full seasonalDecompose in here: the old loop
    // re-executed it ~2× per round.)
    val cap = 2 * maxOutliers
    // eager cut: sums0, the candidate windows and every round's st all
    // re-read this frame — without the checkpoint an expensive upstream
    // (q301's seasonalDecompose) re-executes once per consumer
    val base = data.where(v.isNotNull)
      .select(keyCols.map(col) :+ col(idCol).as("_id") :+ v.as("_v") :+
        graft.core.fixedPointLong(v, 4).cast("decimal(38,0)").as("_fp"): _*)
      .localCheckpoint(true)
    // key-sized; checkpoint so the ONE full-data moment pass runs once —
    // uncached it re-appeared in every round's lazy plan (k data-sized
    // aggregates over the base cache; the gesd advice-r13 fix applied here)
    val sums0 = base.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("decimal(38,0)").as("_n0"),
        sum(col("_fp")).as("_s0"),
        sum((col("_fp") * col("_fp")).cast("decimal(38,0)")).as("_q0"))
      .localCheckpoint(true)
    val wa = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_fp").asc, col("_id").asc)
    val wd = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_fp").desc, col("_id").asc)
    val cand = base
      .withColumn("_ra", row_number().over(wa))
      .withColumn("_rd", row_number().over(wd))
      .where(col("_ra") <= cap || col("_rd") <= cap)
      .drop("_ra", "_rd")
      .localCheckpoint(true)
    var removed: DataFrame = null
    var live = cand
    (1 to maxOutliers).foreach { i =>
      val st =
        if (removed == null)
          sums0.select(keyCols.map(col) :+ col("_n0").as("_n") :+
            col("_s0").as("_s") :+ col("_q0").as("_q"): _*)
        else {
          val rem = removed.groupBy(keyCols.map(col): _*)
            .agg(count(lit(1)).cast("decimal(38,0)").as("_rc"),
              sum(col("_rfp")).as("_rs"),
              sum((col("_rfp") * col("_rfp")).cast("decimal(38,0)"))
                .as("_rq"))
          sums0.join(rem, keyCols, "left")
            .select(keyCols.map(col) :+
              (col("_n0") - coalesce(col("_rc"), lit(0))).as("_n") :+
              (col("_s0") - coalesce(col("_rs"), lit(0))).as("_s") :+
              (col("_q0") - coalesce(col("_rq"), lit(0))).as("_q"): _*)
        }
      val dev = abs(col("_n") * col("_fp") - col("_s"))
      val w = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(dev.desc, col("_id").asc)
      val nD = col("_n").cast("double")
      // std over the round's population, double finish on exact sums
      val std = sqrt((col("_q").cast("double") -
        col("_s").cast("double") * col("_s").cast("double") / nD) /
        (nD - 1)) / 1e4
      val top = live.join(broadcast(st), keyCols)
        .where(col("_n") > 2)
        .withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1)
        .select(keyCols.map(col) :+ lit(i).as("rnd") :+
          col("_id").as("removed_id") :+ col("_v").as("value") :+
          col("_fp").as("_rfp") :+
          ((dev.cast("double") / nD / 1e4) / std).as("r_stat") :+
          lit(critical(i - 1)).as("lambda"): _*)
      removed = if (removed == null) top else removed.union(top)
      live = live.join(
        top.select(keyCols.map(col) :+ col("removed_id").as("_id"): _*),
        keyCols :+ "_id", "left_anti")
    }
    removed = removed.drop("_rfp")
    // ESD decision: outliers = rows of every round up to the LAST round
    // whose R exceeded its λ (key-sized window over ≤ k rows per key)
    val wk = Window.partitionBy(keyCols.map(col): _*)
    val lastSig = max(when(col("r_stat") > col("lambda"), col("rnd")))
      .over(wk)
    removed.withColumn("tag",
      when(col("rnd") <= coalesce(lastSig, lit(0)), "O").otherwise("N"))
  }

  /** Gumbel block-maxima fit per key (EVT, the block-maxima face of
    * [[potGpd]]'s peaks-over-threshold): per-block maxima (exact
    * fixed-point order statistics), method-of-moments Gumbel parameters
    * β = s·√6/π and μ = m̄ − γ·β (Euler–Mascheroni γ), and the
    * T-block return level μ − β·ln(−ln(1 − 1/T)) — "the largest value
    * expected once per T blocks", the capacity-planning number a
    * per-point quantile can't give. Moments are exact sums over the
    * block-max longs; the constants are fixed literals both engines
    * share. One row per key: key, blocks, mu, beta, return_level. */
  def gumbelBlockMax(data: DataFrame, keyCols: Seq[String],
      blockCol: Column, valCol: String, returnBlocks: Int = 30)
      : DataFrame = {
    require(returnBlocks >= 2, s"returnBlocks >= 2: $returnBlocks")
    val v = col(valCol).cast("double")
    val bm = data.where(v.isNotNull)
      .groupBy((keyCols.map(col) :+ blockCol.as("_b")): _*)
      .agg(max(graft.core.fixedPointLong(v, 4)).as("_m"))
    val g = bm.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("blocks"),
        sum(col("_m")).as("_s"),
        sum((col("_m").cast("decimal(38,0)") *
          col("_m").cast("decimal(38,0)")).cast("decimal(38,0)")).as("_q"))
      .where(col("blocks") >= 3)
    val nD = col("blocks").cast("double")
    val mean = col("_s").cast("double") / nD / 1e4
    val sd = sqrt((col("_q").cast("double") -
      col("_s").cast("double") * col("_s").cast("double") / nD) /
      (nD - 1)) / 1e4
    val beta = sd * math.sqrt(6.0) / math.Pi
    val mu = mean - lit(0.5772156649015329) * beta
    val rl = mu - beta * log(-log(lit(1.0) - lit(1.0) / returnBlocks))
    g.withColumn("mu", mu).withColumn("beta", beta)
      .withColumn("return_level", rl)
      .select(keyCols.map(col) :+ col("blocks") :+ col("mu") :+
        col("beta") :+ col("return_level"): _*)
  }

  /** Conditional value-at-risk (expected shortfall) per key: the exact
    * P-quantile order statistic (value histogram — min value whose
    * cumulative count reaches ⌈p·n⌉) and the mean of everything at or
    * above it, from exact sums of the tail longs. One row per key:
    * key, n, var_p, cvar_p, tail_n — "when it's bad, HOW bad", the
    * tail-mass number a plain quantile hides. */
  def cvar(data: DataFrame, keyCols: Seq[String], valCol: String,
      p: Double = 0.95): DataFrame = {
    require(p > 0 && p < 1, s"p in (0,1): $p")
    val v = col(valCol).cast("double")
    val base = data.where(v.isNotNull)
      .select(keyCols.map(col) :+
        graft.core.fixedPointLong(v, 4).as("_v"): _*)
    val h = base.groupBy((keyCols.map(col) :+ col("_v")): _*)
      .agg(count(lit(1)).as("_ct"))
    val cw = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kw = Window.partitionBy(keyCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val q = h
      .withColumn("_cum", sum(col("_ct")).over(cw))
      .withColumn("_n", sum(col("_ct")).over(kw))
      .groupBy(keyCols.map(col): _*)
      .agg(max(col("_n")).as("n"),
        min(when(col("_cum") >=
          ceil(lit(p) * col("_n")).cast("long"), col("_v"))).as("_vp"))
    val tail = base.join(
      q.select((keyCols.map(col) :+ col("_vp")): _*), keyCols)
      .where(col("_v") >= col("_vp"))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("tail_n"), sum(col("_v")).as("_ts"))
    q.join(tail, keyCols)
      .withColumn("var_p", col("_vp").cast("double") / 1e4)
      .withColumn("cvar_p", col("_ts").cast("double") /
        col("tail_n").cast("double") / 1e4)
      .select(keyCols.map(col) :+ col("n") :+ col("var_p") :+
        col("cvar_p") :+ col("tail_n"): _*)
  }

  /** Peaks-over-threshold with a generalized-Pareto tail fit (EVT;
    * Pickands–Balkema–de Haan) — the principled version of the
    * reference's extreme-value scorer (beymani extremeValueProbablity,
    * which assumes a normal tail). Per key: the threshold u is the exact
    * order statistic leaving ~`tailFrac·n` exceedances; the GPD shape ξ
    * and scale σ come from the method of moments over exceedances
    * y = x−u (ξ = (1−ȳ²/s²)/2, σ = ȳ(ȳ²/s²+1)/2; Hosking & Wallis
    * 1987 eq. 8); each exceedance's tail probability is
    * p = (n_u/n)·(1+ξy/σ)^(−1/ξ) and score = −ln p. Rows at or below u
    * score 0/'N' so output rows = input rows.
    *
    * Determinism: u is selected by exact integer ordering (4dp fixed
    * point, ties on id); ȳ/s² are double finishes over decimal(38,0) /
    * HUGEINT sums of exact exceedance longs; the power law is written as
    * exp(k·ln(·)) on BOTH engines so the expression trees are identical
    * under libm parity. Support edge: 1+ξy/σ ≤ 0 (beyond the fitted
    * tail's endpoint, ξ<0) or a degenerate fit (s²=0, <2 exceedances)
    * scores the documented cap 999.0 / 0.0.
    *
    * Scale: one shuffle on the keys; the order statistic rides it as a
    * window; the GPD model is key-sized and broadcast back. No pairwise
    * work — this is fit-then-broadcast-score, the same shape as the
    * z-score flagship. */
  def potGpd(data: DataFrame, keyCols: Seq[String], idCol: String,
      valCol: String, tailFrac: Double, threshold: Double): DataFrame = {
    require(tailFrac > 0 && tailFrac < 0.5, s"tailFrac in (0,0.5): $tailFrac")
    val v = col(valCol).cast("double")
    val base = data.where(v.isNotNull)
      .withColumn("_fp", graft.core.fixedPointLong(v, 4))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_fp").desc, col(idCol).asc)
    val ranked = base
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1))
        .over(Window.partitionBy(keyCols.map(col): _*)))
    // n_u = floor(tailFrac·n) clamped to ≥2; u = (n_u+1)-th largest
    val nu = greatest(floor(lit(tailFrac) * col("_n")).cast("long"), lit(2L))
    val uRow = ranked.where(col("_rn") === nu + 1)
      .select(keyCols.map(col) :+ col("_fp").as("_ufp"): _*)
    val joined = ranked.join(broadcast(uRow), keyCols.toSeq, "left")
      .withColumn("_yfp", col("_fp") - col("_ufp"))
    // GPD MoM over exceedances (strictly above u), exact integer sums
    val exc = joined.where(col("_yfp") > 0)
    val fit = exc.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("decimal(38,0)").as("_m"),
        sum(col("_yfp").cast("decimal(38,0)")).as("_s1"),
        sum((col("_yfp").cast("decimal(38,0)") *
          col("_yfp").cast("decimal(38,0)")).cast("decimal(38,0)")).as("_s2"))
    val mD = col("_m").cast("double")
    val mean = col("_s1").cast("double") / mD / 1e4
    val varS = (col("_s2").cast("double") -
      col("_s1").cast("double") * col("_s1").cast("double") / mD) /
      (mD - 1) / 1e8
    val ratio = mean * mean / varS
    val model = fit.where(col("_m") >= 2)
      .withColumn("_xi", (lit(1.0) - ratio) / 2)
      .withColumn("_sigma", mean * (ratio + lit(1.0)) / 2)
      .withColumn("_ok", varS > 0)
      .select(keyCols.map(col) ++
        Seq(col("_m"), col("_xi"), col("_sigma"), col("_ok")): _*)
    val y = col("_yfp").cast("double") / 1e4
    val support = lit(1.0) + col("_xi") * y / col("_sigma")
    val tailP = (col("_m").cast("double") / col("_n")) *
      exp((lit(-1.0) / col("_xi")) * log(support))
    // missing model (key too small: n<3 or <2 exceedances) → 'I' rows,
    // per the core tag contract — left joins keep every input row
    val score = when(col("_ufp").isNull || col("_m").isNull, lit(null)
        .cast("double"))
      .when(col("_yfp") <= 0, lit(0.0))
      .when(!col("_ok") || support <= 0, lit(999.0))
      .otherwise(-log(tailP))
    joined.join(broadcast(model), keyCols.toSeq, "left")
      .withColumn("score", score)
      .withColumn("tag",
        when(col("score").isNull, "I")
          .when(col("_yfp") > 0 && score > threshold, "O").otherwise("N"))
      .withColumn("u", col("_ufp").cast("double") / 1e4)
      .withColumn("xi", col("_xi"))
      .withColumn("sigma", col("_sigma"))
      .drop("_fp", "_rn", "_n", "_ufp", "_yfp", "_m", "_xi", "_sigma", "_ok")
  }

  /** Hill tail-index estimator (Hill '75): over the top-k order
    * statistics per key, α̂ = k / Σ_{i≤k} ln(x_(i)/x_(k+1)) — the
    * "how heavy is this tail really" companion to [[potGpd]]'s full GPD
    * fit (α ≈ 1/ξ; Hill needs no moment assumptions and one pass over
    * the tail). Keys with fewer than k+1 positive values are skipped.
    * Output per key: keyCols…, k, x_thresh, alpha.
    *
    * Determinism: ranks break ties on the id; the log-ratio terms
    * freeze at 8dp before the per-key long sum. Scale: one rank window
    * PARTITIONED by key, work bounded by k+1 rows per key after it. */
  def hillTail(data: DataFrame, keyCols: Seq[String], idCol: String,
      valCol: String, k: Int = 50): DataFrame = {
    require(k >= 2, s"k >= 2: $k")
    import org.apache.spark.sql.expressions.Window
    val x = col(valCol).cast("double")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_x").desc, col(idCol).asc)
    val top = data.where(x.isNotNull && x > 0)
      .select((keyCols.map(col) :+ col(idCol) :+ x.as("_x")): _*)
      .withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= k + 1)
    val thresh = top.where(col("_rk") === k + 1)
      .select((keyCols.map(col) :+ col("_x").as("_xt")): _*)
    top.where(col("_rk") <= k)
      .join(thresh, keyCols)
      .groupBy(keyCols.map(col): _*)
      .agg(max(col("_xt")).as("x_thresh"),
        sum(graft.core.fixedPointLong(log(col("_x") / col("_xt")), 8))
          .as("_s8"))
      .select((keyCols.map(col) :+ lit(k.toLong).as("k") :+
        col("x_thresh") :+
        when(col("_s8") > 0,
          lit(k.toDouble) / (col("_s8").cast("double") / 1e8))
          .otherwise(lit(0.0)).as("alpha")): _*)
  }

  /** Lorenz/Gini concentration audit per key — how unevenly a weight
    * (token mass, event counts, spend) is spread over members (sources,
    * users): Gini = (2·Σᵢ i·wᵢ − (n+1)·T) / (n·T) over the
    * ascending-sorted member weights (the exact discrete form), plus
    * the top-member and top-10%-of-members shares. The
    * "is one source/user dominating the corpus" number a curation
    * pipeline reads next to the temperature-mix and quota operators.
    *
    * Determinism: member weights sum as 6dp fixed-point longs, the
    * rank walk orders by (weight, member) — total order — and
    * Σ i·wᵢ accumulates in decimal(38,0), so the Gini expression is
    * one float division over exact integers.
    *
    * Scale: one hash aggregate to the (key, member) frame, one
    * rank window per key over it — parallelism is member cardinality,
    * the per-key ECDF-window family's documented ceiling; the final
    * roll-up is key-sized. Output: keyCols…, members, total, gini,
    * top1_share, top10pct_share. */
  def concentration(data: DataFrame, keyCols: Seq[String],
      memberCol: String, weightCol: String): DataFrame = {
    val keyc = keyCols.map(col)
    val byMember = data
      .where(col(weightCol).isNotNull)
      .groupBy(keyc :+ col(memberCol).as("_m"): _*)
      .agg(sum(graft.core.fixedPointLong(col(weightCol).cast("double"), 6))
        .as("_w6"))
    val w = Window.partitionBy(keyc: _*)
      .orderBy(col("_w6").asc, col("_m").asc)
    val ranked = byMember
      .withColumn("_i", row_number().over(w).cast("long"))
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val agg = ranked.groupBy(keyc: _*)
      .agg(count(lit(1)).as("members"),
        sum(d38(col("_w6"))).as("_t"),
        sum(d38(col("_i")) * d38(col("_w6"))).as("_s"),
        max(col("_w6")).as("_max"))
    val topCut = ranked
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(keyc: _*)))
      .where(col("_i") > col("_n") -
        ceil(col("_n").cast("double") * 0.1).cast("long"))
      .groupBy(keyc: _*).agg(sum(d38(col("_w6"))).as("_top10"))
    agg.join(topCut, keyCols)
      .withColumn("total", col("_t").cast("double") / 1e6)
      .withColumn("gini",
        when(col("_t") > 0 && col("members") > 1,
          (lit(2.0) * col("_s").cast("double") -
            (col("members") + 1L).cast("double") * col("_t").cast("double")) /
            (col("members").cast("double") * col("_t").cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("top1_share",
        when(col("_t") > 0,
          col("_max").cast("double") / col("_t").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("top10pct_share",
        when(col("_t") > 0,
          col("_top10").cast("double") / col("_t").cast("double"))
          .otherwise(lit(0.0)))
      .select(keyc :+ col("members") :+ col("total") :+ col("gini") :+
        col("top1_share") :+ col("top10pct_share"): _*)
  }
}
