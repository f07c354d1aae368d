package graft.queries

import graft.core._
import graft.model.Diagnostics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries + DuckDB oracles for the distribution-diagnostic and
  * paired-sample test battery (model/Diagnostics.scala). Pairings are
  * constructed deterministically from events: even/odd event_id split
  * per user (McNemar/Wilcoxon), user × event_type cell means
  * (Friedman) — exact fixed-point sum ratios on both engines. */
object DiagQueries {

  private def ev(s: SparkSession, dir: String) = table(s, dir, "events")

  private def fpv = fixedPointLong(col("value").cast("double"), 4)

  /** Per-user paired halves over the even/odd event_id split: exact
    * fixed-point sums → mean doubles (same expression both engines). */
  private def userPairs(s: SparkSession, dir: String): DataFrame = {
    val even = pmod(col("event_id"), lit(2)) === 0
    ev(s, dir).where(col("value").isNotNull)
      .groupBy(col("user_id"))
      .agg(sum(when(even, fpv)).cast("decimal(38,0)").as("_se"),
        sum(when(even, 1L).otherwise(0L)).as("_ne"),
        sum(when(!even, fpv)).cast("decimal(38,0)").as("_so"),
        sum(when(!even, 1L).otherwise(0L)).as("_no"))
      .where(col("_ne") > 0 && col("_no") > 0)
      .select(col("user_id"),
        (col("_se").cast("double") / col("_ne").cast("double") / 1e4)
          .as("x"),
        (col("_so").cast("double") / col("_no").cast("double") / 1e4)
          .as("y"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Jarque–Bera normality per event_type (exact power sums → moments)
    "q316_jarque_bera" -> ((s, dir) =>
      canon(Diagnostics.jarqueBera(ev(s, dir), "event_type", "value"))),
    // Bartlett equal-variance test across event_type groups
    "q317_bartlett" -> ((s, dir) =>
      canon(Diagnostics.bartlett(ev(s, dir), "event_type", "value"))),
    // Wald–Wolfowitz runs test per event_type in event_id order
    "q318_runs_test" -> ((s, dir) =>
      canon(Diagnostics.runsTest(ev(s, dir), "event_type", "event_id",
        "value"))),
    // McNemar: did "user has a >120 spike" flip between the even- and
    // odd-event_id halves of each user's history
    "q319_mcnemar" -> ((s, dir) => {
      val even = pmod(col("event_id"), lit(2)) === 0
      val pr = ev(s, dir).groupBy(col("user_id"))
        .agg((max(when(col("value") > 120.0 && even, 1).otherwise(0)) === 1)
          .as("a"),
          (max(when(col("value") > 120.0 && !even, 1).otherwise(0)) === 1)
            .as("b"))
      canon(Diagnostics.mcnemar(pr, "a", "b"))
    }),
    // Wilcoxon signed-rank over per-user paired half means
    "q320_wilcoxon_signed" -> ((s, dir) =>
      canon(Diagnostics.wilcoxonSignedRank(userPairs(s, dir), "x", "y"))),
    // Page's L: do the type means TREND in alphabetical order across
    // users (the directional Friedman over the same cells)
    "q380_page_trend" -> ((s, dir) =>
      canon(Diagnostics.pageL(userTypeCells(s, dir), "user_id",
        "event_type", "mv"))),
    // Kendall's W: HOW concordant the users' type rankings are
    "q381_kendall_w" -> ((s, dir) =>
      canon(Diagnostics.kendallW(userTypeCells(s, dir), "user_id",
        "event_type", "mv"))),
    // Quade: Friedman weighted by block range (informative users count
    // more)
    "q382_quade" -> ((s, dir) =>
      canon(Diagnostics.quade(userTypeCells(s, dir), "user_id",
        "event_type", "mv"))),
    // Fligner–Killeen: rank/normal-scores equal-scale test (the robust
    // member of the Bartlett/Brown–Forsythe variance battery)
    "q383_fligner" -> ((s, dir) =>
      canon(graft.model.GroupTests.flignerKilleen(ev(s, dir),
        "event_type", "value"))),
    // Friedman rank test: blocks = users, treatments = event_type,
    // observation = user × type mean value
    "q321_friedman" -> ((s, dir) => {
      val cell = ev(s, dir).where(col("value").isNotNull)
        .groupBy(col("user_id"), col("event_type"))
        .agg((sum(fpv).cast("decimal(38,0)").cast("double") /
          count(lit(1)).cast("double") / 1e4).as("mv"))
      canon(Diagnostics.friedman(cell, "user_id", "event_type", "mv"))
    }),
    // cross-correlation at lags −7..7 between the click and error
    // daily-mean series: lead/lag structure between two event streams
    "q325_ccf" -> ((s, dir) => {
      val daily = ev(s, dir).where(col("value").isNotNull)
        .groupBy(col("event_type"),
          expr("ts div 86400000000000").as("day"))
        .agg((sum(fpv).cast("decimal(38,0)").cast("double") /
          count(lit(1)).cast("double") / 1e4).as("mv"))
      canon(graft.model.Assoc.crossCorrelation(daily, "event_type", "day",
        "mv", "click", "error", maxLag = 7))
    }),
    // Cochran's Q: did the ">120 spike" flag rate differ across the 5
    // event types on the same users (k-condition McNemar)
    "q326_cochran_q" -> ((s, dir) => {
      val flags = ev(s, dir).groupBy(col("user_id"), col("event_type"))
        .agg((max(when(col("value") > 120.0, 1).otherwise(0)) === 1)
          .as("flag"))
      canon(Diagnostics.cochranQ(flags, "user_id", "event_type", "flag"))
    }),
    // first-order partial correlation: quantity–price association with
    // discount partialled out (one exact-sum pass over lineitem)
    "q327_partial_corr" -> ((s, dir) =>
      canon(graft.model.Assoc.partialCorr(table(s, dir, "lineitem"),
        "l_quantity", "l_extendedprice", "l_discount"))),
    // Grubbs: the single worst point per event_type, exact-integer argmax
    "q329_grubbs" -> ((s, dir) =>
      canon(Diagnostics.grubbs(ev(s, dir), "event_type", "event_id",
        "value"))),
    // Dixon's Q gap-to-range outlier screen per event_type
    "q330_dixon_q" -> ((s, dir) =>
      canon(Diagnostics.dixonQ(ev(s, dir), "event_type", "value"))),
    // two-sample KS: click vs error value distributions (histogram ECDFs)
    "q331_ks_two_sample" -> ((s, dir) =>
      canon(graft.model.GroupTests.ksTwoSample(ev(s, dir), "event_type",
        "value", "click", "error"))),
    // two-sample Cramér–von Mises: the integral form of q331's sup
    "q378_cvm_two_sample" -> ((s, dir) =>
      canon(graft.model.GroupTests.cvmTwoSample(ev(s, dir), "event_type",
        "value", "click", "error"))),
    // two-sample Anderson–Darling: the tail-weighted member of the trio
    "q379_ad_two_sample" -> ((s, dir) =>
      canon(graft.model.GroupTests.adTwoSample(ev(s, dir), "event_type",
        "value", "click", "error"))),
    // Mood's median test across the 5 event types (pooled exact median)
    "q332_mood_median" -> ((s, dir) =>
      canon(graft.model.GroupTests.moodMedian(ev(s, dir), "event_type",
        "value"))),
    // Hurst exponent per event_type: R/S over dyadic block sizes,
    // log-log OLS slope
    "q333_hurst" -> ((s, dir) =>
      canon(Diagnostics.hurst(ev(s, dir), "event_type", "event_id",
        "value"))),
    // Mann–Whitney U test face (click vs error), tie-corrected z
    "q338_mann_whitney" -> ((s, dir) =>
      canon(graft.model.GroupTests.mannWhitneyU(ev(s, dir), "event_type",
        "value", "click", "error"))),
    // odds/risk ratio: does a >160 error spike raise the chance of a
    // >160 click spike on the same user (2×2, all cells populated at
    // every sf — checked 0.001/0.01/0.1)
    "q339_odds_ratio" -> ((s, dir) => {
      val u = ev(s, dir).groupBy(col("user_id"))
        .agg((max(when(col("event_type") === "error" &&
          col("value") > 160.0, 1).otherwise(0)) === 1).as("e"),
          (max(when(col("event_type") === "click" &&
            col("value") > 160.0, 1).otherwise(0)) === 1).as("o"))
      canon(Diagnostics.oddsRatio(u, "e", "o"))
    }),
    // audience-overlap matrix between event types over (user, day) ids
    "q340_overlap_matrix" -> ((s, dir) =>
      canon(graft.model.Assoc.overlapMatrix(
        ev(s, dir).select(col("event_type"),
          concat(col("user_id").cast("string"), lit(":"),
            expr("ts div 86400000000000").cast("string")).as("uid")),
        "event_type", "uid"))),
    // Kaplan–Meier: time-to-first >250 spike per user, censored at the
    // user's last active day when no spike occurs
    "q341_kaplan_meier" -> ((s, dir) =>
      canon(graft.model.Survival.kaplanMeier(
        survivalSubjects(s, dir), "dur", "event"))),
    // log-rank: do even- and odd-id users spike at the same rate
    "q342_logrank" -> ((s, dir) =>
      canon(graft.model.Survival.logRank(survivalSubjects(s, dir),
        "dur", "event", "grp", "even", "odd"))),
    // two-proportion z + Cohen's h: >160 rate, click vs error
    "q343_two_proportion" -> ((s, dir) =>
      canon(graft.model.GroupTests.twoProportionZ(ev(s, dir), "event_type",
        col("value") > 160.0, "click", "error"))),
    // dominant seasonal period per event_type (ACF arg-max, lags 2..10)
    "q344_dominant_period" -> ((s, dir) =>
      canon(graft.seq.SeqOps.dominantPeriod(ev(s, dir), Seq("event_type"),
        "event_id", "value", maxLag = 10))),
    // Cronbach's α: are the 5 per-type user means one consistent signal
    "q345_cronbach" -> ((s, dir) =>
      canon(Diagnostics.cronbachAlpha(userTypeCells(s, dir), "user_id",
        "event_type", "mv"))),
    // ICC(1,1) over the same subject × item frame
    "q346_icc" -> ((s, dir) =>
      canon(Diagnostics.icc(userTypeCells(s, dir), "user_id",
        "event_type", "mv"))),
    // per-type OLS trend: value ~ day (closed form, exact moments)
    "q347_ols" -> ((s, dir) =>
      canon(graft.model.Assoc.olsFit(
        ev(s, dir).withColumn("day", expr("ts div 86400000000000")),
        "event_type", "day", "value"))),
    // normal Q-Q deciles per event_type (exact order stats × Acklam z)
    "q348_qq" -> ((s, dir) =>
      canon(Diagnostics.qqNormal(ev(s, dir), "event_type", "value"))),
    // turning-point randomness screen per event_type
    "q349_turning_points" -> ((s, dir) =>
      canon(Diagnostics.turningPoints(ev(s, dir), "event_type",
        "event_id", "value"))),
    // von Neumann successive-difference ratio per event_type
    "q350_von_neumann" -> ((s, dir) =>
      canon(Diagnostics.vonNeumann(ev(s, dir), "event_type", "event_id",
        "value"))),
    // Cook's-distance top-5 influential points of the value~day fit
    "q351_ols_influence" -> ((s, dir) =>
      canon(graft.model.Assoc.olsInfluence(
        ev(s, dir).withColumn("day", expr("ts div 86400000000000")),
        "event_type", "event_id", "day", "value", topK = 5))),
    // stratified KM curves: even- vs odd-id users' time-to-spike
    "q352_km_by_group" -> ((s, dir) =>
      canon(graft.model.Survival.kaplanMeierBy(survivalSubjects(s, dir),
        "dur", "event", "grp"))),
    // quantile normalization: every event_type's values remapped onto
    // the pooled distribution (exact ranks + as-of boundary lookup)
    "q355_quantile_norm" -> ((s, dir) =>
      canon(graft.post.PostOps.quantileNormalize(ev(s, dir), "event_type",
        "event_id", "value"))),
    // Gumbel block maxima: 30-day return level of daily maxima per type
    "q376_gumbel" -> ((s, dir) =>
      canon(graft.multi.TailScores.gumbelBlockMax(ev(s, dir),
        Seq("event_type"), expr("ts div 86400000000000"), "value",
        returnBlocks = 30))),
    // CVaR / expected shortfall above the exact P95 per type
    "q377_cvar" -> ((s, dir) =>
      canon(graft.multi.TailScores.cvar(ev(s, dir), Seq("event_type"),
        "value", p = 0.95))),
    // SPRT: sequential defect-rate monitor per event_type (>160 flag)
    "q373_sprt" -> ((s, dir) =>
      canon(graft.model.GroupTests.sprt(ev(s, dir), "event_type",
        "event_id", col("value") > 160.0, p0 = 0.05, p1 = 0.15))),
    // Bland–Altman: do the even/odd per-user half means agree
    "q374_bland_altman" -> ((s, dir) =>
      canon(graft.model.GroupTests.blandAltman(userPairs(s, dir),
        "x", "y"))),
    // Lin's concordance of the same pairs (bias-penalized correlation)
    "q375_ccc" -> ((s, dir) =>
      canon(graft.model.GroupTests.concordance(userPairs(s, dir),
        "x", "y"))),
    // SRM: did the event-type "arms" land on the intended uniform split
    "q368_srm" -> ((s, dir) =>
      canon(graft.model.GroupTests.srmCheck(ev(s, dir), "event_type",
        Map("click" -> 1.0, "error" -> 1.0, "purchase" -> 1.0,
          "signup" -> 1.0, "view" -> 1.0)))),
    // CUPED: how much variance the even-half pre-period removes from
    // the odd-half metric (per-user paired means)
    "q369_cuped" -> ((s, dir) =>
      canon(graft.model.GroupTests.cuped(userPairs(s, dir), "x", "y"))),
    // Pettitt rank change-point per event_type (exact integer U_t)
    "q370_pettitt" -> ((s, dir) =>
      canon(graft.model.GroupTests.pettitt(ev(s, dir), "event_type",
        "event_id", "value"))),
    // k-anonymity / l-diversity release audit: quasi-identifiers =
    // (event_type, day, value decile band), sensitive = user_id
    "q367_k_anonymity" -> ((s, dir) =>
      canon(graft.model.Profiler.kAnonymity(
        ev(s, dir)
          .withColumn("day", expr("ts div 86400000000000"))
          .withColumn("band", floor(col("value") / 50.0)),
        Seq("event_type", "day", "band"), "user_id", k = 5, l = 2))),
    // biweight midcorrelation of value vs the k prop: robust r a wild
    // outlier can't drag (exact median/MAD centers, frozen products)
    "q366_bicor" -> ((s, dir) =>
      canon(graft.model.Assoc.biweightMidcorrelation(
        ev(s, dir).withColumn("k",
          get_json_object(col("props"), "$.k").cast("int").cast("double")),
        "value", "k"))),
    // flatline detector: longest run of the same coarse value band
    // (floor(value/100)) per event_type — the stuck-sensor screen
    "q364_flatline" -> ((s, dir) =>
      canon(Diagnostics.flatline(
        ev(s, dir).withColumn("band", floor(col("value") / 100.0)),
        "event_type", "event_id", "band", minRun = 5))),
    // feed heartbeat: max/median inter-arrival gap + trailing silence
    // vs the corpus watermark, per event_type
    "q365_heartbeat" -> ((s, dir) =>
      canon(Diagnostics.heartbeat(ev(s, dir), "event_type", "ts"))),
    // single-linkage dendrogram over the event-type overlap distances
    // (model-sized input by contract; 1−jaccard of (user,day) sets)
    "q360_single_linkage" -> ((s, dir) => {
      val om = graft.model.Assoc.overlapMatrix(
        ev(s, dir).select(col("event_type"),
          concat(col("user_id").cast("string"), lit(":"),
            expr("ts div 86400000000000").cast("string")).as("uid")),
        "event_type", "uid")
      canon(graft.multi.ClusterScore.singleLinkage(
        om.select(col("ka"), col("kb"),
          (lit(1.0) - col("jaccard")).as("d")), "ka", "kb", "d"))
    }))

  /** user × event_type mean-value cells (exact-sum ratios) — the
    * subject × item frame shared by q321/q345/q346. */
  private def userTypeCells(s: SparkSession, dir: String): DataFrame =
    ev(s, dir).where(col("value").isNotNull)
      .groupBy(col("user_id"), col("event_type"))
      .agg((sum(fpv).cast("decimal(38,0)").cast("double") /
        count(lit(1)).cast("double") / 1e4).as("mv"))

  /** Per-user time-to-event frame shared by q341/q342: duration = days
    * from first activity to the first value>250 spike (event) or to the
    * last active day (censored); grp = user-id parity. */
  private[queries] def survivalSubjects(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"),
        col("value"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("fd"), max(col("day")).as("ld"),
        min(when(col("value") > 250.0, col("day"))).as("hd"))
      .select(
        when(col("hd").isNotNull, col("hd") - col("fd"))
          .otherwise(col("ld") - col("fd")).as("dur"),
        col("hd").isNotNull.as("event"),
        when(pmod(col("user_id"), lit(2)) === 0, "even")
          .otherwise("odd").as("grp"))

  private val fx: String =
    """fx AS (SELECT event_type AS key, event_id, user_id, value,
      |  (CASE WHEN value >= 0 THEN floor(value*10000.0+0.5)
      |        ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS fp
      |  FROM events WHERE value IS NOT NULL)""".stripMargin

  /** Shared per-user time-to-event CTE (q341/q342), mirroring
    * [[survivalSubjects]]. */
  private val survSubj: String =
    """dd AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
      |  value FROM events),
      |per AS (SELECT user_id, min(day) AS fd, max(day) AS ld,
      |  min(CASE WHEN value > 250.0 THEN day END) AS hd
      |  FROM dd GROUP BY 1),
      |subj AS (SELECT
      |  CASE WHEN hd IS NOT NULL THEN hd - fd ELSE ld - fd END AS dur,
      |  hd IS NOT NULL AS event,
      |  CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS grp
      |  FROM per)""".stripMargin

  /** DuckDB fixed-point of a double expression at 4dp. */
  private def fpSql(e: String): String =
    s"(CASE WHEN ($e) >= 0 THEN floor(($e)*10000.0+0.5) " +
      s"ELSE -floor(-($e)*10000.0+0.5) END)::BIGINT"

  val oracleSql: Map[String, String] = Map(
    "q316_jarque_bera" ->
      s"""WITH $fx,
         |s AS (SELECT key, count(*)::BIGINT AS n,
         |  sum(fp::HUGEINT) AS s1,
         |  sum(fp::HUGEINT * fp::HUGEINT) AS s2,
         |  sum((fp::HUGEINT * fp::HUGEINT) * fp::HUGEINT) AS s3,
         |  sum((fp::HUGEINT * fp::HUGEINT) * (fp::HUGEINT * fp::HUGEINT))
         |    AS s4
         |  FROM fx GROUP BY 1),
         |m AS (SELECT key, n, n::DOUBLE AS nd,
         |  s1::DOUBLE / n::DOUBLE AS m1,
         |  s2::DOUBLE / n::DOUBLE AS a2,
         |  s3::DOUBLE / n::DOUBLE AS a3,
         |  s4::DOUBLE / n::DOUBLE AS a4 FROM s),
         |c AS (SELECT key, n, nd,
         |  a2 - m1 * m1 AS m2,
         |  a3 - 3.0 * m1 * a2 + 2.0 * m1 * m1 * m1 AS m3,
         |  a4 - 4.0 * m1 * a3 + 6.0 * m1 * m1 * a2
         |    - 3.0 * m1 * m1 * m1 * m1 AS m4 FROM m),
         |g AS (SELECT key, n, nd,
         |  m3 / sqrt(m2 * m2 * m2) AS skewness,
         |  m4 / (m2 * m2) AS kurtosis FROM c)
         |SELECT key, n, round(skewness, 4) AS skewness,
         | round(kurtosis, 4) AS kurtosis,
         | round(nd / 6.0 * (skewness * skewness +
         |   (kurtosis - 3.0) * (kurtosis - 3.0) / 4.0), 4) AS jb_stat
         |FROM g""".stripMargin.replace("\n", " "),
    "q317_bartlett" ->
      s"""WITH $fx,
         |gg AS (SELECT key AS g, count(*)::BIGINT AS ng,
         |  sum(fp::HUGEINT) AS s, sum(fp::HUGEINT * fp::HUGEINT) AS q
         |  FROM fx GROUP BY 1 HAVING count(*) >= 2),
         |v AS (SELECT g, ng,
         |  (q::DOUBLE - s::DOUBLE * s::DOUBLE / ng::DOUBLE)
         |    / (ng::DOUBLE - 1) / 1e8 AS vi FROM gg),
         |f AS (SELECT count(*)::BIGINT AS k, sum(ng)::BIGINT AS n,
         |  list_aggregate(list((ng::DOUBLE - 1) * vi ORDER BY g), 'sum')
         |    AS sv,
         |  list_aggregate(list((ng::DOUBLE - 1) * ln(vi) ORDER BY g), 'sum')
         |    AS sl,
         |  list_aggregate(list(1.0 / (ng::DOUBLE - 1) ORDER BY g), 'sum')
         |    AS si FROM v),
         |fin AS (SELECT k, n, sv / (n::DOUBLE - k::DOUBLE) AS pooled_var,
         |  1.0 + (si - 1.0 / (n::DOUBLE - k::DOUBLE))
         |    / (3.0 * (k::DOUBLE - 1)) AS c, sl,
         |  n::DOUBLE AS nd, k::DOUBLE AS kd FROM f)
         |SELECT k, n, round(pooled_var, 4) AS pooled_var,
         | round(((nd - kd) * ln(pooled_var) - sl) / c, 4) AS t_stat
         |FROM fin""".stripMargin.replace("\n", " "),
    "q318_runs_test" ->
      s"""WITH $fx,
         |r AS (SELECT key, event_id AS o, fp,
         |  row_number() OVER (PARTITION BY key ORDER BY fp ASC) AS rn,
         |  count(*) OVER (PARTITION BY key) AS c FROM fx),
         |med AS (SELECT key,
         |  sum(fp) * (CASE WHEN count(*) = 1 THEN 2 ELSE 1 END) AS m2
         |  FROM r WHERE rn = (c + 1) // 2 OR rn = c // 2 + 1 GROUP BY 1),
         |sided AS (SELECT f.key, f.event_id AS o,
         |  CASE WHEN 2 * f.fp > m.m2 THEN 1
         |       WHEN 2 * f.fp < m.m2 THEN -1 END AS side
         |  FROM fx f JOIN med m USING (key)),
         |sd AS (SELECT * FROM sided WHERE side IS NOT NULL),
         |chg AS (SELECT key, side,
         |  CASE WHEN lag(side) OVER (PARTITION BY key ORDER BY o ASC)
         |    IS NULL THEN 1
         |   WHEN lag(side) OVER (PARTITION BY key ORDER BY o ASC) <> side
         |    THEN 1 ELSE 0 END AS chg FROM sd),
         |agg AS (SELECT key,
         |  sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
         |  sum(CASE WHEN side = -1 THEN 1 ELSE 0 END)::BIGINT AS n2,
         |  sum(chg)::BIGINT AS runs FROM chg GROUP BY 1)
         |SELECT key, n1, n2, runs,
         | round((runs::DOUBLE - (2.0 * n1::DOUBLE * n2::DOUBLE
         |    / (n1::DOUBLE + n2::DOUBLE) + 1.0))
         |  / sqrt(2.0 * n1::DOUBLE * n2::DOUBLE
         |    * (2.0 * n1::DOUBLE * n2::DOUBLE
         |       - (n1::DOUBLE + n2::DOUBLE))
         |    / ((n1::DOUBLE + n2::DOUBLE) * (n1::DOUBLE + n2::DOUBLE)
         |       * ((n1::DOUBLE + n2::DOUBLE) - 1))), 4) AS z
         |FROM agg""".stripMargin.replace("\n", " "),
    "q319_mcnemar" ->
      s"""WITH p AS (SELECT user_id,
         |  max(CASE WHEN value > 120.0 AND event_id % 2 = 0
         |    THEN 1 ELSE 0 END) = 1 AS a,
         |  max(CASE WHEN value > 120.0 AND event_id % 2 = 1
         |    THEN 1 ELSE 0 END) = 1 AS b
         |  FROM events GROUP BY 1),
         |agg AS (SELECT count(*)::BIGINT AS n,
         |  sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS b,
         |  sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)::BIGINT AS c
         |  FROM p WHERE a IS NOT NULL AND b IS NOT NULL)
         |SELECT n, b, c,
         | round(CASE WHEN b + c = 0 THEN 0.0 ELSE
         |  (abs(b - c)::DOUBLE - 1.0) * (abs(b - c)::DOUBLE - 1.0)
         |    / (b + c)::DOUBLE END, 4) AS mcnemar_stat
         |FROM agg""".stripMargin.replace("\n", " "),
    "q320_wilcoxon_signed" -> {
      val x = "se::DOUBLE / ne::DOUBLE / 1e4"
      val y = "so::DOUBLE / no::DOUBLE / 1e4"
      s"""WITH $fx,
         |u AS (SELECT user_id,
         |  sum(CASE WHEN event_id % 2 = 0 THEN fp::HUGEINT END) AS se,
         |  sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS ne,
         |  sum(CASE WHEN event_id % 2 = 1 THEN fp::HUGEINT END) AS so,
         |  sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS no
         |  FROM fx GROUP BY 1 HAVING ne > 0 AND no > 0),
         |dd AS (SELECT ${fpSql(x)} - ${fpSql(y)} AS d FROM u),
         |h AS (SELECT abs(d) AS ad, count(*)::BIGINT AS ct,
         |  sum(CASE WHEN d > 0 THEN 1 ELSE 0 END)::BIGINT AS np
         |  FROM dd WHERE d <> 0 GROUP BY 1),
         |r AS (SELECT *, 2 * (sum(ct) OVER (ORDER BY ad ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ct)
         |  + ct + 1 AS r2 FROM h),
         |agg AS (SELECT sum(ct)::BIGINT AS n,
         |  sum(np * r2)::BIGINT AS w2,
         |  sum(ct * ct * ct - ct)::BIGINT AS tc FROM r)
         |SELECT n, round(w2::DOUBLE / 2.0, 4) AS w_plus,
         | round((w2::DOUBLE / 2.0 - n::DOUBLE * (n::DOUBLE + 1) / 4.0)
         |  / sqrt(n::DOUBLE * (n::DOUBLE + 1) * (2.0 * n::DOUBLE + 1)
         |     / 24.0 - tc::DOUBLE / 48.0), 4) AS z
         |FROM agg""".stripMargin.replace("\n", " ")
    },
    "q325_ccf" -> {
      val mv = "s::DOUBLE / c::DOUBLE / 1e4"
      s"""WITH f AS (SELECT event_type,
         |  epoch_ns(ts) // 86400000000000 AS day,
         |  (CASE WHEN value >= 0 THEN floor(value*10000.0+0.5)
         |        ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS fp
         |  FROM events WHERE value IS NOT NULL),
         |d AS (SELECT event_type, day, sum(fp::HUGEINT) AS s,
         |  count(*)::BIGINT AS c FROM f GROUP BY 1, 2),
         |m AS (SELECT event_type, day, ${fpSql(mv)} AS v FROM d),
         |a AS (SELECT day AS t, v AS x FROM m WHERE event_type = 'click'),
         |b AS (SELECT day AS tb, v AS y FROM m WHERE event_type = 'error'),
         |l AS (SELECT range::INTEGER AS lag FROM range(-7, 8)),
         |j AS (SELECT l.lag, count(*)::BIGINT AS n,
         |  sum(a.x)::HUGEINT AS sx, sum(b.y)::HUGEINT AS sy,
         |  sum(a.x::HUGEINT * b.y::HUGEINT) AS sxy,
         |  sum(a.x::HUGEINT * a.x::HUGEINT) AS sxx,
         |  sum(b.y::HUGEINT * b.y::HUGEINT) AS syy
         |  FROM a CROSS JOIN l JOIN b ON b.tb = a.t + l.lag GROUP BY 1),
         |fin AS (SELECT lag, n,
         |  n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS num,
         |  n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS dx,
         |  n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS dy
         |  FROM j)
         |SELECT lag, n, round(CASE WHEN dx > 0 AND dy > 0
         |  THEN num / sqrt(dx * dy) END, 4) AS ccf
         |FROM fin""".stripMargin.replace("\n", " ")
    },
    "q326_cochran_q" ->
      s"""WITH p AS (SELECT user_id AS b, event_type AS t,
         |  (CASE WHEN max(CASE WHEN value > 120.0 THEN 1 ELSE 0 END) = 1
         |    THEN 1 ELSE 0 END)::BIGINT AS x
         |  FROM events GROUP BY 1, 2),
         |kk AS (SELECT count(DISTINCT t)::BIGINT AS k FROM p),
         |full0 AS (SELECT p.* FROM p, kk
         |  QUALIFY count(*) OVER (PARTITION BY b) = kk.k),
         |g AS (SELECT sum(xg * xg)::BIGINT AS sg2, sum(xg)::BIGINT AS tt
         |  FROM (SELECT t, sum(x) AS xg FROM full0 GROUP BY 1)),
         |l AS (SELECT sum(xl * xl)::BIGINT AS sl2,
         |  count(*)::BIGINT AS n_blocks
         |  FROM (SELECT b, sum(x) AS xl FROM full0 GROUP BY 1))
         |SELECT n_blocks, kk.k AS k,
         | round(((kk.k - 1) * (kk.k * sg2 - tt * tt))::DOUBLE
         |   / (kk.k * tt - sl2)::DOUBLE, 4) AS q_stat
         |FROM g, l, kk""".stripMargin.replace("\n", " "),
    "q327_partial_corr" -> {
      def f(c: String) =
        s"(CASE WHEN $c >= 0 THEN floor($c*10000.0+0.5) " +
          s"ELSE -floor(-$c*10000.0+0.5) END)::BIGINT"
      def r(sa: String, sb: String, sab: String, saa: String, sbb: String) =
        s"CASE WHEN n::DOUBLE * $saa::DOUBLE - $sa::DOUBLE * $sa::DOUBLE > 0" +
          s" AND n::DOUBLE * $sbb::DOUBLE - $sb::DOUBLE * $sb::DOUBLE > 0" +
          s" THEN (n::DOUBLE * $sab::DOUBLE - $sa::DOUBLE * $sb::DOUBLE)" +
          s" / sqrt((n::DOUBLE * $saa::DOUBLE - $sa::DOUBLE * $sa::DOUBLE)" +
          s" * (n::DOUBLE * $sbb::DOUBLE - $sb::DOUBLE * $sb::DOUBLE)) END"
      s"""WITH d AS (SELECT ${f("l_quantity")} AS x,
         |  ${f("l_extendedprice")} AS y, ${f("l_discount")} AS z
         |  FROM lineitem WHERE l_quantity IS NOT NULL
         |   AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
         |g AS (SELECT count(*)::BIGINT AS n,
         |  sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
         |  sum(z)::HUGEINT AS sz,
         |  sum(x::HUGEINT * y::HUGEINT) AS sxy,
         |  sum(x::HUGEINT * z::HUGEINT) AS sxz,
         |  sum(y::HUGEINT * z::HUGEINT) AS syz,
         |  sum(x::HUGEINT * x::HUGEINT) AS sxx,
         |  sum(y::HUGEINT * y::HUGEINT) AS syy,
         |  sum(z::HUGEINT * z::HUGEINT) AS szz FROM d),
         |rr AS (SELECT n, ${r("sx", "sy", "sxy", "sxx", "syy")} AS r_xy,
         |  ${r("sx", "sz", "sxz", "sxx", "szz")} AS r_xz,
         |  ${r("sy", "sz", "syz", "syy", "szz")} AS r_yz FROM g)
         |SELECT n, round(r_xy, 4) AS r_xy, round(r_xz, 4) AS r_xz,
         | round(r_yz, 4) AS r_yz,
         | round((r_xy - r_xz * r_yz) / sqrt((1.0 - r_xz * r_xz)
         |   * (1.0 - r_yz * r_yz)), 4) AS partial
         |FROM rr""".stripMargin.replace("\n", " ")
    },
    "q329_grubbs" ->
      s"""WITH $fx,
         |st AS (SELECT key, count(*)::BIGINT AS n, sum(fp::HUGEINT) AS s,
         |  sum(fp::HUGEINT * fp::HUGEINT) AS q FROM fx GROUP BY 1),
         |j AS (SELECT f.key, f.event_id, f.value, st.n, st.s, st.q,
         |  abs(st.n::HUGEINT * f.fp::HUGEINT - st.s) AS dev
         |  FROM fx f JOIN st USING (key)),
         |top AS (SELECT * FROM j QUALIFY row_number() OVER
         |  (PARTITION BY key ORDER BY dev DESC, event_id ASC) = 1)
         |SELECT key, n, event_id AS outlier_ord, round(value, 4) AS value,
         | round(abs(value - s::DOUBLE / n::DOUBLE / 1e4)
         |  / (sqrt((q::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
         |      / (n::DOUBLE - 1)) / 1e4), 4) AS g_stat
         |FROM top""".stripMargin.replace("\n", " "),
    "q330_dixon_q" ->
      s"""WITH $fx,
         |r AS (SELECT key, fp,
         |  row_number() OVER (PARTITION BY key ORDER BY fp ASC) AS rn,
         |  count(*) OVER (PARTITION BY key) AS n FROM fx),
         |a AS (SELECT key, max(n)::BIGINT AS n,
         |  min(CASE WHEN rn = 1 THEN fp END) AS x1,
         |  min(CASE WHEN rn = 2 THEN fp END) AS x2,
         |  min(CASE WHEN rn = n - 1 THEN fp END) AS xn1,
         |  min(CASE WHEN rn = n THEN fp END) AS xn
         |  FROM r WHERE rn <= 2 OR rn >= n - 1 GROUP BY 1)
         |SELECT key, n,
         | round((x2 - x1)::DOUBLE / (xn - x1)::DOUBLE, 4) AS q_min,
         | round((xn - xn1)::DOUBLE / (xn - x1)::DOUBLE, 4) AS q_max
         |FROM a WHERE n >= 3 AND xn > x1""".stripMargin.replace("\n", " "),
    "q379_ad_two_sample" -> {
      val fp8 = (e: String) =>
        s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e8+0.5) " +
          s"ELSE -floor(-($e)*1e8+0.5) END)::BIGINT"
      val df = "(fa::DOUBLE / n_a::DOUBLE - fb::DOUBLE / n_b::DOUBLE)"
      val hh = "((fa + fb)::DOUBLE / (n_a::DOUBLE + n_b::DOUBLE))"
      s"""WITH h AS (SELECT
         |  (CASE WHEN value >= 0 THEN floor(value*10000.0+0.5)
         |        ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS v,
         |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
         |    AS ca,
         |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
         |    AS cb
         |  FROM events WHERE value IS NOT NULL
         |   AND event_type IN ('click', 'error') GROUP BY 1),
         |c AS (SELECT v, ca, cb,
         |  sum(ca) OVER (ORDER BY v ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fa,
         |  sum(cb) OVER (ORDER BY v ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fb
         |  FROM h),
         |t AS (SELECT sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b
         |  FROM h),
         |s AS (SELECT n_a, n_b, sum(${fp8(
           s"(ca + cb)::DOUBLE * $df * $df / ($hh * (1.0 - $hh))")})::BIGINT
         |   AS st
         |  FROM c, t WHERE fa + fb < n_a + n_b GROUP BY 1, 2)
         |SELECT n_a, n_b,
         | round(n_a::DOUBLE * n_b::DOUBLE
         |  / ((n_a::DOUBLE + n_b::DOUBLE) * (n_a::DOUBLE + n_b::DOUBLE))
         |  * (st::DOUBLE / 1e8), 4) AS a_stat
         |FROM s""".stripMargin.replace("\n", " ")
    },
    "q378_cvm_two_sample" -> {
      val fp8 = (e: String) =>
        s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e8+0.5) " +
          s"ELSE -floor(-($e)*1e8+0.5) END)::BIGINT"
      s"""WITH h AS (SELECT
         |  (CASE WHEN value >= 0 THEN floor(value*10000.0+0.5)
         |        ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS v,
         |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
         |    AS ca,
         |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
         |    AS cb
         |  FROM events WHERE value IS NOT NULL
         |   AND event_type IN ('click', 'error') GROUP BY 1),
         |c AS (SELECT v, ca, cb,
         |  sum(ca) OVER (ORDER BY v ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fa,
         |  sum(cb) OVER (ORDER BY v ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fb
         |  FROM h),
         |t AS (SELECT sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b
         |  FROM h),
         |s AS (SELECT n_a, n_b, sum(${fp8(
           "(ca + cb)::DOUBLE * (fa::DOUBLE / n_a::DOUBLE " +
             "- fb::DOUBLE / n_b::DOUBLE) * (fa::DOUBLE / n_a::DOUBLE " +
             "- fb::DOUBLE / n_b::DOUBLE)")})::BIGINT AS st
         |  FROM c, t GROUP BY 1, 2)
         |SELECT n_a, n_b,
         | round(n_a::DOUBLE * n_b::DOUBLE
         |  / ((n_a::DOUBLE + n_b::DOUBLE) * (n_a::DOUBLE + n_b::DOUBLE))
         |  * (st::DOUBLE / 1e8), 4) AS t_stat
         |FROM s""".stripMargin.replace("\n", " ")
    },
    "q331_ks_two_sample" ->
      s"""WITH h AS (SELECT
         |  (CASE WHEN value >= 0 THEN floor(value*10000.0+0.5)
         |        ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS v,
         |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
         |    AS ca,
         |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
         |    AS cb
         |  FROM events WHERE value IS NOT NULL
         |   AND event_type IN ('click', 'error') GROUP BY 1),
         |c AS (SELECT v,
         |  sum(ca) OVER (ORDER BY v ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fa,
         |  sum(cb) OVER (ORDER BY v ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fb
         |  FROM h),
         |t AS (SELECT sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b
         |  FROM h),
         |d AS (SELECT n_a, n_b,
         |  max(abs(fa::DOUBLE / n_a::DOUBLE - fb::DOUBLE / n_b::DOUBLE))
         |    AS d_stat
         |  FROM c, t GROUP BY 1, 2)
         |SELECT n_a, n_b, round(d_stat, 4) AS d_stat,
         | round(d_stat * sqrt(n_a::DOUBLE * n_b::DOUBLE
         |   / (n_a::DOUBLE + n_b::DOUBLE)), 4) AS ks_z
         |FROM d""".stripMargin.replace("\n", " "),
    "q332_mood_median" ->
      s"""WITH $fx,
         |vh AS (SELECT fp AS v, count(*)::BIGINT AS ct FROM fx GROUP BY 1),
         |t0 AS (SELECT sum(ct)::BIGINT AS c FROM vh),
         |cum AS (SELECT v, sum(ct) OVER (ORDER BY v ASC
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM vh),
         |m AS (SELECT min(CASE WHEN cum >= (c + 1) // 2 THEN v END)
         |  + min(CASE WHEN cum >= c // 2 + 1 THEN v END) AS m2
         |  FROM cum, t0),
         |counts AS (SELECT key AS g, count(*)::BIGINT AS n,
         |  sum(CASE WHEN 2 * fp > m.m2 THEN 1 ELSE 0 END)::BIGINT AS a
         |  FROM fx, m GROUP BY 1),
         |tt AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS nn,
         |  sum(a)::BIGINT AS ta FROM counts),
         |terms AS (SELECT g,
         |  (a::DOUBLE - n::DOUBLE * ta::DOUBLE / nn::DOUBLE)
         |   * (a::DOUBLE - n::DOUBLE * ta::DOUBLE / nn::DOUBLE)
         |   / (n::DOUBLE * ta::DOUBLE / nn::DOUBLE)
         |  + ((n::DOUBLE - a::DOUBLE)
         |      - n::DOUBLE * (nn::DOUBLE - ta::DOUBLE) / nn::DOUBLE)
         |   * ((n::DOUBLE - a::DOUBLE)
         |      - n::DOUBLE * (nn::DOUBLE - ta::DOUBLE) / nn::DOUBLE)
         |   / (n::DOUBLE * (nn::DOUBLE - ta::DOUBLE) / nn::DOUBLE) AS t
         |  FROM counts, tt)
         |SELECT tt.k, tt.nn AS n,
         | round((SELECT list_aggregate(list(t ORDER BY g), 'sum')
         |   FROM terms), 4) AS chi2
         |FROM tt""".stripMargin.replace("\n", " "),
    "q343_two_proportion" ->
      s"""WITH g AS (SELECT
         |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
         |    AS n_a,
         |  sum(CASE WHEN event_type = 'click' AND value > 160.0
         |    THEN 1 ELSE 0 END)::BIGINT AS x_a,
         |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
         |    AS n_b,
         |  sum(CASE WHEN event_type = 'error' AND value > 160.0
         |    THEN 1 ELSE 0 END)::BIGINT AS x_b
         |  FROM events WHERE event_type IN ('click', 'error')),
         |f AS (SELECT n_a, x_a, n_b, x_b,
         |  x_a::DOUBLE / n_a::DOUBLE AS p1,
         |  x_b::DOUBLE / n_b::DOUBLE AS p2,
         |  (x_a::DOUBLE + x_b::DOUBLE) / (n_a::DOUBLE + n_b::DOUBLE) AS pp
         |  FROM g)
         |SELECT n_a, x_a, n_b, x_b,
         | round((p1 - p2) / sqrt(pp * (1.0 - pp)
         |   * (1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE)), 4) AS z,
         | round(2.0 * asin(sqrt(p1)) - 2.0 * asin(sqrt(p2)), 4)
         |   AS cohens_h
         |FROM f""".stripMargin.replace("\n", " "),
    "q344_dominant_period" -> {
      val lags = (2 to 10)
      val lcols = lags.map(l => s"lag(value, $l) OVER w AS l$l").mkString(", ")
      val unions = lags.map(l =>
        s"SELECT event_type, $l AS lag, round(corr(value, l$l), 4) AS acf " +
          "FROM l GROUP BY 1").mkString(" UNION ALL ")
      s"""WITH l AS (SELECT event_type, value, $lcols
         | FROM events WINDOW w AS (PARTITION BY event_type
         |   ORDER BY event_id)),
         |a AS ($unions)
         |SELECT event_type, lag AS period, acf FROM a
         |WHERE acf IS NOT NULL
         |QUALIFY row_number() OVER (PARTITION BY event_type
         |  ORDER BY acf DESC, lag ASC) = 1"""
        .stripMargin.replace("\n", " ")
    },
    "q338_mann_whitney" ->
      s"""WITH h AS (SELECT
         |  (CASE WHEN value >= 0 THEN floor(value*10000.0+0.5)
         |        ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS v,
         |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
         |    AS ca,
         |  count(*)::BIGINT AS ct
         |  FROM events WHERE value IS NOT NULL
         |   AND event_type IN ('click', 'error') GROUP BY 1),
         |r AS (SELECT *, 2 * (sum(ct) OVER (ORDER BY v ASC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ct)
         |  + ct + 1 AS r2 FROM h),
         |a AS (SELECT sum(ca)::BIGINT AS n_a,
         |  (sum(ct) - sum(ca))::BIGINT AS n_b,
         |  sum(ca * r2)::BIGINT AS ra2,
         |  sum(ct * ct * ct - ct)::BIGINT AS tc FROM r),
         |f AS (SELECT n_a, n_b,
         |  ra2::DOUBLE / 2.0 - n_a::DOUBLE * (n_a::DOUBLE + 1) / 2.0
         |    AS u_stat, tc,
         |  n_a::DOUBLE AS na, n_b::DOUBLE AS nb,
         |  n_a::DOUBLE + n_b::DOUBLE AS nn FROM a)
         |SELECT n_a, n_b, round(u_stat, 4) AS u_stat,
         | round((u_stat - na * nb / 2.0)
         |  / sqrt(na * nb / 12.0 * ((nn + 1)
         |     - tc::DOUBLE / (nn * (nn - 1)))), 4) AS z
         |FROM f""".stripMargin.replace("\n", " "),
    "q339_odds_ratio" ->
      s"""WITH u AS (SELECT user_id,
         |  max(CASE WHEN event_type = 'error' AND value > 160.0
         |    THEN 1 ELSE 0 END) = 1 AS e,
         |  max(CASE WHEN event_type = 'click' AND value > 160.0
         |    THEN 1 ELSE 0 END) = 1 AS o
         |  FROM events GROUP BY 1),
         |g AS (SELECT
         |  sum(CASE WHEN e AND o THEN 1 ELSE 0 END)::BIGINT AS a,
         |  sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS b,
         |  sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)::BIGINT AS c,
         |  sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS d
         |  FROM u WHERE e IS NOT NULL AND o IS NOT NULL)
         |SELECT a, b, c, d,
         | round(a::DOUBLE * d::DOUBLE / (b::DOUBLE * c::DOUBLE), 4)
         |   AS odds_ratio,
         | round(exp(ln(a::DOUBLE * d::DOUBLE / (b::DOUBLE * c::DOUBLE))
         |   - 1.96 * sqrt(1.0 / a::DOUBLE + 1.0 / b::DOUBLE
         |      + 1.0 / c::DOUBLE + 1.0 / d::DOUBLE)), 4) AS or_lo,
         | round(exp(ln(a::DOUBLE * d::DOUBLE / (b::DOUBLE * c::DOUBLE))
         |   + 1.96 * sqrt(1.0 / a::DOUBLE + 1.0 / b::DOUBLE
         |      + 1.0 / c::DOUBLE + 1.0 / d::DOUBLE)), 4) AS or_hi,
         | round((a::DOUBLE / (a::DOUBLE + b::DOUBLE))
         |   / (c::DOUBLE / (c::DOUBLE + d::DOUBLE)), 4) AS risk_ratio
         |FROM g""".stripMargin.replace("\n", " "),
    "q340_overlap_matrix" ->
      s"""WITH d AS (SELECT DISTINCT event_type::VARCHAR AS k,
         |  user_id::VARCHAR || ':' ||
         |   (epoch_ns(ts) // 86400000000000)::VARCHAR AS id
         |  FROM events WHERE event_type IS NOT NULL),
         |s AS (SELECT k, count(*)::BIGINT AS n FROM d GROUP BY 1),
         |i AS (SELECT a.k AS ka, b.k AS kb, count(*)::BIGINT AS inter
         |  FROM d a JOIN d b ON a.id = b.id AND a.k < b.k GROUP BY 1, 2)
         |SELECT ka, kb, inter, (sa.n + sb.n - inter)::BIGINT AS un,
         | round(inter::DOUBLE / (sa.n + sb.n - inter)::DOUBLE, 4)
         |   AS jaccard,
         | round(inter::DOUBLE / least(sa.n, sb.n)::DOUBLE, 4) AS overlap
         |FROM i JOIN s sa ON sa.k = i.ka JOIN s sb ON sb.k = i.kb"""
        .stripMargin.replace("\n", " "),
    "q341_kaplan_meier" ->
      s"""WITH $survSubj,
         |h AS (SELECT dur AS t,
         |  sum(CASE WHEN event THEN 1 ELSE 0 END)::BIGINT AS d,
         |  sum(CASE WHEN NOT event THEN 1 ELSE 0 END)::BIGINT AS c
         |  FROM subj GROUP BY 1),
         |tot AS (SELECT sum(d + c)::BIGINT AS n FROM h),
         |f1 AS (SELECT t, d, c,
         |  (SELECT n FROM tot) - (sum(d + c) OVER wcum - (d + c)) AS n_risk
         |  FROM h WINDOW wcum AS (ORDER BY t ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |f2 AS (SELECT t, d, c, n_risk,
         |  exp(sum(ln(1.0 - d::DOUBLE / n_risk::DOUBLE)) OVER wcum)
         |    AS survival,
         |  sum(d::DOUBLE / n_risk::DOUBLE) OVER wcum AS cum_hazard
         |  FROM f1 WINDOW wcum AS (ORDER BY t ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT t, n_risk::BIGINT AS n_risk, d, c,
         | round(survival, 4) AS survival, round(cum_hazard, 4) AS cum_hazard
         |FROM f2""".stripMargin.replace("\n", " "),
    "q342_logrank" ->
      s"""WITH $survSubj,
         |h AS (SELECT dur AS t,
         |  sum(CASE WHEN event AND grp = 'even' THEN 1 ELSE 0 END)::BIGINT
         |    AS da,
         |  sum(CASE WHEN event THEN 1 ELSE 0 END)::BIGINT AS d,
         |  sum(CASE WHEN grp = 'even' THEN 1 ELSE 0 END)::BIGINT AS la,
         |  count(*)::BIGINT AS l FROM subj GROUP BY 1),
         |tot AS (SELECT sum(l)::BIGINT AS n, sum(la)::BIGINT AS nna FROM h),
         |risk AS (SELECT t, da, d,
         |  (SELECT n FROM tot) - (sum(l) OVER wcum - l) AS n_risk,
         |  (SELECT nna FROM tot) - (sum(la) OVER wcum - la) AS na_risk
         |  FROM h WINDOW wcum AS (ORDER BY t ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |rk AS (SELECT t, da::DOUBLE AS da,
         |  d::DOUBLE * na_risk::DOUBLE / n_risk::DOUBLE AS ea,
         |  d::DOUBLE * (na_risk::DOUBLE / n_risk::DOUBLE)
         |    * (1.0 - na_risk::DOUBLE / n_risk::DOUBLE)
         |    * (n_risk::DOUBLE - d::DOUBLE) / (n_risk::DOUBLE - 1) AS v
         |  FROM risk WHERE d > 0 AND n_risk > 1),
         |f AS (SELECT
         |  list_aggregate(list(da ORDER BY t), 'sum') AS sda,
         |  list_aggregate(list(ea ORDER BY t), 'sum') AS sea,
         |  list_aggregate(list(v ORDER BY t), 'sum') AS sv FROM rk)
         |SELECT (SELECT nna FROM tot) AS n_a,
         | (SELECT n FROM tot) - (SELECT nna FROM tot) AS n_b,
         | round((sda - sea) * (sda - sea) / sv, 4) AS chi2
         |FROM f""".stripMargin.replace("\n", " "),
    "q333_hurst" -> {
      def sizeCte(w: Int) =
        s"""rs$w AS (SELECT key, (rn - 1) // $w AS b,
           |  (rn - 1) % $w + 1 AS t, fp,
           |  sum(fp) OVER (PARTITION BY key, (rn - 1) // $w ORDER BY rn
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           |  count(*) OVER (PARTITION BY key, (rn - 1) // $w) AS cnt,
           |  sum(fp) OVER (PARTITION BY key, (rn - 1) // $w) AS sb,
           |  sum(fp::HUGEINT * fp::HUGEINT)
           |    OVER (PARTITION BY key, (rn - 1) // $w) AS qb
           |  FROM rnk),
           |bk$w AS (SELECT key, b,
           |  max($w * cum - t * sb) AS dmax, min($w * cum - t * sb) AS dmin,
           |  max(sb) AS s, max(qb) AS q
           |  FROM rs$w WHERE cnt = $w GROUP BY 1, 2),
           |rr$w AS (SELECT key, b,
           |  ((dmax - dmin)::DOUBLE / $w / 1e4)
           |   / (sqrt((q::DOUBLE - s::DOUBLE * s::DOUBLE / $w) / $w) / 1e4)
           |    AS rs
           |  FROM bk$w
           |  WHERE sqrt((q::DOUBLE - s::DOUBLE * s::DOUBLE / $w) / $w)
           |    / 1e4 > 0),
           |m$w AS (SELECT key, $w AS w, count(*)::BIGINT AS nb,
           |  sum((CASE WHEN rs >= 0 THEN floor(rs*1e8+0.5)
           |    ELSE -floor(-rs*1e8+0.5) END)::BIGINT)::BIGINT AS srs
           |  FROM rr$w GROUP BY 1)""".stripMargin
      s"""WITH $fx,
         |rnk AS (SELECT key, fp, row_number() OVER (PARTITION BY key
         |  ORDER BY event_id ASC, fp ASC) AS rn FROM fx),
         |${sizeCte(8)}, ${sizeCte(16)}, ${sizeCte(32)}, ${sizeCte(64)},
         |u AS (SELECT key, w, srs::DOUBLE / nb::DOUBLE / 1e8 AS mrs
         |  FROM (SELECT * FROM m8 UNION ALL SELECT * FROM m16
         |    UNION ALL SELECT * FROM m32 UNION ALL SELECT * FROM m64)),
         |f AS (SELECT key, count(*)::BIGINT AS n_sizes,
         |  list_aggregate(list(ln(w::DOUBLE) ORDER BY w), 'sum') AS sx,
         |  list_aggregate(list(ln(mrs) ORDER BY w), 'sum') AS sy,
         |  list_aggregate(list(ln(w::DOUBLE) * ln(mrs) ORDER BY w), 'sum')
         |    AS sxy,
         |  list_aggregate(list(ln(w::DOUBLE) * ln(w::DOUBLE) ORDER BY w),
         |    'sum') AS sxx
         |  FROM u GROUP BY 1 HAVING count(*) >= 2)
         |SELECT key, n_sizes,
         | round((n_sizes::DOUBLE * sxy - sx * sy)
         |   / (n_sizes::DOUBLE * sxx - sx * sx), 4) AS hurst
         |FROM f""".stripMargin.replace("\n", " ")
    },
    "q376_gumbel" ->
      s"""WITH bm AS (SELECT event_type,
         |  epoch_ns(ts) // 86400000000000 AS b,
         |  max(${fpSql("value")}) AS m
         |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |g AS (SELECT event_type, count(*)::BIGINT AS blocks,
         |  sum(m)::HUGEINT AS s, sum(m::HUGEINT * m::HUGEINT) AS q
         |  FROM bm GROUP BY 1 HAVING count(*) >= 3),
         |f AS (SELECT event_type, blocks,
         |  s::DOUBLE / blocks::DOUBLE / 1e4 AS mean,
         |  sqrt((q::DOUBLE - s::DOUBLE * s::DOUBLE / blocks::DOUBLE)
         |    / (blocks::DOUBLE - 1)) / 1e4 AS sd FROM g),
         |p AS (SELECT event_type, blocks,
         |  sd * ${math.sqrt(6.0)} / ${math.Pi} AS beta,
         |  mean - 0.5772156649015329 * (sd * ${math.sqrt(6.0)} / ${math.Pi})
         |    AS mu FROM f)
         |SELECT event_type, blocks, round(mu, 4) AS mu,
         | round(beta, 4) AS beta,
         | round(mu - beta * ln(-ln(1.0 - 1.0 / 30)), 4) AS return_level
         |FROM p""".stripMargin.replace("\n", " "),
    "q377_cvar" ->
      s"""WITH $fx,
         |h AS (SELECT key, fp AS v, count(*)::BIGINT AS ct
         |  FROM fx GROUP BY 1, 2),
         |c AS (SELECT key, v,
         |  sum(ct) OVER (PARTITION BY key ORDER BY v ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |  sum(ct) OVER (PARTITION BY key) AS n FROM h),
         |q AS (SELECT key, max(n)::BIGINT AS n,
         |  min(CASE WHEN cum >= CAST(ceil(0.95 * n) AS BIGINT) THEN v END)
         |    AS vp FROM c GROUP BY 1),
         |t AS (SELECT f.key, count(*)::BIGINT AS tail_n,
         |  sum(f.fp)::HUGEINT AS ts
         |  FROM fx f JOIN q ON q.key = f.key AND f.fp >= q.vp GROUP BY 1)
         |SELECT q.key AS event_type, q.n,
         | round(q.vp::DOUBLE / 1e4, 4) AS var_p,
         | round(t.ts::DOUBLE / t.tail_n::DOUBLE / 1e4, 4) AS cvar_p,
         | t.tail_n
         |FROM q JOIN t USING (key)""".stripMargin.replace("\n", " "),
    "q373_sprt" ->
      s"""WITH b AS (SELECT event_type AS key, event_id AS o,
         |  CASE WHEN value > 160.0 THEN 1 ELSE 0 END AS d FROM events),
         |c AS (SELECT key, o,
         |  count(*) OVER w AS t, sum(d) OVER w AS cd,
         |  count(*) OVER (PARTITION BY key) AS n
         |  FROM b WINDOW w AS (PARTITION BY key ORDER BY o ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |l AS (SELECT key, o, t, n,
         |  cd::DOUBLE * ln(0.15 / 0.05)
         |   + (t - cd)::DOUBLE * ln((1.0 - 0.15) / (1.0 - 0.05)) AS llr
         |  FROM c),
         |x AS (SELECT *, CASE WHEN llr > ln((1.0 - 0.05) / 0.05) THEN 1
         |  WHEN llr < ln(0.05 / (1.0 - 0.05)) THEN -1 END AS crs
         |  FROM l),
         |first AS (SELECT key, t AS cross_pos, crs AS cx FROM x
         |  WHERE crs IS NOT NULL
         |  QUALIFY row_number() OVER (PARTITION BY key ORDER BY t ASC) = 1),
         |lastr AS (SELECT key, n::BIGINT AS n, llr AS llr_end FROM x
         |  WHERE t = n)
         |SELECT l2.key, l2.n,
         | CASE WHEN f.cx = 1 THEN 'accept_h1'
         |      WHEN f.cx = -1 THEN 'accept_h0'
         |      ELSE 'continue' END AS decision,
         | f.cross_pos, round(l2.llr_end, 4) AS llr_end
         |FROM lastr l2 LEFT JOIN first f USING (key)"""
        .stripMargin.replace("\n", " "),
    "q374_bland_altman" ->
      s"""WITH $fx,
         |u AS (SELECT user_id,
         |  sum(CASE WHEN event_id % 2 = 0 THEN fp::HUGEINT END) AS se,
         |  sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS ne,
         |  sum(CASE WHEN event_id % 2 = 1 THEN fp::HUGEINT END) AS so,
         |  sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS no
         |  FROM fx GROUP BY 1 HAVING ne > 0 AND no > 0),
         |d AS (SELECT ${fpSql("se::DOUBLE / ne::DOUBLE / 1e4")}
         |  - ${fpSql("so::DOUBLE / no::DOUBLE / 1e4")} AS dd FROM u),
         |g AS (SELECT count(*)::BIGINT AS n, sum(dd)::HUGEINT AS s,
         |  sum(dd::HUGEINT * dd::HUGEINT) AS q FROM d),
         |lim AS (SELECT n, s::DOUBLE / n::DOUBLE / 1e4 AS bias,
         |  s::DOUBLE / n::DOUBLE / 1e4 - 1.96 *
         |   (sqrt((q::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
         |     / (n::DOUBLE - 1)) / 1e4) AS loa_lo,
         |  s::DOUBLE / n::DOUBLE / 1e4 + 1.96 *
         |   (sqrt((q::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
         |     / (n::DOUBLE - 1)) / 1e4) AS loa_hi
         |  FROM g WHERE n >= 3),
         |o AS (SELECT sum(CASE WHEN dd::DOUBLE / 1e4 < lim.loa_lo
         |  OR dd::DOUBLE / 1e4 > lim.loa_hi THEN 1 ELSE 0 END)::BIGINT
         |   AS outside FROM d, lim)
         |SELECT n, round(bias, 4) AS bias, round(loa_lo, 4) AS loa_lo,
         | round(loa_hi, 4) AS loa_hi, outside
         |FROM lim, o""".stripMargin.replace("\n", " "),
    "q375_ccc" ->
      s"""WITH $fx,
         |u AS (SELECT user_id,
         |  sum(CASE WHEN event_id % 2 = 0 THEN fp::HUGEINT END) AS se,
         |  sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS ne,
         |  sum(CASE WHEN event_id % 2 = 1 THEN fp::HUGEINT END) AS so,
         |  sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS no
         |  FROM fx GROUP BY 1 HAVING ne > 0 AND no > 0),
         |b AS (SELECT ${fpSql("se::DOUBLE / ne::DOUBLE / 1e4")} AS x,
         |  ${fpSql("so::DOUBLE / no::DOUBLE / 1e4")} AS y FROM u),
         |g AS (SELECT count(*)::BIGINT AS n,
         |  sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
         |  sum(x::HUGEINT * y::HUGEINT) AS sxy,
         |  sum(x::HUGEINT * x::HUGEINT) AS sxx,
         |  sum(y::HUGEINT * y::HUGEINT) AS syy FROM b),
         |f AS (SELECT n,
         |  sx::DOUBLE / n::DOUBLE / 1e4 AS mx,
         |  sy::DOUBLE / n::DOUBLE / 1e4 AS my,
         |  (sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE)
         |    / n::DOUBLE / 1e8 AS cxy,
         |  (sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE)
         |    / n::DOUBLE / 1e8 AS vx,
         |  (syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE)
         |    / n::DOUBLE / 1e8 AS vy FROM g WHERE n >= 3)
         |SELECT n, round(cxy / sqrt(vx * vy), 4) AS pearson,
         | round(2.0 * cxy / (vx + vy + (mx - my) * (mx - my)), 4) AS ccc
         |FROM f""".stripMargin.replace("\n", " "),
    "q368_srm" ->
      s"""WITH obs AS (SELECT event_type AS g, count(*)::BIGINT AS c
         |  FROM events WHERE event_type IS NOT NULL GROUP BY 1),
         |tot AS (SELECT sum(c)::BIGINT AS n FROM obs),
         |terms AS (SELECT g,
         |  (c::DOUBLE - 1.0 / 5.0 * n::DOUBLE)
         |   * (c::DOUBLE - 1.0 / 5.0 * n::DOUBLE)
         |   / (1.0 / 5.0 * n::DOUBLE) AS t
         |  FROM obs, tot)
         |SELECT (SELECT count(*) FROM obs)::BIGINT AS arms,
         | tot.n,
         | round((SELECT list_aggregate(list(t ORDER BY g), 'sum')
         |   FROM terms), 4) AS chi2,
         | (SELECT list_aggregate(list(t ORDER BY g), 'sum')
         |   FROM terms) > 20.0 AS mismatched
         |FROM tot""".stripMargin.replace("\n", " "),
    "q369_cuped" -> {
      val fp4 = (e: String) =>
        s"(CASE WHEN ($e) >= 0 THEN floor(($e)*10000.0+0.5) " +
          s"ELSE -floor(-($e)*10000.0+0.5) END)::BIGINT"
      val x = "se::DOUBLE / ne::DOUBLE / 1e4"
      val y = "so::DOUBLE / no::DOUBLE / 1e4"
      s"""WITH $fx,
         |u AS (SELECT user_id,
         |  sum(CASE WHEN event_id % 2 = 0 THEN fp::HUGEINT END) AS se,
         |  sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS ne,
         |  sum(CASE WHEN event_id % 2 = 1 THEN fp::HUGEINT END) AS so,
         |  sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS no
         |  FROM fx GROUP BY 1 HAVING ne > 0 AND no > 0),
         |b AS (SELECT ${fp4(x)} AS fx2, ${fp4(y)} AS fy FROM u),
         |g AS (SELECT count(*)::BIGINT AS n,
         |  sum(fx2)::HUGEINT AS sx, sum(fy)::HUGEINT AS sy,
         |  sum(fx2::HUGEINT * fy::HUGEINT) AS sxy,
         |  sum(fx2::HUGEINT * fx2::HUGEINT) AS sxx,
         |  sum(fy::HUGEINT * fy::HUGEINT) AS syy FROM b),
         |c AS (SELECT n,
         |  (sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE) / 1e8
         |    AS cxy,
         |  (sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE) / 1e8
         |    AS vx,
         |  (syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE) / 1e8
         |    AS vy FROM g WHERE n >= 3)
         |SELECT n, round(cxy / vx, 4) AS theta,
         | round(vy / (n::DOUBLE - 1), 4) AS var_y,
         | round((vy - cxy * cxy / vx) / (n::DOUBLE - 1), 4) AS var_adj,
         | round(1.0 - ((vy - cxy * cxy / vx) / (n::DOUBLE - 1))
         |   / (vy / (n::DOUBLE - 1)), 4) AS reduction
         |FROM c""".stripMargin.replace("\n", " ")
    },
    "q370_pettitt" ->
      s"""WITH $fx,
         |h AS (SELECT key, fp AS v, count(*)::BIGINT AS ct
         |  FROM fx GROUP BY 1, 2),
         |r2 AS (SELECT key, v, 2 * (sum(ct) OVER (PARTITION BY key
         |   ORDER BY v ASC ROWS BETWEEN UNBOUNDED PRECEDING AND
         |   CURRENT ROW) - ct) + ct + 1 AS r2 FROM h),
         |j AS (SELECT f.key, f.event_id AS o, r2.r2
         |  FROM fx f JOIN r2 ON r2.key = f.key AND r2.v = f.fp),
         |u AS (SELECT key, o,
         |  row_number() OVER w AS t,
         |  sum(r2) OVER (PARTITION BY key ORDER BY o ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2r,
         |  count(*) OVER (PARTITION BY key) AS n
         |  FROM j WINDOW w AS (PARTITION BY key ORDER BY o ASC)),
         |u2 AS (SELECT key, t, n, c2r - t * (n + 1) AS u2 FROM u),
         |top AS (SELECT * FROM u2 QUALIFY row_number() OVER
         |  (PARTITION BY key ORDER BY abs(u2) DESC, t ASC) = 1)
         |SELECT key, n::BIGINT AS n, t AS change_pos,
         | round(abs(u2)::DOUBLE, 4) AS k_stat,
         | round(2.0 * exp(-6.0 * abs(u2)::DOUBLE * abs(u2)::DOUBLE
         |  / (n::DOUBLE * n::DOUBLE * n::DOUBLE + n::DOUBLE * n::DOUBLE)),
         |  4) AS p_approx
         |FROM top WHERE t < n""".stripMargin.replace("\n", " "),
    "q367_k_anonymity" ->
      s"""WITH g AS (SELECT event_type,
         |  epoch_ns(ts) // 86400000000000 AS day,
         |  floor(value / 50.0) AS band,
         |  count(*)::BIGINT AS n,
         |  count(DISTINCT user_id)::BIGINT AS l
         |  FROM events GROUP BY 1, 2, 3)
         |SELECT count(*)::BIGINT AS groups, min(n)::BIGINT AS min_k,
         | sum(CASE WHEN n < 5 THEN 1 ELSE 0 END)::BIGINT AS risky_groups,
         | sum(CASE WHEN n < 5 THEN n ELSE 0 END)::BIGINT AS risky_rows,
         | min(l)::BIGINT AS min_l,
         | sum(CASE WHEN l < 2 THEN 1 ELSE 0 END)::BIGINT AS low_div_groups
         |FROM g""".stripMargin.replace("\n", " "),
    "q366_bicor" -> {
      def med2(src: String, c: String) =
        s"""(SELECT min(CASE WHEN cum >= (ct + 1) // 2 THEN $c END)
           |  + min(CASE WHEN cum >= ct // 2 + 1 THEN $c END)
           | FROM (SELECT $c,
           |   sum(n) OVER (ORDER BY $c ASC ROWS BETWEEN UNBOUNDED
           |     PRECEDING AND CURRENT ROW) AS cum,
           |   sum(n) OVER () AS ct
           |  FROM (SELECT $c, count(*)::BIGINT AS n FROM $src
           |    GROUP BY 1)))""".stripMargin
      val fp6 = (e: String) =>
        s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e6+0.5) " +
          s"ELSE -floor(-($e)*1e6+0.5) END)::BIGINT"
      def wdev(c: String, m: String, d: String) = {
        val xc = s"((2 * $c - $m)::DOUBLE / 2e4)"
        val u = s"($xc / (9.0 * (($d)::DOUBLE / 4e4)))"
        s"(CASE WHEN abs($u) < 1.0 THEN (1.0 - $u * $u) * (1.0 - $u * $u)" +
          s" ELSE 0.0 END) * $xc"
      }
      s"""WITH b AS (SELECT
         |  ${fpSql("value")} AS x,
         |  ${fpSql("json_extract(props, '$.k')::INTEGER::DOUBLE")} AS y
         |  FROM events WHERE value IS NOT NULL
         |   AND json_extract(props, '$$.k') IS NOT NULL),
         |mx AS (SELECT ${med2("b", "x")} AS m),
         |my AS (SELECT ${med2("b", "y")} AS m),
         |ddx AS (SELECT abs(2 * x - mx.m) AS d FROM b, mx),
         |ddy AS (SELECT abs(2 * y - my.m) AS d FROM b, my),
         |dx AS (SELECT ${med2("ddx", "d")} AS m),
         |dy AS (SELECT ${med2("ddy", "d")} AS m),
         |f AS (SELECT
         |  ${fp6(wdev("b.x", "mx.m", "dx.m"))} AS fa,
         |  ${fp6(wdev("b.y", "my.m", "dy.m"))} AS fb
         |  FROM b, mx, my, dx, dy)
         |SELECT count(*)::BIGINT AS n,
         | round(sum(fa::HUGEINT * fb::HUGEINT)::DOUBLE
         |  / sqrt(sum(fa::HUGEINT * fa::HUGEINT)::DOUBLE
         |     * sum(fb::HUGEINT * fb::HUGEINT)::DOUBLE), 4) AS bicor
         |FROM f""".stripMargin.replace("\n", " ")
    },
    "q364_flatline" ->
      s"""WITH b AS (SELECT event_type AS key, event_id AS o,
         |  ${fpSql("floor(value/100.0)")} AS v
         |  FROM events WHERE value IS NOT NULL),
         |c AS (SELECT key, o, v,
         |  CASE WHEN lag(v) OVER w IS NULL OR lag(v) OVER w <> v
         |   THEN 1 ELSE 0 END AS chg
         |  FROM b WINDOW w AS (PARTITION BY key ORDER BY o ASC)),
         |r AS (SELECT key, o, v, sum(chg) OVER (PARTITION BY key
         |  ORDER BY o ASC ROWS BETWEEN UNBOUNDED PRECEDING AND
         |  CURRENT ROW) AS run FROM c),
         |g AS (SELECT key, run, count(*)::BIGINT AS len,
         |  min(o) AS start, min(v) AS rv FROM r GROUP BY 1, 2),
         |tot AS (SELECT key, sum(len)::BIGINT AS n FROM g GROUP BY 1),
         |top AS (SELECT * FROM g QUALIFY row_number() OVER
         |  (PARTITION BY key ORDER BY len DESC, start ASC) = 1)
         |SELECT t.key, tot.n, t.len AS max_run,
         | round(t.rv::DOUBLE / 1e4, 4) AS run_value,
         | t.start AS run_start, (t.len >= 5) AS stuck
         |FROM top t JOIN tot USING (key)""".stripMargin.replace("\n", " "),
    "q365_heartbeat" ->
      s"""WITH b AS (SELECT event_type AS key, epoch_ns(ts) AS t
         |  FROM events WHERE ts IS NOT NULL),
         |gp AS (SELECT key, t - lag(t) OVER (PARTITION BY key
         |  ORDER BY t ASC) AS g, t FROM b),
         |g2 AS (SELECT key, g FROM gp WHERE g IS NOT NULL),
         |gh AS (SELECT key, g, count(*)::BIGINT AS ct FROM g2 GROUP BY 1, 2),
         |cum AS (SELECT key, g,
         |  sum(ct) OVER (PARTITION BY key ORDER BY g ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |  sum(ct) OVER (PARTITION BY key) AS c FROM gh),
         |med AS (SELECT key,
         |  min(CASE WHEN cum >= (c + 1) // 2 THEN g END)
         |  + min(CASE WHEN cum >= c // 2 + 1 THEN g END) AS m2
         |  FROM cum GROUP BY 1),
         |agg AS (SELECT key, count(*)::BIGINT AS n, max(g) AS max_gap
         |  FROM g2 GROUP BY 1),
         |lastt AS (SELECT key, max(t) AS last FROM b GROUP BY 1),
         |wm AS (SELECT max(t) AS wm FROM b),
         |f AS (SELECT a.key, a.n, m.m2::DOUBLE / 2.0 AS median_gap,
         |  a.max_gap, (wm.wm - l.last)::BIGINT AS silence
         |  FROM agg a JOIN med m USING (key) JOIN lastt l USING (key),
         |  wm)
         |SELECT key, n, round(median_gap, 4) AS median_gap, max_gap,
         | round(max_gap::DOUBLE / median_gap, 4) AS gap_ratio, silence,
         | (max_gap::DOUBLE / median_gap > 10.0
         |  OR silence::DOUBLE > 10.0 * median_gap) AS stalled
         |FROM f""".stripMargin.replace("\n", " "),
    "q360_single_linkage" -> {
      // unrolled n−1 = 4 merge rounds (5 fully-connected items at every
      // sf, so every round finds a cross-cluster pair)
      val fp6 = (e: String) =>
        s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e6+0.5) " +
          s"ELSE -floor(-($e)*1e6+0.5) END)::BIGINT"
      val rounds = (1 to 4).map { i =>
        s"""m$i AS (SELECT dm.ka AS a, dm.kb AS b, dm.d6,
           |  la.lbl AS lbl_a, lb.lbl AS lbl_b
           | FROM dm JOIN lab${i - 1} la ON la.item = dm.ka
           | JOIN lab${i - 1} lb ON lb.item = dm.kb
           | WHERE la.lbl <> lb.lbl
           | QUALIFY row_number() OVER (ORDER BY dm.d6, dm.ka, dm.kb) = 1),
           |lab$i AS (SELECT i.item,
           |  CASE WHEN i.lbl = m.lbl_a OR i.lbl = m.lbl_b
           |   THEN least(m.lbl_a, m.lbl_b) ELSE i.lbl END AS lbl
           | FROM lab${i - 1} i, m$i m)""".stripMargin
      }
      val outs = (1 to 4).map(i =>
        s"SELECT $i AS step, a AS item_a, b AS item_b, " +
          s"least(lbl_a, lbl_b) AS merged, round(d6::DOUBLE / 1e6, 4) AS d " +
          s"FROM m$i").mkString(" UNION ALL ")
      s"""WITH d0 AS (SELECT DISTINCT event_type::VARCHAR AS k,
         |  user_id::VARCHAR || ':' ||
         |   (epoch_ns(ts) // 86400000000000)::VARCHAR AS id
         |  FROM events WHERE event_type IS NOT NULL),
         |sz AS (SELECT k, count(*)::BIGINT AS n FROM d0 GROUP BY 1),
         |iv AS (SELECT a.k AS ka, b.k AS kb, count(*)::BIGINT AS inter
         |  FROM d0 a JOIN d0 b ON a.id = b.id AND a.k < b.k GROUP BY 1, 2),
         |dm AS (SELECT ka, kb, ${fp6(
           "1.0 - inter::DOUBLE / (sa.n + sb.n - inter)::DOUBLE")} AS d6
         |  FROM iv JOIN sz sa ON sa.k = iv.ka JOIN sz sb ON sb.k = iv.kb),
         |l0 AS (SELECT DISTINCT item FROM
         |  (SELECT ka AS item FROM dm UNION SELECT kb FROM dm)),
         |lab0 AS (SELECT item, item AS lbl FROM l0),
         |${rounds.mkString(", ")}
         |$outs""".stripMargin.replace("\n", " ")
    },
    "q355_quantile_norm" ->
      s"""WITH $fx,
         |kh AS (SELECT key, fp AS v, count(*)::BIGINT AS ct
         |  FROM fx GROUP BY 1, 2),
         |khq AS (SELECT key, v,
         |  -((2 * (cum - ct) + ct + 1)::DOUBLE / (2 * n)::DOUBLE) AS ts
         |  FROM (SELECT key, v, ct,
         |    sum(ct) OVER (PARTITION BY key ORDER BY v ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    sum(ct) OVER (PARTITION BY key) AS n FROM kh)),
         |ph AS (SELECT fp AS v, count(*)::BIGINT AS pct
         |  FROM fx GROUP BY 1),
         |pn AS (SELECT sum(pct)::BIGINT AS np FROM ph),
         |phq AS (SELECT -(cump::DOUBLE / np::DOUBLE) AS ts,
         |  v::DOUBLE / 1e4 AS normalized
         |  FROM (SELECT v, sum(pct) OVER (ORDER BY v ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cump
         |   FROM ph), pn),
         |m AS (SELECT k.key, k.v, p.normalized
         |  FROM khq k ASOF JOIN phq p ON k.ts >= p.ts)
         |SELECT e.event_id AS id, e.key, round(e.value, 4) AS value,
         | round(m.normalized, 4) AS normalized
         |FROM fx e JOIN m ON m.key = e.key AND m.v = e.fp"""
        .stripMargin.replace("\n", " "),
    "q349_turning_points" ->
      s"""WITH $fx,
         |b AS (SELECT key, fp AS v,
         |  lag(fp) OVER w AS p, lead(fp) OVER w AS x FROM fx
         |  WINDOW w AS (PARTITION BY key ORDER BY event_id ASC)),
         |t AS (SELECT key, count(*)::BIGINT AS n,
         |  sum(CASE WHEN p IS NOT NULL AND x IS NOT NULL
         |   AND ((v > p AND v > x) OR (v < p AND v < x))
         |   THEN 1 ELSE 0 END)::BIGINT AS turns FROM b GROUP BY 1)
         |SELECT key, n, turns,
         | round((turns::DOUBLE - 2.0 * (n::DOUBLE - 2) / 3.0)
         |  / sqrt((16.0 * n::DOUBLE - 29) / 90.0), 4) AS z
         |FROM t WHERE n >= 4""".stripMargin.replace("\n", " "),
    "q350_von_neumann" ->
      s"""WITH $fx,
         |b AS (SELECT key, fp AS v, fp - lag(fp) OVER
         |  (PARTITION BY key ORDER BY event_id ASC) AS d FROM fx),
         |g AS (SELECT key, count(*)::BIGINT AS n,
         |  sum(v::HUGEINT) AS s, sum(v::HUGEINT * v::HUGEINT) AS q,
         |  sum(d::HUGEINT * d::HUGEINT) AS sd2 FROM b GROUP BY 1),
         |f AS (SELECT key, n,
         |  (sd2::DOUBLE / (n::DOUBLE - 1))
         |   / ((q::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
         |      / n::DOUBLE) AS vn FROM g WHERE n >= 3)
         |SELECT key, n, round(vn, 4) AS vn_ratio,
         | round((vn - 2.0) / sqrt(4.0 * (n::DOUBLE - 2)
         |  / (n::DOUBLE * n::DOUBLE - 1)), 4) AS z
         |FROM f""".stripMargin.replace("\n", " "),
    "q351_ols_influence" -> {
      def f(c: String) =
        s"(CASE WHEN $c >= 0 THEN floor($c*10000.0+0.5) " +
          s"ELSE -floor(-$c*10000.0+0.5) END)::BIGINT"
      s"""WITH pt AS (SELECT event_type AS key, event_id AS id,
         |  ${f("(epoch_ns(ts) // 86400000000000)")} AS xf,
         |  ${f("value")} AS yf
         |  FROM events WHERE value IS NOT NULL),
         |g AS (SELECT key, count(*)::BIGINT AS n,
         |  sum(xf)::HUGEINT AS sx, sum(yf)::HUGEINT AS sy,
         |  sum(xf::HUGEINT * yf::HUGEINT) AS sxy,
         |  sum(xf::HUGEINT * xf::HUGEINT) AS sxx,
         |  sum(yf::HUGEINT * yf::HUGEINT) AS syy
         |  FROM pt GROUP BY 1 HAVING count(*) >= 4),
         |c AS (SELECT key, n,
         |  (sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE) / 1e8
         |    AS sxyc,
         |  (sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE) / 1e8
         |    AS sxxc,
         |  (syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE) / 1e8
         |    AS syyc,
         |  sx::DOUBLE AS sxd, sy::DOUBLE AS syd FROM g),
         |fit AS (SELECT key, n, sxyc / sxxc AS b,
         |  (syd / 1e4 - sxyc / sxxc * (sxd / 1e4)) / n::DOUBLE AS a,
         |  (syyc - sxyc / sxxc * sxyc) / (n::DOUBLE - 2) AS s2,
         |  sxd / n::DOUBLE / 1e4 AS xbar, sxxc FROM c),
         |rr AS (SELECT pt.key, pt.id,
         |  pt.xf::DOUBLE / 1e4 AS x, pt.yf::DOUBLE / 1e4 AS y,
         |  pt.yf::DOUBLE / 1e4 - (fit.a + fit.b * (pt.xf::DOUBLE / 1e4))
         |    AS resid,
         |  1.0 / fit.n::DOUBLE
         |   + (pt.xf::DOUBLE / 1e4 - fit.xbar)
         |     * (pt.xf::DOUBLE / 1e4 - fit.xbar) / fit.sxxc AS leverage,
         |  fit.s2 FROM pt JOIN fit USING (key)),
         |ck AS (SELECT key, id, x, y, resid, leverage,
         |  (resid * resid / (s2 * (1.0 - leverage))) * leverage
         |   / (2.0 * (1.0 - leverage)) AS cooks_d FROM rr)
         |SELECT key, id, round(x, 4) AS x, round(y, 4) AS y,
         | round(resid, 4) AS resid, round(leverage, 4) AS leverage,
         | round(cooks_d, 4) AS cooks_d
         |FROM ck QUALIFY row_number() OVER (PARTITION BY key
         |  ORDER BY cooks_d DESC, id ASC) <= 5"""
        .stripMargin.replace("\n", " ")
    },
    "q352_km_by_group" ->
      s"""WITH $survSubj,
         |h AS (SELECT grp, dur AS t,
         |  sum(CASE WHEN event THEN 1 ELSE 0 END)::BIGINT AS d,
         |  sum(CASE WHEN NOT event THEN 1 ELSE 0 END)::BIGINT AS c
         |  FROM subj GROUP BY 1, 2),
         |tot AS (SELECT grp, sum(d + c)::BIGINT AS n FROM h GROUP BY 1),
         |f1 AS (SELECT h.grp, t, d, c,
         |  tot.n - (sum(d + c) OVER wc - (d + c)) AS n_risk
         |  FROM h JOIN tot USING (grp)
         |  WINDOW wc AS (PARTITION BY h.grp ORDER BY t ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |f2 AS (SELECT grp, t, d, c, n_risk,
         |  exp(sum(ln(1.0 - d::DOUBLE / n_risk::DOUBLE)) OVER wc)
         |    AS survival,
         |  sum(d::DOUBLE / n_risk::DOUBLE) OVER wc AS cum_hazard
         |  FROM f1 WINDOW wc AS (PARTITION BY grp ORDER BY t ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT grp, t, n_risk::BIGINT AS n_risk, d, c,
         | round(survival, 4) AS survival,
         | round(cum_hazard, 4) AS cum_hazard
         |FROM f2""".stripMargin.replace("\n", " "),
    "q347_ols" -> {
      def f(c: String) =
        s"(CASE WHEN $c >= 0 THEN floor($c*10000.0+0.5) " +
          s"ELSE -floor(-$c*10000.0+0.5) END)::BIGINT"
      val slope = "(sxyc / sxxc)"
      s"""WITH b AS (SELECT event_type AS key,
         |  ${f("(epoch_ns(ts) // 86400000000000)")} AS x,
         |  ${f("value")} AS y
         |  FROM events WHERE value IS NOT NULL),
         |g AS (SELECT key, count(*)::BIGINT AS n,
         |  sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
         |  sum(x::HUGEINT * y::HUGEINT) AS sxy,
         |  sum(x::HUGEINT * x::HUGEINT) AS sxx,
         |  sum(y::HUGEINT * y::HUGEINT) AS syy
         |  FROM b GROUP BY 1 HAVING count(*) >= 3),
         |c AS (SELECT key, n,
         |  (sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE) / 1e8
         |    AS sxyc,
         |  (sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE) / 1e8
         |    AS sxxc,
         |  (syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE) / 1e8
         |    AS syyc,
         |  sx::DOUBLE AS sxd, sy::DOUBLE AS syd FROM g)
         |SELECT key, n, round($slope, 4) AS slope,
         | round((syd / 1e4 - $slope * (sxd / 1e4)) / n::DOUBLE, 4)
         |   AS intercept,
         | round(sxyc * sxyc / (sxxc * syyc), 4) AS r2,
         | round($slope / sqrt((syyc - $slope * sxyc)
         |   / (n::DOUBLE - 2) / sxxc), 4) AS t_stat
         |FROM c""".stripMargin.replace("\n", " ")
    },
    "q348_qq" ->
      s"""WITH $fx,
         |h AS (SELECT key, fp AS v, count(*)::BIGINT AS ct
         |  FROM fx GROUP BY 1, 2),
         |cum AS (SELECT key, v,
         |  sum(ct) OVER (PARTITION BY key ORDER BY v ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |  sum(ct) OVER (PARTITION BY key) AS n FROM h),
         |ps AS (SELECT unnest([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8,
         |  0.9]::DOUBLE[]) AS p),
         |q AS (SELECT key, p,
         |  min(CASE WHEN cum >= CAST(ceil(p * n) AS BIGINT) THEN v END)
         |    ::DOUBLE / 1e4 AS sample_q
         |  FROM cum, ps GROUP BY 1, 2)
         |SELECT key, p, round(sample_q, 4) AS sample_q,
         | round(${StatQueries.probitSql("p")}, 4) AS theo_z
         |FROM q""".stripMargin.replace("\n", " "),
    "q345_cronbach" -> {
      val mv = "s::DOUBLE / c::DOUBLE / 1e4"
      s"""WITH $fx,
         |cell AS (SELECT user_id AS b, key AS t,
         |  sum(fp::HUGEINT) AS s, count(*)::BIGINT AS c
         |  FROM fx GROUP BY 1, 2),
         |c2 AS (SELECT b, t, ${fpSql(mv)} AS v FROM cell),
         |kk AS (SELECT count(DISTINCT t)::BIGINT AS k FROM c2),
         |full0 AS (SELECT c2.* FROM c2, kk
         |  QUALIFY count(*) OVER (PARTITION BY b) = kk.k),
         |items AS (SELECT t, count(*)::BIGINT AS n,
         |  sum(v::HUGEINT) AS sv, sum(v::HUGEINT * v::HUGEINT) AS qv
         |  FROM full0 GROUP BY 1),
         |svi AS (SELECT list_aggregate(list(
         |  (qv::DOUBLE - sv::DOUBLE * sv::DOUBLE / n::DOUBLE)
         |   / (n::DOUBLE - 1) / 1e8 ORDER BY t), 'sum') AS svi
         |  FROM items),
         |tt AS (SELECT b, sum(v)::BIGINT AS tv FROM full0 GROUP BY 1),
         |vt AS (SELECT count(*)::BIGINT AS n_subjects,
         |  sum(tv::HUGEINT) AS st, sum(tv::HUGEINT * tv::HUGEINT) AS qt
         |  FROM tt)
         |SELECT n_subjects, kk.k AS k,
         | round(kk.k::DOUBLE / (kk.k - 1) * (1.0 - svi /
         |   ((qt::DOUBLE - st::DOUBLE * st::DOUBLE / n_subjects::DOUBLE)
         |    / (n_subjects::DOUBLE - 1) / 1e8)), 4) AS alpha
         |FROM vt, svi, kk""".stripMargin.replace("\n", " ")
    },
    "q346_icc" -> {
      val mv = "s::DOUBLE / c::DOUBLE / 1e4"
      s"""WITH $fx,
         |cell AS (SELECT user_id AS b, key AS t,
         |  sum(fp::HUGEINT) AS s, count(*)::BIGINT AS c
         |  FROM fx GROUP BY 1, 2),
         |c2 AS (SELECT b, t, ${fpSql(mv)} AS v FROM cell),
         |kk AS (SELECT count(DISTINCT t)::BIGINT AS k FROM c2),
         |full0 AS (SELECT c2.* FROM c2, kk
         |  QUALIFY count(*) OVER (PARTITION BY b) = kk.k),
         |gg AS (SELECT b AS g, count(*)::HUGEINT AS ng,
         |  sum(v::HUGEINT) AS sg, sum(v::HUGEINT * v::HUGEINT) AS qg
         |  FROM full0 GROUP BY 1),
         |tot AS (SELECT count(*)::BIGINT AS ns, sum(ng) AS n,
         |  sum(sg) AS s, sum(qg) AS q FROM gg),
         |tf AS (SELECT list_aggregate(
         |  list(sg::DOUBLE * sg::DOUBLE / ng::DOUBLE ORDER BY g), 'sum')
         |  AS t FROM gg),
         |fin AS (SELECT ns, n::BIGINT AS n,
         |  (t - s::DOUBLE * s::DOUBLE / n::DOUBLE) / (1e4*1e4) AS ssb,
         |  (q::DOUBLE - t) / (1e4*1e4) AS ssw FROM tot, tf)
         |SELECT ns AS n_subjects, kk.k AS k,
         | round(((ssb / (ns::DOUBLE - 1)) - (ssw / (n::DOUBLE - ns::DOUBLE)))
         |  / ((ssb / (ns::DOUBLE - 1))
         |     + (kk.k::DOUBLE - 1) * (ssw / (n::DOUBLE - ns::DOUBLE))), 4)
         |   AS icc
         |FROM fin, kk""".stripMargin.replace("\n", " ")
    },
    "q383_fligner" -> {
      val fp8 = (e: String) =>
        s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e8+0.5) " +
          s"ELSE -floor(-($e)*1e8+0.5) END)::BIGINT"
      val score = StatQueries.probitSql(
        "0.5 + (r2::DOUBLE / 2.0) / (2.0 * (nn::DOUBLE + 1))")
      s"""WITH $fx,
         |r AS (SELECT key AS g, fp AS v,
         |  row_number() OVER (PARTITION BY key ORDER BY fp ASC) AS rn,
         |  count(*) OVER (PARTITION BY key) AS c FROM fx),
         |med AS (SELECT g,
         |  sum(v) * (CASE WHEN count(*) = 1 THEN 2 ELSE 1 END) AS m2
         |  FROM r WHERE rn = (c + 1) // 2 OR rn = c // 2 + 1 GROUP BY 1),
         |cd AS (SELECT f.key AS g, abs(2 * f.fp - m.m2) AS d
         |  FROM fx f JOIN med m ON m.g = f.key),
         |gvh AS (SELECT g, d, count(*)::BIGINT AS c FROM cd GROUP BY 1, 2),
         |vh AS (SELECT d, sum(c)::BIGINT AS ct FROM gvh GROUP BY 1),
         |tot AS (SELECT sum(ct)::BIGINT AS nn FROM vh),
         |rk AS (SELECT d, 2 * (sum(ct) OVER (ORDER BY d ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ct)
         |  + ct + 1 AS r2 FROM vh),
         |sc AS (SELECT d, ${fp8(score)} AS a8 FROM rk, tot),
         |g2 AS (SELECT gvh.g, sum(c)::BIGINT AS ng,
         |  sum(c * a8)::BIGINT AS sa,
         |  sum(c::HUGEINT * (a8::HUGEINT * a8::HUGEINT)) AS qa
         |  FROM gvh JOIN sc USING (d) GROUP BY 1),
         |t2 AS (SELECT count(*)::BIGINT AS k, sum(ng)::BIGINT AS n,
         |  sum(sa)::HUGEINT AS s, sum(qa) AS q FROM g2),
         |ab AS (SELECT s::DOUBLE / n::DOUBLE / 1e8 AS abar,
         |  (q::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
         |   / (n::DOUBLE - 1) / 1e16 AS vv FROM t2),
         |num AS (SELECT list_aggregate(list(
         |  ng::DOUBLE * (sa::DOUBLE / ng::DOUBLE / 1e8 - ab.abar)
         |   * (sa::DOUBLE / ng::DOUBLE / 1e8 - ab.abar) ORDER BY g),
         |  'sum') AS num FROM g2, ab)
         |SELECT t2.k, t2.n, round(num.num / ab.vv, 4) AS chi2
         |FROM t2, ab, num""".stripMargin.replace("\n", " ")
    },
    "q382_quade" -> {
      val mv = "s::DOUBLE / c::DOUBLE / 1e4"
      s"""WITH $fx,
         |cell AS (SELECT user_id AS b, key AS t,
         |  sum(fp::HUGEINT) AS s, count(*)::BIGINT AS c
         |  FROM fx GROUP BY 1, 2),
         |c2 AS (SELECT b, t, ${fpSql(mv)} AS v FROM cell),
         |kk AS (SELECT count(DISTINCT t)::BIGINT AS k FROM c2),
         |full0 AS (SELECT c2.* FROM c2, kk
         |  QUALIFY count(*) OVER (PARTITION BY b) = kk.k),
         |rk AS (SELECT b, t, 2 * rank() OVER (PARTITION BY b ORDER BY v ASC)
         |  + count(*) OVER (PARTITION BY b, v) - 1 AS r2 FROM full0),
         |rng AS (SELECT b, max(v) - min(v) AS rg FROM full0 GROUP BY 1),
         |rh AS (SELECT rg, count(*)::BIGINT AS ct FROM rng GROUP BY 1),
         |qq AS (SELECT rg, 2 * (sum(ct) OVER (ORDER BY rg ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ct)
         |  + ct + 1 AS q2 FROM rh),
         |bl AS (SELECT rng.b, qq.q2 FROM rng JOIN qq USING (rg)),
         |s4 AS (SELECT rk.t, bl.q2 * (rk.r2 - (kk.k + 1)) AS s4
         |  FROM rk JOIN bl USING (b), kk),
         |a AS (SELECT sum(s4::HUGEINT * s4::HUGEINT) AS a16 FROM s4),
         |byt AS (SELECT t, sum(s4)::BIGINT AS sj4, count(*)::BIGINT AS nb
         |  FROM s4 GROUP BY 1),
         |bb AS (SELECT max(nb)::BIGINT AS n_blocks,
         |  sum(sj4::HUGEINT * sj4::HUGEINT) AS b16 FROM byt)
         |SELECT n_blocks, kk.k AS k,
         | round((n_blocks::DOUBLE - 1)
         |   * (b16::DOUBLE / 16.0 / n_blocks::DOUBLE)
         |  / (a16::DOUBLE / 16.0
         |     - b16::DOUBLE / 16.0 / n_blocks::DOUBLE), 4) AS t_stat
         |FROM a, bb, kk""".stripMargin.replace("\n", " ")
    },
    "q381_kendall_w" -> {
      val mv = "s::DOUBLE / c::DOUBLE / 1e4"
      s"""WITH $fx,
         |cell AS (SELECT user_id AS b, key AS t,
         |  sum(fp::HUGEINT) AS s, count(*)::BIGINT AS c
         |  FROM fx GROUP BY 1, 2),
         |c2 AS (SELECT b, t, ${fpSql(mv)} AS v FROM cell),
         |kk AS (SELECT count(DISTINCT t)::BIGINT AS k FROM c2),
         |full0 AS (SELECT c2.* FROM c2, kk
         |  QUALIFY count(*) OVER (PARTITION BY b) = kk.k),
         |rk AS (SELECT b, t, 2 * rank() OVER (PARTITION BY b ORDER BY v ASC)
         |  + count(*) OVER (PARTITION BY b, v) - 1 AS r2 FROM full0),
         |bt AS (SELECT t, sum(r2)::BIGINT AS rs2, count(*)::BIGINT AS nb
         |  FROM rk GROUP BY 1),
         |g AS (SELECT max(nb)::BIGINT AS n_blocks,
         |  sum((rs2 - nb * (kk.k + 1)) * (rs2 - nb * (kk.k + 1)))::BIGINT
         |   AS s4 FROM bt, kk GROUP BY kk.k)
         |SELECT n_blocks, kk.k AS k,
         | round(12.0 * (s4::DOUBLE / 4.0)
         |  / (n_blocks::DOUBLE * n_blocks::DOUBLE * kk.k::DOUBLE
         |     * (kk.k::DOUBLE * kk.k::DOUBLE - 1)), 4) AS w
         |FROM g, kk""".stripMargin.replace("\n", " ")
    },
    "q380_page_trend" -> {
      val mv = "s::DOUBLE / c::DOUBLE / 1e4"
      s"""WITH $fx,
         |cell AS (SELECT user_id AS b, key AS t,
         |  sum(fp::HUGEINT) AS s, count(*)::BIGINT AS c
         |  FROM fx GROUP BY 1, 2),
         |c2 AS (SELECT b, t, ${fpSql(mv)} AS v FROM cell),
         |kk AS (SELECT count(DISTINCT t)::BIGINT AS k FROM c2),
         |full0 AS (SELECT c2.* FROM c2, kk
         |  QUALIFY count(*) OVER (PARTITION BY b) = kk.k),
         |rk AS (SELECT b, t, 2 * rank() OVER (PARTITION BY b ORDER BY v ASC)
         |  + count(*) OVER (PARTITION BY b, v) - 1 AS r2 FROM full0),
         |bt AS (SELECT t, sum(r2)::BIGINT AS rs2, count(*)::BIGINT AS nb
         |  FROM rk GROUP BY 1),
         |wj AS (SELECT t, rs2, nb,
         |  row_number() OVER (ORDER BY t ASC)::BIGINT AS j FROM bt),
         |g AS (SELECT max(nb)::BIGINT AS n_blocks,
         |  sum(j * rs2)::BIGINT AS l2 FROM wj)
         |SELECT n_blocks, kk.k AS k,
         | round(l2::DOUBLE / 2.0, 4) AS l_stat,
         | round((l2::DOUBLE / 2.0 - n_blocks::DOUBLE * kk.k::DOUBLE
         |    * (kk.k::DOUBLE + 1) * (kk.k::DOUBLE + 1) / 4.0)
         |  / sqrt(n_blocks::DOUBLE * kk.k::DOUBLE * kk.k::DOUBLE
         |    * (kk.k::DOUBLE + 1) * (kk.k::DOUBLE + 1)
         |    * (kk.k::DOUBLE - 1) / 144.0), 4) AS z
         |FROM g, kk""".stripMargin.replace("\n", " ")
    },
    "q321_friedman" -> {
      val mv = "s::DOUBLE / c::DOUBLE / 1e4"
      s"""WITH $fx,
         |cell AS (SELECT user_id AS b, key AS t,
         |  sum(fp::HUGEINT) AS s, count(*)::BIGINT AS c
         |  FROM fx GROUP BY 1, 2),
         |c2 AS (SELECT b, t, ${fpSql(mv)} AS v FROM cell),
         |kk AS (SELECT count(DISTINCT t)::BIGINT AS k FROM c2),
         |full0 AS (SELECT c2.* FROM c2, kk
         |  QUALIFY count(*) OVER (PARTITION BY b) = kk.k),
         |rk AS (SELECT b, t, 2 * rank() OVER (PARTITION BY b ORDER BY v ASC)
         |  + count(*) OVER (PARTITION BY b, v) - 1 AS r2 FROM full0),
         |bt AS (SELECT t, sum(r2)::BIGINT AS rs2, count(*)::BIGINT AS nb
         |  FROM rk GROUP BY 1),
         |f AS (SELECT max(nb)::BIGINT AS n_blocks,
         |  list_aggregate(list(rs2::DOUBLE * rs2::DOUBLE / 4.0 ORDER BY t),
         |    'sum') AS t2 FROM bt)
         |SELECT n_blocks, kk.k AS k,
         | round(12.0 / (n_blocks::DOUBLE * kk.k * (kk.k + 1)) * t2
         |  - 3.0 * n_blocks::DOUBLE * (kk.k + 1), 4) AS chi2
         |FROM f, kk""".stripMargin.replace("\n", " ")
    })
}
