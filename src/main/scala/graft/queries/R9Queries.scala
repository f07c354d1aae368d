package graft.queries

import graft.core._
import graft.model.{Eval2, Tests2}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 queries + DuckDB oracles. Wave 1: ranking-quality metrics
  * (NDCG/MAP/MRR/P@k over a per-user feed-ranking fixture), binary-scorer
  * diagnostics (decile lift, KS separation, Brier decomposition) and the
  * inter-rater agreement family (weighted kappa, Fleiss, Krippendorff).
  *
  * Fixtures are deterministic integer transforms of events/documents:
  * query = user, candidates = the user's events ranked by value, graded
  * relevance = event_id mod 4, binary label = event_id mod 3 = 0. */
object R9Queries {

  private def ev(s: SparkSession, dir: String) = table(s, dir, "events")
  private def docs(s: SparkSession, dir: String) = table(s, dir, "documents")

  /** Per-user ranking fixture: (query, id, score, rel, y). */
  private def ranked(s: SparkSession, dir: String): DataFrame =
    ev(s, dir).where(col("value").isNotNull)
      .select(col("user_id").as("q"), col("event_id").as("id"),
        col("value").as("score"),
        pmod(col("event_id"), lit(4)).as("rel"),
        (pmod(col("event_id"), lit(3)) === 0).as("y"))

  /** Three synthetic raters per document (fixed-rater agreement fixture). */
  private def raters(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id").as("item"),
      explode(array((0 to 2).map(j =>
        pmod(col("n_chars") + lit(j) * pmod(col("doc_id"), lit(7)),
          lit(4))): _*)).as("cat"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // NDCG@10 per user over graded relevance (6dp fixed-point gains)
    "q384_ndcg" -> ((s, dir) =>
      canon(Eval2.ndcgAtK(ranked(s, dir), "q", "id", "score", "rel", 10)
        .withColumnRenamed("query", "q"))),
    // average precision @10 per user (binary labels)
    "q385_map" -> ((s, dir) =>
      canon(Eval2.mapAtK(ranked(s, dir), "q", "id", "score", "y", 10)
        .withColumnRenamed("query", "q"))),
    // reciprocal rank @10 per user (0 when nothing relevant in top 10)
    "q386_mrr" -> ((s, dir) =>
      canon(Eval2.mrrAtK(ranked(s, dir), "q", "id", "score", "y", 10)
        .withColumn("first_rank", coalesce(col("first_rank"), lit(0L)))
        .withColumnRenamed("query", "q"))),
    // precision/recall @10 per user — exact integer count ratios
    "q387_precision_at_k" -> ((s, dir) =>
      canon(Eval2.precisionAtK(ranked(s, dir), "q", "id", "score", "y", 10)
        .withColumnRenamed("query", "q"))),
    // decile lift / cumulative gain of value as a purchase scorer
    "q388_decile_lift" -> ((s, dir) =>
      canon(Eval2.decileLift(
        ev(s, dir).where(col("value").isNotNull)
          .withColumn("y", col("event_type") === "purchase"),
        "value", "y", nBins = 10))),
    // KS separation of the same scorer (max selected on exact integers)
    "q389_ks_separation" -> ((s, dir) =>
      canon(Eval2.ksSeparation(
        ev(s, dir).where(col("value").isNotNull)
          .withColumn("y", col("event_type") === "purchase"),
        "value", "y"))),
    // Murphy decomposition of the Brier score over 10 probability bins
    "q390_brier" -> ((s, dir) =>
      canon(Eval2.brierDecomposition(
        docs(s, dir)
          .withColumn("p", (pmod(col("doc_id") * 37 + col("n_chars"),
            lit(1000))).cast("double") / 1000.0)
          .withColumn("y", col("lang") === "en"),
        "p", "y", nBins = 10))),
    // quadratic-weighted Cohen kappa between two synthetic raters
    "q391_weighted_kappa" -> ((s, dir) =>
      canon(Eval2.weightedKappa(
        docs(s, dir)
          .withColumn("r1", pmod(col("n_chars"), lit(5)))
          .withColumn("r2", least(lit(4), greatest(lit(0),
            pmod(col("n_chars"), lit(5)) + pmod(col("doc_id"), lit(3)) - 1))),
        "r1", "r2", nCat = 5))),
    // Fleiss kappa over the fixed-3-rater fixture
    "q392_fleiss_kappa" -> ((s, dir) =>
      canon(Eval2.fleissKappa(raters(s, dir), "item", "cat", nRaters = 3))),
    // Krippendorff alpha (nominal) over the same ratings
    "q393_krippendorff" -> ((s, dir) =>
      canon(Eval2.krippendorffAlpha(raters(s, dir), "item", "cat"))),
    // Matthews correlation + balanced accuracy at the q280 threshold
    "q453_mcc" -> ((s, dir) =>
      canon(Eval2.mccAt(
        docs(s, dir)
          .withColumn("score", pmod(col("n_chars"), lit(53)).cast("double"))
          .withColumn("isEn", col("lang") === "en"),
        "score", "isEn", threshold = 26.0))),
    // Brunner–Munzel heteroscedastic two-sample test, click vs error
    "q394_brunner_munzel" -> ((s, dir) =>
      canon(Tests2.brunnerMunzel(ev(s, dir), "event_type", "value",
        "click", "error"))),
    // Ansari–Bradley two-sample scale test, same pair
    "q395_ansari_bradley" -> ((s, dir) =>
      canon(Tests2.ansariBradley(ev(s, dir), "event_type", "value",
        "click", "error"))),
    // Jonckheere–Terpstra ordered trend across user_id mod 3 doses
    "q396_jonckheere" -> ((s, dir) =>
      canon(Tests2.jonckheereTerpstra(
        ev(s, dir).withColumn("dose", pmod(col("user_id"), lit(3))),
        "dose", "value"))),
    // Cochran–Armitage trend in proportions across doc_id mod 4 doses
    "q397_cochran_armitage" -> ((s, dir) =>
      canon(Tests2.cochranArmitage(
        docs(s, dir).withColumn("dose", pmod(col("doc_id"), lit(4)))
          .withColumn("pos", col("lang") === "en"),
        "dose", "pos"))),
    // CMH stratified 2×2 + MH common OR + Breslow–Day homogeneity
    "q398_cmh" -> ((s, dir) =>
      canon(Tests2.cmh(
        docs(s, dir).withColumn("exposed", pmod(col("doc_id"), lit(2)) === 0)
          .withColumn("pos", col("lang") === "en"),
        "source", "exposed", "pos"))),
    // D'Agostino K² normality omnibus per event_type
    "q400_dagostino" -> ((s, dir) =>
      canon(Tests2.dagostinoK2(ev(s, dir), "event_type", "value"))),
    // Durbin–Watson residual autocorrelation per event_type
    "q401_durbin_watson" -> ((s, dir) =>
      canon(Tests2.durbinWatson(
        ev(s, dir).withColumn("day", expr("ts div 86400000000000")),
        "event_type", "day", "event_id", "value"))),
    // Breusch–Pagan heteroscedasticity LM per event_type
    "q402_breusch_pagan" -> ((s, dir) =>
      canon(Tests2.breuschPagan(
        ev(s, dir).withColumn("day", expr("ts div 86400000000000")),
        "event_type", "day", "value"))),
    // Cox–Stuart trend sign test per event_type in event_id order
    "q403_cox_stuart" -> ((s, dir) =>
      canon(Tests2.coxStuart(ev(s, dir), "event_type", "event_id",
        "value"))),
    // Bartels rank von Neumann randomness per event_type
    "q404_bartels" -> ((s, dir) =>
      canon(Tests2.bartelsRank(ev(s, dir), "event_type", "event_id",
        "value"))),
    // Theta(2) one-step-ahead scorer per user (SES + half-slope drift)
    "q405_theta" -> ((s, dir) =>
      canon(graft.seq.Forecast2.thetaForecast(ev(s, dir),
        Seq("user_id"), "event_id", "value").toDF())),
    // damped-trend Holt (phi = 7/8) per user
    "q406_damped_holt" -> ((s, dir) =>
      canon(graft.seq.Forecast2.dampedHolt(ev(s, dir),
        Seq("user_id"), "event_id", "value").toDF())),
    // Croston intermittent-demand rate over spike sizes (value > 120)
    "q407_croston" -> ((s, dir) =>
      canon(graft.seq.Forecast2.croston(
        ev(s, dir).withColumn("d",
          when(col("value") > 120, col("value") - 120).otherwise(0.0)),
        Seq("user_id"), "event_id", "d").toDF())),
    // Lomb–Scargle periodogram per event_type over a 7-period day grid
    "q408_lomb_scargle" -> ((s, dir) =>
      canon(graft.seq.Forecast2.lombScargle(ev(s, dir),
        Seq("event_type"), "ts", "value", Seq(2, 3, 4, 5, 7, 10, 14)))),
    // seasonal Mann–Kendall per event_type with day-of-week seasons
    "q409_seasonal_mk" -> ((s, dir) =>
      canon(graft.seq.Forecast2.seasonalMannKendall(
        ev(s, dir).withColumn("dow",
          pmod(expr("ts div 86400000000000"), lit(7))),
        Seq("event_type"), "dow", "event_id", "value"))),
    // Dickey–Fuller rho t-statistic per event_type
    "q410_adf" -> ((s, dir) =>
      canon(graft.seq.Forecast2.adfStat(ev(s, dir),
        Seq("event_type"), "event_id", "value"))),
    // KPSS level-stationarity eta per event_type (Bartlett q=4)
    "q411_kpss" -> ((s, dir) =>
      canon(graft.seq.Forecast2.kpss(ev(s, dir),
        Seq("event_type"), "event_id", "value"))),
    // exact all-pairs Jaccard >= 0.9 via prefix filtering (PPJoin-lite);
    // the oracle is the BRUTE token join, so the gate proves the prefix
    // filter lossless on real data
    "q412_prefix_jaccard" -> ((s, dir) =>
      canon(graft.sim.SimJoin.prefixJaccardJoin(docs(s, dir),
        "doc_id", "text", tau = 0.9))),
    // exact TF-IDF cosine top-5 neighbors per doc (inverted index)
    "q413_tfidf_topk" -> ((s, dir) =>
      canon(graft.sim.SimJoin.tfidfTopK(docs(s, dir),
        "doc_id", "text", k = 5))),
    // 2-D skyline of parts: minimize avg price, maximize volume
    "q414_skyline" -> ((s, dir) => {
      val pts = table(s, dir, "lineitem").groupBy(col("l_partkey"))
        .agg((sum(fixedPointLong(col("l_extendedprice"), 4)).cast("double")
          / 1e4 / count(lit(1))).as("xv"),
          ((-sum(fixedPointLong(col("l_quantity"), 4))).cast("double")
            / 1e4 / count(lit(1))).as("yv"))
      canon(graft.post.Relational2.skyline2d(pts, "l_partkey", "xv", "yv"))
    }),
    // exact per-group mode with smallest-value tie-break
    "q415_group_mode" -> ((s, dir) =>
      canon(graft.post.Relational2.groupMode(ev(s, dir),
        "event_type", "value"))),
    // weighted median of price per return flag, weight = floor(quantity)
    "q416_weighted_median" -> ((s, dir) =>
      canon(graft.post.Relational2.weightedMedian(
        table(s, dir, "lineitem").withColumn("w",
          floor(col("l_quantity")).cast("long")),
        "l_returnflag", "l_extendedprice", "w"))),
    // CUBE profile over (source, lang) with grouping_id
    "q417_cube_profile" -> ((s, dir) =>
      canon(docs(s, dir).cube(col("source"), col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
          grouping_id().as("gid")))),
    // top-5 per group by value (Spark plans this as WindowGroupLimit)
    "q418_topk_per_group" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      canon(ev(s, dir).where(col("value").isNotNull)
        .withColumn("rn", row_number().over(Window
          .partitionBy(col("event_type"))
          .orderBy(col("value").desc, col("event_id").asc)))
        .where(col("rn") <= 5)
        .select(col("event_type"), col("event_id"), col("value"), col("rn")))
    }),
    // restricted mean survival time at a 20-day horizon
    "q419_rmst" -> ((s, dir) =>
      canon(graft.model.Survival.rmst(
        DiagQueries.survivalSubjects(s, dir), "dur", "event", tau = 20L))),
    // Gehan–Breslow–Wilcoxon weighted log-rank, even vs odd users
    "q420_gehan" -> ((s, dir) =>
      canon(graft.model.Survival.gehanLogRank(
        DiagQueries.survivalSubjects(s, dir), "dur", "event", "grp",
        "even", "odd"))),
    // difference-in-differences: even users × second half of the month
    "q421_did" -> ((s, dir) =>
      canon(graft.model.Causal.diffInDiff(
        ev(s, dir)
          .withColumn("treat", pmod(col("user_id"), lit(2)) === 0)
          .withColumn("post",
            pmod(expr("ts div 86400000000000"), lit(30)) >= 15),
        "treat", "post", "value"))),
    // post-stratified ATE with event_type strata
    "q422_post_strat" -> ((s, dir) =>
      canon(graft.model.Causal.postStratATE(
        ev(s, dir).withColumn("treat", pmod(col("user_id"), lit(2)) === 0),
        "event_type", "treat", "value"))),
    // delta-method CI for the per-type ratio metric Σvalue / Σweight
    "q423_delta_ratio" -> ((s, dir) =>
      canon(graft.model.Causal.deltaRatioCI(
        ev(s, dir).withColumn("wt",
          (pmod(col("user_id"), lit(5)) + 1).cast("double")),
        "event_type", "value", "wt"))),
    // two-proportion MDE planner per event_type (spike rate > 160)
    "q424_power_mde" -> ((s, dir) =>
      canon(graft.model.Causal.powerMde(
        ev(s, dir).where(col("value").isNotNull)
          .withColumn("pos", col("value") > 160.0),
        "event_type", "pos"))),
    // per-QI-group l-diversity (distinct + entropy) of a mod-7 sensitive
    "q425_l_diversity" -> ((s, dir) =>
      canon(graft.model.Profiler.lDiversity(
        docs(s, dir).withColumn("sens", pmod(col("doc_id"), lit(7))),
        Seq("source", "lang"), "sens"))),
    // per-QI-group t-closeness (ordered EMD) of the same sensitive
    "q426_t_closeness" -> ((s, dir) =>
      canon(graft.model.Profiler.tCloseness(
        docs(s, dir).withColumn("sens", pmod(col("doc_id"), lit(7))),
        Seq("source", "lang"), "sens"))),
    // linear-time MMD over embeddings, even vs odd vec_id, RBF σ²=1
    "q427_mmd" -> ((s, dir) =>
      canon(graft.sim.SimJoin.mmdLinear(
        table(s, dir, "embeddings")
          .withColumn("isB", pmod(col("vec_id"), lit(2)) === 1),
        "vec_id", "embedding", "isB", sigma2 = 1.0))),
    // Fisher's exact one-sided p on exposure (even doc) × lang = en.
    // doc_id < 2000 keeps the 2x2 total BOUNDED at any scale factor
    // (Fisher is a small-table test; fisherExact hard-fails past maxN)
    "q428_fisher" -> ((s, dir) =>
      canon(graft.model.Tests2.fisherExact(
        docs(s, dir).where(col("doc_id") < 2000)
          .withColumn("exposed", pmod(col("doc_id"), lit(2)) === 0)
          .withColumn("pos", col("lang") === "en"),
        "exposed", "pos"))),
    // sampled closeness + eccentricity from one BFS frame (q356's graph)
    "q429_closeness" -> ((s, dir) =>
      canon(graft.graph.Graph.closenessCentrality(
        MultiQueries.bipartite(s, dir), "src", "dst",
        sources = 8, maxDepth = 4))),
    // Katz centrality, dyadic alpha = 1/16, 6 integer-exact rounds
    "q430_katz" -> ((s, dir) =>
      canon(graft.graph.Graph.katzCentrality(
        MultiQueries.bipartite(s, dir), "src", "dst", iters = 6))),
    // STREAMING Croston batch-executed (q100 pattern): the q407 oracle
    // gates the flatMapGroupsWithState path itself
    "q431_croston_stream" -> ((s, dir) => {
      import s.implicits._
      val evd = ev(s, dir)
        .withColumn("d",
          when(col("value") > 120, col("value") - 120).otherwise(0.0))
        .select(col("user_id").cast("string").as("entity"),
          col("event_id").cast("long").as("seq"),
          col("d").cast("double").as("value"))
        .as[graft.streaming.StreamScorers.ValueEvent]
      canon(graft.streaming.StreamScorers.crostonStream(evd).toDF()
        .select(col("entity").as("key"), col("seq"), col("value"),
          col("score")))
    }),
    // STREAMING Theta batch-executed (q100 pattern): the q405 oracle
    "q432_theta_stream" -> ((s, dir) => {
      import s.implicits._
      val evd = ev(s, dir)
        .select(col("user_id").cast("string").as("entity"),
          col("event_id").cast("long").as("seq"),
          col("value").cast("double").as("value"))
        .as[graft.streaming.StreamScorers.ValueEvent]
      canon(graft.streaming.StreamScorers.thetaStream(evd).toDF()
        .select(col("entity").as("key"), col("seq"), col("value"),
          col("score")))
    }),
    // delete-one-block jackknife SE of the per-type mean (blocks =
    // user_id mod 20) — the deterministic bootstrap stand-in
    "q433_jackknife" -> ((s, dir) =>
      canon(graft.model.Resample.jackknifeSE(
        ev(s, dir).withColumn("blk", pmod(col("user_id"), lit(20))),
        "event_type", "blk", "value"))),
    // Chapman capture–recapture over two simulated crawls of documents
    "q434_capture_recapture" -> ((s, dir) =>
      canon(graft.model.Resample.captureRecapture(
        docs(s, dir)
          .withColumn("inA", pmod(col("doc_id"), lit(3)) =!= 0)
          .withColumn("inB", pmod(col("doc_id"), lit(5)) =!= 0),
        "text", "inA", "inB"))),
    // Chao1 vocabulary-richness per source
    "q435_chao1" -> ((s, dir) =>
      canon(graft.model.Resample.chao1(
        docs(s, dir).select(col("source"),
          explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
          .where(col("tok") =!= ""),
        "source", "tok"))),
    // Good–Turing adjusted counts r* for r = 1..5 per source
    "q436_good_turing" -> ((s, dir) =>
      canon(graft.model.Resample.goodTuring(
        docs(s, dir).select(col("source"),
          explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
          .where(col("tok") =!= ""),
        "source", "tok", maxR = 5))),
    // add-½-smoothed unigram KL between the first two sources
    "q437_unigram_kl" -> ((s, dir) =>
      canon(graft.text.TextOps.unigramKL(docs(s, dir), "source", "text",
        "src1", "src2", alpha = 0.5))),
    // Monroe log-odds distinctive terms, src1 vs src2
    "q438_log_odds" -> ((s, dir) =>
      canon(graft.text.TextOps.logOddsTerms(docs(s, dir), "source",
        "text", "src1", "src2", priorScale = 10.0, minCount = 5L))),
    // Cliff's delta effect size, click vs error values
    "q439_cliffs_delta" -> ((s, dir) =>
      canon(graft.model.Tests2.cliffsDelta(ev(s, dir), "event_type",
        "value", "click", "error"))),
    // Yuen's 20%-trimmed robust two-sample t, click vs error
    "q440_yuen" -> ((s, dir) =>
      canon(graft.model.Tests2.yuenTrimmedT(ev(s, dir), "event_type",
        "value", "click", "error", gamma = 0.2))),
    // individuals / moving-range chart per event_type
    "q442_imr" -> ((s, dir) =>
      canon(graft.model.Spc.imrChart(ev(s, dir), "event_type",
        "event_id", "value"))),
    // binary transfer entropy click→error over aligned daily means
    "q443_transfer_entropy" -> ((s, dir) => {
      def dayMean(t: String, as: String) =
        ev(s, dir).where(col("value").isNotNull &&
            col("event_type") === t)
          .withColumn("day", expr("ts div 86400000000000"))
          .groupBy(col("day"))
          .agg((sum(fixedPointLong(col("value"), 4)).cast("double")
            / 1e4 / count(lit(1))).as(as))
      val ser = dayMean("click", "xv").join(dayMean("error", "yv"), "day")
        .withColumn("k", lit("click->error"))
      canon(graft.model.Assoc.transferEntropy(ser, Seq("k"), "day",
        "xv", "yv"))
    }),
    // Granger F x→y over the same aligned daily means as q443
    "q444_granger" -> ((s, dir) => {
      def dayMean(t: String, as: String) =
        ev(s, dir).where(col("value").isNotNull &&
            col("event_type") === t)
          .withColumn("day", expr("ts div 86400000000000"))
          .groupBy(col("day"))
          .agg((sum(fixedPointLong(col("value"), 4)).cast("double")
            / 1e4 / count(lit(1))).as(as))
      val ser = dayMean("click", "xv").join(dayMean("error", "yv"), "day")
        .withColumn("k", lit("click->error"))
      canon(graft.model.Assoc.grangerF(ser, Seq("k"), "day", "xv", "yv"))
    }),
    // Newey–West HAC slope inference, value on day per event_type
    "q445_newey_west" -> ((s, dir) =>
      canon(graft.model.Assoc.neweyWestSlope(
        ev(s, dir).withColumn("day", expr("ts div 86400000000000")),
        Seq("event_type"), "event_id", "day", "value"))),
    // Goh–Barabási burstiness + memory per event_type
    "q446_burstiness" -> ((s, dir) =>
      canon(graft.seq.SeqOps.burstiness(ev(s, dir), Seq("event_type"),
        "ts", "event_id"))),
    // rank-biased overlap at depth 50 between the length ranking and
    // the synthetic quality ranking of documents
    "q447_rbo" -> ((s, dir) =>
      canon(graft.seq.SeqOps.rankBiasedOverlap(
        docs(s, dir)
          .withColumn("sa", col("n_chars").cast("double"))
          .withColumn("sb",
            pmod(col("doc_id") * 37 + col("n_chars"), lit(1000))
              .cast("double")),
        "doc_id", "sa", "sb", depth = 50, p = 0.9))),
    // quality-aware dedup survivors: keep the LONGEST copy per minhash
    // dup cluster (the q75 closure under the real curation policy)
    "q449_best_survivor" -> ((s, dir) => {
      val d = docs(s, dir)
      val cand = graft.text.TextOps.minhashPairs(d, "doc_id", "text",
        shingleSize = 3, numHashes = 16, bandSize = 4)
      val cl = graft.text.TextOps.dupClusters(d, "doc_id", cand)
      graft.text.TextOps.bestSurvivor(cl, d, "doc_id", "n_chars")
    }),
    // Heaps' law exponent across sources: OLS of ln(types) on
    // ln(tokens) over the per-source vocabulary points (6dp-frozen logs
    // so the 20-point sums are combine-order exact)
    "q450_heaps" -> ((s, dir) => {
      val pts = docs(s, dir).select(col("source"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
        .where(col("tok") =!= "")
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
        .groupBy(col("source"))
        .agg(sum(col("c")).as("nt"), count(lit(1)).as("dt"))
      val fp6c = (c: org.apache.spark.sql.Column) =>
        floor(c * 1e6 + 0.5).cast("long")
      val s6 = pts.select(
        fp6c(log(col("nt").cast("double"))).as("lx"),
        fp6c(log(col("dt").cast("double"))).as("ly"))
      val agg = s6.agg(count(lit(1)).as("n_points"),
        sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
        sum((col("lx") * col("lx")).cast("decimal(38,0)")).as("sxx"),
        sum((col("lx") * col("ly")).cast("decimal(38,0)")).as("sxy"))
      val n = col("n_points").cast("double")
      val beta = (n * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
        (n * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double"))
      canon(agg.select(col("n_points"), beta.as("beta"),
        exp((col("sy").cast("double") - beta * col("sx").cast("double")) /
          n / 1e6).as("k")))
    }),
    // Huber IRLS robust slope (2 reweighting rounds), value on day
    "q448_huber" -> ((s, dir) =>
      canon(graft.model.Assoc.huberFit(
        ev(s, dir).withColumn("day", expr("ts div 86400000000000")),
        Seq("event_type"), "day", "value"))),
    // Aalen–Johansen cumulative incidence, competing spike causes
    // (even- vs odd-user spikes over the survival fixture)
    "q451_aalen_johansen" -> ((s, dir) => {
      val subj = DiagQueries.survivalSubjects(s, dir)
        .withColumn("c1", col("event") && col("grp") === "even")
        .withColumn("c2", col("event") && col("grp") === "odd")
      canon(graft.model.Survival.aalenJohansen(subj, "dur", "c1", "c2"))
    }),
    // beta-binomial / negative-binomial overdispersion MoM per type
    // over daily spike windows
    "q452_overdispersion" -> ((s, dir) =>
      canon(graft.model.Fitters.overdispersionMoM(
        ev(s, dir).where(col("value").isNotNull),
        "event_type", expr("ts div 86400000000000"),
        col("value") > 160.0))),
    // tokenizer fertility per lang: BPE tokens per whitespace word
    // (the q185 trained-merges encoder under a per-lang roll-up)
    "q441_fertility" -> ((s, dir) => {
      val rules = graft.text.TextOps.bpeTrain(docs(s, dir), "doc_id",
        "text", nMerges = 10, vocabTopN = 1000)
        .collect().sortBy(_.getAs[Int]("round"))
        .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
      val enc = graft.text.TextOps.bpeEncode(docs(s, dir), "doc_id",
        "text", rules)
      val words = docs(s, dir).select(col("doc_id"), col("lang"),
        size(graft.text.TextOps.tokens(col("text"))).cast("long")
          .as("n_words"))
      canon(enc.join(words, "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_bpe")).as("bpe_total"),
          sum(col("n_words")).as("words_total"))
        .withColumn("fertility", col("bpe_total").cast("double") /
          col("words_total").cast("double")))
    }),
  )

  /** 4dp fixed-point long of a SQL expression (half away from zero). */
  private def fp4(c: String) =
    s"(CASE WHEN $c >= 0 THEN floor(($c)*10000.0+0.5) " +
      s"ELSE -floor(-($c)*10000.0+0.5) END)::BIGINT"

  /** 6dp fixed-point long of a SQL expression (half away from zero). */
  private def fp6s(c: String) =
    s"(CASE WHEN $c >= 0 THEN floor(($c)*1000000.0+0.5) " +
      s"ELSE -floor(-($c)*1000000.0+0.5) END)::BIGINT"

  /** The survival-subjects fixture CTEs (q341's device). */
  private val subjSql =
    """dd AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
      |  value FROM events),
      |per AS (SELECT user_id, min(day) AS fd, max(day) AS ld,
      |  min(CASE WHEN value > 250.0 THEN day END) AS hd
      | FROM dd GROUP BY 1),
      |subj AS (SELECT
      |  CASE WHEN hd IS NOT NULL THEN hd - fd ELSE ld - fd END AS dur,
      |  hd IS NOT NULL AS event,
      |  CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS grp
      | FROM per)""".stripMargin.replace("\n", " ")

  private val rankedSql =
    """e AS (SELECT user_id AS q, event_id AS id, value AS score,
      |  (event_id % 4)::BIGINT AS rel, event_id % 3 = 0 AS y
      | FROM events WHERE value IS NOT NULL),
      |r AS (SELECT *,
      |  row_number() OVER (PARTITION BY q ORDER BY score DESC, id) AS rn
      | FROM e)""".stripMargin.replace("\n", " ")

  private val ratersSql =
    """rt AS (SELECT doc_id AS item, unnest([
      |  (n_chars % 4)::BIGINT,
      |  ((n_chars + (doc_id % 7)) % 4)::BIGINT,
      |  ((n_chars + 2*(doc_id % 7)) % 4)::BIGINT]) AS cat
      | FROM documents)""".stripMargin.replace("\n", " ")

  private val oracles0: Map[String, String] = Map(
    "q384_ndcg" ->
      s"""WITH $rankedSql,
         |ri AS (SELECT *,
         |  row_number() OVER (PARTITION BY q ORDER BY rel DESC, id) AS rix
         | FROM r),
         |g AS (SELECT q, count(*) AS n_cand,
         |  sum(CASE WHEN rn <= 10 THEN floor(rel::DOUBLE /
         |    (ln((2 + rn - 1)::DOUBLE) / ln(2.0)) * 1000000.0 + 0.5)::BIGINT
         |   ELSE 0 END) AS dcgfp,
         |  sum(CASE WHEN rix <= 10 THEN floor(rel::DOUBLE /
         |    (ln((2 + rix - 1)::DOUBLE) / ln(2.0)) * 1000000.0 + 0.5)::BIGINT
         |   ELSE 0 END) AS idcgfp
         | FROM ri GROUP BY q)
         |SELECT q, n_cand,
         | round(dcgfp::DOUBLE / 1000000.0, 4) AS dcg,
         | round(idcgfp::DOUBLE / 1000000.0, 4) AS idcg,
         | round(CASE WHEN idcgfp::DOUBLE / 1000000.0 > 0
         |   THEN (dcgfp::DOUBLE / 1000000.0) / (idcgfp::DOUBLE / 1000000.0)
         |   ELSE 0.0 END, 4) + 0 AS ndcg
         |FROM g""".stripMargin.replace("\n", " "),
    "q385_map" ->
      s"""WITH $rankedSql,
         |c AS (SELECT *, sum(CASE WHEN y THEN 1 ELSE 0 END) OVER
         |   (PARTITION BY q ORDER BY score DESC, id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         | FROM r),
         |g AS (SELECT q,
         |  sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS n_rel,
         |  sum(CASE WHEN rn <= 10 AND y THEN
         |    floor(cum::DOUBLE / rn::DOUBLE * 1000000.0 + 0.5)::BIGINT
         |   ELSE 0 END) AS apfp
         | FROM c GROUP BY q)
         |SELECT q, n_rel,
         | round(CASE WHEN n_rel > 0 THEN
         |   apfp::DOUBLE / 1000000.0 / least(n_rel, 10)::DOUBLE
         |  ELSE 0.0 END, 4) + 0 AS ap
         |FROM g""".stripMargin.replace("\n", " "),
    "q386_mrr" ->
      s"""WITH $rankedSql,
         |g AS (SELECT q,
         |  coalesce(min(CASE WHEN y AND rn <= 10 THEN rn END), 0)::BIGINT
         |    AS first_rank
         | FROM r GROUP BY q)
         |SELECT q, first_rank,
         | round(CASE WHEN first_rank > 0 THEN 1.0 / first_rank::DOUBLE
         |  ELSE 0.0 END, 4) AS rr
         |FROM g""".stripMargin.replace("\n", " "),
    "q387_precision_at_k" ->
      s"""WITH $rankedSql,
         |g AS (SELECT q,
         |  sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS n_rel,
         |  sum(CASE WHEN rn <= 10 AND y THEN 1 ELSE 0 END)::BIGINT AS hits,
         |  sum(CASE WHEN rn <= 10 THEN 1 ELSE 0 END)::BIGINT AS k_
         | FROM r GROUP BY q)
         |SELECT q, n_rel, hits,
         | round(hits::DOUBLE / k_::DOUBLE, 4) AS p_at_k,
         | round(CASE WHEN n_rel > 0 THEN hits::DOUBLE / n_rel::DOUBLE
         |  ELSE 0.0 END, 4) AS r_at_k
         |FROM g""".stripMargin.replace("\n", " "),
    "q388_decile_lift" ->
      """WITH e AS (SELECT
        |  (CASE WHEN value >= 0 THEN floor(value*10000.0+0.5)
        |    ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS s,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        | FROM events WHERE value IS NOT NULL),
        |h AS (SELECT s, count(*)::BIGINT AS ns, sum(y)::BIGINT AS pos
        | FROM e GROUP BY s),
        |t AS (SELECT sum(ns)::BIGINT AS n, sum(pos)::BIGINT AS p FROM h),
        |c AS (SELECT s, ns, pos,
        |  sum(ns) OVER (ORDER BY s DESC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ns AS cb
        | FROM h),
        |b AS (SELECT least(9, floor(cb * 10 / t.n)::INT) AS bin, ns, pos,
        |  t.n AS nt, t.p AS pt FROM c CROSS JOIN t),
        |g AS (SELECT bin, sum(ns)::BIGINT AS n, sum(pos)::BIGINT AS pos,
        |  max(nt) AS nt, max(pt) AS pt FROM b GROUP BY bin)
        |SELECT bin, n, pos,
        | round(pos::DOUBLE / n::DOUBLE, 4) AS pos_rate,
        | round(CASE WHEN pt > 0 THEN
        |   (pos::DOUBLE / n::DOUBLE) / (pt::DOUBLE / nt::DOUBLE)
        |  ELSE 0.0 END, 4) AS lift,
        | round(CASE WHEN pt > 0 THEN
        |   (sum(pos) OVER (ORDER BY bin
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
        |    / pt::DOUBLE
        |  ELSE 0.0 END, 4) AS cum_gain
        |FROM g""".stripMargin.replace("\n", " "),
    "q389_ks_separation" ->
      """WITH e AS (SELECT
        |  (CASE WHEN value >= 0 THEN floor(value*10000.0+0.5)
        |    ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS s,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        | FROM events WHERE value IS NOT NULL),
        |h AS (SELECT s, count(*)::BIGINT AS ns, sum(y)::BIGINT AS pos
        | FROM e GROUP BY s),
        |t AS (SELECT sum(pos)::BIGINT AS p,
        |  sum(ns - pos)::BIGINT AS q_ FROM h),
        |c AS (SELECT s,
        |  sum(pos) OVER (ORDER BY s
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
        |  sum(ns - pos) OVER (ORDER BY s
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
        | FROM h),
        |d AS (SELECT s, abs(cp * t.q_ - cn * t.p) AS dnum, t.p, t.q_
        | FROM c CROSS JOIN t),
        |m AS (SELECT p, q_, max(dnum) AS dmax FROM d GROUP BY 1, 2)
        |SELECT m.p AS n_pos, m.q_ AS n_neg,
        | round(CASE WHEN m.p > 0 AND m.q_ > 0 THEN
        |   m.dmax::DOUBLE / (m.p::DOUBLE * m.q_::DOUBLE)
        |  ELSE 0.0 END, 4) AS ks,
        | round(min(d.s)::DOUBLE / 10000.0, 4) + 0 AS threshold
        |FROM d JOIN m ON d.p = m.p AND d.q_ = m.q_ AND d.dnum = m.dmax
        |GROUP BY m.p, m.q_, m.dmax"""
        .stripMargin.replace("\n", " "),
    "q390_brier" ->
      """WITH e AS (SELECT
        |  floor(((doc_id*37 + n_chars) % 1000)::DOUBLE / 1000.0
        |    * 10000.0 + 0.5)::BIGINT AS pfp,
        |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        | FROM documents),
        |b AS (SELECT least(9, floor(pfp * 10 / 10000)::INT) AS bin, pfp, y
        | FROM e),
        |pb AS (SELECT bin, count(*)::BIGINT AS nk, sum(y)::BIGINT AS ok,
        |  sum(pfp)::DECIMAL(38,0) AS sfk,
        |  sum(pfp * pfp)::DECIMAL(38,0) AS sfk2,
        |  sum(pfp * y)::DECIMAL(38,0) AS sfy
        | FROM b GROUP BY bin),
        |f AS (SELECT nk, ok,
        |  sfk2::DOUBLE / 100000000.0 - 2.0 * sfy::DOUBLE / 10000.0
        |    + ok::DOUBLE AS bss,
        |  nk::DOUBLE * (sfk::DOUBLE / 10000.0 / nk::DOUBLE
        |    - ok::DOUBLE / nk::DOUBLE)
        |   * (sfk::DOUBLE / 10000.0 / nk::DOUBLE
        |    - ok::DOUBLE / nk::DOUBLE) AS rels,
        |  nk::DOUBLE * (ok::DOUBLE / nk::DOUBLE)
        |   * (ok::DOUBLE / nk::DOUBLE) AS ress
        | FROM pb),
        |g AS (SELECT sum(nk)::BIGINT AS n, sum(ok)::BIGINT AS o,
        |  sum(floor(bss * 1000000.0 + 0.5)::BIGINT) AS bsfp,
        |  sum(floor(rels * 1000000.0 + 0.5)::BIGINT) AS relfp,
        |  sum(floor(ress * 1000000.0 + 0.5)::BIGINT) AS ressfp
        | FROM f)
        |SELECT n,
        | round(bsfp::DOUBLE / 1000000.0 / n::DOUBLE, 4) AS bs,
        | round(relfp::DOUBLE / 1000000.0 / n::DOUBLE, 4) AS reliability,
        | round(ressfp::DOUBLE / 1000000.0 / n::DOUBLE
        |   - (o::DOUBLE / n::DOUBLE) * (o::DOUBLE / n::DOUBLE), 4) + 0
        |  AS resolution,
        | round((o::DOUBLE / n::DOUBLE)
        |   * (1.0 - o::DOUBLE / n::DOUBLE), 4) AS uncertainty
        |FROM g""".stripMargin.replace("\n", " "),
    "q391_weighted_kappa" ->
      """WITH d AS (SELECT (n_chars % 5)::BIGINT AS i,
        |  least(4, greatest(0, (n_chars % 5) + (doc_id % 3) - 1))::BIGINT AS j
        | FROM documents),
        |o AS (SELECT i, j, count(*)::BIGINT AS c FROM d GROUP BY 1, 2),
        |ra AS (SELECT i, sum(c)::BIGINT AS ci FROM o GROUP BY i),
        |rb AS (SELECT j, sum(c)::BIGINT AS cj FROM o GROUP BY j),
        |wo AS (SELECT sum(c)::BIGINT AS n,
        |  sum(c*(i-j)*(i-j))::DECIMAL(38,0) AS wo_ FROM o),
        |we AS (SELECT sum(ci*cj*(i-j)*(i-j))::DECIMAL(38,0) AS we_
        | FROM ra CROSS JOIN rb)
        |SELECT n, round(1.0 - wo_::DOUBLE * n::DOUBLE / we_::DOUBLE, 4) + 0
        |  AS kappa_w
        |FROM wo CROSS JOIN we""".stripMargin.replace("\n", " "),
    "q392_fleiss_kappa" ->
      s"""WITH $ratersSql,
         |cnt AS (SELECT item, cat, count(*)::BIGINT AS c
         | FROM rt GROUP BY 1, 2),
         |it AS (SELECT item, sum(c)::BIGINT AS m,
         |  sum(c*c)::BIGINT AS s2 FROM cnt GROUP BY item),
         |ok AS (SELECT item, m, s2 FROM it WHERE m = 3),
         |ag AS (SELECT count(*)::BIGINT AS n_items,
         |  sum(s2 - m)::BIGINT AS pnum FROM ok),
         |ct AS (SELECT cat, sum(c)::BIGINT AS tc FROM cnt
         | JOIN ok USING (item) GROUP BY cat),
         |ct2 AS (SELECT sum((tc*tc)::DECIMAL(38,0))::DOUBLE AS t2 FROM ct),
         |pe AS (SELECT ct2.t2 /
         |   (ag.n_items::DOUBLE * 3 * ag.n_items::DOUBLE * 3) AS pe_
         | FROM ct2 CROSS JOIN ag)
         |SELECT ag.n_items, 3 AS n_raters,
         | round((ag.pnum::DOUBLE / (ag.n_items::DOUBLE * 6.0) - pe.pe_)
         |   / (1.0 - pe.pe_), 4) + 0 AS kappa
         |FROM ag CROSS JOIN pe""".stripMargin.replace("\n", " "),
    "q393_krippendorff" ->
      s"""WITH $ratersSql,
         |cnt AS (SELECT item, cat, count(*)::BIGINT AS c
         | FROM rt GROUP BY 1, 2),
         |it AS (SELECT item, sum(c)::BIGINT AS m, sum(c*c)::BIGINT AS s2
         | FROM cnt GROUP BY item HAVING sum(c) >= 2),
         |ds AS (SELECT sum(m)::BIGINT AS n_values,
         |  count(*)::BIGINT AS n_items,
         |  sum(floor((m*m - s2)::DOUBLE / (m - 1)::DOUBLE
         |    * 1000000.0 + 0.5)::BIGINT) AS dofp FROM it),
         |ct AS (SELECT cat, sum(c)::BIGINT AS tc FROM cnt
         | JOIN it USING (item) GROUP BY cat),
         |de AS (SELECT sum(tc)::BIGINT AS n_,
         |  (sum(tc)::BIGINT::DOUBLE * sum(tc)::BIGINT::DOUBLE
         |    - sum((tc*tc)::DECIMAL(38,0))::DOUBLE)
         |   / (sum(tc)::BIGINT - 1)::DOUBLE AS den FROM ct)
         |SELECT ds.n_items, ds.n_values,
         | round(1.0 - (ds.dofp::DOUBLE / 1000000.0)
         |   / (de.den / de.n_::DOUBLE * ds.n_values::DOUBLE / de.n_::DOUBLE),
         |  4) + 0 AS alpha
         |FROM ds CROSS JOIN de""".stripMargin.replace("\n", " "),
    "q453_mcc" ->
      """WITH sc AS (SELECT (n_chars % 53)::DOUBLE AS s, lang = 'en' AS y
        | FROM documents),
        |c AS (SELECT
        | sum(CASE WHEN s > 26.0 AND y THEN 1 ELSE 0 END)::BIGINT AS tp,
        | sum(CASE WHEN s > 26.0 AND NOT y THEN 1 ELSE 0 END)::BIGINT
        |   AS fp,
        | sum(CASE WHEN s <= 26.0 AND y THEN 1 ELSE 0 END)::BIGINT AS fn,
        | sum(CASE WHEN s <= 26.0 AND NOT y THEN 1 ELSE 0 END)::BIGINT
        |   AS tn FROM sc)
        |SELECT tp, fp, fn, tn,
        | round(CASE WHEN sqrt(((tp + fp)::HUGEINT * (tp + fn)::HUGEINT)::DOUBLE
        |    * ((tn + fp)::HUGEINT * (tn + fn)::HUGEINT)::DOUBLE) > 0
        |  THEN (tp::HUGEINT * tn::HUGEINT - fp::HUGEINT * fn::HUGEINT)::DOUBLE
        |   / sqrt(((tp + fp)::HUGEINT * (tp + fn)::HUGEINT)::DOUBLE
        |     * ((tn + fp)::HUGEINT * (tn + fn)::HUGEINT)::DOUBLE)
        |  ELSE 0.0 END, 4) + 0 AS mcc,
        | round((tp::DOUBLE / (tp + fn)::DOUBLE
        |   + tn::DOUBLE / (tn + fp)::DOUBLE) / 2.0, 4) AS balanced_acc
        |FROM c""".stripMargin.replace("\n", " "),
    "q394_brunner_munzel" ->
      s"""WITH h AS (SELECT ${fp4("value")} AS v,
         |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS ca,
         |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS cb
         | FROM events WHERE value IS NOT NULL
         |  AND event_type IN ('click', 'error') GROUP BY 1),
         |r AS (SELECT *, ca + cb AS ct FROM h),
         |r2 AS (SELECT *,
         |  2*(sum(ct) OVER w - ct) + ct + 1 AS pr2,
         |  2*(sum(ca) OVER w - ca) + ca + 1 AS ra2,
         |  2*(sum(cb) OVER w - cb) + cb + 1 AS rb2
         | FROM r WINDOW w AS (ORDER BY v ASC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |a AS (SELECT sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b,
         |  sum(ca*pr2)::BIGINT AS ra2s, sum(cb*pr2)::BIGINT AS rb2s,
         |  sum(ca*(pr2-ra2))::BIGINT AS da1,
         |  sum(ca::HUGEINT*(pr2-ra2)::HUGEINT*(pr2-ra2)::HUGEINT) AS da2,
         |  sum(cb*(pr2-rb2))::BIGINT AS db1,
         |  sum(cb::HUGEINT*(pr2-rb2)::HUGEINT*(pr2-rb2)::HUGEINT) AS db2
         | FROM r2),
         |f AS (SELECT n_a, n_b, n_a::DOUBLE AS na, n_b::DOUBLE AS nb,
         |  ra2s::DOUBLE / 2.0 / n_a::DOUBLE AS ma,
         |  rb2s::DOUBLE / 2.0 / n_b::DOUBLE AS mb,
         |  da1, da2, db1, db2 FROM a),
         |g AS (SELECT *, ma - (na+1)/2.0 AS ka, mb - (nb+1)/2.0 AS kb FROM f),
         |g2 AS (SELECT *,
         |  (da2::DOUBLE/4.0 - ka*da1::DOUBLE/2.0 - ka*da1::DOUBLE/2.0
         |    + ka*ka*na)/(na-1) AS va,
         |  (db2::DOUBLE/4.0 - kb*db1::DOUBLE/2.0 - kb*db1::DOUBLE/2.0
         |    + kb*kb*nb)/(nb-1) AS vb FROM g),
         |g3 AS (SELECT *, na*va AS nva, nb*vb AS nvb FROM g2)
         |SELECT n_a, n_b,
         | round((mb - (nb+1)/2.0)/na, 4) + 0 AS p_hat,
         | round(na*nb*(mb-ma)/(na+nb)/sqrt(nva+nvb), 4) + 0 AS w_stat,
         | round((nva+nvb)*(nva+nvb)
         |   /(nva*nva/(na-1) + nvb*nvb/(nb-1)), 4) AS df
         |FROM g3""".stripMargin.replace("\n", " "),
    "q395_ansari_bradley" ->
      s"""WITH h AS (SELECT ${fp4("value")} AS v,
         |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS ca,
         |  count(*)::BIGINT AS ct
         | FROM events WHERE value IS NOT NULL
         |  AND event_type IN ('click', 'error') GROUP BY 1),
         |t AS (SELECT sum(ct)::BIGINT AS n, sum(ca)::BIGINT AS na_ FROM h),
         |r AS (SELECT h.*, t.n, t.na_, t.n + 1 AS m,
         |  floor((t.n+1)/2.0)::BIGINT AS k,
         |  sum(ct) OVER w - ct AS l, sum(ct) OVER w AS u
         | FROM h CROSS JOIN t WINDOW w AS (ORDER BY v ASC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |s AS (SELECT *,
         |  (CASE WHEN u <= k THEN floor(u*(u+1)/2.0)
         |    ELSE floor(k*(k+1)/2.0) + (u-k)*m
         |      - floor((u*(u+1)-k*(k+1))/2.0) END)::BIGINT
         |  - (CASE WHEN l <= k THEN floor(l*(l+1)/2.0)
         |    ELSE floor(k*(k+1)/2.0) + (l-k)*m
         |      - floor((l*(l+1)-k*(k+1))/2.0) END)::BIGINT AS sv
         | FROM r),
         |a AS (SELECT max(na_)::BIGINT AS n_a, max(n - na_)::BIGINT AS n_b,
         |  sum(floor(ca::DOUBLE * sv::DOUBLE / ct::DOUBLE
         |    * 1000000.0 + 0.5)::BIGINT) AS abfp,
         |  sum(sv)::BIGINT AS ssum,
         |  sum(floor(sv::DOUBLE * sv::DOUBLE / ct::DOUBLE
         |    * 1000000.0 + 0.5)::BIGINT) AS s2fp
         | FROM s),
         |f AS (SELECT n_a, n_b, n_a::DOUBLE AS na, n_b::DOUBLE AS nb,
         |  n_a::DOUBLE + n_b::DOUBLE AS nn,
         |  abfp::DOUBLE/1000000.0 AS ab,
         |  ssum::DOUBLE AS ss, s2fp::DOUBLE/1000000.0 AS s2 FROM a)
         |SELECT n_a, n_b, round(ab, 4) AS ab_stat,
         | round((ab - na*(ss/nn))
         |   / sqrt(na*nb/(nn*(nn-1)) * (s2 - nn*(ss/nn)*(ss/nn))), 4) + 0 AS z
         |FROM f""".stripMargin.replace("\n", " "),
    "q396_jonckheere" ->
      s"""WITH e AS (SELECT (user_id % 3)::BIGINT AS d, ${fp4("value")} AS v
         | FROM events WHERE value IS NOT NULL),
         |h AS (SELECT d, v, count(*)::BIGINT AS c FROM e GROUP BY 1, 2),
         |ds_ AS (SELECT DISTINCT d FROM h),
         |vs AS (SELECT DISTINCT v FROM h),
         |fl AS (SELECT vs.v, ds_.d, coalesce(h.c, 0)::BIGINT AS c
         | FROM vs CROSS JOIN ds_
         | LEFT JOIN h ON h.d = ds_.d AND h.v = vs.v),
         |cum AS (SELECT v, d, c,
         |  sum(c) OVER (PARTITION BY d ORDER BY v
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS cb
         | FROM fl),
         |j AS (SELECT sum(hi.c::HUGEINT * (2*lo.cb + lo.c)::HUGEINT) AS j2
         | FROM cum lo JOIN cum hi ON lo.v = hi.v AND lo.d < hi.d),
         |sz AS (SELECT count(*)::BIGINT AS k, sum(ng)::BIGINT AS n,
         |  sum(ng*ng)::BIGINT AS sq,
         |  sum((ng*ng)::HUGEINT * (2*ng+3)::HUGEINT) AS sq3
         | FROM (SELECT d, sum(c)::BIGINT AS ng FROM h GROUP BY d))
         |SELECT sz.n, sz.k, round(j.j2::DOUBLE/2.0, 4) AS j_stat,
         | round((j.j2::DOUBLE/2.0
         |    - (sz.n::DOUBLE*sz.n::DOUBLE - sz.sq::DOUBLE)/4.0)
         |  / sqrt((sz.n::DOUBLE*sz.n::DOUBLE*(2.0*sz.n::DOUBLE+3)
         |    - sz.sq3::DOUBLE)/72.0), 4) + 0 AS z
         |FROM j CROSS JOIN sz""".stripMargin.replace("\n", " "),
    "q397_cochran_armitage" ->
      """WITH g AS (SELECT (doc_id % 4)::BIGINT AS s,
        |  count(*)::BIGINT AS ni,
        |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS ri
        | FROM documents GROUP BY 1),
        |a AS (SELECT sum(ni)::BIGINT AS n, sum(ri)::BIGINT AS n_pos,
        |  sum(s*ri)::BIGINT AS sr, sum(s*ni)::BIGINT AS sn,
        |  sum(s*s*ni)::BIGINT AS s2n FROM g),
        |f AS (SELECT n, n_pos, n::DOUBLE AS nd,
        |  n_pos::DOUBLE / n::DOUBLE AS p, sr, sn, s2n FROM a)
        |SELECT n, n_pos,
        | round((sr::DOUBLE - p * sn::DOUBLE)
        |   / sqrt(p * (1.0 - p) * (s2n::DOUBLE
        |     - sn::DOUBLE * sn::DOUBLE / nd)), 4) + 0 AS z
        |FROM f""".stripMargin.replace("\n", " "),
    "q398_cmh" ->
      """WITH cc AS (SELECT source,
        |  sum(CASE WHEN doc_id % 2 = 0 AND lang = 'en'
        |    THEN 1 ELSE 0 END)::BIGINT AS a,
        |  sum(CASE WHEN doc_id % 2 = 0 AND lang <> 'en'
        |    THEN 1 ELSE 0 END)::BIGINT AS b,
        |  sum(CASE WHEN doc_id % 2 <> 0 AND lang = 'en'
        |    THEN 1 ELSE 0 END)::BIGINT AS c,
        |  sum(CASE WHEN doc_id % 2 <> 0 AND lang <> 'en'
        |    THEN 1 ELSE 0 END)::BIGINT AS d
        | FROM documents GROUP BY source),
        |cells AS (SELECT *, (a+b+c+d)::DOUBLE AS nk, a::DOUBLE AS aD,
        |  b::DOUBLE AS bD, c::DOUBLE AS cD, d::DOUBLE AS dD FROM cc
        | WHERE a+b > 0 AND c+d > 0 AND a+c > 0 AND b+d > 0),
        |s1 AS (SELECT count(*)::BIGINT AS k, sum(a)::BIGINT AS asum,
        |  sum(floor((aD+bD)*(aD+cD)/nk*1000000.0+0.5)::BIGINT) AS efp,
        |  sum(floor((aD+bD)*(cD+dD)*(aD+cD)*(bD+dD)
        |    /(nk*nk*(nk-1))*1000000.0+0.5)::BIGINT) AS vfp,
        |  sum(floor(aD*dD/nk*1000000.0+0.5)::BIGINT) AS adfp,
        |  sum(floor(bD*cD/nk*1000000.0+0.5)::BIGINT) AS bcfp
        | FROM cells),
        |orr AS (SELECT (adfp::DOUBLE/1000000.0)/(bcfp::DOUBLE/1000000.0)
        |  AS orv FROM s1),
        |pre AS (SELECT cells.*, orr.orv, aD+bD AS n1, cD+dD AS n0,
        |  aD+cD AS m1 FROM cells CROSS JOIN orr),
        |q AS (SELECT *, orv - 1.0 AS qa,
        |  -(orv*(n1+m1) + (n0-m1)) AS qb, orv*n1*m1 AS qc FROM pre),
        |rt AS (SELECT *, CASE WHEN abs(qa) < 1e-12 THEN -qc/qb ELSE
        |  (CASE WHEN (-qb - sqrt(qb*qb - 4.0*qa*qc))/(2.0*qa)
        |      > greatest(0.0, m1-n0)
        |     AND (-qb - sqrt(qb*qb - 4.0*qa*qc))/(2.0*qa) < least(n1, m1)
        |    THEN (-qb - sqrt(qb*qb - 4.0*qa*qc))/(2.0*qa)
        |    ELSE (-qb + sqrt(qb*qb - 4.0*qa*qc))/(2.0*qa) END) END
        |  AS root FROM q),
        |bd AS (SELECT sum(floor((aD-root)*(aD-root)
        |  /(1.0/(1.0/root + 1.0/(m1-root) + 1.0/(n1-root)
        |    + 1.0/(n0-m1+root)))*1000000.0+0.5)::BIGINT) AS bdfp FROM rt)
        |SELECT s1.k,
        | round((adfp::DOUBLE/1000000.0)/(bcfp::DOUBLE/1000000.0), 4)
        |  AS or_mh,
        | round((asum::DOUBLE - efp::DOUBLE/1000000.0)
        |   *(asum::DOUBLE - efp::DOUBLE/1000000.0)
        |   /(vfp::DOUBLE/1000000.0), 4) AS cmh_chi2,
        | round(bdfp::DOUBLE/1000000.0, 4) AS bd_chi2
        |FROM s1 CROSS JOIN bd""".stripMargin.replace("\n", " "),
    "q400_dagostino" ->
      s"""WITH fx AS (SELECT event_type AS key, ${fp4("value")} AS fp
         | FROM events WHERE value IS NOT NULL),
         |s AS (SELECT key, count(*)::BIGINT AS n, sum(fp::HUGEINT) AS s1,
         |  sum(fp::HUGEINT * fp::HUGEINT) AS s2,
         |  sum((fp::HUGEINT * fp::HUGEINT) * fp::HUGEINT) AS s3,
         |  sum((fp::HUGEINT * fp::HUGEINT) * (fp::HUGEINT * fp::HUGEINT))
         |    AS s4
         | FROM fx GROUP BY 1 HAVING count(*) >= 20),
         |m AS (SELECT key, n, n::DOUBLE AS nd, s1::DOUBLE/n::DOUBLE AS m1,
         |  s2::DOUBLE/n::DOUBLE AS a2, s3::DOUBLE/n::DOUBLE AS a3,
         |  s4::DOUBLE/n::DOUBLE AS a4 FROM s),
         |c AS (SELECT key, n, nd, a2 - m1*m1 AS m2,
         |  a3 - 3.0*m1*a2 + 2.0*m1*m1*m1 AS m3,
         |  a4 - 4.0*m1*a3 + 6.0*m1*m1*a2 - 3.0*m1*m1*m1*m1 AS m4 FROM m),
         |g AS (SELECT key, n, nd, m3/sqrt(m2*m2*m2) AS g1,
         |  m4/(m2*m2) AS g2 FROM c),
         |t1 AS (SELECT *, g1*sqrt((nd+1)*(nd+3)/(6.0*(nd-2))) AS y,
         |  3.0*(nd*nd + 27.0*nd - 70)*(nd+1)*(nd+3)
         |   /((nd-2)*(nd+5)*(nd+7)*(nd+9)) AS b2 FROM g),
         |t2 AS (SELECT *, sqrt(2.0*(b2-1)) - 1.0 AS w2 FROM t1),
         |t3 AS (SELECT *, 1.0/sqrt(ln(sqrt(w2))) AS dl,
         |  sqrt(2.0/(w2-1)) AS al FROM t2),
         |t4 AS (SELECT *, dl*ln(y/al + sqrt(y/al*(y/al) + 1)) AS z1 FROM t3),
         |k1 AS (SELECT *, 3.0*(nd-1)/(nd+1) AS eb2,
         |  24.0*nd*(nd-2)*(nd-3)/((nd+1)*(nd+1)*(nd+3)*(nd+5)) AS vb2
         | FROM t4),
         |kk AS (SELECT *, (g2-eb2)/sqrt(vb2) AS x,
         |  6.0*(nd*nd - 5.0*nd + 2)/((nd+7)*(nd+9))
         |   * sqrt(6.0*(nd+3)*(nd+5)/(nd*(nd-2)*(nd-3))) AS beta FROM k1),
         |k3 AS (SELECT *, 6.0 + 8.0/beta
         |  *(2.0/beta + sqrt(1.0 + 4.0/(beta*beta))) AS aa FROM kk),
         |k4 AS (SELECT *,
         |  (1.0 - 2.0/aa)/(1.0 + x*sqrt(2.0/(aa-4))) AS inr FROM k3),
         |k5 AS (SELECT *, ((1.0 - 2.0/(9.0*aa))
         |  - sign(inr)*pow(abs(inr), 1.0/3))/sqrt(2.0/(9.0*aa)) AS z2
         | FROM k4)
         |SELECT key, n, round(z1, 4) + 0 AS z_skew,
         | round(z2, 4) + 0 AS z_kurt,
         | round(z1*z1 + z2*z2, 4) AS k2
         |FROM k5""".stripMargin.replace("\n", " "),
    "q401_durbin_watson" ->
      s"""WITH b AS (SELECT event_type AS key, event_id AS o,
         |  (epoch_ns(ts) // 86400000000000)::BIGINT AS x,
         |  ${fp4("value")} AS y4
         | FROM events WHERE value IS NOT NULL),
         |g AS (SELECT key, count(*)::BIGINT AS n, sum(x)::HUGEINT AS sx,
         |  sum(x::HUGEINT * x::HUGEINT) AS sxx, sum(y4)::HUGEINT AS sy,
         |  sum(x::HUGEINT * y4::HUGEINT) AS sxy
         | FROM b GROUP BY key HAVING count(*) >= 3),
         |c AS (SELECT key,
         |  (n::DOUBLE*sxy::DOUBLE - sx::DOUBLE*sy::DOUBLE)
         |   /(n::DOUBLE*sxx::DOUBLE - sx::DOUBLE*sx::DOUBLE)/10000.0
         |    AS slope,
         |  (sy::DOUBLE/10000.0
         |    - (n::DOUBLE*sxy::DOUBLE - sx::DOUBLE*sy::DOUBLE)
         |      /(n::DOUBLE*sxx::DOUBLE - sx::DOUBLE*sx::DOUBLE)/10000.0
         |      *sx::DOUBLE)/n::DOUBLE AS icept
         | FROM g),
         |r AS (SELECT b.key, b.o,
         |  ${fp4("b.y4::DOUBLE / 10000.0 - (c.icept + c.slope * b.x)")} AS e4
         | FROM b JOIN c USING (key)),
         |d AS (SELECT key, e4,
         |  lag(e4) OVER (PARTITION BY key ORDER BY o) AS lg FROM r)
         |SELECT key, count(*)::BIGINT AS n,
         | round(sum((e4-lg)::HUGEINT * (e4-lg)::HUGEINT)::DOUBLE
         |   / sum(e4::HUGEINT * e4::HUGEINT)::DOUBLE, 4) AS dw
         |FROM d GROUP BY key""".stripMargin.replace("\n", " "),
    "q402_breusch_pagan" ->
      s"""WITH b AS (SELECT event_type AS key,
         |  (epoch_ns(ts) // 86400000000000)::BIGINT AS x,
         |  ${fp4("value")} AS y4
         | FROM events WHERE value IS NOT NULL),
         |g AS (SELECT key, count(*)::BIGINT AS n, sum(x)::HUGEINT AS sx,
         |  sum(x::HUGEINT * x::HUGEINT) AS sxx, sum(y4)::HUGEINT AS sy,
         |  sum(x::HUGEINT * y4::HUGEINT) AS sxy
         | FROM b GROUP BY key HAVING count(*) >= 3),
         |c AS (SELECT key,
         |  (n::DOUBLE*sxy::DOUBLE - sx::DOUBLE*sy::DOUBLE)
         |   /(n::DOUBLE*sxx::DOUBLE - sx::DOUBLE*sx::DOUBLE)/10000.0
         |    AS slope,
         |  (sy::DOUBLE/10000.0
         |    - (n::DOUBLE*sxy::DOUBLE - sx::DOUBLE*sy::DOUBLE)
         |      /(n::DOUBLE*sxx::DOUBLE - sx::DOUBLE*sx::DOUBLE)/10000.0
         |      *sx::DOUBLE)/n::DOUBLE AS icept
         | FROM g),
         |r AS (SELECT b.key, b.x,
         |  floor((b.y4::DOUBLE/10000.0 - (c.icept + c.slope*b.x))
         |   *(b.y4::DOUBLE/10000.0 - (c.icept + c.slope*b.x))
         |   *1000000.0 + 0.5)::BIGINT AS u6
         | FROM b JOIN c USING (key)),
         |s AS (SELECT key, count(*)::BIGINT AS n, sum(x)::HUGEINT AS sx,
         |  sum(x::HUGEINT * x::HUGEINT) AS sxx, sum(u6)::HUGEINT AS su,
         |  sum(x::HUGEINT * u6::HUGEINT) AS sxu,
         |  sum(u6::HUGEINT * u6::HUGEINT) AS suu
         | FROM r GROUP BY key),
         |f2 AS (SELECT key, n, n::DOUBLE AS nd,
         |  n::DOUBLE*sxu::DOUBLE - sx::DOUBLE*su::DOUBLE AS covn,
         |  n::DOUBLE*sxx::DOUBLE - sx::DOUBLE*sx::DOUBLE AS vxn,
         |  n::DOUBLE*suu::DOUBLE - su::DOUBLE*su::DOUBLE AS vun
         | FROM s)
         |SELECT key, n,
         | round(CASE WHEN vun > 0 THEN nd*(covn*covn/(vxn*vun))
         |  ELSE 0.0 END, 4) AS lm
         |FROM f2""".stripMargin.replace("\n", " "),
    "q403_cox_stuart" ->
      s"""WITH b AS (SELECT event_type AS key, event_id AS o,
         |  ${fp4("value")} AS v
         | FROM events WHERE value IS NOT NULL),
         |r AS (SELECT key, v,
         |  row_number() OVER (PARTITION BY key ORDER BY o) AS rn FROM b),
         |c AS (SELECT key, count(*)::BIGINT AS n,
         |  floor((count(*)+1)/2.0)::BIGINT AS cc FROM r GROUP BY key),
         |p AS (SELECT a.key, a.v AS va, b2.v AS vb
         | FROM r a JOIN c ON c.key = a.key
         | JOIN r b2 ON b2.key = a.key AND b2.rn = a.rn + c.cc
         | WHERE a.rn <= c.n - c.cc),
         |g AS (SELECT key,
         |  sum(CASE WHEN vb > va THEN 1 ELSE 0 END)::BIGINT AS n_up,
         |  sum(CASE WHEN vb < va THEN 1 ELSE 0 END)::BIGINT AS n_down
         | FROM p GROUP BY key)
         |SELECT key, n_up + n_down AS n_pairs, n_up, n_down,
         | round(CASE WHEN n_up + n_down > 0 THEN
         |   (greatest(n_up, n_down)::DOUBLE - 0.5
         |     - (n_up + n_down)::DOUBLE/2.0)
         |    / sqrt((n_up + n_down)::DOUBLE/4.0)
         |  ELSE 0.0 END, 4) + 0 AS z
         |FROM g""".stripMargin.replace("\n", " "),
    "q404_bartels" ->
      s"""WITH b AS (SELECT event_type AS key, event_id AS o,
         |  ${fp4("value")} AS v
         | FROM events WHERE value IS NOT NULL),
         |h AS (SELECT key, v, count(*)::BIGINT AS ct FROM b GROUP BY 1, 2),
         |rk AS (SELECT key, v,
         |  2*(sum(ct) OVER (PARTITION BY key ORDER BY v
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ct)
         |   + ct + 1 AS r2 FROM h),
         |rw AS (SELECT b.key, b.o, rk.r2 FROM b
         | JOIN rk ON rk.key = b.key AND rk.v = b.v),
         |sq AS (SELECT key, r2,
         |  lead(r2) OVER (PARTITION BY key ORDER BY o) AS nx,
         |  count(*) OVER (PARTITION BY key) + 1 AS np1 FROM rw),
         |g AS (SELECT key, count(*)::BIGINT AS n,
         |  sum((r2-nx)::HUGEINT * (r2-nx)::HUGEINT) AS num,
         |  sum((r2-np1)::HUGEINT * (r2-np1)::HUGEINT) AS den
         | FROM sq GROUP BY key),
         |f AS (SELECT key, n, n::DOUBLE AS nd,
         |  num::DOUBLE/den::DOUBLE AS rvn FROM g)
         |SELECT key, n, round(rvn, 4) AS rvn,
         | round((rvn - 2.0)/sqrt(4.0*(nd-2)*(5.0*nd*nd - 2.0*nd - 9)
         |   /(5.0*nd*(nd+1)*(nd-1)*(nd-1))), 4) + 0 AS z
         |FROM f""".stripMargin.replace("\n", " "),
    "q405_theta" ->
      s"""WITH RECURSIVE ev AS (SELECT user_id::VARCHAR AS key,
         |  event_id AS seq, value,
         |  row_number() OVER (PARTITION BY user_id
         |   ORDER BY event_id, value) AS rn FROM events),
         |walk AS (
         | SELECT key, rn, seq, value, 0.0::DOUBLE AS score,
         |  value AS lvl, 1::BIGINT AS st, 1::BIGINT AS stt,
         |  ${fp4("value")} AS sy, ${fp4("value")} AS sty,
         |  0.0::DOUBLE AS rsum, 0.0::DOUBLE AS rsq, 0 AS rnr
         | FROM ev WHERE rn = 1
         | UNION ALL
         | SELECT key, rn, seq, value, score,
         |  0.5 * value + 0.5 * lvl0 AS lvl,
         |  st0 + rn AS st, stt0 + rn * rn AS stt,
         |  sy0 + ${fp4("value")} AS sy, sty0 + rn * ${fp4("value")} AS sty,
         |  rsum0 + coalesce(resid, 0.0) AS rsum,
         |  rsq0 + coalesce(resid * resid, 0.0) AS rsq,
         |  rnr0 + CASE WHEN resid IS NOT NULL THEN 1 ELSE 0 END AS rnr
         | FROM (
         |  SELECT key, rn, seq, value, lvl0, st0, stt0, sy0, sty0,
         |   rsum0, rsq0, rnr0, resid,
         |   CASE WHEN resid IS NOT NULL AND std > 0
         |    THEN abs(resid) / std ELSE 0.0::DOUBLE END AS score
         |  FROM (
         |   SELECT e.key, e.rn, e.seq, e.value,
         |    w.lvl AS lvl0, w.st AS st0, w.stt AS stt0,
         |    w.sy AS sy0, w.sty AS sty0,
         |    w.rsum AS rsum0, w.rsq AS rsq0, w.rnr AS rnr0,
         |    CASE WHEN e.rn >= 3 THEN e.value - (w.lvl +
         |      ((e.rn - 1)::DOUBLE * w.sty::DOUBLE
         |        - w.st::DOUBLE * w.sy::DOUBLE)
         |       / ((e.rn - 1)::DOUBLE * w.stt::DOUBLE
         |        - w.st::DOUBLE * w.st::DOUBLE) / 10000.0 / 2.0) END
         |     AS resid,
         |    CASE WHEN w.rnr > 1
         |     THEN sqrt((w.rsq - w.rsum * w.rsum / w.rnr) / (w.rnr - 1))
         |     ELSE 0.0::DOUBLE END AS std
         |   FROM walk w JOIN ev e ON e.key = w.key AND e.rn = w.rn + 1)))
         |SELECT key, seq, round(value, 4) AS value, round(score, 4) AS score
         |FROM walk""".stripMargin.replace("\n", " "),
    "q406_damped_holt" ->
      """WITH RECURSIVE ev AS (SELECT user_id::VARCHAR AS key,
        |  event_id AS seq, value,
        |  row_number() OVER (PARTITION BY user_id
        |   ORDER BY event_id, value) AS rn FROM events),
        |walk AS (
        | SELECT key, rn, seq, value, 0.0::DOUBLE AS score,
        |  value AS lvl, 0.0::DOUBLE AS trd,
        |  0.0::DOUBLE AS rsum, 0.0::DOUBLE AS rsq, 0 AS rnr
        | FROM ev WHERE rn = 1
        | UNION ALL
        | SELECT key, rn, seq, value, score,
        |  CASE WHEN rn = 2 THEN value
        |   ELSE 0.5 * value + 0.5 * pred END AS lvl,
        |  CASE WHEN rn = 2 THEN value - lvl0
        |   ELSE 0.25 * ((0.5 * value + 0.5 * pred) - lvl0)
        |    + 0.75 * (0.875 * trd0) END AS trd,
        |  rsum0 + coalesce(resid, 0.0) AS rsum,
        |  rsq0 + coalesce(resid * resid, 0.0) AS rsq,
        |  rnr0 + CASE WHEN resid IS NOT NULL THEN 1 ELSE 0 END AS rnr
        | FROM (
        |  SELECT key, rn, seq, value, lvl0, trd0, rsum0, rsq0, rnr0,
        |   pred, resid,
        |   CASE WHEN resid IS NOT NULL AND std > 0
        |    THEN abs(resid) / std ELSE 0.0::DOUBLE END AS score
        |  FROM (
        |   SELECT e.key, e.rn, e.seq, e.value,
        |    w.lvl AS lvl0, w.trd AS trd0,
        |    w.rsum AS rsum0, w.rsq AS rsq0, w.rnr AS rnr0,
        |    CASE WHEN e.rn >= 3 THEN w.lvl + 0.875 * w.trd END AS pred,
        |    CASE WHEN e.rn >= 3
        |     THEN e.value - (w.lvl + 0.875 * w.trd) END AS resid,
        |    CASE WHEN w.rnr > 1
        |     THEN sqrt((w.rsq - w.rsum * w.rsum / w.rnr) / (w.rnr - 1))
        |     ELSE 0.0::DOUBLE END AS std
        |   FROM walk w JOIN ev e ON e.key = w.key AND e.rn = w.rn + 1)))
        |SELECT key, seq, round(value, 4) AS value, round(score, 4) AS score
        |FROM walk""".stripMargin.replace("\n", " "),
    "q407_croston" ->
      """WITH RECURSIVE ev AS (SELECT user_id::VARCHAR AS key,
        |  event_id AS seq,
        |  CASE WHEN value > 120 THEN value - 120 ELSE 0.0 END AS d,
        |  row_number() OVER (PARTITION BY user_id
        |   ORDER BY event_id, CASE WHEN value > 120 THEN value - 120
        |    ELSE 0.0 END) AS rn FROM events),
        |walk AS (
        | SELECT key, rn, seq, d,
        |  CASE WHEN d > 0 THEN d END AS z,
        |  CASE WHEN d > 0 THEN 1.0::DOUBLE END AS p,
        |  CASE WHEN d > 0 THEN 1::BIGINT END AS lastnz,
        |  CASE WHEN d > 0 THEN d / 1.0 ELSE 0.0 END AS score
        | FROM ev WHERE rn = 1
        | UNION ALL
        | SELECT key, rn, seq, d,
        |  z2 AS z, p2 AS p, last2 AS lastnz,
        |  CASE WHEN z2 IS NULL THEN 0.0 ELSE z2 / p2 END AS score
        | FROM (
        |  SELECT e.key, e.rn, e.seq, e.d,
        |   CASE WHEN e.d <= 0 THEN w.z
        |    WHEN w.z IS NULL THEN e.d
        |    ELSE 0.5 * e.d + 0.5 * w.z END AS z2,
        |   CASE WHEN e.d <= 0 THEN w.p
        |    WHEN w.z IS NULL THEN e.rn::DOUBLE
        |    ELSE 0.5 * (e.rn - w.lastnz)::DOUBLE + 0.5 * w.p END AS p2,
        |   CASE WHEN e.d > 0 THEN e.rn ELSE w.lastnz END AS last2
        |  FROM walk w JOIN ev e ON e.key = w.key AND e.rn = w.rn + 1))
        |SELECT key, seq, round(d, 4) AS value, round(score, 4) AS score
        |FROM walk""".stripMargin.replace("\n", " "),
    "q408_lomb_scargle" ->
      s"""WITH st AS (SELECT event_type AS key,
         |  min(epoch_ns(ts))::BIGINT AS mn, count(*)::BIGINT AS n,
         |  sum(${fp4("value")})::BIGINT AS sy
         | FROM events WHERE value IS NOT NULL GROUP BY 1),
         |b AS (SELECT e.event_type AS key, p.period,
         |  (epoch_ns(e.ts) - st.mn)::DOUBLE / 86400000000000.0 AS t,
         |  e.value - st.sy::DOUBLE / 10000.0 / st.n::DOUBLE AS er,
         |  2.0 * pi() / p.period::DOUBLE AS w
         | FROM events e JOIN st ON st.key = e.event_type
         | CROSS JOIN (SELECT unnest([2,3,4,5,7,10,14]) AS period) p
         | WHERE e.value IS NOT NULL),
         |tr AS (SELECT key, period, er, cos(w * t) AS c, sin(w * t) AS s
         | FROM b),
         |sums AS (SELECT key, period, count(*)::BIGINT AS n,
         |  sum((CASE WHEN er * c >= 0 THEN floor(er*c*1000000.0+0.5)
         |    ELSE -floor(-(er*c)*1000000.0+0.5) END)::BIGINT) AS ec,
         |  sum((CASE WHEN er * s >= 0 THEN floor(er*s*1000000.0+0.5)
         |    ELSE -floor(-(er*s)*1000000.0+0.5) END)::BIGINT) AS es,
         |  sum((CASE WHEN c * c >= 0 THEN floor(c*c*1000000.0+0.5)
         |    ELSE -floor(-(c*c)*1000000.0+0.5) END)::BIGINT) AS cc,
         |  sum((CASE WHEN s * s >= 0 THEN floor(s*s*1000000.0+0.5)
         |    ELSE -floor(-(s*s)*1000000.0+0.5) END)::BIGINT) AS ss,
         |  sum((CASE WHEN c * s >= 0 THEN floor(c*s*1000000.0+0.5)
         |    ELSE -floor(-(c*s)*1000000.0+0.5) END)::BIGINT) AS cs,
         |  sum((CASE WHEN er * er >= 0 THEN floor(er*er*1000000.0+0.5)
         |    ELSE -floor(-(er*er)*1000000.0+0.5) END)::BIGINT) AS ee
         | FROM tr GROUP BY 1, 2),
         |fin AS (SELECT key, period, n,
         |  ec::DOUBLE/1000000.0 AS cd, es::DOUBLE/1000000.0 AS sd,
         |  cc::DOUBLE/1000000.0 AS ccd, ss::DOUBLE/1000000.0 AS ssd,
         |  cs::DOUBLE/1000000.0 AS csd,
         |  ee::DOUBLE/1000000.0/n::DOUBLE AS sig2 FROM sums),
         |ph AS (SELECT *, atan2(2.0*csd, ccd - ssd)/2.0 AS wt FROM fin),
         |pw AS (SELECT *, cos(wt) AS ct, sin(wt) AS stt FROM ph),
         |z AS (SELECT key, period, sig2,
         |  cd*ct + sd*stt AS num1, sd*ct - cd*stt AS num2,
         |  ccd*ct*ct + 2.0*csd*ct*stt + ssd*stt*stt AS den1,
         |  ssd*ct*ct - 2.0*csd*ct*stt + ccd*stt*stt AS den2 FROM pw)
         |SELECT key, period,
         | round(CASE WHEN sig2 > 0 AND den1 > 0 AND den2 > 0
         |  THEN (num1*num1/den1 + num2*num2/den2)/(2.0*sig2)
         |  ELSE 0.0 END, 4) AS power
         |FROM z""".stripMargin.replace("\n", " "),
    "q409_seasonal_mk" ->
      s"""WITH base AS (SELECT event_type,
         |  (epoch_ns(ts) // 86400000000000) % 7 AS dow, event_id,
         |  ${fp4("value")} AS fp
         | FROM events WHERE value IS NOT NULL),
         |o AS (SELECT event_type, dow, fp,
         |  row_number() OVER (PARTITION BY event_type, dow
         |   ORDER BY event_id ASC)::BIGINT AS i,
         |  count(*) OVER (PARTITION BY event_type, dow) AS n FROM base),
         |pts AS (SELECT event_type, dow, i, fp FROM o
         | WHERE (i - 1) % CAST(ceil(n::DOUBLE/100) AS BIGINT) = 0),
         |p AS (SELECT l.event_type, l.dow, l.fp AS fl, r.fp AS fr
         | FROM pts l JOIN pts r ON l.event_type = r.event_type
         |  AND l.dow = r.dow AND l.i < r.i),
         |s AS (SELECT event_type, dow,
         |  sum(CASE WHEN fr > fl THEN 1 WHEN fr < fl THEN -1
         |   ELSE 0 END)::BIGINT AS s_ FROM p GROUP BY 1, 2),
         |nu AS (SELECT event_type, dow, count(*)::BIGINT AS nu_
         | FROM pts GROUP BY 1, 2),
         |tg AS (SELECT event_type, dow, fp, count(*)::BIGINT AS t
         | FROM pts GROUP BY 1, 2, 3),
         |ti AS (SELECT event_type, dow,
         |  sum(t*(t-1)*(2*t+5))::BIGINT AS tc FROM tg GROUP BY 1, 2),
         |per AS (SELECT s.event_type, s.dow, s_, nu_,
         |  nu_*(nu_-1)*(2*nu_+5) - tc AS vnum
         | FROM s JOIN nu USING (event_type, dow)
         | JOIN ti USING (event_type, dow)),
         |ag AS (SELECT event_type, sum(nu_)::BIGINT AS n_used,
         |  sum(s_)::BIGINT AS s_stat, sum(vnum)::BIGINT AS vn
         | FROM per GROUP BY event_type)
         |SELECT event_type, n_used, s_stat,
         | round(vn::DOUBLE / 18.0, 4) AS var_s,
         | round(CASE WHEN s_stat > 0
         |   THEN (s_stat - 1)::DOUBLE / sqrt(vn::DOUBLE / 18.0)
         |  WHEN s_stat < 0
         |   THEN (s_stat + 1)::DOUBLE / sqrt(vn::DOUBLE / 18.0)
         |  ELSE 0.0 END, 4) + 0 AS z_stat
         |FROM ag""".stripMargin.replace("\n", " "),
    "q410_adf" ->
      s"""WITH b AS (SELECT event_type AS key, event_id AS o,
         |  ${fp4("value")} AS y4
         | FROM events WHERE value IS NOT NULL),
         |l AS (SELECT key, y4,
         |  lag(y4) OVER (PARTITION BY key ORDER BY o) AS yl FROM b),
         |d AS (SELECT key, yl, y4 - yl AS dy FROM l WHERE yl IS NOT NULL),
         |g AS (SELECT key, count(*)::BIGINT AS n, sum(yl)::HUGEINT AS sx,
         |  sum(yl::HUGEINT * yl::HUGEINT) AS sxx, sum(dy)::HUGEINT AS sy,
         |  sum(yl::HUGEINT * dy::HUGEINT) AS sxy,
         |  sum(dy::HUGEINT * dy::HUGEINT) AS syy
         | FROM d GROUP BY key HAVING count(*) >= 4),
         |c AS (SELECT key, n, n::DOUBLE AS nd,
         |  sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE AS sxxc,
         |  sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE AS sxyc,
         |  syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE AS syyc
         | FROM g),
         |f AS (SELECT key, n, nd, sxyc / sxxc AS rho,
         |  syyc - (sxyc / sxxc) * sxyc AS sse, sxxc FROM c)
         |SELECT key, n, round(rho, 4) + 0 AS rho,
         | round(CASE WHEN sse > 0 THEN rho / sqrt(sse / (nd - 2) / sxxc)
         |  ELSE 0.0 END, 4) + 0 AS t_stat
         |FROM f""".stripMargin.replace("\n", " "),
    "q411_kpss" ->
      s"""WITH b AS (SELECT event_type AS key, event_id AS o,
         |  ${fp4("value")} AS y4
         | FROM events WHERE value IS NOT NULL),
         |w1 AS (SELECT key, o, y4,
         |  count(*) OVER (PARTITION BY key) AS n,
         |  sum(y4) OVER (PARTITION BY key) AS sy FROM b),
         |e AS (SELECT key, o, n, n * y4 - sy AS er FROM w1),
         |cs AS (SELECT key, o, n, er,
         |  sum(er::HUGEINT) OVER (PARTITION BY key ORDER BY o
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS csum,
         |  lag(er, 1) OVER (PARTITION BY key ORDER BY o) AS l1,
         |  lag(er, 2) OVER (PARTITION BY key ORDER BY o) AS l2,
         |  lag(er, 3) OVER (PARTITION BY key ORDER BY o) AS l3,
         |  lag(er, 4) OVER (PARTITION BY key ORDER BY o) AS l4 FROM e),
         |g AS (SELECT key, max(n)::BIGINT AS n,
         |  sum(csum * csum) AS ss2,
         |  sum(er::HUGEINT * er::HUGEINT) AS g0,
         |  sum(er::HUGEINT * l1::HUGEINT) AS g1,
         |  sum(er::HUGEINT * l2::HUGEINT) AS g2,
         |  sum(er::HUGEINT * l3::HUGEINT) AS g3,
         |  sum(er::HUGEINT * l4::HUGEINT) AS g4
         | FROM cs GROUP BY key HAVING max(n) >= 10)
         |SELECT key, n,
         | round(ss2::DOUBLE / n::DOUBLE
         |   / (g0::DOUBLE + 2.0 * (0.8 * g1::DOUBLE + 0.6 * g2::DOUBLE
         |     + 0.4 * g3::DOUBLE + 0.2 * g4::DOUBLE)), 4) AS eta
         |FROM g""".stripMargin.replace("\n", " "),
    "q412_prefix_jaccard" ->
      """WITH tk AS (SELECT doc_id,
        |  unnest(list_distinct(regexp_extract_all(lower(text), '\S+')))
        |   AS ts FROM documents),
        |tk2 AS (SELECT doc_id,
        |  ('0x'||substr(md5(ts),1,14))::BIGINT AS tok
        | FROM tk WHERE ts <> ''),
        |sz AS (SELECT doc_id, count(*)::BIGINT AS s FROM tk2 GROUP BY 1),
        |pr AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*)::BIGINT AS inter
        | FROM tk2 a JOIN tk2 b ON a.tok = b.tok AND a.doc_id < b.doc_id
        | GROUP BY 1, 2),
        |f AS (SELECT pr.a, pr.b, sa.s AS sz_a, sb.s AS sz_b, inter,
        |  inter::DOUBLE / (sa.s + sb.s - inter)::DOUBLE AS jaccard
        | FROM pr JOIN sz sa ON sa.doc_id = pr.a
        | JOIN sz sb ON sb.doc_id = pr.b)
        |SELECT a, b, sz_a, sz_b, inter, round(jaccard, 4) AS jaccard
        |FROM f WHERE jaccard >= 0.9""".stripMargin.replace("\n", " "),
    "q413_tfidf_topk" ->
      """WITH tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf
        | FROM (SELECT doc_id,
        |   unnest(regexp_extract_all(lower(text), '\S+')) AS tok
        |  FROM documents) WHERE tok <> '' GROUP BY 1, 2),
        |nn AS (SELECT count(DISTINCT doc_id)::BIGINT AS n FROM documents),
        |dfq AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY tok),
        |wtd AS (SELECT doc_id, tf.tok,
        |  floor((tf::DOUBLE * (ln((1.0 + nn.n::DOUBLE)
        |    /(1.0 + df::DOUBLE)) + 1.0)) * 1000000.0 + 0.5)::BIGINT AS w
        | FROM tf JOIN dfq USING (tok) CROSS JOIN nn
        | WHERE df * 2 <= nn.n),
        |nrm AS (SELECT doc_id, sum(w::HUGEINT * w::HUGEINT) AS n2
        | FROM wtd GROUP BY 1),
        |dots AS (SELECT x.doc_id AS a, y.doc_id AS b,
        |  sum(x.w::HUGEINT * y.w::HUGEINT) AS dot
        | FROM wtd x JOIN wtd y ON x.tok = y.tok AND x.doc_id <> y.doc_id
        | GROUP BY 1, 2),
        |cs AS (SELECT a, b, dot::DOUBLE / sqrt(na.n2::DOUBLE)
        |   / sqrt(nb.n2::DOUBLE) AS cos
        | FROM dots JOIN nrm na ON na.doc_id = a
        | JOIN nrm nb ON nb.doc_id = b),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY a
        |  ORDER BY cos DESC, b) AS rank FROM cs)
        |SELECT a, b, rank, round(cos, 4) AS cos FROM rk WHERE rank <= 5"""
        .stripMargin.replace("\n", " "),
    "q414_skyline" ->
      s"""WITH ag AS (SELECT l_partkey AS id,
         |  sum(${fp4("l_extendedprice")})::BIGINT AS sx,
         |  (-sum(${fp4("l_quantity")}))::BIGINT AS sy,
         |  count(*)::BIGINT AS n FROM lineitem GROUP BY 1),
         |pt AS (SELECT id,
         |  ${fp4("sx::DOUBLE / 10000.0 / n::DOUBLE")} AS x4,
         |  ${fp4("sy::DOUBLE / 10000.0 / n::DOUBLE")} AS y4 FROM ag)
         |SELECT p.id, p.x4::DOUBLE / 10000.0 AS x,
         | p.y4::DOUBLE / 10000.0 AS y
         |FROM pt p WHERE NOT EXISTS (SELECT 1 FROM pt q
         | WHERE q.x4 <= p.x4 AND q.y4 <= p.y4
         |  AND (q.x4 < p.x4 OR q.y4 < p.y4))"""
        .stripMargin.replace("\n", " "),
    "q415_group_mode" ->
      s"""WITH h AS (SELECT event_type AS grp, ${fp4("value")} AS v,
         |  count(*)::BIGINT AS cnt
         | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |r AS (SELECT *, row_number() OVER (PARTITION BY grp
         |  ORDER BY cnt DESC, v ASC) AS rk FROM h)
         |SELECT grp, v::DOUBLE / 10000.0 AS mode, cnt FROM r WHERE rk = 1"""
        .stripMargin.replace("\n", " "),
    "q416_weighted_median" ->
      s"""WITH h AS (SELECT l_returnflag AS grp,
         |  ${fp4("l_extendedprice")} AS v,
         |  sum(floor(l_quantity)::BIGINT)::BIGINT AS sw
         | FROM lineitem WHERE l_extendedprice IS NOT NULL
         |  AND l_quantity IS NOT NULL AND floor(l_quantity) > 0
         | GROUP BY 1, 2),
         |c AS (SELECT grp, v, sw,
         |  sum(sw) OVER (PARTITION BY grp ORDER BY v ASC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |  sum(sw) OVER (PARTITION BY grp) AS tot FROM h),
         |m AS (SELECT grp, v, tot,
         |  row_number() OVER (PARTITION BY grp ORDER BY v ASC) AS rk
         | FROM c WHERE 2 * cum >= tot)
         |SELECT grp, tot::BIGINT AS w_total, v::DOUBLE / 10000.0 AS wmedian
         |FROM m WHERE rk = 1""".stripMargin.replace("\n", " "),
    "q417_cube_profile" ->
      """SELECT source, lang, count(*)::BIGINT AS n,
        | sum(n_chars)::BIGINT AS sum_chars,
        | GROUPING(source, lang)::BIGINT AS gid
        |FROM documents GROUP BY CUBE (source, lang)"""
        .stripMargin.replace("\n", " "),
    "q418_topk_per_group" ->
      """WITH r AS (SELECT event_type, event_id, value,
        |  row_number() OVER (PARTITION BY event_type
        |   ORDER BY value DESC, event_id ASC) AS rn
        | FROM events WHERE value IS NOT NULL)
        |SELECT event_type, event_id, round(value, 4) AS value, rn
        |FROM r WHERE rn <= 5""".stripMargin.replace("\n", " "),
    "q419_rmst" ->
      s"""WITH $subjSql,
         |h AS (SELECT dur AS t,
         |  sum(CASE WHEN event THEN 1 ELSE 0 END)::BIGINT AS d,
         |  sum(CASE WHEN NOT event THEN 1 ELSE 0 END)::BIGINT AS c
         | FROM subj GROUP BY 1),
         |tot AS (SELECT sum(d + c)::BIGINT AS n FROM h),
         |f1 AS (SELECT t, d, c,
         |  (SELECT n FROM tot) - (sum(d + c) OVER wcum - (d + c)) AS n_risk
         | FROM h WINDOW wcum AS (ORDER BY t ASC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |f2 AS (SELECT t, d, c,
         |  exp(sum(ln(1.0 - d::DOUBLE / n_risk::DOUBLE)) OVER wcum)
         |   AS survival
         | FROM f1 WINDOW wcum AS (ORDER BY t ASC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |f3 AS (SELECT t, d, c, survival,
         |  coalesce(lead(t) OVER (ORDER BY t), 20) AS nxt,
         |  row_number() OVER (ORDER BY t) AS rn FROM f2),
         |g AS (SELECT sum(d + c)::BIGINT AS n,
         |  max(CASE WHEN rn = 1 THEN least(t, 20) ELSE 0 END)::DOUBLE
         |  + sum(floor(survival
         |     * (least(greatest(nxt, t), 20) - least(t, 20))::DOUBLE
         |     * 1000000.0 + 0.5)::BIGINT)::DOUBLE / 1000000.0 AS rmst
         | FROM f3)
         |SELECT n, 20::BIGINT AS tau, round(rmst, 4) AS rmst FROM g"""
        .stripMargin.replace("\n", " "),
    "q420_gehan" ->
      s"""WITH $subjSql,
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
         | FROM h WINDOW wcum AS (ORDER BY t ASC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |rk AS (SELECT t,
         |  n_risk::DOUBLE * da::DOUBLE AS da,
         |  n_risk::DOUBLE * (d::DOUBLE * na_risk::DOUBLE / n_risk::DOUBLE)
         |    AS ea,
         |  n_risk::DOUBLE * n_risk::DOUBLE
         |   * (d::DOUBLE * (na_risk::DOUBLE / n_risk::DOUBLE)
         |    * (1.0 - na_risk::DOUBLE / n_risk::DOUBLE)
         |    * (n_risk::DOUBLE - d::DOUBLE) / (n_risk::DOUBLE - 1)) AS v
         | FROM risk WHERE d > 0 AND n_risk > 1),
         |f AS (SELECT
         |  list_aggregate(list(da ORDER BY t), 'sum') AS sda,
         |  list_aggregate(list(ea ORDER BY t), 'sum') AS sea,
         |  list_aggregate(list(v ORDER BY t), 'sum') AS sv FROM rk)
         |SELECT (SELECT nna FROM tot) AS n_a,
         | (SELECT n FROM tot) - (SELECT nna FROM tot) AS n_b,
         | round((sda - sea) * (sda - sea) / sv, 4) AS chi2 FROM f"""
        .stripMargin.replace("\n", " "),
    "q421_did" ->
      s"""WITH e AS (SELECT (user_id % 2 = 0) AS t,
         |  ((epoch_ns(ts) // 86400000000000) % 30) >= 15 AS p,
         |  ${fp4("value")} AS y
         | FROM events WHERE value IS NOT NULL),
         |cells AS (SELECT t, p, count(*)::BIGINT AS n,
         |  sum(y::HUGEINT) AS s, sum(y::HUGEINT * y::HUGEINT) AS q
         | FROM e GROUP BY 1, 2 HAVING count(*) >= 2),
         |f AS (SELECT t, p, n, n::DOUBLE AS nd,
         |  s::DOUBLE / n::DOUBLE / 10000.0 AS m,
         |  (q::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
         |   / (n::DOUBLE - 1) / 100000000.0 AS v FROM cells),
         |a AS (SELECT sum(n)::BIGINT AS n, count(*)::BIGINT AS k,
         |  sum(${fp6s("CASE WHEN t AND p THEN m WHEN t AND NOT p THEN -m " +
            "WHEN NOT t AND p THEN -m ELSE m END")}) AS didfp,
         |  sum(${fp6s("v / nd")}) AS sefp FROM f)
         |SELECT n, round(didfp::DOUBLE / 1000000.0, 4) + 0 AS did,
         | round(sqrt(sefp::DOUBLE / 1000000.0), 4) AS se,
         | round((didfp::DOUBLE / 1000000.0)
         |   / sqrt(sefp::DOUBLE / 1000000.0), 4) + 0 AS t_stat
         |FROM a WHERE k = 4""".stripMargin.replace("\n", " "),
    "q422_post_strat" ->
      s"""WITH s AS (SELECT event_type AS st, (user_id % 2 = 0) AS t,
         |  ${fp4("value")} AS y
         | FROM events WHERE value IS NOT NULL),
         |g AS (SELECT st, count(*)::BIGINT AS ns,
         |  sum(CASE WHEN t THEN 1 ELSE 0 END)::BIGINT AS n1,
         |  sum(CASE WHEN t THEN y::HUGEINT END) AS s1,
         |  sum(CASE WHEN t THEN y::HUGEINT * y::HUGEINT END) AS q1,
         |  sum(CASE WHEN NOT t THEN 1 ELSE 0 END)::BIGINT AS n0,
         |  sum(CASE WHEN NOT t THEN y::HUGEINT END) AS s0,
         |  sum(CASE WHEN NOT t THEN y::HUGEINT * y::HUGEINT END) AS q0
         | FROM s GROUP BY 1
         | HAVING sum(CASE WHEN t THEN 1 ELSE 0 END) >= 2
         |  AND sum(CASE WHEN NOT t THEN 1 ELSE 0 END) >= 2),
         |tt AS (SELECT sum(ns)::BIGINT AS nt FROM g),
         |per AS (SELECT g.*, ns::DOUBLE / tt.nt::DOUBLE AS w,
         |  s1::DOUBLE / n1::DOUBLE / 10000.0 AS m1,
         |  (q1::DOUBLE - s1::DOUBLE * s1::DOUBLE / n1::DOUBLE)
         |   / (n1::DOUBLE - 1) / 100000000.0 AS v1,
         |  s0::DOUBLE / n0::DOUBLE / 10000.0 AS m0,
         |  (q0::DOUBLE - s0::DOUBLE * s0::DOUBLE / n0::DOUBLE)
         |   / (n0::DOUBLE - 1) / 100000000.0 AS v0
         | FROM g CROSS JOIN tt),
         |a AS (SELECT sum(ns)::BIGINT AS n, count(*)::BIGINT AS n_strata,
         |  sum(${fp6s("w * (m1 - m0)")}) AS afp,
         |  sum(${fp6s("w * w * (v1 / n1::DOUBLE + v0 / n0::DOUBLE)")})
         |    AS sefp FROM per)
         |SELECT n, n_strata, round(afp::DOUBLE / 1000000.0, 4) + 0 AS ate,
         | round(sqrt(sefp::DOUBLE / 1000000.0), 4) AS se FROM a"""
        .stripMargin.replace("\n", " "),
    "q423_delta_ratio" ->
      s"""WITH b AS (SELECT event_type AS key, ${fp4("value")} AS x,
         |  ${fp4("(user_id % 5 + 1)::DOUBLE")} AS y
         | FROM events WHERE value IS NOT NULL),
         |g AS (SELECT key, count(*)::BIGINT AS n, sum(x)::HUGEINT AS sx,
         |  sum(y)::HUGEINT AS sy, sum(x::HUGEINT * x::HUGEINT) AS sxx,
         |  sum(x::HUGEINT * y::HUGEINT) AS sxy,
         |  sum(y::HUGEINT * y::HUGEINT) AS syy
         | FROM b GROUP BY key HAVING count(*) >= 2 AND sum(y) <> 0),
         |c AS (SELECT key, n, n::DOUBLE AS nd,
         |  sx::DOUBLE / sy::DOUBLE AS r,
         |  (sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE)
         |   / (n::DOUBLE - 1) AS vx,
         |  (syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE)
         |   / (n::DOUBLE - 1) AS vy,
         |  (sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE)
         |   / (n::DOUBLE - 1) AS cxy,
         |  sy::DOUBLE / n::DOUBLE AS yb FROM g),
         |f AS (SELECT key, n, r,
         |  sqrt((vx - 2.0 * r * cxy + r * r * vy) / (nd * yb * yb)) AS se
         | FROM c)
         |SELECT key, n, round(r, 4) AS ratio, round(se, 4) AS se,
         | round(r - 1.96 * se, 4) + 0 AS lo,
         | round(r + 1.96 * se, 4) AS hi FROM f"""
        .stripMargin.replace("\n", " "),
    "q424_power_mde" ->
      """WITH g AS (SELECT event_type AS key, count(*)::BIGINT AS n,
        |  sum(CASE WHEN value > 160.0 THEN 1 ELSE 0 END)::BIGINT AS pos
        | FROM events WHERE value IS NOT NULL
        | GROUP BY 1 HAVING count(*) >= 4),
        |f AS (SELECT key, n, n::DOUBLE AS nd,
        |  pos::DOUBLE / n::DOUBLE AS p FROM g)
        |SELECT key, n, round(p, 4) AS p,
        | round((1.959963984540054 + 0.8416212335729143)
        |   * sqrt(2.0 * p * (1.0 - p) / (nd / 2.0)), 4) AS mde FROM f"""
        .stripMargin.replace("\n", " "),
    "q425_l_diversity" ->
      s"""WITH c AS (SELECT source, lang, doc_id % 7 AS sv,
         |  count(*)::BIGINT AS c FROM documents GROUP BY 1, 2, 3),
         |g AS (SELECT source, lang, sum(c)::BIGINT AS n,
         |  count(*)::BIGINT AS l_distinct FROM c GROUP BY 1, 2),
         |e AS (SELECT c.source, c.lang,
         |  sum(${fp6s("(c.c::DOUBLE / g.n::DOUBLE) " +
            "* ln(c.c::DOUBLE / g.n::DOUBLE)")}) AS efp
         | FROM c JOIN g USING (source, lang) GROUP BY 1, 2)
         |SELECT g.source, g.lang, g.n, g.l_distinct,
         | round(exp(-(e.efp::DOUBLE / 1000000.0)), 4) AS l_entropy
         |FROM g JOIN e USING (source, lang)"""
        .stripMargin.replace("\n", " "),
    "q426_t_closeness" ->
      """WITH b AS (SELECT source, lang, (doc_id % 7)::BIGINT AS sv
        | FROM documents),
        |gl AS (SELECT sv, count(*)::BIGINT AS g FROM b GROUP BY 1),
        |gr AS (SELECT source, lang, sv, count(*)::BIGINT AS c
        | FROM b GROUP BY 1, 2, 3),
        |ks AS (SELECT DISTINCT source, lang FROM gr),
        |fl AS (SELECT gl.sv, ks.source, ks.lang,
        |  coalesce(gr.c, 0)::BIGINT AS c
        | FROM gl CROSS JOIN ks LEFT JOIN gr ON gr.source = ks.source
        |  AND gr.lang = ks.lang AND gr.sv = gl.sv),
        |gt AS (SELECT sum(g)::BIGINT AS nt, count(*)::BIGINT AS m FROM gl),
        |gcum AS (SELECT sv, sum(g) OVER (ORDER BY sv ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gc FROM gl),
        |cum AS (SELECT f.source, f.lang, f.sv,
        |  sum(f.c) OVER (PARTITION BY f.source, f.lang ORDER BY f.sv ASC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
        |  sum(f.c) OVER (PARTITION BY f.source, f.lang) AS ng,
        |  gcum.gc, gt.nt, gt.m
        | FROM fl f JOIN gcum USING (sv) CROSS JOIN gt),
        |d AS (SELECT source, lang, max(ng)::BIGINT AS n,
        |  sum(abs(cc * nt - gc * ng)::HUGEINT) AS sd,
        |  max(nt) AS nt2, max(m) AS m2 FROM cum GROUP BY 1, 2)
        |SELECT source, lang, n,
        | round(sd::DOUBLE / (n::DOUBLE * nt2::DOUBLE
        |   * (m2 - 1)::DOUBLE), 4) AS t_emd FROM d"""
        .stripMargin.replace("\n", " "),
    "q427_mmd" ->
      s"""WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  vec_id % 2 = 1 AS isb FROM embeddings
         | WHERE embedding IS NOT NULL),
         |r AS (SELECT *, row_number() OVER (PARTITION BY isb
         |  ORDER BY vec_id)::BIGINT AS rn FROM b),
         |rr AS (SELECT *, floor((rn + 1) / 2.0)::BIGINT AS j,
         |  rn % 2 = 1 AS odd FROM r),
         |x1 AS (SELECT j, v FROM rr WHERE NOT isb AND odd),
         |x2 AS (SELECT j, v FROM rr WHERE NOT isb AND NOT odd),
         |y1 AS (SELECT j, v FROM rr WHERE isb AND odd),
         |y2 AS (SELECT j, v FROM rr WHERE isb AND NOT odd),
         |q AS (SELECT x1.j, x1.v AS a1, x2.v AS a2, y1.v AS b1, y2.v AS b2
         | FROM x1 JOIN x2 USING (j) JOIN y1 USING (j) JOIN y2 USING (j)),
         |hh AS (SELECT j,
         |  exp(-(list_reduce(list_transform(range(1, len(a1)+1),
         |    i -> (a1[i]-a2[i])*(a1[i]-a2[i])), (acc,x) -> acc + x)) / 2.0)
         |  + exp(-(list_reduce(list_transform(range(1, len(b1)+1),
         |    i -> (b1[i]-b2[i])*(b1[i]-b2[i])), (acc,x) -> acc + x)) / 2.0)
         |  - exp(-(list_reduce(list_transform(range(1, len(a1)+1),
         |    i -> (a1[i]-b2[i])*(a1[i]-b2[i])), (acc,x) -> acc + x)) / 2.0)
         |  - exp(-(list_reduce(list_transform(range(1, len(a2)+1),
         |    i -> (a2[i]-b1[i])*(a2[i]-b1[i])), (acc,x) -> acc + x)) / 2.0)
         |   AS h FROM q)
         |SELECT count(*)::BIGINT AS m_pairs,
         | round(sum(${fp6s("h")})::DOUBLE / 1000000.0
         |   / count(*)::DOUBLE, 4) + 0 AS mmd2 FROM hh"""
        .stripMargin.replace("\n", " "),
    "q428_fisher" ->
      """WITH cells AS (SELECT
        |  sum(CASE WHEN doc_id % 2 = 0 AND lang = 'en'
        |    THEN 1 ELSE 0 END)::BIGINT AS a,
        |  sum(CASE WHEN doc_id % 2 = 0 AND lang <> 'en'
        |    THEN 1 ELSE 0 END)::BIGINT AS b,
        |  sum(CASE WHEN doc_id % 2 <> 0 AND lang = 'en'
        |    THEN 1 ELSE 0 END)::BIGINT AS c,
        |  sum(CASE WHEN doc_id % 2 <> 0 AND lang <> 'en'
        |    THEN 1 ELSE 0 END)::BIGINT AS d
        | FROM documents WHERE doc_id < 2000),
        |lf AS (SELECT i, sum(CASE WHEN i >= 2 THEN ln(i::DOUBLE)
        |   ELSE 0.0 END) OVER (ORDER BY i ASC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lf
        | FROM (SELECT unnest(range(0,
        |   (SELECT a + b + c + d FROM cells) + 1)) AS i)),
        |en AS (SELECT cells.*, a + b AS r1, c + d AS r2, a + c AS c1,
        |  a + b + c + d AS nn,
        |  unnest(range(a, least(a + b, a + c) + 1)) AS ap FROM cells),
        |j AS (SELECT en.*,
        |  l1.lf AS l_r1, l2.lf AS l_r2, l3.lf AS l_c1, l4.lf AS l_c2,
        |  l5.lf AS l_n, l6.lf AS l_a, l7.lf AS l_b, l8.lf AS l_c,
        |  l9.lf AS l_d
        | FROM en
        | JOIN lf l1 ON l1.i = en.r1 JOIN lf l2 ON l2.i = en.r2
        | JOIN lf l3 ON l3.i = en.c1 JOIN lf l4 ON l4.i = en.nn - en.c1
        | JOIN lf l5 ON l5.i = en.nn JOIN lf l6 ON l6.i = en.ap
        | JOIN lf l7 ON l7.i = en.r1 - en.ap
        | JOIN lf l8 ON l8.i = en.c1 - en.ap
        | JOIN lf l9 ON l9.i = en.r2 - en.c1 + en.ap),
        |t AS (SELECT a, b, c, d,
        |  exp(l_r1 + l_r2 + l_c1 + l_c2 - l_n - l_a - l_b - l_c - l_d)
        |   AS term FROM j)
        |SELECT a, b, c, d,
        | round(sum(floor(term * 1000000000000.0 + 0.5)::BIGINT)::DOUBLE
        |   / 1000000000000.0, 4) AS p_one
        |FROM t GROUP BY 1, 2, 3, 4""".stripMargin.replace("\n", " "),
    "q433_jackknife" ->
      s"""WITH b AS (SELECT event_type AS key, user_id % 20 AS bk,
         |  ${fp4("value")} AS y
         | FROM events WHERE value IS NOT NULL),
         |bl AS (SELECT key, bk, count(*)::BIGINT AS nb,
         |  sum(y::HUGEINT) AS sb FROM b GROUP BY 1, 2),
         |t AS (SELECT key, sum(nb)::BIGINT AS n, count(*)::BIGINT AS nbl,
         |  sum(sb) AS s FROM bl GROUP BY 1 HAVING count(*) >= 2),
         |j AS (SELECT bl.key, bl.nb, bl.sb, t.n, t.nbl, t.s,
         |  (t.s::DOUBLE - bl.sb::DOUBLE) / (t.n - bl.nb)::DOUBLE / 10000.0
         |   AS lo FROM bl JOIN t USING (key)),
         |br AS (SELECT key, sum(${fp6s("lo")}) AS lsum,
         |  count(*)::BIGINT AS bb FROM j GROUP BY key),
         |j2 AS (SELECT j.*,
         |  br.lsum::DOUBLE / 1000000.0 / br.bb::DOUBLE AS bar
         | FROM j JOIN br USING (key)),
         |g AS (SELECT key, max(n)::BIGINT AS n,
         |  max(nbl)::BIGINT AS n_blocks, max(s) AS s2,
         |  sum(${fp6s("(lo - bar) * (lo - bar)")}) AS dev
         | FROM j2 GROUP BY key)
         |SELECT key, n, n_blocks,
         | round(s2::DOUBLE / n::DOUBLE / 10000.0, 4) + 0 AS mean,
         | round(sqrt((n_blocks - 1)::DOUBLE / n_blocks::DOUBLE
         |   * (dev::DOUBLE / 1000000.0)), 4) AS se_jack
         |FROM g""".stripMargin.replace("\n", " "),
    "q434_capture_recapture" ->
      """WITH it AS (SELECT text AS item,
        |  max(doc_id % 3 <> 0) AS a, max(doc_id % 5 <> 0) AS b
        | FROM documents GROUP BY 1),
        |c AS (SELECT sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS n1,
        |  sum(CASE WHEN b THEN 1 ELSE 0 END)::BIGINT AS n2,
        |  sum(CASE WHEN a AND b THEN 1 ELSE 0 END)::BIGINT AS m FROM it)
        |SELECT n1, n2, m AS m_overlap,
        | round((n1::DOUBLE + 1) * (n2::DOUBLE + 1) / (m::DOUBLE + 1)
        |   - 1.0, 4) AS n_hat,
        | round(sqrt((n1::DOUBLE + 1) * (n2::DOUBLE + 1)
        |   * (n1::DOUBLE - m::DOUBLE) * (n2::DOUBLE - m::DOUBLE)
        |   / ((m::DOUBLE + 1) * (m::DOUBLE + 1) * (m::DOUBLE + 2))), 4)
        |  AS se FROM c""".stripMargin.replace("\n", " "),
    "q435_chao1" ->
      """WITH tk AS (SELECT source AS key,
        |  unnest(regexp_extract_all(lower(text), '\S+')) AS t
        | FROM documents),
        |tk2 AS (SELECT key, t FROM tk WHERE t <> ''),
        |c AS (SELECT key, t, count(*)::BIGINT AS c FROM tk2 GROUP BY 1, 2),
        |g AS (SELECT key, sum(c)::BIGINT AS n_tokens,
        |  count(*)::BIGINT AS d_types,
        |  sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS f1,
        |  sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS f2
        | FROM c GROUP BY 1)
        |SELECT key, n_tokens, d_types, f1, f2,
        | round(CASE WHEN f2 > 0 THEN d_types::DOUBLE
        |    + f1::DOUBLE * f1::DOUBLE / (2.0 * f2::DOUBLE)
        |  ELSE d_types::DOUBLE + f1::DOUBLE * (f1::DOUBLE - 1) / 2.0
        |  END, 4) AS chao1 FROM g""".stripMargin.replace("\n", " "),
    "q436_good_turing" ->
      """WITH tk AS (SELECT source AS key,
        |  unnest(regexp_extract_all(lower(text), '\S+')) AS t
        | FROM documents),
        |tk2 AS (SELECT key, t FROM tk WHERE t <> ''),
        |c AS (SELECT key, t, count(*)::BIGINT AS c FROM tk2 GROUP BY 1, 2),
        |coc AS (SELECT key, c AS r, count(*)::BIGINT AS n_r FROM c
        | WHERE c <= 6 GROUP BY 1, 2),
        |nx AS (SELECT key, r - 1 AS r, n_r AS n_r1 FROM coc)
        |SELECT coc.key, coc.r, coc.n_r,
        | round((coc.r + 1)::DOUBLE * nx.n_r1::DOUBLE / coc.n_r::DOUBLE, 4)
        |  AS r_star
        |FROM coc LEFT JOIN nx ON nx.key = coc.key AND nx.r = coc.r
        |WHERE coc.r <= 5""".stripMargin.replace("\n", " "),
    "q437_unigram_kl" ->
      s"""WITH tk AS (SELECT source = 'src1' AS a,
         |  unnest(regexp_extract_all(lower(text), '\\S+')) AS t
         | FROM documents WHERE source IN ('src1', 'src2')),
         |tk2 AS (SELECT a, t FROM tk WHERE t <> ''),
         |cnt AS (SELECT t,
         |  sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS ca,
         |  sum(CASE WHEN NOT a THEN 1 ELSE 0 END)::BIGINT AS cb
         | FROM tk2 GROUP BY 1),
         |tot AS (SELECT count(*)::BIGINT AS v, sum(ca)::BIGINT AS na,
         |  sum(cb)::BIGINT AS nb FROM cnt),
         |p AS (SELECT cnt.ca, cnt.cb, tot.v, tot.na, tot.nb,
         |  (ca::DOUBLE + 0.5) / (na::DOUBLE + 0.5 * v::DOUBLE) AS pa,
         |  (cb::DOUBLE + 0.5) / (nb::DOUBLE + 0.5 * v::DOUBLE) AS pb
         | FROM cnt CROSS JOIN tot),
         |s AS (SELECT v, na, nb,
         |  sum(${fp6s("pa * ln(pa / pb)")}) AS sab,
         |  sum(${fp6s("pb * ln(pb / pa)")}) AS sba
         | FROM p GROUP BY 1, 2, 3)
         |SELECT v, na AS n_a, nb AS n_b,
         | round(sab::DOUBLE / 1000000.0, 4) + 0 AS kl_ab,
         | round(sba::DOUBLE / 1000000.0, 4) + 0 AS kl_ba FROM s"""
        .stripMargin.replace("\n", " "),
    "q438_log_odds" ->
      """WITH tk AS (SELECT source = 'src1' AS a,
        |  unnest(regexp_extract_all(lower(text), '\S+')) AS t
        | FROM documents WHERE source IN ('src1', 'src2')),
        |tk2 AS (SELECT a, t FROM tk WHERE t <> ''),
        |cnt AS (SELECT t,
        |  sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS ca,
        |  sum(CASE WHEN NOT a THEN 1 ELSE 0 END)::BIGINT AS cb
        | FROM tk2 GROUP BY 1 HAVING sum(CASE WHEN a THEN 1 ELSE 0 END)
        |  + sum(CASE WHEN NOT a THEN 1 ELSE 0 END) >= 5),
        |tot AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb,
        |  sum(ca + cb)::BIGINT AS nn FROM cnt),
        |tt AS (SELECT cnt.t, cnt.ca, cnt.cb, tot.na, tot.nb,
        |  10.0 * (ca + cb)::DOUBLE / nn::DOUBLE AS aw
        | FROM cnt CROSS JOIN tot),
        |f AS (SELECT t AS token, ca, cb,
        |  ln((ca::DOUBLE + aw) / (na::DOUBLE + 10.0 - ca::DOUBLE - aw))
        |   - ln((cb::DOUBLE + aw) / (nb::DOUBLE + 10.0 - cb::DOUBLE - aw))
        |   AS delta,
        |  1.0 / (ca::DOUBLE + aw) + 1.0 / (cb::DOUBLE + aw) AS sig2
        | FROM tt)
        |SELECT token, ca AS c_a, cb AS c_b, round(delta, 4) + 0 AS delta,
        | round(delta / sqrt(sig2), 4) + 0 AS z FROM f"""
        .stripMargin.replace("\n", " "),
    "q439_cliffs_delta" ->
      s"""WITH h AS (SELECT ${fp4("value")} AS v,
         |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
         |    AS ca,
         |  count(*)::BIGINT AS ct
         | FROM events WHERE value IS NOT NULL
         |  AND event_type IN ('click', 'error') GROUP BY 1),
         |r AS (SELECT *, 2 * (sum(ct) OVER (ORDER BY v ASC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ct)
         |  + ct + 1 AS r2 FROM h),
         |a AS (SELECT sum(ca)::BIGINT AS n_a,
         |  (sum(ct) - sum(ca))::BIGINT AS n_b,
         |  sum(ca * r2)::BIGINT AS ra2 FROM r),
         |f AS (SELECT n_a, n_b,
         |  ra2::DOUBLE / 2.0 - n_a::DOUBLE * (n_a::DOUBLE + 1) / 2.0 AS u
         | FROM a)
         |SELECT n_a, n_b, round(u, 4) AS u_stat,
         | round(2.0 * u / (n_a::DOUBLE * n_b::DOUBLE) - 1.0, 4) + 0
         |  AS delta FROM f""".stripMargin.replace("\n", " "),
    "q440_yuen" -> {
      def side(g: String) =
        s"""(WITH h AS (SELECT ${fp4("value")} AS v, count(*)::BIGINT AS c
           | FROM events WHERE value IS NOT NULL AND event_type = '$g'
           | GROUP BY 1),
           |t AS (SELECT sum(c)::BIGINT AS n FROM h),
           |cum AS (SELECT h.v, h.c, t.n,
           |  sum(c) OVER (ORDER BY v ASC
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS cb,
           |  floor(0.2 * t.n::DOUBLE)::BIGINT AS g
           | FROM h CROSS JOIN t),
           |k AS (SELECT *, greatest(0, least(cb + c, n - g)
           |   - greatest(cb, g)) AS kept FROM cum)
           |SELECT max(n) AS n, max(g) AS g,
           | sum((kept * v)::HUGEINT) AS ts,
           | sum((kept * v)::HUGEINT * v::HUGEINT) AS tss,
           | max(CASE WHEN cb < g + 1 AND cb + c >= g + 1 THEN v END)
           |  AS vlo,
           | max(CASE WHEN cb < n - g AND cb + c >= n - g THEN v END)
           |  AS vhi
           |FROM k)""".stripMargin.replace("\n", " ")
      s"""WITH sa AS (SELECT * FROM ${side("click")}),
         |sb AS (SELECT * FROM ${side("error")}),
         |f AS (SELECT
         |  sa.n AS n_a, sb.n AS n_b,
         |  (sa.n - 2*sa.g)::DOUBLE AS ha, (sb.n - 2*sb.g)::DOUBLE AS hb,
         |  sa.ts::DOUBLE / (sa.n - 2*sa.g)::DOUBLE / 10000.0 AS tm_a,
         |  sb.ts::DOUBLE / (sb.n - 2*sb.g)::DOUBLE / 10000.0 AS tm_b,
         |  ((sa.tss::DOUBLE + sa.g::DOUBLE * sa.vlo::DOUBLE * sa.vlo::DOUBLE
         |    + sa.g::DOUBLE * sa.vhi::DOUBLE * sa.vhi::DOUBLE
         |   - (sa.ts::DOUBLE + sa.g::DOUBLE * sa.vlo::DOUBLE
         |      + sa.g::DOUBLE * sa.vhi::DOUBLE)
         |    * (sa.ts::DOUBLE + sa.g::DOUBLE * sa.vlo::DOUBLE
         |      + sa.g::DOUBLE * sa.vhi::DOUBLE) / sa.n::DOUBLE)
         |   / (sa.n::DOUBLE - 1) / 100000000.0)
         |  * (sa.n::DOUBLE - 1)
         |  / ((sa.n - 2*sa.g)::DOUBLE * ((sa.n - 2*sa.g)::DOUBLE - 1))
         |   AS da,
         |  ((sb.tss::DOUBLE + sb.g::DOUBLE * sb.vlo::DOUBLE * sb.vlo::DOUBLE
         |    + sb.g::DOUBLE * sb.vhi::DOUBLE * sb.vhi::DOUBLE
         |   - (sb.ts::DOUBLE + sb.g::DOUBLE * sb.vlo::DOUBLE
         |      + sb.g::DOUBLE * sb.vhi::DOUBLE)
         |    * (sb.ts::DOUBLE + sb.g::DOUBLE * sb.vlo::DOUBLE
         |      + sb.g::DOUBLE * sb.vhi::DOUBLE) / sb.n::DOUBLE)
         |   / (sb.n::DOUBLE - 1) / 100000000.0)
         |  * (sb.n::DOUBLE - 1)
         |  / ((sb.n - 2*sb.g)::DOUBLE * ((sb.n - 2*sb.g)::DOUBLE - 1))
         |   AS db
         | FROM sa CROSS JOIN sb),
         |f2 AS (SELECT n_a, n_b, tm_a, tm_b,
         |  (tm_a - tm_b) / sqrt(da + db) AS tst,
         |  (da + db) * (da + db)
         |   / (da * da / (ha - 1) + db * db / (hb - 1)) AS dff
         | FROM f)
         |SELECT n_a, n_b, round(tm_a, 4) + 0 AS tm_a,
         | round(tm_b, 4) + 0 AS tm_b,
         | round(tst, 4) + 0 AS t_stat, round(dff, 4) AS df
         |FROM f2""".stripMargin.replace("\n", " ")
    },
    "q442_imr" ->
      s"""WITH b AS (SELECT event_type AS key, event_id AS ord,
         |  ${fp4("value")} AS x4
         | FROM events WHERE value IS NOT NULL),
         |l AS (SELECT key, ord, x4, abs(x4 - lag(x4)
         |  OVER (PARTITION BY key ORDER BY ord)) AS mr4 FROM b),
         |cl AS (SELECT key, count(*)::BIGINT AS n, sum(x4::HUGEINT) AS sx,
         |  sum(mr4::HUGEINT) AS smr,
         |  sum(CASE WHEN mr4 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS nmr
         | FROM l GROUP BY key
         | HAVING sum(CASE WHEN mr4 IS NOT NULL THEN 1 ELSE 0 END) >= 1),
         |f AS (SELECT l.key, l.ord, l.x4::DOUBLE/10000.0 AS x,
         |  l.mr4::DOUBLE/10000.0 AS mr,
         |  cl.sx::DOUBLE / cl.n::DOUBLE / 10000.0 AS xc,
         |  cl.smr::DOUBLE / cl.nmr::DOUBLE / 10000.0 AS mrc
         | FROM l JOIN cl USING (key))
         |SELECT key, ord, round(x, 4) + 0 AS x, round(mr, 4) AS mr,
         | round(xc + 2.66*mrc, 4) AS x_ucl,
         | round(xc - 2.66*mrc, 4) + 0 AS x_lcl,
         | round(3.267*mrc, 4) AS mr_ucl,
         | (x > xc + 2.66*mrc OR x < xc - 2.66*mrc) AS out_x,
         | (mr > 3.267*mrc) AS out_mr
         |FROM f""".stripMargin.replace("\n", " "),
    "q443_transfer_entropy" ->
      s"""WITH cc AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
         |  sum(${fp4("value")})::HUGEINT AS s, count(*)::BIGINT AS n
         | FROM events WHERE value IS NOT NULL AND event_type = 'click'
         | GROUP BY 1),
         |ee AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
         |  sum(${fp4("value")})::HUGEINT AS s, count(*)::BIGINT AS n
         | FROM events WHERE value IS NOT NULL AND event_type = 'error'
         | GROUP BY 1),
         |ser AS (SELECT cc.day,
         |  ${fp4("cc.s::DOUBLE / 10000.0 / cc.n::DOUBLE")} AS x,
         |  ${fp4("ee.s::DOUBLE / 10000.0 / ee.n::DOUBLE")} AS y
         | FROM cc JOIN ee USING (day)),
         |hx AS (SELECT x AS v, count(*)::BIGINT AS c FROM ser GROUP BY 1),
         |mx AS (SELECT min(v) AS xmed FROM (SELECT v,
         |  sum(c) OVER (ORDER BY v ASC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |  (SELECT sum(c) FROM hx) AS tot FROM hx) WHERE 2*cum >= tot),
         |hy AS (SELECT y AS v, count(*)::BIGINT AS c FROM ser GROUP BY 1),
         |my AS (SELECT min(v) AS ymed FROM (SELECT v,
         |  sum(c) OVER (ORDER BY v ASC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |  (SELECT sum(c) FROM hy) AS tot FROM hy) WHERE 2*cum >= tot),
         |bb AS (SELECT day, (x > mx.xmed)::INT AS xb, (y > my.ymed)::INT
         |   AS yb FROM ser CROSS JOIN mx CROSS JOIN my),
         |ll AS (SELECT yb, lag(yb) OVER (ORDER BY day) AS y1,
         |  lag(xb) OVER (ORDER BY day) AS x1 FROM bb),
         |ff AS (SELECT yb, y1, x1 FROM ll WHERE y1 IS NOT NULL),
         |c3 AS (SELECT yb, y1, x1, count(*)::BIGINT AS c3 FROM ff
         | GROUP BY 1, 2, 3),
         |c2a AS (SELECT y1, x1, sum(c3)::BIGINT AS c2a FROM c3
         | GROUP BY 1, 2),
         |c2b AS (SELECT yb, y1, sum(c3)::BIGINT AS c2b FROM c3
         | GROUP BY 1, 2),
         |c1 AS (SELECT y1, sum(c3)::BIGINT AS c1 FROM c3 GROUP BY 1),
         |nn AS (SELECT sum(c3)::BIGINT AS n FROM c3),
         |tt AS (SELECT nn.n,
         |  ${fp6s("c3.c3::DOUBLE / nn.n::DOUBLE " +
            "* ln(c3.c3::DOUBLE * c1.c1::DOUBLE " +
            "/ (c2a.c2a::DOUBLE * c2b.c2b::DOUBLE))")} AS t
         | FROM c3 JOIN c2a USING (y1, x1) JOIN c2b USING (yb, y1)
         | JOIN c1 USING (y1) CROSS JOIN nn)
         |SELECT 'click->error' AS key, max(n)::BIGINT AS n,
         | round(sum(t)::DOUBLE / 1000000.0, 4) + 0 AS te FROM tt"""
        .stripMargin.replace("\n", " "),
    "q444_granger" ->
      s"""WITH cc AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
         |  sum(${fp4("value")})::HUGEINT AS s, count(*)::BIGINT AS n
         | FROM events WHERE value IS NOT NULL AND event_type = 'click'
         | GROUP BY 1),
         |ee AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
         |  sum(${fp4("value")})::HUGEINT AS s, count(*)::BIGINT AS n
         | FROM events WHERE value IS NOT NULL AND event_type = 'error'
         | GROUP BY 1),
         |ser AS (SELECT cc.day,
         |  ${fp4("cc.s::DOUBLE / 10000.0 / cc.n::DOUBLE")} AS x,
         |  ${fp4("ee.s::DOUBLE / 10000.0 / ee.n::DOUBLE")} AS y
         | FROM cc JOIN ee USING (day)),
         |lg AS (SELECT y, lag(y) OVER (ORDER BY day) AS u,
         |  lag(x) OVER (ORDER BY day) AS v FROM ser),
         |f0 AS (SELECT y, u, v FROM lg WHERE u IS NOT NULL),
         |s AS (SELECT count(*)::BIGINT AS n,
         |  sum(y::HUGEINT) AS sy, sum(u::HUGEINT) AS su,
         |  sum(v::HUGEINT) AS sv,
         |  sum(y::HUGEINT * y::HUGEINT) AS syy,
         |  sum(u::HUGEINT * u::HUGEINT) AS suu,
         |  sum(v::HUGEINT * v::HUGEINT) AS svv,
         |  sum(u::HUGEINT * y::HUGEINT) AS suy,
         |  sum(v::HUGEINT * y::HUGEINT) AS svy,
         |  sum(u::HUGEINT * v::HUGEINT) AS suv
         | FROM f0 HAVING count(*) >= 8),
         |c AS (SELECT n, n::DOUBLE AS nd,
         |  syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE AS cyy,
         |  suu::DOUBLE - su::DOUBLE * su::DOUBLE / n::DOUBLE AS cuu,
         |  svv::DOUBLE - sv::DOUBLE * sv::DOUBLE / n::DOUBLE AS cvv,
         |  suy::DOUBLE - su::DOUBLE * sy::DOUBLE / n::DOUBLE AS cuy,
         |  svy::DOUBLE - sv::DOUBLE * sy::DOUBLE / n::DOUBLE AS cvy,
         |  suv::DOUBLE - su::DOUBLE * sv::DOUBLE / n::DOUBLE AS cuv
         | FROM s),
         |d AS (SELECT n, nd, cyy, cuy, cvy, cuu,
         |  cuu * cvv - cuv * cuv AS det,
         |  (cuy * cvv - cvy * cuv) / (cuu * cvv - cuv * cuv) AS bb,
         |  (cvy * cuu - cuy * cuv) / (cuu * cvv - cuv * cuv) AS ccoef
         | FROM c),
         |ff AS (SELECT n, nd, det,
         |  cyy - bb * cuy - ccoef * cvy AS sseu,
         |  cyy - cuy * cuy / cuu AS sser FROM d)
         |SELECT 'click->error' AS key, n,
         | round(CASE WHEN sseu > 0 AND det > 0
         |  THEN (sser - sseu) * (nd - 3) / sseu ELSE 0.0 END, 4) + 0
         |  AS f_stat FROM ff""".stripMargin.replace("\n", " "),
    "q445_newey_west" ->
      s"""WITH b AS (SELECT event_type AS key, event_id AS o,
         |  epoch_ns(ts) // 86400000000000 AS x, ${fp4("value")} AS y4
         | FROM events WHERE value IS NOT NULL),
         |g AS (SELECT key, count(*)::BIGINT AS n, sum(x)::HUGEINT AS sx,
         |  sum(x::HUGEINT * x::HUGEINT) AS sxx, sum(y4)::HUGEINT AS sy,
         |  sum(x::HUGEINT * y4::HUGEINT) AS sxy
         | FROM b GROUP BY key HAVING count(*) >= 8),
         |c AS (SELECT key, n, sx,
         |  (n::DOUBLE*sxy::DOUBLE - sx::DOUBLE*sy::DOUBLE)
         |   /(n::DOUBLE*sxx::DOUBLE - sx::DOUBLE*sx::DOUBLE)/10000.0
         |    AS slope,
         |  (sy::DOUBLE/10000.0
         |    - (n::DOUBLE*sxy::DOUBLE - sx::DOUBLE*sy::DOUBLE)
         |      /(n::DOUBLE*sxx::DOUBLE - sx::DOUBLE*sx::DOUBLE)/10000.0
         |      *sx::DOUBLE)/n::DOUBLE AS icept
         | FROM g),
         |z AS (SELECT b.key, b.o,
         |  (c.n * b.x - c.sx)::HUGEINT
         |   * ${fp4("b.y4::DOUBLE / 10000.0 - (c.icept + c.slope * b.x)")}
         |    ::HUGEINT AS z,
         |  (c.n * b.x - c.sx)::HUGEINT * (c.n * b.x - c.sx)::HUGEINT
         |    AS a2,
         |  c.n, c.slope
         | FROM b JOIN c USING (key)),
         |l AS (SELECT key, n, slope, z, a2,
         |  lag(z) OVER wk AS z1, lag(z, 2) OVER wk AS z2,
         |  lag(z, 3) OVER wk AS z3, lag(z, 4) OVER wk AS z4
         | FROM z WINDOW wk AS (PARTITION BY key ORDER BY o)),
         |gg AS (SELECT key, max(n)::BIGINT AS n, max(slope) AS slope,
         |  sum(a2) AS sa2, sum(z * z) AS g0, sum(z * z1) AS g1,
         |  sum(z * z2) AS g2, sum(z * z3) AS g3, sum(z * z4) AS g4
         | FROM l GROUP BY key),
         |fin AS (SELECT key, n, slope,
         |  sqrt((g0::DOUBLE + 2.0 * (0.8 * g1::DOUBLE + 0.6 * g2::DOUBLE
         |    + 0.4 * g3::DOUBLE + 0.2 * g4::DOUBLE))
         |   * n::DOUBLE * n::DOUBLE
         |   / (100000000.0 * sa2::DOUBLE * sa2::DOUBLE)) AS se
         | FROM gg)
         |SELECT key, n, round(slope, 4) + 0 AS slope,
         | round(se, 4) AS se_hac, round(slope / se, 4) + 0 AS t_hac
         |FROM fin""".stripMargin.replace("\n", " "),
    "q446_burstiness" ->
      """WITH b AS (SELECT event_type AS key, epoch_ns(ts) AS t,
        |  event_id AS s FROM events),
        |ga AS (SELECT key, t, s, t - lag(t) OVER
        |  (PARTITION BY key ORDER BY t, s) AS g FROM b),
        |gb AS (SELECT key, t, s, g FROM ga WHERE g IS NOT NULL),
        |gc AS (SELECT key, g, lead(g) OVER
        |  (PARTITION BY key ORDER BY t, s) AS gn FROM gb),
        |a AS (SELECT key, count(*)::BIGINT AS n_gaps,
        |  sum(g::HUGEINT) AS sg, sum(g::HUGEINT * g::HUGEINT) AS sgg,
        |  sum(CASE WHEN gn IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS np,
        |  sum(CASE WHEN gn IS NOT NULL THEN g::HUGEINT END) AS sx,
        |  sum(CASE WHEN gn IS NOT NULL THEN gn::HUGEINT END) AS sy,
        |  sum(CASE WHEN gn IS NOT NULL
        |    THEN g::HUGEINT * gn::HUGEINT END) AS sxy,
        |  sum(CASE WHEN gn IS NOT NULL
        |    THEN g::HUGEINT * g::HUGEINT END) AS sxx,
        |  sum(CASE WHEN gn IS NOT NULL
        |    THEN gn::HUGEINT * gn::HUGEINT END) AS syy
        | FROM gc GROUP BY key HAVING count(*) >= 3
        |  AND sum(CASE WHEN gn IS NOT NULL THEN 1 ELSE 0 END) >= 2),
        |f AS (SELECT key, n_gaps,
        |  sg::DOUBLE / n_gaps::DOUBLE AS mu,
        |  sqrt((sgg::DOUBLE - sg::DOUBLE * sg::DOUBLE / n_gaps::DOUBLE)
        |   / (n_gaps::DOUBLE - 1)) AS sig,
        |  np::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS covn,
        |  np::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS vxn,
        |  np::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS vyn
        | FROM a)
        |SELECT key, n_gaps, round(mu / 1000000.0, 4) AS mean_gap_ms,
        | round((sig - mu) / (sig + mu), 4) + 0 AS burstiness,
        | round(CASE WHEN vxn > 0 AND vyn > 0 THEN covn / sqrt(vxn * vyn)
        |  ELSE 0.0 END, 4) + 0 AS memory
        |FROM f""".stripMargin.replace("\n", " "),
    "q447_rbo" ->
      s"""WITH r AS (SELECT doc_id AS id, n_chars::DOUBLE AS a,
         |  ((doc_id*37 + n_chars) % 1000)::DOUBLE AS b FROM documents),
         |rk AS (SELECT id,
         |  row_number() OVER (ORDER BY a DESC, id)::BIGINT AS ra,
         |  row_number() OVER (ORDER BY b DESC, id)::BIGINT AS rb FROM r),
         |mm AS (SELECT greatest(ra, rb) AS m FROM rk
         | WHERE greatest(ra, rb) <= 50),
         |bym AS (SELECT m, count(*)::BIGINT AS c FROM mm GROUP BY 1),
         |ks AS (SELECT unnest(range(1, 51))::BIGINT AS k),
         |xk AS (SELECT k, sum(coalesce(c, 0))::BIGINT AS xk FROM ks
         | LEFT JOIN bym ON bym.m <= ks.k GROUP BY k),
         |t AS (SELECT ${fp6s("pow(0.9, k::DOUBLE - 1) " +
            "* xk::DOUBLE / k::DOUBLE")} AS t FROM xk)
         |SELECT 50 AS d,
         | round((1.0::DOUBLE - 0.9::DOUBLE)
         |   * (sum(t)::DOUBLE / 1000000.0), 4) AS rbo FROM t"""
        .stripMargin.replace("\n", " "),
    "q451_aalen_johansen" ->
      s"""WITH $subjSql,
         |h AS (SELECT dur AS t,
         |  sum(CASE WHEN event AND grp = 'even' THEN 1 ELSE 0 END)::BIGINT
         |    AS d1,
         |  sum(CASE WHEN NOT (event AND grp = 'even')
         |    AND (event AND grp = 'odd') THEN 1 ELSE 0 END)::BIGINT AS d2,
         |  sum(CASE WHEN NOT (event AND grp = 'even')
         |    AND NOT (event AND grp = 'odd') THEN 1 ELSE 0 END)::BIGINT
         |    AS c
         | FROM subj GROUP BY 1),
         |tot AS (SELECT sum(d1 + d2 + c)::BIGINT AS n FROM h),
         |f1 AS (SELECT t, d1, d2, c,
         |  (SELECT n FROM tot)
         |   - (sum(d1 + d2 + c) OVER wcum - (d1 + d2 + c)) AS n_risk
         | FROM h WINDOW wcum AS (ORDER BY t ASC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |f2 AS (SELECT t, d1, d2, c, n_risk,
         |  exp(coalesce(sum(CASE WHEN d1 + d2 < n_risk
         |    THEN ln(1.0 - (d1 + d2)::DOUBLE / n_risk::DOUBLE)
         |    ELSE CAST('-infinity' AS DOUBLE) END) OVER
         |   (ORDER BY t ASC ROWS BETWEEN UNBOUNDED PRECEDING
         |     AND 1 PRECEDING), 0.0)) AS sprev
         | FROM f1),
         |f3 AS (SELECT t, n_risk::BIGINT AS n_risk, d1, d2, c,
         |  sum(floor(sprev * (d1::DOUBLE / n_risk::DOUBLE)
         |    * 1000000.0 + 0.5)::BIGINT) OVER wcum AS s1,
         |  sum(floor(sprev * (d2::DOUBLE / n_risk::DOUBLE)
         |    * 1000000.0 + 0.5)::BIGINT) OVER wcum AS s2
         | FROM f2 WINDOW wcum AS (ORDER BY t ASC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT t, n_risk, d1, d2, c,
         | round(s1::DOUBLE / 1000000.0, 4) AS cif1,
         | round(s2::DOUBLE / 1000000.0, 4) AS cif2 FROM f3"""
        .stripMargin.replace("\n", " "),
    "q452_overdispersion" ->
      """WITH w AS (SELECT event_type AS key,
        |  epoch_ns(ts) // 86400000000000 AS win,
        |  count(*)::BIGINT AS n,
        |  sum(CASE WHEN value > 160.0 THEN 1 ELSE 0 END)::BIGINT AS k
        | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |a AS (SELECT key, count(*)::BIGINT AS n_windows,
        |  sum(n)::BIGINT AS tn, sum(k)::BIGINT AS tk,
        |  sum(k::HUGEINT * k::HUGEINT) AS tk2
        | FROM w GROUP BY key HAVING count(*) >= 3),
        |f AS (SELECT key, n_windows, n_windows::DOUBLE AS m,
        |  tn::DOUBLE / n_windows::DOUBLE AS nbar,
        |  tk::DOUBLE / n_windows::DOUBLE AS mu,
        |  (tk2::DOUBLE - tk::DOUBLE * tk::DOUBLE / n_windows::DOUBLE)
        |   / (n_windows::DOUBLE - 1) AS v FROM a),
        |g AS (SELECT key, n_windows, mu / nbar AS p, mu, v, nbar,
        |  (v / (nbar * (mu / nbar) * (1.0 - mu / nbar)) - 1.0)
        |   / (nbar - 1) AS rho FROM f)
        |SELECT key, n_windows, round(p, 4) AS mean_rate,
        | round(CASE WHEN rho > 0 THEN p * (1.0 / rho - 1.0)
        |  ELSE 0.0 END, 4) AS alpha,
        | round(CASE WHEN rho > 0 THEN (1.0 - p) * (1.0 / rho - 1.0)
        |  ELSE 0.0 END, 4) AS beta,
        | round(CASE WHEN v > mu THEN mu * mu / (v - mu)
        |  ELSE 0.0 END, 4) AS nb_r,
        | round(CASE WHEN v > mu THEN mu / v ELSE 1.0 END, 4) AS nb_p,
        | v > mu AS overdispersed FROM g"""
        .stripMargin.replace("\n", " "),
    "q449_best_survivor" ->
      s"""${TextQueries.clusterSql},
         |q AS (SELECT comp.id, comp.cluster, d.n_chars
         | FROM comp JOIN documents d ON d.doc_id = comp.id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY cluster
         |   ORDER BY n_chars DESC, id ASC) AS rk,
         |  count(*) OVER (PARTITION BY cluster) AS cs FROM q)
         |SELECT cluster, id AS survivor_id, n_chars AS quality,
         | cs::BIGINT AS cluster_size FROM r WHERE rk = 1"""
        .stripMargin.replace("\n", " "),
    "q450_heaps" ->
      """WITH tk AS (SELECT source,
        |  unnest(regexp_extract_all(lower(text), '\S+')) AS tok
        | FROM documents),
        |tk2 AS (SELECT source, tok FROM tk WHERE tok <> ''),
        |c AS (SELECT source, tok, count(*)::BIGINT AS c FROM tk2
        | GROUP BY 1, 2),
        |pts AS (SELECT source, sum(c)::BIGINT AS nt,
        |  count(*)::BIGINT AS dt FROM c GROUP BY source),
        |s6 AS (SELECT floor(ln(nt::DOUBLE) * 1000000.0 + 0.5)::BIGINT
        |   AS lx,
        |  floor(ln(dt::DOUBLE) * 1000000.0 + 0.5)::BIGINT AS ly
        | FROM pts),
        |a AS (SELECT count(*)::BIGINT AS n_points,
        |  sum(lx)::BIGINT AS sx, sum(ly)::BIGINT AS sy,
        |  sum(lx::HUGEINT * lx::HUGEINT) AS sxx,
        |  sum(lx::HUGEINT * ly::HUGEINT) AS sxy FROM s6),
        |f AS (SELECT n_points, n_points::DOUBLE AS n,
        |  (n_points::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |   /(n_points::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |    AS beta,
        |  sx::DOUBLE AS sxd, sy::DOUBLE AS syd FROM a)
        |SELECT n_points, round(beta, 4) AS beta,
        | round(exp((syd - beta * sxd) / n / 1000000.0), 4) AS k
        |FROM f""".stripMargin.replace("\n", " "),
    "q448_huber" -> {
      // one IRLS round: residuals at 4dp vs (a<i>, b<i>), exact MAD,
      // Huber weights at 6dp, weighted normal equations
      def round(i: Int): String = {
        val (a, b) = (s"a$i", s"b$i")
        val j = i + 1
        s"""r$j AS (SELECT bb.key, bb.x, bb.y4, c$i.n,
           |  ${fp4(s"bb.y4::DOUBLE / 10000.0 - (c$i.$a + c$i.$b * bb.x)")}
           |   AS e4
           | FROM bb JOIN c$i USING (key)),
           |h$j AS (SELECT key, abs(e4) AS v, count(*)::BIGINT AS c
           | FROM r$j GROUP BY 1, 2),
           |m$j AS (SELECT key, min(v) AS mad4 FROM (SELECT key, v,
           |  sum(c) OVER (PARTITION BY key ORDER BY v ASC
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           |  sum(c) OVER (PARTITION BY key) AS tot FROM h$j)
           | WHERE 2*cum >= tot GROUP BY key),
           |w$j AS (SELECT r$j.key, r$j.x, r$j.y4, r$j.n,
           |  1.4826 * m$j.mad4::DOUBLE / 10000.0 AS sc,
           |  ${fp6s(s"CASE WHEN r$j.e4 = 0 THEN 1.0 " +
              s"ELSE least(1.0, 1.345 * (1.4826 * m$j.mad4::DOUBLE " +
              s"/ 10000.0) / (abs(r$j.e4)::DOUBLE / 10000.0)) END")} AS w6
           | FROM r$j JOIN m$j USING (key)),
           |s$j AS (SELECT key, max(n)::BIGINT AS n, max(sc) AS sc,
           |  sum(w6::HUGEINT) AS w0, sum(w6::HUGEINT * x::HUGEINT) AS wx,
           |  sum((w6::HUGEINT * x::HUGEINT) * x::HUGEINT) AS wxx,
           |  sum(w6::HUGEINT * y4::HUGEINT) AS wy,
           |  sum((w6::HUGEINT * x::HUGEINT) * y4::HUGEINT) AS wxy
           | FROM w$j GROUP BY key),
           |c$j AS (SELECT key, n, sc,
           |  (w0::DOUBLE * wxy::DOUBLE - wx::DOUBLE * wy::DOUBLE)
           |   /(w0::DOUBLE * wxx::DOUBLE - wx::DOUBLE * wx::DOUBLE)
           |   /10000.0 AS b$j,
           |  (wy::DOUBLE / 10000.0
           |    - (w0::DOUBLE * wxy::DOUBLE - wx::DOUBLE * wy::DOUBLE)
           |      /(w0::DOUBLE * wxx::DOUBLE - wx::DOUBLE * wx::DOUBLE)
           |      /10000.0 * wx::DOUBLE) / w0::DOUBLE AS a$j
           | FROM s$j)""".stripMargin.replace("\n", " ")
      }
      s"""WITH bb AS (SELECT event_type AS key,
         |  epoch_ns(ts) // 86400000000000 AS x, ${fp4("value")} AS y4
         | FROM events WHERE value IS NOT NULL),
         |g AS (SELECT key, count(*)::BIGINT AS n, sum(x)::HUGEINT AS sx,
         |  sum(x::HUGEINT * x::HUGEINT) AS sxx, sum(y4)::HUGEINT AS sy,
         |  sum(x::HUGEINT * y4::HUGEINT) AS sxy
         | FROM bb GROUP BY key HAVING count(*) >= 5),
         |c0 AS (SELECT key, n,
         |  (n::DOUBLE*sxy::DOUBLE - sx::DOUBLE*sy::DOUBLE)
         |   /(n::DOUBLE*sxx::DOUBLE - sx::DOUBLE*sx::DOUBLE)/10000.0
         |    AS b0,
         |  (sy::DOUBLE/10000.0
         |    - (n::DOUBLE*sxy::DOUBLE - sx::DOUBLE*sy::DOUBLE)
         |      /(n::DOUBLE*sxx::DOUBLE - sx::DOUBLE*sx::DOUBLE)/10000.0
         |      *sx::DOUBLE)/n::DOUBLE AS a0
         | FROM g),
         |${round(0)},
         |${round(1)}
         |SELECT key, n, round(b2, 4) + 0 AS slope,
         | round(a2, 4) + 0 AS icept, round(sc, 4) AS scale FROM c2"""
        .stripMargin.replace("\n", " ")
    },
    "q441_fertility" -> {
      s"""SELECT lang, count(*)::BIGINT AS n_docs,
         | sum(n_bpe)::BIGINT AS bpe_total,
         | sum(n_words)::BIGINT AS words_total,
         | round(sum(n_bpe)::DOUBLE / sum(n_words)::DOUBLE, 4) AS fertility
         |FROM (${TextQueries.bpeEncodeOracle}) enc
         |JOIN (SELECT doc_id, lang,
         |  len(regexp_extract_all(lower(text), '\\S+'))::BIGINT AS n_words
         | FROM documents) w USING (doc_id)
         |GROUP BY lang""".stripMargin.replace("\n", " ")
    },
    "q429_closeness" -> {
      val steps = (1 to 4).map { i =>
        s"""r$i AS (SELECT source, node, min(d) AS d FROM (
           |  SELECT source, node, d FROM r${i - 1}
           |  UNION ALL
           |  SELECT w.source, e.dst AS node, w.d + 1 AS d
           |  FROM r${i - 1} w JOIN edges e ON e.src = w.node)
           | GROUP BY 1, 2)""".stripMargin.replace("\n", " ")
      }.mkString(", ")
      s"""WITH ${MultiQueries.bipartiteSql},
         |nodes AS (SELECT src AS node FROM edges
         |  UNION SELECT dst FROM edges),
         |srcs AS (SELECT node AS source FROM nodes
         |  ORDER BY md5(node), node LIMIT 8),
         |r0 AS (SELECT source, source AS node, 0 AS d FROM srcs),
         |$steps
         |SELECT node, count(*)::BIGINT AS reached,
         | sum(d)::BIGINT AS sum_d,
         | round(count(*)::DOUBLE / sum(d)::DOUBLE, 4) AS closeness,
         | max(d)::BIGINT AS ecc
         |FROM r4 WHERE d > 0 GROUP BY 1""".stripMargin.replace("\n", " ")
    },
    "q430_katz" -> {
      val steps = (1 to 6).map { i =>
        s"""x$i AS (SELECT n.node,
           |  floor(coalesce(s.s, 0)::DOUBLE / 16.0)::BIGINT + 1000000 AS x
           | FROM nodes n LEFT JOIN (SELECT e.dst AS node,
           |   sum(x${i - 1}.x)::BIGINT AS s FROM x${i - 1}
           |  JOIN edges e ON e.src = x${i - 1}.node GROUP BY 1) s
           |  ON s.node = n.node)""".stripMargin.replace("\n", " ")
      }.mkString(", ")
      s"""WITH ${MultiQueries.bipartiteSql},
         |nodes AS (SELECT src AS node FROM edges
         |  UNION SELECT dst FROM edges),
         |x0 AS (SELECT node, 1000000::BIGINT AS x FROM nodes),
         |$steps
         |SELECT node, round(x::DOUBLE / 1000000.0, 4) AS katz FROM x6"""
        .stripMargin.replace("\n", " ")
    },
  )

  /** The two batch-executed streaming twins replay the exact batch
    * recursions, so they share the q405/q407 oracles verbatim. */
  val oracleSql: Map[String, String] = oracles0 +
    ("q431_croston_stream" -> oracles0("q407_croston")) +
    ("q432_theta_stream" -> oracles0("q405_theta"))
}
