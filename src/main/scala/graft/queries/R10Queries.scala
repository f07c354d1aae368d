package graft.queries

import graft.core._
import graft.model.{Behavior, Mixture}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 queries + DuckDB oracles. Wave 1: behavioral analytics
  * (ordered funnel, cohort retention), deterministic sampling and
  * sketching (Efraimidis–Spirakis weighted sample, count-min estimates),
  * corpus mixing (temperature-scaled allocation) and the unrolled-EM
  * 2-component Gaussian mixture.
  *
  * All fixtures are deterministic transforms of events/documents; every
  * float roll-up is fixed-point-quantized per term so both engines sum
  * order-free (the engine-wide q116 device). */
object R10Queries {

  private def ev(s: SparkSession, dir: String) = table(s, dir, "events")
  private def docs(s: SparkSession, dir: String) = table(s, dir, "documents")

  /** 4dp/6dp/8dp fixed-point long of a SQL expression. */
  private def fp(e: String, s: String): String =
    s"(CASE WHEN ($e) >= 0 THEN floor(($e)*$s+0.5) " +
      s"ELSE -floor(-($e)*$s+0.5) END)::BIGINT"
  private def h56(e: String) = s"('0x'||substr(md5($e),1,14))::BIGINT"

  private val toksSql = """regexp_extract_all(lower(text), '\S+')"""

  /** Embedding k=5 kNN CTE — mirrors Proximity.pairDistances + knn
    * (same device as MultiQueries' pairs CTE). */
  private val knnCte =
    """p AS (SELECT a.vec_id AS src, b.vec_id AS trg,
      |  list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS dist
      | FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id),
      |nn AS (SELECT src, trg, dist,
      |  row_number() OVER (PARTITION BY src ORDER BY dist ASC, trg) AS rank
      | FROM p QUALIFY rank <= 5)""".stripMargin.replace("\n", " ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ordered conversion funnel view -> click -> purchase on event time
    "q453_funnel" -> ((s, dir) =>
      canon(Behavior.funnel(ev(s, dir), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase")))),
    // cohort retention matrix on first-activity day, ages 0..14
    "q454_retention" -> ((s, dir) =>
      canon(Behavior.retention(
        ev(s, dir).withColumn("day", expr("ts div 86400000000000")),
        "user_id", "day", maxAge = 14))),
    // Efraimidis-Spirakis weighted sample: 20 per event_type, w=|value|+1
    "q455_weighted_sample" -> ((s, dir) =>
      canon(Behavior.weightedSample(
        ev(s, dir).withColumn("w", abs(col("value")) + 1.0),
        Seq("event_type"), "event_id", "w", k = 20))),
    // count-min (d=4, w=64) estimates vs exact for the top-10 users
    "q456_countmin" -> ((s, dir) =>
      canon(Behavior.countMinEstimate(ev(s, dir), "user_id",
        d = 4, w = 64, topK = 10))),
    // temperature-scaled language mix, alpha=0.5, budget=200 docs
    "q457_temperature_mix" -> ((s, dir) =>
      canon(Behavior.temperatureMix(docs(s, dir), "lang",
        alpha = 0.5, budget = 200L))),
    // 2-component GMM per event_type, 3 unrolled EM rounds
    "q458_gmm2" -> ((s, dir) =>
      canon(Mixture.gmm2(ev(s, dir), Seq("event_type"), "value",
        rounds = 3))),
    // embedding-space isotropy + rogue-dimension diagnostics
    "q460_isotropy" -> ((s, dir) =>
      canon(graft.sim.SimJoin.isotropy(table(s, dir, "embeddings"),
        "vec_id", "embedding"))),
    // pooled lexical diversity (TTR + hapax mass) per source
    "q461_ttr" -> ((s, dir) =>
      canon(graft.text.TextOps.lexicalDiversityByGroup(docs(s, dir),
        "source", "text"))),
    // char-class profile per source + JS divergence vs the corpus
    "q462_charclass_drift" -> ((s, dir) =>
      canon(graft.text.TextOps.charClassDrift(docs(s, dir),
        "source", "text"))),
    // char-8-gram novelty curve (first-occurrence mass per doc)
    "q463_ngram_novelty" -> ((s, dir) =>
      canon(graft.text.TextOps.ngramNovelty(docs(s, dir),
        "doc_id", "text", n = 8))),
    // context-window truncation loss per source at L=128 tokens
    "q464_trunc_loss" -> ((s, dir) =>
      canon(graft.text.TextOps.truncationLoss(docs(s, dir),
        "source", "text", maxTokens = 128))),
    // isotonic (PAV) calibration curve of a synthetic probability score
    // against lang='en', exact minimax over 2dp bins
    "q466_isotonic" -> ((s, dir) =>
      canon(graft.model.Eval2.isotonicCalibration(
        docs(s, dir)
          .withColumn("p", pmod(col("doc_id") * 37 + col("n_chars"),
            lit(1000)).cast("double") / 1000.0)
          .withColumn("y", col("lang") === "en"),
        "p", "y"))),
    // mean completion gap per funnel step (view -> click -> purchase)
    "q467_funnel_timing" -> ((s, dir) =>
      canon(Behavior.funnelTiming(ev(s, dir), "user_id", "event_type",
        "ts", Seq("view", "click", "purchase")))),
    // exact vocabulary-overlap matrix between sources
    "q468_vocab_overlap" -> ((s, dir) =>
      canon(graft.text.TextOps.vocabOverlap(docs(s, dir),
        "source", "text"))),
    // DAU/WAU stickiness per 7-day period
    "q469_stickiness" -> ((s, dir) =>
      canon(Behavior.stickiness(
        ev(s, dir).withColumn("day", expr("ts div 86400000000000")),
        "user_id", "day", periodDays = 7))),
    // Hill tail-index estimator over the top-50 values per event_type
    "q470_hill_tail" -> ((s, dir) =>
      canon(graft.multi.TailScores.hillTail(ev(s, dir),
        Seq("event_type"), "event_id", "value", k = 50))),
    // Neyman optimal stratum allocation of a 500-row sample budget
    "q471_neyman" -> ((s, dir) =>
      canon(graft.model.Sampling.neymanAllocation(ev(s, dir),
        "event_type", "value", nTotal = 500L))),
    // exact-proportion stratified 80/10/10 split by language
    "q472_stratified_split" -> ((s, dir) =>
      canon(graft.model.Sampling.stratifiedSplit(docs(s, dir),
        "doc_id", "lang", fTrain = 0.8, fVal = 0.1))),
    // Poisson-bootstrap SE of the mean per event_type, B=32 replicates
    "q473_poisson_bootstrap" -> ((s, dir) =>
      canon(graft.model.Sampling.poissonBootstrap(ev(s, dir),
        Seq("event_type"), "event_id", "value", b = 32))),
    // int8 scalar-quantization error audit per embedding dimension
    "q474_int8_quant" -> ((s, dir) =>
      canon(graft.sim.SimJoin.int8QuantError(table(s, dir, "embeddings"),
        "vec_id", "embedding"))),
    // corpus token budget before/after exact dedup, per source
    "q475_dedup_budget" -> ((s, dir) => {
      val d = docs(s, dir)
      val kept = graft.text.TextOps.exactDedup(d, "doc_id", "text")
        .select(col("doc_id"), col("keep"))
      val toks = d.select(col("doc_id"), col("source"),
        size(graft.text.TextOps.tokens(col("text"))).cast("long").as("_n"))
      canon(toks.join(kept, "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("docs_kept"),
          sum(col("_n")).as("tokens"),
          sum(when(col("keep"), col("_n")).otherwise(0L)).as("tokens_kept"))
        .withColumn("token_keep_frac",
          col("tokens_kept").cast("double") / col("tokens").cast("double")))
    }),
    // propensity-score matching ATT on a confounded per-user fixture
    // (treatment probability depends on x; true effect = +2)
    "q481_psm_att" -> ((s, dir) =>
      canon(graft.model.Causal.psmAtt(psmUnits(s, dir), "uid", "t", "y",
        Seq("f0", "f1"), iters = 5, lr = 0.5))),
    // IPW ATE on the same confounded fixture (Hajek-stabilized)
    "q513_ipw_ate" -> ((s, dir) =>
      canon(graft.model.Causal.ipwAte(psmUnits(s, dir), "uid", "t", "y",
        Seq("f0", "f1"), iters = 60, lr = 0.5))),
    // two-model uplift scores on a randomized fixture with
    // heterogeneous effect (+0.30 response only above x = 49)
    "q482_uplift" -> ((s, dir) =>
      canon(graft.model.Causal.upliftTwoModel(upliftUnits(s, dir),
        "uid", "t", "r", Seq("f0", "f1"), iters = 5, lr = 0.5))),
    // split-conformal prediction interval + empirical coverage audit
    "q484_conformal_interval" -> ((s, dir) =>
      canon(graft.post.PostOps.conformalInterval(ev(s, dir),
        Seq("event_type"), "event_id", "value", alpha = 0.1))),
    // Qini / uplift-decile table of the q482 scores
    "q483_qini" -> ((s, dir) => {
      val u = upliftUnits(s, dir)
      val scored = graft.model.Causal.upliftTwoModel(u, "uid", "t", "r",
        Seq("f0", "f1"), iters = 5, lr = 0.5)
        .join(u.select(col("uid"), col("t"), col("r")), "uid")
      canon(graft.model.Causal.qiniTable(scored, "t", "r", "uplift",
        nBins = 10))
    }),
    // RFM segmentation over purchase events (quintiles via histograms)
    "q478_rfm" -> ((s, dir) =>
      canon(Behavior.rfm(
        ev(s, dir).withColumn("day", expr("ts div 86400000000000")),
        "user_id", "day", "event_type", "value", convType = "purchase"))),
    // linear multi-touch attribution of purchases across channels
    "q479_attribution" -> ((s, dir) =>
      canon(Behavior.linearAttribution(ev(s, dir), "user_id", "ts",
        "event_type", convType = "purchase"))),
    // STREAMING funnel progression batch-executed (flatMapGroupsWithState
    // forward scan) and aggregated — gated by q453's oracle
    "q476_funnel_stream" -> ((s, dir) => {
      import s.implicits._
      val ev0 = ev(s, dir)
        .select(col("user_id").cast("string").as("entity"),
          col("ts").cast("long").as("seq"), col("event_type").as("typ"))
        .as[graft.streaming.StreamScorers.TypedEvent]
      val prog = graft.streaming.StreamScorers
        .funnelStream(ev0, Seq("view", "click", "purchase")).toDF()
      val counts = prog.groupBy(col("step_idx"), col("step"))
        .agg(count(lit(1)).as("users"))
      val first = counts.where(col("step_idx") === 1L)
        .select(col("users").as("_u0"))
      canon(counts.crossJoin(broadcast(first))
        .select(col("step_idx"), col("step"), col("users"),
          when(col("_u0") > 0, col("users").cast("double") /
            col("_u0").cast("double")).otherwise(lit(0.0)).as("conv")))
    }),
    // sampled Brandes betweenness on the consecutive-user graph
    "q465_betweenness" -> ((s, dir) => {
      val und = MultiQueries.chainPairs(s, dir, 3)
      val both = und.select(col("a").as("src"), col("b").as("dst"))
        .union(und.select(col("b").as("src"), col("a").as("dst")))
      canon(graft.graph.Graph.betweennessSampled(both, "src", "dst",
        sources = 8, maxDepth = 4))
    }),
    // LoOP local outlier probability over the k=5 embedding kNN
    "q485_loop" -> ((s, dir) => {
      val v = table(s, dir, "embeddings")
      val nn = graft.multi.Proximity.knn(
        graft.multi.Proximity.pairDistances(v, "vec_id", "embedding"), 5)
      canon(graft.multi.Proximity.loopFromKnn(nn, 5))
    }),
    // FastABOD angle-variance outlier factor over the same kNN
    "q486_fastabod" -> ((s, dir) => {
      val v = table(s, dir, "embeddings")
      val nn = graft.multi.Proximity.knn(
        graft.multi.Proximity.pairDistances(v, "vec_id", "embedding"), 5)
      canon(graft.multi.Proximity.fastAbodFromKnn(nn, v,
        "vec_id", "embedding"))
    }),
    // Moore-Lewis cross-entropy-difference selection: in-domain = en
    "q487_moore_lewis" -> ((s, dir) => {
      val d = docs(s, dir)
      canon(graft.text.TextOps.mooreLewisScore(d, "doc_id", "text",
        d.where(col("lang") === "en"), d))
    }),
    // interpolated Kneser-Ney bigram perplexity, D = 0.75
    "q488_kn_lm" -> ((s, dir) =>
      canon(graft.text.TextOps.knLmScore(docs(s, dir), "doc_id", "text"))),
    // k-center greedy (Gonzalez) coreset selection, k = 6
    "q489_kcenter" -> ((s, dir) =>
      canon(graft.sim.Similarity.kCenterGreedy(table(s, dir, "embeddings"),
        "vec_id", "embedding", k = 6))),
    // MAE/RMSE/sMAPE/MASE of an MA(3) forecast per event_type
    "q490_forecast_accuracy" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("event_id")
      val y = col("value").cast("double")
      val e = ev(s, dir).where(col("value").isNotNull)
        .withColumn("f", (lag(y, 1).over(w) + lag(y, 2).over(w) +
          lag(y, 3).over(w)) / lit(3.0))
      canon(graft.model.Eval2.forecastAccuracy(e, Seq("event_type"),
        "event_id", "value", "f"))
    }),
    // pinball loss + coverage of split-fit quantiles at tau 0.1/0.5/0.9
    "q491_pinball" -> ((s, dir) =>
      canon(graft.model.Eval2.quantilePinball(
        ev(s, dir), Seq("event_type"), "value",
        col("event_id") % 2 === 0, Seq(0.1, 0.5, 0.9)))),
    // depth-2 binary-segmentation mean-shift splits per event_type
    "q492_binseg" -> ((s, dir) =>
      canon(graft.seq.SeriesKernels.binSegL2(ev(s, dir),
        Seq("event_type"), "event_id", "value", minSeg = 5))),
    // ADWIN adaptive-window drift over a thinned series with +40
    // block shifts every 25 points
    "q493_adwin" -> ((s, dir) => {
      val e = ev(s, dir)
        .where(col("value").isNotNull && col("event_id") % 20 === 0)
        .withColumn("y", col("value") +
          when(pmod(expr("event_id div 20"), lit(50L)) >= 25, lit(40.0))
            .otherwise(lit(0.0)))
      canon(graft.drift.Drift.adwin(e, Seq("event_type"), "event_id",
        "y", delta = 0.002, r = 50.0).toDF())
    }),
    // Lorenz/Gini concentration of user value-mass per event_type
    "q494_concentration" -> ((s, dir) =>
      canon(graft.multi.TailScores.concentration(ev(s, dir),
        Seq("event_type"), "user_id", "value"))),
    // Fellegi-Sunter record linkage over (lang, size-bucket)-blocked
    // document pairs, 3 EM rounds on the agreement-pattern histogram
    "q496_record_linkage" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("lang"),
        col("source"), col("n_chars"),
        expr("n_chars div 100").as("_blk"),
        substring(lower(col("text")), 1, 16).as("_pre"))
      val a = d.select(col("doc_id").as("a"), col("lang"), col("_blk"),
        col("source").as("_sa"), col("n_chars").as("_na"),
        col("_pre").as("_pa"))
      val b = d.select(col("doc_id").as("b"), col("lang"), col("_blk"),
        col("source").as("_sb"), col("n_chars").as("_nb"),
        col("_pre").as("_pb"))
      val pairs = a.join(b, Seq("lang", "_blk"))
        .where(col("a") < col("b"))
        .select(col("a"), col("b"),
          (col("_sa") === col("_sb")).as("agr_src"),
          (col("_pa") === col("_pb")).as("agr_pre"),
          (abs(col("_na") - col("_nb")) * 20 <=
            greatest(col("_na"), col("_nb"))).as("agr_len"))
      canon(graft.model.Linkage.fellegiSunterEm(pairs,
        Seq("agr_src", "agr_pre", "agr_len")))
    }),
    // exact Shapley-value conversion attribution over the 4 channels
    "q499_shapley_attribution" -> ((s, dir) =>
      canon(graft.model.Behavior.shapleyAttribution(ev(s, dir),
        "user_id", "ts", "event_type",
        Seq("click", "error", "signup", "view"), "purchase"))),
    // Cohen's d / Hedges' g of value between user-parity groups
    "q510_cohens_d" -> ((s, dir) =>
      canon(graft.model.GroupTests.cohensD(
        ev(s, dir).withColumn("grp",
          when(col("user_id") % 2 === 0, "even").otherwise("odd")),
        Seq("event_type"), "grp", "value"))),
    // Engle-Granger cointegration: y = 0.8x + bounded cycle
    "q511_engle_granger" -> ((s, dir) =>
      canon(graft.seq.Forecast2.engleGranger(
        ev(s, dir).withColumn("y", lit(0.8) * col("value") +
          pmod(col("event_id"), lit(11)).cast("double")),
        Seq("event_type"), "event_id", "y", "value"))),
    // JL sign-projection 64->16 distance-distortion audit
    "q512_jl_distortion" -> ((s, dir) =>
      canon(graft.sim.SimJoin.jlDistortion(table(s, dir, "embeddings"),
        "vec_id", "embedding", dim = 64, k = 16, sampleMod = 10))),
    // ECE/MCE + log-loss of the synthetic probability vs lang='en'
    "q507_calibration_error" -> ((s, dir) =>
      canon(graft.model.Eval2.calibrationError(probFixture(s, dir),
        "score", "y"))),
    // Platt scaling of the same score (gd2 logistic trainer)
    "q508_platt" -> ((s, dir) =>
      canon(graft.model.Eval2.plattScale(probFixture(s, dir),
        "doc_id", "score", "y"))),
    // Hosmer-Lemeshow equal-width-bin goodness of fit
    "q509_hosmer_lemeshow" -> ((s, dir) =>
      canon(graft.model.Eval2.hosmerLemeshow(probFixture(s, dir),
        "score", "y"))),
    // autoencoder reconstruction-error outliers (the last §2.9 row):
    // tied-weight 3-2-3 AE, 8 GD rounds, z-scaled event features
    "q505_autoencoder" -> ((s, dir) => {
      val e = ev(s, dir).where(col("value").isNotNull)
        .select(col("event_id"), col("value").cast("double").as("f0"),
          sqrt(col("value")).as("f1"),
          pmod(col("user_id"), lit(97L)).cast("double").as("f2"))
      canon(graft.multi.AutoEncoder.aeScore(e, Seq("event_id"),
        Seq("f0", "f1", "f2"), hidden = 2, rounds = 8, lr = 0.1,
        threshold = 2.0))
    }),
    // Elo rating trajectory over thinned per-user type duels
    "q503_elo" -> ((s, dir) =>
      canon(graft.model.Preference.eloTrajectory(eloMatches(s, dir))
        .toDF())),
    // streaming Elo twin (GroupState rating map), same oracle as q503
    "q504_elo_stream" -> ((s, dir) =>
      canon(graft.streaming.StreamScorers.eloStream(eloMatches(s, dir))
        .toDF())),
    // Markov removal-effect attribution: journeys by event_id order
    "q502_markov_attribution" -> ((s, dir) =>
      canon(graft.model.Behavior.markovAttribution(ev(s, dir),
        "user_id", "event_id", "event_type",
        Seq("click", "error", "signup", "view"), "purchase"))),
    // Cox proportional hazards on the q341 survival fixture:
    // x1 = standardized user mean value, x2 = even-user indicator
    "q501_cox_ph" -> ((s, dir) => {
      val dd = ev(s, dir).select(col("user_id"),
        expr("ts div 86400000000000").as("day"), col("value"))
      val per = dd.groupBy("user_id").agg(
        min("day").as("fd"), max("day").as("ld"),
        min(when(col("value") > 250.0, col("day"))).as("hd"),
        count(col("value")).as("nv"),
        sum(fixedPointLong(col("value").cast("double"), 4)
          .cast("decimal(38,0)")).as("s4"))
      val subj = per.select(
        when(col("hd").isNotNull, col("hd") - col("fd"))
          .otherwise(col("ld") - col("fd")).cast("double").as("dur"),
        col("hd").isNotNull.as("event"),
        ((col("s4").cast("double") / 1e4 / col("nv").cast("double") -
          lit(50.0)) / lit(10.0)).as("x1"),
        when(col("user_id") % 2 === 0, lit(1.0)).otherwise(lit(0.0))
          .as("x2"))
      canon(graft.model.Survival.coxPh(subj, "dur", "event",
        Seq("x1", "x2")))
    }),
    // Harrell's C-index of x1 as a risk score on the same fixture
    "q506_c_index" -> ((s, dir) => {
      val dd = ev(s, dir).select(col("user_id"),
        expr("ts div 86400000000000").as("day"), col("value"))
      val per = dd.groupBy("user_id").agg(
        min("day").as("fd"), max("day").as("ld"),
        min(when(col("value") > 250.0, col("day"))).as("hd"),
        count(col("value")).as("nv"),
        sum(fixedPointLong(col("value").cast("double"), 4)
          .cast("decimal(38,0)")).as("s4"))
      val subj = per.select(
        when(col("hd").isNotNull, col("hd") - col("fd"))
          .otherwise(col("ld") - col("fd")).cast("double").as("dur"),
        col("hd").isNotNull.as("event"),
        ((col("s4").cast("double") / 1e4 / col("nv").cast("double") -
          lit(50.0)) / lit(10.0)).as("x1"))
      canon(graft.model.Survival.concordanceIndex(subj, "dur", "event",
        "x1"))
    }),
    // Bradley-Terry strengths from per-user event-type value duels
    "q500_bradley_terry" -> ((s, dir) => {
      val ut = ev(s, dir).where(col("value").isNotNull)
        .groupBy(col("user_id").as("_u"), col("event_type").as("_t"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("_n"),
          sum(fixedPointLong(col("value").cast("double"), 4)
            .cast("decimal(38,0)")).as("_s4"))
      val a = ut.select(col("_u"), col("_t").as("_ta"),
        col("_n").as("_na"), col("_s4").as("_sa"))
      val b = ut.select(col("_u"), col("_t").as("_tb"),
        col("_n").as("_nb"), col("_s4").as("_sb"))
      val xa = col("_sa") * col("_nb")
      val xb = col("_sb") * col("_na")
      val cmp = a.join(b, "_u").where(col("_ta") < col("_tb"))
        .where(xa =!= xb)
        .select(when(xa > xb, col("_ta")).otherwise(col("_tb")).as("w"),
          when(xa > xb, col("_tb")).otherwise(col("_ta")).as("l"))
      canon(graft.model.Preference.bradleyTerry(cmp, "w", "l"))
    }),
    // k-anonymity / l-diversity audit: quasi = (event_type, value
    // half-centile), sensitive = user_id, target k = 10
    "q497_k_anonymity" -> ((s, dir) =>
      canon(graft.model.Privacy.kAnonymityAudit(
        ev(s, dir).where(col("value").isNotNull)
          .withColumn("vbin", expr("CAST(floor(value / 50.0) AS BIGINT)")),
        Seq("event_type", "vbin"), "user_id", k = 10L))),
    // frequent ordered event sequences (len 2-3), support >= 20 users
    "q498_freq_sequences" -> ((s, dir) =>
      canon(graft.model.Behavior.frequentSequences(ev(s, dir),
        "user_id", "event_type", "ts", minSupport = 20L))),
    // streaming ADWIN twin, batch-executed: same fixture and oracle
    // as q493 (row-for-row parity pinned in Wave10bSpec)
    "q495_adwin_stream" -> ((s, dir) => {
      import s.implicits._
      val e = ev(s, dir)
        .where(col("value").isNotNull && col("event_id") % 20 === 0)
        .withColumn("y", col("value") +
          when(pmod(expr("event_id div 20"), lit(50L)) >= 25, lit(40.0))
            .otherwise(lit(0.0)))
        .select(col("event_type").as("entity"), col("event_id").as("seq"),
          col("y").as("value"))
        .as[graft.streaming.StreamScorers.ValueEvent]
      canon(graft.streaming.StreamScorers
        .adwinStream(e, delta = 0.002, r = 50.0).toDF())
    }),
  )

  /** Confounded PSM fixture: per-user mean value x, treatment odds
    * jump from 20% to 60% above x = 49 (so naive diff-in-means is
    * biased), outcome y = x + 2·t + hash noise — true ATT = +2. */
  private def psmUnits(s: SparkSession, dir: String): DataFrame = {
    val perUser = ev(s, dir).where(col("value").isNotNull)
      .groupBy(col("user_id").as("uid"))
      .agg(count(lit(1)).as("_n"),
        sum(fixedPointLong(col("value").cast("double"), 4)
          .cast("decimal(38,0)")).as("_s4"))
      .withColumn("x",
        col("_s4").cast("double") / 1e4 / col("_n").cast("double"))
    val h = graft.text.TextOps.hash56(col("uid").cast("string"))
    val hy = graft.text.TextOps.hash56(
      concat(lit("y:"), col("uid").cast("string")))
    perUser
      .withColumn("t", pmod(h, lit(100L)) <
        (lit(20) + when(col("x") > 49.0, 40).otherwise(0)))
      .withColumn("y", col("x") + when(col("t"), 2.0).otherwise(0.0) +
        (pmod(hy, lit(1000L)).cast("double") / 1000.0 - 0.5) * 4.0)
      .withColumn("f0", lit(1.0))
      .withColumn("f1", (col("x") - 49.0) / 10.0)
      .select("uid", "x", "t", "y", "f0", "f1")
  }

  /** Randomized-treatment uplift fixture: t is a fair hash coin,
    * response odds 30% base + 20% for high-x + 30% MORE only when
    * treated AND high-x — true uplift 0.3 above x = 49, 0 below. */
  private def upliftUnits(s: SparkSession, dir: String): DataFrame = {
    val perUser = ev(s, dir).where(col("value").isNotNull)
      .groupBy(col("user_id").as("uid"))
      .agg(count(lit(1)).as("_n"),
        sum(fixedPointLong(col("value").cast("double"), 4)
          .cast("decimal(38,0)")).as("_s4"))
      .withColumn("x",
        col("_s4").cast("double") / 1e4 / col("_n").cast("double"))
    val h = graft.text.TextOps.hash56(col("uid").cast("string"))
    val hr = graft.text.TextOps.hash56(
      concat(lit("r:"), col("uid").cast("string")))
    perUser
      .withColumn("t", pmod(h, lit(2L)) === 0L)
      .withColumn("r", pmod(hr, lit(1000L)) <
        (lit(300) + when(col("x") > 49.0, 200).otherwise(0) +
          when(col("t") && col("x") > 49.0, 300).otherwise(0)))
      .withColumn("f0", lit(1.0))
      .withColumn("f1", (col("x") - 49.0) / 10.0)
      .select("uid", "x", "t", "r", "f0", "f1")
  }

  /** The unrolled-EM oracle: init CTE + `rounds` mechanical round blocks
    * replaying the exact float-op order of [[Mixture.gmm2]]. */
  private def gmm2Sql(rounds: Int): String = {
    val init =
      s"""b AS (SELECT event_type AS k, value AS x FROM events
         | WHERE value IS NOT NULL),
         |i0 AS (SELECT k, count(*)::BIGINT AS n, min(x) AS mn, max(x) AS mx,
         |  sum(${fp("x", "10000.0")}::HUGEINT) AS sx4,
         |  sum(${fp("x*x", "10000.0")}::HUGEINT) AS sxx4 FROM b GROUP BY 1),
         |p0 AS (SELECT k, n, 0.5 AS pi,
         |  mn + (mx - mn) * 0.25 AS mu1, mn + (mx - mn) * 0.75 AS mu2,
         |  greatest(sxx4::DOUBLE/10000.0/n::DOUBLE
         |    - (sx4::DOUBLE/10000.0/n::DOUBLE)*(sx4::DOUBLE/10000.0/n::DOUBLE),
         |    1e-8) AS v1,
         |  greatest(sxx4::DOUBLE/10000.0/n::DOUBLE
         |    - (sx4::DOUBLE/10000.0/n::DOUBLE)*(sx4::DOUBLE/10000.0/n::DOUBLE),
         |    1e-8) AS v2 FROM i0)""".stripMargin
    val rnds = (1 to rounds).map { r =>
      val d1 = "(exp(-(x-mu1)*(x-mu1)/(2.0*v1))/sqrt(v1))"
      val d2 = "(exp(-(x-mu2)*(x-mu2)/(2.0*v2))/sqrt(v2))"
      val den = s"(pi*$d1 + (1.0-pi)*$d2)"
      s"""j$r AS (SELECT b.k, b.x, p.pi, p.mu1, p.mu2, p.v1, p.v2
         | FROM b JOIN p${r - 1} p USING (k)),
         |r$r AS (SELECT k, x,
         |  CASE WHEN $den > 0 THEN pi*$d1/$den ELSE 0.5 END AS rr FROM j$r),
         |s$r AS (SELECT k, count(*)::BIGINT AS n,
         |  sum(${fp("rr", "100000000.0")}::HUGEINT) AS sr8,
         |  sum(${fp("rr*x", "1000000.0")}::HUGEINT) AS srx6,
         |  sum(${fp("rr*x*x", "1000000.0")}::HUGEINT) AS srxx6,
         |  sum(${fp("(1.0-rr)*x", "1000000.0")}::HUGEINT) AS sqx6,
         |  sum(${fp("(1.0-rr)*x*x", "1000000.0")}::HUGEINT) AS sqxx6
         | FROM r$r GROUP BY 1),
         |w$r AS (SELECT k, n, sr8::DOUBLE/100000000.0 AS w1,
         |  n::DOUBLE - sr8::DOUBLE/100000000.0 AS w2,
         |  srx6, srxx6, sqx6, sqxx6 FROM s$r),
         |m$r AS (SELECT k, n, w1, w2, w1/n::DOUBLE AS pi,
         |  CASE WHEN w1 > 0 THEN srx6::DOUBLE/1000000.0/w1
         |   ELSE 0.0 END AS mu1,
         |  CASE WHEN w2 > 0 THEN sqx6::DOUBLE/1000000.0/w2
         |   ELSE 0.0 END AS mu2,
         |  srxx6, sqxx6 FROM w$r),
         |p$r AS (SELECT k, n, pi, mu1, mu2,
         |  greatest(CASE WHEN w1 > 0
         |    THEN srxx6::DOUBLE/1000000.0/w1 - mu1*mu1 ELSE 1e-8 END,
         |   1e-8) AS v1,
         |  greatest(CASE WHEN w2 > 0
         |    THEN sqxx6::DOUBLE/1000000.0/w2 - mu2*mu2 ELSE 1e-8 END,
         |   1e-8) AS v2 FROM m$r)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""WITH $init$rnds
       |SELECT k AS event_type, n, round(pi, 4) + 0 AS pi,
       | round(mu1, 4) + 0 AS mu1, round(mu2, 4) + 0 AS mu2,
       | round(v1, 4) + 0 AS v1, round(v2, 4) + 0 AS v2
       |FROM p$rounds""".stripMargin.replace("\n", " ")
  }

  /** Shared by q453 (declarative funnel) and q476 (the batch-executed
    * streaming progression scan — same semantics, same counts). */
  private val funnelOracle: String =
      """WITH s1 AS (SELECT user_id AS u, min(epoch_ns(ts)) AS t
        | FROM events WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id AS u, min(epoch_ns(e.ts)) AS t
        | FROM events e JOIN s1 ON e.user_id = s1.u
        |  AND epoch_ns(e.ts) > s1.t
        | WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id AS u, min(epoch_ns(e.ts)) AS t
        | FROM events e JOIN s2 ON e.user_id = s2.u
        |  AND epoch_ns(e.ts) > s2.t
        | WHERE e.event_type = 'purchase' GROUP BY 1),
        |c AS (SELECT 1::BIGINT AS step_idx, 'view' AS step,
        |   count(*)::BIGINT AS users FROM s1
        | UNION ALL SELECT 2::BIGINT, 'click', count(*)::BIGINT FROM s2
        | UNION ALL SELECT 3::BIGINT, 'purchase', count(*)::BIGINT FROM s3)
        |SELECT step_idx, step, users,
        | round(CASE WHEN (SELECT users FROM c WHERE step_idx = 1) > 0
        |  THEN users::DOUBLE
        |   / (SELECT users FROM c WHERE step_idx = 1)::DOUBLE
        |  ELSE 0.0 END, 4) AS conv
        |FROM c""".stripMargin.replace("\n", " ")

  /** The quintile-band CTE pair for one RFM metric (the decileLift
    * histogram device at 5 bins). */
  private def quintileSql(src: String, metric: String, h: String,
      b: String, out: String): String =
    s"""$h AS (SELECT $metric AS mv, count(*)::BIGINT AS ct
       | FROM $src GROUP BY 1),
       |$b AS (SELECT mv, least(4, floor((sum(ct) OVER (ORDER BY mv ASC
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ct) * 5
       |  / (SELECT sum(ct) FROM $h))::BIGINT) AS $out FROM $h)"""
      .stripMargin.replace("\n", " ")

  /** q481 oracle: fixture CTEs + 5-round 2-weight logreg replay (the
    * q183 device) + the 4dp-histogram nearest-control scan. */

  /** Generated IPW-ATE oracle — same confounded-units + gd2 propensity
    * replay as psmOracle, then the four 8dp-exact weighted sums. */
  private lazy val ipwOracle: String = {
    val fp9 = (e: String) =>
      s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e9+0.5) " +
        s"ELSE -floor(-($e)*1e9+0.5) END)::BIGINT"
    val regrain = (e: String) =>
      s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e6+0.5) " +
        s"ELSE -floor(-($e)*1e6+0.5) END) / 1000000.0"
    val iters = (1 to 60).map { t =>
      val p = s"ww${t - 1}"
      s"""g$t AS (SELECT sum(${fp9("e * f0")}) AS s0,
         |  sum(${fp9("e * f1")}) AS s1, count(*) AS n
         | FROM (SELECT f0, f1, ty - (0.5 + z/(2.0*(1.0+abs(z)))) AS e
         |   FROM (SELECT un.f0, un.f1, un.ty,
         |     w.wa*un.f0 + w.wb*un.f1 AS z FROM un, $p w))),
         |ww$t AS MATERIALIZED (SELECT
         |  ${regrain(s"w.wa + 0.5 * (g.s0::DOUBLE / g.n / 1e9)")} AS wa,
         |  ${regrain(s"w.wb + 0.5 * (g.s1::DOUBLE / g.n / 1e9)")} AS wb
         | FROM $p w, g$t g)""".stripMargin
    }.mkString(", ")
    val f8 = (e: String) => s"${fp(e, "100000000.0")}::HUGEINT"
    s"""WITH u0 AS (SELECT user_id AS uid, count(*)::BIGINT AS n,
       |  sum(${fp("value", "10000.0")}::HUGEINT) AS s4
       | FROM events WHERE value IS NOT NULL GROUP BY 1),
       |u1 AS (SELECT uid, s4::DOUBLE/10000.0/n::DOUBLE AS x FROM u0),
       |u2 AS (SELECT uid, x,
       |  (${h56("uid::VARCHAR")} % 100) <
       |   (20 + CASE WHEN x > 49.0 THEN 40 ELSE 0 END) AS t FROM u1),
       |un AS MATERIALIZED (SELECT uid, x, t,
       |  x + (CASE WHEN t THEN 2.0 ELSE 0.0 END)
       |   + ((${h56("'y:' || uid::VARCHAR")} % 1000)::DOUBLE/1000.0 - 0.5)
       |     * 4.0 AS y,
       |  1.0::DOUBLE AS f0, (x - 49.0)/10.0 AS f1,
       |  CASE WHEN t THEN 1.0 ELSE 0.0 END AS ty FROM u2),
       |ww0 AS (SELECT 0.0::DOUBLE AS wa, 0.0::DOUBLE AS wb),
       |$iters,
       |pc AS (SELECT un.t, un.y,
       |  least(greatest(0.5 + z/(2.0*(1.0+abs(z))), 0.01),
       |   1.0 - 0.01) AS p
       | FROM (SELECT un.*, w.wa*un.f0 + w.wb*un.f1 AS z
       |   FROM un, ww60 w) un),
       |ag AS (SELECT count(*)::BIGINT AS n,
       |  sum(CASE WHEN t THEN 1 ELSE 0 END)::BIGINT AS n_treated,
       |  sum(CASE WHEN t THEN ${f8("1.0/p")} ELSE 0 END) AS w1,
       |  sum(CASE WHEN t THEN ${f8("y/p")} ELSE 0 END) AS wy1,
       |  sum(CASE WHEN NOT t THEN ${f8("1.0/(1.0 - p)")} ELSE 0 END)
       |   AS w0,
       |  sum(CASE WHEN NOT t THEN ${f8("y/(1.0 - p)")} ELSE 0 END)
       |   AS wy0,
       |  sum(CASE WHEN t THEN ${fp("y", "10000.0")}::HUGEINT ELSE 0 END)
       |   AS sy1,
       |  sum(CASE WHEN NOT t THEN ${fp("y",
        "10000.0")}::HUGEINT ELSE 0 END) AS sy0
       | FROM pc)
       |SELECT n, n_treated,
       | round(sy1::DOUBLE/10000.0/n_treated::DOUBLE
       |  - sy0::DOUBLE/10000.0/(n - n_treated)::DOUBLE, 4) + 0
       |  AS ate_naive,
       | round(wy1::DOUBLE/w1::DOUBLE - wy0::DOUBLE/w0::DOUBLE, 4) + 0
       |  AS ate_ipw
       |FROM ag""".stripMargin.replace("\n", " ")
  }

  private lazy val psmOracle: String = {
    val fp9 = (e: String) =>
      s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e9+0.5) " +
        s"ELSE -floor(-($e)*1e9+0.5) END)::BIGINT"
    val regrain = (e: String) =>
      s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e6+0.5) " +
        s"ELSE -floor(-($e)*1e6+0.5) END) / 1000000.0"
    val iters = (1 to 5).map { t =>
      val p = s"ww${t - 1}"
      s"""g$t AS (SELECT sum(${fp9("e * f0")}) AS s0,
         |  sum(${fp9("e * f1")}) AS s1, count(*) AS n
         | FROM (SELECT f0, f1, ty - (0.5 + z/(2.0*(1.0+abs(z)))) AS e
         |   FROM (SELECT un.f0, un.f1, un.ty,
         |     w.wa*un.f0 + w.wb*un.f1 AS z FROM un, $p w))),
         |ww$t AS (SELECT
         |  ${regrain(s"w.wa + 0.5 * (g.s0::DOUBLE / g.n / 1e9)")} AS wa,
         |  ${regrain(s"w.wb + 0.5 * (g.s1::DOUBLE / g.n / 1e9)")} AS wb
         | FROM $p w, g$t g)""".stripMargin
    }.mkString(", ")
    val lv = (e: String, ord: String) =>
      s"last_value($e IGNORE NULLS) OVER (ORDER BY $ord, side ASC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    s"""WITH u0 AS (SELECT user_id AS uid, count(*)::BIGINT AS n,
       |  sum(${fp("value", "10000.0")}::HUGEINT) AS s4
       | FROM events WHERE value IS NOT NULL GROUP BY 1),
       |u1 AS (SELECT uid, s4::DOUBLE/10000.0/n::DOUBLE AS x FROM u0),
       |u2 AS (SELECT uid, x,
       |  (${h56("uid::VARCHAR")} % 100) <
       |   (20 + CASE WHEN x > 49.0 THEN 40 ELSE 0 END) AS t FROM u1),
       |un AS (SELECT uid, x, t,
       |  x + (CASE WHEN t THEN 2.0 ELSE 0.0 END)
       |   + ((${h56("'y:' || uid::VARCHAR")} % 1000)::DOUBLE/1000.0 - 0.5)
       |     * 4.0 AS y,
       |  1.0::DOUBLE AS f0, (x - 49.0)/10.0 AS f1,
       |  CASE WHEN t THEN 1.0 ELSE 0.0 END AS ty FROM u2),
       |ww0 AS (SELECT 0.0::DOUBLE AS wa, 0.0::DOUBLE AS wb),
       |$iters,
       |pw AS (SELECT uid, t,
       |  ${fp("0.5 + z/(2.0*(1.0+abs(z)))", "10000.0")} AS p4,
       |  ${fp("y", "10000.0")} AS y4
       | FROM (SELECT un.*, w.wa*un.f0 + w.wb*un.f1 AS z
       |   FROM un, ww5 w)),
       |cm AS (SELECT p4, count(*)::BIGINT AS nc,
       |  sum(y4::HUGEINT)::DOUBLE/10000.0/count(*)::DOUBLE AS myc
       | FROM pw WHERE NOT t GROUP BY 1),
       |thh AS (SELECT p4 FROM pw WHERE t GROUP BY 1),
       |mg AS (SELECT p4, 0 AS side, myc FROM cm
       | UNION ALL SELECT p4, 1, NULL FROM thh),
       |sc AS (SELECT p4, side,
       |  ${lv("CASE WHEN side = 0 THEN p4 END", "p4 ASC")} AS pp,
       |  ${lv("CASE WHEN side = 0 THEN myc END", "p4 ASC")} AS py,
       |  ${lv("CASE WHEN side = 0 THEN p4 END", "p4 DESC")} AS np,
       |  ${lv("CASE WHEN side = 0 THEN myc END", "p4 DESC")} AS ny
       | FROM mg),
       |mt AS (SELECT p4,
       |  CASE WHEN pp IS NOT NULL AND (np IS NULL OR p4 - pp <= np - p4)
       |   THEN pp ELSE np END AS mp,
       |  CASE WHEN pp IS NOT NULL AND (np IS NULL OR p4 - pp <= np - p4)
       |   THEN py ELSE ny END AS my
       | FROM sc WHERE side = 1),
       |tt AS (SELECT count(*)::BIGINT AS n_treated,
       |  sum(${fp("pw.y4::DOUBLE/10000.0 - mt.my", "1000000.0")})::BIGINT
       |   AS d6,
       |  sum(pw.p4)::BIGINT AS sp,
       |  sum(abs(pw.p4 - mt.mp))::BIGINT AS sd
       | FROM pw JOIN mt USING (p4) WHERE pw.t),
       |cc AS (SELECT count(*)::BIGINT AS n_control,
       |  sum(p4)::BIGINT AS spc FROM pw WHERE NOT t)
       |SELECT tt.n_treated, cc.n_control,
       | round(tt.sp::DOUBLE/10000.0/tt.n_treated::DOUBLE, 4) AS mean_p_t,
       | round(cc.spc::DOUBLE/10000.0/cc.n_control::DOUBLE, 4)
       |  AS mean_p_c,
       | round(tt.sd::DOUBLE/10000.0/tt.n_treated::DOUBLE, 4)
       |  AS mean_match_dist,
       | round(tt.d6::DOUBLE/1000000.0/tt.n_treated::DOUBLE, 4) + 0 AS att
       |FROM tt CROSS JOIN cc""".stripMargin.replace("\n", " ")
  }

  /** 5-iteration 2-weight GD chain over `src` (columns f0, f1, ry),
    * emitting ${pfx}1..${pfx}5 weight CTEs — the q183 device. */
  private def gd2Sql(src: String, pfx: String): String = {
    val fp9 = (e: String) =>
      s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e9+0.5) " +
        s"ELSE -floor(-($e)*1e9+0.5) END)::BIGINT"
    val regrain = (e: String) =>
      s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e6+0.5) " +
        s"ELSE -floor(-($e)*1e6+0.5) END) / 1000000.0"
    val head = s"${pfx}0 AS (SELECT 0.0::DOUBLE AS wa, 0.0::DOUBLE AS wb)"
    val iters = (1 to 5).map { t =>
      val p = s"$pfx${t - 1}"
      s"""${pfx}g$t AS (SELECT sum(${fp9("e * f0")}) AS s0,
         |  sum(${fp9("e * f1")}) AS s1, count(*) AS n
         | FROM (SELECT f0, f1, ry - (0.5 + z/(2.0*(1.0+abs(z)))) AS e
         |   FROM (SELECT q.f0, q.f1, q.ry,
         |     w.wa*q.f0 + w.wb*q.f1 AS z FROM $src q, $p w))),
         |$pfx$t AS (SELECT
         |  ${regrain(s"w.wa + 0.5 * (g.s0::DOUBLE / g.n / 1e9)")} AS wa,
         |  ${regrain(s"w.wb + 0.5 * (g.s1::DOUBLE / g.n / 1e9)")} AS wb
         | FROM $p w, ${pfx}g$t g)""".stripMargin
    }.mkString(", ")
    s"$head, $iters"
  }

  /** Shared fixture + two-arm GD + per-unit scoring CTEs for
    * q482/q483. Ends with `sc(uid, t, r, pt, pc)`. */
  private lazy val upliftCtes: String =
    s"""u0 AS (SELECT user_id AS uid, count(*)::BIGINT AS n,
       |  sum(${fp("value", "10000.0")}::HUGEINT) AS s4
       | FROM events WHERE value IS NOT NULL GROUP BY 1),
       |u1 AS (SELECT uid, s4::DOUBLE/10000.0/n::DOUBLE AS x FROM u0),
       |uu AS (SELECT uid, x, (${h56("uid::VARCHAR")} % 2) = 0 AS t,
       |  (${h56("'r:' || uid::VARCHAR")} % 1000) <
       |   (300 + CASE WHEN x > 49.0 THEN 200 ELSE 0 END
       |    + CASE WHEN (${h56("uid::VARCHAR")} % 2) = 0 AND x > 49.0
       |       THEN 300 ELSE 0 END) AS r,
       |  1.0::DOUBLE AS f0, (x - 49.0)/10.0 AS f1 FROM u1),
       |unt AS (SELECT f0, f1, CASE WHEN r THEN 1.0 ELSE 0.0 END AS ry
       | FROM uu WHERE t),
       |unc AS (SELECT f0, f1, CASE WHEN r THEN 1.0 ELSE 0.0 END AS ry
       | FROM uu WHERE NOT t),
       |${gd2Sql("unt", "tw")},
       |${gd2Sql("unc", "cw")},
       |sc AS (SELECT uid, t, r,
       |  0.5 + zt/(2.0*(1.0+abs(zt))) AS pt,
       |  0.5 + zc/(2.0*(1.0+abs(zc))) AS pc
       | FROM (SELECT uu.uid, uu.t, uu.r,
       |    wt.wa*uu.f0 + wt.wb*uu.f1 AS zt,
       |    wc.wa*uu.f0 + wc.wb*uu.f1 AS zc
       |   FROM uu, tw5 wt, cw5 wc))""".stripMargin

  /** Generated exact-Shapley oracle — replays
    * Behavior.shapleyAttribution term by term: coalition histogram,
    * 6dp-frozen v(S) ratios, factorial weight literals (round-trip
    * exact doubles), subset-enumeration-order sums. */
  private val shapleyOracle: String = {
    val chans = Seq("click", "error", "signup", "view") // sorted
    val k = chans.size
    def vSql(mask: Long) =
      s"coalesce((SELECT ${fp("c::DOUBLE / n::DOUBLE", "1000000.0")}" +
        s"::DOUBLE / 1000000.0 FROM h WHERE mask = $mask), 0.0)"
    def fact(n: Int): Double = (1 to n).foldLeft(1.0)(_ * _)
    val selects = chans.zipWithIndex.map { case (ch, i) =>
      val others = (0 until k).filter(_ != i)
      val terms = (0 until (1 << (k - 1))).map { sBits =>
        var mask = 0L
        var size = 0
        others.zipWithIndex.foreach { case (o, b) =>
          if ((sBits & (1 << b)) != 0) { mask |= (1L << o); size += 1 }
        }
        val w = fact(size) * fact(k - 1 - size) / fact(k)
        s"$w * (${vSql(mask | (1L << i))} - ${vSql(mask)})"
      }
      val phi = terms.mkString("0.0 + ", " + ", "")
      s"SELECT '$ch' AS channel, round($phi, 4) + 0 AS phi," +
        s" (SELECT coalesce(sum(n), 0) FROM h" +
        s" WHERE (mask & ${1L << i}) != 0)::BIGINT AS touched_users"
    }.mkString(" UNION ALL ")
    val caseIdx = chans.zipWithIndex
      .map { case (c, i) => s"WHEN '$c' THEN $i" }.mkString(" ")
    s"""WITH b AS (SELECT user_id AS u, ts, event_type AS ty FROM events),
       |cv AS (SELECT u, min(ts) AS ct FROM b WHERE ty = 'purchase'
       | GROUP BY 1),
       |tc AS (SELECT DISTINCT b.u, CASE ty $caseIdx END AS i
       | FROM b LEFT JOIN cv ON cv.u = b.u
       | WHERE ty IN (${chans.map(c => s"'$c'").mkString(", ")})
       |  AND (cv.ct IS NULL OR b.ts < cv.ct)),
       |mk AS (SELECT u, sum(1::BIGINT << i)::BIGINT AS mask FROM tc
       | GROUP BY 1),
       |us AS (SELECT d.u, coalesce(mk.mask, 0) AS mask,
       |  (cv.ct IS NOT NULL) AS conv
       | FROM (SELECT DISTINCT u FROM b) d LEFT JOIN mk USING (u)
       |  LEFT JOIN cv USING (u)),
       |h AS (SELECT mask, count(*)::BIGINT AS n,
       |  sum(CASE WHEN conv THEN 1 ELSE 0 END)::BIGINT AS c FROM us
       | GROUP BY 1)
       |$selects""".stripMargin.replace("\n", " ")
  }

  /** Elo duel fixture: per-user event-type value duels (exact
    * cross-multiplied fixed-point comparison), league = user parity,
    * ord = per-league match sequence. */
  private def eloMatches(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.Dataset[
      graft.model.Preference.EloMatch] = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val ut = ev(s, dir)
      .where(col("value").isNotNull && col("user_id") % 5 === 0)
      .groupBy(col("user_id").as("_u"), col("event_type").as("_t"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("_n"),
        sum(fixedPointLong(col("value").cast("double"), 4)
          .cast("decimal(38,0)")).as("_s4"))
    val a = ut.select(col("_u"), col("_t").as("_ta"),
      col("_n").as("_na"), col("_s4").as("_sa"))
    val b = ut.select(col("_u"), col("_t").as("_tb"),
      col("_n").as("_nb"), col("_s4").as("_sb"))
    val xa = col("_sa") * col("_nb")
    val xb = col("_sb") * col("_na")
    val w = Window.partitionBy(col("league"))
      .orderBy(col("_u"), col("_ta"), col("_tb"))
    a.join(b, "_u").where(col("_ta") < col("_tb")).where(xa =!= xb)
      .select(col("_u"), col("_ta"), col("_tb"),
        when(xa > xb, col("_ta")).otherwise(col("_tb")).as("winner"),
        when(xa > xb, col("_tb")).otherwise(col("_ta")).as("loser"))
      .withColumn("league", (col("_u") % 2).cast("string"))
      .withColumn("ord", row_number().over(w).cast("long"))
      .select(col("league"), col("ord"), col("winner"), col("loser"))
      .as[graft.model.Preference.EloMatch]
  }

  /** Generated autoencoder oracle — unrolled GD replay of
    * AutoEncoder.aeScore via the SAME expression templates
    * (AutoEncoder.exprs), with parameter-CTE column refs instead of
    * frozen literals. Uses DuckDB lateral column aliases for the
    * step chain. */
  private val aeOracle: String = {
    import graft.multi.AutoEncoder
    val d = 3
    val h = 2
    val rounds = 8
    def r6(e: String) = s"(${fp(e, "1000000.0")}::DOUBLE / 1000000.0)"
    val f8 = (e: String) => s"${fp(e, "100000000.0")}::HUGEINT"
    val refs = AutoEncoder.Refs(
      IndexedSeq.tabulate(h, d)((k, j) => s"q.w${k}_$j"),
      IndexedSeq.tabulate(h)(k => s"q.b1_$k"),
      IndexedSeq.tabulate(d)(j => s"q.b2_$j"))
    val ex = AutoEncoder.exprs(d, h, refs)
    val stepCols = ((0 until h).map(k => s"z$k") ++
      (0 until h).map(k => s"a$k") ++ (0 until d).map(j => s"xh$j") ++
      (0 until d).map(j => s"e$j") ++ (0 until h).map(k => s"gz$k"))
      .map(c => s"${ex(c)} AS $c").mkString(", ")
    val gradKeys = (for (k <- 0 until h; j <- 0 until d)
      yield s"gw${k}_$j") ++
      (0 until h).map(k => s"gb1_$k") ++ (0 until d).map(j => s"gb2_$j")
    val gradSums = gradKeys.map(g => s"sum(${f8(ex(g))}) AS $g")
      .mkString(", ")
    val w0 = AutoEncoder.initW(h, d)
    val par0 = ((for (k <- 0 until h; j <- 0 until d)
      yield s"${w0(k)(j)}::DOUBLE AS w${k}_$j") ++
      (0 until h).map(k => s"0.0::DOUBLE AS b1_$k") ++
      (0 until d).map(j => s"0.0::DOUBLE AS b2_$j")).mkString(", ")
    val parCols = (for (k <- 0 until h; j <- 0 until d)
      yield (s"w${k}_$j", s"gw${k}_$j")) ++
      (0 until h).map(k => (s"b1_$k", s"gb1_$k")) ++
      (0 until d).map(j => (s"b2_$j", s"gb2_$j"))
    val rnds = (1 to rounds).map { r =>
      val upd = parCols.map { case (p, g) =>
        s"${r6(s"q.$p - 0.1*((s$r.$g::DOUBLE/100000000.0)" +
          s"/s$r.n::DOUBLE)")} AS $p"
      }.mkString(", ")
      s"""fr$r AS (SELECT x0, x1, x2, $stepCols
         | FROM sc CROSS JOIN par${r - 1} q),
         |s$r AS (SELECT $gradSums, count(*)::BIGINT AS n FROM fr$r),
         |par$r AS (SELECT $upd FROM s$r CROSS JOIN par${r - 1} q)"""
        .stripMargin
    }.mkString(",\n")
    val scoreCols = ((0 until h).map(k => s"z$k") ++
      (0 until h).map(k => s"a$k") ++ (0 until d).map(j => s"xh$j") ++
      (0 until d).map(j => s"e$j"))
      .map(c => s"${ex(c)} AS $c").mkString(", ")
    val statCols = (0 until d).map { i =>
      val m = s"(s$i::DOUBLE/10000.0)/n$i::DOUBLE"
      s"$m AS m$i, CASE WHEN (ss$i::DOUBLE/100000000.0/n$i::DOUBLE" +
        s" - ($m)*($m)) > 0 THEN sqrt(ss$i::DOUBLE/100000000.0" +
        s"/n$i::DOUBLE - ($m)*($m)) ELSE 0.0 END AS sd$i"
    }.mkString(", ")
    val rawAggs = (0 until d).map { i =>
      s"sum(${fp(s"f$i", "10000.0")}::HUGEINT) AS s$i," +
        s" sum(${fp(s"f$i", "10000.0")}::HUGEINT" +
        s" * ${fp(s"f$i", "10000.0")}::HUGEINT) AS ss$i," +
        s" count(f$i)::BIGINT AS n$i"
    }.mkString(", ")
    val scCols = (0 until d).map(i =>
      s"CASE WHEN st.sd$i > 0 THEN (b0.f$i - st.m$i)/st.sd$i" +
        s" ELSE 0.0 END AS x$i").mkString(", ")
    s"""WITH b0 AS (SELECT event_id, value::DOUBLE AS f0,
       |  sqrt(value) AS f1, (user_id % 97)::DOUBLE AS f2
       | FROM events WHERE value IS NOT NULL),
       |ra AS (SELECT $rawAggs FROM b0),
       |st AS (SELECT $statCols FROM ra),
       |sc AS MATERIALIZED (SELECT b0.event_id, $scCols
       | FROM b0 CROSS JOIN st),
       |par0 AS (SELECT $par0),
       |$rnds,
       |fin AS (SELECT sc.event_id, $scoreCols
       | FROM sc CROSS JOIN par$rounds q)
       |SELECT event_id, round(${ex("sse")}, 4) + 0 AS score,
       | CASE WHEN (${ex("sse")}) > 2.0 THEN 'O' ELSE 'N' END AS tag
       |FROM fin""".stripMargin.replace("\n", " ")
  }

  /** Generated Elo-trajectory oracle — the recursive-CTE replay of
    * eloTrajectory's sequential float program (E = exp-logistic,
    * K = 32, init 1000). */
  private val eloOracle: String = {
    val items = Seq("click", "error", "purchase", "signup", "view")
    def pick(ref: String) = items.zipWithIndex
      .map { case (it, i) => s"WHEN '$it' THEN r.p$i" }
      .mkString(s"CASE $ref ", " ", " END")
    val pw = pick("m.w")
    val pl = pick("m.l")
    val e = s"(1.0/(1.0 + exp(((($pl) - ($pw))/400.0) * ln(10.0))))"
    val nw = s"(($pw) + 32.0*(1.0 - $e))"
    val nl = s"(($pl) - 32.0*(1.0 - $e))"
    val upd = items.zipWithIndex.map { case (it, i) =>
      s"CASE WHEN m.w = '$it' THEN $nw WHEN m.l = '$it' THEN $nl" +
        s" ELSE r.p$i END AS p$i"
    }.mkString(", ")
    val init = items.indices.map(i => s"1000.0::DOUBLE AS p$i")
      .mkString(", ")
    s"""WITH RECURSIVE ut AS (SELECT user_id AS u, event_type AS t,
       |  count(*)::HUGEINT AS n, sum(${fp("value", "10000.0")}::HUGEINT)
       |   AS s4
       | FROM events WHERE value IS NOT NULL AND user_id % 5 = 0
       | GROUP BY 1, 2),
       |pr AS (SELECT a.u, a.t AS ta, b.t AS tb, a.s4*b.n AS xa,
       |  b.s4*a.n AS xb FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t),
       |dm AS (SELECT u, ta, tb,
       |  CASE WHEN xa > xb THEN ta ELSE tb END AS w,
       |  CASE WHEN xa > xb THEN tb ELSE ta END AS l
       | FROM pr WHERE xa <> xb),
       |m AS MATERIALIZED (SELECT (u % 2)::VARCHAR AS lg,
       |  row_number() OVER (PARTITION BY u % 2
       |   ORDER BY u, ta, tb)::BIGINT AS rn, w, l FROM dm),
       |r AS (SELECT lg, 0::BIGINT AS rn, CAST(NULL AS VARCHAR) AS w,
       |  CAST(NULL AS VARCHAR) AS l, 0.0::DOUBLE AS rw, 0.0::DOUBLE
       |   AS rl, $init
       | FROM (SELECT DISTINCT lg FROM m)
       | UNION ALL
       | SELECT m.lg, m.rn, m.w, m.l, $nw AS rw, $nl AS rl, $upd
       | FROM r JOIN m ON m.lg = r.lg AND m.rn = r.rn + 1)
       |SELECT lg AS league, rn AS ord, w AS winner, l AS loser,
       | round(rw, 4) + 0 AS rWinner, round(rl, 4) + 0 AS rLoser
       |FROM r WHERE rn >= 1""".stripMargin.replace("\n", " ")
  }

  /** Generated Markov-attribution oracle — replays
    * Behavior.markovAttribution: per-user lead() transitions,
    * 6dp-frozen transition ratios, 16 unrolled value-iteration sweeps
    * for the full chain and each removal chain. */
  private val markovOracle: String = {
    val chans = Seq("click", "error", "signup", "view")
    val k = chans.size
    val rounds = 16
    def r6(e: String) = s"(${fp(e, "1000000.0")}::DOUBLE / 1000000.0)"
    val sources = "START" +: chans
    val targets = chans :+ "CONV"
    val tmCols = sources.zipWithIndex.flatMap { case (s, si) =>
      targets.zipWithIndex.map { case (g, gi) =>
        s"CASE WHEN coalesce((SELECT o FROM ot WHERE src = '$s'), 0) > 0" +
          s" THEN ${r6(s"coalesce((SELECT n FROM cn WHERE src = '$s'" +
            s" AND tgt = '$g'), 0)::DOUBLE" +
            s" / (SELECT o FROM ot WHERE src = '$s')::DOUBLE")}" +
          s" ELSE 0.0 END AS t${si}_$gi"
      }
    }.mkString(", ")
    // one chain: `pin` = state index pinned to 0 (-1 = full chain)
    def chain(name: String, pin: Int): String = {
      val init = sources.indices.map(i => s"0.0::DOUBLE AS p$i")
        .mkString(", ")
      val steps = (1 to rounds).map { r =>
        val cols = sources.indices.map { i =>
          if (i == pin) s"0.0::DOUBLE AS p$i"
          else {
            val terms = chans.indices.map(j =>
              s"tm.t${i}_$j * q.p${j + 1}") :+ s"tm.t${i}_$k * 1.0"
            s"${terms.mkString("0.0 + ", " + ", "")} AS p$i"
          }
        }.mkString(", ")
        s"$name$r AS (SELECT $cols FROM $name${r - 1} q, tm)"
      }.mkString(",\n")
      s"${name}0 AS (SELECT $init),\n$steps"
    }
    val chains = (chain("f", -1) +:
      chans.indices.map(m => chain(s"rm$m", m + 1))).mkString(",\n")
    val reCols = chans.indices.map(m =>
      s"CASE WHEN f$rounds.p0 > 0" +
        s" THEN 1.0 - rm$m$rounds.p0/f$rounds.p0 ELSE 0.0 END AS re$m")
      .mkString(", ")
    val reFrom = (s"f$rounds" +: chans.indices.map(m => s"rm$m$rounds"))
      .mkString(", ")
    val reSum = chans.indices.map(m => s"re$m")
      .mkString("0.0 + ", " + ", "")
    val outRows = chans.zipWithIndex.map { case (c, m) =>
      s"SELECT '$c' AS channel, round(re$m, 4) + 0 AS removal_effect," +
        s" round(CASE WHEN ($reSum) > 0 THEN re$m/($reSum)" +
        s" ELSE 0.0 END, 4) + 0 AS share, round(pfull, 4) AS p_conv" +
        s" FROM res"
    }.mkString(" UNION ALL ")
    s"""WITH b AS (SELECT user_id AS u, event_id AS o, event_type AS ty
       | FROM events),
       |cv AS (SELECT u, min(o) AS ct FROM b WHERE ty = 'purchase'
       | GROUP BY 1),
       |tc AS (SELECT b.u, b.o, b.ty, cv.ct FROM b LEFT JOIN cv USING (u)
       | WHERE b.ty IN (${chans.map(c => s"'$c'").mkString(", ")})
       |  AND (cv.ct IS NULL OR b.o < cv.ct)),
       |od AS (SELECT u, ty, ct,
       |  lead(ty) OVER (PARTITION BY u ORDER BY o) AS nxt,
       |  row_number() OVER (PARTITION BY u ORDER BY o) AS rn FROM tc),
       |tr AS (SELECT ty AS src, nxt AS tgt FROM od WHERE nxt IS NOT NULL
       | UNION ALL SELECT ty, CASE WHEN ct IS NOT NULL THEN 'CONV'
       |  ELSE 'NULL' END FROM od WHERE nxt IS NULL
       | UNION ALL SELECT 'START', ty FROM od WHERE rn = 1
       | UNION ALL SELECT 'START', CASE WHEN cv.ct IS NOT NULL
       |   THEN 'CONV' ELSE 'NULL' END
       |  FROM (SELECT DISTINCT u FROM b) d
       |  LEFT JOIN (SELECT DISTINCT u AS tu FROM tc) t2 ON t2.tu = d.u
       |  LEFT JOIN cv ON cv.u = d.u WHERE t2.tu IS NULL),
       |cn AS MATERIALIZED (SELECT src, tgt, count(*)::BIGINT AS n FROM tr
       | GROUP BY 1, 2),
       |ot AS MATERIALIZED (SELECT src, sum(n)::BIGINT AS o FROM cn GROUP BY 1),
       |tm AS MATERIALIZED (SELECT $tmCols),
       |$chains,
       |res AS (SELECT f$rounds.p0 AS pfull, $reCols FROM $reFrom)
       |$outRows""".stripMargin.replace("\n", " ")
  }

  /** The q466 synthetic-probability fixture as a frame:
    * score = ((doc_id·37 + n_chars) mod 1000)/1000, y = lang='en'. */
  private def probFixture(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      (pmod(col("doc_id") * 37 + col("n_chars"), lit(1000))
        .cast("double") / 1000.0).as("score"),
      (col("lang") === "en").as("y"))

  /** Its SQL twin. */
  private val probCte =
    """pb AS (SELECT doc_id,
      |  ((doc_id*37 + n_chars) % 1000)::DOUBLE / 1000.0 AS score,
      |  (lang = 'en') AS y FROM documents)""".stripMargin
      .replace("\n", " ")

  /** Survival-subjects-with-covariates fixture CTE chain (shared by
    * the Cox and C-index oracles). */
  private val coxSubjCte: String =
    s"""dd AS (SELECT user_id,
       |  epoch_ns(ts) // 86400000000000 AS day, value FROM events),
       |per AS (SELECT user_id, min(day) AS fd, max(day) AS ld,
       |  min(CASE WHEN value > 250.0 THEN day END) AS hd,
       |  count(value)::BIGINT AS nv,
       |  sum(${fp("value", "10000.0")}::HUGEINT) AS s4
       | FROM dd GROUP BY 1),
       |subj0 AS (SELECT
       |  (CASE WHEN hd IS NOT NULL THEN hd - fd
       |   ELSE ld - fd END)::DOUBLE AS dur,
       |  hd IS NOT NULL AS ev,
       |  (s4::DOUBLE/10000.0/nv::DOUBLE - 50.0)/10.0 AS x1,
       |  CASE WHEN user_id % 2 = 0 THEN 1.0 ELSE 0.0 END AS x2
       | FROM per),
       |subj AS (SELECT * FROM subj0 WHERE x1 IS NOT NULL)"""
      .stripMargin.replace("\n", " ")

  /** Generated C-index oracle — replays Survival.concordanceIndex's
    * dense dominance grid over the Cox fixture (score = x1, 2dp). */
  private val cIndexOracle: String =
    s"""WITH $coxSubjCte,
       |cells AS (SELECT dur AS d, ${fp("x1", "100.0")} AS sb,
       |  count(*)::BIGINT AS n,
       |  sum(CASE WHEN ev THEN 1 ELSE 0 END)::BIGINT AS e
       | FROM subj GROUP BY 1, 2),
       |durs AS (SELECT DISTINCT d FROM cells),
       |sbs AS (SELECT DISTINCT sb FROM cells),
       |grid AS (SELECT durs.d, sbs.sb, coalesce(c.n, 0) AS n,
       |  coalesce(c.e, 0) AS e
       | FROM durs CROSS JOIN sbs
       | LEFT JOIN cells c ON c.d = durs.d AND c.sb = sbs.sb),
       |s1 AS (SELECT *, sum(n) OVER (PARTITION BY sb ORDER BY d DESC
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
       |   AS later_same FROM grid),
       |s2 AS (SELECT *, coalesce(sum(later_same)
       |  OVER (PARTITION BY d ORDER BY sb ASC
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |   AS later_lower FROM s1),
       |dt AS (SELECT d, sum(n)::BIGINT AS dn FROM cells GROUP BY 1),
       |lt AS (SELECT d, sum(dn) OVER (ORDER BY d DESC
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - dn
       |   AS later_all FROM dt),
       |ag AS (SELECT
       |  sum(e::HUGEINT * later_all::HUGEINT) AS up,
       |  sum(e::HUGEINT * later_lower::HUGEINT) AS cc,
       |  sum(e::HUGEINT * later_same::HUGEINT) AS tt
       | FROM s2 JOIN lt USING (d))
       |SELECT up::BIGINT AS usable_pairs, cc::BIGINT AS concordant,
       | tt::BIGINT AS tied,
       | round(CASE WHEN up > 0
       |  THEN (cc::DOUBLE + 0.5*tt::DOUBLE)/up::DOUBLE
       |  ELSE 0.5 END, 4) AS c_index
       |FROM ag""".stripMargin.replace("\n", " ")

  /** Generated Cox-PH oracle — replays Survival.coxPh: per-round
    * duration-histogram risk sums (8dp integer cumsums), Breslow U/H
    * terms, closed-form 2x2 Newton with 6dp-frozen betas, final SE
    * pass. */
  private val coxOracle: String = {
    def r6(e: String) = s"(${fp(e, "1000000.0")}::DOUBLE / 1000000.0)"
    def pass(r: Int, par: String) = {
      val f8 = (e: String) => s"${fp(e, "100000000.0")}::HUGEINT"
      s"""w$r AS (SELECT dur, ev, x1, x2,
         |  exp(x1*q.b1 + x2*q.b2) AS w FROM subj CROSS JOIN $par q),
         |h$r AS (SELECT dur, sum(${f8("w")}) AS sw,
         |  sum(${f8("w*x1")}) AS sw1, sum(${f8("w*x2")}) AS sw2,
         |  sum(${f8("w*x1*x1")}) AS sw11, sum(${f8("w*x1*x2")}) AS sw12,
         |  sum(${f8("w*x2*x2")}) AS sw22,
         |  sum(CASE WHEN ev THEN 1 ELSE 0 END)::BIGINT AS dt,
         |  sum(CASE WHEN ev THEN ${f8("x1")} ELSE 0 END) AS ex1,
         |  sum(CASE WHEN ev THEN ${f8("x2")} ELSE 0 END) AS ex2
         | FROM w$r GROUP BY 1),
         |c$r AS (SELECT *, sum(sw) OVER cum AS s0,
         |  sum(sw1) OVER cum AS s1, sum(sw2) OVER cum AS s2,
         |  sum(sw11) OVER cum AS s11, sum(sw12) OVER cum AS s12,
         |  sum(sw22) OVER cum AS s22 FROM h$r
         | WINDOW cum AS (ORDER BY dur DESC
         |  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |t$r AS (SELECT
         |  ${f8("ex1::DOUBLE/100000000.0 - dt::DOUBLE" +
        "*(s1::DOUBLE/s0::DOUBLE)")} AS u1t,
         |  ${f8("ex2::DOUBLE/100000000.0 - dt::DOUBLE" +
        "*(s2::DOUBLE/s0::DOUBLE)")} AS u2t,
         |  ${f8("dt::DOUBLE*(s11::DOUBLE/s0::DOUBLE" +
        " - (s1::DOUBLE/s0::DOUBLE)*(s1::DOUBLE/s0::DOUBLE))")} AS h11t,
         |  ${f8("dt::DOUBLE*(s12::DOUBLE/s0::DOUBLE" +
        " - (s1::DOUBLE/s0::DOUBLE)*(s2::DOUBLE/s0::DOUBLE))")} AS h12t,
         |  ${f8("dt::DOUBLE*(s22::DOUBLE/s0::DOUBLE" +
        " - (s2::DOUBLE/s0::DOUBLE)*(s2::DOUBLE/s0::DOUBLE))")} AS h22t
         | FROM c$r WHERE dt > 0),
         |a$r AS (SELECT sum(u1t)::DOUBLE/100000000.0 AS u1,
         |  sum(u2t)::DOUBLE/100000000.0 AS u2,
         |  sum(h11t)::DOUBLE/100000000.0 AS h11,
         |  sum(h12t)::DOUBLE/100000000.0 AS h12,
         |  sum(h22t)::DOUBLE/100000000.0 AS h22 FROM t$r)""".stripMargin
    }
    val upd = (r: Int) =>
      s"""par$r AS (SELECT
         | CASE WHEN abs(a$r.h11*a$r.h22 - a$r.h12*a$r.h12) > 1e-12
         |  THEN ${r6(s"q.b1 + (a$r.h22*a$r.u1 - a$r.h12*a$r.u2)" +
        s"/(a$r.h11*a$r.h22 - a$r.h12*a$r.h12)")}
         |  ELSE q.b1 END AS b1,
         | CASE WHEN abs(a$r.h11*a$r.h22 - a$r.h12*a$r.h12) > 1e-12
         |  THEN ${r6(s"q.b2 + (a$r.h11*a$r.u2 - a$r.h12*a$r.u1)" +
        s"/(a$r.h11*a$r.h22 - a$r.h12*a$r.h12)")}
         |  ELSE q.b2 END AS b2
         | FROM a$r CROSS JOIN par${r - 1} q)""".stripMargin
    s"""WITH $coxSubjCte,
       |par0 AS (SELECT 0.0::DOUBLE AS b1, 0.0::DOUBLE AS b2),
       |${pass(1, "par0")},
       |${upd(1)},
       |${pass(2, "par1")},
       |${upd(2)},
       |${pass(3, "par2")},
       |fin AS (SELECT q.b1, q.b2,
       |  a3.h11*a3.h22 - a3.h12*a3.h12 AS det, a3.h11, a3.h22
       | FROM a3 CROSS JOIN par2 q)
       |SELECT 'x1' AS covariate, round(b1, 4) + 0 AS beta,
       | round(CASE WHEN det > 0 THEN sqrt(h22/det) ELSE 0.0 END, 4)
       |  AS se,
       | round(CASE WHEN det > 0 AND sqrt(h22/det) > 0
       |  THEN b1/sqrt(h22/det) ELSE 0.0 END, 4) + 0 AS z,
       | round(exp(b1), 4) AS hazard_ratio FROM fin
       |UNION ALL
       |SELECT 'x2' AS covariate, round(b2, 4) + 0 AS beta,
       | round(CASE WHEN det > 0 THEN sqrt(h11/det) ELSE 0.0 END, 4)
       |  AS se,
       | round(CASE WHEN det > 0 AND sqrt(h11/det) > 0
       |  THEN b2/sqrt(h11/det) ELSE 0.0 END, 4) + 0 AS z,
       | round(exp(b2), 4) AS hazard_ratio FROM fin"""
      .stripMargin.replace("\n", " ")
  }

  /** Generated Bradley-Terry MM oracle — replays Preference.bradleyTerry
    * round by round over the 5 event-type items: exact comparison
    * counts, item-order denominator/normalization sums, 6dp-frozen
    * strengths. */
  private val btOracle: String = {
    val items = Seq("click", "error", "purchase", "signup", "view")
    val k = items.size
    def r6(e: String) = s"(${fp(e, "1000000.0")}::DOUBLE / 1000000.0)"
    // one-row constants CTE: per-item wins + symmetric pair totals
    val wCols = items.zipWithIndex.map { case (it, i) =>
      s"(SELECT coalesce(sum(n), 0) FROM cn WHERE w = '$it')::DOUBLE AS w$i"
    }
    val nCols = (for (i <- 0 until k; j <- i + 1 until k) yield {
      s"((SELECT coalesce(sum(n), 0) FROM cn WHERE w = '${items(i)}'" +
        s" AND l = '${items(j)}') + (SELECT coalesce(sum(n), 0) FROM cn" +
        s" WHERE w = '${items(j)}' AND l = '${items(i)}'))::DOUBLE" +
        s" AS n${i}_$j"
    })
    def nRef(i: Int, j: Int) = if (i < j) s"st.n${i}_$j" else s"st.n${j}_$i"
    val p0 = items.indices.map(i => s"${r6(s"1.0/$k")} AS p$i")
      .mkString(", ")
    val rnds = (1 to 5).map { r =>
      val q = s"p${r - 1}"
      val raws = items.indices.map { i =>
        val denom = items.indices.filter(_ != i).map { j =>
          s"CASE WHEN ${nRef(i, j)} > 0" +
            s" THEN ${nRef(i, j)}/($q.p$i + $q.p$j) ELSE 0.0 END"
        }.mkString("0.0 + ", " + ", "")
        s"CASE WHEN ($denom) > 0 THEN st.w$i/($denom)" +
          s" ELSE $q.p$i END AS raw$i"
      }.mkString(", ")
      val sSum = items.indices.map(i => s"raw$i")
        .mkString("0.0 + ", " + ", "")
      val ps = items.indices.map(i => s"${r6(s"raw$i/($sSum)")} AS p$i")
        .mkString(", ")
      s"""r$r AS (SELECT $raws FROM $q, st),
         |p$r AS (SELECT $ps FROM r$r)""".stripMargin
    }.mkString(",\n")
    val outRows = items.zipWithIndex.map { case (it, i) =>
      val comps = items.indices.filter(_ != i).map(j => nRef(i, j))
        .mkString(" + ")
      s"SELECT '$it' AS item, p5.p$i AS pi, st.w$i::BIGINT AS wins," +
        s" ($comps)::BIGINT AS comparisons FROM p5, st"
    }.mkString(" UNION ALL ")
    s"""WITH ut AS (SELECT user_id AS u, event_type AS t,
       |  count(*)::HUGEINT AS n,
       |  sum(${fp("value", "10000.0")}::HUGEINT) AS s4
       | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
       |pr AS (SELECT a.u, a.t AS ta, b.t AS tb, a.s4*b.n AS xa,
       |  b.s4*a.n AS xb
       | FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t),
       |cmp AS (SELECT CASE WHEN xa > xb THEN ta ELSE tb END AS w,
       |  CASE WHEN xa > xb THEN tb ELSE ta END AS l
       | FROM pr WHERE xa <> xb),
       |cn AS (SELECT w, l, count(*)::BIGINT AS n FROM cmp GROUP BY 1, 2),
       |st AS (SELECT ${(wCols ++ nCols).mkString(", ")}),
       |p0 AS (SELECT $p0),
       |$rnds
       |SELECT item, round(pi, 4) + 0 AS pi, wins, comparisons,
       | row_number() OVER (ORDER BY pi DESC, item ASC)::INT AS rank
       |FROM ($outRows)""".stripMargin.replace("\n", " ")
  }

  /** Unrolled Fellegi-Sunter EM oracle — replays
    * Linkage.fellegiSunterEm's float program over the 2^3 agreement
    * patterns: field-ordered products, 9dp fixed-point round sums,
    * 6dp-frozen + clamped parameters, 3 rounds. */
  private val fsOracle: String = {
    def r6c(e: String) =
      s"least(greatest(${fp(e, "1000000.0")}::DOUBLE / 1000000.0," +
        " 0.000001), 1.0 - 0.000001)"
    val flds = Seq("a1", "a2", "a3")
    def prod(p0: String, ps: Seq[String]) = flds.zip(ps).foldLeft(p0) {
      case (acc, (a, prm)) =>
        s"($acc * CASE WHEN h.$a THEN q.$prm ELSE 1.0 - q.$prm END)"
    }
    val rounds = (1 to 3).map { r =>
      val q = s"par${r - 1}"
      val smCols = flds.zipWithIndex.map { case (a, i) =>
        s"sum(CASE WHEN $a THEN ${fp("n::DOUBLE * g", "1000000000.0")}" +
          s"::HUGEINT ELSE 0 END) AS sm${i + 1}," +
          s" sum(CASE WHEN $a THEN ${fp("n::DOUBLE * (1.0 - g)",
            "1000000000.0")}::HUGEINT ELSE 0 END) AS sv${i + 1}"
      }.mkString(", ")
      val ms = flds.indices.map(i =>
        s"${r6c(s"sm${i + 1}::DOUBLE / s9::DOUBLE")} AS m${i + 1}")
        .mkString(", ")
      val us = flds.indices.map(i =>
        s"${r6c(s"sv${i + 1}::DOUBLE / su9::DOUBLE")} AS u${i + 1}")
        .mkString(", ")
      s"""e$r AS (SELECT h.a1, h.a2, h.a3, h.n,
         |  ${prod("q.p", Seq("m1", "m2", "m3"))} AS pm,
         |  ${prod("(1.0 - q.p)", Seq("u1", "u2", "u3"))} AS pu
         | FROM h CROSS JOIN $q q),
         |g$r AS (SELECT a1, a2, a3, n, pm/(pm + pu) AS g FROM e$r),
         |s$r AS (SELECT
         |  sum(${fp("n::DOUBLE * g", "1000000000.0")}::HUGEINT) AS s9,
         |  sum(${fp("n::DOUBLE * (1.0 - g)",
        "1000000000.0")}::HUGEINT) AS su9, $smCols FROM g$r),
         |par$r AS (SELECT
         |  ${r6c("s9::DOUBLE/1000000000.0/nt.ntot::DOUBLE")} AS p,
         |  $ms, $us FROM s$r CROSS JOIN nt)""".stripMargin
    }.mkString(",\n")
    val wTerms = Seq(("agr_src", "m1", "u1"), ("agr_pre", "m2", "u2"),
      ("agr_len", "m3", "u3")).map { case (a, mm, uu) =>
      s"(CASE WHEN pr.$a THEN ln(q.$mm/q.$uu)" +
        s" ELSE ln((1.0 - q.$mm)/(1.0 - q.$uu)) END)"
    }.mkString(" + ")
    s"""WITH dd AS (SELECT doc_id, lang, source, n_chars,
       |  n_chars // 100 AS blk, substr(lower(text), 1, 16) AS pre
       | FROM documents),
       |pr AS (SELECT a.doc_id AS a, b.doc_id AS b,
       |  (a.source = b.source) AS agr_src, (a.pre = b.pre) AS agr_pre,
       |  (abs(a.n_chars - b.n_chars) * 20
       |    <= greatest(a.n_chars, b.n_chars)) AS agr_len
       | FROM dd a JOIN dd b ON a.lang = b.lang AND a.blk = b.blk
       |  AND a.doc_id < b.doc_id),
       |h AS (SELECT agr_src AS a1, agr_pre AS a2, agr_len AS a3,
       |  count(*)::BIGINT AS n FROM pr GROUP BY 1, 2, 3),
       |nt AS (SELECT sum(n)::BIGINT AS ntot FROM h),
       |par0 AS (SELECT 0.1::DOUBLE AS p, 0.9::DOUBLE AS m1,
       |  0.9::DOUBLE AS m2, 0.9::DOUBLE AS m3, 0.1::DOUBLE AS u1,
       |  0.1::DOUBLE AS u2, 0.1::DOUBLE AS u3),
       |$rounds,
       |sc AS (SELECT pr.a, pr.b, pr.agr_src, pr.agr_pre, pr.agr_len,
       |  $wTerms AS w FROM pr CROSS JOIN par3 q)
       |SELECT a, b, agr_src, agr_pre, agr_len,
       | round(w, 4) + 0 AS weight,
       | CASE WHEN w >= 2.0 THEN 'match' WHEN w <= -2.0 THEN 'nonmatch'
       |  ELSE 'possible' END AS decision
       |FROM sc""".stripMargin.replace("\n", " ")
  }

  private val adwinOracle: String = {
      // Drift.adwin's float-op order: means from exact 4dp prefix
      // longs, eps = R*sqrt(((1/n1 + 1/n2)/2) * ln(4*W/delta))
      val m1 = "((c.q4 - coalesce((SELECT q4 FROM pre z " +
        "WHERE z.k = c.k AND z.rn = r.ws - 1), 0))::DOUBLE / 10000.0)" +
        " / (c.rn - r.ws + 1)::DOUBLE"
      val m2 = "((p.q4 - c.q4)::DOUBLE / 10000.0) / (p.rn - c.rn)::DOUBLE"
      val eps = "50.0 * sqrt(((1.0/(c.rn - r.ws + 1)::DOUBLE " +
        "+ 1.0/(p.rn - c.rn)::DOUBLE) / 2.0) " +
        "* ln(4.0 * (p.rn - r.ws + 1)::DOUBLE / 0.002))"
      s"""WITH RECURSIVE e AS (SELECT event_type AS k, event_id AS seq,
         |  value + CASE WHEN (event_id // 20) % 50 >= 25
         |   THEN 40.0 ELSE 0.0 END AS y
         | FROM events WHERE value IS NOT NULL AND event_id % 20 = 0),
         |pre AS (SELECT k, seq, y,
         |  row_number() OVER (PARTITION BY k ORDER BY seq)::BIGINT AS rn,
         |  sum(${fp("y", "10000.0")}::HUGEINT)
         |   OVER (PARTITION BY k ORDER BY seq
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS q4
         | FROM e),
         |r AS (
         | SELECT k, seq, y, rn, 1::BIGINT AS ws, false AS drift
         | FROM pre WHERE rn = 1
         | UNION ALL
         | SELECT p.k, p.seq, p.y, p.rn,
         |  CASE WHEN d.hit THEN p.rn ELSE r.ws END AS ws, d.hit AS drift
         | FROM r JOIN pre p ON p.k = r.k AND p.rn = r.rn + 1
         | JOIN LATERAL (
         |  SELECT coalesce(bool_or(abs(($m1) - ($m2)) > ($eps)), false)
         |   AS hit
         |  FROM pre c WHERE c.k = p.k AND c.rn BETWEEN r.ws AND p.rn - 1
         | ) d ON true)
         |SELECT k AS key, seq, round(y, 4) AS value,
         | ws AS winStart, drift FROM r"""
        .stripMargin.replace("\n", " ")
    }

  val oracleSql: Map[String, String] = Map(
    "q482_uplift" ->
      s"""WITH $upliftCtes
         |SELECT uid, round(pt, 4) AS p_t, round(pc, 4) AS p_c,
         | round(pt - pc, 4) + 0 AS uplift
         |FROM sc""".stripMargin.replace("\n", " "),
    "q483_qini" ->
      s"""WITH $upliftCtes,
         |b4 AS (SELECT ${fp("pt - pc", "10000.0")} AS u4, t,
         |  CASE WHEN r THEN 1 ELSE 0 END AS rr FROM sc),
         |hh AS (SELECT u4, count(*)::BIGINT AS ns,
         |  sum(CASE WHEN t THEN 1 ELSE 0 END)::BIGINT AS nt,
         |  sum(CASE WHEN t THEN rr ELSE 0 END)::BIGINT AS rt,
         |  sum(CASE WHEN NOT t THEN rr ELSE 0 END)::BIGINT AS rc
         | FROM b4 GROUP BY 1),
         |tn AS (SELECT sum(ns)::BIGINT AS n FROM hh),
         |bb AS (SELECT least(9, floor(
         |   (sum(ns) OVER (ORDER BY u4 DESC
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ns)
         |    * 10 / tn.n)::INT) AS bin, ns, nt, rt, rc
         | FROM hh CROSS JOIN tn),
         |gq AS (SELECT bin, sum(nt)::BIGINT AS n_t,
         |  (sum(ns) - sum(nt))::BIGINT AS n_c,
         |  sum(rt)::BIGINT AS r_t, sum(rc)::BIGINT AS r_c
         | FROM bb GROUP BY 1),
         |cu AS (SELECT bin, n_t, n_c, r_t, r_c,
         |  sum(n_t) OVER wb AS cnt, sum(n_c) OVER wb AS cnc,
         |  sum(r_t) OVER wb AS crt, sum(r_c) OVER wb AS crc
         | FROM gq WINDOW wb AS (ORDER BY bin ASC
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT bin, n_t, n_c, r_t, r_c,
         | round(CASE WHEN n_t > 0 AND n_c > 0
         |  THEN r_t::DOUBLE/n_t::DOUBLE - r_c::DOUBLE/n_c::DOUBLE
         |  ELSE 0.0 END, 4) + 0 AS uplift_obs,
         | round(CASE WHEN cnc > 0
         |  THEN crt::DOUBLE - crc::DOUBLE * (cnt::DOUBLE / cnc::DOUBLE)
         |  ELSE 0.0 END, 4) + 0 AS qini
         |FROM cu""".stripMargin.replace("\n", " "),
    "q481_psm_att" -> psmOracle,
    "q513_ipw_ate" -> ipwOracle,
    "q484_conformal_interval" ->
      s"""WITH tg AS (SELECT event_type AS k2, value::DOUBLE AS y,
         |  (${h56("event_id::VARCHAR")} % 3) AS fold
         | FROM events WHERE value IS NOT NULL),
         |mu AS (SELECT k2, count(*)::BIGINT AS n_train,
         |  sum(${fp("y", "10000.0")}::HUGEINT)::DOUBLE/10000.0
         |   /count(*)::DOUBLE AS mu
         | FROM tg WHERE fold = 0 GROUP BY 1),
         |cal AS (SELECT tg.k2, ${fp("abs(tg.y - mu.mu)", "10000.0")} AS r4
         | FROM tg JOIN mu ON mu.k2 = tg.k2 WHERE tg.fold = 1),
         |nc AS (SELECT k2, count(*)::BIGINT AS n_calib
         | FROM cal GROUP BY 1),
         |hi AS (SELECT k2, r4, count(*)::BIGINT AS ct
         | FROM cal GROUP BY 1, 2),
         |cm AS (SELECT hi.k2, hi.r4,
         |  sum(hi.ct) OVER (PARTITION BY hi.k2 ORDER BY hi.r4 ASC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |  nc.n_calib
         | FROM hi JOIN nc ON nc.k2 = hi.k2),
         |qh AS (SELECT k2, min(r4) AS q4 FROM cm
         | WHERE cum >= least(n_calib,
         |  ceil((n_calib + 1)::DOUBLE * 0.9::DOUBLE)::BIGINT)
         | GROUP BY 1),
         |ts AS (SELECT tg.k2, count(*)::BIGINT AS n_test,
         |  sum(CASE WHEN ${fp("abs(tg.y - mu.mu)", "10000.0")} <= qh.q4
         |   THEN 1 ELSE 0 END)::BIGINT AS inn
         | FROM tg JOIN mu ON mu.k2 = tg.k2 JOIN qh ON qh.k2 = tg.k2
         | WHERE tg.fold = 2 GROUP BY 1)
         |SELECT mu.k2 AS event_type, mu.n_train, nc.n_calib, ts.n_test,
         | round(qh.q4::DOUBLE / 10000.0, 4) AS qhat,
         | round(ts.inn::DOUBLE / ts.n_test::DOUBLE, 4) AS coverage
         |FROM mu JOIN nc ON nc.k2 = mu.k2 JOIN qh ON qh.k2 = mu.k2
         | JOIN ts ON ts.k2 = mu.k2""".stripMargin.replace("\n", " "),
    "q478_rfm" ->
      s"""WITH conv AS (SELECT user_id AS u,
         |  epoch_ns(ts) // 86400000000000 AS d,
         |  ${fp("value", "10000.0")} AS v4
         | FROM events WHERE event_type = 'purchase'
         |  AND value IS NOT NULL),
         |mx AS (SELECT max(d) AS dmax FROM conv),
         |per AS (SELECT u, max(d) AS lastd, count(*)::BIGINT AS frequency,
         |  sum(v4)::BIGINT AS m4 FROM conv GROUP BY 1),
         |pr AS (SELECT u, (mx.dmax - lastd)::BIGINT AS recency,
         |  frequency, m4 FROM per CROSS JOIN mx),
         |${quintileSql("(SELECT -recency AS m2 FROM pr)", "m2", "hr", "br", "r")},
         |${quintileSql("pr", "frequency", "hf", "bf", "f")},
         |${quintileSql("pr", "m4", "hm", "bm", "m")}
         |SELECT pr.u AS "user", pr.recency, pr.frequency,
         | round(pr.m4::DOUBLE / 10000.0, 4) + 0 AS monetary,
         | br.r, bf.f, bm.m,
         | (br.r * 100 + bf.f * 10 + bm.m)::BIGINT AS segment
         |FROM pr JOIN br ON br.mv = -pr.recency
         | JOIN bf ON bf.mv = pr.frequency
         | JOIN bm ON bm.mv = pr.m4""".stripMargin.replace("\n", " "),
    "q479_attribution" ->
      s"""WITH base AS (SELECT user_id AS u, epoch_ns(ts) AS t,
         |  event_type AS ty FROM events),
         |conv AS (SELECT u, t AS ct FROM base WHERE ty = 'purchase'),
         |tch AS (SELECT u AS u2, t, ty FROM base WHERE ty <> 'purchase'),
         |pairs AS (SELECT c.u, c.ct, t.t, t.ty FROM conv c
         | LEFT JOIN tch t ON t.u2 = c.u AND t.t < c.ct),
         |pc AS (SELECT u, ct, count(t)::BIGINT AS n
         | FROM pairs GROUP BY 1, 2),
         |cr AS (SELECT CASE WHEN pc.n > 0 THEN p.ty
         |   ELSE 'purchase' END AS channel,
         |  CASE WHEN pc.n > 0 THEN ${fp("1.0 / pc.n::DOUBLE", "100000000.0")}
         |   ELSE 100000000 END AS c8,
         |  p.u, p.ct
         | FROM pairs p JOIN pc USING (u, ct)),
         |tt AS (SELECT count(*)::BIGINT AS tot FROM conv)
         |SELECT channel,
         | count(DISTINCT (u, ct))::BIGINT AS conversions_touched,
         | round(sum(c8)::DOUBLE / 100000000.0, 4) AS credit,
         | round(sum(c8)::DOUBLE / 100000000.0 / tot::DOUBLE, 4) AS share
         |FROM cr CROSS JOIN tt GROUP BY channel, tot"""
        .stripMargin.replace("\n", " "),
    "q453_funnel" -> funnelOracle,
    "q476_funnel_stream" -> funnelOracle,
    "q454_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u,
        |  epoch_ns(ts) // 86400000000000 AS d FROM events),
        |ch AS (SELECT u, min(d) AS c FROM ud GROUP BY 1),
        |sz AS (SELECT c AS cohort, count(*)::BIGINT AS cohort_users
        | FROM ch GROUP BY 1),
        |ag AS (SELECT ch.c AS cohort, ud.d - ch.c AS age,
        |  count(*)::BIGINT AS users
        | FROM ud JOIN ch USING (u) WHERE ud.d - ch.c <= 14 GROUP BY 1, 2)
        |SELECT ag.cohort, ag.age, ag.users, sz.cohort_users,
        | round(ag.users::DOUBLE / sz.cohort_users::DOUBLE, 4) AS frac
        |FROM ag JOIN sz USING (cohort)""".stripMargin.replace("\n", " "),
    "q455_weighted_sample" ->
      s"""WITH b AS (SELECT event_type, event_id AS id,
         |  abs(value) + 1.0 AS w,
         |  ${fp(s"-ln((${h56("event_id::VARCHAR")} + 1)::DOUBLE " +
             "/ 72057594037927936.0) / (abs(value) + 1.0)", "100000000.0")}
         |   AS es8
         | FROM events WHERE value IS NOT NULL AND abs(value) + 1.0 > 0),
         |r AS (SELECT event_type, id, w, es8,
         |  row_number() OVER (PARTITION BY event_type
         |   ORDER BY es8 ASC, id ASC)::BIGINT AS rank FROM b)
         |SELECT event_type, id, round(w, 4) AS w,
         | round(es8::DOUBLE / 100000000.0, 4) + 0 AS es_key, rank
         |FROM r WHERE rank <= 20""".stripMargin.replace("\n", " "),
    "q456_countmin" ->
      s"""WITH it AS (SELECT user_id::VARCHAR AS item FROM events
         | WHERE user_id IS NOT NULL),
         |rb AS (SELECT item, v.r,
         |  ${h56("v.r::VARCHAR || ':' || item")} % 64 AS b
         | FROM it CROSS JOIN (VALUES (0), (1), (2), (3)) v(r)),
         |reg AS (SELECT r, b, count(*)::BIGINT AS reg
         | FROM rb GROUP BY 1, 2),
         |ex AS (SELECT item, count(*)::BIGINT AS exact
         | FROM it GROUP BY 1),
         |top AS (SELECT item, exact FROM (SELECT item, exact,
         |  row_number() OVER (ORDER BY exact DESC, item ASC) AS rk
         | FROM ex) WHERE rk <= 10),
         |th AS (SELECT item, exact, v.r,
         |  ${h56("v.r::VARCHAR || ':' || item")} % 64 AS b
         | FROM top CROSS JOIN (VALUES (0), (1), (2), (3)) v(r))
         |SELECT th.item, th.exact, min(reg.reg) AS est
         |FROM th JOIN reg USING (r, b)
         |GROUP BY 1, 2""".stripMargin.replace("\n", " "),
    "q457_temperature_mix" ->
      s"""WITH n AS (SELECT lang AS "group", count(*)::BIGINT AS n,
         |  ${fp("exp(0.5 * ln(count(*)::DOUBLE))", "100000000.0")} AS pw8
         | FROM documents GROUP BY 1),
         |t AS (SELECT sum(pw8)::HUGEINT AS tot8 FROM n),
         |sh AS (SELECT "group", n, pw8,
         |  pw8::DOUBLE / tot8::DOUBLE AS share FROM n CROSS JOIN t),
         |a0 AS (SELECT "group", n, pw8, share,
         |  least(floor(200.0 * share + 0.5)::BIGINT, n) AS alloc0
         | FROM sh),
         |c0 AS (SELECT "group", n, pw8, share, alloc0,
         |  alloc0 = n AS capped FROM a0),
         |lf AS (SELECT greatest(200 - sum(alloc0), 0)::BIGINT AS lft,
         |  sum(CASE WHEN NOT capped THEN pw8 ELSE 0 END)::HUGEINT AS open8
         | FROM c0)
         |SELECT "group", n,
         | round(floor(share * 10000.0 + 0.5) / 10000.0, 4) AS share,
         | CASE WHEN capped OR open8 = 0 THEN alloc0
         |  ELSE least(n, alloc0 + floor(lft::DOUBLE
         |   * (pw8::DOUBLE / open8::DOUBLE))::BIGINT) END AS alloc,
         | capped
         |FROM c0 CROSS JOIN lf""".stripMargin.replace("\n", " "),
    "q458_gmm2" -> gmm2Sql(3),
    "q460_isotropy" ->
      s"""WITH d AS (SELECT vec_id, i - 1 AS dim, embedding[i]::DOUBLE AS x
         | FROM (SELECT vec_id, embedding,
         |   unnest(range(1, len(embedding) + 1)) AS i
         |  FROM embeddings WHERE embedding IS NOT NULL)),
         |per AS (SELECT dim, count(*)::BIGINT AS n,
         |  sum(${fp("x", "1000000.0")}::HUGEINT) AS sx6,
         |  sum(${fp("x*x", "100000000.0")}::HUGEINT) AS sxx8
         | FROM d GROUP BY 1),
         |pm AS (SELECT dim, n, sxx8,
         |  sx6::DOUBLE/1000000.0/n::DOUBLE AS mean FROM per),
         |pv AS (SELECT dim, n, sxx8, mean,
         |  sxx8::DOUBLE/100000000.0/n::DOUBLE - mean*mean AS vr FROM pm),
         |ag AS (SELECT max(n)::BIGINT AS n, count(*)::BIGINT AS dims,
         |  sum(${fp("mean*mean", "100000000.0")})::BIGINT AS mn8,
         |  sum(sxx8)::HUGEINT AS sxx8t,
         |  sum(${fp("vr", "100000000.0")})::BIGINT AS v8t,
         |  max(${fp("vr", "100000000.0")})::BIGINT AS vmax8 FROM pv),
         |tp AS (SELECT min(dim)::BIGINT AS top_var_dim FROM pv, ag
         | WHERE ${fp("vr", "100000000.0")} = ag.vmax8),
         |o AS (SELECT n, dims, mn8::DOUBLE/100000000.0 AS mean_norm2,
         |  sxx8t::DOUBLE/100000000.0/n::DOUBLE AS avg_norm2,
         |  v8t, vmax8 FROM ag)
         |SELECT o.n, o.dims, round(mean_norm2, 4) AS mean_norm2,
         | round(avg_norm2, 4) AS avg_norm2,
         | round(CASE WHEN avg_norm2 > 0
         |   THEN 1.0 - mean_norm2 / avg_norm2 ELSE 0.0 END, 4) + 0
         |  AS isotropy,
         | tp.top_var_dim,
         | round(CASE WHEN v8t > 0 THEN vmax8::DOUBLE
         |   / (v8t::DOUBLE / dims::DOUBLE) ELSE 0.0 END, 4) AS var_ratio
         |FROM o CROSS JOIN tp""".stripMargin.replace("\n", " "),
    "q461_ttr" ->
      """WITH c AS (SELECT grp, tk, count(*)::BIGINT AS c FROM
        |  (SELECT source AS grp,
        |    unnest(regexp_extract_all(lower(text), '\S+')) AS tk
        |   FROM documents) GROUP BY 1, 2),
        |g AS (SELECT grp, sum(c)::BIGINT AS tokens,
        |  count(*)::BIGINT AS types,
        |  sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax
        | FROM c GROUP BY 1)
        |SELECT grp AS "group", tokens, types,
        | round(types::DOUBLE / tokens::DOUBLE, 4) AS ttr, hapax,
        | round(hapax::DOUBLE / types::DOUBLE, 4) AS hapax_frac
        |FROM g""".stripMargin.replace("\n", " "),
    "q462_charclass_drift" -> {
      def pq(cc: String, tc: String) = (
        s"($cc::DOUBLE / n_chars::DOUBLE)",
        s"($tc::DOUBLE / tn::DOUBLE)")
      def klT(pe: String, qe: String) = fp(
        s"(CASE WHEN $pe > 0 THEN $pe * ln($pe / (($pe + $qe) / 2.0)) ELSE 0.0 END" +
          s" + CASE WHEN $qe > 0 THEN $qe * ln($qe / (($pe + $qe) / 2.0)) ELSE 0.0 END) / 2.0",
        "100000000.0")
      val terms = Seq(("ca", "ta"), ("cd", "td"), ("cs", "ts"), ("co", "tq"))
        .map { case (a, b) => val (pe, qe) = pq(a, b); klT(pe, qe) }
        .mkString(" + ")
      s"""WITH r AS (SELECT source AS grp,
         |  len(regexp_extract_all(lower(coalesce(text, '')),
         |    '[a-z]'))::BIGINT AS a,
         |  len(regexp_extract_all(lower(coalesce(text, '')),
         |    '[0-9]'))::BIGINT AS d,
         |  len(regexp_extract_all(lower(coalesce(text, '')),
         |    '\\s'))::BIGINT AS s,
         |  length(lower(coalesce(text, '')))::BIGINT AS l
         | FROM documents),
         |per AS (SELECT grp, sum(a)::BIGINT AS ca, sum(d)::BIGINT AS cd,
         |  sum(s)::BIGINT AS cs, sum(l - a - d - s)::BIGINT AS co
         | FROM r GROUP BY 1),
         |pn AS (SELECT grp, ca, cd, cs, co,
         |  (ca + cd + cs + co)::BIGINT AS n_chars FROM per
         | WHERE ca + cd + cs + co > 0),
         |tot AS (SELECT sum(ca)::BIGINT AS ta, sum(cd)::BIGINT AS td,
         |  sum(cs)::BIGINT AS ts, sum(co)::BIGINT AS tq,
         |  sum(n_chars)::BIGINT AS tn FROM pn)
         |SELECT grp AS "group", n_chars,
         | round(ca::DOUBLE / n_chars::DOUBLE, 4) AS p_alpha,
         | round(cd::DOUBLE / n_chars::DOUBLE, 4) AS p_digit,
         | round(cs::DOUBLE / n_chars::DOUBLE, 4) AS p_space,
         | round(co::DOUBLE / n_chars::DOUBLE, 4) AS p_other,
         | round(($terms)::DOUBLE / 100000000.0, 4) + 0 AS js
         |FROM pn CROSS JOIN tot""".stripMargin.replace("\n", " ")
    },
    "q463_ngram_novelty" ->
      s"""WITH b AS (SELECT doc_id AS id, coalesce(text, '') AS t
         | FROM documents),
         |g AS (SELECT id, ${h56("gr")} AS h FROM
         |  (SELECT id, unnest(list_distinct(list_transform(
         |     range(1, length(t) - 7 + 1), i -> substr(t, i, 8)))) AS gr
         |   FROM b WHERE length(t) >= 8)),
         |f AS (SELECT h, min(id) AS fid FROM g GROUP BY 1),
         |p AS (SELECT g.id, count(*)::BIGINT AS distinct_grams,
         |  sum(CASE WHEN f.fid = g.id THEN 1 ELSE 0 END)::BIGINT
         |   AS new_grams
         | FROM g JOIN f USING (h) GROUP BY 1)
         |SELECT b.id, coalesce(p.distinct_grams, 0)::BIGINT
         |  AS distinct_grams,
         | coalesce(p.new_grams, 0)::BIGINT AS new_grams,
         | round(CASE WHEN coalesce(p.distinct_grams, 0) > 0
         |  THEN p.new_grams::DOUBLE / p.distinct_grams::DOUBLE
         |  ELSE 1.0 END, 4) AS novelty
         |FROM b LEFT JOIN p ON p.id = b.id"""
        .stripMargin.replace("\n", " "),
    "q474_int8_quant" ->
      s"""WITH d AS (SELECT i - 1 AS dim, embedding[i]::DOUBLE AS x
         | FROM (SELECT embedding,
         |   unnest(range(1, len(embedding) + 1)) AS i
         |  FROM embeddings WHERE embedding IS NOT NULL)),
         |mm AS (SELECT dim, min(x) AS vmin, max(x) AS vmax
         | FROM d GROUP BY 1),
         |e AS (SELECT d.dim, mm.vmin, mm.vmax,
         |  CASE WHEN mm.vmax > mm.vmin THEN d.x - (mm.vmin
         |   + least(255, greatest(0, floor((d.x - mm.vmin)
         |      / ((mm.vmax - mm.vmin) / 255.0) + 0.5)::BIGINT))
         |     * ((mm.vmax - mm.vmin) / 255.0))
         |  ELSE 0.0 END AS err
         | FROM d JOIN mm USING (dim)),
         |g AS (SELECT dim, vmin, vmax, count(*)::BIGINT AS n,
         |  sum(${fp("err * err", "1000000000000.0")}::HUGEINT) AS s12,
         |  max(${fp("abs(err)", "100000000.0")}) AS m8
         | FROM e GROUP BY 1, 2, 3)
         |SELECT dim::BIGINT AS dim, round(vmin, 4) + 0 AS vmin,
         | round(vmax, 4) + 0 AS vmax,
         | round(s12::DOUBLE / 1000000.0 / n::DOUBLE, 4) AS mse_e6,
         | round(m8::DOUBLE / 100000.0, 4) AS max_err_e3
         |FROM g""".stripMargin.replace("\n", " "),
    "q475_dedup_budget" ->
      """WITH h AS (SELECT doc_id, source, md5(text) AS h,
        |  len(regexp_extract_all(lower(text), '\S+'))::BIGINT AS n
        | FROM documents),
        |k AS (SELECT doc_id, source, n,
        |  doc_id = min(doc_id) OVER (PARTITION BY h) AS keep FROM h)
        |SELECT source, count(*)::BIGINT AS docs,
        | sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS docs_kept,
        | sum(n)::BIGINT AS tokens,
        | sum(CASE WHEN keep THEN n ELSE 0 END)::BIGINT AS tokens_kept,
        | round(sum(CASE WHEN keep THEN n ELSE 0 END)::DOUBLE
        |   / sum(n)::DOUBLE, 4) AS token_keep_frac
        |FROM k GROUP BY 1""".stripMargin.replace("\n", " "),
    "q469_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u,
        |  epoch_ns(ts) // 86400000000000 AS d FROM events),
        |up AS (SELECT u, d, floor(d::DOUBLE / 7.0)::BIGINT AS p FROM ud),
        |daily AS (SELECT p, d, count(*)::BIGINT AS dau
        | FROM up GROUP BY 1, 2),
        |per AS (SELECT p AS period, count(*)::BIGINT AS days_active,
        |  sum(dau)::BIGINT AS sdau FROM daily GROUP BY 1),
        |wk AS (SELECT p AS period, count(*)::BIGINT AS wau FROM
        |  (SELECT DISTINCT p, u FROM up) GROUP BY 1)
        |SELECT per.period, per.days_active, wk.wau,
        | round(sdau::DOUBLE / days_active::DOUBLE, 4) AS avg_dau,
        | round(sdau::DOUBLE / days_active::DOUBLE / wau::DOUBLE, 4)
        |  AS stickiness
        |FROM per JOIN wk USING (period)""".stripMargin.replace("\n", " "),
    "q470_hill_tail" ->
      s"""WITH b AS (SELECT event_type AS k2, event_id, value::DOUBLE AS x
         | FROM events WHERE value IS NOT NULL AND value > 0),
         |r AS (SELECT k2, event_id, x, row_number() OVER
         |  (PARTITION BY k2 ORDER BY x DESC, event_id ASC) AS rk FROM b),
         |t AS (SELECT k2, x AS xt FROM r WHERE rk = 51),
         |s AS (SELECT r.k2, max(t.xt) AS x_thresh,
         |  sum(${fp("ln(r.x / t.xt)", "100000000.0")})::BIGINT AS s8
         | FROM r JOIN t ON t.k2 = r.k2 WHERE r.rk <= 50 GROUP BY 1)
         |SELECT k2 AS event_type, 50::BIGINT AS k,
         | round(x_thresh, 4) AS x_thresh,
         | round(CASE WHEN s8 > 0
         |  THEN 50.0 / (s8::DOUBLE / 100000000.0) ELSE 0.0 END, 4)
         |  AS alpha FROM s""".stripMargin.replace("\n", " "),
    "q471_neyman" ->
      s"""WITH p AS (SELECT event_type AS stratum, count(*)::BIGINT AS n,
         |  sum(${fp("value", "10000.0")}::HUGEINT) AS sx4,
         |  sum(${fp("value*value", "10000.0")}::HUGEINT) AS sxx4
         | FROM events WHERE value IS NOT NULL GROUP BY 1),
         |q AS (SELECT stratum, n, sqrt(greatest(
         |  sxx4::DOUBLE/10000.0/n::DOUBLE
         |   - (sx4::DOUBLE/10000.0/n::DOUBLE)
         |     * (sx4::DOUBLE/10000.0/n::DOUBLE), 0.0)) AS std FROM p),
         |w AS (SELECT stratum, n, std,
         |  ${fp("n::DOUBLE * std", "100000000.0")} AS w8 FROM q),
         |t AS (SELECT sum(w8)::HUGEINT AS t8 FROM w)
         |SELECT stratum, n, round(std, 4) AS std,
         | CASE WHEN t8 > 0 THEN least(n,
         |   floor(500.0 * (w8::DOUBLE / t8::DOUBLE) + 0.5)::BIGINT)
         |  ELSE 0 END AS alloc
         |FROM w CROSS JOIN t""".stripMargin.replace("\n", " "),
    "q472_stratified_split" ->
      """WITH b AS (SELECT doc_id AS id, lang AS stratum FROM documents),
        |r AS (SELECT id, stratum,
        |  row_number() OVER (PARTITION BY stratum
        |   ORDER BY md5(id::VARCHAR), id)::BIGINT AS rk,
        |  count(*) OVER (PARTITION BY stratum)::BIGINT AS n FROM b)
        |SELECT id, stratum,
        | CASE WHEN rk <= floor(0.8::DOUBLE * n::DOUBLE)::BIGINT
        |   THEN 'train'
        |  WHEN rk <= floor((0.8::DOUBLE + 0.1::DOUBLE)
        |    * n::DOUBLE)::BIGINT THEN 'val'
        |  ELSE 'test' END AS split
        |FROM r""".stripMargin.replace("\n", " "),
    "q473_poisson_bootstrap" ->
      s"""WITH base AS (SELECT event_type, event_id::VARCHAR AS id,
         |  value::DOUBLE AS x FROM events WHERE value IS NOT NULL),
         |eb AS (SELECT event_type, id, x, unnest(range(0, 32)) AS b
         | FROM base),
         |uw AS (SELECT event_type, b, x,
         |  (${h56("b::VARCHAR || ':' || id")} + 1)::DOUBLE
         |   / 72057594037927936.0 AS u FROM eb),
         |ww AS (SELECT event_type, b, x,
         | (CASE WHEN u < exp(-1.0) * 1.0 THEN 0
         |   WHEN u < exp(-1.0) * 2.0 THEN 1
         |   WHEN u < exp(-1.0) * 2.5 THEN 2
         |   WHEN u < exp(-1.0) * (8.0/3.0) THEN 3
         |   WHEN u < exp(-1.0) * (65.0/24.0) THEN 4
         |   WHEN u < exp(-1.0) * (163.0/60.0) THEN 5
         |   WHEN u < exp(-1.0) * (1957.0/720.0) THEN 6
         |   ELSE 7 END)::BIGINT AS w FROM uw),
         |rep AS (SELECT event_type, b, sum(w)::BIGINT AS sw,
         |  sum((w * ${fp("x", "10000.0")})::HUGEINT) AS swx4
         | FROM ww GROUP BY 1, 2),
         |mb AS (SELECT event_type, b, CASE WHEN sw > 0
         |  THEN swx4::DOUBLE/10000.0/sw::DOUBLE ELSE 0.0 END AS m
         | FROM rep),
         |m8 AS (SELECT event_type, ${fp("m", "100000000.0")} AS mb8
         | FROM mb),
         |sa AS (SELECT event_type, count(*)::BIGINT AS nb,
         |  sum(mb8)::BIGINT AS s1, sum(mb8::HUGEINT * mb8) AS s2
         | FROM m8 GROUP BY 1),
         |sm AS (SELECT event_type, nb, s2,
         |  s1::DOUBLE/100000000.0/nb::DOUBLE AS m1 FROM sa),
         |se AS (SELECT event_type, sqrt(greatest(
         |  s2::DOUBLE/10000000000000000.0/nb::DOUBLE - m1*m1, 0.0))
         |  AS se_boot FROM sm),
         |ov AS (SELECT event_type, count(*)::BIGINT AS n,
         |  sum(${fp("x", "10000.0")}::HUGEINT)::DOUBLE/10000.0
         |   /count(*)::DOUBLE AS mean FROM base GROUP BY 1)
         |SELECT ov.event_type, ov.n, round(ov.mean, 4) + 0 AS mean,
         | round(se.se_boot, 4) AS se_boot
         |FROM ov JOIN se USING (event_type)"""
        .stripMargin.replace("\n", " "),
    "q466_isotonic" ->
      s"""WITH e AS (SELECT
         |  ${fp("((doc_id*37 + n_chars) % 1000)::DOUBLE / 1000.0", "100.0")}
         |   AS s,
         |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
         |h AS (SELECT s, count(*)::BIGINT AS n, sum(y)::BIGINT AS pos
         | FROM e GROUP BY 1),
         |c AS (SELECT s, n, pos,
         |  sum(n) OVER (ORDER BY s ASC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
         |  sum(pos) OVER (ORDER BY s ASC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
         | FROM h),
         |lo AS (SELECT s AS sj, cn - n AS bnj, cp - pos AS bpj FROM c),
         |hi AS (SELECT s AS sk, cn AS cnk, cp AS cpk FROM c),
         |mm AS (SELECT sj,
         |  min((cpk - bpj)::DOUBLE / (cnk - bnj)::DOUBLE) AS m
         | FROM lo JOIN hi ON sj <= sk GROUP BY 1),
         |ii AS (SELECT sj, max(m) OVER (ORDER BY sj ASC
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iso
         | FROM mm)
         |SELECT round(h.s::DOUBLE / 100.0, 4) AS score, h.n, h.pos,
         | round(ii.iso, 4) AS iso
         |FROM h JOIN ii ON ii.sj = h.s""".stripMargin.replace("\n", " "),
    "q467_funnel_timing" ->
      """WITH s1 AS (SELECT user_id AS u, min(epoch_ns(ts)) AS t
        | FROM events WHERE event_type = 'view' GROUP BY 1),
        |n2 AS (SELECT e.user_id AS u, min(epoch_ns(e.ts)) AS t2,
        |  max(s1.t) AS tp
        | FROM events e JOIN s1 ON e.user_id = s1.u
        |  AND epoch_ns(e.ts) > s1.t
        | WHERE e.event_type = 'click' GROUP BY 1),
        |n3 AS (SELECT e.user_id AS u, min(epoch_ns(e.ts)) AS t2,
        |  max(n2.t2) AS tp
        | FROM events e JOIN n2 ON e.user_id = n2.u
        |  AND epoch_ns(e.ts) > n2.t2
        | WHERE e.event_type = 'purchase' GROUP BY 1),
        |r AS (SELECT 2::BIGINT AS step_idx, 'click' AS step,
        |   count(*)::BIGINT AS users, sum((t2 - tp)::HUGEINT) AS g
        |  FROM n2
        | UNION ALL SELECT 3::BIGINT, 'purchase', count(*)::BIGINT,
        |   sum((t2 - tp)::HUGEINT) FROM n3)
        |SELECT step_idx, step, users,
        | round(CASE WHEN users > 0
        |  THEN g::DOUBLE / 1000000000.0 / users::DOUBLE
        |  ELSE 0.0 END, 4) AS avg_gap_sec
        |FROM r""".stripMargin.replace("\n", " "),
    "q468_vocab_overlap" ->
      s"""WITH gt AS (SELECT DISTINCT g, ${h56("tk")} AS h FROM
         |  (SELECT source AS g,
         |    unnest(regexp_extract_all(lower(text), '\\S+')) AS tk
         |   FROM documents)),
         |sz AS (SELECT g, count(*)::BIGINT AS sz FROM gt GROUP BY 1),
         |it AS (SELECT x.g AS a, y.g AS b, count(*)::BIGINT AS inter
         | FROM gt x JOIN gt y ON x.h = y.h AND x.g < y.g GROUP BY 1, 2)
         |SELECT it.a, it.b, za.sz AS sz_a, zb.sz AS sz_b, it.inter,
         | round(it.inter::DOUBLE
         |   / (za.sz + zb.sz - it.inter)::DOUBLE, 4) AS jaccard
         |FROM it JOIN sz za ON za.g = it.a
         | JOIN sz zb ON zb.g = it.b""".stripMargin.replace("\n", " "),
    "q465_betweenness" -> {
      val maxDepth = 4
      val fwd = (1 to maxDepth).map { t =>
        s"""f$t AS MATERIALIZED (SELECT w.source, e.dst AS node, sum(w.sig)::BIGINT AS sig
           | FROM (SELECT * FROM v${t - 1} WHERE d = ${t - 1}) w
           | JOIN edges e ON e.src = w.node
           | LEFT JOIN v${t - 1} x ON x.source = w.source AND x.node = e.dst
           | WHERE x.node IS NULL GROUP BY 1, 2),
           |v$t AS MATERIALIZED (SELECT source, node, d, sig FROM v${t - 1}
           | UNION ALL SELECT source, node, $t AS d, sig FROM f$t)"""
          .stripMargin.replace("\n", " ")
      }.mkString(", ")
      val term = fp("(v.sig::DOUBLE / w.sig::DOUBLE) * " +
        "(1.0 + w.dl8::DOUBLE / 100000000.0)", "100000000.0")
      val bwd = (maxDepth - 1 to 1 by -1).map { t =>
        s"""bd$t AS MATERIALIZED (SELECT a.source, a.node, a.sig,
           |  coalesce(c.dl8, 0)::BIGINT AS dl8
           | FROM (SELECT source, node, sig FROM v$maxDepth WHERE d = $t) a
           | LEFT JOIN (SELECT v.source, v.node, sum($term)::BIGINT AS dl8
           |   FROM (SELECT source, node, sig FROM v$maxDepth
           |     WHERE d = $t) v
           |   JOIN edges e ON e.src = v.node
           |   JOIN bd${t + 1} w ON w.source = v.source AND w.node = e.dst
           |   GROUP BY 1, 2) c
           |  ON c.source = a.source AND c.node = a.node)"""
          .stripMargin.replace("\n", " ")
      }.mkString(", ")
      val union = (maxDepth to 1 by -1)
        .map(t => s"SELECT source, node, dl8 FROM bd$t")
        .mkString(" UNION ALL ")
      s"""WITH ${MultiQueries.chainSql(3)},
         |nodes AS (SELECT src AS node FROM edges
         |  UNION SELECT dst FROM edges),
         |srcs AS (SELECT node AS source FROM nodes
         |  ORDER BY md5(node), node LIMIT 8),
         |v0 AS (SELECT source, source AS node, 0 AS d, 1::BIGINT AS sig
         | FROM srcs),
         |$fwd,
         |bd$maxDepth AS MATERIALIZED (SELECT source, node, sig, 0::BIGINT AS dl8
         | FROM v$maxDepth WHERE d = $maxDepth),
         |$bwd
         |SELECT node,
         | round(sum(dl8)::DOUBLE / 100000000.0, 4) AS betweenness
         |FROM ($union) GROUP BY 1""".stripMargin.replace("\n", " ")
    },
    "q464_trunc_loss" ->
      """WITH c AS (SELECT source AS grp,
        |  len(regexp_extract_all(lower(text), '\S+'))::BIGINT AS n
        | FROM documents),
        |g AS (SELECT grp, count(*)::BIGINT AS docs,
        |  sum(CASE WHEN n > 128 THEN 1 ELSE 0 END)::BIGINT
        |   AS docs_truncated,
        |  sum(n)::BIGINT AS tokens,
        |  sum(greatest(n - 128, 0))::BIGINT AS tokens_lost
        | FROM c GROUP BY 1)
        |SELECT grp AS "group", docs, docs_truncated, tokens, tokens_lost,
        | round(CASE WHEN tokens > 0
        |  THEN tokens_lost::DOUBLE / tokens::DOUBLE ELSE 0.0 END, 4)
        |  AS loss_frac
        |FROM g""".stripMargin.replace("\n", " "),
    "q485_loop" -> {
      // Abramowitz-Stegun erf, the exact float-op order of Proximity.erfPos
      def erfp(x: String) =
        s"(1.0 - (((((1.061405429*(1.0/(1.0+0.3275911*($x))) - 1.453152027)" +
          s"*(1.0/(1.0+0.3275911*($x))) + 1.421413741)" +
          s"*(1.0/(1.0+0.3275911*($x))) - 0.284496736)" +
          s"*(1.0/(1.0+0.3275911*($x))) + 0.254829592)" +
          s"*(1.0/(1.0+0.3275911*($x))))*exp(-(($x)*($x))))"
      s"""WITH $knnCte,
         |pd AS (SELECT src, 3.0*sqrt(
         |  sum(${fp("dist*dist", "100000000.0")}::HUGEINT)::DOUBLE
         |   /100000000.0/5.0) AS pdist FROM nn GROUP BY 1),
         |ep AS (SELECT nn.src,
         |  sum(${fp("pd.pdist", "100000000.0")}::HUGEINT)::DOUBLE
         |   /100000000.0/5.0 AS epd
         | FROM nn JOIN pd ON pd.src = nn.trg GROUP BY 1),
         |pl AS (SELECT pd.src, CASE WHEN ep.epd > 0
         |  THEN pd.pdist/ep.epd - 1.0 ELSE 0.0 END AS plof
         | FROM pd JOIN ep USING (src)),
         |np AS (SELECT 3.0*sqrt(
         |  sum(${fp("plof*plof", "100000000.0")}::HUGEINT)::DOUBLE
         |   /100000000.0/count(*)::DOUBLE) AS nplof FROM pl)
         |SELECT src, round(plof, 4) + 0 AS plof,
         | round(CASE WHEN nplof <= 0 THEN 0.0
         |  ELSE greatest(0.0, CASE WHEN plof/(nplof*sqrt(2.0)) >= 0
         |   THEN ${erfp("plof/(nplof*sqrt(2.0))")}
         |   ELSE -${erfp("-(plof/(nplof*sqrt(2.0)))")} END) END, 4) + 0
         |  AS loopProb
         |FROM pl CROSS JOIN np""".stripMargin.replace("\n", " ")
    },
    "q486_fastabod" ->
      s"""WITH $knnCte,
         |pr AS (SELECT n1.src, n1.trg AS a, n2.trg AS b
         | FROM nn n1 JOIN nn n2 USING (src) WHERE n1.trg < n2.trg),
         |d AS (SELECT pr.src,
         |  list_dot_product(va.embedding::DOUBLE[], vb.embedding::DOUBLE[]) AS ab,
         |  list_dot_product(va.embedding::DOUBLE[], vp.embedding::DOUBLE[]) AS ap,
         |  list_dot_product(vb.embedding::DOUBLE[], vp.embedding::DOUBLE[]) AS bp,
         |  list_dot_product(va.embedding::DOUBLE[], va.embedding::DOUBLE[]) AS aa,
         |  list_dot_product(vb.embedding::DOUBLE[], vb.embedding::DOUBLE[]) AS bb,
         |  list_dot_product(vp.embedding::DOUBLE[], vp.embedding::DOUBLE[]) AS pp
         | FROM pr JOIN embeddings vp ON vp.vec_id = pr.src
         |  JOIN embeddings va ON va.vec_id = pr.a
         |  JOIN embeddings vb ON vb.vec_id = pr.b),
         |t AS (SELECT src, aa - 2.0*ap + pp AS na2, bb - 2.0*bp + pp AS nb2,
         |  ab - ap - bp + pp AS num FROM d),
         |w AS (SELECT src,
         |  CASE WHEN na2 > 0 AND nb2 > 0
         |   THEN 1.0/sqrt(na2*nb2) ELSE 0.0 END AS w,
         |  CASE WHEN na2 > 0 AND nb2 > 0
         |   THEN num/(na2*nb2) ELSE 0.0 END AS x FROM t),
         |g AS (SELECT src,
         |  sum(${fp("w", "1000000000000.0")}::HUGEINT) AS sw,
         |  sum(${fp("w*x", "1000000000000.0")}::HUGEINT) AS swx,
         |  sum(${fp("w*x*x", "1000000000000.0")}::HUGEINT) AS swxx
         | FROM w GROUP BY 1)
         |SELECT src, round(swxx::DOUBLE/sw::DOUBLE
         |  - (swx::DOUBLE/sw::DOUBLE)*(swx::DOUBLE/sw::DOUBLE), 4) + 0
         |  AS abof
         |FROM g WHERE sw > 0""".stripMargin.replace("\n", " "),
    "q487_moore_lewis" ->
      s"""WITH tk AS (SELECT doc_id, lang, $toksSql AS t FROM documents),
         |tok AS (SELECT doc_id, unnest(t) AS tok FROM tk),
         |ci AS (SELECT tok, count(*)::BIGINT AS cin FROM tok
         | WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
         | GROUP BY 1),
         |cg AS (SELECT tok, count(*)::BIGINT AS cgen FROM tok GROUP BY 1),
         |m AS (SELECT coalesce(ci.tok, cg.tok) AS tok,
         |  coalesce(cin, 0) AS cin, coalesce(cgen, 0) AS cgen
         | FROM ci FULL OUTER JOIN cg ON ci.tok = cg.tok),
         |tt AS (SELECT sum(cin)::BIGINT AS tin, sum(cgen)::BIGINT AS tgen,
         |  count(*)::BIGINT AS v FROM m),
         |gap AS (SELECT tok.doc_id,
         |  (-ln((coalesce(m.cin, 0)::DOUBLE + 1.0)
         |    / (tt.tin::DOUBLE + 1.0 * tt.v::DOUBLE)))
         |  - (-ln((coalesce(m.cgen, 0)::DOUBLE + 1.0)
         |    / (tt.tgen::DOUBLE + 1.0 * tt.v::DOUBLE))) AS d
         | FROM tok LEFT JOIN m ON m.tok = tok.tok CROSS JOIN tt),
         |ag AS (SELECT doc_id, count(*)::BIGINT AS nTok,
         |  sum(${fp("d", "100000000.0")}::HUGEINT) AS s8 FROM gap GROUP BY 1)
         |SELECT d.doc_id, coalesce(ag.nTok, 0)::BIGINT AS nTok,
         | round(coalesce(ag.s8::DOUBLE / 100000000.0
         |   / ag.nTok::DOUBLE, 0.0), 4) + 0 AS ceDiff
         |FROM documents d LEFT JOIN ag USING (doc_id)"""
        .stripMargin.replace("\n", " "),
    "q488_kn_lm" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
         |bb AS (SELECT doc_id, t[i] AS ctx, t[i+1] AS w
         | FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
         |   FROM tk WHERE len(t) >= 2)),
         |cab AS (SELECT ctx, w, count(*)::BIGINT AS cab
         | FROM bb GROUP BY 1, 2),
         |cx AS (SELECT ctx, sum(cab)::BIGINT AS ca,
         |  count(*)::BIGINT AS n1fwd FROM cab GROUP BY 1),
         |cw AS (SELECT w, count(*)::BIGINT AS n1bwd FROM cab GROUP BY 1),
         |sc AS (SELECT count(*)::BIGINT AS nTypes,
         |  (SELECT count(*)::BIGINT FROM cw) AS v FROM cab),
         |p AS (SELECT bb.doc_id,
         |  CASE WHEN cx.ca IS NOT NULL AND cx.ca > 0
         |   THEN greatest(coalesce(cab.cab, 0)::DOUBLE - 0.75, 0.0)
         |     / cx.ca::DOUBLE
         |    + 0.75 * cx.n1fwd::DOUBLE / cx.ca::DOUBLE
         |      * ((coalesce(cw.n1bwd, 0)::DOUBLE + 1.0)
         |        / (sc.nTypes::DOUBLE + sc.v::DOUBLE))
         |   ELSE (coalesce(cw.n1bwd, 0)::DOUBLE + 1.0)
         |    / (sc.nTypes::DOUBLE + sc.v::DOUBLE) END AS pr
         | FROM bb LEFT JOIN cab USING (ctx, w) LEFT JOIN cx USING (ctx)
         |  LEFT JOIN cw USING (w) CROSS JOIN sc),
         |ag AS (SELECT doc_id, count(*)::BIGINT AS nGrams,
         |  sum(${fp("-ln(pr)", "100000000.0")}::HUGEINT) AS s8
         | FROM p GROUP BY 1)
         |SELECT d.doc_id, coalesce(ag.nGrams, 0)::BIGINT AS nGrams,
         | round(coalesce(ag.s8::DOUBLE / 100000000.0
         |   / ag.nGrams::DOUBLE, 0.0), 4) + 0 AS avgNll
         |FROM documents d LEFT JOIN ag USING (doc_id)"""
        .stripMargin.replace("\n", " "),
    "q489_kcenter" -> {
      // unrolled greedy walk, rounds 2..6: min-dist to the selected
      // set -> 8dp-quantized argmax (ties -> smaller id), replaying
      // Similarity.kCenterGreedy's per-round jobs
      val rounds = (2 to 6).map { r =>
        s"""m$r AS (SELECT e.vec_id AS id,
           |  min(list_distance(e.embedding::DOUBLE[],
           |    ce.embedding::DOUBLE[])) AS md
           | FROM embeddings e JOIN embeddings ce
           |  ON ce.vec_id IN (SELECT id FROM c${r - 1})
           |   AND e.vec_id <> ce.vec_id
           | GROUP BY 1),
           |p$r AS (SELECT $r::BIGINT AS rank, id, md AS radius FROM m$r
           | WHERE id NOT IN (SELECT id FROM c${r - 1})
           | ORDER BY ${fp("md", "100000000.0")} DESC, id LIMIT 1),
           |c$r AS (SELECT id FROM c${r - 1}
           | UNION ALL SELECT id FROM p$r)""".stripMargin
      }.mkString(",\n")
      val union = (1 to 6).map(r => s"SELECT * FROM p$r")
        .mkString(" UNION ALL ")
      s"""WITH p1 AS (SELECT 1::BIGINT AS rank, min(vec_id)::BIGINT AS id,
         |  0.0::DOUBLE AS radius FROM embeddings),
         |c1 AS (SELECT id FROM p1),
         |$rounds
         |SELECT rank, id, round(radius, 4) + 0 AS radius
         |FROM ($union)""".stripMargin.replace("\n", " ")
    },
    "q490_forecast_accuracy" ->
      s"""WITH e AS (SELECT event_type, event_id AS seq, value::DOUBLE AS y
         | FROM events WHERE value IS NOT NULL),
         |l AS (SELECT event_type, seq, y,
         |  lag(y, 1) OVER w AS l1, lag(y, 2) OVER w AS l2,
         |  lag(y, 3) OVER w AS l3
         | FROM e WINDOW w AS (PARTITION BY event_type ORDER BY seq)),
         |r AS (SELECT event_type, y, (l1 + l2 + l3)/3.0 AS f, l1
         | FROM l WHERE l1 IS NOT NULL AND l2 IS NOT NULL
         |  AND l3 IS NOT NULL),
         |a AS (SELECT event_type, count(*)::BIGINT AS n,
         |  sum(${fp("abs(f - y)", "100000000.0")}::HUGEINT) AS sae,
         |  sum(${fp("(f - y)*(f - y)", "100000000.0")}::HUGEINT) AS sse,
         |  sum(${fp(
          "CASE WHEN abs(y) + abs(f) > 0 THEN 2.0*abs(f - y)/(abs(y) + abs(f)) ELSE 0.0 END",
          "100000000.0")}::HUGEINT) AS ssm,
         |  sum(${fp("abs(y - l1)", "100000000.0")}::HUGEINT) AS snv
         | FROM r GROUP BY 1)
         |SELECT event_type, n,
         | round(sae::DOUBLE/100000000.0/n::DOUBLE, 4) + 0 AS mae,
         | round(sqrt(sse::DOUBLE/100000000.0/n::DOUBLE), 4) + 0 AS rmse,
         | round(ssm::DOUBLE/100000000.0/n::DOUBLE, 4) + 0 AS smape,
         | round(CASE WHEN snv > 0 THEN sae::DOUBLE/snv::DOUBLE
         |  ELSE 0.0 END, 4) + 0 AS mase
         |FROM a""".stripMargin.replace("\n", " "),
    "q491_pinball" ->
      s"""WITH b AS (SELECT event_type, event_id, value::DOUBLE AS y
         | FROM events WHERE value IS NOT NULL),
         |h AS (SELECT event_type, ${fp("y", "10000.0")} AS r4,
         |  count(*)::BIGINT AS ct FROM b WHERE event_id % 2 = 0
         | GROUP BY 1, 2),
         |c AS (SELECT event_type, r4, ct,
         |  sum(ct) OVER (PARTITION BY event_type ORDER BY r4 ASC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |  sum(ct) OVER (PARTITION BY event_type) AS n FROM h),
         |t AS (SELECT unnest([0.1, 0.5, 0.9]) AS tau),
         |q AS (SELECT event_type, tau, min(r4) AS q4
         | FROM c CROSS JOIN t
         | WHERE cum >= greatest(1, ceil(tau * n::DOUBLE)::BIGINT)
         | GROUP BY 1, 2),
         |s AS (SELECT b.event_type, q.tau, q.q4::DOUBLE/10000.0 AS qhat,
         |  b.y FROM b JOIN q ON q.event_type = b.event_type
         | WHERE b.event_id % 2 = 1),
         |a AS (SELECT event_type, tau, qhat, count(*)::BIGINT AS n_test,
         |  sum(${fp(
          "greatest(tau*(y - qhat), (tau - 1.0)*(y - qhat))",
          "100000000.0")}::HUGEINT) AS sl,
         |  sum(CASE WHEN y <= qhat THEN 1 ELSE 0 END)::BIGINT AS cov
         | FROM s GROUP BY 1, 2, 3)
         |SELECT event_type, round(tau, 4) AS tau, round(qhat, 4) AS qhat,
         | n_test, round(sl::DOUBLE/100000000.0/n_test::DOUBLE, 4) + 0
         |  AS pinball,
         | round(cov::DOUBLE/n_test::DOUBLE, 4) AS coverage
         |FROM a""".stripMargin.replace("\n", " "),
    "q492_binseg" -> {
      // L2 gain from exact integer prefix sums — SeriesKernels.binSegL2's
      // float-op order: (d1*d1)/n1 + (d2*d2)/n2 - (dt*dt)/nt
      def g(ql: String, qc: String, qr: String, l: String, c: String,
          r: String) =
        s"((($qc) - ($ql))::DOUBLE * (($qc) - ($ql))::DOUBLE)" +
          s"/(($c) - ($l) + 1)::DOUBLE" +
          s" + ((($qr) - ($qc))::DOUBLE * (($qr) - ($qc))::DOUBLE)" +
          s"/(($r) - ($c))::DOUBLE" +
          s" - ((($qr) - ($ql))::DOUBLE * (($qr) - ($ql))::DOUBLE)" +
          s"/(($r) - ($l) + 1)::DOUBLE"
      s"""WITH e AS (SELECT event_type AS k, event_id AS seq,
         |  value::DOUBLE AS y FROM events WHERE value IS NOT NULL),
         |b AS (SELECT k, seq, ${fp("y", "10000.0")} AS q,
         |  row_number() OVER (PARTITION BY k ORDER BY seq)::BIGINT AS rn
         | FROM e),
         |p AS (SELECT k, rn,
         |  sum(q) OVER (PARTITION BY k ORDER BY rn ASC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS qc,
         |  count(*) OVER (PARTITION BY k) AS n,
         |  sum(q) OVER (PARTITION BY k) AS qn FROM b),
         |s1 AS (SELECT k, rn AS c1, qc AS qc1, n, qn,
         |  ${g("0", "qc", "qn", "1", "rn", "n")} AS g1
         | FROM p WHERE rn >= 5 AND n - rn >= 5
         | QUALIFY row_number() OVER (PARTITION BY k
         |  ORDER BY ${fp(s"(${g("0", "qc", "qn", "1", "rn", "n")})" +
        "/100000000.0", "1000000.0")} DESC, rn ASC) = 1),
         |c2 AS (SELECT p.k, p.rn, p.qc,
         |  CASE WHEN p.rn <= s1.c1 THEN 1 ELSE s1.c1 + 1 END AS l,
         |  CASE WHEN p.rn <= s1.c1 THEN s1.c1 ELSE s1.n END AS r,
         |  CASE WHEN p.rn <= s1.c1 THEN 0 ELSE s1.qc1 END AS ql,
         |  CASE WHEN p.rn <= s1.c1 THEN s1.qc1 ELSE s1.qn END AS qr
         | FROM p JOIN s1 USING (k)),
         |s2 AS (SELECT k, l, r, rn,
         |  ${g("ql", "qc", "qr", "l", "rn", "r")} AS g2
         | FROM c2 WHERE rn - l + 1 >= 5 AND r - rn >= 5
         | QUALIFY row_number() OVER (PARTITION BY k, l
         |  ORDER BY ${fp(s"(${g("ql", "qc", "qr", "l", "rn", "r")})" +
        "/100000000.0", "1000000.0")} DESC, rn ASC) = 1)
         |SELECT k AS event_type, 1 AS depth, 1::BIGINT AS seg_start,
         | n::BIGINT AS seg_end, c1 AS split,
         | round(g1/100000000.0, 4) + 0 AS gain FROM s1
         |UNION ALL
         |SELECT k AS event_type, 2 AS depth, l::BIGINT AS seg_start,
         | r::BIGINT AS seg_end, rn AS split,
         | round(g2/100000000.0, 4) + 0 AS gain FROM s2"""
        .stripMargin.replace("\n", " ")
    },
    "q493_adwin" -> adwinOracle,
    "q495_adwin_stream" -> adwinOracle,
    "q496_record_linkage" -> fsOracle,
    "q499_shapley_attribution" -> shapleyOracle,
    "q500_bradley_terry" -> btOracle,
    "q501_cox_ph" -> coxOracle,
    "q506_c_index" -> cIndexOracle,
    "q510_cohens_d" -> {
      def m(s: String, n: String) = s"$s::DOUBLE/10000.0/$n::DOUBLE"
      def css(ss: String, s: String, n: String) =
        s"$ss::DOUBLE/100000000.0 - ($s::DOUBLE/10000.0)" +
          s"*($s::DOUBLE/10000.0)/$n::DOUBLE"
      s"""WITH per AS (SELECT event_type,
         |  CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS g,
         |  count(*)::BIGINT AS n,
         |  sum(${fp("value", "10000.0")}::HUGEINT) AS s,
         |  sum(${fp("value", "10000.0")}::HUGEINT
         |   * ${fp("value", "10000.0")}::HUGEINT) AS ss
         | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |a AS (SELECT * FROM per WHERE g = 'even'),
         |b AS (SELECT * FROM per WHERE g = 'odd'),
         |j AS (SELECT a.event_type, a.g AS g1, b.g AS g2,
         |  a.n AS n1, b.n AS n2,
         |  ${m("a.s", "a.n")} - ${m("b.s", "b.n")} AS mean_diff,
         |  ((${css("a.ss", "a.s", "a.n")})
         |   + (${css("b.ss", "b.s", "b.n")}))
         |   /(a.n + b.n - 2)::DOUBLE AS sp2
         | FROM a JOIN b USING (event_type)
         | WHERE a.n >= 2 AND b.n >= 2),
         |f AS (SELECT *, CASE WHEN sp2 > 0 THEN sqrt(sp2)
         |   ELSE 0.0 END AS pooled_sd FROM j),
         |f2 AS (SELECT *, CASE WHEN pooled_sd > 0
         |   THEN mean_diff/pooled_sd ELSE 0.0 END AS cohens_d FROM f)
         |SELECT event_type, g1, g2, n1, n2,
         | round(mean_diff, 4) + 0 AS mean_diff,
         | round(pooled_sd, 4) AS pooled_sd,
         | round(cohens_d, 4) + 0 AS cohens_d,
         | round(cohens_d*(1.0 - 3.0/(4.0*(n1 + n2)::DOUBLE - 9.0)), 4)
         |  + 0 AS hedges_g
         |FROM f2""".stripMargin.replace("\n", " ")
    },
    "q511_engle_granger" ->
      s"""WITH b0 AS (SELECT event_type AS key, event_id AS o,
         |  value::DOUBLE AS x,
         |  0.8*value + (event_id % 11)::DOUBLE AS y
         | FROM events WHERE value IS NOT NULL),
         |q AS (SELECT key, o, x, y, ${fp("x", "10000.0")} AS x4,
         |  ${fp("y", "10000.0")} AS y4 FROM b0),
         |mom AS (SELECT key, count(*)::BIGINT AS n,
         |  sum(x4)::HUGEINT AS sx, sum(y4)::HUGEINT AS sy,
         |  sum(x4::HUGEINT * x4::HUGEINT) AS sxx,
         |  sum(x4::HUGEINT * y4::HUGEINT) AS sxy
         | FROM q GROUP BY 1 HAVING count(*) >= 6),
         |cm AS (SELECT key, n,
         |  sxx::DOUBLE - sx::DOUBLE*sx::DOUBLE/n::DOUBLE AS sxxc,
         |  sxy::DOUBLE - sx::DOUBLE*sy::DOUBLE/n::DOUBLE AS sxyc,
         |  sy::DOUBLE/10000.0/n::DOUBLE AS ybar,
         |  sx::DOUBLE/10000.0/n::DOUBLE AS xbar FROM mom),
         |par AS (SELECT key, n,
         |  ${fp("sxyc/sxxc", "1000000.0")}::DOUBLE/1000000.0 AS slope,
         |  ${fp("ybar - (sxyc/sxxc)*xbar",
        "1000000.0")}::DOUBLE/1000000.0 AS intercept
         | FROM cm WHERE sxxc > 0),
         |rs AS (SELECT q.key, q.o,
         |  ${fp("q.y - (par.intercept + par.slope*q.x)",
        "10000.0")} AS r4
         | FROM q JOIN par USING (key)),
         |l AS (SELECT key, r4,
         |  lag(r4) OVER (PARTITION BY key ORDER BY o) AS yl FROM rs),
         |d AS (SELECT key, yl, r4 - yl AS dy FROM l
         | WHERE yl IS NOT NULL),
         |g AS (SELECT key, count(*)::BIGINT AS n2,
         |  sum(yl)::HUGEINT AS sx2,
         |  sum(yl::HUGEINT * yl::HUGEINT) AS sxx2,
         |  sum(dy)::HUGEINT AS sy2,
         |  sum(yl::HUGEINT * dy::HUGEINT) AS sxy2,
         |  sum(dy::HUGEINT * dy::HUGEINT) AS syy2
         | FROM d GROUP BY key HAVING count(*) >= 4),
         |c2 AS (SELECT key, n2::DOUBLE AS nd,
         |  sxx2::DOUBLE - sx2::DOUBLE*sx2::DOUBLE/n2::DOUBLE AS sxxc,
         |  sxy2::DOUBLE - sx2::DOUBLE*sy2::DOUBLE/n2::DOUBLE AS sxyc,
         |  syy2::DOUBLE - sy2::DOUBLE*sy2::DOUBLE/n2::DOUBLE AS syyc
         | FROM g),
         |f AS (SELECT key, sxyc/sxxc AS rho,
         |  syyc - (sxyc/sxxc)*sxyc AS sse, sxxc, nd FROM c2),
         |adf AS (SELECT key, round(rho, 4) + 0 AS rho,
         |  round(CASE WHEN sse > 0
         |   THEN rho/sqrt(sse/(nd - 2)/sxxc) ELSE 0.0 END, 4) + 0
         |   AS t_stat,
         |  CASE WHEN sse > 0 THEN rho/sqrt(sse/(nd - 2)/sxxc)
         |   ELSE 0.0 END AS traw FROM f)
         |SELECT par.key, par.n, round(par.slope, 4) + 0 AS slope,
         | round(par.intercept, 4) + 0 AS intercept, adf.rho, adf.t_stat,
         | (adf.traw < -3.34) AS cointegrated
         |FROM par JOIN adf USING (key)""".stripMargin.replace("\n", " "),
    "q512_jl_distortion" ->
      s"""WITH sg AS (SELECT i, j,
         |  CASE WHEN ${h56("i::VARCHAR || '_' || j::VARCHAR")} % 2 = 0
         |   THEN 1.0 ELSE -1.0 END AS s
         | FROM range(0, 64) t(i), range(0, 16) u(j)),
         |sm AS (SELECT vec_id AS id, embedding FROM embeddings
         | WHERE vec_id % 10 = 0 AND embedding IS NOT NULL),
         |ex AS (SELECT id, ii - 1 AS i, e[ii]::DOUBLE AS x
         | FROM (SELECT id, embedding AS e,
         |   unnest(range(1, len(embedding) + 1)) AS ii FROM sm)),
         |pj AS (SELECT id, j,
         |  sum(${fp("x * s", "100000000.0")}::HUGEINT) AS y8
         | FROM ex JOIN sg USING (i) GROUP BY 1, 2),
         |py AS (SELECT id, j,
         |  y8::DOUBLE/100000000.0/sqrt(16.0) AS y FROM pj),
         |pd AS (SELECT a.id AS aa, b.id AS bb,
         |  sum(${fp("(a.y - b.y)*(a.y - b.y)",
        "100000000.0")}::HUGEINT) AS pd8
         | FROM py a JOIN py b ON a.j = b.j AND a.id < b.id
         | GROUP BY 1, 2),
         |od AS (SELECT a.id AS aa, b.id AS bb,
         |  list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
         |   AS dor
         | FROM sm a JOIN sm b ON a.id < b.id),
         |r AS (SELECT sqrt(pd8::DOUBLE/100000000.0)/dor AS rt
         | FROM pd JOIN od USING (aa, bb) WHERE dor > 0)
         |SELECT 16 AS k, count(*)::BIGINT AS n_pairs,
         | round(sum(${fp("rt", "100000000.0")}::HUGEINT)::DOUBLE
         |  /100000000.0/count(*)::DOUBLE, 4) AS mean_ratio,
         | round(min(rt), 4) AS min_ratio, round(max(rt), 4) AS max_ratio
         |FROM r""".stripMargin.replace("\n", " "),
    "q507_calibration_error" -> {
      val pc = "least(greatest(score, 0.000001), 1.0 - 0.000001)"
      val yd = "CASE WHEN y THEN 1.0 ELSE 0.0 END"
      val gap = "abs(pos::DOUBLE/b.n::DOUBLE" +
        " - s8::DOUBLE/100000000.0/b.n::DOUBLE)"
      s"""WITH $probCte,
         |ll AS (SELECT count(*)::BIGINT AS n,
         |  sum(${fp(s"-(($yd)*ln($pc) + (1.0 - ($yd))*ln(1.0 - $pc))",
        "100000000.0")}::HUGEINT) AS l8 FROM pb),
         |b AS (SELECT least(9, floor(score*10)::BIGINT) AS bb,
         |  count(*)::BIGINT AS n,
         |  sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS pos,
         |  sum(${fp("score", "100000000.0")}::HUGEINT) AS s8
         | FROM pb GROUP BY 1),
         |t AS (SELECT count(*)::BIGINT AS bins_used,
         |  sum(${fp(s"b.n::DOUBLE / ll.n::DOUBLE * ($gap)",
        "100000000.0")}::HUGEINT) AS e8,
         |  max($gap) AS mce FROM b CROSS JOIN ll)
         |SELECT ll.n, t.bins_used,
         | round(t.e8::DOUBLE/100000000.0, 4) AS ece,
         | round(t.mce, 4) AS mce,
         | round(ll.l8::DOUBLE/100000000.0/ll.n::DOUBLE, 4) AS logloss
         |FROM ll CROSS JOIN t""".stripMargin.replace("\n", " ")
    },
    "q508_platt" ->
      s"""WITH $probCte,
         |src AS (SELECT doc_id, score, y, 1.0::DOUBLE AS f0,
         |  score AS f1, CASE WHEN y THEN 1.0 ELSE 0.0 END AS ry
         | FROM pb),
         |${gd2Sql("src", "pw")}
         |SELECT s.doc_id, round(s.score, 4) AS score, s.y AS label,
         | round(0.5 + (w.wa*s.f0 + w.wb*s.f1)
         |  /(2.0*(1.0 + abs(w.wa*s.f0 + w.wb*s.f1))), 4) + 0 AS p_cal
         |FROM src s CROSS JOIN pw5 w""".stripMargin.replace("\n", " "),
    "q509_hosmer_lemeshow" -> {
      val t = "(o1::DOUBLE - e1v)*(o1::DOUBLE - e1v)/e1v" +
        " + ((n - o1)::DOUBLE - e0v)*((n - o1)::DOUBLE - e0v)/e0v"
      s"""WITH $probCte,
         |b AS (SELECT least(9, floor(score*10)::BIGINT) AS bb,
         |  count(*)::BIGINT AS n,
         |  sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS o1,
         |  sum(${fp("score", "100000000.0")}::HUGEINT) AS e8
         | FROM pb GROUP BY 1),
         |c AS (SELECT *, e8::DOUBLE/100000000.0 AS e1v,
         |  n::DOUBLE - e8::DOUBLE/100000000.0 AS e0v FROM b),
         |d AS (SELECT *, (e1v > 0 AND e0v > 0) AS ok FROM c)
         |SELECT sum(CASE WHEN ok THEN 1 ELSE 0 END)::BIGINT
         |  AS bins_used,
         | sum(CASE WHEN NOT ok THEN 1 ELSE 0 END)::BIGINT
         |  AS bins_skipped,
         | round(sum(${fp(s"CASE WHEN ok THEN $t ELSE 0.0 END",
        "100000000.0")}::HUGEINT)::DOUBLE/100000000.0, 4) AS chi2,
         | (sum(CASE WHEN ok THEN 1 ELSE 0 END) - 2)::BIGINT AS df
         |FROM d""".stripMargin.replace("\n", " ")
    },
    "q502_markov_attribution" -> markovOracle,
    "q503_elo" -> eloOracle,
    "q504_elo_stream" -> eloOracle,
    "q505_autoencoder" -> aeOracle,
    "q497_k_anonymity" ->
      """WITH c AS (SELECT event_type,
        |  CAST(floor(value / 50.0) AS BIGINT) AS vbin,
        |  count(*)::BIGINT AS sz,
        |  count(DISTINCT user_id)::BIGINT AS l
        | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |a AS (SELECT sum(sz)::BIGINT AS n_rows,
        |  count(*)::BIGINT AS n_classes, min(sz)::BIGINT AS k_anonymity,
        |  min(l)::BIGINT AS l_diversity,
        |  sum(CASE WHEN sz < 10 THEN 1 ELSE 0 END)::BIGINT
        |   AS classes_below_k,
        |  sum(CASE WHEN sz < 10 THEN sz ELSE 0 END)::BIGINT
        |   AS rows_below_k FROM c)
        |SELECT n_rows, n_classes, k_anonymity, l_diversity,
        | classes_below_k, rows_below_k,
        | round(rows_below_k::DOUBLE / n_rows::DOUBLE, 4)
        |  AS frac_rows_below_k FROM a""".stripMargin.replace("\n", " "),
    "q498_freq_sequences" ->
      """WITH ut AS (SELECT user_id AS u, event_type AS t,
        |  min(ts) AS lo, max(ts) AS hi
        | FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        | GROUP BY 1, 2),
        |nu AS (SELECT count(DISTINCT u)::BIGINT AS n FROM ut),
        |l2 AS (SELECT 2 AS len, a.t AS p1, b.t AS p2, NULL::VARCHAR AS p3,
        |  count(*)::BIGINT AS support
        | FROM ut a JOIN ut b ON a.u = b.u AND a.t <> b.t AND a.lo < b.hi
        | GROUP BY 2, 3),
        |l3 AS (SELECT 3 AS len, p1, p2, p3, count(*)::BIGINT AS support
        | FROM (SELECT DISTINCT a.u, a.t AS p1, m.event_type AS p2,
        |    c.t AS p3
        |   FROM ut a JOIN ut c ON a.u = c.u AND a.t <> c.t AND a.lo < c.hi
        |   JOIN events m ON m.user_id = a.u
        |    AND m.event_type <> a.t AND m.event_type <> c.t
        |    AND m.ts > a.lo AND m.ts < c.hi)
        | GROUP BY 2, 3, 4)
        |SELECT len, p1, p2, p3, support,
        | round(support::DOUBLE / nu.n::DOUBLE, 4) AS support_frac
        |FROM (SELECT * FROM l2 UNION ALL SELECT * FROM l3) s CROSS JOIN nu
        |WHERE support >= 20""".stripMargin.replace("\n", " "),
    "q494_concentration" ->
      s"""WITH bm AS (SELECT event_type AS k, user_id AS m,
         |  sum(${fp("value", "1000000.0")}::HUGEINT) AS w6
         | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |rk AS (SELECT k, m, w6,
         |  row_number() OVER (PARTITION BY k
         |   ORDER BY w6 ASC, m ASC)::BIGINT AS i,
         |  count(*) OVER (PARTITION BY k) AS n FROM bm),
         |ag AS (SELECT k, count(*)::BIGINT AS members,
         |  sum(w6)::HUGEINT AS t, sum(i::HUGEINT * w6::HUGEINT) AS s,
         |  max(w6) AS mx FROM rk GROUP BY 1),
         |tp AS (SELECT k, sum(w6)::HUGEINT AS top10 FROM rk
         | WHERE i > n - ceil(n::DOUBLE * 0.1)::BIGINT GROUP BY 1)
         |SELECT k AS event_type, members,
         | round(t::DOUBLE/1000000.0, 4) AS total,
         | round(CASE WHEN t > 0 AND members > 1
         |  THEN (2.0*s::DOUBLE - (members + 1)::DOUBLE*t::DOUBLE)
         |   /(members::DOUBLE*t::DOUBLE) ELSE 0.0 END, 4) + 0 AS gini,
         | round(CASE WHEN t > 0 THEN mx::DOUBLE/t::DOUBLE
         |  ELSE 0.0 END, 4) AS top1_share,
         | round(CASE WHEN t > 0 THEN top10::DOUBLE/t::DOUBLE
         |  ELSE 0.0 END, 4) AS top10pct_share
         |FROM ag JOIN tp USING (k)""".stripMargin.replace("\n", " "),
  )
}
