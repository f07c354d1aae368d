package graft.queries

import graft.core._
import graft.model.Fitters
import graft.seq.{AsOfJoin, SeqOps, SeriesKernels}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries + DuckDB oracles for the sequence/time-series family
  * (SURVEY.md §2.5). Window-expressible ops carry full SQL oracles, as do
  * the KS/CVM/AD change-point statistics, discord, n-gram frequency and
  * both sequence matchers (LCS via a recursive-CTE DP). Only the FFT
  * saliency and the replace-on-outlier feedback recurrences remain
  * rows-only, with ScalaTest kernel specs covering the math. */
object SeqQueries {

  private def ev(s: SparkSession, dir: String) = table(s, dir, "events")

  /** events as the streaming twins' ValueEvent shape (user-keyed). */
  private def valueEvents(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[graft.streaming.StreamScorers.ValueEvent] = {
    import s.implicits._
    ev(s, dir).select(col("user_id").cast("string").as("entity"),
      col("event_id").cast("long").as("seq"),
      col("value").cast("double").as("value"))
      .as[graft.streaming.StreamScorers.ValueEvent]
  }

  /** Per-entity (n, Σfp, Σfp²) as LONG sums — the same long arithmetic
    * the batch kernels use, collected as the model-sized side input for
    * the fit-batch/score-stream twins (one row per entity). */
  private def kalmanModel(s: SparkSession, dir: String)
      : Array[(String, Long, Double, Double)] = {
    val fpv = fixedPointLong(col("value").cast("double"), 4)
    ev(s, dir).groupBy(col("user_id").cast("string").as("e"))
      .agg(count(lit(1)).as("n"), sum(fpv).as("s"),
        sum(fpv * fpv).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2).toDouble, r.getLong(3).toDouble))
  }

  /** Adjacent-user pairs of event-type sequences (users ≤ 20), each
    * sequence ordered by (event_id, event_type) — shared by the two
    * sequence-matcher queries. */
  private def seqPairs(s: SparkSession, dir: String): DataFrame = {
    val seqs = ev(s, dir).where(col("user_id") <= 20)
      .groupBy("user_id")
      .agg(transform(
        sort_array(collect_list(struct(col("event_id"), col("event_type")))),
        x => x.getField("event_type")).as("states"))
    val a = seqs.select(col("user_id").as("a"), col("states").as("sa"))
    val b = seqs.select(col("user_id").as("b"), col("states").as("sb"))
    a.join(b, col("b") === col("a") + 1)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Mann–Kendall monotone-trend test per event_type over the strided
    // ≤150-point subsample (exact integer S and tie-corrected Var(S))
    "q287_mann_kendall" -> ((s, dir) =>
      canon(graft.seq.Trend.mannKendall(ev(s, dir), Seq("event_type"),
        "event_id", "value", maxPoints = 150, zThreshold = 1.96))),
    // Theil–Sen robust slope/intercept per event_type, same subsample;
    // medians are explicit order statistics with (i,j) tie-breaks
    "q288_theil_sen" -> ((s, dir) =>
      canon(graft.seq.Trend.theilSen(ev(s, dir), Seq("event_type"),
        "event_id", "value", maxPoints = 150))),
    // Hodges–Lehmann pseudo-median (median of Walsh averages), same
    // strided subsample — the robust location the sign-rank test inverts
    "q298_hodges_lehmann" -> ((s, dir) =>
      canon(graft.seq.Trend.hodgesLehmann(ev(s, dir), Seq("event_type"),
        "event_id", "value", maxPoints = 150))),
    // SAX symbolization: z-norm → 8-point PAA → 6-letter equiprobable
    // alphabet (probit breakpoints) — the float→symbol bridge into the
    // Markov/multigram/motif family
    "q306_sax" -> ((s, dir) =>
      canon(graft.seq.Symbolic.sax(ev(s, dir), Seq("event_type"),
        "event_id", "value", frameSize = 8, alphabet = 6))),
    // Ljung–Box whiteness test over the first 10 autocorrelations
    // (6dp-frozen ACF, lag-ordered fold)
    "q309_ljung_box" -> ((s, dir) =>
      canon(graft.seq.Trend.ljungBox(ev(s, dir), Seq("event_type"),
        "event_id", "value", maxLag = 10))),
    // streaming motif detector executed as batch (q100 pattern): the
    // stream code path itself gated on a lag-window oracle
    "q220_motif_stream" -> ((s, dir) => {
      import s.implicits._
      val evd = table(s, dir, "events")
        .select(col("user_id").cast("string").as("entity"),
          col("event_id").cast("long").as("seq"),
          col("event_type").as("state"))
        .as[graft.streaming.StreamScorers.SeqEvent]
      graft.streaming.StreamScorers.motifStream(evd,
        Seq("error", "error", "error")).toDF()
    }),
    // streaming LOCF executed as batch (q100 pattern)
    "q227_locf_stream" -> ((s, dir) => {
      import s.implicits._
      val evd = table(s, dir, "events")
        .select(col("user_id").cast("string").as("entity"),
          col("event_id").cast("long").as("seq"),
          col("value").cast("double").as("value"))
        .as[graft.streaming.StreamScorers.GapEvent]
      canon(graft.streaming.StreamScorers.imputeLocfStream(evd).toDF())
    }),
    // 6h-bucket resample with spine gap fill, per user
    "q225_resample" -> ((s, dir) =>
      canon(SeqOps.resample(ev(s, dir), Seq("user_id"), "ts", "value",
        bucketNs = 21600000000000L))),
    // LOCF gap repair: per-user running IGNORE NULLS last over event_id
    "q216_impute_locf" -> ((s, dir) =>
      canon(SeqOps.imputeLocf(ev(s, dir), Seq("user_id"), "event_id", "value")
        .select("event_id", "user_id", "value", "filled", "was_imputed"))),
    "q12_markov_fit" -> ((s, dir) =>
      canon(Fitters.markovTransitions(ev(s, dir), Seq("user_id"), "event_id",
        "event_type", smoothing = 1.0))),
    // incremental Markov model: fit counts on the two user-parity slices
    // (whole sequences per slice), sum-merge, then normalize — equals a
    // from-scratch refit without re-reading history
    "q133_markov_merge" -> ((s, dir) => {
      val data = ev(s, dir)
      val half = pmod(col("user_id"), lit(2))
      val merged = Fitters.markovMerge(Seq(
        Fitters.markovCounts(data.where(half === 0), Seq("user_id"),
          "event_id", "event_type"),
        Fitters.markovCounts(data.where(half === 1), Seq("user_id"),
          "event_id", "event_type")))
      canon(Fitters.markovProbs(merged, smoothing = 1.0))
    }),
    "q13_markov_chain" -> ((s, dir) => {
      val data = ev(s, dir)
      val model = Fitters.markovTransitions(data, Seq("user_id"), "event_id",
        "event_type", smoothing = 1.0)
      canon(SeqOps.markovChainScore(data, model, Seq("user_id"), "event_id",
        "event_type", window = 5, metric = "condProb", threshold = 1.5)
        .select("user_id", "event_id", "score", "tag"))
    }),
    "q14_markov_missrate" -> ((s, dir) => {
      val data = ev(s, dir)
      val model = Fitters.markovTransitions(data, Seq("user_id"), "event_id",
        "event_type", smoothing = 1.0)
      canon(SeqOps.markovChainScore(data, model, Seq("user_id"), "event_id",
        "event_type", window = 5, metric = "missRate", threshold = 0.9)
        .select("user_id", "event_id", "score", "tag"))
    }),
    // the remaining two reference Markov metrics
    // (MarkovModelPredictor.java MissProbability / EntropyReduction),
    // oracle-gated like q13/q14
    "q169_markov_missprob" -> ((s, dir) => {
      val data = ev(s, dir)
      val model = Fitters.markovTransitions(data, Seq("user_id"), "event_id",
        "event_type", smoothing = 1.0)
      canon(SeqOps.markovChainScore(data, model, Seq("user_id"), "event_id",
        "event_type", window = 5, metric = "missProb", threshold = 0.9)
        .select("user_id", "event_id", "score", "tag"))
    }),
    "q170_markov_entropy" -> ((s, dir) => {
      val data = ev(s, dir)
      val model = Fitters.markovTransitions(data, Seq("user_id"), "event_id",
        "event_type", smoothing = 1.0)
      canon(SeqOps.markovChainScore(data, model, Seq("user_id"), "event_id",
        "event_type", window = 5, metric = "entropyRed", threshold = 0.95)
        .select("user_id", "event_id", "score", "tag"))
    }),
    "q15_level_shift" -> ((s, dir) =>
      canon(SeqOps.scoreLevelShift(StatQueries.zscored(s, dir), Seq("user_id"),
        "event_id", longWin = 20, shortWin = 5, minZ = 2.0)
        .select("user_id", "event_id", "score", "z", "tag"))),
    "q16_local_neighborhood" -> ((s, dir) =>
      canon(SeqOps.localNeighborhood(ev(s, dir), Seq("user_id"), "event_id",
        "value", half = 2, threshold = 60.0)
        .select("user_id", "event_id", "value", "score", "tag"))),
    "q17_outlier_cluster" -> ((s, dir) =>
      canon(SeqOps.outlierCluster(StatQueries.zscored(s, dir), Seq("user_id"),
        "event_id", maxGap = 300L)
        .select("user_id", "event_id", "value", "score", "tag"))),
    "q18_changepoint_meanshift" -> ((s, dir) =>
      canon(SeqOps.changePointMeanShift(ev(s, dir), Seq("event_type"), "event_id",
        "value", window = 30, critValue = 3.0)
        .select("event_type", "event_id", "value", "stat"))),
    // the streaming change-point detector batch-executed (q100 device):
    // one micro-batch holds each entity's whole history, so the emitted
    // trailing-window Welch stats must equal the shifted batch statistic
    // — and the oracle replays them with trailing SQL windows
    "q247_changepoint_stream" -> ((s, dir) => {
      import s.implicits._
      val evd = table(s, dir, "events")
        .where(col("value").isNotNull)
        .select(col("event_type").as("entity"),
          col("event_id").cast("long").as("seq"),
          col("value").cast("double").as("value"))
        .as[graft.streaming.StreamScorers.ValueEvent]
      canon(graft.streaming.StreamScorers.changePointStream(evd, 30, 3.0)
        .toDF().where(!isnan(col("stat"))))
    }),
    // classical MA seasonal decomposition, period 24 over the event_id
    // sequence; residual z is the seasonality-aware anomaly score
    "q129_seasonal_decompose" -> ((s, dir) =>
      canon(SeqOps.seasonalDecompose(ev(s, dir), Seq("event_type"), "event_id",
        "value", period = 24))),
    // STL F-measures over the same decomposition: is the seasonality /
    // trend worth modeling (scalar gate before Holt–Winters)
    "q362_seasonal_strength" -> ((s, dir) =>
      canon(SeqOps.seasonalStrength(ev(s, dir), Seq("event_type"),
        "event_id", "value", period = 24))),
    // same statistic and oracle as q18, computed by the halo-exchange
    // kernel: range-partitioned on (key, seq) with a w-row boundary halo,
    // so parallelism is data-sized instead of capped at key cardinality
    "q95_changepoint_scaled" -> ((s, dir) =>
      canon(graft.seq.HaloWindows.changePointMeanShift(ev(s, dir),
        Seq("event_type"), "event_id", "value", window = 30, critValue = 3.0))),
    // the change-point job driven through the reference property
    // vocabulary (runJob "changePointDetector"): the auto-crossover
    // dispatch (Pipeline.changePoint) emits the canonical key/seq shape
    // and must reproduce q95's oracle bit-for-bit on either kernel
    "q168_config_changepoint" -> ((s, dir) => {
      val conf = graft.pipeline.ConfigRunner.fromProperties(
        """id.fieldOrdinals=[3]
          |attr.ordinals=[4]
          |seq.fieldOrd=0
          |window.size=30
          |stat.type=meanShift
          |stat.critValue=3.0""".stripMargin)
      canon(graft.pipeline.ConfigRunner.runJob(s, ev(s, dir),
        "changePointDetector", conf))
    }),
    // the markov scoring job through the same property surface
    // (runJob "markovChainPredictor" → runSequence), sharing q13's oracle
    "q167_config_markov" -> ((s, dir) => {
      val conf = graft.pipeline.ConfigRunner.fromProperties(
        """predictor.model=markovChainProb
          |id.fieldOrdinals=[2]
          |seq.fieldOrd=0
          |state.fieldOrd=3
          |window.size=5
          |markov.metric=condProb
          |laplace.smoothing=1.0
          |score.threshold=1.5""".stripMargin)
      canon(graft.pipeline.ConfigRunner.runJob(s, ev(s, dir),
        "markovChainPredictor", conf)
        .select("user_id", "event_id", "score", "tag"))
    }),
    // same segmentation and oracle shape as q20, computed by the
    // halo-exchange kernel (sparse shifted rows + island stitch)
    "q96_levelshift_scaled" -> ((s, dir) =>
      canon(graft.seq.HaloWindows.levelShiftSegments(ev(s, dir),
        Seq("event_type"), "event_id", "value", window = 20, minZ = 3.0))),
    "q19_one_step_ahead" -> ((s, dir) =>
      canon(SeqOps.oneStepAhead(ev(s, dir), Seq("user_id"), "event_id", "value",
        window = 10, threshold = 3.0)
        .select("user_id", "event_id", "value", "predicted", "score", "tag"))),
    "q20_levelshift_segments" -> ((s, dir) =>
      canon(SeqOps.levelShiftSegments(ev(s, dir), Seq("event_type"), "event_id",
        "value", window = 20, minZ = 3.0))),
    "q21_autocorrelation" -> ((s, dir) =>
      canon(SeqOps.autocorrelation(ev(s, dir), Seq("event_type"), "event_id",
        "value", Seq(1, 2, 3)))),
    "q22_temporal_agg" -> ((s, dir) =>
      canon(SeqOps.temporalAggregate(ev(s, dir), Seq("event_type"), "ts", "value",
        bucketSec = 3600L))),
    // PACF via Levinson–Durbin on the q21 ACF frozen at 6dp; the inner
    // dot is a 12dp fixed-point integer sum, the rest fixed float ops —
    // the oracle replays the recursion as a recursive CTE on the lists
    "q248_pacf" -> ((s, dir) =>
      canon(SeqOps.pacf(ev(s, dir), Seq("event_type"), "event_id", "value",
        maxLag = 6))),
    // AR(6) one-step forecast scorer on the Levinson coefficients —
    // the autoregressive complement of OSA/Holt/Holt-Winters
    "q249_ar_forecast" -> ((s, dir) =>
      canon(SeqOps.arForecast(ev(s, dir), Seq("event_type"), "event_id",
        "value", order = 6, threshold = 3.0))),
    "q23_multigram" -> ((s, dir) =>
      canon(SeqOps.multigramDistribution(ev(s, dir), Seq("user_id"), "event_id",
        "event_type", n = 2))),
    "q73_asof_join" -> ((s, dir) => {
      // events as-of joined to hourly model snapshots (latest ≤ event ts)
      val events = ev(s, dir)
      val snaps = SeqOps.temporalAggregate(events, Seq("event_type"), "ts", "value", 3600L)
        .select(col("event_type"), (col("bucket") * 3600000000000L).as("ts"),
          col("avgVal").as("snapAvg"))
      canon(AsOfJoin.asOf(events, snaps, Seq("event_type"), "ts", Seq("snapAvg"))
        .select("event_id", "event_type", "value", "snapAvg"))
    }),
    // banded interval join: per-type quartile bands (edges 4dp-frozen on
    // both engines), events equi-joined to their containing band through
    // the bucketized path — never a nested-loop theta join. Points sitting
    // exactly on an inner edge legitimately match both adjacent bands.
    "q156_interval_join" -> ((s, dir) => {
      val events = ev(s, dir)
      val b = graft.model.Fitters.equalProbBoundaries(
        events, Seq("event_type"), Seq("value"), n = 4)
        .groupBy("event_type")
        .agg(map_from_entries(collect_list(
          struct(col("qidx"), roundLikeDuck(col("boundary"), 4)))).as("bm"))
      val mm = events.groupBy("event_type")
        .agg(roundLikeDuck(min("value"), 4).as("mn"),
          roundLikeDuck(max("value"), 4).as("mx"))
      val edges = b.join(mm, "event_type")
        .select(col("event_type"), array(col("mn"),
          element_at(col("bm"), 1), element_at(col("bm"), 2),
          element_at(col("bm"), 3), col("mx")).as("e"))
      val intervals = edges.select(col("event_type"),
        posexplode(expr("transform(sequence(0, 3), i -> struct(e[i] as lo, e[i+1] as hi))")))
        .select(col("event_type"), col("pos").as("band"),
          col("col.lo").as("lo"), col("col.hi").as("hi"))
      canon(AsOfJoin.intervalJoin(
        events.select("event_id", "event_type", "value"), intervals,
        Seq("event_type"), "value", "lo", "hi")
        .select(col("event_id"), col("event_type"), col("value"),
          col("band"), col("lo"), col("hi")))
    }),
    // ---- whole-series kernels: rows-only driver check, spec-tested ----
    "q24_spectral_residue" -> ((s, dir) =>
      canon(SeriesKernels.spectralResidue(ev(s, dir), Seq("event_type"), "event_id",
        "value", window = 64).toDF())),
    "q25_changepoint_ks" -> ((s, dir) =>
      canon(SeriesKernels.changePoint(ev(s, dir), Seq("event_type"), "event_id",
        "value", window = 50, stat = "ks", critValue = 0.25).toDF())),
    // CVM/AD scores get the same +1e-9 pre-round nudge as q28 (both sides):
    // their sums of squares are arbitrary floats that can land on a 4dp
    // rounding boundary, unlike KS's 1/50-granular max gap.
    "q25b_changepoint_cvm" -> ((s, dir) =>
      canon(SeriesKernels.changePoint(ev(s, dir), Seq("event_type"), "event_id",
        "value", window = 50, stat = "cvm", critValue = 0.5).toDF()
        .withColumn("score", col("score") + lit(1e-9)))),
    "q25c_changepoint_ad" -> ((s, dir) =>
      canon(SeriesKernels.changePoint(ev(s, dir), Seq("event_type"), "event_id",
        "value", window = 50, stat = "ad", critValue = 2.5).toDF()
        .withColumn("score", col("score") + lit(1e-9)))),
    "q26_subseq_discord" -> ((s, dir) =>
      canon(SeriesKernels.subSequenceDistanceFast(ev(s, dir), Seq("user_id"), "event_id",
        "value", window = 8).toDF())),
    "q27_one_step_ahead_fb" -> ((s, dir) =>
      canon(SeriesKernels.oneStepAhead(ev(s, dir), Seq("user_id"), "event_id",
        "value", window = 10, threshold = 3.0).toDF())),
    "q85a_seq_positional" -> ((s, dir) => {
      // positional sequence matcher (SequenceMatcher.java:58-79) as a
      // query: each user's event-type sequence vs the next user's.
      // Pure built-ins (zip_with + filter over the paired state arrays)
      // — SQL-expressible, so it carries a full DuckDB oracle.
      val paired = seqPairs(s, dir)
      canon(paired.select(col("a"), col("b"),
        (size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y),
          h => h)).cast("double") /
          greatest(size(col("sa")), size(col("sb")))).as("posSim")))
    }),
    "q85b_seq_lcs" -> ((s, dir) => {
      // LCS sequence matcher (SequenceMatcher.java:81-110): the DP kernel
      // runs as a UDF over the paired state arrays; oracled by a DuckDB
      // recursive CTE that walks the DP grid one anti-diagonal per
      // iteration (cells on a diagonal are independent, so each row's
      // state is just the previous two diagonals as lists).
      val lcsSim = udf((a: Seq[String], b: Seq[String]) =>
        SeriesKernels.lcsSimilarity(a, b))
      val paired = seqPairs(s, dir)
      canon(paired.select(col("a"), col("b"),
        lcsSim(col("sa"), col("sb")).as("lcsSim")))
    }),
    // full DuckDB oracle: eq-prob buckets (quantile_cont), bigram window
    // counts vs the key's overall distribution, window-max spread,
    // per-key max-normalize — every stage is SQL (see oracleSql below)
    // score + 1e-9 on BOTH sides before the 4dp round: the max-normalized
    // score is a ratio of small-denominator rationals, which can land
    // exactly on a .00005 rounding boundary where 1e-16 float-summation
    // noise flips the two engines apart; the common nudge moves the
    // boundary off every such rational
    "q28_ngram_freq" -> ((s, dir) =>
      canon(SeriesKernels.ngramFrequency(ev(s, dir), Seq("user_id"), "event_id",
        "value", numBuckets = 4, n = 2, window = 20).toDF()
        .withColumn("score", col("score") + lit(1e-9)))),
    "q86_osa_resid_stats" -> ((s, dir) =>
      // one-step-ahead residual-stats side output; oracled via the same
      // recursive-CTE walk as q27 (SeqSpec additionally pins the math
      // against an independent replay)
      canon(SeriesKernels.oneStepAheadResidStats(ev(s, dir), Seq("user_id"),
        "event_id", "value", window = 10, threshold = 3.0).toDF())),
    // Holt linear-trend forecast scorer; oracled by a recursive CTE that
    // replays the identical (level, trend, resid-stats) recursion —
    // dyadic α/β keep every step bit-reproducible across engines
    "q196_holt_forecast" -> ((s, dir) =>
      canon(SeriesKernels.holtForecast(ev(s, dir), Seq("user_id"), "event_id",
        "value").toDF())),
    // local-level Kalman filter: gain adapts from prior uncertainty,
    // r = per-key exact-sum sample variance, q = r/16 (dyadic)
    "q322_kalman" -> ((s, dir) =>
      canon(graft.seq.StateSpace.kalmanFilter(ev(s, dir), Seq("user_id"),
        "event_id", "value").toDF())),
    // normalized spectral entropy of each type's leading 64 points
    // (8dp-frozen DFT terms — exact long sums)
    "q361_spectral_entropy" -> ((s, dir) =>
      canon(graft.seq.StateSpace.spectralEntropy(ev(s, dir),
        Seq("event_type"), "event_id", "value", window = 64))),
    // two-level binary segmentation: multi-change-point splits via
    // exact prefix-sum statistics, 6dp-frozen arg-max
    "q359_binary_seg" -> ((s, dir) =>
      canon(graft.seq.SeqOps.binarySegmentation(ev(s, dir),
        Seq("event_type"), "event_id", "value", minSegment = 50))),
    // EWMA control chart: score = |e_t − μ| / exact time-varying limit
    // (the SPC memory chart; λ=0.25 dyadic, (1−λ)^{2t} rides the walk)
    "q328_ewma_chart" -> ((s, dir) =>
      canon(graft.seq.StateSpace.ewmaChart(ev(s, dir), Seq("user_id"),
        "event_id", "value").toDF())),
    // Kalman STREAM twin (q100 device): fit-batch/score-stream — the
    // per-entity (r, n) model is a collected model-sized side input,
    // replayed by the flatMapGroupsWithState path; same oracle as q322
    "q334_kalman_stream" -> ((s, dir) => {
      import s.implicits._
      val model = kalmanModel(s, dir).map { case (e, n, sS, qS) =>
        val nD = n.toDouble
        e -> ((qS - sS * sS / nD) / (nD - 1) / 1e8, n)
      }.toMap
      canon(graft.streaming.StreamScorers.kalmanStream(
        valueEvents(s, dir), model).toDF()
        .select(col("entity").as("key"), col("seq"), col("value"),
          col("score")))
    }),
    // EWMA-chart STREAM twin: per-entity (μ, σ, n) model side input
    "q335_ewma_stream" -> ((s, dir) => {
      import s.implicits._
      val model = kalmanModel(s, dir).map { case (e, n, sS, qS) =>
        val nD = n.toDouble
        e -> (sS / nD / 1e4,
          math.sqrt((qS - sS * sS / nD) / (nD - 1)) / 1e4, n)
      }.toMap
      canon(graft.streaming.StreamScorers.ewmaChartStream(
        valueEvents(s, dir), model).toDF()
        .select(col("entity").as("key"), col("seq"), col("value"),
          col("score")))
    }),
    // DTW shape distance: each user's daily-mean series vs the global
    // daily-mean reference (collected — one entry per calendar day)
    "q323_dtw" -> ((s, dir) => {
      val dayCol = expr("ts div 86400000000000")
      val fpv = fixedPointLong(col("value").cast("double"), 4)
      val e = ev(s, dir).where(col("value").isNotNull)
        .select(col("user_id"), dayCol.as("day"), fpv.as("_fp"))
      def mean = (sum(col("_fp").cast("decimal(38,0)")).cast("double") /
        count(lit(1)).cast("double") / 1e4).as("mv")
      val daily = e.groupBy(col("user_id"), col("day")).agg(mean)
      val ref = e.groupBy(col("day")).agg(mean)
        .orderBy(col("day")).collect().map(_.getDouble(1))
      canon(graft.seq.Warp.dtwToReference(daily, "user_id", "day", "mv",
        ref).toDF())
    }),
    // Holt–Winters additive seasonal scorer, period 7, two-season
    // fixed-point init; seasonal state rides a rotating list in the
    // recursive-CTE oracle
    "q235_holt_winters" -> ((s, dir) =>
      canon(SeriesKernels.holtWinters(ev(s, dir), Seq("user_id"), "event_id",
        "value", period = 7).toDF())),
    // Kleinberg 2-state burst Viterbi over per-user inter-arrival gaps;
    // oracle replays the forward recursion with both candidate paths
    // carried as lists
    "q237_burst" -> ((s, dir) =>
      canon(SeriesKernels.burstDetect(ev(s, dir), Seq("user_id"), "ts",
        "value").toDF())),
    // Hampel rolling-median/MAD outlier filter, 15-row centered frame
    "q199_hampel" -> ((s, dir) =>
      canon(SeqOps.hampel(ev(s, dir), Seq("user_id"), "event_id",
        "value", halfWindow = 7, nSigmas = 3.0))),
    // per-key OLS trend fit + residual z — integer-exact moments
    "q198_trend_resid" -> ((s, dir) =>
      canon(SeqOps.trendResiduals(ev(s, dir), Seq("user_id"), "event_id",
        "value"))),
    // the streaming twin batch-executed (q100 pattern): same oracle gates
    // the flatMapGroupsWithState path itself
    "q197_holt_stream" -> ((s, dir) => {
      import s.implicits._
      val evd = ev(s, dir)
        .select(col("user_id").cast("string").as("entity"),
          col("event_id").cast("long").as("seq"),
          col("value").cast("double").as("value"))
        .as[graft.streaming.StreamScorers.ValueEvent]
      canon(graft.streaming.StreamScorers.holtForecastStream(evd).toDF()
        .select(col("entity").as("key"), col("seq"), col("value"), col("score")))
    }),
    // gaps-and-islands sessionization: 12h inactivity gap per user
    "q116_sessionize" -> ((s, dir) =>
      canon(SeqOps.sessionize(ev(s, dir), Seq("user_id"), "ts", "event_id",
        "value", gapSec = 43200L))),
    // the STREAMING sessionizer executed as batch (q100 pattern):
    // session_window's per-event [ts, ts+gap) overlap-merge splits on a
    // gap of EXACTLY `gap` (>=) where the batch operator splits on
    // strictly-greater — the oracle replays the >= rule, so the boundary
    // semantics themselves are driver-gated, not just spec'd
    "q149_sessionize_stream" -> ((s, dir) => {
      val e = ev(s, dir).withColumn("_t", timestamp_micros(expr("ts div 1000")))
      canon(graft.streaming.StreamScorers.sessionizeStream(e, "_t",
        Seq("user_id"), "value", gap = "12 hours", watermark = "0 seconds")
        .select(col("user_id"), col("n_events"),
          unix_micros(col("start_ts")).as("start_us"),
          unix_micros(col("end_ts")).as("end_us"),
          col("sum_value")))
    }),
    // the per-entity STATEFUL stream scorer executed as batch (q100
    // pattern): flatMapGroupsWithState receives each user's full history
    // in one group call — the online run's "all arrived" prefix. The
    // broadcast transition map is the q12 model collected driver-side
    // (|states|² entries, model-sized by construction). The stream's
    // rolling mean sums its window oldest→newest, so a window-function
    // oracle replays the 4dp score; warm-up rows surface NaN → projected
    // to null for the cross-engine compare (NULL is DuckDB's only spelling)
    "q162_markov_stream" -> ((s, dir) => {
      import s.implicits._
      val data = ev(s, dir)
      val trans = Fitters.markovTransitions(data, Seq("user_id"), "event_id",
          "event_type", smoothing = 1.0)
        .collect().map(r => (r.getAs[String]("fromState"),
          r.getAs[String]("toState")) -> r.getAs[Double]("prob")).toMap
      val evs = data.select(col("user_id").cast("string").as("entity"),
          col("event_id").cast("long").as("seq"),
          col("event_type").as("state"))
        .as[graft.streaming.StreamScorers.SeqEvent]
      canon(graft.streaming.StreamScorers.markovStream(evs, trans,
          window = 5, threshold = 1.5).toDF()
        .select(col("entity").cast("long").as("user_id"),
          col("seq").as("event_id"), col("state"),
          when(isnan(col("score")), lit(null)).otherwise(col("score"))
            .as("score"),
          col("tag")))
    }),
    // ordered funnel view→click→purchase, greedy earliest-completion,
    // 7-day completion window from the first 'view'
    "q194_funnel" -> ((s, dir) =>
      canon(SeqOps.funnel(ev(s, dir), Seq("user_id"), "ts", "event_type",
        Seq("view", "click", "purchase"), windowSec = 604800L))),
    // daily-cohort retention: first-active-day cohorts, per-offset active
    // counts and rates
    "q195_retention" -> ((s, dir) =>
      canon(SeqOps.retention(ev(s, dir), Seq("user_id"), "ts",
        periodSec = 86400L))),
  )

  // transitions + smoothed probabilities, per-user sequences, global model
  private val mkProbs =
    """trans AS (SELECT user_id, event_id, event_type AS toState,
      |  lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS fromState
      | FROM events),
      |tcounts AS (SELECT fromState, toState, count(*) AS cnt FROM trans
      | WHERE fromState IS NOT NULL GROUP BY 1,2),
      |states AS (SELECT DISTINCT event_type AS s FROM events),
      |grid AS (SELECT f.s AS fromState, t.s AS toState FROM states f CROSS JOIN states t),
      |probs AS (SELECT g.fromState, g.toState,
      |  (coalesce(c.cnt,0) + 1.0) /
      |   (sum(coalesce(c.cnt,0)) OVER (PARTITION BY g.fromState)
      |     + (SELECT count(*) FROM states)) AS prob
      | FROM grid g LEFT JOIN tcounts c
      |   ON g.fromState = c.fromState AND g.toState = c.toState)"""
      .stripMargin.replace("\n", " ")

  private val zCte =
    """zstats AS (SELECT event_type, avg(value) AS mean, stddev_samp(value) AS std
      | FROM events GROUP BY event_type),
      |z AS (SELECT e.user_id, e.event_id, e.value,
      |  abs(e.value - s.mean)/s.std AS score,
      |  CASE WHEN abs(e.value - s.mean)/s.std > 2.0 THEN 'O' ELSE 'N' END AS tag
      | FROM events e JOIN zstats s USING (event_type))"""
      .stripMargin.replace("\n", " ")

  // Recursive replay of the one-step-ahead replace-on-outlier walk
  // (SeriesKernels.osaWalk — seq/OneStepAheadPredictor.scala:111-151): one
  // recursion step per row, state = the 10-slot circular buffer (emulated
  // positionally so float summation order matches Scala's `buf.sum` over
  // array indices exactly) + running residual sum/sumsq/count. Score uses
  // the residual stats from BEFORE the current residual is folded in, as
  // the kernel does. Shared by q27 (per-row scores) and q86 (final stats).
  private val osaWalk =
    """ev AS (SELECT user_id::VARCHAR AS key, event_id AS seq, value,
      |  row_number() OVER (PARTITION BY user_id ORDER BY event_id, value) AS rn
      | FROM events),
      |walk AS (
      | SELECT key, rn, seq, value, 0.0::DOUBLE AS score,
      |  [value] AS buf, 1 AS filled,
      |  0.0::DOUBLE AS rsum, 0.0::DOUBLE AS rsq, 0 AS rnr
      | FROM ev WHERE rn = 1
      | UNION ALL
      | SELECT key, rn, seq, value, score,
      |  CASE WHEN filled0 < 10 THEN list_append(buf0, store)
      |   ELSE list_transform(range(1, 11),
      |    j -> CASE WHEN j = (filled0 % 10) + 1 THEN store ELSE buf0[j] END)
      |  END AS buf,
      |  filled0 + 1 AS filled,
      |  rsum0 + coalesce(resid, 0.0) AS rsum,
      |  rsq0 + coalesce(resid * resid, 0.0) AS rsq,
      |  rnr0 + CASE WHEN resid IS NOT NULL THEN 1 ELSE 0 END AS rnr
      | FROM (
      |  SELECT key, rn, seq, value, buf0, filled0, rsum0, rsq0, rnr0, pred, resid,
      |   CASE WHEN resid IS NOT NULL AND std > 0
      |    THEN abs(resid) / std ELSE 0.0::DOUBLE END AS score,
      |   CASE WHEN resid IS NOT NULL AND std > 0 AND abs(resid) / std > 3.0
      |    THEN pred ELSE value END AS store
      |  FROM (
      |   SELECT e.key, e.rn, e.seq, e.value,
      |    w.buf AS buf0, w.filled AS filled0,
      |    w.rsum AS rsum0, w.rsq AS rsq0, w.rnr AS rnr0,
      |    CASE WHEN w.filled >= 10 THEN list_sum(w.buf) / 10.0 END AS pred,
      |    CASE WHEN w.filled >= 10 THEN e.value - list_sum(w.buf) / 10.0 END AS resid,
      |    CASE WHEN w.rnr > 1
      |     THEN sqrt((w.rsq - w.rsum * w.rsum / w.rnr) / (w.rnr - 1))
      |     ELSE 0.0::DOUBLE END AS std
      |   FROM walk w JOIN ev e ON e.key = w.key AND e.rn = w.rn + 1)))"""
      .stripMargin.replace("\n", " ")

  // Holt recursion replay (SeriesKernels.holtForecast): state = (level,
  // trend, resid sum/sumsq/count); init l₂=x₂, b₂=x₂−x₁; score from PRIOR
  // residual std — same fixed IEEE op order as the kernel, so the engines
  // agree bit-for-bit before the shared 4dp round. Shared by q196 (batch
  // kernel) and q197 (the streaming twin batch-executed, q100 pattern).
  // Kleinberg burst Viterbi replay: forward min-cost recursion with the
  // two candidate state paths carried as INT[] lists; tie rule <= toward
  // the lower/previous state, mirrored from the Scala kernel
  private lazy val burstOracle: String =
    """WITH RECURSIVE ev AS (SELECT user_id::VARCHAR AS key,
      |  epoch_ns(ts) AS tsns, value,
      |  row_number() OVER (PARTITION BY user_id
      |   ORDER BY epoch_ns(ts), value) AS rn FROM events),
      |st AS (SELECT key, count(*) AS n, max(tsns) - min(tsns) AS span
      | FROM ev GROUP BY key),
      |par AS (SELECT key, n - 1 AS ng,
      |  (span::DOUBLE / 1e9) / (n - 1) AS ghat
      | FROM st WHERE n >= 3 AND span > 0),
      |lam AS (SELECT key, ng, 1.0/ghat AS lam0, 2.0/ghat AS lam1,
      |  1.0 * ln(ng::DOUBLE) AS up FROM par),
      |gp AS (SELECT e.key, e.rn - 1 AS gi,
      |  (e.tsns - p.tsns)::DOUBLE / 1e9 AS g
      | FROM ev e JOIN ev p ON p.key = e.key AND p.rn = e.rn - 1),
      |walk AS (
      | SELECT l.key, 1 AS gi,
      |  (-ln(l.lam0) + l.lam0 * g.g) AS c0,
      |  (l.up + (-ln(l.lam1) + l.lam1 * g.g)) AS c1,
      |  [0] AS p0, [1] AS p1, l.lam0, l.lam1, l.up, l.ng
      | FROM lam l JOIN gp g ON g.key = l.key AND g.gi = 1
      | UNION ALL
      | SELECT w.key, g.gi,
      |  (CASE WHEN w.c0 <= w.c1 THEN w.c0 ELSE w.c1 END)
      |    + (-ln(w.lam0) + w.lam0 * g.g) AS c0,
      |  (CASE WHEN w.c0 + w.up <= w.c1 THEN w.c0 + w.up ELSE w.c1 END)
      |    + (-ln(w.lam1) + w.lam1 * g.g) AS c1,
      |  (CASE WHEN w.c0 <= w.c1 THEN w.p0 ELSE w.p1 END) || [0] AS p0,
      |  (CASE WHEN w.c0 + w.up <= w.c1 THEN w.p0 ELSE w.p1 END) || [1] AS p1,
      |  w.lam0, w.lam1, w.up, w.ng
      | FROM walk w JOIN gp g ON g.key = w.key AND g.gi = w.gi + 1),
      |fin AS (SELECT key, CASE WHEN c0 <= c1 THEN p0 ELSE p1 END AS path
      | FROM walk WHERE gi = ng),
      |sts AS (SELECT key, unnest(path) AS stt,
      |  generate_subscripts(path, 1) AS gi FROM fin)
      |SELECT e.key, e.tsns AS seq, round(e.value, 4) AS value,
      | round(s.stt::DOUBLE, 4) AS score
      |FROM ev e JOIN sts s ON s.key = e.key AND s.gi = e.rn - 1
      |UNION ALL
      |SELECT e.key, e.tsns AS seq, round(e.value, 4) AS value, 0.0 AS score
      |FROM ev e LEFT JOIN par p USING (key)
      |WHERE e.rn = 1 OR p.key IS NULL""".stripMargin.replace("\n", " ")

  // Seasonal-decompose replay through the component frame `r`
  // (event_type, seq, value, trend, seasonal, resid) — the 2×24 MA is
  // an explicit left-associated lag/lead chain so the float association
  // matches Spark's `+` chain. Shared by q129 and q362.
  private lazy val sdCtes: String =
    """b AS (SELECT event_type, event_id AS seq, value FROM events
      |  WHERE value IS NOT NULL),
      |t AS (SELECT event_type, seq, value, (lag(value, 11) OVER wo + lag(value, 10) OVER wo + lag(value, 9) OVER wo + lag(value, 8) OVER wo + lag(value, 7) OVER wo + lag(value, 6) OVER wo + lag(value, 5) OVER wo + lag(value, 4) OVER wo + lag(value, 3) OVER wo + lag(value, 2) OVER wo + lag(value, 1) OVER wo + value + lead(value, 1) OVER wo + lead(value, 2) OVER wo + lead(value, 3) OVER wo + lead(value, 4) OVER wo + lead(value, 5) OVER wo + lead(value, 6) OVER wo + lead(value, 7) OVER wo + lead(value, 8) OVER wo + lead(value, 9) OVER wo + lead(value, 10) OVER wo + lead(value, 11) OVER wo + (lag(value, 12) OVER wo + lead(value, 12) OVER wo) / 2) / 24.0 AS trend FROM b WINDOW wo AS (PARTITION BY event_type ORDER BY seq)),
      |d AS (SELECT *, value - trend AS detr, seq % 24 AS phase FROM t),
      |sr AS (SELECT event_type, phase, avg(detr) AS seasRaw
      | FROM d WHERE detr IS NOT NULL GROUP BY 1, 2),
      |sc AS (SELECT event_type, phase,
      |  seasRaw - avg(seasRaw) OVER (PARTITION BY event_type) AS seasonal
      | FROM sr),
      |r AS (SELECT d.event_type, d.seq, d.value, d.trend, sc.seasonal,
      |  d.detr - sc.seasonal AS resid
      | FROM d LEFT JOIN sc ON d.event_type = sc.event_type AND d.phase = sc.phase)"""
      .stripMargin

  // Kalman local-level replay: r from the per-key HUGEINT-exact
  // variance, then the (level, P) recursion as a recursive-CTE walk
  // joined one rn ahead (the holtOracle device). Shared by q322 (batch
  // kernel) and q334 (stream twin under the fit-batch/score-stream
  // model contract — identical output by construction).
  private lazy val kalmanOracle: String =
    """WITH RECURSIVE fx AS (SELECT user_id,
      |  (CASE WHEN value >= 0 THEN floor(value*10000.0+0.5)
      |        ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS fp
      |  FROM events),
      |ev AS (SELECT user_id::VARCHAR AS key, event_id AS seq, value,
      |  row_number() OVER (PARTITION BY user_id
      |    ORDER BY event_id, value) AS rn FROM events),
      |st AS (SELECT user_id::VARCHAR AS key, count(*)::BIGINT AS n,
      |  sum(fp::HUGEINT) AS s, sum(fp::HUGEINT * fp::HUGEINT) AS q
      |  FROM fx GROUP BY 1),
      |rr AS (SELECT key, n,
      |  (q::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
      |    / (n::DOUBLE - 1) / 1e8 AS r FROM st),
      |walk AS (
      | SELECT e.key, e.rn, e.seq, e.value, 0.0::DOUBLE AS score,
      |  e.value AS lvl, rr.r AS p, rr.r AS r, rr.n
      | FROM ev e JOIN rr USING (key) WHERE e.rn = 1
      | UNION ALL
      | SELECT key, rn, seq, value,
      |  CASE WHEN ok THEN abs(innov) / sqrt(ss)
      |   ELSE 0.0::DOUBLE END AS score,
      |  CASE WHEN ok THEN lvl0 + (pp / ss) * innov ELSE lvl0 END AS lvl,
      |  CASE WHEN ok THEN (1.0 - pp / ss) * pp ELSE p0 END AS p,
      |  r, n
      | FROM (SELECT e.key, e.rn, e.seq, e.value, w.lvl AS lvl0,
      |   w.p AS p0, w.r, w.n,
      |   w.p + w.r * 0.0625 AS pp,
      |   w.p + w.r * 0.0625 + w.r AS ss,
      |   e.value - w.lvl AS innov,
      |   (w.n >= 3 AND w.r > 0) AS ok
      |  FROM walk w JOIN ev e ON e.key = w.key AND e.rn = w.rn + 1))
      |SELECT key, seq, round(value, 4) AS value, round(score, 4) AS score
      |FROM walk""".stripMargin.replace("\n", " ")

  // EWMA chart replay: (e, f2t) walk; anchor row applies step 1.
  // Shared by q328 (batch kernel) and q335 (stream twin).
  private lazy val ewmaOracle: String =
    """WITH RECURSIVE fx AS (SELECT user_id,
      |  (CASE WHEN value >= 0 THEN floor(value*10000.0+0.5)
      |        ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS fp
      |  FROM events),
      |ev AS (SELECT user_id::VARCHAR AS key, event_id AS seq, value,
      |  row_number() OVER (PARTITION BY user_id
      |    ORDER BY event_id, value) AS rn FROM events),
      |st AS (SELECT user_id::VARCHAR AS key, count(*)::BIGINT AS n,
      |  sum(fp::HUGEINT) AS s, sum(fp::HUGEINT * fp::HUGEINT) AS q
      |  FROM fx GROUP BY 1),
      |ms AS (SELECT key, n, s::DOUBLE / n::DOUBLE / 1e4 AS mu,
      |  sqrt((q::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
      |    / (n::DOUBLE - 1)) / 1e4 AS sd FROM st),
      |walk AS (
      | SELECT e.key, e.rn, e.seq, e.value, m.mu, m.sd, m.n,
      |  CASE WHEN m.n >= 2 AND m.sd > 0
      |   THEN 0.25 * e.value + 0.75 * m.mu ELSE m.mu END AS ew,
      |  0.5625::DOUBLE AS f2t,
      |  CASE WHEN m.n >= 2 AND m.sd > 0
      |   THEN abs((0.25 * e.value + 0.75 * m.mu) - m.mu)
      |     / (3.0 * m.sd * sqrt(0.25 / 1.75 * (1.0 - 0.5625)))
      |   ELSE 0.0::DOUBLE END AS score
      | FROM ev e JOIN ms m USING (key) WHERE e.rn = 1
      | UNION ALL
      | SELECT key, rn, seq, value, mu, sd, n,
      |  CASE WHEN ok THEN 0.25 * value + 0.75 * ew0 ELSE ew0 END AS ew,
      |  f2t0 * 0.5625 AS f2t,
      |  CASE WHEN ok
      |   THEN abs((0.25 * value + 0.75 * ew0) - mu)
      |     / (3.0 * sd * sqrt(0.25 / 1.75 * (1.0 - f2t0 * 0.5625)))
      |   ELSE 0.0::DOUBLE END AS score
      | FROM (SELECT e.key, e.rn, e.seq, e.value, w.mu, w.sd, w.n,
      |   w.ew AS ew0, w.f2t AS f2t0, (w.n >= 2 AND w.sd > 0) AS ok
      |  FROM walk w JOIN ev e ON e.key = w.key AND e.rn = w.rn + 1))
      |SELECT key, seq, round(value, 4) AS value, round(score, 4) AS score
      |FROM walk""".stripMargin.replace("\n", " ")

  // Holt–Winters replay: same walk shape as holtOracle plus the seasonal
  // rotating queue carried as a DOUBLE[] (head consumed, update appended);
  // anchor state from exact 4dp fixed-point season means
  /** Shared Levinson–Durbin CTE chain (q248 PACF / q249 AR forecast):
    * 6dp-frozen ACF lists per event_type, then the recursion carrying
    * the coefficient list `a`, normalized innovation variance `e` and
    * PACF list `p` — inner dot as 12dp fixed-point integer sums,
    * mirroring SeqOps.levinsonModel bit-for-bit. Callers prepend
    * WITH RECURSIVE and read `rec WHERE k = 6`. */
  private lazy val levinsonCte: String = {
    val prod = "a[j]*rho[k+1-j]"
    val fp12 =
      s"(CASE WHEN ($prod) >= 0 THEN floor(($prod)*1e12+0.5) ELSE -floor(-($prod)*1e12+0.5) END)::BIGINT"
    s"""l AS (SELECT event_type, event_id, value,
       |  lag(value,1) OVER w AS l1, lag(value,2) OVER w AS l2,
       |  lag(value,3) OVER w AS l3, lag(value,4) OVER w AS l4,
       |  lag(value,5) OVER w AS l5, lag(value,6) OVER w AS l6
       | FROM events WINDOW w AS (PARTITION BY event_type ORDER BY event_id)),
       |ac AS (
       | SELECT event_type, 1 AS lag, round(corr(value, l1), 6) AS rho FROM l GROUP BY 1
       | UNION ALL SELECT event_type, 2, round(corr(value, l2), 6) FROM l GROUP BY 1
       | UNION ALL SELECT event_type, 3, round(corr(value, l3), 6) FROM l GROUP BY 1
       | UNION ALL SELECT event_type, 4, round(corr(value, l4), 6) FROM l GROUP BY 1
       | UNION ALL SELECT event_type, 5, round(corr(value, l5), 6) FROM l GROUP BY 1
       | UNION ALL SELECT event_type, 6, round(corr(value, l6), 6) FROM l GROUP BY 1),
       |r AS (SELECT event_type, list(rho ORDER BY lag) AS rho FROM ac
       | WHERE rho IS NOT NULL GROUP BY 1 HAVING count(*) = 6),
       |rec AS (
       | SELECT event_type, rho, 1 AS k, [rho[1]] AS a,
       |  1.0 - rho[1]*rho[1] AS e, [rho[1]] AS p FROM r
       | UNION ALL
       | SELECT event_type, rho, k + 1,
       |  list_transform(range(1, k + 1), j -> a[j] - kap * a[k + 1 - j]) || [kap],
       |  e * (1.0 - kap*kap),
       |  p || [kap]
       | FROM (
       |  SELECT *, CASE WHEN e <> 0 THEN
       |    (rho[k+1] - list_sum(list_transform(range(1, k+1), j -> $fp12))::DOUBLE / 1e12) / e
       |   ELSE 0.0 END AS kap
       |  FROM rec WHERE k < 6) t)""".stripMargin
  }

  private lazy val holtWintersOracle: String =
    """WITH RECURSIVE ev AS (SELECT user_id::VARCHAR AS key, event_id AS seq, value,
      |  row_number() OVER (PARTITION BY user_id ORDER BY event_id, value) AS rn
      | FROM events),
      |cnt AS (SELECT key, count(*) AS n FROM ev GROUP BY key),
      |f1 AS (SELECT key, sum((CASE WHEN value>=0 THEN floor(value*1e4+0.5)
      |  ELSE -floor(-value*1e4+0.5) END)::BIGINT) AS s1
      | FROM ev WHERE rn <= 7 GROUP BY key),
      |f2 AS (SELECT key, sum((CASE WHEN value>=0 THEN floor(value*1e4+0.5)
      |  ELSE -floor(-value*1e4+0.5) END)::BIGINT) AS s2
      | FROM ev WHERE rn > 7 AND rn <= 14 GROUP BY key),
      |mm AS (SELECT f1.key, (s1::DOUBLE/7)/1e4 AS m1,
      |  ((s2::DOUBLE/7)/1e4 - (s1::DOUBLE/7)/1e4)/7 AS tr0
      | FROM f1 JOIN f2 USING (key)),
      |sv0 AS (SELECT e.key, list(e.value - m.m1 ORDER BY e.rn) AS sv
      | FROM ev e JOIN mm m USING (key) WHERE e.rn <= 7 GROUP BY e.key),
      |walk AS (
      | SELECT m.key, 7 AS rn, 0.0::DOUBLE AS score,
      |  NULL::BIGINT AS seq, NULL::DOUBLE AS value,
      |  m.m1 AS lvl, m.tr0 AS trd, s.sv AS sv,
      |  0.0::DOUBLE AS rsum, 0.0::DOUBLE AS rsq, 0 AS rnr
      | FROM mm m JOIN sv0 s USING (key) JOIN cnt c USING (key) WHERE c.n > 14
      | UNION ALL
      | SELECT key, rn, score, seq, value,
      |  l2 AS lvl,
      |  0.25*(l2 - lvl0) + 0.75*trd0 AS trd,
      |  sv0l[2:] || [0.25*(value - l2) + 0.75*sh] AS sv,
      |  rsum0 + resid AS rsum, rsq0 + resid*resid AS rsq, rnr0 + 1 AS rnr
      | FROM (
      |  SELECT key, rn, seq, value, lvl0, trd0, sv0l, sh, resid,
      |   rsum0, rsq0, rnr0,
      |   CASE WHEN rn >= 15 AND std > 0 THEN abs(resid)/std
      |    ELSE 0.0::DOUBLE END AS score,
      |   0.5*(value - sh) + 0.5*(lvl0 + trd0) AS l2
      |  FROM (
      |   SELECT e.key, e.rn, e.seq, e.value, w.lvl AS lvl0, w.trd AS trd0,
      |    w.sv AS sv0l, w.sv[1] AS sh,
      |    e.value - ((w.lvl + w.trd) + w.sv[1]) AS resid,
      |    w.rsum AS rsum0, w.rsq AS rsq0, w.rnr AS rnr0,
      |    CASE WHEN w.rnr > 1
      |     THEN sqrt((w.rsq - w.rsum*w.rsum/w.rnr)/(w.rnr-1))
      |     ELSE 0.0::DOUBLE END AS std
      |   FROM walk w JOIN ev e ON e.key = w.key AND e.rn = w.rn + 1)))
      |SELECT key, seq, round(value,4) AS value, round(score,4) AS score
      |FROM walk WHERE rn > 7
      |UNION ALL
      |SELECT e.key, e.seq, round(e.value,4) AS value, 0.0 AS score
      |FROM ev e JOIN cnt c USING (key)
      |WHERE e.rn <= 7 OR c.n <= 14""".stripMargin.replace("\n", " ")

  private lazy val holtOracle: String =
    """WITH RECURSIVE ev AS (SELECT user_id::VARCHAR AS key, event_id AS seq, value,
      |  row_number() OVER (PARTITION BY user_id ORDER BY event_id, value) AS rn
      | FROM events),
      |walk AS (
      | SELECT key, rn, seq, value, 0.0::DOUBLE AS score,
      |  value AS lvl, 0.0::DOUBLE AS trd,
      |  0.0::DOUBLE AS rsum, 0.0::DOUBLE AS rsq, 0 AS rnr
      | FROM ev WHERE rn = 1
      | UNION ALL
      | SELECT key, rn, seq, value, score,
      |  CASE WHEN rn = 2 THEN value ELSE 0.5 * value + 0.5 * pred END AS lvl,
      |  CASE WHEN rn = 2 THEN value - lvl0
      |   ELSE 0.25 * ((0.5 * value + 0.5 * pred) - lvl0) + 0.75 * trd0 END AS trd,
      |  rsum0 + coalesce(resid, 0.0) AS rsum,
      |  rsq0 + coalesce(resid * resid, 0.0) AS rsq,
      |  rnr0 + CASE WHEN resid IS NOT NULL THEN 1 ELSE 0 END AS rnr
      | FROM (
      |  SELECT key, rn, seq, value, lvl0, trd0, rsum0, rsq0, rnr0, pred, resid,
      |   CASE WHEN resid IS NOT NULL AND std > 0
      |    THEN abs(resid) / std ELSE 0.0::DOUBLE END AS score
      |  FROM (
      |   SELECT e.key, e.rn, e.seq, e.value,
      |    w.lvl AS lvl0, w.trd AS trd0,
      |    w.rsum AS rsum0, w.rsq AS rsq0, w.rnr AS rnr0,
      |    CASE WHEN e.rn >= 3 THEN w.lvl + w.trd END AS pred,
      |    CASE WHEN e.rn >= 3 THEN e.value - (w.lvl + w.trd) END AS resid,
      |    CASE WHEN w.rnr > 1
      |     THEN sqrt((w.rsq - w.rsum * w.rsum / w.rnr) / (w.rnr - 1))
      |     ELSE 0.0::DOUBLE END AS std
      |   FROM walk w JOIN ev e ON e.key = w.key AND e.rn = w.rn + 1)))
      |SELECT key, seq, round(value, 4) AS value, round(score, 4) AS score
      |FROM walk""".stripMargin.replace("\n", " ")

  private lazy val markovChainOracle: String =
      s"""WITH $mkProbs,
         |scored AS (SELECT t.user_id, t.event_id,
         |  CASE WHEN count(p.prob) OVER w5 = 5 THEN avg(-ln(p.prob)) OVER w5 END AS score
         | FROM trans t LEFT JOIN probs p
         |   ON t.fromState = p.fromState AND t.toState = p.toState
         | WINDOW w5 AS (PARTITION BY t.user_id ORDER BY t.event_id
         |   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
         |SELECT user_id, event_id, round(score,4) AS score,
         | CASE WHEN score IS NULL THEN 'I'
         |  WHEN max(CASE WHEN score > 1.5 THEN 1 ELSE 0 END) OVER
         |   (PARTITION BY user_id ORDER BY event_id
         |    ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) = 1 THEN 'O'
         |  ELSE 'N' END AS tag
         |FROM scored""".stripMargin.replace("\n", " ")

  private lazy val changePointScaledOracle: String =
      """WITH s AS (SELECT event_type, event_id, value,
        |  count(value) OVER lw AS cnt_l, count(value) OVER rw AS cnt_r,
        |  abs(avg(value) OVER rw - avg(value) OVER lw) /
        |   sqrt(var_samp(value) OVER lw / 30.0 + var_samp(value) OVER rw / 30.0) AS stat
        | FROM events WHERE value IS NOT NULL
        | WINDOW lw AS (PARTITION BY event_type ORDER BY event_id
        |   ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING),
        |  rw AS (PARTITION BY event_type ORDER BY event_id
        |   ROWS BETWEEN CURRENT ROW AND 29 FOLLOWING))
        |SELECT event_type::VARCHAR AS key, event_id AS seq, round(value,4) AS value,
        | round(stat,4) AS stat
        |FROM s WHERE cnt_l = 30 AND cnt_r = 30 AND stat >= 3.0"""
        .stripMargin.replace("\n", " ")

  /** Shared strided-subsample CTE prefix for the two trend oracles:
    * 4dp fixed-point values, per-key ordinal i, stride ceil(n/150). */
  private val trendPts =
    """base AS (SELECT event_type, event_id, value,
      |  (CASE WHEN value>=0 THEN floor(value*10000.0+0.5)
      |        ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS fp
      |  FROM events WHERE value IS NOT NULL),
      |o AS (SELECT event_type, fp, row_number() OVER (PARTITION BY
      |    event_type ORDER BY event_id ASC) AS i,
      |  count(*) OVER (PARTITION BY event_type) AS n FROM base),
      |pts AS (SELECT event_type, i::BIGINT AS i, fp FROM o
      |  WHERE (i::BIGINT - 1) % CAST(ceil(n::DOUBLE/150) AS BIGINT) = 0)"""
      .stripMargin

  val oracleSql: Map[String, String] = Map(
    "q287_mann_kendall" ->
      s"""WITH $trendPts,
         |p AS (SELECT l.event_type, l.fp AS fl, r.fp AS fr FROM pts l
         |  JOIN pts r ON l.event_type = r.event_type AND l.i < r.i),
         |s AS (SELECT event_type, sum(CASE WHEN fr > fl THEN 1
         |    WHEN fr < fl THEN -1 ELSE 0 END)::BIGINT AS s_stat
         |  FROM p GROUP BY 1),
         |nu AS (SELECT event_type, count(*)::BIGINT AS n_used
         |  FROM pts GROUP BY 1),
         |tg AS (SELECT event_type, fp, count(*)::BIGINT AS t
         |  FROM pts GROUP BY 1, 2),
         |ti AS (SELECT event_type,
         |  sum(t*(t-1)*(2*t+5))::BIGINT AS tc FROM tg GROUP BY 1),
         |fin AS (SELECT s.event_type, s_stat, n_used,
         |  (n_used*(n_used-1)*(2*n_used+5) - tc)::DOUBLE / 18.0 AS var_s
         |  FROM s JOIN nu USING (event_type) JOIN ti USING (event_type)),
         |z AS (SELECT *, CASE WHEN s_stat > 0
         |    THEN (s_stat-1)::DOUBLE / sqrt(var_s)
         |  WHEN s_stat < 0 THEN (s_stat+1)::DOUBLE / sqrt(var_s)
         |  ELSE 0.0 END AS z_stat FROM fin)
         |SELECT event_type, s_stat, n_used, round(var_s, 4) AS var_s,
         | round(z_stat, 4) AS z_stat,
         | CASE WHEN z_stat > 1.96 THEN 'rising'
         |      WHEN z_stat < -1.96 THEN 'falling'
         |      ELSE 'none' END AS trend
         |FROM z""".stripMargin.replace("\n", " "),
    "q288_theil_sen" ->
      s"""WITH $trendPts,
         |p AS (SELECT l.event_type, l.i AS il, r.i AS ir,
         |  l.fp AS fl, r.fp AS fr FROM pts l
         |  JOIN pts r ON l.event_type = r.event_type AND l.i < r.i),
         |sl AS (SELECT event_type, il, ir,
         |  (fr - fl)::DOUBLE / ((ir - il)::DOUBLE * 1e4) AS sl FROM p),
         |m AS (SELECT *, row_number() OVER (PARTITION BY event_type
         |    ORDER BY sl ASC, il ASC, ir ASC) AS rn,
         |  count(*) OVER (PARTITION BY event_type) AS m FROM sl),
         |med AS (SELECT event_type, avg(sl) AS slope,
         |  min(m)::BIGINT AS n_pairs FROM m
         |  WHERE rn = (m+1)//2 OR rn = m//2 + 1 GROUP BY 1),
         |res AS (SELECT pts.event_type, pts.i, med.slope, med.n_pairs,
         |  pts.fp::DOUBLE/1e4 - med.slope*pts.i AS r
         |  FROM pts JOIN med USING (event_type)),
         |rr AS (SELECT *, row_number() OVER (PARTITION BY event_type
         |    ORDER BY r ASC, i ASC) AS rn,
         |  count(*) OVER (PARTITION BY event_type) AS c FROM res)
         |SELECT event_type, round(min(slope), 4) AS slope,
         | min(n_pairs)::BIGINT AS n_pairs, min(c)::BIGINT AS n_used,
         | round(avg(r), 4) AS intercept
         |FROM rr WHERE rn = (c+1)//2 OR rn = c//2 + 1
         |GROUP BY event_type""".stripMargin.replace("\n", " "),
    "q306_sax" -> {
      // ::DOUBLE on the constant p: DuckDB otherwise parses the literal
      // as DECIMAL and the probit Horner chain overflows decimal scale
      val sym = (1 to 5).map(i =>
        s"(CASE WHEN paa > ${StatQueries.probitSql(
          (i.toDouble / 6).toString + "::DOUBLE")}" +
          " THEN 1 ELSE 0 END)").mkString(" + ")
      """WITH fx AS (SELECT event_type, event_id, value,
        |  (CASE WHEN value>=0 THEN floor(value*10000.0+0.5)
        |   ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS fp
        |  FROM events WHERE value IS NOT NULL),
        |st AS (SELECT event_type, count(*)::HUGEINT AS n,
        |  sum(fp::HUGEINT) AS s, sum(fp::HUGEINT*fp::HUGEINT) AS q
        |  FROM fx GROUP BY 1),
        |mdl AS (SELECT event_type, s::DOUBLE/n::DOUBLE/1e4 AS mu,
        |  sqrt((q::DOUBLE - s::DOUBLE*s::DOUBLE/n::DOUBLE)
        |    /(n::DOUBLE-1))/1e4 AS sd
        |  FROM st WHERE n > 1),
        |fr AS (SELECT f.event_type,
        |  CAST(floor((row_number() OVER (PARTITION BY f.event_type
        |    ORDER BY f.event_id) - 1) / 8) AS BIGINT) AS frame,
        |  (CASE WHEN (f.value - m.mu)/m.sd >= 0
        |    THEN floor(((f.value - m.mu)/m.sd)*1000000.0+0.5)
        |    ELSE -floor(-((f.value - m.mu)/m.sd)*1000000.0+0.5)
        |   END)::BIGINT AS z6
        |  FROM fx f JOIN mdl m USING (event_type)),
        |ag AS (SELECT event_type, frame, count(*)::BIGINT AS n_pts,
        |  sum(z6::HUGEINT) AS zs FROM fr GROUP BY 1, 2),
        |pa AS (SELECT *, zs::DOUBLE / n_pts / 1e6 AS paa FROM ag),
        |sy AS (SELECT *, (SYMEXPR)::BIGINT AS sym FROM pa)
        |SELECT event_type, frame, n_pts, round(paa, 4) AS paa, sym,
        | substr('abcdefghijklmnopqrst', CAST(sym AS INT) + 1, 1) AS letter
        |FROM sy""".stripMargin.replace("SYMEXPR", sym).replace("\n", " ")
    },
    "q309_ljung_box" -> {
      val lagCols = (1 to 10).map(k => s"lag(value, $k) OVER w AS l$k")
        .mkString(", ")
      val acU = (1 to 10).map(k =>
        s"SELECT event_type, $k AS lag, corr(value, l$k) AS ac" +
          " FROM l GROUP BY 1").mkString(" UNION ALL ")
      val rho6 = "((CASE WHEN ac >= 0 THEN floor(ac*1000000.0+0.5)" +
        " ELSE -floor(-ac*1000000.0+0.5) END)::BIGINT::DOUBLE / 1e6)"
      s"""WITH l AS (SELECT event_type, value, $lagCols FROM events
         |  WINDOW w AS (PARTITION BY event_type ORDER BY event_id)),
         |ac AS ($acU),
         |nn AS (SELECT event_type, count(value)::BIGINT AS n
         |  FROM events GROUP BY 1),
         |t AS (SELECT a.event_type, a.lag,
         |  $rho6 * $rho6 / (n - lag) AS t
         |  FROM ac a JOIN nn USING (event_type) WHERE ac IS NOT NULL),
         |g AS (SELECT event_type, count(*)::BIGINT AS h,
         |  list_aggregate(list(t ORDER BY lag), 'sum') AS s
         |  FROM t GROUP BY 1 HAVING count(*) = 10)
         |SELECT g.event_type, nn.n, g.h,
         | round(nn.n::DOUBLE * (nn.n::DOUBLE + 2) * g.s, 4) AS q_stat
         |FROM g JOIN nn USING (event_type)"""
        .stripMargin.replace("\n", " ")
    },
    "q298_hodges_lehmann" ->
      s"""WITH $trendPts,
         |p AS (SELECT l.event_type, l.i AS il, r.i AS ir,
         |  l.fp + r.fp AS w FROM pts l
         |  JOIN pts r ON l.event_type = r.event_type AND l.i <= r.i),
         |m AS (SELECT *, row_number() OVER (PARTITION BY event_type
         |    ORDER BY w ASC, il ASC, ir ASC) AS rn,
         |  count(*) OVER (PARTITION BY event_type) AS m FROM p),
         |med AS (SELECT event_type, min(m)::BIGINT AS n_walsh,
         |  avg(w) / 2e4 AS hl FROM m
         |  WHERE rn = (m+1)//2 OR rn = m//2 + 1 GROUP BY 1),
         |nu AS (SELECT event_type, count(*)::BIGINT AS n_used
         |  FROM pts GROUP BY 1)
         |SELECT event_type, n_walsh, round(hl, 4) AS hl, n_used
         |FROM med JOIN nu USING (event_type)"""
        .stripMargin.replace("\n", " "),
    "q227_locf_stream" ->
      """SELECT user_id::VARCHAR AS entity, event_id AS seq,
        | round(value, 4) AS value,
        | round(last_value(value IGNORE NULLS) OVER w, 4) AS filled,
        | value IS NULL AND last_value(value IGNORE NULLS) OVER w
        |   IS NOT NULL AS "wasImputed"
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        | ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""
        .stripMargin.replace("\n", " "),
    "q225_resample" -> {
      val fp4 = "(CASE WHEN value >= 0 THEN floor(value*1e4+0.5)" +
        " ELSE -floor(-value*1e4+0.5) END)::BIGINT"
      s"""WITH b AS (SELECT user_id,
         |  epoch_ns(ts) // 21600000000000 AS _b, count(*)::BIGINT AS n,
         |  sum($fp4)::BIGINT AS s4
         | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |sp AS (SELECT user_id, unnest(generate_series(min(_b), max(_b)))
         |   AS _b FROM b GROUP BY user_id),
         |j AS (SELECT sp.user_id, sp._b, coalesce(b.n, 0)::BIGINT AS n,
         |  CASE WHEN coalesce(b.n, 0) > 0
         |   THEN (b.s4::DOUBLE / 10000.0) / b.n END AS _avg
         | FROM sp LEFT JOIN b ON b.user_id = sp.user_id AND b._b = sp._b)
         |SELECT user_id, _b AS bucket,
         | (_b * 21600000000000)::BIGINT AS bucket_ts, n, n = 0 AS gap,
         | round(last_value(_avg IGNORE NULLS) OVER (PARTITION BY user_id
         |   ORDER BY _b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
         |   AS value
         |FROM j""".stripMargin.replace("\n", " ")
    },
    "q220_motif_stream" ->
      """WITH m AS (SELECT user_id, event_id, event_type,
        |  lag(event_type, 2) OVER w AS p2, lag(event_type, 1) OVER w AS p1
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |f AS (SELECT *, coalesce(p2 = 'error' AND p1 = 'error'
        |  AND event_type = 'error', FALSE) AS matched FROM m)
        |SELECT user_id::VARCHAR AS entity, event_id AS seq,
        | event_type AS state, matched,
        | sum(CASE WHEN matched THEN 1 ELSE 0 END) OVER (
        |   PARTITION BY user_id ORDER BY event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |   AS "matchesSoFar"
        |FROM f""".stripMargin.replace("\n", " "),
    "q216_impute_locf" ->
      """SELECT event_id, user_id, round(value, 4) AS value,
        | round(last_value(value IGNORE NULLS) OVER (PARTITION BY user_id
        |   ORDER BY event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS filled,
        | value IS NULL AND last_value(value IGNORE NULLS)
        |   OVER (PARTITION BY user_id ORDER BY event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) IS NOT NULL
        |   AS was_imputed
        |FROM events""".stripMargin.replace("\n", " "),
    // Spectral-residue saliency replayed as a naive O(w²) DFT per
    // half-overlapping window (SeriesKernels.spectralResidue): forward DFT
    // → log-amplitude minus its 3-bin moving average → inverse DFT with
    // original phases → overlap-added saliency → minus 7-point
    // neighborhood average, clamped at 0. The kernel's radix-2 FFT and
    // this direct DFT agree to ~1e-12 (different summation trees), which
    // the shared 4dp round absorbs — exact-match verified at sf0.01 and
    // sf0.1. Quadratic-per-window is fine for the oracle; the kernel keeps
    // the O(w log w) FFT as the scale path.
    "q24_spectral_residue" ->
      """WITH e AS (SELECT event_type::VARCHAR AS key, event_id AS seq, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY event_id, value) - 1 AS p,
        |  count(*) OVER (PARTITION BY event_type) AS n
        | FROM events),
        |offs AS (SELECT key, unnest(range(0, ((n - 64) // 32) + 1)) AS w
        | FROM (SELECT DISTINCT key, n FROM e) WHERE n >= 64),
        |wv AS MATERIALIZED (SELECT o.key, o.w, e.p - o.w*32 AS i, e.value AS x
        | FROM offs o JOIN e ON e.key = o.key
        | WHERE e.p BETWEEN o.w*32 AND o.w*32 + 63),
        |dft AS MATERIALIZED (SELECT key, w, t.k,
        |  sum(x * cos(-2*pi()*t.k*i/64.0)) AS re,
        |  sum(x * sin(-2*pi()*t.k*i/64.0)) AS im
        | FROM wv CROSS JOIN (SELECT unnest(range(64)) AS k) t GROUP BY key, w, t.k),
        |sp AS MATERIALIZED (SELECT key, w, k, re, im,
        |  sqrt(re*re + im*im) AS amp,
        |  ln(sqrt(re*re + im*im) + 1e-12) AS la
        | FROM dft),
        |rs AS MATERIALIZED (SELECT key, w, k, re, im, amp,
        |  la - avg(la) OVER (PARTITION BY key, w ORDER BY k
        |    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS resid
        | FROM sp),
        |r2 AS (SELECT key, w, k,
        |  exp(resid) * CASE WHEN amp > 1e-12 THEN re/amp ELSE 0.0 END AS re2,
        |  exp(resid) * CASE WHEN amp > 1e-12 THEN im/amp ELSE 0.0 END AS im2
        | FROM rs),
        |idft AS MATERIALIZED (SELECT key, w, t.i,
        |  sum(re2*cos(2*pi()*k*t.i/64.0) - im2*sin(2*pi()*k*t.i/64.0))/64.0 AS yr,
        |  sum(re2*sin(2*pi()*k*t.i/64.0) + im2*cos(2*pi()*k*t.i/64.0))/64.0 AS yi
        | FROM r2 CROSS JOIN (SELECT unnest(range(64)) AS i) t GROUP BY key, w, t.i),
        |sal AS (SELECT key, w*32 + i AS p, sqrt(yr*yr + yi*yi) AS h FROM idft),
        |s AS MATERIALIZED (SELECT e.key, e.p, e.seq, e.value,
        |  CASE WHEN count(g.h) > 0 THEN sum(g.h)/count(g.h) ELSE 0.0 END AS sv
        | FROM e LEFT JOIN sal g ON g.key = e.key AND g.p = e.p
        | WHERE e.n >= 64
        | GROUP BY e.key, e.p, e.seq, e.value)
        |SELECT key, seq, round(value, 4) AS value,
        |  round(greatest(0.0, sv - avg(sv) OVER (PARTITION BY key ORDER BY p
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)), 4) AS score
        |FROM s""".stripMargin.replace("\n", " "),
    "q27_one_step_ahead_fb" ->
      s"""WITH RECURSIVE $osaWalk
         |SELECT key, seq, round(value, 4) AS value, round(score, 4) AS score
         |FROM walk""".stripMargin.replace("\n", " "),
    // Holt recursion replay: state = (level, trend, resid sum/sumsq/count);
    // init l₂=x₂, b₂=x₂−x₁; score from PRIOR residual std, exactly as
    // SeriesKernels.holtForecast — same fixed IEEE op order, so the two
    // engines agree bit-for-bit before the shared 4dp round.
    "q196_holt_forecast" -> holtOracle,
    // DTW cell-at-a-time replay: the DP matrix rides the recursion as a
    // growing DOUBLE[] (cell c depends on cells c-1, c-m, c-m-1 only);
    // every cell's value is evaluation-order-independent, so the
    // row-major Scala DP and this walk agree exactly
    "q323_dtw" ->
      """WITH RECURSIVE f AS (SELECT user_id,
        |  epoch_ns(ts) // 86400000000000 AS day,
        |  (CASE WHEN value >= 0 THEN floor(value*10000.0+0.5)
        |        ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS fp
        |  FROM events WHERE value IS NOT NULL),
        |d AS (SELECT user_id, day, sum(fp::HUGEINT) AS s,
        |  count(*)::BIGINT AS c FROM f GROUP BY 1, 2),
        |u AS (SELECT user_id::VARCHAR AS key,
        |  list(s::DOUBLE / c::DOUBLE / 1e4 ORDER BY day) AS xs
        |  FROM d GROUP BY 1),
        |g0 AS (SELECT day, sum(fp::HUGEINT) AS s, count(*)::BIGINT AS c
        |  FROM f GROUP BY 1),
        |g AS (SELECT list(s::DOUBLE / c::DOUBLE / 1e4 ORDER BY day) AS ys
        |  FROM g0),
        |dims AS (SELECT key, xs, ys, len(xs)::INTEGER AS n,
        |  len(ys)::INTEGER AS m FROM u, g),
        |walk AS (
        | SELECT key, xs, ys, n, m, 1 AS c, [abs(xs[1] - ys[1])] AS dp
        | FROM dims
        | UNION ALL
        | SELECT key, xs, ys, n, m, c + 1,
        |  dp || [abs(xs[(c // m) + 1] - ys[(c % m) + 1]) + least(
        |    CASE WHEN (c % m) > 0 THEN dp[c]
        |     ELSE 'infinity'::DOUBLE END,
        |    CASE WHEN (c // m) > 0 THEN dp[c - m + 1]
        |     ELSE 'infinity'::DOUBLE END,
        |    CASE WHEN (c // m) > 0 AND (c % m) > 0 THEN dp[c - m]
        |     ELSE 'infinity'::DOUBLE END)]
        | FROM walk WHERE c < n * m)
        |SELECT key, n, m, round(dp[n * m], 4) AS dtw_dist,
        | round(dp[n * m] / (n + m), 4) AS dtw_norm
        |FROM walk WHERE c = n * m""".stripMargin.replace("\n", " "),
    // EWMA chart replay: (e, f2t) walk; anchor row applies step 1.
    // Shared by q328 (batch kernel) and q335 (stream twin, q100 device)
    "q328_ewma_chart" -> ewmaOracle,
    "q335_ewma_stream" -> ewmaOracle,
    // Kalman replay shared by q322 (batch) and q334 (stream twin)
    "q322_kalman" -> kalmanOracle,
    "q334_kalman_stream" -> kalmanOracle,
    // spectral-entropy replay: 8dp-frozen DFT terms → HUGEINT sums →
    // ordered folds for Σp and −Σ q·ln q (trig/ln parity per q24)
    "q361_spectral_entropy" -> {
      val fp8 = (e: String) =>
        s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e8+0.5) " +
          s"ELSE -floor(-($e)*1e8+0.5) END)::BIGINT"
      s"""WITH e AS (SELECT event_type::VARCHAR AS key, value,
         |  row_number() OVER (PARTITION BY event_type
         |    ORDER BY event_id ASC, value ASC) - 1 AS p,
         |  count(*) OVER (PARTITION BY event_type) AS n
         |  FROM events WHERE value IS NOT NULL),
         |b AS (SELECT key, value AS x, p FROM e WHERE n >= 64 AND p < 64),
         |t AS (SELECT key, f.k,
         |  ${fp8("x * cos(-2*pi()*f.k*p/64)")} AS re8,
         |  ${fp8("x * sin(-2*pi()*f.k*p/64)")} AS im8
         |  FROM b CROSS JOIN (SELECT unnest(range(1, 32)) AS k) f),
         |g AS (SELECT key, k, sum(re8)::HUGEINT AS re,
         |  sum(im8)::HUGEINT AS im FROM t GROUP BY 1, 2),
         |sp AS (SELECT key, k,
         |  (re::DOUBLE / 1e8) * (re::DOUBLE / 1e8)
         |   + (im::DOUBLE / 1e8) * (im::DOUBLE / 1e8) AS pk FROM g),
         |f1 AS (SELECT key,
         |  list_aggregate(list(pk ORDER BY k), 'sum') AS power,
         |  list(pk ORDER BY k) AS ps FROM sp GROUP BY 1)
         |SELECT key, round(power, 4) AS power,
         | round(list_aggregate(list_transform(ps, q -> CASE WHEN q > 0
         |   THEN -(q / power) * ln(q / power) ELSE 0.0 END), 'sum')
         |  / ln(31.0), 4) AS entropy
         |FROM f1""".stripMargin.replace("\n", " ")
    },
    // binary segmentation replay: same prefix frame, same 6dp-frozen
    // g(t), per-segment QUALIFY arg-max (ties → smaller t)
    "q359_binary_seg" -> {
      val fp6 = (e: String) =>
        s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e6+0.5) " +
          s"ELSE -floor(-($e)*1e6+0.5) END)::BIGINT"
      def gExpr(l: String, r: String, sl: String, sr: String) = fp6(
        s"sqrt((t - ($l) + 1)::DOUBLE * (($r) - t)::DOUBLE " +
          s"/ ((t - ($l) + 1)::DOUBLE + (($r) - t)::DOUBLE)) " +
          s"* abs((s - ($sl))::DOUBLE / (t - ($l) + 1)::DOUBLE / 1e4 " +
          s"- (($sr) - s)::DOUBLE / (($r) - t)::DOUBLE / 1e4)")
      def cand(src: String, l: String, r: String, sl: String, sr: String,
          level: Int) =
        s"""SELECT key, $level AS level, ($l)::BIGINT AS seg_start,
           |  ($r)::BIGINT AS seg_end, t AS split,
           |  ${gExpr(l, r, sl, sr)} AS g6, sigma
           | FROM $src WHERE t - ($l) + 1 >= 50 AND ($r) - t >= 50
           | QUALIFY row_number() OVER (PARTITION BY key
           |   ORDER BY ${gExpr(l, r, sl, sr)} DESC, t ASC) = 1"""
          .stripMargin
      s"""WITH fx AS (SELECT event_type AS key, event_id,
         |  (CASE WHEN value >= 0 THEN floor(value*10000.0+0.5)
         |        ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS fp
         |  FROM events WHERE value IS NOT NULL),
         |b AS (SELECT key, fp AS v,
         |  row_number() OVER w AS t, sum(fp) OVER (PARTITION BY key
         |    ORDER BY event_id ASC, fp ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
         |  FROM fx WINDOW w AS (PARTITION BY key
         |    ORDER BY event_id ASC, fp ASC)),
         |pf AS (SELECT key, v, t, s,
         |  max(t) OVER (PARTITION BY key) AS n,
         |  sum(v) OVER (PARTITION BY key) AS st,
         |  sum(v::HUGEINT * v::HUGEINT) OVER (PARTITION BY key) AS q
         |  FROM b),
         |pf2 AS (SELECT *, sqrt((q::DOUBLE - st::DOUBLE * st::DOUBLE
         |   / n::DOUBLE) / (n::DOUBLE - 1)) / 1e4 AS sigma FROM pf),
         |l0 AS (${cand("pf2", "1", "n", "0", "st", 0)}),
         |j AS (SELECT pf2.*, l0.split AS t1, l0s.s1 FROM pf2
         |  JOIN l0 USING (key)
         |  JOIN (SELECT p.key, p.s AS s1 FROM pf2 p JOIN l0
         |     ON l0.key = p.key AND p.t = l0.split) l0s USING (key)),
         |lft AS (${cand("(SELECT * FROM j WHERE t <= t1)",
           "1", "t1", "0", "s1", 1)}),
         |rgt AS (${cand("(SELECT * FROM j WHERE t > t1)",
           "t1 + 1", "n", "s1", "st", 1)}),
         |u AS (SELECT * FROM l0 UNION ALL SELECT * FROM lft
         |  UNION ALL SELECT * FROM rgt)
         |SELECT key, level, seg_start, seg_end, split,
         | round(g6::DOUBLE / 1e6, 4) AS g,
         | round(g6::DOUBLE / 1e6 / sigma, 4) AS z,
         | (g6::DOUBLE / 1e6 / sigma) > 3.0 AS significant
         |FROM u""".stripMargin.replace("\n", " ")
    },
    "q235_holt_winters" -> holtWintersOracle,
    "q237_burst" -> burstOracle,
    // the STREAMING twin batch-executed (q100 pattern) — same oracle,
    // gating the flatMapGroupsWithState code path itself
    "q197_holt_stream" -> holtOracle,
    // Hampel filter replay: the centered frame's sorted list median and
    // MAD are exact element picks (odd frame — no averaging), so the
    // score is a ratio of identically-chosen doubles in both engines.
    "q199_hampel" ->
      """WITH w AS (SELECT user_id, event_id, value,
        |  list_sort(list(value) OVER win) AS arr,
        |  count(*) OVER win AS cnt
        | FROM events
        | WINDOW win AS (PARTITION BY user_id ORDER BY event_id, value
        |   ROWS BETWEEN 7 PRECEDING AND 7 FOLLOWING)),
        |m AS (SELECT *, arr[8] AS med FROM w),
        |d AS (SELECT *, list_sort(list_transform(arr, x -> abs(x - med)))[8] AS mad
        | FROM m),
        |sc AS (SELECT user_id, event_id, value, cnt,
        |  CASE WHEN cnt = 15 AND mad > 0
        |   THEN abs(value - med) / (1.4826 * mad) ELSE 0.0 END AS score
        | FROM d)
        |SELECT user_id, event_id, round(value, 4) AS value, round(score, 4) AS score,
        | CASE WHEN cnt < 15 THEN 'I' WHEN score > 3.0 THEN 'O' ELSE 'N' END AS tag
        |FROM sc""".stripMargin.replace("\n", " "),
    // OLS trend residuals (SeqOps.trendResiduals): every regression moment
    // is an order-exact integer sum of 6dp-quantized values (fixedPointLong
    // pattern), so slope/intercept/std — and hence resid/score — replay
    // bit-for-bit from the same fixed double expressions.
    "q198_trend_resid" ->
      """WITH e AS (SELECT user_id, event_id, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id, value)::BIGINT AS rn,
        |  (CASE WHEN value >= 0 THEN floor(value * 1000000.0 + 0.5)
        |    ELSE -floor(-value * 1000000.0 + 0.5) END)::BIGINT AS v6
        | FROM events),
        |m AS (SELECT user_id, count(*)::BIGINT AS n, sum(rn)::BIGINT AS sr,
        |  sum(v6)::BIGINT AS sv, sum(rn * v6)::BIGINT AS srv,
        |  sum(rn * rn)::BIGINT AS srr
        | FROM e GROUP BY user_id),
        |f AS (SELECT e.user_id, e.event_id, e.value, e.rn, m.n, m.sr, m.sv,
        |  CASE WHEN (n::DOUBLE * srr::DOUBLE - sr::DOUBLE * sr::DOUBLE) > 0
        |   THEN (n::DOUBLE * (srv::DOUBLE / 1000000.0) - sr::DOUBLE * (sv::DOUBLE / 1000000.0))
        |     / (n::DOUBLE * srr::DOUBLE - sr::DOUBLE * sr::DOUBLE)
        |   ELSE 0.0 END AS slope
        | FROM e JOIN m USING (user_id)),
        |r AS (SELECT user_id, event_id, value, n,
        |  value - (((sv::DOUBLE / 1000000.0) - slope * sr::DOUBLE) / n::DOUBLE
        |    + slope * rn::DOUBLE) AS resid
        | FROM f),
        |r4 AS (SELECT *, (CASE WHEN resid >= 0 THEN floor(resid * 10000.0 + 0.5)
        |   ELSE -floor(-resid * 10000.0 + 0.5) END)::BIGINT AS q
        | FROM r),
        |s AS (SELECT user_id, sum(q)::BIGINT AS s1, sum(q * q)::BIGINT AS s2
        | FROM r4 GROUP BY user_id),
        |z AS (SELECT r4.*, CASE WHEN n > 1
        |   THEN sqrt((s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / n::DOUBLE) / (n::DOUBLE - 1)) / 10000.0
        |   ELSE 0.0 END AS std
        | FROM r4 JOIN s USING (user_id))
        |SELECT user_id, event_id, round(value, 4) AS value, round(resid, 4) AS resid,
        | round(CASE WHEN std > 0 THEN abs(resid) / std ELSE 0.0 END, 4) AS score
        |FROM z""".stripMargin.replace("\n", " "),
    "q86_osa_resid_stats" ->
      s"""WITH RECURSIVE $osaWalk,
         |last AS (SELECT *, row_number() OVER (PARTITION BY key ORDER BY rn DESC)
         |   AS rk FROM walk)
         |SELECT key, rnr::BIGINT AS n,
         | round(CASE WHEN rnr > 0 THEN rsum / rnr ELSE 0.0 END, 4) AS mean,
         | round(CASE WHEN rnr > 1
         |   THEN sqrt((rsq - rsum * rsum / rnr) / (rnr - 1)) ELSE 0.0 END, 4) AS std
         |FROM last WHERE rk = 1""".stripMargin.replace("\n", " "),
    // two-sample KS changepoint (misc/ChangePointDetector.scala:108-139):
    // for each position with full 50-row flanking windows, D = max ECDF
    // gap over the union of both windows; RANGE frame consumes tie groups
    // exactly like the kernel's merge walk. Emit positions with D ≥ 0.25.
    "q25_changepoint_ks" ->
      """WITH e AS (SELECT event_type::VARCHAR AS key, event_id AS seq, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY event_id, value) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n
        | FROM events),
        |w AS (SELECT i.key, i.rn AS c, i.seq, i.value,
        |  CASE WHEN j.rn < i.rn THEN 0 ELSE 1 END AS src, j.value AS v
        | FROM e i JOIN e j ON i.key = j.key AND j.rn BETWEEN i.rn - 50 AND i.rn + 49
        | WHERE i.rn > 50 AND i.rn + 49 <= i.n),
        |g AS (SELECT key, c, seq, value,
        |  abs(sum(CASE WHEN src = 0 THEN 1 ELSE 0 END) OVER cw / 50.0
        |    - sum(src) OVER cw / 50.0) AS gap
        | FROM w
        | WINDOW cw AS (PARTITION BY key, c ORDER BY v
        |   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |d AS (SELECT key, c, seq, value, max(gap) AS score FROM g GROUP BY 1, 2, 3, 4)
        |SELECT key, seq, round(value,4) AS value, round(score,4) AS score
        |FROM d WHERE score >= 0.25 - 1e-9""".stripMargin.replace("\n", " "),
    // two-sample Cramér–von Mises over the same 50/50 flanking windows
    // (ChangePointDetector.scala:108-112 stat family): walk the combined
    // 100 values in (value, src) order — src breaks ties left-window-first,
    // matching the kernel's stable sort of a ++ b — accumulating
    // d = ECDF_a − ECDF_b after each element; T = nm/N² · Σ d² = Σ d²/4.
    "q25b_changepoint_cvm" ->
      """WITH e AS (SELECT event_type::VARCHAR AS key, event_id AS seq, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY event_id, value) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n
        | FROM events),
        |w AS (SELECT i.key, i.rn AS c, i.seq, i.value,
        |  CASE WHEN j.rn < i.rn THEN 0 ELSE 1 END AS src, j.value AS v
        | FROM e i JOIN e j ON i.key = j.key AND j.rn BETWEEN i.rn - 50 AND i.rn + 49
        | WHERE i.rn > 50 AND i.rn + 49 <= i.n),
        |r AS (SELECT key, c, seq, value,
        |  row_number() OVER cw AS h,
        |  sum(CASE WHEN src = 0 THEN 1 ELSE 0 END) OVER
        |   (PARTITION BY key, c ORDER BY v, src
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca
        | FROM w WINDOW cw AS (PARTITION BY key, c ORDER BY v, src)),
        |d AS (SELECT key, seq, value,
        |  sum(pow(ca/50.0 - (h - ca)/50.0, 2)) / 4.0 AS score
        | FROM r GROUP BY 1, 2, 3)
        |SELECT key, seq, round(value,4) AS value, round(score + 1e-9,4) AS score
        |FROM d WHERE score >= 0.5 - 1e-9""".stripMargin.replace("\n", " "),
    // two-sample Anderson-Darling (k=2, unadjusted) over the same windows:
    // same (value, src) tie-ordered walk; for each of the first N−1
    // positions h, term = (ca·N − n·h)²/(h·(N−h)); A² = Σ term/(n·m).
    "q25c_changepoint_ad" ->
      """WITH e AS (SELECT event_type::VARCHAR AS key, event_id AS seq, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY event_id, value) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n
        | FROM events),
        |w AS (SELECT i.key, i.rn AS c, i.seq, i.value,
        |  CASE WHEN j.rn < i.rn THEN 0 ELSE 1 END AS src, j.value AS v
        | FROM e i JOIN e j ON i.key = j.key AND j.rn BETWEEN i.rn - 50 AND i.rn + 49
        | WHERE i.rn > 50 AND i.rn + 49 <= i.n),
        |r AS (SELECT key, c, seq, value,
        |  row_number() OVER cw AS h,
        |  sum(CASE WHEN src = 0 THEN 1 ELSE 0 END) OVER
        |   (PARTITION BY key, c ORDER BY v, src
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca
        | FROM w WINDOW cw AS (PARTITION BY key, c ORDER BY v, src)),
        |d AS (SELECT key, seq, value,
        |  sum(CASE WHEN h < 100
        |   THEN pow(ca*100.0 - 50.0*h, 2) / (h*(100.0-h)) END) / 2500.0 AS score
        | FROM r GROUP BY 1, 2, 3)
        |SELECT key, seq, round(value,4) AS value, round(score + 1e-9,4) AS score
        |FROM d WHERE score >= 2.5 - 1e-9""".stripMargin.replace("\n", " "),
    // subsequence discord (seq/SubSequenceDistanceDetector.scala:193-216):
    // per window start, min RMS distance to every window ≥ 8 apart —
    // quadratic self-join over window-value lists (fine at sf0.01).
    "q26_subseq_discord" ->
      """WITH e AS (SELECT user_id::VARCHAR AS key, event_id AS seq, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id, value) AS rn,
        |  count(*) OVER (PARTITION BY user_id) AS n
        | FROM events),
        |w AS (SELECT key, seq, value, rn, n,
        |  list(value) OVER (PARTITION BY key ORDER BY rn
        |    ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS win
        | FROM e),
        |v AS (SELECT * FROM w WHERE rn + 7 <= n),
        |p AS (SELECT a.key, a.seq, a.value,
        |  min(list_sum(list_transform(range(8),
        |    t -> (a.win[t+1] - b.win[t+1]) * (a.win[t+1] - b.win[t+1])))) AS best
        | FROM v a JOIN v b ON a.key = b.key AND abs(a.rn - b.rn) >= 8
        | GROUP BY 1, 2, 3)
        |SELECT key, seq, round(value,4) AS value,
        | round(sqrt(best / 8.0),4) AS score FROM p"""
        .stripMargin.replace("\n", " "),
    "q85a_seq_positional" ->
      """WITH s AS (SELECT user_id, event_type,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY event_id, event_type) AS pos
        | FROM events WHERE user_id <= 20),
        |n AS (SELECT user_id, count(*) AS len FROM s GROUP BY 1),
        |eq AS (SELECT a.user_id AS a, b.user_id AS b,
        |  sum(CASE WHEN a.event_type = b.event_type THEN 1 ELSE 0 END) AS hits
        | FROM s a JOIN s b ON b.user_id = a.user_id + 1 AND a.pos = b.pos
        | GROUP BY 1, 2)
        |SELECT e.a, e.b,
        | round(e.hits / greatest(na.len, nb.len)::DOUBLE, 4) AS posSim
        |FROM eq e JOIN n na ON na.user_id = e.a JOIN n nb ON nb.user_id = e.b"""
        .stripMargin.replace("\n", " "),
    // LCS similarity (SequenceMatcher.java:81-110) as a recursive CTE:
    // one row per pair per iteration, carrying the previous two DP
    // anti-diagonals as lists. Cells on diagonal d+1 depend only on
    // diagonals d (up/left) and d−1 (diagonal match), so each is a pure
    // list_transform — no within-row recurrence. dp[la][lb] is the single
    // cell of the last diagonal; sim = LCS / max(la, lb).
    "q85b_seq_lcs" ->
      """WITH RECURSIVE
        |s AS (SELECT user_id, event_type,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY event_id, event_type) AS pos
        | FROM events WHERE user_id <= 20),
        |seqs AS (SELECT user_id, list(event_type ORDER BY pos) AS st,
        |  count(*) AS len FROM s GROUP BY 1),
        |pairs AS (SELECT a.user_id AS a, b.user_id AS b, a.st AS sa,
        |  b.st AS sb, a.len AS la, b.len AS lb
        | FROM seqs a JOIN seqs b ON b.user_id = a.user_id + 1),
        |dp AS (
        | SELECT a, b, la, lb, sa, sb, 0 AS d,
        |  CAST(NULL AS BIGINT[]) AS prev, [CAST(0 AS BIGINT)] AS cur
        | FROM pairs
        | UNION ALL
        | SELECT a, b, la, lb, sa, sb, d + 1, cur,
        |  list_transform(range(greatest(0, d + 1 - lb), least(d + 1, la) + 1), i ->
        |   CASE WHEN i = 0 OR d + 1 - i = 0 THEN 0
        |   ELSE greatest(
        |    cur[(i - 1 - greatest(0, d - lb) + 1)::INT],
        |    cur[(i - greatest(0, d - lb) + 1)::INT],
        |    prev[(i - 1 - greatest(0, d - 1 - lb) + 1)::INT]
        |     + CASE WHEN sa[i::INT] = sb[(d + 1 - i)::INT] THEN 1 ELSE 0 END)
        |   END)
        | FROM dp WHERE d < la + lb)
        |SELECT a, b, round(cur[1]::DOUBLE / greatest(la, lb), 4) AS lcsSim
        |FROM dp WHERE d = la + lb""".stripMargin.replace("\n", " "),
    // n-gram frequency anomaly (seq/NgramFrequencyPredictor.scala:79-223)
    // end-to-end: per-user eq-prob quartile symbols (quantile_cont matches
    // the kernel's linear interpolation), bigram strings via lag, the
    // sliding 20-gram window's counts vs the user's overall bigram
    // distribution (Σ (cur/tot − ref)² over the union = window part +
    // Σ ref² − window-ref overlap), window-max spread
    // (SeequenceScoreAggregator.java:48-59: only spreader positions
    // p ≥ window raise their trailing 20 rows), per-user max-normalize.
    "q28_ngram_freq" ->
      """WITH q AS (SELECT user_id,
        |  quantile_cont(value, [0.25, 0.5, 0.75]) AS bs
        | FROM events GROUP BY 1),
        |e AS (SELECT ev.user_id, ev.event_id, ev.value,
        |  row_number() OVER (PARTITION BY ev.user_id
        |    ORDER BY ev.event_id, ev.value) AS p,
        |  count(*) OVER (PARTITION BY ev.user_id) AS m,
        |  (CASE WHEN ev.value > q.bs[1] THEN 1 ELSE 0 END
        |   + CASE WHEN ev.value > q.bs[2] THEN 1 ELSE 0 END
        |   + CASE WHEN ev.value > q.bs[3] THEN 1 ELSE 0 END) AS sym
        | FROM events ev JOIN q USING (user_id)
        | QUALIFY m >= 20),
        |g AS (SELECT user_id, p, m,
        |  lag(sym) OVER (PARTITION BY user_id ORDER BY p) || '>' || sym AS gram
        | FROM e QUALIFY p >= 2),
        |ref AS (SELECT user_id, gram,
        |  count(*)::DOUBLE / (max(m) - 1) AS rf FROM g GROUP BY 1, 2),
        |sr2 AS (SELECT user_id, sum(rf * rf) AS sumref2 FROM ref GROUP BY 1),
        |wc AS (SELECT a.user_id, a.p AS c, b.gram, count(*)::DOUBLE AS cnt,
        |  least(a.p - 1, 20) AS tot
        | FROM g a JOIN g b ON a.user_id = b.user_id
        |   AND b.p BETWEEN a.p - 19 AND a.p
        | GROUP BY 1, 2, 3, a.p),
        |agg AS (SELECT w.user_id, w.c,
        |  sum(pow(w.cnt / w.tot - r.rf, 2)) AS part1,
        |  sum(r.rf * r.rf) AS winref
        | FROM wc w JOIN ref r ON w.user_id = r.user_id AND w.gram = r.gram
        | GROUP BY 1, 2),
        |raw AS (SELECT e.user_id, e.event_id, e.value, e.p,
        |  coalesce(a.part1 + s.sumref2 - a.winref, 0.0) AS raw
        | FROM e JOIN sr2 s USING (user_id)
        | LEFT JOIN agg a ON a.user_id = e.user_id AND a.c = e.p),
        |sp AS (SELECT user_id, event_id, value,
        |  greatest(raw, coalesce(max(CASE WHEN p >= 21 THEN raw END)
        |    OVER (PARTITION BY user_id ORDER BY p
        |      ROWS BETWEEN CURRENT ROW AND 19 FOLLOWING), 0.0)) AS spread
        | FROM raw),
        |mx AS (SELECT user_id, max(spread) AS mxs FROM sp GROUP BY 1)
        |SELECT sp.user_id::VARCHAR AS key, sp.event_id AS seq,
        | round(sp.value, 4) AS value,
        | round((CASE WHEN mx.mxs > 0 THEN sp.spread / mx.mxs ELSE 0.0 END)
        |   + 1e-9, 4) AS score
        |FROM sp JOIN mx USING (user_id)""".stripMargin.replace("\n", " "),
    "q73_asof_join" ->
      """WITH snap AS (SELECT event_type,
        |  (epoch_ns(ts) // 3600000000000) * 3600000000000 AS sts,
        |  avg(value) AS snapAvg
        | FROM events GROUP BY 1, 2)
        |SELECT e.event_id, e.event_type, round(e.value,4) AS value,
        | round(s.snapAvg,4) AS snapAvg
        |FROM events e ASOF LEFT JOIN snap s
        | ON e.event_type = s.event_type AND epoch_ns(e.ts) >= s.sts"""
        .stripMargin.replace("\n", " "),
    // band edges 4dp-frozen on both engines (q80's percentile/
    // quantile_cont pair), then a plain BETWEEN join — the bucketized
    // Spark path must reproduce the naive theta-join row set exactly
    "q156_interval_join" ->
      """WITH q AS (SELECT event_type,
        |  quantile_cont(value, [0.25, 0.5, 0.75]) AS bs,
        |  round(min(value), 4) AS mn, round(max(value), 4) AS mx
        | FROM events GROUP BY 1),
        |edges AS (SELECT event_type,
        |  [mn, round(bs[1],4), round(bs[2],4), round(bs[3],4), mx] AS e
        | FROM q),
        |iv AS (SELECT event_type, v.i AS band, e[v.i+1] AS lo, e[v.i+2] AS hi
        | FROM edges CROSS JOIN (VALUES (0),(1),(2),(3)) v(i))
        |SELECT p.event_id, p.event_type, round(p.value,4) AS value, i.band,
        | round(i.lo,4) AS lo, round(i.hi,4) AS hi
        |FROM events p JOIN iv i ON i.event_type = p.event_type
        | AND p.value >= i.lo AND p.value <= i.hi"""
        .stripMargin.replace("\n", " "),
    "q12_markov_fit" ->
      s"""WITH $mkProbs
         |SELECT fromState, toState, round(prob,4) AS prob FROM probs"""
        .stripMargin.replace("\n", " "),
    // per-parity-slice counts, sum-merge, densify over the states seen in
    // the merged model, Laplace-normalize — replays markovMerge exactly
    "q133_markov_merge" ->
      """WITH trans AS (SELECT user_id, event_id, event_type AS toState,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS fromState
        | FROM events),
        |slices AS (SELECT fromState, toState, count(*) AS cnt FROM trans
        | WHERE fromState IS NOT NULL AND user_id % 2 = 0 GROUP BY 1,2
        | UNION ALL
        | SELECT fromState, toState, count(*) AS cnt FROM trans
        | WHERE fromState IS NOT NULL AND user_id % 2 = 1 GROUP BY 1,2),
        |m AS (SELECT fromState, toState, sum(cnt) AS cnt
        | FROM slices GROUP BY 1,2),
        |states AS (SELECT DISTINCT fromState AS s FROM m
        | UNION SELECT DISTINCT toState FROM m),
        |grid AS (SELECT f.s AS fromState, t.s AS toState
        | FROM states f CROSS JOIN states t),
        |probs AS (SELECT g.fromState, g.toState,
        |  (coalesce(m.cnt,0) + 1.0) /
        |   (sum(coalesce(m.cnt,0)) OVER (PARTITION BY g.fromState)
        |     + (SELECT count(*) FROM states)) AS prob
        | FROM grid g LEFT JOIN m
        |   ON g.fromState = m.fromState AND g.toState = m.toState)
        |SELECT fromState, toState, round(prob,4) AS prob FROM probs"""
        .stripMargin.replace("\n", " "),
    "q13_markov_chain" -> markovChainOracle,
    // the config-runner face of the markov job shares it
    "q167_config_markov" -> markovChainOracle,
    "q14_markov_missrate" ->
      s"""WITH $mkProbs,
         |probx AS (SELECT *, max(prob) OVER (PARTITION BY fromState) AS mxp FROM probs),
         |scored AS (SELECT t.user_id, t.event_id,
         |  CASE WHEN count(p.prob) OVER w5 = 5
         |   THEN avg(CASE WHEN p.prob = p.mxp THEN 0.0 ELSE 1.0 END) OVER w5 END AS score
         | FROM trans t LEFT JOIN probx p
         |   ON t.fromState = p.fromState AND t.toState = p.toState
         | WINDOW w5 AS (PARTITION BY t.user_id ORDER BY t.event_id
         |   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
         |SELECT user_id, event_id, round(score,4) AS score,
         | CASE WHEN score IS NULL THEN 'I'
         |  WHEN max(CASE WHEN score > 0.9 THEN 1 ELSE 0 END) OVER
         |   (PARTITION BY user_id ORDER BY event_id
         |    ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) = 1 THEN 'O'
         |  ELSE 'N' END AS tag
         |FROM scored""".stripMargin.replace("\n", " "),
    "q169_markov_missprob" ->
      s"""WITH $mkProbs,
         |scored AS (SELECT t.user_id, t.event_id,
         |  CASE WHEN count(p.prob) OVER w5 = 5
         |   THEN avg(1.0 - p.prob) OVER w5 END AS score
         | FROM trans t LEFT JOIN probs p
         |   ON t.fromState = p.fromState AND t.toState = p.toState
         | WINDOW w5 AS (PARTITION BY t.user_id ORDER BY t.event_id
         |   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
         |SELECT user_id, event_id, round(score,4) AS score,
         | CASE WHEN score IS NULL THEN 'I'
         |  WHEN max(CASE WHEN score > 0.9 THEN 1 ELSE 0 END) OVER
         |   (PARTITION BY user_id ORDER BY event_id
         |    ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) = 1 THEN 'O'
         |  ELSE 'N' END AS tag
         |FROM scored""".stripMargin.replace("\n", " "),
    // entropy reduction: per-fromState model entropy h, window score =
    // Σ(h − (−p ln p)) / Σ h over the last 5 transitions
    "q170_markov_entropy" ->
      s"""WITH $mkProbs,
         |hh AS (SELECT fromState, sum(-prob * ln(prob)) AS h
         | FROM probs GROUP BY 1),
         |scored AS (SELECT t.user_id, t.event_id,
         |  CASE WHEN count(p.prob) OVER w5 = 5
         |   THEN sum(hh.h - (-p.prob * ln(p.prob))) OVER w5
         |     / sum(hh.h) OVER w5 END AS score
         | FROM trans t LEFT JOIN probs p
         |   ON t.fromState = p.fromState AND t.toState = p.toState
         |  LEFT JOIN hh ON p.fromState = hh.fromState
         | WINDOW w5 AS (PARTITION BY t.user_id ORDER BY t.event_id
         |   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
         |SELECT user_id, event_id, round(score,4) AS score,
         | CASE WHEN score IS NULL THEN 'I'
         |  WHEN max(CASE WHEN score > 0.95 THEN 1 ELSE 0 END) OVER
         |   (PARTITION BY user_id ORDER BY event_id
         |    ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) = 1 THEN 'O'
         |  ELSE 'N' END AS tag
         |FROM scored""".stripMargin.replace("\n", " "),
    "q15_level_shift" ->
      s"""WITH $zCte,
         |f AS (SELECT user_id, event_id, score, tag,
         |  CASE WHEN count(score) OVER lw = 20 AND stddev_samp(score) OVER lw > 0
         |   THEN (avg(score) OVER sw - avg(score) OVER lw) / (stddev_samp(score) OVER lw)
         |  END AS z
         | FROM z
         | WINDOW lw AS (PARTITION BY user_id ORDER BY event_id
         |   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
         |  sw AS (PARTITION BY user_id ORDER BY event_id
         |   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
         |g AS (SELECT *, CASE WHEN z IS NOT NULL AND z > 2.0 THEN 1 ELSE 0 END AS shifted FROM f)
         |SELECT user_id, event_id, round(score,4) AS score, round(z,4) + 0.0 AS z,
         | CASE WHEN max(shifted) OVER (PARTITION BY user_id ORDER BY event_id
         |   ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) = 1 THEN 'O' ELSE tag END AS tag
         |FROM g""".stripMargin.replace("\n", " "),
    "q16_local_neighborhood" ->
      """WITH n AS (SELECT user_id, event_id, value,
        |  list(value) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS l
        | FROM events),
        |sc AS (SELECT user_id, event_id, value,
        |  CASE WHEN len(l) = 5
        |   THEN list_sum(list_transform(l, e -> abs(e - value))) / 4.0 END AS score
        | FROM n)
        |SELECT user_id, event_id, round(value,4) AS value, round(score,4) AS score,
        | CASE WHEN score IS NULL THEN 'I' WHEN score > 60.0 THEN 'O' ELSE 'N' END AS tag
        |FROM sc""".stripMargin.replace("\n", " "),
    "q17_outlier_cluster" ->
      s"""WITH $zCte,
         |o AS (SELECT *, CASE WHEN lag(event_id) OVER w IS NULL
         |    OR event_id - lag(event_id) OVER w > 300 THEN 1 ELSE 0 END AS newc
         |  FROM z WHERE tag = 'O'
         |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
         |oc AS (SELECT *, sum(newc) OVER (PARTITION BY user_id ORDER BY event_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cid FROM o),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY user_id, cid
         |   ORDER BY score DESC, event_id) AS rn FROM oc)
         |SELECT user_id, event_id, round(value,4) AS value, round(score,4) AS score,
         | CASE WHEN rn = 1 THEN 'O' ELSE 'N' END AS tag FROM rk
         |UNION ALL
         |SELECT user_id, event_id, round(value,4), round(score,4), tag
         | FROM z WHERE tag <> 'O'""".stripMargin.replace("\n", " "),
    "q129_seasonal_decompose" ->
      s"""WITH $sdCtes,
         |st AS (SELECT event_type, avg(resid) AS mu, stddev_samp(resid) AS sd
         | FROM r GROUP BY 1)
         |SELECT r.event_type, r.seq, round(r.value, 4) AS value,
         | round(r.trend, 4) AS trend, round(r.seasonal, 4) AS seasonal,
         | round(r.resid, 4) AS resid,
         | round(abs(r.resid - st.mu)/st.sd, 4) AS z
         |FROM r JOIN st USING (event_type)""".stripMargin.replace("\n", " "),
    // STL strength over the shared decompose replay: 4dp-frozen
    // component variances, exact HUGEINT sums
    "q362_seasonal_strength" -> {
      val fp4 = (e: String) =>
        s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e4+0.5) " +
          s"ELSE -floor(-($e)*1e4+0.5) END)::BIGINT"
      def vr(s: String, q: String) =
        s"(($q)::DOUBLE - ($s)::DOUBLE * ($s)::DOUBLE / n::DOUBLE)" +
          s" / (n::DOUBLE - 1) / 1e8"
      s"""WITH $sdCtes,
         |f AS (SELECT event_type, ${fp4("resid")} AS fr,
         |  ${fp4("seasonal + resid")} AS fsr,
         |  ${fp4("value - seasonal")} AS ftr
         |  FROM r WHERE resid IS NOT NULL),
         |g AS (SELECT event_type, count(*)::BIGINT AS n,
         |  sum(fr)::HUGEINT AS s1, sum(fr::HUGEINT * fr::HUGEINT) AS q1,
         |  sum(fsr)::HUGEINT AS s2, sum(fsr::HUGEINT * fsr::HUGEINT) AS q2,
         |  sum(ftr)::HUGEINT AS s3, sum(ftr::HUGEINT * ftr::HUGEINT) AS q3
         |  FROM f GROUP BY 1 HAVING count(*) >= 3)
         |SELECT event_type, n,
         | round(greatest(0.0, 1.0 - (${vr("s1", "q1")}) / (${vr("s2", "q2")})), 4)
         |   AS seasonal_strength,
         | round(greatest(0.0, 1.0 - (${vr("s1", "q1")}) / (${vr("s3", "q3")})), 4)
         |   AS trend_strength
         |FROM g""".stripMargin.replace("\n", " ")
    },
    "q18_changepoint_meanshift" ->
      """WITH s AS (SELECT event_type, event_id, value,
        |  count(value) OVER lw AS cnt_l, count(value) OVER rw AS cnt_r,
        |  abs(avg(value) OVER rw - avg(value) OVER lw) /
        |   sqrt(var_samp(value) OVER lw / 30.0 + var_samp(value) OVER rw / 30.0) AS stat
        | FROM events WHERE value IS NOT NULL
        | WINDOW lw AS (PARTITION BY event_type ORDER BY event_id
        |   ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING),
        |  rw AS (PARTITION BY event_type ORDER BY event_id
        |   ROWS BETWEEN CURRENT ROW AND 29 FOLLOWING))
        |SELECT event_type, event_id, round(value,4) AS value, round(stat,4) AS stat
        |FROM s WHERE cnt_l = 30 AND cnt_r = 30 AND stat >= 3.0"""
        .stripMargin.replace("\n", " "),
    "q247_changepoint_stream" ->
      """WITH s AS (SELECT event_type AS entity, event_id::BIGINT AS seq, value,
        |  count(value) OVER fw AS cnt,
        |  abs(avg(value) OVER rw - avg(value) OVER lw) /
        |   sqrt(var_samp(value) OVER lw / 30.0 + var_samp(value) OVER rw / 30.0) AS stat
        | FROM events WHERE value IS NOT NULL
        | WINDOW lw AS (PARTITION BY event_type ORDER BY event_id
        |   ROWS BETWEEN 59 PRECEDING AND 30 PRECEDING),
        |  rw AS (PARTITION BY event_type ORDER BY event_id
        |   ROWS BETWEEN 29 PRECEDING AND CURRENT ROW),
        |  fw AS (PARTITION BY event_type ORDER BY event_id
        |   ROWS BETWEEN 59 PRECEDING AND CURRENT ROW))
        |SELECT entity, seq, round(value,4) AS value, round(stat,4) AS stat,
        | stat >= 3.0 AS changed
        |FROM s WHERE cnt = 60""".stripMargin.replace("\n", " "),
    "q95_changepoint_scaled" -> changePointScaledOracle,
    // the config-runner face of the change-point job shares it
    "q168_config_changepoint" -> changePointScaledOracle,
    "q19_one_step_ahead" ->
      """WITH p AS (SELECT user_id, event_id, value,
        |  CASE WHEN count(value) OVER pw = 10 THEN avg(value) OVER pw END AS predicted
        | FROM events
        | WINDOW pw AS (PARTITION BY user_id ORDER BY event_id
        |   ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
        |r AS (SELECT *, value - predicted AS resid FROM p),
        |sc AS (SELECT user_id, event_id, value, predicted,
        |  CASE WHEN resid IS NOT NULL AND stddev_samp(resid) OVER hw > 0
        |   THEN abs(resid) / (stddev_samp(resid) OVER hw) END AS score
        | FROM r
        | WINDOW hw AS (PARTITION BY user_id ORDER BY event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id, round(value,4) AS value, round(predicted,4) AS predicted,
        | round(score,4) AS score,
        | CASE WHEN score IS NULL THEN 'I' WHEN score > 3.0 THEN 'O' ELSE 'N' END AS tag
        |FROM sc""".stripMargin.replace("\n", " "),
    "q20_levelshift_segments" ->
      """WITH s AS (SELECT event_type, event_id,
        |  CASE WHEN count(value) OVER lw = 20 AND count(value) OVER rw = 20
        |   THEN (avg(value) OVER rw - avg(value) OVER lw) /
        |    sqrt(var_samp(value) OVER lw / 20.0 + var_samp(value) OVER rw / 20.0)
        |  END AS z
        | FROM events
        | WINDOW lw AS (PARTITION BY event_type ORDER BY event_id
        |   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING),
        |  rw AS (PARTITION BY event_type ORDER BY event_id
        |   ROWS BETWEEN CURRENT ROW AND 19 FOLLOWING)),
        |f AS (SELECT *, CASE WHEN z IS NOT NULL AND abs(z) >= 3.0 THEN 1 ELSE 0 END AS shifted FROM s),
        |g AS (SELECT *, CASE WHEN shifted = 1 AND
        |   coalesce(lag(shifted) OVER (PARTITION BY event_type ORDER BY event_id), 0) = 0
        |  THEN 1 ELSE 0 END AS newSeg FROM f),
        |h AS (SELECT *, sum(newSeg) OVER (PARTITION BY event_type ORDER BY event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS segId FROM g)
        |SELECT event_type, min(event_id) AS segStart, max(event_id) AS segEnd,
        | count(*) AS n, round(avg(z),4) AS avgShift
        |FROM h WHERE shifted = 1 GROUP BY event_type, segId"""
        .stripMargin.replace("\n", " "),
    // q20's segmentation with the halo kernel's output shape (key = the
    // concatenated key-column string); value rows are null-filtered up
    // front, matching the kernel's contract
    "q96_levelshift_scaled" ->
      """WITH s AS (SELECT event_type::VARCHAR AS key, event_id,
        |  CASE WHEN count(value) OVER lw = 20 AND count(value) OVER rw = 20
        |   THEN (avg(value) OVER rw - avg(value) OVER lw) /
        |    sqrt(var_samp(value) OVER lw / 20.0 + var_samp(value) OVER rw / 20.0)
        |  END AS z
        | FROM events WHERE value IS NOT NULL
        | WINDOW lw AS (PARTITION BY event_type ORDER BY event_id
        |   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING),
        |  rw AS (PARTITION BY event_type ORDER BY event_id
        |   ROWS BETWEEN CURRENT ROW AND 19 FOLLOWING)),
        |f AS (SELECT *, CASE WHEN z IS NOT NULL AND abs(z) >= 3.0 THEN 1 ELSE 0 END AS shifted FROM s),
        |g AS (SELECT *, CASE WHEN shifted = 1 AND
        |   coalesce(lag(shifted) OVER (PARTITION BY key ORDER BY event_id), 0) = 0
        |  THEN 1 ELSE 0 END AS newSeg FROM f),
        |h AS (SELECT *, sum(newSeg) OVER (PARTITION BY key ORDER BY event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS segId FROM g)
        |SELECT key, min(event_id) AS segStart, max(event_id) AS segEnd,
        | count(*) AS n, round(avg(z),4) AS avgShift
        |FROM h WHERE shifted = 1 GROUP BY key, segId"""
        .stripMargin.replace("\n", " "),
    "q21_autocorrelation" ->
      """WITH l AS (SELECT event_type, value,
        |  lag(value, 1) OVER w AS l1, lag(value, 2) OVER w AS l2,
        |  lag(value, 3) OVER w AS l3
        | FROM events WINDOW w AS (PARTITION BY event_type ORDER BY event_id))
        |SELECT event_type, 1 AS lag, round(corr(value, l1),4) AS ac FROM l GROUP BY 1
        |UNION ALL
        |SELECT event_type, 2, round(corr(value, l2),4) FROM l GROUP BY 1
        |UNION ALL
        |SELECT event_type, 3, round(corr(value, l3),4) FROM l GROUP BY 1"""
        .stripMargin.replace("\n", " "),
    "q248_pacf" ->
      s"""WITH RECURSIVE $levinsonCte
         |SELECT event_type, generate_subscripts(p, 1)::INTEGER AS lag,
         | round(unnest(p), 4) AS pacf
         |FROM rec WHERE k = 6""".stripMargin.replace("\n", " "),
    // AR(6) one-step scorer on the same Levinson recursion: pred from
    // the k=6 coefficient list, innovation std from e·γ0 with exact
    // integer moment sums (the q198 device)
    "q249_ar_forecast" -> {
      val fp6v =
        "(CASE WHEN value >= 0 THEN floor(value*1e6+0.5) ELSE -floor(-value*1e6+0.5) END)::BIGINT"
      val predT = (1 to 6).map(j => s"a[$j]*(l$j - mean)").mkString(" + ")
      s"""WITH RECURSIVE $levinsonCte,
         |model AS (SELECT event_type, a, e FROM rec WHERE k = 6),
         |mo AS (SELECT event_type, count(*)::BIGINT AS n,
         |  sum($fp6v)::BIGINT AS sv,
         |  sum(($fp6v)::HUGEINT * ($fp6v)::HUGEINT)::HUGEINT AS svv
         | FROM events WHERE value IS NOT NULL GROUP BY 1),
         |mv AS (SELECT event_type, (sv / 1e6) / n AS mean,
         |  ((svv::DOUBLE / 1e12) - ((sv / 1e6) * (sv / 1e6)) / n) / n AS varv
         | FROM mo),
         |sc AS (SELECT l.event_type, l.event_id, l.value,
         |  mv.mean + ($predT) AS pred, sqrt(m.e * mv.varv) AS std
         | FROM l JOIN model m USING (event_type) JOIN mv USING (event_type)),
         |f AS (SELECT event_type, event_id, value, pred,
         |  CASE WHEN pred IS NOT NULL AND std > 0
         |   THEN abs(value - pred) / std END AS score
         | FROM sc)
         |SELECT event_type, event_id, round(value, 4) AS value,
         | round(pred, 4) AS pred, round(score, 4) AS score,
         | CASE WHEN score IS NULL THEN 'I' WHEN score > 3.0 THEN 'O'
         |  ELSE 'N' END AS tag
         |FROM f""".stripMargin.replace("\n", " ")
    },
    "q22_temporal_agg" ->
      """SELECT event_type, epoch_ns(ts) // 3600000000000 AS bucket,
        | count(value) AS n, round(avg(value),4) AS avgVal,
        | round(max(value),4) AS maxVal, round(min(value),4) AS minVal
        |FROM events GROUP BY 1, 2""".stripMargin.replace("\n", " "),
    "q23_multigram" ->
      """WITH t AS (SELECT user_id,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS g1,
        |  event_type AS g2
        | FROM events),
        |c AS (SELECT user_id, g1 || '>' || g2 AS gram, count(*) AS cnt
        | FROM t WHERE g1 IS NOT NULL GROUP BY 1, 2)
        |SELECT user_id, gram, cnt,
        | round(cnt / (sum(cnt) OVER (PARTITION BY user_id))::DOUBLE, 4) AS freq
        |FROM c""".stripMargin.replace("\n", " "),
    "q116_sessionize" ->
      """WITH t AS (SELECT user_id, event_id, value, epoch_us(ts) AS tus,
        |  CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |    > 43200000000 THEN 1 ELSE 0 END AS brk
        | FROM events),
        |s AS (SELECT user_id, value, tus,
        |  (1 + sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_no
        | FROM t)
        |SELECT user_id, session_no, count(*) AS n_events,
        | min(tus) AS start_us, max(tus) AS end_us,
        | round((max(tus) - min(tus)) / 1000000.0, 4) AS duration_s,
        | sum(CAST(CASE WHEN value >= 0 THEN floor(value * 10000 + 0.5)
        |   ELSE -floor(-value * 10000 + 0.5) END AS BIGINT)) / 10000.0
        |   AS sum_value
        |FROM s GROUP BY 1, 2""".stripMargin.replace("\n", " "),
    // session_window semantics: ascending-sorted events merge while the
    // inter-event gap is STRICTLY below `gap` (split on >=, vs q116's >)
    "q149_sessionize_stream" ->
      """WITH t AS (SELECT user_id, value, epoch_us(ts) AS tus, event_id,
        |  CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |    >= 43200000000 THEN 1 ELSE 0 END AS brk
        | FROM events),
        |s AS (SELECT user_id, value, tus,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM t)
        |SELECT user_id, count(*) AS n_events,
        | min(tus) AS start_us, max(tus) AS end_us,
        | sum(CAST(CASE WHEN value >= 0 THEN floor(value * 10000 + 0.5)
        |   ELSE -floor(-value * 10000 + 0.5) END AS BIGINT)) / 10000.0
        |   AS sum_value
        |FROM s GROUP BY user_id, sid""".stripMargin.replace("\n", " "),
    // replay of markovStream's online walk: per-event transition nll
    // against the q12 smoothed model, rolling window-5 mean (ascending
    // frame order = the stream's oldest→newest summation), score only
    // once 5 transitions accumulated (rn >= 6: the first event has no
    // transition), I/O/N tags at 1.5
    "q162_markov_stream" ->
      s"""WITH $mkProbs,
         |nl AS (SELECT t.user_id, t.event_id, t.toState AS state,
         |  CASE WHEN t.fromState IS NOT NULL THEN -ln(p.prob) END AS nll,
         |  row_number() OVER (PARTITION BY t.user_id ORDER BY t.event_id) AS rn
         | FROM trans t LEFT JOIN probs p
         |   ON t.fromState = p.fromState AND t.toState = p.toState),
         |sc AS (SELECT user_id, event_id, state,
         |  CASE WHEN rn >= 6 THEN avg(nll) OVER (PARTITION BY user_id
         |    ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         |  END AS score
         | FROM nl)
         |SELECT user_id, event_id, state, round(score, 4) AS score,
         | CASE WHEN score IS NULL THEN 'I'
         |  WHEN score > 1.5 THEN 'O' ELSE 'N' END AS tag
         |FROM sc""".stripMargin.replace("\n", " "),
    // unrolled greedy funnel: each stage is a filtered MIN strictly after
    // the previous stage's time and within 7 days of t1 — the same
    // order-insensitive form the operator computes
    "q194_funnel" ->
      """WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT s1.user_id, t1, min(epoch_us(e.ts)) AS t2
        |  FROM s1 LEFT JOIN events e ON e.user_id = s1.user_id
        |   AND e.event_type = 'click' AND epoch_us(e.ts) > t1
        |   AND epoch_us(e.ts) <= t1 + 604800000000
        |  GROUP BY 1, 2),
        |s3 AS (SELECT s2.user_id, t1, t2, min(epoch_us(e.ts)) AS t3
        |  FROM s2 LEFT JOIN events e ON e.user_id = s2.user_id
        |   AND e.event_type = 'purchase' AND epoch_us(e.ts) > t2
        |   AND epoch_us(e.ts) <= t1 + 604800000000
        |  GROUP BY 1, 2, 3),
        |c AS (SELECT count(t1) AS c1, count(t2) AS c2, count(t3) AS c3
        |  FROM s3)
        |SELECT 1 AS step, 'view' AS step_type, c1 AS users,
        |  round(c1::DOUBLE / c1, 4) AS conversion FROM c
        |UNION ALL SELECT 2, 'click', c2, round(c2::DOUBLE / c1, 4) FROM c
        |UNION ALL SELECT 3, 'purchase', c3, round(c3::DOUBLE / c1, 4)
        |  FROM c""".stripMargin.replace("\n", " "),
    "q195_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |   epoch_us(ts) // 86400000000 AS period FROM events),
        |f AS (SELECT user_id, min(period) AS cohort FROM a GROUP BY 1),
        |c AS (SELECT f.cohort, a.period - f.cohort AS offset_k,
        |   count(*) AS active_users
        |  FROM a JOIN f USING (user_id) GROUP BY 1, 2),
        |s AS (SELECT cohort, active_users AS sz FROM c WHERE offset_k = 0)
        |SELECT c.cohort, c.offset_k, c.active_users,
        |  round(c.active_users::DOUBLE / s.sz, 4) AS retention
        |FROM c JOIN s USING (cohort)""".stripMargin.replace("\n", " "),
  )
}
