package graft.queries

import graft.core._
import graft.model.Fitters
import graft.score.Scorers
import graft.score.Scorers.Cfg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries + DuckDB oracles for the statistical fit/score families
  * (SURVEY.md §2.3 fitters, §2.4 scorers, §2.2 filters). */
object StatQueries {

  private def ev(s: SparkSession, dir: String) = table(s, dir, "events")

  private[graft] def zscored(s: SparkSession, dir: String): DataFrame = {
    val data = ev(s, dir)
    val stats = Fitters.stats(data, Seq("event_type"), Seq("value"))
    Scorers.zscore(data, stats, Cfg(Seq("event_type"), Seq("value"), threshold = 2.0))
  }

  /** Derived value-bucket categorical for the association pair (χ²/MI):
    * floor(value/50) clamped to [-1, 5], nulls their own class. */
  private def valueBucket: org.apache.spark.sql.Column =
    when(col("value").isNull, lit("na"))
      .otherwise(least(greatest(floor(col("value") / 50.0).cast("double"),
        lit(-1.0)), lit(5.0)).cast("long").cast("string"))

  /** Synthesized nested-JSON sidecar (q263): the driver's flat props
    * column is enriched with a string, a nested object and a boolean so
    * the profiler walks every type branch and a real depth-2 path. All
    * values are ints/strings/bools — no float serialization ambiguity. */
  private def jsonEvents(s: SparkSession, dir: String): DataFrame =
    ev(s, dir).select(col("event_id"),
      concat(lit("{\"k\": "), get_json_object(col("props"), "$.k"),
        lit(", \"type\": \""), col("event_type"),
        lit("\", \"meta\": {\"day\": "), expr("ts div 86400000000000"),
        lit(", \"pos\": \"p"), pmod(col("event_id"), lit(7)),
        lit("\"}, \"flag\": "),
        (pmod(col("event_id"), lit(2)) === 0).cast("string"),
        lit("}")).as("j"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // winsorize: clamp into the exact per-key [P05, P95] order-statistic
    // band; clipped flag marks repaired rows
    "q292_winsorize" -> ((s, dir) =>
      canon(graft.post.PostOps.winsorize(ev(s, dir), Seq("event_type"),
        "event_id", "value", alpha = 0.05)
        .select("event_id", "event_type", "value", "winsorized", "clipped"))),
    // rank-based inverse-normal transform (Blom offsets + Acklam probit
    // — identical rational approximation on both engines)
    "q293_int_transform" -> ((s, dir) =>
      canon(graft.post.PostOps.intTransform(ev(s, dir), Seq("event_type"),
        "event_id", "value")
        .select("event_id", "event_type", "value", "z"))),
    // Box–Cox profile-likelihood over a λ grid, 6dp-frozen moments
    "q294_boxcox" -> ((s, dir) =>
      canon(graft.post.PostOps.boxCoxFit(ev(s, dir), Seq("event_type"),
        "value", lambdas = Seq(-2.0, -1.5, -1.0, -0.5, 0.0, 0.5, 1.0, 1.5,
          2.0)))),
    // effect sizes per group pair: Cohen's d (full data, exact sums) +
    // Cliff's delta (quantile-strided ≤150/group sample)
    "q299_effect_sizes" -> ((s, dir) =>
      canon(graft.model.GroupTests.effectSizes(ev(s, dir), "event_type",
        "event_id", "value", maxPoints = 150))),
    // Spearman rank correlation matrix, complete-case, ranks via the
    // distinct-value histograms (exact 2·r̄ integers)
    "q300_spearman" -> ((s, dir) =>
      canon(graft.model.Assoc.spearmanMatrix(table(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount")))),
    // one-way ANOVA F: did value's mean split across event_type
    // segments (exact fixed-point sums, ordered cross-group fold)
    "q289_anova" -> ((s, dir) =>
      canon(graft.model.GroupTests.anovaF(ev(s, dir), "event_type",
        "value"))),
    // Kruskal–Wallis H, tie-corrected, ranks via the value histogram
    "q290_kruskal_wallis" -> ((s, dir) =>
      canon(graft.model.GroupTests.kruskalWallis(ev(s, dir), "event_type",
        "value"))),
    // Brown–Forsythe: ANOVA F on |x − group median| (variance drift
    // across segments, robust center)
    "q291_brown_forsythe" -> ((s, dir) =>
      canon(graft.model.GroupTests.brownForsythe(ev(s, dir), "event_type",
        "value"))),
    // schema-on-read JSON profiler over the synthesized nested sidecar:
    // path × (occurrences, distinct, lexical type counts, min example)
    "q263_json_profile" -> ((s, dir) =>
      graft.text.JsonOps.jsonProfile(jsonEvents(s, dir), "j", maxDepth = 2)),
    "q01_stats_fit" -> ((s, dir) =>
      canon(Fitters.stats(ev(s, dir), Seq("event_type"), Seq("value")))),
    // χ² independence of event_type × value-bucket: PSI-pattern 6dp
    // fixed-point cell terms, zero cells included via the marginal cross
    "q213_chi2" -> ((s, dir) =>
      canon(graft.model.Assoc.chiSquare(
        ev(s, dir).withColumn("vb", valueBucket), "event_type", "vb"))),
    // Theil's U: the asymmetric "how much of A does B explain" pair of
    // q213/q214 — 8dp-frozen entropy terms, exact integer I(A;B)
    "q302_theils_u" -> ((s, dir) =>
      canon(graft.model.Assoc.theilsU(
        ev(s, dir).withColumn("vb", valueBucket), "event_type", "vb"))),
    // Kendall's tau-b of value vs the k prop over the md5-hash sample
    "q305_kendall_tau" -> ((s, dir) =>
      canon(graft.model.Assoc.kendallTau(
        ev(s, dir).withColumn("k",
          get_json_object(col("props"), "$.k").cast("int").cast("double")),
        "event_id", "value", "k", maxPoints = 300))),
    "q214_mutual_info" -> ((s, dir) =>
      canon(graft.model.Assoc.mutualInfo(
        ev(s, dir).withColumn("vb", valueBucket), "event_type", "vb"))),
    // level-2 market-basket: order baskets × part brands, min co-count 2
    "q238_assoc_rules" -> ((s, dir) => {
      val bk = table(s, dir, "lineitem").select("l_orderkey", "l_partkey")
        .join(table(s, dir, "part").select("p_partkey", "p_brand"),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
      canon(graft.model.Assoc.associationRules(bk, "basket", "item",
        minCount = 2L))
    }),
    // pairwise Pearson correlation: value × props.k × epoch-day, exact
    // decimal/hugeint sums
    "q226_corr_matrix" -> ((s, dir) => {
      val e = ev(s, dir)
        .withColumn("k",
          get_json_object(col("props"), "$.k").cast("int").cast("double"))
        .withColumn("day", expr("ts div 86400000000000").cast("double"))
      canon(graft.model.Assoc.correlationMatrix(e, Seq("value", "k", "day")))
    }),
    // per-type empirical CDF + percent rank of value
    "q224_cdf_transform" -> ((s, dir) =>
      canon(graft.post.PostOps.cdfTransform(ev(s, dir), Seq("event_type"),
        "value", "event_id"))),
    // smoothed target encoding of event_type against value, m = 20
    "q222_target_encode" -> ((s, dir) =>
      canon(graft.model.Assoc.targetEncode(ev(s, dir), "event_type",
        "value", m = 20.0))),
    // Deequ-style per-column profile: one aggregate per column, exact
    // distinct; numeric min/max as doubles, lexicographic for strings
    "q217_profile" -> ((s, dir) =>
      canon(graft.model.Profiler.profile(ev(s, dir),
        Seq("event_id", "ts", "user_id", "event_type", "value", "props")))),
    // constraint battery: 4 row rules in ONE aggregate pass + key
    // uniqueness; verdicts against minRate 0.95
    "q218_constraints" -> ((s, dir) => {
      val e = ev(s, dir)
      val rows = graft.model.Profiler.checkRows(e, Seq(
        "value_not_null" -> col("value").isNotNull,
        "value_range" -> (col("value") >= -1000.0 && col("value") <= 10000.0),
        "type_known" -> col("event_type")
          .isin("click", "view", "purchase", "signup", "error"),
        "ts_positive" -> (col("ts") > 0L)), minRate = 0.95)
      canon(rows.unionByName(
        graft.model.Profiler.checkUnique(e, Seq("event_id"))))
    }),
    // positional motif: three consecutive 'error' events per user
    "q219_motif" -> ((s, dir) =>
      canon(graft.seq.SeqOps.motifCount(ev(s, dir), Seq("user_id"),
        "event_id", "event_type", Seq("error", "error", "error")))),
    // conformal p-value against the md5-style 20% calibration split —
    // the bridge that turns raw scores into the p-values q215 consumes
    "q239_conformal" -> ((s, dir) => {
      val e = ev(s, dir)
      canon(graft.post.PostOps.conformalPValue(
        e.where(col("event_id") % 5 =!= 0),
        e.where(col("event_id") % 5 === 0),
        Seq("event_type"), "value", "event_id"))
    }),
    // Benjamini–Hochberg step-up on p = exp(−|z|) per event_type; the
    // exp/compare expressions are shape-identical cross-engine (q07's
    // established exp parity)
    // Holm step-down (FWER) over the same p frame as q215's BH (FDR)
    "q371_holm" -> ((s, dir) => {
      val p = zscored(s, dir).where(col("score").isNotNull)
        .withColumn("p", exp(-col("score")))
      canon(graft.post.PostOps.holm(p, Seq("event_type"), "p", "event_id",
        alpha = 0.1).select("event_type", "event_id", "p", "rank",
        "p_adj", "rejected"))
    }),
    // James–Stein shrinkage of per-type means toward the grand mean
    "q372_james_stein" -> ((s, dir) =>
      canon(graft.post.PostOps.jamesStein(ev(s, dir), "event_type",
        "value"))),
    "q215_bh_fdr" -> ((s, dir) => {
      val p = zscored(s, dir).where(col("score").isNotNull)
        .withColumn("p", exp(-col("score")))
      canon(graft.post.PostOps.bhFdr(p, Seq("event_type"), "p", "event_id",
        alpha = 0.1))
    }),
    // Benjamini–Yekutieli: q215 under arbitrary dependence — the step-up
    // threshold divides by the exact-harmonic c(m) (12dp-frozen 1/i)
    "q307_by_fdr" -> ((s, dir) => {
      val p = zscored(s, dir).where(col("score").isNotNull)
        .withColumn("p", exp(-col("score")))
      canon(graft.post.PostOps.byFdr(p, Seq("event_type"), "p", "event_id",
        alpha = 0.1))
    }),
    // incremental-model path: fit each md5-split half separately, merge
    // the MODELS (Chan parallel variance) — must reproduce the q01
    // direct fit of the union, which is exactly what the oracle computes
    "q112_stats_merge" -> ((s, dir) => {
      val e = ev(s, dir)
      val isB = graft.text.TextOps.hash56(col("event_id").cast("string")) % 2 === 1
      val mA = Fitters.stats(e.where(!isB), Seq("event_type"), Seq("value"))
      val mB = Fitters.stats(e.where(isB), Seq("event_type"), Seq("value"))
      canon(Fitters.statsMerge(Seq(mA, mB), Seq("event_type")))
    }),
    // same incremental path for histograms: per-half fits, counts merge,
    // freq recomputes — bit-identical to the q04 direct fit
    "q113_histogram_merge" -> ((s, dir) => {
      val e = ev(s, dir)
      val isB = graft.text.TextOps.hash56(col("event_id").cast("string")) % 2 === 1
      val mA = Fitters.histogram(e.where(!isB), Seq("event_type"), Seq(("value", 10.0)))
      val mB = Fitters.histogram(e.where(isB), Seq("event_type"), Seq(("value", 10.0)))
      canon(Fitters.histogramMerge(Seq(mA, mB), Seq("event_type")))
    }),
    // KMV distinct-count sketch: per-lang vocabulary-size estimate over
    // documents. md5-derived hashes make the whole sketch (not just the
    // estimate) exactly SQL-replayable.
    "q117_kmv_distinct" -> ((s, dir) => {
      val toks = table(s, dir, "documents").select(col("lang"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      canon(Fitters.kmvEstimate(
        Fitters.kmvSketch(toks, Seq("lang"), "tok", 64), Seq("lang"), 64))
    }),
    // incremental-model route: per-half sketches (md5 doc split) merge
    // LOSSLESSLY — same estimate as the q117 direct sketch, same oracle
    "q118_kmv_merge" -> ((s, dir) => {
      val toks = table(s, dir, "documents").select(col("lang"), col("doc_id"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      val isB = graft.text.TextOps.hash56(col("doc_id").cast("string")) % 2 === 1
      val sA = Fitters.kmvSketch(toks.where(!isB), Seq("lang"), "tok", 64)
      val sB = Fitters.kmvSketch(toks.where(isB), Seq("lang"), "tok", 64)
      canon(Fitters.kmvEstimate(
        Fitters.kmvMerge(Seq(sA, sB), Seq("lang"), 64), Seq("lang"), 64))
    }),
    // HLL registers: per-lang distinct-token estimate at p=9 (512
    // registers) — the constant-memory sibling of q117's KMV; integer
    // registers replay exactly in SQL
    "q157_hll_distinct" -> ((s, dir) => {
      val toks = table(s, dir, "documents").select(col("lang"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      canon(Fitters.hllEstimate(
        Fitters.hllSketch(toks, Seq("lang"), "tok", p = 9), Seq("lang"), p = 9))
    }),
    // register-max merge of per-half sketches is lossless — same estimate
    // as the direct sketch, same oracle (q118 pattern)
    "q158_hll_merge" -> ((s, dir) => {
      val toks = table(s, dir, "documents").select(col("lang"), col("doc_id"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      val isB = graft.text.TextOps.hash56(col("doc_id").cast("string")) % 2 === 1
      val sA = Fitters.hllSketch(toks.where(!isB), Seq("lang"), "tok", p = 9)
      val sB = Fitters.hllSketch(toks.where(isB), Seq("lang"), "tok", p = 9)
      canon(Fitters.hllEstimate(
        Fitters.hllMerge(Seq(sA, sB), Seq("lang")), Seq("lang"), p = 9))
    }),
    // count-min sketch: per-lang token-frequency model, point-queried for
    // the tokens of docs 0..19. depth=4 md5-salted hash rows x width=512
    // counters — deterministic, so the oracle replays sketch AND estimate.
    "q119_cms_estimate" -> ((s, dir) => {
      val toks = table(s, dir, "documents").select(col("lang"), col("doc_id"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      val cms = Fitters.cmsSketch(toks, Seq("lang"), "tok", 4, 512)
      val probes = toks.where(col("doc_id") < 20).select("lang", "tok").distinct()
      canon(Fitters.cmsEstimate(cms, probes, Seq("lang"), "tok", 4, 512))
    }),
    // incremental-model route: per-half sketches (md5 doc split) sum-merge
    // EXACTLY to the direct sketch -> same estimates, same oracle
    "q120_cms_merge" -> ((s, dir) => {
      val toks = table(s, dir, "documents").select(col("lang"), col("doc_id"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      val isB = graft.text.TextOps.hash56(col("doc_id").cast("string")) % 2 === 1
      val merged = Fitters.cmsMerge(Seq(
        Fitters.cmsSketch(toks.where(!isB), Seq("lang"), "tok", 4, 512),
        Fitters.cmsSketch(toks.where(isB), Seq("lang"), "tok", 4, 512)), Seq("lang"))
      val probes = toks.where(col("doc_id") < 20).select("lang", "tok").distinct()
      canon(Fitters.cmsEstimate(merged, probes, Seq("lang"), "tok", 4, 512))
    }),
    // mergeable quantile sketch: bottom-k md5 row sample per event_type,
    // interpolated p25/p50/p75 over the sample — sample AND estimate are
    // deterministic, so the oracle replays the whole pipeline
    "q123_quantile_sketch" -> ((s, dir) =>
      canon(Fitters.quantileSketchEstimate(
        Fitters.quantileSketch(ev(s, dir), Seq("event_type"), "event_id", "value", 256),
        Seq("event_type"), Seq(0.25, 0.5, 0.75)))),
    // incremental-model route: per-half sketches (md5 event split) merge
    // LOSSLESSLY — same estimates as the q123 direct sketch, same oracle
    "q124_qsketch_merge" -> ((s, dir) => {
      val e = ev(s, dir)
      val isB = graft.text.TextOps.hash56(col("event_id").cast("string")) % 2 === 1
      val sA = Fitters.quantileSketch(e.where(!isB), Seq("event_type"), "event_id", "value", 256)
      val sB = Fitters.quantileSketch(e.where(isB), Seq("event_type"), "event_id", "value", 256)
      canon(Fitters.quantileSketchEstimate(
        Fitters.quantileSketchMerge(Seq(sA, sB), Seq("event_type"), 256),
        Seq("event_type"), Seq(0.25, 0.5, 0.75)))
    }),
    // The STREAMING sketch twins executed as batch queries (q100
    // pattern — flatMapGroupsWithState runs in batch, one group
    // invocation per key holding the full history): the stream CODE
    // PATH itself is gated on the same oracle as its batch sibling,
    // because one batch of everything is exactly the final snapshot of
    // the online run (bottom-k / additive-counter states are
    // order-free).
    "q143_kmv_stream" -> ((s, dir) => {
      val toks = table(s, dir, "documents").select(col("lang"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      canon(graft.streaming.StreamScorers.kmvDistinctStream(toks, "lang", "tok", 64)
        .toDF().select(col("key").as("lang"),
          col("sketchN").cast("long").as("sketch_n"),
          col("estDistinct").as("est_distinct")))
    }),
    // HLL stream twin batch-executed (q143 pattern): one batch == the
    // final online snapshot == q157's registers, shared oracle
    "q160_hll_stream" -> ((s, dir) => {
      val toks = table(s, dir, "documents").select(col("lang"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      canon(graft.streaming.StreamScorers.hllDistinctStream(toks, "lang", "tok", p = 9)
        .toDF().select(col("key").as("lang"),
          col("nBuckets").cast("long").as("n_buckets"),
          col("estDistinct").as("est_distinct")))
    }),
    // the stateless stream scorer (stream-static broadcast model join +
    // O/N/I labeling) executed as batch — the exact code path every
    // micro-batch runs against the cached model, driver-gated instead of
    // spec-only
    "q163_zscore_stream" -> ((s, dir) => {
      val data = ev(s, dir)
      val stats = Fitters.stats(data, Seq("event_type"), Seq("value"))
      canon(graft.streaming.StreamScorers.zscoreStream(
          data.select("user_id", "event_id", "event_type", "value"),
          stats, Seq("event_type"), "value", threshold = 2.0)
        .select("user_id", "event_id", "event_type", "value", "score", "tag"))
    }),
    // the watermarked event-time window aggregation executed as batch:
    // window() buckets epoch time identically in batch and stream, and
    // withWatermark is a no-op under batch execution
    "q164_windowed_stats" -> ((s, dir) => {
      val e = ev(s, dir)
        .withColumn("_t", timestamp_micros(expr("ts div 1000")))
      canon(graft.streaming.StreamScorers.windowedStats(e, "_t",
          Seq("event_type"), "value", windowDur = "1 hour",
          watermark = "0 seconds")
        .select(col("event_type"),
          unix_micros(col("window.start")).as("start_us"),
          unix_micros(col("window.end")).as("end_us"),
          col("mean"), col("std"), col("cnt")))
    }),
    // the stream op watches a fixed global probe list; restricting its
    // (key × probe) output to q119's per-lang probe pairs reproduces the
    // batch estimate row set exactly
    "q144_cms_stream" -> ((s, dir) => {
      val toks = table(s, dir, "documents").select(col("lang"), col("doc_id"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      val probesDf = toks.where(col("doc_id") < 20).select("lang", "tok").distinct()
      // watch-list is model-sized (distinct tokens of 20 docs) — the
      // driver-side collect is the operator's contract, not a data scan
      val watch = probesDf.select("tok").distinct()
        .as[String](org.apache.spark.sql.Encoders.STRING).collect().sorted.toSeq
      val out = graft.streaming.StreamScorers.cmsFrequencyStream(
        toks.select("lang", "tok"), "lang", "tok", 4, 512, watch).toDF()
      canon(out.join(probesDf,
        out("key") === probesDf("lang") && out("probe") === probesDf("tok"))
        .select(col("lang"), col("tok"), col("estCnt").as("est_cnt")))
    }),
    "q145_qsketch_stream" -> ((s, dir) => {
      val out = graft.streaming.StreamScorers.quantileSketchStream(
        ev(s, dir), "event_type", "event_id", "value", 256,
        Seq(0.25, 0.5, 0.75)).toDF()
      canon(out.groupBy("key")
        .agg(max(col("sketchN")).cast("long").as("sketch_n"),
          max(when(col("p") === 0.25, col("est"))).as("p25"),
          max(when(col("p") === 0.5, col("est"))).as("p50"),
          max(when(col("p") === 0.75, col("est"))).as("p75"))
        .withColumnRenamed("key", "event_type"))
    }),
    // CMS inner-product join-cardinality estimate (orders ⋈ customer on
    // custkey) next to the true count — the broadcast/shuffle/salt
    // planning primitive, deterministic end-to-end
    "q125_join_card" -> ((s, dir) => {
      val a = Fitters.cmsSketch(
        table(s, dir, "orders").select(col("o_custkey").cast("string").as("k")),
        Nil, "k", 4, 512)
      val b = Fitters.cmsSketch(
        table(s, dir, "customer").select(col("c_custkey").cast("string").as("k")),
        Nil, "k", 4, 512)
      val truth = table(s, dir, "orders")
        .join(table(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .agg(count(lit(1)).as("true_pairs"))
      canon(Fitters.cmsJoinCard(a, b, Nil, 4).crossJoin(truth))
    }),
    // key-skew profiler: top-5 heaviest user_id keys with share, skew
    // ratio and the recommended salt fan-out — the measurement behind
    // the saltedAgg/saltedJoin decision
    "q126_skew_profile" -> ((s, dir) =>
      canon(graft.core.Skew.skewProfile(ev(s, dir), Seq("user_id"), 5))),
    // schema-on-read: hoist props.k out of the JSON bag (one from_json
    // parse), then the flagship z-score pipeline over the extracted attr
    "q128_props_zscore" -> ((s, dir) => {
      val kd = graft.sources.Sources.jsonProps(ev(s, dir), "props", "k INT")
        .withColumn("k", col("k").cast("double"))
      val stats = Fitters.stats(kd, Seq("event_type"), Seq("k"))
      canon(Scorers.zscore(kd, stats, Cfg(Seq("event_type"), Seq("k"), threshold = 2.0))
        .select("event_id", "event_type", "k", "score", "tag"))
    }),
    "q02_robust_fit" -> ((s, dir) =>
      canon(Fitters.robustStats(ev(s, dir), Seq("event_type"), Seq("value")))),
    "q03_quantile_fit" -> ((s, dir) =>
      canon(Fitters.quantiles(ev(s, dir), Seq("event_type"), Seq("value")))),
    "q04_histogram_fit" -> ((s, dir) =>
      canon(Fitters.histogram(ev(s, dir), Seq("event_type"), Seq(("value", 10.0))))),
    "q05_zscore" -> ((s, dir) =>
      canon(zscored(s, dir).select("event_id", "event_type", "value", "score", "tag"))),
    // rank-ensemble of three RANK-DISTINCT detectors (zscore, robust-z,
    // histogram estimated-probability): percent-rank normalize, average.
    // (extremeValue = exp(−exp(−z)) is a monotone transform of zscore —
    // identical ranks, so it would add nothing to a rank ensemble)
    "q358_rank_ensemble" -> ((s, dir) => {
      val data = ev(s, dir)
      val stats = Fitters.stats(data, Seq("event_type"), Seq("value"))
      val rob = Fitters.robustStats(data, Seq("event_type"), Seq("value"))
      val hist = Fitters.histogram(data, Seq("event_type"),
        Seq(("value", 10.0)))
      // CHAIN the three broadcast-model scorers over one pass of the
      // data — each adds only a broadcast join + projection — instead
      // of scanning events three times and sort-merge-joining the three
      // score frames on event_id (2 shuffles of the data; r14, guide
      // §2.4). One row per event either way (every scorer is a left
      // broadcast lookup), and the score expressions are the same
      // Scorers functions, so rankEnsemble sees an identical frame —
      // the oracle's own sc CTE is this exact one-pass shape.
      val z = Scorers.zscore(data, stats,
        Cfg(Seq("event_type"), Seq("value"), threshold = 2.0))
        .withColumnRenamed("score", "s_z").drop("tag")
      val zr = Scorers.robustZscore(z, rob,
        Cfg(Seq("event_type"), Seq("value"), threshold = 3.0))
        .withColumnRenamed("score", "s_r").drop("tag")
      val zre = Scorers.estimatedProbability(zr, hist,
        Cfg(Seq("event_type"), Seq("value"), threshold = 0.99),
        Seq(("value", 10.0)))
        .select(col("event_id"), col("s_z"), col("s_r"),
          col("score").as("s_e"))
      canon(graft.post.PostOps.rankEnsemble(
        zre, Seq("event_id"), Seq("s_z", "s_r", "s_e")))
    }),
    "q06_robust_zscore" -> ((s, dir) => {
      val data = ev(s, dir)
      val model = Fitters.robustStats(data, Seq("event_type"), Seq("value"))
      canon(Scorers.robustZscore(data, model, Cfg(Seq("event_type"), Seq("value"), threshold = 3.0))
        .select("event_id", "event_type", "value", "score", "tag"))
    }),
    "q07_extreme_value" -> ((s, dir) => {
      val data = ev(s, dir)
      val stats = Fitters.stats(data, Seq("event_type"), Seq("value"))
      canon(Scorers.extremeValue(data, stats, Cfg(Seq("event_type"), Seq("value"), threshold = 0.9))
        .select("event_id", "event_type", "value", "score", "tag"))
    }),
    "q08_est_prob" -> ((s, dir) => {
      val data = ev(s, dir)
      val hist = Fitters.histogram(data, Seq("event_type"), Seq(("value", 10.0)))
      canon(Scorers.estimatedProbability(
        data, hist, Cfg(Seq("event_type"), Seq("value"), threshold = 0.99),
        Seq(("value", 10.0)))
        .select("event_id", "event_type", "value", "score", "tag"))
    }),
    "q09_iqr_score" -> ((s, dir) => {
      val data = ev(s, dir)
      val model = Fitters.quantiles(data, Seq("event_type"), Seq("value"))
      canon(Scorers.iqrScore(data, model, Cfg(Seq("event_type"), Seq("value"), threshold = 1.5))
        .select("event_id", "event_type", "value", "score", "tag"))
    }),
    "q10_outliers_only" -> ((s, dir) =>
      canon(Scorers.outliersOnly(zscored(s, dir))
        .select("event_id", "event_type", "value", "score", "tag"))),
    "q11_clean_data" -> ((s, dir) =>
      Scorers.cleanData(zscored(s, dir)).select("event_id", "event_type", "value")),
    "q29_est_attr_prob" -> ((s, dir) => {
      val data = ev(s, dir)
      val hist = Fitters.attrHistogram(data, Seq("event_type"), Seq(("value", 10.0)))
      canon(Scorers.estimatedAttrProbability(
        data, hist, Cfg(Seq("event_type"), Seq("value"), threshold = 6.0),
        Map("value" -> 10.0), useLog = true)
        .select("event_id", "event_type", "value", "score", "tag"))
    }),
    "q74_est_attr_prob_inverse" -> ((s, dir) => {
      // the reference's "inverse" (1-p) scoring strategy, vs q29's -ln p
      val data = ev(s, dir)
      val hist = Fitters.attrHistogram(data, Seq("event_type"), Seq(("value", 10.0)))
      canon(Scorers.estimatedAttrProbability(
        data, hist, Cfg(Seq("event_type"), Seq("value"), threshold = 0.99),
        Map("value" -> 10.0), useLog = false)
        .select("event_id", "event_type", "value", "score", "tag"))
    }),
    "q79_histogram_ids" -> ((s, dir) =>
      // MR reducer id-concatenation mode: bucket members as one joined field
      Fitters.histogramWithIds(ev(s, dir), Seq("event_type"),
        Seq(("value", 10.0)), "event_id")
        .select(col("event_type"), col("bucket"), col("cnt"),
          array_join(transform(col("ids"), i => i.cast("string")), ":").as("idList"))),
    "q80_eqprob_boundaries" -> ((s, dir) =>
      canon(Fitters.equalProbBoundaries(ev(s, dir), Seq("event_type"),
        Seq("value"), n = 4))),
    "q30_est_cum_prob" -> ((s, dir) => {
      val data = ev(s, dir)
      val hist = Fitters.attrHistogram(data, Seq("event_type"), Seq(("value", 10.0)))
      canon(Scorers.estimatedCumProbability(
        data, hist, Cfg(Seq("event_type"), Seq("value"), threshold = 0.99),
        Map("value" -> 10.0))
        .select("event_id", "event_type", "value", "score", "tag"))
    }),
    "q31_est_meta_prob" -> ((s, dir) => {
      val data = ev(s, dir)
      val hist = Fitters.attrHistogram(data, Seq("event_type"), Seq(("value", 10.0)))
      val meta = Fitters.metaHistogram(hist, Seq("event_type"), 0.02)
      canon(Scorers.estimatedMetaProbability(
        data, hist, meta, Cfg(Seq("event_type"), Seq("value"), threshold = 6.0),
        Map("value" -> 10.0), 0.02, useLog = true)
        .select("event_id", "event_type", "value", "score", "tag"))
    }),
    "q32_mahalanobis" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      canon(Scorers.mahalanobis(
        li, Cfg(Seq("l_returnflag"), Seq("l_quantity", "l_extendedprice"), threshold = 3.0))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
          "l_extendedprice", "score", "tag"))
    }),
    "q33_out_range" -> ((s, dir) => {
      val data = ev(s, dir)
      val spark = s
      import spark.implicits._
      val ranges = Seq(("click", "value", 0.0, 150.0), ("view", "value", 0.0, 150.0),
        ("error", "value", 0.0, 150.0), ("purchase", "value", 0.0, 150.0),
        ("signup", "value", 0.0, 150.0))
        .toDF("event_type", "attr", "lo", "hi")
      canon(Scorers.outOfRange(data, ranges,
        Cfg(Seq("event_type"), Seq("value"), expConst = 0.05, threshold = 0.8))
        .select("event_id", "event_type", "value", "score", "tag"))
    }),
    "q34_in_range" -> ((s, dir) => {
      val data = ev(s, dir)
      val spark = s
      import spark.implicits._
      val ranges = Seq(("click", "value", 200.0, 300.0), ("view", "value", 200.0, 300.0),
        ("error", "value", 200.0, 300.0), ("purchase", "value", 200.0, 300.0),
        ("signup", "value", 200.0, 300.0))
        .toDF("event_type", "attr", "lo", "hi")
      canon(Scorers.inRange(data, ranges,
        Cfg(Seq("event_type"), Seq("value"), expConst = 0.05, threshold = 0.8))
        .select("event_id", "event_type", "value", "score", "tag"))
    }),
    "q35_polarity_suppress" -> ((s, dir) => {
      val data = ev(s, dir)
      val stats = Fitters.stats(data, Seq("event_type"), Seq("value"))
      val tagged = Scorers.zscore(data, stats, Cfg(Seq("event_type"), Seq("value"), threshold = 2.0))
      canon(Scorers.suppressPolarity(tagged, stats, Seq("event_type"), "value", "high")
        .select("event_id", "event_type", "value", "score", "tag"))
    }),
  )

  private val evStats =
    """stats AS (SELECT event_type, avg(value) AS mean, stddev_samp(value) AS std,
      | count(value) AS cnt, min(value) AS vmin, max(value) AS vmax
      | FROM events GROUP BY event_type)""".stripMargin.replace("\n", " ")

  // fixedPointLong replay (half away from zero at scale s)
  private def fp(e: String, s: String): String =
    s"(CASE WHEN ($e) >= 0 THEN floor(($e)*$s+0.5) ELSE -floor(-($e)*$s+0.5) END)::BIGINT"

  private val vbSql =
    """CASE WHEN value IS NULL THEN 'na'
      | ELSE least(greatest(floor(value / 50.0), -1.0), 5.0)::BIGINT::VARCHAR
      | END""".stripMargin.replace("\n", " ")

  // shared contingency-table CTEs for the q213/q214 association pair
  private val assocCtes =
    s"""src AS (SELECT event_type AS a, $vbSql AS b FROM events),
       |obs AS (SELECT a, b, count(*)::BIGINT AS o FROM src GROUP BY a, b),
       |ra AS (SELECT a, sum(o)::BIGINT AS ca FROM obs GROUP BY a),
       |cbm AS (SELECT b, sum(o)::BIGINT AS cb FROM obs GROUP BY b),
       |tot AS (SELECT sum(o)::BIGINT AS n FROM obs),
       |dims AS (SELECT (SELECT count(*) FROM ra)::BIGINT AS r,
       |  (SELECT count(*) FROM cbm)::BIGINT AS c)""".stripMargin
      .replace("\n", " ")

  private lazy val chi2Oracle: String = {
    val e = "ca::DOUBLE * cb / n"
    val term = s"(o::DOUBLE - $e) * (o::DOUBLE - $e) / ($e)"
    s"""WITH $assocCtes,
       |cells AS (SELECT ra.ca, cbm.cb, coalesce(obs.o, 0)::BIGINT AS o, tot.n
       | FROM ra CROSS JOIN cbm
       | LEFT JOIN obs ON obs.a = ra.a AND obs.b = cbm.b CROSS JOIN tot),
       |agg AS (SELECT sum(${fp(term, "1e6")})::BIGINT AS chi6,
       |  max(n)::BIGINT AS n FROM cells)
       |SELECT round(agg.chi6::DOUBLE / 1000000.0, 4) AS chi2,
       | (d.r - 1) * (d.c - 1) AS dof, agg.n,
       | round(sqrt((agg.chi6::DOUBLE / 1000000.0)
       |   / (agg.n * least(d.r - 1, d.c - 1))), 4) AS cramers_v
       |FROM agg CROSS JOIN dims d""".stripMargin.replace("\n", " ")
  }

  private lazy val miOracle: String = {
    val term = "(o::DOUBLE / n) * ln(o::DOUBLE * n / (ca::DOUBLE * cb))"
    s"""WITH $assocCtes,
       |cells AS (SELECT obs.o, ra.ca, cbm.cb, tot.n FROM obs
       | JOIN ra ON ra.a = obs.a JOIN cbm ON cbm.b = obs.b CROSS JOIN tot),
       |agg AS (SELECT sum(${fp(term, "1e8")})::BIGINT AS mi8,
       |  max(n)::BIGINT AS n FROM cells)
       |SELECT round(agg.mi8::DOUBLE / 100000000.0, 4) AS mi,
       | d.r, d.c, agg.n
       |FROM agg CROSS JOIN dims d""".stripMargin.replace("\n", " ")
  }

  // profile replay: one SELECT per column; numeric min/max round via the
  // explicit floor shape (roundLikeDuck) so the ts row's huge epoch-nanos
  // doubles reproduce bit-for-bit (round() at 1e18 magnitude is
  // implementation-shaped; floor(x*1e4+0.5)/1e4 is the same IEEE ops on
  // both engines)
  private lazy val profileOracle: String = {
    // full roundLikeDuck shape: magnitude guard, sign branch,
    // signed-zero normalization
    def rl(e: String) = {
      val r = s"CASE WHEN ($e) >= 0 THEN floor(($e)*10000.0+0.5)/10000.0" +
        s" ELSE -floor(-($e)*10000.0+0.5)/10000.0 END"
      s"CASE WHEN abs($e) >= 1e12 THEN ($e)" +
        s" WHEN ($r) = 0 THEN 0.0 ELSE ($r) END"
    }
    def numRow(c: String, mn: String, mx: String) =
      s"""SELECT '$c' AS "column", count(*)::BIGINT AS n,
         | sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls,
         | count(DISTINCT $c)::BIGINT AS n_distinct,
         | ${rl(mn)} AS min_v, ${rl(mx)} AS max_v,
         | NULL::VARCHAR AS min_s, NULL::VARCHAR AS max_s FROM events"""
        .stripMargin.replace("\n", " ")
    def strRow(c: String) =
      s"""SELECT '$c' AS "column", count(*)::BIGINT AS n,
         | sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls,
         | count(DISTINCT $c)::BIGINT AS n_distinct,
         | NULL::DOUBLE AS min_v, NULL::DOUBLE AS max_v,
         | min($c) AS min_s, max($c) AS max_s FROM events""".stripMargin
        .replace("\n", " ")
    Seq(
      numRow("event_id", "min(event_id)::DOUBLE", "max(event_id)::DOUBLE"),
      numRow("ts", "epoch_ns(min(ts))::DOUBLE", "epoch_ns(max(ts))::DOUBLE"),
      numRow("user_id", "min(user_id)::DOUBLE", "max(user_id)::DOUBLE"),
      strRow("event_type"),
      numRow("value", "min(value)", "max(value)"),
      strRow("props")).mkString(" UNION ALL ")
  }

  private lazy val constraintsOracle: String = {
    val known = "'click','view','purchase','signup','error'"
    def rule(name: String, f: String) =
      s"""SELECT '$name' AS rule, n, $f AS failures,
         | round((n - $f)::DOUBLE / n, 4) AS pass_rate,
         | (n - $f)::DOUBLE / n >= 0.95 AS passed FROM base""".stripMargin
        .replace("\n", " ")
    s"""WITH base AS (SELECT count(*)::BIGINT AS n,
       | sum(CASE WHEN coalesce(value IS NOT NULL, FALSE) THEN 0 ELSE 1
       |   END)::BIGINT AS f0,
       | sum(CASE WHEN coalesce(value >= -1000.0 AND value <= 10000.0, FALSE)
       |   THEN 0 ELSE 1 END)::BIGINT AS f1,
       | sum(CASE WHEN coalesce(event_type IN ($known), FALSE) THEN 0 ELSE 1
       |   END)::BIGINT AS f2,
       | sum(CASE WHEN coalesce(epoch_ns(ts) > 0, FALSE) THEN 0 ELSE 1
       |   END)::BIGINT AS f3,
       | count(DISTINCT event_id)::BIGINT AS d FROM events)
       |${rule("value_not_null", "f0")} UNION ALL
       |${rule("value_range", "f1")} UNION ALL
       |${rule("type_known", "f2")} UNION ALL
       |${rule("ts_positive", "f3")} UNION ALL
       |SELECT 'unique:event_id' AS rule, n, (n - d)::BIGINT AS failures,
       | round(d::DOUBLE / n, 4) AS pass_rate, n = d AS passed FROM base"""
      .stripMargin.replace("\n", " ")
  }

  private lazy val motifOracle: String =
    """WITH m AS (SELECT user_id, event_type,
      |  lead(event_type, 1) OVER w AS s1, lead(event_type, 2) OVER w AS s2
      | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
      |SELECT user_id, sum(CASE WHEN event_type = 'error' AND s1 = 'error'
      |  AND s2 = 'error' THEN 1 ELSE 0 END)::BIGINT AS matches,
      | count(*)::BIGINT AS n_events
      |FROM m GROUP BY user_id""".stripMargin.replace("\n", " ")

  private lazy val bhFdrOracle: String =
    s"""WITH $evStats,
       |z AS (SELECT e.event_id, e.event_type,
       |  exp(-(abs(e.value - s.mean) / s.std)) AS p
       | FROM events e JOIN stats s USING (event_type)
       | WHERE e.value IS NOT NULL),
       |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
       |   ORDER BY p, event_id)::BIGINT AS rank,
       |  count(*) OVER (PARTITION BY event_type)::BIGINT AS m FROM z),
       |k AS (SELECT *, max(CASE WHEN p <= 0.1 * rank / m THEN rank END)
       |   OVER (PARTITION BY event_type) AS kmax FROM r)
       |SELECT event_type, event_id, round(p, 4) AS p, rank,
       | kmax IS NOT NULL AND rank <= kmax AS discovery FROM k""".stripMargin
      .replace("\n", " ")

  private val evRobust =
    """med AS (SELECT event_type, percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
      | FROM events GROUP BY event_type),
      |rob AS (SELECT e.event_type, any_value(m.med) AS med,
      |  percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(e.value - m.med)) AS mad
      | FROM events e JOIN med m USING (event_type) GROUP BY e.event_type)"""
      .stripMargin.replace("\n", " ")

  private val evQuant =
    """quant AS (SELECT event_type,
      | percentile_cont(0.25) WITHIN GROUP (ORDER BY value) AS q1,
      | percentile_cont(0.75) WITHIN GROUP (ORDER BY value) AS q3
      | FROM events GROUP BY event_type)""".stripMargin.replace("\n", " ")

  private val evHist =
    """hist AS (SELECT event_type, CAST(floor(value/10.0) AS BIGINT)::VARCHAR AS bucket,
      | count(*) AS cnt
      | FROM events GROUP BY 1, 2),
      |histn AS (SELECT event_type, bucket, cnt,
      | cnt / (sum(cnt) OVER (PARTITION BY event_type))::DOUBLE AS freq FROM hist)"""
      .stripMargin.replace("\n", " ")

  // per-attr scalar-bucket histogram + cumulative (attrHistogram semantics)
  private val evAttrHist =
    """ahist AS (SELECT event_type, CAST(floor(value/10.0) AS BIGINT) AS bucket, count(*) AS cnt
      | FROM events GROUP BY 1, 2),
      |ahistn AS (SELECT event_type, bucket, cnt,
      | cnt / (sum(cnt) OVER (PARTITION BY event_type))::DOUBLE AS freq,
      | (sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |  / (sum(cnt) OVER (PARTITION BY event_type))::DOUBLE AS cumFreq
      | FROM ahist)""".stripMargin.replace("\n", " ")

  // KMV bottom-k sketch of the per-lang token-hash space; estimate is
  // exact below k=64, else (k-1)/theta with theta = h_k / 2^56.
  private val kmvOracle =
    """WITH tk AS (SELECT DISTINCT lang,
      |  ('0x'||substr(md5(tok),1,14))::BIGINT AS h
      | FROM (SELECT lang, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
      |       FROM documents)),
      |r AS (SELECT lang, h,
      |  row_number() OVER (PARTITION BY lang ORDER BY h) AS rnk FROM tk)
      |SELECT lang, count(*) AS sketch_n,
      | round(CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
      |   ELSE 63.0 / (max(CASE WHEN rnk = 64 THEN h END)
      |                / 72057594037927936.0) END, 4) AS est_distinct
      |FROM r WHERE rnk <= 64 GROUP BY 1""".stripMargin.replace("\n", " ")

  // HLL p=9: bucket = low 9 hash bits, register = leading-zero count of
  // the 47-bit tail + 1 (= 48 − bit length, integer-exact via bin());
  // the small-range/raw estimator constants are interpolated from the
  // exact Scala doubles so both engines branch and divide identically
  private val hllOracle: String = {
    val m = 512.0
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val amm = alpha * m * m
    s"""WITH tk AS (SELECT lang,
       |  ('0x'||substr(md5(tok),1,14))::BIGINT AS h
       | FROM (SELECT lang, unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
       |       FROM documents)),
       |r AS (SELECT lang, (h % 512)::INT AS bucket,
       |  CASE WHEN (h // 512) = 0 THEN 48
       |       ELSE 48 - length(bin(h // 512)) END AS rho FROM tk),
       |regs AS (SELECT lang, bucket, max(rho) AS reg FROM r GROUP BY 1, 2),
       |agg AS (SELECT lang, count(*) AS n_buckets,
       |  sum(pow(2.0, -reg)) AS s FROM regs GROUP BY 1)
       |SELECT lang, n_buckets,
       | round(CASE WHEN ($amm / (s + (512.0 - n_buckets))) <= ${2.5 * m}
       |         AND (512.0 - n_buckets) > 0
       |    THEN 512.0 * ln(512.0 / (512.0 - n_buckets))
       |    ELSE $amm / (s + (512.0 - n_buckets)) END, 4) AS est_distinct
       |FROM agg""".stripMargin.replace("\n", " ")
  }

  // count-min: depth=4 md5-salted rows x width=512 additive counters;
  // estimate = min over rows of the probed counter (0 if bucket empty)
  private val cmsOracle =
    """WITH tok AS (SELECT lang,
      |  unnest(regexp_extract_all(lower(text), '\S+')) AS tok FROM documents),
      |d AS (SELECT unnest(range(4)) AS j),
      |cms AS (SELECT lang, j,
      |  ('0x'||substr(md5('cms:'||j::VARCHAR||':'||tok),1,14))::BIGINT % 512 AS bucket,
      |  count(*) AS cnt FROM tok CROSS JOIN d GROUP BY 1, 2, 3),
      |probe AS (SELECT DISTINCT lang,
      |  unnest(regexp_extract_all(lower(text), '\S+')) AS tok
      | FROM documents WHERE doc_id < 20),
      |pe AS (SELECT p.lang, p.tok, d.j,
      |  ('0x'||substr(md5('cms:'||d.j::VARCHAR||':'||p.tok),1,14))::BIGINT % 512 AS bucket
      | FROM probe p CROSS JOIN d)
      |SELECT pe.lang, pe.tok, min(coalesce(cms.cnt, 0)) AS est_cnt
      |FROM pe LEFT JOIN cms
      |  ON pe.lang = cms.lang AND pe.j = cms.j AND pe.bucket = cms.bucket
      |GROUP BY 1, 2""".stripMargin.replace("\n", " ")

  // bottom-k md5 row sample per event_type, quantile_cont over the
  // sample — the exact pipeline quantileSketch+Estimate runs
  private val qsketchOracle =
    """WITH rk AS (SELECT event_type, value,
      |  row_number() OVER (PARTITION BY event_type
      |    ORDER BY ('0x'||substr(md5(event_id::VARCHAR),1,14))::BIGINT, value) AS rnk
      | FROM events WHERE value IS NOT NULL),
      |s AS (SELECT event_type, value FROM rk WHERE rnk <= 256)
      |SELECT event_type, count(*)::BIGINT AS sketch_n,
      | round(quantile_cont(value, 0.25), 4) AS p25,
      | round(quantile_cont(value, 0.50), 4) AS p50,
      | round(quantile_cont(value, 0.75), 4) AS p75
      |FROM s GROUP BY 1""".stripMargin.replace("\n", " ")

  /** Shared 4dp fixed-point (group, value) CTE for the three
    * group-difference-test oracles. */
  private val gtFx =
    """fx AS (SELECT event_type AS g,
      |  (CASE WHEN value>=0 THEN floor(value*10000.0+0.5)
      |        ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS v
      |  FROM events WHERE value IS NOT NULL)""".stripMargin

  /** Shared ANOVA finish over a (g, fp) CTE named `z`; `unitSq` is the
    * squared fixed-point scale the SS columns divide out. The cross-
    * group Σ S_g²/n_g rides list_aggregate over a group-name-ordered
    * list — a sequential in-order fold, verified to match Spark's
    * aggregate() left fold. */
  private def anovaFinish(unitSq: String): String =
    s"""gg AS (SELECT g, count(*)::HUGEINT AS ng, sum(fp::HUGEINT) AS sg,
       |  sum(fp::HUGEINT * fp::HUGEINT) AS qg FROM z GROUP BY 1),
       |tot AS (SELECT count(*)::BIGINT AS k, sum(ng) AS n, sum(sg) AS s,
       |  sum(qg) AS q FROM gg),
       |tf AS (SELECT list_aggregate(
       |  list(sg::DOUBLE*sg::DOUBLE/ng::DOUBLE ORDER BY g), 'sum') AS t
       |  FROM gg),
       |fin AS (SELECT k, n::BIGINT AS n,
       |  (t - s::DOUBLE*s::DOUBLE/n::DOUBLE)/($unitSq) AS ssb,
       |  (q::DOUBLE - t)/($unitSq) AS ssw FROM tot, tf)
       |SELECT k, n, round(ssb, 4) AS ss_between, round(ssw, 4) AS ss_within,
       | round((ssb/(k-1))/(ssw/(n-k)), 4) AS f_stat FROM fin""".stripMargin

  /** 4dp fixed-point events CTE keeping ids — shared by the winsorize /
    * INT-transform oracles. */
  private val gtFx2 =
    """fx AS (SELECT event_id, event_type, value,
      |  (CASE WHEN value>=0 THEN floor(value*10000.0+0.5)
      |        ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS fp
      |  FROM events WHERE value IS NOT NULL)""".stripMargin

  /** Acklam probit as SQL text, generated from the SAME constants as
    * PostOps.probit with the SAME Horner association — double-identical
    * on both engines. `p` is a SQL expression string. */
  private[queries] def probitSql(p: String): String = {
    val a = Seq(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Seq(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Seq(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Seq(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    def horner(cs: Seq[Double], x: String): String =
      cs.tail.foldLeft(cs.head.toString)((acc, k) => s"($acc * $x + $k)")
    val plow = 0.02425
    val qc = s"(($p) - 0.5)"
    val rc = s"($qc * $qc)"
    val central = s"(${horner(a, rc)} * $qc / (${horner(b, rc)} * $rc + 1.0))"
    val ql = s"sqrt(-2.0 * ln($p))"
    val lower = s"(${horner(c, ql)} / (${horner(d, ql)} * $ql + 1.0))"
    val qu = s"sqrt(-2.0 * ln(1.0 - ($p)))"
    val upper = s"(-(${horner(c, qu)} / (${horner(d, qu)} * $qu + 1.0)))"
    s"(CASE WHEN ($p) < $plow THEN $lower" +
      s" WHEN ($p) > ${1.0 - plow} THEN $upper ELSE $central END)"
  }

  /** Spearman pair term: Pearson finish over HUGEINT-exact rank sums
    * (factors cast BEFORE multiplying — rank·1e4 squares pass BIGINT). */
  private def spearmanPair(a: String, b: String): String =
    s"""SELECT '$a' AS col_x, '$b' AS col_y, n,
       | round(CASE WHEN (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) > 0
       |   AND (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0
       |  THEN (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
       |   / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
       |    * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)) END, 4)
       |  AS corr
       |FROM (SELECT count(*)::BIGINT AS n,
       |  sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
       |  sum(x::HUGEINT * y::HUGEINT) AS sxy,
       |  sum(x::HUGEINT * x::HUGEINT) AS sxx,
       |  sum(y::HUGEINT * y::HUGEINT) AS syy
       | FROM (SELECT
       |  (CASE WHEN r$a >= 0 THEN floor(r$a*10000.0+0.5)
       |   ELSE -floor(-r$a*10000.0+0.5) END)::BIGINT AS x,
       |  (CASE WHEN r$b >= 0 THEN floor(r$b*10000.0+0.5)
       |   ELSE -floor(-r$b*10000.0+0.5) END)::BIGINT AS y
       |  FROM rk))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q299_effect_sizes" ->
      s"""WITH fx AS (SELECT event_type AS g, event_id AS id,
         |  (CASE WHEN value>=0 THEN floor(value*10000.0+0.5)
         |        ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS fp
         |  FROM events WHERE value IS NOT NULL),
         |gg AS (SELECT g, count(*)::HUGEINT AS n, sum(fp::HUGEINT) AS s,
         |  sum(fp::HUGEINT * fp::HUGEINT) AS q FROM fx GROUP BY 1),
         |d AS (SELECT a.g AS ga, b.g AS gb,
         |  a.n::BIGINT AS n_a, b.n::BIGINT AS n_b,
         |  (a.s::DOUBLE/a.n::DOUBLE - b.s::DOUBLE/b.n::DOUBLE) /
         |  sqrt(((a.n::DOUBLE - 1) *
         |     ((a.q::DOUBLE - a.s::DOUBLE*a.s::DOUBLE/a.n::DOUBLE)
         |       /(a.n::DOUBLE - 1))
         |    + (b.n::DOUBLE - 1) *
         |     ((b.q::DOUBLE - b.s::DOUBLE*b.s::DOUBLE/b.n::DOUBLE)
         |       /(b.n::DOUBLE - 1)))
         |   /(a.n::DOUBLE + b.n::DOUBLE - 2)) AS cohens_d
         |  FROM gg a JOIN gg b ON a.g < b.g),
         |r AS (SELECT g, fp, row_number() OVER (PARTITION BY g
         |    ORDER BY fp ASC, id ASC) AS rn,
         |  count(*) OVER (PARTITION BY g) AS nn FROM fx),
         |pts AS (SELECT g, fp FROM r
         |  WHERE (rn - 1) % CAST(ceil(nn::DOUBLE/150) AS BIGINT) = 0),
         |dl AS (SELECT a.g AS ga, b.g AS gb, count(*)::BIGINT AS mn,
         |  sum(CASE WHEN a.fp > b.fp THEN 1 ELSE 0 END)::BIGINT AS gt,
         |  sum(CASE WHEN a.fp < b.fp THEN 1 ELSE 0 END)::BIGINT AS lt
         |  FROM pts a JOIN pts b ON a.g < b.g GROUP BY 1, 2)
         |SELECT d.ga, d.gb, n_a, n_b, round(cohens_d, 4) AS cohens_d,
         | round((gt - lt)::DOUBLE / mn, 4) AS cliffs_delta
         |FROM d JOIN dl ON d.ga = dl.ga AND d.gb = dl.gb"""
        .stripMargin.replace("\n", " "),
    "q300_spearman" -> {
      def r2(c: String) =
        s"(2*rank() OVER (ORDER BY $c) + count(*) OVER (PARTITION BY $c)" +
          s" - 1)::DOUBLE AS r$c"
      s"""WITH src AS (SELECT
         |  (CASE WHEN l_quantity>=0 THEN floor(l_quantity*10000.0+0.5)
         |   ELSE -floor(-l_quantity*10000.0+0.5) END)::BIGINT AS q_,
         |  (CASE WHEN l_extendedprice>=0
         |   THEN floor(l_extendedprice*10000.0+0.5)
         |   ELSE -floor(-l_extendedprice*10000.0+0.5) END)::BIGINT AS e_,
         |  (CASE WHEN l_discount>=0 THEN floor(l_discount*10000.0+0.5)
         |   ELSE -floor(-l_discount*10000.0+0.5) END)::BIGINT AS d_
         |  FROM lineitem WHERE l_quantity IS NOT NULL
         |   AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
         |rk AS (SELECT ${r2("q_")}, ${r2("e_")}, ${r2("d_")} FROM src)
         |${spearmanPair("q_", "e_")
        .replace("'q_' AS col_x", "'l_quantity' AS col_x")
        .replace("'e_' AS col_y", "'l_extendedprice' AS col_y")}
         |UNION ALL
         |${spearmanPair("q_", "d_")
        .replace("'q_' AS col_x", "'l_quantity' AS col_x")
        .replace("'d_' AS col_y", "'l_discount' AS col_y")}
         |UNION ALL
         |${spearmanPair("e_", "d_")
        .replace("'e_' AS col_x", "'l_extendedprice' AS col_x")
        .replace("'d_' AS col_y", "'l_discount' AS col_y")}"""
        .stripMargin.replace("\n", " ")
    },
    "q292_winsorize" ->
      s"""WITH $gtFx2,
         |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
         |    ORDER BY fp ASC, event_id ASC) AS rn,
         |  count(*) OVER (PARTITION BY event_type) AS n FROM fx),
         |b AS (SELECT event_type,
         |  min(CASE WHEN rn = greatest(CAST(ceil(0.05*n) AS BIGINT), 1)
         |    THEN fp END) AS lo,
         |  min(CASE WHEN rn = n + 1 -
         |      greatest(CAST(ceil(0.05*n) AS BIGINT), 1)
         |    THEN fp END) AS hi
         |  FROM r GROUP BY 1)
         |SELECT f.event_id, f.event_type, round(f.value, 4) AS value,
         | round(least(greatest(f.fp, b.lo), b.hi)::DOUBLE / 1e4, 4)
         |   AS winsorized,
         | (f.fp < b.lo OR f.fp > b.hi) AS clipped
         |FROM fx f JOIN b USING (event_type)"""
        .stripMargin.replace("\n", " "),
    "q293_int_transform" ->
      s"""WITH $gtFx2,
         |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
         |    ORDER BY fp ASC, event_id ASC) AS rn,
         |  count(*) OVER (PARTITION BY event_type) AS n FROM fx)
         |SELECT event_id, event_type, round(value, 4) AS value,
         | round(${probitSql("(rn - 0.375) / (n + 0.25)")}, 4) AS z
         |FROM r""".stripMargin.replace("\n", " "),
    "q294_boxcox" ->
      s"""WITH g AS (SELECT unnest([-2.0, -1.5, -1.0, -0.5, 0.0, 0.5, 1.0,
         |    1.5, 2.0]) AS lambda),
         |fx AS (SELECT event_type, value FROM events
         |  WHERE value IS NOT NULL AND value > 0),
         |yr AS (SELECT event_type, lambda,
         |  (CASE WHEN (yv) >= 0 THEN floor((yv)*1000000.0+0.5)
         |        ELSE -floor(-(yv)*1000000.0+0.5) END)::BIGINT AS y,
         |  (CASE WHEN ln(value) >= 0 THEN floor(ln(value)*1000000.0+0.5)
         |        ELSE -floor(-ln(value)*1000000.0+0.5) END)::BIGINT AS l
         |  FROM (SELECT event_type, lambda, value,
         |    CASE WHEN lambda = 0.0 THEN ln(value)
         |         ELSE (exp(lambda * ln(value)) - 1.0) / lambda END AS yv
         |    FROM fx CROSS JOIN g)),
         |st AS (SELECT event_type, lambda, count(*)::HUGEINT AS n,
         |  sum(y::HUGEINT) AS s, sum(y::HUGEINT * y::HUGEINT) AS q,
         |  sum(l::HUGEINT) AS sl FROM yr GROUP BY 1, 2),
         |ll AS (SELECT event_type, lambda, n::BIGINT AS n_used,
         |  -(n::DOUBLE / 2) * ln((q::DOUBLE -
         |     s::DOUBLE*s::DOUBLE/n::DOUBLE) / n::DOUBLE / 1e12)
         |   + (lambda - 1.0) * (sl::DOUBLE / 1e6) AS ll FROM st)
         |SELECT event_type, lambda, round(ll, 4) AS ll, n_used,
         | row_number() OVER (PARTITION BY event_type
         |   ORDER BY ll DESC, lambda ASC) = 1 AS best
         |FROM ll""".stripMargin.replace("\n", " "),
    "q289_anova" ->
      s"""WITH $gtFx,
         |z AS (SELECT g, v AS fp FROM fx),
         |${anovaFinish("1e4*1e4")}""".stripMargin.replace("\n", " "),
    "q290_kruskal_wallis" ->
      s"""WITH $gtFx,
         |gvh AS (SELECT g, v, count(*)::BIGINT AS c FROM fx GROUP BY 1, 2),
         |vh AS (SELECT v, sum(c)::BIGINT AS ct FROM gvh GROUP BY 1),
         |vr AS (SELECT v, 2*(sum(ct) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ct)
         |  + ct + 1 AS r2 FROM vh),
         |gg AS (SELECT g, sum(c)::HUGEINT AS ng,
         |  sum((c*r2)::HUGEINT) AS rs2
         |  FROM gvh JOIN vr USING (v) GROUP BY 1),
         |tot AS (SELECT count(*)::BIGINT AS k, sum(ng) AS n FROM gg),
         |tf AS (SELECT list_aggregate(
         |  list(rs2::DOUBLE*rs2::DOUBLE/(4.0*ng::DOUBLE) ORDER BY g),
         |  'sum') AS t FROM gg),
         |ti AS (SELECT sum(ct*ct*ct - ct) AS tc FROM vh),
         |fin AS (SELECT k, n::BIGINT AS n,
         |  12.0/(n::DOUBLE*(n::DOUBLE+1))*t - 3*(n::DOUBLE+1) AS h,
         |  1.0 - tc::DOUBLE/(n::DOUBLE*n::DOUBLE*n::DOUBLE - n::DOUBLE)
         |    AS tcf
         |  FROM tot, tf, ti)
         |SELECT k, n, round(h/tcf, 4) AS h_stat,
         | round(tcf, 4) AS tie_correction
         |FROM fin""".stripMargin.replace("\n", " "),
    "q291_brown_forsythe" ->
      s"""WITH $gtFx,
         |mr AS (SELECT g, v, row_number() OVER (PARTITION BY g
         |    ORDER BY v ASC) AS rn,
         |  count(*) OVER (PARTITION BY g) AS c FROM fx),
         |med AS (SELECT g, (sum(v) * (CASE WHEN count(*) = 1 THEN 2
         |    ELSE 1 END))::BIGINT AS m2
         |  FROM mr WHERE rn = (c+1)//2 OR rn = c//2 + 1 GROUP BY 1),
         |z AS (SELECT g, abs(2*v - m2)::BIGINT AS fp
         |  FROM fx JOIN med USING (g)),
         |${anovaFinish("2e4*2e4")}""".stripMargin.replace("\n", " "),
    // nested-object values extract minified and byte-identical in both
    // engines (verified: Jackson map<string,string> == DuckDB
    // json_extract_string), so n_distinct/min_v hash-compare exactly
    "q263_json_profile" ->
      """WITH x AS (SELECT '{"k": ' || json_extract_string(props, '$.k') ||
        |  ', "type": "' || event_type ||
        |  '", "meta": {"day": ' || (epoch_ns(ts) // 86400000000000) ||
        |  ', "pos": "p' || (event_id % 7) ||
        |  '"}, "flag": ' || (CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'false' END) ||
        |  '}' AS j FROM events),
        |l1 AS (SELECT unnest(json_keys(j)) AS p, j FROM x),
        |v1 AS (SELECT p AS path, json_extract_string(j, '$.' || p) AS v FROM l1),
        |l2 AS (SELECT path, v AS j FROM v1 WHERE v LIKE '{%'),
        |v2 AS (SELECT path || '.' || k AS path, json_extract_string(j, '$.' || k) AS v
        | FROM (SELECT path, unnest(json_keys(j)) AS k, j FROM l2)),
        |allv AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2),
        |ty AS (SELECT path, v,
        |  CASE WHEN v IS NULL THEN 'null'
        |   WHEN v LIKE '{%' THEN 'object'
        |   WHEN v LIKE '[%' THEN 'array'
        |   WHEN v IN ('true', 'false') THEN 'boolean'
        |   WHEN regexp_matches(v, '^-?[0-9]+$') THEN 'integer'
        |   WHEN regexp_matches(v, '^-?[0-9]+\.[0-9]+([eE][+-]?[0-9]+)?$') THEN 'number'
        |   ELSE 'string' END AS t
        | FROM allv)
        |SELECT path, count(*) AS n, count(DISTINCT v) AS n_distinct,
        | sum(CASE WHEN t = 'integer' THEN 1 ELSE 0 END)::BIGINT AS n_int,
        | sum(CASE WHEN t = 'number' THEN 1 ELSE 0 END)::BIGINT AS n_num,
        | sum(CASE WHEN t = 'boolean' THEN 1 ELSE 0 END)::BIGINT AS n_bool,
        | sum(CASE WHEN t = 'object' THEN 1 ELSE 0 END)::BIGINT AS n_obj,
        | sum(CASE WHEN t = 'array' THEN 1 ELSE 0 END)::BIGINT AS n_arr,
        | sum(CASE WHEN t = 'string' THEN 1 ELSE 0 END)::BIGINT AS n_str,
        | min(v) AS min_v
        |FROM ty GROUP BY path""".stripMargin.replace("\n", " "),
    "q213_chi2" -> chi2Oracle,
    "q302_theils_u" -> {
      def ent(c: String, src: String, as: String) =
        s"""$as AS (SELECT sum(${fp(s"-($c::DOUBLE / n) * ln($c::DOUBLE / n)",
          "1e8")})::BIGINT AS $as FROM $src CROSS JOIN tot)"""
      s"""WITH $assocCtes,
         |${ent("ca", "ra", "ha8")},
         |${ent("cb", "cbm", "hb8")},
         |${ent("o", "obs", "hab8")}
         |SELECT round(ha8::DOUBLE / 1e8, 4) AS h_a,
         | round(hb8::DOUBLE / 1e8, 4) AS h_b,
         | round(hab8::DOUBLE / 1e8, 4) AS h_ab,
         | round((ha8 + hb8 - hab8)::DOUBLE / ha8, 4) AS u_a_given_b,
         | round((ha8 + hb8 - hab8)::DOUBLE / hb8, 4) AS u_b_given_a
         |FROM ha8 CROSS JOIN hb8 CROSS JOIN hab8"""
        .stripMargin.replace("\n", " ")
    },
    "q305_kendall_tau" ->
      """WITH base AS (SELECT event_id::BIGINT AS _id,
        |  (CASE WHEN value>=0 THEN floor(value*10000.0+0.5)
        |   ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS x,
        |  (CASE WHEN kk>=0 THEN floor(kk*10000.0+0.5)
        |   ELSE -floor(-kk*10000.0+0.5) END)::BIGINT AS y
        |  FROM (SELECT event_id, value,
        |    json_extract(props, '$.k')::INT::DOUBLE AS kk FROM events)
        |  WHERE value IS NOT NULL AND kk IS NOT NULL),
        |nn AS (SELECT count(*)::BIGINT AS n FROM base),
        |pts AS (SELECT _id, x, y FROM base CROSS JOIN nn
        |  WHERE ('0x'||substr(md5(_id::VARCHAR),1,14))::BIGINT
        |    / 72057594037927936.0 < 300.0 / n),
        |p AS (SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
        |  FROM pts a JOIN pts b ON a._id < b._id),
        |agg AS (SELECT
        |  sum(CASE WHEN (xa - xb)*(ya - yb) > 0 THEN 1 ELSE 0 END)::BIGINT
        |    AS concordant,
        |  sum(CASE WHEN (xa - xb)*(ya - yb) < 0 THEN 1 ELSE 0 END)::BIGINT
        |    AS discordant,
        |  sum(CASE WHEN xa = xb THEN 1 ELSE 0 END)::BIGINT AS tx,
        |  sum(CASE WHEN ya = yb THEN 1 ELSE 0 END)::BIGINT AS ty,
        |  count(*)::BIGINT AS n0 FROM p)
        |SELECT CAST(floor((1.0 + sqrt(1.0 + 8.0*n0))/2) AS BIGINT) AS m_used,
        | concordant, discordant,
        | round((concordant - discordant)::DOUBLE /
        |   sqrt((n0 - tx)::DOUBLE * (n0 - ty)::DOUBLE), 4) AS tau_b
        |FROM agg""".stripMargin.replace("\n", " "),
    "q238_assoc_rules" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS bk, p_brand AS item
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE p_brand IS NOT NULL),
        |nb AS (SELECT count(DISTINCT bk) AS n FROM bi),
        |it AS (SELECT item, count(*)::BIGINT AS cnt FROM bi GROUP BY 1),
        |pr AS (SELECT x.item AS item_a, y.item AS item_b,
        |  count(*)::BIGINT AS nab
        | FROM bi x JOIN bi y ON x.bk = y.bk AND x.item < y.item
        | GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT p.item_a, p.item_b, p.nab, a.cnt AS na, b.cnt AS nb,
        | n.n AS n_baskets,
        | round(p.nab::DOUBLE / n.n, 4) AS support,
        | round(p.nab::DOUBLE / a.cnt, 4) AS conf_ab,
        | round(p.nab::DOUBLE / b.cnt, 4) AS conf_ba,
        | round(n.n::DOUBLE * p.nab / (a.cnt::DOUBLE * b.cnt), 4) AS lift
        |FROM pr p JOIN it a ON a.item = p.item_a
        | JOIN it b ON b.item = p.item_b CROSS JOIN nb n"""
        .stripMargin.replace("\n", " "),
    "q214_mutual_info" -> miOracle,
    "q215_bh_fdr" -> bhFdrOracle,
    "q371_holm" ->
      s"""WITH $evStats,
         |z AS (SELECT e.event_id, e.event_type,
         |  exp(-(abs(e.value - s.mean) / s.std)) AS p
         | FROM events e JOIN stats s USING (event_type)
         | WHERE e.value IS NOT NULL),
         |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
         |   ORDER BY p, event_id)::BIGINT AS rank,
         |  count(*) OVER (PARTITION BY event_type)::BIGINT AS m FROM z),
         |k AS (SELECT *,
         |  least(1.0, max(p * (m - rank + 1)::DOUBLE)
         |    OVER (PARTITION BY event_type ORDER BY p, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS p_adj,
         |  min(CASE WHEN p > 0.1 / (m - rank + 1)::DOUBLE THEN rank END)
         |    OVER (PARTITION BY event_type) AS fail FROM r)
         |SELECT event_type, event_id, round(p, 4) AS p, rank,
         | round(p_adj, 4) AS p_adj,
         | (fail IS NULL OR rank < fail) AS rejected FROM k"""
        .stripMargin.replace("\n", " "),
    "q372_james_stein" ->
      s"""WITH $gtFx,
         |g AS (SELECT g AS key, count(*)::BIGINT AS n,
         |  sum(v)::HUGEINT AS s, sum(v::HUGEINT * v::HUGEINT) AS q
         |  FROM fx GROUP BY 1 HAVING count(*) >= 2),
         |km AS (SELECT key, n,
         |  s::DOUBLE / n::DOUBLE / 1e4 AS m,
         |  ((q::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
         |    / (n::DOUBLE - 1) / 1e8) / n::DOUBLE AS se2 FROM g),
         |f AS (SELECT count(*)::BIGINT AS k,
         |  list_aggregate(list(m ORDER BY key), 'sum') AS sm,
         |  list(m ORDER BY key) AS ms,
         |  list_aggregate(list(se2 ORDER BY key), 'sum') AS ss2 FROM km),
         |c AS (SELECT k, sm / k::DOUBLE AS gm,
         |  greatest(0.0, 1.0 - (k::DOUBLE - 3)
         |    * (ss2 / k::DOUBLE)
         |    / list_aggregate(list_transform(ms,
         |        x -> (x - sm / k::DOUBLE) * (x - sm / k::DOUBLE)), 'sum'))
         |   AS cst FROM f)
         |SELECT km.key, km.n, round(km.m, 4) AS mean,
         | round(c.gm + c.cst * (km.m - c.gm), 4) AS shrunk
         |FROM km, c""".stripMargin.replace("\n", " "),
    "q307_by_fdr" ->
      s"""WITH $evStats,
         |z AS (SELECT e.event_id, e.event_type,
         |  exp(-(abs(e.value - s.mean) / s.std)) AS p
         | FROM events e JOIN stats s USING (event_type)
         | WHERE e.value IS NOT NULL),
         |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
         |   ORDER BY p, event_id)::BIGINT AS rank,
         |  count(*) OVER (PARTITION BY event_type)::BIGINT AS m FROM z),
         |h AS (SELECT *, sum((CASE WHEN (1.0/rank) >= 0
         |    THEN floor((1.0/rank)*1000000000000.0+0.5)
         |    ELSE -floor(-(1.0/rank)*1000000000000.0+0.5) END)::BIGINT)
         |   OVER (PARTITION BY event_type)::DOUBLE / 1e12 AS c_m FROM r),
         |k AS (SELECT *, max(CASE WHEN p <= 0.1 * rank / (m * c_m)
         |   THEN rank END)
         |   OVER (PARTITION BY event_type) AS kmax FROM h)
         |SELECT event_type, event_id, round(p, 4) AS p, rank,
         | round(c_m, 4) AS c_m,
         | kmax IS NOT NULL AND rank <= kmax AS discovery FROM k"""
        .stripMargin.replace("\n", " "),
    "q239_conformal" ->
      """WITH u AS (
        | SELECT event_type, event_id, value AS s, 0 AS cal FROM events
        |  WHERE event_id % 5 <> 0 AND value IS NOT NULL
        | UNION ALL
        | SELECT event_type, NULL::BIGINT, value, 1 FROM events
        |  WHERE event_id % 5 = 0 AND value IS NOT NULL),
        |w AS (SELECT *, sum(cal) OVER (PARTITION BY event_type ORDER BY s DESC
        |  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS geq FROM u),
        |nc AS (SELECT event_type, count(*) AS ncal FROM u WHERE cal = 1
        | GROUP BY 1)
        |SELECT w.event_type, w.event_id, round(w.s, 4) AS value,
        | round((1 + w.geq)::DOUBLE / (nc.ncal + 1), 4) AS p_value
        |FROM w JOIN nc USING (event_type) WHERE w.cal = 0"""
        .stripMargin.replace("\n", " "),
    "q217_profile" -> profileOracle,
    "q218_constraints" -> constraintsOracle,
    "q219_motif" -> motifOracle,
    "q226_corr_matrix" -> {
      def pairSql(a: String, b: String) =
        s"""SELECT '$a' AS col_x, '$b' AS col_y, n,
           | round(CASE WHEN (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) > 0
           |   AND (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0
           |  THEN (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
           |   / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
           |    * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)) END, 4)
           |  AS corr
           |FROM (SELECT count(*)::BIGINT AS n,
           |  sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
           |  sum(x * y)::HUGEINT AS sxy, sum(x * x)::HUGEINT AS sxx,
           |  sum(y * y)::HUGEINT AS syy
           | FROM (SELECT ${fp(a, "1e4")} AS x, ${fp(b, "1e4")} AS y
           |  FROM src WHERE ($a) IS NOT NULL AND ($b) IS NOT NULL))"""
          .stripMargin.replace("\n", " ")
      val src = """src AS (SELECT value,
        | json_extract(props, '$.k')::INT::DOUBLE AS k,
        | (epoch_ns(ts) // 86400000000000)::DOUBLE AS day FROM events)"""
        .stripMargin.replace("\n", " ")
      s"""WITH $src ${pairSql("value", "k")} UNION ALL
         |${pairSql("value", "day")} UNION ALL
         |${pairSql("k", "day")}""".stripMargin.replace("\n", " ")
    },
    "q224_cdf_transform" ->
      """SELECT event_type, event_id, round(value, 4) AS value,
        | round(cume_dist() OVER w, 4) AS cdf,
        | round(percent_rank() OVER w, 4) AS pct_rank
        |FROM events WHERE value IS NOT NULL
        |WINDOW w AS (PARTITION BY event_type ORDER BY value)"""
        .stripMargin.replace("\n", " "),
    "q222_target_encode" ->
      s"""WITH obs AS (SELECT event_type AS category,
         |  ${fp("value", "1e4")} AS y4 FROM events WHERE value IS NOT NULL),
         |per AS (SELECT category, sum(y4)::BIGINT AS sy,
         |  count(*)::BIGINT AS n FROM obs GROUP BY category),
         |g AS (SELECT sum(y4)::BIGINT AS gsy, count(*)::BIGINT AS gn
         |  FROM obs)
         |SELECT category, n,
         | round(((sy::DOUBLE / 10000.0)
         |   + 20.0 * ((gsy::DOUBLE / 10000.0) / gn)) / (n + 20.0), 4) AS enc
         |FROM per CROSS JOIN g""".stripMargin.replace("\n", " "),
    "q123_quantile_sketch" -> qsketchOracle,
    // lossless merge: the merged sketch IS the direct sketch
    "q124_qsketch_merge" -> qsketchOracle,
    "q125_join_card" ->
      """WITH d AS (SELECT unnest(range(4)) AS j),
        |ca AS (SELECT j,
        |  ('0x'||substr(md5('cms:'||j::VARCHAR||':'||o_custkey::VARCHAR),1,14))::BIGINT % 512 AS bucket,
        |  count(*) AS cnt FROM orders CROSS JOIN d GROUP BY 1, 2),
        |cb AS (SELECT j,
        |  ('0x'||substr(md5('cms:'||j::VARCHAR||':'||c_custkey::VARCHAR),1,14))::BIGINT % 512 AS bucket,
        |  count(*) AS cnt FROM customer CROSS JOIN d GROUP BY 1, 2),
        |dots AS (SELECT ca.j, sum(ca.cnt * cb.cnt) AS dot
        | FROM ca JOIN cb ON ca.j = cb.j AND ca.bucket = cb.bucket GROUP BY 1),
        |est AS (SELECT (CASE WHEN count(*) < 4 THEN 0 ELSE min(dot) END)::BIGINT AS est_pairs
        | FROM dots),
        |tp AS (SELECT count(*)::BIGINT AS true_pairs
        | FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT est_pairs, true_pairs FROM est CROSS JOIN tp"""
        .stripMargin.replace("\n", " "),
    "q126_skew_profile" ->
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
        |t AS (SELECT sum(cnt)::BIGINT AS total, count(*)::BIGINT AS nkeys FROM c)
        |SELECT user_id, cnt,
        | round(cnt / total::DOUBLE, 4) AS share,
        | round(cnt / (total::DOUBLE / nkeys), 4) AS skew,
        | CASE WHEN cnt / (total::DOUBLE / nkeys) > 2.0
        |   THEN CAST(ceil(cnt / (total::DOUBLE / nkeys)) AS BIGINT)
        |   ELSE 1 END AS saltsRec
        |FROM c CROSS JOIN t
        |ORDER BY cnt DESC, user_id LIMIT 5""".stripMargin.replace("\n", " "),
    "q128_props_zscore" ->
      """WITH x AS (SELECT event_id, event_type,
        |  json_extract(props, '$.k')::INT::DOUBLE AS k FROM events),
        |st AS (SELECT event_type, avg(k) AS mean, stddev_samp(k) AS std
        | FROM x GROUP BY 1)
        |SELECT e.event_id, e.event_type, round(e.k, 4) AS k,
        | round(abs(e.k - st.mean)/st.std, 4) AS score,
        | CASE WHEN abs(e.k - st.mean)/st.std > 2.0 THEN 'O' ELSE 'N' END AS tag
        |FROM x e JOIN st USING (event_type)""".stripMargin.replace("\n", " "),
    "q01_stats_fit" ->
      s"""WITH $evStats
         |SELECT event_type, 'value' AS attr, round(mean,4) AS mean, round(std,4) AS std,
         | cnt, round(vmin,4) AS vmin, round(vmax,4) AS vmax FROM stats""".stripMargin.replace("\n", " "),
    // merged per-half models must equal the direct fit of the union —
    // the oracle IS the q01 oracle
    "q112_stats_merge" ->
      s"""WITH $evStats
         |SELECT event_type, 'value' AS attr, round(mean,4) AS mean, round(std,4) AS std,
         | cnt, round(vmin,4) AS vmin, round(vmax,4) AS vmax FROM stats""".stripMargin.replace("\n", " "),
    // stream-scorer twins: the stream-static zscore join and the
    // event-time hour windows replay directly in SQL
    "q163_zscore_stream" ->
      s"""WITH $evStats
         |SELECT e.user_id, e.event_id, e.event_type, round(e.value, 4) AS value,
         | round(CASE WHEN s.std > 0 THEN abs(e.value - s.mean) / s.std END, 4)
         |   AS score,
         | CASE WHEN s.std IS NULL OR s.std <= 0 THEN 'I'
         |  WHEN abs(e.value - s.mean) / s.std > 2.0 THEN 'O' ELSE 'N' END AS tag
         |FROM events e LEFT JOIN stats s USING (event_type)"""
        .stripMargin.replace("\n", " "),
    "q164_windowed_stats" ->
      """WITH w AS (SELECT event_type,
        |  (epoch_us(ts) // 3600000000) * 3600000000 AS start_us, value
        | FROM events)
        |SELECT event_type, start_us, start_us + 3600000000 AS end_us,
        | round(avg(value), 4) AS mean, round(stddev_samp(value), 4) AS std,
        | count(value) AS cnt
        |FROM w GROUP BY 1, 2""".stripMargin.replace("\n", " "),
    "q119_cms_estimate" -> cmsOracle,
    // lossless sum-merge: the merged sketch IS the direct sketch
    "q120_cms_merge" -> cmsOracle,
    "q117_kmv_distinct" -> kmvOracle,
    // lossless merge: the merged sketch IS the direct sketch
    "q118_kmv_merge" -> kmvOracle,
    "q157_hll_distinct" -> hllOracle,
    // register max is associative — merged registers == direct registers
    "q158_hll_merge" -> hllOracle,
    // batch-executed stream twin: one batch == final online snapshot
    "q160_hll_stream" -> hllOracle,
    // batch-executed stream twins: one batch == final online snapshot
    "q143_kmv_stream" -> kmvOracle,
    "q144_cms_stream" -> cmsOracle,
    "q145_qsketch_stream" -> qsketchOracle,
    "q02_robust_fit" ->
      s"""WITH $evRobust
         |SELECT event_type, 'value' AS attr, round(med,4) AS med, round(mad,4) AS mad
         | FROM rob""".stripMargin.replace("\n", " "),
    "q03_quantile_fit" ->
      s"""WITH $evQuant
         |SELECT event_type, 'value' AS attr, round(q1,4) AS q1, round(q3,4) AS q3,
         | round(q3-q1,4) AS iqr FROM quant""".stripMargin.replace("\n", " "),
    "q04_histogram_fit" ->
      s"""WITH $evHist
         |SELECT event_type, bucket, cnt, round(freq,4) AS freq FROM histn"""
        .stripMargin.replace("\n", " "),
    // merged per-half histograms must equal the direct fit (q04 oracle)
    "q113_histogram_merge" ->
      s"""WITH $evHist
         |SELECT event_type, bucket, cnt, round(freq,4) AS freq FROM histn"""
        .stripMargin.replace("\n", " "),
    "q79_histogram_ids" ->
      """SELECT event_type, CAST(floor(value/10.0) AS BIGINT)::VARCHAR AS bucket,
        | count(*) AS cnt,
        | array_to_string(list(event_id ORDER BY event_id), ':') AS idList
        |FROM events GROUP BY 1, 2""".stripMargin.replace("\n", " "),
    "q80_eqprob_boundaries" ->
      """WITH q AS (SELECT event_type,
        |  quantile_cont(value, [0.25, 0.5, 0.75]) AS bs
        | FROM events GROUP BY 1)
        |SELECT event_type, 'value' AS attr, v.i AS qidx,
        | round(bs[v.i], 4) AS boundary
        |FROM q CROSS JOIN (VALUES (1), (2), (3)) v(i)"""
        .stripMargin.replace("\n", " "),
    "q358_rank_ensemble" -> {
      def prCte(fc: String) =
        s"""h_$fc AS (SELECT $fc, count(*)::BIGINT AS ct FROM f GROUP BY 1),
           |p_$fc AS (SELECT $fc,
           |  (2 * (sum(ct) OVER (ORDER BY $fc ASC
           |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ct)
           |   + ct + 1)::DOUBLE
           |  / (2 * (SELECT sum(ct) FROM h_$fc))::DOUBLE AS p
           | FROM h_$fc)""".stripMargin
      s"""WITH $evStats, $evRobust, $evHist,
         |sc AS (SELECT e.event_id,
         |  abs(e.value - s.mean) / s.std AS sz,
         |  abs(e.value - r.med) / r.mad AS sr,
         |  1.0 - coalesce(h.freq, 0.0) AS se
         | FROM events e JOIN stats s USING (event_type)
         | JOIN rob r USING (event_type)
         | LEFT JOIN histn h ON e.event_type = h.event_type
         |  AND CAST(floor(e.value/10.0) AS BIGINT)::VARCHAR = h.bucket),
         |f AS (SELECT event_id, ${fp("sz", "1e3")} AS fz,
         |  ${fp("sr", "1e3")} AS fr, ${fp("se", "1e3")} AS fe FROM sc),
         |${prCte("fz")}, ${prCte("fr")}, ${prCte("fe")}
         |SELECT f.event_id, round(pz.p, 4) AS rank_s_z,
         | round(pr2.p, 4) AS rank_s_r, round(pe.p, 4) AS rank_s_e,
         | round((pz.p + pr2.p + pe.p) / 3, 4) AS ensemble
         |FROM f JOIN p_fz pz USING (fz) JOIN p_fr pr2 USING (fr)
         | JOIN p_fe pe USING (fe)""".stripMargin.replace("\n", " ")
    },
    "q05_zscore" ->
      s"""WITH $evStats
         |SELECT e.event_id, e.event_type, round(e.value,4) AS value,
         | round(abs(e.value - s.mean)/s.std, 4) AS score,
         | CASE WHEN abs(e.value - s.mean)/s.std > 2.0 THEN 'O' ELSE 'N' END AS tag
         |FROM events e JOIN stats s USING (event_type)""".stripMargin.replace("\n", " "),
    "q06_robust_zscore" ->
      s"""WITH $evRobust
         |SELECT e.event_id, e.event_type, round(e.value,4) AS value,
         | round(abs(e.value - r.med)/r.mad, 4) AS score,
         | CASE WHEN abs(e.value - r.med)/r.mad > 3.0 THEN 'O' ELSE 'N' END AS tag
         |FROM events e JOIN rob r USING (event_type)""".stripMargin.replace("\n", " "),
    "q07_extreme_value" ->
      s"""WITH $evStats
         |SELECT e.event_id, e.event_type, round(e.value,4) AS value,
         | round(exp(-exp(-abs(e.value - s.mean)/s.std)), 4) AS score,
         | CASE WHEN exp(-exp(-abs(e.value - s.mean)/s.std)) > 0.9 THEN 'O' ELSE 'N' END AS tag
         |FROM events e JOIN stats s USING (event_type)""".stripMargin.replace("\n", " "),
    "q08_est_prob" ->
      s"""WITH $evHist
         |SELECT e.event_id, e.event_type, round(e.value,4) AS value,
         | round(1.0 - coalesce(h.freq, 0.0), 4) AS score,
         | CASE WHEN 1.0 - coalesce(h.freq, 0.0) > 0.99 THEN 'O' ELSE 'N' END AS tag
         |FROM events e LEFT JOIN histn h
         | ON e.event_type = h.event_type
         | AND CAST(floor(e.value/10.0) AS BIGINT)::VARCHAR = h.bucket"""
        .stripMargin.replace("\n", " "),
    "q09_iqr_score" ->
      s"""WITH $evQuant
         |SELECT e.event_id, e.event_type, round(e.value,4) AS value,
         | round(CASE WHEN e.value < q.q1 THEN (q.q1 - e.value)/(q.q3 - q.q1)
         |            WHEN e.value > q.q3 THEN (e.value - q.q3)/(q.q3 - q.q1)
         |            ELSE 0.0 END, 4) AS score,
         | CASE WHEN (CASE WHEN e.value < q.q1 THEN (q.q1 - e.value)/(q.q3 - q.q1)
         |            WHEN e.value > q.q3 THEN (e.value - q.q3)/(q.q3 - q.q1)
         |            ELSE 0.0 END) > 1.5 THEN 'O' ELSE 'N' END AS tag
         |FROM events e JOIN quant q USING (event_type)""".stripMargin.replace("\n", " "),
    "q10_outliers_only" ->
      s"""WITH $evStats
         |SELECT e.event_id, e.event_type, round(e.value,4) AS value,
         | round(abs(e.value - s.mean)/s.std, 4) AS score, 'O' AS tag
         |FROM events e JOIN stats s USING (event_type)
         |WHERE abs(e.value - s.mean)/s.std > 2.0""".stripMargin.replace("\n", " "),
    "q11_clean_data" ->
      s"""WITH $evStats
         |SELECT e.event_id, e.event_type, e.value
         |FROM events e JOIN stats s USING (event_type)
         |WHERE abs(e.value - s.mean)/s.std <= 2.0""".stripMargin.replace("\n", " "),
    "q29_est_attr_prob" ->
      s"""WITH $evAttrHist
         |SELECT e.event_id, e.event_type, round(e.value,4) AS value,
         | round(least(-ln(greatest(coalesce(h.freq,0.0), 1e-12)), 20.0), 4) AS score,
         | CASE WHEN least(-ln(greatest(coalesce(h.freq,0.0), 1e-12)), 20.0) > 6.0
         |   THEN 'O' ELSE 'N' END AS tag
         |FROM events e LEFT JOIN ahistn h
         | ON e.event_type = h.event_type AND CAST(floor(e.value/10.0) AS BIGINT) = h.bucket"""
        .stripMargin.replace("\n", " "),
    "q74_est_attr_prob_inverse" ->
      s"""WITH $evAttrHist
         |SELECT e.event_id, e.event_type, round(e.value,4) AS value,
         | round(1.0 - coalesce(h.freq, 0.0), 4) AS score,
         | CASE WHEN 1.0 - coalesce(h.freq, 0.0) > 0.99 THEN 'O' ELSE 'N' END AS tag
         |FROM events e LEFT JOIN ahistn h
         | ON e.event_type = h.event_type AND CAST(floor(e.value/10.0) AS BIGINT) = h.bucket"""
        .stripMargin.replace("\n", " "),
    "q30_est_cum_prob" ->
      s"""WITH $evAttrHist
         |SELECT e.event_id, e.event_type, round(e.value,4) AS value,
         | round(CASE WHEN h.cumFreq IS NULL THEN NULL
         |   WHEN h.cumFreq < 0.5 THEN 1.0 - h.cumFreq ELSE h.cumFreq END, 4) AS score,
         | CASE WHEN h.cumFreq IS NULL THEN 'I'
         |   WHEN (CASE WHEN h.cumFreq < 0.5 THEN 1.0 - h.cumFreq ELSE h.cumFreq END) > 0.99
         |   THEN 'O' ELSE 'N' END AS tag
         |FROM events e LEFT JOIN ahistn h
         | ON e.event_type = h.event_type AND CAST(floor(e.value/10.0) AS BIGINT) = h.bucket"""
        .stripMargin.replace("\n", " "),
    "q31_est_meta_prob" ->
      s"""WITH $evAttrHist,
         |meta AS (SELECT event_type, CAST(floor(freq/0.02) AS BIGINT) AS fbucket,
         |  sum(cnt) AS fcnt FROM ahistn GROUP BY 1,2),
         |metan AS (SELECT event_type, fbucket,
         |  fcnt / (sum(fcnt) OVER (PARTITION BY event_type))::DOUBLE AS metaFreq FROM meta)
         |SELECT e.event_id, e.event_type, round(e.value,4) AS value,
         | round(least(-ln(greatest(coalesce(m.metaFreq,0.0), 1e-12)), 20.0), 4) AS score,
         | CASE WHEN least(-ln(greatest(coalesce(m.metaFreq,0.0), 1e-12)), 20.0) > 6.0
         |   THEN 'O' ELSE 'N' END AS tag
         |FROM events e
         |LEFT JOIN ahistn h ON e.event_type = h.event_type
         |  AND CAST(floor(e.value/10.0) AS BIGINT) = h.bucket
         |LEFT JOIN metan m ON e.event_type = m.event_type
         |  AND CAST(floor(coalesce(h.freq,0.0)/0.02) AS BIGINT) = m.fbucket"""
        .stripMargin.replace("\n", " "),
    "q32_mahalanobis" ->
      """WITH m AS (SELECT l_returnflag, avg(l_quantity) AS mu1, avg(l_extendedprice) AS mu2,
        |  covar_samp(l_quantity, l_quantity) AS c11,
        |  covar_samp(l_quantity, l_extendedprice) AS c12,
        |  covar_samp(l_extendedprice, l_extendedprice) AS c22
        | FROM lineitem GROUP BY 1),
        |inv AS (SELECT l_returnflag, mu1, mu2,
        |  c22/(c11*c22 - c12*c12) AS i11, -c12/(c11*c22 - c12*c12) AS i12,
        |  c11/(c11*c22 - c12*c12) AS i22 FROM m),
        |sc AS (SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_quantity,
        |  l.l_extendedprice,
        |  sqrt(greatest(
        |    (l.l_quantity - i.mu1)*(l.l_quantity - i.mu1)*i.i11
        |    + 2*(l.l_quantity - i.mu1)*(l.l_extendedprice - i.mu2)*i.i12
        |    + (l.l_extendedprice - i.mu2)*(l.l_extendedprice - i.mu2)*i.i22, 0.0)) AS score
        | FROM lineitem l JOIN inv i USING (l_returnflag))
        |SELECT l_orderkey, l_linenumber, l_returnflag, round(l_quantity,4) AS l_quantity,
        | round(l_extendedprice,4) AS l_extendedprice, round(score,4) AS score,
        | CASE WHEN score > 3.0 THEN 'O' ELSE 'N' END AS tag FROM sc"""
        .stripMargin.replace("\n", " "),
    "q33_out_range" ->
      """SELECT event_id, event_type, round(value,4) AS value,
        | round(1.0/(1.0+exp(-0.05*(CASE WHEN value > 75.0 THEN value - 150.0
        |   ELSE 0.0 - value END))), 4) AS score,
        | CASE WHEN 1.0/(1.0+exp(-0.05*(CASE WHEN value > 75.0 THEN value - 150.0
        |   ELSE 0.0 - value END))) > 0.8 THEN 'O' ELSE 'N' END AS tag
        |FROM events""".stripMargin.replace("\n", " "),
    "q34_in_range" ->
      """SELECT event_id, event_type, round(value,4) AS value,
        | round(1.0 - 1.0/(1.0+exp(-0.05*(CASE WHEN value > 250.0 THEN value - 300.0
        |   ELSE 200.0 - value END))), 4) AS score,
        | CASE WHEN 1.0 - 1.0/(1.0+exp(-0.05*(CASE WHEN value > 250.0 THEN value - 300.0
        |   ELSE 200.0 - value END))) > 0.8 THEN 'O' ELSE 'N' END AS tag
        |FROM events""".stripMargin.replace("\n", " "),
    "q35_polarity_suppress" ->
      s"""WITH $evStats
         |SELECT e.event_id, e.event_type, round(e.value,4) AS value,
         | round(abs(e.value - s.mean)/s.std, 4) AS score,
         | CASE WHEN abs(e.value - s.mean)/s.std > 2.0 AND e.value > s.mean
         |   THEN 'O' ELSE 'N' END AS tag
         |FROM events e JOIN stats s USING (event_type)""".stripMargin.replace("\n", " "),
  )
}
