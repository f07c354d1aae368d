package graft.queries

import graft.core._
import graft.drift.Drift
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries + oracles for the concept-drift family (§2.9). Error stream =
  * outlier indicator from the z-score pipeline, per event_type over
  * event_id order. EWMA drift is a per-key recurrence — its oracle runs
  * the recurrence as a DuckDB recursive CTE. */
object DriftQueries {

  private def errStream(s: SparkSession, dir: String): DataFrame =
    StatQueries.zscored(s, dir)
      .withColumn("err", (col("tag") === "O").cast("int"))
      .select("event_type", "event_id", "err", "value")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Benford first-digit conformity per event_type (one hash agg;
    // χ²/MAD from fixed left-associated 9-term expressions)
    "q200_benford" -> ((s, dir) =>
      canon(graft.drift.Drift.benford(table(s, dir, "events"),
        Seq("event_type"), "value"))),
    // PSI between the even-id half (reference) and the odd-id half with
    // a 1.25× value shift (induced drift): Laplace-smoothed bin shares,
    // 6dp fixed-point term sums — ln parity is the only float
    // assumption (the q174 class)
    // per-dimension embedding drift: even/odd vec_id halves, Welch z
    // per axis (the "which dimensions moved" view behind q246)
    "q363_dim_drift" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      canon(Drift.dimensionDrift(
        e.where(col("vec_id") % 2 === 0),
        e.where(col("vec_id") % 2 === 1), "embedding"))
    }),
    // Hellinger distance over the q189 ref/cur split: bounded-metric
    // face of PSI/JSD (BC = Σ√(p·q), 8dp-frozen terms)
    "q354_hellinger" -> ((s, dir) => {
      val e = table(s, dir, "events").select("event_type", "event_id", "value")
      val ref = e.where(col("event_id") % 2 === 0)
      val cur = e.where(col("event_id") % 2 === 1)
        .withColumn("value",
          when(col("event_type").isin("click", "view"), col("value"))
            .otherwise(col("value") * 1.3 + 25.0))
      canon(Drift.hellinger(ref, cur, Seq("event_type"), "value",
        nBins = 10))
    }),
    "q189_psi" -> ((s, dir) => {
      val e = table(s, dir, "events").select("event_type", "event_id", "value")
      val ref = e.where(col("event_id") % 2 === 0)
      // click/view stay identically distributed (psi ≈ 0 → stable);
      // the rest get a 1.3×+25 shift (psi ≫ 0.2 → drifted): both
      // verdict classes populated
      val cur = e.where(col("event_id") % 2 === 1)
        .withColumn("value",
          when(col("event_type").isin("click", "view"), col("value"))
            .otherwise(col("value") * 1.3 + 25.0))
      canon(Drift.psi(ref, cur, Seq("event_type"), "value", nBins = 10))
    }),
    // per-label embedding centroid drift: even/odd vec_id split, labels
    // ≥ 5 get an affine perturbation on the current side (induced
    // translation — the model-version-change signature)
    "q246_centroid_drift" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val ref = e.where(col("vec_id") % 2 === 0)
      val cur = e.where(col("vec_id") % 2 === 1)
        .withColumn("embedding",
          when(col("label") >= 5,
            transform(col("embedding"),
              x => x.cast("double") * 1.2 + 0.1))
            .otherwise(transform(col("embedding"), x => x.cast("double"))))
      canon(Drift.embeddingCentroidDrift(ref, cur, Seq("label"),
        "embedding", threshold = 0.5))
    }),
    // exact 1-D Wasserstein distance on the same ref/cur split as q189
    // — the unbinned integral drift metric in the value's own units
    "q244_wasserstein" -> ((s, dir) => {
      val e = table(s, dir, "events").select("event_type", "event_id", "value")
      val ref = e.where(col("event_id") % 2 === 0)
      val cur = e.where(col("event_id") % 2 === 1)
        .withColumn("value",
          when(col("event_type").isin("click", "view"), col("value"))
            .otherwise(col("value") * 1.3 + 25.0))
      canon(Drift.wasserstein(ref, cur, Seq("event_type"), "value",
        threshold = 5.0))
    }),
    // Jensen–Shannon divergence on the same ref/cur split as q189 —
    // PSI's bounded symmetric sibling, 8dp fixed-point terms
    "q230_jsd" -> ((s, dir) => {
      val e = table(s, dir, "events").select("event_type", "event_id", "value")
      val ref = e.where(col("event_id") % 2 === 0)
      val cur = e.where(col("event_id") % 2 === 1)
        .withColumn("value",
          when(col("event_type").isin("click", "view"), col("value"))
            .otherwise(col("value") * 1.3 + 25.0))
      canon(Drift.jsDivergence(ref, cur, Seq("event_type"), "value",
        nBins = 10))
    }),
    // the streaming PSI twin batch-executed (the q100 device): one
    // micro-batch holds the whole current window, so the emitted
    // snapshot must equal the batch operator — and the DuckDB oracle
    "q191_psi_stream" -> ((s, dir) => {
      val e = table(s, dir, "events").select("event_type", "event_id", "value")
      val ref = e.where(col("event_id") % 2 === 0)
      val cur = e.where(col("event_id") % 2 === 1)
        .withColumn("value",
          when(col("event_type").isin("click", "view"), col("value"))
            .otherwise(col("value") * 1.3 + 25.0))
      val model = Drift.psiRefModel(ref, "event_type", "value", nBins = 10)
      canon(graft.streaming.StreamScorers.psiStream(cur, "event_type",
        "value", model, nBins = 10).toDF()
        .withColumnRenamed("key", "event_type"))
    }),
    "q64_drift_ddm" -> ((s, dir) =>
      canon(Drift.ddm(errStream(s, dir), Seq("event_type"), "event_id", "err")
        .select("event_type", "event_id", "err", "i", "p", "s", "level"))),
    "q65_drift_fhddm" -> ((s, dir) =>
      canon(Drift.fhddm(errStream(s, dir), Seq("event_type"), "event_id", "err",
        window = 100, delta = 0.000001)
        .select("event_type", "event_id", "err", "acc", "maxAcc", "drift"))),
    "q66_drift_ewma" -> ((s, dir) =>
      canon(Drift.ewmaDrift(errStream(s, dir), Seq("event_type"), "event_id",
        "value", lambda = 0.1, L = 3.0).toDF())),
    "q68_drift_eddm" -> ((s, dir) =>
      canon(Drift.eddm(errStream(s, dir), Seq("event_type"), "event_id", "err")
        .select("event_type", "event_id", "nErr", "d", "p2s", "maxP2s", "level"))),
    "q69_seasonal_zscore" -> ((s, dir) => {
      val data = graft.core.Seasonal.withCycle(
        table(s, dir, "events"), "ts", "hourOfDay")
      val keys = Seq("event_type", "cycleType", "cycleIndex")
      val stats = graft.model.Fitters.stats(data, keys, Seq("value"))
      canon(graft.score.Scorers.zscore(data, stats,
        graft.score.Scorers.Cfg(keys, Seq("value"), threshold = 2.5))
        .select("event_id", "event_type", "cycleIndex", "value", "score", "tag"))
    }),
    // q69's flow driven ENTIRELY through the reference-property config
    // runner (and.conf vocabulary incl. the seasonal block) — gates the
    // dispatch layer itself, not just the operators it calls; shares
    // q69's oracle because the dispatch must reproduce it exactly
    "q166_config_seasonal" -> ((s, dir) => {
      val conf = graft.pipeline.ConfigRunner.fromProperties(
        """predictor.model=zscore
          |id.fieldOrdinals=[3]
          |attr.ordinals=[4]
          |seasonal.analysis=true
          |seasonal.cycleType=["hourOfDay"]
          |time.fieldOrdinal=1
          |time.unit=nanos
          |score.threshold=2.5""".stripMargin)
      canon(graft.pipeline.ConfigRunner.run(s, table(s, dir, "events"), conf)
        .select("event_id", "event_type", "cycleIndex", "value", "score", "tag"))
    }),
    "q70_drift_lfr" -> ((s, dir) => {
      val labeled = StatQueries.zscored(s, dir)
        .withColumn("label", col("value") > 100.0)
        .withColumn("pred", col("tag") === "O")
        .select("event_type", "event_id", "label", "pred")
      canon(Drift.linearFourRates(labeled, Seq("event_type"), "event_id",
        "label", "pred", window = 200, delta = 0.01)
        .select("event_type", "event_id", "tprW", "tprC", "ppvW", "ppvC",
          "maxDev", "drift"))
    }),
    "q83_salted_agg" -> ((s, dir) =>
      // two-phase salted aggregation == direct groupBy (hot-key path);
      // only exact-algebraic aggregates (integral sums, count, min, max)
      // so the oracle holds bit-for-bit under any partial grouping
      graft.core.Skew.saltedAgg(table(s, dir, "lineitem"),
        Seq("l_returnflag"), salts = 16,
        Seq(graft.core.Skew.sumOf("l_quantity"), graft.core.Skew.countAll,
          graft.core.Skew.minOf("l_extendedprice"),
          graft.core.Skew.maxOf("l_extendedprice")))),
    "q82_density_drift" -> ((s, dir) => {
      val e = table(s, dir, "events")
      // deterministic two-sample split by event_id parity
      canon(Drift.localDensityDrift(
        e.where(col("event_id") % 2 === 0), e.where(col("event_id") % 2 === 1),
        Seq("value"), Seq(10.0), threshold = 0.002))
    }),
    // embedding-space drift: energy distance between the two md5-split
    // halves of the embeddings table (same distribution → energy ≈ 0)
    "q108_embed_drift" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val isB = graft.text.TextOps.hash56(col("vec_id").cast("string")) % 2 === 1
      // maxSample = 1000 binds already at sf0.01 (sides ~1250), so the
      // oracle gates the bounded-sample path the 100 TB caller runs
      canon(Drift.embeddingEnergyDistance(e.where(!isB), e.where(isB),
        "embedding", idCol = "vec_id", maxSample = 1000))
    }),
    // median aggregation strategy over the same three attrs — the
    // order-statistic strategies (median/max/min) were spec-only; the
    // 3-value median replays in SQL as greatest-least arithmetic
    // max strategy (the worst-attribute alarm rule) completes the
    // aggregation-strategy family: average (q35), weighted (q71),
    // median (q171), max (q172); min is max's mirror through the same
    // array_min/array_max code path
    "q172_max_agg" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val keys = Seq("l_returnflag")
      val attrs = Seq("l_quantity", "l_extendedprice", "l_discount")
      val stats = graft.model.Fitters.stats(li, keys, attrs)
      canon(graft.score.Scorers.zscore(li, stats,
        graft.score.Scorers.Cfg(keys, attrs, strategy = "max",
          threshold = 2.5))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "score", "tag"))
    }),
    "q171_median_agg" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val keys = Seq("l_returnflag")
      val attrs = Seq("l_quantity", "l_extendedprice", "l_discount")
      val stats = graft.model.Fitters.stats(li, keys, attrs)
      canon(graft.score.Scorers.zscore(li, stats,
        graft.score.Scorers.Cfg(keys, attrs, strategy = "median",
          threshold = 2.0))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "score", "tag"))
    }),
    "q71_multiattr_zscore" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val keys = Seq("l_returnflag")
      val attrs = Seq("l_quantity", "l_extendedprice", "l_discount")
      val stats = graft.model.Fitters.stats(li, keys, attrs)
      canon(graft.score.Scorers.zscore(li, stats,
        graft.score.Scorers.Cfg(keys, attrs, weights = Seq(2.0, 1.0, 1.0),
          strategy = "weightedAverage", expConst = 0.5, threshold = 0.75))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "score", "tag"))
    }),
    // two-sided CUSUM over the raw value stream: cumsum-minus-running-min
    // closed form, baseline = first-100-row mean/std rounded to 6dp so
    // the additive chain replays bit-identically in the oracle
    "q137_cusum" -> ((s, dir) =>
      canon(Drift.cusum(
        table(s, dir, "events").select("event_type", "event_id", "value"),
        Seq("event_type"), "event_id", "value",
        warmup = 100, slack = 0.5, h = 5.0)
        .select("event_type", "event_id", "value", "gPos", "gNeg", "alarm"))),
    // Page–Hinkley: running-mean deviations, then the same cumsum −
    // running-extremum trick — no warmup baseline, self-adapting
    "q138_page_hinkley" -> ((s, dir) =>
      canon(Drift.pageHinkley(
        table(s, dir, "events").select("event_type", "event_id", "value"),
        Seq("event_type"), "event_id", "value",
        delta = 0.005, lambda = 50.0, minInstances = 30)
        .select("event_type", "event_id", "value", "phInc", "phDec", "drift"))),
    // The STREAMING sequential detectors executed as batch queries (the
    // q100 pattern: flatMapGroupsWithState is batch-executable, so the
    // driver gates the stream code path itself against the DuckDB
    // oracle, not just a spec). One batch = one group invocation with
    // the entity's full history, which is exactly the "all rows have
    // arrived" prefix of the online run.
    "q141_cusum_stream" -> ((s, dir) => {
      import s.implicits._
      val evd = table(s, dir, "events")
        .select(col("event_type").cast("string").as("entity"),
          col("event_id").cast("long").as("seq"),
          col("value").cast("double").as("value"))
        .as[graft.streaming.StreamScorers.ValueEvent]
      canon(graft.streaming.StreamScorers.cusumStream(evd,
        warmup = 100, slack = 0.5, h = 5.0).toDF()
        .select(col("entity").as("event_type"), col("seq").as("event_id"),
          col("value"), col("gPos"), col("gNeg"), col("alarm")))
    }),
    "q142_ph_stream" -> ((s, dir) => {
      import s.implicits._
      val evd = table(s, dir, "events")
        .select(col("event_type").cast("string").as("entity"),
          col("event_id").cast("long").as("seq"),
          col("value").cast("double").as("value"))
        .as[graft.streaming.StreamScorers.ValueEvent]
      canon(graft.streaming.StreamScorers.pageHinkleyStream(evd,
        delta = 0.005, lambda = 50.0, minInstances = 30).toDF()
        .select(col("entity").as("event_type"), col("seq").as("event_id"),
          col("value"), col("phInc"), col("phDec"), col("drift")))
    }),
    // streaming DDM executed as batch (q100 pattern): err counts are
    // integers, so the sequential recursion is deterministic and shares
    // q64's closed-form oracle math
    "q150_ddm_stream" -> ((s, dir) => {
      import s.implicits._
      val errs = errStream(s, dir)
        .select(col("event_type").cast("string").as("entity"),
          col("event_id").cast("long").as("seq"),
          col("err").cast("double").as("err"))
        .as[graft.streaming.StreamScorers.ErrEvent]
      canon(graft.streaming.StreamScorers.ddmStream(errs).toDF()
        .select(col("entity").as("event_type"), col("seq").as("event_id"),
          col("err").cast("int").as("err"), col("p"), col("s"), col("level")))
    }),
    "q67_drift_consensus" -> ((s, dir) => {
      val ddm = Drift.ddm(errStream(s, dir), Seq("event_type"), "event_id", "err")
        .select(col("event_type"), col("event_id"), (col("level") === "drift").as("d1"))
      val fh = Drift.fhddm(errStream(s, dir), Seq("event_type"), "event_id", "err",
        window = 100, delta = 0.000001)
        .select(col("event_type"), col("event_id"), coalesce(col("drift"), lit(false)).as("d2"))
      Drift.consensus(ddm.join(fh, Seq("event_type", "event_id")), Seq("d1", "d2"), 2)
    }),
    // entropy-increase scorer (Storm-only in the reference, the last §2.4
    // row without a driver-gated entry) executed batch (q100 pattern):
    // per event_type, running value histogram at bucket width 10; score =
    // relative entropy increase from admitting the record's bucket
    "q155_entropy_stream" -> ((s, dir) => {
      import s.implicits._
      val evd = graft.core.table(s, dir, "events")
        .select(col("event_type").cast("string").as("entity"),
          col("event_id").cast("long").as("seq"),
          col("value").cast("double").as("value"))
        .as[graft.streaming.StreamScorers.ValueEvent]
      canon(graft.streaming.StreamScorers.entropyIncreaseStream(evd,
        bucketWidth = 10.0, minCount = 30).toDF()
        .select(col("entity").as("event_type"), col("seq").as("event_id"),
          col("value"), col("score")))
    }),
  )

  private val errCte =
    """zstats AS (SELECT event_type, avg(value) AS mean, stddev_samp(value) AS std
      | FROM events GROUP BY event_type),
      |es AS (SELECT e.event_type, e.event_id, e.value,
      |  CASE WHEN abs(e.value - s.mean)/s.std > 2.0 THEN 1 ELSE 0 END AS err
      | FROM events e JOIN zstats s USING (event_type))"""
      .stripMargin.replace("\n", " ")

  private val ddmCte =
    s"""$errCte,
       |d AS (SELECT event_type, event_id, err,
       |  count(err) OVER cum AS i, avg(err) OVER cum AS p,
       |  sqrt(avg(err) OVER cum * (1.0 - avg(err) OVER cum) / count(err) OVER cum) AS s
       | FROM es
       | WINDOW cum AS (PARTITION BY event_type ORDER BY event_id
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |dd AS (SELECT *,
       |  (min({'ps': p + s, 's': s}) OVER cum).ps AS minPS,
       |  (min({'ps': p + s, 's': s}) OVER cum).s AS sAtMin
       | FROM d
       | WINDOW cum AS (PARTITION BY event_type ORDER BY event_id
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"""
      .stripMargin.replace("\n", " ")

  // Page–Hinkley closed form — shared by the batch operator (q138) and
  // its batch-executed streaming twin (q142): the stream recursion
  // accumulates the same running sums in the same left-to-right order.
  // deviations quantized to 6dp fixed-point BIGINTs before the cumsums —
  // association-free integer arithmetic on both engines (the sf0.001
  // gate audit caught the raw-double form drifting an ulp: DuckDB's
  // windowed sums associate via a segment tree, Spark's sequentially)
  // CUSUM, integer fixed-point: 6dp-rounded warmup baselines, per-row
  // terms quantized to BIGINTs, association-free cumsums/minima — shared
  // by the batch closed form (q137) and the stream recursion (q141),
  // which are identical in integer arithmetic
  private val cusumOracle =
    """WITH rn AS (SELECT event_type, event_id, value,
      |  row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
      | FROM events),
      |base AS (SELECT event_type, round(avg(value), 6) AS mu0,
      |  round(coalesce(stddev_samp(value), 0.0), 6) AS sd0
      | FROM rn WHERE rn <= 100 GROUP BY event_type),
      |z AS (SELECT r.event_type, r.event_id, r.value, r.rn,
      |  (r.value - b.mu0) / greatest(b.sd0, 1e-9) AS z
      | FROM rn r JOIN base b USING (event_type)),
      |t AS (SELECT event_type, event_id, value, rn,
      |  (CASE WHEN z - 0.5 >= 0 THEN floor((z - 0.5)*1e6 + 0.5)
      |        ELSE -floor(-(z - 0.5)*1e6 + 0.5) END)::BIGINT AS tp,
      |  (CASE WHEN -z - 0.5 >= 0 THEN floor((-z - 0.5)*1e6 + 0.5)
      |        ELSE -floor(-(-z - 0.5)*1e6 + 0.5) END)::BIGINT AS tn
      | FROM z),
      |c AS (SELECT event_type, event_id, value, rn,
      |  sum(tp) OVER cum AS aPos, sum(tn) OVER cum AS aNeg
      | FROM t
      | WINDOW cum AS (PARTITION BY event_type ORDER BY event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |g AS (SELECT event_type, event_id, value, rn,
      |  (aPos - least(0, min(aPos) OVER cum))/1e6 AS gp,
      |  (aNeg - least(0, min(aNeg) OVER cum))/1e6 AS gn
      | FROM c
      | WINDOW cum AS (PARTITION BY event_type ORDER BY event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_type, event_id, round(value, 4) AS value,
      | round(gp, 4) AS gPos, round(gn, 4) AS gNeg,
      | (rn > 100 AND (gp > 5.0 OR gn > 5.0)) AS alarm
      |FROM g""".stripMargin.replace("\n", " ")

  private val phOracle =
    """WITH v AS (SELECT event_type, event_id, value,
      |  (CASE WHEN value >= 0 THEN floor(value*1e6 + 0.5)
      |        ELSE -floor(-value*1e6 + 0.5) END)::BIGINT AS v6
      | FROM events),
      |rn AS (SELECT event_type, event_id, value,
      |  row_number() OVER cum AS rn,
      |  v6 - (CASE WHEN sum(v6) OVER cum >= 0
      |    THEN (2*(sum(v6) OVER cum) + row_number() OVER cum)
      |          // (2*row_number() OVER cum)
      |    ELSE -((2*(-(sum(v6) OVER cum)) + row_number() OVER cum)
      |          // (2*row_number() OVER cum)) END) AS dev6
      | FROM v
      | WINDOW cum AS (PARTITION BY event_type ORDER BY event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |m AS (SELECT event_type, event_id, value, rn,
      |  sum(dev6 - 5000) OVER cum AS mInc, sum(dev6 + 5000) OVER cum AS mDec
      | FROM rn
      | WINDOW cum AS (PARTITION BY event_type ORDER BY event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |p AS (SELECT event_type, event_id, value, rn,
      |  (mInc - min(mInc) OVER cum)/1e6 AS pi,
      |  (max(mDec) OVER cum - mDec)/1e6 AS pd
      | FROM m
      | WINDOW cum AS (PARTITION BY event_type ORDER BY event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_type, event_id, round(value, 4) AS value,
      | round(pi, 4) AS phInc, round(pd, 4) AS phDec,
      | (rn >= 30 AND (pi > 50.0 OR pd > 50.0)) AS drift
      |FROM p""".stripMargin.replace("\n", " ")

    private lazy val seasonalZscoreOracle: String =
    """WITH c AS (SELECT *,
      |  ((epoch_ns(ts) // 1000000000) // 3600) % 24 AS cycleIndex
      | FROM events),
      |st AS (SELECT event_type, cycleIndex, avg(value) AS mean,
      |  stddev_samp(value) AS std
      | FROM c GROUP BY 1, 2)
      |SELECT e.event_id, e.event_type, e.cycleIndex, round(e.value,4) AS value,
      | round(abs(e.value - s.mean)/s.std, 4) AS score,
      | CASE WHEN abs(e.value - s.mean)/s.std > 2.5 THEN 'O' ELSE 'N' END AS tag
      |FROM c e JOIN st s USING (event_type, cycleIndex)"""
      .stripMargin.replace("\n", " ")

  /** Shared CTE chain of the PSI replay (q189 batch + q191 stream-twin). */
  private lazy val psiCtes: String = {
    val fp6 = (e: String) =>
      s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e6+0.5) ELSE -floor(-($e)*1e6+0.5) END)::BIGINT"
    val binOf =
      """CASE WHEN e.hi > e.lo THEN
        | least(greatest(floor((s.v - e.lo) / ((e.hi - e.lo) / 10.0))::BIGINT, 0), 9)
        | ELSE 0 END""".stripMargin
    s"""ref AS (SELECT event_type, value::DOUBLE AS v FROM events
       |  WHERE event_id % 2 = 0),
       |cur AS (SELECT event_type,
       |  CASE WHEN event_type IN ('click', 'view') THEN value::DOUBLE
       |   ELSE value::DOUBLE * 1.3 + 25.0 END AS v FROM events
       |  WHERE event_id % 2 = 1),
       |ed AS (SELECT event_type, min(v) AS lo, max(v) AS hi
       | FROM ref GROUP BY 1),
       |rc AS (SELECT s.event_type, $binOf AS bin, count(*) AS c
       | FROM ref s JOIN ed e USING (event_type) GROUP BY 1, 2),
       |cc AS (SELECT s.event_type, $binOf AS bin, count(*) AS c
       | FROM cur s JOIN ed e USING (event_type) GROUP BY 1, 2),
       |bins AS (SELECT event_type, unnest(range(10)) AS bin FROM ed),
       |j AS (SELECT b.event_type, b.bin,
       |  coalesce(rc.c, 0) AS rcn, coalesce(cc.c, 0) AS ccn
       | FROM bins b
       | LEFT JOIN rc ON rc.event_type = b.event_type AND rc.bin = b.bin
       | LEFT JOIN cc ON cc.event_type = b.event_type AND cc.bin = b.bin),
       |t AS (SELECT event_type, sum(rcn) AS rt, sum(ccn) AS ct
       | FROM j GROUP BY 1),
       |c6 AS (SELECT j.event_type,
       |  ${fp6("((j.ccn + 0.5) / (t.ct + 5.0) - (j.rcn + 0.5) / (t.rt + 5.0))" +
           " * ln(((j.ccn + 0.5) / (t.ct + 5.0)) / ((j.rcn + 0.5) / (t.rt + 5.0)))")}
       |   AS t6
       | FROM j JOIN t USING (event_type)),
       |p AS (SELECT event_type, sum(t6)::DOUBLE / 1e6 AS psi
       | FROM c6 GROUP BY 1)""".stripMargin
  }

  // Benford replay: identical threshold-chain digit extraction, count
  // FILTER pivots, and the same left-associated χ²/MAD chains with the
  // p_d constants interpolated from Drift.benfordExpected (decimal
  // round-trip → bit-identical doubles in both engines).
  private lazy val benfordOracle: String = {
    val p = graft.drift.Drift.benfordExpected
    def obs(i: Int) = s"(c$i::DOUBLE / n::DOUBLE)"
    val chi = (1 to 9).map(i =>
      s"(${obs(i)} - ${p(i - 1)}) * (${obs(i)} - ${p(i - 1)}) / ${p(i - 1)}")
      .mkString(" + ")
    val mad = (1 to 9).map(i => s"abs(${obs(i)} - ${p(i - 1)})").mkString(" + ")
    s"""WITH e AS (SELECT event_type, abs(value) AS v FROM events
       |  WHERE value IS NOT NULL),
       |d AS (SELECT event_type, CASE
       |  WHEN v >= 100000 THEN floor(v / 100000)
       |  WHEN v >= 10000 THEN floor(v / 10000)
       |  WHEN v >= 1000 THEN floor(v / 1000)
       |  WHEN v >= 100 THEN floor(v / 100)
       |  WHEN v >= 10 THEN floor(v / 10)
       |  WHEN v >= 1 THEN floor(v)
       |  WHEN v >= 0.1 THEN floor(v * 10)
       |  WHEN v >= 0.01 THEN floor(v * 100)
       |  WHEN v >= 0.001 THEN floor(v * 1000) END AS dg
       | FROM e),
       |c AS (SELECT event_type,
       |  ${(1 to 9).map(i => s"count(*) FILTER (WHERE dg = $i) AS c$i").mkString(", ")}
       | FROM d WHERE dg IS NOT NULL GROUP BY event_type),
       |g AS (SELECT *, ${(1 to 9).map(i => s"c$i").mkString(" + ")} AS n FROM c)
       |SELECT event_type, n, round(($chi) * n::DOUBLE, 4) AS chi2,
       | round(($mad) / 9, 4) AS madStat,
       | (($chi) * n::DOUBLE) > 15.507 AS nonconforming
       |FROM g""".stripMargin.replace("\n", " ")
  }

  private lazy val jsdOracle: String = {
    val fp8 = (e: String) =>
      s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e8+0.5) ELSE -floor(-($e)*1e8+0.5) END)::BIGINT"
    val rs = "(j.rcn + 0.5) / (t.rt + 5.0)"
    val cs = "(j.ccn + 0.5) / (t.ct + 5.0)"
    val ms = s"(($rs) + ($cs)) / 2.0"
    val term = s"0.5 * ($rs) * ln(($rs) / ($ms)) + 0.5 * ($cs) * ln(($cs) / ($ms))"
    val binOf =
      """CASE WHEN e.hi > e.lo THEN
        | least(greatest(floor((s.v - e.lo) / ((e.hi - e.lo) / 10.0))::BIGINT, 0), 9)
        | ELSE 0 END""".stripMargin
    s"""WITH ref AS (SELECT event_type, value::DOUBLE AS v FROM events
       |  WHERE event_id % 2 = 0),
       |cur AS (SELECT event_type,
       |  CASE WHEN event_type IN ('click', 'view') THEN value::DOUBLE
       |   ELSE value::DOUBLE * 1.3 + 25.0 END AS v FROM events
       |  WHERE event_id % 2 = 1),
       |ed AS (SELECT event_type, min(v) AS lo, max(v) AS hi
       | FROM ref GROUP BY 1),
       |rc AS (SELECT s.event_type, $binOf AS bin, count(*) AS c
       | FROM ref s JOIN ed e USING (event_type) GROUP BY 1, 2),
       |cc AS (SELECT s.event_type, $binOf AS bin, count(*) AS c
       | FROM cur s JOIN ed e USING (event_type) GROUP BY 1, 2),
       |bins AS (SELECT event_type, unnest(range(10)) AS bin FROM ed),
       |j AS (SELECT b.event_type, b.bin,
       |  coalesce(rc.c, 0) AS rcn, coalesce(cc.c, 0) AS ccn
       | FROM bins b
       | LEFT JOIN rc ON rc.event_type = b.event_type AND rc.bin = b.bin
       | LEFT JOIN cc ON cc.event_type = b.event_type AND cc.bin = b.bin),
       |t AS (SELECT event_type, sum(rcn) AS rt, sum(ccn) AS ct
       | FROM j GROUP BY 1),
       |c8 AS (SELECT j.event_type, ${fp8(term)} AS t8
       | FROM j JOIN t USING (event_type)),
       |p AS (SELECT event_type, sum(t8)::DOUBLE / 1e8 AS jsd
       | FROM c8 GROUP BY 1)
       |SELECT event_type, round(jsd, 4) AS jsd, jsd > 0.1 AS drifted
       |FROM p""".stripMargin.replace("\n", " ")
  }

  private lazy val wassersteinOracle: String = {
    val fp8 = (e: String) =>
      s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e8+0.5) ELSE -floor(-($e)*1e8+0.5) END)::BIGINT"
    val term = "abs(ra*nc - ca*nr)::DOUBLE * width / (nr::DOUBLE * nc)"
    s"""WITH ref AS (SELECT event_type, value::DOUBLE AS v FROM events
       |  WHERE event_id % 2 = 0),
       |cur AS (SELECT event_type,
       |  CASE WHEN event_type IN ('click', 'view') THEN value::DOUBLE
       |   ELSE value::DOUBLE * 1.3 + 25.0 END AS v FROM events
       |  WHERE event_id % 2 = 1),
       |m AS (SELECT event_type, v, 1::BIGINT AS r, 0::BIGINT AS c
       |  FROM ref WHERE v IS NOT NULL
       | UNION ALL SELECT event_type, v, 0, 1 FROM cur WHERE v IS NOT NULL),
       |s AS (SELECT event_type,
       |  sum(r) OVER (PARTITION BY event_type ORDER BY v, r) AS ra,
       |  sum(c) OVER (PARTITION BY event_type ORDER BY v, r) AS ca,
       |  sum(r) OVER (PARTITION BY event_type) AS nr,
       |  sum(c) OVER (PARTITION BY event_type) AS nc,
       |  coalesce(lead(v) OVER (PARTITION BY event_type ORDER BY v, r) - v,
       |   0.0) AS width
       | FROM m),
       |t AS (SELECT event_type, nr, nc,
       |  CASE WHEN nr > 0 AND nc > 0 THEN ${fp8(term)} ELSE 0 END AS t8
       | FROM s),
       |p AS (SELECT event_type, min(nr) AS nr, min(nc) AS nc,
       |  sum(t8)::DOUBLE / 1e8 AS w1raw FROM t GROUP BY 1)
       |SELECT event_type,
       | round(CASE WHEN nr > 0 AND nc > 0 THEN w1raw END, 4) AS w1,
       | (CASE WHEN nr > 0 AND nc > 0 THEN w1raw END) > 5.0 AS drifted
       |FROM p""".stripMargin.replace("\n", " ")
  }

  private lazy val centroidDriftOracle: String = {
    val fp6 = (e: String) =>
      s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e6+0.5) ELSE -floor(-($e)*1e6+0.5) END)::BIGINT"
    val fp9 = (e: String) =>
      s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e9+0.5) ELSE -floor(-($e)*1e9+0.5) END)::BIGINT"
    val cosE = "CASE WHEN rr > 0 AND c2 > 0 THEN (dot / 1e9) / (sqrt(rr / 1e9) * sqrt(c2 / 1e9)) END"
    s"""WITH re AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings
       |  WHERE vec_id % 2 = 0),
       |cu AS (SELECT label, CASE WHEN label >= 5
       |   THEN list_transform(embedding::DOUBLE[], x -> x * 1.2 + 0.1)
       |   ELSE embedding::DOUBLE[] END AS v FROM embeddings
       |  WHERE vec_id % 2 = 1),
       |rp AS (SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x
       | FROM re),
       |cp AS (SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x
       | FROM cu),
       |rc AS (SELECT label, pos, sum(${fp6("x")}) AS sr, count(*)::BIGINT AS nr
       | FROM rp GROUP BY 1, 2),
       |cc AS (SELECT label, pos, sum(${fp6("x")}) AS sc, count(*)::BIGINT AS nc
       | FROM cp GROUP BY 1, 2),
       |j AS (SELECT rc.label, (sr / 1e6) / nr AS cr, (sc / 1e6) / nc AS cv,
       |  nr, nc FROM rc JOIN cc USING (label, pos)),
       |a AS (SELECT label, sum(${fp9("cr * cv")}) AS dot,
       |  sum(${fp9("cr * cr")}) AS rr, sum(${fp9("cv * cv")}) AS c2,
       |  sum(${fp9("(cr - cv) * (cr - cv)")}) AS d2,
       |  max(nr) AS n_ref, max(nc) AS n_cur FROM j GROUP BY 1)
       |SELECT label, n_ref, n_cur, round($cosE, 4) AS cos,
       | round(sqrt(d2 / 1e9), 4) AS l2, sqrt(d2 / 1e9) > 0.5 AS drifted
       |FROM a""".stripMargin.replace("\n", " ")
  }

  val oracleSql: Map[String, String] = Map(
    "q246_centroid_drift" -> centroidDriftOracle,
    "q244_wasserstein" -> wassersteinOracle,
    "q230_jsd" -> jsdOracle,
    "q200_benford" -> benfordOracle,
    "q189_psi" ->
      s"""WITH $psiCtes
         |SELECT event_type, round(psi, 4) AS psi, psi > 0.2 AS drifted
         |FROM p""".stripMargin.replace("\n", " "),
    "q363_dim_drift" -> {
      val fp6 = (e: String) =>
        s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e6+0.5) " +
          s"ELSE -floor(-($e)*1e6+0.5) END)::BIGINT"
      def m(p: String) = s"$p.s::DOUBLE / $p.n::DOUBLE / 1e6"
      def v(p: String) =
        s"($p.q::DOUBLE - $p.s::DOUBLE * $p.s::DOUBLE / $p.n::DOUBLE)" +
          s" / ($p.n::DOUBLE - 1) / 1e12"
      s"""WITH x AS (SELECT vec_id,
         |  generate_subscripts(embedding, 1) - 1 AS dim,
         |  unnest(embedding)::DOUBLE AS v FROM embeddings
         |  WHERE embedding IS NOT NULL),
         |fx AS (SELECT vec_id, dim, ${fp6("v")} AS f FROM x),
         |r AS (SELECT dim, count(*)::BIGINT AS n, sum(f::HUGEINT) AS s,
         |  sum(f::HUGEINT * f::HUGEINT) AS q FROM fx
         |  WHERE vec_id % 2 = 0 GROUP BY 1),
         |c AS (SELECT dim, count(*)::BIGINT AS n, sum(f::HUGEINT) AS s,
         |  sum(f::HUGEINT * f::HUGEINT) AS q FROM fx
         |  WHERE vec_id % 2 = 1 GROUP BY 1)
         |SELECT r.dim, r.n AS n_ref, c.n AS n_cur,
         | round(${m("r")}, 4) AS mean_ref, round(${m("c")}, 4) AS mean_cur,
         | round((${m("r")} - ${m("c")})
         |  / sqrt((${v("r")}) / r.n::DOUBLE + (${v("c")}) / c.n::DOUBLE), 4)
         |   AS z,
         | abs((${m("r")} - ${m("c")})
         |  / sqrt((${v("r")}) / r.n::DOUBLE + (${v("c")}) / c.n::DOUBLE))
         |   > 3.0 AS drifted
         |FROM r JOIN c USING (dim)""".stripMargin.replace("\n", " ")
    },
    "q354_hellinger" -> {
      val fp8 = (e: String) =>
        s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e8+0.5) " +
          s"ELSE -floor(-($e)*1e8+0.5) END)::BIGINT"
      // psiCtes through `t`, then the BC/√(1−BC) finish
      val prefix = psiCtes.split("c6 AS")(0).trim.stripSuffix(",")
      s"""WITH $prefix,
         |c8 AS (SELECT j.event_type,
         |  ${fp8("sqrt(((j.rcn + 0.5) / (t.rt + 5.0)) * " +
           "((j.ccn + 0.5) / (t.ct + 5.0)))")} AS t8
         | FROM j JOIN t USING (event_type)),
         |b AS (SELECT event_type, sum(t8)::DOUBLE / 1e8 AS bc
         | FROM c8 GROUP BY 1)
         |SELECT event_type, round(bc, 4) AS bc,
         | round(sqrt(1.0 - least(bc, 1.0)), 4) AS hellinger,
         | sqrt(1.0 - least(bc, 1.0)) > 0.2 AS drifted
         |FROM b""".stripMargin.replace("\n", " ")
    },
    // stream twin in one micro-batch == batch psi + the window size
    "q191_psi_stream" ->
      s"""WITH $psiCtes,
         |cn AS (SELECT event_type, count(*) AS n FROM cur GROUP BY 1)
         |SELECT p.event_type, cn.n, round(p.psi, 4) AS psi,
         | p.psi > 0.2 AS drifted
         |FROM p JOIN cn USING (event_type)""".stripMargin.replace("\n", " "),
    // CUSUM closed form: g = A − min(0, running-min A); baseline rounded
    // to 6dp on both sides so the cumsum chain is reproducible
    "q137_cusum" -> cusumOracle,
    // With integer fixed-point terms the streaming g = max(0, g + t)
    // recursion IS the batch cumsum-minus-clamped-min closed form
    // bit-for-bit (the float forms only agreed to ~1e-9), so the stream
    // twin shares the batch oracle verbatim.
    "q141_cusum_stream" -> cusumOracle,
    // The streaming Page–Hinkley recursion accumulates the running sums
    // in the same left-to-right order as the batch window plan (the
    // parity spec pins bit-exact equality), so the stream twin shares
    // q138's oracle verbatim.
    "q142_ph_stream" -> phOracle,
    // Page–Hinkley: running-mean deviation, cumsum, then running extremum
    "q138_page_hinkley" -> phOracle,
    // energy distance: V-statistic means over all ordered pairs per term
    // (self pairs contribute 0), Euclidean via list_distance — the q42
    // precedent for cross-engine distance parity under the 4dp round
    "q108_embed_drift" ->
      """WITH s AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |  (('0x'||substr(md5(vec_id::VARCHAR),1,14))::BIGINT % 2) = 1 AS isB
        | FROM embeddings),
        |sa AS (SELECT v FROM s WHERE NOT isB
        |  ORDER BY md5(vec_id::VARCHAR) LIMIT 1000),
        |sb AS (SELECT v FROM s WHERE isB
        |  ORDER BY md5(vec_id::VARCHAR) LIMIT 1000),
        |xy AS (SELECT avg(list_distance(a.v, b.v)) AS exy FROM sa a, sb b),
        |xx AS (SELECT avg(list_distance(a.v, b.v)) AS exx FROM sa a, sa b),
        |yy AS (SELECT avg(list_distance(a.v, b.v)) AS eyy FROM sb a, sb b),
        |n AS (SELECT (SELECT count(*) FROM sa)::BIGINT AS n,
        |  (SELECT count(*) FROM sb)::BIGINT AS m)
        |SELECT n.n, n.m, round(xy.exy, 4) AS exy, round(xx.exx, 4) AS exx,
        | round(yy.eyy, 4) AS eyy,
        | round(2.0 * xy.exy - xx.exx - yy.eyy, 4) AS energy
        |FROM xy, xx, yy, n""".stripMargin.replace("\n", " "),
    // ECDD EWMA (sucodr.py:281-325): the per-key recurrence
    // z_i = λ·x_i + (1−λ)·z_{i−1} runs as a DuckDB recursive CTE (one row
    // per key per step); running mean/std are cumulative window aggregates.
    "q66_drift_ewma" ->
      """WITH RECURSIVE e AS (SELECT event_type::VARCHAR AS key,
        |  event_id AS seq, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
        | FROM events),
        |r AS (
        | SELECT key, seq, value, rn, value AS z FROM e WHERE rn = 1
        | UNION ALL
        | SELECT e.key, e.seq, e.value, e.rn, 0.1 * e.value + 0.9 * r.z AS z
        | FROM r JOIN e ON e.key = r.key AND e.rn = r.rn + 1),
        |s AS (SELECT key, seq, value, z, rn,
        |  avg(value) OVER cum AS mean, stddev_samp(value) OVER cum AS sd
        | FROM r
        | WINDOW cum AS (PARTITION BY key ORDER BY seq
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT key, seq, round(value,4) AS value, round(z,4) AS ewma,
        | (rn > 30 AND sd > 0 AND abs(z - mean) > 3.0 * sd * sqrt(0.1 / 1.9)) AS drift
        |FROM s""".stripMargin.replace("\n", " "),
    "q83_salted_agg" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_l_quantity,
        | count(*) AS cnt, min(l_extendedprice) AS min_l_extendedprice,
        | max(l_extendedprice) AS max_l_extendedprice
        |FROM lineitem GROUP BY 1""".stripMargin.replace("\n", " "),
    "q82_density_drift" ->
      """WITH r AS (SELECT CAST(floor(value/10.0) AS BIGINT)::VARCHAR AS cell,
        |  count(*) AS refCnt FROM events WHERE event_id % 2 = 0 GROUP BY 1),
        |c AS (SELECT CAST(floor(value/10.0) AS BIGINT)::VARCHAR AS cell,
        |  count(*) AS curCnt FROM events WHERE event_id % 2 = 1 GROUP BY 1),
        |j AS (SELECT coalesce(r.cell, c.cell) AS cell,
        |  coalesce(refCnt, 0) AS refCnt, coalesce(curCnt, 0) AS curCnt
        | FROM r FULL OUTER JOIN c ON r.cell = c.cell),
        |p AS (SELECT cell, refCnt, curCnt,
        |  refCnt::DOUBLE / sum(refCnt) OVER () AS refP,
        |  curCnt::DOUBLE / sum(curCnt) OVER () AS curP FROM j)
        |SELECT cell, refCnt, curCnt, round(refP, 4) AS refP,
        | round(curP, 4) AS curP, round(abs(curP - refP), 4) AS score,
        | (abs(curP - refP) > 0.002 AND refCnt + curCnt >= 5) AS drift
        |FROM p""".stripMargin.replace("\n", " "),
    "q70_drift_lfr" ->
      s"""WITH $errCte,
         |lab AS (SELECT event_type, event_id, value > 100.0 AS label, err = 1 AS pred FROM es),
         |r AS (SELECT event_type, event_id,
         |  count(*) OVER fr AS nfr,
         |  sum(CASE WHEN label AND pred THEN 1 ELSE 0 END) OVER fr AS tp_w,
         |  sum(CASE WHEN label THEN 1 ELSE 0 END) OVER fr AS p_w,
         |  sum(CASE WHEN NOT label AND NOT pred THEN 1 ELSE 0 END) OVER fr AS tn_w,
         |  sum(CASE WHEN NOT label THEN 1 ELSE 0 END) OVER fr AS n_w,
         |  sum(CASE WHEN pred THEN 1 ELSE 0 END) OVER fr AS pp_w,
         |  sum(CASE WHEN NOT pred THEN 1 ELSE 0 END) OVER fr AS np_w,
         |  sum(CASE WHEN label AND pred THEN 1 ELSE 0 END) OVER cu AS tp_c,
         |  sum(CASE WHEN label THEN 1 ELSE 0 END) OVER cu AS p_c,
         |  sum(CASE WHEN NOT label AND NOT pred THEN 1 ELSE 0 END) OVER cu AS tn_c,
         |  sum(CASE WHEN NOT label THEN 1 ELSE 0 END) OVER cu AS n_c,
         |  sum(CASE WHEN pred THEN 1 ELSE 0 END) OVER cu AS pp_c,
         |  sum(CASE WHEN NOT pred THEN 1 ELSE 0 END) OVER cu AS np_c
         | FROM lab
         | WINDOW fr AS (PARTITION BY event_type ORDER BY event_id
         |   ROWS BETWEEN 199 PRECEDING AND CURRENT ROW),
         |  cu AS (PARTITION BY event_type ORDER BY event_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |s AS (SELECT event_type, event_id, nfr,
         |  CASE WHEN p_w > 0 THEN tp_w::DOUBLE / p_w::DOUBLE END AS tprW,
         |  CASE WHEN p_c > 0 THEN tp_c::DOUBLE / p_c::DOUBLE END AS tprC,
         |  CASE WHEN n_w > 0 THEN tn_w::DOUBLE / n_w::DOUBLE END AS tnrW,
         |  CASE WHEN n_c > 0 THEN tn_c::DOUBLE / n_c::DOUBLE END AS tnrC,
         |  CASE WHEN pp_w > 0 THEN tp_w::DOUBLE / pp_w::DOUBLE END AS ppvW,
         |  CASE WHEN pp_c > 0 THEN tp_c::DOUBLE / pp_c::DOUBLE END AS ppvC,
         |  CASE WHEN np_w > 0 THEN tn_w::DOUBLE / np_w::DOUBLE END AS npvW,
         |  CASE WHEN np_c > 0 THEN tn_c::DOUBLE / np_c::DOUBLE END AS npvC
         | FROM r),
         |d AS (SELECT *, greatest(
         |  coalesce(CASE WHEN tprW IS NOT NULL AND tprC IS NOT NULL THEN abs(tprW-tprC) END, 0.0),
         |  coalesce(CASE WHEN tnrW IS NOT NULL AND tnrC IS NOT NULL THEN abs(tnrW-tnrC) END, 0.0),
         |  coalesce(CASE WHEN ppvW IS NOT NULL AND ppvC IS NOT NULL THEN abs(ppvW-ppvC) END, 0.0),
         |  coalesce(CASE WHEN npvW IS NOT NULL AND npvC IS NOT NULL THEN abs(npvW-npvC) END, 0.0)
         |  ) AS maxDev FROM s)
         |SELECT event_type, event_id, round(tprW,4) AS tprW, round(tprC,4) AS tprC,
         | round(ppvW,4) AS ppvW, round(ppvC,4) AS ppvC, round(maxDev,4) AS maxDev,
         | nfr = 200 AND maxDev > sqrt(ln(2.0/0.01)/400.0) AS drift
         |FROM d""".stripMargin.replace("\n", " "),
    "q172_max_agg" ->
      """WITH m AS (SELECT l_returnflag,
        |  avg(l_quantity) AS m1, stddev_samp(l_quantity) AS s1,
        |  avg(l_extendedprice) AS m2, stddev_samp(l_extendedprice) AS s2,
        |  avg(l_discount) AS m3, stddev_samp(l_discount) AS s3
        | FROM lineitem GROUP BY 1),
        |sc AS (SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
        |  greatest(abs(l.l_quantity - m.m1)/m.s1,
        |    abs(l.l_extendedprice - m.m2)/m.s2,
        |    abs(l.l_discount - m.m3)/m.s3) AS score
        | FROM lineitem l JOIN m USING (l_returnflag))
        |SELECT l_orderkey, l_linenumber, l_returnflag, round(score,4) AS score,
        | CASE WHEN score > 2.5 THEN 'O' ELSE 'N' END AS tag FROM sc"""
        .stripMargin.replace("\n", " "),
    // median of the three per-attr raw z's: med(a,b,c) =
    // greatest(least(a,b), least(greatest(a,b), c))
    "q171_median_agg" ->
      """WITH m AS (SELECT l_returnflag,
        |  avg(l_quantity) AS m1, stddev_samp(l_quantity) AS s1,
        |  avg(l_extendedprice) AS m2, stddev_samp(l_extendedprice) AS s2,
        |  avg(l_discount) AS m3, stddev_samp(l_discount) AS s3
        | FROM lineitem GROUP BY 1),
        |z AS (SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
        |  abs(l.l_quantity - m.m1)/m.s1 AS z1,
        |  abs(l.l_extendedprice - m.m2)/m.s2 AS z2,
        |  abs(l.l_discount - m.m3)/m.s3 AS z3
        | FROM lineitem l JOIN m USING (l_returnflag)),
        |sc AS (SELECT l_orderkey, l_linenumber, l_returnflag,
        |  greatest(least(z1, z2), least(greatest(z1, z2), z3)) AS score
        | FROM z)
        |SELECT l_orderkey, l_linenumber, l_returnflag, round(score,4) AS score,
        | CASE WHEN score > 2.0 THEN 'O' ELSE 'N' END AS tag FROM sc"""
        .stripMargin.replace("\n", " "),
    "q71_multiattr_zscore" ->
      """WITH m AS (SELECT l_returnflag,
        |  avg(l_quantity) AS m1, stddev_samp(l_quantity) AS s1,
        |  avg(l_extendedprice) AS m2, stddev_samp(l_extendedprice) AS s2,
        |  avg(l_discount) AS m3, stddev_samp(l_discount) AS s3
        | FROM lineitem GROUP BY 1),
        |sc AS (SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
        |  1.0 - exp(-0.5 * ((abs(l.l_quantity - m.m1)/m.s1 * 2.0
        |    + abs(l.l_extendedprice - m.m2)/m.s2 * 1.0
        |    + abs(l.l_discount - m.m3)/m.s3 * 1.0) / (2.0 + 1.0 + 1.0))) AS score
        | FROM lineitem l JOIN m USING (l_returnflag))
        |SELECT l_orderkey, l_linenumber, l_returnflag, round(score,4) AS score,
        | CASE WHEN score > 0.75 THEN 'O' ELSE 'N' END AS tag FROM sc"""
        .stripMargin.replace("\n", " "),
    "q68_drift_eddm" ->
      s"""WITH $errCte,
         |ix AS (SELECT *, row_number() OVER w AS idx FROM es
         | WINDOW w AS (PARTITION BY event_type ORDER BY event_id)),
         |er AS (SELECT event_type, event_id,
         |  (idx - lag(idx) OVER w)::DOUBLE AS d
         | FROM ix WHERE err = 1
         | WINDOW w AS (PARTITION BY event_type ORDER BY event_id)),
         |st AS (SELECT event_type, event_id, d,
         |  count(d) OVER cum AS nErr,
         |  avg(d) OVER cum + 2.0 * stddev_samp(d) OVER cum AS p2s
         | FROM er WHERE d IS NOT NULL
         | WINDOW cum AS (PARTITION BY event_type ORDER BY event_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |mx AS (SELECT *, max(p2s) OVER (PARTITION BY event_type ORDER BY event_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS maxP2s FROM st)
         |SELECT event_type, event_id, nErr, round(d,4) AS d, round(p2s,4) AS p2s,
         | round(maxP2s,4) AS maxP2s,
         | CASE WHEN nErr < 30 OR maxP2s IS NULL THEN 'stable'
         |  WHEN p2s / maxP2s < 0.9 THEN 'drift'
         |  WHEN p2s / maxP2s < 0.95 THEN 'warn'
         |  ELSE 'stable' END AS level
         |FROM mx""".stripMargin.replace("\n", " "),
    "q69_seasonal_zscore" -> seasonalZscoreOracle,
    // the config-runner face must reproduce q69 bit-for-bit
    "q166_config_seasonal" -> seasonalZscoreOracle,
    "q64_drift_ddm" ->
      s"""WITH $ddmCte
         |SELECT event_type, event_id, err, i, round(p,4) AS p, round(s,4) AS s,
         | CASE WHEN i < 30 THEN 'stable'
         |  WHEN p + s > (minPS - sAtMin) + 3*sAtMin THEN 'drift'
         |  WHEN p + s > (minPS - sAtMin) + 2*sAtMin THEN 'warn'
         |  ELSE 'stable' END AS level
         |FROM dd""".stripMargin.replace("\n", " "),
    // the stream twin emits (err, p, s, level) without q64's running i —
    // same recursion, same closed form, i only gates the <30 warm-up
    "q150_ddm_stream" ->
      s"""WITH $ddmCte
         |SELECT event_type, event_id, err, round(p,4) AS p, round(s,4) AS s,
         | CASE WHEN i < 30 THEN 'stable'
         |  WHEN p + s > (minPS - sAtMin) + 3*sAtMin THEN 'drift'
         |  WHEN p + s > (minPS - sAtMin) + 2*sAtMin THEN 'warn'
         |  ELSE 'stable' END AS level
         |FROM dd""".stripMargin.replace("\n", " "),
    "q65_drift_fhddm" ->
      s"""WITH $errCte,
         |f AS (SELECT event_type, event_id, err,
         |  CASE WHEN count(err) OVER fr = 100 THEN 1.0 - avg(err) OVER fr END AS acc
         | FROM es
         | WINDOW fr AS (PARTITION BY event_type ORDER BY event_id
         |   ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)),
         |g AS (SELECT *, max(acc) OVER (PARTITION BY event_type ORDER BY event_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS maxAcc FROM f)
         |SELECT event_type, event_id, err, round(acc,4) AS acc, round(maxAcc,4) AS maxAcc,
         | acc IS NOT NULL AND maxAcc - acc > sqrt(ln(1.0/0.000001)/200.0) AS drift
         |FROM g""".stripMargin.replace("\n", " "),
    "q67_drift_consensus" ->
      s"""WITH $ddmCte,
         |d1 AS (SELECT event_type, event_id,
         |  CASE WHEN i >= 30 AND p + s > (minPS - sAtMin) + 3*sAtMin
         |   THEN TRUE ELSE FALSE END AS d1 FROM dd),
         |f AS (SELECT event_type, event_id,
         |  CASE WHEN count(err) OVER fr = 100 THEN 1.0 - avg(err) OVER fr END AS acc
         | FROM es
         | WINDOW fr AS (PARTITION BY event_type ORDER BY event_id
         |   ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)),
         |g AS (SELECT *, max(acc) OVER (PARTITION BY event_type ORDER BY event_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS maxAcc FROM f),
         |d2 AS (SELECT event_type, event_id,
         |  coalesce(acc IS NOT NULL AND maxAcc - acc > sqrt(ln(1.0/0.000001)/200.0), FALSE) AS d2
         | FROM g)
         |SELECT d1.event_type, d1.event_id, d1.d1, d2.d2,
         | (d1.d1::INT + d2.d2::INT) AS driftVotes,
         | (d1.d1::INT + d2.d2::INT) >= 2 AS driftConsensus
         |FROM d1 JOIN d2 USING (event_type, event_id)"""
        .stripMargin.replace("\n", " "),
    // prefix entropy H(rn) via a prefix self-join (oracle-side O(n²) per
    // entity is fine at sf0.01); the scorer's "before" is H at rn-1 = lag
    "q155_entropy_stream" ->
      """WITH rn AS (SELECT event_type, event_id, value,
        |  CAST(floor(value / 10.0) AS BIGINT) AS b,
        |  row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
        | FROM events),
        |pre AS (SELECT c.event_type, c.rn, p.b, count(*) AS cnt
        | FROM rn c JOIN rn p ON p.event_type = c.event_type AND p.rn <= c.rn
        | GROUP BY 1, 2, 3),
        |aft AS (SELECT event_type, rn,
        |  sum(-(cnt / rn::DOUBLE) * ln(cnt / rn::DOUBLE)) AS h
        | FROM pre GROUP BY 1, 2),
        |sc AS (SELECT r.event_type, r.event_id, r.value, r.rn, a.h AS after,
        |  lag(a.h) OVER (PARTITION BY r.event_type ORDER BY r.rn) AS before
        | FROM rn r JOIN aft a ON a.event_type = r.event_type AND a.rn = r.rn)
        |SELECT event_type, event_id, round(value, 4) AS value,
        | round(CASE WHEN rn - 1 < 30 OR before IS NULL OR before <= 0 THEN 0.0
        |   ELSE greatest(0.0, (after - before) / before) END, 4) AS score
        |FROM sc"""
        .stripMargin.replace("\n", " "),
  )
}
