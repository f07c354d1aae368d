package graft

import graft.model.Fitters
import graft.seq.{SeqOps, SeriesKernels}
import org.apache.spark.sql.functions._

class SeqSpec extends SparkSpec {
  import spark.implicits._

  test("fft roundtrip recovers the signal") {
    val re = Array(1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0, 0.0)
    val im = new Array[Double](8)
    val orig = re.clone()
    SeriesKernels.fft(re, im, inverse = false)
    SeriesKernels.fft(re, im, inverse = true)
    orig.zip(re).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("ks statistic: identical samples 0, disjoint samples 1") {
    val a = Array(1.0, 2.0, 3.0, 4.0)
    assert(SeriesKernels.ksStat(a, a.clone()) == 0.0)
    assert(SeriesKernels.ksStat(a, Array(10.0, 11.0, 12.0, 13.0)) == 1.0)
    assert(SeriesKernels.cvmStat(a, Array(10.0, 11.0, 12.0, 13.0)) >
      SeriesKernels.cvmStat(a, Array(2.0, 3.0, 4.0, 5.0)))
    assert(SeriesKernels.adStat(a, Array(10.0, 11.0, 12.0, 13.0)) > 0)
  }

  test("incremental sorted-window slide matches re-sort; sorted stats match unsorted") {
    val rnd = new scala.util.Random(7)
    // walk a sliding window over a duplicate-heavy series, slide one
    // element per step, and compare against a fresh sort each time
    val series = Array.fill(200)(rnd.nextInt(20).toDouble)
    val w = 16
    val win = series.slice(0, w).sorted
    for (i <- w until series.length) {
      SeriesKernels.slideSorted(win, series(i - w), series(i))
      assert(win.sameElements(series.slice(i - w + 1, i + 1).sorted),
        s"slide mismatch at $i")
    }
    // sorted-input stat forms are bitwise equal to the sort-then-walk forms
    for (_ <- 1 to 20) {
      val a = Array.fill(50)(rnd.nextInt(15).toDouble)
      val b = Array.fill(50)(rnd.nextInt(15).toDouble)
      assert(SeriesKernels.ksStat(a, b) == SeriesKernels.ksStatSorted(a.sorted, b.sorted))
      assert(SeriesKernels.cvmStat(a, b) == SeriesKernels.cvmStatSorted(a.sorted, b.sorted))
      assert(SeriesKernels.adStat(a, b) == SeriesKernels.adStatSorted(a.sorted, b.sorted))
    }
  }

  test("markov transitions are row-stochastic") {
    val data = core.table(spark, sfDir, "events")
    val m = Fitters.markovTransitions(data, Seq("user_id"), "event_id", "event_type", 1.0)
    val sums = m.groupBy("fromState").agg(sum("prob").as("s")).collect()
    assert(sums.nonEmpty)
    sums.foreach(r => assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-9))
  }

  test("markov merge: slice-fitted counts merged+normalized equal a full refit") {
    val data = core.table(spark, sfDir, "events")
    val half = pmod(col("user_id"), lit(2))
    val merged = Fitters.markovMerge(Seq(
      Fitters.markovCounts(data.where(half === 0), Seq("user_id"), "event_id", "event_type"),
      Fitters.markovCounts(data.where(half === 1), Seq("user_id"), "event_id", "event_type")))
    val viaMerge = Fitters.markovProbs(merged, smoothing = 1.0)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("prob")).toMap
    val refit = Fitters.markovTransitions(data, Seq("user_id"), "event_id", "event_type", 1.0)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("prob")).toMap
    assert(viaMerge.keySet == refit.keySet)
    viaMerge.foreach { case (k, p) => assert(math.abs(p - refit(k)) < 1e-12, s"$k") }
  }

  test("markov merge is associative and order-insensitive") {
    val data = core.table(spark, sfDir, "events")
    val slices = (0 until 3).map(i =>
      Fitters.markovCounts(data.where(pmod(col("user_id"), lit(3)) === i),
        Seq("user_id"), "event_id", "event_type"))
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("cnt")).toMap
    val abc = toMap(Fitters.markovMerge(slices))
    val cba = toMap(Fitters.markovMerge(slices.reverse))
    val nested = toMap(Fitters.markovMerge(Seq(
      Fitters.markovMerge(slices.take(2)), slices(2))))
    assert(abc == cba && abc == nested)
  }

  test("markov chain: improbable window scores higher than probable one") {
    val seq = (1 to 40).map(i => ("e1", i.toLong, if (i % 2 == 0) "A" else "B")) ++
      (41 to 45).map(i => ("e1", i.toLong, "C")) // rare state burst
    val df = seq.toDF("id", "seq", "state")
    val model = Fitters.markovTransitions(df, Seq("id"), "seq", "state", 0.5)
    val out = SeqOps.markovChainScore(df, model, Seq("id"), "seq", "state",
      window = 3, metric = "condProb", threshold = 100.0)
    val scores = out.orderBy("seq").select("score").as[Option[Double]].collect()
    assert(scores(44).get > scores(20).get) // C-burst window ≫ alternating window
  }

  test("subsequence discord: injected anomaly has the max score") {
    val base = (0 until 200).map(i => ("d", i.toLong, math.sin(i * 0.3)))
    val anom = base.map { case (k, s, v) => if (s >= 100 && s < 108) (k, s, v + 5.0) else (k, s, v) }
    val out = SeriesKernels.subSequenceDistance(anom.toDF("k", "s", "v"), Seq("k"), "s", "v", 8)
      .collect()
    val top = out.maxBy(_.score)
    assert(top.seq >= 93 && top.seq <= 107) // discord window overlaps the injection
  }

  test("STOMP-style discord equals the naive kernel within fp tolerance") {
    val rng = new scala.util.Random(11)
    val series = (0 until 300).map(i =>
      ("k", i.toLong, math.sin(i * 0.2) * 3 + rng.nextGaussian()))
    val df = series.toDF("k", "s", "v")
    val naive = SeriesKernels.subSequenceDistance(df, Seq("k"), "s", "v", 12)
      .collect().map(p => p.seq -> p.score).toMap
    val fast = SeriesKernels.subSequenceDistanceFast(df, Seq("k"), "s", "v", 12)
      .collect().map(p => p.seq -> p.score).toMap
    assert(fast.keySet == naive.keySet)
    naive.foreach { case (seqId, sc) =>
      assert(math.abs(fast(seqId) - sc) < 1e-8, s"seq $seqId: $sc vs ${fast(seqId)}")
    }
  }

  test("one-step-ahead feedback: outlier replaced, scores finite") {
    val pts = (0 until 60).map(i => ("k", i.toLong, if (i == 40) 500.0 else 10.0 + (i % 3)))
    val out = SeriesKernels.oneStepAhead(pts.toDF("k", "s", "v"), Seq("k"), "s", "v", 5, 3.0)
      .collect().sortBy(_.seq)
    assert(out(40).score > 3.0)       // spike detected
    assert(out(45).score < 3.0)       // post-spike forecasts recovered (replacement worked)
  }

  test("holt forecast: ramp stays quiet, spike alarms; math matches a replay") {
    // oscillating linear ramp + one spike: the flat window-mean OSA
    // forecaster lags a ramp (constant nonzero residual), Holt tracks it —
    // only the spike should stand out. (The oscillation keeps prior
    // residuals nonzero; on an EXACT ramp std=0 and, like oneStepAhead,
    // the score degenerates to 0 by convention.)
    val vals = (0 until 60).map(i =>
      2.0 * i + 0.5 * (i % 2) + (if (i == 40) 300.0 else 0.0))
    val pts = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
    val out = SeriesKernels.holtForecast(pts.toDF("k", "s", "v"), Seq("k"), "s", "v")
      .collect().sortBy(_.seq)
    assert(out(40).score > 100.0, s"spike score ${out(40).score}")
    assert((3 until 40).forall(i => out(i).score < 8.0)) // ramp tracked, no alarms
    // independent replay of the recursion
    var lvl = vals(1); var trd = vals(1) - vals(0)
    var sum = 0.0; var sq = 0.0; var n = 0
    (2 until 60).foreach { i =>
      val pred = lvl + trd
      val resid = vals(i) - pred
      val std = if (n > 1) math.sqrt((sq - sum * sum / n) / (n - 1)) else 0.0
      val score = if (std > 0) math.abs(resid) / std else 0.0
      assert(math.abs(out(i).score - score) < 1e-9, s"i=$i")
      sum += resid; sq += resid * resid; n += 1
      val l2 = 0.5 * vals(i) + 0.5 * pred
      trd = 0.25 * (l2 - lvl) + 0.75 * trd
      lvl = l2
    }
  }

  test("hampel: spike tagged O, neighbors stay N (median unpoisoned), edges I") {
    val rows = (0 until 60).map(i =>
      ("k", i.toLong, 10.0 + (i % 5) * 0.3 + (if (i == 30) 100.0 else 0.0)))
    val out = SeqOps.hampel(rows.toDF("k", "s", "v"), Seq("k"), "s", "v",
      halfWindow = 7, nSigmas = 3.0)
      .collect().map(r => r.getAs[Long]("s") -> r.getAs[String]("tag")).toMap
    assert(out(30L) == "O")
    // the spike sits inside its neighbors' frames, but the MEDIAN ignores
    // it — the robustness a mean/σ window doesn't have
    ((23 until 30) ++ (31 until 38)).foreach(i => assert(out(i.toLong) == "N", s"i=$i"))
    (0 until 7).foreach(i => assert(out(i.toLong) == "I", s"edge $i"))
  }

  test("trend residuals: ramp fits clean, break point scores top, slope recovered") {
    val rows = (0 until 100).map(i =>
      ("k", i.toLong, 3.0 + 0.5 * i + (if (i == 70) 40.0 else 0.0)))
    val out = SeqOps.trendResiduals(rows.toDF("k", "s", "v"), Seq("k"), "s", "v")
      .collect().map(r => r.getAs[Long]("s") ->
        ((r.getAs[Double]("resid"), r.getAs[Double]("score")))).toMap
    val (spikeResid, spikeScore) = out(70L)
    assert(spikeResid > 35.0 && spikeResid < 41.0) // ~40 minus the spike's own pull on the fit
    assert(spikeScore == out.values.map(_._2).max, "break point is the top score")
    // every clean point's residual is just the spike's leverage (small)
    out.filterNot(_._1 == 70L).values.foreach { case (r, _) => assert(math.abs(r) < 2.0) }
  }

  test("changepoint mean-shift flags an injected level shift") {
    val pts = (0 until 200).map(i => ("k", i.toLong, if (i < 100) 10.0 else 30.0))
      .toDF("k", "s", "v")
    val cp = SeqOps.changePointMeanShift(pts, Seq("k"), "s", "v", 30, 10.0)
      .select("s").as[Long].collect()
    assert(cp.contains(100L))
  }

  test("outlier cluster keeps one prototype per burst") {
    val rows = Seq(
      ("k", 1L, 1.0, 5.0, "O"), ("k", 2L, 1.0, 9.0, "O"), ("k", 3L, 1.0, 7.0, "O"),
      ("k", 500L, 1.0, 4.0, "O"), ("k", 600L, 1.0, 2.0, "N")
    ).toDF("id", "seq", "value", "score", "tag")
    val out = SeqOps.outlierCluster(rows, Seq("id"), "seq", maxGap = 100L)
    val os = out.where($"tag" === "O").select("seq").as[Long].collect().sorted
    assert(os.toSeq == Seq(2L, 500L)) // burst prototype = max score; singleton kept
  }

  test("score spread raises the trailing window to the incoming score") {
    // replay semantics of SeequenceScoreAggregator.add: a spike at p
    // raises positions p-w+1..p once more than w scores exist
    assert(SeriesKernels.spreadScores(Array(1.0, 1.0, 1.0, 9.0, 1.0, 1.0), 3).toSeq ==
      Seq(1.0, 9.0, 9.0, 9.0, 1.0, 1.0))
    // no spreading until more than `window` scores have been added
    assert(SeriesKernels.spreadScores(Array(5.0, 1.0, 1.0), 3).toSeq ==
      Seq(5.0, 1.0, 1.0))
    assert(SeriesKernels.spreadScores(Array(0.0, 0.0, 2.0, 0.0, 0.0), 2).toSeq ==
      Seq(0.0, 2.0, 2.0, 0.0, 0.0))
  }

  test("one-step-ahead residual stats match a hand-rolled recurrence") {
    val vals = (0 until 60).map(i => if (i == 40) 500.0 else 10.0 + (i % 3))
    val pts = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
    val (scored, stats) = SeriesKernels.oneStepAheadWithStats(
      pts.toDF("k", "s", "v"), Seq("k"), "s", "v", 5, 3.0)
    assert(scored.count() == 60)
    val st = stats.collect().head
    // independent replay: list-based trailing window with replace-on-outlier
    var win = List.empty[Double]
    var n = 0; var sum = 0.0; var sq = 0.0
    vals.foreach { x =>
      var store = x
      if (win.size >= 5) {
        val pred = win.sum / 5
        val resid = x - pred
        val std = if (n > 1) math.sqrt((sq - sum * sum / n) / (n - 1)) else 0.0
        val score = if (std > 0) math.abs(resid) / std else 0.0
        sum += resid; sq += resid * resid; n += 1
        if (score > 3.0) store = pred
      }
      win = (store :: win).take(5)
    }
    assert(st.n == n && n == 55)
    assert(math.abs(st.mean - sum / n) < 1e-9)
    assert(math.abs(st.std - math.sqrt((sq - sum * sum / n) / (n - 1))) < 1e-9)
  }

  test("sequence matchers") {
    assert(SeriesKernels.positionalSimilarity(Seq("a", "b", "c"), Seq("a", "x", "c")) == 2.0 / 3)
    assert(SeriesKernels.lcsSimilarity(Seq("a", "b", "c", "d"), Seq("a", "c", "d")) == 3.0 / 4)
  }

  test("seasonal decompose recovers trend + seasonal pattern, spike tops residual z") {
    // linear trend + period-4 pattern (sums to 0) + one spike at t=100
    val s = Array(5.0, -5.0, 2.0, -2.0)
    val rows = (0 until 200).map { t =>
      val spike = if (t == 100) 50.0 else 0.0
      ("k", t.toLong, 0.1 * t + s(t % 4) + spike)
    }.toDF("k", "t", "v")
    val out = SeqOps.seasonalDecompose(rows, Seq("k"), "t", "v", period = 4)
      .collect().map(r => r.getAs[Long]("seq") -> r).toMap
    // centered MA of a linear trend is exact away from the spike's frame
    val r50 = out(50L)
    assert(math.abs(r50.getAs[Double]("trend") - 5.0) < 1e-9)
    assert(math.abs(r50.getAs[Double]("seasonal") - s(50 % 4)) < 0.3)
    assert(math.abs(r50.getAs[Double]("resid")) < 0.3)
    // frame not full at the series edges -> null trend
    assert(out(0L).isNullAt(out(0L).fieldIndex("trend")))
    // the spike carries the max z by a wide margin
    val zs = out.values.filter(!_.isNullAt(out(50L).fieldIndex("z")))
      .map(r => r.getAs[Long]("seq") -> r.getAs[Double]("z"))
    assert(zs.maxBy(_._2)._1 == 100L)
    assert(zs.toMap.apply(100L) > 5.0)
  }

  test("funnel: greedy order, strict-after rule, completion window") {
    def ns(sec: Long) = sec * 1000000000L
    val rows = Seq(
      // u1 completes A>B>C in order
      (1L, ns(10), "A"), (1L, ns(20), "B"), (1L, ns(30), "C"),
      // u2: B before A only — B must NOT count (strictly after t1)
      (2L, ns(10), "B"), (2L, ns(20), "A"),
      // u3: completes A>B but C falls outside the 100 s window from t1
      (3L, ns(10), "A"), (3L, ns(20), "B"), (3L, ns(200), "C"),
      // u4 never enters the funnel (no A)
      (4L, ns(10), "C")
    ).toDF("user_id", "ts", "event_type")
    val out = SeqOps.funnel(rows, Seq("user_id"), "ts", "event_type",
        Seq("A", "B", "C"), windowSec = 100L)
      .collect().map(r => r.getAs[Int]("step") ->
        (r.getAs[Long]("users"), r.getAs[Double]("conversion"))).toMap
    assert(out(1) == ((3L, 1.0)))      // u1, u2, u3 reach A
    assert(out(2) == ((2L, 0.6667)))   // u1, u3 (u2's B precedes its A)
    assert(out(3) == ((1L, 0.3333)))   // only u1 inside the window
  }

  test("funnel: same-timestamp step does not satisfy strictly-after") {
    val rows = Seq((1L, 1000000000L, "A"), (1L, 1000000000L, "B"))
      .toDF("user_id", "ts", "event_type")
    val out = SeqOps.funnel(rows, Seq("user_id"), "ts", "event_type",
        Seq("A", "B")).collect().map(r =>
        r.getAs[Int]("step") -> r.getAs[Long]("users")).toMap
    assert(out(1) == 1L && out(2) == 0L)
  }

  test("retention: cohorts, offsets and rates on a crafted month") {
    def day(d: Long) = d * 86400L * 1000000000L + 1L
    val rows = Seq(
      // cohort day 0: u1 active d0,d1,d2; u2 active d0,d2
      (1L, day(0)), (1L, day(1)), (1L, day(2)),
      (2L, day(0)), (2L, day(2)),
      // duplicate activity inside one period collapses
      (2L, day(0) + 5000L),
      // cohort day 1: u3 active d1 only
      (3L, day(1))
    ).toDF("user_id", "ts")
    val out = SeqOps.retention(rows, Seq("user_id"), "ts", periodSec = 86400L)
      .collect().map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("offset_k")) ->
        (r.getAs[Long]("active_users"), r.getAs[Double]("retention"))).toMap
    assert(out((0L, 0L)) == ((2L, 1.0)))
    assert(out((0L, 1L)) == ((1L, 0.5)))
    assert(out((0L, 2L)) == ((2L, 1.0)))
    assert(out((1L, 0L)) == ((1L, 1.0)))
    assert(!out.contains((1L, 1L)))
  }

  test("holt-winters: seasonal break scores highest; clean cycle stays low") {
    // period-4 cycle (0, 10, 20, 10) + trend 1/step, anomaly at i=30
    val rows = (0 until 48).map { i =>
      val seasonal = Seq(0.0, 10.0, 20.0, 10.0)(i % 4)
      val v = seasonal + i * 1.0 + (if (i == 30) 40.0 else 0.0)
      ("k", i.toLong, v)
    }.toDF("g", "id", "x")
    val out = graft.seq.SeriesKernels.holtWinters(rows, Seq("g"), "id", "x",
      period = 4).collect().map(r => r.seq -> r.score).toMap
    val top = out.maxBy(_._2)
    assert(top._1 == 30L, s"expected anomaly at 30, got $top")
    // warm-up region emits 0
    assert((0 until 8).forall(i => out(i.toLong) == 0.0))
    // clean seasonal points far from the anomaly stay well below
    assert(out(20L) < top._2 / 3 && out(44L) < top._2 / 3)
  }

  test("burst detect: rapid-fire run flagged state 1, regular cadence 0") {
    val ns = 1000000000L
    // 10s cadence, then a 9-event hammer at 0.5s gaps, then 10s again
    val ts = (0 until 5).map(_ * 10L * ns) ++
      (1 to 9).map(i => 40L * ns + i * ns / 2) ++
      (1 to 5).map(i => 45L * ns + i * 10L * ns)
    val rows = ts.zipWithIndex.map { case (t, i) => ("u", t, i.toDouble) }
      .toDF("g", "ts", "x")
    val out = graft.seq.SeriesKernels.burstDetect(rows, Seq("g"), "ts", "x")
      .collect().map(r => r.seq -> r.score).toMap
    // interior of the hammer is burst state
    assert((3 to 9).forall(i => out(40L * ns + i * ns / 2) == 1.0))
    // regular-cadence tail is base state
    assert((2 to 5).forall(i => out(45L * ns + i * 10L * ns) == 0.0))
    assert(out(0L) == 0.0)
  }

  test("burst detect: short or zero-span keys emit all zeros") {
    val rows = Seq(("a", 5L, 1.0), ("a", 9L, 2.0),
      ("b", 7L, 1.0), ("b", 7L, 2.0), ("b", 7L, 3.0)).toDF("g", "ts", "x")
    val out = graft.seq.SeriesKernels.burstDetect(rows, Seq("g"), "ts", "x")
      .collect()
    assert(out.length == 5 && out.forall(_.score == 0.0))
  }

  test("holt-winters: short keys score 0 everywhere") {
    val rows = (0 until 7).map(i => ("k", i.toLong, i * 1.0)).toDF("g", "id", "x")
    val out = graft.seq.SeriesKernels.holtWinters(rows, Seq("g"), "id", "x",
      period = 4).collect()
    assert(out.length == 7 && out.forall(_.score == 0.0))
  }

  test("pacf: AR(1) cuts after lag 1, constant key dropped") {
    // AR(1) x_t = 0.8 x_{t-1} + e_t with LCG noise: PACF(1) ≈ 0.8,
    // PACF(k ≥ 2) ≈ 0 (the order-selection cut ACF cannot show)
    var seed = 12345L
    def next(): Double = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      (seed >>> 40).toDouble / (1L << 24).toDouble - 0.5
    }
    var x = 0.0
    val rows = (0 until 2000).map { i =>
      x = 0.8 * x + next()
      ("ar", i.toLong, x)
    } ++ (0 until 50).map(i => ("const", i.toLong, 7.0))
    val out = graft.seq.SeqOps.pacf(rows.toDF("g", "id", "v"),
      Seq("g"), "id", "v", maxLag = 4).collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Int]("lag")) ->
        r.getAs[Double]("pacf")).toMap
    assert(out.keys.forall(_._1 == "ar"), "constant series has NULL acf → dropped")
    assert(math.abs(out(("ar", 1)) - 0.8) < 0.05, s"pacf1=${out(("ar", 1))}")
    assert((2 to 4).forall(k => math.abs(out(("ar", k))) < 0.06),
      s"AR(1) pacf must cut: ${out.toSeq.sortBy(_._1._2)}")
  }

  test("ar forecast: injected spike flags O, warm-up rows I, in-sample mostly N") {
    var seed = 999L
    def next(): Double = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      (seed >>> 40).toDouble / (1L << 24).toDouble - 0.5
    }
    var x = 0.0
    val base = (0 until 1000).map { i =>
      x = 0.8 * x + next()
      ("k", i.toLong, if (i == 700) x + 8.0 else x) // spike off the AR path
    }
    val out = graft.seq.SeqOps.arForecast(base.toDF("g", "id", "v"),
      Seq("g"), "id", "v", order = 3, threshold = 3.0).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("tag")).toMap
    assert((0 until 3).forall(i => out(i.toLong) == "I"), "warm-up rows are I")
    assert(out(700L) == "O", s"spike must flag: ${out(700L)}")
    val n = (3 until 1000).count(i => out(i.toLong) == "N")
    assert(n > 950, s"in-sample AR data should be mostly N, got $n")
  }
}
