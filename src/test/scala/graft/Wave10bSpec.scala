package graft

import graft.multi.Proximity
import graft.sim.Similarity
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Round-10 wave B: LoOP, FastABOD, Moore-Lewis selection, Kneser-Ney
  * LM, k-center greedy coreset. */
class Wave10bSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  // a tight 2-D grid of 9 inliers + one far outlier
  private val cloud = vecs(
    (Seq.tabulate(9)(i =>
      (i.toLong, Seq((i % 3).toFloat, (i / 3).toFloat))) :+
      (99L, Seq(40.0f, 40.0f))): _*)

  test("erfPos matches known values to polynomial accuracy") {
    val r = Seq(0.5, 1.0, 2.0).toDF("x")
      .select(Proximity.erfPos(col("x")).as("e")).as[Double].collect()
    assert(math.abs(r(0) - 0.5204999) < 2e-7)
    assert(math.abs(r(1) - 0.8427008) < 2e-7)
    assert(math.abs(r(2) - 0.9953223) < 2e-7)
  }

  test("LoOP: far point gets outlier probability near 1, inliers near 0") {
    val nn = Proximity.knn(
      Proximity.pairDistances(cloud, "vec_id", "embedding"), 3)
    val r = Proximity.loopFromKnn(nn, 3)
      .collect().map(x => x.getAs[Long]("src") -> x).toMap
    // at n=10 the outlier's own PLOF dominates nPLOF (3·√(PLOF²/10) ≈
    // 0.95·PLOF), capping its z near 1/√2 — erf(0.74) ≈ 0.71
    assert(r(99L).getAs[Double]("loopProb") > 0.6)
    assert(r(99L).getAs[Double]("loopProb") ==
      r.values.map(_.getAs[Double]("loopProb")).max)
    assert(r(4L).getAs[Double]("loopProb") < 0.3, "grid center is an inlier")
    r.values.foreach { x =>
      val p = x.getAs[Double]("loopProb")
      assert(p >= 0.0 && p <= 1.0)
    }
  }

  test("FastABOD: far point has the smallest angle variance") {
    val nn = Proximity.knn(
      Proximity.pairDistances(cloud, "vec_id", "embedding"), 3)
    val r = Proximity.fastAbodFromKnn(nn, cloud, "vec_id", "embedding")
      .collect().map(x => x.getAs[Long]("src") -> x.getAs[Double]("abof"))
      .toMap
    val minSrc = r.minBy(_._2)._1
    assert(minSrc == 99L,
      s"outlier must minimize ABOF, got $minSrc in $r")
  }

  test("Moore-Lewis: in-domain-like docs score below out-domain docs") {
    val d = Seq(
      (1L, "in", "alpha beta gamma alpha beta"),
      (2L, "in", "alpha gamma beta beta alpha"),
      (3L, "out", "zulu yankee xray whiskey victor"),
      (4L, "out", "zulu victor xray yankee zulu"),
      (5L, "out", "")).toDF("doc_id", "dom", "text")
    val r = TextOps.mooreLewisScore(d, "doc_id", "text",
      d.where(col("dom") === "in"), d)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Double]("ceDiff") < r(3L).getAs[Double]("ceDiff"),
      "in-domain text must have the lower cross-entropy difference")
    assert(r(5L).getAs[Long]("nTok") == 0L &&
      r(5L).getAs[Double]("ceDiff") == 0.0)
  }

  test("Kneser-Ney LM: corpus-typical bigrams beat never-seen ones") {
    val d = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug"),
      (3L, "the cat sat on the mat"),
      (4L, "rug mat on sat zz qq"),
      (5L, "solo")).toDF("doc_id", "text")
    val r = TextOps.knLmScore(d, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Double]("avgNll") < r(4L).getAs[Double]("avgNll"),
      "typical word order must be more probable than scrambled")
    assert(r(5L).getAs[Long]("nGrams") == 0L &&
      r(5L).getAs[Double]("avgNll") == 0.0)
    r.values.foreach(x => assert(x.getAs[Double]("avgNll") >= 0.0))
  }

  test("forecastAccuracy: perfect forecast zeroes all, naive gives MASE 1") {
    val d = Seq.tabulate(20)(i => ("k", i.toLong, 10.0 + (i % 5)))
      .toDF("k", "seq", "y")
    val perfect = graft.model.Eval2.forecastAccuracy(
      d.withColumn("f", col("y")), Seq("k"), "seq", "y", "f")
      .collect().head
    assert(perfect.getAs[Double]("mae") == 0.0 &&
      perfect.getAs[Double]("rmse") == 0.0 &&
      perfect.getAs[Double]("smape") == 0.0 &&
      perfect.getAs[Double]("mase") == 0.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("seq")
    val naive = graft.model.Eval2.forecastAccuracy(
      d.withColumn("f", lag(col("y"), 1).over(w)), Seq("k"), "seq", "y", "f")
      .collect().head
    assert(math.abs(naive.getAs[Double]("mase") - 1.0) < 1e-9,
      "lag-1 forecast must have MASE exactly 1")
  }

  test("quantilePinball: exact order-stat quantile and its coverage") {
    // train = ids 0..198 even (values 1..100), test = odd (same values)
    val d = Seq.tabulate(200)(i => ("k", i.toLong, (i / 2 + 1).toDouble))
      .toDF("k", "id", "y")
    val r = graft.model.Eval2.quantilePinball(d, Seq("k"), "y",
      col("id") % 2 === 0, Seq(0.5, 0.9))
      .collect().map(x => x.getAs[Double]("tau") -> x).toMap
    assert(r(0.5).getAs[Double]("qhat") == 50.0,
      "ceil(0.5*100)=50th order stat of 1..100 is 50")
    assert(r(0.9).getAs[Double]("qhat") == 90.0)
    assert(r(0.5).getAs[Double]("coverage") == 0.5)
    assert(r(0.9).getAs[Double]("coverage") == 0.9)
  }

  test("binSegL2: a clean level shift splits exactly at the step") {
    val d = (Seq.tabulate(20)(i => ("k", i.toLong, 0.0)) ++
      Seq.tabulate(20)(i => ("k", 20L + i, 10.0))).toDF("k", "seq", "y")
    val r = graft.seq.SeriesKernels.binSegL2(d, Seq("k"), "seq", "y",
      minSeg = 5).collect().map(x => x.getAs[Int]("depth") -> x)
    val d1 = r.filter(_._1 == 1).map(_._2)
    assert(d1.length == 1 && d1.head.getAs[Long]("split") == 20L,
      "depth-1 split must land on the last index of the low segment")
    // flat halves: every depth-2 gain is 0
    r.filter(_._1 == 2).foreach(x =>
      assert(x._2.getAs[Double]("gain") == 0.0))
    // gain = n1*n2/n * (mu1-mu2)^2 = 20*20/40 * 100 = 1000
    assert(math.abs(d1.head.getAs[Double]("gain") - 1000.0) < 1e-6)
  }

  test("adwin: detects a clean mean shift and resets the window") {
    val d = (Seq.tabulate(30)(i => ("k", i.toLong, 10.0)) ++
      Seq.tabulate(30)(i => ("k", 30L + i, 60.0))).toDF("k", "seq", "y")
    val r = graft.drift.Drift.adwin(d, Seq("k"), "seq", "y",
      delta = 0.002, r = 50.0).collect().sortBy(_.seq)
    val driftSeqs = r.filter(_.drift).map(_.seq)
    assert(driftSeqs.nonEmpty && driftSeqs.head >= 30L,
      s"no drift before the shift, got $driftSeqs")
    val after = r.find(_.seq == driftSeqs.head).get
    assert(after.winStart == driftSeqs.head + 1,
      "window restarts at the detection row (1-based rank)")
    val const = graft.drift.Drift.adwin(
      Seq.tabulate(50)(i => ("k", i.toLong, 5.0)).toDF("k", "seq", "y"),
      Seq("k"), "seq", "y", delta = 0.002, r = 50.0).collect()
    assert(!const.exists(_.drift), "constant series never drifts")
  }

  test("adwin stream twin equals the batch kernel row-for-row (sf0.001)") {
    val b = graft.SparkEntry.queries("q493_adwin")(spark, sfDir)
      .collect().toSet
    val s = graft.SparkEntry.queries("q495_adwin_stream")(spark, sfDir)
      .collect().toSet
    assert(b == s, "adwin stream twin diverged from the batch kernel")
  }

  test("concentration: uniform mass gives Gini 0, monopoly gives (n-1)/n") {
    val uni = Seq.tabulate(10)(i => ("k", i.toLong, 5.0)).toDF("k", "m", "w")
    val r1 = graft.multi.TailScores.concentration(uni, Seq("k"), "m", "w")
      .collect().head
    assert(r1.getAs[Double]("gini") == 0.0)
    assert(math.abs(r1.getAs[Double]("top10pct_share") - 0.1) < 1e-9)
    val mono = (Seq.tabulate(9)(i => ("k", i.toLong, 0.0)) :+
      (("k", 9L, 100.0))).toDF("k", "m", "w")
    val r2 = graft.multi.TailScores.concentration(mono, Seq("k"), "m", "w")
      .collect().head
    assert(math.abs(r2.getAs[Double]("gini") - 0.9) < 1e-9,
      "one member owning all mass gives Gini (n-1)/n")
    assert(r2.getAs[Double]("top1_share") == 1.0)
  }

  test("fellegiSunter EM: all-agree pairs match, all-disagree do not") {
    val pairs = (Seq.tabulate(50)(i => (i.toLong, 1000L + i, true, true, true)) ++
      Seq.tabulate(500)(i => (2000L + i, 3000L + i, false, false, false)) ++
      Seq.tabulate(30)(i => (4000L + i, 5000L + i, true, false, false)))
      .toDF("a", "b", "f1", "f2", "f3")
    val r = graft.model.Linkage.fellegiSunterEm(pairs, Seq("f1", "f2", "f3"))
      .collect()
    val allAgree = r.filter(x => x.getAs[Boolean]("f1") &&
      x.getAs[Boolean]("f2") && x.getAs[Boolean]("f3"))
    assert(allAgree.forall(_.getAs[String]("decision") == "match"))
    val none = r.filter(x => !x.getAs[Boolean]("f1") &&
      !x.getAs[Boolean]("f2") && !x.getAs[Boolean]("f3"))
    assert(none.forall(_.getAs[String]("decision") == "nonmatch"))
    assert(allAgree.head.getAs[Double]("weight") >
      none.head.getAs[Double]("weight"))
  }

  test("kAnonymityAudit: exact class sizes and l-diversity") {
    // classes: (a: 5 rows, 2 sensitive), (b: 2 rows, 1 sensitive)
    val d = (Seq.fill(3)(("a", 1L)) ++ Seq.fill(2)(("a", 2L)) ++
      Seq.fill(2)(("b", 7L))).toDF("q", "s")
    val r = graft.model.Privacy.kAnonymityAudit(d, Seq("q"), "s", k = 3L)
      .collect().head
    assert(r.getAs[Long]("n_rows") == 7L && r.getAs[Long]("n_classes") == 2L)
    assert(r.getAs[Long]("k_anonymity") == 2L)
    assert(r.getAs[Long]("l_diversity") == 1L)
    assert(r.getAs[Long]("rows_below_k") == 2L &&
      r.getAs[Long]("classes_below_k") == 1L)
  }

  test("frequentSequences: supports count users with the ordered pattern") {
    // u1: a,b,c  u2: a,b  u3: b,a (reversed)
    val d = Seq(
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L),
      (2L, "a", 10L), (2L, "b", 20L),
      (3L, "b", 10L), (3L, "a", 20L)).toDF("u", "t", "ts")
    val r = graft.model.Behavior.frequentSequences(d, "u", "t", "ts", 1L)
      .collect()
      .map(x => (x.getAs[Int]("len"), x.getAs[String]("p1"),
        x.getAs[String]("p2"), x.getAs[String]("p3")) ->
        x.getAs[Long]("support")).toMap
    assert(r((2, "a", "b", null)) == 2L)
    assert(r((2, "b", "a", null)) == 1L)
    assert(r((2, "a", "c", null)) == 1L)
    assert(r((3, "a", "b", "c")) == 1L)
    assert(!r.contains((3, "c", "b", "a")))
  }

  test("shapleyAttribution: the only converting channel takes the credit") {
    // users 1-10 touch A then convert; users 11-20 touch B, never convert
    val rows = (1 to 10).flatMap(u =>
      Seq((u.toLong, 1L, "A"), (u.toLong, 2L, "buy"))) ++
      (11 to 20).map(u => (u.toLong, 1L, "B"))
    val d = rows.toDF("u", "ts", "ty")
    val r = graft.model.Behavior.shapleyAttribution(d, "u", "ts", "ty",
      Seq("A", "B"), "buy")
      .collect().map(x => x.getAs[String]("channel") -> x).toMap
    // observed: v({A}) = 1, v({B}) = 0; ∅ and {A,B} unobserved → v = 0
    // phi_A = ½(v{A} − v∅) + ½(v{A,B} − v{B}) = 0.5
    // phi_B = ½(v{B} − v∅) + ½(v{A,B} − v{A}) = −0.5; Σphi = v_grand − v∅
    assert(math.abs(r("A").getAs[Double]("phi") - 0.5) < 1e-9)
    assert(math.abs(r("B").getAs[Double]("phi") + 0.5) < 1e-9)
    assert(r("A").getAs[Long]("touched_users") == 10L)
  }

  test("bradleyTerry: transitive dominance recovers the strength order") {
    // a beats b 9:1, b beats c 9:1, a beats c 9:1
    val cmp = (Seq.fill(9)(("a", "b")) ++ Seq.fill(1)(("b", "a")) ++
      Seq.fill(9)(("b", "c")) ++ Seq.fill(1)(("c", "b")) ++
      Seq.fill(9)(("a", "c")) ++ Seq.fill(1)(("c", "a")))
      .toDF("w", "l")
    val r = graft.model.Preference.bradleyTerry(cmp, "w", "l")
      .collect().map(x => x.getAs[String]("item") -> x).toMap
    assert(r("a").getAs[Int]("rank") == 1 && r("c").getAs[Int]("rank") == 3)
    assert(r("a").getAs[Double]("pi") > r("b").getAs[Double]("pi"))
    assert(r("b").getAs[Double]("pi") > r("c").getAs[Double]("pi"))
    val s = Seq("a", "b", "c").map(r(_).getAs[Double]("pi")).sum
    assert(math.abs(s - 1.0) < 1e-5, "strengths renormalize to 1")
    assert(r("a").getAs[Long]("wins") == 18L &&
      r("a").getAs[Long]("comparisons") == 20L)
  }

  test("markovAttribution: the only converting path takes all the credit") {
    // 10 users: A then buy; 10 users: B only (never convert)
    val rows = (1 to 10).flatMap(u =>
      Seq((u.toLong, 1L, "A"), (u.toLong, 2L, "buy"))) ++
      (11 to 20).map(u => (u.toLong, 1L, "B"))
    val r = graft.model.Behavior.markovAttribution(rows.toDF("u", "o", "ty"),
      "u", "o", "ty", Seq("A", "B"), "buy")
      .collect().map(x => x.getAs[String]("channel") -> x).toMap
    assert(math.abs(r("A").getAs[Double]("removal_effect") - 1.0) < 1e-9)
    assert(math.abs(r("B").getAs[Double]("removal_effect")) < 1e-9)
    assert(math.abs(r("A").getAs[Double]("share") - 1.0) < 1e-9)
    assert(math.abs(r("A").getAs[Double]("p_conv") - 0.5) < 1e-9,
      "half the users convert through A")
  }

  test("autoencoder: off-manifold point gets the top reconstruction error") {
    // 40 points on the line (t, 2t, -t); one point far off the manifold
    val rows = Seq.tabulate(40) { i =>
      val t = (i - 20).toDouble / 4.0
      (i.toLong, t, 2.0 * t, -t)
    } :+ ((99L, 0.0, 8.0, 8.0))
    val d = rows.toDF("id", "f0", "f1", "f2")
    val r = graft.multi.AutoEncoder.aeScore(d, Seq("id"),
      Seq("f0", "f1", "f2"), hidden = 2, rounds = 12, lr = 0.2,
      threshold = 1e18)
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Double]("score"))
      .toMap
    val top = r.maxBy(_._2)._1
    assert(top == 99L, s"off-manifold point must score highest, got $top")
    val inlierMax = (r - 99L).values.max
    assert(r(99L) > 2.0 * inlierMax,
      "outlier error must clearly separate from the manifold")
  }

  test("ipwAte: weighting removes most of the confounding bias") {
    // treatment is much likelier above x=49; true effect is exactly 2
    val d = Seq.tabulate(400) { i =>
      val x = (i % 100).toDouble
      val t = (i * 7) % 100 < (if (x > 49) 60 else 20)
      (i.toLong, x, t, x + (if (t) 2.0 else 0.0), 1.0, (x - 49.0) / 10.0)
    }.toDF("uid", "x", "t", "y", "f0", "f1")
    val r = graft.model.Causal.ipwAte(d, "uid", "t", "y",
      Seq("f0", "f1"), iters = 60, lr = 0.5).head()
    val naive = r.getAs[Double]("ate_naive")
    val ipw = r.getAs[Double]("ate_ipw")
    assert(naive > 10.0, s"the raw contrast must be badly confounded: $naive")
    assert(math.abs(ipw - 2.0) < math.abs(naive - 2.0) / 2.0,
      s"IPW must remove most of the bias: naive=$naive ipw=$ipw")
  }

  test("cohensD: textbook pooled-SD arithmetic") {
    // a={0,0,2,2} m=1, b={4,4,6,6} m=5; each css=4 -> sp2=8/6
    val d = (Seq(0.0, 0.0, 2.0, 2.0).map(("k", "a", _)) ++
      Seq(4.0, 4.0, 6.0, 6.0).map(("k", "b", _))).toDF("k", "g", "v")
    val r = graft.model.GroupTests.cohensD(d, Seq("k"), "g", "v").head()
    assert(r.getAs[String]("g1") == "a" && r.getAs[String]("g2") == "b")
    assert(math.abs(r.getAs[Double]("mean_diff") + 4.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("pooled_sd") -
      math.sqrt(8.0 / 6.0)) < 1e-9)
    assert(math.abs(r.getAs[Double]("cohens_d") +
      4.0 / math.sqrt(8.0 / 6.0)) < 1e-9)
    assert(math.abs(r.getAs[Double]("hedges_g") -
      r.getAs[Double]("cohens_d") * (1.0 - 3.0 / 23.0)) < 1e-9)
  }

  test("engleGranger: stationary residuals flag cointegration") {
    val co = Seq.tabulate(120)(i => ("k", i.toLong,
      (i % 13).toDouble * 3.0 + 10.0)).toDF("k", "o", "x")
      .withColumn("y", col("x") * 0.5 + (col("o") % 3).cast("double"))
    val r = graft.seq.Forecast2.engleGranger(co, Seq("k"), "o", "y", "x")
      .head()
    assert(math.abs(r.getAs[Double]("slope") - 0.5) < 0.05)
    assert(r.getAs[Boolean]("cointegrated"),
      "bounded residuals must reject the unit root")
    // y a pure trend, x a bounded cycle: residual inherits the trend
    val no = Seq.tabulate(120)(i => ("k", i.toLong,
      (i % 13).toDouble, i.toDouble)).toDF("k", "o", "x", "y")
    val rn = graft.seq.Forecast2.engleGranger(no, Seq("k"), "o", "y", "x")
      .head()
    assert(!rn.getAs[Boolean]("cointegrated"),
      "a trending residual is not stationary")
  }

  test("jlDistortion: 64->16 sign projection keeps distances in band") {
    val r = graft.sim.SimJoin.jlDistortion(
      graft.core.table(spark, sfDir, "embeddings"),
      "vec_id", "embedding", dim = 64, k = 16, sampleMod = 4).head()
    val mean = r.getAs[Double]("mean_ratio")
    assert(mean > 0.6 && mean < 1.4,
      s"JL mean distortion should hover near 1, got $mean")
    assert(r.getAs[Double]("min_ratio") > 0.0)
    assert(r.getAs[Long]("n_pairs") > 10L)
  }

  test("calibrationError: perfectly calibrated bins give ECE 0") {
    // bin 0.25: 25% positive; bin 0.75: 75% positive — exactly calibrated
    val d = (Seq.fill(3)((0.25, false)) ++ Seq.fill(1)((0.25, true)) ++
      Seq.fill(1)((0.75, false)) ++ Seq.fill(3)((0.75, true)))
      .toDF("p", "y")
    val r = graft.model.Eval2.calibrationError(d, "p", "y").head()
    assert(r.getAs[Double]("ece") == 0.0 && r.getAs[Double]("mce") == 0.0)
    assert(r.getAs[Long]("bins_used") == 2L)
    // anti-calibrated: confident and always wrong
    val bad = (Seq.fill(4)((0.95, false)) ++ Seq.fill(4)((0.05, true)))
      .toDF("p", "y")
    val rb = graft.model.Eval2.calibrationError(bad, "p", "y").head()
    assert(rb.getAs[Double]("mce") > 0.89)
    assert(rb.getAs[Double]("logloss") > 2.9,
      "confident wrong predictions blow up log-loss")
  }

  test("plattScale: calibrated output is monotone in the score") {
    // y gets likelier with s
    val d = Seq.tabulate(200) { i =>
      val s = (i % 100).toDouble / 100.0
      (i.toLong, s, (i * 37) % 100 < (s * 100).toInt)
    }.toDF("id", "score", "y")
    val r = graft.model.Eval2.plattScale(d, "id", "score", "y")
      .collect().map(x => x.getAs[Double]("score") -> x.getAs[Double]("p_cal"))
      .sortBy(_._1)
    assert(r.last._2 > r.head._2, "p_cal must rise with the score")
    r.foreach { case (_, p) => assert(p >= 0.0 && p <= 1.0) }
  }

  test("hosmerLemeshow: calibrated data scores near zero chi2") {
    val good = (Seq.fill(30)((0.25, false)) ++ Seq.fill(10)((0.25, true)) ++
      Seq.fill(10)((0.75, false)) ++ Seq.fill(30)((0.75, true)))
      .toDF("p", "y")
    val g = graft.model.Eval2.hosmerLemeshow(good, "p", "y").head()
    assert(g.getAs[Double]("chi2") == 0.0)
    assert(g.getAs[Long]("df") == 0L, "two used bins minus 2")
    val bad = (Seq.fill(40)((0.25, true)) ++ Seq.fill(40)((0.75, false)))
      .toDF("p", "y")
    val b = graft.model.Eval2.hosmerLemeshow(bad, "p", "y").head()
    assert(b.getAs[Double]("chi2") > 50.0)
  }

  test("concordanceIndex: perfect, anti-perfect and tied rankings") {
    // events at t=1..10 with scores 10..1: higher score dies sooner
    val perfect = Seq.tabulate(10)(i =>
      ((i + 1).toDouble, true, (10 - i).toDouble)).toDF("dur", "ev", "s")
    val p = graft.model.Survival.concordanceIndex(perfect, "dur", "ev", "s")
      .head()
    assert(p.getAs[Double]("c_index") == 1.0)
    assert(p.getAs[Long]("usable_pairs") == 45L)
    val anti = Seq.tabulate(10)(i =>
      ((i + 1).toDouble, true, (i + 1).toDouble)).toDF("dur", "ev", "s")
    assert(graft.model.Survival.concordanceIndex(anti, "dur", "ev", "s")
      .head().getAs[Double]("c_index") == 0.0)
    val const = Seq.tabulate(10)(i =>
      ((i + 1).toDouble, true, 7.0)).toDF("dur", "ev", "s")
    val c = graft.model.Survival.concordanceIndex(const, "dur", "ev", "s")
      .head()
    assert(c.getAs[Double]("c_index") == 0.5 &&
      c.getAs[Long]("tied") == 45L)
  }

  test("elo: winners climb, first-match exchange is exactly K/2") {
    import spark.implicits._
    val ms = Seq(
      graft.model.Preference.EloMatch("L", 1L, "a", "b"),
      graft.model.Preference.EloMatch("L", 2L, "a", "b"),
      graft.model.Preference.EloMatch("L", 3L, "b", "a")).toDS()
    val r = graft.model.Preference.eloTrajectory(ms).collect()
      .sortBy(_.ord)
    // equal ratings: E = 0.5, winner gains K(1-E) = 16
    assert(r(0).rWinner == 1016.0 && r(0).rLoser == 984.0)
    assert(r(1).rWinner > r(0).rWinner, "repeat winner keeps climbing")
    assert(r(1).rWinner - 1016.0 < 16.0,
      "a favored winner gains less than K/2")
    // stream twin parity row-for-row
    val s = graft.streaming.StreamScorers.eloStream(ms).collect()
      .sortBy(_.ord)
    assert(r.toSeq == s.toSeq)
  }

  test("coxPh: the early-dying group gets a positive log-hazard") {
    // x2=1 subjects die at 1..20, x2=0 at 21..40; x1 is pure noise
    val d = (Seq.tabulate(20)(i =>
      ((i + 1).toDouble, true, (i % 3).toDouble - 1.0, 1.0)) ++
      Seq.tabulate(20)(i =>
        ((21 + i).toDouble, true, (i % 3).toDouble - 1.0, 0.0)))
      .toDF("dur", "event", "x1", "x2")
    val r = graft.model.Survival.coxPh(d, "dur", "event",
      Seq("x1", "x2")).collect()
      .map(x => x.getAs[String]("covariate") -> x).toMap
    assert(r("x2").getAs[Double]("beta") > 0.5,
      "dying strictly earlier must mean a higher hazard")
    assert(r("x2").getAs[Double]("hazard_ratio") > 1.5)
    assert(r("x2").getAs[Double]("se") > 0.0)
    assert(math.abs(r("x1").getAs[Double]("z")) <
      r("x2").getAs[Double]("z"),
      "the noise covariate must be less significant")
  }

  test("k-center greedy: seeds at min id, then farthest-first, radii fall") {
    // a 1-D line: ids 0..4 at x = 0,1,2,3,100
    val line = vecs((0L, Seq(0f, 0f)), (1L, Seq(1f, 0f)), (2L, Seq(2f, 0f)),
      (3L, Seq(3f, 0f)), (4L, Seq(100f, 0f)))
    val r = Similarity.kCenterGreedy(line, "vec_id", "embedding", 3)
      .orderBy("rank").collect()
    assert(r(0).getAs[Long]("id") == 0L && r(0).getAs[Double]("radius") == 0.0)
    assert(r(1).getAs[Long]("id") == 4L, "farthest from the seed is x=100")
    assert(r(2).getAs[Long]("id") == 3L,
      "x=3 maximizes min-dist to centers {0, 100}")
    assert(r(1).getAs[Double]("radius") >= r(2).getAs[Double]("radius"))
  }
}
