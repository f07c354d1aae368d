package graft

import graft.multi.OutlierFaces
import graft.sim.ClusterValidity
import org.apache.spark.sql.functions._

/** Round-11 wave A: the no-pair-join outlier canon (ECOD, LODA,
  * truncated-KDE, Chauvenet) + k-means validity indices. */
class Wave11Spec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  // 2-D: a tight grid of 9 inliers + one far outlier
  private val cloud = vecs(
    (Seq.tabulate(9)(i =>
      (i.toLong, Seq((i % 3).toFloat, (i / 3).toFloat))) :+
      (99L, Seq(40.0f, 40.0f))): _*)

  test("ECOD: extreme point maxes every tail aggregate, greatest holds") {
    val r = OutlierFaces.ecod(cloud, "vec_id", "embedding")
      .collect().map(x => x.getAs[Long]("vec_id") -> x).toMap
    val far = r(99L).getAs[Double]("ecod")
    assert(far == r.values.map(_.getAs[Double]("ecod")).max)
    // at the top of both dims the right tail is 1/10 per dim
    assert(math.abs(r(99L).getAs[Double]("o_right") -
      2.0 * math.log(10.0)) < 1e-6)
    r.values.foreach { row =>
      val g = math.max(row.getAs[Double]("o_left"),
        math.max(row.getAs[Double]("o_right"), row.getAs[Double]("o_auto")))
      assert(math.abs(row.getAs[Double]("ecod") - g) < 1e-12)
    }
  }

  test("LODA: isolated point lands in rare bins -> top score") {
    // a dense cluster (all inside one histogram bin on every
    // projection) + one far ASYMMETRIC outlier, so both (+,+)- and
    // (+,−)-signed projections separate it
    val dense = vecs(((0 until 100).map(i =>
      (i.toLong, Seq(i * 0.005f, i * 0.003f))) :+
      (999L, Seq(40.0f, -40.0f))): _*)
    val r = OutlierFaces.loda(dense, "vec_id", "embedding", dim = 2,
      nProj = 4, nBins = 8)
      .collect().map(x => x.getAs[Long]("vec_id") -> x.getAs[Double]("loda"))
      .toMap
    assert(r(999L) == r.values.max)
    // inliers share a ~101/101 bin (term ≈ 0.01); the outlier is a
    // singleton (−ln(1/101) ≈ 4.6) on every discriminating projection
    assert(r(999L) > r.filterKeys(_ != 999L).values.max + 0.5)
  }

  test("KDE: dense value has high density, isolated value low") {
    val data = (Seq.fill(50)(10.0) ++ Seq.fill(50)(10.1) ++ Seq(99.0))
      .zipWithIndex.map { case (v, i) => (i.toLong, "a", v) }
      .toDF("id", "k", "v")
    val r = OutlierFaces.kdeOutlier(data, Seq("k"), "v", h = 0.5)
      .collect().map(x => x.getAs[Double]("value") -> x).toMap
    assert(r(99.0).getAs[Double]("kde_score") >
      r(10.0).getAs[Double]("kde_score") + 3.0)
    // isolated value: only its own count in range -> density =
    // 1/(n·h·√2π)
    val d99 = r(99.0).getAs[Double]("density")
    assert(math.abs(d99 - 1.0 / (101.0 * 0.5 * math.sqrt(2 * math.Pi)))
      < 1e-9)
    // truncation: contributions beyond cut·h = 2.0 are absent
    assert(r(10.0).getAs[Long]("n") == 101L)
  }

  test("Chauvenet: gross outlier rejected, bulk kept") {
    val data = ((1 to 40).map(i => (i.toLong, "a", (i % 5).toDouble)) :+
      (99L, "a", 1000.0)).toDF("id", "k", "v")
    val r = OutlierFaces.chauvenet(data, Seq("k"), "id", "v")
      .collect().map(x => x.getAs[Long]("id") -> x).toMap
    assert(r(99L).getAs[Boolean]("reject"))
    assert((1 to 40).forall(i => !r(i.toLong).getAs[Boolean]("reject")))
    assert(r(99L).getAs[Double]("p_tail") < 1e-6)
  }

  test("mSPRT: real lift decides, null effect keeps p at 1") {
    val lift = (1 to 400).map(i => (1L, i.toLong, 0.0, 1.0))
      .toDF("g", "o", "a", "b")
    val r = graft.model.Experiment.msprt(lift, "g", "o", "a", "b",
      sigma2 = 1.0, tau2 = 0.1).orderBy("t").collect()
    assert(r.last.getAs[Boolean]("decided"))
    assert(r.last.getAs[Double]("p_always") < 0.001)
    // p_always is non-increasing (always-valid process)
    val ps = r.map(_.getAs[Double]("p_always"))
    assert(ps.zip(ps.tail).forall { case (x, y) => y <= x + 1e-12 })
    val nul = (1 to 400).map(i =>
      (1L, i.toLong, 0.0, if (i % 2 == 0) 0.1 else -0.1))
      .toDF("g", "o", "a", "b")
    val r0 = graft.model.Experiment.msprt(nul, "g", "o", "a", "b",
      sigma2 = 1.0, tau2 = 0.1).orderBy("t").collect()
    assert(!r0.last.getAs[Boolean]("decided"))
    assert(r0.last.getAs[Double]("p_always") == 1.0)
  }

  test("Bayesian A/B: dominant arm near 1, symmetric arms at 0.5") {
    val d = ((1 to 200).map(i => (1L, "A", i <= 40)) ++
      (1 to 200).map(i => (1L, "B", i <= 160)))
      .zipWithIndex.map { case ((g, a, s), i) => (g, a, s, i.toLong) }
      .toDF("g", "arm", "s", "id")
    val r = graft.model.Experiment.bayesianAb(d, Seq("g"), "arm",
      col("s")).collect()(0)
    assert(r.getAs[Double]("p_b_beats_a") > 0.999)
    assert(math.abs(r.getAs[Double]("mu_b") - 161.0 / 202.0) < 1e-12)
    val sym = ((1 to 100).map(i => (1L, "A", i <= 50)) ++
      (1 to 100).map(i => (1L, "B", i <= 50)))
      .zipWithIndex.map { case ((g, a, s), i) => (g, a, s, i.toLong) }
      .toDF("g", "arm", "s", "id")
    val r2 = graft.model.Experiment.bayesianAb(sym, Seq("g"), "arm",
      col("s")).collect()(0)
    assert(math.abs(r2.getAs[Double]("p_b_beats_a") - 0.5) < 1e-7)
  }

  test("Diebold-Mariano: worse second forecast -> negative DM, small p") {
    // e1 small (alternating magnitude so d varies), e2 3x larger:
    // d = e1²−e2² < 0 every step
    val rows = (1 to 300).map { i =>
      val m = if (i % 2 == 0) 0.5 else 0.3
      (1L, i.toLong, m, 1.5)
    }.toDF("g", "o", "e1", "e2")
    val r = graft.model.Experiment.dieboldMariano(rows, "g", "o",
      "e1", "e2", h = 4).collect()(0)
    assert(math.abs(r.getAs[Double]("d_mean") -
      ((0.25 - 2.25) + (0.09 - 2.25)) / 2.0) < 1e-9)
    assert(r.getAs[Double]("dm_stat") < -5.0)
    assert(r.getAs[Double]("p_value") < 1e-6)
    // identical forecasts: d ≡ 0, lrv = 0 -> stat/p null
    val same = (1 to 50).map(i => (1L, i.toLong, 1.0, 1.0))
      .toDF("g", "o", "e1", "e2")
    val r2 = graft.model.Experiment.dieboldMariano(same, "g", "o",
      "e1", "e2", h = 4).collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("dm_stat")))
  }

  test("ABTT: rank-1 corpus — coef carries the signal, residual ~ 0") {
    // vectors = c_i * v for a fixed direction v (plus the mean): the
    // top PC is v, so removing it should leave ~nothing
    val v = Array(0.6f, 0.8f)
    val rows = (0 until 20).map(i =>
      (i.toLong, Seq(v(0) * (i + 1), v(1) * (i + 1)).map(_.toFloat)))
    val r = graft.sim.SimJoin.allButTop(vecs(rows: _*), "vec_id",
      "embedding", dim = 2, iters = 3).collect()
    r.foreach(row => assert(math.abs(row.getAs[Double]("res_norm")) < 0.01))
    // coefs are linear in i (centered): i=0 most negative, i=19 most
    val byId = r.map(x => x.getAs[Long]("vec_id") ->
      x.getAs[Double]("coef")).toMap
    assert(byId(0L) < byId(10L) && byId(10L) < byId(19L) ||
      byId(0L) > byId(10L) && byId(10L) > byId(19L))
    assert(math.abs(byId(19L) - byId(0L)) > 15.0)
  }

  test("eigenvector centrality: star center dominates at 1.0") {
    val e = (1 to 6).flatMap(i =>
      Seq((s"l$i", "hub"), ("hub", s"l$i"))).toDF("s", "d")
    val r = graft.graph.Graph.eigenvectorCentrality(e, "s", "d",
      iters = 5).collect()
      .map(x => x.getAs[String]("node") -> x.getAs[Double]("score")).toMap
    assert(r("hub") == 1.0)
    assert((1 to 6).forall(i => r(s"l$i") < 0.5))
  }

  test("SimRank: shared in-neighborhood beats disjoint") {
    // p1 -> a, p1 -> b (twins); p2 -> c (unrelated)
    val e = Seq(("p1", "a"), ("p1", "b"), ("p2", "c"), ("a", "p1"),
      ("c", "p2")).toDF("s", "d")
    val r = graft.graph.Graph.simRank(e, "s", "d", iters = 3)
      .collect().map(x => (x.getAs[String]("a"), x.getAs[String]("b")) ->
        x.getAs[Double]("simrank")).toMap
    // twins share the single in-neighbor p1: s = C = 0.8
    assert(math.abs(r(("a", "b")) - 0.8) < 1e-9)
    assert(!r.contains(("a", "c")) && !r.contains(("b", "c")))
  }

  test("PPMI: planted collocation scores positive and survives") {
    val docs = (1 to 30).map(i =>
      (i.toLong, "alpha beta filler" + i + " gamma delta noise" + i))
      .toDF("doc_id", "text")
    val r = graft.text.TextOps.ppmi(docs, "doc_id", "text",
      window = 2, minCount = 3)
      .collect().map(x => (x.getAs[String]("wa"), x.getAs[String]("wb")) ->
        x.getAs[Double]("ppmi")).toMap
    assert(r.contains(("alpha", "beta")))
    // alpha-beta co-occur every doc; the alpha-filler window pair
    // dilutes the marginal: ln(c·N/(m_a·m_b)) = ln(30·N/(m²)) ≈ 0.405
    assert(r(("alpha", "beta")) > 0.4)
    // fillerN tokens are unique -> never reach minCount
    assert(r.keys.forall { case (a, b) =>
      !a.startsWith("filler") && !b.startsWith("filler") })
  }

  test("AMS F2: merge is lossless, estimate brackets the exact moment") {
    import graft.model.Sketches
    // skewed stream: one heavy value (f=60) + 40 singletons
    val data = ((1 to 60).map(_ => (1L, "hot")) ++
      (1 to 40).map(i => (1L, s"u$i")))
      .zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
      .toDF("g", "v", "id")
    val direct = Sketches.amsF2Counters(data, Seq("g"), "v")
    val halves = Seq(0L, 1L).map(p =>
      Sketches.amsF2Counters(data.where(col("id") % 2 === p), Seq("g"), "v"))
    val merged = Sketches.amsF2Merge(halves, Seq("g"))
    // counters are integers and slices add: bit-exact merge
    assert(direct.join(merged.withColumnRenamed("c", "c2"), Seq("g", "_j"))
      .where(col("c") =!= col("c2")).count() == 0)
    val est = Sketches.amsF2Estimate(direct, Seq("g"))
      .collect()(0).getAs[Double]("f2_est")
    val exact = Sketches.f2Exact(data, Seq("g"), "v")
      .collect()(0).getAs[Long]("f2_exact")
    assert(exact == 60L * 60 + 40)
    // median-of-5-means lands within 3x either way on a heavy-hitter
    // stream (AMS variance is O(F2²/k))
    assert(est > exact / 3.0 && est < exact * 3.0)
  }

  test("DDSketch: relative-error guarantee holds, merge is lossless") {
    import graft.model.Sketches
    val vals = ((1 to 99).map(_.toDouble) ++ Seq(-50.0, 0.0))
    val data = vals.zipWithIndex.map { case (v, i) => (1L, v, i.toLong) }
      .toDF("g", "v", "id")
    val b = Sketches.ddsketchBuckets(data, Seq("g"), "v")
    val q = Sketches.ddsketchQuantiles(b, Seq("g"), Seq(0.5, 0.9))
      .collect().map(r => r.getAs[Double]("tau") -> r.getAs[Double]("est"))
      .toMap
    // n=101; rank(0.5) = 51 -> sorted value 49.0 (after -50 and 0);
    // rank(0.9) = 91 -> 89.0; guarantee: |est-x|/x <= 0.0099
    assert(math.abs(q(0.5) - 49.0) / 49.0 < 0.01)
    assert(math.abs(q(0.9) - 89.0) / 89.0 < 0.01)
    val halves = Seq(0L, 1L).map(p =>
      Sketches.ddsketchBuckets(data.where(col("id") % 2 === p),
        Seq("g"), "v"))
    val m = Sketches.ddsketchQuantiles(
      Sketches.ddsketchMerge(halves, Seq("g")), Seq("g"), Seq(0.5, 0.9))
      .collect().map(r => r.getAs[Double]("tau") -> r.getAs[Double]("est"))
      .toMap
    assert(m == q, "merged sketch answers bit-identically")
    // negative tail: tau=0 hits the mirrored bucket of -50
    val q0 = Sketches.ddsketchQuantiles(b, Seq("g"), Seq(0.0))
      .collect()(0).getAs[Double]("est")
    assert(math.abs(q0 - (-50.0)) / 50.0 < 0.01)
  }

  test("ddsketchStream: cross-batch state, final snapshot == batch op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.model.Sketches
    implicit val sc = spark.sqlContext
    val vals = (1 to 200).map(i => ("a", (i % 37) * 1.5 - 10.0))
    val in = MemoryStream[(String, Double)]
    val out = graft.streaming.StreamScorers.ddsketchStream(
      in.toDF().toDF("k", "v"), "k", "v", Seq(0.5, 0.9))
    val q = out.writeStream.format("memory").queryName("dds")
      .outputMode("append").start()
    val (b1, b2) = vals.splitAt(80)
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    val snaps = spark.table("dds").collect()
    q.stop()
    assert(snaps.length == 4, "2 taus x 2 batches")
    val last = snaps.filter(_.getAs[Long]("n") == 200)
      .map(r => r.getAs[Double]("tau") -> r.getAs[Double]("est")).toMap
    val batch = Sketches.ddsketchQuantiles(
      Sketches.ddsketchBuckets(vals.toDF("k", "v"), Seq("k"), "v"),
      Seq("k"), Seq(0.5, 0.9)).collect()
      .map(r => r.getAs[Double]("tau") -> r.getAs[Double]("est")).toMap
    assert(last == batch, "bucket counts are linear: exact parity")
  }

  test("msprtStream: cross-batch trajectory == batch rows exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val rows = (1 to 100).map(i =>
      ("a", i.toLong, 0.0, if (i % 3 == 0) 0.4 else -0.1))
    val in = MemoryStream[(String, Long, Double, Double)]
    val out = graft.streaming.StreamScorers.msprtStream(
      in.toDF().toDF("k", "o", "a", "b"), "k", "o", "a", "b",
      sigma2 = 1.0, tau2 = 0.1)
    val q = out.writeStream.format("memory").queryName("msp")
      .outputMode("append").start()
    val (b1, b2) = rows.splitAt(40)
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    val got = spark.table("msp").collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Double]("log_lambda"),
        r.getAs[Double]("p_always"))).sortBy(_._1)
    q.stop()
    val exp = graft.model.Experiment.msprt(rows.toDF("k", "o", "a", "b"),
      "k", "o", "a", "b", sigma2 = 1.0, tau2 = 0.1).collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Double]("log_lambda"),
        r.getAs[Double]("p_always"))).sortBy(_._1)
    assert(got.length == 100)
    assert(got.sameElements(exp), "row-for-row bit parity across the split")
  }

  test("unigram divergence: clone source ~ 0, alien source large") {
    val base = (1 to 40).map(i =>
      (i.toLong, "common", "alpha beta gamma delta epsilon zeta"))
    val alien = (41 to 60).map(i =>
      (i.toLong, "alien", "xx yy zz qq ww vv"))
    val docs = (base ++ alien).toDF("doc_id", "source", "text")
    val r = graft.text.TextOps.unigramDivergence(docs, "source", "text",
      topV = 16).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Double]("kl"), x.getAs[Double]("js"))).toMap
    assert(r("alien")._1 > r("common")._1 + 0.3,
      "alien tokens diverge from the corpus mix")
    assert(r("alien")._2 > r("common")._2)
    assert(r.values.forall(v => v._2 >= 0 && v._2 <= math.log(2.0) + 1e-9),
      "JS bounded by ln 2")
  }

  test("quantile regression: flat data at tau=0.9 fits near the P90") {
    // y in {0..9} uniform per x: the 0.9-quantile line is flat ~ 9
    val rows = (0 until 1000).map(i => (i % 4, (i % 10).toDouble))
      .map { case (x, y) => (x.toDouble, y) }.toDF("x", "y")
    val r = graft.model.Assoc.quantileRegFit(rows, "x", "y",
      tau = 0.9, iters = 120, lr = 2.0).collect()(0)
    val a = r.getAs[Double]("a"); val b = r.getAs[Double]("b")
    // intercept + slope·mean-x should sit between 8 and 9 (P90 of 0..9)
    val at = a + b * 1.5
    assert(at > 7.5 && at < 9.5, s"fit level $at")
    assert(math.abs(b) < 0.5, "no real slope in x")
    assert(r.getAs[Double]("pinball") < 1.0)
  }

  test("positivity overlap: matched supports ~ 1, disjoint ~ 0") {
    // consecutive pairs (t, c) share the same propensity bin
    val matched = (0 until 400).map { i =>
      (i.toLong, i % 2 == 0, ((i / 2) % 20) / 20.0 + 0.025) }
      .toDF("id", "t", "p")
    val r1 = graft.model.Causal.positivityOverlap(matched, "t", "p")
      .collect()(0)
    assert(r1.getAs[Double]("overlap") > 0.99)
    val disjoint = ((0 until 100).map(i => (i.toLong, true, 0.8 + (i % 10) * 0.01)) ++
      (100 until 200).map(i => (i.toLong, false, 0.1 + (i % 10) * 0.01)))
      .toDF("id", "t", "p")
    val r2 = graft.model.Causal.positivityOverlap(disjoint, "t", "p")
      .collect()(0)
    assert(r2.getAs[Double]("overlap") == 0.0)
    assert(r2.getAs[Double]("t_min") > r2.getAs[Double]("c_max"))
  }

  test("trimmed/winsorized means: outliers neutralized exactly") {
    // 1..10 plus two gross outliers; alpha=0.1 over n=12 trims 1/side
    val data = ((1 to 10).map(_.toDouble) ++ Seq(-1000.0, 1000.0))
      .zipWithIndex.map { case (v, i) => (i.toLong, "a", v) }
      .toDF("id", "k", "v")
    val r = graft.model.Fitters.trimmedStats(data, Seq("k"), "v", 0.1)
      .collect()(0)
    assert(r.getAs[Long]("n_trim") == 1L)
    // trimmed keeps 1..10 -> mean 5.5
    assert(r.getAs[Double]("trimmed_mean") == 5.5)
    // winsorized clamps -1000 -> 1 and 1000 -> 10: (55 + 1 + 10)/12
    assert(math.abs(r.getAs[Double]("winsor_mean") - 66.0 / 12.0) < 1e-9)
  }

  test("Poisson GLM recovers a planted rate ratio") {
    // centered design x in {-1,0,1} (decorrelates slope/intercept so
    // fixed-lr GD converges): rate = 2^(x+1) -> b = ln 2, a = ln 2
    val rows = (0 until 900).map { i =>
      val x = i % 3 - 1
      (x.toDouble, math.pow(2.0, x + 1.0))
    }.toDF("x", "y")
    val r = graft.model.Assoc.poissonRegFit(rows, "x", "y",
      iters = 200, lr = 0.3).collect()(0)
    assert(math.abs(r.getAs[Double]("b") - math.log(2.0)) < 0.05)
    assert(math.abs(r.getAs[Double]("a") - math.log(2.0)) < 0.05)
    assert(math.abs(r.getAs[Double]("mean_mu") - 7.0 / 3.0) < 0.1)
  }

  test("matryoshka audit: prefix distance ratio in (0, 1], full prefix = 1") {
    val rows = (0 until 40).map(i =>
      (i.toLong * 10, Seq.tabulate(8)(j => ((i + j) % 5).toFloat)))
      .toDF("vec_id", "embedding")
    val half = graft.sim.SimJoin.matryoshkaAudit(rows, "vec_id",
      "embedding", prefixDim = 4, sampleMod = 10).collect()(0)
    assert(half.getAs[Double]("max_ratio") <= 1.0 + 1e-12)
    assert(half.getAs[Double]("mean_ratio") > 0.0)
    val full = graft.sim.SimJoin.matryoshkaAudit(rows, "vec_id",
      "embedding", prefixDim = 8, sampleMod = 10).collect()(0)
    assert(full.getAs[Double]("mean_ratio") == 1.0)
    assert(full.getAs[Double]("min_ratio") == 1.0)
  }

  test("sBG fit recovers a planted geometric churn rate") {
    // curve generated FROM the sBG recursion at (a, b) = (1, 4):
    // the grid MLE must recover the generating parameters
    implicit val sp = spark
    val (ga, gb) = (1.0, 4.0)
    val ps = new Array[Double](9)
    ps(1) = ga / (ga + gb)
    (2 to 8).foreach(t => ps(t) = ps(t - 1) * (gb + t - 2) / (ga + gb + t - 1))
    val curve = (0 to 8).map { t =>
      val surv = 1.0 - ps.slice(1, t + 1).sum
      t -> math.round(100000.0 * surv)
    }
    val r = graft.model.Behavior.sbgFit(curve,
      (1 to 30).map(_ / 10.0), (1 to 60).map(_ / 10.0)).collect()(0)
    assert(r.getAs[Double]("a") == 1.0 && r.getAs[Double]("b") == 4.0,
      s"got (${r.getAs[Double]("a")}, ${r.getAs[Double]("b")})")
    assert(math.abs(r.getAs[Double]("s_end") -
      (1.0 - ps.slice(1, 9).sum)) < 0.01)
  }

  test("Cochran-Armitage: monotone dose-response detected, flat is not") {
    val mono = (0 until 4000).map { i =>
      val w = i % 4
      (1L, i.toLong, w.toLong, (i % 10) < (2 + 2 * w))
    }.toDF("g", "id", "w", "s")
    val r = graft.model.GroupTests.cochranArmitage(mono, Seq("g"), "w",
      col("s")).collect()(0)
    assert(r.getAs[Double]("z_stat") > 5.0)
    assert(r.getAs[Double]("p_value") < 1e-6)
    // success depends on i/4 parity only — independent of the w bucket
    val flat = (0 until 4000).map { i =>
      (1L, i.toLong, (i % 4).toLong, (i / 4) % 2 == 0) }
      .toDF("g", "id", "w", "s")
    val r2 = graft.model.GroupTests.cochranArmitage(flat, Seq("g"), "w",
      col("s")).collect()(0)
    assert(math.abs(r2.getAs[Double]("z_stat")) < 1.0)
  }

  test("Breusch-Pagan: fanning residuals flagged, homoskedastic not") {
    // |residual| grows with x (deterministic fan), mean stays linear
    val fan = (0 until 2000).map { i =>
      val x = (i % 50).toDouble
      val e = (if (i % 2 == 0) 1.0 else -1.0) * x * 0.2
      (1L, x, 2.0 + 0.5 * x + e)
    }.toDF("g", "x", "y")
    val r = graft.model.Assoc.breuschPagan(fan, "g", "x", "y")
      .collect()(0)
    assert(r.getAs[Double]("lm_stat") > 10.0)
    assert(r.getAs[Double]("p_value") < 0.01)
    val flat = (0 until 2000).map { i =>
      val x = (i % 50).toDouble
      val e = if (i % 2 == 0) 1.0 else -1.0
      (1L, x, 2.0 + 0.5 * x + e)
    }.toDF("g", "x", "y")
    val r2 = graft.model.Assoc.breuschPagan(flat, "g", "x", "y")
      .collect()(0)
    assert(r2.getAs[Double]("lm_stat") < 3.0)
  }

  test("Hodges-Lehmann: outlier-immune where the mean is not") {
    val data = ((1 to 99).map(_.toDouble) :+ 100000.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, "a", v) }
      .toDF("id", "k", "v")
    val r = graft.model.Fitters.hodgesLehmann(data, Seq("k"), "v",
      grain = 1).collect()(0)
    // pseudo-median of 1..99 + one wild point stays ~ 50.5
    assert(math.abs(r.getAs[Double]("hl") - 50.5) < 1.5)
    assert(r.getAs[Long]("n_pairs") == 100L * 101 / 2)
  }

  test("Chow: slope break across the split detected, stable line not") {
    // noisy slope break (finite F)
    val broken = (0 until 1000).map { i =>
      val x = (i % 100).toDouble
      val g = i % 2 == 0 // segment
      val e = if ((i / 2) % 2 == 0) 0.5 else -0.5
      (1L, x, (if (g) 1.0 + 0.2 * x else 1.0 + 1.5 * x) + e, g)
    }.toDF("g", "x", "y", "seg")
    val r = graft.model.Assoc.chowTest(broken, "g", "x", "y", col("seg"))
      .collect()(0)
    assert(r.getAs[Boolean]("break_significant"))
    assert(r.getAs[Double]("f_stat") > 100.0)
    // two PERFECT segment lines: SSR sum 0 -> null F, flag still fires
    val perfect = (0 until 400).map { i =>
      val x = (i % 100).toDouble
      val g = i % 2 == 0
      (1L, x, if (g) 1.0 + 0.2 * x else 1.0 + 1.5 * x, g)
    }.toDF("g", "x", "y", "seg")
    val rp = graft.model.Assoc.chowTest(perfect, "g", "x", "y",
      col("seg")).collect()(0)
    assert(rp.getAs[Boolean]("break_significant"))
    assert(rp.isNullAt(rp.fieldIndex("f_stat")))
    val stable = (0 until 1000).map { i =>
      val x = (i % 100).toDouble
      // noise keyed on i/2 parity: identical pattern in both segments
      (1L, x, 1.0 + 0.5 * x + (if ((i / 2) % 2 == 0) 0.3 else -0.1),
        i % 2 == 0)
    }.toDF("g", "x", "y", "seg")
    val r2 = graft.model.Assoc.chowTest(stable, "g", "x", "y", col("seg"))
      .collect()(0)
    assert(!r2.getAs[Boolean]("break_significant"))
  }

  test("validity indices: two far blobs at k=2 are clean") {
    val blobs = vecs((0 until 40).map { i =>
      val c = if (i % 2 == 0) 0.0f else 100.0f
      (i.toLong, Seq(c + (i % 5) * 0.1f, c + (i % 7) * 0.1f))
    }: _*)
    val r = ClusterValidity.kmeansValidity(blobs, "vec_id", "embedding",
      dim = 2, k = 2, iters = 4).collect()(0)
    assert(r.getAs[Double]("db_index") < 0.1, "tight far blobs: DB ~ 0")
    assert(r.getAs[Double]("dunn_index") > 10.0)
    assert(r.getAs[Double]("ch_index") > 1000.0)
    assert(r.getAs[Double]("b_inertia") > 100.0 * r.getAs[Double]("w_inertia"))
  }
}
