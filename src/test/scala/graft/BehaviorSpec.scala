package graft

import graft.model.{Behavior, Mixture}
import org.apache.spark.sql.functions._

/** Behavioral analytics (funnel, retention), deterministic sampling and
  * sketching (ES weighted sample, count-min), temperature mixing and the
  * unrolled-EM Gaussian mixture. */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  test("funnel: ordered steps are monotone and strictly time-ordered") {
    // u1 completes A->B->C in order; u2 does B before A (B must not
    // count); u3 only reaches A
    val ev = Seq(
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
      (2L, "B", 5L), (2L, "A", 10L), (2L, "C", 20L),
      (3L, "A", 10L)).toDF("u", "typ", "o")
    val f = Behavior.funnel(ev, "u", "typ", "o", Seq("A", "B", "C"))
      .orderBy("step_idx").collect()
    assert(f.map(_.getAs[Long]("users")).toSeq == Seq(3L, 1L, 1L),
      s"u2's early B must not count: ${f.mkString(";")}")
    assert(math.abs(f(2).getAs[Double]("conv") - 1.0 / 3) < 1e-9)
    // step counts can never increase
    assert(f.map(_.getAs[Long]("users")).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("retention: age-0 row equals cohort size, fractions bounded") {
    val ev = Seq((1L, 0L), (1L, 1L), (1L, 3L), (2L, 0L), (2L, 3L),
      (3L, 1L), (3L, 2L)).toDF("u", "day")
    val r = Behavior.retention(ev, "u", "day", maxAge = 30).collect()
    val a0 = r.filter(_.getAs[Long]("age") == 0L)
    assert(a0.forall(x =>
      x.getAs[Long]("users") == x.getAs[Long]("cohort_users")),
      "every user is active on their cohort day")
    assert(r.forall(x => x.getAs[Double]("frac") <= 1.0 + 1e-12))
    // cohort 0 (u1,u2) has both back at age 3
    val c0a3 = r.find(x => x.getAs[Long]("cohort") == 0L &&
      x.getAs[Long]("age") == 3L).get
    assert(c0a3.getAs[Long]("users") == 2L)
  }

  test("weighted sample: deterministic, capped at k, weight-sensitive") {
    val data = (1 to 200).map(i =>
      (i.toLong, if (i <= 100) 100.0 else 0.01, "g")).toDF("id", "w", "g")
    val s1 = Behavior.weightedSample(data, Seq("g"), "id", "w", 20)
    val rows = s1.collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 20L))
    // heavy ids (w=100, ids 1..100) should dominate the sample
    val heavy = rows.count(_.getAs[Long]("id") <= 100L)
    assert(heavy >= 18, s"heavy weights must dominate: $heavy/20")
    // replay-deterministic
    val again = Behavior.weightedSample(data, Seq("g"), "id", "w", 20)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(again == rows.map(_.getAs[Long]("id")).toSet)
  }

  test("count-min: estimate >= exact, exact on a collision-free sketch") {
    val data = (1 to 1000).map(i => s"item${i % 10}").toDF("item")
    val r = Behavior.countMinEstimate(data, "item", d = 4, w = 64, topK = 10)
      .collect()
    assert(r.length == 10)
    r.foreach { x =>
      assert(x.getAs[Long]("est") >= x.getAs[Long]("exact"),
        s"CM never underestimates: $x")
    }
    // 10 items in 4x64 registers: at least one row is collision-free,
    // so the min-estimate equals the exact count
    assert(r.forall(x => x.getAs[Long]("est") == x.getAs[Long]("exact")),
      "10 distinct items cannot collide in every one of 4 rows of 64")
  }

  test("temperature mix: alpha<1 lifts the tail, caps and budget hold") {
    val data = (1 to 1100).map(i =>
      if (i <= 1000) ("big", i) else ("small", i)).toDF("g", "i")
    val m = Behavior.temperatureMix(data, "g", alpha = 0.5, budget = 500L)
      .collect().map(r => r.getAs[String]("group") ->
        (r.getAs[Long]("n"), r.getAs[Long]("alloc"))).toMap
    val (nBig, aBig) = m("big"); val (nSmall, aSmall) = m("small")
    assert(aBig <= nBig && aSmall <= nSmall, "alloc never exceeds supply")
    assert(aBig + aSmall <= 500L, "allocation never exceeds the budget")
    // alpha=0.5: small share = sqrt(100)/(sqrt(1000)+sqrt(100)) = 0.240,
    // far above its raw 9% share — the tail is lifted
    assert(aSmall.toDouble / (aBig + aSmall) > 0.15,
      s"tail must be lifted: small=$aSmall big=$aBig")
  }

  test("isotonic calibration: pools violators, output is monotone") {
    // bin 0.0 rate 1.0 > bin 0.5 rate 0.0 — PAV pools both to 0.5
    val d = Seq((0.0, true), (0.0, true), (0.5, false), (0.5, false))
      .toDF("p", "y")
    val r = graft.model.Eval2.isotonicCalibration(d, "p", "y")
      .orderBy("score").collect()
    assert(r.forall(x => math.abs(x.getAs[Double]("iso") - 0.5) < 1e-9),
      s"pooled block averages to 1/2: ${r.mkString(";")}")
    // an already-monotone staircase is returned unchanged
    val ok = Seq((0.1, false), (0.1, false), (0.5, false), (0.5, true),
      (0.9, true), (0.9, true)).toDF("p", "y")
    val r2 = graft.model.Eval2.isotonicCalibration(ok, "p", "y")
      .orderBy("score").collect().map(_.getAs[Double]("iso"))
    assert(r2.sameElements(Array(0.0, 0.5, 1.0)))
    assert(r2.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("funnel timing: exact mean gap in seconds") {
    val ns = 1000000000L
    val ev = Seq(
      (1L, "A", 0L), (1L, "B", 10L * ns),
      (2L, "A", 0L), (2L, "B", 20L * ns),
      (3L, "A", 0L)).toDF("u", "typ", "o")
    val r = Behavior.funnelTiming(ev, "u", "typ", "o", Seq("A", "B"))
      .collect()(0)
    assert(r.getAs[Long]("users") == 2L)
    assert(math.abs(r.getAs[Double]("avg_gap_sec") - 15.0) < 1e-9)
  }

  test("vocab overlap: exact Jaccard between group vocabularies") {
    val d = Seq((1L, "g1", "a b c d"), (2L, "g2", "c d e f"),
      (3L, "g3", "x y z w")).toDF("id", "src", "t")
    val r = graft.text.TextOps.vocabOverlap(d, "src", "t").collect()
      .map(x => (x.getAs[String]("a"), x.getAs[String]("b")) -> x).toMap
    val p = r(("g1", "g2"))
    assert(p.getAs[Long]("inter") == 2L &&
      math.abs(p.getAs[Double]("jaccard") - 2.0 / 6) < 1e-9)
    // disjoint vocabularies produce no row (inner join on shared tokens)
    assert(!r.contains(("g1", "g3")) && !r.contains(("g2", "g3")))
  }

  test("stickiness: exact DAU/WAU arithmetic in one period") {
    val ev = Seq((1L, 0L), (2L, 0L), (1L, 1L)).toDF("u", "day")
    val r = Behavior.stickiness(ev, "u", "day", periodDays = 7).collect()(0)
    assert(r.getAs[Long]("days_active") == 2L && r.getAs[Long]("wau") == 2L)
    assert(math.abs(r.getAs[Double]("avg_dau") - 1.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("stickiness") - 0.75) < 1e-9)
  }

  test("hill tail: exact alpha on a tiny ordered tail") {
    val d = Seq((1L, "k", 8.0), (2L, "k", 4.0), (3L, "k", 2.0),
      (4L, "k", 1.0)).toDF("id", "key", "x")
    val r = graft.multi.TailScores.hillTail(d, Seq("key"), "id", "x", k = 2)
      .collect()(0)
    assert(math.abs(r.getAs[Double]("x_thresh") - 2.0) < 1e-9)
    val expect = 2.0 / (math.log(4.0) + math.log(2.0))
    assert(math.abs(r.getAs[Double]("alpha") - expect) < 1e-4,
      s"alpha = k / sum ln(x/x_thresh): $r")
  }

  test("neyman: zero-variance stratum gets zero budget") {
    val d = ((1 to 100).map(i => ("flat", 5.0)) ++
      (1 to 100).map(i => ("noisy", if (i % 2 == 0) 0.0 else 10.0)))
      .toDF("s", "x")
    val r = graft.model.Sampling.neymanAllocation(d, "s", "x", 50L)
      .collect().map(x => x.getAs[String]("stratum") -> x).toMap
    assert(r("flat").getAs[Long]("alloc") == 0L)
    assert(r("noisy").getAs[Long]("alloc") == 50L)
  }

  test("stratified split: exact 80/10/10 per stratum") {
    val d = (1 to 30).map(i => (i.toLong, if (i <= 10) "a" else "b"))
      .toDF("id", "g")
    val r = graft.model.Sampling.stratifiedSplit(d, "id", "g", 0.8, 0.1)
      .collect()
    val a = r.filter(_.getAs[String]("stratum") == "a")
      .groupBy(_.getAs[String]("split")).view.mapValues(_.length).toMap
    assert(a == Map("train" -> 8, "val" -> 1, "test" -> 1), s"$a")
    val b = r.filter(_.getAs[String]("stratum") == "b")
      .groupBy(_.getAs[String]("split")).view.mapValues(_.length).toMap
    assert(b == Map("train" -> 16, "val" -> 2, "test" -> 2), s"$b")
  }

  test("poisson bootstrap: zero SE on constant data, exact mean") {
    val d = (1 to 200).map(i => (i.toLong, "k", 7.5)).toDF("id", "key", "x")
    val r = graft.model.Sampling.poissonBootstrap(d, Seq("key"), "id", "x",
      b = 16).collect()(0)
    assert(math.abs(r.getAs[Double]("mean") - 7.5) < 1e-9)
    assert(r.getAs[Double]("se_boot") < 1e-9,
      s"constant data has zero resampling variance: $r")
  }

  test("rfm: quintile bands order correctly, segment composes digits") {
    // 5 users with strictly increasing frequency/monetary and strictly
    // decreasing recency -> user 5 is the 444, user 1 the 000
    val rows = (1 to 5).flatMap { u =>
      (1 to u).map(i => (u.toLong, (u * 10 + i).toLong, "purchase",
        u * 100.0))
    }
    val d = rows.toDF("u", "day", "typ", "v")
    val r = graft.model.Behavior.rfm(d, "u", "day", "typ", "v", "purchase")
      .collect().map(x => x.getAs[Long]("user") -> x).toMap
    assert(r(5L).getAs[Long]("segment") == 444L, s"${r(5L)}")
    assert(r(1L).getAs[Long]("segment") == 0L, s"${r(1L)}")
    assert(r(3L).getAs[Long]("recency") == 55L - 33L)
  }

  test("attribution: equal split over prior touches, self-credit when none") {
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 10L, "purchase"),                       // no prior touches
      (2L, 20L, "view"), (2L, 30L, "purchase")).toDF("u", "t", "typ")
    val r = graft.model.Behavior.linearAttribution(ev, "u", "t", "typ",
      "purchase").collect()
      .map(x => x.getAs[String]("channel") -> x).toMap
    // u1's purchase: 0.5 view + 0.5 click; u2 first purchase: self 1.0;
    // u2 second: 1.0 view
    assert(math.abs(r("view").getAs[Double]("credit") - 1.5) < 1e-6)
    assert(math.abs(r("click").getAs[Double]("credit") - 0.5) < 1e-6)
    assert(math.abs(r("purchase").getAs[Double]("credit") - 1.0) < 1e-6)
    val totalCredit = r.values.map(_.getAs[Double]("credit")).sum
    assert(math.abs(totalCredit - 3.0) < 1e-6,
      "credit mass equals the conversion count")
  }

  test("psmAtt: recovers the effect a naive diff-in-means overstates") {
    // confounded: high-x units are mostly treated AND have higher y;
    // true effect = +5. naive diff-in-means >> 5; matching on the
    // propensity (driven by x) pulls the estimate back.
    val units = (1 to 400).map { i =>
      val x = if (i % 2 == 0) 10.0 else 0.0
      val t = if (x > 5) i % 4 != 0 else i % 4 == 0   // 75% vs 25%
      val y = x * 3 + (if (t) 5.0 else 0.0) + (i % 5) * 0.1
      (i.toLong, x, t, y, 1.0, x / 10.0)
    }.toDF("uid", "x", "t", "y", "f0", "f1")
    val r = graft.model.Causal.psmAtt(units, "uid", "t", "y",
      Seq("f0", "f1")).collect()(0)
    val att = r.getAs[Double]("att")
    // naive difference in means for comparison
    val rows = units.collect()
    val mt = rows.filter(_.getAs[Boolean]("t")).map(_.getAs[Double]("y"))
    val mc = rows.filterNot(_.getAs[Boolean]("t")).map(_.getAs[Double]("y"))
    val naive = mt.sum / mt.length - mc.sum / mc.length
    assert(naive > 10.0, s"fixture must be confounded: naive=$naive")
    assert(math.abs(att - 5.0) < 1.0,
      s"matching must recover ~5 (naive=$naive): att=$att")
    assert(r.getAs[Double]("mean_match_dist") < 0.2)
  }

  test("uplift two-model: persuadables score above immovables") {
    // response: 20% base; +50% only when treated AND x high
    val units = (1 to 2000).map { i =>
      val x = if (i % 2 == 0) 1.0 else 0.0
      val t = i % 4 < 2
      val r = (i % 10) < 2 + (if (t && x > 0.5) 5 else 0)
      (i.toLong, t, r, 1.0, x)
    }.toDF("uid", "t", "r", "f0", "f1")
    val scored = graft.model.Causal.upliftTwoModel(units, "uid", "t", "r",
      Seq("f0", "f1"))
    val j = scored.join(units.select(col("uid"), col("f1"), col("t"),
      col("r")), "uid").collect()
    val hi = j.filter(_.getAs[Double]("f1") > 0.5)
      .map(_.getAs[Double]("uplift"))
    val lo = j.filter(_.getAs[Double]("f1") < 0.5)
      .map(_.getAs[Double]("uplift"))
    assert(hi.sum / hi.length > lo.sum / lo.length + 0.1,
      s"high-x units are the persuadables: ${hi.sum / hi.length} vs ${lo.sum / lo.length}")
    // qini: final cumulative value equals total incremental responders
    val q = graft.model.Causal.qiniTable(
      scored.join(units.select(col("uid"), col("t"), col("r")), "uid"),
      "t", "r", "uplift").orderBy("bin").collect()
    val last = q.last
    val rt = q.map(_.getAs[Long]("r_t")).sum
    val rc = q.map(_.getAs[Long]("r_c")).sum
    val nt = q.map(_.getAs[Long]("n_t")).sum
    val nc = q.map(_.getAs[Long]("n_c")).sum
    assert(math.abs(last.getAs[Double]("qini") -
      (rt - rc.toDouble * nt / nc)) < 1e-6)
    // a model that ranks persuadables first is steep early: the FIRST
    // occupied bin (two distinct scores -> two bins here) already
    // exceeds half the final value
    assert(q.head.getAs[Double]("qini") > last.getAs[Double]("qini") / 2,
      s"early bins must capture most uplift: ${q.map(_.getAs[Double]("qini")).mkString(",")}")
  }

  test("conformal interval: coverage honors the 1-alpha guarantee") {
    // uniform-ish deterministic values; intervals from the calibration
    // quantile must cover ~>= 90% of the test fold
    val d = (1 to 3000).map(i => (i.toLong, "k", (i % 97).toDouble))
      .toDF("id", "key", "v")
    val r = graft.post.PostOps.conformalInterval(d, Seq("key"), "id", "v",
      alpha = 0.1).collect()(0)
    assert(r.getAs[Double]("coverage") >= 0.85,
      s"finite-sample coverage: $r")
    assert(r.getAs[Double]("qhat") > 0)
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_calib") +
      r.getAs[Long]("n_test") == 3000L)
  }

  test("funnelStream: forward scan matches the declarative funnel") {
    import graft.streaming.StreamScorers.{TypedEvent, funnelStream}
    val ev = Seq(
      TypedEvent("u1", 10L, "A"), TypedEvent("u1", 20L, "B"),
      TypedEvent("u2", 5L, "B"), TypedEvent("u2", 10L, "A"),
      TypedEvent("u2", 20L, "B"),
      TypedEvent("u3", 10L, "A")).toDS()
    val out = funnelStream(ev, Seq("A", "B")).collect()
      .map(o => (o.entity, o.step_idx) -> o.t).toMap
    assert(out(("u1", 1L)) == 10L && out(("u1", 2L)) == 20L)
    // u2's early B must not count; the later one does
    assert(out(("u2", 2L)) == 20L)
    assert(!out.contains(("u3", 2L)))
    // step times strictly increase within an entity
    assert(out(("u2", 1L)) < out(("u2", 2L)))
  }

  test("gmm2: separates an obvious two-component mixture") {
    val xs = (1 to 300).map(i => ("k", if (i % 2 == 0) 0.0 + (i % 7) * 0.01
      else 10.0 + (i % 5) * 0.01)).toDF("k", "x")
    val g = Mixture.gmm2(xs, Seq("k"), "x", rounds = 5).collect()(0)
    val (mu1, mu2) = (g.getAs[Double]("mu1"), g.getAs[Double]("mu2"))
    assert(mu1 < 1.5 && mu2 > 8.5 && mu2 - mu1 > 7.0,
      s"means must land on the two modes: $mu1 / $mu2")
    val pi = g.getAs[Double]("pi")
    assert(pi > 0.3 && pi < 0.7, s"balanced mixture: pi=$pi")
    assert(g.getAs[Double]("v1") > 0 && g.getAs[Double]("v2") > 0)
  }
}
