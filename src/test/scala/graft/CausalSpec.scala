package graft

import graft.model.{Causal, Profiler, Survival, Tests2}
import graft.sim.SimJoin
import org.apache.spark.sql.functions._

/** RMST/Gehan, causal estimators, privacy detail views, MMD, Fisher. */
class CausalSpec extends SparkSpec {
  import spark.implicits._

  test("rmst: no events before tau integrates to tau") {
    // all subjects censored at 100 → S(t) = 1 through τ=20
    val subj = (0 until 50).map(i => (100L, false)).toDF("dur", "event")
    val r = Survival.rmst(subj, "dur", "event", 20L).collect()(0)
    assert(r.getAs[Double]("rmst") == 20.0, s"$r")
    // everyone dies at t=10 → area = 10
    val subj2 = (0 until 50).map(i => (10L, true)).toDF("dur", "event")
    val r2 = Survival.rmst(subj2, "dur", "event", 20L).collect()(0)
    assert(r2.getAs[Double]("rmst") == 10.0, s"$r2")
  }

  test("gehan log-rank: identical groups score ~0, shifted groups high") {
    val same = (0 until 100).map(i =>
      ((i % 10 + 1).toLong, true, if ((i / 10) % 2 == 0) "a" else "b"))
      .toDF("dur", "event", "grp")
    val r = Survival.gehanLogRank(same, "dur", "event", "grp", "a", "b")
      .collect()(0)
    assert(r.getAs[Double]("chi2") < 0.1, s"$r")
    val shift = (0 until 100).map(i =>
      (if ((i / 10) % 2 == 0) (i % 10 + 1).toLong else (i % 10 + 20).toLong,
        true, if ((i / 10) % 2 == 0) "a" else "b")).toDF("dur", "event", "grp")
    assert(Survival.gehanLogRank(shift, "dur", "event", "grp", "a", "b")
      .collect()(0).getAs[Double]("chi2") > 20.0)
  }

  test("diff-in-diff recovers a constructed treatment effect") {
    // control: 10 pre / 10 post; treated: 10 pre / 17 post (+5 effect
    // on top of the +2 common time trend)
    val rows = (0 until 400).map { i =>
      val t = i % 2 == 0; val p = (i / 2) % 2 == 0
      val noise = (i % 7).toDouble / 10
      val y = 10.0 + (if (p) 2.0 else 0.0) +
        (if (t && p) 5.0 else 0.0) + noise
      (t, p, y)
    }
    val r = Causal.diffInDiff(rows.toDF("t", "p", "y"), "t", "p", "y")
      .collect()(0)
    assert(math.abs(r.getAs[Double]("did") - 5.0) < 0.01, s"$r")
    assert(r.getAs[Double]("t_stat") > 20.0)
  }

  test("post-stratified ATE recovers a constant effect") {
    val rows = (0 until 600).map { i =>
      val s = s"s${i % 3}"; val t = (i / 3) % 2 == 0
      (s, t, (i % 3) * 10.0 + (if (t) 4.0 else 0.0) + (i % 5) * 0.1)
    }
    val r = Causal.postStratATE(rows.toDF("s", "t", "y"), "s", "t", "y")
      .collect()(0)
    assert(math.abs(r.getAs[Double]("ate") - 4.0) < 0.05, s"$r")
  }

  test("delta ratio CI covers the true ratio") {
    val rows = (0 until 500).map(i => ("k", 2.0 + (i % 3) * 0.1, 1.0))
    val r = Causal.deltaRatioCI(rows.toDF("k", "x", "y"), "k", "x", "y")
      .collect()(0)
    val ratio = r.getAs[Double]("ratio")
    assert(math.abs(ratio - 2.1) < 0.01)
    assert(r.getAs[Double]("lo") < ratio && ratio < r.getAs[Double]("hi"))
  }

  test("l-diversity and t-closeness detail views") {
    // group g0 has one sensitive value → l=1, entropy-l=1, max skew
    // g0 all one sensitive value; g1/g2 uniform over four
    val rows = (0 until 120).map { i =>
      val g = s"g${i % 3}"
      (g, if (g == "g0") 0L else ((i / 3) % 4).toLong)
    }
    val ld = Profiler.lDiversity(rows.toDF("g", "sv"), Seq("g"), "sv")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(ld("g0").getAs[Long]("l_distinct") == 1L)
    assert(math.abs(ld("g0").getAs[Double]("l_entropy") - 1.0) < 1e-9)
    assert(ld("g1").getAs[Long]("l_distinct") == 4L)
    val tc = Profiler.tCloseness(rows.toDF("g", "sv"), Seq("g"), "sv")
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("t_emd")).toMap
    // g0 (maximally skewed) = 1/3, the uniform groups = 1/6
    assert(tc("g0") > 1.5 * tc("g1"), s"$tc")
    assert(math.abs(tc("g0") - 1.0 / 3) < 1e-6, s"$tc")
  }

  test("mmd linear: identical distributions near 0, disjoint high") {
    def vecs(base: Float, tag: Boolean, offset: Int) =
      (0 until 100).map(i =>
        ((i * 2 + offset).toLong, Array(base + (i % 5) * 0.1f, 1.0f), tag))
    val same = (vecs(0f, false, 0) ++ vecs(0f, true, 1))
      .toDF("id", "v", "isB")
    val m1 = SimJoin.mmdLinear(same, "id", "v", "isB", 1.0).collect()(0)
    assert(math.abs(m1.getAs[Double]("mmd2")) < 0.05, s"$m1")
    val far = (vecs(0f, false, 0) ++ vecs(10f, true, 1))
      .toDF("id", "v", "isB")
    val m2 = SimJoin.mmdLinear(far, "id", "v", "isB", 1.0).collect()(0)
    assert(m2.getAs[Double]("mmd2") > 1.5, s"$m2")
  }

  test("fisher exact one-sided p on a hand table") {
    // 2x2: a=4 b=1 / c=1 d=4 → one-sided P(A>=4) = (C(5,4)C(5,1)
    //  + C(5,5)C(5,0)) / C(10,5) = 26/252
    val rows = Seq.fill(4)((true, true)) ++ Seq.fill(1)((true, false)) ++
      Seq.fill(1)((false, true)) ++ Seq.fill(4)((false, false))
    val r = Tests2.fisherExact(rows.toDF("e", "y"), "e", "y").collect()(0)
    assert(math.abs(r.getAs[Double]("p_one") - 26.0 / 252) < 1e-6, s"$r")
  }

  test("aalen-johansen: CIFs sum with censoring-free identity") {
    // no censoring, two causes: cif1(inf)+cif2(inf) = 1
    val subj = (0 until 100).map { i =>
      (((i % 10) + 1).toLong, i % 2 == 0, i % 2 == 1)
    }.toDF("dur", "c1", "c2")
    val rows = Survival.aalenJohansen(subj, "dur", "c1", "c2")
      .orderBy(col("t").desc).collect()
    val last = rows.head
    val tot = last.getAs[Double]("cif1") + last.getAs[Double]("cif2")
    assert(math.abs(tot - 1.0) < 1e-3, s"CIFs must exhaust: $last")
    assert(last.getAs[Double]("cif1") > 0.4 &&
      last.getAs[Double]("cif2") > 0.4)
  }

  test("overdispersion MoM: clustered defects flag overdispersed") {
    import graft.model.Fitters
    // 10 windows x 20 trials; defects all land in half the windows
    val rows = (0 until 200).map { i =>
      val win = (i / 20).toLong
      ("k", win, win % 2 == 0 && i % 2 == 0)
    }
    val r = Fitters.overdispersionMoM(rows.toDF("k", "w", "d"),
      "k", col("w"), col("d")).collect()(0)
    assert(r.getAs[Boolean]("overdispersed"), s"$r")
    assert(r.getAs[Double]("alpha") > 0 && r.getAs[Double]("nb_r") > 0)
    assert(math.abs(r.getAs[Double]("mean_rate") - 0.25) < 1e-9)
  }
}
