package graft

import graft.model.{Assoc, Diagnostics, Spc}
import graft.seq.{StateSpace, Warp}
import org.apache.spark.sql.functions._

/** Round-8 SPC charts, diagnostic tests and state-space kernels:
  * hand-computed pins independent of the DuckDB oracle replay. */
class SpcDiagSpec extends SparkSpec {
  import spark.implicits._

  test("xbarR: two subgroups of 5, exact means/ranges and A2/D4 limits") {
    // key a: 1..10 → subgroups (1..5: x̄=3, R=4), (6..10: x̄=8, R=4)
    val df = (1 to 10).map(i => ("a", i.toLong, i.toDouble))
      .toDF("k", "ord", "v")
    val rows = Spc.xbarR(df, "k", "ord", "v", n = 5)
      .orderBy("sg").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("xbar") == 3.0)
    assert(rows(1).getAs[Double]("xbar") == 8.0)
    assert(rows.forall(_.getAs[Double]("r") == 4.0))
    // X̄̄ = 5.5, R̄ = 4 → limits 5.5 ± 2.308: BOTH subgroups are out
    // (3 < 3.192 and 8 > 7.808) — a two-level split is exactly what an
    // X̄ chart must flag
    assert(math.abs(rows(0).getAs[Double]("xbar_ucl") - 7.808) < 1e-9)
    assert(rows(0).getAs[Boolean]("out_x"))
    assert(rows(1).getAs[Boolean]("out_x"))
    // R̄-chart: both ranges equal R̄, inside [0, 2.114·4]
    assert(rows.forall(!_.getAs[Boolean]("out_r")))
  }

  test("westernElectric: spike trips r1, one-sided run trips r4") {
    // 12 small alternators then 8 consecutive high points
    val vals = Seq.fill(6)(Seq(-1.0, 1.0)).flatten ++ Seq.fill(8)(5.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
      .toDF("k", "ord", "v")
    val rows = Spc.westernElectric(df, "k", "ord", "v")
      .orderBy("seq").collect()
    // the 8th consecutive high point (seq 19) fires the run rule
    assert(rows.last.getAs[Boolean]("r4"))
    assert(!rows(18).getAs[Boolean]("r4")) // only 7 consecutive there
  }

  test("mcnemar: b=3, c=1 gives the continuity-corrected 0.25") {
    val df = (Seq.fill(3)((true, false)) ++ Seq((false, true)) ++
      Seq.fill(4)((true, true))).toDF("a", "b")
    val r = Diagnostics.mcnemar(df, "a", "b").head()
    assert(r.getAs[Long]("b") == 3L && r.getAs[Long]("c") == 1L)
    assert(r.getAs[Double]("mcnemar_stat") == 0.25) // (|3−1|−1)²/4
  }

  test("runsTest: alternation maximizes runs, monotone minimizes") {
    val alt = (0 until 20).map(i =>
      ("alt", i.toLong, if (i % 2 == 0) 1.0 else 5.0))
    val mono = (0 until 20).map(i => ("mono", i.toLong, i.toDouble))
    val rows = Diagnostics.runsTest((alt ++ mono).toDF("k", "ord", "v"),
      "k", "ord", "v").collect().map(r => r.getString(0) -> r).toMap
    assert(rows("alt").getAs[Long]("runs") == 20L)   // every step flips
    assert(rows("alt").getAs[Double]("z") > 3.0)
    assert(rows("mono").getAs[Long]("runs") == 2L)   // below-block, above-block
    assert(rows("mono").getAs[Double]("z") < -3.0)
  }

  test("cochranQ: hand case k=2, G=(3,1), L²Σ=6 gives Q=2") {
    val df = Seq(("b1", "t1", true), ("b1", "t2", false),
      ("b2", "t1", true), ("b2", "t2", false),
      ("b3", "t1", true), ("b3", "t2", true)).toDF("b", "t", "f")
    val r = Diagnostics.cochranQ(df, "b", "t", "f").head()
    assert(r.getAs[Long]("n_blocks") == 3L && r.getAs[Long]("k") == 2L)
    assert(r.getAs[Double]("q_stat") == 2.0)
  }

  test("dtw: aligned series cost 0; singleton vs pair accumulates") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("b", 1L, 1.0)).toDF("k", "ord", "v")
    val rows = Warp.dtwToReference(df, "k", "ord", "v",
      Array(1.0, 2.0, 3.0)).collect().map(r => r.key -> r).toMap
    assert(rows("a").dtw_dist == 0.0)
    // b = [1] vs [1,2,3]: cells |1−1|=0, 0+|1−2|=1, 1+|1−3|=3
    assert(rows("b").dtw_dist == 3.0)
    assert(rows("b").n == 1 && rows("b").m == 3)
  }

  test("kalman: constant series scores 0; spike scores dominate") {
    val base = (0 until 20).map(i => ("c", i.toLong, 10.0))
    val spiky = (0 until 20).map(i =>
      ("s", i.toLong, if (i == 15) 30.0 else 10.0 + (i % 3)))
    val rows = StateSpace.kalmanFilter((base ++ spiky).toDF("k", "o", "v"),
      Seq("k"), "o", "v").collect()
    assert(rows.filter(_.key == "c").forall(_.score == 0.0)) // r = 0 guard
    val s = rows.filter(_.key == "s").sortBy(_.seq)
    assert(s.map(_.score).max == s(15).score) // the spike wins
  }

  test("ewmaChart: sustained shift drives score past 1") {
    // 50 alternating baseline points, then a 10-point level shift: the
    // shift inflates the overall σ too (retrospective chart), so it must
    // be large relative to the alternation to trip the limit
    val vals = Seq.fill(25)(Seq(0.0, 1.0)).flatten ++ Seq.fill(10)(3.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
      .toDF("k", "o", "v")
    val rows = StateSpace.ewmaChart(df, Seq("k"), "o", "v")
      .collect().sortBy(_.seq)
    assert(rows.take(50).forall(_.score < 1.0)) // baseline in control
    assert(rows.last.score > 1.0)               // shift detected
  }

  test("crossCorrelation: a 2-bucket shift peaks at lag 2") {
    val x = (0 until 30).map(i => math.sin(i * 0.7) * 10)
    val a = x.zipWithIndex.map { case (v, t) => ("a", t.toLong, v) }
    // y_t = x_{t−2} → corr(x_t, y_{t+lag}) = 1 at lag 2
    val b = x.zipWithIndex.map { case (v, t) => ("b", t + 2L, v) }
    val rows = Assoc.crossCorrelation((a ++ b).toDF("k", "t", "v"),
      "k", "t", "v", "a", "b", maxLag = 3)
      .collect().map(r => r.getAs[Int]("lag") -> r.getAs[Double]("ccf"))
      .toMap
    assert(math.abs(rows(2) - 1.0) < 1e-9)
    assert(rows.filter(_._1 != 2).values.forall(_ < 0.99))
  }

  test("esd candidate rewrite: one-sided removals and duplicate ties") {
    import graft.multi.TailScores
    // all k outliers on ONE end: rounds must walk down 300→200→100,
    // exercising the 2k-per-end candidate margin
    val oneSide = ((1 to 40).map(i => ("a", i.toLong, 10.0 + (i % 3))) ++
      Seq(("a", 101L, 300.0), ("a", 102L, 200.0), ("a", 103L, 100.0)))
      .toDF("k", "id", "v")
    val r1 = TailScores.esd(oneSide, Seq("k"), "id", "v",
      maxOutliers = 3, critical = Seq(2.0, 2.0, 2.0))
      .orderBy("rnd").collect()
    assert(r1.map(_.getAs[Long]("removed_id")).toSeq == Seq(101L, 102L, 103L))
    assert(r1.forall(_.getAs[String]("tag") == "O"))
    // duplicated extreme value: the smaller id is removed first
    val dup = ((1 to 40).map(i => ("a", i.toLong, 10.0)) ++
      Seq(("a", 201L, 99.0), ("a", 200L, 99.0)))
      .toDF("k", "id", "v")
    val r2 = TailScores.esd(dup, Seq("k"), "id", "v",
      maxOutliers = 2, critical = Seq(2.0, 2.0))
      .orderBy("rnd").collect()
    assert(r2.map(_.getAs[Long]("removed_id")).toSeq == Seq(200L, 201L))
  }

  test("stream twins equal their batch kernels row-for-row (sf0.001)") {
    Seq("q314_western_electric" -> "q353_we_stream",
      "q322_kalman" -> "q334_kalman_stream",
      "q328_ewma_chart" -> "q335_ewma_stream").foreach { case (b, s) =>
      val batch = graft.SparkEntry.queries(b)(spark, sfDir).collect().toSet
      val stream = graft.SparkEntry.queries(s)(spark, sfDir).collect().toSet
      assert(batch == stream, s"$b vs $s diverged")
    }
  }

  test("partialCorr: y=x gives r_xy=1; z-partialling is consistent") {
    val df = (1 to 50).map { i =>
      (i.toDouble, i * 2.0 + (i % 5), (i % 7).toDouble)
    }.toDF("x", "y", "z")
    val r = Assoc.partialCorr(df, "x", "y", "z").head()
    val rxy = r.getAs[Double]("r_xy"); val rxz = r.getAs[Double]("r_xz")
    val ryz = r.getAs[Double]("r_yz"); val p = r.getAs[Double]("partial")
    val expect = (rxy - rxz * ryz) /
      math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    assert(math.abs(p - expect) < 1e-12)
    assert(rxy > 0.99) // y is nearly linear in x
  }
}
