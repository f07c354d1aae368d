package graft

import graft.model.GroupTests
import graft.multi.TailScores
import graft.post.PostOps
import graft.seq.Trend
import org.apache.spark.sql.functions._

/** Trend detectors (Mann–Kendall, Theil–Sen), group-difference tests
  * (ANOVA F, Kruskal–Wallis, Brown–Forsythe) and the EVT
  * peaks-over-threshold GPD scorer — kernel behaviors the DuckDB oracle
  * replay can't pin (known-direction recovery, hand-computed stats,
  * degenerate-key tags). */
class TrendStatsSpec extends SparkSpec {
  import spark.implicits._

  test("mann-kendall: strictly rising sequence has S = m(m-1)/2, rising tag") {
    val df = (1 to 50).map(i => ("k", i.toLong, i.toDouble))
      .toDF("g", "seq", "v")
    val r = Trend.mannKendall(df, Seq("g"), "seq", "v", maxPoints = 50)
      .collect()(0)
    assert(r.getAs[Long]("n_used") == 50L)
    assert(r.getAs[Long]("s_stat") == 50L * 49 / 2)
    assert(r.getAs[String]("trend") == "rising")
    // falling mirror
    val f = Trend.mannKendall(
      (1 to 50).map(i => ("k", i.toLong, -i.toDouble)).toDF("g", "seq", "v"),
      Seq("g"), "seq", "v", maxPoints = 50).collect()(0)
    assert(f.getAs[Long]("s_stat") == -(50L * 49 / 2))
    assert(f.getAs[String]("trend") == "falling")
  }

  test("mann-kendall: constant sequence is all ties — S=0, varS=0-safe, none") {
    val df = (1 to 20).map(i => ("k", i.toLong, 7.5)).toDF("g", "seq", "v")
    val r = Trend.mannKendall(df, Seq("g"), "seq", "v", maxPoints = 20)
      .collect()(0)
    assert(r.getAs[Long]("s_stat") == 0L)
    assert(r.getAs[Double]("var_s") == 0.0) // full tie group cancels n-term
    assert(r.getAs[String]("trend") == "none")
  }

  test("mann-kendall: stride caps pairs — n_used <= maxPoints") {
    val df = (1 to 1000).map(i => ("k", i.toLong, math.sin(i.toDouble)))
      .toDF("g", "seq", "v")
    val r = Trend.mannKendall(df, Seq("g"), "seq", "v", maxPoints = 40)
      .collect()(0)
    assert(r.getAs[Long]("n_used") <= 40L)
  }

  test("theil-sen: exact line y = 3x + 2 recovers slope and intercept") {
    val df = (1 to 30).map(i => ("k", i.toLong, 3.0 * i + 2.0))
      .toDF("g", "seq", "v")
    val r = Trend.theilSen(df, Seq("g"), "seq", "v", maxPoints = 30)
      .collect()(0)
    assert(math.abs(r.getAs[Double]("slope") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - 2.0) < 1e-9)
    assert(r.getAs[Long]("n_pairs") == 30L * 29 / 2)
  }

  test("theil-sen: one gross outlier does not move the slope (robustness)") {
    val pts = (1 to 29).map(i => ("k", i.toLong, 2.0 * i)) :+
      (("k", 30L, 500.0))
    val r = Trend.theilSen(pts.toDF("g", "seq", "v"), Seq("g"), "seq", "v",
      maxPoints = 30).collect()(0)
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 0.2,
      s"median slope shrugs off 1/30 contamination: $r")
  }

  test("anova: identical groups give F ~ 0; shifted group mean gives large F") {
    val same = (1 to 300).map(i =>
      (Seq("a", "b", "c")(i % 3), (i % 7).toDouble)).toDF("g", "v")
    val r0 = GroupTests.anovaF(same, "g", "v").collect()(0)
    assert(r0.getAs[Long]("k") == 3L && r0.getAs[Long]("n") == 300L)
    assert(r0.getAs[Double]("f_stat") < 0.05, s"no between-group signal: $r0")
    val shifted = same.withColumn("v",
      when(col("g") === "c", col("v") + 100.0).otherwise(col("v")))
    val r1 = GroupTests.anovaF(shifted, "g", "v").collect()(0)
    assert(r1.getAs[Double]("f_stat") > 1000.0, s"shifted mean: $r1")
  }

  test("anova: hand-computed 2x3 fixture") {
    // groups {2,4,6} and {8,10,12}: SSB = 54, SSW = 16, F = (54/1)/(16/4) = 13.5
    val df = Seq(("a", 2.0), ("a", 4.0), ("a", 6.0),
      ("b", 8.0), ("b", 10.0), ("b", 12.0)).toDF("g", "v")
    val r = GroupTests.anovaF(df, "g", "v").collect()(0)
    assert(math.abs(r.getAs[Double]("ss_between") - 54.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("ss_within") - 16.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("f_stat") - 13.5) < 1e-6)
  }

  test("kruskal-wallis: identical distributions give H ~ 0; disjoint ranges max it") {
    val same = (1 to 300).map(i =>
      (Seq("a", "b", "c")(i % 3), (i % 11).toDouble)).toDF("g", "v")
    val h0 = GroupTests.kruskalWallis(same, "g", "v").collect()(0)
    assert(h0.getAs[Double]("h_stat") < 0.5, s"same dist: $h0")
    assert(h0.getAs[Double]("tie_correction") < 1.0) // ties present
    // a below b below c entirely: H near its (n-1)-ish ceiling
    val disj = (1 to 300).map { i =>
      val g = Seq("a", "b", "c")(i % 3)
      (g, (i % 3) * 1000.0 + i)
    }.toDF("g", "v")
    val h1 = GroupTests.kruskalWallis(disj, "g", "v").collect()(0)
    assert(h1.getAs[Double]("h_stat") > 250.0, s"disjoint ranks: $h1")
  }

  test("brown-forsythe: equal-variance groups low F; inflated-variance group high F") {
    val eq = (1 to 400).map(i =>
      (Seq("a", "b")(i % 2), ((i / 2) % 21 - 10).toDouble)).toDF("g", "v")
    val r0 = GroupTests.brownForsythe(eq, "g", "v").collect()(0)
    assert(r0.getAs[Double]("f_stat") < 0.5, s"same spread: $r0")
    val wide = eq.withColumn("v",
      when(col("g") === "b", col("v") * 10.0).otherwise(col("v")))
    val r1 = GroupTests.brownForsythe(wide, "g", "v").collect()(0)
    assert(r1.getAs[Double]("f_stat") > 100.0, s"10x spread in b: $r1")
  }

  test("pot-gpd: exceedances over u get positive scores, body scores 0") {
    val df = (1 to 500).map(i => ("k", i.toLong, (i % 100).toDouble))
      .toDF("g", "id", "v")
    val r = TailScores.potGpd(df, Seq("g"), "id", "v",
      tailFrac = 0.1, threshold = 5.0)
    assert(r.count() == 500L) // left joins keep every row
    val byTag = r.groupBy("tag").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(!byTag.contains("I"))
    val tail = r.where(col("score") > 0).select(min("v")).collect()(0)
      .getDouble(0)
    val u = r.select(max("u")).collect()(0).getDouble(0)
    assert(tail > u - 1e-9, "only values above u score")
  }

  test("pot-gpd: a huge spike is tagged O; tiny keys tag I, never dropped") {
    val base = (1 to 500).map(i => ("k", i.toLong, (i % 100).toDouble))
    val spike = ("k", 501L, 100000.0)
    val tiny = Seq(("t", 1L, 1.0), ("t", 2L, 2.0))
    val df = (base :+ spike) ++ tiny
    val r = TailScores.potGpd(df.toDF("g", "id", "v"), Seq("g"), "id", "v",
      tailFrac = 0.1, threshold = 5.0)
    val s = r.where(col("id") === 501L).collect()(0)
    assert(s.getAs[String]("tag") == "O", s"spike: $s")
    val t = r.where(col("g") === "t").collect()
    assert(t.length == 2 && t.forall(_.getAs[String]("tag") == "I"),
      "2-row key has no fit — 'I' per the tag contract")
  }

  test("hodges-lehmann: symmetric data gives the center; outlier-robust") {
    val df = (1 to 49).map(i => ("k", i.toLong, i.toDouble))
      .toDF("g", "seq", "v")
    val r = Trend.hodgesLehmann(df, Seq("g"), "seq", "v", maxPoints = 49)
      .collect()(0)
    assert(math.abs(r.getAs[Double]("hl") - 25.0) < 1e-9, s"center of 1..49: $r")
    assert(r.getAs[Long]("n_walsh") == 49L * 50 / 2)
    // one gross outlier: HL moves far less than the mean would
    val dirty = df.union(Seq(("k", 50L, 100000.0)).toDF("g", "seq", "v"))
    val r2 = Trend.hodgesLehmann(dirty, Seq("g"), "seq", "v", maxPoints = 50)
      .collect()(0)
    assert(math.abs(r2.getAs[Double]("hl") - 25.5) < 1.0,
      s"pseudo-median shrugs off 1/50 contamination: $r2")
  }

  test("effect sizes: zero for identical groups, signed and large for shifted") {
    val same = (1 to 400).map(i =>
      (Seq("a", "b")(i % 2), i.toLong, ((i / 2) % 20).toDouble))
      .toDF("g", "id", "v")
    val r0 = GroupTests.effectSizes(same, "g", "id", "v", maxPoints = 200)
      .collect()(0)
    assert(math.abs(r0.getAs[Double]("cohens_d")) < 0.05, s"same: $r0")
    assert(math.abs(r0.getAs[Double]("cliffs_delta")) < 0.1, s"same: $r0")
    val shifted = same.withColumn("v",
      when(col("g") === "a", col("v") + 100.0).otherwise(col("v")))
    val r1 = GroupTests.effectSizes(shifted, "g", "id", "v", maxPoints = 200)
      .collect()(0)
    assert(r1.getAs[Double]("cohens_d") > 5.0, s"a >> b: $r1")
    assert(r1.getAs[Double]("cliffs_delta") == 1.0,
      s"disjoint ranges: delta = 1: $r1")
  }

  test("spearman: monotone nonlinear coupling scores 1, pearson does not") {
    val df = (1 to 200).map { i =>
      val x = i.toDouble
      (x, math.exp(x / 20.0), -x * x)
    }.toDF("x", "y", "z")
    val sp = graft.model.Assoc.spearmanMatrix(df, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("corr")).toMap
    assert(math.abs(sp(("x", "y")) - 1.0) < 1e-9, s"monotone up: $sp")
    assert(math.abs(sp(("x", "z")) + 1.0) < 1e-9, s"monotone down: $sp")
    val pe = graft.model.Assoc.correlationMatrix(df, Seq("x", "y"))
      .collect()(0).getAs[Double]("corr")
    assert(pe < 0.95, s"pearson is fooled by the exponential: $pe")
  }

  test("shesd composition: a seasonal spike is found only after decomposition") {
    // strong 24-periodic signal + one injected point anomaly at seq 500
    val df = (1 to 960).map { i =>
      val seasonal = 50.0 * math.sin(2 * math.Pi * (i % 24) / 24.0)
      val v = if (i == 500) seasonal + 40.0 else seasonal
      ("k", i.toLong, v)
    }.toDF("g", "seq", "v")
    val sd = graft.seq.SeqOps.seasonalDecompose(df, Seq("g"), "seq", "v",
      period = 24).select(col("g"), col("seq"), col("resid"))
    val r = TailScores.esd(sd, Seq("g"), "seq", "resid", maxOutliers = 3,
      critical = Seq(3.5, 3.5, 3.5))
    val o = r.where(col("tag") === "O").select("removed_id").collect()
      .map(_.getLong(0))
    assert(o.contains(500L), s"the masked spike surfaces in resid: ${o.toSeq}")
    // raw ESD on v would NOT flag it (the spike is inside seasonal range)
    val raw = TailScores.esd(df, Seq("g"), "seq", "v", maxOutliers = 3,
      critical = Seq(3.5, 3.5, 3.5))
    assert(!raw.where(col("tag") === "O").select("removed_id").collect()
      .map(_.getLong(0)).contains(500L),
      "raw ESD misses the in-band spike — the decomposition earns its keep")
  }

  test("theils-u: determinism is directional where correlation is not") {
    // b = f(a) exactly (a determines b), but two a's share each b value →
    // knowing b does NOT pin a: U(B|A)=1, U(A|B)<1
    val df = (0 until 120).map { i =>
      val a = i % 12
      (s"a$a", s"b${a / 2}")
    }.toDF("a", "b")
    val r = graft.model.Assoc.theilsU(df, "a", "b").collect()(0)
    assert(math.abs(r.getAs[Double]("u_b_given_a") - 1.0) < 1e-6,
      s"A determines B: $r")
    assert(r.getAs[Double]("u_a_given_b") < 0.9, s"B does not pin A: $r")
  }

  test("kendall tau-b: monotone +1, reversed -1, independent ~0") {
    val up = (1 to 400).map(i => (i.toLong, i.toDouble, i * 2.0 + 1))
      .toDF("id", "x", "y")
    val r1 = graft.model.Assoc.kendallTau(up, "id", "x", "y", 300)
      .collect()(0)
    assert(r1.getAs[Double]("tau_b") == 1.0, s"monotone: $r1")
    val down = up.withColumn("y", -col("y"))
    val r2 = graft.model.Assoc.kendallTau(down, "id", "x", "y", 300)
      .collect()(0)
    assert(r2.getAs[Double]("tau_b") == -1.0, s"reversed: $r2")
    val ind = (1 to 400).map(i =>
      (i.toLong, (i % 20).toDouble, ((i * 7) % 13).toDouble))
      .toDF("id", "x", "y")
    val r3 = graft.model.Assoc.kendallTau(ind, "id", "x", "y", 300)
      .collect()(0)
    assert(math.abs(r3.getAs[Double]("tau_b")) < 0.15, s"independent: $r3")
  }

  test("gini: equal values 0, one-owner extreme near 1") {
    val eq = (1 to 100).map(i => ("s", i.toLong, 10.0)).toDF("g", "id", "v")
    val r0 = PostOps.gini(eq, Seq("g"), "id", "v").collect()(0)
    assert(r0.getAs[Double]("gini") == 0.0, s"perfect equality: $r0")
    val one = ((1 to 99).map(i => ("s", i.toLong, 0.0)) :+
      (("s", 100L, 1000.0))).toDF("g", "id", "v")
    val r1 = PostOps.gini(one, Seq("g"), "id", "v").collect()(0)
    assert(r1.getAs[Double]("gini") > 0.98, s"one owner: $r1")
  }

  test("concentration: uniform shares → effective = k; monopoly → 1") {
    val uni = (1 to 400).map(i => "s" + (i % 8)).toDF("c")
    val r0 = PostOps.concentration(uni, "c").collect()(0)
    assert(math.abs(r0.getAs[Double]("effective") - 8.0) < 1e-9, s"$r0")
    val mono = ((1 to 396).map(_ => "big") ++ Seq("a", "b", "c", "d"))
      .toDF("c")
    val r1 = PostOps.concentration(mono, "c").collect()(0)
    assert(r1.getAs[Double]("hhi") > 0.97 &&
      r1.getAs[Double]("effective") < 1.03, s"monopoly: $r1")
    assert(r1.getAs[Long]("k") == 5L)
  }

  test("pot-gpd: deterministic across partition counts") {
    val df = (1 to 500).map(i =>
      ("k" + (i % 3), i.toLong, math.exp((i % 97) / 13.0))).toDF("g", "id", "v")
    val a = TailScores.potGpd(df.repartition(1), Seq("g"), "id", "v", 0.1, 5.0)
      .select("id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    val b = TailScores.potGpd(df.repartition(7), Seq("g"), "id", "v", 0.1, 5.0)
      .select("id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(a == b, "bit-identical scores regardless of partitioning")
  }
}
