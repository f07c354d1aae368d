package graft

import graft.core._
import graft.model.Fitters
import graft.score.Scorers
import graft.score.Scorers.Cfg
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ScorersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tiny = Seq(
    ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 2.0), ("a", 100.0),
    ("b", 10.0), ("b", 10.0), ("b", 10.0)
  ).toDF("k", "x")

  test("stats fit: mean/std/count per key") {
    val m = Fitters.stats(tiny, Seq("k"), Seq("x")).where($"k" === "a").head()
    assert(math.abs(m.getAs[Double]("mean") - 21.6) < 1e-9)
    assert(m.getAs[Long]("cnt") == 5)
  }

  test("stats merge: per-slice models combine to the union's direct fit") {
    val all = (1 to 200).map(i => ("k", i * 0.7 + (i % 13))).toDF("k", "x")
    val sliceA = all.where($"x" * 10 % 3 === 0)
    val sliceB = all.except(sliceA)
    val direct = Fitters.stats(all, Seq("k"), Seq("x")).head()
    val merged = Fitters.statsMerge(Seq(
      Fitters.stats(sliceA, Seq("k"), Seq("x")),
      Fitters.stats(sliceB, Seq("k"), Seq("x"))), Seq("k")).head()
    assert(merged.getAs[Long]("cnt") == direct.getAs[Long]("cnt"))
    assert(math.abs(merged.getAs[Double]("mean") - direct.getAs[Double]("mean")) < 1e-9)
    assert(math.abs(merged.getAs[Double]("std") - direct.getAs[Double]("std")) < 1e-9)
    assert(merged.getAs[Double]("vmin") == direct.getAs[Double]("vmin"))
    assert(merged.getAs[Double]("vmax") == direct.getAs[Double]("vmax"))
    // a single-row slice has NULL/NaN std but zero M2 — must not poison
    val one = Seq(("k", 5.0)).toDF("k", "x")
    val m3 = Fitters.statsMerge(Seq(
      Fitters.stats(all, Seq("k"), Seq("x")),
      Fitters.stats(one, Seq("k"), Seq("x"))), Seq("k")).head()
    val d3 = Fitters.stats(all.union(one), Seq("k"), Seq("x")).head()
    assert(m3.getAs[Long]("cnt") == d3.getAs[Long]("cnt"))
    assert(math.abs(m3.getAs[Double]("std") - d3.getAs[Double]("std")) < 1e-9)
  }

  test("histogram merge: per-slice counts combine to the direct fit exactly") {
    val all = (1 to 300).map(i => ("k", (i % 47) * 1.7)).toDF("k", "x")
    // filter complement, not .except: except dedups and this fixture has
    // repeated rows
    val a = all.where($"x" < 40)
    val b = all.where(!($"x" < 40))
    def m(df: org.apache.spark.sql.DataFrame) =
      Fitters.histogram(df, Seq("k"), Seq(("x", 10.0)))
    val direct = Fitters.histogram(all, Seq("k"), Seq(("x", 10.0)))
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getDouble(3))).toMap
    val merged = Fitters.histogramMerge(Seq(m(a), m(b)), Seq("k"))
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(merged == direct) // counts are longs, freq same division: exact
  }

  test("kmv sketch: exact below k, within KMV error bound above, lossless merge") {
    // below k: the sketch IS the distinct set, estimate is exact
    val small = (1 to 40).map(i => ("k", s"v${i % 17}")).toDF("k", "v")
    val eSmall = Fitters.kmvEstimate(
      Fitters.kmvSketch(small, Seq("k"), "v", 64), Seq("k"), 64).head()
    assert(eSmall.getAs[Long]("sketch_n") == 17)
    assert(eSmall.getAs[Double]("est_distinct") == 17.0)
    // above k: (k-1)/theta estimator; rel. error concentrates ~1/sqrt(k)
    val big = (1 to 20000).map(i => ("k", s"value-${i % 5000}")).toDF("k", "v")
    val eBig = Fitters.kmvEstimate(
      Fitters.kmvSketch(big, Seq("k"), "v", 256), Seq("k"), 256).head()
    assert(eBig.getAs[Long]("sketch_n") == 256)
    val est = eBig.getAs[Double]("est_distinct")
    assert(math.abs(est - 5000.0) / 5000.0 < 0.25, s"est=$est")
    // merge of overlapping slice sketches == direct sketch of the union
    val a = big.where($"v".substr(7, 1).isin("1", "2", "3", "4", "5"))
    val b = big.where(!$"v".substr(7, 1).isin("1", "2")) // overlaps a on 3,4,5
    val direct = Fitters.kmvSketch(big, Seq("k"), "v", 256)
      .collect().map(r => (r.getAs[Long]("h"), r.getAs[Int]("rank"))).toSet
    val merged = Fitters.kmvMerge(Seq(
      Fitters.kmvSketch(a, Seq("k"), "v", 256),
      Fitters.kmvSketch(b, Seq("k"), "v", 256)), Seq("k"), 256)
      .collect().map(r => (r.getAs[Long]("h"), r.getAs[Int]("rank"))).toSet
    assert(merged == direct)
  }

  test("hll sketch: linear counting small, ~2%-class error large, lossless register merge") {
    // small range: zeros >> 0 → linear counting, tight for n << m
    val small = (1 to 400).map(i => ("k", s"v${i % 50}")).toDF("k", "v")
    val eSmall = Fitters.hllEstimate(
      Fitters.hllSketch(small, Seq("k"), "v", p = 9), Seq("k"), p = 9).head()
    val estSmall = eSmall.getAs[Double]("est_distinct")
    assert(math.abs(estSmall - 50.0) / 50.0 < 0.1, s"est=$estSmall")
    // large range: raw estimator; 1.04/sqrt(512) ~ 4.6% std error
    val big = (1 to 60000).map(i => ("k", s"value-${i % 20000}")).toDF("k", "v")
    val sketch = Fitters.hllSketch(big, Seq("k"), "v", p = 9)
    assert(sketch.count() <= 512, "register table must be bounded by m")
    val est = Fitters.hllEstimate(sketch, Seq("k"), p = 9)
      .head().getAs[Double]("est_distinct")
    assert(math.abs(est - 20000.0) / 20000.0 < 0.15, s"est=$est")
    // merge of overlapping slice sketches == direct registers of the union
    val a = big.where($"v".substr(7, 1).isin("1", "2", "3", "4", "5"))
    val b = big.where(!$"v".substr(7, 1).isin("1", "2"))
    val direct = sketch.collect()
      .map(r => r.getAs[Int]("bucket") -> r.getAs[Int]("reg")).toSet
    val merged = Fitters.hllMerge(Seq(
      Fitters.hllSketch(a, Seq("k"), "v", p = 9),
      Fitters.hllSketch(b, Seq("k"), "v", p = 9)), Seq("k")).collect()
      .map(r => r.getAs[Int]("bucket") -> r.getAs[Int]("reg")).toSet
    assert(merged == direct)
  }

  test("cms sketch: estimates upper-bound exact counts, exact when sparse, lossless merge") {
    val data = (1 to 3000).map(i => ("k", s"item-${i % 300}")).toDF("k", "v")
    val exact = data.groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val probes = data.select("k", "v").distinct()
    // wide sketch (collision-free w.h.p. for 300 items x 4 rows): exact
    val wide = Fitters.cmsEstimate(
      Fitters.cmsSketch(data, Seq("k"), "v", 4, 4096), probes, Seq("k"), "v", 4, 4096)
      .collect().map(r => r.getAs[String]("v") -> r.getAs[Long]("est_cnt")).toMap
    assert(wide == exact)
    // narrow sketch: never underestimates (the CMS guarantee)
    val narrow = Fitters.cmsEstimate(
      Fitters.cmsSketch(data, Seq("k"), "v", 4, 64), probes, Seq("k"), "v", 4, 64)
      .collect().map(r => r.getAs[String]("v") -> r.getAs[Long]("est_cnt")).toMap
    assert(narrow.forall { case (v, est) => est >= exact(v) })
    // sum-merge of disjoint slice sketches == direct sketch, row for row
    val a = data.where($"v".substr(6, 1) < "5")
    val b = data.where(!($"v".substr(6, 1) < "5"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Int]("j"), r.getAs[Long]("bucket"), r.getAs[Long]("cnt"))).toSet
    val direct = rows(Fitters.cmsSketch(data, Seq("k"), "v", 4, 64))
    val merged = rows(Fitters.cmsMerge(Seq(
      Fitters.cmsSketch(a, Seq("k"), "v", 4, 64),
      Fitters.cmsSketch(b, Seq("k"), "v", 4, 64)), Seq("k")))
    assert(merged == direct)
  }

  test("quantile sketch: exact below k, near-true above, lossless merge") {
    // below k: the sample IS the data, interpolated quantiles are exact
    val small = (1 to 100).map(i => ("k", i.toLong, i.toDouble)).toDF("k", "id", "x")
    val eSmall = Fitters.quantileSketchEstimate(
      Fitters.quantileSketch(small, Seq("k"), "id", "x", 256), Seq("k"),
      Seq(0.25, 0.5, 0.75)).head()
    assert(eSmall.getAs[Long]("sketch_n") == 100)
    assert(eSmall.getAs[Double]("p50") == 50.5) // (n-1)*0.5 interp over 1..100
    assert(eSmall.getAs[Double]("p25") == 25.75)
    // above k: uniform sample of 1..10000; sampling error ~ 1/sqrt(k)
    val big = (1 to 10000).map(i => ("k", i.toLong, i.toDouble)).toDF("k", "id", "x")
    val eBig = Fitters.quantileSketchEstimate(
      Fitters.quantileSketch(big, Seq("k"), "id", "x", 400), Seq("k"), Seq(0.5)).head()
    assert(eBig.getAs[Long]("sketch_n") == 400)
    val p50 = eBig.getAs[Double]("p50")
    assert(math.abs(p50 - 5000.0) / 10000.0 < 0.1, s"p50=$p50")
    // merge of overlapping slice sketches == direct sketch of the union
    val a = big.where($"id" <= 6000)
    val b = big.where($"id" > 4000) // overlaps a on 4001..6000
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("h"), r.getAs[Double]("value"), r.getAs[Int]("rank"))).toSet
    val direct = rows(Fitters.quantileSketch(big, Seq("k"), "id", "x", 400))
    val merged = rows(Fitters.quantileSketchMerge(Seq(
      Fitters.quantileSketch(a, Seq("k"), "id", "x", 400),
      Fitters.quantileSketch(b, Seq("k"), "id", "x", 400)), Seq("k"), 400))
    assert(merged == direct)
  }

  test("cms join cardinality: exact when collision-free, upper bound, zero on disjoint keys") {
    val a = (1 to 2000).map(i => s"u${i % 100}").toDF("k") // 100 keys x 20
    val b = (1 to 300).map(i => s"u${i % 100}").toDF("k")  // 100 keys x 3
    val exact = a.join(b, "k").count() // 100 * 20 * 3 = 6000
    assert(exact == 6000L)
    def card(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame,
        width: Int) =
      Fitters.cmsJoinCard(
        Fitters.cmsSketch(x, Nil, "k", 4, width),
        Fitters.cmsSketch(y, Nil, "k", 4, width), Nil, 4)
        .head().getAs[Long]("est_pairs")
    // wide sketch: 100 keys over 4096 buckets — ~1 colliding pair per
    // row survives the min, so upper bound with small relative excess
    val wide = card(a, b, 4096)
    assert(wide >= exact && wide <= (exact * 1.05).toLong, s"wide=$wide")
    // narrow sketch: collisions only ADD cross terms — never underestimates
    assert(card(a, b, 32) >= exact)
    // disjoint key sets, wide sketch: some hash row has no shared
    // buckets (few keys -> overlap vanishingly unlikely) -> estimate 0
    val c = (1 to 300).map(i => s"w${i % 3}").toDF("k")
    assert(card(a, c, 4096) == 0L)
    // grouped sketches: one estimate per stratum, each upper-bounding
    // its stratum's exact join size
    val ga = (1 to 600).map(i => (s"g${i % 2}", s"u${i % 30}")).toDF("g", "k")
    val gb = (1 to 90).map(i => (s"g${i % 2}", s"u${i % 30}")).toDF("g", "k")
    val exactPer = ga.join(gb, Seq("g", "k")).groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val estPer = Fitters.cmsJoinCard(
      Fitters.cmsSketch(ga, Seq("g"), "k", 4, 4096),
      Fitters.cmsSketch(gb, Seq("g"), "k", 4, 4096), Seq("g"), 4)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est_pairs")).toMap
    assert(estPer.keySet == exactPer.keySet)
    exactPer.foreach { case (g, ex) =>
      assert(estPer(g) >= ex && estPer(g) <= (ex * 1.05).toLong, s"group $g") }
  }

  test("zscore: hand-computed score and O/N tags; zero-variance key -> I") {
    val stats = Fitters.stats(tiny, Seq("k"), Seq("x"))
    val out = Scorers.zscore(tiny, stats, Cfg(Seq("k"), Seq("x"), threshold = 1.5))
    val rows = out.collect()
    val a100 = rows.find(r => r.getAs[String]("k") == "a" && r.getAs[Double]("x") == 100.0).get
    // mean=21.6, std=sqrt(sum((x-21.6)^2)/4)=43.84... score=|100-21.6|/std
    val std = math.sqrt(Seq(1.0, 2.0, 3.0, 2.0, 100.0).map(v => math.pow(v - 21.6, 2)).sum / 4)
    assert(math.abs(a100.getAs[Double]("score") - 78.4 / std) < 1e-9)
    assert(a100.getAs[String]("tag") == "O")
    // key b has zero variance -> per-attr score skipped -> null score -> I
    assert(rows.filter(_.getAs[String]("k") == "b").forall(_.getAs[String]("tag") == "I"))
  }

  test("robust zscore: median/MAD") {
    val m = Fitters.robustStats(tiny, Seq("k"), Seq("x")).where($"k" === "a").head()
    assert(m.getAs[Double]("med") == 2.0)
    assert(m.getAs[Double]("mad") == 1.0) // |x-2| = 1,0,1,0,98 -> median 1
  }

  test("approx robust fit tracks exact on real data (sketch scale path)") {
    val data = core.table(spark, sfDir, "events")
    val exact = Fitters.robustStats(data, Seq("event_type"), Seq("value"))
      .collect().map(r => r.getString(0) -> (r.getAs[Double]("med"), r.getAs[Double]("mad"))).toMap
    val approx = Fitters.robustStatsApprox(data, Seq("event_type"), Seq("value"), 10000)
      .collect().map(r => r.getString(0) -> (r.getAs[Double]("med"), r.getAs[Double]("mad"))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (med, mad)) =>
      assert(math.abs(approx(k)._1 - med) <= 0.05 * math.max(mad, 1e-9), s"med@$k")
      assert(math.abs(approx(k)._2 - mad) <= 0.05 * math.max(mad, 1e-9), s"mad@$k")
    }
  }

  test("score aggregation strategies over multi-attr with missing skip") {
    val df = Seq((1.0, 5.0)).toDF("s1", "s2")
      .withColumn("avg", aggregateScores(Seq($"s1", $"s2")))
      .withColumn("mx", aggregateScores(Seq($"s1", $"s2"), "max"))
      .withColumn("med", aggregateScores(Seq($"s1", $"s2", lit(null).cast("double")), "median"))
      .withColumn("wavg", aggregateScores(Seq($"s1", $"s2"), "weightedAverage", Seq(3.0, 1.0)))
      .withColumn("nulls", aggregateScores(Seq(lit(null).cast("double"))))
    val r = df.head()
    assert(r.getAs[Double]("avg") == 3.0)
    assert(r.getAs[Double]("mx") == 5.0)
    assert(r.getAs[Double]("med") == 3.0)
    assert(r.getAs[Double]("wavg") == 2.0)
    assert(r.isNullAt(r.fieldIndex("nulls")))
  }

  test("expScale bounds score into [0,1)") {
    val r = Seq(0.0, 1.0, 100.0).toDF("x")
      .select(expScale(1.0, $"x").as("s")).collect().map(_.getDouble(0))
    assert(r(0) == 0.0 && r(1) > 0.6 && r(1) < 0.64 && r(2) > 0.999)
  }

  test("histogram fit frequencies sum to 1 per key") {
    val h = Fitters.histogram(tiny, Seq("k"), Seq(("x", 10.0)))
    val sums = h.groupBy("k").agg(sum("freq").as("s")).collect()
    assert(sums.forall(r => math.abs(r.getAs[Double]("s") - 1.0) < 1e-9))
  }

  test("iqr score zero inside band, positive outside") {
    val q = Fitters.quantiles(tiny, Seq("k"), Seq("x"))
    val out = Scorers.iqrScore(tiny, q, Cfg(Seq("k"), Seq("x"), threshold = 1.5))
    val a100 = out.where($"k" === "a" && $"x" === 100.0).head()
    assert(a100.getAs[Double]("score") > 1.5 && a100.getAs[String]("tag") == "O")
    val a2 = out.where($"k" === "a" && $"x" === 2.0).head()
    assert(a2.getAs[Double]("score") == 0.0)
  }

  test("mahalanobis: identity-covariance case reduces to euclidean") {
    val df = Seq(
      (1.0, 0.0), (-1.0, 0.0), (0.0, 1.0), (0.0, -1.0),
      (1.0, 1.0), (-1.0, -1.0), (1.0, -1.0), (-1.0, 1.0)
    ).toDF("x", "y").withColumn("k", lit("g"))
    val out = Scorers.mahalanobis(df, Cfg(Seq("k"), Seq("x", "y"), threshold = 10.0))
    assert(out.count() == 8)
    assert(out.select(min($"score")).head().getDouble(0) >= 0.0)
  }

  test("entry returns outliers on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
