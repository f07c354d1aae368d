package graft

import graft.multi.{ClusterScore, IsolationForest, Proximity}
import graft.post.PostOps
import org.apache.spark.sql.functions._

class MultiSpec extends SparkSpec {
  import spark.implicits._

  test("lof: isolated point scores highest") {
    // tight cluster at 0..9 plus one far point
    val pts = ((0 until 10).map(i => (i.toLong, Array(i * 0.1f, 0f))) :+
      (99L, Array(10f, 10f))).toDF("vec_id", "embedding")
    val pairs = Proximity.pairDistances(pts, "vec_id", "embedding")
    val lof = Proximity.lof(pairs, k = 3).collect()
    val top = lof.maxBy(_.getAs[Double]("lof"))
    assert(top.getAs[Long]("src") == 99L)
    assert(top.getAs[Double]("lof") > 2.0)
    // in-cluster points sit near LOF ≈ 1
    assert(lof.filter(_.getAs[Long]("src") != 99L)
      .forall(r => r.getAs[Double]("lof") < 2.0))
  }

  test("knn average distance: k nearest only") {
    val pts = Seq((1L, Array(0f, 0f)), (2L, Array(1f, 0f)), (3L, Array(2f, 0f)),
      (4L, Array(100f, 0f))).toDF("vec_id", "embedding")
    val pairs = Proximity.pairDistances(pts, "vec_id", "embedding")
    val ad = Proximity.averageDistance(pairs, k = 2).collect()
      .map(r => r.getAs[Long]("src") -> r.getAs[Double]("avgDist")).toMap
    assert(ad(1L) == 1.5) // neighbors at dist 1 and 2
    assert(ad(4L) > 90)
  }

  test("isolation forest: injected outlier scores above inliers, deterministic") {
    val data = ((1 to 300).map(i => ("k", i.toLong, 50.0 + (i % 7))) :+
      (("k", 999L, 500.0))).toDF("g", "id", "x")
    def scores = {
      val m = IsolationForest.fit(data, Seq("g"), Seq("x"), 50, 64, 6, seed = 7L)
      IsolationForest.score(data, m, Seq("g"), Seq("x"), "id", 64)
        .collect().map(s => s.rowId -> s.score).toMap
    }
    val s1 = scores
    assert(s1(999L) > 0.55)
    assert((1 to 300).forall(i => s1(i.toLong) < s1(999L)))
    assert(scores == s1) // seeded → reproducible
  }

  test("isolation forest merge grows leaf sizes") {
    val data = (1 to 100).map(i => ("k", i.toLong, i.toDouble)).toDF("g", "id", "x")
    val m = IsolationForest.fit(data, Seq("g"), Seq("x"), 10, 32, 5, seed = 1L)
    val before = m.collect().filter(_.isLeaf).map(_.size).sum
    val merged = IsolationForest.merge(m, data.limit(20), Seq("g"), Seq("x"))
    val after = merged.collect().filter(_.isLeaf).map(_.size).sum
    assert(after == before + 20 * 10) // 20 rows × 10 trees land in leaves
  }

  test("cblof: far point gets a high score") {
    val df = ((1 to 50).map(i => (i.toLong, 0.0 + i % 3, 0.0)) :+ ((99L, 500.0, 500.0)))
      .toDF("id", "x", "y")
    val out = ClusterScore.cblof(df, Seq("x", "y"), k = 3, largeFraction = 0.8, seed = 42L)
    val byId = out.collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("score")).toMap
    assert(byId(99L) > 100 || byId.filter(_._1 != 99L).values.max < byId(99L))
  }

  test("pca score: on-axis points score ~0, off-axis point scores high") {
    val df = ((1 to 100).map(i => (i.toLong, i.toDouble, 2.0 * i)) :+ ((999L, 50.0, 500.0)))
      .toDF("id", "x", "y")
    val out = ClusterScore.pcaScore(df, Seq("x", "y"), 1).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("score")).toMap
    assert(out(999L) > 100)
    assert(out(10L) < 20)
  }

  test("outlier counter percentages") {
    val df = Seq(("a", "O"), ("a", "N"), ("a", "N"), ("a", "I"), ("b", "N"))
      .toDF("k", "tag")
    val c = PostOps.outlierCounter(df, Seq("k")).collect()
      .map(r => r.getAs[String]("k") -> r).toMap
    assert(c("a").getAs[Long]("nO") == 1 && c("a").getAs[Long]("total") == 4)
    assert(math.abs(c("a").getAs[Double]("pctO") - 25.0) < 1e-9)
    assert(c("b").getAs[Long]("nO") == 0)
  }

  test("hierarchy rollup: parent O iff any child O, agg over outliers only") {
    val tagged = Seq(
      ("click", 1L, 10.0, "N"), ("view", 1L, 20.0, "O"),
      ("error", 1L, 30.0, "N"), ("error", 2L, 40.0, "N"))
      .toDF("event_type", "seqb0", "value", "tag")
    val h = Seq(("click", "*", "t", "web"), ("view", "*", "t", "web"),
      ("error", "*", "o", "be")).toDF("childType", "childId", "parentType", "parentId")
    val out = PostOps.hierarchyRollup(tagged, h, "event_type", "event_type",
      col("seqb0"), "value").collect()
      .map(r => (r.getAs[String]("parentType"), r.getAs[Long]("seqb")) -> r).toMap
    val web = out(("t", 1L))
    assert(web.getAs[String]("tag") == "O" && web.getAs[Double]("value") == 20.0)
    val be = out(("o", 1L))
    assert(be.getAs[String]("tag") == "N" && be.getAs[Double]("value") == 30.0)
  }

  test("threshold learner: best split separates labels") {
    val rows = (1 to 50).map(i => ("k", 1.0, "F")) ++ (1 to 50).map(i => ("k", 5.0, "T"))
    val df = rows.toDF("k", "score", "label")
    val out = PostOps.thresholdLearner(df, Seq("k"), "score", "label", Seq(0.5, 3.0, 6.0))
      .collect().map(r => r.getAs[Double]("split") -> r.getAs[Double]("wEntropy")).toMap
    assert(out(3.0) < 1e-12)    // perfect split
    assert(out(0.5) > 0.5 && out(6.0) > 0.5) // all-one-side → max entropy
  }

  test("ecod: extreme point scores highest; tails are -ln ecdf") {
    val rows = (1 to 99).map(i => ("k", i.toLong, (i % 10).toDouble, 5.0)) :+
      (("k", 999L, 100.0, 5.0))
    val df = rows.toDF("g", "id", "x", "y")
    val out = graft.multi.TailScores.ecod(df, Seq("g"), Seq("x", "y"), 5.0)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val top = out(999L)
    // x=100 is the unique max: right tail = 1/100 → -ln(0.01) ≈ 4.6;
    // y is constant (both tails = 1, contributes 0)
    assert(math.abs(top.getAs[Double]("score") - math.log(100.0)) < 1e-9)
    assert(top.getAs[String]("tag") == "N") // 4.6 < 5.0 threshold
    assert(out.values.map(_.getAs[Double]("score")).max ==
      top.getAs[Double]("score"))
  }

  test("ecod: skew sign routes the auto tail") {
    // right-skewed: mass at 0..9, long high tail → m3 > 0 → auto = right
    val rows = ((1 to 90).map(i => ("k", i.toLong, (i % 10).toDouble)) ++
      (1 to 10).map(i => ("k", 100L + i, 50.0 + i))).toDF("g", "id", "x")
    val out = graft.multi.TailScores.ecod(rows, Seq("g"), Seq("x"), 100.0)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("score")).toMap
    // the highest value (60): right tail 1/100, left tail 1 → with a
    // positive-skew auto choice the max(sums) must equal -ln(0.01)
    assert(math.abs(out(110L) - math.log(100.0)) < 1e-9)
    // a low-side value (0, 9 occurrences): its LEFT tail is 9/100 but
    // auto follows the right tail (90/100 of rows ≥ ... ), so its score
    // stays the max of the three sums — strictly below the top score
    assert(out.values.forall(_ <= out(110L) + 1e-12))
  }

  test("hbos: rare-bin point outscores dense-bin points") {
    val rows = ((1 to 99).map(i => ("k", i.toLong, 5.0 + (i % 3))) :+
      (("k", 999L, 95.0))).toDF("g", "id", "x")
    val out = graft.multi.TailScores.hbos(rows, Seq("g"),
      Seq(("x", 10.0)), threshold = 4.0)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    // rare bin: count 1 of 100 → -ln(0.01); dense bin: 99/100
    assert(math.abs(out(999L).getAs[Double]("score") - math.log(100.0)) < 1e-9)
    assert(out(999L).getAs[String]("tag") == "O")
    assert(out(1L).getAs[String]("tag") == "N")
  }
}
