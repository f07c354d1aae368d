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
