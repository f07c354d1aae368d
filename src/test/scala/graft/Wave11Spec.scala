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
