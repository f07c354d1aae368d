package graft

import graft.multi.ClusterScore
import graft.sim.KMeansDist
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Round-8 operators: distributed integer-Lloyd k-means, 1-D DBSCAN,
  * logistic-regression quality trainer. */
class Round8Spec extends SparkSpec {
  import spark.implicits._

  test("kmeans: two well-separated blobs recovered with exact sizes") {
    // 20 points near (0,0), 20 near (10,10) — k=2 must split them
    val pts = ((0 until 20).map(i => (i.toLong, Array(i * 0.01f, i * 0.01f))) ++
      (0 until 20).map(i => (100L + i, Array(10f + i * 0.01f, 10f + i * 0.01f))))
      .toDF("vec_id", "embedding")
    val fit = KMeansDist.fit(pts, "vec_id", "embedding", dim = 2, k = 2,
      iters = 4, maxSample = 100)
    val rows = fit.collect()
    assert(rows.length == 4) // 2 cells × 2 dims
    val byCell = rows.groupBy(_.getAs[Int]("cell"))
    assert(byCell.keySet == Set(0, 1))
    // both clusters have all 20 members and centroids near the blob means
    byCell.values.foreach { rs =>
      assert(rs.head.getAs[Long]("n_members") == 20L)
      val cx = rs.map(_.getAs[Double]("cx"))
      assert(cx.forall(v => math.abs(v - 0.095) < 0.02 ||
        math.abs(v - 10.095) < 0.02))
    }
    // inertia of tight blobs is tiny (per-blob Σd² ≈ 0.133 here)
    assert(rows.forall(_.getAs[Double]("inertia") < 0.5))
  }

  test("kmeans: empty cells keep their previous centroid") {
    // k=4 over 3 distinct points: one cell must stay empty but survive
    val pts = Seq((1L, Array(0f, 0f)), (2L, Array(5f, 5f)), (3L, Array(9f, 9f)))
      .toDF("vec_id", "embedding")
    val fit = KMeansDist.fit(pts, "vec_id", "embedding", dim = 2, k = 4,
      iters = 3, maxSample = 10)
    // min(k, n) = 3 cells; all rows present, member counts sum to n
    val cells = fit.select("cell").distinct().count()
    assert(cells == 3)
    val members = fit.select("cell", "n_members").distinct()
      .agg(sum("n_members")).head().getLong(0)
    assert(members == 3L)
  }

  test("kmeans topOutliers: the far point ranks first") {
    val pts = ((0 until 30).map(i => (i.toLong, Array(i * 0.01f, 0f))) :+
      (99L, Array(50f, 50f))).toDF("vec_id", "embedding")
    val out = KMeansDist.topOutliers(pts, "vec_id", "embedding", dim = 2,
      k = 2, iters = 3, topK = 3).collect()
    // with k=2 the far point gets its own cell via the evenly spaced
    // init OR it dominates the distance ranking — either way the top
    // entry by construction is deterministic; assert ranking is by
    // distance desc
    val dists = out.map(_.getAs[Double]("dist"))
    assert(dists.sorted.reverse.sameElements(dists))
    assert(out.length == 3)
  }

  test("kmeans assign is stream-compatible (no shuffle, no state)") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val cents = Array(Array(0L, 0L), Array(10000000L, 10000000L)) // (0,0), (10,10) at 6dp
    val in = MemoryStream[(Long, Array[Float])]
    val assigned = KMeansDist.assign(
      in.toDF().toDF("id", "embedding"), "embedding", cents)
    val q = assigned.writeStream.format("memory").queryName("kma")
      .outputMode("append").start()
    in.addData((1L, Array(0.1f, 0.2f)), (2L, Array(9.9f, 10.2f)))
    q.processAllAvailable()
    val rows = spark.table("kma").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("cell")).toMap
    q.stop()
    assert(rows == Map(1L -> 0, 2L -> 1))
  }

  test("dbscan1d: chains, borders and noise on a crafted line") {
    // key a: dense cluster 0.0..0.4 (step .1), border at 0.85, core gap,
    // second cluster 5.0..5.4, lone noise point at 20
    val vals = (0 to 4).map(_ * 0.1) ++ Seq(0.85) ++
      (0 to 4).map(5.0 + _ * 0.1) ++ Seq(20.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "a", v) }
      .toDF("event_id", "key", "value")
    val out = ClusterScore.dbscan1d(df, Seq("key"), "value", "event_id",
      eps = 0.5, minPts = 3).collect()
    val byId = out.map(r => r.getAs[Long]("event_id") -> r).toMap
    // dense runs are core
    (0 to 4).foreach(i => assert(byId(i).getAs[Boolean]("is_core")))
    (6 to 10).foreach(i => assert(byId(i).getAs[Boolean]("is_core")))
    // 0.85 is within eps of 0.4: border of cluster 1, not core
    assert(!byId(5).getAs[Boolean]("is_core"))
    assert(byId(5).getAs[Long]("cluster") == byId(0).getAs[Long]("cluster"))
    // two distinct clusters
    assert(byId(6).getAs[Long]("cluster") != byId(0).getAs[Long]("cluster"))
    // 20.0 is noise → tag O
    assert(byId(11).getAs[Long]("cluster") == -1L)
    assert(byId(11).getAs[String]("tag") == "O")
    assert(out.count(_.getAs[String]("tag") == "O") == 1)
  }

  test("dbscan1d: border tie prefers the earlier core") {
    // cores at 0±, 1±; border at exactly 0.5 between the two clusters'
    // edge cores (0.3 and 0.7 → distances 0.2 both) — attaches to prev
    val vals = Seq(0.0, 0.1, 0.3, 0.5, 0.7, 0.9, 1.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "a", v) }
      .toDF("event_id", "key", "value")
    // eps=0.25 so 0.3 and 0.7 chain separately (gap 0.4 via 0.5 non-core)
    val out = ClusterScore.dbscan1d(df, Seq("key"), "value", "event_id",
      eps = 0.25, minPts = 2).collect()
    val byId = out.map(r => r.getAs[Long]("event_id") -> r).toMap
    assert(!byId(3).getAs[Boolean]("is_core") ||
      byId(3).getAs[Long]("cluster") >= 1) // sanity: 0.5's neighbors are 0.3/0.7
    if (!byId(3).getAs[Boolean]("is_core")) {
      assert(byId(3).getAs[Long]("cluster") == byId(2).getAs[Long]("cluster"))
    }
  }

  test("dbscanGrid: two blobs, a border and noise") {
    // 3×3 lattice (step 0.1) at origin and at (10,10); a point at (5,5)
    // is noise; (0.25, 0.1) is within eps of the first blob's edge but
    // has too few neighbors itself → border of cluster min-id 0
    val blob = for { i <- 0 to 2; j <- 0 to 2 } yield (i * 0.1, j * 0.1)
    val ptsA = blob.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
    val ptsB = blob.zipWithIndex.map { case ((x, y), i) =>
      (100L + i, 10.0 + x, 10.0 + y) }
    val extra = Seq((50L, 5.0, 5.0), (60L, 0.25, 0.1))
    val df = (ptsA ++ ptsB ++ extra).toDF("id", "x", "y")
    val out = ClusterScore.dbscanGrid(df, "id", "x", "y",
      eps = 0.15, minPts = 4).collect()
    val byId = out.map(r => r.getAs[Long]("id") -> r).toMap
    // blob A all in cluster 0 (min id), blob B in cluster 100
    (0L to 8L).foreach(i => assert(byId(i).getAs[Long]("cluster") == 0L))
    (100L to 108L).foreach(i => assert(byId(i).getAs[Long]("cluster") == 100L))
    // noise point
    assert(byId(50L).getAs[Long]("cluster") == -1L)
    assert(byId(50L).getAs[String]("tag") == "O")
    // border: within 0.15 of (0.2, 0.1) = id 7? — lattice ids: (i*0.1,
    // j*0.1) with index i*3+j → (0.2,0.1) is id 7; 60 is 0.05 away
    assert(!byId(60L).getAs[Boolean]("is_core") ||
      byId(60L).getAs[Long]("n_nbrs") >= 4)
    assert(byId(60L).getAs[Long]("cluster") == 0L)
  }

  test("bpe: greedy merge order and corpus-weighted counts") {
    // "banana" ×3, "bandana" ×1 → (a,n) count 3·2+2 = 8 beats all
    val df = (Seq.fill(3)("banana") :+ "bandana").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m = TextOps.bpeTrain(df, "doc_id", "text", nMerges = 3, vocabTopN = 10)
      .collect().sortBy(_.getAs[Int]("round"))
    assert(m(0).getAs[String]("left") == "a")
    assert(m(0).getAs[String]("right") == "n")
    assert(m(0).getAs[String]("merged") == "an")
    assert(m(0).getAs[Long]("pair_count") == 8L)
    // round 2 operates on the REWRITTEN vocab: banana → [b, an, an, a],
    // bandana → [b, an, d, an, a]; (an,a) and (b,an) both count 4 and
    // the (count desc, pair asc) tie-break picks (an,a)
    assert((m(1).getAs[String]("left"), m(1).getAs[String]("right")) ==
      ("an", "a"))
    assert(m(1).getAs[Long]("pair_count") == 4L)
  }

  test("bpe encode: rules apply greedily in training order") {
    val df = Seq((1L, "banana"), (2L, "band ana")).toDF("doc_id", "text")
    val out = TextOps.bpeEncode(df, "doc_id", "text",
      Seq(("a", "n"), ("an", "a"))).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bpe")).toMap
    // banana: (b)(a)(n)(a)(n)(a) → (b)(an)(an)(a) → (b)(an)(ana) = 3
    assert(out(1L) == 3L)
    // band ana: (b)(an)(d)( )(an)(a) → (b)(an)(d)( )(ana) = 5 (space is
    // its own token; merges never cross it)
    assert(out(2L) == 5L)
  }

  test("psi: identical windows ≈ 0, shifted window crosses the 0.2 line") {
    import graft.drift.Drift
    val base = (0 until 2000).map(i => ("a", i.toLong, (i % 100) * 1.0))
      .toDF("k", "id", "value")
    val same = Drift.psi(base, base, Seq("k"), "value", nBins = 10).collect()(0)
    assert(math.abs(same.getAs[Double]("psi")) < 0.01)
    assert(!same.getAs[Boolean]("drifted"))
    val shifted = base.withColumn("value", col("value") + 60.0)
    val out = Drift.psi(base, shifted, Seq("k"), "value", nBins = 10).collect()(0)
    assert(out.getAs[Double]("psi") > 0.2)
    assert(out.getAs[Boolean]("drifted"))
  }

  test("benford: log-uniform sample conforms, uniform sample is flagged") {
    import graft.drift.Drift
    // 10^u with u uniform on [0,3) is exactly Benford-distributed
    val logu = (0 until 4000).map(i => ("b", math.pow(10.0, (i % 1000) * 3.0 / 1000)))
    val unif = (0 until 4000).map(i => ("u", 100.0 + (i % 800)))
    val out = Drift.benford((logu ++ unif).toDF("k", "value"), Seq("k"), "value")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(!out("b").getAs[Boolean]("nonconforming"),
      s"chi2=${out("b").getAs[Double]("chi2")}")
    assert(out("u").getAs[Boolean]("nonconforming"))
    assert(out("u").getAs[Double]("madStat") > out("b").getAs[Double]("madStat"))
    assert(out("b").getAs[Long]("n") == 4000)
  }

  test("cellKnn LOF matches exact LOF on clusterable data") {
    import graft.multi.Proximity
    // 3 tight blobs (30 pts each) + one genuine outlier between them:
    // on clusterable data the cell-bounded kNN must reproduce the exact
    // LOF ranking for the outlier and keep in-blob points near 1
    val rng = new scala.util.Random(7)
    val blobs: Seq[(Long, Array[Float])] = (for {
      ((cx, cy), b) <- Seq((0.0, 0.0), (10.0, 0.0), (5.0, 9.0)).zipWithIndex
      i <- 0 until 30
    } yield ((b * 1000 + i).toLong,
      Array((cx + rng.nextGaussian() * 0.3).toFloat,
        (cy + rng.nextGaussian() * 0.3).toFloat))).toSeq
    val pts = (blobs :+ (99999L -> Array(5f, 4f)))
      .toDF("vec_id", "embedding")
    val approx = Proximity.lofFromKnn(
      Proximity.cellKnn(pts, "vec_id", "embedding", dim = 2, nCells = 3,
        iters = 4, k = 5, maxSample = 1000), k = 5).collect()
    val exact = Proximity.lof(
      Proximity.pairDistances(pts, "vec_id", "embedding"), k = 5).collect()
    def top(rs: Array[org.apache.spark.sql.Row]) =
      rs.maxBy(_.getAs[Double]("lof")).getAs[Long]("src")
    assert(top(approx) == 99999L && top(exact) == 99999L)
    // in-blob points stay near LOF 1 in the approximation too
    val inBlob = approx.filter(_.getAs[Long]("src") != 99999L)
    assert(inBlob.forall(r => r.getAs[Double]("lof") < 2.0))
  }

  test("psi stream twin equals batch psi of the prefix across batch splits") {
    import graft.drift.Drift
    import graft.streaming.StreamScorers
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ref = (0 until 500).map(i => ("a", math.sin(i * 0.37) * 10 + 20))
      .toDF("k", "value")
    val model = Drift.psiRefModel(ref, "k", "value", nBins = 10)
    val b1 = (0 until 120).map(i => ("a", math.cos(i * 0.53) * 12 + 26))
    val b2 = (0 until 90).map(i => ("a", math.cos(i * 0.71) * 8 + 31))
    val in = MemoryStream[(String, Double)]
    val out = StreamScorers.psiStream(in.toDF().toDF("k", "value"),
      "k", "value", model, nBins = 10)
    val q = out.writeStream.format("memory").queryName("psis")
      .outputMode("append").start()
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    val snaps = spark.table("psis").collect()
      .map(r => r.getAs[Long]("n") -> r.getAs[Double]("psi")).toMap
    q.stop()
    // exact parity with the batch operator on each prefix
    val batch1 = Drift.psi(ref, b1.toDF("k", "value"), Seq("k"), "value", 10)
      .collect()(0).getAs[Double]("psi")
    val batch12 = Drift.psi(ref, (b1 ++ b2).toDF("k", "value"), Seq("k"), "value", 10)
      .collect()(0).getAs[Double]("psi")
    assert(snaps(120L) == batch1)
    assert(snaps(210L) == batch12)
  }

  test("attribution: the perturbed attribute is named") {
    import graft.model.Fitters
    import graft.score.Scorers
    // y is noisy, x is constant-ish; a row with a wild x must attribute to x
    val rows = (0 until 200).map(i => ("g", i.toLong, 10.0 + (i % 5) * 0.1,
      (i % 20) * 1.0)) :+ (("g", 999L, 50.0, 10.0))
    val df = rows.toDF("k", "id", "x", "y")
    val stats = Fitters.stats(df, Seq("k"), Seq("x", "y"))
    val out = Scorers.zscoreAttribution(df, stats,
      Scorers.Cfg(Seq("k"), Seq("x", "y"), threshold = 3.0)).collect()
    val wild = out.find(_.getAs[Long]("id") == 999L).get
    assert(wild.getAs[String]("topAttr") == "x")
    assert(wild.getAs[Double]("x_share") > 0.9)
  }

  test("logreg: recovers a linearly separable cut") {
    val df = (0 until 200).map { i =>
      val x = (i - 100) / 10.0
      (1.0, x, if (x >= 0) 1.0 else 0.0)
    }.toDF("f0", "f1", "y")
    val fit = TextOps.logRegFit(df, Seq("f0", "f1"), "y", iters = 10, lr = 1.0)
    val rows = fit.collect()
    val w = rows.map(r => r.getAs[String]("feature") -> r.getAs[Double]("weight")).toMap
    assert(w("f1") > 0.5) // slope learned positive
    assert(rows.head.getAs[Double]("accuracy") > 0.95)
  }

  test("logreg: deterministic across partition counts") {
    val base = (0 until 500).map { i =>
      (1.0, math.sin(i * 1.7) * 3, if (i % 3 == 0) 1.0 else 0.0)
    }
    val a = TextOps.logRegFit(base.toDF("f0", "f1", "y").repartition(1),
      Seq("f0", "f1"), "y", iters = 5, lr = 0.5).collect()
    val b = TextOps.logRegFit(base.toDF("f0", "f1", "y").repartition(13),
      Seq("f0", "f1"), "y", iters = 5, lr = 0.5).collect()
    val wa = a.map(r => r.getAs[String]("feature") -> r.getAs[Double]("weight")).toMap
    val wb = b.map(r => r.getAs[String]("feature") -> r.getAs[Double]("weight")).toMap
    assert(wa == wb) // integer gradient sums → bit-identical under any combine order
  }
}
