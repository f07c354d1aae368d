package graft

import graft.seq.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks latest right row at-or-before each left ts") {
    val left = Seq(("k", 5L, "e1"), ("k", 10L, "e2"), ("k", 15L, "e3"),
      ("k", 2L, "e0"), ("j", 10L, "j1"))
      .toDF("key", "ts", "ev")
    val right = Seq(("k", 3L, 30.0), ("k", 10L, 100.0), ("j", 20L, 7.0))
      .toDF("key", "ts", "model")
    val out = AsOfJoin.asOf(left, right, Seq("key"), "ts", Seq("model"))
      .collect().map(r => r.getAs[String]("ev") ->
        Option(r.getAs[Any]("model")).map(_.asInstanceOf[Double])).toMap
    assert(out("e0").isEmpty)            // before first snapshot
    assert(out("e1").contains(30.0))     // 3 <= 5
    assert(out("e2").contains(100.0))    // exact-ts match wins
    assert(out("e3").contains(100.0))    // carried forward
    assert(out("j1").isEmpty)            // right side only has a later snapshot
  }

  test("interval join equals the naive BETWEEN join, including the wide-interval path") {
    import org.apache.spark.sql.functions._
    val points = (1 to 200).map(i => ("k", i.toLong, i * 1.0)) ++
      Seq(("j", 900L, 5.0))
    val pts = points.toDF("key", "id", "x")
    // narrow bands, an edge-touching band pair, and one giant interval
    // that must take the broadcast residual path (span >> mean span)
    val iv = Seq(
      ("k", "b0", 10.0, 20.0), ("k", "b1", 20.0, 30.0),  // share edge 20
      ("k", "b2", 50.5, 51.5),
      ("k", "wide", 0.0, 10000.0),                        // wide outlier
      ("j", "jb", 1.0, 9.0)
    ).toDF("key", "band", "lo", "hi")
    val fast = AsOfJoin.intervalJoin(pts, iv, Seq("key"), "x", "lo", "hi",
      maxBucketsPerInterval = 4)
      .select("key", "id", "band").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val naive = pts.join(iv.withColumnRenamed("key", "k2"),
      col("key") === col("k2") && col("x") >= col("lo") && col("x") <= col("hi"))
      .select("key", "id", "band").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(fast == naive, s"diff: ${(fast diff naive) ++ (naive diff fast)}")
    assert(fast.contains(("k", 20L, "b0")) && fast.contains(("k", 20L, "b1")),
      "edge point must match both adjacent bands")
    assert(fast.contains(("k", 200L, "wide")), "wide path lost a match")
    assert(fast.contains(("j", 900L, "jb")))
  }
}
