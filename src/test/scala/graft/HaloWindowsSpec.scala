package graft

import graft.seq.{HaloWindows, SeqOps}
import org.apache.spark.sql.functions._

class HaloWindowsSpec extends SparkSpec {
  import spark.implicits._

  // three keys of very different lengths so range partitioning splits the
  // long key across several partitions and leaves short/empty partitions
  // to exercise the routed halo exchange (chains through empty partitions)
  private def series = {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(600) { i =>
      val base = if (i < 300) 10.0 else 14.0 // level shift at 300
      ("big", i.toLong, base + rnd.nextGaussian())
    } ++ Seq.tabulate(25) { i =>
      ("mid", i.toLong, 5.0 + rnd.nextGaussian())
    } ++ Seq.tabulate(3) { i =>
      ("tiny", i.toLong, 1.0 * i)
    }
    rnd.shuffle(rows).toDF("k", "seq", "value")
  }

  test("halo kernel is bit-identical to the window formulation across partition counts") {
    val df = series
    val expected = SeqOps
      .changePointMeanShift(df, Seq("k"), "seq", "value", window = 10, critValue = 2.0)
      .select(col("k").as("key"), col("seq").cast("long"), col("value"), col("stat"))
      .as[(String, Long, Double, Double)].collect().sortBy(r => (r._1, r._2))
    assert(expected.nonEmpty, "fixture must produce change points")
    // p=1024 ≫ rows: almost every partition is empty or shorter than the
    // halo, so left/right routing must chain across many partitions; the
    // driver sees only the 1024 per-partition counts (no data-sized
    // collect), so the stitch stays flat-memory at any partition count
    for (p <- Seq(1, 3, 8, 32, 1024)) {
      val got = HaloWindows
        .changePointMeanShift(df, Seq("k"), "seq", "value", window = 10,
          critValue = 2.0, numPartitions = p)
        .as[(String, Long, Double, Double)].collect().sortBy(r => (r._1, r._2))
      assert(got.length == expected.length, s"row count at p=$p")
      got.zip(expected).foreach { case (g, e) =>
        assert(g._1 == e._1 && g._2 == e._2, s"row identity at p=$p")
        // bit-identical, not approximately equal: the kernel replicates
        // WindowExec's ascending-sum / Welford arithmetic exactly
        assert(g._3 == e._3 && g._4 == e._4, s"bit parity at p=$p: $g vs $e")
      }
    }
  }

  test("null values: halo and window level-shift formulations stay in parity") {
    // both formulations drop null values up front (a null row must not
    // occupy a frame position) — pin that the two null policies agree,
    // per the round-6 advice on HaloWindows vs SeqOps divergence
    val withNulls = series.withColumn("value",
      when(col("seq") % 37 === 0, lit(null).cast("double")).otherwise(col("value")))
    val expected = SeqOps
      .levelShiftSegments(withNulls, Seq("k"), "seq", "value", window = 10, minZ = 2.0)
      .select(col("k").as("key"), col("segStart").cast("long"),
        col("segEnd").cast("long"), col("n"), col("avgShift"))
      .as[(String, Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(expected.nonEmpty, "nully fixture must still produce segments")
    val got = HaloWindows
      .levelShiftSegments(withNulls, Seq("k"), "seq", "value", window = 10,
        minZ = 2.0, numPartitions = 8)
      .select(col("key"), col("segStart").cast("long"),
        col("segEnd").cast("long"), col("n"), col("avgShift"))
      .as[(String, Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"$g vs $e") }
  }

  test("halo level-shift segments match the window formulation across partition counts") {
    val df = series
    val expected = SeqOps
      .levelShiftSegments(df, Seq("k"), "seq", "value", window = 10, minZ = 2.0)
      .select(col("k").as("key"), col("segStart").cast("long"),
        col("segEnd").cast("long"), col("n"), col("avgShift"))
      .as[(String, Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(expected.nonEmpty, "fixture must produce shifted segments")
    for (p <- Seq(1, 3, 8, 32)) {
      val got = HaloWindows
        .levelShiftSegments(df, Seq("k"), "seq", "value", window = 10,
          minZ = 2.0, numPartitions = p)
        .select(col("key"), col("segStart").cast("long"),
          col("segEnd").cast("long"), col("n"), col("avgShift"))
        .as[(String, Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
      assert(got.length == expected.length, s"segment count at p=$p")
      got.zip(expected).foreach { case (g, e) =>
        // segment identity is exact; avgShift is a hash-agg over
        // bit-identical z values, so only summation order can differ
        assert((g._1, g._2, g._3, g._4) == ((e._1, e._2, e._3, e._4)), s"segment at p=$p: $g vs $e")
        assert(math.abs(g._5 - e._5) < 1e-12, s"avgShift at p=$p: $g vs $e")
      }
    }
  }

  test("segments spanning a partition boundary are stitched into one") {
    // one key, a single long shifted run; with numPartitions high enough
    // the run crosses several partition boundaries but must stay one segment
    val rows = Seq.tabulate(120) { i =>
      ("k", i.toLong, if (i < 60) 0.0 + (i % 3) * 0.1 else 50.0 + (i % 3) * 0.1)
    }
    val segs = HaloWindows.levelShiftSegments(rows.toDF("k", "seq", "value"),
      Seq("k"), "seq", "value", window = 10, minZ = 3.0, numPartitions = 16)
      .collect()
    assert(segs.length == 1, s"expected one stitched segment, got ${segs.toSeq}")
  }

  test("pipeline auto-dispatch: halo kernel below the crossover, window plan above, same rows") {
    import graft.pipeline.Pipeline
    val par = spark.sparkContext.defaultParallelism
    assert(Pipeline.useHaloKernel(3, par) && !Pipeline.useHaloKernel(4L * par, par))
    val df = series
    // fixture has 3 keys → auto takes the halo path; forcing a huge known
    // cardinality takes the window path; both must emit identical rows in
    // the same normalized (key, seq, value, stat) schema
    val auto = Pipeline.changePoint(df, Seq("k"), "seq", "value", 10, 2.0)
      .as[(String, Long, Double, Double)].collect().sortBy(r => (r._1, r._2))
    val win = Pipeline.changePoint(df, Seq("k"), "seq", "value", 10, 2.0,
      knownKeyCardinality = 1000000L)
      .as[(String, Long, Double, Double)].collect().sortBy(r => (r._1, r._2))
    assert(auto.nonEmpty && auto.sameElements(win))
    val autoSeg = Pipeline.levelShiftSegments(df, Seq("k"), "seq", "value", 10, 2.0)
      .as[(String, Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val winSeg = Pipeline.levelShiftSegments(df, Seq("k"), "seq", "value", 10, 2.0,
      knownKeyCardinality = 1000000L)
      .as[(String, Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(autoSeg.nonEmpty && autoSeg.length == winSeg.length)
    autoSeg.zip(winSeg).foreach { case (a, b) =>
      assert((a._1, a._2, a._3, a._4) == ((b._1, b._2, b._3, b._4)))
      assert(math.abs(a._5 - b._5) < 1e-12)
    }
  }

  test("frames never cross key boundaries even when a halo spans keys") {
    // keys shorter than the window must emit nothing
    val df = Seq.tabulate(8)(i => ("a", i.toLong, i.toDouble)) ++
      Seq.tabulate(8)(i => ("b", i.toLong, 100.0 + i))
    val out = HaloWindows.changePointMeanShift(df.toDF("k", "seq", "value"),
      Seq("k"), "seq", "value", window = 10, critValue = 0.0, numPartitions = 4)
    assert(out.count() == 0)
  }
}
