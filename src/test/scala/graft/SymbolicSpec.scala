package graft

import graft.core.Layout
import graft.post.PostOps
import graft.seq.{Symbolic, Trend}
import org.apache.spark.sql.functions._

/** SAX symbolization, Ljung–Box whiteness, BY-FDR, rendezvous routing. */
class SymbolicSpec extends SparkSpec {
  import spark.implicits._

  test("sax: constant-by-frame staircase maps low frames to low letters") {
    // 4 plateaus of 32 points each, strongly separated → PAA per 8-point
    // frame is constant; letters must be non-decreasing with the plateau
    val df = (0 until 128).map(i => ("k", i.toLong, (i / 32) * 10.0))
      .toDF("g", "seq", "v")
    val r = Symbolic.sax(df, Seq("g"), "seq", "v", frameSize = 8,
      alphabet = 4).orderBy("frame").collect()
    assert(r.length == 16)
    val syms = r.map(_.getAs[Long]("sym"))
    assert(syms.zip(syms.tail).forall { case (a, b) => a <= b },
      s"monotone staircase → monotone symbols: ${syms.toSeq}")
    assert(syms.head == 0L && syms.last == 3L,
      s"extremes hit the alphabet ends: ${syms.toSeq}")
    assert(r.head.getAs[String]("letter") == "a" &&
      r.last.getAs[String]("letter") == "d")
  }

  test("sax: gaussian-ish data uses all letters roughly equally") {
    // equiprobable breakpoints: a near-normal sample spreads evenly
    val rnd = new scala.util.Random(7)
    val df = (0 until 4000).map(i => ("k", i.toLong, rnd.nextGaussian()))
      .toDF("g", "seq", "v")
    val r = Symbolic.sax(df, Seq("g"), "seq", "v", frameSize = 1,
      alphabet = 4)
    val byLetter = r.groupBy("letter").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(byLetter.size == 4)
    byLetter.values.foreach(c => assert(math.abs(c - 1000L) < 150,
      s"equiprobable buckets: $byLetter"))
  }

  test("ljung-box: white noise small Q, AR(1) series large Q") {
    val rnd = new scala.util.Random(11)
    val white = (1 to 2000).map(i => ("k", i.toLong, rnd.nextGaussian()))
      .toDF("g", "seq", "v")
    val qw = Trend.ljungBox(white, Seq("g"), "seq", "v", maxLag = 10)
      .collect()(0)
    assert(qw.getAs[Long]("h") == 10L)
    assert(qw.getAs[Double]("q_stat") < 30.0, s"white noise: $qw")
    var x = 0.0
    val ar = (1 to 2000).map { i =>
      x = 0.8 * x + rnd.nextGaussian(); ("k", i.toLong, x)
    }.toDF("g", "seq", "v")
    val qa = Trend.ljungBox(ar, Seq("g"), "seq", "v", maxLag = 10)
      .collect()(0)
    assert(qa.getAs[Double]("q_stat") > 1000.0, s"AR(1) 0.8: $qa")
  }

  test("by-fdr is strictly more conservative than bh-fdr") {
    val rnd = new scala.util.Random(3)
    // 50 real signals (tiny p) + 950 uniform nulls
    val ps = (1 to 50).map(i => ("k", i.toLong, rnd.nextDouble() * 1e-5)) ++
      (51 to 1000).map(i => ("k", i.toLong, rnd.nextDouble()))
    val df = ps.toDF("g", "id", "p")
    val bh = PostOps.bhFdr(df, Seq("g"), "p", "id", alpha = 0.1)
      .where(col("discovery")).count()
    val by = PostOps.byFdr(df, Seq("g"), "p", "id", alpha = 0.1)
      .where(col("discovery")).count()
    assert(by <= bh, s"BY ($by) <= BH ($bh)")
    assert(by >= 50L, s"the real signals survive even BY: $by")
    // c(m) matches the exact harmonic number
    val cm = PostOps.byFdr(df, Seq("g"), "p", "id", 0.1)
      .select(max("c_m")).collect()(0).getDouble(0)
    val harm = (1 to 1000).map(1.0 / _).sum
    assert(math.abs(cm - harm) < 1e-6, s"c(1000): $cm vs $harm")
  }

  test("mel filterbank: triangular, non-negative, covers the spectrum") {
    val fb = graft.mm.Multimodal.melFilterbank(8000, 64, 8)
    assert(fb.length == 8 && fb.forall(_.length == 32))
    assert(fb.flatten.forall(w => w >= 0.0 && w <= 1.0))
    // every filter has some mass, and mid-spectrum bins are covered
    fb.foreach(f => assert(f.sum > 0.0, "no empty filter"))
    val covered = (1 until 31).count(k => fb.exists(_(k) > 0.0))
    assert(covered >= 28, s"spectrum coverage: $covered/30")
  }

  test("mfcc: a pure tone and white-ish noise separate in c1") {
    import graft.mm.{Codecs, Multimodal}
    val tone = Array.tabulate(64)(i =>
      (3000 * math.sin(2 * math.Pi * 4 * i / 64.0)).toShort)
    val rnd = new scala.util.Random(5)
    val noise = Array.tabulate(64)(_ => (rnd.nextInt(6000) - 3000).toShort)
    val media = Seq(
      (1L, Codecs.Wav.encode(tone, 8000)),
      (2L, Codecs.Wav.encode(noise, 8000))).toDF("id", "payload")
    val r = Multimodal.audioMfcc(media, 64, 8, 4).collect()
      .map(x => x.getAs[Long]("id") ->
        x.getAs[collection.Seq[Double]]("mfcc").toVector).toMap
    // tone: energy in one low mel band → strong spectral tilt (|c1| big);
    // noise: flat-ish log spectrum → |c1| small relative to the tone's
    assert(math.abs(r(1L)(1)) > math.abs(r(2L)(1)) + 1.0,
      s"tone tilts, noise doesn't: $r")
  }

  test("rendezvous: balanced, and removing a node only moves its own keys") {
    val df = (1 to 4000).map(i => Tuple1(i.toLong)).toDF("id")
    val n8 = (0 until 8).map(i => s"node$i")
    val a = Layout.rendezvous(df, "id", n8).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byNode = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byNode.size == 8)
    byNode.values.foreach(c => assert(math.abs(c - 500) < 120,
      s"HRW balance: $byNode"))
    // drop node3: every key NOT on node3 keeps its assignment
    val b = Layout.rendezvous(df, "id", n8.filterNot(_ == "node3"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val moved = a.filter { case (k, v) => v != "node3" && b(k) != v }
    assert(moved.isEmpty,
      s"minimal disruption is THE rendezvous property: ${moved.take(5)}")
  }
}
