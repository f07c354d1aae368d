package graft

import graft.model.{Assoc, Spc, Tests2}
import org.apache.spark.sql.functions._

/** Yuen trimmed t, I-MR chart, transfer entropy. */
class Wave10Spec extends SparkSpec {
  import spark.implicits._

  test("yuen: outlier-contaminated shift is detected on the trimmed scale") {
    // b = a + 5 with two wild outliers in a that would wreck plain t
    val a = (1 to 50).map(i => ("a", (i % 10).toDouble)) ++
      Seq(("a", 1e4), ("a", -1e4))
    val b = (1 to 50).map(i => ("b", (i % 10) + 5.0))
    val r = Tests2.yuenTrimmedT((a ++ b).toDF("g", "v"), "g", "v", "a", "b")
      .collect()(0)
    assert(math.abs(r.getAs[Double]("tm_a") -
      (r.getAs[Double]("tm_b") - 5.0)) < 0.5, s"$r")
    assert(r.getAs[Double]("t_stat") < -5.0, s"$r")
  }

  test("imr: one wild point is flagged on both charts") {
    val df = ((1 to 100).map(i =>
      ("k", i.toLong, 10.0 + (i % 3))) :+ (("k", 101L, 100.0)))
      .toDF("g", "o", "v")
    val rows = Spc.imrChart(df, "g", "o", "v").collect()
      .map(r => r.getAs[Long]("ord") -> r).toMap
    assert(rows(101L).getAs[Boolean]("out_x"))
    assert(rows(101L).getAs[Boolean]("out_mr"))
    assert(!rows(50L).getAs[Boolean]("out_x"))
    assert(rows(1L).get(rows(1L).fieldIndex("mr")) == null) // first point
  }

  test("transfer entropy: y copying x's past scores far above independence") {
    // y_t = x_{t-1}: maximal x→y transfer
    val xs = (0 until 200).map(i => (i * 37 + 11) % 100)
    val rows = (1 until 200).map { t =>
      ("k", t.toLong, xs(t).toDouble, xs(t - 1).toDouble)
    }
    val dep = Assoc.transferEntropy(rows.toDF("k", "t", "x", "y"),
      Seq("k"), "t", "x", "y").collect()(0)
    assert(dep.getAs[Double]("te") > 0.4, s"copy channel: $dep")
    // independent y
    val ind = (1 until 200).map { t =>
      ("k", t.toLong, xs(t).toDouble, ((t * 61 + 7) % 100).toDouble)
    }
    val r2 = Assoc.transferEntropy(ind.toDF("k", "t", "x", "y"),
      Seq("k"), "t", "x", "y").collect()(0)
    assert(r2.getAs[Double]("te") < 0.1, s"independent: $r2")
  }

  test("granger: copy channel scores a huge F, independent near 0") {
    val xs = (0 until 300).map(i => ((i * 37 + 11) % 100).toDouble)
    val dep = (1 until 300).map(t =>
      ("k", t.toLong, xs(t), xs(t - 1) + (t % 7) * 0.3))
    val r = Assoc.grangerF(dep.toDF("k", "t", "x", "y"),
      Seq("k"), "t", "x", "y").collect()(0)
    assert(r.getAs[Double]("f_stat") > 100.0, s"copy: $r")
    val ind = (1 until 300).map(t =>
      ("k", t.toLong, xs(t), ((t * 61 + 7) % 100).toDouble))
    assert(Assoc.grangerF(ind.toDF("k", "t", "x", "y"),
      Seq("k"), "t", "x", "y").collect()(0).getAs[Double]("f_stat") < 5.0)
  }

  test("newey-west: slope recovered, HAC se positive and finite") {
    val rows = (0 until 300).map { i =>
      val x = (i / 10).toLong // clustered regressor → autocorrelated e
      ("k", i.toLong, x, 3.0 * x + (if ((i / 10) % 2 == 0) 1.0 else -1.0))
    }
    val r = Assoc.neweyWestSlope(rows.toDF("k", "o", "x", "y"),
      Seq("k"), "o", "x", "y").collect()(0)
    assert(math.abs(r.getAs[Double]("slope") - 3.0) < 0.05, s"$r")
    assert(r.getAs[Double]("se_hac") > 0 &&
      java.lang.Double.isFinite(r.getAs[Double]("t_hac")))
  }

  test("burstiness: periodic gaps give B near -1, heavy-tailed B > 0") {
    val per = (0 until 100).map(i => ("per", i * 1000000000L, i.toLong))
    // bursty: clusters of 5 quick events then a long silence
    val bur = (0 until 100).map { i =>
      val t = (i / 5).toLong * 600L * 1000000000L + (i % 5) * 1000000000L
      ("bur", t, i.toLong)
    }
    val m = graft.seq.SeqOps.burstiness((per ++ bur).toDF("k", "ts", "s"),
      Seq("k"), "ts", "s")
      .collect().map(r => r.getAs[String]("key") -> r).toMap
    assert(m("per").getAs[Double]("burstiness") == -1.0, s"${m("per")}")
    assert(m("bur").getAs[Double]("burstiness") > 0.3, s"${m("bur")}")
  }

  test("rbo: identical rankings score 1, reversed rankings far less") {
    val df = (1 to 100).map(i => (i.toLong, i.toDouble, i.toDouble))
      .toDF("id", "a", "b")
    val same = graft.seq.SeqOps.rankBiasedOverlap(df, "id", "a", "b", 20)
      .collect()(0).getAs[Double]("rbo")
    assert(math.abs(same - (1.0 - math.pow(0.9, 20))) < 1e-4, s"$same")
    val rev = (1 to 100).map(i => (i.toLong, i.toDouble, -i.toDouble))
      .toDF("id", "a", "b")
    assert(graft.seq.SeqOps.rankBiasedOverlap(rev, "id", "a", "b", 20)
      .collect()(0).getAs[Double]("rbo") < 0.1)
  }

  test("huber: contaminated slope recovers where OLS is dragged away") {
    // y = 2x + tiny noise, with 10% wild +1000 outliers
    val rows = (0 until 200).map { i =>
      val y = 2.0 * i + (i % 5) * 0.1 + (if (i % 10 == 0) 1000.0 else 0.0)
      ("k", i.toLong, y)
    }
    val r = Assoc.huberFit(rows.toDF("k", "x", "y"), Seq("k"), "x", "y")
      .collect()(0)
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 0.1,
      s"huber slope: $r")
    assert(r.getAs[Double]("scale") > 0)
  }

  test("best survivor: the longest copy wins its cluster") {
    import graft.text.TextOps
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L))
      .toDF("id", "cluster")
    val quality = Seq((1L, 50L), (2L, 90L), (3L, 90L), (7L, 10L))
      .toDF("doc_id", "n_chars")
    val r = TextOps.bestSurvivor(clusters, quality, "doc_id", "n_chars")
      .collect().map(x => x.getAs[Long]("cluster") ->
        (x.getAs[Long]("survivor_id"), x.getAs[Long]("cluster_size"))).toMap
    assert(r(1L) == (2L, 3L), s"$r") // quality tie 2 vs 3 → smaller id
    assert(r(7L) == (7L, 1L))
  }
}
