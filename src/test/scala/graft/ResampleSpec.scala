package graft

import graft.model.{Resample, Tests2}
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Jackknife / capture–recapture / Chao1 / Good–Turing / KL / log-odds /
  * Cliff's delta on hand-checkable fixtures. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("jackknife SE matches the closed form for the mean of iid blocks") {
    // 10 blocks of one value each: jackknife SE of the mean == classic
    // SE of the mean = sd/sqrt(n) for delete-1 on singleton blocks
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("k", "blk", "v")
    val r = Resample.jackknifeSE(df, "k", "blk", "v").collect()(0)
    val sd = math.sqrt(vals.map(v => (v - 5.5) * (v - 5.5)).sum / 9)
    assert(math.abs(r.getAs[Double]("mean") - 5.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("se_jack") - sd / math.sqrt(10)) < 1e-3,
      s"$r vs ${sd / math.sqrt(10)}")
  }

  test("capture-recapture: full overlap estimates the union size") {
    val df = (1 to 100).map(i => (s"item$i", true, true)).toDF("it", "a", "b")
    val r = Resample.captureRecapture(df, "it", "a", "b").collect()(0)
    assert(math.abs(r.getAs[Double]("n_hat") - 100.0) < 1e-6)
    // half overlap: n1=60 n2=60 m=30 → (61*61/31)-1 ≈ 119
    val df2 = (1 to 90).map(i =>
      (s"i$i", i <= 60, i > 30)).toDF("it", "a", "b")
    val r2 = Resample.captureRecapture(df2, "it", "a", "b").collect()(0)
    assert(math.abs(r2.getAs[Double]("n_hat") - (61.0 * 61 / 31 - 1)) < 1e-6)
  }

  test("chao1 and good-turing on a constructed count-of-counts") {
    // 4 singletons, 2 doubletons, 1 type with 3 → D=7, chao1 = 7 + 16/4
    val toks = (Seq.fill(1)("a") ++ Seq.fill(1)("b") ++ Seq.fill(1)("c") ++
      Seq.fill(1)("d") ++ Seq.fill(2)("e") ++ Seq.fill(2)("f") ++
      Seq.fill(3)("g")).map(("k", _))
    val c = Resample.chao1(toks.toDF("k", "t"), "k", "t").collect()(0)
    assert(c.getAs[Long]("d_types") == 7L && c.getAs[Long]("f1") == 4L)
    assert(c.getAs[Double]("chao1") == 11.0, s"$c")
    val gt = Resample.goodTuring(toks.toDF("k", "t"), "k", "t", 5)
      .collect().map(r => r.getAs[Long]("r") ->
        Option(r.get(r.fieldIndex("r_star")))).toMap
    // r=1: r* = 2·n2/n1 = 2·2/4 = 1; r=2: r* = 3·n3/n2 = 3·1/2
    assert(gt(1L).get == 1.0 && gt(2L).get == 1.5, s"$gt")
    assert(gt(3L).isEmpty) // no quadruples → NULL
  }

  test("unigram KL is ~0 for identical corpora, positive for disjoint") {
    val same = (0 until 40).map(i =>
      (if (i % 2 == 0) "src1" else "src2", "alpha beta gamma"))
      .toDF("source", "text")
    val r = TextOps.unigramKL(same, "source", "text", "src1", "src2")
      .collect()(0)
    assert(math.abs(r.getAs[Double]("kl_ab")) < 1e-6, s"$r")
    val disj = (0 until 40).map(i => if (i % 2 == 0) ("src1", "aa bb cc")
      else ("src2", "xx yy zz")).toDF("source", "text")
    assert(TextOps.unigramKL(disj, "source", "text", "src1", "src2")
      .collect()(0).getAs[Double]("kl_ab") > 1.0)
  }

  test("log-odds: the group-exclusive token gets the extreme z") {
    val docs = ((0 until 30).map(i => ("src1", "common word special")) ++
      (0 until 30).map(i => ("src2", "common word plain")))
      .toDF("source", "text")
    val rows = TextOps.logOddsTerms(docs, "source", "text", "src1", "src2")
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Double]("z")).toMap
    assert(rows("special") > 3.0, s"$rows")
    assert(rows("plain") < -3.0)
    assert(math.abs(rows("common")) < 0.5)
  }

  test("cliff's delta: complete separation gives ±1, identity gives 0") {
    val df = ((1 to 50).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(i => ("b", i + 100.0))).toDF("g", "v")
    val r = Tests2.cliffsDelta(df, "g", "v", "a", "b").collect()(0)
    assert(r.getAs[Double]("delta") == -1.0, s"$r") // all a below b
    val eq = ((1 to 50).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(i => ("b", i.toDouble))).toDF("g", "v")
    assert(Tests2.cliffsDelta(eq, "g", "v", "a", "b").collect()(0)
      .getAs[Double]("delta") == 0.0)
  }
}
