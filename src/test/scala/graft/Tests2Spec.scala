package graft

import graft.model.Tests2
import org.apache.spark.sql.functions._

/** Round-9 test battery on hand-computable fixtures. */
class Tests2Spec extends SparkSpec {
  import spark.implicits._

  test("brunner-munzel: p_hat is the exact pair fraction") {
    // x={1,3} y={2,4}: P(X<Y) = 3/4 of the 4 pairs
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 4.0))
      .toDF("g", "v")
    val r = Tests2.brunnerMunzel(df, "g", "v", "a", "b").collect()(0)
    assert(math.abs(r.getAs[Double]("p_hat") - 0.75) < 1e-9)
    // symmetric swap flips around 1/2
    val r2 = Tests2.brunnerMunzel(df, "g", "v", "b", "a").collect()(0)
    assert(math.abs(r2.getAs[Double]("p_hat") - 0.25) < 1e-9)
  }

  test("ansari-bradley: tighter sample collects higher mid-rank scores") {
    // a clusters mid-range, b at extremes: AB_a > E[AB]
    val a = Seq(4.9, 5.0, 5.1, 5.2).map(("a", _))
    val b = Seq(1.0, 2.0, 9.0, 10.0).map(("b", _))
    val r = Tests2.ansariBradley((a ++ b).toDF("g", "v"), "g", "v", "a", "b")
      .collect()(0)
    // N=8 scores: 1,2,3,4,4,3,2,1 → a holds the two 4s and two 3s = 14
    assert(math.abs(r.getAs[Double]("ab_stat") - 14.0) < 1e-6)
    assert(r.getAs[Double]("z") > 2.0)
  }

  test("jonckheere: fully ordered doses give J = all concordant pairs") {
    val df = Seq((0L, 1.0), (0L, 2.0), (1L, 3.0), (1L, 4.0),
      (2L, 5.0), (2L, 6.0)).toDF("dose", "v")
    val r = Tests2.jonckheereTerpstra(df, "dose", "v").collect()(0)
    // 3 group pairs × 4 cross pairs each, all ascending
    assert(r.getAs[Double]("j_stat") == 12.0)
    assert(r.getAs[Double]("z") > 2.0)
  }

  test("cochran-armitage: monotone dose-response yields a large |z|") {
    val rows = (0 until 4).flatMap { d =>
      (0 until 20).map(i => (d.toLong, i < d * 6)) // 0%,30%,60%,90%
    }
    val r = Tests2.cochranArmitage(rows.toDF("dose", "pos"), "dose", "pos")
      .collect()(0)
    assert(math.abs(r.getAs[Double]("z")) > 4.0)
    val flat = (0 until 4).flatMap(d => (0 until 20).map(i => (d.toLong, i < 10)))
    assert(math.abs(Tests2.cochranArmitage(flat.toDF("dose", "pos"),
      "dose", "pos").collect()(0).getAs[Double]("z")) < 1e-9)
  }

  test("cmh: identical strata with strong association") {
    // each of 3 strata: exposed 18/20 pos, unexposed 2/20 pos
    val rows = (0 until 3).flatMap { s =>
      (0 until 20).map(i => (s.toString, true, i < 18)) ++
        (0 until 20).map(i => (s.toString, false, i < 2))
    }
    val r = Tests2.cmh(rows.toDF("s", "e", "y"), "s", "e", "y").collect()(0)
    assert(r.getAs[Long]("k") == 3L)
    assert(r.getAs[Double]("or_mh") > 20.0)
    assert(r.getAs[Double]("cmh_chi2") > 30.0)
    assert(r.getAs[Double]("bd_chi2") < 1.0) // homogeneous by construction
  }

  test("dagostino: symmetric data has small z_skew, skewed data large") {
    val sym = (-50 to 50).map(i => ("s", i.toDouble))
    val skw = (0 to 100).map(i => ("k", i.toDouble * i))
    val df = (sym ++ skw).toDF("g", "v")
    val m = Tests2.dagostinoK2(df, "g", "v").collect()
      .map(r => r.getAs[String]("key") -> r).toMap
    assert(math.abs(m("s").getAs[Double]("z_skew")) < 0.1)
    assert(m("k").getAs[Double]("z_skew") > 2.0)
    assert(m("k").getAs[Double]("k2") > 5.0)
  }

  test("durbin-watson: alternating residuals push DW toward 4") {
    val df = (0 until 200).map(i =>
      ("a", i.toLong, i.toLong, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("g", "x", "o", "v")
    val r = Tests2.durbinWatson(df, "g", "x", "o", "v").collect()(0)
    assert(r.getAs[Double]("dw") > 3.5, s"alternating ⇒ dw≈4: $r")
  }

  test("breusch-pagan: variance growing with x is flagged, constant is not") {
    val het = (1 until 200).map(i =>
      ("h", i.toLong, i * (if (i % 2 == 0) 0.1 else -0.1)))
    val hom = (1 until 200).map(i =>
      ("c", i.toLong, if (i % 2 == 0) 1.0 else -1.0))
    val m = Tests2.breuschPagan((het ++ hom).toDF("g", "x", "v"), "g", "x", "v")
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Double]("lm")).toMap
    assert(m("h") > 30.0, s"heteroscedastic LM: ${m("h")}")
    assert(m("c") < 5.0, s"homoscedastic LM: ${m("c")}")
  }

  test("cox-stuart: monotone series is all up-pairs") {
    val df = (0 until 100).map(i => ("a", i.toLong, i.toDouble))
      .toDF("g", "o", "v")
    val r = Tests2.coxStuart(df, "g", "o", "v").collect()(0)
    assert(r.getAs[Long]("n_pairs") == 50L)
    assert(r.getAs[Long]("n_up") == 50L)
    assert(r.getAs[Double]("z") > 6.0)
  }

  test("bartels: alternating ranks give RVN near 4, trend near 0") {
    val alt = (0 until 100).map(i =>
      ("alt", i.toLong, if (i % 2 == 0) i.toDouble else -i.toDouble))
    val tr = (0 until 100).map(i => ("tr", i.toLong, i.toDouble))
    val m = Tests2.bartelsRank((alt ++ tr).toDF("g", "o", "v"), "g", "o", "v")
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Double]("rvn")).toMap
    assert(m("alt") > 3.0, s"anti-persistent: ${m("alt")}")
    assert(m("tr") < 0.5, s"trending: ${m("tr")}")
  }
}
