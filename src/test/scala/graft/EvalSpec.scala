package graft

import graft.model.Eval
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Double, Boolean)]): Double =
    Eval.binaryAuc(rows.toDF("score", "y"), "score", "y")
      .collect()(0).getDouble(3)

  test("binaryAuc: perfect separation 1.0, inverted 0.0, all-ties 0.5") {
    val pos = (1 to 5).map(i => (10.0 + i, true))
    val neg = (1 to 5).map(i => (i.toDouble, false))
    assert(auc(pos ++ neg) == 1.0)
    assert(auc(pos.map { case (s, _) => (s, false) } ++
      neg.map { case (s, _) => (s, true) }) == 0.0)
    assert(auc(Seq((1.0, true), (1.0, false), (1.0, true), (1.0, false))) == 0.5)
  }

  test("binaryAuc: average-rank ties match the pairwise probability definition") {
    val rows = Seq((1.0, true), (2.0, false), (2.0, true), (2.0, true),
      (3.0, false), (4.0, true), (4.0, false))
    // brute force: P(pos > neg) + 0.5 P(pos == neg)
    val ps = rows.filter(_._2).map(_._1); val ns = rows.filterNot(_._2).map(_._1)
    val pairs = for (p <- ps; q <- ns) yield
      (if (p > q) 1.0 else if (p == q) 0.5 else 0.0)
    val expected = pairs.sum / pairs.length
    assert(math.abs(auc(rows) - expected) < 1e-12, s"${auc(rows)} vs $expected")
    // partitioning-independent
    val viaRepart = Eval.binaryAuc(rows.toDF("score", "y").repartition(5),
      "score", "y").collect()(0).getDouble(3)
    assert(viaRepart == auc(rows))
  }

  test("confusionAt + prCurve: counts and ratios line up") {
    val df = Seq((5.0, true), (4.0, true), (3.0, false), (2.0, true), (1.0, false))
      .toDF("score", "y")
    val c = Eval.confusionAt(df, "score", "y", threshold = 2.5).collect()(0)
    assert((c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3)) == ((2L, 1L, 1L, 1L)))
    assert(c.getDouble(4) == 2.0 / 3 && c.getDouble(5) == 2.0 / 3)
    val pr = Eval.prCurve(df, "score", "y").orderBy(col("threshold_ge").desc)
      .collect()
    assert(pr.length == 5)
    assert(pr(0).getLong(2) == 1 && pr(0).getDouble(3) == 1.0) // top-1: tp=1, prec 1
    assert(pr(4).getDouble(4) == 1.0, "full sweep reaches recall 1")
  }
}
