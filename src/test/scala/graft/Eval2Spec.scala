package graft

import graft.model.Eval2
import org.apache.spark.sql.functions._

/** Ranking metrics (NDCG/MAP/MRR/P@k), scorer diagnostics (lift, KS,
  * Brier decomposition) and the agreement family on hand-checkable
  * fixtures. */
class Eval2Spec extends SparkSpec {
  import spark.implicits._

  // one query, 4 candidates: scores rank c,d,b,a; rel 3,0,2,1
  private def tiny = Seq(
    ("q1", 1L, 4.0, 3L, true), ("q1", 2L, 1.0, 1L, false),
    ("q1", 3L, 2.0, 2L, true), ("q1", 4L, 3.0, 0L, false)
  ).toDF("q", "id", "score", "rel", "y")

  test("ndcg@k: perfect-order query scores 1, known case matches hand calc") {
    val r = Eval2.ndcgAtK(tiny, "q", "id", "score", "rel", 10).collect()(0)
    // ranked by score desc: rel 3,0,2,1; ideal 3,2,1,0
    def g(rel: Long, i: Int) = rel / (math.log(i + 1.0) / math.log(2.0))
    val dcg = g(3, 1) + g(0, 2) + g(2, 3) + g(1, 4)
    val idcg = g(3, 1) + g(2, 2) + g(1, 3) + g(0, 4)
    assert(math.abs(r.getAs[Double]("dcg") - dcg) < 1e-4)
    assert(math.abs(r.getAs[Double]("ndcg") - dcg / idcg) < 1e-3)
    // perfect ordering: score == rel
    val perfect = Seq(("p", 1L, 3.0, 3L), ("p", 2L, 2.0, 2L), ("p", 3L, 1.0, 1L))
      .toDF("q", "id", "score", "rel")
    val p = Eval2.ndcgAtK(perfect, "q", "id", "score", "rel", 10).collect()(0)
    assert(math.abs(p.getAs[Double]("ndcg") - 1.0) < 1e-6)
  }

  test("map/mrr/p@k: positives at ranks 1 and 3") {
    // ranked: id1(y), id4(n), id3(y), id2(n)
    val ap = Eval2.mapAtK(tiny, "q", "id", "score", "y", 10).collect()(0)
    // AP = (1/1 + 2/3) / 2
    assert(math.abs(ap.getAs[Double]("ap") - (1.0 + 2.0 / 3) / 2) < 1e-4)
    val rr = Eval2.mrrAtK(tiny, "q", "id", "score", "y", 10).collect()(0)
    assert(rr.getAs[Int]("first_rank") == 1)
    assert(rr.getAs[Double]("rr") == 1.0)
    val pk = Eval2.precisionAtK(tiny, "q", "id", "score", "y", 2).collect()(0)
    assert(pk.getAs[Long]("hits") == 1L) // top-2 = ids 1,4 → one positive
    assert(math.abs(pk.getAs[Double]("p_at_k") - 0.5) < 1e-9)
    assert(math.abs(pk.getAs[Double]("r_at_k") - 0.5) < 1e-9)
  }

  test("decile lift: perfectly separating scorer concentrates positives in bin 0") {
    val df = (0 until 1000).map(i => (1000.0 - i, i < 100)).toDF("s", "y")
    val rows = Eval2.decileLift(df, "s", "y", 10).orderBy("bin").collect()
    assert(rows.length == 10)
    assert(rows(0).getAs[Double]("pos_rate") == 1.0)
    assert(math.abs(rows(0).getAs[Double]("lift") - 10.0) < 1e-9)
    assert(math.abs(rows(0).getAs[Double]("cum_gain") - 1.0) < 1e-9)
    assert(rows(9).getAs[Long]("pos") == 0L)
  }

  test("ks separation: perfect scorer has KS 1, constant scorer KS 0") {
    val sep = (0 until 100).map(i => (i.toDouble, i >= 50)).toDF("s", "y")
    val k1 = Eval2.ksSeparation(sep, "s", "y").collect()(0)
    assert(math.abs(k1.getAs[Double]("ks") - 1.0) < 1e-9)
    val const = (0 until 100).map(i => (1.0, i % 2 == 0)).toDF("s", "y")
    assert(Eval2.ksSeparation(const, "s", "y").collect()(0)
      .getAs[Double]("ks") == 0.0)
  }

  test("brier decomposition: BS = rel - res + unc on a calibrated forecaster") {
    // p = 0.25 for 400 rows with 25% positives; p = 0.75 for 400 with 75%
    val df = (0 until 800).map { i =>
      if (i < 400) (0.25, i % 4 == 0) else (0.75, i % 4 != 0)
    }.toDF("p", "y")
    val r = Eval2.brierDecomposition(df, "p", "y", 10).collect()(0)
    val (bs, rel, res, unc) = (r.getAs[Double]("bs"),
      r.getAs[Double]("reliability"), r.getAs[Double]("resolution"),
      r.getAs[Double]("uncertainty"))
    assert(math.abs(rel) < 1e-6, s"calibrated ⇒ reliability 0: $rel")
    assert(math.abs(bs - (rel - res + unc)) < 1e-4)
    assert(math.abs(unc - 0.25) < 1e-9) // base rate 1/2
    assert(math.abs(res - 0.0625) < 1e-6) // E[(ok−ō)²] = (1/4)²
  }

  test("agreement: identical raters hit kappa/alpha 1, independent near 0") {
    val same = (0 until 200).map(i => (i % 5, i % 5)).toDF("r1", "r2")
    val kw = Eval2.weightedKappa(same, "r1", "r2", 5).collect()(0)
    assert(kw.getAs[Double]("kappa_w") == 1.0)
    // Fleiss: all three raters agree on every item → kappa 1
    val agree = (0 until 300).map(i => (i / 3, (i / 3) % 4)).toDF("item", "cat")
    val fk = Eval2.fleissKappa(agree, "item", "cat", 3).collect()(0)
    assert(math.abs(fk.getAs[Double]("kappa") - 1.0) < 1e-9)
    val ka = Eval2.krippendorffAlpha(agree, "item", "cat").collect()(0)
    assert(math.abs(ka.getAs[Double]("alpha") - 1.0) < 1e-9)
    // maximal disagreement on every pair → alpha < 0
    val disj = (0 until 300).map(i => (i / 3, i % 3)).toDF("item", "cat")
    assert(Eval2.krippendorffAlpha(disj, "item", "cat").collect()(0)
      .getAs[Double]("alpha") < 0.0)
  }
}
