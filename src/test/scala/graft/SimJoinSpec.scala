package graft

import graft.post.Relational2
import graft.sim.SimJoin
import org.apache.spark.sql.functions._

/** Prefix-filter similarity join + relational finishing operators. */
class SimJoinSpec extends SparkSpec {
  import spark.implicits._

  test("prefix jaccard join: finds exactly the pairs above tau") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d f"), // J = 4/6 = 0.667
      (3L, "a b c d e"), // dup of 1 → J = 1
      (4L, "x y z w q") // unrelated
    ).toDF("doc_id", "text")
    val r6 = SimJoin.prefixJaccardJoin(docs, "doc_id", "text", 0.6)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(r6 == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"$r6")
    val r9 = SimJoin.prefixJaccardJoin(docs, "doc_id", "text", 0.9)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(r9 == Set((1L, 3L)), s"$r9")
  }

  test("prefix jaccard candidate gate: filters keep the pair frame bounded at sf0.01") {
    // r12 verdict item 1: q412's load cliff is a candidate-pair blowup in
    // disguise — gate the candidate:result ratio at fixture scale so a
    // prefix/positional/length-filter regression fails HERE, not as a 7×
    // loaded-host bench spread. Measured on the round-13 tree: 35,536
    // candidates for 9,020 result pairs (3.9×) on the near-dup-heavy
    // sf0.01 fixture at τ=0.9 — the 8× cap gives 2× headroom while any
    // lost filter stage (prefix, length, positional, pair-prefix) blows
    // through it by orders of magnitude.
    val docs = core.table(spark, sfDir01, "documents")
    val (_, cand) = SimJoin.prefixCandidates(docs, "doc_id", "text", 0.9)
    val nCand = cand.count()
    val nRes = SimJoin.prefixJaccardJoin(docs, "doc_id", "text", 0.9).count()
    assert(nRes > 0, "fixture produced no near-dup pairs — gate is vacuous")
    assert(nCand <= 8L * nRes + 100,
      s"candidate blowup: $nCand candidates for $nRes result pairs — " +
        "a prefix-filter stage regressed (this is the q412 load-cliff signature)")
  }

  test("tfidf top-k: identical docs are each other's top neighbor") {
    val docs = Seq(
      (1L, "apple banana cherry"), (2L, "apple banana cherry"),
      (3L, "dog cat bird"), (4L, "apple dog")).toDF("doc_id", "text")
    val top1 = SimJoin.tfidfTopK(docs, "doc_id", "text", 1)
      .collect().map(r => r.getAs[Long]("a") -> r.getAs[Long]("b")).toMap
    assert(top1(1L) == 2L && top1(2L) == 1L, s"$top1")
    val cos12 = SimJoin.tfidfTopK(docs, "doc_id", "text", 1)
      .where(col("a") === 1).collect()(0).getAs[Double]("cos")
    assert(math.abs(cos12 - 1.0) < 1e-6)
  }

  test("skyline2d matches the brute-force dominance filter") {
    val pts = Seq((1L, 1.0, 5.0), (2L, 2.0, 3.0), (3L, 3.0, 4.0),
      (4L, 4.0, 1.0), (5L, 2.0, 3.0), (6L, 5.0, 5.0)).toDF("id", "x", "y")
    val sky = Relational2.skyline2d(pts, "id", "x", "y")
      .collect().map(_.getAs[Long]("id")).toSet
    // brute: (3) dominated by (2); (6) dominated by everything cheap
    assert(sky == Set(1L, 2L, 4L, 5L), s"$sky")
  }

  test("group mode and weighted median on hand fixtures") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 2.0), ("g", 3.0),
      ("h", 7.0), ("h", 5.0), ("h", 5.0), ("h", 7.0)).toDF("grp", "v")
    val modes = Relational2.groupMode(df, "grp", "v")
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Double]("mode")).toMap
    assert(modes == Map("g" -> 2.0, "h" -> 5.0), s"$modes") // tie → smaller
    val wm = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 3.0, 10L))
      .toDF("grp", "v", "w")
    val m = Relational2.weightedMedian(wm, "grp", "v", "w").collect()(0)
    assert(m.getAs[Double]("wmedian") == 3.0 && m.getAs[Long]("w_total") == 12L)
  }
}
