package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Round-10 text/embedding diagnostics: pooled lexical diversity,
  * char-class drift, n-gram novelty, truncation loss, minhash
  * containment, embedding isotropy. */
class R10TextSpec extends SparkSpec {
  import spark.implicits._

  test("lexicalDiversityByGroup: pooled repetition collapses TTR") {
    val d = Seq(
      (1L, "rep", "alpha beta alpha beta"),
      (2L, "rep", "alpha beta alpha beta"),
      (3L, "var", "one two three four"),
      (4L, "var", "five six seven eight")).toDF("id", "src", "t")
    val r = TextOps.lexicalDiversityByGroup(d, "src", "t")
      .collect().map(x => x.getAs[String]("group") -> x).toMap
    assert(r("rep").getAs[Long]("types") == 2L &&
      r("rep").getAs[Long]("tokens") == 8L)
    assert(r("var").getAs[Long]("types") == 8L &&
      r("var").getAs[Long]("hapax") == 8L)
    assert(r("rep").getAs[Double]("ttr") < r("var").getAs[Double]("ttr"))
  }

  test("charClassDrift: digit-heavy source drifts, prose-like stays low") {
    val prose = "the quick brown fox jumps over the lazy dog again and again"
    val d = Seq(
      (1L, "p1", prose), (2L, "p2", prose),
      (3L, "num", "0123456789 9876543210 1111 2222 3333 4444 5555"))
      .toDF("id", "src", "t")
    val r = TextOps.charClassDrift(d, "src", "t")
      .collect().map(x => x.getAs[String]("group") -> x).toMap
    assert(r("num").getAs[Double]("p_digit") > 0.7)
    assert(r("num").getAs[Double]("js") > r("p1").getAs[Double]("js"),
      "the digit source must diverge more than a prose source")
    // profile fractions sum to 1
    val s = Seq("p_alpha", "p_digit", "p_space", "p_other")
      .map(r("num").getAs[Double]).sum
    assert(math.abs(s - 1.0) < 1e-9)
  }

  test("ngramNovelty: exact duplicate has zero novelty, first doc full") {
    val t = "abcdefghijklmnopqrstuvwxyz0123456789"
    val d = Seq((1L, t), (2L, t), (3L, "completely different words here ok"))
      .toDF("doc_id", "text")
    val r = TextOps.ngramNovelty(d, "doc_id", "text", n = 8)
      .collect().map(x => x.getAs[Long]("id") -> x).toMap
    assert(r(1L).getAs[Double]("novelty") == 1.0)
    assert(r(2L).getAs[Double]("novelty") == 0.0,
      "an exact duplicate introduces no new grams")
    assert(r(3L).getAs[Double]("novelty") == 1.0)
    assert(r(1L).getAs[Long]("distinct_grams") == t.length - 7)
  }

  test("truncationLoss: exact token accounting at the cut") {
    val d = Seq(
      (1L, "s", (1 to 10).map(i => s"w$i").mkString(" ")),  // 10 tokens
      (2L, "s", (1 to 3).map(i => s"w$i").mkString(" ")))   // 3 tokens
      .toDF("id", "src", "t")
    val r = TextOps.truncationLoss(d, "src", "t", maxTokens = 8)
      .collect()(0)
    assert(r.getAs[Long]("docs") == 2L &&
      r.getAs[Long]("docs_truncated") == 1L)
    assert(r.getAs[Long]("tokens") == 13L &&
      r.getAs[Long]("tokens_lost") == 2L)
    assert(math.abs(r.getAs[Double]("loss_frac") - 2.0 / 13) < 1e-9)
  }

  test("minhashContainment: identical docs estimate full containment") {
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = Seq((1L, t), (2L, t), (3L, "unrelated stuff entirely apart ok"))
      .toDF("doc_id", "text")
    val r = TextOps.minhashContainment(d, "doc_id", "text",
      shingleSize = 3, numHashes = 16, bandSize = 4).collect()
    val pair = r.find(x => x.getAs[Long]("a") == 1L &&
      x.getAs[Long]("b") == 2L).get
    assert(pair.getAs[Long]("matches") == 16L)
    assert(pair.getAs[Double]("jhat") == 1.0)
    assert(math.abs(pair.getAs[Double]("containment_a") - 1.0) < 1e-9)
    r.foreach { x =>
      assert(x.getAs[Double]("jhat") >= 0.0 && x.getAs[Double]("jhat") <= 1.0)
    }
  }

  test("betweenness: path graph puts all mass on the middle node") {
    // undirected path a-b-c with ALL nodes as sources: delta(b) = 1 from
    // a's BFS + 1 from c's = 2 (Brandes' unnormalized pair count)
    val und = Seq(("a", "b"), ("b", "c")).toDF("x", "y")
    val both = und.union(und.select(col("y"), col("x")))
    val r = graft.graph.Graph.betweennessSampled(both, "x", "y",
      sources = 3, maxDepth = 3)
      .collect().map(x => x.getAs[String]("node") ->
        x.getAs[Double]("betweenness")).toMap
    assert(math.abs(r("b") - 2.0) < 1e-6, s"middle carries the paths: $r")
    assert(math.abs(r("a")) < 1e-6 && math.abs(r("c")) < 1e-6)
  }

  test("int8 quantization: exact codes at the grid, zero on constants") {
    // dim 0 takes values {0,1} (exactly representable at the int8 grid
    // ends), dim 1 is constant — both reconstruct exactly
    val e = (0 until 8).map(i =>
      (i.toLong, Array((i % 2).toFloat, 3.5f))).toDF("vec_id", "embedding")
    val r = graft.sim.SimJoin.int8QuantError(e, "vec_id", "embedding")
      .collect().map(x => x.getAs[Long]("dim") -> x).toMap
    assert(r(0L).getAs[Double]("mse_e6") < 1e-9 &&
      r(0L).getAs[Double]("max_err_e3") < 1e-9, s"grid ends: ${r(0L)}")
    assert(r(1L).getAs[Double]("mse_e6") < 1e-9, s"constant dim: ${r(1L)}")
    // a mid-grid value has bounded error <= scale/2
    val e2 = Seq((0L, Array(0.0f)), (1L, Array(1.0f)),
      (2L, Array(0.5019f))).toDF("vec_id", "embedding")
    val r2 = graft.sim.SimJoin.int8QuantError(e2, "vec_id", "embedding")
      .collect()(0)
    assert(r2.getAs[Double]("max_err_e3") <= 1000.0 / 255 / 2 + 1e-6)
  }

  test("dedup budget: exact token accounting over duplicate groups") {
    val d = Seq(
      (1L, "s", "a b c"), (2L, "s", "a b c"),     // dup pair, 3 tokens
      (3L, "s", "x y")).toDF("doc_id", "source", "text")
    val r = graft.text.TextOps.exactDedup(d, "doc_id", "text")
    assert(r.where(col("keep")).count() == 2)
    val toks = d.select(col("doc_id"), col("source"),
      size(graft.text.TextOps.tokens(col("text"))).cast("long").as("n"))
    val out = toks.join(r.select("doc_id", "keep"), "doc_id")
      .groupBy("source")
      .agg(sum(when(col("keep"), col("n")).otherwise(0L)).as("kept"),
        sum(col("n")).as("tot")).collect()(0)
    assert(out.getAs[Long]("kept") == 5L && out.getAs[Long]("tot") == 8L)
  }

  test("isotropy: one-hot basis is isotropic, a shared direction is not") {
    val oneHot = (0 until 16).map { i =>
      (i.toLong, Array.tabulate(4)(j => if (j == i % 4) 1.0f else 0.0f))
    }.toDF("vec_id", "embedding")
    val iso = graft.sim.SimJoin.isotropy(oneHot, "vec_id", "embedding")
      .collect()(0)
    assert(math.abs(iso.getAs[Double]("isotropy") - 0.75) < 1e-6,
      s"rotating one-hot: 1 - 0.25/1.0: $iso")
    assert(math.abs(iso.getAs[Double]("var_ratio") - 1.0) < 1e-6)
    val same = (0 until 8).map(i =>
      (i.toLong, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val iso2 = graft.sim.SimJoin.isotropy(same, "vec_id", "embedding")
      .collect()(0)
    assert(math.abs(iso2.getAs[Double]("isotropy")) < 1e-6,
      s"identical vectors share one direction: $iso2")
  }
}
