package graft

import graft.model.Fitters
import graft.score.Scorers
import graft.score.Scorers.Cfg
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Empty/degenerate-input behavior: a user switching from the reference
  * hits empty partitions, empty corpora and single-row keys long before
  * 100 TB; every family must degrade to empty/neutral output, never
  * throw. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def emptyEvents = Seq.empty[(String, Long, Double)].toDF("k", "id", "x")
  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("fitters on empty input yield empty models, scorers yield empty output") {
    val stats = Fitters.stats(emptyEvents, Seq("k"), Seq("x"))
    assert(stats.count() == 0)
    assert(Fitters.robustStats(emptyEvents, Seq("k"), Seq("x")).count() == 0)
    assert(Fitters.histogram(emptyEvents, Seq("k"), Seq(("x", 10.0))).count() == 0)
    assert(Fitters.quantileSketch(emptyEvents, Seq("k"), "id", "x", 8).count() == 0)
    val emptyToks = emptyEvents.select(col("k"), col("x").cast("string").as("v"))
    assert(Fitters.kmvSketch(emptyToks, Seq("k"), "v", 8).count() == 0)
    assert(Fitters.cmsSketch(emptyToks, Seq("k"), "v", 2, 16).count() == 0)
    // scoring fresh data against an empty model: no rows match the join
    val data = Seq(("a", 1L, 5.0)).toDF("k", "id", "x")
    val scored = Scorers.zscore(data, stats, Cfg(Seq("k"), Seq("x"), threshold = 2.0))
    // model join is left-ish: rows survive but carry the I (indeterminate) tag
    assert(scored.collect().forall(_.getAs[String]("tag") == "I"))
  }

  test("text ops on an empty corpus are empty, not errors") {
    assert(TextOps.exactDedup(emptyDocs, "doc_id", "text").count() == 0)
    assert(TextOps.minhashPairs(emptyDocs, "doc_id", "text", 3, 16, 4).count() == 0)
    assert(TextOps.dupClusters(emptyDocs, "doc_id",
      Seq.empty[(Long, Long)].toDF("a", "b")).count() == 0)
    assert(TextOps.gopherRules(emptyDocs, "doc_id", "text").count() == 0)
    assert(TextOps.qualityScore(emptyDocs, "doc_id", "text").count() == 0)
    assert(TextOps.lineDedup(emptyDocs, "doc_id", "text", 2).count() == 0)
    assert(TextOps.bm25Search(emptyDocs, "doc_id", "text",
      Seq("anything"), 5).count() == 0)
    assert(TextOps.unimaxAllocate(
      emptyDocs.withColumn("w", org.apache.spark.sql.functions.lit(1.0)),
      "text", "w", 100.0, 2.0).count() == 0)
  }

  test("single-row keys: degenerate but defined") {
    val one = Seq(("a", 1L, 5.0)).toDF("k", "id", "x")
    // stats: std of one row is null (stddev_samp) -> scorer tags I
    val m = Fitters.stats(one, Seq("k"), Seq("x"))
    val scored = Scorers.zscore(one, m, Cfg(Seq("k"), Seq("x"), threshold = 2.0))
    assert(scored.collect().forall(_.getAs[String]("tag") == "I"))
    // quantile sketch of one row: all probs collapse to the value
    val est = Fitters.quantileSketchEstimate(
      Fitters.quantileSketch(one, Seq("k"), "id", "x", 8), Seq("k"), Seq(0.25, 0.75))
      .head()
    assert(est.getAs[Double]("p25") == 5.0 && est.getAs[Double]("p75") == 5.0)
    // seasonal decompose: frame never fills -> trend/z null, no throw
    val sd = graft.seq.SeqOps.seasonalDecompose(one, Seq("k"), "id", "x", 4).head()
    assert(sd.isNullAt(sd.fieldIndex("trend")))
  }

  test("sequential detectors: empty input empty, single row defined and quiet") {
    import graft.drift.Drift
    assert(Drift.cusum(emptyEvents, Seq("k"), "id", "x").count() == 0)
    assert(Drift.pageHinkley(emptyEvents, Seq("k"), "id", "x").count() == 0)
    val one = Seq(("a", 1L, 5.0)).toDF("k", "id", "x")
    // one row: baseline std is 0, z = x-mu0 over the 1e-9 floor -> g
    // explodes, but alarm requires rn > warmup so stays quiet
    val c = Drift.cusum(one, Seq("k"), "id", "x", warmup = 100).head()
    assert(!c.getAs[Boolean]("alarm"))
    val p = Drift.pageHinkley(one, Seq("k"), "id", "x").head()
    assert(p.getAs[Double]("phInc") == 0.0 && !p.getAs[Boolean]("drift"))
  }

  test("span rewrite / mmr on empty or degenerate input") {
    assert(TextOps.spanRewrite(emptyDocs, "doc_id", "text", k = 8).count() == 0)
    // all-duplicate corpus: one survivor document, the rest rewrite to ''
    val dups = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b c")).toDF("doc_id", "text")
    val out = TextOps.spanRewrite(dups, "doc_id", "text", k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("newText")).toMap
    assert(out == Map(1L -> "a b c", 2L -> "", 3L -> ""))
    // empty-text doc: zero windows, rewrites to ''
    val withEmpty = Seq((1L, "a b c"), (2L, "")).toDF("doc_id", "text")
    val oe = graft.text.TextOps.spanRewrite(withEmpty, "doc_id", "text", k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("nWindows"), r.getAs[String]("newText")))).toMap
    assert(oe(2L) == ((0L, "")))
    // mmr: empty corpus -> empty; k larger than corpus -> all rows ranked
    import graft.sim.Similarity
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.mmrSelect(emptyVecs, "vec_id", "embedding",
      Array(1.0, 0.0), k = 5).count() == 0)
    val two = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f))).toDF("vec_id", "embedding")
    assert(Similarity.mmrSelect(two, "vec_id", "embedding",
      Array(1.0, 0.0), k = 5).count() == 2)
  }

  test("curation-audit ops on degenerate input: defined, never throw") {
    import graft.sim.Similarity
    // single label: there is no "other" centroid — silhouette is
    // undefined; the row survives with a null sil instead of an error
    val one = Seq((1L, Array(1f, 0f), 0), (2L, Array(0f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
    val sil = Similarity.silhouette(one, "embedding", "label").collect()
    assert(sil.length == 1 && sil(0).getAs[Long]("n") == 2 &&
      sil(0).isNullAt(sil(0).fieldIndex("sil")))
    // empty embeddings: empty frame, no crash on the centroid collect
    val noEmb = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.silhouette(noEmb, "embedding", "label").count() == 0)
    // single source: overlap matrix has no pairs but doesn't throw
    val oneSrc = Seq((1L, "alpha beta gamma delta", "a"))
      .toDF("doc_id", "text", "source")
    assert(TextOps.sourceOverlap(oneSrc, "source", "text", 3).count() == 0)
    // minCount above every token count: empty signature, not an error
    assert(TextOps.sourceSignature(oneSrc, "source", "text",
      topK = 5, minCount = 100).count() == 0)
    // empty corpus through both ops
    val noDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    assert(TextOps.sourceOverlap(noDocs, "source", "text", 3).count() == 0)
    assert(TextOps.sourceSignature(noDocs, "source", "text", 5, 1).count() == 0)
  }

  test("fused curation on empty / degenerate corpora: defined, never throws") {
    // empty corpus: vocab fit, LSH, LM and the quota window all see zero
    // rows; the eager vocab action must not blow up on the empty agg
    val noDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    assert(TextOps.curationQuotaFused(noDocs, "doc_id", "source", "text")
      .count() == 0)
    // single-token docs: below the shingle size (empty minhash signature,
    // no LSH bands) and below the bigram order (no LM grams → avgNll 0.0);
    // every doc is its own dedup survivor, so the quota gate decides alone
    val tiny = Seq((1L, "the", "s"), (2L, "the", "s"))
      .toDF("doc_id", "text", "source")
    val out = TextOps.curationQuotaFused(tiny, "doc_id", "source", "text",
      minQuality = 0.0, maxNll = 10.0).collect()
    assert(out.length == 2, s"both sub-shingle docs must survive: ${out.toSeq}")
    assert(out.forall(_.getAs[Double]("avgNll") == 0.0))
  }

  test("round-8 fits fail loudly or degrade cleanly on degenerate input") {
    // empty corpora must not NaN-poison a fit: loud errors instead
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      graft.sim.KMeansDist.fit(emptyVecs, "vec_id", "embedding",
        dim = 2, k = 2, iters = 1)
    }
    val emptyFeat = Seq.empty[(Double, Double)].toDF("f0", "y")
    intercept[IllegalArgumentException] {
      TextOps.logRegFit(emptyFeat, Seq("f0"), "y", iters = 1, lr = 0.5)
    }
    // BPE on a corpus with no alphabetic tokens → zero merge rules
    val numeric = Seq((1L, "123 456 789")).toDF("doc_id", "text")
    assert(TextOps.bpeTrain(numeric, "doc_id", "text", 5, 100).count() == 0)
    // dbscan1d with a single point per key: the point is its own
    // ε-neighborhood; minPts=1 makes it a singleton cluster, minPts=2 noise
    val lone = Seq((1L, "a", 5.0)).toDF("event_id", "key", "value")
    val c1 = graft.multi.ClusterScore.dbscan1d(lone, Seq("key"), "value",
      "event_id", 1.0, 1).collect()(0)
    assert(c1.getAs[Boolean]("is_core") && c1.getAs[Long]("cluster") == 1L)
    val c2 = graft.multi.ClusterScore.dbscan1d(lone, Seq("key"), "value",
      "event_id", 1.0, 2).collect()(0)
    assert(!c2.getAs[Boolean]("is_core") && c2.getAs[String]("tag") == "O")
    // grid dbscan: all points identical (one hot cell) — all core, one cluster
    val same = (1L to 6L).map(i => (i, 1.0, 1.0)).toDF("id", "x", "y")
    val g = graft.multi.ClusterScore.dbscanGrid(same, "id", "x", "y",
      eps = 0.1, minPts = 5).collect()
    assert(g.forall(_.getAs[Boolean]("is_core")))
    assert(g.map(_.getAs[Long]("cluster")).toSet == Set(1L))
  }
}
