package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-curve probe: runs headline operators at 1×/2×/4× of
  * SPARK_GRAFT_SF_DIR (rows and entities both scale — unioned copies are
  * re-keyed) and prints sec + rows/s per (operator, scale). Near-constant
  * rows/s across scales = the plan scales linearly in data volume;
  * super-linear fall-off exposes an operator that would not survive
  * 100 TB. Results are recorded in SCALING.md. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def scaled(name: String, idCols: Seq[String], n: Int): DataFrame = {
      val base = core.table(spark, sfDir, name)
      (0 until n).map { i =>
        idCols.foldLeft(base)((df, c) =>
          df.withColumn(c, col(c) + lit(i.toLong * 1000000000L)))
      }.reduce(_ unionByName _)
    }

    // SPARK_GRAFT_OPS=op1,op2 re-measures a subset without paying for the
    // whole suite (probe blocks are wall-clock sensitive; a loaded host
    // contaminates every line that shares its block)
    val opsFilter = sys.env.get("SPARK_GRAFT_OPS")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    def time(op: String, n: Int, rows: Long)(f: => Long): Unit = {
      if (opsFilter.nonEmpty && !opsFilter.contains(op)) return
      val t0 = System.nanoTime()
      val out = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $op%-16s x$n rows=$rows%9d out=$out%9d ${s}%6.2f s ${rows / s / 1e6}%6.2f Mrows/s")
    }

    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,2,4")
      .split(",").map(_.trim.toInt).toSeq
    for (n <- scales) {
      val ev = scaled("events", Seq("event_id", "user_id"), n)
      val nEv = ev.count()
      time("zscore_fit_score", n, nEv) {
        val stats = model.Fitters.stats(ev, Seq("event_type"), Seq("value"))
        score.Scorers.zscore(ev, stats,
          score.Scorers.Cfg(Seq("event_type"), Seq("value"), threshold = 2.0)).count()
      }
      time("window_chgpoint", n, nEv) {
        seq.SeqOps.changePointMeanShift(ev, Seq("event_type"), "event_id",
          "value", window = 30, critValue = 3.0).count()
      }
      time("halo_chgpoint", n, nEv) {
        seq.HaloWindows.changePointMeanShift(ev, Seq("event_type"), "event_id",
          "value", window = 30, critValue = 3.0).count()
      }
      time("window_segments", n, nEv) {
        seq.SeqOps.levelShiftSegments(ev, Seq("event_type"), "event_id",
          "value", window = 20, minZ = 3.0).count()
      }
      time("halo_segments", n, nEv) {
        seq.HaloWindows.levelShiftSegments(ev, Seq("event_type"), "event_id",
          "value", window = 20, minZ = 3.0).count()
      }
      val docs = scaled("documents", Seq("doc_id"), n)
      val nDocs = docs.count()
      time("minhash_sig", n, nDocs) {
        text.TextOps.minhash(docs, "doc_id", "text", 3, 16).count()
      }
      time("dedup_pipeline", n, nDocs) {
        val cand = text.TextOps.minhashPairs(docs, "doc_id", "text", 3, 16, 4)
        text.TextOps.dedupSurvivors(
          text.TextOps.dupClusters(docs, "doc_id", cand)).count()
      }
      time("span_dedup", n, nDocs) {
        text.TextOps.spanDedup(docs, "doc_id", "text", k = 8, stride = 4).count()
      }
      time("decontam_bloom", n, nDocs) {
        val isEval = text.TextOps.hash56(col("doc_id").cast("string")) % 20 === 0
        text.TextOps.decontaminateBloom(docs.where(!isEval), docs.where(isEval),
          "doc_id", "text", n = 6).count()
      }
      time("chunk_pack", n, nDocs) {
        val ch = text.TextOps.chunkDocs(docs, "doc_id", "text", 32, 8)
          .join(docs.select(col("doc_id"), col("source")), "doc_id")
        text.TextOps.packGreedy(ch, "source", "doc_id", "chunkIdx", "nTok", 128)
          .count()
      }
      // staged (five tokenize passes) vs fused (one) curation — the
      // q103/q161 pair; the gap should WIDEN with scale since the fused
      // pass amortizes extraction while the staged one re-pays it 5×
      time("curation_staged", n, nDocs) {
        val q = text.TextOps.qualityScore(docs, "doc_id", "text")
          .select(col("doc_id"), col("quality"))
        val l = text.TextOps.langId(docs, "doc_id", "text")
          .select(col("doc_id"), col("predLang"))
        val cand = text.TextOps.minhashPairs(docs, "doc_id", "text", 3, 16, 4)
        val surv = text.TextOps.dedupSurvivors(
          text.TextOps.dupClusters(docs, "doc_id", cand)).select(col("doc_id"))
        val lm = text.TextOps.lmScore(docs, "doc_id", "text")
          .select(col("doc_id"), col("avgNll"))
        val kept = docs.select(col("doc_id"), col("source"))
          .join(q, "doc_id").join(l, "doc_id").join(surv, "doc_id")
          .join(lm, "doc_id")
          .where(col("quality") >= 0.5 && col("predLang") === "en" &&
            col("avgNll") <= 3.45)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("quality").desc, col("doc_id"))
        kept.withColumn("rank", row_number().over(w))
          .where(col("rank") <= 12).count()
      }
      time("curation_fused", n, nDocs) {
        text.TextOps.curationQuotaFused(docs, "doc_id", "source", "text",
          shingleSize = 3, numHashes = 16, bandSize = 4).count()
      }
      // exact prefix-filter Jaccard join (q412). Every token gets a
      // per-copy prefix: identical unsalted copies would make every
      // cross-copy pair a Jaccard-1.0 match and the OUTPUT would grow
      // n² by construction (the documented output-sized contract, not a
      // plan property) — salting keeps matches within-copy so the curve
      // measures the candidate-generation + verify machinery itself,
      // which is what has to scale
      time("prefix_jaccard", n, nDocs) {
        val cp = floor(col("doc_id") / lit(1000000000L)).cast("string")
        val salted = docs.withColumn("text",
          regexp_replace(col("text"), lit("(\\S+)"), concat(cp, lit("_$1"))))
        sim.SimJoin.prefixJaccardJoin(salted, "doc_id", "text", tau = 0.9)
          .count()
      }
      // ANN family (q59/q61/q97 shapes): fixed 20-query batch against the
      // n×-scaled corpus — brute force is the linear baseline; IVF probes
      // 2 of 8 cells; PQ splits one-time index build from the ADC search
      // over the prebuilt (persisted) code table
      // copies get a deterministic per-copy shift: n× real data means n×
      // DISTINCT vectors, and identical copies degenerate every sampled
      // quantizer (the md5-ordered sample collapses to ~maxSample/n
      // distinct points → skewed cells → quadratic within-cell pairs —
      // that measures degenerate input, not the plan)
      val embBase = core.table(spark, sfDir, "embeddings")
      val emb = (0 until n).map { i =>
        embBase.withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000000L))
          .withColumn("embedding",
            transform(col("embedding"), x => x + lit(i * 0.037)))
      }.reduce(_ unionByName _)
      val nEmb = emb.count()
      val qv = core.table(spark, sfDir, "embeddings").where(col("vec_id") < 20)
      time("ann_brute", n, nEmb) {
        sim.Similarity.bruteForceTopK(qv, emb, "vec_id", "embedding", k = 10).count()
      }
      time("ann_ivf", n, nEmb) {
        sim.Similarity.ivfTopKDeterministic(qv, emb, "vec_id", "embedding",
          dim = 64, nCells = 8, nProbe = 2, k = 10, iters = 10,
          maxSample = 4096).count()
      }
      var pq: sim.Similarity.PqIndex = null
      time("ann_pq_build", n, nEmb) {
        pq = sim.Similarity.pqBuildDeterministic(emb, "vec_id", "embedding",
          dim = 64, m = 4, kCodes = 8, iters = 5, maxSample = 4096)
        pq = pq.copy(codes = pq.codes.persist())
        pq.codes.count()
      }
      time("ann_pq_search", n, nEmb) {
        sim.Similarity.pqSearchDeterministic(qv, pq, emb, "vec_id", "embedding",
          k = 10, shortlist = 50).count()
      }
      if (pq != null) pq.codes.unpersist(blocking = false)
      // halo kernel at a forced ≥1000-partition layout: the routed halo
      // exchange keeps the driver at O(numPartitions) counts, so this
      // must track the 32-partition halo_chgpoint line, not blow up
      time("halo_chg_1024p", n, nEv) {
        seq.HaloWindows.changePointMeanShift(ev, Seq("event_type"), "event_id",
          "value", window = 30, critValue = 3.0, numPartitions = 1024).count()
      }
      // curation family (q102/q109/q110/q111 shapes). semdedup's pair join
      // is bounded per cell; dsir is two explode+aggs + a broadcast join;
      // heavy_grams' confirm shuffle is candidate-bounded (minCount scales
      // with N to keep the Misra-Gries guarantee margin constant)
      time("lm_score", n, nDocs) {
        text.TextOps.lmScore(docs, "doc_id", "text").count()
      }
      // nCells scales with the corpus so per-cell occupancy stays constant
      // (the deployment rule — fixed cells make within-cell pairs quadratic)
      time("semdedup", n, nEmb) {
        sim.Similarity.semDedupDeterministic(emb, "vec_id", "embedding",
          nCells = 8 * n, eps = 0.4, iters = 10, maxSample = 4096).count()
      }
      time("dsir_select", n, nDocs) {
        text.TextOps.dsirSelect(docs, docs.where(col("source") === "src0"),
          "doc_id", "text", topN = 100, nBuckets = 512).count()
      }
      time("heavy_grams", n, nDocs) {
        text.TextOps.heavyHitterGrams(docs, "doc_id", "text", n = 2,
          minCount = 30L * n, capacity = 16384).count()
      }
      // sketch fitters: shuffle payload is model-sized partials (bottom-k
      // per key / depth×width counters), so rows/s must stay flat
      time("kmv_vocab", n, nDocs) {
        val toks = docs.select(col("lang"),
          explode(text.TextOps.tokens(col("text"))).as("tok"))
        model.Fitters.kmvEstimate(
          model.Fitters.kmvSketch(toks, Seq("lang"), "tok", 64), Seq("lang"), 64).count()
      }
      time("cms_sketch", n, nDocs) {
        val toks = docs.select(col("lang"),
          explode(text.TextOps.tokens(col("text"))).as("tok"))
        model.Fitters.cmsSketch(toks, Seq("lang"), "tok", 4, 512).count()
      }
      time("weighted_sample", n, nDocs) {
        text.TextOps.weightedSample(docs, Seq("lang"), "doc_id", "n_chars", 40).count()
      }
      time("qsketch", n, nEv) {
        model.Fitters.quantileSketchEstimate(
          model.Fitters.quantileSketch(ev, Seq("event_type"), "event_id",
            "value", 256), Seq("event_type"), Seq(0.25, 0.5, 0.75)).count()
      }
      // sessionize: one (key, time)-sorted exchange for the stacked lag +
      // running-sum windows, then a session-keyed hash agg whose map-side
      // partials collapse sessions before the (session-sized) second
      // exchange — rows/s must stay flat; parallelism is user-keyed
      time("sessionize", n, nEv) {
        seq.SeqOps.sessionize(ev, Seq("user_id"), "ts", "event_id",
          "value", gapSec = 43200L).count()
      }
      // seasonal decomposition: trend = explicit lag/lead moving-average
      // chain over one (key, seq)-sorted window lineage, seasonal means =
      // one hash agg joined back — rows/s must stay flat
      time("seasonal_decomp", n, nEv) {
        seq.SeqOps.seasonalDecompose(ev, Seq("event_type"), "event_id",
          "value", period = 24).count()
      }
      // one count exchange with map-side combine + TakeOrderedAndProject —
      // never a global sort of the key histogram
      time("skew_profile", n, nEv) {
        core.Skew.skewProfile(ev, Seq("user_id"), 5).count()
      }
      // self-join cardinality on user_id from one model-sized sketch
      time("join_card", n, nEv) {
        val a = model.Fitters.cmsSketch(
          ev.select(col("user_id").cast("string").as("k")), Nil, "k", 4, 512)
        model.Fitters.cmsJoinCard(a, a, Nil, 4).count()
      }
      // distributed star-round connected components over chain-shaped
      // dup graphs (worst case for label propagation): events become
      // length-100 chains, nEv/100 components, forced past the driver
      // union-find path
      time("cc_star_chains", n, nEv) {
        val pairs = ev.select(col("event_id").as("a"), (col("event_id") + 1).as("b"))
          .where(pmod(col("event_id"), lit(100)) =!= 99)
        text.TextOps.ccLargeSmallStar(pairs).count()
      }
      // incremental-ingest composition: the diff shuffles (id, md5)
      // projections, the gate is zero-shuffle expressions, the band join
      // pairs fresh×retained buckets only — rows/s must stay flat
      time("incr_ingest", n, nDocs) {
        val m5 = pmod(col("doc_id"), lit(5))
        val old = docs.where(m5 =!= 4).withColumn("text",
          when(m5 === 3, concat(col("text"), lit(" v1"))).otherwise(col("text")))
        val neu = docs.where(m5 =!= 0)
        text.TextOps.incrementalIngest(old, neu, "doc_id", "text").count()
      }
      // cluster-balanced sampling: nCells scales with the corpus (the
      // semdedup deployment rule) so assignment stays the only data-sized
      // pass and the window partials stay perCell-capped
      time("cluster_sample", n, nEmb) {
        sim.Similarity.clusterBalancedSample(emb, "vec_id", "embedding",
          nCells = 8 * n, perCell = 40, iters = 10, maxSample = 4096).count()
      }
      // sequential detectors (q137/q138): one sort-within-shuffle per key,
      // then window cumsums — rows/s must stay flat; key count is fixed,
      // so per-key series length grows n× (the worst case for them)
      time("cusum", n, nEv) {
        drift.Drift.cusum(ev, Seq("event_type"), "event_id", "value",
          warmup = 100, slack = 0.5, h = 5.0).count()
      }
      time("page_hinkley", n, nEv) {
        drift.Drift.pageHinkley(ev, Seq("event_type"), "event_id", "value",
          delta = 0.005, lambda = 50.0).count()
      }
      // span rewrite (q139): dedup exchange carries (id, widx, hash);
      // rebuild joins keep-set arrays back to the corpus scan
      time("span_rewrite", n, nDocs) {
        text.TextOps.spanRewrite(docs, "doc_id", "text", k = 8).count()
      }
      // MMR (q140): distributed TakeOrdered shortlist + fixed-k greedy on
      // the driver — the scan scales, the greedy is constant, so the
      // rows/s line must track ann_brute's scan slope
      time("mmr_select", n, nEmb) {
        val q0 = core.table(spark, sfDir, "embeddings")
          .where(col("vec_id") === 0)
          .select(transform(col("embedding"), x => x.cast("double")))
          .head().getSeq[Double](0).toArray
        sim.Similarity.mmrSelect(emb.where(col("vec_id") =!= 0),
          "vec_id", "embedding", q0, k = 10, lambda = 0.7,
          shortlist = 64).count()
      }
      // sample-bounded energy distance: cost is O(maxSample²) by design,
      // so this line must stay FLAT as the corpus scales
      time("energy_dist", n, nEmb) {
        val isB = text.TextOps.hash56(col("vec_id").cast("string")) % 2 === 1
        drift.Drift.embeddingEnergyDistance(emb.where(!isB), emb.where(isB),
          "embedding", idCol = "vec_id", maxSample = 1000).count()
      }
      // silhouette (q152): centroid fit is one k·d-cell agg, scoring is a
      // narrow pass with k dot products/row — rows/s must stay flat
      time("silhouette", n, nEmb) {
        sim.Similarity.silhouette(emb, "embedding", "label").count()
      }
      // source overlap (q153): per-gram pair fan-out is bounded by S²/2,
      // so the line must track the shingle-explode slope, not the pair
      // count
      time("source_overlap", n, nDocs) {
        text.TextOps.sourceOverlap(docs, "source", "text", n = 3).count()
      }
      time("source_signature", n, nDocs) {
        text.TextOps.sourceSignature(docs, "source", "text",
          topK = 10, minCount = 20).count()
      }
      // interval join (q156): interval side explodes by ~span/width, the
      // join is a plain equi-join — rows/s must track the shuffle slope
      time("interval_join", n, nEv) {
        val iv = ev.groupBy("event_type")
          .agg(min("value").as("mn"), max("value").as("mx"))
          .select(col("event_type"), explode(sequence(lit(0), lit(15))).as("band"),
            col("mn"), col("mx"))
          .select(col("event_type"), col("band"),
            (col("mn") + (col("mx") - col("mn")) * col("band") / 16).as("lo"),
            (col("mn") + (col("mx") - col("mn")) * (col("band") + 1) / 16).as("hi"))
        seq.AsOfJoin.intervalJoin(ev.select("event_id", "event_type", "value"),
          iv, Seq("event_type"), "value", "lo", "hi").count()
      }
      // hll (q157): one hash-agg to ≤2^p registers per key — flat line
      time("hll_distinct", n, nDocs) {
        val toks = docs.select(col("lang"),
          explode(text.TextOps.tokens(col("text"))).as("tok"))
        model.Fitters.hllEstimate(
          model.Fitters.hllSketch(toks, Seq("lang"), "tok", 9), Seq("lang"), 9).count()
      }
      // entropy-increase scorer (q155): per-record full-histogram
      // recompute, O(rows × buckets) with the usual per-key series bound
      time("entropy_incr", n, nEv) {
        import spark.implicits._
        val evd = ev.select(col("event_type").cast("string").as("entity"),
          col("event_id").cast("long").as("seq"),
          col("value").cast("double").as("value"))
          .as[streaming.StreamScorers.ValueEvent]
        streaming.StreamScorers.entropyIncreaseStream(evd, 10.0, 30).count()
      }
      // round-8 additions: line dedup (split + hash-count + rebuild),
      // NB classifier (vocab-agg fit + token-join score), BM25 (filtered
      // postings + broadcast df + TakeOrdered)
      time("line_dedup", n, nDocs) {
        text.TextOps.lineDedup(docs, "doc_id", "text",
          minDupCount = 2, sep = " table ").count()
      }
      time("nb_classifier", n, nDocs) {
        val seed = docs.withColumn("label",
          when(col("lang") === "en", lit("en")).otherwise(lit("other")))
        val m = text.TextOps.nbFitModel(seed, "doc_id", "text", "label", "en")
        val out = text.TextOps.nbScore(docs, "doc_id", "text", m,
          "en", "other").count()
        m.tokTable.unpersist(blocking = false)
        out
      }
      time("bm25", n, nDocs) {
        val out = text.TextOps.bm25Search(docs, "doc_id", "text",
          Seq("spark", "join", "window", "vector"), topK = 20).count()
        // bm25Search retains its tokenized projection (documented
        // contract); across probe scales that accumulates dead caches and
        // contaminates the larger points — drop them between blocks
        spark.catalog.clearCache()
        out
      }
      // round-8b: distributed Lloyd (per-iteration cost = one scan + k-row
      // agg → rows/s must stay flat), 1-D dbscan (one sort exchange, three
      // window passes), logreg GD (per-iteration one scan → 1-row agg)
      time("kmeans_fit", n, nEmb) {
        sim.KMeansDist.fit(emb, "vec_id", "embedding", dim = 64, k = 8,
          iters = 4, maxSample = 20000).count()
      }
      time("dbscan1d", n, nEv) {
        multi.ClusterScore.dbscan1d(
          ev.select("event_id", "event_type", "value"),
          Seq("event_type"), "value", "event_id",
          eps = 0.5, minPts = 5).count()
      }
      // corpus pass is one tokenize+count; the 10 merge rounds touch only
      // the vocab-capped table → time must be flat past the first scan
      time("bpe_train", n, nDocs) {
        text.TextOps.bpeTrain(docs, "doc_id", "text",
          nMerges = 10, vocabTopN = 1000).count()
      }
      // pair work bounded by per-cell occupancy × 25 probe offsets; CC
      // over core edges (driver union-find ≤1M edges, star rounds above).
      // Plain replication (the other probes' device) would multiply
      // DENSITY n× in the same area — quadratic pair growth, the
      // adversarial case — so this probe shifts each copy +1.0 in x:
      // corpus grows, per-cell occupancy stays constant, which is what
      // "more data" means for a spatial operator.
      time("dbscan_grid", n, nEmb) {
        val base = core.table(spark, sfDir, "embeddings")
        val e = (0 until n).map { i =>
          base.select(
            (col("vec_id") + lit(i.toLong * 1000000000L)).as("vec_id"),
            (element_at(col("embedding"), 1).cast("double") + lit(i * 1.0))
              .as("ex"),
            element_at(col("embedding"), 2).cast("double").as("ey"))
        }.reduce(_ unionByName _)
        val out = multi.ClusterScore.dbscanGrid(e, "vec_id", "ex", "ey",
          eps = 0.05, minPts = 5).count()
        spark.catalog.clearCache() // retained pts/pairs caches
        out
      }
      // cell-bounded approximate LOF: nCells scales with the corpus (the
      // semdedup rule) so per-cell occupancy — and the Σ occ² pair
      // bound — stays constant per point
      time("lof_cells", n, nEmb) {
        val out = multi.Proximity.lofFromKnn(
          multi.Proximity.cellKnn(emb, "vec_id", "embedding", dim = 64,
            nCells = 8 * n, iters = 4, k = 5), k = 5).count()
        spark.catalog.clearCache()
        out
      }
      // the density-stress face: same points replicated n× in place —
      // per-cell occupancy ×n, pair count ×n² — must degrade smoothly,
      // not blow up (hot-cell behavior, the LSH hot-bucket analogue)
      time("dbscan_dense", n, nEmb) {
        val e = emb.select(col("vec_id"),
          element_at(col("embedding"), 1).cast("double").as("ex"),
          element_at(col("embedding"), 2).cast("double").as("ey"))
        val out = multi.ClusterScore.dbscanGrid(e, "vec_id", "ex", "ey",
          eps = 0.05, minPts = 5).count()
        spark.catalog.clearCache()
        out
      }
      time("logreg_fit", n, nDocs) {
        val feat = docs.select(lit(1.0).as("f0"),
          ((col("n_chars").cast("double") - 300.0) / 100.0).as("f1"),
          when(col("n_chars") >= 300, 1.0).otherwise(0.0)
            .cast("double").as("y"))
        text.TextOps.logRegFit(feat, Seq("f0", "f1"), "y",
          iters = 5, lr = 0.5).count()
      }
      // round-8c additions: sequential forecasters + robust window +
      // regression scorer (all per-key — corpus growth adds keys, so
      // these should scale ~linearly), and the iterative graph op
      // (corpus growth adds nodes AND edges; per-iteration cost is one
      // join + one agg over the edge table)
      time("holt_forecast", n, nEv) {
        seq.SeriesKernels.holtForecast(ev, Seq("user_id"), "event_id",
          "value").count()
      }
      time("trend_resid", n, nEv) {
        seq.SeqOps.trendResiduals(ev, Seq("user_id"), "event_id",
          "value").count()
      }
      time("hampel", n, nEv) {
        seq.SeqOps.hampel(ev, Seq("user_id"), "event_id", "value",
          halfWindow = 7).count()
      }
      time("pagerank", n, nEv) {
        val u2t = ev.select(
          concat(lit("u:"), col("user_id").cast("string")).as("src"),
          concat(lit("t:"), col("event_type")).as("dst"))
        val both = u2t.union(u2t.select(col("dst").as("src"),
          col("src").as("dst"))).distinct()
        graph.Graph.pageRank(both, "src", "dst", iters = 5).count()
      }
      // user–user co-occurrence edges, per-type consecutive pairs (the
      // distributed analogue of the q205-family chain fixture); the
      // minCount threshold keeps the graph sparse the way the queries do
      def coEdges(minCount: Int): DataFrame = {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("event_type").orderBy("event_id")
        val ch = ev.select(col("user_id").cast("string").as("ua"),
          lead(col("user_id").cast("string"), 1).over(w).as("ub"))
          .where(col("ub").isNotNull && col("ua") =!= col("ub"))
        ch.select(least(col("ua"), col("ub")).as("a"),
            greatest(col("ua"), col("ub")).as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("c"))
          .where(col("c") >= minCount).select("a", "b")
      }
      time("lpa", n, nEv) {
        graph.Graph.labelPropagation(coEdges(2), "a", "b", iters = 3).count()
      }
      time("hits", n, nEv) {
        graph.Graph.hits(coEdges(2), "a", "b", iters = 3).count()
      }
      time("kcore", n, nEv) {
        graph.Graph.kcore(coEdges(3), "a", "b", k = 3, rounds = 3).count()
      }
      time("linkpred", n, nEv) {
        graph.Graph.linkPredict(coEdges(3), "a", "b", maxDeg = 100).count()
      }
      time("entity_resolve", n, nDocs) {
        text.TextOps.entityResolve(docs, "doc_id", "text",
          blockChars = 16, maxDist = 20).count()
      }
      time("resample", n, nEv) {
        seq.SeqOps.resample(ev, Seq("user_id"), "ts", "value",
          bucketNs = 3600000000000L).count()
      }
      time("cdf_transform", n, nEv) {
        post.PostOps.cdfTransform(ev, Seq("event_type"), "value",
          "event_id").count()
      }
      time("jsd", n, nEv) {
        drift.Drift.jsDivergence(ev.where(col("event_id") % 2 === 0),
          ev.where(col("event_id") % 2 === 1), Seq("event_type"),
          "value").count()
      }
      time("walks", n, nEv) {
        graph.Graph.randomWalks(coEdges(2), "a", "b",
          walksPerNode = 2, walkLen = 4).count()
      }
      time("project", n, nEv) {
        // user → (type, day) items: items stay ~150, user degrees grow
        // with density — the Σ deg² shape under the maxDeg cap
        graph.Graph.project(ev.select(col("user_id"),
          concat_ws("#", col("event_type"),
            expr("ts div 86400000000000")).as("item")),
          "user_id", "item", maxDeg = 200).count()
      }
      val liProbe = scaled("lineitem", Seq("l_orderkey"), n)
      val nLi = liProbe.count()
      time("ecod", n, nLi) {
        multi.TailScores.ecod(liProbe, Seq("l_returnflag"),
          Seq("l_quantity", "l_extendedprice", "l_discount"), 12.0).count()
      }
      time("hbos", n, nLi) {
        multi.TailScores.hbos(liProbe, Seq("l_returnflag"),
          Seq(("l_quantity", 10.0), ("l_extendedprice", 10000.0),
            ("l_discount", 0.02)), 14.0).count()
      }
      time("assoc_rules", n, nLi) {
        val bk = liProbe.select(col("l_orderkey").as("basket"),
          (col("l_partkey") % 25).as("item"))
        model.Assoc.associationRules(bk, "basket", "item", 2L).count()
      }
      val docsProbe = scaled("documents", Seq("doc_id"), n)
      val nDp = docsProbe.count()
      time("rake", n, nDp) {
        text.TextOps.rakeKeywords(docsProbe, "doc_id", "text",
          Seq("the", "a", "of", "and", "to", "in"), topK = 40).count()
      }
      time("holt_winters", n, nEv) {
        seq.SeriesKernels.holtWinters(ev, Seq("user_id"), "event_id",
          "value", period = 7).count()
      }
      time("burst", n, nEv) {
        seq.SeriesKernels.burstDetect(ev, Seq("user_id"), "ts", "value").count()
      }
      time("conformal", n, nEv) {
        post.PostOps.conformalPValue(
          ev.where(col("event_id") % 5 =!= 0),
          ev.where(col("event_id") % 5 === 0),
          Seq("event_type"), "value", "event_id").count()
      }
      time("wasserstein", n, nEv) {
        drift.Drift.wasserstein(
          ev.where(col("event_id") % 2 === 0),
          ev.where(col("event_id") % 2 === 1),
          Seq("event_type"), "value").count()
      }
      val embProbe = scaled("embeddings", Seq("vec_id"), n)
      val nEm = embProbe.count()
      time("centroid_drift", n, nEm) {
        drift.Drift.embeddingCentroidDrift(
          embProbe.where(col("vec_id") % 2 === 0),
          embProbe.where(col("vec_id") % 2 === 1),
          Seq("label"), "embedding").count()
      }
      time("novelty", n, nDp) {
        text.TextOps.noveltyScore(docsProbe, "doc_id", "text", 3).count()
      }
      time("lexical", n, nDp) {
        text.TextOps.lexicalDiversity(docsProbe, "doc_id", "text").count()
      }
      time("ar_forecast", n, nEv) {
        seq.SeqOps.arForecast(ev, Seq("event_type"), "event_id", "value",
          order = 6).count()
      }
      // ---- round-8 additions: codecs, perceptual hash, provenance ----
      // media fixtures mirror the q251/q257/q259 gate fixtures (per-row
      // synthesis, so the probe measures encode+decode, the per-row cost
      // that dominates at corpus scale)
      val mediaPng = {
        import spark.implicits._
        docsProbe.select(col("doc_id").cast("long"), col("n_chars").cast("int"))
          .as[(Long, Int)].map { case (id, nc) =>
            val w = (nc % 14) + 1; val h = (id % 7).toInt + 2
            (id, mm.Codecs.Png.encode(w, h,
              Array.tabulate(w * h * 3)(k => ((id * 11 + k * 3) % 256).toByte)))
          }.toDF("id", "payload")
      }
      time("png_decode", n, nDp) {
        mm.Multimodal.decode(mediaPng).count()
      }
      time("ahash_neardup", n, nDp) {
        import spark.implicits._
        val media = docsProbe
          .select(col("doc_id").cast("long"), col("n_chars").cast("int"))
          .as[(Long, Int)].map { case (id, nc) =>
            val w = (nc % 6) + 8; val h = (id % 4).toInt + 8
            (id, mm.Codecs.Png.encode(w, h,
              Array.tabulate(w * h * 3)(k => (((id % 23) * 31 + k * 5) % 256).toByte)))
          }.toDF("id", "payload")
        mm.Multimodal.imageNearDup(mm.Multimodal.decodeImage(media), 3).count()
      }
      time("audio_spectral", n, nDp) {
        import spark.implicits._
        val media = docsProbe
          .select(col("doc_id").cast("long"), col("n_chars").cast("int"))
          .as[(Long, Int)].map { case (id, nc) =>
            val len = (nc % 200) + 50
            (id, mm.Codecs.Wav.encode(Array.tabulate(len)(i =>
              (((id * 31 + i * 17) % 4096) - 2048).toShort), 8000))
          }.toDF("id", "payload")
        mm.Multimodal.audioSpectral(media, 64, 4).count()
      }
      time("jpeg_decode", n, nDp) {
        import spark.implicits._
        val media = docsProbe
          .select(col("doc_id").cast("long"), col("n_chars").cast("int"))
          .as[(Long, Int)].map { case (id, nc) =>
            val w = 8 * ((nc % 3) + 1); val h = 8 * ((id % 2).toInt + 1)
            val bw = w / 8
            (id, mm.Codecs.Jpeg.encode(w, h, Array.tabulate(w * h) { k =>
              val bx = (k % w) / 8; val by = (k / w) / 8
              ((id * 17 + (by * bw + bx) * 29) % 256).toByte
            }))
          }.toDF("id", "payload")
        mm.Multimodal.decode(media).count()
      }
      time("gif_decode", n, nDp) {
        import spark.implicits._
        val pal = Array.tabulate(768)(j => ((j / 3 * (3 + 2 * (j % 3))) % 256).toByte)
        val media = docsProbe
          .select(col("doc_id").cast("long"), col("n_chars").cast("int"))
          .as[(Long, Int)].map { case (id, nc) =>
            val w = (nc % 10) + 2; val h = (id % 5).toInt + 2
            (id, mm.Codecs.Gif.encode(w, h,
              Array.tabulate(w * h)(k => ((id * 13 + k * 11) % 256).toByte), pal))
          }.toDF("id", "payload")
        mm.Multimodal.decode(media).count()
      }
      time("adpcm_decode", n, nDp) {
        import spark.implicits._
        val media = docsProbe.select(col("doc_id").cast("long")).as[Long]
          .map { id =>
            val nb = (id % 3).toInt + 1
            (id, mm.Codecs.Wav.encodeAdpcm(Array.tabulate(nb * 505)(i =>
              (((id * 37 + (i / 505) * 101) % 4096) - 2048).toShort), 8000))
          }.toDF("id", "payload")
        mm.Multimodal.decode(media).count()
      }
      val urlProbe = docsProbe.withColumn("url", concat(
        lit("HTTPS://WWW."), col("source"), lit("-"),
        pmod(col("doc_id"), lit(7)).cast("string"), lit(".COM/x/p"),
        pmod(col("doc_id"), lit(50)).cast("string"),
        lit("?utm_source=f&id="), col("doc_id").cast("string")))
      time("url_canon_stats", n, nDp) {
        text.UrlOps.domainStats(
          urlProbe.withColumn("url", text.UrlOps.canonicalizeUrl(col("url"))),
          "url", "text", "lang").count()
      }
      time("html_extract", n, nDp) {
        val html = docsProbe.withColumn("h", concat(
          lit("<html><head><title>T</title><script>var a=1;</script></head><body>" +
            "<div><a href=\"/\">Home</a></div><p>"),
          col("text"), lit(" &amp; tail</p></body></html>")))
        text.HtmlOps.htmlExtract(html, "doc_id", "h").count()
      }
      time("json_profile", n, nEv) {
        val j = ev.select(concat(lit("{\"k\": "),
          get_json_object(col("props"), "$.k"),
          lit(", \"type\": \""), col("event_type"),
          lit("\", \"meta\": {\"day\": "), expr("ts div 86400000000000"),
          lit("}}")).as("j"))
        text.JsonOps.jsonProfile(j, "j", 2).count()
      }
      time("pot_gpd", n, nEv) {
        multi.TailScores.potGpd(ev, Seq("event_type"), "event_id", "value",
          tailFrac = 0.1, threshold = 5.0).count()
      }
      time("mann_kendall", n, nEv) {
        seq.Trend.mannKendall(ev, Seq("event_type"), "event_id", "value",
          maxPoints = 150).count()
      }
      time("theil_sen", n, nEv) {
        seq.Trend.theilSen(ev, Seq("event_type"), "event_id", "value",
          maxPoints = 150).count()
      }
      time("group_tests", n, nEv) {
        model.GroupTests.anovaF(ev, "event_type", "value").count() +
          model.GroupTests.kruskalWallis(ev, "event_type", "value").count() +
          model.GroupTests.brownForsythe(ev, "event_type", "value").count()
      }
      time("winsorize", n, nEv) {
        post.PostOps.winsorize(ev, Seq("event_type"), "event_id", "value",
          alpha = 0.05).count()
      }
      time("int_transform", n, nEv) {
        post.PostOps.intTransform(ev, Seq("event_type"), "event_id",
          "value").count()
      }
      time("boxcox", n, nEv) {
        post.PostOps.boxCoxFit(ev, Seq("event_type"), "value",
          Seq(-2.0, -1.0, 0.0, 0.5, 1.0, 2.0)).count()
      }
      time("zorder", n, nEv) {
        core.Layout.zOrderLayout(
          ev.where(col("value").isNotNull).select(col("event_id"),
            pmod(col("user_id"), lit(1024L)).as("ax"),
            pmod(floor(col("value")).cast("long"), lit(1024L)).as("bx")),
          col("ax"), col("bx"), bits = 10, numFiles = 32).count()
      }
      time("range_planner", n, nEv) {
        core.Layout.rangePlanner(ev, "value", 16).count()
      }
      time("sorted_neighborhood", n, nDp) {
        val d = docsProbe.select(col("doc_id"), col("lang"),
          substring(col("text"), 1, 64).as("name"))
        text.TextOps.sortedNeighborhood(d, "doc_id", "name", "lang",
          windowSize = 4, minSim = 0.8).count()
      }
      // round-8e family: SPC charts, diagnostics battery, state-space
      time("xbar_r", n, nEv) {
        model.Spc.xbarR(ev, "event_type", "event_id", "value", 5).count()
      }
      time("western_electric", n, nEv) {
        model.Spc.westernElectric(ev, "event_type", "event_id", "value")
          .count()
      }
      time("jarque_bera", n, nEv) {
        model.Diagnostics.jarqueBera(ev, "event_type", "value").count()
      }
      time("runs_test", n, nEv) {
        model.Diagnostics.runsTest(ev, "event_type", "event_id", "value")
          .count()
      }
      time("kalman", n, nEv) {
        seq.StateSpace.kalmanFilter(ev, Seq("user_id"), "event_id", "value")
          .count()
      }
      time("ewma_chart", n, nEv) {
        seq.StateSpace.ewmaChart(ev, Seq("user_id"), "event_id", "value")
          .count()
      }
      time("binary_seg", n, nEv) {
        seq.SeqOps.binarySegmentation(ev, Seq("event_type"), "event_id",
          "value", minSegment = 50).count()
      }
      time("spectral_entropy", n, nEv) {
        seq.StateSpace.spectralEntropy(ev, Seq("event_type"), "event_id",
          "value", window = 64).count()
      }
      time("quantile_norm", n, nEv) {
        post.PostOps.quantileNormalize(ev, "event_type", "event_id",
          "value").count()
      }
      time("rank_ensemble", n, nEv) {
        val stats = model.Fitters.stats(ev, Seq("event_type"), Seq("value"))
        val z = score.Scorers.zscore(ev, stats,
          score.Scorers.Cfg(Seq("event_type"), Seq("value"), threshold = 2.0))
          .select(col("event_id"), col("score").as("s_z"))
        val e2 = score.Scorers.extremeValue(ev, stats,
          score.Scorers.Cfg(Seq("event_type"), Seq("value"), threshold = 0.9))
          .select(col("event_id"), col("score").as("s_e"))
        post.PostOps.rankEnsemble(z.join(e2, "event_id"),
          Seq("event_id"), Seq("s_z", "s_e")).count()
      }
      time("hellinger", n, nEv) {
        drift.Drift.hellinger(ev.where(col("event_id") % 2 === 0),
          ev.where(col("event_id") % 2 === 1), Seq("event_type"),
          "value").count()
      }
      time("harmonic", n, nEv) {
        val u2t = ev.select(concat(lit("u:"),
          col("user_id").cast("string")).as("src"),
          concat(lit("t:"), col("event_type")).as("dst"))
        val bip = u2t.union(u2t.select(col("dst").as("src"),
          col("src").as("dst"))).distinct()
        graph.Graph.harmonicCentrality(bip, "src", "dst").count()
      }
      time("dim_drift", n, nEmb) {
        drift.Drift.dimensionDrift(emb.where(col("vec_id") % 2 === 0),
          emb.where(col("vec_id") % 2 === 1), "embedding").count()
      }
      time("dtw", n, nEv) {
        val fpv = core.fixedPointLong(col("value").cast("double"), 4)
        val e = ev.where(col("value").isNotNull)
          .select(col("user_id"), expr("ts div 86400000000000").as("day"),
            fpv.as("_fp"))
        def mean = (sum(col("_fp").cast("decimal(38,0)")).cast("double") /
          count(lit(1)).cast("double") / 1e4).as("mv")
        val daily = e.groupBy(col("user_id"), col("day")).agg(mean)
        val ref = e.groupBy(col("day")).agg(mean)
          .orderBy(col("day")).collect().map(_.getDouble(1))
        seq.Warp.dtwToReference(daily, "user_id", "day", "mv", ref).count()
      }
      // round-10 wave B
      val dp = scaled("documents", Seq("doc_id"), n)
      val nDp2 = dp.count()
      time("kn_lm", n, nDp2) {
        text.TextOps.knLmScore(dp, "doc_id", "text").count()
      }
      time("moore_lewis", n, nDp2) {
        text.TextOps.mooreLewisScore(dp, "doc_id", "text",
          dp.where(col("lang") === "en"), dp).count()
      }
      time("adwin", n, nEv) {
        drift.Drift.adwin(ev.where(col("value").isNotNull &&
          col("event_id") % 20 === 0), Seq("event_type"), "event_id",
          "value", delta = 0.002, r = 50.0).toDF().count()
      }
      time("record_linkage", n, nDp2) {
        val d = dp.select(col("doc_id"), col("lang"), col("source"),
          col("n_chars"), expr("n_chars div 100").as("_blk"),
          substring(lower(col("text")), 1, 16).as("_pre"))
        val a = d.select(col("doc_id").as("a"), col("lang"), col("_blk"),
          col("source").as("_sa"), col("n_chars").as("_na"),
          col("_pre").as("_pa"))
        val b = d.select(col("doc_id").as("b"), col("lang"), col("_blk"),
          col("source").as("_sb"), col("n_chars").as("_nb"),
          col("_pre").as("_pb"))
        val pairs = a.join(b, Seq("lang", "_blk"))
          .where(col("a") < col("b"))
          .select(col("a"), col("b"),
            (col("_sa") === col("_sb")).as("f1"),
            (col("_pa") === col("_pb")).as("f2"),
            (abs(col("_na") - col("_nb")) * 20 <=
              greatest(col("_na"), col("_nb"))).as("f3"))
        model.Linkage.fellegiSunterEm(pairs, Seq("f1", "f2", "f3"))
          .count()
      }
      time("markov_attr", n, nEv) {
        model.Behavior.markovAttribution(ev, "user_id", "event_id",
          "event_type", Seq("click", "error", "signup", "view"),
          "purchase").count()
      }
      time("cox_ph", n, nEv) {
        val per = ev.groupBy("user_id").agg(
          min(expr("ts div 86400000000000")).as("fd"),
          max(expr("ts div 86400000000000")).as("ld"),
          min(when(col("value") > 250.0,
            expr("ts div 86400000000000"))).as("hd"),
          count(col("value")).as("nv"),
          sum(core.fixedPointLong(col("value").cast("double"), 4)
            .cast("decimal(38,0)")).as("s4"))
        val subj = per.select(
          when(col("hd").isNotNull, col("hd") - col("fd"))
            .otherwise(col("ld") - col("fd")).cast("double").as("dur"),
          col("hd").isNotNull.as("event"),
          ((col("s4").cast("double") / 1e4 / col("nv").cast("double") -
            lit(50.0)) / lit(10.0)).as("x1"),
          when(col("user_id") % 2 === 0, lit(1.0)).otherwise(lit(0.0))
            .as("x2"))
        model.Survival.coxPh(subj, "dur", "event",
          Seq("x1", "x2")).count()
      }
      time("freq_sequences", n, nEv) {
        model.Behavior.frequentSequences(ev, "user_id", "event_type",
          "ts", minSupport = 20L).count()
      }
      // ---- r10/r11 heavies (r11 verdict item 6) ----
      // IPW ATE: 60 unrolled GD rounds — cost must scale as
      // rounds × one-scan, not rounds × growing-lineage
      val units = {
        val perUser = ev.where(col("value").isNotNull)
          .groupBy(col("user_id").as("uid"))
          .agg(count(lit(1)).as("_n"),
            sum(core.fixedPointLong(col("value").cast("double"), 4)
              .cast("decimal(38,0)")).as("_s4"))
          .withColumn("x",
            col("_s4").cast("double") / 1e4 / col("_n").cast("double"))
        val h = text.TextOps.hash56(col("uid").cast("string"))
        perUser
          .withColumn("t", pmod(h, lit(100L)) <
            (lit(20) + when(col("x") > 49.0, 40).otherwise(0)))
          .withColumn("y", col("x") + when(col("t"), 2.0).otherwise(0.0))
          .withColumn("f0", lit(1.0))
          .withColumn("f1", (col("x") - 49.0) / 10.0)
          .select("uid", "x", "t", "y", "f0", "f1")
      }
      time("ipw_ate_gd60", n, nEv) {
        model.Causal.ipwAte(units, "uid", "t", "y", Seq("f0", "f1"),
          iters = 60, lr = 0.5).count()
      }
      // pinball GD: 12 vs 30 rounds — per-round cost must stay flat
      val qrIn = ev.withColumn("xb",
        pmod(col("user_id"), lit(8L)).cast("double"))
      time("quantile_reg12", n, nEv) {
        model.Assoc.quantileRegFit(qrIn, "xb", "value", tau = 0.9,
          iters = 12, lr = 0.5).count()
      }
      time("quantile_reg30", n, nEv) {
        model.Assoc.quantileRegFit(qrIn, "xb", "value", tau = 0.9,
          iters = 30, lr = 0.5).count()
      }
      // iteration-bounded graph ops: exchanges scale with edges, state
      // stays node-/pair-sized
      val bip = {
        val u2t = ev.select(
          concat(lit("u:"), col("user_id").cast("string")).as("src"),
          concat(lit("t:"), col("event_type")).as("dst"))
        u2t.union(u2t.select(col("dst").as("src"), col("src").as("dst")))
          .distinct()
      }
      time("eigenvector5", n, nEv) {
        graph.Graph.eigenvectorCentrality(bip, "src", "dst", iters = 5)
          .count()
      }
      time("simrank3", n, nEv) {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("event_id")
        val te = ev
          .withColumn("_nx", lead(col("event_type"), 1).over(w))
          .where(col("_nx").isNotNull && col("_nx") =!= col("event_type"))
          .select(col("event_type").as("a"), col("_nx").as("b")).distinct()
        graph.Graph.simRank(te, "a", "b", iters = 3).count()
      }
      // post-fix q538 ensemble shape: 3 detector scorings + TakeOrdered
      // top-50s + model-sized RRF — no global data-sized window remains
      val emb2 = scaled("embeddings", Seq("vec_id"), n)
      val nEmb2 = emb2.count()
      time("ensemble_rrf", n, nEmb2) {
        def top50(df: DataFrame, s: String) = {
          val t = df.orderBy(col(s).desc, col("vec_id").asc).limit(50)
          t.withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col(s).desc, col("vec_id").asc)))
            .select("vec_id", "rank")
        }
        val eR = top50(multi.OutlierFaces.ecod(emb2, "vec_id", "embedding"), "ecod")
        val lR = top50(multi.OutlierFaces.loda(emb2, "vec_id", "embedding", 64), "loda")
        sim.Similarity.rrfFuse(Seq(eR, lR), Nil, "vec_id",
          kConst = 60, topK = 20).count()
      }
      // ECOD histogram vs window form — the scale divergence item 4 is
      // about: histogram cost must stay flat per dim as rows grow
      time("ecod_window", n, nEmb2) {
        multi.OutlierFaces.ecod(emb2, "vec_id", "embedding").count()
      }
      time("ecod_histogram", n, nEmb2) {
        multi.OutlierFaces.ecodHistogram(emb2, "vec_id", "embedding").count()
      }
      // shared k-bounded kNN frame feeding LoOP + FastABOD
      time("loop_fastabod", n, nEmb2) {
        val nn = multi.Proximity.knn(
          multi.Proximity.pairDistances(emb2, "vec_id", "embedding"), 5)
          .localCheckpoint(true)
        multi.Proximity.loopFromKnn(nn, 5).count() +
          multi.Proximity.fastAbodFromKnn(nn, emb2, "vec_id", "embedding")
            .count()
      }
      // r12 heavies (r12 verdict item 6). copula: stage count is fixed
      // (3 cols × banded ranks + pair moments) — cost must grow ~linearly
      val li = scaled("lineitem", Seq("l_orderkey"), n)
      val nLi2 = li.count()
      time("copula3", n, nLi2) {
        model.Assoc.copulaCorrelation(li,
          Seq("l_quantity", "l_extendedprice", "l_discount")).count()
      }
      // hawkes: day grid is keys × span (calendar-bounded) — 4× events
      // land in the SAME buckets, so cost must stay near-flat
      time("hawkes", n, nEv) {
        model.Behavior.hawkesFit(ev, "event_type", "ts", beta = 0.5).count()
      }
      // ALS: factor state is (users+items)×2; round cost rides the
      // ratings aggregate
      time("als2_r4", n, nEv) {
        val r = ev.where(col("value").isNotNull)
          .groupBy(pmod(col("user_id"), lit(50L)).cast("string").as("u"),
            col("event_type").as("i"))
          .agg((sum(core.fixedPointLong(col("value"), 4)
            .cast("decimal(38,0)")).cast("double") / 1e4 /
            count(lit(1))).as("y"))
        model.Factorize.als2(r, "u", "i", "y", iters = 4, lambda = 0.1).count()
      }
      // RANSAC: candidate frame is WindowGroupLimit-capped at 2·M rows
      time("ransac16", n, nEv) {
        model.Assoc.ransacLine(
          ev.where(col("value").isNotNull)
            .withColumn("xb", pmod(col("user_id"), lit(100L)).cast("double")),
          "event_type", "event_id", "xb", "value",
          candidates = 16, tol = 60.0).count()
      }
    }
    spark.stop()
  }
}
