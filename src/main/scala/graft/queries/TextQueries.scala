package graft.queries

import graft.core._
import graft.sim.{KMeansDist, Similarity}
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Queries + oracles for the LLM-pipeline extensions: dedup (exact /
  * MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine), similarity
  * search, text analysis. Hashing is md5-derived on both engines so even
  * the LSH pipelines have exact oracles; only the seeded-random paths
  * (hyperplane LSH, IVF KMeans) are rows-only. */
object TextQueries {

  private def docs(s: SparkSession, dir: String) = table(s, dir, "documents")
  private def emb(s: SparkSession, dir: String) = table(s, dir, "embeddings")

  private val NumHashes = 16
  private val BandSize = 4

  /** Feature frame for the q183/q192 logistic-regression pair:
    * centered length/word features + the " the " count (all exact
    * integer-derived doubles) and a recoverable length-cut label. */
  private def logregFeat(d: DataFrame): DataFrame = {
    val nThe = (length(lower(col("text"))) -
      length(replace(lower(col("text")), lit(" the "), lit("")))) / 5
    d.select(col("doc_id"),
      lit(1.0).as("f0"),
      ((col("n_chars").cast("double") - 300.0) / 100.0).as("f1"),
      ((size(TextOps.tokens(col("text"))).cast("double") - 50.0) / 10.0).as("f2"),
      (nThe.cast("double") / 10.0).as("f3"),
      when(col("n_chars") >= 300, 1.0).otherwise(0.0).cast("double").as("y"))
  }

  /** Synthesized provenance URLs (q260-q262): case-mangled scheme/host,
    * an optional `www.`, a trailing-slash variant, utm tracking params
    * and a fragment — every canonicalization branch is exercised, and
    * the registrable domain (source-(doc_id%7).com) varies enough for
    * real per-domain stats/quota groups. */
  private def urlDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn("url", concat(
      lit("HTTPS://"),
      when(pmod(col("doc_id"), lit(4)) === 0, lit("WWW.")).otherwise(lit("")),
      col("source"), lit("-"), pmod(col("doc_id"), lit(7)).cast("string"),
      lit(".COM/"), col("lang"), lit("/p"),
      pmod(col("doc_id"), lit(50)).cast("string"),
      when(pmod(col("doc_id"), lit(6)) === 0, lit("/")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit("?utm_source=feed&id="), col("doc_id").cast("string"),
          lit("&utm_campaign=x")))
        .otherwise(concat(lit("?id="), col("doc_id").cast("string"))),
      when(pmod(col("doc_id"), lit(5)) === 0, lit("#frag")).otherwise(lit(""))))

  private def ev2(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")

  /** q279-q281 evaluation fixture: a tie-heavy deterministic score
    * against the en-language label. */
  private def evalScored(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("score", pmod(col("n_chars"), lit(53)).cast("double"))
      .withColumn("isEn", col("lang") === "en")

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
    // TextRank keyword extraction: co-occurrence graph of adjacent
    // filtered tokens (length ≥ 5) → integer fixed-point PageRank
    // (5 iterations, the q201 device) → top-20 corpus keywords
    "q336_textrank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tk = table(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(graft.text.TextOps.tokens(col("text"))).as(Seq("p", "tok")))
        .where(length(col("tok")) >= 5)
      val w = Window.partitionBy(col("doc_id")).orderBy(col("p").asc)
      val pairs = tk.withColumn("nxt", lead(col("tok"), 1).over(w))
        .where(col("nxt").isNotNull && col("tok") =!= col("nxt"))
      val edges = pairs.select(col("tok").as("src"), col("nxt").as("dst"))
        .union(pairs.select(col("nxt").as("src"), col("tok").as("dst")))
      canon(graft.graph.Graph.pageRank(edges, "src", "dst", iters = 5)
        .orderBy(col("rank12").desc, col("node")).limit(20))
    }),
    // phonetic (simplified-Soundex) ER blocking over part name words
    // (red/rod → R300 is the expected collision class)
    "q337_phonetic_blocks" -> ((s, dir) =>
      canon(graft.text.Phonetic.phoneticBlocks(
        table(s, dir, "part")
          .select(col("p_partkey"),
            explode(split(col("p_name"), " ")).as("nm")),
        "p_partkey", "nm"))),
    // URL canonicalization: the oracle rebuilds the EXPECTED canonical
    // form from the raw fields (an independent derivation, not a replay
    // of the operator's string surgery)
    "q260_url_canon" -> ((s, dir) =>
      urlDocs(s, dir).select(col("doc_id"), col("url"),
        graft.text.UrlOps.canonicalizeUrl(col("url")).as("canon_url"),
        graft.text.UrlOps.registrableDomain(col("url")).as("domain"))),
    "q261_domain_stats" -> ((s, dir) =>
      graft.text.UrlOps.domainStats(urlDocs(s, dir), "url", "text", "lang")),
    "q262_domain_quota" -> ((s, dir) =>
      graft.text.UrlOps.domainQuota(urlDocs(s, dir), "doc_id", "url",
        maxPerDomain = 3).select(col("doc_id"), col("domain"), col("rk"))),
    // blocklist over canonical urls: one alternation rlike per row
    "q265_url_blocklist" -> ((s, dir) =>
      graft.text.UrlOps.urlBlocklist(urlDocs(s, dir), "url",
        Seq("://[a-z0-9]*-3\\.com/", "/p1[0-9]($|\\?)"))
        .select(col("doc_id"), col("canon_url"), col("blocked"), col("tag"))),
    // minhash containment estimates (asymmetric near-dup) for the LSH
    // candidate pairs, exact distinct-shingle sizes
    "q459_containment" -> ((s, dir) =>
      canon(TextOps.minhashContainment(docs(s, dir), "doc_id", "text",
        shingleSize = 3, numHashes = NumHashes, bandSize = BandSize))),
    // redundancy signal, engine-independent face: repeated-8-gram mass
    // (1 - distinct/total char 8-grams). The zlib deflate op remains a
    // non-gated utility (its length is implementation-defined; UrlJson-
    // Spec pins exact values + monotonicity) — this row carries the
    // full SQL oracle the zlib face couldn't (r9 verdict item 6)
    "q269_compression_ratio" -> ((s, dir) =>
      canon(TextOps.repeatedGramMass(docs(s, dir), "doc_id", "text"))),
    // streaming canonical-URL dedup batch-executed (q100/q253 device):
    // only the hash-determined column is emitted
    "q270_url_dedup_stream" -> ((s, dir) =>
      graft.streaming.StreamScorers.urlDedupStream(urlDocs(s, dir), "url")
        .select(col("canon_url"))),
    // streaming perceptual image dedup batch-executed: the admitted
    // fingerprint SET
    "q271_image_dedup_stream" -> ((s, dir) =>
      graft.streaming.StreamScorers.imageDedupStream(MmQueries.ahashMedia(s, dir))
        .select(col("ahash_lo"), col("ahash_hi"))),
    // classifier evaluation family over a deterministic tie-heavy score
    // (53 distinct values → the avg-rank tie handling is load-bearing);
    // label = lang=='en' — see evalScored below
    "q279_eval_auc" -> ((s, dir) =>
      canon(graft.model.Eval.binaryAuc(evalScored(s, dir), "score", "isEn"))),
    "q280_eval_confusion" -> ((s, dir) =>
      canon(graft.model.Eval.confusionAt(evalScored(s, dir), "score", "isEn",
        threshold = 26.0))),
    "q281_eval_pr_curve" -> ((s, dir) =>
      canon(graft.model.Eval.prCurve(evalScored(s, dir), "score", "isEn"))),
    // rater agreement between the language label and a proxy rule
    "q282_eval_kappa" -> ((s, dir) =>
      canon(graft.model.Eval.cohensKappa(
        docs(s, dir).withColumn("a", col("lang") === "en")
          .withColumn("b", pmod(col("n_chars"), lit(5)) < 3), "a", "b"))),
    // reliability bins over a [0,1) deterministic score
    "q283_eval_calibration" -> ((s, dir) =>
      canon(graft.model.Eval.calibrationBins(
        docs(s, dir)
          .withColumn("score", pmod(col("n_chars"), lit(100)).cast("double") / 100.0)
          .withColumn("isEn", col("lang") === "en"),
        "score", "isEn", nBins = 10))),
    // forecast grading: a fixed affine proxy prediction over events
    "q284_eval_regression" -> ((s, dir) =>
      canon(graft.model.Eval.regressionMetrics(
        ev2(s, dir).withColumn("pred", col("value") * 0.9 + 1.0),
        "value", "pred"))),
    // order-free per-source corpus fingerprint (reproducibility check)
    "q278_corpus_fingerprint" -> ((s, dir) =>
      TextOps.corpusFingerprint(docs(s, dir), Seq("source"),
        Seq("doc_id", "text", "lang"))),
    // unicode script profile over a multilingual-augmented fixture
    // (Java \p{IsX} == RE2 \p{X}, verified)
    "q268_script_profile" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("text2", concat(col("text"),
        when(pmod(col("doc_id"), lit(4)) === 1, lit(" 你好世界"))
          .when(pmod(col("doc_id"), lit(4)) === 2, lit(" Привет мир"))
          .when(pmod(col("doc_id"), lit(4)) === 3, lit(" مرحبا 42"))
          .otherwise(lit(""))))
      TextOps.scriptProfile(d, "doc_id", "text2")
    }),
    // canonical-URL dedup (the crawl-frontier dedup): variants that
    // differ only in case/www/tracking/fragment/slash collapse to one
    // canonical key; keep = min doc_id (the q49 exact-dedup shape)
    "q266_url_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // fixture WITHOUT the unique id param, so variants actually collide
      val d = docs(s, dir).withColumn("url", concat(
        lit("HTTPS://"),
        when(pmod(col("doc_id"), lit(4)) === 0, lit("WWW.")).otherwise(lit("")),
        col("source"), lit("-"), pmod(col("doc_id"), lit(7)).cast("string"),
        lit(".COM/"), col("lang"), lit("/p"),
        pmod(col("doc_id"), lit(50)).cast("string"),
        when(pmod(col("doc_id"), lit(6)) === 0, lit("/")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(3)) === 0, lit("?utm_source=feed"))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(5)) === 0, lit("#frag")).otherwise(lit(""))))
        .withColumn("canon_url", graft.text.UrlOps.canonicalizeUrl(col("url")))
      val w = Window.partitionBy("canon_url")
      d.select(col("doc_id"), col("canon_url"),
        count(lit(1)).over(w).as("dupCount"),
        (col("doc_id") === min("doc_id").over(w)).as("keep"))
    }),
    // image duplicate clusters: aHash near-dup pairs (hamming ≤ 2) →
    // the dedup family's connected components, min-id labels
    "q267_image_dup_clusters" -> ((s, dir) => {
      val imgs = graft.mm.Multimodal.decodeImage(MmQueries.ahashMedia(s, dir))
      val pairs = graft.mm.Multimodal.imageNearDup(imgs, maxDist = 2)
      TextOps.dupClusters(MmQueries.ahashMedia(s, dir).select(col("id")),
        "id", pairs)
    }),
    // HTML → text extraction: script/style/title/comment blocks, nav +
    // footer anchors, entity escapes and block-closer newlines — the
    // oracle derives the expected text independently from the fields
    "q264_html_extract" -> ((s, dir) => {
      val html = docs(s, dir).withColumn("html", concat(
        lit("<html><head><title>T"), col("doc_id").cast("string"),
        lit("</title><script>var a=1;</script><style>p{color:red}</style></head>"),
        lit("<body><div id=nav><a href=\"/\">Home</a><a href=\"/s\">"),
        col("source"),
        lit("</a></div><h1>Doc "), col("doc_id").cast("string"),
        lit("</h1><!-- c"), col("doc_id").cast("string"),
        lit(" --><p>"), col("text"),
        lit(" &amp; tail</p><p>Line&#39;s "), col("lang"),
        lit("</p><div id=f><a href=\"/c\">Contact</a></div></body></html>")))
      graft.text.HtmlOps.htmlExtract(html, "doc_id", "html")
    }),
    "q49_dedup_exact" -> ((s, dir) =>
      TextOps.exactDedup(docs(s, dir), "doc_id", "text")),
    // streaming exact dedup batch-executed (q100 device): only columns
    // functionally determined by the content hash are emitted, because
    // batch dropDuplicates keeps an arbitrary row per key — the
    // admitted SET is what the operator guarantees
    "q253_dedup_exact_stream" -> ((s, dir) =>
      graft.streaming.StreamScorers.exactDedupStream(
        docs(s, dir).select(col("doc_id"), col("text"), col("n_chars")), "text")
        .select(col("contentHash"), col("n_chars"))),
    // streaming LSH near-dup batch-executed (q100 device): with empty
    // initial state and buckets under the cap, the emitted pair SET per
    // (band, bucket) is exactly all a<b pairs — arrival-order-free
    "q254_neardup_stream" -> ((s, dir) =>
      graft.streaming.StreamScorers.nearDupStream(docs(s, dir), "doc_id",
        "text", shingleSize = 3, numHashes = NumHashes, bandSize = BandSize)
        .toDF().select(col("a"), col("b"), col("band")).distinct()),
    // the foreachBatch ingest-admission body against a static corpus
    // band index: batch = doc_id%5==4, corpus = the rest
    "q255_ingest_verdict" -> ((s, dir) => {
      val d = docs(s, dir)
      val m5 = pmod(col("doc_id"), lit(5))
      val corpusBands = TextOps.lshBuckets(
        TextOps.minhash(d.where(m5 =!= 4), "doc_id", "text", 3, NumHashes),
        "doc_id", BandSize)
      graft.streaming.StreamScorers.ingestVerdictBatch(
        d.where(m5 === 4), corpusBands, "doc_id", "text",
        shingleSize = 3, numHashes = NumHashes, bandSize = BandSize)
    }),
    // two-batch incremental line dedup (foreachBatch body): batch 1's
    // line counts become batch 2's prior; batch 2 rebuilds against the
    // CUMULATIVE (= corpus-wide here) frequencies
    "q256_line_dedup_stream" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val m2 = pmod(col("doc_id"), lit(2))
      val empty = Seq.empty[(Long, Long)].toDF("h", "cnt")
      val (_, counts1) = TextOps.lineDedupBatch(d.where(m2 === 0), empty,
        "doc_id", "text", minDupCount = 2, sep = " table ")
      val (clean2, _) = TextOps.lineDedupBatch(d.where(m2 === 1), counts1,
        "doc_id", "text", minDupCount = 2, sep = " table ")
      clean2
    }),
    // edit-distance entity resolution: prefix-16 blocking, Levenshtein
    // <= 20, min-label transitive closure — exact integers end-to-end
    "q211_entity_resolve" -> ((s, dir) =>
      TextOps.entityResolve(docs(s, dir), "doc_id", "text",
        blockChars = 16, maxDist = 20)),
    // bigram PMI collocations, minCount 5 — integer counts, one ln
    "q212_collocations" -> ((s, dir) =>
      canon(TextOps.collocations(docs(s, dir), "doc_id", "text",
        minCount = 5L))),
    // Flesch reading-ease: three regexp counts + one fixed float expr
    "q240_readability" -> ((s, dir) =>
      canon(TextOps.readability(docs(s, dir), "doc_id", "text"))),
    // lexical diversity: TTR, hapax fraction, Yule's K per doc — exact
    // integer run-length fold over the sorted token array, no shuffle
    "q245_lexical" -> ((s, dir) =>
      canon(TextOps.lexicalDiversity(docs(s, dir), "doc_id", "text"))),
    // RAKE corpus keyphrases: stopword/punct-delimited candidate runs,
    // deg/freq word scores, 6dp fixed-point phrase sums, top 40
    "q236_rake" -> ((s, dir) =>
      canon(TextOps.rakeKeywords(docs(s, dir), "doc_id", "text",
        rakeStops, topK = 40))),
    // Jaro–Winkler short-string pairing (64-char heads): exact-dup
    // collapse → prefix-8 blocks → codegen'd JW, DuckDB-builtin oracle
    "q234_jw_pairs" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        substring(col("text"), 1, 64).as("name"))
      canon(TextOps.jwPairs(d, "doc_id", "name",
        blockChars = 8, minSim = 0.8))
    }),
    // rendezvous (HRW) shard routing: stable md5-weight argmax — adding
    // or removing a node moves only that node's keys
    "q308_rendezvous" -> ((s, dir) =>
      graft.core.Layout.rendezvous(docs(s, dir).select("doc_id"),
        "doc_id", (0 until 8).map(i => s"node$i"))),
    // Gini of doc length per source: within-source inequality summary
    "q303_gini" -> ((s, dir) =>
      canon(graft.post.PostOps.gini(docs(s, dir), Seq("source"),
        "doc_id", "n_chars"))),
    // HHI + effective source count: the one-row corpus-diversity check
    "q304_concentration" -> ((s, dir) =>
      canon(graft.post.PostOps.concentration(docs(s, dir), "source"))),
    // sorted-neighborhood ER: O(n·w) windowed pairs within lang blocks
    // (the scale alternative to q234's equality blocking)
    "q297_sorted_neighborhood" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("lang"),
        substring(col("text"), 1, 64).as("name"))
      canon(TextOps.sortedNeighborhood(d, "doc_id", "name", "lang",
        windowSize = 4, minSim = 0.8))
    }),
    "q50_token_count" -> ((s, dir) =>
      TextOps.tokenCount(docs(s, dir), "doc_id", "text")),
    // BPE-ish pre-tokenizer segment count (the brief's "whitespace + a
    // BPE-ish regex" pair with q50's heuristic) — same regex replays in
    // the oracle's RE2
    "q165_bpe_tokens" -> ((s, dir) =>
      TextOps.bpeTokenCount(docs(s, dir), "doc_id", "text")),
    "q51_quality" -> ((s, dir) =>
      canon(TextOps.qualityScore(docs(s, dir), "doc_id", "text"))),
    "q52_langid" -> ((s, dir) =>
      TextOps.langId(docs(s, dir), "doc_id", "text")),
    // Gopher §A1.1 hard rule battery; minWords=50 splits the synthetic
    // corpus (10-99 words/doc) so both verdicts are exercised
    "q127_gopher_rules" -> ((s, dir) =>
      canon(TextOps.gopherRules(docs(s, dir), "doc_id", "text"))),
    // snapshot diff between two derived corpus versions: doc_id%5 carves
    // out removed (0), added (4) and changed (3, ' v1' suffix) classes
    "q130_corpus_diff" -> ((s, dir) => {
      val d = docs(s, dir)
      val m5 = pmod(col("doc_id"), lit(5))
      val old = d.where(m5 =!= 4).withColumn("text",
        when(m5 === 3, concat(col("text"), lit(" v1"))).otherwise(col("text")))
      val neu = d.where(m5 =!= 0)
      TextOps.corpusDiff(old, neu, "doc_id", "text")
    }),
    "q87_repetition" -> ((s, dir) =>
      canon(TextOps.repetitionSignals(docs(s, dir), "doc_id", "text", n = 2))),
    // corpus mixing: src0 kept whole, src1 decimated, rest at 50% — all
    // decisions md5-hash-derived, so the oracle replays them exactly
    "q88_corpus_mix" -> ((s, dir) =>
      canon(TextOps.stratifiedSample(docs(s, dir), "doc_id", "source",
        Map("src0" -> 1.0, "src1" -> 0.1), defaultQuota = 0.5)
        .select("doc_id", "source", "u", "quota"))),
    "q89_pii_redact" -> ((s, dir) =>
      TextOps.redactPii(docs(s, dir), "doc_id", "text")),
    // span-level dedup: 8-token spans at stride 4, corpus-wide counts
    "q90_span_dedup" -> ((s, dir) =>
      canon(TextOps.spanDedup(docs(s, dir), "doc_id", "text", k = 8, stride = 4))),
    // exact-substring REMOVAL: globally-first 8-token windows survive,
    // documents rebuilt from their kept windows — text never shuffles
    "q139_span_rewrite" -> ((s, dir) =>
      TextOps.spanRewrite(docs(s, dir), "doc_id", "text", k = 8)),
    // chunking: 32-token training windows, 8-token overlap (step 24)
    "q92_chunk_docs" -> ((s, dir) =>
      TextOps.chunkDocs(docs(s, dir), "doc_id", "text",
        chunkTokens = 32, overlap = 8)),
    // packing: the q92 chunks greedily packed into 128-token sequences,
    // shard = source (packing parallelizes across shards)
    "q93_pack_greedy" -> ((s, dir) => {
      val d = docs(s, dir)
      val ch = TextOps.chunkDocs(d, "doc_id", "text",
        chunkTokens = 32, overlap = 8)
        .join(d.select(col("doc_id"), col("source")), "doc_id")
      TextOps.packGreedy(ch, "source", "doc_id", "chunkIdx", "nTok",
        capacity = 128)
        .select(col("shard"), col("id").as("doc_id"),
          col("idx").as("chunkIdx"), col("size").as("nTok"),
          col("bin"), col("offset"))
    }),
    // deterministic epoch shuffle into 8 training shards (salt "ep0")
    "q94_shuffle_shards" -> ((s, dir) =>
      TextOps.shuffleShards(docs(s, dir), "doc_id", nShards = 8, salt = "ep0")),
    // hash-deterministic train/val/test split (80/10/10) — a row's split
    // never depends on what other rows exist
    "q107_split" -> ((s, dir) =>
      canon(TextOps.splitByHash(docs(s, dir), "doc_id",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))))),
    // weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    // 40 docs per lang, inclusion probability proportional to n_chars;
    // md5-derived keys make the exact sampled set engine-replayable
    "q121_weighted_sample" -> ((s, dir) =>
      TextOps.weightedSample(docs(s, dir), Seq("lang"), "doc_id", "n_chars", 40)),
    // Zipf-slope corpus diagnostic: ln(freq)~ln(rank) OLS over the top
    // 200 tokens per lang — flat slopes flag synthetic/template slices
    "q122_zipf_slope" -> ((s, dir) =>
      canon(TextOps.zipfSlope(docs(s, dir), Seq("lang"), "text", 200))),
    // decontamination: eval split = md5-hash-selected ~5% of the corpus,
    // train docs flagged on any shared 6-gram
    "q91_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      val isEval = TextOps.hash56(col("doc_id").cast("string")) % 20 === 0
      TextOps.decontaminate(d.where(!isEval), d.where(isEval),
        "doc_id", "text", n = 6)
    }),
    // same semantics via the Bloom-prefilter scale path: the confirm join
    // makes it row-identical to q91, so it shares q91's oracle
    "q91b_decontaminate_bloom" -> ((s, dir) => {
      val d = docs(s, dir)
      val isEval = TextOps.hash56(col("doc_id").cast("string")) % 20 === 0
      TextOps.decontaminateBloom(d.where(!isEval), d.where(isEval),
        "doc_id", "text", n = 6)
    }),
    "q53_fingerprint" -> ((s, dir) =>
      TextOps.fingerprint(docs(s, dir), "doc_id", "text")),
    "q54_minhash_sig" -> ((s, dir) =>
      TextOps.minhash(docs(s, dir), "doc_id", "text", shingleSize = 3, NumHashes)),
    "q55_minhash_pairs" -> ((s, dir) =>
      TextOps.minhashPairs(docs(s, dir), "doc_id", "text", shingleSize = 3,
        NumHashes, BandSize)),
    // hot-bucket cap (SCALING.md §5): maxBucket=2 bites at sf0.01 (the
    // corpus has three size-3 buckets), so the oracle distinguishes the
    // capped pipeline from q55's
    "q115_neardup_capped" -> ((s, dir) =>
      TextOps.minhashPairsCapped(docs(s, dir), "doc_id", "text",
        shingleSize = 3, NumHashes, BandSize, maxBucket = 2)),
    "q56_simhash" -> ((s, dir) =>
      TextOps.simhash(docs(s, dir), "doc_id", "text", bits = 16)),
    // incremental-ingest dedup: the md5-selected 30% "new batch" collides
    // against the 70% "existing corpus" — batch-vs-corpus LSH, not a
    // from-scratch self-join over the union
    "q106_crossdedup" -> ((s, dir) => {
      val d = docs(s, dir)
      val isNew = TextOps.hash56(col("doc_id").cast("string")) % 10 < 3
      TextOps.minhashPairsAcross(d.where(isNew), d.where(!isNew),
        "doc_id", "text", shingleSize = 3, NumHashes, BandSize)
    }),
    "q57_ngram_jaccard" -> ((s, dir) => {
      val d = docs(s, dir)
      val cand = TextOps.minhashPairs(d, "doc_id", "text", shingleSize = 3,
        NumHashes, BandSize)
      canon(TextOps.ngramJaccard(d, "doc_id", "text", n = 3, cand))
    }),
    // asymmetric containment over the same LSH candidates — the
    // subset-dup verify Jaccard under-scores
    "q243_containment" -> ((s, dir) => {
      val d = docs(s, dir)
      val cand = TextOps.minhashPairs(d, "doc_id", "text", shingleSize = 3,
        NumHashes, BandSize)
      canon(TextOps.ngramContainment(d, "doc_id", "text", n = 3, cand))
    }),
    // per-doc marginal-novelty curve: share of 3-shingles first owned
    // (min doc_id) by this doc
    "q242_novelty" -> ((s, dir) =>
      canon(TextOps.noveltyScore(docs(s, dir), "doc_id", "text", n = 3))),
    "q58_embed_neardup" -> ((s, dir) =>
      canon(graft.multi.Blocked.cosineNearDup(emb(s, dir), "vec_id", "embedding", 0.4).toDF())),
    "q59_ann_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      canon(Similarity.bruteForceTopK(e.where(col("vec_id") < 20), e,
        "vec_id", "embedding", k = 10))
    }),
    // MMR diverse top-k: distributed shortlist (TakeOrdered), greedy on
    // the collected shortlist; query = the vec_id-0 embedding
    "q140_mmr_select" -> ((s, dir) => {
      val e = emb(s, dir)
      val qv = e.where(col("vec_id") === 0)
        .select(transform(col("embedding"), x => x.cast("double")))
        .head().getSeq[Double](0).toArray
      canon(Similarity.mmrSelect(e.where(col("vec_id") =!= 0),
        "vec_id", "embedding", qv, k = 10, lambda = MmrLam, shortlist = 64))
    }),
    "q77_winnow" -> ((s, dir) =>
      TextOps.winnow(docs(s, dir), "doc_id", "text", k = 3, winSize = 4)),
    "q78_tfidf" -> ((s, dir) =>
      canon(TextOps.tfidf(docs(s, dir), "doc_id", "text", topK = 5))),
    "q84_winnow_pairs" -> ((s, dir) =>
      TextOps.winnowPairs(docs(s, dir), "doc_id", "text", k = 3, winSize = 4,
        minShared = 3L)),
    // the end-to-end curation composition: quality gate ∧ language gate ∧
    // near-dup survivorship — the operators composing as one DataFrame flow
    "q81_corpus_curation" -> ((s, dir) => {
      val d = docs(s, dir)
      val q = TextOps.qualityScore(d, "doc_id", "text").select(col("doc_id"), col("quality"))
      val l = TextOps.langId(d, "doc_id", "text").select(col("doc_id"), col("predLang"))
      val cand = TextOps.minhashPairs(d, "doc_id", "text", shingleSize = 3,
        NumHashes, BandSize)
      val surv = TextOps.dedupSurvivors(TextOps.dupClusters(d, "doc_id", cand))
        .select(col("doc_id"))
      canon(d.select(col("doc_id"))
        .join(q, "doc_id").join(l, "doc_id").join(surv, "doc_id")
        .where(col("quality") >= 0.5 && col("predLang") === "en")
        .select(col("doc_id"), col("predLang"), col("quality")))
    }),
    "q75_dup_clusters" -> ((s, dir) => {
      val d = docs(s, dir)
      val cand = TextOps.minhashPairs(d, "doc_id", "text", shingleSize = 3,
        NumHashes, BandSize)
      TextOps.dupClusters(d, "doc_id", cand)
    }),
    "q76_dedup_survivors" -> ((s, dir) => {
      val d = docs(s, dir)
      val cand = TextOps.minhashPairs(d, "doc_id", "text", shingleSize = 3,
        NumHashes, BandSize)
      TextOps.dedupSurvivors(TextOps.dupClusters(d, "doc_id", cand))
    }),
    // md5-derived ±1 hyperplanes (Similarity.hashHyperplanes) make the
    // LSH path deterministic cross-engine → full oracle below
    "q60_ann_lsh" -> ((s, dir) =>
      canon(Similarity.lshNearDupHashed(emb(s, dir), "vec_id", "embedding",
        dim = 64, planes = 8, threshold = 0.3))),
    // deterministic coarse quantizer (md5-ordered sample + fixed Lloyd,
    // 5dp-rounded centroids) -> index build + search replay in SQL below
    "q61_ann_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
      canon(Similarity.ivfTopKDeterministic(e.where(col("vec_id") < 20), e,
        "vec_id", "embedding", dim = 64, nCells = 8, nProbe = 2, k = 10,
        iters = 10, maxSample = 20000))
    }),
    // split-leakage audit: LSH near-dup candidate pairs crossing the
    // stratified train/val/test boundary — the eval-hygiene number a
    // decontamination pass must drive to zero
    "q480_split_leakage" -> ((s, dir) => {
      val d = docs(s, dir)
      val split = graft.model.Sampling
        .stratifiedSplit(d, "doc_id", "lang", fTrain = 0.8, fVal = 0.1)
        .select(col("id").as("doc_id"), col("split"))
      val pairs = TextOps.minhashPairs(d, "doc_id", "text",
        shingleSize = 3, NumHashes, BandSize)
      canon(pairs
        .join(split.select(col("doc_id").as("a"), col("split").as("_sa")),
          "a")
        .join(split.select(col("doc_id").as("b"), col("split").as("_sb")),
          "b")
        .select(least(col("_sa"), col("_sb")).as("split_a"),
          greatest(col("_sa"), col("_sb")).as("split_b"))
        .groupBy(col("split_a"), col("split_b"))
        .agg(count(lit(1)).as("pairs"))
        .withColumn("leaky", col("split_a") =!= col("split_b")))
    }),
    // recall@10 of the q61 IVF against q59's exact brute-force truth —
    // the ANN-quality audit as an oracle-gated query
    "q477_ann_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val qs = e.where(col("vec_id") < 20)
      val truth = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding",
        k = 10).select(col("qid"), col("cid"))
      val approx = Similarity.ivfTopKDeterministic(qs, e, "vec_id",
        "embedding", dim = 64, nCells = 8, nProbe = 2, k = 10,
        iters = 10, maxSample = 20000)
        .select(col("qid"), col("cid"), lit(1L).as("_m"))
      canon(truth.join(approx, Seq("qid", "cid"), "left")
        .groupBy(col("qid"))
        .agg(sum(coalesce(col("_m"), lit(0L))).as("hits"))
        .select(col("qid"), lit(10L).as("k"), col("hits"),
          (col("hits").cast("double") / 10.0).as("recall")))
    }),
    // product quantization: 4 sub-codebooks (fixed-Lloyd, md5 sample),
    // ADC scan, exact top-10 re-rank of the 50-candidate shortlist —
    // fully deterministic, SQL-replayed below
    "q97_ann_pq" -> ((s, dir) => {
      val e = emb(s, dir)
      canon(Similarity.pqTopKDeterministic(e.where(col("vec_id") < 20), e,
        "vec_id", "embedding", dim = 64, m = 4, kCodes = 8, k = 10,
        shortlist = 50, iters = 5, maxSample = 4096))
    }),
    // the full curation flow — language gate ∧ quality gate ∧ LSH-dedup
    // survivorship ∧ LM-score gate, then the per-source quota — run as
    // ONE text-extraction pass (tokenize once, persist the per-doc
    // feature frame, every cross-doc stage branches off it). This is
    // the 100 TB shape the old staged composition documented as its own
    // lever (r9 verdict item 4: the corpus is read once)
    "q103_curation_quota" -> ((s, dir) =>
      canon(TextOps.curationQuotaFused(docs(s, dir), "doc_id", "source",
        "text", shingleSize = 3, numHashes = NumHashes, bandSize = BandSize))),
    // the SAME curation flow as a STAGED composition of the public
    // operators (qualityScore / langId / minhashPairs / dedupSurvivors /
    // lmScore joined post-hoc) — kept as the operator-composition
    // coverage face, bit-identical to q103 (shared expression builders +
    // oracle). Each stage re-tokenizes; at 100 TB use the fused q103.
    "q161_curation_staged" -> ((s, dir) => {
      val d = docs(s, dir)
      val q = TextOps.qualityScore(d, "doc_id", "text").select(col("doc_id"), col("quality"))
      val l = TextOps.langId(d, "doc_id", "text").select(col("doc_id"), col("predLang"))
      val cand = TextOps.minhashPairs(d, "doc_id", "text", shingleSize = 3,
        NumHashes, BandSize)
      val surv = TextOps.dedupSurvivors(TextOps.dupClusters(d, "doc_id", cand))
        .select(col("doc_id"))
      val lm = TextOps.lmScore(d, "doc_id", "text").select(col("doc_id"), col("avgNll"))
      val kept = d.select(col("doc_id"), col("source"))
        .join(q, "doc_id").join(l, "doc_id").join(surv, "doc_id").join(lm, "doc_id")
        .where(col("quality") >= 0.5 && col("predLang") === "en" &&
          col("avgNll") <= 3.45)
      val w = Window.partitionBy("source").orderBy(col("quality").desc, col("doc_id"))
      canon(kept.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 12)
        .select("doc_id", "source", "quality", "avgNll", "rank"))
    }),
    // per-source quality quota (RefinedWeb-style domain cap): keep the
    // 15 highest-quality docs per source, ranked on the raw double
    "q101_source_quota" -> ((s, dir) =>
      canon(TextOps.perGroupQuota(docs(s, dir), "doc_id", "source", "text",
        maxPerGroup = 15))),
    // CCNet-style LM quality scoring: Laplace bigram LM fitted on the
    // corpus, mean -ln P(w|prev) per doc
    "q102_lm_score" -> ((s, dir) =>
      canon(TextOps.lmScore(docs(s, dir), "doc_id", "text"))),
    // CCNet-style calibration: per-lang head/middle/tail terciles of the
    // LM score — a global cut would over-prune whole languages
    "q131_score_buckets" -> ((s, dir) => {
      val d = docs(s, dir)
      val scored = TextOps.lmScore(d, "doc_id", "text")
        .join(d.select("doc_id", "lang"), "doc_id")
      TextOps.scoreBuckets(scored, "lang", "avgNll")
        .select("doc_id", "lang", "score4", "bucket")
    }),
    // the 100 TB face of q131: cuts from the mergeable bottom-k sketch
    // (k=128 < the biggest lang at sf0.01, so real sampling is exercised)
    // — sample AND interpolation are md5-deterministic, full SQL replay
    "q179_bucket_sketch" -> ((s, dir) => {
      val d = docs(s, dir)
      val scored = TextOps.lmScore(d, "doc_id", "text")
        .join(d.select("doc_id", "lang"), "doc_id")
      TextOps.scoreBucketsSketch(scored, "lang", "doc_id", "avgNll", k = 128)
        .select("doc_id", "lang", "score4", "bucket")
    }),
    // int8 embedding quantization round-trip: per-vector scale, exact
    // code sum and max reconstruction error — the storage scale path's
    // arithmetic replayed end-to-end
    "q180_int8_quant" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = Similarity.quantizeInt8(e, "vec_id", "embedding")
      val d = Similarity.dequantizeInt8(q, "vec_id")
        .withColumnRenamed("vec", "dvec")
      val vd = e.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vd"))
      q.join(d, "vec_id").join(vd, "vec_id")
        .select(col("vec_id"),
          roundLikeDuck(col("scale"), 6).as("scale"),
          aggregate(col("qvec"), lit(0L), (a, x) => a + x.cast("long")).as("qsum"),
          roundLikeDuck(array_max(zip_with(col("vd"), col("dvec"),
            (a, b) => abs(a - b))), 6).as("maxErr"))
    }),
    // full-corpus distributed Lloyd k-means in 6dp integer fixed-point:
    // quantized vectors, exact long distances and per-cell sums, one
    // correctly-rounded double division per (cell, dim) per iteration —
    // the whole fit (init, 4 Lloyd rounds, final sizes + exact inertia)
    // replays bit-for-bit in the unrolled-CTE oracle below
    "q181_kmeans_fit" -> ((s, dir) =>
      canon(KMeansDist.fit(emb(s, dir), "vec_id", "embedding", dim = 64,
        k = 8, iters = 4, maxSample = 20000))),
    // distance-to-centroid anomalies on the same fit: exact integer
    // distance ranking (desc, id) → distributed TakeOrdered top-20
    "q187_kmeans_outliers" -> ((s, dir) =>
      canon(KMeansDist.topOutliers(emb(s, dir), "vec_id", "embedding",
        dim = 64, k = 8, iters = 4, topK = 20))),
    // approximate LOF at the cell-bounded pair cost: the exact q45 LOF
    // chain over cellKnn's within-cell neighbors — pair work Σ occ²,
    // never corpus²; same kmeans fit (and oracle CTEs) as q181/q187
    "q193_lof_cells" -> ((s, dir) =>
      canon(graft.multi.Proximity.lofFromKnn(
        graft.multi.Proximity.cellKnn(emb(s, dir), "vec_id", "embedding",
          dim = 64, nCells = 8, iters = 4, k = 5), k = 5))),
    // logistic-regression quality classifier (gradient-descent face of
    // the q174 NB filter): algebraic sigmoid (IEEE basic ops only — no
    // libm parity needed), 9dp fixed-point gradient sums, 6dp weight
    // re-grain; 5 unrolled iterations replay in the oracle. The label is
    // a length cut the features can recover (the synthetic corpus's text
    // is independent of its lang column, so a lang label would pin the
    // fit at the majority baseline and verify nothing about descent);
    // real deployments pass a human-labeled quality seed.
    "q183_logreg_quality" -> ((s, dir) =>
      canon(TextOps.logRegFit(logregFeat(docs(s, dir)),
        Seq("f0", "f1", "f2", "f3"), "y", iters = 5, lr = 0.5))),
    // the learned filter applied per doc: z from the 6dp weights is
    // bit-identical cross-engine (same IEEE op sequence) — the
    // train → score loop of the GPT-3-style quality filter, end to end
    "q192_logreg_score" -> ((s, dir) => {
      val feat = logregFeat(docs(s, dir))
      val w = TextOps.logRegFit(feat, Seq("f0", "f1", "f2", "f3"), "y",
        iters = 5, lr = 0.5)
        .collect().sortBy(_.getAs[Int]("j")).map(_.getAs[Double]("weight"))
      val z = Seq("f0", "f1", "f2", "f3").zipWithIndex
        .map { case (c, j) => lit(w(j)) * col(c) }.reduce(_ + _)
      canon(feat.select(col("doc_id"), z.as("z"), (z >= 0).as("keep")))
    }),
    // BPE tokenizer training: 10 merge rules learned over the top-1000
    // word-frequency table — corpus read once, merge rounds scan only the
    // vocab; pure integer/string arithmetic, so the unrolled-CTE oracle
    // replays every rule and count exactly
    "q184_bpe_train" -> ((s, dir) =>
      TextOps.bpeTrain(docs(s, dir), "doc_id", "text",
        nMerges = 10, vocabTopN = 1000)),
    // BPE encode with the learned rules: per-char wrapping, merges
    // applied in training order as chained replaces, token count =
    // remaining symbol count — one codegen pass, no shuffle
    "q185_bpe_encode" -> ((s, dir) => {
      val rules = TextOps.bpeTrain(docs(s, dir), "doc_id", "text",
        nMerges = 10, vocabTopN = 1000)
        .collect().sortBy(_.getAs[Int]("round"))
        .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
      TextOps.bpeEncode(docs(s, dir), "doc_id", "text", rules)
    }),
    // per-(source, lang) corpus accounting: the table a mixing decision
    // starts from
    "q136_corpus_report" -> ((s, dir) =>
      TextOps.corpusReport(docs(s, dir), "source", "lang", "text")),
    // temperature-scaled mixing: alpha=0.5 over per-source char masses,
    // 30% token budget — crawl-sized sources downsampled hardest
    "q132_temperature_mix" -> ((s, dir) =>
      canon(TextOps.temperatureMix(docs(s, dir), "doc_id", "source",
        "n_chars", alpha = 0.5, budgetFrac = 0.3)
        .select("doc_id", "source", "u", "quota"))),
    // the streaming embedding near-dup operator executed as a batch
    // query (flatMapGroupsWithState is batch-executable — how the driver
    // can gate a STREAM operator against the DuckDB oracle): md5-derived
    // sign-LSH buckets + scale-free int8-quantized cosine are both
    // deterministic, so every number replays in SQL below
    "q100_emb_neardup_stream" -> ((s, dir) => {
      val e = emb(s, dir)
      canon(graft.streaming.StreamScorers.embeddingNearDupStream(e,
        "vec_id", "embedding", dim = 64, planes = 8, threshold = 0.3,
        maxBucket = 1 << 20).toDF())
    }),
    // residual-encoded IVF × PQ (FAISS by_residual): sub-codebooks train
    // on v − centroid(cell) so the same code budget quantizes much finer
    // on clustered corpora (spec-measured recall win); deterministic
    // end-to-end, full SQL replay below
    "q104_ann_ivfpq_residual" -> ((s, dir) => {
      val e = emb(s, dir)
      canon(Similarity.ivfPqResidualTopKDeterministic(e.where(col("vec_id") < 20), e,
        "vec_id", "embedding", dim = 64, nCells = 8, nProbe = 2, m = 4,
        kCodes = 8, k = 10, shortlist = 50, itersCoarse = 10, itersPq = 5,
        maxSample = 4096))
    }),
    // range search over the prebuilt residual index (FAISS range_search
    // analog): all probed-cell pairs within ADC radius 1.4 — no top-k
    // window, so the identical plan is the streaming ingest filter
    // (StreamSpec pins stream/batch parity)
    "q105_ann_pq_range" -> ((s, dir) => {
      val e = emb(s, dir)
      val idx = Similarity.ivfPqResidualBuild(e, "vec_id", "embedding",
        dim = 64, nCells = 8, m = 4, kCodes = 8, itersCoarse = 10,
        itersPq = 5, maxSample = 4096)
      canon(Similarity.ivfPqResidualRange(e.where(col("vec_id") < 20), idx,
        "vec_id", "embedding", nProbe = 2, maxDist = 1.4))
    }),
    // IVF × PQ at PARTIAL probe (nProbe=2 of 8 cells) — the composition
    // actually run at scale: coarse cells bound the candidate set, PQ
    // codes carry the ADC scan. Deterministic end-to-end (the q61 coarse
    // quantizer + the q97 sub-codebooks over one shared md5 sample), so
    // the partial-probe path has its own full SQL replay below.
    "q98_ann_ivfpq" -> ((s, dir) => {
      val e = emb(s, dir)
      canon(Similarity.ivfPqTopKDeterministic(e.where(col("vec_id") < 20), e,
        "vec_id", "embedding", dim = 64, nCells = 8, nProbe = 2, m = 4,
        kCodes = 8, k = 10, shortlist = 50, itersCoarse = 10, itersPq = 5,
        maxSample = 4096))
    }),
    // SemDeDup (Abbas et al. 2023): 8 deterministic KMeans cells over the
    // embedding space (the shared q98 coarse quantizer), within-cell
    // ε-pairs at cos ≥ 0.4 drop the member MORE similar to its centroid —
    // survivors + their centroid cosine
    "q109_semdedup" -> ((s, dir) =>
      canon(Similarity.semDedupDeterministic(emb(s, dir), "vec_id",
        "embedding", nCells = 8, eps = 0.4, iters = 10, maxSample = 4096))),
    // incremental ingest: the q130 snapshot split drives diff → Gopher
    // gate → cross-corpus near-dup → admit
    "q135_incremental_ingest" -> ((s, dir) => {
      val d = docs(s, dir)
      val m5 = pmod(col("doc_id"), lit(5))
      val old = d.where(m5 =!= 4).withColumn("text",
        when(m5 === 3, concat(col("text"), lit(" v1"))).otherwise(col("text")))
      val neu = d.where(m5 =!= 0)
      TextOps.incrementalIngest(old, neu, "doc_id", "text",
        shingleSize = 3, numHashes = NumHashes, bandSize = BandSize)
    }),
    // cluster-balanced sampling: equal per-topic quota (40) over the q109
    // quantizer's 8 cells, members ranked by md5(id)
    "q134_cluster_sample" -> ((s, dir) =>
      Similarity.clusterBalancedSample(emb(s, dir), "vec_id", "embedding",
        nCells = 8, perCell = 40, iters = 10, maxSample = 4096)),
    // DSIR (Xie et al. 2023): importance-resample the corpus toward the
    // src0 slice's hashed-bigram distribution; Gumbel-top-100 with
    // md5-derived noise
    "q110_dsir" -> ((s, dir) => {
      val d = docs(s, dir)
      canon(TextOps.dsirSelect(d, d.where(col("source") === "src0"),
        "doc_id", "text", topN = 100, nBuckets = 512))
    }),
    // exact heavy-hitter bigrams behind the Misra-Gries candidate
    // prefilter; capacity 16384 keeps the superset bound N/C below
    // minCount 30 at both gate scales (sf0.01: N/C ≈ 2; sf0.1: ≈ 16 —
    // the runtime require would refuse, not silently miss, beyond that)
    "q111_heavy_grams" -> ((s, dir) =>
      TextOps.heavyHitterGrams(docs(s, dir), "doc_id", "text", n = 2,
        minCount = 30, capacity = 16384)),
    // the streaming Space-Saving twin executed as batch (q100 pattern):
    // one batch with capacity above the per-shard distinct-gram count
    // means no eviction — counts exact, err 0, emission = plain HAVING,
    // so the stream code path shares q111's oracle (+ maxErr column)
    "q151_heavy_stream" -> ((s, dir) =>
      graft.streaming.StreamScorers.heavyHitterStream(docs(s, dir), "text",
        n = 2, minCount = 30, nShards = 64, capacity = 1 << 20).toDF()
        .select(col("gram"), col("cnt"), col("maxErr"))),
    // cross-corpus SemDeDup (incremental ingest): the ~20% md5-split
    // "new batch" checked against the corpus-trained cell index
    "q114_semdedup_across" -> ((s, dir) => {
      val e = emb(s, dir)
      val isB = graft.text.TextOps.hash56(col("vec_id").cast("string")) % 5 === 0
      canon(Similarity.semDedupAcross(e.where(isB), e.where(!isB), "vec_id",
        "embedding", nCells = 8, eps = 0.4, iters = 10, maxSample = 4096))
    }),
    // clustering-quality audit over the labeled embeddings (centroid-form
    // silhouette; centroids 6dp-frozen on both engines)
    "q152_silhouette" -> ((s, dir) =>
      canon(Similarity.silhouette(emb(s, dir), "embedding", "label"))),
    // corpus-overlap matrix: exact pairwise 3-gram Jaccard between sources
    "q153_source_overlap" -> ((s, dir) =>
      canon(TextOps.sourceOverlap(docs(s, dir), "source", "text", n = 3))),
    // per-source signature tokens by lift, top-10, min 20 occurrences
    "q154_source_signature" -> ((s, dir) =>
      canon(TextOps.sourceSignature(docs(s, dir), "source", "text",
        topK = 10, minCount = 20))),
    // sketch face of q153: bottom-256 KMV Jaccard estimate per source pair
    "q159_overlap_sketch" -> ((s, dir) =>
      canon(TextOps.sourceOverlapSketch(docs(s, dir), "source", "text",
        n = 3, k = 256))),
  ) ++ nbQueries

  private val toks = """regexp_extract_all(lower(text), '\S+')"""
  private def h56(e: String) = s"('0x'||substr(md5($e),1,14))::BIGINT"

  /** MMR λ; the oracle interpolates λ and 1−λ from these exact doubles
    * (a literal 0.3 in SQL would differ from Scala's 1−0.7 by one ulp
    * and could flip a greedy pick). */
  private val MmrLam = 0.7

  // shared by the q236 query and its oracle (lists must match literally)
  private val rakeStops = Seq("the", "a", "an", "of", "and", "or", "to",
    "in", "on", "for", "with", "is", "are", "was", "be", "as", "at", "by",
    "it", "this", "that", "from", "we", "you", "not")

  // Gopher §A1.1 rule inputs per doc (gb: raw arrays, gm: the metrics) —
  // shared by the rule-battery and the incremental-ingest oracles.
  private lazy val gopherCte =
    s"""gb AS (SELECT doc_id,
       |  $toks AS ws,
       |  string_split(text, chr(10)) AS lines,
       |  len(regexp_extract_all(text, '#|\\.\\.\\.|…'))::DOUBLE AS nsym
       | FROM documents),
       |gm AS (SELECT doc_id,
       |  len(ws)::BIGINT AS nWords,
       |  greatest(len(ws), 1)::DOUBLE AS nwd,
       |  list_sum(list_transform(ws, x -> length(x)))::DOUBLE
       |    / greatest(len(ws), 1) AS mwl,
       |  nsym / greatest(len(ws), 1) AS symr,
       |  len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]')))::DOUBLE
       |    / greatest(len(lines), 1) AS bull,
       |  len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*${"$"}')))::DOUBLE
       |    / greatest(len(lines), 1) AS ell,
       |  len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))::DOUBLE
       |    / greatest(len(ws), 1) AS alpha,
       |  (${TextOps.langMarkers("en")
           .map(w => s"list_contains(ws, '$w')::INT").mkString(" + ")})::BIGINT AS nStop
       | FROM gb)""".stripMargin.replace("\n", " ")

  // Laplace-smoothed bigram LM fitted on the corpus itself; `lm` = one
  // row per doc with (nGrams, avgNll). Shared by the LM-score and the
  // CCNet-bucket oracles.
  private val lmCte =
    s"""tk AS (SELECT doc_id, $toks AS t FROM documents),
       |bb AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
       | FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
       |   FROM tk WHERE len(t) >= 2)),
       |cb AS (SELECT w1, w2, count(*) AS cBi FROM bb GROUP BY 1, 2),
       |cx AS (SELECT w1, sum(cBi) AS cCtx FROM cb GROUP BY 1),
       |v AS (SELECT count(DISTINCT tok) AS v
       | FROM (SELECT unnest(t) AS tok FROM tk)),
       |sc AS (SELECT bb.doc_id,
       |  -ln((cb.cBi + 1.0) / (cx.cCtx + 1.0 * v.v)) AS nll
       | FROM bb JOIN cb USING (w1, w2) JOIN cx USING (w1), v),
       |ag AS (SELECT doc_id, count(*) AS nGrams, avg(nll) AS avgNll
       | FROM sc GROUP BY 1),
       |lm AS (SELECT d.doc_id, coalesce(ag.nGrams, 0)::BIGINT AS nGrams,
       |  coalesce(ag.avgNll, 0.0) AS avgNll
       | FROM documents d LEFT JOIN ag USING (doc_id))"""
      .stripMargin.replace("\n", " ")

  // 32-token windows at step 24 over the token stream (shared by the
  // chunking and packing oracles)
  private val chunkCte =
    s"""t AS (SELECT doc_id, $toks AS tk FROM documents),
       |p AS (SELECT doc_id, tk, len(tk) AS n,
       |   CASE WHEN len(tk) <= 32 THEN 1
       |    ELSE ceil((len(tk) - 32) / 24.0)::INT + 1 END AS nc
       | FROM t WHERE len(tk) > 0),
       |cg AS (SELECT doc_id, tk, n, unnest(range(0, nc)) AS i FROM p),
       |ch AS (SELECT doc_id, i::INT AS chunkIdx, (i*24 + 1)::INT AS startTok,
       |  least(32, n - i*24)::INT AS nTok,
       |  array_to_string(tk[i*24+1 : i*24 + least(32, n - i*24)], ' ') AS chunk
       | FROM cg)""".stripMargin.replace("\n", " ")

  // distinct 3-shingles with 56-bit hashes reduced mod P
  private val shingleCte =
    s"""tk AS (SELECT doc_id, $toks AS t FROM documents),
       |sh AS (SELECT DISTINCT doc_id,
       |  unnest(CASE WHEN len(t) >= 3
       |    THEN list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |    ELSE [] END) AS shingle
       | FROM tk),
       |shx AS (SELECT doc_id, ${h56("shingle")} % ${TextOps.P} AS x FROM sh)"""
      .stripMargin.replace("\n", " ")

  private val paramValues = TextOps.hashParams(NumHashes).zipWithIndex
    .map { case ((a, b), i) => s"($i,$a,$b)" }.mkString(",")

  private val sigCte =
    s"""$shingleCte,
       |hp(hashIdx, a, b) AS (VALUES $paramValues),
       |sig AS (SELECT doc_id, hashIdx, min((a*x+b) % ${TextOps.P}) AS minHash
       | FROM shx CROSS JOIN hp GROUP BY doc_id, hashIdx)"""
      .stripMargin.replace("\n", " ")

  // connected components over the LSH candidate pairs via a recursive
  // transitive-closure CTE (small at oracle scale; the Spark side uses
  // hash-to-min label propagation instead)
  private[queries] val clusterSql =
    s"""WITH RECURSIVE $sigCte,
       |bands AS (SELECT doc_id, hashIdx // $BandSize AS band,
       |  array_to_string(list(minHash ORDER BY hashIdx), ':') AS bucket
       | FROM sig GROUP BY doc_id, band),
       |cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       | FROM bands l JOIN bands r ON l.band = r.band AND l.bucket = r.bucket
       | WHERE l.doc_id < r.doc_id),
       |edges AS (SELECT a, b FROM cand UNION ALL SELECT b AS a, a AS b FROM cand),
       |reach(id, label) AS (
       | SELECT doc_id, doc_id FROM documents
       | UNION
       | SELECT e.a, r.label FROM reach r JOIN edges e ON e.b = r.id),
       |comp AS (SELECT id, min(label) AS cluster FROM reach GROUP BY id)"""
      .stripMargin.replace("\n", " ")

  private val markers = TextOps.langMarkers.toSeq.sortBy(_._1)
  private def inList(words: Seq[String]) = words.map(w => s"'$w'").mkString(",")

  private lazy val curationOracle: String =
      s"""$clusterSql,
         |qb AS (SELECT doc_id,
         |  len($toks)::DOUBLE AS nTok,
         |  len(list_filter($toks, t -> t IN (${inList(TextOps.langMarkers("en"))})))::DOUBLE AS nStop,
         |  len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE AS nPunct,
         |  len(regexp_extract_all(text, '[0-9]'))::DOUBLE AS nDigit,
         |  length(text)::DOUBLE AS nChars
         | FROM documents),
         |qual AS (SELECT doc_id,
         | (least(nTok/50.0, 1.0)
         |  + least(nStop/greatest(nTok,1.0)*10.0, 1.0)
         |  + (1.0 - least(nPunct/greatest(nChars,1.0)*20.0, 1.0))
         |  + (1.0 - least(nDigit/greatest(nChars,1.0)*10.0, 1.0))) / 4.0 AS rawq
         | FROM qb),
         |lc AS (SELECT doc_id,
         |${markers.map { case (l, ws) =>
             s" len(list_filter($toks, t -> t IN (${inList(ws)})))::INT AS n_$l" }
             .mkString(",")}
         | FROM documents),
         |lang AS (SELECT doc_id,
         | CASE WHEN greatest(${markers.map(m => s"n_${m._1}").mkString(",")}) = 0 THEN 'unknown'
         |${markers.map { case (l, _) =>
             s" WHEN n_$l = greatest(${markers.map(m => s"n_${m._1}").mkString(",")}) THEN '$l'" }
             .mkString}
         | ELSE 'unknown' END AS predLang FROM lc),
         |bb AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
         | FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
         |   FROM tk WHERE len(t) >= 2)),
         |cb AS (SELECT w1, w2, count(*) AS cBi FROM bb GROUP BY 1, 2),
         |cx AS (SELECT w1, sum(cBi) AS cCtx FROM cb GROUP BY 1),
         |v AS (SELECT count(DISTINCT tok) AS v
         | FROM (SELECT unnest(t) AS tok FROM tk)),
         |snl AS (SELECT bb.doc_id,
         |  -ln((cb.cBi + 1.0) / (cx.cCtx + 1.0 * v.v)) AS nll
         | FROM bb JOIN cb USING (w1, w2) JOIN cx USING (w1), v),
         |ag AS (SELECT doc_id, count(*) AS nGrams, avg(nll) AS avgNll
         | FROM snl GROUP BY 1),
         |keep AS (SELECT d.doc_id, d.source, qual.rawq,
         |  coalesce(ag.avgNll, 0.0) AS rawNll
         | FROM documents d
         | JOIN qual ON d.doc_id = qual.doc_id
         | JOIN lang ON d.doc_id = lang.doc_id
         | LEFT JOIN ag ON d.doc_id = ag.doc_id
         | WHERE qual.rawq >= 0.5 AND lang.predLang = 'en'
         |  AND coalesce(ag.avgNll, 0.0) <= 3.45
         |  AND d.doc_id IN (SELECT DISTINCT cluster FROM comp)),
         |r AS (SELECT doc_id, source, rawq, rawNll,
         |  row_number() OVER (PARTITION BY source
         |    ORDER BY rawq DESC, doc_id) AS rank
         | FROM keep)
         |SELECT doc_id, source, round(rawq, 4) AS quality,
         | round(rawNll, 4) AS avgNll, rank
         |FROM r WHERE rank <= 12""".stripMargin.replace("\n", " ")

  private lazy val decontaminateOracle: String =
    s"""WITH sp AS (SELECT doc_id, text,
       |   ${h56("doc_id::VARCHAR")} % 20 = 0 AS is_eval FROM documents),
       |tk AS (SELECT doc_id, is_eval, $toks AS t FROM sp),
       |g AS (SELECT DISTINCT doc_id, is_eval, unnest(CASE WHEN len(t) >= 6
       |   THEN list_transform(range(1, len(t) - 4),
       |     i -> array_to_string(t[i : i+5], ' '))
       |   ELSE [] END) AS gram FROM tk),
       |e AS (SELECT DISTINCT gram FROM g WHERE is_eval),
       |h AS (SELECT g.doc_id, count(*) AS nGramHits
       | FROM g JOIN e USING (gram) WHERE NOT g.is_eval GROUP BY 1)
       |SELECT sp.doc_id, coalesce(h.nGramHits, 0)::BIGINT AS nGramHits,
       | coalesce(h.nGramHits, 0) > 0 AS contaminated
       |FROM sp LEFT JOIN h USING (doc_id) WHERE NOT sp.is_eval"""
      .stripMargin.replace("\n", " ")

  // ==== shared PQ oracle fragments (q97 flat PQ + q98 IVF×PQ) ====
  // parameters mirror the Spark calls: m=4 subspaces of 16 dims, 8 codes
  // per sub-codebook, 5 Lloyd iterations, one md5-ordered 4096-row sample
  private val PqM = 4
  private val PqSub = 16
  private val PqKc = 8
  private val PqIters = 5
  private def pqLd(a: String, b: String) = s"list_dot_product($a, $b)"
  private def pqSl(v: String, j: Int) = s"$v[${j * PqSub + 1}:${(j + 1) * PqSub}]"

  /** md5-ordered sample + corpus CTEs shared by every PQ-family oracle. */
  private val pqSampleCtes: String =
    s"""s0 AS (SELECT embedding::DOUBLE[] AS v, md5(vec_id::VARCHAR) AS h
       |  FROM embeddings ORDER BY h, v LIMIT 4096),
       |samp AS MATERIALIZED (SELECT v, row_number() OVER (ORDER BY h, v) AS rn FROM s0),
       |sn AS (SELECT count(*) AS n FROM samp),
       |co AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS w FROM embeddings)""".stripMargin

  /** Per subspace (prefix `pfx` distinguishes raw vs residual books):
    * evenly spaced init over `srcCte` (rn, v rows), the fixed-Lloyd
    * iterations with 5dp-rounded recenter — the q61 Lloyd pattern on
    * each 16-dim slice. Codebook tables land as `${pfx}c{j}_{iters}`. */
  private def pqSubLloyd(pfx: String, srcCte: String): String =
    (0 until PqM).map { j =>
      val init =
        s"""${pfx}sv$j AS (SELECT rn, ${pqSl("v", j)} AS v FROM $srcCte),
           |${pfx}c${j}_0 AS (SELECT t.i AS cell, s.v AS cv
           | FROM (SELECT unnest(range($PqKc)) AS i) t, sn
           | JOIN ${pfx}sv$j s ON s.rn = (t.i * sn.n) // $PqKc + 1)""".stripMargin
      val lloyd = (1 to PqIters).map { t =>
        s"""${pfx}a${j}_$t AS MATERIALIZED (SELECT s.rn, s.v,
           |  (min({'d': ${pqLd("c.cv", "c.cv")} - 2.0 * ${pqLd("s.v", "c.cv")}, 'c': c.cell})).c AS cell
           | FROM ${pfx}sv$j s CROSS JOIN ${pfx}c${j}_${t - 1} c GROUP BY s.rn, s.v),
           |${pfx}g${j}_$t AS (SELECT a.cell, t.d, round(avg(a.v[t.d + 1]), 5) AS cx
           | FROM ${pfx}a${j}_$t a CROSS JOIN (SELECT unnest(range($PqSub)) AS d) t
           | GROUP BY a.cell, t.d),
           |${pfx}c${j}_$t AS MATERIALIZED (SELECT p.cell,
           |  CASE WHEN count(g.cx) = 0 THEN p.cv
           |   ELSE list(g.cx ORDER BY g.d) END AS cv
           | FROM ${pfx}c${j}_${t - 1} p LEFT JOIN ${pfx}g${j}_$t g USING (cell)
           | GROUP BY p.cell, p.cv)""".stripMargin
      }.mkString(", ")
      s"$init, $lloyd"
    }.mkString(", ")

  /** Sample + raw-vector sub-codebooks + raw corpus encode (`e{j}`) —
    * the fragments q97 and q98 share. */
  private lazy val pqCommonCtes: String = {
    val encodes = (0 until PqM).map { j =>
      s"""e$j AS MATERIALIZED (SELECT co.cid,
         |  (min({'d': ${pqLd("c.cv", "c.cv")} - 2.0 * ${pqLd(pqSl("co.w", j), "c.cv")}, 'c': c.cell})).c AS code
         | FROM co CROSS JOIN c${j}_$PqIters c GROUP BY co.cid)""".stripMargin
    }.mkString(", ")
    s"$pqSampleCtes, ${pqSubLloyd("", "samp")}, $encodes"
  }

  private val PqNCells = 8
  private val PqNProbe = 2
  private val PqItersCoarse = 10

  /** Coarse quantizer (full 64-dim fixed-Lloyd over the shared sample) +
    * corpus cell assignment `asg` + query probe ranking `qd` — shared by
    * the q98 and q104 IVF×PQ oracles. */
  private lazy val pqCoarseCtes: String = {
    def ld(a: String, b: String) = s"list_dot_product($a, $b)"
    val coarseLloyd = (1 to PqItersCoarse).map { t =>
      s"""ca$t AS MATERIALIZED (SELECT s.rn, s.v,
         |  (min({'d': ${ld("c.cv", "c.cv")} - 2.0 * ${ld("s.v", "c.cv")}, 'c': c.cell})).c AS cell
         | FROM samp s CROSS JOIN cc${t - 1} c GROUP BY s.rn, s.v),
         |cg$t AS (SELECT a.cell, t.j, round(avg(a.v[t.j + 1]), 5) AS cx
         | FROM ca$t a CROSS JOIN (SELECT unnest(range(64)) AS j) t
         | GROUP BY a.cell, t.j),
         |cc$t AS MATERIALIZED (SELECT p.cell,
         |  CASE WHEN count(g.cx) = 0 THEN p.cv
         |   ELSE list(g.cx ORDER BY g.j) END AS cv
         | FROM cc${t - 1} p LEFT JOIN cg$t g USING (cell)
         | GROUP BY p.cell, p.cv)""".stripMargin
    }.mkString(", ")
    s"""cc0 AS (SELECT t.i AS cell, s.v AS cv
       | FROM (SELECT unnest(range($PqNCells)) AS i) t, sn
       | JOIN samp s ON s.rn = (t.i * sn.n) // $PqNCells + 1),
       |$coarseLloyd,
       |asg AS MATERIALIZED (SELECT co.cid,
       |  (min({'d': ${ld("c.cv", "c.cv")} - 2.0 * ${ld("co.w", "c.cv")}, 'c': c.cell})).c AS cell
       | FROM co CROSS JOIN cc$PqItersCoarse c GROUP BY co.cid),
       |qs AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 20),
       |qd AS (SELECT q.qid, q.qv, c.cell,
       |  row_number() OVER (PARTITION BY q.qid
       |    ORDER BY ${ld("c.cv", "c.cv")} - 2.0 * ${ld("q.qv", "c.cv")}, c.cell) AS rk
       | FROM qs q CROSS JOIN cc$PqItersCoarse c)""".stripMargin
  }

  /** Everything through the residual `ad` CTE (q104 + q105): coarse
    * fragments, sample residuals + residual sub-codebooks (prefix `r`),
    * residual corpus encode, and the per-probed-cell ADC sum carrying the
    * full ‖qres_j − c‖² terms. */
  private lazy val pqResidualAdCtes: String = {
    def ld(a: String, b: String) = s"list_dot_product($a, $b)"
    def resSl(vec: String, cent: String, j: Int) =
      s"list_transform(range($PqSub), i -> $vec[${j * PqSub} + i + 1] - $cent[${j * PqSub} + i + 1])"
    val encodes = (0 until PqM).map { j =>
      s"""re$j AS MATERIALIZED (SELECT cor.cid,
         |  (min({'d': ${ld("c.cv", "c.cv")} - 2.0 * ${ld(pqSl("cor.rv", j), "c.cv")}, 'c': c.cell})).c AS code
         | FROM cor CROSS JOIN rc${j}_$PqIters c GROUP BY cor.cid)""".stripMargin
    }.mkString(", ")
    val adTerms = (0 until PqM).map { j =>
      val qres = resSl("p.qv", "pc.cv", j)
      s"(${ld(qres, qres)} + ${ld(s"b$j.cv", s"b$j.cv")} - 2.0 * ${ld(qres, s"b$j.cv")})"
    }.mkString(" + ")
    val encJoins = (1 until PqM).map(j => s"JOIN re$j ON re$j.cid = re0.cid").mkString(" ")
    val cbJoins = (0 until PqM).map(j => s"JOIN rc${j}_$PqIters b$j ON b$j.cell = re$j.code").mkString(" ")
    (s"""$pqSampleCtes,
        |$pqCoarseCtes,
        |sa AS MATERIALIZED (SELECT s.rn, s.v,
        |  (min({'d': ${ld("c.cv", "c.cv")} - 2.0 * ${ld("s.v", "c.cv")}, 'c': c.cell})).c AS cell
        | FROM samp s CROSS JOIN cc10 c GROUP BY s.rn, s.v),
        |rs AS MATERIALIZED (SELECT sa.rn,
        |  list_transform(range(64), i -> sa.v[i + 1] - c.cv[i + 1]) AS v
        | FROM sa JOIN cc10 c USING (cell)),
        |${pqSubLloyd("r", "rs")},
        |cor AS MATERIALIZED (SELECT a.cid, a.cell,
        |  list_transform(range(64), i -> (e.embedding::DOUBLE[])[i + 1] - c.cv[i + 1]) AS rv
        | FROM asg a JOIN embeddings e ON e.vec_id = a.cid
        | JOIN cc10 c USING (cell)),
        |$encodes,
        |ad AS MATERIALIZED (SELECT p.qid, re0.cid, $adTerms AS adist
        | FROM (SELECT qid, qv, cell FROM qd WHERE rk <= $PqNProbe) p
        | JOIN cc10 pc ON pc.cell = p.cell
        | JOIN asg a ON a.cell = p.cell
        | JOIN re0 ON re0.cid = a.cid $encJoins $cbJoins
        | WHERE p.qid <> re0.cid)""".stripMargin).replace("\n", " ")
  }

  /** ADC distance: the 4 subspace lookup terms summed left-to-right
    * (matching the Spark reduce); `qv` names the query-vector column of
    * the enclosing candidate row. */
  private def pqAdTerms(qv: String): String = (0 until PqM).map { j =>
    s"(${pqLd(s"b$j.cv", s"b$j.cv")} - 2.0 * ${pqLd(pqSl(qv, j), s"b$j.cv")})"
  }.mkString(" + ")
  private val pqEncJoins =
    (1 until PqM).map(j => s"JOIN e$j ON e$j.cid = e0.cid").mkString(" ")
  private val pqCbJoins =
    (0 until PqM).map(j => s"JOIN c${j}_$PqIters b$j ON b$j.cell = e$j.code").mkString(" ")

  /** Shortlist 50 by (adist, cid) over the `ad` CTE, exact cosine top-10
    * re-rank, final projection — identical tail for q97 and q98. */
  private lazy val pqShortlistToResult: String =
    s"""sh AS (SELECT qid, cid FROM (SELECT *, row_number() OVER (PARTITION BY qid
       |    ORDER BY adist, cid) AS ark FROM ad) WHERE ark <= 50),
       |sc AS (SELECT sh.qid, sh.cid,
       |  ${pqLd("qe.embedding::DOUBLE[]", "ce.embedding::DOUBLE[]")} /
       |   (sqrt(${pqLd("qe.embedding::DOUBLE[]", "qe.embedding::DOUBLE[]")})
       |    * sqrt(${pqLd("ce.embedding::DOUBLE[]", "ce.embedding::DOUBLE[]")})) AS cos
       | FROM sh JOIN embeddings qe ON qe.vec_id = sh.qid
       |  JOIN embeddings ce ON ce.vec_id = sh.cid),
       |r AS (SELECT *, row_number() OVER (PARTITION BY qid
       |    ORDER BY cos DESC, cid) AS rank FROM sc QUALIFY rank <= 10)
       |SELECT qid, cid, round(cos, 4) AS cos, rank FROM r""".stripMargin

  // ---- round-8 additions -------------------------------------------------

  // lazy: referenced from `queries`/`oracleSql` above their definition site
  private lazy val nbQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CCNet §4.1 normalization-based hash dedup: near-identical
    // boilerplate (case/digit/punct variants) collapses to one group
    "q178_dedup_normalized" -> ((s, dir) =>
      TextOps.exactDedupNormalized(docs(s, dir), "doc_id", "text")),
    // C4-style corpus-frequency line dedup (Raffel et al. §2.2). The
    // synthetic docs carry no newlines, so the query exercises the
    // operator's full path with a phrase separator present in the corpus
    // (' table '); the semantics are separator-agnostic.
    "q173_line_dedup" -> ((s, dir) =>
      TextOps.lineDedup(docs(s, dir), "doc_id", "text",
        minDupCount = 2, sep = " table ")),
    // Naive Bayes quality/language classifier (count-based face of the
    // GPT-3 §2.2 linear quality filter): fit en-vs-rest on the
    // md5-selected 60% seed, score the held-out 40%
    "q174_nb_classifier" -> ((s, dir) => {
      val d = docs(s, dir)
      val insd = TextOps.hash56(col("doc_id").cast("string")) % 5 < 3
      val seed = d.where(insd).withColumn("label",
        when(col("lang") === "en", lit("en")).otherwise(lit("other")))
      val model = TextOps.nbFitModel(seed, "doc_id", "text", "label", "en")
      canon(TextOps.nbScore(d.where(!insd), "doc_id", "text", model,
        "en", "other"))
    }),
    // BM25 ranked retrieval over the corpus for a fixed term bag
    "q175_bm25" -> ((s, dir) =>
      canon(TextOps.bm25Search(docs(s, dir), "doc_id", "text",
        Seq("spark", "join", "window", "vector"), topK = 20))),
    // build/search split: the full inverted index built once, the same
    // term bag searched against it — must equal q175 exactly (the PQ
    // build/search precedent, gated on the same oracle)
    "q177_bm25_indexed" -> ((s, dir) => {
      val idx = TextOps.bm25Build(docs(s, dir), "doc_id", "text")
      canon(TextOps.bm25SearchWith(idx, "doc_id",
        Seq("spark", "join", "window", "vector"), topK = 20))
    }),
    // hybrid retrieval: the q175 lexical list fused with a dense cosine
    // list (query = embedding 0) by reciprocal rank, k=60
    "q233_hybrid_rrf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val bm = TextOps.bm25Search(docs(s, dir), "doc_id", "text",
        Seq("spark", "join", "window", "vector"), topK = 20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))))
        .select("doc_id", "rank")
      val e = table(s, dir, "embeddings")
      val ann = graft.sim.Similarity.bruteForceTopK(
        e.where(col("vec_id") === 0), e, "vec_id", "embedding", k = 20)
        .select(col("cid").as("doc_id"), col("rank"))
      canon(graft.sim.Similarity.rrfFuse(Seq(bm, ann), Nil, "doc_id",
        kConst = 60, topK = 20)
        .select("doc_id", "n_lists", "fused_rank", "rrf"))
    }),
    // UniMax per-language budget allocation (Chung et al., ICLR'23):
    // budget = 30% of corpus chars, epoch cap 2
    "q176_unimax" -> ((s, dir) => {
      val d = docs(s, dir)
      val budget = d.agg(sum("n_chars")).collect()(0).getLong(0) * 0.3
      canon(TextOps.unimaxAllocate(d, "lang", "n_chars",
        totalBudget = TextOps.round6(budget), epochCap = 2.0))
    }))

  /** 6dp half-away-from-zero fixed-point long, SQL side (core.fixedPointLong). */
  private def fp6(e: String) =
    s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e6+0.5) ELSE -floor(-($e)*1e6+0.5) END)::BIGINT"

  private lazy val nbOracles: Map[String, String] = Map(
    // int8 quantize → dequantize arithmetic replayed over DuckDB lists
    "q180_int8_quant" ->
      """WITH v AS (SELECT vec_id,
        |  list_transform(embedding, x -> x::DOUBLE) AS vd FROM embeddings),
        |m AS (SELECT vec_id, vd,
        |  greatest(list_max(vd), -list_min(vd), 1e-12) AS mx FROM v),
        |q AS (SELECT vec_id, mx/127.0 AS scale,
        |  list_transform(vd, x -> round(x/(mx/127.0))::TINYINT) AS qvec, vd
        | FROM m)
        |SELECT vec_id, round(scale, 6) AS scale,
        | list_aggregate(qvec, 'sum')::BIGINT AS qsum,
        | round(list_max(list_transform(list_zip(vd, qvec),
        |   p -> abs(p[1] - p[2]::DOUBLE*scale))), 6) AS maxErr
        |FROM q""".stripMargin.replace("\n", " "),
    // q131's sketch face: the bottom-k sample (rank by md5(doc_id) with
    // score4 tie-break) replays exactly; cuts interpolate over the
    // sample and freeze at 6dp like the exact face
    "q179_bucket_sketch" ->
      s"""WITH $lmCte,
         |sc2 AS (SELECT l.doc_id, d.lang, round(l.avgNll, 4) AS score4
         | FROM lm l JOIN documents d USING (doc_id)),
         |rk AS (SELECT lang, doc_id, score4,
         |  row_number() OVER (PARTITION BY lang
         |   ORDER BY ${h56("doc_id::VARCHAR")}, score4) AS rnk
         | FROM sc2 WHERE score4 IS NOT NULL),
         |samp AS (SELECT lang, score4 FROM rk WHERE rnk <= 128),
         |cuts AS (SELECT lang,
         |  round(quantile_cont(score4, 1.0/3), 6) AS c0,
         |  round(quantile_cont(score4, 2.0/3), 6) AS c1
         | FROM samp GROUP BY 1)
         |SELECT s.doc_id, s.lang, s.score4,
         | CASE WHEN s.score4 <= c.c0 THEN 'head'
         |  WHEN s.score4 <= c.c1 THEN 'middle' ELSE 'tail' END AS bucket
         |FROM sc2 s JOIN cuts c USING (lang)"""
        .stripMargin.replace("\n", " "),
    // CCNet normalization chain replayed with the same RE2-safe classes
    "q178_dedup_normalized" ->
      """WITH nm AS (SELECT doc_id, md5(trim(regexp_replace(
        |  regexp_replace(regexp_replace(lower(text), '[0-9]', '0', 'g'),
        |   '[^a-z0 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h FROM documents)
        |SELECT doc_id, h,
        | count(*) OVER (PARTITION BY h) AS dupCount,
        | doc_id = min(doc_id) OVER (PARTITION BY h) AS keep
        |FROM nm""".stripMargin.replace("\n", " "),
    "q173_line_dedup" ->
      s"""WITH ls AS (SELECT doc_id, string_split(text, ' table ') AS a
         |  FROM documents),
         |segs AS (SELECT doc_id, unnest(a) AS line,
         |  unnest(generate_series(1, len(a))) AS pos FROM ls),
         |hh AS (SELECT doc_id, pos, line, ${h56("line")} AS h FROM segs),
         |hot AS (SELECT h FROM hh GROUP BY h HAVING count(*) >= 2),
         |j AS (SELECT hh.doc_id, hh.pos, hh.line,
         |  hot.h IS NOT NULL AS isdup FROM hh LEFT JOIN hot ON hh.h = hot.h)
         |SELECT doc_id,
         | coalesce(string_agg(CASE WHEN NOT isdup THEN line END,
         |   ' table ' ORDER BY pos), '') AS text,
         | count(*) AS nLines,
         | sum(CASE WHEN isdup THEN 1 ELSE 0 END)::BIGINT AS nRemoved
         |FROM j GROUP BY 1""".stripMargin.replace("\n", " "),
    // Laplace log-odds with 6dp fixed-point per-token contributions —
    // order-exact long sums on both engines (the q116 pattern)
    "q174_nb_classifier" ->
      s"""WITH sd AS (SELECT doc_id, text, lang,
         |  ${h56("doc_id::VARCHAR")} % 5 < 3 AS insd FROM documents),
         |tok AS (SELECT doc_id, lang = 'en' AS p, unnest($toks) AS tok
         | FROM sd WHERE insd),
         |tt AS (SELECT tok,
         |  sum(CASE WHEN p THEN 1 ELSE 0 END)::BIGINT AS cPos,
         |  sum(CASE WHEN NOT p THEN 1 ELSE 0 END)::BIGINT AS cNeg
         | FROM tok GROUP BY 1),
         |tots AS (SELECT coalesce(sum(cPos), 0) AS tPos,
         |  coalesce(sum(cNeg), 0) AS tNeg, count(*) AS v FROM tt),
         |pri AS (SELECT round(ln(
         |   sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE /
         |   sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)), 6) AS lp
         | FROM sd WHERE insd),
         |htok AS (SELECT doc_id, unnest($toks) AS tok FROM sd WHERE NOT insd),
         |con AS (SELECT h.doc_id, ${fp6(
             "ln((coalesce(tt.cPos, 0) + 1.0)/(tots.tPos + 1.0*tots.v)) - " +
             "ln((coalesce(tt.cNeg, 0) + 1.0)/(tots.tNeg + 1.0*tots.v))")} AS c6
         | FROM htok h LEFT JOIN tt USING (tok) CROSS JOIN tots),
         |s AS (SELECT doc_id, count(*) AS nToks, sum(c6) AS s6
         | FROM con GROUP BY 1)
         |SELECT d.doc_id, coalesce(s.nToks, 0) AS nToks,
         | round(coalesce(s.s6, 0)/1e6 + pri.lp, 4) AS logOdds,
         | CASE WHEN coalesce(s.s6, 0)/1e6 + pri.lp > 0
         |  THEN 'en' ELSE 'other' END AS predicted
         |FROM sd d LEFT JOIN s ON d.doc_id = s.doc_id CROSS JOIN pri
         |WHERE NOT d.insd""".stripMargin.replace("\n", " "),
    // Lucene-form BM25; avgdl = exact long sum / long count, per-doc term
    // contributions as 6dp fixed-point longs
    "q175_bm25" -> bm25Sql,
    // identical result contract: the build/search split (q177) is gated
    // on the same replay
    "q177_bm25_indexed" -> bm25Sql,
    "q233_hybrid_rrf" -> hybridRrfSql,
    "q243_containment" ->
      s"""WITH $sigCte,
         |bands AS (SELECT doc_id, hashIdx // $BandSize AS band,
         |  array_to_string(list(minHash ORDER BY hashIdx), ':') AS bucket
         | FROM sig GROUP BY doc_id, band),
         |cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         | FROM bands l JOIN bands r ON l.band = r.band AND l.bucket = r.bucket
         | WHERE l.doc_id < r.doc_id),
         |n AS (SELECT doc_id, count(*) AS ng FROM sh GROUP BY doc_id),
         |i AS (SELECT c.a, c.b, count(sb.shingle) AS inter
         | FROM cand c
         | LEFT JOIN sh sa ON sa.doc_id = c.a
         | LEFT JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
         | GROUP BY 1, 2)
         |SELECT i.a, i.b, i.inter, na.ng AS na, nb.ng AS nb,
         | round(i.inter::DOUBLE / na.ng, 4) AS cont_a,
         | round(i.inter::DOUBLE / nb.ng, 4) AS cont_b
         |FROM i JOIN n na ON i.a = na.doc_id JOIN n nb ON i.b = nb.doc_id"""
        .stripMargin.replace("\n", " "),
    "q242_novelty" ->
      s"""WITH $shingleCte,
         |fo AS (SELECT shingle, min(doc_id) AS firstId FROM sh GROUP BY 1),
         |per AS (SELECT s.doc_id, count(*)::BIGINT AS n_shingles,
         |  sum(CASE WHEN f.firstId = s.doc_id THEN 1 ELSE 0 END)::BIGINT
         |   AS n_novel
         | FROM sh s JOIN fo f USING (shingle) GROUP BY 1)
         |SELECT d.doc_id, coalesce(p.n_shingles, 0)::BIGINT AS n_shingles,
         | coalesce(p.n_novel, 0)::BIGINT AS n_novel,
         | round(CASE WHEN p.n_shingles > 0
         |  THEN p.n_novel::DOUBLE / p.n_shingles END, 4) AS novelty
         |FROM documents d LEFT JOIN per p USING (doc_id)"""
        .stripMargin.replace("\n", " "),
    "q245_lexical" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(regexp_extract_all(lower(text), '\S+')) AS tok
        | FROM documents),
        |c AS (SELECT doc_id, tok, count(*)::BIGINT AS f FROM t GROUP BY 1, 2),
        |p AS (SELECT doc_id, sum(f)::BIGINT AS n_tokens,
        |  count(*)::BIGINT AS n_types,
        |  sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
        |  sum(f * f)::BIGINT AS s2 FROM c GROUP BY 1)
        |SELECT d.doc_id,
        | coalesce(p.n_tokens, 0)::BIGINT AS n_tokens,
        | coalesce(p.n_types, 0)::BIGINT AS n_types,
        | coalesce(p.n_hapax, 0)::BIGINT AS n_hapax,
        | round(CASE WHEN p.n_tokens > 0
        |  THEN p.n_types::DOUBLE / p.n_tokens END, 4) AS ttr,
        | round(CASE WHEN p.n_tokens > 0
        |  THEN p.n_hapax::DOUBLE / p.n_tokens END, 4) AS hapax_ratio,
        | round(CASE WHEN p.n_tokens > 0
        |  THEN 1e4 * (p.s2 - p.n_tokens)::DOUBLE
        |   / (p.n_tokens::DOUBLE * p.n_tokens) END, 4) AS yule_k
        |FROM documents d LEFT JOIN p USING (doc_id)"""
        .stripMargin.replace("\n", " "),
    "q240_readability" ->
      """SELECT doc_id,
        | len(regexp_extract_all(lower(text), '\S+'))::BIGINT AS n_words,
        | greatest(len(regexp_extract_all(lower(text), '[.!?]+')), 1)::BIGINT
        |  AS n_sentences,
        | len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
        |  AS n_syllables,
        | round(CASE WHEN len(regexp_extract_all(lower(text), '\S+')) > 0 THEN
        |  206.835
        |   - 1.015 * (len(regexp_extract_all(lower(text), '\S+'))::DOUBLE
        |     / greatest(len(regexp_extract_all(lower(text), '[.!?]+')), 1))
        |   - 84.6 * (len(regexp_extract_all(lower(text), '[aeiouy]+'))::DOUBLE
        |     / len(regexp_extract_all(lower(text), '\S+'))) END, 4) AS flesch
        |FROM documents""".stripMargin.replace("\n", " "),
    "q236_rake" -> {
      val stops = rakeStops.map(s => s"'$s'").mkString(", ")
      s"""WITH tokp AS (SELECT doc_id AS id, unnest($toks) AS tok,
         |  generate_subscripts($toks, 1) AS pos FROM documents),
         |t2 AS (SELECT id, pos, tok,
         |  (tok IN ($stops) OR regexp_matches(tok, '[^a-z]')) AS stop FROM tokp),
         |t3 AS (SELECT id, pos, tok, stop,
         |  sum(CASE WHEN stop THEN 1 ELSE 0 END)
         |   OVER (PARTITION BY id ORDER BY pos) AS pid FROM t2),
         |ph AS (SELECT id, pid, string_agg(tok, ' ' ORDER BY pos) AS phrase,
         |  count(*)::BIGINT AS len FROM t3 WHERE NOT stop GROUP BY id, pid),
         |wo AS (SELECT len, unnest(string_split(phrase, ' ')) AS word FROM ph),
         |st AS (SELECT word, count(*)::BIGINT AS freq,
         |  sum(len)::BIGINT AS deg FROM wo GROUP BY 1),
         |dp AS (SELECT phrase, count(*)::BIGINT AS cnt FROM ph GROUP BY 1),
         |pw AS (SELECT phrase, cnt, unnest(string_split(phrase, ' ')) AS word
         | FROM dp),
         |sc AS (SELECT p.phrase, p.cnt, count(*)::BIGINT AS n_words,
         |  sum(${fp6("st.deg/st.freq")})/1e6 AS score
         | FROM pw p JOIN st USING (word) GROUP BY 1, 2)
         |SELECT phrase, cnt, n_words, round(score, 4) AS score FROM sc
         |ORDER BY score DESC, phrase LIMIT 40"""
        .stripMargin.replace("\n", " ")
    },
    "q308_rendezvous" -> {
      val nodes = (0 until 8).map(i => s"'node$i'").mkString(", ")
      s"""WITH nd AS (SELECT unnest([$nodes]) AS node),
         |h AS (SELECT d.doc_id, nd.node,
         |  ('0x'||substr(md5(nd.node || ':' || d.doc_id::VARCHAR),1,14))::BIGINT
         |    AS hv
         |  FROM documents d CROSS JOIN nd)
         |SELECT doc_id, arg_max(node, hv) AS node
         |FROM h GROUP BY doc_id""".stripMargin.replace("\n", " ")
    },
    "q303_gini" ->
      """WITH fx AS (SELECT source, doc_id,
        |  (CASE WHEN n_chars>=0 THEN floor(n_chars*10000.0+0.5)
        |   ELSE -floor(-n_chars*10000.0+0.5) END)::BIGINT AS fp
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY fp ASC, doc_id ASC) AS i FROM fx)
        |SELECT source, count(*)::BIGINT AS n,
        | round(sum(fp::HUGEINT)::DOUBLE / 1e4, 4) AS total,
        | round((2*sum((i::HUGEINT)*(fp::HUGEINT))
        |   - (count(*)+1)*sum(fp::HUGEINT))::DOUBLE
        |  / (count(*)*sum(fp::HUGEINT))::DOUBLE, 4) AS gini
        |FROM r GROUP BY source""".stripMargin.replace("\n", " "),
    "q304_concentration" ->
      """WITH c AS (SELECT source, count(*)::BIGINT AS c FROM documents
        |  WHERE source IS NOT NULL GROUP BY 1)
        |SELECT count(*)::BIGINT AS k, sum(c)::BIGINT AS n,
        | round(sum((c::HUGEINT)*(c::HUGEINT))::DOUBLE
        |  / ((sum(c)::HUGEINT)*(sum(c)::HUGEINT))::DOUBLE, 4) AS hhi,
        | round(((sum(c)::HUGEINT)*(sum(c)::HUGEINT))::DOUBLE
        |  / sum((c::HUGEINT)*(c::HUGEINT))::DOUBLE, 4) AS effective
        |FROM c""".stripMargin.replace("\n", " "),
    "q297_sorted_neighborhood" ->
      """WITH base AS (SELECT lang AS blk, doc_id::BIGINT AS a,
        |  substr(text, 1, 64) AS na FROM documents),
        |l AS (SELECT blk, a, na,
        |  lead(a, 1) OVER w AS b1, lead(na, 1) OVER w AS n1,
        |  lead(a, 2) OVER w AS b2, lead(na, 2) OVER w AS n2,
        |  lead(a, 3) OVER w AS b3, lead(na, 3) OVER w AS n3
        |  FROM base WINDOW w AS (PARTITION BY blk ORDER BY na ASC, a ASC)),
        |u AS (SELECT blk, a, na, b1 AS b, n1 AS nb FROM l
        |  UNION ALL SELECT blk, a, na, b2, n2 FROM l
        |  UNION ALL SELECT blk, a, na, b3, n3 FROM l)
        |SELECT blk, a, b,
        | round(jaro_winkler_similarity(na, nb), 4) AS jw
        |FROM u WHERE b IS NOT NULL
        |  AND jaro_winkler_similarity(na, nb) >= 0.8"""
        .stripMargin.replace("\n", " "),
    "q234_jw_pairs" ->
      """WITH ids AS (SELECT doc_id::BIGINT AS id, substr(text, 1, 64) AS t
        |  FROM documents),
        |reps AS (SELECT t, min(id) AS rid FROM ids GROUP BY t),
        |d AS (SELECT t, rid, substr(t, 1, 8) AS blk FROM reps)
        |SELECT x.rid AS a, y.rid AS b,
        | round(jaro_winkler_similarity(x.t, y.t), 4) AS jw
        |FROM d x JOIN d y ON x.blk = y.blk AND x.rid < y.rid
        |WHERE jaro_winkler_similarity(x.t, y.t) >= 0.8"""
        .stripMargin.replace("\n", " "))

  // the bm25 pipeline as a reusable CTE body (shared by q175/q177 and
  // the q233 hybrid fusion)
  private lazy val bm25Ctes: String =
      s"""base AS (SELECT doc_id, $toks AS t FROM documents),
         |st AS (SELECT count(*)::BIGINT AS n,
         |  (sum(len(t))::BIGINT)::DOUBLE / count(*) AS avgdl FROM base),
         |post AS (SELECT doc_id, len(t) AS dl, unnest(t) AS tok FROM base),
         |p2 AS (SELECT doc_id, tok, dl, count(*)::BIGINT AS tf FROM post
         | WHERE tok IN ('spark', 'join', 'window', 'vector') GROUP BY 1, 2, 3),
         |dfs AS (SELECT tok, count(*)::BIGINT AS df FROM p2 GROUP BY 1),
         |idf AS (SELECT tok, ln(1.0 + (st.n - df + 0.5)/(df + 0.5)) AS idf
         | FROM dfs CROSS JOIN st),
         |c AS (SELECT doc_id, ${fp6(
             "idf.idf*p2.tf*2.2/(p2.tf + 1.2*(0.25 + 0.75*p2.dl/st.avgdl))")} AS c6
         | FROM p2 JOIN idf USING (tok) CROSS JOIN st),
         |s AS (SELECT doc_id, count(*) AS nTerms,
         |  sum(c6)/1e6 AS score FROM c GROUP BY 1)"""
        .stripMargin.replace("\n", " ")

  private lazy val bm25Sql: String =
      s"""WITH $bm25Ctes
         |SELECT doc_id, nTerms, round(score, 4) AS score FROM s
         |ORDER BY score DESC, doc_id LIMIT 20"""
        .stripMargin.replace("\n", " ")

  // hybrid retrieval: bm25 top-20 ∪ dense cosine top-20 (query = vec 0),
  // reciprocal-rank fused at k=60 — rank-only, so no score calibration
  private lazy val hybridRrfSql: String =
      s"""WITH $bm25Ctes,
         |bmr AS (SELECT doc_id,
         |  row_number() OVER (ORDER BY score DESC, doc_id) AS r
         | FROM s QUALIFY r <= 20),
         |qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
         |ap AS (SELECT c.vec_id AS doc_id,
         |  list_dot_product(c.embedding::DOUBLE[], qv.v) /
         |   (sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))
         |    * sqrt(list_dot_product(qv.v, qv.v))) AS cos
         | FROM embeddings c, qv WHERE c.vec_id <> 0),
         |ann AS (SELECT doc_id,
         |  row_number() OVER (ORDER BY cos DESC, doc_id) AS r
         | FROM ap QUALIFY r <= 20),
         |u AS (SELECT doc_id, r FROM bmr UNION ALL SELECT doc_id, r FROM ann),
         |f AS (SELECT doc_id, count(*) AS n_lists,
         |  sum((floor((1.0/(60.0 + r))*1e9 + 0.5))::BIGINT) AS rrf9
         | FROM u GROUP BY 1)
         |SELECT doc_id, n_lists,
         | row_number() OVER (ORDER BY rrf9 DESC, doc_id) AS fused_rank,
         | round(rrf9/1e9, 4) AS rrf
         |FROM f QUALIFY fused_rank <= 20"""
        .stripMargin.replace("\n", " ")

  // UniMax greedy walk replayed as a recursive CTE: langs ascending by
  // exact mass, alloc_i = round6(min(cap·massᵢ, remaining/(L−i+1)))
  private lazy val unimaxOracle: Map[String, String] = Map(
    "q176_unimax" ->
      s"""WITH RECURSIVE m AS (SELECT lang,
         |  sum(${fp6("n_chars::DOUBLE")})/1e6 AS mass
         | FROM documents GROUP BY 1),
         |b AS (SELECT round(sum(n_chars)::DOUBLE * 0.3::DOUBLE, 6)::DOUBLE
         |  AS budget FROM documents),
         |ord AS (SELECT lang, mass,
         |  row_number() OVER (ORDER BY mass, lang) AS i,
         |  count(*) OVER () AS l FROM m),
         |walk AS (
         | SELECT 0::BIGINT AS i, b.budget AS remaining,
         |  NULL::VARCHAR AS lang, NULL::DOUBLE AS mass, NULL::DOUBLE AS alloc
         | FROM b
         | UNION ALL
         | SELECT o.i, w.remaining -
         |   round(least(2.0*o.mass, w.remaining/(o.l - o.i + 1)), 6),
         |  o.lang, o.mass,
         |  round(least(2.0*o.mass, w.remaining/(o.l - o.i + 1)), 6)
         | FROM walk w JOIN ord o ON o.i = w.i + 1)
         |SELECT lang, round(mass, 4) AS mass, round(alloc, 4) AS alloc,
         | round(CASE WHEN mass > 0 THEN alloc/mass ELSE 0.0 END, 4) AS epochs
         |FROM walk WHERE lang IS NOT NULL"""
        .stripMargin.replace("\n", " "))

  /** q181's exact integer d² between a quantized vector `v` and a cell's
    * centroid list `c.cv` (dim 64). */
  private def kmD2(v: String) =
    s"""list_sum(list_transform(range(64),
       | j -> ($v[j+1]-c.cv[j+1])*($v[j+1]-c.cv[j+1])))""".stripMargin

  /** Full SQL replay of the distributed integer-Lloyd fit: md5-ordered
    * sample + evenly spaced init (the q61 device), vectors quantized to
    * 6dp longs, 4 unrolled assignment/re-center rounds where every sum
    * is integer (associative — combine-order-free on both engines) and
    * the only float op is the exact-input mean division, rounded half
    * away from zero back onto the 6dp grain. Final pass emits per-cell
    * sizes and the exact integer inertia. */
  /** Shared CTE chain of the k-means replay, through the final per-point
    * assignment `fb` (vec_id, struct(d, cell)). */
  private[queries] lazy val kmCtes: String = {
    val quant = fp6("x")
    val lloyd = (1 to 4).map { t =>
      s"""a$t AS MATERIALIZED (SELECT x.vec_id, x.v,
         |  (min({'d': ${kmD2("x.v")}, 'c': c.cell})).c AS cell
         | FROM xq x CROSS JOIN c${t - 1} c GROUP BY x.vec_id, x.v),
         |g$t AS (SELECT a.cell, t.j, sum(a.v[t.j + 1]) AS sj, count(*) AS n
         | FROM a$t a CROSS JOIN (SELECT unnest(range(64)) AS j) t
         | GROUP BY a.cell, t.j),
         |c$t AS MATERIALIZED (SELECT p.cell,
         |  CASE WHEN count(g.sj) = 0 THEN p.cv
         |   ELSE list((CASE WHEN g.sj >= 0
         |     THEN floor(g.sj::DOUBLE / g.n + 0.5)
         |     ELSE -floor(-(g.sj::DOUBLE / g.n) + 0.5) END)::BIGINT
         |    ORDER BY g.j) END AS cv
         | FROM c${t - 1} p LEFT JOIN g$t g USING (cell)
         | GROUP BY p.cell, p.cv)""".stripMargin
    }.mkString(", ")
    s"""s0 AS (SELECT embedding::DOUBLE[] AS v, md5(vec_id::VARCHAR) AS h
       |  FROM embeddings ORDER BY h, v LIMIT 20000),
       |samp AS MATERIALIZED (SELECT v,
       |  row_number() OVER (ORDER BY h, v) AS rn FROM s0),
       |sn AS (SELECT count(*) AS n FROM samp),
       |c0 AS MATERIALIZED (SELECT t.i AS cell,
       |  list_transform(s.v, x -> $quant) AS cv
       | FROM (SELECT unnest(range(8)) AS i) t, sn
       | JOIN samp s ON s.rn = (t.i * sn.n) // 8 + 1),
       |xq AS MATERIALIZED (SELECT vec_id,
       |  list_transform(embedding::DOUBLE[], x -> $quant) AS v
       | FROM embeddings),
       |$lloyd,
       |fb AS (SELECT x.vec_id,
       |  min({'d': ${kmD2("x.v")}, 'c': c.cell}) AS b
       | FROM xq x CROSS JOIN c4 c GROUP BY x.vec_id, x.v)""".stripMargin
  }

  private lazy val kmeansOracle: String =
    s"""WITH $kmCtes,
       |fin AS (SELECT (b).c AS cell, count(*) AS n_members,
       |  sum((b).d) AS in6 FROM fb GROUP BY 1)
       |SELECT c.cell, t.j, round(c.cv[t.j + 1] / 1000000.0, 4) AS cx,
       | coalesce(f.n_members, 0)::BIGINT AS n_members,
       | round(coalesce(f.in6, 0)::DOUBLE / 1000000000000.0, 4) AS inertia
       |FROM c4 c CROSS JOIN (SELECT unnest(range(64)) AS j) t
       |LEFT JOIN fin f USING (cell)""".stripMargin.replace("\n", " ")

  /** Distance-to-centroid top-20: order by exact integer d (desc, id). */
  private lazy val kmeansOutlierOracle: String =
    s"""WITH $kmCtes
       |SELECT vec_id, (b).c AS cell,
       | round(sqrt((b).d) / 1000000.0, 4) AS dist
       |FROM fb ORDER BY (b).d DESC, vec_id LIMIT 20"""
      .stripMargin.replace("\n", " ")

  /** Full SQL replay of the logistic-regression fit: same feature
    * expressions, algebraic sigmoid, 9dp fixed-point gradient sums
    * (hugeint — exact like Spark's decimal(38,0)), the identical
    * correctly-rounded update sequence, 6dp weight re-grain. Shared by
    * the q183 fit output and the q192 per-doc scoring face. */
  private lazy val logregZExpr = "w.wa*f.f0 + w.wb*f.f1 + w.wc*f.f2 + w.wd*f.f3"

  private lazy val logregCtes: String = {
    val fp9 = (e: String) =>
      s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e9+0.5) ELSE -floor(-($e)*1e9+0.5) END)::BIGINT"
    val regrain = (e: String) =>
      s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e6+0.5) ELSE -floor(-($e)*1e6+0.5) END) / 1000000.0"
    val zExpr = logregZExpr
    val iters = (1 to 5).map { t =>
      val p = s"ww${t - 1}"
      s"""g$t AS (SELECT sum(${fp9("e * f0")}) AS s0,
         |  sum(${fp9("e * f1")}) AS s1, sum(${fp9("e * f2")}) AS s2,
         |  sum(${fp9("e * f3")}) AS s3, count(*) AS n
         | FROM (SELECT f.f0, f.f1, f.f2, f.f3,
         |    f.y - (0.5 + z/(2.0*(1.0+abs(z)))) AS e
         |   FROM (SELECT f.*, $zExpr AS z FROM feat f, $p w) f)),
         |ww$t AS (SELECT
         |  ${regrain(s"w.wa + 0.5 * (g.s0::DOUBLE / g.n / 1e9)")} AS wa,
         |  ${regrain(s"w.wb + 0.5 * (g.s1::DOUBLE / g.n / 1e9)")} AS wb,
         |  ${regrain(s"w.wc + 0.5 * (g.s2::DOUBLE / g.n / 1e9)")} AS wc,
         |  ${regrain(s"w.wd + 0.5 * (g.s3::DOUBLE / g.n / 1e9)")} AS wd
         | FROM $p w, g$t g)""".stripMargin
    }.mkString(", ")
    s"""feat AS MATERIALIZED (SELECT doc_id, 1.0::DOUBLE AS f0,
       |  (n_chars::DOUBLE - 300.0) / 100.0 AS f1,
       |  (len($toks)::DOUBLE - 50.0) / 10.0 AS f2,
       |  ((length(lower(text)) - length(replace(lower(text), ' the ', '')))
       |    // 5)::DOUBLE / 10.0 AS f3,
       |  (CASE WHEN n_chars >= 300 THEN 1.0 ELSE 0.0 END)::DOUBLE AS y
       | FROM documents),
       |ww0 AS (SELECT 0.0::DOUBLE AS wa, 0.0::DOUBLE AS wb,
       |  0.0::DOUBLE AS wc, 0.0::DOUBLE AS wd),
       |$iters""".stripMargin
  }

  private lazy val logregOracle: String =
    s"""WITH $logregCtes,
       |fin AS (SELECT
       |  sum(CASE WHEN (z >= 0) = (y = 1.0) THEN 1 ELSE 0 END)::BIGINT AS ok,
       |  count(*) AS n
       | FROM (SELECT f.y, $logregZExpr AS z FROM feat f, ww5 w))
       |SELECT t.j, t.feature,
       | round(CASE t.j WHEN 0 THEN w.wa WHEN 1 THEN w.wb
       |   WHEN 2 THEN w.wc ELSE w.wd END, 4) AS weight,
       | f.ok AS n_correct, f.n, round(f.ok::DOUBLE / f.n, 4) AS accuracy
       |FROM (VALUES (0, 'f0'), (1, 'f1'), (2, 'f2'), (3, 'f3')) t(j, feature),
       | ww5 w, fin f""".stripMargin.replace("\n", " ")

  /** Per-doc scoring with the learned weights: z is bit-identical on
    * both engines (same IEEE op sequence over identical 6dp weights). */
  private lazy val logregScoreOracle: String =
    s"""WITH $logregCtes
       |SELECT f.doc_id, round($logregZExpr, 4) AS z,
       | ($logregZExpr >= 0) AS keep
       |FROM feat f, ww5 w""".stripMargin.replace("\n", " ")

  /** Shared CTE chain of the BPE trainer replay: top-1000 word table,
    * wrapped symbol strings, 10 unrolled pair-count → argmax → replace
    * rounds. Pure integer/string arithmetic — no rounding device. */
  private lazy val bpeCtes: String = {
    val rounds = (1 to 10).map { t =>
      val p = s"v${t - 1}"
      s"""p$t AS (SELECT sa[i] AS a, sa[i + 1] AS b, cnt
         | FROM (SELECT sa, cnt, unnest(range(1, len(sa))) AS i
         |   FROM (SELECT string_split(trim(syms, '()'), ')(') AS sa, cnt
         |     FROM $p))),
         |m$t AS MATERIALIZED (SELECT a, b, sum(cnt) AS pc FROM p$t
         | GROUP BY a, b ORDER BY pc DESC, a, b LIMIT 1),
         |v$t AS MATERIALIZED (SELECT
         |  replace(syms, '(' || m.a || ')(' || m.b || ')',
         |    '(' || m.a || m.b || ')') AS syms, cnt
         | FROM $p, m$t m)""".stripMargin
    }.mkString(", ")
    s"""w0 AS (SELECT w, count(*) AS cnt
       | FROM (SELECT unnest($toks) AS w FROM documents)
       | WHERE regexp_matches(w, '^[a-z]+${"$"}')
       | GROUP BY w ORDER BY cnt DESC, w LIMIT 1000),
       |v0 AS MATERIALIZED (SELECT
       |  regexp_replace(w, '(.)', '(\\1)', 'g') AS syms, cnt FROM w0),
       |$rounds""".stripMargin
  }

  private lazy val bpeOracle: String = {
    val out = (1 to 10).map { t =>
      s"""SELECT $t AS round, a AS "left", b AS "right",
         | a || b AS merged, pc::BIGINT AS pair_count FROM m$t""".stripMargin
    }.mkString(" UNION ALL ")
    s"WITH $bpeCtes $out".replace("\n", " ")
  }

  /** Encode replay: re-derive the 10 rules, then apply them in training
    * order as nested replaces over the per-char-wrapped text; token
    * count = number of '(' left. */
  private[queries] lazy val bpeEncodeOracle: String = {
    val base = "regexp_replace(lower(text), '(.)', '(\\1)', 'g')"
    val applied = (1 to 10).foldLeft(base) { (s, t) =>
      s"""replace($s, (SELECT '('||a||')('||b||')' FROM m$t),
         | (SELECT '('||a||b||')' FROM m$t))""".stripMargin
    }
    s"""WITH $bpeCtes
       |SELECT doc_id,
       | (length($applied) - length(replace($applied, '(', '')))::BIGINT
       |  AS n_bpe
       |FROM documents""".stripMargin.replace("\n", " ")
  }

  /** Raw-URL reconstruction CTE shared by q260-q262 (mirrors
    * [[urlDocs]] character for character). */
  private def urlOracle(tail: String): String =
    s"""WITH u AS (SELECT doc_id, text, lang, source,
       | 'HTTPS://' || (CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END) ||
       | source || '-' || (doc_id % 7) || '.COM/' || lang || '/p' || (doc_id % 50) ||
       | (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END) ||
       | (CASE WHEN doc_id % 3 = 0
       |   THEN '?utm_source=feed&id=' || doc_id || '&utm_campaign=x'
       |   ELSE '?id=' || doc_id END) ||
       | (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END) AS url
       | FROM documents)
       |$tail""".stripMargin.replace("\n", " ")

private lazy val ivfCtes: String = {
      val relD2 = (v: String, c: String) =>
        s"list_dot_product($c.cv, $c.cv) - 2.0 * list_dot_product($v, $c.cv)"
      val lloyd = (1 to 10).map { t =>
        s"""a$t AS MATERIALIZED (SELECT s.rn, s.v,
           |  (min({'d': ${relD2("s.v", "c")}, 'c': c.cell})).c AS cell
           | FROM samp s CROSS JOIN c${t - 1} c GROUP BY s.rn, s.v),
           |g$t AS (SELECT a.cell, t.j, round(avg(a.v[t.j + 1]), 5) AS cx
           | FROM a$t a CROSS JOIN (SELECT unnest(range(64)) AS j) t
           | GROUP BY a.cell, t.j),
           |c$t AS MATERIALIZED (SELECT p.cell,
           |  CASE WHEN count(g.cx) = 0 THEN p.cv
           |   ELSE list(g.cx ORDER BY g.j) END AS cv
           | FROM c${t - 1} p LEFT JOIN g$t g USING (cell)
           | GROUP BY p.cell, p.cv)""".stripMargin
      }.mkString(", ")
      s"""s0 AS (SELECT embedding::DOUBLE[] AS v, md5(vec_id::VARCHAR) AS h
         |  FROM embeddings ORDER BY h, v LIMIT 20000),
         |samp AS MATERIALIZED (SELECT v,
         |  row_number() OVER (ORDER BY h, v) AS rn FROM s0),
         |sn AS (SELECT count(*) AS n FROM samp),
         |c0 AS (SELECT t.i AS cell, s.v AS cv
         | FROM (SELECT unnest(range(8)) AS i) t, sn
         | JOIN samp s ON s.rn = (t.i * sn.n) // 8 + 1),
         |$lloyd,
         |co AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv2 FROM embeddings),
         |asg AS MATERIALIZED (SELECT co.cid, co.cv2,
         |  (min({'d': ${relD2("co.cv2", "c")}, 'c': c.cell})).c AS cell
         | FROM co CROSS JOIN c10 c GROUP BY co.cid, co.cv2),
         |qd AS (SELECT q.vec_id AS qid, q.embedding::DOUBLE[] AS qv, c.cell,
         |  row_number() OVER (PARTITION BY q.vec_id
         |    ORDER BY ${relD2("q.embedding::DOUBLE[]", "c")}, c.cell) AS rk
         | FROM embeddings q CROSS JOIN c10 c WHERE q.vec_id < 20),
         |sc AS (SELECT p.qid, a.cid,
         |  list_dot_product(p.qv, a.cv2) /
         |   (sqrt(list_dot_product(p.qv, p.qv))
         |    * sqrt(list_dot_product(a.cv2, a.cv2))) AS cos
         | FROM (SELECT qid, qv, cell FROM qd WHERE rk <= 2) p
         | JOIN asg a USING (cell) WHERE p.qid <> a.cid),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid
         |    ORDER BY cos DESC, cid) AS rank FROM sc QUALIFY rank <= 10)"""
        .stripMargin.replace("\n", " ")
      }

  val oracleSql: Map[String, String] = Map(
    "q336_textrank" -> {
      val iters = 5
      val steps = (1 to iters).map { i =>
        s"""r$i AS (SELECT nodes.node,
           |  ((15 * 1000000000000) // (100 * nn.n)
           |    + (85 * coalesce(m.s, 0)) // 100)::BIGINT AS r
           | FROM nodes CROSS JOIN nn LEFT JOIN (
           |   SELECT e.dst AS node, sum(p.r // d.od)::BIGINT AS s
           |   FROM e2 e JOIN r${i - 1} p ON e.src = p.node
           |   JOIN deg d ON d.src = e.src
           |   GROUP BY e.dst) m ON m.node = nodes.node)""".stripMargin
          .replace("\n", " ")
      }
      s"""WITH tkl AS (SELECT doc_id, $toks AS t FROM documents),
         |tp AS (SELECT doc_id, i AS p, t[i] AS tok
         | FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
         |   FROM tkl)),
         |ft AS (SELECT doc_id, p, tok FROM tp WHERE length(tok) >= 5),
         |ns AS (SELECT doc_id, tok,
         |  lead(tok) OVER (PARTITION BY doc_id ORDER BY p ASC) AS nxt
         | FROM ft),
         |pr AS (SELECT tok AS src, nxt AS dst FROM ns
         | WHERE nxt IS NOT NULL AND tok <> nxt),
         |e2 AS (SELECT DISTINCT src, dst FROM
         |  (SELECT src, dst FROM pr UNION ALL SELECT dst, src FROM pr)),
         |deg AS (SELECT src, count(*)::BIGINT AS od FROM e2 GROUP BY 1),
         |nodes AS (SELECT src AS node FROM e2
         |  UNION SELECT dst FROM e2),
         |nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
         |r0 AS (SELECT node, (1000000000000 // n)::BIGINT AS r
         |  FROM nodes CROSS JOIN nn),
         |${steps.mkString(", ")}
         |SELECT node, r AS rank12,
         | round(r::DOUBLE / 1000000000000.0, 4) AS rank
         |FROM r$iters ORDER BY r DESC, node LIMIT 20"""
        .stripMargin.replace("\n", " ")
    },
    "q337_phonetic_blocks" -> {
      val collapsed = (1 to 6).foldLeft(
        """translate(upper(regexp_replace(nm, '[^A-Za-z]', '', 'g')),
          | 'BFPVCGJKQSXZDTLMNRAEIOUYHW',
          | '11112222222233455600000000')""".stripMargin.replace("\n", ""))(
        (e, d) => s"regexp_replace($e, '$d{2,}', '$d', 'g')")
      s"""WITH p0 AS (SELECT p_partkey,
         |  unnest(string_split(p_name, ' ')) AS nm FROM part),
         |k AS (SELECT nm,
         |  CASE WHEN length(upper(regexp_replace(nm, '[^A-Za-z]', '', 'g')))
         |    >= 1 THEN
         |   upper(regexp_replace(nm, '[^A-Za-z]', '', 'g'))[1] ||
         |   rpad(regexp_replace(substring($collapsed, 2, 1000), '0', '',
         |     'g')[1:3], 3, '0')
         |  END AS pkey
         |  FROM p0 WHERE nm IS NOT NULL)
         |SELECT pkey, count(*)::BIGINT AS n,
         | count(DISTINCT nm)::BIGINT AS names, min(nm) AS sample
         |FROM k WHERE pkey IS NOT NULL
         |GROUP BY 1 HAVING count(DISTINCT nm) >= 2"""
        .stripMargin.replace("\n", " ")
    },
    "q181_kmeans_fit" -> kmeansOracle,
    "q187_kmeans_outliers" -> kmeansOutlierOracle,
    // q45's LOF chain over nProbe=2 cell pairs from the q181 fit replay:
    // index side = best cell (fb), probe side = two nearest cells
    // (lexicographic first two of the per-cell (d, cell) structs — the
    // same order the fused expression's strict-less scan produces)
    "q193_lof_cells" ->
      s"""WITH $kmCtes,
         |asg AS (SELECT vec_id, (b).c AS cell FROM fb),
         |pd AS (SELECT x.vec_id, {'d': ${kmD2("x.v")}, 'c': c.cell} AS s
         | FROM xq x CROSS JOIN c4 c),
         |pb AS (SELECT vec_id, (list_sort(list(s)))[1].c AS c1,
         |  (list_sort(list(s)))[2].c AS c2 FROM pd GROUP BY vec_id),
         |pe AS (SELECT vec_id, unnest([c1, c2]) AS cell FROM pb),
         |pc AS (SELECT p.vec_id AS src, a.vec_id AS trg,
         |  list_distance(av.embedding::DOUBLE[], bv.embedding::DOUBLE[])
         |   AS dist
         | FROM pe p JOIN asg a ON a.cell = p.cell
         |  AND a.vec_id <> p.vec_id
         | JOIN embeddings av ON av.vec_id = p.vec_id
         | JOIN embeddings bv ON bv.vec_id = a.vec_id),
         |nn AS (SELECT src, trg, dist,
         |  row_number() OVER (PARTITION BY src ORDER BY dist ASC, trg)
         |   AS rank FROM pc QUALIFY rank <= 5),
         |kd AS (SELECT src, max(dist) AS kdist FROM nn GROUP BY src),
         |rch AS (SELECT n.src, greatest(n.dist, k.kdist) AS reach
         | FROM nn n JOIN kd k ON n.trg = k.src),
         |lrd AS (SELECT src, 5 / sum(reach) AS lrd FROM rch GROUP BY src),
         |nl AS (SELECT n.src, avg(l.lrd) AS nbrLrd
         | FROM nn n JOIN lrd l ON n.trg = l.src GROUP BY n.src)
         |SELECT l.src, round(nl.nbrLrd / l.lrd, 4) AS lof
         |FROM lrd l JOIN nl USING (src)""".stripMargin.replace("\n", " "),
    "q183_logreg_quality" -> logregOracle,
    "q192_logreg_score" -> logregScoreOracle,
    "q184_bpe_train" -> bpeOracle,
    "q185_bpe_encode" -> bpeEncodeOracle,
    "q49_dedup_exact" ->
      """SELECT doc_id, md5(text) AS h,
        | count(*) OVER (PARTITION BY md5(text)) AS dupCount,
        | doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep
        |FROM documents""".stripMargin.replace("\n", " "),
    // raw url replayed; canonical form derived INDEPENDENTLY from the
    // fields (utm params dropped, fragment dropped, host lowercased,
    // www stripped, trailing slash stripped, surviving params sorted →
    // the single id param)
    "q260_url_canon" -> urlOracle(
      """SELECT doc_id, url,
        |'https://' || lower(source) || '-' || (doc_id % 7) || '.com/' ||
        |  lang || '/p' || (doc_id % 50) || '?id=' || doc_id AS canon_url,
        |lower(source) || '-' || (doc_id % 7) || '.com' AS domain
        |FROM u""".stripMargin.replace("\n", " ")),
    "q261_domain_stats" -> urlOracle(
      """SELECT lower(source) || '-' || (doc_id % 7) || '.com' AS domain,
        |count(*) AS n_docs, sum(length(text))::BIGINT AS n_chars,
        |count(DISTINCT lang) AS n_langs
        |FROM u GROUP BY 1""".stripMargin.replace("\n", " ")),
    "q262_domain_quota" -> urlOracle(
      """SELECT doc_id, domain, rk::INT AS rk FROM (
        |SELECT doc_id, lower(source) || '-' || (doc_id % 7) || '.com' AS domain,
        | row_number() OVER (
        |   PARTITION BY lower(source) || '-' || (doc_id % 7) || '.com'
        |   ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
        |FROM u) WHERE rk <= 3""".stripMargin.replace("\n", " ")),
    // distinct canonical keys (independent derivation — urlDocs carries
    // the unique id param, so every doc is its own canonical key and
    // the admitted set is the full id-keyed set)
    "q459_containment" ->
      s"""WITH $sigCte,
         |bands AS (SELECT doc_id, hashIdx // $BandSize AS band,
         |  array_to_string(list(minHash ORDER BY hashIdx), ':') AS bucket
         | FROM sig GROUP BY doc_id, band),
         |cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         | FROM bands l JOIN bands r ON l.band = r.band
         |  AND l.bucket = r.bucket
         | WHERE l.doc_id < r.doc_id),
         |mt AS (SELECT c.a, c.b,
         |  sum(CASE WHEN sl.minHash = sr.minHash THEN 1 ELSE 0 END)::BIGINT
         |   AS matches
         | FROM cand c JOIN sig sl ON sl.doc_id = c.a
         |  JOIN sig sr ON sr.doc_id = c.b AND sr.hashIdx = sl.hashIdx
         | GROUP BY 1, 2),
         |sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1)
         |SELECT mt.a, mt.b, za.sz AS sz_a, zb.sz AS sz_b, mt.matches,
         | round(mt.matches::DOUBLE / $NumHashes, 4) AS jhat,
         | round(CASE WHEN za.sz > 0 THEN
         |   mt.matches::DOUBLE / $NumHashes
         |    / (1.0 + mt.matches::DOUBLE / $NumHashes)
         |    * (za.sz + zb.sz)::DOUBLE / za.sz::DOUBLE
         |  ELSE 0.0 END, 4) AS containment_a
         |FROM mt JOIN sz za ON za.doc_id = mt.a
         | JOIN sz zb ON zb.doc_id = mt.b"""
        .stripMargin.replace("\n", " "),
    "q269_compression_ratio" ->
      """SELECT doc_id AS id,
        | greatest(length(coalesce(text, '')) - 7, 0)::BIGINT AS grams,
        | CASE WHEN length(coalesce(text, '')) >= 8 THEN
        |   len(list_distinct(list_transform(
        |     range(1, length(text) - 7 + 1),
        |     i -> substr(text, i, 8))))
        |  ELSE 0 END::BIGINT AS distinct_grams,
        | round(CASE WHEN length(coalesce(text, '')) >= 8 THEN
        |   1.0 - len(list_distinct(list_transform(
        |     range(1, length(text) - 7 + 1),
        |     i -> substr(text, i, 8))))::DOUBLE
        |    / (length(text) - 7)::DOUBLE
        |  ELSE 0.0 END, 4) + 0 AS redundancy
        |FROM documents""".stripMargin.replace("\n", " "),
    "q270_url_dedup_stream" ->
      """SELECT DISTINCT 'https://' || lower(source) || '-' || (doc_id % 7) ||
        | '.com/' || lang || '/p' || (doc_id % 50) || '?id=' || doc_id AS canon_url
        |FROM documents""".stripMargin.replace("\n", " "),
    "q271_image_dedup_stream" -> MmQueries.ahashOracle(
      "SELECT DISTINCT ahash_lo, ahash_hi FROM a"),
    // Mann-Whitney with average ranks over per-score groups — the same
    // cumBefore + (n+1)/2 arithmetic as the operator
    "q279_eval_auc" ->
      """WITH sc AS (SELECT (n_chars % 53)::DOUBLE AS s, lang = 'en' AS y
        | FROM documents),
        |g AS (SELECT s, count(*) AS ns,
        |  sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS pos
        | FROM sc GROUP BY s),
        |r AS (SELECT *, sum(ns) OVER (ORDER BY s) AS cumN FROM g),
        |a AS (SELECT sum(ns)::BIGINT AS n, sum(pos)::BIGINT AS n_pos,
        |  sum(ns - pos)::BIGINT AS n_neg,
        |  sum(pos * ((cumN - ns) + (ns + 1) / 2.0)) AS rsum FROM r)
        |SELECT n, n_pos, n_neg,
        | round(CASE WHEN n_pos > 0 AND n_neg > 0
        |  THEN (rsum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg) END, 4) AS auc
        |FROM a""".stripMargin.replace("\n", " "),
    "q280_eval_confusion" ->
      """WITH sc AS (SELECT (n_chars % 53)::DOUBLE AS s, lang = 'en' AS y
        | FROM documents),
        |c AS (SELECT
        | sum(CASE WHEN s > 26.0 AND y THEN 1 ELSE 0 END)::BIGINT AS tp,
        | sum(CASE WHEN s > 26.0 AND NOT y THEN 1 ELSE 0 END)::BIGINT AS fp,
        | sum(CASE WHEN s <= 26.0 AND y THEN 1 ELSE 0 END)::BIGINT AS fn,
        | sum(CASE WHEN s <= 26.0 AND NOT y THEN 1 ELSE 0 END)::BIGINT AS tn
        | FROM sc),
        |p AS (SELECT *,
        | CASE WHEN tp + fp > 0 THEN tp::DOUBLE / (tp + fp) END AS prec,
        | CASE WHEN tp + fn > 0 THEN tp::DOUBLE / (tp + fn) END AS rec
        | FROM c)
        |SELECT tp, fp, fn, tn,
        | round(prec, 4) AS precision, round(rec, 4) AS recall,
        | round(CASE WHEN prec IS NOT NULL AND rec IS NOT NULL
        |   AND prec + rec > 0 THEN 2.0 * prec * rec / (prec + rec) END, 4) AS f1,
        | round((tp + tn)::DOUBLE / (tp + fp + fn + tn), 4) AS accuracy
        |FROM p""".stripMargin.replace("\n", " "),
    "q281_eval_pr_curve" ->
      """WITH sc AS (SELECT (n_chars % 53)::DOUBLE AS s, lang = 'en' AS y
        | FROM documents),
        |g AS (SELECT s, count(*) AS n,
        |  sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS pos
        | FROM sc GROUP BY s),
        |t AS (SELECT sum(pos)::BIGINT AS totPos FROM g),
        |r AS (SELECT s, sum(n) OVER (ORDER BY s DESC) AS cumN,
        |  sum(pos) OVER (ORDER BY s DESC) AS cumPos FROM g)
        |SELECT s AS threshold_ge, cumN::BIGINT AS n_predicted,
        | cumPos::BIGINT AS tp,
        | round(cumPos::DOUBLE / cumN, 4) AS precision,
        | round(CASE WHEN t.totPos > 0 THEN cumPos::DOUBLE / t.totPos END, 4) AS recall
        |FROM r, t""".stripMargin.replace("\n", " "),
    "q282_eval_kappa" ->
      """WITH sc AS (SELECT lang = 'en' AS a, n_chars % 5 < 3 AS b FROM documents),
        |c AS (SELECT
        | sum(CASE WHEN a AND b THEN 1 ELSE 0 END)::BIGINT AS n_both,
        | sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS n_a_only,
        | sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)::BIGINT AS n_b_only,
        | sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS n_neither
        | FROM sc),
        |x AS (SELECT *, n_both + n_a_only + n_b_only + n_neither AS n,
        | (n_both + n_neither)::DOUBLE / (n_both + n_a_only + n_b_only + n_neither) AS po,
        | ((n_both + n_a_only) * (n_both + n_b_only) + (n_b_only + n_neither) * (n_a_only + n_neither))::DOUBLE
        |   / (n_both + n_a_only + n_b_only + n_neither) / (n_both + n_a_only + n_b_only + n_neither) AS pe
        | FROM c)
        |SELECT n_both, n_a_only, n_b_only, n_neither, n, round(po, 4) AS po,
        | round(pe, 4) AS pe,
        | round(CASE WHEN pe < 1.0 THEN (po - pe) / (1.0 - pe) END, 4) AS kappa
        |FROM x""".stripMargin.replace("\n", " "),
    "q283_eval_calibration" ->
      """WITH sc AS (SELECT (n_chars % 100)::DOUBLE / 100.0 AS s,
        |  lang = 'en' AS y FROM documents),
        |b AS (SELECT least(9, floor(s * 10)::INT) AS bin, s, y FROM sc)
        |SELECT bin, count(*) AS n,
        | round(sum((CASE WHEN s >= 0 THEN floor(s*1e6+0.5)
        |    ELSE -floor(-s*1e6+0.5) END)::BIGINT)::DOUBLE / 1e6 / count(*), 4)
        |   AS mean_score,
        | round(sum(CASE WHEN y THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS pos_rate
        |FROM b GROUP BY bin""".stripMargin.replace("\n", " "),
    "q284_eval_regression" ->
      s"""WITH sc AS (SELECT value AS a, value * 0.9 + 1.0 AS p FROM events
         | WHERE value IS NOT NULL),
         |f AS (SELECT a, p, ${fp6("p - a")} AS e6, ${fp6("a")} AS a6,
         |  CASE WHEN a <> 0.0 THEN ${fp6("abs((p - a) / a)")} ELSE 0 END AS ape6,
         |  CASE WHEN a <> 0.0 THEN 1 ELSE 0 END AS nape
         | FROM sc),
         |g AS (SELECT count(*) AS n,
         |  sum(e6::DECIMAL(38,0) * e6::DECIMAL(38,0)) AS see,
         |  sum(abs(e6))::BIGINT AS sae, sum(e6)::BIGINT AS se,
         |  sum(a6)::BIGINT AS sa,
         |  sum(a6::DECIMAL(38,0) * a6::DECIMAL(38,0)) AS saa,
         |  sum(ape6)::BIGINT AS sape, sum(nape)::BIGINT AS nap
         | FROM f)
         |SELECT n, round(sqrt(see::DOUBLE / 1e12 / n), 4) AS rmse,
         | round(sae::DOUBLE / 1e6 / n, 4) AS mae,
         | round(se::DOUBLE / 1e6 / n, 4) AS bias,
         | round(CASE WHEN (saa::DOUBLE / 1e12) - (sa::DOUBLE / 1e6) * (sa::DOUBLE / 1e6) / n > 0
         |  THEN 1.0 - (see::DOUBLE / 1e12) /
         |   ((saa::DOUBLE / 1e12) - (sa::DOUBLE / 1e6) * (sa::DOUBLE / 1e6) / n) END, 4) AS r2,
         | round(CASE WHEN nap > 0 THEN sape::DOUBLE / 1e6 / nap END, 4) AS mape
         |FROM g""".stripMargin.replace("\n", " "),
    // commutative digest: sum of 56-bit md5 values is order-free in both
    // engines; DECIMAL/HUGEINT keeps it exact at any corpus size
    "q278_corpus_fingerprint" ->
      s"""SELECT source, count(*) AS n_rows,
         | bit_xor(${h56("doc_id::VARCHAR || chr(1) || text || chr(1) || lang")}) AS digest
         |FROM documents GROUP BY source""".stripMargin.replace("\n", " "),
    // RE2 spells the script classes without the Is prefix; the dominant
    // fold replays the same strict-> tie rule, class order fixed
    "q268_script_profile" ->
      """WITH d AS (SELECT doc_id, text ||
        | (CASE WHEN doc_id % 4 = 1 THEN ' 你好世界'
        |   WHEN doc_id % 4 = 2 THEN ' Привет мир'
        |   WHEN doc_id % 4 = 3 THEN ' مرحبا 42' ELSE '' END) AS t
        | FROM documents),
        |c AS (SELECT doc_id, length(t)::BIGINT AS n_chars,
        | length(regexp_replace(t, '[^\p{Latin}]', '', 'g'))::BIGINT AS n_latin,
        | length(regexp_replace(t, '[^\p{Cyrillic}]', '', 'g'))::BIGINT AS n_cyrillic,
        | length(regexp_replace(t, '[^\p{Han}]', '', 'g'))::BIGINT AS n_han,
        | length(regexp_replace(t, '[^\p{Arabic}]', '', 'g'))::BIGINT AS n_arabic,
        | length(regexp_replace(t, '[^0-9]', '', 'g'))::BIGINT AS n_digit,
        | length(regexp_replace(t, '[^\s]', '', 'g'))::BIGINT AS n_space
        | FROM d)
        |SELECT *,
        | CASE WHEN n_latin + n_cyrillic + n_han + n_arabic = 0 THEN 'none'
        |  WHEN n_arabic > greatest(n_latin, n_cyrillic, n_han) THEN 'arabic'
        |  WHEN n_han > greatest(n_latin, n_cyrillic) THEN 'han'
        |  WHEN n_cyrillic > n_latin THEN 'cyrillic'
        |  ELSE 'latin' END AS dominant
        |FROM c""".stripMargin.replace("\n", " "),
    // canonical key derived independently: every raw variant collapses
    // to the query-free canonical form
    "q266_url_dedup" ->
      """WITH c AS (SELECT doc_id,
        | 'https://' || lower(source) || '-' || (doc_id % 7) || '.com/' ||
        |  lang || '/p' || (doc_id % 50) AS canon_url FROM documents)
        |SELECT doc_id, canon_url,
        | count(*) OVER (PARTITION BY canon_url) AS dupCount,
        | doc_id = min(doc_id) OVER (PARTITION BY canon_url) AS keep
        |FROM c""".stripMargin.replace("\n", " "),
    // aHash pairs at hamming <= 2 closed transitively; min-id labels
    // (the q75 closure shape over the q257 hash replay)
    "q267_image_dup_clusters" -> MmQueries.ahashOracle(
      """, bands AS (SELECT id, ahash_lo, ahash_hi,
        |  unnest([ahash_lo & 65535, (ahash_lo >> 16) & 65535,
        |          ahash_hi & 65535, (ahash_hi >> 16) & 65535]) AS bucket,
        |  unnest([0, 1, 2, 3]) AS band FROM a),
        |cand AS (SELECT DISTINCT l.id AS ca, r.id AS cb
        | FROM bands l JOIN bands r ON l.band = r.band AND l.bucket = r.bucket
        | WHERE l.id < r.id),
        |p AS (SELECT c.ca, c.cb,
        |  (bit_count(xor(x.ahash_lo, y.ahash_lo)) +
        |   bit_count(xor(x.ahash_hi, y.ahash_hi))) AS hamming
        | FROM cand c JOIN a x ON x.id = c.ca JOIN a y ON y.id = c.cb),
        |e0 AS (SELECT ca, cb FROM p WHERE hamming <= 2),
        |edges AS (SELECT ca, cb FROM e0 UNION ALL SELECT cb AS ca, ca AS cb FROM e0),
        |reach(id, label) AS (
        | SELECT id, id FROM a
        | UNION
        | SELECT e.ca, r.label FROM reach r JOIN edges e ON e.cb = r.id)
        |SELECT id, min(label) AS cluster FROM reach GROUP BY id"""
        .stripMargin.replace("\n", " "), recursive = true),
    // canonical url derived independently (q260 device); blocked =
    // the same two patterns via RE2
    "q265_url_blocklist" -> urlOracle(
      """SELECT doc_id,
        |'https://' || lower(source) || '-' || (doc_id % 7) || '.com/' ||
        |  lang || '/p' || (doc_id % 50) || '?id=' || doc_id AS canon_url,
        |(regexp_matches('https://' || lower(source) || '-' || (doc_id % 7) ||
        |   '.com/' || lang || '/p' || (doc_id % 50) || '?id=' || doc_id,
        |   '://[a-z0-9]*-3\.com/')
        | OR regexp_matches('https://' || lower(source) || '-' || (doc_id % 7) ||
        |   '.com/' || lang || '/p' || (doc_id % 50) || '?id=' || doc_id,
        |   '/p1[0-9]($|\?)')) AS blocked,
        |CASE WHEN regexp_matches('https://' || lower(source) || '-' || (doc_id % 7) ||
        |   '.com/' || lang || '/p' || (doc_id % 50) || '?id=' || doc_id,
        |   '(://[a-z0-9]*-3\.com/)|(/p1[0-9]($|\?))') THEN 'O' ELSE 'N' END AS tag
        |FROM u""".stripMargin.replace("\n", " ")),
    // expected extraction derived from raw fields: anchors concatenate
    // (Home + source), block closers give the newlines, entities decode,
    // comment/script/style/title vanish; link_chars = |Home| + |source|
    // + |Contact|
    "q264_html_extract" ->
      """WITH e AS (SELECT doc_id,
        | 'Home' || source || chr(10) || 'Doc ' || doc_id || chr(10) ||
        |  text || ' & tail' || chr(10) || 'Line''s ' || lang || chr(10) ||
        |  'Contact' AS text,
        | length(source) AS ls FROM documents)
        |SELECT doc_id, text, length(text)::BIGINT AS n_chars,
        | 5::BIGINT AS n_paras, 3::BIGINT AS n_links,
        | (11 + ls)::BIGINT AS link_chars
        |FROM e""".stripMargin.replace("\n", " "),
    // the admitted set of the streaming exact dedup: one row per
    // distinct content hash (n_chars is determined by the text)
    "q253_dedup_exact_stream" ->
      """SELECT DISTINCT md5(text) AS contentHash, n_chars
        |FROM documents""".stripMargin.replace("\n", " "),
    // every a<b pair sharing an LSH band bucket, with the band id —
    // the streaming bucket state emits exactly this set per batch
    "q254_neardup_stream" ->
      s"""WITH $sigCte,
         |bands AS (SELECT doc_id, hashIdx // $BandSize AS band,
         |  array_to_string(list(minHash ORDER BY hashIdx), ':') AS bucket
         | FROM sig GROUP BY doc_id, band)
         |SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.band::INT AS band
         |FROM bands l JOIN bands r ON l.band = r.band AND l.bucket = r.bucket
         |WHERE l.doc_id < r.doc_id""".stripMargin.replace("\n", " "),
    // ingest admission: Gopher gate + any shared band bucket with the
    // retained (doc_id%5<>4) corpus
    "q255_ingest_verdict" ->
      s"""WITH $sigCte,
         |bands AS (SELECT doc_id, hashIdx // $BandSize AS band,
         |  array_to_string(list(minHash ORDER BY hashIdx), ':') AS bucket
         | FROM sig GROUP BY doc_id, band),
         |sel AS (SELECT doc_id, doc_id % 5 = 4 AS isb FROM documents),
         |dup AS (SELECT DISTINCT nb.doc_id
         | FROM bands nb JOIN sel sb ON sb.doc_id = nb.doc_id AND sb.isb
         | JOIN bands cb ON cb.band = nb.band AND cb.bucket = nb.bucket
         | JOIN sel sr ON sr.doc_id = cb.doc_id AND NOT sr.isb),
         |$gopherCte,
         |g AS (SELECT doc_id,
         |  (CASE WHEN nWords BETWEEN 50 AND 100000
         |   AND mwl BETWEEN 3.0 AND 10.0 AND symr <= 0.1
         |   AND bull <= 0.9 AND ell <= 0.3 AND alpha >= 0.8
         |   AND nStop >= 2 THEN 1 ELSE 0 END)::BIGINT AS qualityPass
         | FROM gm)
         |SELECT s.doc_id, g.qualityPass,
         | (d.doc_id IS NOT NULL)::BIGINT AS isDup,
         | (g.qualityPass = 1 AND d.doc_id IS NULL)::BIGINT AS admitted
         |FROM sel s JOIN g USING (doc_id) LEFT JOIN dup d USING (doc_id)
         |WHERE s.isb""".stripMargin.replace("\n", " "),
    // batch-2 docs rebuilt against cumulative (= corpus-wide) line
    // frequencies — identical to the q173 replay restricted to odd ids
    "q256_line_dedup_stream" ->
      s"""WITH ls AS (SELECT doc_id, string_split(text, ' table ') AS a
         |  FROM documents),
         |segs AS (SELECT doc_id, unnest(a) AS line,
         |  unnest(generate_series(1, len(a))) AS pos FROM ls),
         |hh AS (SELECT doc_id, pos, line, ${h56("line")} AS h FROM segs),
         |hot AS (SELECT h FROM hh GROUP BY h HAVING count(*) >= 2),
         |j AS (SELECT hh.doc_id, hh.pos, hh.line,
         |  hot.h IS NOT NULL AS isdup FROM hh LEFT JOIN hot ON hh.h = hot.h)
         |SELECT doc_id,
         | coalesce(string_agg(CASE WHEN NOT isdup THEN line END,
         |   ' table ' ORDER BY pos), '') AS text,
         | count(*) AS nLines,
         | sum(CASE WHEN isdup THEN 1 ELSE 0 END)::BIGINT AS nRemoved
         |FROM j WHERE doc_id % 2 = 1 GROUP BY 1"""
        .stripMargin.replace("\n", " "),
    "q50_token_count" ->
      s"""SELECT doc_id, len($toks)::BIGINT AS nWords,
         | ceil(length(text)/4.0)::BIGINT AS nSubTokens FROM documents"""
        .stripMargin.replace("\n", " "),
    // same pre-tokenizer regex, RE2 side
    "q165_bpe_tokens" ->
      s"""SELECT doc_id, len($toks)::BIGINT AS nWords,
         | len(regexp_extract_all(text,
         |   ' ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+'))::BIGINT
         |   AS nBpeTokens FROM documents""".stripMargin.replace("\n", " "),
    // hash-derived stratified sampling: u = 56-bit md5 prefix / 2^56,
    // keep iff u < per-source quota (exact integer-ratio doubles — no
    // float divergence possible between engines)
    "q88_corpus_mix" ->
      s"""WITH d AS (SELECT doc_id, source,
         |  ${h56("doc_id::VARCHAR")} / 72057594037927936.0 AS u,
         |  CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.1
         |   ELSE 0.5 END AS quota
         | FROM documents)
         |SELECT doc_id, source, round(u, 4) AS u, quota
         |FROM d WHERE u < quota""".stripMargin.replace("\n", " "),
    // the regex strings embed verbatim: DuckDB single-quoted literals do
    // not process backslashes, and both patterns are RE2-safe
    "q89_pii_redact" ->
      s"""SELECT doc_id,
         | regexp_replace(regexp_replace(text,
         |   '${TextOps.EmailRe}', '<EMAIL>', 'g'),
         |   '${TextOps.PhoneRe}', '<PHONE>', 'g') AS redacted,
         | len(regexp_extract_all(text, '${TextOps.EmailRe}'))::INT AS nEmails,
         | len(regexp_extract_all(text, '${TextOps.PhoneRe}'))::INT AS nPhones
         |FROM documents""".stripMargin.replace("\n", " "),
    // span-level dedup: every 8-token span at stride 4 hashed to 56 bits
    // and counted corpus-wide; a position is duplicated iff its span
    // occurs more than once anywhere (mirrors TextOps.spanDedup exactly,
    // including short-doc nSpans = 0 via the left join)
    "q90_span_dedup" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s AS (SELECT doc_id, unnest(list_transform(
         |   range(0, (len(tk) - 8) // 4 + 1),
         |   i -> ${h56("array_to_string(tk[i*4+1 : i*4+8], ' ')")})) AS sh
         | FROM t WHERE len(tk) >= 8),
         |c AS (SELECT sh, count(*) AS cnt FROM s GROUP BY 1),
         |p AS (SELECT doc_id, count(*) AS nSpans,
         |   sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END)::BIGINT AS nDupSpans
         | FROM s JOIN c USING (sh) GROUP BY 1)
         |SELECT d.doc_id, coalesce(p.nSpans, 0)::BIGINT AS nSpans,
         | coalesce(p.nDupSpans, 0)::BIGINT AS nDupSpans,
         | round(CASE WHEN p.nSpans > 0
         |   THEN p.nDupSpans / p.nSpans::DOUBLE ELSE 0.0 END, 4) AS dupSpanFrac
         |FROM documents d LEFT JOIN p USING (doc_id)"""
        .stripMargin.replace("\n", " "),
    // span rewrite: first occurrence by (doc_id, widx) wins; rebuild via
    // ordered string_agg over the kept windows
    "q139_span_rewrite" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |w AS (SELECT doc_id,
         |   unnest(range(0, cast(ceil(len(tk) / 8.0) AS BIGINT))) AS widx, tk
         | FROM t WHERE len(tk) > 0),
         |h AS (SELECT doc_id, widx,
         |   ${h56("array_to_string(tk[widx*8+1 : widx*8+8], ' ')")} AS h
         | FROM w),
         |kp AS (SELECT doc_id, widx FROM (SELECT doc_id, widx,
         |   row_number() OVER (PARTITION BY h ORDER BY doc_id, widx) AS rn
         |  FROM h) WHERE rn = 1),
         |r AS (SELECT kp.doc_id,
         |   string_agg(array_to_string(t.tk[kp.widx*8+1 : kp.widx*8+8], ' '),
         |     ' ' ORDER BY kp.widx) AS newText,
         |   count(*)::BIGINT AS nKept
         | FROM kp JOIN t USING (doc_id) GROUP BY 1)
         |SELECT d.doc_id,
         | cast(ceil(len(t.tk) / 8.0) AS BIGINT) AS nWindows,
         | coalesce(r.nKept, 0)::BIGINT AS nKept,
         | coalesce(r.newText, '') AS newText
         |FROM documents d JOIN t USING (doc_id) LEFT JOIN r USING (doc_id)"""
        .stripMargin.replace("\n", " "),
    // chunking: 32-token windows at step 24 (8-token overlap); the tail
    // window may be shorter; tokenless docs emit nothing
    "q92_chunk_docs" ->
      s"""WITH $chunkCte
         |SELECT doc_id, chunkIdx, startTok, nTok, chunk FROM ch"""
        .stripMargin.replace("\n", " "),
    // greedy packing of the q92 chunks into 128-token bins per source —
    // an integer-state walk, replayed exactly by one recursion step per
    // chunk (base: first chunk of each shard opens bin 0 at offset 0)
    "q93_pack_greedy" ->
      s"""WITH RECURSIVE $chunkCte,
         |ord AS (SELECT d.source AS shard, c.doc_id, c.chunkIdx, c.nTok,
         |   row_number() OVER (PARTITION BY d.source
         |     ORDER BY c.doc_id, c.chunkIdx) AS rn
         | FROM ch c JOIN documents d USING (doc_id)),
         |pk AS (
         | SELECT shard, rn, doc_id, chunkIdx, nTok,
         |  0 AS bin, 0 AS off, nTok AS fill
         | FROM ord WHERE rn = 1
         | UNION ALL
         | SELECT o.shard, o.rn, o.doc_id, o.chunkIdx, o.nTok,
         |  CASE WHEN p.fill > 0 AND p.fill + o.nTok > 128
         |   THEN p.bin + 1 ELSE p.bin END AS bin,
         |  CASE WHEN p.fill > 0 AND p.fill + o.nTok > 128
         |   THEN 0 ELSE p.fill END AS off,
         |  CASE WHEN p.fill > 0 AND p.fill + o.nTok > 128
         |   THEN o.nTok ELSE p.fill + o.nTok END AS fill
         | FROM pk p JOIN ord o ON o.shard = p.shard AND o.rn = p.rn + 1)
         |SELECT shard, doc_id, chunkIdx, nTok, bin::INT AS bin,
         | off::INT AS offset FROM pk""".stripMargin.replace("\n", " "),
    // identical avg-arithmetic slope on both engines; ties broken by tok
    "q122_zipf_slope" ->
      """WITH tc AS (SELECT lang, tok, count(*) AS cnt
        | FROM (SELECT lang, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
        |       FROM documents) GROUP BY 1, 2),
        |r AS (SELECT lang, cnt,
        |  row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS rank
        | FROM tc),
        |xy AS (SELECT lang, ln(rank::DOUBLE) AS x, ln(cnt::DOUBLE) AS y
        | FROM r WHERE rank <= 200)
        |SELECT lang, count(*) AS n_toks,
        | round((avg(x*y) - avg(x)*avg(y)) / (avg(x*x) - avg(x)*avg(x)), 4)
        |  AS zipf_slope
        |FROM xy GROUP BY 1""".stripMargin.replace("\n", " "),
    // A-ES keys: ln(u)/w is monotone in u^(1/w) for w>0; top-40 per lang
    "q121_weighted_sample" ->
      s"""WITH sk AS (SELECT lang, doc_id, n_chars,
         |  ln(${h56("doc_id::VARCHAR")} / 72057594037927936.0) / n_chars AS skey
         | FROM documents),
         |r AS (SELECT lang, doc_id, n_chars,
         |  row_number() OVER (PARTITION BY lang ORDER BY skey DESC, doc_id) AS rnk
         | FROM sk)
         |SELECT lang, doc_id, n_chars FROM r WHERE rnk <= 40"""
        .stripMargin.replace("\n", " "),
    // split cuts embedded as the exact Scala doubles (toString round-trips)
    "q107_split" -> {
      val w = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
      val cases = w.map(_._1).zip(TextOps.splitCuts(w)).dropRight(1)
        .map { case (n, c) => s"WHEN u < $c THEN '$n'" }.mkString(" ")
      s"""WITH d AS (SELECT doc_id,
         |  ${h56("doc_id::VARCHAR")} / 72057594037927936.0 AS u FROM documents)
         |SELECT doc_id, round(u, 4) AS u,
         | CASE $cases ELSE '${w.last._1}' END AS split
         |FROM d""".stripMargin.replace("\n", " ")
    },
    // salted md5 shuffle key -> shard = key mod 8, position by key order
    "q94_shuffle_shards" ->
      s"""WITH k AS (SELECT doc_id,
         |  ${h56("doc_id::VARCHAR || ':ep0'")} AS shuffleKey FROM documents)
         |SELECT doc_id, shuffleKey, (shuffleKey % 8)::INT AS shard,
         | row_number() OVER (PARTITION BY shuffleKey % 8 ORDER BY shuffleKey)
         |  - 1 AS posInShard
         |FROM k""".stripMargin.replace("\n", " "),
    // decontamination: eval split = hash56(doc_id) % 20 = 0; a train doc
    // is contaminated iff it shares any distinct 6-gram with any eval doc
    "q91_decontaminate" -> decontaminateOracle,
    // the Bloom prefilter is exact after its confirm join, so the scale
    // path is held to the very same oracle as the broadcast-join form
    "q91b_decontaminate_bloom" -> decontaminateOracle,
    // Gopher-style repetition signals: duplicate-bigram fraction +
    // char fraction of the most frequent bigram (ties: smallest gram,
    // same pick as the Spark fold over the sorted gram array)
    "q87_repetition" ->
      s"""WITH t AS (SELECT doc_id, text, $toks AS tk FROM documents),
         |g AS (SELECT doc_id, text, CASE WHEN len(tk) >= 2
         |  THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
         |  ELSE [] END AS grams FROM t),
         |x AS (SELECT doc_id, text, len(grams) AS nGrams,
         |  CASE WHEN len(grams) > 0
         |   THEN 1.0 - len(list_distinct(grams))::DOUBLE / len(grams)
         |   ELSE 0.0 END AS dupGramFrac, grams FROM g),
         |u AS (SELECT doc_id, unnest(grams) AS gram FROM x),
         |c AS (SELECT doc_id, gram, count(*) AS cnt FROM u GROUP BY 1, 2),
         |sel AS (SELECT doc_id, gram AS topGram, cnt,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram) AS rn
         | FROM c QUALIFY rn = 1)
         |SELECT x.doc_id, x.nGrams, round(x.dupGramFrac, 4) AS dupGramFrac,
         | coalesce(s.topGram, '') AS topGram,
         | round(coalesce(s.cnt * len(s.topGram) / length(x.text)::DOUBLE, 0.0), 4)
         |  AS topGramFrac
         |FROM x LEFT JOIN sel s USING (doc_id)""".stripMargin.replace("\n", " "),
    "q51_quality" ->
      s"""WITH b AS (SELECT doc_id,
         |  len($toks)::DOUBLE AS nTok,
         |  len(list_filter($toks, t -> t IN (${inList(TextOps.langMarkers("en"))})))::DOUBLE AS nStop,
         |  len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE AS nPunct,
         |  len(regexp_extract_all(text, '[0-9]'))::DOUBLE AS nDigit,
         |  length(text)::DOUBLE AS nChars
         | FROM documents)
         |SELECT doc_id, nTok, nStop, nPunct, nDigit,
         | round((least(nTok/50.0, 1.0)
         |  + least(nStop/greatest(nTok,1.0)*10.0, 1.0)
         |  + (1.0 - least(nPunct/greatest(nChars,1.0)*20.0, 1.0))
         |  + (1.0 - least(nDigit/greatest(nChars,1.0)*10.0, 1.0))) / 4.0, 4) AS quality
         |FROM b""".stripMargin.replace("\n", " "),
    "q130_corpus_diff" ->
      """WITH o AS (SELECT doc_id,
        |  md5(CASE WHEN doc_id % 5 = 3 THEN text || ' v1' ELSE text END) AS ho
        | FROM documents WHERE doc_id % 5 <> 4),
        |n AS (SELECT doc_id, md5(text) AS hn
        | FROM documents WHERE doc_id % 5 <> 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        | CASE WHEN o.ho IS NULL THEN 'added'
        |      WHEN n.hn IS NULL THEN 'removed'
        |      WHEN o.ho <> n.hn THEN 'changed' ELSE 'same' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id"""
        .stripMargin.replace("\n", " "),
    "q127_gopher_rules" ->
      s"""WITH $gopherCte
         |SELECT doc_id, nWords, round(mwl, 4) AS meanWordLen,
         | round(symr, 4) AS symbolRatio, round(bull, 4) AS bulletFrac,
         | round(ell, 4) AS ellipsisFrac, round(alpha, 4) AS alphaWordFrac,
         | nStop,
         | (CASE WHEN nWords BETWEEN 50 AND 100000
         |   AND mwl BETWEEN 3.0 AND 10.0 AND symr <= 0.1
         |   AND bull <= 0.9 AND ell <= 0.3 AND alpha >= 0.8
         |   AND nStop >= 2 THEN 1 ELSE 0 END)::BIGINT AS passed
         |FROM gm""".stripMargin.replace("\n", " "),
    "q52_langid" ->
      s"""WITH c AS (SELECT doc_id,
         |${markers.map { case (l, ws) =>
             s" len(list_filter($toks, t -> t IN (${inList(ws)})))::INT AS n_$l" }
             .mkString(",")}
         | FROM documents)
         |SELECT doc_id, ${markers.map(m => s"n_${m._1}").mkString(", ")},
         | CASE WHEN greatest(${markers.map(m => s"n_${m._1}").mkString(",")}) = 0 THEN 'unknown'
         |${markers.map { case (l, _) =>
             s" WHEN n_$l = greatest(${markers.map(m => s"n_${m._1}").mkString(",")}) THEN '$l'" }
             .mkString}
         | ELSE 'unknown' END AS predLang
         |FROM c""".stripMargin.replace("\n", " "),
    "q53_fingerprint" ->
      s"""SELECT doc_id, md5(array_to_string($toks, ' ')) AS fp,
         | list_min(list_transform($toks, t -> ${h56("t")})) AS minTokenHash
         |FROM documents""".stripMargin.replace("\n", " "),
    "q54_minhash_sig" ->
      s"""WITH $sigCte SELECT doc_id, hashIdx, minHash FROM sig"""
        .stripMargin.replace("\n", " "),
    "q55_minhash_pairs" ->
      s"""WITH $sigCte,
         |bands AS (SELECT doc_id, hashIdx // $BandSize AS band,
         |  array_to_string(list(minHash ORDER BY hashIdx), ':') AS bucket
         | FROM sig GROUP BY doc_id, band)
         |SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |FROM bands l JOIN bands r ON l.band = r.band AND l.bucket = r.bucket
         |WHERE l.doc_id < r.doc_id""".stripMargin.replace("\n", " "),
    "q115_neardup_capped" ->
      s"""WITH $sigCte,
         |bands AS (SELECT doc_id, hashIdx // $BandSize AS band,
         |  array_to_string(list(minHash ORDER BY hashIdx), ':') AS bucket
         | FROM sig GROUP BY doc_id, band),
         |kept AS (SELECT doc_id, band, bucket FROM (
         |  SELECT doc_id, band, bucket,
         |   count(*) OVER (PARTITION BY band, bucket) AS n FROM bands)
         | WHERE n <= 2)
         |SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |FROM kept l JOIN kept r ON l.band = r.band AND l.bucket = r.bucket
         |WHERE l.doc_id < r.doc_id""".stripMargin.replace("\n", " "),
    // minhash is per-row, so filtering sides before or after the
    // signature is identical — compute sig once, split at the band join
    "q106_crossdedup" ->
      s"""WITH $sigCte,
         |bands AS (SELECT doc_id, hashIdx // $BandSize AS band,
         |  array_to_string(list(minHash ORDER BY hashIdx), ':') AS bucket
         | FROM sig GROUP BY doc_id, band),
         |sp AS (SELECT doc_id,
         |  (${h56("doc_id::VARCHAR")} % 10) < 3 AS isNew FROM documents)
         |SELECT DISTINCT n.doc_id AS a, c.doc_id AS b
         |FROM bands n JOIN sp sn ON sn.doc_id = n.doc_id AND sn.isNew
         |JOIN bands c ON c.band = n.band AND c.bucket = n.bucket
         |JOIN sp sc ON sc.doc_id = c.doc_id AND NOT sc.isNew"""
        .stripMargin.replace("\n", " "),
    // winnowing (k=3 grams, window 4): fingerprint = distinct per-window
    // minima of the 56-bit gram hashes; < 4 grams → one window over all
    "q77_winnow" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
         |g AS (SELECT doc_id, CASE WHEN len(t) >= 3
         |  THEN list_transform(range(1, len(t)-1),
         |       i -> ${h56("t[i] || ' ' || t[i+1] || ' ' || t[i+2]")})
         |  ELSE [] END AS h FROM tk),
         |m AS (SELECT doc_id, CASE WHEN len(h) = 0 THEN []
         |  WHEN len(h) <= 4 THEN [list_min(h)]
         |  ELSE list_transform(range(1, len(h)-2), i -> list_min(h[i:i+3]))
         |  END AS mins FROM g)
         |SELECT DISTINCT doc_id, unnest(mins) AS fp FROM m"""
        .stripMargin.replace("\n", " "),
    // rank on the RAW double (identical arithmetic both engines), round
    // only in the final projection — rounding first could reorder ties
    "q78_tfidf" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toks) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |w AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
         |  tf.tf * ln(n.n::DOUBLE / dfq.df) AS raw
         | FROM tf, dfq, n WHERE tf.term = dfq.term),
         |r AS (SELECT *, row_number() OVER
         |  (PARTITION BY doc_id ORDER BY raw DESC, term) AS rank
         | FROM w QUALIFY rank <= 5)
         |SELECT doc_id, term, tf, df, round(raw, 4) AS tfidf, rank FROM r"""
        .stripMargin.replace("\n", " "),
    // curation: filter on the RAW quality double (like the Spark side),
    // round only in the final projection
    "q81_corpus_curation" ->
      s"""$clusterSql,
         |qb AS (SELECT doc_id,
         |  len($toks)::DOUBLE AS nTok,
         |  len(list_filter($toks, t -> t IN (${inList(TextOps.langMarkers("en"))})))::DOUBLE AS nStop,
         |  len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE AS nPunct,
         |  len(regexp_extract_all(text, '[0-9]'))::DOUBLE AS nDigit,
         |  length(text)::DOUBLE AS nChars
         | FROM documents),
         |qual AS (SELECT doc_id,
         | (least(nTok/50.0, 1.0)
         |  + least(nStop/greatest(nTok,1.0)*10.0, 1.0)
         |  + (1.0 - least(nPunct/greatest(nChars,1.0)*20.0, 1.0))
         |  + (1.0 - least(nDigit/greatest(nChars,1.0)*10.0, 1.0))) / 4.0 AS rawq
         | FROM qb),
         |lc AS (SELECT doc_id,
         |${markers.map { case (l, ws) =>
             s" len(list_filter($toks, t -> t IN (${inList(ws)})))::INT AS n_$l" }
             .mkString(",")}
         | FROM documents),
         |lang AS (SELECT doc_id,
         | CASE WHEN greatest(${markers.map(m => s"n_${m._1}").mkString(",")}) = 0 THEN 'unknown'
         |${markers.map { case (l, _) =>
             s" WHEN n_$l = greatest(${markers.map(m => s"n_${m._1}").mkString(",")}) THEN '$l'" }
             .mkString}
         | ELSE 'unknown' END AS predLang FROM lc)
         |SELECT d.doc_id, lang.predLang, round(qual.rawq, 4) AS quality
         |FROM documents d
         |JOIN qual ON d.doc_id = qual.doc_id
         |JOIN lang ON d.doc_id = lang.doc_id
         |WHERE qual.rawq >= 0.5 AND lang.predLang = 'en'
         | AND d.doc_id IN (SELECT DISTINCT cluster FROM comp)"""
        .stripMargin.replace("\n", " "),
    "q84_winnow_pairs" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
         |g AS (SELECT doc_id, CASE WHEN len(t) >= 3
         |  THEN list_transform(range(1, len(t)-1),
         |       i -> ${h56("t[i] || ' ' || t[i+1] || ' ' || t[i+2]")})
         |  ELSE [] END AS h FROM tk),
         |m AS (SELECT doc_id, CASE WHEN len(h) = 0 THEN []
         |  WHEN len(h) <= 4 THEN [list_min(h)]
         |  ELSE list_transform(range(1, len(h)-2), i -> list_min(h[i:i+3]))
         |  END AS mins FROM g),
         |fp AS (SELECT DISTINCT doc_id, unnest(mins) AS fp FROM m)
         |SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS sharedFp
         |FROM fp l JOIN fp r ON l.fp = r.fp AND l.doc_id < r.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 3"""
        .stripMargin.replace("\n", " "),
    "q75_dup_clusters" ->
      s"""$clusterSql SELECT id, cluster FROM comp""",
    "q212_collocations" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
         |big AS (SELECT unnest(list_transform(range(1, len(t)),
         |   i -> {'x': t[i], 'y': t[i+1]})) AS g
         | FROM tk WHERE len(t) >= 2),
         |bg AS (SELECT g.x AS x, g.y AS y, count(*)::BIGINT AS cnt
         | FROM big GROUP BY 1, 2),
         |ug AS (SELECT unnest(t) AS tok FROM tk),
         |ugc AS (SELECT tok, count(*)::BIGINT AS c FROM ug GROUP BY tok),
         |tot AS (SELECT (SELECT count(*) FROM ug)::BIGINT AS n,
         |  (SELECT sum(cnt) FROM bg)::BIGINT AS nb)
         |SELECT bg.x, bg.y, bg.cnt,
         | round(ln((bg.cnt::DOUBLE / t.nb)
         |  / ((cx.c::DOUBLE / t.n) * (cy.c::DOUBLE / t.n))), 4) + 0 AS pmi
         |FROM bg JOIN ugc cx ON cx.tok = bg.x
         |JOIN ugc cy ON cy.tok = bg.y CROSS JOIN tot t
         |WHERE bg.cnt >= 5""".stripMargin.replace("\n", " "),
    "q211_entity_resolve" ->
      """WITH RECURSIVE b AS (SELECT doc_id, text,
        |  substr(text, 1, 16) AS blk FROM documents),
        |pr AS (SELECT x.doc_id AS a, y.doc_id AS b FROM b x JOIN b y
        | ON x.blk = y.blk AND x.doc_id < y.doc_id
        |  AND abs(length(x.text) - length(y.text)) <= 20
        |  AND levenshtein(x.text, y.text) <= 20),
        |edges AS (SELECT a, b FROM pr UNION ALL SELECT b AS a, a AS b FROM pr),
        |reach(id, label) AS (
        | SELECT doc_id, doc_id FROM documents
        | UNION
        | SELECT e.a, r.label FROM reach r JOIN edges e ON e.b = r.id)
        |SELECT id, min(label) AS cluster FROM reach GROUP BY id"""
        .stripMargin.replace("\n", " "),
    "q76_dedup_survivors" ->
      s"""$clusterSql
         |SELECT cluster AS doc_id, count(*) AS clusterSize
         |FROM comp GROUP BY cluster""".stripMargin.replace("\n", " "),
    "q56_simhash" ->
      s"""WITH t AS (SELECT doc_id, unnest($toks) AS tok FROM documents),
         |hx AS (SELECT doc_id, ${h56("tok")} AS h FROM t),
         |s AS (SELECT doc_id,
         |${(0 until 16).map(b =>
             s" sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b").mkString(",")}
         | FROM hx GROUP BY doc_id)
         |SELECT doc_id,
         | (${(0 until 16).map(b => s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END")
             .mkString(" + ")})::BIGINT AS simhash
         |FROM s""".stripMargin.replace("\n", " "),
    "q57_ngram_jaccard" ->
      s"""WITH $sigCte,
         |bands AS (SELECT doc_id, hashIdx // $BandSize AS band,
         |  array_to_string(list(minHash ORDER BY hashIdx), ':') AS bucket
         | FROM sig GROUP BY doc_id, band),
         |cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         | FROM bands l JOIN bands r ON l.band = r.band AND l.bucket = r.bucket
         | WHERE l.doc_id < r.doc_id),
         |n AS (SELECT doc_id, count(*) AS ng FROM sh GROUP BY doc_id),
         |i AS (SELECT c.a, c.b, count(sb.shingle) AS inter
         | FROM cand c
         | LEFT JOIN sh sa ON sa.doc_id = c.a
         | LEFT JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
         | GROUP BY 1, 2)
         |SELECT i.a, i.b, i.inter, na.ng AS na, nb.ng AS nb,
         | round(i.inter / (na.ng + nb.ng - i.inter)::DOUBLE, 4) AS jaccard
         |FROM i JOIN n na ON i.a = na.doc_id JOIN n nb ON i.b = nb.doc_id"""
        .stripMargin.replace("\n", " "),
    "q58_embed_neardup" ->
      """WITH p AS (SELECT a.vec_id AS a, b.vec_id AS b,
        |  list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |   (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
        |    * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cos
        | FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
        |SELECT a, b, round(cos,4) AS cos FROM p WHERE cos >= 0.4"""
        .stripMargin.replace("\n", " "),
    // hash-derived Rademacher hyperplanes: entry (p,d) = ±1 from the low
    // bit of md5("hp:p:d")'s first byte — identical on both engines;
    // bucket = the 8 sign bits of the hyperplane dots; exact cosine only
    // within buckets (same verify stage as q58)
    "q60_ann_lsh" ->
      """WITH hp AS (SELECT p, list_transform(range(64), d ->
        |  CASE WHEN (('0x' || substr(md5('hp:' || p::VARCHAR || ':' || d::VARCHAR),
        |     1, 2))::INT % 2) = 1 THEN 1.0 ELSE -1.0 END) AS h
        | FROM range(8) t(p)),
        |bk AS (SELECT e.vec_id,
        |  sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], hp.h) >= 0
        |    THEN (1::BIGINT << hp.p) ELSE 0 END) AS bucket
        | FROM embeddings e CROSS JOIN hp GROUP BY 1),
        |p AS (SELECT a.vec_id AS a, b.vec_id AS b,
        |  list_dot_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) /
        |   (sqrt(list_dot_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[]))
        |    * sqrt(list_dot_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[]))) AS cos
        | FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        | JOIN embeddings ea ON ea.vec_id = a.vec_id
        | JOIN embeddings eb ON eb.vec_id = b.vec_id)
        |SELECT a, b, round(cos,4) AS cos FROM p WHERE cos >= 0.3"""
        .stripMargin.replace("\n", " "),
    // full curation composition: the q81 closure (recursive-CTE dedup
    // clusters) ∧ q51 quality ∧ q52 language ∧ q102 LM gate, then the
    // q101 per-source rank cap — all filters on RAW doubles, rounding
    // only in the final projection
    "q103_curation_quota" -> curationOracle,
    // the staged-composition variant computes bit-identical values
    // (shared expression builders), so it shares q103's oracle
    "q161_curation_staged" -> curationOracle,
    // per-source quota: q51's quality arithmetic on the raw double,
    // rank capped per source (rounding only in the final projection —
    // rounding first could reorder ties)
    "q101_source_quota" ->
      s"""WITH qb AS (SELECT doc_id,
         |  len($toks)::DOUBLE AS nTok,
         |  len(list_filter($toks, t -> t IN (${inList(TextOps.langMarkers("en"))})))::DOUBLE AS nStop,
         |  len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE AS nPunct,
         |  len(regexp_extract_all(text, '[0-9]'))::DOUBLE AS nDigit,
         |  length(text)::DOUBLE AS nChars
         | FROM documents),
         |qual AS (SELECT doc_id,
         | (least(nTok/50.0, 1.0)
         |  + least(nStop/greatest(nTok,1.0)*10.0, 1.0)
         |  + (1.0 - least(nPunct/greatest(nChars,1.0)*20.0, 1.0))
         |  + (1.0 - least(nDigit/greatest(nChars,1.0)*10.0, 1.0))) / 4.0 AS rawq
         | FROM qb),
         |r AS (SELECT d.doc_id, d.source, qual.rawq,
         |  row_number() OVER (PARTITION BY d.source
         |    ORDER BY qual.rawq DESC, d.doc_id) AS rank
         | FROM documents d JOIN qual ON d.doc_id = qual.doc_id)
         |SELECT doc_id, source, round(rawq, 4) AS quality, rank
         |FROM r WHERE rank <= 15""".stripMargin.replace("\n", " "),
    // Laplace bigram LM: counts + per-context roll-up + vocab size, then
    // mean -ln((c+1)/(cCtx+V)) per doc — identical arithmetic both
    // engines (ln parity holds across the suite); docs with < 2 tokens
    // score 0 via the left join
    "q102_lm_score" ->
      s"""WITH $lmCte
         |SELECT doc_id, nGrams, round(avgNll, 4) AS avgNll FROM lm"""
        .stripMargin.replace("\n", " "),
    // CCNet head/middle/tail buckets: per-lang tercile cuts on the
    // 4dp-rounded LM score — identical cut inputs on both engines, so the
    // interpolated cuts and every <= comparison are bit-identical
    "q131_score_buckets" ->
      s"""WITH $lmCte,
         |sc2 AS (SELECT l.doc_id, d.lang, round(l.avgNll, 4) AS score4
         | FROM lm l JOIN documents d USING (doc_id)),
         |cuts AS (SELECT lang,
         |  round(quantile_cont(score4, 1.0/3), 6) AS c0,
         |  round(quantile_cont(score4, 2.0/3), 6) AS c1
         | FROM sc2 GROUP BY 1)
         |SELECT s.doc_id, s.lang, s.score4,
         | CASE WHEN s.score4 <= c.c0 THEN 'head'
         |  WHEN s.score4 <= c.c1 THEN 'middle' ELSE 'tail' END AS bucket
         |FROM sc2 s JOIN cuts c USING (lang)"""
        .stripMargin.replace("\n", " "),
    // per-(source, lang) masses + corpus share
    "q136_corpus_report" ->
      s"""WITH a AS (SELECT source, lang, count(*) AS nDocs,
         |  sum(length(text))::BIGINT AS nChars,
         |  sum(len($toks))::BIGINT AS nToks
         | FROM documents GROUP BY 1, 2),
         |t AS (SELECT sum(nChars) AS tc FROM a)
         |SELECT source, lang, nDocs, nChars, nToks,
         | round(nToks / nDocs::DOUBLE, 4) AS avgDocToks,
         | round(nChars / t.tc::DOUBLE, 4) AS charShare
         |FROM a, t""".stripMargin.replace("\n", " "),
    // temperature mixing: p_i ∝ n_i^0.5 over per-source char masses,
    // quota_i = min(1, 0.3·N·p_i/n_i) rounded to 6dp (pow/sum-order ulp
    // divergence can't flip a keep), keep iff hash-u < quota
    "q132_temperature_mix" ->
      s"""WITH n AS (SELECT source, sum(n_chars)::DOUBLE AS n
         |  FROM documents GROUP BY 1),
         |w AS (SELECT source, n, pow(n, 0.5) AS w FROM n),
         |t AS (SELECT sum(n) AS tn, sum(w) AS tw FROM w),
         |q AS (SELECT source,
         |  round(least(1.0, 0.3 * t.tn * (w.w / t.tw) / w.n), 6) AS quota
         | FROM w, t),
         |d AS (SELECT doc_id, source,
         |  ${h56("doc_id::VARCHAR")} / 72057594037927936.0 AS u
         | FROM documents)
         |SELECT d.doc_id, d.source, round(d.u, 4) AS u,
         | round(q.quota, 4) AS quota
         |FROM d JOIN q USING (source) WHERE d.u < q.quota"""
        .stripMargin.replace("\n", " "),
    // Batch replay of the streaming embedding near-dup: q60's md5
    // hyperplane buckets, then int8 quantization with the EXACT Scala
    // arithmetic (s = mx/127 computed first, q = floor(x/s + 0.5) — the
    // same op order; math.round(double) IS floor(x+0.5)); the quantized
    // cosine is integer sums (< 2^53, exact in doubles) and one division,
    // so every emitted pair and cos matches bit-for-bit before the 4dp
    // round. Pairs = all same-bucket pairs a<b with cos ≥ 0.3 (maxBucket
    // is set above any bucket size, so no order-dependent truncation).
    "q100_emb_neardup_stream" ->
      """WITH hp AS (SELECT p, list_transform(range(64), d ->
        |  CASE WHEN (('0x' || substr(md5('hp:' || p::VARCHAR || ':' || d::VARCHAR),
        |     1, 2))::INT % 2) = 1 THEN 1.0 ELSE -1.0 END) AS h
        | FROM range(8) t(p)),
        |bk AS (SELECT e.vec_id,
        |  sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], hp.h) >= 0
        |    THEN (1::BIGINT << hp.p) ELSE 0 END) AS bucket
        | FROM embeddings e CROSS JOIN hp GROUP BY 1),
        |ex AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |  greatest(1e-12, list_max(list_transform(embedding::DOUBLE[],
        |    y -> abs(y)))) AS mx
        | FROM embeddings),
        |qz AS (SELECT b.vec_id, b.bucket,
        |  list_transform(ex.v, x -> floor(x / (ex.mx / 127.0) + 0.5)) AS q
        | FROM bk b JOIN ex USING (vec_id)),
        |p AS (SELECT a.vec_id AS a, b.vec_id AS b,
        |  list_dot_product(a.q, b.q) AS dot,
        |  list_dot_product(a.q, a.q) AS na, list_dot_product(b.q, b.q) AS nb
        | FROM qz a JOIN qz b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
        |c AS (SELECT a, b, dot / (sqrt(na) * sqrt(nb)) AS cos
        | FROM p WHERE na > 0 AND nb > 0)
        |SELECT a, b, round(cos, 4) AS cos FROM c WHERE cos >= 0.3"""
        .stripMargin.replace("\n", " "),
    // Full SQL replay of the deterministic IVF: hash-ordered sample,
    // evenly spaced init, 10 unrolled Lloyd iterations (assignment metric
    // ‖c‖²−2·v·c via list_dot_product — the same sequential summation
    // order as the native vec_dot — and per-dimension avg re-centering
    // rounded to 5dp, which absorbs the engines' differing summation
    // order), then cell assignment, nProbe=2 probe selection, and
    // brute-force cosine top-10 within the probed cells.
    "q61_ann_ivf" ->
      s"""WITH $ivfCtes
         |SELECT qid, cid, round(cos, 4) AS cos, rank FROM r"""
        .stripMargin.replace("\n", " "),
    // recall@10 of the deterministic IVF (nProbe=2) against the exact
    // brute-force ground truth - the ANN-quality audit as a gated query
    "q480_split_leakage" ->
      s"""WITH $sigCte,
         |bands AS (SELECT doc_id, hashIdx // $BandSize AS band,
         |  array_to_string(list(minHash ORDER BY hashIdx), ':') AS bucket
         | FROM sig GROUP BY doc_id, band),
         |cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         | FROM bands l JOIN bands r ON l.band = r.band
         |  AND l.bucket = r.bucket
         | WHERE l.doc_id < r.doc_id),
         |sp AS (SELECT id, CASE
         |   WHEN rk <= floor(0.8::DOUBLE * n::DOUBLE)::BIGINT THEN 'train'
         |   WHEN rk <= floor((0.8::DOUBLE + 0.1::DOUBLE)
         |     * n::DOUBLE)::BIGINT THEN 'val'
         |   ELSE 'test' END AS split
         | FROM (SELECT doc_id AS id, row_number() OVER
         |    (PARTITION BY lang ORDER BY md5(doc_id::VARCHAR),
         |     doc_id)::BIGINT AS rk,
         |   count(*) OVER (PARTITION BY lang)::BIGINT AS n
         |  FROM documents)),
         |j AS (SELECT least(sa.split, sb.split) AS split_a,
         |  greatest(sa.split, sb.split) AS split_b
         | FROM cand JOIN sp sa ON sa.id = cand.a
         |  JOIN sp sb ON sb.id = cand.b)
         |SELECT split_a, split_b, count(*)::BIGINT AS pairs,
         | split_a <> split_b AS leaky
         |FROM j GROUP BY 1, 2""".stripMargin.replace("\n", " "),
    "q477_ann_recall" ->
      s"""WITH $ivfCtes,
         |bp AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |  list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
         |   (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
         |    * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS cos
         | FROM embeddings q, embeddings c
         | WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id),
         |br AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |   ORDER BY cos DESC, cid) AS brank FROM bp QUALIFY brank <= 10),
         |h AS (SELECT br.qid, count(r.cid)::BIGINT AS hits
         | FROM br LEFT JOIN r ON r.qid = br.qid AND r.cid = br.cid
         | GROUP BY 1)
         |SELECT qid, 10::BIGINT AS k, hits,
         | round(hits::DOUBLE / 10.0, 4) AS recall FROM h"""
        .stripMargin.replace("\n", " "),
    
    // Full SQL replay of the deterministic PQ: the q61 fixed-Lloyd
    // pattern per subspace (16-dim slices, 5 iterations, 5dp-rounded
    // recenter), per-subspace corpus encode via the same struct-argmin,
    // ADC distance = the 4 subspace terms summed left-to-right (matching
    // the Spark reduce), shortlist 50 by (adist, cid), exact cosine
    // top-10 re-rank. Shared fragments with the q98 IVF×PQ composition
    // live in pqCommonCtes / pqShortlistToResult below.
    "q97_ann_pq" ->
      s"""WITH $pqCommonCtes,
         |qs AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 20),
         |ad AS MATERIALIZED (SELECT q.qid, e0.cid, ${pqAdTerms("q.qv")} AS adist
         | FROM qs q CROSS JOIN e0 $pqEncJoins $pqCbJoins
         | WHERE q.qid <> e0.cid),
         |$pqShortlistToResult""".stripMargin.replace("\n", " "),
    // IVF × PQ at partial probe: the q61 coarse quantizer (10 fixed-Lloyd
    // iterations over the shared 4096-row md5 sample, full 64-dim) picks
    // each query's 2 nearest of 8 cells; the ADC scan then runs only over
    // code-table rows whose assigned cell is probed (an equi-join on
    // cell, not q97's cross join); shortlist + re-rank identical to q97.
    "q98_ann_ivfpq" ->
      s"""WITH $pqCommonCtes,
         |$pqCoarseCtes,
         |ad AS MATERIALIZED (SELECT p.qid, e0.cid, ${pqAdTerms("p.qv")} AS adist
         | FROM (SELECT qid, qv, cell FROM qd WHERE rk <= $PqNProbe) p
         | JOIN asg a ON a.cell = p.cell
         | JOIN e0 ON e0.cid = a.cid $pqEncJoins $pqCbJoins
         | WHERE p.qid <> e0.cid),
         |$pqShortlistToResult""".stripMargin.replace("\n", " "),
    // Residual IVF×PQ (FAISS by_residual): the q98 coarse quantizer, then
    // sub-codebooks trained on sample RESIDUALS (v − centroid(cell),
    // assignment = the same struct-argmin the Scala assignViaDot runs),
    // corpus codes on residuals, and per-probed-cell ADC terms carrying
    // the full ‖qres_j − c‖² (the per-cell constant must not drop — it
    // differs across probed cells).
    "q104_ann_ivfpq_residual" ->
      s"WITH $pqResidualAdCtes, $pqShortlistToResult",
    // range search over the residual index: same CTEs, but the output is
    // every probed-cell pair within the absolute ADC radius (meaningful
    // only for residual ADC, which carries no dropped per-query constant)
    "q105_ann_pq_range" ->
      (s"WITH $pqResidualAdCtes " +
        "SELECT qid, cid, round(adist, 4) AS adist FROM ad WHERE adist <= 1.4"),
    // SemDeDup: the q98 coarse quantizer assigns every vector a cell
    // (asg); within-cell pairs at cos ≥ 0.4 drop the member with the
    // HIGHER cosine to the cell centroid (ties drop the larger id) —
    // survivors with their centroid cosine
    "q109_semdedup" ->
      s"""WITH $pqSampleCtes,
         |$pqCoarseCtes,
         |wv AS MATERIALIZED (SELECT a.cid, a.cell, co.w
         | FROM asg a JOIN co ON co.cid = a.cid),
         |sc AS MATERIALIZED (SELECT wv.cid, wv.cell,
         |  list_dot_product(wv.w, c.cv) /
         |   (sqrt(list_dot_product(wv.w, wv.w)) * sqrt(list_dot_product(c.cv, c.cv))) AS simc
         | FROM wv JOIN cc$PqItersCoarse c ON c.cell = wv.cell),
         |pr AS (SELECT x.cid AS a, y.cid AS b
         | FROM wv x JOIN wv y ON x.cell = y.cell AND x.cid < y.cid
         | WHERE list_dot_product(x.w, y.w) /
         |   (sqrt(list_dot_product(x.w, x.w)) * sqrt(list_dot_product(y.w, y.w))) >= 0.4),
         |lo AS (SELECT DISTINCT CASE WHEN sa.simc > sb.simc THEN pr.a
         |   WHEN sb.simc > sa.simc THEN pr.b
         |   ELSE greatest(pr.a, pr.b) END AS cid
         | FROM pr JOIN sc sa ON sa.cid = pr.a JOIN sc sb ON sb.cid = pr.b)
         |SELECT sc.cid AS vec_id, sc.cell, round(sc.simc, 4) AS simc
         |FROM sc WHERE sc.cid NOT IN (SELECT cid FROM lo)"""
        .stripMargin.replace("\n", " "),
    // incremental ingest end-to-end: q130's snapshot classes pick the
    // fresh docs, the Gopher gate screens them, the q106 cross-corpus
    // band join flags near-dups of retained content
    "q135_incremental_ingest" ->
      s"""WITH $sigCte,
         |bands AS (SELECT doc_id, hashIdx // $BandSize AS band,
         |  array_to_string(list(minHash ORDER BY hashIdx), ':') AS bucket
         | FROM sig GROUP BY doc_id, band),
         |cls AS (SELECT doc_id,
         |  CASE WHEN doc_id % 5 = 4 THEN 'added'
         |   WHEN doc_id % 5 = 3 THEN 'changed' ELSE 'same' END AS status
         | FROM documents WHERE doc_id % 5 <> 0),
         |fresh AS (SELECT doc_id, status FROM cls WHERE status <> 'same'),
         |ret AS (SELECT doc_id FROM cls WHERE status = 'same'),
         |dup AS (SELECT DISTINCT f.doc_id
         | FROM bands nb JOIN fresh f ON f.doc_id = nb.doc_id
         | JOIN bands cb ON cb.band = nb.band AND cb.bucket = nb.bucket
         | JOIN ret r ON r.doc_id = cb.doc_id),
         |$gopherCte,
         |g AS (SELECT doc_id,
         |  (CASE WHEN nWords BETWEEN 50 AND 100000
         |   AND mwl BETWEEN 3.0 AND 10.0 AND symr <= 0.1
         |   AND bull <= 0.9 AND ell <= 0.3 AND alpha >= 0.8
         |   AND nStop >= 2 THEN 1 ELSE 0 END)::BIGINT AS qualityPass
         | FROM gm)
         |SELECT f.doc_id, f.status, g.qualityPass,
         | (d.doc_id IS NOT NULL)::BIGINT AS isDup,
         | (g.qualityPass = 1 AND d.doc_id IS NULL)::BIGINT AS admitted
         |FROM fresh f JOIN g USING (doc_id) LEFT JOIN dup d USING (doc_id)"""
        .stripMargin.replace("\n", " "),
    // cluster-balanced sampling: the q109 coarse quantizer's cell
    // assignment, then the 40 md5-smallest ids per cell
    "q134_cluster_sample" ->
      s"""WITH $pqSampleCtes,
         |$pqCoarseCtes,
         |r AS (SELECT a.cid, a.cell,
         |  row_number() OVER (PARTITION BY a.cell
         |    ORDER BY ${h56("a.cid::VARCHAR")}, a.cid) AS rk
         | FROM asg a)
         |SELECT cid AS vec_id, cell, rk::INT AS rk FROM r WHERE rk <= 40"""
        .stripMargin.replace("\n", " "),
    // DSIR: hashed uni+bigram buckets (56-bit md5 mod 512), Laplace
    // bucket multinomials for target (source = src0) vs raw (all docs),
    // per-doc Σ ln(p/q), Gumbel-top-100 with md5-derived noise
    "q110_dsir" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
         |f AS (SELECT doc_id, unnest(list_concat(t,
         |   CASE WHEN len(t) >= 2
         |    THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
         |    ELSE [] END)) AS gram FROM tk),
         |fb AS MATERIALIZED (SELECT doc_id, ${h56("gram")} % 512 AS b FROM f),
         |tg AS (SELECT fb.b FROM fb JOIN documents d USING (doc_id)
         |  WHERE d.source = 'src0'),
         |ct AS (SELECT b, count(*) AS ct FROM tg GROUP BY b),
         |nt AS (SELECT count(*) AS n FROM tg),
         |cr AS (SELECT b, count(*) AS cr FROM fb GROUP BY b),
         |nr AS (SELECT count(*) AS n FROM fb),
         |lr AS (SELECT cr.b,
         |  ln((coalesce(ct.ct, 0) + 1.0) / (nt.n + 512.0)) -
         |  ln((cr.cr + 1.0) / (nr.n + 512.0)) AS lr
         | FROM cr LEFT JOIN ct USING (b), nt, nr),
         |sc AS (SELECT fb.doc_id, count(*) AS nFeats, sum(lr.lr) AS logw
         | FROM fb JOIN lr USING (b) GROUP BY fb.doc_id),
         |al AS (SELECT d.doc_id, coalesce(sc.nFeats, 0)::BIGINT AS nFeats,
         |  coalesce(sc.logw, 0.0) AS logw
         | FROM documents d LEFT JOIN sc USING (doc_id)),
         |ky AS (SELECT *, logw - ln(-ln(
         |   ((${h56("'gum:' || doc_id::VARCHAR")}) + 0.5) / 72057594037927936.0)) AS gkey
         | FROM al),
         |rk AS (SELECT *, row_number() OVER (ORDER BY gkey DESC, doc_id) AS rank
         | FROM ky QUALIFY rank <= 100)
         |SELECT doc_id, nFeats, round(logw, 4) AS logw,
         | round(gkey, 4) AS gkey, rank FROM rk"""
        .stripMargin.replace("\n", " "),
    // cross-corpus SemDeDup: corpus-only md5 sample trains the coarse
    // quantizer (x-prefixed Lloyd chain, the q98 pattern); both sides
    // assign cells via the same argmin; batch×corpus pairs within cells
    "q114_semdedup_across" -> {
      def ld(a: String, b: String) = s"list_dot_product($a, $b)"
      val lloyd = (1 to 10).map { t =>
        s"""xa$t AS MATERIALIZED (SELECT s.rn, s.v,
           |  (min({'d': ${ld("c.cv", "c.cv")} - 2.0 * ${ld("s.v", "c.cv")}, 'c': c.cell})).c AS cell
           | FROM xsamp s CROSS JOIN xc${t - 1} c GROUP BY s.rn, s.v),
           |xg$t AS (SELECT a.cell, t.j, round(avg(a.v[t.j + 1]), 5) AS cx
           | FROM xa$t a CROSS JOIN (SELECT unnest(range(64)) AS j) t
           | GROUP BY a.cell, t.j),
           |xc$t AS MATERIALIZED (SELECT p.cell,
           |  CASE WHEN count(g.cx) = 0 THEN p.cv
           |   ELSE list(g.cx ORDER BY g.j) END AS cv
           | FROM xc${t - 1} p LEFT JOIN xg$t g USING (cell)
           | GROUP BY p.cell, p.cv)""".stripMargin
      }.mkString(", ")
      s"""WITH xe AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  (${h56("vec_id::VARCHAR")} % 5) = 0 AS isBatch FROM embeddings),
         |xs0 AS (SELECT v, md5(vec_id::VARCHAR) AS h FROM xe WHERE NOT isBatch
         |  ORDER BY h, v LIMIT 4096),
         |xsamp AS MATERIALIZED (SELECT v, row_number() OVER (ORDER BY h, v) AS rn FROM xs0),
         |xsn AS (SELECT count(*) AS n FROM xsamp),
         |xc0 AS (SELECT t.i AS cell, s.v AS cv
         | FROM (SELECT unnest(range(8)) AS i) t, xsn
         | JOIN xsamp s ON s.rn = (t.i * xsn.n) // 8 + 1),
         |$lloyd,
         |xasg AS MATERIALIZED (SELECT xe.vec_id, xe.isBatch, xe.v,
         |  (min({'d': ${ld("c.cv", "c.cv")} - 2.0 * ${ld("xe.v", "c.cv")}, 'c': c.cell})).c AS cell
         | FROM xe CROSS JOIN xc10 c GROUP BY xe.vec_id, xe.isBatch, xe.v),
         |pr AS (SELECT * FROM (SELECT b.vec_id AS bid, c.vec_id AS cid,
         |  ${ld("b.v", "c.v")} /
         |   (sqrt(${ld("b.v", "b.v")}) * sqrt(${ld("c.v", "c.v")})) AS cos
         | FROM xasg b JOIN xasg c ON b.cell = c.cell
         | WHERE b.isBatch AND NOT c.isBatch) WHERE cos >= 0.4),
         |hits AS (SELECT bid, count(*) AS nDups,
         |  max({'c': cos, 'ni': -cid}) AS best FROM pr GROUP BY bid)
         |SELECT a.vec_id, a.cell::BIGINT AS cell,
         | coalesce(h.nDups, 0)::BIGINT AS nDups,
         | -((h.best).ni) AS matchId, round((h.best).c, 4) AS matchCos
         |FROM xasg a LEFT JOIN hits h ON h.bid = a.vec_id WHERE a.isBatch"""
        .stripMargin.replace("\n", " ")
    },
    // heavy hitters: the Misra-Gries phase is cost-only, so the oracle
    // is the exact definition
    "q111_heavy_grams" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
         |f AS (SELECT unnest(CASE WHEN len(t) >= 2
         |   THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
         |   ELSE [] END) AS gram FROM tk)
         |SELECT gram, count(*)::BIGINT AS cnt FROM f
         |GROUP BY gram HAVING count(*) >= 30"""
        .stripMargin.replace("\n", " "),
    // stream twin: exact under no-eviction, err bound surfaces as 0
    "q151_heavy_stream" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
         |f AS (SELECT unnest(CASE WHEN len(t) >= 2
         |   THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
         |   ELSE [] END) AS gram FROM tk)
         |SELECT gram, count(*)::BIGINT AS cnt, 0::BIGINT AS maxErr FROM f
         |GROUP BY gram HAVING count(*) >= 30"""
        .stripMargin.replace("\n", " "),
    // MMR: the greedy recurrence as a recursive CTE — one pick per
    // iteration, selected ids+vectors carried in list columns, argmax via
    // row_number inside the recursive member (DuckDB allows it)
    "q140_mmr_select" -> {
      val lam = MmrLam.toString
      val mu = (1 - MmrLam).toString
      val cosSql = (a: String, b: String) =>
        s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"
      val mmrExpr =
        s"""$lam * c.rel - $mu * coalesce(list_max(list_transform(s.vecs,
           |  sv -> ${cosSql("c.v", "sv")})), 0.0)""".stripMargin
      s"""WITH RECURSIVE q AS (SELECT embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id = 0),
         |short AS (SELECT c.vec_id AS id, c.embedding::DOUBLE[] AS v,
         |   ${cosSql("c.embedding::DOUBLE[]", "q.qv")} AS rel
         | FROM embeddings c, q WHERE c.vec_id <> 0
         | ORDER BY rel DESC, id LIMIT 64),
         |sel AS (
         | SELECT 0::BIGINT AS rank, []::BIGINT[] AS ids,
         |   []::DOUBLE[][] AS vecs, 0.0::DOUBLE AS rel, 0.0::DOUBLE AS mmr,
         |   0::BIGINT AS lastId
         | UNION ALL
         | SELECT rank, ids, vecs, rel, mmr, lastId FROM (
         |  SELECT s.rank + 1 AS rank, list_append(s.ids, c.id) AS ids,
         |    list_append(s.vecs, c.v) AS vecs, c.rel AS rel,
         |    $mmrExpr AS mmr, c.id AS lastId,
         |    row_number() OVER (ORDER BY $mmrExpr DESC, c.id) AS rn
         |  FROM sel s JOIN short c ON NOT list_contains(s.ids, c.id)
         |  WHERE s.rank < 10
         | ) WHERE rn = 1)
         |SELECT rank, lastId AS id, round(rel, 4) AS rel,
         | round(mmr, 4) AS mmr
         |FROM sel WHERE rank > 0""".stripMargin.replace("\n", " ")
    },
    "q59_ann_topk" ->
      """WITH p AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
        |  list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
        |   (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
        |    * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS cos
        | FROM embeddings q, embeddings c
        | WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
        | FROM p QUALIFY rank <= 10)
        |SELECT qid, cid, round(cos,4) AS cos, rank FROM r"""
        .stripMargin.replace("\n", " "),
    // centroid-form silhouette; centroids frozen at 6dp (matches the Spark
    // driver-side rint(c·1e6)/1e6) and distances use the same expanded
    // ‖v‖²−2v·c+‖c‖² form with the same max(0,·) guard
    "q152_silhouette" ->
      """WITH pos AS (SELECT label, generate_subscripts(embedding, 1) AS i,
        |  unnest(embedding::DOUBLE[]) AS x FROM embeddings),
        |cent AS (SELECT label AS cl, i, round(avg(x), 6) AS c
        | FROM pos GROUP BY 1, 2),
        |cvec AS (SELECT cl, list(c ORDER BY i) AS cv FROM cent GROUP BY 1),
        |d AS (SELECT e.vec_id, e.label, v.cl,
        |  sqrt(greatest(0.0,
        |    list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
        |    - 2.0 * list_dot_product(e.embedding::DOUBLE[], v.cv)
        |    + list_dot_product(v.cv, v.cv))) AS dist
        | FROM embeddings e CROSS JOIN cvec v),
        |ab AS (SELECT vec_id, label,
        |  min(CASE WHEN cl = label THEN dist END) AS a,
        |  min(CASE WHEN cl <> label THEN dist END) AS b
        | FROM d GROUP BY 1, 2)
        |SELECT label, count(*) AS n,
        | round(avg((b - a) / greatest(a, b)), 4) AS sil
        |FROM ab GROUP BY label"""
        .stripMargin.replace("\n", " "),
    "q153_source_overlap" ->
      s"""WITH tk AS (SELECT source, $toks AS t FROM documents),
         |g AS (SELECT DISTINCT source, unnest(CASE WHEN len(t) >= 3
         |  THEN list_transform(range(1, len(t) - 1),
         |    i -> array_to_string(t[i : i+2], ' '))
         |  ELSE [] END) AS gram FROM tk),
         |sz AS (SELECT source, count(*) AS sz FROM g GROUP BY 1),
         |inter AS (SELECT a.source AS src_a, b.source AS src_b,
         |  count(*) AS inter
         | FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
         | GROUP BY 1, 2)
         |SELECT i.src_a, i.src_b, i.inter,
         | round(i.inter::DOUBLE / (sa.sz + sb.sz - i.inter), 4) AS jaccard
         |FROM inter i
         | JOIN sz sa ON sa.source = i.src_a
         | JOIN sz sb ON sb.source = i.src_b"""
        .stripMargin.replace("\n", " "),
    "q159_overlap_sketch" ->
      s"""WITH tk AS (SELECT source, $toks AS t FROM documents),
         |g AS (SELECT DISTINCT source, unnest(CASE WHEN len(t) >= 3
         |  THEN list_transform(range(1, len(t) - 1),
         |    i -> array_to_string(t[i : i+2], ' '))
         |  ELSE [] END) AS gram FROM tk),
         |hh AS (SELECT DISTINCT source,
         |  ('0x'||substr(md5(gram),1,14))::BIGINT AS h FROM g),
         |r AS (SELECT source, h,
         |  row_number() OVER (PARTITION BY source ORDER BY h) AS rnk FROM hh),
         |sk AS (SELECT source, h FROM r WHERE rnk <= 256),
         |srcs AS (SELECT DISTINCT source FROM sk),
         |pairs AS (SELECT a.source AS src_a, b.source AS src_b
         | FROM srcs a JOIN srcs b ON a.source < b.source),
         |pu AS (SELECT p.src_a, p.src_b, s.h,
         |  max(CASE WHEN s.source = p.src_a THEN 1 ELSE 0 END) AS inA,
         |  max(CASE WHEN s.source = p.src_b THEN 1 ELSE 0 END) AS inB
         | FROM pairs p JOIN sk s ON s.source IN (p.src_a, p.src_b)
         | GROUP BY 1, 2, 3),
         |ru AS (SELECT *, row_number() OVER
         |  (PARTITION BY src_a, src_b ORDER BY h) AS rnk FROM pu)
         |SELECT src_a, src_b, count(*) AS u_size,
         | round(sum(inA*inB)::DOUBLE / count(*), 4) AS est_jaccard
         |FROM ru WHERE rnk <= 256 GROUP BY 1, 2"""
        .stripMargin.replace("\n", " "),
    "q154_source_signature" ->
      s"""WITH c AS (SELECT source AS grp, unnest($toks) AS tok
         | FROM documents),
         |cnt AS (SELECT grp, tok, count(*) AS cnt FROM c GROUP BY 1, 2),
         |gt AS (SELECT grp, sum(cnt) AS gt FROM cnt GROUP BY 1),
         |tt AS (SELECT tok, sum(cnt) AS tt FROM cnt GROUP BY 1),
         |tot AS (SELECT sum(cnt)::DOUBLE AS total FROM cnt),
         |l AS (SELECT cnt.grp, cnt.tok, cnt.cnt,
         |  (cnt.cnt::DOUBLE / gt.gt) / (tt.tt / tot.total) AS lift
         | FROM cnt JOIN gt USING (grp) JOIN tt USING (tok) CROSS JOIN tot
         | WHERE cnt.cnt >= 20),
         |r AS (SELECT *, row_number() OVER
         |  (PARTITION BY grp ORDER BY lift DESC, tok) AS rank
         | FROM l QUALIFY rank <= 10)
         |SELECT grp, tok, cnt, round(lift, 4) AS lift, rank FROM r"""
        .stripMargin.replace("\n", " "),
  ) ++ nbOracles ++ unimaxOracle
}
