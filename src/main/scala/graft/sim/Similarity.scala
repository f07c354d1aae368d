package graft.sim

import graft.core.LocalKMeans
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.Random

/** Similarity search over embedding columns (north-star extension):
  * brute-force cosine top-k as the exact baseline, random-hyperplane LSH
  * bucketing and IVF (KMeans-partitioned) as the 100 TB scale paths —
  * candidates materialize per bucket/cell instead of all-pairs. */
object Similarity {

  /** Cosine similarity of two float-array columns in double precision
    * (dot/(‖a‖·‖b‖), sequential sums — matches the DuckDB oracle
    * bit-for-bit). Interpreted-HOF fallback; prefer [[cosineFast]]. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Same math through the codegen'd native expression
    * [[graft.expr.VecDot]] — identical summation order, whole-stage
    * codegen loop instead of an interpreted lambda per element. */
  /** Validated double projection for every vector entry point: one
    * `vec_validate` pass per ROW (null element → NULL vector, the HOF
    * contract) whose output type is `ArrayType(DoubleType, containsNull
    * = false)` — so every downstream VecDot/VecEuclid in the pair/cell
    * join loops emits the branch-free kernel instead of re-scanning both
    * operands per PAIR (parquet list elements are declared nullable even
    * when no null ever occurs; measured ~15% on the ANN family). */
  private def vdbl(c: Column): Column = {
    graft.expr.GraftFunctions.register(org.apache.spark.sql.SparkSession.active)
    call_function("vec_validate", c)
  }

  def cosineFast(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column = {
    graft.expr.GraftFunctions.register(spark)
    // asDoubles inside the kernel registration casts float arrays and
    // preserves containsNull, so pre-validated operands keep the
    // branch-free loop and raw operands still behave as before
    def dot(x: Column, y: Column): Column = call_function("vec_dot", x, y)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact brute-force top-k by cosine for each query vector. Queries are
    * broadcast (small), corpus streams — one pass, no shuffle on the
    * corpus beyond the final per-query top-k. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), vdbl(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("cid"), vdbl(col(vecCol)).as("cv"))
    val scored = broadcast(q).join(c, col("qid") =!= col("cid"))
      .withColumn("cos", cosineFast(queries.sparkSession, col("qv"), col("cv")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("qid", "cid", "cos", "rank")
  }

  /** Hard-negative mining for contrastive/retrieval training (the
    * in-batch-negatives upgrade of DPR, Karpukhin et al. EMNLP'20;
    * ANCE's "hard" band): for each anchor, the top-k corpus vectors by
    * cosine INSIDE the band [loCos, hiCos) — similar enough to be
    * informative gradients, below the near-dup ceiling that would make
    * them false negatives — excluding the anchor itself and any
    * (anchor, positive) pairs supplied. Engine addition: the mining
    * face of the ANN family (same scan shape as [[bruteForceTopK]];
    * swap in the IVF probed-cell join at corpus scale).
    *
    * Determinism: cosines are the sequential-sum kernel both engines
    * replay bit-identically; rank orders by (cos desc, id asc).
    * Scale: anchors broadcast, corpus streams once; the rank window
    * partitions per anchor. Output: qid, cid, cos, rank. */
  def hardNegatives(anchors: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, loCos: Double, hiCos: Double,
      positives: Option[DataFrame] = None): DataFrame = {
    require(loCos < hiCos, s"loCos < hiCos: $loCos, $hiCos")
    val q = anchors.select(col(idCol).as("qid"), vdbl(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("cid"), vdbl(col(vecCol)).as("cv"))
    val scored = broadcast(q).join(c, col("qid") =!= col("cid"))
      .withColumn("cos", cosineFast(anchors.sparkSession, col("qv"), col("cv")))
      .where(col("cos") >= loCos && col("cos") < hiCos)
    val survived = positives.fold(scored)(p =>
      scored.join(broadcast(p.toDF("qid", "cid")), Seq("qid", "cid"),
        "left_anti"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    survived.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("qid", "cid", "cos", "rank")
  }

  /** All near-duplicate pairs with cosine ≥ threshold (exact, quadratic —
    * the oracle baseline; use `lshNearDup` at scale). */
  def cosineNearDup(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = vecs.select(col(idCol).as("a"), vdbl(col(vecCol)).as("va"))
    val b = vecs.select(col(idCol).as("b"), vdbl(col(vecCol)).as("vb"))
    a.join(b, col("a") < col("b"))
      .withColumn("cos", cosineFast(vecs.sparkSession, col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select("a", "b", "cos")
  }

  /** Random-hyperplane LSH signature: `planes` sign bits of dot products
    * with seeded Gaussian hyperplanes → one integer bucket per vector.
    * Collision probability = (1 − θ/π)^planes. */
  def lshBuckets(vecs: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int, seed: Long): DataFrame = {
    val rng = new Random(seed)
    lshBucketsWith(vecs, idCol, vecCol, Array.fill(planes, dim)(rng.nextGaussian()))
  }

  /** Deterministic ±1 hyperplanes derived from md5 — the database-friendly
    * random projection entries of Achlioptas (2003, "Database-friendly
    * random projections"): sign-LSH needs only a symmetric entry
    * distribution, and hash-derived Rademacher entries reproduce exactly
    * in any engine with md5 (the same device the text minhash path uses),
    * so the whole LSH pipeline carries a cross-engine oracle instead of a
    * seeded-RNG rows-only check. Entry (p,d) = +1 iff the first digest
    * byte of md5("hp:p:d") is odd. */
  def hashHyperplanes(planes: Int, dim: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dim) { (p, d) =>
      if ((md.digest(s"hp:$p:$d".getBytes("UTF-8"))(0) & 1) == 1) 1.0 else -1.0
    }
  }

  /** Sign-LSH bucket column over `hp` hyperplanes: one codegen'd vec_dot
    * per hyperplane (literal array), not dim element_at terms per plane. */
  def bucketColumn(spark: org.apache.spark.sql.SparkSession, vecCol: Column,
      hp: Array[Array[Double]]): Column = {
    graft.expr.GraftFunctions.register(spark)
    hp.indices.map { p =>
      val d = call_function("vec_dot", vecCol, array(hp(p).map(lit(_)): _*))
      when(d >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  private def lshBucketsWith(vecs: DataFrame, idCol: String, vecCol: String,
      hp: Array[Array[Double]]): DataFrame =
    vecs.select(col(idCol), col(vecCol),
      bucketColumn(vecs.sparkSession, col(vecCol), hp).as("bucket"))

  /** Approximate near-dup via LSH: exact cosine only within buckets. */
  def lshNearDup(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
      planes: Int, seed: Long, threshold: Double): DataFrame =
    lshNearDupOn(vecs, idCol, vecCol,
      lshBuckets(vecs, idCol, vecCol, dim, planes, seed), threshold)

  /** [[lshNearDup]] with [[hashHyperplanes]] — bit-reproducible across
    * engines and runs (no RNG state to ship), hence oracle-checkable. */
  def lshNearDupHashed(vecs: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int, threshold: Double): DataFrame =
    lshNearDupOn(vecs, idCol, vecCol,
      lshBucketsWith(vecs, idCol, vecCol, hashHyperplanes(planes, dim)), threshold)

  private def lshNearDupOn(vecs: DataFrame, idCol: String, vecCol: String,
      buckets: DataFrame, threshold: Double): DataFrame = {
    val l = buckets.select(col("bucket"), col(idCol).as("a"), vdbl(col(vecCol)).as("va"))
    val r = buckets.select(col("bucket"), col(idCol).as("b"), vdbl(col(vecCol)).as("vb"))
    l.join(r, Seq("bucket")).where(col("a") < col("b"))
      .withColumn("cos", cosineFast(vecs.sparkSession, col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select("a", "b", "cos")
  }

  /** Symmetric int8 scalar quantization of an embedding column — the
    * storage/bandwidth scale path (4× smaller than float32, 8× smaller
    * than the double arrays Spark exchanges). Per-vector scale =
    * max|x|/127; `qvec` holds round(x/scale) in [-127, 127]. Cosine
    * ordering is preserved to quantization error (recall@k spec-checked).
    * Output: idCol, scale, qvec. */
  def quantizeInt8(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val vd = vdbl(col(vecCol))
    val mx = greatest(array_max(vd), -array_min(vd), lit(1e-12))
    vecs.select(col(idCol),
      (mx / 127.0).as("scale"),
      transform(vd, x => round(x / (mx / 127.0)).cast("tinyint")).as("qvec"))
  }

  /** Reconstruct approximate double vectors from an int8 quantization. */
  def dequantizeInt8(q: DataFrame, idCol: String): DataFrame =
    q.select(col(idCol),
      transform(col("qvec"), x => x.cast("double") * col("scale")).as("vec"))

  /** IVF index: KMeans-partition the corpus into `nCells` cells; search
    * probes only the `nProbe` nearest cells per query.
    *
    * The coarse quantizer is [[graft.core.LocalKMeans]] on a driver-side
    * corpus sample (how FAISS trains IVF at scale) — no iterative
    * distributed fit. Cell assignment and probe selection both reduce to
    * ‖x−c‖² = ‖x‖² − 2x·c + ‖c‖², evaluated per centroid with the
    * codegen'd `vec_dot` against literal centroid arrays; the row-constant
    * ‖x‖² term cancels in the argmin/ordering and is dropped. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, dim: Int, nCells: Int, nProbe: Int, k: Int, seed: Long,
      sampleFraction: Double = 1.0, maxSample: Int = 20000): DataFrame = {
    val c = corpus.select(col(idCol).as("cid"),
      vdbl(col(vecCol)).as("cv"))
    val pts = LocalKMeans.sampleVectors(c, "cv", maxSample, sampleFraction, seed)
    ivfTopKWith(queries, corpus, idCol, vecCol,
      LocalKMeans.fit(pts, nCells, seed), nProbe, k)
  }

  /** [[ivfTopK]] over a deterministic coarse quantizer: md5-of-id ordered
    * sample + fixed-iteration Lloyd with 5dp-rounded centroids
    * ([[LocalKMeans.fitFixed]], `viaDot` — the same ‖c‖²−2·v·c assignment
    * expression the scorer evaluates). No RNG state anywhere, so the whole
    * index build + search replays in SQL (the q61 oracle). */
  def ivfTopKDeterministic(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int, nCells: Int, nProbe: Int,
      k: Int, iters: Int = 10, maxSample: Int = 20000): DataFrame = {
    val c = corpus.select(col(idCol).as("cid"),
      vdbl(col(vecCol)).as("cv"))
    val pts = LocalKMeans.sampleVectorsHashed(c, "cv", Seq("cid"), maxSample)
    ivfTopKWith(queries, corpus, idCol, vecCol,
      LocalKMeans.fitFixed(pts, nCells, iters, viaDot = true), nProbe, k)
  }

  /** Product-quantization ANN (Jégou/Douze/Schmid, "Product Quantization
    * for Nearest Neighbor Search", PAMI 2011) — the compute/memory scale
    * path: vectors quantize to `m` sub-codebook codes (m small ints at
    * kCodes ≤ 256 — 32× smaller than float32 at d=64, m=8), queries scan
    * the codes with asymmetric distance (ADC: per-query lookup tables of
    * sub-distances, `m` array lookups per candidate instead of a d-dim
    * dot product), and only the `shortlist` ADC-nearest candidates are
    * re-ranked with exact cosine on the full vectors (the FAISS refine
    * step). At cluster scale the code table is what shuffles/broadcasts —
    * the full embedding column is touched only for the shortlist.
    *
    * Codebooks are md5-ordered-sample + fixed-Lloyd per subspace
    * ([[graft.core.LocalKMeans.fitFixed]], 5dp-rounded centroids, the
    * ‖c‖²−2v·c assignment metric) — no RNG anywhere, so index build,
    * ADC scan and re-rank all replay in SQL (the q97 oracle).
    * Output: qid, cid, cos, rank. */
  def pqTopKDeterministic(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int, m: Int, kCodes: Int, k: Int,
      shortlist: Int = 50, iters: Int = 5, maxSample: Int = 20000): DataFrame =
    pqSearchDeterministic(queries,
      pqBuildDeterministic(corpus, idCol, vecCol, dim, m, kCodes, iters, maxSample),
      corpus, idCol, vecCol, k, shortlist)

  /** A built PQ index: the per-subspace codebooks (m × kCodes × sub
    * doubles — driver-sized) and the encoded corpus code table (`cid` +
    * m small ints — the only thing the ADC scan reads). At cluster scale
    * the build amortizes across every query batch: persist/write `codes`
    * once, then [[pqSearchDeterministic]] per batch. */
  case class PqIndex(m: Int, sub: Int, kCodes: Int,
      books: Array[Array[Array[Double]]], codes: DataFrame)

  /** Index-build half of [[pqTopKDeterministic]]: train the m fixed-Lloyd
    * sub-codebooks on one md5-ordered sample and encode the corpus. */
  def pqBuildDeterministic(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, kCodes: Int, iters: Int = 5,
      maxSample: Int = 20000): PqIndex = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    val sub = dim / m
    val c = corpus.select(col(idCol).as("cid"),
      vdbl(col(vecCol)).as("cv"))
    // one md5-ordered sample of full vectors; per-subspace slices of the
    // same rows (md5 of the unique id is a total order, so every
    // subspace's codebook trains on the identical sample rows)
    val pts = LocalKMeans.sampleVectorsHashed(c, "cv", Seq("cid"), maxSample)
    val books = Array.tabulate(m)(j =>
      LocalKMeans.fitFixed(pts.map(_.slice(j * sub, (j + 1) * sub)),
        kCodes, iters, viaDot = true))
    val ccs = books.map(_.map(ct => LocalKMeans.dotSeq(ct, ct)))
    // encode the corpus: per subspace, codegen'd vec_nearest argmin over
    // the codebook (the struct-argmin form is m × kCodes inline dots —
    // interpreted-fallback territory at kCodes ≥ 64)
    val enc0 = (0 until m).foldLeft(c)((df, j) =>
      df.withColumn(s"sub$j", slice(col("cv"), j * sub + 1, sub)))
    val enc = (0 until m).foldLeft(enc0)((df, j) =>
        df.withColumn(s"code$j", graft.expr.GraftFunctions.vecNearest(
          corpus.sparkSession, col(s"sub$j"), books(j), ccs(j))))
      .select(col("cid") +: (0 until m).map(j => col(s"code$j")): _*)
    PqIndex(m, sub, kCodes, books, enc)
  }

  /** Search half of [[pqTopKDeterministic]]: ADC scan of the prebuilt
    * code table + exact cosine re-rank of the shortlist against the full
    * corpus vectors. `corpus` is only touched for the shortlist rows. */
  def pqSearchDeterministic(queries: DataFrame, index: PqIndex,
      corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      shortlist: Int = 50): DataFrame = {
    val spark = corpus.sparkSession
    graft.expr.GraftFunctions.register(spark)
    import index.{m, sub, kCodes, books}
    val ccs = books.map(_.map(ct => LocalKMeans.dotSeq(ct, ct)))
    // ‖x−c_{j,i}‖² − ‖x‖² (row-constant term dropped: per-row argmin and
    // per-query ordering are unchanged)
    def relD2(v: Column, j: Int, i: Int): Column =
      lit(ccs(j)(i)) - lit(2.0) * call_function("vec_dot", v,
        array(books(j)(i).map(lit(_)): _*))
    val c = corpus.select(col(idCol).as("cid"),
      vdbl(col(vecCol)).as("cv"))
    // per-query ADC tables, built once per query row before the scan
    val q0 = queries.select(col(idCol).as("qid"),
      vdbl(col(vecCol)).as("qv"))
    val q1 = (0 until m).foldLeft(q0)((df, j) =>
      df.withColumn(s"dtab$j", array((0 until kCodes).map(i =>
        relD2(slice(col("qv"), j * sub + 1, sub), j, i)): _*)))
    // ADC scan: m table lookups per candidate, summed in subspace order.
    // Only (qid, cid, adist) flows into the shortlist window — selecting
    // qv after the window would drag the full query vector through the
    // n_q × n_corpus shuffle (measured 4× on the scan at sf0.1)
    val adist = (0 until m).map(j =>
      element_at(col(s"dtab$j"), col(s"code$j") + 1)).reduce(_ + _)
    val wA = Window.partitionBy("qid").orderBy(col("adist"), col("cid"))
    val short = broadcast(q1.drop("qv")).join(index.codes, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), adist.as("adist"))
      .withColumn("ark", row_number().over(wA))
      .where(col("ark") <= shortlist)
      .select("qid", "cid")
    // exact cosine re-rank of the shortlist only (query vectors re-joined
    // from the tiny query table)
    val rer = short.join(broadcast(q0), "qid").join(c, "cid")
      .withColumn("cos", cosineFast(spark, col("qv"), col("cv")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    rer.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("qid", "cid", "cos", "rank")
  }

  /** IVF × PQ composition (FAISS's IVFPQ with by_residual=false): the
    * coarse quantizer bounds the candidate set to `nProbe` cells and PQ
    * codes carry the ADC scan inside them — the scan becomes a cell
    * equi-join on the code table instead of [[pqTopKDeterministic]]'s
    * query × corpus cross join, and the full vectors are still only read
    * for the exact re-rank of the shortlist. With nProbe = nCells the
    * candidate set is the whole corpus and the output is exactly
    * [[pqTopKDeterministic]] (spec-pinned composition identity).
    * Deterministic throughout (same md5 sample trains coarse + sub
    * codebooks). Output: qid, cid, cos, rank. */
  def ivfPqTopKDeterministic(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int, nCells: Int, nProbe: Int,
      m: Int, kCodes: Int, k: Int, shortlist: Int = 50,
      itersCoarse: Int = 10, itersPq: Int = 5,
      maxSample: Int = 4096): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val spark = corpus.sparkSession
    graft.expr.GraftFunctions.register(spark)
    val sub = dim / m
    val c = corpus.select(col(idCol).as("cid"),
      vdbl(col(vecCol)).as("cv"))
    val pts = LocalKMeans.sampleVectorsHashed(c, "cv", Seq("cid"), maxSample)
    val coarse = LocalKMeans.fitFixed(pts, nCells, itersCoarse, viaDot = true)
    val coarseCC = coarse.map(ct => LocalKMeans.dotSeq(ct, ct))
    val books = Array.tabulate(m)(j =>
      LocalKMeans.fitFixed(pts.map(_.slice(j * sub, (j + 1) * sub)),
        kCodes, itersPq, viaDot = true))
    val ccs = books.map(_.map(ct => LocalKMeans.dotSeq(ct, ct)))
    def relD2(v: Column, j: Int, i: Int): Column =
      lit(ccs(j)(i)) - lit(2.0) * call_function("vec_dot", v,
        array(books(j)(i).map(lit(_)): _*))
    def cellD2(v: Column, ci: Int): Column =
      lit(coarseCC(ci)) - lit(2.0) * call_function("vec_dot", v,
        array(coarse(ci).map(lit(_)): _*))
    // one pass over the corpus: coarse cell + m sub-codes, both through
    // the codegen'd vec_nearest loop (corpus-side hot path)
    val enc0 = (0 until m).foldLeft(
      c.withColumn("cell", graft.expr.GraftFunctions.vecNearest(
          spark, col("cv"), coarse, coarseCC)))(
      (df, j) => df.withColumn(s"sub$j", slice(col("cv"), j * sub + 1, sub)))
    val enc = (0 until m).foldLeft(enc0)((df, j) =>
        df.withColumn(s"code$j", graft.expr.GraftFunctions.vecNearest(
          spark, col(s"sub$j"), books(j), ccs(j))))
      .select(col("cid") +: col("cell") +: (0 until m).map(j => col(s"code$j")): _*)
    // query side: probed cells + ADC tables
    val q0 = queries.select(col(idCol).as("qid"),
      vdbl(col(vecCol)).as("qv"))
    val q1 = (0 until m).foldLeft(
      q0.withColumn("cells", slice(array_sort(array(coarse.indices.map(ci =>
        struct(cellD2(col("qv"), ci).as("d"), lit(ci).as("cell"))): _*)),
        1, nProbe)))(
      (df, j) => df.withColumn(s"dtab$j", array((0 until kCodes).map(i =>
        relD2(slice(col("qv"), j * sub + 1, sub), j, i)): _*)))
    val probed = q1.select(col("qid") +:
        explode(col("cells.cell")).as("cell") +:
        (0 until m).map(j => col(s"dtab$j")): _*)
    val adist = (0 until m).map(j =>
      element_at(col(s"dtab$j"), col(s"code$j") + 1)).reduce(_ + _)
    val wA = Window.partitionBy("qid").orderBy(col("adist"), col("cid"))
    // broadcast the probed side (queries × nProbe rows): the join key has
    // only nCells distinct values, so a shuffled join would cap the scan's
    // parallelism at nCells and skew on hot cells — broadcasting keeps the
    // code-table scan partition-parallel with zero corpus movement
    val short = broadcast(probed).join(enc, Seq("cell"))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), adist.as("adist"))
      .withColumn("ark", row_number().over(wA))
      .where(col("ark") <= shortlist)
      .select("qid", "cid")
    val rer = short.join(broadcast(q0), "qid").join(c, "cid")
      .withColumn("cos", cosineFast(spark, col("qv"), col("cv")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    rer.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("qid", "cid", "cos", "rank")
  }

  /** IVF × PQ with RESIDUAL encoding (FAISS's by_residual=true, the
    * production default there): sub-codebooks train on r = v −
    * centroid(cell(v)) pooled across cells, corpus codes encode
    * residuals, and each query builds its ADC terms per probed cell from
    * (q − centroid). Residuals have far less variance than raw vectors
    * on clustered data, so the same m × kCodes budget quantizes much
    * finer (spec-measured recall win vs [[ivfPqTopKDeterministic]]).
    * Same scan shape: probed-cell equi-join over the code table, exact
    * cosine re-rank of the shortlist. Deterministic end-to-end — the
    * sample's cell assignment uses [[LocalKMeans.assignViaDot]], the
    * exact arithmetic of the SQL struct-argmin — so the whole index
    * build + search replays in SQL (the q104 oracle).
    * Output: qid, cid, cos, rank. */
  /** A built residual IVF×PQ index: coarse centroids, per-subspace
    * residual codebooks, and the encoded corpus (`cid`, `cell`, m codes). */
  case class IvfPqResidualIndex(dim: Int, m: Int, sub: Int, kCodes: Int,
      coarse: Array[Array[Double]], books: Array[Array[Array[Double]]],
      codes: DataFrame)

  /** Index-build half of [[ivfPqResidualTopKDeterministic]]: coarse
    * fixed-Lloyd quantizer, residual sub-codebooks (sample assignment via
    * [[LocalKMeans.assignViaDot]] — the exact arithmetic of the SQL
    * struct-argmin), one corpus pass for cell + residual codes. */
  def ivfPqResidualBuild(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, nCells: Int, m: Int, kCodes: Int, itersCoarse: Int = 10,
      itersPq: Int = 5, maxSample: Int = 4096): IvfPqResidualIndex = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    val sub = dim / m
    val c = corpus.select(col(idCol).as("cid"),
      vdbl(col(vecCol)).as("cv"))
    val pts = LocalKMeans.sampleVectorsHashed(c, "cv", Seq("cid"), maxSample)
    val coarse = LocalKMeans.fitFixed(pts, nCells, itersCoarse, viaDot = true)
    // residual sample: assign each sample row to its cell (the same
    // viaDot argmin arithmetic the SQL evaluates), subtract the centroid
    val rpts = pts.map { p =>
      val cell = LocalKMeans.assignViaDot(p, coarse)
      Array.tabulate(p.length)(i => p(i) - coarse(cell)(i))
    }
    val books = Array.tabulate(m)(j =>
      LocalKMeans.fitFixed(rpts.map(_.slice(j * sub, (j + 1) * sub)),
        kCodes, itersPq, viaDot = true))
    val ccs = books.map(_.map(ct => LocalKMeans.dotSeq(ct, ct)))
    val coarseCC = coarse.map(ct => LocalKMeans.dotSeq(ct, ct))
    val centLit = typedlit(coarse.map(_.toSeq).toSeq)
    // one pass over the corpus: coarse cell, then per-subspace codes of
    // the residual against that cell's centroid
    val enc0 = c.withColumn("cell",
        graft.expr.GraftFunctions.vecNearest(corpus.sparkSession, col("cv"),
          coarse, coarseCC))
      .withColumn("cent", element_at(centLit, col("cell") + 1))
    def resSub(vec: Column, cent: Column, j: Int): Column =
      zip_with(slice(vec, j * sub + 1, sub), slice(cent, j * sub + 1, sub),
        (a, b) => a - b)
    val enc = (0 until m).foldLeft(enc0)((df, j) =>
        df.withColumn(s"code$j", graft.expr.GraftFunctions.vecNearest(
          corpus.sparkSession, resSub(col("cv"), col("cent"), j),
          books(j), ccs(j))))
      .select(col("cid") +: col("cell") +: (0 until m).map(j => col(s"code$j")): _*)
    IvfPqResidualIndex(dim, m, sub, kCodes, coarse, books, enc)
  }

  /** Probed query rows against a residual index: per probed cell, ADC
    * tables carrying the full ‖qres_j − c_{j,i}‖² — UNLIKE plain PQ the
    * "row-constant" term here is ‖q − cent(cell)‖², which differs per
    * probed cell, so dropping it would skew cross-cell ordering (and the
    * absolute value is what makes range search meaningful). Returns
    * (qid, cell, dtab0..dtab{m-1}). */
  private def ivfPqResidualProbe(queries: DataFrame, index: IvfPqResidualIndex,
      idCol: String, vecCol: String, nProbe: Int): DataFrame = {
    import index.{m, sub, kCodes, coarse, books}
    graft.expr.GraftFunctions.register(queries.sparkSession)
    val ccs = books.map(_.map(ct => LocalKMeans.dotSeq(ct, ct)))
    val coarseCC = coarse.map(ct => LocalKMeans.dotSeq(ct, ct))
    def relD2(v: Column, j: Int, i: Int): Column =
      lit(ccs(j)(i)) - lit(2.0) * call_function("vec_dot", v,
        array(books(j)(i).map(lit(_)): _*))
    def cellD2(v: Column, ci: Int): Column =
      lit(coarseCC(ci)) - lit(2.0) * call_function("vec_dot", v,
        array(coarse(ci).map(lit(_)): _*))
    val centLit = typedlit(coarse.map(_.toSeq).toSeq)
    def resSub(vec: Column, cent: Column, j: Int): Column =
      zip_with(slice(vec, j * sub + 1, sub), slice(cent, j * sub + 1, sub),
        (a, b) => a - b)
    val q0 = queries.select(col(idCol).as("qid"),
      vdbl(col(vecCol)).as("qv"))
    val probed = q0.withColumn("cells",
        slice(array_sort(array(coarse.indices.map(ci =>
          struct(cellD2(col("qv"), ci).as("d"), lit(ci).as("cell"))): _*)),
          1, nProbe))
      .select(col("qid"), col("qv"), explode(col("cells.cell")).as("cell"))
      .withColumn("cent", element_at(centLit, col("cell") + 1))
    def qq(j: Int): Column = {
      val r = resSub(col("qv"), col("cent"), j)
      call_function("vec_dot", r, r)
    }
    (0 until m).foldLeft(probed)((df, j) =>
      df.withColumn(s"dtab$j", array((0 until kCodes).map(i =>
        qq(j) + relD2(resSub(col("qv"), col("cent"), j), j, i)): _*)))
      .drop("qv", "cent")
  }

  private def adcSum(m: Int): Column = (0 until m).map(j =>
    element_at(col(s"dtab$j"), col(s"code$j") + 1)).reduce(_ + _)

  /** IVF × PQ with RESIDUAL encoding (FAISS's by_residual=true, the
    * production default there): sub-codebooks train on r = v −
    * centroid(cell(v)) pooled across cells, corpus codes encode
    * residuals, and each query builds its ADC terms per probed cell from
    * (q − centroid). Residuals have far less variance than raw vectors
    * on clustered data, so the same m × kCodes budget quantizes much
    * finer (spec-measured recall win vs [[ivfPqTopKDeterministic]]).
    * Same scan shape: probed-cell equi-join over the code table, exact
    * cosine re-rank of the shortlist. Deterministic end-to-end, so the
    * whole index build + search replays in SQL (the q104 oracle).
    * Output: qid, cid, cos, rank. */
  def ivfPqResidualTopKDeterministic(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int, nCells: Int, nProbe: Int,
      m: Int, kCodes: Int, k: Int, shortlist: Int = 50,
      itersCoarse: Int = 10, itersPq: Int = 5,
      maxSample: Int = 4096): DataFrame = {
    val spark = corpus.sparkSession
    val index = ivfPqResidualBuild(corpus, idCol, vecCol, dim, nCells, m,
      kCodes, itersCoarse, itersPq, maxSample)
    val q1 = ivfPqResidualProbe(queries, index, idCol, vecCol, nProbe)
    val c = corpus.select(col(idCol).as("cid"),
      vdbl(col(vecCol)).as("cv"))
    val q0 = queries.select(col(idCol).as("qid"),
      vdbl(col(vecCol)).as("qv"))
    val wA = Window.partitionBy("qid").orderBy(col("adist"), col("cid"))
    val short = broadcast(q1).join(index.codes, Seq("cell"))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), adcSum(m).as("adist"))
      .withColumn("ark", row_number().over(wA))
      .where(col("ark") <= shortlist)
      .select("qid", "cid")
    val rer = short.join(broadcast(q0), "qid").join(c, "cid")
      .withColumn("cos", cosineFast(spark, col("qv"), col("cv")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    rer.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("qid", "cid", "cos", "rank")
  }

  /** Range search over a prebuilt residual index (FAISS range_search
    * analog): emit every (query, corpus) pair in the probed cells whose
    * ADC distance estimate ≤ `maxDist` (the residual ADC is a true
    * squared-L2 estimate — no dropped per-query constant — so an
    * absolute radius is meaningful, which plain PQ's relative distances
    * are not). No top-k window, so the SAME plan runs on a streaming
    * `queries` DataFrame in append mode (stream-static equi-join on
    * cell): the ingest-time "is this embedding close to anything in the
    * indexed corpus" filter, with the static side the 32×-compressed
    * code table instead of raw vectors. Output: qid, cid, adist. */
  def ivfPqResidualRange(queries: DataFrame, index: IvfPqResidualIndex,
      idCol: String, vecCol: String, nProbe: Int, maxDist: Double): DataFrame = {
    val q1 = ivfPqResidualProbe(queries, index, idCol, vecCol, nProbe)
    q1.join(index.codes, Seq("cell"))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), adcSum(index.m).as("adist"))
      .where(col("adist") <= maxDist)
  }

  private def ivfTopKWith(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, cents: Array[Array[Double]],
      nProbe: Int, k: Int): DataFrame = {
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("cid"),
      vdbl(col(vecCol)).as("cv"))
    val cc = cents.map(ct => ct.map(x => x * x).sum)
    // ‖v−c_ci‖² − ‖v‖² (row-constant term dropped; ordering preserved)
    def relD2(v: Column, ci: Int): Column =
      lit(cc(ci)) - lit(2.0) * call_function("vec_dot", v,
        array(cents(ci).map(lit(_)): _*))
    // corpus-side argmin through the codegen'd vec_nearest loop (same
    // arithmetic as the struct-argmin; the struct form's generated source
    // is O(nCells·dim) and drops to interpreted eval past ~64 cells)
    val assigned = c.withColumn("cell",
      graft.expr.GraftFunctions.vecNearest(corpus.sparkSession, col("cv"), cents, cc))
    val q = queries.select(col(idCol).as("qid"),
      vdbl(col(vecCol)).as("qv"))
    val cellDists = cents.indices.map { ci =>
      struct(relD2(col("qv"), ci).as("d"), lit(ci).as("cell"))
    }
    val probed = q.withColumn("cells",
      slice(array_sort(array(cellDists: _*)), 1, nProbe))
      .select(col("qid"), col("qv"), explode(col("cells.cell")).as("cell"))
    // broadcast the probed side: the cell key has only nCells distinct
    // values — a shuffled join would cap parallelism at nCells and skew
    // on hot cells (see ivfPqTopKDeterministic)
    val scored = broadcast(probed).join(assigned, Seq("cell"))
      .where(col("qid") =!= col("cid"))
      .withColumn("cos", cosineFast(corpus.sparkSession, col("qv"), col("cv")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("qid", "cid", "cos", "rank")
  }

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", arXiv:2303.09540):
    * semantic near-duplicate removal over an embedding column. Cluster
    * the embedding space with the deterministic coarse quantizer
    * (md5-ordered sample + fixed-Lloyd, the q61/q98 device), then within
    * each cluster find all pairs with cosine ≥ `eps` and drop one member
    * of every such pair — per the paper, the member MORE similar to the
    * cluster centroid (the redundant one; ties drop the larger id), so
    * each duplicate neighborhood keeps its least-typical exemplar.
    *
    * Scale shape: the quadratic pair search never crosses clusters — a
    * self-equi-join on `cell` bounds candidates to cluster size (the
    * paper's own trick for web-scale corpora; raise `nCells` so the
    * expected cell fits an executor — 100k cells at 10^10 docs). The
    * cluster assignment is one broadcast-centroid codegen pass, no
    * iterative distributed fit. Everything is md5/fixed-Lloyd
    * deterministic, so the full pipeline replays in SQL (the q109
    * oracle). Output: survivors (id, cell, simc = cosine to centroid).
    *
    * The reference has no semantic dedup (its nearest analogue is the
    * cosine near-dup pipeline, q58); engine addition for the LLM
    * curation path. */
  def semDedupDeterministic(vecs: DataFrame, idCol: String, vecCol: String,
      nCells: Int, eps: Double, iters: Int = 10,
      maxSample: Int = 20000): DataFrame = {
    graft.expr.GraftFunctions.register(vecs.sparkSession)
    val c = vecs.select(col(idCol).as("cid"),
      vdbl(col(vecCol)).as("cv"))
    val pts = LocalKMeans.sampleVectorsHashed(c, "cv", Seq("cid"), maxSample)
    val cents = LocalKMeans.fitFixed(pts, nCells, iters, viaDot = true)
    val ccs = cents.map(ct => LocalKMeans.dotSeq(ct, ct))
    // one pass: cell argmin + vector norm + cosine to the won centroid
    // (centroid lookup via element_at on literal arrays — no join).
    // typedlit builds ONE Literal node; array(array(lit…)) is nCells×dim
    // expression nodes that every optimizer pass re-walks in each of this
    // plan's three asg reuses — measured seconds of pure driver planning
    // at 128 cells
    val centArr = typedlit(cents.map(_.toSeq).toSeq)
    val cnormArr = typedlit(ccs.map(math.sqrt).toSeq)
    // materialize the assignment table ONCE — it feeds both sides of the
    // self-anti-join below. Without this the whole assignment pipeline
    // runs twice, and worse: a UNIONED input gets shredded by Spark's
    // PushDownLeftSemiAntiJoin (anti joins distribute over a left-side
    // union), re-evaluating the entire right side once per branch —
    // measured driver OOM at a 64-way union. localCheckpoint cuts the
    // lineage (no union survives for the rule to push through), leaves no
    // CacheManager entry, and its blocks free when the result is GC'd.
    // At real scale this is the FAISS shape anyway: the cell-assignment
    // table is an index artifact you materialize once.
    val asg = c.withColumn("cell",
        graft.expr.GraftFunctions.vecNearest(vecs.sparkSession, col("cv"),
          cents, ccs))
      .withColumn("vnorm", sqrt(call_function("vec_dot", col("cv"), col("cv"))))
      .withColumn("simc",
        call_function("vec_dot", col("cv"), element_at(centArr, col("cell") + 1)) /
          (col("vnorm") * element_at(cnormArr, col("cell") + 1)))
      .localCheckpoint(true)
    // survivor rule as ONE cell-equi anti join: x is dropped iff some
    // same-cell y has cos(x,y) ≥ eps and beats x (smaller simc; tie →
    // smaller id) — element-wise equivalent to materializing every ε-pair
    // and dropping the more-central member, but the anti join SHORT-
    // CIRCUITS at each row's first witness and never materializes a
    // joined pair row (the pair formulation copied both 64-dim vectors
    // into 10⁶s of UnsafeRows before its filter — measured 4× the whole
    // operator's cost at 32k×128 cells — then paid a distinct + second
    // join on top). Candidates stay bounded by cell size, never the
    // corpus.
    val other = asg.select(col("cid").as("ocid"), col("cv").as("ocv"),
      col("vnorm").as("onorm"), col("simc").as("osimc"),
      col("cell").as("ocell"))
    val beaten = col("cell") === col("ocell") && col("cid") =!= col("ocid") &&
      call_function("vec_dot", col("cv"), col("ocv")) /
        (col("vnorm") * col("onorm")) >= eps &&
      (col("simc") > col("osimc") ||
        (col("simc") === col("osimc") && col("cid") > col("ocid")))
    asg.join(other, beaten, "left_anti")
      .select(col("cid").as(idCol), col("cell").cast("long").as("cell"),
        col("simc"))
  }

  /** Cross-corpus semantic near-dup check — the incremental-ingest twin
    * of [[semDedupDeterministic]] (what `minhashPairsAcross`/q106 is for
    * MinHash): a NEW batch of embeddings is checked against an indexed
    * corpus without ever pairing the corpus with itself. The coarse
    * quantizer trains on the CORPUS sample only (the index is built
    * once and batches reuse it); batch vectors assign to corpus cells
    * and pair only within their cell, so per-batch work is
    * |batch| × expected-cell-size, independent of corpus². Output: one
    * row per batch vector — its cell, its ε-neighbor count in the
    * corpus, and the best match (highest cosine, ties to the smallest
    * corpus id; nulls when clean). Deterministic end-to-end → full SQL
    * replay (q114 oracle). */
  def semDedupAcross(batch: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, nCells: Int, eps: Double, iters: Int = 10,
      maxSample: Int = 20000): DataFrame = {
    graft.expr.GraftFunctions.register(batch.sparkSession)
    def prep(df: DataFrame, id: String, v: String) =
      df.select(col(idCol).as(id),
        vdbl(col(vecCol)).as(v))
    val c = prep(corpus, "cid", "cv")
    val pts = LocalKMeans.sampleVectorsHashed(c, "cv", Seq("cid"), maxSample)
    val cents = LocalKMeans.fitFixed(pts, nCells, iters, viaDot = true)
    val ccs = cents.map(ct => LocalKMeans.dotSeq(ct, ct))
    def assign(df: DataFrame, v: String) = df.withColumn("cell",
        graft.expr.GraftFunctions.vecNearest(batch.sparkSession, col(v),
          cents, ccs))
      .withColumn(v + "n", sqrt(call_function("vec_dot", col(v), col(v))))
    val ca = assign(c, "cv")
    val ba = assign(prep(batch, "bid", "bv"), "bv")
    val pairs = ba.join(ca, Seq("cell"))
      .withColumn("cos",
        call_function("vec_dot", col("bv"), col("cv")) /
          (col("bvn") * col("cvn")))
      .where(col("cos") >= eps)
    // best match via struct max: (cos, −cid) orders ties to smallest cid
    val hits = pairs.groupBy("bid").agg(
      count(lit(1)).as("nDups"),
      max(struct(col("cos").as("c"), (-col("cid")).as("ni"))).as("best"))
    ba.select(col("bid"), col("cell"))
      .join(hits.select(col("bid"), col("nDups"),
        (-col("best.ni")).as("matchId"), col("best.c").as("matchCos")),
        Seq("bid"), "left")
      .select(col("bid").as(idCol), col("cell").cast("long").as("cell"),
        coalesce(col("nDups"), lit(0L)).as("nDups"),
        col("matchId"), col("matchCos"))
  }

  /** Cluster-balanced (topic-stratified) corpus sampling: assign every
    * embedding to a deterministic KMeans cell (the q61/q109 coarse
    * quantizer) and keep the `perCell` md5-smallest ids per cell — an
    * equal-per-topic subset. Size-proportional sampling lets one dominant
    * topic (crawl boilerplate, one language) swamp a curated subset;
    * per-cell quotas are the embedding-space analogue of
    * [[graft.text.TextOps.temperatureMix]] over sources, with cells
    * standing in for (unlabeled) topics — the cluster-balanced selection
    * used alongside SemDeDup-style curation.
    *
    * Scale shape: one broadcast-centroid codegen assignment pass (no
    * iterative distributed fit), then a per-cell bottom-k by hashed id —
    * the optimizer caps window partials at `perCell` per cell before the
    * exchange (WindowGroupLimit), so the shuffle carries ≤
    * perCell·nCells·tasks rows, never the corpus. Fully md5/fixed-Lloyd
    * deterministic → exact SQL replay. Output: (idCol, cell, rk ≤
    * perCell). */
  def clusterBalancedSample(vecs: DataFrame, idCol: String, vecCol: String,
      nCells: Int, perCell: Int, iters: Int = 10,
      maxSample: Int = 20000): DataFrame = {
    graft.expr.GraftFunctions.register(vecs.sparkSession)
    val c = vecs.select(col(idCol).as("cid"),
      vdbl(col(vecCol)).as("cv"))
    val pts = LocalKMeans.sampleVectorsHashed(c, "cv", Seq("cid"), maxSample)
    val cents = LocalKMeans.fitFixed(pts, nCells, iters, viaDot = true)
    val ccs = cents.map(ct => LocalKMeans.dotSeq(ct, ct))
    val h = conv(substring(md5(col("cid").cast("string")), 1, 14), 16, 10)
      .cast("long")
    val w = Window.partitionBy(col("cell")).orderBy(col("h"), col("cid"))
    c.withColumn("cell",
        graft.expr.GraftFunctions.vecNearest(vecs.sparkSession, col("cv"),
          cents, ccs))
      .withColumn("h", h)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= perCell)
      .select(col("cid").as(idCol), col("cell").cast("long").as("cell"),
        col("rk"))
  }

  /** Maximal-marginal-relevance selection (Carbonell & Goldstein,
    * SIGIR'98 eq. 2) — diversity-aware top-k for curation/eval-set
    * picking: greedily take argmax λ·rel(c) − (1−λ)·max_{s∈S} cos(c, s)
    * with rel = cosine to `queryVec`; ties broken by id.
    *
    * The greedy recurrence is sequential in k by definition, so the
    * operator splits like the other fit-then-collect kernels: the
    * candidate SHORTLIST — top `shortlist` by (rel desc, id) — is
    * computed distributed (TakeOrderedAndProject over one corpus scan:
    * no full sort, no corpus shuffle), then the k greedy picks run over
    * the collected shortlist×dim doubles, a model-sized array (the
    * centroid/forest collect pattern). At 100 TB the scan dominates and
    * parallelizes; the driver holds ≤ `shortlist` vectors. Every dot
    * product is a sequential left-to-right loop — bit-parity with the
    * DuckDB list_dot_product oracle. Output: rank, id, rel, mmr. */
  def mmrSelect(corpus: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Double], k: Int, lambda: Double = 0.7,
      shortlist: Int = 64): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qlit = array(queryVec.map(lit(_)): _*)
    val rows = corpus
      .select(col(idCol).cast("long").as("id"),
        vdbl(col(vecCol)).as("v"))
      .withColumn("rel", cosineFast(spark, col("v"), qlit))
      .orderBy(col("rel").desc, col("id")).limit(shortlist)
      .select("id", "v", "rel").collect()
    val ids = rows.map(_.getLong(0))
    val vs = rows.map(_.getSeq[Double](1).toArray)
    val rels = rows.map(_.getDouble(2))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cosL(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val mu = 1 - lambda // NOT a fresh 0.3-style literal: the oracle must
    val n = rows.length // print this exact double for bit-parity
    val used = Array.fill(n)(false)
    val chosen = collection.mutable.ArrayBuffer.empty[Array[Double]]
    val picks = collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Double)]
    var rank = 1L
    while (rank <= math.min(k, n)) {
      var bi = -1; var bScore = 0.0
      var i = 0
      while (i < n) {
        if (!used(i)) {
          var ms = 0.0
          var first = true
          chosen.foreach { cv =>
            val c = cosL(vs(i), cv)
            if (first || c > ms) { ms = c; first = false }
          }
          val score = lambda * rels(i) - mu * ms
          if (bi < 0 || score > bScore ||
            (score == bScore && ids(i) < ids(bi))) { bi = i; bScore = score }
        }
        i += 1
      }
      used(bi) = true
      chosen += vs(bi)
      picks += ((rank, ids(bi), rels(bi), bScore))
      rank += 1
    }
    picks.toSeq.toDF("rank", "id", "rel", "mmr")
  }

  /** Simplified silhouette — clustering-quality audit for the
    * cluster-balanced sampling / SemDedup cell assignments: centroids are
    * the per-label mean vectors, a = distance to own centroid, b = distance
    * to the nearest other centroid, s = (b − a) / max(a, b); one row per
    * label with its mean silhouette. (The classic silhouette's all-pairs
    * a/b is O(n²) — the centroid form is the standard scale substitute.)
    *
    * Scale shape: the centroid fit is one posexplode hash-agg whose result
    * is model-sized (k·d cells — collected, 6dp-frozen so both engines
    * score from identical literals, and inlined); the scoring side is then
    * a single narrow pass (k dot products per row, no join, no shuffle)
    * feeding a k-row hash-agg. Distances use the expanded form
    * ‖v‖² − 2·v·c + ‖c‖² so the per-row work is k fused multiply-adds over
    * the vector, with ‖c‖² folded to a driver-side constant. */
  def silhouette(emb: DataFrame, vecCol: String, labelCol: String): DataFrame = {
    val e = emb.select(col(labelCol).cast("int").as("label"),
      col(vecCol).cast("array<double>").as("v"))
    val centRows = e.select(col("label"), posexplode(col("v")))
      .toDF("label", "i", "x")
      .groupBy("label", "i").agg(avg("x").as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    if (centRows.isEmpty) return e.sparkSession.emptyDataFrame
    val cents: Seq[(Int, Array[Double])] = centRows.groupBy(_._1).toSeq
      .map { case (l, rs) =>
        l -> rs.sortBy(_._2).map(t => math.rint(t._3 * 1e6) / 1e6).toArray
      }.sortBy(_._1)
    val vv = aggregate(transform(col("v"), x => x * x), lit(0.0), _ + _)
    // one (dist, label) struct per centroid — each distance evaluated once;
    // struct array_min is lexicographic so nearest-other ties break low
    val dists = array(cents.map { case (l, c) =>
      val vc = aggregate(zip_with(col("v"), typedlit(c.toSeq), _ * _),
        lit(0.0), _ + _)
      val cc = c.map(x => x * x).sum
      struct(sqrt(greatest(lit(0.0), vv - lit(2.0) * vc + lit(cc))).as("d"),
        lit(l).as("l"))
    }: _*)
    val withD = e.withColumn("_ds", dists)
    val own = element_at(filter(col("_ds"), s => s("l") === col("label")), 1)("d")
    val other = array_min(filter(col("_ds"), s => s("l") =!= col("label")))("d")
    withD
      .withColumn("_s", (other - own) / greatest(own, other))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), avg("_s").as("sil"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR'09):
    * fused(d) = Σ_lists 1/(k + rank_list(d)) — the standard way to merge
    * a lexical (BM25) and a dense (ANN) ranking into one hybrid
    * retrieval list without score calibration; ranks are the only
    * input, so the lists' score scales never have to be reconciled.
    *
    * Each input must carry (`keyCols`..., `idCol`, `rank`) with rank
    * 1-based within its list. `keyCols` empty = one global query;
    * non-empty = per-query fusion (the batch-retrieval shape).
    *
    * Determinism: 1/(k+rank) is a float of two exact integers —
    * identical on both engines — quantized to 9dp fixed-point longs so
    * the per-doc SUM is order-exact; the final ordering compares those
    * exact longs (id tie-break).
    *
    * Scale: inputs are top-k shortlists, so everything here is
    * shortlist-sized — a union + one hash agg + one window. With empty
    * `keyCols` the window is single-partition over ≤ Σ topK rows (a
    * few hundred), by construction not a bottleneck. */
  def rrfFuse(rankings: Seq[DataFrame], keyCols: Seq[String], idCol: String,
      kConst: Int = 60, topK: Int = 100): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val cols = keyCols :+ idCol
    val norm = rankings.map(r =>
      r.select(cols.map(col) :+ col("rank").cast("long").as("r"): _*))
    val fused = norm.reduce(_ unionByName _)
      .groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("n_lists"),
        sum(graft.core.fixedPointLong(
          lit(1.0) / (lit(kConst.toDouble) + col("r")), 9)).as("rrf9"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("rrf9").desc, col(idCol))
    fused.withColumn("fused_rank", row_number().over(w))
      .where(col("fused_rank") <= topK)
      .withColumn("rrf", col("rrf9").cast("double") / 1e9)
      .drop("rrf9")
  }

  /** k-center greedy coreset (Gonzalez 1985 2-approximation; the
    * selection rule behind coreset active learning, Sener & Savarese
    * ICLR'18) — the diversity-first counterpart to [[mmrSelect]]:
    * seed with the smallest id, then k−1 times pick the point FARTHEST
    * from everything already selected. The selection radii are the
    * coverage guarantee: every point sits within `radius` of some
    * center — the number a curation pipeline reads to size a
    * diversity-preserving subsample.
    *
    * Fully distributed, unlike the shortlist-bounded mmrSelect: each
    * round is one pass over the corpus computing min-distance to the
    * (round-bounded, broadcast) center list, and a 1-row argmax
    * collect — k jobs total, never a shortlist cap, so the selection
    * is exact at any corpus size. The argmax orders by the 8dp
    * fixed-point distance (ties → smaller id), making the greedy walk
    * replayable in an unrolled-CTE oracle.
    *
    * Output: (rank, id, radius) — radius = the selected point's
    * min-distance at selection time (0 for the seed); radii are
    * non-increasing by construction.
    *
    * Scale: O(k) scans with ≤ k codegen'd vec_euclid evals per row per
    * scan (the center frame is broadcast and rows-sized k); driver
    * state is k (id, radius) pairs. At 10⁹ rows and k ≤ 10³ this is
    * the textbook trade; beyond that, seed the walk with IVF/kmeans
    * centroids (the documented cell path). */
  def kCenterGreedy(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    graft.expr.GraftFunctions.register(spark)
    val base = vecs.select(col(idCol).cast("long").as("id"),
      vdbl(col(vecCol)).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seed = base.orderBy(col("id")).select("id").as[Long].head()
    val picks = collection.mutable.ArrayBuffer[(Long, Long, Double)](
      (1L, seed, 0.0))
    var r = 2
    while (r <= k) {
      val centers = picks.map(_._2).toSeq
      val cents = base.where(col("id").isin(centers: _*))
        .select(col("id").as("_cid"), col("v").as("_cv"))
      val minD = base
        .join(broadcast(cents), col("id") =!= col("_cid"))
        .withColumn("_d", call_function("vec_euclid", col("v"), col("_cv")))
        .groupBy("id").agg(min(col("_d")).as("_md"))
        .where(!col("id").isin(centers: _*))
      val top = minD
        .orderBy(graft.core.fixedPointLong(col("_md"), 8).desc, col("id"))
        .select(col("id"), col("_md")).head()
      picks += ((r.toLong, top.getLong(0), top.getDouble(1)))
      r += 1
    }
    base.unpersist()
    picks.toSeq.toDF("rank", "id", "radius")
  }
}
