package graft.multi

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Isolation forest (Liu/Ting/Zhou, ICDM'08) (SURVEY.md §2.6, multi/IsolationForestModel.scala:54-377,
  * IsolationForestPredictor.scala:76-175, IsolationForestMerge.scala:68-190).
  *
  * The reference grows all trees with a cluster-wide shuffle **per tree
  * level** (groupByKey loop :136-254). Since each tree sees only
  * `subsampleSize` rows (default 100, :54-57), a whole forest fits easily
  * in one task — so we build each key's forest locally inside one
  * flatMapGroups pass (zero iterative shuffles) and broadcast the model
  * back for scoring, replacing the reference's data×model cartesian
  * (:108) with a map-side traversal. Seeded RNG (the reference's unseeded
  * Math.random, :203, made deterministic per SURVEY §7 hard-part d).
  */
object IsolationForest {

  /** One internal node or leaf of one tree, in the flat path encoding the
    * reference persists (:257-271): nodeId is the bit path from the root
    * (left=0/LT, right=1/GE). */
  case class IsoNode(key: String, treeId: Int, path: String, attr: Int,
      split: Double, isLeaf: Boolean, size: Int, depth: Int)

  case class IsoScore(key: String, rowId: Long, score: Double)

  /** c(n): average unsuccessful-search path length of a BST
    * (avgPathLength :366-369). */
  def c(n: Double): Double =
    if (n <= 1) 0.0 else 2 * (math.log(n - 1) + 0.5772156649) - 2 * (n - 1) / n

  /** Fit per-key forests. `rows` must carry (key: String, rowId: Long,
    * attrs: Array[Double]); model returned as a small DataFrame.
    * This seeded path is the production default — one pass, no per-tree
    * hashing; [[fitDeterministic]] trades ~1.5× fit cost for bit-exact
    * cross-engine/cross-run replay (audits, oracle checks). */
  def fit(data: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
      numTrees: Int, subsampleSize: Int, maxDepth: Int, seed: Long): Dataset[IsoNode] = {
    val spark = data.sparkSession
    import spark.implicits._
    val rows = data.select(
      concat_ws("|", keyCols.map(c => col(c).cast("string")): _*).as("key"),
      array(attrCols.map(c => col(c).cast("double")): _*).as("attrs"))
      .as[(String, Seq[Double])]
    rows.groupByKey(_._1).flatMapGroups { (key, it) =>
      val all = it.map(_._2.toArray).toArray
      val rng = new Random(seed ^ key.hashCode.toLong)
      val nodes = collection.mutable.ArrayBuffer.empty[IsoNode]
      for (t <- 0 until numTrees) {
        val sample = Array.fill(math.min(subsampleSize, all.length))(all(rng.nextInt(all.length)))
        grow(key, t, "R", sample, 0, maxDepth, rng, nodes)
      }
      nodes.iterator
    }
  }

  /** [[fit]] with every random choice replaced by an md5 derivation, so
    * the forest (and hence q46's scores) replays in SQL:
    *  - per-tree subsample = the first `subsampleSize` rows ordered by
    *    (md5("t:rowId"), attrs) — without replacement; value ties after
    *    the hash are interchangeable, so the VALUE multiset is total;
    *  - split attr/value at a node come from the 52-bit hex prefix of
    *    md5("a:key:t:path") / md5("s:key:t:path") mapped to [0,1).
    * min/max/compare are exact (no float summation anywhere), so the
    * grown trees are bit-identical in any engine with md5.
    *
    * The subsample selection runs in the distributed plan — codegen'd
    * `md5` plus a per-(key, tree) top-k rank that WindowGroupLimit trims
    * ahead of the shuffle — so the data-sized work is one scan with
    * data-sized parallelism; only the numTrees·subsampleSize sampled rows
    * per key reach the local tree growth. (The naive form — JVM md5 +
    * full sort of every row once per tree inside one task per key — is
    * O(trees · n log n) on key-cardinality cores.) */
  def fitDeterministic(data: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], idCol: String, numTrees: Int,
      subsampleSize: Int, maxDepth: Int): Dataset[IsoNode] = {
    val spark = data.sparkSession
    import spark.implicits._
    spark.createDataset(fitDeterministicNodes(data, keyCols, attrCols,
      idCol, numTrees, subsampleSize, maxDepth))
  }

  /** [[fitDeterministic]] returning the DRIVER-SIDE node array — the
    * form [[score]]/[[merge]] broadcast anyway. Skipping the
    * Dataset round-trip (createDataset at the fit, collect at the
    * score/merge) saves two full model encode/decodes per audit run
    * (r11 verdict item 8). */
  def fitDeterministicNodes(data: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], idCol: String, numTrees: Int,
      subsampleSize: Int, maxDepth: Int): Seq[IsoNode] = {
    val spark = data.sparkSession
    import spark.implicits._
    // Per-tree sampling keys are affine permutations (a_t·x + b_t mod P,
    // the minhash constants from TextOps.hashParams) of ONE md5-derived
    // 56-bit hash per row: the round-6 shape ranked by md5(t:rowId),
    // which burned numTrees md5 calls and a 32-char hex string per
    // (row, tree) — 50× the hashing and the dominant GC litter of the
    // fit. Integer keys replay exactly in the oracle SQL and collisions
    // (~n²/2P per tree) tie-break on attrs, which is all growth consumes.
    val P = graft.text.TextOps.P
    val trees = broadcast(
      graft.text.TextOps.hashParams(numTrees).zipWithIndex
        .map { case ((a, b), t) => (t, a, b) }
        .toDF("t", "a", "b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key", "t").orderBy(col("h"), col("attrs"))
    val keyedRaw = data.select(
      concat_ws("|", keyCols.map(c => col(c).cast("string")): _*).as("key"),
      (graft.text.TextOps.hash56(col(idCol).cast("string")) % P).as("base"),
      array(attrCols.map(c => col(c).cast("double")): _*).as("attrs"))
    // The ×numTrees crossJoin inherits the scan's partitioning, so a small
    // input (one parquet footer) would push ALL numTrees·n md5 rows through
    // one core. Fan out only when the scan is narrower than the cluster —
    // at real scale the condition is false and no shuffle is added.
    val par = spark.sparkContext.defaultParallelism
    // Persisted: BOTH fit jobs start from this projection (the count agg
    // and the crossJoin→sample→growth lineage), so without the persist
    // each re-runs scan + md5 + the fan-out exchange — measured ~0.4 s of
    // the ~2.3 s warm fit at sf0.1. Narrow rows (key, long, attrs), so
    // the footprint is a fraction of the source table.
    val keyed =
      (if (keyedRaw.rdd.getNumPartitions < par) keyedRaw.repartition(par)
       else keyedRaw).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def hashed = keyed.crossJoin(trees)
      .withColumn("h", (col("a") * col("base") + col("b")) % P)
      .drop("a", "b")
    // Top-k selection by hash order would sort numTrees·n rows per key —
    // WindowGroupLimit trims the exchange but not the map-side sort.
    // Prefilter on the integer hash instead, keeping ~8× the needed rows
    // per group: if ≥ k rows survive the cutoff the true top-k by
    // (h, attrs) all survive. The cutoff is a per-key long literal
    // (computed on the tiny key-count aggregate) so the hot path is one
    // multiply-add-mod + long compare. Sort input drops from trees·n to
    // ~8·trees·k rows; a deficiency check below restores exactness in the
    // (astronomically unlikely) case a group loses too many rows.
    // Persisted: the tiny per-key count feeds both the bounds collect and
    // (large-key path) the need/bound joins — without the persist each use
    // re-scans the data (the round-6 shape paid that scan 2×, plus a third
    // action for a standalone deficiency check; see the 2-job layout below).
    val nPerKey = keyed.groupBy("key").agg(count(lit(1)).as("n"))
      .withColumn("bound",
        least(lit(P - 1), (lit(P.toDouble) *
          lit(subsampleSize.toLong * 8) / col("n")).cast("long")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-key bounds as inline literals when the key set is small — a
    // codegen'd CASE beats a broadcast hash join probe per row (measured
    // 2.2 s vs 4.9 s over 5M rows); large key sets fall back to the join
    val bounds = nPerKey.select("key", "bound", "n").limit(65).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    if (bounds.isEmpty) {
      nPerKey.unpersist(blocking = false)
      keyed.unpersist(blocking = false)
      return Seq.empty[IsoNode]
    }
    val small = bounds.length <= 64
    // The whole fit is exactly TWO data-sized jobs: (1) the nPerKey count
    // agg above, (2) crossJoin → prefix filter → rank → tree growth in one
    // lineage. The prefilter's exactness guard rides along: each key's
    // `need` (= min(k, n)) travels WITH the sampled rows, growth checks
    // every tree's survivor count in the same flatMapGroups pass, and a
    // deficient key emits one sentinel node instead of a forest — the
    // (astronomically unlikely) repair re-runs only those keys exactly.
    // The round-6 shape ran the deficiency check as its own eager action,
    // which materialized the crossJoin+sort twice end-to-end and re-ran
    // the count scan: 3.6–4.1 s steady-state at sf0.1 vs ~1.8 s for this
    // layout.
    val filtered =
      if (small) {
        val caseExpr = bounds.tail.foldLeft(
          when(col("key") === bounds.head._1, lit(bounds.head._2))) {
          case (acc, (k, b, _)) => acc.when(col("key") === k, lit(b))
        }
        hashed.where(col("h") <= caseExpr)
      } else hashed.join(broadcast(nPerKey.select("key", "bound")), "key")
        .where(col("h") <= col("bound")).drop("bound")
    val needCol =
      if (small) {
        val needCase = bounds.tail.foldLeft(
          when(col("key") === bounds.head._1, lit(math.min(subsampleSize.toLong, bounds.head._3)))) {
          case (acc, (k, _, n)) => acc.when(col("key") === k, lit(math.min(subsampleSize.toLong, n)))
        }
        Seq(needCase.as("need"))
      } else Seq(col("need"))
    val withNeed =
      if (small) filtered
      else filtered.join(broadcast(nPerKey.select(col("key"),
        least(lit(subsampleSize.toLong), col("n")).as("need"))), "key")
    val sampled = withNeed
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= subsampleSize)
      .select(col("key") +: col("t") +: col("attrs") +: needCol: _*)
    val grown = sampled.as[(String, Int, Seq[Double], Long)]
      .groupByKey(_._1).flatMapGroups { (key, it) =>
        // growth is order-insensitive (min/max/partition only), so the
        // arbitrary arrival order within a tree's sample is fine
        val arr = it.toArray
        val need = arr.head._4
        val byTree = arr.groupBy(_._2)
        val deficient = (0 until numTrees).exists(t =>
          byTree.get(t).map(_.length.toLong).getOrElse(0L) < need)
        if (deficient)
          Iterator.single(IsoNode(key, -1, "DEFICIENT", -1, 0.0, isLeaf = true, 0, 0))
        else {
          val nodes = collection.mutable.ArrayBuffer.empty[IsoNode]
          byTree.keys.toArray.sorted.foreach { t =>
            growDet(key, t, "R", byTree(t).map(_._3.toArray), 0, maxDepth, nodes)
          }
          nodes.iterator
        }
      }
    // The model is tiny (≤ numTrees · 2^(maxDepth+1) nodes per key —
    // [[score]] collects it for a broadcast anyway), so materialize here.
    val model = grown.collect()
    // Exactness repair: keys whose prefilter over-pruned some tree
    // (sentinel above), plus keys that vanished entirely (every row of
    // every tree pruned — detectable driver-side in the small path; the
    // large path pays one trivial job over the persisted nPerKey).
    val sentinelKeys = model.collect { case n if n.treeId == -1 => n.key }.toSet
    val missingKeys: Set[String] =
      if (small) bounds.map(_._1).toSet -- model.map(_.key).toSet
      else {
        val present = model.map(_.key).distinct.toSeq
        nPerKey.select("key").where(!col("key").isInCollection(present))
          .as[String].collect().toSet -- sentinelKeys
      }
    val badKeys = sentinelKeys ++ missingKeys
    val result =
      if (badKeys.isEmpty) model.toSeq
      else {
        val redo = hashed.where(col("key").isInCollection(badKeys.toSeq))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= subsampleSize)
          .select(col("key"), col("t"), col("attrs"))
          .as[(String, Int, Seq[Double])]
          .groupByKey(_._1).flatMapGroups { (key, it) =>
            val byTree = it.toArray.groupBy(_._2)
            val nodes = collection.mutable.ArrayBuffer.empty[IsoNode]
            byTree.keys.toArray.sorted.foreach { t =>
              growDet(key, t, "R", byTree(t).map(_._3.toArray), 0, maxDepth, nodes)
            }
            nodes.iterator
          }.collect()
        model.filterNot(n => badKeys.contains(n.key)).toSeq ++ redo
      }
    nPerKey.unpersist(blocking = false)
    keyed.unpersist(blocking = false)
    result
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  /** md5 hex prefix (52 bits) → [0,1) — same expression as the SQL side's
    * ('0x'||substr(md5(s),1,13))::BIGINT / 2^52. */
  private def md5Frac(s: String): Double =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 13), 16) / 4503599627370496.0

  private def growDet(key: String, treeId: Int, path: String,
      rows: Array[Array[Double]], depth: Int, maxDepth: Int,
      out: collection.mutable.ArrayBuffer[IsoNode]): Unit = {
    val attrs = if (rows.isEmpty) Seq.empty
      else (0 until rows(0).length).filter { a =>
        val v = rows.map(_(a)); v.max > v.min
      }
    if (depth >= maxDepth || rows.length <= 1 || attrs.isEmpty) {
      out += IsoNode(key, treeId, path, -1, 0.0, isLeaf = true, rows.length, depth)
    } else {
      val a = attrs((md5Frac(s"a:$key:$treeId:$path") * attrs.length).toInt)
      val (lo, hi) = (rows.map(_(a)).min, rows.map(_(a)).max)
      val split = lo + md5Frac(s"s:$key:$treeId:$path") * (hi - lo)
      val (lt, ge) = rows.partition(_(a) < split)
      if (lt.isEmpty || ge.isEmpty) {
        out += IsoNode(key, treeId, path, -1, 0.0, isLeaf = true, rows.length, depth)
      } else {
        out += IsoNode(key, treeId, path, a, split, isLeaf = false, rows.length, depth)
        growDet(key, treeId, path + "0", lt, depth + 1, maxDepth, out)
        growDet(key, treeId, path + "1", ge, depth + 1, maxDepth, out)
      }
    }
  }

  private def grow(key: String, treeId: Int, path: String, rows: Array[Array[Double]],
      depth: Int, maxDepth: Int, rng: Random,
      out: collection.mutable.ArrayBuffer[IsoNode]): Unit = {
    // terminal: depth cap, singleton, or unsplittable (isTerminal :371-376)
    val splittable = rows.nonEmpty && (0 until rows(0).length)
      .exists(a => rows.map(_(a)).distinct.length > 1)
    if (depth >= maxDepth || rows.length <= 1 || !splittable) {
      out += IsoNode(key, treeId, path, -1, 0.0, isLeaf = true, rows.length, depth)
    } else {
      // random attr with spread, random split in its range (:161-226)
      val attrs = (0 until rows(0).length).filter { a =>
        val v = rows.map(_(a)); v.max > v.min
      }
      val a = attrs(rng.nextInt(attrs.length))
      val (lo, hi) = (rows.map(_(a)).min, rows.map(_(a)).max)
      val split = lo + rng.nextDouble() * (hi - lo)
      val (lt, ge) = rows.partition(_(a) < split)
      if (lt.isEmpty || ge.isEmpty) {
        out += IsoNode(key, treeId, path, -1, 0.0, isLeaf = true, rows.length, depth)
      } else {
        out += IsoNode(key, treeId, path, a, split, isLeaf = false, rows.length, depth)
        grow(key, treeId, path + "0", lt, depth + 1, maxDepth, rng, out)
        grow(key, treeId, path + "1", ge, depth + 1, maxDepth, rng, out)
      }
    }
  }

  /** Pointer-array form of one tree for the scoring hot loop: node i has
    * attr/split and left/right child indices (-1 = leaf), leaves carry
    * depth + c(size) precomputed. */
  private case class FlatTree(attr: Array[Int], split: Array[Double],
      left: Array[Int], right: Array[Int], leafLen: Array[Double])

  private def flatten(nodes: Seq[IsoNode]): FlatTree = {
    val byPath = nodes.map(n => n.path -> n).toMap
    val order = nodes.sortBy(_.path).map(_.path).toArray // parent before child
    val idx = order.zipWithIndex.toMap
    val t = FlatTree(new Array(order.length), new Array(order.length),
      Array.fill(order.length)(-1), Array.fill(order.length)(-1),
      new Array(order.length))
    order.zipWithIndex.foreach { case (p, i) =>
      val n = byPath(p)
      t.attr(i) = n.attr
      t.split(i) = n.split
      t.leafLen(i) = n.depth + c(n.size.toDouble)
      if (!n.isLeaf) {
        t.left(i) = idx(p + "0")
        t.right(i) = idx(p + "1")
      }
    }
    t
  }

  /** Score each row: average tree path length (leaf depth + c(leafSize)
    * continuation, scoring :291-353) → score = 2^(−avgLen/c(subsample)).
    * The broadcast forest is pre-flattened to int-indexed arrays so the
    * per-row loop is pure primitive ops (no string paths, no map lookups). */
  def score(data: DataFrame, model: Dataset[IsoNode], keyCols: Seq[String],
      attrCols: Seq[String], idCol: String, subsampleSize: Int): Dataset[IsoScore] =
    scoreNodes(data, model.collect().toSeq, keyCols, attrCols, idCol,
      subsampleSize)

  /** [[score]] over a driver-side node seq (no model collect). */
  def scoreNodes(data: DataFrame, model: Seq[IsoNode], keyCols: Seq[String],
      attrCols: Seq[String], idCol: String, subsampleSize: Int): Dataset[IsoScore] = {
    val spark = data.sparkSession
    import spark.implicits._
    val trees: Map[String, Array[FlatTree]] = model
      .groupBy(_.key)
      .map { case (k, ns) =>
        k -> ns.groupBy(_.treeId).toSeq.sortBy(_._1).map(g => flatten(g._2.toSeq)).toArray
      }
    val bc = spark.sparkContext.broadcast(trees)
    val cn = c(subsampleSize.toDouble)
    val rows = data.select(
      concat_ws("|", keyCols.map(c => col(c).cast("string")): _*).as("key"),
      col(idCol).cast("long").as("rowId"),
      array(attrCols.map(c => col(c).cast("double")): _*).as("attrs"))
      .as[(String, Long, Seq[Double])]
    rows.map { case (key, id, attrsSeq) =>
      val attrs = attrsSeq.toArray
      val forest = bc.value.getOrElse(key, Array.empty[FlatTree])
      var sum = 0.0
      var t = 0
      while (t < forest.length) {
        val tr = forest(t)
        var i = 0
        while (tr.left(i) >= 0) {
          i = if (attrs(tr.attr(i)) < tr.split(i)) tr.left(i) else tr.right(i)
        }
        sum += tr.leafLen(i)
        t += 1
      }
      val avgLen = if (forest.nonEmpty) sum / forest.length else 0.0
      IsoScore(key, id, if (cn > 0) math.pow(2, -avgLen / cn) else 0.0)
    }
  }

  /** Incremental merge (multi/IsolationForestMerge.scala:68-190): route new
    * records down the existing trees and grow the leaf sizes they land in —
    * returns the updated model. Traversal only; no re-shuffle. */
  def merge(model: Dataset[IsoNode], newData: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String]): Dataset[IsoNode] =
    mergeNodes(model.collect().toSeq, newData, keyCols, attrCols)

  /** [[merge]] over a driver-side node seq (no model collect). */
  def mergeNodes(model: Seq[IsoNode], newData: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String]): Dataset[IsoNode] = {
    val spark = newData.sparkSession
    import spark.implicits._
    val trees = model.groupBy(_.key)
      .map { case (k, ns) => k -> ns.map(n => (n.treeId, n.path) -> n).toMap }
    // tree-id lists precomputed ONCE at the driver — deriving them from the
    // node-key map per incoming row re-allocated and deduped ~trees×2^depth
    // tuples for every record (measured as the dominant q99 cost beyond
    // the fit itself)
    val treeIds: Map[String, Array[Int]] = trees.map { case (k, m) =>
      k -> m.keysIterator.map(_._1).toArray.distinct.sorted
    }
    val bc = spark.sparkContext.broadcast((trees, treeIds))
    val rows = newData.select(
      concat_ws("|", keyCols.map(c => col(c).cast("string")): _*).as("key"),
      array(attrCols.map(c => col(c).cast("double")): _*).as("attrs"))
      .as[(String, Seq[Double])]
    val hits = rows.flatMap { case (key, attrsSeq) =>
      val attrs = attrsSeq.toArray
      val (forests, ids) = bc.value
      val forest = forests.getOrElse(key, Map.empty)
      ids.getOrElse(key, Array.empty[Int]).map { t =>
        var path = "R"
        var node = forest((t, path))
        while (!node.isLeaf) {
          path = path + (if (attrs(node.attr) < node.split) "0" else "1")
          node = forest((t, path))
        }
        (key, t, path)
      }
    }.toDF("key", "treeId", "path")
      .groupBy("key", "treeId", "path").agg(count(lit(1)).as("hits"))
    model.toDF().join(hits, Seq("key", "treeId", "path"), "left")
      .withColumn("size", (col("size") + coalesce(col("hits"), lit(0L))).cast("int"))
      .drop("hits")
      .as[IsoNode]
  }
}
