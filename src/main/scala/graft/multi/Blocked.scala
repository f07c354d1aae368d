package graft.multi

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Blocked all-pairs kernels over embedding tables.
  *
  * Catalyst higher-order functions (zip_with + aggregate) evaluate a
  * lambda per element — fine per row, ~100× too slow for n² pairs. These
  * kernels group vectors into blocks (collect_list per block), cross-join
  * the block pairs, and run tight primitive-array loops per block pair —
  * the Spark shape of a blocked GEMM. Shuffle volume is O(n·d + output),
  * never O(n²·d); per-source top-k is taken inside each block pair so at
  * most blocks·k rows per source reach the final top-k window. Scales by
  * raising nBlocks (block pair fits in one task's memory).
  *
  * Float arithmetic is kept identical to the per-pair oracle expression:
  * sequential ascending-index sums, norms precomputed per vector,
  * cos = dot/(normA·normB). */
object Blocked {

  case class VecRow(id: Long, vec: Array[Double], norm: Double, block: Int)
  case class PairDist(src: Long, trg: Long, dist: Double)
  case class PairCos(a: Long, b: Long, cos: Double)

  private def prep(vecs: DataFrame, idCol: String, vecCol: String,
      nBlocks: Int): Dataset[VecRow] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    vecs.select(col(idCol).cast("long").as("id"),
      transform(col(vecCol), x => x.cast("double")).as("vec"))
      .as[(Long, Seq[Double])]
      .map { case (id, v) =>
        val arr = v.toArray
        var s = 0.0
        var i = 0
        while (i < arr.length) { s += arr(i) * arr(i); i += 1 }
        VecRow(id, arr, math.sqrt(s), (id % nBlocks).toInt)
      }
  }

  /** All-pairs euclidean distances (src ≠ trg), blocked. Same output as a
    * naive cross join — O(n²) rows — use `knn` to keep only top-k. */
  def pairDistances(vecs: DataFrame, idCol: String, vecCol: String,
      nBlocks: Int = 8): Dataset[PairDist] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val blocks = blockify(vecs, idCol, vecCol, nBlocks)
    blocks.joinWith(blocks, lit(true)) // nBlocks² tiny rows; data rides along
      .flatMap { case ((_, as), (_, bs)) =>
        as.iterator.flatMap { a =>
          bs.iterator.filter(_.id != a.id).map { b =>
            PairDist(a.id, b.id, euclid(a.vec, b.vec))
          }
        }
      }
  }

  /** Exact kNN per source: block-pair-local top-k then a global top-k
    * window over blocks·k candidates per source. Ties break on trg id
    * (same rule as the oracle's ORDER BY dist, trg). */
  def knn(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      nBlocks: Int = 8): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val blocks = blockify(vecs, idCol, vecCol, nBlocks)
    val partial = blocks.joinWith(blocks, lit(true))
      .flatMap { case ((_, as), (_, bs)) =>
        as.iterator.flatMap { a =>
          val cand = new java.util.PriorityQueue[PairDist](k + 1,
            (x: PairDist, y: PairDist) => {
              val c = java.lang.Double.compare(y.dist, x.dist) // max-heap
              if (c != 0) c else java.lang.Long.compare(y.trg, x.trg)
            })
          bs.foreach { b =>
            if (b.id != a.id) {
              cand.add(PairDist(a.id, b.id, euclid(a.vec, b.vec)))
              if (cand.size > k) cand.poll()
            }
          }
          cand.iterator().asScala
        }
      }
    val w = Window.partitionBy("src").orderBy(col("dist").asc, col("trg"))
    partial.toDF().withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** All pairs with cosine ≥ threshold (a < b), blocked with the filter
    * inside the loop — output is the only thing shuffled. */
  def cosineNearDup(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBlocks: Int = 8): Dataset[PairCos] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val blocks = blockify(vecs, idCol, vecCol, nBlocks)
    blocks.joinWith(blocks, lit(true))
      .flatMap { case ((bi, as), (bj, bs)) =>
        // each unordered block combo once; within a cross combo every pair
        // appears once regardless of which block holds the smaller id
        if (bi > bj) Iterator.empty
        else if (bi == bj)
          as.iterator.flatMap { a =>
            bs.iterator.filter(b => a.id < b.id)
              .map(b => PairCos(a.id, b.id, dot(a.vec, b.vec) / (a.norm * b.norm)))
              .filter(_.cos >= threshold)
          }
        else
          as.iterator.flatMap { a =>
            bs.iterator
              .map(b => PairCos(math.min(a.id, b.id), math.max(a.id, b.id),
                dot(a.vec, b.vec) / (a.norm * b.norm)))
              .filter(_.cos >= threshold)
          }
      }
  }

  private def blockify(vecs: DataFrame, idCol: String, vecCol: String,
      nBlocks: Int): Dataset[(Int, Seq[VecRow])] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    prep(vecs, idCol, vecCol, nBlocks)
      .groupByKey(_.block)
      .mapGroups { (b, it) => (b, it.toSeq) }
  }

  private def euclid(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
}
