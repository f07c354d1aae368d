package graft.seq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Bounded sliding-frame kernels with partition-boundary halo exchange —
  * the scale path past the one-task-per-key ceiling of window functions.
  *
  * `SeqOps.changePointMeanShift` (misc/ChangePointDetector.scala:108-139
  * re-expressed as window aggregates) is correct but its parallelism is
  * capped at the key cardinality: `Window.partitionBy(key)` puts each
  * key's whole series in one task (SCALING.md §8). On a 1000-executor
  * cluster scoring 5 event types that is 5 busy cores. This kernel
  * instead:
  *
  *  1. range-partitions on (key, seq) — one key's series is *split
  *     across* consecutive partitions, so parallelism is data-sized,
  *     not key-sized;
  *  2. exchanges a `window`-row halo between neighbouring partitions
  *     (first/last rows per partition, collected and stitched on the
  *     driver — ≤ 2·window·numPartitions tiny rows, broadcast back);
  *  3. computes each two-flank frame inside a tight per-partition loop
  *     that replicates WindowExec's arithmetic exactly — ascending-index
  *     summation for `avg`, the Welford/CentralMomentAgg update chain for
  *     `var_samp` — so output is bit-identical to the window formulation
  *     and passes the same DuckDB oracle.
  *
  * The intermediate sorted RDD is persisted (one sort, two passes —
  * boundary extraction + compute); Spark's ContextCleaner unpersists it
  * once the returned plan is released. Per-task memory is
  * O(rows-per-partition), tunable via `numPartitions` — no per-key
  * ceiling.
  */
object HaloWindows {
  import SeriesKernels.{SPoint, SScore}

  /** Change-point via two-flank mean-shift statistic — same semantics and
    * bit-identical output to [[SeqOps.changePointMeanShift]] (Welch-style
    * |mean_R − mean_L| / sqrt(varL/w + varR/w) over the two full w-row
    * frames flanking each position; emit rows with stat ≥ critValue).
    * Output columns: key (keyCols joined with "|"), seq, value, stat. */
  def changePointMeanShift(
      data: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      valCol: String,
      window: Int,
      critValue: Double,
      numPartitions: Int = 0): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val p =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val w = window
    val crit = critValue
    // null values are dropped up front (same as the window variant: a null
    // row must not count toward frame fullness)
    val base = data
      .where(col(valCol).isNotNull)
      .select(
        concat_ws("|", keyCols.map(c => col(c).cast("string")): _*).as("key"),
        col(seqCol).cast("long").as("seq"),
        col(valCol).cast("double").as("value"))
      .as[SPoint]
      .repartitionByRange(p, $"key", $"seq")
      .sortWithinPartitions($"key", $"seq", $"value")
      .rdd
    base.persist(StorageLevel.MEMORY_AND_DISK)

    // pass 1: first/last w rows of every partition (ring buffer, O(w) heap)
    val edges = base.mapPartitionsWithIndex { (pid, it) =>
      val head = scala.collection.mutable.ArrayBuffer.empty[SPoint]
      val tail = new java.util.ArrayDeque[SPoint](w + 1)
      it.foreach { r =>
        if (head.length < w) head += r
        tail.addLast(r)
        if (tail.size > w) tail.removeFirst()
      }
      Iterator.single((pid, head.toArray, tail.toArray(Array.empty[SPoint])))
    }.collect()

    // driver-side stitch: the left halo of partition i is the last w rows
    // of everything before it, walked through neighbours so that empty or
    // shorter-than-w partitions (range sampling produces them on skewed or
    // low-cardinality boundaries) don't truncate the context
    val nP = base.getNumPartitions
    val heads = Array.fill(nP)(Array.empty[SPoint])
    val tails = Array.fill(nP)(Array.empty[SPoint])
    edges.foreach { case (pid, h, t) => heads(pid) = h; tails(pid) = t }
    val leftHalo = Array.fill(nP)(Array.empty[SPoint])
    val rightHalo = Array.fill(nP)(Array.empty[SPoint])
    for (pid <- 1 until nP)
      leftHalo(pid) = (leftHalo(pid - 1) ++ tails(pid - 1)).takeRight(w)
    for (pid <- nP - 2 to 0 by -1)
      rightHalo(pid) = (heads(pid + 1) ++ rightHalo(pid + 1)).take(w)
    val bcL = spark.sparkContext.broadcast(leftHalo)
    val bcR = spark.sparkContext.broadcast(rightHalo)

    // pass 2: per-partition compute over halo ++ owned ++ halo; emit owned
    // rows only, so nothing is double-counted
    val out = base.mapPartitionsWithIndex { (pid, it) =>
      val lh = bcL.value(pid)
      val rh = bcR.value(pid)
      val owned = it.toArray
      if (owned.isEmpty) Iterator.empty
      else {
        val all = lh ++ owned ++ rh
        val n = all.length
        // key-run extents: frames never cross a key boundary
        val runStart = new Array[Int](n)
        val runEnd = new Array[Int](n)
        var i = 0
        while (i < n) {
          runStart(i) = if (i > 0 && all(i).key == all(i - 1).key) runStart(i - 1) else i
          i += 1
        }
        i = n - 1
        while (i >= 0) {
          runEnd(i) = if (i < n - 1 && all(i).key == all(i + 1).key) runEnd(i + 1) else i + 1
          i -= 1
        }
        val res = scala.collection.mutable.ArrayBuffer.empty[SScore]
        var g = lh.length
        val end = lh.length + owned.length
        while (g < end) {
          // full-frame check from run extents — same as the window
          // variant's row-position fullness counts
          if (g - runStart(g) >= w && runEnd(g) - g >= w) {
            val (mL, vL) = meanVar(all, g - w, g)
            val (mR, vR) = meanVar(all, g, g + w)
            val den = math.sqrt(vL / w + vR / w)
            val diff = math.abs(mR - mL)
            val stat =
              if (den > 0) diff / den
              else if (diff > 0) Double.PositiveInfinity
              else 0.0
            if (stat >= crit) res += SScore(all(g).key, all(g).seq, all(g).value, stat)
          }
          g += 1
        }
        res.iterator
      }
    }
    spark.createDataset(out).toDF("key", "seq", "value", "stat")
  }

  /** Frame mean and sample variance with WindowExec's exact arithmetic:
    * mean = ascending-index sum / count (Average), variance = the
    * Welford update chain (CentralMomentAgg) over ascending indices —
    * SlidingWindowFunctionFrame re-aggregates the full frame per output
    * row in row order, and this replicates that bit-for-bit. */
  private def meanVar(a: Array[SPoint], from: Int, until: Int): (Double, Double) = {
    var s = 0.0
    var i = from
    while (i < until) { s += a(i).value; i += 1 }
    var cnt = 0.0
    var m = 0.0
    var m2 = 0.0
    i = from
    while (i < until) {
      cnt += 1.0
      val v = a(i).value
      val d = v - m
      val dN = d / cnt
      m += dN
      m2 += d * (d - dN)
      i += 1
    }
    (s / (until - from), m2 / (cnt - 1.0))
  }
}
