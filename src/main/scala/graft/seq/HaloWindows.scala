package graft.seq

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Bounded sliding-frame kernels with partition-boundary halo exchange —
  * the scale path past the one-task-per-key ceiling of window functions.
  *
  * `SeqOps.changePointMeanShift` (misc/ChangePointDetector.scala:108-139
  * re-expressed as window aggregates) is correct but its parallelism is
  * capped at the key cardinality: `Window.partitionBy(key)` puts each
  * key's whole series in one task (SCALING.md §8). On a 1000-executor
  * cluster scoring 5 event types that is 5 busy cores. These kernels
  * instead:
  *
  *  1. range-partition on (key, seq) — one key's series is *split
  *     across* consecutive partitions, so parallelism is data-sized,
  *     not key-sized;
  *  2. exchange a bounded halo between neighbouring partitions
  *     (first/last rows per partition, collected and stitched on the
  *     driver — ≤ (leftW+rightW)·numPartitions tiny rows, broadcast
  *     back);
  *  3. compute each two-flank frame inside a tight per-partition loop
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

  /** A level-shifted row surviving the halo z-test: `isNew` marks the
    * first row of its contiguous shifted run (its predecessor in the key
    * series was not shifted). */
  case class SShift(key: String, seq: Long, z: Double, isNew: Int)

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
    val w = window
    val crit = critValue
    val base = rangeSorted(data, keyCols, seqCol, valCol, numPartitions)
    val out = haloCompute[SScore](base, leftW = w, rightW = w) { (all, s, e) =>
      val (runStart, runEnd) = runExtents(all)
      val res = scala.collection.mutable.ArrayBuffer.empty[SScore]
      var g = s
      while (g < e) {
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
    spark.createDataset(out).toDF("key", "seq", "value", "stat")
  }

  /** Level-shift segmentation — same semantics as
    * [[SeqOps.levelShiftSegments]] on null-free input, per-row z
    * bit-identical. The halo kernel emits only the shifted rows (signed
    * two-flank z with |z| ≥ minZ), each tagged `isNew` when its
    * predecessor row in the key series is not shifted; the predecessor's
    * z is computable locally because the left halo carries `window`+1
    * rows. Segment assembly then runs declaratively over the sparse
    * shifted set — a running sum of `isNew` is the segment id, so a
    * segment spanning a partition boundary is stitched by the (tiny)
    * window aggregation, not by task-local state.
    * Output columns: key, segStart, segEnd, n, avgShift. */
  def levelShiftSegments(
      data: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      valCol: String,
      window: Int,
      minZ: Double,
      numPartitions: Int = 0): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val w = window
    val base = rangeSorted(data, keyCols, seqCol, valCol, numPartitions)
    val out = haloCompute[SShift](base, leftW = w + 1, rightW = w) { (all, s, e) =>
      val (runStart, runEnd) = runExtents(all)
      // signed z, NaN when frames are not full or the variance term is 0
      // (the window variant leaves z null in both cases)
      def z(g: Int): Double =
        if (g - runStart(g) >= w && runEnd(g) - g >= w) {
          val (mL, vL) = meanVar(all, g - w, g)
          val (mR, vR) = meanVar(all, g, g + w)
          val den = math.sqrt(vL / w + vR / w)
          if (den > 0) (mR - mL) / den else Double.NaN
        } else Double.NaN
      val res = scala.collection.mutable.ArrayBuffer.empty[SShift]
      var g = s
      while (g < e) {
        val zg = z(g)
        if (!java.lang.Double.isNaN(zg) && math.abs(zg) >= minZ) {
          val zp = if (g > runStart(g)) z(g - 1) else Double.NaN
          val prevShifted = !java.lang.Double.isNaN(zp) && math.abs(zp) >= minZ
          res += SShift(all(g).key, all(g).seq, zg, if (prevShifted) 0 else 1)
        }
        g += 1
      }
      res.iterator
    }
    val shifted = spark.createDataset(out).toDF("key", "seq", "z", "isNew")
    val wk = Window.partitionBy("key").orderBy("seq")
    shifted
      .withColumn("segId",
        sum("isNew").over(wk.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("key", "segId")
      .agg(
        min("seq").as("segStart"),
        max("seq").as("segEnd"),
        count(lit(1)).as("n"),
        avg("z").as("avgShift"))
      .drop("segId")
  }

  /** Canonical (key, seq, value) rows, range-partitioned on (key, seq) and
    * sorted within partitions. Null values are dropped up front (same as
    * the window variants' count-of-non-null frame fullness on null-free
    * data: a null row must not count toward frame fullness). */
  private def rangeSorted(data: DataFrame, keyCols: Seq[String],
      seqCol: String, valCol: String, numPartitions: Int): RDD[SPoint] = {
    val spark = data.sparkSession
    import spark.implicits._
    val p =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    data
      .where(col(valCol).isNotNull)
      .select(
        concat_ws("|", keyCols.map(c => col(c).cast("string")): _*).as("key"),
        col(seqCol).cast("long").as("seq"),
        col(valCol).cast("double").as("value"))
      .as[SPoint]
      .repartitionByRange(p, $"key", $"seq")
      .sortWithinPartitions($"key", $"seq", $"value")
      .rdd
  }

  /** Two-pass halo execution over a range-sorted base: pass 1 collects the
    * first `rightW` / last `leftW` rows of every partition and stitches
    * them on the driver — walking through neighbours so that empty or
    * shorter-than-halo partitions (range sampling produces them on skewed
    * or low-cardinality boundaries) don't truncate the context; pass 2
    * runs `compute(all, ownedStart, ownedEnd)` over halo ++ owned ++ halo
    * per partition, emitting owned rows only so nothing is double-counted. */
  private def haloCompute[T: scala.reflect.ClassTag](
      base: RDD[SPoint], leftW: Int, rightW: Int)(
      compute: (Array[SPoint], Int, Int) => Iterator[T]): RDD[T] = {
    base.persist(StorageLevel.MEMORY_AND_DISK)
    val edges = base.mapPartitionsWithIndex { (pid, it) =>
      val head = scala.collection.mutable.ArrayBuffer.empty[SPoint]
      val tail = new java.util.ArrayDeque[SPoint](leftW + 1)
      it.foreach { r =>
        if (head.length < rightW) head += r
        tail.addLast(r)
        if (tail.size > leftW) tail.removeFirst()
      }
      Iterator.single((pid, head.toArray, tail.toArray(Array.empty[SPoint])))
    }.collect()

    val nP = base.getNumPartitions
    val heads = Array.fill(nP)(Array.empty[SPoint])
    val tails = Array.fill(nP)(Array.empty[SPoint])
    edges.foreach { case (pid, h, t) => heads(pid) = h; tails(pid) = t }
    val leftHalo = Array.fill(nP)(Array.empty[SPoint])
    val rightHalo = Array.fill(nP)(Array.empty[SPoint])
    for (pid <- 1 until nP)
      leftHalo(pid) = (leftHalo(pid - 1) ++ tails(pid - 1)).takeRight(leftW)
    for (pid <- nP - 2 to 0 by -1)
      rightHalo(pid) = (heads(pid + 1) ++ rightHalo(pid + 1)).take(rightW)
    val sc = base.sparkContext
    val bcL = sc.broadcast(leftHalo)
    val bcR = sc.broadcast(rightHalo)

    base.mapPartitionsWithIndex { (pid, it) =>
      val lh = bcL.value(pid)
      val rh = bcR.value(pid)
      val owned = it.toArray
      if (owned.isEmpty) Iterator.empty
      else compute(lh ++ owned ++ rh, lh.length, lh.length + owned.length)
    }
  }

  /** Per-index key-run extents over the stitched array: frames never
    * cross a key boundary. */
  private def runExtents(all: Array[SPoint]): (Array[Int], Array[Int]) = {
    val n = all.length
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
    (runStart, runEnd)
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
