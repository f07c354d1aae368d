package graft.seq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to every left row the latest right-side values with
  * `right.ts <= left.ts` per key — the natural shape for applying
  * time-versioned models/thresholds to an event stream (an engine addition
  * beyond the reference, which has no temporal join at all).
  *
  * Implementation composes built-ins (preference ladder tier (a)): union
  * both sides with a source tag, one window pass per key ordered by
  * (ts, side) with `last(..., ignoreNulls)` carrying the right-side values
  * forward; right rows sort before left rows at equal ts so an exact
  * timestamp matches. One shuffle+sort total — same cost class as any
  * windowed op, no range-join explosion. */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, rightValueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = rightValueCols.foldLeft(left)(
      (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType)))
      .withColumn("_side", lit(1))
    val rTagged = leftCols.filterNot(keyCols.contains).filterNot(_ == tsCol)
      .foldLeft(right.select((keyCols ++ Seq(tsCol) ++ rightValueCols).map(col): _*))(
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .withColumn("_side", lit(0))
    val unioned = lTagged.unionByName(rTagged.select(lTagged.columns.map(col): _*))
    if (keyCols.nonEmpty) {
      val w = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(col(tsCol), col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val filled = rightValueCols.foldLeft(unioned)((df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
      filled.where(col("_side") === 1).drop("_side")
    } else {
      // keyless as-of: a flat Window.orderBy(ts) would sort the whole
      // merged frame on ONE task — run the running last-non-null through
      // the banded device instead (r11 verdict item 1): per-band fills
      // ride band-partitioned windows; each band's LAST filled value
      // (the max-(ts, _side) row's fill — struct max, total order) feeds
      // an exclusive last-non-null over the band HISTOGRAM; the final
      // fill coalesces within-band fill with the prior-band offset.
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val band = unioned.schema(tsCol).dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          // integral ts (r12 advice): the fractional path's ×1000
          // fixed-point scale-up overflows long on epoch-nanos
          // magnitudes (~1.7e18) and ANSI-throws — band with an integer
          // `div` over ~1024 equal-width range buckets instead. The
          // (min, max) probe is one model-sized agg at plan-build time;
          // banding is monotone in ts and exact in long arithmetic, and
          // the result is band-independent by the device's contract.
          val r = unioned.agg(min(col(tsCol)).cast("long"),
            max(col(tsCol)).cast("long")).head()
          if (r.isNullAt(0)) lit(0L)
          else {
            val t0 = r.getLong(0)
            val width = math.max(1L, (r.getLong(1) - t0) / 1024L + 1L)
            expr(s"(CAST(`$tsCol` AS BIGINT) - ${t0}L) div ${width}L")
          }
        case _ =>
          // fractional ts: 3dp fixed-point freeze (monotone). Contract:
          // |ts| < ~9e15 so the ×1000 scale-up stays exact in long —
          // integral epoch-scale values take the branch above.
          graft.core.fixedPointLong(col(tsCol).cast("double"), 3)
      }
      val withBand = unioned.withColumn("_asof_band", band)
      val ww = Window.partitionBy(col("_asof_band"))
        .orderBy(col(tsCol), col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val filledIn = rightValueCols.foldLeft(withBand)((df, c) =>
        df.withColumn(s"_f_$c", last(col(c), ignoreNulls = true).over(ww)))
      val bandAggs = rightValueCols.map(c =>
        max(struct(col(tsCol), col("_side"), col(s"_f_$c"))).as(s"_bl_$c"))
      val bandLast = filledIn.groupBy(col("_asof_band"))
        .agg(bandAggs.head, bandAggs.tail: _*)
      val hw = Window.orderBy(col("_asof_band").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = bandLast.select(col("_asof_band") +:
        rightValueCols.map(c =>
          last(col(s"_bl_$c").getField(s"_f_$c"), ignoreNulls = true)
            .over(hw).as(s"_off_$c")): _*)
      val joined = filledIn.join(off, "_asof_band")
      rightValueCols.foldLeft(joined)((df, c) =>
          df.withColumn(c, coalesce(col(s"_f_$c"), col(s"_off_$c"))))
        .where(col("_side") === 1)
        .drop("_asof_band" +: "_side" +:
          rightValueCols.flatMap(c => Seq(s"_f_$c", s"_off_$c")): _*)
    }
  }

  /** Interval (band/range) join: every point row gains the interval rows
    * whose [lo, hi] contains its value, per key — IP-range tables, price
    * bands, score-calibration bands. The naive `p.x BETWEEN i.lo AND i.hi`
    * theta-join plans as BroadcastNestedLoop: O(points × intervals) work
    * that stops being a join at all once the interval side outgrows a
    * broadcast. Bucketize instead (the standard range-join trick Spark
    * lacks natively): pick a bucket width from the interval table (mean
    * span — a model-sized agg), explode each interval into the fixed-width
    * buckets it covers, bucket each point ONCE, equi-join on (key, bucket)
    * and keep the residual BETWEEN. A point's bucket is unique, so every
    * qualifying pair is produced exactly once — no dedup pass. Intervals
    * wider than `maxBucketsPerInterval` buckets (rare outliers in real
    * range tables) take a broadcast residual path instead of exploding.
    *
    * Scale shape: the interval side expands by ~span/width ≈ a small
    * constant per row; both sides then hash-partition on (key, bucket) —
    * a plain shuffle equi-join that AQE can also skew-split, with the
    * point side never replicated. */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], ptCol: String, loCol: String, hiCol: String,
      maxBucketsPerInterval: Int = 256): DataFrame = {
    val span = col(hiCol) - col(loCol)
    val stats = intervals.agg(avg(span)).collect()(0)
    // empty interval table: the join is empty — keep the joined schema
    val w =
      if (stats.isNullAt(0)) 1.0
      else math.max(stats.getDouble(0), 1e-9)
    val narrow = intervals.where(span / w <= maxBucketsPerInterval)
    val wide = intervals.where(span / w > maxBucketsPerInterval)
    val exploded = narrow.withColumn("_b",
      explode(sequence(floor(col(loCol) / w).cast("long"),
        floor(col(hiCol) / w).cast("long"))))
    val pts = points.withColumn("_b", floor(col(ptCol) / w).cast("long"))
    val matched = pts
      .join(exploded, keyCols :+ "_b")
      .where(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_b")
    val extraCols = intervals.columns.filterNot(keyCols.contains).toSeq
    val wKeyed = wide.select(
      keyCols.map(c => col(c).as(s"_r_$c")) ++ extraCols.map(col): _*)
    val cond = keyCols.map(c => col(c) === col(s"_r_$c")).reduce(_ && _) &&
      col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol)
    val wideMatched = points.join(broadcast(wKeyed), cond)
      .drop(keyCols.map(c => s"_r_$c"): _*)
    matched.unionByName(wideMatched.select(matched.columns.map(col): _*))
  }
}
