package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** bandedScan / bandedCumSum / bandedRowNumber must be BIT-IDENTICAL to
  * the flat unpartitioned-window forms they replace (r10/r11 verdict
  * item 1) — including null frames on exclusive scans and negative band
  * keys (integer `div` truncates toward zero yet stays monotone, which
  * is all the device needs). */
class BandedScanSpec extends SparkSpec {

  import core.{BandedAgg, bandedScan}

  // a tie-heavy frame with negative values and multiple value columns
  private lazy val frame = {
    import spark.implicits._
    val rows = (0 until 500).map { i =>
      val v = ((i * 37) % 101) - 50L // [-50, 50], heavy ties
      (v, (i % 7).toLong, i.toDouble / 3.0)
    }
    rows.toDF("v", "c", "x")
  }

  private def flat(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wx = Window.orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("cs", sum(col("c")).over(w))
      .withColumn("mn", min(col("x")).over(wx))
      .withColumn("mx", max(col("x")).over(w))
  }

  test("bandedScan == flat window: sum/min/max, inclusive + exclusive, negative bands") {
    // distinct-v histogram (the shape every call site feeds)
    val h = frame.groupBy("v")
      .agg(sum("c").as("c"), min("x").as("x"))
    val exp = flat(h).orderBy("v").collect()
    val got = bandedScan(h, expr("v div 7"), bandAsc = true,
      tie = Seq(col("v").asc),
      aggs = Seq(BandedAgg("c", "cs"),
        BandedAgg("x", "mn", "min", inclusive = false),
        BandedAgg("x", "mx", "max")))
      .select("v", "c", "x", "cs", "mn", "mx").orderBy("v").collect()
    assert(got.length == exp.length)
    exp.zip(got).foreach { case (e, g) => assert(e == g, s"$e != $g") }
    // first row of the exclusive min is null, like the flat window
    assert(got.head.isNullAt(4))
  }

  test("bandedScan descending order == flat desc window") {
    val h = frame.groupBy("v").agg(sum("c").as("c"))
    val w = Window.orderBy(col("v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = h.withColumn("cs", sum(col("c")).over(w))
      .orderBy("v").collect()
    val got = bandedScan(h, expr("v div 7"), bandAsc = false,
      tie = Seq(col("v").desc), aggs = Seq(BandedAgg("c", "cs")))
      .select("v", "c", "cs").orderBy("v").collect()
    exp.zip(got).foreach { case (e, g) => assert(e == g, s"$e != $g") }
  }

  test("banded plan has no unpartitioned window over the data-sized frame") {
    val h = frame.groupBy("v").agg(sum("c").as("c"))
    val df = bandedScan(h, expr("v div 7"), bandAsc = true,
      tie = Seq(col("v").asc), aggs = Seq(BandedAgg("c", "cs")))
    df.collect()
    // every WindowExec either partitions by the band or rides the
    // band histogram (strictly smaller than the distinct-v frame)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("windowspecdefinition(_bcs_band"))
  }
}
