package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** bandedScan / bandedCumSum / bandedRowNumber must be BIT-IDENTICAL to
  * the flat unpartitioned-window forms they replace (r10/r11 verdict
  * item 1) — including null frames on exclusive scans and negative band
  * keys (integer `div` truncates toward zero yet stays monotone, which
  * is all the device needs). Since r13 the devices carry a size-gated
  * flat-window crossover (r12 verdict item 3): tiny frames route through
  * the ordinary window (one stage), big frames keep the banded shape —
  * the banded-path tests here pin the crossover OFF via
  * spark.graft.bandedScan.flatMaxBytes=0, and the crossover test pins
  * both routings and their equality.
  */
class BandedScanSpec extends SparkSpec {

  import core.{BandedAgg, bandedScan}

  /** Run `body` with the flat-window crossover bound forced to `v`. */
  private def withFlatMaxBytes[T](v: Long)(body: => T): T = {
    val key = "spark.graft.bandedScan.flatMaxBytes"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, v.toString)
    try body
    finally old match {
      case Some(o) => spark.conf.set(key, o)
      case None => spark.conf.unset(key)
    }
  }

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
    withFlatMaxBytes(0L) {
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
  }

  test("bandedScan descending order == flat desc window") {
    withFlatMaxBytes(0L) {
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
  }

  test("banded plan has no unpartitioned window over the data-sized frame") {
    withFlatMaxBytes(0L) {
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

  test("flat crossover: small frames route flat, big bound-0 frames stay banded, results equal") {
    val h = frame.groupBy("v").agg(sum("c").as("c"))
    def scan() = bandedScan(h, expr("v div 7"), bandAsc = true,
      tie = Seq(col("v").asc), aggs = Seq(BandedAgg("c", "cs")))
    def rank() = core.bandedRowNumber(h, expr("v div 7"), bandAsc = true,
      tie = Seq(col("v").asc), out = "rk")
    // default bound (128 MB): a 101-row frame is flat — single window
    // stage on the metered-small marker, no band histogram stages
    val flatScan = scan()
    val pf = flatScan.queryExecution.executedPlan.toString
    assert(pf.contains("_bcs_flat") && !pf.contains("_bcs_band"), pf.take(500))
    val pr = rank().queryExecution.executedPlan.toString
    assert(pr.contains("_brn_flat") && !pr.contains("_brn_band"), pr.take(500))
    // WindowAudit must classify the flat-crossover window as bounded
    // (metered-small), never "open" — the WindowGuardSpec gate depends on it
    val finds = tools.WindowAudit.unpartitionedWindows(flatScan)
    assert(finds.nonEmpty && finds.forall(_.kind == "metered-small"), s"$finds")
    // bound 0 → banded shape; values bit-identical across the two paths
    val (bScan, bRank) = withFlatMaxBytes(0L) {
      (scan().orderBy("v").collect(), rank().orderBy("v").collect())
    }
    val fScan = scan().orderBy("v").collect()
    val fRank = rank().orderBy("v").collect()
    bScan.zip(fScan).foreach { case (e, g) => assert(e == g, s"$e != $g") }
    bRank.zip(fRank).foreach { case (e, g) => assert(e == g, s"$e != $g") }
  }
}
