package graft

import graft.seq.{SeqOps, SeriesKernels}
import org.apache.spark.sql.functions._

/** End-to-end replica of the reference's retail-sales change-point
  * tutorial (resource/sales_data_change_point_detection_tutorial.txt,
  * generator python/app/cpsale.py:56-80): two products emit hourly sales
  * with a daily cycle; product DK75HUI45X is cannibalized at 60% of the
  * series — a 30-hour slope-−2 decline from N(100,10)·cycle to a new
  * N(40,12)·smaller-cycle regime — while GHT56FGT8K stays stationary.
  * Pipeline = temporal aggregation (chombo TemporalAggregator step) →
  * sliding CVM two-sample change point (window 100/100, crit 0.743 = the
  * tutorial's 0.99 upper-tail MC value for n=m=100) → checkpoint-filter
  * resume; validated like the tutorial's plot step: detections exist for
  * the cannibalized product, cluster around the injected change, and the
  * stationary product stays silent. */
class SalesChangePointScenarioSpec extends SparkSpec {
  import spark.implicits._

  // cpsale.py's 24-point daily cycle (cy), products use 0.7·cy (cy1),
  // 0.7·cy1 (cy2) and the post-change 0.3·cy1 (cy3)
  private val cy = Array(-20.0, -35.0, -55.0, -65.0, -70.0, -70.0, -50.0,
    -30.0, -5.0, 15.0, 35.0, 50.0, 65.0, 65.0, 55.0, 50.0, 40.0, 30.0,
    25.0, 35.0, 30.0, 20.0, 5.0, -15.0)
  private def cy1(h: Int) = 0.7 * cy(h % 24)
  private def cy2(h: Int) = 0.7 * cy1(h)
  private def cy3(h: Int) = 0.3 * cy1(h)

  private val numHours = 480 // 20 days
  private val tsStart = (0.6 * numHours).toInt // 288: decline begins
  private val trEnd = tsStart + 30 // 318: new regime begins

  /** Quarter-hourly sales rows (product, ts-nanos, qty) — finer than the
    * tutorial's hourly series so the temporal-aggregation stage has real
    * work to do; hourly means match cpsale.py's samplers. */
  private lazy val sales = {
    val rng = new scala.util.Random(7)
    val rows = for {
      h <- 0 until numHours
      q <- 0 until 4
    } yield {
      val dk =
        if (h < tsStart) 100.0 + cy1(h) + rng.nextGaussian() * 10.0
        else if (h < trEnd) 100.0 - 2.0 * (h - tsStart) + cy1(h) +
          rng.nextGaussian() * 10.0
        else 40.0 + cy3(h) + rng.nextGaussian() * 12.0
      val gh = 150.0 + 0.01 * h + cy2(h) + rng.nextGaussian() * 20.0
      val ts = (h * 3600L + q * 900L) * 1000000000L
      Seq(("DK75HUI45X", ts, math.max(0.0, dk)),
        ("GHT56FGT8K", ts, math.max(0.0, gh)))
    }
    rows.flatten.toDF("productId", "ts", "qty")
  }

  private def hourly = SeqOps.temporalAggregate(
    sales, Seq("productId"), "ts", "qty", bucketSec = 3600L)

  test("CVM change point fires on the cannibalized product only, near the injected change") {
    val det = SeriesKernels.changePoint(hourly, Seq("productId"),
        "bucket", "avgVal", window = 100, stat = "cvm", critValue = 0.743)
      .toDF().collect()
    val dk = det.filter(_.getAs[String]("key") == "DK75HUI45X")
      .map(_.getAs[Long]("seq"))
    val gh = det.filter(_.getAs[String]("key") == "GHT56FGT8K")
    assert(dk.nonEmpty, "no change point detected for the cannibalized product")
    assert(gh.isEmpty,
      s"false change points on the stationary product at ${gh.map(_.getAs[Long]("seq")).mkString(",")}")
    // every detection within one window of the injected change region —
    // the tutorial's plot check (red lines bracket the visible change)
    val (lo, hi) = (tsStart - 100L, trEnd + 100L)
    assert(dk.forall(s => s >= lo && s <= hi),
      s"detections outside [$lo,$hi]: ${dk.filterNot(s => s >= lo && s <= hi).mkString(",")}")
    info(s"detections for DK75HUI45X at hours ${dk.min}..${dk.max} (${dk.length} positions)")
  }

  test("checkpoint-filter resume re-detects the change from a mid-series checkpoint") {
    val chk = Seq(("DK75HUI45X", 150L), ("GHT56FGT8K", 150L))
      .toDF("productId", "chkpt")
    val resumed = graft.pipeline.Pipeline.checkpointFilter(
      hourly, chk, Seq("productId"), "bucket")
    assert(resumed.where(col("productId") === "DK75HUI45X").count() == numHours - 150L)
    val det = SeriesKernels.changePoint(resumed, Seq("productId"),
        "bucket", "avgVal", window = 100, stat = "cvm", critValue = 0.743)
      .toDF().collect()
    val dk = det.filter(_.getAs[String]("key") == "DK75HUI45X")
      .map(_.getAs[Long]("seq"))
    assert(dk.nonEmpty, "resume pass lost the change point")
    assert(dk.forall(s => s >= tsStart - 100L && s <= trEnd + 100L),
      s"resume detections drifted: ${dk.mkString(",")}")
  }
}
