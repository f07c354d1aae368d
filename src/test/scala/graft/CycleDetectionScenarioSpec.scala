package graft

import graft.seq.SeqOps
import org.apache.spark.sql.functions._

/** End-to-end replica of the reference's cycle-detection tutorial
  * (resource/cycle_detection_tutorial.txt, resource/cyd.sh, python
  * generator cpsale.py family): raw events are first rolled into fixed
  * time buckets (chombo TemporalAggregator, cyd.sh:29), then a set of
  * CANDIDATE lags is autocorrelated and the lag with the highest
  * correlation is the detected cycle. The spec injects a known daily
  * cycle (period 24 buckets) plus a weekly envelope (period 168) into
  * per-store sales and asserts the pipeline recovers both: 24 must beat
  * every non-multiple candidate, and 168 must top the weekly candidates. */
class CycleDetectionScenarioSpec extends SparkSpec {
  import spark.implicits._

  test("temporal aggregate + candidate-lag autocorrelation finds the daily cycle") {
    val rng = new scala.util.Random(11)
    val hourNs = 3600L * 1000000000L
    // 6 weeks of per-10-min sales events, 2 stores: daily sine + weekly
    // weekend lift + noise — raw events arrive un-bucketed, as in the
    // tutorial's generator
    val rows = for {
      store <- Seq("s0", "s1")
      hour <- 0 until (6 * 7 * 24)
      sub <- 0 until 6
    } yield {
      val daily = math.sin(2 * math.Pi * (hour % 24) / 24.0)
      val weekly = if ((hour / 24) % 7 >= 5) 1.5 else 0.0
      val v = 10.0 + 4.0 * daily + weekly + rng.nextGaussian() * 0.8
      (store, hour.toLong * hourNs + sub * 600L * 1000000000L, v)
    }
    val ev = rows.toDF("store", "ts", "amount")

    // stage 1: 1-hour buckets (6 raw events collapse per bucket)
    val buckets = SeqOps.temporalAggregate(ev, Seq("store"), "ts", "amount",
      bucketSec = 3600L)
      .select(col("store"), col("bucket"), col("avgVal"))

    // stage 2: candidate lags from the tutorial flow — the truth (24,
    // 168), harmonics, and decoys
    val candidates = Seq(6, 11, 24, 37, 48, 100, 168)
    val ac = SeqOps.autocorrelation(buckets, Seq("store"), "bucket",
      "avgVal", candidates)
      .collect()
      .groupBy(_.getAs[String]("store"))
      .map { case (s, rs) =>
        s -> rs.map(r => r.getAs[Int]("lag") -> r.getAs[Double]("ac")).toMap
      }

    ac.foreach { case (store, byLag) =>
      val best = byLag.maxBy(_._2)._1
      // the winning lag must be the daily cycle or one of its harmonics
      // (48 and 168 are also true cycles of the signal)
      assert(Set(24, 48, 168).contains(best),
        s"$store: best lag $best, correlations $byLag")
      // the daily cycle beats every decoy lag outright
      Seq(6, 11, 37, 100).foreach { d =>
        assert(byLag(24) > byLag(d),
          s"$store: lag 24 (${byLag(24)}) must beat decoy $d (${byLag(d)})")
      }
      // the weekly envelope makes 168 beat the non-multiple decoys too
      assert(byLag(168) > byLag(100),
        s"$store: weekly 168 (${byLag(168)}) must beat decoy 100 (${byLag(100)})")
      // and the detected daily correlation is strong in absolute terms
      assert(byLag(24) > 0.5, s"$store: daily ac too weak: ${byLag(24)}")
    }
  }
}
