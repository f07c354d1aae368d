package graft

import graft.core._
import graft.model.Fitters
import graft.score.Scorers
import graft.score.Scorers.Cfg
import org.apache.spark.sql.functions._

/** End-to-end replica of the reference's cpu_usage tutorial
  * (python/app/cpu_usage.py:24-99, resource/cpu_usage_anomaly_det_tutorial.txt,
  * FIXTURES.md §1): per-server Gaussian usage with weekday N(60,12) /
  * weekend N(30,8) regimes, ~8% injected anomalies (weekday 94-100,
  * weekend 54-100); pipeline = seasonal fit → score → clean-data refit →
  * rescore; validated by recall/precision on the injected rows — the
  * executable version of the tutorial's `grep ,O | wc -l` check. */
class CpuUsageScenarioSpec extends SparkSpec {
  import spark.implicits._

  test("seasonal zscore pipeline recovers injected cpu anomalies after clean refit") {
    val rng = new scala.util.Random(42)
    val rows = for {
      server <- Seq("srv0", "srv1", "srv2", "srv3")
      day <- 0 until 14
      slot <- 0 until 144 // 10-minute samples
    } yield {
      val tsNanos = ((day * 86400L) + slot * 600L) * 1000000000L
      val weekend = (day + 3) % 7 >= 5 // epoch day 0 = Thursday
      val base =
        if (weekend) 30.0 + rng.nextGaussian() * 8.0
        else 60.0 + rng.nextGaussian() * 12.0
      val inject = rng.nextDouble() < 0.08
      val usage =
        if (inject && weekend) 54.0 + rng.nextDouble() * 46.0
        else if (inject) 94.0 + rng.nextDouble() * 6.0
        else base
      (server, tsNanos, math.max(0.0, math.min(100.0, usage)), inject)
    }
    val data = rows.toDF("serverId", "ts", "usage", "injected")
    val seasonal = Seasonal.withCycle(data, "ts", "weekDayOrWeekendOfWeek")
    val keys = Seq("serverId", "cycleType", "cycleIndex")

    // pass 1: fit on contaminated data, loose threshold, drop outliers
    val stats1 = Fitters.stats(seasonal, keys, Seq("usage"))
    val pass1 = Scorers.zscore(seasonal, stats1, Cfg(keys, Seq("usage"), threshold = 2.0))
    val clean = Scorers.cleanData(pass1)

    // pass 2: refit on clean data (the tutorial's numStat rerun), rescore all
    val stats2 = Fitters.stats(clean, keys, Seq("usage"))
    val scored = Scorers.zscore(seasonal, stats2, Cfg(keys, Seq("usage"), threshold = 2.33))

    val eval = scored.select(
      col("injected"),
      (col("tag") === "O").as("flagged")).collect()
    val tp = eval.count(r => r.getBoolean(0) && r.getBoolean(1)).toDouble
    val fn = eval.count(r => r.getBoolean(0) && !r.getBoolean(1)).toDouble
    val fp = eval.count(r => !r.getBoolean(0) && r.getBoolean(1)).toDouble
    val recall = tp / (tp + fn)
    val precision = tp / (tp + fp)
    info(f"recall=$recall%.3f precision=$precision%.3f (tp=$tp%.0f fp=$fp%.0f fn=$fn%.0f)")
    assert(recall > 0.7, s"recall $recall")
    assert(precision > 0.5, s"precision $precision")
  }
}
