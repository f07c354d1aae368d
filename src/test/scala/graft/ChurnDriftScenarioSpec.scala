package graft

import graft.drift.Drift
import org.apache.spark.sql.functions._

/** End-to-end replica of the reference's unsupervised model-drift
  * tutorial (resource/unsup_model_drift_detection_tutorial.txt,
  * generator python/app/codrift.py:201-230 `genrc` churn data + linTrans
  * abrupt drift): a deployed churn model's INPUT distribution is
  * monitored without labels — reference window vs current window, local
  * density comparison (the tutorial's nearest-neighbor-count check;
  * the engine's grid-bucketed analogue). No-drift current window must
  * stay silent; a scale/shift-transformed current window must flag the
  * drifted region. */
class ChurnDriftScenarioSpec extends SparkSpec {
  import spark.implicits._

  // codrift.py genrc: per-customer (tenure-ish, spend-ish) features —
  // churners N(50,10) on spend, retained N(150,15)
  private def churnWindow(seed: Int, n: Int, scale: Double, shift: Double) = {
    val rng = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val churner = rng.nextInt(100) < 30
      val spend =
        if (churner) 50.0 + rng.nextGaussian() * 10.0
        else 150.0 + rng.nextGaussian() * 15.0
      val tenure = 24.0 + rng.nextGaussian() * 8.0
      (spend * scale + shift, math.max(0.0, tenure))
    }.toDF("spend", "tenure")
  }

  test("local density drift: silent on a fresh same-distribution window, fires after linTrans") {
    val ref = churnWindow(1, 2000, 1.0, 0.0)
    val same = churnWindow(2, 2000, 1.0, 0.0)
    val drifted = churnWindow(3, 2000, 1.3, 20.0) // codrift linTrans abrupt drift
    val widths = Seq(25.0, 8.0)
    val silent = Drift.localDensityDrift(ref, same, Seq("spend", "tenure"),
      widths, threshold = 0.05, minCount = 10L)
    assert(silent.where(col("drift")).count() == 0,
      "false drift on an identically-distributed window")
    val fired = Drift.localDensityDrift(ref, drifted, Seq("spend", "tenure"),
      widths, threshold = 0.05, minCount = 10L)
    val hot = fired.where(col("drift")).count()
    assert(hot >= 1, "linTrans-shifted window not flagged")
    info(s"drifted cells flagged: $hot")
  }
}
