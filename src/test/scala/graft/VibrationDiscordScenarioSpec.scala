package graft

import graft.seq.SeriesKernels
import org.apache.spark.sql.functions._

/** End-to-end replica of the reference's machinery-fault tutorial
  * (resource/machinary_fault_detection_with_subsequence_anomaly_tutorial
  * .txt, generator python/app/bvib.py:35-104): bearing vibration is a
  * sum of sinusoids plus noise per machine; a fault replaces a segment
  * with a different spectral signature (`iol` op). Detector = the
  * sub-sequence discord kernel (min RMS distance to every
  * non-overlapping reference window): the faulted segment has no
  * lookalike elsewhere in the series, so its windows score highest;
  * validated by the top-score window landing inside the injected
  * segment and the healthy machine scoring flat. */
class VibrationDiscordScenarioSpec extends SparkSpec {
  import spark.implicits._

  test("discord top window lands inside the injected fault segment") {
    val rng = new scala.util.Random(23)
    def healthy(t: Int) = 52.0 * math.sin(76 + 0.40 * t) +
      40.0 * math.sin(20 + 0.20 * t) + 5.0 * math.sin(7 + 0.80 * t)
    def faulty(t: Int) = 36.0 * math.sin(0.12 * t) + 30.0 * math.sin(0.08 * t)
    val (faultLo, faultHi) = (1200, 1280)
    val rows = for {
      m <- Seq("HG56SDFE", "K87JG9F6")
      t <- 0 until 2000
    } yield {
      val inFault = m == "HG56SDFE" && t >= faultLo && t < faultHi
      val v = (if (inFault) faulty(t) else healthy(t)) + rng.nextGaussian() * 3.0
      (m, t.toLong, v)
    }
    val data = rows.toDF("machine", "t", "amp")
    val window = 64
    val scored = SeriesKernels.subSequenceDistanceFast(data, Seq("machine"),
      "t", "amp", window).toDF().collect()
    def top(m: String) = scored.filter(_.getAs[String]("key") == m)
      .maxBy(_.getAs[Double]("score"))
    val faultTop = top("HG56SDFE")
    val cleanTop = top("K87JG9F6")
    val pos = faultTop.getAs[Long]("seq")
    info(f"fault top @$pos score=${faultTop.getAs[Double]("score")}%.2f " +
      f"clean max=${cleanTop.getAs[Double]("score")}%.2f")
    assert(pos >= faultLo - window && pos < faultHi,
      s"top discord at $pos, fault at [$faultLo,$faultHi)")
    assert(faultTop.getAs[Double]("score") > 3.0 * cleanTop.getAs[Double]("score"),
      "fault discord does not dominate the healthy machine's max")
  }
}
