package graft

import graft.model.Fitters
import graft.seq.SeqOps
import org.apache.spark.sql.functions._

/** End-to-end replica of the reference's real-time fraud tutorial
  * (resource/real_time_fraud_prediction_tutorial.txt:17-64, generator
  * resource/xaction_states.rb): transactions carry a 3-letter state —
  * amount L/M/H (35/53/12), type N/H (85/15), elapsed L/N/S (35/45/20) —
  * a Markov transition model is fitted on a clean training population
  * (the tutorial's 5000-customer MarkovStateTransitionModel run), then
  * test customers are scored with the sliding-window Markov chain
  * predictor; injected fraud runs (repeated high-amount/high-risk/short-
  * gap "HHS" bursts, beymani's canonical fraud signature) must surface
  * as O-tagged customers — the executable version of the tutorial's
  * "get the output from the redis fraudQueue" check. */
class MarkovFraudScenarioSpec extends SparkSpec {
  import spark.implicits._

  private def pick(rng: scala.util.Random, items: Seq[(String, Int)]): String = {
    val tot = items.map(_._2).sum
    var r = rng.nextInt(tot)
    items.find { case (_, w) => { r -= w; r < 0 } }.get._1
  }
  private val amountDist = Seq("L" -> 35, "M" -> 53, "H" -> 12)
  private val typeDist = Seq("N" -> 85, "H" -> 15)
  private val elapsedDist = Seq("L" -> 35, "N" -> 45, "S" -> 20)
  private def normalState(rng: scala.util.Random): String =
    pick(rng, amountDist) + pick(rng, typeDist) + pick(rng, elapsedDist)

  test("markov chain predictor surfaces injected HHS fraud runs") {
    val rng = new scala.util.Random(11)
    // training population: 500 customers × 15 transactions of normal
    // behavior (xaction_states.rb draws each field independently)
    val train = (for {
      c <- 0 until 500
      t <- 0 until 15
    } yield (f"cust$c%04d", t.toLong, normalState(rng)))
      .toDF("cid", "seq", "state")
    val model = Fitters.markovTransitions(train, Seq("cid"), "seq", "state",
      smoothing = 0.5)

    // test population: 60 normal customers + 5 fraud customers whose
    // tail transactions are a fraud burst (HHS with p=0.8)
    val test = (for {
      c <- 0 until 65
      t <- 0 until 15
    } yield {
      val fraud = c >= 60 && t >= 5
      val st =
        if (fraud && rng.nextDouble() < 0.8) "HHS" else normalState(rng)
      (f"test$c%04d", t.toLong, st, c >= 60)
    }).toDF("cid", "seq", "state", "injected")

    val scored = SeqOps.markovChainScore(test, model, Seq("cid"), "seq",
      "state", window = 5, metric = "condProb", threshold = 4.0)
    // customer-level alert = any O in the sequence (the redis fraudQueue
    // emission contract: one alert per flagged window)
    val perCust = scored.groupBy("cid")
      .agg(max((col("tag") === "O").cast("int")).as("alerted"),
        max(col("injected").cast("int")).as("inj"))
      .collect()
    val tp = perCust.count(r => r.getInt(2) == 1 && r.getInt(1) == 1).toDouble
    val fn = perCust.count(r => r.getInt(2) == 1 && r.getInt(1) == 0).toDouble
    val fp = perCust.count(r => r.getInt(2) == 0 && r.getInt(1) == 1).toDouble
    val recall = tp / (tp + fn)
    val precision = if (tp + fp > 0) tp / (tp + fp) else 1.0
    info(f"recall=$recall%.3f precision=$precision%.3f (tp=$tp%.0f fp=$fp%.0f fn=$fn%.0f)")
    assert(recall >= 0.99, s"missed fraud customers: recall $recall")
    assert(precision >= 0.7, s"too many normal customers flagged: precision $precision")
  }
}
