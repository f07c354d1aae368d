package graft

import graft.model.Fitters
import graft.seq.SeqOps
import org.apache.spark.sql.functions._

/** Tutorial-replica scenario #4: the reference's Markov-chain fraud /
  * mobility flows (resource/bsm.conf health-state monitoring,
  * python/app/mob_loc.py location sequences, MarkovChainPredictor):
  * per-entity state sequences are fitted into one global transition
  * model, each entity's recent window is scored by mean −ln p of its
  * transitions, and entities that move "against" the learned dynamics
  * surface as outliers. The spec generates sticky-chain normal entities,
  * injects a few that transit uniformly at random, and asserts the
  * anomalous entities dominate the high-score tail with zero false
  * positives at the chosen threshold. */
class MarkovFraudScenarioSpec extends SparkSpec {
  import spark.implicits._

  test("markov fit + windowed scoring isolates entities with anomalous dynamics") {
    val rng = new scala.util.Random(23)
    val states = Vector("home", "work", "shop", "gym", "travel")
    // sticky dynamics: stay with p=.8, else mostly the "next" state
    def nextNormal(cur: Int): Int = {
      val r = rng.nextDouble()
      if (r < 0.8) cur
      else if (r < 0.97) (cur + 1) % states.size
      else rng.nextInt(states.size)
    }
    val anomalous = Set("e47", "e48", "e49")
    val rows = for {
      e <- (0 until 50).map(i => s"e$i")
      seqLen = 60
      walk = {
        var cur = rng.nextInt(states.size)
        (0 until seqLen).map { i =>
          cur = if (anomalous(e)) rng.nextInt(states.size) else nextNormal(cur)
          (e, i.toLong, states(cur))
        }
      }
      r <- walk
    } yield r
    val ev = rows.toDF("entity", "seq", "state")

    // one global model fitted over everyone (the reference's offline
    // model build), then per-entity windowed scoring against it
    val model = Fitters.markovTransitions(ev, Seq("entity"), "seq", "state",
      smoothing = 1.0)
    val scored = SeqOps.markovChainScore(ev, model, Seq("entity"), "seq",
      "state", window = 10, metric = "condProb", threshold = 1.5)

    val byEntity = scored.where(col("score").isNotNull)
      .groupBy("entity").agg(avg("score").as("meanScore"),
        sum(when(col("tag") === "O", 1).otherwise(0)).as("nO"))
      .collect()
      .map(r => r.getAs[String]("entity") ->
        (r.getAs[Double]("meanScore"), r.getAs[Long]("nO"))).toMap

    // every anomalous entity sits in the top-3 by mean score
    val top3 = byEntity.toSeq.sortBy(-_._2._1).take(3).map(_._1).toSet
    assert(top3 == anomalous, s"top-3 $top3, scores ${byEntity.toSeq.sortBy(-_._2._1).take(6)}")
    // anomalous entities fire O tags heavily; every anomalous entity
    // out-tags every sticky one (a raw O spreads over its whole window
    // by the operator's contract, so sticky entities CAN show a handful)
    val maxNormalO = byEntity.filterNot(kv => anomalous(kv._1))
      .values.map(_._2).max
    anomalous.foreach { e =>
      assert(byEntity(e)._2 > 10, s"$e: only ${byEntity(e)._2} O-tags")
      assert(byEntity(e)._2 > maxNormalO,
        s"$e: ${byEntity(e)._2} O-tags vs max sticky $maxNormalO")
    }
    val falseO = byEntity.filterNot(kv => anomalous(kv._1)).values.map(_._2).sum
    val trueO = anomalous.toSeq.map(e => byEntity(e)._2).sum
    assert(falseO < trueO / 2,
      s"false O-tags $falseO vs true $trueO — threshold not separating")
  }
}
