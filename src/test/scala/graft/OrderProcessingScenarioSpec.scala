package graft

import graft.multi.IsolationForest
import graft.post.PostOps
import org.apache.spark.sql.functions._

/** End-to-end replica of the reference's order-processing monitoring
  * tutorial (resource/monitoring_order_processing_system_with_isolation_
  * forest.txt, generator python/app/ecomm.py:363-547 `ordProcessRecs` /
  * `olOrdPr`): each order flows through workflow states whose
  * time-elapsed distributions differ by state (fraud-check ~1 min,
  * manual approval 60±12, picking 10-26 by category, packing, shipment
  * notification); outliers are stuck steps with inflated elapsed time.
  * Pipeline = per-state isolation-forest fit → score → pseudo-relevance
  * threshold from the score upper tail (the tutorial's `olss.py sttest`
  * step that picks score.threshold from the histogram) → retag;
  * validated by recall/precision on the injected stuck steps. */
class OrderProcessingScenarioSpec extends SparkSpec {
  import spark.implicits._

  test("per-state iforest + upper-tail threshold recovers stuck workflow steps") {
    val rng = new scala.util.Random(19)
    // (state, mean, sd) from ecomm.py's samplers (minutes)
    val states = Seq(("fraud_check", 1.0, 0.3), ("man_approval", 60.0, 12.0),
      ("warehouse_conf", 10.0, 1.0), ("pick", 18.0, 1.5),
      ("pack", 12.0, 3.0), ("ship_notify", 15.0, 2.0))
    val rows = for {
      ord <- 0 until 400
      (st, mu, sd) <- states
    } yield {
      val base = math.max(0.1, mu + rng.nextGaussian() * sd)
      val inject = rng.nextDouble() < 0.06
      val elapsed = if (inject) base * (4.0 + rng.nextDouble() * 2.0) else base
      (ord.toLong * 100 + states.indexWhere(_._1 == st), st, elapsed, inject)
    }
    val data = rows.toDF("rec_id", "state", "elapsed", "injected")

    val model = IsolationForest.fit(data, Seq("state"), Seq("elapsed"),
      numTrees = 50, subsampleSize = 64, maxDepth = 6, seed = 7L)
    val scored = IsolationForest.score(data, model, Seq("state"),
      Seq("elapsed"), "rec_id", subsampleSize = 64)
      .toDF().select(col("key").as("state"), col("rowId").as("rec_id"),
        col("score"))

    // the tutorial's two-pass protocol: run once, read the upper-tail
    // statistic, set score.threshold, run again — here the threshold
    // comes from the pseudo-relevance finder at the injected tail mass
    val thr = PostOps.pseudoRelevanceThreshold(scored, Seq("state"),
      topFrac = 0.07, minCount = 50L, defaultThreshold = 0.62)
    val tagged = scored.join(broadcast(thr), "state")
      .withColumn("flag", col("score") >= col("threshold"))
    val eval = tagged.join(data.select("rec_id", "injected"), "rec_id")
      .select(col("injected"), col("flag")).collect()
    val tp = eval.count(r => r.getBoolean(0) && r.getBoolean(1)).toDouble
    val fn = eval.count(r => r.getBoolean(0) && !r.getBoolean(1)).toDouble
    val fp = eval.count(r => !r.getBoolean(0) && r.getBoolean(1)).toDouble
    val recall = tp / (tp + fn)
    val precision = tp / (tp + fp)
    info(f"recall=$recall%.3f precision=$precision%.3f (tp=$tp%.0f fp=$fp%.0f fn=$fn%.0f)")
    assert(recall > 0.7, s"recall $recall")
    assert(precision > 0.6, s"precision $precision")
  }
}
