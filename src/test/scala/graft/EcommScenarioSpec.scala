package graft

import graft.model.Fitters
import graft.post.PostOps
import graft.score.Scorers
import graft.score.Scorers.Cfg
import org.apache.spark.sql.functions._

/** Tutorial-replica scenario #2 (FIXTURES.md §2, reference
  * retail_sale_monitoring tutorial / python/app/ecomm.py): hierarchical
  * product-sales streams, robust z-score per leaf stream, OutlierAggregator
  * roll-up to the parent — parent window is O iff any child in the window
  * is O, and injected sale spikes are recalled at the leaf level. */
class EcommScenarioSpec extends SparkSpec {
  import spark.implicits._

  test("ecomm: leaf anomalies recalled, parent windows tagged O iff a child is O") {
    val rng = new scala.util.Random(42)
    val hours = 0 until 240 // 10 days hourly
    val products = Seq("p1", "p2", "p3")
    // per-product hourly sales ~ N(100, 10); inject spikes in p2 at 3 known hours
    val spikes = Set(50L, 120L, 200L)
    val rows = for (p <- products; h <- hours) yield {
      val base = 100.0 + rng.nextGaussian() * 10.0
      val q = if (p == "p2" && spikes(h.toLong)) base + 120.0 else base
      ("prodSale", p, h.toLong, q)
    }
    val sales = rows.toDF("streamType", "streamId", "ts", "quantity")

    // leaf scoring: robust z per (streamType, streamId)
    val model = Fitters.robustStats(sales, Seq("streamType", "streamId"), Seq("quantity"))
    val tagged = Scorers.robustZscore(sales, model,
      Cfg(Seq("streamType", "streamId"), Seq("quantity"), threshold = 5.0))

    val flagged = tagged.where($"tag" === "O")
      .select("streamId", "ts").as[(String, Long)].collect().toSet
    spikes.foreach(h => assert(flagged.contains(("p2", h)), s"spike at $h missed"))
    assert(flagged.forall(_._1 == "p2")) // no false alarms on clean products

    // roll-up: all products under one parent stream, 24h windows
    val hierarchy = Seq(("prodSale", "*", "allSales", "site"))
      .toDF("childType", "childId", "parentType", "parentId")
    val rolled = PostOps.hierarchyRollup(tagged, hierarchy,
      "streamType", "streamId", floor($"ts" / 24), "quantity")
    val byWin = rolled.collect()
      .map(r => r.getAs[Long]("seqb") -> r.getAs[String]("tag")).toMap
    val spikeWins = spikes.map(_ / 24)
    spikeWins.foreach(w => assert(byWin(w) == "O", s"window $w not rolled up O"))
    (byWin.keySet -- spikeWins).foreach(w => assert(byWin(w) == "N"))
  }
}
