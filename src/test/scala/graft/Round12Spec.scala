package graft

import graft.multi.OutlierFaces
import org.apache.spark.sql.functions._

/** Round-12 operator pins. */
class Round12Spec extends SparkSpec {

  test("ecodHistogram: >=99% rank agreement with the window-ECDF form at sf0.1") {
    // the histogram form is the documented 100 TB path (r11 verdict
    // item 4) — it must rank the same records as the exact windowed
    // ECDF: Spearman correlation of the ecod ranks >= 0.99 over the
    // 2000-vector sf0.1 corpus
    val e = core.table(spark, "/root/testdata/sf0.1", "embeddings")
    val exact = OutlierFaces.ecod(e, "vec_id", "embedding")
      .select(col("vec_id"), col("ecod").as("a")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hist = OutlierFaces.ecodHistogram(e, "vec_id", "embedding", grain = 4)
      .select(col("vec_id"), col("ecod").as("b")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(exact.keySet == hist.keySet)
    val ids = exact.keys.toArray
    def ranks(m: Map[Long, Double]): Map[Long, Double] = {
      // average ranks over ties
      val sorted = ids.sortBy(id => (m(id), id))
      val byVal = sorted.groupBy(m)
      val pos = sorted.zipWithIndex.toMap
      byVal.flatMap { case (_, grp) =>
        val avg = grp.map(id => pos(id) + 1.0).sum / grp.length
        grp.map(_ -> avg)
      }
    }
    val ra = ranks(exact); val rb = ranks(hist)
    val n = ids.length.toDouble
    val ma = ra.values.sum / n; val mb = rb.values.sum / n
    val cov = ids.map(id => (ra(id) - ma) * (rb(id) - mb)).sum
    val va = ids.map(id => math.pow(ra(id) - ma, 2)).sum
    val vb = ids.map(id => math.pow(rb(id) - mb, 2)).sum
    val rho = cov / math.sqrt(va * vb)
    assert(rho >= 0.99, f"ecod rank agreement rho=$rho%.5f < 0.99")
    // and the top-decile outlier sets agree on >= 90% of members
    val k = ids.length / 10
    val topA = ids.sortBy(id => -exact(id)).take(k).toSet
    val topB = ids.sortBy(id => -hist(id)).take(k).toSet
    val ov = topA.intersect(topB).size.toDouble / k
    assert(ov >= 0.9, f"top-decile overlap $ov%.3f < 0.9")
  }

  test("ecodHistogram plan: the per-dim ECDF window rides the value histogram, not the data") {
    val e = core.table(spark, sfDir, "embeddings")
    val df = OutlierFaces.ecodHistogram(e, "vec_id", "embedding")
    val p = df.queryExecution.executedPlan.toString
    // the only window partitions by the dimension over the (dim, value)
    // HISTOGRAM (post-aggregate), and no window lacks a partition spec
    assert(p.contains("windowspecdefinition(_i"))
    val opens = graft.tools.WindowAudit.unpartitionedWindows(df)
      .filter(_.kind == "open")
    assert(opens.isEmpty, s"unpartitioned windows: $opens")
  }

  test("prefixJaccardJoin: positional + pair-prefix filters preserve the exact result") {
    import spark.implicits._
    // brute-force oracle on a small tie-heavy corpus
    val docs = (0 until 60).map { i =>
      val words = (0 until 8).map(j => s"w${(i * (j + 3) + j) % 23}")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val got = graft.sim.SimJoin.prefixJaccardJoin(docs, "doc_id", "text", 0.5)
      .select("a", "b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val toks = docs.collect().map(r => r.getLong(0) ->
      r.getString(1).split(" ").toSet).toMap
    val want = (for {
      a <- toks.keys; b <- toks.keys if a < b
      inter = toks(a).intersect(toks(b)).size
      j = inter.toDouble / (toks(a).size + toks(b).size - inter)
      if j >= 0.5
    } yield (a, b, j)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }
}
