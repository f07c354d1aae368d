package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the SCALING.md claim that big
  * fact-to-fact joins can pre-shuffle once at write time and join with
  * zero exchanges thereafter. */
class BucketSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables sort-merge join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val a = (1 to 1000).map(i => (i.toLong % 50, i.toDouble)).toDF("k", "va")
    val b = (1 to 500).map(i => (i.toLong % 50, i * 2.0)).toDF("k", "vb")
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")
    a.write.format("parquet").bucketBy(8, "k").sortBy("k")
      .option("path", s"$wh/bk_a").saveAsTable("bk_a")
    b.write.format("parquet").bucketBy(8, "k").sortBy("k")
      .option("path", s"$wh/bk_b").saveAsTable("bk_b")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val j = spark.table("bk_a").join(spark.table("bk_b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("ShuffleExchange"),
        "bucketed join must not re-shuffle either side")
      assert(plan.contains("Bucketed: true"))
      assert(j.count() == (1 to 1000).map(_ % 50)
        .map(k => (1 to 500).count(_ % 50 == k)).sum)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }
}
