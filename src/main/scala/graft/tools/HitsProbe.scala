package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off decomposition of the HITS half-step cost at sf0.1 (q206 was
  * 37 s in the round-7 bench before the lineage cut, ~6 s after): times
  * fixture, edge caches, and each half-step separately so a fix targets
  * the real sink. Mirrors Graph.hits' current shape (dual-orientation
  * edge caches + localCheckpoint leaf per half-step). */
object HitsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[hits] $name%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    import org.apache.spark.sql.expressions.Window
    val ev = graft.core.table(spark, sfDir, "events")
    val edges = ev.select(col("user_id").cast("string").as("a"),
      lead(col("user_id").cast("string"), 1)
        .over(Window.orderBy("event_id")).as("b"))
      .where(col("b").isNotNull && col("a") =!= col("b"))
    val eBySrc = edges.select(col("a").as("src"), col("b").as("dst"))
      .where(col("src") =!= col("dst")).distinct()
      .repartition(col("src")).persist()
    t("fixture+edges")(eBySrc.count())
    val eByDst = eBySrc.repartition(col("dst")).persist()
    t("eByDst")(eByDst.count())
    val nodes = eBySrc.select(col("src").as("node"))
      .union(eBySrc.select(col("dst").as("node"))).distinct().persist()
    t("nodes")(nodes.count())
    val scale = 1000000L
    var hub = nodes.withColumn("h", lit(scale))
    var auth = nodes.withColumn("a", lit(0L))
    def halfStep(e: DataFrame, state: DataFrame, valCol: String,
        joinOn: String, outKey: String, outCol: String): DataFrame = {
      val raw = t(s"  ckpt($outCol)") {
        nodes.join(
          e.join(state, e(joinOn) === state("node"))
            .groupBy(col(outKey).as("node")).agg(sum(valCol).as("s")),
          Seq("node"), "left")
          .withColumn("s", coalesce(col("s"), lit(0L)))
          .localCheckpoint(true)
      }
      val mx = math.max(1L, t(s"  max($outCol)")(
        raw.agg(max("s")).collect()(0).getLong(0)))
      raw.select(col("node"), expr(s"(s * $scale) div $mx").as(outCol))
    }
    (1 to 5).foreach { i =>
      auth = t(s"auth$i")(halfStep(eBySrc, hub, "h", "src", "dst", "a"))
      hub = t(s"hub$i")(halfStep(eByDst, auth, "a", "dst", "src", "h"))
    }
    t("final join")(hub.join(auth, "node").count())
    spark.stop()
  }
}
