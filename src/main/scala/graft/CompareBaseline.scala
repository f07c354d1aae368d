package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reference-shape vs engine throughput comparison.
  *
  * The reference publishes no benchmark numbers (BASELINE.md), so this
  * main measures the closest substitute: its flagship z-score job
  * re-created faithfully in its own execution shape — RDD `textFile` →
  * per-line `split(",")` → driver-collected stats map → broadcast →
  * per-record predictor map (spark/.../dist/StatsBasedOutlierPredictor
  * .scala:202-278 + chombo NumericalAttrStats fit) — against this
  * engine's DataFrame pipeline on the SAME CSV input, and on parquet
  * (the engine's native format). Both sides run twice; the warm run is
  * reported. */
object CompareBaseline {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // size scan splits to the core count (SCALING.md §7): the 128 MB
      // default yields ~3 tasks for a few-hundred-MB input on 32 cores
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext

    // one-time: events as CSV, the reference's input format, scaled
    // SPARK_GRAFT_SCALE× (re-keyed copies) so the comparison isn't
    // fixed-overhead-bound
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "50").toInt
    val csvDir = s"/tmp/graft_ref_csv_x$scale"
    val pqDir = s"/tmp/graft_ref_pq_x$scale"
    if (!new java.io.File(csvDir, "_SUCCESS").exists()) {
      val base = core.table(spark, sfDir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val big = (0 until scale).map(i =>
        base.withColumn("event_id", col("event_id") + lit(i.toLong * 1000000000L)))
        .reduce(_ unionByName _)
      big.write.mode("overwrite").option("header", "false").csv(csvDir)
      big.write.mode("overwrite").parquet(pqDir)
    }

    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime()
      val out = f
      println(f"[cmp] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s (outliers=$out)")
    }

    // ===== reference shape: textFile + split + broadcast stats + map =====
    time("reference-style RDD (CSV)") {
      val lines = sc.textFile(csvDir)
      // fit pass (chombo NumericalAttrStats equivalent): reduceByKey partials
      val partials = lines.map { line =>
        val items = line.split(",")
        (items(1), (items(2).toDouble, items(2).toDouble * items(2).toDouble, 1L))
      }.reduceByKey((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
        .collect()
      val stats = partials.map { case (k, (s, ss, n)) =>
        val mean = s / n
        k -> (mean, math.sqrt((ss - n * mean * mean) / (n - 1)))
      }.toMap
      val bc = sc.broadcast(stats)
      // score pass: per-line predictor apply + tag, then an outlier count
      // (both sides aggregate the scores so neither can skip the math)
      lines.map { line =>
        val items = line.split(",")
        val (mean, sd) = bc.value(items(1))
        val score = math.abs(items(2).toDouble - mean) / sd
        if (score > 2.0) 1L else 0L
      }.reduce(_ + _)
    }

    // ===== engine: same pipeline, DataFrame over the same CSV =====
    val csvSchema = "event_id LONG, event_type STRING, value DOUBLE"
    time("graft DataFrame (CSV)") {
      val data = spark.read.schema(csvSchema).csv(csvDir)
      val stats = model.Fitters.stats(data, Seq("event_type"), Seq("value"))
      score.Scorers.zscore(data, stats,
        score.Scorers.Cfg(Seq("event_type"), Seq("value"), threshold = 2.0))
        .agg(sum(when(col("tag") === "O", 1L).otherwise(0L))).head().getLong(0)
    }

    // ===== engine on its native columnar format (same rows) =====
    time("graft DataFrame (parquet)") {
      val data = spark.read.parquet(pqDir)
      val stats = model.Fitters.stats(data, Seq("event_type"), Seq("value"))
      score.Scorers.zscore(data, stats,
        score.Scorers.Cfg(Seq("event_type"), Seq("value"), threshold = 2.0))
        .agg(sum(when(col("tag") === "O", 1L).otherwise(0L))).head().getLong(0)
    }
    spark.stop()
  }
}
