package graft.tools

import graft.multi.IsolationForest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-probe (not part of the driver surface). Currently:
  * decomposes q46's fitDeterministic + score into its constituent Spark
  * jobs at sf0.1 to locate the round-6 2× fit regression. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.expr.GraftFunctions.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[perf] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val data = graft.core.table(spark, sfDir, "events")
    data.count() // warm the scan
    val reps = sys.env.getOrElse("PROBE_N", "3").toInt
    for (i <- 1 to reps) {
      val model = time(s"fitDeterministic#$i") {
        IsolationForest.fitDeterministic(data, Seq("event_type"),
          Seq("value"), "event_id", numTrees = 50, subsampleSize = 64, maxDepth = 6)
      }
      time(s"score#$i") {
        IsolationForest.score(data, model, Seq("event_type"), Seq("value"),
          "event_id", subsampleSize = 64).count()
      }
      // 1-job candidate: no count job, no bound prefilter — raw
      // WindowGroupLimit top-k over the full crossJoin (map-side local
      // sort of trees·n rows, but a single job end-to-end).
      // MEASURED (round 7, sf0.1): 13–18 s vs 1.6–1.9 s for the 2-job
      // prefilter layout — the map-side sort of trees·n rows per
      // partition dwarfs the count job the prefilter costs. Kept here as
      // the recorded justification for fitDeterministic's shape.
      time(s"fitOneJobRaw#$i") {
        import graft.text.TextOps
        val P = TextOps.P
        val trees = broadcast(TextOps.hashParams(50).zipWithIndex
          .map { case ((a, b), t) => (t, a, b) }.toDF("t", "a", "b"))
        val keyed = data.select(
          col("event_type").cast("string").as("key"),
          (TextOps.hash56(col("event_id").cast("string")) % P).as("base"),
          array(col("value").cast("double")).as("attrs"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("key", "t").orderBy(col("h"), col("attrs"))
        keyed.crossJoin(trees)
          .withColumn("h", (col("a") * col("base") + col("b")) % P)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 64)
          .select("key", "t", "attrs")
          .collect().length
      }
    }
    // stage-by-stage breakdown of the 2-job fit's second (dominant) job
    for (i <- 1 to reps) {
      import graft.text.TextOps
      val P = TextOps.P
      val trees = broadcast(TextOps.hashParams(50).zipWithIndex
        .map { case ((a, b), t) => (t, a, b) }.toDF("t", "a", "b"))
      val keyed = data.select(
        col("event_type").cast("string").as("key"),
        (TextOps.hash56(col("event_id").cast("string")) % P).as("base"),
        array(col("value").cast("double")).as("attrs"))
        .repartition(spark.sparkContext.defaultParallelism)
      val nPerKey = keyed.groupBy("key").agg(count(lit(1)).as("n"))
        .withColumn("bound", least(lit(P - 1),
          (lit(P.toDouble) * lit(64L * 8) / col("n")).cast("long")))
      val bounds = time(s"job1 nPerKey#$i") {
        nPerKey.select("key", "bound", "n").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      }
      val caseExpr = bounds.tail.foldLeft(
        when(col("key") === bounds.head._1, lit(bounds.head._2))) {
        case (acc, (k, b, _)) => acc.when(col("key") === k, lit(b))
      }
      val hashed = keyed.crossJoin(trees)
        .withColumn("h", (col("a") * col("base") + col("b")) % P)
      time(s"crossJoin+filter#$i") {
        hashed.where(col("h") <= caseExpr).count()
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("key", "t").orderBy(col("h"), col("attrs"))
      time(s"+window+rank#$i") {
        hashed.where(col("h") <= caseExpr)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 64).count()
      }
      time(s"+growth collect#$i") {
        import spark.implicits._
        hashed.where(col("h") <= caseExpr)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 64)
          .select(col("key"), col("t"), col("attrs"))
          .as[(String, Int, Seq[Double])]
          .groupByKey(_._1).flatMapGroups { (key, it) =>
            val byTree = it.toArray.groupBy(_._2)
            Iterator.single((key, byTree.size))
          }.collect().length
      }
      time(s"scan only#$i") { keyed.count() }
    }
    spark.stop()
  }
}
