package graft.tools
import org.apache.spark.sql.SparkSession
object IfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.table(spark, sfDir, "events").count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[if] $name%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    for (rep <- 1 to 3) {
      val data = graft.core.table(spark, sfDir, "events")
      val model = t(s"fit#$rep")(graft.multi.IsolationForest.fitDeterministic(
        data, Seq("event_type"), Seq("value"), "event_id",
        numTrees = 50, subsampleSize = 64, maxDepth = 6))
      t(s"score#$rep")(graft.multi.IsolationForest.score(data, model,
        Seq("event_type"), Seq("value"), "event_id", subsampleSize = 64).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
