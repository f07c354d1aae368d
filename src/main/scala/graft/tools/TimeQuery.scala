package graft.tools

import org.apache.spark.sql.SparkSession

/** Generic single-query timer (not part of the driver surface):
  * `runMain graft.tools.TimeQuery <sfDir> <reps> <query...>` times each
  * named SparkEntry query in one warm JVM — the right tool for
  * before/after checks on one operator without paying a full bench. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.table(spark, sfDir, "events").count() // warm
    for (r <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      val cnt = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[time] $n%-28s #$r ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$cnt")
      // match the bench protocol: cold-per-query, no cross-query caches
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
