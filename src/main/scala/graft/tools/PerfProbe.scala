package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-probe for window-kernel hypotheses (not part of the
  * driver surface). Times changePointMeanShift across window sizes to
  * separate sliding-frame O(n·w) cost from fixed shuffle/sort cost. */
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
    val ev = graft.core.table(spark, sfDir, "events")
    ev.count() // warm scan
    for (w <- Seq(5, 30, 120, 480); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.seq.SeqOps.changePointMeanShift(
        ev, Seq("event_type"), "event_id", "value", w, 3.0).count()
      println(f"[perf] meanshift w=$w%4d rep=$rep out=$n%6d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
