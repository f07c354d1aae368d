package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch micro-probe (not part of the driver surface). Currently:
  * decomposes q412's prefixJaccardJoin into its constituent frames at
  * sf0.1 to locate where the cold-pass cost concentrates (r13). */
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
    graft.expr.GraftFunctions.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[perf] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = graft.core.table(spark, sfDir, "documents")
    docs.count()
    val reps = sys.env.getOrElse("PROBE_N", "2").toInt
    for (i <- 1 to reps) {
      time(s"plsa#$i") {
        noop(graft.text.Topics.plsa2(docs, "doc_id", "text",
          vocab = 500, iters = 3))
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
