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
    val tau = 0.8
    val docs = graft.core.table(spark, sfDir, "documents")
    docs.count()
    val reps = sys.env.getOrElse("PROBE_N", "2").toInt
    for (i <- 1 to reps) {
      import graft.text.TextOps.{tokens, hash56}
      val tok = docs
        .select(col("doc_id").as("_id"),
          explode(array_distinct(tokens(col("text")))).as("_ts"))
        .where(col("_ts") =!= "")
        .select(col("_id"), hash56(col("_ts")).as("_tok"))
      time(s"tok#$i") { noop(tok) }
      val sizes = tok.groupBy(col("_id")).agg(count(lit(1)).as("_sz"))
      val rank = graft.core.bandedRowNumber(
        tok.groupBy(col("_tok")).agg(count(lit(1)).as("_df")),
        band = col("_df"), bandAsc = true, tie = Seq(col("_tok").asc),
        out = "_rk")
        .select(col("_tok"), col("_rk"))
      time(s"rank#$i") { noop(rank) }
      val pfx = tok.join(rank, "_tok").join(sizes, "_id")
        .withColumn("_pos", row_number().over(
          Window.partitionBy(col("_id")).orderBy(col("_rk").asc)))
        .where(col("_pos") <=
          col("_sz") - ceil(lit(tau) * col("_sz").cast("double")) + 1)
        .select(col("_id"), col("_tok"), col("_sz"), col("_pos"))
      time(s"pfx#$i") { noop(pfx) }
      val (tokF, candF) = graft.sim.SimJoin.prefixCandidates(
        docs, "doc_id", "text", tau)
      time(s"cand#$i") { noop(candF) }
      val arrs = tok.groupBy(col("_id"))
        .agg(array_sort(collect_list(col("_tok"))).as("_arr"))
      time(s"arrs#$i") { noop(arrs) }
      val full = graft.sim.SimJoin.prefixJaccardJoin(
        docs, "doc_id", "text", 0.8)
      time(s"full#$i") { noop(full) }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
