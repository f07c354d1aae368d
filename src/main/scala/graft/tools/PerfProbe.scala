package graft.tools

import graft.core.LocalKMeans
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-probe (not part of the driver surface). Currently:
  * decomposes semDedupDeterministic's stages at the ScaleProbe ×16 shape
  * (32k vectors, 128 cells) to locate the superlinear cost. */
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
    val n = sys.env.getOrElse("PROBE_N", "16").toInt
    val nCells = 8 * n
    val embBase = graft.core.table(spark, sfDir, "embeddings")
    val emb = (0 until n).map { i =>
      embBase.withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000000L))
        .withColumn("embedding",
          transform(col("embedding"), x => x + lit(i * 0.037)))
    }.reduce(_ unionByName _)
    emb.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[perf] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val c = emb.select(col("vec_id").as("cid"),
      transform(col("embedding"), x => x.cast("double")).as("cv"))
    val pts = time("sampleVectorsHashed") {
      LocalKMeans.sampleVectorsHashed(c, "cv", Seq("cid"), 4096)
    }
    val cents = time("fitFixed") {
      LocalKMeans.fitFixed(pts, nCells, 10, viaDot = true)
    }
    val ccs = cents.map(ct => LocalKMeans.dotSeq(ct, ct))
    val centArr = typedlit(cents.map(_.toSeq).toSeq)
    val cnormArr = typedlit(ccs.map(math.sqrt).toSeq)
    val asg = c.withColumn("cell",
        graft.expr.GraftFunctions.vecNearest(spark, col("cv"), cents, ccs))
      .withColumn("vnorm", sqrt(call_function("vec_dot", col("cv"), col("cv"))))
      .withColumn("simc",
        call_function("vec_dot", col("cv"), element_at(centArr, col("cell") + 1)) /
          (col("vnorm") * element_at(cnormArr, col("cell") + 1)))
    time("asg.count")(asg.count())
    val occ = asg.groupBy("cell").count().orderBy(col("count").desc)
      .limit(12).collect()
    println(s"[perf] topCells=${occ.map(r => r.getLong(1)).mkString(",")}")
    println(s"[perf] nonEmptyCells=" +
      asg.select("cell").distinct().count() + s"/$nCells")
    // anti-join formulation (what semDedupDeterministic now runs)
    val other = asg.select(col("cid").as("ocid"), col("cv").as("ocv"),
      col("vnorm").as("onorm"), col("simc").as("osimc"),
      col("cell").as("ocell"))
    val beaten = col("cell") === col("ocell") && col("cid") =!= col("ocid") &&
      call_function("vec_dot", col("cv"), col("ocv")) /
        (col("vnorm") * col("onorm")) >= 0.4 &&
      (col("simc") > col("osimc") ||
        (col("simc") === col("osimc") && col("cid") > col("ocid")))
    val full = asg.join(other, beaten, "left_anti")
      .select(col("cid"), col("cell").cast("long").as("cell"), col("simc"))
    println(full.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Broadcast")).mkString("[perf] plan:\n", "\n", ""))
    time("anti.count")(full.count())
    time("semDedup e2e") {
      graft.sim.Similarity.semDedupDeterministic(emb, "vec_id", "embedding",
        nCells = nCells, eps = 0.4, iters = 10, maxSample = 4096).count()
    }
    spark.stop()
  }
}
