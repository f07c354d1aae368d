package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-probe (not part of the driver surface). Currently:
  * decomposes the r14 target queries (q412 prefix-jaccard, q485/q486
  * kNN family, q193 lof_cells) into their constituent frames at sf0.1
  * to locate where each cold-pass cost concentrates. */
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
      println(f"[perf] $label%-26s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = graft.core.table(spark, sfDir, "documents")
    val emb = graft.core.table(spark, sfDir, "embeddings")
    docs.count(); emb.count()
    val reps = sys.env.getOrElse("PROBE_N", "2").toInt
    val which = sys.env.getOrElse("PROBE_Q", "q412")
    for (i <- 1 to reps) {
      which match {
        case "q412stages" =>
          import org.apache.spark.sql.expressions.Window
          val tau = 0.9
          val tok = docs
            .select(col("doc_id").as("_id"),
              explode(array_distinct(graft.text.TextOps.tokens(col("text"))))
                .as("_ts"))
            .where(col("_ts") =!= "")
            .select(col("_id"), graft.text.TextOps.hash56(col("_ts")).as("_tok"))
          val sizes = tok.groupBy(col("_id")).agg(count(lit(1)).as("_sz"))
          val rank = graft.core.bandedRowNumber(
            tok.groupBy(col("_tok")).agg(count(lit(1)).as("_df")),
            band = col("_df"), bandAsc = true, tie = Seq(col("_tok").asc),
            out = "_rk")
            .select(col("_tok"), col("_rk"))
          val pfx = tok.join(rank, "_tok").join(sizes, "_id")
            .withColumn("_pos", row_number().over(
              Window.partitionBy(col("_id")).orderBy(col("_rk").asc)))
            .where(col("_pos") <=
              col("_sz") - ceil(lit(tau) * col("_sz").cast("double")) + 1)
            .select(col("_id"), col("_tok"), col("_sz"), col("_pos"))
          time(s"pfx#$i") { noop(pfx) }
          val pdf = pfx.groupBy(col("_tok")).agg(count(lit(1)).as("_pdf"))
          val pfxB = pfx.join(pdf, "_tok")
            .withColumn("_g",
              ceil(col("_pdf").cast("double") / 1024.0).cast("int"))
            .withColumn("_blk", pmod(graft.text.TextOps.hash56(
              col("_id").cast("string")), col("_g").cast("long")).cast("int"))
          val xSide = pfxB
            .withColumn("_bx", col("_blk"))
            .withColumn("_by", explode(sequence(lit(0), col("_g") - 1)))
            .drop("_pdf", "_g", "_blk")
          val ySide = pfxB
            .withColumn("_by", col("_blk"))
            .withColumn("_bx", explode(sequence(lit(0), col("_g") - 1)))
            .drop("_pdf", "_g", "_blk")
          time(s"sides#$i") { noop(xSide); noop(ySide) }
          val ub = lit(1) +
            least(col("x._pos") - 1, col("y._pos") - 1) +
            least(col("x._sz") - col("x._pos"), col("y._sz") - col("y._pos"))
          val alpha = lit(tau / (1.0 + tau)) *
            (col("sz_a") + col("sz_b")).cast("double") - lit(1e-9)
          val matches = xSide.as("x").join(ySide.as("y"),
              col("x._tok") === col("y._tok") &&
                col("x._bx") === col("y._bx") &&
                col("x._by") === col("y._by") &&
                col("x._id") < col("y._id"))
            .select(col("x._id").as("a"), col("y._id").as("b"),
              col("x._sz").as("sz_a"), col("y._sz").as("sz_b"),
              ub.cast("double").as("_ub"))
            .where(least(col("sz_a"), col("sz_b")).cast("double") >=
              lit(tau) * greatest(col("sz_a"), col("sz_b")).cast("double") &&
              col("_ub") >= alpha)
            .select(col("a"), col("b"))
          time(s"matches#$i") { noop(matches) }
          time(s"dedup#$i") {
            noop(matches.repartition(col("a"), col("b")).distinct())
          }
        case "q412" =>
          time(s"tok-only#$i") {
            val tok = docs
              .select(col("doc_id").as("_id"),
                explode(array_distinct(graft.text.TextOps.tokens(col("text"))))
                  .as("_ts"))
              .where(col("_ts") =!= "")
              .select(col("_id"),
                graft.text.TextOps.hash56(col("_ts")).as("_tok"))
            noop(tok)
          }
          time(s"cand-only#$i") {
            val (_, cand) = graft.sim.SimJoin.prefixCandidates(
              docs, "doc_id", "text", 0.9)
            noop(cand)
          }
          time(s"q412-full#$i") {
            noop(graft.sim.SimJoin.prefixJaccardJoin(docs, "doc_id", "text", 0.9))
          }
        case "q485b" =>
          graft.expr.GraftFunctions.register(spark)
          val vd = (c: org.apache.spark.sql.Column) =>
            call_function("vec_validate", c)
          val a = emb.select(col("vec_id").as("src"),
            vd(col("embedding")).as("va"))
          val b = emb.select(col("vec_id").as("trg"),
            vd(col("embedding")).as("vb"))
          time(s"join-ids#$i") {
            noop(a.join(b, col("src") =!= col("trg"))
              .select(col("src"), col("trg")))
          }
          time(s"join-euclid#$i") {
            noop(a.join(b, col("src") =!= col("trg"))
              .withColumn("dist",
                call_function("vec_euclid", col("va"), col("vb")))
              .select(col("src"), col("trg"), col("dist")))
          }
          time(s"join-euclid-nocodegen#$i") {
            spark.conf.set("spark.sql.codegen.wholeStage", "false")
            noop(a.join(b, col("src") =!= col("trg"))
              .withColumn("dist",
                call_function("vec_euclid", col("va"), col("vb")))
              .select(col("src"), col("trg"), col("dist")))
            spark.conf.set("spark.sql.codegen.wholeStage", "true")
          }
          time(s"cross-nofilter#$i") {
            noop(a.crossJoin(b)
              .withColumn("dist",
                call_function("vec_euclid", col("va"), col("vb")))
              .select(col("src"), col("trg"), col("dist")))
          }
          time(s"knn-window#$i") {
            noop(graft.multi.Proximity.knn(
              graft.multi.Proximity.pairDistances(emb, "vec_id", "embedding"),
              5))
          }
        case "q485" =>
          time(s"pairs-only#$i") {
            noop(graft.multi.Proximity.pairDistances(emb, "vec_id", "embedding"))
          }
          time(s"knn-only#$i") {
            noop(graft.multi.Proximity.knn(
              graft.multi.Proximity.pairDistances(emb, "vec_id", "embedding"), 5))
          }
          time(s"q485-full#$i") {
            noop(graft.multi.Proximity.loopFromKnn(graft.multi.Proximity.knn(
              graft.multi.Proximity.pairDistances(emb, "vec_id", "embedding"), 5), 5))
          }
          time(s"q486-full#$i") {
            noop(graft.multi.Proximity.fastAbodFromKnn(graft.multi.Proximity.knn(
              graft.multi.Proximity.pairDistances(emb, "vec_id", "embedding"), 5),
              emb, "vec_id", "embedding"))
          }
        case "q193" =>
          time(s"kmeans-fit#$i") {
            graft.sim.KMeansDist.fitCentroids(emb, "vec_id", "embedding",
              dim = 64, k = 8, iters = 4): Unit
          }
          time(s"cellknn#$i") {
            noop(graft.multi.Proximity.cellKnn(emb, "vec_id", "embedding",
              dim = 64, nCells = 8, iters = 4, k = 5))
          }
          time(s"q193-full#$i") {
            noop(graft.multi.Proximity.lofFromKnn(
              graft.multi.Proximity.cellKnn(emb, "vec_id", "embedding",
                dim = 64, nCells = 8, iters = 4, k = 5), k = 5))
          }
        case q =>
          time(s"$q#$i") {
            noop(graft.SparkEntry.queries(q)(spark, sfDir))
          }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
