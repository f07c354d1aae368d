package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot audit dump: classify every SparkEntry query's unpartitioned
  * WindowExec nodes (static plan walk, no execution). Feed for the
  * PlanShapeSpec whitelist. */
object WindowAuditMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.nonEmpty) {
      // runtime mode: execute the named queries, report rows entering
      // each unpartitioned WindowExec (whitelist cap calibration)
      args.foreach { name =>
        val fn = graft.SparkEntry.queries(name)
        val rs = WindowAudit.unpartitionedWindowInputRows(fn(spark, sfDir))
        println(s"$name\t${rs.map { case (f, r) => s"${f.kind}:$r" }.mkString(" ")}")
      }
      spark.stop()
      return
    }
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val fs = WindowAudit.unpartitionedWindows(fn(spark, sfDir))
        if (fs.nonEmpty) {
          val byKind = fs.groupBy(_.kind).view.mapValues(_.size).toMap
          val opens = fs.filter(_.kind == "open").map(_.detail).distinct
          println(s"$name\t$byKind\t${opens.mkString(" | ")}")
        }
      } catch {
        case t: Throwable => println(s"$name\tPLAN-ERROR\t${t.getMessage}")
      }
    }
    spark.stop()
  }
}
