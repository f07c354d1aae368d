package graft.tools

import org.apache.spark.sql.SparkSession

// scratch: dump deterministic-KMeans sample head + centroids (not part of
// the driver contract)
object KmDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .appName("km-debug").getOrCreate()
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val pts = graft.core.LocalKMeans.sampleColsHashed(li,
      Seq("l_quantity", "l_extendedprice", "l_discount"),
      Seq("l_orderkey", "l_linenumber"), 20000)
    println("n=" + pts.length)
    println("first3=" + pts.take(3).map(_.mkString(",")).mkString(" | "))
    val cents = graft.core.LocalKMeans.fitFixed(pts, 8, 10)
    cents.zipWithIndex.foreach { case (c, i) =>
      println(s"cent $i: ${c.mkString(", ")}")
    }
    spark.stop()
  }
}
