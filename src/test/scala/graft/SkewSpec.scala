package graft

import graft.core.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals direct aggregation on skewed data") {
    // one hot key with 50k rows, many cold keys
    val hot = (1 to 50000).map(i => ("hot", i.toDouble))
    val cold = (1 to 500).map(i => (s"k$i", i.toDouble))
    val df = (hot ++ cold).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"),
        min("v").as("min_v"), max("v").as("max_v"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Skew.saltedAgg(df, Seq("k"), salts = 16,
      Seq(Skew.sumOf("v"), Skew.countAll, Skew.minOf("v"), Skew.maxOf("v")))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted.keySet == direct.keySet)
    // doubles: sums of integral doubles here are exact, so equality holds
    assert(salted == direct)
    val avg = Skew.saltedAvg(df, Seq("k"), "v", 16)
      .where($"k" === "hot").head().getAs[Double]("avg_v")
    assert(math.abs(avg - 25000.5) < 1e-9)
  }

  test("salted join equals direct join on skewed data (inner + left)") {
    val big = ((1 to 20000).map(i => ("hot", i)) ++
      (1 to 200).map(i => (s"k$i", i)) :+ (("orphan", 0))).toDF("k", "v")
    val small = (Seq("hot") ++ (1 to 200).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i * 10) }.toDF("k", "m")
    def canonize(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "m").collect()
        .map(r => (r.getString(0), r.getInt(1), if (r.isNullAt(2)) -1 else r.getInt(2)))
        .sorted.toSeq
    assert(canonize(Skew.saltedJoin(big, small, Seq("k"), salts = 8)) ==
      canonize(big.join(small, Seq("k"), "inner")))
    assert(canonize(Skew.saltedJoin(big, small, Seq("k"), salts = 8, "left")) ==
      canonize(big.join(small, Seq("k"), "left")))
  }

  test("salting actually fans a hot key across partial groups") {
    val df = (1 to 10000).map(i => ("hot", 1.0)).toDF("k", "v")
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(8)))
    assert(salted.select("_salt").distinct().count() > 1)
  }
}
