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

  test("skew profile: hot key surfaces with correct share/skew/salt recommendation") {
    // 1 hot key x 900 rows + 100 cold keys x 1 row: total=1000, nkeys=101
    val df = ((1 to 900).map(_ => "hot") ++ (1 to 100).map(i => f"c$i%03d"))
      .toDF("k")
    val top = Skew.skewProfile(df, Seq("k"), topN = 3).collect()
    assert(top.length == 3)
    val hot = top.head
    assert(hot.getAs[String]("k") == "hot")
    assert(hot.getAs[Long]("cnt") == 900L)
    assert(math.abs(hot.getAs[Double]("share") - 0.9) < 1e-12)
    val skew = hot.getAs[Double]("skew") // 900 / (1000/101) = 90.9
    assert(math.abs(skew - 90.9) < 1e-9)
    assert(hot.getAs[Long]("saltsRec") == 91L)
    // cold keys: skew ~0.1 -> no salting; ties broken by key ascending
    assert(top(1).getAs[String]("k") == "c001" && top(1).getAs[Long]("saltsRec") == 1L)
    assert(top(2).getAs[String]("k") == "c002")
    // uniform data: nothing recommended
    val uni = (1 to 100).map(i => s"k${i % 10}").toDF("k")
    assert(Skew.skewProfile(uni, Seq("k"), 10).collect()
      .forall(_.getAs[Long]("saltsRec") == 1L))
  }
}
