package graft

import graft.expr.{GraftFunctions, VecDot}
import org.apache.spark.sql.functions._

class ExprSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot native expression matches HOF formulation bit-for-bit") {
    GraftFunctions.register(spark)
    val df = Seq((Array(1.5, 2.5, -3.0), Array(0.5, 4.0, 2.0))).toDF("a", "b")
    val r = df.select(
      call_function("vec_dot", $"a", $"b").as("native"),
      aggregate(zip_with($"a", $"b", (p, q) => p * q), lit(0.0), (x, v) => x + v).as("hof"))
      .head()
    assert(r.getDouble(0) == r.getDouble(1))
    assert(r.getDouble(0) == 1.5 * 0.5 + 2.5 * 4.0 + (-3.0) * 2.0)
  }

  test("vec_dot casts float arrays, null-safe") {
    GraftFunctions.register(spark)
    val df = Seq((Some(Array(1.0f, 2.0f)), Array(3.0, 4.0)), (None, Array(1.0, 1.0)))
      .toDF("a", "b")
    val rows = df.selectExpr("vec_dot(a, b) as d").collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
  }

  test("vec_dot participates in whole-stage codegen (no interpreted lambda)") {
    GraftFunctions.register(spark)
    val df = spark.range(10).selectExpr("array(cast(id as double), 2.0) as a")
      .selectExpr("vec_dot(a, a) as d")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vec_dot"))  // * prefix = inside WholeStageCodegen
  }

  test("bit_hamming counts differing bits") {
    GraftFunctions.register(spark)
    val r = Seq((0xFFL, 0x0FL)).toDF("a", "b")
      .selectExpr("bit_hamming(a, b) as h").head()
    assert(r.getLong(0) == 4L)
  }

  test("cosineFast == cosine on the embeddings table") {
    val e = core.table(spark, sfDir, "embeddings").limit(50)
    val pairs = e.select($"vec_id".as("i"), $"embedding".as("va"))
      .crossJoin(e.select($"vec_id".as("j"), $"embedding".as("vb")))
      .where($"i" < $"j").limit(200)
    val cmp = pairs.select(
      graft.sim.Similarity.cosine($"va", $"vb").as("slow"),
      graft.sim.Similarity.cosineFast(spark, $"va", $"vb").as("fast"))
    assert(cmp.where($"slow" =!= $"fast").count() == 0)
  }
}
