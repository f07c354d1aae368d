package graft

import org.apache.spark.sql.functions._

/** Equivalence pins for the r13 native expressions that replaced SQL
  * chains in the hot path:
  *  - hash56_md5 (graft.expr.Hash56) must equal the original
  *    `conv(substring(md5(c), 1, 14), 16, 10)::long` on arbitrary
  *    strings (multibyte, empty, null) and on fixture text/tokens;
  *  - sorted_inter_count (graft.expr.SortedInterCount) must equal
  *    `size(array_intersect(a, b))` on sorted duplicate-free arrays
  *    (its documented contract — the SimJoin verify frames). */
class Hash56ExprSpec extends SparkSpec {

  private def oldHash56(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 14), 16, 10).cast("long")

  test("hash56_md5 equals the conv/substring/md5 chain") {
    import spark.implicits._
    graft.expr.GraftFunctions.register(spark)
    val strs = Seq("", "a", "hello world", "héllo wörld", "中文测试",
      "😀 emoji", "s:token", "y:12345", "0", "-1.5",
      ("long " * 500).trim) ++ (0 until 200).map(i => s"tok$i")
    val df = strs.toDF("s")
    val bad = df.select(col("s"), oldHash56(col("s")).as("o"),
        call_function("hash56_md5", col("s")).as("n"))
      .where(col("o") =!= col("n") || col("o").isNull =!= col("n").isNull)
      .count()
    assert(bad == 0)
    // null in, null out
    val nulls = Seq[Option[String]](None, Some("x")).toDF("s")
      .select(oldHash56(col("s")).as("o"),
        call_function("hash56_md5", col("s")).as("n"))
      .collect()
    nulls.foreach(r => assert(r.isNullAt(0) == r.isNullAt(1)))
  }

  test("hash56_md5 equals the chain on fixture tokens") {
    graft.expr.GraftFunctions.register(spark)
    val toks = core.table(spark, sfDir, "documents")
      .where(col("text").isNotNull)
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("s"))
    val bad = toks.select(oldHash56(col("s")).as("o"),
        call_function("hash56_md5", col("s")).as("n"))
      .where(col("o") =!= col("n")).count()
    assert(bad == 0)
  }

  test("sorted_inter_count equals size(array_intersect) on sorted sets") {
    import spark.implicits._
    graft.expr.GraftFunctions.register(spark)
    // deterministic pseudo-random sorted distinct arrays
    val rows = (0 until 300).map { i =>
      val a = (0 until 50).map(j => ((i * 31 + j * 17) % 97).toLong)
        .distinct.sorted
      val b = (0 until 50).map(j => ((i * 13 + j * 23) % 97).toLong)
        .distinct.sorted
      (a, b)
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq(5L), Seq(5L)))
    val df = rows.toDF("a", "b")
    val bad = df.select(
        size(array_intersect(col("a"), col("b"))).cast("long").as("o"),
        call_function("sorted_inter_count", col("a"), col("b")).as("n"))
      .where(col("o") =!= col("n")).count()
    assert(bad == 0)
  }
}
