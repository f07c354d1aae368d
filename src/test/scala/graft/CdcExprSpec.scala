package graft

import org.apache.spark.sql.functions._

/** Equivalence pin for the codegen'd CDC chunker (graft.expr.CdcChunks,
  * r13 optimization): the expression must reproduce the original
  * higher-order-function formulation bit-for-bit — same boundary
  * positions, same chunk text — on adversarial inputs (multibyte UTF-8,
  * boundary-dense, boundary-free, length < window) and on the fixture
  * corpus. The HOF chain below is the pre-optimization implementation,
  * kept here verbatim as the semantic reference. */
class CdcExprSpec extends SparkSpec {

  private def hofChunks(window: Int, base: Int, mask: Int) = {
    val t = "_cdc_text"
    val cuts =
      s"""array_distinct(concat(array(1),
         | transform(
         |  filter(sequence(1, greatest(length($t) - ${window - 1}, 1)),
         |   i -> aggregate(sequence(0, ${window - 1}), 0L,
         |     (acc, j) -> acc * $base + ascii(substring($t, i + j, 1)))
         |     % $mask = 0),
         |  p -> CAST(p AS INT))))""".stripMargin.replace("\n", " ")
    val chunks =
      s"""transform(sequence(1, size(_cuts)),
         | k -> substring($t, element_at(_cuts, k),
         |   coalesce(try_element_at(_cuts, k + 1), length($t) + 1)
         |     - element_at(_cuts, k)))""".stripMargin.replace("\n", " ")
    (cuts, chunks)
  }

  private def compare(texts: Seq[String], window: Int = 8, base: Int = 31,
      mask: Int = 64): Unit = {
    import spark.implicits._
    graft.expr.GraftFunctions.register(spark)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "_cdc_text")
      .where(length(col("_cdc_text")) >= window)
    val (cuts, chunks) = hofChunks(window, base, mask)
    val old = df.withColumn("_cuts", expr(cuts))
      .select(col("id"), expr(chunks).as("chunks"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    val neu = df
      .select(col("id"), call_function("cdc_chunks", col("_cdc_text"),
        lit(window), lit(base), lit(mask)).as("chunks"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    assert(neu.length == old.length)
    old.zip(neu).foreach { case ((ido, co), (idn, cn)) =>
      assert(ido == idn)
      assert(cn == co, s"id $ido: ${cn.take(5)} vs ${co.take(5)}")
    }
  }

  test("cdc_chunks matches the HOF chain on synthetic texts") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and keeps running",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "abcdefgh",
      "ab",
      "",
      ("lorem ipsum dolor sit amet " * 40).trim,
      (0 until 500).map(i => ('a' + (i * 7 % 26)).toChar).mkString,
      "héllo wörld ünïcode chéck 中文测试 mixed ascii tail padding here",
      "éèêë一丁丂七丄丅 surrogate 😀😁 pair run",
      (0 until 300).map(i => if (i % 9 == 0) '中' else ('a' + i % 26).toChar).mkString)
    compare(texts)
    compare(texts, window = 4, base = 17, mask = 16)
  }

  test("cdc_chunks matches the HOF chain on the fixture corpus") {
    val docs = core.table(spark, sfDir, "documents")
      .select(col("doc_id").as("id"), col("text").as("_cdc_text"))
      .where(col("_cdc_text").isNotNull)
    graft.expr.GraftFunctions.register(spark)
    val (cuts, chunks) = hofChunks(8, 31, 64)
    val base = docs.where(length(col("_cdc_text")) >= 8)
    val old = base.withColumn("_cuts", expr(cuts))
      .select(col("id"), expr(chunks).as("chunks"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    val neu = base
      .select(col("id"), call_function("cdc_chunks", col("_cdc_text"),
        lit(8), lit(31), lit(64)).as("chunks"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    assert(old.length == neu.length && old.nonEmpty)
    old.zip(neu).foreach { case ((ido, co), (idn, cn)) =>
      assert(ido == idn && cn == co, s"mismatch at doc $ido")
    }
  }
}
