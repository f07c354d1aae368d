package graft.queries

import graft.core._
import graft.mm.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing queries: binary pack → decode (stub codec) →
  * features, and frame sampling. The stub codec derives everything from
  * the payload md5, so the full pipeline has an exact DuckDB oracle even
  * though the codec is fake (see Multimodal.FakeCodec). */
object MmQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_mm_decode" -> ((s, dir) => {
      val media = Multimodal.packBinary(table(s, dir, "documents"), "doc_id", "text")
      val dec = Multimodal.decode(media).toDF()
      canon(dec.select(col("id"), col("width"), col("height"), col("channels"),
        col("nBytes"),
        element_at(col("features"), 1).cast("double").as("f0"),
        element_at(col("features"), 2).cast("double").as("f1"),
        element_at(col("features"), 3).cast("double").as("f2"),
        element_at(col("features"), 4).cast("double").as("f3")))
    }),
    "q63_mm_frames" -> ((s, dir) => {
      val media = Multimodal.packBinary(table(s, dir, "documents"), "doc_id", "text")
      Multimodal.frameSample(media, frameBytes = 64, stride = 2).toDF()
        .select(col("id"), col("frameIdx"), length(col("frameBytes")).as("frameLen"))
    }),
  )

  private def hx(expr: String, from: Int, len: Int) =
    s"('0x'||substr($expr,$from,$len))::BIGINT"

  val oracleSql: Map[String, String] = Map(
    "q62_mm_decode" ->
      s"""WITH h AS (SELECT doc_id AS id, md5(text) AS m, strlen(text) AS nb FROM documents)
         |SELECT id, (${hx("m", 1, 6)} % 1920 + 1)::INT AS width,
         | (${hx("m", 7, 6)} % 1080 + 1)::INT AS height, 3 AS channels,
         | nb::BIGINT AS nBytes,
         | round((${hx("md5(m||'0')", 1, 6)} % 1000)/1000.0, 4) AS f0,
         | round((${hx("md5(m||'1')", 1, 6)} % 1000)/1000.0, 4) AS f1,
         | round((${hx("md5(m||'2')", 1, 6)} % 1000)/1000.0, 4) AS f2,
         | round((${hx("md5(m||'3')", 1, 6)} % 1000)/1000.0, 4) AS f3
         |FROM h""".stripMargin.replace("\n", " "),
    "q63_mm_frames" ->
      """WITH d AS (SELECT doc_id AS id, strlen(text) AS nb FROM documents),
        |f AS (SELECT id, nb, unnest(range(0, ceil(nb/64.0)::INT)) AS frameIdx FROM d)
        |SELECT id, frameIdx::INT AS frameIdx,
        | least(64, nb - frameIdx*64)::INT AS frameLen
        |FROM f WHERE frameIdx % 2 = 0""".stripMargin.replace("\n", " "),
  )
}
