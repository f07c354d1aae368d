package graft.queries

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 queries + DuckDB oracles. Lead item: the scale-form
  * counterparts of the round-11 verdict — histogram-ECDF ECOD (the
  * no-data-sized-sort form of q514).
  *
  * Determinism: the engine-wide q116 device (fixed-point term
  * quantization before every cross-row sum); ln/exp ride the
  * established libm-parity assumption. */
object R12Queries {

  private def emb(s: SparkSession, dir: String) = table(s, dir, "embeddings")

  /** Sign-symmetric fixed-point long of a SQL expression at scale `s`. */
  private def fp(e: String, s: String): String =
    s"(CASE WHEN ($e) >= 0 THEN floor(($e)*$s+0.5) " +
      s"ELSE -floor(-($e)*$s+0.5) END)::BIGINT"

  /** (vec_id, i, x): embeddings exploded to per-dimension doubles. */
  private val exCte =
    """ex AS (SELECT vec_id, t.j AS i, (embedding::DOUBLE[])[t.j+1] AS x
      | FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS j) t)"""
      .stripMargin.replace("\n", " ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ECOD on per-dim quantized value histograms: the 100 TB form of
    // q514 (no per-dim data-sized sort; r11 verdict item 4)
    "q550_ecod_hist" -> ((s, dir) =>
      canon(graft.multi.OutlierFaces.ecodHistogram(
        emb(s, dir), "vec_id", "embedding", grain = 4)))
  )

  val oracleSql: Map[String, String] = Map(
    "q550_ecod_hist" -> {
      val mu = "(s1::DOUBLE/1e8/nn)"
      s"""WITH $exCte,
         |exq AS (SELECT vec_id, i, ${fp("x", "1e4")} AS xq FROM ex),
         |hq AS (SELECT i, xq, count(*)::BIGINT AS c FROM exq
         | GROUP BY 1, 2),
         |cu AS (SELECT i, xq, c,
         |  sum(c) OVER (PARTITION BY i ORDER BY xq
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         |   AS cl,
         |  (sum(c) OVER (PARTITION BY i))::BIGINT AS n FROM hq),
         |cr AS (SELECT i, xq, c, cl, n, n - cl + c AS crr FROM cu),
         |sk0 AS (SELECT i, count(*) AS nn,
         |  sum(${fp("xq::DOUBLE/1e4", "1e8")})::HUGEINT AS s1,
         |  sum(${fp("(xq::DOUBLE/1e4)*(xq::DOUBLE/1e4)", "1e8")})
         |   ::HUGEINT AS s2,
         |  sum(${fp("(xq::DOUBLE/1e4)*(xq::DOUBLE/1e4)*(xq::DOUBLE/1e4)",
              "1e8")})::HUGEINT AS s3
         | FROM exq GROUP BY 1),
         |sk AS (SELECT i,
         |  ${fp(s"s3::DOUBLE/1e8/nn - 3.0*$mu*(s2::DOUBLE/1e8/nn) " +
               s"+ 2.0*$mu*$mu*$mu", "1e6")} < 0 AS neg FROM sk0),
         |os AS (SELECT vec_id,
         |  sum(${fp("-ln(cl::DOUBLE/n)", "1e8")})::HUGEINT::DOUBLE/1e8
         |   AS ol,
         |  sum(${fp("-ln(crr::DOUBLE/n)", "1e8")})::HUGEINT::DOUBLE/1e8
         |   AS orr,
         |  sum(${fp("CASE WHEN neg THEN -ln(cl::DOUBLE/n) " +
               "ELSE -ln(crr::DOUBLE/n) END", "1e8")})
         |   ::HUGEINT::DOUBLE/1e8 AS oa
         | FROM exq JOIN cr USING (i, xq) JOIN sk USING (i) GROUP BY 1)
         |SELECT vec_id, round(ol, 4) + 0 AS o_left,
         | round(orr, 4) + 0 AS o_right, round(oa, 4) + 0 AS o_auto,
         | round(greatest(ol, orr, oa), 4) + 0 AS ecod FROM os"""
        .stripMargin.replace("\n", " ")
    }
  )
}
