package graft.queries

import graft.core._
import graft.model.Eval2
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 queries + DuckDB oracles. Wave 1: ranking-quality metrics
  * (NDCG/MAP/MRR/P@k over a per-user feed-ranking fixture), binary-scorer
  * diagnostics (decile lift, KS separation, Brier decomposition) and the
  * inter-rater agreement family (weighted kappa, Fleiss, Krippendorff).
  *
  * Fixtures are deterministic integer transforms of events/documents:
  * query = user, candidates = the user's events ranked by value, graded
  * relevance = event_id mod 4, binary label = event_id mod 3 = 0. */
object R9Queries {

  private def ev(s: SparkSession, dir: String) = table(s, dir, "events")
  private def docs(s: SparkSession, dir: String) = table(s, dir, "documents")

  /** Per-user ranking fixture: (query, id, score, rel, y). */
  private def ranked(s: SparkSession, dir: String): DataFrame =
    ev(s, dir).where(col("value").isNotNull)
      .select(col("user_id").as("q"), col("event_id").as("id"),
        col("value").as("score"),
        pmod(col("event_id"), lit(4)).as("rel"),
        (pmod(col("event_id"), lit(3)) === 0).as("y"))

  /** Three synthetic raters per document (fixed-rater agreement fixture). */
  private def raters(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id").as("item"),
      explode(array((0 to 2).map(j =>
        pmod(col("n_chars") + lit(j) * pmod(col("doc_id"), lit(7)),
          lit(4))): _*)).as("cat"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // NDCG@10 per user over graded relevance (6dp fixed-point gains)
    "q384_ndcg" -> ((s, dir) =>
      canon(Eval2.ndcgAtK(ranked(s, dir), "q", "id", "score", "rel", 10)
        .withColumnRenamed("query", "q"))),
    // average precision @10 per user (binary labels)
    "q385_map" -> ((s, dir) =>
      canon(Eval2.mapAtK(ranked(s, dir), "q", "id", "score", "y", 10)
        .withColumnRenamed("query", "q"))),
    // reciprocal rank @10 per user (0 when nothing relevant in top 10)
    "q386_mrr" -> ((s, dir) =>
      canon(Eval2.mrrAtK(ranked(s, dir), "q", "id", "score", "y", 10)
        .withColumn("first_rank", coalesce(col("first_rank"), lit(0L)))
        .withColumnRenamed("query", "q"))),
    // precision/recall @10 per user — exact integer count ratios
    "q387_precision_at_k" -> ((s, dir) =>
      canon(Eval2.precisionAtK(ranked(s, dir), "q", "id", "score", "y", 10)
        .withColumnRenamed("query", "q"))),
    // decile lift / cumulative gain of value as a purchase scorer
    "q388_decile_lift" -> ((s, dir) =>
      canon(Eval2.decileLift(
        ev(s, dir).where(col("value").isNotNull)
          .withColumn("y", col("event_type") === "purchase"),
        "value", "y", nBins = 10))),
    // KS separation of the same scorer (max selected on exact integers)
    "q389_ks_separation" -> ((s, dir) =>
      canon(Eval2.ksSeparation(
        ev(s, dir).where(col("value").isNotNull)
          .withColumn("y", col("event_type") === "purchase"),
        "value", "y"))),
    // Murphy decomposition of the Brier score over 10 probability bins
    "q390_brier" -> ((s, dir) =>
      canon(Eval2.brierDecomposition(
        docs(s, dir)
          .withColumn("p", (pmod(col("doc_id") * 37 + col("n_chars"),
            lit(1000))).cast("double") / 1000.0)
          .withColumn("y", col("lang") === "en"),
        "p", "y", nBins = 10))),
    // quadratic-weighted Cohen kappa between two synthetic raters
    "q391_weighted_kappa" -> ((s, dir) =>
      canon(Eval2.weightedKappa(
        docs(s, dir)
          .withColumn("r1", pmod(col("n_chars"), lit(5)))
          .withColumn("r2", least(lit(4), greatest(lit(0),
            pmod(col("n_chars"), lit(5)) + pmod(col("doc_id"), lit(3)) - 1))),
        "r1", "r2", nCat = 5))),
    // Fleiss kappa over the fixed-3-rater fixture
    "q392_fleiss_kappa" -> ((s, dir) =>
      canon(Eval2.fleissKappa(raters(s, dir), "item", "cat", nRaters = 3))),
    // Krippendorff alpha (nominal) over the same ratings
    "q393_krippendorff" -> ((s, dir) =>
      canon(Eval2.krippendorffAlpha(raters(s, dir), "item", "cat"))),
  )

  private val rankedSql =
    """e AS (SELECT user_id AS q, event_id AS id, value AS score,
      |  (event_id % 4)::BIGINT AS rel, event_id % 3 = 0 AS y
      | FROM events WHERE value IS NOT NULL),
      |r AS (SELECT *,
      |  row_number() OVER (PARTITION BY q ORDER BY score DESC, id) AS rn
      | FROM e)""".stripMargin.replace("\n", " ")

  private val ratersSql =
    """rt AS (SELECT doc_id AS item, unnest([
      |  (n_chars % 4)::BIGINT,
      |  ((n_chars + (doc_id % 7)) % 4)::BIGINT,
      |  ((n_chars + 2*(doc_id % 7)) % 4)::BIGINT]) AS cat
      | FROM documents)""".stripMargin.replace("\n", " ")

  val oracleSql: Map[String, String] = Map(
    "q384_ndcg" ->
      s"""WITH $rankedSql,
         |ri AS (SELECT *,
         |  row_number() OVER (PARTITION BY q ORDER BY rel DESC, id) AS rix
         | FROM r),
         |g AS (SELECT q, count(*) AS n_cand,
         |  sum(CASE WHEN rn <= 10 THEN floor(rel::DOUBLE /
         |    (ln((2 + rn - 1)::DOUBLE) / ln(2.0)) * 1000000.0 + 0.5)::BIGINT
         |   ELSE 0 END) AS dcgfp,
         |  sum(CASE WHEN rix <= 10 THEN floor(rel::DOUBLE /
         |    (ln((2 + rix - 1)::DOUBLE) / ln(2.0)) * 1000000.0 + 0.5)::BIGINT
         |   ELSE 0 END) AS idcgfp
         | FROM ri GROUP BY q)
         |SELECT q, n_cand,
         | round(dcgfp::DOUBLE / 1000000.0, 4) AS dcg,
         | round(idcgfp::DOUBLE / 1000000.0, 4) AS idcg,
         | round(CASE WHEN idcgfp::DOUBLE / 1000000.0 > 0
         |   THEN (dcgfp::DOUBLE / 1000000.0) / (idcgfp::DOUBLE / 1000000.0)
         |   ELSE 0.0 END, 4) + 0 AS ndcg
         |FROM g""".stripMargin.replace("\n", " "),
    "q385_map" ->
      s"""WITH $rankedSql,
         |c AS (SELECT *, sum(CASE WHEN y THEN 1 ELSE 0 END) OVER
         |   (PARTITION BY q ORDER BY score DESC, id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         | FROM r),
         |g AS (SELECT q,
         |  sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS n_rel,
         |  sum(CASE WHEN rn <= 10 AND y THEN
         |    floor(cum::DOUBLE / rn::DOUBLE * 1000000.0 + 0.5)::BIGINT
         |   ELSE 0 END) AS apfp
         | FROM c GROUP BY q)
         |SELECT q, n_rel,
         | round(CASE WHEN n_rel > 0 THEN
         |   apfp::DOUBLE / 1000000.0 / least(n_rel, 10)::DOUBLE
         |  ELSE 0.0 END, 4) + 0 AS ap
         |FROM g""".stripMargin.replace("\n", " "),
    "q386_mrr" ->
      s"""WITH $rankedSql,
         |g AS (SELECT q,
         |  coalesce(min(CASE WHEN y AND rn <= 10 THEN rn END), 0)::BIGINT
         |    AS first_rank
         | FROM r GROUP BY q)
         |SELECT q, first_rank,
         | round(CASE WHEN first_rank > 0 THEN 1.0 / first_rank::DOUBLE
         |  ELSE 0.0 END, 4) AS rr
         |FROM g""".stripMargin.replace("\n", " "),
    "q387_precision_at_k" ->
      s"""WITH $rankedSql,
         |g AS (SELECT q,
         |  sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS n_rel,
         |  sum(CASE WHEN rn <= 10 AND y THEN 1 ELSE 0 END)::BIGINT AS hits,
         |  sum(CASE WHEN rn <= 10 THEN 1 ELSE 0 END)::BIGINT AS k_
         | FROM r GROUP BY q)
         |SELECT q, n_rel, hits,
         | round(hits::DOUBLE / k_::DOUBLE, 4) AS p_at_k,
         | round(CASE WHEN n_rel > 0 THEN hits::DOUBLE / n_rel::DOUBLE
         |  ELSE 0.0 END, 4) AS r_at_k
         |FROM g""".stripMargin.replace("\n", " "),
    "q388_decile_lift" ->
      """WITH e AS (SELECT
        |  (CASE WHEN value >= 0 THEN floor(value*10000.0+0.5)
        |    ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS s,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        | FROM events WHERE value IS NOT NULL),
        |h AS (SELECT s, count(*)::BIGINT AS ns, sum(y)::BIGINT AS pos
        | FROM e GROUP BY s),
        |t AS (SELECT sum(ns)::BIGINT AS n, sum(pos)::BIGINT AS p FROM h),
        |c AS (SELECT s, ns, pos,
        |  sum(ns) OVER (ORDER BY s DESC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ns AS cb
        | FROM h),
        |b AS (SELECT least(9, floor(cb * 10 / t.n)::INT) AS bin, ns, pos,
        |  t.n AS nt, t.p AS pt FROM c CROSS JOIN t),
        |g AS (SELECT bin, sum(ns)::BIGINT AS n, sum(pos)::BIGINT AS pos,
        |  max(nt) AS nt, max(pt) AS pt FROM b GROUP BY bin)
        |SELECT bin, n, pos,
        | round(pos::DOUBLE / n::DOUBLE, 4) AS pos_rate,
        | round(CASE WHEN pt > 0 THEN
        |   (pos::DOUBLE / n::DOUBLE) / (pt::DOUBLE / nt::DOUBLE)
        |  ELSE 0.0 END, 4) AS lift,
        | round(CASE WHEN pt > 0 THEN
        |   (sum(pos) OVER (ORDER BY bin
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
        |    / pt::DOUBLE
        |  ELSE 0.0 END, 4) AS cum_gain
        |FROM g""".stripMargin.replace("\n", " "),
    "q389_ks_separation" ->
      """WITH e AS (SELECT
        |  (CASE WHEN value >= 0 THEN floor(value*10000.0+0.5)
        |    ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS s,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        | FROM events WHERE value IS NOT NULL),
        |h AS (SELECT s, count(*)::BIGINT AS ns, sum(y)::BIGINT AS pos
        | FROM e GROUP BY s),
        |t AS (SELECT sum(pos)::BIGINT AS p,
        |  sum(ns - pos)::BIGINT AS q_ FROM h),
        |c AS (SELECT s,
        |  sum(pos) OVER (ORDER BY s
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
        |  sum(ns - pos) OVER (ORDER BY s
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
        | FROM h)
        |SELECT t.p AS n_pos, t.q_ AS n_neg,
        | round(CASE WHEN t.p > 0 AND t.q_ > 0 THEN
        |   max(abs(cp * t.q_ - cn * t.p))::DOUBLE /
        |    (t.p::DOUBLE * t.q_::DOUBLE)
        |  ELSE 0.0 END, 4) AS ks
        |FROM c CROSS JOIN t GROUP BY t.p, t.q_"""
        .stripMargin.replace("\n", " "),
    "q390_brier" ->
      """WITH e AS (SELECT
        |  floor(((doc_id*37 + n_chars) % 1000)::DOUBLE / 1000.0
        |    * 10000.0 + 0.5)::BIGINT AS pfp,
        |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        | FROM documents),
        |b AS (SELECT least(9, floor(pfp * 10 / 10000)::INT) AS bin, pfp, y
        | FROM e),
        |pb AS (SELECT bin, count(*)::BIGINT AS nk, sum(y)::BIGINT AS ok,
        |  sum(pfp)::DECIMAL(38,0) AS sfk,
        |  sum(pfp * pfp)::DECIMAL(38,0) AS sfk2,
        |  sum(pfp * y)::DECIMAL(38,0) AS sfy
        | FROM b GROUP BY bin),
        |f AS (SELECT nk, ok,
        |  sfk2::DOUBLE / 100000000.0 - 2.0 * sfy::DOUBLE / 10000.0
        |    + ok::DOUBLE AS bss,
        |  nk::DOUBLE * (sfk::DOUBLE / 10000.0 / nk::DOUBLE
        |    - ok::DOUBLE / nk::DOUBLE)
        |   * (sfk::DOUBLE / 10000.0 / nk::DOUBLE
        |    - ok::DOUBLE / nk::DOUBLE) AS rels,
        |  nk::DOUBLE * (ok::DOUBLE / nk::DOUBLE)
        |   * (ok::DOUBLE / nk::DOUBLE) AS ress
        | FROM pb),
        |g AS (SELECT sum(nk)::BIGINT AS n, sum(ok)::BIGINT AS o,
        |  sum(floor(bss * 1000000.0 + 0.5)::BIGINT) AS bsfp,
        |  sum(floor(rels * 1000000.0 + 0.5)::BIGINT) AS relfp,
        |  sum(floor(ress * 1000000.0 + 0.5)::BIGINT) AS ressfp
        | FROM f)
        |SELECT n,
        | round(bsfp::DOUBLE / 1000000.0 / n::DOUBLE, 4) AS bs,
        | round(relfp::DOUBLE / 1000000.0 / n::DOUBLE, 4) AS reliability,
        | round(ressfp::DOUBLE / 1000000.0 / n::DOUBLE
        |   - (o::DOUBLE / n::DOUBLE) * (o::DOUBLE / n::DOUBLE), 4) + 0
        |  AS resolution,
        | round((o::DOUBLE / n::DOUBLE)
        |   * (1.0 - o::DOUBLE / n::DOUBLE), 4) AS uncertainty
        |FROM g""".stripMargin.replace("\n", " "),
    "q391_weighted_kappa" ->
      """WITH d AS (SELECT (n_chars % 5)::BIGINT AS i,
        |  least(4, greatest(0, (n_chars % 5) + (doc_id % 3) - 1))::BIGINT AS j
        | FROM documents),
        |o AS (SELECT i, j, count(*)::BIGINT AS c FROM d GROUP BY 1, 2),
        |ra AS (SELECT i, sum(c)::BIGINT AS ci FROM o GROUP BY i),
        |rb AS (SELECT j, sum(c)::BIGINT AS cj FROM o GROUP BY j),
        |wo AS (SELECT sum(c)::BIGINT AS n,
        |  sum(c*(i-j)*(i-j))::DECIMAL(38,0) AS wo_ FROM o),
        |we AS (SELECT sum(ci*cj*(i-j)*(i-j))::DECIMAL(38,0) AS we_
        | FROM ra CROSS JOIN rb)
        |SELECT n, round(1.0 - wo_::DOUBLE * n::DOUBLE / we_::DOUBLE, 4) + 0
        |  AS kappa_w
        |FROM wo CROSS JOIN we""".stripMargin.replace("\n", " "),
    "q392_fleiss_kappa" ->
      s"""WITH $ratersSql,
         |cnt AS (SELECT item, cat, count(*)::BIGINT AS c
         | FROM rt GROUP BY 1, 2),
         |it AS (SELECT item, sum(c)::BIGINT AS m,
         |  sum(c*c)::BIGINT AS s2 FROM cnt GROUP BY item),
         |ok AS (SELECT item, m, s2 FROM it WHERE m = 3),
         |ag AS (SELECT count(*)::BIGINT AS n_items,
         |  sum(s2 - m)::BIGINT AS pnum FROM ok),
         |ct AS (SELECT cat, sum(c)::BIGINT AS tc FROM cnt
         | JOIN ok USING (item) GROUP BY cat),
         |ct2 AS (SELECT sum((tc*tc)::DECIMAL(38,0))::DOUBLE AS t2 FROM ct),
         |pe AS (SELECT ct2.t2 /
         |   (ag.n_items::DOUBLE * 3 * ag.n_items::DOUBLE * 3) AS pe_
         | FROM ct2 CROSS JOIN ag)
         |SELECT ag.n_items, 3 AS n_raters,
         | round((ag.pnum::DOUBLE / (ag.n_items::DOUBLE * 6.0) - pe.pe_)
         |   / (1.0 - pe.pe_), 4) + 0 AS kappa
         |FROM ag CROSS JOIN pe""".stripMargin.replace("\n", " "),
    "q393_krippendorff" ->
      s"""WITH $ratersSql,
         |cnt AS (SELECT item, cat, count(*)::BIGINT AS c
         | FROM rt GROUP BY 1, 2),
         |it AS (SELECT item, sum(c)::BIGINT AS m, sum(c*c)::BIGINT AS s2
         | FROM cnt GROUP BY item HAVING sum(c) >= 2),
         |ds AS (SELECT sum(m)::BIGINT AS n_values,
         |  count(*)::BIGINT AS n_items,
         |  sum(floor((m*m - s2)::DOUBLE / (m - 1)::DOUBLE
         |    * 1000000.0 + 0.5)::BIGINT) AS dofp FROM it),
         |ct AS (SELECT cat, sum(c)::BIGINT AS tc FROM cnt
         | JOIN it USING (item) GROUP BY cat),
         |de AS (SELECT sum(tc)::BIGINT AS n_,
         |  (sum(tc)::BIGINT::DOUBLE * sum(tc)::BIGINT::DOUBLE
         |    - sum((tc*tc)::DECIMAL(38,0))::DOUBLE)
         |   / (sum(tc)::BIGINT - 1)::DOUBLE AS den FROM ct)
         |SELECT ds.n_items, ds.n_values,
         | round(1.0 - (ds.dofp::DOUBLE / 1000000.0)
         |   / (de.den / de.n_::DOUBLE * ds.n_values::DOUBLE / de.n_::DOUBLE),
         |  4) + 0 AS alpha
         |FROM ds CROSS JOIN de""".stripMargin.replace("\n", " "),
  )
}
