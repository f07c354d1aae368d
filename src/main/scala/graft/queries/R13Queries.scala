package graft.queries

import graft.core._
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 queries + DuckDB oracles: power-transform fit, weak-
  * supervision label model, content-defined chunk dedup, ROUGE-N pair
  * overlap, contrastive hard-negative mining.
  *
  * Determinism: the engine-wide q116 device (fixed-point quantization
  * before cross-row float sums); exp/ln ride the established libm-
  * parity assumption; hashes are md5-derived on both engines. */
object R13Queries {

  private def ev(s: SparkSession, dir: String) = table(s, dir, "events")
  private def docs(s: SparkSession, dir: String) = table(s, dir, "documents")
  private def emb(s: SparkSession, dir: String) = table(s, dir, "embeddings")

  private def h56(e: String) = s"('0x'||substr(md5($e),1,14))::BIGINT"

  /** Sign-symmetric fixed-point long of a SQL expression at scale `s`. */
  private def fp(e: String, s: String): String =
    s"(CASE WHEN ($e) >= 0 THEN floor(($e)*$s+0.5) " +
      s"ELSE -floor(-($e)*$s+0.5) END)::BIGINT"

  /** The labeling-function vote table both engines derive from
    * documents: 4 heuristic LFs voting {-1,0,1} (abstain 0). */
  private def lfVotes(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).where(col("text").isNotNull)
    def lf(name: String, v: org.apache.spark.sql.Column) =
      d.select(col("doc_id"), lit(name).as("lf"), v.cast("long").as("vote"))
    val digits = length(regexp_replace(col("text"), "[^0-9]", ""))
      .cast("double") / length(col("text")).cast("double")
    val ntok = size(TextOps.tokens(col("text")))
    lf("len", when(col("n_chars") > 350, 1L).when(col("n_chars") < 120, -1L)
        .otherwise(0L))
      .unionByName(lf("lang", when(col("lang") === "en", 1L)
        .when(col("lang") === "zh", -1L).otherwise(0L)))
      .unionByName(lf("digit", when(digits > 0.05, -1L)
        .when(digits < 0.01, 1L).otherwise(0L)))
      .unionByName(lf("tok", when(ntok > 60, 1L)
        .when(ntok < 20, -1L).otherwise(0L)))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Yeo-Johnson power-transform λ grid MLE per event_type
    "q561_yeojohnson" -> ((s, dir) =>
      canon(graft.model.Transforms.yeoJohnsonFit(ev(s, dir),
        "event_type", "value"))),
    // Snorkel-style two-round label model over 4 heuristic doc LFs
    "q562_label_model" -> ((s, dir) =>
      canon(graft.model.WeakLabels.labelModel(lfVotes(s, dir),
        "doc_id", "lf", "vote")
        .withColumnRenamed("item", "doc_id"))),
    // content-defined (Rabin) chunk dedup across the corpus
    "q563_cdc_chunks" -> ((s, dir) =>
      canon(TextOps.cdcChunkDedup(docs(s, dir), "doc_id", "text"))),
    // ROUGE-2 clipped bigram overlap of docs paired (d, d+250)
    "q564_rouge2" -> ((s, dir) => {
      val d = docs(s, dir).where(col("text").isNotNull)
      val pairs = d.select(col("doc_id").as("id_a"), col("text").as("ta"))
        .join(d.select((col("doc_id") - 250L).as("id_a"),
          col("doc_id").as("id_b"), col("text").as("tb")), "id_a")
      canon(TextOps.rougeN(pairs, Seq("id_a", "id_b"), "ta", "tb", n = 2))
    }),
    // 2-topic PLSA EM (3 rounds, top-500 vocab) over documents
    "q566_plsa" -> ((s, dir) =>
      canon(graft.text.Topics.plsa2(docs(s, dir), "doc_id", "text",
        vocab = 500, iters = 3))),
    // Weibull shape/scale profile-likelihood grid MLE per event_type
    "q567_weibull" -> ((s, dir) =>
      canon(graft.model.Survival.weibullFit(ev(s, dir),
        "event_type", "value"))),
    // Simpson's-paradox audit: crude vs event_type-stratified
    // high-value rate difference, arm = user parity
    "q568_simpson" -> ((s, dir) =>
      canon(graft.model.Causal.simpsonAudit(
        ev(s, dir).where(col("value").isNotNull)
          .withColumn("t", pmod(col("user_id"), lit(2L)) === 0)
          .withColumn("y",
            when(col("value") > 150.0, 1.0).otherwise(0.0)),
        "event_type", "t", "y"))),
    // Smith-Waterman local alignment of each user's event-type sequence
    // against the view->click->purchase funnel (match 2, mis/gap -1)
    "q569_smith_waterman" -> ((s, dir) => {
      val pat = Seq("view", "click", "purchase")
      val sw = udf((a: Seq[String]) =>
        graft.seq.SeriesKernels.smithWaterman(a, pat))
      canon(ev(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("len"),
          transform(array_sort(collect_list(
            struct(col("event_id"), col("event_type")))),
            x => x.getField("event_type")).as("_st"))
        .withColumn("sw", sw(col("_st")).cast("long"))
        .withColumn("sw_norm", col("sw").cast("double") / 6.0)
        .select("user_id", "len", "sw", "sw_norm"))
    }),
    // contrastive hard negatives: cosine band [0.2, 0.9), top-5 per
    // anchor, (v, v+100) positive pairs excluded
    "q565_hard_neg" -> ((s, dir) => {
      val e = emb(s, dir)
      val pos = e.select(col("vec_id"), col("vec_id") + 100L)
      canon(graft.sim.Similarity.hardNegatives(e.where(col("vec_id") < 20),
        e, "vec_id", "embedding", k = 5, loCos = 0.2, hiCos = 0.9,
        positives = Some(pos)))
    }))

  /** The LF vote table as a DuckDB CTE (mirrors [[lfVotes]]). */
  private val votesCte =
    """v AS (
      | SELECT doc_id, lf, vote FROM (
      |  SELECT doc_id, 'len' AS lf,
      |   CASE WHEN n_chars > 350 THEN 1 WHEN n_chars < 120 THEN -1
      |    ELSE 0 END AS vote FROM documents WHERE text IS NOT NULL
      |  UNION ALL
      |  SELECT doc_id, 'lang',
      |   CASE WHEN lang = 'en' THEN 1 WHEN lang = 'zh' THEN -1 ELSE 0 END
      |   FROM documents WHERE text IS NOT NULL
      |  UNION ALL
      |  SELECT doc_id, 'digit',
      |   CASE WHEN length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
      |     / length(text)::DOUBLE > 0.05 THEN -1
      |    WHEN length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
      |     / length(text)::DOUBLE < 0.01 THEN 1 ELSE 0 END
      |   FROM documents WHERE text IS NOT NULL
      |  UNION ALL
      |  SELECT doc_id, 'tok',
      |   CASE WHEN len(regexp_extract_all(lower(text), '\S+')) > 60 THEN 1
      |    WHEN len(regexp_extract_all(lower(text), '\S+')) < 20 THEN -1
      |    ELSE 0 END
      |   FROM documents WHERE text IS NOT NULL))"""
      .stripMargin.replace("\n", " ")

  val oracleSql: Map[String, String] = Map(
    "q561_yeojohnson" -> {
      // ψ(x, λ) with powers as exp(k·ln(·)) — the engine's exact form
      val psi =
        """(CASE WHEN x >= 0 THEN
          |  CASE WHEN abs(lam) > 1e-12
          |   THEN (exp(lam * ln(x + 1.0)) - 1.0) / lam
          |   ELSE ln(x + 1.0) END
          | ELSE
          |  CASE WHEN abs(lam - 2.0) > 1e-12
          |   THEN -(exp((2.0 - lam) * ln(-x + 1.0)) - 1.0) / (2.0 - lam)
          |   ELSE -ln(-x + 1.0) END END)""".stripMargin.replace("\n", " ")
      val jac =
        "(CASE WHEN x >= 0 THEN ln(x + 1.0) ELSE -ln(-x + 1.0) END)"
      s"""WITH b AS (SELECT event_type AS key, value::DOUBLE AS x
         |  FROM events WHERE value IS NOT NULL),
         |g AS (SELECT unnest([-2.0,-1.5,-1.0,-0.5,0.0,0.5,1.0,1.5,2.0]) AS lam),
         |t AS (SELECT key, lam, ${fp(psi, "1e6")} AS p6,
         |  ${fp(jac, "1e9")} AS j9 FROM b CROSS JOIN g),
         |a AS (SELECT key, lam, count(*)::BIGINT AS n,
         |  sum(p6)::HUGEINT AS s, sum(p6::HUGEINT * p6::HUGEINT) AS q,
         |  sum(j9)::HUGEINT AS j
         | FROM t GROUP BY 1, 2 HAVING count(*) >= 2),
         |ll AS (SELECT key, lam, n,
         |  -(n::DOUBLE) / 2.0 * ln(greatest(
         |    (q::DOUBLE / 1e12 - (s::DOUBLE / 1e6) * (s::DOUBLE / 1e6)
         |      / n::DOUBLE) / n::DOUBLE, 1e-12))
         |   + (lam - 1.0) * (j::DOUBLE / 1e9) AS ll
         | FROM a),
         |r AS (SELECT key, lam, ll, n, row_number() OVER
         |  (PARTITION BY key ORDER BY ${fp("ll", "1e6")} DESC, lam ASC) AS rk
         | FROM ll)
         |SELECT key, lam AS lambda, round(ll, 4) AS ll, n
         |FROM r WHERE rk = 1""".stripMargin.replace("\n", " ")
    },
    "q562_label_model" ->
      s"""WITH $votesCte,
         |m AS (SELECT doc_id, CASE WHEN sum(vote) > 0 THEN 1
         |  WHEN sum(vote) < 0 THEN -1 ELSE 0 END AS maj
         | FROM v GROUP BY 1),
         |acc AS (SELECT lf,
         |  least(greatest(
         |   sum(CASE WHEN vote = maj THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE, 0.05), 1.0 - 0.05) AS a
         | FROM v JOIN m USING (doc_id)
         | WHERE vote <> 0 AND maj <> 0 GROUP BY 1),
         |w AS (SELECT lf, ln(a / (1.0 - a)) AS w FROM acc),
         |sc AS (SELECT doc_id,
         |  sum(CASE WHEN vote <> 0 THEN 1 ELSE 0 END)::BIGINT AS n_votes,
         |  sum(CASE WHEN vote <> 0
         |   THEN ${fp("w.w * vote", "1e9")} END)::HUGEINT AS s9
         | FROM v LEFT JOIN w USING (lf) GROUP BY 1)
         |SELECT doc_id, n_votes,
         | round(s9::DOUBLE / 1e9, 4) AS score,
         | CASE WHEN s9::DOUBLE / 1e9 > 1e-9 THEN 1
         |  WHEN s9::DOUBLE / 1e9 < -1e-9 THEN -1 ELSE 0 END::BIGINT AS label
         |FROM sc""".stripMargin.replace("\n", " "),
    "q563_cdc_chunks" -> {
      // window-8 base-31 polynomial at position i (8 explicit exact
      // integer terms — mirrors the engine's Horner fold bit-for-bit)
      val h = (0 until 8).map(j =>
        s"ord(substr(text, i + $j, 1))::BIGINT * ${math.pow(31, 7 - j).toLong}")
        .mkString(" + ")
      s"""WITH d AS (SELECT doc_id, text FROM documents
         |  WHERE text IS NOT NULL AND length(text) >= 8),
         |pos AS (SELECT doc_id, text, i
         | FROM d, LATERAL (SELECT unnest(generate_series(1,
         |   greatest(length(text) - 7, 1))) AS i) g
         | WHERE ($h) % 64 = 0),
         |cuts AS (SELECT doc_id, text, 1 AS p FROM d
         | UNION SELECT doc_id, text, i FROM pos),
         |ch AS (SELECT doc_id,
         |  substr(text, p, coalesce(lead(p) OVER
         |    (PARTITION BY doc_id ORDER BY p), length(text) + 1) - p) AS c
         | FROM cuts),
         |hs AS (SELECT doc_id, ${h56("c")} AS ch FROM ch
         | WHERE length(c) > 0),
         |cnt AS (SELECT ch, count(DISTINCT doc_id) AS docs
         | FROM hs GROUP BY 1)
         |SELECT doc_id, count(*)::BIGINT AS n_chunks,
         | sum(CASE WHEN docs >= 2 THEN 1 ELSE 0 END)::BIGINT AS dup_chunks,
         | round(sum(CASE WHEN docs >= 2 THEN 1 ELSE 0 END)::DOUBLE
         |  / count(*)::DOUBLE, 4) AS dup_ratio
         |FROM hs JOIN cnt USING (ch) GROUP BY 1"""
        .stripMargin.replace("\n", " ")
    },
    "q564_rouge2" ->
      """WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.tk AS ta, b.tk AS tb
        | FROM d a JOIN d b ON b.doc_id = a.doc_id + 250),
        |ga AS (SELECT id_a, id_b, ta[i] || ' ' || ta[i+1] AS g,
        |  count(*)::BIGINT AS ca
        | FROM p, LATERAL (SELECT unnest(generate_series(1,
        |   greatest(len(ta) - 1, 0))) AS i) s
        | GROUP BY 1, 2, 3),
        |gb AS (SELECT id_a, id_b, tb[i] || ' ' || tb[i+1] AS g,
        |  count(*)::BIGINT AS cb
        | FROM p, LATERAL (SELECT unnest(generate_series(1,
        |   greatest(len(tb) - 1, 0))) AS i) s
        | GROUP BY 1, 2, 3),
        |j AS (SELECT coalesce(ga.id_a, gb.id_a) AS id_a,
        |  coalesce(ga.id_b, gb.id_b) AS id_b,
        |  coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
        | FROM ga FULL JOIN gb USING (id_a, id_b, g)),
        |o AS (SELECT id_a, id_b, sum(least(ca, cb))::BIGINT AS overlap,
        |  sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b
        | FROM j GROUP BY 1, 2)
        |SELECT id_a, id_b, overlap, n_a, n_b,
        | round(CASE WHEN n_a > 0 THEN overlap::DOUBLE / n_a END, 4) AS recall,
        | round(CASE WHEN n_b > 0 THEN overlap::DOUBLE / n_b END, 4) AS "precision",
        | round(CASE WHEN n_a > 0 AND n_b > 0 AND overlap > 0
        |  THEN 2.0 * (overlap::DOUBLE / n_a) * (overlap::DOUBLE / n_b)
        |   / (overlap::DOUBLE / n_a + overlap::DOUBLE / n_b)
        |  WHEN n_a > 0 AND n_b > 0 THEN 0.0 END, 4) AS f1
        |FROM o""".stripMargin.replace("\n", " "),
    "q567_weibull" ->
      s"""WITH b AS (SELECT event_type AS key, value::DOUBLE AS x
         |  FROM events WHERE value IS NOT NULL AND value > 0),
         |g AS (SELECT unnest([0.5,0.75,1.0,1.25,1.5,1.75,2.0,2.25,2.5,
         |  2.75,3.0]) AS k),
         |t AS (SELECT key, k, ${fp("exp(k * ln(x))", "1e9")} AS xk,
         |  ${fp("ln(x)", "1e9")} AS lx FROM b CROSS JOIN g),
         |a AS (SELECT key, k, count(*)::BIGINT AS n,
         |  sum(xk)::HUGEINT AS sk, sum(lx)::HUGEINT AS sl
         | FROM t GROUP BY 1, 2 HAVING count(*) >= 2),
         |ll AS (SELECT key, k, n,
         |  n::DOUBLE * ln(k) - n::DOUBLE * ln(sk::DOUBLE / 1e9 / n::DOUBLE)
         |   + (k - 1.0) * (sl::DOUBLE / 1e9) - n::DOUBLE AS ll,
         |  exp(ln(sk::DOUBLE / 1e9 / n::DOUBLE) / k) AS scale FROM a),
         |r AS (SELECT key, k, n, ll, scale, row_number() OVER
         |  (PARTITION BY key ORDER BY ${fp("ll", "1e6")} DESC, k ASC) AS rk
         | FROM ll)
         |SELECT key, k AS shape, round(scale, 4) AS scale,
         | round(ll, 4) AS ll, n FROM r WHERE rk = 1"""
        .stripMargin.replace("\n", " "),
    "q568_simpson" ->
      s"""WITH b AS (SELECT event_type AS stratum, (user_id % 2 = 0) AS t,
         |  CASE WHEN value > 150.0 THEN 1.0 ELSE 0.0 END AS y
         | FROM events WHERE value IS NOT NULL),
         |cells AS (SELECT stratum, t, count(*)::BIGINT AS n,
         |  sum(${fp("y", "1e9")})::BIGINT AS s FROM b GROUP BY 1, 2),
         |sides AS (SELECT a.stratum, a.n AS nt, c.n AS nc,
         |  a.s::DOUBLE / 1e9 / a.n::DOUBLE AS pt,
         |  c.s::DOUBLE / 1e9 / c.n::DOUBLE AS pc
         | FROM (SELECT * FROM cells WHERE t) a
         | JOIN (SELECT * FROM cells WHERE NOT t) c USING (stratum)),
         |crude AS (SELECT
         |  (SELECT sum(s)::DOUBLE / 1e9 / sum(n)::DOUBLE
         |    FROM cells WHERE t) -
         |  (SELECT sum(s)::DOUBLE / 1e9 / sum(n)::DOUBLE
         |    FROM cells WHERE NOT t) AS crude_diff),
         |strat AS (SELECT sum(${fp("pt - pc", "1e9")} * (nt + nc))::DOUBLE
         |   / 1e9 / sum(nt + nc)::DOUBLE AS strat_diff FROM sides)
         |SELECT stratum, (nt + nc) AS n, round(pt, 4) AS p_t,
         | round(pc, 4) AS p_c, round(pt - pc, 4) AS diff,
         | round(crude_diff, 4) AS crude_diff,
         | round(strat_diff, 4) AS strat_diff,
         | ((crude_diff > 1e-9 AND strat_diff < -1e-9) OR
         |  (crude_diff < -1e-9 AND strat_diff > 1e-9)) AS reversed
         |FROM sides, crude, strat""".stripMargin.replace("\n", " "),
    "q569_smith_waterman" ->
      """WITH RECURSIVE s AS (SELECT user_id, event_type,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY event_id, event_type) AS pos FROM events),
        |seqs AS (SELECT user_id, list(event_type ORDER BY pos) AS st,
        |  count(*)::BIGINT AS len FROM s GROUP BY 1),
        |w AS (
        | SELECT user_id, st, len, 0::BIGINT AS t, 0 AS p1, 0 AS p2,
        |  0 AS p3, 0 AS best
        | FROM seqs
        | UNION ALL
        | SELECT user_id, st, len, t + 1, n1, n2, n3,
        |  greatest(best, n1, n2, n3)
        | FROM (SELECT *, greatest(0, p2 + sc3, p3 - 1, n2 - 1) AS n3
        |  FROM (SELECT *, greatest(0, p1 + sc2, p2 - 1, n1 - 1) AS n2
        |   FROM (SELECT *, greatest(0, sc1, p1 - 1) AS n1
        |    FROM (SELECT user_id, st, len, t, p1, p2, p3, best,
        |      CASE WHEN st[(t + 1)::INT] = 'view' THEN 2 ELSE -1 END AS sc1,
        |      CASE WHEN st[(t + 1)::INT] = 'click' THEN 2 ELSE -1 END AS sc2,
        |      CASE WHEN st[(t + 1)::INT] = 'purchase' THEN 2 ELSE -1 END AS sc3
        |     FROM w WHERE t < len)))))
        |SELECT user_id, len, best::BIGINT AS sw,
        | round(best::DOUBLE / 6.0, 4) AS sw_norm
        |FROM w WHERE t = len""".stripMargin.replace("\n", " "),
    "q566_plsa" -> {
      // round-unrolled EM replay (the q513 unrolled-GD device applied
      // to EM): each round r derives resp_r from (th_{r-1}, phi_{r-1}),
      // re-aggregates, and 6dp-freezes — bit-identical to the engine's
      // localCheckpointed loop
      def r6(e: String) = s"(${fp(e, "1e6")})::DOUBLE / 1e6"
      val rounds = (1 to 3).map { r =>
        val (thP, phiP) = (s"th${r - 1}", s"phi${r - 1}")
        s"""resp$r AS (SELECT d, w,
           |  ${fp("c::DOUBLE * r0", "1e9")} AS m0,
           |  ${fp("c::DOUBLE * (1.0 - r0)", "1e9")} AS m1
           | FROM (SELECT d, w, c,
           |   th * p0 / (th * p0 + (1.0 - th) * p1) AS r0
           |  FROM pairs JOIN $thP USING (d) JOIN $phiP USING (w))),
           |th$r AS (SELECT d, ${r6("sum(m0)::DOUBLE / (sum(m0) + sum(m1))::DOUBLE")} AS th
           | FROM resp$r GROUP BY 1),
           |byw$r AS (SELECT w, sum(m0)::HUGEINT AS n0, sum(m1)::HUGEINT AS n1
           | FROM resp$r GROUP BY 1),
           |den$r AS (SELECT sum(n0)::DOUBLE / 1e9 AS d0,
           |  sum(n1)::DOUBLE / 1e9 AS d1 FROM byw$r),
           |phi$r AS (SELECT w,
           |  ${r6(s"(n0::DOUBLE / 1e9 + 1e-6) / ((SELECT d0 FROM den$r) + 1e-6 * (SELECT v FROM tot))")} AS p0,
           |  ${r6(s"(n1::DOUBLE / 1e9 + 1e-6) / ((SELECT d1 FROM den$r) + 1e-6 * (SELECT v FROM tot))")} AS p1
           | FROM byw$r)"""
      }.mkString(",\n")
      s"""WITH tk AS (SELECT doc_id AS d,
         |  unnest(regexp_extract_all(lower(text), '\\S+')) AS w
         | FROM documents WHERE text IS NOT NULL),
         |wc AS (SELECT w, count(*)::BIGINT AS wc FROM tk GROUP BY 1),
         |top AS (SELECT w FROM wc
         | QUALIFY row_number() OVER (ORDER BY wc DESC, w ASC) <= 500),
         |pairs AS (SELECT d, w, count(*)::BIGINT AS c
         | FROM tk JOIN top USING (w) GROUP BY 1, 2),
         |pb AS (SELECT w, 10000 + (${h56("'plsa0:'||w")} % 1000) AS n0,
         |  10000 + (${h56("'plsa1:'||w")} % 1000) AS n1
         | FROM (SELECT DISTINCT w FROM pairs)),
         |tot AS (SELECT sum(n0)::BIGINT AS t0, sum(n1)::BIGINT AS t1,
         |  count(*)::BIGINT AS v FROM pb),
         |phi0 AS (SELECT w, n0::DOUBLE / (SELECT t0 FROM tot) AS p0,
         |  n1::DOUBLE / (SELECT t1 FROM tot) AS p1 FROM pb),
         |th0 AS (SELECT DISTINCT d, 0.5 AS th FROM pairs),
         |$rounds,
         |nt AS (SELECT d, sum(c)::BIGINT AS n_terms FROM pairs GROUP BY 1)
         |SELECT d AS doc_id, n_terms, round(th, 4) AS theta0,
         | (CASE WHEN th >= 0.5 THEN 0 ELSE 1 END)::BIGINT AS topic
         |FROM th3 JOIN nt USING (d)""".stripMargin.replace("\n", " ")
    },
    "q565_hard_neg" ->
      """WITH p AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
        |  list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
        |   (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
        |    * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS cos
        | FROM embeddings q, embeddings c
        | WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id),
        |b AS (SELECT * FROM p WHERE cos >= 0.2 AND cos < 0.9
        |  AND cid <> qid + 100),
        |r AS (SELECT *, row_number() OVER
        |  (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
        | FROM b QUALIFY rank <= 5)
        |SELECT qid, cid, round(cos, 4) AS cos, rank FROM r"""
        .stripMargin.replace("\n", " "))
}
