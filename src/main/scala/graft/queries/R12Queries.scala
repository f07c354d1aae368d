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

  private val toksSql = """regexp_extract_all(lower(text), '\S+')"""

  /** (vec_id, i, x): embeddings exploded to per-dimension doubles. */
  private val exCte =
    """ex AS (SELECT vec_id, t.j AS i, (embedding::DOUBLE[])[t.j+1] AS x
      | FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS j) t)"""
      .stripMargin.replace("\n", " ")

  private def ev(s: SparkSession, dir: String) = table(s, dir, "events")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ECOD on per-dim quantized value histograms: the 100 TB form of
    // q514 (no per-dim data-sized sort; r11 verdict item 4)
    "q550_ecod_hist" -> ((s, dir) =>
      canon(graft.multi.OutlierFaces.ecodHistogram(
        emb(s, dir), "vec_id", "embedding", grain = 4))),
    // negative-binomial (NB2) GLM: the q542 Poisson fixture refit with
    // dispersion alpha = 1 — overdispersed counts shrink the gradient
    "q551_negbin_reg" -> ((s, dir) =>
      canon(graft.model.Assoc.negBinRegFit(
        ev(s, dir)
          .withColumn("xb", pmod(col("user_id"), lit(8L)).cast("double"))
          .withColumn("cnt", least(floor(abs(col("value"))), lit(8L))),
        "xb", "cnt", alpha = 1.0, iters = 12, lr = 0.1))),
    // Gaussian-copula (normal-scores) correlation matrix over the
    // lineitem numeric triple — the latent-normal rho vs q300's Spearman
    "q552_copula" -> ((s, dir) =>
      canon(graft.model.Assoc.copulaCorrelation(table(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount")))),
    // discrete-time Hawkes self-excitation per event_type, daily
    // buckets, beta = 0.5/day, 20x20 deterministic (mu, alpha) grid
    "q553_hawkes" -> ((s, dir) =>
      canon(graft.model.Behavior.hawkesFit(ev(s, dir), "event_type",
        "ts", beta = 0.5))),
    // generalized ESD (Rosner) top-3 outliers per event_type
    "q554_gesd" -> ((s, dir) =>
      canon(graft.model.Diagnostics.gesd(ev(s, dir), "event_type",
        "event_id", "value", maxK = 3, alphaSig = 0.05))),
    // hashing-trick feature vectors over documents, 64 signed buckets
    "q555_feature_hash" -> ((s, dir) =>
      canon(graft.text.TextOps.featureHash(table(s, dir, "documents"),
        "doc_id", "text", dim = 64))),
    // KMV set-overlap estimates between sources' token sets (theta-
    // sketch intersection) — corpus overlap at k=64 sketch cost
    "q557_kmv_overlap" -> ((s, dir) => {
      val toks = table(s, dir, "documents")
        .where(col("text").isNotNull)
        .select(col("source"),
          explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      val sk = graft.model.Fitters.kmvSketch(toks, Seq("source"), "tok",
        k = 64)
      canon(graft.model.Fitters.kmvOverlap(sk, "source", k = 64))
    }),
    // O'Brien-Fleming group-sequential A/B monitor: 4 scheduled looks
    // over event_id order, arm = user parity, per event_type
    "q558_group_seq" -> ((s, dir) =>
      canon(graft.model.Experiment.groupSequential(
        ev(s, dir).withColumn("t", pmod(col("user_id"), lit(2L)) === 0),
        "event_type", "event_id",
        armCol = "t", valCol = "value", looks = 4, shape = "obf"))),
    // beta-binomial empirical-Bayes shrinkage of per-user high-value
    // rates (s = events with value > 150, n = all events)
    "q559_beta_binom" -> ((s, dir) =>
      canon(graft.post.PostOps.betaBinomialShrink(
        ev(s, dir).groupBy(col("user_id").as("uid"))
          .agg(sum(when(col("value") > 150.0, 1L).otherwise(0L)).as("s"),
            count(lit(1)).as("n")),
        "uid", "s", "n", minTrials = 3L)
        .withColumnRenamed("key", "uid"))),
    // RANSAC consensus line per event_type: value ~ user bucket,
    // 16 md5-deterministic candidate pairs, tol 60
    "q560_ransac" -> ((s, dir) =>
      canon(graft.model.Assoc.ransacLine(
        ev(s, dir).where(col("value").isNotNull)
          .withColumn("xb", pmod(col("user_id"), lit(100L)).cast("double")),
        "event_type", "event_id", "xb", "value",
        candidates = 16, tol = 60.0))),
    // rank-2 ALS factorization of the (user-bucket x event_type) mean-
    // value matrix: 4 alternating rounds, ridge 0.1, closed-form 2x2
    "q556_als" -> ((s, dir) => {
      val r = ev(s, dir).where(col("value").isNotNull)
        .groupBy(pmod(col("user_id"), lit(50L)).cast("string").as("u"),
          col("event_type").as("i"))
        .agg((sum(fixedPointLong(col("value"), 4).cast("decimal(38,0)"))
          .cast("double") / 1e4 / count(lit(1))).as("y"))
      canon(graft.model.Factorize.als2(r, "u", "i", "y",
        iters = 4, lambda = 0.1))
    })
  )

  /** Round-half-away to 6dp (the GD weight freeze both engines apply). */
  private def r6(e: String): String =
    s"(CASE WHEN ($e) >= 0 THEN floor(($e)*1e6+0.5) " +
      s"ELSE -floor(-($e)*1e6+0.5) END) / 1000000.0"

  /** Pairwise Pearson from exact fixed-point moments (the
    * correlationMatrix arithmetic; inputs are 4dp longs `$a`, `$b`). */
  private def corrPair(src: String, a: String, b: String,
      la: String, lb: String): String =
    s"""SELECT '$la' AS col_x, '$lb' AS col_y, n,
       | round(CASE WHEN dx > 0 AND dy > 0 THEN num/sqrt(dx*dy) END, 4)
       |  + 0 AS corr
       |FROM (SELECT count(*)::BIGINT AS n,
       |  n::DOUBLE * sum($a::HUGEINT * $b::HUGEINT)::DOUBLE
       |   - sum($a)::DOUBLE * sum($b)::DOUBLE AS num,
       |  n::DOUBLE * sum($a::HUGEINT * $a::HUGEINT)::DOUBLE
       |   - sum($a)::DOUBLE * sum($a)::DOUBLE AS dx,
       |  n::DOUBLE * sum($b::HUGEINT * $b::HUGEINT)::DOUBLE
       |   - sum($b)::DOUBLE * sum($b)::DOUBLE AS dy
       | FROM $src)""".stripMargin.replace("\n", " ")

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
    },

    "q551_negbin_reg" -> {
      val fp9 = (e: String) => fp(e, "1e9")
      val mu = "exp(least(w.a + w.b*d.x, 30.0))"
      val sc = s"((d.y - $mu) / (1.0 + 1.0*$mu))"
      val rounds = (1 to 12).map { t =>
        val p = s"w${t - 1}"
        s"""g$t AS (SELECT
           |  sum(${fp9(sc)})::HUGEINT AS ga,
           |  sum(${fp9(s"$sc * d.x")})::HUGEINT AS gb,
           |  count(*)::BIGINT AS n
           | FROM d, $p w),
           |w$t AS MATERIALIZED (SELECT
           |  ${r6(s"w.a + 0.1 * (g.ga::DOUBLE / g.n / 1e9)")} AS a,
           |  ${r6(s"w.b + 0.1 * (g.gb::DOUBLE / g.n / 1e9)")} AS b
           | FROM $p w, g$t g)""".stripMargin
      }.mkString(", ")
      s"""WITH d AS (SELECT (user_id % 8)::DOUBLE AS x,
         |  least(floor(abs(value)), 8)::DOUBLE AS y
         | FROM events WHERE value IS NOT NULL),
         |w0 AS (SELECT 0.0::DOUBLE AS a, 0.0::DOUBLE AS b),
         |$rounds
         |SELECT (SELECT count(*) FROM d)::BIGINT AS n,
         | round(w.a, 4) + 0 AS a, round(w.b, 4) + 0 AS b,
         | round(1.0, 4) + 0 AS alpha,
         | round((SELECT sum(${fp9("exp(least(w.a + w.b*d.x, 30.0))")})
         |  ::HUGEINT::DOUBLE / 1e9 / (SELECT count(*) FROM d) FROM d), 4)
         |  + 0 AS mean_mu
         |FROM w12 w""".stripMargin.replace("\n", " ")
    },

    "q552_copula" -> {
      // midranks off rank()/tie-count windows == the engine's histogram
      // 2·r̄ arithmetic; u = r̄/(n+1) → Acklam probit → 4dp freeze →
      // exact-moment Pearson (the correlationMatrix replay)
      def r2(c: String) =
        s"(2*rank() OVER (ORDER BY $c) + count(*) OVER (PARTITION BY $c)" +
          s" - 1)::DOUBLE AS r$c"
      def z(c: String) = fp(
        StatQueries.probitSql(s"((r$c/2.0) / (nn + 1.0))"), "10000.0") +
        s" AS z$c"
      s"""WITH src AS (SELECT
         |  ${fp("l_quantity", "10000.0")} AS q_,
         |  ${fp("l_extendedprice", "10000.0")} AS e_,
         |  ${fp("l_discount", "10000.0")} AS d_
         | FROM lineitem WHERE l_quantity IS NOT NULL
         |  AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
         |nn0 AS (SELECT count(*)::DOUBLE AS nn FROM src),
         |rk AS (SELECT ${r2("q_")}, ${r2("e_")}, ${r2("d_")} FROM src),
         |zz AS (SELECT ${z("q_")}, ${z("e_")}, ${z("d_")} FROM rk, nn0)
         |${corrPair("zz", "zq_", "ze_", "l_quantity", "l_extendedprice")}
         |UNION ALL
         |${corrPair("zz", "zq_", "zd_", "l_quantity", "l_discount")}
         |UNION ALL
         |${corrPair("zz", "ze_", "zd_", "l_extendedprice", "l_discount")}"""
        .stripMargin.replace("\n", " ")
    },

    "q553_hawkes" -> {
      val fp9 = (e: String) => fp(e, "1e9")
      s"""WITH bd AS (SELECT event_type AS key,
         |  (epoch_ns(ts) // 86400000000000)::BIGINT AS d, count(*)::BIGINT AS c
         | FROM events GROUP BY 1, 2),
         |sp AS (SELECT key, min(d) AS d0, max(d) AS d1,
         |  sum(c)::BIGINT AS tot FROM bd GROUP BY 1),
         |cal AS (SELECT sp.key, sp.d0, sp.tot,
         |  (sp.d1 - sp.d0 + 1)::BIGINT AS nd,
         |  unnest(generate_series(sp.d0, sp.d1)) AS d FROM sp),
         |dense AS (SELECT cal.key, cal.d0, cal.tot, cal.nd, cal.d,
         |  coalesce(bd.c, 0)::BIGINT AS c, (cal.d - cal.d0)::DOUBLE AS tt
         | FROM cal LEFT JOIN bd ON bd.key = cal.key AND bd.d = cal.d),
         |ex AS (SELECT *, exp(-0.5*tt) * coalesce(
         |  sum(c::DOUBLE * exp(0.5*tt)) OVER (PARTITION BY key ORDER BY d
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS e
         | FROM dense),
         |grid AS (SELECT t1.m, t2.a::DOUBLE * 0.05 AS alpha
         | FROM range(1, 21) t1(m) CROSS JOIN range(0, 20) t2(a)),
         |sc AS (SELECT ex.key, g.m, g.alpha,
         |  max(ex.nd) AS n_days, max(ex.tot) AS n_events,
         |  max(g.m::DOUBLE / 10.0 * (ex.tot::DOUBLE / ex.nd::DOUBLE))
         |   AS mu,
         |  sum(${fp9("ex.c::DOUBLE * ln(g.m::DOUBLE / 10.0 * " +
              "(ex.tot::DOUBLE / ex.nd::DOUBLE) + g.alpha * ex.e) - " +
              "(g.m::DOUBLE / 10.0 * (ex.tot::DOUBLE / ex.nd::DOUBLE) " +
              "+ g.alpha * ex.e)")})::HUGEINT AS ll9
         | FROM ex CROSS JOIN grid g GROUP BY 1, 2, 3),
         |best AS (SELECT *, row_number() OVER (PARTITION BY key
         |  ORDER BY ll9 DESC, m ASC, alpha ASC) AS rk FROM sc)
         |SELECT key, n_days, n_events, round(mu, 4) + 0 AS mu,
         | round(alpha, 4) + 0 AS alpha,
         | round(ll9::DOUBLE / 1e9, 4) + 0 AS ll
         |FROM best WHERE rk = 1""".stripMargin.replace("\n", " ")
    },

    "q554_gesd" -> {
      val alphaSig = 0.05
      def lam(n: String) = {
        val zp = StatQueries.probitSql(s"(1.0 - $alphaSig / (2.0 * $n))")
        s"(($n - 1.0) * $zp / sqrt(($n - 2.0 + $zp * $zp) * $n))"
      }
      // round r: moments over the remainder, arg-max |n·f − S| pick
      def round(r: Int, src: String) =
        s"""s$r AS (SELECT key, count(*)::BIGINT AS n,
           |  sum(f)::HUGEINT AS s, sum(f::HUGEINT * f::HUGEINT) AS q
           | FROM $src GROUP BY 1),
           |c$r AS (SELECT b.key, b.o, b.v, s.n, s.s, s.q,
           |  row_number() OVER (PARTITION BY b.key
           |   ORDER BY abs(s.n::HUGEINT * b.f::HUGEINT - s.s) DESC,
           |    b.o ASC) AS rn
           | FROM $src b JOIN s$r s USING (key)),
           |r$r AS (SELECT key, $r AS round, n AS n_remaining,
           |  o AS outlier_ord, v AS value, abs(v - mu) / sd AS r_stat,
           |  ${lam("n::DOUBLE")} AS lambda
           | FROM (SELECT *, s::DOUBLE / n::DOUBLE / 1e4 AS mu,
           |    sqrt((q::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
           |     / (n::DOUBLE - 1.0)) / 1e4 AS sd
           |   FROM c$r WHERE rn = 1 AND n >= 3)
           | WHERE sd > 0)""".stripMargin
      s"""WITH b1 AS (SELECT event_type AS key, event_id AS o,
         |  value AS v, ${fp("value", "10000.0")} AS f
         | FROM events WHERE value IS NOT NULL),
         |${round(1, "b1")},
         |b2 AS (SELECT b1.* FROM b1 WHERE NOT EXISTS
         |  (SELECT 1 FROM r1 WHERE r1.key = b1.key
         |    AND r1.outlier_ord = b1.o)),
         |${round(2, "b2")},
         |b3 AS (SELECT b2.* FROM b2 WHERE NOT EXISTS
         |  (SELECT 1 FROM r2 WHERE r2.key = b2.key
         |    AND r2.outlier_ord = b2.o)),
         |${round(3, "b3")},
         |allr AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
         |  UNION ALL SELECT * FROM r3)
         |SELECT key, round, n_remaining, outlier_ord,
         | round(value, 4) + 0 AS value, round(r_stat, 4) + 0 AS r_stat,
         | round(lambda, 4) + 0 AS lambda,
         | max(CASE WHEN r_stat > lambda THEN 1 ELSE 0 END)
         |  OVER (PARTITION BY key ORDER BY round DESC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
         |  AS significant
         |FROM allr""".stripMargin.replace("\n", " ")
    },

    "q555_feature_hash" ->
      s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS tok
         | FROM documents WHERE text IS NOT NULL)
         |SELECT doc_id,
         | ('0x'||substr(md5(tok),1,14))::BIGINT % 64 AS bucket,
         | sum(CASE WHEN ('0x'||substr(md5('s:'||tok),1,14))::BIGINT % 2
         |  = 0 THEN 1 ELSE -1 END)::BIGINT AS w
         |FROM t GROUP BY 1, 2 HAVING w != 0"""
        .stripMargin.replace("\n", " "),

    "q557_kmv_overlap" ->
      s"""WITH t AS (SELECT source, unnest($toksSql) AS tok
         | FROM documents WHERE text IS NOT NULL),
         |hh AS (SELECT DISTINCT source,
         |  ('0x'||substr(md5(tok),1,14))::BIGINT AS h FROM t),
         |sk AS (SELECT source, h FROM (SELECT source, h,
         |  row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |  FROM hh) WHERE rn <= 64),
         |ks AS (SELECT DISTINCT source FROM sk),
         |pr AS (SELECT a.source AS key_a, b.source AS key_b
         | FROM ks a JOIN ks b ON a.source < b.source),
         |uni AS (SELECT DISTINCT pr.key_a, pr.key_b, s.h
         | FROM pr JOIN sk s ON s.source = pr.key_a
         | UNION
         | SELECT DISTINCT pr.key_a, pr.key_b, s.h
         | FROM pr JOIN sk s ON s.source = pr.key_b),
         |topk AS (SELECT key_a, key_b, h,
         |  row_number() OVER (PARTITION BY key_a, key_b ORDER BY h)
         |   AS rank
         | FROM uni QUALIFY rank <= 64),
         |fl AS (SELECT tk.key_a, tk.key_b, tk.h, tk.rank,
         |  (sa.h IS NOT NULL) AS ina, (sb.h IS NOT NULL) AS inb
         | FROM topk tk
         | LEFT JOIN sk sa ON sa.source = tk.key_a AND sa.h = tk.h
         | LEFT JOIN sk sb ON sb.source = tk.key_b AND sb.h = tk.h),
         |ag AS (SELECT key_a, key_b, count(*)::BIGINT AS union_n,
         |  max(CASE WHEN rank = 64 THEN h END) AS hk,
         |  sum(CASE WHEN ina AND inb THEN 1 ELSE 0  END)::BIGINT AS nboth
         | FROM fl GROUP BY 1, 2)
         |SELECT key_a, key_b, union_n,
         | round(CASE WHEN union_n < 64 THEN union_n::DOUBLE
         |  ELSE 63 / (hk / 72057594037927936.0) END, 4) + 0 AS est_union,
         | round(nboth::DOUBLE / union_n::DOUBLE, 4) + 0 AS est_jaccard,
         | round((nboth::DOUBLE / union_n::DOUBLE) *
         |  (CASE WHEN union_n < 64 THEN union_n::DOUBLE
         |   ELSE 63 / (hk / 72057594037927936.0) END), 4) + 0
         |  AS est_inter
         |FROM ag""".stripMargin.replace("\n", " "),

    "q558_group_seq" -> {
      val mu = (s: String, n: String) => s"($s::DOUBLE / $n::DOUBLE / 1e4)"
      val va = (s: String, q: String, n: String) =>
        s"(($q::DOUBLE - $s::DOUBLE * $s::DOUBLE / $n::DOUBLE) " +
          s"/ ($n::DOUBLE - 1.0) / 1e8)"
      s"""WITH b AS (SELECT event_type AS key, event_id AS o,
         |  user_id % 2 = 0 AS t, ${fp("value", "10000.0")} AS v
         | FROM events WHERE value IS NOT NULL),
         |rg AS (SELECT key, min(o) AS o0, max(o) AS o1 FROM b GROUP BY 1),
         |lk AS (SELECT b.key, b.t, b.v,
         |  least(4, ((b.o - rg.o0) * 4) // (rg.o1 - rg.o0 + 1) + 1) AS look
         | FROM b JOIN rg USING (key)),
         |pl AS (SELECT key, look, t, count(*)::BIGINT AS n,
         |  sum(v)::HUGEINT AS s, sum(v::HUGEINT * v::HUGEINT) AS q
         | FROM lk GROUP BY 1, 2, 3),
         |cu AS (SELECT key, look, t,
         |  sum(n) OVER pw AS cn, sum(s) OVER pw AS cs,
         |  sum(q) OVER pw AS cq
         | FROM pl WINDOW pw AS (PARTITION BY key, t ORDER BY look
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |j AS (SELECT a.key, a.look, a.cn AS na, a.cs AS sa, a.cq AS qa,
         |  c.cn AS nb, c.cs AS sb, c.cq AS qb
         | FROM (SELECT * FROM cu WHERE t) a
         | JOIN (SELECT * FROM cu WHERE NOT t) c
         |  ON a.key = c.key AND a.look = c.look
         | WHERE a.cn >= 2 AND c.cn >= 2),
         |zz AS (SELECT key, look, na::BIGINT AS n_a, nb::BIGINT AS n_b,
         |  (${mu("sa", "na")} - ${mu("sb", "nb")})
         |   / sqrt(${va("sa", "qa", "na")} / na::DOUBLE
         |    + ${va("sb", "qb", "nb")} / nb::DOUBLE) AS z,
         |  2.024 * sqrt(4.0 / look::DOUBLE) AS bound
         | FROM j)
         |SELECT key, look, n_a, n_b, round(z, 4) + 0 AS z,
         | round(bound, 4) + 0 AS bound, abs(z) > bound AS crossed,
         | max(CASE WHEN abs(z) > bound THEN 1 ELSE 0 END)
         |  OVER (PARTITION BY key ORDER BY look
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
         |  AS decided
         |FROM zz""".stripMargin.replace("\n", " ")
    },

    "q559_beta_binom" ->
      s"""WITH g AS (SELECT user_id AS uid,
         |  sum(CASE WHEN value > 150.0 THEN 1 ELSE 0 END)::BIGINT AS s,
         |  count(*)::BIGINT AS n
         | FROM events GROUP BY 1),
         |gg AS (SELECT uid, s, n,
         |  ${fp("s::DOUBLE / n::DOUBLE", "1e6")} AS p6
         | FROM g WHERE n >= 3 AND s >= 0 AND s <= n),
         |pr AS (SELECT count(*)::BIGINT AS k,
         |  sum(p6)::HUGEINT AS sp,
         |  sum(p6::HUGEINT * p6::HUGEINT) AS qp FROM gg),
         |mv AS (SELECT k, sp::DOUBLE / k::DOUBLE / 1e6 AS m,
         |  (qp::DOUBLE - sp::DOUBLE * sp::DOUBLE / k::DOUBLE)
         |   / (k::DOUBLE - 1.0) / 1e12 AS v FROM pr),
         |ab AS (SELECT CASE WHEN k >= 2 AND v > 0 AND v < m * (1.0 - m)
         |   THEN m * (m * (1.0 - m) / v - 1.0) END AS alpha,
         |  CASE WHEN k >= 2 AND v > 0 AND v < m * (1.0 - m)
         |   THEN (1.0 - m) * (m * (1.0 - m) / v - 1.0) END AS beta
         | FROM mv)
         |SELECT uid, n, s,
         | round(p6::DOUBLE / 1e6, 4) + 0 AS raw_rate,
         | round(alpha, 4) + 0 AS alpha, round(beta, 4) + 0 AS beta,
         | round(CASE WHEN alpha IS NOT NULL
         |  THEN (s::DOUBLE + alpha) / (n::DOUBLE + alpha + beta)
         |  ELSE p6::DOUBLE / 1e6 END, 4) + 0 AS shrunk_rate
         |FROM gg, ab""".stripMargin.replace("\n", " "),

    "q560_ransac" -> {
      val tol = "60.0"
      s"""WITH b AS (SELECT event_type AS key, event_id AS id,
         |  ${fp("(user_id % 100)::DOUBLE", "10000.0")}::DOUBLE / 1e4 AS x,
         |  ${fp("value", "10000.0")}::DOUBLE / 1e4 AS y
         | FROM events WHERE value IS NOT NULL),
         |rk AS (SELECT key, id, x, y, row_number() OVER (
         |  PARTITION BY key ORDER BY
         |   ('0x'||substr(md5('rs:'||key||':'||id::VARCHAR),1,14))
         |    ::BIGINT ASC, id ASC) AS r
         | FROM b QUALIFY r <= 32),
         |cd AS (SELECT key, ((r + 1) // 2)::INT AS j,
         |  min(CASE WHEN r % 2 = 1 THEN x END) AS x1,
         |  min(CASE WHEN r % 2 = 1 THEN y END) AS y1,
         |  min(CASE WHEN r % 2 = 0 THEN x END) AS x2,
         |  min(CASE WHEN r % 2 = 0 THEN y END) AS y2
         | FROM rk GROUP BY 1, 2),
         |cf AS (SELECT key, j,
         |  ${r6("(y2 - y1) / (x2 - x1)")} AS bb
         | FROM cd WHERE x2 IS NOT NULL AND x1 != x2),
         |cf2 AS (SELECT cf.key, cf.j, cf.bb,
         |  ${r6("y1 - bb * x1")} AS aa
         | FROM cf JOIN cd ON cd.key = cf.key AND cd.j = cf.j),
         |sc AS (SELECT b.key, c.j, c.aa, c.bb,
         |  sum(CASE WHEN abs(b.y - (c.aa + c.bb * b.x)) <= $tol
         |   THEN 1 ELSE 0 END)::BIGINT AS n_inliers,
         |  count(*)::BIGINT AS n
         | FROM b JOIN cf2 c USING (key) GROUP BY 1, 2, 3, 4),
         |bst AS (SELECT * FROM (SELECT *, row_number() OVER (
         |  PARTITION BY key ORDER BY n_inliers DESC, j ASC) AS rk2
         |  FROM sc) WHERE rk2 = 1),
         |rf AS (SELECT b.key, count(*)::BIGINT AS ni,
         |  sum(${fp("b.x", "10000.0")})::HUGEINT AS sx,
         |  sum(${fp("b.y", "10000.0")})::HUGEINT AS sy,
         |  sum(${fp("b.x", "10000.0")}::HUGEINT *
         |      ${fp("b.y", "10000.0")}::HUGEINT) AS sxy,
         |  sum(${fp("b.x", "10000.0")}::HUGEINT *
         |      ${fp("b.x", "10000.0")}::HUGEINT) AS sxx
         | FROM b JOIN bst USING (key)
         | WHERE abs(b.y - (bst.aa + bst.bb * b.x)) <= $tol
         | GROUP BY 1),
         |fin AS (SELECT bst.key, bst.n, bst.j AS cand, bst.n_inliers,
         |  CASE WHEN (sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE
         |    / ni::DOUBLE) / 1e8 > 0
         |   THEN ${r6("((sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE " +
              "/ ni::DOUBLE) / 1e8) / ((sxx::DOUBLE - sx::DOUBLE " +
              "* sx::DOUBLE / ni::DOUBLE) / 1e8)")}
         |   ELSE bst.bb END AS slope,
         |  sy::DOUBLE / ni::DOUBLE / 1e4 AS my,
         |  sx::DOUBLE / ni::DOUBLE / 1e4 AS mx
         | FROM bst JOIN rf USING (key))
         |SELECT key, n, cand, n_inliers, round(slope, 4) + 0 AS slope,
         | round(${r6("my - slope * mx")}, 4) + 0 AS intercept
         |FROM fin""".stripMargin.replace("\n", " ")
    },

    "q556_als" -> {
      val fp8 = (e: String) => fp(e, "1e8")
      val lam = "0.1"
      // solve side A from side B's factors: 8dp normal-equation sums,
      // closed-form 2x2, 6dp round — exactly the engine's float program
      def solve(t: Int, aKey: String, bKey: String, bTab: String,
          b1c: String, b2c: String, out: String) = {
        val a11 = s"(s11::DOUBLE/1e8 + $lam)"
        val a12 = "(s12::DOUBLE/1e8)"
        val a22 = s"(s22::DOUBLE/1e8 + $lam)"
        val bb1 = "(b1::DOUBLE/1e8)"
        val bb2 = "(b2::DOUBLE/1e8)"
        val det = s"($a11 * $a22 - $a12 * $a12)"
        s"""$out AS (SELECT $aKey,
           |  ${r6(s"($a22 * $bb1 - $a12 * $bb2) / $det")} AS p1,
           |  ${r6(s"($a11 * $bb2 - $a12 * $bb1) / $det")} AS p2
           | FROM (SELECT r.$aKey,
           |   sum(${fp8(s"q.$b1c * q.$b1c")})::HUGEINT AS s11,
           |   sum(${fp8(s"q.$b1c * q.$b2c")})::HUGEINT AS s12,
           |   sum(${fp8(s"q.$b2c * q.$b2c")})::HUGEINT AS s22,
           |   sum(${fp8(s"r.y * q.$b1c")})::HUGEINT AS b1,
           |   sum(${fp8(s"r.y * q.$b2c")})::HUGEINT AS b2
           |  FROM r JOIN $bTab q USING ($bKey) GROUP BY 1))"""
          .stripMargin
      }
      def h01(pre: String) =
        s"(('0x'||substr(md5('$pre'||i),1,14))::BIGINT::DOUBLE + 1.0)" +
          "/72057594037927936.0"
      val rounds = (1 to 4).map { t =>
        solve(t, "u", "i", s"q${t - 1}", "q1", "q2", s"ut$t") + ",\n" +
          s"u$t AS (SELECT u, p1, p2 FROM ut$t),\n" +
          solve(t, "i", "u",
            s"(SELECT u, p1 AS q1, p2 AS q2 FROM u$t)", "q1", "q2",
            s"qt$t") + ",\n" +
          s"q$t AS (SELECT i, p1 AS q1, p2 AS q2 FROM qt$t)"
      }.mkString(",\n")
      s"""WITH r AS (SELECT (user_id % 50)::VARCHAR AS u, event_type AS i,
         |  sum(${fp("value", "10000.0")})::HUGEINT::DOUBLE / 1e4
         |   / count(*) AS y
         | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |q0 AS (SELECT i, ${r6(h01("als1:"))} AS q1,
         |  ${r6(h01("als2:"))} AS q2 FROM (SELECT DISTINCT i FROM r)),
         |$rounds,
         |pred AS (SELECT r.y - (u.p1 * q.q1 + u.p2 * q.q2) AS e
         | FROM r JOIN u4 u USING (u) JOIN q4 q USING (i)),
         |rmse AS (SELECT 'rmse' AS side, 'all' AS id,
         |  sqrt(sum(${fp8("e * e")})::HUGEINT::DOUBLE / 1e8 / count(*))
         |   AS f1, 0.0 AS f2 FROM pred)
         |SELECT 'user' AS side, u AS id, round(p1, 4) + 0 AS f1,
         | round(p2, 4) + 0 AS f2 FROM u4
         |UNION ALL
         |SELECT 'item' AS side, i AS id, round(q1, 4) + 0 AS f1,
         | round(q2, 4) + 0 AS f2 FROM q4
         |UNION ALL
         |SELECT side, id, round(f1, 4) + 0 AS f1, round(f2, 4) + 0 AS f2
         |FROM rmse""".stripMargin.replace("\n", " ")
    }
  )
}
