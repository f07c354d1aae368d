package graft.queries

import graft.core._
import graft.model.Spc
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries + DuckDB oracles for the statistical-process-control family
  * (model/Spc.scala): X̄/R subgroup chart, p/c attribute charts,
  * Western Electric run rules, Cp/Cpk capability. All over `events`
  * keyed by event_type; every limit derives from exact 4dp fixed-point
  * integer sums so the double finish replays bit-identically. */
object SpcQueries {

  private def ev(s: SparkSession, dir: String) = table(s, dir, "events")

  /** Calendar-day window from the epoch-nanos ts long. */
  private val day = expr("ts div 86400000000000")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Shewhart X̄/R chart: subgroups of 5 consecutive events per type
    "q311_xbar_r" -> ((s, dir) =>
      canon(Spc.xbarR(ev(s, dir), "event_type", "event_id", "value", n = 5))),
    // p-chart: daily defect (value > 150) proportion, varying limits
    "q312_p_chart" -> ((s, dir) =>
      canon(Spc.pChart(ev(s, dir), "event_type", day,
        col("value") > 150.0))),
    // c-chart: daily defect counts vs c̄ ± 3√c̄
    "q313_c_chart" -> ((s, dir) =>
      canon(Spc.cChart(ev(s, dir), "event_type", day,
        col("value") > 150.0))),
    // Western Electric run rules over the standardized per-type series
    "q314_western_electric" -> ((s, dir) =>
      canon(Spc.westernElectric(ev(s, dir), "event_type", "event_id",
        "value"))),
    // capability vs fixed specs [0, 150]: Cp/Cpk (within, R̄/d2) and
    // Pp/Ppk (overall σ)
    "q315_capability" -> ((s, dir) =>
      canon(Spc.capability(ev(s, dir), "event_type", "event_id", "value",
        lsl = 0.0, usl = 150.0, n = 5))),
    // Western Electric STREAM twin (q100 device): per-entity (μ, σ, n)
    // fit batch-side, rules replayed by flatMapGroupsWithState with
    // O(1) bitmask state; same oracle as q314
    "q353_we_stream" -> ((s, dir) => {
      import s.implicits._
      val fpv = fixedPointLong(col("value").cast("double"), 4)
      val model = ev(s, dir).where(col("value").isNotNull)
        .groupBy(col("event_type").cast("string").as("e"))
        .agg(count(lit(1)).as("n"), sum(fpv).as("s"),
          sum(fpv.cast("decimal(38,0)") * fpv.cast("decimal(38,0)"))
            .as("q"))
        .collect().map { r =>
          val n = r.getLong(1); val nD = n.toDouble
          val sS = r.getLong(2).toDouble
          val qS = r.getDecimal(3).doubleValue()
          r.getString(0) -> (sS / nD / 1e4,
            math.sqrt((qS - sS * sS / nD) / (nD - 1)) / 1e4, n)
        }.toMap
      val evd = ev(s, dir).where(col("value").isNotNull)
        .select(col("event_type").cast("string").as("entity"),
          col("event_id").cast("long").as("seq"),
          col("value").cast("double").as("value"))
        .as[graft.streaming.StreamScorers.ValueEvent]
      canon(graft.streaming.StreamScorers.westernElectricStream(evd, model)
        .toDF().select(col("entity").as("key"), col("seq"), col("value"),
          col("z"), col("r1"), col("r2"), col("r3"), col("r4")))
    }))

  /** Shared fixed-point CTE: events → (key, event_id, value, fp). */
  private val fx: String =
    """fx AS (SELECT event_type AS key, event_id, value,
      |  (CASE WHEN value >= 0 THEN floor(value*10000.0+0.5)
      |        ELSE -floor(-value*10000.0+0.5) END)::BIGINT AS fp
      |  FROM events WHERE value IS NOT NULL)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q353_we_stream" -> weOracle,
    "q314_western_electric" -> weOracle,
    "q311_xbar_r" ->
      s"""WITH $fx,
         |r AS (SELECT key, fp, row_number() OVER (PARTITION BY key
         |    ORDER BY event_id ASC, value ASC) AS rn FROM fx),
         |sg AS (SELECT key, (rn - 1) // 5 AS sg, count(*) AS n,
         |  sum(fp::HUGEINT) AS s, min(fp) AS lo, max(fp) AS hi
         |  FROM r GROUP BY 1, 2 HAVING count(*) = 5),
         |cl AS (SELECT key, count(*) AS k, sum(s) AS ts,
         |  sum((hi - lo)::HUGEINT) AS tr FROM sg GROUP BY 1),
         |j AS (SELECT sg.key, sg.sg,
         |  sg.s::DOUBLE / 5 / 1e4 AS xbar,
         |  (sg.hi - sg.lo)::DOUBLE / 1e4 AS r,
         |  cl.ts::DOUBLE / (cl.k * 5) / 1e4 AS xc,
         |  cl.tr::DOUBLE / cl.k / 1e4 AS rc
         |  FROM sg JOIN cl USING (key))
         |SELECT key, sg, round(xbar, 4) AS xbar, round(r, 4) AS r,
         | round(xc + 0.577*rc, 4) AS xbar_ucl,
         | round(xc - 0.577*rc, 4) AS xbar_lcl,
         | round(2.114*rc, 4) AS r_ucl,
         | (xbar > xc + 0.577*rc OR xbar < xc - 0.577*rc) AS out_x,
         | (r > 2.114*rc OR r < 0.0*rc) AS out_r
         |FROM j""".stripMargin.replace("\n", " "),
    "q312_p_chart" ->
      s"""WITH w AS (SELECT event_type AS key,
         |  epoch_ns(ts) // 86400000000000 AS win, count(*) AS n,
         |  sum(CASE WHEN value > 150.0 THEN 1 ELSE 0 END)::BIGINT AS d
         |  FROM events GROUP BY 1, 2),
         |pool AS (SELECT key, sum(d)::DOUBLE / sum(n)::DOUBLE AS pbar
         |  FROM w GROUP BY 1),
         |j AS (SELECT w.key, w.win, w.n, w.d,
         |  w.d::DOUBLE / w.n::DOUBLE AS phat, pool.pbar,
         |  sqrt(pool.pbar * (1.0 - pool.pbar) / w.n::DOUBLE) AS sig
         |  FROM w JOIN pool USING (key))
         |SELECT key, win, n, d, round(phat, 4) AS phat,
         | round(pbar + 3.0*sig, 4) AS ucl,
         | round(greatest(pbar - 3.0*sig, 0.0), 4) AS lcl,
         | (phat > pbar + 3.0*sig OR phat < greatest(pbar - 3.0*sig, 0.0))
         |   AS out
         |FROM j""".stripMargin.replace("\n", " "),
    "q313_c_chart" ->
      s"""WITH w AS (SELECT event_type AS key,
         |  epoch_ns(ts) // 86400000000000 AS win, count(*) AS c
         |  FROM events WHERE value > 150.0 GROUP BY 1, 2),
         |pool AS (SELECT key, sum(c)::DOUBLE / count(*) AS cbar
         |  FROM w GROUP BY 1)
         |SELECT key, win, c,
         | round(cbar + 3.0*sqrt(cbar), 4) AS ucl,
         | round(greatest(cbar - 3.0*sqrt(cbar), 0.0), 4) AS lcl,
         | (c::DOUBLE > cbar + 3.0*sqrt(cbar)
         |  OR c::DOUBLE < greatest(cbar - 3.0*sqrt(cbar), 0.0)) AS out
         |FROM w JOIN pool USING (key)""".stripMargin.replace("\n", " "),
    "q315_capability" ->
      s"""WITH $fx,
         |r AS (SELECT key, fp, row_number() OVER (PARTITION BY key
         |    ORDER BY event_id ASC, value ASC) AS rn FROM fx),
         |sg AS (SELECT key, (rn - 1) // 5 AS sg,
         |  count(*) AS n, min(fp) AS lo, max(fp) AS hi
         |  FROM r GROUP BY 1, 2 HAVING count(*) = 5),
         |w AS (SELECT key,
         |  (sum((hi - lo)::HUGEINT)::DOUBLE / count(*) / 1e4) / 2.326
         |    AS sigma_within FROM sg GROUP BY 1),
         |o AS (SELECT key, count(*)::HUGEINT AS n, sum(fp::HUGEINT) AS s,
         |  sum(fp::HUGEINT * fp::HUGEINT) AS q FROM fx GROUP BY 1),
         |ov AS (SELECT key, s::DOUBLE / n::DOUBLE / 1e4 AS mu,
         |  sqrt((q::DOUBLE - s::DOUBLE*s::DOUBLE/n::DOUBLE)
         |    / (n::DOUBLE - 1)) / 1e4 AS sigma_overall FROM o)
         |SELECT key, round(mu, 4) AS mu,
         | round(sigma_within, 4) AS sigma_within,
         | round(sigma_overall, 4) AS sigma_overall,
         | round(150.0 / (6.0 * sigma_within), 4) AS cp,
         | round(least(150.0 - mu, mu - 0.0) / (3.0 * sigma_within), 4)
         |   AS cpk,
         | round(150.0 / (6.0 * sigma_overall), 4) AS pp,
         | round(least(150.0 - mu, mu - 0.0) / (3.0 * sigma_overall), 4)
         |   AS ppk
         |FROM ov JOIN w USING (key)""".stripMargin.replace("\n", " "))

  /** Western Electric oracle — shared by q314 (batch windows) and q353
    * (stream twin, which replays the same trailing-window sums with
    * O(1) bitmask state). */
  private lazy val weOracle: String =
      s"""WITH $fx,
         |st AS (SELECT key, count(*)::HUGEINT AS n, sum(fp::HUGEINT) AS s,
         |  sum(fp::HUGEINT * fp::HUGEINT) AS q FROM fx GROUP BY 1),
         |mu AS (SELECT key, s::DOUBLE / n::DOUBLE / 1e4 AS mu,
         |  sqrt((q::DOUBLE - s::DOUBLE*s::DOUBLE/n::DOUBLE)
         |    / (n::DOUBLE - 1)) / 1e4 AS sd FROM st),
         |z AS (SELECT f.key, f.event_id AS seq, f.value,
         |  (f.value - mu.mu) / mu.sd AS z,
         |  CASE WHEN (f.value - mu.mu) / mu.sd > 0 THEN 1
         |       WHEN (f.value - mu.mu) / mu.sd < 0 THEN -1
         |       ELSE 0 END AS side
         |  FROM fx f JOIN mu USING (key)),
         |rr AS (SELECT key, seq, value, z, side,
         |  sum(CASE WHEN z > 2.0 THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY key ORDER BY seq ASC
         |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS hi2,
         |  sum(CASE WHEN z < -2.0 THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY key ORDER BY seq ASC
         |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS lo2,
         |  sum(CASE WHEN z > 1.0 THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY key ORDER BY seq ASC
         |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS hi1,
         |  sum(CASE WHEN z < -1.0 THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY key ORDER BY seq ASC
         |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS lo1,
         |  sum(side)
         |    OVER (PARTITION BY key ORDER BY seq ASC
         |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS s8
         |  FROM z)
         |SELECT key, seq, round(value, 4) AS value, round(z, 4) AS z,
         | (abs(z) > 3.0) AS r1,
         | ((z > 2.0 AND hi2 >= 2) OR (z < -2.0 AND lo2 >= 2)) AS r2,
         | ((z > 1.0 AND hi1 >= 4) OR (z < -1.0 AND lo1 >= 4)) AS r3,
         | (s8 = 8 OR s8 = -8) AS r4
         |FROM rr""".stripMargin.replace("\n", " ")
}
