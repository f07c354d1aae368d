package graft.queries

import graft.core._
import graft.drift.Drift
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries + oracles for the concept-drift family (§2.9). Error stream =
  * outlier indicator from the z-score pipeline, per event_type over
  * event_id order. EWMA drift is a per-key recurrence → rows-only. */
object DriftQueries {

  private def errStream(s: SparkSession, dir: String): DataFrame =
    StatQueries.zscored(s, dir)
      .withColumn("err", (col("tag") === "O").cast("int"))
      .select("event_type", "event_id", "err", "value")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q64_drift_ddm" -> ((s, dir) =>
      canon(Drift.ddm(errStream(s, dir), Seq("event_type"), "event_id", "err")
        .select("event_type", "event_id", "err", "i", "p", "s", "level"))),
    "q65_drift_fhddm" -> ((s, dir) =>
      canon(Drift.fhddm(errStream(s, dir), Seq("event_type"), "event_id", "err",
        window = 100, delta = 0.000001)
        .select("event_type", "event_id", "err", "acc", "maxAcc", "drift"))),
    "q66_drift_ewma" -> ((s, dir) =>
      canon(Drift.ewmaDrift(errStream(s, dir), Seq("event_type"), "event_id",
        "value", lambda = 0.1, L = 3.0).toDF())),
    "q68_drift_eddm" -> ((s, dir) =>
      canon(Drift.eddm(errStream(s, dir), Seq("event_type"), "event_id", "err")
        .select("event_type", "event_id", "nErr", "d", "p2s", "maxP2s", "level"))),
    "q69_seasonal_zscore" -> ((s, dir) => {
      val data = graft.core.Seasonal.withCycle(
        table(s, dir, "events"), "ts", "hourOfDay")
      val keys = Seq("event_type", "cycleType", "cycleIndex")
      val stats = graft.model.Fitters.stats(data, keys, Seq("value"))
      canon(graft.score.Scorers.zscore(data, stats,
        graft.score.Scorers.Cfg(keys, Seq("value"), threshold = 2.5))
        .select("event_id", "event_type", "cycleIndex", "value", "score", "tag"))
    }),
    "q67_drift_consensus" -> ((s, dir) => {
      val ddm = Drift.ddm(errStream(s, dir), Seq("event_type"), "event_id", "err")
        .select(col("event_type"), col("event_id"), (col("level") === "drift").as("d1"))
      val fh = Drift.fhddm(errStream(s, dir), Seq("event_type"), "event_id", "err",
        window = 100, delta = 0.000001)
        .select(col("event_type"), col("event_id"), coalesce(col("drift"), lit(false)).as("d2"))
      Drift.consensus(ddm.join(fh, Seq("event_type", "event_id")), Seq("d1", "d2"), 2)
    }),
  )

  private val errCte =
    """zstats AS (SELECT event_type, avg(value) AS mean, stddev_samp(value) AS std
      | FROM events GROUP BY event_type),
      |es AS (SELECT e.event_type, e.event_id, e.value,
      |  CASE WHEN abs(e.value - s.mean)/s.std > 2.0 THEN 1 ELSE 0 END AS err
      | FROM events e JOIN zstats s USING (event_type))"""
      .stripMargin.replace("\n", " ")

  private val ddmCte =
    s"""$errCte,
       |d AS (SELECT event_type, event_id, err,
       |  count(err) OVER cum AS i, avg(err) OVER cum AS p,
       |  sqrt(avg(err) OVER cum * (1.0 - avg(err) OVER cum) / count(err) OVER cum) AS s
       | FROM es
       | WINDOW cum AS (PARTITION BY event_type ORDER BY event_id
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |dd AS (SELECT *,
       |  (min({'ps': p + s, 's': s}) OVER cum).ps AS minPS,
       |  (min({'ps': p + s, 's': s}) OVER cum).s AS sAtMin
       | FROM d
       | WINDOW cum AS (PARTITION BY event_type ORDER BY event_id
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"""
      .stripMargin.replace("\n", " ")

  val oracleSql: Map[String, String] = Map(
    "q68_drift_eddm" ->
      s"""WITH $errCte,
         |ix AS (SELECT *, row_number() OVER w AS idx FROM es
         | WINDOW w AS (PARTITION BY event_type ORDER BY event_id)),
         |er AS (SELECT event_type, event_id,
         |  (idx - lag(idx) OVER w)::DOUBLE AS d
         | FROM ix WHERE err = 1
         | WINDOW w AS (PARTITION BY event_type ORDER BY event_id)),
         |st AS (SELECT event_type, event_id, d,
         |  count(d) OVER cum AS nErr,
         |  avg(d) OVER cum + 2.0 * stddev_samp(d) OVER cum AS p2s
         | FROM er WHERE d IS NOT NULL
         | WINDOW cum AS (PARTITION BY event_type ORDER BY event_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |mx AS (SELECT *, max(p2s) OVER (PARTITION BY event_type ORDER BY event_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS maxP2s FROM st)
         |SELECT event_type, event_id, nErr, round(d,4) AS d, round(p2s,4) AS p2s,
         | round(maxP2s,4) AS maxP2s,
         | CASE WHEN nErr < 30 OR maxP2s IS NULL THEN 'stable'
         |  WHEN p2s / maxP2s < 0.9 THEN 'drift'
         |  WHEN p2s / maxP2s < 0.95 THEN 'warn'
         |  ELSE 'stable' END AS level
         |FROM mx""".stripMargin.replace("\n", " "),
    "q69_seasonal_zscore" ->
      """WITH c AS (SELECT *,
        |  ((epoch_ns(ts) // 1000000000) // 3600) % 24 AS cycleIndex
        | FROM events),
        |st AS (SELECT event_type, cycleIndex, avg(value) AS mean,
        |  stddev_samp(value) AS std
        | FROM c GROUP BY 1, 2)
        |SELECT e.event_id, e.event_type, e.cycleIndex, round(e.value,4) AS value,
        | round(abs(e.value - s.mean)/s.std, 4) AS score,
        | CASE WHEN abs(e.value - s.mean)/s.std > 2.5 THEN 'O' ELSE 'N' END AS tag
        |FROM c e JOIN st s USING (event_type, cycleIndex)"""
        .stripMargin.replace("\n", " "),
    "q64_drift_ddm" ->
      s"""WITH $ddmCte
         |SELECT event_type, event_id, err, i, round(p,4) AS p, round(s,4) AS s,
         | CASE WHEN i < 30 THEN 'stable'
         |  WHEN p + s > (minPS - sAtMin) + 3*sAtMin THEN 'drift'
         |  WHEN p + s > (minPS - sAtMin) + 2*sAtMin THEN 'warn'
         |  ELSE 'stable' END AS level
         |FROM dd""".stripMargin.replace("\n", " "),
    "q65_drift_fhddm" ->
      s"""WITH $errCte,
         |f AS (SELECT event_type, event_id, err,
         |  CASE WHEN count(err) OVER fr = 100 THEN 1.0 - avg(err) OVER fr END AS acc
         | FROM es
         | WINDOW fr AS (PARTITION BY event_type ORDER BY event_id
         |   ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)),
         |g AS (SELECT *, max(acc) OVER (PARTITION BY event_type ORDER BY event_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS maxAcc FROM f)
         |SELECT event_type, event_id, err, round(acc,4) AS acc, round(maxAcc,4) AS maxAcc,
         | acc IS NOT NULL AND maxAcc - acc > sqrt(ln(1.0/0.000001)/200.0) AS drift
         |FROM g""".stripMargin.replace("\n", " "),
    "q67_drift_consensus" ->
      s"""WITH $ddmCte,
         |d1 AS (SELECT event_type, event_id,
         |  CASE WHEN i >= 30 AND p + s > (minPS - sAtMin) + 3*sAtMin
         |   THEN TRUE ELSE FALSE END AS d1 FROM dd),
         |f AS (SELECT event_type, event_id,
         |  CASE WHEN count(err) OVER fr = 100 THEN 1.0 - avg(err) OVER fr END AS acc
         | FROM es
         | WINDOW fr AS (PARTITION BY event_type ORDER BY event_id
         |   ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)),
         |g AS (SELECT *, max(acc) OVER (PARTITION BY event_type ORDER BY event_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS maxAcc FROM f),
         |d2 AS (SELECT event_type, event_id,
         |  coalesce(acc IS NOT NULL AND maxAcc - acc > sqrt(ln(1.0/0.000001)/200.0), FALSE) AS d2
         | FROM g)
         |SELECT d1.event_type, d1.event_id, d1.d1, d2.d2,
         | (d1.d1::INT + d2.d2::INT) AS driftVotes,
         | (d1.d1::INT + d2.d2::INT) >= 2 AS driftConsensus
         |FROM d1 JOIN d2 USING (event_type, event_id)"""
        .stripMargin.replace("\n", " "),
  )
}
