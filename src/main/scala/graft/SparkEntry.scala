package graft

import graft.core._
import graft.model.Fitters
import graft.score.Scorers
import graft.score.Scorers.Cfg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry (+ DuckDB oracle SQL) per
  * implemented operator from SURVEY.md §2. All query outputs are passed
  * through `canon` (doubles rounded to 4dp) so the oracle hash compare is
  * insensitive to last-ulp float divergence between engines. */
object SparkEntry {

  private def ev(s: SparkSession, dir: String) = table(s, dir, "events")

  /** Flagship: full z-score anomaly pipeline (fit → broadcast-join score →
    * tag) on events, per event_type. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val data = ev(spark, "/root/testdata/sf0.001")
    val stats = Fitters.stats(data, Seq("event_type"), Seq("value"))
    Scorers.zscore(data, stats, Cfg(Seq("event_type"), Seq("value"), threshold = 2.0))
      .where(col("tag") === "O")
  }

  // ---- §2.3 fitters ----

  private def qStatsFit(s: SparkSession, dir: String): DataFrame =
    canon(Fitters.stats(ev(s, dir), Seq("event_type"), Seq("value")))

  private def qRobustFit(s: SparkSession, dir: String): DataFrame =
    canon(Fitters.robustStats(ev(s, dir), Seq("event_type"), Seq("value")))

  private def qQuantileFit(s: SparkSession, dir: String): DataFrame =
    canon(Fitters.quantiles(ev(s, dir), Seq("event_type"), Seq("value")))

  private def qHistogramFit(s: SparkSession, dir: String): DataFrame =
    canon(Fitters.histogram(ev(s, dir), Seq("event_type"), Seq(("value", 10.0))))

  // ---- §2.4 scorers ----

  private def zscored(s: SparkSession, dir: String): DataFrame = {
    val data = ev(s, dir)
    val stats = Fitters.stats(data, Seq("event_type"), Seq("value"))
    Scorers.zscore(data, stats, Cfg(Seq("event_type"), Seq("value"), threshold = 2.0))
  }

  private def qZscore(s: SparkSession, dir: String): DataFrame =
    canon(zscored(s, dir).select("event_id", "event_type", "value", "score", "tag"))

  private def qRobustZscore(s: SparkSession, dir: String): DataFrame = {
    val data = ev(s, dir)
    val model = Fitters.robustStats(data, Seq("event_type"), Seq("value"))
    canon(Scorers.robustZscore(data, model, Cfg(Seq("event_type"), Seq("value"), threshold = 3.0))
      .select("event_id", "event_type", "value", "score", "tag"))
  }

  private def qExtremeValue(s: SparkSession, dir: String): DataFrame = {
    val data = ev(s, dir)
    val stats = Fitters.stats(data, Seq("event_type"), Seq("value"))
    canon(Scorers.extremeValue(data, stats, Cfg(Seq("event_type"), Seq("value"), threshold = 0.9))
      .select("event_id", "event_type", "value", "score", "tag"))
  }

  private def qEstProb(s: SparkSession, dir: String): DataFrame = {
    val data = ev(s, dir)
    val hist = Fitters.histogram(data, Seq("event_type"), Seq(("value", 10.0)))
    canon(Scorers.estimatedProbability(
      data, hist, Cfg(Seq("event_type"), Seq("value"), threshold = 0.99),
      Seq(("value", 10.0)))
      .select("event_id", "event_type", "value", "score", "tag"))
  }

  private def qIqrScore(s: SparkSession, dir: String): DataFrame = {
    val data = ev(s, dir)
    val model = Fitters.quantiles(data, Seq("event_type"), Seq("value"))
    canon(Scorers.iqrScore(data, model, Cfg(Seq("event_type"), Seq("value"), threshold = 1.5))
      .select("event_id", "event_type", "value", "score", "tag"))
  }

  // ---- §2.2 filters / outputs ----

  private def qOutliersOnly(s: SparkSession, dir: String): DataFrame =
    canon(Scorers.outliersOnly(zscored(s, dir))
      .select("event_id", "event_type", "value", "score", "tag"))

  private def qCleanData(s: SparkSession, dir: String): DataFrame =
    Scorers.cleanData(zscored(s, dir))
      .select("event_id", "event_type", "value")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_stats_fit" -> (qStatsFit _),
    "q02_robust_fit" -> (qRobustFit _),
    "q03_quantile_fit" -> (qQuantileFit _),
    "q04_histogram_fit" -> (qHistogramFit _),
    "q05_zscore" -> (qZscore _),
    "q06_robust_zscore" -> (qRobustZscore _),
    "q07_extreme_value" -> (qExtremeValue _),
    "q08_est_prob" -> (qEstProb _),
    "q09_iqr_score" -> (qIqrScore _),
    "q10_outliers_only" -> (qOutliersOnly _),
    "q11_clean_data" -> (qCleanData _),
  )

  private val evStats =
    """stats AS (SELECT event_type, avg(value) AS mean, stddev_samp(value) AS std,
      | count(value) AS cnt, min(value) AS vmin, max(value) AS vmax
      | FROM events GROUP BY event_type)""".stripMargin.replace("\n", " ")

  private val evRobust =
    """med AS (SELECT event_type, percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
      | FROM events GROUP BY event_type),
      |rob AS (SELECT e.event_type, any_value(m.med) AS med,
      |  percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(e.value - m.med)) AS mad
      | FROM events e JOIN med m USING (event_type) GROUP BY e.event_type)"""
      .stripMargin.replace("\n", " ")

  private val evQuant =
    """quant AS (SELECT event_type,
      | percentile_cont(0.25) WITHIN GROUP (ORDER BY value) AS q1,
      | percentile_cont(0.75) WITHIN GROUP (ORDER BY value) AS q3
      | FROM events GROUP BY event_type)""".stripMargin.replace("\n", " ")

  private val evHist =
    """hist AS (SELECT event_type, CAST(floor(value/10.0) AS BIGINT)::VARCHAR AS bucket,
      | count(*) AS cnt
      | FROM events GROUP BY 1, 2),
      |histn AS (SELECT event_type, bucket, cnt,
      | cnt / (sum(cnt) OVER (PARTITION BY event_type))::DOUBLE AS freq FROM hist)"""
      .stripMargin.replace("\n", " ")

  def oracleSql: Map[String, String] = Map(
    "q01_stats_fit" ->
      s"""WITH $evStats
         |SELECT event_type, 'value' AS attr, round(mean,4) AS mean, round(std,4) AS std,
         | cnt, round(vmin,4) AS vmin, round(vmax,4) AS vmax FROM stats""".stripMargin.replace("\n", " "),
    "q02_robust_fit" ->
      s"""WITH $evRobust
         |SELECT event_type, 'value' AS attr, round(med,4) AS med, round(mad,4) AS mad
         | FROM rob""".stripMargin.replace("\n", " "),
    "q03_quantile_fit" ->
      s"""WITH $evQuant
         |SELECT event_type, 'value' AS attr, round(q1,4) AS q1, round(q3,4) AS q3,
         | round(q3-q1,4) AS iqr FROM quant""".stripMargin.replace("\n", " "),
    "q04_histogram_fit" ->
      s"""WITH $evHist
         |SELECT event_type, bucket, cnt, round(freq,4) AS freq FROM histn"""
        .stripMargin.replace("\n", " "),
    "q05_zscore" ->
      s"""WITH $evStats
         |SELECT e.event_id, e.event_type, round(e.value,4) AS value,
         | round(abs(e.value - s.mean)/s.std, 4) AS score,
         | CASE WHEN abs(e.value - s.mean)/s.std > 2.0 THEN 'O' ELSE 'N' END AS tag
         |FROM events e JOIN stats s USING (event_type)""".stripMargin.replace("\n", " "),
    "q06_robust_zscore" ->
      s"""WITH $evRobust
         |SELECT e.event_id, e.event_type, round(e.value,4) AS value,
         | round(abs(e.value - r.med)/r.mad, 4) AS score,
         | CASE WHEN abs(e.value - r.med)/r.mad > 3.0 THEN 'O' ELSE 'N' END AS tag
         |FROM events e JOIN rob r USING (event_type)""".stripMargin.replace("\n", " "),
    "q07_extreme_value" ->
      s"""WITH $evStats
         |SELECT e.event_id, e.event_type, round(e.value,4) AS value,
         | round(exp(-exp(-abs(e.value - s.mean)/s.std)), 4) AS score,
         | CASE WHEN exp(-exp(-abs(e.value - s.mean)/s.std)) > 0.9 THEN 'O' ELSE 'N' END AS tag
         |FROM events e JOIN stats s USING (event_type)""".stripMargin.replace("\n", " "),
    "q08_est_prob" ->
      s"""WITH $evHist
         |SELECT e.event_id, e.event_type, round(e.value,4) AS value,
         | round(1.0 - coalesce(h.freq, 0.0), 4) AS score,
         | CASE WHEN 1.0 - coalesce(h.freq, 0.0) > 0.99 THEN 'O' ELSE 'N' END AS tag
         |FROM events e LEFT JOIN histn h
         | ON e.event_type = h.event_type
         | AND CAST(floor(e.value/10.0) AS BIGINT)::VARCHAR = h.bucket"""
        .stripMargin.replace("\n", " "),
    "q09_iqr_score" ->
      s"""WITH $evQuant
         |SELECT e.event_id, e.event_type, round(e.value,4) AS value,
         | round(CASE WHEN e.value < q.q1 THEN (q.q1 - e.value)/(q.q3 - q.q1)
         |            WHEN e.value > q.q3 THEN (e.value - q.q3)/(q.q3 - q.q1)
         |            ELSE 0.0 END, 4) AS score,
         | CASE WHEN (CASE WHEN e.value < q.q1 THEN (q.q1 - e.value)/(q.q3 - q.q1)
         |            WHEN e.value > q.q3 THEN (e.value - q.q3)/(q.q3 - q.q1)
         |            ELSE 0.0 END) > 1.5 THEN 'O' ELSE 'N' END AS tag
         |FROM events e JOIN quant q USING (event_type)""".stripMargin.replace("\n", " "),
    "q10_outliers_only" ->
      s"""WITH $evStats
         |SELECT e.event_id, e.event_type, round(e.value,4) AS value,
         | round(abs(e.value - s.mean)/s.std, 4) AS score, 'O' AS tag
         |FROM events e JOIN stats s USING (event_type)
         |WHERE abs(e.value - s.mean)/s.std > 2.0""".stripMargin.replace("\n", " "),
    "q11_clean_data" ->
      s"""WITH $evStats
         |SELECT e.event_id, e.event_type, e.value
         |FROM events e JOIN stats s USING (event_type)
         |WHERE abs(e.value - s.mean)/s.std <= 2.0""".stripMargin.replace("\n", " "),
  )
}
