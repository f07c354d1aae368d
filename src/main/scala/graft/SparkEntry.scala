package graft

import graft.core._
import graft.model.Fitters
import graft.queries._
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

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    StatQueries.queries ++ SeqQueries.queries ++ MultiQueries.queries ++ TextQueries.queries ++ MmQueries.queries ++ DriftQueries.queries ++ SpcQueries.queries ++ DiagQueries.queries ++ R9Queries.queries ++ R10Queries.queries ++ R11Queries.queries ++ R12Queries.queries ++ R13Queries.queries

  def oracleSql: Map[String, String] =
    StatQueries.oracleSql ++ SeqQueries.oracleSql ++ MultiQueries.oracleSql ++ TextQueries.oracleSql ++ MmQueries.oracleSql ++ DriftQueries.oracleSql ++ SpcQueries.oracleSql ++ DiagQueries.oracleSql ++ R9Queries.oracleSql ++ R10Queries.oracleSql ++ R11Queries.oracleSql ++ R12Queries.oracleSql ++ R13Queries.oracleSql
}
