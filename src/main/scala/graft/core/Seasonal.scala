package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seasonal cycle keying (SURVEY.md §1 composite-key row): the reference
  * extends every model key with (cycleType, cycleIndex) derived from the
  * record timestamp (StatsBasedOutlierPredictor.scala:209-246; cycle types
  * in resource/and.conf:8, ecomm.conf:8), so models are fitted and applied
  * per seasonal regime (e.g. hour-of-day, weekday-vs-weekend).
  *
  * `tsCol` is an epoch-nanos long column (TESTDATA events.ts after
  * nanosAsLong); `div` integer arithmetic throughout — double division
  * would lose nanosecond precision and flip floor at boundaries. */
object Seasonal {

  /** Seconds-divisor for a timestamp unit — the reference's `time.inMili`
    * config generalized (and.conf:10-11); driver parquet carries nanos. */
  private def divisor(unit: String): Long = unit match {
    case "nanos" => 1000000000L
    case "millis" => 1000L
    case "sec" => 1L
    case other => throw new IllegalArgumentException(s"unknown ts unit $other")
  }

  /** Cycle index for a reference cycle type name. Day/week arithmetic is
    * UTC; epoch day 0 (1970-01-01) was a Thursday → dayOfWeek 0=Monday
    * matches (epochDay + 3) mod 7. */
  def cycleIndex(tsCol: String, cycleType: String, unit: String = "nanos"): Column = {
    val sec = s"($tsCol div ${divisor(unit)})"
    cycleType match {
      case "hourOfDay" => expr(s"($sec div 3600) % 24")
      case "dayOfWeek" => expr(s"(($sec div 86400) + 3) % 7")
      case "weekDayOrWeekendOfWeek" =>
        when(expr(s"(($sec div 86400) + 3) % 7") >= 5, lit(1L)).otherwise(lit(0L))
      case "hourOfWeek" =>
        expr(s"((($sec div 86400) + 3) % 7) * 24 + ($sec div 3600) % 24")
      // salean.conf:18 — the day/night regime split of hourOfDay (the
      // binary form weekDayOrWeekendOfWeek takes for the week): day =
      // UTC hours 6..17 → 1, night → 0. The reference resolves this
      // name through chombo's SeasonalAnalyzer (an external dependency
      // not in the repo), so the boundary is this engine's documented
      // definition; the oracle replays the same expression.
      case "nightDayHourOfDay" =>
        when(expr(s"($sec div 3600) % 24").between(6, 17), lit(1L))
          .otherwise(lit(0L))
      case other => throw new IllegalArgumentException(s"unknown cycle type $other")
    }
  }

  /** Append (cycleType, cycleIndex) columns — the seasonal key extension:
    * downstream fit/score key = idCols :+ "cycleType" :+ "cycleIndex". */
  def withCycle(df: DataFrame, tsCol: String, cycleType: String,
      unit: String = "nanos"): DataFrame =
    df.withColumn("cycleType", lit(cycleType))
      .withColumn("cycleIndex", cycleIndex(tsCol, cycleType, unit))
}
