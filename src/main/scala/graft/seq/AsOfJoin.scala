package graft.seq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to every left row the latest right-side values with
  * `right.ts <= left.ts` per key — the natural shape for applying
  * time-versioned models/thresholds to an event stream (an engine addition
  * beyond the reference, which has no temporal join at all).
  *
  * Implementation composes built-ins (preference ladder tier (a)): union
  * both sides with a source tag, one window pass per key ordered by
  * (ts, side) with `last(..., ignoreNulls)` carrying the right-side values
  * forward; right rows sort before left rows at equal ts so an exact
  * timestamp matches. One shuffle+sort total — same cost class as any
  * windowed op, no range-join explosion. */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, rightValueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = rightValueCols.foldLeft(left)(
      (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType)))
      .withColumn("_side", lit(1))
    val rTagged = leftCols.filterNot(keyCols.contains).filterNot(_ == tsCol)
      .foldLeft(right.select((keyCols ++ Seq(tsCol) ++ rightValueCols).map(col): _*))(
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .withColumn("_side", lit(0))
    val unioned = lTagged.unionByName(rTagged.select(lTagged.columns.map(col): _*))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightValueCols.foldLeft(unioned)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    filled.where(col("_side") === 1).drop("_side")
  }
}
