package graft.post

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational finishing operators (engine additions): the 2-D skyline
  * (Pareto frontier), exact per-group mode and weighted median. All
  * three follow the value-histogram contract — the only global windows
  * run over distinct-value frames, never rows.
  *
  * The 2-D skyline uses the sort-and-prefix-min identity: with both
  * dimensions minimized, a point is on the frontier iff its y equals
  * the per-x minimum AND that minimum strictly undercuts every smaller
  * x's minimum — one distinct-x window instead of the quadratic
  * dominance anti-join (the naive form at 100 TB). */
object Relational2 {

  private def fp(c: Column): Column = graft.core.fixedPointLong(c, 4)

  /** 2-D skyline minimizing both columns. Output: the frontier rows
    * (idCol, x, y as 4dp-frozen doubles), every duplicate of a frontier
    * point included. */
  def skyline2d(points: DataFrame, idCol: String, xCol: String,
      yCol: String): DataFrame = {
    val p = points.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(idCol).as("id"), fp(col(xCol).cast("double")).as("_x"),
        fp(col(yCol).cast("double")).as("_y"))
    val perX = p.groupBy(col("_x")).agg(min(col("_y")).as("_my"))
    // banded exclusive prefix-min over the distinct-x frame (the
    // binaryAuc device; null first row matches the flat window)
    val sky = graft.core.bandedScan(perX, expr("_x div 100000"),
        bandAsc = true, tie = Seq(col("_x").asc),
        aggs = Seq(graft.core.BandedAgg("_my", "_pm", "min",
          inclusive = false)))
      .where(col("_pm").isNull || col("_my") < col("_pm"))
      .select(col("_x"), col("_my").as("_y"))
    p.join(sky, Seq("_x", "_y"))
      .select(col("id"), (col("_x").cast("double") / 1e4).as("x"),
        (col("_y").cast("double") / 1e4).as("y"))
  }

  /** Exact per-group mode of a numeric column (4dp frozen), smallest
    * value wins ties. Output: group, mode, cnt. */
  def groupMode(data: DataFrame, groupCol: String, valCol: String)
      : DataFrame = {
    val h = data.where(col(valCol).isNotNull)
      .select(col(groupCol).as("grp"), fp(col(valCol).cast("double")).as("_v"))
      .groupBy(col("grp"), col("_v")).agg(count(lit(1)).as("cnt"))
    h.withColumn("_rk", row_number().over(Window.partitionBy(col("grp"))
        .orderBy(col("cnt").desc, col("_v").asc)))
      .where(col("_rk") === 1)
      .select(col("grp"), (col("_v").cast("double") / 1e4).as("mode"),
        col("cnt"))
  }

  /** Weighted median per group with integer weights: the smallest value
    * whose doubled cumulative weight reaches the total. Output: group,
    * w_total, wmedian. */
  def weightedMedian(data: DataFrame, groupCol: String, valCol: String,
      weightCol: String): DataFrame = {
    val h = data.where(col(valCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol) > 0)
      .select(col(groupCol).as("grp"), fp(col(valCol).cast("double")).as("_v"),
        col(weightCol).cast("long").as("_w"))
      .groupBy(col("grp"), col("_v")).agg(sum(col("_w")).as("_sw"))
    val w = Window.partitionBy(col("grp")).orderBy(col("_v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kw = Window.partitionBy(col("grp"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    h.withColumn("_cum", sum(col("_sw")).over(w))
      .withColumn("_tot", sum(col("_sw")).over(kw))
      .where(lit(2) * col("_cum") >= col("_tot"))
      .withColumn("_rk", row_number().over(Window.partitionBy(col("grp"))
        .orderBy(col("_v").asc)))
      .where(col("_rk") === 1)
      .select(col("grp"), col("_tot").as("w_total"),
        (col("_v").cast("double") / 1e4).as("wmedian"))
  }
}
