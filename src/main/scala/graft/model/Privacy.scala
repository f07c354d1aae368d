package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-identification-risk audits for data releases (Sweeney 2002
  * k-anonymity; Machanavajjhala et al. 2007 l-diversity) — the checks a
  * training-data pipeline runs on metadata columns before publishing a
  * corpus next to [[graft.text.TextOps]]'s PII redaction of the text
  * itself.
  */
object Privacy {

  /** k-anonymity / l-diversity audit over quasi-identifier columns:
    * group rows into equivalence classes on `quasiCols`, then report
    * k_anonymity = the smallest class size (an adversary matching on
    * the quasi-identifiers pins a row to ≥ k candidates),
    * l_diversity = the smallest number of distinct `sensitiveCol`
    * values inside any class, and the mass at risk under the caller's
    * target `k` (classes_below_k, rows_below_k, frac_rows_below_k).
    *
    * Exact integer aggregates end to end — the one float (the risk
    * fraction) is a single division of exact counts.
    *
    * Scale: one hash aggregate to the class frame (class-count-sized,
    * with map-side combine), one roll-up to a single row. Output:
    * n_rows, n_classes, k_anonymity, l_diversity, classes_below_k,
    * rows_below_k, frac_rows_below_k. */
  def kAnonymityAudit(data: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    val classes = data
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("_sz"),
        countDistinct(col(sensitiveCol)).as("_l"))
    classes.agg(
      sum(col("_sz")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      min(col("_sz")).as("k_anonymity"),
      min(col("_l")).as("l_diversity"),
      sum(when(col("_sz") < k, 1L).otherwise(0L)).as("classes_below_k"),
      sum(when(col("_sz") < k, col("_sz")).otherwise(0L))
        .as("rows_below_k"))
      .withColumn("frac_rows_below_k",
        col("rows_below_k").cast("double") / col("n_rows").cast("double"))
  }
}
