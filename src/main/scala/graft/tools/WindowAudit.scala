package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.window.WindowExec

/** Plan audit for the unpartitioned-window scale hole (r10/r11 verdict
  * item 1): finds every `WindowExec` with an EMPTY partition spec — the
  * node that sorts its whole input on ONE task — and classifies it:
  *
  *   - `banded`: the order key is a band-histogram column
  *     (`_bcs_band` / `_brn_band`) from [[graft.core.bandedScan]] /
  *     [[graft.core.bandedRowNumber]] — bounded by construction (one row
  *     per band).
  *   - `limited`: a `Limit`/`TakeOrderedAndProject` sits below the
  *     window — the frame is k-bounded before it reaches the sort.
  *   - `open`: anything else — needs an explicit whitelist entry with a
  *     documented cardinality bound, enforced at runtime by
  *     [[unpartitionedWindowInputRows]] (PlanShapeSpec).
  */
object WindowAudit {

  final case class Finding(kind: String, detail: String)

  private def kids(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec => Seq(q.plan)
    case r: ReusedExchangeExec => Seq(r.child)
    case _ => p.children
  }

  private def collect[T](p: SparkPlan)(
      f: PartialFunction[SparkPlan, T]): Seq[T] =
    (if (f.isDefinedAt(p)) Seq(f(p)) else Nil) ++
      kids(p).flatMap(collect(_)(f)) ++
      p.subqueries.flatMap(collect(_)(f))

  private def isLimit(p: SparkPlan): Boolean = {
    val n = p.getClass.getSimpleName
    n.contains("Limit") || n.contains("TakeOrderedAndProject")
  }

  private def classify(w: WindowExec): Finding = {
    val order = w.orderSpec.map(_.sql).mkString(",")
    if (order.contains("_bcs_band") || order.contains("_brn_band") ||
        order.contains("_asof_band"))
      Finding("banded", order.take(60))
    // `_bcs_flat`/`_brn_flat` are produced ONLY by the size-gated flat
    // branch of core.bandedScan/bandedRowNumber (r12 verdict item 3):
    // the single-task sort is plan-time bounded at
    // spark.graft.bandedScan.flatMaxBytes (one shuffle-partition's
    // worth) — above the bound the same call sites emit the banded
    // shape, so this window can never be data-sized at scale.
    else if (order.contains("_bcs_flat") || order.contains("_brn_flat"))
      Finding("metered-small", order.take(60))
    else if (collect(w.child) { case c if isLimit(c) => c }.nonEmpty)
      Finding("limited", order.take(60))
    else Finding("open", order.take(120))
  }

  /** Static sweep: classify every unpartitioned WindowExec in the
    * (un-executed) physical plan. */
  def unpartitionedWindows(df: DataFrame): Seq[Finding] =
    collect(df.queryExecution.executedPlan) {
      case w: WindowExec if w.partitionSpec.isEmpty => classify(w)
    }

  /** Runtime measurement: executes the frame and reports, for each
    * unpartitioned WindowExec, the rows that entered its single-task
    * sort. WindowExec/SortExec expose no row metric and AQE can elide
    * the single-partition exchange, so the input count is read from the
    * FIRST descendant carrying a `numOutputRows` metric — every
    * row-changing operator (aggregate, join, filter, scan) has one, and
    * everything between it and the window (sort, exchange, project)
    * preserves rows. −1 when no metered node exists below. */
  def unpartitionedWindowInputRows(df: DataFrame): Seq[(Finding, Long)] = {
    // collect(), not count(): count() plans a SEPARATE aggregate query,
    // leaving this frame's own adaptive plan un-executed (no stage stats)
    df.collect(): Unit
    collect(df.queryExecution.executedPlan) {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        val rows = collect(w.child) {
          case p if p.metrics.contains("numOutputRows") =>
            p.metrics("numOutputRows").value
        }.headOption.getOrElse(-1L)
        (classify(w), rows)
    }
  }
}
