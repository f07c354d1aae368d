package graft

import graft.tools.WindowAudit

/** The unpartitioned-window guard (r10/r11 verdict item 1d): a
  * WindowExec with an empty partition spec sorts its whole input on ONE
  * task, so every such node in every gated query must be provably
  * bounded — `banded` (the core.bandedScan/bandedRowNumber device: the
  * global window rides a band histogram), `limited` (a Limit below the
  * window caps the frame), or on the explicit whitelist below with a
  * documented cardinality bound that the second test ENFORCES at
  * runtime (sf0.01, exact `numOutputRows` of the window's input). A new
  * query that ships a data-sized global sort fails the first test; a
  * whitelisted frame that starts scaling with the data fails the
  * second. */
class WindowGuardSpec extends SparkSpec {

  /** query → (max rows into any open unpartitioned window at sf0.01,
    * why the frame is bounded). Caps are the documented domain bounds,
    * NOT the measured values — headroom is deliberate, data-sized
    * frames at sf0.01 (10k events) sit above every cap. */
  private val whitelist: Map[String, (Long, String)] = Map(
    "q341_kaplan_meier" -> (5000L,
      "distinct integer durations — survival-domain bounded (25 @ sf0.01)"),
    "q342_logrank" -> (5000L, "distinct integer durations"),
    "q419_rmst" -> (5000L, "distinct integer durations"),
    "q420_gehan" -> (5000L, "distinct integer durations"),
    "q451_aalen_johansen" -> (5000L, "distinct integer durations"),
    "q506_c_index" -> (5000L, "distinct integer durations"),
    "q380_page_trend" -> (64L, "one row per treatment (event_type)"),
    "q388_decile_lift" -> (32L, "one row per decile bin (nBins=10)"),
    "q483_qini" -> (32L, "one row per uplift bin (nBins=10)"),
    "q426_t_closeness" -> (1000L,
      "sensitive-attribute domain (t-closeness contract: categorical)"),
    "q428_fisher" -> ((1L << 20) + 1L,
      "ln-factorial table 0..n, n <= maxN ENFORCED by assert_true in " +
        "fisherExact (operator refuses bigger tables)"),
    "q443_transfer_entropy" -> (10000L,
      "constant-key daily series (key folded away) — calendar-bounded"),
    "q444_granger" -> (10000L, "constant-key daily series"),
    "q466_isotonic" -> (1000L,
      "2dp probability histogram — the PAV pair join already requires " +
        "a model-sized frame (documented VALUE-RANGE contract)"),
    "q481_psm_att" -> (30000L,
      "4dp propensity in [0,1] -> <= 10001 distinct per side"))

  test("every unpartitioned WindowExec is banded, limit-bounded, or whitelisted") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val opens =
          try WindowAudit.unpartitionedWindows(fn(spark, sfDir))
            .filter(_.kind == "open")
          catch {
            case t: Throwable =>
              fail(s"$name failed to plan: ${t.getMessage}")
          }
        if (opens.nonEmpty && !whitelist.contains(name))
          Seq(s"$name: ${opens.map(_.detail).distinct.mkString(" | ")}")
        else Nil
    }
    assert(offenders.isEmpty,
      s"un-whitelisted single-task global sort risk:\n${offenders.mkString("\n")}")
  }

  test("whitelisted unpartitioned windows hold their documented caps at sf0.01") {
    whitelist.toSeq.sortBy(_._1).foreach { case (name, (cap, why)) =>
      val rs = WindowAudit.unpartitionedWindowInputRows(
          SparkEntry.queries(name)(spark, sfDir01))
        .filter(_._1.kind == "open")
      assert(rs.nonEmpty,
        s"$name has no open unpartitioned window left — drop it from the whitelist")
      rs.foreach { case (f, rows) =>
        assert(rows >= 0 && rows <= cap,
          s"$name: $rows rows into an unpartitioned window (cap $cap — $why) [${f.detail}]")
      }
    }
  }
}
