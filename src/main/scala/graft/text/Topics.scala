package graft.text

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic topic modeling (PLSA, Hofmann SIGIR'99) — the corpus
  * structure-discovery face the engine lacked: mixture weights per doc
  * over latent topics, word distributions per topic, fitted by EM on
  * (doc, word, count) pairs. Two topics keep every E-step responsibility
  * CLOSED FORM in wide columns (r = θφ₀ / (θφ₀ + (1−θ)φ₁)), which is
  * what makes the whole fit — init, `iters` EM rounds, final mixtures —
  * an exact float program the DuckDB oracle replays round by round
  * (the als2 discipline applied to EM).
  *
  * Determinism: the topic-word init is EXACT-integer md5 jitter
  * (n_zw = 10000 + h56("plsa z:w") mod 1000, φ = n/Σn — integer ratios,
  * no float sum anywhere in init); each round's M-step aggregates
  * 9dp fixed-point responsibility terms as decimals (order-free) and
  * round-freezes θ/φ at 6dp, so parameters are bit-identical
  * cross-engine after every round.
  *
  * Scale: the vocabulary is capped at the top-`vocab` words by corpus
  * count (rank via the banded device — no data-sized sort), so φ is
  * model-sized and broadcasts; θ rides a hash join keyed by doc. Per
  * round: one pairs⋈θ⋈broadcast(φ) join materialized once
  * (localCheckpoint, the als2 pattern — no iteration-growing lineage)
  * feeding two hash aggregates (by doc, by word). Pairs are counted
  * once and checkpointed.
  *
  * Output per doc: idCol, n_terms, theta0 (P(topic 0 | doc)), topic
  * (argmax, ties → 0). */
object Topics {

  def plsa2(docs: DataFrame, idCol: String, textCol: String,
      vocab: Int = 2000, iters: Int = 3, eps: Double = 1e-6): DataFrame = {
    require(iters >= 1 && iters <= 8, "1 <= iters <= 8")
    require(vocab >= 16, "vocab >= 16")
    def r6(c: Column): Column =
      (when(c >= 0, floor(c * 1e6 + 0.5)).otherwise(-floor(-c * 1e6 + 0.5)))
        .cast("double") / 1e6
    def d9(c: Column) = fixedPointLong(c, 9).cast("decimal(38,0)")
    val tok = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("_d"),
        explode(TextOps.tokens(col(textCol))).as("_w"))
      .where(col("_w") =!= "")
    val wc = tok.groupBy(col("_w")).agg(count(lit(1)).as("_wc"))
    val top = bandedRowNumber(wc, band = col("_wc"), bandAsc = false,
      tie = Seq(col("_w").asc), out = "_rk", maxRank = vocab.toLong)
      .select(col("_w"))
    val pairs = tok.join(broadcast(top), "_w")
      .groupBy(col("_d"), col("_w")).agg(count(lit(1)).as("_c"))
      .localCheckpoint(true)
    // exact-integer jittered init: n_zw ∈ [10000, 10999], φ_z = n/Σn
    def nInit(z: Int): Column =
      lit(10000L) + pmod(TextOps.hash56(concat(lit(s"plsa$z:"), col("_w"))),
        lit(1000L))
    val phiBase = pairs.select(col("_w")).distinct()
      .select(col("_w"), nInit(0).as("_n0"), nInit(1).as("_n1"))
    val tots = phiBase.agg(sum(col("_n0")).as("_t0"),
      sum(col("_n1")).as("_t1"), count(lit(1)).as("_v"))
    val vSize = tots.head()
    val (t0, t1, vN) = (vSize.getLong(0), vSize.getLong(1), vSize.getLong(2))
    var phi = phiBase.select(col("_w"),
        (col("_n0").cast("double") / t0.toDouble).as("_p0"),
        (col("_n1").cast("double") / t1.toDouble).as("_p1"))
      .localCheckpoint(true)
    var theta = pairs.select(col("_d")).distinct()
      .select(col("_d"), lit(0.5).as("_th"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val resp = pairs.join(theta, "_d").join(broadcast(phi), "_w")
        .withColumn("_r0",
          col("_th") * col("_p0") /
            (col("_th") * col("_p0") + (lit(1.0) - col("_th")) * col("_p1")))
        .select(col("_d"), col("_w"),
          d9(col("_c").cast("double") * col("_r0")).as("_m0"),
          d9(col("_c").cast("double") * (lit(1.0) - col("_r0"))).as("_m1"))
        .localCheckpoint(true)
      theta = resp.groupBy(col("_d"))
        .agg(sum(col("_m0")).as("_s0"), sum(col("_m1")).as("_s1"))
        .select(col("_d"), r6(col("_s0").cast("double") /
          (col("_s0") + col("_s1")).cast("double")).as("_th"))
        .localCheckpoint(true)
      val byW = resp.groupBy(col("_w"))
        .agg(sum(col("_m0")).as("_n0"), sum(col("_m1")).as("_n1"))
      val dens = byW.agg(sum(col("_n0")).as("_d0"), sum(col("_n1")).as("_d1"))
        .head()
      val (den0, den1) = (dens.getDecimal(0).doubleValue() / 1e9,
        dens.getDecimal(1).doubleValue() / 1e9)
      phi = byW.select(col("_w"),
          r6((col("_n0").cast("double") / 1e9 + eps) /
            (den0 + eps * vN)).as("_p0"),
          r6((col("_n1").cast("double") / 1e9 + eps) /
            (den1 + eps * vN)).as("_p1"))
        .localCheckpoint(true)
    }
    val nTerms = pairs.groupBy(col("_d")).agg(sum(col("_c")).as("n_terms"))
    theta.join(nTerms, "_d")
      .select(col("_d").as(idCol), col("n_terms"),
        col("_th").as("theta0"),
        when(col("_th") >= 0.5, 0L).otherwise(1L).as("topic"))
  }
}
