package graft.model

import graft.core.fixedPointLong
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Matrix factorization (alternating least squares, Koren/Bell/Volinsky
  * IEEE Computer 2009) — the collaborative-filtering / count-matrix
  * embedding family the engine lacked: factor an interaction matrix
  * (user, item, value) into rank-2 user and item vectors with ridge λ.
  * Rank 2 keeps every normal-equation solve CLOSED FORM (a 2×2 inverse
  * is one determinant), which is what makes the whole fit — init,
  * `iters` alternating rounds, final RMSE — an exact float program the
  * DuckDB oracle replays term by term. The same machinery factorizes a
  * PPMI word-pair matrix into count-based word embeddings (the GloVe-
  * adjacent face of `TextOps.ppmi`).
  *
  * Determinism: item factors init from md5 (the engine-wide hash56
  * device) in (0, 1); each ALS round aggregates the 2×2 normal-equation
  * sums as 8dp fixed-point decimals (order-free), solves in a fixed
  * float expression, and freezes the updated factors at 6dp (the gd2
  * round-freeze discipline) — so factors are bit-identical cross-engine
  * after every round.
  *
  * Scale: per round, one equi-join of the ratings against the SMALLER
  * side's factor table (broadcast when model-sized) + one hash aggregate
  * keyed on the side being solved; factor state is (users + items) × 2
  * doubles. No iteration-growing lineage: each round's factor frame is
  * the aggregate's output, re-derived from the cached ratings.
  *
  * Output: one row per entity — (side 'user'|'item', id, f1, f2) — plus
  * a 1-row 'rmse' side carrying the fit diagnostic in f1. */
object Factorize {

  def als2(ratings: DataFrame, userCol: String, itemCol: String,
      valCol: String, iters: Int = 4, lambda: Double = 0.1): DataFrame = {
    require(iters >= 1 && iters <= 12, "1 <= iters <= 12")
    require(lambda > 0, "ridge lambda > 0")
    val spark = ratings.sparkSession
    def d8(c: Column) = fixedPointLong(c, 8).cast("decimal(38,0)")
    def r6(c: Column) =
      (when(c >= 0, floor(c * 1e6 + 0.5)).otherwise(-floor(-c * 1e6 + 0.5)))
        .cast("double") / 1e6
    val base = ratings
      .where(col(userCol).isNotNull && col(itemCol).isNotNull &&
        col(valCol).isNotNull)
      .select(col(userCol).cast("string").as("_u"),
        col(itemCol).cast("string").as("_i"),
        col(valCol).cast("double").as("_y"))
      .localCheckpoint(true)
    // md5 init in (0,1): f_k(i) = (hash56("alsK:" + i) + 1) / 2^56
    def h01(prefix: String, c: Column): Column =
      (graft.text.TextOps.hash56(concat(lit(prefix), c)) + 1.0) /
        lit(72057594037927936.0)
    var itemF = base.select(col("_i")).distinct()
      .select(col("_i"), r6(h01("als1:", col("_i"))).as("_q1"),
        r6(h01("als2:", col("_i"))).as("_q2"))
      .localCheckpoint(true)
    var userF: DataFrame = null
    // solve side A given side B: per A-key accumulate the 2×2 normal
    // equations Σbb^T + λI and Σy·b, then the closed-form inverse
    def solve(aKey: String, bKey: String, bf: DataFrame,
        f1: String, f2: String, bcast: Boolean): DataFrame = {
      // only the ITEM side is contractually model-sized; the user side
      // joins plain (hash) — forcing a broadcast of a user-scale factor
      // table would OOM the driver at 100 TB
      val j = base.join(if (bcast) broadcast(bf) else bf, bKey)
      val g = j.groupBy(col(aKey))
        .agg(count(lit(1)).as("_n"),
          sum(d8(col(f1) * col(f1))).as("_s11"),
          sum(d8(col(f1) * col(f2))).as("_s12"),
          sum(d8(col(f2) * col(f2))).as("_s22"),
          sum(d8(col("_y") * col(f1))).as("_b1"),
          sum(d8(col("_y") * col(f2))).as("_b2"))
      val a11 = col("_s11").cast("double") / 1e8 + lambda
      val a12 = col("_s12").cast("double") / 1e8
      val a22 = col("_s22").cast("double") / 1e8 + lambda
      val b1 = col("_b1").cast("double") / 1e8
      val b2 = col("_b2").cast("double") / 1e8
      val det = a11 * a22 - a12 * a12
      g.select(col(aKey),
        r6((a22 * b1 - a12 * b2) / det).as("_p1"),
        r6((a11 * b2 - a12 * b1) / det).as("_p2"))
    }
    // one eager job per ROUND, not per half-step (r14, guide §1.2):
    // an intermediate round's userF has exactly one consumer — the same
    // round's item solve — so its eager checkpoint bought nothing;
    // leaving it lazy folds both half-steps into the itemF checkpoint
    // job (two chained shuffles) and halves the fit's action count.
    // itemF stays checkpointed each round, so lineage is still bounded
    // at one round's depth; values are unchanged (same expressions,
    // same 6dp freeze).
    for (_ <- 1 to iters) {
      userF = solve("_u", "_i", itemF, "_q1", "_q2", bcast = true)
        .withColumnRenamed("_p1", "_p1u").withColumnRenamed("_p2", "_p2u")
      itemF = solve("_i", "_u",
          userF.select(col("_u"), col("_p1u").as("_f1"),
            col("_p2u").as("_f2")), "_f1", "_f2", bcast = false)
        .withColumnRenamed("_p1", "_q1").withColumnRenamed("_p2", "_q2")
        .localCheckpoint(true)
    }
    // the FINAL userF has two consumers (the rmse pass and the output
    // union) — materialize it once
    userF = userF.localCheckpoint(true)
    val pred = base.join(broadcast(itemF), "_i")
      .join(userF, "_u")
      .withColumn("_e",
        col("_y") - (col("_p1u") * col("_q1") + col("_p2u") * col("_q2")))
    val rmse = pred
      .agg(sqrt(sum(d8(col("_e") * col("_e"))).cast("double") / 1e8 /
        count(lit(1))).as("rmse"))
      .select(lit("rmse").as("side"), lit("all").as("id"),
        col("rmse").as("f1"), lit(0.0).as("f2"))
    userF.select(lit("user").as("side"), col("_u").as("id"),
        col("_p1u").as("f1"), col("_p2u").as("f2"))
      .unionByName(itemF.select(lit("item").as("side"),
        col("_i").as("id"), col("_q1").as("f1"), col("_q2").as("f2")))
      .unionByName(rmse)
  }
}
