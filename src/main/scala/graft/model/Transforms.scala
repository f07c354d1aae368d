package graft.model

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributional power transforms — the normalization front-end a
  * feature pipeline runs before the Gaussian-assuming scorers
  * (zscore/Mahalanobis/PCA families assume roughly-normal marginals;
  * heavy-tailed telemetry violates that and inflates thresholds).
  * Engine addition: the reference normalizes only by z-scaling
  * (chombo Transformer family); a λ-parametric power fit is the
  * standard remedy the reference lacks. */
object Transforms {

  /** Yeo-Johnson ψ(x, λ) (Yeo & Johnson 2000, Biometrika 87) — the
    * all-reals extension of Box-Cox. Powers are written as exp(k·ln(·))
    * so cross-engine parity rides the established exp/ln libm
    * assumption instead of pow(). */
  private def psi(x: Column, lam: Column): Column = {
    val posReg = (exp(lam * log(x + 1.0)) - 1.0) / lam
    val pos = when(abs(lam) > 1e-12, posReg).otherwise(log(x + 1.0))
    val negReg = -(exp((lit(2.0) - lam) * log(-x + 1.0)) - 1.0) / (lit(2.0) - lam)
    val neg = when(abs(lam - 2.0) > 1e-12, negReg).otherwise(-log(-x + 1.0))
    when(x >= 0, pos).otherwise(neg)
  }

  /** Per-key Yeo-Johnson λ fit by grid MLE: for each λ on the grid the
    * Gaussian profile log-likelihood is
    * LL(λ) = −n/2 · ln σ̂²(ψ) + (λ−1) · Σ sign(x)·ln(1+|x|),
    * maximized over the grid with ties to the smaller λ.
    *
    * Determinism: ψ is frozen at 6dp fixed-point, so Σψ and Σψ² are
    * exact decimal sums (the q116 device — σ̂² is then a fixed float
    * expression of exact integers); the Jacobian term freezes each
    * sign·ln1p row at 9dp. The argmax orders by (6dp-frozen LL desc,
    * λ asc) — a total order both engines replay.
    *
    * Scale: one hash aggregate to keys × |grid| rows (the grid rides a
    * broadcast), then a model-sized argmax window per key. No
    * data-sized sort, no second scan.
    *
    * Output per key: key, lambda, ll, n. */
  def yeoJohnsonFit(data: DataFrame, keyCol: String, valCol: String,
      lambdas: Seq[Double] = Seq(-2.0, -1.5, -1.0, -0.5, 0.0, 0.5, 1.0, 1.5, 2.0))
      : DataFrame = {
    require(lambdas.nonEmpty, "empty lambda grid")
    val spark = data.sparkSession
    import spark.implicits._
    val grid = broadcast(lambdas.toDF("lam"))
    val x = col(valCol).cast("double")
    val base = data.where(x.isNotNull)
      .select(col(keyCol).as("key"), x.as("_x"))
      .crossJoin(grid)
    def dec(c: Column) = c.cast("decimal(38,0)")
    val p6 = dec(fixedPointLong(psi(col("_x"), col("lam")), 6))
    // Jacobian row term sign(x)·ln(1+|x|), 9dp-frozen
    val jac = dec(fixedPointLong(
      when(col("_x") >= 0, log(col("_x") + 1.0))
        .otherwise(-log(-col("_x") + 1.0)), 9))
    val agg = base.groupBy(col("key"), col("lam"))
      .agg(count(lit(1)).as("n"), sum(p6).as("_s"),
        sum(p6 * p6).as("_q"), sum(jac).as("_j"))
      .where(col("n") >= 2)
    val nD = col("n").cast("double")
    val s = col("_s").cast("double"); val q = col("_q").cast("double")
    val varPsi = (q / 1e12 - (s / 1e6) * (s / 1e6) / nD) / nD
    val ll = -nD / 2.0 * log(greatest(varPsi, lit(1e-12))) +
      (col("lam") - 1.0) * (col("_j").cast("double") / 1e9)
    val w = Window.partitionBy(col("key"))
      .orderBy(fixedPointLong(col("ll"), 6).desc, col("lam").asc)
    agg.withColumn("ll", ll)
      .withColumn("_rk", row_number().over(w))
      .where(col("_rk") === 1)
      .select(col("key"), col("lam").as("lambda"), col("ll"), col("n"))
  }
}
