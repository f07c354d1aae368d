package graft.multi

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Autoencoder-based outlier detection — the last §2.9 row
  * (reference: resource/ae_ticket.properties — z-scaled features, MSE
  * autoencoder, reconstruction error as the outlier score; the model
  * itself lives in the sibling avenir project). Re-expressed
  * engine-native and DETERMINISTIC: a tied-weight single-hidden-layer
  * autoencoder x̂ = Wᵀ·σ(Wx + b₁) + b₂ trained by full-batch gradient
  * descent with 8dp fixed-point gradient sums (order-exact across
  * partitions) and 6dp-frozen parameters per round — the same device
  * as the logistic-regression quality trainer, so the whole training
  * run replays in an unrolled SQL oracle. σ is the algebraic sigmoid
  * 0.5 + x/(2(1+|x|)) (no libm in the hot path; the reference's
  * relu/sigmoid stack is a documented deviation — same detection
  * semantics, deterministic arithmetic).
  *
  * Scale: training is `rounds` full scans, each one map-side-combined
  * aggregate to (h·d + h + d + 1) fixed-point sums; scoring is one
  * final scan. No shuffle carries more than the scalar gradient row.
  */
object AutoEncoder {

  /** Parameter references as expression strings — the Spark trainer
    * instantiates them with frozen literal values, the SQL oracle with
    * parameter-CTE column refs, so both engines execute the identical
    * float program. */
  case class Refs(w: IndexedSeq[IndexedSeq[String]],
      b1: IndexedSeq[String], b2: IndexedSeq[String])

  /** Deterministic symmetric-breaking init: W_kj alternates sign on
    * k+j and grows with 0.1·(1+k+j); biases start at 0. */
  def initW(h: Int, d: Int): IndexedSeq[IndexedSeq[Double]] =
    IndexedSeq.tabulate(h, d)((k, j) =>
      0.1 * (1 + k + j) * (if ((k + j) % 2 == 0) 1.0 else -1.0))

  /** Step-by-step forward/backward column expressions over `refs` and
    * input columns x0..x{d-1}; keys: z_k, a_k, xh_j, e_j, gz_k,
    * gw_k_j, gb1_k, gb2_j, sse. Each is one flat arithmetic string
    * valid in both Spark SQL and DuckDB. */
  def exprs(d: Int, h: Int, refs: Refs): Map[String, String] = {
    val m = collection.mutable.Map.empty[String, String]
    (0 until h).foreach { k =>
      m(s"z$k") = (0 until d).map(j => s"${refs.w(k)(j)}*x$j")
        .mkString(" + ") + s" + ${refs.b1(k)}"
      m(s"a$k") = s"0.5 + z$k/(2.0*(1.0 + abs(z$k)))"
    }
    (0 until d).foreach { j =>
      m(s"xh$j") = (0 until h).map(k => s"${refs.w(k)(j)}*a$k")
        .mkString(" + ") + s" + ${refs.b2(j)}"
      m(s"e$j") = s"xh$j - x$j"
    }
    (0 until h).foreach { k =>
      m(s"gz$k") = "(" + (0 until d).map(j =>
        s"${refs.w(k)(j)}*(2.0*e$j)").mkString(" + ") +
        s")*(1.0/(2.0*((1.0 + abs(z$k))*(1.0 + abs(z$k)))))"
    }
    (0 until h).foreach { k =>
      (0 until d).foreach { j =>
        m(s"gw${k}_$j") = s"gz$k*x$j + a$k*(2.0*e$j)"
      }
      m(s"gb1_$k") = s"gz$k"
    }
    (0 until d).foreach(j => m(s"gb2_$j") = s"2.0*e$j")
    m("sse") = (0 until d).map(j => s"e$j*e$j").mkString(" + ")
    m.toMap
  }

  /** z-scale stats per feature from exact 4dp moment sums:
    * (mean, std) with population variance; std 0 → feature pins to 0. */
  private def scaleStats(data: DataFrame, xCols: Seq[String]):
      Seq[(Double, Double)] = {
    val aggs = xCols.flatMap { c =>
      val q = graft.core.fixedPointLong(col(c).cast("double"), 4)
        .cast("decimal(38,0)")
      Seq(sum(q).as(s"_s_$c"), sum((q * q).cast("decimal(38,0)"))
        .as(s"_ss_$c"), count(col(c)).as(s"_n_$c"))
    }
    val r = data.agg(aggs.head, aggs.tail: _*).head()
    xCols.indices.map { i =>
      val s = r.getDecimal(3 * i).doubleValue() / 1e4
      val ss = r.getDecimal(3 * i + 1).doubleValue() / 1e8
      val n = r.getLong(3 * i + 2).toDouble
      val mean = s / n
      val v = ss / n - mean * mean
      (mean, if (v > 0) math.sqrt(v) else 0.0)
    }
  }

  /** Train + score: z-scale `xCols`, run `rounds` full-batch GD rounds,
    * then emit per-row reconstruction error and the O/N tag at
    * `threshold`. Output: idCols…, score, tag. */
  def aeScore(data: DataFrame, idCols: Seq[String], xCols: Seq[String],
      hidden: Int = 2, rounds: Int = 8, lr: Double = 0.1,
      threshold: Double = 2.0): DataFrame = {
    val d = xCols.size
    val h = hidden
    def r6(x: Double): Double = graft.text.TextOps.round6(x)
    val base0 = data.where(xCols.map(col(_).isNotNull).reduce(_ && _))
    val stats = scaleStats(base0, xCols)
    val scaled = xCols.zipWithIndex.foldLeft(base0) {
      case (df, (c, i)) =>
        val (m, sd) = stats(i)
        df.withColumn(s"x$i",
          if (sd > 0) (col(c).cast("double") - lit(m)) / lit(sd)
          else lit(0.0))
    }.localCheckpoint(true)

    var w = initW(h, d).map(_.toArray).toArray
    var b1 = Array.fill(h)(0.0)
    var b2 = Array.fill(d)(0.0)
    def litRefs = Refs(
      IndexedSeq.tabulate(h, d)((k, j) => w(k)(j).toString),
      IndexedSeq.tabulate(h)(k => b1(k).toString),
      IndexedSeq.tabulate(d)(j => b2(j).toString))
    def withSteps(df: DataFrame, keys: Seq[String],
        ex: Map[String, String]): DataFrame =
      keys.foldLeft(df)((acc, key) => acc.withColumn(key, expr(ex(key))))
    val stepKeys = (c: Map[String, String]) =>
      (0 until h).map(k => s"z$k") ++ (0 until h).map(k => s"a$k") ++
        (0 until d).map(j => s"xh$j") ++ (0 until d).map(j => s"e$j") ++
        (0 until h).map(k => s"gz$k")
    val fp8 = (c: Column) =>
      graft.core.fixedPointLong(c, 8).cast("decimal(38,0)")

    // round parameters as broadcast COLUMNS (core.paramRow discipline):
    // the Refs indirection already exists for the oracle's CTE refs, so
    // the training rounds reference _w/_b columns and the generated code
    // is round-invariant — literal refs recompiled every round (r13)
    val colRefs = Refs(
      IndexedSeq.tabulate(h, d)((k, j) => s"_w${k}_$j"),
      IndexedSeq.tabulate(h)(k => s"_b1_$k"),
      IndexedSeq.tabulate(d)(j => s"_b2_$j"))
    def params: Seq[(String, Double)] =
      (for (k <- 0 until h; j <- 0 until d)
        yield s"_w${k}_$j" -> w(k)(j)) ++
        (0 until h).map(k => s"_b1_$k" -> b1(k)) ++
        (0 until d).map(j => s"_b2_$j" -> b2(j))
    var round = 0
    while (round < rounds) {
      val ex = exprs(d, h, colRefs)
      val frame = withSteps(scaled.crossJoin(broadcast(
        graft.core.paramRow(data.sparkSession, params))), stepKeys(ex), ex)
      val gradKeys = (for (k <- 0 until h; j <- 0 until d)
        yield s"gw${k}_$j") ++
        (0 until h).map(k => s"gb1_$k") ++ (0 until d).map(j => s"gb2_$j")
      val aggs = gradKeys.map(g => sum(fp8(expr(ex(g)))).as(g)) :+
        count(lit(1)).as("_n")
      val r = frame.agg(aggs.head, aggs.tail: _*).head()
      val n = r.getLong(gradKeys.size).toDouble
      def g(i: Int): Double =
        Option(r.getDecimal(i)).map(_.doubleValue() / 1e8).getOrElse(0.0)
      var gi = 0
      for (k <- 0 until h; j <- 0 until d) {
        w(k)(j) = r6(w(k)(j) - lr * (g(gi) / n)); gi += 1
      }
      (0 until h).foreach { k =>
        b1(k) = r6(b1(k) - lr * (g(gi) / n)); gi += 1
      }
      (0 until d).foreach { j =>
        b2(j) = r6(b2(j) - lr * (g(gi) / n)); gi += 1
      }
      round += 1
    }

    val ex = exprs(d, h, litRefs)
    val scoreKeys = (0 until h).map(k => s"z$k") ++
      (0 until h).map(k => s"a$k") ++ (0 until d).map(j => s"xh$j") ++
      (0 until d).map(j => s"e$j")
    val scored = withSteps(scaled, scoreKeys, ex)
      .withColumn("score", expr(ex("sse")))
      .withColumn("tag",
        when(col("score") > threshold, lit("O")).otherwise(lit("N")))
    scored.select(idCols.map(col) :+ col("score") :+ col("tag"): _*)
  }
}
