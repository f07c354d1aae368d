package graft.seq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SAX — symbolic aggregate approximation (Lin, Keogh et al. 2003): the
  * bridge from numeric series to the reference's SYMBOL family. The
  * reference scores symbol sequences (Markov chains,
  * seq/MarkovChainPredictor.scala; n-gram frequency); SAX is how a raw
  * float series becomes such a sequence: z-normalize per key, compress
  * w points per frame to their mean (PAA), then bucket each mean by the
  * standard-normal equiprobable breakpoints β_i = probit(i/a) so every
  * letter is equally likely under a gaussian — after which the existing
  * markovScore / multigram / motif operators apply unchanged.
  *
  * Determinism: per-key mean/sd are double finishes over exact 4dp
  * fixed-point sums; z is frozen to 6dp before the PAA sum, so each
  * frame mean is a ratio of exact integers; breakpoints ride the shared
  * Acklam probit (identical arithmetic on both engines); the letter is
  * a pure comparison count.
  *
  * Scale: one shuffle on the keys (stats, rank window and frame
  * aggregate all ride it); output is n/w rows. The trailing partial
  * frame is emitted with its true n_pts (callers drop it if they need
  * fixed-length words). */
object Symbolic {

  def sax(data: DataFrame, keyCols: Seq[String], seqCol: String,
      valCol: String, frameSize: Int, alphabet: Int): DataFrame = {
    require(frameSize >= 1, s"frameSize >= 1: $frameSize")
    require(alphabet >= 2 && alphabet <= 20, s"alphabet in [2,20]: $alphabet")
    val v = col(valCol).cast("double")
    val keyed = data.where(v.isNotNull)
      .withColumn("_fp", graft.core.fixedPointLong(v, 4))
    val st = keyed.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("decimal(38,0)").as("_n"),
        sum(col("_fp").cast("decimal(38,0)")).as("_s"),
        sum((col("_fp").cast("decimal(38,0)") *
          col("_fp").cast("decimal(38,0)")).cast("decimal(38,0)")).as("_q"))
    val nD = col("_n").cast("double")
    val mean = col("_s").cast("double") / nD / 1e4
    val sd = sqrt((col("_q").cast("double") -
      col("_s").cast("double") * col("_s").cast("double") / nD) /
      (nD - 1)) / 1e4
    val model = st.where(col("_n") > 1)
      .select(keyCols.map(col) :+ mean.as("_mu") :+ sd.as("_sd"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).asc)
    val z = (v - col("_mu")) / col("_sd")
    val frames = keyed.join(broadcast(model), keyCols)
      .withColumn("_i", row_number().over(w).cast("long"))
      .withColumn("frame",
        floor((col("_i") - 1) / lit(frameSize)).cast("long"))
      .withColumn("_z6", graft.core.fixedPointLong(z, 6))
      .groupBy((keyCols.map(col) :+ col("frame")): _*)
      .agg(count(lit(1)).as("n_pts"), sum(col("_z6")).as("_zs"))
      .withColumn("paa",
        col("_zs").cast("double") / col("n_pts") / 1e6)
    val sym = (1 until alphabet).map { i =>
      when(col("paa") > graft.post.PostOps.probit(
        lit(i.toDouble / alphabet)), 1).otherwise(0)
    }.reduce(_ + _)
    frames
      .withColumn("sym", sym.cast("long"))
      .withColumn("letter",
        expr("substr('abcdefghijklmnopqrst', CAST(sym AS INT) + 1, 1)"))
      .drop("_zs")
  }
}
