package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at cluster scale.
  *
  * AQE's skew-join splitting handles joins; heavy *aggregations* over a
  * skewed key (one entity owning a large share of 100 TB) still route the
  * whole key through one task. `saltedAgg` runs the classic two-phase
  * form: partial aggregate over (key, salt) — fan-out `salts` tasks per
  * key — then merge partials per key. Only algebraic aggregates (sum,
  * count, min, max, and avg via sum/count) compose this way. */
object Skew {

  case class Algebraic(name: String, partial: Column => Column, merge: Column => Column)

  def sumOf(c: String) = Algebraic(s"sum_$c", _ => sum(col(c)), p => sum(p))
  def countAll = Algebraic("cnt", _ => count(lit(1)), p => sum(p))
  def minOf(c: String) = Algebraic(s"min_$c", _ => min(col(c)), p => min(p))
  def maxOf(c: String) = Algebraic(s"max_$c", _ => max(col(c)), p => max(p))

  /** Two-phase salted aggregation: groupBy(key, salt).agg(partials) →
    * groupBy(key).agg(merges). Result equals a direct groupBy for the
    * supported algebraic aggregates, with per-key parallelism = `salts`. */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], salts: Int,
      aggs: Seq[Algebraic]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val partials = salted
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(aggs.head.partial(col("_salt")).as(aggs.head.name),
        aggs.tail.map(a => a.partial(col("_salt")).as(a.name)): _*)
    partials
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head.merge(col(aggs.head.name)).as(aggs.head.name),
        aggs.tail.map(a => a.merge(col(a.name)).as(a.name)): _*)
  }

  /** Salted average: exact via salted sum + count. */
  def saltedAvg(df: DataFrame, keyCols: Seq[String], valCol: String,
      salts: Int): DataFrame =
    saltedAgg(df, keyCols, salts, Seq(sumOf(valCol), countAll))
      .withColumn(s"avg_$valCol", col(s"sum_$valCol") / col("cnt"))

  /** Key-skew profiler — the measurement that decides between a plain
    * groupBy/join, AQE skew splitting, and [[saltedAgg]]/[[saltedJoin]].
    * Per-key counts reduce to one exchange with map-side combine; the
    * global stats (total, key count, mean key size) ride a single-row
    * cross join, and the top-N heavy keys are a window rank (capped via
    * WindowGroupLimit — no full sort of the key histogram). `saltsRec`
    * encodes the salting rule of thumb: fan a key out over
    * ceil(cnt/avg) tasks once it exceeds `skewThreshold`× the mean key
    * size, else leave it alone (salts = 1).
    * Output: key..., cnt, share, skew (= cnt/avg), saltsRec — top-N keys
    * by cnt (ties broken by key) plus the per-key metrics. */
  def skewProfile(df: DataFrame, keyCols: Seq[String], topN: Int,
      skewThreshold: Double = 2.0): DataFrame = {
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum("cnt").as("_total"),
      count(lit(1)).as("_nkeys"))
    // orderBy+limit compiles to TakeOrderedAndProject — a distributed
    // per-partition top-N + driver merge of N·numPartitions rows, never a
    // global sort or a one-task window over the (billion-key) histogram
    counts
      .orderBy(col("cnt").desc +: keyCols.map(col(_).asc): _*)
      .limit(topN)
      .crossJoin(broadcast(totals))
      .withColumn("share", col("cnt") / col("_total"))
      // cnt/(total/nkeys), not cnt·nkeys/total: the product overflows
      // long once cnt·nkeys passes 2^63 (plausible at 100 TB key counts)
      .withColumn("skew", col("cnt") / (col("_total") / col("_nkeys")))
      .withColumn("saltsRec",
        when(col("skew") > skewThreshold, ceil(col("skew")).cast("long"))
          .otherwise(lit(1L)))
      .drop("_rnk", "_total", "_nkeys")
  }

  /** Salted equi-join for a skewed big side when the small side is too
    * large to broadcast: every big-side row gets a random salt in
    * [0, salts), the small side is replicated `salts` times, and the join
    * keys on (key..., salt) — a hot key's rows spread over `salts` tasks
    * instead of one. Exact same rows as `big.join(small, keys, "inner"/
    * "left")`. Shuffle cost: small side × salts (choose salts ≈ hot-key
    * share ÷ task budget; AQE's skew splitting covers moderate skew — this
    * is for the pathological single-entity case). */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCols: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    val spark = big.sparkSession
    import spark.implicits._
    val saltedBig = big.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).cast("int"))
    val replicated = small.crossJoin(
      (0 until salts).toDF("_salt"))
    saltedBig.join(replicated, keyCols :+ "_salt", joinType).drop("_salt")
  }
}
