package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Physical-layout planning operators (engine additions): at 100 TB the
  * dominant cost is often not the query but the LAYOUT the data was
  * written in — these compute the write-side keys/boundaries that make
  * later scans prunable.
  *
  *  - [[zOrderKey]]: Morton-interleave two bucket columns so a range
  *    predicate on EITHER dimension prunes files (the Z-order clustering
  *    trick of Delta/Iceberg OPTIMIZE, computed as a pure column).
  *  - [[zOrderLayout]]: assign rows to `numFiles` z-contiguous output
  *    files.
  *  - [[rangePlanner]]: exact rank-balanced range boundaries (the
  *    quantile cut points a range-partitioned write or a sort-merge
  *    bucketing scheme needs), with honest per-range row counts —
  *    duplicate boundaries under heavy ties surface as empty ranges
  *    instead of being papered over.
  *
  * Determinism: the Morton spread is integer bit arithmetic; planner
  * boundaries are exact order statistics over the 4dp fixed-point value
  * histogram. Scale: zOrderKey is per-row codegen arithmetic (no
  * exchange); rangePlanner aggregates to the distinct-value histogram
  * first, so its one cumulative window runs over value cardinality,
  * never the data (the binaryAuc device). */
object Layout {

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative integer columns: bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1. Classic magic-mask spread on 64-bit lanes —
    * five shift-or-mask rounds, all codegen-friendly integer ops. */
  def zOrderKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits in [1,31]: $bits")
    val keep = (1L << bits) - 1
    def spread(x: Column): Column = {
      val m = Seq(0x0000FFFF0000FFFFL, 0x00FF00FF00FF00FFL,
        0x0F0F0F0F0F0F0F0FL, 0x3333333333333333L, 0x5555555555555555L)
      val shifts = Seq(16, 8, 4, 2, 1)
      m.zip(shifts).foldLeft(x.cast("long").bitwiseAND(lit(keep))) {
        case (v, (mask, s)) =>
          v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(mask))
      }
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Z-order file assignment: zkey plus the z-contiguous output file id
    * floor(zkey·numFiles / 4^bits). A write path would
    * repartition("file_id") and sortWithinPartitions("zkey"); this
    * returns the plan columns so the assignment itself is testable. */
  def zOrderLayout(data: DataFrame, aCol: Column, bCol: Column, bits: Int,
      numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles >= 1: $numFiles")
    val z = zOrderKey(aCol, bCol, bits)
    data
      .withColumn("zkey", z)
      .withColumn("file_id",
        shiftright(col("zkey") * numFiles, 2 * bits))
  }

  /** Rendezvous (highest-random-weight) assignment: each row goes to the
    * node with the maximum md5-derived weight hash56(node ":" id) — the
    * stable shard router: adding or removing one node moves ONLY that
    * node's keys (~1/N of the data), where modulo hashing reshuffles
    * almost everything. The routing layer a 100 TB incremental-ingest
    * pipeline puts in front of its shards.
    *
    * Determinism: the hash56 device (md5 hex prefix → 56-bit int) on
    * both engines; ties are broken by the struct ordering's node field
    * (and are md5-collision improbable). Scale: a pure per-row column
    * expression over a literal node list — no exchange, no state. */
  def rendezvous(data: DataFrame, idCol: String, nodes: Seq[String])
      : DataFrame = {
    require(nodes.nonEmpty, "rendezvous needs at least one node")
    val arr = array(nodes.map(nd =>
      struct(graft.text.TextOps.hash56(
        concat(lit(nd), lit(":"), col(idCol).cast("string"))).as("h"),
        lit(nd).as("node"))): _*)
    data.withColumn("node", array_max(arr).getField("node"))
  }

  /** Rank-balanced range-partition boundaries over `valCol`: boundary i
    * (1..P−1) is the exact value at ascending rank ⌊i·n/P⌋; a row with
    * value v belongs to partition #{boundaries < v} (ties stay low).
    * Output: one row per partition id with (lo, hi, n_rows) — lo/hi are
    * the min/max DISTINCT VALUES the partition actually holds (null for
    * an empty partition, which heavy ties genuinely produce). */
  def rangePlanner(data: DataFrame, valCol: String, numPartitions: Int)
      : DataFrame = {
    require(numPartitions >= 2, s"numPartitions >= 2: $numPartitions")
    val v = col(valCol).cast("double")
    val vh = data.where(v.isNotNull)
      .groupBy(graft.core.fixedPointLong(v, 4).as("_fp"))
      .agg(count(lit(1)).as("_ct"))
    // banded prefix sum over the 4dp histogram (the binaryAuc device);
    // the total is a broadcast scalar, not an unbounded-frame window
    val tot = vh.agg(sum(col("_ct")).as("_n"))
    val cum = graft.core.bandedCumSum(vh, expr("_fp div 100000"),
        bandAsc = true, tie = Seq(col("_fp").asc),
        sums = Map("_ct" -> "_cum"))
      .crossJoin(broadcast(tot))
    val spark = data.sparkSession
    import spark.implicits._
    val pids = broadcast((1 until numPartitions).map(_.toLong).toDF("_i"))
    // boundary i = value whose cumulative range covers rank floor(i*n/P)
    val bounds = cum.crossJoin(pids)
      .withColumn("_r", floor(col("_i") * col("_n") /
        lit(numPartitions.toLong)).cast("long"))
      .where(col("_cum") - col("_ct") < col("_r") &&
        col("_r") <= col("_cum"))
      .agg(sort_array(collect_list(col("_fp"))).as("_bs"))
    // pid(v) = #boundaries strictly below v; empty ranges stay visible
    val assigned = cum.crossJoin(broadcast(bounds))
      .withColumn("pid",
        size(filter(col("_bs"), x => x < col("_fp"))).cast("long"))
      .groupBy(col("pid"))
      .agg(min(col("_fp")).cast("double").divide(1e4).as("lo"),
        max(col("_fp")).cast("double").divide(1e4).as("hi"),
        sum(col("_ct")).as("n_rows"))
    val allPids = broadcast((0 until numPartitions).map(_.toLong)
      .toDF("pid"))
    allPids.join(assigned, Seq("pid"), "left")
      .withColumn("n_rows", coalesce(col("n_rows"), lit(0L)))
  }
}
