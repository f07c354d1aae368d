package graft

import graft.streaming.StreamScorers
import graft.streaming.StreamScorers.{SeqEvent, TypedEvent, ValueEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Checkpoint-restart sweep across the GroupState streaming family
  * (r11 verdict item 5): every stateful stream must resume from its
  * checkpoint with per-key state INTACT under the RocksDB provider —
  * each test stops the query, starts a brand-new instance from the same
  * checkpoint, and asserts a post-restart output that is only possible
  * if pre-restart state survived (a cumulative count, a full window, a
  * funnel step taken before the restart). */
class RestartSweepSpec extends SparkSpec {

  private lazy val rocks = {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  private def usedRocksDb(q: org.apache.spark.sql.streaming.StreamingQuery): Boolean = {
    val ops = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
    ops.exists { op =>
      val it = op.customMetrics.keySet().iterator()
      var found = false
      while (it.hasNext && !found) found = it.next().toLowerCase.contains("rocksdb")
      found
    }
  }

  /** Start → feed pre → stop → feed post → NEW query from the same
    * checkpoint → read the parquet sink. */
  private def runWithRestart(
      start: (String, String) => org.apache.spark.sql.streaming.StreamingQuery,
      pre: () => Unit, post: () => Unit): (org.apache.spark.sql.DataFrame, Boolean) = {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rsw_ck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_rsw_out").toString
    pre()
    val q1 = start(outDir, ckpt)
    q1.processAllAvailable()
    val rocksOk = usedRocksDb(q1)
    q1.stop()
    post()
    val q2 = start(outDir, ckpt)
    q2.processAllAvailable()
    q2.stop()
    (rocks.read.parquet(outDir), rocksOk)
  }

  test("markovStream: sliding window state survives a restart (RocksDB)") {
    val s = rocks
    import s.implicits._
    implicit val sc = s.sqlContext
    val trans = Map(("A", "B") -> 0.9, ("B", "A") -> 0.9, ("A", "A") -> 0.05,
      ("B", "B") -> 0.05, ("B", "C") -> 0.05, ("A", "C") -> 0.05)
    val in = MemoryStream[SeqEvent]
    val (out, rocksOk) = runWithRestart(
      (p, c) => StreamScorers.markovStream(in.toDS(), trans, window = 2,
          threshold = 2.0)
        .writeStream.format("parquet").option("path", p)
        .option("checkpointLocation", c).outputMode("append").start(),
      () => in.addData(SeqEvent("e1", 1, "A"), SeqEvent("e1", 2, "B")),
      () => in.addData(SeqEvent("e1", 3, "A")))
    val rows = out.as[StreamScorers.SeqScore].collect().sortBy(_.seq)
    assert(rocksOk, "RocksDB provider not engaged")
    assert(rows.map(_.seq).toSeq == Seq(1L, 2L, 3L))
    // seq 3 scores over the FULL window [A,B] recovered from the
    // checkpoint: probable A→B→A path tags N; a lost window tags I
    assert(rows(0).tag == "I" && rows(1).tag == "I")
    assert(rows(2).tag == "N",
      s"post-restart event scored ${rows(2).tag} — window state lost")
  }

  test("psiStream: cumulative bin counts survive a restart (RocksDB)") {
    val s = rocks
    import s.implicits._
    implicit val sc = s.sqlContext
    val refDf = s.createDataFrame(
      (1 to 100).map(i => ("k", i.toDouble % 10))).toDF("key", "v")
    val ref = graft.drift.Drift.psiRefModel(refDf, "key", "v", nBins = 5)
    val in = MemoryStream[(String, Double)]
    val (out, rocksOk) = runWithRestart(
      (p, c) => StreamScorers.psiStream(in.toDF().toDF("key", "v"),
          "key", "v", ref, nBins = 5)
        .writeStream.format("parquet").option("path", p)
        .option("checkpointLocation", c).outputMode("append").start(),
      () => in.addData((1 to 5).map(i => ("k", i.toDouble)): _*),
      () => in.addData((6 to 10).map(i => ("k", i.toDouble)): _*))
    val ns = out.select("n").as[Long].collect().sorted
    assert(rocksOk, "RocksDB provider not engaged")
    assert(ns.toSeq == Seq(5L, 10L),
      s"expected cumulative n 5 then 10 across the restart, got ${ns.toSeq}")
  }

  test("adwinStream: adaptive window survives a restart (RocksDB)") {
    val s = rocks
    import s.implicits._
    implicit val sc = s.sqlContext
    val in = MemoryStream[ValueEvent]
    val (out, rocksOk) = runWithRestart(
      (p, c) => StreamScorers.adwinStream(in.toDS(), delta = 0.05, r = 10.0)
        .writeStream.format("parquet").option("path", p)
        .option("checkpointLocation", c).outputMode("append").start(),
      () => in.addData(ValueEvent("e1", 1, 5.0), ValueEvent("e1", 2, 5.0),
        ValueEvent("e1", 3, 5.0)),
      () => in.addData(ValueEvent("e1", 4, 5.0)))
    val rows = out.as[graft.drift.Drift.AdwinOut].collect().sortBy(_.seq)
    assert(rocksOk, "RocksDB provider not engaged")
    assert(rows.length == 4)
    // no drift in a constant series: the post-restart point's window
    // still starts at seq 1 — the pre-restart window was recovered
    assert(rows.last.seq == 4L && rows.last.winStart == 1L,
      s"post-restart window starts at ${rows.last.winStart} — state lost")
    assert(!rows.exists(_.drift))
  }

  test("funnelStream: step progress survives a restart (RocksDB)") {
    val s = rocks
    import s.implicits._
    implicit val sc = s.sqlContext
    val in = MemoryStream[TypedEvent]
    val (out, rocksOk) = runWithRestart(
      (p, c) => StreamScorers.funnelStream(in.toDS(), Seq("s1", "s2"))
        .writeStream.format("parquet").option("path", p)
        .option("checkpointLocation", c).outputMode("append").start(),
      () => in.addData(TypedEvent("u1", 1, "s1")),
      () => in.addData(TypedEvent("u1", 2, "s2")))
    val rows = out.as[StreamScorers.FunnelOut].collect().sortBy(_.step_idx)
    assert(rocksOk, "RocksDB provider not engaged")
    // step 2 completes only if the recovered state remembers step 1
    assert(rows.map(_.step).toSeq == Seq("s1", "s2"),
      s"funnel steps after restart: ${rows.map(_.step).toSeq} — state lost")
  }

  test("ddsketchStream: sketch counts survive a restart (RocksDB)") {
    val s = rocks
    import s.implicits._
    implicit val sc = s.sqlContext
    val in = MemoryStream[(String, Double)]
    val (out, rocksOk) = runWithRestart(
      (p, c) => StreamScorers.ddsketchStream(in.toDF().toDF("key", "v"),
          "key", "v", taus = Seq(0.5))
        .writeStream.format("parquet").option("path", p)
        .option("checkpointLocation", c).outputMode("append").start(),
      () => in.addData(("k", 1.0), ("k", 2.0), ("k", 3.0), ("k", 4.0)),
      () => in.addData(("k", 5.0)))
    val ns = out.select("n").as[Long].collect().sorted
    assert(rocksOk, "RocksDB provider not engaged")
    assert(ns.toSeq == Seq(4L, 5L),
      s"expected cumulative n 4 then 5 across the restart, got ${ns.toSeq}")
  }

  test("msprtStream: sequential-test state survives a restart (RocksDB)") {
    val s = rocks
    import s.implicits._
    implicit val sc = s.sqlContext
    val in = MemoryStream[(String, Long, Double, Double)]
    val (out, rocksOk) = runWithRestart(
      (p, c) => StreamScorers.msprtStream(
          in.toDF().toDF("key", "o", "a", "b"),
          "key", "o", "a", "b", sigma2 = 2.0, tau2 = 0.1)
        .writeStream.format("parquet").option("path", p)
        .option("checkpointLocation", c).outputMode("append").start(),
      () => in.addData(("k", 1L, 1.0, 1.5), ("k", 2L, 1.0, 1.4),
        ("k", 3L, 1.0, 1.6)),
      () => in.addData(("k", 4L, 1.0, 1.5)))
    val ts = out.select("t").as[Long].collect().sorted
    assert(rocksOk, "RocksDB provider not engaged")
    assert(ts.toSeq == Seq(1L, 2L, 3L, 4L),
      s"expected t to keep counting across the restart, got ${ts.toSeq}")
  }
}
