package graft

import graft.streaming.StreamScorers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming state at scale: the dedup operators under the RocksDB
  * state-store provider — the provider a large deploy runs (SCALING.md
  * §6), since the default HDFS-backed provider holds every entity's
  * state in executor heap maps while RocksDB spills to local disk.
  * A `newSession()` isolates the provider conf from the other specs
  * sharing the SparkContext. */
class RocksDbStateSpec extends SparkSpec {

  private lazy val rocks = {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  /** The provider actually engaged: RocksDB-specific custom metrics show
    * up on the query's state operators. */
  private def usedRocksDb(q: org.apache.spark.sql.streaming.StreamingQuery): Boolean = {
    val ops = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
    ops.exists { op =>
      val it = op.customMetrics.keySet().iterator()
      var found = false
      while (it.hasNext && !found) found = it.next().toLowerCase.contains("rocksdb")
      found
    }
  }

  test("exact dedup holds 100k-entity state in RocksDB across micro-batches") {
    val s = rocks
    import s.implicits._
    implicit val sc = s.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = StreamScorers.exactDedupStream(in.toDS().toDF("doc_id", "text"), "text")
    val q = out.writeStream.format("memory").queryName("rocks_ed")
      .outputMode("append").start()
    in.addData((0L until 100000L).map(i => (i, s"unique document body $i")): _*)
    q.processAllAvailable()
    val n1 = s.table("rocks_ed").count()
    // batch 2: 50k duplicates of batch-1 content + 1k genuinely new docs —
    // the dups must die against state persisted in batch 1
    in.addData(
      (0L until 50000L).map(i => (100000L + i, s"unique document body $i")) ++
        (0L until 1000L).map(i => (200000L + i, s"fresh content $i")): _*)
    q.processAllAvailable()
    val survivors = s.table("rocks_ed").select("doc_id").as[Long].collect()
    val rocksEngaged = usedRocksDb(q)
    q.stop()
    assert(n1 == 100000L)
    assert(survivors.length == 101000)
    assert(!survivors.exists(id => id >= 100000L && id < 200000L),
      "a cross-batch duplicate survived")
    assert(rocksEngaged, "state operators report no rocksdb metrics — provider not engaged")
  }

  test("LSH near-dup pairs a late twin with RocksDB-held bucket state") {
    val s = rocks
    import s.implicits._
    implicit val sc = s.sqlContext
    val in = MemoryStream[(Long, String)]
    val pairs = StreamScorers.nearDupStream(
      in.toDS().toDF("doc_id", "text"), "doc_id", "text",
      shingleSize = 3, numHashes = 16, bandSize = 4)
    val q = pairs.writeStream.format("memory").queryName("rocks_nd")
      .outputMode("append").start()
    // 2k docs with fully disjoint token streams (no shared shingles →
    // no batch-1 pairs); the twin arrives in a later batch so the hit
    // must come from persisted bucket state
    def body(i: Long) = (1 to 8).map(j => s"tok${i}x$j").mkString(" ")
    in.addData((1L to 2000L).map(i => (i, body(i))): _*)
    q.processAllAvailable()
    val before = s.table("rocks_nd").count()
    in.addData((9001L, body(42L)))
    q.processAllAvailable()
    val hits = s.table("rocks_nd").as[StreamScorers.PairHit].collect()
    val rocksEngaged = usedRocksDb(q)
    q.stop()
    assert(before == 0L)
    assert(hits.nonEmpty && hits.forall(h => h.a == 42L && h.b == 9001L))
    assert(rocksEngaged, "state operators report no rocksdb metrics — provider not engaged")
  }
}
