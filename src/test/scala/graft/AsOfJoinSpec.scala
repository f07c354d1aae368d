package graft

import graft.seq.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks latest right row at-or-before each left ts") {
    val left = Seq(("k", 5L, "e1"), ("k", 10L, "e2"), ("k", 15L, "e3"),
      ("k", 2L, "e0"), ("j", 10L, "j1"))
      .toDF("key", "ts", "ev")
    val right = Seq(("k", 3L, 30.0), ("k", 10L, 100.0), ("j", 20L, 7.0))
      .toDF("key", "ts", "model")
    val out = AsOfJoin.asOf(left, right, Seq("key"), "ts", Seq("model"))
      .collect().map(r => r.getAs[String]("ev") ->
        Option(r.getAs[Any]("model")).map(_.asInstanceOf[Double])).toMap
    assert(out("e0").isEmpty)            // before first snapshot
    assert(out("e1").contains(30.0))     // 3 <= 5
    assert(out("e2").contains(100.0))    // exact-ts match wins
    assert(out("e3").contains(100.0))    // carried forward
    assert(out("j1").isEmpty)            // right side only has a later snapshot
  }
}
