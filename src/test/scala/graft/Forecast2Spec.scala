package graft

import graft.seq.Forecast2
import org.apache.spark.sql.functions._

/** Theta / damped-Holt / Croston / Lomb–Scargle / seasonal-MK / ADF /
  * KPSS sanity on constructed series. */
class Forecast2Spec extends SparkSpec {
  import spark.implicits._

  private def spiky = (0 until 60).map { i =>
    ("a", i.toLong, if (i == 40) 500.0 else 2.0 * i + (if (i % 2 == 0) 1 else -1))
  }.toDF("k", "t", "v")

  test("theta + damped holt: the spike carries the max score") {
    for (scored <- Seq(
      Forecast2.thetaForecast(spiky, Seq("k"), "t", "v").toDF(),
      Forecast2.dampedHolt(spiky, Seq("k"), "t", "v").toDF())) {
      val rows = scored.orderBy("seq").collect()
      val top = rows.maxBy(_.getAs[Double]("score"))
      assert(top.getAs[Long]("seq") == 40L, s"spike should score max: $top")
      assert(top.getAs[Double]("score") > 10.0)
    }
  }

  test("croston: regular demand of 8 every 4 steps converges to rate 2") {
    val df = (0 until 80).map(i =>
      ("a", i.toLong, if (i % 4 == 3) 8.0 else 0.0)).toDF("k", "t", "v")
    val last = Forecast2.croston(df, Seq("k"), "t", "v").toDF()
      .orderBy(col("seq").desc).limit(1).collect()(0)
    assert(math.abs(last.getAs[Double]("score") - 2.0) < 0.1, s"$last")
  }

  test("lomb-scargle: a 7-day sinusoid peaks at period 7") {
    val ns = 86400000000000L
    val df = (0 until 200).map { i =>
      val t = i * ns / 4 + (i % 3) * ns / 16 // uneven sampling
      ("a", t, math.sin(2 * math.Pi * t / (7.0 * ns)) * 10.0)
    }.toDF("k", "ts", "v")
    val p = Forecast2.lombScargle(df, Seq("k"), "ts", "v", Seq(2, 3, 5, 7, 11))
      .collect().map(r => r.getAs[Int]("period") -> r.getAs[Double]("power")).toMap
    assert(p(7) > 3 * p(3), s"period-7 power should dominate: $p")
    assert(p(7) > 3 * p(11), s"period-7 power should dominate: $p")
  }

  test("seasonal MK: per-season monotone trend is detected") {
    val df = (0 until 280).map { i =>
      ("a", (i % 7).toLong, i.toLong, (i / 7).toDouble + (i % 7) * 100)
    }.toDF("k", "season", "t", "v")
    val r = Forecast2.seasonalMannKendall(df, Seq("k"), "season", "t", "v")
      .collect()(0)
    assert(r.getAs[Double]("z_stat") > 5.0, s"$r")
  }

  test("adf: stationary oscillation rejects a unit root, a ramp does not") {
    val osc = (0 until 300).map(i =>
      ("osc", i.toLong, (if (i % 2 == 0) 1.0 else -1.0) + 0.1 * (i % 5)))
    val ramp = (0 until 300).map(i => ("ramp", i.toLong, i.toDouble))
    val m = Forecast2.adfStat((osc ++ ramp).toDF("k", "t", "v"),
      Seq("k"), "t", "v")
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Double]("t_stat")).toMap
    assert(m("osc") < -10.0, s"oscillation: ${m("osc")}")
    assert(m("ramp") > -3.0, s"ramp should not strongly reject: ${m("ramp")}")
  }

  test("kpss: trending series scores far above a stationary one") {
    val osc = (0 until 300).map(i =>
      ("osc", i.toLong, if (i % 2 == 0) 1.0 else -1.0))
    val ramp = (0 until 300).map(i => ("ramp", i.toLong, i.toDouble))
    val m = Forecast2.kpss((osc ++ ramp).toDF("k", "t", "v"), Seq("k"), "t", "v")
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Double]("eta")).toMap
    assert(m("ramp") > 10 * m("osc"), s"$m")
  }
}
