package graft

import graft.drift.Drift
import graft.pipeline.{ConfigRunner, Pipeline}
import graft.score.Scorers
import graft.score.Scorers.Cfg
import graft.sources.Sources
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("json schema loader maps the reference's RichAttributeSchema") {
    val json =
      """{"fields":[
        |{"name":"serverId","ordinal":0,"dataType":"string","id":true},
        |{"name":"usage","ordinal":2,"dataType":"double","bucketWidth":5.0},
        |{"name":"ts","ordinal":1,"dataType":"long"}]}""".stripMargin
    val st = Sources.toStructType(Sources.parseSchema(json))
    assert(st.fieldNames.toSeq == Seq("serverId", "ts", "usage")) // ordinal order
    assert(st("serverId").metadata.getBoolean("id"))
    assert(st("usage").metadata.getDouble("bucketWidth") == 5.0)
    assert(st("ts").dataType.typeName == "long")
  }

  test("config runner maps reference property vocabulary to the zscore op") {
    val data = core.table(spark, sfDir, "events")
      .select("event_type", "value") // ordinals: 0=event_type, 1=value
    val conf = ConfigRunner.fromProperties(
      """# reference-style job config
        |predictor.model=zscore
        |id.fieldOrdinals=[0]
        |attr.ordinals=[1]
        |score.threshold=2.0
        |""".stripMargin)
    val out = ConfigRunner.run(spark, data, conf)
    assert(out.columns.contains("score") && out.columns.contains("tag"))
    assert(out.where($"tag" === "O").count() > 0)
  }

  test("runJob dispatches every reference spark job class with its own property names") {
    val events = core.table(spark, sfDir, "events")
      .select("event_type", "event_id", "value") // 0=key, 1=seq, 2=value
    def props(s: String) = ConfigRunner.fromProperties(s.stripMargin)
    // sequence detectors: output matches the direct operator call
    val cp = ConfigRunner.runJob(spark, events, "changePointDetector",
      props("""id.fieldOrdinals=[0]
              |seq.fieldOrd=1
              |attr.ordinals=[2]
              |window.size=20
              |stat.type=ks
              |stat.critValue=0.4"""))
    val cpDirect = graft.seq.SeriesKernels.changePoint(events, Seq("event_type"),
      "event_id", "value", window = 20, stat = "ks", critValue = 0.4).toDF()
    assert(cp.count() == cpDirect.count() && cp.count() > 0)
    // isolation forest: full fit+score from one property map
    val iso = ConfigRunner.runJob(spark, events, "isolationForestPredictor",
      props("""id.fieldOrdinals=[0]
              |rec.idOrd=1
              |attr.ordinals=[2]
              |num.tree=10
              |subsample.size=32
              |max.depth=5"""))
    assert(iso.count() == events.count())
    assert(iso.columns.contains("score"))
    // range predictor takes the range model the reference loads from a file
    val ranges = Seq(("A", "value", 0.0, 50.0)).toDF("event_type", "attr", "lo", "hi")
    val dataA = events.where($"event_type" === "A")
    val rng = ConfigRunner.runJob(spark, dataA, "outRangeBasedPredictor",
      props("""id.fieldOrdinals=[0]
              |attr.ordinals=[2]
              |score.threshold=0.5"""), model = Some(ranges))
    assert(rng.columns.contains("score") && rng.count() == dataA.count())
    // local density: blocked exact kNN under the reference's knn keys
    val dens = ConfigRunner.runJob(spark, events.limit(200),
      "localDensityBasedPredictor",
      props("""id.fieldOrdinals=[1]
              |attr.ordinals=[2]
              |nearest.neighbor.count=5"""))
    assert(dens.count() == 200)
    // post-processing jobs ride the same dispatch
    val tagged = ConfigRunner.runJob(spark, events, "statsBasedOutlierPredictor",
      props("""predictor.model=zscore
              |id.fieldOrdinals=[0]
              |attr.ordinals=[2]
              |score.threshold=2.0"""))
    val counts = ConfigRunner.runJob(spark, tagged, "outlierCounter",
      props("id.fieldOrdinals=[0]"))
    assert(counts.columns.contains("pctO") && counts.count() > 0)
    val spectral = ConfigRunner.runJob(spark, events, "spectralResiduePredictor",
      props("""id.fieldOrdinals=[0]
              |seq.fieldOrd=1
              |attr.ordinals=[2]
              |window.size=64"""))
    assert(spectral.count() > 0)
  }

  test("config runner covers every reference dispatcher strategy") {
    val data = core.table(spark, sfDir, "events")
      .selectExpr("event_type", "value", "value * 0.5 + user_id % 7 as value2")
    // StatsBasedOutlierPredictor.scala:48-56 strategy names (ref spelling)
    val strategies = Seq(
      "zscore", "robustZscore", "extremeValueProbablity",
      "interPercentileDifference", "estimatedProbablity",
      "estimatedAttributeProbablity", "estimatedCumProbablity",
      "estimatedMetaProbablity", "mahalanobisDistance")
    strategies.foreach { m =>
      val conf = ConfigRunner.fromProperties(
        s"""predictor.model=$m
           |id.fieldOrdinals=[0]
           |attr.ordinals=[1,2]
           |bucket.width=10.0
           |score.threshold=0.5
           |""".stripMargin)
      val out = ConfigRunner.run(spark, data, conf)
      assert(out.columns.contains("score") && out.columns.contains("tag"), m)
      assert(out.limit(5).count() > 0, m)
    }
  }

  test("config runner dispatches the markov sequence job") {
    val data = core.table(spark, sfDir, "events")
      .select("user_id", "event_id", "event_type") // 0=key, 1=seq, 2=state
    val conf = ConfigRunner.fromProperties(
      """predictor.model=markovChainProb
        |id.fieldOrdinals=[0]
        |seq.fieldOrd=1
        |state.fieldOrd=2
        |window.size=3
        |score.threshold=5.0
        |""".stripMargin)
    val out = ConfigRunner.runSequence(spark, data, conf)
    assert(out.columns.contains("score") && out.columns.contains("tag"))
    assert(out.limit(5).count() > 0)
  }

  test("zscore pipeline composes fit/score/filter/count without file handoffs") {
    val data = core.table(spark, sfDir, "events")
    val r = Pipeline.zscorePipeline(data, Seq("event_type"), Seq("value"), 2.0)
    val n = data.count()
    assert(r.outliers.count() + r.clean.count() == n)
    assert(r.counts.agg(sum("total")).head().getLong(0) == n)
  }

  test("checkpoint filter drops rows below per-key checkpoint") {
    val data = Seq(("a", 1L), ("a", 5L), ("b", 1L), ("c", 9L)).toDF("k", "seq")
    val ck = Seq(("a", 3L)).toDF("k", "chkpt")
    val out = Pipeline.checkpointFilter(data, ck, Seq("k"), "seq")
      .select("k", "seq").as[(String, Long)].collect().toSet
    assert(out == Set(("a", 5L), ("b", 1L), ("c", 9L)))
  }

  test("ddm flags drift after an error burst") {
    val rows = ((1 to 200).map(i => ("k", i.toLong, 0)) ++
      (201 to 260).map(i => ("k", i.toLong, 1))).toDF("k", "seq", "err")
    val out = Drift.ddm(rows, Seq("k"), "seq", "err")
    val levels = out.orderBy("seq").select("level").as[String].collect()
    assert(levels.take(200).forall(_ == "stable"))
    assert(levels.drop(210).exists(_ == "drift"))
  }

  test("cusum alarms on a mean shift, quiet on the stable prefix; matches the max(0,·) recursion") {
    // stable at 10, then a +1.5σ-ish shift at row 301
    val vals = (1 to 300).map(i => 10.0 + (i % 7 - 3) * 0.1) ++
      (301 to 400).map(i => 11.0 + (i % 7 - 3) * 0.1)
    val rows = vals.zipWithIndex.map { case (v, i) => ("k", (i + 1).toLong, v) }
      .toDF("k", "seq", "v")
    val out = Drift.cusum(rows, Seq("k"), "seq", "v",
      warmup = 100, slack = 0.5, h = 5.0)
      .orderBy("seq").select("gPos", "gNeg", "alarm")
      .as[(Double, Double, Boolean)].collect()
    assert(out.take(300).forall(!_._3), "no alarm before the shift")
    assert(out.drop(310).exists(_._3), "alarm after the shift")
    // the closed form equals the INTEGER max(0,·) recursion EXACTLY (the
    // operator's defined arithmetic: 6dp fixed-point terms), and stays
    // within the accumulated quantization bound of the float textbook
    // recursion
    def r6(x: Double): Double = graft.text.TextOps.round6(x)
    val mu0 = r6(vals.take(100).sum / 100)
    val m2 = vals.take(100).map(v => (v - vals.take(100).sum / 100)).map(d => d * d).sum
    val sd0 = r6(math.sqrt(m2 / 99))
    var gpL = 0L
    var gpF = 0.0
    vals.zip(out).zipWithIndex.foreach { case ((v, (gPos, _, _)), i) =>
      val z = (v - mu0) / math.max(sd0, 1e-9)
      val t = z - 0.5
      gpL = math.max(0L, gpL + (if (t >= 0) math.floor(t * 1e6 + 0.5)
        else -math.floor(-t * 1e6 + 0.5)).toLong)
      gpF = math.max(0.0, gpF + t)
      assert(gpL / 1e6 == gPos, s"row $i: int recursion ${gpL / 1e6} vs closed form $gPos")
      assert(math.abs(gpF - gPos) < (i + 1) * 1e-6,
        s"row $i: float recursion $gpF vs $gPos drifted past the quantization bound")
    }
  }

  test("page-hinkley drifts on an upward shift, quiet on stable data") {
    val stable = (1 to 400).map(i => ("k", i.toLong, 10.0 + (i % 5 - 2) * 0.1))
    val quiet = Drift.pageHinkley(stable.toDF("k", "seq", "v"),
      Seq("k"), "seq", "v", delta = 0.005, lambda = 50.0)
    assert(quiet.where(col("drift")).count() == 0)
    val shifted = stable ++ (401 to 600).map(i => ("k", i.toLong, 13.0 + (i % 5 - 2) * 0.1))
    val out = Drift.pageHinkley(shifted.toDF("k", "seq", "v"),
      Seq("k"), "seq", "v", delta = 0.005, lambda = 50.0)
    assert(out.where(col("drift") && col("seq") > 400).count() > 0)
    assert(out.where(col("drift") && col("seq") <= 400).count() == 0)
  }

  test("local density drift flags the shifted region, quiet on identical samples") {
    import graft.drift.Drift
    val ref = (1 to 2000).map(i => (i % 100).toDouble).toDF("v")
    val shifted = (1 to 2000).map(i => (i % 100).toDouble + 50.0).toDF("v")
    val d = Drift.localDensityDrift(ref, shifted, Seq("v"), Seq(10.0), 0.01)
      .collect().map(r => r.getAs[String]("cell") -> r.getAs[Boolean]("drift")).toMap
    assert(d.values.exists(identity)) // mass moved between cells
    assert(d("0") && d("14"))         // ref-only and cur-only extremes drifted
    val same = Drift.localDensityDrift(ref, ref, Seq("v"), Seq(10.0), 0.01)
      .collect()
    assert(same.forall(!_.getAs[Boolean]("drift"))) // identical → no drift
  }

  test("energy distance: ~0 on identical distributions, large on a shift") {
    val rnd = new scala.util.Random(11)
    def sample(shift: Double, ids: Range) = ids.map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat + shift.toFloat)))
      .toDF("vec_id", "embedding")
    val a = sample(0.0, 0 until 300)
    val same = sample(0.0, 1000 until 1300)
    val far = sample(3.0, 2000 until 2300)
    def energy(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      Drift.embeddingEnergyDistance(x, y, "embedding").head().getAs[Double]("energy")
    val e0 = energy(a, same)
    val e1 = energy(a, far)
    assert(e0 >= -1e-9 && e0 < 0.5, s"same-dist energy $e0 should be ~0")
    assert(e1 > 10 * math.max(e0, 1e-3), s"shifted energy $e1 should dominate $e0")
    // the bounded-sample path is deterministic and reports sampled sizes
    val r = Drift.embeddingEnergyDistance(a, far, "embedding",
      idCol = "vec_id", maxSample = 100).head()
    assert(r.getAs[Long]("n") == 100 && r.getAs[Long]("m") == 100)
    val r2 = Drift.embeddingEnergyDistance(a, far, "embedding",
      idCol = "vec_id", maxSample = 100).head()
    assert(r.getAs[Double]("energy") == r2.getAs[Double]("energy"))
  }

  test("ewma drift detects a level change, none on stationary series") {
    val rows = ((1 to 100).map(i => ("k", i.toLong, 10.0 + (i % 3))) ++
      (101 to 140).map(i => ("k", i.toLong, 25.0))).toDF("k", "seq", "v")
    val out = Drift.ewmaDrift(rows, Seq("k"), "seq", "v", 0.2, 3.0).collect().sortBy(_.seq)
    assert(!out.take(100).exists(_.drift))
    assert(out.drop(105).exists(_.drift))
  }

  test("stats model roundtrips through the reference flat-file layout") {
    val data = core.table(spark, sfDir, "events")
    val fitted = graft.model.Fitters.stats(data, Seq("event_type"), Seq("value"))
    val dir = java.nio.file.Files.createTempDirectory("statsrt").toString + "/m"
    Sources.writeStatsModel(fitted, dir, Seq("event_type"), attrOrd = 2)
    val back = Sources.readStatsModel(spark, dir, Seq("event_type"), "value")
    val exp = fitted.collect().map(r => r.getAs[String]("event_type") ->
      (r.getAs[Double]("mean"), r.getAs[Double]("std"))).toMap
    val got = back.collect().map(r => r.getAs[String]("event_type") ->
      (r.getAs[Double]("mean"), r.getAs[Double]("std"))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (k, (m, s)) =>
      assert(math.abs(got(k)._1 - m) < 1e-9 && math.abs(got(k)._2 - s) < 1e-9, k)
    }
  }

  test("stats model file reader parses the reference layout") {
    val dir = java.nio.file.Files.createTempDirectory("statsmodel").toFile
    val f = new java.io.File(dir, "stats.txt")
    // key, fieldOrd, count, sum, sumSq, mean, variance, stddev
    // (mean at keyLen+4, stddev at keyLen+6 — StatsBasedOutlierPredictor.scala:116-120)
    java.nio.file.Files.writeString(f.toPath,
      "srv1,3,100,5000,260000,50.0,156.25,12.5\nsrv2,3,100,3000,95000,30.0,64.0,8.0\n")
    val m = Sources.readStatsModel(spark, f.getAbsolutePath, Seq("serverId"), "usage")
    val byKey = m.collect().map(r => r.getAs[String]("serverId") ->
      (r.getAs[Double]("mean"), r.getAs[Double]("std"))).toMap
    assert(byKey("srv1") == (50.0, 12.5))
    assert(byKey("srv2") == (30.0, 8.0))
  }

  test("json props extraction: typed fields hoisted, malformed bag yields nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 7, "tag": "x"}"""),
      (2L, """{"k": 9}"""),
      (3L, "not json at all")).toDF("id", "props")
    val out = Sources.jsonProps(df, "props", "k INT, tag STRING").collect()
      .map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[Integer]("k")), Option(r.getAs[String]("tag")))).toMap
    assert(out(1L) == (Some(7), Some("x")))
    assert(out(2L) == (Some(9), None))
    assert(out(3L) == (None, None))
  }

  test("numericalAttrStats job: seasonal fit extends the key per and.conf") {
    val ev = core.table(spark, sfDir, "events")
      .select("event_type", "ts", "value") // ordinals: 0=key, 1=time, 2=attr
    val conf = ConfigRunner.fromProperties(
      """id.fieldOrdinals=[0]
        |attr.ordinals=[2]
        |seasonal.analysis=true
        |seasonal.cycleType=["weekDayOrWeekendOfWeek"]
        |time.fieldOrdinal=1
        |time.unit=nanos""".stripMargin)
    val model = ConfigRunner.runJob(spark, ev, "numericalAttrStats", conf)
    val rows = model.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("cycleType") == "weekDayOrWeekendOfWeek"))
    assert(rows.map(_.getAs[Long]("cycleIndex")).toSet.subsetOf(Set(0L, 1L)))
    // the seasonal slice stats must equal a direct fit of that slice
    val direct = graft.model.Fitters.stats(
      core.Seasonal.withCycle(ev, "ts", "weekDayOrWeekendOfWeek", "nanos")
        .where(col("cycleIndex") === 0L),
      Seq("event_type", "cycleType", "cycleIndex"), Seq("value"))
      .collect().map(_.toSeq).toSet
    assert(rows.filter(_.getAs[Long]("cycleIndex") == 0L)
      .map(_.toSeq).toSet == direct)
    // without the flag: plain keyed stats, no cycle columns
    val plain = ConfigRunner.runJob(spark, ev, "numericalAttrStats",
      ConfigRunner.fromProperties("id.fieldOrdinals=[0]\nattr.ordinals=[2]"))
    assert(!plain.columns.contains("cycleIndex"))
    assert(plain.count() > 0)
    // and the PREDICTOR side of and.conf: the same seasonal key extension
    // at scoring time — each record scores against its regime's model,
    // equal to a manual per-cycle zscore
    val scored = ConfigRunner.run(spark, ev,
      conf ++ Map("predictor.model" -> "zscore", "score.threshold" -> "2.0"))
    val manual = Scorers.zscore(
      core.Seasonal.withCycle(ev, "ts", "weekDayOrWeekendOfWeek", "nanos"),
      graft.model.Fitters.stats(
        core.Seasonal.withCycle(ev, "ts", "weekDayOrWeekendOfWeek", "nanos"),
        Seq("event_type", "cycleType", "cycleIndex"), Seq("value")),
      Cfg(Seq("event_type", "cycleType", "cycleIndex"), Seq("value"),
        threshold = 2.0))
    assert(scored.select("score").collect().map(_.getDouble(0)).sorted.toSeq ==
      manual.select("score").collect().map(_.getDouble(0)).sorted.toSeq)
  }

  test("fit/utility job dispatch: every shipped config block runs") {
    import spark.implicits._
    val ev = core.table(spark, sfDir, "events")
      .select("event_type", "ts", "value", "event_id", "user_id")
    def props(t: String) = ConfigRunner.fromProperties(t)
    // numericalAttrMedian == robustStats
    val med = ConfigRunner.runJob(spark, ev, "numericalAttrMedian",
      props("id.fieldOrdinals=[0]\nattr.ordinals=[2]"))
    assert(med.collect().map(_.toSeq).toSet ==
      graft.model.Fitters.robustStats(ev, Seq("event_type"), Seq("value"))
        .collect().map(_.toSeq).toSet)
    // markovStateTransitionModel == markovTransitions fit
    val mk = ConfigRunner.runJob(spark, ev, "markovStateTransitionModel",
      props("id.fieldOrdinals=[4]\nseq.fieldOrd=3\nstate.fieldOrd=0\nlaplace.smoothing=1.0"))
    assert(mk.columns.toSet == Set("fromState", "toState", "prob"))
    assert(mk.count() > 0)
    // autoCorrelation honors the reference's coor.lags spelling
    val ac = ConfigRunner.runJob(spark, ev, "autoCorrelation",
      props("id.fieldOrdinals=[0]\nseq.fieldOrdinal=3\nattr.ordinals=[2]\ncoor.lags=2,5"))
    assert(ac.select("lag").distinct().collect()
      .map(_.getInt(0)).toSet == Set(2, 5))
    // temporalAggregator: hour buckets over epoch-nanos ts
    val ta = ConfigRunner.runJob(spark, ev, "temporalAggregator",
      props("id.fieldOrdinals=[0]\nattr.ordinals=[2]\ntime.fieldOrdinal=1\n" +
        "aggr.windowTimeUnit=hour\naggr.windowTimeLength=1\ntime.unit=nanos"))
    assert(ta.columns.contains("bucket") && ta.count() > 0)
    // typedUniqueValueCounter
    val uc = ConfigRunner.runJob(spark, ev, "typedUniqueValueCounter",
      props("id.fieldOrdinals=[0]\nattr.ordinals=[4]"))
    assert(uc.collect().forall(_.getAs[Long]("uniqueCount") > 0))
    // timeIntervalGenerator: positive intervals per key order
    val ti = ConfigRunner.runJob(spark, ev.limit(1000), "timeIntervalGenerator",
      props("id.fieldOrdinals=[4]\ntime.fieldOrdinal=1"))
    assert(ti.count() > 0 && ti.where(col("interval") < 0).count() == 0)
    // outlierAggregator: parent O iff any child O in the bucket
    val tagged = Seq(
      ("prodSale", "p1", 1L, 10.0, "N"), ("prodSale", "p2", 1L, 90.0, "O"),
      ("prodSale", "p1", 2L, 11.0, "N"), ("prodSale", "p2", 2L, 12.0, "N"))
      .toDF("streamType", "streamId", "seq", "quantity", "tag")
    val hier = Seq(("prodSale", "*", "allSales", "all"))
      .toDF("childType", "childId", "parentType", "parentId")
    val agg = ConfigRunner.runJob(spark, tagged, "outlierAggregator",
      props("type.field.ordinal=0\nid.field.ordinal=1\nseq.field.ordinal=2\n" +
        "quant.field.ordinal=3\nid.fieldOrdinals=[0]\nattr.ordinals=[3]"),
      model = Some(hier))
      .collect().map(r => r.getAs[Long]("seqb") -> r.getAs[String]("tag")).toMap
    assert(agg(1L) == "O" && agg(2L) == "N")
  }

  test("range model file: keyed lo/hi/mid triples parse and drive the scorer") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rng").toString
    // keyed file, two attributes → key, lo1,hi1,mid1, lo2,hi2,mid2
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/ranges.txt"),
      "a,10.0,20.0,14.0,100.0,200.0,150.0\nb,0.0,5.0,2.5,50.0,60.0,55.0"
        .getBytes("UTF-8"))
    val m = Sources.readRangeModel(spark, s"$dir/ranges.txt", Seq("k"),
      Seq("x", "y"))
    assert(m.count() == 4)
    val row = m.where(col("k") === "a" && col("attr") === "x").head()
    assert(row.getAs[Double]("lo") == 10.0 && row.getAs[Double]("hi") == 20.0 &&
      row.getAs[Double]("mid") == 14.0) // explicit mid, NOT the midpoint
    // the scorer consumes the file model directly and honors its mid:
    // x=15 is above mid 14 → delta = 15-20 = -5 (in-band, low score side)
    val data = Seq(("a", 15.0, 150.0), ("a", 30.0, 150.0))
      .toDF("k", "x", "y")
    // y stays in-band for both rows (score ≈ 0), so the two-attr average
    // for the x=30 outlier sits just under 0.5 — threshold below that
    val scored = Scorers.outOfRange(data, m,
      Cfg(Seq("k"), Seq("x", "y"), expConst = 1.0, threshold = 0.45))
      .collect().map(r => r.getAs[Double]("x") -> r.getAs[String]("tag")).toMap
    assert(scored(30.0) == "O" && scored(15.0) == "N")
  }

  test("distribution model file: histogram fit round-trips, freq recomputed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dist").toString
    val ev = core.table(spark, sfDir, "events")
    val fit = graft.model.Fitters.histogram(ev, Seq("event_type"),
      Seq(("value", 10.0)))
    Sources.writeDistributionModel(fit, s"$dir/dist", Seq("event_type"))
    val back = Sources.readDistributionModel(spark, s"$dir/dist",
      Seq("event_type"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_type"), col("bucket"), col("cnt"),
        round(col("freq"), 9).as("freq")).collect().map(_.toSeq).toSet
    assert(norm(back) == norm(fit),
      "distribution model must round-trip through the reference layout")
  }

  test("markov model files: both reference layouts parse, fit round-trips") {
    val states = Seq("A", "B", "C")
    val dir = java.nio.file.Files.createTempDirectory("graft_mk").toString
    // compact layout: key fields then 9 row-major probs
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/compact.txt"),
      ("k1,0.7,0.2,0.1,0.3,0.4,0.3,0.1,0.1,0.8\n" +
        "k2,0.5,0.5,0.0,0.0,0.5,0.5,0.5,0.0,0.5").getBytes("UTF-8"))
    val compact = Sources.readMarkovModel(spark, s"$dir/compact.txt", states)
    assert(compact.count() == 18)
    val k1 = compact.where(col("key") === "k1" && col("fromState") === "B" &&
      col("toState") === "C").head().getAs[Double]("prob")
    assert(k1 == 0.3)
    // long layout: key line then one row per line
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/long.txt"),
      "k1\n0.7,0.2,0.1\n0.3,0.4,0.3\n0.1,0.1,0.8\nk2\n0.5,0.5,0.0\n0.0,0.5,0.5\n0.5,0.0,0.5"
        .getBytes("UTF-8"))
    val long = Sources.readMarkovModel(spark, s"$dir/long.txt", states,
      compact = false)
    assert(long.collect().map(_.toSeq).toSet ==
      compact.collect().map(_.toSeq).toSet)
    // a graft fit exports to the compact layout and reads back identically
    val ev = core.table(spark, sfDir, "events")
    val fit = graft.model.Fitters.markovTransitions(ev, Seq("user_id"),
      "event_id", "event_type", smoothing = 1.0)
      .withColumn("key", lit("g"))
    val sts = fit.select("fromState").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    Sources.writeMarkovModel(fit, s"$dir/export.txt", sts)
    val back = Sources.readMarkovModel(spark, s"$dir/export.txt", sts)
    val orig = fit.select("key", "fromState", "toState", "prob")
      .collect().map(_.toSeq).toSet
    assert(back.collect().map(_.toSeq).toSet == orig,
      "markov fit must round-trip through the reference layout")
  }

  test("partitioned layout: slice reads prune partitions and push down stats") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = core.table(spark, sfDir, "events")
      .select("event_type", "event_id", "user_id", "value")
    Sources.writePartitioned(ev, dir, Seq("event_type"), Seq("event_id"))
    // one file per partition directory — the small-files guard
    val typeDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("event_type="))
    assert(typeDirs.nonEmpty)
    typeDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${d.getName}: ${parts.length} files")
    }
    // a slice read must PRUNE to the one directory (PartitionFilters) and
    // push the sort-key range into the scan (PushedFilters) — the two
    // things the layout exists for
    val firstType = typeDirs.head.getName.stripPrefix("event_type=")
    val back = spark.read.parquet(dir)
      .where(col("event_type") === firstType && col("event_id") < 100000L)
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains(s"PartitionFilters: [isnotnull(event_type"),
      s"partition filter missing:\n$scan")
    assert(scan.contains("PushedFilters: [IsNotNull(event_id), LessThan(event_id,100000)"),
      s"pushed range filter missing:\n$scan")
    // and the layout returns exactly what a direct filter of the source does
    val expect = ev.where(col("event_type") === firstType &&
      col("event_id") < 100000L).count()
    assert(back.count() == expect)
  }

  test("config jobs honor path.thresholdByKey per-key overrides") {
    val data = core.table(spark, sfDir, "events")
    val aType = data.select("event_type").limit(1).collect()(0).getString(0)
    val dir = java.nio.file.Files.createTempDirectory("graft_cfgthr").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/t"))
    // one key gets an absurdly low threshold; everything else keeps global
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/t/part-00000"), s"$aType,0.0001\n")
    val base = Map("predictor.model" -> "zscore",
      "id.fieldOrdinals" -> "3", "attr.ordinals" -> "4",
      "score.threshold" -> "3.0")
    val noFile = graft.pipeline.ConfigRunner.run(spark, data, base)
    val withFile = graft.pipeline.ConfigRunner.run(spark, data,
      base + ("path.thresholdByKey" -> s"$dir/t"))
    val oNo = noFile.where(col("event_type") === aType &&
      col("tag") === "O").count()
    val oWith = withFile.where(col("event_type") === aType &&
      col("tag") === "O").count()
    assert(oWith > oNo, "near-zero override must tag more outliers")
    assert(oWith == withFile.where(col("event_type") === aType &&
      col("score") > 0.0001).count())
    // keys NOT in the file keep the global threshold
    val othersNo = noFile.where(col("event_type") =!= aType && col("tag") === "O").count()
    val othersWith = withFile.where(col("event_type") =!= aType && col("tag") === "O").count()
    assert(othersNo == othersWith)
    // markov path: the override flows through rawTag BEFORE the O-spread;
    // markov keys on user_id, so its file is keyed by one user
    val aUser = data.select("user_id").limit(1).collect()(0).getLong(0)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/u"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/u/part-00000"), s"$aUser,0.0001\n")
    val seqConf = Map("predictor.model" -> "markovChainProb",
      "id.fieldOrdinals" -> "2", "seq.fieldOrd" -> "0",
      "state.fieldOrd" -> "3", "window.size" -> "3",
      "score.threshold" -> "1000.0")
    val mkNo = graft.pipeline.ConfigRunner.runSequence(spark, data, seqConf)
    val mkWith = graft.pipeline.ConfigRunner.runSequence(spark, data,
      seqConf + ("path.thresholdByKey" -> s"$dir/u"))
    assert(mkNo.where(col("tag") === "O").count() == 0,
      "global 1000 threshold tags nothing")
    val mkKeyO = mkWith.where(col("user_id") === aUser && col("tag") === "O").count()
    assert(mkKeyO > 0, "per-key override must surface O's for its key")
    assert(mkWith.where(col("user_id") =!= aUser && col("tag") === "O").count() == 0)
  }

  test("per-key threshold file: reference layout parses and round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft_thr").toString
    // hand-written reference layout: key fields, threshold right after
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/ref"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/ref/part-00000"),
      "login,eu,2.5\nlogin,us,3.0\ncheckout,eu,1.75\n")
    val m = Sources.readThresholdModel(spark, s"$dir/ref",
      Seq("event_type", "region"))
    val got = m.collect().map(r => (r.getString(0), r.getString(1)) ->
      r.getAs[Double]("threshold")).toMap
    assert(got == Map(("login", "eu") -> 2.5, ("login", "us") -> 3.0,
      ("checkout", "eu") -> 1.75))
    // explicit non-default threshold ordinal (extra columns in between)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/ref/part-00000"),
      "login,eu,ignored,2.5\n")
    val m2 = Sources.readThresholdModel(spark, s"$dir/ref",
      Seq("event_type", "region"), thresholdOrd = 3)
    assert(m2.collect()(0).getAs[Double]("threshold") == 2.5)
    // write half round-trips
    Sources.writeThresholdModel(m2, s"$dir/out", Seq("event_type", "region"))
    val back = Sources.readThresholdModel(spark, s"$dir/out",
      Seq("event_type", "region"))
    assert(back.collect()(0).getAs[Double]("threshold") == 2.5)
  }

  test("median/MAD file pair: robust fit round-trips, scorer consumes it") {
    val data = core.table(spark, sfDir, "events")
    val fitted = graft.model.Fitters.robustStats(data, Seq("event_type"),
      Seq("value"))
    val dir = java.nio.file.Files.createTempDirectory("graft_med").toString
    Sources.writeMedianModel(fitted, s"$dir/med", s"$dir/mad",
      Seq("event_type"), ordByAttr = Map("value" -> 2))
    val back = Sources.readMedianModel(spark, s"$dir/med", s"$dir/mad",
      Seq("event_type"), attrByOrd = Map(2 -> "value"))
    val exp = fitted.collect().map(r => r.getAs[String]("event_type") ->
      (r.getAs[Double]("med"), r.getAs[Double]("mad"))).toMap
    val got = back.collect().map(r => r.getAs[String]("event_type") ->
      (r.getAs[Double]("med"), r.getAs[Double]("mad"))).toMap
    assert(got.keySet == exp.keySet && back.collect()
      .forall(_.getAs[String]("attr") == "value"))
    exp.foreach { case (k, (m, s)) =>
      assert(math.abs(got(k)._1 - m) < 1e-9 && math.abs(got(k)._2 - s) < 1e-9, k)
    }
    // the read-back model drives robustZscore identically to the fit
    val cfg = graft.score.Scorers.Cfg(Seq("event_type"), Seq("value"),
      threshold = 2.0)
    val a = graft.score.Scorers.robustZscore(data, fitted, cfg)
      .agg(sum(col("score"))).collect()(0).getDouble(0)
    val b = graft.score.Scorers.robustZscore(data, back, cfg)
      .agg(sum(col("score"))).collect()(0).getDouble(0)
    assert(math.abs(a - b) < 1e-6)
  }

  test("isolation-forest tree-path model file round-trips and scores") {
    import graft.multi.IsolationForest
    val data = core.table(spark, sfDir, "events")
    val model = IsolationForest.fitDeterministic(data, Seq("event_type"),
      Seq("value"), "event_id", numTrees = 5, subsampleSize = 32, maxDepth = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_if").toString
    Sources.writeIsolationForestModel(model, s"$dir/m")
    val back = Sources.readIsolationForestModel(spark, s"$dir/m")
    // structure: same (key, tree, path) node set; leaves exact, internal
    // splits within the file's 6-decimal precision
    val exp = model.collect().map(n => (n.key, n.treeId, n.path) -> n).toMap
    val got = back.collect().map(n => (n.key, n.treeId, n.path) -> n).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (k, e) =>
      val g = got(k)
      assert(g.isLeaf == e.isLeaf && g.attr == e.attr, k)
      if (e.isLeaf) assert(g.size == e.size && g.depth == e.depth, k)
      else assert(math.abs(g.split - e.split) < 5e-7, k)
    }
    // the read-back forest scores the corpus like the in-memory one
    // (6dp split truncation can only matter if a value lands within 1e-6
    // of a split — not the case on this fixture, deterministically)
    val sA = IsolationForest.score(data, model, Seq("event_type"),
      Seq("value"), "event_id", 32).collect()
      .map(s => (s.key, s.rowId) -> s.score).toMap
    val sB = IsolationForest.score(data, back, Seq("event_type"),
      Seq("value"), "event_id", 32).collect()
      .map(s => (s.key, s.rowId) -> s.score).toMap
    assert(sA.keySet == sB.keySet)
    assert(sA.forall { case (k, v) => math.abs(sB(k) - v) < 1e-12 })
  }

  test("iforest model file reader accepts the reference's @ predicate form") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ifat").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/m"))
    // two leaves of one 1-split tree, the model job's @-separated
    // predicates (IsolationForestModel.scala:207-208) and a flag bit
    // (1<<12) ORed into the second line's treeId
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/m/part-00000"),
      "k1,0,0@5.000000@LT,7\nk1," + (0 | (1 << 12)) + ",0@5.000000@GE,3\n")
    val back = Sources.readIsolationForestModel(spark, s"$dir/m")
      .collect().map(n => n.path -> n).toMap
    assert(back.keySet == Set("R", "R0", "R1"))
    assert(!back("R").isLeaf && back("R").attr == 0 && back("R").split == 5.0)
    assert(back("R0").isLeaf && back("R0").size == 7)
    assert(back("R1").isLeaf && back("R1").size == 3)
    assert(back.values.forall(_.treeId == 0), "flag bits masked off")
  }

  test("orc sink/scan round-trips and pushes predicates into the scan") {
    val dir = java.nio.file.Files.createTempDirectory("orc").toString + "/ev"
    val ev = core.table(spark, sfDir, "events")
    Sources.writeOrc(ev, dir)
    val back = Sources.readOrc(spark, dir).where(col("event_id") < 100L)
    // identical rows back (hash-free: count + sum of a stable column)
    assert(back.count() == ev.where(col("event_id") < 100L).count())
    // the range predicate must reach the ORC scan, same as parquet
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(event_id), LessThan(event_id,100)"),
      s"orc pushed filter missing:\n$scan")
  }
}
