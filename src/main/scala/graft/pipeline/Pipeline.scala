package graft.pipeline

import graft.model.Fitters
import graft.score.Scorers
import graft.score.Scorers.Cfg
import graft.post.PostOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Library-level pipeline composition (SURVEY.md §3 "pipeline-of-jobs"):
  * the reference chains spark-submit jobs through files
  * (resource/and_spark.sh fit → score → count loop); here stages chain as
  * DataFrames inside one Spark application — models stay cached/broadcast,
  * no intermediate file handoffs.
  */
object Pipeline {

  /** fit-stats → score → tag → side outputs, as one lazily-planned flow. */
  case class ZscoreResult(stats: DataFrame, tagged: DataFrame,
      outliers: DataFrame, clean: DataFrame, counts: DataFrame)

  def zscorePipeline(data: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
      threshold: Double, expConst: Double = 0.0): ZscoreResult = {
    val stats = Fitters.stats(data, keyCols, attrCols)
    val tagged = Scorers.zscore(data, stats,
      Cfg(keyCols, attrCols, threshold = threshold, expConst = expConst))
    ZscoreResult(stats, tagged,
      Scorers.outliersOnly(tagged), Scorers.cleanData(tagged),
      PostOps.outlierCounter(tagged, keyCols))
  }

  /** Checkpoint filter (misc/ChangePointDetector.scala:75-88): drop rows
    * below each key's resume checkpoint (broadcast join, no shuffle on
    * data). Keys absent from the checkpoint table pass through. */
  def checkpointFilter(data: DataFrame, checkpoints: DataFrame,
      keyCols: Seq[String], seqCol: String): DataFrame =
    data.join(broadcast(checkpoints), keyCols, "left")
      .where(col("chkpt").isNull || col(seqCol) >= col("chkpt"))
      .drop("chkpt")

  /** Partition filter (multi/IsolationForestPredictor.scala:76-103): one
    * key slice — a plain filter so partition/file pruning applies. */
  def partitionFilter(data: DataFrame, keyCol: String, value: String): DataFrame =
    data.where(col(keyCol) === value)

  /** Kernel crossover for the sliding-frame detectors: the window plan's
    * parallelism is capped at key cardinality (`Window.partitionBy(key)`
    * = one task per key), the halo kernel's at data volume. Below
    * `4 × defaultParallelism` keys the window plan leaves cores idle —
    * and uneven key sizes straggle it well before the exact ceiling, so
    * the bar is a multiple, not equality; above it, tasks saturate and
    * the plain window plan avoids the halo's extra passes. Both kernels
    * are bit-identical in output (HaloWindowsSpec), so this is purely a
    * physical-plan choice. */
  def useHaloKernel(keyCardinality: Long, defaultParallelism: Int): Boolean =
    keyCardinality < 4L * defaultParallelism

  private def keyCardinality(data: DataFrame, keyCols: Seq[String],
      known: Long): Long =
    if (known >= 0) known
    else data.agg(approx_count_distinct(
      concat_ws("|", keyCols.map(c => col(c).cast("string")): _*))).head().getLong(0)

  private def canonKeyed(df: DataFrame, keyCols: Seq[String],
      cols: Seq[String]): DataFrame =
    df.select(concat_ws("|", keyCols.map(c => col(c).cast("string")): _*).as("key")
      +: cols.map(col): _*)

  /** Change-point detection with automatic kernel selection (see
    * [[useHaloKernel]]). Pass `knownKeyCardinality` to skip the sizing
    * aggregate (one column-pruned scan) when the caller already knows it.
    * Output: key (keyCols joined with "|"), seq, value, stat. */
  def changePoint(data: DataFrame, keyCols: Seq[String], seqCol: String,
      valCol: String, window: Int, critValue: Double,
      knownKeyCardinality: Long = -1L): DataFrame = {
    val par = data.sparkSession.sparkContext.defaultParallelism
    if (useHaloKernel(keyCardinality(data, keyCols, knownKeyCardinality), par))
      graft.seq.HaloWindows.changePointMeanShift(
        data, keyCols, seqCol, valCol, window, critValue)
    else canonKeyed(
      graft.seq.SeqOps.changePointMeanShift(
        data, keyCols, seqCol, valCol, window, critValue),
      keyCols, Seq(seqCol, valCol, "stat"))
      .withColumnRenamed(seqCol, "seq").withColumnRenamed(valCol, "value")
  }

  /** Level-shift segmentation with automatic kernel selection (see
    * [[useHaloKernel]]). Output: key, segStart, segEnd, n, avgShift. */
  def levelShiftSegments(data: DataFrame, keyCols: Seq[String], seqCol: String,
      valCol: String, window: Int, minZ: Double,
      knownKeyCardinality: Long = -1L): DataFrame = {
    val par = data.sparkSession.sparkContext.defaultParallelism
    if (useHaloKernel(keyCardinality(data, keyCols, knownKeyCardinality), par))
      graft.seq.HaloWindows.levelShiftSegments(
        data, keyCols, seqCol, valCol, window, minZ)
    else canonKeyed(
      graft.seq.SeqOps.levelShiftSegments(
        data, keyCols, seqCol, valCol, window, minZ),
      keyCols, Seq("segStart", "segEnd", "n", "avgShift"))
  }
}

/** Config-compatible entry point: accepts the reference's property
  * vocabulary (attr.ordinals, id.fieldOrdinals, score.threshold,
  * score.aggregation.strategy, exp.const — resource/and.conf:1-15,
  * rt_predict.properties) as a plain key→value map and dispatches to the
  * equivalent engine operator, so a beymani job invocation maps 1:1 onto
  * this library. */
object ConfigRunner {

  def columnsByOrdinal(df: DataFrame, ords: Seq[Int]): Seq[String] =
    ords.map(df.columns(_))

  /** Run one scoring job described by a reference-style config. Supported
    * `predictor.model` values mirror StatsBasedOutlierPredictor.scala:48-56. */
  def run(spark: SparkSession, data0: DataFrame, conf: Map[String, String]): DataFrame = {
    def ints(p: String): Seq[Int] =
      conf(p).split(",").map(_.trim.toInt).toSeq
    val keyCols0 = columnsByOrdinal(data0, ints("id.fieldOrdinals"))
    val attrCols = columnsByOrdinal(data0, ints("attr.ordinals"))
    // seasonal predictor (StatsBasedOutlierPredictor.scala:209-246): the
    // same (cycleType, cycleIndex) key extension the numericalAttrStats
    // fit applied — each record scores against its own regime's model
    val (data, keyCols) =
      if (conf.getOrElse("seasonal.analysis", "false").toBoolean) {
        val tsCol = data0.columns(conf("time.fieldOrdinal").toInt)
        val unit = conf.getOrElse("time.unit",
          if (conf.getOrElse("time.inMili", "false").toBoolean) "millis"
          else "sec")
        val ct = conf("seasonal.cycleType").split(",").head
          .trim.stripPrefix("\"").stripSuffix("\"")
        (graft.core.Seasonal.withCycle(data0, tsCol, ct, unit),
          keyCols0 ++ Seq("cycleType", "cycleIndex"))
      } else (data0, keyCols0)
    val cfg = Cfg(
      keyCols, attrCols,
      weights = conf.get("attr.weights")
        .map(_.split(",").map(_.trim.toDouble).toSeq).getOrElse(Nil),
      strategy = conf.getOrElse("score.aggregation.strategy", "average"),
      expConst = conf.get("exp.const").map(_.toDouble).getOrElse(0.0),
      threshold = conf("score.threshold").toDouble)
    // both spellings ship in the reference: predictor.model
    // (rt_predict.properties:2) and predictor.strategy (and.conf:21)
    val scored = conf.getOrElse("predictor.model",
        conf("predictor.strategy")) match {
      case "zscore" =>
        Scorers.zscore(data, Fitters.stats(data, keyCols, attrCols), cfg)
      case "robustZscore" =>
        Scorers.robustZscore(data, Fitters.robustStats(data, keyCols, attrCols), cfg)
      case "extremeValueProbablity" => // reference spelling
        Scorers.extremeValue(data, Fitters.stats(data, keyCols, attrCols), cfg)
      case "interPercentileDifference" =>
        Scorers.iqrScore(data, Fitters.quantiles(data, keyCols, attrCols), cfg)
      case "estimatedProbablity" =>
        val width = conf("bucket.width").toDouble
        val hist = Fitters.histogram(data, keyCols, attrCols.map(_ -> width))
        Scorers.estimatedProbability(data, hist, cfg, attrCols.map(_ -> width))
      case "estimatedAttributeProbablity" =>
        val width = conf("bucket.width").toDouble
        val hist = Fitters.attrHistogram(data, keyCols, attrCols.map(_ -> width))
        Scorers.estimatedAttrProbability(data, hist, cfg,
          attrCols.map(_ -> width).toMap,
          useLog = conf.getOrElse("attr.prob.scoring.strategy", "inverseLog") != "inverse")
      case "estimatedCumProbablity" =>
        val width = conf("bucket.width").toDouble
        val hist = Fitters.attrHistogram(data, keyCols, attrCols.map(_ -> width))
        Scorers.estimatedCumProbability(data, hist, cfg, attrCols.map(_ -> width).toMap)
      case "estimatedMetaProbablity" =>
        val width = conf("bucket.width").toDouble
        val metaWidth = conf.getOrElse("meta.bucket.width", "0.1").toDouble
        val hist = Fitters.attrHistogram(data, keyCols, attrCols.map(_ -> width))
        val meta = Fitters.metaHistogram(hist, keyCols, metaWidth)
        Scorers.estimatedMetaProbability(data, hist, meta, cfg,
          attrCols.map(_ -> width).toMap, metaWidth,
          useLog = conf.getOrElse("attr.prob.scoring.strategy", "inverseLog") != "inverse")
      case "mahalanobisDistance" =>
        Scorers.mahalanobis(data, cfg)
      case other => throw new IllegalArgumentException(s"unknown predictor.model $other")
    }
    applyPerKeyThresholds(spark, scored, conf, keyCols, cfg.threshold)
  }

  /** The reference's optional per-key threshold override
    * (`path.thresholdByKey`, StatsBasedOutlierPredictor.scala:131,198 /
    * MarkovChainPredictor.scala:74,87): when present, rows whose key
    * appears in the file relabel against that key's threshold; the rest
    * keep the global one (OutlierUtility.getThreshold fallback).
    * The file's key fields join on string form — the seasonal key
    * extension's cycleIndex is numeric in the engine but text in the
    * file. Threshold files are model-sized: always broadcast. */
  private def applyPerKeyThresholds(spark: SparkSession, scored: DataFrame,
      conf: Map[String, String], keyCols: Seq[String],
      globalThreshold: Double): DataFrame =
    conf.get("path.thresholdByKey") match {
      case None => scored
      case Some(path) =>
        val thrNames = keyCols.map(_ + "__tk")
        val thr = graft.sources.Sources
          .readThresholdModel(spark, path, thrNames)
          .withColumnRenamed("threshold", "__thr")
        val cond = keyCols.zip(thrNames)
          .map { case (c, t) => scored(c).cast("string") === thr(t) }
          .reduce(_ && _)
        scored.join(broadcast(thr), cond, "left")
          .withColumn("tag", graft.core.label(col("score"),
            coalesce(col("__thr"), lit(globalThreshold))))
          .drop(thrNames :+ "__thr": _*)
    }

  /** Sequence-job dispatch (seq/MarkovChainPredictor.scala config surface):
    * `predictor.model=markovChainProb` with `seq.fieldOrd`, `state.fieldOrd`,
    * `window.size`, `markov.metric` (condProb/missProb/missRate/
    * entropyReduction). The transition model fits from the data itself when
    * no pre-fitted `model` DataFrame is supplied (the reference trains it
    * in a separate avenir job). */
  def runSequence(spark: SparkSession, data: DataFrame,
      conf: Map[String, String], model: Option[DataFrame] = None): DataFrame = {
    def ints(p: String): Seq[Int] =
      conf(p).split(",").map(_.trim.toInt).toSeq
    val keyCols = columnsByOrdinal(data, ints("id.fieldOrdinals"))
    val seqCol = data.columns(conf("seq.fieldOrd").toInt)
    val scored = conf.getOrElse("predictor.model",
        conf.getOrElse("predictor.strategy", "markovChainProb")) match {
      // "conditinalProbability" is bsm.conf:33's spelling of the
      // conditional-probability metric — same scorer, condProb metric
      case "markovChainProb" | "conditinalProbability" =>
        val stateCol = data.columns(conf.getOrElse("state.fieldOrd",
          conf.getOrElse("state.field.ordinal", conf.getOrElse("attr.ordinal", "2"))).toInt)
        val trans = model.getOrElse(
          graft.model.Fitters.markovTransitions(data, keyCols, seqCol, stateCol,
            smoothing = conf.getOrElse("laplace.smoothing", "0.5").toDouble))
        // per-key thresholds go INTO the scorer (not a post-hoc relabel):
        // the O-spread over the window must see the overridden rawTag
        graft.seq.SeqOps.markovChainScore(data, trans, keyCols, seqCol, stateCol,
          window = conf.getOrElse("window.size", "5").toInt,
          metric = conf.getOrElse("markov.metric", "condProb"),
          threshold = conf("score.threshold").toDouble,
          perKeyThresholds = conf.get("path.thresholdByKey").map(p =>
            graft.sources.Sources.readThresholdModel(spark, p, keyCols)))
      case other => throw new IllegalArgumentException(s"unknown sequence predictor.model $other")
    }
    scored
  }

  /** Parse a reference .properties/.conf-style text blob. */
  def fromProperties(text: String): Map[String, String] =
    text.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .map { l =>
        val i = l.indexOf('=')
        l.substring(0, i).trim -> l.substring(i + 1).trim.stripPrefix("[").stripSuffix("]")
      }.toMap

  /** Parse a reference HOCON-style .conf file into its job blocks
    * (resource/and.conf, ecomm.conf, …): one map per top-level
    * `jobName { … }` block, `key = value` pairs inside, nested blocks
    * flattened with a dotted prefix (`zscore { stats.file.path = p }` →
    * `zscore.stats.file.path`). Values lose quotes/brackets like
    * [[fromProperties]] — the vocabulary [[runJob]] reads. */
  def fromConfBlocks(text: String): Map[String, Map[String, String]] = {
    val blocks = collection.mutable.LinkedHashMap
      .empty[String, collection.mutable.LinkedHashMap[String, String]]
    var top: String = null
    val nest = collection.mutable.Stack.empty[String]
    text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#")).foreach { l =>
      if (l.endsWith("{")) {
        val name = l.stripSuffix("{").trim
        if (top == null) { top = name; blocks(top) = collection.mutable.LinkedHashMap.empty }
        else nest.push(name)
      } else if (l == "}") {
        if (nest.nonEmpty) nest.pop(): Unit else top = null
      } else if (l.contains("=") && top != null) {
        val i = l.indexOf('=')
        val k0 = l.substring(0, i).trim
        val k = (nest.toSeq.reverse :+ k0).mkString(".")
        val v = l.substring(i + 1).trim
          .stripPrefix("[").stripSuffix("]")
          .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .mkString(",")
        blocks(top)(k) = v
      }
    }
    blocks.map { case (k, v) => k -> v.toMap }.toMap
  }

  /** Whole-job dispatch keyed by the reference's Spark job class (the name
    * a reference user types after `spark-submit --class org.beymani.spark.
    * …`), reading THAT job's own property names — so every batch job in
    * the reference's spark tree runs against this library with its
    * existing config. Jobs whose reference form loads a pre-fitted model
    * file take it as the optional `model` DataFrame (the reference trains
    * those in separate jobs); when absent, the fitter runs inline on
    * `data`. Ordinal-based column addressing throughout, like the
    * reference's id.fieldOrdinals / attr.ordinals contract.
    *
    * Key references: dist/StatsBasedOutlierPredictor.scala:48-56 (via
    * [[run]]), seq/MarkovChainPredictor.scala:55-137 (via [[runSequence]]),
    * cluster/ClusterBasedPredictor.scala, knn/LocalDensityBasedPredictor
    * .scala, misc/InRangeBasedPredictor.scala:60-101, misc/
    * ChangePointDetector.scala, level/OutlierLevelShift.scala:104-147,
    * common/OutlierScoreLevelShift.scala, seq/LocalNeighborhoodDetector
    * .scala:78-110, seq/NgramFrequencyPredictor.scala, seq/
    * OneStepAheadPredictor.scala, seq/SpectralResiduePredictor.scala,
    * seq/SubSequenceDistanceDetector.scala, multi/IsolationForestPredictor
    * .scala:76-175, pc/PrincipalComponentPredictor.scala, common/
    * OutlierCounter.scala, common/PseudoRelevanceThresholdFinder.scala,
    * common/ThresholdLearner.scala. */
  def runJob(spark: SparkSession, data: DataFrame, jobType: String,
      conf: Map[String, String], model: Option[DataFrame] = None): DataFrame = {
    def ints(p: String): Seq[Int] =
      conf(p).split(",").map(_.trim.toInt).toSeq
    // both ordinal spellings appear in the reference tree
    def keyCols: Seq[String] =
      if (conf.contains("id.fieldOrdinals")) columnsByOrdinal(data, ints("id.fieldOrdinals"))
      else if (conf.contains("id.field.ordinals")) columnsByOrdinal(data, ints("id.field.ordinals"))
      else Nil // e.g. and.conf thresholdLearner: a global, keyless job
    def attrCols: Seq[String] = columnsByOrdinal(data, ints("attr.ordinals"))
    def attrCol: String = data.columns(conf("attr.ordinal").toInt)
    def seqCol: String = data.columns(
      conf.getOrElse("seq.fieldOrd", conf.getOrElse("seq.field.ordinal", "0")).toInt)
    def window: Int = conf.getOrElse("window.size", "16").toInt
    def threshold: Double = conf.getOrElse("score.threshold", "3.0").toDouble
    jobType match {
      case "statsBasedOutlierPredictor" => run(spark, data, conf)
      // the and.conf FIT stage (chombo NumericalAttrStats block,
      // resource/and.conf:1-15): seasonal.analysis=true extends the model
      // key with (cycleType, cycleIndex) from time.fieldOrdinal, one
      // model slice per configured cycle type — the model the seasonal
      // predictor then consumes. time.inMili picks the reference's
      // seconds/millis units; time.unit=nanos covers this engine's
      // normalized epoch-nanos columns.
      // chombo/avenir FIT + utility jobs from the shipped configs
      // (cyd.conf, ecomm.conf, and.conf) — every job block a reference
      // workflow script invokes now dispatches
      case "numericalAttrMedian" =>
        Fitters.robustStats(data, keyCols, attrCols)
      case "markovStateTransitionModel" =>
        Fitters.markovTransitions(data, keyCols, seqCol,
          data.columns(conf.getOrElse("state.fieldOrd",
            conf("state.field.ordinal")).toInt),
          smoothing = conf.getOrElse("laplace.smoothing", "0.5").toDouble)
      case "isolationForestModel" =>
        graft.multi.IsolationForest.fitDeterministic(data, keyCols, attrCols,
          data.columns(conf.getOrElse("rec.idOrd", "0").toInt),
          numTrees = conf.getOrElse("num.tree", "50").toInt,
          subsampleSize = conf.getOrElse("subsample.size", "64").toInt,
          maxDepth = conf.getOrElse("max.depth", "6").toInt).toDF()
      case "autoCorrelation" =>
        // the cycle-detection job; `coor.lags` is the reference's spelling
        val seqC = data.columns(
          conf.getOrElse("seq.fieldOrdinal", conf("seq.fieldOrd")).toInt)
        val lags = conf("coor.lags").split(",").map(_.trim.toInt).toSeq
        graft.seq.SeqOps.autocorrelation(data, keyCols, seqC, attrCols.head, lags)
      case "temporalAggregator" =>
        val tsCol = data.columns(conf("time.fieldOrdinal").toInt)
        val unitSec = conf.getOrElse("aggr.windowTimeUnit", "hour") match {
          case "sec" | "second" => 1L
          case "min" | "minute" => 60L
          case "hour" => 3600L
          case "day" => 86400L
          case other => throw new IllegalArgumentException(s"unknown window unit $other")
        }
        graft.seq.SeqOps.temporalAggregate(data, keyCols, tsCol, attrCols.head,
          bucketSec = unitSec * conf.getOrElse("aggr.windowTimeLength", "1").toLong,
          tsUnit = conf.getOrElse("time.unit",
            if (conf.getOrElse("time.inMili", "false").toBoolean) "millis"
            else "sec"))
      case "typedUniqueValueCounter" =>
        // cyd.conf:38-44 runs this seasonally — same key extension as
        // the numericalAttrStats fit
        val (d, ks) =
          if (conf.getOrElse("seasonal.analysis", "false").toBoolean) {
            val tsCol = data.columns(conf("time.fieldOrdinal").toInt)
            val unit = conf.getOrElse("time.unit",
              if (conf.getOrElse("time.inMili", "false").toBoolean) "millis"
              else "sec")
            val ct = conf("seasonal.cycleType").split(",").head.trim
              .stripPrefix("\"").stripSuffix("\"")
            (graft.core.Seasonal.withCycle(data, tsCol, ct, unit),
              keyCols ++ Seq("cycleType", "cycleIndex"))
          } else (data, keyCols)
        d.groupBy(ks.map(col): _*)
          .agg(count_distinct(col(attrCols.head)).as("uniqueCount"))
      case "timeIntervalGenerator" =>
        val tsCol = data.columns(conf("time.fieldOrdinal").toInt)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
        data.withColumn("interval", col(tsCol) - lag(col(tsCol), 1).over(w))
          .where(col("interval").isNotNull)
          .select(keyCols.map(col) :+ col(tsCol) :+ col("interval"): _*)
      case "outlierAggregator" =>
        // hierarchy = the parsed dataStream JSON as a DataFrame
        // (childType, childId, parentType, parentId); '*' child wildcards
        // per the reference's DataStreamSchema semantics
        val hier = model.getOrElse(throw new IllegalArgumentException(
          "outlierAggregator needs the hierarchy model DataFrame " +
            "(childType, childId, parentType, parentId) — the reference " +
            "loads it from stream.schmaFilePath"))
        val typeCol = data.columns(conf("type.field.ordinal").toInt)
        val idCol = data.columns(conf("id.field.ordinal").toInt)
        val seqC = data.columns(conf("seq.field.ordinal").toInt)
        val quantCol = data.columns(conf("quant.field.ordinal").toInt)
        PostOps.hierarchyRollup(data, hier, typeCol, idCol, col(seqC), quantCol,
          strategy = conf.getOrElse("aggr.type", "average"))
      case "numericalAttrStats" =>
        if (conf.getOrElse("seasonal.analysis", "false").toBoolean) {
          val tsCol = data.columns(conf("time.fieldOrdinal").toInt)
          val unit = conf.getOrElse("time.unit",
            if (conf.getOrElse("time.inMili", "false").toBoolean) "millis"
            else "sec")
          val cycles = conf("seasonal.cycleType").split(",")
            .map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
          cycles.map { ct =>
            Fitters.stats(
              graft.core.Seasonal.withCycle(data, tsCol, ct, unit),
              keyCols ++ Seq("cycleType", "cycleIndex"), attrCols)
          }.reduce(_ unionByName _)
        } else Fitters.stats(data, keyCols, attrCols)
      case "markovChainPredictor" => runSequence(spark, data, conf, model)
      case "clusterBasedPredictor" =>
        graft.multi.ClusterScore.cblofDeterministic(data, attrCols, keyCols,
          k = conf.getOrElse("cluster.count", "8").toInt,
          largeFraction = conf.getOrElse("cluster.largeSizeFraction", "0.9").toDouble)
      case "localDensityBasedPredictor" =>
        val vecs = data.select(
          concat_ws("|", keyCols.map(col): _*).as("vid"),
          array(attrCols.map(c => col(c).cast("double")): _*).as("v"))
        val k = conf.getOrElse("nearest.neighbor.count", "5").toInt
        graft.multi.Proximity.relativeDensityFromKnn(
          graft.multi.Blocked.knn(vecs, "vid", "v", k), k)
      case "inRangeBasedPredictor" | "outRangeBasedPredictor" =>
        val ranges = model.getOrElse(throw new IllegalArgumentException(
          s"$jobType needs the range model DataFrame (key..., attr, lo, hi) — " +
            "the reference loads it from range.globalFilePath"))
        val cfg = Cfg(keyCols, attrCols,
          expConst = conf.getOrElse("exp.const", "0.0").toDouble,
          threshold = threshold)
        if (jobType == "inRangeBasedPredictor") Scorers.inRange(data, ranges, cfg)
        else Scorers.outOfRange(data, ranges, cfg)
      case "changePointDetector" =>
        // cpsale.conf spells the stat UPPERCASE (stat.type = CVM) —
        // normalize case-insensitively for both dispatch arms
        val stat = conf.getOrElse("stat.type", "ks").toLowerCase
        if (stat == "meanshift")
          Pipeline.changePoint(data, keyCols, seqCol, attrCols.head, window,
            conf.getOrElse("stat.critValue", "3.0").toDouble)
        else graft.seq.SeriesKernels.changePoint(data, keyCols, seqCol,
          attrCols.head, window, stat,
          conf.getOrElse("stat.critValue", "3.0").toDouble).toDF()
      case "outlierLevelShift" =>
        Pipeline.levelShiftSegments(data, keyCols, seqCol, attrCols.head, window,
          conf.getOrElse("zscore.min", conf.getOrElse("score.threshold", "3.0")).toDouble)
      case "outlierScoreLevelShift" =>
        graft.seq.SeqOps.scoreLevelShift(data, keyCols, seqCol,
          longWin = conf.getOrElse("window.longSize", "50").toInt,
          shortWin = conf.getOrElse("window.shortSize", "10").toInt,
          minZ = conf.getOrElse("zscore.min", "2.0").toDouble)
      case "localNeighborhoodDetector" =>
        graft.seq.SeqOps.localNeighborhood(data, keyCols, seqCol, attrCol,
          half = conf.getOrElse("neighborhood.size", window.toString).toInt,
          byCount = conf.contains("neighborhood.dist"),
          dist = conf.getOrElse("neighborhood.dist", "1.0").toDouble,
          threshold = threshold)
      case "ngramFrequencyPredictor" =>
        graft.seq.SeriesKernels.ngramFrequency(data, keyCols, seqCol, attrCol,
          numBuckets = conf.getOrElse("num.bins", "4").toInt,
          n = conf.getOrElse("ngram.size", "2").toInt,
          window = window).toDF()
      case "oneStepAheadPredictor" =>
        graft.seq.SeqOps.oneStepAhead(data, keyCols, seqCol, attrCols.head,
          window = window, threshold = threshold)
      case "spectralResiduePredictor" =>
        graft.seq.SeriesKernels.spectralResidue(data, keyCols, seqCol,
          attrCols.head, window = window,
          avgWindow = conf.getOrElse("fft.ma.window.size", "3").toInt).toDF()
      case "subSequenceDistanceDetector" =>
        graft.seq.SeriesKernels.subSequenceDistance(data, keyCols, seqCol,
          attrCol, window = window).toDF()
      case "isolationForestPredictor" =>
        val idCol = data.columns(conf.getOrElse("rec.idOrd", "0").toInt)
        val forest = graft.multi.IsolationForest.fitDeterministic(data, keyCols,
          attrCols, idCol,
          numTrees = conf.getOrElse("num.tree", "50").toInt,
          subsampleSize = conf.getOrElse("subsample.size", "64").toInt,
          maxDepth = conf.getOrElse("max.depth", "6").toInt)
        graft.multi.IsolationForest.score(data, forest, keyCols, attrCols,
          idCol, subsampleSize = conf.getOrElse("subsample.size", "64").toInt).toDF()
      case "principalComponentPredictor" =>
        graft.multi.ClusterScore.pcaScore(data,
          columnsByOrdinal(data, ints("quant.field.ordinals")),
          nComponents = conf.getOrElse("num.components", "1").toInt)
      case "outlierCounter" =>
        PostOps.outlierCounter(data, keyCols)
      case "pseudoRelevanceThresholdFinder" =>
        PostOps.pseudoRelevanceThreshold(data, keyCols,
          topFrac = conf.getOrElse("top.fraction", "0.05").toDouble,
          minCount = conf.getOrElse("min.count", "100").toLong,
          defaultThreshold = threshold)
      case "thresholdLearner" =>
        // reference spellings (resource/and.conf:52-58): score.fldOrd,
        // cls.fldOrd, split.points, pos.clsLabel; engine spellings kept
        val scoreCol = data.columns(conf.getOrElse("score.fldOrd",
          conf.getOrElse("score.fieldOrd", "0")).toInt)
        val labelCol0 = data.columns(conf.getOrElse("cls.fldOrd",
          conf.getOrElse("label.fieldOrd", "1")).toInt)
        val posLabel = conf.get("pos.clsLabel")
        val labeled = posLabel match {
          case Some(p) => data.withColumn("__pos",
            col(labelCol0).cast("string") === p)
          case None => data.withColumn("__pos", col(labelCol0))
        }
        PostOps.thresholdLearner(labeled, keyCols, scoreCol, "__pos",
          splits = conf.getOrElse("split.points", conf("threshold.splits"))
            .split(",").map(_.trim.toDouble).toSeq)
      case "filter" =>
        // chombo generic row filter (salean.conf filter block): apply the
        // selection predicate when present; an empty selection.filter is
        // the identity projection of the id + remaining fields
        conf.get("selection.filter").map(_.trim).filter(_.nonEmpty)
          .map(sel => data.where(expr(sel))).getOrElse(data)
      case "dataTransformer" =>
        // chombo dataTransformer with a discretizer transform
        // (bsm.conf:4-12): bucketize the configured (or every numeric)
        // column at bucket.width; other columns pass through
        val width = conf.getOrElse("bucket.width", "1.0").toDouble
        val targets: Seq[String] =
          if (conf.contains("attr.ordinals")) attrCols
          else data.schema.fields.collect {
            case f if f.dataType == org.apache.spark.sql.types.DoubleType =>
              f.name
          }.toSeq
        targets.foldLeft(data)((df, c) =>
          df.withColumn(c, floor(col(c).cast("double") / width)))
      case other => throw new IllegalArgumentException(s"unknown jobType $other")
    }
  }
}
