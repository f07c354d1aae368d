package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Sources / sinks / schema compatibility layer (SURVEY.md §2.1):
  * the reference's JSON attribute schema, delimited-text data files and
  * flat keyed model files, re-expressed over Spark's readers so existing
  * beymani assets load unchanged. */
object Sources {

  /** One attribute of a RichAttributeSchema
    * (src/.../predictor/DistributionBasedPredictor.java:88-97; example
    * resource/hist.json:1-27): name, ordinal, dataType, id flag and
    * optional bucketWidth, carried into StructField metadata. */
  case class AttrDef(name: String, ordinal: Int, dataType: String,
      id: Boolean, bucketWidth: Option[Double])

  private val mapper = new ObjectMapper()

  /** Parse the reference's JSON schema into attribute definitions. */
  def parseSchema(json: String): Seq[AttrDef] = {
    val root = mapper.readTree(json)
    val fields = root.get("fields")
    fields.elements().asScala.map { f =>
      AttrDef(
        name = f.get("name").asText(),
        ordinal = f.get("ordinal").asInt(),
        dataType = f.get("dataType").asText(),
        id = Option(f.get("id")).exists(_.asBoolean(false)),
        bucketWidth = Option(f.get("bucketWidth")).map(_.asDouble()))
    }.toSeq.sortBy(_.ordinal)
  }

  /** Ordinal-addressed JSON schema → named StructType; bucketWidth and the
    * id role survive in column metadata (SURVEY.md §1 schema row). */
  def toStructType(attrs: Seq[AttrDef]): StructType = StructType(attrs.map { a =>
    val dt = a.dataType match {
      case "string" | "categorical" => StringType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case other => throw new IllegalArgumentException(s"unknown dataType $other")
    }
    val mb = new MetadataBuilder().putBoolean("id", a.id)
    a.bucketWidth.foreach(w => mb.putDouble("bucketWidth", w))
    StructField(a.name, dt, nullable = true, mb.build())
  })

  /** Read a reference-layout delimited text file (default ',', optional
    * quoted fields — `field.under.quote`,
    * dist/StatsBasedOutlierPredictor.scala:74) with a JSON schema. */
  def readDelimited(spark: SparkSession, path: String, schemaJson: String,
      delim: String = ",", quoted: Boolean = false): DataFrame =
    spark.read
      .schema(toStructType(parseSchema(schemaJson)))
      .option("delimiter", delim)
      .option("quote", if (quoted) "\"" else "\u0000")
      .csv(path)

  /** Write tagged output in the reference's text contract: input fields +
    * score + tag, delimited (StatsBasedOutlierPredictor.scala:278,321). */
  def writeDelimited(df: DataFrame, path: String, delim: String = ","): Unit =
    df.write.option("delimiter", delim).mode("overwrite").csv(path)

  /** ORC sink/scan (engine addition): the columnar alternative for
    * warehouses standardized on ORC — same pushdown/pruning contract as
    * the parquet path (Spark's built-in orc source; predicate pushdown
    * verified by PipelineSpec's PushedFilters assertion). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Read a reference stats model file — keyed flat CSV with mean at
    * keyLen+4 and stddev at keyLen+6
    * (StatsBasedOutlierPredictor.scala:116-120) — into the engine's model
    * shape (keyCols..., attr, mean, std). */
  def readStatsModel(spark: SparkSession, path: String, keyCols: Seq[String],
      attrName: String, delim: String = ","): DataFrame = {
    val k = keyCols.length
    val raw = spark.read.option("delimiter", delim).csv(path)
    val keyed = keyCols.zipWithIndex.foldLeft(raw) { case (df, (c, i)) =>
      df.withColumnRenamed(s"_c$i", c)
    }
    keyed.select(
      keyCols.map(col) :+
        lit(attrName).as("attr") :+
        col(s"_c${k + 4}").cast("double").as("mean") :+
        col(s"_c${k + 6}").cast("double").as("std"): _*)
  }

  /** Export a fitted stats model (keyCols..., attr, mean, std + count/
    * sum/sumSq when present) as the reference's flat keyed CSV layout —
    * key fields, then fieldOrd, count, sum, sumSq, mean, variance, stddev,
    * placing mean at key+4 and stddev at key+6 exactly as
    * `readStatsModel` (and the reference's predictors,
    * StatsBasedOutlierPredictor.scala:116-120) consume them. Lets a
    * beymani deployment keep exchanging model files in both directions. */
  def writeStatsModel(model: DataFrame, path: String, keyCols: Seq[String],
      attrOrd: Int, delim: String = ","): Unit = {
    import org.apache.spark.sql.functions.{coalesce, col, concat_ws, lit, pow}
    val cols: Seq[org.apache.spark.sql.Column] =
      keyCols.map(col) ++ Seq(
        lit(attrOrd).cast("string"),
        coalesce(col("cnt"), lit(0L)).cast("string"),
        lit(0.0).cast("string"), // sum (not retained by the engine model)
        lit(0.0).cast("string"), // sumSq
        col("mean").cast("string"),
        pow(col("std"), 2.0).cast("string"),
        col("std").cast("string"))
    model.select(concat_ws(delim, cols: _*).as("line"))
      .coalesce(1).write.mode("overwrite").text(path)
  }

  /** Persist a fitted model DataFrame as parquet (engine-native model
    * format; small enough to broadcast on read). */
  /** Schema-on-read extraction of a JSON side-channel column (the
    * `props` bag every event pipeline carries): ONE `from_json` parse
    * per row against a DDL-declared struct, fields hoisted to top-level
    * columns ready for any fitter/scorer. Native JsonToStructs — no
    * UDF, no extra scan; a malformed bag yields nulls, which the
    * downstream fitters already skip. Prefer this over per-field
    * `get_json_object`, which re-parses the bag once per field. */
  def jsonProps(df: DataFrame, jsonCol: String, ddl: String): DataFrame = {
    val parsed = df.withColumn("_props",
      from_json(col(jsonCol), StructType.fromDDL(ddl)))
    StructType.fromDDL(ddl).fields.foldLeft(parsed) { (d, f) =>
      d.withColumn(f.name, col(s"_props.${f.name}"))
    }.drop("_props")
  }

  def writeModel(model: DataFrame, path: String): Unit =
    model.coalesce(1).write.mode("overwrite").parquet(path)

  def readModel(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Read a reference distribution model file
    * (src/.../predictor/DistributionBasedPredictor.java:203-236): each
    * line = key fields..., [cycleType, cycleIndex when seasonal],
    * bucket, count. Recomputes per-key freq like [[graft.model.Fitters
    * .histogram]] emits it, so the result plugs straight into the
    * estimatedProbability scorers. */
  def readDistributionModel(spark: SparkSession, path: String,
      keyCols: Seq[String], seasonal: Boolean = false,
      delim: String = ","): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val raw = spark.read.option("delimiter", delim).csv(path)
    val k = keyCols.length
    val keyed = keyCols.zipWithIndex.foldLeft(raw) { case (df, (c, i)) =>
      df.withColumnRenamed(s"_c$i", c)
    }
    val off = k + (if (seasonal) 2 else 0)
    val withCycle =
      if (seasonal) keyed
        .withColumnRenamed(s"_c$k", "cycleType")
        .withColumn("cycleIndex", col(s"_c${k + 1}").cast("long"))
      else keyed
    val groupCols = keyCols ++
      (if (seasonal) Seq("cycleType", "cycleIndex") else Nil)
    val w = Window.partitionBy(groupCols.map(col): _*)
    withCycle
      .withColumnRenamed(s"_c$off", "bucket")
      .withColumn("cnt", col(s"_c${off + 1}").cast("long"))
      .select(groupCols.map(col) :+ col("bucket") :+ col("cnt"): _*)
      .withColumn("freq", col("cnt") / sum("cnt").over(w))
  }

  /** Export a fitted histogram model (keyCols..., bucket, cnt[, freq])
    * as the reference's distribution file layout — the write half of
    * [[readDistributionModel]]. */
  def writeDistributionModel(model: DataFrame, path: String,
      keyCols: Seq[String], delim: String = ","): Unit = {
    val cols = (keyCols.map(col) :+ col("bucket") :+
      col("cnt").cast("string")).map(_.cast("string"))
    model.select(concat_ws(delim, cols: _*).as("line"))
      .coalesce(1).write.mode("overwrite").text(path)
  }

  /** Read a reference range model file (misc/InRangeBasedPredictor
    * .scala:60-101 getGlobalRange/getKeyedRange): per line, key fields
    * (keyed variant; none for the global file) followed by one
    * (lo, hi, mid) triple per attribute in `attrNames` order. Output:
    * keyCols..., attr, lo, hi, mid — the model shape `Scorers.inRange`/
    * `outOfRange` consume (they honor the file's explicit mid). */
  def readRangeModel(spark: SparkSession, path: String,
      keyCols: Seq[String], attrNames: Seq[String],
      delim: String = ","): DataFrame = {
    val raw = spark.read.option("delimiter", delim).csv(path)
    val k = keyCols.length
    val keyed = keyCols.zipWithIndex.foldLeft(raw) { case (df, (c, i)) =>
      df.withColumnRenamed(s"_c$i", c)
    }
    attrNames.zipWithIndex.map { case (a, i) =>
      keyed.select(keyCols.map(col) :+ lit(a).as("attr") :+
        col(s"_c${k + 3 * i}").cast("double").as("lo") :+
        col(s"_c${k + 3 * i + 1}").cast("double").as("hi") :+
        col(s"_c${k + 3 * i + 2}").cast("double").as("mid"): _*)
    }.reduce(_ unionByName _)
  }

  /** Read a reference Markov state-transition model file
    * (src/.../predictor/MarkovModelPredictor.java:500-543, the layouts
    * the Storm predictor loads): `states` fixes the N×N row/column
    * order. Compact: one model per line — key fields, then N·N
    * row-major probabilities. Long: a key line followed by N lines of N
    * probabilities. Model files are model-sized by definition, so the
    * parse is driver-side. Output: key (the joined original key
    * fields), fromState, toState, prob — the transition shape
    * `SeqOps.markovChainScore` / `ConfigRunner.runSequence` consume
    * (global models carry one empty-string key). */
  def readMarkovModel(spark: SparkSession, path: String,
      states: Seq[String], compact: Boolean = true,
      delim: String = ","): DataFrame = {
    import spark.implicits._
    val n = states.size
    val lines = spark.read.textFile(path).collect().toSeq
      .filter(_.nonEmpty)
    val rows =
      if (compact) lines.flatMap { line =>
        val items = line.split(delim)
        require(items.length >= n * n,
          s"compact markov line carries ${items.length} fields, need >= ${n * n}")
        val offset = items.length - n * n
        val key = items.take(offset).mkString(delim)
        for (i <- 0 until n; j <- 0 until n)
          yield (key, states(i), states(j), items(offset + i * n + j).toDouble)
      }
      else lines.grouped(n + 1).toSeq.flatMap { g =>
        require(g.length == n + 1,
          s"long markov block carries ${g.length} lines, need ${n + 1}")
        val key = g.head
        for (i <- 0 until n; (p, j) <- g(i + 1).split(delim).zipWithIndex)
          yield (key, states(i), states(j), p.toDouble)
      }
    rows.toDF("key", "fromState", "toState", "prob")
  }

  /** Export a fitted transition model (key, fromState, toState, prob)
    * as the reference's compact Markov layout — the write half of
    * [[readMarkovModel]], so a graft `Fitters.markovTransitions` fit can
    * feed a deployed reference predictor. */
  def writeMarkovModel(model: DataFrame, path: String, states: Seq[String],
      delim: String = ","): Unit = {
    val n = states.size
    val idx = states.zipWithIndex.toMap
    val lines = model
      .select(col("key").cast("string"), col("fromState"), col("toState"),
        col("prob").cast("double"))
      .collect() // model-sized
      .groupBy(_.getString(0))
      .toSeq.sortBy(_._1)
      .map { case (key, rs) =>
        val m = Array.fill(n * n)(0.0)
        rs.foreach { r =>
          m(idx(r.getString(1)) * n + idx(r.getString(2))) = r.getDouble(3)
        }
        (if (key.nonEmpty) key + delim else "") + m.mkString(delim)
      }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  /** Curated-corpus parquet layout for the 100 TB read path: hive
    * partitioning on low-cardinality slice keys (source, lang, split,
    * date — so slice reads touch only their directories: partition
    * PRUNING, not filtering) and a within-partition sort on the probe
    * keys (so parquet row-group min/max stats make point/range reads
    * skip pages: predicate PUSHDOWN with selective stats). One
    * `repartition` on the partition keys keeps writers to one task per
    * partition directory instead of `numShufflePartitions` small files
    * per directory — the small-files failure mode of naive partitioned
    * writes at scale.
    *
    * The engine addition the reference's flat text outputs cannot offer:
    * every downstream `spark.read.parquet(path).where(...)` over the
    * layout gets pruning + pushdown for free (PipelineSpec pins both in
    * the scan plan). */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String]): Unit = {
    val cols = partitionCols.map(col)
    val writer = df
      .repartition(cols: _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(path)
  }

  /** Read a reference per-key threshold file
    * (common/OutlierUtility.scala:101-111 — BasicUtils.getKeyedValues:
    * key fields at ordinals 0..keyLen−1, threshold at `thresholdOrd`,
    * default the field right after the key). Output: keyCols...,
    * threshold — the shape the per-key learned-threshold tagging (q72)
    * and `core.label`'s override column consume. */
  def readThresholdModel(spark: SparkSession, path: String,
      keyCols: Seq[String], thresholdOrd: Int = -1,
      delim: String = ","): DataFrame = {
    val k = keyCols.length
    val ord = if (thresholdOrd >= 0) thresholdOrd else k
    val raw = spark.read.option("delimiter", delim).csv(path)
    val keyed = keyCols.zipWithIndex.foldLeft(raw) { case (df, (c, i)) =>
      df.withColumnRenamed(s"_c$i", c)
    }
    keyed.select(keyCols.map(col) :+
      col(s"_c$ord").cast("double").as("threshold"): _*)
  }

  /** Write half of [[readThresholdModel]] — key fields then threshold. */
  def writeThresholdModel(model: DataFrame, path: String,
      keyCols: Seq[String], delim: String = ","): Unit =
    model.select(concat_ws(delim,
      (keyCols.map(col) :+ col("threshold")).map(_.cast("string")): _*)
      .as("line"))
      .coalesce(1).write.mode("overwrite").text(path)

  /** Read a reference median + MAD model file pair (the layout chombo's
    * MedianStatsManager serves per RobustZscorePredictor.java:72,
    * 144-146: per line, key fields..., attribute ordinal, value; the
    * manager answers getKeyedMedian(key, ord) / getKeyedMedAbsDivergence
    * (key, ord) from the med/mad file respectively — the class itself
    * lives in the external chombo tree, so the flat keyed-values layout
    * is inferred from those call sites like readStatsModel's was).
    * `attrByOrd` maps file attribute ordinals to engine column names.
    * Output: keyCols..., attr, med, mad — `Fitters.robustStats`' shape,
    * pluggable straight into `Scorers.robustZscore`. */
  def readMedianModel(spark: SparkSession, medPath: String, madPath: String,
      keyCols: Seq[String], attrByOrd: Map[Int, String],
      delim: String = ","): DataFrame = {
    val k = keyCols.length
    def keyed(path: String, valName: String): DataFrame = {
      val raw = spark.read.option("delimiter", delim).csv(path)
      val named = keyCols.zipWithIndex.foldLeft(raw) { case (df, (c, i)) =>
        df.withColumnRenamed(s"_c$i", c)
      }
      val attrMap = attrByOrd.map { case (o, n) => (o.toString, n) }
      val mapExpr = map(attrMap.toSeq
        .flatMap { case (o, n) => Seq(lit(o), lit(n)) }: _*)
      named.select(keyCols.map(col) :+
        coalesce(element_at(mapExpr, col(s"_c$k")), col(s"_c$k")).as("attr") :+
        col(s"_c${k + 1}").cast("double").as(valName): _*)
    }
    keyed(medPath, "med").join(keyed(madPath, "mad"), keyCols :+ "attr")
  }

  /** Write half of [[readMedianModel]]: a fitted robustStats model
    * (keyCols..., attr, med, mad) → the med and MAD files, attribute
    * names mapped back to file ordinals. */
  def writeMedianModel(model: DataFrame, medPath: String, madPath: String,
      keyCols: Seq[String], ordByAttr: Map[String, Int],
      delim: String = ","): Unit = {
    val ordMap = map(ordByAttr.toSeq
      .flatMap { case (n, o) => Seq(lit(n), lit(o.toString)) }: _*)
    def dump(valCol: String, path: String): Unit =
      model.select(concat_ws(delim,
        (keyCols.map(col) :+ coalesce(element_at(ordMap, col("attr")),
          col("attr")) :+ col(valCol)).map(_.cast("string")): _*).as("line"))
        .coalesce(1).write.mode("overwrite").text(path)
    dump("med", medPath)
    dump("mad", madPath)
  }

  /** Write a fitted isolation forest in the reference's tree-path model
    * file layout (the format IsolationForestPredictor.scala:108-133
    * consumes: per line, key fields..., treeId, the root-to-leaf
    * predicate chain "attr-split-LT:attr-split-GE:...", leaf record
    * count — split values at 6 decimals like the model job's
    * BasicUtils.formatDouble(splitVal, 6), IsolationForestModel
    * .scala:207-208). The model job writes `@`-separated predicates but
    * the predictor splits them on `-` (a reference-internal
    * inconsistency); this writer emits the `-` form the predictor
    * actually parses, and [[readIsolationForestModel]] accepts both.
    * The engine's composite key (parts joined by `keySep`) is split
    * back into its delimited key fields. Models are model-sized by
    * definition (score() broadcasts them), so the conversion is
    * driver-side. */
  def writeIsolationForestModel(
      model: org.apache.spark.sql.Dataset[graft.multi.IsolationForest.IsoNode],
      path: String, delim: String = ",", keySep: String = "|"): Unit = {
    val nodes = model.collect()
    val lines = nodes.groupBy(n => (n.key, n.treeId)).toSeq
      .sortBy { case ((k, t), _) => (k, t) }
      .flatMap { case ((key, t), ns) =>
        val byPath = ns.map(n => n.path -> n).toMap
        ns.filter(_.isLeaf).sortBy(_.path).map { leaf =>
          val preds = (1 until leaf.path.length).map { i =>
            val parent = byPath(leaf.path.substring(0, i))
            val op = if (leaf.path.charAt(i) == '0') "LT" else "GE"
            // Locale.ROOT: a comma-decimal default locale would corrupt
            // the delimited file
            parent.attr.toString + "-" + String.format(java.util.Locale.ROOT,
              "%.6f", Double.box(parent.split)) + "-" + op
          }.mkString(":")
          (key.split(java.util.regex.Pattern.quote(keySep)).toSeq :+
            t.toString :+ preds :+ leaf.size.toString).mkString(delim)
        }
      }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "part-00000"),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  /** Read a reference isolation-forest tree-path model file back into
    * the engine's [[graft.multi.IsolationForest.IsoNode]] shape —
    * internal nodes are reconstructed from the predicate chains (the
    * predicate at position j of any leaf under a node IS that node's
    * (attr, split)), so the result feeds `IsolationForest.score` and
    * `.merge` unchanged. Flag bits the reference ORs into treeId for
    * non-splittable paths (IsolationForestModel.scala:190-191) are
    * masked off. Internal-node sizes are not stored in the file (only
    * leaf path counts are); scoring never reads them. */
  def readIsolationForestModel(spark: SparkSession, path: String,
      keyParts: Int = 1, delim: String = ",", keySep: String = "|")
      : org.apache.spark.sql.Dataset[graft.multi.IsolationForest.IsoNode] = {
    import graft.multi.IsolationForest.IsoNode
    import spark.implicits._
    val pred = """(\d+)[-@](-?[0-9.eE+]+)[-@](LT|GE)""".r
    val lines = spark.read.textFile(path).collect()
    val nodes = collection.mutable.LinkedHashMap.empty[(String, Int, String), IsoNode]
    lines.filter(_.nonEmpty).foreach { line =>
      val f = line.split(java.util.regex.Pattern.quote(delim), -1)
      require(f.length >= keyParts + 3,
        s"iforest model line has ${f.length} fields, need >= ${keyParts + 3}: $line")
      val key = f.take(keyParts).mkString(keySep)
      val treeId = f(keyParts).toInt & ~((1 << 11) | (1 << 12))
      val preds = if (f(keyParts + 1).isEmpty) Array.empty[(Int, Double, String)]
        else f(keyParts + 1).split(":").map {
          case pred(a, s, op) => (a.toInt, s.toDouble, op)
          case other => throw new IllegalArgumentException(
            s"unparseable predicate '$other' in: $line")
        }
      val size = f(keyParts + 2).toInt
      val bits = preds.map(p => if (p._3 == "LT") '0' else '1')
      preds.indices.foreach { j =>
        val p = "R" + new String(bits.take(j))
        nodes.getOrElseUpdate((key, treeId, p),
          IsoNode(key, treeId, p, preds(j)._1, preds(j)._2,
            isLeaf = false, 0, j))
      }
      val leafPath = "R" + new String(bits)
      nodes.put((key, treeId, leafPath),
        IsoNode(key, treeId, leafPath, -1, 0.0, isLeaf = true, size,
          preds.length))
    }
    spark.createDataset(nodes.values.toSeq)
  }
}
