package graft

import graft.expr.{GraftFunctions, VecDot}
import org.apache.spark.sql.functions._

class ExprSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot native expression matches HOF formulation bit-for-bit") {
    GraftFunctions.register(spark)
    val df = Seq((Array(1.5, 2.5, -3.0), Array(0.5, 4.0, 2.0))).toDF("a", "b")
    val r = df.select(
      call_function("vec_dot", $"a", $"b").as("native"),
      aggregate(zip_with($"a", $"b", (p, q) => p * q), lit(0.0), (x, v) => x + v).as("hof"))
      .head()
    assert(r.getDouble(0) == r.getDouble(1))
    assert(r.getDouble(0) == 1.5 * 0.5 + 2.5 * 4.0 + (-3.0) * 2.0)
  }

  test("vec_dot casts float arrays, null-safe") {
    GraftFunctions.register(spark)
    val df = Seq((Some(Array(1.0f, 2.0f)), Array(3.0, 4.0)), (None, Array(1.0, 1.0)))
      .toDF("a", "b")
    val rows = df.selectExpr("vec_dot(a, b) as d").collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
  }

  test("vec_dot / vec_euclid return NULL on malformed vectors (advice r7)") {
    GraftFunctions.register(spark)
    // length mismatch → NULL (both interpreted eval and codegen paths);
    // null ELEMENT → NULL; matching well-formed row stays non-null
    val mism = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0)),
      (Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    val r = mism.selectExpr("vec_dot(a, b) as d", "vec_euclid(a, b) as e").collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1))
    assert(r(1).getDouble(0) == 11.0)
    val withNullElem = spark.sql(
      "SELECT vec_dot(array(1.0d, NULL), array(2.0d, 3.0d)) AS d, " +
        "vec_euclid(array(1.0d, NULL), array(2.0d, 3.0d)) AS e")
      .collect()(0)
    assert(withNullElem.isNullAt(0) && withNullElem.isNullAt(1))
  }

  test("vec_dot participates in whole-stage codegen (no interpreted lambda)") {
    GraftFunctions.register(spark)
    val df = spark.range(10).selectExpr("array(cast(id as double), 2.0) as a")
      .selectExpr("vec_dot(a, a) as d")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vec_dot"))  // * prefix = inside WholeStageCodegen
  }

  test("vec_euclid matches the HOF formulation bit-for-bit, float-casting") {
    GraftFunctions.register(spark)
    val df = Seq((Array(1.5, 2.5, -3.0), Array(0.5, 4.0, 2.0))).toDF("a", "b")
    val r = df.select(
      call_function("vec_euclid", $"a", $"b").as("native"),
      sqrt(aggregate(zip_with($"a", $"b", (p, q) => (p - q) * (p - q)),
        lit(0.0), (x, v) => x + v)).as("hof"))
      .head()
    assert(r.getDouble(0) == r.getDouble(1), "identical accumulation order")
    val f = Seq((Array(3.0f, 0.0f), Array(0.0, 4.0))).toDF("a", "b")
      .selectExpr("vec_euclid(a, b) as d").head()
    assert(f.getDouble(0) == 5.0)
  }

  test("vec_euclid participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    val df = spark.range(10).selectExpr("array(cast(id as double), 2.0) as a")
      .selectExpr("vec_euclid(a, a) as d")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vec_euclid"))
  }

  test("vec_nearest matches the struct-argmin formulation on every row") {
    GraftFunctions.register(spark)
    // deterministic pseudo-random vectors (md5-derived), plus tie and
    // short-vector edge cases
    val dim = 5
    val cents = Array.tabulate(4, dim)((ci, d) =>
      ((ci * 31 + d * 17) % 13 - 6) / 3.0)
    val ccs = cents.map(c => c.map(x => x * x).sum)
    // fixed-dim vectors only: vec_dot now returns NULL on a length
    // mismatch (the HOF contract, advice r7) while vec_nearest keeps its
    // documented min-length truncation — short vectors are covered by the
    // dedicated malformed-vector test below
    val vecs = (0 until 200).map { r =>
      (r.toLong, Array.tabulate(dim)(d =>
        ((r * 37 + d * 101) % 29 - 14) / 5.0))
    } :+ (1000L, cents(2).clone()) // exact centroid hit
    val df = vecs.toDF("id", "v")
    val fast = graft.expr.GraftFunctions.vecNearest(spark, $"v", cents, ccs)
    def relD2(ci: Int) = lit(ccs(ci)) - lit(2.0) *
      call_function("vec_dot", $"v", array(cents(ci).map(lit(_)): _*))
    val slow = array_min(array(cents.indices.map(ci =>
      struct(relD2(ci).as("d"), lit(ci).as("c"))): _*)).getField("c")
    val bad = df.select($"id", fast.as("fast"), slow.as("slow"))
      .where($"fast" =!= $"slow")
    assert(bad.count() == 0, bad.collect().mkString(", "))
  }

  test("vec_nearest ties go to the lowest centroid index") {
    GraftFunctions.register(spark)
    val cents = Array(Array(1.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))
    val ccs = cents.map(c => c.map(x => x * x).sum)
    val df = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0))).toDF("id", "v")
    val r = df.select($"id",
      graft.expr.GraftFunctions.vecNearest(spark, $"v", cents, ccs).as("c"))
      .orderBy("id").collect()
    assert(r(0).getInt(1) == 0) // centroids 0 and 1 tie → lowest index
    assert(r(1).getInt(1) == 2)
  }

  test("vec_nearest stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val cents = Array(Array(1.0, 2.0), Array(3.0, 4.0))
    val ccs = cents.map(c => c.map(x => x * x).sum)
    val df = spark.range(10).selectExpr("array(cast(id as double), 2.0) as v")
      .select(graft.expr.GraftFunctions.vecNearest(spark, $"v", cents, ccs).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vec_nearest"))
  }

  test("vec_nearest_q matches the long zip_with/aggregate formulation") {
    GraftFunctions.register(spark)
    val cents = Array.tabulate(4, 5)((ci, d) => ((ci * 31 + d * 17) % 13 - 6).toLong)
    val vecs = (0 until 200).map { r =>
      (r.toLong, Array.tabulate(if (r % 7 == 0) 3 else 5)(d =>
        ((r * 37 + d * 101) % 29 - 14).toLong))
    } :+ (1000L, cents(2).clone()) // exact centroid hit -> d = 0
    val df = vecs.toDF("id", "v")
    val fast = graft.expr.GraftFunctions.vecNearestQ(spark, $"v", cents)
    // truncate the centroid to the vector's length first: zip_with pads
    // the shorter side with nulls, while the expression (like
    // vec_nearest) scores over the common prefix
    def d2(ci: Int) = aggregate(
      zip_with($"v", slice(typedlit(cents(ci).toSeq), lit(1), size($"v")),
        (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
    val slow = array_min(array(cents.indices.map(ci =>
      struct(d2(ci).as("d"), lit(ci).as("cell"))): _*))
    val bad = df.select($"id", fast.as("f"), slow.as("s"))
      .where($"f.cell" =!= $"s.cell" || $"f.d" =!= $"s.d")
    assert(bad.count() == 0, bad.collect().mkString(", "))
    // exact hit
    val hit = df.where($"id" === 1000L).select(fast.as("f")).collect()(0)
      .getStruct(0)
    assert(hit.getLong(0) == 0L && hit.getInt(1) == 2)
  }

  test("vec_nearest_q ties go to the lowest cell; stays in codegen") {
    GraftFunctions.register(spark)
    val cents = Array(Array(1L, 0L), Array(1L, 0L), Array(0L, 1L))
    val df = Seq((1L, Array(1L, 0L)), (2L, Array(0L, 1L))).toDF("id", "v")
    val r = df.select($"id",
      graft.expr.GraftFunctions.vecNearestQ(spark, $"v", cents).as("b"))
      .orderBy("id").collect()
    assert(r(0).getStruct(1).getInt(1) == 0)
    assert(r(1).getStruct(1).getInt(1) == 2)
    val plan = spark.range(10)
      .selectExpr("array(id, id + 1) as v")
      .select(graft.expr.GraftFunctions.vecNearestQ(spark, $"v", cents).as("b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vec_nearest_q"))
  }

  test("bit_hamming counts differing bits") {
    GraftFunctions.register(spark)
    val r = Seq((0xFFL, 0x0FL)).toDF("a", "b")
      .selectExpr("bit_hamming(a, b) as h").head()
    assert(r.getLong(0) == 4L)
  }

  test("minhash_sig matches the shuffle-based formulation exactly") {
    GraftFunctions.register(spark)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "pack my box with five dozen liquor jugs today"),
      (4L, "too few")).toDF("doc_id", "text")
    val fast = graft.text.TextOps.minhash(docs, "doc_id", "text", 3, 16)
    // reference formulation: explode shingles → min per (doc, hashIdx)
    val sh = graft.text.TextOps.shingles(docs, "doc_id", "text", 3)
      .withColumn("x", graft.text.TextOps.hash56($"shingle") % graft.text.TextOps.P)
    val slow = graft.text.TextOps.hashParams(16).zipWithIndex.map { case ((a, b), i) =>
      sh.groupBy($"doc_id").agg(min(($"x" * a + b) % graft.text.TextOps.P).as("minHash"))
        .withColumn("hashIdx", lit(i))
    }.reduce(_ unionByName _).select("doc_id", "hashIdx", "minHash")
    assert(fast.count() == 3 * 16) // doc 4 has < 3 tokens → no signature
    assert(fast.except(slow).count() == 0 && slow.except(fast).count() == 0)
  }

  test("minhash_sig stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val plan = graft.text.TextOps.minhash(df, "doc_id", "text", 3, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange")) // signature is per-row: zero shuffles
    assert(plan.contains("minhash_sig"))
  }

  test("local kmeans recovers well-separated clusters, deterministic") {
    val rng = new scala.util.Random(7)
    val pts = Array.tabulate(300) { i =>
      val c = i % 3
      Array(c * 100.0 + rng.nextGaussian(), c * 100.0 + rng.nextGaussian())
    }
    val c1 = core.LocalKMeans.fit(pts, 3, seed = 42L)
    val c2 = core.LocalKMeans.fit(pts, 3, seed = 42L)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    val found = c1.map(c => math.round(c(0) / 100.0)).sorted.toSeq
    assert(found == Seq(0L, 1L, 2L))
    c1.foreach { c => assert(math.abs(c(0) - c(1)) < 5.0) } // on the diagonal
  }

  test("cosineFast == cosine on the embeddings table") {
    val e = core.table(spark, sfDir, "embeddings").limit(50)
    val pairs = e.select($"vec_id".as("i"), $"embedding".as("va"))
      .crossJoin(e.select($"vec_id".as("j"), $"embedding".as("vb")))
      .where($"i" < $"j").limit(200)
    val cmp = pairs.select(
      graft.sim.Similarity.cosine($"va", $"vb").as("slow"),
      graft.sim.Similarity.cosineFast(spark, $"va", $"vb").as("fast"))
    assert(cmp.where($"slow" =!= $"fast").count() == 0)
  }

  test("spark.sql.extensions deployment path registers the native functions") {
    import org.apache.spark.sql.SparkSession
    // a session built with GraftExtensions (the spark-submit deployment
    // path --conf spark.sql.extensions=graft.expr.GraftExtensions runs
    // the same class; the static conf itself only binds on a FRESH
    // SparkContext, which a shared test JVM cannot make, so the spec
    // drives the builder's withExtensions face of the identical hook)
    // must expose the functions to PLAIN SQL with no register() call.
    val orig = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.expr.GraftExtensions())
        .getOrCreate()
      assert(s2 ne orig, "builder must have created a fresh session")
      val r = s2.sql(
        """SELECT minhash_sig(array('a','b','c','d'), 3, 4) AS sig,
          |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |  bit_hamming(5L, 6L) AS h""".stripMargin).head()
      assert(r.getSeq[Long](0).size == 4)
      assert(r.getAs[Double]("d") == 11.0)
      assert(r.getAs[Long]("h") == 2L) // 101 vs 110
    } finally {
      // do NOT stop s2 — it shares the spec suite's SparkContext
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("jaro_winkler: textbook values, symmetry, edges") {
    GraftFunctions.register(spark)
    def jw(a: String, b: String): Double =
      Seq((a, b)).toDF("a", "b").selectExpr("jaro_winkler(a, b) as j")
        .head().getDouble(0)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-10)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "") == 1.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("abc", "xyz") == 0.0)           // zero matches
    assert(jw("MARTHA", "MARHTA") == jw("MARHTA", "MARTHA"))
    // boost only above 0.7: a low-sim shared-prefix pair stays unboosted
    val lo = jw("ab", "ba")                    // jaro ≤ 0.7 region
    assert(lo <= 0.7 + 1e-12)
  }

  test("jaro_winkler runs inside whole-stage codegen and matches interpreted eval") {
    GraftFunctions.register(spark)
    val df = spark.range(50).selectExpr(
      "concat('name_', cast(id as string)) as a",
      "concat('nmae_', cast(id % 7 as string)) as b")
    val plan = df.selectExpr("jaro_winkler(a, b) as j")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [jaro_winkler"))
    val gen = df.selectExpr("jaro_winkler(a, b) as j").collect().map(_.getDouble(0))
    val interp = df.collect().map(r =>
      graft.expr.JaroWinkler.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)),
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1))))
    assert(gen.sameElements(interp))
  }
}
