package graft

import graft.core.Layout
import graft.post.PostOps
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Layout planners (z-order, range boundaries), robust transforms
  * (winsorize, inverse-normal, Box–Cox) and sorted-neighborhood ER —
  * kernel facts the oracle replay can't pin. */
class LayoutTransformSpec extends SparkSpec {
  import spark.implicits._

  test("zOrderKey: hand-checked morton interleave") {
    val df = Seq((3L, 1L), (0L, 0L), (1023L, 0L), (0L, 1023L))
      .toDF("a", "b")
      .withColumn("z", Layout.zOrderKey(col("a"), col("b"), 10))
    val z = df.collect().map(_.getAs[Long]("z"))
    // a=0b11,b=0b01: a→bits0,2 (0b101=5), b→bit1 (0b010=2) → 7
    assert(z(0) == 7L)
    assert(z(1) == 0L)
    // a=all ones → even bits of 20: 0x55555 ; b=all ones → odd bits
    assert(z(2) == 0x55555L && z(3) == 0xAAAAAL)
  }

  test("zOrderLayout: file ids are z-contiguous and complete") {
    val df = (0 until 1024).flatMap(a => Seq((a.toLong, (a * 7 % 1024).toLong)))
      .toDF("a", "b")
    val out = Layout.zOrderLayout(df, col("a"), col("b"), 10, 32)
    assert(out.select(max("file_id")).collect()(0).getLong(0) == 31L)
    assert(out.select(min("file_id")).collect()(0).getLong(0) == 0L)
    // file id is monotone in zkey
    val viol = out.select((col("zkey") * 32).as("s"), col("file_id"))
      .where(shiftright(col("s"), 20) =!= col("file_id")).count()
    assert(viol == 0L)
  }

  test("rangePlanner: uniform data balances within one value's worth") {
    val df = (1 to 1600).map(i => (i % 400).toDouble).toDF("v")
    val plan = Layout.rangePlanner(df, "v", 8).collect()
      .sortBy(_.getAs[Long]("pid"))
    assert(plan.length == 8)
    assert(plan.map(_.getAs[Long]("n_rows")).sum == 1600L)
    plan.foreach(r => assert(math.abs(r.getAs[Long]("n_rows") - 200L) <= 4,
      s"uniform split stays near n/P: $r"))
    // ranges are disjoint and ordered
    val his = plan.map(_.getAs[Double]("hi"))
    assert(his.sorted.sameElements(his))
  }

  test("rangePlanner: one dominant value produces honest empty ranges") {
    val df = ((1 to 1000).map(_ => 5.0) ++ Seq(1.0, 9.0)).toDF("v")
    val plan = Layout.rangePlanner(df, "v", 4).collect()
    val empty = plan.count(_.getAs[Long]("n_rows") == 0L)
    assert(empty >= 2, s"ties collapse boundaries into empty ranges: " +
      plan.mkString(", "))
    assert(plan.map(_.getAs[Long]("n_rows")).sum == 1002L)
  }

  test("winsorize: bounds clamp exactly alpha tails, repairs flagged") {
    val df = (1 to 100).map(i => ("k", i.toLong, i.toDouble))
      .toDF("g", "id", "v")
    val r = PostOps.winsorize(df, Seq("g"), "id", "v", alpha = 0.1)
    val clipped = r.where(col("clipped")).count()
    assert(clipped == 18L, // 9 below rank 10's value, 9 above rank 91's
      s"values outside [v(10)=10, v(91)=91] are repaired: $clipped")
    val mm = r.agg(min("winsorized"), max("winsorized")).collect()(0)
    assert(mm.getDouble(0) == 10.0 && mm.getDouble(1) == 91.0)
  }

  test("probit: matches known normal quantiles to approximation accuracy") {
    val df = Seq(0.5, 0.975, 0.025, 0.001, 0.999, 0.1587).toDF("p")
      .withColumn("z", PostOps.probit(col("p")))
    val z = df.collect().map(_.getAs[Double]("z"))
    val expect = Seq(0.0, 1.959964, -1.959964, -3.090232, 3.090232, -0.999815)
    z.zip(expect).foreach { case (got, e) =>
      assert(math.abs(got - e) < 1e-4, s"probit: got $got want $e")
    }
  }

  test("int transform: output is symmetric and ordered like the input") {
    val df = (1 to 99).map(i => ("k", i.toLong, (i * 13 % 101).toDouble))
      .toDF("g", "id", "v")
    val r = PostOps.intTransform(df, Seq("g"), "id", "v")
      .select("v", "z").collect().map(x => x.getDouble(0) -> x.getDouble(1))
    val sum = r.map(_._2).sum
    assert(math.abs(sum) < 1e-6, s"Blom scores are symmetric: $sum")
    val sorted = r.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (x, y) => x < y },
      "z is strictly increasing in v when values are distinct")
  }

  test("box-cox: log-shaped data picks lambda 0, linear data lambda 1") {
    val grid = Seq(-1.0, -0.5, 0.0, 0.5, 1.0, 2.0)
    // x = exp(u), u symmetric triangle-ish: ln x is 'nice' → λ=0
    val logd = (1 to 500).map(i => ("k", math.exp(((i * 17) % 101) / 25.0)))
      .toDF("g", "v")
    val b0 = PostOps.boxCoxFit(logd, Seq("g"), "v", grid)
      .where(col("best")).collect()(0)
    assert(b0.getAs[Double]("lambda") == 0.0, s"log data: $b0")
    // already-symmetric data keeps λ near 1 (identity-ish)
    val lin = (1 to 500).map(i => ("k", 100.0 + ((i * 17) % 101)))
      .toDF("g", "v")
    val b1 = PostOps.boxCoxFit(lin, Seq("g"), "v", grid)
      .where(col("best")).collect()(0)
    assert(math.abs(b1.getAs[Double]("lambda")) >= 0.5, s"linear data: $b1")
  }

  test("sorted-neighborhood: adjacent near-duplicates found, O(n*w) pairs") {
    val docs = Seq(
      (1L, "en", "acme corporation ltd"),
      (2L, "en", "acme corporation ltd."),
      (3L, "en", "zeta industries"),
      (4L, "en", "acme corp ltd"),
      (5L, "de", "acme corporation ltd")).toDF("doc_id", "lang", "name")
    val r = TextOps.sortedNeighborhood(docs, "doc_id", "name", "lang",
      windowSize = 3, minSim = 0.85)
    val pairs = r.select("a", "b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 1L)),
      s"the sorted neighbors 1,2 match: $pairs")
    // cross-block pair (5 is 'de') never appears
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    // pair count bounded by n*(w-1)
    assert(r.count() <= 5L * 2)
  }
}
