package graft

import graft.io.SheetReader
import graft.rules._
import graft.types.CellType
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY §5): evaluated in ONE Spark pass per property over
  * a generated batch (per-case Spark jobs would be pathologically slow).
  */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val cellGen: Gen[String] = Gen.oneOf(
    Gen.numStr.map(_.take(8)),
    Gen.choose(-1e6, 1e6).map(_.toString),
    Gen.oneOf("", "N/A", "abc", "Positive", "1_000", "_5", "a_b_c", " 7 "),
    Gen.choose(1900, 2100).flatMap(y => Gen.choose(1, 12).flatMap(m =>
      Gen.choose(1, 28).map(dd => f"$y%04d-$m%02d-$dd%02d"))),
    Gen.choose(0, 23).flatMap(h => Gen.choose(0, 59).map(m => f"$h%02d:$m%02d:00")),
    Gen.alphaNumStr.map(_.take(12)))

  test("trichotomy: every cell is exactly one of number/datetime/string") {
    import spark.implicits._
    val values = sample(cellGen, 400).distinct
    val df = values.toDF("v").select(
      col("v"),
      CellType.isNumber(col("v")).as("n"),
      CellType.isDateTime(col("v")).as("d"),
      CellType.isString(col("v")).as("s"))
    val bad = df.filter(
      (col("n").cast("int") + col("d").cast("int") + col("s").cast("int")) =!= 1)
      .collect()
    assert(bad.isEmpty, bad.mkString(", "))
  }

  test("underscore guard: '_' at position >= 1 forces string") {
    import spark.implicits._
    val values = sample(cellGen, 200).map(v => if (v.isEmpty) "1_2" else v.head + "_" + v)
    val df = values.toDF("v")
      .filter(CellType.isNumber(col("v")) || CellType.isDateTime(col("v")))
      .filter(col("v").rlike("^[^_].*_"))
    assert(df.count() == 0)
  }

  test("dedupFirst is idempotent") {
    val sheet = SheetReader.fromRows(spark, Seq("X"),
      sample(cellGen, 100).map(Seq(_)))
    val rule1 = CompiledRule("X", col("X").rlike("[0-9]"), lit("Error"),
      lit("m1"), keepBlank = false, Seq("X"))
    val rule2 = CompiledRule("X", length(col("X")) > 2, lit("Warning"),
      lit("m2"), keepBlank = false, Seq("X"))
    val errors = RuleEvaluator.evaluate("t.csv", sheet, Seq(rule1, rule2))
    val once = RuleEvaluator.dedupFirst(errors)
    val twice = RuleEvaluator.dedupFirst(once)
    assert(once.collect().map(_.toString).sorted.toSeq ===
      twice.collect().map(_.toString).sorted.toSeq)
  }

  test("monotonicity: appending rows never removes existing errors") {
    val base = sample(cellGen, 60).map(Seq(_))
    val extra = Seq(Seq("definitely-bad-999"))
    val rules = Seq(Checks.number("X", NoGate, naAllowed = false,
      PyI(0), PyI(100), "int"))
    def errOf(rows: Seq[Seq[String]]): Set[String] =
      RuleEvaluator.dedupFirst(RuleEvaluator.evaluate("t.csv",
        SheetReader.fromRows(spark, Seq("X"), rows), rules))
        .select("Row_Index", "Column_Value").collect().map(_.toString).toSet
    val before = errOf(base)
    val after = errOf(base ++ extra)
    assert(before.subsetOf(after))
  }

  test("participant presence patterns partition the miss space") {
    // the 6 patterns cover every (prior, demo, bio) combo except all-present
    // and none-present, and are pairwise disjoint
    val combos = for {
      p <- Seq(true, false); dm <- Seq(true, false); b <- Seq(true, false)
    } yield (p, dm, b)
    val patterns: Seq[(Boolean, Boolean, Boolean) => Boolean] = Seq(
      (p, dm, b) => p && !dm && !b,
      (p, dm, b) => !p && dm && !b,
      (p, dm, b) => !p && !dm && b,
      (p, dm, b) => p && dm && !b,
      (p, dm, b) => p && !dm && b,
      (p, dm, b) => !p && dm && b)
    combos.foreach { case (p, dm, b) =>
      val hits = patterns.count(f => f(p, dm, b))
      if ((p && dm && b) || (!p && !dm && !b)) assert(hits == 0)
      else assert(hits == 1, s"($p,$dm,$b) hit $hits patterns")
    }
  }

  test("integer-cents sum: per-row recovery and partition-order invariance") {
    import spark.implicits._
    val cents = sample(Gen.choose(0L, 10_000_000L), 4000) // up to 100,000.00
    val df = cents.map(_ / 100.0).toDF("x")
    // per-row: floor(x*100+0.5) recovers the exact cents despite the
    // double representation error of x
    val recovered = df.select(floor(col("x") * 100 + 0.5).cast("long"))
      .collect().map(_.getLong(0))
    assert(recovered.toSeq === cents)
    // aggregate: exact and identical under any partitioning
    def total(parts: Int): Double = df.repartition(parts)
      .select((sum(floor(col("x") * 100 + 0.5).cast("long"))
        .cast("double") / 100.0).as("s")).collect()(0).getDouble(0)
    val expected = cents.sum.toDouble / 100.0
    assert(total(1) === expected)
    assert(total(7) === expected)
  }

  test("bounded-buffer top-k equals the window form on generated data") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val rows = sample(Gen.zip(Gen.choose(0, 5), Gen.choose(0L, 1000L)), 800)
      .zipWithIndex.map { case ((g, v), i) => (g.toString, v / 10.0, i.toLong) }
    val df = rows.toDF("g", "v", "id")
    val viaAgg = operators.TopK.perGroup(df, "g", "v", "id", 3)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getInt(3))).toSet
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val viaWindow = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(viaAgg === viaWindow)
  }

  test("approx percentile verdict holds: GK estimate within 2% of exact (q66)") {
    val rows = QueryRegistry.queries("q66_approx_percentile")(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Double]("p50_exact") > 0, r.toString)
      assert(r.getAs[Boolean]("approx_within_2pct"), r.toString)
    }
  }

  test("sketch overlap verdicts hold; sketch algebra is consistent (q140)") {
    import org.apache.spark.sql.functions._
    val rows = QueryRegistry.queries("q140_sketch_overlap")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows(0)
    // inclusion-exclusion identity on the exact side
    assert(r.getAs[Long]("overlap_exact") ===
      r.getAs[Long]("a_exact") + r.getAs[Long]("b_exact") - r.getAs[Long]("u_exact"))
    // doc_id % 6 == 0 rows are in both slices, so overlap is non-trivial
    assert(r.getAs[Long]("overlap_exact") > 0)
    Seq("a_within_5pct", "b_within_5pct", "union_within_5pct",
      "overlap_within_20pct").foreach(c => assert(r.getAs[Boolean](c), c))
    // sketch algebra: the union estimate can never fall below either
    // side's estimate (register-max union only raises registers)
    val docs = Tables.documents(spark, sf)
    def sk(m: Int) = docs.filter(col("doc_id") % m === 0)
      .select(md5(col("text")).as("fp"))
      .agg(hll_sketch_agg(col("fp")).as(s"sk$m")).withColumn("k", lit(1))
    val est = sk(2).join(broadcast(sk(3)), "k").select(
      hll_sketch_estimate(col("sk2")).as("ea"),
      hll_sketch_estimate(col("sk3")).as("eb"),
      hll_sketch_estimate(hll_union(col("sk2"), col("sk3"))).as("eu"))
      .collect()(0)
    assert(est.getAs[Long]("eu") >= math.max(est.getAs[Long]("ea"),
      est.getAs[Long]("eb")))
  }

  test("HLL approx distinct verdict holds: estimate within 5% of exact (q54)") {
    val rows = QueryRegistry.queries("q54_approx_distinct")(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_parts") > 0, r.toString)
      assert(r.getAs[Boolean]("approx_within_5pct"), r.toString)
    }
  }
}
