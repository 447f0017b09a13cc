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

  // ---- float-domain corner fuzzing (round-12 corners, pinned) --------
  // Each generator family carries its GOLDEN class — what the reference's
  // convert_data_type does: underscore guard first, then Python float(),
  // then the date cascade, else string. A future date-cascade or
  // asNumber edit that shifts any boundary fails here with the exact
  // offending strings.

  private val digits: Gen[String] =
    Gen.chooseNum(0L, 999999L).map(_.toString)

  /** Java-only hex-float/hex-int literals: Python float() raises. */
  private val hexGen: Gen[String] = for {
    pre <- Gen.oneOf("0x", "0X")
    body <- Gen.listOfN(3, Gen.oneOf("0123456789abcdefABCDEF".toSeq))
      .map(_.mkString)
    frac <- Gen.oneOf("", ".8", ".Fa")
    exp <- Gen.oneOf("", "p1", "P3", "p-2")
    sign <- Gen.oneOf("", "-", "+")
  } yield s"$sign$pre$body$frac$exp"

  /** Java-only [dDfF]-suffixed numerics: Python float() raises. */
  private val suffixGen: Gen[String] = for {
    n <- digits
    frac <- Gen.oneOf("", ".5", ".25")
    exp <- Gen.oneOf("", "e3", "E-2")
    suf <- Gen.oneOf("d", "D", "f", "F")
  } yield s"$n$frac$exp$suf"

  /** inf/nan spellings both engines' float() accepts -> NUMBER. */
  private val infNanGen: Gen[String] = Gen.oneOf(
    "inf", "Inf", "INF", "-inf", "+inf", "infinity", "Infinity",
    "-Infinity", "nan", "NaN", "NAN", "-nan")

  /** '_' at position >= 1 fires the reference's guard -> STRING even for
    * Python-parseable shapes like 1_000; a LEADING '_' skips the guard
    * but float()/the cascade both reject -> STRING too.
    */
  private val underscoreGen: Gen[String] = Gen.oneOf(
    for { a <- digits; b <- digits } yield s"${a}_$b",
    digits.map(d => s"_$d"),
    for { a <- digits; b <- digits; c <- digits } yield s"${a}_${b}_$c")

  /** M/d/yy and d-MMM-yy two-digit-year dates -> DATE, with the pinned
    * dateutil pivot (00-75 -> 20xx, 76-99 -> 19xx) checked via render.
    */
  private val y2Gen: Gen[(String, Int)] = for {
    y <- Gen.chooseNum(0, 99)
    m <- Gen.chooseNum(1, 12)
    d <- Gen.chooseNum(1, 28)
    form <- Gen.oneOf(0, 1)
  } yield {
    val mon = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug",
      "Sep", "Oct", "Nov", "Dec")(m - 1)
    val s = if (form == 0) f"$m/$d/$y%02d" else f"$d-$mon-$y%02d"
    (s, if (y <= CellType.twoDigitYearPivot) 2000 + y else 1900 + y)
  }

  /** Python-valid float shapes -> NUMBER (leading dot, trailing dot,
    * signs, scientific, padding).
    */
  private val plainNumGen: Gen[String] = for {
    n <- digits
    shape <- Gen.chooseNum(0, 8)
  } yield shape match {
    case 0 => n
    case 1 => s"+$n"
    case 2 => s"-$n"
    case 3 => s".$n"
    case 4 => s"$n."
    case 5 => s"$n.25"
    case 6 => s"${n}e2"
    case 7 => s"${n}E-3"
    case _ => s" $n "
  }

  private def classify(values: Seq[(String, String)]): Seq[(String, String, String)] = {
    import spark.implicits._
    values.toDF("v", "expect").select(
      col("v"), col("expect"),
      when(CellType.isNumber(col("v")), "number")
        .when(CellType.isDateTime(col("v")), "date")
        .otherwise("string").as("got"),
      (CellType.isNumber(col("v")).cast("int") +
        CellType.isDateTime(col("v")).cast("int") +
        CellType.isString(col("v")).cast("int")).as("arms"))
      .filter(col("got") =!= col("expect") || col("arms") =!= 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq
  }

  test("float-domain corners: >=1k generated cases per class, classification pinned to the reference model") {
    val n = 1200
    val stringCases =
      sample(hexGen, n).map(_ -> "string") ++
      sample(suffixGen, n).map(_ -> "string") ++
      sample(underscoreGen, n).map(_ -> "string")
    val numberCases =
      sample(plainNumGen, n).map(_ -> "number") ++
      (0 until n).map(i => sample(infNanGen, 1).head -> "number").take(n)
    val dateCases = sample(y2Gen, n).map(_._1 -> "date")
    assert(stringCases.size >= 1000 && numberCases.size >= 1000 &&
      dateCases.size >= 1000)
    val bad = classify(stringCases ++ numberCases ++ dateCases)
    assert(bad.isEmpty, s"${bad.size} misclassified, first 20: " +
      bad.take(20).mkString(", "))
  }

  test("two-digit-year pivot is pinned: render applies 00-75 -> 20xx, 76-99 -> 19xx") {
    import spark.implicits._
    val cases = sample(y2Gen, 1200)
    val got = cases.map(_._1).toDF("v")
      .select(col("v"), CellType.render(col("v")).as("r"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (s, expectYear) =>
      assert(got(s).startsWith(expectYear.toString),
        s"'$s' rendered '${got(s)}', expected year $expectYear")
    }
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
