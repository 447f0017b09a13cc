package graft

import graft.dispatch.{MergeTables, SheetCatalog}
import graft.io.SheetReader
import graft.rules._
import graft.types.CellType
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDate

class CellTypeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def classify(values: Seq[String]): Map[String, String] = {
    import spark.implicits._
    val df = values.toDF("v")
    df.select(col("v"),
      when(CellType.isNumber(col("v")), "number")
        .when(CellType.isDateTime(col("v")), "datetime")
        .otherwise("string").as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("trichotomy matches convert_data_type semantics") {
    val got = classify(Seq(
      "3", "3.5", "-2", "5e3", " 7 ",          // numbers
      "2020-01-01", "1/2/2020", "03:00:00", "2020-01-01 10:30:00", // datetimes
      "1_000", "12_123456", "N/A", "", "abc", "Positive", // strings ('_' guard)
      "_5"                                      // leading underscore -> float fails -> string
    ))
    assert(got("3") == "number"); assert(got("3.5") == "number")
    assert(got("-2") == "number"); assert(got("5e3") == "number")
    assert(got(" 7 ") == "number")
    assert(got("2020-01-01") == "datetime"); assert(got("1/2/2020") == "datetime")
    assert(got("03:00:00") == "datetime"); assert(got("2020-01-01 10:30:00") == "datetime")
    assert(got("1_000") == "string"); assert(got("12_123456") == "string")
    assert(got("N/A") == "string"); assert(got("") == "string")
    assert(got("abc") == "string"); assert(got("Positive") == "string")
    assert(got("_5") == "string")
  }

  test("Java-only float literals are strings (reference float() rejects them); inf/nan match both engines") {
    val got = classify(Seq("1d", "2.5f", "1e3F", "0x1.8p1", "0X2", // Java-only -> string
      "inf", "Infinity", "NaN",                                    // both engines accept
      "grand", "leaf"))                                            // word endings unaffected
    Seq("1d", "2.5f", "1e3F", "0x1.8p1", "0X2").foreach(v =>
      assert(got(v) == "string", v))
    Seq("inf", "Infinity", "NaN").foreach(v => assert(got(v) == "number", v))
    Seq("grand", "leaf").foreach(v => assert(got(v) == "string", v))
  }

  test("dateutil-permissive forms: month names, ordinals, 2-digit years") {
    val got = classify(Seq(
      "Sept 3, 2021",  // the one 4-letter abbreviation in dateutil's parserinfo
      "Jan 3, 2021", "january 3 2021", "JAN. 3rd, 2021",  // month-first
      "3 Jan 2021", "3-Jan-21", "3rd january, 1999",       // day-first
      "1/3/21", "1/3/76", "1/3/75",                        // M/d/yy (pivot)
      "Jan 2021",      // no day: dateutil resolves vs today -> excluded
      "Foo 3, 2021",   // not a month token
      "Feb 31, 2021",  // illegal day-of-month
      "20210103"       // digit-only: float() wins in the reference too
    ))
    Seq("Sept 3, 2021", "Jan 3, 2021", "january 3 2021", "JAN. 3rd, 2021",
      "3 Jan 2021", "3-Jan-21", "3rd january, 1999",
      "1/3/21", "1/3/76", "1/3/75")
      .foreach(v => assert(got(v) == "datetime", v))
    Seq("Jan 2021", "Foo 3, 2021", "Feb 31, 2021")
      .foreach(v => assert(got(v) == "string", v))
    assert(got("20210103") == "number")
    // rendered values pin month mapping and the 2026-era year pivot:
    // 00-75 -> 20xx, 76-99 -> 19xx (dateutil's half-century window)
    import spark.implicits._
    val rendered = Seq("Jan 3, 2021", "3-Jan-21", "3-Jan-76", "1/3/75",
      "1/3/76", "31 dec 99").toDF("v")
      .select(CellType.render(col("v"))).as[String].collect()
    assert(rendered.toSeq == Seq(
      "2021-01-03 00:00:00", "2021-01-03 00:00:00", "1976-01-03 00:00:00",
      "2075-01-03 00:00:00", "1976-01-03 00:00:00", "1999-12-31 00:00:00"))
  }

  test("render mimics pandas str() of converted cells") {
    import spark.implicits._
    val got = Seq("05", "5.5", "2020-01-01", "abc").toDF("v")
      .select(CellType.render(col("v"))).as[String].collect()
    assert(got.toSeq == Seq("5.0", "5.5", "2020-01-01 00:00:00", "abc"))
  }

  test("render stays positional where Python does (no Java scientific)") {
    import spark.implicits._
    // Java's Double.toString goes scientific at 1e7 and below 1e-3;
    // Python str() (the reference) stays positional until 1e16 / 1e-4.
    // Each pair: raw cell -> expected Python str(float(cell)).
    val cases = Seq(
      "10000001" -> "10000001.0",      // the sf1 id regression
      "123456789012345" -> "123456789012345.0",
      "-10000001" -> "-10000001.0",
      "0.0005" -> "0.0005",            // Java would print 5.0E-4
      "0.00012" -> "0.00012",
      "0.1" -> "0.1",                  // decimal-cast rounding trap
      "5000000" -> "5000000.0",        // below the 1e7 switch: unchanged
      "123.5" -> "123.5",
      // non-integral >= 1e7: per-decade positional (Java is scientific)
      "12345678.5" -> "12345678.5",
      "123456789.25" -> "123456789.25",
      "-1234567.875" -> "-1234567.875",
      "1234567890123.4" -> "1234567890123.4",
      "99999999999999.5" -> "99999999999999.5",
      "1e6" -> "1000000.0",            // scientific INPUT, decimal output
      "2500000000" -> "2500000000.0")
    val got = cases.map(_._1).toDF("v")
      .select(CellType.render(col("v"))).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }
}

class ChecksSpec extends AnyFunSuite {
  import SparkTestSession._

  private def sheet(col: String, values: String*) =
    SheetReader.fromRows(spark, Seq(col), values.map(Seq(_)))

  private def errs(df: org.apache.spark.sql.DataFrame, rules: Seq[CompiledRule]) =
    RuleEvaluator.dedupFirst(RuleEvaluator.evaluate("t.csv", df, rules))
      .orderBy("Row_Index")
      .select("Row_Index", "Column_Value", "Error_Message", "Message_Type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  test("check_if_number int: priority, message overwrite, blanks skipped") {
    val df = sheet("Age", "25", "abc", "2.5", "300", "", "N/A")
    val got = errs(df, Seq(Checks.number("Age", NoGate, naAllowed = false,
      PyI(1), PyI(200), "int")))
    val msg = "Value must be an interger between 1 and 200, decimal values are not allowed"
    // rows: 2=25 ok; 3=abc bad; 4=2.5 int violation; 5=300 range; 6='' skipped; 7=N/A bad (na not allowed)
    assert(got.toSeq == Seq(
      (3L, "abc", msg, "Error"),
      (4L, "2.5", msg, "Error"),
      (5L, "300.0", msg, "Error"),
      (7L, "N/A", msg, "Error")))
  }

  test("check_if_number float keeps dependency prefix and allows N/A") {
    val df = SheetReader.fromRows(spark, Seq("Val", "Biospecimen_Type"), Seq(
      Seq("abc", "PBMC"),     // gated in, bad
      Seq("abc", "Serum"),    // gated out
      Seq("N/A", "PBMC"),     // na allowed
      Seq("-1", "PBMC")))     // range
    val rule = Checks.number("Val", InValuesGate("Biospecimen_Type", Seq(PyS("PBMC"))),
      naAllowed = true, PyI(0), PyF(1e9), "float")
    val got = errs(df, Seq(rule))
    val msg = "Biospecimen_Type is in ['PBMC'].  Value must be a number between 0 and 1000000000.0"
    assert(got.toSeq == Seq((2L, "abc", msg, "Error"), (5L, "-1.0", msg, "Error")))
  }

  test("check_in_list: '' escape, numeric literal matching") {
    val df = sheet("Severity", "0", "0.0", "3", "", "Positive")
    val got = errs(df, Seq(Checks.inList("Severity", NoGate, Seq(PyI(0)))))
    // 0 and 0.0 match numeric [0]; '' escapes; 3 and Positive fail
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((4L, "3.0"), (6L, "Positive")))
    assert(got.head._3 == "Unexpected Value.  Value must be one of the following: [0]")
  }

  test("check_date: type error, range error, expiration warning") {
    val asOf = LocalDate.of(2026, 8, 12)
    val df = sheet("Date_of_Visit", "1/2/2020", "notadate", "1850-01-01", "2030-01-01", "")
    val got = errs(df, Checks.date("Date_of_Visit", NoGate, naAllowed = false,
      "Date", LocalDate.of(1900, 1, 1), asOf))
    assert(got.toSeq == Seq(
      (3L, "notadate", "Value must be a Valid Date MM/DD/YYYY", "Error"),
      (4L, "1850-01-01 00:00:00", s"Date is valid however must be between 1900-01-01 and $asOf", "Error"),
      (5L, "2030-01-01 00:00:00", s"Date is valid however must be between 1900-01-01 and $asOf", "Error")))

    val exp = sheet("Kit_Expiration_Date", "2020-01-01")
    val got2 = errs(exp, Checks.date("Kit_Expiration_Date", NoGate, naAllowed = false,
      "Date", asOf, LocalDate.of(3000, 1, 1)))
    assert(got2.toSeq == Seq((2L, "2020-01-01 00:00:00",
      "Expiration Date has already passed, check to make sure date is correct", "Warning")))
  }

  test("check_date Time: type check only, no range") {
    val df = sheet("Time_of_Draw", "10:30:00", "25:99:99", "notatime")
    val got = errs(df, Checks.date("Time_of_Draw", NoGate, naAllowed = false,
      "Time", LocalDate.of(1900, 1, 1), LocalDate.of(2026, 1, 1)))
    assert(got.map(_._2).toSeq == Seq("25:99:99", "notatime"))
    assert(got.head._3 == "Value must be a Valid Time HH:MM:SS")
  }

  test("check_id_field: format beats wrong-cbc; blanks dropped") {
    val df = sheet("Research_Participant_ID", "14_123456", "99_123456", "garbage", "")
    val got = errs(df, Seq(Checks.idField("Research_Participant_ID",
      "[_]{1}[0-9]{6}$", 14, "XX_XXXXXX")))
    assert(got.toSeq == Seq(
      (3L, "99_123456", "ID is Valid however has wrong CBC code. Expecting CBC Code (14)", "Error"),
      (4L, "garbage", "ID is Not Valid Format, Expecting XX_XXXXXX", "Error")))
  }

  test("check_if_string errors on numbers and dates only") {
    val df = sheet("Instrument_ID", "ABC-1", "5", "2020-01-01", "", "N/A")
    val got = errs(df, Seq(Checks.isString("Instrument_ID", NoGate)))
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq((3L, "5.0"), (4L, "2020-01-01 00:00:00")))
  }

  test("dup ids at Row_Index -3 with converted-value grouping") {
    val df = sheet("Aliquot_ID", "14_1", "14_1", "x", "5", "5.0")
    val got = RuleEvaluator.dupIds("t.csv", df, "Aliquot_ID", 0)
      .orderBy("Column_Value").collect()
      .map(r => (r.getAs[Long]("Row_Index"), r.getAs[String]("Column_Value"),
        r.getAs[String]("Error_Message")))
    // "5" and "5.0" both convert to 5.0 -> duplicates, like the reference
    assert(got.toSeq == Seq(
      (-3L, "14_1", "Id is repeated 2 times, Multiple repeats are not allowed"),
      (-3L, "5.0", "Id is repeated 2 times, Multiple repeats are not allowed")))
  }

  test("dup ids: blank values never emit (the reference's sort_and_drop sweeps them)") {
    val df = sheet("Aliquot_ID", "", "", "", "14_1", "14_1")
    val got = RuleEvaluator.dupIds("t.csv", df, "Aliquot_ID", 0).collect()
      .map(_.getAs[String]("Column_Value")).toSeq
    assert(got == Seq("14_1"), s"blank dup-ID row must not emit: $got")
  }

  test("passing-ID reconciliation compares RENDERED values (errored number-shaped IDs are not counted passing)") {
    import spark.implicits._
    val demo = Seq("123456", "999999", "14_1").toDF("Research_Participant_ID")
    val errors = Seq(("Error", "demographic.csv", 2L, "Research_Participant_ID",
      "123456.0", "ID is Not Valid Format, Expecting XX_XXXXXX", 0L))
      .toDF("Message_Type", "CSV_Sheet_Name", "Row_Index", "Column_Name",
        "Column_Value", "Error_Message", "rule_seq")
    // "123456" errored (stored rendered as 123456.0): only 999999 and
    // 14_1 pass -> declared 3 mismatches and reports passCount 2
    val out = graft.dispatch.CrossSheet.passingIdReconciliation(
      "Research_Participant_ID", Seq("demographic.csv"),
      Map("demographic.csv" -> demo), errors, declaredCount = 3L,
      seqBase = 99L).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("Error_Message") ==
      "After validation only 2 Participat IDS are valid")
    // declared == the true pass count -> silent
    assert(graft.dispatch.CrossSheet.passingIdReconciliation(
      "Research_Participant_ID", Seq("demographic.csv"),
      Map("demographic.csv" -> demo), errors, declaredCount = 2L,
      seqBase = 99L).collect().isEmpty)
  }

  test("missing values: SARS-conditional severity") {
    val df = SheetReader.fromRows(spark, Seq("Symptoms", "SARS_CoV_2_PCR_Test_Result"), Seq(
      Seq("", "Positive"), Seq("", "Negative"), Seq("", "Unknown"), Seq("Yes", "Positive")))
    val got = errs(df, Checks.missing("Symptoms", ReqSarsPositive))
    assert(got.toSeq == Seq(
      (2L, "", "This column is requred for Sars Positive Patients, missing values are not allowed.  Please recheck data", "Error"),
      (3L, "", "Missing Values where found, this is a warning.  Please recheck data", "Warning")))
  }

  test("dedup keeps first emission across rules and sheets") {
    val df = sheet("X", "boom")
    val r1 = CompiledRule("X", lit(true), lit("Error"), lit("first"), keepBlank = false, Seq("X"))
    val r2 = CompiledRule("X", lit(true), lit("Warning"), lit("second"), keepBlank = false, Seq("X"))
    val got = errs(df, Seq(r1, r2))
    assert(got.toSeq == Seq((2L, "boom", "first", "Error")))
  }

  test("viability uses banker's rounding (bround)") {
    // live=1,total=16 => 6.25% ; banker's round to 1 decimal = 6.2
    val df = SheetReader.fromRows(spark,
      Seq("Viability_Hemocytometer_Count", "Live_Cells_Hemocytometer_Count",
        "Total_Cells_Hemocytometer_Count"),
      Seq(Seq("6.2", "1", "16"), Seq("6.3", "1", "16"), Seq("50", "8", "16")))
    val got = errs(df, Seq(Checks.viability("Viability_Hemocytometer_Count")))
    assert(got.map(_._1).toSeq == Seq(3L)) // only 6.3 mismatches under HALF_EVEN
  }

  test("fkOrphanAudit counts planted orphans exactly") {
    import spark.implicits._
    val child = Seq((1L, "a"), (2L, "b"), (99L, "c"), (98L, "d"))
      .toDF("fk", "x")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val row = ValidationOps
      .fkOrphanAudit("t.fk->p", child, "fk", parent, "pk")
      .collect().head
    assert(row.getString(0) === "t.fk->p")
    assert(row.getLong(1) === 4L)
    assert(row.getLong(2) === 2L)
    assert(row.getDouble(3) === 0.5)
  }

  test("Observation piggybacks rule metrics on the main pass (no second scan)") {
    // the Deequ-style observability shape: constraint counters ride the
    // production job's own scan as an observe() aggregate, so data-quality
    // metrics at 100 TB cost zero extra passes
    val obs = new org.apache.spark.sql.Observation("rule-metrics")
    val li = Tables.lineitem(spark, sf)
    val observed = li.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col("l_quantity") > 45, 1L).otherwise(0L)).as("qty_violations"),
      sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)).as("price_violations"))
    // run the "production" job — here, any action over the observed frame
    val total = observed.count()
    val got = obs.get
    assert(got("n_rows") === total)
    assert(got("qty_violations") ===
      li.filter(col("l_quantity") > 45).count())
    assert(got("price_violations") === 0L)
  }

  test("fkOrphanAuditMulti audits several FKs of one child in one pass") {
    import spark.implicits._
    val child = Seq((1L, 10L), (2L, 20L), (99L, 10L), (98L, 77L))
      .toDF("fk_a", "fk_b")
    val pa = Seq(1L, 2L).toDF("pk_a")
    val pb = Seq(10L, 20L).toDF("pk_b")
    val rows = ValidationOps.fkOrphanAuditMulti(child, Seq(
        ("c.fk_a->pa", "fk_a", pa, "pk_a"),
        ("c.fk_b->pb", "fk_b", pb, "pk_b")))
      .orderBy("relation").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSeq === Seq(
      ("c.fk_a->pa", 4L, 2L, 0.5), ("c.fk_b->pb", 4L, 1L, 0.25)))
  }
}

class SubmissionRunnerSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.app.SubmissionRunner

  test("mini submission end-to-end: rules + cross-sheet + dedup") {
    val prior = SheetReader.fromRows(spark,
      Seq("Research_Participant_ID", "SARS_CoV_2_PCR_Test_Result"),
      Seq(Seq("14_000001", "Positive"), Seq("14_000002", "Negative"),
        Seq("14_000003", "Bogus")))
    val demo = SheetReader.fromRows(spark,
      Seq("Research_Participant_ID", "Age"),
      Seq(Seq("14_000001", "30"), Seq("14_000004", "250")))
    val bio = SheetReader.fromRows(spark,
      Seq("Research_Participant_ID", "Biospecimen_ID", "Biospecimen_Type"),
      Seq(Seq("14_000001", "14_000001_001", "Serum")))
    val confirm = SheetReader.fromRows(spark,
      Seq("Research_Participant_ID", "Assay_ID"), Seq())
    val aliquot = SheetReader.fromRows(spark, Seq("Aliquot_ID", "Biospecimen_ID"), Seq())
    val equip = SheetReader.fromRows(spark, Seq("Equipment_ID", "Biospecimen_ID"), Seq())
    val reagent = SheetReader.fromRows(spark, Seq("Reagent_Name", "Biospecimen_ID"), Seq())
    val consumable = SheetReader.fromRows(spark, Seq("Consumable_Name", "Biospecimen_ID"), Seq())

    val result = SubmissionRunner.validate(spark, Map(
      "prior_clinical_test.csv" -> prior, "demographic.csv" -> demo,
      "biospecimen.csv" -> bio, "confirmatory_clinical_test.csv" -> confirm,
      "aliquot.csv" -> aliquot, "equipment.csv" -> equip,
      "reagent.csv" -> reagent, "consumable.csv" -> consumable),
      SubmissionRunner.Config(cbcId = 14, asOf = LocalDate.of(2026, 8, 12)))

    val errors = result.errors.collect().map(r =>
      (r.getAs[String]("CSV_Sheet_Name"), r.getAs[Long]("Row_Index"),
        r.getAs[String]("Column_Name"), r.getAs[String]("Column_Value"),
        r.getAs[String]("Error_Message"))).toSet

    // SARS enum violation
    assert(errors.exists(e => e._1 == "prior_clinical_test.csv" && e._4 == "Bogus"))
    // Age range violation (int rule message)
    assert(errors.exists(e => e._1 == "demographic.csv" && e._4 == "250.0" &&
      e._5.contains("interger")))
    // cross-sheet: 14_000002 in prior only; 14_000004 in demo only
    assert(errors.exists(e => e._1 == "Cross_Participant_ID.csv" && e._4 == "14_000002" &&
      e._5 == "ID is found in Prior_Clinical_Test, but is missing from Demographic and Biospecimen"))
    assert(errors.exists(e => e._1 == "Cross_Participant_ID.csv" && e._4 == "14_000004" &&
      e._5 == "ID is found in Demographic, but is missing from Prior_Clinical_Test and Biospecimen"))
    // aliquot missing for bio id
    assert(errors.exists(e => e._1 == "Cross_Biospecimen_ID.csv" && e._4 == "14_000001_001" &&
      e._5 == "ID is found in Biospecimen.csv, however is missing from Aliquot.csv"))
    // 14_000001 present everywhere needed -> no cross error for it
    assert(!errors.exists(e => e._1 == "Cross_Participant_ID.csv" && e._4 == "14_000001"))
  }

  test("merge_tables borrows context columns and reports drop_list") {
    val prior = SheetReader.fromRows(spark,
      Seq("Research_Participant_ID", "SARS_CoV_2_PCR_Test_Result"),
      Seq(Seq("14_000001", "Positive")))
    val demo = SheetReader.fromRows(spark,
      Seq("Research_Participant_ID", "Age"), Seq(Seq("14_000001", "30")))
    val (merged, dropList) = MergeTables.merge("prior_clinical_test.csv", prior,
      Map("prior_clinical_test.csv" -> prior, "demographic.csv" -> demo))
    assert(dropList == Set("Age"))
    assert(merged.columns.contains("Age"))
    assert(merged.filter(col("Age") === "30").count() == 1)
  }
}
