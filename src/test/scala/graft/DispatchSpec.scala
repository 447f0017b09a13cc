package graft

import graft.dispatch.SheetCatalog
import graft.io.SheetReader
import graft.rules.RuleEvaluator
import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDate

/** Pins the dispatch catalog's branch behavior per sheet family, including
  * the reference quirks that golden tests must not silently "fix".
  */
class DispatchSpec extends AnyFunSuite {
  import SparkTestSession._

  private val asOf = LocalDate.of(2026, 8, 12)
  private def planFor(file: String, cols: Seq[String], drop: Set[String] = Set.empty) =
    SheetCatalog.plan(file, cols, drop, 14, asOf, c => lit(false))

  private def errorsFor(file: String, cols: Seq[String], rows: Seq[Seq[String]]) = {
    val sheet = SheetReader.fromRows(spark, cols, rows)
    val plan = planFor(file, cols)
    RuleEvaluator.dedupFirst(RuleEvaluator.evaluate(file, sheet, plan.rowRules))
      .collect().map(r => (r.getAs[Long]("Row_Index"), r.getAs[String]("Column_Name"),
        r.getAs[String]("Error_Message")))
  }

  test("substring-membership quirk: short headers match the PCR-date branch") {
    // Validation_Rules.py:82 — `header_name in 'Date_of_SARS_CoV_2_PCR_sample_collection'`
    // is a substring test; a column literally named "Date" matches it
    val errs = errorsFor("prior_clinical_test.csv", Seq("Date"), Seq(Seq("notadate")))
    assert(errs.exists(_._3 == "Value must be a Valid Date MM/DD/YYYY"))
  }

  test("drop_list columns are skipped entirely") {
    val plan = planFor("demographic.csv", Seq("Research_Participant_ID", "Age"),
      drop = Set("Age"))
    assert(!plan.rowRules.exists(_.column == "Age"))
    assert(plan.rowRules.exists(_.column == "Research_Participant_ID"))
  }

  test("unmatched columns get no rules and no missing-value check") {
    val plan = planFor("demographic.csv", Seq("Totally_Unknown_Column"))
    assert(plan.rowRules.isEmpty)
  }

  test("elif order: Collection_Tube_Type_Expiration_Date is a date, not a string") {
    val errs = errorsFor("biospecimen.csv",
      Seq("Collection_Tube_Type_Expiration_Date"), Seq(Seq("2020-01-01")))
    // expiration window => passed-date Warning, not a string-type error
    assert(errs.exists(_._3 ==
      "Expiration Date has already passed, check to make sure date is correct"))
  }

  test("processing: Lot_Number branch wins over the Aliquot fallthrough") {
    // "Aliquot_Lot_Number" contains both; elif order puts Lot_Number first,
    // same check_if_string either way but Required becomes "No"
    val sheet = SheetReader.fromRows(spark, Seq("Aliquot_Lot_Number"), Seq(Seq("")))
    val plan = planFor("aliquot.csv", Seq("Aliquot_Lot_Number"))
    val errs = RuleEvaluator.dedupFirst(
      RuleEvaluator.evaluate("aliquot.csv", sheet, plan.rowRules)).collect()
    assert(errs.length == 1)
    assert(errs.head.getAs[String]("Message_Type") == "Warning") // Required = No
  }

  test("dup-id columns: biospecimen owns Biospecimen_ID, others own RPID") {
    assert(planFor("biospecimen.csv",
      Seq("Research_Participant_ID", "Biospecimen_ID")).dupIdColumns ==
      Seq("Biospecimen_ID"))
    assert(planFor("demographic.csv", Seq("Research_Participant_ID")).dupIdColumns ==
      Seq("Research_Participant_ID"))
    assert(planFor("aliquot.csv", Seq("Aliquot_ID")).dupIdColumns == Seq("Aliquot_ID"))
  }

  test("Part/Bio list membership excludes borrowed columns") {
    val own = planFor("demographic.csv", Seq("Research_Participant_ID", "Age"))
    assert(own.contributesPartList)
    val borrowed = planFor("aliquot.csv",
      Seq("Aliquot_ID", "Biospecimen_ID"), drop = Set("Biospecimen_ID"))
    assert(!borrowed.contributesBioList)
  }

  test("total/viability cross-checks fire regardless of family match") {
    val plan = planFor("confirmatory_clinical_test.csv",
      Seq("Total_Cells_Hemocytometer_Count", "Live_Cells_Hemocytometer_Count",
        "Viability_Hemocytometer_Count"))
    assert(plan.rowRules.exists(_.message.toString.contains("Live Cell Count")))
    assert(plan.rowRules.exists(_.message.toString.contains("Viability Count")))
  }

  test("SARS-gated demographic severity: Covid_Disease_Severity") {
    val errs = errorsFor("demographic.csv",
      Seq("Covid_Disease_Severity", "SARS_CoV_2_PCR_Test_Result"),
      Seq(Seq("9", "Positive"),   // out of 1..8 -> int error
        Seq("0", "Negative"),     // matches [0] -> ok
        Seq("5", "Negative"),     // Negative expects [0] -> in-list error
        Seq("3", "Positive")))    // ok
    assert(errs.exists(e => e._1 == 2 && e._3.contains("interger")))
    assert(errs.exists(e => e._1 == 4 &&
      e._3 == "SARS_CoV_2_PCR_Test_Result is in ['Negative'].  Value must be one of the following: [0]"))
    assert(!errs.exists(e => e._1 == 3 || e._1 == 5))
  }
}
