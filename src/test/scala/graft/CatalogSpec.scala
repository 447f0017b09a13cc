package graft

import graft.dispatch.SheetRegistry
import graft.io.{IcdCatalog, SheetReader}
import graft.rules.{Checks, RuleEvaluator}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

class CatalogSpec extends AnyFunSuite {
  import SparkTestSession._

  test("expectedColumns resolves Check_Tables against a catalog frame") {
    import spark.implicits._
    val catalog = Seq(
      ("Demographic_Data", "Research_Participant_ID"),
      ("Demographic_Data", "Age"),
      ("Comorbidity", "Other_Comorbidity"),
      ("Prior_Test_Result", "Research_Participant_ID"),
      ("Prior_Test_Result", "SARS_CoV_2_PCR_Test_Result"),
      ("Unrelated_Table", "Noise")).toDF("TABLE_NAME", "COLUMN_NAME")
    val expected = SheetRegistry.expectedColumns(catalog)
    assert(expected("demographic.csv") ==
      Seq("Research_Participant_ID", "Age", "Other_Comorbidity"))
    assert(expected("prior_clinical_test.csv") ==
      Seq("Research_Participant_ID", "SARS_CoV_2_PCR_Test_Result"))
    assert(!expected.contains("assay.csv")) // no catalog rows -> absent
  }

  test("IcdCatalog loads the gzip-JSON dict format and strips dots") {
    val dir = Files.createTempDirectory("graft-icd").toString
    val path = Paths.get(dir, "codes.json.gz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(path))
    out.write("""{"A000": "Cholera", "B99": "Other", "C341": "Lung"}"""
      .getBytes("UTF-8"))
    out.close()
    val codes = IcdCatalog.load(path.toString)
    assert(codes == Set("A000", "B99", "C341"))

    // broadcast-UDF variant
    val existsFn = IcdCatalog.existsFn(spark, codes)
    val sheet = SheetReader.fromRows(spark, Seq("Other_Comorbidity"),
      Seq(Seq("A00.0"), Seq("B99"), Seq("ZZZ"), Seq("N/A"), Seq("")))
    val errs = RuleEvaluator.dedupFirst(RuleEvaluator.evaluate("demographic.csv",
      sheet, Seq(Checks.icd10("Other_Comorbidity", existsFn))))
      .select("Column_Value").collect().map(_.getString(0)).toSet
    assert(errs == Set("ZZZ")) // dot-stripped A00.0 found; N/A allowed; '' dropped

    // small-set isin variant agrees
    val errs2 = RuleEvaluator.dedupFirst(RuleEvaluator.evaluate("demographic.csv",
      sheet, Seq(Checks.icd10("Other_Comorbidity", IcdCatalog.existsFnSmall(codes)))))
      .select("Column_Value").collect().map(_.getString(0)).toSet
    assert(errs2 == Set("ZZZ"))
  }

  test("bundled CMS ICD-10-CM catalog: real codes, dot-stripping, edge cases") {
    // the full public dataset, same content the reference's vendored
    // icd10-cm-0.0.4 package loads
    assert(IcdCatalog.bundled.size > 90000)
    // golden lookups
    assert(IcdCatalog.exists("E11.9"))   // dotted billable diabetes code
    assert(IcdCatalog.exists("E119"))    // dotless form resolves identically
    assert(IcdCatalog.exists("A00"))     // 3-char category code
    assert(IcdCatalog.billable("E11.9"))
    assert(!IcdCatalog.billable("E11"))  // category header, not billable
    assert(IcdCatalog.find("A000").exists(_.description.contains("Cholera")))
    // edge cases
    assert(!IcdCatalog.exists(""))
    assert(!IcdCatalog.exists(null))
    assert(!IcdCatalog.exists("NOPE99"))

    // engine-level: the default-config rule validates against the real set
    val sheet = SheetReader.fromRows(spark, Seq("Other_Comorbidity"),
      Seq(Seq("E11.9"), Seq("A00"), Seq("ZZ9.99"), Seq("N/A"), Seq("")))
    val errs = RuleEvaluator.dedupFirst(RuleEvaluator.evaluate("demographic.csv",
      sheet, Seq(Checks.icd10("Other_Comorbidity", IcdCatalog.existsFn(spark)))))
      .select("Column_Value").collect().map(_.getString(0)).toSet
    assert(errs == Set("ZZ9.99"))
  }

  test("readMany concatenates files with continuous Row_Index") {
    val dir = Files.createTempDirectory("graft-many").toString
    Files.writeString(Paths.get(dir, "a.csv"), "X\n1\n2\n")
    Files.writeString(Paths.get(dir, "b.csv"), "X\n3\n")
    val df = SheetReader.readMany(spark,
      Seq(s"$dir/a.csv", s"$dir/b.csv")).get.orderBy("Row_Index")
    val rows = df.collect().map(r => (r.getAs[Long]("Row_Index"), r.getAs[String]("X")))
    // pd.concat(ignore_index=True) numbering: contiguous across files
    assert(rows.toSeq == Seq((2L, "1"), (3L, "2"), (4L, "3")))
    assert(SheetReader.readMany(spark, Seq.empty).isEmpty)
  }

  test("SheetReader handles quoted fields with embedded commas and quotes") {
    val dir = Files.createTempDirectory("graft-quote").toString
    Files.writeString(Paths.get(dir, "q.csv"),
      "A,B\n\"x, y\",plain\n\"he said \"\"hi\"\"\",2\n")
    val df = SheetReader.read(spark, s"$dir/q.csv").orderBy("Row_Index")
    val rows = df.collect()
    assert(rows(0).getAs[String]("A") == "x, y")
    assert(rows(1).getAs[String]("A") == "he said \"hi\"")
  }
}
