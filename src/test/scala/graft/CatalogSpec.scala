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

  test("quoted cells with EMBEDDED NEWLINES stay one row; Row_Index does not shift") {
    val dir = Files.createTempDirectory("graft-nl").toString
    Files.writeString(Paths.get(dir, "nl.csv"),
      "A,B\n\"From Medical\nRecord\",one\nplain,two\n")
    val df = SheetReader.read(spark, s"$dir/nl.csv").orderBy("Row_Index")
    val rows = df.collect().map(r => (r.getAs[Long]("Row_Index"),
      r.getAs[String]("A"), r.getAs[String]("B")))
    // pandas parses the quoted newline as one cell by default; the
    // second data row must keep its correct index
    assert(rows.toSeq == Seq((2L, "From Medical\nRecord", "one"),
      (3L, "plain", "two")))
  }

  test("readMany unions drifted schemas with '' fill (pd.concat continues; a crash would abort the run)") {
    val dir = Files.createTempDirectory("graft-drift").toString
    Files.writeString(Paths.get(dir, "a.csv"), "X,Y\n1,y1\n")
    Files.writeString(Paths.get(dir, "b.csv"), "X,Z\n2,z2\n")
    val df = SheetReader.readMany(spark,
      Seq(s"$dir/a.csv", s"$dir/b.csv")).get.orderBy("Row_Index")
    assert(df.columns.toSeq == Seq("X", "Y", "Z", "Row_Index"))
    val rows = df.collect().map(r => (r.getAs[String]("X"),
      r.getAs[String]("Y"), r.getAs[String]("Z")))
    // missing cells land as '' — the reader's blank convention, so
    // missing-value rules treat them as missing (the reference's NaN
    // floats would mis-classify as numbers; fix-over-replicate)
    assert(rows.toSeq == Seq(("1", "y1", ""), ("2", "", "z2")))
  }

  test("merge survives malformed context sheets: missing key column skips the borrow; a denormalized duplicate keeps the data sheet's own column") {
    import graft.dispatch.MergeTables
    // biospecimen.csv missing its Biospecimen_Type key column: slicing
    // it for aliquot's merge must skip, not crash with UNRESOLVED_COLUMN
    val badBio = SheetReader.fromRows(spark,
      Seq("Research_Participant_ID", "Biospecimen_ID"),
      Seq(Seq("14_123456", "14_123456_001")))
    val aliquot = SheetReader.fromRows(spark,
      Seq("Aliquot_ID", "Biospecimen_ID"),
      Seq(Seq("14_123456_001_01", "14_123456_001")))
    val (m1, drop1) = MergeTables.merge("aliquot.csv", aliquot,
      Map("biospecimen.csv" -> badBio))
    assert(m1.columns.toSet == aliquot.columns.toSet && drop1.isEmpty)
    assert(m1.count() == 1)
    // equipment.csv shipping its OWN Biospecimen_Type column: the
    // borrowed copy must not collide (AMBIGUOUS_REFERENCE) — the data
    // sheet's own cells stay validatable under the plain name
    val bio = SheetReader.fromRows(spark,
      Seq("Research_Participant_ID", "Biospecimen_ID", "Biospecimen_Type"),
      Seq(Seq("14_123456", "14_123456_001", "Serum")))
    val equip = SheetReader.fromRows(spark,
      Seq("Equipment_ID", "Biospecimen_ID", "Biospecimen_Type"),
      Seq(Seq("E1", "14_123456_001", "Plasma")))
    val (m2, _) = MergeTables.merge("equipment.csv", equip,
      Map("biospecimen.csv" -> bio))
    val got = m2.select("Biospecimen_Type").collect().map(_.getString(0))
    assert(got.toSeq == Seq("Plasma"), "data sheet's own column must win")
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
