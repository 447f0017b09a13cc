package graft.dispatch

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The sheet registry (col_valid_dict, nci-seronet-data-validator.py:21-31):
  * which catalog tables define each sheet's expected column set. Merge_Cols
  * live in [[MergeTables.mergeCols]].
  *
  * Expected columns come from an INFORMATION_SCHEMA.COLUMNS-shaped frame
  * (TABLE_NAME, COLUMN_NAME): in production a JDBC read of the validated
  * database's schema, in tests a static DataFrame — the provider does not
  * care which.
  */
object SheetRegistry {

  /** Check_Tables per sheet. */
  val checkTables: Map[String, Seq[String]] = Map(
    "prior_clinical_test.csv" -> Seq("Prior_Test_Result"),
    "demographic.csv" -> Seq("Demographic_Data", "Comorbidity",
      "Prior_Covid_Outcome", "Submission_MetaData"),
    "biospecimen.csv" -> Seq("Biospecimen", "Collection_Tube"),
    "aliquot.csv" -> Seq("Aliquot", "Aliquot_Tube"),
    "equipment.csv" -> Seq("Equipment"),
    "reagent.csv" -> Seq("Reagent"),
    "consumable.csv" -> Seq("Consumable"),
    "assay.csv" -> Seq("Assay_Metadata"),
    "assay_target.csv" -> Seq("Assay_Target"),
    "confirmatory_clinical_test.csv" -> Seq("Confirmatory_Test_Result"),
    "submission.csv" -> Seq())

  /** INFORMATION_SCHEMA.COLUMNS of the validated DB over JDBC — the
    * production catalog source (check_col_names,
    * File_Submission_Object.py:55-58). `catalogSql` overrides the MySQL
    * default for engines that expose their catalog differently (e.g.
    * Derby's SYS schema, which the JdbcPathSpec uses to exercise this
    * exact read end-to-end in-process); either way the result is the
    * (TABLE_NAME, COLUMN_NAME) frame [[expectedColumns]] consumes.
    */
  def informationSchema(spark: SparkSession, jdbcUrl: String, dbName: String,
      props: java.util.Properties,
      catalogSql: Option[String] = None): DataFrame = {
    val sql = catalogSql.getOrElse(
      s"SELECT TABLE_NAME, COLUMN_NAME FROM INFORMATION_SCHEMA.COLUMNS " +
        s"WHERE TABLE_SCHEMA = '$dbName'")
    spark.read.jdbc(jdbcUrl, s"($sql) t", props)
  }

  /** Expected column set per sheet from a (TABLE_NAME, COLUMN_NAME) frame,
    * preserving catalog order per table.
    */
  def expectedColumns(catalog: DataFrame): Map[String, Seq[String]] = {
    val byTable = catalog.select("TABLE_NAME", "COLUMN_NAME").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (t, cs) => t -> cs.map(_._2).toSeq }
    checkTables.map { case (sheet, tables) =>
      sheet -> tables.flatMap(t => byTable.getOrElse(t, Seq.empty))
    }.filter(_._2.nonEmpty)
  }
}
