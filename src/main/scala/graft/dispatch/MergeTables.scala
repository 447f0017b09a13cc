package graft.dispatch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Context enrichment before rule dispatch.
  *
  * Ports `col_valid_dict` Merge_Cols (nci-seronet-data-validator.py:21-31)
  * and `merge_tables` (File_Submission_Object.py:128-147): each data sheet
  * left-joins 2–3 key columns of its context sheet(s); the borrowed columns
  * form the drop_list, which excludes them from rule dispatch.
  *
  * The context slices are tiny relative to the data sheet, so every join is
  * broadcast — at scale this is the difference between a map-side join and a
  * full shuffle of the data sheet.
  *
  * Divergence (documented): pandas `merge` renumbers the row index, so the
  * reference mis-attributes Row_Index when a context slice has duplicate
  * keys (defect register §2.9). We carry the ingest Row_Index through the
  * join unchanged, which is the intended semantics.
  */
object MergeTables {

  /** Key-column slice per sheet (Merge_Cols). */
  val mergeCols: Map[String, Seq[String]] = Map(
    "prior_clinical_test.csv" -> Seq("Research_Participant_ID", "SARS_CoV_2_PCR_Test_Result"),
    "demographic.csv" -> Seq("Research_Participant_ID", "Age"),
    "biospecimen.csv" -> Seq("Research_Participant_ID", "Biospecimen_ID", "Biospecimen_Type"),
    "aliquot.csv" -> Seq("Aliquot_ID", "Biospecimen_ID"),
    "equipment.csv" -> Seq("Equipment_ID", "Biospecimen_ID"),
    "reagent.csv" -> Seq("Reagent_Name", "Biospecimen_ID"),
    "consumable.csv" -> Seq("Consumable_Name", "Biospecimen_ID"),
    "assay.csv" -> Seq("Assay_ID", "Assay_Name"),
    "assay_target.csv" -> Seq("Assay_ID", "Assay_Target", "Assay_Antigen_Source"),
    "confirmatory_clinical_test.csv" -> Seq("Research_Participant_ID", "Assay_ID"),
    "submission.csv" -> Seq())

  /** populate_list_dict (File_Submission_Object.py:96-105): project the key
    * slice of a submitted sheet. Absent sheets fall back to a caller-supplied
    * reference lookup (the JDBC path in production; None in tests).
    */
  def slice(sheets: Map[String, DataFrame], name: String,
      fallback: String => Option[DataFrame] = _ => None): Option[DataFrame] =
    mergeCols.get(name).filter(_.nonEmpty).flatMap { cols =>
      sheets.get(name) match {
        // a submitted context sheet MISSING one of its key columns (the
        // malformed-input case the column-name check reports) must not
        // crash every OTHER sheet's merge with UNRESOLVED_COLUMN — skip
        // the context instead; the missing-column error still surfaces
        // on the context sheet itself
        case Some(df) if cols.forall(df.columns.contains) =>
          Some(df.select(cols.head, cols.tail: _*))
        case Some(_) => None
        case None => fallback(name)
      }
    }

  /** merge_tables: returns the enriched sheet plus the borrowed-column
    * drop_list. Join plan per File_Submission_Object.py:128-147 (the dead
    * duplicate `elif` at :139-140 is a no-op and not replicated).
    */
  def merge(fileName: String, dataTable: DataFrame,
      sheets: Map[String, DataFrame],
      fallback: String => Option[DataFrame] = _ => None): (DataFrame, Set[String]) = {
    val before = dataTable.columns.toSet
    def join(df: DataFrame, ctxName: String, on: Seq[String]): DataFrame =
      slice(sheets, ctxName, fallback) match {
        case Some(ctx) if on.forall(df.columns.contains) =>
          // a submitter who denormalizes (ships a context column like
          // Biospecimen_Type inside the data sheet too) must not crash
          // rule evaluation with AMBIGUOUS_REFERENCE: the data sheet's
          // OWN column wins and the context's copy is not borrowed.
          // (pandas suffixes both copies _x/_y there, after which the
          // reference's rules find NEITHER name — its net effect is
          // also "the borrowed copy does not surface"; ours keeps the
          // submitted cells validatable, strictly more useful.)
          val dup = ctx.columns.toSet.intersect(df.columns.toSet) -- on
          val pruned = dup.foldLeft(ctx)((c, d) => c.drop(d))
          if (pruned.columns.length > on.length)
            df.join(broadcast(pruned), on, "left")
          else df
        case _ => df
      }
    val merged = fileName match {
      case "prior_clinical_test.csv" =>
        join(dataTable, "demographic.csv", Seq("Research_Participant_ID"))
      case "demographic.csv" =>
        join(dataTable, "prior_clinical_test.csv", Seq("Research_Participant_ID"))
      case "biospecimen.csv" =>
        val a = join(dataTable, "prior_clinical_test.csv", Seq("Research_Participant_ID"))
        join(a, "demographic.csv", Seq("Research_Participant_ID"))
      case "aliquot.csv" | "equipment.csv" | "reagent.csv" | "consumable.csv" =>
        join(dataTable, "biospecimen.csv", Seq("Biospecimen_ID"))
      case "assay_target.csv" =>
        join(dataTable, "assay.csv", Seq("Assay_ID"))
      case "confirmatory_clinical_test.csv" =>
        val a = join(dataTable, "assay.csv", Seq("Assay_ID"))
        join(a, "assay_target.csv", Seq("Assay_ID", "Assay_Target"))
      case _ => dataTable
    }
    (merged, merged.columns.toSet -- before)
  }
}
