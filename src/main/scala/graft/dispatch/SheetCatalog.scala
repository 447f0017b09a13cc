package graft.dispatch

import graft.rules._
import org.apache.spark.sql.Column
import java.time.LocalDate

/** Port of the reference's per-sheet/per-column rule dispatch
  * (Validation_Rules.py:1-280). Rules fire by column name, in column order,
  * one column at a time; the missing-value check runs only when some rule
  * matched (Rule_Found), using the Required-ness the matching branch set.
  *
  * Replicated quirks (SURVEY §2.8/§2.9, pinned in golden tests):
  *  - `header_name in 'Date_of_SARS_CoV_2_PCR_sample_collection'`
  *    (Validation_Rules.py:82) is a Python *substring* test — any header
  *    that is a substring of that literal matches the branch.
  *  - `check_if_substr` is dead code as dispatched (impossible conjunctions
  *    at :55,:62) — never wired here either.
  *  - `compare_total_to_live` / `compare_viability` fire for their 4 columns
  *    on every sheet regardless of family rules (:23-26).
  *  - Columns borrowed by merge_tables (drop_list) are skipped (:5-6).
  */
object SheetCatalog {

  /** Everything the engine needs to validate one sheet. */
  final case class SheetPlan(
      rowRules: Seq[CompiledRule],
      dupIdColumns: Seq[String],
      contributesPartList: Boolean,
      contributesBioList: Boolean)

  /** Outcome of one dispatch branch for one column. */
  private final case class Outcome(
      rules: Seq[CompiledRule] = Nil,
      required: Required = ReqYes,
      matched: Boolean = true,
      dupCols: Seq[String] = Nil)
  private val NotFound = Outcome(matched = false)

  private val minDate = LocalDate.of(1900, 1, 1)
  private val farFuture = LocalDate.of(3000, 1, 1)

  def plan(fileName: String, columns: Seq[String], dropList: Set[String],
      cbcId: Int, asOf: LocalDate,
      icdExists: Column => Column): SheetPlan = {
    val rules = Seq.newBuilder[CompiledRule]
    val dupCols = Seq.newBuilder[String]
    columns.filterNot(dropList.contains).foreach { h =>
      val id = checkIdValidation(h, fileName, cbcId)
      val fam: Option[Outcome] = fileName match {
        case "prior_clinical_test.csv" => Some(checkPriorClinical(h, asOf))
        case "demographic.csv" => Some(checkDemographic(h, asOf, icdExists))
        case "biospecimen.csv" => Some(checkBiospecimen(h, asOf))
        case "aliquot.csv" | "equipment.csv" | "reagent.csv" | "consumable.csv" =>
          Some(checkProcessing(h, asOf))
        case "confirmatory_clinical_test.csv" => Some(checkConfirmation(h, asOf))
        case "assay.csv" | "assay_target.csv" => Some(checkAssay(h))
        case _ => None
      }
      rules ++= id.rules
      dupCols ++= id.dupCols
      fam.foreach { f => rules ++= f.rules; dupCols ++= f.dupCols }
      // cross-column checks fire regardless of family match (VR:23-26)
      if (h == "Total_Cells_Hemocytometer_Count" || h == "Total_Cells_Automated_Count")
        rules += Checks.totalVsLive(h)
      if (h == "Viability_Hemocytometer_Count" || h == "Viability_Automated_Count")
        rules += Checks.viability(h)
      val matched = id.matched || fam.exists(_.matched)
      if (matched) {
        val required = fam.map(_.required).getOrElse(id.required)
        rules ++= Checks.missing(h, required)
      }
    }
    val assembled = rules.result()
    val dupColumns = dupCols.result()
    // Checks.dupIds suppresses BLANK-valued duplicates on the claim that
    // a later same-column rule's sort_and_drop (keepBlank=false) sweeps
    // Column_Value=='' rows for that column off the whole error list —
    // a CROSS-RULE assumption about the assembled set, enforced here so
    // a future rule-config change that leaves a dup-checked column
    // without such a rule fails loudly instead of silently diverging
    // from the reference (which emits the blank-dup error).
    dupColumns.foreach { c =>
      require(assembled.exists(r => r.column == c && !r.keepBlank),
        s"dup-ID column '$c' has no same-column keepBlank=false rule: " +
          "Checks.dupIds' blank suppression would diverge from the " +
          "reference for this sheet (see the dupIds scaladoc)")
    }
    SheetPlan(
      rowRules = assembled,
      dupIdColumns = dupColumns,
      contributesPartList = columns.contains("Research_Participant_ID") &&
        !dropList.contains("Research_Participant_ID"),
      contributesBioList = columns.contains("Biospecimen_ID") &&
        !dropList.contains("Biospecimen_ID"))
  }

  /** check_ID_validation (Validation_Rules.py:46-74). */
  private def checkIdValidation(h: String, fileName: String, cbcId: Int): Outcome =
    h match {
      case "Research_Participant_ID" =>
        Outcome(
          rules = Seq(Checks.idField(h, "[_]{1}[0-9]{6}$", cbcId, "XX_XXXXXX")),
          dupCols = if (fileName != "biospecimen.csv") Seq(h) else Nil)
      case "Biospecimen_ID" =>
        Outcome(
          rules = Seq(Checks.idField(h, "[_]{1}[0-9]{6}[_]{1}[0-9]{3}$", cbcId, "XX_XXXXXX_XXX")),
          dupCols = if (fileName == "biospecimen.csv") Seq(h) else Nil)
      case "Aliquot_ID" =>
        Outcome(
          rules = Seq(Checks.idField(h, "[_]{1}[0-9]{6}[_]{1}[0-9]{3}[_]{1}[0-9]{2}$", cbcId, "XX_XXXXXX_XXX_XX")),
          dupCols = Seq(h))
      case "Assay_ID" =>
        Outcome(
          rules = Seq(
            Checks.idField(h, "[_]{1}[0-9]{3}$", cbcId, "XX_XXX"),
            Checks.assaySpecial(h, "Assay_Name")),
          dupCols = if (fileName == "assay.csv") Seq(h) else Nil)
      case _ => NotFound
    }

  /** check_prior_clinical (Validation_Rules.py:75-117). */
  private def checkPriorClinical(h: String, asOf: LocalDate): Outcome = {
    def ss(vs: String*): Seq[PyVal] = vs.map(PyS)
    if (h == "SARS_CoV_2_PCR_Test_Result_Provenance")
      Outcome(Seq(Checks.inList(h, NoGate, ss("From Medical Record", "Self-Reported"))))
    else if (h == "SARS_CoV_2_PCR_Test_Result")
      Outcome(Seq(Checks.inList(h, NoGate, ss("Positive", "Negative"))))
    else if ("Date_of_SARS_CoV_2_PCR_sample_collection".contains(h)) // substring quirk (VR:82)
      Outcome(Checks.date(h, NoGate, naAllowed = false, "Date", minDate, asOf))
    else if (h.contains("Test_Result_Provenance"))
      Outcome(Seq(Checks.inList(h, NoGate, ss("Self-Reported", "From Medical Record", "N/A"))),
        ReqSarsNegative)
    else if (h.contains("Date_of") && h.contains("Test"))
      Outcome(Checks.date(h, NoGate, naAllowed = true, "Date", minDate, asOf), ReqNo)
    else if (h.contains("Test_Result") ||
        h == "Seasonal_Coronavirus_Serology_Result" || h == "Seasonal_Coronavirus_Molecular_Result")
      Outcome(Seq(
        Checks.inList(h, InValuesGate("SARS_CoV_2_PCR_Test_Result", ss("Positive")),
          ss("Positive", "Negative", "Equivocal", "Not Performed", "N/A")),
        Checks.inList(h, InValuesGate("SARS_CoV_2_PCR_Test_Result", ss("Negative")),
          ss("Positive", "Negative", "Equivocal", "Not Performed"))),
        ReqSarsNegative)
    else if (h.contains("infection_unit") || h.contains("HAART_Therapy_unit")) {
      val duration = h.replace("_unit", "")
      Outcome(Seq(
        Checks.inList(h, IsANumberGate(duration), ss("Day", "Month", "Year")),
        Checks.inList(h, InValuesGate(duration, ss("N/A")), ss("N/A"))),
        ReqNo)
    } else if (h.contains("Duration_of") && (h.contains("infection") || h.contains("HAART_Therapy"))) {
      val current =
        if (h.contains("HAART_Therapy")) "On_HAART_Therapy"
        else h.replace("Duration_of", "Current")
      Outcome(Seq(
        Checks.inList(h, InValuesGate(current, ss("No", "Unknown", "N/A")), ss("N/A")),
        Checks.number(h, InValuesGate(current, ss("Yes")), naAllowed = false,
          PyI(0), PyI(365), "int")),
        ReqNo)
    } else if ((h.contains("Current") && h.contains("infection")) || h == "On_HAART_Therapy")
      Outcome(Seq(
        Checks.inList(h, InValuesGate("SARS_CoV_2_PCR_Test_Result", ss("Positive")),
          ss("Yes", "No", "Unknown", "N/A")),
        Checks.inList(h, InValuesGate("SARS_CoV_2_PCR_Test_Result", ss("Negative")),
          ss("Yes", "No", "Unknown"))),
        ReqSarsNegative)
    else NotFound
  }

  /** check_demographic (Validation_Rules.py:118-160). */
  private def checkDemographic(h: String, asOf: LocalDate,
      icdExists: Column => Column): Outcome = {
    def ss(vs: String*): Seq[PyVal] = vs.map(PyS)
    val sarsPos = InValuesGate("SARS_CoV_2_PCR_Test_Result", ss("Positive"))
    val sarsNeg = InValuesGate("SARS_CoV_2_PCR_Test_Result", ss("Negative"))
    h match {
      case "Age" =>
        Outcome(Seq(Checks.number(h, NoGate, naAllowed = false, PyI(1), PyI(200), "int")))
      case "Race" =>
        Outcome(Seq(Checks.inList(h, NoGate, ss("White", "American Indian or Alaska Native",
          "Black or African American", "Asian", "Native Hawaiian or Other Pacific Islander",
          "Other", "Multirace", "Not Reported", "Unknown"))))
      case "Ethnicity" =>
        Outcome(Seq(Checks.inList(h, NoGate, ss("Hispanic or Latino", "Not Hispanic or Latino"))))
      case "Gender" =>
        Outcome(Seq(Checks.inList(h, NoGate, ss("Male", "Female", "Other", "Not Reported", "Unknown"))))
      case "Is_Symptomatic" =>
        Outcome(Seq(
          Checks.inList(h, sarsPos, ss("Yes", "No")),
          Checks.inList(h, sarsNeg, ss("No", "N/A"))), ReqSarsPositive)
      case "Date_of_Symptom_Onset" =>
        Outcome(
          Checks.date(h, InValuesGate("Is_Symptomatic", ss("Yes")), naAllowed = false,
            "Date", minDate, asOf) :+
          Checks.inList(h, InValuesGate("Is_Symptomatic", ss("No", "N/A")), ss("N/A")),
          ReqSarsPositive)
      case "Symptoms_Resolved" =>
        Outcome(Seq(
          Checks.inList(h, InValuesGate("Is_Symptomatic", ss("Yes")), ss("Yes", "No")),
          Checks.inList(h, InValuesGate("Is_Symptomatic", ss("No", "N/A")), ss("N/A"))),
          ReqSarsPositive)
      case "Date_of_Symptom_Resolution" =>
        Outcome(
          Checks.date(h, InValuesGate("Symptoms_Resolved", ss("Yes")), naAllowed = false,
            "Date", minDate, asOf) :+
          Checks.inList(h, InValuesGate("Symptoms_Resolved", ss("No", "N/A")), ss("N/A")),
          ReqSarsPositive)
      case "Covid_Disease_Severity" =>
        Outcome(Seq(
          Checks.number(h, sarsPos, naAllowed = false, PyI(1), PyI(8), "int"),
          Checks.inList(h, sarsNeg, Seq(PyI(0)))), ReqSarsPositive)
      case _ if Set("Diabetes_Mellitus", "Hypertension", "Severe_Obesity",
          "Cardiovascular_Disease", "Chronic_Renal_Disease", "Chronic_Liver_Disease",
          "Chronic_Lung_Disease", "Immunosuppressive_conditions", "Autoimmune_condition",
          "Inflammatory_Disease").contains(h) =>
        Outcome(Seq(
          Checks.inList(h, sarsPos, ss("Yes", "No")),
          Checks.inList(h, sarsNeg, ss("Yes", "No", "Unknown", "N/A"))), ReqSarsPositive)
      case "Other_Comorbidity" =>
        Outcome(Seq(Checks.icd10(h, icdExists)), ReqNo)
      case _ => NotFound
    }
  }

  /** check_biospecimen (Validation_Rules.py:161-197). */
  private def checkBiospecimen(h: String, asOf: LocalDate): Outcome = {
    def ss(vs: String*): Seq[PyVal] = vs.map(PyS)
    if (h == "Biospecimen_Group")
      Outcome(Seq(
        Checks.inList(h, InValuesGate("SARS_CoV_2_PCR_Test_Result", ss("Positive")),
          ss("Positive Sample")),
        Checks.inList(h, InValuesGate("SARS_CoV_2_PCR_Test_Result", ss("Negative")),
          ss("Negative Sample"))))
    else if (h == "Biospecimen_Type")
      Outcome(Seq(Checks.inList(h, NoGate,
        ss("Serum", "EDTA Plasma", "PBMC", "Saliva", "Nasal swab"))))
    else if (h == "Initial_Volume_of_Biospecimen")
      Outcome(Seq(Checks.number(h, NoGate, naAllowed = true, PyI(0), PyF(1e9), "float")))
    else if (h == "Collection_Tube_Type_Expiration_Date")
      Outcome(Checks.date(h, NoGate, naAllowed = false, "Date", asOf, farFuture), ReqNo)
    else if (h.contains("Company_Clinic") || h.contains("Initials") || h.contains("Collection_Tube_Type")) {
      val req = if (h == "Collection_Tube_Type_Lot_Number") ReqNo else ReqYes
      Outcome(Seq(Checks.isString(h, NoGate)), req)
    } else if (h.contains("Date_of"))
      Outcome(Checks.date(h, NoGate, naAllowed = false, "Date", minDate, asOf))
    else if (h.contains("Time_of"))
      Outcome(Checks.date(h, NoGate, naAllowed = false, "Time", minDate, asOf))
    else if (h == "Storage_Time_at_2_8")
      Outcome(Seq(Checks.number(h, NoGate, naAllowed = true, PyI(0), PyI(1000), "float")))
    else if (h == "Storage_Start_Time_at_2_8_Initials" || h == "Storage_End_Time_at_2_8_Initials")
      Outcome(Seq(
        Checks.isString(h, IsANumberGate("Storage_Time_at_2_8")),
        Checks.inList(h, InValuesGate("Storage_Time_at_2_8", ss("N/A")), ss("N/A"))))
    else if (h == "Storage_Start_Time_at_2_8" || h == "Storage_End_Time_at_2_8")
      Outcome(
        Checks.date(h, IsANumberGate("Storage_Time_at_2_8"), naAllowed = false,
          "Date", minDate, asOf) :+
        Checks.inList(h, InValuesGate("Storage_Time_at_2_8", ss("N/A")), ss("N/A")))
    else if (h == "Final_Concentration_of_Biospecimen" ||
        h.contains("Hemocytometer_Count") || h.contains("Automated_Count"))
      Outcome(Seq(Checks.number(h, InValuesGate("Biospecimen_Type", ss("PBMC")),
        naAllowed = true, PyI(0), PyF(1e9), "float")))
    else if (h == "Centrifugation_Time" || h == "RT_Serum_Clotting_Time")
      Outcome(Seq(Checks.number(h, InValuesGate("Biospecimen_Type", ss("Serum")),
        naAllowed = true, PyI(0), PyF(1e9), "float")))
    else if (h == "Storage_Start_Time_80_LN2_storage")
      Outcome(Checks.date(h, InValuesGate("Biospecimen_Type", ss("Serum")),
        naAllowed = false, "Time", minDate, asOf))
    else NotFound
  }

  /** check_processing_rules (Validation_Rules.py:198-220). */
  private def checkProcessing(h: String, asOf: LocalDate): Outcome = {
    def ss(vs: String*): Seq[PyVal] = vs.map(PyS)
    if (h == "Aliquot_Volume")
      Outcome(Seq(Checks.number(h, NoGate, naAllowed = true, PyI(0), PyF(1e9), "float")))
    else if (h.contains("Expiration_Date") || h.contains("Calibration_Due_Date"))
      Outcome(Checks.date(h, NoGate, naAllowed = false, "Date", asOf, farFuture), ReqNo)
    else if (h.contains("Lot_Number") || h.contains("Catalog_Number"))
      Outcome(Seq(Checks.isString(h, NoGate)), ReqNo)
    else if (h == "Equipment_Type")
      Outcome(Seq(Checks.inList(h, InValuesGate("Biospecimen_Type", ss("PBMC")),
        ss("Refrigerator", "-80 Refrigerator", "LN Refrigerator", "Microsope",
          "Pipettor", "Controlled-Rate Freezer", "Automated-Cell Counter"))))
    else if (h == "Reagent_Name")
      Outcome(Seq(Checks.inList(h, InValuesGate("Biospecimen_Type", ss("PBMC")),
        ss("DPBS", "Ficoll-Hypaque", "RPMI-1640", "no L-Glutamine", "Fetal Bovine Serum",
          "200 mM L-Glutamine", "1M Hepes", "Penicillin/Streptomycin", "DMSO",
          "Cell Culture Grade", "Vital Stain Dye"))))
    else if (h == "Consumable_Name")
      Outcome(Seq(Checks.inList(h, InValuesGate("Biospecimen_Type", ss("PBMC")),
        ss("50 mL Polypropylene Tube", "15 mL Conical Tube", "Cryovial Label"))))
    else if (h.contains("Aliquot") || h.contains("Equipment_ID"))
      Outcome(Seq(Checks.isString(h, NoGate)))
    else NotFound
  }

  /** check_confimation_rules (Validation_Rules.py:221-247). */
  private def checkConfirmation(h: String, asOf: LocalDate): Outcome = {
    def ss(vs: String*): Seq[PyVal] = vs.map(PyS)
    if (h == "Assay_Target")
      Outcome(Seq(Checks.assaySpecial(h, "Assay_Antigen_Source")))
    else if (h == "Instrument_ID" || h == "Test_Operator_Initials" || h == "Assay_Kit_Lot_Number")
      Outcome(Seq(Checks.isString(h, NoGate)))
    else if (h.contains("Date_of"))
      Outcome(Checks.date(h, NoGate, naAllowed = false, "Date", minDate, asOf))
    else if (h.contains("Time_of"))
      Outcome(Checks.date(h, NoGate, naAllowed = false, "Time", minDate, asOf))
    else if (h == "Assay_Target_Sub_Region" || h == "Measurand_Antibody" || h == "Interpretation")
      Outcome(Seq(Checks.isString(h, NoGate)))
    else if (h == "Assay_Replicate" || h == "Sample_Dilution")
      Outcome(Seq(Checks.number(h, NoGate, naAllowed = false, PyI(0), PyI(200), "int")))
    else if (h == "Derived_Result" || h == "Raw_Result" ||
        h == "Positive_Control_Reading" || h == "Negative_Control_Reading")
      Outcome(Seq(Checks.number(h, NoGate, naAllowed = true, PyI(0), PyF(1e9), "float")))
    else if (h == "Sample_Type")
      Outcome(Seq(Checks.inList(h, NoGate, ss("Serum", "Plasma", "Venous Whole Blood",
        "Dried Blood Spot", "Nasal Swab", "Broncheolar Lavage", "Sputum"))))
    else if (h == "Derived_Result_Units")
      Outcome(Seq(
        Checks.isString(h, IsANumberGate("Derived_Result")),
        Checks.inList(h, InValuesGate("Derived_Result", ss("N/A")), ss("N/A"))))
    else if (h == "Raw_Result_Units")
      Outcome(Seq(
        Checks.isString(h, IsANumberGate("Raw_Result")),
        Checks.inList(h, InValuesGate("Raw_Result", ss("N/A")), ss("N/A"))))
    else NotFound
  }

  /** check_assay_rules (Validation_Rules.py:248-280). */
  private def checkAssay(h: String): Outcome = {
    def ss(vs: String*): Seq[PyVal] = vs.map(PyS)
    if (h == "Technology_Type" || h == "Assay_Name" || h == "Assay_Manufacturer" ||
        h == "Target_Organism")
      Outcome(Seq(Checks.isString(h, NoGate)))
    else if (h == "EUA_Status")
      Outcome(Seq(Checks.inList(h, NoGate, ss("Approved", "Submitted", "Not Submitted", "N/A"))))
    else if (h == "Assay_Multiplicity")
      Outcome(Seq(Checks.inList(h, NoGate, ss("Multiplex", "Singleplex"))))
    else if (h == "Assay_Control_Type")
      Outcome(Seq(Checks.inList(h, NoGate,
        ss("Internal", "External", "Internal and External", "N/A"))))
    else if (h == "Measurand_Antibody_Type")
      Outcome(Seq(Checks.inList(h, NoGate,
        ss("IgG", "IgM", "IgA", "IgG + IgM", "Total", "N/A"))))
    else if (h == "Assay_Result_Type")
      Outcome(Seq(Checks.inList(h, NoGate,
        ss("Qualitative", "Quantitative", "Semi-Quantitative"))))
    else if (h == "Peformance_Statistics_Source")
      Outcome(Seq(Checks.inList(h, NoGate, ss("Manufacturer", "In-house"))))
    else if (h == "Assay_Antigen_Source")
      Outcome(Seq(Checks.inList(h, NoGate, ss("Manufacturer", "In-house", "N/A"))))
    else if (h.contains("Target_biospecimen_is_"))
      Outcome(Seq(Checks.inList(h, NoGate, ss("T", "F"))))
    else if (h == "Postive_Control" || h == "Negative_Control" || h == "Calibration_Type" ||
        h == "Calibrator_High_or_Positive" || h == "Calibrator_Low_or_Negative")
      Outcome(Seq(Checks.isString(h, NoGate)))
    else if (h == "Assay_Result_Unit" || h == "Cut_Off_Unit" || h == "Assay_Target")
      Outcome(Seq(Checks.isString(h, NoGate)))
    else if (h == "Positive_Cut_Off_Threshold" || h == "Negative_Cut_Off_Ceiling" ||
        h == "Assay_Target_Sub_Region")
      Outcome(Seq(Checks.isString(h, NoGate)))
    else if (h == "N_true_positive" || h == "N_true_negative" ||
        h == "N_false_positive" || h == "N_false_negative")
      Outcome(Seq(Checks.number(h, NoGate, naAllowed = false, PyI(0), PyF(1e9), "int")))
    else NotFound
  }
}
