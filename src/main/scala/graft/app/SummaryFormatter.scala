package graft.app

import org.apache.spark.sql.DataFrame

/** Submission-summary message formatting (write_message_to_slack /
  * get_error_lists / populate_slack_string,
  * nci-seronet-data-validator.py:208-250). Pure string derivation — the
  * HTTP POST is the caller's concern (zero-egress here); production wires
  * `post: (channelUrl, body) => Unit`.
  *
  * Replicated quirk: the clean-pass list renders each sheet with its
  * *Warning* count — always "(0)" for clean sheets — exactly like the
  * reference's populate_slack_string(query "Error == 0 and Warning == 0",
  * table_col "Warning").
  *
  * Replicated quirk 2: `isFailure` fires on WARNINGS too. The
  * reference routes on `total_errors = len(Error_list)`
  * (nci-seronet-data-validator.py:240) and Error_list holds every
  * message regardless of Message_Type — so a warnings-only submission
  * goes to the FAILURE channel. `counts.values.sum` reproduces that
  * deliberately; do not "fix" it to Error-only counts.
  */
object SummaryFormatter {

  final case class Summary(isFailure: Boolean, text: String)

  def format(
      fileName: String,
      origFileId: String,
      submittedBy: String,
      sheets: Seq[String],
      counts: Map[(String, String), Long],
      validationDate: String): Summary = {
    def listOf(pred: (Long, Long) => Boolean, showCol: String): String = {
      val hits = sheets.flatMap { s =>
        val e = counts.getOrElse((s, "Error"), 0L)
        val w = counts.getOrElse((s, "Warning"), 0L)
        if (pred(e, w)) Some(s + " (" + (if (showCol == "Error") e else w) + ") ")
        else None
      }
      if (hits.isEmpty) "N/A" else hits.mkString(", ")
    }
    val failString = listOf((e, _) => e > 0, "Error")
    val passWarnString = listOf((e, w) => e == 0 && w > 0, "Warning")
    val passString = listOf((e, w) => e == 0 && w == 0, "Warning")
    val totalErrors = counts.values.sum
    val text =
      s"$fileName(Job ID: $origFileId CBC ID: $submittedBy)\n" +
        s"Validation pass clean: ($passString)\n " +
        s"Validation pass warning: (_${passWarnString}_) \n" +
        s"*Validation fail:* (*$failString*)\n File validated on $validationDate"
    Summary(isFailure = totalErrors > 0, text = text)
  }

  /** check_submission_quality failure message (write_slack_error shape). */
  def formatFailure(fileName: String, origFileId: String, submittedBy: String,
      reason: String, validationDate: String): String =
    s"$fileName(Job ID: $origFileId CBC ID: $submittedBy)\n " +
      s"*FAILURE_Reason:* *$reason* \n File validated on $validationDate"
}
