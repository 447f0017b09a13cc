package graft.io

import graft.app.StatusDerivation.FileStatus
import java.sql.Connection

/** MySQL jobs-table upsert (update_jobs_tables,
  * File_Submission_Object.py:480-499). Row counts are tiny (one per
  * submitted file), so this is driver-side `java.sql` — a Spark JDBC sink
  * would be pure overhead and has no upsert anyway (SURVEY §2.1 S8).
  *
  * The reference's UPDATE statement is malformed (backtick/quote arithmetic
  * mangles the last assignment — defect register §2.9-5); this implements
  * the intended SELECT-then-UPDATE-or-INSERT with prepared statements.
  */
object JobsUpsert {

  final case class JobRow(
      origFileId: String,
      resultLocation: String,
      validationDate: String,
      unzippedFileId: String,
      notificationArn: String,
      status: FileStatus)

  private val columns = Seq(
    "orig_file_id", "data_validation_result_location", "data_validation_date",
    "unzipped_file_id", "data_validation_notification_arn",
    "data_validation_status", "batch_validation_status", "data_validation_updatedby")

  def upsert(conn: Connection, rows: Seq[JobRow]): Unit = {
    val user = {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery("select current_user()")
        if (rs.next()) rs.getString(1) else "unknown"
      } finally st.close()
    }
    rows.foreach { r =>
      val values = Seq(r.origFileId, r.resultLocation, r.validationDate,
        r.unzippedFileId, r.notificationArn, r.status.status,
        r.status.batchStatus, user)
      val existing = {
        val ps = conn.prepareStatement(
          "SELECT 1 FROM table_data_validator WHERE unzipped_file_id = ?")
        try {
          ps.setString(1, r.unzippedFileId)
          val rs = ps.executeQuery()
          rs.next()
        } finally ps.close()
      }
      if (existing) {
        val sets = columns.map(c => s"`$c` = ?").mkString(", ")
        val ps = conn.prepareStatement(
          s"UPDATE `table_data_validator` SET $sets WHERE unzipped_file_id = ?")
        try {
          values.zipWithIndex.foreach { case (v, i) => ps.setString(i + 1, v) }
          ps.setString(values.size + 1, r.unzippedFileId)
          ps.executeUpdate()
        } finally ps.close()
      } else {
        val ps = conn.prepareStatement(
          s"INSERT INTO `table_data_validator` (${columns.map(c => s"`$c`").mkString(",")}) " +
            s"VALUES (${columns.map(_ => "?").mkString(",")})")
        try {
          values.zipWithIndex.foreach { case (v, i) => ps.setString(i + 1, v) }
          ps.executeUpdate()
        } finally ps.close()
      }
      val ps = conn.prepareStatement(
        "UPDATE `table_file_validator` SET file_validation_status = ? WHERE unzipped_file_id = ?")
      try {
        ps.setString(1, r.status.status)
        ps.setString(2, r.unzippedFileId)
        ps.executeUpdate()
      } finally ps.close()
    }
    conn.commit()
  }
}
