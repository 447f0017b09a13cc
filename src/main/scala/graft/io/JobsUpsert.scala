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

  /** Identifier quoting + scalar-user query differ per engine: MySQL is
    * the production target (reference parity); Ansi lets the upsert run
    * unchanged against any standards-quoting store (embedded Derby in
    * JdbcPathSpec, exercising the real statement flow with zero egress).
    */
  final case class SqlDialect(quote: String => String, currentUserSql: String)
  object SqlDialect {
    val MySql: SqlDialect = SqlDialect(c => s"`$c`", "select current_user()")
    val Ansi: SqlDialect = SqlDialect(c => "\"" + c + "\"", "VALUES CURRENT_USER")
  }

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

  def upsert(conn: Connection, rows: Seq[JobRow],
      dialect: SqlDialect = SqlDialect.MySql): Unit = {
    import dialect.quote
    val user = {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(dialect.currentUserSql)
        if (rs.next()) rs.getString(1) else "unknown"
      } finally st.close()
    }
    rows.foreach { r =>
      val values = Seq(r.origFileId, r.resultLocation, r.validationDate,
        r.unzippedFileId, r.notificationArn, r.status.status,
        r.status.batchStatus, user)
      val existing = {
        val ps = conn.prepareStatement(
          s"SELECT 1 FROM ${quote("table_data_validator")} WHERE ${quote("unzipped_file_id")} = ?")
        try {
          ps.setString(1, r.unzippedFileId)
          val rs = ps.executeQuery()
          rs.next()
        } finally ps.close()
      }
      if (existing) {
        val sets = columns.map(c => s"${quote(c)} = ?").mkString(", ")
        val ps = conn.prepareStatement(
          s"UPDATE ${quote("table_data_validator")} SET $sets WHERE ${quote("unzipped_file_id")} = ?")
        try {
          values.zipWithIndex.foreach { case (v, i) => ps.setString(i + 1, v) }
          ps.setString(values.size + 1, r.unzippedFileId)
          ps.executeUpdate()
        } finally ps.close()
      } else {
        val ps = conn.prepareStatement(
          s"INSERT INTO ${quote("table_data_validator")} (${columns.map(quote).mkString(",")}) " +
            s"VALUES (${columns.map(_ => "?").mkString(",")})")
        try {
          values.zipWithIndex.foreach { case (v, i) => ps.setString(i + 1, v) }
          ps.executeUpdate()
        } finally ps.close()
      }
      val ps = conn.prepareStatement(
        s"UPDATE ${quote("table_file_validator")} SET ${quote("file_validation_status")} = ? WHERE ${quote("unzipped_file_id")} = ?")
      try {
        ps.setString(1, r.status.status)
        ps.setString(2, r.unzippedFileId)
        ps.executeUpdate()
      } finally ps.close()
    }
    conn.commit()
  }
}
