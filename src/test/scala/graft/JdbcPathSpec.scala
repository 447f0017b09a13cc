package graft

import graft.app.StatusDerivation.FileStatus
import graft.dispatch.SheetRegistry
import graft.io.JobsUpsert
import graft.io.JobsUpsert.{JobRow, SqlDialect}
import org.scalatest.funsuite.AnyFunSuite
import java.sql.DriverManager

/** End-to-end JDBC path against embedded Derby (ships with Spark, so zero
  * egress): the INFORMATION_SCHEMA-style catalog scan through
  * `spark.read.jdbc` and the jobs-table SELECT-then-UPDATE-or-INSERT flow.
  * Production targets MySQL (SqlDialect.MySql, reference parity incl.
  * backtick quoting); Derby runs the identical statement flow under Ansi
  * quoting. Derby exposes its catalog via SYS.SYSTABLES/SYSCOLUMNS rather
  * than INFORMATION_SCHEMA, which is exactly what the `catalogSql`
  * override of [[SheetRegistry.informationSchema]] is for.
  */
class JdbcPathSpec extends AnyFunSuite {
  import SparkTestSession._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  test("catalog scan via spark.read.jdbc feeds expectedColumns") {
    withConn { conn =>
      val st = conn.createStatement()
      // mixed-case table names must round-trip exactly (checkTables keys
      // them case-sensitively), hence quoted DDL
      st.executeUpdate("""CREATE TABLE "Demographic_Data" (
        "Research_Participant_ID" VARCHAR(32), "Age" VARCHAR(8))""")
      st.executeUpdate("""CREATE TABLE "Comorbidity" (
        "Other_Comorbidity" VARCHAR(64))""")
      st.close()
    }
    val derbyCatalogSql =
      """SELECT t.TABLENAME AS "TABLE_NAME", c.COLUMNNAME AS "COLUMN_NAME"
        |FROM SYS.SYSCOLUMNS c
        |JOIN SYS.SYSTABLES t ON c.REFERENCEID = t.TABLEID
        |WHERE t.TABLETYPE = 'T'""".stripMargin.replace("\n", " ")
    val catalog = SheetRegistry.informationSchema(spark, url, "ignored",
      new java.util.Properties(), Some(derbyCatalogSql))
    val expected = SheetRegistry.expectedColumns(catalog)
    // demographic.csv draws from 4 Check_Tables; only 2 exist here
    assert(expected("demographic.csv").toSet ==
      Set("Research_Participant_ID", "Age", "Other_Comorbidity"))
    assert(!expected.contains("assay.csv"))
  }

  test("jobs upsert: insert, then update on re-run; file status propagates") {
    withConn { conn =>
      val st = conn.createStatement()
      st.executeUpdate("""CREATE TABLE "table_data_validator" (
        "orig_file_id" VARCHAR(64), "data_validation_result_location" VARCHAR(256),
        "data_validation_date" VARCHAR(32), "unzipped_file_id" VARCHAR(64),
        "data_validation_notification_arn" VARCHAR(128),
        "data_validation_status" VARCHAR(64), "batch_validation_status" VARCHAR(64),
        "data_validation_updatedby" VARCHAR(64))""")
      st.executeUpdate("""CREATE TABLE "table_file_validator" (
        "unzipped_file_id" VARCHAR(64), "file_validation_status" VARCHAR(64))""")
      st.executeUpdate(
        """INSERT INTO "table_file_validator" VALUES ('u1', 'FILE_UNZIPPED')""")
      st.close()
    }
    val row = JobRow("orig1", "s3://results/r1", "2026-08-12", "u1", "arn:x",
      FileStatus("demographic.csv", "FILE_PROCESSED_ERRORS_FOUND",
        "BATCH_PROCESSED_ERRORS_FOUND"))
    withConn { conn =>
      conn.setAutoCommit(false)
      JobsUpsert.upsert(conn, Seq(row), SqlDialect.Ansi)
    }
    def state(): (Long, String, String) = withConn { conn =>
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          """SELECT COUNT(*) FROM "table_data_validator"""")
        rs.next(); val n = rs.getLong(1)
        val rs2 = st.executeQuery(
          """SELECT "data_validation_status", "data_validation_updatedby"
            |FROM "table_data_validator" WHERE "unzipped_file_id" = 'u1'"""
            .stripMargin.replace("\n", " "))
        rs2.next(); (n, rs2.getString(1), rs2.getString(2))
      } finally st.close()
    }
    val (n1, status1, user1) = state()
    assert(n1 == 1L && status1 == "FILE_PROCESSED_ERRORS_FOUND")
    assert(user1 != null && user1.nonEmpty) // the point-scalar current-user query
    // re-run with a changed status: must UPDATE in place, not insert a dup
    val row2 = row.copy(status = FileStatus("demographic.csv",
      "FILE_PROCESSED_SUCCESS", "BATCH_PROCESSED_SUCCESS"))
    withConn { conn =>
      conn.setAutoCommit(false)
      JobsUpsert.upsert(conn, Seq(row2), SqlDialect.Ansi)
    }
    val (n2, status2, _) = state()
    assert(n2 == 1L && status2 == "FILE_PROCESSED_SUCCESS")
    // downstream file_validator row tracks the latest status
    val fileStatus = withConn { conn =>
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          """SELECT "file_validation_status" FROM "table_file_validator"
            |WHERE "unzipped_file_id" = 'u1'""".stripMargin.replace("\n", " "))
        rs.next(); rs.getString(1)
      } finally st.close()
    }
    assert(fileStatus == "FILE_PROCESSED_SUCCESS")
  }

  test("MySql dialect emits the reference's backtick statement text (golden)") {
    // Derby exercises the statement FLOW under Ansi quoting; production
    // targets MySQL (update_jobs_tables, File_Submission_Object.py:480-499),
    // whose backtick text was previously only string-built, never asserted.
    // A recording java.sql.Connection proxy captures every statement the
    // upsert prepares — one pass with the probe answering "row exists"
    // (UPDATE branch), one answering "no row" (INSERT branch).
    import java.lang.reflect.{InvocationHandler, Method, Proxy}
    def proxy[T](cls: Class[T])(handle: (Method, Array[AnyRef]) => AnyRef): T =
      Proxy.newProxyInstance(cls.getClassLoader, Array(cls),
        new InvocationHandler {
          def invoke(p: AnyRef, m: Method, a: Array[AnyRef]): AnyRef =
            handle(m, a)
        }).asInstanceOf[T]
    def run(probeFinds: Boolean): Seq[String] = {
      val seen = scala.collection.mutable.ArrayBuffer[String]()
      def resultSet(rows: Iterator[String]): java.sql.ResultSet = {
        var cur: Option[String] = None
        proxy(classOf[java.sql.ResultSet]) { (m, _) =>
          m.getName match {
            case "next" =>
              cur = if (rows.hasNext) Some(rows.next()) else None
              java.lang.Boolean.valueOf(cur.isDefined)
            case "getString" => cur.orNull
            case _ => null
          }
        }
      }
      val conn = proxy(classOf[java.sql.Connection]) { (m, a) =>
        m.getName match {
          case "createStatement" => proxy(classOf[java.sql.Statement]) { (sm, sa) =>
            sm.getName match {
              case "executeQuery" =>
                seen += sa(0).asInstanceOf[String]
                resultSet(Iterator("mock_user"))
              case _ => null
            }
          }
          case "prepareStatement" =>
            val sql = a(0).asInstanceOf[String]
            seen += sql
            proxy(classOf[java.sql.PreparedStatement]) { (pm, _) =>
              pm.getName match {
                case "executeQuery" =>
                  resultSet(if (probeFinds) Iterator("1") else Iterator.empty)
                case "executeUpdate" => java.lang.Integer.valueOf(1)
                case _ => null
              }
            }
          case _ => null
        }
      }
      val row = JobRow("orig1", "s3://results/r1", "2026-08-12", "u1", "arn:x",
        FileStatus("demographic.csv", "FILE_PROCESSED_ERRORS_FOUND",
          "BATCH_PROCESSED_ERRORS_FOUND"))
      JobsUpsert.upsert(conn, Seq(row), SqlDialect.MySql)
      seen.toSeq
    }
    val cols = Seq("orig_file_id", "data_validation_result_location",
      "data_validation_date", "unzipped_file_id",
      "data_validation_notification_arn", "data_validation_status",
      "batch_validation_status", "data_validation_updatedby")
    val updatePath = run(probeFinds = true)
    assert(updatePath == Seq(
      "select current_user()",
      "SELECT 1 FROM `table_data_validator` WHERE `unzipped_file_id` = ?",
      "UPDATE `table_data_validator` SET " +
        cols.map(c => s"`$c` = ?").mkString(", ") +
        " WHERE `unzipped_file_id` = ?",
      "UPDATE `table_file_validator` SET `file_validation_status` = ? " +
        "WHERE `unzipped_file_id` = ?"))
    val insertPath = run(probeFinds = false)
    assert(insertPath == Seq(
      "select current_user()",
      "SELECT 1 FROM `table_data_validator` WHERE `unzipped_file_id` = ?",
      "INSERT INTO `table_data_validator` (" +
        cols.map(c => s"`$c`").mkString(",") + ") VALUES (" +
        cols.map(_ => "?").mkString(",") + ")",
      "UPDATE `table_file_validator` SET `file_validation_status` = ? " +
        "WHERE `unzipped_file_id` = ?"))
  }

  test("JDBC table slice reads back as a DataFrame (context fallback shape)") {
    withConn { conn =>
      val st = conn.createStatement()
      st.executeUpdate("""CREATE TABLE "visit_context" (
        "Research_Participant_ID" VARCHAR(32), "Visit_Number" VARCHAR(8))""")
      st.executeUpdate("""INSERT INTO "visit_context" VALUES ('P1', '1'), ('P2', '2')""")
      st.close()
    }
    val df = spark.read.jdbc(url,
      """(SELECT * FROM "visit_context") t""", new java.util.Properties())
    assert(df.columns.toSeq == Seq("Research_Participant_ID", "Visit_Number"))
    assert(df.count() == 2L)
  }
}
