package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** The README quickstart, executed statement-for-statement (against a
  * temp dir): the sequence is advertised as paste-runnable, so a
  * refusal introduced anywhere in the chain (rename -> add -> widen ->
  * partition overwrite -> drop -> CALL compact -> time travel -> CDF)
  * must fail THIS spec before it fails a user.
  */
class ReadmeQuickstartSpec extends AnyFunSuite {
  import graft.SparkTestSession._

  test("readme quickstart sequence runs") {
    val dir = java.nio.file.Files.createTempDirectory("readme").toString +
      "/events"
    spark.conf.set("spark.sql.catalog.lake", classOf[LakeCatalog].getName)
    val stmts = Seq(
      s"CREATE TABLE lake.`$dir` (day STRING, k BIGINT, v DOUBLE) PARTITIONED BY (day)",
      s"INSERT INTO lake.`$dir` VALUES ('2026-01-01', 1, 1.0), ('2026-01-02', 2, 2.0)",
      s"SELECT count(*) FROM lake.`$dir`",
      s"SELECT * FROM lake.`$dir` WHERE day = '2026-01-01'",
      s"UPDATE lake.`$dir` SET v = v + 1 WHERE k = 2",
      s"MERGE INTO lake.`$dir` t USING (SELECT '2026-01-02' AS day, CAST(9 AS BIGINT) AS k, 9.0 AS v) s ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v WHEN NOT MATCHED THEN INSERT (day, k, v) VALUES (s.day, s.k, s.v)",
      s"DELETE FROM lake.`$dir` WHERE day = '2026-01-01'",
      s"ALTER TABLE lake.`$dir` RENAME COLUMN v TO amount",
      s"ALTER TABLE lake.`$dir` ADD COLUMNS (src STRING)",
      s"ALTER TABLE lake.`$dir` ALTER COLUMN k TYPE DECIMAL(20,0)",
      s"INSERT OVERWRITE lake.`$dir` PARTITION (day = '2026-01-02') VALUES (5, 5.0, 'a')",
      s"ALTER TABLE lake.`$dir` DROP COLUMN src",
      s"CALL lake.system.compact(table => '$dir')",
      "SET spark.graft.lake.rowLevel.mode = merge-on-read",
      "SET spark.graft.lake.rowLevel.key = k",
      s"UPDATE lake.`$dir` SET amount = amount - 1 WHERE k = 5",
      "SET spark.graft.lake.rowLevel.mode = copy-on-write",
      s"SELECT * FROM lake.`$dir` VERSION AS OF 2",
      s"CALL lake.system.tag(table => '$dir', name => 'v1-release')",
      s"SELECT * FROM lake.`$dir` VERSION AS OF 'v1-release'",
      s"SELECT * FROM lake.`$dir#tags`",
      s"SELECT * FROM lake.`$dir#partitions`",
      s"SELECT * FROM lake.`$dir#files` VERSION AS OF 'v1-release'",
      s"CALL lake.system.rollback(table => '$dir', tag => 'v1-release')",
      s"CALL lake.system.branch(table => '$dir', name => 'audit')",
      "SET spark.graft.lake.branch = audit",
      s"UPDATE lake.`$dir` SET amount = 0 WHERE k = 5",
      "RESET spark.graft.lake.branch",
      s"SELECT * FROM lake.`$dir#branch=audit` EXCEPT SELECT * FROM lake.`$dir`",
      s"SELECT * FROM lake.`$dir#branches`",
      s"SELECT * FROM lake.`$dir#branch=audit#files`",
      s"SELECT * FROM lake.`$dir#branch=audit#changes?from=12&to=13&keyCols=day,k`",
      s"CALL lake.system.rebase_branch(table => '$dir', name => 'audit')",
      s"CALL lake.system.publish_branch(table => '$dir', name => 'audit')",
      s"SELECT * FROM lake.`$dir#history`",
      s"SELECT * FROM lake.`$dir#changes?from=2&to=3&keyCols=day,k`",
      s"ALTER TABLE lake.`$dir` ADD COLUMNS (source STRING DEFAULT 'batch')",
      s"ALTER TABLE lake.`$dir` ALTER COLUMN source SET DEFAULT 'stream'",
      s"ALTER TABLE lake.`$dir` ADD CONSTRAINT amount_nonneg CHECK (amount >= 0)",
      s"SELECT * FROM lake.`$dir#constraints`",
      s"DROP TABLE lake.`$dir`")
    stmts.foreach { q =>
      try spark.sql(q).collect()
      catch { case e: Throwable =>
        fail(s"quickstart statement failed: $q\n  -> ${e.getMessage}")
      }
    }
  }
}
