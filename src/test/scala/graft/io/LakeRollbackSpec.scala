package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `PartitionedLake.rollback` / `CALL system.rollback`: republish a
  * retained snapshot as the new head — history preserved (the bad
  * versions stay time-travelable), zero data jobs, replay guards
  * carried forward (never rewound).
  */
class LakeRollbackSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def freshLake(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-rb-$tag")
      .toString + "/lake"

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)

  private def rowsOf(lake: String): Set[(String, Long, Double)] =
    PartitionedLake.read(spark, lake).select("part", "k", "bal").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("rollback restores content as a NEW version: bad versions stay time-travelable, files re-referenced not copied") {
    val lake = freshLake("undo")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), lake, "part") // v1
    useCatalog()
    val v1Rows = rowsOf(lake)
    val v1Files = PartitionedLake.read(spark, lake).inputFiles.toSet
    spark.sql(s"UPDATE graft_lake.`$lake` SET bal = 99 WHERE k = 1") // v2
    spark.sql(s"DELETE FROM graft_lake.`$lake` WHERE part = 'b'") // v3
    assert(rowsOf(lake) === Set(("a", 1L, 99.0)))
    val published = PartitionedLake.rollback(spark, lake, 1L)
    assert(published === 4L)
    assert(rowsOf(lake) === v1Rows)
    // zero data jobs: the head references v1's exact file set
    assert(PartitionedLake.read(spark, lake).inputFiles.toSet === v1Files)
    // the mistake is still auditable
    assert(PartitionedLake.snapshots(spark, lake) === Seq(1L, 2L, 3L, 4L))
    assert(PartitionedLake.readVersion(spark, lake, 3L)
      .select("part", "k", "bal").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet ===
      Set(("a", 1L, 99.0)))
    // rolling back to the current content is a no-op (no churn)
    assert(PartitionedLake.rollback(spark, lake, 4L) === 4L)
    assert(PartitionedLake.snapshots(spark, lake) === Seq(1L, 2L, 3L, 4L))
    // unresolvable target refuses
    assert(intercept[Exception](
      PartitionedLake.rollback(spark, lake, 99L))
      .getMessage.contains("not a resolvable snapshot"))
  }

  test("replay guards carry forward: a rollback must not reopen the door to double-applying a folded streaming batch") {
    val lake = freshLake("txn")
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      lake, "part") // v1
    def batch(bal: Double, id: Long): Unit =
      PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
        Seq(("a", 1L, 1L, "U", bal)).toDF("part", "k", "seq", "op", "val"),
        batchId = Some(id))
    batch(50.0, 5L) // v2 (dirty)
    assert(rowsOf(lake) === Set(("a", 1L, 50.0)))
    PartitionedLake.rollback(spark, lake, 1L) // v3: v1 content
    assert(rowsOf(lake) === Set(("a", 1L, 1.0)))
    // a redelivery of the already-folded batch is STILL skipped
    batch(777.0, 5L)
    assert(rowsOf(lake) === Set(("a", 1L, 1.0)),
      "rollback must not rewind the transaction guard")
    // a genuinely new batch applies
    batch(60.0, 6L)
    assert(rowsOf(lake) === Set(("a", 1L, 60.0)))
  }

  test("rollback undoes schema evolution too; CALL system.rollback targets by version or tag, refusing ambiguous calls") {
    val lake = freshLake("sql")
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      lake, "part") // v1
    useCatalog()
    PartitionedLake.tag(spark, lake, "good", 1L)
    spark.sql(s"ALTER TABLE graft_lake.`$lake` ADD COLUMNS (note STRING)")
    assert(spark.sql(s"SELECT * FROM graft_lake.`$lake`")
      .columns.contains("note"))
    val row = spark.sql(s"CALL graft_lake.system.rollback(" +
      s"table => '$lake', tag => 'good')").head()
    assert(row.getLong(2) === 3L)
    assert(!spark.sql(s"SELECT * FROM graft_lake.`$lake`")
      .columns.contains("note"), "rollback restores the old schema")
    // by version
    spark.sql(s"CALL graft_lake.system.rollback(table => '$lake', " +
      "version => 2)")
    assert(spark.sql(s"SELECT * FROM graft_lake.`$lake`")
      .columns.contains("note"))
    // both / neither target refuses
    assert(intercept[Exception](spark.sql(
      s"CALL graft_lake.system.rollback(table => '$lake')").collect())
      .getMessage.contains("exactly one"))
    assert(intercept[Exception](spark.sql(
      s"CALL graft_lake.system.rollback(table => '$lake', " +
        "version => 1, tag => 'good')").collect())
      .getMessage.contains("exactly one"))
  }
}
