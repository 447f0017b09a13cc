package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL `CALL` maintenance surface: `system.compact` /
  * `system.vacuum` through [[LakeCatalog]]'s ProcedureCatalog.
  */
class LakeProcedureSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def freshLake(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-proc-$tag")
      .toString + "/lake"

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)

  private def manifest(path: String) = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    PartitionedLake.latestManifest(fs, path).get
  }

  test("CALL system.compact materializes MOR deltas and returns the version pair; named arguments bind") {
    val lake = freshLake("compact")
    useCatalog()
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), lake, "part")
    PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
      Seq((1L, "a", 1L, "U", 7.0)).toDF("k", "part", "seq", "op", "val"))
    assert(manifest(lake).deltas.nonEmpty)
    val r = spark.sql(
      s"CALL graft_lake.system.compact(table => '$lake')").collect()
    assert(r.length === 1)
    assert(r(0).getString(0) === lake)
    assert(r(0).getLong(2) === r(0).getLong(1) + 1,
      "compact publishes exactly one version")
    assert(manifest(lake).deltas.isEmpty, "deltas must be materialized")
    assert(PartitionedLake.read(spark, lake)
      .filter(col("k") === 1L).select("bal").head.getDouble(0) === 7.0)
  }

  test("CALL system.compact(stats_cols) re-harvests bounds; a renamed lake re-physicalizes and the native batch returns") {
    val lake = freshLake("stats")
    useCatalog()
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "a", 200.0))
      .toDF("k", "part", "v"), lake, "part")
    spark.sql(s"ALTER TABLE graft_lake.`$lake` RENAME COLUMN v TO w")
    assert(!LakeNativeBatchScan.eligible(manifest(lake)))
    spark.sql(s"CALL graft_lake.system.compact(table => '$lake', " +
      "stats_cols => 'w')")
    val m = manifest(lake)
    assert(LakeNativeBatchScan.eligible(m), "compact must clear the pins")
    assert(m.files.values.flatten.forall(_.stats.contains("w")))
  }

  test("CALL system.vacuum reclaims superseded files outside the window") {
    val lake = freshLake("vacuum")
    useCatalog()
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      lake, "part")
    val v1Files = PartitionedLake.read(spark, lake).inputFiles.toSet
    PartitionedLake.write(Seq((2L, "a", 2.0)).toDF("k", "part", "bal"),
      lake, "part") // full overwrite supersedes v1's files
    val r = spark.sql(
      s"CALL graft_lake.system.vacuum(table => '$lake', keep_last => 1)")
      .collect()
    assert(r.length === 1 && r(0).getString(0) === lake)
    v1Files.foreach { f =>
      assert(!new java.io.File(new java.net.URI(f).getPath).exists(),
        s"superseded file survived vacuum: $f")
    }
    assert(PartitionedLake.read(spark, lake).select("k").head.getLong(0)
      === 2L)
  }

  test("refusals: unknown procedure, foreign namespace, missing lake") {
    useCatalog()
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    val unk = intercept[Exception](
      spark.sql("CALL graft_lake.system.optimize(table => '/tmp/x')"))
    assert(messages(unk).exists(_.contains("available")), unk.toString)
    val ns = intercept[Exception](
      spark.sql("CALL graft_lake.other.compact(table => '/tmp/x')"))
    assert(messages(ns).exists(_.contains("namespace")), ns.toString)
    val missing = intercept[Exception](spark.sql(
      s"CALL graft_lake.system.compact(table => '/tmp/nope-${System.nanoTime}')"))
    assert(messages(missing).exists(_.contains("no graft lake")),
      missing.toString)
  }
}
