package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `#files` / `#partitions` snapshot-inventory metadata tables:
  * manifest-only answers to the ops questions (file sizes, per-partition
  * row counts, delta accumulation), with snapshot semantics — they
  * time-travel by version AND by tag, unlike `#history`/`#tags`.
  */
class LakeMetaTablesSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def freshLake(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-meta-$tag")
      .toString + "/lake"

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)

  test("#partitions: per-directory counts and bytes from the manifest; dirty partitions report delta counts and honest null rows") {
    val lake = freshLake("parts")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "a", 2.0),
      (3L, "b", 3.0)).toDF("k", "part", "bal"), lake, "part")
    useCatalog()
    val clean = spark.sql(
      s"SELECT partition, n_files, n_deltas, bytes, rows " +
        s"FROM graft_lake.`$lake#partitions` ORDER BY partition")
      .collect()
    assert(clean.map(r => (r.getString(0), r.getInt(2), r.getLong(4)))
      .toSeq === Seq(("part=a", 0, 2L), ("part=b", 0, 1L)))
    assert(clean.forall(r => !r.isNullAt(3) && r.getLong(3) > 0),
      "byte totals come free from the manifest")
    // cdc deltas land on part=a: its row count honestly degrades to
    // null (post-merge counts are unknowable from metadata), and the
    // sidecar is counted
    PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
      Seq(("a", 1L, 1L, "U", 9.0)).toDF("part", "k", "seq", "op", "val"))
    val dirty = spark.sql(
      s"SELECT partition, n_deltas, rows " +
        s"FROM graft_lake.`$lake#partitions` ORDER BY partition")
      .collect()
    assert(dirty.map(r => (r.getString(0), r.getInt(1))).toSeq ===
      Seq(("part=a", 1), ("part=b", 0)))
    assert(dirty(0).isNullAt(2), "dirty partition must not guess rows")
    assert(dirty(1).getLong(2) === 1L)
  }

  test("#files: one row per live file and sidecar; time-travels by numeric version AND by tag") {
    val lake = freshLake("files")
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      lake, "part") // v1
    useCatalog()
    PartitionedLake.tag(spark, lake, "first", 1L)
    PartitionedLake.append(Seq((2L, "b", 2.0)).toDF("k", "part", "bal"),
      lake, Seq("part")) // v2
    PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
      Seq(("a", 1L, 1L, "U", 9.0)).toDF("part", "k", "seq", "op", "val"))
    val now = spark.sql(
      s"SELECT partition, kind FROM graft_lake.`$lake#files` " +
        "ORDER BY partition, kind").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(now.toSeq ===
      Seq(("part=a", "data"), ("part=a", "delta"), ("part=b", "data")))
    // snapshot semantics: v1 had one file, by number or by tag
    assert(spark.sql(s"SELECT count(*) FROM graft_lake.`$lake#files` " +
      "VERSION AS OF 1").head().getLong(0) === 1L)
    assert(spark.sql(s"SELECT count(*) FROM graft_lake.`$lake#files` " +
      "VERSION AS OF 'first'").head().getLong(0) === 1L)
    // data rows carry manifest bytes/rows; sidecars are name-only
    val kinds = spark.sql(s"SELECT kind, bytes, rows " +
      s"FROM graft_lake.`$lake#files`").collect()
    assert(kinds.filter(_.getString(0) == "data")
      .forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
    assert(kinds.filter(_.getString(0) == "delta")
      .forall(r => r.isNullAt(1) && r.isNullAt(2)))
  }
}
