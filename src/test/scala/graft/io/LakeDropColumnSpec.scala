package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DROP COLUMN as a manifest-only commit
  * ([[PartitionedLake.dropColumn]] + `ALTER TABLE ... DROP COLUMN`
  * routing): the field leaves the schema, its stable id TOMBSTONES
  * (`#dropped-<id>` stays in `meta:column-ids` so the mapping's max is
  * monotone and the id is never reassigned), and the dead bytes are
  * pinned (`pn:`) so a later column re-using the name reads typed
  * nulls instead of them.
  */
class LakeDropColumnSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def freshLake(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-drop-$tag")
      .toString + "/lake"

  private def fsOf(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifest(path: String) =
    PartitionedLake.latestManifest(fsOf(path), path).get

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)

  private def dataFileNames(lake: String): Set[String] =
    new java.io.File(lake).listFiles().filter(_.isDirectory)
      .filterNot(_.getName.startsWith("_")).flatMap(_.listFiles())
      .map(_.getName).filter(_.endsWith(".parquet")).toSet

  test("drop is manifest-only: zero new data files, the column is gone from reads, the pre-drop snapshot time-travels with its values") {
    val lake = freshLake("basic")
    PartitionedLake.write(Seq((1L, "a", 1.0, "x"), (2L, "b", 2.0, "y"))
      .toDF("k", "part", "v", "tag"), lake, "part")
    val before = dataFileNames(lake)
    PartitionedLake.dropColumn(spark, lake, "tag")
    assert(dataFileNames(lake) === before, "drop must not write data")
    val read = PartitionedLake.read(spark, lake)
    assert(read.columns.toSeq === Seq("k", "part", "v"))
    assert(read.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSet ===
      Set((1L, "a", 1.0), (2L, "b", 2.0)))
    // time travel still surfaces the dropped column's real values
    val v1 = PartitionedLake.readVersion(spark, lake, 1L)
    assert(v1.columns.toSeq === Seq("k", "part", "v", "tag"))
    assert(v1.select("tag").collect().map(_.getString(0)).toSet ===
      Set("x", "y"))
    // the id tombstoned: mapping still carries it, max never decreased
    val ids = manifest(lake).columnIds.get
    assert(!ids.contains("tag"))
    assert(ids.keys.exists(_.startsWith(PartitionedLake.DroppedIdPrefix)),
      s"expected a tombstone entry in $ids")
  }

  test("drop-then-add-same-name: old files read typed nulls (never the dead bytes); the new column gets a FRESH id above the tombstone") {
    val lake = freshLake("readd")
    PartitionedLake.write(Seq((1L, "a", 1.0, 100L), (2L, "b", 2.0, 200L))
      .toDF("k", "part", "v", "score"), lake, "part")
    val droppedId = manifest(lake).columnIds.get("score")
    PartitionedLake.dropColumn(spark, lake, "score")
    PartitionedLake.addColumns(spark, lake, Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.LongType)))
    // the exact id-reuse hazard: if the fresh id equaled the dropped
    // one, the old files' pins would resolve the NEW score to the DEAD
    // bytes (100/200) instead of null
    val ids = manifest(lake).columnIds.get
    assert(ids("score") > droppedId,
      s"re-added column must get a fresh id (dropped $droppedId): $ids")
    val got = PartitionedLake.read(spark, lake).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None
        else Some(r.getLong(3)))).toSet
    assert(got === Set((1L, None), (2L, None)),
      "old files must read typed nulls for the re-added name")
    // new writes carry real values next to the old files' nulls
    PartitionedLake.append(Seq((3L, "a", 3.0, 300L))
      .toDF("k", "part", "v", "score"), lake, Seq("part"))
    val all = PartitionedLake.read(spark, lake).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None
        else Some(r.getLong(3)))).toSet
    assert(all === Set((1L, None), (2L, None), (3L, Some(300L))))
  }

  test("dropping the max-id column keeps the floor: the next add allocates ABOVE the tombstone, not into it") {
    val lake = freshLake("maxid")
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "v"),
      lake, "part")
    PartitionedLake.addColumns(spark, lake, Seq(
      org.apache.spark.sql.types.StructField("late",
        org.apache.spark.sql.types.LongType)))
    val lateId = manifest(lake).columnIds.get("late")
    assert(lateId === manifest(lake).columnIds.get.values.max)
    PartitionedLake.dropColumn(spark, lake, "late")
    PartitionedLake.addColumns(spark, lake, Seq(
      org.apache.spark.sql.types.StructField("fresh",
        org.apache.spark.sql.types.StringType)))
    assert(manifest(lake).columnIds.get("fresh") > lateId,
      s"id $lateId must never be reassigned: ${manifest(lake).columnIds}")
  }

  test("refusal matrix: unknown column, partition column, last data column, live MOR deltas, pre-protocol lake, reserved-prefix names") {
    val lake = freshLake("refuse")
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "v"),
      lake, "part")
    assert(intercept[Exception] {
      PartitionedLake.dropColumn(spark, lake, "nope")
    }.getMessage.contains("no such column"))
    assert(intercept[Exception] {
      PartitionedLake.dropColumn(spark, lake, "part")
    }.getMessage.contains("partition column"))
    // dropping k then v would leave only the partition column
    PartitionedLake.dropColumn(spark, lake, "k")
    assert(intercept[Exception] {
      PartitionedLake.dropColumn(spark, lake, "v")
    }.getMessage.contains("last data column"))
    // live deltas refuse with compact directions
    val morLake = freshLake("refuse-mor")
    PartitionedLake.write(Seq((1L, "a", 1.0, "t"))
      .toDF("k", "part", "v", "tag"), morLake, "part")
    PartitionedLake.cdcSinkMergeOnRead(spark, morLake, "part", "k", "v",
      Seq((1L, "a", 1L, "U", 9.0)).toDF("k", "part", "seq", "op", "val"))
    assert(intercept[Exception] {
      PartitionedLake.dropColumn(spark, morLake, "tag")
    }.getMessage.contains("compact"))
    // pre-protocol refuses with adoption directions
    val legacy = freshLake("refuse-legacy")
    Seq((1L, "a", 1.0)).toDF("k", "part", "v")
      .write.partitionBy("part").parquet(legacy)
    assert(intercept[Exception] {
      PartitionedLake.dropColumn(spark, legacy, "v")
    }.getMessage.contains("pre-protocol"))
    // the tombstone namespace is fenced at both entry chokepoints
    assert(intercept[Exception] {
      PartitionedLake.write(Seq((1L, "a", 1.0))
        .toDF("k", "part", "#dropped-9"), freshLake("reserved"), "part")
    }.getMessage.contains("reserved"))
    assert(intercept[Exception] {
      PartitionedLake.renameColumn(spark, lake, "v", "#dropped-1")
    }.getMessage.contains("reserved"))
  }

  test("SQL: ALTER TABLE DROP COLUMN routes through the manifest commit; nested fields refuse") {
    val lake = freshLake("sql")
    useCatalog()
    PartitionedLake.write(Seq((1L, "a", 1.0, "x"))
      .toDF("k", "part", "v", "tag"), lake, "part")
    spark.sql(s"ALTER TABLE graft_lake.`$lake` DROP COLUMN tag")
    assert(PartitionedLake.read(spark, lake).columns.toSeq ===
      Seq("k", "part", "v"))
    assert(spark.sql(s"SELECT * FROM graft_lake.`$lake`")
      .columns.toSeq === Seq("k", "part", "v"))
  }

  test("compact() rewrites the dead bytes away, clears the pins, and the native DSv2 batch returns") {
    val lake = freshLake("compact")
    useCatalog()
    PartitionedLake.write(Seq((1L, "a", 1.0, "x"), (2L, "b", 2.0, "y"))
      .toDF("k", "part", "v", "tag"), lake, "part")
    PartitionedLake.dropColumn(spark, lake, "tag")
    assert(manifest(lake).files.values.exists(_.exists(
      _.physNames.nonEmpty)), "drop must pin the dead bytes")
    PartitionedLake.compact(spark, lake)
    assert(manifest(lake).files.values.forall(_.forall(
      _.physNames.isEmpty)), "compact must clear the pins")
    val q = spark.sql(
      s"SELECT k, v FROM graft_lake.`$lake` WHERE part = 'a'")
    assert(q.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ===
      Set((1L, 1.0)))
    q.collect()
    assert(LakeScanCheck.nativePruning(q).nonEmpty,
      "the compacted lake must plan natively again")
  }

  test("a data commit racing a drop conflicts loudly instead of silently resurrecting the column") {
    val lake = freshLake("race")
    val fs = fsOf(lake)
    PartitionedLake.write(Seq((1L, "a", 1.0, "x"))
      .toDF("k", "part", "v", "tag"), lake, "part")
    val base = PartitionedLake.latestManifest(fs, lake).get
    val df = Seq((2L, "b", 2.0, "y")).toDF("k", "part", "v", "tag")
    val (staging, staged) =
      PartitionedLake.stage(spark, fs, lake, df, Seq("part"), Nil)
    // the drop lands between this commit's manifest read and publish
    PartitionedLake.dropColumn(spark, lake, "tag")
    val e = intercept[Exception] {
      PartitionedLake.commitStaged(fs, lake, staging, staged,
        staged.keySet, df.schema, Some(base), None)
    }
    assert(e.getMessage.contains("dropped by a racing committer"),
      e.getMessage)
    // the lake is exactly the drop's snapshot (nothing half-applied)
    assert(PartitionedLake.read(spark, lake).columns.toSeq ===
      Seq("k", "part", "v"))
    assert(PartitionedLake.read(spark, lake).count() === 1L)
  }

  test("#changes across a drop stays consistent: the dropped column leaves the feed, updates still classify with real pre-images") {
    val lake = freshLake("cdf")
    PartitionedLake.write(Seq((1L, "a", 1.0, "x"), (2L, "a", 2.0, "y"))
      .toDF("k", "part", "v", "tag"), lake, "part")
    PartitionedLake.dropColumn(spark, lake, "tag")              // v2
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((2L, "a", 20.0)).toDF("k", "part", "v"))              // v3
    val ch = PartitionedLake.changesBetween(spark, lake, 1L, 3L,
      Seq("k"))
    assert(!ch.columns.contains("tag"),
      "the dropped column must leave the change feed (TO-schema shape)")
    val upd = ch.filter(col("_change_type") === "update_postimage")
      .select("k", "v").collect().map(r =>
        (r.getLong(0), r.getDouble(1))).toSet
    assert(upd === Set((2L, 20.0)))
    val pre = ch.filter(col("_change_type") === "update_preimage")
      .select("k", "v").collect().map(r =>
        (r.getLong(0), r.getDouble(1))).toSet
    assert(pre === Set((2L, 2.0)),
      "pre-images must survive the drop (real values, not nulls)")
  }
}
