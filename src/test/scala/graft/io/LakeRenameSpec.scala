package graft.io

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField}
import org.scalatest.funsuite.AnyFunSuite

/** Column renames as manifest-only commits: the `meta:column-ids`
  * WRITER half ([[PartitionedLake.renameColumn]] /
  * [[PartitionedLake.addColumns]] / `ALTER TABLE` routing), the
  * per-file physical-name pins (`pn:<id>:<name>`) that keep old files
  * readable EXACTLY, and the `.2` manifest-minor gate that keeps
  * pin-ignorant readers from surfacing nulls.
  */
class LakeRenameSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def freshLake(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-rn-$tag")
      .toString + "/lake"

  private def fsOf(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifest(path: String) =
    PartitionedLake.latestManifest(fsOf(path), path).get

  private def headerOf(path: String): String = {
    val m = manifest(path)
    PartitionedLake.readSmallTextFile(fsOf(path),
      new org.apache.hadoop.fs.Path(path,
        f"_manifest/v${m.version}%09d.txt")).split("\n").head
  }

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)

  test("rename is a manifest-only commit: old files read under the new name, new writes use it, header gates pin-ignorant readers, compact clears the pins") {
    val lake = freshLake("basic")
    PartitionedLake.write(Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("k", "part", "bal"), lake, "part")
    val filesBefore = PartitionedLake.read(spark, lake).inputFiles.toSet
    PartitionedLake.renameColumn(spark, lake, "bal", "balance")
    // zero data jobs: the same physical files serve the renamed read
    val df = PartitionedLake.read(spark, lake)
    assert(df.columns.toSeq === Seq("k", "part", "balance"))
    assert(df.inputFiles.toSet === filesBefore, "rename rewrote data")
    assert(df.select("k", "balance").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet ===
      Set((1L, 10.0), (2L, 20.0)),
      "old files must read their values under the NEW name (by id)")
    // the id was rebound, not reassigned; the pin names the old
    // physical column; the header minor gates by-name readers out
    val m = manifest(lake)
    assert(m.columnIds === Some(Map("k" -> 1, "part" -> 2, "balance" -> 3)))
    assert(m.files.values.flatten.forall(_.physNames === Map(3 -> "bal")))
    assert(headerOf(lake) === "graft-lake-manifest v1.2")
    // new writes carry the new name physically (no pin on fresh files)
    PartitionedLake.append(Seq((3L, "a", 30.0)).toDF("k", "part", "balance"),
      lake, Seq("part"))
    val mixed = PartitionedLake.read(spark, lake)
    assert(mixed.select("k", "balance").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet ===
      Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    val m2 = manifest(lake)
    val fresh = m2.files("part=a").filterNot(e =>
      m.files("part=a").map(_.name).contains(e.name))
    assert(fresh.nonEmpty && fresh.forall(_.physNames.isEmpty))
    // time travel BEFORE the rename shows the old name with the values
    val v1 = PartitionedLake.readVersion(spark, lake, 1L)
    assert(v1.columns.toSeq === Seq("k", "part", "bal"))
    assert(v1.filter(col("k") === 1L).select("bal").head.getDouble(0)
      === 10.0)
    // the pinned snapshot is ineligible for the native batch; compact
    // rewrites the pins away and restores it
    assert(!LakeNativeBatchScan.eligible(m2))
    PartitionedLake.compact(spark, lake)
    val m3 = manifest(lake)
    assert(m3.files.values.flatten.forall(_.physNames.isEmpty),
      "compact must clear every physical-name pin")
    assert(LakeNativeBatchScan.eligible(m3))
    assert(headerOf(lake) === "graft-lake-manifest v1.1",
      "a pin-free manifest returns to the widest-readable header")
    assert(PartitionedLake.read(spark, lake).select("k", "balance")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ===
      Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))
  }

  test("rename-then-add-same-name: the old files' bytes stay with the renamed id; the reused name reads typed null there") {
    val lake = freshLake("reuse")
    PartitionedLake.write(Seq((1L, "a", 10.0)).toDF("k", "part", "v"),
      lake, "part")
    PartitionedLake.renameColumn(spark, lake, "v", "w")
    PartitionedLake.addColumns(spark, lake,
      Seq(StructField("v", LongType)))
    assert(manifest(lake).columnIds ===
      Some(Map("k" -> 1, "part" -> 2, "w" -> 3, "v" -> 4)))
    // the old file physically holds a column named "v" — those bytes
    // belong to id 3 (now "w"); the NEW "v" (id 4) must read null there
    val r = PartitionedLake.read(spark, lake)
      .select("k", "w", "v").collect()
    assert(r.map(x => (x.getLong(0), x.getDouble(1), x.isNullAt(2)))
      .toSet === Set((1L, 10.0, true)))
    // new rows carry both; the mix resolves per file group
    PartitionedLake.append(Seq((2L, "a", 20.0, 99L))
      .toDF("k", "part", "w", "v"), lake, Seq("part"))
    val all = PartitionedLake.read(spark, lake)
      .select("k", "w", "v").collect()
      .map(x => (x.getLong(0), x.getDouble(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSet
    assert(all === Set((1L, 10.0, -1L), (2L, 20.0, 99L)))
    // and renaming the REUSED name later must not steal the old bytes:
    // rename v -> v2 pins nothing onto the old file (its "v" is owned
    // by id 3's pin), so v2 still reads null there
    PartitionedLake.renameColumn(spark, lake, "v", "v2")
    val m = manifest(lake)
    val withBoth = m.files("part=a").filter(_.physNames == Map(3 -> "v"))
    assert(withBoth.size === 1,
      s"exactly the pre-rename file keeps only id 3's pin: ${m.files}")
    val all2 = PartitionedLake.read(spark, lake)
      .select("k", "w", "v2").collect()
      .map(x => (x.getLong(0), x.getDouble(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSet
    assert(all2 === Set((1L, 10.0, -1L), (2L, 20.0, 99L)))
  }

  test("chained renames and rename-back: every file group resolves through its own pin") {
    val lake = freshLake("chain")
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "v"),
      lake, "part")
    PartitionedLake.renameColumn(spark, lake, "v", "w")
    PartitionedLake.append(Seq((2L, "a", 2.0)).toDF("k", "part", "w"),
      lake, Seq("part"))
    PartitionedLake.renameColumn(spark, lake, "w", "v")
    // three epochs: file 1 pinned v, file 2 pinned w, and a fresh write
    PartitionedLake.append(Seq((3L, "a", 3.0)).toDF("k", "part", "v"),
      lake, Seq("part"))
    assert(PartitionedLake.read(spark, lake).select("k", "v").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet ===
      Set((1L, 1.0), (2L, 2.0), (3L, 3.0)))
    val pins = manifest(lake).files("part=a").map(_.physNames).toSet
    assert(pins === Set(Map(3 -> "v"), Map(3 -> "w"), Map.empty[Int, String]))
  }

  test("refusal matrix: unknown column, taken name, partition column, live MOR deltas, pre-protocol lake") {
    val lake = freshLake("refuse")
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      lake, "part")
    assert(intercept[Exception](PartitionedLake.renameColumn(spark, lake,
      "nope", "x")).getMessage.contains("no such column"))
    assert(intercept[Exception](PartitionedLake.renameColumn(spark, lake,
      "bal", "k")).getMessage.contains("already taken"))
    assert(intercept[Exception](PartitionedLake.renameColumn(spark, lake,
      "part", "part2")).getMessage.contains("partition column"))
    PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
      Seq((1L, "a", 1L, "U", 5.0)).toDF("k", "part", "seq", "op", "val"))
    assert(intercept[Exception](PartitionedLake.renameColumn(spark, lake,
      "bal", "x")).getMessage.contains("merge-on-read"))
    PartitionedLake.compact(spark, lake)
    PartitionedLake.renameColumn(spark, lake, "bal", "x") // now fine
    assert(PartitionedLake.read(spark, lake).select("x").head.getDouble(0)
      === 5.0)
    val legacy = freshLake("refuse-legacy")
    Seq((1L, "a")).toDF("k", "part").write.partitionBy("part")
      .parquet(legacy)
    assert(intercept[Exception](PartitionedLake.renameColumn(spark, legacy,
      "k", "k2")).getMessage.contains("pre-protocol"))
    // addColumns refusals
    assert(intercept[Exception](PartitionedLake.addColumns(spark, lake,
      Seq(StructField("k", LongType)))).getMessage
      .contains("already present"))
    assert(intercept[Exception](PartitionedLake.addColumns(spark, lake,
      Seq(StructField("y", LongType), StructField("y", DoubleType))))
      .getMessage.contains("duplicate"))
  }

  test("SQL surface: ALTER TABLE RENAME COLUMN / ADD COLUMNS route through the manifest commits; unsupported changes refuse loudly") {
    val lake = freshLake("sql")
    useCatalog()
    PartitionedLake.write(Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("k", "part", "bal"), lake, "part")
    spark.sql(s"ALTER TABLE graft_lake.`$lake` RENAME COLUMN bal TO balance")
    assert(spark.sql(s"SELECT sum(balance) FROM graft_lake.`$lake`")
      .head.getDouble(0) === 30.0)
    spark.sql(s"ALTER TABLE graft_lake.`$lake` ADD COLUMNS (note STRING)")
    // old rows surface typed nulls; an insert can carry the new column
    spark.sql(s"INSERT INTO graft_lake.`$lake` VALUES (3, 'a', 5.0, 'hi')")
    val got = spark.sql(s"SELECT k, balance, note FROM graft_lake.`$lake`")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) "<null>" else r.getString(2))).toSet
    assert(got === Set((1L, 10.0, "<null>"), (2L, 20.0, "<null>"),
      (3L, 5.0, "hi")))
    def sqlErr(q: String): String = {
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      messages(intercept[Exception](spark.sql(q))).mkString(" | ")
    }
    // non-promotion type changes refuse through the widening gate's
    // vocabulary (LakeWidenTypeSpec owns the promotion matrix)
    assert(sqlErr(s"ALTER TABLE graft_lake.`$lake` " +
      "ALTER COLUMN balance TYPE STRING")
      .contains("only widening promotions"))
    // DROP COLUMN is supported since round 16 (LakeDropColumnSpec);
    // dropping down to the last data column still refuses through SQL
    spark.sql(s"ALTER TABLE graft_lake.`$lake` DROP COLUMN note")
    spark.sql(s"ALTER TABLE graft_lake.`$lake` DROP COLUMN balance")
    assert(spark.sql(s"SELECT * FROM graft_lake.`$lake`")
      .columns.toSeq === Seq("k", "part"))
    assert(sqlErr(s"ALTER TABLE graft_lake.`$lake` DROP COLUMN k")
      .contains("last data column"))
    assert(sqlErr(s"ALTER TABLE graft_lake.`$lake` " +
      "ADD COLUMNS (early STRING FIRST)").contains("appending only"))
    assert(sqlErr(s"ALTER TABLE graft_lake.`$lake` " +
      "RENAME COLUMN part TO part2").contains("partition column"))
  }

  test("#changes stays consistent across a rename: updates classify as updates with real pre-images, never drop+add null noise") {
    val lake = freshLake("cdf")
    PartitionedLake.write(Seq((1L, "a", 10.0), (2L, "a", 20.0))
      .toDF("k", "part", "bal"), lake, "part")       // v1
    PartitionedLake.renameColumn(spark, lake, "bal", "balance") // v2
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((2L, "a", 25.0)).toDF("k", "part", "balance")) // v3
    val ch = PartitionedLake.changesBetween(spark, lake, 1L, 3L,
      keyCols = Seq("k"))
    val rows = ch.select("k", "balance", "_change_type").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) Double.NaN else r.getDouble(1),
        r.getString(2))).toSet
    assert(rows === Set((2L, 20.0, "update_preimage"),
      (2L, 25.0, "update_postimage")),
      s"rename must not reclassify the feed: $rows")
  }

  test("a data commit racing a rename conflicts loudly instead of resurrecting the old column name") {
    val lake = freshLake("race")
    val fs = fsOf(lake)
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "v"),
      lake, "part")
    val base = PartitionedLake.latestManifest(fs, lake).get
    val df = Seq((2L, "b", 2.0)).toDF("k", "part", "v")
    val (staging, staged) =
      PartitionedLake.stage(spark, fs, lake, df, Seq("part"), Nil)
    // the rename lands between this commit's manifest read and publish
    PartitionedLake.renameColumn(spark, lake, "v", "w")
    val e = intercept[Exception] {
      PartitionedLake.commitStaged(fs, lake, staging, staged,
        staged.keySet, df.schema, Some(base), None)
    }
    assert(e.getMessage.contains("renamed by a racing committer"),
      e.getMessage)
    // the lake is exactly the rename's snapshot (nothing half-applied)
    assert(PartitionedLake.read(spark, lake).columns.toSeq ===
      Seq("k", "part", "w"))
    assert(PartitionedLake.read(spark, lake).count() === 1L)
  }

  test("row-level SQL refuses while pins are live (with compact directions), and works after compact") {
    val lake = freshLake("rowlevel")
    useCatalog()
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "v"),
      lake, "part")
    PartitionedLake.renameColumn(spark, lake, "v", "w")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    val e = intercept[Exception] {
      spark.sql(s"UPDATE graft_lake.`$lake` SET w = 2.0 WHERE k = 1")
    }
    assert(messages(e).exists(_.contains("physical-name pins")),
      e.toString)
    // partition-scoped DELETE stays a metadata retirement regardless
    spark.sql(s"DELETE FROM graft_lake.`$lake` WHERE part = 'zzz'")
    PartitionedLake.compact(spark, lake)
    spark.sql(s"UPDATE graft_lake.`$lake` SET w = 2.0 WHERE k = 1")
    assert(PartitionedLake.read(spark, lake).select("w").head.getDouble(0)
      === 2.0)
  }

  test("readBox file skipping keeps working across a rename: bounds resolve through the pin to the physical stats") {
    val lake = freshLake("stats")
    PartitionedLake.write(Seq((1L, "a", 10.0), (2L, "b", 1000.0))
      .toDF("k", "part", "v"), lake, "part", statsCols = Seq("v"))
    PartitionedLake.renameColumn(spark, lake, "v", "w")
    val hit = PartitionedLake.readBox(spark, lake, Map("w" -> (5.0, 15.0)))
    assert(hit.select("k").collect().map(_.getLong(0)).toSet === Set(1L))
    assert(hit.inputFiles.forall(_.contains("part=a")),
      "stats skipping must survive the rename (bounds live under the " +
        "physical name)")
  }
}
