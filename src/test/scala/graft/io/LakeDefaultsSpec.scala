package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column DEFAULT values on the lake ([[LakeCatalog.capabilities]] +
  * the `CURRENT_DEFAULT`/`EXISTS_DEFAULT` field metadata persisted in
  * the manifest schema):
  *
  *  - `ADD COLUMNS (c T DEFAULT x)` pins BOTH defaults — files
  *    predating the column read `x` (existence default, applied by
  *    Spark's own parquet readers from the schema metadata on every
  *    read path: v1 fast path, pin-group scans, the native DSv2
  *    factory), and INSERTs that omit the column fill `x` (current
  *    default, applied at analysis). Old and new rows agree — the
  *    exact consistency a naive null-padding default would break.
  *  - `ALTER COLUMN ... SET/DROP DEFAULT` rewrites the CURRENT default
  *    only; the existence default stays pinned at its ADD-time value
  *    (changing it would retroactively rewrite old files' visible
  *    history — Delta/Iceberg draw the same line).
  *  - an explicitly-written NULL stays NULL: the existence default
  *    applies to files MISSING the column, never to stored values.
  */
class LakeDefaultsSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def freshLake(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-defaults-$tag")
      .toString + "/lake"

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)

  private def channels(lake: String): Map[Long, String] =
    spark.sql(s"SELECT k, channel FROM graft_lake.`$lake`").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("ADD COLUMNS ... DEFAULT: old files read the default on every path (v1 fast, native DSv2), inserts fill it, explicit NULL stays NULL, time travel predates it") {
    val lake = freshLake("add")
    useCatalog()
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), lake, "part") // v1, pre-column files
    spark.sql(s"ALTER TABLE graft_lake.`$lake` ADD COLUMNS " +
      "(channel STRING DEFAULT 'web')") // v2, manifest-only
    // EXISTENCE default: the pre-column files surface 'web', not null
    assert(channels(lake) === Map(1L -> "web", 2L -> "web"))
    // ...and the DSv2 read serving it is the NATIVE batch, not a
    // fallback (the default rides the factory's read schema metadata)
    val native = spark.sql(
      s"SELECT k, channel FROM graft_lake.`$lake` WHERE part = 'a'")
    assert(LakeScanCheck.nativePruning(native).nonEmpty,
      "expected the native DSv2 batch to serve the defaulted read")
    assert(native.collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq === Seq((1L, "web")))
    // CURRENT default: an INSERT omitting the column fills it; the
    // DEFAULT keyword spells it explicitly; explicit values win
    spark.sql(s"INSERT INTO graft_lake.`$lake` (k, part, bal) " +
      "VALUES (3, 'a', 3.0)")
    spark.sql(s"INSERT INTO graft_lake.`$lake` VALUES " +
      "(4, 'a', 4.0, DEFAULT), (5, 'a', 5.0, 'api')")
    // an explicitly-written NULL is a stored value, NOT a missing
    // column — it must stay NULL under the existence default
    spark.sql(s"INSERT INTO graft_lake.`$lake` VALUES " +
      "(6, 'a', 6.0, NULL)")
    val got = spark.sql(s"SELECT k, channel FROM graft_lake.`$lake`")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got === Map(1L -> "web", 2L -> "web", 3L -> "web",
      4L -> "web", 5L -> "api", 6L -> null))
    // the pre-column SNAPSHOT genuinely predates the column
    assert(!spark.sql(s"SELECT * FROM graft_lake.`$lake` VERSION AS OF 1")
      .columns.contains("channel"))
  }

  test("SET/DROP DEFAULT move the CURRENT default only; the existence default stays pinned; a non-castable default refuses at ALTER time") {
    val lake = freshLake("setdrop")
    useCatalog()
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      lake, "part")
    spark.sql(s"ALTER TABLE graft_lake.`$lake` ADD COLUMNS " +
      "(channel STRING DEFAULT 'web')")
    spark.sql(s"ALTER TABLE graft_lake.`$lake` ALTER COLUMN channel " +
      "SET DEFAULT 'mobile'")
    spark.sql(s"INSERT INTO graft_lake.`$lake` (k, part, bal) " +
      "VALUES (2, 'a', 2.0)")
    // new current default fills new inserts; the PRE-COLUMN row still
    // reads the ADD-time existence default, not the new current one
    assert(channels(lake) === Map(1L -> "web", 2L -> "mobile"))
    spark.sql(s"ALTER TABLE graft_lake.`$lake` ALTER COLUMN channel " +
      "DROP DEFAULT")
    // after DROP the manifest field carries no CURRENT_DEFAULT; the
    // existence default (and stored values) are untouched
    val f = PartitionedLake.snapshotSchema(spark, lake).get("channel")
    assert(!f.metadata.contains("CURRENT_DEFAULT"), f.metadata.json)
    assert(f.metadata.contains("EXISTS_DEFAULT"), f.metadata.json)
    assert(channels(lake) === Map(1L -> "web", 2L -> "mobile"))
    // validation fires at ALTER, not at some later INSERT
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE graft_lake.`$lake` ALTER COLUMN channel " +
        "SET DEFAULT unknown_fn(1)"))
    assert(e.getMessage != null)
  }

  test("CREATE TABLE with a DEFAULT column; defaults survive a rename's pin-group scans and the shadow rule surfaces the default, not null") {
    val lake = freshLake("create")
    useCatalog()
    spark.sql(s"CREATE TABLE graft_lake.`$lake` (day STRING, " +
      "k BIGINT, v DOUBLE DEFAULT 1.5) USING `graft-lake-v2` " +
      "PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO graft_lake.`$lake` (day, k) " +
      "VALUES ('2026-01-01', 1)")
    assert(spark.sql(s"SELECT v FROM graft_lake.`$lake`")
      .head().getDouble(0) === 1.5)
    // rename k -> kk: files now carry physical-name pins, so reads go
    // through the V1 pin-group path — the defaulted column's metadata
    // must ride into those group read schemas too
    spark.sql(s"ALTER TABLE graft_lake.`$lake` RENAME COLUMN k TO kk")
    spark.sql(s"ALTER TABLE graft_lake.`$lake` ADD COLUMNS " +
      "(src STRING DEFAULT 'seed')")
    val row = spark.sql(
      s"SELECT kk, v, src FROM graft_lake.`$lake`").head()
    assert((row.getLong(0), row.getDouble(1), row.getString(2))
      === ((1L, 1.5, "seed")))
    // SHADOW rule + default: rename v -> w, then ADD a NEW column
    // named v with a default — the old file's 'v' bytes belong to w,
    // and the re-added v must surface ITS default, not a typed null
    spark.sql(s"ALTER TABLE graft_lake.`$lake` RENAME COLUMN v TO w")
    spark.sql(s"ALTER TABLE graft_lake.`$lake` ADD COLUMNS " +
      "(v DOUBLE DEFAULT 9.25)")
    val r2 = spark.sql(
      s"SELECT kk, w, v FROM graft_lake.`$lake`").head()
    assert((r2.getLong(0), r2.getDouble(1), r2.getDouble(2))
      === ((1L, 1.5, 9.25)))
  }

  test("API writes omitting a defaulted column agree with SQL inserts: their files physically lack it and read the existence default, MOR post-images included") {
    val lake = freshLake("api")
    useCatalog()
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      lake, "part")
    spark.sql(s"ALTER TABLE graft_lake.`$lake` ADD COLUMNS " +
      "(channel STRING DEFAULT 'web')")
    // API append with the PRE-column row shape: additive evolution
    // keeps the head schema, the new file physically lacks 'channel',
    // and the read surfaces the existence default — the API path and
    // the SQL INSERT (which fills the current default at analysis)
    // agree on what an unspecified column means
    PartitionedLake.append(Seq((2L, "a", 2.0)).toDF("k", "part", "bal"),
      lake, Seq("part"))
    assert(channels(lake) === Map(1L -> "web", 2L -> "web"))
    // merge-on-read: the delta sidecar carries only (identity, value,
    // op) — the post-image's defaulted column comes from the schema
    // metadata at the merged read, not from the sidecar bytes
    PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
      Seq(("a", 2L, 1L, "U", 20.0)).toDF("part", "k", "seq", "op", "val"))
    val merged = spark.sql(
      s"SELECT k, bal, channel FROM graft_lake.`$lake`").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(merged === Set((1L, 1.0, "web"), (2L, 20.0, "web")))
  }
}
