package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Named snapshot tags: `PartitionedLake.tag/dropTag/tags/readTag`,
  * SQL `VERSION AS OF '<name>'`, `CALL system.tag/drop_tag`, the
  * `#tags` metadata table, and the retention contract — a tagged
  * version survives vacuum outside the keepLast window until the tag
  * is dropped.
  */
class LakeTagSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def freshLake(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-tag-$tag")
      .toString + "/lake"

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)

  private def seed(lake: String): Unit =
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), lake, "part")

  private def appendOne(lake: String, k: Long): Unit =
    PartitionedLake.append(
      Seq((k, "a", k.toDouble)).toDF("k", "part", "bal"),
      lake, Seq("part"))

  test("tag lifecycle: create, resolve by SQL and API, idempotent re-pin, immutable against moves, drop, loud unknowns") {
    val lake = freshLake("life")
    seed(lake)
    appendOne(lake, 3L) // v2
    useCatalog()
    PartitionedLake.tag(spark, lake, "baseline", 1L)
    // SQL time travel by name reads the pinned snapshot
    assert(spark.sql(
      s"SELECT count(*) FROM graft_lake.`$lake` VERSION AS OF 'baseline'")
      .head().getLong(0) === 2L)
    assert(PartitionedLake.readTag(spark, lake, "baseline").count() === 2L)
    assert(PartitionedLake.tags(spark, lake) === Seq(("baseline", 1L)))
    // idempotent same-version re-pin; a MOVE refuses with directions
    PartitionedLake.tag(spark, lake, "baseline", 1L)
    val moved = intercept[Exception](
      PartitionedLake.tag(spark, lake, "baseline", 2L))
    assert(moved.getMessage.contains("immutable"))
    // unknown tag in SQL lists both vocabularies
    val unknown = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_lake.`$lake` VERSION AS OF 'nope'").collect())
    assert(unknown.getMessage.contains("baseline->1"))
    // tagging an unresolvable version / a bad name refuses
    assert(intercept[Exception](
      PartitionedLake.tag(spark, lake, "x", 99L))
      .getMessage.contains("not a resolvable snapshot"))
    assert(intercept[Exception](
      PartitionedLake.tag(spark, lake, "bad name!", 1L))
      .getMessage.contains("tag name"))
    // all-digit names refuse: every resolution path tries numeric
    // version first, so tag '2026' would be shadowed by snapshot
    // numbering and VERSION AS OF '2026' would read the wrong data
    assert(intercept[Exception](
      PartitionedLake.tag(spark, lake, "2026", 1L))
      .getMessage.contains("all digits"))
    // drop, then the name is free; dropping the unknown refuses
    PartitionedLake.dropTag(spark, lake, "baseline")
    assert(PartitionedLake.tags(spark, lake).isEmpty)
    assert(intercept[Exception](
      PartitionedLake.dropTag(spark, lake, "baseline"))
      .getMessage.contains("no tag"))
    PartitionedLake.tag(spark, lake, "baseline", 2L) // re-creatable
  }

  test("retention: a tagged version survives vacuum outside keepLast (files AND manifest); drop_tag releases it to the next sweep") {
    val lake = freshLake("vacuum")
    seed(lake) // v1
    PartitionedLake.tag(spark, lake, "pinned", 1L)
    appendOne(lake, 3L) // v2
    appendOne(lake, 4L) // v3
    appendOne(lake, 5L) // v4
    PartitionedLake.vacuum(spark, lake, keepLast = 1)
    // the window keeps v4; the tag keeps v1; v2/v3 are gone — loudly
    assert(PartitionedLake.snapshots(spark, lake) === Seq(1L, 4L))
    assert(PartitionedLake.readTag(spark, lake, "pinned").count() === 2L)
    assert(PartitionedLake.readVersion(spark, lake, 1L).count() === 2L)
    intercept[Exception](
      PartitionedLake.readVersion(spark, lake, 2L).count())
    assert(PartitionedLake.read(spark, lake).count() === 5L)
    // dropping the tag releases the version to the NEXT sweep
    PartitionedLake.dropTag(spark, lake, "pinned")
    PartitionedLake.vacuum(spark, lake, keepLast = 1)
    assert(PartitionedLake.snapshots(spark, lake) === Seq(4L))
    intercept[Exception](
      PartitionedLake.readVersion(spark, lake, 1L).count())
    assert(PartitionedLake.read(spark, lake).count() === 5L)
  }

  test("SQL surface: CALL system.tag (default = current version), #tags metadata table, CALL system.drop_tag, #tags refuses time travel") {
    val lake = freshLake("sql")
    seed(lake) // v1
    appendOne(lake, 3L) // v2
    useCatalog()
    // default version: tag-what-I-see
    val row = spark.sql(
      s"CALL graft_lake.system.tag(table => '$lake', name => 'release')")
      .head()
    assert(row.getLong(1) === 2L && row.getLong(2) === 2L)
    spark.sql(s"CALL graft_lake.system.tag(table => '$lake', " +
      "name => 'first', version => 1)")
    val listed = spark.sql(s"SELECT tag, version FROM graft_lake.`$lake#tags` " +
      "ORDER BY tag").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(listed.toSeq === Seq(("first", 1L), ("release", 2L)))
    assert(spark.sql(
      s"SELECT count(*) FROM graft_lake.`$lake` VERSION AS OF 'first'")
      .head().getLong(0) === 2L)
    spark.sql(
      s"CALL graft_lake.system.drop_tag(table => '$lake', name => 'first')")
    assert(PartitionedLake.tags(spark, lake).map(_._1) === Seq("release"))
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_lake.`$lake#tags` VERSION AS OF 1").collect())
    assert(e.getMessage.contains("#tags"))
  }

  test("DataFrame API parity: versionAsOf options (v1 and DSv2 formats) accept tag names like SQL does") {
    val lake = freshLake("api")
    seed(lake) // v1
    PartitionedLake.tag(spark, lake, "rel", 1L)
    appendOne(lake, 7L) // v2
    assert(spark.read.format("graft-lake")
      .option("versionAsOf", "rel").load(lake).count() === 2L)
    assert(spark.read.format("graft-lake-v2")
      .option("versionAsOf", "rel").option("path", lake).load()
      .count() === 2L)
    val e = intercept[Exception](spark.read.format("graft-lake")
      .option("versionAsOf", "nope").load(lake).count())
    assert(e.getMessage.contains("tags: rel"))
  }

  test("#changes endpoints accept tag names: from=<tag> reads everything since the pinned release") {
    val lake = freshLake("feed")
    seed(lake) // v1
    PartitionedLake.tag(spark, lake, "rel", 1L)
    appendOne(lake, 7L) // v2
    useCatalog()
    val byTag = spark.sql("SELECT k, _change_type FROM graft_lake." +
      s"`$lake#changes?from=rel&to=2&keyCols=part,k` ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byNum = spark.sql("SELECT k, _change_type FROM graft_lake." +
      s"`$lake#changes?from=1&to=2&keyCols=part,k` ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(byTag.toSeq === byNum.toSeq && byTag.nonEmpty)
    // unknown endpoint name lists the tag vocabulary
    val e = intercept[Exception](spark.sql("SELECT * FROM graft_lake." +
      s"`$lake#changes?from=nope&to=2&keyCols=part,k`").collect())
    assert(e.getMessage.contains("tags: rel"))
  }
}
