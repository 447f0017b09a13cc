package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL write surface ([[LakeWriteBuilder]] — `INSERT INTO` /
  * `INSERT OVERWRITE` as a V1Write shim onto the commit protocol) and
  * the [[PartitionedLake.append]] primitive underneath it.
  */
class LakeSqlWriteSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def freshLake(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-sqlw-$tag")
      .toString + "/lake"

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)

  private def rowsOf(lake: String): Set[(String, Long, Double)] =
    PartitionedLake.read(spark, lake).select("part", "k", "bal").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("INSERT INTO appends through the snapshot protocol: SQL insert visible to API read and vice versa, old version intact") {
    val lake = freshLake("insert")
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      lake, "part")
    useCatalog()
    spark.sql(s"INSERT INTO graft_lake.`$lake` VALUES (2, 'a', 2.0), (3, 'b', 3.0)")
    // SQL insert visible to the API read
    assert(rowsOf(lake) ===
      Set(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 3L, 3.0)))
    // the pre-insert snapshot is intact (a new version was published,
    // nothing superseded)
    assert(PartitionedLake.snapshots(spark, lake) === Seq(1L, 2L))
    assert(PartitionedLake.readVersion(spark, lake, 1L).count() === 1L)
    // an API append is visible to the SQL read
    PartitionedLake.append(Seq((4L, "b", 4.0)).toDF("k", "part", "bal"),
      lake, Seq("part"))
    assert(spark.sql(s"SELECT count(*) FROM graft_lake.`$lake`")
      .collect()(0).getLong(0) === 4L)
    // metadata count still exact after appends (footers harvested)
    assert(PartitionedLake.rowCount(spark, lake) === Some(4L))
  }

  test("INSERT OVERWRITE is the full-snapshot overwrite; the old snapshot stays time-travelable") {
    val lake = freshLake("overwrite")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), lake, "part")
    useCatalog()
    spark.sql(s"INSERT OVERWRITE graft_lake.`$lake` VALUES (9, 'c', 9.0)")
    assert(rowsOf(lake) === Set(("c", 9L, 9.0)))
    assert(PartitionedLake.readVersion(spark, lake, 1L).count() === 2L)
    // INSERT INTO ... SELECT shape (the common pipeline form)
    spark.sql(s"INSERT INTO graft_lake.`$lake` " +
      s"SELECT k + 1, part, bal + 0.5 FROM graft_lake.`$lake`")
    assert(rowsOf(lake) === Set(("c", 9L, 9.0), ("c", 10L, 9.5)))
  }

  test("racing SQL-equivalent appends land as two ordered versions with both rows (CommitArbiter seam honored)") {
    val lake = freshLake("race")
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      lake, "part")
    // two appends into the SAME partition from racing threads: appends
    // supersede nothing, so both must rebase cleanly — never conflict
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = (10L to 11L).map { i =>
      new Thread(() => {
        try PartitionedLake.append(
          Seq((i, "a", i.toDouble)).toDF("k", "part", "bal"),
          lake, Seq("part"))
        catch { case t: Throwable => errs.add(t) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, errs.toString)
    assert(rowsOf(lake) ===
      Set(("a", 1L, 1.0), ("a", 10L, 10.0), ("a", 11L, 11.0)))
    assert(PartitionedLake.snapshots(spark, lake) === Seq(1L, 2L, 3L))
  }

  test("refusals: partition-scoped INSERT OVERWRITE, writes to VERSION AS OF, pre-protocol lakes, layout mismatch, type change") {
    val lake = freshLake("refuse")
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      lake, "part")
    useCatalog()
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    // partition-scoped overwrite is a FEATURE since round 16
    // (OVERWRITE_BY_FILTER through the exact-evaluator gate —
    // LakeOverwriteSpec owns the matrix); only the sub-partition
    // predicate shape still refuses, at write planning, with
    // MERGE/upsert directions
    spark.sql(s"INSERT OVERWRITE graft_lake.`$lake` " +
      "PARTITION (part = 'a') VALUES (5, 5.0)")
    assert(rowsOf(lake) === Set(("a", 5L, 5.0)))
    val ps = intercept[Exception] {
      Seq((6L, "a", 6.0)).toDF("k", "part", "bal")
        .writeTo(s"graft_lake.`$lake`").overwrite(col("bal") > 0)
    }
    assert(messages(ps).exists(_.contains("exact evaluator")), ps.toString)
    assert(rowsOf(lake) === Set(("a", 5L, 5.0)))
    // a pre-protocol lake refuses SQL writes with adoption directions
    val legacy = freshLake("refuse-legacy")
    Seq((1L, "a", 1.0)).toDF("k", "part", "bal")
      .write.partitionBy("part").parquet(legacy)
    // (pre-protocol schemas surface partition columns LAST: k, bal, part)
    val pp = intercept[Exception] {
      spark.sql(s"INSERT INTO graft_lake.`$legacy` VALUES (2, 2.0, 'b')")
    }
    assert(messages(pp).exists(_.contains("pre-protocol")), pp.toString)
    // append with a different partition layout refuses
    val lm = intercept[Exception] {
      PartitionedLake.append(Seq((2L, "b", 2.0)).toDF("k", "part", "bal"),
        lake, Seq("bal"))
    }
    assert(lm.getMessage.contains("layout"), lm.getMessage)
    // append with a type change on an existing column refuses
    val tc = intercept[Exception] {
      PartitionedLake.append(
        Seq(("2", "b", 2.0)).toDF("k", "part", "bal"), lake, Seq("part"))
    }
    assert(tc.getMessage.contains("additive"), tc.getMessage)
  }

  test("CREATE TABLE bootstraps an empty insertable lake: declared layout persists in the manifest, reads/inserts/metadata all work from zero") {
    val lake = freshLake("create")
    useCatalog()
    spark.sql(s"CREATE TABLE graft_lake.`$lake` " +
      "(k BIGINT, part STRING, bal DOUBLE) PARTITIONED BY (part)")
    // the created table reads as empty with the declared schema
    val empty = spark.sql(s"SELECT * FROM graft_lake.`$lake`")
    assert(empty.columns.toSeq === Seq("k", "part", "bal"))
    assert(empty.count() === 0L)
    assert(PartitionedLake.snapshots(spark, lake) === Seq(1L))
    // immediately insertable: the layout came from meta:partition-cols
    spark.sql(s"INSERT INTO graft_lake.`$lake` VALUES (1, 'a', 1.0)")
    assert(rowsOf(lake) === Set(("a", 1L, 1.0)))
    // partition-aware from the declaration onward: metadata count +
    // claimed filter work
    val c = spark.sql(
      s"SELECT count(*) FROM graft_lake.`$lake` WHERE part = 'a'")
    assert(LakeScanCheck.isMetadataOnly(c),
      c.queryExecution.executedPlan.toString())
    assert(c.collect()(0).getLong(0) === 1L)
    // creating over an existing lake refuses as already-exists
    val dup = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft_lake.`$lake` " +
        "(k BIGINT, part STRING) PARTITIONED BY (part)")
    }
    assert(dup.getMessage.toUpperCase.contains("ALREADY EXISTS"),
      dup.getMessage)
    // IF NOT EXISTS is honored quietly
    spark.sql(s"CREATE TABLE IF NOT EXISTS graft_lake.`$lake` " +
      "(k BIGINT, part STRING, bal DOUBLE) PARTITIONED BY (part)")
  }

  test("CTAS creates and fills in one statement; DROP TABLE removes the lake; non-identity transforms refuse") {
    val lake = freshLake("ctas")
    useCatalog()
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "part", "bal")
      .createOrReplaceTempView("ctas_src")
    spark.sql(s"CREATE TABLE graft_lake.`$lake` PARTITIONED BY (part) " +
      "AS SELECT k, part, bal FROM ctas_src")
    assert(rowsOf(lake) === Set(("a", 1L, 1.0), ("b", 2L, 2.0)))
    // the CTAS result is a full lake: time travel + history exist
    assert(PartitionedLake.snapshots(spark, lake).nonEmpty)
    // DROP TABLE removes it; the identifier stops resolving
    spark.sql(s"DROP TABLE graft_lake.`$lake`")
    assert(!new java.io.File(lake).exists())
    val gone = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_lake.`$lake`").collect()
    }
    assert(gone.getMessage.toLowerCase.contains("table"), gone.getMessage)
    // a bucket transform refuses with the Hive-layout explanation
    val bucketed = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft_lake.`$lake-b` " +
        "(k BIGINT, part STRING) PARTITIONED BY (bucket(4, k))")
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(bucketed).exists(_.contains("identity")),
      bucketed.toString)
  }

  test("a fully-emptied lake keeps its declared layout: still SQL-insertable after every row is deleted") {
    val lake = freshLake("emptyins")
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      lake, "part")
    PartitionedLake.cdcSink(spark, lake, "part", "k", "bal",
      Seq((1L, "a", 1L, "D", 0.0)).toDF("k", "part", "seq", "op", "val"))
    assert(PartitionedLake.read(spark, lake).count() === 0L)
    // pre-round-14 this lost the layout (no dirs to derive from); the
    // commit-persisted meta:partition-cols keeps the table insertable
    useCatalog()
    spark.sql(s"INSERT INTO graft_lake.`$lake` VALUES (2, 'b', 2.0)")
    assert(rowsOf(lake) === Set(("b", 2L, 2.0)))
  }

  test("guardrails: DROP refuses non-manifest dirs, CREATE refuses unsupported properties, layout mismatches refuse on every writer, empty bootstraps stay insertable") {
    useCatalog()
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    // DROP on a directory this catalog never committed to (pre-protocol
    // read fallback) refuses — a typo'd path must never be recursively
    // deleted by a catalog that could not even have written it
    val plainDir = freshLake("dropplain")
    Seq((1L, "a", 1.0)).toDF("k", "part", "bal")
      .write.partitionBy("part").parquet(plainDir)
    val dp = intercept[Exception] {
      spark.sql(s"DROP TABLE graft_lake.`$plainDir`")
    }
    assert(messages(dp).exists(_.contains("refusing to DROP")), dp.toString)
    assert(new java.io.File(plainDir).exists())
    // CREATE with properties the manifest cannot persist refuses loudly
    val propLake = freshLake("props")
    val tp = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft_lake.`$propLake` " +
        "(k BIGINT, part STRING) PARTITIONED BY (part) " +
        "TBLPROPERTIES ('retention'='30d')")
    }
    assert(messages(tp).exists(_.contains("not supported by LakeCatalog")),
      tp.toString)
    // a mismatched partition layout refuses on UPSERT too (not just
    // append): mixing layouts in one manifest breaks pruning
    val created = freshLake("upsertlayout")
    spark.sql(s"CREATE TABLE graft_lake.`$created` " +
      "(k BIGINT, part STRING, bal DOUBLE) PARTITIONED BY (part)")
    val ul = intercept[Exception] {
      PartitionedLake.upsert(spark, created, "bal", "k",
        Seq((1L, "a", 1.0)).toDF("k", "part", "bal"))
    }
    assert(ul.getMessage.contains("layout"), ul.getMessage)
    // a ZERO-ROW bootstrap still records the declared layout: the
    // manifest's meta:partition-cols comes from the writer's columns,
    // so the lake is insertable from version 1
    val emptyBoot = freshLake("emptyboot")
    PartitionedLake.append(
      Seq.empty[(Long, String, Double)].toDF("k", "part", "bal"),
      emptyBoot, Seq("part"))
    spark.sql(s"INSERT INTO graft_lake.`$emptyBoot` VALUES (1, 'a', 1.0)")
    assert(rowsOf(emptyBoot) === Set(("a", 1L, 1.0)))
  }

  test("adoption-depth mismatches refuse instead of hiding data: too-shallow errors at adoption, too-deep at bootstrap") {
    // physical layout: (day, src) — two levels
    def plant(tag: String): String = {
      val lake = freshLake(tag)
      Seq((1L, "d1", "web", 1.0)).toDF("k", "day", "src", "bal")
        .write.partitionBy("day", "src").parquet(lake)
      lake
    }
    // TOO SHALLOW (depth 1 on a depth-2 layout): the walk reaches
    // day= dirs holding SUBDIRS, not files — publishing that adoption
    // would hide every row from manifest reads and let vacuum destroy
    // them later
    val shallow = intercept[Exception] {
      PartitionedLake.append(Seq((2L, "d2", 2.0)).toDF("k", "day", "bal"),
        plant("shallow"), Seq("day"))
    }
    assert(shallow.getMessage.contains("nested deeper"),
      shallow.getMessage)
    // TOO DEEP (depth 3): nothing adoptable at that depth, but the
    // path holds real data — the bootstrap must refuse, not shadow it
    val deep = intercept[Exception] {
      PartitionedLake.append(
        Seq((2L, "d2", "web", "x", 2.0)).toDF("k", "day", "src", "z", "bal"),
        plant("deep"), Seq("day", "src", "z"))
    }
    assert(deep.getMessage.contains("refusing to bootstrap"),
      deep.getMessage)
    // upsert shares both guards
    val upShallow = intercept[Exception] {
      PartitionedLake.upsert(spark, plant("upshallow"), "day", "k",
        Seq((2L, "d2", 2.0)).toDF("k", "day", "bal"))
    }
    assert(upShallow.getMessage.contains("nested deeper"),
      upShallow.getMessage)
    // the CORRECT depth still adopts and appends fine
    val ok = plant("okdepth")
    PartitionedLake.append(
      Seq((2L, "d2", "app", 2.0)).toDF("k", "day", "src", "bal"),
      ok, Seq("day", "src"))
    assert(PartitionedLake.read(spark, ok).count() === 2L)
  }

  test("DELETE FROM retires wholly-matched partitions through the snapshot protocol; old version stays time-travelable; emptied lake stays insertable") {
    val lake = freshLake("delete")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
      .toDF("k", "part", "bal"), lake, "part")
    useCatalog()
    spark.sql(s"DELETE FROM graft_lake.`$lake` WHERE part = 'a'")
    // SQL delete == the API-built expectation; ONE manifest commit
    assert(rowsOf(lake) === Set(("b", 2L, 2.0)))
    assert(PartitionedLake.snapshots(spark, lake) === Seq(1L, 2L))
    assert(PartitionedLake.readVersion(spark, lake, 1L).count() === 3L)
    // the retirement is metadata-only: files stay on disk for the
    // pinned version until vacuum
    assert(spark.sql(s"SELECT count(*) FROM graft_lake.`$lake` " +
      "VERSION AS OF 1").collect()(0).getLong(0) === 3L)
    // compound claimed predicates (IN over partition values) work; a
    // listed-but-absent value is just unmatched
    spark.sql(s"DELETE FROM graft_lake.`$lake` WHERE part IN ('b', 'zzz')")
    assert(PartitionedLake.read(spark, lake).count() === 0L)
    // a fully-emptied lake keeps its declared layout: still insertable
    spark.sql(s"INSERT INTO graft_lake.`$lake` VALUES (9, 'c', 9.0)")
    assert(rowsOf(lake) === Set(("c", 9L, 9.0)))
    // a zero-match DELETE publishes NOTHING (no empty version churn)
    val before = PartitionedLake.snapshots(spark, lake)
    spark.sql(s"DELETE FROM graft_lake.`$lake` WHERE part = 'nope'")
    assert(PartitionedLake.snapshots(spark, lake) === before)
    // DELETE FROM without WHERE (AlwaysTrue) retires every partition
    spark.sql(s"DELETE FROM graft_lake.`$lake`")
    assert(PartitionedLake.read(spark, lake).count() === 0L)
    // TRUNCATE TABLE rides the same seam (TruncatableTable's default
    // delegates to deleteWhere(AlwaysTrue)) — and the truncated lake
    // keeps its layout, so it stays insertable
    spark.sql(s"INSERT INTO graft_lake.`$lake` VALUES (1, 'a', 1.0)")
    spark.sql(s"TRUNCATE TABLE graft_lake.`$lake`")
    assert(PartitionedLake.read(spark, lake).count() === 0L)
    spark.sql(s"INSERT INTO graft_lake.`$lake` VALUES (2, 'b', 2.0)")
    assert(rowsOf(lake) === Set(("b", 2L, 2.0)))
  }

  test("DELETE FROM retires a partition's merge-on-read deltas along with its files; sub-partition predicates route to the row-level rewrite") {
    val lake = freshLake("delmor")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0),
      (3L, "b", 3.0)).toDF("k", "part", "bal"), lake, "part")
    PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
      Seq((1L, "a", 1L, "U", 7.0)).toDF("k", "part", "seq", "op", "val"))
    useCatalog()
    spark.sql(s"DELETE FROM graft_lake.`$lake` WHERE part = 'a'")
    assert(rowsOf(lake) === Set(("b", 2L, 2.0), ("b", 3L, 3.0)))
    // the delta log went with the partition: the snapshot is clean
    // again (exact metadata count proves no live deltas remain)
    assert(PartitionedLake.rowCount(spark, lake) === Some(2L))
    // a data-column predicate is NOT claimable by the metadata path
    // (canDeleteWhere stays honest) — it routes through the group-based
    // row-level rewrite instead (LakeRowLevelSpec owns that surface)
    spark.sql(s"DELETE FROM graft_lake.`$lake` WHERE k = 2")
    assert(rowsOf(lake) === Set(("b", 3L, 3.0)))
    // mixed partition+data conjunctions ride the same rewrite, with the
    // partition half pruning groups
    spark.sql(s"DELETE FROM graft_lake.`$lake` WHERE part = 'b' AND k = 3")
    assert(rowsOf(lake) === Set.empty)
    // the direct-API seam (partition retirement) still refuses loudly
    // on sub-partition predicates, naming the row-level alternative —
    // API callers without SQL go through cdcSink
    val api = intercept[Exception] {
      new GraftLakeTable(lake, None).deleteWhere(Array(
        org.apache.spark.sql.sources.EqualTo("k", 2L): org.apache.spark.sql.sources.Filter))
    }
    assert(api.getMessage.contains("cdcSink"), api.getMessage)
  }

  test("INSERT INTO / append refuse when live merge-on-read deltas cover a target partition (appended rows would silently vanish)") {
    val lake = freshLake("morins")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), lake, "part")
    PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
      Seq((1L, "a", 1L, "D", 0.0)).toDF("k", "part", "seq", "op", "val"))
    assert(PartitionedLake.read(spark, lake).count() === 1L)
    useCatalog()
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    // the dangerous shape: re-inserting the CDC-deleted key — without
    // the guard this row is anti-joined away by the MOR merge and
    // vanishes from every read until compact()
    val ins = intercept[Exception] {
      spark.sql(s"INSERT INTO graft_lake.`$lake` VALUES (1, 'a', 5.0)")
    }
    assert(messages(ins).exists(_.contains("merge-on-read")), ins.toString)
    // the refused append unlinked its moved files: the lake is intact
    assert(PartitionedLake.read(spark, lake).count() === 1L)
    // appending into a CLEAN partition of the same lake is fine (only
    // delta-bearing directories are dangerous)
    PartitionedLake.append(Seq((3L, "b", 3.0)).toDF("k", "part", "bal"),
      lake, Seq("part"))
    assert(PartitionedLake.read(spark, lake).select("k").collect()
      .map(_.getLong(0)).toSet === Set(2L, 3L))
    // compact() materializes the deltas away; the insert then lands and
    // the re-inserted key is VISIBLE (the exact row loss the guard
    // prevents)
    PartitionedLake.compact(spark, lake)
    spark.sql(s"INSERT INTO graft_lake.`$lake` VALUES (1, 'a', 5.0)")
    assert(PartitionedLake.read(spark, lake).select("k").collect()
      .map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
  }

  test("append evolves additively: new columns widen the snapshot; old rows surface typed nulls on every read route") {
    val lake = freshLake("evolve")
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      lake, "part")
    PartitionedLake.append(
      Seq((2L, "b", 2.0, "x")).toDF("k", "part", "bal", "tag"),
      lake, Seq("part"))
    val api = PartitionedLake.read(spark, lake)
    assert(api.columns.toSeq === Seq("k", "part", "bal", "tag"))
    assert(api.collect().map(r =>
      (r.getLong(0), Option(r.getString(3)))).toSet ===
      Set((1L, None), (2L, Some("x"))))
    useCatalog()
    assert(spark.sql(
      s"SELECT count(*) FROM graft_lake.`$lake` WHERE tag IS NULL")
      .collect()(0).getLong(0) === 1L)
    // append BOOTSTRAPS an absent lake too (same call shape from zero)
    val fresh = freshLake("bootstrap")
    PartitionedLake.append(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      fresh, Seq("part"))
    assert(rowsOf(fresh) === Set(("a", 1L, 1.0)))
    assert(PartitionedLake.snapshots(spark, fresh) === Seq(1L))
  }
}
