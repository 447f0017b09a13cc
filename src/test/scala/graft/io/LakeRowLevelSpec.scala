package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL UPDATE / MERGE INTO / row-level DELETE through the group-based
  * copy-on-write rewrite ([[LakeRowLevelOperation]] +
  * [[LakeReplaceDataWrite]]).
  */
class LakeRowLevelSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def freshLake(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-rlo-$tag")
      .toString + "/lake"

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)

  private def rowsOf(lake: String): Set[(String, Long, Double)] =
    PartitionedLake.read(spark, lake).select("part", "k", "bal").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("UPDATE rewrites only the groups containing matches; other partitions' files stay byte-identical; old version time-travels") {
    val lake = freshLake("update")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "a", 2.0),
      (3L, "b", 3.0), (4L, "c", 4.0)).toDF("k", "part", "bal"),
      lake, "part")
    useCatalog()
    def files(p: String): Set[String] =
      new java.io.File(s"$lake/part=$p").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val bBefore = files("b"); val cBefore = files("c")
    spark.sql(s"UPDATE graft_lake.`$lake` SET bal = bal + 10 WHERE k = 2")
    assert(rowsOf(lake) === Set(("a", 1L, 1.0), ("a", 2L, 12.0),
      ("b", 3L, 3.0), ("c", 4L, 4.0)))
    // untouched partitions were not rewritten (runtime group filtering:
    // only part=a contains a k=2 row)
    assert(files("b") === bBefore, "part=b was rewritten")
    assert(files("c") === cBefore, "part=c was rewritten")
    // the pre-update snapshot is one time travel away
    assert(PartitionedLake.snapshots(spark, lake) === Seq(1L, 2L))
    assert(PartitionedLake.readVersion(spark, lake, 1L)
      .filter(col("k") === 2L).select("bal").head().getDouble(0) === 2.0)
  }

  test("row-level DELETE (sub-partition predicate) rewrites matched groups; partition DELETE stays a metadata-only retirement") {
    val lake = freshLake("rldelete")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "a", 2.0),
      (3L, "b", 3.0)).toDF("k", "part", "bal"), lake, "part")
    useCatalog()
    // sub-partition: previously refused, now a group rewrite
    spark.sql(s"DELETE FROM graft_lake.`$lake` WHERE k = 1")
    assert(rowsOf(lake) === Set(("a", 2L, 2.0), ("b", 3L, 3.0)))
    // partition predicate: METADATA retirement — no new data files may
    // appear anywhere (the new manifest references a subset)
    val filesBefore = PartitionedLake.read(spark, lake).inputFiles.toSet
    spark.sql(s"DELETE FROM graft_lake.`$lake` WHERE part = 'b'")
    assert(rowsOf(lake) === Set(("a", 2L, 2.0)))
    val filesAfter = PartitionedLake.read(spark, lake).inputFiles.toSet
    assert(filesAfter.subsetOf(filesBefore),
      "partition DELETE must not write data files")
  }

  test("MERGE INTO: matched update + not-matched insert into an unscanned existing partition AND a brand-new partition") {
    val lake = freshLake("merge")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), lake, "part")
    useCatalog()
    Seq((1L, "a", 100.0),  // matches k=1 -> update
        (5L, "b", 5.0),    // no match; lands in existing part=b
        (9L, "z", 9.0))    // no match; brand-new partition z
      .toDF("k", "part", "bal").createOrReplaceTempView("merge_src")
    spark.sql(
      s"""MERGE INTO graft_lake.`$lake` t
         |USING merge_src s
         |ON t.k = s.k AND t.part = s.part
         |WHEN MATCHED THEN UPDATE SET bal = s.bal
         |WHEN NOT MATCHED THEN INSERT (k, part, bal) VALUES (s.k, s.part, s.bal)
         |""".stripMargin)
    assert(rowsOf(lake) === Set(("a", 1L, 100.0), ("b", 2L, 2.0),
      ("b", 5L, 5.0), ("z", 9L, 9.0)))
    // one commit; the pre-merge snapshot survives
    assert(PartitionedLake.snapshots(spark, lake) === Seq(1L, 2L))
    assert(PartitionedLake.readVersion(spark, lake, 1L).count() === 2L)
  }

  test("MERGE with NOT MATCHED BY SOURCE DELETE; deleting every row of a group retires the group; layout survives an emptied lake") {
    val lake = freshLake("mergenmbs")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), lake, "part")
    useCatalog()
    Seq((1L, "a", 50.0)).toDF("k", "part", "bal")
      .createOrReplaceTempView("nmbs_src")
    // rows absent from the source are deleted: part=b empties entirely
    spark.sql(
      s"""MERGE INTO graft_lake.`$lake` t
         |USING nmbs_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET bal = s.bal
         |WHEN NOT MATCHED BY SOURCE THEN DELETE
         |""".stripMargin)
    assert(rowsOf(lake) === Set(("a", 1L, 50.0)))
    // the emptied group is GONE from the manifest (not a zero-row husk)
    assert(PartitionedLake.partitionRowCounts(spark, lake)
      === Some(Map("part=a" -> 1L)))
    // row-level DELETE of everything keeps the lake insertable
    spark.sql(s"DELETE FROM graft_lake.`$lake` WHERE k >= 0")
    assert(PartitionedLake.read(spark, lake).count() === 0L)
    spark.sql(s"INSERT INTO graft_lake.`$lake` VALUES (7, 'n', 7.0)")
    assert(rowsOf(lake) === Set(("n", 7L, 7.0)))
  }

  test("row-level statements work MID-INGEST on a MOR snapshot: post-merge semantics, replaced groups' deltas superseded, over-cap deltas refuse with compact() directions") {
    val lake = freshLake("morupd")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0),
      (9L, "b", 0.5)).toDF("k", "part", "bal"), lake, "part")
    // live deltas: k=1 updated to 10.0, k=9 updated to 9.0, and a
    // delete-delta for k=2 — merged view (a,1,10.0),(b,9,9.0)
    PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
      Seq((1L, "a", 1L, "U", 10.0), (9L, "b", 2L, "U", 9.0),
        (2L, "b", 3L, "D", 0.0)).toDF("k", "part", "seq", "op", "val"))
    useCatalog()
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    // an INSERT-ONLY merge compiles to a plain append (the engine's
    // insert-only-merge optimization never builds a row-level plan),
    // so it still hits the MOR-append guard — the appended row would
    // be anti-joined away by part=b's live delete-delta
    Seq((2L, "b", 5.0)).toDF("k", "part", "bal")
      .createOrReplaceTempView("mergemor_src")
    val io = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO graft_lake.`$lake` t
           |USING mergemor_src s
           |ON t.k = s.k AND t.part = s.part
           |WHEN NOT MATCHED THEN INSERT (k, part, bal) VALUES (s.k, s.part, s.bal)
           |""".stripMargin)
    }
    assert(messages(io).exists(_.contains("live merge-on-read")),
      io.toString)
    // a row-level MERGE whose not-matched insert targets a dirty group
    // with NO matched rows shares that refusal: runtime group filtering
    // prunes the matchless group, so the insert is a merge-append into
    // a live-delta directory — the exact unsafe shape
    val nm = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO graft_lake.`$lake` t
           |USING mergemor_src s
           |ON t.k = s.k AND t.part = s.part
           |WHEN MATCHED THEN UPDATE SET bal = s.bal
           |WHEN NOT MATCHED THEN INSERT (k, part, bal) VALUES (s.k, s.part, s.bal)
           |""".stripMargin)
    }
    assert(messages(nm).exists(_.contains("live merge-on-read")),
      nm.toString)
    assert(rowsOf(lake) === Set(("a", 1L, 10.0), ("b", 9L, 9.0)))
    // the realistic CDC-upsert batch — the source MATCHES a post-merge
    // row of the dirty group, so the group is kept, its POST-MERGE rows
    // carried, the CDC-deleted key's re-insert lands in the rewrite,
    // and the commit supersedes the group's deltas (round 15 had to
    // refuse every row-level statement here; the native sidecar merge
    // makes them correct). part=a stays dirty and untouched.
    Seq((9L, "b", 90.0), (2L, "b", 5.0)).toDF("k", "part", "bal")
      .createOrReplaceTempView("mergemor_batch")
    spark.sql(
      s"""MERGE INTO graft_lake.`$lake` t
         |USING mergemor_batch s
         |ON t.k = s.k AND t.part = s.part
         |WHEN MATCHED THEN UPDATE SET bal = s.bal
         |WHEN NOT MATCHED THEN INSERT (k, part, bal) VALUES (s.k, s.part, s.bal)
         |""".stripMargin)
    assert(rowsOf(lake) === Set(("a", 1L, 10.0), ("b", 9L, 90.0),
      ("b", 2L, 5.0)))
    // UPDATE over a non-partition predicate: the matching-groups
    // subquery runs over the POST-MERGE view (part=a matches through
    // its live 'U' post-image), the group rewrite supersedes part=a's
    // surviving delta, and the lake ends fully clean (metadata row
    // counts are only possible with zero live deltas — in-band proof)
    spark.sql(s"UPDATE graft_lake.`$lake` SET bal = bal + 100 " +
      "WHERE bal >= 9")
    assert(rowsOf(lake) === Set(("a", 1L, 110.0), ("b", 9L, 190.0),
      ("b", 2L, 5.0)))
    assert(PartitionedLake.partitionRowCounts(spark, lake).isDefined,
      "the rewrite must supersede every replaced group's deltas")
    // the pre-MERGE dirty snapshot still time-travels through the MOR
    // merge (version 2 = the cdc fold)
    assert(PartitionedLake.readVersion(spark, lake, 2L)
      .select("part", "k", "bal").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet ===
      Set(("a", 1L, 10.0), ("b", 9L, 9.0)))
    // over-cap sidecars refuse with compact() directions (the native
    // merge's memory bound stays honest); partition DELETE is a
    // metadata retirement regardless — deltas retire with their dir
    val lake2 = freshLake("morcap")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), lake2, "part")
    PartitionedLake.cdcSinkMergeOnRead(spark, lake2, "part", "k", "bal",
      Seq((1L, "a", 1L, "U", 10.0)).toDF("k", "part", "seq", "op", "val"))
    spark.conf.set(
      "spark.graft.lake.mor.nativeMaxDeltaBytesPerDir", "1")
    try {
      val up = intercept[Exception] {
        spark.sql(s"UPDATE graft_lake.`$lake2` SET bal = 0 WHERE k = 1")
      }
      assert(messages(up).exists(_.contains("compact")), up.toString)
      assert(rowsOf(lake2) === Set(("a", 1L, 10.0), ("b", 2L, 2.0)))
      spark.sql(s"DELETE FROM graft_lake.`$lake2` WHERE part = 'a'")
      assert(rowsOf(lake2) === Set(("b", 2L, 2.0)))
    } finally spark.conf.unset(
      "spark.graft.lake.mor.nativeMaxDeltaBytesPerDir")
    // compact() then lands the formerly-refused statement
    PartitionedLake.compact(spark, lake2)
    spark.sql(s"UPDATE graft_lake.`$lake2` SET bal = bal + 100 " +
      "WHERE k = 2")
    assert(rowsOf(lake2) === Set(("b", 2L, 102.0)))
  }

  test("UPDATE with a partition-only predicate prunes groups statically; null partitions and multi-level layouts rewrite exactly") {
    // single-level with a null partition value
    val lake = freshLake("nullpart")
    PartitionedLake.write(Seq((1L, Some("a"), 1.0), (2L, None, 2.0))
      .toDF("k", "part", "bal"), lake, "part")
    useCatalog()
    spark.sql(s"UPDATE graft_lake.`$lake` SET bal = 20 WHERE part IS NULL")
    val got = PartitionedLake.read(spark, lake).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSet
    assert(got === Set((1L, Some("a"), 1.0), (2L, None, 20.0)))
    // multi-level (day, src): leaf-exact rewrite
    val lake2 = freshLake("multilevel")
    PartitionedLake.write(
      Seq((1L, "d1", "web", 1.0), (2L, "d1", "app", 2.0),
        (3L, "d2", "web", 3.0)).toDF("k", "day", "src", "bal"),
      lake2, Seq("day", "src"), Nil)
    spark.sql(s"UPDATE graft_lake.`$lake2` SET bal = bal * 2 " +
      "WHERE day = 'd1' AND src = 'app'")
    val got2 = PartitionedLake.read(spark, lake2)
      .select("k", "bal").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got2 === Set((1L, 1.0), (2L, 4.0), (3L, 3.0)))
  }

  test("UPDATE of a partition COLUMN migrates rows between directories: source group rewritten, destination merge-appended, nulls included") {
    val lake = freshLake("migrate")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "a", 2.0),
      (3L, "b", 3.0)).toDF("k", "part", "bal"), lake, "part")
    useCatalog()
    // k=1 moves a -> b: part=a is scanned (match) and rewritten to its
    // remaining row; the migrated row lands in part=b, which the scan
    // never read — the merge-append half of the ReplaceData commit
    spark.sql(s"UPDATE graft_lake.`$lake` SET part = 'b' WHERE k = 1")
    assert(rowsOf(lake) === Set(("b", 1L, 1.0), ("a", 2L, 2.0),
      ("b", 3L, 3.0)))
    // exact per-directory accounting after the migration
    assert(PartitionedLake.partitionRowCounts(spark, lake) ===
      Some(Map("part=a" -> 1L, "part=b" -> 2L)))
    // migrating INTO the null partition round-trips through
    // __HIVE_DEFAULT_PARTITION__
    spark.sql(s"UPDATE graft_lake.`$lake` SET part = NULL WHERE k = 2")
    val got = PartitionedLake.read(spark, lake).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got === Set((1L, Some("b")), (2L, None), (3L, Some("b"))))
    // and back out of it (the null GROUP is scanned via the null-safe
    // runtime filter and emptied by the migration)
    spark.sql(s"UPDATE graft_lake.`$lake` SET part = 'a' " +
      "WHERE part IS NULL")
    assert(rowsOf(lake) === Set(("b", 1L, 1.0), ("a", 2L, 2.0),
      ("b", 3L, 3.0)))
    assert(PartitionedLake.partitionRowCounts(spark, lake) ===
      Some(Map("part=a" -> 1L, "part=b" -> 2L)),
      "the emptied null directory must be retired, not left as a husk")
  }

  test("ReplaceData commits race like every other writer: disjoint commits rebase onto the new head, overlapping ones conflict loudly") {
    val lake = freshLake("race")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), lake, "part")
    val v1 = PartitionedLake.manifestAt(spark, lake, None).get
    // a racing append lands on part=b AFTER this rewrite resolved v1;
    // the rewrite replaces only part=a (staged empty = "delete the
    // group"), disjoint from the change — it must rebase onto the new
    // head, keeping BOTH of b's rows
    PartitionedLake.append(Seq((3L, "b", 3.0)).toDF("k", "part", "bal"),
      lake, Seq("part"))
    PartitionedLake.commitReplaceData(spark, lake,
      new org.apache.hadoop.fs.Path(lake, "_staging/race-a"),
      Map.empty, Set("part=a"), v1)
    assert(rowsOf(lake) === Set(("b", 2L, 2.0), ("b", 3L, 3.0)))
    // overlapping: a racing upsert touches part=b after THIS manifest
    // was resolved; a rewrite that read (and would replace) part=b must
    // conflict loudly, leaving the winner's snapshot intact
    val head = PartitionedLake.manifestAt(spark, lake, None).get
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((2L, "b", 20.0)).toDF("k", "part", "bal"))
    val e = intercept[Exception] {
      PartitionedLake.commitReplaceData(spark, lake,
        new org.apache.hadoop.fs.Path(lake, "_staging/race-b"),
        Map.empty, Set("part=b"), head)
    }
    assert(e.getMessage.contains("concurrent commit conflict"),
      e.getMessage)
    assert(rowsOf(lake) === Set(("b", 2L, 20.0), ("b", 3L, 3.0)))
  }

  test("ReplaceData racing a cdcSinkMergeOnRead: deltas landing on a NOT-MATCHED insert target refuse (the insert would be anti-joined away); deltas on a replaced group conflict loudly") {
    val lake = freshLake("race-mor")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), lake, "part")
    val v1 = PartitionedLake.manifestAt(spark, lake, None).get
    // stage what a MERGE would: a rewrite of part=a (the matched group)
    // plus a NOT-MATCHED insert into part=b, both resolved against v1
    def stage(tag: String, dir: String, df: org.apache.spark.sql.DataFrame)
        : (org.apache.hadoop.fs.Path, Map[String, Seq[PartitionedLake.FileEntry]]) = {
      val tmp = java.nio.file.Files.createTempDirectory("rlo-stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val destDir = new java.io.File(s"$lake/_staging/$tag/$dir")
      destDir.mkdirs()
      assert(f.renameTo(new java.io.File(destDir, f.getName)))
      (new org.apache.hadoop.fs.Path(lake, s"_staging/$tag"),
        Map(dir -> Seq(PartitionedLake.FileEntry(f.getName))))
    }
    val (stg1a, a1) = stage("race-mor-1", "part=a",
      Seq((1L, 11.0)).toDF("k", "bal"))
    val (_, b1) = stage("race-mor-1", "part=b",
      Seq((7L, 7.0)).toDF("k", "bal"))
    // THE RACE: a CDC sink lands live deltas on part=b between the
    // merge's scan (pinned at v1) and its commit. The inserted k=7 row
    // would be anti-joined against part=b's delta keys on every read —
    // the exact silent-row-loss the append guard exists for, arriving
    // through the ReplaceData door. The rebase-loop dirty check must
    // refuse, not rebase.
    PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
      Seq((2L, "b", 1L, "U", 20.0)).toDF("k", "part", "seq", "op", "val"))
    val e1 = intercept[Exception] {
      PartitionedLake.commitReplaceData(spark, lake, stg1a, a1 ++ b1,
        Set("part=a"), v1)
    }
    assert(e1.getMessage.contains("live merge-on-read"), e1.getMessage)
    // the loser unlinked its files and the CDC winner's snapshot reads
    // intact (delta-merged view; part=a untouched)
    assert(rowsOf(lake) === Set(("a", 1L, 1.0), ("b", 2L, 20.0)))
    // complementary branch: deltas landing on the REPLACED group after
    // resolution. Superseding them wholesale would silently drop the
    // racer's ops (our carried rows predate them) — dirSig counts delta
    // changes, so the standard rebase check conflicts loudly instead.
    val head = PartitionedLake.manifestAt(spark, lake, None).get
    val (stg2, a2) = stage("race-mor-2", "part=a",
      Seq((1L, 11.0)).toDF("k", "bal"))
    PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
      Seq((1L, "a", 2L, "U", 100.0)).toDF("k", "part", "seq", "op", "val"))
    val e2 = intercept[Exception] {
      PartitionedLake.commitReplaceData(spark, lake, stg2, a2,
        Set("part=a"), head)
    }
    assert(e2.getMessage.contains("concurrent commit conflict") &&
      e2.getMessage.contains("part=a"), e2.getMessage)
    assert(rowsOf(lake) === Set(("a", 1L, 100.0), ("b", 2L, 20.0)))
  }

  test("refusals: row-level statements against VERSION AS OF and pre-protocol lakes fail at analysis with directions") {
    val lake = freshLake("refuse")
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      lake, "part")
    useCatalog()
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    // a pre-protocol lake refuses with adoption directions
    val legacy = freshLake("refuse-legacy")
    Seq((1L, "a", 1.0)).toDF("k", "part", "bal")
      .write.partitionBy("part").parquet(legacy)
    val pp = intercept[Exception] {
      spark.sql(s"UPDATE graft_lake.`$legacy` SET bal = 2.0 WHERE k = 1")
    }
    assert(messages(pp).exists(_.contains("pre-protocol")), pp.toString)
  }

  test("UPDATE re-harvests footer bounds for the columns the replaced snapshot carried stats for (file skipping survives the rewrite)") {
    val lake = freshLake("statskeep")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "a", 2.0),
      (3L, "b", 30.0)).toDF("k", "part", "bal"), lake, "part",
      statsCols = Seq("bal"))
    useCatalog()
    spark.sql(s"UPDATE graft_lake.`$lake` SET bal = bal + 100 WHERE k = 2")
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = PartitionedLake.latestManifest(fs, lake).get
    // the rewritten partition's fresh entries carry bal bounds covering
    // the post-update values — NOT stats = empty (which would silently
    // degrade q157/readBox skipping there until a compact)
    val a = m.files("part=a")
    assert(a.nonEmpty && a.forall(_.stats.contains("bal")),
      s"rewritten entries lost their bal bounds: $a")
    // the UNION of the fresh per-file bounds covers the post-update
    // values (the rewrite may emit several files per partition)
    val bounds = a.map(_.stats("bal"))
    assert(bounds.map(_._1).min <= 1.0 && bounds.map(_._2).max >= 102.0,
      s"bounds do not cover the rewritten values: $a")
    // and skipping still works: a box query over the untouched range
    // must not open the rewritten partition's files
    val hit = PartitionedLake.readBox(spark, lake, Map("bal" -> (25.0, 35.0)))
    assert(hit.select("k").collect().map(_.getLong(0)).toSet === Set(3L))
    assert(hit.inputFiles.forall(_.contains("part=b")),
      "readBox opened files the bounds should have skipped")
  }
}
