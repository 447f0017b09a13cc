package graft

import graft.io.PartitionedLake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The lake's incremental-read story: changesBetween / readChangesStream
  * (manifest-diff change-data-feed) and the invariants that make it
  * trustworthy — minimal I/O (untouched partitions never opened),
  * compaction invisibility, and stream==batch reconstruction.
  */
class LakeCdfSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def collectChanges(df: DataFrame): Set[(Long, String, String, String)] =
    df.collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("part"),
      r.getAs[String]("v"), r.getAs[String]("_change_type"))).toSet

  test("changesBetween classifies inserts/updates/deletes and never opens untouched partitions") {
    val path = java.nio.file.Files.createTempDirectory("graft-cdf1").toString + "/lake"
    PartitionedLake.write(Seq(
      (1L, "p1", "a"), (2L, "p1", "b"), (3L, "p2", "c"), (4L, "p3", "d"))
      .toDF("k", "part", "v"), path, "part")
    // v2: update k=1, insert k=5 (both p1); delete k=3 (empties p2); p3 untouched
    PartitionedLake.upsert(spark, path, "part", "k",
      Seq((1L, "p1", "a2"), (5L, "p1", "e")).toDF("k", "part", "v"))
    PartitionedLake.cdcSink(spark, path, "part", "k", "v",
      Seq((3L, "p2", 10L, "D", "")).toDF("k", "part", "seq", "op", "val"))
    val v12 = PartitionedLake.changesBetween(spark, path, 1L, 2L, Seq("part", "k"))
    assert(collectChanges(v12) === Set(
      (1L, "p1", "a", "update_preimage"), (1L, "p1", "a2", "update_postimage"),
      (5L, "p1", "e", "insert")))
    // the untouched partitions' files are never opened — the whole point
    // of computing the diff from manifest file lists
    assert(v12.inputFiles.forall(_.contains("/part=p1/")), v12.inputFiles.toSeq)
    val v23 = PartitionedLake.changesBetween(spark, path, 2L, 3L, Seq("part", "k"))
    assert(collectChanges(v23) === Set((3L, "p2", "c", "delete")))
    assert(v23.inputFiles.forall(_.contains("/part=p2/")), v23.inputFiles.toSeq)
    // transitive diff collapses intermediate churn to the net change
    val v13 = PartitionedLake.changesBetween(spark, path, 1L, 3L, Seq("part", "k"))
    assert(collectChanges(v13) === Set(
      (1L, "p1", "a", "update_preimage"), (1L, "p1", "a2", "update_postimage"),
      (5L, "p1", "e", "insert"), (3L, "p2", "c", "delete")))
  }

  test("a compaction commit yields ZERO logical changes") {
    val path = java.nio.file.Files.createTempDirectory("graft-cdf2").toString + "/lake"
    PartitionedLake.write(Seq((1L, "p1", "a"), (2L, "p2", "b"))
      .toDF("k", "part", "v"), path, "part")
    PartitionedLake.upsert(spark, path, "part", "k",
      Seq((3L, "p1", "c"), (4L, "p1", "d")).toDF("k", "part", "v")
        .repartition(2))
    PartitionedLake.compact(spark, path)
    val vs = PartitionedLake.snapshots(spark, path)
    assert(vs.size === 3) // write, upsert, compact
    assert(PartitionedLake.changesBetween(spark, path, vs(1), vs(2),
      Seq("part", "k")).count() === 0)
  }

  test("changesBetween matches the q132-style full-snapshot diff on every consecutive pair") {
    val path = java.nio.file.Files.createTempDirectory("graft-cdf3").toString + "/lake"
    val rnd = new scala.util.Random(23)
    val partPool = Seq("p0", "p1", "p=2")
    PartitionedLake.write(Seq((0L, "p0", 1.0), (1L, "p1", 2.0))
      .toDF("k", "part", "bal"), path, "part")
    var seq = 0L
    for (_ <- 1 to 6) {
      if (rnd.nextBoolean()) {
        val rows = Seq.fill(1 + rnd.nextInt(3))((
          partPool(rnd.nextInt(partPool.size)), rnd.nextInt(6).toLong,
          math.floor(rnd.nextDouble() * 100))).distinctBy(r => (r._1, r._2))
        PartitionedLake.upsert(spark, path, "part", "k",
          rows.map(r => (r._2, r._1, r._3)).toDF("k", "part", "bal"))
      } else {
        val ops = Seq.fill(1 + rnd.nextInt(3)) {
          seq += 1
          (rnd.nextInt(6).toLong, partPool(rnd.nextInt(partPool.size)),
            seq, if (rnd.nextBoolean()) "D" else "U",
            math.floor(rnd.nextDouble() * 100))
        }
        PartitionedLake.cdcSink(spark, path, "part", "k", "bal",
          ops.toDF("k", "part", "seq", "op", "val"))
      }
    }
    val vs = PartitionedLake.snapshots(spark, path)
    vs.zip(vs.tail).foreach { case (a, b) =>
      def snap(v: Long): Map[(String, Long), Double] =
        PartitionedLake.readVersion(spark, path, v).collect()
          .map(r => (r.getAs[String]("part"), r.getAs[Long]("k")) ->
            r.getAs[Double]("bal")).toMap
      val sa = snap(a); val sb = snap(b)
      // the q132-style oracle: classify every identity across the two
      // full snapshots
      val expected =
        sb.keySet.diff(sa.keySet).map(id => (id, sb(id), "insert")) ++
        sa.keySet.diff(sb.keySet).map(id => (id, sa(id), "delete")) ++
        sa.keySet.intersect(sb.keySet).filter(id => sa(id) != sb(id))
          .flatMap(id => Seq((id, sa(id), "update_preimage"),
            (id, sb(id), "update_postimage")))
      val got = PartitionedLake.changesBetween(spark, path, a, b,
        Seq("part", "k")).collect()
        .map(r => ((r.getAs[String]("part"), r.getAs[Long]("k")),
          r.getAs[Double]("bal"), r.getAs[String]("_change_type"))).toSet
      assert(got === expected, s"diff v$a -> v$b diverged")
    }
  }

  test("changesBetween on a multi-level (day, src) lake: nested dirs classify correctly, untouched leaves unopened") {
    val path = java.nio.file.Files.createTempDirectory("graft-cdf-ml").toString + "/lake"
    PartitionedLake.write(Seq(
      (1L, "d1", "web", 10.0), (2L, "d1", "app", 20.0),
      (3L, "d2", "web", 30.0))
      .toDF("k", "day", "src", "bal"), path, Seq("day", "src"), Nil)
    // touch exactly the (d1, web) leaf: update k=1, insert k=4; delete
    // empties (d2, web); (d1, app) untouched
    PartitionedLake.upsert(spark, path, Seq("day", "src"), "k",
      Seq((1L, "d1", "web", 11.0), (4L, "d1", "web", 40.0))
        .toDF("k", "day", "src", "bal"), Nil, None,
      PartitionedLake.DefaultWriter)
    PartitionedLake.cdcSink(spark, path, Seq("day", "src"), "k", "bal",
      Seq((3L, "d2", "web", 1L, "D", 0.0))
        .toDF("k", "day", "src", "seq", "op", "val"), None,
      PartitionedLake.DefaultWriter)
    val ch = PartitionedLake.changesBetween(spark, path, 1L, 3L,
      Seq("day", "src", "k"))
    val got = ch.collect().map(r => (r.getAs[Long]("k"),
      r.getAs[String]("day"), r.getAs[String]("src"),
      r.getAs[Double]("bal"), r.getAs[String]("_change_type"))).toSet
    assert(got === Set(
      (1L, "d1", "web", 10.0, "update_preimage"),
      (1L, "d1", "web", 11.0, "update_postimage"),
      (4L, "d1", "web", 40.0, "insert"),
      (3L, "d2", "web", 30.0, "delete")))
    // the untouched (d1, app) leaf's files are never opened
    assert(ch.inputFiles.forall(f => f.contains("/day=d1/src=web/") ||
      f.contains("/day=d2/src=web/")), ch.inputFiles.toSeq)
  }

  test("readChangesStream: replaying the feed onto the first snapshot reconstructs the latest; cursor advances") {
    val path = java.nio.file.Files.createTempDirectory("graft-cdf4").toString + "/lake"
    PartitionedLake.write(Seq((1L, "p1", 10.0), (2L, "p2", 20.0))
      .toDF("k", "part", "bal"), path, "part")
    PartitionedLake.upsert(spark, path, "part", "k",
      Seq((1L, "p1", 11.0), (3L, "p2", 30.0)).toDF("k", "part", "bal"))
    PartitionedLake.cdcSink(spark, path, "part", "k", "bal",
      Seq((2L, "p2", 1L, "D", 0.0)).toDF("k", "part", "seq", "op", "val"))
    PartitionedLake.compact(spark, path)
    // a downstream consumer materializes the feed into a map
    var state = scala.collection.mutable.Map[(String, Long), Double]()
    var batches = 0
    val cursor = PartitionedLake.readChangesStream(spark, path,
      Seq("part", "k"), 0L) { (changes, _, _) =>
      batches += 1
      changes.collect().foreach { r =>
        val id = (r.getAs[String]("part"), r.getAs[Long]("k"))
        r.getAs[String]("_change_type") match {
          case "insert" | "update_postimage" => state(id) = r.getAs[Double]("bal")
          case "delete" => state.remove(id)
          case "update_preimage" => () // pre-images are informational
        }
      }
    }
    assert(cursor === PartitionedLake.snapshots(spark, path).max)
    // one feed batch per published version: the v1 bootstrap plus a diff
    // per later commit (a compaction version feeds an EMPTY diff)
    assert(batches === PartitionedLake.snapshots(spark, path).size)
    val latest = PartitionedLake.read(spark, path).collect()
      .map(r => (r.getAs[String]("part"), r.getAs[Long]("k")) ->
        r.getAs[Double]("bal")).toMap
    assert(state.toMap === latest)
    // a second poll from the returned cursor feeds nothing new
    assert(PartitionedLake.readChangesStream(spark, path, Seq("part", "k"),
      cursor)((_, _, _) => fail("no new versions expected")) === cursor)
  }

  test("schema evolution across the feed: pre-images surface since-added columns as null") {
    val path = java.nio.file.Files.createTempDirectory("graft-cdf5").toString + "/lake"
    PartitionedLake.write(Seq((1L, "p1", "a")).toDF("k", "part", "v"),
      path, "part")
    PartitionedLake.upsert(spark, path, "part", "k",
      Seq((1L, "p1", "a2", "note-1")).toDF("k", "part", "v", "note"))
    val changes = PartitionedLake.changesBetween(spark, path, 1L, 2L,
      Seq("part", "k")).collect()
      .map(r => (r.getAs[String]("_change_type"), r.getAs[String]("v"),
        r.getAs[String]("note"))).toSet
    assert(changes === Set(("update_preimage", "a", null),
      ("update_postimage", "a2", "note-1")))
  }

  test("a suspected column RENAME refuses loudly; the explicit-null escape hatch and plain additive evolution still pass") {
    import org.apache.spark.sql.functions.{col, lit}
    val path = java.nio.file.Files.createTempDirectory("graft-rename")
      .toString + "/lake"
    PartitionedLake.write(Seq((1L, "p1", "a")).toDF("k", "part", "v"),
      path, "part")
    // a delta that renamed v -> val_renamed (omits v, adds a same-typed
    // column): without column-ID mapping this would silently become
    // drop+add across snapshots — it must throw, naming both columns
    val e = intercept[Exception] {
      PartitionedLake.upsert(spark, path, "part", "k",
        Seq((1L, "p1", "a2")).toDF("k", "part", "val_renamed"))
    }
    assert(e.getMessage.contains("rename") &&
      e.getMessage.contains("'v' -> 'val_renamed'"), e.getMessage)
    // nothing committed: the lake is still at version 1, data intact
    assert(PartitionedLake.snapshots(spark, path) === Seq(1L))
    assert(PartitionedLake.read(spark, path).count() === 1L)
    // the escape hatch: carrying the omitted column as explicit typed
    // nulls states "same column, no values" and commits fine
    PartitionedLake.upsert(spark, path, "part", "k",
      Seq((2L, "p1", "b")).toDF("k", "part", "val_renamed")
        .withColumn("v", lit(null).cast("string")))
    assert(PartitionedLake.read(spark, path).columns.toSet ===
      Set("k", "part", "v", "val_renamed"))
    // plain additive evolution (add WITHOUT omitting) is unchanged
    PartitionedLake.upsert(spark, path, "part", "k",
      Seq((3L, "p1", "c", "x", "w"))
        .toDF("k", "part", "v", "val_renamed", "extra"))
    assert(PartitionedLake.read(spark, path)
      .filter(col("k") === 3L).select("extra").collect()
      .map(_.getString(0)).toSeq === Seq("w"))
    // and append applies the same heuristic
    val ea = intercept[Exception] {
      PartitionedLake.append(
        Seq((9L, "p1", "z")).toDF("k", "part", "v_renamed_again"),
        path, Seq("part"))
    }
    assert(ea.getMessage.contains("rename"), ea.getMessage)
  }

  test("per-commit CDF: every version's changes surface tagged _commit_version; folding them in order reconstructs the net end state") {
    val path = java.nio.file.Files.createTempDirectory("graft-cdfpc").toString + "/lake"
    // a key with INTERMEDIATE churn: k=9 inserted in v2 then deleted in
    // v3 — invisible to the net diff, visible per commit
    PartitionedLake.write(Seq((1L, "p1", "a"), (2L, "p2", "b"))
      .toDF("k", "part", "v"), path, "part")
    PartitionedLake.upsert(spark, path, "part", "k",
      Seq((1L, "p1", "a2"), (9L, "p1", "temp")).toDF("k", "part", "v"))
    PartitionedLake.cdcSink(spark, path, "part", "k", "v",
      Seq((9L, "p1", 1L, "D", ""), (2L, "p2", 2L, "U", "b2"))
        .toDF("k", "part", "seq", "op", "val"))
    val pc = PartitionedLake.changesBetween(spark, path, 1L, 3L,
      Seq("part", "k"), perCommit = true)
    val rows = pc.collect().map(r => (r.getAs[Long]("_commit_version"),
      r.getAs[Long]("k"), r.getAs[String]("v"),
      r.getAs[String]("_change_type"))).toSet
    assert(rows === Set(
      (2L, 1L, "a", "update_preimage"), (2L, 1L, "a2", "update_postimage"),
      (2L, 9L, "temp", "insert"),
      (3L, 9L, "temp", "delete"),
      (3L, 2L, "b", "update_preimage"), (3L, 2L, "b2", "update_postimage")))
    // each tagged slice equals the consecutive net diff of its pair
    Seq(2L, 3L).foreach { v =>
      val slice = pc.filter(col("_commit_version") === v)
        .drop("_commit_version")
      assert(collectChanges(slice) === collectChanges(
        PartitionedLake.changesBetween(spark, path, v - 1, v,
          Seq("part", "k"))), s"per-commit slice v$v != net(v${v - 1}, v$v)")
    }
    // folding the per-commit feed in commit order onto snapshot v1
    // reconstructs snapshot v3 — the consumer-meaningful property
    var state = PartitionedLake.readVersion(spark, path, 1L).collect()
      .map(r => (r.getAs[String]("part"), r.getAs[Long]("k")) ->
        r.getAs[String]("v")).to(scala.collection.mutable.Map)
    pc.orderBy("_commit_version").collect().foreach { r =>
      val id = (r.getAs[String]("part"), r.getAs[Long]("k"))
      r.getAs[String]("_change_type") match {
        case "insert" | "update_postimage" => state(id) = r.getAs[String]("v")
        case "delete" => state.remove(id)
        case "update_preimage" => ()
      }
    }
    val end = PartitionedLake.readVersion(spark, path, 3L).collect()
      .map(r => (r.getAs[String]("part"), r.getAs[Long]("k")) ->
        r.getAs[String]("v")).toMap
    assert(state.toMap === end)
    // net == perCommit collapsed: the net diff misses the k=9 churn by
    // design (documented), and per-commit's END STATE equals net's
    val net = collectChanges(PartitionedLake.changesBetween(
      spark, path, 1L, 3L, Seq("part", "k")))
    assert(!net.exists(_._1 == 9L), "net diff must collapse the churn")
    // empty range: typed empty frame, schema carries _commit_version
    val empty = PartitionedLake.changesBetween(spark, path, 2L, 2L,
      Seq("part", "k"), perCommit = true)
    assert(empty.count() === 0L)
    assert(empty.columns.contains("_commit_version"))
  }

  test("per-commit CDF across a MID-RANGE schema evolution: earlier commits' rows align to the final schema with nulls") {
    val path = java.nio.file.Files.createTempDirectory("graft-cdfpcev").toString + "/lake"
    PartitionedLake.write(Seq((1L, "p1", "a")).toDF("k", "part", "v"),
      path, "part")
    // v2 under the ORIGINAL schema, v3 widens with `note`
    PartitionedLake.upsert(spark, path, "part", "k",
      Seq((2L, "p1", "b")).toDF("k", "part", "v"))
    PartitionedLake.upsert(spark, path, "part", "k",
      Seq((3L, "p1", "c", "n3")).toDF("k", "part", "v", "note"))
    val pc = PartitionedLake.changesBetween(spark, path, 1L, 3L,
      Seq("part", "k"), perCommit = true)
    val got = pc.collect().map(r => (r.getAs[Long]("_commit_version"),
      r.getAs[Long]("k"), r.getAs[String]("v"),
      Option(r.getAs[String]("note")), r.getAs[String]("_change_type")))
      .toSet
    // k=1/k=2 survive the v3 rewrite value-identical (note null-padded
    // on both sides) -> no change rows for them; the churnless rewrite
    // surfaces only the genuine insert per commit
    assert(got === Set(
      (2L, 2L, "b", None, "insert"),
      (3L, 3L, "c", Some("n3"), "insert")))
  }

  test("changesBetween on a vacuumed version fails loudly") {
    val path = java.nio.file.Files.createTempDirectory("graft-cdf6").toString + "/lake"
    PartitionedLake.write(Seq((1L, "p1", "a")).toDF("k", "part", "v"),
      path, "part")
    PartitionedLake.upsert(spark, path, "part", "k",
      Seq((1L, "p1", "b")).toDF("k", "part", "v"))
    PartitionedLake.vacuum(spark, path)
    val e = intercept[IllegalArgumentException] {
      PartitionedLake.changesBetween(spark, path, 1L, 2L, Seq("part", "k"))
    }
    assert(e.getMessage.contains("not resolvable"), e.getMessage)
  }
}

/** Merge-on-read CDC: per-partition delta sidecars instead of partition
  * rewrite — the write-amplification escape hatch for high-churn lakes.
  */
class LakeMorSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def state(path: String): Set[(Long, String, Double)] =
    PartitionedLake.read(spark, path).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("part"),
        r.getAs[Double]("bal"))).toSet

  test("merge-on-read fold: base data files stay byte-identical; only delta sidecars are written") {
    val path = java.nio.file.Files.createTempDirectory("graft-mor1").toString + "/lake"
    PartitionedLake.write(Seq(
      (1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p2", 30.0))
      .toDF("k", "part", "bal"), path, "part")
    def files(p: String): Map[String, Long] = {
      val d = new java.io.File(s"$path/part=$p")
      d.listFiles().filter(f => f.getName.startsWith("c"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val p1Before = files("p1")
    val p2Before = files("p2")
    PartitionedLake.cdcSinkMergeOnRead(spark, path, "part", "k", "bal",
      Seq((1L, "p1", 1L, "U", 11.0), (2L, "p1", 2L, "D", 0.0),
        (9L, "p1", 3L, "U", 99.0)) // absent key: ignored
        .toDF("k", "part", "seq", "op", "val"))
    assert(state(path) === Set((1L, "p1", 11.0), (3L, "p2", 30.0)))
    // THE merge-on-read contract: base data files untouched, in every
    // partition — the batch wrote only a delta sidecar into p1
    assert(files("p1") === p1Before)
    assert(files("p2") === p2Before)
    assert(new java.io.File(s"$path/part=p1").listFiles()
      .exists(_.getName.startsWith("delta-")))
    assert(!new java.io.File(s"$path/part=p2").listFiles()
      .exists(_.getName.startsWith("delta-")))
    // a second batch folds INTO the log: delete previously-updated k=1,
    // update k=3 in the clean partition
    PartitionedLake.cdcSinkMergeOnRead(spark, path, "part", "k", "bal",
      Seq((1L, "p1", 4L, "D", 0.0), (3L, "p2", 5L, "U", 33.0))
        .toDF("k", "part", "seq", "op", "val"))
    assert(state(path) === Set((3L, "p2", 33.0)))
    assert(files("p1") === p1Before)
    assert(files("p2") === p2Before)
    // a U op on a tombstoned key is ignored (the row is gone)
    PartitionedLake.cdcSinkMergeOnRead(spark, path, "part", "k", "bal",
      Seq((2L, "p1", 6L, "U", 222.0)).toDF("k", "part", "seq", "op", "val"))
    assert(state(path) === Set((3L, "p2", 33.0)))
  }

  test("MOR read pins partition-column types from the manifest schema, not dir-name inference") {
    // partition values that Spark's partition-type inference would turn
    // into int (and '07' -> 7 loses the leading zero): the delta scan
    // must declare partition columns like the base scan does, or updated
    // rows come back with a mutated partition value and the next
    // compact() aborts on the diverged partition path
    val path = java.nio.file.Files.createTempDirectory("graft-mor-ptype").toString + "/lake"
    PartitionedLake.write(Seq((1L, "07", 10.0), (2L, "12", 20.0))
      .toDF("k", "part", "bal"), path, "part")
    PartitionedLake.cdcSinkMergeOnRead(spark, path, "part", "k", "bal",
      Seq((1L, "07", 1L, "U", 11.0)).toDF("k", "part", "seq", "op", "val"))
    val read = PartitionedLake.read(spark, path)
    assert(read.schema("part").dataType ===
      org.apache.spark.sql.types.StringType)
    assert(state(path) === Set((1L, "07", 11.0), (2L, "12", 20.0)))
    PartitionedLake.compact(spark, path)
    assert(state(path) === Set((1L, "07", 11.0), (2L, "12", 20.0)))
  }

  test("compact materializes deltas away; vacuum reclaims the superseded sidecars") {
    val path = java.nio.file.Files.createTempDirectory("graft-mor2").toString + "/lake"
    PartitionedLake.write(Seq((1L, "p1", 10.0), (2L, "p1", 20.0))
      .toDF("k", "part", "bal"), path, "part")
    PartitionedLake.cdcSinkMergeOnRead(spark, path, "part", "k", "bal",
      Seq((1L, "p1", 1L, "U", 11.0)).toDF("k", "part", "seq", "op", "val"))
    val before = state(path)
    PartitionedLake.compact(spark, path)
    assert(state(path) === before)
    // the merged read now comes from data files alone
    assert(PartitionedLake.read(spark, path).inputFiles
      .forall(!_.contains("delta-")))
    PartitionedLake.vacuum(spark, path)
    assert(!new java.io.File(s"$path/part=p1").listFiles()
      .exists(_.getName.startsWith("delta-")))
    assert(state(path) === before)
    // a fresh MOR batch after compaction starts a new log
    PartitionedLake.cdcSinkMergeOnRead(spark, path, "part", "k", "bal",
      Seq((2L, "p1", 2L, "D", 0.0)).toDF("k", "part", "seq", "op", "val"))
    assert(state(path) === Set((1L, "p1", 11.0)))
  }

  test("time travel and snapshot isolation hold across merge-on-read commits") {
    val path = java.nio.file.Files.createTempDirectory("graft-mor3").toString + "/lake"
    PartitionedLake.write(Seq((1L, "p1", 10.0), (2L, "p2", 20.0))
      .toDF("k", "part", "bal"), path, "part")
    val pinned = PartitionedLake.read(spark, path)
    PartitionedLake.cdcSinkMergeOnRead(spark, path, "part", "k", "bal",
      Seq((1L, "p1", 1L, "U", 11.0), (2L, "p2", 2L, "D", 0.0))
        .toDF("k", "part", "seq", "op", "val"))
    // pinned reader materializes AFTER the commit: still the old snapshot
    assert(pinned.collect().map(_.getAs[Double]("bal")).toSet === Set(10.0, 20.0))
    assert(state(path) === Set((1L, "p1", 11.0)))
    def at(v: Long) = PartitionedLake.readVersion(spark, path, v).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Double]("bal")).toSet
    assert(at(1) === Set(1L -> 10.0, 2L -> 20.0))
    assert(at(2) === Set(1L -> 11.0))
  }

  test("replay guard: a redelivered batchId is skipped whole on the MOR sink") {
    val path = java.nio.file.Files.createTempDirectory("graft-mor4").toString + "/lake"
    PartitionedLake.write(Seq((1L, "p1", 10.0)).toDF("k", "part", "bal"),
      path, "part")
    PartitionedLake.cdcSinkMergeOnRead(spark, path, "part", "k", "bal",
      Seq((1L, "p1", 1L, "U", 11.0)).toDF("k", "part", "seq", "op", "val"),
      batchId = Some(5L))
    // redelivery with poisoned content: the txn guard skips it whole
    PartitionedLake.cdcSinkMergeOnRead(spark, path, "part", "k", "bal",
      Seq((1L, "p1", 9L, "U", 666.0)).toDF("k", "part", "seq", "op", "val"),
      batchId = Some(5L))
    assert(state(path) === Set((1L, "p1", 11.0)))
    PartitionedLake.cdcSinkMergeOnRead(spark, path, "part", "k", "bal",
      Seq((1L, "p1", 10L, "U", 12.0)).toDF("k", "part", "seq", "op", "val"),
      batchId = Some(6L))
    assert(state(path) === Set((1L, "p1", 12.0)))
  }

  test("changesBetween across a MOR commit: delta-only change diffs correctly, untouched partitions unopened") {
    val path = java.nio.file.Files.createTempDirectory("graft-mor5").toString + "/lake"
    PartitionedLake.write(Seq(
      (1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p2", 30.0))
      .toDF("k", "part", "bal"), path, "part")
    PartitionedLake.cdcSinkMergeOnRead(spark, path, "part", "k", "bal",
      Seq((1L, "p1", 1L, "U", 11.0), (2L, "p1", 2L, "D", 0.0))
        .toDF("k", "part", "seq", "op", "val"))
    val changes = PartitionedLake.changesBetween(spark, path, 1L, 2L,
      Seq("part", "k"))
    val got = changes.collect().map(r => (r.getAs[Long]("k"),
      r.getAs[Double]("bal"), r.getAs[String]("_change_type"))).toSet
    assert(got === Set((1L, 10.0, "update_preimage"),
      (1L, 11.0, "update_postimage"), (2L, 20.0, "delete")))
    assert(changes.inputFiles.forall(_.contains("/part=p1/")),
      changes.inputFiles.toSeq)
  }

  test("additive schema evolution composes with live deltas: untouched partitions' logs survive under the widened schema") {
    val path = java.nio.file.Files.createTempDirectory("graft-mor7").toString + "/lake"
    PartitionedLake.write(Seq((1L, "p1", 10.0), (2L, "p2", 20.0))
      .toDF("k", "part", "bal"), path, "part")
    // MOR corrections in BOTH partitions under the original schema
    PartitionedLake.cdcSinkMergeOnRead(spark, path, "part", "k", "bal",
      Seq((1L, "p1", 1L, "U", 11.0), (2L, "p2", 2L, "U", 21.0))
        .toDF("k", "part", "seq", "op", "val"))
    // a widening upsert touches ONLY p1: its delta materializes into the
    // rewrite (cleared), p2's log survives and must read correctly under
    // the widened snapshot schema (old delta files lack `note` — parquet
    // by-name reads surface null, same as old data files)
    PartitionedLake.upsert(spark, path, "part", "k",
      Seq((1L, "p1", 12.0, "hello")).toDF("k", "part", "bal", "note"))
    val got = PartitionedLake.read(spark, path).orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Double]("bal"),
        r.getAs[String]("note"))).toSeq
    assert(got === Seq((1L, 12.0, "hello"), (2L, 21.0, null)))
    // the post-evolution MOR fold writes logs under the widened schema
    PartitionedLake.cdcSinkMergeOnRead(spark, path, "part", "k", "bal",
      Seq((2L, "p2", 3L, "U", 22.0)).toDF("k", "part", "seq", "op", "val"))
    val got2 = PartitionedLake.read(spark, path).orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Double]("bal"),
        r.getAs[String]("note"))).toSeq
    assert(got2 === Seq((1L, 12.0, "hello"), (2L, 22.0, null)))
    // compaction materializes everything; the lake stays identical
    PartitionedLake.compact(spark, path)
    val got3 = PartitionedLake.read(spark, path).orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Double]("bal"),
        r.getAs[String]("note"))).toSeq
    assert(got3 === got2)
  }

  test("op 'val' type must equal the lake column's type: both CDC sinks refuse a coercing fold before anything commits") {
    val path = java.nio.file.Files.createTempDirectory("graft-valtype").toString + "/lake"
    // lake value column is LONG; the op log carries DOUBLE vals (the
    // Debezium-decodes-numerics-as-double reality) — a silent coercion
    // would widen the snapshot schema out from under untouched files
    PartitionedLake.write(Seq((1L, "p1", 10L), (2L, "p2", 20L))
      .toDF("k", "part", "cnt"), path, "part")
    val badOps = Seq((1L, "p1", 1L, "U", 11.5))
      .toDF("k", "part", "seq", "op", "val")
    val e1 = intercept[IllegalArgumentException] {
      PartitionedLake.cdcSink(spark, path, "part", "k", "cnt", badOps)
    }
    assert(e1.getMessage.contains("must equal lake column"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      PartitionedLake.cdcSinkMergeOnRead(spark, path, "part", "k", "cnt",
        badOps)
    }
    assert(e2.getMessage.contains("must equal lake column"), e2.getMessage)
    // the lake is unharmed and a correctly-typed log applies
    assert(PartitionedLake.snapshots(spark, path) === Seq(1L))
    PartitionedLake.cdcSink(spark, path, "part", "k", "cnt",
      Seq((1L, "p1", 1L, "U", 11L)).toDF("k", "part", "seq", "op", "val"))
    assert(PartitionedLake.read(spark, path).orderBy("k").collect()
      .map(_.getAs[Long]("cnt")).toSeq === Seq(11L, 20L))
  }

  test("metadata-only COUNT(*): exact across upserts and CoW deletes, None with live deltas or legacy files, restored by compact") {
    val path = java.nio.file.Files.createTempDirectory("graft-count").toString + "/lake"
    def meta() = PartitionedLake.rowCount(spark, path)
    def scanned() = PartitionedLake.read(spark, path).count()
    PartitionedLake.write(Seq(
      (1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p2", 30.0))
      .toDF("k", "part", "bal"), path, "part")
    assert(meta() === Some(3L) && scanned() === 3L)
    PartitionedLake.upsert(spark, path, "part", "k",
      Seq((1L, "p1", 11.0), (4L, "p2", 40.0)).toDF("k", "part", "bal"))
    assert(meta() === Some(4L) && scanned() === 4L)
    PartitionedLake.cdcSink(spark, path, "part", "k", "bal",
      Seq((2L, "p1", 1L, "D", 0.0)).toDF("k", "part", "seq", "op", "val"))
    assert(meta() === Some(3L) && scanned() === 3L)
    assert(PartitionedLake.partitionRowCounts(spark, path) ===
      Some(Map("part=p1" -> 1L, "part=p2" -> 2L)))
    // live merge-on-read deltas change the count at READ time: the
    // metadata answer must refuse, not lie
    PartitionedLake.cdcSinkMergeOnRead(spark, path, "part", "k", "bal",
      Seq((3L, "p2", 2L, "D", 0.0)).toDF("k", "part", "seq", "op", "val"))
    assert(meta() === None && scanned() === 2L)
    PartitionedLake.compact(spark, path)
    assert(meta() === Some(2L) && scanned() === 2L)
    // adopted legacy files carry no footer counts -> None until rewritten
    val legacy = java.nio.file.Files.createTempDirectory("graft-count2")
      .toString + "/lake"
    Seq((1L, "p1", 1.0)).toDF("k", "part", "bal")
      .write.partitionBy("part").parquet(legacy)
    PartitionedLake.upsert(spark, legacy, "part", "k",
      Seq((2L, "p2", 2.0)).toDF("k", "part", "bal"))
    assert(PartitionedLake.rowCount(spark, legacy) === None)
    assert(PartitionedLake.read(spark, legacy).count() === 2L)
  }

  test("readRange on a MOR lake stays exact: residual filter covers delta post-images") {
    val path = java.nio.file.Files.createTempDirectory("graft-mor6").toString + "/lake"
    PartitionedLake.write(Seq(
      (1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p1", 30.0))
      .toDF("k", "part", "bal"), path, "part", statsCols = Seq("bal"))
    PartitionedLake.cdcSinkMergeOnRead(spark, path, "part", "k", "bal",
      Seq((1L, "p1", 1L, "U", 25.0), (3L, "p1", 2L, "D", 0.0))
        .toDF("k", "part", "seq", "op", "val"))
    val got = PartitionedLake.readRange(spark, path, "bal", 15.0, 40.0)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Double]("bal")).toSet
    assert(got === Set(1L -> 25.0, 2L -> 20.0))
  }
}
