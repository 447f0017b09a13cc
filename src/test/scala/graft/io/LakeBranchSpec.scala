package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-audit-publish branches ([[PartitionedLake.createBranch]] /
  * [[PartitionedLake.publishBranch]] / [[PartitionedLake.dropBranch]]
  * + the ambient `spark.graft.lake.branch` routing): stage commits on
  * a branch invisibly to main readers, audit the staged state, then
  * fast-forward main with ONE manifest rename — concurrent main-line
  * and branch writers never conflict until publish, and only a
  * directory changed on BOTH sides refuses.
  */
class LakeBranchSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def freshLake(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-branch-$tag")
      .toString + "/lake"

  private def rowsOf(lake: String): Set[(String, Long, Double)] =
    PartitionedLake.read(spark, lake).select("part", "k", "bal").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  private def seed(lake: String): Unit =
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "a", 2.0),
      (3L, "b", 3.0), (4L, "c", 4.0)).toDF("k", "part", "bal"),
      lake, "part")

  private def onBranch[A](name: String)(body: => A): A = {
    spark.conf.set(PartitionedLake.BranchKey, name)
    try body finally spark.conf.unset(PartitionedLake.BranchKey)
  }

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)

  test("WAP lifecycle: branch commits (API upsert AND SQL UPDATE) are invisible to main, audit reads the staged state, publish fast-forwards main in one version, branch retires") {
    val lake = freshLake("wap")
    seed(lake)
    useCatalog()
    assert(PartitionedLake.createBranch(spark, lake, "etl_audit") === 1L)
    assert(PartitionedLake.branches(spark, lake) === Seq(("etl_audit", 1L)))
    onBranch("etl_audit") {
      // both write surfaces route to the branch
      PartitionedLake.upsert(spark, lake, "part", "k",
        Seq((1L, "a", 100.0)).toDF("k", "part", "bal"))
      spark.sql(s"UPDATE graft_lake.`$lake` SET bal = bal + 1 WHERE k = 3")
      // the AUDIT: reads on the branch see the staged state
      assert(rowsOf(lake) === Set(("a", 1L, 100.0), ("a", 2L, 2.0),
        ("b", 3L, 4.0), ("c", 4L, 4.0)))
      assert(PartitionedLake.snapshots(spark, lake) === Seq(1L, 2L, 3L),
        "the branch has its own version line from the base")
    }
    // main readers saw NOTHING while the branch staged
    assert(rowsOf(lake) === Set(("a", 1L, 1.0), ("a", 2L, 2.0),
      ("b", 3L, 3.0), ("c", 4L, 4.0)))
    assert(PartitionedLake.snapshots(spark, lake) === Seq(1L))
    // publish: ONE new main version carries the branch's state
    assert(PartitionedLake.publishBranch(spark, lake, "etl_audit") === 2L)
    assert(rowsOf(lake) === Set(("a", 1L, 100.0), ("a", 2L, 2.0),
      ("b", 3L, 4.0), ("c", 4L, 4.0)))
    assert(PartitionedLake.snapshots(spark, lake) === Seq(1L, 2L))
    // time travel still serves the pre-publish main
    assert(PartitionedLake.readVersion(spark, lake, 1L)
      .filter(col("k") === 1L).head().getAs[Double]("bal") === 1.0)
    assert(PartitionedLake.branches(spark, lake) === Nil,
      "publish retires the branch by default")
  }

  test("concurrent main-line and branch writers never conflict until publish; disjoint partitions merge, overlapping ones refuse with directions") {
    val lake = freshLake("race")
    seed(lake)
    PartitionedLake.createBranch(spark, lake, "wip")
    onBranch("wip") {
      PartitionedLake.upsert(spark, lake, "part", "k",
        Seq((1L, "a", 50.0)).toDF("k", "part", "bal")) // branch: part=a
    }
    // main keeps moving CONCURRENTLY, touching a DISJOINT partition
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((3L, "b", 30.0)).toDF("k", "part", "bal")) // main: part=b
    // publish keeps the branch alive (drop = false) for the second act
    PartitionedLake.publishBranch(spark, lake, "wip", drop = false)
    assert(rowsOf(lake) === Set(("a", 1L, 50.0), ("a", 2L, 2.0),
      ("b", 3L, 30.0), ("c", 4L, 4.0)),
      "publish must merge main's concurrent disjoint commit, not clobber it")
    assert(PartitionedLake.branches(spark, lake).map(_._1) === Seq("wip"))
    // second act: main now touches part=a too — the branch's base
    // predates BOTH sides' part=a changes, so publish must refuse
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((2L, "a", 99.0)).toDF("k", "part", "bal"))
    val e = intercept[Exception](
      PartitionedLake.publishBranch(spark, lake, "wip"))
    assert(e.getMessage.contains("BOTH"))
    assert(e.getMessage.contains("part=a"))
    PartitionedLake.dropBranch(spark, lake, "wip")
  }

  test("refusal matrix: unknown ambient branch, duplicate create, all-digit name, unknown drop/publish, main-line guards under ambient branch") {
    val lake = freshLake("refuse")
    seed(lake)
    // ambient branch that was never created: reads AND writes refuse
    // with directions (never adopt/bootstrap into the namespace)
    onBranch("ghost") {
      val e = intercept[Exception](PartitionedLake.read(spark, lake).count())
      assert(e.getMessage.contains("does not exist"))
      val e2 = intercept[Exception](PartitionedLake.upsert(spark, lake,
        "part", "k", Seq((1L, "a", 9.0)).toDF("k", "part", "bal")))
      assert(e2.getMessage.contains("does not exist"))
    }
    PartitionedLake.createBranch(spark, lake, "b1")
    assert(intercept[Exception](
      PartitionedLake.createBranch(spark, lake, "b1"))
      .getMessage.contains("already exists"))
    assert(intercept[Exception](
      PartitionedLake.createBranch(spark, lake, "2026"))
      .getMessage.contains("all digits"))
    assert(intercept[Exception](
      PartitionedLake.dropBranch(spark, lake, "nope"))
      .getMessage.contains("no branch"))
    assert(intercept[Exception](
      PartitionedLake.publishBranch(spark, lake, "nope"))
      .getMessage.contains("no branch"))
    // maintenance and refs are MAIN-LINE vocabulary: refuse under a
    // branch instead of silently mixing version namespaces
    onBranch("b1") {
      assert(intercept[Exception](PartitionedLake.vacuum(spark, lake))
        .getMessage.contains("MAIN line"))
      assert(intercept[Exception](
        PartitionedLake.tag(spark, lake, "t", 1L))
        .getMessage.contains("MAIN line"))
      assert(intercept[Exception](
        PartitionedLake.rollback(spark, lake, 1L))
        .getMessage.contains("MAIN line"))
      // tag RESOLUTION refuses too: a tag pins a main-line version
      // number, and the branch's own numbering may contain it — the one
      // shape that could read wrong data silently instead of loudly
      assert(intercept[Exception](
        PartitionedLake.tagVersion(spark, lake, "whatever"))
        .getMessage.contains("MAIN line"))
    }
    PartitionedLake.dropBranch(spark, lake, "b1")
  }

  test("vacuum protects live branches: branch-staged files survive a main-line vacuum; a dropped branch's files are reclaimed") {
    val lake = freshLake("vac")
    seed(lake)
    PartitionedLake.createBranch(spark, lake, "keep")
    onBranch("keep") {
      PartitionedLake.upsert(spark, lake, "part", "k",
        Seq((1L, "a", 77.0)).toDF("k", "part", "bal"))
    }
    // main overwrites part=a (disjoint publish later impossible, but
    // the branch must stay READABLE regardless) and vacuums hard
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((5L, "b", 5.0)).toDF("k", "part", "bal"))
    PartitionedLake.vacuum(spark, lake, keepLast = 1)
    onBranch("keep") {
      // the branch is frozen at base + its own commits (main's
      // concurrent k=5 is not visible here — that merge happens at
      // publish); what matters is the staged state remains READABLE
      assert(rowsOf(lake) === Set(("a", 1L, 77.0), ("a", 2L, 2.0),
        ("b", 3L, 3.0), ("c", 4L, 4.0)),
        "a main-line vacuum must not reclaim branch-referenced files")
    }
    // drop, then vacuum: the branch's staged file is now unreferenced
    // debris and goes
    val branchFiles = onBranch("keep") {
      PartitionedLake.read(spark, lake).inputFiles.toSet
    }
    val mainFiles = PartitionedLake.read(spark, lake).inputFiles.toSet
    val branchOnly = branchFiles -- mainFiles
    assert(branchOnly.nonEmpty)
    PartitionedLake.dropBranch(spark, lake, "keep")
    PartitionedLake.vacuum(spark, lake, keepLast = 1)
    branchOnly.foreach { f =>
      assert(!new java.io.File(new java.net.URI(f).getPath).exists(),
        s"dropped branch's file $f must be reclaimed")
    }
    assert(rowsOf(lake) === Set(("a", 1L, 1.0), ("a", 2L, 2.0),
      ("b", 3L, 3.0), ("b", 5L, 5.0), ("c", 4L, 4.0)))
  }

  test("per-read branch pin: .option(branch)/SQL #branch= read a branch and main in ONE query, compose with the ambient conf, and refuse writes") {
    val lake = freshLake("pin")
    seed(lake)
    useCatalog()
    PartitionedLake.createBranch(spark, lake, "etl_audit")
    onBranch("etl_audit") {
      spark.sql(s"UPDATE graft_lake.`$lake` SET bal = 100 WHERE k = 1")
    }
    // DataFrame option: the pinned read sees the staged state with NO
    // ambient conf set
    val viaOption = spark.read.format("graft-lake-v2")
      .option("path", lake).option("branch", "etl_audit").load()
    assert(viaOption.filter(col("k") === 1).head().getAs[Double]("bal")
      === 100.0)
    // ONE query across branch AND main — the publish-gate audit shape
    // (`branch EXCEPT main`), impossible with ambient-only routing
    val diff = spark.sql(
      s"SELECT * FROM graft_lake.`$lake#branch=etl_audit` EXCEPT " +
        s"SELECT * FROM graft_lake.`$lake`").collect()
    assert(diff.map(r => (r.getAs[Long]("k"), r.getAs[Double]("bal")))
      .toSet === Set((1L, 100.0)))
    // numeric VERSION AS OF addresses the branch's OWN line; the
    // branch base (v1) still reads the pre-staged value
    assert(spark.sql(
      s"SELECT bal FROM graft_lake.`$lake#branch=etl_audit` " +
        "VERSION AS OF 1 WHERE k = 1").head().getDouble(0) === 1.0)
    // composition with the ambient conf: agreement reads fine, a
    // DIFFERENT ambient branch refuses (silently preferring either
    // would make the same query session-dependent)
    onBranch("etl_audit") {
      assert(spark.read.format("graft-lake-v2").option("path", lake)
        .option("branch", "etl_audit").load()
        .filter(col("k") === 1).head().getAs[Double]("bal") === 100.0)
    }
    PartitionedLake.createBranch(spark, lake, "other")
    onBranch("other") {
      val e = intercept[Exception](spark.read.format("graft-lake-v2")
        .option("path", lake).option("branch", "etl_audit").load())
      assert(e.getMessage.contains("conflicts with the ambient"),
        e.getMessage)
    }
    PartitionedLake.dropBranch(spark, lake, "other")
    // the pin is a READ surface: writes refuse with directions to the
    // ambient conf (every write path is session-routed)
    val eu = intercept[Exception](spark.sql(
      s"UPDATE graft_lake.`$lake#branch=etl_audit` SET bal = 0"))
    assert(eu.getMessage.contains("read surface"), eu.getMessage)
    val ei = intercept[Exception](spark.sql(
      s"INSERT INTO graft_lake.`$lake#branch=etl_audit` " +
        "VALUES (9, 'a', 9.0)"))
    assert(ei.getMessage.contains("read surface"), ei.getMessage)
    // branch INSPECTION via the snapshot metadata tables: what exactly
    // did the branch stage (its rewritten part=a file differs from
    // main's; the partition inventory reads the branch's snapshot)
    val mainFiles = spark.sql(
      s"SELECT file FROM graft_lake.`$lake#files` " +
        "WHERE partition = 'part=a'").collect().map(_.getString(0)).toSet
    val branchFiles = spark.sql(
      s"SELECT file FROM graft_lake.`$lake#branch=etl_audit#files` " +
        "WHERE partition = 'part=a'").collect().map(_.getString(0)).toSet
    assert(branchFiles.nonEmpty && branchFiles != mainFiles,
      s"branch #files must show the staged rewrite, got $branchFiles " +
        s"vs main $mainFiles")
    assert(spark.sql(
      s"SELECT sum(rows) FROM graft_lake.`$lake#branch=etl_audit" +
        "#partitions`").head().getLong(0) === 4L)
    // and the branch base is addressable: VERSION AS OF 1 on the
    // branch's #partitions reads the bootstrap copy
    assert(spark.sql(
      s"SELECT sum(rows) FROM graft_lake.`$lake#branch=etl_audit" +
        "#partitions` VERSION AS OF 1").head().getLong(0) === 4L)
    // unknown branch pin refuses loudly; TIMESTAMP AS OF refuses with
    // the version-pin direction; tag-shaped versionAsOf refuses
    assert(intercept[Exception](spark.read.format("graft-lake-v2")
      .option("path", lake).option("branch", "ghost").load())
      .getMessage.contains("does not exist"))
    assert(intercept[Exception](spark.sql(
      s"SELECT * FROM graft_lake.`$lake#branch=etl_audit` " +
        "TIMESTAMP AS OF '2026-01-01'").collect())
      .getMessage.contains("moving staged line"))
    assert(intercept[Exception](spark.read.format("graft-lake-v2")
      .option("path", lake).option("branch", "etl_audit")
      .option("versionAsOf", "sometag").load())
      .getMessage.contains("main-line refs"))
    PartitionedLake.dropBranch(spark, lake, "etl_audit")
  }

  test("branch aging + pin accounting: #branches shows created_at/age_ms/pinned_bytes; the maxAgeMs governor refuses or allows further staging; reads never refuse") {
    val lake = freshLake("age")
    seed(lake)
    useCatalog()
    PartitionedLake.createBranch(spark, lake, "old")
    onBranch("old") {
      PartitionedLake.upsert(spark, lake, "part", "k",
        Seq((1L, "a", 50.0)).toDF("k", "part", "bal"))
    }
    // the cost columns: a branch that rewrote part=a pins that file
    // (and only that file) beyond the main head
    val row = spark.sql(s"SELECT * FROM graft_lake.`$lake#branches`")
      .head()
    assert(row.getAs[String]("branch") === "old")
    assert(row.getAs[java.sql.Timestamp]("created_at") != null)
    assert(row.getAs[Long]("age_ms") >= 0L)
    val pinned = row.getAs[java.lang.Long]("pinned_bytes")
    assert(pinned != null && pinned > 0L,
      s"the branch's rewrite of part=a must register as pinned bytes, " +
        s"got $pinned")
    // refuse mode on an over-age branch: further STAGING refuses with
    // directions; reads stay open (an aged branch remains auditable)
    spark.conf.set(PartitionedLake.BranchMaxAgeKey, "1")
    spark.conf.set(PartitionedLake.BranchOnExceedKey, "refuse")
    try {
      Thread.sleep(10)
      val e = intercept[Exception](onBranch("old") {
        PartitionedLake.upsert(spark, lake, "part", "k",
          Seq((2L, "a", 9.0)).toDF("k", "part", "bal"))
      })
      assert(e.getMessage.contains("pins its whole version chain"),
        e.getMessage)
      onBranch("old") {
        assert(PartitionedLake.read(spark, lake).count() === 4L)
      }
      // warn mode: staging continues (the cost is logged, not blocked)
      spark.conf.set(PartitionedLake.BranchOnExceedKey, "warn")
      onBranch("old") {
        PartitionedLake.upsert(spark, lake, "part", "k",
          Seq((2L, "a", 9.0)).toDF("k", "part", "bal"))
      }
      // a YOUNG branch under the same refuse conf stages untroubled
      spark.conf.set(PartitionedLake.BranchMaxAgeKey, "3600000")
      spark.conf.set(PartitionedLake.BranchOnExceedKey, "refuse")
      PartitionedLake.createBranch(spark, lake, "fresh")
      onBranch("fresh") {
        PartitionedLake.upsert(spark, lake, "part", "k",
          Seq((3L, "b", 1.0)).toDF("k", "part", "bal"))
      }
      // misconfiguration refuses loudly, never silently-warn
      spark.conf.set(PartitionedLake.BranchOnExceedKey, "explode")
      val bad = intercept[Exception](onBranch("fresh") {
        PartitionedLake.upsert(spark, lake, "part", "k",
          Seq((4L, "b", 2.0)).toDF("k", "part", "bal"))
      })
      assert(bad.getMessage.contains("must be 'warn' or 'refuse'"),
        bad.getMessage)
    } finally {
      spark.conf.unset(PartitionedLake.BranchMaxAgeKey)
      spark.conf.unset(PartitionedLake.BranchOnExceedKey)
    }
    PartitionedLake.dropBranch(spark, lake, "old")
    PartitionedLake.dropBranch(spark, lake, "fresh")
    // vacuum on a branch-less lake logs no pin reports and reclaims
    // the dropped branches' files (covered in the vacuum test above)
    assert(PartitionedLake.branches(spark, lake) === Nil)
  }

  test("publish under a concurrent column rename: one-sided rebinds re-stamp physical-name pins (no silent nulls); both-sided rebinds refuse") {
    // ACT 1 — MAIN renames while the branch is staged: the published
    // manifest carries main's renamed schema over the BRANCH's file
    // entries, which were written under the old name. Without pin
    // re-stamping those read as silent nulls (the exact corruption
    // renameColumn's pinning exists to prevent).
    val lake = freshLake("renmain")
    seed(lake)
    PartitionedLake.createBranch(spark, lake, "wip")
    onBranch("wip") {
      PartitionedLake.upsert(spark, lake, "part", "k",
        Seq((1L, "a", 50.0)).toDF("k", "part", "bal"))
    }
    PartitionedLake.renameColumn(spark, lake, "bal", "balance")
    PartitionedLake.publishBranch(spark, lake, "wip")
    val got = PartitionedLake.read(spark, lake)
      .select("part", "k", "balance").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(got === Set(("a", 1L, Some(50.0)), ("a", 2L, Some(2.0)),
      ("b", 3L, Some(3.0)), ("c", 4L, Some(4.0))),
      "branch-written files must resolve under main's renamed schema " +
        s"via re-stamped pins, got $got")

    // ACT 2 — the BRANCH renames while main appends to a disjoint
    // partition: publish carries the branch's renamed schema over
    // MAIN's entries; main's new file predates the rename too.
    val lake2 = freshLake("renbranch")
    seed(lake2)
    PartitionedLake.createBranch(spark, lake2, "wip")
    onBranch("wip") {
      PartitionedLake.renameColumn(spark, lake2, "bal", "amt")
      PartitionedLake.upsert(spark, lake2, "part", "k",
        Seq((1L, "a", 9.0)).toDF("k", "part", "amt"))
    }
    PartitionedLake.upsert(spark, lake2, "part", "k",
      Seq((5L, "b", 5.0)).toDF("k", "part", "bal")) // main, old name
    PartitionedLake.publishBranch(spark, lake2, "wip")
    val got2 = PartitionedLake.read(spark, lake2)
      .select("part", "k", "amt").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(got2 === Set(("a", 1L, Some(9.0)), ("a", 2L, Some(2.0)),
      ("b", 3L, Some(3.0)), ("b", 5L, Some(5.0)),
      ("c", 4L, Some(4.0))), s"got $got2")

    // ACT 3 — BOTH sides rebind: no pin re-stamping can reconcile two
    // different renames of the same id; refuse with directions.
    val lake3 = freshLake("renboth")
    seed(lake3)
    PartitionedLake.createBranch(spark, lake3, "wip")
    onBranch("wip") {
      PartitionedLake.renameColumn(spark, lake3, "bal", "amt")
    }
    PartitionedLake.renameColumn(spark, lake3, "bal", "balance")
    val e = intercept[Exception](
      PartitionedLake.publishBranch(spark, lake3, "wip"))
    assert(e.getMessage.contains("re-bound"), e.getMessage)
    PartitionedLake.dropBranch(spark, lake3, "wip")
  }

  test("rebase_branch: a staged branch moves onto a hot main head when disjoint (staged state squashed, later publish merges); overlap refuses; already-based no-ops") {
    val lake = freshLake("rebase")
    seed(lake)
    useCatalog()
    PartitionedLake.createBranch(spark, lake, "audit") // base v1
    onBranch("audit") {
      PartitionedLake.upsert(spark, lake, "part", "k",
        Seq((1L, "a", 50.0)).toDF("k", "part", "bal")) // touches part=a
    }
    // main advances DISJOINTLY twice while the audit runs
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((3L, "b", 30.0)).toDF("k", "part", "bal")) // main v2
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((4L, "c", 40.0)).toDF("k", "part", "bal")) // main v3
    val row = spark.sql(s"CALL graft_lake.system.rebase_branch(" +
      s"table => '$lake', name => 'audit')").head()
    assert((row.getLong(1), row.getLong(2)) === (1L, 3L),
      "summary row: old base -> new base")
    // the staged chain squashes onto the new base
    val b = spark.sql("SELECT base_version, head_version, " +
      s"staged_commits FROM graft_lake.`$lake#branches`").head()
    assert((b.getLong(0), b.getLong(1), b.getLong(2)) === (3L, 4L, 1L))
    // the branch read now sees main's concurrent commits AND the
    // staged fix — the long-lived audit continues without re-applying
    onBranch("audit") {
      assert(rowsOf(lake) === Set(("a", 1L, 50.0), ("a", 2L, 2.0),
        ("b", 3L, 30.0), ("c", 4L, 40.0)))
    }
    // main keeps moving disjointly; publish after the rebase merges
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((5L, "b", 5.0)).toDF("k", "part", "bal")) // main v4
    assert(PartitionedLake.publishBranch(spark, lake, "audit") === 5L)
    assert(rowsOf(lake) === Set(("a", 1L, 50.0), ("a", 2L, 2.0),
      ("b", 3L, 30.0), ("b", 5L, 5.0), ("c", 4L, 40.0)))
    // overlap since the branch base refuses with the publish vocabulary
    PartitionedLake.createBranch(spark, lake, "clash")
    onBranch("clash") {
      PartitionedLake.upsert(spark, lake, "part", "k",
        Seq((6L, "c", 6.0)).toDF("k", "part", "bal"))
    }
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((7L, "c", 7.0)).toDF("k", "part", "bal")) // main: part=c too
    val e = intercept[Exception](
      PartitionedLake.rebaseBranch(spark, lake, "clash"))
    assert(e.getMessage.contains("BOTH") &&
      e.getMessage.contains("rebase"), e.getMessage)
    PartitionedLake.dropBranch(spark, lake, "clash")
    // a branch already based on the head no-ops (no namespace churn)
    val head = PartitionedLake.snapshots(spark, lake).max
    PartitionedLake.createBranch(spark, lake, "fresh")
    assert(PartitionedLake.rebaseBranch(spark, lake, "fresh") === head)
    PartitionedLake.dropBranch(spark, lake, "fresh")
  }

  test("publish receipt: a crashed cleanup leaves a self-describing stub — re-publish no-ops + cleans, stub reads refuse, createBranch reclaims, #branches excludes it") {
    val lake = freshLake("receipt")
    seed(lake)
    PartitionedLake.createBranch(spark, lake, "wip")
    onBranch("wip") {
      PartitionedLake.upsert(spark, lake, "part", "k",
        Seq((1L, "a", 50.0)).toDF("k", "part", "bal"))
    }
    val v = PartitionedLake.publishBranch(spark, lake, "wip",
      drop = false)
    assert(v === 2L)
    // simulate the crash window: the receipt landed, the namespace
    // delete did not
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def writeReceipt(): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(lake,
        "_branches/wip/published.txt"), true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    }
    writeReceipt()
    // the stub is NOT a live branch (it must not pin vacuum, age, or
    // list)
    assert(PartitionedLake.branches(spark, lake) === Nil)
    // reading the stub's stale staged state refuses with directions
    val e = intercept[Exception](onBranch("wip") {
      PartitionedLake.read(spark, lake).count()
    })
    assert(e.getMessage.contains("already published"), e.getMessage)
    // re-publish completes the cleanup as a NO-OP returning the
    // recorded version — never a second main commit, never an overlap
    // refusal
    assert(PartitionedLake.publishBranch(spark, lake, "wip") === 2L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(lake,
      "_branches/wip")))
    assert(PartitionedLake.snapshots(spark, lake) === Seq(1L, 2L),
      "the no-op republish must not advance main")
    // createBranch over a stub reclaims it and creates fresh
    fs.mkdirs(new org.apache.hadoop.fs.Path(lake, "_branches/wip"))
    writeReceipt()
    assert(PartitionedLake.createBranch(spark, lake, "wip") === 2L)
    assert(PartitionedLake.branches(spark, lake) === Seq(("wip", 2L)))
    PartitionedLake.dropBranch(spark, lake, "wip")
  }

  test("SQL surface: CALL system.branch / publish_branch / drop_branch run the whole WAP loop from pure SQL") {
    val lake = freshLake("sql")
    seed(lake)
    useCatalog()
    spark.sql(s"CALL graft_lake.system.branch(table => '$lake', " +
      "name => 'audit')")
    onBranch("audit") {
      spark.sql(s"UPDATE graft_lake.`$lake` SET bal = 0 WHERE k = 4")
      // the audit gate: a rule-style predicate over the branch read —
      // publish only on zero violations
      assert(spark.sql(
        s"SELECT count(*) FROM graft_lake.`$lake` WHERE bal IS NULL " +
          "OR bal < 0").head().getLong(0) === 0L)
    }
    assert(rowsOf(lake).contains(("c", 4L, 4.0)),
      "main must not see the staged UPDATE")
    val row = spark.sql(
      s"CALL graft_lake.system.publish_branch(table => '$lake', " +
        "name => 'audit')").head()
    assert(row.getLong(1) === 1L && row.getLong(2) === 2L)
    assert(rowsOf(lake).contains(("c", 4L, 0.0)))
    // the #branches metadata table lists staged branches; drop_branch
    // retires them from SQL too
    spark.sql(s"CALL graft_lake.system.branch(table => '$lake', " +
      "name => 'tmp')")
    onBranch("tmp") {
      spark.sql(s"UPDATE graft_lake.`$lake` SET bal = 1 WHERE k = 1")
    }
    val listed = spark.sql(s"SELECT * FROM graft_lake.`$lake#branches`")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(listed === Seq(("tmp", 2L, 3L, 1L)),
      s"expected one staged branch row, got $listed")
    spark.sql(s"CALL graft_lake.system.drop_branch(table => '$lake', " +
      "name => 'tmp')")
    assert(PartitionedLake.branches(spark, lake) === Nil)
    assert(spark.sql(s"SELECT * FROM graft_lake.`$lake#branches`")
      .count() === 0L)
  }

  test("branch-pinned CDF: #branch=<name>#changes diffs the branch's own line in one query; tags and VERSION AS OF refuse with the right wording; conflicting ambient refuses") {
    val lake = freshLake("cdfpin")
    seed(lake) // main v1
    useCatalog()
    PartitionedLake.createBranch(spark, lake, "fix")
    onBranch("fix") { // branch v2: partition a, k=2, bal 2 -> 9
      spark.sql(s"UPDATE graft_lake.`$lake` SET bal = 9 WHERE k = 2")
    }
    // main advances into a DISJOINT partition while the branch stages
    spark.sql(s"UPDATE graft_lake.`$lake` SET bal = 30 WHERE k = 3") // v2
    // the branch's own row-level story — the CDF complement of
    // `#branch=#files`, no session-conf flips around lazy frames
    val staged = spark.sql(
      s"SELECT k, bal, _change_type FROM graft_lake.`$lake" +
        "#branch=fix#changes?from=1&to=2&keyCols=part,k`").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(staged === Set((2L, 2.0, "update_preimage"),
      (2L, 9.0, "update_postimage")), s"got $staged")
    // the MAIN feed between the same endpoints shows main's commit only
    val mainChanged = spark.sql(
      s"SELECT k FROM graft_lake.`$lake" +
        "#changes?from=1&to=2&keyCols=part,k`").collect()
      .map(_.getLong(0)).toSet
    assert(mainChanged === Set(3L))
    // per-commit granularity composes with the pin
    val pc = spark.sql(
      s"SELECT DISTINCT _commit_version FROM graft_lake.`$lake" +
        "#branch=fix#changes?from=1&to=2&keyCols=part,k" +
        "&granularity=commit`").collect().map(_.getLong(0)).toSet
    assert(pc === Set(2L))
    // v1-format parity: the option-driven CDF takes the same pin...
    val v1 = spark.read.format("graft-lake").option("path", lake)
      .option("changesFrom", "1").option("changesTo", "2")
      .option("keyCols", "part,k").option("branch", "fix").load()
    assert(v1.select("k").collect().map(_.getLong(0)).toSet === Set(2L))
    // ...plain v1 reads pin too...
    val v1read = spark.read.format("graft-lake").option("path", lake)
      .option("branch", "fix").load()
    assert(v1read.filter(col("k") === 2).head().getAs[Double]("bal")
      === 9.0)
    // ...and v1 writes refuse it (the pin is a read surface)
    val ew = intercept[Exception](Seq((9L, "a", 1.0))
      .toDF("k", "part", "bal").write.format("graft-lake")
      .option("path", lake).option("partitionCols", "part")
      .option("branch", "fix").mode("overwrite").save())
    assert(ew.getMessage.contains("ambient conf"), ew.getMessage)
    // tags are main-line refs: a named endpoint refuses under the pin
    val et = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_lake.`$lake" +
        "#branch=fix#changes?from=base&to=2&keyCols=part,k`").collect())
    assert(et.getMessage.contains("numeric version of the branch"),
      et.getMessage)
    // VERSION AS OF on the composed table keeps the #changes wording
    // (not a branch-name validation error on 'fix#changes?...')
    val ev = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_lake.`$lake" +
        "#branch=fix#changes?from=1&to=2&keyCols=part,k` " +
        "VERSION AS OF 1").collect())
    assert(ev.getMessage.contains("#changes"), ev.getMessage)
    // a DIFFERENT ambient branch refuses at load, like every pin
    PartitionedLake.createBranch(spark, lake, "other2")
    onBranch("other2") {
      val e = intercept[Exception](spark.sql(
        s"SELECT * FROM graft_lake.`$lake" +
          "#branch=fix#changes?from=1&to=2&keyCols=part,k`").collect())
      assert(e.getMessage.contains("conflicts with the ambient"),
        e.getMessage)
    }
    PartitionedLake.dropBranch(spark, lake, "other2")
    // an AGREEING ambient composes fine
    onBranch("fix") {
      assert(spark.sql(
        s"SELECT count(*) FROM graft_lake.`$lake" +
          "#branch=fix#changes?from=1&to=2&keyCols=part,k`")
        .head().getLong(0) === 2L)
    }
  }
}
