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
}
