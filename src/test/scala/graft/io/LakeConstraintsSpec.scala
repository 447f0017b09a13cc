package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ENFORCED CHECK constraints on the lake ([[LakeCatalog]]'s
  * `SUPPORT_TABLE_CONSTRAINT` + `meta:check=` manifest lines):
  *
  *  - the SQL surface gets Spark's OWN enforcement — the table reports
  *    `constraints()`, and `ResolveTableConstraints` injects a
  *    `CheckInvariant` into every INSERT/UPDATE/MERGE plan, failing a
  *    violating statement before anything commits;
  *  - the API write paths evaluate the same predicates per row at
  *    stage time ([[PartitionedLake.applyChecks]] — one codegen'd
  *    predicate inside the write job, no extra pass);
  *  - ADD CONSTRAINT validates EXISTING data first (a constraint must
  *    never claim an invariant the table does not hold);
  *  - NULL predicates pass (SQL CHECK semantics); merge-on-read 'D'
  *    tombstones are deletion markers, exempt by construction.
  */
class LakeConstraintsSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def freshLake(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-constraints-$tag")
      .toString + "/lake"

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)

  private def messageChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")

  test("SQL lifecycle: CREATE TABLE CHECK + ADD CONSTRAINT enforce INSERT/UPDATE, validate existing data, and DROP CONSTRAINT lifts the gate") {
    val lake = freshLake("sql")
    useCatalog()
    spark.sql(s"CREATE TABLE graft_lake.`$lake` (part STRING, " +
      "k BIGINT, bal DOUBLE, CONSTRAINT bal_nonneg CHECK (bal >= 0)) " +
      "USING `graft-lake-v2` PARTITIONED BY (part)")
    spark.sql(s"INSERT INTO graft_lake.`$lake` VALUES ('a', 1, 1.0)")
    // a violating INSERT fails BEFORE committing; the lake is unchanged
    val ei = intercept[Throwable](spark.sql(
      s"INSERT INTO graft_lake.`$lake` VALUES ('a', 2, -5.0)"))
    assert(messageChain(ei).toLowerCase.contains("bal_nonneg"),
      messageChain(ei))
    assert(spark.sql(s"SELECT count(*) FROM graft_lake.`$lake`")
      .head().getLong(0) === 1L)
    // UPDATE through the same gate
    val eu = intercept[Throwable](spark.sql(
      s"UPDATE graft_lake.`$lake` SET bal = -1 WHERE k = 1"))
    assert(messageChain(eu).toLowerCase.contains("bal_nonneg"),
      messageChain(eu))
    // NULL passes (SQL CHECK semantics)
    spark.sql(s"INSERT INTO graft_lake.`$lake` VALUES ('a', 3, NULL)")
    // ADD CONSTRAINT against data that VIOLATES it refuses — whichever
    // side runs the scan (the engine's AddCheckConstraintExec or the
    // lake's own), the wording names the violation
    val ea = intercept[Throwable](spark.sql(
      s"ALTER TABLE graft_lake.`$lake` ADD CONSTRAINT small " +
        "CHECK (bal < 1)"))
    assert(messageChain(ea).toLowerCase.contains("small") ||
      messageChain(ea).toLowerCase.contains("violate"), messageChain(ea))
    // ...and against clean data it lands and enforces
    spark.sql(s"ALTER TABLE graft_lake.`$lake` ADD CONSTRAINT " +
      "k_positive CHECK (k > 0)")
    val ek = intercept[Throwable](spark.sql(
      s"INSERT INTO graft_lake.`$lake` VALUES ('a', -7, 1.0)"))
    assert(messageChain(ek).toLowerCase.contains("k_positive"),
      messageChain(ek))
    // DROP lifts exactly the named gate
    spark.sql(s"ALTER TABLE graft_lake.`$lake` DROP CONSTRAINT " +
      "k_positive")
    spark.sql(s"INSERT INTO graft_lake.`$lake` VALUES ('a', -7, 1.0)")
    // bal_nonneg still stands
    val e2 = intercept[Throwable](spark.sql(
      s"INSERT INTO graft_lake.`$lake` VALUES ('a', 9, -1.0)"))
    assert(messageChain(e2).toLowerCase.contains("bal_nonneg"),
      messageChain(e2))
    // unknown DROP refuses, IF EXISTS is quiet
    val ed = intercept[Throwable](spark.sql(
      s"ALTER TABLE graft_lake.`$lake` DROP CONSTRAINT nope"))
    assert(messageChain(ed).contains("no CHECK constraint") ||
      messageChain(ed).toLowerCase.contains("nope"), messageChain(ed))
    spark.sql(
      s"ALTER TABLE graft_lake.`$lake` DROP CONSTRAINT IF EXISTS nope")
  }

  test("API writes hit the same gate: append/upsert refuse violating rows with nothing committed; omitted constrained columns use the existence default or refuse") {
    val lake = freshLake("api")
    useCatalog()
    PartitionedLake.write(Seq(("a", 1L, 1.0)).toDF("part", "k", "bal"),
      lake, "part")
    PartitionedLake.addCheckConstraint(spark, lake, "bal_nonneg",
      "bal >= 0")
    val v = PartitionedLake.snapshots(spark, lake).max
    val ea = intercept[Throwable](PartitionedLake.append(
      Seq(("a", 2L, -3.0)).toDF("part", "k", "bal"), lake, Seq("part")))
    assert(messageChain(ea).contains("bal_nonneg"), messageChain(ea))
    // the failed job committed nothing
    assert(PartitionedLake.snapshots(spark, lake).max === v)
    assert(PartitionedLake.read(spark, lake).count() === 1L)
    PartitionedLake.append(Seq(("a", 2L, 3.0)).toDF("part", "k", "bal"),
      lake, Seq("part"))
    val eu = intercept[Throwable](PartitionedLake.upsert(spark, lake,
      "part", "k", Seq(("a", 2L, -9.0)).toDF("part", "k", "bal")))
    assert(messageChain(eu).contains("bal_nonneg"), messageChain(eu))
    assert(PartitionedLake.read(spark, lake)
      .filter(col("k") === 2).head().getDouble(2) === 3.0)
    // a constraint on a DEFAULTED column: an additive write omitting
    // the column is judged against the existence default (the value
    // the written file will read)...
    spark.sql(s"ALTER TABLE graft_lake.`$lake` ADD COLUMNS " +
      "(channel STRING DEFAULT 'web')")
    PartitionedLake.addCheckConstraint(spark, lake, "known_channel",
      "channel IN ('web', 'api')")
    PartitionedLake.append(Seq(("a", 3L, 1.0)).toDF("part", "k", "bal"),
      lake, Seq("part")) // reads channel='web': passes
    // ...and a constrained column with NO default refuses the omission
    // loudly instead of silently skipping the check
    PartitionedLake.addCheckConstraint(spark, lake, "k_small",
      "k < 1000000")
    spark.sql(s"ALTER TABLE graft_lake.`$lake` ADD COLUMNS " +
      "(score DOUBLE)")
    PartitionedLake.addCheckConstraint(spark, lake, "score_unit",
      "score BETWEEN 0 AND 1")
    val eo = intercept[Throwable](PartitionedLake.append(
      Seq(("a", 4L, 1.0)).toDF("part", "k", "bal"), lake, Seq("part")))
    assert(messageChain(eo).contains("omits column 'score'"),
      messageChain(eo))
  }

  test("merge-on-read: violating post-images refuse, tombstones are exempt; constraints ride branch publish and refuse two-sided change; exotic names/SQL round-trip the manifest") {
    val lake = freshLake("mor")
    useCatalog()
    PartitionedLake.write(
      Seq(("a", 1L, 1.0), ("a", 2L, 2.0)).toDF("part", "k", "bal"),
      lake, "part")
    PartitionedLake.addCheckConstraint(spark, lake, "bal_nonneg",
      "bal >= 0")
    val em = intercept[Throwable](PartitionedLake.cdcSinkMergeOnRead(
      spark, lake, "part", "k", "bal",
      Seq(("a", 1L, 1L, "U", -50.0)).toDF("part", "k", "seq", "op", "val")))
    assert(messageChain(em).contains("bal_nonneg"), messageChain(em))
    // valid post-image + a DELETE (whose log tombstone is identity +
    // nulls — a marker, not a row) both commit
    PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
      Seq(("a", 1L, 1L, "U", 50.0), ("a", 2L, 2L, "D", 0.0))
        .toDF("part", "k", "seq", "op", "val"))
    assert(PartitionedLake.read(spark, lake).select("k", "bal")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      === Set((1L, 50.0)))
    // branch lifecycle: a constraint ADDED ON A BRANCH validated only
    // the data the branch could see — publish re-validates the rows
    // committed since the base, so a concurrent violating main commit
    // refuses the publish instead of shipping a false invariant
    val lake2 = freshLake("branch")
    PartitionedLake.write(Seq(("a", 1L, 1.0)).toDF("part", "k", "bal"),
      lake2, "part")
    PartitionedLake.createBranch(spark, lake2, "gate")
    spark.conf.set(PartitionedLake.BranchKey, "gate")
    try PartitionedLake.addCheckConstraint(spark, lake2, "bal_nonneg",
      "bal >= 0")
    finally spark.conf.unset(PartitionedLake.BranchKey)
    // main line is unconstrained while the branch stages — this lands
    PartitionedLake.append(Seq(("b", 2L, -1.0)).toDF("part", "k", "bal"),
      lake2, Seq("part"))
    val ep = intercept[Throwable](
      PartitionedLake.publishBranch(spark, lake2, "gate"))
    assert(messageChain(ep).contains("bal_nonneg") &&
      messageChain(ep).contains("since the branch base"),
      messageChain(ep))
    // fix main's row; publish now lands and the constraint gates main
    PartitionedLake.upsert(spark, lake2, "part", "k",
      Seq(("b", 2L, 1.0)).toDF("part", "k", "bal"))
    val pubV = PartitionedLake.publishBranch(spark, lake2, "gate")
    assert(pubV > 0L)
    val eg = intercept[Throwable](PartitionedLake.append(
      Seq(("c", 3L, -2.0)).toDF("part", "k", "bal"), lake2, Seq("part")))
    assert(messageChain(eg).contains("bal_nonneg"), messageChain(eg))
    // exotic name/SQL round-trip: ':' and '/' and quotes in the
    // predicate survive the manifest header encoding
    val lake3 = freshLake("escape")
    PartitionedLake.write(Seq(("a", 1L, "x")).toDF("part", "k", "tag"),
      lake3, "part")
    PartitionedLake.addCheckConstraint(spark, lake3, "tag_shape",
      "tag NOT IN ('x:/y', 'a=b')")
    val e3 = intercept[Throwable](PartitionedLake.append(
      Seq(("a", 2L, "x:/y")).toDF("part", "k", "tag"), lake3,
      Seq("part")))
    assert(messageChain(e3).contains("tag_shape"), messageChain(e3))
  }

  test("#constraints metadata table: current, VERSION AS OF, and branch-pinned views of the constraint set") {
    val lake = freshLake("meta")
    useCatalog()
    PartitionedLake.write(Seq(("a", 1L, 1.0)).toDF("part", "k", "bal"),
      lake, "part") // v1
    spark.sql(s"ALTER TABLE graft_lake.`$lake` ADD CONSTRAINT " +
      "bal_nonneg CHECK (bal >= 0)") // v2
    assert(spark.sql(s"SELECT * FROM graft_lake.`$lake#constraints`")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      === Seq(("bal_nonneg", "bal >= 0")))
    // the constraint set is snapshot metadata: v1 declared none
    assert(spark.sql(s"SELECT * FROM graft_lake.`$lake#constraints` " +
      "VERSION AS OF 1").count() === 0L)
    // a constraint STAGED ON A BRANCH shows through the pin and stays
    // invisible to the bare table until publish
    PartitionedLake.createBranch(spark, lake, "gate2")
    spark.conf.set(PartitionedLake.BranchKey, "gate2")
    try PartitionedLake.addCheckConstraint(spark, lake, "k_positive",
      "k > 0")
    finally spark.conf.unset(PartitionedLake.BranchKey)
    assert(spark.sql(s"SELECT name FROM " +
      s"graft_lake.`$lake#branch=gate2#constraints`").collect()
      .map(_.getString(0)).toSet === Set("bal_nonneg", "k_positive"))
    assert(spark.sql(
      s"SELECT name FROM graft_lake.`$lake#constraints`").collect()
      .map(_.getString(0)).toSeq === Seq("bal_nonneg"))
  }
}
