package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL `CALL` surface for the lake's maintenance operations — the two
  * APIs that gate real costs but were JVM-only (invisible to PySpark
  * users): `CALL <catalog>.system.compact(...)` materializes
  * merge-on-read deltas, re-physicalizes renamed columns, bin-packs or
  * z-orders, and re-harvests stats; `CALL <catalog>.system.vacuum(...)`
  * reclaims files superseded outside the retention window. Each call
  * returns one summary row (versions before/after) through a
  * driver-local scan — no jobs beyond what the operation itself runs.
  *
  * Spark's own stored-procedure seam ([[UnboundProcedure]] /
  * [[BoundProcedure]], SPARK-44167): named and positional arguments,
  * SQL-expression defaults, analysis-time type coercion all come from
  * the engine — nothing re-implemented here.
  */
private[io] object LakeProcedures {
  def load(name: String): Option[UnboundProcedure] = name match {
    case "compact" => Some(new LakeCompactProcedure)
    case "vacuum" => Some(new LakeVacuumProcedure)
    case "tag" => Some(new LakeTagProcedure)
    case "drop_tag" => Some(new LakeDropTagProcedure)
    case "rollback" => Some(new LakeRollbackProcedure)
    case "branch" => Some(new LakeBranchProcedure)
    case "publish_branch" => Some(new LakePublishBranchProcedure)
    case "drop_branch" => Some(new LakeDropBranchProcedure)
    case "rebase_branch" => Some(new LakeRebaseBranchProcedure)
    case _ => None
  }
  val names: Seq[String] = Seq("branch", "compact", "drop_branch",
    "drop_tag", "publish_branch", "rebase_branch", "rollback", "tag",
    "vacuum")
}

private[io] abstract class LakeProcedureBase(procName: String)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = procName
  override def bind(inputType: StructType): BoundProcedure = this
  // maintenance mutates the lake — never cacheable
  override def isDeterministic: Boolean = false

  protected def spark: SparkSession = SparkSession.active

  protected def versionOf(path: String): Long =
    PartitionedLake.latestVersion(spark, path).getOrElse(sys.error(
      s"CALL $procName: no graft lake at $path (no manifest found)"))

  protected def summary(path: String, before: Long,
      after: Long): java.util.Iterator[Scan] = {
    val schema = StructType(Seq(
      StructField("table", StringType),
      StructField("version_before", LongType),
      StructField("version_after", LongType)))
    val row: InternalRow = new GenericInternalRow(
      Array[Any](UTF8String.fromString(path), before, after))
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] = Array(row)
      override def readSchema(): StructType = schema
      override def description(): String = s"GraftLake$procName($path)"
    }
    java.util.Collections.singletonList(scan).iterator()
  }

  protected def str(row: InternalRow, i: Int): String =
    if (row.isNullAt(i)) sys.error(
      s"CALL $procName: argument ${parameters()(i).name()} must not be " +
        "NULL")
    else row.getUTF8String(i).toString
}

/** `CALL <cat>.system.compact(table, stats_cols, zorder_by,
  * files_per_partition)` — [[PartitionedLake.compact]], the ONE
  * maintenance rewrite: materializes merge-on-read deltas away,
  * rewrites multi-file and rename-pinned partitions (restoring the
  * native DSv2 batch), optionally z-orders, and harvests the named
  * columns' footer bounds for file skipping.
  */
private[io] class LakeCompactProcedure extends LakeProcedureBase("compact") {
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("lake path").build(),
    ProcedureParameter.in("stats_cols", StringType).defaultValue("''")
      .comment("comma-separated columns to harvest min/max bounds for")
      .build(),
    ProcedureParameter.in("zorder_by", StringType).defaultValue("''")
      .comment("up to 2 numeric columns to z-order cluster by").build(),
    ProcedureParameter.in("files_per_partition", IntegerType)
      .defaultValue("16").comment("z-order output files per partition")
      .build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val path = str(input, 0)
    def csv(i: Int): Seq[String] =
      str(input, i).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val before = versionOf(path)
    PartitionedLake.compact(spark, path, csv(1), csv(2),
      if (input.isNullAt(3)) 16 else input.getInt(3))
    summary(path, before, versionOf(path))
  }
}

/** `CALL <cat>.system.tag(table, name, version)` —
  * [[PartitionedLake.tag]]: pin a named snapshot ref for
  * `VERSION AS OF '<name>'` time travel and vacuum immortality.
  * `version` defaults to the CURRENT version (tag-what-I-see, the
  * common release-pinning gesture). The summary row reports the pinned
  * version in both version columns (nothing was committed).
  */
private[io] class LakeTagProcedure extends LakeProcedureBase("tag") {
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("lake path").build(),
    ProcedureParameter.in("name", StringType)
      .comment("tag name ([A-Za-z0-9._-], leading alphanumeric)").build(),
    ProcedureParameter.in("version", LongType).defaultValue("-1")
      .comment("snapshot version to pin (default: current)").build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val path = str(input, 0)
    val v =
      if (input.isNullAt(2) || input.getLong(2) < 0L) versionOf(path)
      else input.getLong(2)
    PartitionedLake.tag(spark, path, str(input, 1), v)
    summary(path, v, v)
  }
}

/** `CALL <cat>.system.rollback(table, version | tag)` —
  * [[PartitionedLake.rollback]]: republish a retained snapshot's
  * content as the new head (audited undo — history preserved, zero
  * data jobs). Exactly one of `version` / `tag` names the target.
  */
private[io] class LakeRollbackProcedure
    extends LakeProcedureBase("rollback") {
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("lake path").build(),
    ProcedureParameter.in("version", LongType).defaultValue("-1")
      .comment("snapshot version to restore").build(),
    ProcedureParameter.in("tag", StringType).defaultValue("''")
      .comment("tag naming the snapshot to restore").build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val path = str(input, 0)
    val byVersion =
      if (input.isNullAt(1) || input.getLong(1) < 0L) None
      else Some(input.getLong(1))
    val byTag = Some(str(input, 2)).filter(_.nonEmpty)
    val target = (byVersion, byTag) match {
      case (Some(v), None) => v
      case (None, Some(t)) =>
        PartitionedLake.tagVersion(spark, path, t).getOrElse(sys.error(
          s"CALL rollback: no tag '$t' on $path (tags: " +
            s"${PartitionedLake.tags(spark, path).map(_._1)
              .mkString(", ")})"))
      case _ => sys.error(
        "CALL rollback: name the target with exactly one of " +
          "version => <v> or tag => '<name>'")
    }
    val before = versionOf(path)
    val after = PartitionedLake.rollback(spark, path, target)
    summary(path, before, after)
  }
}

/** `CALL <cat>.system.drop_tag(table, name)` —
  * [[PartitionedLake.dropTag]]: the pinned version becomes reclaimable
  * by the next vacuum (if outside its window).
  */
private[io] class LakeDropTagProcedure
    extends LakeProcedureBase("drop_tag") {
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("lake path").build(),
    ProcedureParameter.in("name", StringType)
      .comment("tag name to drop").build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val path = str(input, 0)
    PartitionedLake.dropTag(spark, path, str(input, 1))
    val v = versionOf(path)
    summary(path, v, v)
  }
}

/** `CALL <cat>.system.branch(table, name, version)` —
  * [[PartitionedLake.createBranch]]: stage a write-audit-publish
  * branch from a main-line snapshot (default: current head). Set
  * `spark.graft.lake.branch = <name>` and every statement routes to
  * the branch; audit, then `publish_branch` or `drop_branch`. The
  * summary row reports the base version in both columns (main's head
  * did not move).
  */
private[io] class LakeBranchProcedure extends LakeProcedureBase("branch") {
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("lake path").build(),
    ProcedureParameter.in("name", StringType)
      .comment("branch name ([A-Za-z0-9._-], leading alphanumeric)")
      .build(),
    ProcedureParameter.in("version", LongType).defaultValue("-1")
      .comment("main-line version to branch from (default: current)")
      .build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val path = str(input, 0)
    val from =
      if (input.isNullAt(2) || input.getLong(2) < 0L) None
      else Some(input.getLong(2))
    val base = PartitionedLake.createBranch(spark, path, str(input, 1),
      from)
    summary(path, base, base)
  }
}

/** `CALL <cat>.system.publish_branch(table, name, drop)` —
  * [[PartitionedLake.publishBranch]]: fast-forward the main line to
  * the branch's staged state (one manifest rename; concurrent
  * main-line commits to untouched partitions merge in, overlaps
  * refuse loudly).
  */
private[io] class LakePublishBranchProcedure
    extends LakeProcedureBase("publish_branch") {
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("lake path").build(),
    ProcedureParameter.in("name", StringType)
      .comment("branch name to publish").build(),
    ProcedureParameter.in("drop", org.apache.spark.sql.types.BooleanType)
      .defaultValue("true")
      .comment("retire the branch namespace after publishing").build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val path = str(input, 0)
    val before = versionOf(path)
    val after = PartitionedLake.publishBranch(spark, path, str(input, 1),
      if (input.isNullAt(2)) true else input.getBoolean(2))
    summary(path, before, after)
  }
}

/** `CALL <cat>.system.drop_branch(table, name)` —
  * [[PartitionedLake.dropBranch]]: abandon a staged branch; its data
  * files become reclaimable by the next vacuum.
  */
private[io] class LakeDropBranchProcedure
    extends LakeProcedureBase("drop_branch") {
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("lake path").build(),
    ProcedureParameter.in("name", StringType)
      .comment("branch name to drop").build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val path = str(input, 0)
    PartitionedLake.dropBranch(spark, path, str(input, 1))
    val v = versionOf(path)
    summary(path, v, v)
  }
}

/** `CALL <cat>.system.rebase_branch(table, name)` —
  * [[PartitionedLake.rebaseBranch]]: re-base a staged branch onto the
  * current main head when main's changes since the branch base are
  * disjoint from the branch's touched directories (overlap refuses
  * with the publish vocabulary). The summary row reports the old base
  * as version_before and the new base as version_after.
  */
private[io] class LakeRebaseBranchProcedure
    extends LakeProcedureBase("rebase_branch") {
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("lake path").build(),
    ProcedureParameter.in("name", StringType)
      .comment("branch name to rebase onto the current main head")
      .build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val path = str(input, 0)
    val name = str(input, 1)
    val before = PartitionedLake.branches(spark, path)
      .collectFirst { case (b, base) if b == name => base }
      .getOrElse(sys.error(s"CALL rebase_branch: no branch '$name' on " +
        s"$path (branches: ${PartitionedLake.branches(spark, path)
          .map(_._1).mkString(", ")})"))
    val after = PartitionedLake.rebaseBranch(spark, path, name)
    summary(path, before, after)
  }
}

/** `CALL <cat>.system.vacuum(table, keep_last, grace_ms)` —
  * [[PartitionedLake.vacuum]]: files superseded by every retained
  * snapshot and manifests outside the window are deleted; recently
  * written files survive `grace_ms` (in-flight commit shield).
  */
private[io] class LakeVacuumProcedure extends LakeProcedureBase("vacuum") {
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("lake path").build(),
    ProcedureParameter.in("keep_last", IntegerType).defaultValue("1")
      .comment("newest versions kept fully readable").build(),
    ProcedureParameter.in("grace_ms", LongType).defaultValue("0")
      .comment("age shield for recently written files").build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val path = str(input, 0)
    val before = versionOf(path)
    PartitionedLake.vacuum(spark, path,
      if (input.isNullAt(1)) 1 else input.getInt(1),
      if (input.isNullAt(2)) 0L else input.getLong(2))
    summary(path, before, versionOf(path))
  }
}
