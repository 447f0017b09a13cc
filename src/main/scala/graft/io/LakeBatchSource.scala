package graft.io

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** `spark.read.format("graft-lake").option("path", lake)` — the BATCH
  * registered form of [[PartitionedLake]], parity with the streaming
  * `graft-lake-cdf` format so non-Scala callers (SQL, PySpark,
  * config-driven jobs) can read a lake without touching the Scala API.
  *
  * Options:
  *  - `path` (required): the lake root.
  *  - `versionAsOf` (optional): time travel to a published snapshot
  *    version ([[PartitionedLake.readVersion]]); default latest.
  *  - `branch` (optional): per-read branch pin, DSv2 parity — the read
  *    (or the changesFrom/changesTo feed) resolves against the
  *    branch's manifest namespace; a conflicting ambient conf refuses;
  *    numeric `versionAsOf` only under a pin (tags are main-line
  *    refs); WRITES refuse the option (stage through the ambient conf).
  *
  * The relation DELEGATES to the manifest-scoped API plan rather than
  * re-implementing the read: `buildScan` applies the engine's required
  * columns and pushed filters onto [[PartitionedLake.read]]'s
  * DataFrame and hands back that plan's InternalRow RDD
  * (`needConversion = false` — the engine consumes it without a
  * per-row conversion). Catalyst then optimizes the INNER plan, so
  * column pruning reaches the parquet scan, partition predicates prune
  * directories, and merge-on-read merging comes along for free —
  * format reads and API reads are the same plan by construction.
  * Filters the translator does not understand are simply not pushed;
  * the engine re-evaluates every filter on top regardless
  * (`unhandledFilters` default), so results stay exact.
  *
  * [[FileRelation]] surfaces the manifest-scoped file list through
  * `DataFrame.inputFiles` — superseded files sharing the partition
  * directories are invisible, same as the API read.
  */
class LakeBatchProvider extends RelationProvider
    with CreatableRelationProvider with StreamSinkProvider
    with DataSourceRegister {
  override def shortName(): String = "graft-lake"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      sys.error("graft-lake requires .option(\"path\", <lake root>)"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    // per-read branch pin — v1 parity with the DSv2 `.option("branch",
    // ...)`: validated and reconciled with the ambient conf here (a
    // conflicting ambient refuses); None keeps the verbatim ambient
    // routing every v1 read always had
    val branchPin = parameters.get("branch").map(_.trim).filter(_.nonEmpty)
    branchPin.foreach(PartitionedLake.requireRefName("branch", _))
    val branch = PartitionedLake.resolveReadBranch(branchPin)
    // BATCH change-data-feed through the registered format — the
    // surface that makes [[PartitionedLake.changesBetween]] reachable
    // from PySpark/SQL (the Scala API and the streaming source each
    // cover one consumer; an ad-hoc Python audit job covers neither):
    //   .option("changesFrom", v1).option("changesTo", v2)
    //   .option("keyCols", "k1,k2")            // row identity (required)
    //   .option("granularity", "commit")       // optional, default net
    if (parameters.contains("changesFrom") ||
        parameters.contains("changesTo")) {
      def need(k: String): String = parameters.getOrElse(k, sys.error(
        s"graft-lake change feed requires .option(\"$k\", ...) " +
          "alongside changesFrom/changesTo"))
      val from = need("changesFrom").toLong
      val to = need("changesTo").toLong
      val keyCols = need("keyCols").split(',').map(_.trim)
        .filter(_.nonEmpty).toSeq
      // same loud vocabulary as the streaming provider's perCommitOf —
      // a typo ('commits', 'per-commit') must not silently flip feed
      // semantics between surfaces; case-insensitive (the
      // pre-validation behavior accepted 'Commit')
      val perCommit = parameters.getOrElse("granularity", "net")
          .toLowerCase(java.util.Locale.ROOT) match {
        case "net" => false
        case "commit" => true
        case other => sys.error(s"graft-lake change feed: granularity " +
          s"must be 'net' (default — one net diff of the version range) " +
          s"or 'commit' (per-version changes tagged _commit_version), " +
          s"got '$other'")
      }
      return new LakeBatchRelation(sqlContext,
        PartitionedLake.changesBetweenOn(spark, path, from, to, keyCols,
          perCommit, branch))
    }
    // numeric or a named tag — the same vocabulary as SQL VERSION AS OF
    val version = parameters.get("versionAsOf").map { v =>
      v.toLongOption
        .orElse {
          // tags are MAIN-LINE refs; a branch pin addresses only the
          // branch's own numeric line (same rule as the DSv2 surface)
          if (branchPin.isDefined) sys.error(
            s"versionAsOf '$v' with a branch pin must be a numeric " +
              "version of the branch's own line — tags are main-line " +
              "refs")
          PartitionedLake.tagVersion(spark, path, v)
        }
        .getOrElse(sys.error(
          s"versionAsOf '$v' is neither a numeric snapshot version nor " +
            s"a tag on $path (tags: ${PartitionedLake.tags(spark, path)
              .map(_._1).mkString(", ")})"))
    }
    // ONE manifest resolve feeds both the pinned frame and the size
    // statistic — resolving twice would pay the driver read again AND
    // open a race where the size describes a different snapshot than
    // the frame pinned (a racing small overwrite could then broadcast
    // the older large scan — the underestimate direction)
    val manifest = PartitionedLake.manifestAt(spark, path, version, branch)
    val frame = manifest match {
      case Some(m) => PartitionedLake.frameFor(spark, path, m)
      case None => spark.read.parquet(path) // pre-protocol lake
    }
    val size = manifest.flatMap(PartitionedLake.metadataSizeBytes)
    new LakeBatchRelation(sqlContext, frame, size)
  }

  /** `df.write.format("graft-lake")` — the registered batch WRITE:
    *
    *  - `partitionCols` (required): comma-separated partition columns
    *    (the v1 source API does not forward `.partitionBy`, so the
    *    layout is an explicit option — same contract as the streaming
    *    sink's).
    *  - `SaveMode.Overwrite` → [[PartitionedLake.write]] (full-snapshot
    *    overwrite through the protocol: old files stay for time travel
    *    until vacuum).
    *  - `SaveMode.Append` → [[PartitionedLake.upsert]], which needs
    *    `keyCol` (row identity within a partition). Append without a
    *    key would be ambiguous under replay, so it is required loudly.
    *  - `statsCols` (optional, comma-separated): min/max harvesting for
    *    manifest file skipping.
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    // the pin is a READ surface (same contract as DSv2): a pinned
    // write would silently diverge from the session's other writes
    parameters.get("branch").map(_.trim).filter(_.nonEmpty).foreach(b =>
      sys.error(s"cannot write to $path via the per-read branch pin " +
        s"'$b': stage branch writes through the ambient conf (SET " +
        s"${PartitionedLake.BranchKey}=$b) instead"))
    def csv(k: String): Seq[String] = parameters.getOrElse(k, "")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val partitionCols = csv("partitionCols")
    require(partitionCols.nonEmpty,
      "graft-lake write requires .option(\"partitionCols\", \"c1,c2\")")
    val statsCols = csv("statsCols")
    mode match {
      case SaveMode.Overwrite =>
        PartitionedLake.write(data, path, partitionCols, statsCols)
      case SaveMode.Append =>
        val key = parameters.getOrElse("keyCol", sys.error(
          "graft-lake append is an upsert and requires " +
            ".option(\"keyCol\", <row identity within a partition>)"))
        PartitionedLake.upsert(spark, path, partitionCols, key, data,
          statsCols, batchId = None, writerId = PartitionedLake.DefaultWriter)
      case SaveMode.ErrorIfExists | SaveMode.Ignore =>
        // existence must be ADOPTION-AWARE, not manifest-only: a
        // pre-protocol Hive-layout parquet dir at this path is an
        // existing lake to every other entry point (upsert adopts it),
        // so ErrorIfExists writing a manifest over it would silently
        // shadow all the old data — the exact outcome the mode exists
        // to prevent
        val root = new org.apache.hadoop.fs.Path(path)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val exists = PartitionedLake.snapshotSchema(spark, path).isDefined ||
          (fs.exists(root) && fs.listStatus(root).nonEmpty)
        if (!exists) PartitionedLake.write(data, path, partitionCols, statsCols)
        else if (mode == SaveMode.ErrorIfExists)
          sys.error(s"graft-lake at $path already exists (SaveMode.ErrorIfExists)")
    }
    createRelation(sqlContext, parameters)
  }

  /** `writeStream.format("graft-lake")` — the registered STREAMING
    * sink (one class serves all three surfaces: a second registered
    * provider could not share the short name): each micro-batch
    * upserts through the snapshot protocol with the batch id armed as
    * the TRANSACTION-level replay guard, so a redelivered epoch is
    * skipped whole (exactly-once at the transaction level, the same
    * guarantee the hand-rolled `foreachBatch` +
    * [[PartitionedLake.upsert]] pattern gives, now available to
    * config-driven pipelines). Options: `path`, `partitionCols`,
    * `keyCol` (all required), `statsCols`, and `writerId` (default
    * "default") — name it per query when several streams share a lake
    * so one stream's watermark never swallows another's batches.
    */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode):
      org.apache.spark.sql.execution.streaming.Sink = {
    val path = parameters.getOrElse("path",
      sys.error("graft-lake sink requires .option(\"path\", <lake root>)"))
    // the engine forwards `.partitionBy(...)` here — honor it, and
    // refuse a CONFLICTING explicit option loudly (silently preferring
    // one would give the stream a different physical layout than it
    // declared)
    val optionCols = parameters.getOrElse("partitionCols", "")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    require(optionCols.isEmpty || partitionColumns.isEmpty ||
      optionCols == partitionColumns,
      s"graft-lake sink: .partitionBy(${partitionColumns.mkString(",")}) " +
        s"conflicts with .option(\"partitionCols\", " +
        s"\"${optionCols.mkString(",")}\")")
    val partitionCols =
      if (optionCols.nonEmpty) optionCols else partitionColumns
    require(partitionCols.nonEmpty,
      "graft-lake sink requires .partitionBy(...) or " +
        ".option(\"partitionCols\", \"c1,c2\")")
    val key = parameters.getOrElse("keyCol", sys.error(
      "graft-lake sink requires .option(\"keyCol\", <row identity>)"))
    val statsCols = parameters.getOrElse("statsCols", "")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val writerId = parameters.getOrElse("writerId",
      PartitionedLake.DefaultWriter)
    new org.apache.spark.sql.execution.streaming.Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        // the incoming frame carries the engine's streaming-tagged
        // incremental plan, which refuses batch actions — re-wrap its
        // InternalRow RDD as a BATCH frame (the derived-source seam,
        // in reverse). The epoch's plan reads FIXED offsets, so the
        // multiple evaluations upsert performs (partition collect,
        // merge, stage) are deterministic — the upsert scaladoc's
        // foreachBatch contract, satisfied by construction.
        val spark = data.sparkSession
        val batchDf = graft.SparkShims.internalCreateDataFrame(spark,
          data.queryExecution.toRdd, data.schema, isStreaming = false)
        PartitionedLake.upsert(spark, path, partitionCols, key, batchDf,
          statsCols, batchId = Some(batchId), writerId = writerId)
      }
    }
  }
}

private[io] class LakeBatchRelation(override val sqlContext: SQLContext,
    frame: DataFrame, sizeHint: Option[Long] = None)
    extends BaseRelation with PrunedFilteredScan
    with org.apache.spark.sql.execution.FileRelation {

  override def schema: StructType = frame.schema

  /** Exact manifest byte size when known; the conservative "unknown =
    * defaultSizeInBytes (huge)" otherwise — never an underestimate.
    */
  override def sizeInBytes: Long = sizeHint.getOrElse(super.sizeInBytes)

  // the delegated plan already produces InternalRows; re-wrapping them
  // as external Rows would pay a full conversion per row for nothing
  override def needConversion: Boolean = false

  override def inputFiles: Array[String] = frame.inputFiles

  /** Pushed filters reach the inner plan through the shared
    * [[LakeFilters]] translator (one translator across the v1 and DSv2
    * surfaces) — partition predicates here are what makes directory
    * pruning reach the manifest-scoped scan. Untranslatable shapes are
    * simply not pushed; the engine re-evaluates every filter on top.
    */
  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    // filter BEFORE pruning: today requiredColumns always includes
    // filter references (unhandledFilters defaults to "all", so the
    // engine keeps them post-scan), but a future unhandledFilters
    // override would silently break select-then-filter — same ordering
    // fix as the DSv2 fallback
    val filtered = filters.flatMap(LakeFilters.toColumn)
      .reduceOption(_ && _).map(frame.filter).getOrElse(frame)
    val pruned = filtered.select(requiredColumns.map(col).toIndexedSeq: _*)
    pruned.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}
