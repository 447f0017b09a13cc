package graft.io

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** `df.writeStream.format("graft-lake-v2")` — the NATIVE DSv2
  * streaming sink: every micro-batch commits exactly-once through the
  * same snapshot protocol as batch writes, so stream-written versions
  * time-travel, feed the `graft-lake-cdf` change feed, tag, and
  * vacuum like any other commit. (The v1 `graft-lake` sink remains;
  * this is the DSv2 table's own write path, so catalog tables and
  * `writeStream.toTable` work too, from any language binding.)
  *
  * Exactly-once is the lake's per-writer TRANSACTION guard: each
  * epoch commits with `batchId = epochId` charged to `writerId`
  * (default: the streaming query's checkpoint-stable id), so a
  * kill-and-restart replaying the last epoch is skipped WHOLE at the
  * manifest — not deduped row-by-row. Within an epoch, task retries
  * are excluded by the commit-message protocol: tasks stream rows
  * into per-attempt parquet files under a private epoch staging dir,
  * the driver folds ONLY files reported by committed attempts, and
  * aborted attempts delete their files (same shape as
  * [[LakeDeltaOpsWriter]]).
  *
  * Modes, chosen by the query's output mode + options:
  *  - `keyCol` option present → per-epoch keyed UPSERT
  *    ([[PartitionedLake.upsert]]) — the right shape for Update-mode
  *    aggregates and CDC-style streams (the builder accepts Update
  *    mode via `SupportsStreamingUpdateAsAppend`: with a key, update
  *    rows ARE upserts);
  *  - no `keyCol` → per-epoch APPEND ([[PartitionedLake.append]]) —
  *    Append-mode fact streams; duplicate rows are the stream's own
  *    semantics, epochs never double-apply;
  *  - Complete mode (the engine calls `truncate()`) → per-epoch full
  *    snapshot overwrite ([[PartitionedLake.write]]).
  *
  * Scale shape: tasks write once into staging (flat files, partition
  * values as ordinary columns), and the commit re-reads ONLY this
  * epoch's staged bytes to route them through the partitioned commit
  * — O(epoch) extra I/O, never O(table), the price of reusing one
  * battle-tested commit protocol (conflict rebase, schema evolution
  * gates, MOR interplay, manifest sharding) instead of duplicating it.
  */
private[io] class LakeStreamingWrite(path: String,
    partitionCols: Seq[String], keyCol: Option[String],
    statsCols: Seq[String], writerId: String, writeSchema: StructType,
    complete: Boolean) extends StreamingWrite {

  require(partitionCols.forall(writeSchema.fieldNames.contains),
    s"graft-lake-v2 streaming write: the stream's schema " +
      s"(${writeSchema.fieldNames.mkString(", ")}) must carry every " +
      s"partition column (${partitionCols.mkString(", ")})")
  keyCol.foreach(k => require(writeSchema.fieldNames.contains(k),
    s"graft-lake-v2 streaming write: keyCol '$k' is not a column of " +
      s"the stream (${writeSchema.fieldNames.mkString(", ")})"))

  private val stagingRoot =
    new Path(path, s"_staging/stream-${UUID.randomUUID().toString.take(8)}")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val spark = SparkSession.active
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val owf = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, writeSchema)
    new LakeStreamingWriterFactory(stagingRoot.toString, writeSchema,
      owf, new SerializableConfiguration(job.getConfiguration))
  }

  private def epochDir(epochId: Long) = new Path(stagingRoot, s"ep$epochId")

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fs = stagingRoot.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val files = messages.collect {
      case m: LakeStreamTaskResult => m.files
    }.flatten.toSeq
    // an empty epoch publishes nothing (no version churn) — the
    // replay guard does not need to see it either: replaying an
    // empty epoch re-publishes nothing
    if (files.isEmpty) { cleanEpoch(fs, epochId); return }
    val df = spark.read.schema(writeSchema).parquet(
      files.map(f => new Path(epochDir(epochId), f).toString): _*)
    try {
      if (complete)
        PartitionedLake.write(df, path, partitionCols, statsCols,
          batchId = Some(epochId), writerId = writerId)
      else keyCol match {
        case Some(k) =>
          PartitionedLake.upsert(spark, path, partitionCols, k, df,
            statsCols, batchId = Some(epochId), writerId = writerId)
        case None =>
          PartitionedLake.append(df, path, partitionCols, statsCols,
            batchId = Some(epochId), writerId = writerId)
      }
    } catch { case t: Throwable =>
      // a commit that THROWS — a schema-evolution/governor refusal, or
      // commitStaged exhausting rebase attempts under a writer storm —
      // must not discard completed task output: the engine follows a
      // failed commit with abort(), whose job is cleaning PARTIAL
      // output, so mark the epoch and have abort() skip it. The staged
      // rows remain on disk for forensics and manual batch-commit
      // recovery (the whole epoch, one parquet read away — what a
      // NON-REPLAYABLE source would otherwise lose outright); a
      // restarted query re-stages under a fresh root and vacuum's
      // standard _staging sweep reclaims the debris.
      commitFailedEpochs.add(epochId)
      throw t
    }
    // staging is deleted only AFTER a successful lake commit
    cleanEpoch(fs, epochId)
  }

  private val commitFailedEpochs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()

  private def cleanEpoch(fs: org.apache.hadoop.fs.FileSystem,
      epochId: Long): Unit = {
    fs.delete(epochDir(epochId), true)
    sweepRootIfEmpty(fs)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    // a failed COMMIT retains its staged files (see commit()); a task-
    // level failure before commit has only partial output — clean it
    if (commitFailedEpochs.contains(epochId)) return
    val fs = stagingRoot.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    fs.delete(epochDir(epochId), true)
    sweepRootIfEmpty(fs)
  }

  // the per-write staging root should not outlive the stream as empty
  // debris; non-recursive delete refuses a non-empty dir (a racing
  // epoch's files survive), and vacuum reclaims anything left behind
  private def sweepRootIfEmpty(
      fs: org.apache.hadoop.fs.FileSystem): Unit =
    try {
      if (fs.exists(stagingRoot) && fs.listStatus(stagingRoot).isEmpty)
        fs.delete(stagingRoot, false)
    } catch { case _: java.io.IOException => () }
}

/** A committed attempt's receipt: the staged file name(s) it wrote
  * (within its epoch's staging dir). The driver folds only these.
  */
private[io] case class LakeStreamTaskResult(files: Seq[String])
  extends WriterCommitMessage

private[io] class LakeStreamingWriterFactory(stagingRoot: String,
    schema: StructType, owf: OutputWriterFactory,
    conf: SerializableConfiguration) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new LakeStreamTaskWriter(
      new Path(stagingRoot, s"ep$epochId").toString, schema, owf, conf,
      partitionId, taskId)
}

/** One task attempt's flat parquet file of this epoch's rows
  * (partition values ride as ordinary columns; the driver commit
  * produces the partitioned layout). The attempt id is part of the
  * file name, so retried attempts never collide and the driver can
  * fold exactly the committed ones.
  */
private[io] class LakeStreamTaskWriter(epochDir: String,
    schema: StructType, owf: OutputWriterFactory,
    conf: SerializableConfiguration, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val taskContext = new TaskAttemptContextImpl(conf.value,
    new TaskAttemptID(new TaskID(new org.apache.hadoop.mapreduce.JobID(
      "graft-stream", 0), TaskType.MAP, partitionId), taskId.toInt))

  private var writer: OutputWriter = _
  private var fileName: String = _

  override def write(row: InternalRow): Unit = {
    if (writer == null) {
      fileName = f"rows-$partitionId%05d-$taskId" +
        owf.getFileExtension(taskContext)
      writer = owf.newInstance(new Path(epochDir, fileName).toString,
        schema, taskContext)
    }
    writer.write(row)
  }

  private def closeCurrent(): Unit =
    if (writer != null) { writer.close(); writer = null }

  override def commit(): WriterCommitMessage = {
    closeCurrent()
    LakeStreamTaskResult(Option(fileName).toSeq)
  }

  override def abort(): Unit = {
    closeCurrent()
    if (fileName != null) {
      val p = new Path(epochDir, fileName)
      try p.getFileSystem(conf.value).delete(p, false)
      catch { case _: java.io.IOException => () } // best-effort
      fileName = null
    }
  }

  override def close(): Unit = closeCurrent()
}
