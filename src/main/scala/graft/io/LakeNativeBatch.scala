package graft.io

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.util.CaseInsensitiveMap
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetOptions
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** The NATIVE DataSource-V2 batch for a copy-on-write lake snapshot —
  * the scan that closes the one scale-killer gap the `V1Scan` shim
  * left open: DYNAMIC partition pruning. The shim delegates to a
  * derived DataFrame plan, which gives the engine no
  * `SupportsRuntimeFiltering` seam, so the classic star shape
  * (`fact JOIN dim ON fact.day = dim.day WHERE dim.flag`) scanned
  * every fact partition. Here the manifest's directory list IS the
  * partition index: the engine hands the join's runtime keys to
  * [[filter]], which re-scopes the directory list through the same
  * exact three-valued evaluator static claimed filters use
  * ([[LakeFilters.compile]]), and only the surviving directories'
  * files are planned.
  *
  * Eligibility (gated in [[LakeScanBuilder.build]]): a manifest-backed
  * snapshot with NO live merge-on-read deltas and byte lengths for
  * every file (post-adoption commits always have them). Everything
  * else — MOR merge plans, pre-protocol paths, adopted legacy files —
  * keeps the V1 fallback, whose delegated plan already handles those
  * shapes; this scan never degrades correctness, only routes around.
  *
  * The physical read is Spark's OWN DSv2 parquet machinery
  * ([[ParquetPartitionReaderFactory]]): vectorized/columnar batches,
  * row-group skipping from pushed data filters, by-name column
  * resolution (additive schema evolution reads old files with typed
  * nulls), datetime rebase handling — not a re-implementation. This
  * scan contributes exactly what Spark's file index cannot know: the
  * manifest-scoped live-file list, its exact statistics, and the
  * directory-level claim/prune semantics.
  *
  * Scale shape: files are sliced at the engine's own
  * `maxSplitBytes` (so one oversized compacted file still spreads
  * across the cluster) and bin-packed with
  * [[FilePartition.getFilePartitions]] (so 50k small files do not
  * become 50k tasks). Claimed filters prune directories BEFORE
  * planning; statistics are the exact post-claim manifest sums, which
  * keeps broadcast decisions sound after a selective partition
  * predicate.
  *
  * Reference behavior covered: the all-submissions scan fans out per
  * prefix (reference: file_submission_processor.py's per-key listing
  * loop) — here one pruned distributed scan.
  */
private[io] class LakeNativeBatchScan(
    path: String,
    version: Option[Long],
    m: PartitionedLake.Manifest,
    fullSchema: StructType,
    required: StructType,
    claimed: Array[Filter],
    residual: Array[Filter])
  extends Scan with Batch with SupportsRuntimeFiltering
  with SupportsReportStatistics {

  private val partCols: Seq[String] = PartitionedLake.partitionColsOf(m)
  private def dtOf(c: String): Option[org.apache.spark.sql.types.DataType] =
    fullSchema.fields.find(_.name == c).map(_.dataType)

  // required's data columns in THEIR order, partition columns in
  // LAYOUT order appended — the readDataSchema ++ partitionSchema shape
  // Spark's own file sources emit (the engine re-projects by name)
  private val readDataSchema: StructType = StructType(
    required.fields.filterNot(f => partCols.contains(f.name)))
  private val readPartCols: Seq[String] =
    partCols.filter(c => required.fieldNames.contains(c))
  private val readPartSchema: StructType =
    StructType(readPartCols.map(c => fullSchema(c)))

  override def readSchema(): StructType =
    StructType(readDataSchema.fields ++ readPartSchema.fields)

  override def toBatch: Batch = this

  private val parser = new LakeDirValues(partCols, fullSchema)

  /** Directories surviving the STATIC claimed filters — resolved once;
    * exactly the rows-with-these-partition-values the engine dropped
    * its own copy of the predicate for.
    */
  private val staticDirs: Seq[String] = {
    val preds = claimed.toSeq.map(f => LakeFilters.compile(f, dtOf).get)
    m.files.keys.toSeq.sorted
      .filter(d => preds.forall(_(c => parser.valueOf(d, c)).contains(true)))
  }

  // runtime (join-driven) predicates land here; pruning-only, so a
  // shape the evaluator cannot compile is simply ignored (the join
  // itself enforces the semantics — DPP never carries correctness)
  @volatile private var runtimePreds
      : Seq[(String => Any) => Option[Boolean]] = Nil

  // only the partition columns PRESENT IN THE SCAN OUTPUT: the engine
  // resolves these against the relation's (pruned) attributes, and a
  // pruned-out column would fail analysis ("Unable to resolve ...") —
  // no DPP opportunity is lost, because a join key is always read
  override def filterAttributes(): Array[NamedReference] =
    readPartCols.map(c => Expressions.column(c)).toArray

  override def filter(filters: Array[Filter]): Unit = {
    runtimePreds = filters.toSeq
      .filter(_.references.forall(partCols.contains))
      .flatMap(f => LakeFilters.compile(f, dtOf))
  }

  private def keptDirs: Seq[String] =
    if (runtimePreds.isEmpty) staticDirs
    else staticDirs.filter(d =>
      runtimePreds.forall(_(c => parser.valueOf(d, c)).contains(true)))

  /** The file paths this scan would open right now (post static AND
    * runtime pruning) — the observable q153/spec assertions pin.
    */
  private[io] def plannedFiles: Seq[String] = keptDirs.flatMap(d =>
    m.files(d).map(e => s"$path/$d/${e.name}"))
  private[io] def staticFileCount: Int =
    staticDirs.map(m.files(_).size).sum

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val perDir = keptDirs.map { d =>
      (parser.rowOf(d, readPartCols), d, m.files(d))
    }
    val totalBytes = perDir.iterator
      .flatMap(_._3.iterator.map(_.bytes.get)).sum
    val maxSplit = FilePartition.maxSplitBytes(spark, totalBytes)
    val slices = perDir.flatMap { case (values, d, entries) =>
      entries.flatMap { e =>
        val len = e.bytes.get
        val sp = SparkPath.fromPathString(s"$path/$d/${e.name}")
        (0L until math.max(len, 1L) by maxSplit).map { start =>
          PartitionedFile(values, sp, start,
            math.min(maxSplit, len - start), Array.empty, 0L, len, Map.empty)
        }
      }
    }
    FilePartition.getFilePartitions(spark,
      slices.sortBy(-_.length), maxSplit).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    // the SESSION-derived Hadoop conf (carries every SQL conf the
    // readers honor — session timezone, case sensitivity, parquet
    // flags), plus the parquet read-support wiring Spark's own
    // ParquetScan sets before broadcasting: the reader class and the
    // requested/row Catalyst schemas (without these the record reader
    // NPEs resolving its ReadSupport)
    val conf = spark.sessionState.newHadoopConf()
    conf.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport].getName)
    conf.set(
      org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport
        .SPARK_ROW_REQUESTED_SCHEMA, readDataSchema.json)
    org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
      .setSchema(readDataSchema, conf)
    // the parquet flag set ParquetScan pins as EXPLICIT booleans (the
    // schema converter reads them back with .toBoolean, so they cannot
    // be left to SQL-conf passthrough defaults)
    val sq = spark.sessionState.conf
    import org.apache.spark.sql.internal.SQLConf
    conf.setBoolean(SQLConf.PARQUET_BINARY_AS_STRING.key,
      sq.isParquetBinaryAsString)
    conf.setBoolean(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key,
      sq.isParquetINT96AsTimestamp)
    conf.setBoolean(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key,
      sq.legacyParquetNanosAsLong)
    conf.setBoolean(SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key,
      sq.parquetFieldIdReadEnabled)
    conf.setBoolean(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key,
      sq.parquetInferTimestampNTZEnabled)
    conf.setBoolean(SQLConf.NESTED_SCHEMA_PRUNING_ENABLED.key,
      sq.nestedSchemaPruningEnabled)
    conf.setBoolean(SQLConf.CASE_SENSITIVE.key, sq.caseSensitiveAnalysis)
    conf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key, sq.sessionLocalTimeZone)
    val bc = spark.sparkContext.broadcast(new SerializableConfiguration(conf))
    val dataSchema = StructType(
      fullSchema.fields.filterNot(f => partCols.contains(f.name)))
    // residual data-column filters reach the parquet reader for
    // row-group/page skipping; the engine re-evaluates them on top
    // regardless (they were returned from pushFilters), so the skip is
    // pure performance
    val pushable = residual.filter(
      _.references.forall(r => dataSchema.fieldNames.contains(r)))
    ParquetPartitionReaderFactory(spark.sessionState.conf, bc, dataSchema,
      readDataSchema, readPartSchema, pushable, None,
      new ParquetOptions(CaseInsensitiveMap(Map.empty[String, String]),
        spark.sessionState.conf))
  }

  /** EXACT post-claim manifest sums — after a selective partition
    * predicate the pruned side's size is what broadcast planning needs
    * (the whole-snapshot number would block broadcasts the claim just
    * earned). Row counts degrade to unknown if any kept file predates
    * footer harvesting; byte sums cannot (eligibility requires them).
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val entries = staticDirs.flatMap(m.files(_))
    val rows = if (entries.forall(_.rows.isDefined))
      Some(entries.iterator.map(_.rows.get).sum) else None
    new LakeStatistics(Some(entries.iterator.map(_.bytes.get).sum), rows)
  }

  override def description(): String = {
    val v = version.map(v => s"@v$v").getOrElse("")
    val c = if (claimed.isEmpty) ""
      else s" claimed: ${claimed.mkString(" AND ")}"
    s"GraftLakeNativeScan($path$v, ${staticDirs.size} dirs$c)"
  }
}
