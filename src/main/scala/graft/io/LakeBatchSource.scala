package graft.io

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext}
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
class LakeBatchProvider extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-lake"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path",
      sys.error("graft-lake requires .option(\"path\", <lake root>)"))
    val frame = parameters.get("versionAsOf") match {
      case Some(v) => PartitionedLake.readVersion(spark, path, v.toLong)
      case None => PartitionedLake.read(spark, path)
    }
    new LakeBatchRelation(sqlContext, frame)
  }
}

private[io] class LakeBatchRelation(override val sqlContext: SQLContext,
    frame: DataFrame) extends BaseRelation with PrunedFilteredScan
    with org.apache.spark.sql.execution.FileRelation {

  override def schema: StructType = frame.schema

  // the delegated plan already produces InternalRows; re-wrapping them
  // as external Rows would pay a full conversion per row for nothing
  override def needConversion: Boolean = false

  override def inputFiles: Array[String] = frame.inputFiles

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val pruned = frame.select(requiredColumns.map(col).toIndexedSeq: _*)
    val filtered = filters.flatMap(toColumn)
      .reduceOption(_ && _).map(pruned.filter).getOrElse(pruned)
    filtered.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }

  /** The pushed-filter subset the inner plan can express as Columns —
    * partition predicates here are what makes directory pruning reach
    * the manifest-scoped scan. Unknown filter shapes return None and
    * are evaluated by the engine on top (exactness is never at stake).
    */
  private def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === v)
    case EqualNullSafe(a, v) => Some(col(a) <=> v)
    case GreaterThan(a, v) => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v) => Some(col(a) < v)
    case LessThanOrEqual(a, v) => Some(col(a) <= v)
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case Or(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case Not(c) => toColumn(c).map(!_)
    case _ => None
  }
}
