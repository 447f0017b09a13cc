package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.execution.datasources.v2.FileTable

/** Redistributes a CPU-heavy pipeline's input when the source's natural
  * splits under-parallelize it.
  *
  * Spark parallelizes a file scan by split: a table written as a single
  * small parquet file yields a handful of input partitions no matter how
  * many cores the cluster has, and every expression evaluated in the scan
  * stage (cell-type parsing, hashing, vector math) runs nearly serially.
  * That is the shape of the harness testdata (one file, one row-group per
  * table) and of any real dataset with oversized row-groups or a few huge
  * gzip'd files.
  *
  * The fix is one hash repartition on the pipeline's key BEFORE the heavy
  * projection: the scan stage then only reads and shuffles raw bytes, and
  * the expensive expressions run with full parallelism above the exchange.
  * Keyed hash partitioning (not round-robin) keeps the exchange
  * deterministic without round-robin's defensive per-partition sort, and
  * downstream aggregations on the same key reuse the partitioning.
  *
  * At 100 TB the guard makes this a no-op: a large table scans as
  * thousands of splits, so no extra shuffle is introduced. It only fires
  * on degenerate low-split inputs — exactly when one executor would
  * otherwise do all the work.
  */
object Spread {

  /** `df` hash-partitioned on `key` if its scan would produce fewer input
    * splits than the cluster's default parallelism; `df` unchanged
    * otherwise (including streaming frames, whose partitioning the
    * micro-batch engine owns).
    *
    * Both gates are derived purely from SCAN METADATA — the file index's
    * byte size and the session's split-size config — on the already-built
    * analyzed plan. Query construction therefore never triggers
    * optimization, physical planning, or (the AQE foot-gun) `.rdd`, which
    * on a plan containing an exchange eagerly EXECUTES the upstream shuffle
    * stages at build time. [[graft.SpreadSpec]] asserts zero Spark jobs run
    * during construction.
    *
    * Decision table, in order:
    *  - streaming input → unchanged (micro-batch engine owns partitioning);
    *  - plan already contains a `RepartitionByExpression` → unchanged: any
    *    prior keyed repartition already broke the scan-stage serialization
    *    this operator exists to fix, and a second exchange would double
    *    shuffle work (the round-3 double-spread in rule evaluation);
    *  - no file-backed relation in the plan (in-memory test frames,
    *    literals) → unchanged: such inputs are small by construction here;
    *  - total file bytes < `minBytes` → unchanged: below ~1 MB the shuffle
    *    set-up costs more than the serial compute it saves (measured:
    *    spreading a 0.6 MB / 5k-row table regressed every query that
    *    touched it, while 2-10 MB tables gained 20-40%);
    *  - estimated scan splits >= default parallelism → unchanged (the
    *    100 TB no-op path);
    *  - otherwise → one hash repartition on `key` to default parallelism.
    *
    * The split estimate mirrors `FilePartition.maxSplitBytes`: splits ≈
    * bytes / min(maxPartitionBytes, max(openCostInBytes, bytes/cores)).
    * It intentionally ignores per-file boundaries — many small files
    * produce MORE splits than the estimate, never fewer, so the gate can
    * only err toward spreading, and only on inputs small enough that the
    * extra exchange is cheap.
    *
    * Call this directly above a scan (optionally with narrow maps/filters
    * between). The size gate reads the UNFILTERED file size, so apply it
    * to the large corpus side of a pipeline, not to a selectively-filtered
    * side — filters placed upstream of the returned frame are pushed below
    * the exchange by Catalyst and would pay a pointless (if tiny) shuffle.
    */
  /** `workFactor` scales the size gate for consumers whose per-row work
    * is MULTIPLIED downstream of the scan (an explode emitting ~N
    * output rows per input row, a transform materializing N-grams):
    * the minBytes gate exists because a shuffle costs more than the
    * serial compute it saves on a SMALL job, and for such consumers the
    * job is `bytes * workFactor`, not `bytes` (round 18: q106's
    * adjacent-pair explode over the 0.6 MB documents table ran serially
    * under the plain gate and measured 2.7 s; spread it runs 0.66 s).
    * The split-count no-op path is unchanged — at scale the scan
    * already yields >= parallelism splits and the factor is irrelevant.
    */
  def byKey(df: DataFrame, key: Column,
      minBytes: Long = 1L << 20, workFactor: Double = 1.0): DataFrame = {
    if (df.isStreaming) return df
    val plan = df.queryExecution.analyzed // analysis already done eagerly
    val alreadyKeyed = plan.exists {
      case _: RepartitionByExpression => true
      case _ => false
    }
    if (alreadyKeyed) return df
    // byte sizes per file-backed relation, DataSource v1 AND v2: parquet
    // resolves through v1 (LogicalRelation/HadoopFsRelation) under the
    // default useV1SourceList, but a session that enables the v2 reader
    // surfaces the same scan as DataSourceV2Relation over a FileTable —
    // both carry the file index, so the gate fires identically (asserted
    // in SpreadSpec under useV1SourceList=""). Non-file v2 tables (JDBC,
    // streaming tables) are intentionally not matched: their split count
    // is the connector's business, not the file-split heuristic's.
    val sizes = plan.collect {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        lr.relation.asInstanceOf[HadoopFsRelation].location.sizeInBytes
      case r: DataSourceV2Relation if r.table.isInstanceOf[FileTable] =>
        r.table.asInstanceOf[FileTable].fileIndex.sizeInBytes
    }
    if (sizes.isEmpty) return df
    val bytes = sizes.sum
    if (bytes * workFactor < minBytes) return df
    val sess = df.sparkSession
    val target = sess.sparkContext.defaultParallelism
    def bytesConf(k: String, dflt: String): Long =
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        sess.conf.get(k, dflt))
    val maxSplit = math.min(
      bytesConf("spark.sql.files.maxPartitionBytes", "128MB"),
      math.max(bytesConf("spark.sql.files.openCostInBytes", "4MB"),
        bytes / math.max(1, target)))
    val estSplits = math.ceil(bytes.toDouble / math.max(1L, maxSplit)).toLong
    if (estSplits >= target) df
    else df.repartition(target, key)
  }
}
