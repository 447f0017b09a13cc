package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Redistributes a CPU-heavy pipeline's input when the source's natural
  * splits under-parallelize it.
  *
  * Spark parallelizes a file scan by row-group: a table written as a single
  * parquet row-group yields exactly ONE input partition no matter how many
  * cores the cluster has, and every expression evaluated in the scan stage
  * (cell-type parsing, hashing, vector math) runs serially. That is the
  * shape of the harness testdata (one file, one row-group per table) and of
  * any real dataset with oversized row-groups or a few huge gzip'd files.
  *
  * The fix is one hash repartition on the pipeline's key BEFORE the heavy
  * projection: the scan stage then only reads and shuffles raw bytes, and
  * the expensive expressions run with full parallelism above the exchange.
  * Keyed hash partitioning (not round-robin) keeps the exchange
  * deterministic without round-robin's defensive per-partition sort, and
  * downstream aggregations on the same key reuse the partitioning.
  *
  * At 100 TB the guard makes this a no-op: a large table already scans as
  * thousands of splits (`df.rdd.getNumPartitions >= target`), so no extra
  * shuffle is introduced. It only fires on degenerate low-split inputs —
  * exactly when one executor would otherwise do all the work.
  */
object Spread {

  /** `df` hash-partitioned on `key` if its current plan has fewer input
    * partitions than the cluster's default parallelism; `df` unchanged
    * otherwise (including streaming frames, whose partitioning the
    * micro-batch engine owns).
    *
    * `minBytes` gates out inputs too small to amortize an exchange: below
    * ~1 MB the shuffle set-up costs more than the serial compute it saves
    * (measured: spreading a 0.6 MB / 5k-row table regressed every query
    * that touched it, while 2-10 MB tables gained 20-40%). Both thresholds
    * derive from the plan, so the same call sites adapt from laptop SF to
    * a 1000-executor cluster, where large tables scan as thousands of
    * splits and this is a no-op.
    */
  def byKey(df: DataFrame, key: Column,
      minBytes: Long = 1L << 20): DataFrame = {
    if (df.isStreaming) return df
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes < minBytes) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, key)
  }
}
