package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Partitioned-lake layout helpers: Hive-style partition directories give
  * partition *pruning* — a predicate on the partition column never touches
  * the other directories' files at all. At 100 TB this is the first-order
  * scan optimization (before pushdown, before codegen): the bytes are never
  * read.
  */
object PartitionedLake {

  /** Write `df` partitioned by `partitionCol` (Hive-style directories). */
  def write(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** SCD-type-1 upsert — MERGE where the row identity is the COMPOSITE
    * `(partitionCol, keyCol)`: within each partition the delta wins by
    * key, everything else is kept — rewriting ONLY the partitions the
    * delta touches:
    *
    *  1. the delta's distinct partition values are collected — this is
    *     metadata cardinality (partition count, not row count), the one
    *     sanctioned driver-side read;
    *  2. the base is read with an `isin` filter on those values, so
    *     partition pruning keeps every untouched directory's bytes
    *     unread;
    *  3. surviving base rows (left anti on the key) union the delta and
    *     are written back in dynamic partition-overwrite mode, which
    *     replaces exactly the touched directories and leaves all other
    *     partitions' files byte-identical on disk.
    *
    * At 100 TB the rewrite cost scales with the delta's partition
    * footprint, not the table size — the pattern table formats (Delta,
    * Iceberg, Hudi) implement with manifests; plain parquet gets it via
    * directory layout.
    *
    * CONTRACT: a key's partition value must be stable (the usual case —
    * the partition derives from the row's identity, e.g. event date).
    * A delta that MOVES a key to a different partition upserts into the
    * new partition but cannot retire the old partition's row — finding
    * it would need a full-table key scan, which is exactly the cost
    * manifest-based formats exist to avoid. Callers needing
    * cross-partition moves must delete from the old partition
    * explicitly. The merged frame is `localCheckpoint`ed before
    * the write because Spark (correctly) refuses a plan that overwrites
    * a path it is still reading lazily; at cluster scale use a
    * checkpoint directory or a staging path + atomic swap instead.
    */
  /** Partition-pruning filter over the collected partition values.
    * `isin` is null-hostile (NULL isin(...) is never true), so a delta
    * touching the null partition (__HIVE_DEFAULT_PARTITION__) needs an
    * explicit isNull arm — otherwise surviving base rows in that
    * directory are excluded from the merge and dynamic overwrite
    * replaces it with delta-only rows, silently dropping data.
    */
  private def partitionFilter(partitionCol: String,
      parts: Array[Any]): org.apache.spark.sql.Column = {
    val (nullParts, realParts) = parts.partition(_ == null)
    if (nullParts.isEmpty) col(partitionCol).isin(realParts: _*)
    else if (realParts.isEmpty) col(partitionCol).isNull
    else col(partitionCol).isin(realParts: _*) || col(partitionCol).isNull
  }

  def upsert(spark: SparkSession, path: String, partitionCol: String,
      keyCol: String, delta: DataFrame): Unit = {
    // bootstrap: an absent lake is just the delta (lets the same call
    // serve as a streaming foreachBatch sink from batch zero)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) {
      delta.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
      return
    }
    val parts = delta.select(partitionCol).distinct().collect().map(_.get(0))
    val base = read(spark, path).filter(partitionFilter(partitionCol, parts))
    // null-safe on the partition column (the identity's partition half
    // may legitimately be the null partition); keys are assumed non-null
    val dk = delta.select(col(partitionCol).as("__dp"), col(keyCol).as("__dk"))
    val merged = base
      .join(dk, col(partitionCol) <=> col("__dp") &&
        col(keyCol) === col("__dk"), "left_anti")
      .unionByName(delta.select(base.columns.map(col): _*))
      .localCheckpoint(true)
    merged.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
  }

  /** Exactly-once streaming CDC sink: fold one micro-batch of a CDC op
    * log into the lake — `foreachBatch(PartitionedLake.cdcSink(spark,
    * path, part, key, value, _))` is the whole Debezium-consumer loop.
    *
    * `ops` carries [[graft.operators.RelationalOps.cdcApply]]'s columns
    * (`k`, `seq`, `op`, `val`) plus the key's `partitionCol` value. Per
    * batch: prune the base to the touched partitions (same metadata-only
    * driver read as [[upsert]]), fold the ops with `cdcApply`
    * (latest-wins per key, 'D' drops, 'U' overwrites), and write the
    * corrected slice back via dynamic partition overwrite.
    *
    * NOT [[upsert]], deliberately: upsert's key-anti-join MERGE can only
    * add or replace rows, so a delete op could never retire its row — a
    * delete-capable CDC fold must rewrite the touched partitions
    * wholesale. A partition whose rows are ALL deleted writes no files
    * under dynamic overwrite (which only replaces directories it writes
    * into), so emptied directories are removed explicitly — both sides
    * of that decision are partition-count metadata, not row data.
    *
    * Idempotent under micro-batch replay (the foreachBatch redelivery
    * contract): 'U' re-applies to the same value, a replayed 'D' finds
    * no row, and within one batch `cdcApply`'s latest-wins collapse
    * orders replayed ops by `seq`. Same key-partition stability contract
    * as [[upsert]].
    */
  def cdcSink(spark: SparkSession, path: String, partitionCol: String,
      keyCol: String, valueCol: String, ops: DataFrame): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // absent lake: update/delete ops have nothing to apply to (cdcApply
    // is update/delete-on-existing; q131's SCD-2 merge covers inserts)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) return
    val parts = ops.select(partitionCol).distinct().collect().map(_.get(0))
    if (parts.isEmpty) return // empty micro-batch
    val base = read(spark, path).filter(partitionFilter(partitionCol, parts))
    val corrected = graft.operators.RelationalOps
      .cdcApply(base, ops.select("k", "seq", "op", "val"), keyCol, valueCol)
      .localCheckpoint(true)
    corrected.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
    // retire directories the fold emptied (dynamic overwrite never
    // touches a partition it writes zero rows into)
    val survivors = corrected.select(partitionCol).distinct()
      .collect().map(_.get(0)).toSet
    parts.filterNot(survivors).foreach { v =>
      val dirName =
        if (v == null) s"$partitionCol=__HIVE_DEFAULT_PARTITION__"
        else s"$partitionCol=$v"
      fs.delete(new org.apache.hadoop.fs.Path(path, dirName), true)
    }
  }
}
