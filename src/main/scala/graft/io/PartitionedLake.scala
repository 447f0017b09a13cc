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
    // `isin` is null-hostile (NULL isin(...) is never true), so a delta
    // touching the null partition (__HIVE_DEFAULT_PARTITION__) needs an
    // explicit isNull arm — otherwise surviving base rows in that
    // directory are excluded from the merge and dynamic overwrite
    // replaces it with delta-only rows, silently dropping data.
    val (nullParts, realParts) = parts.partition(_ == null)
    val partFilter =
      if (nullParts.isEmpty) col(partitionCol).isin(realParts: _*)
      else if (realParts.isEmpty) col(partitionCol).isNull
      else col(partitionCol).isin(realParts: _*) || col(partitionCol).isNull
    val base = read(spark, path).filter(partFilter)
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
}
