package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
