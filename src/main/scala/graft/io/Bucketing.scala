package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: co-locate both sides of a recurring join so the
  * join needs NO exchange — the 100 TB answer to "this join shuffles every
  * run". Bucketed layout is decided once at write time; every subsequent
  * join/aggregation on the bucket key reads pre-partitioned data.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their shared bucket key. With equal bucket
    * counts the planner emits a sort-merge join with zero Exchange nodes
    * (verified by BucketingSpec).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
