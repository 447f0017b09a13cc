package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSON-Lines corpus ingest/egress — the interchange format text corpora
  * actually arrive in (one JSON document per line: Common Crawl derivates,
  * HF dataset exports, annotation tool output).
  *
  * Scale rules this encodes:
  *  - **Schema is REQUIRED, never inferred.** `spark.read.json` without a
  *    schema runs a full extra pass over the data to infer one — at
  *    100 TB that doubles the ingest cost before the first real job; it
  *    also silently widens types on dirty lines. Readers here always
  *    pass an explicit `StructType`.
  *  - **Corrupt lines are quarantined, not fatal.** PERMISSIVE mode with
  *    a `_corrupt_record` column keeps a 10^11-line ingest from dying on
  *    line 10^10-1; the caller decides whether corrupt-rate is a gate.
  *  - **Compression: prefer many moderate files.** A single gzip'd JSONL
  *    is one unsplittable task however large; the writer keeps Spark's
  *    per-partition files so the read side parallelizes by file.
  */
object CorpusSource {

  /** The documents-table schema (TESTDATA.md) as the default corpus shape. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Read a JSONL corpus with an explicit schema; malformed lines land in
    * `_corrupt_record` (null everywhere else) instead of failing the scan.
    */
  def jsonl(spark: SparkSession, path: String,
      schema: StructType = documentsSchema): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Only the well-formed rows, via DROPMALFORMED (no corrupt column in
    * the plan — filtering [[jsonl]] on `_corrupt_record IS NULL` would
    * hit Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction as soon as
    * column pruning strips the data columns, e.g. under a bare count()).
    *
    * Spark caveat that survives here: a ZERO-column query over raw JSON
    * (a bare `count()`) short-circuits parsing and counts physical
    * lines, malformed included. For an exact row count next to possibly
    * dirty data, aggregate a real column — `agg(count(col("doc_id")))` —
    * or land the scan in parquet first (what a real ingest does anyway).
    */
  def jsonlClean(spark: SparkSession, path: String,
      schema: StructType = documentsSchema): DataFrame =
    spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)

  /** Write a DataFrame as JSONL, one file per partition (splittable read). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
