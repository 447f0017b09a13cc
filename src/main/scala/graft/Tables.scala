package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness-provided parquet tables (TESTDATA.md).
  *
  * All queries take `(spark, sfDir)` and read only these tables so the
  * DuckDB oracle can run the equivalent SQL against the same files.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // metadata cache: a DataFrame is an immutable plan, so reusing it per
  // (session, path) skips the repeated file listing + schema read when many
  // queries touch the same tables (the catalog-cache every engine keeps);
  // no row data is cached. Eviction is EXPLICIT, not GC-based: a weak map
  // cannot work here because the cached DataFrames strongly reference their
  // SparkSession (Dataset.sparkSession), i.e. the map values would pin the
  // weak keys forever (the value-refers-to-key pitfall in the WeakHashMap
  // javadoc). Instead, entries for STOPPED sessions are purged on every
  // access (per-spec sessions in the test suite stop when done), and the
  // map is LRU-bounded as a backstop for long-lived processes that churn
  // live sessions. A rewritten dataset dir is picked up by any new session.
  private val maxSessions = 8
  private val cache = new java.util.LinkedHashMap[
      SparkSession, java.util.HashMap[String, DataFrame]](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[SparkSession, java.util.HashMap[String, DataFrame]])
        : Boolean = size > maxSessions
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.synchronized {
      val it = cache.keySet().iterator()
      while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
      val perSession = cache.computeIfAbsent(spark,
        _ => new java.util.HashMap[String, DataFrame]())
      perSession.computeIfAbsent(s"$dir/$name.parquet",
        path => spark.read.parquet(path))
    }

  /** Normalizes event-time columns to session-tz `TIMESTAMP` regardless of
    * how the parquet writer encoded them. This is the engine's data-encoding
    * contract for event time: downstream (batch window aggs, and especially
    * `withWatermark`, which rejects `TIMESTAMP_NTZ`) always sees
    * `TimestampType`. Three physical encodings are absorbed:
    *
    *   - parquet TIMESTAMP(NANOS): Spark 4 refuses to read it as a timestamp;
    *     the legacy conf reads it as a long which we convert at µs precision
    *     (the generated data is exactly µs-precision, so lossless);
    *   - naive `timestamp[us]` (isAdjustedToUTC=false — what pandas/arrow
    *     write by default): Spark infers `TIMESTAMP_NTZ`; reinterpreted in
    *     the session timezone via `to_timestamp_ltz` (session tz is UTC in
    *     all entry points, so values are unchanged vs a naive read);
    *   - UTC-adjusted `timestamp[us]`: already `TimestampType`, passthrough.
    *
    * The DuckDB oracle mirrors with CAST(ts AS TIMESTAMP) under UTC.
    */
  private def nanosTable(spark: SparkSession, dir: String, name: String,
      tsCols: Seq[String]): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, name)
    import org.apache.spark.sql.functions.{expr, timestamp_micros, to_timestamp_ltz, col}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    tsCols.foldLeft(raw) { (df, c) =>
      df.schema(c).dataType match {
        case LongType =>
          df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
        case TimestampNTZType =>
          df.withColumn(c, to_timestamp_ltz(col(c)))
        case _ => df
      }
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = nanosTable(s, d, "events", Seq("ts"))
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
