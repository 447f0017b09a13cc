package graft

import graft.io.PartitionedLake
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The registered batch form of the lake: `spark.read.format
  * ("graft-lake")` must be the API read by another name — same rows,
  * same manifest-scoped file set, time travel via option, pushed
  * filters reaching the delegated plan.
  */
class LakeBatchSourceSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Double)] =
    df.select("part", "k", "bal").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("format read == API read: rows, schema, and manifest-scoped inputFiles (superseded files invisible)") {
    val lake = java.nio.file.Files.createTempDirectory("graft-batchsrc").toString + "/lake"
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), lake, "part")
    // supersede partition a's file — the OLD file stays on disk (time
    // travel) but must be invisible to both read forms
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((1L, "a", 9.0)).toDF("k", "part", "bal"))
    val api = PartitionedLake.read(spark, lake)
    val fmt = spark.read.format("graft-lake").option("path", lake).load()
    assert(fmt.schema === api.schema)
    assert(rowsOf(fmt) === rowsOf(api))
    assert(fmt.inputFiles.sorted === api.inputFiles.sorted)
    assert(fmt.inputFiles.length === 2, "one live file per partition")
    // the superseded file exists on disk but is NOT in the file set
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.listStatus(new org.apache.hadoop.fs.Path(lake, "part=a"))
      .count(_.isFile)
    assert(onDisk === 2, "superseded file should still be on disk")
    assert(fmt.inputFiles.count(_.contains("part=a")) === 1)
  }

  test("versionAsOf option time-travels exactly like readVersion") {
    val lake = java.nio.file.Files.createTempDirectory("graft-batchtt").toString + "/lake"
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      lake, "part")
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((1L, "a", 2.0), (2L, "b", 5.0)).toDF("k", "part", "bal"))
    val v1fmt = spark.read.format("graft-lake").option("path", lake)
      .option("versionAsOf", "1").load()
    assert(rowsOf(v1fmt) === rowsOf(PartitionedLake.readVersion(spark, lake, 1)))
    assert(rowsOf(v1fmt) === Set(("a", 1L, 1.0)))
    val latest = spark.read.format("graft-lake").option("path", lake).load()
    assert(rowsOf(latest) === Set(("a", 1L, 2.0), ("b", 2L, 5.0)))
  }

  test("batch change feed via options: changesFrom/changesTo == changesBetween, both granularities, loud on missing keyCols") {
    val lake = java.nio.file.Files.createTempDirectory("graft-batchcdf")
      .toString + "/lake"
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), lake, "part")
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((1L, "a", 9.0), (3L, "b", 3.0)).toDF("k", "part", "bal"))
    PartitionedLake.cdcSink(spark, lake, "part", "k", "bal",
      Seq((2L, "b", 1L, "D", 0.0)).toDF("k", "part", "seq", "op", "val"))
    def viaFormat(granularity: Option[String]) = {
      val r = spark.read.format("graft-lake").option("path", lake)
        .option("changesFrom", "1").option("changesTo", "3")
        .option("keyCols", "k")
      granularity.fold(r)(g => r.option("granularity", g)).load()
    }
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getAs[Long]("k"), r.getAs[String]("_change_type"),
        if (df.columns.contains("_commit_version"))
          r.getAs[Long]("_commit_version") else -1L)
    }.toSet
    // net form == the Scala API's net diff
    assert(key(viaFormat(None)) ===
      key(PartitionedLake.changesBetween(spark, lake, 1L, 3L, Seq("k"))))
    // commit granularity == the Scala API's per-commit form
    assert(key(viaFormat(Some("commit"))) ===
      key(PartitionedLake.changesBetween(spark, lake, 1L, 3L, Seq("k"),
        perCommit = true)))
    assert(viaFormat(Some("commit")).columns.contains("_commit_version"))
    // missing keyCols fails loudly, not with a late analysis error
    val e = intercept[Exception] {
      spark.read.format("graft-lake").option("path", lake)
        .option("changesFrom", "1").option("changesTo", "3").load()
    }
    assert(e.getMessage.contains("keyCols"), e.getMessage)
    // a granularity typo fails loudly instead of silently reading as
    // net — the same vocabulary the streaming provider enforces
    val g = intercept[Exception] { viaFormat(Some("per-commit")) }
    assert(g.getMessage.contains("granularity") &&
      g.getMessage.contains("per-commit"), g.getMessage)
  }

  test("filters are pushed into the delegated plan; a merge-on-read lake reads identically through the format") {
    val lake = java.nio.file.Files.createTempDirectory("graft-batchmor").toString + "/lake"
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "b", 3.0))
      .toDF("k", "part", "bal"), lake, "part")
    // live merge-on-read deltas: tombstone k=2, post-image k=3
    PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
      Seq((2L, "b", 1L, "D", 0.0), (3L, "b", 2L, "U", 30.0))
        .toDF("k", "part", "seq", "op", "val"))
    val api = PartitionedLake.read(spark, lake)
    val fmt = spark.read.format("graft-lake").option("path", lake).load()
    assert(rowsOf(fmt) === rowsOf(api))
    assert(rowsOf(fmt) === Set(("a", 1L, 1.0), ("b", 3L, 30.0)))
    // partition predicate lands in the scan's pushed filters (the v1
    // PrunedFilteredScan surface), and the filtered result is exact
    val filtered = fmt.filter(col("part") === "a")
    val scanLine = filtered.queryExecution.executedPlan.toString()
    assert(scanLine.contains("PushedFilters") &&
      scanLine.contains("EqualTo(part,a)"),
      s"partition filter not pushed:\n$scanLine")
    assert(rowsOf(filtered) === Set(("a", 1L, 1.0)))
    // column pruning reaches the delegated scan: a two-column project
    // over the format must not error and must match the API projection
    val narrow = fmt.select("k", "bal").collect().map(r =>
      (r.getLong(0), r.getDouble(1))).toSet
    assert(narrow === Set((1L, 1.0), (3L, 30.0)))
  }

  test("format write: Overwrite snapshots, Append upserts by key, ErrorIfExists refuses on a live lake") {
    val lake = java.nio.file.Files.createTempDirectory("graft-batchw").toString + "/lake"
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "part", "bal")
      .write.format("graft-lake").option("path", lake)
      .option("partitionCols", "part").mode("overwrite").save()
    assert(rowsOf(PartitionedLake.read(spark, lake)) ===
      Set(("a", 1L, 1.0), ("b", 2L, 2.0)))
    // append == upsert: same (partition, key) replaces, new key lands
    Seq((1L, "a", 9.0), (3L, "b", 3.0)).toDF("k", "part", "bal")
      .write.format("graft-lake").option("path", lake)
      .option("partitionCols", "part").option("keyCol", "k")
      .mode("append").save()
    assert(rowsOf(PartitionedLake.read(spark, lake)) ===
      Set(("a", 1L, 9.0), ("b", 2L, 2.0), ("b", 3L, 3.0)))
    // append without a key is ambiguous under replay — loud refusal
    val e = intercept[RuntimeException] {
      Seq((5L, "a", 5.0)).toDF("k", "part", "bal")
        .write.format("graft-lake").option("path", lake)
        .option("partitionCols", "part").mode("append").save()
    }
    assert(e.getMessage.contains("keyCol"), e.getMessage)
    val e2 = intercept[RuntimeException] {
      Seq((5L, "a", 5.0)).toDF("k", "part", "bal")
        .write.format("graft-lake").option("path", lake)
        .option("partitionCols", "part").mode("errorifexists").save()
    }
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
    // both commits went through the snapshot protocol: versions advanced
    assert(PartitionedLake.snapshots(spark, lake) === Seq(1L, 2L))
  }

  test("ErrorIfExists/Ignore are adoption-aware: a pre-protocol parquet lake counts as existing") {
    val lake = java.nio.file.Files.createTempDirectory("graft-batchpre").toString + "/lake"
    // pre-protocol Hive-layout parquet, no manifest — an existing lake
    // to every other entry point (upsert adopts it)
    Seq((1L, "a", 1.0)).toDF("k", "part", "bal")
      .write.partitionBy("part").parquet(lake)
    val e = intercept[RuntimeException] {
      Seq((9L, "z", 9.0)).toDF("k", "part", "bal")
        .write.format("graft-lake").option("path", lake)
        .option("partitionCols", "part").mode("errorifexists").save()
    }
    assert(e.getMessage.contains("already exists"), e.getMessage)
    Seq((9L, "z", 9.0)).toDF("k", "part", "bal")
      .write.format("graft-lake").option("path", lake)
      .option("partitionCols", "part").mode("ignore").save()
    // Ignore left the pre-protocol data untouched and published nothing
    assert(PartitionedLake.snapshots(spark, lake).isEmpty)
    assert(rowsOf(PartitionedLake.read(spark, lake)) === Set(("a", 1L, 1.0)))
  }

  test("SQL CREATE TABLE ... USING graft-lake reads the lake; time travel via OPTIONS") {
    val lake = java.nio.file.Files.createTempDirectory("graft-batchsql").toString + "/lake"
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      lake, "part")
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((2L, "b", 2.0)).toDF("k", "part", "bal"))
    spark.sql("DROP TABLE IF EXISTS lake_sql_t")
    spark.sql("DROP TABLE IF EXISTS lake_sql_v1")
    spark.sql(s"CREATE TABLE lake_sql_t USING `graft-lake` OPTIONS (path '$lake')")
    spark.sql(s"CREATE TABLE lake_sql_v1 USING `graft-lake` " +
      s"OPTIONS (path '$lake', versionAsOf '1')")
    try {
      assert(spark.sql("SELECT part, k, bal FROM lake_sql_t").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet ===
        Set(("a", 1L, 1.0), ("b", 2L, 2.0)))
      assert(spark.sql("SELECT count(*) FROM lake_sql_v1").head().getLong(0) === 1L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS lake_sql_t")
      spark.sql("DROP TABLE IF EXISTS lake_sql_v1")
    }
  }

  test("writeStream.format(graft-lake): micro-batches upsert exactly-once through the txn replay guard") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sinkfmt").toString
    val lake = s"$dir/lake"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Double)]
    // layout declared via the ENGINE's partitionBy — the sink must
    // honor the forwarded partitionColumns, no redundant option
    val q = mem.toDF().toDF("k", "part", "bal")
      .writeStream.format("graft-lake").partitionBy("part")
      .option("path", lake)
      .option("keyCol", "k").option("writerId", "sink-spec")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      mem.addData((1L, "a", 1.0), (2L, "b", 2.0))
      q.processAllAvailable()
      assert(rowsOf(PartitionedLake.read(spark, lake)) ===
        Set(("a", 1L, 1.0), ("b", 2L, 2.0)))
      mem.addData((1L, "a", 9.0), (3L, "b", 3.0))
      q.processAllAvailable()
      assert(rowsOf(PartitionedLake.read(spark, lake)) ===
        Set(("a", 1L, 9.0), ("b", 2L, 2.0), ("b", 3L, 3.0)))
    } finally q.stop()
    // the replay guard recorded the sink's writer slot: a redelivered
    // batch id is skipped whole (exactly-once at the transaction level)
    val before = rowsOf(PartitionedLake.read(spark, lake))
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((1L, "a", 777.0)).toDF("k", "part", "bal"),
      batchId = Some(1L), writerId = "sink-spec")
    assert(rowsOf(PartitionedLake.read(spark, lake)) === before,
      "replayed batch id must be dropped whole")
  }
}
