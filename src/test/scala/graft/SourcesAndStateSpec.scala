package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink breadth beyond parquet+CSV, and the production state-store
  * backend for streaming.
  */
class SourcesAndStateSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ORC round-trip preserves values and pushes filters to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    li.write.mode("overwrite").orc(s"$dir/li")
    val back = spark.read.orc(s"$dir/li")
    assert(back.count() === li.count())
    val filtered = back.filter(col("l_quantity") > 45)
    val plan = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("GreaterThan(l_quantity,45"), plan)
    assert(filtered.count() ===
      li.filter(col("l_quantity") > 45).count())
  }

  test("XML round-trip via the built-in Spark 4 xml source") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xml").toString
    val c = Tables.customer(spark, sf)
      .select("c_custkey", "c_name", "c_mktsegment")
    c.write.mode("overwrite").option("rowTag", "customer").xml(s"$dir/c")
    val back = spark.read.option("rowTag", "customer").xml(s"$dir/c")
    assert(back.count() === c.count())
    val got = back.select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey").collect()
    val want = c.orderBy("c_custkey").collect()
    assert(got.map(_.toString).toSeq === want.map(_.toString).toSeq)
  }

  test("binaryFile source ingests raw files into the multimodal decode path") {
    import spark.implicits._
    import graft.functions.MultimodalOps
    // stage raw "media" files on disk — the real-world multimodal input
    val dir = java.nio.file.Files.createTempDirectory("graft-bin").toString
    (0 until 5).foreach { i =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/doc$i.bin"),
        Array.tabulate[Byte](50 + i * 7)(j => ((i * 31 + j) % 127).toByte))
    }
    val files = spark.read.format("binaryFile").load(dir)
    assert(files.count() === 5)
    assert(files.columns.toSet ===
      Set("path", "modificationTime", "length", "content"))
    // path -> doc_id, content -> payload: straight into the decode stub
    val blobs = files.select(
        regexp_extract(col("path"), "doc(\\d+)\\.bin$", 1).cast("long")
          .as("doc_id"),
        col("content").as("payload"))
      .as[MultimodalOps.Blob]
    val metas = blobs.mapPartitions(_.map(MultimodalOps.decodeStub))
      .collect().sortBy(_.doc_id)
    assert(metas.length === 5)
    assert(metas.map(_.n_bytes).toSeq === Seq(50L, 57L, 64L, 71L, 78L))
  }

  test("JSON-lines round-trip preserves schema-on-read values") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    val e = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value")
    e.write.mode("overwrite").json(s"$dir/e")
    val back = spark.read.json(s"$dir/e")
    assert(back.count() === e.count())
    // schema inference finds the numeric/string split
    assert(back.schema("event_id").dataType.typeName === "long")
    assert(back.schema("event_type").dataType.typeName === "string")
    val s1 = back.select(sum("value").cast("decimal(28,6)")).collect()(0).getDecimal(0)
    val s2 = e.select(sum("value").cast("decimal(28,6)")).collect()(0).getDecimal(0)
    assert(s1 === s2)
  }

  test("CorpusSource JSONL: explicit-schema round-trip + corrupt-line quarantine") {
    import graft.io.CorpusSource
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    val docs = Tables.documents(spark, sf)
    CorpusSource.writeJsonl(docs, s"$dir/c")
    val back = CorpusSource.jsonlClean(spark, s"$dir/c")
    assert(back.schema.fieldNames.toSeq === docs.schema.fieldNames.toSeq)
    assert(back.agg(count(col("doc_id"))).collect()(0).getLong(0) === docs.count())
    val h1 = back.select(md5(concat_ws("|", col("doc_id"), col("text"))))
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().sorted
    val h2 = docs.select(md5(concat_ws("|", col("doc_id"), col("text"))))
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().sorted
    assert(h1.toSeq === h2.toSeq)
    // a malformed line must quarantine, not fail the scan or leak a row
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/c/zz-bad.json"),
      "{\"doc_id\": 1, \"text\": NOT_JSON}\n".getBytes("UTF-8"))
    // Spark refuses plans whose referenced columns are ONLY the corrupt
    // column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — keep a data column in
    // the projection when auditing the quarantine
    // (count() would prune back down to corrupt-only; collect keeps the
    // data column referenced)
    val bad = CorpusSource.jsonl(spark, s"$dir/c")
      .select(col("doc_id"), col("_corrupt_record"))
      .filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length === 1)
    // the malformed line is dropped, not leaked as a null row (count a
    // real column: a bare count() over raw JSON counts physical lines)
    assert(CorpusSource.jsonlClean(spark, s"$dir/c")
      .agg(count(col("doc_id"))).collect()(0).getLong(0) === docs.count())
  }

  test("Observation metrics ride the job (no second pass over the data)") {
    // production pipelines need row/quality counters without re-scanning;
    // observe() attaches metric expressions to the SAME pass
    val obs = new org.apache.spark.sql.Observation("ingest")
    val li = Tables.lineitem(spark, sf)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        count_if(col("l_quantity") > 45).as("n_big"),
        max("l_quantity").as("max_qty"))
    val n = li.filter(col("l_returnflag") === "R").count()
    val m = obs.get
    assert(m("n_rows").asInstanceOf[Long] === Tables.lineitem(spark, sf).count())
    assert(m("n_big").asInstanceOf[Long] ===
      Tables.lineitem(spark, sf).filter(col("l_quantity") > 45).count())
    assert(n > 0)
  }

  test("schema evolution: mergeSchema reads old and new file generations") {
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    val v1 = Tables.customer(spark, sf).select("c_custkey", "c_name")
    v1.write.mode("overwrite").parquet(s"$dir/t")
    val v2 = Tables.customer(spark, sf)
      .select("c_custkey", "c_name", "c_mktsegment")
    v2.write.mode("append").parquet(s"$dir/t")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(merged.columns.toSet === Set("c_custkey", "c_name", "c_mktsegment"))
    assert(merged.count() === v1.count() * 2)
    // old-generation rows surface the new column as null
    assert(merged.filter(col("c_mktsegment").isNull).count() === v1.count())
  }

  test("zstd parquet round-trips (the 100 TB wire format)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zstd").toString
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    li.write.mode("overwrite").option("compression", "zstd").parquet(s"$dir/z")
    val files = new java.io.File(s"$dir/z").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))
    assert(files.nonEmpty && files.forall(_.contains("zstd")), files.toSeq)
    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() === li.count())
    assert(back.select(sum(floor(col("l_quantity") * 100 + 0.5).cast("long")))
      .collect()(0).getLong(0) ===
      li.select(sum(floor(col("l_quantity") * 100 + 0.5).cast("long")))
        .collect()(0).getLong(0))
  }

  test("streaming dedup drops cross-batch replays within the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup").toString
    val e = Tables.events(spark, sf).select("event_id", "ts", "user_id")
    val firstHalf = e.filter(col("event_id") % 2 === 0)
    firstHalf.write.mode("overwrite").parquet(s"$dir/in")
    val streamIn = spark.readStream.schema(e.schema).parquet(s"$dir/in")
    // delay chosen to exceed the dataset's full time span: every replay is
    // then inside the watermark (a dup, dropped by state) rather than
    // late data (dropped by the watermark itself)
    val q = streamIn
      .withWatermark("ts", "60 days")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      // batch 2 replays ALL of batch 1 plus the other half: replayed rows
      // must be dropped by the keyed state, new rows must pass
      e.write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val got = spark.table("dedup_out")
      assert(got.count() === got.select("event_id").distinct().count())
      assert(got.count() === e.count())
    } finally q.stop()
  }

  test("sessionizer runs on the RocksDB state store provider") {
    import spark.implicits._
    val all = Tables.events(spark, sf)
      .select(col("user_id"), unix_timestamp(col("ts")).as("ts_sec"))
    val expected = QueryRegistry.queries("q51_sessionize")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"))).toMap

    val dir = java.nio.file.Files.createTempDirectory("graft-rocksdb").toString
    all.write.mode("overwrite").parquet(s"$dir/in")
    val streamIn = spark.readStream.schema(all.schema).parquet(s"$dir/in")
      .as[EventStreams.EventRow]
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = EventStreams.sessionize(streamIn)
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .format("memory").queryName("rocksdb_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("rocksdb_out").collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"))).toMap
      assert(got === expected)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    }
  }
}
