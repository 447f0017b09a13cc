package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Malformed-input behavior (a data-VALIDATION engine must itself be
  * well-defined on bad bytes) and an idempotent micro-batch sink.
  */
class RobustnessSpec extends AnyFunSuite {
  import SparkTestSession._

  private def writeLines(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-robust")
    val f = dir.resolve("data.json")
    java.nio.file.Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("PERMISSIVE JSON scan quarantines corrupt records instead of failing") {
    val path = writeLines(Seq(
      """{"id": 1, "v": "ok"}""",
      """{"id": 2, "v": """,          // truncated
      """{"id": 3, "v": "also ok"}"""))
    // caching first is required: Spark disallows queries touching ONLY the
    // internal corrupt-record column on a raw scan
    val df = spark.read
      .schema("id LONG, v STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache()
    val rows = df.collect()
    assert(rows.length === 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() === 1)
    assert(df.filter(col("_corrupt_record").isNull)
      .select(sum("id")).collect()(0).getLong(0) === 4L)
  }

  test("FAILFAST surfaces the malformed record as an error") {
    val path = writeLines(Seq("""{"id": 1}""", """not json at all"""))
    val df = spark.read
      .schema("id LONG")
      .option("mode", "FAILFAST")
      .json(path)
    val e = intercept[Exception](df.collect())
    assert(e.getMessage.contains("MALFORMED_RECORD") ||
      Option(e.getCause).exists(_.getMessage.contains("MALFORMED_RECORD")),
      e.toString)
  }

  test("CSV DROPMALFORMED keeps only parseable rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
    val f = dir.resolve("d.csv")
    java.nio.file.Files.writeString(f, "a,b\n1,x\nnot-a-number,y\n3,z")
    val df = spark.read
      .schema("a LONG, b STRING")
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .csv(f.toString)
    // collect(), not count(): count() prunes all columns so nothing is
    // parsed and malformed rows aren't detected (documented Spark quirk)
    val rows = df.collect()
    assert(rows.length === 2)
    assert(rows.map(_.getLong(0)).sum === 4L)
  }

  test("foreachBatch sink is idempotent under batch replay") {
    val inDir = java.nio.file.Files.createTempDirectory("graft-fb-in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-fb-out").toString
    val e = Tables.events(spark, sf).select("event_id", "event_type")
    e.limit(100).write.mode("overwrite").parquet(s"$inDir/in")

    def writeBatch(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      // overwrite-by-batch-id: replaying a batch rewrites the same output
      // partition instead of appending duplicates — the standard
      // exactly-once recipe for file sinks under retries
      batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$id")

    val streamIn = spark.readStream.schema(e.schema).parquet(s"$inDir/in")
    val q = streamIn.writeStream
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) => writeBatch(b, id))
      .option("checkpointLocation", s"$outDir/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    val once = spark.read.parquet(s"$outDir/batch_id=0").count()
    // simulate a retry of batch 0: same data, same id — output unchanged
    writeBatch(spark.read.parquet(s"$inDir/in"), 0L)
    val twice = spark.read.parquet(s"$outDir/batch_id=0").count()
    assert(once === 100L)
    assert(twice === once)
  }
}
