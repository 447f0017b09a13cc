package graft.io

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** ALTER COLUMN TYPE as a manifest-only WIDENING commit
  * ([[PartitionedLake.widenColumnType]]): files are untouched, every
  * reader serves the narrower physical values under the wider schema
  * natively in parquet, and anything lossy refuses loudly.
  */
class LakeWidenTypeSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def freshLake(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-widen-$tag")
      .toString + "/lake"

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)

  private def dataFileNames(lake: String): Set[String] =
    new java.io.File(lake).listFiles().filter(_.isDirectory)
      .filterNot(_.getName.startsWith("_")).flatMap(_.listFiles())
      .map(_.getName).filter(_.endsWith(".parquet")).toSet

  test("int->long is manifest-only: zero new files, exact values under the wider type, old version time-travels narrow, new writes mix in") {
    val lake = freshLake("i2l")
    PartitionedLake.write(Seq((1, "a", 10), (2, "b", 2000000000))
      .toDF("k", "part", "v"), lake, "part")
    val before = dataFileNames(lake)
    PartitionedLake.widenColumnType(spark, lake, "v", LongType)
    assert(dataFileNames(lake) === before, "widening must not write data")
    val read = PartitionedLake.read(spark, lake)
    assert(read.schema("v").dataType === LongType)
    assert(read.select("k", "v").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet ===
      Set((1, 10L), (2, 2000000000L)))
    // the pre-widen snapshot still reads under the narrow type
    assert(PartitionedLake.readVersion(spark, lake, 1L)
      .schema("v").dataType === IntegerType)
    // new data arrives wide and beyond int range; old narrow files mix
    PartitionedLake.append(
      Seq((3, "a", 5000000000L)).toDF("k", "part", "v"),
      lake, Seq("part"))
    assert(PartitionedLake.read(spark, lake)
      .agg(sum("v")).head.getLong(0) === 10L + 2000000000L + 5000000000L)
    // widening to the SAME type is an idempotent no-op (no version churn)
    val vBefore = PartitionedLake.snapshots(spark, lake).max
    PartitionedLake.widenColumnType(spark, lake, "v", LongType)
    assert(PartitionedLake.snapshots(spark, lake).max === vBefore)
  }

  test("the promotion matrix: float->double, decimal precision growth, long->fitting decimal, date->timestamp_ntz; every lossy shape refuses") {
    val lake = freshLake("matrix")
    PartitionedLake.write(
      Seq((1L, "a", 1.5f, java.math.BigDecimal.valueOf(12345, 2),
          java.sql.Date.valueOf("2026-01-02")))
        .toDF("k", "part", "f", "dec", "dt")
        .withColumn("dec", col("dec").cast(DecimalType(10, 2))),
      lake, "part")
    PartitionedLake.widenColumnType(spark, lake, "f", DoubleType)
    PartitionedLake.widenColumnType(spark, lake, "dec", DecimalType(20, 2))
    PartitionedLake.widenColumnType(spark, lake, "k", DecimalType(20, 0))
    PartitionedLake.widenColumnType(spark, lake, "dt", TimestampNTZType)
    val r = PartitionedLake.read(spark, lake)
      .select("k", "f", "dec", "dt").head
    assert(r.getDecimal(0) === new java.math.BigDecimal(1))
    assert(r.getDouble(1) === 1.5)
    assert(r.getDecimal(2).compareTo(
      java.math.BigDecimal.valueOf(12345, 2)) === 0)
    assert(r.getAs[java.time.LocalDateTime](3) ===
      java.time.LocalDateTime.of(2026, 1, 2, 0, 0))
    def refuses(c: String, to: DataType): Unit = {
      val e = intercept[Exception] {
        PartitionedLake.widenColumnType(spark, lake, c, to)
      }
      assert(e.getMessage.contains("widening promotions"),
        s"$c -> $to: ${e.getMessage}")
    }
    refuses("f", FloatType)            // already double: narrowing back
    refuses("dec", DecimalType(20, 4)) // scale change
    refuses("dec", DecimalType(10, 2)) // precision shrink
    refuses("k", LongType)             // decimal -> long
    refuses("f", StringType)           // out of the numeric ladder
    // partition / unknown / pre-protocol refuse with their own messages
    assert(intercept[Exception] {
      PartitionedLake.widenColumnType(spark, lake, "part", StringType)
    }.getMessage.contains("partition column"))
    assert(intercept[Exception] {
      PartitionedLake.widenColumnType(spark, lake, "nope", LongType)
    }.getMessage.contains("no such column"))
    val legacy = freshLake("legacy")
    Seq((1, "a")).toDF("k", "part").write.partitionBy("part").parquet(legacy)
    assert(intercept[Exception] {
      PartitionedLake.widenColumnType(spark, legacy, "k", LongType)
    }.getMessage.contains("pre-protocol"))
  }

  test("widening a live MOR value column: the merged read serves wide; the next CDC fold must carry the NEW type exactly") {
    val lake = freshLake("mor")
    PartitionedLake.write(Seq((1L, "a", 1.5f), (2L, "b", 2.5f))
      .toDF("k", "part", "bal"), lake, "part")
    PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
      Seq((1L, "a", 1L, "U", 10.5f)).toDF("k", "part", "seq", "op", "val"))
    PartitionedLake.widenColumnType(spark, lake, "bal", DoubleType)
    // base files float, sidecar float, schema double: both read wide
    assert(PartitionedLake.read(spark, lake).select("k", "bal").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet ===
      Set((1L, 10.5), (2L, 2.5)))
    // a fold still carrying float refuses (exact-type guard); double lands
    val e = intercept[Exception] {
      PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
        Seq((2L, "b", 2L, "U", 9.5f)).toDF("k", "part", "seq", "op", "val"))
    }
    assert(e.getMessage.contains("must equal lake column"), e.getMessage)
    PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
      Seq((2L, "b", 2L, "U", 9.5)).toDF("k", "part", "seq", "op", "val"))
    assert(PartitionedLake.read(spark, lake).select("k", "bal").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet ===
      Set((1L, 10.5), (2L, 9.5)))
  }

  test("SQL: ALTER TABLE ... ALTER COLUMN ... TYPE routes; narrowing refuses through SQL; row-level UPDATE works on the widened lake") {
    val lake = freshLake("sql")
    useCatalog()
    PartitionedLake.write(Seq((1, "a", 10), (2, "b", 20))
      .toDF("k", "part", "v"), lake, "part")
    spark.sql(s"ALTER TABLE graft_lake.`$lake` ALTER COLUMN v TYPE BIGINT")
    assert(spark.sql(s"SELECT sum(v) FROM graft_lake.`$lake`")
      .head.getLong(0) === 30L)
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    // narrowing dies in the ANALYZER (Spark's own upcast check), before
    // the catalog ever sees it
    val nr = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft_lake.`$lake` ALTER COLUMN v TYPE INT")
    }
    assert(messages(nr).exists(_.contains("NOT_SUPPORTED_CHANGE_COLUMN")),
      nr.toString)
    // a change Spark's upcast allows but old parquet files cannot serve
    // (long -> string) hits OUR guard
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft_lake.`$lake` " +
        "ALTER COLUMN v TYPE STRING")
    }
    assert(messages(e).exists(_.contains("widening promotions")),
      e.toString)
    // the widened lake stays fully DML-capable (the rewrite writes wide)
    spark.sql(s"UPDATE graft_lake.`$lake` SET v = v + 5000000000 " +
      "WHERE k = 1")
    assert(spark.sql(s"SELECT v FROM graft_lake.`$lake` WHERE k = 1")
      .head.getLong(0) === 5000000010L)
  }

  test("a data commit staged under the narrow type racing a widen conflicts loudly (schema type change)") {
    val lake = freshLake("race")
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    PartitionedLake.write(Seq((1, "a", 10)).toDF("k", "part", "v"),
      lake, "part")
    val base = PartitionedLake.latestManifest(fs, lake).get
    val df = Seq((2, "b", 20)).toDF("k", "part", "v")
    val (staging, staged) =
      PartitionedLake.stage(spark, fs, lake, df, Seq("part"), Nil)
    PartitionedLake.widenColumnType(spark, lake, "v", LongType)
    val e = intercept[Exception] {
      PartitionedLake.commitStaged(fs, lake, staging, staged,
        staged.keySet, df.schema, Some(base), None)
    }
    assert(e.getMessage.contains("schema type change"), e.getMessage)
    assert(PartitionedLake.read(spark, lake).count() === 1L)
  }
}
