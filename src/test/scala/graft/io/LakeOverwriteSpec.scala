package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-scoped and dynamic `INSERT OVERWRITE` — the backfill
  * idiom: [[PartitionedLake.overwritePartitions]] (OVERWRITE_BY_FILTER
  * through the exact-evaluator honesty gate) and
  * [[LakeDynamicOverwriteWrite]] (OVERWRITE_DYNAMIC as a real DSv2
  * batch write).
  */
class LakeOverwriteSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def freshLake(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-ow-$tag")
      .toString + "/lake"

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)

  private def rowsOf(lake: String): Set[(String, Long, Double)] =
    PartitionedLake.read(spark, lake).select("part", "k", "bal").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  private def seed(lake: String): Unit =
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0),
      (3L, "c", 3.0)).toDF("k", "part", "bal"), lake, "part")

  private def files(lake: String, p: String): Set[String] =
    new java.io.File(s"$lake/part=$p").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet

  test("INSERT OVERWRITE PARTITION (k='v') replaces exactly the named partition; others stay byte-identical; old version time-travels") {
    val lake = freshLake("static")
    seed(lake)
    useCatalog()
    val bBefore = files(lake, "b"); val cBefore = files(lake, "c")
    spark.sql(s"INSERT OVERWRITE graft_lake.`$lake` " +
      "PARTITION (part = 'a') VALUES (10, 10.5), (11, 11.5)")
    assert(rowsOf(lake) === Set(("a", 10L, 10.5), ("a", 11L, 11.5),
      ("b", 2L, 2.0), ("c", 3L, 3.0)))
    assert(files(lake, "b") === bBefore && files(lake, "c") === cBefore,
      "untouched partitions were rewritten")
    assert(PartitionedLake.readVersion(spark, lake, 1L)
      .filter(col("part") === "a").select("k").head.getLong(0) === 1L)
  }

  test("overwriting a partition value with no prior directory just inserts it; a range predicate overwrites several partitions in one commit") {
    val lake = freshLake("fresh")
    seed(lake)
    useCatalog()
    spark.sql(s"INSERT OVERWRITE graft_lake.`$lake` " +
      "PARTITION (part = 'z') VALUES (9, 9.0)")
    assert(rowsOf(lake) === Set(("a", 1L, 1.0), ("b", 2L, 2.0),
      ("c", 3L, 3.0), ("z", 9L, 9.0)))
    // DataFrameWriterV2 condition form: one commit supersedes both
    // matched partitions, keeps the rest
    Seq((20L, "a", 20.0)).toDF("k", "part", "bal")
      .writeTo(s"graft_lake.`$lake`")
      .overwrite(col("part") === "a" || col("part") === "b")
    assert(rowsOf(lake) === Set(("a", 20L, 20.0), ("c", 3L, 3.0),
      ("z", 9L, 9.0)), "part=b matched the predicate and must be gone")
  }

  test("refusals: sub-partition predicates and rows outside the overwritten region fail loudly with the lake intact") {
    val lake = freshLake("refuse")
    seed(lake)
    useCatalog()
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    val sub = intercept[Exception] {
      Seq((1L, "a", 5.0)).toDF("k", "part", "bal")
        .writeTo(s"graft_lake.`$lake`").overwrite(col("k") === 1L)
    }
    assert(messages(sub).exists(_.contains("exact evaluator")), sub.toString)
    val off = intercept[Exception] {
      Seq((7L, "b", 7.0)).toDF("k", "part", "bal")
        .writeTo(s"graft_lake.`$lake`").overwrite(col("part") === "a")
    }
    assert(messages(off).exists(_.contains("OUTSIDE the")), off.toString)
    assert(rowsOf(lake) === Set(("a", 1L, 1.0), ("b", 2L, 2.0),
      ("c", 3L, 3.0)), "a refused overwrite must change nothing")
  }

  test("dynamic partitionOverwriteMode: INSERT OVERWRITE replaces exactly the partitions the data touches; empty source publishes nothing") {
    val lake = freshLake("dynamic")
    seed(lake)
    useCatalog()
    val before = spark.conf.getOption(
      "spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      val cBefore = files(lake, "c")
      spark.sql(s"INSERT OVERWRITE graft_lake.`$lake` " +
        "VALUES (10, 'a', 10.0), (20, 'b', 20.0), (21, 'b', 21.0)")
      assert(rowsOf(lake) === Set(("a", 10L, 10.0), ("b", 20L, 20.0),
        ("b", 21L, 21.0), ("c", 3L, 3.0)))
      assert(files(lake, "c") === cBefore, "part=c was rewritten")
      assert(PartitionedLake.snapshots(spark, lake) === Seq(1L, 2L))
      // pre-overwrite snapshot still time-travels
      assert(PartitionedLake.readVersion(spark, lake, 1L).count() === 3L)
      // an empty source must publish no version (no churn)
      spark.sql(s"INSERT OVERWRITE graft_lake.`$lake` " +
        s"SELECT * FROM graft_lake.`$lake` WHERE k < 0")
      assert(PartitionedLake.snapshots(spark, lake) === Seq(1L, 2L),
        "empty dynamic overwrite must be a no-op")
    } finally before match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  test("SQL writes inherit the snapshot's stats harvest: INSERT INTO and partition overwrite keep footer bounds alive") {
    val lake = freshLake("stats")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 200.0))
      .toDF("k", "part", "bal"), lake, "part", statsCols = Seq("bal"))
    useCatalog()
    spark.sql(s"INSERT INTO graft_lake.`$lake` VALUES (3, 'a', 3.0)")
    spark.sql(s"INSERT OVERWRITE graft_lake.`$lake` " +
      "PARTITION (part = 'b') VALUES (9, 900.0)")
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = PartitionedLake.latestManifest(fs, lake).get
    assert(m.files.values.flatten.forall(_.stats.contains("bal")),
      s"SQL-written files lost the bal bounds: ${m.files}")
    // and the bounds are usable: the box read opens only part=a files
    val hit = PartitionedLake.readBox(spark, lake, Map("bal" -> (0.0, 10.0)))
    assert(hit.select("k").collect().map(_.getLong(0)).toSet ===
      Set(1L, 3L))
    assert(hit.inputFiles.forall(_.contains("part=a")))
  }
}
