package graft

import graft.io.PartitionedLake
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: measure the snapshot lake's maintenance surface at scale
  * (SCALE.md's lake section). Not part of the driver contract.
  *
  * Builds two lineitem-backed lakes from SPARK_GRAFT_SF_DIR (intended:
  * out/sf1, ~6M rows): a MONTH layout (~84 partitions — the routine
  * case) and a DAY layout (~2.5k partitions — the manifest-pressure
  * case), then times every lifecycle operation and, on the month
  * layout, runs the same CDC batch through copy-on-write and
  * merge-on-read sinks against identical lake copies to measure the
  * write-amplification gap directly (disk growth per commit — commits
  * never delete, so growth == bytes written).
  *
  * Usage: SPARK_GRAFT_SF_DIR=out/sf1 sbt "runMain graft.LakeBench"
  * Prints one [lake-bench] line per measurement plus a JSON summary to
  * out/lake_bench.json.
  */
object LakeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "out/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-lake-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(50000000L).selectExpr("sum(id * 2 + 1)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      results(name) = s
      println(f"[lake-bench] $name%-42s $s%8.3f s")
      r
    }
    def record(name: String, v: Double, unit: String): Unit = {
      results(name) = v
      println(f"[lake-bench] $name%-42s $v%12.0f $unit")
    }
    def duBytes(path: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(path))
    }

    val root = java.nio.file.Files.createTempDirectory("graft-lakebench").toString
    val sentinelStart = sentinel()
    println(f"[lake-bench] sentinel_start ${sentinelStart}%.3f s")

    // the lake identity contract needs UNIQUE (partition, key) rows and
    // a DETERMINISTIC frame; the synthetic lineitem repeats (orderkey,
    // linenumber) pairs, so aggregate to the identity grain of each
    // layout (max() is deterministic; dropDuplicates is not)
    val li = Tables.lineitem(spark, sfDir)
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("k"),
        col("l_quantity"), col("l_extendedprice"),
        date_format(col("l_shipdate"), "yyyy-MM").as("mon"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("day"))
    val nRows = li.count()
    record("rows", nRows.toDouble, "rows")

    // ---- MONTH layout: the routine (date, source)-style lake ----
    val lakeA = s"$root/month_cow" // copy-on-write CDC target
    val lakeB = s"$root/month_mor" // merge-on-read CDC target
    // materialize the deduped source once so every measured op below is
    // a pure lake cost, not a re-run of the dedup aggregation
    li.groupBy("mon", "k")
      .agg(max("l_quantity").as("l_quantity"),
        max("l_extendedprice").as("l_extendedprice"))
      .write.mode("overwrite").parquet(s"$root/src_month")
    val monthDf = spark.read.parquet(s"$root/src_month")
    record("month.unique_rows", monthDf.count().toDouble, "rows")
    time("month.write_full")(
      PartitionedLake.write(monthDf, lakeA, "mon"))
    PartitionedLake.write(monthDf, lakeB, "mon") // identical twin
    record("month.partitions",
      PartitionedLake.read(spark, lakeA).select("mon").distinct().count()
        .toDouble, "parts")
    record("month.manifest_bytes", duBytes(s"$lakeA/_manifest").toDouble, "B")
    record("month.data_bytes", duBytes(lakeA).toDouble, "B")

    // the CDC batch: ~0.1% of keys, spread over EVERY partition — the
    // worst case for copy-on-write (all partitions rewritten) and the
    // case merge-on-read exists for
    val ops = monthDf.filter(col("k") % 971 === 0)
      .select(col("k"), col("mon"), col("k").as("seq"),
        when(col("k") % 5 === 0, "D").otherwise("U").as("op"),
        (col("l_quantity") + 100).as("val"))
    record("month.cdc_ops", ops.count().toDouble, "ops")
    val bytesA0 = duBytes(lakeA)
    time("month.cdc_copy_on_write")(
      PartitionedLake.cdcSink(spark, lakeA, "mon", "k", "l_quantity", ops))
    record("month.cdc_cow_bytes_written", (duBytes(lakeA) - bytesA0).toDouble, "B")
    val bytesB0 = duBytes(lakeB)
    time("month.cdc_merge_on_read")(
      PartitionedLake.cdcSinkMergeOnRead(spark, lakeB, "mon", "k",
        "l_quantity", ops))
    record("month.cdc_mor_bytes_written", (duBytes(lakeB) - bytesB0).toDouble, "B")

    // both lakes must agree after the fold (sanity, not a unit test)
    val sumA = PartitionedLake.read(spark, lakeA)
      .agg(count(lit(1)), sum(floor(col("l_quantity") * 100).cast("long")))
      .head()
    val sumB = PartitionedLake.read(spark, lakeB)
      .agg(count(lit(1)), sum(floor(col("l_quantity") * 100).cast("long")))
      .head()
    require(sumA == sumB, s"CoW and MOR folds diverged: $sumA vs $sumB")
    time("month.cow_plain_read")(
      PartitionedLake.read(spark, lakeA).agg(count(lit(1))).head())
    time("month.mor_merged_read")(
      PartitionedLake.read(spark, lakeB).agg(count(lit(1))).head())

    val vsB = PartitionedLake.snapshots(spark, lakeB)
    val cbMor = time("month.changes_across_mor_commit") {
      PartitionedLake.changesBetween(spark, lakeB,
        vsB(vsB.size - 2), vsB.last, Seq("mon", "k")).count()
    }
    record("month.changes_across_mor_rows", cbMor.toDouble, "rows")
    time("month.compact_materialize_mor")(
      PartitionedLake.compact(spark, lakeB))
    time("month.vacuum")(PartitionedLake.vacuum(spark, lakeB))

    // single-partition upsert on the CoW lake: the partition-scoped
    // commit cost (month picked from the data; deterministic delta —
    // upsert evaluates its delta more than once, so a limit() sample
    // would merge one key set and union another)
    val pickMon = monthDf.agg(min("mon")).head().getString(0)
    val onePart = monthDf.filter(col("mon") === pickMon &&
        col("k") % 17 === 0)
      .withColumn("l_quantity", col("l_quantity") + 1)
    record("month.upsert_delta_rows", onePart.count().toDouble, "rows")
    time("month.upsert_one_partition")(
      PartitionedLake.upsert(spark, lakeA, "mon", "k", onePart))
    val vsA = PartitionedLake.snapshots(spark, lakeA)
    val cbOne = time("month.changes_one_partition") {
      PartitionedLake.changesBetween(spark, lakeA,
        vsA(vsA.size - 2), vsA.last, Seq("mon", "k")).count()
    }
    record("month.changes_one_partition_rows", cbOne.toDouble, "rows")

    // ---- DAY layout: ~2.5k partitions, the manifest-pressure case.
    // Repartition on the partition column first — the at-scale write
    // pattern (one task per partition -> one file each); without it,
    // every task writes a sliver into every partition (~32 x 2.5k =
    // 80k files) and all maintenance becomes listing-bound. ----
    val lakeD = s"$root/day"
    li.groupBy("day", "k").agg(max("l_quantity").as("l_quantity"))
      .write.mode("overwrite").parquet(s"$root/src_day")
    val dayDf = spark.read.parquet(s"$root/src_day")
      .repartition(col("day"))
    time("day.write_full")(PartitionedLake.write(dayDf, lakeD, "day"))
    val dayParts = PartitionedLake.read(spark, lakeD)
      .select("day").distinct().count()
    record("day.partitions", dayParts.toDouble, "parts")
    record("day.manifest_bytes", duBytes(s"$lakeD/_manifest").toDouble, "B")
    val pickDay = dayDf.agg(min("day")).head().getString(0)
    val oneDay = dayDf.filter(col("day") === pickDay)
      .withColumn("l_quantity", col("l_quantity") + 1)
    time("day.upsert_one_partition")(
      PartitionedLake.upsert(spark, lakeD, "day", "k", oneDay))
    val vsD = PartitionedLake.snapshots(spark, lakeD)
    time("day.changes_one_partition") {
      PartitionedLake.changesBetween(spark, lakeD,
        vsD(vsD.size - 2), vsD.last, Seq("day", "k")).count()
    }
    // give compact REAL work (an upsert leaves one file per partition,
    // so compacting right after it is a no-op): a merge-on-read CDC
    // batch scatters delta sidecars across ~30 day-partitions, and
    // day.compact then times materializing them away — the actual
    // maintenance cost at the day-layout design point
    val morDays = dayDf.select("day").distinct().orderBy("day")
      .limit(30).collect().map(_.getString(0))
    val morOps = dayDf.filter(col("day").isin(morDays.toIndexedSeq: _*))
      .groupBy("day").agg(max("k").as("k"))
      .select(col("k"), col("day"), lit(1L).as("seq"), lit("U").as("op"),
        lit(999.0).as("val"))
    time("day.cdc_mor_30_partitions")(
      PartitionedLake.cdcSinkMergeOnRead(spark, lakeD, "day", "k",
        "l_quantity", morOps))
    time("day.compact")(PartitionedLake.compact(spark, lakeD))
    time("day.vacuum")(PartitionedLake.vacuum(spark, lakeD))

    val sentinelEnd = sentinel()
    println(f"[lake-bench] sentinel_end ${sentinelEnd}%.3f s")
    val json = (results.toSeq ++ Seq(
      "sentinel_start" -> sentinelStart, "sentinel_end" -> sentinelEnd))
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", s""","sf":"$sfDir"}""")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("out"))
    java.nio.file.Files.write(java.nio.file.Paths.get("out/lake_bench.json"),
      json.getBytes("UTF-8"))
    println(json)
    // reclaim the ~3x sf1 footprint
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(root))
    spark.stop()
  }
}
