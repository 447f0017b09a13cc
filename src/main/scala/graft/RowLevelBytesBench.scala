package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measures the WRITE BYTES of one-key SQL UPDATE under the
  * two row-level modes — group-based copy-on-write vs merge-on-read
  * delta sidecars — on the same bucketed orders lake SCALE.md's
  * round-15 `changed_partitions` evidence used. The number that
  * matters at 100 TB is bytes-committed-per-statement: CoW pays the
  * matched partitions' full size, MOR pays the op rows (plus the
  * touched partitions' accumulated log, zero here).
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.RowLevelBytesBench"` — prints one JSON line.
  */
object RowLevelBytesBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def newFileBytes(lake: String, sinceVersion: Long): Long = {
      val before = spark.read.format("graft-lake")
        .option("versionAsOf", sinceVersion).load(lake)
        .inputFiles.toSet
      val after =
        graft.io.PartitionedLake.read(spark, lake).inputFiles.toSet
      (after -- before).map(f =>
        new java.io.File(new java.net.URI(f)).length()).sum
    }

    def stage(tag: String): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-rlb-$tag").toString + "/lake"
      val base = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"),
          (col("o_orderkey") % 64).cast("int").as("bucket"))
      graft.io.PartitionedLake.write(base, dir, "bucket")
      dir
    }
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[graft.io.LakeCatalog].getName)
    val key = Tables.orders(spark, sfDir)
      .select("o_orderkey").head().getLong(0)

    val cow = stage("cow")
    val t0 = System.nanoTime()
    spark.sql(s"UPDATE graft_lake.`$cow` SET o_totalprice = " +
      s"o_totalprice + 1 WHERE o_orderkey = $key")
    val cowSec = (System.nanoTime() - t0) / 1e9
    val cowBytes = newFileBytes(cow, 1L)

    val mor = stage("mor")
    spark.conf.set(graft.io.LakeDeltaRowLevel.ModeKey,
      graft.io.LakeDeltaRowLevel.MergeOnRead)
    spark.conf.set(graft.io.LakeDeltaRowLevel.KeyKey, "o_orderkey")
    val t1 = System.nanoTime()
    spark.sql(s"UPDATE graft_lake.`$mor` SET o_totalprice = " +
      s"o_totalprice + 1 WHERE o_orderkey = $key")
    val morSec = (System.nanoTime() - t1) / 1e9
    val morBytes = newFileBytes(mor, 1L)

    println(f"""{"metric":"rowlevel_update_bytes","sf":"$sfDir",""" +
      f""""cow_bytes":$cowBytes,"mor_bytes":$morBytes,""" +
      f""""ratio":${cowBytes.toDouble / math.max(morBytes, 1)}%.1f,""" +
      f""""cow_sec":$cowSec%.3f,"mor_sec":$morSec%.3f}""")
    spark.stop()
  }
}
