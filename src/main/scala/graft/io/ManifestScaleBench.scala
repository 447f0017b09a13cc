package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Dev tool: measure manifest resolve/commit cost at the partition
  * counts where format v2 (sharded, content-addressed leaves) is the
  * point — 50k+ partition directories, the class-doc scale ceiling that
  * motivated sharding. Purely metadata: manifests are synthesized
  * (publish + re-resolve), no data files, so this isolates exactly the
  * bytes the snapshot protocol itself moves.
  *
  * Measures, for v1 (single file) vs v2 (auto-sharded):
  *  - publish latency of a full N-dir snapshot
  *  - resolve (read+parse) latency of that snapshot
  *  - commit BYTES WRITTEN for a 1-partition upsert on top (v1 rewrites
  *    the whole file; v2 rewrites one leaf + the top file)
  *
  * Usage: sbt "runMain graft.io.ManifestScaleBench [nDirs]"   (default 50000)
  * Results belong in SCALE.md ("Sharded manifests, measured").
  */
object ManifestScaleBench {
  def main(args: Array[String]): Unit = {
    val nDirs = args.headOption.map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-manifest-scale")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("part", org.apache.spark.sql.types.StringType),
      StructField("bal", DoubleType)))
    val files = (0 until nDirs).map { i =>
      s"part=p$i" -> Seq(PartitionedLake.FileEntry(
        f"c0-part-$i%05d.parquet",
        Map("bal" -> (i.toDouble, i + 1.0)), Some(1000L)))
    }.toMap

    def du(dir: java.io.File): Long =
      Option(dir.listFiles()).map(_.filter(_.isFile).map(_.length()).sum)
        .getOrElse(0L)
    def run(tag: String, conf: (String, String)*): Unit = {
      val hc = spark.sparkContext.hadoopConfiguration
      conf.foreach { case (k, v) => hc.set(k, v) }
      try {
        val path = java.nio.file.Files
          .createTempDirectory(s"graft-mscale-$tag").toString + "/lake"
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(hc)
        val mdir = new java.io.File(path, "_manifest")
        var t0 = System.nanoTime()
        PartitionedLake.publishManifest(fs, path,
          PartitionedLake.Manifest(1L, schema, files))
        val publishS = (System.nanoTime() - t0) / 1e9
        val v1Bytes = du(mdir)
        t0 = System.nanoTime()
        val m = PartitionedLake.latestManifest(fs, path).get
        val resolveS = (System.nanoTime() - t0) / 1e9
        require(m.files.size == nDirs, s"parsed ${m.files.size}")
        // the incremental commit: one partition's file list changes
        val before = du(mdir)
        t0 = System.nanoTime()
        PartitionedLake.publishManifest(fs, path, m.copy(
          version = 2L,
          files = m.files.updated("part=p0",
            Seq(PartitionedLake.FileEntry("c1-part-00000.parquet",
              Map("bal" -> (0.0, 1.0)), Some(1000L))))))
        val commitS = (System.nanoTime() - t0) / 1e9
        val commitBytes = du(mdir) - before
        println(f"[manifest-scale] $tag%-4s dirs=$nDirs%6d " +
          f"publish=$publishS%7.3fs resolve=$resolveS%7.3fs " +
          f"snapshotBytes=$v1Bytes%12d 1-part-commitBytes=$commitBytes%10d " +
          f"commitLatency=$commitS%7.3fs leaves=${m.leaves.size}%4d")
      } finally conf.foreach { case (k, _) => hc.unset(k) }
    }
    // v1 forced (threshold above nDirs), then v2 auto (default threshold
    // 8192 puts 50k dirs well into sharded territory)
    run("v1", "graft.lake.manifest.shard.threshold" -> (nDirs * 2).toString)
    run("v2")
    spark.stop()
  }
}
