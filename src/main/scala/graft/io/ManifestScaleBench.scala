package graft.io

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Dev tool: measure manifest resolve/commit cost at the partition
  * counts where format v2 (sharded, content-addressed leaves) is the
  * point — 50k+ partition directories, the class-doc scale ceiling that
  * motivated sharding. Metadata-dominated: manifests are synthesized
  * (publish + re-resolve) with ONE real partition (`part=p0` holds a
  * real one-row parquet file per version), so the change-feed numbers
  * time exactly what a trigger pays and nothing else.
  *
  * Measures, for v1 (single file) vs v2 (auto-sharded):
  *  - publish latency of a full N-dir snapshot
  *  - resolve (read+parse) latency of that snapshot
  *  - commit BYTES WRITTEN for a 1-partition upsert on top (v1 rewrites
  *    the whole file; v2 rewrites one leaf + the top file)
  *  - `latestVersion` PROBE latency from a hint (the streaming source's
  *    per-trigger poll — O(new versions) existence checks) vs the full
  *    `_manifest/` listing it replaces (O(versions + leaves) under v2)
  *  - a 1-partition `changesBetween` end-to-end (manifest resolve +
  *    diff classify + the changed partition's scan) — the per-trigger
  *    cost of the change feed at this partition count
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
      StructField("part", StringType),
      StructField("bal", DoubleType)))

    def du(dir: java.io.File): Long =
      Option(dir.listFiles()).map(_.filter(_.isFile).map(_.length()).sum)
        .getOrElse(0L)

    /** One real single-row parquet data file (k, bal — the partition
      * column comes from the directory, Hive-layout) dropped into
      * `part=p0` under `name`, so the diff's scoped scan reads real
      * bytes.
      */
    def plantReal(hc: org.apache.hadoop.conf.Configuration, path: String,
        name: String, k: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-mscale-real")
        .toString
      val rows = new java.util.ArrayList[Row]()
      rows.add(Row(k, k.toDouble))
      spark.createDataFrame(rows, StructType(schema.fields
        .filterNot(_.name == "part"))).coalesce(1).write
        .mode("overwrite").parquet(tmp)
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(hc)
      val src = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .head.getPath
      val dstDir = new org.apache.hadoop.fs.Path(path, "part=p0")
      fs.mkdirs(dstDir)
      fs.rename(src, new org.apache.hadoop.fs.Path(dstDir, name))
    }

    def run(tag: String, conf: (String, String)*): Unit = {
      val hc = spark.sparkContext.hadoopConfiguration
      conf.foreach { case (k, v) => hc.set(k, v) }
      try {
        val path = java.nio.file.Files
          .createTempDirectory(s"graft-mscale-$tag").toString + "/lake"
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(hc)
        val mdir = new java.io.File(path, "_manifest")
        // fake entries for every dir except part=p0, which is REAL
        plantReal(hc, path, "c0-real.parquet", 1L)
        plantReal(hc, path, "c1-real.parquet", 2L)
        val files = (0 until nDirs).map { i =>
          s"part=p$i" -> Seq(PartitionedLake.FileEntry(
            if (i == 0) "c0-real.parquet" else f"c0-part-$i%05d.parquet",
            Map("bal" -> (i.toDouble, i + 1.0)),
            Some(if (i == 0) 1L else 1000L),
            // byte lengths make the snapshot NATIVE-scan eligible, so
            // the DSv2 planner measurements below see the real path
            Some(if (i == 0) 1000L else 128L * 1024 * 1024)))
        }.toMap
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
            Seq(PartitionedLake.FileEntry("c1-real.parquet",
              Map("bal" -> (0.0, 1.0)), Some(1L), Some(1000L))))))
        val commitS = (System.nanoTime() - t0) / 1e9
        val commitBytes = du(mdir) - before
        // per-trigger poll: probe from a hint (the streaming source's
        // getOffset path) vs the full listing fallback — under v2 the
        // _manifest dir also holds every live leaf, so the listing is
        // what the bounded probe exists to avoid
        t0 = System.nanoTime()
        val probed = PartitionedLake.latestVersionIn(fs, path, Some(1L))
        val probeS = (System.nanoTime() - t0) / 1e9
        require(probed.contains(2L), s"probe resolved $probed")
        t0 = System.nanoTime()
        val listed = PartitionedLake.latestVersionIn(fs, path, None)
        val listS = (System.nanoTime() - t0) / 1e9
        require(listed.contains(2L), s"listing resolved $listed")
        // 1-partition change feed end-to-end: resolve both manifests,
        // classify, scan ONLY the changed partition's (real) files
        t0 = System.nanoTime()
        val nChanges = PartitionedLake.changesBetween(spark, path, 1L, 2L,
          Seq("k")).count()
        val cdfS = (System.nanoTime() - t0) / 1e9
        require(nChanges > 0, s"diff produced $nChanges rows")
        // DSv2 metadata aggregates at this partition count: the global
        // COUNT(*) (per-dir row-count fold), a CLAIMED-filter count
        // (one exact predicate evaluation per directory), and
        // MAX(partition col) (one typed Cast per directory) — all
        // driver-side over nDirs, zero data files
        import org.apache.spark.sql.functions.{col => c, max => mx}
        val v2df = spark.read.format("graft-lake-v2")
          .option("path", path).load()
        t0 = System.nanoTime()
        val nAll = v2df.groupBy().count().head().getLong(0)
        val metaCountS = (System.nanoTime() - t0) / 1e9
        require(nAll == 1L + (nDirs - 1).toLong * 1000L, s"count $nAll")
        t0 = System.nanoTime()
        val nOne = v2df.filter(c("part") === "p7").groupBy().count()
          .head().getLong(0)
        val claimedS = (System.nanoTime() - t0) / 1e9
        require(nOne == 1000L, s"claimed-filter count $nOne")
        t0 = System.nanoTime()
        val hi = v2df.agg(mx("part")).head().getString(0)
        val maxS = (System.nanoTime() - t0) / 1e9
        require(hi == s"p${nDirs - 1}" || hi.startsWith("p9"), s"max $hi")
        // native DSv2 batch PLANNING at this dir count, driver-side only
        // (no data read — the point is the planner's cost curve):
        // unpruned full plan, a claimed static filter, and a simulated
        // runtime (DPP-delivered) IN filter re-scoping the dir list —
        // the pruned-vs-unpruned evidence for SCALE.md
        val m2 = PartitionedLake.latestManifest(fs, path).get
        def planOf(claimedF: Array[org.apache.spark.sql.sources.Filter],
            runtimeF: Option[org.apache.spark.sql.sources.Filter])
            : (Int, Int, Double) = {
          val scan = new LakeNativeBatchScan(path, None, m2, schema,
            schema, claimedF, Array.empty)
          runtimeF.foreach(f => scan.filter(Array(f)))
          val t = System.nanoTime()
          val parts = scan.planInputPartitions()
          (scan.plannedFiles.size, parts.length,
            (System.nanoTime() - t) / 1e9)
        }
        import org.apache.spark.sql.sources.{EqualTo, In => SrcIn}
        val (fFull, pFull, planFullS) = planOf(Array.empty, None)
        require(fFull == nDirs, s"full plan saw $fFull files")
        val (fClaim, _, planClaimS) =
          planOf(Array(EqualTo("part", "p7")), None)
        require(fClaim == 1, s"claimed plan saw $fClaim files")
        val (fRt, _, planRtS) = planOf(Array.empty,
          Some(SrcIn("part", Array[Any]("p7", "p9", "p11"))))
        require(fRt == 3, s"runtime-pruned plan saw $fRt files")
        println(f"[manifest-scale] $tag%-4s dirs=$nDirs%6d " +
          f"publish=$publishS%7.3fs resolve=$resolveS%7.3fs " +
          f"snapshotBytes=$v1Bytes%12d 1-part-commitBytes=$commitBytes%10d " +
          f"commitLatency=$commitS%7.3fs leaves=${m.leaves.size}%4d " +
          f"probeLatest=${probeS * 1000}%8.1fms listLatest=${listS * 1000}%8.1fms " +
          f"cdf1Part=$cdfS%7.3fs metaCount=${metaCountS * 1000}%8.1fms " +
          f"claimedCount=${claimedS * 1000}%8.1fms maxPart=${maxS * 1000}%8.1fms")
        println(f"[manifest-scale] $tag%-4s nativePlan: " +
          f"full=$fFull%6d files/$pFull%5d parts ${planFullS * 1000}%8.1fms  " +
          f"claimed(1 dir)=$fClaim%2d file ${planClaimS * 1000}%7.1fms  " +
          f"runtimeIn(3 dirs)=$fRt%2d files ${planRtS * 1000}%7.1fms")
      } finally conf.foreach { case (k, _) => hc.unset(k) }
    }
    // v1 forced (threshold above nDirs), then v2 auto (default threshold
    // 8192 puts 50k dirs well into sharded territory)
    run("v1", "graft.lake.manifest.shard.threshold" -> (nDirs * 2).toString)
    run("v2")
    spark.stop()
  }
}
