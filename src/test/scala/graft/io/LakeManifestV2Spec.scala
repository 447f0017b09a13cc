package graft.io

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the FORMAT-V2 sharded manifest (content-addressed leaf
  * files + a top file of `shard:` references), the vacuum retention
  * window, and the commit-race grace period — the parts of the snapshot
  * protocol whose failure modes are silent data loss at the 100 TB
  * design point (a trusted-but-truncated leaf drops a shard's files
  * from every later snapshot; a graceless vacuum deletes a racing
  * commit's moved-but-unpublished files).
  */
class LakeManifestV2Spec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def withConf(k: String, v: String)(f: => Unit): Unit = {
    hconf.set(k, v)
    try f finally hconf.unset(k)
  }

  private def tmpLake(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/lake"

  private def fsOf(path: String) = new Path(path).getFileSystem(hconf)

  private def manifestFiles(path: String): Seq[String] =
    fsOf(path).listStatus(new Path(path, "_manifest"))
      .map(_.getPath.getName).toSeq.sorted

  private def readBack(path: String): Map[(String, Long), Double] =
    PartitionedLake.read(spark, path).collect()
      .map(r => (r.getAs[String]("part"), r.getAs[Long]("k")) ->
        r.getAs[Double]("bal")).toMap

  private def df(rows: (String, Long, Double)*) =
    rows.map(r => (r._2, r._1, r._3)).toDF("k", "part", "bal")

  test("forced v2: sharded write round-trips exactly and matches a v1 twin lake") {
    val v2path = tmpLake("v2rt")
    val v1path = tmpLake("v1rt")
    val rows = (0 until 12).map(i => (s"p$i", i.toLong, i * 1.5))
    val delta = Seq(("p3", 3L, 99.0), ("pNew", 50L, 7.0))
    withConf("graft.lake.manifest.shards", "4") {
      PartitionedLake.write(df(rows: _*), v2path, "part")
      PartitionedLake.upsert(spark, v2path, "part", "k", df(delta: _*))
    }
    PartitionedLake.write(df(rows: _*), v1path, "part")
    PartitionedLake.upsert(spark, v1path, "part", "k", df(delta: _*))
    assert(readBack(v2path) === readBack(v1path))
    // the v2 top file declares itself and references existing leaves
    val fs = fsOf(v2path)
    val top = new Path(v2path, "_manifest/v000000002.txt")
    val lines = scala.io.Source.fromInputStream(fs.open(top)).getLines().toSeq
    // write harvests bytes, so the header carries the .1 minor
    assert(lines.head === "graft-lake-manifest v2.1")
    val leaves = lines.filter(_.startsWith("shard:")).map(_.stripPrefix("shard:"))
    assert(leaves.nonEmpty)
    leaves.foreach(l => assert(fs.exists(new Path(v2path, s"_manifest/$l")),
      s"referenced leaf $l missing"))
    // no dir/file body line leaks into a v2 top file (meta: is a
    // header annotation — round 14's persisted partition layout)
    assert(lines.drop(2).forall(l => l.isEmpty || l.startsWith("shard:") ||
      l.startsWith("txn:") || l.startsWith("mor:") ||
      l.startsWith("meta:")))
  }

  test("v1 -> v2 growth transition at the shard threshold; both formats stay time-travelable") {
    val path = tmpLake("grow")
    withConf("graft.lake.manifest.shard.threshold", "8") {
      PartitionedLake.write(df((0 until 3).map(i => (s"p$i", i.toLong, 1.0)): _*),
        path, "part")
      PartitionedLake.upsert(spark, path, "part", "k",
        df((3 until 12).map(i => (s"p$i", i.toLong, 2.0)): _*))
    }
    val fs = fsOf(path)
    def header(v: Int): String = scala.io.Source.fromInputStream(
      fs.open(new Path(path, f"_manifest/v$v%09d.txt"))).getLines().next()
    assert(header(1) === "graft-lake-manifest v1.1")
    assert(header(2) === "graft-lake-manifest v2.1")
    assert(PartitionedLake.readVersion(spark, path, 1).count() === 3)
    assert(PartitionedLake.readVersion(spark, path, 2).count() === 12)
  }

  test("unchanged shards reuse the same content-addressed leaf across versions") {
    val path = tmpLake("reuse")
    withConf("graft.lake.manifest.shards", "6") {
      PartitionedLake.write(df((0 until 24).map(i => (s"p$i", i.toLong, 1.0)): _*),
        path, "part")
      PartitionedLake.upsert(spark, path, "part", "k", df(("p5", 5L, 9.0)))
      val fs = fsOf(path)
      val l1 = PartitionedLake.latestManifest(fs, path).get
      val prev = PartitionedLake.readVersion(spark, path, 1) // resolvable
      assert(prev.count() === 24)
      def leavesOf(v: Int): Set[String] = scala.io.Source.fromInputStream(
        fs.open(new Path(path, f"_manifest/v$v%09d.txt"))).getLines()
        .filter(_.startsWith("shard:")).map(_.stripPrefix("shard:")).toSet
      val (lv1, lv2) = (leavesOf(1), leavesOf(2))
      // exactly ONE shard (the one holding p5) changed; every other leaf
      // is the SAME file — commit bytes scale with the changed partition
      // footprint, not the partition count
      assert((lv2 -- lv1).size === 1, s"changed leaves: ${lv2 -- lv1}")
      assert((lv1 -- lv2).size === 1)
      assert(l1.leaves.toSet === lv2)
    }
  }

  test("a truncated leaf is rewritten at publish (crashed committer) and fails reads loudly (referenced)") {
    val path = tmpLake("truncleaf")
    withConf("graft.lake.manifest.shards", "2") {
      PartitionedLake.write(df((0 until 8).map(i => (s"p$i", i.toLong, 1.0)): _*),
        path, "part")
      val fs = fsOf(path)
      val m1 = PartitionedLake.latestManifest(fs, path).get // parse BEFORE corrupting
      val leaf = m1.leaves.head
      val leafPath = new Path(path, s"_manifest/$leaf")
      val full = scala.io.Source.fromInputStream(fs.open(leafPath)).mkString
      val out = fs.create(leafPath, true) // truncate: keep half the bytes
      try out.write(full.getBytes("UTF-8").take(full.length / 2)) finally out.close()
      // a REFERENCED corrupted leaf must fail the manifest read loudly —
      // leaves are content-addressed, hence self-verifying
      val e = intercept[IllegalArgumentException] {
        PartitionedLake.latestManifest(fs, path)
      }
      assert(e.getMessage.contains("corrupted"), e.getMessage)
      // the crashed-committer shape: the same content-addressed name is
      // republished by a later commit — reuse must validate, not trust
      // bare existence, and rewrite the intact bytes
      assert(PartitionedLake.tryPublishManifest(fs, path, m1.copy(version = 2L)))
      assert(fs.getFileStatus(leafPath).getLen === full.getBytes("UTF-8").length,
        "truncated leaf was trusted instead of rewritten")
      assert(readBack(path) ===
        (0 until 8).map(i => (s"p$i", i.toLong) -> 1.0).toMap)
    }
  }

  test("the full random-op model run agrees under FORCED v2 sharded manifests") {
    withConf("graft.lake.manifest.shards", "3") {
      graft.LakeModelHarness.run()
    }
  }

  test("vacuum retires leaves unreferenced by retained manifests; live leaves and reads survive") {
    val path = tmpLake("leafvac")
    withConf("graft.lake.manifest.shards", "4") {
      PartitionedLake.write(df((0 until 12).map(i => (s"p$i", i.toLong, 1.0)): _*),
        path, "part")
      PartitionedLake.upsert(spark, path, "part", "k", df(("p1", 1L, 2.0)))
      PartitionedLake.upsert(spark, path, "part", "k", df(("p2", 2L, 3.0)))
      val fs = fsOf(path)
      val liveLeaves = PartitionedLake.latestManifest(fs, path).get.leaves.toSet
      assert(manifestFiles(path).count(_.startsWith("leaf-")) > liveLeaves.size,
        "test needs superseded leaves to retire")
      PartitionedLake.vacuum(spark, path)
      val after = manifestFiles(path)
      assert(after.filter(_.startsWith("leaf-")).toSet === liveLeaves,
        "vacuum must keep exactly the retained manifests' leaves")
      assert(after.count(_.startsWith("v")) === 1)
      assert(readBack(path) ===
        ((0 until 12).map(i => (s"p$i", i.toLong) -> 1.0).toMap +
          (("p1", 1L) -> 2.0) + (("p2", 2L) -> 3.0)))
    }
  }

  test("vacuum keepLast window: in-window versions stay readable and diffable, older reclaimed") {
    val path = tmpLake("retain")
    PartitionedLake.write(df(("a", 1L, 1.0)), path, "part")
    PartitionedLake.upsert(spark, path, "part", "k", df(("b", 2L, 2.0)))
    PartitionedLake.upsert(spark, path, "part", "k", df(("a", 1L, 5.0)))
    PartitionedLake.vacuum(spark, path, keepLast = 2)
    assert(PartitionedLake.snapshots(spark, path) === Seq(2L, 3L))
    // both retained versions read whole; the diff across them works
    assert(PartitionedLake.readVersion(spark, path, 2).count() === 2)
    assert(PartitionedLake.readVersion(spark, path, 3).count() === 2)
    val changed = PartitionedLake.changesBetween(spark, path, 2, 3, Seq("part", "k"))
      .collect().map(_.getAs[String]("_change_type")).sorted
    assert(changed === Array("update_postimage", "update_preimage"))
    // out-of-window fails loudly, never silently skips
    val e = intercept[IllegalArgumentException] {
      PartitionedLake.readVersion(spark, path, 1).count()
    }
    assert(e.getMessage.contains("not resolvable"))
  }

  test("vacuum grace shields a racing commit's moved-but-unpublished files, young leaves, temps, and stagings") {
    val path = tmpLake("grace")
    PartitionedLake.write(df(("a", 1L, 1.0), ("b", 2L, 2.0)), path, "part")
    PartitionedLake.upsert(spark, path, "part", "k", df(("a", 1L, 3.0)))
    val fs = fsOf(path)
    // simulate the window inside commitStaged: files MOVED into place
    // (an existing partition and a brand-new one), manifest temp + leaf
    // written — all BEFORE the top-file rename publishes them
    def put(rel: String, bytes: Int): Path = {
      val p = new Path(path, rel)
      fs.mkdirs(p.getParent)
      val out = fs.create(p, true)
      try out.write(Array.fill[Byte](bytes)(1)) finally out.close()
      p
    }
    val movedExisting = put("part=a/c99zzzzz-part-00000.parquet", 16)
    val movedNew = put("part=new/c99zzzzz-part-00000.parquet", 16)
    val youngLeaf = put("_manifest/leaf-0123456789abcdef0123456789abcdef.txt", 8)
    val youngTmp = put("_manifest/.tmp-racer1", 8)
    val staging = put("_staging/racer1/part=a/part-00000.parquet", 16)
    PartitionedLake.vacuum(spark, path, keepLast = 1, graceMs = 10 * 60 * 1000L)
    for (p <- Seq(movedExisting, movedNew, youngLeaf, youngTmp, staging))
      assert(fs.exists(p), s"grace-window vacuum deleted racing-commit file $p")
    // the graceless maintenance-window vacuum reclaims all of them
    PartitionedLake.vacuum(spark, path, keepLast = 1, graceMs = 0L)
    for (p <- Seq(movedExisting, movedNew, youngLeaf, youngTmp, staging))
      assert(!fs.exists(p), s"graceless vacuum left $p")
    assert(readBack(path) === Map(("a", 1L) -> 3.0, ("b", 2L) -> 2.0))
  }
}
