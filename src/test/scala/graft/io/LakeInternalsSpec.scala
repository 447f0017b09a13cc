package graft.io

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** In-package pins for the commit-point internals the public API cannot
  * reach deterministically: the manifest rename IS the commit, so the
  * race window sits between version resolution and publish — simulated
  * here by publishing the same version twice.
  */
class LakeInternalsSpec extends AnyFunSuite {
  import graft.SparkTestSession._

  test("publishing the same manifest version twice fails loudly (the strict no-rebase path)") {
    val path = java.nio.file.Files.createTempDirectory("graft-race").toString + "/lake"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = PartitionedLake.Manifest(7L, new StructType(), Map.empty)
    PartitionedLake.publishManifest(fs, path, m)
    // the losing committer of a race must refuse, not clobber the
    // winner's snapshot or silently retreat to a later version
    val e = intercept[RuntimeException] {
      PartitionedLake.publishManifest(fs, path, m)
    }
    assert(e.getMessage.contains("concurrent commit"), e.getMessage)
    // the winner's manifest is untouched
    assert(PartitionedLake.latestManifest(fs, path).exists(_.version == 7L))
  }

  test("manifest round-trip fuzz: random escaped dirs, stats, txn, mor key, and delta sidecars survive serialization") {
    val path = java.nio.file.Files.createTempDirectory("graft-fuzz").toString + "/lake"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rnd = new scala.util.Random(41)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    // adversarial raw names: separators, the parser's own line prefixes,
    // spaces (NOT escaped by Spark), unicode — all must round-trip once
    // escaped the way Spark escapes partition values
    val nastyRaw = Seq("a/b", "x:y=z", "100%", "txn 7", "mor:k", "delta:x",
      "tab\there", "sp ace", "naïve", "__HIVE_DEFAULT_PARTITION__", "..")
    def esc(s: String) =
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(s)
    for (round <- 1 to 30) {
      val dirs = (0 until 1 + rnd.nextInt(4)).map { _ =>
        val levels = 1 + rnd.nextInt(2)
        (0 until levels).map { l =>
          val v = if (rnd.nextBoolean()) nastyRaw(rnd.nextInt(nastyRaw.size))
            else rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString
          s"c$l=${esc(v)}"
        }.mkString("/")
      }.distinct
      val files = dirs.map { d =>
        d -> (0 until 1 + rnd.nextInt(3)).map { i =>
          val stats = if (rnd.nextBoolean())
            Map(s"s${rnd.nextInt(3)}" ->
              (rnd.nextDouble() * -100, rnd.nextDouble() * 100))
          else Map.empty[String, (Double, Double)]
          PartitionedLake.FileEntry(s"c$round-$i.parquet", stats,
            if (rnd.nextBoolean()) Some(rnd.nextLong().abs) else None,
            if (rnd.nextBoolean()) Some(rnd.nextLong().abs) else None)
        }
      }.toMap
      val deltas =
        if (rnd.nextBoolean())
          Map(dirs.head -> (0 until 1 + rnd.nextInt(2))
            .map(i => s"delta-f$round-$i.parquet"))
        else Map.empty[String, Seq[String]]
      val m = PartitionedLake.Manifest(round.toLong, schema, files,
        txns = if (rnd.nextBoolean())
          Map(nastyRaw(rnd.nextInt(nastyRaw.size)) -> rnd.nextLong().abs,
            "w2" -> rnd.nextLong().abs)
        else Map.empty[String, Long],
        deltas = deltas,
        mor = if (deltas.nonEmpty)
          Some(nastyRaw(rnd.nextInt(nastyRaw.size))) else None)
      PartitionedLake.publishManifest(fs, path, m)
      val back = PartitionedLake.latestManifest(fs, path).get
      assert(back.version === m.version)
      assert(back.txns === m.txns, s"round $round txns")
      assert(back.mor === m.mor, s"round $round mor")
      assert(back.deltas.view.mapValues(_.sorted).toMap ===
        m.deltas.view.mapValues(_.sorted).toMap, s"round $round deltas")
      assert(back.files.view.mapValues(_.sortBy(_.name)).toMap ===
        m.files.view.mapValues(_.sortBy(_.name)).toMap, s"round $round files")
    }
  }

  test("manifest round-trip preserves stats, txn, and escaped dir paths byte-exactly") {
    val path = java.nio.file.Files.createTempDirectory("graft-roundtrip").toString + "/lake"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    val m = PartitionedLake.Manifest(3L, schema,
      Map(
        "day=2024-01-05/src=a%2Fb" -> Seq(
          PartitionedLake.FileEntry("c1-part-0.parquet",
            Map("zval" -> (1.5, 99.25), "k" -> (-3.0, 7.0))),
          PartitionedLake.FileEntry("c1-part-1.parquet")),
        "day=2024-01-06/src=__HIVE_DEFAULT_PARTITION__" -> Seq(
          PartitionedLake.FileEntry("c2-part-0.parquet"))),
      txns = Map("default" -> 42L))
    PartitionedLake.publishManifest(fs, path, m)
    val back = PartitionedLake.latestManifest(fs, path).get
    assert(back.version === 3L)
    assert(back.txns === Map("default" -> 42L))
    assert(back.schema === schema)
    assert(back.files.view.mapValues(_.sortBy(_.name)).toMap ===
      m.files.view.mapValues(_.sortBy(_.name)).toMap)
  }

  test("a future writer's meta: header lines and unknown file fields are accepted-and-ignored (two-phase forward compat)") {
    val path = java.nio.file.Files.createTempDirectory("graft-fwdcompat")
      .toString + "/lake"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    // hand-plant what a FUTURE release might publish: a meta: header
    // annotation (e.g. persisted upsert key columns) and an unknown
    // '='-free per-file field — this reader must parse everything it
    // understands and ignore the rest, per the header note's two-phase
    // evolution rule
    val body = "graft-lake-manifest v1.1\n" +
      s"schema ${schema.json}\n" +
      "meta:keyCols k\n" +
      "part=p1/c1-part-0.parquet\trows:5\tbytes:123\tzstd:level3\n"
    val dir = new org.apache.hadoop.fs.Path(path, "_manifest")
    fs.mkdirs(dir)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(dir, "v000000001.txt"), false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val back = PartitionedLake.latestManifest(fs, path).get
    assert(back.version === 1L)
    assert(back.files.keySet === Set("part=p1"))
    val e = back.files("part=p1").head
    assert(e.name === "c1-part-0.parquet")
    assert(e.rows === Some(5L))
    assert(e.bytes === Some(123L))
    assert(e.stats.isEmpty) // the unknown field is ignored, not stats
  }

  test("meta:column-ids: the rename mapping's READER half — parse, full-coverage gate, round-trip, carry-through-commit rules") {
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField}
    import graft.SparkTestSession.spark.implicits._
    def esc(s: String) =
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(s)
    def plant(body: String): (org.apache.hadoop.fs.FileSystem, String) = {
      val path = java.nio.file.Files.createTempDirectory("graft-colids")
        .toString + "/lake"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val dir = new org.apache.hadoop.fs.Path(path, "_manifest")
      fs.mkdirs(dir)
      val out = fs.create(
        new org.apache.hadoop.fs.Path(dir, "v000000001.txt"), false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      (fs, path)
    }
    // a FUTURE writer's manifest: ids for every column, one name
    // containing the separator characters themselves
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("part", StringType), StructField("we:ird/x", DoubleType)))
    val (fs, path) = plant("graft-lake-manifest v1\n" +
      s"schema ${schema.json}\n" +
      "meta:partition-cols=part\n" +
      s"meta:column-ids=k:1/part:2/${esc("we:ird/x")}:3\n")
    val m = PartitionedLake.latestManifest(fs, path).get
    assert(m.columnIds ===
      Some(Map("k" -> 1, "part" -> 2, "we:ird/x" -> 3)))
    // round-trip: THIS release republishing the manifest (a rebase on a
    // mixed fleet) must not strip the future writer's mapping
    PartitionedLake.publishManifest(fs, path, m.copy(version = 2L))
    assert(PartitionedLake.latestManifest(fs, path).get.columnIds ===
      m.columnIds)
    // a PARTIAL mapping is rejected loudly at parse — it would
    // mis-resolve exactly the columns it omits
    val (fs2, partial) = plant("graft-lake-manifest v1\n" +
      s"schema ${schema.json}\n" +
      "meta:column-ids=k:1\n")
    val e = intercept[Exception] {
      PartitionedLake.latestManifest(fs2, partial)
    }
    assert(e.getMessage.contains("unmapped"), e.getMessage)
    // WRITER-half rules on a REAL lake (this release): the first
    // commit assigns ids in schema order, same-schema commits carry
    // them, and an additive evolution EXTENDS the mapping with a fresh
    // id above the max instead of dropping it
    val lake = java.nio.file.Files.createTempDirectory("graft-colids2")
      .toString + "/lake"
    val lfs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    PartitionedLake.write(Seq((1L, "a")).toDF("k", "part"), lake, "part")
    assert(PartitionedLake.latestManifest(lfs, lake).get.columnIds ===
      Some(Map("k" -> 1, "part" -> 2)),
      "the writer half: bootstrap assigns ids in schema order")
    PartitionedLake.append(Seq((2L, "a")).toDF("k", "part"), lake,
      Seq("part"))
    assert(PartitionedLake.latestManifest(lfs, lake).get.columnIds ===
      Some(Map("k" -> 1, "part" -> 2)), "same-schema append must carry ids")
    PartitionedLake.append(Seq((3L, "a", 9.0)).toDF("k", "part", "extra"),
      lake, Seq("part"))
    assert(PartitionedLake.latestManifest(lfs, lake).get.columnIds ===
      Some(Map("k" -> 1, "part" -> 2, "extra" -> 3)),
      "additive evolution must extend the mapping with a fresh id")
    // and the rename refusal points at the real rename API
    val rn = intercept[Exception] {
      PartitionedLake.append(
        Seq((4L, "a", 8.0)).toDF("k", "part", "renamed"), lake, Seq("part"))
    }
    assert(rn.getMessage.contains("renameColumn"), rn.getMessage)
  }

  test("latestVersion with a live hint probes forward without listing _manifest/; a vacuumed hint falls back") {
    val path = java.nio.file.Files.createTempDirectory("graft-probe").toString + "/lake"
    val raw = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    for (v <- 1L to 5L)
      PartitionedLake.publishManifest(raw, path,
        PartitionedLake.Manifest(v, schema, Map.empty))
    // counting wrapper: the streaming source polls this every trigger,
    // so the hinted path must cost existence checks, never a directory
    // listing (which under sharded manifests also returns every leaf)
    var lists = 0
    val fs = new org.apache.hadoop.fs.FilterFileSystem(raw) {
      override def listStatus(p: org.apache.hadoop.fs.Path):
          Array[org.apache.hadoop.fs.FileStatus] = {
        lists += 1; super.listStatus(p)
      }
    }
    assert(PartitionedLake.latestVersionIn(fs, path, Some(3L)) === Some(5L))
    assert(lists === 0, "hinted probe must not list the manifest dir")
    assert(PartitionedLake.latestVersionIn(fs, path, Some(5L)) === Some(5L))
    assert(lists === 0)
    // no hint -> one listing
    assert(PartitionedLake.latestVersionIn(fs, path, None) === Some(5L))
    assert(lists === 1)
    // a hint below a vacuumed-away floor cannot silently conclude
    // "nothing new" — it must fall back to the listing and find the head
    for (v <- 1L to 3L)
      raw.delete(new org.apache.hadoop.fs.Path(path,
        f"_manifest/v$v%09d.txt"), false)
    assert(PartitionedLake.latestVersionIn(fs, path, Some(2L)) === Some(5L))
    assert(lists === 2, "vacuumed hint must fall back to a full listing")
  }
}
