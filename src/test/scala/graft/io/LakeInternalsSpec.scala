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

  test("publishing the same manifest version twice fails loudly (single-committer contract)") {
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
      txn = Some(42L))
    PartitionedLake.publishManifest(fs, path, m)
    val back = PartitionedLake.latestManifest(fs, path).get
    assert(back.version === 3L)
    assert(back.txn === Some(42L))
    assert(back.schema === schema)
    assert(back.files.view.mapValues(_.sortBy(_.name)).toMap ===
      m.files.view.mapValues(_.sortBy(_.name)).toMap)
  }
}
