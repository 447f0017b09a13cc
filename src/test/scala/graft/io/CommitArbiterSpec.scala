package graft.io

import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

/** A conditional-PUT double: compare-and-swap create emulated over the
  * local FS under a JVM-wide lock — the exact contract an S3
  * `PutObject If-None-Match: *` (or GCS generation-match 0) adapter
  * provides. Lives at top level with a no-arg constructor because the
  * lake instantiates arbiters reflectively from the conf, like a
  * deployment's real adapter would be.
  */
class CasArbiterDouble extends CommitArbiter {
  override def publishIfAbsent(fs: FileSystem, tmp: Path,
      dst: Path): Boolean = CasArbiterDouble.lock.synchronized {
    CasArbiterDouble.calls.incrementAndGet()
    if (fs.exists(dst)) false
    else {
      val in = fs.open(tmp)
      val out = try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 65536, false)
        buf.toByteArray
      } finally in.close()
      val os = fs.create(dst, false)
      try os.write(out) finally os.close()
      true
    }
  }
}

object CasArbiterDouble {
  val lock = new Object
  val calls = new AtomicInteger(0)
}

/** The pluggable commit-arbitration seam: a deployment-provided CAS
  * primitive replaces the scheme-based rename arbitration, so object
  * stores without atomic no-replace rename run the FULL multi-writer
  * protocol (win/lose/rebase) instead of opting into the unsafe
  * fallback.
  */
class CommitArbiterSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def withArbiter(f: => Unit): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("graft.lake.commit.arbiter", classOf[CasArbiterDouble].getName)
    try f finally hc.unset("graft.lake.commit.arbiter")
  }

  test("commits route through the configured arbiter; racing committers get exactly one winner and the loser rebases") {
    withArbiter {
      val path = java.nio.file.Files.createTempDirectory("graft-arb").toString + "/lake"
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val before = CasArbiterDouble.calls.get()
      PartitionedLake.write(Seq((1L, "p1", "a"), (2L, "p2", "b"))
        .toDF("k", "part", "v"), path, "part")
      assert(CasArbiterDouble.calls.get() > before,
        "publish did not route through the configured arbiter")
      // the full optimistic-concurrency story under CAS arbitration:
      // both committers stage from the same base; the loser's CAS
      // returns false and it rebases onto the winner's head
      val base = PartitionedLake.latestManifest(fs, path).get
      val dfA = Seq((1L, "p1", "a2")).toDF("k", "part", "v")
      val dfB = Seq((2L, "p2", "b2")).toDF("k", "part", "v")
      val (stA, sdA) = PartitionedLake.stage(spark, fs, path, dfA, Seq("part"), Nil)
      val (stB, sdB) = PartitionedLake.stage(spark, fs, path, dfB, Seq("part"), Nil)
      PartitionedLake.commitStaged(fs, path, stA, sdA, sdA.keySet,
        dfA.schema, Some(base), None)
      PartitionedLake.commitStaged(fs, path, stB, sdB, sdB.keySet,
        dfB.schema, Some(base), None)
      assert(PartitionedLake.snapshots(spark, path) ===
        Seq(base.version, base.version + 1, base.version + 2))
      val got = PartitionedLake.read(spark, path).collect()
        .map(r => (r.getAs[String]("part"), r.getAs[Long]("k")) ->
          r.getAs[String]("v")).toMap
      assert(got === Map(("p1", 1L) -> "a2", ("p2", 2L) -> "b2"))
      // a direct same-version double publish: the CAS refuses the second
      val m = PartitionedLake.latestManifest(fs, path).get
      assert(!PartitionedLake.tryPublishManifest(fs, path, m),
        "arbiter allowed a second publish of an existing version")
    }
  }

  test("composition: the full random-op model run under CAS arbitration AND forced v2 sharded manifests") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("graft.lake.commit.arbiter", classOf[CasArbiterDouble].getName)
    hc.setInt("graft.lake.manifest.shards", 3)
    try graft.LakeModelHarness.run()
    finally {
      hc.unset("graft.lake.commit.arbiter")
      hc.unset("graft.lake.manifest.shards")
    }
  }

  test("the arbiter seam bypasses the non-atomic-scheme gate (it IS the safe path for such schemes)") {
    // on file:// the gate never fires, so prove the precedence directly:
    // with an arbiter configured the publish path goes through it even
    // though file:// has its own built-in arbitration
    withArbiter {
      val path = java.nio.file.Files.createTempDirectory("graft-arb2").toString + "/lake"
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val before = CasArbiterDouble.calls.get()
      PartitionedLake.publishManifest(fs, path, PartitionedLake.Manifest(1L,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType))), Map.empty))
      assert(CasArbiterDouble.calls.get() === before + 1)
      assert(PartitionedLake.latestManifest(fs, path).exists(_.version == 1L))
    }
  }
}
