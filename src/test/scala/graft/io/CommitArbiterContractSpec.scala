package graft.io

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The reusable certification suite for a [[CommitArbiter]]
  * implementation: subclass with your arbiter's class and (for a real
  * object store) a scratch path ON THAT STORE, and the suite runs
  *
  *  1. the dependency-free primitive contract
  *     ([[CommitArbiterContract.certify]]: create-wins, no-replace,
  *     temp preserved, N-way race with exactly one winner, sequential
  *     composition);
  *  2. whole-protocol composition: two lake committers staged from the
  *     same base racing through the arbiter — exactly one wins the
  *     version, the loser REBASES (disjoint partitions) and both
  *     changes land;
  *  3. the full random-op lake model check with every commit arbitrated
  *     by this arbiter.
  *
  * The in-repo CAS double certifies by subclassing
  * ([[CasArbiterContractCertification]]) — a deployer's S3/GCS arbiter
  * certifies the same way:
  *
  * {{{
  * class S3ArbiterCertification extends CommitArbiterContractSpec {
  *   override def arbiterClass = classOf[S3CasArbiter]
  *   override def scratchPath = new Path("s3://bucket/graft-contract")
  * }
  * }}}
  */
abstract class CommitArbiterContractSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  /** The arbiter under certification — needs the public no-arg
    * constructor the lake's reflective instantiation requires.
    */
  def arbiterClass: Class[_ <: CommitArbiter]

  /** Where the primitive contract runs — MUST be on the storage system
    * the arbiter targets (certifying an S3 arbiter on file:// proves
    * nothing about S3's conditional PUT). Default: a local temp dir,
    * right for arbiters that wrap the local/test filesystem.
    */
  def scratchPath: Path = new Path(java.nio.file.Files
    .createTempDirectory("graft-arbiter-contract").toString)

  private def withArbiter[A](f: => A): A = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("graft.lake.commit.arbiter", arbiterClass.getName)
    try f finally hc.unset("graft.lake.commit.arbiter")
  }

  test("primitive contract: create-wins, no-replace, temp preserved, one race winner, sequential composition") {
    val arbiter = arbiterClass.getDeclaredConstructor().newInstance()
    val failures = CommitArbiterContract.certify(arbiter,
      spark.sparkContext.hadoopConfiguration, scratchPath)
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("whole-protocol composition: racing committers arbitrate to one winner per version; the loser rebases") {
    withArbiter {
      val path = java.nio.file.Files
        .createTempDirectory("graft-arb-proto").toString + "/lake"
      val fs = new Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      PartitionedLake.write(Seq((1L, "p1", "a"), (2L, "p2", "b"))
        .toDF("k", "part", "v"), path, "part")
      val base = PartitionedLake.latestManifest(fs, path).get
      // both committers stage against the same base, touching DISJOINT
      // partitions — the protocol's rebase case
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
      // same-version double publish: the arbiter refuses the second
      val m = PartitionedLake.latestManifest(fs, path).get
      assert(!PartitionedLake.tryPublishManifest(fs, path, m))
    }
  }

  test("model-check composition: the full random-op lake model runs with every commit arbitrated") {
    withArbiter(graft.LakeModelHarness.run())
  }
}

/** The in-repo conditional-PUT double, certified through the reusable
  * contract suite — the same three layers a deployment's real S3/GCS
  * arbiter would run.
  */
class CasArbiterContractCertification extends CommitArbiterContractSpec {
  override def arbiterClass: Class[_ <: CommitArbiter] =
    classOf[CasArbiterDouble]
}
