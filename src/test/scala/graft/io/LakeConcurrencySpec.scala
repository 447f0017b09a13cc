package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-writer optimistic concurrency: the manifest rename is the only
  * arbitration point, so the race window sits between version resolution
  * and publish. These pins drive [[PartitionedLake.commitStaged]] with a
  * deliberately STALE base manifest — the deterministic equivalent of two
  * committers interleaving — plus a genuinely concurrent public-API smoke.
  */
class LakeConcurrencySpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def fsOf(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def state(path: String): Map[(String, Long), String] =
    PartitionedLake.read(spark, path).collect()
      .map(r => (r.getAs[String]("part"), r.getAs[Long]("k")) ->
        r.getAs[String]("v")).toMap

  test("a committer that loses the publish race rebases when its partitions are disjoint from the winner's") {
    val path = java.nio.file.Files.createTempDirectory("graft-race1").toString + "/lake"
    val fs = fsOf(path)
    PartitionedLake.write(Seq((1L, "p1", "a"), (2L, "p2", "b"))
      .toDF("k", "part", "v"), path, "part")
    // both committers read the SAME manifest (the interleave)
    val base = PartitionedLake.latestManifest(fs, path).get
    val dfA = Seq((1L, "p1", "a2")).toDF("k", "part", "v")
    val dfB = Seq((2L, "p2", "b2")).toDF("k", "part", "v")
    val (stA, sdA) = PartitionedLake.stage(spark, fs, path, dfA, Seq("part"), Nil)
    val (stB, sdB) = PartitionedLake.stage(spark, fs, path, dfB, Seq("part"), Nil)
    // A wins version base+1
    PartitionedLake.commitStaged(fs, path, stA, sdA, sdA.keySet,
      dfA.schema, Some(base), None)
    // B loses the rename race, detects A touched only disjoint
    // partitions, rebases onto A's head, and lands as base+2
    PartitionedLake.commitStaged(fs, path, stB, sdB, sdB.keySet,
      dfB.schema, Some(base), None)
    assert(PartitionedLake.snapshots(spark, path) ===
      Seq(base.version, base.version + 1, base.version + 2))
    assert(state(path) === Map(("p1", 1L) -> "a2", ("p2", 2L) -> "b2"))
  }

  test("overlapping racing committers conflict loudly; the loser's files are unlinked and the winner's snapshot stands") {
    val path = java.nio.file.Files.createTempDirectory("graft-race2").toString + "/lake"
    val fs = fsOf(path)
    PartitionedLake.write(Seq((1L, "p1", "a"), (2L, "p2", "b"))
      .toDF("k", "part", "v"), path, "part")
    val base = PartitionedLake.latestManifest(fs, path).get
    val dfA = Seq((1L, "p1", "winner")).toDF("k", "part", "v")
    val dfB = Seq((1L, "p1", "loser")).toDF("k", "part", "v")
    val (stA, sdA) = PartitionedLake.stage(spark, fs, path, dfA, Seq("part"), Nil)
    val (stB, sdB) = PartitionedLake.stage(spark, fs, path, dfB, Seq("part"), Nil)
    PartitionedLake.commitStaged(fs, path, stA, sdA, sdA.keySet,
      dfA.schema, Some(base), None)
    val filesAfterA = new java.io.File(s"$path/part=p1").listFiles()
      .map(_.getName).toSet
    val e = intercept[RuntimeException] {
      PartitionedLake.commitStaged(fs, path, stB, sdB, sdB.keySet,
        dfB.schema, Some(base), None)
    }
    assert(e.getMessage.contains("conflict"), e.getMessage)
    // the loser's moved files were unlinked — no orphans accumulate
    assert(new java.io.File(s"$path/part=p1").listFiles()
      .map(_.getName).toSet === filesAfterA)
    assert(state(path) === Map(("p1", 1L) -> "winner", ("p2", 2L) -> "b"))
    assert(PartitionedLake.snapshots(spark, path).max === base.version + 1)
  }

  test("a racing duplicate of the same streaming batch is dropped whole (post-race replay guard)") {
    val path = java.nio.file.Files.createTempDirectory("graft-race3").toString + "/lake"
    val fs = fsOf(path)
    PartitionedLake.write(Seq((1L, "p1", "a")).toDF("k", "part", "v"),
      path, "part")
    val base = PartitionedLake.latestManifest(fs, path).get
    val dfA = Seq((2L, "p2", "batch7")).toDF("k", "part", "v")
    val dfB = Seq((3L, "p3", "batch7-dup")).toDF("k", "part", "v")
    val (stA, sdA) = PartitionedLake.stage(spark, fs, path, dfA, Seq("part"), Nil)
    val (stB, sdB) = PartitionedLake.stage(spark, fs, path, dfB, Seq("part"), Nil)
    PartitionedLake.commitStaged(fs, path, stA, sdA, sdA.keySet,
      dfA.schema, Some(base), Some(7L))
    // the duplicate lost the race; even though its partitions are
    // disjoint it must NOT rebase — the winner already folded batch 7
    PartitionedLake.commitStaged(fs, path, stB, sdB, sdB.keySet,
      dfB.schema, Some(base), Some(7L))
    assert(PartitionedLake.snapshots(spark, path).max === base.version + 1)
    assert(state(path) === Map(("p1", 1L) -> "a", ("p2", 2L) -> "batch7"))
  }

  test("concurrent public-API upserts on disjoint partitions all land (threaded smoke)") {
    val path = java.nio.file.Files.createTempDirectory("graft-race4").toString + "/lake"
    PartitionedLake.write(
      (0 until 4).map(i => (0L, s"p$i", "seed")).toDF("k", "part", "v"),
      path, "part")
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map { i =>
      new Thread(() => {
        try {
          for (j <- 1 to 3) {
            PartitionedLake.upsert(spark, path, "part", "k",
              Seq((j.toLong, s"p$i", s"w$i-$j")).toDF("k", "part", "v"))
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errors.isEmpty, errors.toString)
    val got = state(path)
    for (i <- 0 until 4; j <- 1 to 3)
      assert(got((s"p$i", j.toLong)) === s"w$i-$j")
    assert(got.size === 16) // 4 seeds + 12 upserted rows
    // 13 versions published: the initial write + every upsert landed
    assert(PartitionedLake.snapshots(spark, path).size === 13)
  }

  test("per-writer replay guards: one stream's batch ids never swallow another's") {
    val path = java.nio.file.Files.createTempDirectory("graft-writers").toString + "/lake"
    def delta(k: Long, v: String) = Seq((k, "p1", v)).toDF("k", "part", "v")
    def state() = PartitionedLake.read(spark, path).orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSeq
    // stream A is far along (batch 37); stream B is brand new (batch 2).
    // Under a single global txn slot B's batch would be discarded as a
    // "replay" of A's history — the per-writer slots must not.
    PartitionedLake.upsert(spark, path, "part", "k", delta(1L, "a37"),
      batchId = Some(37L), writerId = "stream-A")
    PartitionedLake.upsert(spark, path, "part", "k", delta(2L, "b2"),
      batchId = Some(2L), writerId = "stream-B")
    assert(state() === Seq(1L -> "a37", 2L -> "b2"))
    // each writer's own replay is still dropped whole
    PartitionedLake.upsert(spark, path, "part", "k", delta(1L, "poisonA"),
      batchId = Some(37L), writerId = "stream-A")
    PartitionedLake.upsert(spark, path, "part", "k", delta(2L, "poisonB"),
      batchId = Some(2L), writerId = "stream-B")
    assert(state() === Seq(1L -> "a37", 2L -> "b2"))
    // and both watermarks advance independently
    PartitionedLake.upsert(spark, path, "part", "k", delta(3L, "b3"),
      batchId = Some(3L), writerId = "stream-B")
    PartitionedLake.upsert(spark, path, "part", "k", delta(4L, "a38"),
      batchId = Some(38L), writerId = "stream-A")
    assert(state() === Seq(1L -> "a37", 2L -> "b2", 3L -> "b3", 4L -> "a38"))
  }

  test("a racing full overwrite stays serial-equivalent: it supersedes a partition created after its manifest read") {
    val path = java.nio.file.Files.createTempDirectory("graft-ow").toString + "/lake"
    val fs = fsOf(path)
    PartitionedLake.write(Seq((1L, "p1", "old")).toDF("k", "part", "v"),
      path, "part")
    val base = PartitionedLake.latestManifest(fs, path).get
    // the overwrite stages against `base`...
    val ow = Seq((1L, "p1", "overwritten")).toDF("k", "part", "v")
    val (st, sd) = PartitionedLake.stage(spark, fs, path, ow, Seq("part"), Nil)
    // ...while a concurrent upsert creates a brand-new partition p9
    PartitionedLake.upsert(spark, path, "part", "k",
      Seq((9L, "p9", "sneaky")).toDF("k", "part", "v"))
    // the overwrite loses the race; its contract is "the lake becomes
    // exactly this snapshot", so the rebase must supersede p9 too —
    // disjoint-rebase would leave sneaky rows the overwrite promised
    // to wipe
    PartitionedLake.commitStaged(fs, path, st, sd,
      PartitionedLake.allDirs(base) ++ sd.keySet,
      ow.schema, Some(base), None, fullOverwrite = true)
    assert(state(path) === Map(("p1", 1L) -> "overwritten"))
  }

  test("racing merge-on-read lineages with different key columns conflict loudly") {
    import org.apache.spark.sql.functions.lit
    val path = java.nio.file.Files.createTempDirectory("graft-morkey").toString + "/lake"
    val fs = fsOf(path)
    PartitionedLake.write(Seq((1L, "p1", "a"), (2L, "p2", "b"))
      .toDF("k", "part", "v"), path, "part")
    val base = PartitionedLake.latestManifest(fs, path).get
    // writer X lands a MOR batch keyed by 'k' (head now carries deltas)
    PartitionedLake.cdcSinkMergeOnRead(spark, path, "part", "k", "v",
      Seq((1L, "p1", 1L, "U", "a2")).toDF("k", "part", "seq", "op", "val"))
    // writer Y computed a MOR log keyed by a DIFFERENT column against
    // the stale base and loses the race on disjoint partition p2: a
    // disjoint rebase would publish mor='k2' over X's 'k'-keyed log
    val fakeLog = Seq((2L, "p2", "x", "U")).toDF("k2", "part", "v", "__graft_op")
      .withColumn("ignore", lit(1)).drop("ignore")
    val (st, sd) = PartitionedLake.stage(spark, fs, path, fakeLog,
      Seq("part"), Nil)
    val e = intercept[RuntimeException] {
      PartitionedLake.commitStaged(fs, path, st, Map.empty, Set.empty,
        base.schema, Some(base), None,
        stagedDeltas = sd, deltaStaging = Some(st),
        morKey = Some("k2"), replacedDeltas = Some(sd.keySet))
    }
    assert(e.getMessage.contains("keyed"), e.getMessage)
    // X's log survives untouched
    assert(state(path) === Map(("p1", 1L) -> "a2", ("p2", 2L) -> "b"))
  }

  test("model check with interleaved committers: every raced disjoint pair lands; read == model throughout") {
    val path = java.nio.file.Files.createTempDirectory("graft-race5").toString + "/lake"
    val fs = fsOf(path)
    val rnd = new scala.util.Random(31)
    var model = Map.empty[(String, Long), String]
    PartitionedLake.write(
      Seq((0L, "p0", "s0"), (0L, "p1", "s1"), (0L, "p2", "s2"))
        .toDF("k", "part", "v"), path, "part")
    model = Map(("p0", 0L) -> "s0", ("p1", 0L) -> "s1", ("p2", 0L) -> "s2")
    // a raced committer stages its partition's full MERGED content (what
    // upsert would stage), computed against the shared stale base
    def mergedRows(p: String, k: Long, v: String) =
      model.collect { case ((pp, kk), vv) if pp == p && kk != k =>
        (kk, pp, vv) }.toSeq :+ ((k, p, v))
    for (step <- 1 to 8) {
      // pick two DISTINCT partitions and race one single-partition
      // upsert against another, both computed from the same stale base
      val Seq(pa, pb) = rnd.shuffle(Seq("p0", "p1", "p2")).take(2)
      val ka = rnd.nextInt(4).toLong; val kb = rnd.nextInt(4).toLong
      val va = s"a$step"; val vb = s"b$step"
      val base = PartitionedLake.latestManifest(fs, path).get
      val dfA = mergedRows(pa, ka, va).toDF("k", "part", "v")
      val dfB = mergedRows(pb, kb, vb).toDF("k", "part", "v")
      val (stA, sdA) = PartitionedLake.stage(spark, fs, path, dfA, Seq("part"), Nil)
      val (stB, sdB) = PartitionedLake.stage(spark, fs, path, dfB, Seq("part"), Nil)
      PartitionedLake.commitStaged(fs, path, stA, sdA, sdA.keySet,
        dfA.schema, Some(base), None)
      PartitionedLake.commitStaged(fs, path, stB, sdB, sdB.keySet,
        dfB.schema, Some(base), None)
      model += ((pa, ka) -> va); model += ((pb, kb) -> vb)
      assert(state(path) === model, s"divergence after raced step $step")
    }
  }

  test("grace-window vacuum interleaved with a live committer thread never breaks a published snapshot") {
    val path = java.nio.file.Files.createTempDirectory("graft-vacrace").toString + "/lake"
    val fs = fsOf(path)

    PartitionedLake.write(Seq((0L, "p0", "s0")).toDF("k", "part", "v"),
      path, "part")
    // committer thread: a stream of single-partition upserts, each
    // staging files into live + NEW partition dirs before its publish —
    // exactly the moved-but-unpublished window vacuum races
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val committer = new Thread(() => {
      try {
        for (i <- 1 to 12) {
          PartitionedLake.upsert(spark, path, "part", "k",
            Seq((i.toLong, s"p${i % 4}", s"v$i")).toDF("k", "part", "v"))
        }
      } catch { case t: Throwable => errors.add(t) }
      finally done.set(true)
    })
    committer.start()
    // vacuum continuously during the commit stream, with a grace window
    // far above any commit's stage-to-publish latency
    while (!done.get()) {
      PartitionedLake.vacuum(spark, path, keepLast = 1,
        graceMs = 60 * 60 * 1000L)
    }
    committer.join(120000)
    assert(errors.isEmpty, s"committer failed under vacuum: ${errors.peek()}")
    // every file the final snapshot references exists, and the read is
    // exactly the serial result of the 12 upserts
    val m = PartitionedLake.latestManifest(fs, path).get
    PartitionedLake.allDirs(m).foreach { d =>
      m.files.getOrElse(d, Nil).foreach { e =>
        assert(fs.exists(new org.apache.hadoop.fs.Path(path, s"$d/${e.name}")),
          s"published snapshot references vacuumed file $d/${e.name}")
      }
    }
    val expect = Map(("p0", 0L) -> "s0") ++
      (1 to 12).map(i => (s"p${i % 4}", i.toLong) -> s"v$i")
    assert(state(path) === expect)
  }
}
