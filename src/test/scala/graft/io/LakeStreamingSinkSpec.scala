package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The NATIVE DSv2 streaming sink
  * (`df.writeStream.format("graft-lake-v2")` — [[LakeStreamingWrite]]):
  * every epoch commits exactly-once through the snapshot protocol, so
  * stream-written versions time-travel and feed the change-feed source
  * like any batch commit, and a kill-and-restart never double-applies
  * an epoch.
  */
class LakeStreamingSinkSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-v2sink-$tag").toString

  private def rowsOf(lake: String): Set[(String, Long, Double)] =
    PartitionedLake.read(spark, lake).select("part", "k", "bal").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  private def seed(lake: String): Unit =
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), lake, "part")

  test("keyed upsert stream: epochs merge by identity, snapshots time-travel, and the change feed serves stream-written versions") {
    val dir = freshDir("upsert"); val lake = s"$dir/lake"
    seed(lake) // v1
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Double)]
    val q = mem.toDF().toDF("k", "part", "bal")
      .writeStream.format("graft-lake-v2")
      .option("path", lake).option("keyCol", "k")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      mem.addData((1L, "a", 10.0), (3L, "c", 3.0))
      q.processAllAvailable()
      assert(rowsOf(lake) ===
        Set(("a", 1L, 10.0), ("b", 2L, 2.0), ("c", 3L, 3.0)))
      mem.addData((3L, "c", 30.0))
      q.processAllAvailable()
      assert(rowsOf(lake) ===
        Set(("a", 1L, 10.0), ("b", 2L, 2.0), ("c", 3L, 30.0)))
    } finally q.stop()
    // stream-written commits are ordinary snapshots: the pre-stream
    // version still reads, and the change feed classifies the stream's
    // net effect
    val vs = PartitionedLake.snapshots(spark, lake)
    assert(vs.size === 3) // seed + two epochs
    assert(rowsOf(lake) !==
      PartitionedLake.readVersion(spark, lake, vs.head)
        .select("part", "k", "bal").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet)
    val changes = PartitionedLake.changesBetween(spark, lake,
      vs.head, vs.last, Seq("k"))
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(changes === Set((1L, "update_preimage"),
      (1L, "update_postimage"), (3L, "insert")))
    // no staging debris outside the live epoch
    val staging = new java.io.File(s"$lake/_staging")
    assert(!staging.exists() || staging.listFiles().isEmpty)
  }

  test("schema evolution under a running stream: RENAME and WIDEN refuse the epoch loudly (never silent misbinding); ADD COLUMNS adopts; a failed epoch keeps its staged files for the retry") {
    // A stream's write schema is pinned at start; a batch writer
    // evolving the lake between epochs must never silently misbind
    // columns. The pinned outcomes, per DML shape:
    //  - RENAME under the stream -> the epoch commit refuses loudly
    //    (the append gate's suspected-rename check: the stream still
    //    writes the OLD name, and adopting would resurrect it as a
    //    drop+add);
    //  - WIDEN under the stream -> refuses loudly (type gate: epoch
    //    files carry the narrow type, union-by-name never coerces);
    //  - ADD COLUMNS under the stream -> ADOPTS: the epoch commits,
    //    stream rows read null for the new column, batch rows keep
    //    their values (plain additive evolution).
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def run(tag: String)(evolve: String => Unit)
        : Either[Throwable, Set[(String, Long, Double)]] = {
      val dir = freshDir(tag); val lake = s"$dir/lake"
      seed(lake)
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, Double)]
      val q = mem.toDF().toDF("k", "part", "bal")
        .writeStream.format("graft-lake-v2")
        .option("path", lake)
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
      try {
        mem.addData((3L, "c", 3.0))
        q.processAllAvailable() // epoch 0 lands pre-evolution
        evolve(lake)
        mem.addData((4L, "c", 4.0))
        try {
          q.processAllAvailable()
          Right(rowsOf(lake))
        } catch { case t: Throwable =>
          // the failed epoch must RETAIN its staged files (completed
          // task output survives for the engine's retry of the same
          // epoch — a non-replayable source would otherwise lose it)
          val staged = new java.io.File(s"$lake/_staging")
          assert(staged.exists() && staged.listFiles().nonEmpty,
            "a refused epoch commit must not discard its staged files")
          Left(t)
        }
      } finally q.stop()
    }

    val renamed = run("ev-rename")(lake =>
      PartitionedLake.renameColumn(spark, lake, "bal", "balance"))
    assert(renamed.isLeft, "rename under a stream must refuse the epoch")
    assert(renamed.left.exists(t => String.valueOf(t.getMessage)
        .contains("suspected column rename") ||
        Option(t.getCause).exists(c => String.valueOf(c.getMessage)
          .contains("suspected column rename"))),
      s"got: ${renamed.left.map(_.getMessage)}")

    val widened = run("ev-widen")(lake =>
      PartitionedLake.widenColumnType(spark, lake, "k",
        org.apache.spark.sql.types.DecimalType(20, 0)))
    assert(widened.isLeft, "widen under a stream must refuse the epoch")
    assert(widened.left.exists(t => String.valueOf(t.getMessage)
        .contains("type change") ||
        Option(t.getCause).exists(c => String.valueOf(c.getMessage)
          .contains("type change"))),
      s"got: ${widened.left.map(_.getMessage)}")

    val added = run("ev-add")(lake =>
      PartitionedLake.addColumns(spark, lake,
        Seq(org.apache.spark.sql.types.StructField("note",
          org.apache.spark.sql.types.StringType))))
    assert(added.isRight, s"ADD COLUMNS under a stream must adopt, " +
      s"got ${added.left.map(_.getMessage)}")
    assert(added.toOption.get === Set(("a", 1L, 1.0), ("b", 2L, 2.0),
      ("c", 3L, 3.0), ("c", 4L, 4.0)))
  }

  test("restart from the same checkpoint resumes the replay guard: a redelivered epoch id is skipped whole, new epochs land") {
    val dir = freshDir("restart"); val lake = s"$dir/lake"
    seed(lake)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Double)]
    def start() = mem.toDF().toDF("k", "part", "bal")
      .writeStream.format("graft-lake-v2")
      .option("path", lake).option("keyCol", "k")
      .option("writerId", "restart-spec")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    val q1 = start()
    try {
      mem.addData((1L, "a", 11.0))
      q1.processAllAvailable()
    } finally q1.stop()
    val afterFirst = rowsOf(lake)
    val versionsAfterFirst = PartitionedLake.snapshots(spark, lake).size
    // the kill-and-restart contract, exercised directly at the guard:
    // a replay of epoch 0 must be dropped WHOLE (no rows, no version)
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((1L, "a", 999.0)).toDF("k", "part", "bal"),
      batchId = Some(0L), writerId = "restart-spec")
    assert(rowsOf(lake) === afterFirst, "replayed epoch must not apply")
    assert(PartitionedLake.snapshots(spark, lake).size ===
      versionsAfterFirst, "replayed epoch must not publish a version")
    // and a restarted query continues from the checkpoint with fresh
    // epoch ids that DO land
    val q2 = start()
    try {
      mem.addData((5L, "a", 5.0))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(rowsOf(lake) === afterFirst + (("a", 5L, 5.0)))
  }

  test("append mode without keyCol: epochs append (duplicates are the stream's own semantics), exactly-once per epoch") {
    val dir = freshDir("append"); val lake = s"$dir/lake"
    seed(lake)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Double)]
    val q = mem.toDF().toDF("k", "part", "bal")
      .writeStream.format("graft-lake-v2")
      .option("path", lake)
      .option("writerId", "append-spec")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      mem.addData((2L, "b", 20.0)) // same key as a seeded row: appends
      q.processAllAvailable()
    } finally q.stop()
    assert(PartitionedLake.read(spark, lake).count() === 3L)
    assert(PartitionedLake.read(spark, lake)
      .filter(col("k") === 2L).count() === 2L,
      "append mode must not merge by key")
    // replayed epoch: dropped whole by the append-side guard
    PartitionedLake.append(
      Seq((9L, "b", 9.0)).toDF("k", "part", "bal"), lake, Seq("part"),
      batchId = Some(0L), writerId = "append-spec")
    assert(PartitionedLake.read(spark, lake).count() === 3L)
  }

  test("complete mode: each epoch is a full snapshot overwrite (streaming aggregate materialization)") {
    val dir = freshDir("complete"); val lake = s"$dir/lake"
    // complete mode still needs an existing layout to write into
    PartitionedLake.write(Seq(("a", 0L)).toDF("part", "n"), lake, "part")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val q = mem.toDF().toDF("part", "v")
      .groupBy("part").agg(count("*").as("n"))
      .writeStream.format("graft-lake-v2").outputMode("complete")
      .option("path", lake)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      mem.addData(("a", 1L), ("a", 2L), ("b", 3L))
      q.processAllAvailable()
      assert(PartitionedLake.read(spark, lake).select("part", "n")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
        Set(("a", 2L), ("b", 1L)))
      mem.addData(("b", 4L))
      q.processAllAvailable()
      assert(PartitionedLake.read(spark, lake).select("part", "n")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
        Set(("a", 2L), ("b", 2L)),
        "complete mode must replace the snapshot, not accumulate")
    } finally q.stop()
  }

  test("lake-to-lake replication: change-feed source -> DSv2 sink; the replica converges across commits AND across a kill-and-restart from the checkpoint") {
    val dir = freshDir("repl")
    val src = s"$dir/src"; val dst = s"$dir/dst"
    seed(src) // v1
    PartitionedLake.createEmpty(spark, dst,
      PartitionedLake.read(spark, src).schema, Seq("part"))
    def replicate() = spark.readStream.format("graft-lake-cdf")
      .option("path", src).option("keyCols", "k").load()
      // upsert replication: inserts + post-images apply by key (delete
      // replication is the foreachBatch + cdcSink idiom — the sink's
      // upsert mode deliberately has no delete channel)
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .drop("_change_type")
      .writeStream.format("graft-lake-v2")
      .option("path", dst).option("keyCol", "k")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    def converged(): Unit = assert(
      PartitionedLake.read(spark, dst).select("part", "k", "bal")
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
        === rowsOf(src))
    val q1 = replicate()
    try {
      q1.processAllAvailable()
      converged() // bootstrap: v1 arrived as inserts
      PartitionedLake.upsert(spark, src, "part", "k",
        Seq((1L, "a", 10.0), (7L, "c", 7.0)).toDF("k", "part", "bal"))
      q1.processAllAvailable()
      converged() // update + insert flowed through
    } finally q1.stop()
    // commits land while the stream is DOWN; the restarted stream picks
    // up from the checkpointed version offset and catches up
    PartitionedLake.upsert(spark, src, "part", "k",
      Seq((7L, "c", 77.0), (8L, "a", 8.0)).toDF("k", "part", "bal"))
    val q2 = replicate()
    try { q2.processAllAvailable(); converged() } finally q2.stop()
    // replica history is real lake history: each replicated epoch is a
    // time-travelable snapshot
    assert(PartitionedLake.snapshots(spark, dst).size >= 3)
  }

  test("streaming WAP: a stream started under an ambient branch stages its epochs on the branch (main blind until publish)") {
    val dir = freshDir("swap"); val lake = s"$dir/lake"
    seed(lake)
    PartitionedLake.createBranch(spark, lake, "ingest")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Double)]
    spark.conf.set(PartitionedLake.BranchKey, "ingest")
    try {
      val q = mem.toDF().toDF("k", "part", "bal")
        .writeStream.format("graft-lake-v2")
        .option("path", lake).option("keyCol", "k")
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
      try {
        mem.addData((9L, "a", 9.0))
        q.processAllAvailable()
      } finally q.stop()
      // the branch sees the streamed row...
      assert(rowsOf(lake).contains(("a", 9L, 9.0)))
    } finally spark.conf.unset(PartitionedLake.BranchKey)
    // ...main does not, until publish
    assert(!rowsOf(lake).contains(("a", 9L, 9.0)))
    PartitionedLake.publishBranch(spark, lake, "ingest")
    assert(rowsOf(lake).contains(("a", 9L, 9.0)))
  }

  test("refusals: a stream missing a partition column, and a keyCol that is not a stream column") {
    val dir = freshDir("refuse"); val lake = s"$dir/lake"
    seed(lake)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double)]
    val e = intercept[Exception] {
      val q = mem.toDF().toDF("k", "bal")
        .writeStream.format("graft-lake-v2")
        .option("path", lake).option("keyCol", "k")
        .option("checkpointLocation", s"$dir/ckpt1")
        .start()
      try { mem.addData((1L, 1.0)); q.processAllAvailable() }
      finally q.stop()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " " + msgs(t.getCause)
    // refused at table resolution: the stream's schema is the declared
    // schema, and it is missing the lake's partition column
    assert(msgs(e).contains("does not match the lake's manifest schema"))
    val mem2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Double)]
    val e2 = intercept[Exception] {
      val q = mem2.toDF().toDF("k", "part", "bal")
        .writeStream.format("graft-lake-v2")
        .option("path", lake).option("keyCol", "nope")
        .option("checkpointLocation", s"$dir/ckpt2")
        .start()
      try { mem2.addData((1L, "a", 1.0)); q.processAllAvailable() }
      finally q.stop()
    }
    assert(msgs(e2).contains("keyCol"))
  }
}
