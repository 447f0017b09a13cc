package graft

import graft.io.PartitionedLake
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The engine-managed streaming form of the change feed:
  * `spark.readStream.format("graft-lake-cdf")` — offsets are snapshot
  * versions, recovery replays from the checkpointed version, and the
  * materialized feed reconstructs the lake.
  */
class LakeChangeFeedStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def applyFeed(state: scala.collection.mutable.Map[(String, Long), Double],
      rows: Array[org.apache.spark.sql.Row]): Unit =
    rows.foreach { r =>
      val id = (r.getAs[String]("part"), r.getAs[Long]("k"))
      r.getAs[String]("_change_type") match {
        case "insert" | "update_postimage" => state(id) = r.getAs[Double]("bal")
        case "delete" => state.remove(id)
        case "update_preimage" => ()
      }
    }

  test("readStream over the lake CDF: bootstrap + incremental batches reconstruct the lake; checkpoint recovery resumes from the committed version") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdf-stream").toString
    val lake = s"$dir/lake"
    val ckpt = s"$dir/ckpt"
    PartitionedLake.write(Seq((1L, "p1", 10.0), (2L, "p2", 20.0))
      .toDF("k", "part", "bal"), lake, "part")
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((1L, "p1", 11.0), (3L, "p2", 30.0)).toDF("k", "part", "bal"))

    val state = scala.collection.mutable.Map[(String, Long), Double]()
    var batches = 0
    def start() = spark.readStream.format("graft-lake-cdf")
      .option("path", lake).option("keyCols", "part,k")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += 1
        applyFeed(state, df.collect())
      }
      .start()

    val q1 = start()
    try {
      q1.processAllAvailable()
      // bootstrap (v1 as inserts) + the v1->v2 diff arrived
      assert(state.toMap === Map(("p1", 1L) -> 11.0, ("p2", 2L) -> 20.0,
        ("p2", 3L) -> 30.0))
      // new commits while the stream is live: a CDC delete + an upsert
      PartitionedLake.cdcSink(spark, lake, "part", "k", "bal",
        Seq((2L, "p2", 1L, "D", 0.0)).toDF("k", "part", "seq", "op", "val"))
      q1.processAllAvailable()
      assert(state.toMap === Map(("p1", 1L) -> 11.0, ("p2", 3L) -> 30.0))
    } finally q1.stop()

    // commits while the stream is DOWN, including a merge-on-read batch
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((4L, "p1", 40.0)).toDF("k", "part", "bal"))
    PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
      Seq((1L, "p1", 2L, "U", 12.0)).toDF("k", "part", "seq", "op", "val"))

    val batchesBeforeRestart = batches
    val q2 = start()
    try {
      q2.processAllAvailable()
      // recovery resumed from the checkpointed version: the offline
      // commits arrived as ONE net diff, no bootstrap replay
      assert(batches > batchesBeforeRestart)
      assert(state.toMap === Map(("p1", 1L) -> 12.0, ("p2", 3L) -> 30.0,
        ("p1", 4L) -> 40.0))
    } finally q2.stop()

    // the materialized feed equals the lake
    val latest = PartitionedLake.read(spark, lake).collect()
      .map(r => (r.getAs[String]("part"), r.getAs[Long]("k")) ->
        r.getAs[Double]("bal")).toMap
    assert(state.toMap === latest)
  }

  test("granularity=commit: batches carry per-version changes tagged _commit_version, composing with rate limiting") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdf-commitg").toString
    val lake = s"$dir/lake"
    PartitionedLake.write(Seq((1L, "p1", 10.0)).toDF("k", "part", "bal"),
      lake, "part")
    // churn that net granularity would collapse: k=9 inserted in v2,
    // deleted in v3; plus an unrelated v4
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((9L, "p1", 99.0)).toDF("k", "part", "bal"))
    PartitionedLake.cdcSink(spark, lake, "part", "k", "bal",
      Seq((9L, "p1", 1L, "D", 0.0)).toDF("k", "part", "seq", "op", "val"))
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((2L, "p2", 20.0)).toDF("k", "part", "bal"))
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
    var batches = 0
    val q = spark.readStream.format("graft-lake-cdf")
      .option("path", lake).option("keyCols", "part,k")
      .option("granularity", "commit")
      .option("maxVersionsPerTrigger", "2")
      .load()
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += 1
        df.collect().foreach(r => seen += ((r.getAs[Long]("_commit_version"),
          r.getAs[Long]("k"), r.getAs[String]("_change_type"))))
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // the 4-version backlog drained over >= 2 rate-limited batches, and
    // the per-commit history is complete: churn visible, each change
    // tagged with its own version
    assert(batches >= 2, s"rate limit did not split the backlog ($batches)")
    assert(seen.toSet === Set(
      (1L, 1L, "insert"),
      (2L, 9L, "insert"),
      (3L, 9L, "delete"),
      (4L, 2L, "insert")))
  }

  test("mid-stream additive evolution: rows keep flowing under the start-time schema; restart surfaces the new column") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdf-evolve").toString
    val lake = s"$dir/lake"
    PartitionedLake.write(Seq((1L, "p1", 10.0)).toDF("k", "part", "bal"),
      lake, "part")
    val cols = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    def start() = spark.readStream.format("graft-lake-cdf")
      .option("path", lake).option("keyCols", "part,k")
      .load()
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty) cols += df.columns.toSeq
        df.collect().foreach(r =>
          rows += ((r.getAs[Long]("k"), r.getAs[Double]("bal"))))
      }
      .start()
    val q = start()
    try {
      q.processAllAvailable()
      // a widening commit lands mid-stream: its rows flow under the
      // START-TIME schema (new column not yet surfaced, no failure)
      PartitionedLake.upsert(spark, lake, "part", "k",
        Seq((2L, "p1", 20.0, "x")).toDF("k", "part", "bal", "note"))
      q.processAllAvailable()
      assert(rows.toSeq === Seq(1L -> 10.0, 2L -> 20.0))
      assert(cols.forall(_ === Seq("k", "part", "bal", "_change_type")))
    } finally q.stop()
    // restart picks up the widened schema
    cols.clear()
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((3L, "p1", 30.0, "y")).toDF("k", "part", "bal", "note"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(cols.nonEmpty &&
        cols.forall(_ === Seq("k", "part", "bal", "note", "_change_type")))
    } finally q2.stop()
  }

  test("startingVersion=latest skips history; only post-start commits stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdf-latest").toString
    val lake = s"$dir/lake"
    PartitionedLake.write(Seq((1L, "p1", 10.0)).toDF("k", "part", "bal"),
      lake, "part")
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((2L, "p1", 20.0)).toDF("k", "part", "bal"))
    val seen = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = spark.readStream.format("graft-lake-cdf")
      .option("path", lake).option("keyCols", "part,k")
      .option("startingVersion", "latest")
      .load()
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          seen += ((r.getAs[Long]("k"), r.getAs[String]("_change_type"))))
      }
      .start()
    try {
      q.processAllAvailable()
      assert(seen.isEmpty) // history skipped
      PartitionedLake.upsert(spark, lake, "part", "k",
        Seq((3L, "p1", 30.0)).toDF("k", "part", "bal"))
      q.processAllAvailable()
      assert(seen.toSeq === Seq(3L -> "insert"))
    } finally q.stop()
    // commits while the stream is DOWN must be delivered on restart:
    // startingVersion only gates the FIRST start — after a checkpoint
    // exists, the committed offset owns progress (re-applying "latest"
    // on restart would silently withhold the downtime commits)
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((4L, "p1", 40.0)).toDF("k", "part", "bal"))
    val q2 = spark.readStream.format("graft-lake-cdf")
      .option("path", lake).option("keyCols", "part,k")
      .option("startingVersion", "latest")
      .load()
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          seen += ((r.getAs[Long]("k"), r.getAs[String]("_change_type"))))
      }
      .start()
    try {
      q2.processAllAvailable()
      assert(seen.toSeq === Seq(3L -> "insert", 4L -> "insert"))
    } finally q2.stop()
  }

  test("bootstrap across an evolved lake: the v1-as-inserts union with the forward diff aligns to the stream schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdf-boot").toString
    val lake = s"$dir/lake"
    // v1 under the narrow schema; v2 widens with `note`
    PartitionedLake.write(Seq((1L, "p1", 10.0)).toDF("k", "part", "bal"),
      lake, "part")
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((2L, "p1", 20.0, "n2")).toDF("k", "part", "bal", "note"))
    // a FRESH stream bootstraps from version 0: the v1 snapshot (no
    // `note`) unions with the v1->v2 diff (has `note`) — both must
    // align to the stream's widened schema instead of crashing
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = spark.readStream.format("graft-lake-cdf")
      .option("path", lake).option("keyCols", "part,k")
      .load()
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          rows += ((r.getAs[Long]("k"), r.getAs[String]("note"))))
      }
      .start()
    try {
      q.processAllAvailable()
      assert(rows.sortBy(_._1).toSeq === Seq(1L -> null, 2L -> "n2"))
    } finally q.stop()
  }

  test("maxVersionsPerTrigger drains a backlog across bounded batches with correct per-range net semantics") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdf-cap").toString
    val lake = s"$dir/lake"
    PartitionedLake.write(Seq((1L, "p1", 1.0)).toDF("k", "part", "bal"),
      lake, "part")
    // a 6-commit backlog BEFORE the stream starts, including churn that
    // must collapse within a capped range but not across ranges
    for (i <- 2 to 7)
      PartitionedLake.upsert(spark, lake, "part", "k",
        Seq((i.toLong, "p1", i * 1.0), (1L, "p1", i * 10.0))
          .toDF("k", "part", "bal"))
    val state = scala.collection.mutable.Map[(String, Long), Double]()
    val batchSizes = scala.collection.mutable.ArrayBuffer[Int]()
    val q = spark.readStream.format("graft-lake-cdf")
      .option("path", lake).option("keyCols", "part,k")
      .option("maxVersionsPerTrigger", "2")
      .load()
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.collect()
        batchSizes += rows.length
        applyFeed(state, rows)
      }
      .start()
    try {
      q.processAllAvailable()
      // the backlog (bootstrap v1 + diffs to v7) arrived over MULTIPLE
      // capped batches, not one catch-up batch
      assert(batchSizes.count(_ > 0) >= 3,
        s"backlog was not split: batch sizes $batchSizes")
      assert(state.toMap === PartitionedLake.read(spark, lake).collect()
        .map(r => (r.getAs[String]("part"), r.getAs[Long]("k")) ->
          r.getAs[Double]("bal")).toMap)
    } finally q.stop()

    // outage: 4 more commits while down; the capped RESTART drains them
    // across batches too (the cap base survives via commit()/progress)
    for (i <- 8 to 11)
      PartitionedLake.upsert(spark, lake, "part", "k",
        Seq((i.toLong, "p1", i * 1.0)).toDF("k", "part", "bal"))
    // tear the progress file (crash mid-write shape): restart must fall
    // back to the commit()-recovered base, never wedge on parsing
    val progress = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/ckpt"))
      .filter(_.getFileName.toString == "graft-cdf-last-end")
      .findFirst()
    progress.ifPresent(p => java.nio.file.Files.write(p, Array.emptyByteArray))
    val sizesBefore = batchSizes.size
    val q2 = spark.readStream.format("graft-lake-cdf")
      .option("path", lake).option("keyCols", "part,k")
      .option("maxVersionsPerTrigger", "2")
      .load()
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.collect()
        batchSizes += rows.length
        applyFeed(state, rows)
      }
      .start()
    try {
      q2.processAllAvailable()
      assert(batchSizes.drop(sizesBefore).count(_ > 0) >= 2,
        s"restart backlog was not split: ${batchSizes.drop(sizesBefore)}")
      assert(state.toMap === PartitionedLake.read(spark, lake).collect()
        .map(r => (r.getAs[String]("part"), r.getAs[Long]("k")) ->
          r.getAs[Double]("bal")).toMap)
    } finally q2.stop()
  }

  test("a stopped stream restarts cleanly across a retained-window vacuum; out-of-window fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdf-vac").toString
    val lake = s"$dir/lake"
    PartitionedLake.write(Seq((1L, "p1", 1.0)).toDF("k", "part", "bal"),
      lake, "part")
    val state = scala.collection.mutable.Map[(String, Long), Double]()
    def start() = spark.readStream.format("graft-lake-cdf")
      .option("path", lake).option("keyCols", "part,k")
      .load()
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        applyFeed(state, df.collect())
      }
      .start()
    val q = start()
    try q.processAllAvailable() finally q.stop() // committed offset = v1

    // two commits during downtime, then maintenance that RETAINS the
    // stopped stream's committed version (v1) in the window
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((2L, "p1", 2.0)).toDF("k", "part", "bal"))
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((3L, "p1", 3.0)).toDF("k", "part", "bal"))
    PartitionedLake.vacuum(spark, lake, keepLast = 3)
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(state.toMap === Map(("p1", 1L) -> 1.0, ("p1", 2L) -> 2.0,
        ("p1", 3L) -> 3.0))
    } finally q2.stop() // committed offset = v3

    // aggressive vacuum OUTSIDE the stream's window: committed v3 is
    // the latest, so restart still works — push one more commit and
    // vacuum it away from under the checkpoint to force the violation
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((4L, "p1", 4.0)).toDF("k", "part", "bal"))
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((5L, "p1", 5.0)).toDF("k", "part", "bal"))
    PartitionedLake.vacuum(spark, lake, keepLast = 1) // only v5 survives
    val q3 = start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q3.processAllAvailable() finally q3.stop()
    }
    // loud retention violation, never a silent skip
    assert(e.getCause != null &&
      String.valueOf(e.getCause.getMessage).contains("not resolvable"),
      s"expected a loud retention failure, got: ${e.getCause}")
  }
}
