package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MOR delta-log governance ([[PartitionedLake.MorLogMaxRowsKey]] /
  * [[PartitionedLake.MorLogOnExceedKey]]): the per-partition
  * accumulated log must stay broadcast-sized — both the fold and every
  * merged read broadcast the log identities — and that bound is a
  * MECHANISM, not a comment: every log-publishing commit
  * (cdcSinkMergeOnRead and SQL row-level DML) measures the staged
  * log's footer row counts and either auto-compacts the offending
  * partitions right after publishing (default) or refuses the commit
  * loudly.
  */
class MorLogGovernorSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def freshLake(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-morgov-$tag")
      .toString + "/lake"

  private def seed(lake: String): Unit =
    PartitionedLake.write(
      (1L to 20L).map(k => (k, if (k <= 10) "a" else "b", k.toDouble))
        .toDF("k", "part", "bal"), lake, "part")

  private def liveDeltaDirs(lake: String): Set[String] =
    PartitionedLake.read(spark, lake).inputFiles
      .filter(_.contains("delta-"))
      .map(_.split('/').dropRight(1).last).toSet

  private def withConf[A](kvs: (String, String)*)(body: => A): A = {
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  private def ops(keys: Seq[Long], part: String = "a") =
    keys.map(k => (part, k, 1L, "U", k + 100.0))
      .toDF("part", "k", "seq", "op", "val")

  test("under the bound: the log stays live (no surprise compaction); over it: the offending partition auto-compacts after the commit, rows intact") {
    val lake = freshLake("auto")
    seed(lake)
    withConf(PartitionedLake.MorLogMaxRowsKey -> "6") {
      // 4 changed identities in part=a: under the bound, deltas live
      PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
        ops(1L to 4L))
      assert(liveDeltaDirs(lake) === Set("part=a"))
      // 4 more: the self-contained re-emitted log now carries 8 > 6 —
      // the commit publishes, then ONLY part=a compacts (part=b has no
      // log and must not be rewritten)
      val bFilesBefore = PartitionedLake.read(spark, lake).inputFiles
        .filter(_.contains("part=b")).toSet
      PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
        ops(5L to 8L))
      assert(liveDeltaDirs(lake) === Set.empty,
        "the over-bound partition must auto-compact")
      assert(PartitionedLake.read(spark, lake).inputFiles
        .filter(_.contains("part=b")).toSet === bFilesBefore,
        "a partition under the bound must not be rewritten")
      // the merged values survived the governor round-trip
      val got = PartitionedLake.read(spark, lake)
        .filter(col("part") === "a").select("k", "bal").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got === (1L to 10L).map(k =>
        k -> (if (k <= 8) k + 100.0 else k.toDouble)).toMap)
      // and row counts are exact again (no live deltas)
      assert(PartitionedLake.partitionRowCounts(spark, lake).isDefined)
    }
  }

  test("onExceed=refuse: the commit refuses loudly with directions, publishes nothing, and compact + retry succeeds") {
    val lake = freshLake("refuse")
    seed(lake)
    withConf(PartitionedLake.MorLogMaxRowsKey -> "3",
      PartitionedLake.MorLogOnExceedKey -> "refuse") {
      val versionsBefore = PartitionedLake.snapshots(spark, lake)
      val e = intercept[Exception] {
        PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k",
          "bal", ops(1L to 5L))
      }
      assert(e.getMessage.contains(PartitionedLake.MorLogMaxRowsKey))
      assert(e.getMessage.contains("compact"))
      assert(PartitionedLake.snapshots(spark, lake) === versionsBefore,
        "a refused fold must publish nothing")
      // no staging debris
      assert(!new java.io.File(s"$lake/_staging").exists() ||
        new java.io.File(s"$lake/_staging").listFiles().isEmpty)
    }
    // with the governor back at defaults the same batch lands fine
    PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
      ops(1L to 5L))
    assert(PartitionedLake.read(spark, lake)
      .filter(col("k") === 3L).head().getAs[Double]("bal") === 103.0)
  }

  test("SQL merge-on-read DML is governed too: an over-bound UPDATE's partition auto-compacts (base files rewritten only then)") {
    val lake = freshLake("sql")
    seed(lake)
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)
    withConf(PartitionedLake.MorLogMaxRowsKey -> "6",
      LakeDeltaRowLevel.ModeKey -> LakeDeltaRowLevel.MergeOnRead,
      LakeDeltaRowLevel.KeyKey -> "k") {
      // 4 changed rows in part=a: under bound (4 'U' post-images; the
      // 'D' halves re-unify), sidecars stay live
      spark.sql(s"UPDATE graft_lake.`$lake` SET bal = bal + 50 " +
        "WHERE part = 'a' AND k <= 4")
      assert(liveDeltaDirs(lake) === Set("part=a"))
      // 4 more: accumulated log 8 > 6 — publish, then auto-compact
      spark.sql(s"UPDATE graft_lake.`$lake` SET bal = bal + 50 " +
        "WHERE part = 'a' AND k > 4 AND k <= 8")
      assert(liveDeltaDirs(lake) === Set.empty)
      val got = PartitionedLake.read(spark, lake)
        .filter(col("part") === "a").select("k", "bal").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got === (1L to 10L).map(k =>
        k -> (if (k <= 8) k + 50.0 else k.toDouble)).toMap)
    }
  }

  test("maxRows <= 0 disables the governor; a bad onExceed value refuses with both vocabularies") {
    val lake = freshLake("off")
    seed(lake)
    withConf(PartitionedLake.MorLogMaxRowsKey -> "0") {
      PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
        ops(1L to 9L))
      assert(liveDeltaDirs(lake) === Set("part=a"),
        "a disabled governor must leave the log alone")
    }
    withConf(PartitionedLake.MorLogMaxRowsKey -> "1",
      PartitionedLake.MorLogOnExceedKey -> "explode") {
      val e = intercept[Exception] {
        PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k",
          "bal", ops(Seq(1L)))
      }
      assert(e.getMessage.contains("compact") &&
        e.getMessage.contains("refuse"))
    }
  }
}
