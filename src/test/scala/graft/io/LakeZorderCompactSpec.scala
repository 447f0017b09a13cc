package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `compact(zorderBy = ...)`: routine maintenance that buys
  * [[PartitionedLake.readBox]] file skipping — post-compact, a 2-D box
  * predicate opens a strict subset of each partition's files, the data
  * is unchanged, and time travel to pre-compact versions stays intact.
  */
class LakeZorderCompactSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def grid(part: String): Seq[(Long, String, Long, Long)] =
    for (x <- 0L until 48L; y <- 0L until 48L)
      yield (x * 1000 + y, part, x, y)

  test("z-order compaction: readBox opens a strict file subset; rows identical; time travel intact") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-zcompact").toString + "/lake"
    // arrival order is z-hostile (shuffled), 4 files per partition, with
    // (x, y) stats harvested — every file's bounds span the whole grid,
    // so pre-compact readBox can skip NOTHING
    val rows = (grid("p1") ++ grid("p2"))
    val df = new scala.util.Random(7).shuffle(rows)
      .toDF("k", "part", "x", "y").repartition(4)
    PartitionedLake.write(df, path, Seq("part"), Seq("x", "y"))
    val box = Map("x" -> (10.0, 15.0), "y" -> (10.0, 15.0))
    val before = PartitionedLake.readBox(spark, path, box)
    val liveBefore = PartitionedLake.read(spark, path).inputFiles.length
    assert(before.inputFiles.length === liveBefore,
      "arrival-order files must be unskippable (bounds span the grid)")
    val snapBefore = PartitionedLake.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

    PartitionedLake.compact(spark, path, Nil, zorderBy = Seq("x", "y"),
      filesPerPartition = 8)

    // data identical (same row set, same count, metadata count restored)
    val snapAfter = PartitionedLake.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(snapAfter === snapBefore)
    assert(PartitionedLake.rowCount(spark, path) === Some(rows.size.toLong))

    // the box now opens a STRICT SUBSET of the live files — z-ordering
    // made each file a small (x, y) rectangle
    val after = PartitionedLake.readBox(spark, path, box)
    val liveAfter = PartitionedLake.read(spark, path).inputFiles.length
    assert(liveAfter > 2, s"compaction should split partitions ($liveAfter)")
    assert(after.inputFiles.length < liveAfter,
      s"box opened ${after.inputFiles.length} of $liveAfter files — no skipping")
    assert(after.inputFiles.length < before.inputFiles.length,
      "clustering must beat the arrival layout's file footprint")
    // and the box result itself is exact either way
    val expected = rows.filter(r => r._3 >= 10 && r._3 <= 15 &&
      r._4 >= 10 && r._4 <= 15).map(_._1).toSet
    assert(after.select("k").as[Long].collect().toSet === expected)
    assert(before.select("k").as[Long].collect().toSet === expected)

    // time travel: the pre-compact version still reads in full
    val v1 = PartitionedLake.readVersion(spark, path, 1L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(v1 === snapBefore)
    assert(PartitionedLake.snapshots(spark, path) === Seq(1L, 2L))
  }

  test("z-order compaction materializes merge-on-read deltas and validates its inputs") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-zcompact2").toString + "/lake"
    PartitionedLake.write(Seq((1L, "p1", 5L, 5L), (2L, "p1", 20L, 20L),
      (3L, "p2", 30L, 30L)).toDF("k", "part", "x", "y"), path,
      Seq("part"), Seq("x", "y"))
    PartitionedLake.cdcSinkMergeOnRead(spark, path, "part", "k", "x",
      Seq((2L, "p1", 1L, "U", 21L), (3L, "p2", 2L, "D", 0L))
        .toDF("k", "part", "seq", "op", "val"))
    PartitionedLake.compact(spark, path, Nil, zorderBy = Seq("x", "y"),
      filesPerPartition = 2)
    val got = PartitionedLake.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(got === Set((1L, 5L, 5L), (2L, 21L, 20L)))
    // the delta materialized away: metadata count is answerable again
    assert(PartitionedLake.rowCount(spark, path) === Some(2L))
    // input validation is loud
    val e1 = intercept[IllegalArgumentException] {
      PartitionedLake.compact(spark, path, Nil, Seq("part", "x"))
    }
    assert(e1.getMessage.contains("non-partition"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      PartitionedLake.compact(spark, path, Nil, Seq("x", "y", "k"))
    }
    assert(e2.getMessage.contains("at most 2"), e2.getMessage)
  }
}
