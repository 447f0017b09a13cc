package graft

import graft.app.BatchRunner
import graft.io.PartitionedLake
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.time.LocalDate

class BatchRunnerSpec extends AnyFunSuite {
  import SparkTestSession._

  test("batch validates independently and isolates bad submissions") {
    val base = Files.createTempDirectory("graft-batch").toString
    // submission A: valid with one error
    val a = Paths.get(base, "subA"); Files.createDirectory(a)
    Files.writeString(a.resolve("submission.csv"),
      "submission,cbc\nsubmitter,x\nparticipants,1\nbiospecimens,0\n")
    Files.writeString(a.resolve("demographic.csv"),
      "Research_Participant_ID,Age\n14_000001,30\n")
    // submission B: rejected (no submission.csv)
    val b = Paths.get(base, "subB"); Files.createDirectory(b)
    Files.writeString(b.resolve("demographic.csv"),
      "Research_Participant_ID,Age\n14_000002,40\n")
    // submission C: empty dir
    val c = Paths.get(base, "subC"); Files.createDirectory(c)

    val outcomes = BatchRunner.run(spark,
      Seq(s"$base/subA", s"$base/subB", s"$base/subC"),
      s"$base/out", 14, LocalDate.of(2026, 8, 12))
    assert(outcomes.length == 3)
    val byName = outcomes.map(o => o.submission -> o).toMap
    assert(byName("subA").isInstanceOf[BatchRunner.Validated])
    assert(byName("subB") == BatchRunner.Rejected("subB",
      "Submission File was not included in the list of files to validate"))
    assert(byName("subC") == BatchRunner.Rejected("subC", "no sheets found"))
    val validated = byName("subA").asInstanceOf[BatchRunner.Validated]
    assert(validated.statuses.nonEmpty)
  }
}

class PartitionedLakeSpec extends AnyFunSuite {
  import SparkTestSession._

  test("partition pruning: predicate on partition column skips directories") {
    val path = Files.createTempDirectory("graft-lake").toString + "/li"
    PartitionedLake.write(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity", "l_returnflag"),
      path, "l_returnflag")
    val pruned = PartitionedLake.read(spark, path)
      .filter(col("l_returnflag") === "R")
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan)
    // pruned scan reads one partition directory, and results match a
    // non-partitioned filter
    val expected = Tables.lineitem(spark, sf).filter(col("l_returnflag") === "R").count()
    assert(pruned.count() == expected)
  }
}
