package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins through the native DSv2 batch
  * ([[LakeNativeBatchScan.outputPartitioning]]): two lakes laid out on
  * the same partition key equi-join with ZERO Exchange once the
  * session opts into `spark.graft.lake.preserveDataGrouping` (the
  * lake's own default-off gate on top of Spark's default-on
  * v2-bucketing conf) — the DSv2 analogue of what io/Bucketing proves
  * for the warehouse path.
  */
class LakeSpjSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-spj-$tag").toString

  private def v2(lake: String): DataFrame =
    spark.read.format("graft-lake-v2").option("path", lake).load()

  /** All physical nodes of the EXECUTED plan, AQE stages unwrapped. */
  private def nodes(df: DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => Seq(q) ++ walk(q.plan)
      case s => Seq(s) ++ s.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  // the ONE shuffle counter (shared with q159's in-band claim)
  private def shuffleCount(df: DataFrame): Int =
    LakeScanCheck.shuffleExchanges(df)

  private def hasSmj(df: DataFrame): Boolean = nodes(df).exists(
    _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec])

  /** Toggles the lake's own opt-in ([[LakeNativeBatchScan
    * .PreserveGroupingKey]]); Spark's v2-bucketing conf is ON by
    * default in Spark 4, which is exactly why the lake needs its own
    * default-off gate — see the spjKeyed scaladoc.
    */
  private def withBucketing[A](on: Boolean)(f: => A): A = {
    val key = LakeNativeBatchScan.PreserveGroupingKey
    val before = spark.conf.getOption(key)
    try { spark.conf.set(key, on.toString); f }
    finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def fixture(tag: String): (String, String, Long, Long) = {
    val root = freshDir(tag)
    val a = s"$root/a"; val b = s"$root/b"
    PartitionedLake.write(spark.range(1000L).select(
      (col("id") % 8).as("b"), col("id").as("k"), (col("id") * 3).as("v")),
      a, "b")
    PartitionedLake.write(spark.range(800L).select(
      (col("id") % 8).as("b"), col("id").as("k2"), (col("id") * 7).as("w")),
      b, "b")
    // ground truth computed lake-free
    val expectN = (0L until 1000L).map(i =>
      (0L until 800L).count(j => j % 8 == i % 8).toLong).sum
    val expectS = (0L until 1000L).flatMap(i =>
      (0L until 800L).filter(j => j % 8 == i % 8).map(j => i * 3 + j * 7)).sum
    (a, b, expectN, expectS)
  }

  test("two lakes on the same layout sort-merge-join with ZERO Exchange; the grouped aggregate rides the same partitioning") {
    val (a, b, expectN, expectS) = fixture("zero")
    withBucketing(on = true) {
      // GROUP BY the partition key: the key-grouped output satisfies the
      // aggregate's clustering too, so the WHOLE plan runs shuffle-free
      val j = v2(a).hint("merge").join(v2(b), Seq("b"))
        .groupBy("b")
        .agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("s"))
      val rows = j.collect()
      assert(rows.map(_.getLong(1)).sum === expectN)
      assert(rows.map(_.getLong(2)).sum === expectS)
      assert(rows.length === 8)
      assert(hasSmj(j), "expected a sort-merge join")
      assert(shuffleCount(j) === 0,
        "expected ZERO Exchange: both the join and the grouped aggregate " +
          "should ride the reported key-grouped partitioning\n" +
          j.queryExecution.executedPlan.toString)
    }
  }

  test("the conf gates it: bucketing off falls back to plain shuffled SMJ with identical answers") {
    val (a, b, expectN, expectS) = fixture("gate")
    withBucketing(on = false) {
      val j = v2(a).hint("merge").join(v2(b), Seq("b"))
        .agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("s"))
      val row = j.collect()(0)
      assert(row.getLong(0) === expectN)
      assert(row.getLong(1) === expectS)
      assert(shuffleCount(j) > 0, "without the conf the join must shuffle")
    }
  }

  test("partition-value mismatch: a side missing partitions still answers exactly (engine pushes/aligns partition values)") {
    val root = freshDir("miss")
    val a = s"$root/a"; val b = s"$root/b"
    PartitionedLake.write(spark.range(400L).select(
      (col("id") % 8).as("b"), col("id").as("k")), a, "b")
    // B holds only 3 of the 8 buckets
    PartitionedLake.write(spark.range(400L)
      .filter(col("id") % 8 <= 2).select(
        (col("id") % 8).as("b"), (col("id") * 2).as("w")), b, "b")
    withBucketing(on = true) {
      val j = v2(a).hint("merge").join(v2(b), Seq("b"))
        .agg(count(lit(1)).as("n"))
      val expect = (0L until 400L).map(i =>
        (0L until 400L).count(x => x % 8 <= 2 && x % 8 == i % 8).toLong).sum
      assert(j.collect()(0).getLong(0) === expect)
    }
  }

  test("SPJ composes with claimed filters: statically pruned sides still co-partition on the surviving keys") {
    val (a, b, _, _) = fixture("claim")
    withBucketing(on = true) {
      val j = v2(a).filter(col("b") >= 4L).hint("merge")
        .join(v2(b).filter(col("b") >= 4L), Seq("b"))
        .groupBy("b").agg(count(lit(1)).as("n"))
      val expect = (0L until 1000L).filter(_ % 8 >= 4).map(i =>
        (0L until 800L).count(x => x % 8 == i % 8).toLong).sum
      val rows = j.collect()
      assert(rows.length === 4)
      assert(rows.map(_.getLong(1)).sum === expect)
      assert(shuffleCount(j) === 0,
        j.queryExecution.executedPlan.toString)
    }
  }
}
