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
