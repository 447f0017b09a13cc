package graft

import graft.functions.{GraftFunctions, RewriteTokenCount}
import graft.io.Bucketing
import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CustomExprSpec extends AnyFunSuite {
  import SparkTestSession._

  test("token_count equals size(split(s, ' ')) on documents") {
    GraftFunctions.register(spark)
    val diff = Tables.documents(spark, sf)
      .select(
        GraftFunctions.token_count(col("text")).as("fast"),
        size(split(col("text"), " ")).as("composed"))
      .filter(col("fast") =!= col("composed"))
    assert(diff.count() == 0)
  }

  test("token_count survives codegen and handles edge strings") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val got = Seq("", "a", "a b", "a  b", " a b ").toDF("s")
      .select(GraftFunctions.token_count(col("s"))).as[Int].collect()
    // separators + 1, empty tokens included — exactly split-on-space
    assert(got.toSeq == Seq(1, 1, 2, 3, 4))
  }

  test("two token_count instances compile into one generated predicate") {
    // regression: the loop variable must go through freshName — with a raw
    // `int i`, the second instance in the same generated function failed
    // janino compilation and the whole predicate fell back to interpreter
    // mode (WARN Predicate: Expr codegen error)
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.expressions.codegen.GeneratePredicate
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val s = BoundReference(0, StringType, nullable = true)
    val expr = And(
      GreaterThan(graft.functions.TokenCount(s), Literal(1)),
      LessThan(graft.functions.TokenCount(s), Literal(10)))
    // throws CompileException without the fix (no silent fallback here)
    val pred = GeneratePredicate.generate(expr)
    assert(pred.eval(InternalRow(UTF8String.fromString("a b c"))))
    assert(!pred.eval(InternalRow(UTF8String.fromString("x"))))
  }

  test("RewriteTokenCount optimizer rule rewrites size(split(...))") {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ RewriteTokenCount
    try {
      val df = Tables.documents(spark, sf)
        .select(size(split(col("text"), " ")).as("n"))
      assert(df.queryExecution.optimizedPlan.toString.contains("token_count"))
      // and the rewritten plan still computes the same values
      val direct = Tables.documents(spark, sf)
        .select(size(split(col("text"), " ")).as("n"))
      assert(df.collect().map(_.getInt(0)).sum ==
        direct.collect().map(_.getInt(0)).sum)
    } finally spark.experimental.extraOptimizations = before
  }
}

class SkewSpec extends AnyFunSuite {
  import SparkTestSession._

  test("saltedCount matches plain groupBy count on skewed data") {
    import spark.implicits._
    // 90% of rows on one key
    val rows = (1 to 2000).map(i => (if (i % 10 == 0) s"k$i" else "hot", i.toLong))
    val df = rows.toDF("k", "v")
    val plain = df.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, "k", 16, entropy = col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("saltedJoin matches plain join on skewed keys") {
    import spark.implicits._
    val left = (1 to 1000).map(i => (if (i % 5 == 0) "cold" + i else "hot", i.toLong))
      .toDF("k", "v")
    val right = (Seq("hot") ++ (1 to 1000 by 5).map("cold" + _)).zipWithIndex
      .map { case (k, i) => (k, s"r$i") }.toDF("k", "tag")
    val plain = left.join(right, Seq("k")).select("k", "v", "tag")
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(left, right, "k", 8, leftEntropy = col("v"))
      .select("k", "v", "tag")
      .collect().map(_.toString).sorted.toSeq
    assert(salted === plain)
  }
}

class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("join of two bucketed tables needs no Exchange") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    // a previous JVM may have left the managed-table location behind while
    // the in-memory metastore forgot the table — clear both
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(o, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(li, "b_lineitem", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("Graft.init wires functions, rewrite rule, and strategy idempotently") {
    Graft.init(spark)
    Graft.init(spark) // second call must not duplicate registrations
    assert(spark.experimental.extraOptimizations
      .count(_ == graft.functions.RewriteTokenCount) === 1)
    assert(spark.experimental.extraStrategies
      .count(_ == graft.plans.GraftStrategy) === 1)
    // the SQL function resolves after init
    val n = spark.sql("SELECT token_count('a b c') AS n").collect()(0).getInt(0)
    assert(n === 3)
    // the SQL UDF inlines normalizeText's exact semantics — no UDF node
    val norm = spark.sql("SELECT graft_normalize('  Café-naïve RÉSUMÉ  ') AS x")
    assert(norm.collect()(0).getString(0) === "cafe naive resume")
    assert(!norm.queryExecution.executedPlan.toString
      .toLowerCase.contains("scalaudf"))
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // at 100 TB a selective dimension filter should reach the fact scan as
    // a runtime bloom filter (InjectRuntimeFilter); thresholds are sized
    // for real tables, so shrink them to demonstrate on test data
    val conf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val prev = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("might_contain"), optimized)
      // and it must not change results
      assert(joined.collect().map(_.getLong(1)).sum ===
        li.join(o, col("l_orderkey") === col("o_orderkey")).count())
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
