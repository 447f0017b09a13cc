package graft

import graft.operators.{GraphOps, LayoutOps}
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the layout (z-order, bucketing) and graph
  * (PageRank) operators on handcrafted inputs, plus the plan-shape
  * assertion that is the entire point of bucketing: a join on the bucket
  * key runs without a single shuffle exchange.
  */
class LayoutAndGraphSpec extends AnyFunSuite {
  import SparkTestSession._
  import org.apache.spark.sql.functions._

  test("zValue interleaves bits (x -> even positions, y -> odd)") {
    // x=3 (bits 0,1 -> positions 0,2 = 5), y=5 (bits 0,2 -> positions 1,5 = 34)
    val row = spark.range(1)
      .select(LayoutOps.zValue(lit(3L), lit(5L)).as("z"),
        LayoutOps.zValue(lit(0L), lit(0L)).as("z0"),
        // wraps mod 2^16: 65536 interleaves like 0
        LayoutOps.zValue(lit(65536L), lit(1L)).as("zwrap"))
      .head()
    assert(row.getLong(0) === 39L)
    assert(row.getLong(1) === 0L)
    assert(row.getLong(2) === 2L)
  }

  test("z-order groups are tighter rectangles than arrival order") {
    val rows = QueryRegistry.queries("q133_zorder_layout")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet === Set("natural", "zorder"))
    val (natHit, natRows) = rows("natural")
    val (zHit, zRows) = rows("zorder")
    // identical matching rows either way; z-order never reads more groups
    assert(natRows === zRows)
    assert(zHit <= natHit)
  }

  test("globalNtile matches the window NTILE it replaces, n % tiles != 0") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 103 rows over 8 tiles: first 103 % 8 = 7 groups get 13 rows, last gets 12
    val df = (1L to 103L).map(i => (i * 37 % 101, i)).toDF("k", "id")
    val viaWindow = df.withColumn("grp",
      ntile(8).over(Window.orderBy($"k", $"id")))
    val viaRank = LayoutOps.globalNtile(df, Seq($"k", $"id"), 8, "grp")
    assert(viaRank.count() === 103L)
    assert(viaWindow.except(viaRank).isEmpty && viaRank.except(viaWindow).isEmpty)
  }

  test("globalNtile: all-equal leading column collapses buckets but stays correct") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // every row shares the leading value -> quantile boundaries dedup to
    // nothing, all rows land in bucket 0, and the tie-break column alone
    // must still produce the exact NTILE assignment
    val df = (1L to 50L).map(i => (7L, i * 13 % 47, i)).toDF("k", "t", "id")
    val viaWindow = df.withColumn("grp",
      ntile(4).over(Window.orderBy($"k", $"t", $"id")))
    val viaRank = LayoutOps.globalNtile(df, Seq($"k", $"t", $"id"), 4, "grp")
    assert(viaRank.count() === 50L)
    assert(viaWindow.except(viaRank).isEmpty && viaRank.except(viaWindow).isEmpty)
  }

  test("globalNtile: descending leading column matches window NTILE; non-numeric fails fast") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 40L).map(i => (i * 37 % 101, s"s$i", i)).toDF("k", "s", "id")
    // desc leading column directly (bucket comparison inverted): exact
    // match against the window form, no negation workaround needed
    val viaWindowDesc = df.withColumn("grp",
      ntile(4).over(Window.orderBy($"k".desc, $"id")))
    val viaRankDesc = LayoutOps.globalNtile(df, Seq($"k".desc, $"id"), 4, "grp")
    assert(viaWindowDesc.except(viaRankDesc).isEmpty &&
      viaRankDesc.except(viaWindowDesc).isEmpty)
    // the old negation path still agrees with it
    val viaWindow = df.withColumn("grp",
      ntile(4).over(Window.orderBy($"k".desc, $"id".desc)))
    val viaRank = LayoutOps.globalNtile(df, Seq(-$"k", -$"id"), 4, "grp")
    assert(viaWindow.except(viaRank).isEmpty && viaRank.except(viaWindow).isEmpty)
    val eType = intercept[IllegalArgumentException] {
      LayoutOps.globalNtile(df, Seq($"s", $"id"), 4, "grp")
    }
    assert(eType.getMessage.contains("numeric"))
  }

  test("globalNtile: SortOrder null ordering places the null bucket where the window puts it") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = ((1L to 30L).map(i => (java.lang.Long.valueOf(i * 37 % 101), i)) ++
      (31L to 36L).map(i => (null.asInstanceOf[java.lang.Long], i)))
      .toDF("k", "id")
    // desc default = nulls LAST: the null rows must fill the final tiles
    val wDesc = df.withColumn("grp",
      ntile(4).over(Window.orderBy($"k".desc, $"id")))
    val gDesc = LayoutOps.globalNtile(df, Seq($"k".desc, $"id"), 4, "grp")
    assert(wDesc.except(gDesc).isEmpty && gDesc.except(wDesc).isEmpty)
    // desc_nulls_first: null rows lead
    val wDnf = df.withColumn("grp",
      ntile(4).over(Window.orderBy($"k".desc_nulls_first, $"id")))
    val gDnf = LayoutOps.globalNtile(df,
      Seq($"k".desc_nulls_first, $"id"), 4, "grp")
    assert(wDnf.except(gDnf).isEmpty && gDnf.except(wDnf).isEmpty)
    // asc_nulls_last via explicit SortOrder also lands nulls at the end
    val wAnl = df.withColumn("grp",
      ntile(4).over(Window.orderBy($"k".asc_nulls_last, $"id")))
    val gAnl = LayoutOps.globalNtile(df,
      Seq($"k".asc_nulls_last, $"id"), 4, "grp")
    assert(wAnl.except(gAnl).isEmpty && gAnl.except(wAnl).isEmpty)
  }

  test("bucketed join on the bucket key runs with zero exchanges") {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s.implicits._
    val dim = (1L to 200L).map(k => (k, s"name$k")).toDF("k", "name")
    val fact = (1L to 2000L).map(i => (i % 200 + 1, i)).toDF("k", "v")
    val bd = LayoutOps.rewriteBucketed(s, "graft_bkt_spec_dim", dim, "k", 8)
    val bf = LayoutOps.rewriteBucketed(s, "graft_bkt_spec_fact", fact, "k", 8)
    val joined = bd.join(bf, bd("k") === bf("k")).select(bd("k"), $"name", $"v")
    assert(joined.count() === 2000L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("pagerank refuses asymmetric graphs loudly (sources vanish, sinks leak mass)") {
    import spark.implicits._
    val directed = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst") // 1 is a source, 3 a sink
    val e = intercept[IllegalArgumentException] {
      GraphOps.pageRank(directed, 2)
    }
    assert(e.getMessage.contains("in- and out-edges"), e.getMessage)
  }

  test("pagerank: center of a path ranks highest, mass is conserved") {
    import spark.implicits._
    val pairs = Seq("A" -> "B", "B" -> "C") // path A - B - C
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val pr = GraphOps.pageRank(edges, 5).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr.keySet === Set("A", "B", "C"))
    assert(pr("B") > pr("A"))
    assert(pr("A") === pr("C")) // symmetric endpoints agree exactly
    // micro-unit mass: 1e12 up to floor-rounding drift (< 1 unit per
    // node per contribution/update)
    assert(math.abs(pr.values.sum - 1e12).toLong < 1000L)
  }

  test("pagerank: a regular graph is uniform at every iteration") {
    import spark.implicits._
    val cycle = Seq("A" -> "B", "B" -> "C", "C" -> "D", "D" -> "A")
    val edges = (cycle ++ cycle.map(_.swap)).toDF("src", "dst")
    val pr = GraphOps.pageRank(edges, 3).collect().map(_.getLong(1)).toSet
    assert(pr.size === 1) // all four nodes identical
  }
}
