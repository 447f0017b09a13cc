package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  private def sides = {
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_sec"), col("value"))
    val left = e.filter(col("event_type") === "error")
      .select("user_id", "event_id", "ts_sec")
    val right = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user"), col("ts_sec").as("p_sec"))
      .agg(max(col("value")).as("p_value"))
    (left, right)
  }

  test("native as-of join plans AsOfJoinExec (not a window or cartesian)") {
    val (l, r) = sides
    val df = AsOfJoin.asof(l, r, "user_id", "ts_sec", "p_user", "p_sec")
    // AQE wraps the tree in AdaptiveSparkPlanExec (a leaf to `exists`), so
    // assert on the printed inner plan
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin"), phys)
    assert(phys.contains("Exchange hashpartitioning"), phys) // co-partitioned
    assert(!phys.contains("CartesianProduct"), phys)
    assert(!phys.contains("SortMergeJoin"), phys)
  }

  test("native as-of join matches the window-composition form exactly") {
    val (l, r) = sides
    val native = AsOfJoin.asof(l, r, "user_id", "ts_sec", "p_user", "p_sec")
      .select("user_id", "event_id", "ts_sec", "p_sec", "p_value")
      .orderBy("user_id", "event_id").collect()

    // reference form: union both sides into one timeline; a conditional
    // running last() carries the latest purchase (sec, value) forward
    val tagged = l.select(col("user_id"), col("event_id"), col("ts_sec"),
      lit(null).cast("long").as("p_sec0"), lit(null).cast("double").as("p_value0"),
      lit(1).as("is_left"))
      .unionByName(r.select(col("p_user").as("user_id"),
        lit(null).cast("long").as("event_id"), col("p_sec").as("ts_sec"),
        col("p_sec").as("p_sec0"), col("p_value").as("p_value0"),
        lit(0).as("is_left")))
    // right rows sort before left rows at the same ts_sec (<= semantics)
    val w = Window.partitionBy("user_id").orderBy(col("ts_sec"), col("is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val composed = tagged
      .withColumn("p_sec", last("p_sec0", ignoreNulls = true).over(w))
      .withColumn("p_value", last("p_value0", ignoreNulls = true).over(w))
      .filter(col("is_left") === 1)
      .select("user_id", "event_id", "ts_sec", "p_sec", "p_value")
      .orderBy("user_id", "event_id").collect()

    assert(native.length === composed.length)
    assert(native.map(_.toString).toSeq === composed.map(_.toString).toSeq)
  }

  test("edge cases: empty right, all-late right, equal timestamps, lone keys") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"),   // key 1: two lefts
      (2L, 5L, "c"),                    // key 2: right exists only AFTER
      (3L, 7L, "d"),                    // key 3: no right rows at all
      (4L, 15L, "e")                    // key 4: right at EXACTLY 15
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 9L, "r1"), (1L, 15L, "r2"),
      (2L, 99L, "r3"),
      (4L, 15L, "r4")
    ).toDF("rk", "rt", "payload")
    val got = AsOfJoin.asof(left, right, "k", "t", "rk", "rt")
      .select("k", "t", "tag", "rt", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) "-" else r.getString(4))).toSet
    assert(got === Set(
      (1L, 10L, "a", 9L, "r1"),   // latest <= 10 is 9
      (1L, 20L, "b", 15L, "r2"),  // advances to 15
      (2L, 5L, "c", -1L, "-"),    // right exists but only later
      (3L, 7L, "d", -1L, "-"),    // no right rows for the key
      (4L, 15L, "e", 15L, "r4"))) // rt <= lt is inclusive
  }

  test("null keys never match (SQL equi-join semantics), left rows survive") {
    import spark.implicits._
    val left = Seq(
      (Some(1L), Some(10L), "a"),
      (None: Option[Long], Some(10L), "nullkey"),
      (Some(0L), Some(10L), "zerokey")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (Some(1L), Some(9L), "r1"),
      (None: Option[Long], Some(1L), "rnull"), // can never match anything
      (Some(0L), Some(5L), "r0")
    ).toDF("rk", "rt", "payload")
    val got = AsOfJoin.asof(left, right, "k", "t", "rk", "rt")
      .select("tag", "payload").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) "-" else r.getString(1)))
      .toMap
    assert(got === Map(
      "a" -> "r1",
      "nullkey" -> "-",   // null key: padded, present
      "zerokey" -> "r0")) // and NOT polluted by the null row masquerading as 0
  }

  test("fuzz: native as-of equals a per-row reference computation") {
    import spark.implicits._
    // deterministic pseudo-random data from hashed ranges (no RNG state)
    val left = spark.range(500).select(
      abs((hash(col("id")) % 20).cast("long")).as("k"),
      abs((hash(col("id"), lit(1)) % 1000).cast("long")).as("t"),
      col("id").as("lid"))
    val right = spark.range(300).select(
      abs((hash(col("id"), lit(2)) % 20).cast("long")).as("rk"),
      abs((hash(col("id"), lit(3)) % 1000).cast("long")).as("rt"),
      col("id").as("rid"))
      // unique (rk, rt) so the matched payload is well-defined
      .groupBy("rk", "rt").agg(max("rid").as("rid"))
    val native = AsOfJoin.asof(left, right, "k", "t", "rk", "rt")
      .select("lid", "rt", "rid").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

    val ls = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rs = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = ls.map { case (k, t, lid) =>
      val cands = rs.filter(r => r._1 == k && r._2 <= t)
      if (cands.isEmpty) (lid, -1L, -1L)
      else { val best = cands.maxBy(_._2); (lid, best._2, best._3) }
    }.toSet
    assert(native === expected)
  }

  test("unmatched left rows pad nulls; matches never come from other keys") {
    val (l, r) = sides
    val native = AsOfJoin.asof(l, r, "user_id", "ts_sec", "p_user", "p_sec")
    // every matched row's purchase is at-or-before the event
    assert(native.filter(col("p_sec") > col("ts_sec")).count() === 0)
    // users with no purchases at all must still appear, with nulls
    val usersWithPurchases = r.select(col("p_user")).distinct()
    val lonely = l.join(usersWithPurchases,
      col("user_id") === col("p_user"), "left_anti")
    val lonelyOut = native.join(lonely.select("event_id"), Seq("event_id"))
    assert(lonelyOut.count() === lonely.count())
    assert(lonelyOut.filter(col("p_sec").isNotNull).count() === 0)
  }
}
