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
