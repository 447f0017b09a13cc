package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the repo's ONE private-API seam ([[SparkShims]]): each of the
  * four reflective handles resolves and works against the shipped Spark,
  * and no OTHER main-source file reflects on Spark internals — so a
  * Spark upgrade that moves any of these members fails HERE with a
  * versioned diagnosis, and new reflection can't creep in unseen.
  */
class ShimsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("seam 1: internalCreateDataFrame wraps an InternalRow RDD (batch + streaming tag)") {
    val src = spark.range(5).selectExpr("id", "id * 2 as dbl")
    val rdd = src.queryExecution.toRdd
    val df = SparkShims.internalCreateDataFrame(spark, rdd, src.schema,
      isStreaming = false)
    assert(df.collect().map(_.getLong(1)).sorted === Array(0L, 2L, 4L, 6L, 8L))
    val sdf = SparkShims.internalCreateDataFrame(
      spark, src.queryExecution.toRdd, src.schema, isStreaming = true)
    assert(sdf.isStreaming, "isStreaming=true must yield a streaming-tagged plan")
  }

  test("seam 2+3: sortOrderInfo decodes direction and null ordering; bare column -> None") {
    assert(SparkShims.sortOrderInfo(col("x")).isEmpty)
    val Some((child, desc, nullsLast)) = SparkShims.sortOrderInfo(desc_nulls_last("x"))
    assert(desc && nullsLast)
    val Some((_, d2, n2)) = SparkShims.sortOrderInfo(asc_nulls_first("x"))
    assert(!d2 && !n2)
    // the re-wrapped child Column is usable in a real plan
    val out = spark.range(3).select(col("id").as("x"))
      .select(child * 2).collect().map(_.getLong(0)).sorted
    assert(out === Array(0L, 2L, 4L))
  }

  test("seam 4: ofRows wraps a hand-built LogicalPlan as a DataFrame") {
    val plan = spark.range(4).selectExpr("id").queryExecution.analyzed
    val df = SparkShims.ofRows(spark, plan)
    assert(df.collect().map(_.getLong(0)).sorted === Array(0L, 1L, 2L, 3L))
  }

  test("no other main file reflects on Spark internals (grep pin)") {
    val mainRoot = Paths.get("src/main/scala")
    val offenders = Files.walk(mainRoot).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filterNot(_.toString.endsWith("SparkShims.scala"))
      .filter { p =>
        val text = new String(Files.readAllBytes(p), "UTF-8")
        text.contains(".getMethod(") || text.contains(".invoke(") ||
          text.contains("getDeclaredMethod")
      }
      .map(_.toString).toList
    assert(offenders.isEmpty,
      s"reflective Spark-internal access outside SparkShims: $offenders")
  }
}
