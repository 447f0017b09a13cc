package graft.io

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round 18: [[PartitionedLake.sparkDirsFor]] renders partition
  * directory names on the driver (Cast + getPartitionPathString — the
  * exact composition Spark's file writer evaluates per row) instead of
  * paying a probe parquet-write job per commit. This spec pins BYTE
  * parity against a real partitioned write over an exotic-value corpus:
  * if a Spark upgrade ever changes the writer's rendering, the probe
  * write and the driver rendering would diverge here first.
  */
class SparkDirRenderSpec extends AnyFunSuite {
  import graft.SparkTestSession._

  private def realDirs(schema: StructType,
      rows: Seq[Row]): Set[String] = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dir-render").toString
    val full = StructType(schema.fields :+ StructField("v", IntegerType))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
        rows.map(r => Row.fromSeq(r.toSeq :+ 1)).asJava, full)
      .coalesce(1).write.mode("overwrite")
      .partitionBy(schema.fieldNames.toIndexedSeq: _*).parquet(dir)
    def walk(d: java.io.File, rel: String, depth: Int): Seq[String] =
      d.listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.contains("="))
        .flatMap { f =>
          val childRel = if (rel.isEmpty) f.getName else s"$rel/${f.getName}"
          if (depth == 1) Seq(childRel) else walk(f, childRel, depth - 1)
        }
    walk(new java.io.File(dir), "", schema.size).toSet
  }

  private def rendered(schema: StructType, rows: Seq[Row]): Set[String] =
    PartitionedLake.sparkDirsFor(spark, schema,
      rows.map(_.toSeq).toArray)

  test("driver-side rendering matches a real partitioned write: exotic strings") {
    val schema = StructType(Seq(StructField("p", StringType)))
    // no non-ASCII values here: the sandbox JVM's sun.jnu.encoding
    // cannot CREATE such directory names, so the reference write itself
    // fails (an environment limit on the probe, not a rendering
    // question — escaping-relevant ASCII is what getPartitionPathString
    // actually transforms)
    val values = Seq(
      "plain", "has space", "a/b", "a\\b", "col=val", "tab\there",
      "per%cent", "semi;colon", "quote\"d",
      "single'q", "asterisk*", "question?", "[bracket]", "{brace}",
      "^caret", "colon:here", "comma,sep", "#hash", "&amp")
    val rows = values.map(v => Row(v))
    assert(rendered(schema, rows) === realDirs(schema, rows))
  }

  test("driver-side rendering matches a real partitioned write: null and empty collapse to the default partition") {
    val schema = StructType(Seq(StructField("p", StringType)))
    // null and "" both land in __HIVE_DEFAULT_PARTITION__ — one dir
    val rows = Seq(Row(null), Row(""))
    val real = realDirs(schema, rows)
    assert(real.size === 1 &&
      real.head.endsWith("__HIVE_DEFAULT_PARTITION__"))
    assert(rendered(schema, rows) === real)
  }

  test("driver-side rendering matches a real partitioned write: numeric, boolean, date, decimal types") {
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("d", DoubleType), StructField("b", BooleanType),
      StructField("dt", DateType), StructField("dec", DecimalType(10, 2))))
    val rows = Seq(
      Row(Int.box(-7), Long.box(42L), Double.box(1.5), Boolean.box(true),
        java.sql.Date.valueOf("1997-03-01"),
        new java.math.BigDecimal("12.30")),
      Row(Int.box(0), Long.box(-1L), Double.box(-0.25), Boolean.box(false),
        java.sql.Date.valueOf("2031-12-31"),
        new java.math.BigDecimal("-4.05")))
    assert(rendered(schema, rows) === realDirs(schema, rows))
  }

  test("driver-side rendering matches a real partitioned write: two-level layout") {
    val schema = StructType(Seq(
      StructField("day", StringType), StructField("src", IntegerType)))
    val rows = Seq(Row("2031-01-01", Int.box(1)),
      Row("2031-01-01", Int.box(2)), Row("day two", Int.box(1)))
    assert(rendered(schema, rows) === realDirs(schema, rows))
  }
}
