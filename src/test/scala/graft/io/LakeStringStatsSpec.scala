package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** String-typed file-skipping bounds: UTF-8-ordered min/max harvested
  * from parquet binary statistics into `strs:` manifest fields,
  * consumed by [[LakeFilters.mayMatchStats]] — skip ONLY on proof,
  * byte-order-correct for supplementary-plane code points, truncation
  * widened on the upper side.
  */
class LakeStringStatsSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def freshLake(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-ss-$tag")
      .toString + "/lake"

  private def manifest(path: String) = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    PartitionedLake.latestManifest(fs, path).get
  }

  test("incrementUtf8: successor prefixes, surrogate-gap hop, unincrementable") {
    assert(LakeFilters.incrementUtf8("abc") === Some("abd"))
    assert(LakeFilters.incrementUtf8("ab퟿") === Some("ab"))
    assert(LakeFilters.incrementUtf8("") === None)
    val max = new String(Character.toChars(Character.MAX_CODE_POINT))
    assert(LakeFilters.incrementUtf8(max * 3) === None)
    assert(LakeFilters.incrementUtf8(max + "a") === Some(max + "b"))
    // the successor really bounds every extension of the prefix
    assert(LakeFilters.cmpUtf8("abc￿￿", "abd") < 0)
  }

  test("harvest: string bounds land in the manifest; long values truncate with a widened upper bound; numeric columns are untouched") {
    val lake = freshLake("harvest")
    val longA = "a" * 100; val longB = "b" * 100
    PartitionedLake.write(Seq(
      (1L, "p", "alpha", 1.0), (2L, "p", "delta", 2.0),
      (3L, "p", longA, 3.0), (4L, "p", longB, 4.0))
      .toDF("k", "part", "s", "v"), lake, "part",
      statsCols = Seq("s", "v"))
    val es = manifest(lake).files("part=p")
    assert(es.nonEmpty)
    es.foreach { e =>
      assert(e.stats.contains("v") && !e.stats.contains("s"))
      val (lo, hi) = e.strStats("s")
      assert(lo.length <= 64 && hi.length <= 64)
      // bounds stay conservative: every actual value inside
      for (x <- Seq("alpha", "delta", longA, longB))
        assert(LakeFilters.cmpUtf8(lo, x) <= 0 &&
          LakeFilters.cmpUtf8(x, hi) <= 0 ||
          // (values split across several files — a file not holding x
          // need not bound it; the union check below is the real pin)
          true)
    }
    // the union of bounds covers all values
    val lo = es.map(_.strStats("s")._1).min(LakeFilters.utf8Ordering)
    val hi = es.map(_.strStats("s")._2).max(LakeFilters.utf8Ordering)
    for (x <- Seq("alpha", "delta", longA, longB))
      assert(LakeFilters.cmpUtf8(lo, x) <= 0 &&
        LakeFilters.cmpUtf8(x, hi) <= 0,
        s"value $x escapes the harvested bounds [$lo, $hi]")
  }

  test("mayMatchStats string matrix: skip only on proof; UTF-8 order (not UTF-16) decides; unknown shapes keep") {
    import org.apache.spark.sql.sources._
    val b = Map("s" -> ("f", "m")) // file holds s in [f, m]
    def may(f: Filter): Boolean =
      LakeFilters.mayMatchStats(f, Map.empty, b)
    assert(!may(EqualTo("s", "a")) && !may(EqualTo("s", "z")))
    assert(may(EqualTo("s", "g")) && may(EqualTo("s", "f")))
    assert(!may(GreaterThan("s", "m")) && may(GreaterThanOrEqual("s", "m")))
    assert(!may(LessThan("s", "f")) && may(LessThanOrEqual("s", "f")))
    assert(may(In("s", Array("a", "g"))) && !may(In("s", Array("a", "z"))))
    assert(!may(StringStartsWith("s", "n")) // every match > hi
      && may(StringStartsWith("s", "g"))
      && !may(StringStartsWith("s", "e"))) // [e, f) below lo
    assert(may(Not(EqualTo("s", "a"))), "Not keeps (no proof from bounds)")
    assert(may(IsNull("s")), "null tests keep (bounds ignore nulls)")
    assert(!may(And(EqualTo("s", "g"), EqualTo("s", "z"))))
    assert(may(Or(EqualTo("s", "a"), EqualTo("s", "g"))))
    // supplementary plane: U+10000 > U+FFFF in UTF-8/code-point order,
    // though Java compareTo says otherwise (surrogates sort low) — a
    // UTF-16 comparison would PROVE non-match and wrongly skip
    val supp = new String(Character.toChars(0x10000))
    val sb = Map("s" -> ("a", supp))
    assert("￿".compareTo(supp) > 0, "UTF-16 order (the trap)")
    assert(LakeFilters.mayMatchStats(
      EqualTo("s", "￿"), Map.empty, sb),
      "U+FFFF lies INSIDE [a, U+10000] in the order parquet wrote")
  }

  test("end-to-end: a string range predicate on a clustered column plans a strict file subset through the native SQL scan") {
    val lake = freshLake("e2e")
    val rows = (0 until 4000).map { i =>
      val s = f"s${i % 40}%03d" // s000..s039
      (i.toLong, (i % 4).toString, s)
    }
    val src = rows.toDF("k", "part", "s")
      .repartitionByRange(16, col("part"), col("s"))
      .sortWithinPartitions("part", "s")
    PartitionedLake.write(src, lake, "part", statsCols = Seq("s"))
    val scan = spark.read.format("graft-lake-v2").option("path", lake)
      .load().filter(col("s") >= "s010" && col("s") <= "s012")
    val got = scan.select("k").collect().map(_.getLong(0)).toSet
    val want = rows.filter(r => r._3 >= "s010" && r._3 <= "s012")
      .map(_._1).toSet
    assert(got === want)
    val skips = LakeScanCheck.nativeStatsSkipping(scan)
    assert(skips.nonEmpty && skips.forall { case (post, pre) => post < pre },
      s"string bounds must drop files inside kept directories: $skips")
    assert(skips.forall(_._1 > 0))
  }

  test("sticky stats sweep: every write path keeps string bounds alive — SQL INSERT, append(Nil), upsert(Nil), cdcSink, CoW UPDATE, MOR DML + compact, plain compact — and skipping still proves non-matches afterward") {
    val lake = freshLake("sticky")
    import org.apache.spark.sql.sources.GreaterThan
    // every live entry must carry string bounds for 's', and those
    // bounds must PRUNE: s > 'zzz' is provably unmatchable everywhere
    def assertArmed(step: String): Unit = {
      val m = manifest(lake)
      val entries = m.files.values.flatten.toSeq
      assert(entries.nonEmpty, s"[$step] no live files")
      entries.foreach { e =>
        assert(e.strStats.contains("s"),
          s"[$step] entry ${e.name} lost the string bounds for 's' — " +
            "a write path degraded file skipping")
        assert(!LakeFilters.mayMatchStats(GreaterThan("s", "zzz"),
          e.stats, e.strStats),
          s"[$step] bounds for ${e.name} no longer prove non-matches")
      }
    }
    // the ONE explicit harvest; every later path must inherit it
    PartitionedLake.write(Seq((1L, "a", "s01", 1.0), (2L, "b", "s02", 2.0))
      .toDF("k", "part", "s", "bal"), lake, "part", statsCols = Seq("s"))
    assertArmed("write")
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)
    spark.sql(s"INSERT INTO graft_lake.`$lake` VALUES " +
      "(3, 'a', 's03', 3.0)")
    assertArmed("sql-insert")
    PartitionedLake.append(Seq((4L, "b", "s04", 4.0))
      .toDF("k", "part", "s", "bal"), lake, Seq("part")) // statsCols = Nil
    assertArmed("append-nil")
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((1L, "a", "s11", 11.0)).toDF("k", "part", "s", "bal"))
    assertArmed("upsert-nil")
    PartitionedLake.cdcSink(spark, lake, "part", "k", "bal",
      Seq(("a", 3L, 1L, "U", 33.0)).toDF("part", "k", "seq", "op", "val"))
    assertArmed("cdc-fold")
    spark.sql(s"UPDATE graft_lake.`$lake` SET bal = bal + 1 WHERE k = 2")
    assertArmed("cow-update")
    // MOR DML stages sidecars (not skippable data files); the compact
    // that materializes them must re-harvest the bounds
    spark.conf.set(LakeDeltaRowLevel.ModeKey, LakeDeltaRowLevel.MergeOnRead)
    spark.conf.set(LakeDeltaRowLevel.KeyKey, "k")
    try spark.sql(s"UPDATE graft_lake.`$lake` SET bal = bal + 1 WHERE k = 4")
    finally {
      spark.conf.unset(LakeDeltaRowLevel.ModeKey)
      spark.conf.unset(LakeDeltaRowLevel.KeyKey)
    }
    PartitionedLake.compact(spark, lake) // statsCols = Nil: inherited
    assertArmed("mor-compact")
    // and values survived the whole gauntlet
    assert(PartitionedLake.read(spark, lake).select("k", "s", "bal")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet === Set((1L, "s11", 11.0), (2L, "s02", 3.0),
      (3L, "s03", 33.0), (4L, "s04", 5.0)))
  }
}
