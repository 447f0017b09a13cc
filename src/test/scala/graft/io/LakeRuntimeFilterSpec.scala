package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native DSv2 batch ([[LakeNativeBatchScan]]): dynamic partition
  * pruning through `SupportsRuntimeFiltering`, split planning, exact
  * post-claim statistics, and the routing gate that keeps MOR/legacy
  * snapshots on the delegated V1 plan.
  */
class LakeRuntimeFilterSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-rtf-$tag").toString

  private def v2(lake: String): DataFrame =
    spark.read.format("graft-lake-v2").option("path", lake).load()

  /** A 20-partition fact lake (4 files per partition at local[4]) and
    * a PARQUET-backed dim whose filter survives optimization (a local
    * Seq constant-folds to a LocalRelation, which the DPP rule does
    * not treat as a selective filter — real dims are table-backed).
    */
  private def starFixture(tag: String): (String, DataFrame) = {
    val dir = freshDir(tag)
    val lake = s"$dir/lake"
    val fact = spark.range(2000L).select(
      (col("id") % 20).as("day"), col("id").as("k"), (col("id") * 2).as("v"))
    PartitionedLake.write(fact, lake, "day")
    val dimPath = s"$dir/dim"
    Seq((3L, "hot"), (7L, "hot"), (11L, "cold")).toDF("day", "temp")
      .write.parquet(dimPath)
    (lake, spark.read.parquet(dimPath))
  }

  test("a star join with a selective dim delivers a runtime filter: only the matching partitions' files are opened") {
    val (lake, dim) = starFixture("star")
    val joined = v2(lake)
      .join(broadcast(dim.filter(col("temp") === "hot")), Seq("day"))
      .agg(sum("v").as("s"))
    // collect() (not head(): head plans a separate limited
    // queryExecution, so the inspected scan would never have executed)
    val result = joined.collect()(0).getLong(0)
    // ground truth: days 3 and 7 -> sum of v = 2*id over id%20 in {3,7}
    val expect = (0L until 2000L).filter(i => i % 20 == 3 || i % 20 == 7)
      .map(_ * 2).sum
    assert(result === expect)
    // the scan opened a STRICT SUBSET: 2 of 20 partitions' files
    val Seq((planned, static)) = LakeScanCheck.nativePruning(joined)
    assert(planned < static, s"runtime filter did not prune ($planned of $static)")
    assert(planned === static / 10, s"expected 2 of 20 dirs' files, got $planned of $static")
    // and the runtime filter really was a DPP expression, not chance
    assert(joined.queryExecution.executedPlan.toString
      .contains("dynamicpruning"))
  }

  test("static claimed filters and runtime filters compose; an all-pruning runtime filter yields the empty result") {
    val (lake, dim) = starFixture("compose")
    // static claim keeps day >= 5; runtime keeps {3, 7} -> only day=7
    val joined = v2(lake).filter(col("day") >= 5L)
      .join(broadcast(dim.filter(col("temp") === "hot")), Seq("day"))
      .agg(count(lit(1)).as("n"))
    assert(joined.collect()(0).getLong(0) === 100L)
    val Seq((planned, static)) = LakeScanCheck.nativePruning(joined)
    // static already cut 20 dirs to 15; runtime cut those to day=7 only
    assert(planned === static / 15, s"($planned, $static)")
    // a dim filter matching nothing prunes everything — zero files, not
    // a crash, and the join result is empty
    val none = v2(lake)
      .join(broadcast(dim.filter(col("temp") === "boiling")), Seq("day"))
      .agg(count(lit(1)).as("n"))
    assert(none.collect()(0).getLong(0) === 0L)
    // either the runtime filter pruned to zero files, or AQE's
    // empty-relation propagation eliminated the scan subtree outright
    // (broadcast side empty -> inner join empty) — both read zero
    val p2 = LakeScanCheck.nativePruning(none).map(_._1).sum
    assert(p2 === 0, s"expected zero planned files, got $p2")
  }

  test("native == v1 == API on the same star predicate, and aggregate answers match with DPP on or off") {
    val (lake, dim) = starFixture("parity")
    val hot = dim.filter(col("temp") === "hot")
    def total(fact: DataFrame): Long =
      fact.join(hot, Seq("day")).agg(sum("v")).head().getLong(0)
    val native = total(v2(lake))
    val v1 = total(spark.read.format("graft-lake").option("path", lake).load())
    val api = total(PartitionedLake.read(spark, lake))
    assert(native === v1)
    assert(native === api)
    val dppOff = spark.conf.get(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled")
    try {
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      assert(total(v2(lake)) === native)
    } finally spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled", dppOff)
  }

  test("files larger than maxPartitionBytes split into multiple input partitions; results stay exact") {
    val dir = freshDir("split")
    val lake = s"$dir/lake"
    // one partition, one file (coalesce(1)), a few hundred KB
    val fact = spark.range(200000L).coalesce(1).select(
      lit("a").as("part"), col("id").as("k"))
    PartitionedLake.write(fact, lake, "part")
    assert(PartitionedLake.read(spark, lake).inputFiles.length === 1)
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      val df = v2(lake)
      // >1 planned input partitions out of ONE file = the split path
      assert(df.rdd.getNumPartitions > 1, s"got ${df.rdd.getNumPartitions}")
      assert(df.agg(sum("k")).head().getLong(0) ===
        (0L until 200000L).sum)
      assert(df.count() === 200000L)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)
  }

  test("statistics shrink to the claimed slice: a selective partition filter reports the pruned size, not the whole snapshot") {
    val (lake, _) = starFixture("stats")
    def sizeOf(df: DataFrame): Long = {
      df.collect()
      val scans = LakeScanCheck.nativeScansOf(df)
      assert(scans.size === 1)
      scans.head.estimateStatistics().sizeInBytes().getAsLong
    }
    val whole = sizeOf(v2(lake).select("k", "v"))
    val slice = sizeOf(v2(lake).filter(col("day") === 3L).select("k", "v"))
    assert(slice < whole / 10,
      s"claimed-filter stats did not shrink: $slice vs $whole")
    // rows shrink too (exact per-directory counts)
    val pruned = v2(lake).filter(col("day") === 3L)
    pruned.collect()
    assert(LakeScanCheck.nativeScansOf(pruned).head
      .estimateStatistics().numRows().getAsLong === 100L)
  }

  test("routing: CoW AND capped-delta MOR snapshots go native; oversized sidecars and pre-protocol lakes keep the V1 fallback") {
    // CoW -> native
    val cow = freshDir("route") + "/cow"
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      cow, "part")
    val cowDf = v2(cow); cowDf.collect()
    assert(LakeScanCheck.nativeScansOf(cowDf).size === 1)
    // live MOR deltas under the per-dir byte cap -> NATIVE (round 16:
    // the task-side sidecar merge), with the tombstone applied
    val mor = freshDir("route") + "/mor"
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), mor, "part")
    PartitionedLake.cdcSinkMergeOnRead(spark, mor, "part", "k", "bal",
      Seq((2L, "b", 1L, "D", 0.0)).toDF("k", "part", "seq", "op", "val"))
    val morDf = v2(mor); morDf.collect()
    assert(LakeScanCheck.nativeScansOf(morDf).size === 1,
      "a capped-delta snapshot must go native")
    assert(morDf.count() === 1L)
    // ...but a sidecar load above the cap keeps the V1 fallback's
    // DISTRIBUTED anti-join (the task hash set must stay bounded)
    val capKey = LakeNativeBatchScan.MorMaxDeltaBytesPerDir
    try {
      spark.conf.set(capKey, "1")
      val capped = v2(mor); capped.collect()
      assert(LakeScanCheck.nativeScansOf(capped).isEmpty,
        "over-cap sidecars must route to V1")
      assert(capped.count() === 1L, "both routes agree")
    } finally spark.conf.unset(capKey)
    // adopted legacy (entries without footer row counts STILL carry
    // bytes, so adoption alone does not block the native path; but a
    // pre-protocol path with NO manifest must fall back)
    val legacy = freshDir("route") + "/legacy"
    Seq((1L, "a", 1.0)).toDF("k", "part", "bal")
      .write.partitionBy("part").parquet(legacy)
    val legDf = v2(legacy); legDf.collect()
    assert(LakeScanCheck.nativeScansOf(legDf).isEmpty)
    assert(legDf.count() === 1L)
    // compaction of the MOR lake keeps the native route (now pure CoW)
    PartitionedLake.compact(spark, mor)
    val compDf = v2(mor); compDf.collect()
    assert(LakeScanCheck.nativeScansOf(compDf).size === 1)
  }

  test("the MOR gap is closed: a star join over a live-delta snapshot runtime-prunes dirty directories NATIVELY, with the delta applied") {
    val (lake, dim) = starFixture("morgap")
    // one HOT partition gains a live merge-on-read delta: round 15
    // quantified this as the whole lake dropping to the V1 fallback
    // (every file read, no runtime-filter seam); the native sidecar
    // merge closes it — the join plans ONLY the two hot days' files
    // plus the dirty day's sidecar
    PartitionedLake.cdcSinkMergeOnRead(spark, lake, "day", "k", "v",
      Seq((3L, 3L, 1L, "U", 999L)).toDF("day", "k", "seq", "op", "val"))
    val hot = dim.filter(col("temp") === "hot")
    val morJoin = v2(lake).join(broadcast(hot), Seq("day"))
      .agg(sum("v").as("s"))
    val morResult = morJoin.collect()(0).getLong(0)
    assert(LakeScanCheck.nativeScansOf(morJoin).size === 1,
      "a capped-delta snapshot must serve the join natively")
    val Seq((planned, static)) = LakeScanCheck.nativePruning(morJoin)
    // (20 dirs x files-per-dir) + 1 sidecar statically; the 2 hot
    // dirs' files + the dirty day's sidecar planned
    val basePerDir = (static - 1) / 20
    assert(basePerDir > 0 && planned === 2 * basePerDir + 1,
      s"($planned, $static)")
    // the delta rides the native route: ground truth has k=3's v
    // replaced by 999 (id%20 in {3,7} -> sum 2*id, minus 2*3 plus 999)
    val expected = (0L until 2000L)
      .filter(id => id % 20 == 3 || id % 20 == 7)
      .map(id => if (id == 3L) 999L else 2 * id).sum
    assert(morResult === expected)
    // compaction materializes the deltas away; the SAME join stays
    // native, now sidecar-free, and the answers agree
    PartitionedLake.compact(spark, lake)
    val nativeJoin = v2(lake).join(broadcast(hot), Seq("day"))
      .agg(sum("v").as("s"))
    assert(nativeJoin.collect()(0).getLong(0) === morResult)
    val Seq((p2, s2)) = LakeScanCheck.nativePruning(nativeJoin)
    assert(p2 > 0 && p2 * 10 === s2, s"($p2, $s2)")
  }

  test("native MOR merge semantics match frameFor exactly: tombstones, post-images, pruned-out key, honest count") {
    val dir = freshDir("mor-sem")
    val lake = s"$dir/lake"
    PartitionedLake.write(Seq((1L, "a", 10L), (2L, "a", 20L),
      (3L, "b", 30L)).toDF("k", "part", "v"), lake, "part")
    // one batch: update k=1, delete k=2 ('U' on an absent key is
    // ignored by the CDC fold — upserts go through upsert(), so
    // delta-only directories never arise from this writer)
    PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "v",
      Seq((1L, "a", 1L, "U", 11L), (2L, "a", 1L, "D", 0L))
        .toDF("k", "part", "seq", "op", "val"))
    val df = v2(lake)
    df.collect()
    assert(LakeScanCheck.nativeScansOf(df).size === 1, "native route")
    val got = df.select("part", "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val viaApi = PartitionedLake.read(spark, lake)
      .select("part", "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("a", 1L, 11L), ("b", 3L, 30L)))
    assert(got === viaApi, "native == frameFor")
    // a projection that prunes the identity key out still merges (the
    // scan force-reads the key and the remap drops it)
    val sums = v2(lake).groupBy("part").agg(sum("v").as("s"))
    sums.collect()
    assert(LakeScanCheck.nativeScansOf(sums).size === 1)
    assert(sums.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      === Set(("a", 11L), ("b", 30L)))
    // count(*) does not lie: metadata counts are impossible on a dirty
    // snapshot, so the count runs through the merge
    assert(v2(lake).count() === 2L)
  }

  test("runtime pruning on a multi-level (day, src) layout prunes at the joined level; the other level's dirs survive per tuple") {
    val dir = freshDir("multi")
    val lake = s"$dir/lake"
    val fact = spark.range(1200L).select(
      (col("id") % 6).as("day"), (col("id") % 2).cast("string").as("src"),
      col("id").as("k"))
    PartitionedLake.write(fact, lake, Seq("day", "src"), Nil)
    val dimPath = s"$dir/dim"
    Seq((2L, "keep"), (5L, "keep"), (1L, "drop")).toDF("day", "tag")
      .write.parquet(dimPath)
    val joined = v2(lake)
      .join(broadcast(spark.read.parquet(dimPath)
        .filter(col("tag") === "keep")), Seq("day"))
      .agg(count(lit(1)).as("n"))
    assert(joined.collect()(0).getLong(0) === 400L) // 2 of 6 days
    val Seq((planned, static)) = LakeScanCheck.nativePruning(joined)
    // 12 leaf dirs (6 days x 2 srcs) -> 4 survive (2 days x 2 srcs)
    assert(planned === static / 3, s"($planned, $static)")
  }

  test("runtime pruning over a DATE-typed partition column: DPP-delivered date keys compile and prune exactly") {
    val dir = freshDir("datedpp")
    val lake = s"$dir/lake"
    val fact = spark.range(800L).select(
      date_add(lit(java.sql.Date.valueOf("2026-01-01")),
        (col("id") % 8).cast("int")).as("day"),
      col("id").as("k"))
    PartitionedLake.write(fact, lake, "day")
    val dimPath = s"$dir/dim"
    Seq((java.sql.Date.valueOf("2026-01-03"), "y"),
        (java.sql.Date.valueOf("2026-01-06"), "n"))
      .toDF("day", "flag").write.parquet(dimPath)
    val joined = v2(lake)
      .join(broadcast(spark.read.parquet(dimPath)
        .filter(col("flag") === "y")), Seq("day"))
      .agg(count(lit(1)).as("n"))
    assert(joined.collect()(0).getLong(0) === 100L) // 1 of 8 days
    val Seq((planned, static)) = LakeScanCheck.nativePruning(joined)
    assert(planned === static / 8, s"($planned, $static)")
  }

  test("file-level stats skipping: a residual range predicate plans only bounds-intersecting files; claim + runtime + stats compose; all routes agree") {
    val dir = freshDir("skip")
    val lake = s"$dir/lake"
    // 4 day-partitions; z-order compaction on the single column v =
    // per-partition range clustering into 4 files with disjoint
    // committed v-bounds
    val fact = spark.range(4000L).select((col("id") % 4).as("day"),
      col("id").as("k"), (col("id") % 1000).as("v"))
    PartitionedLake.write(fact, lake, "day")
    PartitionedLake.compact(spark, lake, Nil, zorderBy = Seq("v"),
      filesPerPartition = 4)
    // stats skip alone: v < 100 keeps ~1 of 4 files per directory
    val df = v2(lake).filter(col("v") < 100L).agg(count(lit(1)).as("n"))
    assert(df.collect()(0).getLong(0) === 400L)
    val Seq((post, pre)) = LakeScanCheck.nativeStatsSkipping(df)
    assert(post > 0 && post < pre, s"stats skip did not engage ($post, $pre)")
    // all three routes return the SAME rows on the skipping predicate
    def keySet(d: DataFrame): Set[Long] = d.filter(col("v") < 100L)
      .select("k").collect().map(_.getLong(0)).toSet
    val nativeKeys = keySet(v2(lake))
    assert(nativeKeys === keySet(PartitionedLake.read(spark, lake)))
    assert(nativeKeys === keySet(
      spark.read.format("graft-lake").option("path", lake).load()))
    assert(nativeKeys.size === 400)
    // COMPOSED: static claim (day >= 1) + runtime (dim keeps day=1) +
    // stats (v < 100) — each prune visible in its own observable
    val dimPath = s"$dir/dim"
    Seq((1L, "keep"), (0L, "drop")).toDF("day", "tag").write.parquet(dimPath)
    val j = v2(lake).filter(col("day") >= 1L && col("v") < 100L)
      .join(broadcast(spark.read.parquet(dimPath)
        .filter(col("tag") === "keep")), Seq("day"))
      .agg(count(lit(1)).as("n"))
    assert(j.collect()(0).getLong(0) === 100L)
    val Seq((planned, static)) = LakeScanCheck.nativePruning(j)
    assert(planned > 0 && planned < static,
      s"runtime prune did not engage ($planned, $static)")
    val Seq((post2, pre2)) = LakeScanCheck.nativeStatsSkipping(j)
    assert(post2 > 0 && post2 < pre2,
      s"stats skip did not engage under runtime pruning ($post2, $pre2)")
  }

  test("stats skipping is conservative: files without bounds are kept, non-range shapes keep everything, results never change") {
    val lake = freshDir("conskip") + "/lake"
    // NO statsCols and no z-order: committed entries carry no bounds
    PartitionedLake.write(spark.range(100L)
      .select(lit("a").as("part"), col("id").as("v")), lake, "part")
    val noStats = v2(lake).filter(col("v") < 10L)
    assert(noStats.count() === 10L)
    val Seq((p1, p2)) = { noStats.collect(); LakeScanCheck.nativeStatsSkipping(noStats) }
    assert(p1 === p2, s"skipped files without committed bounds ($p1, $p2)")
    // an all-excluding range prunes to ZERO files once bounds exist —
    // and the result is exact-empty, not a crash
    PartitionedLake.compact(spark, lake, statsCols = Seq("v"))
    val none = v2(lake).filter(col("v") > 1000000L)
    assert(none.count() === 0L)
    none.collect()
    val Seq((z, zp)) = LakeScanCheck.nativeStatsSkipping(none)
    assert(z === 0 && zp > 0, s"($z, $zp)")
    // a non-range residual shape (Not/inequality) keeps every file:
    // bounds cannot prove "no row differs from 5", so the evaluator
    // must not over-skip — the engine's row-level filter does the work
    val ne = v2(lake).filter(col("v") =!= 5L)
    assert(ne.count() === 99L)
    ne.collect()
    val Seq((k1, k2)) = LakeScanCheck.nativeStatsSkipping(ne)
    assert(k1 === k2, s"Not(EqualTo) must keep all files ($k1, $k2)")
  }

  test("the claimed=>compiles invariant is asserted at scan construction with a pointer at the builder seam") {
    val lake = freshDir("invariant") + "/lake"
    PartitionedLake.write(spark.range(10L)
      .select(lit("a").as("part"), col("id").as("v")), lake, "part")
    val m = PartitionedLake.manifestAt(spark, lake, None).get
    val schema = m.schema
    val bad = intercept[IllegalStateException] {
      new LakeNativeBatchScan(lake, None, m, schema, schema,
        claimed = Array(org.apache.spark.sql.sources.EqualTo("no_such", 1)),
        residual = Array.empty)
    }
    assert(bad.getMessage.contains("LakeScanBuilder.pushFilters"),
      bad.getMessage)
  }

  test("native reads of schema-evolved and null-partition lakes: old files surface typed nulls, __HIVE_DEFAULT_PARTITION__ round-trips") {
    val lake = freshDir("evo") + "/lake"
    PartitionedLake.write(Seq((1L, Some("a"), 1.0), (2L, None, 2.0))
      .toDF("k", "part", "bal"), lake, "part")
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((3L, "b", 3.0, "x")).toDF("k", "part", "bal", "tag"))
    val df = v2(lake)
    df.collect()
    assert(LakeScanCheck.nativeScansOf(df).size === 1, "not native")
    val rows = df.select("k", "part", "tag").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2))))
      .toSet
    assert(rows === Set((1L, Some("a"), None), (2L, None, None),
      (3L, Some("b"), Some("x"))))
    // runtime filtering over the null partition: IS NOT NULL via join
    // semantics — a dim without nulls prunes the null directory
    val dimPath = freshDir("evo") + "/dim"
    Seq(("a", 1)).toDF("part", "w").write.parquet(dimPath)
    val j = df.join(broadcast(spark.read.parquet(dimPath)
      .filter(col("w") === 1)), Seq("part"))
      .agg(count(lit(1)).as("n"))
    assert(j.collect()(0).getLong(0) === 1L)
  }
}
