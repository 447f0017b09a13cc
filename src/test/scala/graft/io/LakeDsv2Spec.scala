package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 surface ([[GraftLakeTable]] via the `graft-lake-v2` format
  * and [[LakeCatalog]]): metadata-only COUNT(*) reachable from SQL,
  * real `VERSION AS OF` syntax, and read parity with the v1 format and
  * the Scala API on copy-on-write, merge-on-read, and schema-evolved
  * lakes.
  */
class LakeDsv2Spec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def v2(lake: String): DataFrame =
    spark.read.format("graft-lake-v2").option("path", lake).load()
  private def v1(lake: String): DataFrame =
    spark.read.format("graft-lake").option("path", lake).load()

  private def rowsOf(df: DataFrame): Set[(String, Long, Double)] =
    df.select("part", "k", "bal").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  /** True iff the executed plan answered WITHOUT opening data files:
    * a LocalTableScan and no file/batch/row scan node anywhere.
    */
  private def isMetadataOnly(df: DataFrame): Boolean =
    LakeScanCheck.isMetadataOnly(df)

  private def freshLake(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-dsv2-$tag")
      .toString + "/lake"

  test("COUNT(*) on a copy-on-write lake is metadata-only: LocalTableScan, zero data-file reads, exact value") {
    val lake = freshLake("count")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "b", 3.0))
      .toDF("k", "part", "bal"), lake, "part")
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((4L, "c", 4.0)).toDF("k", "part", "bal"))
    // the format route
    val c = v2(lake).groupBy().count()
    assert(isMetadataOnly(c), c.queryExecution.executedPlan.toString())
    assert(c.head().getLong(0) === 4L)
    assert(c.head().getLong(0) ===
      PartitionedLake.rowCount(spark, lake).get)
    // Dataset.count() takes the same metadata path
    assert(v2(lake).count() === 4L)
    // the SQL route through the catalog
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)
    val sqlCount = spark.sql(s"SELECT count(*) FROM graft_lake.`$lake`")
    assert(isMetadataOnly(sqlCount),
      sqlCount.queryExecution.executedPlan.toString())
    assert(sqlCount.head().getLong(0) === 4L)
  }

  test("COUNT(*) degrades to a real scan — never a wrong answer — with live merge-on-read deltas or adopted legacy files") {
    // live MOR deltas: tombstones/post-images change the count at read
    val mor = freshLake("cmor")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "b", 3.0))
      .toDF("k", "part", "bal"), mor, "part")
    PartitionedLake.cdcSinkMergeOnRead(spark, mor, "part", "k", "bal",
      Seq((2L, "b", 1L, "D", 0.0)).toDF("k", "part", "seq", "op", "val"))
    assert(PartitionedLake.rowCount(spark, mor).isEmpty)
    val cMor = v2(mor).groupBy().count()
    assert(!isMetadataOnly(cMor))
    assert(cMor.head().getLong(0) === 2L)
    // adopted legacy lake: pre-protocol files carry no footer row counts
    val legacy = freshLake("clegacy")
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "part", "bal")
      .write.partitionBy("part").parquet(legacy)
    PartitionedLake.upsert(spark, legacy, "part", "k",
      Seq((3L, "c", 3.0)).toDF("k", "part", "bal"))
    assert(PartitionedLake.rowCount(spark, legacy).isEmpty)
    val cLegacy = v2(legacy).groupBy().count()
    assert(!isMetadataOnly(cLegacy))
    assert(cLegacy.head().getLong(0) === 3L)
    // compaction re-harvests footers and restores the metadata answer
    PartitionedLake.compact(spark, mor)
    val cAfter = v2(mor).groupBy().count()
    assert(isMetadataOnly(cAfter))
    assert(cAfter.head().getLong(0) === 2L)
  }

  test("a PARTITION-column-filtered count answers from metadata; any data-column filter degrades") {
    val lake = freshLake("fcount")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "b", 3.0))
      .toDF("k", "part", "bal"), lake, "part")
    // the ops query: COUNT(*) WHERE part = X — claimed filter, zero
    // data files (Delta answers this from metadata; so do we)
    val filtered = v2(lake).filter(col("part") === "b").groupBy().count()
    assert(isMetadataOnly(filtered),
      filtered.queryExecution.executedPlan.toString())
    assert(filtered.head().getLong(0) === 2L)
    // a DATA-column filter (or any mixed residue) needs data: degrade
    val dataF = v2(lake).filter(col("bal") > 1.5).groupBy().count()
    assert(!isMetadataOnly(dataF))
    assert(dataF.head().getLong(0) === 2L)
    val mixed = v2(lake)
      .filter(col("part") === "b" && col("bal") > 2.5).groupBy().count()
    assert(!isMetadataOnly(mixed))
    assert(mixed.head().getLong(0) === 1L)
    // grouped + claimed filter + min/max, still metadata-only
    val g = v2(lake).filter(col("part") =!= "a")
      .groupBy("part").agg(count("*").as("n"))
    assert(isMetadataOnly(g), g.queryExecution.executedPlan.toString())
    assert(g.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("b" -> 2L))
    // a claimed filter keeping NOTHING: global count is the one 0 row
    val none = v2(lake).filter(col("part") === "zz").groupBy().count()
    assert(isMetadataOnly(none))
    assert(none.head().getLong(0) === 0L)
  }

  test("claimed partition filters keep engine semantics on plain SELECTs: three-valued NOT/IN over null partitions, pruned filter columns") {
    val lake = freshLake("claimsel")
    PartitionedLake.write(
      Seq((1L, Some("a"), 1.0), (2L, Some("b"), 2.0), (3L, None, 3.0))
        .toDF("k", "part", "bal"), lake, "part")
    // NOT(part = 'a'): SQL three-valued — the null partition is
    // DROPPED (NOT null = null), not kept; two-valued folding of the
    // claimed filter would wrongly keep k=3
    val notA = v2(lake).filter(!(col("part") === "a"))
      .select("k").as[Long].collect().sorted
    assert(notA.toSeq === Seq(2L))
    // IN with a null list element: non-matching rows drop (NULL), the
    // match still wins
    val inNull = v2(lake)
      .filter(col("part").isin("a", null))
      .select("k").as[Long].collect().sorted
    assert(inNull.toSeq === Seq(1L))
    // IS NULL / IS NOT NULL on the partition column, claimed
    assert(v2(lake).filter(col("part").isNull).select("k")
      .as[Long].collect().toSeq === Seq(3L))
    // the filter column is pruned from the output: the fallback must
    // filter BEFORE pruning or the claimed predicate can't resolve
    val pruned = v2(lake).filter(col("part") === "b").select("bal")
      .as[Double].collect()
    assert(pruned.toSeq === Seq(2.0))
    // a filtered count over the null partition via metadata: IS NULL
    // is exactly evaluable against __HIVE_DEFAULT_PARTITION__
    val cNull = v2(lake).filter(col("part").isNull).groupBy().count()
    assert(isMetadataOnly(cNull),
      cNull.queryExecution.executedPlan.toString())
    assert(cNull.head().getLong(0) === 1L)
    // and parity: every claimed-filter read equals the v1 read (which
    // never claims — the engine re-applies everything there)
    def v1rows(c: org.apache.spark.sql.Column) =
      v1(lake).filter(c).select("k").as[Long].collect().toSet
    def v2rows(c: org.apache.spark.sql.Column) =
      v2(lake).filter(c).select("k").as[Long].collect().toSet
    for (c <- Seq(!(col("part") === "a"), col("part").isin("a", null),
        col("part").isNull, col("part").isNotNull, col("part") >= "b",
        col("part").startsWith("a")))
      assert(v2rows(c) === v1rows(c), c.toString)
  }

  test("DSv2 read == v1 read == API read on CoW, MOR, and schema-evolved lakes") {
    // copy-on-write with a superseded file
    val cow = freshLake("pcow")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), cow, "part")
    PartitionedLake.upsert(spark, cow, "part", "k",
      Seq((1L, "a", 9.0)).toDF("k", "part", "bal"))
    // merge-on-read with live tombstone + post-image
    val mor = freshLake("pmor")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "b", 3.0))
      .toDF("k", "part", "bal"), mor, "part")
    PartitionedLake.cdcSinkMergeOnRead(spark, mor, "part", "k", "bal",
      Seq((2L, "b", 1L, "D", 0.0), (3L, "b", 2L, "U", 30.0))
        .toDF("k", "part", "seq", "op", "val"))
    // additive evolution: a later delta carries a new column
    val evo = freshLake("pevo")
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      evo, "part")
    PartitionedLake.upsert(spark, evo, "part", "k",
      Seq((2L, "b", 2.0, "x")).toDF("k", "part", "bal", "tag"))
    Seq(cow, mor, evo).foreach { lake =>
      val api = PartitionedLake.read(spark, lake)
      assert(v2(lake).schema === api.schema, s"schema parity on $lake")
      assert(rowsOf(v2(lake)) === rowsOf(api), s"v2 != API on $lake")
      assert(rowsOf(v1(lake)) === rowsOf(api), s"v1 != API on $lake")
    }
    // the evolved column surfaces with nulls for old rows on all routes
    val evoTags = v2(evo).select("k", "tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(evoTags === Map(1L -> None, 2L -> Some("x")))
  }

  test("time travel: versionAsOf option on the v2 format and real VERSION AS OF SQL through the catalog") {
    val lake = freshLake("tt")
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      lake, "part")
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((1L, "a", 2.0), (2L, "b", 5.0)).toDF("k", "part", "bal"))
    val atV1 = spark.read.format("graft-lake-v2").option("path", lake)
      .option("versionAsOf", "1").load()
    assert(rowsOf(atV1) === Set(("a", 1L, 1.0)))
    assert(rowsOf(atV1) ===
      rowsOf(PartitionedLake.readVersion(spark, lake, 1)))
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)
    val sqlV1 = spark.sql(
      s"SELECT part, k, bal FROM graft_lake.`$lake` VERSION AS OF 1")
    assert(rowsOf(sqlV1) === Set(("a", 1L, 1.0)))
    val sqlHead = spark.sql(
      s"SELECT part, k, bal FROM graft_lake.`$lake`")
    assert(rowsOf(sqlHead) === Set(("a", 1L, 2.0), ("b", 2L, 5.0)))
    // COUNT(*) at an old version is ALSO metadata-only (per-version
    // manifests carry their own row counts)
    val cV1 = spark.sql(
      s"SELECT count(*) FROM graft_lake.`$lake` VERSION AS OF 1")
    assert(isMetadataOnly(cV1), cV1.queryExecution.executedPlan.toString())
    assert(cV1.head().getLong(0) === 1L)
    // an unresolvable version fails loudly, not silently-latest
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_lake.`$lake` VERSION AS OF 99")
        .collect()
    }
    assert(e.getMessage.contains("not resolvable"), e.getMessage)
  }

  test("a pinned version whose partition directory was externally retired fails LOUDLY on every registered surface") {
    val lake = freshLake("retired")
    PartitionedLake.write(
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "part", "bal"),
      lake, "part")
    // full overwrite de-references part=b from the LATEST snapshot
    PartitionedLake.write(Seq((1L, "a", 9.0)).toDF("k", "part", "bal"),
      lake, "part")
    // external cleanup removes the still-time-travel-referenced dir
    val dir = new java.io.File(s"$lake/part=b")
    dir.listFiles().foreach(_.delete()); assert(dir.delete())
    // the latest read is untouched...
    assert(rowsOf(v2(lake)) === Set(("a", 1L, 9.0)))
    // ...but every explicit-version surface must fail at RESOLVE time
    // with the retirement error — not a mid-scan FileNotFound, and
    // never silent partial data under ignoreMissingFiles. The batch
    // sources used to skip readVersion's directory guard (review
    // finding); they now share manifestAt's.
    def assertRetired(body: => Unit): Unit = {
      val e = intercept[Exception](body)
      assert(e.getMessage.contains("retired"), e.getMessage)
    }
    assertRetired(spark.read.format("graft-lake-v2").option("path", lake)
      .option("versionAsOf", "1").load())
    assertRetired(spark.read.format("graft-lake").option("path", lake)
      .option("versionAsOf", "1").load().collect())
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)
    assertRetired(spark.sql(
      s"SELECT * FROM graft_lake.`$lake` VERSION AS OF 1").collect())
  }

  test("filters and column pruning flow through the v2 scan into the delegated plan") {
    val lake = freshLake("filt")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "b", 3.0))
      .toDF("k", "part", "bal"), lake, "part")
    val filtered = v2(lake).filter(col("part") === "b" && col("k") > 2L)
    assert(rowsOf(filtered) === Set(("b", 3L, 3.0)))
    val narrow = v2(lake).select("k").as[Long].collect().sorted
    assert(narrow === Array(1L, 2L, 3L))
    // MOR through v2 with a filter: merge still applied
    PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
      Seq((3L, "b", 1L, "U", 30.0)).toDF("k", "part", "seq", "op", "val"))
    assert(rowsOf(v2(lake).filter(col("part") === "b")) ===
      Set(("b", 2L, 2.0), ("b", 3L, 30.0)))
  }

  test("GROUP BY partition columns + COUNT(*) answers from metadata: per-partition, prefix grouping, typed and escaped values") {
    val lake = freshLake("gcount")
    PartitionedLake.write(Seq(
      (1L, "d1", "web", 1.0), (2L, "d1", "web", 2.0), (3L, "d1", "app", 3.0),
      (4L, "d=2", "web", 4.0), (5L, "d=2", "web", 5.0))
      .toDF("k", "day", "src", "bal"), lake, Seq("day", "src"), Nil)
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)
    // leaf-level histogram via SQL: metadata-only
    val leaf = spark.sql(s"SELECT day, src, count(*) AS n " +
      s"FROM graft_lake.`$lake` GROUP BY day, src")
    assert(isMetadataOnly(leaf), leaf.queryExecution.executedPlan.toString())
    assert(leaf.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).toSet ===
      Set(("d1", "web", 2L), ("d1", "app", 1L), ("d=2", "web", 2L)))
    // PREFIX grouping sums the deeper leaves, still metadata-only
    val byDay = v2(lake).groupBy("day").count()
    assert(isMetadataOnly(byDay), byDay.queryExecution.executedPlan.toString())
    assert(byDay.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("d1" -> 3L, "d=2" -> 2L))
    // grouping by a NON-partition column degrades to the real scan
    val byBal = v2(lake).groupBy("bal").count()
    assert(!isMetadataOnly(byBal))
    assert(byBal.count() === 5L)
    // typed partition values: a long-typed partition column round-trips
    val typed = freshLake("gtyped")
    PartitionedLake.write(Seq((1L, 7L, "a"), (2L, 7L, "b"), (3L, 8L, "c"))
      .toDF("k", "bucket", "v"), typed, "bucket")
    val byBucket = v2(typed).groupBy("bucket").count()
    assert(isMetadataOnly(byBucket))
    assert(byBucket.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(7L -> 2L, 8L -> 1L))
    // the null partition surfaces as a null group
    val withNull = freshLake("gnull")
    PartitionedLake.write(Seq((1L, Some("p1"), "a"), (2L, None, "b"))
      .toDF("k", "part", "v"), withNull, "part")
    val byPart = v2(withNull).groupBy("part").count()
    assert(isMetadataOnly(byPart))
    assert(byPart.collect().map(r =>
      Option(r.getString(0)) -> r.getLong(1)).toMap ===
      Map(Some("p1") -> 1L, None -> 1L))
  }

  test("MIN/MAX of partition columns answer from metadata: typed ordering, nulls skipped, grouped and mixed with COUNT(*)") {
    val lake = freshLake("minmax")
    // long-typed partition values where STRING ordering would lie:
    // lexicographically '9' > '12', numerically 12 > 9
    PartitionedLake.write(Seq(
      (1L, 9L, "a", 1.0), (2L, 12L, "a", 2.0), (3L, 3L, "b", 3.0))
      .toDF("k", "day", "src", "bal"), lake, Seq("day", "src"), Nil)
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)
    // the freshness probe: metadata-only, TYPED comparison
    val probe = spark.sql(
      s"SELECT max(day) AS hi, min(day) AS lo, count(*) AS n " +
        s"FROM graft_lake.`$lake`")
    assert(isMetadataOnly(probe), probe.queryExecution.executedPlan.toString())
    assert(probe.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((12L, 3L, 3L)))
    // exact values, not string ordering: min over BOTH day partitions
    val lo = spark.sql(s"SELECT min(day) FROM graft_lake.`$lake`")
    assert(isMetadataOnly(lo))
    assert(lo.head().getLong(0) === 3L)
    // grouped: per-src day range, still metadata-only
    val grouped = v2(lake).groupBy("src")
      .agg(min("day").as("lo"), max("day").as("hi"), count("*").as("n"))
    assert(isMetadataOnly(grouped),
      grouped.queryExecution.executedPlan.toString())
    assert(grouped.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet ===
      Set(("a", 9L, 12L, 2L), ("b", 3L, 3L, 1L)))
    // MIN/MAX of a DATA column must NEVER route to metadata: the
    // manifest's stats are ULP-widened BOUNDS for file skipping, not
    // exact values (footerInfo widens long stats with nextDown/nextUp)
    val dataMin = v2(lake).agg(min("bal"))
    assert(!isMetadataOnly(dataMin))
    assert(dataMin.head().getDouble(0) === 1.0)
    // a null partition is skipped by MIN/MAX (SQL semantics), counted
    // by COUNT(*)
    val withNull = freshLake("minmaxnull")
    PartitionedLake.write(Seq((1L, Some("p1"), "a"), (2L, None, "b"))
      .toDF("k", "part", "v"), withNull, "part")
    val nn = v2(withNull).agg(min("part"), max("part"), count("*"))
    assert(isMetadataOnly(nn))
    assert(nn.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq(("p1", "p1", 2L)))
    // live MOR deltas degrade MIN/MAX exactly like COUNT(*): a delta
    // can empty a partition, so its dir value must not be trusted
    val morLake = freshLake("minmaxmor")
    PartitionedLake.write(Seq((1L, 5L, 1.0), (2L, 9L, 2.0))
      .toDF("k", "day", "bal"), morLake, "day")
    PartitionedLake.cdcSinkMergeOnRead(spark, morLake, "day", "k", "bal",
      Seq((2L, 9L, 1L, "D", 0.0)).toDF("k", "day", "seq", "op", "val"))
    val afterMor = v2(morLake).agg(max("day"))
    assert(!isMetadataOnly(afterMor))
    // the true max after the delete is 5 — a metadata answer would
    // have said 9
    assert(afterMor.head().getLong(0) === 5L)
  }

  test("size statistics from the manifest: a small lake wins a BROADCAST join through both registered formats") {
    val lake = freshLake("stats")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), lake, "part")
    val big = spark.range(200000L).withColumnRenamed("id", "k")
    def broadcastChosen(dim: org.apache.spark.sql.DataFrame): Boolean =
      big.join(dim, "k").queryExecution.executedPlan.toString()
        .contains("BroadcastHashJoin")
    // byte sizes ride in the manifest, so both surfaces report exact
    // statistics instead of the huge unknown default
    assert(broadcastChosen(v1(lake)), "v1 format read did not broadcast")
    assert(broadcastChosen(v2(lake)), "DSv2 read did not broadcast")
    // the raw numbers match the disk truth
    val m = PartitionedLake.latestManifest(
      new org.apache.hadoop.fs.Path(lake)
        .getFileSystem(spark.sparkContext.hadoopConfiguration), lake).get
    val onDisk = PartitionedLake.read(spark, lake).inputFiles
      .map(f => new java.io.File(new java.net.URI(f)).length()).sum
    assert(PartitionedLake.metadataSizeBytes(m) === Some(onDisk))
    // unknown stays unknown: a manifest entry without bytes (pre-bytes
    // manifests) disables the size answer rather than underestimating
    val stripped = m.copy(files = m.files.view.mapValues(
      _.map(_.copy(bytes = None))).toMap)
    assert(PartitionedLake.metadataSizeBytes(stripped).isEmpty)
    // live MOR deltas also disable it (their sidecar sizes are untracked)
    PartitionedLake.cdcSinkMergeOnRead(spark, lake, "part", "k", "bal",
      Seq((1L, "a", 1L, "U", 9.0)).toDF("k", "part", "seq", "op", "val"))
    val m2 = PartitionedLake.latestManifest(
      new org.apache.hadoop.fs.Path(lake)
        .getFileSystem(spark.sparkContext.hadoopConfiguration), lake).get
    assert(PartitionedLake.metadataSizeBytes(m2).isEmpty)
  }

  test("TIMESTAMP AS OF resolves to the newest version published at or before it (manifest-mtime semantics)") {
    val lake = freshLake("tsof")
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      lake, "part")
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((2L, "b", 2.0)).toDF("k", "part", "bal"))
    // pin the publish times deterministically instead of sleeping
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def manifestOf(v: Long) = new org.apache.hadoop.fs.Path(
      s"$lake/_manifest", f"v$v%09d.txt")
    val t1 = java.sql.Timestamp.valueOf("2030-01-01 00:00:00").getTime
    val t2 = java.sql.Timestamp.valueOf("2030-01-02 00:00:00").getTime
    fs.setTimes(manifestOf(1L), t1, -1)
    fs.setTimes(manifestOf(2L), t2, -1)
    assert(PartitionedLake.versionAt(spark, lake, t1) === Some(1L))
    assert(PartitionedLake.versionAt(spark, lake, t2 + 1) === Some(2L))
    assert(PartitionedLake.versionAt(spark, lake, t1 - 1) === None)
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)
    val old = spark.sql(s"SELECT part, k, bal FROM graft_lake.`$lake` " +
      "TIMESTAMP AS OF '2030-01-01 12:00:00'")
    assert(rowsOf(old) === Set(("a", 1L, 1.0)))
    val now = spark.sql(s"SELECT part, k, bal FROM graft_lake.`$lake` " +
      "TIMESTAMP AS OF '2030-01-03 00:00:00'")
    assert(rowsOf(now) === Set(("a", 1L, 1.0), ("b", 2L, 2.0)))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_lake.`$lake` " +
        "TIMESTAMP AS OF '2001-01-01 00:00:00'").collect()
    }
    assert(e.getMessage.contains("at or before"), e.getMessage)
  }

  test("SQL CREATE TABLE ... USING graft-lake-v2 resolves through the DSv2 table, metadata count included") {
    val lake = freshLake("ctas")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), lake, "part")
    spark.sql("DROP TABLE IF EXISTS lake_v2_t")
    spark.sql(s"CREATE TABLE lake_v2_t USING `graft-lake-v2` " +
      s"OPTIONS (path '$lake')")
    try {
      assert(spark.sql("SELECT part, k, bal FROM lake_v2_t").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet ===
        Set(("a", 1L, 1.0), ("b", 2L, 2.0)))
      val c = spark.sql("SELECT count(*) FROM lake_v2_t")
      assert(isMetadataOnly(c), c.queryExecution.executedPlan.toString())
      assert(c.head().getLong(0) === 2L)
    } finally spark.sql("DROP TABLE IF EXISTS lake_v2_t")
  }

  test("snapshot consistency under a racing commit: a loaded v2 frame pins ONE snapshot for both count and collect; a new load sees the commit") {
    val lake = freshLake("pin")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), lake, "part")
    val pinned = v2(lake)
    // a commit lands AFTER the load
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((3L, "c", 3.0)).toDF("k", "part", "bal"))
    // the pinned frame describes ONE snapshot: metadata count and the
    // actual scan must agree (an earlier form re-resolved latest at
    // scan time and could disagree with its own pinned count)
    assert(pinned.count() === 2L)
    assert(rowsOf(pinned) === Set(("a", 1L, 1.0), ("b", 2L, 2.0)))
    // a FRESH load resolves the new head (the provider memo never
    // outlives one load)
    val fresh = v2(lake)
    assert(fresh.count() === 3L)
    assert(rowsOf(fresh) ===
      Set(("a", 1L, 1.0), ("b", 2L, 2.0), ("c", 3L, 3.0)))
  }

  test("a fully-emptied lake (every row deleted) reads as empty through the v2 surface instead of crashing") {
    val lake = freshLake("empty")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), lake, "part")
    PartitionedLake.cdcSink(spark, lake, "part", "k", "bal",
      Seq((1L, "a", 1L, "D", 0.0), (2L, "b", 2L, "D", 0.0))
        .toDF("k", "part", "seq", "op", "val"))
    val empty = v2(lake)
    assert(empty.count() === 0L)
    assert(empty.collect().isEmpty)
    assert(empty.schema.fieldNames.toSet === Set("k", "part", "bal"))
    // and the z-order compactor no-ops on it rather than crashing
    PartitionedLake.compact(spark, lake, Nil, zorderBy = Seq("bal"))
    assert(v2(lake).count() === 0L)
  }

  test("SQL history metadata table: SELECT * FROM lake.`/path#history` returns the audit rows, missing lakes fail as missing tables") {
    val lake = freshLake("sqlhist")
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      lake, "part")
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((2L, "b", 2.0)).toDF("k", "part", "bal"))
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)
    val h = spark.sql(
      s"SELECT version, n_partitions, n_rows, changed_partitions " +
        s"FROM graft_lake.`$lake#history` ORDER BY version")
    assert(h.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      if (r.isNullAt(3)) -1 else r.getInt(3))).toSeq ===
      Seq((1L, 1, 1L, -1), (2L, 2, 2L, 1)))
    // parity with the Scala API, column for column
    val api = PartitionedLake.history(spark, lake)
    assert(api.columns.toSeq ===
      spark.sql(s"SELECT * FROM graft_lake.`$lake#history`").columns.toSeq)
    assert(api.count() === 2L)
    // a #history over a missing lake is a missing table
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_lake.`$lake-nope#history`").collect()
    }
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
  }

  test("differential filter fuzz: 200 random partition predicates agree between the claiming v2 path and the engine-evaluated v1 path") {
    val lake = freshLake("filterfuzz")
    // partition values chosen to hit every evaluator edge: null
    // (__HIVE_DEFAULT_PARTITION__), empty string, an escaped char, and
    // a long column where string ordering lies ('9' vs '12')
    PartitionedLake.write(Seq(
      (1L, Some("a"), 3L, 1.0), (2L, Some("b"), 9L, 2.0),
      (3L, None, 12L, 3.0), (4L, Some(""), 9L, 4.0),
      (5L, Some("a=b"), 100L, 5.0), (6L, Some("zz"), 3L, 6.0))
      .toDF("k", "part", "day", "bal"), lake, Seq("part", "day"), Nil)
    val rnd = new scala.util.Random(42)
    val strLits = Seq("a", "b", "zz", "a=b", "", "nope")
    val longLits = Seq(3L, 9L, 12L, 100L, 7L)
    def leaf(): org.apache.spark.sql.Column = rnd.nextInt(9) match {
      case 0 => col("part") === strLits(rnd.nextInt(strLits.size))
      case 1 => col("part") > strLits(rnd.nextInt(strLits.size))
      case 2 => col("part").isNull
      case 3 => col("part").isin(
        Seq.fill(1 + rnd.nextInt(3))(strLits(rnd.nextInt(strLits.size))): _*)
      case 4 => col("part").startsWith("a")
      case 5 => col("day") === longLits(rnd.nextInt(longLits.size))
      case 6 => col("day") >= longLits(rnd.nextInt(longLits.size))
      case 7 => col("day") < longLits(rnd.nextInt(longLits.size))
      case 8 => col("part") <=> strLits(rnd.nextInt(strLits.size))
    }
    def tree(depth: Int): org.apache.spark.sql.Column =
      if (depth == 0) leaf()
      else rnd.nextInt(4) match {
        case 0 => tree(depth - 1) && tree(depth - 1)
        case 1 => tree(depth - 1) || tree(depth - 1)
        case 2 => !tree(depth - 1)
        case _ => leaf()
      }
    val v1frame = v1(lake)
    val v2frame = v2(lake)
    for (i <- 0 until 200) {
      val pred = tree(1 + rnd.nextInt(2))
      val expect = v1frame.filter(pred).select("k").as[Long].collect().toSet
      val got = v2frame.filter(pred).select("k").as[Long].collect().toSet
      assert(got === expect, s"filter #$i: $pred")
      // and the metadata-count path agrees with the engine's count
      val n = v2frame.filter(pred).groupBy().count().head().getLong(0)
      assert(n === expect.size.toLong, s"count #$i: $pred")
    }
  }

  test("claimed filters over a DATE-typed partition column: range prune, metadata count, parity with v1") {
    val lake = freshLake("datepart")
    val df = Seq(
      (1L, java.sql.Date.valueOf("2026-01-01"), 1.0),
      (2L, java.sql.Date.valueOf("2026-01-02"), 2.0),
      (3L, java.sql.Date.valueOf("2026-02-01"), 3.0))
      .toDF("k", "day", "bal")
    PartitionedLake.write(df, lake, "day")
    // date literals claim and evaluate against the dir-string cast
    val jan = v2(lake)
      .filter(col("day") < java.sql.Date.valueOf("2026-01-15"))
    assert(jan.select("k").as[Long].collect().toSet === Set(1L, 2L))
    val cJan = jan.groupBy().count()
    assert(isMetadataOnly(cJan), cJan.queryExecution.executedPlan.toString())
    assert(cJan.head().getLong(0) === 2L)
    // min/max of the date partition column, typed
    val range = v2(lake).agg(min("day"), max("day"))
    assert(isMetadataOnly(range))
    assert(range.head().getDate(0) === java.sql.Date.valueOf("2026-01-01"))
    assert(range.head().getDate(1) === java.sql.Date.valueOf("2026-02-01"))
    // parity with the engine-evaluated v1 path
    for (c <- Seq(col("day") === java.sql.Date.valueOf("2026-01-02"),
        col("day") >= java.sql.Date.valueOf("2026-01-02"))) {
      assert(v2(lake).filter(c).select("k").as[Long].collect().toSet ===
        v1(lake).filter(c).select("k").as[Long].collect().toSet, c.toString)
    }
  }

  test("isMetadataOnly is structural: a real file scan fails it even under AQE wrappers, and a LocalTableScan passes") {
    val lake = freshLake("structcheck")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), lake, "part")
    // positive: the metadata count is a LocalTableScan-only plan
    assert(isMetadataOnly(v2(lake).groupBy().count()))
    // negative: a data-column aggregate reads files — the leaf walk
    // must see the scan node regardless of what it is named
    val real = v2(lake).agg(sum("bal"))
    real.collect()
    assert(!isMetadataOnly(real), real.queryExecution.executedPlan.toString())
    // negative under AQE: a shuffling join wraps the plan in
    // AdaptiveSparkPlanExec — unwrapped, the file scan still fails it
    val joined = v2(lake).as("l")
      .join(v2(lake).as("r"), Seq("part")).groupBy("part").count()
    joined.collect()
    assert(!isMetadataOnly(joined))
    // negative via subquery: a scalar subquery hiding the file scan is
    // not a child node — the walk must descend into subqueries
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)
    val sub = spark.sql(
      s"SELECT (SELECT sum(bal) FROM graft_lake.`$lake`) AS s")
    sub.collect()
    assert(!isMetadataOnly(sub), sub.queryExecution.executedPlan.toString())
  }

  test("a declared schema mismatching the manifest fails loudly at load; a matching declaration is accepted") {
    val lake = freshLake("declschema")
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      lake, "part")
    // matching declaration (names + types): accepted
    val ok = spark.read.format("graft-lake-v2").option("path", lake)
      .schema("k LONG, part STRING, bal DOUBLE").load()
    assert(ok.count() === 1L)
    // mismatched type: loud, naming both schemas — not a downstream
    // analysis error
    val e = intercept[Exception] {
      spark.read.format("graft-lake-v2").option("path", lake)
        .schema("k INT, part STRING, bal DOUBLE").load()
    }
    assert(e.getMessage.contains("declared") &&
      e.getMessage.contains("manifest"), e.getMessage)
  }

  test("VERSION AS OF / TIMESTAMP AS OF on #history raises the targeted unversioned-history error") {
    val lake = freshLake("histver")
    PartitionedLake.write(Seq((1L, "a", 1.0)).toDF("k", "part", "bal"),
      lake, "part")
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_lake.`$lake#history` VERSION AS OF 1")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("#history") &&
      m.contains("retained snapshots")), e.toString)
  }

  test("SQL #changes table == API changesBetween on both granularities; malformed parameters fail loudly") {
    val lake = freshLake("sqlchanges")
    PartitionedLake.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "part", "bal"), lake, "part")
    PartitionedLake.upsert(spark, lake, "part", "k",
      Seq((1L, "a", 9.0), (3L, "b", 3.0)).toDF("k", "part", "bal"))
    PartitionedLake.cdcSink(spark, lake, "part", "k", "bal",
      Seq((2L, "b", 1L, "D", 0.0)).toDF("k", "part", "seq", "op", "val"))
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)
    def key(df: DataFrame): Set[(Long, String, Long)] =
      df.collect().map { r =>
        (r.getAs[Long]("k"), r.getAs[String]("_change_type"),
          if (df.columns.contains("_commit_version"))
            r.getAs[Long]("_commit_version") else -1L)
      }.toSet
    // net form
    assert(key(spark.sql(
      s"SELECT * FROM graft_lake.`$lake#changes?from=1&to=3&keyCols=k`")) ===
      key(PartitionedLake.changesBetween(spark, lake, 1L, 3L, Seq("k"))))
    // per-commit form carries _commit_version; granularity is
    // case-insensitive (pre-validation behavior accepted 'Commit')
    val pc = spark.sql(s"SELECT * FROM graft_lake.`$lake#changes?" +
      "from=1&to=3&keyCols=k&granularity=Commit`")
    assert(pc.columns.contains("_commit_version"))
    val apiPc = PartitionedLake.changesBetween(
      spark, lake, 1L, 3L, Seq("k"), perCommit = true)
    assert(key(pc) === key(apiPc))
    // the table's cheap schema derivation cannot drift from the API's
    // actual output columns (the frame is lazy; schema comes from the
    // TO manifest alone)
    assert(pc.schema.fieldNames.toSeq === apiPc.schema.fieldNames.toSeq)
    assert(spark.sql(s"SELECT * FROM graft_lake.`$lake#changes?" +
        "from=1&to=3&keyCols=k`").schema.fieldNames.toSeq ===
      PartitionedLake.changesBetween(spark, lake, 1L, 3L, Seq("k"))
        .schema.fieldNames.toSeq)
    // malformed/unknown parameters and a granularity typo fail loudly
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    def refuses(suffix: String, needle: String): Unit = {
      val e = intercept[Exception] {
        spark.sql(s"SELECT * FROM graft_lake.`$lake$suffix`").collect()
      }
      assert(messages(e).exists(_.contains(needle)), s"$suffix -> $e")
    }
    refuses("#changes?from=1&to=3", "keyCols")
    refuses("#changes?from=1&to=3&keyCols=k&granularity=per-commit",
      "granularity")
    refuses("#changes?from=1&to=3&keyCols=k&keyCol=typo", "unknown")
    refuses("#changes", "expected")
    // a versioned read of the feed is refused with directions
    val v = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_lake.`$lake#changes?from=1&to=3&" +
        "keyCols=k` VERSION AS OF 1").collect()
    }
    assert(messages(v).exists(_.contains("already explicit")), v.toString)
  }

  test("catalog guardrails: unpartitioned CREATE and ALTER refuse with directions; missing lakes are missing tables") {
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)
    val missing = intercept[Exception] {
      spark.sql("SELECT * FROM graft_lake.`/nonexistent/lake/path`")
        .collect()
    }
    assert(missing.getMessage.toLowerCase.contains("table"),
      missing.getMessage)
    // CREATE without PARTITIONED BY refuses with the requirement (a
    // lake is partitioned by construction); ALTER refuses with the
    // evolution directions (see LakeSqlWriteSpec for the full
    // CREATE/CTAS/DROP surface)
    def says(t: Throwable, what: String): Boolean =
      Option(t.getMessage).exists(_.contains(what)) ||
        Option(t.getCause).exists(says(_, what))
    val noPart = intercept[Exception] {
      spark.sql("CREATE TABLE graft_lake.`/tmp/graft-dsv2-ro` (k LONG)")
    }
    assert(says(noPart, "PARTITIONED BY"), noPart.getMessage)
    val alter = intercept[Exception] {
      spark.sql("ALTER TABLE graft_lake.`/tmp/graft-dsv2-ro` " +
        "ADD COLUMN extra STRING")
    }
    assert(says(alter, "ALTER TABLE") || says(alter, "TABLE_OPERATION") ||
      says(alter, "not found") || says(alter, "NoSuchTable"),
      alter.getMessage)
  }
}
