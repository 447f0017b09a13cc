package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data-layout operators: the storage-side half of 100 TB
  * performance. The reference rewrites its parquet output in arrival
  * order (`s3.py:176` concat → single file); at scale, HOW rows are
  * clustered into files decides how much of those 100 TB a selective
  * query must scan. Two canonical techniques:
  *
  *   - Z-ORDER clustering (q133): interleave the bits of two filter
  *     columns and sort by the result, so every file group is a small
  *     rectangle in (col1, col2) space and file-level min/max stats
  *     prune multi-dimensional box predicates (Delta/Iceberg `OPTIMIZE
  *     ZORDER BY`).
  *   - Bucketed co-located joins (q135): pre-hash both join sides into
  *     the same bucket layout at write time, so every later join on the
  *     bucket key runs with ZERO shuffle exchanges (LayoutOpsSpec
  *     asserts the plan).
  */
object LayoutOps {

  /** Bit-interleaved z-value of two non-negative keys (16 bits each →
    * one 32-bit morton code), built from codegen'd shift/mask
    * primitives — no UDF. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(pmod(x, lit(65536L)), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(pmod(y, lit(65536L)), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The same interleave as portable SQL text (generated, not hand-kept
    * in sync — both engines evaluate the identical expression). */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"(((($x % 65536) >> $i) & 1) << ${2 * i}) + " +
        s"(((($y % 65536) >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  private def centsSum(c: Column): Column =
    sum(floor(c * 100 + 0.5).cast("long")).cast("double") / 100.0

  /** SQL NTILE(tiles) OVER (ORDER BY orderCols), computed WITHOUT the
    * single-partition window a global ORDER BY window forces, and fully
    * inside Tungsten (no RDD conversion, no per-row `Row.fromSeq`
    * boxing). Parallel decomposition of the total sort:
    *
    *   1. one small job samples quantile boundaries of the LEADING sort
    *      column (`percentile_approx` over a fixed-seed 5% sample,
    *      collected to the driver — the only driver read);
    *   2. every row gets a range-bucket id from those boundaries — a
    *      pure codegen'd function of the ROW DATA, so the assignment is
    *      identical wherever it is re-evaluated (per-partition ids
    *      would NOT be: range-exchange boundary sampling is seeded by
    *      the physical rdd id, which differs per plan compilation);
    *   3. one plan computes the rest: `row_number` over
    *      (bucket, orderCols) sorts buckets in parallel behind the
    *      window's hash exchange — the single full-data shuffle — while
    *      a parallel branch prunes to a narrow scan + map-side count
    *      per bucket, turns the ≤ #buckets count rows into cumulative
    *      offsets with a bounded single-partition window, and broadcast-
    *      joins them back; offset + local rank is the exact global
    *      rank, and NTILE's fill rule (first n%tiles groups get one
    *      extra row) is closed-form integer arithmetic over (rank, n).
    *
    * Boundary QUALITY only affects balance, never correctness: the rank
    * is defined by the total order alone, so any boundary snapshot
    * yields the same byte-equal result as the window form the oracle
    * runs. Ties with a boundary value all land in one bucket (strict
    * comparisons in the sort's direction), and nulls land where the
    * sort order puts them (bucket 0 under nulls-first, the last bucket
    * under nulls-last). Contract: the leading order column must be
    * NUMERIC (checked — the quantile sampling is type-sensitive and a
    * silently wrong tile id is worse than an error), and may be a bare
    * column OR any `desc(...)`/`asc_nulls_last(...)`-style SortOrder —
    * the direction and null ordering are decoded off the sort
    * expression ([[graft.SparkShims.sortOrderInfo]]) and drive both
    * the bucket comparisons and the null placement (all four variants
    * spec-pinned in LayoutAndGraphSpec). A leading column with few
    * distinct values (even all-equal — spec-pinned) degrades
    * parallelism (buckets collapse), not correctness.
    *
    * Measured vs the RDD zipWithIndex form it replaced (Microbench
    * `globalNtile`/`q133`, sf0.1, idle): in q133 itself the declarative
    * form wins decisively — 1.34 s vs 2.44 s and 38 KiB vs 25 MB
    * shuffled — because Catalyst prunes and pipelines through it where
    * the RDD hop is an optimization barrier. Isolated to a bare
    * ntile+count, the RDD form's single wide pass still edges it at toy
    * scale (1.02 s vs 1.25 s) by paying one fewer scan; the declarative
    * form shuffles ~33% fewer bytes (8.2 vs 12.2 MB), which is the term
    * that grows with data.
    */
  def globalNtile(df: DataFrame, orderCols: Seq[Column], tiles: Int,
      grpCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nb = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // the offsets branch runs a <= nb-row single-partition window; keep
    // that bound STRUCTURAL: nb is cluster-sized (shuffle partitions),
    // never data-sized, and a misconfigured session fails here rather
    // than silently serializing a huge window
    require(nb <= 10000, s"globalNtile buckets follow " +
      s"spark.sql.shuffle.partitions ($nb): the per-bucket offsets " +
      "window is only bounded if the bucket count is cluster-sized; " +
      "cap shuffle partitions (or split the job) below 10000")
    val lead = orderCols.head
    // the leading column may be a sql-api SortOrder (desc/asc_nulls_last
    // …); its direction/null-ordering/child are private[sql], read
    // through the repo's ONE private-API seam ([[graft.SparkShims]]).
    // Both asc and desc leading columns are supported: bucket 0 holds
    // the FIRST values of the requested order (smallest for asc, largest
    // for desc), and the null bucket follows the SortOrder's null
    // ordering (nulls-first -> bucket 0, nulls-last -> last bucket), so
    // the global rank always equals the window form.
    val (orderKey, descending, nullsLast) =
      graft.SparkShims.sortOrderInfo(lead)
        .getOrElse((lead, false, false)) // bare column = asc nulls-first
    val leadType = df.select(orderKey).schema.head.dataType
    require(leadType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"globalNtile's quantile bucketing needs a numeric leading order " +
        s"column; `$lead` is $leadType — order by a numeric derivation " +
        "(e.g. a hash or epoch cast) instead")
    val probs = (1 until nb).map(_.toDouble / nb)
    // boundary job runs on a 5% SAMPLE (fixed seed): boundaries only
    // decompose the sort — any snapshot yields the same ranks — so the
    // full-input pass (which would re-evaluate the caller's projection,
    // e.g. q133's 32-term bit-interleave, once more) buys nothing but
    // balance precision a sample already provides
    val bounds =
      if (probs.isEmpty) Seq.empty[Double]
      else Option(df.sample(withReplacement = false, 0.05, seed = 42)
        .select(percentile_approx(orderKey.cast("double"),
          array(probs.map(lit): _*), lit(1000)).as("b"))
        .head().getSeq[Double](0))
        .getOrElse(Seq.empty) // empty input: everything in bucket 0
        .distinct // duplicate quantiles would all-zero their buckets anyway
    // bucket id counts boundaries the row's value has PASSED in the
    // requested direction: `> b` ascending, `< b` descending (for desc,
    // a value above every bound has passed none and sits in bucket 0 —
    // the largest-first front). A null comparison yields null -> the
    // otherwise(0) arm, which is only correct for nulls-FIRST; nulls-last
    // orders get an explicit null arm pinning them past every boundary.
    val nonNull = bounds.map(b =>
        when(if (descending) orderKey < lit(b) else orderKey > lit(b), 1)
          .otherwise(0))
      .reduceOption(_ + _).getOrElse(lit(0))
    val bucket = if (nullsLast)
      when(orderKey.isNull, lit(bounds.size)).otherwise(nonNull)
    else nonNull
    val bucketed = df.withColumn("graft_bkt", bucket)
    // the window's own hash exchange places buckets on partitions — the
    // one full-data shuffle. Hash placement of nb contiguous ids into
    // nb partitions leaves some partitions with 2-3 buckets
    // (balls-in-bins), but bucket sizes are quantile-equalized, so the
    // straggler is a ~3x sort of an already-small partition — strictly
    // cheaper than an explicit range placement, whose exchange would
    // re-execute the whole child (scan + the caller's projection) once
    // more just to sample boundaries for ids that are already 0..nb-1
    val w = Window.partitionBy("graft_bkt").orderBy(orderCols: _*)
    val ranked = bucketed.withColumn("graft_lrk",
      row_number().over(w).cast("long"))
    val wOff = Window.orderBy("graft_bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy("graft_bkt")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // offsets branch: column pruning cuts it to a narrow scan of the
    // bucket inputs + a map-side partial count collapsing to <= nb rows
    // before a tiny exchange; the running sum comes from a bounded
    // <=nb-row single-partition window (bounded by construction, not by
    // data) and broadcast-joins back. The branch re-scans the input
    // (exchange reuse cannot fire — pruning gives the two branches
    // different subtrees), but a second NARROW columnar scan is noise
    // next to the second full-data exchange it avoids; no driver
    // collect anywhere.
    val offsets = bucketed.groupBy("graft_bkt")
      .agg(count(lit(1)).as("graft_cnt"))
      .select(col("graft_bkt"),
        coalesce(sum("graft_cnt").over(wOff), lit(0L)).as("graft_off"),
        sum("graft_cnt").over(wAll).as("graft_n"))
    val joined = ranked.join(broadcast(offsets), "graft_bkt")
      .withColumn("graft_rank", col("graft_off") + col("graft_lrk") - 1)
    // NTILE fill rule, closed-form per row over the (rank, n) longs —
    // all integer `div`/`%` so the tile id is exact
    val grp = expr(
      s"""CASE WHEN graft_rank < (graft_n % $tiles) * (graft_n div $tiles + 1)
         | THEN graft_rank div (graft_n div $tiles + 1)
         | ELSE graft_n % $tiles +
         |   (graft_rank - (graft_n % $tiles) * (graft_n div $tiles + 1))
         |     div greatest(graft_n div $tiles, CAST(1 AS BIGINT))
         | END""".stripMargin)
    joined.withColumn(grpCol, (grp + 1).cast("int"))
      .drop("graft_rank", "graft_bkt", "graft_lrk", "graft_off", "graft_n")
  }

  /** Drop + physically clear a managed table so a bucketed rewrite is
    * idempotent across JVMs (the in-memory catalog forgets tables from
    * a previous run, but their warehouse directories survive and would
    * fail CTAS non-empty-location checks). */
  private def resetTable(s: SparkSession, name: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, name)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }

  /** Rewrite `df` as a managed table bucketed+sorted on `key`, and read
    * it back. This is the write-side investment that later joins/aggs on
    * `key` repay by skipping their exchange entirely. */
  def rewriteBucketed(s: SparkSession, name: String, df: DataFrame,
      key: String, buckets: Int): DataFrame = {
    resetTable(s, name)
    // cluster to the bucket layout BEFORE the write: repartition's hash
    // (pmod(murmur3, n)) IS Spark's bucket-id function, so each task
    // holds exactly one bucket — the per-task sort+write parallelizes
    // n-ways AND the table lands as one file per bucket instead of
    // (input tasks × buckets) files (the standard bucketed-ingest shape
    // at scale; round 18: q135's single-task serial sort was the
    // query's dominant cost)
    df.repartition(buckets, col(key))
      .write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
      .saveAsTable(name)
    s.table(name)
  }

  def qs: Seq[Q] = Seq(

    // ---- Z-order layout vs natural layout, measured: cluster lineitem
    // into 64 file groups two ways (arrival order vs z-value order),
    // collect per-group (partkey, suppkey) min/max — exactly the footer
    // stats parquet keeps — and count how many groups a 2-D box
    // predicate would have to read. Same 1353 matching rows either way;
    // natural layout touches all 64 groups, z-order ~7 (sf0.01). Group
    // assignment is NTILE over the z-order (mirrored verbatim by the
    // oracle) but computed via [[globalNtile]]'s parallel bucketed sort —
    // the single-partition global window would be the one
    // non-distributed step in the repo at 100 TB. ----
    Q("q133_zorder_layout",
      (s, d) => {
        val z = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"),
            zValue(col("l_partkey"), col("l_suppkey")).as("zval"))
        val natural = globalNtile(z,
          Seq(col("l_orderkey"), col("l_linenumber")), 64, "grp")
          .withColumn("layout", lit("natural"))
        val zorder = globalNtile(z,
          Seq(col("zval"), col("l_orderkey"), col("l_linenumber")), 64, "grp")
          .withColumn("layout", lit("zorder"))
        val inBox = col("l_partkey").between(100, 300) &&
          col("l_suppkey").between(10, 30)
        val stats = natural.union(zorder)
          .groupBy("layout", "grp")
          .agg(min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
            min("l_suppkey").as("smin"), max("l_suppkey").as("smax"),
            sum(when(inBox, 1L).otherwise(0L)).as("rows_in_box"))
        stats.groupBy("layout")
          .agg(count(lit(1)).as("groups_total"),
            sum(when(col("pmin") <= 300 && col("pmax") >= 100 &&
              col("smin") <= 30 && col("smax") >= 10, 1L).otherwise(0L))
              .as("groups_hit"),
            sum("rows_in_box").as("rows_in_box"))
          .orderBy("layout")
      },
      Some(s"""WITH z AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    CAST(${zValueSql("l_partkey", "l_suppkey")} AS BIGINT) AS zval
        |  FROM lineitem),
        |layouts AS (
        |  SELECT 'natural' AS layout, l_partkey, l_suppkey,
        |    ntile(64) OVER (ORDER BY l_orderkey, l_linenumber) AS grp
        |  FROM z
        |  UNION ALL
        |  SELECT 'zorder', l_partkey, l_suppkey,
        |    ntile(64) OVER (ORDER BY zval, l_orderkey, l_linenumber)
        |  FROM z),
        |stats AS (
        |  SELECT layout, grp,
        |    min(l_partkey) AS pmin, max(l_partkey) AS pmax,
        |    min(l_suppkey) AS smin, max(l_suppkey) AS smax,
        |    sum(CASE WHEN l_partkey BETWEEN 100 AND 300
        |          AND l_suppkey BETWEEN 10 AND 30 THEN 1 ELSE 0 END)
        |      AS rows_in_box
        |  FROM layouts GROUP BY 1, 2)
        |SELECT layout, count(*) AS groups_total,
        |  CAST(sum(CASE WHEN pmin <= 300 AND pmax >= 100
        |        AND smin <= 30 AND smax >= 10 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS groups_hit,
        |  CAST(sum(rows_in_box) AS BIGINT) AS rows_in_box
        |FROM stats GROUP BY 1 ORDER BY layout""".stripMargin),
      "pipeline op: z-order data clustering + min/max pruning stats"),

    // ---- bucketed co-located join: write orders and lineitem bucketed
    // by order key into the warehouse, then join and aggregate the
    // bucketed tables. Both scans come out hash-partitioned the same
    // way, so the join needs NO Exchange on either side (LayoutOpsSpec
    // pins the plan with auto-broadcast off) — at 100 TB that is the
    // difference between re-shuffling 100 TB per join and shuffling it
    // once at ingest. Result is byte-identical to the plain join the
    // oracle runs. ----
    Q("q135_bucketed_join",
      (s, d) => {
        val o = rewriteBucketed(s, "graft_bkt_orders",
          Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice"),
          "o_orderkey", 16)
        val l = rewriteBucketed(s, "graft_bkt_lineitem",
          Tables.lineitem(s, d)
            .select("l_orderkey", "l_quantity", "l_extendedprice"),
          "l_orderkey", 16)
        o.join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy(pmod(col("o_orderkey"), lit(100L)).as("okey_mod"))
          .agg(count(lit(1)).as("n"),
            centsSum(col("l_extendedprice")).as("revenue"))
          .orderBy("okey_mod")
      },
      Some("""SELECT o_orderkey % 100 AS okey_mod, count(*) AS n,
        |  CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |    AS DOUBLE) / 100.0 AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY okey_mod""".stripMargin),
      "pipeline op: bucketed tables -> shuffle-free co-located join")
  )
}
