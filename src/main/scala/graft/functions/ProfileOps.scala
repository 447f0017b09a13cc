package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deequ-style column profiling: per-column row/null/distinct counts and
  * min/max, as ONE full-scan aggregate (the natural extension of the
  * reference's per-column validation rules — profile first, then pick
  * thresholds).
  *
  * Plan shape: a single Aggregate over the table computes every
  * column's statistics together (Spark plans the multi-distinct via one
  * Expand — still one scan, partial-aggregated map-side), then the
  * 1-row result is exploded into the (column_name, stats) long form on
  * the driver-side-sized output. At 100 TB this is exactly the ANALYZE
  * TABLE shape: one pass, no per-column rescans. Exact distinct counts
  * are what the oracle can check; for trillion-row profiling swap
  * count_distinct for approx_count_distinct (HLL, q54) — same plan, no
  * Expand.
  */
object ProfileOps {

  /** Profile `cols` of `df`: (column_name, n_rows, n_null, n_distinct,
    * min_val, max_val), min/max rendered as strings after the given
    * per-column normalizing cast (pin doubles to DECIMAL so the
    * rendering is engine-independent).
    */
  def profile(df: DataFrame, cols: Seq[(String, Column => Column)]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { case (n, t) =>
      Seq(count(col(n)).as(s"cnt_$n"),
        count_distinct(col(n)).as(s"nd_$n"),
        min(t(col(n))).cast("string").as(s"min_$n"),
        max(t(col(n))).cast("string").as(s"max_$n"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { case (n, _) =>
        struct(lit(n).as("column_name"),
          col("n_rows"),
          (col("n_rows") - col(s"cnt_$n")).as("n_null"),
          col(s"nd_$n").as("n_distinct"),
          col(s"min_$n").as("min_val"),
          col(s"max_$n").as("max_val"))
      }: _*)).as("p"))
      .select("p.*")
  }

  private val id: Column => Column = identity
  private val money: Column => Column = _.cast("decimal(18,2)")

  def qs: Seq[Q] = Seq(

    Q("q105_column_profile",
      (s, d) => profile(Tables.customer(s, d), Seq(
        ("c_acctbal", money), ("c_custkey", id), ("c_mktsegment", id),
        ("c_name", id), ("c_nationkey", id)))
        .orderBy("column_name"),
      Some("""SELECT 'c_acctbal' AS column_name, COUNT(*) AS n_rows,
             |  COUNT(*) - COUNT(c_acctbal) AS n_null,
             |  COUNT(DISTINCT c_acctbal) AS n_distinct,
             |  CAST(MIN(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS min_val,
             |  CAST(MAX(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS max_val
             |FROM customer
             |UNION ALL
             |SELECT 'c_custkey', COUNT(*), COUNT(*) - COUNT(c_custkey),
             |  COUNT(DISTINCT c_custkey), CAST(MIN(c_custkey) AS VARCHAR),
             |  CAST(MAX(c_custkey) AS VARCHAR) FROM customer
             |UNION ALL
             |SELECT 'c_mktsegment', COUNT(*), COUNT(*) - COUNT(c_mktsegment),
             |  COUNT(DISTINCT c_mktsegment), CAST(MIN(c_mktsegment) AS VARCHAR),
             |  CAST(MAX(c_mktsegment) AS VARCHAR) FROM customer
             |UNION ALL
             |SELECT 'c_name', COUNT(*), COUNT(*) - COUNT(c_name),
             |  COUNT(DISTINCT c_name), CAST(MIN(c_name) AS VARCHAR),
             |  CAST(MAX(c_name) AS VARCHAR) FROM customer
             |UNION ALL
             |SELECT 'c_nationkey', COUNT(*), COUNT(*) - COUNT(c_nationkey),
             |  COUNT(DISTINCT c_nationkey), CAST(MIN(c_nationkey) AS VARCHAR),
             |  CAST(MAX(c_nationkey) AS VARCHAR) FROM customer
             |ORDER BY column_name""".stripMargin),
      "validation generalization: single-pass column profiling (ANALYZE shape)"),

    // ---- equi-width histogram profile: the distribution complement to
    // q105's scalar stats. Two passes: a global (min, max) aggregate
    // (tiny, broadcast), then a narrow binning map + (group, bin)
    // partial-agg count — at 100 TB the binning pass is the only big
    // stage and it never shuffles rows, only (group, bin) partials.
    // The bin expression multiplies before dividing, mirrored exactly
    // in the oracle, so boundary values land identically; empty bins
    // are absent on both engines (group-by of existing rows). ----
    Q("q110_histogram_profile",
      (s, d) => {
        val bounds = Tables.events(s, d)
          .agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
        Tables.events(s, d)
          .crossJoin(broadcast(bounds))
          .select(col("event_type"),
            least(floor((col("value") - col("mn")) * 10
              / (col("mx") - col("mn"))).cast("int"), lit(9)).as("bin"))
          .groupBy("event_type", "bin")
          .agg(count(lit(1)).as("n"))
          .orderBy("event_type", "bin")
      },
      Some("""WITH bounds AS (SELECT MIN(value) AS mn, MAX(value) AS mx
             |  FROM events),
             |binned AS (SELECT event_type,
             |    LEAST(CAST(floor((value - mn) * 10 / (mx - mn)) AS INT), 9)
             |      AS bin
             |  FROM events, bounds)
             |SELECT event_type, bin, COUNT(*) AS n
             |FROM binned GROUP BY event_type, bin
             |ORDER BY event_type, bin""".stripMargin),
      "validation generalization: equi-width histogram profile per group"),

    // ---- distribution-drift monitoring (PSI): compare the value
    // distribution of the first vs second half of the month over the
    // shared 10-bin grid and emit each bin's Population-Stability-Index
    // term — the drift gate a production validation pipeline runs
    // between snapshots (Deequ/evidently-style). Plan: ONE narrow
    // binning pass tags (half, bin); two tiny aggregates (per-half
    // totals broadcast back); fractions round to 6 decimals BEFORE the
    // ln() so both engines feed the log identical doubles; the 0.0005
    // smoothing keeps empty bins finite. At 100 TB the only event-scale
    // stage is the binning scan. ----
    Q("q120_distribution_drift",
      (s, d) => {
        val bounds = Tables.events(s, d)
          .agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
        val b = Tables.events(s, d).crossJoin(broadcast(bounds))
          .select(
            when(col("ts") < lit("2024-01-16").cast("timestamp"), 1)
              .otherwise(2).as("half"),
            least(floor((col("value") - col("mn")) * 10
              / (col("mx") - col("mn"))).cast("int"), lit(9)).as("bin"))
        // ONE event-scale aggregation: totals derive from the tiny
        // (bin, half) grid instead of re-scanning + re-binning events
        // (an uncached `b` feeding two groupBys planned as two
        // independent full passes)
        val grid = b.groupBy("bin", "half").agg(count(lit(1)).as("c"))
        val totals = grid.groupBy("half").agg(sum("c").as("n"))
        val wide = grid
          .join(broadcast(totals), Seq("half"))
          .groupBy("bin")
          .agg(
            round(coalesce(max(when(col("half") === 1,
              col("c").cast("double") / col("n"))), lit(0.0)), 6).as("p1"),
            round(coalesce(max(when(col("half") === 2,
              col("c").cast("double") / col("n"))), lit(0.0)), 6).as("p2"))
        wide.select(col("bin"), col("p1"), col("p2"),
          round((col("p1") - col("p2"))
            * log((col("p1") + 0.0005) / (col("p2") + 0.0005)), 6)
            .as("psi_term"))
          .orderBy("bin")
      },
      Some("""WITH bounds AS (SELECT MIN(value) AS mn, MAX(value) AS mx
             |  FROM events),
             |binned AS (SELECT
             |    CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'
             |      THEN 1 ELSE 2 END AS half,
             |    LEAST(CAST(floor((value - mn) * 10 / (mx - mn)) AS INT), 9)
             |      AS bin
             |  FROM events, bounds),
             |totals AS (SELECT half, count(*) AS n FROM binned GROUP BY half),
             |wide AS (SELECT bin,
             |    round(CAST(COALESCE(MAX(CASE WHEN half = 1 THEN c END), 0)
             |      AS DOUBLE) / (SELECT n FROM totals WHERE half = 1), 6) AS p1,
             |    round(CAST(COALESCE(MAX(CASE WHEN half = 2 THEN c END), 0)
             |      AS DOUBLE) / (SELECT n FROM totals WHERE half = 2), 6) AS p2
             |  FROM (SELECT bin, half, count(*) AS c FROM binned
             |        GROUP BY bin, half) dist
             |  GROUP BY bin)
             |SELECT bin, p1, p2,
             |  round((p1 - p2) * ln((p1 + 0.0005) / (p2 + 0.0005)), 6)
             |    AS psi_term
             |FROM wide ORDER BY bin""".stripMargin),
      "validation generalization: PSI distribution-drift monitor between snapshots"),

    // ---- join-key skew diagnostics: the profile that decides WHETHER
    // to salt (operators/Skew) before a 100 TB join, computed from the
    // data instead of guessed. One count-per-key aggregate per audited
    // key column (map-side combined), per-table totals joined back, and
    // only the top-10 heaviest keys per column surface. share_ppm =
    // key's fraction of all rows; skew_x1000 = count / mean-count — a
    // key at skew_x1000 >= ~20x is where AQE skew-split or salting pays.
    // Exact integer outputs (floor(x + 0.5) over IEEE-deterministic
    // ratios), so the gate hash-matches. ----
    Q("q137_skew_profile",
      (s, d) => {
        val keyed = Tables.lineitem(s, d)
          .select(lit("lineitem.l_partkey").as("tbl"),
            col("l_partkey").as("k"))
          .union(Tables.orders(s, d)
            .select(lit("orders.o_custkey"), col("o_custkey")))
        val cnts = keyed.groupBy("tbl", "k").agg(count(lit(1)).as("cnt"))
        val tot = cnts.groupBy("tbl").agg(sum("cnt").as("total"),
          count(lit(1)).as("n_keys"))
        val top = cnts.withColumn("rn", row_number().over(
          Window.partitionBy("tbl").orderBy(col("cnt").desc, col("k"))))
          .filter(col("rn") <= 10)
        top.join(tot, "tbl")
          .select(col("tbl"), col("k").as("key"), col("cnt"),
            floor(col("cnt") * lit(1000000.0) / col("total") + 0.5)
              .cast("long").as("share_ppm"),
            floor(col("cnt") * col("n_keys") * lit(1000.0) / col("total") + 0.5)
              .cast("long").as("skew_x1000"))
          .orderBy(col("tbl"), col("cnt").desc, col("key"))
      },
      Some("""WITH pk AS (
        |  SELECT 'lineitem.l_partkey' AS tbl, l_partkey AS k FROM lineitem
        |  UNION ALL SELECT 'orders.o_custkey', o_custkey FROM orders),
        |cnts AS (SELECT tbl, k, count(*) AS cnt FROM pk GROUP BY 1, 2),
        |tot AS (SELECT tbl, CAST(sum(cnt) AS BIGINT) AS total,
        |    count(*) AS n_keys FROM cnts GROUP BY 1),
        |top AS (SELECT tbl, k, cnt,
        |    row_number() OVER (PARTITION BY tbl ORDER BY cnt DESC, k) AS rn
        |  FROM cnts)
        |SELECT t.tbl, t.k AS key, t.cnt,
        |  CAST(floor(t.cnt * 1000000.0 / o.total + 0.5) AS BIGINT)
        |    AS share_ppm,
        |  CAST(floor(t.cnt * o.n_keys * 1000.0 / o.total + 0.5) AS BIGINT)
        |    AS skew_x1000
        |FROM top t JOIN tot o ON t.tbl = o.tbl WHERE t.rn <= 10
        |ORDER BY t.tbl, t.cnt DESC, t.k""".stripMargin),
      "pipeline op: join-key skew diagnostics (salting decision input)")
  )
}
