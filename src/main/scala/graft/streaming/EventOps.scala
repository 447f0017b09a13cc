package graft.streaming

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Oracle-checked batch forms of the streaming operators. The identical
  * transform functions run under readStream in StreamingSpec — batch is how
  * the DuckDB oracle can pin their semantics.
  */
object EventOps {

  def qs: Seq[Q] = Seq(

    // ---- tumbling-window aggregation (same fn as the streaming query) ----
    Q("q50_window_agg",
      (s, d) => EventStreams.windowedCounts(Tables.events(s, d))
        .orderBy("hour_start", "event_type"),
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
             |  event_type, COUNT(*) AS n,
             |  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             |    / 100.0 AS total_value
             |FROM events GROUP BY 1, 2
             |ORDER BY hour_start, event_type""".stripMargin),
      "§2.7 streaming: tumbling-window aggregation (watermarked in stream mode)"),

    // ---- sessionization: gap > 30 min via lag + running sum ----
    Q("q51_sessionize",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("user_id"), unix_timestamp(col("ts")).as("ts_sec"),
            col("event_id"))
        val w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
        e.withColumn("prev", lag("ts_sec", 1).over(w))
          .withColumn("new_session",
            when(col("prev").isNull || col("ts_sec") - col("prev") > 1800, 1).otherwise(0))
          .groupBy("user_id")
          .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id,
             |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec, event_id
             |  FROM events),
             |flagged AS (SELECT user_id,
             |  CASE WHEN lag(ts_sec) OVER w IS NULL
             |         OR ts_sec - lag(ts_sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_session
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
             |SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
             |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin),
      "§2.7 streaming: sessionization (gap > 30 min), lag + running flag"),

    // ---- as-of join: latest prior 'purchase' per event, via a
    // conditional running max (composition beats a custom SparkPlan here:
    // one window over the event stream, no join at all) ----
    Q("q53_asof_prev_purchase",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_timestamp(col("ts")).as("ts_sec"))
          .withColumn("prev_purchase_sec",
            max(when(col("event_type") === "purchase", col("ts_sec"))).over(w))
          .filter(col("event_type") === "error")
          .select("user_id", "event_id", "ts_sec", "prev_purchase_sec")
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec
             |  FROM events),
             |j AS (SELECT user_id, event_id, event_type, ts_sec,
             |  MAX(CASE WHEN event_type = 'purchase' THEN ts_sec END) OVER
             |    (PARTITION BY user_id ORDER BY ts_sec, event_id
             |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase_sec
             |  FROM e)
             |SELECT user_id, event_id, ts_sec, prev_purchase_sec
             |FROM j WHERE event_type = 'error'
             |ORDER BY user_id, event_id""".stripMargin),
      "custom-operator family: as-of join composed from a conditional running max"),

    // ---- interval join: purchases attributed to clicks within 10 min.
    // Batch form of a stream-stream join (equi on user_id + event-time
    // range); the streaming twin with watermarks runs in StreamingSpec.
    // The equi-key keeps it a hash/sort-merge join on user_id — the range
    // predicate is a post-join filter, not a cross product. ----
    Q("q73_interval_join",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_timestamp(col("ts")).as("ts_sec"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts_sec").as("p_sec"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
            col("ts_sec").as("c_sec"))
        purchases.join(clicks,
          col("user_id") === col("c_user") &&
            col("c_sec") <= col("p_sec") && col("c_sec") > col("p_sec") - 600,
          "left")
          .groupBy("user_id", "purchase_id", "p_sec")
          .agg(count(col("click_id")).as("n_clicks"),
            max(col("c_sec")).as("last_click_sec"))
          .orderBy("user_id", "purchase_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec
             |  FROM events),
             |p AS (SELECT user_id, event_id AS purchase_id, ts_sec AS p_sec
             |  FROM e WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, event_id AS click_id, ts_sec AS c_sec
             |  FROM e WHERE event_type = 'click')
             |SELECT p.user_id, purchase_id, p_sec,
             |  COUNT(click_id) AS n_clicks, MAX(c_sec) AS last_click_sec
             |FROM p LEFT JOIN c ON p.user_id = c.user_id
             |  AND c_sec <= p_sec AND c_sec > p_sec - 600
             |GROUP BY p.user_id, purchase_id, p_sec
             |ORDER BY p.user_id, purchase_id""".stripMargin),
      "§2.7 streaming: event-time interval join (stream-stream join, batch twin)"),

    // ---- sliding windows: 1 h length, 15 min slide (4 windows/event) ----
    Q("q75_sliding_window",
      (s, d) => Tables.events(s, d)
        .select(window(col("ts"), "1 hour", "15 minutes").as("w"),
          col("user_id"), col("event_id"))
        .groupBy(unix_timestamp(col("w.start")).as("ws"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("ws"),
      Some("""WITH hit AS (SELECT
             |  ((CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) AS BIGINT)
             |    - i.range) * 900) AS ws,
             |  user_id, event_id
             |  FROM events, range(0, 4) i)
             |SELECT ws, COUNT(*) AS n_events,
             |  COUNT(DISTINCT user_id) AS n_users
             |FROM hit GROUP BY ws ORDER BY ws""".stripMargin),
      "§2.7 streaming: sliding event-time windows (length 1 h, slide 15 min)"),

    // ---- native as-of join (custom LogicalPlan + Strategy + SparkPlan):
    // each error event picks up the user's latest purchase at-or-before it.
    // Right side is pre-aggregated to one row per (user, second) so the
    // matched payload is deterministic. Oracle: DuckDB's native ASOF JOIN. ----
    Q("q77_asof_join_native",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_timestamp(col("ts")).as("ts_sec"), col("value"))
        val errors = e.filter(col("event_type") === "error")
          .select("user_id", "event_id", "ts_sec")
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id").as("p_user"), col("ts_sec").as("p_sec"))
          .agg(max(col("value")).as("p_value"))
        graft.plans.AsOfJoin.asof(errors, purchases,
          "user_id", "ts_sec", "p_user", "p_sec")
          .select("user_id", "event_id", "ts_sec", "p_sec", "p_value")
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec, value
             |  FROM events),
             |err AS (SELECT user_id, event_id, ts_sec FROM e
             |  WHERE event_type = 'error'),
             |pur AS (SELECT user_id AS p_user, ts_sec AS p_sec,
             |  MAX(value) AS p_value
             |  FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
             |SELECT err.user_id, event_id, ts_sec, p_sec, p_value
             |FROM err ASOF LEFT JOIN pur
             |  ON err.user_id = pur.p_user AND pur.p_sec <= err.ts_sec
             |ORDER BY err.user_id, event_id""".stripMargin),
      "custom-operator family: NATIVE as-of join (LogicalPlan+Strategy+SparkPlan)"),

    // ---- gaps-and-islands: consecutive-day activity streaks per user.
    // island key = day_number - row_number (constant within a run of
    // consecutive days) — the classic sessionization-without-timestamps. ----
    Q("q88_gaps_islands",
      (s, d) => {
        val days = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val w = Window.partitionBy("user_id").orderBy("day")
        val islands = days
          .withColumn("island",
            datediff(col("day"), lit("1970-01-01")) - row_number().over(w))
          .groupBy("user_id", "island")
          .agg(count(lit(1)).as("len"))
        islands.groupBy("user_id")
          .agg(count(lit(1)).as("n_islands"), max("len").as("longest_streak"))
          .orderBy("user_id")
      },
      Some("""WITH days AS (SELECT DISTINCT user_id,
             |  CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
             |marked AS (SELECT user_id, day,
             |  (day - DATE '1970-01-01')
             |    - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS island
             |  FROM days),
             |islands AS (SELECT user_id, island, COUNT(*) AS len
             |  FROM marked GROUP BY user_id, island)
             |SELECT user_id, COUNT(*) AS n_islands,
             |  CAST(MAX(len) AS BIGINT) AS longest_streak
             |FROM islands GROUP BY user_id ORDER BY user_id""".stripMargin),
      "§2.7 gaps-and-islands: consecutive-day streaks (day_number - row_number)"),

    // ---- stream-static broadcast enrichment (batch twin; the streaming
    // run of the SAME transform is pinned in StreamingSpec). The static
    // dimension broadcasts per micro-batch; the event stream is never
    // shuffled before the windowed aggregate, whose state the watermark
    // bounds — the standard "enrich at ingest" topology. ----
    Q("q107_stream_static_join",
      (s, d) => EventStreams.enrichedSegmentCounts(
          Tables.events(s, d).select("user_id", "ts", "value"),
          Tables.customer(s, d).select("c_custkey", "c_mktsegment"))
        .orderBy("hour_start", "segment"),
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
             |  c_mktsegment AS segment, COUNT(*) AS n,
             |  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             |    / 100.0 AS total_value
             |FROM events JOIN customer ON user_id = c_custkey
             |GROUP BY 1, 2 ORDER BY hour_start, segment""".stripMargin),
      "§2.7 streaming: stream-static broadcast enrichment join (batch twin)"),

    // ---- gap-fill resampling: densify sparse per-user activity onto a
    // regular hourly grid (the time-series normalization step before
    // any train/score pipeline consumes event data). Each user's grid
    // is generated from their own [min, max] span (sequence + explode,
    // narrow); observed hourly counts left-join onto it; missing hours
    // fill with 0 and a forward-filled last-active hour (window
    // last(ignoreNulls)). Scale: grid size is bounded by span x users,
    // independent of event count; the join shuffles on (user, hour);
    // the ffill window sorts each user's grid partition only. ----
    Q("q112_gap_fill_resample",
      (s, d) => {
        val e = Tables.events(s, d).filter(col("user_id") < 20)
          .select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        val grid = e.groupBy("user_id")
          .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
          .select(col("user_id"), explode(sequence(col("h0"), col("h1"),
            expr("INTERVAL 1 HOUR"))).as("hour"))
        val counts = e.groupBy(col("user_id"), col("h").as("hour"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("user_id").orderBy("hour")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(counts, Seq("user_id", "hour"), "left")
          .select(col("user_id"), col("hour"),
            coalesce(col("n"), lit(0L)).as("n_events"),
            col("n").isNull.as("filled"),
            when(col("n").isNotNull, col("hour")).as("active_hour"))
          .withColumn("last_active_hour",
            last(col("active_hour"), ignoreNulls = true).over(w))
          .drop("active_hour")
          .orderBy("user_id", "hour")
      },
      Some("""WITH e AS (SELECT user_id,
             |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h
             |  FROM events WHERE user_id < 20),
             |spans AS (SELECT user_id, min(h) AS h0, max(h) AS h1
             |  FROM e GROUP BY user_id),
             |-- oracle grid bound: DuckDB needs a constant range where
             |-- Spark's sequence(h0, h1) is data-driven; 24*400 hours
             |-- (400 days) must exceed any user's [min,max] event span
             |-- (harness events span ~30 days; q112 would fail loudly
             |-- with a row-count diff if a regenerated corpus ever
             |-- exceeded it — widen the bound with the data)
             |grid AS (SELECT user_id, h0 + INTERVAL (i.range) HOUR AS hour
             |  FROM spans, range(0, 24*400) i
             |  WHERE h0 + INTERVAL (i.range) HOUR <= h1),
             |counts AS (SELECT user_id, h AS hour, count(*) AS n
             |  FROM e GROUP BY 1, 2),
             |joined AS (SELECT g.user_id, g.hour, COALESCE(n, 0) AS n_events,
             |    n IS NULL AS filled,
             |    CASE WHEN n IS NULL THEN NULL ELSE g.hour END AS active_hour
             |  FROM grid g
             |  LEFT JOIN counts c ON g.user_id = c.user_id AND g.hour = c.hour)
             |SELECT user_id, hour, n_events, filled,
             |  last_value(active_hour IGNORE NULLS) OVER (
             |    PARTITION BY user_id ORDER BY hour
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS last_active_hour
             |FROM joined ORDER BY user_id, hour""".stripMargin),
      "§2.7 time series: hourly gap-fill resampling with forward fill"),

    // ---- funnel analysis: strict view -> click -> purchase ordering
    // with a 24 h SLA between stages. Three filtered passes over the
    // event scan, each reduced to a per-user scalar table — no
    // event-to-event self-join, which is the funnel anti-pattern at
    // 100 TB. The per-user stage tables are deliberately UNhinted:
    // user cardinality scales with the corpus (10^9 users at the
    // design point), so the planner must stay free to pick a
    // user-keyed shuffle join when size stats say broadcast won't fit;
    // AQE still broadcasts them automatically at small SF. Stage
    // counts at sf0.01: 90 view-only / 35 reached click / 25
    // converted. ----
    Q("q113_funnel_stages",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"))
        val fv = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("t1"))
        val fc = ev.filter(col("event_type") === "click")
          .join(fv, Seq("user_id"))
          .filter(col("ts") > col("t1") &&
            col("ts") <= col("t1") + expr("INTERVAL 24 HOURS"))
          .groupBy("user_id").agg(min(col("ts")).as("t2"))
        val fp = ev.filter(col("event_type") === "purchase")
          .join(fc, Seq("user_id"))
          .filter(col("ts") > col("t2") &&
            col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"))
          .groupBy("user_id").agg(min(col("ts")).as("t3"))
        ev.select("user_id").distinct()
          .join(fv, Seq("user_id"), "left")
          .join(fc, Seq("user_id"), "left")
          .join(fp, Seq("user_id"), "left")
          .select(col("user_id"), col("t1").as("first_view"),
            col("t2").as("first_click"), col("t3").as("first_purchase"),
            when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2)
              .when(col("t1").isNotNull, 1).otherwise(0).as("funnel_stage"))
          .orderBy("user_id")
      },
      Some("""WITH fv AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
             |  FROM events WHERE event_type = 'view' GROUP BY user_id),
             |fc AS (SELECT e.user_id, min(CAST(ts AS TIMESTAMP)) AS t2
             |  FROM events e JOIN fv ON e.user_id = fv.user_id
             |  WHERE event_type = 'click' AND CAST(ts AS TIMESTAMP) > t1
             |    AND CAST(ts AS TIMESTAMP) <= t1 + INTERVAL 24 HOUR
             |  GROUP BY e.user_id),
             |fp AS (SELECT e.user_id, min(CAST(ts AS TIMESTAMP)) AS t3
             |  FROM events e JOIN fc ON e.user_id = fc.user_id
             |  WHERE event_type = 'purchase' AND CAST(ts AS TIMESTAMP) > t2
             |    AND CAST(ts AS TIMESTAMP) <= t2 + INTERVAL 24 HOUR
             |  GROUP BY e.user_id),
             |u AS (SELECT DISTINCT user_id FROM events)
             |SELECT u.user_id, t1 AS first_view, t2 AS first_click,
             |  t3 AS first_purchase,
             |  CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
             |       WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS funnel_stage
             |FROM u LEFT JOIN fv USING (user_id) LEFT JOIN fc USING (user_id)
             |LEFT JOIN fp USING (user_id)
             |ORDER BY user_id""".stripMargin),
      "§2.7 event analytics: ordered funnel stages with 24h SLA (no self-join)"),

    // ---- cohort retention: day-of-first-purchase cohorts x days-since
    // retention triangle (offsets 0-7). The per-user cohort table is
    // UNhinted (user cardinality scales with the corpus — a forced
    // broadcast would OOM at 10^9 users; AQE broadcasts it when small).
    // `sizes` (one row per cohort DAY — calendar-bounded) keeps its
    // broadcast hint. The only event-scale work is one filtered scan +
    // one distinct. The retention ratio divides two exact counts, so
    // the triangle is engine-independent. ----
    Q("q114_cohort_retention",
      (s, d) => {
        val p = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), to_date(col("ts")).as("d"))
        val first = p.groupBy("user_id").agg(min(col("d")).as("cohort_day"))
        val sizes = first.groupBy("cohort_day")
          .agg(count(lit(1)).as("cohort_n"))
        p.distinct()
          .join(first, Seq("user_id"))
          .withColumn("day_offset", datediff(col("d"), col("cohort_day")))
          .filter(col("day_offset") <= 7)
          .groupBy("cohort_day", "day_offset")
          .agg(count(lit(1)).as("n_active"))
          .join(broadcast(sizes), Seq("cohort_day"))
          .select(col("cohort_day"), col("day_offset"), col("n_active"),
            col("cohort_n"),
            round(col("n_active").cast("double") / col("cohort_n"), 6)
              .as("retention"))
          .orderBy("cohort_day", "day_offset")
      },
      Some("""WITH first_seen AS (SELECT user_id,
             |    CAST(min(CAST(ts AS TIMESTAMP)) AS DATE) AS cohort_day
             |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
             |activity AS (SELECT DISTINCT user_id,
             |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
             |  FROM events WHERE event_type = 'purchase'),
             |sizes AS (SELECT cohort_day, count(*) AS cohort_n
             |  FROM first_seen GROUP BY 1)
             |SELECT f.cohort_day,
             |  CAST(date_diff('day', f.cohort_day, a.d) AS INT) AS day_offset,
             |  count(*) AS n_active, any_value(cohort_n) AS cohort_n,
             |  round(CAST(count(*) AS DOUBLE) / any_value(cohort_n), 6)
             |    AS retention
             |FROM first_seen f JOIN activity a USING (user_id)
             |JOIN sizes USING (cohort_day)
             |WHERE date_diff('day', f.cohort_day, a.d) <= 7
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      "§2.7 event analytics: day-cohort retention triangle (broadcast cohorts)"),

    // ---- NATIVE session windows: `session_window(ts, gap)` makes
    // sessionization a plain groupBy aggregate — Spark merges adjacent
    // windows per key inside the aggregation, so no per-key iterator
    // state (q51's mapGroupsWithState) and no window-function sort pass
    // (q88's islands); on a stream the same expression is watermark-
    // evicted. The oracle rebuilds identical sessions with the classic
    // lag/cumsum islands construction; window end = last event + gap
    // in both. ----
    Q("q121_session_window_native",
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"))
        .orderBy("user_id", "session_start"),
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t
             |  FROM events),
             |marked AS (SELECT user_id, t,
             |    CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t)
             |        > INTERVAL 30 MINUTE
             |      OR LAG(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
             |      THEN 1 ELSE 0 END AS new_s
             |  FROM e),
             |sess AS (SELECT user_id, t,
             |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM marked)
             |SELECT user_id, MIN(t) AS session_start,
             |  MAX(t) + INTERVAL 30 MINUTE AS session_end,
             |  COUNT(*) AS n_events
             |FROM sess GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin),
      "§2.7 streaming: native session_window aggregation (merge-on-aggregate)")
  )
}
