package graft.operators

import graft.{GQuery, Tables}
import graft.functions.Exact._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowed aggregations over the `events` table (SURVEY.md §2.9).
  *
  * Spark's `window()`/`session_window()` work identically on static frames
  * and streams, so these queries ARE the streaming semantics, verified
  * against a batch SQL oracle; `graft.streaming.EventsStream` runs the same
  * aggregations through `readStream` + watermark (tested in ScalaTest, not
  * oracle-able by construction). At scale the tumbling/sliding aggregations
  * are partial-aggregated before the shuffle on (window, key).
  */
object EventQueries {

  /** Trailing-event bound for the q_events_ewma fold: with α = 1/2, 64
    * halvings scale any int64 prefix contribution below 1, so per-user
    * state is capped at 64 rows (see the query's scale note).
    */
  val EWMA_TAIL = 64

  /** The CUSUM detector over a mergeable hourly census (event_type, hr,
    * n) — factored so the registered `q_events_cusum` and the streaming
    * monitor ([[graft.streaming.EventsStream.runCusumIngest]]'s consumer)
    * run the SAME window formulation: per-batch censuses are cell-wise
    * SUMS, so appended batch censuses merge into exactly the full-corpus
    * census and the detector re-derives on the standing table — the CMS
    * ingest lifecycle, for changepoint monitoring. Unsorted; callers
    * order. See the registry entry for the identity and grid arithmetic.
    */
  private[graft] def cusumOverHourly(hourly: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val stats = hourly.groupBy("event_type")
      .agg(sum(col("n")).as("s"), count(lit(1)).as("nh"))
    val wsum = Window.partitionBy("event_type").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly.join(broadcast(stats), "event_type")
      .withColumn("d", lit(4) * col("nh") * col("n") - lit(5) * col("s"))
      .withColumn("prefix", sum(col("d")).over(wsum))
      .withColumn("runmin", min(col("prefix")).over(wsum))
      .select(col("event_type"), col("hr"), col("n"),
        (col("prefix") - least(lit(0L), col("runmin"))).as("cusum"),
        (col("prefix") - least(lit(0L), col("runmin")) > lit(4) * col("s"))
          .as("in_alarm"))
  }

  val defs: Seq[GQuery] = Seq(

    GQuery(
      "q_events_tumbling",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
          .select(col("window.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))
          .orderBy("hour_start", "event_type"),
      Some(s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start, event_type,
              |$countStarSql AS n, ${sumMoneySql("value")} AS sum_value
              |FROM ${Tables.eventsOracleFrom} e
              |GROUP BY hour_start, event_type ORDER BY hour_start, event_type""".stripMargin)
    ),

    GQuery(
      // 1h windows sliding every 30min: each event lands in exactly two
      // windows — the oracle reproduces that with two shifted buckets.
      "q_events_sliding",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
          .select(col("window.start").as("win_start"), col("n"), col("sum_value"))
          .orderBy("win_start"),
      Some(s"""WITH buckets AS (
              |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS win_start, value
              |  FROM ${Tables.eventsOracleFrom} e
              |  UNION ALL
              |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS win_start, value
              |  FROM ${Tables.eventsOracleFrom} e)
              |SELECT win_start, $countStarSql AS n, ${sumMoneySql("value")} AS sum_value
              |FROM buckets GROUP BY win_start ORDER BY win_start""".stripMargin)
    ),

    GQuery(
      // Session windows, 30-minute inactivity gap, keyed by user. Spark's
      // session_window end = last event + gap; the oracle sessionizes via
      // the classic lag/cumulative-sum trick (new session when gap >= 30m,
      // matching Spark's half-open [start, last+gap) merge rule).
      "q_events_session",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"), sumMoney(col("value")).as("sum_value"))
          .select(
            col("user_id"),
            col("session_window.start").as("session_start"),
            col("session_window.end").as("session_end"),
            col("n_events"), col("sum_value"))
          .orderBy("user_id", "session_start"),
      Some(s"""WITH e AS (
              |  SELECT user_id, ts, event_id, value,
              |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              |           >= INTERVAL '30 minutes'
              |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              |         THEN 1 ELSE 0 END AS is_new
              |  FROM ${Tables.eventsOracleFrom} e0),
              |s AS (
              |  SELECT user_id, ts, event_id, value,
              |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              |  FROM e)
              |SELECT user_id, MIN(ts) AS session_start,
              |MAX(ts) + INTERVAL '30 minutes' AS session_end,
              |$countStarSql AS n_events, ${sumMoneySql("value")} AS sum_value
              |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin)
    ),

    GQuery(
      // DYNAMIC-gap sessionization: the gap depends on the event itself
      // (a purchase closes its session after 10 min, anything else keeps
      // it open 30) — the per-row-gap capability fixed-gap session_window
      // can't express and real engagement analytics need. The oracle is
      // the running-max-end islands formulation: a session merges an event
      // iff its ts precedes the MAX end (ts+gap) of all earlier events —
      // with per-event gaps, lag(ts)+gap is NOT enough, the running max
      // is what matches session_window's merge rule. Same scale shape as
      // the fixed-gap query: one shuffle on user_id, merging session state.
      "q_events_session_dynamic",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("user_id"), session_window(col("ts"),
            when(col("event_type") === "purchase", "10 minutes")
              .otherwise("30 minutes")))
          .agg(count(lit(1)).as("n_events"))
          .select(
            col("user_id"),
            col("session_window.start").as("session_start"),
            col("session_window.end").as("session_end"),
            col("n_events"))
          .orderBy("user_id", "session_start"),
      Some(s"""WITH e0 AS (
              |  SELECT user_id, ts, event_id,
              |    ts + CASE WHEN event_type = 'purchase' THEN INTERVAL '10 minutes'
              |              ELSE INTERVAL '30 minutes' END AS end_ts
              |  FROM ${Tables.eventsOracleFrom} e),
              |e1 AS (
              |  SELECT user_id, ts, event_id, end_ts,
              |    MAX(end_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
              |  FROM e0),
              |f AS (SELECT *, CASE WHEN prev_end IS NULL OR ts >= prev_end
              |  THEN 1 ELSE 0 END AS is_new FROM e1),
              |s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id
              |  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM f)
              |SELECT user_id, MIN(ts) AS session_start, MAX(end_ts) AS session_end,
              |$countStarSql AS n_events
              |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin)
    ),

    GQuery(
      // Funnel: users whose first view precedes their first click precedes
      // their first purchase. One hash-agg pass (conditional MIN per stage),
      // no self-joins — at scale this is a single shuffle on user_id with
      // map-side partial MINs.
      "q_events_funnel",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("user_id")
          .agg(
            min(when(col("event_type") === "view", col("ts"))).as("t_view"),
            min(when(col("event_type") === "click", col("ts"))).as("t_click"),
            min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
          .filter(col("t_view") < col("t_click") && col("t_click") < col("t_purchase"))
          .orderBy("user_id"),
      Some(s"""WITH f AS (SELECT user_id,
              |  MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
              |  MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
              |  MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
              |  FROM ${Tables.eventsOracleFrom} e GROUP BY user_id)
              |SELECT user_id, t_view, t_click, t_purchase FROM f
              |WHERE t_view < t_click AND t_click < t_purchase
              |ORDER BY user_id""".stripMargin)
    ),

    GQuery(
      // Day-over-day retention: users active on day d who return on d+1.
      // distinct (user, day) first — the self-join then runs on the reduced
      // activity table, shuffled once by user_id.
      "q_events_retention",
      (s, dir) => {
        val days = Tables.events(s, dir)
          .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
          .distinct()
        days.as("a")
          .join(days.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("b.day") === col("a.day") + expr("INTERVAL 1 DAY"))
          .groupBy(col("a.day").as("day"))
          .agg(countDistinct(col("a.user_id")).as("retained"))
          .orderBy("day")
      },
      Some(s"""WITH d AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day
              |  FROM ${Tables.eventsOracleFrom} e)
              |SELECT a.day AS day, CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS retained
              |FROM d a JOIN d b ON a.user_id = b.user_id AND b.day = a.day + INTERVAL 1 DAY
              |GROUP BY a.day ORDER BY day""".stripMargin)
    ),

    GQuery(
      // Gaps-and-islands: per-user consecutive-day activity streaks. The
      // classic rewrite — day_number minus the per-user row_number is
      // constant exactly within a consecutive run, so streaks fall out of
      // one groupBy on that difference with NO self-join (q_events_retention
      // pays a day+1 self-join for its one-day question; this answers the
      // full run-length distribution in two window-free-joins... one window
      // + two aggregates). Longest streak per user, ties to the earliest
      // start, picked by struct-max — no second window pass. Scale: the
      // distinct (user, day) frame is the only shuffle input; windows
      // partition by user (no global window), aggregates are per-user.
      "q_events_streaks",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val days = Tables.events(s, dir)
          .select(col("user_id"),
            datediff(date_trunc("day", col("ts")), lit("1995-01-01").cast("date"))
              .cast("long").as("dn"))
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("dn")
        val runs = days
          .withColumn("grp", col("dn") - row_number().over(w).cast("long"))
          .groupBy("user_id", "grp")
          .agg(count(lit(1)).as("len"), min("dn").as("start_dn"))
        runs.groupBy("user_id")
          .agg(sum("len").as("n_active_days"),
            count(lit(1)).as("n_streaks"),
            max(struct(col("len"), (-col("start_dn")).as("neg_start"))).as("best"))
          .select(col("user_id"), col("n_active_days"), col("n_streaks"),
            col("best.len").as("longest_streak"),
            (-col("best.neg_start")).as("longest_start_dn"))
          .orderBy("user_id")
      },
      Some(s"""WITH d AS (SELECT DISTINCT user_id,
              |    CAST(date_diff('day', DATE '1995-01-01',
              |      CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS dn
              |  FROM ${Tables.eventsOracleFrom} e),
              |runs AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len,
              |    MIN(dn) AS start_dn
              |  FROM (SELECT user_id, dn,
              |      dn - row_number() OVER (PARTITION BY user_id ORDER BY dn) AS grp
              |    FROM d)
              |  GROUP BY user_id, grp),
              |tot AS (SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
              |    CAST(COUNT(*) AS BIGINT) AS n_streaks
              |  FROM runs GROUP BY user_id),
              |best AS (SELECT user_id, len AS longest_streak,
              |    start_dn AS longest_start_dn
              |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
              |      ORDER BY len DESC, start_dn ASC) AS rn FROM runs)
              |  WHERE rn = 1)
              |SELECT user_id, n_active_days, n_streaks, longest_streak, longest_start_dn
              |FROM tot JOIN best USING (user_id) ORDER BY user_id""".stripMargin)
    ),

    // ---- time-series gap fill -------------------------------------------------
    // Resampling with explicit zeros: hourly event counts joined onto a
    // generated complete hour spine, so silent hours surface as n = 0
    // instead of missing rows (monitoring and training-curriculum jobs both
    // need the dense form). The spine generates from the aggregate's own
    // min/max — a 1-row bound frame exploded driver-free and broadcast into
    // the left join; the only corpus shuffle is the hourly aggregation.
    GQuery(
      "q_events_gapfill",
      (s, dir) => {
        val hourly = Materialize(Tables.events(s, dir)
          .groupBy(date_trunc("hour", col("ts")).as("hour_start"))
          .agg(count(lit(1)).as("n")))
        val spine = hourly
          .agg(min("hour_start").as("lo"), max("hour_start").as("hi"))
          .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("hour_start"))
        spine.join(hourly, Seq("hour_start"), "left")
          .select(col("hour_start"), coalesce(col("n"), lit(0L)).as("n_events"))
          .orderBy("hour_start")
      },
      Some(s"""WITH hourly AS (SELECT date_trunc('hour', ts) AS hour_start,
              |  CAST(COUNT(*) AS BIGINT) AS n
              |  FROM ${Tables.eventsOracleFrom} e GROUP BY 1),
              |b AS (SELECT MIN(hour_start) AS lo, MAX(hour_start) AS hi FROM hourly),
              |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start FROM b)
              |SELECT spine.hour_start AS hour_start, COALESCE(n, 0) AS n_events
              |FROM spine LEFT JOIN hourly ON spine.hour_start = hourly.hour_start
              |ORDER BY spine.hour_start""".stripMargin)
    ),

    // ---- seasonal-naive forecast backtest (MASE) ------------------------------
    // The monitoring question after anomaly/CUSUM flagging: how PREDICTABLE
    // is each event stream's volume — i.e., would a seasonal-naive forecast
    // (this hour = same hour yesterday) have beaten the naive-1 baseline
    // (this hour = last hour)? MASE (Hyndman & Koehler 2006) is that ratio
    // of mean absolute errors, the standard scale-free backtest metric; a
    // pipeline uses it to decide whether daily seasonality is real enough
    // to gate volume alerts on (mase < 1e6 micro ⇔ seasonality helps).
    // Everything is integer-exact: the hour grid is gap-FILLED (a missing
    // hour is a true 0 — lagging over present rows only would silently
    // compare across gaps), errors are |count − lagged count| summed as
    // longs, and the ratio lands on the micro grid with the mean
    // normalization folded in as integer cross-multiplication. Degenerate
    // windows (under 25 hours, or a constant series with zero naive error)
    // yield NULL rather than a fake number — mirrored in the oracle.
    // Scale: one hourly pre-aggregate shuffle; the spine/lag/backtest all
    // run over the tiny (type × hours) grid, which grows with the time
    // span, never the corpus.
    GQuery(
      "q_events_forecast_mase",
      (s, dir) => {
        val hourly = Materialize(Tables.events(s, dir)
          .groupBy(col("event_type"),
            (unix_micros(col("ts")) / lit(3600000000L)).cast("long").as("hr"))
          .agg(count(lit(1)).as("n")))
        val bounds = hourly.agg(min("hr").as("lo"), max("hr").as("hi"))
        val spine = hourly.select("event_type").distinct()
          .crossJoin(broadcast(bounds)) // 1-row bound
          .select(col("event_type"), explode(expr("sequence(lo, hi)")).as("hr"))
        val grid = spine.join(hourly, Seq("event_type", "hr"), "left")
          .select(col("event_type"), col("hr"), coalesce(col("n"), lit(0L)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("hr")
        grid
          .withColumn("f24", lag(col("n"), 24).over(w))
          .withColumn("f1", lag(col("n"), 1).over(w))
          .groupBy("event_type").agg(
            count(lit(1)).as("n_hours"),
            sum(when(col("f24").isNotNull, abs(col("n") - col("f24")))).as("sae_seasonal"),
            sum(when(col("f1").isNotNull, abs(col("n") - col("f1")))).as("sae_naive"))
          .select(col("event_type"), col("n_hours"),
            col("sae_seasonal"), col("sae_naive"),
            expr("""CASE WHEN n_hours > 24 AND sae_naive > 0
                   |THEN sae_seasonal * (n_hours - 1) * 1000000
                   |  div (sae_naive * (n_hours - 24)) END""".stripMargin)
              .as("mase_micro"))
          .orderBy("event_type")
      },
      Some(s"""WITH fhourly AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
              |    CAST(COUNT(*) AS BIGINT) AS n
              |  FROM ${Tables.eventsOracleFrom} e GROUP BY event_type, hr),
              |fb AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM fhourly),
              |fspine AS (SELECT event_type, unnest(range(lo, hi + 1)) AS hr
              |  FROM (SELECT DISTINCT event_type FROM fhourly) CROSS JOIN fb),
              |fgrid AS (SELECT fspine.event_type, fspine.hr, COALESCE(n, 0) AS n
              |  FROM fspine LEFT JOIN fhourly
              |    ON fspine.event_type = fhourly.event_type AND fspine.hr = fhourly.hr),
              |flag AS (SELECT event_type, hr, n,
              |    lag(n, 24) OVER tw AS f24, lag(n, 1) OVER tw AS f1
              |  FROM fgrid WINDOW tw AS (PARTITION BY event_type ORDER BY hr)),
              |fagg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
              |    CAST(SUM(CASE WHEN f24 IS NOT NULL THEN abs(n - f24) END) AS BIGINT) AS sae_seasonal,
              |    CAST(SUM(CASE WHEN f1 IS NOT NULL THEN abs(n - f1) END) AS BIGINT) AS sae_naive
              |  FROM flag GROUP BY event_type)
              |SELECT event_type, n_hours, sae_seasonal, sae_naive,
              |  CASE WHEN n_hours > 24 AND sae_naive > 0
              |    THEN sae_seasonal * (n_hours - 1) * 1000000
              |      // (sae_naive * (n_hours - 24)) END AS mase_micro
              |FROM fagg ORDER BY event_type""".stripMargin)
    ),

    // ---- view→purchase attribution (interval join) ---------------------------
    // The oracle-paired BATCH TWIN of EventsStream.viewPurchaseAttribution:
    // StreamingSpec asserts stream == batch on this exact join, and this
    // entry asserts batch == DuckDB — closing the verification loop for the
    // stream-stream path the same way tumbling/session windows are closed.
    // Plan: hash equi-join on user_id with the time range as a join filter;
    // no inequality-only join, no cartesian.
    GQuery(
      "q_events_attribution",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
            col("ts").as("purchase_ts"))
        views.join(purchases,
          col("user_id") === col("p_user_id") &&
            col("purchase_ts") >= col("view_ts") &&
            col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
          .select(col("user_id"), col("view_id"), col("purchase_id"),
            unix_micros(col("view_ts")).as("view_ts_us"),
            unix_micros(col("purchase_ts")).as("purchase_ts_us"))
          .orderBy("user_id", "view_id", "purchase_id")
      },
      Some(s"""WITH ev AS (SELECT * FROM ${Tables.eventsOracleFrom} e),
              |v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
              |  FROM ev WHERE event_type = 'view'),
              |p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
              |  FROM ev WHERE event_type = 'purchase')
              |SELECT v.user_id AS user_id, view_id, purchase_id,
              |  epoch_us(view_ts) AS view_ts_us, epoch_us(purchase_ts) AS purchase_ts_us
              |FROM v JOIN p ON v.user_id = p.user_id
              |  AND purchase_ts >= view_ts AND purchase_ts <= view_ts + INTERVAL 1 HOUR
              |ORDER BY v.user_id, view_id, purchase_id""".stripMargin)
    ),

    // ---- hourly anomaly detection: 2-sigma vs the trailing 24 hours ---------
    // Ops-monitoring shape: flag hours whose event count exceeds the
    // trailing-24h mean by 2 standard deviations. The trailing window is a
    // RANGE frame over the integer hour index, so silent hours correctly
    // shrink the window rather than shifting it (rows-frames would slide
    // over gaps). The 2-sigma test runs in EXACT integer arithmetic —
    // z > 2  ⇔  dev := n·W − S > 0  ∧  dev² > 4·(W·Q − S²)  with W/S/Q the
    // window's count/sum/sum-of-squares — so both engines decide every
    // boundary case identically, no float thresholds anywhere. One shuffle
    // (hourly pre-aggregate), then a window over the tiny hour spine.
    GQuery(
      "q_events_anomaly",
      (s, dir) => {
        val hourly = Tables.events(s, dir)
          .groupBy(col("event_type"),
            (unix_micros(col("ts")) / lit(3600000000L)).cast("long").as("hr"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("hr").rangeBetween(-24, -1)
        hourly
          .withColumn("win_hours", count(col("n")).over(w))
          .withColumn("win_events", sum(col("n")).over(w))
          .withColumn("win_sq", sum(col("n") * col("n")).over(w))
          .filter(col("win_hours") >= 5)
          .withColumn("dev", col("n") * col("win_hours") - col("win_events"))
          .select(col("event_type"), col("hr"), col("n"),
            col("win_hours"), col("win_events"),
            (col("dev") > 0 &&
              col("dev") * col("dev") >
                lit(4) * (col("win_hours") * col("win_sq") -
                  col("win_events") * col("win_events"))).as("is_anomaly"))
          .orderBy("event_type", "hr")
      },
      Some(s"""WITH hourly AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
              |  CAST(COUNT(*) AS BIGINT) AS n
              |  FROM ${Tables.eventsOracleFrom} e GROUP BY event_type, hr),
              |win AS (SELECT event_type, hr, n,
              |  CAST(COUNT(n) OVER tw AS BIGINT) AS win_hours,
              |  CAST(SUM(n) OVER tw AS BIGINT) AS win_events,
              |  CAST(SUM(n*n) OVER tw AS BIGINT) AS win_sq
              |  FROM hourly
              |  WINDOW tw AS (PARTITION BY event_type ORDER BY hr
              |    RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING))
              |SELECT event_type, hr, n, win_hours, win_events,
              |  (n*win_hours - win_events > 0 AND
              |   (n*win_hours - win_events)*(n*win_hours - win_events) >
              |     4*(win_hours*win_sq - win_events*win_events)) AS is_anomaly
              |FROM win WHERE win_hours >= 5
              |ORDER BY event_type, hr""".stripMargin)
    ),

    // ---- CUSUM drift detection over the hourly rate --------------------------
    // The sequential changepoint statistic (Page 1954) the 2-sigma hourly
    // test can't replace: a one-sided upper CUSUM accumulates SUSTAINED
    // small excesses that never individually cross a sigma bound. The
    // recursion S_t = max(0, S_{t-1} + x_t − μ − k) looks inherently
    // sequential, but the closed form S_t = prefix_t − min(0, min_{j≤t}
    // prefix_j) (prefix = running sum of the drift-adjusted deviations)
    // turns it into TWO stacked window passes — a running sum, then a
    // running min over it — so the whole detector is one hourly
    // pre-aggregate shuffle plus windows over the hour spine (input grows
    // with the time span, not the event volume; the identity itself is
    // pinned against the direct recursion in CusumSpec). Exactness: per
    // event_type, multiply the deviation through by 4·n_hours — d_t =
    // 4·nh·x_t − 5·s is x_t − 1.25·μ on an integer grid (allowance
    // k = μ/4), and the alarm threshold H = 4·s is "one full mean-hour of
    // cumulative excess" on the same grid. No float enters at any point.
    GQuery(
      "q_events_cusum",
      (s, dir) =>
        cusumOverHourly(
          Tables.events(s, dir)
            .groupBy(col("event_type"),
              (unix_micros(col("ts")) / lit(3600000000L)).cast("long").as("hr"))
            .agg(count(lit(1)).as("n")))
          .orderBy("event_type", "hr"),
      Some(s"""WITH chourly AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
              |    CAST(COUNT(*) AS BIGINT) AS n
              |  FROM ${Tables.eventsOracleFrom} e GROUP BY event_type, hr),
              |cstats AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS s,
              |    CAST(COUNT(*) AS BIGINT) AS nh
              |  FROM chourly GROUP BY event_type),
              |cpre AS (SELECT h.event_type, hr, n, s,
              |    CAST(SUM(4 * nh * n - 5 * s) OVER (PARTITION BY h.event_type
              |      ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      AS BIGINT) AS prefix
              |  FROM chourly h JOIN cstats st ON h.event_type = st.event_type),
              |cmin AS (SELECT event_type, hr, n, s, prefix,
              |    CAST(MIN(prefix) OVER (PARTITION BY event_type ORDER BY hr
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS runmin
              |  FROM cpre)
              |SELECT event_type, hr, n,
              |  prefix - least(0, runmin) AS cusum,
              |  prefix - least(0, runmin) > 4 * s AS in_alarm
              |FROM cmin ORDER BY event_type, hr""".stripMargin)
    ),

    // ---- integer EWMA: time-decayed per-user signal --------------------------
    // The exponentially-weighted activity signal with α = 1/2 evaluated as
    // an ORDERED INTEGER FOLD: ewma' = (ewma + v_cents) div 2 over each
    // user's ts-ordered values — halving is exact in integers, so both
    // engines floor identically at every step where a float EWMA would
    // accumulate cross-engine ulps. The fold is a codegen'd higher-order
    // aggregate — one shuffle by user (the window's hash partitioning on
    // user_id is reused by the aggregate, no second exchange).
    //
    // BOUNDED STATE: only the trailing EWMA_TAIL=64 events per user enter
    // the collected array (row_number desc, collect_list drops the nulls
    // the `when` produces for older rows), so per-user state is <= 64 rows
    // even for a 10^7-event hot key — the skew bomb an unbounded
    // collect_list would be at 100 TB. Exactness vs the unbounded fold:
    // nested floor division gives the closed form
    //   fold(a0, v_1..v_k) = floor((a0 + sum_i 2^(i-1) v_i) / 2^k),
    // so truncating the prefix (i.e. folding from 0 instead of the true
    // prefix accumulator a0) changes the result ONLY when the trailing
    // weighted sum lands within a0 of a multiple of 2^64. a0 is bounded by
    // the max single-event cents (the fold is a contraction), so for
    // cents < 2^17 the per-user divergence probability on non-adversarial
    // data is ~2^-47 — zero observed on every corpus (equality with the
    // unbounded form is pinned on a synthetic hot-key corpus in
    // EdgeCorpusSpec). The oracle below applies the SAME trailing-64
    // bound (row_number desc <= EWMA_TAIL), so the pair is structurally
    // exact at every SF rather than exact-with-probability-1-minus-2^-47.
    GQuery(
      "q_events_ewma",
      (s, dir) => ewmaOver(Tables.events(s, dir), Some(EWMA_TAIL)),
      Some(s"""WITH ev AS (SELECT user_id, ts, event_id,
              |    CAST(round(value * 100) AS BIGINT) AS cents,
              |    row_number() OVER (PARTITION BY user_id
              |      ORDER BY ts DESC, event_id DESC) AS rk
              |  FROM ${Tables.eventsOracleFrom} e),
              |cnt AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
              |  FROM ev GROUP BY user_id),
              |seqs AS (SELECT user_id, list(cents ORDER BY ts, event_id) AS seq
              |  FROM ev WHERE rk <= $EWMA_TAIL GROUP BY user_id)
              |SELECT c.user_id, c.n_events,
              |  list_reduce(list_prepend(CAST(0 AS BIGINT), seq),
              |    (acc, v) -> (acc + v) // 2) AS ewma_cents
              |FROM cnt c JOIN seqs s ON c.user_id = s.user_id
              |ORDER BY c.user_id""".stripMargin)
    ),

    // ---- behavioral sequence mining: top event-type transitions -------------
    // The frequent-2-sequence census (what users do NEXT): lead() over each
    // user's ts-ordered stream pairs every event with its successor, and
    // the global transition counts rank the behavioral edges — the input
    // to Markov funnel models and session-intent features. One window
    // shuffle by user + one map-side-combined count; at 100 TB both shard
    // cleanly (the heavy stream never leaves its user partition unpaired).
    GQuery(
      "q_events_sequences",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, dir)
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy("event_type", "next_type")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("event_type"), col("next_type"))
          .limit(10)
      },
      Some(s"""WITH seq AS (SELECT event_type,
              |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
              |  FROM ${Tables.eventsOracleFrom} e)
              |SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
              |FROM seq WHERE next_type IS NOT NULL
              |GROUP BY event_type, next_type
              |ORDER BY n DESC, event_type, next_type LIMIT 10""".stripMargin)
    ),

    // ---- Markov transition matrix (normalized sequences) --------------------
    // q_events_sequences' counts normalized into per-state transition
    // probabilities on the micro grid (n·1e6 div row total — exact
    // integer ratio of exact counts): the full |types|² matrix a session
    // simulator or next-event model consumes. Row totals broadcast.
    GQuery(
      "q_events_markov",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val t = Tables.events(s, dir)
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy("event_type", "next_type")
          .agg(count(lit(1)).as("n"))
        val tot = t.groupBy("event_type").agg(sum(col("n")).as("total"))
        t.join(broadcast(tot), "event_type")
          .select(col("event_type"), col("next_type"), col("n"),
            expr("(n * 1000000) div total").as("p_micro"))
          .orderBy("event_type", "next_type")
      },
      Some(s"""WITH seq AS (SELECT event_type,
              |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
              |  FROM ${Tables.eventsOracleFrom} e),
              |t AS (SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
              |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
              |tot AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS total FROM t GROUP BY 1)
              |SELECT t.event_type, next_type, n, (n * 1000000) // total AS p_micro
              |FROM t JOIN tot ON t.event_type = tot.event_type
              |ORDER BY t.event_type, next_type""".stripMargin)
    )
  )

  /** Core of `q_events_ewma`: the α = 1/2 integer EWMA fold over each user's
    * ts-ordered cents values. `tail = Some(k)` folds only the trailing k
    * events (bounded per-user state — the registered form); `tail = None`
    * folds the full history (the reference form the bounded one is pinned
    * equal to in EdgeCorpusSpec — see the registered query's scale note for
    * the exactness argument).
    */
  def ewmaOver(events: org.apache.spark.sql.DataFrame,
               tail: Option[Int]): org.apache.spark.sql.DataFrame = {
    val base = events.select(col("user_id"), col("ts"), col("event_id"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val seqs = tail match {
      case Some(k) =>
        // rank newest-first, then keep only rk <= k: collect_list drops the
        // nulls `when` yields for older rows, so the array is <= k entries.
        // The aggregate reuses the window's hash partitioning on user_id —
        // one exchange total.
        val wDesc = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        base.withColumn("rk", row_number().over(wDesc))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sort_array(collect_list(when(col("rk") <= k,
              struct(col("ts"), col("event_id"), col("cents"))))).as("seq"))
      case None =>
        base.groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sort_array(collect_list(
              struct(col("ts"), col("event_id"), col("cents")))).as("seq"))
    }
    seqs.select(col("user_id"), col("n_events"),
      // (s - pmod(s, 2)) div 2 is FLOOR(s/2) for any sign: Spark div
      // truncates toward zero while DuckDB // floors, so the raw
      // (acc+v) div 2 would diverge the first time a fold sum went
      // negative (current data is non-negative; the form is safe
      // either way and hash-identical on non-negative input)
      expr("aggregate(transform(seq, x -> x.cents), CAST(0 AS BIGINT), " +
        "(acc, v) -> (acc + v - pmod(acc + v, 2)) div 2)").as("ewma_cents"))
      .orderBy("user_id")
  }
}
