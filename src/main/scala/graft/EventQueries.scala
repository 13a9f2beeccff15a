package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream queries over `events` (event_id, ts, user_id, event_type,
  * value, props JSON): JSON extraction, event-time bucketing, and gap-based
  * sessionization. These are the batch twins of the streaming operators in
  * graft.streaming — identical column logic, so stream/batch parity is
  * testable.
  *
  * The oracle sees ts at nanosecond precision while Spark sees micros
  * (Tables.events truncates); every output therefore buckets time at hour
  * or second granularity where both engines agree exactly.
  */
object EventQueries {

  /** JSON prop extraction by pattern — portable across engines; the repo's
    * canonical JSON path (from_json) is exercised in eventsPropsTyped below.
    */
  private def propK = regexp_extract(col("props"), "\"k\"\\s*:\\s*(\\d+)", 1).cast("long")

  /** from_json-based typed extraction (Spark-native path, no SQL twin). */
  def propsTyped(events: DataFrame): DataFrame =
    events.withColumn("props_struct",
      from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))))
      .withColumn("k", col("props_struct.k"))
      .drop("props_struct")

  /** The gap-fill scaffold shared by events_gapfill / events_rate_anomaly /
    * events_moving_avg: hourly counts densified over the [min, max] hour
    * span × event types, missing cells as 0. Scaffold is post-aggregation-
    * sized; the event scan stays the one linear pass.
    */
  private def denseHourlyCounts(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val hourly = ev
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val hours = ev
      .agg(date_trunc("hour", min("ts")).as("lo"),
        date_trunc("hour", max("ts")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("hour"))
    hours.crossJoin(ev.select("event_type").distinct())
      .join(hourly, Seq("hour", "event_type"), "left")
      .select(col("hour"), col("event_type"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // JSON extraction + aggregate per event type.
    "events_json_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), propK.as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum("k").as("sum_k"),
          sum(col("k").cast("decimal(18,2)")).cast("double")
            ./(count(lit(1))).as("avg_k"))
        .orderBy("event_type")),

    // Event-time bucketing: hourly counts + value sums (decimal-routed).
    "events_hourly" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("hour", "event_type")),

    // Per-type z-score outliers (|z| > 3) from EXACT integer sufficient
    // statistics: values are quantized to their native cent grid, Σv and Σv²
    // are exact decimal-routed integer sums (order-free under any
    // partitioning), and mean/σ/z are correctly-rounded double functions of
    // identical integers on both engines — the same determinism pattern as
    // stats_corr. One partial-agg shuffle for the 5-row stats table, which
    // broadcasts back onto the linear scan; no window, no collect.
    "events_outliers" -> ((s, dir) =>
      operators.Stats.zOutliers(Tables.events(s, dir), "event_type", "value")
        .select("event_id", "event_type", "value", "z_4dp")
        .orderBy("event_id")),

    // Time-series gap fill / resampling: the hourly count matrix densified
    // over the full [min, max] hour span × event types, missing cells as 0
    // — what any downstream rate/anomaly model needs (a missing hour IS a
    // signal, but only if it's a row). The scaffold (span-hours × types) is
    // post-aggregation-sized — tiny next to the event scan, which stays the
    // one linear pass; the left join runs agg-output × scaffold.
    "events_gapfill" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      denseHourlyCounts(ev).orderBy("hour", "event_type")
    }),

    // Rate anomaly detection: z-score outliers over the GAP-FILLED hourly
    // matrix — composing the two primitives is the point: without the
    // densify step a silent hour isn't a row and can never flag, yet a
    // traffic drop to zero is exactly the anomaly a monitor must catch.
    // Same exact-integer stats machinery (counts × 100 is exact), |z| > 2
    // (hourly rates are noisier than per-event values).
    "events_rate_anomaly" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val dense = denseHourlyCounts(ev)
      operators.Stats.zOutliers(dense, "event_type", "n_events",
          threshold = 2.0)
        .select("hour", "event_type", "n_events", "z_4dp")
        .orderBy("hour", "event_type")
    }),

    // Trailing 3-hour moving average per type over the GAP-FILLED matrix —
    // the smoothing every rate monitor applies; composing with gap-fill
    // again matters (silent hours must pull the average DOWN, which they
    // only do as rows). Exact arithmetic: frame sum of long counts, frame
    // row count, one correctly-rounded division. Window is keyed by type.
    "events_moving_avg" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val dense = denseHourlyCounts(ev)
      val w = Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(-2, Window.currentRow)
      dense
        .withColumn("ma_4dp",
          floor(sum("n_events").over(w).cast("double")
            / count(lit(1)).over(w) * 10000.0 + 0.5) / 10000.0)
        .orderBy("hour", "event_type")
    }),

    // Gap-based sessionization (30-min inactivity closes a session).
    "events_sessionize" -> ((s, dir) => {
      val secs = col("ts").cast("long")
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gap = secs - lag(secs, 1).over(w)
      Tables.events(s, dir)
        .withColumn("new_session",
          when(gap.isNull || gap > 1800, 1L).otherwise(0L))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum("new_session").as("n_sessions"))
        .orderBy("user_id")
    }),

    // from_json typed extraction — Spark-native JSON path; value must agree
    // with the regexp-extracted k, so the oracle uses the regexp form.
    "events_props_typed" -> ((s, dir) =>
      propsTyped(Tables.events(s, dir))
        .select(col("event_id"), col("k"))
        .orderBy("event_id")),

    // Native session windows (session_window merges events whose [ts,
    // ts+gap) windows overlap — an event exactly gap later starts a NEW
    // session, hence the >= split in the oracle's gaps-and-islands form).
    "events_session_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(col("user_id"),
          col("sw.start").cast("long").as("session_start"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start")),

    // Bucketed range join: clicks landing inside each purchase's 1-hour
    // follow-up window, counted per purchase. The operator explodes windows
    // into hour buckets and equi-joins — linear shuffle — and the oracle is
    // the naive range join, proving bucket+filter ≡ BETWEEN semantics.
    "events_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"),
          col("event_id").as("purchase_id"))
      operators.RangeJoin.pointInInterval(clicks, purchases,
          "user_id", "ts", "w_start", "w_end", Seq("purchase_id"))
        .groupBy("purchase_id")
        .agg(count(lit(1)).as("n_clicks"))
        .orderBy("purchase_id")
    }),

    // As-of join: each purchase matched to the user's latest click at or
    // before it (null if none) — union+window operator, one shuffle; the
    // oracle is DuckDB's native ASOF LEFT JOIN. (user_id, ts) is unique in
    // the fixture, so no right-side pre-aggregation is needed.
    "events_asof" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_id"), col("value").as("click_value"))
      operators.AsofJoin.asofJoin(purchases, clicks, "user_id", "ts",
          Seq("click_id", "click_value"))
        .select(col("event_id"), col("user_id"),
          col("ts").cast("long").as("ts_sec"),
          col("click_id"), col("click_value"))
        .orderBy("event_id")
    }),

    // Cohort retention: users bucketed by first-activity week, active-user
    // counts per (cohort, week offset) — the classic product-analytics
    // matrix. Two keyed aggregations + one join; offsets are exact day
    // multiples of 7 (week-truncated timestamps), so the division is
    // cross-engine exact.
    "events_cohort_retention" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
      val cohort = ev.groupBy("user_id")
        .agg(min(date_trunc("week", col("ts"))).as("cohort_ts"))
      val active = ev
        .select(col("user_id"), date_trunc("week", col("ts")).as("week_ts"))
        .distinct()
      active.join(cohort, "user_id")
        .withColumn("week_offset",
          floor(datediff(col("week_ts"), col("cohort_ts")) / 7.0).cast("long"))
        .groupBy(col("cohort_ts").as("cohort"), col("week_offset"))
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort", "week_offset")
    }),

    // Ordered funnel: view → first click at-or-after the first view →
    // first purchase at-or-after that click, per user; one row of stage
    // conversion counts. Three keyed aggregations chained by broadcast-able
    // per-user stage tables — no window over the raw stream, no explosion.
    "events_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
      val v1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("v1"))
      val c1 = ev.filter(col("event_type") === "click")
        .join(v1, "user_id").filter(col("ts") >= col("v1"))
        .groupBy("user_id").agg(min("ts").as("c1"))
      val p1 = ev.filter(col("event_type") === "purchase")
        .join(c1, "user_id").filter(col("ts") >= col("c1"))
        .groupBy("user_id").agg(min("ts").as("p1"))
      v1.agg(count(lit(1)).as("n_view"))
        .crossJoin(c1.agg(count(lit(1)).as("n_click_after")))
        .crossJoin(p1.agg(count(lit(1)).as("n_purchase_after")))
    }),

    // Salted fact⋈dim join on the (skew-prone) user key, then per-type
    // rollup. The salting is invisible in the result, so the oracle is the
    // PLAIN join — that equality is the point: same answer, no hot task.
    "events_salted_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val dim = ev.groupBy("user_id").agg(count(lit(1)).as("user_events"))
      operators.Skew.saltedJoin(
          ev.select("event_id", "user_id", "event_type"), dim,
          "user_id", col("event_id"), 8)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum("user_events").as("sum_user_events"))
        .orderBy("event_type")
    }),

    // Key-skew health check: the 10 heaviest user_ids + the global
    // max/mean skew factor — the report read before reaching for
    // saltedAgg/saltedJoin.
    "events_key_skew" -> ((s, dir) =>
      operators.Skew.keySkewReport(Tables.events(s, dir), col("user_id"))
        .select(col("key").as("user_id"), col("n_rows"),
          col("share_4dp"), col("skew_factor_4dp"))),

    // Per-user RFM feature table (recency/frequency/monetary — the
    // feature-engineering staple): one partial-agg shuffle, exact integer
    // monetary sums on the cent grid, active days via distinct truncated
    // days. The user-keyed feature-store build.
    "events_user_features" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(date_trunc("day", col("ts"))).as("n_active_days"),
          min(col("ts")).as("first_ts"),
          max(col("ts")).as("last_ts"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchases"),
          sum(when(col("event_type") === "purchase",
            floor(col("value") * 100.0 + 0.5).cast("long")).otherwise(0L))
            .as("monetary_cents"))
        .orderBy("user_id")),

    // Seasonal anomaly detection: hourly cells scored against the
    // per-(type, hour-of-day) baseline across the 30-day span — the
    // "traffic is low FOR A TUESDAY 3 AM" detector that a single global
    // mean (events_rate_anomaly) cannot express. Baseline mean/σ from
    // exact integer sufficient statistics of the cell counts (counts are
    // already integers — no grid needed); cells with |z| > 2 emitted.
    "events_seasonal_anomaly" -> ((s, dir) =>
      seasonalAnomaly(Tables.events(s, dir))),

    // CUSUM mean-shift changepoints over the gap-filled hourly matrix:
    // the sequential CUSUM recursion in closed prefix-sum/window form
    // (Stats.cusumChangepoints) — sustained drifts that per-cell z-scores
    // (events_rate_anomaly) miss because no single hour is extreme.
    "events_changepoint" -> ((s, dir) =>
      operators.Stats.cusumChangepoints(
        denseHourlyCounts(Tables.events(s, dir)),
        "event_type", "hour", "n_events")
        .orderBy("hour", "event_type")),

    // The HLL MERGE path under the oracle gate: per-(type, day) sketches
    // rolled up by register-max into a per-type estimate. Register-max
    // merge is lossless, so the estimate must equal events_distinct_hll's
    // est_users_2dp EXACTLY — and the oracle replays the same two-level
    // fold, proving cross-engine mergeability of stored sketch tables
    // (write sketches daily, estimate any date range later for free).
    "events_hll_rollup" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      // typed-struct daily key — the events_cms_rollup law: no delimiter
      // packing, so no event_type value can mis-split the unpack
      val daily = operators.Sketches.hllSketch(
        ev.withColumn("etd", struct(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"))),
        "etd", col("user_id"))
      val merged = operators.Sketches.hllMerge(
        Seq(daily.withColumn("event_type", col("etd.event_type"))
          .drop("etd")), "event_type")
      operators.Sketches.hllEstimate(merged, "event_type")
        .withColumnRenamed("est_2dp", "est_users_2dp")
        .orderBy("event_type")
    }),

    // Per-type approximate distinct counts via the engine-portable md5 HLL
    // sketch (Sketches.hllDistinct): users (≈150 true — exercises the
    // linear-counting small-range branch) AND distinct value-cents (≈1800
    // true — the raw harmonic-mean branch). Unlike approx_count_distinct,
    // the estimate itself hash-compares against DuckDB, because every
    // register decision is exact md5/string/integer math.
    "events_distinct_hll" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val users = operators.Sketches.hllDistinct(ev, "event_type",
          col("user_id"))
        .withColumnRenamed("est_2dp", "est_users_2dp")
      val cents = operators.Sketches.hllDistinct(ev, "event_type",
          floor(col("value") * 100.0 + 0.5).cast("long"))
        .withColumnRenamed("est_2dp", "est_cents_2dp")
      users.join(cents, "event_type").orderBy("event_type")
    }),

    // Count-Min point-frequency estimates (Sketches.cmsSketch): per-type
    // user-activity counts for the 10 heaviest (type, user) pairs, exact
    // count next to the sketch estimate. CMS never undercounts (est >=
    // n_exact on every row); every counter is an exact md5/integer sum, so
    // the ESTIMATE hash-compares against DuckDB — Spark's own
    // count_min_sketch() binary blob can only be tolerance-checked.
    "events_cms" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val sketch = operators.Sketches.cmsSketch(ev, "event_type", col("user_id"))
      cmsProbeReport(ev, sketch)
    }),

    // The CMS MERGE path under the oracle gate: per-(type, day) sketches
    // summed into the per-type sketch. Counter addition is lossless by
    // construction (counts are linear), so the probe report must equal
    // events_cms EXACTLY — and the twin replays the DIRECT single-level
    // sketch, proving cross-engine mergeability of stored CMS tables
    // (write sketches daily, point-query any date range later for free).
    "events_cms_rollup" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      // the daily group key is a typed STRUCT (event_type, day), not a
      // delimiter-packed string — an event_type containing the delimiter
      // would mis-split on unpack and corrupt the rollup
      val daily = operators.Sketches.cmsSketch(
        ev.withColumn("etd", struct(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"))),
        "etd", col("user_id"))
      val merged = operators.Sketches.cmsMerge(
        Seq(daily.withColumn("event_type", col("etd.event_type"))
          .drop("etd")), "event_type")
      cmsProbeReport(ev, merged)
    })
  )

  /** Shared tail of the CMS queries: the 10 heaviest (event_type, user)
    * pairs by exact count (total-order tie-break) point-queried against
    * `sketch`, exact count and estimate side by side.
    */
  private def cmsProbeReport(ev: DataFrame, sketch: DataFrame): DataFrame = {
    val probes = ev.groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("event_type"), col("user_id"))
      .limit(10)
    val est = operators.Sketches.cmsLookup(sketch, probes, "event_type",
        col("user_id"))
      .withColumnRenamed("cms_key", "user_id")
    probes.join(est, Seq("event_type", "user_id"))
      .select(col("event_type"), col("user_id"), col("n_exact"), col("est"))
      .orderBy("event_type", "user_id")
  }

  /** Seasonal anomaly detection over (event_type, ts) rows: hourly cells
    * scored against the per-(type, hour-of-day) baseline across the whole
    * span — the "traffic is low FOR A 3 AM" detector that a single global
    * mean (events_rate_anomaly) cannot express. Baseline mean/σ from exact
    * integer sufficient statistics of the cell counts (cell counts are
    * already integers — no value grid needed; the [[operators.Stats]]
    * framework); cells with |z| > threshold emitted.
    *
    * Scale: cells are one partial-agg shuffle; the baseline is
    * (types × 24)-sized — broadcast onto the cell table, never a window.
    */
  private def hourlyCells(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"),
        hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n"))

  /** Per-(type, hour-of-day) baseline sufficient statistics over the
    * historical corpus: (event_type, hod, nd, sv, sq) — (types × 24)
    * rows, the broadcast side of [[seasonalAnomaly]] and of the streaming
    * twin `Streams.seasonalAnomalyStream`.
    */
  def seasonalBaseline(events: DataFrame): DataFrame =
    hourlyCells(events).groupBy("event_type", "hod")
      .agg(count(lit(1)).as("nd"),
        sum(col("n").cast("decimal(38,0)")).as("sv"),
        sum((col("n") * col("n")).cast("decimal(38,0)")).as("sq"))

  def seasonalAnomaly(events: DataFrame, threshold: Double = 2.0): DataFrame = {
    val cells = hourlyCells(events)
    val base = seasonalBaseline(events)
    val mean = col("sv").cast("double") / col("nd")
    val variance = col("sq").cast("double") / col("nd") - mean * mean
    cells.join(broadcast(base), Seq("event_type", "hod"))
      .withColumn("z",
        when(variance > 0.0, (col("n") - mean) / sqrt(variance)))
      .filter(abs(col("z")) > threshold)
      .select(col("event_type"), col("day"), col("hod"), col("n"),
        (floor(col("z") * 10000.0 + 0.5) / 10000.0).as("z_4dp"))
      .orderBy("event_type", "day", "hod")
  }

  /** DuckDB twin of one [[operators.Sketches]] HLL estimate chain over
    * `events`, grouped by event_type; CTE names suffixed so two chains can
    * coexist in one query. `keyExpr` must already be VARCHAR-cast.
    */
  private def hllCtes(sfx: String, keyExpr: String): String =
    s"""h$sfx AS (
       |  SELECT event_type,
       |    ('0x' || substring(md5($keyExpr), 1, 2))::BIGINT AS bkt,
       |    substring(md5($keyExpr), 3, 14) AS tail
       |  FROM events WHERE $keyExpr IS NOT NULL),
       |z$sfx AS (
       |  SELECT event_type, bkt,
       |    length(regexp_extract(tail, '^(0*)', 1)) AS z, tail
       |  FROM h$sfx),
       |r$sfx AS (
       |  SELECT event_type, bkt,
       |    CASE WHEN z = 14 THEN 57 ELSE z * 4 +
       |      (CASE WHEN ('0x' || substring(tail, z + 1, 1))::BIGINT >= 8 THEN 0
       |            WHEN ('0x' || substring(tail, z + 1, 1))::BIGINT >= 4 THEN 1
       |            WHEN ('0x' || substring(tail, z + 1, 1))::BIGINT >= 2 THEN 2
       |            ELSE 3 END) + 1 END AS rho
       |  FROM z$sfx),
       |sk$sfx AS (
       |  SELECT event_type, bkt, MAX(rho) AS r FROM r$sfx GROUP BY 1, 2),
       |f$sfx AS (
       |  SELECT event_type, COUNT(*) AS nb,
       |    SUM((1::BIGINT << (57 - r))::HUGEINT) AS s_obs
       |  FROM sk$sfx GROUP BY 1),
       |e$sfx AS (
       |  SELECT event_type,
       |    (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
       |      * 144115188075855872.0
       |      / CAST(s_obs + (256 - nb)::HUGEINT * 144115188075855872::HUGEINT
       |          AS DOUBLE) AS e_raw,
       |    CAST(256 - nb AS DOUBLE) AS v
       |  FROM f$sfx),
       |est$sfx AS (
       |  SELECT event_type,
       |    FLOOR((CASE WHEN e_raw <= 640.0 AND v > 0.0
       |      THEN 256.0 * ln(256.0 / v) ELSE e_raw END) * 100.0 + 0.5)
       |      / 100.0 AS est
       |  FROM e$sfx)""".stripMargin

  /** Count-Min twin: the DIRECT single-level sketch + probe report. Both
    * `events_cms` (direct) and `events_cms_rollup` (per-day sketches summed)
    * hash against this one chain — counter addition is linear, so the
    * merged sketch IS the direct sketch, and the shared oracle is the
    * cross-engine losslessness proof. The md5 salt spelling 'cms<h>|<key>'
    * matches Sketches.cmsCol's concat_ws exactly.
    */
  private val cmsSql: String =
    """WITH ex AS (
      |  SELECT event_type, user_id, COUNT(*) AS n_exact
      |  FROM events GROUP BY 1, 2),
      |probes AS (
      |  SELECT * FROM ex
      |  ORDER BY n_exact DESC, event_type, user_id LIMIT 10),
      |cms AS (
      |  SELECT event_type, t.h,
      |    ('0x' || substring(md5('cms' || CAST(t.h AS VARCHAR) || '|'
      |        || CAST(user_id AS VARCHAR)), 1, 2))::BIGINT AS c,
      |    COUNT(*) AS cnt
      |  FROM events CROSS JOIN range(4) AS t(h)
      |  GROUP BY 1, 2, 3),
      |pp AS (
      |  SELECT p.event_type, p.user_id, p.n_exact, t.h,
      |    ('0x' || substring(md5('cms' || CAST(t.h AS VARCHAR) || '|'
      |        || CAST(p.user_id AS VARCHAR)), 1, 2))::BIGINT AS c
      |  FROM probes p CROSS JOIN range(4) AS t(h)),
      |look AS (
      |  SELECT pp.event_type, pp.user_id, pp.n_exact,
      |    MIN(COALESCE(cms.cnt, 0)) AS est
      |  FROM pp LEFT JOIN cms ON pp.event_type = cms.event_type
      |    AND pp.h = cms.h AND pp.c = cms.c
      |  GROUP BY 1, 2, 3)
      |SELECT event_type, user_id, n_exact, CAST(est AS BIGINT) AS est
      |FROM look ORDER BY event_type, user_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "events_cms" -> cmsSql,
    "events_cms_rollup" -> cmsSql,
    // the twin is the DIRECT single-level sketch: Spark folds per-day
    // sketches through hllMerge, DuckDB sketches the whole corpus in one
    // pass — hash equality IS the cross-engine losslessness proof.
    "events_hll_rollup" ->
      s"""WITH ${hllCtes("u", "CAST(user_id AS VARCHAR)")}
         |SELECT event_type, est AS est_users_2dp FROM estu
         |ORDER BY event_type""".stripMargin,

    "events_user_features" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  COUNT(DISTINCT date_trunc('day', ts)) AS n_active_days,
        |  MIN(ts) AS first_ts, MAX(ts) AS last_ts,
        |  CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1
        |    ELSE 0 END), 0) AS BIGINT) AS n_purchases,
        |  CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |    THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
        |    ELSE 0 END), 0) AS BIGINT) AS monetary_cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "events_seasonal_anomaly" ->
      """WITH cells AS (
        |  SELECT event_type,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    hour(ts) AS hod, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2, 3),
        |base AS (
        |  SELECT event_type, hod, COUNT(*) AS nd,
        |    CAST(SUM(n) AS BIGINT) AS sv, CAST(SUM(n * n) AS BIGINT) AS sq
        |  FROM cells GROUP BY 1, 2),
        |z AS (
        |  SELECT c.event_type, c.day, c.hod, c.n,
        |    CASE WHEN CAST(sq AS DOUBLE) / nd
        |            - (CAST(sv AS DOUBLE) / nd) * (CAST(sv AS DOUBLE) / nd)
        |            > 0.0
        |         THEN (c.n - CAST(sv AS DOUBLE) / nd)
        |           / sqrt(CAST(sq AS DOUBLE) / nd
        |               - (CAST(sv AS DOUBLE) / nd) * (CAST(sv AS DOUBLE) / nd))
        |         END AS z
        |  FROM cells c
        |  JOIN base b ON c.event_type = b.event_type AND c.hod = b.hod)
        |SELECT event_type, day, hod, n,
        |  FLOOR(z * 10000.0 + 0.5) / 10000.0 AS z_4dp
        |FROM z WHERE abs(z) > 2.0
        |ORDER BY event_type, day, hod""".stripMargin,

    "events_distinct_hll" ->
      s"""WITH ${hllCtes("u", "CAST(user_id AS VARCHAR)")},
         |${hllCtes("c", "CAST(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS VARCHAR)")}
         |SELECT estu.event_type, estu.est AS est_users_2dp,
         |  estc.est AS est_cents_2dp
         |FROM estu JOIN estc USING (event_type)
         |ORDER BY event_type""".stripMargin,

    "events_key_skew" ->
      """WITH c AS (
        |  SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY 1),
        |t AS (
        |  SELECT COUNT(*) AS n_keys, CAST(SUM(n_rows) AS BIGINT) AS n_total,
        |    MAX(n_rows) AS n_max
        |  FROM c)
        |SELECT user_id, n_rows,
        |  FLOOR(CAST(n_rows AS DOUBLE) / n_total * 10000.0 + 0.5)
        |    / 10000.0 AS share_4dp,
        |  FLOOR(CAST(n_max AS DOUBLE) * n_keys / n_total * 10000.0 + 0.5)
        |    / 10000.0 AS skew_factor_4dp
        |FROM c, t
        |ORDER BY n_rows DESC, user_id
        |LIMIT 10""".stripMargin,

    "events_cohort_retention" ->
      """WITH cohort AS (
        |  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_ts
        |  FROM events GROUP BY user_id),
        |active AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS week_ts
        |  FROM events)
        |SELECT cohort_ts AS cohort,
        |  CAST(FLOOR(date_diff('day', cohort_ts, week_ts) / 7.0) AS BIGINT)
        |    AS week_offset,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM active JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort, week_offset""".stripMargin,

    "events_funnel" ->
      """WITH v1 AS (
        |  SELECT user_id, MIN(ts) AS v1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c1 AS (
        |  SELECT e.user_id, MIN(e.ts) AS c1
        |  FROM events e JOIN v1 ON e.user_id = v1.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v1.v1
        |  GROUP BY e.user_id),
        |p1 AS (
        |  SELECT e.user_id, MIN(e.ts) AS p1
        |  FROM events e JOIN c1 ON e.user_id = c1.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c1.c1
        |  GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM v1) AS n_view,
        |  (SELECT COUNT(*) FROM c1) AS n_click_after,
        |  (SELECT COUNT(*) FROM p1) AS n_purchase_after""".stripMargin,

    "events_salted_join" ->
      """WITH dim AS (
        |  SELECT user_id, COUNT(*) AS user_events FROM events GROUP BY user_id)
        |SELECT e.event_type, COUNT(*) AS n,
        |  CAST(SUM(d.user_events) AS BIGINT) AS sum_user_events
        |FROM events e JOIN dim d USING (user_id)
        |GROUP BY e.event_type ORDER BY event_type""".stripMargin,

    "events_json_agg" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(regexp_extract(props, '"k"\s*:\s*(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(SUM(CAST(CAST(regexp_extract(props, '"k"\s*:\s*(\d+)', 1) AS BIGINT) AS DECIMAL(18,2))) AS DOUBLE)
        |    / COUNT(*) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "events_sessionize" ->
      """WITH t AS (
        |  SELECT user_id,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS secs,
        |    LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_secs
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN prev_secs IS NULL OR secs - prev_secs > 1800
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin,

    "events_props_typed" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k"\s*:\s*(\d+)', 1) AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "events_session_window" ->
      """WITH t AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM t)
        |SELECT user_id,
        |  CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS session_start,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    // gapfill twin + trailing-3-row frame window (CAST the frame SUM back
    // to BIGINT: DuckDB window SUM yields HUGEINT)
    "events_moving_avg" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |b AS (
        |  SELECT date_trunc('hour', MIN(ts)) AS lo,
        |    date_trunc('hour', MAX(ts)) AS hi
        |  FROM events),
        |hours AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        |  FROM b),
        |types AS (SELECT DISTINCT event_type FROM events),
        |dense AS (
        |  SELECT h.hour, t.event_type, COALESCE(n_events, 0) AS n_events
        |  FROM hours h CROSS JOIN types t
        |  LEFT JOIN hourly ON hourly.hour = h.hour
        |    AND hourly.event_type = t.event_type)
        |SELECT hour, event_type, n_events,
        |  FLOOR(CAST(CAST(SUM(n_events) OVER w AS BIGINT) AS DOUBLE)
        |    / COUNT(*) OVER w * 10000.0 + 0.5) / 10000.0 AS ma_4dp
        |FROM dense
        |WINDOW w AS (PARTITION BY event_type ORDER BY hour
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY hour, event_type""".stripMargin,

    // gapfill twin composed with the closed-form CUSUM: exact integer
    // prefix sums, pinned double spellings for k± drift lines, running
    // min/max as pure selection — mirrors Stats.cusumChangepoints token
    // for token.
    "events_changepoint" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |b AS (
        |  SELECT date_trunc('hour', MIN(ts)) AS lo,
        |    date_trunc('hour', MAX(ts)) AS hi
        |  FROM events),
        |hours AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        |  FROM b),
        |types AS (SELECT DISTINCT event_type FROM events),
        |dense AS (
        |  SELECT h.hour, t.event_type, COALESCE(n_events, 0) AS n_events
        |  FROM hours h CROSS JOIN types t
        |  LEFT JOIN hourly ON hourly.hour = h.hour
        |    AND hourly.event_type = t.event_type),
        |s AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(n_events) AS sv, SUM(n_events * n_events) AS sq
        |  FROM dense GROUP BY 1),
        |p AS (
        |  SELECT d.hour, d.event_type, d.n_events,
        |    CAST(SUM(d.n_events) OVER w AS DOUBLE) AS c,
        |    CAST(ROW_NUMBER() OVER w AS DOUBLE) AS rn,
        |    CAST(sv AS DOUBLE) / n AS mu,
        |    CASE WHEN CAST(sq AS DOUBLE) / n
        |            - (CAST(sv AS DOUBLE) / n) * (CAST(sv AS DOUBLE) / n)
        |            > 0.0
        |         THEN sqrt(CAST(sq AS DOUBLE) / n
        |            - (CAST(sv AS DOUBLE) / n) * (CAST(sv AS DOUBLE) / n))
        |         END AS sigma
        |  FROM dense d JOIN s USING (event_type)
        |  WINDOW w AS (PARTITION BY d.event_type ORDER BY d.hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |d2 AS (
        |  SELECT hour, event_type, n_events, sigma,
        |    c - rn * (mu + 0.5 * sigma) AS dup,
        |    c - rn * (mu - 0.5 * sigma) AS ddn
        |  FROM p),
        |cz AS (
        |  SELECT hour, event_type, n_events, sigma,
        |    dup - LEAST(0.0, MIN(dup) OVER w) AS cup,
        |    GREATEST(0.0, MAX(ddn) OVER w) - ddn AS cdn
        |  FROM d2
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT hour, event_type, n_events,
        |  FLOOR(cup * 10000.0 + 0.5) / 10000.0 AS cusum_up_4dp,
        |  FLOOR(cdn * 10000.0 + 0.5) / 10000.0 AS cusum_dn_4dp
        |FROM cz WHERE cup > 4.0 * sigma OR cdn > 4.0 * sigma
        |ORDER BY hour, event_type""".stripMargin,

    "events_gapfill" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |b AS (
        |  SELECT date_trunc('hour', MIN(ts)) AS lo,
        |    date_trunc('hour', MAX(ts)) AS hi
        |  FROM events),
        |hours AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        |  FROM b),
        |types AS (SELECT DISTINCT event_type FROM events)
        |SELECT h.hour, t.event_type, COALESCE(n_events, 0) AS n_events
        |FROM hours h CROSS JOIN types t
        |LEFT JOIN hourly ON hourly.hour = h.hour
        |  AND hourly.event_type = t.event_type
        |ORDER BY h.hour, t.event_type""".stripMargin,

    // gapfill twin composed with the exact-stats outlier twin over the
    // densified matrix
    "events_rate_anomaly" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |b AS (
        |  SELECT date_trunc('hour', MIN(ts)) AS lo,
        |    date_trunc('hour', MAX(ts)) AS hi
        |  FROM events),
        |hours AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        |  FROM b),
        |types AS (SELECT DISTINCT event_type FROM events),
        |dense AS (
        |  SELECT h.hour, t.event_type, COALESCE(n_events, 0) AS n_events
        |  FROM hours h CROSS JOIN types t
        |  LEFT JOIN hourly ON hourly.hour = h.hour
        |    AND hourly.event_type = t.event_type),
        |s AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(CAST(FLOOR(n_events * 100.0 + 0.5) AS BIGINT)) AS sv,
        |    SUM(CAST(FLOOR(n_events * 100.0 + 0.5) AS BIGINT)
        |      * CAST(FLOOR(n_events * 100.0 + 0.5) AS BIGINT)) AS sq
        |  FROM dense GROUP BY 1),
        |z AS (
        |  SELECT d.hour, d.event_type, d.n_events,
        |    (d.n_events - CAST(sv AS DOUBLE) / 100.0 / n)
        |      / sqrt(CAST(sq AS DOUBLE) / 10000.0 / n
        |        - (CAST(sv AS DOUBLE) / 100.0 / n)
        |          * (CAST(sv AS DOUBLE) / 100.0 / n)) AS zz
        |  FROM dense d JOIN s USING (event_type))
        |SELECT hour, event_type, n_events,
        |  FLOOR(zz * 10000.0 + 0.5) / 10000.0 AS z_4dp
        |FROM z WHERE abs(zz) > 2.0
        |ORDER BY hour, event_type""".stripMargin,

    "events_outliers" ->
      """WITH s AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS sv,
        |    SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
        |      * CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS sq
        |  FROM events GROUP BY 1),
        |z AS (
        |  SELECT e.event_id, e.event_type, e.value,
        |    (e.value - CAST(sv AS DOUBLE) / 100.0 / n)
        |      / sqrt(CAST(sq AS DOUBLE) / 10000.0 / n
        |        - (CAST(sv AS DOUBLE) / 100.0 / n)
        |          * (CAST(sv AS DOUBLE) / 100.0 / n)) AS z
        |  FROM events e JOIN s USING (event_type))
        |SELECT event_id, event_type, value,
        |  FLOOR(z * 10000.0 + 0.5) / 10000.0 AS z_4dp
        |FROM z WHERE abs(z) > 3.0
        |ORDER BY event_id""".stripMargin,

    "events_range_join" ->
      """SELECT p.event_id AS purchase_id, COUNT(*) AS n_clicks
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id
        | AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 1 HOUR
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_asof" ->
      """SELECT v.event_id, v.user_id,
        |  CAST(FLOOR(epoch(v.ts)) AS BIGINT) AS ts_sec,
        |  c.event_id AS click_id, c.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') v
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON v.user_id = c.user_id AND v.ts >= c.ts
        |ORDER BY v.event_id""".stripMargin
  )
}
