package graft.queries

import graft.core.{TimeSeriesAggregator => TSA}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregates every query group's `queries`/`oracle` maps into the single
  * registry exposed through [[graft.SparkEntry]]. */
object QueryRegistry {
  import org.apache.spark.sql.functions.col
  import org.apache.spark.sql.types.TimestampNTZType

  /** Streaming operators exercised through their batch twins (the same
    * transform runs on batch and streaming DataFrames; StreamingSpec
    * drives the streaming side with MemoryStream + file streams). */
  private val streamingQueries
      : Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_window_agg" -> ((s, dir) =>
      graft.streaming.StreamingAgg
        .windowedCounts(AggQueries.events(s, dir))
        .withColumn("bucket", col("bucket").cast(TimestampNTZType))),
    "stream_attrib" -> ((s, dir) =>
      graft.streaming.StreamingAgg
        .attributionJoin(AggQueries.events(s, dir))),
    // the SAME stateful transform runs in batch mode (each group's
    // iterator folds once against empty state), so the oracle checks the
    // exact code path the stream executes
    "stream_upsert" -> ((s, dir) =>
      graft.streaming.StreamingAgg
        .upsertLatest(AggQueries.events(s, dir)).toDF()),
    // per-user daily-cadence gap fill; same stateful transform in batch
    // (one fold per key against empty state) — see StreamingAgg.gapFillStream
    "stream_gapfill" -> ((s, dir) =>
      graft.streaming.StreamingAgg
        .gapFillStream(AggQueries.events(s, dir),
          nomUs = 86400000000L, gapUs = 172800000000L).toDF()),
    "stream_enrich" -> ((s, dir) =>
      graft.streaming.StreamingAgg
        .enrichedWindowedCounts(AggQueries.events(s, dir),
          graft.Tables.load(s, dir, "customer"))
        .withColumn("bucket", col("bucket").cast(TimestampNTZType))),
    // batch twin of StreamingAgg.cadenceDedup: dropDuplicatesWithinWatermark
    // is streaming-only, so the batch path keeps the deterministic first
    // record (t, event_id) of each cadence bucket — the event-time-order
    // equivalent of the streaming keep-first-arrival semantics
    "stream_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{expr, row_number}
      import graft.core.{TimeSeriesAggregator => TSA}
      val e = TSA.withEpochUs(AggQueries.events(s, dir), "ts")
        .withColumn("cadence_bucket", expr(s"${TSA.T} div 60000000L"))
      val w = Window.partitionBy("cadence_bucket")
        .orderBy(col(TSA.T), col("event_id"))
      e.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select("event_id", "ts", "user_id", "event_type", "value")
    }),
    // batch twin of StreamingAgg.transitionSteps: one fold per user over
    // the full sorted history against empty state == the lead-window
    // Markov pairs of q_transitions (restricted to non-null keys)
    "stream_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{count, lit}
      graft.streaming.StreamingAgg
        .transitionSteps(AggQueries.events(s, dir)).toDF()
        .groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("n"))
    }),
    // batch twin of StreamingAgg.sessionize (flatMapGroupsWithState):
    // identical session semantics via keyed windows; session bounds in
    // integer epoch-micros, v_sum decimal-exact then cast once
    "stream_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
      import graft.core.{TimeSeriesAggregator => TSA}
      val e = TSA.filterValid(AggQueries.events(s, dir), AggQueries.cfg)
      val w = Window.partitionBy("user_id")
        .orderBy(col(TSA.T), col("event_id"))
      val wCum = w.rowsBetween(Window.unboundedPreceding, 0)
      e.withColumn("__prev", lag(col(TSA.T), 1).over(w))
        .withColumn("__new",
          when(col("__prev").isNull ||
            col(TSA.T) - col("__prev") > 1800000000L, 1L).otherwise(0L))
        .withColumn("__sid", sum(col("__new")).over(wCum))
        .groupBy(col("user_id"), col("__sid"))
        .agg(min(TSA.T).as("session_start"), max(TSA.T).as("session_end"),
          count(lit(1)).as("n_events"),
          (sum(floor(col("value") * lit(10000.0) + lit(0.5)).cast(LongType)
            .cast(DecimalType(38, 0))).cast(DoubleType) / lit(10000.0))
            .as("v_sum"))
        .select("user_id", "session_start", "session_end", "n_events",
          "v_sum")
    }),
    // batch twin of StreamingAgg.anomalyStream: day-batched prequential
    // z-score — each event scores against the exact integer moments of
    // all STRICTLY EARLIER days of its type. The batch plan is
    // scale-clean where a naive per-type running window is not: a
    // per-(type, day) moment aggregate (map-side combine), an exclusive
    // prefix window over the |types|×|days| CALENDAR-bounded frame
    // (same agg-below-window rationale as q_concurrency), and a
    // broadcast join back over the scan — no corpus-sized window
    // partition anywhere.
    "stream_anomaly" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
      val e = AggQueries.events(s, dir)
        .filter(col("ts").isNotNull && col("value").isNotNull &&
          col("event_type").isNotNull && col("event_id").isNotNull)
        .withColumn("__t", unix_micros(col("ts")
          .cast(org.apache.spark.sql.types.TimestampType)))
        .select(col("event_type"),
          expr("__t div 86400000000").as("day"),
          col("event_id").cast(LongType).as("event_id"),
          col("value").cast(DoubleType).as("value"),
          expr("CAST(floor(value * 10000.0 + 0.5) AS BIGINT)").as("e4"))
      val daily = e.groupBy("event_type", "day")
        .agg(count(lit(1)).as("dn"), sum(col("e4")).as("ds1"),
          sum(col("e4").cast(DecimalType(38, 0)) *
            col("e4").cast(DecimalType(38, 0))).as("ds2"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
      val mu = col("ps1").cast(DoubleType) / col("n_prior").cast(DoubleType)
      val prior = daily.select(col("event_type"), col("day"),
          sum(col("dn")).over(w).as("n_prior"),
          sum(col("ds1")).over(w).as("ps1"),
          sum(col("ds2")).over(w).as("ps2"))
        .filter(col("n_prior") >= 30L)
        .select(col("event_type"), col("day"), col("n_prior"),
          mu.as("mu"),
          sqrt(col("ps2").cast(DoubleType) /
            col("n_prior").cast(DoubleType) - mu * mu).as("sigma"))
        .filter(col("sigma") > 0.0d)
      e.join(broadcast(prior), Seq("event_type", "day"))
        .withColumn("z",
          (col("e4").cast(DoubleType) - col("mu")) / col("sigma"))
        .filter(abs(col("z")) > 4.0d)
        .select("event_type", "day", "event_id", "value", "n_prior", "z")
    }),
    // batch twin of StreamingAgg.dayMoversStream: one fold per type
    // against empty state == q_top_movers' lag frame before the peak
    // filter, minus each type's trailing (incomplete) day
    "stream_top_movers" -> ((s, dir) =>
      graft.streaming.StreamingAgg
        .dayMoversStream(AggQueries.events(s, dir)).toDF()),
    // batch twin of StreamingAgg.cusumStream: one fold per type against
    // empty state == prequential CUSUM vs the 7-day warmup mean
    "stream_cusum" -> ((s, dir) =>
      graft.streaming.StreamingAgg
        .cusumStream(AggQueries.events(s, dir)).toDF()),
    // batch twin of StreamingAgg.seasonalityStream: one fold per type
    // against empty state == q_seasonality's cumulative per-dow profile
    // at each completed day, minus each type's trailing day
    "stream_seasonality" -> ((s, dir) =>
      graft.streaming.StreamingAgg
        .seasonalityStream(AggQueries.events(s, dir)).toDF()),
    // batch twin of StreamingAgg.cohortStream: one fold per user against
    // empty state == q_cohort's DISTINCT (user, cohort, offset) frame
    // (the single sorted fold makes first-arrival == min day)
    "stream_cohort" -> ((s, dir) =>
      graft.streaming.StreamingAgg
        .cohortStream(AggQueries.events(s, dir)).toDF()),
    // batch twin of StreamingAgg.forecastStream: one fold per type
    // against empty state == q_forecast's day-7 self-join rows, minus
    // each type's trailing (incomplete) day
    "stream_forecast" -> ((s, dir) =>
      graft.streaming.StreamingAgg
        .forecastStream(AggQueries.events(s, dir)).toDF()),
    // batch twin of StreamingAgg.gapStream: one fold per type against
    // empty state == q_gap_stats' per-gap rows (the alert stream IS the
    // report's gap set)
    "stream_gap_alerts" -> ((s, dir) =>
      graft.streaming.StreamingAgg
        .gapStream(AggQueries.events(s, dir)).toDF()),
    // batch twin of StreamingAgg.packStream: one fold per source against
    // empty state == the arrival-order pack (dPackSequences with
    // packShards = 1; the oracle SQL below spells out that window)
    "stream_pack_sequences" -> ((s, dir) =>
      graft.streaming.StreamingAgg
        .packStream(graft.Tables.load(s, dir, "documents")).toDF()),
    // batch twin of StreamingAgg.driftStream: one fold per label against
    // empty state == the emb_drift two-sample centroid check
    "stream_drift" -> ((s, dir) =>
      graft.streaming.StreamingAgg
        .driftStream(graft.Tables.load(s, dir, "embeddings")).toDF()),
    // batch twin of StreamingAgg.funnelStream: each user's full sorted
    // history folds through the 3-long stage chain; the stage counts
    // equal q_funnel's min-aggregate join chain (restricted to the
    // stream face's non-null keys)
    "stream_funnel" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{count, when, col, lit}
      graft.streaming.StreamingAgg
        .funnelStream(AggQueries.events(s, dir)).toDF()
        .agg(
          count(when(col("stage") === "view", lit(1))).as("n_view"),
          count(when(col("stage") === "click_after_view", lit(1)))
            .as("n_click_after_view"),
          count(when(col("stage") === "purchase_after_click", lit(1)))
            .as("n_purchase_after_click"))
    })
  )

  private val streamingOracle: Map[String, String] = Map(
    "stream_window_agg" ->
      """SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000)
        |         AS bucket,
        |       event_type, count(*) AS n,
        |       (CAST(sum(CAST(CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0) AS v_sum
        |FROM events GROUP BY 1, 2""".stripMargin,
    "stream_attrib" ->
      """SELECT p.event_id AS purchase_id, v.event_id AS view_id,
        |       p.user_id, epoch_us(p.ts) AS p_t, epoch_us(v.ts) AS v_t,
        |       p.value
        |FROM events p
        |JOIN events v ON v.user_id = p.user_id
        |  AND v.event_type = 'view'
        |  AND epoch_us(v.ts) >= epoch_us(p.ts) - 3600000000
        |  AND epoch_us(v.ts) <= epoch_us(p.ts)
        |WHERE p.event_type = 'purchase'""".stripMargin,
    "stream_upsert" ->
      """WITH r AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS t, event_id, value,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |           ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IS NOT NULL AND event_id IS NOT NULL
        |    AND value IS NOT NULL)
        |SELECT user_id, event_type, t, event_id AS last_event_id,
        |       value AS last_value
        |FROM r WHERE rn = 1""".stripMargin,
    "stream_enrich" ->
      """SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000)
        |         AS bucket,
        |       c_mktsegment, count(*) AS n,
        |       (CAST(sum(CAST(CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0) AS v_sum
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2""".stripMargin,
    "stream_gapfill" ->
      s"""WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_id, value FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_id IS NOT NULL AND value IS NOT NULL
        |    AND epoch_us(ts) > 0),
        |o AS (SELECT *, lag(t) OVER (PARTITION BY user_id
        |             ORDER BY t, event_id) AS prev_t FROM e),
        |f AS (SELECT user_id,
        |             unnest(list_transform(
        |               range(1, ${TSA.fillCountDuck("t - prev_t", 86400000000L)} + 1),
        |               k -> prev_t + k * 86400000000)) AS t
        |      FROM o
        |      WHERE prev_t IS NOT NULL AND t - prev_t > 172800000000)
        |SELECT user_id, t, event_id, value, FALSE AS is_fill FROM e
        |UNION ALL
        |SELECT user_id, t, CAST(NULL AS BIGINT) AS event_id,
        |       CAST(NULL AS DOUBLE) AS value, TRUE AS is_fill FROM f""".stripMargin,
    "stream_dedup" ->
      """WITH e AS (
        |  SELECT *, epoch_us(ts) AS t, epoch_us(ts) // 60000000 AS b
        |  FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY b
        |             ORDER BY t, event_id) AS rn FROM e)
        |SELECT event_id, ts, user_id, event_type, value FROM r
        |WHERE rn = 1""".stripMargin,
    "stream_transitions" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS to_type
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_id IS NOT NULL AND event_type IS NOT NULL)
        |SELECT event_type AS from_type, to_type,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM s WHERE to_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    "stream_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS t FROM events
        |  WHERE ts IS NOT NULL AND epoch_us(ts) > 0),
        |d AS (SELECT *, lag(t) OVER (PARTITION BY user_id
        |               ORDER BY t, event_id) AS prev_t FROM e),
        |m AS (SELECT *, CASE WHEN prev_t IS NULL OR t - prev_t > 1800000000
        |                     THEN 1 ELSE 0 END AS newsess FROM d),
        |x AS (SELECT *, sum(newsess) OVER (PARTITION BY user_id
        |               ORDER BY t, event_id ROWS UNBOUNDED PRECEDING)
        |               AS sid FROM m)
        |SELECT user_id, min(t) AS session_start, max(t) AS session_end,
        |       count(*) AS n_events,
        |       (CAST(sum(CAST(CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0) AS v_sum
        |FROM x GROUP BY user_id, sid""".stripMargin,
    // day-batched prequential z-score: per-(type, day) integer moments,
    // an exclusive prefix over days, mean/σ derived from the exact
    // integers through the same IEEE sequence as Spark
    "stream_anomaly" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         event_id, value,
        |         CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS e4
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL
        |    AND event_type IS NOT NULL AND event_id IS NOT NULL),
        |d AS (SELECT event_type, day, count(*) AS dn,
        |             CAST(sum(e4) AS BIGINT) AS ds1,
        |             sum(CAST(e4 AS DECIMAL(38,0)) *
        |                 CAST(e4 AS DECIMAL(38,0))) AS ds2
        |      FROM e GROUP BY 1, 2),
        |p AS (SELECT event_type, day,
        |             CAST(sum(dn) OVER w AS BIGINT) AS n_prior,
        |             CAST(sum(ds1) OVER w AS BIGINT) AS ps1,
        |             sum(ds2) OVER w AS ps2
        |      FROM d
        |      WINDOW w AS (PARTITION BY event_type ORDER BY day
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |s AS (SELECT event_type, day, n_prior,
        |             CAST(ps1 AS DOUBLE) / CAST(n_prior AS DOUBLE) AS mu,
        |             sqrt(CAST(ps2 AS DOUBLE) / CAST(n_prior AS DOUBLE) -
        |               (CAST(ps1 AS DOUBLE) / CAST(n_prior AS DOUBLE)) *
        |               (CAST(ps1 AS DOUBLE) / CAST(n_prior AS DOUBLE)))
        |               AS sigma
        |      FROM p WHERE n_prior >= 30)
        |SELECT e.event_type, e.day, e.event_id, e.value, s.n_prior,
        |       (CAST(e.e4 AS DOUBLE) - s.mu) / s.sigma AS z
        |FROM e JOIN s USING (event_type, day)
        |WHERE s.sigma > 0
        |  AND abs((CAST(e.e4 AS DOUBLE) - s.mu) / s.sigma) > 4"""
        .stripMargin,
    // prequential CUSUM: warmup totals over each type's first 7 days,
    // then per completed post-warmup day the running integer deviation
    // Sum(ds)*wN - Sum(dn)*wS, one double conversion and one divide —
    // the same arithmetic discipline as q_cusum's retrospective form;
    // trailing day excluded (it has not completed in the stream)
    "stream_cusum" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS e4
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL
        |    AND event_type IS NOT NULL AND event_id IS NOT NULL),
        |d AS (SELECT event_type, day, count(*) AS dn,
        |             CAST(sum(e4) AS BIGINT) AS ds1
        |      FROM e GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER w AS rn,
        |             max(day) OVER (PARTITION BY event_type) AS mx
        |      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |wu AS (SELECT event_type, CAST(sum(dn) AS BIGINT) AS wn,
        |              CAST(sum(ds1) AS BIGINT) AS ws
        |       FROM r WHERE rn <= 7 GROUP BY 1),
        |a AS (SELECT event_type, day, rn, mx,
        |             sum(CAST(ds1 AS HUGEINT)) OVER w2 AS cds,
        |             sum(CAST(dn AS HUGEINT)) OVER w2 AS cdn
        |      FROM r WHERE rn > 7
        |      WINDOW w2 AS (PARTITION BY event_type ORDER BY day
        |        ROWS UNBOUNDED PRECEDING))
        |SELECT a.event_type, a.day, CAST(a.rn - 7 AS BIGINT) AS n_days,
        |       CAST(cds * wn - cdn * ws AS DOUBLE) /
        |         (CAST(wn AS DOUBLE) * 10000.0) AS cusum_stat
        |FROM a JOIN wu USING (event_type)
        |WHERE a.day < a.mx""".stripMargin,
    // cumulative per-dow profile at each completed day; the emitted
    // dow_avg is the running so-far mean INCLUDING the emitting day;
    // trailing day excluded (it has not completed in the stream)
    "stream_seasonality" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS e4
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL
        |    AND event_type IS NOT NULL AND event_id IS NOT NULL),
        |d AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS dn,
        |             CAST(sum(e4) AS BIGINT) AS ds1
        |      FROM e GROUP BY 1, 2),
        |r AS (SELECT *, max(day) OVER (PARTITION BY event_type) AS mx
        |      FROM d),
        |a AS (SELECT event_type, day, day % 7 AS dow, dn, ds1, mx,
        |             CAST(sum(dn) OVER w AS BIGINT) AS cn,
        |             CAST(sum(ds1) OVER w AS BIGINT) AS cs
        |      FROM r
        |      WINDOW w AS (PARTITION BY event_type, day % 7 ORDER BY day
        |        ROWS UNBOUNDED PRECEDING))
        |SELECT event_type, day, dow, dn AS n_day,
        |       CAST(ds1 AS DOUBLE) / 10000.0 AS day_sum,
        |       cn AS dow_n,
        |       CAST(cs AS DOUBLE) / (CAST(cn AS DOUBLE) * 10000.0)
        |         AS dow_avg
        |FROM a WHERE day < mx""".stripMargin,
    // q_forecast's day-7 self-join at per-day granularity; the trailing
    // day of each type excluded (it has not completed in the stream);
    // exact integer daily sums, three output divides
    "stream_forecast" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS e4
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL
        |    AND event_type IS NOT NULL AND event_id IS NOT NULL),
        |d AS (SELECT event_type, day, CAST(sum(e4) AS BIGINT) AS ds1
        |      FROM e GROUP BY 1, 2),
        |r AS (SELECT *, max(day) OVER (PARTITION BY event_type) AS mx
        |      FROM d)
        |SELECT a.event_type, a.day,
        |       CAST(a.ds1 AS DOUBLE) / 10000.0 AS actual,
        |       CAST(b.ds1 AS DOUBLE) / 10000.0 AS predicted,
        |       CAST(a.ds1 - b.ds1 AS DOUBLE) / 10000.0 AS error
        |FROM r a JOIN d b ON a.event_type = b.event_type
        |  AND a.day = b.day + 7
        |WHERE a.day < a.mx""".stripMargin,
    // q_cohort's DISTINCT activity frame — the increments the live
    // retention matrix aggregates; single-fold first-arrival == min day
    "stream_cohort" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_id IS NOT NULL),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1)
        |SELECT DISTINCT e.user_id, f.cohort_day,
        |       e.day - f.cohort_day AS day_offset
        |FROM e JOIN f USING (user_id)""".stripMargin,
    // q_top_movers' lag frame (consecutive days only), every step, the
    // trailing day of each type excluded — it has not completed in the
    // stream; integer day sums divide once at the end
    "stream_top_movers" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS e4
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL
        |    AND event_type IS NOT NULL AND event_id IS NOT NULL),
        |d AS (SELECT event_type, day, CAST(sum(e4) AS BIGINT) AS ds1
        |      FROM e GROUP BY 1, 2),
        |x AS (SELECT *,
        |             lag(day) OVER w AS pd, lag(ds1) OVER w AS ps1,
        |             max(day) OVER (PARTITION BY event_type) AS mx
        |      FROM d
        |      WINDOW w AS (PARTITION BY event_type ORDER BY day))
        |SELECT event_type, day,
        |       CAST(ps1 AS DOUBLE) / 10000.0 AS prev_day_sum,
        |       CAST(ds1 AS DOUBLE) / 10000.0 AS day_sum,
        |       CAST(ds1 - ps1 AS DOUBLE) / 10000.0 AS delta
        |FROM x WHERE pd = day - 1 AND day < mx""".stripMargin,
    // the emb_drift SQL verbatim: the drift fold's exact integer sums
    // reproduce the batch centroids, and the BigInt->double conversion
    // is the same correctly-rounded value as DECIMAL(38,0)->DOUBLE
    "stream_drift" ->
      """WITH q AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |             i AS dim, vec_id % 2 AS half,
        |             CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000.0)
        |               AS BIGINT) AS qv
        |           FROM embeddings CROSS JOIN range(1, 65) r(i)),
        |s AS (SELECT label, dim,
        |        CAST(sum(CASE WHEN half = 0 THEN qv ELSE 0 END)
        |          AS BIGINT) AS s0,
        |        CAST(sum(CASE WHEN half = 1 THEN qv ELSE 0 END)
        |          AS BIGINT) AS s1
        |      FROM q GROUP BY 1, 2),
        |d AS (SELECT label,
        |        sum(CAST(s0 AS HUGEINT) * CAST(s1 AS HUGEINT)) AS dot,
        |        sum(CAST(s0 AS HUGEINT) * CAST(s0 AS HUGEINT)) AS s0sq,
        |        sum(CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT)) AS s1sq
        |      FROM s GROUP BY 1),
        |c AS (SELECT CAST(label AS BIGINT) AS label,
        |        CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_even,
        |        CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_odd
        |      FROM embeddings GROUP BY 1)
        |SELECT d.label, c.n_even, c.n_odd,
        |       CAST(dot AS DOUBLE) / (sqrt(CAST(s0sq AS DOUBLE)) *
        |         sqrt(CAST(s1sq AS DOUBLE))) AS drift_cos
        |FROM d JOIN c USING (label)
        |WHERE c.n_even > 0 AND c.n_odd > 0
        |  AND d.s0sq > 0 AND d.s1sq > 0""".stripMargin,
    // q_funnel's min-aggregate chain over the stream face's non-null
    // keys: in (t, id)-ordered folding the first qualifying event IS the
    // stage minimum
    "stream_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS t FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IS NOT NULL AND event_id IS NOT NULL),
        |s1 AS (SELECT user_id, min(t) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(t) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND t > t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(t) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND t > t2 GROUP BY e.user_id)
        |SELECT count(t1) AS n_view, count(t2) AS n_click_after_view,
        |       count(t3) AS n_purchase_after_click
        |FROM s1 LEFT JOIN s2 USING (user_id)
        |        LEFT JOIN s3 USING (user_id)""".stripMargin,
    // the gap fold against empty state == the per-gap row set of the
    // batch report, under the SAME round-half-even missing-record rule
    "stream_gap_alerts" ->
      s"""WITH v AS (
         |  SELECT event_type, epoch_us(ts) AS t, event_id FROM events
         |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
         |    AND event_id IS NOT NULL AND epoch_us(ts) > 0),
         |g AS (SELECT event_type, t,
         |             lag(t) OVER (PARTITION BY event_type
         |                          ORDER BY t, event_id) AS pt
         |      FROM v)
         |SELECT event_type, pt AS gap_start_us, t - pt AS gap_us,
         |       CAST(${TSA.fillCountDuck("t - pt", 3600000000L)} AS BIGINT)
         |         AS n_missing,
         |       FALSE AS open
         |FROM g WHERE pt IS NOT NULL AND t - pt > 7200000000""".stripMargin,
    // the packer fold against empty state == the ARRIVAL-ORDER
    // per-source prefix window (doc_id order — d_pack_sequences'
    // packShards=1 degenerate form, NOT its default two-level
    // (shard, doc_id) rule; the entry pins the STREAMING code path)
    "stream_pack_sequences" ->
      s"""WITH d AS (
        |  SELECT doc_id, source,
        |         CAST(len(${graft.functions.PortableText
                    .tokensDuck("text")}) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT *, COALESCE(sum(n_tokens) OVER (PARTITION BY source
        |           ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) AS bin_offset
        |  FROM d)
        |SELECT source, doc_id, n_tokens,
        |       CAST(bin_offset // 2048 AS BIGINT) AS bin_id,
        |       CAST(bin_offset % 2048 AS BIGINT) AS offset_in_bin
        |FROM o""".stripMargin
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    AggQueries.queries ++ RelationalQueries.queries ++
      PipelineQueries.queries ++ streamingQueries

  def oracleSql: Map[String, String] =
    AggQueries.oracle ++ RelationalQueries.oracle ++
      PipelineQueries.oracle ++ streamingOracle
}
