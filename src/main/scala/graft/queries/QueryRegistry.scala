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
        |FROM x GROUP BY user_id, sid""".stripMargin
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    AggQueries.queries ++ RelationalQueries.queries ++
      PipelineQueries.queries ++ streamingQueries

  def oracleSql: Map[String, String] =
    AggQueries.oracle ++ RelationalQueries.oracle ++
      PipelineQueries.oracle ++ streamingOracle
}
