package graft.queries

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
    })
  )

  private val streamingOracle: Map[String, String] = Map(
    "stream_window_agg" ->
      """SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000)
        |         AS bucket,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v_sum
        |FROM events GROUP BY 1, 2""".stripMargin,
    "stream_dedup" ->
      """WITH e AS (
        |  SELECT *, epoch_us(ts) AS t, epoch_us(ts) // 60000000 AS b
        |  FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY b
        |             ORDER BY t, event_id) AS rn FROM e)
        |SELECT event_id, ts, user_id, event_type, value FROM r
        |WHERE rn = 1""".stripMargin
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    AggQueries.queries ++ RelationalQueries.queries ++
      PipelineQueries.queries ++ streamingQueries

  def oracleSql: Map[String, String] =
    AggQueries.oracle ++ RelationalQueries.oracle ++
      PipelineQueries.oracle ++ streamingOracle
}
