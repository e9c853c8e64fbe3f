package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, TimestampType}

/** Structured-Streaming twins of the batch aggregation operators
  * (SURVEY.md §2 D). The reference is a batch tool; a 100 TB pipeline
  * ingests granules continuously, so the same semantics are exposed over
  * `readStream`: watermarked tumbling-window aggregation and cadence dedup.
  *
  * Both transforms work identically on batch and streaming DataFrames
  * (tested both ways in StreamingSpec); state is bounded by the watermark.
  */
object StreamingAgg {

  /** Tumbling-window per-type aggregation with late-data tolerance.
    * Batch twin: RelationalQueries.qWindowTumbling. */
  def windowedCounts(events: DataFrame, windowDur: String = "6 hours",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast(TimestampType))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      // decimal-exact sum cast to double once: order-independent, so batch
      // and streaming (and the DuckDB oracle) agree bit-for-bit
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType)
          .as("v_sum"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("v_sum"))

  /** Streaming cadence dedup: keep one record per nominal-cadence bucket,
    * with state expired by the watermark. Streaming analog of
    * TimeSeriesAggregator.dedupe (the reference's too-close-record drop,
    * /root/reference/ncagg/aggrelist.py:290-292). */
  def cadenceDedup(events: DataFrame, minStepUs: Long,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast(TimestampType))
      .withColumn("cadence_bucket",
        expr(s"unix_micros(ts) div ${minStepUs}L"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("cadence_bucket")
      .drop("cadence_bucket")
}
