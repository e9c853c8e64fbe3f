package graft.streaming

import graft.core.TimeSeriesAggregator
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType, TimestampType}

/** Typed rows of the stateful sessionizer (top level for Encoder
  * derivation). `ts` carries the watermark (the event-time timeout checker
  * requires the watermarked column in the grouped input); `t` is the same
  * instant in integer epoch-micros for the arithmetic. */
final case class SessionEvent(user_id: Long, t: Long, value: Double,
    ts: java.sql.Timestamp)
final case class SessionState(start: Long, end: Long, n: Long, vsum: Double)
final case class Session(user_id: Long, session_start: Long,
    session_end: Long, n_events: Long, v_sum: Double)
final case class UpEvent(user_id: Long, event_type: String, t: Long,
    event_id: Long, value: Double)
final case class UpLatest(user_id: Long, event_type: String, t: Long,
    last_event_id: Long, last_value: Double)
final case class GapEvent(user_id: Long, t: Long, event_id: Long,
    value: Double, ts: java.sql.Timestamp)
final case class GapState(lastT: Long)
final case class GapRow(user_id: Long, t: Long, event_id: Option[Long],
    value: Option[Double], is_fill: Boolean)
final case class BandDoc(doc_id: Long, band_idx: Int, sig: Long)
final case class QuantileEvent(event_type: String, coin: Long, pay: Long)
/** Streaming quantile-sketch state: the bottom-k (coin, pay, count)
  * triples flattened, plus the running row count — at most 3k+1 longs
  * per key, independent of stream length. */
final case class QuantileSketchState(flat: Array[Long], nSeen: Long)
final case class QuantileUpdate(event_type: String, n_seen: Long,
    n_sample: Long, p50: Double, p95: Double)
final case class TopKEvent(event_type: String, event_id: Long, value: Double)
/** Streaming top-k state: the current best (event_id, value) pairs —
  * exactly k rows per key once warm, never more. */
final case class TopKState(ids: Array[Long], vs: Array[Double])
final case class TopKRow(event_type: String, rnk: Long, event_id: Long,
    value: Double)
final case class KmvEvent(event_type: String, hv: Long)
/** Streaming KMV state: the k smallest distinct hash values (sorted)
  * plus the running row count — at most k+1 longs per key, independent
  * of stream length and of the key's true cardinality. */
final case class KmvState(flat: Array[Long], nSeen: Long)
final case class DistinctUpdate(event_type: String, n_seen: Long,
    n_sketch: Long, est_users: Double)
/** Per-(doc, band) dedup verdict: `owner_id` is the bucket's owning doc —
  * equal to `doc_id` when this doc owns the bucket, a lower/earlier doc id
  * when the bucket already had a near-duplicate. */
final case class BandVerdict(doc_id: Long, band_idx: Int, owner_id: Long)
final case class VecBand(vec_id: Long, band_idx: Int, sig: Long)
/** A streamed doc's band joined against the static corpus signature
  * store: `c_id` is one standing-corpus doc sharing the band (None when
  * the bucket is corpus-fresh). */
final case class BandHit(doc_id: Long, band_idx: Int, sig: Long,
    c_id: Option[Long])
/** Per-(doc, band) incremental-ingest verdict: `owner_id` is the
  * within-stream first-arrival owner, `corpus_dup` the lowest
  * standing-corpus doc sharing this band (None = corpus-fresh). */
final case class IncVerdict(doc_id: Long, band_idx: Int, owner_id: Long,
    corpus_dup: Option[Long])
/** Per-(vector, band) dedup verdict — the embedding analog of
  * [[BandVerdict]]. */
final case class VecVerdict(vec_id: Long, band_idx: Int, owner_id: Long)
final case class FreqEvent(event_type: String, bin: Long)
final case class ProfEvent(event_type: String, value: Option[Double],
    hv: Long)
/** Streaming profile state: five scalars + the ≤ k KMV hashes — bounded
  * by the sketch width, never by stream length. */
final case class ProfState(n: Long, nNull: Long, vmin: Option[Double],
    vmax: Option[Double], sumE4: Long, hashes: Array[Long])
final case class ProfileUpdate(event_type: String, n: Long, n_null: Long,
    vmin: Option[Double], vmax: Option[Double], sum_e4: Option[Long],
    est_users: Double)
/** Streaming Misra-Gries state: ≤ k (item, counter) pairs — bounded by
  * the sketch width, never by stream length or key cardinality. */
final case class FreqState(items: Array[Long], counts: Array[Long],
    nSeen: Long)
final case class TransEvent(user_id: Long, t: Long, event_id: Long,
  event_type: String)
final case class TransState(t: Long, event_id: Long, event_type: String)
final case class TransStep(user_id: Long, from_type: String,
  to_type: String)
final case class FreqUpdate(event_type: String, n_seen: Long,
    n_tracked: Long, candidates: Array[Long])
final case class AnomEvent(event_type: String, day: Long, event_id: Long,
  e4: Long, value: Double)
/** Per-type prequential state: integer moments of all COMPLETED days
  * (`hist*`) plus the currently accumulating day (`cur*`). Σe4² is held
  * exactly in two longs base 10¹⁸ (`hi`·10¹⁸ + `lo`) — a fixed 4-long
  * footprint per type that never loses a bit at any stream length. */
/** Post-warmup completed-day emission of [[StreamingAgg.cusumStream]]:
  * `cusum_stat` = Σ(value − warmup mean) in value units over the
  * completed days since warmup. */
final case class CusumRow(event_type: String, day: Long, n_days: Long,
    cusum_stat: Double)
/** Nine longs per event type: completed-warmup-day count, warmup
  * totals (events, Σe4), post-warmup running totals (days, events,
  * Σe4 — both monotone non-negative, so no signed two-long dance), and
  * the accumulating day's (day, count, Σe4). */
final case class CusumState(warmDays: Long, wN: Long, wS: Long,
    nAfter: Long, cdn: Long, cds: Long,
    curDay: Long, curDn: Long, curDs: Long)
/** Completed-day step emission of [[StreamingAgg.dayMoversStream]]. */
final case class MoverRow(event_type: String, day: Long,
    prev_day_sum: Double, day_sum: Double, delta: Double)
/** Four longs per event type: the last COMPLETED day's (day, sum) and
  * the currently-accumulating day's (day, sum). */
final case class MoverState(prevDay: Long, prevSum: Long,
    curDay: Long, curSum: Long)
/** Completed-day emission of [[StreamingAgg.seasonalityStream]]:
  * the day's own totals plus the running so-far profile of its
  * day-of-week slot (dow = epoch-day % 7, as the batch twin). */
final case class SeasonRow(event_type: String, day: Long, dow: Long,
    n_day: Long, day_sum: Double, dow_n: Long, dow_avg: Double)
/** 7+7+3 longs per event type: per-dow completed (count, Σe4) plus the
  * accumulating day — fixed footprint at any stream length. */
final case class SeasonState(n: Seq[Long], s: Seq[Long],
    curDay: Long, curDn: Long, curDs: Long)
/** Completed-day emission of [[StreamingAgg.forecastStream]]: the
  * day's actual vs its seasonal-naive (t−7) prediction. */
final case class ForecastRow(event_type: String, day: Long,
    actual: Double, predicted: Double, error: Double)
/** Ring buffer of the last 7 completed days' (day, Σe4) per type plus
  * the accumulating day — 17 longs, fixed at any stream length. */
final case class ForecastState(days: Seq[Long], sums: Seq[Long],
    curDay: Long, curDs: Long)
final case class CohortEv(user_id: Long, day: Long, event_id: Long)
/** First-occurrence activity emission of [[StreamingAgg.cohortStream]]. */
final case class CohortRow(user_id: Long, cohort_day: Long,
    day_offset: Long)
/** Per-user cohort state: the first-arrival day plus a bitmask of seen
  * day offsets (one long per 64 calendar days — CALENDAR-bounded, never
  * stream-length-bounded). */
final case class CohortState(cohortDay: Long, seen: Seq[Long])
final case class AnomState(day: Long, histN: Long, histS1: Long,
  histS2Hi: Long, histS2Lo: Long, curN: Long, curS1: Long,
  curS2Hi: Long, curS2Lo: Long)
final case class AnomRow(event_type: String, day: Long, event_id: Long,
  value: Double, n_prior: Long, z: Double)
final case class FunnelEvent(user_id: Long, t: Long, event_id: Long,
  event_type: String)
/** Per-user funnel chain: the earliest view, the earliest click strictly
  * after it, the earliest purchase strictly after that (-1 = unreached).
  * Three longs per user — bounded by user cardinality, never stream
  * length. */
final case class FunnelState(t1: Long, t2: Long, t3: Long)
final case class FunnelHit(user_id: Long, stage: String, t: Long)
/** Typed event of [[StreamingAgg.gapStream]] — `ts` carries the
  * watermark attribute through to the stateful operator (event-time
  * timeout requires it in the child output). */
final case class GapEv(event_type: String, t: Long, event_id: Long,
    ts: java.sql.Timestamp)
/** One detected cadence gap: it STARTS at the last record before the
  * gap, spans `gap_us`, and the reference's round-half-even rule says
  * gapfill would synthesize `n_missing` records into it. `open` = the
  * gap had not closed when the row emitted: a feed-death page fired at
  * watermark expiry, with gap_us/n_missing measured to the watermark
  * (a lower bound that keeps growing); the closing record, if it ever
  * arrives, still emits the exact closed-gap row. */
final case class GapAlertRow(event_type: String, gap_start_us: Long,
    gap_us: Long, n_missing: Long, open: Boolean)
/** One long of state per type: the latest record time seen. */
final case class GapAlertState(lastT: Long)
final case class DriftVec(label: Long, vec_id: Long, q: Array[Long])
/** Per-label drift state: exact quantized dim sums of the even/odd
  * halves plus their counts — 2·dims + 2 longs per label, independent
  * of stream length. */
final case class DriftState(nEven: Long, nOdd: Long, s0: Array[Long],
  s1: Array[Long])
final case class DriftRow(label: Long, n_even: Long, n_odd: Long,
  drift_cos: Double)
final case class PackDoc(source: String, doc_id: Long, n_tokens: Long)
final case class PackState(offset: Long)
final case class PackRow(source: String, doc_id: Long, n_tokens: Long,
  bin_id: Long, offset_in_bin: Long)

/** Structured-Streaming twins of the batch aggregation operators
  * (SURVEY.md §2 D). The reference is a batch tool; a 100 TB pipeline
  * ingests granules continuously, so the same semantics are exposed over
  * `readStream`: watermarked tumbling-window aggregation and cadence dedup.
  *
  * Both transforms work identically on batch and streaming DataFrames
  * (tested both ways in StreamingSpec); state is bounded by the watermark.
  *
  * MEMORY CONTRACT of the per-event folds (sessionize, gapfill,
  * transitions, gap alerts, funnel, pack, minhash buckets): persisted
  * STATE is O(1)-per-key longs, but each fold buffers and sorts one
  * key's micro-batch slice for deterministic event-time order — so
  * per-(key, trigger) memory is the slice, bounded by
  * [[MaxGroupSliceKey]] and enforced loudly by [[boundedSlice]]. A
  * fleet whose hottest key can exceed the bound in one trigger
  * shortens the trigger or shards the key upstream.
  */
object StreamingAgg {

  /** Conf key for the per-(key, micro-batch) row bound of the
    * per-event folds (default [[DefaultMaxGroupSlice]]): the slice is
    * buffered + sorted in executor heap, so past the bound the fold
    * fails with an actionable error instead of OOMing mid-job. */
  val MaxGroupSliceKey = "spark.graft.streaming.maxGroupSlice"
  val DefaultMaxGroupSlice: Long = 8L * 1024L * 1024L

  private def maxGroupSlice(s: SparkSession): Long =
    s.conf.get(MaxGroupSliceKey, DefaultMaxGroupSlice.toString).toLong

  /** Materialize one key's micro-batch slice under the documented
    * bound, failing LOUDLY past `limit` rows (≈ hundreds of MB of
    * buffered events at the default — an executor-heap hazard, never a
    * wrong answer). */
  private def boundedSlice[T](op: String, key: Any, limit: Long,
      it: Iterator[T])(
      implicit ct: scala.reflect.ClassTag[T]): Array[T] = {
    val buf = scala.collection.mutable.ArrayBuilder.make[T]
    var n = 0L
    while (it.hasNext) {
      n += 1L
      require(n <= limit,
        s"$op: key '$key' contributed more than $limit events to one " +
          "micro-batch; the per-event fold buffers and sorts each " +
          "key's batch slice, so this run risks an executor OOM. " +
          "Shorten the trigger interval, shard the hot key upstream, " +
          s"or raise $MaxGroupSliceKey.")
      buf += it.next()
    }
    buf.result()
  }

  /** Per-day `(day, count, Σe4)` partials of one stateful-fold
    * invocation, day-ascending — the in-fold pre-aggregation that
    * BOUNDS the day-frame monitors' per-key per-batch memory. The
    * monitors' algebra is commutative exact-integer sums, so a hot
    * key's micro-batch collapses in one pass to O(distinct days) live
    * state (calendar-bounded — a day of events is ONE partial) instead
    * of the O(events) array the previous `it.toArray.sortBy`
    * materialized per key. Event order within a day is immaterial to an
    * integer sum, so emissions are bit-identical to the sorted fold;
    * days still process in ascending order. (anomalyStream is the
    * deliberate exception: it emits PER EVENT, so it must materialize
    * its key's batch — its docstring states that bound.) */
  private def dayPartials(it: Iterator[AnomEvent])
      : Array[(Long, Long, Long)] = {
    val m = scala.collection.mutable.LongMap.empty[Array[Long]]
    it.foreach { e =>
      val a = m.getOrElseUpdate(e.day, new Array[Long](2))
      a(0) += 1L
      a(1) += e.e4
    }
    m.iterator.map { case (d, a) => (d, a(0), a(1)) }.toArray.sortBy(_._1)
  }

  /** Tumbling (or, with `slide`, hopping) window per-type aggregation with
    * late-data tolerance. Batch twins: RelationalQueries.qWindowTumbling /
    * qWindowSliding. A slide shorter than the window multiplies rows into
    * the overlapping buckets via Expand BEFORE map-side combine, so state
    * and shuffle stay one row per (window, type). */
  def windowedCounts(events: DataFrame, windowDur: String = "6 hours",
      watermark: String = "10 minutes",
      slide: Option[String] = None): DataFrame =
    events
      .withColumn("ts", col("ts").cast(TimestampType))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slide.getOrElse(windowDur)),
        col("event_type"))
      // decimal-exact sum cast to double once: order-independent, so batch
      // and streaming (and the DuckDB oracle) agree bit-for-bit
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * lit(10000.0) + lit(0.5)).cast(LongType)
          .cast(DecimalType(38, 0))).cast(DoubleType) / lit(10000.0))
          .as("v_sum"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("v_sum"))

  /** Stream-static enrichment: join the event stream to a dimension table
    * (broadcast — a dim is scale-invariant or pre-bucketed) and aggregate
    * per tumbling window and dim attribute. The static side is re-read per
    * microbatch by Structured Streaming, so a slowly-changing dim is picked
    * up without restarting the query. Batch twin: the registry's
    * `stream_enrich` entry (same transform on the batch frame). */
  def enrichedWindowedCounts(events: DataFrame, dim: DataFrame,
      windowDur: String = "6 hours",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast(TimestampType))
      .withWatermark("ts", watermark)
      .join(broadcast(dim.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), windowDur), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * lit(10000.0) + lit(0.5)).cast(LongType)
          .cast(DecimalType(38, 0))).cast(DoubleType) / lit(10000.0))
          .as("v_sum"))
      .select(col("window.start").as("bucket"), col("c_mktsegment"),
        col("n"), col("v_sum"))

  /** Streaming cadence dedup: keep one record per nominal-cadence bucket,
    * with state expired by the watermark. Streaming analog of
    * TimeSeriesAggregator.dedupe (the reference's too-close-record drop,
    * /root/reference/ncagg/aggrelist.py:290-292). */
  def cadenceDedup(events: DataFrame, minStepUs: Long,
      watermark: String = "10 minutes", tsCol: String = "ts"): DataFrame =
    events
      .withColumn(tsCol, col(tsCol).cast(TimestampType))
      .withColumn("cadence_bucket",
        expr(s"unix_micros($tsCol) div ${minStepUs}L"))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("cadence_bucket")
      .drop("cadence_bucket")

  /** Stream-stream attribution join: every purchase matched to the same
    * user's view events in the trailing hour. Both sides carry watermarks
    * and the join condition bounds the event-time distance, so Structured
    * Streaming can size the join state (a view is droppable once the
    * watermark passes its time + window; a purchase matches only buffered
    * views) — the canonical bounded-state stream-stream join. The same
    * transform runs on a batch frame (watermark is a no-op there), which
    * is the oracle-checked `stream_attrib` registry entry. */
  def attributionJoin(events: DataFrame, watermark: String = "1 hour")
      : DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"),
        col("ts").cast(TimestampType).as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", watermark)
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").cast(TimestampType).as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", watermark)
    // the bounds must be direct timestamp comparisons with interval
    // arithmetic — that is the shape the streaming analyzer recognizes as
    // a state-watermarkable time-range condition (micros arithmetic would
    // still join correctly but with unbounded state)
    p.join(v, expr(
      """v_user = user_id AND
        |v_ts >= p_ts - INTERVAL 1 HOUR AND v_ts <= p_ts""".stripMargin))
      .select(col("purchase_id"), col("view_id"), col("user_id"),
        unix_micros(col("p_ts")).as("p_t"),
        unix_micros(col("v_ts")).as("v_t"), col("value"))
  }

  /** Streaming upsert compaction (the continuous twin of the batch
    * `q_upsert_latest` CDC query): maintain the latest version of every
    * (user, event_type) key as updates stream in — latest event time wins,
    * ties to the highest event_id, and late out-of-order updates never
    * regress the state. Emits the key's current latest each time it
    * changes (Update output mode). State is one row per live key —
    * bounded by key cardinality, the same bound the compacted table
    * itself has. */
  def upsertLatest(events: DataFrame): Dataset[UpLatest] = {
    val s = events.sparkSession
    import s.implicits._
    val typed = events
      // validity guard before the primitive-field decode: a null
      // ts/key/value row would crash the Encoder, and the reference
      // semantics drop invalid-index records anyway (mirrored in the
      // stream_upsert oracle's WHERE)
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull && col("event_id").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id").cast(LongType).as("user_id"),
        col("event_type"),
        // explicit LTZ cast: the SQL-string form "CAST(ts AS TIMESTAMP)"
        // resolves to NTZ under spark.sql.timestampType=TIMESTAMP_NTZ and
        // unix_micros rejects it
        unix_micros(col("ts").cast(TimestampType)).as("t"),
        col("event_id").cast(LongType).as("event_id"),
        col("value").cast(DoubleType).as("value"))
      .as[UpEvent]
    typed.groupByKey(e => (e.user_id, e.event_type))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
        (k: (Long, String), it: Iterator[UpEvent],
            st: GroupState[UpLatest]) => {
          // streamed max fold: O(1) memory regardless of slice size —
          // no buffering, so no slice bound needed here
          var best = st.getOption.orNull
          it.foreach { e =>
            if (best == null || e.t > best.t ||
                (e.t == best.t && e.event_id > best.last_event_id))
              best = UpLatest(k._1, k._2, e.t, e.event_id, e.value)
          }
          st.update(best)
          best
        })
  }

  /** Streaming cadence gap-fill — the continuous twin of the reference's
    * FillNode insertion (aggrelist.py:294-303, generalized per key): as a
    * user's events stream in, any gap wider than gapUs between consecutive
    * events is filled with synthetic records at the nominal cadence
    * (`prev.t + k*nomUs`, k = 1..round_half_even(gap/nom)-1 — identical
    * arithmetic
    * to the batch TimeSeriesAggregator fill emitter and the reference's
    * round((gap - dt_nom) * hz), aggregator.py:170-172). Real rows pass
    * through with is_fill=false; fills carry null id/value.
    *
    * State is one long (the key's last event time) — constant per active
    * key regardless of throughput. Fills for a gap are emitted when the
    * gap-closing event arrives, so no timeout is needed; an open trailing
    * gap has no fill target yet, exactly like the batch emitter's interior
    * fills. The same transform folds a batch frame in one pass per key
    * (each group's iterator against empty state) — that batch run is the
    * oracle-checked `stream_gapfill` registry entry. */
  def gapFillStream(events: DataFrame, nomUs: Long, gapUs: Long,
      watermark: String = "30 minutes"): Dataset[GapRow] = {
    val s = events.sparkSession
    import s.implicits._
    val sliceLimit = maxGroupSlice(s)
    val typed = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_id").isNotNull && col("value").isNotNull)
      .withColumn("ts", col("ts").cast(TimestampType))
      .withWatermark("ts", watermark)
      .select(col("user_id").cast(LongType).as("user_id"),
        expr("unix_micros(ts)").as("t"),
        col("event_id").cast(LongType).as("event_id"),
        col("value").cast(DoubleType).as("value"), col("ts"))
      .filter(col("t") > 0L)
      .as[GapEvent]
    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (uid: Long, it: Iterator[GapEvent], st: GroupState[GapState]) => {
          // event-time order makes the fold deterministic within a batch
          val evs = boundedSlice("gapFillStream", uid, sliceLimit, it)
            .sortBy(e => (e.t, e.event_id))
          val out = Seq.newBuilder[GapRow]
          var last = st.getOption.map(_.lastT)
          evs.foreach { e =>
            last match {
              case Some(lt) if e.t > lt =>
                val gap = e.t - lt
                if (gap > gapUs) {
                  var k = 1L
                  val n = TimeSeriesAggregator.fillCount(gap, nomUs)
                  while (k <= n) {
                    out += GapRow(uid, lt + k * nomUs, None, None,
                      is_fill = true)
                    k += 1
                  }
                }
              case _ => // first event, or a late arrival: no retro-fill
            }
            out += GapRow(uid, e.t, Some(e.event_id), Some(e.value),
              is_fill = false)
            last = Some(math.max(last.getOrElse(Long.MinValue), e.t))
          }
          last.foreach(lt => st.update(GapState(lt)))
          out.result().iterator
        })
  }

  /** Streaming sessionization with custom per-key state
    * (`flatMapGroupsWithState` + event-time timeout): the streaming analog
    * of the batch gap-detection sessionizer (AggQueries.qAggSessionize, the
    * generalization of the reference's gap handling, aggrelist.py:294-303).
    *
    * A session is a maximal run of a user's events with no gap wider than
    * gapUs. Closed sessions are emitted as soon as a gap-crossing event
    * arrives; the trailing open session is emitted when the watermark
    * passes its end + gap (event-time timeout), so state is bounded: one
    * in-flight session per active user, expired deterministically.
    *
    * Scale: state is partitioned by user across executors; each group's
    * per-batch work is O(events in batch) after an in-batch sort. Event
    * times are integer epoch-micros (SURVEY.md §3). */
  def sessionize(events: DataFrame, gapUs: Long,
      watermark: String = "30 minutes"): Dataset[Session] = {
    val s = events.sparkSession
    import s.implicits._
    val sliceLimit = maxGroupSlice(s)
    val typed = events
      .withColumn("ts", col("ts").cast(TimestampType))
      .withWatermark("ts", watermark)
      .select(col("user_id").cast(LongType).as("user_id"),
        expr("unix_micros(ts)").as("t"),
        col("value").cast(DoubleType).as("value"), col("ts"))
      .as[SessionEvent]
    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(
        (uid: Long, it: Iterator[SessionEvent],
            st: GroupState[SessionState]) => {
          if (st.hasTimedOut) {
            // watermark passed end + gap: no further event can extend it
            val fin = st.get
            st.remove()
            Iterator(Session(uid, fin.start, fin.end, fin.n, fin.vsum))
          } else {
            // arrival order within a batch is arbitrary; event-time order
            // makes the fold deterministic
            val evs = boundedSlice("sessionize", uid, sliceLimit, it)
              .sortBy(_.t)
            val closed = Seq.newBuilder[Session]
            var cur = st.getOption
            evs.foreach { e =>
              cur match {
                case Some(ses) if e.t >= ses.start - gapUs &&
                    e.t - ses.end <= gapUs =>
                  // merge only when the event is within gap of the session
                  // INTERVAL — `e.t - ses.end <= gapUs` alone is trivially
                  // true for any out-of-order event. min() on start: a late
                  // in-gap event may precede the current start (batch twin
                  // uses min(t))
                  cur = Some(SessionState(math.min(ses.start, e.t),
                    math.max(ses.end, e.t), ses.n + 1, ses.vsum + e.value))
                case Some(ses) if e.t < ses.start =>
                  // late event more than gap BEFORE the session: it belongs
                  // to an earlier, already-elapsed session — emit it as its
                  // own closed session, keep the current one open
                  closed += Session(uid, e.t, e.t, 1L, e.value)
                case Some(ses) =>
                  closed += Session(uid, ses.start, ses.end, ses.n, ses.vsum)
                  cur = Some(SessionState(e.t, e.t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(e.t, e.t, 1L, e.value))
              }
            }
            cur.foreach { ses =>
              st.update(ses)
              st.setTimeoutTimestamp(math.max((ses.end + gapUs) / 1000L,
                st.getCurrentWatermarkMs() + 1L))
            }
            closed.result().iterator
          }
        })
  }

  /** Streaming MinHash near-dup dedup — the continuous twin of
    * `d_minhash_lsh`: each document's 8 LSH band signatures probe a
    * STATEFUL bucket store (`flatMapGroupsWithState` keyed by
    * (band_idx, sig)), so a near-duplicate arriving in a LATER batch
    * still collides with the bucket its earlier twin opened. One
    * [[BandVerdict]] row per (doc, band): `owner_id == doc_id` marks
    * bucket ownership; a later arrival inherits the earlier owner. The
    * consumer drops a doc whose buckets name any foreign owner (see the
    * `stream_minhash_dedup` registry twin).
    *
    * Determinism: a bucket's owner is its FIRST-ARRIVAL min doc_id and
    * never changes — identical to batch (one fold, min id) when ids
    * ascend with arrival time; when they don't, a late lower-id doc
    * reports the existing owner, so the collision is still detectable
    * (owner != doc_id) rather than silently keeping both sides as a
    * retroactive-min would (the earlier doc's verdict is already
    * emitted and Append output cannot retract).
    *
    * Scale shape: state per DISTINCT occupied bucket is one Long — the
    * store grows with corpus novelty, not corpus size, and buckets
    * partition across executors by hash of (band_idx, sig). No watermark
    * timeout: dedup history must be unbounded by design (a duplicate of
    * a year-old doc is still a duplicate); at fleet scale the store is
    * RocksDB-backed and the operator's state column family compacts to
    * |buckets|·16 bytes. */
  def minhashDedupStream(docs: DataFrame): Dataset[BandVerdict] = {
    val s = docs.sparkSession
    graft.functions.native.register(s)
    import s.implicits._
    val sliceLimit = maxGroupSlice(s)
    docs
      .select(col("doc_id").cast(LongType).as("doc_id"),
        expr("graft_tokens(text)").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        posexplode(expr(
          "graft_minhash_bands(graft_shingles(graft_token_hashes(toks)))"))
          .as(Seq("band_idx", "sig")))
      .as[BandDoc]
      .groupByKey(bd => (bd.band_idx, bd.sig))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (key: (Int, Long), it: Iterator[BandDoc],
            st: GroupState[Long]) => {
          val ids = boundedSlice("minhashDedupStream", key, sliceLimit,
            it.map(_.doc_id))
          // FIRST-ARRIVAL ownership: once a bucket has an owner it never
          // changes. When ids ascend with arrival (the documented
          // regime) this equals min-id ownership, matching the batch
          // twin. When a LOWER id arrives in a LATER batch than its
          // near-duplicate, it still reports the existing owner — the
          // collision stays detectable (owner != doc_id → drop) instead
          // of the silent keep-both a retroactive min would produce,
          // because the earlier doc's owner-of-self verdict is already
          // emitted and Append output cannot retract it.
          val owner = st.getOption.getOrElse(ids.min)
          st.update(owner)
          ids.iterator.map(d => BandVerdict(d, key._1, owner))
        })
  }

  /** Continuous incremental-ingest dedup — the streaming twin of
    * [[graft.queries.PipelineQueries.dIncrementalDedup]]: new documents
    * stream in forever and each must be adjudicated against BOTH the
    * standing corpus and the stream so far. The corpus side is the
    * PERSISTED band-signature store (a static frame); the within-stream
    * side is the same first-arrival bucket state as
    * [[minhashDedupStream]].
    *
    * STORE REFRESH CONTRACT (probed empirically, spec-pinned): the
    * static side's file listing is resolved when the query STARTS —
    * Spark re-executes the join per micro-batch but never re-lists, so
    * a store rewritten under a running stream fails the next batch
    * loudly (FILE_NOT_EXIST on the vanished parts; `refreshByPath`
    * cannot reach the running plan's captured relation) — never
    * silently stale. The refresh protocol is a checkpointed RESTART:
    * stop, swap the store, start the same pipeline on the same
    * checkpoint — the bucket-owner state lives in the checkpoint, so
    * ownership survives and the next batch adjudicates against the new
    * store with no state surgery and no reprocessing. The bucket's corpus owner is recomputed
    * from the replayed join rows every batch — deliberately NOT stored,
    * so state stays one long per occupied bucket (grows with distinct
    * stream content, never with corpus size or stream length). Batch
    * run of this same transform IS the oracle-checked registry entry
    * (`stream_incremental_dedup`), where first-arrival == min-id
    * ownership. */
  def incrementalDedupStream(docs: DataFrame, store: DataFrame)
      : Dataset[IncVerdict] = {
    val s = docs.sparkSession
    graft.functions.native.register(s)
    import s.implicits._
    val sliceLimit = maxGroupSlice(s)
    val corpus = store.select(col("doc_id").cast(LongType).as("c_id"),
      col("band_idx"), col("sig"))
    docs
      .select(col("doc_id").cast(LongType).as("doc_id"),
        expr("graft_tokens(text)").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        posexplode(expr(
          "graft_minhash_bands(graft_shingles(graft_token_hashes(toks)))"))
          .as(Seq("band_idx", "sig")))
      .join(corpus, Seq("band_idx", "sig"), "left")
      .select(col("doc_id"), col("band_idx"), col("sig"), col("c_id"))
      .as[BandHit]
      .groupByKey(h => (h.band_idx, h.sig))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (key: (Int, Long), it: Iterator[BandHit],
            st: GroupState[Long]) => {
          val rows = boundedSlice("incrementalDedupStream", key,
            sliceLimit, it)
          // every corpus match replays through the static join each
          // batch, so the bucket's corpus owner needs no state
          val corpusMin = rows.iterator.flatMap(_.c_id)
            .reduceOption(_ min _)
          val ids = rows.map(_.doc_id).distinct
          val owner = st.getOption.getOrElse(ids.min)
          st.update(owner)
          ids.iterator.map(d => IncVerdict(d, key._1, owner, corpusMin))
        })
  }

  /** Continuous embedding near-dup dedup — the vector analog of
    * [[minhashDedupStream]]: each vector's 40-plane signed-projection
    * signature (the same `LshSig` kernel as the batch banded near-dup)
    * splits into two 20-bit bands, and each (band, bits) bucket keeps a
    * FIRST-ARRIVAL owner in state — a vector landing in an occupied
    * bucket reports the existing owner (20 agreeing hyperplanes is
    * strong near-dup evidence; an 8-bit band would collide on merely
    * similar vectors). Band width is FIXED here, unlike the batch
    * [[graft.queries.PipelineQueries.dEmbedNeardup]]'s corpus-scaled B:
    * streaming ownership must stay stable for the stream's whole life,
    * and re-banding a standing state is a rebuild, not a fold. State is
    * one long per occupied bucket — grows with distinct content, never
    * with stream length (the minhash soak's shape). Batch run of this
    * same transform IS the oracle-checked registry entry
    * (`stream_vec_dedup`): one fold per bucket against empty state,
    * where first-arrival == min-id ownership. */
  def vecDedupStream(emb: DataFrame): Dataset[VecVerdict] = {
    val s = emb.sparkSession
    graft.functions.native.register(s)
    import s.implicits._
    val sig = graft.functions.native.parameterized(s,
      es => graft.functions.native.LshSig(es.head, 40), col("embedding"))
    emb
      .select(col("vec_id").cast(LongType).as("vec_id"), sig.as("__sig"))
      .select(col("vec_id"), posexplode(expr(
        "transform(sequence(0, 1), k -> shiftright(__sig, k * 20) & 1048575L)"))
        .as(Seq("band_idx", "sig")))
      .as[VecBand]
      .groupByKey(vb => (vb.band_idx, vb.sig))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (key: (Int, Long), it: Iterator[VecBand],
            st: GroupState[Long]) => {
          val ids = it.map(_.vec_id).toArray
          // first-arrival ownership; see minhashDedupStream for why a
          // retroactive min would be WORSE under Append output
          val owner = st.getOption.getOrElse(ids.min)
          st.update(owner)
          ids.iterator.map(v => VecVerdict(v, key._1, owner))
        })
  }

  /** Linear interpolation over the sorted micro-unit sample — the EXACT
    * arithmetic of the batch twin's `quantileExpr` (RelationalQueries):
    * the rank position q·(n−1) is computed in BigDecimal because the SQL
    * side computes it in DECIMAL (0.95 is exact in decimal, not in
    * binary); the fraction is cast to double once, then the same
    * (vlo + frac·(vhi−vlo)) / 1e6 double ops in the same order. */
  private def interpMicro(v: Array[Long], q: java.math.BigDecimal): Double = {
    val n = v.length
    val pos = q.multiply(java.math.BigDecimal.valueOf(n - 1L))
    val lo = pos.setScale(0, java.math.RoundingMode.FLOOR)
    val frac = pos.subtract(lo).doubleValue
    val loI = lo.intValueExact
    val vlo = v(loI).toDouble
    val vhi = v(math.min(loI + 1, n - 1)).toDouble
    (vlo + frac * (vhi - vlo)) / 1000000.0
  }

  /** Continuous quantile sketch — the streaming twin of
    * `q_quantile_sketch`: per event_type, a stateful bottom-k-by-hash
    * uniform sample (the SAME fold as the batch
    * [[graft.functions.BottomKByHash]] aggregate, shared via its
    * companion) absorbs each micro-batch and emits the updated
    * (n_seen, n_sample, p50, p95) row. The fold is order-independent —
    * the state after any batch split equals the one-shot batch
    * aggregate — so a dashboard reading the Update stream converges to
    * exactly the batch answer, bit-for-bit (StreamingSpec pins parity
    * and a non-chronological split).
    *
    * Scale shape: state is ≤ 3k+1 longs per key (k·24 B + 8 — bounded
    * by the SKETCH size, never the stream length); arrivals above the
    * current bucket max are rejected with one comparison, so steady-
    * state per-row cost is O(1). NoTimeout by design: a running
    * quantile over all history has no expirable state (windowed
    * variants would add the watermark like `windowedCounts`). Batch
    * run of this same transform IS the oracle-checked registry entry
    * (`stream_quantile`). */
  def quantileSketchStream(events: DataFrame, k: Int = 1024): Dataset[QuantileUpdate] = {
    val s = events.sparkSession
    import s.implicits._
    val half = new java.math.BigDecimal("0.5")
    val p95 = new java.math.BigDecimal("0.95")
    events
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("(event_id % 1000000007) * 2654435761 % 1000000007").as("coin"),
        expr("CAST(floor(value * 1000000) AS BIGINT)").as("pay"))
      .as[QuantileEvent]
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
        (key: String, it: Iterator[QuantileEvent],
            st: GroupState[QuantileSketchState]) => {
          val buf = new graft.functions.BottomKBuffer
          var nSeen = 0L
          st.getOption.foreach { prev =>
            var i = 0
            while (i < prev.flat.length) {
              buf.map.put((prev.flat(i), prev.flat(i + 1)), prev.flat(i + 2))
              buf.total += prev.flat(i + 2)
              i += 3
            }
            nSeen = prev.nSeen
          }
          it.foreach { e =>
            nSeen += 1
            graft.functions.BottomKByHash.add(buf, k, e.coin, e.pay, 1L)
          }
          val flat = new Array[Long](buf.map.size * 3)
          val pays = new Array[Long](buf.total.toInt)
          var i = 0
          var j = 0
          val entries = buf.map.entrySet().iterator()
          while (entries.hasNext) {
            val e = entries.next()
            flat(i) = e.getKey._1; flat(i + 1) = e.getKey._2
            flat(i + 2) = e.getValue
            i += 3
            var c = e.getValue
            while (c > 0) { pays(j) = e.getKey._2; j += 1; c -= 1 }
          }
          st.update(QuantileSketchState(flat, nSeen))
          java.util.Arrays.sort(pays)
          QuantileUpdate(key, nSeen, pays.length.toLong,
            interpMicro(pays, half), interpMicro(pays, p95))
        })
  }

  /** Continuous top-k — the streaming twin of `q_topk`'s keyed leaders
    * board: per event_type, the state is EXACTLY the current top-k
    * (event_id, value) pairs under (value desc, event_id asc), and each
    * micro-batch folds its arrivals in and re-emits the full board
    * (rnk 1..k). The max-k fold is order-independent — the best k of a
    * union don't depend on the batch split — so the Update stream
    * converges to exactly the batch answer (StreamingSpec pins parity
    * and a non-chronological split).
    *
    * Scale shape: state is ≤ k (long, double) pairs per key; an arrival
    * below the current cutoff costs one comparison. NoTimeout by
    * design: an all-history leaders board has no expirable state.
    * Batch run of this same transform IS the oracle-checked registry
    * entry (`stream_topk`). */
  def topKStream(events: DataFrame, k: Int = 5): Dataset[TopKRow] = {
    val s = events.sparkSession
    import s.implicits._
    // total order: value desc, then event_id asc (deterministic ties)
    val ord = new Ordering[(Long, Double)] {
      def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val c = java.lang.Double.compare(b._2, a._2)
        if (c != 0) c else java.lang.Long.compare(a._1, b._1)
      }
    }
    events
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        col("value").cast("double").as("value"))
      .as[TopKEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(
        (key: String, it: Iterator[TopKEvent],
            st: GroupState[TopKState]) => {
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
          st.getOption.foreach { prev =>
            var i = 0
            while (i < prev.ids.length) {
              buf += ((prev.ids(i), prev.vs(i))); i += 1
            }
          }
          it.foreach { e =>
            // O(1) reject below the warm board's cutoff
            if (buf.length < k || ord.compare((e.event_id, e.value),
                buf.last) < 0) {
              buf += ((e.event_id, e.value))
              val kept = buf.sorted(ord).take(k)
              buf.clear()
              buf ++= kept
            }
          }
          val top = buf.sorted(ord).take(k)
          st.update(TopKState(top.map(_._1).toArray, top.map(_._2).toArray))
          top.iterator.zipWithIndex.map { case ((id, v), i) =>
            TopKRow(key, (i + 1).toLong, id, v)
          }
        })
  }

  /** Continuous distinct-count sketch — the streaming twin of
    * `q_approx_distinct`: per event_type, a stateful KMV sketch (the
    * SAME k-minimum-distinct-hash fold as the batch
    * [[graft.functions.KmvDistinct]] aggregate and the same estimator
    * `(k−1)·P / kthMin`) absorbs each micro-batch and re-emits
    * (n_seen, n_sketch, est_users). The fold is order-independent —
    * the k smallest distinct hashes of a union don't depend on the
    * batch split — so the Update stream converges to exactly the batch
    * answer, bit-for-bit (StreamingSpec pins parity and a
    * non-chronological split).
    *
    * Scale shape: state is ≤ k+1 longs per key — bounded by the SKETCH
    * size, never by the stream length or the key's true cardinality;
    * a duplicate or above-max arrival costs one TreeSet probe.
    * NoTimeout by design: a running all-history distinct count has no
    * expirable state. Batch run of this same transform IS the
    * oracle-checked registry entry (`stream_distinct`). */
  def kmvDistinctStream(events: DataFrame, k: Int = 64): Dataset[DistinctUpdate] = {
    val s = events.sparkSession
    import s.implicits._
    val p = graft.functions.NativeOps.P
    events
      .filter(col("user_id").isNotNull)
      .select(col("event_type"),
        expr(s"(user_id % $p) * 2654435761 % $p").as("hv"))
      .as[KmvEvent]
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
        (key: String, it: Iterator[KmvEvent],
            st: GroupState[KmvState]) => {
          val buf = new java.util.TreeSet[java.lang.Long]()
          var nSeen = 0L
          st.getOption.foreach { prev =>
            prev.flat.foreach(h => buf.add(h): Unit)
            nSeen = prev.nSeen
          }
          it.foreach { e =>
            nSeen += 1
            buf.add(e.hv)
            if (buf.size > k) buf.pollLast(): Unit
          }
          val flat = new Array[Long](buf.size)
          val bit = buf.iterator()
          var i = 0
          while (bit.hasNext) { flat(i) = bit.next(); i += 1 }
          st.update(KmvState(flat, nSeen))
          val est =
            if (buf.size < k) buf.size.toDouble
            else (k - 1).toDouble * p.toDouble / buf.last().toDouble
          DistinctUpdate(key, nSeen, buf.size.toLong, est)
        })
  }

  /** Continuous Misra-Gries frequent-items tracking per key — the
    * streaming face of `stream_heavy_hitters`. State is one bounded
    * ≤ k-counter MG summary per key ([[graft.functions.MisraGries]]'s
    * shared fold — the same code the batch aggregate runs), so state
    * grows with the sketch width, never with stream length or item
    * cardinality. Each batch re-emits the current sorted candidate
    * set; by the mergeable-summaries undercount bound (≤ n_seen/(k+1))
    * the candidates are a guaranteed superset of every item with
    * frequency > n_seen/(k+1) at EVERY prefix, under any batch split —
    * the invariant StreamingSpec pins. The MG fold is not
    * order-independent in its candidate SET, so the oracle-checked
    * registry entry is the verified exact output (see
    * RelationalQueries.streamHeavyHitters), not this transform's raw
    * emission. NoTimeout by design: an all-history frequency summary
    * has no expirable state. */
  def frequentStream(events: DataFrame, k: Int = 127): Dataset[FreqUpdate] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("CAST(floor(value) AS BIGINT)").as("bin"))
      .as[FreqEvent]
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
        (key: String, it: Iterator[FreqEvent],
            st: GroupState[FreqState]) => {
          val map = new java.util.HashMap[Long, Long]
          var nSeen = 0L
          st.getOption.foreach { prev =>
            var i = 0
            while (i < prev.items.length) {
              map.put(prev.items(i), prev.counts(i)); i += 1
            }
            nSeen = prev.nSeen
          }
          it.foreach { e =>
            nSeen += 1
            graft.functions.MisraGries.add(map, k, e.bin, 1L)
          }
          val items = new Array[Long](map.size)
          val counts = new Array[Long](map.size)
          var i = 0
          val mit = map.entrySet().iterator()
          while (mit.hasNext) {
            val e = mit.next()
            items(i) = e.getKey; counts(i) = e.getValue; i += 1
          }
          st.update(FreqState(items, counts, nSeen))
          FreqUpdate(key, nSeen, map.size.toLong,
            graft.functions.MisraGries.sortedKeys(map))
        })
  }

  /** Continuous table profiling — the streaming twin of `q_profile`:
    * each micro-batch folds arrivals into per-key running stats (rows,
    * measure nulls, min/max, integer-exact sum) plus the bounded KMV
    * distinct-user sketch, and re-emits the current profile. Every
    * component fold is ORDER-INDEPENDENT (count/min/max/integer sum are
    * commutative-associative; KMV keeps the k smallest distinct hashes
    * regardless of arrival order), so the stream converges to EXACTLY
    * the batch profile under any batch split — the parity StreamingSpec
    * pins. State is five scalars + ≤ k hashes per key, bounded by the
    * sketch width. The sum folds floor(value·1e4 + 0.5) as a Long — the
    * identical IEEE sequence the batch aggregate and the DuckDB oracle
    * evaluate, so no double-accumulation drift exists to diverge on.
    * NoTimeout by design: an all-history profile has no expirable
    * state. Batch run of this same transform is the oracle-checked
    * registry entry (`stream_profile`, same oracle family as
    * q_profile). */
  def profileStream(events: DataFrame, k: Int = 64): Dataset[ProfileUpdate] = {
    val s = events.sparkSession
    import s.implicits._
    val p = graft.functions.NativeOps.P
    events
      .select(col("event_type"), col("value"),
        expr(s"(user_id % $p) * 2654435761 % $p").as("hv"))
      .as[ProfEvent]
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
        (key: String, it: Iterator[ProfEvent],
            st: GroupState[ProfState]) => {
          val buf = new java.util.TreeSet[java.lang.Long]()
          var n = 0L; var nNull = 0L; var sumE4 = 0L
          var vmin = Double.NaN; var vmax = Double.NaN
          st.getOption.foreach { prev =>
            prev.hashes.foreach(h => buf.add(h): Unit)
            n = prev.n; nNull = prev.nNull; sumE4 = prev.sumE4
            prev.vmin.foreach(vmin = _); prev.vmax.foreach(vmax = _)
          }
          it.foreach { e =>
            n += 1
            buf.add(e.hv)
            if (buf.size > k) buf.pollLast(): Unit
            e.value match {
              case Some(v) =>
                if (vmin.isNaN || v < vmin) vmin = v
                if (vmax.isNaN || v > vmax) vmax = v
                sumE4 += math.floor(v * 10000.0 + 0.5).toLong
              case None => nNull += 1
            }
          }
          val flat = new Array[Long](buf.size)
          val bit = buf.iterator()
          var i = 0
          while (bit.hasNext) { flat(i) = bit.next(); i += 1 }
          val mn = if (vmin.isNaN) None else Some(vmin)
          val mx = if (vmax.isNaN) None else Some(vmax)
          st.update(ProfState(n, nNull, mn, mx, sumE4, flat))
          val est =
            if (buf.size < k) buf.size.toDouble
            else (k - 1).toDouble * p.toDouble / buf.last().toDouble
          ProfileUpdate(key, n, nNull, mn, mx,
            if (n > nNull) Some(sumE4) else None, est)
        })
  }

  /** Continuous event-type transition counting — the streaming twin of
    * the batch q_transitions Markov-step query: state per user is the
    * LAST seen event; each micro-batch sorts its slice by (event time,
    * event_id) and emits one (from → to) step per consecutive pair,
    * chaining across batches through the stored last event, so the
    * transition matrix accumulates incrementally instead of re-windowing
    * the whole history per refresh. State is ONE small row per live
    * user — bounded by user cardinality, not stream length. A late
    * arrival (event older than the stored last) chains in processing
    * order, the same first-arrival semantics as the dedup streams; in
    * batch mode (one fold per user over the full sorted history against
    * empty state) the steps equal the lead-window pairs exactly, which
    * is what the oracle checks. */
  def transitionSteps(events: DataFrame): Dataset[TransStep] = {
    val s = events.sparkSession
    import s.implicits._
    val sliceLimit = maxGroupSlice(s)
    val typed = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_id").isNotNull && col("event_type").isNotNull)
      .select(col("user_id").cast(LongType).as("user_id"),
        unix_micros(col("ts").cast(TimestampType)).as("t"),
        col("event_id").cast(LongType).as("event_id"),
        col("event_type"))
      .as[TransEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (uid: Long, it: Iterator[TransEvent], st: GroupState[TransState]) => {
          val evs = boundedSlice("transitionSteps", uid, sliceLimit, it)
            .sortBy(e => (e.t, e.event_id))
          val out = Seq.newBuilder[TransStep]
          var prev = st.getOption
          evs.foreach { e =>
            prev.foreach(p => out += TransStep(uid, p.event_type,
              e.event_type))
            prev = Some(TransState(e.t, e.event_id, e.event_type))
          }
          prev.foreach(st.update)
          out.result().iterator
        })
  }

  /** Streaming day-over-day movers — the live face of
    * [[graft.queries.RelationalQueries.qTopMovers]]' step detector:
    * when a day COMPLETES (the first strictly-later event of its type
    * arrives), emit that day's level step against the previous day —
    * consecutive days only, exactly the batch monitor's rule — instead
    * of re-windowing the day frame per batch. The batch query keeps the
    * single peak step for the dashboard; the stream emits EVERY step as
    * it happens (the alerting feed; a consumer peak-filters at will).
    * State is FOUR longs per event type (last completed day/sum,
    * accumulating day/sum) — independent of stream length. Sums are
    * exact integers at the 1e4 quantization; the emitted doubles divide
    * once, so each step equals the batch lag-frame row bit-for-bit.
    * Events fold in (day, event_id) order per invocation; the trailing
    * day is never emitted (it has not completed — the batch twin's
    * oracle carries the matching `day < max(day)` guard). */
  def dayMoversStream(events: DataFrame): Dataset[MoverRow] = {
    val s = events.sparkSession
    import s.implicits._
    val typed = events
      .filter(col("ts").isNotNull && col("value").isNotNull &&
        col("event_type").isNotNull && col("event_id").isNotNull)
      .withColumn("__t", unix_micros(col("ts").cast(TimestampType)))
      .select(col("event_type"),
        expr("__t div 86400000000").as("day"),
        col("event_id").cast(LongType).as("event_id"),
        expr("CAST(floor(value * 10000.0 + 0.5) AS BIGINT)").as("e4"),
        col("value").cast(DoubleType).as("value"))
      .as[AnomEvent]
    typed.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (typ: String, it: Iterator[AnomEvent],
            st: GroupState[MoverState]) => {
          var cur = st.getOption.getOrElse(
            MoverState(Long.MinValue, 0L, Long.MinValue, 0L))
          val out = Seq.newBuilder[MoverRow]
          dayPartials(it).foreach { case (d, _, s1) =>
            if (cur.curDay == Long.MinValue) cur = cur.copy(curDay = d)
            else if (d > cur.curDay) {
              // the accumulating day completes: emit its step iff the
              // previous COMPLETED day is the calendar day before it
              if (cur.prevDay == cur.curDay - 1L)
                out += MoverRow(typ, cur.curDay,
                  cur.prevSum.toDouble / 10000.0d,
                  cur.curSum.toDouble / 10000.0d,
                  (cur.curSum - cur.prevSum).toDouble / 10000.0d)
              cur = MoverState(cur.curDay, cur.curSum, d, 0L)
            }
            // late partial for an already-completed day: dropped, same
            // guard as the other day-frame monitors
            if (d >= cur.curDay)
              cur = cur.copy(curSum = cur.curSum + s1)
          }
          st.update(cur)
          out.result().iterator
        })
  }

  /** Streaming CUSUM — the prequential face of
    * [[graft.queries.RelationalQueries.qCusum]]'s changepoint monitor,
    * completing the live day-frame trio (anomaly z-score, level step,
    * sustained shift). The batch query localizes a shift
    * RETROSPECTIVELY against the whole-series mean; a stream cannot
    * know future totals, so this is the textbook prequential CUSUM:
    * the reference mean freezes after the first `warmupDays` COMPLETED
    * days, and every later completed day emits the running cumulative
    * deviation from it — a sustained level shift drives the statistic
    * monotonically away from zero, which is the alarm a monitor pages
    * on (threshold deployment-specific; the metric is raw, like
    * drift).
    *
    * Exactness: the deviation Σ(value − μ₀) is computed as the INTEGER
    * `Σds·wN − Σdn·wS` (exact in BigInt at emission; the running
    * post-warmup totals Σds/Σdn are monotone non-negative longs, so
    * state needs no signed two-long split), converted to double once
    * and divided by the exact `wN·10⁴` — the same one-divide discipline
    * as the batch CUSUM, so each emission equals the oracle's
    * HUGEINT-derived row bit-for-bit. Nine longs of state per type,
    * independent of stream length. The micro-batch pre-aggregates to
    * per-day partials (`dayPartials` — O(distinct days) per key, never
    * O(events)) folded day-ascending; late partials for completed days
    * are dropped; the trailing day never emits (it has not
    * completed — the oracle carries the matching `day < max(day)`
    * guard). */
  def cusumStream(events: DataFrame, warmupDays: Long = 7L)
      : Dataset[CusumRow] = {
    val s = events.sparkSession
    import s.implicits._
    val typed = events
      .filter(col("ts").isNotNull && col("value").isNotNull &&
        col("event_type").isNotNull && col("event_id").isNotNull)
      .withColumn("__t", unix_micros(col("ts").cast(TimestampType)))
      .select(col("event_type"),
        expr("__t div 86400000000").as("day"),
        col("event_id").cast(LongType).as("event_id"),
        expr("CAST(floor(value * 10000.0 + 0.5) AS BIGINT)").as("e4"),
        col("value").cast(DoubleType).as("value"))
      .as[AnomEvent]
    typed.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (typ: String, it: Iterator[AnomEvent],
            st: GroupState[CusumState]) => {
          var cur = st.getOption.getOrElse(
            CusumState(0L, 0L, 0L, 0L, 0L, 0L, Long.MinValue, 0L, 0L))
          val out = Seq.newBuilder[CusumRow]
          dayPartials(it).foreach { case (d, n, s1) =>
            if (cur.curDay == Long.MinValue) cur = cur.copy(curDay = d)
            else if (d > cur.curDay) {
              // the accumulating day completes
              if (cur.warmDays < warmupDays)
                cur = cur.copy(warmDays = cur.warmDays + 1L,
                  wN = cur.wN + cur.curDn, wS = cur.wS + cur.curDs,
                  curDay = d, curDn = 0L, curDs = 0L)
              else {
                cur = cur.copy(nAfter = cur.nAfter + 1L,
                  cdn = cur.cdn + cur.curDn, cds = cur.cds + cur.curDs)
                val dev = BigInt(cur.cds) * BigInt(cur.wN) -
                  BigInt(cur.cdn) * BigInt(cur.wS)
                out += CusumRow(typ, cur.curDay, cur.nAfter,
                  BigDecimal(dev).toDouble /
                    (cur.wN.toDouble * 10000.0d))
                cur = cur.copy(curDay = d, curDn = 0L, curDs = 0L)
              }
            }
            // late partial for an already-completed day: dropped (see
            // the day-frame monitors' shared guard)
            if (d >= cur.curDay)
              cur = cur.copy(curDn = cur.curDn + n,
                curDs = cur.curDs + s1)
          }
          st.update(cur)
          out.result().iterator
        })
  }

  /** Streaming day-of-week seasonality — the live face of
    * [[graft.queries.RelationalQueries.qSeasonality]]: each COMPLETED
    * day emits its own totals next to the running profile of its
    * weekday slot so far (count and exact-integer mean), the baseline a
    * live monitor normalizes "is today hot?" against. 17 longs of state
    * per type (7 per-dow counts, 7 per-dow Σe4, the accumulating day) —
    * fixed at any stream length; the trailing day never emits (it has
    * not completed; the oracle carries the matching `day < max(day)`
    * guard). The emitted dow_avg divides two exact integers once in
    * double, so every row equals the oracle's cumulative-window form
    * bit-for-bit when events arrive day-ordered across micro-batches;
    * a late event for an already-COMPLETED day is dropped (the
    * standard streaming late-data caveat — folding it into the current
    * day would corrupt that day's totals instead). */
  def seasonalityStream(events: DataFrame): Dataset[SeasonRow] = {
    val s = events.sparkSession
    import s.implicits._
    val typed = events
      .filter(col("ts").isNotNull && col("value").isNotNull &&
        col("event_type").isNotNull && col("event_id").isNotNull)
      .withColumn("__t", unix_micros(col("ts").cast(TimestampType)))
      .select(col("event_type"),
        expr("__t div 86400000000").as("day"),
        col("event_id").cast(LongType).as("event_id"),
        expr("CAST(floor(value * 10000.0 + 0.5) AS BIGINT)").as("e4"),
        col("value").cast(DoubleType).as("value"))
      .as[AnomEvent]
    typed.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (typ: String, it: Iterator[AnomEvent],
            st: GroupState[SeasonState]) => {
          var cur = st.getOption.getOrElse(SeasonState(
            Seq.fill(7)(0L), Seq.fill(7)(0L), Long.MinValue, 0L, 0L))
          val out = Seq.newBuilder[SeasonRow]
          def complete(nextDay: Long): Unit = {
            // array slot must be non-negative; the EMITTED dow is the
            // sign-following residue so pre-1970 days label identically
            // to the oracle's (and batch qSeasonality's) day % 7 —
            // residue CLASSES agree either way, only the label differs
            val i = ((cur.curDay % 7L + 7L) % 7L).toInt
            val n2 = cur.n.updated(i, cur.n(i) + cur.curDn)
            val s2 = cur.s.updated(i, cur.s(i) + cur.curDs)
            out += SeasonRow(typ, cur.curDay, cur.curDay % 7L, cur.curDn,
              cur.curDs.toDouble / 10000.0d, n2(i),
              s2(i).toDouble / (n2(i).toDouble * 10000.0d))
            cur = SeasonState(n2, s2, nextDay, 0L, 0L)
          }
          dayPartials(it).foreach { case (d, n, s1) =>
            if (cur.curDay == Long.MinValue)
              cur = cur.copy(curDay = d)
            else if (d > cur.curDay) complete(d)
            // a cross-micro-batch late partial for an ALREADY-completed
            // day cannot be folded into the current day without
            // corrupting its emitted totals — drop it (mirrors
            // cohortStream's pre-cohort guard; the standard streaming
            // late-data caveat, stated here rather than silent)
            if (d >= cur.curDay)
              cur = cur.copy(curDn = cur.curDn + n,
                curDs = cur.curDs + s1)
          }
          st.update(cur)
          out.result().iterator
        })
  }

  /** Streaming seasonal-naive forecast check — the live face of
    * [[graft.queries.RelationalQueries.qForecast]]: each COMPLETED day
    * whose same-weekday predecessor (day−7) also completed emits
    * actual vs predicted and the signed error — the per-day rows
    * q_forecast's MAE/bias aggregate summarizes, live. State is a ring
    * buffer of the last 7 completed days' (day, Σe4) per type — 17
    * longs, fixed at any stream length; exact integers with one
    * emission-time divide per output column. Gap robustness is
    * structural: the lookup matches day−7 EXACTLY, so a missing week
    * simply emits nothing rather than predicting from the wrong day.
    * Late events for an already-completed day are dropped, not folded
    * into the current day (see [[seasonalityStream]]). */
  def forecastStream(events: DataFrame): Dataset[ForecastRow] = {
    val s = events.sparkSession
    import s.implicits._
    val typed = events
      .filter(col("ts").isNotNull && col("value").isNotNull &&
        col("event_type").isNotNull && col("event_id").isNotNull)
      .withColumn("__t", unix_micros(col("ts").cast(TimestampType)))
      .select(col("event_type"),
        expr("__t div 86400000000").as("day"),
        col("event_id").cast(LongType).as("event_id"),
        expr("CAST(floor(value * 10000.0 + 0.5) AS BIGINT)").as("e4"),
        col("value").cast(DoubleType).as("value"))
      .as[AnomEvent]
    typed.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (typ: String, it: Iterator[AnomEvent],
            st: GroupState[ForecastState]) => {
          var cur = st.getOption.getOrElse(
            ForecastState(Seq.fill(7)(Long.MinValue), Seq.fill(7)(0L),
              Long.MinValue, 0L))
          val out = Seq.newBuilder[ForecastRow]
          def complete(nextDay: Long): Unit = {
            val d = cur.curDay
            val slot = ((d % 7L + 7L) % 7L).toInt
            if (cur.days(slot) == d - 7L) {
              val pred = cur.sums(slot)
              out += ForecastRow(typ, d,
                cur.curDs.toDouble / 10000.0d,
                pred.toDouble / 10000.0d,
                (cur.curDs - pred).toDouble / 10000.0d)
            }
            cur = ForecastState(cur.days.updated(slot, d),
              cur.sums.updated(slot, cur.curDs), nextDay, 0L)
          }
          dayPartials(it).foreach { case (d, _, s1) =>
            if (cur.curDay == Long.MinValue)
              cur = cur.copy(curDay = d)
            else if (d > cur.curDay) complete(d)
            // late partial for an already-completed day: drop rather
            // than misattribute into the current day's sum (see
            // seasonalityStream; cohortStream's off >= 0 is the same
            // guard)
            if (d >= cur.curDay)
              cur = cur.copy(curDs = cur.curDs + s1)
          }
          st.update(cur)
          out.result().iterator
        })
  }

  /** Streaming cohort activity — the live face of
    * [[graft.queries.RelationalQueries.qCohort]]'s DISTINCT frame: one
    * row per (user, day-offset) the FIRST time that offset is seen,
    * keyed by the user's first-arrival day. Downstream retention
    * counting is a plain windowed aggregate over these increments.
    * State per user: the cohort day + a bitmask of seen offsets — one
    * long per 64 CALENDAR days, bounded by history span, never stream
    * length. The standard streaming caveat applies: cohort = first
    * ARRIVAL day (the batch twin's single ordered fold makes that the
    * true minimum, which is what the oracle checks); an event arriving
    * before its user's recorded cohort day is ignored rather than
    * rewriting history. */
  def cohortStream(events: DataFrame): Dataset[CohortRow] = {
    val s = events.sparkSession
    import s.implicits._
    val typed = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_id").isNotNull)
      .withColumn("__t", unix_micros(col("ts").cast(TimestampType)))
      .select(col("user_id").cast(LongType).as("user_id"),
        expr("__t div 86400000000").as("day"),
        col("event_id").cast(LongType).as("event_id"))
      .as[CohortEv]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (uid: Long, it: Iterator[CohortEv],
            st: GroupState[CohortState]) => {
          var cur = st.getOption.getOrElse(CohortState(Long.MinValue, Nil))
          val out = Seq.newBuilder[CohortRow]
          // only the DISTINCT day set matters (first-seen offsets):
          // per-key per-batch memory is O(distinct days), not O(events)
          val days = scala.collection.mutable.SortedSet.empty[Long]
          it.foreach(e => days += e.day)
          days.foreach { d =>
            if (cur.cohortDay == Long.MinValue)
              cur = cur.copy(cohortDay = d)
            val off = d - cur.cohortDay
            if (off >= 0L) {
              val blk = (off / 64L).toInt
              val bit = 1L << (off % 64L)
              val seen = if (blk < cur.seen.size) cur.seen
                else cur.seen ++ Seq.fill(blk + 1 - cur.seen.size)(0L)
              if ((seen(blk) & bit) == 0L) {
                out += CohortRow(uid, cur.cohortDay, off)
                cur = cur.copy(seen = seen.updated(blk, seen(blk) | bit))
              } else if (seen ne cur.seen) cur = cur.copy(seen = seen)
            }
          }
          st.update(cur)
          out.result().iterator
        })
  }

  /** Day-batched prequential anomaly detection — the streaming face of
    * the two-pass z-score monitor: each event is scored against the
    * integer moments of all STRICTLY EARLIER days of its type (today's
    * traffic judged by history through yesterday — the cadence real
    * monitors run on, and the only prequential form with bounded state:
    * 9 scalars per type, independent of stream length).
    *
    * Exactness: moments accumulate as exact integers (Σe4 in a long;
    * Σe4² in two longs base 10¹⁸, folded to a double through BigDecimal
    * — correctly rounded from the exact integer, the same value the
    * batch twin's DECIMAL(38,0)→DOUBLE cast produces), so mean/σ/z
    * derive through the identical IEEE sequence as the batch plan and
    * the streamed rows match it bit-for-bit. Per-row e4² must fit a
    * long (|value| ≲ 3·10⁵ at the 1e4 quantization — the same headroom
    * the batch twin's per-row DECIMAL square has over these tables).
    *
    * Ordering: events are folded in (day, event_id) order within each
    * invocation; a late event from an already-completed day scores
    * against the history as of its ARRIVAL (the standard streaming
    * caveat — the batch twin is the event-time-exact backfill).
    *
    * Memory bound: unlike the summable day-frame monitors (which
    * pre-aggregate to per-day partials — see `dayPartials`), this fold
    * emits PER EVENT, so it materializes its key's micro-batch slice:
    * per-key per-batch memory is O(events of that key in the batch).
    * Shard a pathologically hot event_type upstream (or bound the
    * micro-batch via maxOffsetsPerTrigger-style source limits) exactly
    * as for any per-event stateful emitter. */
  def anomalyStream(events: DataFrame, warmup: Long = 30L)
      : Dataset[AnomRow] = {
    val s = events.sparkSession
    import s.implicits._
    val sliceLimit = maxGroupSlice(s)
    val Base = 1000000000000000000L
    val typed = events
      .filter(col("ts").isNotNull && col("value").isNotNull &&
        col("event_type").isNotNull && col("event_id").isNotNull)
      .withColumn("__t", unix_micros(col("ts").cast(TimestampType)))
      .select(col("event_type"),
        expr("__t div 86400000000").as("day"),
        col("event_id").cast(LongType).as("event_id"),
        expr("CAST(floor(value * 10000.0 + 0.5) AS BIGINT)").as("e4"),
        col("value").cast(DoubleType).as("value"))
      .as[AnomEvent]
    typed.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (typ: String, it: Iterator[AnomEvent], st: GroupState[AnomState]) => {
          var cur = st.getOption.getOrElse(
            AnomState(Long.MinValue, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
          val out = Seq.newBuilder[AnomRow]
          boundedSlice("anomalyStream", typ, sliceLimit, it)
            .sortBy(e => (e.day, e.event_id)).foreach { e =>
            if (cur.day == Long.MinValue) cur = cur.copy(day = e.day)
            else if (e.day > cur.day) {
              // day roll: fold the completed day's moments into history
              var hi = cur.histS2Hi + cur.curS2Hi
              var lo = cur.histS2Lo + cur.curS2Lo
              if (lo >= Base) { lo -= Base; hi += 1L }
              cur = AnomState(e.day, cur.histN + cur.curN,
                cur.histS1 + cur.curS1, hi, lo, 0L, 0L, 0L, 0L)
            }
            if (cur.histN >= warmup) {
              val n = cur.histN.toDouble
              val mu = cur.histS1.toDouble / n
              val s2 = (BigDecimal(cur.histS2Hi) * BigDecimal(Base) +
                BigDecimal(cur.histS2Lo)).toDouble
              val sigma = math.sqrt(s2 / n - mu * mu)
              if (sigma > 0.0d) {
                val z = (e.e4.toDouble - mu) / sigma
                if (math.abs(z) > 4.0d)
                  out += AnomRow(typ, e.day, e.event_id, e.value,
                    cur.histN, z)
              }
            }
            // split the square FIRST: e4² can be ~9·10¹⁸ (close to
            // Long.MaxValue), so adding it to a lo of up to 10¹⁸−1
            // before carrying would overflow; rem < 10¹⁸ keeps the sum
            // < 2·10¹⁸, inside the long range. |e4| ≤ ⌊√Long.MaxValue⌋
            // is a hard precondition of that arithmetic — beyond it the
            // square itself wraps and every later moment is silently
            // corrupt while the batch twin (DECIMAL(38,0)) stays exact,
            // so out-of-range input fails LOUDLY here instead.
            require(math.abs(e.e4) <= 3037000499L,
              s"anomalyStream: |value| ${e.value} exceeds the exact-" +
                "moment bound (|value*1e4| must be <= 3037000499); " +
                "quarantine oversized rows upstream")
            val sq = e.e4 * e.e4
            var lo = cur.curS2Lo + sq % Base
            var hi = cur.curS2Hi + sq / Base
            if (lo >= Base) { lo -= Base; hi += 1L }
            cur = cur.copy(curN = cur.curN + 1L, curS1 = cur.curS1 + e.e4,
              curS2Hi = hi, curS2Lo = lo)
          }
          st.update(cur)
          out.result().iterator
        })
  }

  /** Streaming cadence-gap ALERTS — the live face of
    * [[graft.queries.AggQueries.qGapStats]]: one row per detected gap
    * wider than `thrUs`, emitted the moment the gap-closing record
    * arrives, with the missing-record count under the reference's own
    * round-half-even rule ([[graft.core.TimeSeriesAggregator
    * .fillCount]] — identical in the batch plan, the DuckDB oracle, and
    * this fold, so the alert stream IS the batch report's row set).
    * One long of state per type (the latest record time); events fold
    * in (t, id) order per invocation, and a late event that would
    * regress the frontier neither emits a negative gap nor rewinds
    * state — the standard streaming caveat, with the batch report as
    * the event-time-exact backfill.
    *
    * Feed DEATH pages too: a sensor that stops sending never produces a
    * gap-closing record, so closed-gap alerting alone is silent exactly
    * when the alert matters most. In streaming mode each type arms an
    * event-time timeout at frontier + thrUs; when the watermark (driven
    * by the OTHER types' records) passes it with no new data, one
    * `open = true` row emits with gap_us/n_missing measured to the
    * watermark. The stall pages once — a new record re-arms — and the
    * frontier is kept, so a resuming feed still emits the exact closed
    * gap (`open = false` rows stay bit-identical to the batch report;
    * the registry's batch twin never times out, so the oracle is
    * unchanged modulo the constant flag). */
  def gapStream(events: DataFrame,
      nomUs: Long = 3600000000L,
      thrUs: Long = 7200000000L,
      watermark: String = "30 minutes"): Dataset[GapAlertRow] = {
    val s = events.sparkSession
    import s.implicits._
    val sliceLimit = maxGroupSlice(s)
    val streaming = events.isStreaming
    val typed = events
      .filter(col("ts").isNotNull && col("event_type").isNotNull &&
        col("event_id").isNotNull)
      .withColumn("ts", col("ts").cast(TimestampType))
      .withWatermark("ts", watermark)
      .withColumn("__t", unix_micros(col("ts")))
      .filter(col("__t") > 0L)
      .select(col("event_type"), col("__t").as("t"),
        col("event_id").cast(LongType).as("event_id"), col("ts"))
      .as[GapEv]
    typed.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(
        (typ: String, it: Iterator[GapEv],
            st: GroupState[GapAlertState]) => {
          if (st.hasTimedOut) {
            // watermark passed frontier + thrUs with no new record: the
            // feed is dead as far as event time can prove — page once
            // with the gap so far; state stays so the closing record
            // (if the feed resumes) emits the exact closed-gap row, and
            // no new timeout arms until data arrives
            val last = st.get.lastT
            val wmUs = st.getCurrentWatermarkMs() * 1000L
            if (wmUs - last > thrUs)
              Iterator.single(GapAlertRow(typ, last, wmUs - last,
                graft.core.TimeSeriesAggregator.fillCount(wmUs - last,
                  nomUs), open = true))
            else {
              // the arming arithmetic below ((last + thrUs) ms-rounded
              // UP by +1) fires only at watermark > last + thrUs, so
              // this µs-precision guard cannot fail today — but the
              // invariant spans two branches and a µs/ms conversion, so
              // re-arm rather than assume: a change to the rounding can
              // then delay a page, never silently lose it
              st.setTimeoutTimestamp(math.max((last + thrUs) / 1000L + 1L,
                st.getCurrentWatermarkMs() + 1L))
              Iterator.empty
            }
          } else {
            var last = st.getOption.map(_.lastT).getOrElse(Long.MinValue)
            val out = Seq.newBuilder[GapAlertRow]
            boundedSlice("gapStream", typ, sliceLimit, it)
              .sortBy(e => (e.t, e.event_id)).foreach { e =>
              if (last != Long.MinValue && e.t - last > thrUs)
                out += GapAlertRow(typ, last, e.t - last,
                  graft.core.TimeSeriesAggregator.fillCount(e.t - last,
                    nomUs), open = false)
              if (e.t > last) last = e.t
            }
            st.update(GapAlertState(last))
            if (streaming)
              st.setTimeoutTimestamp(math.max((last + thrUs) / 1000L + 1L,
                st.getCurrentWatermarkMs() + 1L))
            out.result().iterator
          }
        })
  }

  /** Streaming conversion funnel — the live face of [[graft.queries
    * .RelationalQueries.qFunnel]]'s view → click → purchase chain: each
    * user's stage completions emit AS THEY HAPPEN instead of on a batch
    * re-window. Processing each group's slice in (event-time, id) order,
    * the first qualifying event IS the stage minimum, so the fold over a
    * full in-order history reproduces the batch funnel's min-aggregate
    * chain exactly (StreamingSpec pins fold == the join-chain SQL on
    * real data); an event arriving out of order across batches chains
    * against the state as of arrival — the standard streaming caveat,
    * with the batch twin as the event-time-exact backfill. */
  def funnelStream(events: DataFrame): Dataset[FunnelHit] = {
    val s = events.sparkSession
    import s.implicits._
    val sliceLimit = maxGroupSlice(s)
    val typed = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull && col("event_id").isNotNull)
      .select(col("user_id").cast(LongType).as("user_id"),
        unix_micros(col("ts").cast(TimestampType)).as("t"),
        col("event_id").cast(LongType).as("event_id"),
        col("event_type"))
      .as[FunnelEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (uid: Long, it: Iterator[FunnelEvent],
            st: GroupState[FunnelState]) => {
          var cur = st.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          val out = Seq.newBuilder[FunnelHit]
          boundedSlice("funnelStream", uid, sliceLimit, it)
            .sortBy(e => (e.t, e.event_id)).foreach { e =>
            e.event_type match {
              case "view" if cur.t1 < 0L =>
                cur = cur.copy(t1 = e.t)
                out += FunnelHit(uid, "view", e.t)
              case "click" if cur.t1 >= 0L && cur.t2 < 0L && e.t > cur.t1 =>
                cur = cur.copy(t2 = e.t)
                out += FunnelHit(uid, "click_after_view", e.t)
              case "purchase"
                  if cur.t2 >= 0L && cur.t3 < 0L && e.t > cur.t2 =>
                cur = cur.copy(t3 = e.t)
                out += FunnelHit(uid, "purchase_after_click", e.t)
              case _ =>
            }
          }
          st.update(cur)
          out.result().iterator
        })
  }

  /** Continuous embedding-drift monitoring — the streaming face of the
    * emb_drift two-sample check: per label, the cosine between the
    * even-id and odd-id half centroids, re-emitted live as vectors
    * stream in (an operator watching its own corpus drift instead of a
    * scheduled batch audit). All folds are order-independent integer
    * sums, so after any batch split the emitted row equals the batch
    * query on the data so far, bit-for-bit: the dot/norm fold runs in
    * exact BigInt and converts once per term exactly like the batch
    * plan's DECIMAL(38,0)→DOUBLE casts. */
  def driftStream(vectors: DataFrame): Dataset[DriftRow] = {
    val s = vectors.sparkSession
    import s.implicits._
    val typed = vectors
      .filter(col("label").isNotNull && col("vec_id").isNotNull &&
        col("embedding").isNotNull)
      .select(col("label").cast(LongType).as("label"),
        col("vec_id").cast(LongType).as("vec_id"),
        expr("transform(embedding, x -> " +
          "CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))").as("q"))
      .as[DriftVec]
    typed.groupByKey(_.label)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (label: Long, it: Iterator[DriftVec],
            st: GroupState[DriftState]) => {
          // streamed fold: dims comes from state or a one-element
          // peek, then each vector folds into the running sums — O(1)
          // memory regardless of slice size, no buffering
          val vecs = it.buffered
          val dims = st.getOption.map(_.s0.length)
            .getOrElse(if (vecs.hasNext) vecs.head.q.length else 0)
          var cur = st.getOption.getOrElse(
            DriftState(0L, 0L, new Array[Long](dims),
              new Array[Long](dims)))
          vecs.foreach { v =>
            if (v.vec_id % 2 == 0L) {
              var d = 0
              while (d < dims) { cur.s0(d) += v.q(d); d += 1 }
              cur = cur.copy(nEven = cur.nEven + 1L)
            } else {
              var d = 0
              while (d < dims) { cur.s1(d) += v.q(d); d += 1 }
              cur = cur.copy(nOdd = cur.nOdd + 1L)
            }
          }
          st.update(cur)
          var dot = BigInt(0); var s0sq = BigInt(0); var s1sq = BigInt(0)
          var d = 0
          while (d < dims) {
            dot += BigInt(cur.s0(d)) * BigInt(cur.s1(d))
            s0sq += BigInt(cur.s0(d)) * BigInt(cur.s0(d))
            s1sq += BigInt(cur.s1(d)) * BigInt(cur.s1(d))
            d += 1
          }
          // until BOTH halves are populated the denominator is zero and
          // the cosine is NaN/Inf whose cross-engine semantics differ —
          // skip emission (the batch twin's oracle carries the matching
          // WHERE n_even > 0 AND n_odd > 0 guard). A populated half can
          // STILL quantize to the all-zero vector (every |x| < 1e-4),
          // which zeroes its norm and the denominator with it, so the
          // guard is on the norms themselves; the oracle carries the
          // matching s0sq/s1sq > 0 terms.
          if (cur.nEven == 0L || cur.nOdd == 0L ||
              s0sq.signum == 0 || s1sq.signum == 0) Iterator.empty
          else {
            val cosv = BigDecimal(dot).toDouble /
              (math.sqrt(BigDecimal(s0sq).toDouble) *
                math.sqrt(BigDecimal(s1sq).toDouble))
            Iterator.single(DriftRow(label, cur.nEven, cur.nOdd, cosv))
          }
        })
  }

  /** Streaming sequence packing — continuous ingest into fixed
    * token-budget training bins: per source, each arriving doc lands at
    * the running token offset (bin = offset div budget) with ONE long
    * of state per source. This is the ARRIVAL-ORDER contract — bins
    * fill in the order docs reach the stream — which is
    * `dPackSequences(packShards = 1)`'s rule exactly (StreamingSpec
    * pins the fold against it): docs fold in doc_id order within each
    * invocation, so feeding a stream in id order reproduces that
    * degenerate batch pack bit-for-bit. The batch packer's DEFAULT is
    * the two-level (shard, doc_id)-order re-pack — a batch semantics
    * that needs every shard's final total, which no per-key stream
    * state can know; a fleet that must pack a hot source in parallel
    * ON the stream shards it upstream (key the stream by
    * (source, shard)) and accepts shard-local bins, or re-packs in
    * batch. */
  def packStream(docs: DataFrame, budget: Long = 2048L)
      : Dataset[PackRow] = {
    val s = docs.sparkSession
    import s.implicits._
    val sliceLimit = maxGroupSlice(s)
    graft.functions.native.register(s)
    val typed = docs
      .filter(col("source").isNotNull && col("doc_id").isNotNull &&
        col("text").isNotNull)
      .select(col("source"), col("doc_id").cast(LongType).as("doc_id"),
        expr("CAST(size(graft_tokens(text)) AS BIGINT)").as("n_tokens"))
      .as[PackDoc]
    typed.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (src: String, it: Iterator[PackDoc], st: GroupState[PackState]) => {
          var off = st.getOption.map(_.offset).getOrElse(0L)
          val out = boundedSlice("packStream", src, sliceLimit, it)
            .sortBy(_.doc_id).map { d =>
            val r = PackRow(src, d.doc_id, d.n_tokens,
              off / budget, off % budget)
            off += d.n_tokens
            r
          }
          st.update(PackState(off))
          out.iterator
        })
  }
}
