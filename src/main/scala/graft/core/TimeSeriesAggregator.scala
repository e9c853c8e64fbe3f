package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Spark-native re-expression of ncagg's unlimited-dimension aggregation
  * pipeline (reference: /root/reference/ncagg/aggregator.py:54-236 and
  * /root/reference/ncagg/aggrelist.py:217-315): drop records with invalid
  * index values, order by the index variable, clip to bounds, drop records
  * spaced closer than the expected cadence allows, and synthesize fill
  * records into gaps wider than the cadence tolerance.
  *
  * Scale design: the reference streams granule-by-granule through one
  * process; here every step is a relational transform. Neighbor lookups
  * (lag/lead of the index value) deliberately avoid a global single
  * partition sort: rows are windowed within coarse time chunks (default one
  * day) and chunk-boundary neighbors are recovered with a broadcast join
  * against a tiny per-chunk summary (one row per chunk — thousands of rows
  * even at 100 TB). All timestamp arithmetic is integer epoch-microseconds,
  * never float, so results are deterministic across engines.
  */
object TimeSeriesAggregator {

  /** Unlimited-dimension config — the Spark analog of the reference's
    * dimension config (reference: /root/reference/ncagg/config.py:209-259).
    *
    * @param tsCol          index_by column (the reference's index variable)
    * @param idCol          unique tie-break column for deterministic ordering
    * @param minStepUs      drop a record closer than this to its predecessor
    *                       (reference dedup tolerance, aggrelist.py:290-292)
    * @param nomStepUs      nominal cadence step = 1e6 / expected_cadence hz
    * @param gapThresholdUs fill gaps wider than this (aggrelist.py:294-303)
    * @param boundsUs       inclusive [min,max] clip in epoch micros
    * @param chunkUs        window partitioning granularity (scale knob)
    */
  final case class UdimConfig(
      tsCol: String,
      idCol: String,
      minStepUs: Long,
      nomStepUs: Long,
      gapThresholdUs: Long,
      boundsUs: Option[(Long, Long)] = None,
      chunkUs: Long = 86400000000L,
      fillEdges: Boolean = false)

  /** Internal epoch-microseconds column added by [[withEpochUs]]. */
  val T = "__t"
  private val CHUNK = "__chunk"

  /** Interior fill count = round_half_even(gap/step) - 1, in exact integer
    * microseconds — numpy's half-even tie rule over the reference's
    * WITHIN-file formula np.round(gap*hz)-1 (aggrelist.py:298-299). The
    * reference's between-file formula np.round((gap-dt_nom)*hz)
    * (aggregator.py:170-172) agrees everywhere EXCEPT exact half-step
    * ties, where the two reference formulas themselves differ by one;
    * graft applies one rule to its single post-ingest stream, so a
    * granule-boundary gap landing exactly on a half step yields one
    * fewer fill than ncagg (deliberate divergence, pinned in
    * TimeSeriesAggregatorSpec).
    * (2g - N) div 2N is the HALF-UP count; an exact half-step tie
    * (2*(g mod N) == N, only possible when N is even) with an even
    * quotient rounds DOWN under half-even — one fewer fill. The same
    * arithmetic must appear in the Spark plans, the DuckDB oracles
    * ([[fillCountDuck]]) and the streaming state fold ([[fillCount]]),
    * so all three engines agree exactly. */
  def fillCountSpark(g: String, nom: Long): String =
    s"(2 * ($g) - ${nom}L) div ${2 * nom}L - " +
      s"(CASE WHEN (($g) % ${nom}L) * 2 = ${nom}L AND " +
      s"(($g) div ${nom}L) % 2 = 0 THEN 1 ELSE 0 END)"

  /** DuckDB twin of [[fillCountSpark]] (`//` = floor division; operands are
    * positive, so `//`/`%` agree with Spark's `div`/`%`). */
  def fillCountDuck(g: String, nom: Long): String =
    s"(2 * ($g) - $nom) // ${2 * nom} - " +
      s"(CASE WHEN (($g) % $nom) * 2 = $nom AND " +
      s"(($g) // $nom) % 2 = 0 THEN 1 ELSE 0 END)"

  /** JVM twin of [[fillCountSpark]] for the streaming state fold and the
    * property-spec naive model. Requires gap > 0. */
  def fillCount(gap: Long, nom: Long): Long = {
    val halfUp = (2 * gap - nom) / (2 * nom)
    if ((gap % nom) * 2 == nom && (gap / nom) % 2 == 0) halfUp - 1
    else halfUp
  }

  /** Add integer epoch-microseconds `__t` derived from the index column.
    * Cast through TIMESTAMP_LTZ explicitly (the "timestamp" name resolves to
    * NTZ under spark.sql.timestampType=TIMESTAMP_NTZ); with the session in
    * UTC the NTZ->LTZ cast is value-preserving. */
  def withEpochUs(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn(T, unix_micros(col(tsCol).cast(TimestampType)))

  /** Drop records whose index value is fill/invalid — the reference treats
    * NaN and non-positive index values as fill (aggrelist.py:253-283). */
  def filterValid(df: DataFrame, cfg: UdimConfig): DataFrame =
    withEpochUs(df, cfg.tsCol).filter(col(T).isNotNull && col(T) > 0L)

  /** Clip to the inclusive index bounds (reference aggregator.py:137-212;
    * a plain range predicate, pushed down to the parquet scan). */
  def clipBounds(df: DataFrame, cfg: UdimConfig): DataFrame =
    cfg.boundsUs.fold(df) { case (lo, hi) => df.filter(col(T).between(lo, hi)) }

  private def chunked(df: DataFrame, cfg: UdimConfig): DataFrame =
    df.withColumn(CHUNK, expr(s"$T div ${cfg.chunkUs}L"))

  /** Global predecessor index value without a global sort: lag within the
    * time chunk, with the first row of each chunk patched from a broadcast
    * per-chunk summary (previous chunk's max). */
  def withPrevT(df: DataFrame, cfg: UdimConfig, out: String = "__prev_t"): DataFrame = {
    val c = chunked(df, cfg)
    val w = Window.partitionBy(CHUNK).orderBy(col(T), col(cfg.idCol))
    val lagged = c.withColumn("__prev_in", lag(col(T), 1).over(w))
    // One row per chunk; ordering this tiny frame globally is fine at any SF.
    val wc = Window.orderBy(CHUNK)
    val prevChunk = c
      .groupBy(CHUNK).agg(max(T).as("__chunk_last"))
      .withColumn("__prev_chunk_last", lag(col("__chunk_last"), 1).over(wc))
      .select(col(CHUNK), col("__prev_chunk_last"))
    lagged
      .join(broadcast(prevChunk), Seq(CHUNK), "left")
      .withColumn(out, coalesce(col("__prev_in"), col("__prev_chunk_last")))
      .drop("__prev_in", "__prev_chunk_last", CHUNK)
  }

  /** Global successor index value; mirror of [[withPrevT]]. */
  def withNextT(df: DataFrame, cfg: UdimConfig, out: String = "__next_t"): DataFrame = {
    val c = chunked(df, cfg)
    val w = Window.partitionBy(CHUNK).orderBy(col(T), col(cfg.idCol))
    val led = c.withColumn("__next_in", lead(col(T), 1).over(w))
    val wc = Window.orderBy(CHUNK)
    val nextChunk = c
      .groupBy(CHUNK).agg(min(T).as("__chunk_first"))
      .withColumn("__next_chunk_first", lead(col("__chunk_first"), 1).over(wc))
      .select(col(CHUNK), col("__next_chunk_first"))
    led
      .join(broadcast(nextChunk), Seq(CHUNK), "left")
      .withColumn(out, coalesce(col("__next_in"), col("__next_chunk_first")))
      .drop("__next_in", "__next_chunk_first", CHUNK)
  }

  /** Global output record number (the reference's output unlimited-dim
    * index) without a global sort: rank within chunk + broadcast cumulative
    * chunk counts. */
  def withGlobalRowNumber(df: DataFrame, cfg: UdimConfig, out: String): DataFrame = {
    val c = chunked(df, cfg)
    val w = Window.partitionBy(CHUNK).orderBy(col(T), col(cfg.idCol))
    val ranked = c.withColumn("__rk", row_number().over(w))
    val wc = Window.orderBy(CHUNK).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = c
      .groupBy(CHUNK).agg(count(lit(1)).as("__n"))
      .withColumn("__offset", coalesce(sum(col("__n")).over(wc), lit(0L)))
      .select(col(CHUNK), col("__offset"))
    ranked
      .join(broadcast(offsets), Seq(CHUNK), "left")
      .withColumn(out, col("__offset") + col("__rk"))
      .drop("__rk", "__offset", CHUNK)
  }

  /** Cadence dedup: drop a record when its index value is closer than
    * minStepUs to the previous record's (reference aggrelist.py:285-292
    * "significantly less than tolerance of cadence, remove value"). */
  def dedupe(df: DataFrame, cfg: UdimConfig): DataFrame =
    withPrevT(df, cfg)
      .filter(col("__prev_t").isNull || col(T) - col("__prev_t") >= cfg.minStepUs)
      .drop("__prev_t")

  /** Gap fill: for each pair of neighbors spaced wider than gapThresholdUs,
    * synthesize records at the nominal cadence strictly between them, with
    * all data columns null-filled (the reference's FillNode,
    * aggrelist.py:100-189 + 294-303). Adds boolean `__is_fill`.
    *
    * Single-pass emit: every row explodes into itself plus its trailing fill
    * timestamps, so the input is evaluated once — no union of a kept branch
    * and a fills branch that would each re-scan the source (at 100 TB the
    * old two-branch shape doubles the dominant scan+window cost). */
  def gapFill(df: DataFrame, cfg: UdimConfig): DataFrame = {
    val dataCols = df.columns.filter(_ != T).toSeq
    emitWithFills(withNextT(df, cfg), cfg, dataCols,
      df.schema, edges = None)
  }

  /** Shared single-pass fill emitter. Input must carry `__next_t` (and
    * `__prev_t` when edges are requested). Each row emits: leading fills out
    * to the lower bound (only the global-first row, `__prev_t` null), itself,
    * interior fills at the nominal cadence while the gap to `__next_t`
    * exceeds the threshold, and trailing fills out to the upper bound (only
    * the global-last row, `__next_t` null). One `Generate` per row, zero
    * re-evaluation of the input. */
  private def emitWithFills(df: DataFrame, cfg: UdimConfig,
      dataCols: Seq[String], schema: org.apache.spark.sql.types.StructType,
      edges: Option[(Long, Long)]): DataFrame = {
    val nom = cfg.nomStepUs
    def fillSeq(n: Column, tOf: Column => Column): Column =
      when(n >= 1L, transform(sequence(lit(1L), n), k => tOf(k)))
        .otherwise(array().cast("array<bigint>"))
    // fill count = round(gap/step) - 1 (reference aggregator.py:170-172:
    // round((gap - dt_nom) * hz)): rounding keeps synthesized rows on the
    // cadence grid never closer than ~half a step to the resuming record;
    // a truncating (gap-1) div step overfills when the gap carries a small
    // positive jitter. fillCountSpark computes this in exact integers with
    // numpy's HALF-EVEN tie-break, so exact half-step gaps (possible under
    // integer cadences, e.g. 1 Hz with a 3.5 s gap) produce the same count
    // as the reference.
    val interior = fillSeq(
      when(col("__next_t").isNotNull &&
          col("__next_t") - col(T) > cfg.gapThresholdUs,
        expr(fillCountSpark(s"__next_t - $T", nom)))
        .otherwise(lit(0L)),
      k => col(T) + k * lit(nom))
    val tsArr = edges match {
      case Some((lo, hi)) =>
        val leadFills = fillSeq(
          when(col("__prev_t").isNull, expr(s"($T - ${lo}L) div ${nom}L"))
            .otherwise(lit(0L)),
          k => col(T) - k * lit(nom))
        val trailFills = fillSeq(
          when(col("__next_t").isNull, expr(s"(${hi}L - $T) div ${nom}L"))
            .otherwise(lit(0L)),
          k => col(T) + k * lit(nom))
        concat(leadFills, array(col(T)), interior, trailFills)
      case None => concat(array(col(T)), interior)
    }
    df.withColumn("__fill_t", explode(tsArr))
      .select(
        col("__fill_t").as(T) +:
          dataCols.map(c =>
            when(col("__fill_t") === col(T), col(c))
              .otherwise(lit(null).cast(schema(c).dataType)).as(c)) :+
          (col("__fill_t") =!= col(T)).as("__is_fill"): _*)
  }

  /** Edge fill: synthesize fill records at the nominal cadence between the
    * configured bounds and the first/last data record (the reference's
    * leading and trailing FillNodes, aggregator.py:151-195 and 223-234).
    * Input/output carry `__is_fill`. The min/max pass is a cheap two-long
    * aggregation broadcast back into the fill generators. */
  def fillToBounds(df: DataFrame, cfg: UdimConfig): DataFrame =
    cfg.boundsUs.fold(df) { case (lo, hi) =>
      val dataCols = df.columns.filter(c => c != T && c != "__is_fill")
      val extent = df.agg(min(T).as("__tf"), max(T).as("__tl"))
      def fillsFrom(nExpr: String, tExpr: String): DataFrame =
        extent
          .withColumn("__n", expr(nExpr))
          .filter(col("__n") >= 1L)
          .select(explode(expr("sequence(1L, __n)")).as("__k"),
            col("__tf"), col("__tl"))
          .withColumn(T, expr(tExpr))
          .select(
            (col(T) +:
              dataCols.map(c => lit(null).cast(df.schema(c).dataType).as(c)) :+
              lit(true).as("__is_fill")).toSeq: _*)
      val lead = fillsFrom(
        s"(__tf - ${lo}L) div ${cfg.nomStepUs}L",
        s"__tf - __k * ${cfg.nomStepUs}L")
      val trail = fillsFrom(
        s"(${hi}L - __tl) div ${cfg.nomStepUs}L",
        s"__tl + __k * ${cfg.nomStepUs}L")
      df.select((T +: dataCols :+ "__is_fill").toSeq.map(col): _*)
        .unionByName(lead).unionByName(trail)
    }

  /** The full reference pipeline (reference aggregator.py:36-51 aggregate()):
    * valid -> clip bounds -> sort -> cadence dedup -> gap fill [-> edge
    * fill]. Returns the input columns with the index column regenerated
    * from integer micros (TIMESTAMP_NTZ for engine portability) plus
    * boolean `is_fill`.
    *
    * Fused plan: the dedup lag-window and the gap-fill lead-window share one
    * chunk-hash exchange and sort (the dedup filter preserves both), and all
    * fill rows — interior gaps plus the leading/trailing edge fills — are
    * emitted by the single-pass [[emitWithFills]]. The data path scans the
    * source once; the only other scans are the two tiny per-chunk boundary
    * summaries (ts column only, one row per chunk). The old compositional
    * shape union-recomputed the dedup pipeline six times. */
  def aggregate(df: DataFrame, cfg: UdimConfig): DataFrame = {
    val valid = clipBounds(filterValid(df, cfg), cfg).drop(cfg.tsCol)
    val c = chunked(valid, cfg)
    val w = Window.partitionBy(CHUNK).orderBy(col(T), col(cfg.idCol))
    val wc = Window.orderBy(CHUNK)
    // per-chunk boundary summaries: one row per chunk, broadcast back
    val prevChunk = c
      .groupBy(CHUNK).agg(max(T).as("__chunk_last"))
      .withColumn("__prev_chunk_last", lag(col("__chunk_last"), 1).over(wc))
      .select(col(CHUNK), col("__prev_chunk_last"))
    val withPrev = c
      .withColumn("__prev_in", lag(col(T), 1).over(w))
      .join(broadcast(prevChunk), Seq(CHUNK), "left")
      .withColumn("__prev_t", coalesce(col("__prev_in"), col("__prev_chunk_last")))
      .drop("__prev_in", "__prev_chunk_last")
    val deduped = withPrev.filter(
      col("__prev_t").isNull || col(T) - col("__prev_t") >= cfg.minStepUs)
    // next neighbor over the deduped stream; same window partitioning, so
    // no second exchange on the data path.
    //
    // The nextChunk branch below DOES re-run a scan→shuffle→sort→lag
    // chain over the event stream (the r14 plan audit, plans/r14/
    // q_agg_fill_edges_audit.txt nodes 25-55) — deliberately kept: the
    // branch is column-pruned to (event_id, ts) = 3 longs/row, so the
    // recompute is a NARROW second pass, while truncating it with a
    // checkpoint would materialize the full-width deduped stream
    // (measured: localCheckpoint(eager=false) here was FLAT at sf0.1 —
    // 0.86→0.88 / 0.83→0.80 s TimeOne local[8] — and at 100 TB a wide
    // materialization costs more than a 3-long/row pass).
    val nextChunk = deduped
      .groupBy(CHUNK).agg(min(T).as("__chunk_first"))
      .withColumn("__next_chunk_first", lead(col("__chunk_first"), 1).over(wc))
      .select(col(CHUNK), col("__next_chunk_first"))
    val withNbrs = deduped
      .withColumn("__next_in", lead(col(T), 1).over(w))
      .join(broadcast(nextChunk), Seq(CHUNK), "left")
      .withColumn("__next_t", coalesce(col("__next_in"), col("__next_chunk_first")))
      .drop("__next_in", "__next_chunk_first", CHUNK)
    val dataCols = valid.columns.filter(_ != T).toSeq
    val emitted = emitWithFills(withNbrs, cfg, dataCols, valid.schema,
      edges = if (cfg.fillEdges) cfg.boundsUs else None)
    val outCols = df.columns.filter(_ != cfg.tsCol)
    emitted
      .withColumn(cfg.tsCol, timestamp_micros(col(T)).cast(TimestampNTZType))
      .withColumn("is_fill", col("__is_fill"))
      .select((cfg.tsCol +: outCols :+ "is_fill").toSeq.map(col): _*)
  }
}
