package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TimeSeriesAggregator._

/** Behavioral mirror of the reference test suite's aggregation cases
  * (sort, dedup of too-close records, gap fill at cadence, bounds chop,
  * interleaved inputs) on synthetic rows — see SURVEY.md §6. */
class TimeSeriesAggregatorSpec extends AnyFunSuite with SparkSpec {

  private val us = 1000000L
  // 1 Hz cadence: dedup records < 0.5 s apart, fill gaps > 2 s.
  private val cfg = UdimConfig("ts", "id", 500000L, 1000000L, 2000000L)

  private def mk(ts: Seq[Long]) = {
    val rows = ts.zipWithIndex.map { case (t, i) =>
      Row(java.time.LocalDateTime.ofEpochSecond(
        t / us, ((t % us) * 1000).toInt, java.time.ZoneOffset.UTC),
        i.toLong, s"v$i")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      StructType(Seq(
        StructField("ts", TimestampNTZType),
        StructField("id", LongType),
        StructField("payload", StringType))))
  }

  private val base = 1704067200L * us // 2024-01-01T00:00:00Z

  test("sorts by index variable across chunk boundaries") {
    // two rows on either side of a day boundary, out of id order
    val df = mk(Seq(base + 86400L * us + us, base, base + us, base + 86400L * us))
    val rn = withGlobalRowNumber(withEpochUs(df, "ts"), cfg, "rn")
      .orderBy("rn").select("id").collect().map(_.getLong(0)).toSeq
    assert(rn === Seq(1L, 2L, 3L, 0L))
  }

  test("dedupe drops records closer than minStep to predecessor") {
    val df = mk(Seq(base, base + 100000L, base + us, base + 2 * us))
    val kept = dedupe(filterValid(df, cfg), cfg)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 2L, 3L)) // id=1 is 0.1s after id=0 -> dropped
  }

  test("dedupe consults previous chunk's last value at the boundary") {
    val dayUs = 86400L * us
    // last row of day 0 and first row of day 1, 0.1 s apart
    val df = mk(Seq(base + dayUs - 50000L, base + dayUs + 50000L))
    val kept = dedupe(filterValid(df, cfg), cfg)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L))
  }

  test("gapFill inserts nominal-cadence fills into wide gaps only") {
    val df = mk(Seq(base, base + us, base + 5 * us))
    val out = gapFill(filterValid(df, cfg).drop("ts"), cfg)
    val fills = out.filter(col("__is_fill")).select(T)
      .collect().map(_.getLong(0)).toSeq.sorted
    // gap of 4s between 1s and 5s -> fills at 2s, 3s, 4s
    assert(fills === Seq(base + 2 * us, base + 3 * us, base + 4 * us))
    assert(out.count() === 6)
  }

  test("gapFill spans chunk boundaries") {
    val dayUs = 86400L * us
    val df = mk(Seq(base + dayUs - us, base + dayUs + 2 * us))
    val fills = gapFill(filterValid(df, cfg).drop("ts"), cfg)
      .filter(col("__is_fill")).select(T).collect().map(_.getLong(0)).toSeq.sorted
    assert(fills === Seq(base + dayUs, base + dayUs + us))
  }

  test("full aggregate: valid -> bounds chop -> dedup -> fill") {
    val b = cfg.copy(boundsUs = Some((base, base + 10 * us)))
    // out-of-bounds row, a dup, a gap, and an in-bounds tail
    val df = mk(Seq(base - 5 * us, base, base + 300000L, base + us,
      base + 5 * us, base + 20 * us))
    val out = graft.core.TimeSeriesAggregator.aggregate(df, b).orderBy("ts")
    val rows = out.select(unix_micros(col("ts").cast(TimestampType)),
      col("is_fill")).collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(rows === Seq(
      (base, false), (base + us, false),
      (base + 2 * us, true), (base + 3 * us, true), (base + 4 * us, true),
      (base + 5 * us, false)))
  }

  test("records with invalid (non-positive) index values are excluded") {
    val df = mk(Seq(0L, -5L * us, base))
    assert(filterValid(df, cfg).count() === 1)
  }

  test("interleaved streams sort-merge correctly") {
    val a = Seq(base, base + 2 * us, base + 4 * us)
    val b = Seq(base + us, base + 3 * us, base + 5 * us)
    val df = mk(a ++ b)
    val ts = dedupe(filterValid(df, cfg), cfg)
      .orderBy(T).select(T).collect().map(_.getLong(0)).toSeq
    assert(ts === (0 to 5).map(i => base + i * us))
  }
}
