package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the round-3 relational operators (SURVEY.md §2 B):
  * JSON props extraction and interval union (gaps-and-islands). */
class RelationalOpsSpec extends AnyFunSuite with SparkSpec {

  import graft.queries.RelationalQueries

  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double, String)])
      : String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_rel3").toString
    // TIMESTAMP(MICROS)-as-NTZ layout of the current testdata
    // (Tables.load now REJECTS un-annotated INT64 ts columns)
    rows.toDF("event_id", "t_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("t_us")).cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("merge intervals: chained overlaps merge, gaps split, long spans swallow") {
    val m = 60000000L // one minute in micros
    val base = 1000000L * m // off epoch zero: t = 0 is an invalid index
    val dir = eventsDir(Seq(
      // user 1: +0 and +10min overlap (30-min intervals); +29min chains
      // the span further even though it doesn't overlap the FIRST
      // interval — and +90min starts a new island
      (1L, base + 0L * m, 1L, "view", 1.0, "{}"),
      (2L, base + 10L * m, 1L, "view", 1.0, "{}"),
      (3L, base + 29L * m, 1L, "view", 1.0, "{}"),
      (4L, base + 90L * m, 1L, "view", 1.0, "{}"),
      // user 2: a single event -> one island of exactly [t, t+30min]
      (5L, base + 7L * m, 2L, "click", 1.0, "{}")))
    val r = RelationalQueries.qMergeIntervals(spark, dir)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .sortBy(x => (x._1, x._2))
    assert(r === Array(
      (1L, base, base + 59L * m, 3L),
      (1L, base + 90L * m, base + 120L * m, 1L),
      (2L, base + 7L * m, base + 37L * m, 1L)))
  }

  test("json props extraction: typed field, missing keys count as null") {
    val dir = eventsDir(Seq(
      (1L, 1000000L, 1L, "view", 1.0, """{"k": 10}"""),
      (2L, 2000000L, 1L, "view", 1.0, """{"k": 60}"""),
      (3L, 3000000L, 1L, "view", 1.0, """{"other": 5}""")))
    val r = RelationalQueries.qJsonProps(spark, dir).head()
    assert(r.getAs[Long]("n") === 3L)        // count(*) includes the no-k row
    assert(r.getAs[Long]("sum_k") === 70L)   // sum skips the null
    assert(r.getAs[Long]("min_k") === 10L)
    assert(r.getAs[Long]("max_k") === 60L)
    assert(r.getAs[Long]("n_high") === 1L)   // only k=60
  }
}
