package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingAgg

case class Ev(ts: java.sql.Timestamp, event_type: String, value: Double)

class StreamingSpec extends AnyFunSuite with SparkSpec {

  private def ev(sec: Long, t: String, v: Double) =
    Ev(new java.sql.Timestamp(sec * 1000L), t, v)

  test("windowed counts aggregate a stream like the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingAgg.windowedCounts(mem.toDF(), "1 hour", "10 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("wc").start()
    try {
      mem.addData(ev(0, "a", 1.0), ev(60, "a", 2.0), ev(3700, "b", 3.0))
      q.processAllAvailable()
      val rows = spark.table("wc")
        .select("event_type", "n", "v_sum").orderBy("event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq === Seq(("a", 2L, 3.0), ("b", 1L, 3.0)))
    } finally q.stop()
  }

  test("cadence dedup keeps one record per nominal bucket across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingAgg.cadenceDedup(mem.toDF(), minStepUs = 60000000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("dd").start()
    try {
      mem.addData(ev(0, "a", 1.0), ev(10, "a", 2.0)) // same minute bucket
      q.processAllAvailable()
      mem.addData(ev(15, "a", 3.0), ev(70, "b", 4.0)) // dup bucket + new
      q.processAllAvailable()
      assert(spark.table("dd").count() === 2)
    } finally q.stop()
  }

  test("granule-directory file stream: new granules flow through the agg") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    def granule(name: String, evs: Seq[Ev]): Unit =
      evs.toDF().write.mode("overwrite").parquet(s"$dir/$name")
    granule("g1", Seq(ev(0, "a", 1.0), ev(60, "a", 2.0)))
    val stream = spark.readStream
      .schema(Seq(ev(0, "a", 1.0)).toDF().schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")
    val q = StreamingAgg.windowedCounts(stream, "1 hour", "10 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("fs").start()
    try {
      q.processAllAvailable()
      val n1 = spark.table("fs").agg(sum("n")).first().getLong(0)
      assert(n1 === 2L)
      // a new granule arrives; the stream picks it up incrementally
      granule("g2", Seq(ev(3700, "b", 3.0)))
      q.processAllAvailable()
      val n2 = spark.table("fs").agg(sum("n")).first().getLong(0)
      assert(n2 === 3L)
    } finally q.stop()
  }

  test("the same transform runs in batch mode (streaming/batch parity)") {
    import spark.implicits._
    val batch = Seq(ev(0, "a", 1.0), ev(60, "a", 2.0), ev(3700, "b", 3.0))
      .toDF()
    val out = StreamingAgg.windowedCounts(batch, "1 hour", "10 minutes")
    assert(out.agg(sum("n")).first().getLong(0) === 3L)
  }
}
