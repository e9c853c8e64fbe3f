package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Loader robustness: the events.ts encoding has drifted between rounds
  * (TIMESTAMP nanos vs micros), so Tables.load keys its rescale decision
  * off the parquet footer's logical type instead of guessing from the
  * Spark-surfaced type. These tests pin the fail-loud paths.
  */
class TablesSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("events.ts loads as TIMESTAMP_NTZ with sane epoch values") {
    val df = Tables.load(spark, sf, "events")
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
    val (lo, hi) = df
      .agg(min(unix_timestamp(col("ts"))), max(unix_timestamp(col("ts"))))
      .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
      .head()
    // plausible epoch-seconds range (2000..2100); a 1000x unit slip lands far outside
    assert(lo > 946684800L && hi < 4102444800L, s"ts range [$lo,$hi] implausible")
  }

  test("a plain INT64 ts column (no timestamp logical type) fails loudly, not /1000") {
    val dir = java.nio.file.Files.createTempDirectory("tables-int64").toFile
    try {
      spark.range(3).selectExpr("id * 1000000 as ts").write
        .mode("overwrite").parquet(s"$dir/events.parquet")
      val e = intercept[RuntimeException](Tables.load(spark, dir.toString, "events"))
      assert(e.getMessage.contains("refusing to guess"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("a string ts column fails loudly instead of silently null-casting") {
    val dir = java.nio.file.Files.createTempDirectory("tables-str").toFile
    try {
      spark.range(3).selectExpr("concat('not-a-ts-', id) as ts").write
        .mode("overwrite").parquet(s"$dir/events.parquet")
      val e = intercept[RuntimeException](Tables.load(spark, dir.toString, "events"))
      assert(e.getMessage.contains("unexpected type"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }
}
