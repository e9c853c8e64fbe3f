package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite, lazily created). */
trait SparkSpec { self: AnyFunSuite =>
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.timestampType", "TIMESTAMP_NTZ")
    .config("spark.ui.enabled", "false")
    // engine default (mirrors the Bench/Verify mains): bounded
    // TypedImperativeAggregate folds hold ~n groups in the partial map
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      "4000000")
    .getOrCreate()
}
