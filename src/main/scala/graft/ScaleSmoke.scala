package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{TimeSeriesAggregator => TSA}

/** Scale-up smoke: replicate the sf0.1 tables N× (time/key-shifted so the
  * copies are real disjoint data, not dedupe fodder) and time the headline
  * operators at 1× and N×. The point is the RATIO: a plan that holds its
  * shape scales ~linearly in rows, while an accidental nested loop or
  * driver-side collect blows up superlinearly — this is the local stand-in
  * for the 100 TB scale-up question (SURVEY.md §4).
  *
  * Usage: runMain graft.ScaleSmoke [factor]   (default 10)
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.timestampType", "TIMESTAMP_NTZ")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_scale_$factor"
    if (!new java.io.File(s"$dir/events").isDirectory) {
      // events: each copy shifted +30 days and re-keyed — disjoint chunks
      Tables.load(spark, sf, "events")
        .withColumn("__i", explode(expr(s"sequence(0, ${factor - 1})")))
        .withColumn("ts",
          col("ts") + expr("make_dt_interval(__i * 30, 0, 0, 0)"))
        .withColumn("event_id",
          col("event_id") + col("__i") * 100000000L)
        .drop("__i")
        .write.mode("overwrite").parquet(s"$dir/events")
      Tables.load(spark, sf, "lineitem")
        .withColumn("__i", explode(expr(s"sequence(0, ${factor - 1})")))
        .withColumn("l_orderkey",
          col("l_orderkey") + col("__i") * 100000000L)
        .drop("__i")
        .write.mode("overwrite").parquet(s"$dir/lineitem")
    }
    // separate guard: a pre-existing events replica (earlier smoke run)
    // must not skip the documents replica
    if (!new java.io.File(s"$dir/documents.parquet").isDirectory) {
      // documents: re-keyed + a per-copy marker token prepended so the
      // copies are near-dupes (realistic), not byte-identical clones
      Tables.load(spark, sf, "documents")
        .withColumn("__i", explode(expr(s"sequence(0, ${factor - 1})")))
        .withColumn("doc_id", col("doc_id") + col("__i") * 100000000L)
        .withColumn("text",
          concat(lit("copymark"), col("__i").cast("string"), lit(" "),
            col("text")))
        .drop("__i")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }

    val cfgNB = graft.queries.AggQueries.cfg.copy(boundsUs = None)
    def aggCore(ev: DataFrame): DataFrame =
      TSA.gapFill(TSA.dedupe(TSA.filterValid(ev, cfgNB), cfgNB), cfgNB)
    def q1(li: DataFrame): DataFrame =
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))

    def time(df: => DataFrame): Double = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val ev1 = Tables.load(spark, sf, "events")
    val li1 = Tables.load(spark, sf, "lineitem")
    val evN = spark.read.parquet(s"$dir/events")
    val liN = spark.read.parquet(s"$dir/lineitem")
    import graft.queries.PipelineQueries
    val r = Map(
      "agg_core_1x" -> time(aggCore(ev1)),
      s"agg_core_${factor}x" -> time(aggCore(evN)),
      "q1_1x" -> time(q1(li1)),
      s"q1_${factor}x" -> time(q1(liN)),
      // corpus family: $dir carries the replicated documents.parquet, so
      // the registry operators run on it unmodified (linear span-hash and
      // tf/df aggregations — the shapes that must not go quadratic)
      "span_dedup_1x" -> time(PipelineQueries.dSpanDedup(spark, sf)),
      s"span_dedup_${factor}x" -> time(PipelineQueries.dSpanDedup(spark, dir)),
      "tfidf_1x" -> time(PipelineQueries.tTfidf(spark, sf)),
      s"tfidf_${factor}x" -> time(PipelineQueries.tTfidf(spark, dir)))
    val js = r.map { case (k, v) => f""""$k":$v%.3f""" }.mkString(",")
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    println(s"""{"metric":"scale_smoke","factor":$factor,$js,""" +
      s""""rows_events":${evN.count()},"rows_lineitem":${liN.count()},""" +
      s""""rows_documents":$nDocs}""")
    spark.stop()
  }
}
