package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sequence-packing skew probe at an arbitrary documents dir — the
  * focused form of ScaleSmoke's pack_srchot rows for the big TenX
  * factors (running the whole smoke at factor 1000 is hours; the pack
  * question needs two timings).
  *
  * Builds (once) a 90%-one-source variant of the input documents table
  * — the real shape of a crawl corpus — then times
  * [[graft.queries.PipelineQueries.dPackSequences]] in both regimes:
  * the default two-level (source, shard) pack and the packShards = 1
  * degenerate form whose per-source prefix window serializes the hot
  * source through ONE task. Reports wall, max task seconds, and the
  * max/median straggler ratio per run (the serialized form's failure
  * mode is the max task, not the wall, until the corpus dwarfs the
  * other stages).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.PackSkewProbe
  */
object PackSkewProbe {
  def main(args: Array[String]): Unit = {
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

    val hash = java.lang.Integer.toHexString(sf.hashCode)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_packskew_$hash"
    if (!new java.io.File(s"$dir/documents.parquet").isDirectory) {
      Tables.load(spark, sf, "documents")
        .withColumn("source",
          when(col("doc_id") % 10 < 9, lit("web")).otherwise(col("source")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }

    val taskDurations = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskInfo != null) taskDurations.add(e.taskInfo.duration)
      })

    def time(nsh: Long): (Double, Double, Double) = {
      import graft.queries.{PipelineParams, PipelineQueries}
      def run() = PipelineQueries
        .dPackSequences(spark, dir,
          PipelineParams.Default.copy(packShards = nsh))
        .write.format("noop").mode("overwrite").save()
      run() // warm (memoized token frame materializes here)
      taskDurations.clear()
      val t0 = System.nanoTime()
      run()
      val dt = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val ds = taskDurations.asScala.toSeq.sorted
      val maxT = if (ds.nonEmpty) ds.last / 1e3 else 0.0
      val skew = if (ds.nonEmpty && ds(ds.size / 2) > 0)
        ds.last.toDouble / math.max(ds(ds.size / 2), 1L).toDouble else 0.0
      (dt, maxT, skew)
    }

    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    val (w2, m2, s2) = time(graft.queries.PipelineParams.Default.packShards)
    val (w1, m1, s1) = time(1L)
    println(f"""{"metric":"pack_skew_probe","sf_dir":"$sf","rows_documents":$n,""" +
      f""""two_level_wall":$w2%.2f,"two_level_maxtask":$m2%.2f,"two_level_skew":$s2%.1f,""" +
      f""""serial_wall":$w1%.2f,"serial_maxtask":$m1%.2f,"serial_skew":$s1%.1f}""")
    spark.stop()
  }
}
