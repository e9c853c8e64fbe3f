package graft
import org.apache.spark.sql.SparkSession
/** Local iteration helper: warm + time named SparkEntry queries once each
  * at sf0.1 (usage: runMain graft.TimeOne q1_agg d_minhash_lsh ...). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.timestampType", "TIMESTAMP_NTZ")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (n <- args) {
      // warm
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"TIMED $n ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
