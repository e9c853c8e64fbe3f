package graft
import org.apache.spark.sql.SparkSession
/** Local iteration helper: warm + time named SparkEntry queries once each
  * at sf0.1 (usage: runMain graft.TimeOne q1_agg d_minhash_lsh ...). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.timestampType", "TIMESTAMP_NTZ")
      .config("spark.sql.adaptive.enabled", "true")
      // bounded TypedImperativeAggregate folds (TopKScored's per-vector
      // top-4 in particular) legitimately hold ~n distinct groups in the
      // PARTIAL map; the 128-group default silently degrades the partial
      // to sort-based and sorts the whole candidate stream per task
      // (measured 2x on emb_knn_graph at 100x rows)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4000000")
      .config("spark.ui.enabled", "false")
    // ad-hoc conf overrides: SPARK_GRAFT_CONF="k=v;k2=v2"
    val spark = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2))
      .collect { case Array(k, v) => (k, v) }
      .foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (n <- args) {
      // warm — also reported as COLD: in a fresh session this first run
      // pays every session-memo/cache fill the min-of-3 bench excludes
      // (the r13 verdict asked for the cold single-pass cost of the
      // cache-riding queries to be published once per round)
      val c0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"COLD $n ${(System.nanoTime()-c0)/1e9}%.2f")
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"TIMED $n ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
