package graft

import org.apache.spark.sql.SparkSession

import graft.core.{AggConfig, Bounds}

/** CLI mirroring the reference's `ncagg [OPTIONS] DST [SRC]...`
  * (reference: /root/reference/ncagg/cli.py:152-227):
  *
  *   runMain graft.Cli DST SRC... [-u udim:ivar[:hz]] [-b bounds]
  *                                 [-c udim:chunksize] [-t template.json]
  *   runMain graft.Cli --generate_template sample.parquet
  *
  * `-b` accepts `min:max` (epoch micros) or `TYYYY[MM[DD[HH[MM]]]]`
  * bound specs with inferred end. With no `-t`, a default config is
  * derived from the first granule (reference Config.from_nc).
  * `--generate_template` prints the JSON config template derived from a
  * sample granule and exits (reference cli.py:103-117) — the printed JSON
  * feeds back in via `-t`.
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.timestampType", "TIMESTAMP_NTZ")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args) finally spark.stop()
  }

  /** Session-agnostic entry point (testable; `main` owns the session). */
  def run(spark: SparkSession, args: Array[String]): Map[String, String] = {
    if (args.contains("--generate_template")) {
      // guard the arity, don't fall through: parseArgs would otherwise
      // treat the flag as the DST positional and run a full aggregation
      // into a directory literally named "--generate_template"
      require(args.length == 2 && args.head == "--generate_template",
        "usage: graft.Cli --generate_template SAMPLE_GRANULE")
      val json = AggConfig.toJson(
        AggConfig.fromGranule(spark.read.parquet(args(1))))
      println(json)
      return Map("template" -> json)
    }
    val (opts, pos) = parseArgs(args.toList)
    require(pos.size >= 2, "usage: graft.Cli DST SRC... [-u ...] [-b ...]")
    val dst = pos.head
    val srcs = pos.tail

    var config = opts.get("t") match {
      case Some(path) => AggConfig.fromJson(
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), "UTF-8"))
      case None => AggConfig.fromGranule(spark.read.parquet(srcs.head))
    }

    // -u udim:ivar[:hz] (reference cli.py:194-201)
    opts.get("u").foreach { u =>
      val parts = u.split(":")
      val (udim, ivar) = (parts(0), parts(1))
      val hz = if (parts.length > 2) Some(parts(2).toDouble) else None
      val (lo, hi) = opts.get("b") match {
        case Some(b) =>
          val (l, h) = Bounds.parse(b); (Some(l), Some(h))
        case None => (None, None)
      }
      config = config.copy(dims = config.dims.map { d =>
        if (d.name == udim)
          d.copy(indexBy = Some(ivar), expectedCadenceHz = hz,
            min = lo, max = hi)
        else d
      })
    }

    val maxRecords = opts.get("c")
      .map(_.split(":")(1).toInt).getOrElse(1 << 20)

    val attrs = Aggregate.run(spark, srcs, dst, config,
      maxRecordsPerFile = maxRecords)
    attrs.foreach { case (k, v) => println(s"$k = $v") }
    println(s"Finished: $dst")
    attrs
  }

  private def parseArgs(args: List[String],
      opts: Map[String, String] = Map.empty,
      pos: List[String] = Nil): (Map[String, String], List[String]) =
    args match {
      case flag :: v :: rest if flag.startsWith("-") && flag.length == 2 =>
        parseArgs(rest, opts + (flag.drop(1) -> v), pos)
      case p :: rest => parseArgs(rest, opts, pos :+ p)
      case Nil => (opts, pos)
    }
}
