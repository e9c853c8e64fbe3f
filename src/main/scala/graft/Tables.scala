package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Central loader for the driver-generated parquet tables.
  *
  * SESSION-CONFIG SIDE EFFECT: the first load pins
  * `spark.sql.session.timeZone=UTC` (plus `nanosAsLong` and parquet
  * aggregate pushdown) on the session — the timestamp normalization
  * below is only value-preserving under UTC, and every graft entry point
  * (Verify/Bench/Cli/ScaleSmoke/specs) already runs UTC. A caller that
  * deliberately needs a non-UTC session must not share that session with
  * this loader.
  *
  * Timestamp normalization: the driver's generator has shipped `events.ts`
  * as TIMESTAMP(NANOS) in some rounds and TIMESTAMP(MICROS) in others, so
  * the loader adapts to what the file actually contains. Nanos parquet is
  * rejected by Spark's reader; with `spark.sql.legacy.parquet.nanosAsLong`
  * the column surfaces as LongType nanoseconds, which we floor-divide to
  * integer microseconds — the same truncation DuckDB applies reading nanos
  * into its microsecond TIMESTAMP. Either way the column materializes as
  * TIMESTAMP_NTZ so both engines hold identical values and types
  * end-to-end.
  */
object Tables {

  /** Timestamp columns per table, normalized to NTZ on load.
    * (orders.o_orderdate / lineitem.l_shipdate are millis — Spark reads
    * those natively as TIMESTAMP_NTZ; only events.ts has varied.) */
  private val nanosCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"))

  /** Memo per (session, dir, table): a bench/verify run touches each table
    * hundreds of times; re-resolving the relation re-lists files and
    * re-reads footers. DataFrames are immutable, so sharing one is safe.
    * Assumes the driver-generated testdata is immutable (TESTDATA.md:
    * read-only) — the memoized frame freezes the file listing at first
    * load, so this loader is NOT for tables that are rewritten in-process. */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** Parquet-footer timestamp unit for one column ("NANOS"/"MICROS"/
    * "MILLIS"), or None when the column carries no timestamp annotation.
    * Footer-only read — no Spark job, no data pages touched. Guards the
    * LongType branch below: a plain INT64 column (no logical type) must
    * NOT be divided by 1000 just because nanosAsLong surfaced it as Long. */
  private def footerTsUnit(s: SparkSession, path: String, column: String): Option[String] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
    val conf = s.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory) {
        val fl = fs.listStatus(p).iterator
          .map(_.getPath)
          .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
          .toSeq
        require(fl.nonEmpty, s"no parquet part files under $path")
        fl
      } else Seq(p)
    // read EVERY part footer: one file's unit applied to a mixed-unit
    // directory would silently rescale rows 1000x — the exact drift this
    // guard exists to catch. Footer reads only; still no Spark job.
    val units = files.map { file =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        val u =
          if (!schema.containsField(column)) None
          else schema.getType(schema.getFieldIndex(column)).getLogicalTypeAnnotation match {
            case ts: TimestampLogicalTypeAnnotation => Some(ts.getUnit.toString)
            case _ => None
          }
        file.getName -> u
      } finally reader.close()
    }
    val distinct = units.map(_._2).distinct
    require(distinct.size == 1,
      s"$path.$column: part files disagree on timestamp unit — " +
        units.groupBy(_._2).map { case (u, fs) =>
          s"$u in ${fs.head._1}${if (fs.size > 1) s" (+${fs.size - 1} more)" else ""}"
        }.mkString("; ") +
        " — refusing to rescale the whole directory by one file's unit")
    distinct.head
  }

  def load(s: SparkSession, dir: String, name: String): DataFrame =
    memo.computeIfAbsent((s, dir, name), { case (s, dir, name) =>
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // TimestampType normalization below is only value-preserving when the
      // session reads UTC-adjusted micros in UTC; pin it rather than assume.
      s.conf.set("spark.sql.session.timeZone", "UTC")
      // filterless count()/min/max answer from parquet FOOTER metadata
      // instead of scanning data pages — the corpus-count derivations
      // (corpus-scaled codebook k, outlier quantization scale) become
      // metadata reads, which is exactly what they should cost at 100 TB
      s.conf.set("spark.sql.parquet.aggregatePushDown", "true")
      val path = s"$dir/$name.parquet"
      val raw = s.read.parquet(path)
      nanosCols.getOrElse(name, Nil).foldLeft(raw) { (df, c) =>
        df.schema(c).dataType match {
          case LongType =>
            // Only TIMESTAMP(NANOS) may be rescaled; a plain INT64 ts would
            // also surface as Long and dividing it would corrupt 1000x.
            footerTsUnit(s, path, c) match {
              case Some("NANOS") =>
                df.withColumn(c,
                  timestamp_micros(expr(s"$c div 1000L")).cast(TimestampNTZType))
              case other =>
                sys.error(s"$name.$c is INT64 with logical type $other — " +
                  "refusing to guess a timestamp unit; fix the loader for this encoding")
            }
          case TimestampNTZType => df
          case TimestampType => // TIMESTAMP(MICROS/MILLIS) with UTC adjustment
            df.withColumn(c, col(c).cast(TimestampNTZType))
          case other =>
            sys.error(s"$name.$c has unexpected type $other — a blind cast " +
              "would null out malformed values; fix the loader for this encoding")
        }
      }
    })
}
