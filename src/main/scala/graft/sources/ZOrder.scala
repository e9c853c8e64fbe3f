package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional range pruning —
  * the storage-layout complement of bucketing (equi-joins) and plain
  * range partitioning (single-column ranges): interleaving the bits of
  * two range-filtered columns makes every parquet row group cover a
  * small RECTANGLE of the (a, b) space, so footer min/max stats prune
  * row groups for predicates on EITHER or BOTH columns. A time-sorted
  * 100 TB events table answers `day BETWEEN ...` cheaply but scans
  * everything for `user BETWEEN ...`; the z-ordered layout serves both
  * from the same files.
  *
  * This is layout-only: no engine hook is needed, because Spark's
  * parquet reader already does row-group skipping from pushed
  * predicates on the PLAIN columns — z-ordering just makes those
  * min/max ranges tight. (Delta/Iceberg OPTIMIZE ZORDER is the same
  * idea; Spark has no built-in.) ZOrderSpec measures the pruning
  * directly from the written files' footer stats.
  */
object ZOrder {

  /** The Morton key: interleave the low `bits` bits of two NON-NEGATIVE
    * integer columns (a in the even positions, b in the odd). 21 bits
    * each fills the positive Long range; callers quantize wider domains
    * down first (e.g. epoch-micros → epoch-days). The expression is a
    * 2·bits-term bitwise OR — pure codegen arithmetic, scan-speed. */
  def zkey(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits outside [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` z-ordered on (`ca`, `cb`) into `dir` as `files` parquet
    * files: range-repartition on the z-key (each file owns a contiguous
    * z-range = a small rectangle of the key space) and sort within, so
    * row groups inside each file are tighter still. The key column is
    * dropped from the output — the layout, not the schema, carries it.
    *
    * Columns wider than `bits` bits are auto-scaled by an
    * order-preserving right shift (derived from one max() aggregate —
    * a footer read under aggregate pushdown), so the TOP bits drive
    * the interleave: without this, a user_id domain past 2^bits would
    * alias far-apart ids into the same z-neighborhood and the row-group
    * rectangles — the whole point of the layout — would silently widen.
    * One stats job + one range shuffle, same cost shape as any
    * clustered write. */
  def writeClustered(df: DataFrame, ca: String, cb: String, dir: String,
      files: Int, bits: Int = 21): Unit = {
    require(files >= 1, s"files=$files")
    // min() rides the same stats job as max(): the interleave below uses
    // arithmetic shifts, so a NEGATIVE key value would sign-extend into a
    // scrambled Morton key and the promised two-dimensional pruning would
    // silently vanish (the layout is advisory — results stay correct, so
    // nothing downstream would ever notice). Fail loudly instead.
    val mx = df.agg(max(col(ca).cast("long")), max(col(cb).cast("long")),
      min(col(ca).cast("long")), min(col(cb).cast("long")))
      .head()
    Seq(ca -> 2, cb -> 3).foreach { case (name, i) =>
      val mn = if (mx.isNullAt(i)) 0L else mx.getLong(i)
      require(mn >= 0L,
        s"writeClustered: column '$name' has negative values (min $mn); " +
          "z-order keys must be non-negative — shift or bias the column " +
          "before clustering")
    }
    def shiftFor(i: Int): Int = {
      val m = if (mx.isNullAt(i)) 0L else math.max(0L, mx.getLong(i))
      var s = 0
      while ((m >> s) >= (1L << bits)) s += 1
      s
    }
    val (sa, sb) = (shiftFor(0), shiftFor(1))
    df.withColumn("__zkey",
        zkey(shiftright(col(ca), sa), shiftright(col(cb), sb), bits))
      .repartitionByRange(files, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(dir)
  }
}
