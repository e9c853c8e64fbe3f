package graft.sources

import java.time.ZoneOffset

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.core.AggConfig
import Hdf5Writer._

/** NetCDF-4 (classic model) *output* over [[Hdf5Writer]] — the write side
  * of [[NetCDF4]]: the aggregated frame goes back out as a `.nc` file the
  * reference's own tooling can read (the reference's product IS this
  * file: /root/reference/ncagg/aggregator.py:239-359
  * `initialize_aggregation_file` + `evaluate_aggregation_list`).
  *
  * Encoding conventions are the public netcdf-c ones [[NetCDF4]] reads:
  * every dimension is a dataset with `CLASS = "DIMENSION_SCALE"` and a
  * `_Netcdf4Dimid` (creation-order) attribute; a dimension with no
  * variable gets the "This is a netCDF dimension but not a netCDF
  * variable" NAME marker; each data variable carries a `DIMENSION_LIST`
  * of object references. TIMESTAMP columns become doubles in the
  * variable's CF `units` ("<unit> since <instant>", kept from the config,
  * defaulting to seconds since the epoch); SQL nulls become NaN (floats)
  * or the `_FillValue` (ints, written as a typed attribute so a re-ingest
  * restores the nulls).
  *
  * Scale shape: one `.nc` file is inherently a single-writer artifact
  * (the reference is a single process for the same reason), so
  * [[write]] streams the FINISHED aggregate — already reduced by the
  * distributed pipeline — through the driver: row-buffered up to
  * `maxRows`, then failing over to [[writeSingleStreamed]] (columnar,
  * one chunk in memory, unbounded output size — the reference's own
  * node-by-node streaming, aggregator.py:239-359). For PARALLEL large
  * outputs, [[writeGranules]] writes a partitioned `.nc` granule SET
  * instead: each range partition writes its own file executor-side,
  * fully parallel, and the set re-ingests through [[NetCDFIngest]] (the
  * same granule model the inputs use).
  */
object NetCDFWrite {

  /** Full passes over the sorted frame made by [[writeSingleStreamed]]
    * since the last reset — instrumentation for the NetCdfWriteSpec
    * pass-count pin. The structural invariant: ONE stats aggregate +
    * ONE row pass = 2, independent of variable count (the cache-
    * materializing count() when the caller didn't pre-count is the
    * load, not a pass). A regression back to per-variable column
    * passes bumps this by the variable count. */
  private[graft] val passCounter =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** Storage options for record (unlimited-dim) variables: records per
    * HDF5 chunk (the reference's `-c udim:chunksize`), zlib deflate
    * level, and fletcher32 chunk checksums. `chunkRows = None` writes one
    * chunk per dataset on the in-memory path (clamped to the 4 GiB HDF5
    * chunk limit) but [[DefaultStreamChunkRows]]-row chunks on the
    * streamed path (a single chunk cannot span an unbounded row count);
    * an explicit value (or a variable's configured `chunksizes`) makes
    * the chunking deterministic on both paths. */
  final case class NcOpts(
      chunkRows: Option[Int] = None,
      deflate: Option[Int] = None,
      fletcher32: Boolean = false,
      /** byte-shuffle before deflate (netcdf-c's usual pairing) */
      shuffle: Boolean = false,
      /** per-granule column-stats sidecar (`<granule>.nc.stats.json`,
        * scalar numeric/time min-max) — the pruning metadata HDF5
        * headers cannot carry; [[graft.sources.NetCdfSource]] consumes
        * it to prune range predicates on ANY column, parquet-row-group
        * style. Off = no sidecar = the scan conservatively keeps the
        * granule. */
      stats: Boolean = true)

  /** netcdf-c default fill values (public netcdf.h: NC_FILL_INT,
    * NC_FILL_INT64). */
  val FillInt = -2147483647L
  val FillInt64 = -9223372036854775806L

  private val EpochUnits = "seconds since 1970-01-01 00:00:00"

  // ----------------------------------------------------- column encoding

  private def usOf(v: Any): Long = v match {
    case ldt: java.time.LocalDateTime =>
      ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
    case ins: java.time.Instant =>
      ins.getEpochSecond * 1000000L + ins.getNano / 1000L
    case ts: java.sql.Timestamp =>
      ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L
    case other =>
      throw new IllegalArgumentException(s"not a timestamp: $other")
  }

  private final case class Built(
      dtype: WType, data: Array[Byte], extraAttrs: Seq[(String, WAttrVal)])

  /** An encoding PLAN for one variable: the on-disk type and attrs are
    * decided once (from whole-dataset knowledge), then `put` converts any
    * value batch to bytes — so the streamed path can encode
    * chunk-at-a-time under decisions made from one stats pass, and the
    * in-memory path derives the same decisions from its full batch. */
  private final case class Enc(
      dtype: WType, extraAttrs: Seq[(String, WAttrVal)],
      put: Array[Any] => Array[Byte])

  /** Plan the encoding of one variable. `strWidth` is the cell width for
    * StringType (max UTF-8 bytes + 1 over the WHOLE dataset); `intFits`
    * says every integral value fits 32 bits (whole dataset). */
  private def planEnc(elemType: DataType, v: AggConfig.VarSpec,
      strWidth: Int, intFits: Boolean): Enc = {
    val cfgFillNum = v.attributes.get("_FillValue")
      .flatMap(s => scala.util.Try(s.trim.toDouble).toOption)
    elemType match {
      case TimestampNTZType | TimestampType =>
        val (base, per) = v.attributes.get("units")
          .flatMap(NetCDF4.timeUnits)
          .getOrElse(NetCDF4.timeUnits(EpochUnits).get)
        val unitsAttr =
          if (v.attributes.get("units").flatMap(NetCDF4.timeUnits).isDefined)
            Nil
          else Seq("units" -> WStrAttr(EpochUnits))
        Enc(WF64, unitsAttr, { vals =>
          val b = java.nio.ByteBuffer.allocate(vals.length * 8)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          vals.foreach { x =>
            b.putDouble(if (x == null) Double.NaN else (usOf(x) - base) / per)
          }
          b.array()
        })
      case DoubleType =>
        Enc(WF64, cfgFillNum.map(f => "_FillValue" -> WDoubleAttr(f)).toSeq,
          { vals =>
            val b = java.nio.ByteBuffer.allocate(vals.length * 8)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            vals.foreach { x =>
              b.putDouble(if (x == null) Double.NaN
                else x.asInstanceOf[Number].doubleValue())
            }
            b.array()
          })
      case FloatType =>
        Enc(WF32,
          cfgFillNum.map(f => "_FillValue" -> WFloatAttr(f.toFloat)).toSeq,
          { vals =>
            val b = java.nio.ByteBuffer.allocate(vals.length * 4)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            vals.foreach { x =>
              b.putFloat(if (x == null) Float.NaN
                else x.asInstanceOf[Number].floatValue())
            }
            b.array()
          })
      case LongType | IntegerType | ShortType | ByteType =>
        val narrow = v.datatype.toLowerCase match {
          case "bigint" | "long" | "int64" => false
          case dt => dt.contains("int") || dt.contains("short") ||
            dt.contains("byte")
        }
        val size = if (narrow && intFits) 4 else 8
        val fill = cfgFillNum.map(_.toLong)
          .getOrElse(if (size == 4) FillInt else FillInt64)
        Enc(WInt(size), Seq("_FillValue" -> WLongAttr(fill, size)),
          { vals =>
            val b = java.nio.ByteBuffer.allocate(vals.length * size)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            vals.foreach { x =>
              val l = if (x == null) fill
                else x.asInstanceOf[Number].longValue()
              if (size == 4) b.putInt(l.toInt) else b.putLong(l)
            }
            b.array()
          })
      case StringType =>
        val width = math.max(strWidth, 1)
        Enc(WStr(width), Nil, { vals =>
          val out = new Array[Byte](vals.length * width)
          vals.zipWithIndex.foreach { case (s0, i) =>
            val raw = (if (s0 == null) "" else s0.toString).getBytes("UTF-8")
            System.arraycopy(raw, 0, out, i * width,
              math.min(raw.length, width - 1))
          }
          out
        })
      case BooleanType =>
        Enc(WInt(1, signed = false), Nil, _.map {
          case null => 0.toByte
          case b: java.lang.Boolean => if (b) 1.toByte else 0.toByte
        })
      case other =>
        throw new IllegalArgumentException(
          s"cannot write column type ${other.simpleString} to NetCDF")
    }
  }

  /** Encode flat element values (row-major, nulls = fill) for one
    * variable — the in-memory path: encoding decisions derive from the
    * full batch (same results as before the plan/put split). */
  private def encode(vals: Array[Any], elemType: DataType,
      v: AggConfig.VarSpec): Built = {
    // maxOption: a zero-row record variable must write an empty dataset,
    // not crash on empty.max
    val strWidth = elemType match {
      case StringType => vals.map {
        case null => 0
        case s => s.toString.getBytes("UTF-8").length
      }.maxOption.getOrElse(0) + 1
      case _ => 1
    }
    val intFits = elemType match {
      case LongType | IntegerType | ShortType | ByteType =>
        vals.forall { x =>
          x == null || {
            val l = x.asInstanceOf[Number].longValue()
            l >= Int.MinValue && l <= Int.MaxValue
          }
        }
      case _ => true
    }
    val e = planEnc(elemType, v, strWidth, intFits)
    Built(e.dtype, e.put(vals), e.extraAttrs)
  }

  // --------------------------------------------------------- file build

  /** Build one `.nc` file from rows in record order. Only the config's
    * variables are written (pipeline bookkeeping columns like `is_fill`
    * stay out of the product, matching the reference output's shape). */
  def writeFile(dst: java.nio.file.Path, schema: StructType,
      rows: collection.IndexedSeq[Row], config: AggConfig.Config,
      globalAttrs: Map[String, String], opts: NcOpts = NcOpts()): Unit = {
    val n = rows.size
    val recDim = config.primaryUdim
      .orElse(config.dims.find(_.isUnlimited))
      .map(_.name)
      .getOrElse(config.dims.headOption.map(_.name).getOrElse("record"))
    val fieldIdx = schema.fieldNames.zipWithIndex.toMap
    val outVars = config.vars.filter(v =>
      fieldIdx.contains(v.mapTo.getOrElse(v.name)))

    // resolved dimension sizes: record dim = row count; fixed dims from
    // the config, falling back to the MAX observed array length across
    // every row of every variable on the dim — covering [recDim, dn]
    // record vars and 1-D non-record vars, and sizing a ragged column
    // (a second unlimited dim is packed-left arrays of varying length,
    // see Hdf5Reader's multi-unlim model) to its longest row so shorter
    // rows pad with fill instead of longer rows being truncated
    def observedInner(dn: String): Option[Long] = {
      val lens = for {
        v <- outVars
        if (v.dimensions == Seq(recDim, dn) && dn != recDim) ||
          (v.dimensions == Seq(dn) && dn != recDim)
        i = fieldIdx(v.mapTo.getOrElse(v.name))
        row <- rows.iterator
        s <- Option(row.get(i)).collect { case s: scala.collection.Seq[_] => s }
      } yield s.length.toLong
      lens.maxOption
    }
    val dimSize: Map[String, Long] = config.dims.map { d =>
      d.name -> (
        if (d.name == recDim) n.toLong
        else d.size.filter(_ > 0)
          // filter(_ > 0): every row's array may be EMPTY — a 0-length
          // inner dim would break the shape==data invariant (innerN is
          // floored at 1); write a 1-wide fill column instead
          .orElse(observedInner(d.name).filter(_ > 0))
          .getOrElse(1L))
    }.toMap

    // flat element values per variable + its dataset shape
    def flatVals(v: AggConfig.VarSpec): (Seq[Long], Array[Any], DataType) = {
      val outName = v.mapTo.getOrElse(v.name)
      val i = fieldIdx(outName)
      val fieldType = schema(outName).dataType
      val innerDims = if (v.dimensions.headOption.contains(recDim))
        v.dimensions.drop(1) else v.dimensions
      val inner = innerDims.map(dimSize.getOrElse(_, 1L))
      require(inner.product <= Int.MaxValue,
        s"$outName: inner extent ${inner.product} exceeds the " +
          "per-record element bound")
      val innerN = inner.product.toInt max 1
      def elems(x: Any): Array[Any] = (x, fieldType) match {
        case (s: scala.collection.Seq[_], _: ArrayType) =>
          val a = s.toArray[Any]
          if (a.length == innerN) a
          else { // pad with nulls / truncate to the configured inner size
            val out = new Array[Any](innerN)
            System.arraycopy(a, 0, out, 0, math.min(a.length, innerN))
            out
          }
        case (null, _: ArrayType) => new Array[Any](innerN)
        case (x0, _) => Array[Any](x0)
      }
      if (v.dimensions.headOption.contains(recDim)) {
        val out = new Array[Any](n * innerN)
        var r = 0
        while (r < n) {
          val e = elems(rows(r).get(i))
          System.arraycopy(e, 0, out, r * innerN, innerN)
          r += 1
        }
        (n.toLong +: inner, out,
          fieldType match { case ArrayType(t, _) => t; case t => t })
      } else {
        // constant (non-record) variable: first non-null record's value,
        // like the reference copying static vars from the first granule
        val x = rows.iterator.map(_.get(i)).collectFirst {
          case v0 if v0 != null => v0
        }.orNull
        (inner, elems(x),
          fieldType match { case ArrayType(t, _) => t; case t => t })
      }
    }

    val dimIds = config.dims.map(_.name).zipWithIndex.toMap
    val coordVars = outVars.filter(v =>
      dimIds.contains(v.mapTo.getOrElse(v.name))).map(v =>
      v.mapTo.getOrElse(v.name)).toSet

    def scaleAttrs(dimName: String, phonySize: Option[Long])
        : Seq[(String, WAttrVal)] = Seq(
      "CLASS" -> WStrAttr("DIMENSION_SCALE"),
      "NAME" -> WStrAttr(phonySize match {
        case Some(sz) =>
          "This is a netCDF dimension but not a netCDF variable." +
            f"$sz%10d"
        case None => dimName
      }),
      "_Netcdf4Dimid" -> WLongAttr(dimIds(dimName).toLong, 4))

    def userAttrs(v: AggConfig.VarSpec): Seq[(String, WAttrVal)] =
      v.attributes.toSeq.sortBy(_._1).collect {
        case (k, s) if k != "_FillValue" => k -> WStrAttr(s)
      }

    def varDataset(v: AggConfig.VarSpec): WDataset = {
      val outName = v.mapTo.getOrElse(v.name)
      val (shape, vals, elemT) = flatVals(v)
      val built = encode(vals, elemT, v)
      val isCoord = coordVars(outName)
      val dimList =
        if (isCoord) Nil
        else Seq("DIMENSION_LIST" -> WDimListAttr(
          v.dimensions.filter(dimIds.contains)))
      val scale =
        if (isCoord) scaleAttrs(outName, None) else Nil
      val unlim = v.dimensions.headOption.contains(recDim) &&
        config.dim(recDim).exists(_.isUnlimited)
      // chunk extent: CLI/caller option first, else the variable's own
      // configured chunksizes (reference template field; record dim leads)
      val cr = if (!unlim) None
        else opts.chunkRows.orElse(
          v.chunksizes.flatMap(_.headOption).filter(_ > 0))
          .filter(_ < shape.headOption.getOrElse(0L))
      WDataset(outName, shape, built.dtype, Some(built.data),
        scale ++ userAttrs(v) ++ built.extraAttrs ++
          (if (v.dimensions.nonEmpty && !isCoord) dimList else Nil),
        unlimited0 = unlim,
        fletcher32 = unlim && opts.fletcher32,
        chunkRows = cr,
        deflate = if (unlim) opts.deflate else None,
        shuffle = unlim && opts.shuffle)
    }

    // phony dims (no variable of the same name) are bare scales
    val phonyDims = config.dims.filterNot(d => coordVars(d.name)).map { d =>
      WDataset(d.name, Seq(dimSize(d.name)), WF32, None,
        scaleAttrs(d.name, Some(dimSize(d.name))),
        unlimited0 = d.name == recDim && d.isUnlimited)
    }
    val coordDatasets = outVars.filter(v => coordVars(v.mapTo.getOrElse(v.name)))
      .map(varDataset)
    val dataDatasets = outVars.filterNot(v => coordVars(v.mapTo.getOrElse(v.name)))
      .map(varDataset)

    // dimension-scale datasets first so DIMENSION_LIST references resolve
    Hdf5Writer.write(dst,
      (phonyDims ++ coordDatasets) ++ dataDatasets,
      globalAttrs.toSeq.sortBy(_._1).map { case (k, s) => k -> WStrAttr(s) })
    if (opts.stats) writeStatsSidecar(dst, schema, rows, outVars, fieldIdx)
  }

  /** Per-granule column-stats sidecar: `<granule>.nc.stats.json` holding
    * `{"col": [min, max], ...}` for every SCALAR numeric/timestamp
    * output variable (timestamps in epoch micros — the unit the scan's
    * literal bounds already use). This is the pruning metadata parquet
    * carries in row-group footers and HDF5 headers cannot: with it, a
    * range predicate on ANY stats-covered column prunes non-matching
    * granules without opening them ([[graft.sources.NetCdfSource]]);
    * without it (foreign granules, `stats = false`) the scan keeps the
    * granule — the sidecar only ever NARROWS I/O. One extra pass over
    * the in-memory row buffer per granule; nulls and NaNs are skipped,
    * an all-null column is omitted. */
  private def writeStatsSidecar(dst: java.nio.file.Path,
      schema: StructType, rows: collection.IndexedSeq[Row],
      outVars: Seq[AggConfig.VarSpec], fieldIdx: Map[String, Int]): Unit = {
    val entries = outVars.flatMap { v =>
      val outName = v.mapTo.getOrElse(v.name)
      val i = fieldIdx(outName)
      val toD: Any => Option[Double] = schema(outName).dataType match {
        case TimestampNTZType | TimestampType =>
          x => scala.util.Try(usOf(x).toDouble).toOption
        case _: NumericType => {
          case n: Number =>
            val d = n.doubleValue()
            if (d.isNaN) None else Some(d)
          case _ => None
        }
        case _ => null // non-scalar / non-orderable: no stats entry
      }
      if (toD == null) None
      else {
        var mn = Double.PositiveInfinity
        var mx = Double.NegativeInfinity
        var seen = false
        rows.foreach { r =>
          if (!r.isNullAt(i)) toD(r.get(i)).foreach { d =>
            seen = true
            if (d < mn) mn = d
            if (d > mx) mx = d
          }
        }
        if (seen) Some(outName -> (mn, mx)) else None
      }
    }
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val json = entries.sortBy(_._1).map { case (c, (mn, mx)) =>
      s""""${esc(c)}": [$mn, $mx]"""
    }.mkString("{", ", ", "}")
    java.nio.file.Files.writeString(
      dst.resolveSibling(dst.getFileName.toString + ".stats.json"), json)
  }

  // ------------------------------------------------------------- fronts

  /** The sort/order column of an aggregated frame (scalar `index_time`
    * stands in for a multidim index variable, matching Aggregate.run). */
  private def sortColOf(config: AggConfig.Config, columns: Set[String])
      : Option[String] =
    config.primaryUdim.flatMap(_.indexBy).map { ivar =>
      if (columns.contains("index_time")) "index_time" else ivar
    }.filter(columns.contains)

  /** Row-count switchover for the single-file path: up to this many rows
    * the frame is row-buffered driver-side (fast, one pass); above it,
    * [[write]] fails over to the streamed columnar assembly
    * ([[writeSingleStreamed]]: bounded memory, K column passes). */
  val DefaultSingleFileMaxRows: Long = 16L << 20

  /** Write an aggregated parquet output (as produced by
    * [[graft.Aggregate.run]]) back out as ONE `.nc` file, global attrs
    * from its `_global_attrs.json` sidecar unless given explicitly.
    *
    * Scale guard: counts first; above `maxRows` the write FAILS OVER to
    * [[writeSingleStreamed]] — columnar, one chunk in driver memory,
    * unbounded output size — so a corpus-sized single `.nc` always
    * succeeds with bounded memory (the reference's single process
    * streams node-by-node into one file the same way,
    * aggregator.py:239-359; [[writeGranules]] / CLI `.ncd` remains the
    * PARALLEL path). Under the gate the rows stream to the driver per
    * range-partition (`toLocalIterator`) instead of one all-partitions
    * `collect()`, so peak driver memory is the row buffer plus ONE
    * partition's fetch block, not 2x the frame. */
  def write(spark: SparkSession, srcParquet: String, dst: String,
      config: AggConfig.Config,
      globalAttrs: Option[Map[String, String]] = None,
      opts: NcOpts = NcOpts(),
      maxRows: Long = DefaultSingleFileMaxRows): Unit = {
    val df = spark.read.parquet(srcParquet)
    val total = df.count()
    if (total > maxRows) {
      // CORPUS-SIZED single file: fail over to the streamed columnar
      // assembly — one variable at a time, one chunk in driver memory —
      // the same node-by-node streaming model the reference uses
      // (aggregator.py:239-359). writeGranules (CLI: .ncd) remains the
      // PARALLEL scale path; this one is single-writer but bounded-memory.
      writeSingleStreamed(spark, srcParquet, dst, config, globalAttrs, opts,
        knownTotal = Some(total))
      return
    }
    val sorted = sortColOf(config, df.columns.toSet)
      .map(c => df.orderBy(col(c))).getOrElse(df)
    val attrs = globalAttrs.getOrElse(readSidecar(srcParquet))
    val buf = new scala.collection.mutable.ArrayBuffer[Row](total.toInt)
    val it = sorted.toLocalIterator()
    while (it.hasNext) buf += it.next()
    writeFile(java.nio.file.Paths.get(dst), sorted.schema,
      buf, config, attrs, opts)
  }

  /** Default record count per streamed chunk (bounded further so one
    * chunk stays under ~256 MiB). */
  val DefaultStreamChunkRows: Int = 1 << 18

  /** Streamed single-file `.nc` assembly for outputs too large to hold
    * driver-side: ONE stats job plans every variable's encoding (string
    * width, int narrowing, ragged inner-dim extents), then each record
    * variable streams through the driver column-at-a-time in
    * `chunkRows`-row chunks ([[Hdf5Writer.StreamWriter.datasetChunks]]).
    * Peak driver memory is one chunk (≤ ~256 MiB), independent of row
    * count; the output file size is unbounded (64-bit writer sink).
    * Single-writer by construction — wall-clock is K linear passes over
    * the cached sorted frame (the reference's own streaming model);
    * [[writeGranules]] stays the parallel path. */
  def writeSingleStreamed(spark: SparkSession, srcParquet: String,
      dst: String, config: AggConfig.Config,
      globalAttrs: Option[Map[String, String]] = None,
      opts: NcOpts = NcOpts(),
      knownTotal: Option[Long] = None): Unit = {
    import org.apache.spark.sql.functions.{expr, max, min, size}
    val df = spark.read.parquet(srcParquet)
    val attrs = globalAttrs.getOrElse(readSidecar(srcParquet))
    // TOTAL-ORDER sort: the K column passes must see the SAME row order
    // even if a cached partition is evicted and recomputed mid-write — a
    // sort on the index column alone leaves tie order shuffle-dependent,
    // which would tear records across columns. Tie-breaking on every
    // remaining column makes reordering observable only between fully
    // identical rows, where it cannot change the output.
    val sorted = sortColOf(config, df.columns.toSet)
      .map { c =>
        df.orderBy((col(c) +: df.columns.filterNot(_ == c)
          .map(n => col(s"`$n`"))): _*)
      }
      .getOrElse(df)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the count doubles as cache materialization when not pre-counted
      val total = knownTotal.getOrElse(sorted.count())
      val schema = sorted.schema
      val fieldIdx = schema.fieldNames.zipWithIndex.toMap
      val recDim = config.primaryUdim
        .orElse(config.dims.find(_.isUnlimited))
        .map(_.name)
        .getOrElse(config.dims.headOption.map(_.name).getOrElse("record"))
      val outVars = config.vars.filter(v =>
        fieldIdx.contains(v.mapTo.getOrElse(v.name)))

      // ---- ONE stats job: per-variable string width / int range /
      // observed inner length (the global decisions planEnc needs)
      val aggs = Seq.newBuilder[org.apache.spark.sql.Column]
      outVars.foreach { v =>
        val c = v.mapTo.getOrElse(v.name)
        val (elemT, isArr) = schema(c).dataType match {
          case ArrayType(t, _) => (t, true)
          case t => (t, false)
        }
        elemT match {
          case StringType =>
            aggs += (if (isArr)
              max(expr(s"aggregate(`$c`, 0, (a, x) -> greatest(a, octet_length(x)))"))
            else max(expr(s"octet_length(`$c`)"))).as(s"__w_$c")
          case LongType | IntegerType | ShortType | ByteType =>
            aggs += (if (isArr)
              min(expr(s"aggregate(`$c`, ${Long.MaxValue}L, (a, x) -> least(a, CAST(x AS BIGINT)))"))
            else min(col(s"`$c`").cast(org.apache.spark.sql.types.LongType)))
              .as(s"__lo_$c")
            aggs += (if (isArr)
              max(expr(s"aggregate(`$c`, ${Long.MinValue}L, (a, x) -> greatest(a, CAST(x AS BIGINT)))"))
            else max(col(s"`$c`").cast(org.apache.spark.sql.types.LongType)))
              .as(s"__hi_$c")
          case _ => ()
        }
        if (isArr) aggs += max(size(col(s"`$c`"))).as(s"__n_$c")
      }
      val aggCols = aggs.result()
      val stats: Map[String, Any] =
        if (aggCols.isEmpty) Map.empty
        else {
          passCounter.incrementAndGet()
          val r = sorted.agg(aggCols.head, aggCols.tail: _*).head()
          r.schema.fieldNames.zipWithIndex.map { case (n, i) =>
            n -> r.get(i)
          }.toMap
        }
      def statLong(key: String, dflt: Long): Long =
        stats.get(key).flatMap(Option(_))
          .map(_.asInstanceOf[Number].longValue()).getOrElse(dflt)

      // ---- dimension sizes: record = total; fixed from config, else the
      // observed max inner length (ragged second-dim rule of writeFile)
      def observedInner(dn: String): Option[Long] = {
        val lens = outVars.filter(v =>
          (v.dimensions == Seq(recDim, dn) && dn != recDim) ||
            (v.dimensions == Seq(dn) && dn != recDim))
          .map(v => statLong(s"__n_${v.mapTo.getOrElse(v.name)}", 0L))
          .filter(_ > 0)
        if (lens.isEmpty) None else Some(lens.max)
      }
      val dimSize: Map[String, Long] = config.dims.map { d =>
        d.name -> (
          if (d.name == recDim) total
          else d.size.filter(_ > 0)
            .orElse(observedInner(d.name))
            .getOrElse(1L))
      }.toMap

      val dimIds = config.dims.map(_.name).zipWithIndex.toMap
      val coordVars = outVars.filter(v =>
        dimIds.contains(v.mapTo.getOrElse(v.name))).map(v =>
        v.mapTo.getOrElse(v.name)).toSet

      def scaleAttrs(dimName: String, phonySize: Option[Long])
          : Seq[(String, WAttrVal)] = Seq(
        "CLASS" -> WStrAttr("DIMENSION_SCALE"),
        "NAME" -> WStrAttr(phonySize match {
          case Some(sz) =>
            "This is a netCDF dimension but not a netCDF variable." +
              f"$sz%10d"
          case None => dimName
        }),
        "_Netcdf4Dimid" -> WLongAttr(dimIds(dimName).toLong, 4))

      def userAttrs(v: AggConfig.VarSpec): Seq[(String, WAttrVal)] =
        v.attributes.toSeq.sortBy(_._1).collect {
          case (k, s) if k != "_FillValue" => k -> WStrAttr(s)
        }

      def planFor(v: AggConfig.VarSpec, elemT: DataType): Enc = {
        val c = v.mapTo.getOrElse(v.name)
        val strWidth = statLong(s"__w_$c", 0L).toInt + 1
        val lo = statLong(s"__lo_$c", 0L)
        val hi = statLong(s"__hi_$c", 0L)
        planEnc(elemT, v, strWidth,
          intFits = lo >= Int.MinValue && hi <= Int.MaxValue)
      }

      def elemsOf(x: Any, innerN: Int, isArr: Boolean): Array[Any] =
        if (!isArr) Array[Any](x)
        else x match {
          case null => new Array[Any](innerN)
          case s: scala.collection.Seq[_] =>
            val a = s.toArray[Any]
            if (a.length == innerN) a
            else {
              val out = new Array[Any](innerN)
              System.arraycopy(a, 0, out, 0, math.min(a.length, innerN))
              out
            }
        }

      Hdf5Writer.streamTo(java.nio.file.Paths.get(dst)) { w =>
        // phony dims first (bare scales), then coord vars, then data vars
        config.dims.filterNot(d => coordVars(d.name)).foreach { d =>
          w.dataset(WDataset(d.name, Seq(dimSize(d.name)), WF32, None,
            scaleAttrs(d.name, Some(dimSize(d.name))),
            unlimited0 = d.name == recDim && d.isUnlimited))
        }

        // ---- plan every output variable up front (coords before data
        // vars — DIMENSION_LIST referencing order), then run ONE data
        // pass: record variables append interleaved chunk streams
        // ([[Hdf5Writer.StreamWriter.openChunked]]), constant variables
        // capture their first non-null value in row order (writeFile's
        // rule) from the same rows. Pass count is structural: the stats
        // aggregate + this row pass — 2, independent of variable count
        // (the reference likewise streams all variables in one
        // node-by-node traversal, aggregator.py:239-359).
        final case class Planned(v: AggConfig.VarSpec, outName: String,
            fi: Int, enc: Enc, isArr: Boolean, isCoord: Boolean,
            inner: Seq[Long], innerN: Int,
            attrsOut: Seq[(String, WAttrVal)])
        val ordered = outVars.filter(v =>
          coordVars(v.mapTo.getOrElse(v.name))) ++
          outVars.filterNot(v => coordVars(v.mapTo.getOrElse(v.name)))
        val planned = ordered.map { v =>
          val outName = v.mapTo.getOrElse(v.name)
          val (elemT, isArr) = schema(outName).dataType match {
            case ArrayType(t, _) => (t, true)
            case t => (t, false)
          }
          val isCoord = coordVars(outName)
          val isRec = v.dimensions.headOption.contains(recDim)
          val innerDims = if (isRec) v.dimensions.drop(1) else v.dimensions
          val inner = innerDims.map(dimSize.getOrElse(_, 1L))
          require(inner.product <= Int.MaxValue,
            s"$outName: inner extent ${inner.product} exceeds the " +
              "per-record element bound — a silent Int wrap here would " +
              "write garbage-width rows against a wider declared shape")
          val innerN = inner.product.toInt max 1
          val enc = planFor(v, elemT)
          val dimList =
            if (isCoord) Nil
            else Seq("DIMENSION_LIST" -> WDimListAttr(
              v.dimensions.filter(dimIds.contains)))
          val attrsOut =
            (if (isCoord) scaleAttrs(outName, None) else Nil) ++
              userAttrs(v) ++ enc.extraAttrs ++
              (if (v.dimensions.nonEmpty && !isCoord) dimList else Nil)
          Planned(v, outName, fieldIdx(outName), enc, isArr, isCoord,
            inner, innerN, attrsOut)
        }
        val (recPlans, constPlans) = planned.partition(
          _.v.dimensions.headOption.contains(recDim))

        // one interleaved stream per record variable; the per-chunk
        // memory budget (~256 MiB of logical bytes) is SHARED across
        // the simultaneously-open streams so total buffered data stays
        // bounded regardless of variable count
        final class RecState(val p: Planned,
            val cr: Int, val logical: Int,
            val stream: Hdf5Writer.ChunkStream) {
          val buf = new scala.collection.mutable.ArrayBuffer[Any](
            cr * p.innerN)
          var rowsInBuf = 0
        }
        val nRec = math.max(1, recPlans.size)
        val recStates = recPlans.map { p =>
          require(config.dim(recDim).exists(_.isUnlimited),
            s"${p.outName}: streamed single-file output needs the record " +
              s"dimension $recDim to be unlimited (chunked layout)")
          val rowBytes = p.innerN.toLong * p.enc.dtype.size
          require(rowBytes > 0 && rowBytes <= Int.MaxValue,
            s"${p.outName}: one record is $rowBytes B (${p.innerN} elems " +
              s"x ${p.enc.dtype.size} B cells) — exceeds the per-chunk " +
              "addressable bound; narrow the cell width or split the " +
              "variable")
          val crReq = opts.chunkRows.orElse(
            p.v.chunksizes.flatMap(_.headOption).filter(_ > 0))
            .getOrElse(DefaultStreamChunkRows).toLong
          val cr = math.max(1L, math.min(math.min(crReq, total max 1L),
            ((1L << 28) / nRec) / math.max(rowBytes, 1L))).toInt
          val logicalL = cr.toLong * rowBytes
          require(logicalL <= Int.MaxValue,
            s"${p.outName}: chunk of $cr rows x $rowBytes B/row does not " +
              "fit one byte array; lower chunkRows")
          val stream = w.openChunked(WDataset(p.outName,
            total +: p.inner, p.enc.dtype, None, p.attrsOut,
            unlimited0 = true, fletcher32 = opts.fletcher32,
            chunkRows = Some(cr), deflate = opts.deflate,
            shuffle = opts.shuffle))
          new RecState(p, cr, logicalL.toInt, stream)
        }
        val constVals = new Array[Any](constPlans.size)
        val constSeen = new Array[Boolean](constPlans.size)

        def flush(rs: RecState): Unit = {
          val bytes = rs.p.enc.put(rs.buf.toArray)
          w.appendChunk(rs.stream,
            if (bytes.length == rs.logical) bytes
            else java.util.Arrays.copyOf(bytes, rs.logical)) // edge: pad
          rs.buf.clear()
          rs.rowsInBuf = 0
        }

        // ---- THE single data pass
        passCounter.incrementAndGet()
        val rowIt = sorted.toLocalIterator()
        while (rowIt.hasNext) {
          val row = rowIt.next()
          recStates.foreach { rs =>
            rs.buf ++= elemsOf(row.get(rs.p.fi), rs.p.innerN, rs.p.isArr)
            rs.rowsInBuf += 1
            if (rs.rowsInBuf == rs.cr) flush(rs)
          }
          var ci = 0
          while (ci < constPlans.size) {
            if (!constSeen(ci)) {
              val x = row.get(constPlans(ci).fi)
              if (x != null) { constVals(ci) = x; constSeen(ci) = true }
            }
            ci += 1
          }
        }
        // constant (non-record) variables: first non-null value in row
        // order, like the reference copying static vars from the first
        // granule — registered BEFORE the record streams close so a
        // constant coordinate's dataset precedes any DIMENSION_LIST
        // that references it
        constPlans.zipWithIndex.foreach { case (p, ci) =>
          val vals = elemsOf(constVals(ci), p.innerN, p.isArr)
          w.dataset(WDataset(p.outName, p.inner, p.enc.dtype,
            Some(p.enc.put(vals)), p.attrsOut))
        }
        recStates.foreach { rs =>
          if (rs.rowsInBuf > 0) flush(rs)
          w.closeChunked(rs.stream)
        }
        w.finish(attrs.toSeq.sortBy(_._1).map { case (k, s) =>
          k -> WStrAttr(s)
        })
      }
    } finally sorted.unpersist()
  }

  /** Distributed `.nc` granule-SET output: range-partition on the index
    * column and write one `.nc` file per partition executor-side (the
    * scale path — a single `.nc` is single-writer by construction). The
    * output set re-ingests through [[NetCDFIngest.convert]]. Requires
    * `dstDir` to be a filesystem path visible to the executors. */
  def writeGranules(df: DataFrame, dstDir: String,
      config: AggConfig.Config, globalAttrs: Map[String, String],
      maxRecordsPerFile: Int = 1 << 20,
      opts: NcOpts = NcOpts(),
      /** granule file-name prefix — an APPENDING writer (the
        * `format("netcdf")` sink) passes a job-unique prefix so two
        * jobs' `part-00000.nc` never collide */
      namePrefix: String = "part"): Seq[String] = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dstDir))
    val sortCol = sortColOf(config, df.columns.toSet)
    // Persist before the sizing count: the count job and the write job
    // would otherwise each execute the full upstream lineage — doubling
    // the most expensive scan in exactly the scale path this method
    // exists for. The write pass reads back from the cache (spilling to
    // local disk when the aggregate exceeds executor memory).
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val total = cached.count()
      val parts = math.max(1, math.ceil(total.toDouble /
        math.max(maxRecordsPerFile, 1)).toInt)
      val arranged = sortCol match {
        case Some(c) if parts > 1 =>
          cached.repartitionByRange(parts, col(c)).sortWithinPartitions(col(c))
        case Some(c) => cached.coalesce(1).sortWithinPartitions(col(c))
        case None => cached.coalesce(parts)
      }
      val schema = arranged.schema
      arranged.foreachPartition { (it: Iterator[Row]) =>
        val rows = it.toIndexedSeq
        if (rows.nonEmpty) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          writeFile(
            java.nio.file.Paths.get(dstDir, f"$namePrefix%s-$pid%05d.nc"),
            schema, rows, config, globalAttrs, opts)
        }
      }
    } finally cached.unpersist()
    // keep the fleet-level planning manifest fresh: unchanged granules
    // reuse their prior entries (size-stat only), new ones cost one
    // header parse each — so the per-batch refresh of a streaming feed
    // stays O(new granules), while readers plan the whole store without
    // opening any header (refreshFleetManifest skips compaction temp
    // dirs; the compactor refreshes the real store after its swap)
    refreshFleetManifest(dstDir, config.primaryUdim.map(_.name))
    Option(new java.io.File(dstDir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".nc")).map(_.getPath).sorted.toSeq
  }

  // ------------------------------------------------- granule compaction

  /** Outcome of one [[compactGranules]] run. */
  final case class CompactReport(
      nBefore: Int, nAfter: Int,
      /** new merged granules moved into the store */
      compacted: Seq[String],
      /** original small granules removed */
      removed: Seq[String],
      /** untouched granules */
      kept: Seq[String])

  private val CompactTmpName = ".compact.tmp"
  private val ManifestName = "_compact_manifest.json"

  /** Small-granule compaction — the OPTIMIZE pass for a granule store.
    * A long-running feed (the streaming `.nc` sink's one-granule-per-
    * micro-batch cadence especially) accretes many under-filled
    * granules; each costs a header parse at planning time and a
    * too-small split at scan time, so at fleet scale the store slowly
    * drowns in file-open overhead — the classic small-files problem,
    * here for `.nc` instead of parquet.
    *
    * Granules holding fewer than `targetRecords / 2` records (the
    * half-full rule — also the CONVERGENCE guard: output granules of
    * a range-partitioned rewrite land near-even and must not re-qualify
    * on the next run) are read back through the V2 source (chunk-pruned,
    * record-range split) and rewritten via [[writeGranules]] — so when
    * the config declares a sort coordinate the merged granules come out
    * range-partitioned and sorted, with DISJOINT coordinate ranges:
    * compaction tightens sorted-range pruning rather than eroding it.
    * Full granules are never touched or re-written; per-granule column-
    * stats sidecars regenerate with the rewrite (`opts.stats`).
    *
    * Crash safety is a staged roll-forward swap (the same discipline as
    * `ml.Similarity.retrainIndex`): merged granules land in a hidden
    * temp subdir (invisible to the source's directory listing, which
    * takes plain files only); a manifest naming the originals is
    * written only after EVERY merged granule is complete; then files
    * move into the store (same-filesystem renames) and the originals
    * are deleted. A crash before the manifest discards the temp dir on
    * the next run (store unchanged); a crash after it ROLLS FORWARD —
    * the next [[compactGranules]] call finishes the moves and deletes
    * before doing anything else, and until that happens BATCH READS
    * stay consistent too: the scan's directory listing consults the
    * pending manifest and reads either the pre- or post-compaction
    * view, never a double-counting mix
    * ([[NetCdfSource.expandLenient]]). Single-maintainer contract is
    * ENFORCED: the run holds the store's `_LOCK`
    * ([[graft.util.StoreState.withLock]]) — a second concurrent
    * compaction (or manifest backfill) fails loudly, naming the holder
    * and the remedy, without touching the store. Do not run against a
    * directory a STREAMING reader is tailing (replaced granules would
    * double-count there — batch scans between runs are fine). */
  def compactGranules(spark: SparkSession, dir: String,
      config: AggConfig.Config,
      globalAttrs: Map[String, String] = null,
      targetRecords: Int = 1 << 20,
      opts: NcOpts = NcOpts()): CompactReport =
    graft.util.StoreState.withLock(spark, dir, "compactGranules") {
      doCompactGranules(spark, dir, config, globalAttrs, targetRecords,
        opts)
    }

  private def doCompactGranules(spark: SparkSession, dir: String,
      config: AggConfig.Config,
      globalAttrs: Map[String, String],
      targetRecords: Int,
      opts: NcOpts): CompactReport = {
    val dirPath = java.nio.file.Paths.get(dir)
    finishPendingCompaction(dirPath)
    val attrs = Option(globalAttrs).getOrElse(readSidecar(dir))
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && f.getName.endsWith(".nc"))
      .map(_.getPath).sorted.toSeq
    val recDimName = config.primaryUdim.map(_.name)
    def recordsOf(p: String): Long = {
      val nc = NetCDF4.open(p)
      try {
        val rd = recDimName.getOrElse(NetCDFIngest.recordDimOf(nc))
        nc.dims.find(_.name == rd).map(_.size).getOrElse(0L)
      } finally nc.close()
    }
    val sized = files.map(p => p -> recordsOf(p))
    val small = sized.filter(_._2 < (targetRecords.toLong + 1) / 2)
      .map(_._1)
    if (small.size < 2) {
      // a crashed run may have just rolled forward above — keep the
      // fleet manifest in step with the store even on the no-op path
      refreshFleetManifest(dir, recDimName)
      return CompactReport(files.size, files.size, Nil, Nil, files)
    }
    val kept = files.filterNot(small.toSet)
    val tmp = dirPath.resolve(CompactTmpName)
    deleteTreeQuietly(tmp)
    java.nio.file.Files.createDirectories(tmp)
    var reader = spark.read.format("netcdf")
    recDimName.foreach(d => reader = reader.option("recdim", d))
    val df = reader.load(small: _*)
    // CONVERGENCE: size the rewrite from the records we just counted so
    // no output granule re-qualifies as small next run. A plain
    // ceil(total/target) part count leaves a remainder partition (and
    // range sampling can skew any partition) under target/2, which
    // would be rewritten again on EVERY subsequent call. Floor the part
    // count instead (merged granules land in [target, 2*target) on
    // average) and hand writeGranules the matching per-part target so
    // its own ceil reproduces exactly this count.
    val totalSmall = sized.filter(p => small.contains(p._1)).map(_._2).sum
    val parts = math.max(1L, totalSmall / math.max(targetRecords, 1))
    val effTarget = math.min(Int.MaxValue.toLong,
      (totalSmall + parts - 1L) / parts).toInt
    // name uniqueness across runs: wall-clock millis prefix (two runs
    // of the same store never collide; lexical order within one run
    // comes from writeGranules' zero-padded partition ids)
    val stamp = System.currentTimeMillis()
    writeGranules(df, tmp.toString, config, attrs,
      maxRecordsPerFile = effTarget, opts = opts,
      namePrefix = f"compact-$stamp%013d")
    val stagedNames = Option(tmp.toFile.listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && (f.getName.endsWith(".nc") ||
        f.getName.endsWith(".nc.stats.json")))
      .map(_.getName).sorted.toSeq
    writeCompactManifest(tmp,
      small.map(p => java.nio.file.Paths.get(p).getFileName.toString),
      stagedNames)
    val moved = swapIn(tmp, dirPath,
      small.map(p => java.nio.file.Paths.get(p).getFileName.toString))
    refreshFleetManifest(dir, recDimName)
    CompactReport(files.size, kept.size + moved.size, moved, small, kept)
  }

  /** [[compactGranules]] with the config derived from the store itself
    * (scan schema → [[NetCdfSource.configFromSchema]], the SAME
    * derivation the `format("netcdf")` sink used to write it) — the
    * convenience form for sink-written stores, which never had a
    * user-authored config. */
  def compactGranules(spark: SparkSession, dir: String,
      recDim: String, indexBy: Option[String],
      targetRecords: Int, opts: NcOpts): CompactReport = {
    val schema = spark.read.format("netcdf").load(dir).schema
    compactGranules(spark, dir,
      NetCdfSource.configFromSchema(schema, recDim, indexBy),
      null, targetRecords, opts)
  }

  /** Roll forward (manifest present: finish moves + deletes) or roll
    * back (no manifest: the rewrite never completed — discard) a temp
    * dir left by a crashed [[compactGranules]] run. */
  private def finishPendingCompaction(dirPath: java.nio.file.Path): Unit = {
    val tmp = dirPath.resolve(CompactTmpName)
    if (!java.nio.file.Files.isDirectory(tmp)) return
    val manifest = tmp.resolve(ManifestName)
    if (java.nio.file.Files.isRegularFile(manifest))
      swapIn(tmp, dirPath, readCompactManifest(manifest).originals)
    else deleteTreeQuietly(tmp)
  }

  /** A pending (crashed-mid-swap) compaction's manifest, if one exists.
    * The READ path consults this to compute a consistent snapshot
    * without mutating the store (see [[NetCdfSource.expandLenient]]):
    * deletes only begin after every staged move completed, so either
    * ALL originals are still present (pre-compaction view — ignore any
    * already-moved replacements; requires `preViewSound`) or the
    * replacements are all in (post view — ignore the not-yet-deleted
    * originals). */
  private[sources] def pendingCompactionSnapshot(
      dirPath: java.nio.file.Path): Option[CompactSnapshot] = {
    val manifest = dirPath.resolve(CompactTmpName).resolve(ManifestName)
    if (!java.nio.file.Files.isRegularFile(manifest)) None
    else Some(readCompactManifest(manifest))
  }

  /** The swap: move every staged granule + sidecar into the store
    * (REPLACE_EXISTING makes a re-run after a mid-move crash
    * idempotent), delete the originals, drop the temp dir. Originals
    * arrive as bare FILE NAMES resolved against `dirPath` — the store
    * stays repairable after a move or remount (an absolute path
    * recorded before the move would silently no-op the delete and
    * leave the original double-counting next to its replacement).
    * Returns the in-store paths of the moved granules. */
  private def swapIn(tmp: java.nio.file.Path, dirPath: java.nio.file.Path,
      originalNames: Seq[String]): Seq[String] = {
    val staged = Option(tmp.toFile.listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && (f.getName.endsWith(".nc") ||
        f.getName.endsWith(".nc.stats.json")))
      .map(_.toPath).sortBy(_.getFileName.toString)
    staged.foreach { p =>
      java.nio.file.Files.move(p, dirPath.resolve(p.getFileName),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    originalNames.foreach { n =>
      java.nio.file.Files.deleteIfExists(dirPath.resolve(n))
      java.nio.file.Files.deleteIfExists(dirPath.resolve(n + ".stats.json"))
    }
    deleteTreeQuietly(tmp)
    staged.map(_.getFileName.toString).filter(_.endsWith(".nc"))
      .map(n => dirPath.resolve(n).toString)
  }

  private def writeCompactManifest(tmp: java.nio.file.Path,
      originalNames: Seq[String], stagedNames: Seq[String]): Unit = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    def arr(xs: Seq[String]) =
      if (xs.isEmpty) "[]"
      else xs.map(esc).mkString("[\"", "\", \"", "\"]")
    java.nio.file.Files.writeString(tmp.resolve(ManifestName),
      s"""{"originals": ${arr(originalNames)}, "staged": ${arr(stagedNames)}}""")
  }

  /** (original names, staged names). Reads both the current object form
    * and the legacy bare-array form (absolute original paths, no staged
    * list — reduced to names here so resolution is against the store
    * dir either way). */
  /** A pending compaction as the read path sees it. `preViewSound` =
    * the staged list is known COMPLETE, so a reader may construct the
    * pre-compaction view (originals minus already-moved replacements);
    * when false the only consistent choice is the post view — taken
    * regardless of which originals still linger. */
  private[sources] final case class CompactSnapshot(
      originals: Seq[String], staged: Seq[String], preViewSound: Boolean)

  private def readCompactManifest(manifest: java.nio.file.Path)
      : CompactSnapshot = {
    def names(v: org.json4s.JValue): Seq[String] = v match {
      case org.json4s.JArray(xs) =>
        xs.collect { case org.json4s.JString(s) =>
          java.nio.file.Paths.get(s).getFileName.toString }
      case _ => Nil
    }
    def ncNames(d: java.nio.file.Path): Seq[String] =
      Option(d.toFile.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isFile && f.getName.endsWith(".nc"))
        .map(_.getName).toSeq
    org.json4s.jackson.JsonMethods.parse(
      java.nio.file.Files.readString(manifest)) match {
      case o @ org.json4s.JObject(_) =>
        val stagedListed = (o \ "staged").isInstanceOf[org.json4s.JArray]
        CompactSnapshot(names(o \ "originals"), names(o \ "staged"),
          preViewSound = stagedListed)
      case arr @ org.json4s.JArray(_) =>
        // legacy bare-array manifest (pre-"staged" upgrade): recover
        // the staged set so a crash that predates the upgrade still
        // reads consistently. Staged granules all share one
        // compact-<stamp>- name prefix (13-digit ms stamp, the scheme
        // [[compactGranules]] has always used); any still sitting in
        // the tmp dir names the stamp, so the already-moved ones are
        // the in-store files with that prefix. The prefix is matched
        // with an explicit anchor — a tmp .nc that does NOT follow the
        // scheme (foreign file, future naming change) would make the
        // derived prefix miss already-moved replacements, so ANY
        // non-matching tmp file demotes to preViewSound = false rather
        // than double-count. An EMPTY tmp means every staged move
        // completed (swapIn drains tmp one move at a time), the staged
        // set is no longer enumerable, and only the post view is sound.
        val origs = names(arr)
        val tmpDir = manifest.getParent
        val inTmp = ncNames(tmpDir)
        val stagedRe = "^(compact-\\d{13}-)".r
        val prefixes = inTmp.map(n =>
          stagedRe.findPrefixMatchOf(n).map(_.group(1)))
        prefixes.flatten.distinct match {
          case Seq(prefix) if prefixes.forall(_.isDefined) =>
            val moved = Option(tmpDir.getParent).map(ncNames)
              .getOrElse(Nil).filter(_.startsWith(prefix))
            CompactSnapshot(origs, (inTmp ++ moved).distinct,
              preViewSound = true)
          case _ =>
            CompactSnapshot(origs, Nil, preViewSound = false)
        }
      case _ => CompactSnapshot(Nil, Nil, preViewSound = false)
    }
  }

  // ------------------------------------------------- fleet manifest

  /** One granule's entry in the fleet-level planning manifest: everything
    * the driver's plan-time paths otherwise open the granule header for
    * — record count, per-record-variable projected bytes + chunk extent
    * (→ [[NetCdfSource.FileMeta]]), the granule's Spark schema (→ table
    * schema inference), and the column-stats sidecar digest (→ generic
    * filter pruning). `bytes` + `mtimeMs` + `headerCrc` are the
    * validation key: a reader uses the entry only when the file's
    * CURRENT size, mtime, AND content witness (CRC32 over the first and
    * last 4 KiB — two page reads, not a data scan) all match, so a
    * stale or foreign manifest — including an in-place same-size
    * rewrite, which fixed-width NetCDF makes easy, even one landing
    * inside a single coarse-granularity mtime tick (1–2 s on some
    * ext4/FAT configs), since new trailing record values change the
    * tail bytes — can never corrupt planning; at worst a granule falls
    * back to its header parse. Residual risk: a same-size, same-tick
    * rewrite that changes ONLY bytes outside both 4 KiB windows still
    * validates — accepted, because closing it costs a full data
    * checksum per validation. Legacy manifests without mtime parse as
    * `mtimeMs = -1`, which never validates; without hcrc they parse as
    * `headerCrc = -1`, which skips the witness (size+mtime only) until
    * any writer refresh re-stamps them. */
  final case class FleetEntry(
      bytes: Long,
      mtimeMs: Long,
      records: Long,
      schemaJson: String,
      recVars: Map[String, (Long, Int)],
      stats: Option[Map[String, (Double, Double)]],
      headerCrc: Long = -1L)

  /** The entry validation key's content witness: CRC32 over the
    * granule's first and last 4 KiB (head = header + leading fixed
    * data, tail = the newest records a same-size in-place rewrite
    * rewrites). Two page-cache reads per granule — orders cheaper than
    * the header parse the manifest exists to avoid. */
  def contentWitness(path: String): Long = {
    val raf = new java.io.RandomAccessFile(path, "r")
    try {
      val len = raf.length()
      val crc = new java.util.zip.CRC32
      val head = new Array[Byte](math.min(4096L, len).toInt)
      raf.readFully(head)
      crc.update(head)
      if (len > 4096L) {
        val tail = new Array[Byte](math.min(4096L, len - 4096L).toInt)
        raf.seek(len - tail.length)
        raf.readFully(tail)
        crc.update(tail)
      }
      crc.getValue
    } finally raf.close()
  }

  /** The ONE manifest-entry validation rule, shared by every consumer
    * (plan-time [[NetCdfSource]] table, [[refreshFleetManifest]] reuse,
    * [[buildFleetManifest]] reuse): size AND mtime AND — when the entry
    * carries one — the content witness must all match the file's
    * current state. Any I/O trouble invalidates (header-parse
    * fallback), never throws. */
  def entryValid(f: java.io.File, e: FleetEntry): Boolean =
    scala.util.Try(
      e.bytes == f.length() && e.mtimeMs >= 0L &&
        f.lastModified() == e.mtimeMs &&
        (e.headerCrc < 0L || contentWitness(f.getPath) == e.headerCrc)
    ).getOrElse(false)

  /** The store-level manifest: the record dimension the entries were
    * resolved against plus one [[FleetEntry]] per granule file name. */
  final case class FleetManifest(recdim: String,
      granules: Map[String, FleetEntry])

  private[sources] val FleetManifestName = "_manifest.json"

  /** Parse a store's fleet manifest; None on absence or ANY parse
    * trouble (the manifest is an accelerator, never a requirement). */
  def readFleetManifest(dir: String): Option[FleetManifest] = {
    val p = java.nio.file.Paths.get(dir, FleetManifestName)
    if (!java.nio.file.Files.isRegularFile(p)) return None
    scala.util.Try {
      import org.json4s._
      def num(v: JValue): Option[Double] = v match {
        case JDouble(d) => Some(d)
        case JInt(i) => Some(i.toDouble)
        case JLong(l) => Some(l.toDouble)
        case JDecimal(d) => Some(d.toDouble)
        case _ => None
      }
      def long(v: JValue): Long = v match {
        case JInt(i) => i.toLong
        case JLong(l) => l
        case JDouble(d) => d.toLong
        case _ => sys.error("not a number")
      }
      val root = org.json4s.jackson.JsonMethods.parse(
        java.nio.file.Files.readString(p))
      val recdim = (root \ "recdim") match {
        case JString(s) => s
        case _ => sys.error("no recdim")
      }
      val granules = (root \ "granules") match {
        case JObject(fields) => fields.map { case (name, g) =>
          val recVars = (g \ "recvars") match {
            case JObject(rv) => rv.collect {
              case (vn, JArray(List(b, c))) => vn -> (long(b), long(c).toInt)
            }.toMap
            case _ => Map.empty[String, (Long, Int)]
          }
          val stats = (g \ "stats") match {
            case JObject(st) =>
              Some(st.flatMap {
                case (c, JArray(List(lo, hi))) =>
                  for (a <- num(lo); b <- num(hi)) yield c -> (a, b)
                case _ => None
              }.toMap).filter(_.nonEmpty)
            case _ => None
          }
          val mtime = (g \ "mtime") match {
            case v if num(v).isDefined => num(v).get.toLong
            case _ => -1L // legacy entry: never validates, header fallback
          }
          val hcrc = (g \ "hcrc") match {
            case v if num(v).isDefined => num(v).get.toLong
            case _ => -1L // pre-witness entry: size+mtime key only
          }
          name -> FleetEntry(long(g \ "bytes"), mtime, long(g \ "records"),
            org.json4s.jackson.JsonMethods.compact(
              org.json4s.jackson.JsonMethods.render(g \ "schema")),
            recVars, stats, hcrc)
        }.toMap
        case _ => Map.empty[String, FleetEntry]
      }
      FleetManifest(recdim, granules)
    }.toOption
  }

  /** Rebuild the store's fleet manifest from the CURRENT granule set,
    * reusing prior entries whose recorded size AND mtime still match (no
    * header open for unchanged granules — a streaming store's per-batch refresh
    * costs one header parse per NEW granule plus a stat per old one).
    * Granules whose record dim resolves differently from the manifest's,
    * or whose header will not parse, simply get no entry and fall back
    * to a plan-time header parse. The write is atomic (temp + move) so a
    * concurrent reader sees the old or the new manifest, never a torn
    * one. Called by every granule-writing path ([[writeGranules]],
    * [[compactGranules]] post-swap) — the STREAMING sink inherits it via
    * writeGranules, so a tailed feed's manifest stays fresh too. */
  def refreshFleetManifest(dir: String,
      recDimHint: Option[String]): Unit = {
    val dirPath = java.nio.file.Paths.get(dir)
    if (Option(dirPath.getFileName)
        .exists(_.toString == CompactTmpName)) return
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && f.getName.endsWith(".nc"))
      .sortBy(_.getName)
    val prior = readFleetManifest(dir)
    // the manifest's recdim: the hint, else the prior manifest's, else
    // whatever the first parseable granule resolves to
    var manifestRd: Option[String] =
      recDimHint.orElse(prior.map(_.recdim))
    val entries = files.flatMap { f =>
      val reused = for {
        rd <- manifestRd
        pm <- prior if pm.recdim == rd
        e <- pm.granules.get(f.getName)
        if entryValid(f, e)
      } yield (f.getName, rd, e)
      reused.orElse(headerEntry(f.getPath, recDimHint))
    }.filter { case (_, rd, _) =>
      manifestRd match {
        case Some(d) => rd == d
        case None => manifestRd = Some(rd); true
      }
    }
    writeFleetManifestFile(dirPath, manifestRd, entries)
  }

  /** One granule's fleet-manifest entry from its header bytes (O(KB)
    * of page faults) + its stats sidecar if one exists. None on any
    * parse trouble — the granule then falls back to a plan-time header
    * parse forever, which is the honest state for a broken file. */
  private def headerEntry(path: String, recDimHint: Option[String])
      : Option[(String, String, FleetEntry)] =
    try {
      val f = new java.io.File(path)
      val nc = NetCDF4.open(path)
      try {
        val rd = recDimHint.filter(d => nc.dims.exists(_.name == d))
          .getOrElse(NetCDFIngest.recordDimOf(nc))
        val records =
          nc.dims.find(_.name == rd).map(_.size).getOrElse(0L)
        val recVars = nc.vars.filter(_.dims.headOption.contains(rd))
          .map { v =>
            val inner = v.shape.drop(1).product max 1L
            v.name -> (inner * v.dtype.size,
              v.chunkDims.headOption.getOrElse(0))
          }.toMap
        Some((f.getName, rd,
          FleetEntry(f.length(), f.lastModified(), records,
            NetCDFIngest.schemaFor(nc, rd).json, recVars,
            NetCdfSource.readStatsSidecar(path), contentWitness(path))))
      } finally nc.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Backfill the fleet manifest for an archive produced by ANY writer
    * — the reference's own fixture sets, a real sensor fleet's landing
    * dir, any store that predates the manifest. graft's granule
    * writers keep the manifest fresh themselves ([[writeGranules]],
    * [[compactGranules]], the streaming sink), but a FOREIGN archive
    * otherwise header-parses every granule at every planning, forever.
    *
    * One DISTRIBUTED header pass: granules not already covered by a
    * valid (size+mtime) entry parse executor-side — O(KB) of page
    * faults each, embarrassingly parallel across the fleet — and only
    * the small entry tuples collect to the driver, which resolves the
    * record-dim consensus and writes the manifest atomically. Re-runs
    * are O(stat): everything valid is reused without I/O. Column-stats
    * sidecars are picked up when present but never synthesized (that
    * would be a full data read, not a header pass — stats pruning
    * simply keeps granules until a graft writer produces them).
    *
    * Runs under the store's single-writer `_LOCK` (shared with
    * [[compactGranules]]): a backfill racing a compaction would
    * snapshot granules mid-swap and persist stale entries.
    *
    * @return number of granules covered by the written manifest */
  def buildFleetManifest(spark: SparkSession, dir: String,
      recDimHint: Option[String] = None): Int =
    graft.util.StoreState.withLock(spark, dir, "buildFleetManifest") {
      doBuildFleetManifest(spark, dir, recDimHint)
    }

  private def doBuildFleetManifest(spark: SparkSession, dir: String,
      recDimHint: Option[String]): Int = {
    val dirPath = java.nio.file.Paths.get(dir)
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && f.getName.endsWith(".nc"))
      .sortBy(_.getName)
    val prior = readFleetManifest(dir)
    var manifestRd: Option[String] =
      recDimHint.orElse(prior.map(_.recdim))
    val reused = files.flatMap { f =>
      for {
        rd <- manifestRd
        pm <- prior if pm.recdim == rd
        e <- pm.granules.get(f.getName)
        if entryValid(f, e)
      } yield (f.getName, rd, e)
    }
    val covered = reused.map(_._1).toSet
    val toParse = files.filterNot(f => covered(f.getName)).map(_.getPath)
    val parsed =
      if (toParse.isEmpty) Array.empty[(String, String, FleetEntry)]
      else {
        val hint = recDimHint // serializable capture, not the method arg
        spark.sparkContext
          .parallelize(toParse.toSeq, math.max(1,
            math.min(toParse.length,
              spark.sparkContext.defaultParallelism)))
          .flatMap(p => headerEntry(p, hint))
          .collect()
      }
    val entries = (reused ++ parsed).sortBy(_._1).filter {
      case (_, rd, _) =>
        manifestRd match {
          case Some(d) => rd == d
          case None => manifestRd = Some(rd); true
        }
    }
    writeFleetManifestFile(dirPath, manifestRd, entries)
    entries.length
  }

  /** Render + atomically install the fleet manifest (temp + move, so a
    * concurrent reader sees old or new, never torn). */
  private def writeFleetManifestFile(dirPath: java.nio.file.Path,
      manifestRd: Option[String],
      entries: Seq[(String, String, FleetEntry)]): Unit = {
    import org.json4s._
    val g = JObject(entries.map { case (name, _, e) =>
      name -> JObject(List(
        "bytes" -> JLong(e.bytes),
        "mtime" -> JLong(e.mtimeMs),
        "hcrc" -> JLong(e.headerCrc),
        "records" -> JLong(e.records),
        "schema" -> org.json4s.jackson.JsonMethods.parse(e.schemaJson),
        "recvars" -> JObject(e.recVars.toList.sortBy(_._1).map {
          case (k, (b, c)) => k -> JArray(List(JLong(b), JLong(c.toLong)))
        })) ++ e.stats.map(st =>
        "stats" -> (JObject(st.toList.sortBy(_._1).map { case (k, (lo, hi)) =>
          k -> JArray(List(JDouble(lo), JDouble(hi)))
        }): JValue)).toList)
    }.toList)
    val root = JObject(List(
      "version" -> JInt(1),
      "recdim" -> JString(manifestRd.getOrElse("record")),
      "granules" -> g))
    val tmp = dirPath.resolve(FleetManifestName + ".tmp")
    java.nio.file.Files.writeString(tmp,
      org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(root)))
    try java.nio.file.Files.move(tmp,
      dirPath.resolve(FleetManifestName),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        java.nio.file.Files.move(tmp,
          dirPath.resolve(FleetManifestName),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def deleteTreeQuietly(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.isDirectory(p)) {
      Option(p.toFile.listFiles()).getOrElse(Array.empty[java.io.File])
        .foreach(f => deleteTreeQuietly(f.toPath))
      java.nio.file.Files.deleteIfExists(p)
    } else java.nio.file.Files.deleteIfExists(p)

  private def readSidecar(dir: String): Map[String, String] = {
    val f = java.nio.file.Paths.get(dir, "_global_attrs.json")
    if (!java.nio.file.Files.isRegularFile(f)) Map.empty
    else org.json4s.jackson.JsonMethods.parse(
      java.nio.file.Files.readString(f)) match {
      case org.json4s.JObject(fields) =>
        fields.collect { case (k, org.json4s.JString(v)) => k -> v }.toMap
      case _ => Map.empty
    }
  }
}
