package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core.AggConfig

/** NetCDF-4 (classic model) semantics over [[Hdf5Reader]]: dimensions from
  * HDF5 dimension-scale datasets, per-variable dimension lists, global and
  * per-variable attributes — plus the ingest path that turns `.nc` granule
  * files into the parquet granules every graft operator consumes
  * (the reference's `Config.from_nc` + input side of `aggregate()`;
  * /root/reference/ncagg/config.py:123-138, aggregator.py:36-51).
  *
  * The netCDF encoding conventions implemented here are the public
  * netcdf-c ones: a dimension is a dataset with attribute
  * `CLASS = "DIMENSION_SCALE"` (its id in `_Netcdf4Dimid`, unlimited when
  * the HDF5 maxdims entry is unlimited); a pure dimension (not also a
  * variable) has a NAME attribute starting with "This is a netCDF
  * dimension but not a netCDF variable"; each variable's dimensions are
  * object references in its `DIMENSION_LIST` attribute.
  */
object NetCDF4 {

  final case class NcDim(name: String, size: Long, unlimited: Boolean,
      dimid: Int)

  final case class NcVar(
      name: String,
      dims: Seq[String],
      shape: Seq[Long],
      dtype: Hdf5Reader.H5Type,
      attrs: Map[String, Any],
      /** storage chunk extents (empty for contiguous/compact layouts) —
        * record-range readers align their splits to `chunkDims.head` so
        * a split never decodes a chunk it doesn't own */
      chunkDims: Seq[Int] = Nil)

  final case class NcFile(
      dims: Seq[NcDim],
      vars: Seq[NcVar],
      attrs: Map[String, Any],
      private[sources] val readFn: NcVar => AnyRef,
      private[sources] val closeFn: () => Unit = () => (),
      private[sources] val readSlabFn: (NcVar, Long, Long) => AnyRef = null) {
    def read(v: NcVar): AnyRef = readFn(v)
    /** Values of records [lo, hi) along the variable's FIRST dimension.
      * HDF5-backed files read only the intersecting chunks / byte range
      * (O(slab) I/O — see [[Hdf5Reader.H5File.readSlab]]); the NetCDF-3
      * reader falls back to a full read sliced in memory (classic files
      * are header-bounded at 4 GiB; CDF-5 giants would want the same
      * ranged treatment if they ever show up). */
    def readSlab(v: NcVar, lo: Long, hi: Long): AnyRef =
      if (readSlabFn != null) readSlabFn(v, lo, hi)
      else sliceRecords(readFn(v), v, lo, hi)
    /** Release the file's OS resource (the pread channel of a >= 2 GiB
      * granule). Safe to call more than once; no reads after close. */
    def close(): Unit = closeFn()
  }

  /** In-memory record slice of a fully-read variable (the readSlab
    * fallback for sources without ranged reads). */
  private def sliceRecords(data: AnyRef, v: NcVar, lo: Long,
      hi: Long): AnyRef = {
    val inner = v.shape.drop(1).product max 1L
    val from = (lo * inner).toInt
    val until = (hi * inner).toInt
    data match {
      case a: Array[Double] => java.util.Arrays.copyOfRange(a, from, until)
      case a: Array[Float] => java.util.Arrays.copyOfRange(a, from, until)
      case a: Array[Long] => java.util.Arrays.copyOfRange(a, from, until)
      case a: Array[AnyRef] => java.util.Arrays.copyOfRange(a, from, until)
      case other => other
    }
  }

  private val PhonyDimMarker = "This is a netCDF dimension but not"
  private val NcInternalAttrs = Set("CLASS", "NAME", "REFERENCE_LIST",
    "DIMENSION_LIST", "_Netcdf4Dimid", "_Netcdf4Coordinates")

  /** Total [[open]] calls in this JVM — spec instrumentation for
    * "planning must not open granules" pins (the fleet-manifest fast
    * path); never read by the engine itself. */
  val openCalls = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Open either flavor the reference accepts transparently through
    * netCDF4-python: NetCDF-4 (HDF5 container) or NetCDF-3 classic
    * (`CDF\x01/\x02/\x05` magic, [[NetCDF3Reader]]). */
  def open(path: String): NcFile = {
    openCalls.incrementAndGet()
    val head = {
      val in = java.nio.file.Files.newInputStream(
        java.nio.file.Paths.get(path))
      try in.readNBytes(4) finally in.close()
    }
    if (head.length >= 4 && head(0) == 'C'.toByte && head(1) == 'D'.toByte &&
        head(2) == 'F'.toByte)
      // random access (mapped / pread), not readAllBytes: CDF-2/5 files
      // are routinely multi-GB — that is what those formats are FOR
      return NetCDF3Reader.open(Hdf5Reader.srcFor(path))
    val h5 = Hdf5Reader.open(path)
    // on a metadata-derivation throw the channel must not leak; on
    // success ownership transfers to the returned NcFile's closeFn
    try {
    val byAddr = h5.datasets.map(ds => ds.addr -> ds.name).toMap
    val dims = h5.datasets.flatMap { ds =>
      ds.attrs.get("CLASS") match {
        case Some("DIMENSION_SCALE") =>
          val dimid = ds.attrs.get("_Netcdf4Dimid") match {
            case Some(i: Long) => i.toInt
            case Some(s: Seq[_]) => s.head.asInstanceOf[Long].toInt
            case _ => -1
          }
          Some(NcDim(ds.name, ds.shape.headOption.getOrElse(0L),
            ds.isUnlimited(0), dimid))
        case _ => None
      }
    }
    val vars = h5.datasets.flatMap { ds =>
      val phony = ds.attrs.get("NAME") match {
        case Some(s: String) => s.startsWith(PhonyDimMarker)
        case _ => false
      }
      if (phony) None
      else {
        val dimNames = ds.attrs.get("DIMENSION_LIST") match {
          case Some(refs: Seq[_]) =>
            refs.flatMap {
              case a: Long => byAddr.get(a)
              case s: Seq[_] => s.headOption.collect { case a: Long => a }
                .flatMap(byAddr.get)
              case _ => None
            }
          case Some(a: Long) => byAddr.get(a).toSeq
          case _ =>
            // a coordinate variable IS its dimension; otherwise best-effort
            // match dims by size (per-rank), unique in practice
            if (dims.exists(_.name == ds.name)) Seq(ds.name)
            else ds.shape.map(sz =>
              dims.find(_.size == sz).map(_.name).getOrElse(s"dim_$sz"))
        }
        val userAttrs = ds.attrs.filterNot { case (k, _) =>
          NcInternalAttrs(k)
        }
        Some(NcVar(ds.name, dimNames, ds.shape, ds.dtype, userAttrs,
          ds.chunkDims))
      }
    }
    // a phony (non-coordinate) unlimited dim's scale dataset keeps its
    // creation length (often 0) — the dimension's CURRENT size is the max
    // extent of the variables laid out along it (netcdf-c semantics)
    val sized = dims.map { d =>
      val used = vars.flatMap(v => v.dims.zip(v.shape).collect {
        case (dn, sz) if dn == d.name => sz
      })
      d.copy(size = (d.size +: used).max)
    }
    NcFile(sized.sortBy(_.dimid), vars, h5.rootAttrs,
      v => h5.read(h5.datasets.find(_.name == v.name).get),
      () => h5.close(),
      (v, lo, hi) =>
        h5.readSlab(h5.datasets.find(_.name == v.name).get, lo, hi))
    } catch { case e: Throwable => h5.close(); throw e }
  }

  /** Parse CF-style time units ("<unit> since <instant>") to (epoch-micros
    * base, micros per unit). */
  def timeUnits(units: String): Option[(Long, Double)] = {
    val m = raw"^\s*(\w+)\s+since\s+(.+?)\s*$$".r
    units match {
      case m(u, base) =>
        val per = u.toLowerCase match {
          case "second" | "seconds" | "sec" | "secs" | "s" => 1e6
          case "millisecond" | "milliseconds" | "ms" => 1e3
          case "microsecond" | "microseconds" | "us" => 1.0
          case "minute" | "minutes" | "min" | "mins" => 60e6
          case "hour" | "hours" | "h" | "hr" | "hrs" => 3600e6
          case "day" | "days" | "d" => 86400e6
          case _ => return None
        }
        parseInstantUs(base).map(b => (b, per))
      case _ => None
    }
  }

  private def parseInstantUs(s: String): Option[Long] = {
    val norm = s.trim.replace("T", " ").stripSuffix("Z").trim
    val pats = Seq(
      "yyyy-M-d H:m:s.SSSSSS", "yyyy-M-d H:m:s", "yyyy-M-d H:m",
      "yyyy-M-d")
    pats.view.flatMap { p =>
      try {
        val fmt = java.time.format.DateTimeFormatter.ofPattern(p)
        val ldt =
          if (p == "yyyy-M-d")
            java.time.LocalDate.parse(norm, fmt).atStartOfDay()
          else java.time.LocalDateTime.parse(norm, fmt)
        Some(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L)
      } catch { case _: Exception => None }
    }.headOption
  }

  /** The reference's `Config.from_nc` over a NetCDF granule
    * (config.py:123-138): every dimension, every variable, every global
    * attribute (strategy "first", as the reference defaults). */
  def configFor(path: String): AggConfig.Config = {
    val nc = open(path)
    try AggConfig.Config(
      dims = nc.dims.map(d => AggConfig.DimSpec(d.name,
        size = if (d.unlimited) None else Some(d.size))),
      vars = nc.vars.map(v => AggConfig.VarSpec(v.name, v.dims,
        datatype = typeName(v.dtype),
        attributes = v.attrs.map { case (k, x) => k -> attrStr(x) })),
      attrs = nc.attrs.keys.toSeq.sorted
        .map(k => AggConfig.AttrSpec(k, "first")))
    finally nc.close()
  }

  private def typeName(t: Hdf5Reader.H5Type): String = t match {
    case Hdf5Reader.H5Float(8) => "double"
    case Hdf5Reader.H5Float(_) => "float"
    case Hdf5Reader.H5Int(8, _) => "bigint"
    case Hdf5Reader.H5Int(_, _) => "int"
    case Hdf5Reader.H5Enum(base, _) => typeName(base)
    case _ => "string"
  }

  private[sources] def attrStr(v: Any): String = v match {
    case s: Seq[_] => s.map(attrStr).mkString(", ")
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case x => String.valueOf(x)
  }
}
