package graft.sources

/** Pure-JVM reader for the NetCDF *classic* formats — `CDF\x01` (classic,
  * 32-bit offsets), `CDF\x02` (64-bit offsets) and `CDF\x05` (CDF-5,
  * 64-bit data) — implemented from the public "NetCDF Classic Format
  * Specification". The reference reads these transparently through
  * netCDF4-python (config.py:123-138 from_nc accepts any netCDF file), so
  * graft's ingest does too: [[NetCDF4.open]] dispatches here on magic.
  *
  * The header is `magic numrecs dim_list gatt_list var_list` with all
  * integers BIG-endian; fixed variables are contiguous at their `begin`
  * offset, record variables interleave one record slab per record with a
  * stride of the summed (4-byte padded) record vsizes — except the
  * spec's special case of exactly one record variable, which is packed
  * at its unpadded vsize.
  *
  * Model mapping: a `char` variable's trailing dimension is a string
  * length (the classic-model convention), so it decodes to one string
  * per leading-dims element and drops the trailing dim from its shape —
  * giving [[NetCDFIngest]] the same StringType column a vlen-string
  * NetCDF-4 variable produces.
  *
  * I/O model: random access through [[Hdf5Reader.srcFor]] — mapped under
  * 2 GiB, positional ranged reads above, so the multi-GB files CDF-2/5
  * were designed for decode without full-file buffering (the 64-bit
  * `begin` offsets are honored end to end). The per-VARIABLE decoded
  * array must still fit a JVM array (< 2^31 bytes), netcdf-c's
  * per-request bound.
  */
object NetCDF3Reader {

  import NetCDF4.{NcDim, NcVar, NcFile}

  private val TagDim = 10
  private val TagVar = 11
  private val TagAttr = 12

  def open(d: Array[Byte]): NcFile = open(Hdf5Reader.srcFor(d))

  def open(src: Hdf5Reader.ByteSrc): NcFile = {
    require(src.length >= 8 && src.get(0) == 'C' && src.get(1) == 'D' &&
      src.get(2) == 'F', "not a NetCDF classic file")
    val ver = src.get(3).toInt
    require(ver == 1 || ver == 2 || ver == 5,
      s"unsupported NetCDF classic version $ver")
    var p = 4L

    // big-endian primitives over the random-access source
    def u8At(q: Long): Int = src.get(q) & 0xff
    def i16At(q: Long): Int = (u8At(q) << 8) | u8At(q + 1)
    def i32At(q: Long): Int = (i16At(q) << 16) | i16At(q + 2)
    def i64At(q: Long): Long =
      ((i32At(q) & 0xffffffffL) << 32) | (i32At(q + 4) & 0xffffffffL)
    def f32At(q: Long): Float = java.lang.Float.intBitsToFloat(i32At(q))
    def f64At(q: Long): Double = java.lang.Double.longBitsToDouble(i64At(q))

    def u32(): Long = { val v = i32At(p) & 0xffffffffL; p += 4; v }
    /** NON_NEG: 32-bit in CDF-1/2, 64-bit in CDF-5. */
    def nonNeg(): Long =
      if (ver == 5) { val v = i64At(p); p += 8; v } else u32()
    /** OFFSET (begin): 32-bit in CDF-1, 64-bit in CDF-2/5. */
    def offset(): Long =
      if (ver == 1) u32() else { val v = i64At(p); p += 8; v }
    def pad4(n: Long): Long = (n + 3) / 4 * 4
    def name(): String = {
      val n = nonNeg()
      val s = new String(src.copy(p, p + n), "UTF-8")
      p += pad4(n)
      s
    }

    val numrecsRaw = nonNeg()
    // STREAMING sentinel (all ones) -> record count must come from data
    val streaming = numrecsRaw == (if (ver == 5) -1L else 0xffffffffL)

    // ---- dim_list
    val dimTag = nonNeg(); val nDims = nonNeg().toInt
    require(dimTag == TagDim || (dimTag == 0 && nDims == 0),
      s"bad dim_list tag $dimTag")
    val rawDims = (0 until nDims).map { i =>
      val nm = name(); val len = nonNeg()
      (nm, len, i)
    }
    val recDimId = rawDims.indexWhere(_._2 == 0L)

    def typeSize(t: Int): Int = t match {
      case 1 | 2 | 7 => 1 // byte, char, ubyte
      case 3 | 8 => 2 // short, ushort
      case 4 | 5 | 9 => 4 // int, float, uint
      case 6 | 10 | 11 => 8 // double, int64, uint64
      case other =>
        throw new IllegalArgumentException(s"unknown nc_type $other")
    }

    def attrValue(t: Int, n: Int): Any = {
      val out: Any = t match {
        case 2 =>
          val s = new String(src.copy(p, p + n), "UTF-8")
          s.takeWhile(_ != 0)
        case 1 => Seq.tabulate(n)(i => src.get(p + i).toLong)
        case 7 => Seq.tabulate(n)(i => (src.get(p + i) & 0xff).toLong)
        case 3 => Seq.tabulate(n)(i => i16At(p + 2 * i).toShort.toLong)
        case 8 => Seq.tabulate(n)(i => i16At(p + 2 * i).toLong)
        case 4 => Seq.tabulate(n)(i => i32At(p + 4 * i).toLong)
        case 9 => Seq.tabulate(n)(i => i32At(p + 4 * i) & 0xffffffffL)
        case 5 => Seq.tabulate(n)(i => f32At(p + 4 * i).toDouble)
        case 6 => Seq.tabulate(n)(i => f64At(p + 8 * i))
        case 10 | 11 => Seq.tabulate(n)(i => i64At(p + 8 * i))
      }
      p += pad4(n.toLong * typeSize(t))
      out match {
        case s: Seq[_] if s.length == 1 => s.head
        case x => x
      }
    }

    def attrList(): Map[String, Any] = {
      val tag = nonNeg(); val n = nonNeg().toInt
      require(tag == TagAttr || (tag == 0 && n == 0), s"bad attr tag $tag")
      (0 until n).map { _ =>
        val nm = name()
        val t = nonNeg().toInt
        val cnt = nonNeg().toInt
        nm -> attrValue(t, cnt)
      }.toMap
    }

    val globalAttrs = attrList()

    // ---- var_list
    val varTag = nonNeg(); val nVars = nonNeg().toInt
    require(varTag == TagVar || (varTag == 0 && nVars == 0),
      s"bad var tag $varTag")
    final case class RawVar(nm: String, dimids: Seq[Int], attrs: Map[String, Any],
        ncType: Int, vsize: Long, begin: Long)
    val rawVars = (0 until nVars).map { _ =>
      val nm = name()
      val nd = nonNeg().toInt
      // dimid is NON_NEG in the grammar: 64-bit in CDF-5 (netcdf-c
      // v1hpg.c reads an int64 per dimid when the version flag is 5)
      val dimids = (0 until nd).map(_ => nonNeg().toInt)
      val attrs = attrList()
      val t = nonNeg().toInt
      val vsize = nonNeg()
      val begin = offset()
      RawVar(nm, dimids, attrs, t, vsize, begin)
    }

    val recordVars = rawVars.filter(_.dimids.headOption.contains(recDimId))
    // record stride: sum of padded per-record slabs; the spec's special
    // case of exactly one record variable packs at the UNPADDED slab size
    def slab(v: RawVar): Long = {
      val perRec = v.dimids.drop(if (v.dimids.headOption.contains(recDimId)) 1 else 0)
        .map(rawDims(_)._2).product * typeSize(v.ncType)
      math.max(perRec, typeSize(v.ncType))
    }
    val recSize =
      if (recordVars.size == 1) slab(recordVars.head)
      else recordVars.map(v => pad4(slab(v))).sum

    val numrecs =
      if (!streaming) numrecsRaw
      else recordVars.headOption.map { v =>
        (src.length - v.begin) / math.max(recSize, 1)
      }.getOrElse(0L)

    def dimLen(i: Int): Long =
      if (i == recDimId) numrecs else rawDims(i)._2

    val dims = rawDims.map { case (nm, len, i) =>
      NcDim(nm, if (i == recDimId) numrecs else len, i == recDimId, i)
    }

    def h5Type(v: RawVar): Hdf5Reader.H5Type = v.ncType match {
      case 1 => Hdf5Reader.H5Int(1, signed = true)
      case 7 => Hdf5Reader.H5Int(1, signed = false)
      case 3 => Hdf5Reader.H5Int(2, signed = true)
      case 8 => Hdf5Reader.H5Int(2, signed = false)
      case 4 => Hdf5Reader.H5Int(4, signed = true)
      case 9 => Hdf5Reader.H5Int(4, signed = false)
      case 10 => Hdf5Reader.H5Int(8, signed = true)
      case 11 => Hdf5Reader.H5Int(8, signed = false)
      case 5 => Hdf5Reader.H5Float(4)
      case 6 => Hdf5Reader.H5Float(8)
      case 2 => Hdf5Reader.H5FixedString(
        v.dimids.lastOption.map(dimLen(_).toInt).getOrElse(1))
    }

    val byName = rawVars.map(v => v.nm -> v).toMap
    val vars = rawVars.map { v =>
      // char vars: trailing dim is the string length (classic-model
      // convention) -> one string per leading element, trailing dim
      // dropped from the relational shape
      val effDimids =
        if (v.ncType == 2 && v.dimids.nonEmpty) v.dimids.dropRight(1)
        else v.dimids
      NcVar(v.nm, effDimids.map(rawDims(_)._1),
        effDimids.map(dimLen), h5Type(v), v.attrs)
    }

    def readVar(nc: NcVar): AnyRef = {
      val v = byName(nc.name)
      val isRec = v.dimids.headOption.contains(recDimId)
      val perRecElemsL = v.dimids.drop(if (isRec) 1 else 0)
        .map(dimLen).product max 1L
      val nRecsL = if (isRec) numrecs else 1L
      val es = typeSize(v.ncType)
      // per-VARIABLE bound, checked in Long BEFORE any Int narrowing: a
      // multi-GB CDF-5 file is now accepted, so a silent Int wrap here
      // would allocate a wrong-size buffer and corrupt the decode
      val totalBytes = nRecsL * perRecElemsL * es
      require(totalBytes <= Int.MaxValue,
        s"variable ${v.nm}: $nRecsL records x $perRecElemsL elems x $es B " +
          s"= $totalBytes bytes exceeds the 2 GiB per-variable read " +
          "bound; read a record range or split the granule")
      val perRecElems = perRecElemsL.toInt
      val nRecs = nRecsL.toInt
      val stride = if (isRec) recSize else slab(v)
      // gather the (possibly interleaved) slabs into one contiguous
      // big-endian buffer, then decode — one ranged read per record slab,
      // 64-bit offsets (a fixed var is a single ranged read)
      val raw = new Array[Byte](nRecs * perRecElems * es)
      var r = 0
      while (r < nRecs) {
        val srcPos = v.begin + (if (isRec) r * stride else 0L)
        src.copyTo(srcPos, raw, r * perRecElems * es, perRecElems * es)
        r += 1
      }
      val rb = java.nio.ByteBuffer.wrap(raw)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      val n = nRecs * perRecElems
      v.ncType match {
        case 1 => Array.tabulate(n)(i => raw(i).toLong)
        case 7 => Array.tabulate(n)(i => (raw(i) & 0xff).toLong)
        case 3 => Array.tabulate(n)(i => rb.getShort(2 * i).toLong)
        case 8 => Array.tabulate(n)(i => (rb.getShort(2 * i) & 0xffff).toLong)
        case 4 => Array.tabulate(n)(i => rb.getInt(4 * i).toLong)
        case 9 => Array.tabulate(n)(i => rb.getInt(4 * i) & 0xffffffffL)
        case 10 | 11 => Array.tabulate(n)(i => rb.getLong(8 * i))
        case 5 => Array.tabulate(n)(i => rb.getFloat(4 * i))
        case 6 => Array.tabulate(n)(i => rb.getDouble(8 * i))
        case 2 =>
          val strLen = v.dimids.lastOption.map(dimLen(_).toInt).getOrElse(1)
          val nStr = n / math.max(strLen, 1)
          Array.tabulate(nStr)(i =>
            new String(raw, i * strLen, strLen, "UTF-8").takeWhile(_ != 0))
      }
    }

    NcFile(dims, vars, globalAttrs, readVar, () => src.close())
  }
}
