package graft.sources

/** Minimal pure-JVM HDF5 *writer* for the same netcdf-c subset
  * [[Hdf5Reader]] reads — the output side of the reference (the
  * reference's product is a NetCDF file written through the netCDF4 C
  * library, /root/reference/ncagg/aggregator.py:239-359). Implemented
  * from the public HDF5 File Format Specification (version 3), like the
  * reader; no native library, no copied code.
  *
  * Emits the classic on-disk shapes netcdf-c itself produces by default:
  *   - superblock v0 (no checksums anywhere in the v0/v1 structures)
  *   - v1 object headers with inline (v1) attribute messages
  *   - old-style root group: v1 B-tree + SNOD + local heap
  *   - contiguous layout for fixed-shape datasets; v1-B-tree chunked
  *     layout for datasets over the unlimited dimension (HDF5 requires
  *     chunking for extendible datasets) — multi-chunk with a
  *     caller-chosen record count per chunk (the reference's
  *     `-c udim:chunksize`, cli.py:207-218 → aggregator.py:391-398),
  *     multi-level B-trees past 32 entries per node
  *   - filters: byte-shuffle, deflate (zlib, `java.util.zip`) and
  *     fletcher32 chunk checksums, declared through a v1 filter-pipeline
  *     message in netcdf-c's order (shuffle → deflate → fletcher32)
  *   - fixed-point / IEEE float / fixed-string datatypes
  *   - vlen-of-object-reference attributes (netCDF `DIMENSION_LIST`)
  *     through a global heap collection (GCOL)
  *
  * Not emitted (not needed for the reference's outputs): dense
  * attribute/link storage, v2+ object headers. Files are built in one
  * in-memory buffer — outputs >2 GiB are unsupported, the same bound as
  * [[Hdf5Reader]].
  */
object Hdf5Writer {

  private val Undefined = -1L

  sealed trait WType { def size: Int }
  case object WF64 extends WType { val size = 8 }
  case object WF32 extends WType { val size = 4 }
  final case class WInt(size: Int, signed: Boolean = true) extends WType
  /** fixed-size NUL-padded string */
  final case class WStr(size: Int) extends WType

  sealed trait WAttrVal
  final case class WStrAttr(v: String) extends WAttrVal
  final case class WLongAttr(v: Long, size: Int = 4) extends WAttrVal
  final case class WDoubleAttr(v: Double) extends WAttrVal
  final case class WFloatAttr(v: Float) extends WAttrVal
  /** netCDF `DIMENSION_LIST`: a vlen(object reference) array with one
    * element per dimension, each referencing that dimension-scale
    * dataset's object header through the global heap. */
  final case class WDimListAttr(dims: Seq[String]) extends WAttrVal

  /** One dataset to write. `data` is the raw little-endian row-major
    * element bytes (`shape.product * dtype.size` long); `None` leaves the
    * storage unallocated (reads back as zeros/fill — how netcdf-c leaves
    * never-written phony dimension scales). `unlimited0` marks dimension
    * 0 as unlimited (maxdims entry unlimited + chunked layout). */
  final case class WDataset(
      name: String,
      shape: Seq[Long],
      dtype: WType,
      data: Option[Array[Byte]],
      attrs: Seq[(String, WAttrVal)],
      unlimited0: Boolean = false,
      /** append + declare a fletcher32 chunk checksum (chunked layout
        * only, i.e. requires `unlimited0`) */
      fletcher32: Boolean = false,
      /** records per chunk along dim 0 (chunked layout only); None = one
        * chunk spanning the whole current extent */
      chunkRows: Option[Int] = None,
      /** zlib deflate level 1-9 per chunk (chunked layout only) */
      deflate: Option[Int] = None,
      /** byte-shuffle before deflate (netcdf-c's usual companion filter:
        * groups the k-th byte of every element together so deflate sees
        * long runs; chunked layout only) */
      shuffle: Boolean = false)

  // ------------------------------------------------------------------ buf

  private final class Buf {
    private var a = new Array[Byte](1 << 16)
    var pos = 0
    private def ensure(n: Int): Unit =
      if (pos + n > a.length) {
        var cap = a.length
        while (cap < pos + n) cap *= 2
        a = java.util.Arrays.copyOf(a, cap)
      }
    def u8(v: Int): Unit = { ensure(1); a(pos) = v.toByte; pos += 1 }
    def u16(v: Int): Unit = { u8(v & 0xff); u8((v >> 8) & 0xff) }
    def u32(v: Long): Unit = { u16((v & 0xffff).toInt); u16(((v >> 16) & 0xffff).toInt) }
    def u64(v: Long): Unit = { u32(v & 0xffffffffL); u32((v >>> 32) & 0xffffffffL) }
    def bytes(b: Array[Byte]): Unit = {
      ensure(b.length)
      System.arraycopy(b, 0, a, pos, b.length); pos += b.length
    }
    def zeros(n: Int): Unit = { ensure(n); pos += n } // array is zeroed
    def align8(): Unit = if (pos % 8 != 0) zeros(8 - pos % 8)
    def patch16(at: Int, v: Int): Unit = {
      a(at) = (v & 0xff).toByte; a(at + 1) = ((v >> 8) & 0xff).toByte
    }
    def patch32(at: Int, v: Long): Unit = {
      patch16(at, (v & 0xffff).toInt); patch16(at + 2, ((v >> 16) & 0xffff).toInt)
    }
    def patch64(at: Int, v: Long): Unit = {
      patch32(at, v & 0xffffffffL); patch32(at + 4, (v >>> 32) & 0xffffffffL)
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(a, pos)
  }

  // ------------------------------------------------------- message bodies

  /** Datatype message bytes (v1 encoding; properties per the spec's
    * fixed-point / floating-point / string classes). */
  private def dtBytes(t: WType): Array[Byte] = {
    val b = new Buf
    t match {
      case WInt(size, signed) =>
        b.u8(0x10); b.u8(if (signed) 0x08 else 0x00); b.u8(0); b.u8(0)
        b.u32(size)
        b.u16(0); b.u16(8 * size) // bit offset, precision
      case WF64 =>
        b.u8(0x11); b.u8(0x20); b.u8(63); b.u8(0) // LE, implied-msb, sign@63
        b.u32(8)
        b.u16(0); b.u16(64) // bit offset, precision
        b.u8(52); b.u8(11) // exponent location/size
        b.u8(0); b.u8(52) // mantissa location/size
        b.u32(1023) // exponent bias
      case WF32 =>
        b.u8(0x11); b.u8(0x20); b.u8(31); b.u8(0)
        b.u32(4)
        b.u16(0); b.u16(32)
        b.u8(23); b.u8(8)
        b.u8(0); b.u8(23)
        b.u32(127)
      case WStr(size) =>
        b.u8(0x13); b.u8(0x00); b.u8(0); b.u8(0) // NUL-terminated, ASCII
        b.u32(math.max(size, 1))
    }
    b.result()
  }

  /** vlen(sequence) of object references — the `DIMENSION_LIST` type. */
  private def dtVlenRefBytes(): Array[Byte] = {
    val b = new Buf
    b.u8(0x19); b.u8(0x00); b.u8(0); b.u8(0) // vlen, sequence
    b.u32(16) // in-file vlen datum: length(4) + gheap addr(8) + index(4)
    b.u8(0x17); b.u8(0x00); b.u8(0); b.u8(0) // base: object reference
    b.u32(8)
    b.result()
  }

  /** Dataspace message bytes, v1: rank 0 = scalar. */
  private def dsBytes(shape: Seq[Long], maxShape: Option[Seq[Long]])
      : Array[Byte] = {
    val b = new Buf
    b.u8(1); b.u8(shape.length); b.u8(if (maxShape.isDefined) 1 else 0)
    b.zeros(5)
    shape.foreach(b.u64)
    maxShape.foreach(_.foreach(b.u64))
    b.result()
  }

  /** A pending global-heap object: payload + the absolute buf position of
    * the 8-byte collection-address slot to patch once the GCOL lands. */
  private final class GHeap {
    val objs = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val addrSlots = scala.collection.mutable.ArrayBuffer[Int]()
    /** Returns the 1-based heap object index. */
    def add(payload: Array[Byte]): Int = { objs += payload; objs.size }
  }

  // ------------------------------------------------------- chunk B-trees

  /** zlib-wrapped deflate of one chunk ([[Hdf5Reader]]'s `Inflater`
    * default format, and what the HDF5 deflate filter stores). */
  private def deflateBytes(in: Array[Byte], level: Int): Array[Byte] = {
    val d = new java.util.zip.Deflater(level)
    d.setInput(in); d.finish()
    val out = new java.io.ByteArrayOutputStream(math.max(64, in.length / 4))
    val tmp = new Array[Byte](65536)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }

  /** HDF5 shuffle filter, write direction: byte-transpose so the k-th
    * byte of every element lands together (the exact inverse of
    * [[Hdf5Reader]]'s unshuffle). */
  private def shuffleBytes(in: Array[Byte], es: Int): Array[Byte] =
    if (es <= 1 || in.length % es != 0) in
    else {
      val n = in.length / es
      val out = new Array[Byte](in.length)
      var j = 0
      while (j < es) {
        var i = 0
        while (i < n) { out(j * n + i) = in(i * es + j); i += 1 }
        j += 1
      }
      out
    }

  /** Entries per v1 B-tree node. 32 stays within the C library's default
    * indexed-storage K=32 (max 2K=64 entries/node), so external HDF5
    * readers accept the nodes. */
  private val BtNodeMax = 32

  /** Write the (possibly multi-level) v1 chunk B-tree for one dataset.
    * `entries` = (dim-0 offset in rows, stored byte size, chunk address)
    * in ascending offset order. Returns the root node address.
    *
    * v1 B-tree node (spec III.A.1): TREE, node type 1, level, entries
    * used, left/right sibling, then key0, child0, key1, ..., key_n.
    * A chunk key = stored size (u32), filter mask (u32), chunk offset
    * (u64 per dataset dim + one trailing element-dim 0). */
  private def writeChunkBtree(buf: Buf, rank: Int,
      entries: Seq[(Long, Int, Long)], shape: Seq[Long], cr: Long): Long = {
    // key = (stored size, dim-0 offset); inner-dim offsets are always 0
    // (chunks span the full inner extent)
    def putKey(size: Int, off: Long): Unit = {
      buf.u32(size); buf.u32(0) // size, filter mask
      buf.u64(off)
      (1 until rank).foreach(_ => buf.u64(0))
      buf.u64(0) // element dim
    }
    val upperOff = // upper-bound key offset after the last chunk
      math.max(shape.headOption.getOrElse(0L),
        entries.lastOption.map(_._1 + cr).getOrElse(0L))
    /** One level: write nodes of up to [[BtNodeMax]] children, link
      * siblings, return (node addr, first-key size, first-key offset). */
    def writeLevel(level: Int, children: Seq[(Long, Int, Long)])
        : Seq[(Long, Int, Long)] = {
      val groups =
        if (children.isEmpty) Seq(Seq.empty[(Long, Int, Long)])
        else children.grouped(BtNodeMax).toSeq
      val addrs = groups.zipWithIndex.map { case (g, gi) =>
        buf.align8()
        val addr = buf.pos.toLong
        buf.bytes("TREE".getBytes("US-ASCII"))
        buf.u8(1) // node type 1: raw data chunks
        buf.u8(level)
        buf.u16(g.size)
        buf.u64(Undefined); buf.u64(Undefined) // siblings (patched below)
        g.foreach { case (off, size, child) =>
          putKey(size, off); buf.u64(child)
        }
        // trailing key: first key of the next node's subtree, or the
        // upper bound past the last chunk (readers stop at nent; the C
        // library uses it for key-order checks only)
        val next = groups.lift(gi + 1).flatMap(_.headOption)
        putKey(next.map(_._2).getOrElse(0),
          next.map(_._1).getOrElse(upperOff))
        addr
      }
      // sibling links
      addrs.zipWithIndex.foreach { case (a, i) =>
        if (i > 0) buf.patch64(a.toInt + 8, addrs(i - 1))
        if (i < addrs.size - 1) buf.patch64(a.toInt + 16, addrs(i + 1))
      }
      addrs.zip(groups).map { case (a, g) =>
        (g.headOption.map(_._1).getOrElse(0L),
          g.headOption.map(_._2).getOrElse(0), a)
      }
    }
    var level = 0
    var nodes = writeLevel(0, entries)
    while (nodes.size > 1) {
      level += 1
      nodes = writeLevel(level, nodes)
    }
    nodes.head._3
  }

  // ---------------------------------------------------------------- write

  def write(dst: java.nio.file.Path, datasets: Seq[WDataset],
      rootAttrs: Seq[(String, WAttrVal)]): Unit =
    java.nio.file.Files.write(dst, build(datasets, rootAttrs))

  def build(datasets: Seq[WDataset],
      rootAttrs: Seq[(String, WAttrVal)]): Array[Byte] = {
    require(datasets.map(_.name).distinct.size == datasets.size,
      "duplicate dataset names")
    datasets.foreach { ds =>
      val n = ds.shape.product max (if (ds.shape.isEmpty) 1L else 0L)
      ds.data.foreach(d => require(d.length == n * ds.dtype.size,
        s"${ds.name}: ${d.length} data bytes for shape ${ds.shape} x " +
          s"${ds.dtype.size}"))
      require(ds.unlimited0 || (ds.chunkRows.isEmpty && ds.deflate.isEmpty
        && !ds.fletcher32 && !ds.shuffle),
        s"${ds.name}: chunkRows/deflate/shuffle/fletcher32 need chunked " +
          "layout (unlimited0 = true)")
      ds.deflate.foreach(l => require(l >= 1 && l <= 9,
        s"${ds.name}: deflate level $l out of range 1-9"))
      ds.chunkRows.foreach(c => require(c > 0,
        s"${ds.name}: chunkRows $c must be positive"))
    }
    val buf = new Buf
    val gheap = new GHeap
    val ohAddr = scala.collection.mutable.LinkedHashMap[String, Long]()

    // ---- superblock v0 (96 bytes incl. root symbol-table entry)
    buf.bytes(Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
      .map(_.toByte))
    buf.u8(0) // superblock v0
    buf.u8(0); buf.u8(0) // free space / root symbol table versions
    buf.u8(0) // reserved
    buf.u8(0) // shared header message version
    buf.u8(8); buf.u8(8) // size of offsets / lengths
    buf.u8(0) // reserved
    buf.u16(math.max(4, datasets.size)) // group leaf K (one SNOD suffices)
    buf.u16(16) // group internal K
    buf.u32(0) // file consistency flags
    buf.u64(0) // base address
    buf.u64(Undefined) // free-space info
    val eofSlot = buf.pos; buf.u64(0) // end-of-file address (patched)
    buf.u64(Undefined) // driver info block
    // root group symbol table entry
    buf.u64(0) // link name offset
    val rootOhSlot = buf.pos; buf.u64(0) // root OH address (patched)
    buf.u32(0); buf.u32(0) // cache type, reserved
    buf.zeros(16) // scratch

    // ---- data regions (contiguous blocks / chunk data + chunk B-trees)
    val contAddr = scala.collection.mutable.Map[String, (Long, Long)]()
    val chunkBt = scala.collection.mutable.Map[String, Long]()
    val chunkRowsUsed = scala.collection.mutable.Map[String, Long]()
    datasets.foreach { ds =>
      val total = ds.data.map(_.length.toLong).getOrElse(0L)
      if (ds.unlimited0) {
        val rank = ds.shape.length
        val nRows = ds.shape.headOption.getOrElse(0L)
        val rowBytes = math.max(ds.shape.drop(1).product, 1L) * ds.dtype.size
        // chunk extent along dim 0: caller's chunkRows, else one chunk
        // spanning the whole current extent (the pre-r5 shape)
        val cr = ds.chunkRows.map(_.toLong).filter(_ > 0)
          .getOrElse(math.max(nRows, 1L))
        chunkRowsUsed(ds.name) = cr
        // write chunk payloads; edge chunks are padded to the full chunk
        // extent (the on-disk convention — readers clip by dataset shape)
        final case class CEntry(offRows: Long, stored: Int, addr: Long)
        val entries = scala.collection.mutable.ArrayBuffer[CEntry]()
        if (ds.data.isDefined && total > 0) {
          val data = ds.data.get
          val logical = (cr * rowBytes).toInt
          var off = 0L
          while (off < nRows) {
            val at = (off * rowBytes).toInt
            val avail = (math.min(nRows - off, cr) * rowBytes).toInt
            var payload =
              if (avail == logical)
                java.util.Arrays.copyOfRange(data, at, at + logical)
              else {
                val p = new Array[Byte](logical)
                System.arraycopy(data, at, p, 0, avail)
                p
              }
            if (ds.shuffle) payload = shuffleBytes(payload, ds.dtype.size)
            ds.deflate.foreach(lvl => payload = deflateBytes(payload, lvl))
            if (ds.fletcher32) {
              // trailing checksum, little-endian, over the (possibly
              // compressed) chunk as stored — matching the pipeline order
              // declared in the filter message (deflate, then fletcher32)
              val sum = Hdf5Reader.fletcher32(payload, payload.length)
              val w = java.util.Arrays.copyOf(payload, payload.length + 4)
              w(payload.length) = (sum & 0xff).toByte
              w(payload.length + 1) = ((sum >> 8) & 0xff).toByte
              w(payload.length + 2) = ((sum >> 16) & 0xff).toByte
              w(payload.length + 3) = ((sum >> 24) & 0xff).toByte
              payload = w
            }
            buf.align8()
            entries += CEntry(off, payload.length, buf.pos.toLong)
            buf.bytes(payload)
            off += cr
          }
        }
        chunkBt(ds.name) =
          writeChunkBtree(buf, rank, entries.toSeq.map(e =>
            (e.offRows, e.stored, e.addr)), ds.shape, cr)
      } else if (ds.data.isDefined) {
        buf.align8()
        contAddr(ds.name) = (buf.pos.toLong, total)
        ds.data.foreach(buf.bytes)
      } // else: unallocated contiguous storage (address undefined)
    }

    // gheap address slots of the attr body being built (body-relative;
    // rebased to absolute positions by writeOH)
    val pendingGheapSlots = scala.collection.mutable.ArrayBuffer[Int]()

    // ---- one v1 attribute message body
    def attrBody(name: String, v: WAttrVal): Array[Byte] = {
      val b = new Buf
      val (dt, ds, data: Array[Byte], gSlots) = v match {
        case WStrAttr(s) =>
          val raw = s.getBytes("UTF-8")
          (dtBytes(WStr(raw.length + 1)), dsBytes(Nil, None),
            java.util.Arrays.copyOf(raw, raw.length + 1), Nil)
        case WLongAttr(x, size) =>
          val d = new Buf; (0 until size).foreach(i => d.u8(((x >> (8 * i)) & 0xff).toInt))
          (dtBytes(WInt(size, signed = true)), dsBytes(Nil, None),
            d.result(), Nil)
        case WDoubleAttr(x) =>
          val d = new Buf; d.u64(java.lang.Double.doubleToLongBits(x))
          (dtBytes(WF64), dsBytes(Nil, None), d.result(), Nil)
        case WFloatAttr(x) =>
          val d = new Buf; d.u32(java.lang.Float.floatToIntBits(x) & 0xffffffffL)
          (dtBytes(WF32), dsBytes(Nil, None), d.result(), Nil)
        case WDimListAttr(dimNames) =>
          val d = new Buf
          val slots = dimNames.map { dn =>
            val target = ohAddr.getOrElse(dn, throw new IllegalStateException(
              s"DIMENSION_LIST references $dn before its dataset is written"))
            val ref = new Buf; ref.u64(target)
            val idx = gheap.add(ref.result())
            d.u32(1) // vlen length: one reference
            val slot = d.pos; d.u64(0) // collection address (patched)
            d.u32(idx)
            slot
          }
          (dtVlenRefBytes(), dsBytes(Seq(dimNames.length.toLong), None),
            d.result(), slots)
      }
      val nameRaw = name.getBytes("UTF-8")
      val nsize = nameRaw.length + 1
      b.u8(1); b.u8(0) // version 1, reserved — name starts at +8
      b.u16(nsize); b.u16(dt.length); b.u16(ds.length)
      b.bytes(nameRaw); b.u8(0); b.align8()
      b.bytes(dt); b.align8()
      b.bytes(ds); b.align8()
      val dataStart = b.pos
      b.bytes(data)
      // remember gheap address slots relative to the body start
      gSlots.foreach(s => pendingGheapSlots += (dataStart + s))
      b.result()
    }

    // ---- one v1 object header from (type, body) messages
    def writeOH(msgs: Seq[(Int, () => Array[Byte])]): Long = {
      buf.align8()
      val addr = buf.pos.toLong
      buf.u8(1); buf.u8(0)
      buf.u16(msgs.size)
      buf.u32(1) // object reference count
      val sizeSlot = buf.pos; buf.u32(0)
      buf.u32(0) // pad to 8-align message start
      val start = buf.pos
      msgs.foreach { case (t, mkBody) =>
        pendingGheapSlots.clear()
        val body = mkBody()
        val padded = (body.length + 7) / 8 * 8
        buf.u16(t); buf.u16(padded)
        buf.u8(0); buf.u8(0); buf.u8(0); buf.u8(0) // flags + reserved
        val bodyAt = buf.pos
        buf.bytes(body); buf.zeros(padded - body.length)
        pendingGheapSlots.foreach(rel => gheap.addrSlots += (bodyAt + rel))
      }
      buf.patch32(sizeSlot, buf.pos - start)
      addr
    }

    // ---- dataset object headers (caller orders dims before referencers)
    datasets.foreach { ds =>
      val maxShape =
        if (ds.unlimited0)
          Some(Undefined +: ds.shape.drop(1))
        else None
      val msgs = Seq.newBuilder[(Int, () => Array[Byte])]
      msgs += 0x01 -> (() => dsBytes(ds.shape, maxShape))
      msgs += 0x03 -> (() => dtBytes(ds.dtype))
      msgs += 0x05 -> (() => Array[Byte](2, 2, 0, 0)) // fill v2, undefined
      // filter pipeline v1, filters in write-application order: shuffle
      // (id 2, client data = element size), deflate (id 1, client data =
      // level), then fletcher32 (id 3)
      val pipeline: Seq[(Int, Seq[Int])] =
        (if (ds.shuffle) Seq(2 -> Seq(ds.dtype.size)) else Nil) ++
          ds.deflate.map(lvl => 1 -> Seq(lvl)).toSeq ++
          (if (ds.fletcher32) Seq(3 -> Seq.empty[Int]) else Nil)
      if (pipeline.nonEmpty && ds.unlimited0)
        msgs += 0x0b -> { () =>
          val b = new Buf
          b.u8(1); b.u8(pipeline.size); b.zeros(6) // version, nf, reserved
          pipeline.foreach { case (id, cd) =>
            b.u16(id); b.u16(0) // filter id, name length
            b.u16(0); b.u16(cd.size) // flags, client data count
            cd.foreach(v => b.u32(v & 0xffffffffL)) // 4-byte values (spec)
            if (cd.size % 2 == 1) b.u32(0) // v1 pads odd count with 4 bytes
          }
          b.result()
        }
      msgs += 0x08 -> { () =>
        val b = new Buf
        b.u8(3) // layout v3
        if (ds.unlimited0) {
          b.u8(2) // chunked
          b.u8(ds.shape.length + 1)
          b.u64(chunkBt(ds.name))
          b.u32(math.max(chunkRowsUsed(ds.name), 1L))
          ds.shape.drop(1).foreach(s => b.u32(math.max(s, 1L)))
          b.u32(ds.dtype.size)
        } else {
          b.u8(1) // contiguous
          val (addr, size) = contAddr.getOrElse(ds.name, (Undefined, 0L))
          b.u64(addr); b.u64(size)
        }
        b.result()
      }
      ds.attrs.foreach { case (an, av) =>
        msgs += 0x0c -> (() => attrBody(an, av))
      }
      // record the address BEFORE building messages so a coordinate
      // variable's own DIMENSION_LIST (if any) could self-resolve; writeOH
      // computes the address at buf.align8 time, so pre-compute it:
      buf.align8()
      ohAddr(ds.name) = buf.pos.toLong
      writeOH(msgs.result())
    }

    // ---- local heap with all link names
    buf.align8()
    val heapAddr = buf.pos.toLong
    val nameOff = scala.collection.mutable.Map[String, Long]()
    val heapData = new Buf
    heapData.zeros(8) // offset 0: empty name (root entry) + alignment
    datasets.foreach { ds =>
      nameOff(ds.name) = heapData.pos.toLong
      heapData.bytes(ds.name.getBytes("UTF-8")); heapData.u8(0)
      heapData.align8()
    }
    val hd = heapData.result()
    buf.bytes("HEAP".getBytes("US-ASCII"))
    buf.u8(0); buf.zeros(3)
    buf.u64(hd.length)
    buf.u64(1) // free list: none
    buf.u64(heapAddr + 32) // data segment directly follows the header
    buf.bytes(hd)

    // ---- SNOD with all entries, sorted by link name
    buf.align8()
    val snodAddr = buf.pos.toLong
    val sorted = datasets.map(_.name).sorted
    buf.bytes("SNOD".getBytes("US-ASCII"))
    buf.u8(1); buf.u8(0)
    buf.u16(sorted.size)
    sorted.foreach { n =>
      buf.u64(nameOff(n))
      buf.u64(ohAddr(n))
      buf.u32(0); buf.u32(0) // cache type, reserved
      buf.zeros(16)
    }

    // ---- group B-tree (single leaf entry -> the SNOD)
    buf.align8()
    val btreeAddr = buf.pos.toLong
    buf.bytes("TREE".getBytes("US-ASCII"))
    buf.u8(0) // node type 0: group nodes
    buf.u8(0) // level
    buf.u16(1)
    buf.u64(Undefined); buf.u64(Undefined)
    buf.u64(0) // key 0: empty name (sorts before everything)
    buf.u64(snodAddr)
    buf.u64(sorted.lastOption.map(nameOff).getOrElse(0L)) // key 1
    // ---- root group object header
    val rootMsgs = Seq.newBuilder[(Int, () => Array[Byte])]
    rootMsgs += 0x11 -> { () =>
      val b = new Buf; b.u64(btreeAddr); b.u64(heapAddr); b.result()
    }
    rootAttrs.foreach { case (an, av) =>
      rootMsgs += 0x0c -> (() => attrBody(an, av))
    }
    val rootOh = writeOH(rootMsgs.result())

    // ---- global heap collection (DIMENSION_LIST reference payloads).
    // Emitted LAST, after every object header — attrBody may add gheap
    // objects while any OH (including the root's) is being built, and the
    // address-slot patch below must see all of them. Readers chase the
    // patched address, so the collection's file position is irrelevant.
    if (gheap.objs.nonEmpty) {
      buf.align8()
      val gcolAddr = buf.pos.toLong
      val objBytes = gheap.objs.map(o => 16 + (o.length + 7) / 8 * 8).sum
      // collections are at least 4096 bytes per the spec; pad with the
      // terminating free-space object
      val total = math.max(16L + objBytes + 16, 4096L)
      buf.bytes("GCOL".getBytes("US-ASCII"))
      buf.u8(1); buf.zeros(3)
      buf.u64(total)
      gheap.objs.zipWithIndex.foreach { case (o, i) =>
        buf.u16(i + 1) // object index (1-based)
        buf.u16(1) // reference count
        buf.u32(0)
        buf.u64(o.length)
        buf.bytes(o); buf.align8()
      }
      val used = buf.pos - gcolAddr.toInt
      buf.u16(0); buf.u16(0); buf.u32(0) // free-space object (index 0)
      buf.u64(total - used) // remaining bytes incl. this header
      buf.zeros((gcolAddr + total - buf.pos).toInt)
      gheap.addrSlots.foreach(slot => buf.patch64(slot, gcolAddr))
    }

    buf.patch64(rootOhSlot, rootOh)
    buf.patch64(eofSlot, buf.pos.toLong)
    buf.result()
  }
}
