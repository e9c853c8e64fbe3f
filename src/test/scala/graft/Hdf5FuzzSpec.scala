package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Hdf5Reader, Hdf5Writer, Szip}
import graft.sources.Hdf5Writer._

/** Property fuzz over the HDF5 writer→reader seam.
  *
  * The two sides are INDEPENDENT implementations of the public HDF5
  * format and previously met only on curated fixtures — a seeded sweep
  * over randomized combinations of layout (contiguous vs chunked at
  * many chunk counts, 1-D and 2-D shapes), filter pipeline (deflate
  * levels, szip parameter grid, shuffle, fletcher32, and their legal
  * compositions), and datatype (all int widths signed/unsigned, f32,
  * f64, fixed strings, compounds in both message versions, enums)
  * asserts write→read identity over ≥100 generated files, exercising
  * corner paths no hand-written fixture enumerates (1-row chunks →
  * hundreds of B-tree entries, edge-chunk padding at every remainder,
  * zero-length strings, 8-byte ints under shuffle, ...). */
class Hdf5FuzzSpec extends AnyFunSuite {

  private val Trials = 120

  /** One generated dataset: the writer spec + the values the reader
    * must hand back ([[Hdf5Reader]]'s documented decode mapping —
    * ints→Long, f32→Float (Double inside compounds), strings
    * NUL-truncated, enums→base int). */
  private final case class Gen(ds: WDataset, expected: IndexedSeq[Any])

  private def putInt(b: ByteBuffer, size: Int, v: Long): Unit = size match {
    case 1 => b.put(v.toByte)
    case 2 => b.putShort(v.toShort)
    case 4 => b.putInt(v.toInt)
    case 8 => b.putLong(v)
  }

  private def randInt(rnd: scala.util.Random, size: Int,
      signed: Boolean): Long = {
    val bits = rnd.nextLong()
    if (size == 8) bits
    else if (signed) bits >> (64 - 8 * size) // sign-extended range
    else bits & ((1L << (8 * size)) - 1)
  }

  private def randStr(rnd: scala.util.Random, max: Int): String =
    (0 until rnd.nextInt(max + 1))
      .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString

  private def genDataset(rnd: scala.util.Random, name: String): Gen = {
    val twoD = rnd.nextInt(5) == 0
    val rows = 1 + rnd.nextInt(300)
    val cols = if (twoD) 2 + rnd.nextInt(5) else 1
    val shape = if (twoD) Seq(rows.toLong, cols.toLong) else Seq(rows.toLong)
    val n = rows * cols

    // datatype + element generator + expected-decode mapping
    val (dtype, gen): (WType, () => Any) = rnd.nextInt(6) match {
      case 0 => (WF64, () => rnd.nextDouble() * 2e6 - 1e6)
      case 1 => (WF32, () => rnd.nextFloat() * 1e3f - 500f)
      case 2 =>
        val size = Seq(1, 2, 4, 8)(rnd.nextInt(4))
        val signed = rnd.nextBoolean()
        (WInt(size, signed), () => randInt(rnd, size, signed))
      case 3 =>
        val sz = 2 + rnd.nextInt(7)
        (WStr(sz), () => randStr(rnd, sz))
      case 4 =>
        // 2-4 packed members; v1 and v3 message layouts both fuzzed
        val members = (0 until 2 + rnd.nextInt(3)).map { mi =>
          s"m$mi" -> (rnd.nextInt(4) match {
            case 0 => WInt(Seq(1, 2, 4, 8)(rnd.nextInt(4)),
              rnd.nextBoolean())
            case 1 => WF32
            case 2 => WF64
            case 3 => WStr(2 + rnd.nextInt(5))
          })
        }
        (WCompound(members, v1 = rnd.nextBoolean()),
          () => members.map {
            case (_, WInt(sz, sg)) => randInt(rnd, sz, sg)
            case (_, WF32) => rnd.nextFloat().toDouble // memberVal: f32→Double
            case (_, WF64) => rnd.nextDouble()
            case (_, WStr(sz)) => randStr(rnd, sz)
            case (_, t) => fail(s"unexpected member $t")
          })
      case 5 =>
        val base = if (rnd.nextBoolean()) WInt(1) else WInt(4)
        val labels = Seq("clear" -> 0L, "cloudy" -> 1L, "mixed" -> 2L,
          "missing" -> -1L)
        (WEnum(base, labels, v1 = rnd.nextBoolean()),
          () => labels(rnd.nextInt(labels.length))._2)
    }
    val values = IndexedSeq.fill(n)(gen())

    // encode the element bytes exactly as the format stores them
    val buf = ByteBuffer.allocate(n * dtype.size)
      .order(ByteOrder.LITTLE_ENDIAN)
    def putElem(t: WType, v: Any): Unit = (t, v) match {
      case (WF64, d: Double) => buf.putDouble(d)
      case (WF32, f: Float) => buf.putFloat(f)
      case (WInt(sz, _), l: Long) => putInt(buf, sz, l)
      case (WStr(sz), s: String) =>
        buf.put(java.util.Arrays.copyOf(s.getBytes("UTF-8"), sz))
      case (WEnum(base, _, _), l: Long) => putInt(buf, base.size, l)
      case (c: WCompound, ms: Seq[_]) =>
        c.members.zip(ms).foreach {
          case ((_, WF32), d: Double) => buf.putFloat(d.toFloat)
          case ((_, mt), mv) => putElem(mt, mv)
        }
      case (t, v) => fail(s"cannot encode $v as $t")
    }
    values.foreach(v => putElem(dtype, v))

    // layout + filter pipeline (filters are chunked-only by contract)
    val chunked = rnd.nextBoolean()
    val chunkRows =
      if (!chunked) None
      else if (rnd.nextInt(4) == 0) None // one chunk spanning the extent
      else Some(1 + rnd.nextInt(rows)) // down to 1-row chunks: deep B-trees
    // szip caps at 32-bit samples: ints and enum bases up to 4 bytes
    val szipBits: Option[Int] = dtype match {
      case WInt(s, _) if s <= 4 => Some(8 * s)
      case WEnum(b, _, _) if b.size <= 4 => Some(8 * b.size)
      case _ => None
    }
    val (deflate, szip) =
      if (!chunked) (None, None)
      else rnd.nextInt(4) match {
        case 0 => (None, None)
        case 1 => (Some(1 + rnd.nextInt(9)), None)
        case _ if szipBits.isDefined => // biased: szip needs eligible dtypes
          val j = Seq(8, 16)(rnd.nextInt(2))
          val sls = Seq(64, 128)(rnd.nextInt(2))
          val mode = if (rnd.nextBoolean()) Szip.NN else Szip.EC
          (None, Some(Szip.Params(mode | Szip.LSB, szipBits.get, j, sls)))
        case _ => (Some(1 + rnd.nextInt(9)), None)
      }
    val shuffle = chunked && rnd.nextBoolean()
    val fletcher = chunked && rnd.nextBoolean()

    // expected decode: WF32 standalone comes back Float; compounds per
    // memberVal; everything else is generated in decoded form already
    val expected: IndexedSeq[Any] = dtype match {
      case c: WCompound =>
        values.map(_.asInstanceOf[Seq[Any]])
      case _ => values
    }
    Gen(WDataset(name, shape, dtype, Some(buf.array()), Nil,
      unlimited0 = chunked, fletcher32 = fletcher, chunkRows = chunkRows,
      deflate = deflate, szip = szip, shuffle = shuffle), expected)
  }

  private def ctx(g: Gen): String = {
    val d = g.ds
    s"${d.name}: shape=${d.shape} dtype=${d.dtype} chunked=${d.unlimited0} " +
      s"chunkRows=${d.chunkRows} deflate=${d.deflate} szip=${d.szip} " +
      s"shuffle=${d.shuffle} fletcher32=${d.fletcher32}"
  }

  test(s"write->read identity over $Trials randomized files " +
      "(layouts x filters x dtypes)") {
    val rnd = new scala.util.Random(20260814L)
    val tmp = Files.createTempDirectory("h5fuzz")
    val hits = scala.collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    try {
      for (trial <- 0 until Trials) {
        val gens = (0 until 1 + rnd.nextInt(3)).map(i =>
          genDataset(rnd, s"v$i"))
        for (g <- gens) {
          val d = g.ds
          if (d.unlimited0) hits("chunked") += 1 else hits("contiguous") += 1
          if (d.deflate.isDefined) hits("deflate") += 1
          if (d.szip.isDefined) hits("szip") += 1
          if (d.shuffle) hits("shuffle") += 1
          if (d.fletcher32) hits("fletcher32") += 1
          if (d.chunkRows.exists(_ < d.shape.head)) hits("multichunk") += 1
          if (d.chunkRows.exists(_ == 1)) hits("rowchunks") += 1
          if (d.shape.length > 1) hits("2d") += 1
          d.dtype match {
            case _: WCompound => hits("compound") += 1
            case _: WEnum => hits("enum") += 1
            case _: WStr => hits("string") += 1
            case WInt(8, _) => hits("int64") += 1
            case _ => ()
          }
        }
        val dst = tmp.resolve(s"f$trial.nc")
        Hdf5Writer.streamTo(dst) { w =>
          gens.foreach(g => w.dataset(g.ds))
          w.finish(Seq("title" -> WStrAttr(s"fuzz trial $trial")))
        }
        val h5 = Hdf5Reader.open(dst.toString)
        try {
          for (g <- gens) {
            val ds = h5.datasets.find(_.name == g.ds.name).getOrElse(
              fail(s"trial $trial: dataset lost — ${ctx(g)}"))
            assert(ds.shape === g.ds.shape, s"trial $trial: ${ctx(g)}")
            val got: IndexedSeq[Any] = (h5.read(ds): Any) match {
              case a: Array[_] => a.toIndexedSeq
              case other => fail(s"trial $trial: read gave $other")
            }
            assert(got.length === g.expected.length,
              s"trial $trial: ${ctx(g)}")
            var i = 0
            while (i < got.length) {
              assert(got(i) === g.expected(i),
                s"trial $trial elem $i: ${ctx(g)}")
              i += 1
            }
            // a random record-range slab of the same dataset must equal
            // the full decode sliced — the windowed read path the v2
            // netcdf source splits on, fuzzed across every layout /
            // filter / dtype combination the generator covers
            val rows = g.ds.shape.head.toInt
            val lo = rnd.nextInt(rows + 1)
            val hi = lo + rnd.nextInt(rows - lo + 1)
            val inner = g.ds.shape.drop(1).product.toInt max 1
            val slab: IndexedSeq[Any] =
              (h5.readSlab(ds, lo, hi): Any) match {
                case a: Array[_] => a.toIndexedSeq
                case other => fail(s"trial $trial: slab gave $other")
              }
            assert(slab === got.slice(lo * inner, hi * inner),
              s"trial $trial slab [$lo,$hi): ${ctx(g)}")
          }
        } finally h5.close()
        Files.delete(dst) // bound the temp footprint across trials
      }
      // the sweep must actually COVER the space — a silently-narrow
      // generator would turn this property into a smoke test
      for (k <- Seq("chunked", "contiguous", "deflate", "szip", "shuffle",
        "fletcher32", "multichunk", "2d", "compound", "enum", "string",
        "int64"))
        assert(hits(k) >= 5, s"generator coverage too thin: $k=${hits(k)}")
      info(hits.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
        .mkString(", "))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }
}
