package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2 C, `mm_*`): treat image/audio/
  * video payloads as opaque binary columns with typed metadata, and run
  * decode + feature-extract as a per-partition batch loop — the Scala
  * analog of `mapInPandas` (batched, no per-row JVM<->codec round trips).
  *
  * The codecs here are REAL, pure-JVM implementations of public container
  * formats — no stub, no external library:
  *
  *   - [[Wav]]: RIFF/WAVE PCM (Microsoft/IBM WAVE spec) — 16-bit LE mono
  *     encode/decode, unknown-chunk skipping, odd-size chunk padding.
  *   - [[Png]]: PNG (RFC 2083 / ISO 15948) — truecolor 8-bit encode/decode
  *     with zlib IDAT via `java.util.zip.{Deflater,Inflater}`, all five
  *     scanline filters (None/Sub/Up/Average/Paeth) on both sides, and
  *     per-chunk CRC-32 verification that fails loudly on corruption.
  *   - [[Avi]]: RIFF/AVI (Microsoft AVI 1.0) — `hdrl`(avih+strl)/`movi`
  *     lists with uncompressed `00db` DIB frames.
  *
  * The sandbox's tables carry no genuine media column, so [[MediaSynth]]
  * synthesizes deterministic payloads from row ids; the decode path never
  * sees the generator formulas — it parses the bytes like any foreign
  * file, which is exactly what the DuckDB oracle parity proves (the oracle
  * recomputes the features from the formulas; a decoder bug breaks the
  * hash). At 100 TB the payloads come from storage instead and the same
  * decode/feature stages apply unchanged: payloads stay distributed,
  * decode is embarrassingly parallel per partition, features are columnar.
  */
object Multimodal {

  // ------------------------------------------------------------ byte utils

  private[multimodal] def le16(v: Int): Array[Byte] =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private[multimodal] def le32(v: Int): Array[Byte] =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private[multimodal] def be32(v: Int): Array[Byte] =
    Array[Byte](((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** Little-endian reader over a RIFF-family payload. */
  private final class LeReader(bytes: Array[Byte]) {
    val buf: ByteBuffer = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def pos: Int = buf.position()
    def seek(p: Int): Unit = buf.position(p)
    def remaining: Int = buf.remaining()
    def u16(): Int = buf.getShort() & 0xffff
    def s16(): Short = buf.getShort()
    def u32(): Long = buf.getInt().toLong & 0xffffffffL
    def i32(): Int = buf.getInt()
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    def take(n: Int): Array[Byte] = {
      require(n >= 0 && n <= remaining, s"truncated payload: need $n bytes, have $remaining")
      val b = new Array[Byte](n); buf.get(b); b
    }
    def skip(n: Int): Unit = {
      require(n <= remaining, s"truncated payload: skip $n past end")
      buf.position(buf.position() + n)
    }
  }

  // ------------------------------------------------------------------ RIFF

  /** RIFF container primitives shared by WAV and AVI (the format family's
    * whole point): chunks are `fourcc + le32 size + payload`, padded to
    * even offsets; `LIST` chunks nest with a 4-byte list type. */
  object Riff {
    final case class Chunk(id: String, listType: Option[String],
        payload: Array[Byte])

    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      require(id.length == 4, s"fourcc must be 4 chars: '$id'")
      val out = new ByteArrayOutputStream()
      out.write(id.getBytes("US-ASCII"))
      out.write(le32(payload.length))
      out.write(payload)
      if ((payload.length & 1) == 1) out.write(0) // pad to even
      out.toByteArray
    }

    def list(listType: String, children: Array[Byte]*): Array[Byte] = {
      val body = new ByteArrayOutputStream()
      body.write(listType.getBytes("US-ASCII"))
      children.foreach(body.write)
      chunk("LIST", body.toByteArray)
    }

    def riff(formType: String, children: Array[Byte]*): Array[Byte] = {
      val body = new ByteArrayOutputStream()
      body.write(formType.getBytes("US-ASCII"))
      children.foreach(body.write)
      chunk("RIFF", body.toByteArray)
    }

    /** Parse the immediate children of a chunk body (after its list/form
      * type fourcc). LIST children keep their nested payload raw — call
      * again to descend. */
    def children(body: Array[Byte]): Seq[Chunk] = {
      val r = new LeReader(body)
      val out = Seq.newBuilder[Chunk]
      while (r.remaining >= 8) {
        val id = r.fourcc()
        val size = r.u32()
        require(size <= r.remaining,
          s"RIFF chunk '$id' declares $size bytes but only ${r.remaining} remain")
        val payload = r.take(size.toInt)
        if ((size & 1) == 1 && r.remaining > 0) r.skip(1) // even padding
        if (id == "LIST" || id == "RIFF") {
          require(payload.length >= 4, s"$id chunk too short for a form type")
          out += Chunk(id, Some(new String(payload, 0, 4, "US-ASCII")),
            payload.drop(4))
        } else out += Chunk(id, None, payload)
      }
      out.result()
    }

    /** Open the outer RIFF form: returns (formType, body). */
    def open(bytes: Array[Byte]): (String, Array[Byte]) = {
      val cs = children(bytes)
      require(cs.nonEmpty && cs.head.id == "RIFF",
        "not a RIFF payload (missing RIFF fourcc)")
      (cs.head.listType.get, cs.head.payload)
    }
  }

  // ----------------------------------------------------------------- WAVE

  /** RIFF/WAVE PCM codec: 16-bit little-endian signed mono. Decode walks
    * the chunk sequence, skips chunks it does not know (LIST/INFO, fact,
    * cue — with odd-size padding), and requires PCM/16-bit before touching
    * `data`. */
  object Wav {
    final case class Clip(sampleRate: Int, bitsPerSample: Int,
        channels: Int, samples: Array[Short])

    def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val fmt = {
        val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
        b.putShort(1.toShort)              // wFormatTag = PCM
        b.putShort(1.toShort)              // nChannels = mono
        b.putInt(sampleRate)               // nSamplesPerSec
        b.putInt(sampleRate * 2)           // nAvgBytesPerSec
        b.putShort(2.toShort)              // nBlockAlign
        b.putShort(16.toShort)             // wBitsPerSample
        b.array()
      }
      val data = {
        val b = ByteBuffer.allocate(samples.length * 2)
          .order(ByteOrder.LITTLE_ENDIAN)
        samples.foreach(b.putShort)
        b.array()
      }
      // a LIST/INFO chunk with an odd-length ISFT value sits between fmt
      // and data on purpose: decoders must skip unknown chunks and honor
      // the even-offset padding rule, and every synthesized clip
      // exercises that path
      val info = Riff.list("INFO",
        Riff.chunk("ISFT", "graft".getBytes("US-ASCII")))
      Riff.riff("WAVE", Riff.chunk("fmt ", fmt), info,
        Riff.chunk("data", data))
    }

    def decode(bytes: Array[Byte]): Clip = {
      val (form, body) = Riff.open(bytes)
      require(form == "WAVE", s"RIFF form is '$form', not WAVE")
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      var data: Option[Array[Byte]] = None
      Riff.children(body).foreach {
        case Riff.Chunk("fmt ", _, p) =>
          val r = new LeReader(p)
          val tag = r.u16()
          require(tag == 1, s"unsupported WAVE format tag $tag (PCM only)")
          val ch = r.u16()
          val rate = r.i32()
          r.skip(6) // byte rate + block align
          fmt = Some((ch, rate, r.u16()))
        case Riff.Chunk("data", _, p) => data = Some(p)
        case _ => // LIST/INFO, fact, cue, ... — skipped by design
      }
      val (ch, rate, bits) = fmt.getOrElse(
        sys.error("WAVE payload has no fmt chunk"))
      require(bits == 16 && ch == 1,
        s"unsupported WAVE layout: $ch ch x $bits bit (16-bit mono only)")
      val d = data.getOrElse(sys.error("WAVE payload has no data chunk"))
      require(d.length % 2 == 0, "WAVE data chunk is not sample-aligned")
      val r = new LeReader(d)
      val samples = Array.fill(d.length / 2)(r.s16())
      Clip(rate, bits, ch, samples)
    }
  }

  // ------------------------------------------------------------------ PNG

  /** PNG truecolor-8 codec. IDAT is zlib via `Deflater`/`Inflater`; the
    * encoder cycles the scanline filter type with the row index
    * (y mod 5), so every image larger than four rows exercises all five
    * PNG filters — None, Sub, Up, Average, Paeth — on both sides. Chunk
    * CRC-32s are emitted on encode and VERIFIED on decode (corruption
    * fails loudly, not silently). */
  object Png {
    final case class Image(width: Int, height: Int, rgb: Array[Byte])

    private val Signature =
      Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

    // zlib codecs allocate native stream state on construction — at
    // millions of small images per partition that allocation dominates
    // the actual compression. One instance per executor thread,
    // reset() per image (the mapInPandas-style batch-reuse pattern).
    // BEST_SPEED: the synthesized pixel formulas are near-incompressible,
    // where higher zlib levels buy bytes-per-mille at 3x the CPU; any
    // zlib level is a valid PNG stream and decode cost is unchanged
    private val deflaters = ThreadLocal.withInitial[Deflater](() =>
      new Deflater(Deflater.BEST_SPEED))
    private val inflaters = ThreadLocal.withInitial[Inflater](() =>
      new Inflater())

    private def crc(id: Array[Byte], payload: Array[Byte]): Int = {
      val c = new CRC32()
      c.update(id); c.update(payload)
      c.getValue.toInt
    }

    private def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val idb = id.getBytes("US-ASCII")
      val out = new ByteArrayOutputStream()
      out.write(be32(payload.length)); out.write(idb); out.write(payload)
      out.write(be32(crc(idb, payload)))
      out.toByteArray
    }

    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b)
      val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    /** rgb is row-major, 3 bytes per pixel, length 3*w*h. */
    def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == 3 * width * height,
        s"rgb length ${rgb.length} != 3*$width*$height")
      val stride = 3 * width
      val raw = new Array[Byte]((stride + 1) * height)
      var y = 0
      while (y < height) {
        val ft = y % 5
        raw((stride + 1) * y) = ft.toByte
        var i = 0
        while (i < stride) {
          val cur = rgb(y * stride + i) & 0xff
          val left = if (i >= 3) rgb(y * stride + i - 3) & 0xff else 0
          val up = if (y > 0) rgb((y - 1) * stride + i) & 0xff else 0
          val ul = if (y > 0 && i >= 3) rgb((y - 1) * stride + i - 3) & 0xff
            else 0
          val f = ft match {
            case 0 => cur
            case 1 => cur - left
            case 2 => cur - up
            case 3 => cur - (left + up) / 2
            case 4 => cur - paeth(left, up, ul)
          }
          raw((stride + 1) * y + 1 + i) = (f & 0xff).toByte
          i += 1
        }
        y += 1
      }
      val deflater = deflaters.get()
      deflater.reset()
      deflater.setInput(raw); deflater.finish()
      val zout = new ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!deflater.finished())
        zout.write(tmp, 0, deflater.deflate(tmp))
      val ihdr = {
        val b = ByteBuffer.allocate(13)
        b.putInt(width).putInt(height)
        b.put(8.toByte)  // bit depth
        b.put(2.toByte)  // color type: truecolor
        b.put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
        b.array()
      }
      val out = new ByteArrayOutputStream()
      out.write(Signature)
      out.write(chunk("IHDR", ihdr))
      out.write(chunk("IDAT", zout.toByteArray))
      out.write(chunk("IEND", Array.emptyByteArray))
      out.toByteArray
    }

    def decode(bytes: Array[Byte]): Image = {
      require(bytes.length >= 8 &&
        Signature.indices.forall(i => bytes(i) == Signature(i)),
        "not a PNG payload (bad signature)")
      var off = 8
      var width = -1; var height = -1
      val idat = new ByteArrayOutputStream()
      var seenEnd = false
      while (!seenEnd) {
        require(off + 12 <= bytes.length, "truncated PNG chunk header")
        val len = ByteBuffer.wrap(bytes, off, 4).getInt
        require(len >= 0 && off + 12 + len <= bytes.length,
          s"PNG chunk overruns payload (len=$len)")
        val id = new String(bytes, off + 4, 4, "US-ASCII")
        val payload = java.util.Arrays.copyOfRange(bytes, off + 8,
          off + 8 + len)
        val stored = ByteBuffer.wrap(bytes, off + 8 + len, 4).getInt
        val actual = crc(id.getBytes("US-ASCII"), payload)
        require(stored == actual,
          f"PNG chunk '$id' CRC mismatch: stored $stored%08x, computed $actual%08x")
        id match {
          case "IHDR" =>
            val b = ByteBuffer.wrap(payload)
            width = b.getInt; height = b.getInt
            val depth = b.get(); val color = b.get()
            require(depth == 8 && color == 2,
              s"unsupported PNG layout: depth $depth color $color (8-bit truecolor only)")
            require(payload(12) == 0, "interlaced PNG not supported")
          case "IDAT" => idat.write(payload)
          case "IEND" => seenEnd = true
          case _ => // ancillary chunk — skip
        }
        off += 12 + len
      }
      require(width > 0 && height > 0, "PNG payload has no IHDR")
      val stride = 3 * width
      val inflater = inflaters.get()
      inflater.reset()
      inflater.setInput(idat.toByteArray)
      val raw = new Array[Byte]((stride + 1) * height)
      var got = 0
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        // A zero-byte inflate that has not finished is corruption in
        // every shape (needsInput = truncated stream, needsDictionary =
        // FDICT set) — throwing covers both and cannot hang the loop.
        if (n == 0 && !inflater.finished())
          throw new IllegalArgumentException("truncated PNG IDAT stream")
        got += n
      }
      require(got == raw.length,
        s"PNG IDAT inflated to $got bytes, expected ${raw.length}")
      val rgb = new Array[Byte](stride * height)
      var y = 0
      while (y < height) {
        val ft = raw((stride + 1) * y) & 0xff
        var i = 0
        while (i < stride) {
          val f = raw((stride + 1) * y + 1 + i) & 0xff
          val left = if (i >= 3) rgb(y * stride + i - 3) & 0xff else 0
          val up = if (y > 0) rgb((y - 1) * stride + i) & 0xff else 0
          val ul = if (y > 0 && i >= 3) rgb((y - 1) * stride + i - 3) & 0xff
            else 0
          val v = ft match {
            case 0 => f
            case 1 => f + left
            case 2 => f + up
            case 3 => f + (left + up) / 2
            case 4 => f + paeth(left, up, ul)
            case t => sys.error(s"invalid PNG filter type $t at row $y")
          }
          rgb(y * stride + i) = (v & 0xff).toByte
          i += 1
        }
        y += 1
      }
      Image(width, height, rgb)
    }
  }

  // ------------------------------------------------------------------ AVI

  /** Minimal-but-spec-shaped RIFF/AVI codec for uncompressed DIB video:
    * `hdrl` (avih MainAVIHeader + one `strl` with strh/strf) followed by
    * `movi` with one `00db` chunk per frame. Decode cross-checks the
    * header's dwTotalFrames against the actual movi chunk count. */
  object Avi {
    final case class Video(width: Int, height: Int,
        frames: Array[Array[Byte]])

    def encode(width: Int, height: Int,
        frames: Array[Array[Byte]]): Array[Byte] = {
      val frameBytes = 3 * width * height
      require(frames.forall(_.length == frameBytes),
        s"every frame must be $frameBytes raw RGB24 bytes")
      val avih = {
        val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
        b.putInt(66667)            // dwMicroSecPerFrame (~15 fps)
        b.putInt(frameBytes * 15)  // dwMaxBytesPerSec
        b.putInt(0)                // dwPaddingGranularity
        b.putInt(0)                // dwFlags
        b.putInt(frames.length)    // dwTotalFrames
        b.putInt(0)                // dwInitialFrames
        b.putInt(1)                // dwStreams
        b.putInt(frameBytes)       // dwSuggestedBufferSize
        b.putInt(width)
        b.putInt(height)
        b.array()                  // 4 reserved ints stay zero
      }
      val strh = {
        val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
        b.put("vids".getBytes("US-ASCII"))
        b.put("DIB ".getBytes("US-ASCII"))
        b.putInt(0).putShort(0).putShort(0) // flags, priority, language
        b.putInt(0)                // dwInitialFrames
        b.putInt(1)                // dwScale
        b.putInt(15)               // dwRate
        b.putInt(0)                // dwStart
        b.putInt(frames.length)    // dwLength
        b.putInt(frameBytes)       // dwSuggestedBufferSize
        b.putInt(-1)               // dwQuality
        b.putInt(0)                // dwSampleSize
        b.putShort(0).putShort(0)  // rcFrame left/top
        b.putShort(width.toShort).putShort(height.toShort)
        b.array()
      }
      val strf = {
        val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
        b.putInt(40)               // biSize
        b.putInt(width).putInt(height)
        b.putShort(1.toShort)      // biPlanes
        b.putShort(24.toShort)     // biBitCount
        b.putInt(0)                // biCompression = BI_RGB
        b.putInt(frameBytes)       // biSizeImage
        b.array()
      }
      val hdrl = Riff.list("hdrl", Riff.chunk("avih", avih),
        Riff.list("strl", Riff.chunk("strh", strh),
          Riff.chunk("strf", strf)))
      val movi = Riff.list("movi",
        frames.map(f => Riff.chunk("00db", f)): _*)
      Riff.riff("AVI ", hdrl, movi)
    }

    def decode(bytes: Array[Byte]): Video = {
      val (form, body) = Riff.open(bytes)
      require(form == "AVI ", s"RIFF form is '$form', not AVI")
      var header: Option[(Int, Int, Int)] = None // (totalFrames, w, h)
      val frames = Array.newBuilder[Array[Byte]]
      Riff.children(body).foreach {
        case Riff.Chunk("LIST", Some("hdrl"), p) =>
          Riff.children(p).foreach {
            case Riff.Chunk("avih", _, a) =>
              val b = ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN)
              val total = b.getInt(16)
              header = Some((total, b.getInt(32), b.getInt(36)))
            case _ => // strl — stream detail not needed for raw DIB
          }
        case Riff.Chunk("LIST", Some("movi"), p) =>
          Riff.children(p).foreach {
            case Riff.Chunk(id, _, f)
                if id.endsWith("db") || id.endsWith("dc") =>
              frames += f
            case _ =>
          }
        case _ =>
      }
      val (total, w, h) = header.getOrElse(
        sys.error("AVI payload has no avih header"))
      val fs = frames.result()
      require(fs.length == total,
        s"AVI header declares $total frames but movi holds ${fs.length}")
      Video(w, h, fs)
    }
  }

  // ------------------------------------------------------------ synthesis

  /** Deterministic media synthesis from a row id — the sandbox stand-in
    * for reading real payload bytes off storage. Every formula here is
    * mirrored in the DuckDB oracle SQL (PipelineQueries), which recomputes
    * the features directly from the formulas: parity holds only if
    * encode∘decode is the identity AND the feature math is right. */
  object MediaSynth {
    /** 16-bit PCM sample `i` of clip `id` (an LCG-shaped integer signal). */
    def audioSample(id: Long, i: Long): Int =
      (((id * 1103515245L + i * 12345L) % 65536L) - 32768L).toInt

    def audioLength(id: Long): Int = (1000L + id % 1000L).toInt

    def wavPayload(id: Long): Array[Byte] = {
      val n = audioLength(id)
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) { samples(i) = audioSample(id, i).toShort; i += 1 }
      Wav.encode(8000, samples)
    }

    def imageWidth(id: Long): Int = (8L + id % 9L).toInt
    def imageHeight(id: Long): Int = (8L + (id / 9L) % 9L).toInt

    /** Channel `c` (0=R,1=G,2=B) of pixel (x, y) of image `id`. */
    def pixel(id: Long, x: Int, y: Int, c: Int): Int =
      ((id * 31L + x * 7L + y * 13L + c * 101L) % 256L).toInt

    def pngPayload(id: Long): Array[Byte] = {
      val w = imageWidth(id); val h = imageHeight(id)
      val rgb = new Array[Byte](3 * w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < 3) {
            rgb((y * w + x) * 3 + c) = pixel(id, x, y, c).toByte
            c += 1
          }
          x += 1
        }
        y += 1
      }
      Png.encode(w, h, rgb)
    }

    def videoFrames(id: Long): Int = (4L + id % 28L).toInt
    val VideoW = 4
    val VideoH = 4

    /** Byte `j` of frame `f` of video `id`. */
    def frameByte(id: Long, f: Int, j: Int): Int =
      ((id * 17L + f * 29L + j * 5L) % 256L).toInt

    def aviPayload(id: Long): Array[Byte] = {
      val n = videoFrames(id)
      val frameBytes = 3 * VideoW * VideoH
      val frames = Array.tabulate(n) { f =>
        val b = new Array[Byte](frameBytes)
        var j = 0
        while (j < frameBytes) { b(j) = frameByte(id, f, j).toByte; j += 1 }
        b
      }
      Avi.encode(VideoW, VideoH, frames)
    }
  }

  // --------------------------------------------------- generic feature API

  case class MediaRecord(id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(id: Long, kind: String, nBytes: Long,
      width: Int, height: Int, frames: Int, byteSum: Long)

  /** Batched per-partition decode + feature extraction (mapInPandas
    * analog). The container is sniffed from the payload magic, not the
    * `kind` hint: PNG signature → [[Png]], RIFF/WAVE → [[Wav]] (frames =
    * sample count), RIFF/AVI → [[Avi]]; anything else degrades to opaque
    * byte stats so foreign blobs survive the pipeline instead of killing
    * the job. */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val p = r.payload
        def sum(b: Array[Byte]): Long = {
          var s = 0L; var i = 0
          while (i < b.length) { s += (b(i) & 0xff); i += 1 }
          s
        }
        val isPng = p.length >= 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P'
        val isRiff = p.length >= 12 && p(0) == 'R' && p(1) == 'I' &&
          p(2) == 'F' && p(3) == 'F'
        val form = if (isRiff) new String(p, 8, 4, "US-ASCII") else ""
        if (isPng) {
          val img = Png.decode(p)
          MediaFeatures(r.id, r.kind, p.length.toLong, img.width,
            img.height, 1, sum(img.rgb))
        } else if (form == "WAVE") {
          val clip = Wav.decode(p)
          var s = 0L
          clip.samples.foreach(v => s += v.toLong)
          MediaFeatures(r.id, r.kind, p.length.toLong, clip.sampleRate, 1,
            clip.samples.length, s)
        } else if (form == "AVI ") {
          val vid = Avi.decode(p)
          MediaFeatures(r.id, r.kind, p.length.toLong, vid.width,
            vid.height, vid.frames.length, vid.frames.map(sum).sum)
        } else {
          MediaFeatures(r.id, r.kind, p.length.toLong, 0, 0, 0, sum(p))
        }
      }
    }
  }

  // ------------------------------------------- checked stored-blob decode
  //
  // Stored-payload feature extractors with a per-row corrupt-blob policy
  // mirroring NetCDFIngest.convertChecked: a payload that fails decode
  // (truncated IDAT, bad CRC, header/movi mismatch, non-PCM tag, ...)
  // yields a QUARANTINE row (`error` non-null, features null) instead of
  // failing the job — at ~1M stored blobs one corrupt delivery must cost
  // one row, not the pipeline. Plan-native (the error is a column, split
  // with one filter), so there is no accumulator double-count on task
  // retry and the split stays inside the single decode pass.

  private def errStr(e: Throwable): String = {
    val m = e.getMessage
    s"${e.getClass.getSimpleName}: ${if (m == null) "" else m}"
  }

  private type Checked =
    (Long, Option[Long], Option[Long], Option[Long], Option[Long],
      Option[Long], Option[String])

  /** PNG features over a stored `(event_id, png)` frame: dimensions +
    * exact per-channel pixel sums, `error` per quarantined row. */
  def imageFeaturesChecked(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("event_id").cast(LongType), col("png"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, p) =>
          try {
            val img = Png.decode(p)
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < img.rgb.length) {
              sr += img.rgb(i) & 0xff
              sg += img.rgb(i + 1) & 0xff
              sb += img.rgb(i + 2) & 0xff
              i += 3
            }
            (id, Some(img.width.toLong), Some(img.height.toLong), Some(sr),
              Some(sg), Some(sb), None): Checked
          } catch { case scala.util.control.NonFatal(e) =>
            (id, None, None, None, None, None, Some(errStr(e))): Checked
          }
        }
      }
      .toDF("event_id", "width", "height", "sum_r", "sum_g", "sum_b",
        "error")
  }

  /** Perceptual average-hash over a stored `(event_id, png)` frame: the
    * decoded image nearest-neighbor-samples onto a fixed 8×8 luminance
    * grid and each cell contributes one bit of a 64-bit fingerprint —
    * set iff the cell is brighter than the grid mean. The comparison is
    * integer-exact (64·lum > Σlum — no division, no floats), and the
    * fingerprint is the SIGNED two's-complement value of the bit vector
    * so an oracle can reproduce it as a plain sum of powers of two
    * (−2⁶³·b₆₃ + Σ2ⁱ·bᵢ — decimal arithmetic equals the JVM bit-or).
    * Same quarantine contract as the other checked decoders. */
  def imagePHashChecked(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("event_id").cast(LongType), col("png"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, p) =>
          try {
            val img = Png.decode(p)
            val w = img.width; val h = img.height
            val lums = new Array[Long](64)
            var total = 0L
            var gy = 0
            while (gy < 8) {
              var gx = 0
              while (gx < 8) {
                val x = gx * w / 8; val y = gy * h / 8
                val o = (y * w + x) * 3
                val lum = (img.rgb(o) & 0xff).toLong +
                  (img.rgb(o + 1) & 0xff) + (img.rgb(o + 2) & 0xff)
                lums(gy * 8 + gx) = lum; total += lum
                gx += 1
              }
              gy += 1
            }
            var hsh = 0L
            var i = 0
            while (i < 64) {
              if (64L * lums(i) > total) hsh |= (1L << i)
              i += 1
            }
            (id, Some(hsh), None): (Long, Option[Long], Option[String])
          } catch { case scala.util.control.NonFatal(e) =>
            (id, None, Some(errStr(e))): (Long, Option[Long], Option[String])
          }
        }
      }
      .toDF("event_id", "phash", "error")
  }

  /** AVI features over a stored `(event_id, avi)` frame: every-3rd-frame
    * sampling folded into a deterministic signature. */
  def videoFeaturesChecked(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("event_id").cast(LongType), col("avi"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, p) =>
          try {
            val vid = Avi.decode(p)
            val n = vid.frames.length
            var sig = 0L; var nS = 0L; var f = 0
            while (f < n) {
              val fr = vid.frames(f)
              var fs = 0L; var j = 0
              while (j < fr.length) { fs += fr(j) & 0xff; j += 1 }
              sig = (sig * 31L + fs) % 1000000007L
              nS += 1; f += 3
            }
            (id, Some(n.toLong), Some(vid.width.toLong),
              Some(vid.height.toLong), Some(nS), Some(sig), None): Checked
          } catch { case scala.util.control.NonFatal(e) =>
            (id, None, None, None, None, None, Some(errStr(e))): Checked
          }
        }
      }
      .toDF("event_id", "n_frames", "width", "height", "n_sampled",
        "frame_sig", "error")
  }

  /** Frame-to-frame motion estimation over a stored `(event_id, avi)`
    * frame — the scene-change / motion-activity signal a video curation
    * pipeline gates on (static clips carry less training signal than
    * active ones). Decodes the stored AVI and sums the absolute byte
    * delta between each consecutive frame pair: `total_motion` over the
    * clip, `max_pair_motion` (the sharpest cut), and an order-sensitive
    * per-pair fold `motion_sig`. Pure integers — the oracle recomputes
    * from the synthesis formula, proving store∘decode identity. Same
    * quarantine contract and map-only scale shape as the other checked
    * decoders. */
  def videoMotionChecked(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("event_id").cast(LongType), col("avi"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, p) =>
          try {
            val vid = Avi.decode(p)
            val n = vid.frames.length
            var sig = 0L; var total = 0L; var maxP = 0L; var f = 0
            while (f + 1 < n) {
              val a = vid.frames(f); val b = vid.frames(f + 1)
              var pm = 0L; var j = 0
              while (j < a.length) {
                pm += math.abs((a(j) & 0xff) - (b(j) & 0xff)); j += 1
              }
              total += pm
              if (pm > maxP) maxP = pm
              sig = (sig * 31L + pm % 1000000007L) % 1000000007L
              f += 1
            }
            (id, Some(n.toLong), Some(n.toLong - 1L), Some(total),
              Some(maxP), Some(sig), None): Checked
          } catch { case scala.util.control.NonFatal(e) =>
            (id, None, None, None, None, None, Some(errStr(e))): Checked
          }
        }
      }
      .toDF("event_id", "n_frames", "n_pairs", "total_motion",
        "max_pair_motion", "motion_sig", "error")
  }

  /** WAV features over a stored `(event_id, wav)` frame: total energy +
    * a fold of 400-sample/200-hop window energies. */
  def audioFeaturesChecked(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("event_id").cast(LongType), col("wav"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, p) =>
          try {
            val clip = Wav.decode(p)
            val n = clip.samples.length
            val win = 400; val hop = 200
            var total = 0L; var i = 0
            while (i < n) {
              val v = clip.samples(i).toLong; total += v * v; i += 1
            }
            var sig = 0L; var nW = 0L; var st = 0
            while (st + win <= n) {
              var ws = 0L; var j = st
              while (j < st + win) {
                val v = clip.samples(j).toLong; ws += v * v; j += 1
              }
              sig = (sig * 31L + ws % 1000000007L) % 1000000007L
              nW += 1; st += hop
            }
            (id, Some(n.toLong), Some(clip.sampleRate.toLong), Some(nW),
              Some(total), Some(sig), None): Checked
          } catch { case scala.util.control.NonFatal(e) =>
            (id, None, None, None, None, None, Some(errStr(e))): Checked
          }
        }
      }
      .toDF("event_id", "n_samples", "sample_rate", "n_windows", "energy",
        "window_sig", "error")
  }

  /** Per-window silence profile over a stored `(event_id, wav)` frame —
    * the VAD-style gate audio curation runs before transcription: the
    * same 400/200 framing as [[audioFeaturesChecked]], each window's
    * RAW energy Σs² (no modulus — these are the decision values, not a
    * fold signature), a QUIET verdict when the window's energy density
    * falls below the clip's own average (`ws · n_samples <
    * total_energy · win` — integer cross-multiplication compared in
    * 128 bits via Math.multiplyHigh, so the verdict is exact for ANY
    * clip length: a full-scale clip past ~2e7 samples pushes
    * `total · win` beyond 2⁶³ and a 64-bit compare would silently flip
    * verdicts), and the min/max window energies for threshold tuning.
    * Map-only decode, one row per clip. */
  /** Compare `a·b` vs `c·d` exactly in 128 bits (all operands
    * non-negative): high words via Math.multiplyHigh, low words
    * unsigned. Overflow-free for the silence verdict's worst case
    * (window energy · clip length on arbitrarily long stored WAVs). */
  private[graft] def cmpProd(a: Long, b: Long, c: Long, d: Long): Int = {
    val hi1 = Math.multiplyHigh(a, b); val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) java.lang.Long.compare(hi1, hi2)
    else java.lang.Long.compareUnsigned(a * b, c * d)
  }

  def audioSilenceChecked(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("event_id").cast(LongType), col("wav"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, p) =>
          try {
            val clip = Wav.decode(p)
            val ss = clip.samples
            val n = ss.length
            val win = 400; val hop = 200
            var total = 0L; var i = 0
            while (i < n) { val v = ss(i).toLong; total += v * v; i += 1 }
            var nW = 0L; var nQ = 0L
            var minW = Long.MaxValue; var maxW = Long.MinValue
            var st = 0
            while (st + win <= n) {
              var ws = 0L; var j = st
              while (j < st + win) {
                val v = ss(j).toLong; ws += v * v; j += 1
              }
              if (ws < minW) minW = ws
              if (ws > maxW) maxW = ws
              if (cmpProd(ws, n.toLong, total, win.toLong) < 0) nQ += 1L
              nW += 1; st += hop
            }
            (id, Some(nW), Some(nQ),
              if (nW > 0) Some(minW) else None,
              if (nW > 0) Some(maxW) else None,
              Some(total), None): Checked
          } catch { case scala.util.control.NonFatal(e) =>
            (id, None, None, None, None, None, Some(errStr(e))): Checked
          }
        }
      }
      .toDF("event_id", "n_windows", "n_quiet", "min_wnd_energy",
        "max_wnd_energy", "energy", "error")
  }

  /** Zero-crossing-rate analysis over a stored `(event_id, wav)` frame —
    * the signal-activity feature behind voice-activity detection and
    * audio-quality gates (noisy/high-frequency clips cross often, tonal
    * or silent-with-DC-offset clips rarely). Decodes the stored WAV
    * (RIFF walk, PCM), then counts sign changes over consecutive sample
    * pairs — a crossing is `(s[i] < 0) != (s[i+1] < 0)`, pure integer —
    * both clip-wide (`total_zc`) and per 400-sample window hopping 200
    * (`max_window_zc` + an order-sensitive window fold `zc_sig`, the
    * same 31-base mod-P fold as the energy signature). All outputs are
    * exact integers, so the oracle reproduces them from the synthesis
    * formula without ever seeing the bytes — a hash match proves
    * store∘decode identity AND the crossing arithmetic.
    *
    * Same quarantine contract and scale shape as the other checked
    * decoders: map-only mapPartitions decode, no shuffle. */
  def audioZcrChecked(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("event_id").cast(LongType), col("wav"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, p) =>
          try {
            val clip = Wav.decode(p)
            val ss = clip.samples
            val n = ss.length
            val win = 400; val hop = 200
            var total = 0L; var i = 0
            while (i + 1 < n) {
              if ((ss(i) < 0) != (ss(i + 1) < 0)) total += 1L
              i += 1
            }
            var sig = 0L; var nW = 0L; var maxW = 0L; var st = 0
            while (st + win <= n) {
              var wz = 0L; var j = st
              while (j + 1 < st + win) {
                if ((ss(j) < 0) != (ss(j + 1) < 0)) wz += 1L
                j += 1
              }
              if (wz > maxW) maxW = wz
              sig = (sig * 31L + wz) % 1000000007L
              nW += 1; st += hop
            }
            (id, Some(n.toLong), Some(nW), Some(total), Some(maxW),
              Some(sig), None): Checked
          } catch { case scala.util.control.NonFatal(e) =>
            (id, None, None, None, None, None, Some(errStr(e))): Checked
          }
        }
      }
      .toDF("event_id", "n_samples", "n_windows", "total_zc",
        "max_window_zc", "zc_sig", "error")
  }

  /** Energy-delta audio fingerprint over a stored `(event_id, wav)`
    * frame — the Chromaprint/Shazam-family idea reduced to its integer
    * core: per 400-sample window (hop 200) the exact energy Σs², and
    * one fingerprint bit per window pair saying whether energy ROSE —
    * the level-invariant shape signature that survives gain changes,
    * packed little-endian into one long (windows past 64 ignored, a
    * documented cap — synthesized clips have ≤ 9). Exact integers
    * end-to-end (s² ≤ 2³⁰, ×400 per window, deltas compared not
    * subtracted), so the oracle recomputes the fingerprint from the
    * synthesis formula without seeing a byte — a match proves
    * store∘decode identity AND the windowing. Same quarantine contract
    * and map-only scale shape as the other checked decoders. */
  def audioFingerprintChecked(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("event_id").cast(LongType), col("wav"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, p) =>
          try {
            val ss = Wav.decode(p).samples
            val n = ss.length
            val win = 400; val hop = 200
            val nW = if (n < win) 0 else (n - win) / hop + 1
            val energies = new Array[Long](nW)
            var w = 0
            while (w < nW) {
              var e = 0L; var j = w * hop
              val end = j + win
              while (j < end) { e += ss(j).toLong * ss(j).toLong; j += 1 }
              energies(w) = e
              w += 1
            }
            var fp = 0L; var k = 1
            while (k < nW && k <= 64) {
              if (energies(k) > energies(k - 1)) fp |= 1L << (k - 1)
              k += 1
            }
            (id, Some(nW.toLong), Some(fp), None)
              : (Long, Option[Long], Option[Long], Option[String])
          } catch { case scala.util.control.NonFatal(e) =>
            (id, None, None, Some(errStr(e)))
              : (Long, Option[Long], Option[Long], Option[String])
          }
        }
      }
      .toDF("event_id", "n_windows", "afp", "error")
  }

  /** Wrap an arbitrary table into media records (payload = a string column
    * cast to binary), preserving partitioning. */
  def asMediaRecords(df: DataFrame, idCol: String, payloadCol: String,
      kind: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast(LongType).as("id"),
      lit(kind).as("kind"),
      col(payloadCol).cast(BinaryType).as("payload"))
      .as[MediaRecord]
  }
}
