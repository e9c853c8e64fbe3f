package graft.sources

/** HDF5 szip filter (H5Z_FILTER_SZIP, id 4) codec — a pure-JVM
  * implementation of the CCSDS 121.0-B extended-Rice entropy coder in
  * the framing szlib/libaec give it, built from the PUBLIC documents
  * (CCSDS 121.0-B-2 blue book; the szlib option flags and HDF5's
  * H5Zszip.c framing are public source):
  *
  *   - HDF5 layer: the stored chunk is `LE u32 uncompressed-byte-count`
  *     followed by the szip stream (H5Zszip.c); with the RAW option the
  *     payload after the count is the uncompressed bytes.
  *   - Stream layer: samples are processed per SCANLINE
  *     (`pixels_per_scanline`), each scanline independently split into
  *     blocks of `pixels_per_block` (J) samples, the last block of a
  *     scanline zero-padded in the mapped domain. With the NN option the
  *     first sample of every scanline is a REFERENCE sample transmitted
  *     raw (n bits) inside the first block (which then codes J−1
  *     mapped deltas); remaining samples are unit-delay prediction
  *     residuals mapped to non-negative integers by the standard
  *     CCSDS interleave. Without NN (EC mode) sample values are coded
  *     directly.
  *   - Block options (ID width f = 3/4/5 bits for n ≤ 8/16/32):
  *     ID 0 + '0' → zero-block run (FS-coded run length; 1..4 direct,
  *     5 = rest-of-64-block-segment, q+1 > 5 → q blocks);
  *     ID 0 + '1' → second extension (pair transform
  *     γ = (a+b)(a+b+1)/2 + b, FS-coded);
  *     ID i ∈ [1, 2^f−2] → sample splitting with k = i−1 (all FS
  *     quotients first, then the k split LSBs per sample — k = 0 is the
  *     fundamental sequence); ID 2^f−1 → uncompressed (n bits each).
  *   - Bit order is MSB-first; n-bit fields inside the stream are
  *     big-endian regardless of the buffer byte-order option. The
  *     LSB/MSB option flags govern only how multi-byte samples sit in
  *     the UNCOMPRESSED buffer.
  *
  * Supported parameter space: n ∈ {8, 16, 24, 32} bits per pixel (the
  * widths HDF5's szip can produce for integer/float data), NN or EC,
  * LSB or MSB buffers, any even J ≥ 2. Streams outside this space (odd
  * precisions, second-extension on a reference block — a corner real
  * encoders avoid) throw [[SzipUnsupported]] with the re-encode
  * workaround, preserving the previous loud-failure contract instead of
  * risking a silent wrong decode.
  *
  * Validation: encoder and decoder are independent implementations of
  * the spec text, pinned by golden bit-vectors hand-assembled from the
  * spec in SzipSpec (guarding against symmetric misreadings) plus
  * randomized round-trips over every block mode; no szip-capable tool
  * exists in this sandbox to cross-generate fixtures.
  */
object Szip {

  /** szlib option-mask flags (public szlib.h). */
  val AllowK13 = 1
  val Chip = 2
  val EC = 4
  val LSB = 8
  val MSB = 16
  val NN = 32
  val Raw = 128

  final case class Params(optionMask: Int, bitsPerPixel: Int,
      pixelsPerBlock: Int, pixelsPerScanline: Int) {
    def preprocess: Boolean = (optionMask & NN) != 0
    def littleEndian: Boolean = (optionMask & LSB) != 0
    def raw: Boolean = (optionMask & Raw) != 0
    def bytesPerSample: Int = (bitsPerPixel + 7) / 8
  }

  final class SzipUnsupported(msg: String) extends IllegalStateException(msg)

  private def unsupported(what: String): Nothing =
    throw new SzipUnsupported(
      s"szip stream uses $what, which graft's CCSDS-121 decoder does " +
        "not cover — re-encode the granule with deflate (`h5repack -f " +
        "SHUF,GZIP=4 in.nc out.nc` or `nccopy -d4 in.nc out.nc`)")

  private def checkParams(p: Params): Unit = {
    if (!Seq(8, 16, 24, 32).contains(p.bitsPerPixel))
      unsupported(s"${p.bitsPerPixel}-bit samples (8/16/24/32 supported)")
    if (p.pixelsPerBlock < 2 || p.pixelsPerBlock % 2 != 0)
      unsupported(s"pixels_per_block ${p.pixelsPerBlock}")
    if (p.pixelsPerScanline < 1)
      unsupported(s"pixels_per_scanline ${p.pixelsPerScanline}")
  }

  private def idLen(n: Int): Int = if (n <= 8) 3 else if (n <= 16) 4 else 5

  // ------------------------------------------------------------ bit I/O

  private final class BitReader(buf: Array[Byte], start: Int) {
    private var pos = start
    private var bit = 0
    def readBit(): Int = {
      if (pos >= buf.length)
        throw new IllegalStateException("szip stream truncated")
      val b = (buf(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      b
    }
    def readBits(nb: Int): Long = {
      var v = 0L; var i = 0
      while (i < nb) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** FS/unary: q zeros then a one → q. */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) {
        q += 1
        if (q > (1 << 26))
          throw new IllegalStateException("szip unary run overflows")
      }
      q
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nBits += 1
      if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
    }
    def writeBits(v: Long, nb: Int): Unit = {
      var i = nb - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBit(0); i += 1 }
      writeBit(1)
    }
    def result(): Array[Byte] = {
      if (nBits > 0) { out.write(cur << (8 - nBits)); cur = 0; nBits = 0 }
      out.toByteArray
    }
  }

  // ------------------------------------------------------ sample buffers

  private def readSamples(data: Array[Byte], p: Params): Array[Long] = {
    val bs = p.bytesPerSample
    require(data.length % bs == 0,
      s"szip buffer ${data.length} B not aligned to $bs-byte samples")
    val n = data.length / bs
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var v = 0L
      var j = 0
      while (j < bs) {
        val byte = data(i * bs + j).toLong & 0xffL
        v |= (if (p.littleEndian) byte << (8 * j)
              else byte << (8 * (bs - 1 - j)))
        j += 1
      }
      out(i) = v
      i += 1
    }
    out
  }

  private def writeSamples(vals: Array[Long], p: Params): Array[Byte] = {
    val bs = p.bytesPerSample
    val out = new Array[Byte](vals.length * bs)
    var i = 0
    while (i < vals.length) {
      var j = 0
      while (j < bs) {
        val sh = if (p.littleEndian) 8 * j else 8 * (bs - 1 - j)
        out(i * bs + j) = ((vals(i) >>> sh) & 0xffL).toByte
        j += 1
      }
      i += 1
    }
    out
  }

  // ----------------------------------------------------- CCSDS mapping

  /** Unit-delay prediction residual → non-negative (CCSDS 121 §4). */
  private def mapDelta(value: Long, prev: Long, maxVal: Long): Long = {
    val d = value - prev
    val theta = math.min(prev, maxVal - prev)
    if (d >= 0 && d <= theta) 2 * d
    else if (d < 0 && -d <= theta) -2 * d - 1
    else theta + math.abs(d)
  }

  private def unmapDelta(m: Long, prev: Long, maxVal: Long): Long = {
    val theta = math.min(prev, maxVal - prev)
    val d =
      if (m <= 2 * theta) { if ((m & 1L) == 0L) m / 2 else -(m + 1) / 2 }
      else if (theta == prev) m - theta // negative side exhausted
      else theta - m                    // positive side exhausted
    prev + d
  }

  // ------------------------------------------------------------ decode

  /** Decode an HDF5 szip chunk (LE u32 size prefix + stream) back to
    * the uncompressed bytes. */
  def decode(chunk: Array[Byte], p: Params): Array[Byte] = {
    checkParams(p)
    require(chunk.length >= 4, "szip chunk shorter than its size prefix")
    val origSize = (chunk(0) & 0xffL) | ((chunk(1) & 0xffL) << 8) |
      ((chunk(2) & 0xffL) << 16) | ((chunk(3) & 0xffL) << 24)
    require(origSize <= Int.MaxValue, s"szip chunk declares $origSize B")
    if (p.raw) {
      require(chunk.length >= 4 + origSize.toInt, "szip raw chunk truncated")
      return java.util.Arrays.copyOfRange(chunk, 4, 4 + origSize.toInt)
    }
    val nSamples = origSize.toInt / p.bytesPerSample
    require(origSize.toInt % p.bytesPerSample == 0,
      s"szip chunk size $origSize not aligned to ${p.bytesPerSample}-byte samples")
    writeSamples(decodeStream(chunk, 4, nSamples, p), p)
  }

  private[sources] def decodeStream(buf: Array[Byte], off: Int,
      nSamples: Int, p: Params): Array[Long] = {
    val n = p.bitsPerPixel
    val f = idLen(n)
    val maxId = (1 << f) - 1
    val J = p.pixelsPerBlock
    val maxVal = (1L << n) - 1
    val r = new BitReader(buf, off)
    val out = new Array[Long](nSamples)
    var produced = 0
    while (produced < nSamples) {
      // one scanline
      val sls = math.min(p.pixelsPerScanline, nSamples - produced)
      val blocks = (sls + J - 1) / J
      // mapped-domain scanline buffer, padded to whole blocks
      val mapped = new Array[Long](blocks * J)
      var refVal = 0L
      var b = 0
      var pendingZero = 0 // zero blocks still owed from a run
      while (b < blocks) {
        val isRef = p.preprocess && b == 0
        val codedStart = b * J + (if (isRef) 1 else 0)
        val codedCount = J - (if (isRef) 1 else 0)
        if (pendingZero > 0) {
          pendingZero -= 1 // mapped already zero-initialized
        } else {
          val id = r.readBits(f).toInt
          if (id == 0) {
            val second = r.readBit() == 1
            if (second) {
              // second extension: γ = (a+b)(a+b+1)/2 + b per pair
              if (isRef)
                unsupported("the second-extension option on a " +
                  "reference-sample block")
              var i = 0
              while (i < codedCount) {
                val gamma = r.readUnary().toLong
                var m = 0L
                while ((m + 1) * (m + 2) / 2 <= gamma) m += 1
                val bb = gamma - m * (m + 1) / 2
                val aa = m - bb
                mapped(codedStart + i) = aa
                mapped(codedStart + i + 1) = bb
                i += 2
              }
            } else {
              // zero-block run
              if (isRef) refVal = r.readBits(n)
              val q1 = r.readUnary() + 1
              val run =
                if (q1 < 5) q1
                // Rest of the 64-block segment — clamped to the blocks
                // remaining in the scanline: foreign encoders (libaec)
                // may emit ROS for a zero run truncated by the end of a
                // short final segment.
                else if (q1 == 5) math.min(64 - (b % 64), blocks - b)
                else q1 - 1
              require(b + run <= blocks,
                s"szip zero-block run $run overruns the scanline")
              pendingZero = run - 1 // this block is the first of the run
            }
          } else if (id == maxId) {
            if (isRef) refVal = r.readBits(n)
            var i = 0
            while (i < codedCount) {
              mapped(codedStart + i) = r.readBits(n); i += 1
            }
          } else {
            val k = id - 1
            if (isRef) refVal = r.readBits(n)
            // all FS quotients first, then the k split LSBs per sample
            val q = new Array[Long](codedCount)
            var i = 0
            while (i < codedCount) { q(i) = r.readUnary().toLong; i += 1 }
            i = 0
            while (i < codedCount) {
              mapped(codedStart + i) =
                if (k == 0) q(i) else (q(i) << k) | r.readBits(k)
              i += 1
            }
          }
        }
        b += 1
      }
      // unmap the scanline into actual sample values
      if (p.preprocess) {
        out(produced) = refVal
        var prev = refVal
        var i = 1
        while (i < sls) {
          prev = unmapDelta(mapped(i), prev, maxVal)
          out(produced + i) = prev
          i += 1
        }
      } else {
        var i = 0
        while (i < sls) { out(produced + i) = mapped(i); i += 1 }
      }
      produced += sls
    }
    out
  }

  // ------------------------------------------------------------ encode

  /** Encode uncompressed bytes into an HDF5 szip chunk (size prefix +
    * stream). Per block the cheapest of zero-run / second-extension /
    * k-split / uncompressed is chosen, so every decoder mode gets
    * exercised by real data shapes. */
  def encode(data: Array[Byte], p: Params): Array[Byte] = {
    checkParams(p)
    val head = Array[Byte](
      (data.length & 0xff).toByte, ((data.length >> 8) & 0xff).toByte,
      ((data.length >> 16) & 0xff).toByte,
      ((data.length >> 24) & 0xff).toByte)
    if (p.raw) return head ++ data
    val n = p.bitsPerPixel
    val f = idLen(n)
    val maxId = (1 << f) - 1
    val kMax = math.min(maxId - 2, n - 1)
    val J = p.pixelsPerBlock
    val maxVal = (1L << n) - 1
    val samples = readSamples(data, p)
    val w = new BitWriter()
    var done = 0
    while (done < samples.length) {
      val sls = math.min(p.pixelsPerScanline, samples.length - done)
      val blocks = (sls + J - 1) / J
      val mapped = new Array[Long](blocks * J) // zero-padded tail
      if (p.preprocess) {
        var prev = samples(done)
        var i = 1
        while (i < sls) {
          mapped(i) = mapDelta(samples(done + i), prev, maxVal)
          prev = samples(done + i)
          i += 1
        }
      } else {
        var i = 0
        while (i < sls) { mapped(i) = samples(done + i); i += 1 }
      }
      var b = 0
      while (b < blocks) {
        val isRef = p.preprocess && b == 0
        val codedStart = b * J + (if (isRef) 1 else 0)
        val codedCount = J - (if (isRef) 1 else 0)
        def allZero(bi: Int): Boolean = {
          val s = bi * J + (if (p.preprocess && bi == 0) 1 else 0)
          val c = J - (if (p.preprocess && bi == 0) 1 else 0)
          (0 until c).forall(i => mapped(s + i) == 0L)
        }
        if (allZero(b)) {
          // coalesce the zero run (capped so q+1 == 5 is never emitted;
          // the decoder still honors ROS for foreign streams)
          var run = 1
          while (b + run < blocks && allZero(b + run) && run < 63) run += 1
          w.writeBits(0, f); w.writeBit(0)
          if (isRef) w.writeBits(samples(done), n)
          w.writeUnary(if (run <= 4) run - 1 else run)
          b += run
        } else {
          // candidate costs
          def splitCost(k: Int): Long = {
            var c = 0L; var i = 0
            while (i < codedCount) {
              c += (mapped(codedStart + i) >>> k) + 1 + k; i += 1
            }
            c
          }
          var bestK = 0
          var bestCost = splitCost(0)
          var k = 1
          while (k <= kMax) {
            val c = splitCost(k)
            if (c < bestCost) { bestCost = c; bestK = k }
            k += 1
          }
          val seCost: Long =
            if (isRef) Long.MaxValue
            else {
              var c = 2L // ID 0 is shorter than a normal ID by f-1; account below
              var i = 0
              var ok = true
              while (i < codedCount && ok) {
                val s = mapped(codedStart + i) + mapped(codedStart + i + 1)
                if (s > 1000) ok = false // γ explodes quadratically
                else c += s * (s + 1) / 2 + mapped(codedStart + i + 1) + 1
                i += 2
              }
              if (ok) c else Long.MaxValue
            }
          val uncompCost = codedCount.toLong * n
          // ID field: f bits for split/uncomp, f+1 for the low-entropy pair
          if (seCost != Long.MaxValue &&
              seCost + (f + 1) < math.min(bestCost, uncompCost) + f) {
            w.writeBits(0, f); w.writeBit(1)
            var i = 0
            while (i < codedCount) {
              val aa = mapped(codedStart + i)
              val bb = mapped(codedStart + i + 1)
              val s = aa + bb
              w.writeUnary((s * (s + 1) / 2 + bb).toInt)
              i += 2
            }
          } else if (bestCost < uncompCost) {
            w.writeBits(bestK + 1L, f)
            if (isRef) w.writeBits(samples(done), n)
            var i = 0
            while (i < codedCount) {
              w.writeUnary((mapped(codedStart + i) >>> bestK).toInt); i += 1
            }
            if (bestK > 0) {
              i = 0
              while (i < codedCount) {
                w.writeBits(mapped(codedStart + i), bestK); i += 1
              }
            }
          } else {
            w.writeBits(maxId.toLong, f)
            if (isRef) w.writeBits(samples(done), n)
            var i = 0
            while (i < codedCount) {
              w.writeBits(mapped(codedStart + i), n); i += 1
            }
          }
          b += 1
        }
      }
      done += sls
    }
    head ++ w.result()
  }
}
