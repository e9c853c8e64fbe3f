package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Szip
import graft.sources.Szip.Params

/** Pins for the pure-JVM szip (CCSDS 121.0-B extended-Rice) codec.
  *
  * The encoder and decoder are independent implementations of the
  * public spec, so round-trips alone could hide a symmetric misreading;
  * the GOLDEN vectors below are bit streams hand-assembled from the
  * spec text (ID fields, FS/unary coding, split arrangement, reference
  * samples, zero-run and second-extension escapes, ROS) and pin the
  * decoder against the format itself. */
class SzipSpec extends AnyFunSuite {

  private def chunk(size: Int, stream: Int*): Array[Byte] =
    Array[Byte]((size & 0xff).toByte, ((size >> 8) & 0xff).toByte,
      ((size >> 16) & 0xff).toByte, ((size >> 24) & 0xff).toByte) ++
      stream.map(_.toByte)

  test("golden: k=1 split block, EC mode, 8-bit") {
    // samples [3,0,1,2,7,4,5,6]; ID 010 (k=1); FS quotients then LSBs
    val p = Params(Szip.EC | Szip.LSB, 8, 8, 8)
    val got = Szip.decode(chunk(8, 0x4e, 0x89, 0x23, 0x54), p)
    assert(got.toSeq === Seq[Byte](3, 0, 1, 2, 7, 4, 5, 6))
  }

  test("golden: FS block with reference sample, NN mode, 8-bit") {
    // samples [10,11,9,13]: ref 10 raw, deltas map to [2,3,8]
    // bits: ID 001, ref 00001010, FS 001 0001 000000001
    val p = Params(Szip.NN | Szip.LSB, 8, 4, 4)
    val got = Szip.decode(chunk(4, 0x21, 0x44, 0x40, 0x20), p)
    assert(got.toSeq === Seq[Byte](10, 11, 9, 13))
  }

  test("golden: zero-block run then FS block, EC mode") {
    // 16 samples, J=4: three zero blocks (run bits 000 0 001) then
    // [5,0,0,0] as FS
    val p = Params(Szip.EC | Szip.LSB, 8, 4, 16)
    val got = Szip.decode(chunk(16, 0x02, 0x41, 0xe0), p)
    assert(got.toSeq === (Seq.fill(12)(0.toByte) ++
      Seq[Byte](5, 0, 0, 0)))
  }

  test("golden: second-extension block, EC mode") {
    // [1,0,0,1]: pairs gamma = 1, 2; bits 000 1 01 001
    val p = Params(Szip.EC | Szip.LSB, 8, 4, 4)
    val got = Szip.decode(chunk(4, 0x14, 0x80), p)
    assert(got.toSeq === Seq[Byte](1, 0, 0, 1))
  }

  test("golden: uncompressed block, 16-bit, both buffer byte orders") {
    // [0x1234, 0xABCD]: ID 1111 then two raw 16-bit fields
    val stream = chunk(4, 0xf1, 0x23, 0x4a, 0xbc, 0xd0)
    val msb = Szip.decode(stream, Params(Szip.EC | Szip.MSB, 16, 2, 2))
    assert(msb.toSeq === Seq(0x12, 0x34, 0xab, 0xcd).map(_.toByte))
    val lsb = Szip.decode(stream, Params(Szip.EC | Szip.LSB, 16, 2, 2))
    assert(lsb.toSeq === Seq(0x34, 0x12, 0xcd, 0xab).map(_.toByte))
  }

  test("golden: rest-of-segment (ROS) zero run from a foreign encoder") {
    // 140 samples, J=2 -> 70 blocks: q+1 = 5 means zero to the end of
    // the 64-block segment, then an explicit 6-block run (q+1 = 7)
    val p = Params(Szip.EC | Szip.LSB, 8, 2, 140)
    val got = Szip.decode(chunk(140, 0x00, 0x80, 0x10), p)
    assert(got.length === 140 && got.forall(_ == 0))
  }

  test("golden: ROS zero run clamped by a short final scanline") {
    // 20 samples, J=2 -> a 10-block scanline: libaec may emit ROS
    // (q+1 = 5, "rest of 64-block segment") even when the scanline ends
    // first; the run must clamp to the 10 remaining blocks, not fail.
    // bits: ID 000, ext-bit 0, unary 00001 (q+1 = 5)
    val p = Params(Szip.EC | Szip.LSB, 8, 2, 20)
    val got = Szip.decode(chunk(20, 0x00, 0x80), p)
    assert(got.length === 20 && got.forall(_ == 0))
  }

  test("raw chunk shorter than its declared size fails loudly") {
    val p = Params(Szip.Raw | Szip.NN | Szip.LSB, 8, 8, 16)
    // declares 10 payload bytes, carries 5
    val bad = chunk(10, 1, 2, 3, 4, 5)
    val e = intercept[IllegalArgumentException](Szip.decode(bad, p))
    assert(e.getMessage.contains("truncated"))
  }

  test("raw option passes bytes through behind the size prefix") {
    val data = Array.tabulate[Byte](37)(i => (i * 7).toByte)
    val p = Params(Szip.Raw | Szip.NN | Szip.LSB, 8, 8, 16)
    val enc = Szip.encode(data, p)
    assert(enc.length === 4 + 37)
    assert(Szip.decode(enc, p).toSeq === data.toSeq)
  }

  test("round trip: every block mode, both preprocess modes, 8/16/32-bit") {
    val rnd = new scala.util.Random(20260814)
    val shapes: Seq[(String, Int => Int)] = Seq(
      "constant" -> (_ => 42),                    // zero-run path
      "slow-ramp" -> (i => i / 7),                // FS / small-k path
      "alternating" -> (i => i % 2),              // second-extension path
      "noisy" -> (_ => rnd.nextInt(1 << 16)),     // high-k / uncompressed
      "steps" -> (i => (i / 16) * 100))           // mixed blocks
    for {
      n <- Seq(8, 16, 32)
      mode <- Seq(Szip.NN, Szip.EC)
      order <- Seq(Szip.LSB, Szip.MSB)
      (label, gen) <- shapes
      // 3.5 scanlines incl. a partial final block: the padded tail path
      count <- Seq(224, 225, 100)
    } {
      val p = Params(mode | order, n, 16, 64)
      val bs = p.bytesPerSample
      val mask = if (n >= 63) Long.MaxValue else (1L << n) - 1
      val vals = Array.tabulate(count)(i => gen(i).toLong & mask)
      val data = new Array[Byte](count * bs)
      for (i <- 0 until count; j <- 0 until bs) {
        val sh = if (order == Szip.LSB) 8 * j else 8 * (bs - 1 - j)
        data(i * bs + j) = ((vals(i) >>> sh) & 0xff).toByte
      }
      val enc = Szip.encode(data, p)
      val dec = Szip.decode(enc, p)
      assert(dec.toSeq === data.toSeq,
        s"round trip failed: n=$n mode=$mode order=$order $label x$count")
    }
  }

  test("randomized round trip across parameter grid") {
    val rnd = new scala.util.Random(8675309)
    for (trial <- 1 to 30) {
      val n = Seq(8, 16, 24, 32)(rnd.nextInt(4))
      val j = Seq(2, 8, 10, 16, 32)(rnd.nextInt(5))
      val sls = Seq(32, 64, 100, 256)(rnd.nextInt(4))
      val mode = if (rnd.nextBoolean()) Szip.NN else Szip.EC
      val order = if (rnd.nextBoolean()) Szip.LSB else Szip.MSB
      val p = Params(mode | order, n, j, sls)
      val count = 1 + rnd.nextInt(500)
      val spread = 1 << rnd.nextInt(n) // vary entropy per trial
      val data = new Array[Byte](count * p.bytesPerSample)
      val mask = if (n >= 63) Long.MaxValue else (1L << n) - 1
      for (i <- 0 until count) {
        val v = (rnd.nextLong() % spread).abs & mask
        for (jj <- 0 until p.bytesPerSample) {
          val sh = if (order == Szip.LSB) 8 * jj
            else 8 * (p.bytesPerSample - 1 - jj)
          data(i * p.bytesPerSample + jj) = ((v >>> sh) & 0xff).toByte
        }
      }
      val dec = Szip.decode(Szip.encode(data, p), p)
      assert(dec.toSeq === data.toSeq,
        s"trial $trial failed: n=$n J=$j sls=$sls mode=$mode")
    }
  }

  test("unsupported parameter space fails loudly with the workaround") {
    val e = intercept[IllegalStateException](
      Szip.decode(chunk(4, 0x00), Params(Szip.EC, 12, 8, 64)))
    assert(e.getMessage.contains("12-bit") &&
      e.getMessage.contains("h5repack"))
    intercept[IllegalStateException](
      Szip.decode(chunk(4, 0x00), Params(Szip.EC, 8, 7, 64)))
    // truncated stream is corrupt, not silently short
    intercept[IllegalStateException](
      Szip.decode(chunk(64, 0xff), Params(Szip.EC | Szip.LSB, 8, 8, 64)))
  }
}
