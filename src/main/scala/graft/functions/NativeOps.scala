package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row kernels behind the native expressions in [[native]]. A plain
  * object with no companion class, so scalac emits static forwarders —
  * whole-stage codegen calls these as `graft.functions.NativeOps.m(...)`
  * straight from Janino-generated Java, keeping the expressions inside the
  * codegen pipeline (no CodegenFallback boxing).
  *
  * Arithmetic is EXACTLY the dual-dialect [[PortableText]]/[[PortableVec]]
  * builders' — same fold order, same modulus — so DuckDB oracle results
  * stay bit-identical.
  */
object NativeOps {
  final val P = 1000000007L

  private def hashCodepoints(s: String): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  def stringHash(s: UTF8String): Long = hashCodepoints(s.toString)

  /** Tokenize exactly like the portable SQL chain
    * `filter(split(regexp_replace(lower(s), '[^a-z0-9 ]', ' '), ' '), x -> x != '')`:
    * tokens are the maximal runs of [a-z0-9] in the lowercased string
    * (every char outside that class becomes a separator, and empty splits
    * are dropped — identical by construction). Lowercasing goes through
    * UTF8String.toLowerCase, the same mapping Spark's `lower` uses, so
    * unicode edge cases agree bit-for-bit. */
  def tokens(s: UTF8String): ArrayData = {
    val t = s.toLowerCase.toString
    val out = new java.util.ArrayList[UTF8String]()
    val n = t.length
    var i = 0
    var start = -1
    while (i < n) {
      val c = t.charAt(i)
      val isTok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (isTok && start < 0) start = i
      else if (!isTok && start >= 0) {
        out.add(UTF8String.fromString(t.substring(start, i)))
        start = -1
      }
      i += 1
    }
    if (start >= 0) out.add(UTF8String.fromString(t.substring(start)))
    new GenericArrayData(out.toArray())
  }

  def tokenHashes(arr: ArrayData): ArrayData = {
    val out = new Array[Long](arr.numElements())
    var i = 0
    while (i < out.length) {
      out(i) = hashCodepoints(arr.getUTF8String(i).toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  def shingles(input: ArrayData): ArrayData = {
    val th = input.toLongArray()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i + 2 < th.length) {
      seen.add(java.lang.Long.valueOf(
        ((th(i) * 31 + th(i + 1)) % P * 31 + th(i + 2)) % P))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** Adjacent-pair (bigram) hashes of a token-hash array, order-preserving
    * with duplicates kept (unlike [[shingles]], which distincts): feeds
    * the repetition signals, where the COUNT of the top bigram matters. */
  def bigramHashes(input: ArrayData): ArrayData = {
    val th = input.toLongArray()
    val n = math.max(0, th.length - 1)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = (th(i) * 31 + th(i + 1)) % P
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Reversibly PACKED adjacent-pair bigram codes (a·2³¹ + b) of a
    * token-hash array — the LM/collocation pair key (token hashes are
    * < 2³⁰ < 2³¹, so the pack is exact and the endpoints decode by
    * division/modulus). Order-preserving, duplicates kept. Twin: the SQL
    * `transform(sequence(1, size(th)-1), i -> th[i]*2147483648 + th[i+1])`
    * the LM/collocation oracles mirror — pure integer arithmetic, so
    * parity is exact by construction (NativeExpressionsSpec pins it). */
  def bigramCodes(input: ArrayData): ArrayData = {
    val th = input.toLongArray()
    val n = math.max(0, th.length - 1)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = th(i) * 2147483648L + th(i + 1)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Scalar-quantization encode of one vector against broadcast per-dim
    * min/max tables: codes (floor((x−mn)·255/(mx−mn)), 0 on a degenerate
    * dim), the dequantized reconstruction, and its L2 norm — ONE pass
    * instead of three interpreted 64-lane HOFs per row. Every double
    * operation replays the SQL twins' order exactly ((x−mn)·255 then ÷;
    * code·(mx−mn) then ÷255 then mn+; norm accumulates deq²
    * left-to-right then sqrt), so results are bit-identical to the HOF
    * chain the DuckDB oracle mirrors (NativeExpressionsSpec pins it). */
  def sqEncode64(v: ArrayData, mns: ArrayData,
      mxs: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = mns.numElements()
    if (v.numElements() != n || mxs.numElements() != n)
      throw new IllegalArgumentException(
        s"SQ encode: v has ${v.numElements()}, mns $n, mxs " +
          s"${mxs.numElements()} elements — all must agree")
    val code = new Array[Long](n)
    val deq = new Array[Double](n)
    var acc = 0.0d
    var i = 0
    while (i < n) {
      val mn = mns.getDouble(i)
      val mx = mxs.getDouble(i)
      val c =
        if (mx == mn) 0L
        else math.floor((v.getFloat(i).toDouble - mn) * 255.0d / (mx - mn))
          .toLong
      code(i) = c
      deq(i) = mn + c.toDouble * (mx - mn) / 255.0d
      i += 1
    }
    i = 0
    while (i < n) { acc = acc + deq(i) * deq(i); i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(code), new GenericArrayData(deq),
        math.sqrt(acc)))
  }

  /** Σ floor(|x_i − d_i|·1e9 + 0.5) over a float vector and its double
    * reconstruction — the SQ residual fold of emb_quantize_error as one
    * codegen'd pass (the HOF `aggregate(sequence(1,64), …)` twin runs
    * ~64 interpreted lambda frames per row). Same double ops in the same
    * order, so the BIGINT result is identical by construction. */
  def sqAbsErrE9(v: ArrayData, deq: ArrayData): Long = {
    val n = deq.numElements()
    if (v.numElements() != n)
      throw new IllegalArgumentException(
        s"SQ abs-err: v has ${v.numElements()}, deq $n elements")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.floor(
        math.abs(v.getFloat(i).toDouble - deq.getDouble(i)) * 1000000000.0d
          + 0.5d).toLong
      i += 1
    }
    acc
  }

  /** Distinct 8-token-span rolling hashes (exact-substring dedup
    * granularity). Set semantics — downstream consumers count span
    * occurrences, never rely on order. Twin: PortableText.spanHashes*. */
  def spanHashes(input: ArrayData): ArrayData = {
    val th = input.toLongArray()
    val n = th.length - 7
    if (n <= 0) return new GenericArrayData(new Array[Long](0))
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    val out = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      var a = 0L
      var j = i
      while (j < i + 8) { a = (a * 31 + th(j)) % P; j += 1 }
      if (seen.add(a)) { out(m) = a; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** The 32 raw MinHash signature lanes (permutation j: h -> ((2j+1)h +
    * 10007j + 12345) mod P, min over the shingle set) — the shared inner
    * loop of [[minhashBands]], exposed for consumers that need the
    * per-lane minima themselves (signature agreement audits). Twin:
    * PortableText.minhash*. */
  def minhash32(input: ArrayData): ArrayData = {
    val sh = input.toLongArray()
    val mh = new Array[Long](32)
    var j = 0
    while (j < 32) {
      val a = 2L * j + 1
      val b = 10007L * j + 12345L
      var m = Long.MaxValue
      var k = 0
      while (k < sh.length) {
        val v = (a * sh(k) + b) % P
        if (v < m) m = v
        k += 1
      }
      mh(j) = m
      j += 1
    }
    new GenericArrayData(mh)
  }

  def minhashBands(input: ArrayData): ArrayData = {
    val sh = input.toLongArray()
    val mh = new Array[Long](32)
    var j = 0
    while (j < 32) {
      val a = 2L * j + 1
      val b = 10007L * j + 12345L
      var m = Long.MaxValue
      var k = 0
      while (k < sh.length) {
        val v = (a * sh(k) + b) % P
        if (v < m) m = v
        k += 1
      }
      mh(j) = m
      j += 1
    }
    val bands = new Array[Long](8)
    var bi = 0
    while (bi < 8) {
      var acc = 0L
      var k = 0
      while (k < 4) {
        acc = (acc * 31 + mh(4 * bi + k)) % P
        k += 1
      }
      bands(bi) = acc
      bi += 1
    }
    new GenericArrayData(bands)
  }

  def simhash(input: ArrayData): Long = {
    val th = input.toLongArray()
    var fp = 0L
    var b = 0
    while (b < 32) {
      var s = 0L
      var i = 0
      while (i < th.length) {
        s += (if (((th(i) >> b) & 1L) == 1L) 1L else -1L)
        i += 1
      }
      if (s > 0) fp += (1L << b)
      b += 1
    }
    fp
  }

  def docFingerprint(input: ArrayData): Long = {
    val th = input.toLongArray()
    var h = 0L
    var i = 0
    while (i < th.length) { h = (h * 31 + th(i)) % P; i += 1 }
    h
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    i = 0
    while (i < n) { val v = a.getFloat(i).toDouble; nx += v * v; i += 1 }
    i = 0
    while (i < n) { val v = b.getFloat(i).toDouble; ny += v * v; i += 1 }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** [[lshBucket]] generalized to `planes` hyperplanes (same weight
    * formula, same fold order — plane j of any width agrees with the
    * 8-plane bucket's plane j). Parity: PortableVec.lshSigDuck. */
  def lshSig(v: ArrayData, planes: Int): Long = {
    var bucket = 0L
    var j = 0
    while (j < planes) {
      var s = 0.0
      var i = 1
      while (i <= 64) {
        val w = ((1103515245L * (j.toLong * 257 + i) + 12345L) % 1000003L) - 501001L
        s += w.toDouble * v.getFloat(i - 1).toDouble
        i += 1
      }
      if (s >= 0.0) bucket += (1L << j)
      j += 1
    }
    bucket
  }

  // ------------------------------------------------------------ PII scrub
  //
  // Single-pass replacement for the four-regex t_pii_mask projection:
  // one byte scan finds every email match (the exact leftmost-greedy
  // semantics of Java regex AND RE2 for the pattern
  // [A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+ — both engines
  // agree on this backtracking-free-equivalent pattern, which is what
  // makes the kernel's hand rule well-defined), a second finds maximal
  // digit runs (the [0-9]{6,} pattern). All pattern classes are ASCII,
  // so the scan runs on raw UTF-8 bytes: multi-byte sequences never
  // collide with ASCII classes, and matched-char counts equal matched-
  // byte counts. PiiScrubSpec property-checks this kernel against
  // java.util.regex on adversarial generated strings.

  private def isEmailLocal(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '.' || b == '_' || b == '%' ||
      b == '+' || b == '-'
  private def isEmailDomain(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '.' || b == '-'
  private def isLetter(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  private val EMAIL_TOKEN = "<EMAIL>".getBytes("US-ASCII")
  private val NUM_TOKEN = "<NUM>".getBytes("US-ASCII")

  /** Email matches as (start, end) byte intervals, in order, non-
    * overlapping, with regexp_replace's continue-after-match rule.
    * Semantics proof sketch (vs the Java/RE2 pattern above): at scan
    * floor `from`, the leftmost match anchors on the first viable '@' —
    * local part = maximal [A-Za-z0-9._%+-] run left of '@' clamped at
    * `from` (leftmost start = run start); domain: B+ grabs the maximal
    * [A-Za-z0-9.-] run, then backtracks to the LARGEST '.' followed by
    * >=2 letters (greedy B+ gives back minimally); the trailing letter
    * run is taken maximally (pattern end). An '@' whose local or domain
    * fails can never seed a match from a later start before the next
    * '@' (any later start inside the same local run fails identically). */
  private def emailIntervals(b: Array[Byte]): Array[Int] = {
    val n = b.length
    var out = new Array[Int](8)
    var m = 0
    var from = 0
    var j = 0
    while (j < n) {
      if (b(j) == '@' && j > from) {
        var ls = j
        while (ls > from && isEmailLocal(b(ls - 1))) ls -= 1
        if (ls < j) {
          var de = j + 1
          while (de < n && isEmailDomain(b(de))) de += 1
          if (de > j + 1) {
            var k = de - 1
            var best = -1
            while (k >= j + 2 && best < 0) {
              if (b(k) == '.' && k + 2 < n && isLetter(b(k + 1)) &&
                isLetter(b(k + 2))) best = k
              k -= 1
            }
            if (best >= 0) {
              var me = best + 1
              while (me < n && isLetter(b(me))) me += 1
              if (m + 2 > out.length)
                out = java.util.Arrays.copyOf(out, out.length * 2)
              out(m) = ls; out(m + 1) = me; m += 2
              from = me
              j = me - 1 // loop increment lands on me
            }
          }
        }
      }
      j += 1
    }
    java.util.Arrays.copyOf(out, m)
  }

  /** Mask the digit runs (>= 6) of b[from, to) into `out`, returning the
    * new output position. Runs never straddle segment edges: a digit
    * adjacent to an email match's local part would have been inside the
    * match (digits are local-part chars), and the <EMAIL> token itself
    * is digit-free. */
  private def maskDigitsInto(b: Array[Byte], from: Int, to: Int,
      out: Array[Byte], outPos: Int): Int = {
    var p = outPos
    var i = from
    while (i < to) {
      if (isDigit(b(i))) {
        var e = i + 1
        while (e < to && isDigit(b(e))) e += 1
        if (e - i >= 6) {
          System.arraycopy(NUM_TOKEN, 0, out, p, NUM_TOKEN.length)
          p += NUM_TOKEN.length
        } else {
          System.arraycopy(b, i, out, p, e - i)
          p += e - i
        }
        i = e
      } else {
        out(p) = b(i)
        p += 1
        i += 1
      }
    }
    p
  }

  /** One-pass PII scrub: (masked, email_chars, digit_run_chars) exactly
    * as the four-regex projection computes them — email replace first,
    * then digit-run replace on the result; both char counts over the
    * ORIGINAL text. Returns a struct row. */
  def piiScrub(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val b = s.getBytes
    val n = b.length
    val iv = emailIntervals(b)
    var emailChars = 0L
    var i = 0
    while (i < iv.length) { emailChars += iv(i + 1) - iv(i); i += 2 }
    var digitChars = 0L
    i = 0
    while (i < n) {
      if (isDigit(b(i))) {
        var e = i + 1
        while (e < n && isDigit(b(e))) e += 1
        if (e - i >= 6) digitChars += e - i
        i = e
      } else i += 1
    }
    // <EMAIL> (7B) can outgrow the shortest match (6B: a@b.cc); <NUM>
    // only shrinks. n + one byte per email bounds the output.
    val out = new Array[Byte](n + iv.length / 2)
    var p = 0
    var pos = 0
    i = 0
    while (i < iv.length) {
      p = maskDigitsInto(b, pos, iv(i), out, p)
      System.arraycopy(EMAIL_TOKEN, 0, out, p, EMAIL_TOKEN.length)
      p += EMAIL_TOKEN.length
      pos = iv(i + 1)
      i += 2
    }
    p = maskDigitsInto(b, pos, n, out, p)
    val masked = UTF8String.fromBytes(java.util.Arrays.copyOf(out, p))
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](masked, emailChars, digitChars))
  }

  def lshBucket(v: ArrayData): Long = {
    var bucket = 0L
    var j = 0
    while (j < 8) {
      var s = 0.0
      var i = 1
      while (i <= 64) {
        val w = ((1103515245L * (j.toLong * 257 + i) + 12345L) % 1000003L) - 501001L
        s += w.toDouble * v.getFloat(i - 1).toDouble
        i += 1
      }
      if (s >= 0.0) bucket += (1L << j)
      j += 1
    }
    bucket
  }
}
