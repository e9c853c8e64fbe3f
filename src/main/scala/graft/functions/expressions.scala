package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot per-row compute of the pipeline
  * operators (SURVEY.md §2 C). Each implements EXACTLY the arithmetic of its
  * dual-dialect [[PortableText]]/[[PortableVec]] builder — same fold order,
  * same modulus — so DuckDB oracle results stay bit-identical; the oracle
  * compare at sf0.01 is the parity test.
  *
  * Why not the SQL higher-order functions: interpreted lambda evaluation
  * boxes every step (~10^3-10^4 evals/s/core); these tight JVM loops are
  * 100-1000x faster and keep the surrounding projection codegen-friendly
  * via CodegenFallback. At 100 TB this is the difference between a
  * scan-speed map stage and a compute bottleneck.
  */
object native {
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

  /** Array<String> -> Array<Long>: per-token polynomial char hash.
    * Parity: PortableText.tokenHashes{Spark,Duck}. */
  case class PolyTokenHashes(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val out = new Array[Long](arr.numElements())
      var i = 0
      while (i < out.length) {
        out(i) = hashCodepoints(arr.getUTF8String(i).toString)
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** String -> Long polynomial char hash. Parity: PortableText.charHash*. */
  case class PolyStringHash(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      hashCodepoints(input.toString)
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** Array<Long> token hashes -> distinct 3-gram shingle hashes.
    * Parity: PortableText.shingleHashes* (distinctness is set-semantics;
    * downstream consumers are order-insensitive). */
  case class ShingleHashes(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val th = input.asInstanceOf[ArrayData].toLongArray()
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
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** Array<Long> shingle hashes -> 8 LSH band signatures over 32 minhashes.
    * Parity: PortableText.minhash* composed with PortableText.bands*. */
  case class MinhashBandSigs(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val sh = input.asInstanceOf[ArrayData].toLongArray()
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
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** Array<Long> token hashes -> 32-bit SimHash.
    * Parity: PortableText.simhash*. */
  case class SimHash32(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val th = input.asInstanceOf[ArrayData].toLongArray()
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
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** Array<Long> token hashes -> whole-document fingerprint (fold).
    * Parity: PortableText.docFingerprint*. */
  case class DocFingerprint(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val th = input.asInstanceOf[ArrayData].toLongArray()
      var h = 0L
      var i = 0
      while (i < th.length) { h = (h * 31 + th(i)) % P; i += 1 }
      h
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** (Array<Float>, Array<Float>) -> Double cosine similarity with the same
    * sequential accumulation order as PortableVec.cosine*. */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      i = 0
      while (i < n) { val v = x.getFloat(i).toDouble; nx += v * v; i += 1 }
      i = 0
      while (i < n) { val v = y.getFloat(i).toDouble; ny += v * v; i += 1 }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  /** Array<Float> (64-dim) -> Long signed-random-projection bucket (8
    * hyperplanes). Parity: PortableVec.lshBucket*. */
  case class LshBucket(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
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
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** Register all native expressions as SQL functions (idempotent). */
  def register(s: SparkSession): Unit = {
    val r = s.sessionState.functionRegistry
    r.createOrReplaceTempFunction("graft_token_hashes",
      es => PolyTokenHashes(es.head), "scala_udf")
    r.createOrReplaceTempFunction("graft_string_hash",
      es => PolyStringHash(es.head), "scala_udf")
    r.createOrReplaceTempFunction("graft_shingles",
      es => ShingleHashes(es.head), "scala_udf")
    r.createOrReplaceTempFunction("graft_minhash_bands",
      es => MinhashBandSigs(es.head), "scala_udf")
    r.createOrReplaceTempFunction("graft_simhash",
      es => SimHash32(es.head), "scala_udf")
    r.createOrReplaceTempFunction("graft_doc_fingerprint",
      es => DocFingerprint(es.head), "scala_udf")
    r.createOrReplaceTempFunction("graft_cosine",
      es => CosineSim(es.head, es(1)), "scala_udf")
    r.createOrReplaceTempFunction("graft_lsh_bucket",
      es => LshBucket(es.head), "scala_udf")
  }
}
