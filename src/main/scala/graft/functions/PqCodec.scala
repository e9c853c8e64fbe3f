package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encode kernel: per subspace the ks L2 distances
  * and the FIRST-minimum code (strict `<` scan == the SQL
  * `array_position(d, array_min(d))` tie rule), plus optionally the
  * reconstruction norm from the chosen centroids.
  *
  * This is the native twin of the HOF-expression encode the registry's
  * `ann_pq`/`ann_ivfpq` SQL mirrors in DuckDB: SAME double operations in
  * the SAME fold order (inner j-fold completes, then adds — float→double
  * widening exact), so results are bit-identical (NativeExpressionsSpec
  * pins it), but evaluated as tight JVM loops inside whole-stage codegen
  * instead of ~1k interpreted lambda frames + nested array allocations
  * per row — measured ~20× on the 100×-replicated encode stage. */
final class PqCodec(cbIn: Array[Array[Array[Float]]],
    val withNorm: Boolean) extends Serializable {
  private val m = cbIn.length
  private val ks = cbIn(0).length
  private val sub = cbIn(0)(0).length
  private val cb = cbIn.map(_.map(_.clone()))

  def encode(v: ArrayData): InternalRow = {
    // Validate BEFORE touching unchecked accessors: UnsafeArrayData
    // .getFloat does no bounds/null checks, so a short embedding or a
    // null element (both reachable through the public pqSearch /
    // writePqIndex APIs on arbitrary user frames) would silently read
    // garbage and yield wrong codes. One length compare plus a bitset
    // scan of m*sub slots — noise next to the ks*sub distance loop.
    if (v.numElements() != m * sub)
      throw new IllegalArgumentException(
        s"PQ encode: embedding has ${v.numElements()} elements, codebook " +
          s"expects m*sub = ${m * sub}")
    var nv = 0
    while (nv < m * sub) {
      if (v.isNullAt(nv))
        throw new IllegalArgumentException(
          s"PQ encode: embedding element $nv is null (dense non-null " +
            "Array[Float] required)")
      nv += 1
    }
    val codes = new Array[Long](m)
    var si = 0
    while (si < m) {
      val cbs = cb(si)
      var best = 0.0d
      var bestC = 0
      var c = 0
      while (c < ks) {
        val cv = cbs(c)
        var a = 0.0d
        var j = 0
        while (j < sub) {
          val d = v.getFloat(si * sub + j).toDouble - cv(j).toDouble
          a = a + d * d
          j += 1
        }
        if (c == 0 || a < best) { best = a; bestC = c }
        c += 1
      }
      codes(si) = bestC + 1L // 1-based, like array_position
      si += 1
    }
    if (!withNorm) InternalRow(new GenericArrayData(codes))
    else {
      var acc = 0.0d
      var s2 = 0
      while (s2 < m) {
        val cv = cb(s2)(codes(s2).toInt - 1)
        var b = 0.0d
        var j = 0
        while (j < sub) {
          val cd = cv(j).toDouble
          b = b + cd * cd
          j += 1
        }
        acc = acc + b
        s2 += 1
      }
      InternalRow(new GenericArrayData(codes), math.sqrt(acc))
    }
  }

  /** The query-side ADC lookup table — m·ks dot products of the query's
    * sub-slices against every codebook centroid, flat-indexed
    * `si·ks + c` exactly like the HOF
    * `flatten(transform(sequence(0,m-1), si -> transform(sequence(0,ks-1),
    * c -> aggregate(sequence(1,sub), 0D, (a,j) -> a + v[si·sub+j] ·
    * cb[c+1][si·sub+j]))))` twin the DuckDB oracle mirrors: the inner
    * j-fold accumulates left-to-right in double from 0.0, so every entry
    * is bit-identical (NativeExpressionsSpec pins it). One tight loop
    * instead of ~m·ks·sub interpreted lambda frames per query row. */
  def lut(v: ArrayData): ArrayData = {
    if (v.numElements() != m * sub)
      throw new IllegalArgumentException(
        s"PQ LUT: query vector has ${v.numElements()} elements, codebook " +
          s"expects m*sub = ${m * sub}")
    val out = new Array[Double](m * ks)
    var si = 0
    while (si < m) {
      val cbs = cb(si)
      var c = 0
      while (c < ks) {
        val cv = cbs(c)
        var a = 0.0d
        var j = 0
        while (j < sub) {
          a = a + v.getFloat(si * sub + j).toDouble * cv(j).toDouble
          j += 1
        }
        out(si * ks + c) = a
        c += 1
      }
      si += 1
    }
    new GenericArrayData(out)
  }
}

/** The ADC lookup-table sum as a static kernel: m LUT lookups + adds,
  * sequentially — the SAME operations in the SAME order as the HOF fold
  * the DuckDB oracle mirrors (`aggregate(sequence(0, m-1), 0D, (a, si)
  * -> a + element_at(lut, si*ks + code[si+1]))`), so the sum is
  * bit-identical; the surrounding zero-guard and divide stay scalar SQL
  * (Spark codegens those natively). Static so generated code calls it
  * directly. */
object PqAdc {
  def lutSum(lut: ArrayData, code: ArrayData, m: Int, ks: Int): Double = {
    // Codes can arrive from a foreign/corrupted codes.parquet via
    // pqSearchIndex: getDouble/getLong are unchecked, so validate shape
    // and each code's [1, ks] range before indexing the LUT. Two length
    // compares per candidate plus one branch per lookup — predictable,
    // stays inside codegen.
    if (lut.numElements() != m * ks || code.numElements() != m)
      throw new IllegalArgumentException(
        s"PQ ADC: lut has ${lut.numElements()} (want ${m * ks}), code has " +
          s"${code.numElements()} (want $m)")
    var a = 0.0d
    var si = 0
    while (si < m) {
      val c = code.getLong(si)
      if (c < 1L || c > ks)
        throw new IllegalArgumentException(
          s"PQ ADC: code[$si] = $c out of range [1, $ks] — corrupted or " +
            "foreign PQ codes")
      a = a + lut.getDouble(si * ks + c.toInt - 1)
      si += 1
    }
    a
  }
}

/** [[PqAdc.lutSum]] over (lut, code) columns — the per-candidate
  * scoring kernel of the PQ/IVF-PQ paths, kept inside whole-stage
  * codegen (the HOF fold ran ~m interpreted lambda frames per
  * CANDIDATE — corpus×queries rows on the flat path). */
case class PqLutSumExpr(lut: Expression, code: Expression, m: Int, ks: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = lut
  override def right: Expression = code
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, c: Any): Any =
    PqAdc.lutSum(l.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], m, ks)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, c) =>
      s"graft.functions.PqAdc.lutSum($l, $c, $m, $ks)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): PqLutSumExpr = copy(lut = l, code = r)
}

/** `PqCodec.lut` as a codegen'd unary expression over the query vector —
  * the native twin of the query-side ADC-table HOF (the last
  * CodegenFallback node in the ann_pq/ann_ivfpq plans; query-count-sized
  * work, but it dragged the whole query projection out of whole-stage
  * codegen). */
case class PqLutBuildExpr(child: Expression, codec: PqCodec)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    codec.lut(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodec", codec,
      classOf[PqCodec].getName)
    defineCodeGen(ctx, ev, c => s"$ref.lut($c)")
  }
  override protected def withNewChildInternal(c: Expression): PqLutBuildExpr =
    copy(child = c)
}

/** `PqCodec.encode` as a codegen'd unary expression over the embedding
  * array — same shape as [[TopCentroids]]: the codec rides along as a
  * referenced object, the generated code is one virtual call. */
case class PqEncodeExpr(child: Expression, codec: PqCodec)
    extends UnaryExpression {
  override def dataType: DataType = StructType(
    StructField("code", ArrayType(LongType, containsNull = false),
      nullable = false) +:
      (if (codec.withNorm)
        Seq(StructField("rnorm", DoubleType, nullable = false))
      else Nil))
  override def nullSafeEval(input: Any): Any =
    codec.encode(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodec", codec,
      classOf[PqCodec].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
}
