package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot per-row compute of the pipeline
  * operators (SURVEY.md §2 C). Each implements EXACTLY the arithmetic of its
  * dual-dialect [[PortableText]]/[[PortableVec]] builder — same fold order,
  * same modulus — so DuckDB oracle results stay bit-identical; the oracle
  * compare at sf0.01 is the parity test.
  *
  * Why not the SQL higher-order functions: interpreted lambda evaluation
  * boxes every step (~10^3-10^4 evals/s/core); the [[NativeOps]] kernels
  * are tight JVM loops, 100-1000x faster. Each expression implements
  * doGenCode as a static call into [[NativeOps]], so the surrounding
  * projection stays inside whole-stage codegen — no CodegenFallback
  * interpreted round-trip per row. At 100 TB this is the difference
  * between a scan-speed map stage and a compute bottleneck.
  */
object native {
  final val P = NativeOps.P

  private final val Ops = "graft.functions.NativeOps"

  /** Array<String> -> Array<Long>: per-token polynomial char hash.
    * Parity: PortableText.tokenHashes{Spark,Duck}. */
  case class PolyTokenHashes(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      NativeOps.tokenHashes(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Ops.tokenHashes($c)")
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** String -> Array<String> tokens (maximal [a-z0-9] runs of the
    * lowercased input). Parity: PortableText.tokens{Spark,Duck}. */
  case class Tokens(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      NativeOps.tokens(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Ops.tokens($c)")
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** String -> Long polynomial char hash. Parity: PortableText.charHash*. */
  case class PolyStringHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      NativeOps.stringHash(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Ops.stringHash($c)")
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** Array<Long> token hashes -> distinct 3-gram shingle hashes.
    * Parity: PortableText.shingleHashes* (distinctness is set-semantics;
    * downstream consumers are order-insensitive). */
  case class ShingleHashes(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      NativeOps.shingles(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Ops.shingles($c)")
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** Array<Long> shingle hashes -> 8 LSH band signatures over 32 minhashes.
    * Parity: PortableText.minhash* composed with PortableText.bands*. */
  case class MinhashBandSigs(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      NativeOps.minhashBands(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Ops.minhashBands($c)")
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** Array<Long> token hashes -> 32-bit SimHash.
    * Parity: PortableText.simhash*. */
  case class SimHash32(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      NativeOps.simhash(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Ops.simhash($c)")
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** Array<Long> token hashes -> whole-document fingerprint (fold).
    * Parity: PortableText.docFingerprint*. */
  case class DocFingerprint(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      NativeOps.docFingerprint(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Ops.docFingerprint($c)")
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** (Array<Float>, Array<Float>) -> Double cosine similarity with the same
    * sequential accumulation order as PortableVec.cosine*. */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      NativeOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Ops.cosine($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  /** Array<Float> (64-dim) -> Long signed-random-projection bucket (8
    * hyperplanes). Parity: PortableVec.lshBucket*. */
  case class LshBucket(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      NativeOps.lshBucket(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Ops.lshBucket($c)")
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** Array<Long> token hashes -> Array<Long> adjacent-pair bigram hashes
    * (order-preserving, duplicates kept). Parity:
    * PortableText.bigramHashesDuck. */
  case class BigramHashes(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      NativeOps.bigramHashes(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Ops.bigramHashes($c)")
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** Register all native expressions as SQL functions (idempotent: a
    * session that already has them is left untouched — replacing on every
    * query call costs registry churn and a WARN per function). */
  def register(s: SparkSession): Unit = {
    val r = s.sessionState.functionRegistry
    if (r.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_tokens")))
      return
    r.createOrReplaceTempFunction("graft_tokens",
      es => Tokens(es.head), "scala_udf")
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
    r.createOrReplaceTempFunction("graft_kmv_distinct",
      es => KmvDistinct(es.head).toAggregateExpression(), "scala_udf")
    r.createOrReplaceTempFunction("graft_bigram_hashes",
      es => BigramHashes(es.head), "scala_udf")
    r.createOrReplaceTempFunction("graft_bottomk",
      es => BottomKByHash(es(0), es(1)).toAggregateExpression(), "scala_udf")
  }
}
