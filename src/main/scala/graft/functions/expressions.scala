package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
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

  /** Array<Long> shingle hashes -> the 32 raw MinHash signature lanes.
    * Parity: PortableText.minhash* (NativeExpressionsSpec property-pins
    * the equivalence). */
  case class Minhash32Sigs(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      NativeOps.minhash32(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Ops.minhash32($c)")
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

  /** [[LshBucket]] generalized to `planes` hyperplanes — the
    * corpus-scaled banded-LSH signature (plane j identical to the
    * bucket's plane j, so the 8-plane bucket is this sig's low byte).
    * Parity: PortableVec.lshSigDuck. */
  case class LshSig(child: Expression, planes: Int) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      NativeOps.lshSig(input.asInstanceOf[ArrayData], planes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Ops.lshSig($c, $planes)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Array<Long> token hashes -> Array<Long> distinct 8-token-span rolling
    * hashes (set semantics; consumers count occurrences, never order).
    * Parity: PortableText.spanHashes{Spark,Duck}. */
  case class SpanHashes(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      NativeOps.spanHashes(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Ops.spanHashes($c)")
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

  /** Array<Long> token hashes -> Array<Long> reversibly packed bigram
    * codes (a·2³¹ + b — token hashes < 2³⁰, exact). Parity: the SQL
    * transform twin in NativeExpressionsSpec. */
  case class BigramCodes(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      NativeOps.bigramCodes(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Ops.bigramCodes($c)")
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** (Array<Float> v, Array<Double> mns, Array<Double> mxs) ->
    * struct<code: Array<Long>, deq: Array<Double>, cnorm: Double>: the
    * scalar-quantization encode + dequantized reconstruction + its norm
    * in one codegen'd pass. Parity: the three-HOF SQL chain in
    * NativeExpressionsSpec. */
  case class Sq64Encode(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("code", ArrayType(LongType, containsNull = false),
        nullable = false),
      StructField("deq", ArrayType(DoubleType, containsNull = false),
        nullable = false),
      StructField("cnorm", DoubleType, nullable = false)))
    override def nullSafeEval(v: Any, mns: Any, mxs: Any): Any =
      NativeOps.sqEncode64(v.asInstanceOf[ArrayData],
        mns.asInstanceOf[ArrayData], mxs.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b, c) => s"$Ops.sqEncode64($a, $b, $c)")
    override protected def withNewChildrenInternal(a: Expression,
        b: Expression, c: Expression) = copy(a, b, c)
  }

  /** (Array<Float> v, Array<Double> deq) -> Long: Σ floor(|x−d|·1e9+0.5)
    * — the SQ residual fold. Parity: the aggregate-HOF twin in
    * NativeExpressionsSpec. */
  case class SqAbsErrE9(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any, b: Any): Any =
      NativeOps.sqAbsErrE9(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Ops.sqAbsErrE9($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  /** String -> struct<masked, email_chars, digit_run_chars>: one-pass PII
    * scrub with the exact semantics of the four-regex projection it
    * replaces (email replace, then digit-run replace; counts over the
    * original text). One byte scan instead of four backtracking regex
    * passes per row — t_pii_mask was the suite's 100x census ceiling.
    * Parity: PiiScrubSpec property-checks against java.util.regex. */
  case class PiiScrub(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("masked", StringType, nullable = false),
      StructField("email_chars", LongType, nullable = false),
      StructField("digit_run_chars", LongType, nullable = false)))
    override def nullSafeEval(input: Any): Any =
      NativeOps.piiScrub(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Ops.piiScrub($c)")
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** Single source of truth for every native SQL function: name, one-line
    * usage, builder. Consumed by [[register]] (per-session temp functions)
    * and [[graft.GraftExtensions]] (SparkSessionExtensions injection) so
    * the two registration paths can never drift apart — a function added
    * here is available everywhere. */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_tokens", "lowercase [a-z0-9]-run tokenizer",
      es => Tokens(es.head)),
    ("graft_token_hashes", "polynomial char hash per token",
      es => PolyTokenHashes(es.head)),
    ("graft_string_hash", "polynomial char hash of a string",
      es => PolyStringHash(es.head)),
    ("graft_shingles", "distinct 3-gram shingle hashes",
      es => ShingleHashes(es.head)),
    ("graft_span_hashes", "distinct 8-token span hashes",
      es => SpanHashes(es.head)),
    ("graft_minhash_bands", "8 LSH band signatures over 32 minhashes",
      es => MinhashBandSigs(es.head)),
    ("graft_minhash32", "the 32 raw MinHash signature lanes",
      es => Minhash32Sigs(es.head)),
    ("graft_simhash", "32-bit simhash", es => SimHash32(es.head)),
    ("graft_doc_fingerprint", "document fingerprint fold",
      es => DocFingerprint(es.head)),
    ("graft_cosine", "cosine similarity of float vectors",
      es => CosineSim(es.head, es(1))),
    ("graft_lsh_bucket", "signed-random-projection bucket",
      es => LshBucket(es.head)),
    ("graft_kmv_distinct", "KMV distinct-count sketch (aggregate)",
      es => KmvDistinct(es.head).toAggregateExpression()),
    ("graft_bigram_hashes", "adjacent-pair bigram hashes",
      es => BigramHashes(es.head)),
    ("graft_bigram_codes", "reversibly packed adjacent-pair bigram codes",
      es => BigramCodes(es.head)),
    ("graft_sq64", "scalar-quantize encode: struct(code, deq, cnorm)",
      es => Sq64Encode(es(0), es(1), es(2))),
    ("graft_sq_abserr_e9", "SQ residual fold: sum floor(|x-d|*1e9+0.5)",
      es => SqAbsErrE9(es(0), es(1))),
    ("graft_pii_scrub",
      "one-pass PII mask: struct(masked, email_chars, digit_run_chars)",
      es => PiiScrub(es.head)),
    ("graft_bottomk", "bottom-k payloads by hash (aggregate; optional k)",
      es => {
        val k =
          if (es.length >= 3) es(2) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
              v.asInstanceOf[Number].intValue()
            case other => throw new IllegalArgumentException(
              s"graft_bottomk k must be a literal, got $other")
          }
          else 5
        BottomKByHash(es(0), es(1), k).toAggregateExpression()
      }),
    ("graft_topk_scored",
      "top-k (score, payload) pairs by score desc (aggregate; optional k)",
      es => {
        val k =
          if (es.length >= 3) es(2) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
              v.asInstanceOf[Number].intValue()
            case other => throw new IllegalArgumentException(
              s"graft_topk_scored k must be a literal, got $other")
          }
          else 4
        TopKScored(es(0), es(1), k).toAggregateExpression()
      }),
    ("graft_frequent",
      "Misra-Gries frequent-items candidates (aggregate; optional k)",
      es => {
        val k =
          if (es.length >= 2) es(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
              v.asInstanceOf[Number].intValue()
            case other => throw new IllegalArgumentException(
              s"graft_frequent k must be a literal, got $other")
          }
          else 127
        MisraGriesAgg(es(0), k).toAggregateExpression()
      }))

  private val paramFnCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Wrap a DRIVER-PARAMETERIZED expression (one whose constructor
    * carries model-sized state, e.g. [[TopCentroids]]'s codebook index)
    * as a [[org.apache.spark.sql.Column]]: registers a uniquely-named
    * session temp function whose builder closes over the parameter and
    * returns a column invoking it. The public Column API has no
    * Expression injection point (`ExpressionUtils` is private[sql]), and
    * this matches how every other graft native function reaches plans.
    * The registry entry is session-scoped and a few hundred bytes — one
    * per distinct driver-state instance, model-count not row-count. */
  def parameterized(s: SparkSession,
      build: Seq[Expression] => Expression,
      args: org.apache.spark.sql.Column*): org.apache.spark.sql.Column = {
    val name = s"graft_param_${paramFnCounter.incrementAndGet()}"
    s.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, build, "scala_udf")
    org.apache.spark.sql.functions.call_function(name, args: _*)
  }

  /** Register every native function missing from the session (idempotent
    * per function: present ones are left untouched — re-replacing costs
    * registry churn and a WARN each; and a partially-populated registry,
    * e.g. a session configured with GraftExtensions from an older list,
    * still picks up the rest). */
  def register(s: SparkSession): Unit = {
    val r = s.sessionState.functionRegistry
    builders.foreach { case (name, _, b) =>
      if (!r.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        r.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}
