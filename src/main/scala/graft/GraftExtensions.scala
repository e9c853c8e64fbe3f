package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: makes every graft native function
  * available in SQL without manual registration —
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * }}}
  *
  * or `.withExtensions(new GraftExtensions)`. The injected functions are
  * the codegen'd native expressions of [[graft.functions.native]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  import graft.functions.native._

  private def info(name: String, usage: String) = {
    val _ = usage // retained for call-site docs
    new ExpressionInfo("graft", null, name)
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String,
        b: Seq[Expression] => Expression): Unit =
      e.injectFunction((FunctionIdentifier(name), info(name, usage), b))

    inject("graft_tokens",
      "lowercase [a-z0-9]-run tokenizer", es => Tokens(es.head))
    inject("graft_token_hashes",
      "polynomial char hash per token", es => PolyTokenHashes(es.head))
    inject("graft_string_hash",
      "polynomial char hash of a string", es => PolyStringHash(es.head))
    inject("graft_shingles",
      "distinct 3-gram shingle hashes", es => ShingleHashes(es.head))
    inject("graft_minhash_bands",
      "8 LSH band signatures over 32 minhashes",
      es => MinhashBandSigs(es.head))
    inject("graft_simhash", "32-bit simhash", es => SimHash32(es.head))
    inject("graft_doc_fingerprint",
      "document fingerprint fold", es => DocFingerprint(es.head))
    inject("graft_cosine",
      "cosine similarity of float vectors", es => CosineSim(es.head, es(1)))
    inject("graft_lsh_bucket",
      "signed-random-projection bucket", es => LshBucket(es.head))
  }
}
