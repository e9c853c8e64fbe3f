package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions entry point must register every native
  * function and build working expressions — this is how a user of the
  * library gets `graft_*` in plain SQL without calling register().
  * (The shared test session predates extension loading, so the injection
  * list is inspected directly rather than through a new session.) */
class GraftExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("injects all native functions with working builders") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val field = classOf[SparkSessionExtensions].getDeclaredFields
      .find(_.getName.contains("injectedFunctions"))
      .getOrElse(fail("SparkSessionExtensions layout changed"))
    field.setAccessible(true)
    val injected = field.get(ext)
      .asInstanceOf[scala.collection.mutable.Buffer[
        (org.apache.spark.sql.catalyst.FunctionIdentifier,
          org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
          Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
            org.apache.spark.sql.catalyst.expressions.Expression)]]
    val names = injected.map(_._1.funcName).toSet
    val expected = Set("graft_tokens", "graft_token_hashes",
      "graft_string_hash", "graft_shingles", "graft_minhash_bands",
      "graft_simhash", "graft_doc_fingerprint", "graft_cosine",
      "graft_lsh_bucket")
    assert(expected.subsetOf(names),
      s"missing injections: ${expected -- names}")
    // each builder constructs a well-typed expression from dummy children
    import org.apache.spark.sql.catalyst.expressions.Literal
    injected.filter(t => expected(t._1.funcName)).foreach {
      case (id, _, builder) =>
        val arity = if (id.funcName == "graft_cosine") 2 else 1
        val e = builder(Seq.fill(arity)(Literal(null)))
        assert(e.dataType != null, s"${id.funcName} builder failed")
    }
  }
}
