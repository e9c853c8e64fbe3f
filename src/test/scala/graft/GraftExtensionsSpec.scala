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
    // the injection list IS native.builders, so a function registered for
    // queries can never be missing from an extension-configured session
    // (graft_bottomk was exactly that gap before the lists were unified)
    val expected = graft.functions.native.builders.map(_._1).toSet
    assert(names === expected,
      s"extension/injection drift: ${expected -- names} ${names -- expected}")
    // each builder constructs a well-typed expression from dummy children
    import org.apache.spark.sql.catalyst.expressions.Literal
    val arities = Map("graft_cosine" -> 2, "graft_bottomk" -> 2,
      "graft_topk_scored" -> 2, "graft_sq_abserr_e9" -> 2,
      "graft_sq64" -> 3)
    injected.foreach {
      case (id, _, builder) =>
        val arity = arities.getOrElse(id.funcName, 1)
        val e = builder(Seq.fill(arity)(Literal(null)))
        assert(e.dataType != null, s"${id.funcName} builder failed")
    }
  }
}
