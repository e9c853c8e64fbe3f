package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The one-pass PII-scrub kernel must agree BIT-FOR-BIT with the
  * four-regex projection it replaced (which is still what the DuckDB
  * oracle runs): email replace first, then digit-run replace on the
  * result; both matched-char counts over the original text. The regex
  * reference here is java.util.regex — the engine the old projection
  * used via Spark's regexp_replace. */
class PiiScrubSpec extends AnyFunSuite with SparkSpec {

  private val EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  private val DIGITS = "[0-9][0-9][0-9][0-9][0-9][0-9]+"

  private def reference(t: String): (String, Long, Long) = {
    val masked = t.replaceAll(EMAIL, "<EMAIL>").replaceAll(DIGITS, "<NUM>")
    val ec = (t.length - t.replaceAll(EMAIL, "").length).toLong
    val dc = (t.length - t.replaceAll(DIGITS, "").length).toLong
    (masked, ec, dc)
  }

  private def kernel(t: String): (String, Long, Long) = {
    val row = graft.functions.NativeOps.piiScrub(UTF8String.fromString(t))
    (row.getUTF8String(0).toString, row.getLong(1), row.getLong(2))
  }

  private def check(t: String): Unit =
    assert(kernel(t) === reference(t), s"input: ${t.replace("\n", "\\n")}")

  test("adversarial literals") {
    Seq(
      "", "plain text, no pii",
      "a@b.cc", "a@b.c", "@b.com", "a@", "a@.com", "a@b", "a@b.",
      "a@b..com", "a@b.co.uk", "a@....com", "....@x.com", "a@-.-xy",
      "ab@@cd@e.fg", "a@b.cc@d.ee", "a@b.cc c@d.ee", "x@y.zz.",
      "123456", "12345", "1234567890", "12345a@b.com678901",
      "a@b.com123456789", "999999999@x.yz12", "x123456@foo.co789012",
      "email: first.last+tag%x@sub-domain.example.ORG done",
      "é@b.com", "a@b.comé", "日本語123456テスト a@б.com",
      "a@b.cóm", "tel 555-123456 fax 1234-567890123",
      "trailing digits 123456", "123456 leading digits",
      "a@b.cc.", ".a@b.cc", "-a@b.cc-", "%@x.yy", "+@+.++",
      "a@1.23", "a@1.2x", "a@x2.x2", "n0@d0.a0b1" // digit-edged domains
    ).foreach(check)
  }

  test("property: kernel == java.util.regex on adversarial random strings") {
    val piiChar = Gen.frequency(
      5 -> Gen.alphaChar, 4 -> Gen.numChar,
      3 -> Gen.oneOf('@', '.'), 2 -> Gen.oneOf('-', '_', '%', '+'),
      2 -> Gen.oneOf(' ', '\n', ',', '!'),
      1 -> Gen.oneOf('Ä', 'é', 'И', '中'))
    val text = Gen.choose(0, 80).flatMap(n =>
      Gen.listOfN(n, piiChar).map(_.mkString))
    var n = 0
    (0 until 800).foreach { i =>
      text.apply(Gen.Parameters.default, Seed(1234L + i)).foreach { t =>
        check(t); n += 1
      }
    }
    assert(n > 700)
  }

  test("property: digit-dense strings (runs straddling length 6)") {
    val g = Gen.choose(0, 40).flatMap(n => Gen.listOfN(n,
      Gen.frequency(6 -> Gen.numChar, 1 -> Gen.const(' '),
        1 -> Gen.alphaChar)).map(_.mkString))
    (0 until 300).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(77L + i)).foreach(check)
    }
  }

  test("plan parity: graft_pii_scrub column == regex columns on documents") {
    graft.functions.native.register(spark)
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val both = docs
      .select(col("doc_id"), col("text"),
        expr("graft_pii_scrub(text)").as("p"))
      .select(col("doc_id"),
        col("p.masked").as("masked"),
        col("p.email_chars").as("email_chars"),
        col("p.digit_run_chars").as("digit_run_chars"),
        regexp_replace(regexp_replace(col("text"), EMAIL, "<EMAIL>"),
          DIGITS, "<NUM>").as("r_masked"),
        (length(col("text")) -
          length(regexp_replace(col("text"), EMAIL, "")))
          .cast(LongType).as("r_email_chars"),
        (length(col("text")) -
          length(regexp_replace(col("text"), DIGITS, "")))
          .cast(LongType).as("r_digit_run_chars"))
    val bad = both.filter(col("masked") =!= col("r_masked") ||
      col("email_chars") =!= col("r_email_chars") ||
      col("digit_run_chars") =!= col("r_digit_run_chars"))
    assert(bad.count() === 0L)
    assert(both.count() > 0L)
  }
}
