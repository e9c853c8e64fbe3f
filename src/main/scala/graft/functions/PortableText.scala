package graft.functions

/** Builders that emit the SAME text-analysis expression in both dialects —
  * Spark SQL (higher-order functions) and DuckDB SQL (list lambdas) — so the
  * engine and the oracle compute bit-identical values by construction.
  *
  * All hashing is explicit polynomial arithmetic mod 1e9+7 in BIGINT — no
  * engine-builtin hash() whose implementations differ across engines.
  *
  * Scale notes: everything here is per-row compute (no shuffle). Strings are
  * hashed per token (short), then shingles/fingerprints combine token HASHES
  * — never re-scanning long strings — so cost is O(total tokens), not
  * O(chars^2). The further optimization path at 100 TB is a codegen'd
  * Catalyst Expression for the char fold; the arithmetic is unchanged.
  */
object PortableText {
  val P = 1000000007L

  /** Lower-cased alphanumeric tokens of a string column. */
  def tokensSpark(e: String): String =
    s"filter(split(regexp_replace(lower($e), '[^a-z0-9 ]', ' '), ' '), x -> x != '')"
  def tokensDuck(e: String): String =
    s"list_filter(string_split(regexp_replace(lower($e), '[^a-z0-9 ]', ' ', 'g'), ' '), x -> x <> '')"

  /** Polynomial rolling hash of a (short) string expression, base 31. */
  def charHashSpark(e: String): String =
    s"aggregate(transform(sequence(1, length($e)), i -> CAST(ascii(substring($e, i, 1)) AS BIGINT)), 0L, (a, c) -> (a * 31 + c) % $P)"
  def charHashDuck(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length($e) + 1), i -> CAST(ord(substr($e, i, 1)) AS BIGINT))), (a, c) -> (a * 31 + c) % $P)"

  /** Per-token polynomial hashes of a tokens-array expression. */
  def tokenHashesSpark(toks: String): String =
    s"transform($toks, t -> ${charHashSpark("t")})"
  def tokenHashesDuck(toks: String): String =
    s"list_transform($toks, t -> ${charHashDuck("t")})"

  /** Adjacent-pair (bigram) hashes, order-preserving with duplicates —
    * twin of NativeOps.bigramHashes (repetition signals count the top
    * bigram, so no distinct). */
  def bigramHashesDuck(th: String): String =
    s"list_transform(range(1, len($th)), i -> ($th[i] * 31 + $th[i + 1]) % $P)"
  def bigramHashesSpark(th: String): String =
    // guard size < 2: Spark's sequence(1, 0) counts DOWN ([1, 0]) instead
    // of producing an empty list
    s"CASE WHEN size($th) < 2 THEN array_repeat(CAST(0 AS BIGINT), 0) " +
      s"ELSE transform(sequence(1, size($th) - 1), " +
      s"i -> (element_at($th, i) * 31 + element_at($th, i + 1)) % $P) END"

  /** Distinct 3-gram shingle hashes combining token hashes (assumes the
    * token-hash array expression `th` has size >= 3). */
  def shingleHashesSpark(th: String): String =
    s"array_distinct(transform(sequence(1, size($th) - 2), i -> ((element_at($th, i) * 31 + element_at($th, i + 1)) % $P * 31 + element_at($th, i + 2)) % $P))"
  def shingleHashesDuck(th: String): String =
    s"list_distinct(list_transform(range(1, len($th) - 1), i -> (($th[i] * 31 + $th[i + 1]) % $P * 31 + $th[i + 2]) % $P))"

  /** 32 MinHash signatures over a shingle-hash array expression: permutation
    * j is h -> ((2j+1)h + 10007j + 12345) mod P. */
  def minhashSpark(sh: String): String =
    s"transform(sequence(0, 31), j -> array_min(transform($sh, h -> ((2 * CAST(j AS BIGINT) + 1) * h + 10007 * CAST(j AS BIGINT) + 12345) % $P)))"
  def minhashDuck(sh: String): String =
    s"list_transform(range(0, 32), j -> list_min(list_transform($sh, h -> ((2 * CAST(j AS BIGINT) + 1) * h + 10007 * CAST(j AS BIGINT) + 12345) % $P)))"

  /** 8 LSH band signatures (bands of 4 rows) over a 32-minhash array. */
  def bandsSpark(mh: String): String =
    s"transform(sequence(0, 7), b -> aggregate(slice($mh, 4 * b + 1, 4), 0L, (a, x) -> (a * 31 + x) % $P))"
  def bandsDuck(mh: String): String =
    s"list_transform(range(0, 8), b -> list_reduce(list_prepend(CAST(0 AS BIGINT), $mh[(4 * b + 1):(4 * b + 4)]), (a, x) -> (a * 31 + x) % $P))"

  /** Distinct 8-token-span hashes (exact-substring dedup granularity —
    * longer than shingles, so a match means a verbatim copied span). Empty
    * below 8 tokens; the Spark CASE guards sequence()'s count-down on a
    * negative span count. */
  def spanHashesSpark(th: String): String =
    s"CASE WHEN size($th) < 8 THEN array_repeat(CAST(0 AS BIGINT), 0) " +
      s"ELSE array_distinct(transform(sequence(1, size($th) - 7), " +
      s"i -> aggregate(slice($th, i, 8), 0L, (a, x) -> (a * 31 + x) % $P))) END"
  def spanHashesDuck(th: String): String =
    s"list_distinct(list_transform(range(1, len($th) - 6), i -> " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), $th[i:i + 7]), " +
      s"(a, x) -> (a * 31 + x) % $P)))"

  /** Whole-document fingerprint: fold of token hashes. */
  def docFingerprintSpark(th: String): String =
    s"aggregate($th, 0L, (a, h) -> (a * 31 + h) % $P)"
  def docFingerprintDuck(th: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $th), (a, h) -> (a * 31 + h) % $P)"

  /** 32-bit SimHash from a token-hash array expression: per-bit +-1 votes.
    * (Token hashes are < 2^30, so the high bits vote 0 — effectively a
    * 30-bit fingerprint; identical in both engines.) */
  def simhashSpark(th: String): String =
    s"aggregate(sequence(0, 31), 0L, (acc, b) -> acc + IF(aggregate($th, 0L, (a, h) -> a + IF((h div shiftleft(1L, b)) % 2 = 1, 1L, -1L)) > 0L, shiftleft(1L, b), 0L))"
  def simhashDuck(th: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 32), b -> CASE WHEN list_sum(list_transform($th, h -> CASE WHEN (h // (CAST(1 AS BIGINT) << b)) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)), (a, x) -> a + x)"
}
