package graft.functions

/** Dual-dialect vector expression builders (see [[PortableText]] for the
  * portability rationale). Dot products and norms fold sequentially
  * left-to-right in DOUBLE in both engines, so results are bit-identical —
  * no engine-native vectorized sum whose accumulation order differs.
  */
object PortableVec {

  /** Sequential-fold dot product of two float-array expressions. */
  def dotSpark(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
  def dotDuck(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)"

  /** Sequential-fold L2 norm. */
  def normSpark(a: String): String =
    s"sqrt(aggregate(transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
  def normDuck(a: String): String =
    s"sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (x, y) -> x + y))"

  /** Cosine similarity; identical operation order both sides. */
  def cosineSpark(a: String, b: String): String =
    s"(${dotSpark(a, b)} / (${normSpark(a)} * ${normSpark(b)}))"
  def cosineDuck(a: String, b: String): String =
    s"(${dotDuck(a, b)} / (${normDuck(a)} * ${normDuck(b)}))"

  /** Deterministic pseudo-random hyperplane weight for plane j, dim i
    * (LCG over the pair index, centered): integer arithmetic identical in
    * both engines. */
  private def weight(j: String, i: String): String =
    s"CAST(((CAST(1103515245 AS BIGINT) * (CAST($j AS BIGINT) * 257 + CAST($i AS BIGINT)) + 12345) % 1000003) - 501001 AS DOUBLE)"

  /** Signed-random-projection LSH bucket id (8 hyperplanes -> 0..255) of a
    * 64-dim float-array expression. */
  def lshBucketSpark(v: String): String =
    s"aggregate(sequence(0, 7), 0L, (acc, j) -> acc + IF(aggregate(sequence(1, 64), CAST(0 AS DOUBLE), (s, i) -> s + ${weight("j", "i")} * CAST(element_at($v, i) AS DOUBLE)) >= CAST(0 AS DOUBLE), shiftleft(1L, j), 0L))"
  /** 40-plane signed-random-projection signature (DuckDB side of
    * `graft.functions.LshSig(v, 40)` — same per-plane rule as the
    * 8-plane bucket, so the bucket is the sig's low byte). */
  def lshSigDuck(v: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 40), j -> CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> ${weight("j", "i")} * CAST($v[i] AS DOUBLE))), (x, y) -> x + y) >= CAST(0 AS DOUBLE) THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)), (a, x) -> a + x)"

  def lshBucketDuck(v: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 8), j -> CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> ${weight("j", "i")} * CAST($v[i] AS DOUBLE))), (x, y) -> x + y) >= CAST(0 AS DOUBLE) THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)), (a, x) -> a + x)"
}
