package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Two-level (coarse-cell + ball-bound pruning) EXACT top-`maxRank`
  * centroid search over a driver-built codebook — the per-row kernel
  * behind [[graft.ml.Embeddings.assignRanked]].
  *
  * Why: the flat assignment scores every vector against ALL k centroids
  * (`crossJoin(broadcast(cent))` + a vec_id window), and the corpus-scaled
  * quantizer grows k with n — an O(n·k) = O(n²/rowsPerCentroid) asymptote.
  * Here the k centroids are grouped into ~√k coarse cells (driver-side
  * spherical Lloyd's over k points — model-sized work); per row the
  * kernel scores the √k coarse directions, walks cells in descending
  * optimistic-bound order, and STOPS when a cell's best possible cosine
  * cannot beat the current rank-`maxRank` candidate — per-row work
  * ~2√k·dims instead of k·dims, and the whole ranking is a map-only
  * codegen'd projection (the flat path also paid a full-corpus shuffle
  * for its `row_number` window).
  *
  * EXACTNESS, not best-effort: for unit directions, the angle triangle
  * inequality gives θ(x,c) ≥ θ(x,g_j) − r_j for every member c of cell j
  * (r_j = the cell's angular radius), so
  * `cos(max(0, θ(x,g_j) − r_j))` bounds any member's cosine from above;
  * a cell is skipped only when that bound + [[CentroidIndex.Eps]] still
  * loses to the already-kept rank-`maxRank` cosine. The slack absorbs
  * acos/cos rounding (worst ~1e-8 near θ=0), so a probe can be wasted
  * but never wrongly skipped — the result equals the flat rule's
  * bit-for-bit, which the DuckDB oracle and the SimilaritySpec
  * flat-vs-indexed parity property pin.
  *
  * Determinism/parity rules (shared with the flat path — THE tie-break
  * home stays [[graft.ml.Embeddings.assignRanked]]'s scaladoc):
  *   - candidate cosine = [[NativeOps.cosine]]'s exact fold order over
  *     the row's floats vs the centroid's floats;
  *   - ordering (ccos DESC, cid ASC) with Spark's sort semantics: NaN
  *     sorts greatest, −0.0 normalized to 0.0;
  *   - zero-norm rows (cosine NaN against everything) and zero-norm
  *     centroids fall back to the flat scan — the geometry is undefined
  *     there, the rule still total.
  */
final class CentroidIndex private (
    val cids: Array[Long],
    val vecs: Array[Array[Float]],
    val maxRank: Int,
    // coarse structure (empty when flat fallback): unit cell directions,
    // member index lists, angular radii
    cellDirs: Array[Array[Double]],
    cellMembers: Array[Array[Int]],
    cellRadius: Array[Double],
    // centroids with zero norm: geometry undefined, always probed
    oddballs: Array[Int]) extends Serializable {

  import CentroidIndex.Eps

  private def k: Int = vecs.length
  private def outN: Int = math.min(maxRank, k)

  /** Top-`maxRank` (cid, ccos) of the row vector `x`, ranked
    * (ccos DESC, cid ASC) — rank r is element r−1. */
  def topK(x: ArrayData): ArrayData = {
    val n = x.numElements()
    val xd = new Array[Double](n)
    var nx = 0.0
    var i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble
      xd(i) = v; nx += v * v
      i += 1
    }
    val keepCos = new Array[Double](outN)
    val keepCid = new Array[Long](outN)
    var kept = 0

    def insert(ci: Int): Unit = {
      var c = CentroidIndex.cosineVs(x, vecs(ci))
      if (c == 0.0) c = 0.0 // normalize -0.0 like Spark's sort does
      val cid = cids(ci)
      // (c, cid) beats (keepCos(p), keepCid(p))? NaN sorts greatest,
      // Double.compare(NaN, NaN) == 0 so NaN ties break by cid
      var p = kept
      while (p > 0 && {
        val cmp = java.lang.Double.compare(c, keepCos(p - 1))
        cmp > 0 || (cmp == 0 && cid < keepCid(p - 1))
      }) p -= 1
      if (p < outN) {
        val last = math.min(kept, outN - 1)
        var q = last
        while (q > p) {
          keepCos(q) = keepCos(q - 1); keepCid(q) = keepCid(q - 1)
          q -= 1
        }
        keepCos(p) = c; keepCid(p) = cid
        if (kept < outN) kept += 1
      }
    }

    if (cellDirs.length == 0 || nx == 0.0) {
      // flat fallback: tiny codebook, or undefined geometry (zero row)
      var ci = 0
      while (ci < k) { insert(ci); ci += 1 }
    } else {
      val inx = 1.0 / math.sqrt(nx)
      // probe the always-probed oddballs first (no bound exists for them)
      var oi = 0
      while (oi < oddballs.length) { insert(oddballs(oi)); oi += 1 }
      // angle to every coarse cell, then walk cells nearest-first
      val nc = cellDirs.length
      val theta = new Array[Double](nc)
      val order = new Array[Integer](nc)
      var j = 0
      while (j < nc) {
        val g = cellDirs(j)
        var dot = 0.0
        var d = 0
        val lim = math.min(n, g.length)
        while (d < lim) { dot += xd(d) * inx * g(d); d += 1 }
        theta(j) = math.acos(math.max(-1.0, math.min(1.0, dot)))
        order(j) = j
        j += 1
      }
      java.util.Arrays.sort(order, (a: Integer, b: Integer) =>
        java.lang.Double.compare(theta(a), theta(b)))
      var oj = 0
      var done = false
      while (oj < nc && !done) {
        val cell = order(oj).intValue()
        val bound = math.cos(math.max(0.0, theta(cell) - cellRadius(cell)))
        if (kept == outN && !(bound + Eps >= keepCos(kept - 1)))
          done = true // cells are bound-ordered: all later cells lose too
        else {
          val ms = cellMembers(cell)
          var m = 0
          while (m < ms.length) { insert(ms(m)); m += 1 }
        }
        oj += 1
      }
    }
    val out = new Array[Any](kept)
    var r = 0
    while (r < kept) {
      out(r) = InternalRow(keepCid(r), keepCos(r))
      r += 1
    }
    new GenericArrayData(out)
  }
}

object CentroidIndex {
  /** Pruning slack on the cosine bound: larger than any acos/cos
    * rounding (worst ~1e-8 for angles near 0), smaller than anything
    * that would cost measurable extra probes. */
  final val Eps = 1e-6

  /** Codebooks at or under this size skip the coarse structure: the flat
    * scan is already ~one cache line of work and the coarse overhead
    * (√k directions scored per row) wouldn't pay for itself. */
  final val FlatMax = 64

  /** Exactly [[NativeOps.cosine]]'s arithmetic with the codebook side as
    * a plain float array: same fold order, same double accumulation, so
    * the scores are bit-identical to `graft_cosine(embedding, cv)`. */
  def cosineVs(a: ArrayData, b: Array[Float]): Double = {
    val n = a.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b(i).toDouble; i += 1 }
    i = 0
    while (i < n) { val v = a.getFloat(i).toDouble; nx += v * v; i += 1 }
    i = 0
    while (i < n) { val v = b(i).toDouble; ny += v * v; i += 1 }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** Build the two-level index over a driver-collected codebook. Cost is
    * O(k·√k) driver work on model-sized state (the codebook is k·dims by
    * design); the coarse structure only steers PROBE ORDER and pruning —
    * every returned rank comes from [[NativeOps.cosine]]-exact scoring,
    * so a poor coarse split costs probes, never correctness. */
  def build(cids: Array[Long], vecs: Array[Array[Float]],
      maxRank: Int): CentroidIndex = {
    require(cids.length == vecs.length, "cids/vecs length mismatch")
    require(maxRank > 0, s"maxRank=$maxRank")
    require(cids.distinct.length == cids.length,
      "codebook has duplicate cids — the rank rule needs distinct ids")
    val k = vecs.length
    if (k <= FlatMax)
      return new CentroidIndex(cids, vecs, maxRank,
        Array.empty, Array.empty, Array.empty, Array.empty)
    // unit directions; zero-norm centroids have no direction -> oddballs
    val dirs = new Array[Array[Double]](k)
    val odd = scala.collection.mutable.ArrayBuffer[Int]()
    val regular = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < k) {
      val v = vecs(i)
      var s = 0.0
      var d = 0
      while (d < v.length) { s += v(d).toDouble * v(d).toDouble; d += 1 }
      if (s == 0.0) odd += i
      else {
        val inv = 1.0 / math.sqrt(s)
        dirs(i) = Array.tabulate(v.length)(j => v(j).toDouble * inv)
        regular += i
      }
      i += 1
    }
    val reg = regular.toArray
    val nc = math.max(1, math.ceil(math.sqrt(reg.length.toDouble)).toInt)
    // spherical Lloyd's on the k points, seeded with the first nc
    // regular centroids in codebook order — deterministic double
    // arithmetic; affects probe efficiency only
    var seeds = Array.tabulate(nc)(j => dirs(reg(j)).clone())
    var assign = new Array[Int](reg.length)
    for (_ <- 0 until 5) {
      var ri = 0
      while (ri < reg.length) {
        val x = dirs(reg(ri))
        var best = 0; var bestDot = -2.0
        var j = 0
        while (j < nc) {
          val g = seeds(j)
          var dot = 0.0
          var d = 0
          while (d < x.length) { dot += x(d) * g(d); d += 1 }
          if (dot > bestDot) { bestDot = dot; best = j }
          j += 1
        }
        assign(ri) = best
        ri += 1
      }
      seeds = Array.tabulate(nc) { j =>
        val mine = reg.indices.filter(assign(_) == j)
        if (mine.isEmpty) seeds(j)
        else {
          val dimN = seeds(j).length
          val mean = new Array[Double](dimN)
          mine.foreach { ri =>
            val x = dirs(reg(ri))
            var d = 0
            while (d < dimN) { mean(d) += x(d); d += 1 }
          }
          val norm = math.sqrt(mean.map(v => v * v).sum)
          if (norm == 0.0) seeds(j) else mean.map(_ / norm)
        }
      }
    }
    val members = Array.fill(nc)(scala.collection.mutable.ArrayBuffer[Int]())
    reg.indices.foreach(ri => members(assign(ri)) += reg(ri))
    val occupied = (0 until nc).filter(members(_).nonEmpty)
    val cellDirs = occupied.map(seeds(_)).toArray
    val cellMembers = occupied.map(members(_).toArray).toArray
    val cellRadius = occupied.map { j =>
      val g = seeds(j)
      members(j).map { ci =>
        val x = dirs(ci)
        var dot = 0.0
        var d = 0
        while (d < x.length) { dot += x(d) * g(d); d += 1 }
        math.acos(math.max(-1.0, math.min(1.0, dot)))
      }.max
    }.toArray
    new CentroidIndex(cids, vecs, maxRank,
      cellDirs, cellMembers, cellRadius, odd.toArray)
  }
}

/** `Array<Float>` row vector -> `Array<Struct<cid: Long, ccos: Double>>`
  * of the row's top-`index.maxRank` centroids, ranked (ccos DESC, cid
  * ASC) — rank = array position + 1. Codegen'd as one reference-object
  * call so the surrounding projection stays inside whole-stage codegen;
  * the index (k·dims model state) ships to executors once per task via
  * the reference-object channel, like a broadcast. */
case class TopCentroids(child: Expression, index: CentroidIndex)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("cid", LongType, nullable = false),
      StructField("ccos", DoubleType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(input: Any): Any =
    index.topK(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("centroidIndex", index,
      classOf[CentroidIndex].getName)
    defineCodeGen(ctx, ev, c => s"$idx.topK($c)")
  }
  override protected def withNewChildInternal(c: Expression): TopCentroids =
    copy(child = c)
}
