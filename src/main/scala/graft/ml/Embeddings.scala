package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-analytics training loops over an embeddings frame
  * (`vec_id: BIGINT, embedding: ARRAY<FLOAT>`): the multi-iteration
  * drivers behind the registry's single-step, oracle-checked operators
  * (`emb_kmeans_iter`, `emb_pca_power` in
  * [[graft.queries.PipelineQueries]]).
  *
  * Scale design: each iteration is a constant number of Spark jobs whose
  * shuffles carry only per-partition partial sums (dims·k scalars), never
  * vectors. The only driver-side state is the MODEL — a k·dims codebook
  * or one dims-long direction — whose size is independent of the corpus,
  * so collecting it between iterations is the scale-correct move (the
  * alternative, chaining lazy frames across iterations, grows the plan
  * lineage linearly with no smaller shuffle). The data itself never
  * leaves the executors.
  */
object Embeddings {

  /** `k` centroids after `iters` Lloyd's iterations, cosine assignment.
    * Seeds are the `k` lowest-`vec_id` vectors — deterministic, matching
    * the registry's `emb_kmeans_iter`/`ann_ivf` quantizer rule. Returns
    * (cid, cv, n_members); `n_members` is from the LAST assignment (an
    * emptied centroid keeps its previous position with n_members = 0).
    *
    * Per iteration: one k-row broadcast cross join (assignment, linear
    * scan) + one keyed aggregate of (cid, dim) partial sums; the k·dims
    * codebook is collected and re-broadcast, cutting lineage. */
  def kmeansFit(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, s"k=$k, iters=$iters")
    val s = emb.sparkSession
    graft.functions.native.register(s)
    val e = emb.select(col("vec_id"), col("embedding"))
    // seed codebook: k lowest ids (tiny: k rows through a TakeOrdered)
    var codebook: Array[(Long, Array[Float])] =
      e.orderBy("vec_id").limit(k).collect().map { r =>
        (r.getLong(0), floats(r, 1))
      }
    var members: Map[Long, Long] =
      codebook.map(c => c._1 -> 0L).toMap
    for (_ <- 0 until iters) {
      val means = assign(e, centFrame(s, codebook))
        .select(col("cid"), posexplode(col("embedding")).as(Seq("p", "x")))
        .groupBy("cid", "p")
        .agg(sum(col("x").cast(DoubleType)).as("sx"),
          count(lit(1)).as("n"))
        .collect()
      val byCid = means.groupBy(_.getLong(0))
      members = codebook.map { case (cid, _) =>
        cid -> byCid.get(cid).map(_.head.getLong(3)).getOrElse(0L)
      }.toMap
      codebook = codebook.map { case (cid, prev) =>
        byCid.get(cid) match {
          case Some(rows) =>
            val cv = prev.clone()
            rows.foreach { r =>
              cv(r.getInt(1)) = (r.getDouble(2) / r.getLong(3)).toFloat
            }
            (cid, cv)
          case None => (cid, prev) // emptied centroid: keep position
        }
      }
    }
    val out = codebook.map { case (cid, cv) =>
      Row(cid, cv.toSeq, members(cid))
    }
    s.createDataFrame(
      s.sparkContext.parallelize(out.toIndexedSeq, 1),
      StructType(Seq(
        StructField("cid", LongType),
        StructField("cv", ArrayType(FloatType)),
        StructField("n_members", LongType))))
  }

  /** Centroid ranking per vector (cosine, ties to the lower cid):
    * `crn` = 1 is the nearest centroid, `crn` ≤ nprobe the multi-probe
    * set. THE single home of the assignment tie-break rule —
    * [[assign]], `ann_ivf`, `emb_kmeans_iter`, and `d_semdedup` all
    * route through here, so the rule cannot silently fork between the
    * IVF lists and the dedup verdicts. `cent` must have (cid, cv),
    * distinct cids, and be model-sized (it is collected to the driver —
    * the same contract under which the flat path broadcast it).
    *
    * Implementation: the ranking is computed by
    * [[graft.functions.CentroidIndex]], an EXACT two-level search —
    * coarse cells over the codebook plus angle-triangle ball-bound
    * pruning, per-row work ~2√k·dims instead of the flat scan's k·dims
    * (the corpus-scaled quantizer grows k with n, so the flat rule was
    * an O(n²/rowsPerCentroid) asymptote). Exactness is by construction
    * (a cell is skipped only when it provably cannot beat the kept
    * rank-`maxRank` candidate), pinned against [[assignRankedFlat]] by
    * SimilaritySpec's parity property. Bonus over the flat path: the
    * ranking is a map-only codegen'd projection — no n·k-row shuffle
    * through a `row_number` window.
    *
    * Returns `emb`'s columns plus (cid, ccos, crn), `crn` = 1..maxRank
    * (at most k rows per vector). */
  def assignRanked(emb: DataFrame, cent: DataFrame,
      maxRank: Int = 8): DataFrame = {
    val cb = cent.select(col("cid").cast(LongType), col("cv")).collect()
    val index = graft.functions.CentroidIndex.build(
      cb.map(_.getLong(0)), cb.map(r => floats(r, 1)), maxRank)
    val topCol = graft.functions.native.parameterized(emb.sparkSession,
      es => graft.functions.TopCentroids(es.head, index),
      col("embedding"))
    val keep = emb.columns.map(c => col(s"`$c`"))
    // posexplode_OUTER, deliberately: for the non-outer form the
    // optimizer infers `isnotnull && size > 0` filters on the generator
    // input and pushes them through the projection, re-evaluating the
    // index search 3x per row (measured: 60k topK calls for 20k rows).
    // The outer form skips that rule, and the search never returns an
    // empty array for a non-null vector, so the semantics are identical
    // (a NULL vector yields one null-ranked row, like the flat path's
    // null-cosine rows).
    emb.withColumn("__top", topCol)
      .select(keep :+
        posexplode_outer(col("__top")).as(Seq("__p", "__c")): _*)
      .withColumn("cid", col("__c.cid"))
      .withColumn("ccos", col("__c.ccos"))
      .withColumn("crn", col("__p") + 1)
      .drop("__p", "__c")
  }

  /** The flat reference ranking — every centroid scored, ranked by a
    * `row_number` window: the definitional form of the rule
    * [[assignRanked]] must reproduce, kept as the parity oracle for
    * SimilaritySpec's flat-vs-indexed property (and for ad-hoc audits).
    * O(n·k) with a full shuffle; never on the production path. */
  def assignRankedFlat(emb: DataFrame, cent: DataFrame): DataFrame = {
    graft.functions.native.register(emb.sparkSession)
    val w = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("cid"))
    emb.crossJoin(broadcast(cent))
      .withColumn("ccos", expr("graft_cosine(embedding, cv)"))
      .withColumn("crn", row_number().over(w))
  }

  /** Nearest-centroid assignment (cosine, ties to the lower cid): the
    * reusable half of the Lloyd's step — also the IVF list-builder for
    * a trained codebook. `cent` must have (cid, cv). */
  def assign(emb: DataFrame, cent: DataFrame): DataFrame =
    assignRanked(emb, cent, maxRank = 1).drop("crn")

  /** Converged ranks + how the run ended: `rounds` actually executed,
    * `converged` = the integer rank vector reached its exact fixpoint
    * (one more iteration changes nothing) rather than the `maxIters`
    * cap. */
  final case class PageRank(ranks: DataFrame, rounds: Int,
      converged: Boolean)

  /** PageRank to CONVERGENCE over an edge list (two Long columns:
    * src, dst) — the library driver behind the registry's fixed-
    * 3-iteration `emb_pagerank` query (kept at 3 there so the oracle
    * stays chained-CTE-expressible): a fleet run wants the converged
    * ranks, not a fixed cut. Same integer-exact arithmetic as the
    * query, bit-for-bit at equal iteration counts (spec-pinned): rank
    * mass at scale 1e12 with floor division, teleport 15 %, damping
    * 85 %, per round ONE join of the edge list with the rank frame on
    * `src` and one keyed aggregate on `dst` — two linear shuffles.
    * Like [[graft.core.Graph.minLabelComponents]], every round
    * localCheckpoints (an iterative plan tree otherwise grows
    * exponentially) and convergence is a SCALAR signature, never a
    * collect: integer ranks under a contraction reach an exact
    * fixpoint, so Σ|Δpr| (exact, DECIMAL-summed) hitting 0 is a loud,
    * drift-free stop — `iters > 0` instead runs exactly that many
    * rounds (the oracle-parity mode). Nodes are the edge SOURCES
    * (the kNN graph has out-degree ≥ 1 everywhere); inbound mass to a
    * pure sink is dropped exactly as the query drops it. */
  def pagerankFit(edges0: DataFrame, iters: Int = 0,
      maxIters: Int = 100): PageRank = {
    val cols = edges0.columns
    require(cols.length >= 2, s"edges need (src, dst), got: $cols")
    val edges = edges0.select(col(cols(0)).cast(LongType).as("src"),
      col(cols(1)).cast(LongType).as("dst"))
      .localCheckpoint(true) // scanned every round
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val n = deg.count()
    require(n > 0, "pagerankFit needs a non-empty edge list")
    var pr = deg.select(col("src").as("vec_id"), col("deg"),
      lit(1000000000000L / n).as("pr")).localCheckpoint(true)
    def step(prev: DataFrame): DataFrame = {
      val inSum = edges
        .join(prev.select(col("vec_id").as("src"), col("deg"), col("pr")),
          "src")
        .groupBy(col("dst").as("vec_id"))
        .agg(sum(expr("pr div deg")).as("insum"))
      deg.select(col("src").as("vec_id"), col("deg"))
        .join(inSum, Seq("vec_id"), "left")
        .select(col("vec_id"), col("deg"),
          (lit(150000000000L / n) +
            expr("(85L * coalesce(insum, 0L)) div 100L")).as("pr"))
        .localCheckpoint(true)
    }
    var rounds = 0
    var converged = false
    while (rounds < (if (iters > 0) iters else maxIters) && !converged) {
      val next = step(pr)
      if (iters <= 0) {
        // exact integer fixpoint check: Σ|Δpr| in DECIMAL(38,0) — no
        // overflow at any (n, scale), no float drift
        val delta = next
          .join(pr.select(col("vec_id"), col("pr").as("__prev")),
            "vec_id")
          .agg(sum(abs(col("pr") - col("__prev"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))))
          .head.getDecimal(0)
        converged = delta == null || delta.signum() == 0
      }
      pr = next
      rounds += 1
    }
    PageRank(
      pr.select(col("vec_id"), col("deg").as("n_out"), col("pr")),
      rounds, converged)
  }

  /** Result of [[Embeddings.labelPropFit]]: the final label frame
    * (vec_id, label), the number of synchronous rounds run, and the
    * attractor's `period` — 1 = exact fixpoint (zero labels moved),
    * 2 = the run entered the two-state oscillation synchronous LPA is
    * known for on symmetric structures (Raghavan et al. §III; the
    * returned frame is the EVEN-phase state, deterministic because the
    * whole dynamics is), 0 = `maxIters` fired before either. A period-2
    * result is as converged as LPA gets: the pair alternates forever,
    * and re-running with the same round count (or +2k) reproduces the
    * same state bit-for-bit. */
  final case class LabelProp(labels: DataFrame, rounds: Int,
      period: Int) {
    def converged: Boolean = period > 0
  }

  /** Synchronous label propagation to CONVERGENCE over an edge list
    * (two Long columns: src, dst) and a vertex universe — the library
    * driver behind the registry's fixed-3-round `emb_label_prop` query
    * (kept at 3 there so the oracle stays chained-CTE-expressible); a
    * fleet run wants the converged communities, not a fixed cut. Same
    * deterministic semantics as the query, bit-for-bit at equal round
    * counts (spec-pinned): each vertex adopts the most frequent label
    * among its in-neighbors, ties to the LOWEST label, isolated
    * vertices keep their own. Per round: one join of the label frame
    * against the (checkpoint-pinned) edge list keyed on src, a
    * (dst, label) count, a per-vertex argmax as a (count, −label)
    * struct MAX (an aggregate, never a rank window), and a left join
    * back to the universe — four linear keyed shuffles. Every round
    * localCheckpoints (the iterative plan tree otherwise grows without
    * bound) and convergence is a SCALAR signature, never a collect: the
    * moved-label count vs the previous round hitting 0 is an exact
    * fixpoint (period 1), and the count vs TWO rounds back hitting 0 is
    * the period-2 oscillation synchronous LPA is known for on
    * symmetric/bipartite-like structures — both are terminal attractors
    * of the deterministic dynamics, so either stops the driver (labels
    * are integers; no drift in the signature). `iters > 0` instead runs
    * exactly that many rounds — the oracle-parity mode. `maxIters`
    * bounds longer cycles loudly via `period = 0` rather than
    * hanging. */
  def labelPropFit(edges0: DataFrame, universe0: DataFrame,
      iters: Int = 0, maxIters: Int = 100): LabelProp = {
    val ec = edges0.columns
    require(ec.length >= 2, s"edges need (src, dst), got: $ec")
    val edges = edges0.select(col(ec(0)).cast(LongType).as("src"),
      col(ec(1)).cast(LongType).as("dst"))
      .localCheckpoint(true) // scanned every round
    val universe = universe0
      .select(col(universe0.columns.head).cast(LongType).as("vec_id"))
      .localCheckpoint(true)
    var labels = universe.withColumn("label", col("vec_id"))
      .localCheckpoint(true)
    def step(prev: DataFrame): DataFrame = {
      val cnt = edges
        .join(prev.select(col("vec_id").as("src"), col("label")), "src")
        .groupBy(col("dst").as("vec_id"), col("label"))
        .agg(count(lit(1)).as("c"))
      val best = cnt.groupBy("vec_id")
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("vec_id"), (-col("m.nl")).as("newl"))
      prev.join(best, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("newl"), col("label")).as("label"))
        .localCheckpoint(true)
    }
    def movedVs(a: DataFrame, b: DataFrame): Long = a
      .join(b.select(col("vec_id"), col("label").as("__prev")), "vec_id")
      .filter(col("label") =!= col("__prev")).count()
    var rounds = 0
    var period = 0
    var prev: DataFrame = null // state two rounds back, once it exists
    while (rounds < (if (iters > 0) iters else maxIters) && period == 0) {
      val next = step(labels)
      if (iters <= 0) {
        if (movedVs(next, labels) == 0L) period = 1
        else if (prev != null && movedVs(next, prev) == 0L) period = 2
      }
      prev = labels
      labels = next
      rounds += 1
    }
    LabelProp(labels, rounds, period)
  }

  /** Top principal direction of the (uncentered) Gram matrix by power
    * iteration from the all-ones seed — the converged form of the
    * registry's `emb_pca_power` step. Returns (direction, eigenvalue
    * estimate): `direction` is L2-normalized, dims long;
    * `lambda` ≈ vᵀAᵀAv / vᵀv of the final iterate. Each iteration is one
    * linear job shuffling dims·partitions partial sums. */
  def pcaPower(emb: DataFrame, iters: Int): (Array[Double], Double) = {
    require(iters >= 1, s"iters=$iters")
    val s = emb.sparkSession
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    var v = Array.fill(dims)(1.0)
    var lambda = 0.0
    for (_ <- 0 until iters) {
      // w_d = sum_x x_d * (x . v): per-row dot in codegen, one keyed
      // shuffle of per-partition (dim, partial) sums
      val w = emb
        .withColumn("__v", array(v.map(lit): _*))
        .withColumn("dot", expr(
          "aggregate(zip_with(embedding, __v, (a, b) -> CAST(a AS DOUBLE) * b), 0.0D, (a, x) -> a + x)"))
        .select(col("dot"), posexplode(col("embedding")).as(Seq("p", "x")))
        .groupBy("p")
        .agg(sum(col("x").cast(DoubleType) * col("dot")).as("w"))
        .collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val wv = Array.tabulate(dims)(d => w.getOrElse(d, 0.0))
      val vNorm2 = math.sqrt(v.map(x => x * x).sum)
      // Rayleigh quotient on the pre-normalization iterate: v.w / v.v
      lambda = v.zip(wv).map { case (a, b) => a * b }.sum / (vNorm2 * vNorm2)
      val n = math.sqrt(wv.map(x => x * x).sum)
      v = if (n == 0.0) v else wv.map(_ / n)
    }
    (v, lambda)
  }

  /** Product-quantization codebooks (Jegou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): the space splits into
    * `m` subspaces of dims/m; each gets its own `ks` centroids trained
    * by per-subspace Lloyd's under subspace L2 — the PQ objective.
    * Seeds are the `ks` lowest-`vec_id` vectors' sub-slices, so
    * `iters = 0` reproduces the registry's deterministic `ann_pq`
    * codebooks. ONE assignment+update job per iteration covers all m
    * subspaces (keyed partial sums over (sub, code, dim-in-sub)); the
    * only driver state is the dims·ks floats of the codebooks.
    * Returns (sub, code, scv, n_members) — `code` 0-based; an emptied
    * code keeps its previous position with n_members = 0. */
  def pqFit(emb: DataFrame, m: Int, ks: Int, iters: Int): DataFrame = {
    require(m > 0 && ks > 0 && iters >= 0, s"m=$m ks=$ks iters=$iters")
    val s = emb.sparkSession
    val e = emb.select(col("vec_id"), col("embedding"))
    val dims = e.select(size(col("embedding"))).head().getInt(0)
    require(dims % m == 0, s"m=$m must divide dims=$dims")
    val sub = dims / m
    val seeds = e.orderBy("vec_id").limit(ks).collect().map(r => floats(r, 1))
    require(seeds.length == ks,
      s"corpus has only ${seeds.length} vectors < ks=$ks seeds")
    var cb: Array[Array[Array[Float]]] =
      Array.tabulate(m, ks)((si, c) => seeds(c).slice(si * sub, (si + 1) * sub))
    var members: Array[Array[Long]] = Array.fill(m, ks)(0L)
    for (_ <- 0 until iters) {
      val stats = pqEncode(e, cb, withNorm = false)
        .select(col("embedding").as("v"),
          posexplode(col("code")).as(Seq("si", "c1")))
        .select(col("si"), (col("c1") - 1).cast(IntegerType).as("c"),
          posexplode(expr(s"slice(v, si * $sub + 1, $sub)")).as(Seq("j", "x")))
        .groupBy("si", "c", "j")
        .agg(sum(col("x").cast(DoubleType)).as("sx"), count(lit(1)).as("n"))
        .collect()
      members = Array.fill(m, ks)(0L)
      val next = cb.map(_.map(_.clone()))
      stats.groupBy(r => (r.getInt(0), r.getInt(1))).foreach {
        case ((si, c), rows) =>
          members(si)(c) = rows.head.getLong(4)
          rows.foreach { r =>
            next(si)(c)(r.getInt(2)) = (r.getDouble(3) / r.getLong(4)).toFloat
          }
      }
      cb = next
    }
    val out = for {
      si <- cb.indices
      c <- cb(si).indices
    } yield Row(si, c, cb(si)(c).toSeq, members(si)(c))
    s.createDataFrame(
      s.sparkContext.parallelize(out.toIndexedSeq, 1),
      StructType(Seq(
        StructField("sub", IntegerType),
        StructField("code", IntegerType),
        StructField("scv", ArrayType(FloatType)),
        StructField("n_members", LongType))))
  }

  /** PQ-encode `emb` against per-subspace codebooks: adds `code` (one
    * 1-based entry per subspace — `array_position` takes the FIRST
    * minimum under subspace L2, ties to the lower code) and, with
    * `withNorm`, `rnorm` (the reconstruction's L2 norm — subspace
    * norms add, so it needs only codebook lookups). Map-only against
    * the broadcast-literal codebooks; all arithmetic is fixed-order
    * double folds, reproducing the registry `ann_pq` rule. */
  private[ml] def pqEncode(emb: DataFrame, cb: Array[Array[Array[Float]]],
      withNorm: Boolean = true): DataFrame = {
    val codec = new graft.functions.PqCodec(cb, withNorm)
    val enc = graft.functions.native.parameterized(emb.sparkSession,
      es => graft.functions.PqEncodeExpr(es.head, codec), col("embedding"))
    // ONE evaluation per row via a Generate — projecting the struct's
    // fields directly would let CollapseProject duplicate the encode
    // per extracted field (the same optimizer trap assignRanked
    // sidesteps with its posexplode)
    val keep = emb.columns.map(c => col(s"`$c`"))
    val exploded = emb.select(keep :+
      explode(array(enc)).as("__pq"): _*)
    val out = exploded.withColumn("code", col("__pq.code"))
    (if (withNorm) out.withColumn("rnorm", col("__pq.rnorm")) else out)
      .drop("__pq")
  }

  // ------------------------------------------------------------- helpers

  private def floats(r: Row, i: Int): Array[Float] =
    r.getSeq[Float](i).toArray

  private def centFrame(s: org.apache.spark.sql.SparkSession,
      codebook: Array[(Long, Array[Float])]): DataFrame =
    s.createDataFrame(
      s.sparkContext.parallelize(
        codebook.map { case (cid, cv) => Row(cid, cv.toSeq) }.toIndexedSeq,
        1),
      StructType(Seq(
        StructField("cid", LongType),
        StructField("cv", ArrayType(FloatType)))))
}
