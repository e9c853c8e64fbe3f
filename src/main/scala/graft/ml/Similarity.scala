package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.util.StoreState

/** Parameterized similarity search over an embeddings frame
  * (`vec_id: BIGINT, embedding: ARRAY<FLOAT>`) — the library form of the
  * registry's fixed-table demos (`ann_bruteforce`, `ann_ivf` in
  * [[graft.queries.PipelineQueries]]), accepting any query set and, for
  * IVF, any trained codebook (e.g. [[Embeddings.kmeansFit]]'s output).
  *
  * Scale shape: the query set and the codebook broadcast (both are
  * model-sized, independent of the corpus); the corpus only ever flows
  * through linear scans, bucket equi-joins, and rank windows whose
  * keep-k filters plan with map-side `WindowGroupLimit`. */
object Similarity {

  /** Exact cosine top-k per query — the O(corpus · queries) baseline.
    * `queries` needs (q_id, q_emb); broadcast, so keep it model-sized
    * (use it to calibrate the approximate paths' recall). */
  def bruteForce(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k=$k")
    graft.functions.native.register(emb.sparkSession)
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    emb.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(queries.select(col("q_id"), col("q_emb"))))
      .withColumn("cos", expr("graft_cosine(q_emb, embedding)"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "vec_id", "cos")
  }

  /** IVF approximate top-k with a trained codebook (`cid`, `cv` — e.g.
    * from [[Embeddings.kmeansFit]]): the corpus is bucketed into
    * inverted lists by nearest centroid, each query probes its `nprobe`
    * closest lists, and only those lists are scored — the probed
    * fraction of the corpus replaces the full scan. */
  def ivfSearch(emb: DataFrame, queries: DataFrame, codebook: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    require(k > 0 && nprobe > 0, s"k=$k, nprobe=$nprobe")
    graft.functions.native.register(emb.sparkSession)
    val lists = Embeddings.assign(
      emb.select(col("vec_id"), col("embedding")), codebook)
      .select(col("vec_id"), col("embedding"), col("cid"))
    // probe lists via the same exact two-level ranking the corpus side
    // uses — identical (cos desc, cid) rule, ~2√k scores per query
    val probes = Embeddings.assignRanked(
      queries.select(col("q_id").as("vec_id"), col("q_emb").as("embedding")),
      codebook, maxRank = nprobe)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("cid"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    lists.join(broadcast(probes), Seq("cid"))
      .withColumn("cos", expr("graft_cosine(q_emb, embedding)"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "vec_id", "cos")
  }

  // --------------------------------------------------- persisted index

  /** A persisted IVF index on disk: `codebook.parquet` (k rows of
    * cid, cv) + `lists.parquet`, the corpus assigned to inverted lists
    * and stored RANGE-CLUSTERED by cid, so each parquet file/row-group
    * covers a narrow cid band. Probing then reads only the probed
    * lists' bytes: the cid IN (...) predicate pushes into the scan and
    * min/max stats prune every other row group — a fleet builds the
    * index once and amortizes it across query batches without
    * re-deriving assignments. */
  final case class IvfIndex(dir: String, codebook: DataFrame,
      lists: DataFrame)

  // ------------------------------------------- generation-store layout
  //
  // Every persisted store (IVF / PQ / IVF-PQ / text) keeps its state
  // under generation directories with commit markers
  // ([[graft.util.StoreState]]): builds, retrains, and compactions
  // stage a COMPLETE new `gen-N/` file set and commit it with one
  // atomic marker create, so a reader resolves a complete index at
  // every instant — there is no delete-then-rename window, and a crash
  // mid-maintenance leaves either the old or the new generation, never
  // a third state. Mutating ops run under the store's single-writer
  // lock (`_LOCK`); a second concurrent writer fails loudly. Legacy
  // flat-layout stores (files directly under the root) stay readable;
  // the first maintenance op migrates them into a generation.

  /** Flat-layout file names a generation commit garbage-collects when
    * migrating a legacy store (superset across all four store types —
    * only names that exist are touched). `drift.json` is NOT listed:
    * telemetry lives at the store root across generations. */
  private val LegacyFlat = Seq(
    "codebook.parquet", "pq_codebook.parquet", "lists.parquet",
    "codes.parquet", "meta.json", "tombstones.parquet",
    "postings.parquet", "df.parquet", "textstats.parquet",
    "docstats.parquet", "doc_tombstones.parquet",
    "lists.parquet.compact", "lists.parquet.retrain",
    "codes.parquet.compact", "postings.parquet.compact",
    "docstats.parquet.compact", "df.parquet.compact",
    "textstats.parquet.compact")

  /** The directory a reader currently resolves the store's data files
    * from: the highest committed generation, or the store root for a
    * legacy flat-layout store. Exposed for tests and ops tooling. */
  def storeDataDir(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = StoreState.dataDir(spark, dir)

  /** Byte-copy a small file/dir (codebooks, meta.json) into a staged
    * generation through the Hadoop FS — exact and FS-agnostic. */
  private def copyInto(spark: org.apache.spark.sql.SparkSession,
      src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Unit = {
    val f = fs(spark, src)
    if (f.exists(src))
      org.apache.hadoop.fs.FileUtil.copy(f, src, f, dst, false,
        spark.sparkContext.hadoopConfiguration)
  }

  /** The readable paths of one data-file family inside a generation
    * (or legacy flat) dir: the direct file (builds and compactions
    * write one) plus every COMMITTED batch dir's copy (appends write
    * those — each batch publishes with one atomic marker create, so a
    * crashed append is invisible garbage, never a partial read). */
  private def storePaths(spark: org.apache.spark.sql.SparkSession,
      dataDir: String, name: String): Seq[String] = {
    val direct = new org.apache.hadoop.fs.Path(dataDir, name)
    val f = fs(spark, direct)
    val all = (if (f.exists(direct)) Seq(direct) else Seq.empty) ++
      StoreState.committedBatches(spark, dataDir)
        .map(b => new org.apache.hadoop.fs.Path(b, name))
        .filter(f.exists)
    require(all.nonEmpty,
      s"$dataDir has no committed $name — not a graft index store " +
        "(or an interrupted build that never committed; rebuild it)")
    all.map(_.toString)
  }

  /** Union-read one data-file family across the direct file and all
    * committed batch dirs. Parquet pushdown (cid/t IN-lists, column
    * pruning) applies per file regardless of which path it came from. */
  private def readStore(spark: org.apache.spark.sql.SparkSession,
      dataDir: String, name: String): DataFrame =
    spark.read.parquet(storePaths(spark, dataDir, name): _*)

  /** Assign the corpus and persist the index under `dir`. One
    * assignment pass (map-only indexed search) + one range shuffle on
    * cid; the codebook is model-sized and lands as a single file.
    * The stored lists keep each vector's assignment cosine (`ccos`,
    * 8 B/row next to a 256 B embedding) — the raw material for the
    * index's drift telemetry ([[driftStats]]); the build-time mean is
    * recorded in `drift.json` from ONE pruned scan of the stored
    * column. The new file set stages under a fresh generation and
    * publishes with one atomic marker create — a rebuild over a live
    * store never exposes a partial index. */
  def writeIndex(emb: DataFrame, codebook: DataFrame, dir: String): Unit =
    StoreState.withLock(emb.sparkSession, dir, "writeIndex") {
      val s = emb.sparkSession
      graft.functions.native.register(s)
      val gen = StoreState.nextGenPath(s, dir)
      codebook.select(col("cid").cast(LongType), col("cv"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$gen/codebook.parquet")
      Embeddings.assign(emb.select(col("vec_id"), col("embedding")), codebook)
        .select(col("cid"), col("vec_id"), col("embedding"), col("ccos"))
        .repartitionByRange(col("cid"))
        .sortWithinPartitions("cid")
        .write.mode("overwrite").parquet(s"$gen/lists.parquet")
      StoreState.commitGen(s, dir, gen, LegacyFlat)
      writeBuildDrift(s, dir, s"$gen/lists.parquet")
    }

  /** Reopen a persisted index (metadata only — no data read): the
    * lists union the build/compaction's direct file with every
    * committed append batch's file (cid pruning applies per file). */
  def openIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): IvfIndex = {
    val d = StoreState.dataDir(spark, dir)
    IvfIndex(dir,
      spark.read.parquet(s"$d/codebook.parquet"),
      readStore(spark, d, "lists.parquet"))
  }

  // ------------------------------------------------- drift telemetry

  /** Codebook-staleness telemetry for a persisted IVF / IVF-PQ index.
    *
    * [[appendIndex]]/[[appendIvfPqIndex]] are rebuild-equivalent for
    * RESULTS (spec-pinned), but the codebook is frozen at build time: as
    * the corpus distribution shifts, appended vectors sit farther from
    * their nearest centroid, lists imbalance, and recall decays for the
    * same nprobe. The cheap leading indicator is the mean assignment
    * cosine: `drift` = build-time mean − appended-batches mean. Near 0
    * (or negative) means the stream still matches the build
    * distribution; a persistently positive and growing value says the
    * frozen centroids describe the new data poorly — time to retrain
    * (writeIndex again). Thresholds are deployment-specific; the metric
    * is intentionally raw. */
  final case class DriftStats(builtN: Long, builtMeanCos: Double,
      appendedN: Long, appendedMeanCos: Double) {
    def drift: Double =
      if (appendedN == 0L) 0.0 else builtMeanCos - appendedMeanCos
  }

  private def driftPath(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "drift.json")

  private def fs(spark: org.apache.spark.sql.SparkSession,
      p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeDriftJson(spark: org.apache.spark.sql.SparkSession,
      dir: String, bn: Long, bs: Double, an: Long, as: Double): Unit = {
    val p = driftPath(dir)
    val out = fs(spark, p).create(p, true)
    try out.write(
      (s"""{"built_n": $bn, "built_sum_cos": $bs, """ +
        s""""append_n": $an, "append_sum_cos": $as}""").getBytes("UTF-8"))
    finally out.close()
  }

  private def readDriftJson(spark: org.apache.spark.sql.SparkSession,
      dir: String): Option[(Long, Double, Long, Double)] = {
    val p = driftPath(dir)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val txt =
        try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        finally in.close()
      def num(key: String): Double = {
        val m = s""""$key":\\s*(-?[0-9.eE+-]+)""".r.findFirstMatchIn(txt)
        m.map(_.group(1).toDouble).getOrElse(
          sys.error(s"drift.json is malformed: missing $key in $txt"))
      }
      Some((num("built_n").toLong, num("built_sum_cos"),
        num("append_n").toLong, num("append_sum_cos")))
    }
  }

  // ---------------------------------------------------------- deletes

  /** Tombstone storage for all three persisted index types: a
    * `tombstones.parquet` dir of deleted vec_ids next to the data files
    * INSIDE the current generation — so a compaction's atomic
    * generation flip folds the data rewrite and the tombstone drop into
    * one commit point. A delete appends one model-sized-or-less file
    * (O(delete batch), no data rewrite — the takedown/purge/TTL path
    * must not cost a corpus pass); every search anti-joins the scan
    * against it (the tombstone side is stats-sized in the planner, so a
    * small set broadcasts on its own file-size estimate — no hint, no
    * 8 GiB hazard); compaction folds the tombstones into the data files
    * and removes them. */
  private def tombstonesPath(spark: org.apache.spark.sql.SparkSession,
      dir: String) =
    new org.apache.hadoop.fs.Path(
      StoreState.dataDir(spark, dir), "tombstones.parquet")

  private def readTombstones(spark: org.apache.spark.sql.SparkSession,
      dir: String): Option[DataFrame] = {
    val p = tombstonesPath(spark, dir)
    if (fs(spark, p).exists(p)) Some(spark.read.parquet(p.toString))
    else None
  }

  /** The live rows of a stored scan: anti-join pending tombstones (a
    * no-op scan-through when none exist). Applied by every *SearchIndex
    * BEFORE ranking, so a deleted vector can never crowd a survivor out
    * of the top-k — parity with rebuild-without-deleted is exact. */
  private def minusTombstones(data: DataFrame,
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    readTombstones(spark, dir)
      .map(t => data.join(t.select(col("vec_id")), Seq("vec_id"),
        "left_anti"))
      .getOrElse(data)

  /** Append a batch of vec_ids to the store's CURRENT generation's
    * tombstone set. */
  private def writeTombstones(ids: DataFrame, dir: String): Unit =
    ids.select(col("vec_id").cast(LongType)).distinct()
      .coalesce(1)
      .write.mode("append")
      .parquet(tombstonesPath(ids.sparkSession, dir).toString)

  /** True if the index dir has pending tombstones — compaction no-ops
    * without them. */
  def pendingDeletes(spark: org.apache.spark.sql.SparkSession,
      dir: String): Boolean =
    fs(spark, tombstonesPath(spark, dir)).exists(tombstonesPath(spark, dir))

  /** Compact a vector store: stage the survivor rewrite plus verbatim
    * copies of its model-sized sidecar files (codebooks, meta.json)
    * under a fresh generation and publish with one atomic marker
    * create — the store resolves to a complete index at every instant,
    * and the tombstone drop rides the same commit (the old
    * generation's tombstones die with its GC; a crash at ANY step
    * leaves either the fully-tombstoned old state or the fully-folded
    * new one). `probe` fires between every filesystem mutation — the
    * openable-at-every-instant spec hook. */
  private def compactVecStaged(spark: org.apache.spark.sql.SparkSession,
      dir: String, op: String, sidecars: Seq[String], dataName: String,
      rewrite: (DataFrame, String) => Unit, probe: () => Unit): Unit =
    StoreState.withLock(spark, dir, op) {
      val cur = StoreState.dataDir(spark, dir)
      val needs = pendingDeletes(spark, dir) ||
        StoreState.committedBatches(spark, cur).nonEmpty ||
        StoreState.uncommittedCruft(spark, cur).nonEmpty
      if (needs) {
        val gen = StoreState.nextGenPath(spark, dir)
        rewrite(minusTombstones(
          readStore(spark, cur, dataName), spark, dir),
          s"$gen/$dataName")
        probe()
        sidecars.foreach { n =>
          copyInto(spark, new org.apache.hadoop.fs.Path(s"$cur/$n"),
            new org.apache.hadoop.fs.Path(s"$gen/$n"))
          probe()
        }
        StoreState.commitGen(spark, dir, gen, LegacyFlat)
        probe()
      }
    }

  /** Build-time stats from ONE scan of the freshly written lists/codes
    * (pruned to the 8 B/row `ccos` column). */
  private def writeBuildDrift(spark: org.apache.spark.sql.SparkSession,
      dir: String, dataPath: String): Unit = {
    val r = spark.read.parquet(dataPath)
      .agg(count(lit(1)), sum(col("ccos"))).head()
    writeDriftJson(spark, dir, r.getLong(0),
      if (r.isNullAt(1)) 0.0 else r.getDouble(1), 0L, 0.0)
  }

  /** Accumulate an appended batch's stats into drift.json. Tolerates a
    * pre-telemetry index (no drift.json): the append itself stays
    * valid, telemetry just stays absent. */
  private def recordAppendDrift(spark: org.apache.spark.sql.SparkSession,
      dir: String, batch: DataFrame): Unit =
    readDriftJson(spark, dir).foreach { case (bn, bs, an, as) =>
      val r = batch.agg(count(lit(1)), sum(col("ccos"))).head()
      writeDriftJson(spark, dir, bn, bs, an + r.getLong(0),
        as + (if (r.isNullAt(1)) 0.0 else r.getDouble(1)))
    }

  /** Read a persisted index's drift telemetry (works for IVF and
    * IVF-PQ index dirs — both record assignment cosines). */
  def driftStats(spark: org.apache.spark.sql.SparkSession,
      dir: String): DriftStats = {
    val (bn, bs, an, as) = readDriftJson(spark, dir).getOrElse(
      sys.error(s"$dir/drift.json missing: index predates drift " +
        "telemetry — rebuild with writeIndex/writeIvfPqIndex"))
    DriftStats(bn, if (bn == 0L) 0.0 else bs / bn,
      an, if (an == 0L) 0.0 else as / an)
  }

  /** Append a new vector batch to a persisted IVF index WITHOUT
    * rebuilding: only the new batch is assigned (against the stored
    * codebook — same rule, same tie-breaks) and lands as additional
    * range-clustered files, so the ingest cost is proportional to the
    * batch, not the corpus. Searching the reopened index is identical
    * to an index built over the union in one shot (spec-pinned): the
    * assignment depends only on the codebook, the probe predicate
    * prunes per file, and rank ties break by vec_id. The codebook
    * itself is NOT retrained — a drifting corpus eventually warrants a
    * rebuild, which is the same writeIndex call. */
  def appendIndex(index: IvfIndex, emb: DataFrame): IvfIndex = {
    val s = emb.sparkSession
    graft.functions.native.register(s)
    StoreState.withLock(s, index.dir, "appendIndex") {
      val d = StoreState.dataDir(s, index.dir)
      val batch = StoreState.nextBatchPath(s, d)
      val assigned = Embeddings.assign(
          emb.select(col("vec_id"), col("embedding")), index.codebook)
        .select(col("cid"), col("vec_id"), col("embedding"), col("ccos"))
        .persist() // batch-sized by contract; avoids a second assignment job
      try {
        assigned
          .repartitionByRange(col("cid"))
          .sortWithinPartitions("cid")
          .write.mode("overwrite").parquet(s"$batch/lists.parquet")
        StoreState.commitBatch(s, batch) // all-or-nothing visibility
        recordAppendDrift(s, index.dir, assigned)
      } finally assigned.unpersist(blocking = false)
    }
    openIndex(s, index.dir)
  }

  /** Retrain a persisted IVF index IN PLACE — the repair action for a
    * positive [[driftStats]] reading: refit the codebook from the
    * STORED corpus (the inverted lists carry the raw vectors), re-assign
    * every vector, and reset drift telemetry to the new build. The new
    * lists AND the new codebook stage together under a fresh generation
    * and publish with one atomic marker create — a reader can never
    * pair new lists with the old codebook (or see a half-written
    * store), and pending tombstones fold away in the same commit. Cost
    * = one k-means fit + one assignment pass + one range shuffle — the
    * same shape as the original build, which is the honest price of new
    * centroids (appends stay cheap; retrain is the amortized repair).
    *
    * `k` <= 0 keeps the current codebook size; pass a positive k to
    * rescale it (e.g. the corpus-scaled rows-per-centroid rule) when
    * the corpus has grown far past the build. */
  def retrainIndex(index: IvfIndex, iters: Int = 5, k: Int = 0): IvfIndex = {
    val s = index.codebook.sparkSession
    graft.functions.native.register(s)
    StoreState.withLock(s, index.dir, "retrainIndex") {
      // pending deletes must not be resurrected into the refit corpus —
      // a retrain is also a compaction (it rewrites every list)
      val corpus = minusTombstones(index.lists, s, index.dir)
        .select(col("vec_id"), col("embedding"))
      val kk = if (k > 0) k else index.codebook.count().toInt
      val cbNew = Embeddings.kmeansFit(corpus, kk, iters)
        .select(col("cid").cast(LongType), col("cv"))
      val gen = StoreState.nextGenPath(s, index.dir)
      Embeddings.assign(corpus, cbNew)
        .select(col("cid"), col("vec_id"), col("embedding"), col("ccos"))
        .repartitionByRange(col("cid"))
        .sortWithinPartitions("cid")
        .write.mode("overwrite").parquet(s"$gen/lists.parquet")
      cbNew.coalesce(1)
        .write.mode("overwrite").parquet(s"$gen/codebook.parquet")
      StoreState.commitGen(s, index.dir, gen, LegacyFlat)
      writeBuildDrift(s, index.dir, s"$gen/lists.parquet")
    }
    openIndex(s, index.dir)
  }

  /** Delete vectors from a persisted IVF index (takedowns, dedup
    * purges, TTL): appends the ids (`vec_id` column) to the index's
    * tombstone set — O(delete batch), no data rewrite. Every
    * [[ivfSearchIndex]] call excludes tombstoned vectors BEFORE
    * ranking, so results equal an index rebuilt without them
    * (spec-pinned); [[compactIndex]] folds the tombstones into the
    * stored lists when their count warrants a rewrite. Re-ingesting a
    * deleted vec_id requires compacting first — the tombstone is
    * id-keyed and would suppress the new row too. Drift telemetry is
    * untouched: it records the assignment quality of batches as they
    * were ingested, which a later takedown does not rewrite. */
  def deleteFromIndex(index: IvfIndex, ids: DataFrame): IvfIndex = {
    StoreState.withLock(ids.sparkSession, index.dir, "deleteFromIndex") {
      writeTombstones(ids, index.dir)
    }
    openIndex(ids.sparkSession, index.dir)
  }

  /** Fold pending tombstones into the stored lists: one pruned scan +
    * a range-clustered rewrite staged under a fresh generation and
    * published with one atomic marker create (the index resolves to a
    * complete file set at every instant — spec-pinned by opening it
    * between every compact step), with NO refit or re-assignment —
    * assignments of surviving vectors are unchanged, so a compacted
    * index searches identically (spec-pinned). Also consolidates
    * append-batch dirs into one direct file and reclaims crashed-append
    * cruft; no-op when nothing is pending and no batches exist.
    * Schedule it by tombstone fraction; until then searches pay one
    * anti-join against a file-sized set. */
  def compactIndex(index: IvfIndex): IvfIndex =
    compactIndexProbed(index, () => ())

  private[graft] def compactIndexProbed(index: IvfIndex,
      probe: () => Unit): IvfIndex = {
    val s = index.codebook.sparkSession
    compactVecStaged(s, index.dir, "compactIndex",
      Seq("codebook.parquet"), "lists.parquet", (df, out) =>
        df.repartitionByRange(col("cid"))
          .sortWithinPartitions("cid")
          .write.mode("overwrite").parquet(out), probe)
    openIndex(s, index.dir)
  }

  /** IVF top-k against a PERSISTED index: identical results to
    * [[ivfSearch]] over the same codebook (same assignment rule, same
    * tie-breaks), but the corpus side is the stored inverted lists —
    * the probe set becomes a `cid IN (...)` pushed predicate, so the
    * scan touches only the probed lists. The probe cid set is
    * queries·nprobe values (model-sized, like the broadcast query set
    * itself). */
  /** Run the probe-assignment job ONCE: collect the (broadcast-bound,
    * model-sized-by-contract) probe frame to the driver, derive the
    * pushed cid set from the collected rows, and hand back a LOCAL
    * relation for the join side. Without this, the probe plan executed
    * twice — once for the `cid` distinct-collect and again when the
    * broadcast join re-evaluated it, re-running per-query centroid
    * ranking (and for PQ, LUT construction) per search. */
  private def materializeProbes(
      probes: DataFrame): (DataFrame, Array[Long]) = {
    val rows = probes.collect()
    val cids = rows.map(_.getAs[Long]("cid")).distinct.sorted
    val local = probes.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), probes.schema)
    (local, cids)
  }

  def ivfSearchIndex(index: IvfIndex, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    require(k > 0 && nprobe > 0, s"k=$k, nprobe=$nprobe")
    graft.functions.native.register(queries.sparkSession)
    val (probes, probeCids) = materializeProbes(Embeddings.assignRanked(
      queries.select(col("q_id").as("vec_id"), col("q_emb").as("embedding")),
      index.codebook, maxRank = nprobe)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("cid")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    minusTombstones(index.lists
        .filter(col("cid").isin(probeCids.map(java.lang.Long.valueOf): _*)),
      queries.sparkSession, index.dir)
      .join(broadcast(probes), Seq("cid"))
      .withColumn("cos", expr("graft_cosine(q_emb, embedding)"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "vec_id", "cos")
  }

  // ------------------------------------------------ product quantization

  /** Collect a (sub, code, scv) PQ codebook frame (e.g.
    * [[Embeddings.pqFit]]'s output) into the dense m×ks×(dims/m)
    * array the encode/score expressions broadcast. Model-sized by
    * contract, like the IVF codebook. */
  private def collectPq(pqCodebook: DataFrame): Array[Array[Array[Float]]] = {
    val rows = pqCodebook.select(col("sub").cast("int"),
        col("code").cast("int"), col("scv")).collect()
    val m = rows.map(_.getInt(0)).max + 1
    val ks = rows.map(_.getInt(1)).max + 1
    require(rows.length == m * ks,
      s"PQ codebook must be dense: got ${rows.length} rows for m=$m ks=$ks")
    val cb = Array.ofDim[Array[Float]](m, ks)
    rows.foreach { r =>
      cb(r.getInt(0))(r.getInt(1)) = r.getSeq[Float](2).toArray
    }
    cb.map(_.toArray)
  }

  /** Per-query ADC lookup tables: each query computes ONE m×ks table of
    * subspace dot products against the codebook — queries·m·ks doubles,
    * model-sized by contract (it broadcasts to the code scan). */
  private def lutFrame(queries: DataFrame,
      cb: Array[Array[Array[Float]]]): DataFrame = {
    val m = cb.length
    val ks = cb(0).length
    val sub = cb(0)(0).length
    queries.select(col("q_id"), col("q_emb"))
      .withColumn("__cb", typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq))
      .withColumn("lut", expr(
        s"""flatten(transform(sequence(0, ${m - 1}), si ->
           |  transform(sequence(0, ${ks - 1}), c ->
           |    aggregate(sequence(1, $sub), CAST(0 AS DOUBLE), (a, j) ->
           |      a + CAST(element_at(q_emb, si * $sub + j) AS DOUBLE)
           |        * CAST(element_at(element_at(element_at(__cb, si + 1), c + 1), j) AS DOUBLE)))))""".stripMargin))
      .withColumn("qn", expr(graft.functions.PortableVec.normSpark("q_emb")))
      .select(col("q_id"), col("q_emb"), col("lut"), col("qn"))
  }

  /** ADC-score a code scan against a broadcast LUT frame `q` — every
    * candidate costs m table lookups + adds, the Jegou et al. 2011
    * asymmetric distance computation. With `joinCid` the code scan must
    * carry `cid` and `q` (q_id, cid, qc, lut, qn) rows: candidates
    * reduce to the probed lists' codes (the IVF-PQ composition);
    * otherwise the whole code scan is scored (flat PQ). `qc` is the
    * query-centroid dot product — 0 for plain encoding, q·c for
    * residual encoding (q·x̂ = q·c + q·r̂, the scoring decomposition of
    * by-residual IVF-PQ). */
  private def adcScore(codes: DataFrame, q: DataFrame, m: Int, ks: Int,
      k: Int, joinCid: Boolean): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id"))
    val joined =
      if (joinCid)
        codes.select(col("cid"), col("vec_id"), col("code"), col("rnorm"))
          .join(broadcast(q.drop("q_emb")), Seq("cid"))
      else
        codes.select(col("vec_id"), col("code"), col("rnorm"))
          .crossJoin(broadcast(q.drop("q_emb").withColumn("qc",
            expr("CAST(0 AS DOUBLE)"))))
    joined
      // native lookup-sum kernel (parity pinned in
      // NativeExpressionsSpec); zero-guard, qc add, and divide stay
      // scalar SQL in the same order as the HOF form
      .withColumn("score", {
        val ls = graft.functions.native.parameterized(codes.sparkSession,
          es => graft.functions.PqLutSumExpr(es(0), es(1), m, ks),
          col("lut"), col("code"))
        when(col("qn") * col("rnorm") === lit(0.0d), lit(0.0d))
          .otherwise((col("qc") + ls) / (col("qn") * col("rnorm")))
      })
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "vec_id", "score")
  }

  /** Score a (vec_id, code, rnorm) code scan against per-query ADC
    * lookup tables (flat PQ: every code row is a candidate). */
  private def scoreCodes(codes: DataFrame, queries: DataFrame,
      cb: Array[Array[Array[Float]]], k: Int): DataFrame =
    adcScore(codes, lutFrame(queries, cb), cb.length, cb(0).length, k,
      joinCid = false)

  /** PQ approximate top-k with trained per-subspace codebooks (the
    * compression path: candidates are scored from m-lookup codes, never
    * raw vectors). Encodes the corpus in a map-only pass, then runs the
    * ADC scan of [[scoreCodes]]. For a standing corpus, build the codes
    * once with [[writePqIndex]] instead. */
  def pqSearch(emb: DataFrame, queries: DataFrame, pqCodebook: DataFrame,
      k: Int): DataFrame = {
    require(k > 0, s"k=$k")
    val cb = collectPq(pqCodebook)
    scoreCodes(
      Embeddings.pqEncode(emb.select(col("vec_id"), col("embedding")), cb),
      queries, cb, k)
  }

  /** A persisted PQ index: `pq_codebook.parquet` (m·ks rows) +
    * `codes.parquet` — ONLY (vec_id, code, rnorm): m small ints and a
    * double per vector instead of dims floats, so a reopened index scan
    * reads the compressed representation's bytes, not the corpus'. */
  final case class PqIndex(dir: String, codebook: DataFrame, codes: DataFrame)

  /** Encode the corpus once and persist codebooks + codes under `dir`
    * (staged generation + atomic marker publish, like [[writeIndex]]). */
  def writePqIndex(emb: DataFrame, pqCodebook: DataFrame,
      dir: String): Unit =
    StoreState.withLock(emb.sparkSession, dir, "writePqIndex") {
      doWritePqIndex(emb, pqCodebook, dir)
    }

  private def doWritePqIndex(emb: DataFrame, pqCodebook: DataFrame,
      dir: String): Unit = {
    val s = emb.sparkSession
    val cb = collectPq(pqCodebook)
    val gen = StoreState.nextGenPath(s, dir)
    pqCodebook.select(col("sub").cast("int"), col("code").cast("int"),
        col("scv"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$gen/pq_codebook.parquet")
    Embeddings.pqEncode(emb.select(col("vec_id"), col("embedding")), cb)
      .select(col("vec_id"), col("code"), col("rnorm"))
      .write.mode("overwrite").parquet(s"$gen/codes.parquet")
    StoreState.commitGen(s, dir, gen, LegacyFlat)
  }

  /** Reopen a persisted PQ index (metadata only — no data read). */
  def openPqIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): PqIndex = {
    val d = StoreState.dataDir(spark, dir)
    PqIndex(dir,
      spark.read.parquet(s"$d/pq_codebook.parquet"),
      readStore(spark, d, "codes.parquet"))
  }

  /** Append a new vector batch to a persisted PQ index: encode only
    * the batch with the stored codebooks and append the codes —
    * ingest cost proportional to the batch (see [[appendIndex]]). */
  def appendPqIndex(index: PqIndex, emb: DataFrame): PqIndex = {
    val s = emb.sparkSession
    StoreState.withLock(s, index.dir, "appendPqIndex") {
      val d = StoreState.dataDir(s, index.dir)
      val batch = StoreState.nextBatchPath(s, d)
      Embeddings.pqEncode(emb.select(col("vec_id"), col("embedding")),
          collectPq(index.codebook))
        .select(col("vec_id"), col("code"), col("rnorm"))
        .write.mode("overwrite").parquet(s"$batch/codes.parquet")
      StoreState.commitBatch(s, batch) // all-or-nothing visibility
    }
    openPqIndex(s, index.dir)
  }

  /** Retrain a persisted PQ index in place: refit the subspace
    * codebooks (same m, ks) and re-encode. Unlike the IVF lists, PQ
    * codes are a LOSSY representation — the raw corpus is not stored in
    * the index, so the caller provides it (`emb`): at fleet scale the
    * vectors live in the data lake and the index stores only codes. */
  def retrainPqIndex(index: PqIndex, emb: DataFrame,
      iters: Int = 5): PqIndex = {
    val s = emb.sparkSession
    StoreState.withLock(s, index.dir, "retrainPqIndex") {
      // the caller's corpus may still contain vectors deleted from the
      // index (the lake keeps them; the takedown was index-side) — apply
      // pending tombstones before the refit; the new generation's commit
      // folds them away (the rewrite contains exactly the survivors)
      val corpus = minusTombstones(
        emb.select(col("vec_id"), col("embedding")), s, index.dir)
      val cb = collectPq(index.codebook)
      val pqNew = Embeddings.pqFit(corpus, cb.length, cb(0).length, iters)
      doWritePqIndex(corpus, pqNew, index.dir)
    }
    openPqIndex(s, index.dir)
  }

  /** Delete vectors from a persisted PQ index — tombstone semantics,
    * cost, and rebuild-parity contract as [[deleteFromIndex]]. */
  def deletePqIndex(index: PqIndex, ids: DataFrame): PqIndex = {
    StoreState.withLock(ids.sparkSession, index.dir, "deletePqIndex") {
      writeTombstones(ids, index.dir)
    }
    openPqIndex(ids.sparkSession, index.dir)
  }

  /** Fold pending tombstones into the stored codes ([[compactIndex]]
    * semantics; the flat code scan has no clustering to preserve). */
  def compactPqIndex(index: PqIndex): PqIndex =
    compactPqIndexProbed(index, () => ())

  private[graft] def compactPqIndexProbed(index: PqIndex,
      probe: () => Unit): PqIndex = {
    val s = index.codebook.sparkSession
    compactVecStaged(s, index.dir, "compactPqIndex",
      Seq("pq_codebook.parquet"), "codes.parquet", (df, out) =>
        df.write.mode("overwrite").parquet(out), probe)
    openPqIndex(s, index.dir)
  }

  /** PQ top-k against a PERSISTED index: identical results to
    * [[pqSearch]] with the same codebooks (same encode rule, same
    * tie-breaks), but the corpus side is the stored (vec_id, code,
    * rnorm) scan — raw vectors are never touched. */
  def pqSearchIndex(index: PqIndex, queries: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k=$k")
    scoreCodes(minusTombstones(index.codes, queries.sparkSession, index.dir),
      queries, collectPq(index.codebook), k)
  }

  // ------------------------------------------------------------- IVF-PQ

  /** IVF-PQ approximate top-k — coarse-quantizer probe pruning composed
    * with PQ-compressed ADC scoring (the canonical billion-scale index:
    * FAISS `IndexIVFPQ` with `by_residual = false`; Jegou et al. 2011
    * §V). The corpus is assigned to inverted lists by `codebook`
    * (e.g. [[Embeddings.kmeansFit]]) and PQ-encoded with `pqCodebook`
    * (e.g. [[Embeddings.pqFit]]); a query probes its `nprobe` nearest
    * lists and ADC-scores ONLY those lists' (code, rnorm) rows — IVF
    * cuts the scanned rows to ~nprobe/k of the corpus, PQ cuts the
    * bytes per row ~dims·4/m× and removes per-candidate float math.
    * For a standing corpus build the index once with
    * [[writeIvfPqIndex]] instead. */
  def ivfPqSearch(emb: DataFrame, queries: DataFrame, codebook: DataFrame,
      pqCodebook: DataFrame, k: Int, nprobe: Int,
      residual: Boolean = false): DataFrame = {
    require(k > 0 && nprobe > 0, s"k=$k, nprobe=$nprobe")
    graft.functions.native.register(emb.sparkSession)
    val cb = collectPq(pqCodebook)
    adcScore(encodeLists(emb, codebook, cb, residual),
      probedLuts(queries, codebook, cb, nprobe, residual),
      cb.length, cb(0).length, k, joinCid = true)
  }

  /** Assign + PQ-encode the corpus into (cid, vec_id, code, rnorm).
    * Plain: codes encode the raw vector, rnorm = ‖r̂‖. Residual (the
    * FAISS `by_residual` default): codes encode x − c(x) — residuals
    * are tighter than raw vectors, so the same codebook bits carry more
    * precision — and rnorm = ‖c + r̂‖, the reconstruction the score
    * normalizes by. Both are one assignment pass + a map-only encode
    * (the centroid join is k-row broadcast). */
  private def encodeLists(emb: DataFrame, codebook: DataFrame,
      cb: Array[Array[Array[Float]]], residual: Boolean): DataFrame = {
    val assigned =
      Embeddings.assign(emb.select(col("vec_id"), col("embedding")), codebook)
    if (!residual) Embeddings.pqEncode(assigned, cb)
    else {
      val m = cb.length
      val sub = cb(0)(0).length
      val withC = assigned
        .join(broadcast(codebook.select(col("cid").cast(LongType),
          col("cv"))), Seq("cid"))
        .withColumn("embedding",
          expr("zip_with(embedding, cv, (x, c) -> x - c)"))
      Embeddings.pqEncode(withC, cb, withNorm = false)
        .withColumn("__cb", typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq))
        // ‖c + r̂‖: the reconstruction norm needs the cross terms, so it
        // folds over the decoded dims directly (still codebook+centroid
        // lookups only — never the raw vector)
        .withColumn("rnorm", expr(
          s"""sqrt(aggregate(sequence(0, ${m - 1}), CAST(0 AS DOUBLE), (a, si) ->
             |  a + aggregate(sequence(1, $sub), CAST(0 AS DOUBLE), (b, j) ->
             |    b + (CAST(element_at(cv, si * $sub + j) AS DOUBLE)
             |         + CAST(element_at(element_at(element_at(__cb, si + 1), CAST(element_at(code, si + 1) AS INT)), j) AS DOUBLE))
             |      * (CAST(element_at(cv, si * $sub + j) AS DOUBLE)
             |         + CAST(element_at(element_at(element_at(__cb, si + 1), CAST(element_at(code, si + 1) AS INT)), j) AS DOUBLE)))))""".stripMargin))
        .drop("__cb")
    }
  }

  /** Per-query (q_id, cid, qc, lut, qn) probe rows: the nprobe nearest
    * lists by the same exact two-level ranking the corpus side uses,
    * joined to the query's ADC LUT — queries·nprobe rows, model-sized
    * (it broadcasts to the code scan). `qc` = q·c per probed list when
    * `residual` (the scoring decomposition q·x̂ = q·c + q·r̂), else 0. */
  private def probedLuts(queries: DataFrame, codebook: DataFrame,
      cb: Array[Array[Array[Float]]], nprobe: Int,
      residual: Boolean): DataFrame = {
    val base = Embeddings.assignRanked(
      queries.select(col("q_id").as("vec_id"), col("q_emb").as("embedding")),
      codebook, maxRank = nprobe)
      .select(col("vec_id").as("q_id"), col("cid"))
      .join(lutFrame(queries, cb), Seq("q_id"))
    if (!residual) base.withColumn("qc", expr("CAST(0 AS DOUBLE)"))
    else base
      .join(broadcast(codebook.select(col("cid").cast(LongType), col("cv"))),
        Seq("cid"))
      .withColumn("qc",
        expr(graft.functions.PortableVec.dotSpark("q_emb", "cv")))
      .drop("cv")
  }

  /** A persisted IVF-PQ index: `codebook.parquet` (coarse centroids) +
    * `pq_codebook.parquet` (m·ks subspace centroids) + `codes.parquet`
    * — (cid, vec_id, code, rnorm) RANGE-CLUSTERED by cid, so probing a
    * reopened index pushes the probe set as a `cid IN (...)` predicate
    * AND reads only the compressed representation's bytes: both
    * reductions survive the round-trip. */
  final case class IvfPqIndex(dir: String, codebook: DataFrame,
      pqCodebook: DataFrame, codes: DataFrame, residual: Boolean)

  /** Assign + encode the corpus once and persist the full index under
    * `dir`: one assignment pass, one map-only encode, one range shuffle
    * on cid; both codebooks are model-sized single files. The encoding
    * flavor (plain vs residual) is stored in `meta.json` so a reopened
    * index can never be scored with the wrong decomposition. */
  def writeIvfPqIndex(emb: DataFrame, codebook: DataFrame,
      pqCodebook: DataFrame, dir: String,
      residual: Boolean = false): Unit =
    StoreState.withLock(emb.sparkSession, dir, "writeIvfPqIndex") {
      doWriteIvfPqIndex(emb, codebook, pqCodebook, dir, residual)
    }

  private def doWriteIvfPqIndex(emb: DataFrame, codebook: DataFrame,
      pqCodebook: DataFrame, dir: String, residual: Boolean): Unit = {
    val s = emb.sparkSession
    graft.functions.native.register(s)
    val cb = collectPq(pqCodebook)
    val gen = StoreState.nextGenPath(s, dir)
    codebook.select(col("cid").cast(LongType), col("cv"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$gen/codebook.parquet")
    pqCodebook.select(col("sub").cast("int"), col("code").cast("int"),
        col("scv"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$gen/pq_codebook.parquet")
    encodeLists(emb, codebook, cb, residual)
      .select(col("cid"), col("vec_id"), col("code"), col("rnorm"),
        col("ccos"))
      .repartitionByRange(col("cid"))
      .sortWithinPartitions("cid")
      .write.mode("overwrite").parquet(s"$gen/codes.parquet")
    // through the Hadoop FS like the parquet parts, so the index dir can
    // live on any filesystem the session can write (local/HDFS/object
    // store) — java.nio would silently treat "hdfs://..." as local.
    // meta.json stages INSIDE the generation: codes and their encoding
    // flavor commit together, so a reader can never mis-pair them.
    val metaPath = new org.apache.hadoop.fs.Path(gen, "meta.json")
    val f = fs(s, metaPath)
    val out = f.create(metaPath, true)
    try out.write(s"""{"residual": $residual}""".getBytes("UTF-8"))
    finally out.close()
    StoreState.commitGen(s, dir, gen, LegacyFlat)
    writeBuildDrift(s, dir, s"$gen/codes.parquet")
  }

  /** Reopen a persisted IVF-PQ index (metadata only — no data read).
    * A missing meta.json is an ERROR, not a default: the codes are
    * meaningless without knowing their encoding flavor, and defaulting
    * to plain would silently mis-score a residual index (and let
    * [[appendIvfPqIndex]] corrupt it with mixed encodings). */
  def openIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): IvfPqIndex = {
    val d = StoreState.dataDir(spark, dir)
    val metaPath = new org.apache.hadoop.fs.Path(d, "meta.json")
    val f = fs(spark, metaPath)
    require(f.exists(metaPath),
      s"$d/meta.json missing: not a graft IVF-PQ index (or the index " +
        "dir was copied without it); the encoding flavor cannot be " +
        "inferred from the codes — rebuild with writeIvfPqIndex")
    val in = f.open(metaPath)
    val meta =
      try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    IvfPqIndex(dir,
      spark.read.parquet(s"$d/codebook.parquet"),
      spark.read.parquet(s"$d/pq_codebook.parquet"),
      readStore(spark, d, "codes.parquet"),
      meta.contains("\"residual\": true"))
  }

  /** Append a new vector batch to a persisted IVF-PQ index: assign +
    * encode only the batch with the stored codebooks and THE STORED
    * ENCODING FLAVOR (meta.json decides plain vs residual — the caller
    * cannot desynchronize it), append the compressed rows — ingest
    * cost proportional to the batch (see [[appendIndex]]). */
  def appendIvfPqIndex(index: IvfPqIndex, emb: DataFrame): IvfPqIndex = {
    val s = emb.sparkSession
    graft.functions.native.register(s)
    StoreState.withLock(s, index.dir, "appendIvfPqIndex") {
      val d = StoreState.dataDir(s, index.dir)
      val batch = StoreState.nextBatchPath(s, d)
      val encoded = encodeLists(emb, index.codebook,
          collectPq(index.pqCodebook), index.residual)
        .select(col("cid"), col("vec_id"), col("code"), col("rnorm"),
          col("ccos"))
        .persist() // batch-sized by contract; avoids a second encode job
      try {
        encoded
          .repartitionByRange(col("cid"))
          .sortWithinPartitions("cid")
          .write.mode("overwrite").parquet(s"$batch/codes.parquet")
        StoreState.commitBatch(s, batch) // all-or-nothing visibility
        recordAppendDrift(s, index.dir, encoded)
      } finally encoded.unpersist(blocking = false)
    }
    openIvfPqIndex(s, index.dir)
  }

  /** Retrain a persisted IVF-PQ index in place — the [[retrainIndex]]
    * analog for the compressed family: refit BOTH codebooks (coarse
    * k-means and the m×ks subspace quantizer) and re-encode, preserving
    * the stored residual flavor (meta.json decides, never the caller).
    * The codes are lossy, so like [[retrainPqIndex]] the raw corpus
    * comes from the caller; `writeIvfPqIndex` rewrites codes, both
    * codebooks, meta.json, AND drift.json, so telemetry restarts at the
    * new build. `k` <= 0 keeps the current coarse codebook size. */
  def retrainIvfPqIndex(index: IvfPqIndex, emb: DataFrame,
      iters: Int = 5, k: Int = 0): IvfPqIndex = {
    val s = emb.sparkSession
    graft.functions.native.register(s)
    StoreState.withLock(s, index.dir, "retrainIvfPqIndex") {
      // exclude pending index-side deletes from the caller's corpus;
      // the new generation's commit folds them away — same contract as
      // [[retrainPqIndex]]
      val corpus = minusTombstones(
        emb.select(col("vec_id"), col("embedding")), s, index.dir)
      val kk = if (k > 0) k else index.codebook.count().toInt
      val cb = collectPq(index.pqCodebook)
      val cbNew = Embeddings.kmeansFit(corpus, kk, iters)
        .select(col("cid").cast(LongType), col("cv"))
      val pqNew = Embeddings.pqFit(corpus, cb.length, cb(0).length, iters)
      doWriteIvfPqIndex(corpus, cbNew, pqNew, index.dir, index.residual)
    }
    openIvfPqIndex(s, index.dir)
  }

  /** Delete vectors from a persisted IVF-PQ index — tombstone
    * semantics, cost, and rebuild-parity contract as
    * [[deleteFromIndex]]. */
  def deleteIvfPqIndex(index: IvfPqIndex, ids: DataFrame): IvfPqIndex = {
    StoreState.withLock(ids.sparkSession, index.dir, "deleteIvfPqIndex") {
      writeTombstones(ids, index.dir)
    }
    openIvfPqIndex(ids.sparkSession, index.dir)
  }

  /** Fold pending tombstones into the stored codes, preserving the
    * cid range-clustering the probe pushdown depends on
    * ([[compactIndex]] semantics). */
  def compactIvfPqIndex(index: IvfPqIndex): IvfPqIndex =
    compactIvfPqIndexProbed(index, () => ())

  private[graft] def compactIvfPqIndexProbed(index: IvfPqIndex,
      probe: () => Unit): IvfPqIndex = {
    val s = index.codebook.sparkSession
    compactVecStaged(s, index.dir, "compactIvfPqIndex",
      Seq("codebook.parquet", "pq_codebook.parquet", "meta.json"),
      "codes.parquet", (df, out) =>
        df.repartitionByRange(col("cid"))
          .sortWithinPartitions("cid")
          .write.mode("overwrite").parquet(out), probe)
    openIvfPqIndex(s, index.dir)
  }

  /** IVF-PQ top-k against a PERSISTED index: identical results to
    * [[ivfPqSearch]] with the same codebooks and encoding flavor (same
    * assignment + encode rules, same tie-breaks), but the corpus side
    * is the stored (cid, vec_id, code, rnorm) scan with the probe set
    * pushed as a `cid IN (...)` predicate — the scan touches only the
    * probed lists' compressed bytes. */
  def ivfPqSearchIndex(index: IvfPqIndex, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    require(k > 0 && nprobe > 0, s"k=$k, nprobe=$nprobe")
    graft.functions.native.register(queries.sparkSession)
    val cb = collectPq(index.pqCodebook)
    val (probes, probeCids) = materializeProbes(
      probedLuts(queries, index.codebook, cb, nprobe, index.residual))
    adcScore(
      minusTombstones(index.codes
          .filter(col("cid").isin(probeCids.map(java.lang.Long.valueOf): _*)),
        queries.sparkSession, index.dir),
      probes, cb.length, cb(0).length, k, joinCid = true)
  }

  // ------------------------------------------------- persisted text index

  /** The registry's polynomial token hash (base 31 mod 1e9+7), applied
    * driver-side to LITERAL query terms so they fold into the plan as
    * plain BIGINT constants — identical to the tokenizer's per-token
    * hash, so index postings and query terms meet on one key space. */
  private def termHash(t: String): Long =
    t.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)

  /** A persisted BM25 text index — the lexical leg of the index
    * lifecycle next to the vector side's build→append→search. Files
    * live under the current generation's per-batch directories
    * (`gen-N/batch-M/...`), each batch holding:
    *  - `postings.parquet` (t, doc_id, dl, tf), term-range-clustered
    *    ([[org.apache.spark.sql.Dataset.repartitionByRange]] +
    *    sortWithinPartitions on t) so a query's scan prunes to its own
    *    terms' posting runs via parquet min/max on t — never the corpus;
    *  - `df.parquet` (t, df), the batch's per-term doc counts (a reader
    *    sums its terms' rows across batches) — additive, so appends
    *    never rewrite existing files;
    *  - `textstats.parquet` (n_docs, n_tokens), one row per batch,
    *    summed at query time for the corpus-level BM25 constants;
    *  - `docstats.parquet` (doc_id, dl), 16 B/doc — what deletes and
    *    compactions read instead of the postings.
    *
    * Crash contract: every batch publishes its four files with ONE
    * atomic `_BATCH_COMMITTED` marker create (a crashed append is
    * invisible garbage — readers never see a postings/df/stats
    * mismatch); a delete's only write is the tombstone set (the BM25
    * stats discount is DERIVED at read time from docstats ⋈ tombstones,
    * so every observable state is exactly pre-delete or post-delete —
    * never a third); compactions stage a full new generation and flip
    * it with one marker ([[StoreState]]).
    *
    * Append batches carry NEW doc_ids (a re-sent doc would double-count
    * df and stats, exactly like a re-sent vec_id duplicates a list
    * entry) — except the idempotent streaming path
    * ([[appendTextIndexStreamBatch]]), which overwrites its own batch
    * dir on replay. Tokenization is the registry's: docs under 3 tokens
    * do not index (the same rule the shared tokenHashes cache applies),
    * so indexed search is row-identical to the t_bm25 operator. */
  final case class TextIndex(dir: String, postings: DataFrame,
      dfs: DataFrame, stats: DataFrame, docstats: DataFrame)

  private def tokenized(docs: DataFrame): DataFrame = {
    graft.functions.native.register(docs.sparkSession)
    docs.select(col("doc_id").cast(LongType).as("doc_id"),
        expr("graft_tokens(text)").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        expr("graft_token_hashes(toks)").as("th"))
  }

  private def postingsOf(th: DataFrame): DataFrame =
    th.select(col("doc_id"), size(col("th")).cast(LongType).as("dl"),
        explode(col("th")).as("t"))
      .groupBy("t", "doc_id", "dl").agg(count(lit(1)).as("tf"))

  /** Write one batch's four files into a (staged, not yet committed)
    * batch directory. */
  private def writeTextBatch(th: DataFrame, batchDir: String): Unit = {
    val post = postingsOf(th).persist()
    try {
      post.repartitionByRange(col("t")).sortWithinPartitions("t")
        .write.mode("overwrite").parquet(s"$batchDir/postings.parquet")
      post.groupBy("t").agg(count(lit(1)).as("df"))
        .repartitionByRange(col("t")).sortWithinPartitions("t")
        .write.mode("overwrite").parquet(s"$batchDir/df.parquet")
      // per-doc token length — 16 B/doc; deletes read THIS (never the
      // postings) to subtract the departed docs' stats exactly
      post.select(col("doc_id"), col("dl")).distinct()
        .write.mode("overwrite").parquet(s"$batchDir/docstats.parquet")
      th.agg(count(lit(1)).as("n_docs"),
          sum(size(col("th")).cast(LongType)).as("n_tokens"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$batchDir/textstats.parquet")
    } finally post.unpersist(blocking = false)
  }

  private def docTombstonesPath(spark: org.apache.spark.sql.SparkSession,
      dir: String) =
    new org.apache.hadoop.fs.Path(
      StoreState.dataDir(spark, dir), "doc_tombstones.parquet")

  /** True if the text index has pending document deletes. */
  def pendingTextDeletes(spark: org.apache.spark.sql.SparkSession,
      dir: String): Boolean = {
    val p = docTombstonesPath(spark, dir)
    fs(spark, p).exists(p)
  }

  private def minusDocTombstones(data: DataFrame,
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val p = docTombstonesPath(spark, dir)
    if (fs(spark, p).exists(p))
      data.join(spark.read.parquet(p.toString).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
    else data
  }

  /** Build the text index from a `(doc_id, text)` frame: one tokenize
    * pass, one keyed postings aggregate, one range shuffle on t. The
    * file set stages under `gen-N/batch-00000001/` and publishes with
    * two atomic marker creates (batch, then generation) — a rebuild
    * over a live store never exposes a partial index, and a crashed
    * build leaves the previous state untouched. */
  def writeTextIndex(docs: DataFrame, dir: String): Unit =
    StoreState.withLock(docs.sparkSession, dir, "writeTextIndex") {
      val s = docs.sparkSession
      val gen = StoreState.nextGenPath(s, dir)
      val batch = new org.apache.hadoop.fs.Path(
        gen, StoreState.batchName(1L))
      writeTextBatch(tokenized(docs), batch.toString)
      StoreState.commitBatch(s, batch)
      StoreState.commitGen(s, dir, gen, LegacyFlat)
    }

  /** Reopen a persisted text index (metadata only — no data read):
    * resolves the current generation and unions its committed batches
    * (term pruning still works per file — each batch's postings are
    * term-range-clustered on their own). */
  def openTextIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): TextIndex = {
    val d = StoreState.dataDir(spark, dir)
    def rd(name: String) = readStore(spark, d, name)
    TextIndex(dir,
      rd("postings.parquet"),
      rd("df.parquet"),
      rd("textstats.parquet"),
      rd("docstats.parquet"))
  }

  /** Append a batch of NEW documents as a fresh `batch-M/` dir inside
    * the current generation, committed with one atomic marker create —
    * the four files (postings, df, textstats, docstats) become visible
    * all-or-nothing, so a crashed append can never leave postings
    * without their stats (it leaves an unmarked dir readers ignore and
    * the next compaction reclaims). No existing file rewrites, and
    * search over the appended index is row-identical to a from-scratch
    * rebuild on the union (spec-pinned, like the vector side's
    * appendIndex). */
  def appendTextIndex(index: TextIndex, docs: DataFrame): TextIndex = {
    val s = docs.sparkSession
    StoreState.withLock(s, index.dir, "appendTextIndex") {
      val d = StoreState.dataDir(s, index.dir)
      val batch = StoreState.nextBatchPath(s, d)
      writeTextBatch(tokenized(docs), batch.toString)
      StoreState.commitBatch(s, batch)
    }
    openTextIndex(s, index.dir)
  }

  /** Idempotent per-micro-batch text-index append — the streaming
    * ingest leg ([[textIndexSink]] drives it from foreachBatch). The
    * batch dir is NAMED BY the streaming batch id (`batch-s<id>`), so a
    * replayed micro-batch (restart after commit but before the
    * checkpoint advanced) deletes and rewrites ITS OWN directory with
    * the same rows instead of double-counting — exactly-once contents
    * under at-least-once delivery, the same zero-padded-batch-id rule
    * as the streaming granule sink. */
  def appendTextIndexStreamBatch(docs: DataFrame, dir: String,
      batchId: Long): Unit = {
    val s = docs.sparkSession
    StoreState.withLock(s, dir, s"textIndexSink(batch=$batchId)") {
      val d = StoreState.dataDir(s, dir)
      val batch = new org.apache.hadoop.fs.Path(
        d, StoreState.streamBatchName(batchId))
      val f = fs(s, batch)
      if (f.exists(batch)) f.delete(batch, true) // replay: rewrite in full
      writeTextBatch(tokenized(docs), batch.toString)
      StoreState.commitBatch(s, batch)
    }
  }

  /** Structured Streaming maintenance for the text index: every
    * micro-batch of `(doc_id, text)` rows appends as one committed
    * batch dir via [[appendTextIndexStreamBatch]] — restart-safe
    * (checkpointed) and idempotent per batch id, so a stream-built
    * index equals a batch build over the same docs (spec-pinned). */
  def textIndexSink(docs: DataFrame, dir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch((batch: DataFrame, id: Long) =>
        appendTextIndexStreamBatch(batch, dir, id))
      .start()

  /** Delete documents from the text index — the same tombstone
    * contract as the vector side's [[deleteFromIndex]]: the delete is
    * an O(delta) metadata operation (ids append to a tombstone set;
    * the postings never rewrite), search excludes tombstoned docs
    * BEFORE ranking so a deleted doc can never crowd a survivor out of
    * the top-k, and [[compactTextIndex]] reclaims the bytes later.
    *
    * The tombstone set is the ONLY thing a delete writes — the single
    * commit point. Exactness under deletes is DERIVED at read time:
    * the BM25 corpus constants (N, total tokens) subtract the departed
    * docs' exact counts via docstats ⋈ tombstones (16 B/doc, never the
    * postings), and per-term df switches to being derived from the
    * SURVIVING postings of the query's own terms (df.parquet's
    * additive deltas cannot discount). So a crash anywhere in the
    * delete leaves every later search equal to either the pre-delete
    * or the post-delete truth — no persisted stats delta exists to
    * disagree with the tombstones (spec-pinned, including the
    * partially-applied case: tombstone part-files are each a valid
    * subset, and any prefix of them is a valid smaller delete).
    * Already-deleted and unknown ids are ignored (the discount joins
    * through docstats, so they can never subtract). Search parity with
    * a rebuild on the survivors is spec-pinned. */
  def deleteFromTextIndex(index: TextIndex, ids: DataFrame): TextIndex = {
    val spark = ids.sparkSession
    StoreState.withLock(spark, index.dir, "deleteFromTextIndex") {
      val fresh = ids.select(col("doc_id").cast(LongType)).distinct()
        .join(index.docstats.select("doc_id"), Seq("doc_id"), "left_semi")
      val departing =
        minusDocTombstones(fresh, spark, index.dir).persist()
      try {
        if (departing.count() > 0L)
          departing.coalesce(1)
            .write.mode("append")
            .parquet(docTombstonesPath(spark, index.dir).toString)
      } finally departing.unpersist(blocking = false)
    }
    openTextIndex(spark, index.dir)
  }

  /** Compact the text index: consolidate all committed batches minus
    * the tombstones into ONE fresh batch under a NEW generation —
    * postings re-range-clustered, df recomputed from the surviving
    * postings, textstats collapsed to one exact row — and flip the
    * generation with one atomic marker create. The store resolves to a
    * complete index at every instant (spec-pinned by opening and
    * searching it between every compact step), the tombstone drop
    * rides the same commit, and uncommitted batch cruft from crashed
    * appends is reclaimed by the generation GC. Acts when there are
    * pending deletes, more than one committed batch, crashed-append
    * leftovers, or a legacy flat layout to migrate; no-ops otherwise.
    * Search results are identical before and after (spec-pinned):
    * compaction changes bytes, never answers. */
  def compactTextIndex(index: TextIndex): TextIndex =
    compactTextIndexProbed(index, () => ())

  private[graft] def compactTextIndexProbed(index: TextIndex,
      probe: () => Unit): TextIndex = {
    val spark = index.postings.sparkSession
    StoreState.withLock(spark, index.dir, "compactTextIndex") {
      val dir = index.dir
      val cur = StoreState.dataDir(spark, dir)
      val needs = pendingTextDeletes(spark, dir) ||
        StoreState.committedBatches(spark, cur).size != 1 ||
        StoreState.uncommittedCruft(spark, cur).nonEmpty ||
        cur == dir // legacy flat layout: migrate into a generation
      if (needs) {
        val gen = StoreState.nextGenPath(spark, dir)
        val batch = new org.apache.hadoop.fs.Path(
          gen, StoreState.batchName(1L))
        minusDocTombstones(index.postings, spark, dir)
          .repartitionByRange(col("t")).sortWithinPartitions("t")
          .write.mode("overwrite").parquet(s"$batch/postings.parquet")
        probe()
        spark.read.parquet(s"$batch/postings.parquet")
          .groupBy("t").agg(count(lit(1)).as("df"))
          .repartitionByRange(col("t")).sortWithinPartitions("t")
          .write.mode("overwrite").parquet(s"$batch/df.parquet")
        probe()
        minusDocTombstones(index.docstats, spark, dir)
          .write.mode("overwrite").parquet(s"$batch/docstats.parquet")
        probe()
        spark.read.parquet(s"$batch/docstats.parquet")
          .agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("dl")), lit(0L)).cast(LongType)
              .as("n_tokens"))
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$batch/textstats.parquet")
        probe()
        StoreState.commitBatch(spark, batch)
        probe()
        StoreState.commitGen(spark, dir, gen, LegacyFlat)
        probe()
      }
    }
    openTextIndex(spark, index.dir)
  }

  /** BM25 top-k over the persisted index for a literal term set —
    * row-identical to the registry's t_bm25 for the same terms and k
    * (same exact-integer Okapi arithmetic: rational idf scaled 1e6, tf
    * saturation with k1 = 1.2, b = 0.75 cleared to BIGINT, scale 1e3).
    * The postings scan reads ONLY the query terms' rows (t IN (...)
    * pushes into the term-clustered parquet); df rows for the terms
    * sum across batch deltas; the 2-long stats frame sums and
    * broadcasts; the global top-k is TakeOrderedAndProject with the
    * rank window over the k survivors only. */
  def textSearchIndex(index: TextIndex, terms: Seq[String],
      k: Int): DataFrame = {
    require(k > 0, s"k=$k")
    val spark = index.postings.sparkSession
    val qh = terms.map(termHash)
    val pending = pendingTextDeletes(spark, index.dir)
    val post = minusDocTombstones(
      index.postings.filter(col("t").isin(qh: _*)), spark, index.dir)
    // with pending deletes, df.parquet's additive deltas cannot
    // discount the departed docs — derive df from the SURVIVING
    // postings of the query's own terms instead (always exact; same
    // bytes read either way, the term filter already pruned the scan)
    val dfq =
      if (pending)
        post.groupBy("t").agg(count(lit(1)).as("df"))
      else
        index.dfs.filter(col("t").isin(qh: _*))
          .groupBy("t").agg(sum("df").as("df"))
    // corpus constants: the batch deltas' sum, minus — when deletes are
    // pending — the departed docs' exact counts DERIVED from
    // docstats ⋈ tombstones (16 B/doc semi-join; nothing is persisted,
    // so the discount can never disagree with the tombstone set)
    val statsBase = index.stats.agg(
      sum("n_docs").cast(LongType).as("n_docs"),
      sum("n_tokens").cast(LongType).as("n_tokens"))
    val stats =
      if (!pending) statsBase
      else {
        val disc = index.docstats
          .join(spark.read.parquet(
              docTombstonesPath(spark, index.dir).toString)
            .select(col("doc_id")), Seq("doc_id"), "left_semi")
          .agg(count(lit(1)).as("d_docs"),
            coalesce(sum(col("dl")), lit(0L)).cast(LongType)
              .as("d_tokens"))
        statsBase.crossJoin(disc)
          .select((col("n_docs") - col("d_docs")).as("n_docs"),
            (col("n_tokens") - col("d_tokens")).as("n_tokens"))
      }
    val scored = post
      .join(broadcast(dfq), "t")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        expr("((n_docs - df) * 2000000L + 1000000L) div (2L * df + 1L)"))
      .withColumn("__tfc",
        expr("(tf * 22L * n_tokens * 1000L) div " +
          "(tf * 10L * n_tokens + 3L * n_tokens + 9L * dl * n_docs)"))
      .groupBy("doc_id").agg(sum(expr("__idf * __tfc")).as("score"))
    val top = scored.orderBy(col("score").desc, col("doc_id")).limit(k)
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    top.withColumn("rk", row_number().over(w).cast(LongType))
      .select("rk", "doc_id", "score")
  }
}
