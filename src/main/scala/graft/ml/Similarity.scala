package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** Assign the corpus and persist the index under `dir`. One
    * assignment pass (map-only indexed search) + one range shuffle on
    * cid; the codebook is model-sized and lands as a single file. */
  def writeIndex(emb: DataFrame, codebook: DataFrame, dir: String): Unit = {
    graft.functions.native.register(emb.sparkSession)
    codebook.select(col("cid").cast(LongType), col("cv"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/codebook.parquet")
    Embeddings.assign(emb.select(col("vec_id"), col("embedding")), codebook)
      .select(col("cid"), col("vec_id"), col("embedding"))
      .repartitionByRange(col("cid"))
      .sortWithinPartitions("cid")
      .write.mode("overwrite").parquet(s"$dir/lists.parquet")
  }

  /** Reopen a persisted index (metadata only — no data read). */
  def openIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): IvfIndex =
    IvfIndex(dir,
      spark.read.parquet(s"$dir/codebook.parquet"),
      spark.read.parquet(s"$dir/lists.parquet"))

  /** IVF top-k against a PERSISTED index: identical results to
    * [[ivfSearch]] over the same codebook (same assignment rule, same
    * tie-breaks), but the corpus side is the stored inverted lists —
    * the probe set becomes a `cid IN (...)` pushed predicate, so the
    * scan touches only the probed lists. The probe cid set is
    * queries·nprobe values (model-sized, like the broadcast query set
    * itself). */
  def ivfSearchIndex(index: IvfIndex, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    require(k > 0 && nprobe > 0, s"k=$k, nprobe=$nprobe")
    graft.functions.native.register(queries.sparkSession)
    val probes = Embeddings.assignRanked(
      queries.select(col("q_id").as("vec_id"), col("q_emb").as("embedding")),
      index.codebook, maxRank = nprobe)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("cid"))
    val probeCids = probes.select("cid").distinct()
      .collect().map(_.getLong(0)).sorted
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    index.lists
      .filter(col("cid").isin(probeCids.map(java.lang.Long.valueOf): _*))
      .join(broadcast(probes), Seq("cid"))
      .withColumn("cos", expr("graft_cosine(q_emb, embedding)"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "vec_id", "cos")
  }
}
