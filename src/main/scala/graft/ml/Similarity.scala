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
}
