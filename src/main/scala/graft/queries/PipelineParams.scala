package graft.queries

/** Tunables of the training-data pipeline operators, threaded as a
  * default parameter so the registry entries keep their
  * `(SparkSession, dir)` shape while ScaleSmoke (and any deployment)
  * sweeps non-default values. The DEFAULTS are what the DuckDB oracle
  * encodes — changing one here without the matching oracle SQL change
  * fails the correctness gate by design.
  *
  * @param semTau SemDeDup threshold: a within-cluster pair closer than
  *   this in cosine is a semantic duplicate (the paper tunes ~0.95+ on
  *   real embeddings; the synthetic fixture's clusters are looser — 0.35
  *   sits at ~p97 of its within-cluster pair cosines, dropping ~12%).
  * @param rowsPerCentroid rows per coarse-quantizer centroid:
  *   k = max(16, n / this). SemDeDup (Abbas et al. 2023) sizes k ∝ corpus
  *   (~10k rows/centroid at web scale) so per-cluster pair-scan work
  *   stays BOUNDED as the corpus grows. 50 here (vs the paper's 10k) so
  *   the shipped fixtures actually exercise the scaled-k path (sf0.1's
  *   2000 vectors → k=40); a production deployment raises it.
  * @param nShards training-shard count for `d_shard_assign` — at fleet
  *   scale this is the shard-writer parallelism.
  * @param packBudget token budget per packed training bin
  *   (`d_pack_sequences`).
  * @param packShards pack-shard count per source for `d_pack_sequences`
  *   / `d_corpus_pipeline_v2`: docs pack in (shard, doc_id) order within
  *   each source, so the prefix sum parallelizes across
  *   |sources|·packShards window tasks instead of serializing a hot
  *   source through one. packShards = 1 reduces exactly to the plain
  *   per-source doc_id-order pack (shard ≡ 0, base ≡ 0) — the streaming
  *   packer's arrival-order contract. A fleet sizes this to its writer
  *   parallelism; the DEFAULT is what the oracle encodes.
  */
final case class PipelineParams(
    semTau: Double = 0.35,
    rowsPerCentroid: Long = 50L,
    nShards: Long = 64L,
    packBudget: Long = 2048L,
    packShards: Long = 16L)

object PipelineParams {
  val Default: PipelineParams = PipelineParams()
}
