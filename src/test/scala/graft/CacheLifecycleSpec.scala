package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{PipelineQueries, RelationalQueries}

/** Lifecycle pins for the session-scoped memo caches: explicit
  * evict releases cached storage and derived layouts, and everything
  * rebuilds correctly afterwards (a long-lived session must be able to
  * cycle data directories without pinning each one's state forever). */
class CacheLifecycleSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("evictCaches unpersists memoized pipeline frames; queries rebuild") {
    assume(new java.io.File(s"$dir/documents.parquet").exists)
    val clusters = PipelineQueries.dDedupClusters(spark, dir)
    val n = clusters.count()
    assert(PipelineQueries.cachedFrameCount(spark, dir) > 0)
    assert(clusters.storageLevel != StorageLevel.NONE,
      "cluster labels should be cached while memoized")
    PipelineQueries.evictCaches(spark, dir)
    assert(PipelineQueries.cachedFrameCount(spark, dir) === 0)
    assert(clusters.storageLevel === StorageLevel.NONE,
      "evict must unpersist the memoized frame's storage")
    // rebuild after evict: same result, fresh memo entry
    assert(PipelineQueries.dDedupClusters(spark, dir).count() === n)
    assert(PipelineQueries.cachedFrameCount(spark, dir) > 0)
    PipelineQueries.evictCaches(spark, dir)
  }

  test("two-dir sweep: evicting one factor's caches leaves the other's standing") {
    // A back-to-back factor sweep in ONE session (ScaleSmoke/TenX) must
    // be able to release the finished factor's signature/count memos
    // without touching the factor still in flight.
    val a = dir
    val b = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$a/embeddings.parquet").exists &&
      new java.io.File(s"$b/embeddings.parquet").exists)
    val na = PipelineQueries.annLsh(spark, a).count()
    val nb = PipelineQueries.annLsh(spark, b).count()
    assert(na > 0 && nb > 0)
    val cb = PipelineQueries.cachedFrameCount(spark, b)
    assert(PipelineQueries.cachedFrameCount(spark, a) > 0 && cb > 0)
    PipelineQueries.evictCaches(spark, a)
    assert(PipelineQueries.cachedFrameCount(spark, a) === 0,
      "finished factor's frames must release")
    assert(PipelineQueries.cachedFrameCount(spark, b) === cb,
      "in-flight factor's frames must survive the other's eviction")
    // the surviving dir still answers, and the evicted dir rebuilds
    assert(PipelineQueries.annLsh(spark, b).count() === nb)
    assert(PipelineQueries.annLsh(spark, a).count() === na)
    assert(PipelineQueries.cachedFrameCount(spark, a) > 0)
    PipelineQueries.evictCaches(spark, a)
    PipelineQueries.evictCaches(spark, b)
  }

  test("evictDerived drops bucketed catalog tables and z-order copies; queries rebuild") {
    assume(new java.io.File(s"$dir/orders.parquet").exists)
    val n1 = RelationalQueries.qBucketedJoin(spark, dir).count()
    RelationalQueries.qZorderScan(spark, dir).count()
    assert(RelationalQueries.derivedLayoutCount(spark, dir) === 2)
    assert(spark.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_bkt_")))
    RelationalQueries.evictDerived(spark, dir)
    assert(RelationalQueries.derivedLayoutCount(spark, dir) === 0)
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_bkt_")),
      "evict must drop the derived bucketed tables from the catalog")
    // rebuild after evict still answers correctly
    assert(RelationalQueries.qBucketedJoin(spark, dir).count() === n1)
    RelationalQueries.evictDerived(spark, dir)
  }
}
