package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The approx-percentile production twins vs their exact oracle-checked
  * counterparts: the registry keeps exact `percentile` (DuckDB
  * hash-parity forces it), but exact state grows with distinct values
  * per group, so corpus-scale runs use the sketch twins. These pins
  * bound the rank error the swap introduces.
  */
class ApproxQuantileSpec extends AnyFunSuite with SparkSpec {

  import graft.queries.{PipelineQueries, RelationalQueries}

  private val sf = "/root/testdata/sf0.001"

  test("qPercentilesApprox lands inside the exact p45..p55 / p90..p99 bands") {
    val exactBands = graft.queries.AggQueries.events(spark, sf)
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.45)").as("lo50"),
        expr("percentile(value, 0.55)").as("hi50"),
        expr("percentile(value, 0.90)").as("lo95"),
        expr("percentile(value, 0.99)").as("hi95"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val approx = RelationalQueries.qPercentilesApprox(spark, sf).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (lo50, hi50, lo95, hi95) = exactBands(r.getString(0))
      val (p50, p95) = (r.getDouble(1), r.getDouble(2))
      assert(p50 >= lo50 && p50 <= hi50,
        s"${r.getString(0)} p50=$p50 outside [$lo50,$hi50]")
      assert(p95 >= lo95 && p95 <= hi95,
        s"${r.getString(0)} p95=$p95 outside [$lo95,$hi95]")
    }
  }

  test("qQuantileSketch (deterministic bottom-k sample) stays in the exact rank bands") {
    // the engine-reproducible sketch: 1024-row deterministic sample per
    // group -> rank error O(1/sqrt(k)) ~ 3%; pin p50 in [p40, p60] and
    // p95 in [p88, p995] of the EXACT distribution (wider than the
    // GK-sketch bands because sampling error dominates at k=1024)
    val exactBands = graft.queries.AggQueries.events(spark, sf)
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.40)").as("lo50"),
        expr("percentile(value, 0.60)").as("hi50"),
        expr("percentile(value, 0.88)").as("lo95"),
        expr("percentile(value, 0.995)").as("hi95"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val sketch = RelationalQueries.qQuantileSketch(spark, sf).collect()
    assert(sketch.nonEmpty)
    sketch.foreach { r =>
      val (lo50, hi50, lo95, hi95) = exactBands(r.getString(0))
      val (p50, p95) = (r.getDouble(2), r.getDouble(3))
      assert(p50 >= lo50 && p50 <= hi50,
        s"${r.getString(0)} sketch p50=$p50 outside [$lo50,$hi50]")
      assert(p95 >= lo95 && p95 <= hi95,
        s"${r.getString(0)} sketch p95=$p95 outside [$lo95,$hi95]")
    }
    // determinism: a re-run reproduces the sketch bit for bit (no RNG)
    val again = RelationalQueries.qQuantileSketch(spark, sf).collect()
    assert(sketch.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("dQuantileFilterApprox agrees with the exact filter on >= 98% of docs") {
    val exact = PipelineQueries.dQuantileFilter(spark, sf)
      .select("doc_id", "kept").withColumnRenamed("kept", "kept_exact")
    val approx = PipelineQueries.dQuantileFilterApprox(spark, sf)
      .select("doc_id", "kept").withColumnRenamed("kept", "kept_approx")
    val j = exact.join(approx, "doc_id")
    val total = j.count()
    val agree = j.filter(col("kept_exact") === col("kept_approx")).count()
    assert(total > 0)
    assert(agree.toDouble / total >= 0.98,
      s"kept-flag agreement $agree/$total below 98%")
  }
}
