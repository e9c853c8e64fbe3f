package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed connected components via min-label propagation with pointer
  * jumping — the graph step of near-dup clustering
  * (graft.queries.PipelineQueries.dDedupClusters), factored out so the
  * algorithm is independently property-testable against a driver-side
  * union-find reference on random graphs.
  */
object Graph {

  /** Label every vertex of the undirected graph `edges` (two Long columns:
    * src, dst) with the minimum vertex id reachable from it. Returns
    * (id, lbl) for every vertex that appears in an edge.
    *
    * Scale shape (SURVEY.md §4): each round is a pair of keyed equi-joins
    * + one min-aggregate over the EDGE graph only (not the full corpus);
    * pointer jumping (adopting the current label's own label) compresses
    * label chains exponentially, so rounds = O(log diameter). The only
    * driver-side values are scalar convergence signatures.
    *
    * Eager localCheckpoint, not persist: persist caches data but keeps the
    * full logical plan, so an iterative loop's plan tree (which references
    * the previous round's frame several times) grows exponentially with
    * rounds and Catalyst re-analysis + CacheManager plan-matching come to
    * dominate wall time. Checkpointing truncates the lineage to an RDD
    * scan — every round plans against an O(1)-size tree. (On a real
    * cluster a reliable `checkpoint` to the cluster FS gives the same
    * truncation plus executor-loss recovery.)
    */
  def minLabelComponents(edges: DataFrame): DataFrame = {
    val cols = edges.columns
    require(cols.length == 2,
      s"edges must have 2 columns, got ${cols.mkString(", ")}")
    val e2 = edges.toDF("src", "dst")
    val bidir = e2
      .unionByName(e2.select(col("dst").as("src"), col("src").as("dst")))
      .toDF("id", "nbr")
      .localCheckpoint(true)
    var labels = bidir.select(col("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
      .localCheckpoint(true)
    // Convergence via a monotone signature rather than a join+count: labels
    // only ever decrease, so sum(lbl) is strictly decreasing until the
    // fixpoint. Decimal sum: no overflow at any vertex-count/id scale.
    def sig(df: DataFrame): java.math.BigDecimal = {
      val v = df.agg(sum(col("lbl").cast(DecimalType(38, 0))).as("s"))
        .head.getDecimal(0)
      if (v == null) java.math.BigDecimal.ZERO else v
    }
    var cur = sig(labels)
    var last: java.math.BigDecimal = null
    while (last == null || cur.compareTo(last) != 0) {
      val viaNbr = bidir
        .join(labels.select(col("id").as("nbr"), col("lbl")), "nbr")
        .select("id", "lbl")
      // pointer jumping: adopt the current label's own label too, so
      // label chains compress exponentially — O(log diameter) rounds
      // instead of O(diameter)
      val viaLbl = labels.toDF("id", "mid")
        .join(labels.toDF("mid", "lbl"), "mid")
        .select("id", "lbl")
      val next = labels.unionByName(viaNbr).unionByName(viaLbl)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint(true)
      last = cur
      cur = sig(next)
      labels = next
    }
    labels
  }
}
