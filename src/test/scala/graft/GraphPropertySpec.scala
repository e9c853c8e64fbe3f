package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Graph

/** Property test: distributed min-label propagation (pointer jumping,
  * localCheckpoint rounds) must agree with a driver-side union-find on
  * random graphs — this is what catches propagation bugs (a label that
  * stops short of the component minimum, or leaks across components) that
  * the fixed near-dup fixture cannot. */
class GraphPropertySpec extends AnyFunSuite with SparkSpec {

  /** Union-find reference: component minimum per vertex. */
  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(v => v -> find(v)).toMap
  }

  private val genEdges: Gen[List[(Long, Long)]] = for {
    nV <- Gen.choose(2, 60)
    nE <- Gen.choose(1, 120)
    es <- Gen.listOfN(nE, for {
      a <- Gen.choose(0L, nV.toLong - 1)
      b <- Gen.choose(0L, nV.toLong - 1)
    } yield (a, b))
  } yield es.filter { case (a, b) => a != b } // self-loops excluded:
  // operator input (doc_a < doc_b pairs) never produces them

  test("minLabelComponents == union-find on random graphs") {
    import spark.implicits._
    // long chains force multiple pointer-jumping rounds; random graphs
    // cover merges across dense components
    val chain = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toList
    val cases = chain +: (1 to 12).flatMap(i =>
      genEdges(Gen.Parameters.default, Seed(i.toLong)).toList)
    cases.foreach { edges =>
      whenever(edges.nonEmpty) {
        val got = Graph
          .minLabelComponents(edges.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === reference(edges), s"edges: $edges")
      }
    }
  }

  private def whenever(c: Boolean)(f: => Unit): Unit = if (c) f
}
