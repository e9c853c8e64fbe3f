package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGries

/** Pins the Misra-Gries guarantees the two-pass heavy-hitter plan
  * (q_heavy_hitters / stream_heavy_hitters) rests on: bounded summary
  * size, the N/(k+1) undercount bound under arbitrary fold/merge trees,
  * and partitioning-independence of the verified exact output. */
class MisraGriesSpec extends AnyFunSuite with SparkSpec {

  private def fold(k: Int, items: Seq[Long]): java.util.HashMap[Long, Long] = {
    val m = new java.util.HashMap[Long, Long]
    items.foreach(MisraGries.add(m, k, _, 1L))
    m
  }

  test("fold: size stays <= k and undercount <= N/(k+1) on skewed data") {
    val rnd = new scala.util.Random(7)
    // zipf-ish: item i drawn with weight ~ 1/(i+1); ~500 distinct >> k
    val items = (1 to 20000).map { _ =>
      (math.pow(rnd.nextDouble(), 3.0) * 500).toLong
    }
    for (k <- Seq(3, 15, 127)) {
      val m = fold(k, items)
      assert(m.size <= k, s"k=$k: summary grew to ${m.size}")
      val exact = items.groupBy(identity).map { case (i, xs) =>
        i -> xs.size.toLong
      }
      val bound = items.size.toLong / (k + 1)
      exact.foreach { case (item, n) =>
        val est = m.getOrDefault(item, 0L)
        assert(est <= n, s"k=$k item $item: MG overcounted $est > $n")
        assert(n - est <= bound,
          s"k=$k item $item: undercount ${n - est} > N/(k+1)=$bound")
      }
      // corollary: every item with count > N/(k+1) is resident
      exact.filter(_._2 > bound).keys.foreach { hh =>
        assert(m.containsKey(hh), s"k=$k: heavy hitter $hh evicted")
      }
    }
  }

  test("merge: arbitrary merge trees keep the combined-stream bound") {
    val rnd = new scala.util.Random(13)
    val items = (1 to 8000).map(_ => (rnd.nextInt(120) * rnd.nextInt(4)).toLong)
    val k = 9
    // random partitioning into 7 sub-streams, pairwise merged left fold
    val parts = items.groupBy(_ => rnd.nextInt(7)).values.toSeq
    val merged = parts.map(fold(k, _)).reduceLeft { (a, b) =>
      MisraGries.merge(a, k, b); a
    }
    assert(merged.size <= k)
    val exact = items.groupBy(identity).map { case (i, xs) =>
      i -> xs.size.toLong
    }
    val bound = items.size.toLong / (k + 1)
    exact.foreach { case (item, n) =>
      val est = merged.getOrDefault(item, 0L)
      assert(est <= n && n - est <= bound,
        s"merge broke the bound on $item: est $est, exact $n")
    }
  }

  test("graft_frequent: candidates are a superset of the true heavy set " +
      "under any partitioning, size-bounded, sorted") {
    graft.functions.native.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val vals = (1 to 30000).map(_ =>
      (math.pow(rnd.nextDouble(), 4.0) * 300).toLong)
    val exact = vals.groupBy(identity).map { case (i, xs) =>
      i -> xs.size.toLong
    }
    val k = 31
    val bound = vals.size.toLong / (k + 1)
    val heavy = exact.filter(_._2 > bound).keySet
    assert(heavy.nonEmpty, "test data produced no heavy hitters")
    for (parts <- Seq(1, 4, 32)) {
      val cand = vals.toDF("v").repartition(parts)
        .agg(expr(s"graft_frequent(v, $k)")).as[Array[Long]].head()
      assert(cand.length <= k, s"parts=$parts: ${cand.length} > k")
      assert(cand.toSeq === cand.toSeq.sorted, "candidates not sorted")
      heavy.foreach(h => assert(cand.contains(h),
        s"parts=$parts: heavy hitter $h missing from candidates"))
    }
  }

  test("two-pass exact plan == plain GROUP BY / HAVING at both shuffle " +
      "widths (q_heavy_hitters shape)") {
    graft.functions.native.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val vals = (1 to 20000).map(_ =>
      (math.pow(rnd.nextDouble(), 3.5) * 400).toLong)
    val df = vals.toDF("bin")
    def twoPass(parts: Int): Map[Long, Long] = {
      val b = df.repartition(parts)
      val cand = b.agg(expr("graft_frequent(bin, 127)").as("cand"),
          count(lit(1)).as("n"))
        .select(explode(col("cand")).as("bin"),
          expr("(n + 63) div 64").as("thr"))
      b.join(broadcast(cand), "bin")
        .groupBy("bin", "thr").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= col("thr"))
        .select("bin", "cnt").as[(Long, Long)].collect().toMap
    }
    val n = vals.size.toLong
    val thr = (n + 63) / 64
    val direct = vals.groupBy(identity).map { case (i, xs) =>
      i -> xs.size.toLong
    }.filter(_._2 >= thr)
    assert(direct.nonEmpty)
    assert(twoPass(2) === direct, "two-pass != exact at 2 partitions")
    assert(twoPass(32) === direct, "two-pass != exact at 32 partitions")
  }
}
