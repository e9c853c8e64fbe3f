package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TimeSeriesAggregator._

/** Property test: the distributed chunk-partitioned pipeline must agree
  * with a naive single-threaded reference implementation of the same
  * semantics on random timestamp sets — this is what catches
  * chunk-boundary and tie-break bugs that hand-picked cases miss. */
class TSAPropertySpec extends AnyFunSuite with SparkSpec {

  private val us = 1000000L
  private val base = 1704067200L * us

  // deliberately tiny chunks (10 s) so random data crosses many boundaries
  private val cfg = UdimConfig("ts", "id", minStepUs = 1500000L,
    nomStepUs = 2000000L, gapThresholdUs = 5000000L, chunkUs = 10 * us)

  /** Naive reference: sort, stateless lag-dedup, interior gap fill. */
  private def naive(ts: Seq[Long]): (Seq[Long], Seq[Long]) = {
    val sorted = ts.filter(_ > 0).sorted
    val kept = sorted.zipWithIndex.filter { case (t, i) =>
      i == 0 || t - sorted(i - 1) >= cfg.minStepUs
    }.map(_._1)
    val fills = kept.zip(kept.drop(1)).flatMap { case (a, b) =>
      if (b - a > cfg.gapThresholdUs)
        (1L to fillCount(b - a, cfg.nomStepUs)).map(k => a + k * cfg.nomStepUs)
      else Nil
    }
    (kept, fills)
  }

  private def mk(ts: Seq[Long]) = {
    val rows = ts.zipWithIndex.map { case (t, i) =>
      Row(java.time.LocalDateTime.ofEpochSecond(
        t / us, ((t % us) * 1000).toInt, java.time.ZoneOffset.UTC),
        i.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("ts", TimestampNTZType),
        StructField("id", LongType))))
  }

  test("distributed dedupe+gapFill == naive reference on random inputs") {
    val gen = Gen.chooseNum(1, 120)
      .flatMap(n => Gen.listOfN(n,
        Gen.chooseNum(0L, 100L * us).map(base + _)))
      .map(_.distinct) // distinct ts: the naive model has no id tie-break
    (0 until 12).foreach { i =>
      val ts = gen.apply(Gen.Parameters.default, Seed(7L + i)).get
      val (expKept, expFills) = naive(ts)
      val out = gapFill(dedupe(filterValid(mk(ts), cfg), cfg), cfg)
      val gotKept = out.filter(!col("__is_fill")).select(T)
        .collect().map(_.getLong(0)).toSeq.sorted
      val gotFills = out.filter(col("__is_fill")).select(T)
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(gotKept === expKept, s"kept mismatch for seed ${7 + i}")
      assert(gotFills === expFills.sorted, s"fills mismatch for seed ${7 + i}")
    }
  }

  test("fill count uses numpy's half-even tie rule (within-file formula)") {
    // Reference WITHIN-file rule np.round(gap*hz)-1 (aggrelist.py:298):
    // round_he(2.5)-1=1, round_he(3.5)-1=3, round_he(4.5)-1=3 — half-up
    // would give 2/3/4. The reference's BETWEEN-file formula
    // np.round((gap-dt_nom)*hz) (aggregator.py:171) disagrees with its
    // own within-file rule by exactly 1 at these half-step ties; graft
    // applies the within-file arithmetic to its single unified stream
    // (deliberate divergence, see TimeSeriesAggregator.fillCountSpark).
    val n = cfg.nomStepUs
    assert(fillCount(5 * n / 2, n) === 1)  // gap = 2.5 steps -> 1 fill
    assert(fillCount(7 * n / 2, n) === 3)  // gap = 3.5 steps -> 3 fills
    assert(fillCount(9 * n / 2, n) === 3)  // gap = 4.5 steps -> 3 (not 4)
    assert(fillCount(3 * n, n) === 2)      // exact 3 steps  -> 2 fills
    assert(fillCount(3 * n + 1, n) === 2)  // jitter stays put
    // end-to-end through the Spark plan: two records 4.5 steps apart
    // (exceeds the 2.5-step gap threshold; even quotient, so half-up
    // would wrongly synthesize a 4th fill half a step before the
    // resuming record)
    val ts = Seq(base, base + 9 * n / 2)
    val out = gapFill(filterValid(mk(ts), cfg), cfg)
    val fills = out.filter(col("__is_fill")).select(T)
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(fills === Seq(base + n, base + 2 * n, base + 3 * n))
  }

  test("fused aggregate (bounds + edge fills) == naive on random inputs") {
    val lo = base + 10 * us
    val hi = base + 90 * us
    val cfgB = cfg.copy(boundsUs = Some((lo, hi)), fillEdges = true)
    def naiveFull(ts: Seq[Long]): (Seq[Long], Seq[Long]) = {
      val sorted = ts.filter(t => t > 0 && t >= lo && t <= hi).sorted
      val kept = sorted.zipWithIndex.filter { case (t, i) =>
        i == 0 || t - sorted(i - 1) >= cfgB.minStepUs
      }.map(_._1)
      val interior = kept.zip(kept.drop(1)).flatMap { case (a, b) =>
        if (b - a > cfgB.gapThresholdUs)
          (1L to fillCount(b - a, cfgB.nomStepUs))
            .map(k => a + k * cfgB.nomStepUs)
        else Nil
      }
      val edges =
        if (kept.isEmpty) Nil
        else {
          val leads = (1L to (kept.head - lo) / cfgB.nomStepUs)
            .map(k => kept.head - k * cfgB.nomStepUs)
          val trails = (1L to (hi - kept.last) / cfgB.nomStepUs)
            .map(k => kept.last + k * cfgB.nomStepUs)
          leads ++ trails
        }
      (kept, (interior ++ edges).sorted)
    }
    val gen = Gen.chooseNum(1, 120)
      .flatMap(n => Gen.listOfN(n,
        Gen.chooseNum(0L, 100L * us).map(base + _)))
      .map(_.distinct)
    (0 until 12).foreach { i =>
      val ts = gen.apply(Gen.Parameters.default, Seed(91L + i)).get
      val (expKept, expFills) = naiveFull(ts)
      val out = graft.core.TimeSeriesAggregator.aggregate(mk(ts), cfgB)
        .select(unix_micros(col("ts").cast(TimestampType)).as("t"),
          col("is_fill"))
      val gotKept = out.filter(!col("is_fill")).select("t")
        .collect().map(_.getLong(0)).toSeq.sorted
      val gotFills = out.filter(col("is_fill")).select("t")
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(gotKept === expKept, s"kept mismatch for seed ${91 + i}")
      assert(gotFills === expFills, s"fills mismatch for seed ${91 + i}")
    }
  }
}
