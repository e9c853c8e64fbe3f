package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{PortableText => PT, PortableVec => PV}

/** Property-based parity: the native Catalyst expressions must produce
  * exactly the values of the portable SQL higher-order-function builders
  * (whose DuckDB twins the oracle runs). Random-generated inputs, both
  * paths evaluated in Spark, results compared bit-for-bit. */
class NativeExpressionsSpec extends AnyFunSuite with SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val token = Gen.nonEmptyListOf(
    Gen.frequency(9 -> Gen.alphaLowerChar, 1 -> Gen.numChar)).map(_.mkString)

  private def checkRows(df: org.apache.spark.sql.DataFrame, e1: String,
      e2: String): Unit =
    df.select(expr(e1).as("a"), expr(e2).as("b")).collect().foreach { row =>
      assert(row.get(0) === row.get(1), s"$e1 != $e2 on $row")
    }

  private def tokensDf(tss: Seq[Seq[String]]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(tss.map(Row(_)), 2),
      StructType(Seq(StructField("toks", ArrayType(StringType)))))

  test("token hashes: native == portable HOF") {
    graft.functions.native.register(spark)
    val df = tokensDf(samples(Gen.listOf(token), 40))
    checkRows(df, "graft_token_hashes(toks)", PT.tokenHashesSpark("toks"))
  }

  test("tokenizer: native == portable lower/replace/split chain") {
    graft.functions.native.register(spark)
    // arbitrary unicode + ascii text, punctuation-heavy and empty cases
    val text = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '.', ',', '!', '\n', '\t'),
      1 -> Gen.oneOf('Ä', 'ß', 'é', 'И', '中', 'İ'),
      1 -> Gen.asciiPrintableChar)).map(_.mkString)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        samples(text, 60).map(Row(_)), 2),
      StructType(Seq(StructField("text", StringType))))
    checkRows(df, "graft_tokens(text)", PT.tokensSpark("text"))
  }

  test("shingles + minhash bands + simhash + fingerprint parity") {
    graft.functions.native.register(spark)
    val df = tokensDf(samples(Gen.listOfN(12, token), 30))
      .select(expr("graft_token_hashes(toks)").as("th"))
      .select(col("th"), expr("graft_shingles(th)").as("sh"))
    // shingle sets equal (distinctness is set-semantics: compare sorted)
    checkRows(df, "array_sort(graft_shingles(th))",
      s"array_sort(${PT.shingleHashesSpark("th")})")
    checkRows(df, "graft_minhash_bands(sh)",
      PT.bandsSpark(PT.minhashSpark("sh")))
    // raw 32-lane signatures (d_minhash_est_err's agreement audit input)
    checkRows(df, "graft_minhash32(sh)", PT.minhashSpark("sh"))
    checkRows(df, "graft_simhash(th)", PT.simhashSpark("th"))
    checkRows(df, "graft_doc_fingerprint(th)", PT.docFingerprintSpark("th"))
    checkRows(df, "graft_bigram_hashes(th)", PT.bigramHashesSpark("th"))
    // span hashes: both sides dedupe keeping first occurrence, so the
    // arrays are order-identical, not just set-equal
    checkRows(df, "graft_span_hashes(th)", PT.spanHashesSpark("th"))
    // variable-length docs exercise the <8-token empty-span guard
    val varLen = tokensDf(samples(Gen.listOf(token), 40))
      .select(expr("graft_token_hashes(toks)").as("th"))
    checkRows(varLen, "graft_span_hashes(th)", PT.spanHashesSpark("th"))
  }

  test("string hash parity on printable ascii") {
    graft.functions.native.register(spark)
    val strs = samples(Gen.asciiPrintableStr, 40)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(strs.map(Row(_)), 2),
      StructType(Seq(StructField("s", StringType))))
    checkRows(df, "graft_string_hash(s)", PT.charHashSpark("s"))
  }

  test("cosine + lsh bucket parity on random 64-dim float vectors") {
    graft.functions.native.register(spark)
    val vec = Gen.listOfN(64, Gen.chooseNum(-1000, 1000).map(_ / 997.0f))
    val pairs = samples(Gen.zip(vec, vec), 25)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        pairs.map { case (a, b) => Row(a, b) }, 2),
      StructType(Seq(
        StructField("a", ArrayType(FloatType)),
        StructField("b", ArrayType(FloatType)))))
    checkRows(df, "graft_cosine(a, b)", PV.cosineSpark("a", "b"))
    checkRows(df, "graft_lsh_bucket(a)", PV.lshBucketSpark("a"))
    // the 40-plane signature: low byte == the 8-plane bucket (same
    // per-plane rule), full value == the DuckDB-mirrored fold
    val sig = df.select(col("a"),
      graft.functions.native.parameterized(spark,
        es => graft.functions.native.LshSig(es.head, 40), col("a"))
        .as("sig"))
    assert(sig.filter(expr("(sig & 255) != graft_lsh_bucket(a)"))
      .count() === 0L, "sig low byte must equal the 8-plane bucket")
  }

  test("lshBandBits: constant expected bucket size, integer-exact, clamped") {
    import graft.queries.PipelineQueries.lshBandBits
    assert(lshBandBits(1L) === 8)
    assert(lshBandBits(64L * 256) === 8)       // target 256 <= 2^8
    assert(lshBandBits(64L * 256 + 1) === 9)   // next integer boundary
    assert(lshBandBits(64L * (1 << 12)) === 12)
    assert(lshBandBits(200000L) === 12)        // the 100x bench corpus
    assert(lshBandBits(Long.MaxValue / 2) === 20) // clamped ceiling
  }

  test("KMV sketch: exact under k, mergeable estimate within error bound") {
    graft.functions.native.register(spark)
    // under k distinct hashes the sketch IS the distinct set
    val small = spark.range(0, 40)
      .selectExpr("graft_kmv_distinct((id % 1000000007) * 2654435761 % 1000000007) est")
      .head.getDouble(0)
    assert(small === 40.0)
    // 10k distinct over 8 partitions: partial sketches merge across
    // partitions; KMV stderr ~ 1/sqrt(k-2) ~ 13% at k=64 — deterministic
    // input, deterministic estimate, generous 3-sigma band
    val big = spark.range(0, 10000, 1, 8)
      .selectExpr("graft_kmv_distinct((id % 1000000007) * 2654435761 % 1000000007) est")
      .head.getDouble(0)
    assert(big > 6000.0 && big < 14000.0, s"estimate $big")
    // duplicates don't inflate: 10k rows, 50 distinct (< k -> exact),
    // and every partition's partial sketch saw all 50
    val dup = spark.range(0, 10000, 1, 8)
      .selectExpr("graft_kmv_distinct((id % 50 % 1000000007) * 2654435761 % 1000000007) est")
      .head.getDouble(0)
    assert(dup === 50.0)
  }

  test("TopKScored fold == rank window under random data, duplicates, " +
      "ties, and partition counts") {
    graft.functions.native.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(20260815)
    for (trial <- 1 to 3) {
      // scores from a SMALL grid so cross-key ties are common (the
      // payload tie-break must decide), plus injected exact-duplicate
      // (key, score, payload) rows the set semantics must absorb
      val base = (1 to 400).map { _ =>
        (rnd.nextInt(8).toLong, rnd.nextInt(12) / 4.0,
          rnd.nextInt(60).toLong)
      }
      val rows = base ++ base.take(80)
      for (parts <- Seq(1, 7, 32)) {
        val df = rows.toDF("k", "score", "p").repartition(parts)
        val fold = df.groupBy("k")
          .agg(expr("graft_topk_scored(score, p, 4)").as("nb"))
          .select(col("k"), posexplode(col("nb")).as(Seq("i", "e")))
          .select(col("k"), col("i"),
            col("e.score").as("s"), col("e.payload").as("p"))
          .collect().map(r => (r.getLong(0), r.getInt(1),
            r.getDouble(2), r.getLong(3))).toSet
        val expect = rows.distinct.groupBy(_._1).flatMap { case (k, xs) =>
          xs.map(x => (x._2, x._3)).distinct
            .sortBy { case (s, p) => (-s, p) }.take(4).zipWithIndex
            .map { case ((s, p), i) => (k, i, s, p) }
        }.toSet
        assert(fold === expect,
          s"trial $trial parts=$parts: fold != rank-window semantics")
      }
    }
  }

  test("PqCodec encode: native kernel == the HOF SQL fold, bit for bit " +
      "(randomized vectors + codebook, incl. duplicate centroids)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814)
    // flat 16×64 codebook like the registry's seed rule; duplicate one
    // centroid to exercise the first-minimum tie rule
    val flat = Array.tabulate(16, 64)((c, d) =>
      (rnd.nextFloat() - 0.5f) * (1 + (c + d) % 3))
    flat(7) = flat(3).clone()
    val cb = Array.tabulate(8, 16)((si, c) => flat(c).slice(si * 8, (si + 1) * 8))
    val vecs = (0 until 200).map { i =>
      if (i < 16) flat(i).toSeq // exact centroid hits: distance-0 ties
      else Seq.fill(64)((rnd.nextFloat() - 0.5f) * 2)
    }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "v")
      .withColumn("v", col("v").cast("array<float>"))
    val codec = new graft.functions.PqCodec(cb, withNorm = true)
    val native = df.select(col("vec_id"),
      graft.functions.native.parameterized(spark,
        es => graft.functions.PqEncodeExpr(es.head, codec), col("v"))
        .as("pq"))
      .select(col("vec_id"), col("pq.code"), col("pq.rnorm"))
      .collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getDouble(2))).toMap
    // the HOF fold the DuckDB oracle mirrors (the registry's pre-kernel
    // expressions, verbatim)
    val sql = df
      .withColumn("cb", typedLit(flat.map(_.toSeq).toSeq))
      .withColumn("dists", expr(
        """transform(sequence(0, 7), sub ->
          |  transform(sequence(0, 15), c ->
          |    aggregate(sequence(1, 8), CAST(0 AS DOUBLE), (a, j) ->
          |      a + (CAST(element_at(v, sub * 8 + j) AS DOUBLE)
          |           - CAST(element_at(element_at(cb, c + 1), sub * 8 + j) AS DOUBLE))
          |        * (CAST(element_at(v, sub * 8 + j) AS DOUBLE)
          |           - CAST(element_at(element_at(cb, c + 1), sub * 8 + j) AS DOUBLE)))))""".stripMargin))
      .withColumn("code", expr(
        "transform(dists, d -> array_position(d, array_min(d)))"))
      .withColumn("rnorm", expr(
        """sqrt(aggregate(sequence(0, 7), CAST(0 AS DOUBLE), (a, sub) ->
          |  a + aggregate(sequence(1, 8), CAST(0 AS DOUBLE), (b, j) ->
          |    b + CAST(element_at(element_at(cb, CAST(element_at(code, sub + 1) AS INT)), sub * 8 + j) AS DOUBLE)
          |      * CAST(element_at(element_at(cb, CAST(element_at(code, sub + 1) AS INT)), sub * 8 + j) AS DOUBLE))))""".stripMargin))
      .select(col("vec_id"), col("code"), col("rnorm")).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getDouble(2))).toMap
    assert(native.keySet === sql.keySet)
    native.foreach { case (id, (nc, nn)) =>
      val (sc, sn) = sql(id)
      assert(nc === sc, s"vec $id codes differ: $nc vs $sc")
      assert(java.lang.Double.doubleToLongBits(nn) ===
        java.lang.Double.doubleToLongBits(sn),
        s"vec $id rnorm bits differ: $nn vs $sn")
    }
    // and the ADC lookup-sum kernel == the HOF fold, bit for bit
    val luts = (0 until 40).map { i =>
      (i.toLong, Seq.fill(8 * 16)(rnd.nextDouble() * 2 - 1),
        Seq.fill(8)(1L + rnd.nextInt(16).toLong))
    }.toDF("id", "lut", "code")
    val adc = luts.select(col("id"),
      graft.functions.native.parameterized(spark,
        es => graft.functions.PqLutSumExpr(es(0), es(1), 8, 16),
        col("lut"), col("code")).as("n"),
      expr("""aggregate(sequence(0, 7), CAST(0 AS DOUBLE), (a, si) ->
        |  a + element_at(lut, si * 16 + CAST(element_at(code, si + 1) AS INT)))""".stripMargin)
        .as("h"))
      .collect()
    adc.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"lutSum bits differ for id ${r.getLong(0)}")
    }
  }

  test("bigram codes: native kernel == the packed transform-HOF twin") {
    graft.functions.native.register(spark)
    // fixed length >= 2 so the HOF's sequence(1, size-1) never counts down
    val df = tokensDf(samples(Gen.listOfN(12, token), 30) ++
      samples(Gen.listOfN(2, token), 10))
      .select(expr("graft_token_hashes(toks)").as("th"))
    checkRows(df, "graft_bigram_codes(th)",
      "transform(sequence(1, size(th) - 1), " +
        "i -> element_at(th, i) * 2147483648L + element_at(th, i + 1))")
  }

  test("SQ encode + residual fold: native kernels == the 64-lane HOF " +
      "chain, bit for bit (incl. degenerate min == max dims)") {
    graft.functions.native.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(20260818)
    val rows = (0 until 60).map { i =>
      val v = Seq.fill(64)((rnd.nextFloat() - 0.5f) * 4)
      // per-dim bounds: mostly proper mn < mx windows, every 7th dim
      // degenerate (mn == mx) to exercise the CASE branch
      val mns = Seq.tabulate(64)(d =>
        if (d % 7 == 3) 0.25 else -2.0 - rnd.nextDouble())
      val mxs = Seq.tabulate(64)(d =>
        if (d % 7 == 3) 0.25 else 2.0 + rnd.nextDouble())
      (i.toLong, v, mns, mxs)
    }
    val df = rows.toDF("id", "v0", "mns", "mxs")
      .withColumn("v", col("v0").cast("array<float>")).drop("v0")
    // the pre-kernel HOF chain, verbatim (the DuckDB oracle's mirror)
    val hof = df
      .withColumn("code", expr(
        """transform(sequence(1, 64), i ->
          |  CASE WHEN element_at(mxs, i) = element_at(mns, i) THEN 0L
          |  ELSE CAST(floor((CAST(element_at(v, i) AS DOUBLE) - element_at(mns, i))
          |       * 255.0D / (element_at(mxs, i) - element_at(mns, i))) AS BIGINT)
          |  END)""".stripMargin))
      .withColumn("deq", expr(
        """transform(sequence(1, 64), i ->
          |  element_at(mns, i) + CAST(element_at(code, i) AS DOUBLE)
          |    * (element_at(mxs, i) - element_at(mns, i)) / 255.0D)""".stripMargin))
      .withColumn("cnorm", expr(PV.normSpark("deq")))
      .withColumn("err", expr(
        """aggregate(sequence(1, 64), 0L, (a, i) ->
          |  a + CAST(floor(abs(CAST(element_at(v, i) AS DOUBLE)
          |        - element_at(deq, i)) * 1000000000.0D + 0.5D)
          |      AS BIGINT))""".stripMargin))
      .select("id", "code", "deq", "cnorm", "err").collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Long](1), r.getSeq[Double](2), r.getDouble(3),
          r.getLong(4))).toMap
    val nat = df
      .select(col("id"), col("v"), expr("graft_sq64(v, mns, mxs)").as("sq"))
      .select(col("id"), col("sq.code").as("code"), col("sq.deq").as("deq"),
        col("sq.cnorm").as("cnorm"),
        expr("graft_sq_abserr_e9(v, sq.deq)").as("err"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Long](1), r.getSeq[Double](2), r.getDouble(3),
          r.getLong(4))).toMap
    assert(nat.keySet === hof.keySet)
    nat.foreach { case (id, (nc, nd, nn, ne)) =>
      val (hc, hd, hn, he) = hof(id)
      assert(nc === hc, s"row $id codes differ")
      nd.zip(hd).zipWithIndex.foreach { case ((a, b), d) =>
        assert(java.lang.Double.doubleToLongBits(a) ===
          java.lang.Double.doubleToLongBits(b),
          s"row $id deq[$d] bits differ: $a vs $b")
      }
      assert(java.lang.Double.doubleToLongBits(nn) ===
        java.lang.Double.doubleToLongBits(hn),
        s"row $id cnorm bits differ: $nn vs $hn")
      assert(ne === he, s"row $id abs-err differs: $ne vs $he")
    }
  }

  test("PQ LUT build: native kernel == the 128-entry HOF twin, bit for bit") {
    graft.functions.native.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(20260817)
    val flat = Array.tabulate(16, 64)((c, d) =>
      (rnd.nextFloat() - 0.5f) * (1 + (c + d) % 3))
    val cb = Array.tabulate(8, 16)((si, c) =>
      flat(c).slice(si * 8, (si + 1) * 8))
    val df = (0 until 40).map { i =>
      (i.toLong, Seq.fill(64)((rnd.nextFloat() - 0.5f) * 2))
    }.toDF("id", "v0").withColumn("v", col("v0").cast("array<float>"))
    val codec = new graft.functions.PqCodec(cb, withNorm = false)
    val out = df
      .withColumn("cb", typedLit(flat.map(_.toSeq).toSeq))
      .select(col("id"),
        graft.functions.native.parameterized(spark,
          es => graft.functions.PqLutBuildExpr(es.head, codec), col("v"))
          .as("n"),
        expr(
          """flatten(transform(sequence(0, 7), sub ->
            |  transform(sequence(0, 15), c ->
            |    aggregate(sequence(1, 8), CAST(0 AS DOUBLE), (a, j) ->
            |      a + CAST(element_at(v, sub * 8 + j) AS DOUBLE)
            |        * CAST(element_at(element_at(cb, c + 1), sub * 8 + j) AS DOUBLE)))))""".stripMargin)
          .as("h"))
      .collect()
    out.foreach { r =>
      val n = r.getSeq[Double](1); val h = r.getSeq[Double](2)
      assert(n.length === 128 && h.length === 128)
      n.zip(h).zipWithIndex.foreach { case ((a, b), e) =>
        assert(java.lang.Double.doubleToLongBits(a) ===
          java.lang.Double.doubleToLongBits(b),
          s"id ${r.getLong(0)} lut[$e] bits differ: $a vs $b")
      }
    }
  }

  test("native expressions run under codegen-only (no interpreted fallback)") {
    // a Janino compile error in doGenCode would silently fall back to the
    // interpreted path in normal mode; CODEGEN_ONLY + fallback=false turns
    // that silent performance loss into a test failure
    graft.functions.native.register(spark)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      import spark.implicits._
      val docs = Seq("alpha beta gamma delta", "one two three four")
        .toDF("text")
      val textOut = docs.selectExpr(
        "graft_string_hash(text) h",
        "graft_doc_fingerprint(graft_token_hashes(split(text, ' '))) fp",
        "graft_simhash(graft_token_hashes(split(text, ' '))) sh",
        "graft_minhash_bands(graft_shingles(graft_token_hashes(split(text, ' ')))) mb",
        "graft_bigram_hashes(graft_token_hashes(split(text, ' '))) bh",
        "graft_bigram_codes(graft_token_hashes(split(text, ' '))) bc"
      ).collect()
      assert(textOut.length === 2)
      val vecs = Seq(Array.fill(64)(0.5f), Array.tabulate(64)(_.toFloat / 64))
        .toDF("v")
      val vecOut = vecs.selectExpr(
        "graft_cosine(v, v) c", "graft_lsh_bucket(v) bk").collect()
      assert(vecOut.length === 2)
      // SQ encode + residual fold kernels stay inside generated code
      val sqOut = vecs
        .withColumn("mns", expr("transform(sequence(1, 64), i -> -1.0D)"))
        .withColumn("mxs", expr("transform(sequence(1, 64), i -> 2.0D)"))
        .selectExpr("graft_sq64(v, mns, mxs) sq")
        .selectExpr("sq.code", "sq.cnorm").collect()
      assert(sqOut.length === 2 && sqOut.forall(_.getSeq[Long](0).size == 64))
      // the PQ encode kernel must also stay inside generated code
      val codec = new graft.functions.PqCodec(
        Array.tabulate(8, 16, 8)((si, c, j) => (si + c + j).toFloat / 32),
        withNorm = true)
      val pqOut = vecs.select(graft.functions.native.parameterized(spark,
          es => graft.functions.PqEncodeExpr(es.head, codec), col("v"))
          .as("pq"))
        .select(col("pq.code"), col("pq.rnorm")).collect()
      assert(pqOut.length === 2 && pqOut.forall(_.getSeq[Long](0).size == 8))
    } finally {
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("PQ kernels validate shape, nulls, and code range before unchecked reads") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.functions.{PqAdc, PqCodec}
    // m=2 subspaces, ks=4 codes, sub=3 dims
    val cb = Array.tabulate(2, 4)((si, c) =>
      Array.tabulate(3)(j => (si + c + j).toFloat))
    val codec = new PqCodec(cb, withNorm = false)
    // short embedding: 5 elements vs m*sub = 6 — garbage read without guard
    val short = new GenericArrayData(Array.tabulate(5)(_.toFloat))
    assert(intercept[IllegalArgumentException](codec.encode(short))
      .getMessage.contains("m*sub"))
    // null element — UnsafeArrayData would silently read 0
    val withNull = new GenericArrayData(
      Array[Any](1.0f, null, 3.0f, 4.0f, 5.0f, 6.0f))
    assert(intercept[IllegalArgumentException](codec.encode(withNull))
      .getMessage.contains("null"))
    // well-formed input still encodes
    val ok = new GenericArrayData(Array.tabulate(6)(_.toFloat))
    assert(codec.encode(ok).getArray(0).numElements() === 2)
    // ADC: shape mismatches and out-of-range codes (a corrupted/foreign
    // codes.parquet fed to pqSearchIndex) fail loudly
    val lut = new GenericArrayData(Array.tabulate(8)(_.toDouble))
    val goodCode = new GenericArrayData(Array(1L, 4L))
    assert(PqAdc.lutSum(lut, goodCode, 2, 4) === 7.0) // lut(0) + lut(7)
    intercept[IllegalArgumentException](
      PqAdc.lutSum(lut, new GenericArrayData(Array(1L)), 2, 4))
    intercept[IllegalArgumentException](
      PqAdc.lutSum(new GenericArrayData(Array(1.0)), goodCode, 2, 4))
    assert(intercept[IllegalArgumentException](
      PqAdc.lutSum(lut, new GenericArrayData(Array(0L, 4L)), 2, 4))
      .getMessage.contains("out of range"))
    assert(intercept[IllegalArgumentException](
      PqAdc.lutSum(lut, new GenericArrayData(Array(1L, 5L)), 2, 4))
      .getMessage.contains("out of range"))
  }
}
