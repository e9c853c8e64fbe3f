package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.AggConfig._
import graft.sources.{NetCDF4, NetCDFWrite}

/** Single-file `.nc` output at corpus scale: up to `maxRows` the frame is
  * assembled in driver memory; above it, `write` FAILS OVER to the
  * streamed columnar assembly — one variable at a time, one chunk in
  * driver memory, unbounded output size — the reference's own
  * node-by-node streaming model (aggregator.py:239-359). Both paths must
  * produce semantically identical files.
  */
class NcWriteGuardSpec extends AnyFunSuite with SparkSpec {

  private def cfg = Config(
    dims = Seq(DimSpec("record", None, indexBy = Some("t"))),
    vars = Seq(
      VarSpec("t", Seq("record"), "double"),
      VarSpec("x", Seq("record"), "double")),
    attrs = Nil)

  private def shuffledFrame(tmp: String, n: Int): Unit =
    spark.range(n).selectExpr(
        s"cast((id * 7919) % $n as double) as t", "cast(id as double) * 2 as x")
      .repartition(8)
      .write.parquet(s"$tmp/agg")

  test("above maxRows, write fails over to the streamed columnar assembly") {
    val tmp = Files.createTempDirectory("ncguard").toString
    shuffledFrame(tmp, 2000)
    // maxRows = 100 forces the streamed path; chunkRows = 64 forces real
    // multi-chunk output through datasetChunks
    NetCDFWrite.write(spark, s"$tmp/agg", s"$tmp/out.nc", cfg,
      globalAttrs = Some(Map("title" -> "streamed")), maxRows = 100,
      opts = NetCDFWrite.NcOpts(chunkRows = Some(64)))
    val nc = NetCDF4.open(s"$tmp/out.nc")
    assert(nc.attrs("title") === "streamed")
    val t = nc.read(nc.vars.find(_.name == "t").get).asInstanceOf[Array[Double]]
    val x = nc.read(nc.vars.find(_.name == "x").get).asInstanceOf[Array[Double]]
    assert(t.length == 2000)
    assert(t.toSeq == t.sorted.toSeq, "record order must follow the index var")
    assert(t.toSet == (0 until 2000).map(_.toDouble).toSet)
    // x stays row-aligned with t through the columnar passes
    val tx = t.zip(x).toMap
    assert((0 until 2000).forall { i =>
      val tv = ((i.toLong * 7919) % 2000).toDouble
      tx(tv) == i * 2.0
    }, "x must stay row-aligned with t")
  }

  test("streamed and in-memory assemblies produce equivalent files") {
    val tmp = Files.createTempDirectory("ncguard_eq").toString
    shuffledFrame(tmp, 500)
    NetCDFWrite.write(spark, s"$tmp/agg", s"$tmp/mem.nc", cfg,
      globalAttrs = Some(Map("k" -> "v")), maxRows = 10000)
    NetCDFWrite.writeSingleStreamed(spark, s"$tmp/agg", s"$tmp/str.nc", cfg,
      globalAttrs = Some(Map("k" -> "v")))
    val (a, b) = (NetCDF4.open(s"$tmp/mem.nc"), NetCDF4.open(s"$tmp/str.nc"))
    assert(a.attrs === b.attrs)
    assert(a.vars.map(_.name).toSet === b.vars.map(_.name).toSet)
    a.vars.foreach { va =>
      val vb = b.vars.find(_.name == va.name).get
      assert(va.dtype === vb.dtype, s"${va.name} dtype")
      assert(a.read(va).asInstanceOf[Array[Double]].toSeq ===
        b.read(vb).asInstanceOf[Array[Double]].toSeq, s"${va.name} values")
    }
  }

  test("streamed path: strings and ragged arrays with stats-planned extents") {
    val tmp = Files.createTempDirectory("ncguard_str").toString
    import spark.implicits._
    (0 until 300).map { i =>
      (i.toDouble, s"s$i" * (1 + i % 3), Seq.tabulate(1 + i % 3)(j => i + j * 0.5))
    }.toDF("t", "name", "vals")
      .repartition(4)
      .write.parquet(s"$tmp/agg")
    val c = Config(
      dims = Seq(DimSpec("record", None, indexBy = Some("t")),
        DimSpec("d2", None)),
      vars = Seq(
        VarSpec("t", Seq("record"), "double"),
        VarSpec("name", Seq("record"), "string"),
        VarSpec("vals", Seq("record", "d2"), "double")),
      attrs = Nil)
    NetCDFWrite.writeSingleStreamed(spark, s"$tmp/agg", s"$tmp/out.nc", c,
      globalAttrs = Some(Map.empty),
      opts = NetCDFWrite.NcOpts(chunkRows = Some(32)))
    val nc = NetCDF4.open(s"$tmp/out.nc")
    val names = nc.read(nc.vars.find(_.name == "name").get)
      .asInstanceOf[Array[String]]
    assert(names.length == 300)
    assert((0 until 300).forall(i => names(i) == s"s$i" * (1 + i % 3)),
      "string cells must hold the stats-planned global width")
    val valsVar = nc.vars.find(_.name == "vals").get
    assert(valsVar.shape === Seq(300L, 3L), "ragged inner dim sized to max")
    val vals = nc.read(valsVar).asInstanceOf[Array[Double]]
    // row i holds its 1 + i%3 values, shorter rows padded (null -> NaN)
    assert(vals(0 * 3) == 0.0 && vals(0 * 3 + 1).isNaN)
    assert(vals(2 * 3) == 2.0 && vals(2 * 3 + 1) == 2.5 && vals(2 * 3 + 2) == 3.0)
  }

  test("a single .nc OVER 2 GiB streams out and reads back (64-bit both ways)") {
    import graft.sources.{Hdf5Reader, Hdf5Writer}
    import Hdf5Writer._
    val tmp = Files.createTempDirectory("ncguard_big").toString
    val dst = java.nio.file.Paths.get(tmp, "big.nc")
    // 3 record datasets x 96M doubles (768 MiB each) = 2.25 GiB of data;
    // 8 MiB chunks fed from an iterator that reuses one buffer — driver
    // memory stays one chunk regardless of file size
    val rowsPerChunk = 1 << 20
    val chunksPerDs = 96
    val nRows = rowsPerChunk.toLong * chunksPerDs
    Hdf5Writer.streamTo(dst) { w =>
      for (d <- 0 until 3) {
        val buf = java.nio.ByteBuffer.allocate(rowsPerChunk * 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val payloads = Iterator.tabulate(chunksPerDs) { ci =>
          buf.clear()
          var i = 0
          while (i < rowsPerChunk) { buf.putDouble(d * 1000.0 + ci); i += 1 }
          buf.array()
        }
        w.datasetChunks(WDataset(s"v$d", Seq(nRows), WF64, None, Nil,
          unlimited0 = true, chunkRows = Some(rowsPerChunk)), payloads)
      }
      w.finish(Seq("title" -> WStrAttr("big streamed")))
    }
    assert(Files.size(dst) > (2L << 30), s"file is ${Files.size(dst)} B")
    val h5 = Hdf5Reader.open(dst.toString) // >= 2 GiB: the pread source
    try {
      assert(h5.rootAttrs("title") === "big streamed")
      val v2 = h5.datasets.find(_.name == "v2").get
      assert(v2.shape === Seq(nRows))
      val vals = h5.read(v2).asInstanceOf[Array[Double]]
      assert(vals(0) == 2000.0)
      assert(vals((5L * rowsPerChunk).toInt) == 2005.0) // chunk 5
      assert(vals.last == 2000.0 + chunksPerDs - 1)
    } finally {
      h5.close()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("property: streamed == in-memory across random schemas and data") {
    import spark.implicits._
    for (seed <- Seq(7, 21, 1717); n <- Seq(0, 1, 137)) {
      val rnd = new scala.util.Random(seed * 1000 + n)
      val tmp = Files.createTempDirectory(s"ncguard_prop$seed$n").toString
      val rows = (0 until n).map { i =>
        (i.toDouble,
          if (rnd.nextInt(10) == 0) null
          else "x" * rnd.nextInt(12), // varying width incl. empty
          if (rnd.nextInt(10) == 0) null
          else java.lang.Long.valueOf(
            if (rnd.nextBoolean()) rnd.nextInt(1000).toLong
            else Long.MaxValue - rnd.nextInt(1000)), // forces 64-bit ints
          if (rnd.nextInt(10) == 0) null
          else java.lang.Float.valueOf(rnd.nextFloat()),
          Seq.tabulate(rnd.nextInt(4))(j => i + j * 0.25)) // ragged 0..3
      }
      rows.toDF("t", "s", "l", "f", "a").repartition(3)
        .write.parquet(s"$tmp/agg")
      val c = Config(
        dims = Seq(DimSpec("record", None, indexBy = Some("t")),
          DimSpec("d2", None)),
        vars = Seq(
          VarSpec("t", Seq("record"), "double"),
          VarSpec("s", Seq("record"), "string"),
          VarSpec("l", Seq("record"), "long"),
          VarSpec("f", Seq("record"), "float"),
          VarSpec("a", Seq("record", "d2"), "double")),
        attrs = Nil)
      NetCDFWrite.write(spark, s"$tmp/agg", s"$tmp/mem.nc", c,
        globalAttrs = Some(Map("seed" -> seed.toString)), maxRows = 1 << 20)
      NetCDFWrite.writeSingleStreamed(spark, s"$tmp/agg", s"$tmp/str.nc", c,
        globalAttrs = Some(Map("seed" -> seed.toString)),
        opts = NetCDFWrite.NcOpts(chunkRows = Some(13))) // force multi-chunk
      val (x, y) = (NetCDF4.open(s"$tmp/mem.nc"), NetCDF4.open(s"$tmp/str.nc"))
      assert(x.attrs === y.attrs, s"seed=$seed n=$n attrs")
      x.vars.foreach { vx =>
        val vy = y.vars.find(_.name == vx.name).get
        assert(vx.dtype === vy.dtype, s"seed=$seed n=$n ${vx.name} dtype")
        assert(vx.shape === vy.shape, s"seed=$seed n=$n ${vx.name} shape")
        (x.read(vx), y.read(vy)) match {
          case (a: Array[Double], b: Array[Double]) =>
            assert(a.length == b.length)
            assert(a.indices.forall(i =>
              a(i) == b(i) || (a(i).isNaN && b(i).isNaN)),
              s"seed=$seed n=$n ${vx.name} doubles")
          case (a: Array[Float], b: Array[Float]) =>
            assert(a.indices.forall(i =>
              a(i) == b(i) || (a(i).isNaN && b(i).isNaN)),
              s"seed=$seed n=$n ${vx.name} floats")
          case (a, b) =>
            assert(a.asInstanceOf[Array[_]].toSeq ===
              b.asInstanceOf[Array[_]].toSeq, s"seed=$seed n=$n ${vx.name}")
        }
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("streamed assembly makes exactly 2 full passes, independent of variable count") {
    // The single-pass restructure's structural pin: one stats aggregate
    // + one interleaved row pass. A regression to per-variable column
    // passes would count 1 + nVars (here 6) instead of 2.
    import spark.implicits._
    val tmp = Files.createTempDirectory("ncguard_pass").toString
    (0 until 200).map { i =>
      (i.toDouble, s"n$i", i.toLong, i * 0.5f, i * 2.0,
        Seq.tabulate(1 + i % 3)(j => i + j * 0.25))
    }.toDF("t", "s", "l", "f", "x", "a").repartition(4)
      .write.parquet(s"$tmp/agg")
    val c = Config(
      dims = Seq(DimSpec("record", None, indexBy = Some("t")),
        DimSpec("d2", None)),
      vars = Seq(
        VarSpec("t", Seq("record"), "double"),
        VarSpec("s", Seq("record"), "string"),
        VarSpec("l", Seq("record"), "long"),
        VarSpec("f", Seq("record"), "float"),
        VarSpec("x", Seq("record"), "double"),
        VarSpec("a", Seq("record", "d2"), "double")),
      attrs = Nil)
    NetCDFWrite.passCounter.set(0)
    NetCDFWrite.writeSingleStreamed(spark, s"$tmp/agg", s"$tmp/out.nc", c,
      globalAttrs = Some(Map.empty),
      opts = NetCDFWrite.NcOpts(chunkRows = Some(16)))
    assert(NetCDFWrite.passCounter.get === 2,
      "streamed assembly must stay at stats + data = 2 full passes")
    // and the interleaved pass still wrote a coherent file
    val nc = NetCDF4.open(s"$tmp/out.nc")
    val t = nc.read(nc.vars.find(_.name == "t").get).asInstanceOf[Array[Double]]
    val x = nc.read(nc.vars.find(_.name == "x").get).asInstanceOf[Array[Double]]
    assert(t.length == 200 && x.length == 200)
    assert(t.indices.forall(i => x(i) == t(i) * 2.0),
      "columns must stay row-aligned through the interleaved streams")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("a failed write never truncates a pre-existing output file") {
    import graft.sources.Hdf5Writer
    import Hdf5Writer._
    val tmp = Files.createTempDirectory("ncguard_atomic")
    val dst = tmp.resolve("out.nc")
    val good = java.nio.ByteBuffer.allocate(32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 4).foreach(i => good.putDouble(i * 1.5))
    Hdf5Writer.write(dst, Seq(
      WDataset("v", Seq(4L), WF64, Some(good.array()), Nil)), Nil)
    val origSize = Files.size(dst)
    // second write fails validation mid-feed (wrong data length): the
    // temp-and-rename protocol must leave the original file untouched
    intercept[IllegalArgumentException] {
      Hdf5Writer.write(dst, Seq(
        WDataset("v", Seq(4L), WF64, Some(new Array[Byte](8)), Nil)), Nil)
    }
    assert(Files.size(dst) === origSize, "original must survive the failure")
    val h5 = graft.sources.Hdf5Reader.open(dst.toString)
    assert(h5.read(h5.datasets.find(_.name == "v").get)
      .asInstanceOf[Array[Double]].toSeq === Seq(0.0, 1.5, 3.0, 4.5))
    assert(Option(tmp.toFile.listFiles()).getOrElse(Array.empty)
      .forall(!_.getName.endsWith(".__tmp")), "temp file must be cleaned up")
  }

  test("under the gate, the in-memory path writes a sorted file") {
    val tmp = Files.createTempDirectory("ncguard2").toString
    shuffledFrame(tmp, 1000)
    NetCDFWrite.write(spark, s"$tmp/agg", s"$tmp/out.nc", cfg,
      globalAttrs = Some(Map("title" -> "guard spec")), maxRows = 1000)
    val nc = NetCDF4.open(s"$tmp/out.nc")
    val t = nc.read(nc.vars.find(_.name == "t").get).asInstanceOf[Array[Double]]
    assert(t.length == 1000)
    assert(t.toSeq == t.sorted.toSeq, "record order must follow the index var")
    assert(t.toSet == (0 until 1000).map(_.toDouble).toSet)
  }
}
