package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.AggConfig._
import graft.sources.{NetCDF4, NetCDFWrite}

/** The single-file `.nc` path assembles driver-side by construction (one
  * HDF5 file = one writer), so it must REFUSE corpus-sized frames with an
  * actionable error naming the distributed path, never OOM the driver.
  */
class NcWriteGuardSpec extends AnyFunSuite with SparkSpec {

  private def cfg = Config(
    dims = Seq(DimSpec("record", None, indexBy = Some("t"))),
    vars = Seq(
      VarSpec("t", Seq("record"), "double"),
      VarSpec("x", Seq("record"), "double")),
    attrs = Nil)

  test("write refuses a frame above maxRows, naming writeGranules") {
    val tmp = Files.createTempDirectory("ncguard").toString
    spark.range(1000).selectExpr("cast(id as double) as t", "cast(id as double) * 2 as x")
      .write.parquet(s"$tmp/agg")
    val e = intercept[IllegalArgumentException] {
      NetCDFWrite.write(spark, s"$tmp/agg", s"$tmp/out.nc", cfg,
        globalAttrs = Some(Map.empty), maxRows = 999)
    }
    assert(e.getMessage.contains("writeGranules"))
    assert(e.getMessage.contains("1000"))
    assert(!Files.exists(java.nio.file.Paths.get(s"$tmp/out.nc")))
  }

  test("under the gate, the streamed toLocalIterator path writes a sorted file") {
    val tmp = Files.createTempDirectory("ncguard2").toString
    // write unsorted on purpose: the single-file path must range-sort on
    // the index var and the partition-by-partition stream must preserve
    // that global order
    spark.range(1000).selectExpr(
        "cast((id * 7919) % 1000 as double) as t", "cast(id as double) * 2 as x")
      .repartition(8)
      .write.parquet(s"$tmp/agg")
    NetCDFWrite.write(spark, s"$tmp/agg", s"$tmp/out.nc", cfg,
      globalAttrs = Some(Map("title" -> "guard spec")), maxRows = 1000)
    val nc = NetCDF4.open(s"$tmp/out.nc")
    val t = nc.read(nc.vars.find(_.name == "t").get).asInstanceOf[Array[Double]]
    assert(t.length == 1000)
    assert(t.toSeq == t.sorted.toSeq, "record order must follow the index var")
    assert(t.toSet == (0 until 1000).map(_.toDouble).toSet)
  }
}
