package graft

import java.io.{DataInputStream, FileInputStream}
import java.nio.file.Files

import graft.sources.NetcdfPoints
import org.apache.spark.sql.functions._

/** The netCDF-3 classic sink/source (reference op K-1,
  * `dbscan.cpp:510-632`): byte-level format checks against the public
  * CDF grammar, distributed round-trip, column pruning, CDF-2 upgrade. */
class NetcdfPointsSpec extends SparkSpec {

  private def tmpNc(): String = {
    val f = Files.createTempFile("ncpoints", ".nc")
    Files.delete(f) // write() creates it
    f.toString
  }

  private def sampleDf(n: Int, d: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, (0 until d).map(j => (i * d + j) * 0.5f - 3f), i % 7)
    }.toDF("id", "features", "cluster_id").repartition(5)
  }

  test("header bytes match the CDF-1 grammar (magic, dim, vars, begins)") {
    val path = tmpNc()
    NetcdfPoints.write(sampleDf(10, 2), "id", "features", "cluster_id", path)
    val in = new DataInputStream(new FileInputStream(path))
    try {
      val magic = new Array[Byte](4)
      in.readFully(magic)
      assert(magic.take(3).map(_.toChar).mkString == "CDF")
      assert(magic(3) == 1) // CDF-1 for a tiny file
      assert(in.readInt() == 0) // numrecs
      assert(in.readInt() == 0x0A) // NC_DIMENSION
      assert(in.readInt() == 1) // one dim
      assert(in.readInt() == 13) // "num_particles".length
      val nameBuf = new Array[Byte](16) // padded to 4
      in.readFully(nameBuf)
      assert(new String(nameBuf, 0, 13, "US-ASCII") == "num_particles")
      assert(in.readInt() == 10) // dim length = n
      assert(in.readInt() == 0 && in.readInt() == 0) // gatt ABSENT
      assert(in.readInt() == 0x0B) // NC_VARIABLE
      assert(in.readInt() == 3) // X0, X1, cluster_id
    } finally in.close()

    val h = NetcdfPoints.readHeader(path)
    assert(h.version == 1 && h.dimName == "num_particles" && h.n == 10)
    assert(h.vars.map(_.name) ==
      Seq("position_col_X0", "position_col_X1", "cluster_id"))
    assert(h.vars.map(_.ncType) ==
      Seq(NetcdfPoints.NcFloat, NetcdfPoints.NcFloat, NetcdfPoints.NcInt))
    // variables are contiguous: begin(k+1) = begin(k) + n*4
    assert(h.vars.sliding(2).forall {
      case Seq(a, b) => b.begin == a.begin + 10 * 4; case _ => true
    })
    // data is big-endian IEEE: first float of X0 is row 0's coord 0
    val ch = new FileInputStream(path)
    try {
      ch.getChannel.position(h.vars.head.begin)
      val dis = new DataInputStream(ch)
      assert(dis.readFloat() == -3.0f)
    } finally ch.close()
  }

  test("distributed round-trip: write then read returns identical rows") {
    val path = tmpNc()
    val df = sampleDf(1000, 3)
    NetcdfPoints.write(df, "id", "features", "cluster_id", path)
    val back = NetcdfPoints.read(spark, path)
    assert(back.count() == 1000)
    val got = back.select("id", "position_col_X0", "position_col_X1",
        "position_col_X2", "cluster_id")
      .collect().map(r => (r.getLong(0), r.getFloat(1), r.getFloat(2),
        r.getFloat(3), r.getInt(4))).sortBy(_._1)
    val want = df.orderBy("id").collect().map { r =>
      val fs = r.getSeq[Float](1)
      (r.getLong(0), fs(0), fs(1), fs(2), r.getInt(2))
    }
    assert(got.toSeq == want.toSeq)
  }

  test("column pruning reads only required variables (pruned schema)") {
    val path = tmpNc()
    NetcdfPoints.write(sampleDf(50, 4), "id", "features", "cluster_id", path)
    val scan = NetcdfPoints.read(spark, path).select("cluster_id")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("cluster_id"))
    assert(!plan.contains("position_col_X0"),
      s"pruned scan still carries coordinate columns:\n$plan")
    assert(scan.agg(sum("cluster_id")).head.getLong(0) ==
      (0 until 50).map(_ % 7).sum)
  }

  test("CDF-2 (64-bit offsets) round-trips identically") {
    val path = tmpNc()
    val df = sampleDf(200, 2)
    NetcdfPoints.write(df, "id", "features", "cluster_id", path,
      forceVersion = Some(2))
    val h = NetcdfPoints.readHeader(path)
    assert(h.version == 2 && h.n == 200)
    val back = NetcdfPoints.read(spark, path)
      .select("id", "position_col_X1", "cluster_id")
      .collect().map(r => (r.getLong(0), r.getFloat(1), r.getInt(2)))
      .sortBy(_._1)
    val want = df.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)(1), r.getInt(2)))
    assert(back.toSeq == want.toSeq)
  }

  test("split planning yields multiple partitions on small splits") {
    val path = tmpNc()
    NetcdfPoints.write(sampleDf(300, 2), "id", "features", "cluster_id", path)
    val df = spark.read.format("netcdfPoints")
      .option("path", path).option("maxBytesPerPartition", 256).load()
    assert(df.rdd.getNumPartitions > 1)
    assert(df.count() == 300)
    // ids are global row ordinals regardless of split count
    assert(df.agg(min("id"), max("id")).head() ==
      org.apache.spark.sql.Row(0L, 299L))
  }

  test("ragged vectors and empty input are rejected before any bytes") {
    import spark.implicits._
    val path = tmpNc()
    val ragged = Seq((0L, Seq(1f, 2f), 1), (1L, Seq(1f), 1))
      .toDF("id", "features", "cluster_id")
    intercept[Exception] {
      NetcdfPoints.write(ragged, "id", "features", "cluster_id", path)
    }
    intercept[Exception] {
      NetcdfPoints.write(ragged.limit(0), "id", "features", "cluster_id",
        tmpNc())
    }
  }

  test("a file variable named 'id' wins over the synthetic row ordinal") {
    // Our writer never emits an "id" variable, but the read path accepts
    // any conforming CDF-1 file — hand-craft one whose single NC_INT
    // variable is literally named "id" and check its BYTES come back
    // (not the row ordinal), with no duplicate-name schema.
    val path = tmpNc()
    val n = 5
    val bb = java.nio.ByteBuffer.allocate(256)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put("CDF".getBytes("US-ASCII")).put(1.toByte) // CDF-1
    bb.putInt(0) // numrecs
    bb.putInt(0x0A).putInt(1) // dim_list: one dim
    bb.putInt(1).put("n".getBytes("US-ASCII")).put(Array[Byte](0, 0, 0))
    bb.putInt(n)
    bb.putInt(0).putInt(0) // gatt_list absent
    bb.putInt(0x0B).putInt(1) // var_list: one var
    bb.putInt(2).put("id".getBytes("US-ASCII")).put(Array[Byte](0, 0))
    bb.putInt(1).putInt(0) // rank 1 over dim 0
    bb.putInt(0).putInt(0) // vatt_list absent
    bb.putInt(NetcdfPoints.NcInt)
    bb.putInt(n * 4) // vsize
    val begin = bb.position() + 4 // header ends after this 32-bit begin
    bb.putInt(begin)
    (0 until n).foreach(i => bb.putInt(1000 + i)) // NOT the ordinals
    bb.flip()
    val bytes = new Array[Byte](bb.remaining()); bb.get(bytes)
    Files.write(java.nio.file.Paths.get(path), bytes)

    val df = NetcdfPoints.read(spark, path)
    assert(df.schema.fieldNames.toSeq == Seq("id")) // no duplicate column
    assert(df.schema.head.dataType ==
      org.apache.spark.sql.types.IntegerType)
    val got = df.collect().map(_.getInt(0)).sorted.toSeq
    assert(got == (1000 until 1000 + n), s"expected variable bytes, got $got")
  }
}
