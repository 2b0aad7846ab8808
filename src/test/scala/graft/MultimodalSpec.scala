package graft

import graft.operators.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def mediaDf(n: Int, parts: Int) = {
    val rows = (0 until n).map { i =>
      Row(i.toLong,
        if (i % 3 == 2) "video" else if (i % 3 == 1) "audio" else "image",
        Array.tabulate[Byte](64 + i)(j => ((i * 31 + j) % 127).toByte),
        Row(640, 480, 2000L))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, parts), Multimodal.mediaSchema)
  }

  test("extractFeatures: schema, determinism, partition invariance") {
    val out1 = Multimodal.extractFeatures(mediaDf(30, 2), dim = 8)
    val out2 = Multimodal.extractFeatures(mediaDf(30, 7), dim = 8)
    assert(out1.schema.simpleString ==
      "struct<media_id:bigint,modality:string,n_bytes:bigint,features:array<float>>")
    val a = out1.collect().map(r => (r.getLong(0), r.getSeq[Float](3))).toMap
    val b = out2.collect().map(r => (r.getLong(0), r.getSeq[Float](3))).toMap
    assert(a.size == 30 && a == b)
    assert(a.values.forall(_.length == 8))
    // deterministic stub: same bytes -> same features
    assert(Multimodal.decodeStub(Array[Byte](1, 2, 3), 4)
      .sameElements(Multimodal.decodeStub(Array[Byte](1, 2, 3), 4)))
  }

  test("sampleFrames explodes videos by stride") {
    val out = Multimodal.sampleFrames(mediaDf(9, 3), stride = 10)
    val rows = out.collect()
    // only videos (ids 2,5,8); 2000ms/40 = 50 frames, stride 10 -> 5 frames
    assert(rows.map(_.getLong(0)).distinct.sorted.sameElements(Array(2L, 5L, 8L)))
    assert(rows.length == 15)
    assert(rows.forall(_.getAs[Array[Byte]]("frame_bytes").nonEmpty))
  }

  test("reference output layout projection") {
    val pts = graft.sources.BinaryPoints.read(spark, "/root/reference/t4.8k.bin")
      .limit(100)
    val labels = pts.select(col("id"), (col("id") % 3).cast("int").as("cluster_id"))
    val out = graft.operators.PointSink.toReferenceLayout(
      pts, labels, "id", "features", 2)
    assert(out.columns.toSeq ==
      Seq("position_col_X0", "position_col_X1", "cluster_id"))
    assert(out.count() == 100)
  }
}
