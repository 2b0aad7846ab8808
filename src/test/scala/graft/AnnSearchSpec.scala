package graft

import graft.operators.AnnSearch
import org.apache.spark.sql.functions._

class AnnSearchSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").persist()

  private def q = emb.filter(col("vec_id") < 30)
    .select(col("vec_id").as("a_id"), col("embedding").as("a_v"))
  private def b = emb
    .select(col("vec_id").as("b_id"), col("embedding").as("b_v"))

  test("bruteForceTopK == scala brute force") {
    val got = AnnSearch.bruteForceTopK(q, b, 5).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], bb: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dp += a(i).toDouble * bb(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += bb(i).toDouble * bb(i).toDouble
        i += 1
      }
      dp / math.sqrt(na * nb)
    }
    for (aId <- vecs.keys.filter(_ < 30)) {
      val exp = vecs.keys.filter(_ != aId).toSeq
        .map(bId => (bId, cos(vecs(aId), vecs(bId))))
        .sortBy { case (bId, c) => (-c, bId) }.take(5).map(_._1)
      exp.zipWithIndex.foreach { case (bId, i) =>
        assert(got((aId, i + 1)) == bId, s"query $aId rank ${i + 1}")
      }
    }
  }

  test("ivfTopK: high recall vs exact, far fewer candidates") {
    val exact = AnnSearch.bruteForceTopK(q, b, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = AnnSearch.ivfTopK(q, b, 5, nCentroids = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.7, s"IVF recall@5 = $recall (8 centroids, probe 3)")
  }

  test("prebuilt index round-trips through parquet == fresh build") {
    val fresh = AnnSearch.ivfTopK(q, b, 5, nCentroids = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_idx")
    try {
      val dir = tmp.toString + "/cents"
      AnnSearch.centroids(b, nCentroids = 8).write.parquet(dir)
      val served = AnnSearch.ivfTopKPrebuilt(q, b, 5,
          spark.read.parquet(dir), nProbe = 3)
        .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
      // identical centroids (same seed, persisted losslessly as doubles)
      // must give identical candidate sets and identical ranked output
      assert(served == fresh)
      assertThrows[IllegalArgumentException] {
        AnnSearch.ivfTopKPrebuilt(q, b, 5,
          spark.read.parquet(dir).limit(0), nProbe = 3).collect()
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("knnBroadcast kernel == shuffle-aggregate knn (exact, same ties)") {
    import graft.operators.KnnJoin
    val agg = KnnJoin.knn(q, b, 7).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val bcast = KnnJoin.knnBroadcast(q, b, 7).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    assert(bcast == agg)
    // the auto router picks the broadcast kernel at this size
    val auto = KnnJoin.knnAuto(q, b, 7).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    assert(auto == agg)
  }

  test("knnAuto on an empty build side returns no rows (no NPE)") {
    val spark2 = spark
    import spark2.implicits._
    val q = Seq((1L, Seq(1.0f, 2.0f))).toDF("a_id", "a_v")
    val empty = Seq.empty[(Long, Seq[Float])].toDF("b_id", "b_v")
    assert(graft.operators.KnnJoin.knnAuto(q, empty, 3).count() == 0L)
  }

  test("ivfTopK with full probing == exact") {
    val exact = AnnSearch.bruteForceTopK(q, b, 3).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val full = AnnSearch.ivfTopK(q, b, 3, nCentroids = 4, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    assert(full == exact)
  }
}
