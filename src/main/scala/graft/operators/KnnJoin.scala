package graft.operators

import graft.functions.{TopKByScore, VectorExpressions}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** k-nearest-neighbor joins over a point table — the reference's heap-based
  * n-nearest query capability (`kdtree2.cpp:504-601`, result heap
  * `kdtree2.cpp:45-65`; brute-force oracle declared `kdtree2.hpp:106-108`),
  * re-expressed as pair generation + a per-query top-k window.
  *
  * `selfKnn` is the exact brute-force baseline (IX-5): O(n²) candidate
  * pairs, then `row_number()` per query point. Deterministic tie-break:
  * (distance, neighbor id). At 100 TB brute force is only for oracle /
  * small query sets — the scale path is [[AnnSearch]] (LSH/IVF bucketed
  * candidates, same top-k window over far fewer pairs).
  */
object KnnJoin {

  /** Exact k-NN for every point against all others (self excluded).
    * @return (`idCol`, `nbr_id`, `rnk`) with rnk in 1..k ordered by
    *         squared L2 distance, ties by neighbor id. */
  def selfKnn(points: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val a = points.select(col(idCol).as("a_id"), col(vecCol).as("a_v"))
    val b = points.select(col(idCol).as("b_id"), col(vecCol).as("b_v"))
    knnAuto(a, b, k).select(col("a_id").as(idCol), col("nbr_id"), col("rnk"))
  }

  /** Route between [[knnBroadcast]] (build side fits in memory — the
    * overwhelmingly common "queries × reference corpus" shape) and the
    * all-shuffle [[knn]] aggregate (both sides huge). The probe is one
    * cheap agg on the build side. */
  def knnAuto(queries: DataFrame, build: DataFrame, k: Int,
      maxBroadcastFloats: Long = 8_000_000L): DataFrame = {
    val sz = build.agg(count(lit(1)), max(size(col("b_v")))).collect()(0)
    // max over zero rows is NULL — an empty build side takes the
    // broadcast path, whose kernel correctly emits no neighbors
    val dim = if (sz.isNullAt(1)) 0 else sz.getInt(1)
    val floats = sz.getLong(0) * math.max(dim, 1)
    if (floats <= maxBroadcastFloats) knnBroadcast(queries, build, k)
    else knn(queries, build, k)
  }

  /** Exact k-NN with a broadcast build side: each task scans its query
    * rows against the in-memory corpus with a primitive-array kernel and
    * a bounded (d², id)-heap — zero join machinery, no 25M-row pair
    * materialization, identical output to [[knn]] (same tie-break).
    * The build side must fit in executor memory (guarded by [[knnAuto]];
    * at 100 TB this is the "small reference corpus" path — e.g. k-NN
    * against a centroid table or a curated exemplar set). */
  def knnBroadcast(queries: DataFrame, build: DataFrame, k: Int): DataFrame = {
    val spark = queries.sparkSession
    val buildArr = build
      .select(col("b_id").cast("long"), col("b_v").cast("array<float>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val bc = spark.sparkContext.broadcast(buildArr)
    val rdd = queries
      .select(col("a_id").cast("long"), col("a_v").cast("array<float>"))
      .rdd
      .mapPartitions { it =>
        val corpus = bc.value
        it.flatMap { r =>
          val aId = r.getLong(0)
          val av = r.getSeq[Float](1).toArray
          // bounded max-heap over (d2, id): keeps the k smallest pairs
          val worst = new java.util.PriorityQueue[(Double, Long)](k + 1,
            (x: (Double, Long), y: (Double, Long)) => {
              val c = java.lang.Double.compare(y._1, x._1) // max-heap on d2
              if (c != 0) c else java.lang.Long.compare(y._2, x._2)
            })
          var bi = 0
          while (bi < corpus.length) {
            val (bId, bv) = corpus(bi)
            if (bId != aId) {
              val m = math.min(av.length, bv.length)
              var acc = 0.0
              var j = 0
              while (j < m) {
                val d = av(j).toDouble - bv(j).toDouble
                acc += d * d
                j += 1
              }
              if (worst.size < k) worst.add((acc, bId))
              else {
                val top = worst.peek()
                if (acc < top._1 || (acc == top._1 && bId < top._2)) {
                  worst.poll(); worst.add((acc, bId))
                }
              }
            }
            bi += 1
          }
          val out = new Array[(Double, Long)](worst.size)
          var p = worst.size - 1
          while (p >= 0) { out(p) = worst.poll(); p -= 1 }
          out.iterator.zipWithIndex.map { case ((_, bId), rnk) =>
            Row(aId, bId, rnk + 1)
          }
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("a_id", LongType, nullable = false),
      StructField("nbr_id", LongType, nullable = false),
      StructField("rnk", IntegerType, nullable = false))))
  }

  /** Exact k-NN of each query row against the full build side, via the
    * [[graft.functions.TopKByScore]] bounded-heap aggregate: a partial/
    * final hash agg where only k-sized buffers cross the shuffle — no
    * per-group sort of all candidates (see [[knnWindow]] for the sort
    * formulation it replaces).
    * Inputs must have columns (`a_id`, `a_v`) / (`b_id`, `b_v`). */
  def knn(queries: DataFrame, build: DataFrame, k: Int): DataFrame = {
    val d2 = VectorExpressions.squaredL2(col("a_v"), col("b_v"))
    queries.join(build, col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), d2.as("d2"))
      .groupBy("a_id")
      .agg(TopKByScore.topkMin(col("b_id"), col("d2"), k).as("topk"))
      .select(col("a_id"), posexplode(col("topk")).as(Seq("pos", "p")))
      .select(col("a_id"), col("p.id").as("nbr_id"),
        (col("pos") + 1).cast("int").as("rnk"))
  }

  /** Window/sort formulation of [[knn]] — kept as the cross-check oracle
    * (sorts every candidate per group; the aggregate path is the scale
    * one). */
  def knnWindow(queries: DataFrame, build: DataFrame, k: Int): DataFrame = {
    val d2 = VectorExpressions.squaredL2(col("a_v"), col("b_v"))
    queries.join(build, col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), d2.as("d2"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("a_id").orderBy(col("d2"), col("b_id"))).cast("int"))
      .filter(col("rnk") <= k)
      .select(col("a_id"), col("b_id").as("nbr_id"), col("rnk"))
  }
}
