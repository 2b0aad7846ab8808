package graft.operators

import graft.functions.{VectorExpressions, VectorOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`): cosine
  * top-k. Two paths:
  *  - [[bruteForceTopK]] — the exact baseline: query×build candidate join +
  *    per-query top-k window. O(|Q|·|B|) pairs; correct at any scale where
  *    |Q| is bounded (the common "probe a batch of queries" shape).
  *  - [[ivfTopK]] — the scale path: IVF-style inverted file. K-means-lite
  *    centroids (deterministic seeded sample refined by a few Lloyd rounds,
  *    all DataFrame aggs), every build vector assigned to its nearest
  *    centroid, queries probe only the `nProbe` nearest centroids. Candidate
  *    set shrinks by ~nProbe/nCentroids; recall is tested against the exact
  *    path in AnnSearchSpec.
  */
object AnnSearch {

  /** cos(a,b) — identical formula to the DuckDB oracle:
    * dot / sqrt(norm2(a)*norm2(b)), all double. Norms are hoisted to
    * per-ROW projections before the join ([[withNorm]]) so each vector is
    * folded once, not once per pair — the values (and therefore the
    * oracle comparison) are bit-identical either way. */
  private def cosineCol =
    VectorExpressions.dotProduct(col("a_v"), col("b_v")) /
      sqrt(col("a_n") * col("b_n"))

  private def withNorm(df: org.apache.spark.sql.DataFrame,
      vecCol: String, normCol: String) =
    df.withColumn(normCol,
      VectorExpressions.dotProduct(col(vecCol), col(vecCol)))

  /** Exact top-k by cosine for each query row, via the bounded-heap
    * [[graft.functions.TopKByScore]] aggregate on the NEGATED cosine
    * (min(−cos) ≡ max(cos); ties ascending by id — identical ordering to
    * `ORDER BY cos DESC, id`, and negation is exact in IEEE doubles so
    * the DuckDB oracle comparison is unaffected).
    * @param queries (`a_id`, `a_v`); @param build (`b_id`, `b_v`)
    * @return (`a_id`, `nbr_id`, `rnk`) — rnk 1..k by cosine desc, ties by
    *         nbr_id. */
  def bruteForceTopK(queries: DataFrame, build: DataFrame, k: Int): DataFrame =
    // queries are the streamed side of the nested-loop candidate join —
    // repartition so the |Q|·|B| scan parallelizes even when the query
    // batch arrives as one small file/partition
    withNorm(queries.repartition(col("a_id")), "a_v", "a_n")
      .join(withNorm(build, "b_v", "b_n"), col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), (-cosineCol).as("negcos"))
      .groupBy("a_id")
      .agg(graft.functions.TopKByScore.topkMin(col("b_id"), col("negcos"), k)
        .as("topk"))
      .select(col("a_id"), posexplode(col("topk")).as(Seq("pos", "p")))
      .select(col("a_id"), col("p.id").as("nbr_id"),
        (col("pos") + 1).cast("int").as("rnk"))

  /** Deterministically-seeded centroid table refined by `iters` Lloyd
    * rounds. The mean step is dimension-count agnostic: posexplode the
    * assigned vectors and average per (centroid, position) — two narrow
    * hash aggs instead of a `dim`-wide agg column list (which forces a
    * fresh multi-second codegen compile per iteration at high dims).
    * NB: double `avg` is shuffle-order dependent in its low bits, so
    * centroid coordinates (and thus IVF candidate sets) are approximate —
    * fine for an ANN index; recall is what the tests pin down.
    * @return (`c_id`: int, `c_v`: array<double>) */
  def centroids(build: DataFrame, nCentroids: Int, iters: Int = 2,
      seed: Long = 42L): DataFrame = {
    var cents = build.orderBy(xxhash64(col("b_id"), lit(seed)))
      .limit(nCentroids)
      .select(row_number().over(Window.orderBy(col("b_id"))).cast("int").as("c_id"),
        col("b_v").cast("array<double>").as("c_v"))
    for (_ <- 0 until iters) {
      val assigned = assign(build, cents)
      val newCents = assigned
        .select(col("c_id"), posexplode(col("b_v").cast("array<double>")))
        .groupBy(col("c_id"), col("pos")).agg(avg(col("col")).as("av"))
        .groupBy("c_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("av")))),
          x => x.getField("av")).as("c_v"))
      cents = newCents.localCheckpoint()
    }
    cents
  }

  /** Nearest centroid per build vector: broadcast the (tiny) centroid
    * table and take the `min_by` over candidates — one hash agg, no
    * per-row window sort. Ties break on centroid id (deterministic).
    * @return (`b_id`, `b_v`, `c_id`). */
  private def assign(build: DataFrame, cents: DataFrame): DataFrame = {
    val d2 = VectorExpressions.squaredL2(
      col("b_v").cast("array<double>"), col("c_v"))
    build.crossJoin(broadcast(cents))
      .select(col("b_id"), col("b_v"), col("c_id"), d2.as("d2"))
      .groupBy("b_id")
      .agg(first(col("b_v")).as("b_v"),
        min_by(col("c_id"), struct(col("d2"), col("c_id"))).as("c_id"))
  }

  /** IVF approximate top-k: probe the `nProbe` nearest centroids per query,
    * exact cosine + window inside the probed cells only. */
  def ivfTopK(queries: DataFrame, build: DataFrame, k: Int,
      nCentroids: Int, nProbe: Int): DataFrame = {
    val cents = centroids(build, nCentroids).persist()
    val buildIdx = assign(build, cents) // (b_id, b_v, c_id)

    val qd2 = VectorExpressions.squaredL2(
      col("a_v").cast("array<double>"), col("c_v"))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("rk", row_number().over(
        Window.partitionBy("a_id").orderBy(qd2, col("c_id"))))
      .filter(col("rk") <= nProbe)
      .select(col("a_id"), col("a_v"), col("c_id"))

    withNorm(probes, "a_v", "a_n")
      .join(withNorm(buildIdx, "b_v", "b_n"), "c_id")
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), (-cosineCol).as("negcos"))
      .groupBy("a_id")
      .agg(graft.functions.TopKByScore.topkMin(col("b_id"), col("negcos"), k)
        .as("topk"))
      .select(col("a_id"), posexplode(col("topk")).as(Seq("pos", "p")))
      .select(col("a_id"), col("p.id").as("nbr_id"),
        (col("pos") + 1).cast("int").as("rnk"))
  }
}
