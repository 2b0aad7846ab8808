package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph summary statistics over an edge list. First member:
  * degree assortativity — the Pearson correlation of endpoint degrees
  * over the symmetrized edge list (Newman's r): positive when hubs
  * attach to hubs, negative for hub-and-spoke topologies. A one-number
  * health check that a sampled or synthetic graph preserved its
  * degree-mixing structure.
  *
  * Plan shape: canonicalize + symmetrize once (cached — the degree
  * aggregate and both endpoint joins read the same edge set; without
  * the cache each reference re-executes the upstream edge derivation,
  * measured 3× on the co-purchase graph), one degree aggregate, two
  * hash joins keyed on the endpoints, then [[Stats.corrMatrix]]'s
  * decimal-exact single-pass moment aggregate. The cache releases via
  * ContextCleaner when the returned plan is collected (the documented
  * Dbscan.run lifecycle).
  */
object GraphStats {

  /** @param edges undirected edges, any orientation; duplicates and
    *   self-loops collapse/drop (KCore's canonical form).
    * @return one row (var_a='deg_a', var_b='deg_b', corr) */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = GraphEdges.symmetrize(
      GraphEdges.canonical(edges, srcCol, dstCol)).persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    val dPairs = e.join(deg, "src").withColumnRenamed("d", "da")
      .join(deg.select(col("src").as("dst"), col("d").as("db")), "dst")
    Stats.corrMatrix(dPairs, Seq("deg_a" -> col("da"), "deg_b" -> col("db")))
  }

  /** Neighborhood (common-neighbor) Jaccard similarity between node
    * pairs: sim(u,v) = |N(u) ∩ N(v)| / |N(u) ∪ N(v)| — the
    * link-prediction / "customers also bought" primitive over an
    * undirected graph. The DBSCAN ε-join asks "which points are close
    * in feature space"; this asks the same question in GRAPH space,
    * with shared neighbors playing the role of shared shingles in
    * [[Dedup.jaccardJoin]] — and the plan is the same inverted-index
    * shape: each vertex w is a "posting" whose neighbor list generates
    * the candidate pairs, |N(u) ∩ N(v)| falls out of a pair-count
    * aggregate, and no pair that shares zero neighbors is ever
    * materialized (never a cross join).
    *
    * Plan shape: canonicalize + symmetrize once (cached — the wedge
    * join reads both sides and the degree aggregate reads it again),
    * one self equi-join on the wedge center, one pair-count aggregate,
    * two broadcast-size joins against the degree table. Wedge fan-out
    * is Σ_w deg(w)² — the [[TriangleCount]] cost profile; at 100 TB
    * scale bound it by dropping super-hub centers (`maxDegree`), the
    * stopword pruning of graphs: a hub shared by everyone carries no
    * similarity signal, exactly like an every-doc shingle.
    *
    * @param minCommon emit pairs with at least this many shared
    *   neighbors (prunes inside the aggregate, before the degree joins)
    * @param maxDegree drop wedge centers with degree above this bound
    *   (approximation: pairs whose ENTIRE overlap is super-hubs are
    *   lost; Int.MaxValue = exact, the default)
    * @return (item_a, item_b, common_cnt, sim) with item_a < item_b;
    *   sim is a single division of exact longs (cross-engine stable) */
  def commonNeighborSim(edges: DataFrame, srcCol: String, dstCol: String,
      minCommon: Int = 2, maxDegree: Int = Int.MaxValue): DataFrame = {
    val e = GraphEdges.symmetrize(
      GraphEdges.canonical(edges, srcCol, dstCol)).persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    val centers =
      if (maxDegree == Int.MaxValue) e
      else e.join(broadcast(deg.filter(col("d") <= maxDegree)
        .select(col("src"))), Seq("src"), "left_semi")
    // wedge u—w—v ordered u < v: one equi-join on the center w
    val common = centers.as("x")
      .join(centers.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .groupBy(col("x.dst").as("item_a"), col("y.dst").as("item_b"))
      .agg(count(lit(1)).as("common_cnt"))
      .filter(col("common_cnt") >= minCommon)
    common
      .join(deg.select(col("src").as("item_a"), col("d").as("da")), "item_a")
      .join(deg.select(col("src").as("item_b"), col("d").as("db")), "item_b")
      .select(col("item_a"), col("item_b"), col("common_cnt"),
        (col("common_cnt").cast("double") /
          (col("da") + col("db") - col("common_cnt"))).as("sim"))
  }

  /** Adamic–Adar link-prediction score between node pairs:
    * aa(u,v) = Σ_{w ∈ N(u) ∩ N(v)} 1/log2(deg(w)) — the
    * degree-discounted refinement of [[commonNeighborSim]]: a shared
    * neighbor that connects to everyone is weak evidence of affinity,
    * a shared RARE neighbor is strong evidence (the idf of graphs).
    *
    * Plan shape: identical to the common-neighbor wedge join, except
    * each wedge row carries its center's degree (one co-partitioned
    * join on the center key BEFORE the self-join — both sides hash on
    * src, so attaching the degree adds no exchange beyond the degree
    * aggregate itself). The score is a sum of per-center terms in
    * engine-dependent order, so each term 1/log2(d) is rounded to 9
    * decimals and summed as decimal(38,9) — order-free, oracle-exact
    * (the DSIR λ-sum discipline). A wedge center always has degree
    * ≥ 2 (it needs two distinct neighbors), so log2(d) ≥ 1 — no
    * division hazard.
    *
    * @param minCommon emit pairs with at least this many shared
    *   neighbors (prunes inside the aggregate)
    * @param maxDegree drop wedge centers above this degree bound (the
    *   super-hub prune; Int.MaxValue = exact, the default)
    * @return (item_a, item_b, common_cnt, aa_score) with
    *   item_a < item_b; aa_score rounded to 6 decimals */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
      minCommon: Int = 2, maxDegree: Int = Int.MaxValue): DataFrame = {
    val e = GraphEdges.symmetrize(
      GraphEdges.canonical(edges, srcCol, dstCol)).persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    val degOk =
      if (maxDegree == Int.MaxValue) deg
      else deg.filter(col("d") <= maxDegree)
    // attach the center degree before the wedge self-join: e and deg
    // are both hashed on src, so this join reuses the aggregation
    // exchange; the maxDegree prune falls out of the inner join
    val centers = e.join(degOk, "src")
    centers.as("x")
      .join(centers.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .groupBy(col("x.dst").as("item_a"), col("y.dst").as("item_b"))
      .agg(count(lit(1)).as("common_cnt"),
        sum(round(lit(1.0) / log2(col("x.d")), 9)
          .cast("decimal(38,9)")).as("__aa"))
      .filter(col("common_cnt") >= minCommon)
      .withColumn("aa_score", round(col("__aa").cast("double"), 6))
      .drop("__aa")
  }

  /** Local clustering coefficient per node: cc(v) = 2·T(v) /
    * (deg(v)·(deg(v)−1)) — the fraction of v's neighbor pairs that are
    * themselves connected. The per-node refinement of
    * [[TriangleCount]]'s global census: a whole-graph transitivity
    * number says "this graph is clumpy", the per-node coefficient says
    * WHERE (ego-network density for community seeds, link-spam
    * detection, feature engineering on graph entities).
    *
    * Plan shape: canonicalize once (cached — the triangle count and
    * the degree aggregate both read it), [[TriangleCount.perNode]]'s
    * degree-ordered wedge join (fused single-task path under its
    * threshold), one degree aggregate, one join. Nodes with degree < 2
    * have no neighbor pairs: cc = 0 by convention.
    *
    * @return (id, degree, n_triangles, cc) for every node incident to
    *   an edge; cc is one division of exact longs (cross-engine
    *   stable) */
  def clusteringCoefficient(edges: DataFrame, srcCol: String,
      dstCol: String,
      localThreshold: Long = 2_000_000L): DataFrame = {
    val canon = GraphEdges.canonical(edges, srcCol, dstCol).persist()
    val tri = TriangleCount.perNode(canon, "a", "b", localThreshold)
    val deg = GraphEdges.symmetrize(canon)
      .groupBy("src").agg(count(lit(1)).as("degree"))
    tri.join(deg, col("id") === col("src"))
      .select(col("id"), col("degree"), col("n_triangles"),
        when(col("degree") >= 2,
          (col("n_triangles") * 2).cast("double") /
            (col("degree") * (col("degree") - 1)))
          .otherwise(lit(0.0)).as("cc"))
  }

  /** Newman modularity of a node partition, reported per community:
    *
    * ```
    * Q = Σ_c [ e_c/2m − (d_c/2m)² ]
    *   = Σ_c (e_c·|A| − d_c²) / |A|²      with |A| = 2m arcs
    * ```
    *
    * where e_c counts ARCS (ordered endpoint pairs) inside community c
    * and d_c sums member degrees — the quality score that turns any
    * labeling ([[LabelProp]], [[ConnectedComponents]], an external
    * clustering) into a judged partition. Everything except the final
    * division is exact integer arithmetic (decimal-widened products, so
    * no overflow at any m), making the score engine-portable.
    *
    * Plan shape: symmetrized arcs are computed once (cached — the
    * degree aggregate and the two label joins read the same set); the
    * label table joins per-endpoint (node-sized, broadcast under AQE
    * when small); the per-community rollup and the scalar arc count are
    * tiny. Nothing quadratic anywhere — cost is O(|E| + |V|).
    *
    * @param edges  undirected edges, any orientation (duplicates and
    *   self-loops collapse/drop — KCore's canonical form)
    * @param labels (node id, community label) — must cover every node
    *   incident to an edge (inner joins drop unlabeled endpoints)
    * @return (community, n_nodes, degree_sum, internal_arcs, q_contrib)
    *   — Σ q_contrib over rows is the partition's modularity Q;
    *   n_nodes counts LABELED members with ≥1 edge. */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame, idCol: String, labelCol: String,
      scale: Int = 6): DataFrame = {
    val arcs = GraphEdges.symmetrize(
      GraphEdges.canonical(edges, srcCol, dstCol)).persist()
    val lab = labels.select(col(idCol).as("id"),
      col(labelCol).as("community"))
    val deg = arcs.groupBy("src").agg(count(lit(1)).as("d"))
    val ds = deg.join(lab, col("src") === col("id"))
      .groupBy("community")
      .agg(count(lit(1)).as("n_nodes"), sum(col("d")).as("degree_sum"))
    val ia = arcs
      .join(lab.select(col("id"), col("community").as("c_src")),
        col("src") === col("id")).drop("id")
      .join(lab.select(col("id"), col("community").as("c_dst")),
        col("dst") === col("id")).drop("id")
      .filter(col("c_src") === col("c_dst"))
      .groupBy(col("c_src").as("community"))
      .agg(count(lit(1)).as("internal_arcs"))
    val m2 = arcs.agg(count(lit(1)).as("m2"))
    ds.join(ia, Seq("community"), "left")
      .crossJoin(broadcast(m2))
      .select(col("community"), col("n_nodes"), col("degree_sum"),
        coalesce(col("internal_arcs"), lit(0L)).as("internal_arcs"),
        // + 0.0 canonicalizes IEEE -0.0 (a sub-half-ulp negative
        // contribution rounds to the signed zero) — exact for all
        // other values
        (round(
          (coalesce(col("internal_arcs"), lit(0L))
              .cast("decimal(38,0)") * col("m2") -
            col("degree_sum").cast("decimal(38,0)") * col("degree_sum"))
            .cast("double") /
            (col("m2").cast("double") * col("m2").cast("double")),
          scale) + lit(0.0)).as("q_contrib"))
  }
}
