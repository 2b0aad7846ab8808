package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text retrieval scoring — BM25 (the Robertson/Spärck Jones
  * probabilistic ranking function, in Lucene's idf formulation):
  *
  * ```
  * score(d, Q) = Σ_{t∈Q} ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
  *                 · tf_td·(k1+1) / (tf_td + k1·(1 - b + b·dl_d/avgdl))
  * ```
  *
  * The reference engine has no text surface at all; this is the query
  * side of the corpus machinery (tf-idf q30, n-gram LM q74) — "find the
  * documents matching this term set, best first", the retrieval
  * primitive RAG-style training-data pipelines run at corpus scale.
  *
  * Scale shape: ONE corpus pass tokenizes each document (narrow —
  * length and term occurrences come from the same projection); rows
  * explode to (doc, term) only for QUERY terms, so the shuffled tf
  * table is bounded by |docs containing a query term| · |Q|, not by
  * corpus token count. Document frequencies are a grouped count of
  * that tf table; the per-term stats join back broadcast-sized. N and
  * total-length are one scalar aggregate attached via broadcast cross
  * join — the corpus text itself never shuffles.
  *
  * Numerics: tf, df, dl, N, Σdl are exact integers; idf and the tf
  * normalization are fixed-order double expressions off those integers,
  * so engines agree to the last ulp of `ln` — per-doc summation over
  * |Q| terms folds in engine order, both absorbed by `scale` rounding
  * (the tf-idf/PMI acceptance). k1 and b reach SQL oracles by printing
  * the same Scala doubles (PageRank precedent).
  */
object Search {

  /** BM25 score per (document containing ≥1 query term).
    * @return (idCol, n_terms, score) — n_terms = distinct query terms
    *   matched; score rounded to `scale` decimals. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      scale: Int = 6): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("toks"))
    // dl and the exploded terms come off the same cheap split; the IN
    // filter keeps only query-term rows (narrow, before any exchange)
    val tf = toks
      .select(col(idCol), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = toks.agg(count(lit(1)).as("n"),
      sum(size(col("toks"))).cast("long").as("sumdl"))
    // per-term contribution: idf · saturated tf. All casts widen exact
    // integers; ln/div/mul in this fixed order mirrors the SQL oracle.
    // tf rows exist ⇒ the corpus is non-empty ⇒ sumdl ≥ n ≥ 1 (an empty
    // text still splits to [""], dl=1) — the divisions cannot hit zero.
    val idf = log(lit(1.0) +
      (col("n").cast("double") - col("df").cast("double") + 0.5) /
        (col("df").cast("double") + 0.5))
    val norm = lit(1.0 - b) + lit(b) *
      (col("dl").cast("double") * col("n").cast("double") /
        col("sumdl").cast("double"))
    val contrib = idf * (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") + lit(k1) * norm)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_terms"),
        round(sum(contrib), scale).as("score"))
  }

  /** Top-k retrieval: the k best-scoring documents, ties broken by id
    * ascending (total order ⇒ deterministic page). The global sort is
    * over the MATCHED set only (already ≪ corpus); Spark's
    * TakeOrderedAndProject keeps it a per-partition heap + driver
    * merge of k rows, never a full sort. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75, scale: Int = 6): DataFrame =
    bm25(docs, idCol, textCol, queryTerms, k1, b, scale)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher): combine N
    * rankings of one id space by `Σ_lists 1/(k + rank)` — the standard
    * way to merge lexical (BM25) and dense (embedding-cosine)
    * retrieval without score calibration, since only RANKS enter the
    * fused score. Ids absent from a list simply contribute nothing
    * (full outer semantics via union + re-aggregate — never an N-way
    * outer join).
    *
    * Determinism: ranks are exact integers, each contribution is one
    * division, and the per-id sum folds ≤ N tiny terms (`scale`
    * rounding absorbs fold-order skew). Ties at the cut break by id.
    *
    * Scale shape: the union of rank lists is one narrow pass; the
    * per-id aggregate is one hash shuffle of (id, contrib) pairs —
    * list length, not corpus size; the top-k is a per-partition heap
    * (TakeOrderedAndProject), never a global sort.
    *
    * @param lists ranked lists, each carrying `idCol` and `rankCol`
    *   (rank 1 = best; need not be dense, but must be ≥ 1)
    * @return (id, rrf_score, n_lists) — the `topK` best fused ids. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
      kRrf: Int = 60, topK: Int = 20, scale: Int = 6): DataFrame = {
    require(lists.nonEmpty, "need at least one ranking")
    require(kRrf >= 1, s"kRrf must be >= 1, got $kRrf")
    val u = lists.map(_.select(col(idCol).as("id"),
        (lit(1.0) / (lit(kRrf.toDouble) + col(rankCol).cast("double")))
          .as("contrib")))
      .reduce(_ unionAll _)
    u.groupBy("id")
      .agg(round(sum(col("contrib")), scale).as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_score").desc, col("id"))
      .limit(topK)
      .withColumnRenamed("id", idCol)
  }
}
