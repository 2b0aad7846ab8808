package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Dirichlet-smoothed query-likelihood retrieval — the language-model
    * ranking family next to [[bm25]]'s probabilistic-relevance family:
    * score(q,d) = Σ_{t∈q} log2 P(t|d) under the Dirichlet-smoothed
    * document model P(t|d) = (c(t,d) + μ·P(t|C)) / (dl + μ).
    *
    * Computed over MATCHED documents only via the standard
    * decomposition: the absent-term mass collapses into one per-doc
    * length normalizer, so only posting-list rows are touched —
    * score = Σ_{t∈q∩d} log2(1 + c(t,d)/(μ·P(t|C)))
    *         + |q| · log2(μ / (dl + μ)).
    * P(t|C) = cf(t)/|C| over collection term occurrences; cf derives
    * from the tf aggregate (never a second corpus pass — the q30
    * tf→df lesson). Docs matching no query term score -∞ relative to
    * any match and are omitted, exactly like bm25's candidate set.
    *
    * Cross-engine: all counts are exact integers; each contribution is
    * a fixed-order double expression; the ≤|q|-term sum's fold noise
    * is absorbed by `scale` rounding (the bm25 acceptance).
    *
    * @return (idCol, n_terms, score) over docs matching ≥1 query term */
  def dirichletQl(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], mu: Double = 300.0,
      scale: Int = 6): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(mu > 0, s"mu must be positive, got $mu")
    val nq = queryTerms.distinct.size
    val toks = docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val tf = toks
      .select(col(idCol), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val cf = tf.groupBy("term").agg(sum(col("tf")).cast("long").as("cf"))
    val stats = toks.agg(sum(size(col("toks"))).cast("long").as("ct"))
    // μ·P(t|C) in one fixed order: μ · cf / ct (cf ≥ 1 on any posting
    // row and ct ≥ 1 — an empty text still splits to [""], dl = 1)
    val muP = lit(mu) * col("cf").cast("double") / col("ct").cast("double")
    val contrib = log2(lit(1.0) + col("tf").cast("double") / muP)
    tf.join(broadcast(cf), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol), col("dl"))
      .agg(count(lit(1)).as("n_terms"), sum(contrib).as("s"))
      .select(col(idCol), col("n_terms"),
        round(col("s") + lit(nq.toDouble) *
          log2(lit(mu) / (col("dl").cast("double") + mu)), scale)
          .as("score"))
  }

  /** "More like this": tf-idf cosine retrieval of the `k` most similar
    * corpus documents for each query document, computed ENTIRELY
    * through the inverted index — a sparse dot product is a join on
    * the term key plus a pair aggregate, so dense vectors, per-pair
    * token hauls, and all-pairs enumeration never exist. The lexical
    * sibling of [[AnnSearch]]'s dense retrieval and the query side of
    * near-duplicate curation ("find what this doc would collide
    * with").
    *
    * Weights: w = tf · ln((N+1)/(df+1)) (q30's tf-idf), norms
    * ‖d‖ = √Σw² per doc. cos = Σ w_q·w_d / (‖q‖·‖d‖), rounded to
    * `scale` BEFORE ranking so both engines rank identical values
    * (per-doc float folds differ by ~1 ulp; q30/q52 acceptance). Docs
    * whose every term has df = N carry zero norm — no signal — and are
    * excluded from both sides.
    *
    * Scale shape: ONE tokenize pass builds the tf posting table
    * (persisted — the df aggregate, norms, the query side, and the
    * corpus side all derive from it without re-reading text; released
    * by the ContextCleaner with the plan); the dot join is
    * query-terms × postings (bounded by |query terms| · df, NOT
    * corpus²); the top-k is a per-query window over each query's
    * candidate set. At 100 TB the df-explosion of stopword-ish terms
    * is the cost driver — cap with a max-df prune upstream if the
    * corpus isn't already stopword-filtered.
    *
    * @param isQuery predicate over the id column selecting query docs
    * @return (query_id, doc_id, cos_sim, rnk) — rnk 1..k by cos DESC,
    *   ties by doc_id; self-matches excluded. */
  def moreLikeThis(docs: DataFrame, idCol: String, textCol: String,
      isQuery: Column => Column, k: Int, scale: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = docs.select(col(idCol).as("doc"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))
      .persist()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val w = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .select(col("doc"), col("term"),
        (col("tf").cast("double") *
          log((col("n").cast("double") + 1.0) /
            (col("df").cast("double") + 1.0))).as("w"))
    val norms = w.groupBy("doc")
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      .filter(col("nrm") > 0)
    val qw = w.filter(isQuery(col("doc")))
      .select(col("doc").as("query_id"), col("term"), col("w").as("wq"))
    val dots = qw.join(w, "term")
      .filter(col("query_id") =!= col("doc"))
      .groupBy("query_id", "doc")
      .agg(sum(col("wq") * col("w")).as("dot"))
    val sims = dots
      .join(norms.select(col("doc").as("query_id"),
        col("nrm").as("qn")), "query_id")
      .join(norms, "doc")
      .select(col("query_id"), col("doc").as("doc_id"),
        round(col("dot") / (col("qn") * col("nrm")), scale).as("cos_sim"))
    val wr = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("doc_id"))
    sims.withColumn("rnk", row_number().over(wr))
      .filter(col("rnk") <= k)
  }

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

  /** Exact phrase match over the positional inverted index: documents
    * containing the words of `phrase` at CONSECUTIVE positions, with
    * the occurrence count — what a "quoted query" does in a search
    * engine, and the positional capability the bag-of-words scorers
    * (bm25/dirichletQl) deliberately discard.
    *
    * Plan: tokens posexplode once into (doc, pos, term); the stream is
    * filtered to the phrase's words (the IN filter reaches the scan),
    * then word k anchors at `pos − k` and an equi-join on (doc, anchor)
    * per additional word intersects the posting lists — occurrences =
    * anchor positions where every word lands. Overlapping occurrences
    * count individually (position semantics, not replace semantics).
    *
    * Scale: each join is keyed by (doc, anchor) over lists already cut
    * to the phrase vocabulary — at corpus scale this is the textbook
    * positional-postings intersection, smallest-list-first by
    * construction since every list is phrase-term-sized.
    *
    * @param phrase words in order (≥ 2; must be non-empty strings).
    * @return (doc_id, n_hits) for documents with ≥ 1 occurrence. */
  def phraseCount(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "phrase needs at least two words")
    require(phrase.forall(_.nonEmpty), "phrase words must be non-empty")
    val pos = docs.select(col(idCol).as("doc_id"),
        posexplode(graft.functions.TextFunctions.tokens(col(textCol)))
          .as(Seq("pos", "term")))
      .filter(col("term").isin(phrase: _*))
      .persist() // one scan feeds every word's posting list
    val anchors = phrase.zipWithIndex.map { case (w, k) =>
      pos.filter(col("term") === w)
        .select(col("doc_id"), (col("pos") - k).as("anchor"))
    }
    anchors.reduce { (a, b) => a.join(b, Seq("doc_id", "anchor")) }
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }
}
